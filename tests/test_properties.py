"""Property-based tests (hypothesis) for the engine's core semantics:
the stay-category bucketing (reference F3-F5) and the similarity math.

These complement the oracle sweep: the oracle checks agreement on one
dataset; these check the CONTRACT on arbitrary inputs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.enrich import enrich_stay

# one shared batch per test run keeps the Spark round-trips bounded
_DATES = st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 1, 1))


def _expected_category(ci: dt.date, co: dt.date) -> str:
    d = (co - ci).days
    if 1 <= d <= 4:
        return "Short stay"
    if 5 <= d <= 10:
        return "Standard stay"
    if 11 <= d <= 14:
        return "Standard extended stay"
    if d > 14:
        return "Long stay"
    return "Erroneous data"  # d <= 0, reference src/main.py:71,86-93 intended semantics


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(_DATES, _DATES), min_size=1, max_size=30))
def test_stay_category_matches_reference_rules(spark, pairs):
    rows = [(i, ci.isoformat(), co.isoformat()) for i, (ci, co) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, srch_ci string, srch_co string")
    got = {
        r.id: r.stay_category
        for r in enrich_stay(df, "srch_ci", "srch_co").collect()
    }
    for i, (ci, co) in enumerate(pairs):
        assert got[i] == _expected_category(ci, co), (i, ci, co)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=10
    ),
    st.text(alphabet="ab ", min_size=1, max_size=40),
)
def test_unparseable_dates_always_erroneous(spark, cis, co):
    rows = [(i, ci, co) for i, ci in enumerate(cis)]
    df = spark.createDataFrame(rows, "id long, srch_ci string, srch_co string")
    out = enrich_stay(df, "srch_ci", "srch_co").collect()
    for r in out:
        assert r.stay_category == "Erroneous data"


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=20),
    st.lists(st.integers(0, 9), min_size=1, max_size=20),
)
def test_jaccard_bounds_and_identity(spark, xs, ys):
    from m12_kafkastreams_python_azure_spark.operators.dedup import jaccard

    df = spark.createDataFrame(
        [([f"t{x}" for x in xs], [f"t{y}" for y in ys])],
        "a array<string>, b array<string>",
    )
    j_ab, j_aa = df.select(
        jaccard(F.array_distinct("a"), F.array_distinct("b")).alias("jab"),
        jaccard(F.array_distinct("a"), F.array_distinct("a")).alias("jaa"),
    ).first()
    assert 0.0 <= j_ab <= 1.0
    assert j_aa == 1.0
    if set(xs) == set(ys):
        assert j_ab == 1.0


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", min_size=1, max_size=30), min_size=2, max_size=8))
def test_simhash_identical_texts_zero_hamming(spark, texts):
    from m12_kafkastreams_python_azure_spark.operators.dedup import (
        hamming64,
        simhash64,
    )

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    sigs = df.select(simhash64(F.col("t")).alias("s"), "t").collect()
    by_text = {}
    for r in sigs:
        by_text.setdefault(r.t, set()).add(r.s)
    # simhash is a pure function of the text
    for t, s in by_text.items():
        assert len(s) == 1, t


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_pagerank_mass_conserved_on_symmetrized_graphs(spark, edge_list):
    """On ANY symmetrized edge set (meets the out-edge precondition), the
    rank vector sums to 1 (±rounding) and every node appears exactly once."""
    from m12_kafkastreams_python_azure_spark.operators.graph import pagerank

    sym = list({(str(a), str(b)) for a, b in edge_list} | {(str(b), str(a)) for a, b in edge_list})
    edges = spark.createDataFrame(sym, "src string, dst string")
    out = pagerank(edges, iters=3).collect()
    nodes = {n for e in sym for n in e}
    assert {r.node for r in out} == nodes
    assert abs(sum(r.rank for r in out) - 1.0) < 1e-4


@settings(max_examples=10, deadline=None)
@given(
    st.binary(min_size=0, max_size=40),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_confluent_frame_round_trip_any_payload(spark, payload, schema_id):
    """frame -> unframe is lossless for arbitrary bodies and schema ids."""
    from m12_kafkastreams_python_azure_spark.sources.readers import (
        confluent_frame,
        confluent_unframe,
    )

    df = spark.createDataFrame([(payload,)], "value binary")
    out = confluent_unframe(confluent_frame(df, schema_id)).collect()
    assert len(out) == 1
    assert out[0].schema_id == schema_id
    assert bytes(out[0].value or b"") == payload


# ---------------------------------------------------------------- round 8

_WORDS = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6), min_size=1, max_size=12
)


def _bpe_reference(word_counts: dict[str, int], iters: int):
    """Pure-Python reference of the delimited two-pass-replace BPE train:
    same semantics the Spark plan and the DuckDB oracle implement."""
    vocab = {" ".join(w): c for w, c in word_counts.items()}
    merges = []
    for _ in range(iters):
        pairs: dict[str, int] = {}
        for sym, c in vocab.items():
            parts = sym.split(" ")
            for a, b in zip(parts, parts[1:]):
                pairs[f"{a} {b}"] = pairs.get(f"{a} {b}", 0) + c
        if not pairs:
            break
        # tie-break: count DESC then pair ASC
        best_pair, best_cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((best_pair, best_pair.replace(" ", ""), best_cnt))
        merged = best_pair.replace(" ", "")
        new_vocab: dict[str, int] = {}
        for sym, c in vocab.items():
            padded = f" {sym} "
            padded = padded.replace(f" {best_pair} ", f" {merged} ")
            padded = padded.replace(f" {best_pair} ", f" {merged} ")
            new_vocab[padded.strip()] = new_vocab.get(padded.strip(), 0) + c
        vocab = new_vocab
    return merges


@settings(max_examples=8, deadline=None)
@given(_WORDS)
def test_bpe_merges_matches_python_reference(spark, words):
    from collections import Counter

    from m12_kafkastreams_python_azure_spark.operators.textops import bpe_merges

    docs = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    got = [
        (r["pair"], r["merged"], r["cnt"])
        for r in bpe_merges(docs, iters=3).collect()
    ]
    expected = _bpe_reference(Counter(words), iters=3)
    assert got == expected


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abc xyz", min_size=1, max_size=40),
            st.integers(min_value=0, max_value=1),
        ),
        min_size=1,
        max_size=10,
    ),
    st.integers(min_value=1, max_value=60),
)
def test_token_budget_select_is_maximal_prefix(spark, rows, budget):
    """Kept set == the maximal quality-ordered prefix fitting the budget:
    total tokens <= budget, and the best-ranked EXCLUDED doc would not
    have fit."""
    from m12_kafkastreams_python_azure_spark.functions.text import (
        quality_score_cols,
    )
    from m12_kafkastreams_python_azure_spark.operators.curation import (
        token_budget_select,
    )

    docs = spark.createDataFrame(
        [(i, t if t.strip() else "x") for i, (t, _) in enumerate(rows)],
        "doc_id long, text string",
    )
    cols = quality_score_cols(F.col("text"))
    scored = sorted(
        (
            (-r["q"], r["doc_id"], r["nt"])
            for r in docs.select(
                "doc_id", cols["n_tokens"].alias("nt"), cols["quality_score"].alias("q")
            ).collect()
        ),
    )
    kept = {
        r["doc_id"]: r["n_tokens"]
        for r in token_budget_select(docs, budget=budget, buckets=16).collect()
    }
    assert sum(kept.values()) <= budget
    cum = 0
    boundary_hit = False
    for _, doc_id, nt in scored:
        if not boundary_hit and cum + nt <= budget:
            assert doc_id in kept, f"doc {doc_id} fits but was dropped"
            cum += nt
        else:
            # STRICT prefix rule: once one doc overflows, every
            # lower-ranked doc is excluded too — even one that would fit
            # (a knapsack-style keeper must fail here, not pass via an
            # early break — r8 ADVICE).
            boundary_hit = True
            assert doc_id not in kept, f"doc {doc_id} is past the boundary but was kept"


# ------------------------------------------------ trigram stupid backoff


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=3, max_size=8),
        min_size=4,
        max_size=10,
    )
)
def test_trigram_backoff_matches_pure_python(spark, token_lists):
    """Engine scores == a direct pure-Python stupid-backoff evaluation
    on random small corpora over a 4-token alphabet (dense collisions:
    all tiers and the train/eval split exercised constantly)."""
    import math
    from collections import Counter

    from m12_kafkastreams_python_azure_spark.operators.corpus import (
        BACKOFF_ALPHA as A,
        LM_HOLDOUT_MOD as MOD,
        trigram_backoff_score,
    )

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    train = [t for i, t in docs if i % MOD != 0]
    evald = [(i, t) for i, t in docs if i % MOD == 0]

    c1, c2, c3 = Counter(), Counter(), Counter()
    n_tok = 0
    for t in train:
        ws = t.split()
        n_tok += len(ws)
        c1.update(ws)
        c2.update(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))
        c3.update(" ".join(ws[i:i + 3]) for i in range(len(ws) - 2))

    expected = {}
    for i, t in evald:
        ws = t.split()
        logs, backoffs = [], 0
        for j in range(len(ws) - 2):
            g3 = " ".join(ws[j:j + 3])
            g12, g23 = " ".join(ws[j:j + 2]), " ".join(ws[j + 1:j + 3])
            if g3 in c3:
                s = c3[g3] / c2[g12]
            elif g23 in c2:
                s, backoffs = A * c2[g23] / c1[ws[j + 1]], backoffs + 1
            elif ws[j + 2] in c1:
                s, backoffs = A * A * c1[ws[j + 2]] / n_tok, backoffs + 1
            else:
                s, backoffs = A * A / n_tok, backoffs + 1
            logs.append(math.log2(s))
        if logs:
            expected[i] = (
                len(logs), round(sum(logs) / len(logs), 6), backoffs
            )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_trigrams"], r["avg_log2s"], r["n_backoff"])
        for r in trigram_backoff_score(df).collect()
    }
    for i in expected:
        assert got[i][0] == expected[i][0], (i, got[i], expected[i])
        assert abs(got[i][1] - expected[i][1]) < 1e-6, (i, got[i], expected[i])
        assert got[i][2] == expected[i][2], (i, got[i], expected[i])
    assert set(got) == set(expected)


# ----------------------------------------------- token entropy (late r10)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["x", "y", "z"]), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_token_entropy_matches_pure_python(spark, token_lists):
    import math
    from collections import Counter

    from m12_kafkastreams_python_azure_spark.operators.textops import (
        token_entropy,
    )

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tok"], r["n_distinct"], r["entropy"], r["norm_entropy"])
        for r in token_entropy(df).collect()
    }
    for i, toks in enumerate(token_lists):
        c = Counter(toks)
        n = len(toks)
        h = -sum((k / n) * math.log2(k / n) for k in c.values())
        norm = h / math.log2(len(c)) if len(c) > 1 else 0.0
        assert got[i][0] == n and got[i][1] == len(c)
        assert abs(got[i][2] - round(h, 6)) < 1e-6
        assert abs(got[i][3] - round(norm, 6)) < 1e-6


# ------------------------------------- hash_sample_per_group (late r10)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from(["g1", "g2", "g3"])),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 6),
)
def test_hash_sample_matches_brute_force(spark, rows, k):
    """The salted two-phase top-k must equal the single-pass brute-force
    md5 ranking for ANY group sizes and k — including groups smaller
    than k and salt slices that go empty."""
    import hashlib

    from m12_kafkastreams_python_azure_spark.operators.curation import (
        hash_sample_per_group,
    )

    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {
        (r["lang"], r["doc_id"]): r["sample_rank"]
        for r in hash_sample_per_group(df, k=k).collect()
    }
    expected = {}
    by_group: dict = {}
    for doc_id, g in rows:
        by_group.setdefault(g, []).append(doc_id)
    for g, ids in by_group.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rank, i in enumerate(ranked[:k], start=1):
            expected[(g, i)] = rank
    assert got == expected


# ----------------------------------------------- dsir_weights (r11)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc ", min_size=1, max_size=24),
        min_size=1,
        max_size=10,
    ),
    st.lists(
        st.text(alphabet="bcd ", min_size=1, max_size=24),
        min_size=1,
        max_size=10,
    ),
)
def test_dsir_weights_match_pure_python(spark, tgt_texts, raw_texts):
    import hashlib
    import math

    from m12_kafkastreams_python_azure_spark.operators.dsir import (
        DSIR_ALPHA,
        DSIR_BUCKETS,
        dsir_weights,
    )

    def grams(text):
        toks = [w for w in text.strip().split() if w]
        gs = list(toks)
        gs += [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
        # word_ngrams(n=2) returns [] below 2 tokens
        if len(toks) < 2:
            gs = list(toks)
        return gs

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:2], 16) % DSIR_BUCKETS

    tgt = [(i, t) for i, t in enumerate(tgt_texts)]
    raw = [(100 + i, t) for i, t in enumerate(raw_texts)]
    tdf = spark.createDataFrame(tgt, "doc_id long, text string")
    rdf = spark.createDataFrame(raw, "doc_id long, text string")
    got = {
        r.doc_id: (round(r.log_weight, 6), r.n_grams)
        for r in dsir_weights(tdf, rdf).collect()
    }

    tcounts: dict[int, int] = {}
    for _, t in tgt:
        for g in grams(t):
            tcounts[bucket(g)] = tcounts.get(bucket(g), 0) + 1
    rcounts: dict[int, int] = {}
    for _, t in raw:
        for g in grams(t):
            rcounts[bucket(g)] = rcounts.get(bucket(g), 0) + 1
    nt, nr = sum(tcounts.values()), sum(rcounts.values())
    a, ab = DSIR_ALPHA, DSIR_ALPHA * DSIR_BUCKETS
    for did, text in raw:
        gs = grams(text)
        w = sum(
            math.log((tcounts.get(bucket(g), 0) + a) / (nt + ab))
            - math.log((rcounts.get(bucket(g), 0) + a) / (nr + ab))
            for g in gs
        )
        assert got[did][1] == len(gs), (text, got[did])
        assert abs(got[did][0] - round(w, 6)) < 2e-6, (text, got[did], w)


# ------------------------------------------ temperature_sample (r11)


@settings(max_examples=8, deadline=None)
@given(
    st.dictionaries(
        st.sampled_from(["de", "en", "fr", "sw"]),
        st.integers(1, 40),
        min_size=1,
        max_size=4,
    ),
    st.floats(0.1, 1.0),
)
def test_temperature_rates_match_pure_python(spark, lang_sizes, alpha):
    from m12_kafkastreams_python_azure_spark.operators.curation import (
        TEMP_BUDGET_FRAC,
        temperature_sample,
    )

    rows, nid = [], 0
    for lang, n in sorted(lang_sizes.items()):
        for _ in range(n):
            rows.append((nid, "t", lang))
            nid += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {
        r.lang: (r.n_docs, r.keep_prob)
        for r in temperature_sample(docs, alpha=alpha).collect()
    }
    n_total = sum(lang_sizes.values())
    den = sum(n**alpha for n in lang_sizes.values())
    for lang, n in lang_sizes.items():
        q = min(1.0, TEMP_BUDGET_FRAC * n_total * (n**alpha / den) / n)
        assert got[lang][0] == n
        assert abs(got[lang][1] - round(q, 6)) < 2e-6, (lang, q, got[lang])


# --------------------------------------------------------- winnowing contract


def _winnow_reference(tokens: list[str], k: int, w: int) -> set[tuple[int, int]]:
    """Pure-Python Schleimer et al. selection: md5-prefix hash per
    k-gram, rightmost-min per window of w hashes — the contract
    winnow_fingerprints must match on ARBITRARY token sequences (the
    oracle sweep only checks the fixture corpus)."""
    import hashlib

    grams = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:10], 16) for g in grams
    ]
    out: set[tuple[int, int]] = set()
    for s in range(len(hs) - w + 1):
        win = hs[s : s + w]
        m = min(win)
        # rightmost occurrence of the min within the window
        pos = s + max(i for i, h in enumerate(win) if h == m)
        out.add((pos + 1, m))  # 1-based gram position
    return out


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "key", "row", "scan", "x1"]),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_winnow_fingerprints_match_pure_python_reference(spark, docs_tokens):
    from m12_kafkastreams_python_azure_spark.operators import textops as T

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs_tokens)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set[tuple[int, int]]] = {}
    for r in T.winnow_fingerprints(df).collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    for i, toks in enumerate(docs_tokens):
        # the engine tokenizes on \s+ after trim; empty docs yield none
        toks = " ".join(toks).split()
        expected = (
            _winnow_reference(toks, T.WINNOW_K, T.WINNOW_W)
            if len(toks) >= T.WINNOW_W + T.WINNOW_K - 1
            else set()
        )
        assert got.get(i, set()) == expected, (i, toks)
