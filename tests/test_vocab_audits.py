"""Zipf vocabulary fit and BPE tokenizer fertility: planted-geometry
values and the degenerate-slice ordering they exist to detect."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import audits as AU
from m12_kafkastreams_python_azure_spark.operators import textops as T


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_zipf_slope_separates_powerlaw_from_uniform(spark):
    """A source whose word frequencies follow freq(r) ~ N/r must fit a
    slope near -1; a source where every word appears exactly once fits
    slope 0 (no frequency decay at all) — the degenerate-slice signal."""
    # power-law source: word w_r repeated ceil(60/r) times, r = 1..20
    zipf_words = []
    for r in range(1, 21):
        zipf_words += [f"w{r:02d}"] * (-(-60 // r))
    uniform_words = [f"u{i:03d}" for i in range(200)]
    rows = [
        (1, " ".join(zipf_words), "en", "zipfy", 0),
        (2, " ".join(uniform_words), "en", "flat", 0),
    ]
    out = {
        r.source: r for r in AU.zipf_vocab_audit(_docs(spark, rows)).collect()
    }
    assert out["zipfy"].n_types == 20
    assert out["flat"].n_types == 200 and out["flat"].n_tokens == 200
    assert -1.3 < out["zipfy"].zipf_slope < -0.7
    assert out["flat"].zipf_slope == 0.0
    assert out["flat"].zipf_r2 is None  # zero frequency variance: no fit
    assert out["zipfy"].zipf_r2 > 0.95


def test_zipf_single_type_slice_yields_null_fit(spark):
    """One type -> one rank -> zero rank variance: both fit columns NULL
    instead of an ANSI divide-by-zero crash (the guard the operator
    carries because degenerate slices are exactly its subject)."""
    rows = [(1, " ".join(["same"] * 30), "en", "mono", 0)]
    r = AU.zipf_vocab_audit(_docs(spark, rows)).first()
    assert r.n_types == 1 and r.n_tokens == 30
    assert r.zipf_slope is None and r.zipf_r2 is None


def test_zipf_max_rank_caps_the_fit_head(spark):
    """The regression must only see the top max_rank types (the head
    where the power law holds): capping at 5 on a 20-type source changes
    the fit, and both spellings stay deterministic."""
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * (-(-60 // r))
    rows = [(1, " ".join(words), "en", "s", 0)]
    full = AU.zipf_vocab_audit(_docs(spark, rows)).first()
    head = AU.zipf_vocab_audit(_docs(spark, rows), max_rank=5).first()
    assert full.n_types == head.n_types == 20  # totals never capped
    assert full.zipf_slope != head.zipf_slope


def test_fertility_orders_merged_vs_shattered_language(spark):
    """A language of one highly repeated 2-char word compresses to one
    token per word under the corpus BPE (its pair dominates the merge
    table); a language of long unique words shatters — fertility must
    order them, and token/word totals must be exact."""
    aa_text = " ".join(["zz"] * 50)
    bb_text = "abcdef ghijkl mnopqr stuvwx"
    rows = [
        (1, aa_text, "aa", "s", len(aa_text.replace(" ", ""))),
        (2, bb_text, "bb", "s", len(bb_text.replace(" ", ""))),
    ]
    out = {r.lang: r for r in T.tokenizer_fertility(_docs(spark, rows)).collect()}
    assert out["aa"].n_words == 50 and out["bb"].n_words == 4
    assert out["aa"].fertility == 1.0  # 'z z' is the top merge; 'zz' -> 1 token
    assert out["bb"].fertility > 2.0
    assert out["aa"].chars_per_token == 2.0


def test_fertility_rollup_is_consistent_with_bpe_encode(spark):
    """The per-lang rollup must sum exactly to bpe_encode's per-doc
    numbers — no rows dropped, no double counting."""
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    per_doc = (
        T.bpe_encode(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("t"), F.sum("n_words").alias("w"))
    )
    want = {(r.lang, r.t, r.w) for r in per_doc.collect()}
    got = {
        (r.lang, r.n_tokens, r.n_words)
        for r in T.tokenizer_fertility(docs).collect()
    }
    assert got == want


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_zipf_head_window_is_salted_two_phase(spark):
    """VERDICT r13 #3: the head extraction must never buffer a slice's
    whole vocabulary on one reducer. Plan pin: exactly two Window nodes;
    the one over the UNTRIMMED type table partitions by (grp, _zsalt) —
    so a mega-vocab slice spreads over ZIPF_SALT_P tasks — and only the
    post-trim window (at most SALT_P * max_rank rows per slice)
    partitions by grp alone."""
    rows = [(1, "a b c a b a", "en", "s0", 0)]
    plan = explain_str(AU.zipf_vocab_audit(_docs(spark, rows)))
    detail = plan.split("\n\n", 1)[1] if "\n\n" in plan else plan
    win_args = [
        b for b in detail.split("\n\n")
        if b.startswith("(") and ") Window" in b.split("\n")[0]
    ]
    assert len(win_args) == 2, plan
    salted = [b for b in win_args if "_zsalt" in b]
    unsalted = [b for b in win_args if "_zsalt" not in b]
    assert len(salted) == 1 and len(unsalted) == 1, plan
    # the salted window ranks as _rk1 (phase 1); the grp-only window
    # consumes phase-1 survivors (its child carries the _rk1 filter)
    assert "_rk1" in salted[0]


def test_zipf_two_phase_equals_single_window_on_mega_vocab(spark):
    """Exactness identity of the salted top-k: on a slice whose
    vocabulary (1000 types) vastly exceeds max_rank=25, the two-phase
    head must reproduce the naive single-window fit bit-for-bit, and a
    power-law slice must still fit near -1."""
    import itertools

    zipf_words = []
    for r in range(1, 1001):
        zipf_words += [f"word{r:04d}"] * max(1, 2000 // r)
    text = " ".join(zipf_words)
    rows = [(1, text, "en", "mega", 0)]
    out = AU.zipf_vocab_audit(_docs(spark, rows), max_rank=25).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_types == 1000
    assert -1.35 < r.zipf_slope < -0.75
    # naive single-window spelling, computed inline as the ground truth
    from pyspark.sql import Window

    docs = _docs(spark, rows)
    freq = (
        docs.select(
            F.col("source").alias("grp"),
            F.explode(F.split(F.trim("text"), r"\s+")).alias("word"),
        )
        .groupBy("grp", "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("grp").orderBy(F.col("freq").desc(), "word")
    head = (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 25)
        .groupBy("grp")
        .agg(
            F.covar_pop(
                F.log(F.col("rank").cast("double")),
                F.log(F.col("freq").cast("double")),
            ).alias("c"),
            F.var_pop(F.log(F.col("rank").cast("double"))).alias("vlr"),
        )
        .first()
    )
    assert r.zipf_slope == round(head.c / head.vlr, 6)


def test_vocab_kl_drift_closed_form_matches_bruteforce(spark):
    """The closed-form (present-aggregate + absent-mass correction) must
    equal the naive per-word KL computed in Python over the same
    smoothing, and the drifted slice must out-score the representative
    one."""
    import math
    from collections import Counter

    rows = [
        (1, "the cat sat on the mat", "en", "rep", 0),
        (2, "the dog sat on the rug", "en", "rep", 0),
        (3, "zzq qqz zqz qzz zzq zzq", "en", "drift", 0),
    ]
    out = {
        r.source: r for r in AU.vocab_kl_drift(_docs(spark, rows)).collect()
    }

    texts = {"rep": rows[0][1] + " " + rows[1][1], "drift": rows[2][1]}
    corpus = Counter()
    per = {}
    for src, t in texts.items():
        c = Counter(t.split())
        per[src] = c
        corpus.update(c)
    a = AU.VOCAB_KL_ALPHA
    v = len(corpus)
    n_total = sum(corpus.values())
    for src, c in per.items():
        n_s = sum(c.values())
        kl = 0.0
        for w in corpus:
            p = (c.get(w, 0) + a) / (n_s + a * v)
            q = (corpus[w] + a) / (n_total + a * v)
            kl += p * math.log(p / q)
        assert out[src].kl_vs_corpus == round(kl, 6), src
        assert out[src].n_tokens == n_s
        assert out[src].n_types == len(c)
    assert out["drift"].kl_vs_corpus > out["rep"].kl_vs_corpus
