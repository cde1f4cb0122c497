"""Behavioral invariants for the round-8 additions on PLANTED data —
``bpe_merges`` (textops.py) and the ``api.knn_label_vote`` front door.
The oracle sweep (test_oracle.py) covers driver-table parity for
bpe_merges; these pin the semantics the oracle can't see failing (a
merge that rewrites the wrong occurrences, an IVF/LSH vote that drifts
from the exact ground truth, a cartesian sneaking into a default path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import api
from m12_kafkastreams_python_azure_spark.operators.similarity import (
    knn_label_vote as knn_exact,
)
from m12_kafkastreams_python_azure_spark.operators.textops import (
    bpe_merges,
    bpe_pair_counts,
)
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bpe_merges_planted_corpus(spark):
    # corpus: "aaab" x3, "ab" x2 — fully hand-computable.
    # chars: a a a b (x3), a b (x2)
    # iter1 pairs: "a a" x6, "a b" x5 -> merge "a a" (cnt 6)
    # after: "aa a b" x3, "a b" x2
    # iter2 pairs: "aa a" x3, "a b" x5 -> merge "a b" (cnt 5)
    # after: "aa ab" x3, "ab" x2
    # iter3 pairs: "aa ab" x3 -> merge "aa ab" (cnt 3)
    docs = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "aaab ab")], "doc_id long, text string"
    )
    rows = bpe_merges(docs, iters=3).collect()
    got = [(r["merge_step"], r["pair"], r["merged"], r["cnt"]) for r in rows]
    assert got == [
        (1, "a a", "aa", 6),
        (2, "a b", "ab", 5),
        (3, "aa ab", "aaab", 3),
    ]


def test_bpe_merges_two_pass_replace_catches_adjacent_runs(spark):
    # "abababab": after merging pair "a b", ALL four occurrences must
    # merge even though greedy single-pass replace on the delimited
    # string would skip every other one (delimiter consumed by the
    # previous match) — the two-pass replace exists exactly for this.
    docs = spark.createDataFrame([(1, "abababab")], "doc_id long, text string")
    rows = bpe_merges(docs, iters=2).collect()
    assert rows[0]["pair"] == "a b" and rows[0]["cnt"] == 4
    # iter2 sees "ab ab ab ab" -> pair ("ab","ab") x3
    assert rows[1]["pair"] == "ab ab" and rows[1]["cnt"] == 3


def test_bpe_merges_first_step_matches_pair_counts(spark):
    # internal consistency: merge #1 IS bpe_pair_counts' rank-1 row
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["the quick brown fox", "the lazy dog the end", "quick quick"]
        )],
        "doc_id long, text string",
    )
    top_pair = bpe_pair_counts(docs, top=1).collect()[0]
    merge1 = bpe_merges(docs, iters=1).collect()[0]
    assert merge1["merged"] == top_pair["pair"]
    assert merge1["cnt"] == top_pair["cnt"]


def test_knn_front_door_ivf_full_probe_matches_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    unlabeled = emb.filter(F.col("vec_id") % 10 == 0)
    labeled = emb.filter(F.col("vec_id") % 10 != 0)
    exact = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in knn_exact(labeled, unlabeled, k=5).collect()
    }
    # full probe (nprobe == train_k) scans every inverted list -> the
    # candidate set equals the exact scan's, so the vote is identical
    ivf = {
        r["query_id"]: (r["pred_label"], r["votes"])
        for r in api.knn_label_vote(
            labeled, unlabeled, method="ivf", k=5, train_k=8, nprobe=8
        ).collect()
    }
    assert ivf == exact


def test_knn_front_door_default_and_lsh_are_cartesian_free(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    unlabeled = emb.filter(F.col("vec_id") % 10 == 0)
    labeled = emb.filter(F.col("vec_id") % 10 != 0)
    for method, kw in (("ivf", {"train_k": 8, "nprobe": 2}), ("lsh", {})):
        plan = _plan(api.knn_label_vote(labeled, unlabeled, method=method, **kw))
        assert "CartesianProduct" not in plan, method
        assert "BroadcastNestedLoopJoin" not in plan, method


def test_knn_front_door_rejects_unknown_method(spark, sf_dir):
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="ivf|lsh|exact"):
        api.knn_label_vote(emb, emb, method="flann")


def test_bpe_encode_planted_corpus(spark):
    # same corpus as the merges test; with iters=2 the learned merges are
    # ("a a" -> aa) then ("a b" -> ab), so "aaab" -> [aa, ab] (2 tokens)
    # and "ab" -> [ab] (1 token)
    from m12_kafkastreams_python_azure_spark.operators.textops import bpe_encode

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab"), (2, "aaab ab")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["tokens_per_word"])
        for r in bpe_encode(docs, iters=2).collect()
    }
    assert got[1] == (3, 5, round(5 / 3, 6))
    assert got[2] == (2, 3, 1.5)
    # iters=3 additionally merges ("aa ab" -> aaab): every word is one token
    full = {
        r["doc_id"]: r["n_tokens"] for r in bpe_encode(docs, iters=3).collect()
    }
    assert full == {1: 3, 2: 2}


def test_pmi_bigrams_planted_corpus(spark):
    # "new york" always co-occurs (PMI max); "the cat"/"the dog" split
    # "the"'s mass (lower PMI). min_count=2 drops singletons.
    from math import log

    from m12_kafkastreams_python_azure_spark.operators.textops import pmi_bigrams

    docs = spark.createDataFrame(
        [
            (1, "new york new york new york"),
            (2, "the cat the cat"),
            (3, "the dog the dog"),
        ],
        "doc_id long, text string",
    )
    rows = pmi_bigrams(docs, min_count=2, top=10).collect()
    by_pair = {(r["w1"], r["w2"]): r for r in rows}
    # corpus: n1 = 14 tokens, n2 = 11 bigrams
    # "new york" c12=3, c(new)=3, c(york)=3 -> pmi = ln((3/11)/((3/14)^2))
    exp_ny = round(log((3 / 11) / ((3 / 14) * (3 / 14))), 6)
    assert by_pair[("new", "york")]["pmi"] == exp_ny
    assert by_pair[("new", "york")]["rank"] == 1
    # "the cat": c12=2, c(the)=4, c(cat)=2
    exp_tc = round(log((2 / 11) / ((4 / 14) * (2 / 14))), 6)
    assert by_pair[("the", "cat")]["pmi"] == exp_tc
    # cross-doc bigram ("york new" within doc 1 counts; "cat the" does) —
    # but nothing spans documents: no ("york", "the") pair exists
    assert ("york", "the") not in by_pair


def test_knn_front_door_ivf_pruned_probe_recovers_planted_labels(spark):
    # pruning must not break labeling where labels MEAN something: two
    # well-separated clusters, 30 labeled points each; every query sits
    # inside one cluster. With 8 lists / 2 probed the probe stage must
    # still rank a same-cluster list first — a centroid-ranking or
    # dropped-list regression would scatter predictions. (No agreement
    # floor on the near-random driver embeddings: there the exact vote's
    # argmax is itself noise, so agreement measures nothing.)
    rows = []
    for i in range(30):  # label 0: x-axis cone
        rows.append((i, [50.0 + i, float(i % 5), 0.0], 0))
    for i in range(30):  # label 1: y-axis cone
        rows.append((100 + i, [float(i % 5), 50.0 + i, 0.0], 1))
    labeled = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = spark.createDataFrame(
        [(1000 + j, [30.0 + j, 1.0, 0.0]) for j in range(5)]
        + [(2000 + j, [1.0, 30.0 + j, 0.0]) for j in range(5)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["query_id"]: r["pred_label"]
        for r in api.knn_label_vote(
            labeled, queries, method="ivf", k=5, train_k=8, nprobe=2
        ).collect()
    }
    assert len(out) == 10
    assert all(out[1000 + j] == 0 for j in range(5))
    assert all(out[2000 + j] == 1 for j in range(5))


def test_bpe_exhausted_merges_are_noops(spark):
    # corpus exhausts mergeable pairs after ONE merge ("a b" -> ab leaves
    # every word a single symbol): iterations 2-3 must be no-ops, not
    # vocab-annihilating empty crossJoins (round-8 review regression)
    from m12_kafkastreams_python_azure_spark.operators.textops import bpe_encode

    docs = spark.createDataFrame(
        [(1, "ab ab"), (2, "ab")], "doc_id long, text string"
    )
    merges = bpe_merges(docs, iters=3).collect()
    assert [(r["merge_step"], r["merged"]) for r in merges] == [(1, "ab")]
    enc = {r["doc_id"]: (r["n_words"], r["n_tokens"])
           for r in bpe_encode(docs, iters=3).collect()}
    assert enc == {1: (2, 2), 2: (1, 1)}  # was: {} before the fix
    # the oracle's chained CTEs must share the no-op semantics
    import duckdb
    import pandas as pd

    from m12_kafkastreams_python_azure_spark.operators.textops import (
        ORACLE_BPE_ENCODE,
        ORACLE_BPE_MERGES,
    )

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": [1, 2], "text": ["ab ab", "ab"]})
    )
    om = con.execute(ORACLE_BPE_MERGES).df()
    assert list(om["merged"]) == ["ab"]
    oe = con.execute(ORACLE_BPE_ENCODE).df().set_index("doc_id")
    assert oe.loc[1, "n_tokens"] == 2 and oe.loc[2, "n_tokens"] == 1


def test_knn_front_door_emits_uncovered_queries_as_null(spark):
    # a query OPPOSITE to every labeled vector flips every LSH sign bit:
    # its bucket holds no labeled candidate, so pre-fix it vanished from
    # the output; now it must surface with pred_label NULL / votes 0
    labeled = spark.createDataFrame(
        [(i, [10.0 + i, 5.0, 1.0], 0) for i in range(6)],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(100, [11.0, 5.5, 1.0]), (200, [-10.0, -5.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    out = {
        r["query_id"]: r
        for r in api.knn_label_vote(
            labeled, queries, method="lsh", k=3, dim=3
        ).collect()
    }
    assert set(out) == {100, 200}
    assert out[100]["pred_label"] == 0 and out[100]["votes"] > 0
    assert out[200]["pred_label"] is None and out[200]["votes"] == 0
    assert out[200]["k_used"] == 3


def test_dedup_keep_best_keeps_highest_quality(spark):
    # docs 1 and 2 share a 20-char prefix and most 3-grams (same cluster);
    # doc 3 is unrelated (singleton). Expected keeper computed with the
    # same quality function, independently of the clustering plumbing.
    from m12_kafkastreams_python_azure_spark.functions.text import (
        quality_score_cols,
    )
    from m12_kafkastreams_python_azure_spark.operators.graph import dedup_keep_best

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base + " 111 222 333 444"),  # numeral tail -> lower alpha ratio
            (2, base),
            (3, "completely different content about spark shuffles here"),
        ],
        "doc_id long, text string",
    )
    q = {
        r["doc_id"]: r["qq"]
        for r in docs.select(
            "doc_id", quality_score_cols(F.col("text"))["quality_score"].alias("qq")
        ).collect()
    }
    expected_keeper = max([1, 2], key=lambda d: (q[d], -d))
    out = {r["doc_id"]: r for r in dedup_keep_best(docs).collect()}
    assert set(out) == {expected_keeper, 3}
    assert out[expected_keeper]["cluster_size"] == 2
    assert out[expected_keeper]["cluster"] == 1  # min-id cluster label
    assert out[3]["cluster_size"] == 1 and out[3]["cluster"] == 3


def test_dedup_keep_best_minhash_path_matches_prefix_on_planted(spark):
    # the production candidate stage must produce the same keep list when
    # the near-dups are blatant (identical docs collide in every band)
    from m12_kafkastreams_python_azure_spark.operators.graph import dedup_keep_best

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, "unrelated words entirely here okay")],
        "doc_id long, text string",
    )
    pfx = {(r["doc_id"], r["cluster"], r["cluster_size"])
           for r in dedup_keep_best(docs, method="prefix").collect()}
    mh = {(r["doc_id"], r["cluster"], r["cluster_size"])
          for r in dedup_keep_best(docs, method="minhash").collect()}
    assert pfx == mh == {(1, 1, 2), (3, 3, 1)}


def test_token_budget_select_matches_global_cumsum(spark):
    # expected keep set derived independently: score every doc with the
    # same quality function, global sort + cumsum in Python, cut at the
    # budget. buckets=4 forces multi-doc buckets and a mid-bucket cut.
    from m12_kafkastreams_python_azure_spark.functions.text import (
        quality_score_cols,
    )
    from m12_kafkastreams_python_azure_spark.operators.curation import (
        token_budget_select,
    )

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "111 222 333 444 555 666",
        "a decent sentence with ordinary words inside it",
        "zz",
        "another perfectly reasonable document with several words",
        "@@ ## $$ %% ^^ &&",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    cols = quality_score_cols(F.col("text"))
    scored = sorted(
        (
            (r["q"], -r["doc_id"], r["doc_id"], r["nt"])
            for r in docs.select(
                "doc_id",
                cols["n_tokens"].alias("nt"),
                cols["quality_score"].alias("q"),
            ).collect()
        ),
        reverse=True,
    )
    budget = 15
    expected, cum = set(), 0
    for q, _, doc_id, nt in scored:
        if cum + nt > budget:
            break
        cum += nt
        expected.add(doc_id)
    got = {
        r["doc_id"]
        for r in token_budget_select(docs, budget=budget, buckets=4).collect()
    }
    assert got == expected and 0 < len(got) < len(texts)


def test_source_overlap_counts_planted_shared_grams(spark):
    # A and B share one 8-word sentence (one 8-gram at stride 1 per doc,
    # deduped per source); C shares nothing
    from m12_kafkastreams_python_azure_spark.operators.audits import source_overlap

    shared = "one two three four five six seven eight"
    docs = spark.createDataFrame(
        [
            (1, shared + " aaa bbb", "A"),
            (2, shared + " ccc ddd", "B"),
            (3, "totally disjoint words here never overlap anything else", "C"),
        ],
        "doc_id long, text string, source string",
    )
    rows = source_overlap(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["source_a"], r["source_b"]) == ("A", "B")
    # grams per doc: 10 words -> 3 overlapping 8-grams; shared ones are
    # exactly the ones fully inside the common prefix: just gram@pos0
    assert r["shared_grams"] == 1
    assert r["containment"] == round(1 / 3, 6)


def test_source_length_drift_flags_the_outlier_source(spark):
    from m12_kafkastreams_python_azure_spark.operators.audits import (
        source_length_drift,
    )

    short = " ".join(["w"] * 8)     # bucket 1
    long = " ".join(["w"] * 200)    # bucket 25
    docs = spark.createDataFrame(
        [(i, short, "A") for i in range(3)]
        + [(100 + i, long, "B") for i in range(2)],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in source_length_drift(docs).collect()}
    # cdf_A hits 1.0 at bucket 1 while the corpus is at 3/5 -> ks = 0.4;
    # cdf_B is 0 through bucket 24 while the corpus sits at 3/5 -> ks = 0.6
    assert out["A"]["n_docs"] == 3 and out["A"]["ks_stat"] == 0.4
    assert out["B"]["n_docs"] == 2 and out["B"]["ks_stat"] == 0.6


def test_weighted_budget_select_matches_global_cumsum_on_weights(spark):
    # The round-15 composition (VERDICT r14 #6): selection must equal the
    # naive global (weight desc, doc_id) cumsum cut at the budget, with
    # weights exactly as soft_dedup_weights publishes them. Duplicated
    # texts drive weights apart so the ranking is non-trivial; buckets=4
    # forces multi-doc buckets and a mid-bucket cut.
    from m12_kafkastreams_python_azure_spark.operators.curation import (
        weighted_budget_select,
    )
    from m12_kafkastreams_python_azure_spark.operators.dedup import (
        soft_dedup_weights,
    )

    texts = [
        "aa bb cc dd ee ff gg hh",       # unique content -> high weight
        "aa bb cc dd ee ff gg hh",       # exact duplicate -> lowered
        "aa bb cc dd ee ff gg hh",       # third copy -> lowered
        "pp qq rr ss tt uu vv ww",       # unique
        "xx yy zz aa bb cc dd ee",       # partially shared grams
        "mm nn oo pp qq rr ss tt",       # partially shared grams
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    weights = {
        r["doc_id"]: r["weight"] for r in soft_dedup_weights(docs).collect()
    }
    assert weights[0] < weights[3]  # duplication lowered the copies' weight
    ranked = sorted(weights, key=lambda d: (-weights[d], d))
    budget = 20
    expected, cum = set(), 0
    for doc_id in ranked:
        nt = len(texts[doc_id].split())
        if cum + nt > budget:
            break
        cum += nt
        expected.add(doc_id)
    got = {
        r["doc_id"]
        for r in weighted_budget_select(docs, budget=budget, buckets=4).collect()
    }
    assert got == expected and 0 < len(got) < len(texts)
