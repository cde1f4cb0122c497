"""Behavioral invariants for the round-7 additions on PLANTED data —
``knn_label_vote`` (similarity.py), ``bpe_pair_counts`` (textops.py),
``dedup_stats`` (dedup.py). The oracle sweep (test_oracle.py) covers
driver-table parity; these pin the semantics the oracle can't see
failing (a vote that lands on the wrong planted cluster, a fabricated
pair from a 1-char word, an audit row that miscounts a planted clone).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.dedup import dedup_stats
from m12_kafkastreams_python_azure_spark.operators.similarity import knn_label_vote
from m12_kafkastreams_python_azure_spark.operators.textops import bpe_pair_counts


def test_knn_vote_follows_planted_clusters(spark):
    # two well-separated clusters on orthogonal axes; queries sit inside
    # one cluster each -> the vote must recover that cluster's label
    rows = []
    for i in range(6):  # label 0: x-axis
        rows.append((i, [10.0 + i, 0.1 * i, 0.0], 0))
    for i in range(6):  # label 1: y-axis
        rows.append((100 + i, [0.1 * i, 10.0 + i, 0.0], 1))
    labeled = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    queries = spark.createDataFrame(
        [(1000, [5.0, 0.2, 0.0]), (1001, [0.2, 5.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r["query_id"]: r for r in
           knn_label_vote(labeled, queries, k=3, dim=3).collect()}
    assert out[1000]["pred_label"] == 0
    assert out[1001]["pred_label"] == 1
    for r in out.values():
        assert r["votes"] == 3 and r["k_used"] == 3


def test_knn_vote_tie_breaks_to_smaller_label(spark):
    # k=2 with one neighbor of each label equidistant -> tie -> label 0
    labeled = spark.createDataFrame(
        [(1, [1.0, 1.0], 1), (2, [1.0, 1.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 1.0])], "vec_id long, embedding array<float>"
    )
    out = knn_label_vote(labeled, queries, k=2, dim=2).collect()
    assert len(out) == 1
    assert out[0]["pred_label"] == 0 and out[0]["votes"] == 1


def test_bpe_pairs_counts_planted_corpus(spark):
    # "abab abab" x2 docs + "xy": pair counts are fully enumerable
    docs = spark.createDataFrame(
        [(1, "abab abab"), (2, "abab abab"), (3, "xy x")],
        "doc_id long, text string",
    )
    got = {r["pair"]: (r["cnt"], r["merge_rank"])
           for r in bpe_pair_counts(docs).collect()}
    # each "abab" word: ab(x2), ba(x1); 4 words -> ab:8, ba:4; xy:1.
    # single-char word "x" must contribute NOTHING (the descending
    # sequence(1, 0) trap).
    assert got == {"ab": (8, 1), "ba": (4, 2), "xy": (1, 3)}


def test_bpe_top_n_is_a_take_ordered_plan(spark, sf_dir):
    from m12_kafkastreams_python_azure_spark.operators.textops import (
        q_bpe_pair_counts,
    )

    plan = q_bpe_pair_counts(spark, sf_dir)._jdf.queryExecution().toString()
    assert "TakeOrderedAndProject" in plan


def test_dedup_stats_counts_planted_clones(spark):
    docs = spark.createDataFrame(
        [
            (1, "same text", "web"),
            (2, "same text", "web"),
            (3, "same text", "web"),
            (4, "other", "web"),
            (5, "unique a", "books"),
            (6, "unique b", "books"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in dedup_stats(docs).collect()}
    web, books = out["web"], out["books"]
    assert (web["n_docs"], web["n_distinct"], web["max_clone"]) == (4, 2, 3)
    assert web["dup_factor"] == 2.0
    assert (books["n_docs"], books["n_distinct"], books["max_clone"]) == (2, 2, 1)
    assert books["dup_factor"] == 1.0


def test_bm25_rewards_tf_and_ignores_nonmatching_docs(spark):
    from m12_kafkastreams_python_azure_spark.operators.retrieval import (
        bm25_retrieval,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "nothing relevant in here at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           bm25_retrieval(docs, query_terms=["spark"]).collect()}
    assert set(out) == {1, 2}  # doc 3 never appears
    assert out[1]["bm25"] > out[2]["bm25"]  # tf saturates but still orders
    assert out[1]["rank"] == 1 and out[2]["rank"] == 2


def test_bm25_rarer_term_scores_higher_idf(spark):
    from m12_kafkastreams_python_azure_spark.operators.retrieval import (
        bm25_retrieval,
    )

    # 'rare' hits 1 of 10 docs, 'common' hits all 10; same tf, same doc
    # length -> the rare-term doc must outrank every common-only doc
    rows = [(i, "common pad pad pad") for i in range(9)]
    rows.append((9, "rare pad pad pad"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_retrieval(docs, query_terms=["rare", "common"]).collect()
    top = min(out, key=lambda r: r["rank"])
    assert top["doc_id"] == 9


def test_sq_error_stats_zero_error_on_axis_grid(spark):
    from m12_kafkastreams_python_azure_spark.operators.pq import sq_error_stats

    # values land EXACTLY on the 255-level grid (min=0, max=255 per dim,
    # integer values) -> reconstruction is exact; constant dim (third)
    # exercises the mx == mn guard
    rows = [(i, [float(i * 51), float(255 - i * 51), 7.0]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    for r in sq_error_stats(emb).collect():
        assert r["n_dims"] == 3
        assert r["mean_abs_err"] == 0.0
        assert r["cos_orig_dequant"] == 1.0


def test_sq_error_is_bounded_by_half_step(spark, sf_dir):
    from m12_kafkastreams_python_azure_spark.operators.pq import (
        SQ_LEVELS,
        sq_error_stats,
    )
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    stats = sq_error_stats(emb)
    # per-element error is <= (mx-mn)/255/2; bound the mean by the worst
    # dimension's half-step on the real corpus
    ex = emb.select(F.posexplode("embedding").alias("i", "v"))
    worst = (
        ex.groupBy("i")
        .agg(((F.max("v") - F.min("v")) / SQ_LEVELS / 2).alias("half"))
        .agg(F.max("half"))
        .first()[0]
    )
    bad = stats.filter(F.col("mean_abs_err") > worst + 1e-9).count()
    assert bad == 0
    # quantization at 8 bits must not meaningfully rotate vectors
    assert stats.agg(F.min("cos_orig_dequant")).first()[0] > 0.999
