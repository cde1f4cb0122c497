"""Streaming CCNet bucketing: fit-once artifacts, shard-invariance,
stream==batch score parity, replay idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import corpus as C
from m12_kafkastreams_python_azure_spark.sources.readers import load_table
from m12_kafkastreams_python_azure_spark.streaming.advanced import (
    ccnet_batch_processor,
    read_ccnet_buckets,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text", "lang")


def _rows(df):
    return {
        (r.doc_id, r.lang, r.bucket, r.avg_log2p) for r in df.collect()
    }


def test_sharding_never_changes_the_buckets(spark, tmp_path):
    """A doc's bucket is a pure function of (grams, fixed model, fixed
    cutoffs): a 1-shard and a 3-shard replay of the same corpus assign
    IDENTICAL per-doc buckets."""
    docs = _docs(spark)
    s1, s3 = str(tmp_path / "one"), str(tmp_path / "three")
    p1 = ccnet_batch_processor(docs, s1)
    p1(docs, 0)
    p3 = ccnet_batch_processor(docs, s3)
    for i in range(3):
        p3(docs.filter(F.col("doc_id") % 3 == i), i)
    a = _rows(read_ccnet_buckets(spark, s1).drop("batch"))
    b = _rows(read_ccnet_buckets(spark, s3).drop("batch"))
    assert a == b and len(a) == docs.count()


def test_stream_scores_equal_the_batch_scorer(spark, tmp_path):
    """Scoring against the persisted fit-once model must reproduce
    bigram_lm_score's per-doc values exactly (the model was fit on the
    same corpus, so every bigram is present and no smoothing paths
    diverge)."""
    docs = _docs(spark)
    state = str(tmp_path / "state")
    proc = ccnet_batch_processor(docs, state)
    for i in range(2):
        proc(docs.filter(F.col("doc_id") % 2 == i), i)
    got = {
        (r.doc_id, r.avg_log2p)
        for r in read_ccnet_buckets(spark, state).collect()
    }
    want = {
        (r.doc_id, r.avg_log2p)
        for r in C.bigram_lm_score(docs).collect()
    }
    assert got == want


def test_stream_rollup_matches_batch_approx_within_tie_band(spark, tmp_path):
    """Aggregating the stream's per-doc buckets reproduces
    ccnet_buckets(thresholds=\"approx\") per-(lang, bucket) counts
    within the tie width at the cutoffs (two independent
    percentile_approx fits over the same scores may split a tied cohort
    differently; the scores themselves are equal — previous test)."""
    docs = _docs(spark)
    state = str(tmp_path / "state")
    proc = ccnet_batch_processor(docs, state)
    for i in range(3):
        proc(docs.filter(F.col("doc_id") % 3 == i), i)
    got = {
        (r.lang, r.bucket): r.n
        for r in read_ccnet_buckets(spark, state)
        .groupBy("lang", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r.lang, r.bucket): r.n_docs
        for r in C.ccnet_buckets(docs, thresholds="approx").collect()
    }
    ties = {
        r.lang: r.w
        for r in (
            C.bigram_lm_score(docs)
            .join(docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang", "avg_log2p")
            .count()
            .groupBy("lang")
            .agg(F.max("count").alias("w"))
            .collect()
        )
    }
    assert set(got) == set(want)
    for key, n in want.items():
        assert abs(got[key] - n) <= max(2, ties[key[0]]), (key, got[key], n)


def test_fit_once_and_replay_idempotent(spark, tmp_path):
    docs = _docs(spark)
    state = str(tmp_path / "state")
    proc = ccnet_batch_processor(docs, state)
    s0 = docs.filter(F.col("doc_id") % 2 == 0)
    s1 = docs.filter(F.col("doc_id") % 2 == 1)
    proc(s0, 0)
    proc(s1, 1)
    before = _rows(read_ccnet_buckets(spark, state).drop("batch"))
    cutdir = f"{state}/model/cutoffs"
    mtimes = {
        f: os.path.getmtime(os.path.join(cutdir, f))
        for f in os.listdir(cutdir)
    }
    # a second processor over the same state must NOT refit...
    proc2 = ccnet_batch_processor(docs, state)
    assert mtimes == {
        f: os.path.getmtime(os.path.join(cutdir, f))
        for f in os.listdir(cutdir)
    }
    # ...and an at-least-once replay of a batch must not change the rows
    proc2(s0, 0)
    after = _rows(read_ccnet_buckets(spark, state).drop("batch"))
    assert after == before


def test_novel_vocab_docs_route_to_unscored_not_dropped(spark, tmp_path):
    """ADVICE r13: a streamed doc with entirely novel vocabulary (no
    bigram in the fit model) must not silently vanish from bucket
    output — it routes to the explicit 'unscored' bucket, and every
    input doc appears in exactly one bucket. Same for a language the
    fit corpus never saw (no cutoffs row)."""
    fit = _docs(spark)
    state = str(tmp_path / "state")
    proc = ccnet_batch_processor(fit, state)
    novel = spark.createDataFrame(
        [
            (9_000_001, "zzqx1 zzqx2 zzqx3 zzqx4 zzqx5", "en"),
            (9_000_002, "qqww1 qqww2 qqww3", "xx_novel_lang"),
        ],
        "doc_id long, text string, lang string",
    )
    batch = fit.limit(5).unionByName(novel)
    proc(batch, 0)
    out = {r.doc_id: r for r in read_ccnet_buckets(spark, state).collect()}
    assert len(out) == 7  # 5 fit docs + 2 novel: nothing dropped
    assert out[9_000_001].bucket == "unscored"
    assert out[9_000_001].avg_log2p is None
    assert out[9_000_002].bucket == "unscored"
    assert all(
        out[r.doc_id].bucket in ("head", "middle", "tail")
        for r in fit.limit(5).collect()
    )
