"""Streaming containment vs a fixed reference corpus: fit-once
artifacts, stream==batch parity, shard invariance, replay idempotence,
planted-excerpt recall, and the reference-side duplicate law."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import dedup as D
from m12_kafkastreams_python_azure_spark.sources.readers import load_table
from m12_kafkastreams_python_azure_spark.streaming.advanced import (
    containment_batch_processor,
    read_containment_matches,
)

SF = "/root/testdata/sf0.001"


def _ref(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def _excerpts(spark, ref, every: int = 10, shift: int = 5_000_000):
    """Prefix excerpts (60% of tokens) of every ``every``-th reference
    doc — the docs_with_planted_contained geometry, as an arriving
    stream."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    keep = F.ceil(F.size(toks) * F.lit(0.6)).cast("int")
    return ref.filter(F.col("doc_id") % every == 0).select(
        (F.col("doc_id") + F.lit(shift)).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, keep)).alias("text"),
    )


def _rows(df):
    return {
        (r.doc_id, r.ref_id, r.shared_grams, r.containment)
        for r in df.collect()
    }


def test_planted_excerpts_match_their_sources(spark, tmp_path):
    """Every streamed prefix excerpt must match its source doc at full
    containment (its grams are a subset of the source's)."""
    ref = _ref(spark)
    new = _excerpts(spark, ref)
    state = str(tmp_path / "s")
    proc = containment_batch_processor(ref, state)
    proc(new, 0)
    out = read_containment_matches(spark, state)
    matched = {
        r.doc_id: r for r in out.collect() if r.ref_id == r.doc_id - 5_000_000
    }
    assert len(matched) == new.count()
    assert all(r.containment == 1.0 for r in matched.values())
    assert all(r.containment_new == 1.0 for r in matched.values())


def test_sharding_and_replay_are_invariant(spark, tmp_path):
    """A doc's matches are a pure function of (its grams, the frozen
    artifacts): 1-shard vs 3-shard delivery produces identical match
    sets, and replaying a batch id overwrites instead of duplicating."""
    ref = _ref(spark)
    new = _excerpts(spark, ref)
    s1, s3 = str(tmp_path / "one"), str(tmp_path / "three")
    p1 = containment_batch_processor(ref, s1)
    p1(new, 0)
    p3 = containment_batch_processor(ref, s3)
    for i in range(3):
        p3(new.filter(F.col("doc_id") % 3 == i), i)
    r1 = _rows(read_containment_matches(spark, s1).drop("batch"))
    r3 = _rows(read_containment_matches(spark, s3).drop("batch"))
    assert r1 == r3 and len(r1) > 0
    # at-least-once replay: re-processing shard 1 changes nothing
    p3(new.filter(F.col("doc_id") % 3 == 1), 1)
    assert _rows(read_containment_matches(spark, s3).drop("batch")) == r3


def test_stream_equals_direct_batch_call(spark, tmp_path):
    """The foreachBatch path must equal a direct containment_against
    call over the same artifacts (stream == batch)."""
    ref = _ref(spark)
    new = _excerpts(spark, ref)
    state = str(tmp_path / "s")
    proc = containment_batch_processor(ref, state)
    proc(new, 0)
    rare, sizes, hot = D.build_containment_ref(ref)
    direct = D.containment_against(new, rare, sizes, hot)
    assert _rows(read_containment_matches(spark, state).drop("batch")) == _rows(
        direct
    )


def test_reference_duplicates_collapse_before_the_df_guard(spark, tmp_path):
    """The duplicate law on the reference side: a 10x-replicated
    reference must not push its grams past max_df and erase the match —
    the excerpt still matches the min-id representative at containment
    1.0."""
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc wd we wf wg wh wi wj"
    rows = [(i * 7, base + f" tail{i}a tail{i}b tail{i}c") for i in range(3)]
    ref1 = spark.createDataFrame(rows, "doc_id long, text string")
    rep = ref1
    for i in range(1, 11):
        rep = rep.unionByName(
            ref1.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1000))
        )
    new = spark.createDataFrame(
        [(9_000_000, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "s")
    proc = containment_batch_processor(rep, state, max_df=8)
    proc(new, 0)
    out = read_containment_matches(spark, state).collect()
    assert any(r.containment_new == 1.0 for r in out)
    # matches are against representatives (the 1x ids), never replicas
    assert all(r.ref_id < 1000 for r in out)
