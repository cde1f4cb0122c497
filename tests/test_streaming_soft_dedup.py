"""Streaming soft-dedup weights vs a frozen reference corpus: fit-once
artifacts, stream==batch parity, shard invariance, replay idempotence,
the membership-free estimator, and the novel-gram (left-join) path."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import dedup as D
from m12_kafkastreams_python_azure_spark.sources.readers import load_table
from m12_kafkastreams_python_azure_spark.streaming.advanced import (
    read_soft_dedup_weights,
    soft_dedup_batch_processor,
)

SF = "/root/testdata/sf0.001"


def _ref(spark):
    return load_table(spark, SF, "documents").select("doc_id", "text")


def _rows(df):
    return {
        (r.doc_id, r.n_grams, r.commonness, r.weight) for r in df.collect()
    }


def test_every_arriving_doc_gets_a_weight(spark, tmp_path):
    """Gate-free contract: one output row per input doc, weights in
    (0, 1]."""
    ref = _ref(spark)
    state = str(tmp_path / "s")
    proc = soft_dedup_batch_processor(ref, state)
    proc(ref, 0)
    out = read_soft_dedup_weights(spark, state)
    assert out.count() == ref.count()
    bounds = out.agg(F.min("weight"), F.max("weight")).first()
    assert 0.0 < bounds[0] <= bounds[1] <= 1.0


def test_sharding_and_replay_are_invariant(spark, tmp_path):
    """A doc's weight is a pure function of (its grams, the frozen
    artifacts): 1-shard vs 3-shard delivery produces identical weight
    sets, and replaying a batch id overwrites instead of duplicating."""
    ref = _ref(spark)
    s1, s3 = str(tmp_path / "one"), str(tmp_path / "three")
    p1 = soft_dedup_batch_processor(ref, s1)
    p1(ref, 0)
    p3 = soft_dedup_batch_processor(ref, s3)
    for i in range(3):
        p3(ref.filter(F.col("doc_id") % 3 == i), i)
    r1 = _rows(read_soft_dedup_weights(spark, s1).drop("batch"))
    r3 = _rows(read_soft_dedup_weights(spark, s3).drop("batch"))
    assert r1 == r3 and len(r1) > 0
    # at-least-once replay: re-processing shard 1 changes nothing
    p3(ref.filter(F.col("doc_id") % 3 == 1), 1)
    assert _rows(read_soft_dedup_weights(spark, s3).drop("batch")) == r3


def test_stream_equals_direct_batch_call(spark, tmp_path):
    """The foreachBatch path must equal a direct soft_dedup_against
    call over the same artifacts (stream == batch)."""
    ref = _ref(spark)
    state = str(tmp_path / "s")
    proc = soft_dedup_batch_processor(ref, state)
    proc(ref, 0)
    dfreq, meta = D.build_soft_dedup_ref(ref)
    direct = D.soft_dedup_against(ref, dfreq, meta)
    assert _rows(read_soft_dedup_weights(spark, state).drop("batch")) == _rows(
        direct
    )


def test_duplicated_reference_content_lowers_arriving_weight(spark, tmp_path):
    """Duplication in the REFERENCE is the commonness signal: a doc
    matching content the reference holds many times must weigh less
    than a doc matching content held once, and a fully-novel doc must
    score commonness 0 -> weight 1.0 (the left-join miss path)."""
    common = "aa bb cc dd ee ff gg hh"
    rare = "pp qq rr ss tt uu vv ww"
    rows = [(i, common) for i in range(10)] + [(100, rare)]
    ref = spark.createDataFrame(rows, "doc_id long, text string")
    arriving = spark.createDataFrame(
        [
            (1000, common),                      # held 10x
            (1001, rare),                        # held once
            (1002, "m0 m1 m2 m3 m4 m5 m6 m7"),   # never held
        ],
        "doc_id long, text string",
    )
    state = str(tmp_path / "s")
    proc = soft_dedup_batch_processor(ref, state)
    proc(arriving, 0)
    out = {r.doc_id: r for r in read_soft_dedup_weights(spark, state).collect()}
    assert out[1000].weight < out[1001].weight < out[1002].weight
    assert out[1002].commonness == 0.0 and out[1002].weight == 1.0


def test_estimator_is_membership_free(spark):
    """Against a frozen reference the estimator is df/N (the doc is not
    a member), NOT the in-corpus (df-1)/(N-1): scoring a doc identical
    to the single reference doc must give commonness 1.0, where the
    in-corpus operator on that 1-doc corpus gives 0."""
    ref = spark.createDataFrame(
        [(1, "aa bb cc dd ee")], "doc_id long, text string"
    )
    dfreq, meta = D.build_soft_dedup_ref(ref)
    against = D.soft_dedup_against(ref, dfreq, meta).first()
    assert against.commonness == 1.0
    in_corpus = D.soft_dedup_weights(ref).first()
    assert in_corpus.commonness == 0.0
