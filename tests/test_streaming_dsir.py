"""Streaming DSIR scoring: fit-once persisted models, stream == batch
weights and selection, replay idempotence, readStream end-to-end."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import dsir as DS
from m12_kafkastreams_python_azure_spark.sources.readers import load_table
from m12_kafkastreams_python_azure_spark.streaming.advanced import (
    dsir_batch_processor,
    read_dsir_selection,
    read_dsir_weights,
    start_dsir_stream,
)

SF = "/root/testdata/sf0.001"


def _splits(spark):
    docs = load_table(spark, SF, "documents")
    tgt = docs.filter(F.col("source").isin(*DS.DSIR_TARGET_SOURCES))
    raw = docs.filter(~F.col("source").isin(*DS.DSIR_TARGET_SOURCES))
    return docs, tgt, raw


def _weight_rows(df):
    return {
        (r.doc_id, round(r.log_weight, 9), r.n_grams) for r in df.collect()
    }


def test_stream_weights_equal_batch_weights(spark, tmp_path):
    docs, tgt, raw = _splits(spark)
    state = str(tmp_path / "state")
    proc = dsir_batch_processor(tgt, raw, state)
    for i in range(3):
        proc(raw.filter(F.col("doc_id") % 3 == i).select("doc_id", "text"), i)
    got = _weight_rows(read_dsir_weights(spark, state).drop("batch", "gumbel_key"))
    want = _weight_rows(DS.dsir_weights(tgt, raw))
    assert got == want

    # cumulative Gumbel-top-n == the batch resample (same models/keys)
    sel = {r.doc_id for r in read_dsir_selection(spark, state, 25).collect()}
    batch_sel = {r.doc_id for r in DS.dsir_resample(tgt, raw, n=25).collect()}
    assert sel == batch_sel


def test_models_fit_once_and_replay_idempotent(spark, tmp_path):
    docs, tgt, raw = _splits(spark)
    state = str(tmp_path / "state")
    proc = dsir_batch_processor(tgt, raw, state)
    s0 = raw.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    s1 = raw.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    proc(s0, 0)
    proc(s1, 1)
    before = _weight_rows(read_dsir_weights(spark, state).drop("batch", "gumbel_key"))
    # model files untouched by a second processor over the same state
    tdir = os.path.join(state, "models", "target")
    mtimes = {
        f: os.path.getmtime(os.path.join(tdir, f))
        for f in os.listdir(tdir)
        if not f.startswith(("_", "."))
    }
    proc2 = dsir_batch_processor(tgt, raw, state)
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(tdir, f)) == t
    # at-least-once redelivery rewrites its partition, never double-counts
    proc2(s0, 0)
    assert (
        _weight_rows(read_dsir_weights(spark, state).drop("batch", "gumbel_key"))
        == before
    )


def test_unseen_bucket_shard_scores_smoothed_not_null(spark, tmp_path):
    """A shard gram hashing to a bucket absent from BOTH fitting sets
    must get the smoothed probability (spine-complete models), never a
    NULL weight."""
    tgt = spark.createDataFrame(
        [(1, "alpha beta", "t")], "doc_id long, text string, source string"
    )
    raw = spark.createDataFrame(
        [(2, "gamma delta", "r")], "doc_id long, text string, source string"
    )
    state = str(tmp_path / "state")
    proc = dsir_batch_processor(tgt, raw, state)
    shard = spark.createDataFrame(
        [(10, "totally unseen words here")], "doc_id long, text string"
    )
    proc(shard, 0)
    rows = read_dsir_weights(spark, state).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.log_weight is not None and r.n_grams == 7
    # both models have equal totals (2 grams each), so every unseen
    # bucket scores ln(a/(nt+aB)) - ln(a/(nr+aB)) = 0 exactly
    assert abs(r.log_weight) < 1e-12


def test_readstream_end_to_end(spark, tmp_path):
    docs, tgt, raw = _splits(spark)
    src = str(tmp_path / "src")
    raw.select("doc_id", "text").coalesce(2).write.mode("overwrite").parquet(src)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_dsir_stream(stream, tgt, raw, state, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _weight_rows(read_dsir_weights(spark, state).drop("batch", "gumbel_key"))
    assert got == _weight_rows(DS.dsir_weights(tgt, raw))
