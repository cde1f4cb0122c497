"""Streaming decontamination (VERDICT r10 #4): stream == batch contam
rows after every micro-batch, bloom built once, replay idempotence, and
a real readStream end-to-end run."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import corpus as C
from m12_kafkastreams_python_azure_spark.sources.readers import load_table
from m12_kafkastreams_python_azure_spark.streaming.advanced import (
    decontaminate_batch_processor,
    read_contaminated,
    start_decontaminate_stream,
)

SF = "/root/testdata/sf0.001"


def _splits(spark):
    docs = load_table(spark, SF, "documents")
    ev = docs.filter(F.col("doc_id") % C.EVAL_MOD == 0)
    train = docs.filter(F.col("doc_id") % C.EVAL_MOD != 0)
    return docs, ev, train


def _rows(df):
    return {
        (r.doc_id, r.n_collisions, r.n_grams, r.contam_ratio)
        for r in df.collect()
    }


def test_stream_equals_batch_after_every_batch(spark, tmp_path):
    docs, ev, train = _splits(spark)
    state = str(tmp_path / "state")
    proc = decontaminate_batch_processor(ev, state)
    shards = [
        train.filter(F.col("doc_id") % 3 == i).select("doc_id", "text")
        for i in range(3)
    ]
    want_all = _rows(C.decontaminate_bloom(docs))
    assert want_all, "fixture must have contaminated docs"
    seen = None
    for i, shard in enumerate(shards):
        proc(shard, i)
        got = _rows(read_contaminated(spark, state).drop("batch"))
        seen = shard if seen is None else seen.unionByName(shard)
        seen_ids = {r.doc_id for r in seen.select("doc_id").collect()}
        want_so_far = {t for t in want_all if t[0] in seen_ids}
        assert got == want_so_far, f"batch {i} mismatch"
    assert _rows(read_contaminated(spark, state).drop("batch")) == want_all


def test_replay_is_idempotent_and_bloom_built_once(spark, tmp_path):
    docs, ev, train = _splits(spark)
    state = str(tmp_path / "state")
    proc = decontaminate_batch_processor(ev, state)
    s0 = train.filter(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    s1 = train.filter(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    proc(s0, 0)
    proc(s1, 1)
    before = _rows(read_contaminated(spark, state).drop("batch"))
    # at-least-once redelivery: batch 0 arrives again
    proc(s0, 0)
    assert _rows(read_contaminated(spark, state).drop("batch")) == before

    # the eval gram state is written once at construction; a SECOND
    # processor over the same state_dir must reuse it (and agree)
    mtimes = {
        f: os.path.getmtime(os.path.join(state, "eval_grams", f))
        for f in os.listdir(os.path.join(state, "eval_grams"))
        if not f.startswith("_") and not f.startswith(".")
    }
    proc2 = decontaminate_batch_processor(ev, state)
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(state, "eval_grams", f)) == t
    proc2(s0, 0)
    assert _rows(read_contaminated(spark, state).drop("batch")) == before


def test_readstream_end_to_end(spark, tmp_path):
    docs, ev, train = _splits(spark)
    src = str(tmp_path / "src")
    train.select("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(src)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_decontaminate_stream(stream, ev, state, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _rows(read_contaminated(spark, state).drop("batch"))
    assert got == _rows(C.decontaminate_bloom(docs))
