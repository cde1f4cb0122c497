"""Streaming temperature sampling: fit-once rates, stream == batch
kept counts, shard-invariance, replay idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import curation as CU
from m12_kafkastreams_python_azure_spark.sources.readers import load_table
from m12_kafkastreams_python_azure_spark.streaming.advanced import (
    read_temperature_kept,
    start_temperature_stream,
    temperature_batch_processor,
)

SF = "/root/testdata/sf0.001"


def test_stream_kept_counts_equal_batch(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    state = str(tmp_path / "state")
    proc = temperature_batch_processor(docs, state)
    for i in range(3):
        proc(docs.filter(F.col("doc_id") % 3 == i), i)
    got = {
        (r.lang, r.cnt)
        for r in read_temperature_kept(spark, state)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    want = {
        (r.lang, r.n_kept) for r in CU.temperature_sample(docs).collect()
    }
    assert got == want


def test_sharding_never_changes_the_kept_set(spark, tmp_path):
    """The keep decision depends only on (doc_id, rate): 1-shard and
    3-shard replays of the same corpus keep IDENTICAL doc sets."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    s1, s3 = str(tmp_path / "one"), str(tmp_path / "three")
    p1 = temperature_batch_processor(docs, s1)
    p1(docs, 0)
    p3 = temperature_batch_processor(docs, s3)
    for i in range(3):
        p3(docs.filter(F.col("doc_id") % 3 == i), i)
    one = {r.doc_id for r in read_temperature_kept(spark, s1).collect()}
    three = {r.doc_id for r in read_temperature_kept(spark, s3).collect()}
    assert one == three and one


def test_replay_idempotent_and_rates_fit_once(spark, tmp_path):
    import os

    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    state = str(tmp_path / "state")
    proc = temperature_batch_processor(docs, state)
    shard = docs.filter(F.col("doc_id") % 2 == 0)
    proc(shard, 0)
    before = {r.doc_id for r in read_temperature_kept(spark, state).collect()}
    rdir = os.path.join(state, "rates")
    mtimes = {
        f: os.path.getmtime(os.path.join(rdir, f))
        for f in os.listdir(rdir)
        if not f.startswith(("_", "."))
    }
    proc2 = temperature_batch_processor(docs, state)
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(rdir, f)) == t
    proc2(shard, 0)
    assert {r.doc_id for r in read_temperature_kept(spark, state).collect()} == before


def test_readstream_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text", "lang")
    src = str(tmp_path / "src")
    docs.coalesce(2).write.mode("overwrite").parquet(src)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_temperature_stream(stream, docs, state, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.lang, r.cnt)
        for r in read_temperature_kept(spark, state)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    want = {(r.lang, r.n_kept) for r in CU.temperature_sample(docs).collect()}
    assert got == want
