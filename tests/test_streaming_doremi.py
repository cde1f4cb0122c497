"""Streaming DoReMi mixture resampling: fit-once rates (the LM-scored
mixture weights), stream == batch kept counts, shard-invariance, replay
idempotence — the eighth member of the streaming curation set, pinned
to the same laws as the other seven (frozen-reference rule: the keep
decision is a pure function of (doc_id, the fixed rates))."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import curation as CU
from m12_kafkastreams_python_azure_spark.sources.readers import load_table
from m12_kafkastreams_python_azure_spark.streaming.advanced import (
    doremi_batch_processor,
    read_doremi_kept,
    start_doremi_stream,
)

SF = "/root/testdata/sf0.001"

COLS = ("doc_id", "text", "source")


def test_stream_kept_counts_equal_batch(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select(*COLS)
    state = str(tmp_path / "state")
    proc = doremi_batch_processor(docs, state)
    for i in range(3):
        proc(docs.filter(F.col("doc_id") % 3 == i), i)
    got = {
        (r.source, r.cnt)
        for r in read_doremi_kept(spark, state)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    want = {
        (r.source, r.n_kept)
        for r in CU.doremi_resample(docs).collect()
        if r.n_kept > 0
    }
    got = {g for g in got if g[1] > 0}
    assert got == want and got


def test_sharding_never_changes_the_kept_set(spark, tmp_path):
    """The keep decision depends only on (doc_id, rate): 1-shard and
    3-shard replays of the same corpus keep IDENTICAL doc sets."""
    docs = load_table(spark, SF, "documents").select(*COLS)
    s1, s3 = str(tmp_path / "one"), str(tmp_path / "three")
    p1 = doremi_batch_processor(docs, s1)
    p1(docs, 0)
    p3 = doremi_batch_processor(docs, s3)
    for i in range(3):
        p3(docs.filter(F.col("doc_id") % 3 == i), i)
    one = {r.doc_id for r in read_doremi_kept(spark, s1).collect()}
    three = {r.doc_id for r in read_doremi_kept(spark, s3).collect()}
    assert one == three and one


def test_replay_idempotent_and_rates_fit_once(spark, tmp_path):
    import os

    docs = load_table(spark, SF, "documents").select(*COLS)
    state = str(tmp_path / "state")
    proc = doremi_batch_processor(docs, state)
    shard = docs.filter(F.col("doc_id") % 2 == 0)
    proc(shard, 0)
    before = {r.doc_id for r in read_doremi_kept(spark, state).collect()}
    rdir = os.path.join(state, "rates")
    mtimes = {
        f: os.path.getmtime(os.path.join(rdir, f))
        for f in os.listdir(rdir)
        if not f.startswith(("_", "."))
    }
    proc2 = doremi_batch_processor(docs, state)
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(rdir, f)) == t
    proc2(shard, 0)
    assert {r.doc_id for r in read_doremi_kept(spark, state).collect()} == before


def test_rates_are_weights_driven_not_counts_driven(spark, tmp_path):
    """The doremi rates must differ from the uniform counts-only rate
    whenever the LM signal differs across domains — i.e. the fit really
    consumes doremi_weights, not just domain counts (every fixture
    domain has the SAME doc count, so a counts-only fit would be exactly
    uniform; weights tilt it)."""
    docs = load_table(spark, SF, "documents").select(*COLS)
    state = str(tmp_path / "state")
    doremi_batch_processor(docs, state)
    rates = {
        r[0]: r.keep_prob
        for r in spark.read.parquet(f"{state}/rates").collect()
    }
    weights = {r[0]: r.weight for r in CU.doremi_weights(docs).collect()}
    assert len(rates) == len(weights) > 1
    # rates order matches weights order (monotone transform per domain
    # at equal counts)
    by_rate = sorted(rates, key=lambda s: rates[s])
    by_weight = sorted(weights, key=lambda s: weights[s])
    assert by_rate == by_weight
    assert len(set(rates.values())) > 1  # the LM signal actually tilts


def test_readstream_end_to_end(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select(*COLS)
    src = str(tmp_path / "src")
    docs.coalesce(2).write.mode("overwrite").parquet(src)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_doremi_stream(stream, docs, state, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r.source, r.cnt)
        for r in read_doremi_kept(spark, state)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    want = {
        (r.source, r.n_kept)
        for r in CU.doremi_resample(docs).collect()
        if r.n_kept > 0
    }
    assert got == want and got
