"""Advanced streaming tests: stream-stream interval join == batch join,
applyInPandasWithState running stats == batch groupBy, foreachBatch dedup
emits each content hash exactly once, rate source produces rows."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.streaming.advanced import (
    dedup_batch_processor,
    rate_source,
    start_dedup_stream,
    user_stats_stateful,
    view_purchase_join,
)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_events(path: str, rows: list[dict], fname: str = "f0.json") -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _event(eid, minute, user, etype, value=1.0):
    return {
        "event_id": eid,
        "ts": f"2024-03-01T10:{minute:02d}:00",
        "user_id": user,
        "event_type": etype,
        "value": value,
    }


@pytest.fixture(scope="module")
def funnel_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("funnel"))
    rows = [
        _event(1, 0, 1, "view"),
        _event(2, 5, 1, "purchase", 30.0),   # 5 min after view 1 -> joins
        _event(3, 20, 1, "purchase", 40.0),  # 20 min after view 1 -> too late
        _event(4, 10, 2, "view"),
        _event(5, 12, 2, "purchase", 50.0),  # joins view 4
        _event(6, 1, 3, "purchase", 60.0),   # no prior view -> no join
        _event(7, 30, 2, "view"),            # no later purchase -> no join
    ]
    _write_events(d, rows)
    return d


def _read_stream(spark, d):
    return spark.readStream.schema(EVENTS_SCHEMA).json(d)


def test_stream_stream_join_matches_batch(spark, funnel_dir, tmp_path):
    ev = _read_stream(spark, funnel_dir)
    joined = view_purchase_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("funnel")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.view_id, r.purchase_id)
            for r in spark.table("funnel").collect()
        }
    finally:
        q.stop()
    assert got == {(1, 2), (4, 5)}


def test_stateful_user_stats_matches_batch(spark, funnel_dir, tmp_path):
    ev = _read_stream(spark, funnel_dir)
    q = (
        user_stats_stateful(ev)
        .writeStream.format("memory")
        .queryName("ustats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
        # latest row per user = current running state
        rows = spark.table("ustats").collect()
    finally:
        q.stop()
    latest = {}
    for r in rows:
        latest[r.user_id] = (r.n_events, r.value_sum, r.n_types)
    batch = {
        r.user_id: (r.n, r.s, r.t)
        for r in spark.read.schema(EVENTS_SCHEMA)
        .json(funnel_dir)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("s"),
            F.countDistinct("event_type").alias("t"),
        )
        .collect()
    }
    assert latest == batch


def test_foreachbatch_dedup_incremental(spark, tmp_path):
    src = str(tmp_path / "docs_src")
    out = str(tmp_path / "docs_out")
    ck = str(tmp_path / "docs_ck")
    docs_schema = "doc_id long, text string"
    _write_events(
        src,
        [{"doc_id": 1, "text": "aaa"}, {"doc_id": 2, "text": "bbb"},
         {"doc_id": 3, "text": "aaa"}],
        "b0.json",
    )
    docs = spark.readStream.schema(docs_schema).json(src)
    q = start_dedup_stream(docs, out, ck)
    try:
        q.processAllAvailable()
        first = spark.read.parquet(out)
        assert first.count() == 2  # aaa (doc 1 wins), bbb
        assert {r.doc_id for r in first.collect()} == {1, 2}
        # second batch: one repeat ("bbb") + one new ("ccc")
        _write_events(
            src,
            [{"doc_id": 4, "text": "bbb"}, {"doc_id": 5, "text": "ccc"}],
            "b1.json",
        )
        q.processAllAvailable()
        final = spark.read.parquet(out)
        assert {r.doc_id for r in final.collect()} == {1, 2, 5}
    finally:
        q.stop()


def test_rate_source_produces_rows(spark, tmp_path):
    q = (
        rate_source(spark, rows_per_second=50, num_partitions=3)
        .writeStream.format("memory")
        .queryName("rate_smoke")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckr"))
        .start()
    )
    try:
        deadline = time.time() + 20
        n = 0
        while time.time() < deadline:
            n = spark.table("rate_smoke").count()
            if n > 0:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    assert n > 0
    assert set(spark.table("rate_smoke").columns) == {"timestamp", "value"}


def test_stream_static_dimension_join(spark, funnel_dir, tmp_path):
    """Stream-static join: streaming events enriched against a static
    dimension DataFrame — no watermark needed, the static side is
    re-broadcast per micro-batch."""
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "user_id long, tier string"
    )
    ev = _read_stream(spark, funnel_dir)
    enriched = ev.join(F.broadcast(dim), "user_id", "left").select(
        "event_id", "user_id", F.coalesce("tier", F.lit("none")).alias("tier")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("tiered")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = {r.event_id: r.tier for r in spark.table("tiered").collect()}
    finally:
        q.stop()
    assert got[1] == "gold" and got[4] == "silver" and got[6] == "none"


def test_dedup_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: re-delivering the SAME batch_id after
    a failure must not duplicate rows (each batch overwrites its own
    batch=<id> partition dir), and later batches still anti-join against
    earlier output."""
    out = str(tmp_path / "replay_out")
    proc = dedup_batch_processor(out)
    b0 = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa")], "doc_id long, text string"
    )
    proc(b0, 0)
    proc(b0, 0)  # replay of batch 0
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert {r.doc_id for r in got.collect()} == {1, 2}
    # next batch: repeat "bbb" (suppressed) + new "ccc"
    b1 = spark.createDataFrame(
        [(4, "bbb"), (5, "ccc")], "doc_id long, text string"
    )
    proc(b1, 1)
    proc(b1, 1)  # replay of batch 1
    got = spark.read.parquet(out)
    assert {r.doc_id for r in got.collect()} == {1, 2, 5}


def test_dedup_batch_recovers_from_first_batch_crash_debris(spark, tmp_path):
    """A crash during the FIRST batch's write leaves only uncommitted
    debris (batch=0/_temporary, no committed parquet). Replay must
    recover — treat it as nothing-durably-seen and overwrite — instead of
    failing schema inference forever."""
    out = str(tmp_path / "crash_out")
    os.makedirs(os.path.join(out, "batch=0", "_temporary"), exist_ok=True)
    with open(os.path.join(out, "batch=0", "_temporary", "junk"), "w") as fh:
        fh.write("partial")
    proc = dedup_batch_processor(out)
    b0 = spark.createDataFrame([(1, "aaa"), (2, "bbb")], "doc_id long, text string")
    proc(b0, 0)  # replay of the crashed batch
    got = spark.read.parquet(out)
    assert {r.doc_id for r in got.collect()} == {1, 2}


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
    spark, tmp_path
):
    """how="left_outer": unmatched views surface with NULL purchase columns
    once the watermark passes their join window — never before (Spark must
    rule out a late matching purchase first). Heartbeat batches advance
    event time to trigger the emission."""
    d = str(tmp_path / "src")
    _write_events(d, [
        _event(1, 0, 1, "view"),
        _event(2, 5, 1, "purchase", 30.0),   # joins view 1
        _event(7, 30, 2, "view"),            # never purchases
    ])
    ev = _read_stream(spark, d)
    joined = view_purchase_join(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
        how="left_outer",
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("funnel_outer")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        inner_only = {
            (r.view_id, r.purchase_id)
            for r in spark.table("funnel_outer").collect()
        }
        assert (7, None) not in inner_only  # watermark hasn't passed yet
        # heartbeats on BOTH sides: the join evicts on the GLOBAL minimum
        # watermark across both inputs, so a purchase-only heartbeat would
        # leave the views side pinned at 10:00 and nothing would emit.
        # 11:40 - 30min watermark = 11:10 > view 7's window end (10:40).
        def _hb(eid, hhmm, etype):
            return {"event_id": eid, "ts": f"2024-03-01T{hhmm}:00",
                    "user_id": 99, "event_type": etype, "value": 1.0}

        _write_events(
            d, [_hb(90, "11:40", "view"), _hb(92, "11:40", "purchase")],
            "f1.json",
        )
        q.processAllAvailable()
        _write_events(
            d, [_hb(91, "11:41", "view"), _hb(93, "11:41", "purchase")],
            "f2.json",
        )
        q.processAllAvailable()
        got = {
            (r.view_id, r.purchase_id)
            for r in spark.table("funnel_outer").collect()
        }
    finally:
        q.stop()
    assert (1, 2) in got
    assert (7, None) in got  # unmatched view emitted with NULL purchase


@pytest.fixture(scope="module")
def dup_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dups"))
    rows = [
        _event(1, 0, 1, "view"),
        _event(1, 1, 1, "view"),        # retry duplicate, 1 min later
        _event(2, 2, 2, "purchase", 9.0),
        _event(2, 2, 2, "purchase", 9.0),  # same-minute duplicate
        _event(3, 4, 3, "click"),
        _event(1, 5, 1, "view"),        # third copy, still within watermark
    ]
    _write_events(d, rows)
    return d


def test_dedup_within_watermark_matches_batch_distinct(spark, dup_dir, tmp_path):
    from m12_kafkastreams_python_azure_spark.streaming.advanced import (
        dedup_stream_within_watermark,
    )

    deduped = dedup_stream_within_watermark(
        _read_stream(spark, dup_dir), keys=("event_id",), watermark="10 minutes"
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_dwm"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT event_id FROM dedup_wm").collect()
    finally:
        q.stop()
    ids = sorted(r["event_id"] for r in got)
    assert ids == [1, 2, 3]  # one row per key: all duplicates fell inside the watermark
