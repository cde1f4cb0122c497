"""Streaming fault tolerance: a stopped query restarted from its checkpoint
resumes exactly where it left off (no double counting, no data loss) — the
Structured Streaming guarantee that plays the role of the reference's
compacted changelog topic (SURVEY.md §3.2).

Also: dropDuplicatesWithinWatermark — streaming dedup with bounded state.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write(path, rows, fname):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _ev(eid, minute, user, etype="click", value=1.0):
    return {"event_id": eid, "ts": f"2024-03-01T10:{minute:02d}:00",
            "user_id": user, "event_type": etype, "value": value}


def _start_counting(spark, src, ck, name):
    counts = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .json(src)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ck)
        .start()
    )


def test_restart_from_checkpoint_resumes_state(spark, tmp_path):
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _write(src, [_ev(1, 0, 1), _ev(2, 1, 1), _ev(3, 2, 2, "view")], "b0.json")
    q = _start_counting(spark, src, ck, "ckpt_a")
    try:
        q.processAllAvailable()
        first = {r.event_type: r.n for r in spark.table("ckpt_a").collect()}
        assert first == {"click": 2, "view": 1}
    finally:
        q.stop()
    # new data lands while the query is DOWN
    _write(src, [_ev(4, 3, 1), _ev(5, 4, 3, "view")], "b1.json")
    q2 = _start_counting(spark, src, ck, "ckpt_b")
    try:
        q2.processAllAvailable()
        resumed = {r.event_type: r.n for r in spark.table("ckpt_b").collect()}
    finally:
        q2.stop()
    # old state survived + only the new file was replayed
    assert resumed == {"click": 3, "view": 2}


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src, ck = str(tmp_path / "dsrc"), str(tmp_path / "dck")
    rows = [
        _ev(1, 0, 1),
        _ev(1, 1, 1),   # duplicate event_id inside the watermark window
        _ev(2, 2, 2),
    ]
    _write(src, rows, "b0.json")
    dedup = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .json(src)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("wm_dedup")
        .outputMode("append")
        .option("checkpointLocation", ck)
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(r.event_id for r in spark.table("wm_dedup").collect())
    finally:
        q.stop()
    assert got == [1, 2]
