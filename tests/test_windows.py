"""Streaming window tests: stream results == batch window results (the
Structured Streaming guarantee), late-data dropped past the watermark."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.streaming.windows import (
    session_counts,
    sliding_counts,
    tumbling_counts,
)

EVENTS_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_events(path: str, rows: list[tuple], files: int = 3) -> None:
    os.makedirs(path, exist_ok=True)
    per = (len(rows) + files - 1) // files
    for i in range(files):
        with open(os.path.join(path, f"f{i}.json"), "w") as fh:
            for r in rows[i * per : (i + 1) * per]:
                fh.write(
                    json.dumps(
                        {
                            "event_id": r[0],
                            "ts": r[1],
                            "user_id": r[2],
                            "event_type": r[3],
                            "value": r[4],
                        }
                    )
                    + "\n"
                )


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("evstream"))
    rows = []
    eid = 0
    for hour in range(4):
        for m in (0, 10, 50):
            for u in (1, 2):
                rows.append(
                    (eid, f"2024-03-01T{hour:02d}:{m:02d}:00", u,
                     ["click", "view"][eid % 2], float(eid))
                )
                eid += 1
    _write_events(d, rows)
    return d


def _stream(spark, events_dir):
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(events_dir)
    )


def _run_append(spark, df, name, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / name))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def test_tumbling_stream_matches_batch(spark, events_dir, tmp_path):
    stream_out = _run_append(
        spark,
        tumbling_counts(_stream(spark, events_dir), watermark="0 seconds"),
        "tumb",
        tmp_path,
    )
    batch = spark.read.schema(EVENTS_SCHEMA).json(events_dir)
    batch_out = (
        batch.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type", "n_events", "value_sum",
        )
    )
    # append mode emits only watermark-closed windows; every emitted window
    # must match batch truth, and all but the last window must be present
    got = {tuple(r) for r in stream_out.collect()}
    want = {tuple(r) for r in batch_out.collect()}
    assert got <= want
    assert len(got) >= len(want) - 2  # final window(s) still open


def test_sliding_windows_multiply(spark, events_dir, tmp_path):
    out = _run_append(
        spark,
        sliding_counts(
            _stream(spark, events_dir), window_len="1 hour", slide="30 minutes",
            watermark="0 seconds",
        ),
        "slide",
        tmp_path,
    )
    rows = out.collect()
    assert rows, "no closed sliding windows emitted"
    # hopping windows: window length / slide = 2 windows per event
    ev_per_window = {}
    for r in rows:
        ev_per_window.setdefault((r["window_start"], r["event_type"]), r["n_events"])
    batch = spark.read.schema(EVENTS_SCHEMA).json(events_dir)
    total = batch.count()
    emitted = sum(r["n_events"] for r in rows)
    assert emitted <= 2 * total


def test_session_windows(spark, events_dir, tmp_path):
    out = _run_append(
        spark,
        session_counts(_stream(spark, events_dir), gap="30 minutes", watermark="0 seconds"),
        "sess",
        tmp_path,
    )
    rows = out.collect()
    assert rows
    # fixture: per user, events at :00 and :10 merge (gap 10m < 30m), the
    # :50 event merges with next hour's :00 (10m) — sessions never contain a
    # gap > 30 minutes
    for r in rows:
        dur = (r["session_end"] - r["session_start"]).total_seconds()
        assert dur >= 30 * 60  # at least the gap padding
        assert r["n_events"] >= 1


def test_append_mode_emits_only_finalized_windows(spark, tmp_path):
    """Append-mode windowed aggregation: a window row is emitted exactly
    once, only after the watermark passes its end — the finalization
    semantics that make append-mode output safe to treat as immutable."""
    import json as _json
    import os as _os

    from m12_kafkastreams_python_azure_spark.streaming.windows import (
        tumbling_counts,
    )

    src = str(tmp_path / "apsrc")
    _os.makedirs(src, exist_ok=True)

    def _write(fname, rows):
        with open(_os.path.join(src, fname), "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")

    def _ev(eid, hhmm, etype="click"):
        return {"event_id": eid, "ts": f"2024-03-01T{hhmm}:00", "user_id": 1,
                "event_type": etype, "value": 1.0}

    _write("b0.json", [_ev(1, "10:00"), _ev(2, "10:30"), _ev(3, "10:59")])
    stream = spark.readStream.schema(EVENTS_SCHEMA).json(src)
    agg = tumbling_counts(stream, watermark="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("append_win")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "apck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # watermark has not passed 11:00 yet -> nothing finalized
        assert spark.table("append_win").count() == 0
        # an event far in the future advances the watermark past 11:00
        _write("b1.json", [_ev(4, "13:00")])
        q.processAllAvailable()
        rows = spark.table("append_win").collect()
    finally:
        q.stop()
    finalized = {(str(r.window_start), r.n_events) for r in rows}
    assert finalized == {("2024-03-01 10:00:00", 3)}
