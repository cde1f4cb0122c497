"""RocksDB state store provider — the large-keyspace configuration the
engine's cluster_conf recommends for 100 TB streaming state (ksql's own
state store is RocksDB; reference README.md:2299 relies on it via the
compacted changelog). Validates: the provider actually engages (SST files
in the checkpoint), results equal the batch answer, and state survives a
query restart from the same checkpoint."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
CONF = "spark.sql.streaming.stateStore.providerClass"


def _write(path: str, rows, fname: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as fh:
        for r in rows:
            fh.write(json.dumps(r) + "\n")


def _sst_files(ck: str) -> list[str]:
    out = []
    for root, _dirs, files in os.walk(os.path.join(ck, "state")):
        out += [f for f in files if f.endswith(".sst")]
    return out


def test_rocksdb_provider_counts_and_recovers(spark, tmp_path):
    saved = spark.conf.get(CONF, None)
    spark.conf.set(CONF, PROVIDER)
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    try:
        _write(src, [{"k": f"g{i % 5}", "v": i} for i in range(100)], "b0.json")
        stream = (
            spark.readStream.schema("k string, v long")
            .json(src)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            stream.writeStream.format("memory").queryName("rocks1")
            .outputMode("complete").option("checkpointLocation", ck).start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        latest = {r.k: r.n for r in spark.table("rocks1").collect()}  # complete mode: current state
        assert latest == {f"g{i}": 20 for i in range(5)}
        assert _sst_files(ck), "RocksDB provider produced no SST files"

        # restart from the same checkpoint with MORE data: counts must
        # resume from restored state, not restart from zero
        _write(src, [{"k": f"g{i % 5}", "v": i} for i in range(50)], "b1.json")
        q2 = (
            stream.writeStream.format("memory").queryName("rocks2")
            .outputMode("complete").option("checkpointLocation", ck).start()
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        resumed = {r.k: r.n for r in spark.table("rocks2").collect()}
        assert resumed == {f"g{i}": 30 for i in range(5)}, resumed
    finally:
        if saved is None:
            spark.conf.unset(CONF)
        else:
            spark.conf.set(CONF, saved)
