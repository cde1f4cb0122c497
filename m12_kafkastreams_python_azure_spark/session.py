"""SparkSession builder tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
config choice is made for a multi-executor cluster at ~100 TB:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting).
- ``spark.sql.shuffle.partitions`` sized for the local test scale; on a real
  cluster AQE's coalescing makes the static number mostly irrelevant as long
  as it is an upper bound (set it to 2-3x total cores there).
- Arrow enabled so any Pandas-UDF path is batch-columnar, never per-row.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "m12-spark-engine",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 10 MB default is tuned for small executors; with multi-GB executor
        # heaps a 64 MB build side is cheap and deletes a both-sides shuffle.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or int(cpus)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Whole-stage codegen emits a lot of JIT-compiled code; at the JDK
    # default ReservedCodeCacheSize (~240 MB) a long query session
    # overflows the code cache, compiled methods get flushed, and hot
    # loops fall back to the interpreter (observed: the same query 3-10x
    # slower late in a 40-query session). 1 GB keeps everything compiled.
    # Merged with (not overwritten by) any caller-supplied java options.
    extra = dict(extra_conf or {})
    java_opts = "-XX:ReservedCodeCacheSize=1g"
    caller_opts = extra.pop("spark.driver.extraJavaOptions", "")
    if "ReservedCodeCacheSize" not in caller_opts:
        caller_opts = f"{java_opts} {caller_opts}".strip()
    builder = builder.config("spark.driver.extraJavaOptions", caller_opts)
    for k, v in extra.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def cluster_conf(
    total_cores: int = 8000,
    executor_mem_gb: int = 32,
    streaming: bool = False,
) -> dict[str, str]:
    """Recommended conf for the 100 TB / ~1000-executor deployment this
    engine is designed for. Returned as a dict so it can feed
    ``SparkSession.builder.config(map=...)`` or spark-submit --conf lines.

    Rationale per key:
    - shuffle.partitions = 2x total cores: upper bound only — AQE coalesces
      down per stage; too low caps parallelism, too high only costs tiny
      tasks that AQE merges anyway.
    - advisoryPartitionSizeInBytes 128m: AQE's target post-shuffle partition
      ~= one HDFS/objstore block; keeps reducers memory-safe at any input.
    - maxPartitionBytes 256m: scan splits sized so a 100 TB table yields
      ~400k map tasks, not millions.
    - autoBroadcastJoinThreshold 64m: multi-GB executors make a 64 MB build
      side cheap; deletes both-sides shuffles for every dimension join.
    - skewJoin thresholds: split any post-shuffle partition 4x over median
      (hot keys in joins get parallelized instead of strangling one task).
    - RocksDB state store (streaming): keyed state >> heap at this scale;
      changelog checkpointing bounds recovery time.
    """
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "4",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.executor.memory": f"{executor_mem_gb}g",
        "spark.memory.fraction": "0.7",
        "spark.shuffle.service.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
    }
    if streaming:
        conf.update(
            {
                "spark.sql.streaming.stateStore.providerClass": (
                    "org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider"
                ),
                "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": "true",
            }
        )
    return conf


def tune_for_session(spark: SparkSession, shuffle_partitions: int | None = None) -> SparkSession:
    """Apply runtime-settable engine configs to an externally-created session.

    The driver harness hands us a SparkSession it built itself; static configs
    (driver memory, master) are fixed by then, but the SQL configs that matter
    for plan quality are runtime-settable.
    """
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
    }
    if shuffle_partitions:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    for k, v in conf.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # config locked by the hosting harness — keep going
    return spark
