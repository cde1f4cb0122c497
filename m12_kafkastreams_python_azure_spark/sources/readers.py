"""Sources and ingest transforms (operators S1-S3 + mask S2).

The reference ingests Avro files from object storage via a Kafka Connect
source connector with a field-mask SMT, into a Kafka topic (reference:
azure-source-cc.json:4-17). Spark-first translation:

- object-store scan  -> ``spark.read.format("avro").load(path)`` (S1); at
  100 TB this is a plain distributed columnar scan with partition discovery
  over the ``partition=N`` directory layout (reference README.md:2003-2019).
- field mask (SMT)   -> a one-column constant projection (S2) which Catalyst
  constant-folds into the scan projection.
- Kafka topic source -> ``readStream.format("kafka")`` + ``from_json`` with a
  (possibly partial) schema (S3/K1 — schema-on-read projection).

Tests never need a broker: the file-based JSON stream reader below gives the
same schema-on-read semantics from a directory of JSON files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver-generated parquet table (columnar, pushdown-friendly).

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; read it as long (legacy conf) and convert
    nanos -> micros with exact integer division (truncation — matches how
    DuckDB casts ns to its us-precision TIMESTAMP).
    """
    # Every query path enters through here, and the hosting harness may hand
    # us an untuned session — set the runtime-settable confs that affect
    # correctness (UTC timestamps) and plan quality, idempotently.
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.autoBroadcastJoinThreshold", "64m"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TPCH_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries run
    against the same names the DuckDB oracle uses."""
    for t in TPCH_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


#: DataFrames persisted by ``parallel_scan`` and the dedup/similarity
#: helpers. Each new registering invocation (or an explicit
#: ``release_parallel_caches()``) unpersists what came before, bounding
#: cache growth across a long query sweep. NOTE the contract: operators
#: eagerly materialize their caches and consume them within the same
#: invocation; a PRIOR operator's still-lazy result remains correct after
#: its caches are released — it just recomputes uncached.
_CACHED: list[DataFrame] = []

#: registry cap: beyond this many pinned intermediates the OLDEST are
#: unpersisted (FIFO). Keeps a long sweep bounded while leaving the most
#: recent few queries' still-lazy plans their caches.
MAX_PINNED = 8


def release_parallel_caches() -> None:
    """Unpersist every registered intermediate. Safe to call any time:
    unpersist is a hint-removal, never a correctness change (a
    still-referenced plan just recomputes)."""
    while _CACHED:
        df = _CACHED.pop()
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass


def register_parallel_cache(df: DataFrame) -> DataFrame:
    """Register a persisted DataFrame so a later operator invocation (or
    ``release_parallel_caches``) frees it. The registry is FIFO-capped at
    ``MAX_PINNED``: growth stays bounded across an arbitrarily long query
    sweep, while the last few queries keep their caches so a still-lazy
    result built just before a new invocation is not silently unpinned."""
    _CACHED.append(df)
    while len(_CACHED) > MAX_PINNED:
        old = _CACHED.pop(0)
        try:
            old.unpersist()
        except Exception:
            pass
    return df


def parallel_scan(df: DataFrame) -> DataFrame:
    """Spread a (small-file) scan across all cores WITH a materialization
    barrier, so expensive narrow expressions layered on top run in parallel.
    Catalyst pushes projections below a bare round-robin repartition — the
    persist pins the repartitioned cut. No-op cost at real scale where the
    scan already has many splits; see verify SKILL.md gotchas.

    The count() materializes the cache eagerly: queries that fan out into
    several concurrent stages over this cache would otherwise race on the
    per-partition cache-write lock (observed as nondeterministic multi-x
    stalls); after one action, every downstream access is a lock-free
    cached read. The result is registered in the FIFO-capped cache
    registry, so repeated invocations don't accumulate pinned copies while
    the most recent queries keep theirs."""
    out = df.repartition(df.sparkSession.sparkContext.defaultParallelism).persist()
    register_parallel_cache(out)
    out.count()
    return out


def mask_field(df: DataFrame, field: str, replacement: str) -> DataFrame:
    """Ingest-time field mask (operator S2).

    Equivalent of the Kafka Connect ``MaskField$Value`` SMT that rewrites
    ``date_time`` to the constant '0000-00-00 00:00:00' (reference:
    azure-source-cc.json:14-17). A constant projection — Catalyst folds it,
    so it costs nothing at any scale.
    """
    return df.withColumn(field, F.lit(replacement))


#: spark-avro provider class. Avro is a built-in but *external* Spark module
#: (shipped separately since 2.4): its classes can be on the classpath while
#: the short name "avro" is unregistered with the DataSource ServiceLoader —
#: exactly this container's situation — so we address it by class name, which
#: Spark's lookupDataSource resolves via Class.forName.
AVRO_FORMAT = "org.apache.spark.sql.avro.AvroFileFormat"


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro module classes are on the classpath."""
    try:
        # Class.forName throws for a missing class; bare _jvm attribute
        # access would just hand back an empty JavaPackage.
        spark._jvm.java.lang.Class.forName(AVRO_FORMAT)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str, schema: StructType | None = None) -> DataFrame:
    """Object-store Avro scan (operator S1). Schema optional — Avro files are
    self-describing; pass one to pin types / prune columns at scan time.

    Uses the fully-qualified provider class so it works whether or not the
    short name "avro" is service-registered. When the module is absent
    entirely, raises immediately with a clear message instead of an opaque
    ClassNotFoundException at action time.
    """
    if not avro_available(spark):
        raise RuntimeError(
            "spark-avro module not on the classpath; add "
            "org.apache.spark:spark-avro_2.13:<your-spark-version> via "
            "spark.jars.packages, or ingest via "
            "read_ingest_files(..., fmt='json'/'parquet')"
        )
    reader = spark.read.format(AVRO_FORMAT)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def write_avro(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write a DataFrame as Avro files — the shape the reference's source
    connector consumes from blob storage (azure-source-cc.json:4-13)."""
    df.write.format(AVRO_FORMAT).mode(mode).save(path)


# --------------------------------------------------------------------------
# Confluent Schema-Registry wire format (Kafka-Avro). The reference deploys a
# Schema Registry (confluent-platform.yaml:92-99), so topic values are framed
# as: 1 magic byte 0x00 | 4-byte big-endian schema id | avro-encoded body.
# The framing is pure Catalyst (binary substring/concat — testable anywhere);
# the avro body decode delegates to spark-avro's from_avro, which this
# container has on the classpath but NOT service-registered, so the decode
# entry point probes usability and raises a clear error instead of an opaque
# analysis failure.
# --------------------------------------------------------------------------

CONFLUENT_MAGIC = b"\x00"


def confluent_frame(df: DataFrame, schema_id: int, value_col: str = "value") -> DataFrame:
    """Prepend the 5-byte Confluent header to an avro-encoded value column."""
    header = CONFLUENT_MAGIC + schema_id.to_bytes(4, "big")
    return df.withColumn(value_col, F.concat(F.lit(header), F.col(value_col)))


def confluent_schema_id(value_col: str = "value") -> F.Column:
    """Big-endian int schema id from header bytes 2-5 (Catalyst: binary
    substring -> hex -> base-16 conv; no Python)."""
    return F.conv(F.hex(F.expr(f"substring({value_col}, 2, 4)")), 16, 10).cast("long")


def confluent_body(value_col: str = "value") -> F.Column:
    """The avro payload after the 5-byte header."""
    return F.expr(f"substring({value_col}, 6, length({value_col}) - 5)")


def confluent_unframe(
    df: DataFrame, value_col: str = "value", expect_schema_id: int | None = None
) -> DataFrame:
    """Validate + strip the Confluent header: non-magic rows AND truncated
    frames (shorter than the 5-byte header) are dropped — the same
    skip-bad-messages stance as the JSON decode path; optionally pin the
    schema id. Returns (schema_id, value=avro body)."""
    out = df.filter(
        (F.expr(f"length({value_col})") >= 5)
        & (F.expr(f"substring({value_col}, 1, 1)") == F.lit(CONFLUENT_MAGIC))
    ).select(
        confluent_schema_id(value_col).alias("schema_id"),
        confluent_body(value_col).alias(value_col),
    )
    if expect_schema_id is not None:
        out = out.filter(F.col("schema_id") == expect_schema_id)
    return out


def avro_functions_usable(spark: SparkSession) -> bool:
    """True if spark-avro's from_avro/to_avro SQL expressions are usable.
    Having AvroFileFormat on the classpath is NOT enough: Spark gates these
    functions on the data source being service-registered (this container
    bundles the classes without the registration)."""
    try:
        from pyspark.sql.avro.functions import to_avro

        probe = spark.range(1).select(to_avro(F.struct("id")).alias("v"))
        probe.schema  # forces analysis; raises AVRO_NOT_LOADED_* if gated
        return True
    except Exception:
        return False


def decode_confluent_avro(
    raw: DataFrame,
    avro_schema_json: str,
    value_col: str = "value",
    expect_schema_id: int | None = None,
) -> DataFrame:
    """Kafka-Avro value decode: unframe the Confluent header, then
    ``from_avro`` the body with the (registry-fetched) writer schema.
    Schema-registry HTTP lookup is out of engine scope — pass the schema
    JSON; at 100 TB the schema is one driver-side fetch per (topic, id),
    never per record."""
    spark = raw.sparkSession
    if not avro_functions_usable(spark):
        import pyspark

        raise RuntimeError(
            "spark-avro SQL functions are not service-registered in this "
            "runtime; restart with the spark-avro package (e.g. "
            f"spark.jars.packages=org.apache.spark:spark-avro_2.13:{pyspark.__version__} "
            "— the version must match your Spark build) to decode "
            "Kafka-Avro bodies. The Confluent framing itself "
            "(confluent_unframe) works without it."
        )
    from pyspark.sql.avro.functions import from_avro

    unframed = confluent_unframe(raw, value_col, expect_schema_id)
    return (
        unframed.select(from_avro(F.col(value_col), avro_schema_json).alias("r"))
        .select("r.*")
    )


def read_ingest_files(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "json",
    mask: tuple[str, str] | None = None,
) -> DataFrame:
    """S1+S2 in one step: scan an object-store directory (any format Spark
    has on the classpath) and apply the ingest-time field mask — the Kafka
    Connect source-connector-with-SMT role. Partition-dir layouts
    (``partition=N/``, reference README.md:2003-2019) are auto-discovered.
    """
    df = spark.read.format(fmt).schema(schema).load(path)
    if mask is not None:
        df = mask_field(df, mask[0], mask[1])
    return df


def kafka_source_options(
    topic: str,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """The exact option set handed to the kafka source — factored out so the
    broker-less contract test (tests/test_kafka_contract.py) can assert it
    without the spark-sql-kafka package on the classpath."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def decode_kafka_value(raw: DataFrame, value_schema: StructType) -> DataFrame:
    """Kafka wire value -> typed rows: cast bytes to string, ``from_json``
    with the declared (possibly partial) schema, drop undecodable messages
    (null filter F1, reference: src/main.py:43-45). Undeclared JSON fields
    are ignored — the same schema-on-read projection as ksql CREATE STREAM
    (K1). Works on any DataFrame with a ``value`` column, so it is testable
    against a batch stand-in without a broker.

    Permissive ``from_json`` yields an all-null struct (not a null struct)
    for malformed input, so the drop-bad-messages contract needs an explicit
    validity gate: ``try_parse_json`` is null for non-JSON and for null
    values (tombstones) — both are dropped, mirroring the reference's
    skip-and-continue."""
    return (
        raw.select(F.col("value").cast("string").alias("json"))
        .filter(F.try_parse_json("json").isNotNull())
        .select(F.from_json("json", value_schema).alias("r"))
        .filter(F.col("r").isNotNull())
        .select("r.*")
    )


def read_kafka_stream(
    spark: SparkSession,
    topic: str,
    value_schema: StructType,
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka topic source (operator S3): subscribe + JSON-deserialize into a
    typed streaming DataFrame, exactly the Faust ``value_type`` semantics
    (reference: src/main.py:35-36,40).

    Needs the spark-sql-kafka package on the classpath; tests use
    ``read_json_stream_from_files`` instead so no broker is required, and
    the decode + option contracts are covered broker-free in
    tests/test_kafka_contract.py.
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(topic, bootstrap_servers, starting_offsets).items():
        reader = reader.option(k, v)
    return decode_kafka_value(reader.load(), value_schema)


def read_json_stream_from_files(
    spark: SparkSession,
    path: str,
    value_schema: StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Broker-free stand-in for the Kafka source: stream a directory of JSON
    files with the same partial-schema projection semantics."""
    return (
        spark.readStream.schema(value_schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )
