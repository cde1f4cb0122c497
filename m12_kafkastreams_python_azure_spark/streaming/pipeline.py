"""Structured Streaming pipelines: the reference's streaming stages on Spark.

Reference mapping (SURVEY.md §2-§3):

- ksql CREATE STREAM (K1)    -> ``expedia_stream_projection``: a streaming
  DataFrame projecting the 3 declared fields (schema-on-read).
- ksql CTAS hotels_count (K5)-> ``hotels_count_streaming`` /
  ``HotelsCountStream``: continuously-updated keyed aggregate, state in
  Spark's state store, checkpointed — the changelog role of the compacted
  HOTELS_COUNT topic (reference: ci_cd/ksql/create_table.json:2,
  README.md:2299).
- push query EMIT CHANGES (K6)-> update-mode sink: each micro-batch emits
  the changed group rows, exactly the ksql push-query change stream
  (reference: ci_cd/ksql/select_hotels.json:2).
- Kafka sink (S4)            -> ``to_kafka_sink``: to_json(struct(*)) into a
  topic (reference: src/main.py:37,40).

Distinct-count semantics (SURVEY.md §7 "hard parts"): Spark rejects exact
``count_distinct`` in streaming aggregations. Two engine modes:

- approx (default): ``approx_count_distinct`` (HLL) in one query — matches
  ksqlDB's documented *approximate* COUNT_DISTINCT semantics.
- exact: two-phase — ``dropDuplicates(category, key)`` feeding a per-category
  count in a second streaming aggregation gives an exact distinct count;
  the plain count runs in a parallel query; results joined at read time.
  State for the dedup grows with distinct (category, key) pairs — bounded by
  key cardinality, the same storage ksql's RocksDB store would need.

At 100 TB the streaming shuffle profile equals the batch one: partial
aggregation before the state-store exchange; only (category -> partial agg)
rows move per micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def expedia_stream_projection(enriched: DataFrame) -> DataFrame:
    """K1: ksql CREATE STREAM — project the 3 declared fields."""
    return enriched.select("id", "hotel_id", "stay_category")


def hotels_count_streaming(projected: DataFrame, rsd: float = 0.05) -> DataFrame:
    """K2-K4 (approx mode): single streaming aggregation, update-mode ready."""
    return projected.groupBy("stay_category").agg(
        F.count("hotel_id").alias("hotels_amount"),
        F.approx_count_distinct("hotel_id", rsd).alias("distinct_hotels"),
    )


def write_update_to_memory(
    df: DataFrame, name: str, checkpoint_dir: str
) -> StreamingQuery:
    """K5/K6: materialize a streaming aggregate to an in-memory table in
    update mode — each micro-batch emits the changed keys (the push-query
    change stream); ``spark.sql(f"SELECT * FROM {name}")`` is the pull query."""
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def encode_kafka_value(df: DataFrame) -> DataFrame:
    """Sink-side wire encoding: every column JSON-serialized into a single
    ``value`` column (the Faust agent sink semantics, reference:
    src/main.py:37,40). Pure DataFrame -> DataFrame so the round-trip
    contract (decode(encode(df)) == df) is testable without a broker."""
    return df.select(F.to_json(F.struct("*")).alias("value"))


def to_kafka_sink(
    df: DataFrame,
    topic: str,
    checkpoint_dir: str,
    bootstrap_servers: str = "localhost:9092",
) -> StreamingQuery:
    """S4: JSON-serialize every column into the Kafka value (the Faust agent
    sink semantics, reference: src/main.py:37,40)."""
    return (
        encode_kafka_value(df)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


class HotelsCountStream:
    """Exact-distinct mode: two coordinated streaming queries.

    - ``<name>_amount``  : per-category non-null count (K3).
    - ``<name>_distinct``: dropDuplicates(category, key) -> per-category
      count — an exact streaming COUNT DISTINCT (K4).

    ``table()`` joins the two memory sinks into the hotels_count view.
    """

    def __init__(
        self,
        projected: DataFrame,
        name: str = "hotels_count",
        checkpoint_root: str = "/tmp/hotels_count_ckpt",
    ) -> None:
        self.spark = projected.sparkSession
        self.name = name
        amounts = projected.groupBy("stay_category").agg(
            F.count("hotel_id").alias("hotels_amount")
        )
        distincts = (
            projected.select("stay_category", "hotel_id")
            .dropDuplicates(["stay_category", "hotel_id"])
            .groupBy("stay_category")
            .agg(F.count("hotel_id").alias("distinct_hotels"))
        )
        self.q_amount = write_update_to_memory(
            amounts, f"{name}_amount", f"{checkpoint_root}/amount"
        )
        self.q_distinct = write_update_to_memory(
            distincts, f"{name}_distinct", f"{checkpoint_root}/distinct"
        )

    def process_available(self) -> None:
        self.q_amount.processAllAvailable()
        self.q_distinct.processAllAvailable()

    def table(self) -> DataFrame:
        """Pull-query view: latest value per key from each update stream,
        joined. (Memory sink in update mode appends every change row, so the
        latest row per key is the current state — changelog compaction.)"""
        amount = (
            self.spark.table(f"{self.name}_amount")
            .groupBy("stay_category")
            .agg(F.max("hotels_amount").alias("hotels_amount"))
        )
        distinct = (
            self.spark.table(f"{self.name}_distinct")
            .groupBy("stay_category")
            .agg(F.max("distinct_hotels").alias("distinct_hotels"))
        )
        return amount.join(distinct, "stay_category", "left")

    def stop(self) -> None:
        self.q_amount.stop()
        self.q_distinct.stop()
