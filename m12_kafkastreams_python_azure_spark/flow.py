"""The reference pipeline end to end, one call.

A user of csirkepaprikas/M12_KafkaStreams_PYTHON_AZURE runs three deployed
stages (Kafka-Connect Avro ingest + mask -> Faust enrichment -> ksqlDB
aggregate; reference: azure-source-cc.json:4-17, src/main.py:35-95,
ci_cd/ksql/create_table.json:2). This module is the switch-over surface:
the same flow as one batch call or one streaming query.

- ``reference_flow_batch``: files -> mask -> enrich -> project ->
  hotels_count DataFrame (exact COUNT DISTINCT).
- ``reference_flow_streaming``: the identical logical flow as a file-source
  streaming query in update mode into a named memory sink (the ksql
  CTAS + push-query role); swap the file source for ``read_kafka_stream``
  and the memory sink for ``to_kafka_sink`` when a broker exists.

Stage mapping (SURVEY.md §2): S1+S2 ingest+mask, F1-F6 enrichment, K1
projection, K2-K4 aggregate, K5/K6 materialization/push.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .operators.aggregate import hotels_count
from .operators.enrich import enrich_expedia
from .schemas import EXPEDIA_SCHEMA
from .sources.readers import mask_field, read_ingest_files, read_json_stream_from_files
from .streaming.pipeline import (
    expedia_stream_projection,
    hotels_count_streaming,
    write_update_to_memory,
)

MASK = ("date_time", "0000-00-00 00:00:00")


def reference_flow_batch(
    spark: SparkSession, ingest_dir: str, fmt: str = "json"
) -> DataFrame:
    """S1..K4 in batch: returns the hotels_count aggregate (stay_category,
    hotels_amount, distinct_hotels) with exact distinct semantics."""
    raw = read_ingest_files(spark, ingest_dir, EXPEDIA_SCHEMA, fmt=fmt, mask=MASK)
    enriched = enrich_expedia(raw)
    projected = expedia_stream_projection(enriched)
    return hotels_count(projected)


def reference_flow_streaming(
    spark: SparkSession,
    ingest_dir: str,
    checkpoint_dir: str,
    name: str = "hotels_count",
    rsd: float = 0.05,
) -> StreamingQuery:
    """The same flow as a continuously-updating streaming query: file
    source (broker-free twin of the Kafka source) -> mask -> enrich ->
    project -> streaming aggregate -> update-mode memory sink named
    ``name``. ``spark.table(name)`` is the pull query; the per-trigger
    emitted rows are the EMIT CHANGES stream. COUNT_DISTINCT is approximate
    (HLL, ksqlDB's documented semantics); use ``HotelsCountStream`` for the
    exact two-phase variant."""
    raw = read_json_stream_from_files(spark, ingest_dir, EXPEDIA_SCHEMA)
    enriched = enrich_expedia(mask_field(raw, *MASK))
    projected = expedia_stream_projection(enriched)
    return write_update_to_memory(
        hotels_count_streaming(projected, rsd), name, checkpoint_dir
    )
