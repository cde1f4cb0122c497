"""Broker-free contract tests for the Kafka edge (operators S3/S4).

No broker and no spark-sql-kafka package exist in this container, so the
live path cannot run here (documented "cannot test here" per the reference's
broker-in/broker-out loop, src/main.py:35-40). What IS fully testable, and
what these tests pin down:

- the exact option set the source passes to the kafka reader (subscribe
  topic, bootstrap servers, starting offsets),
- the value-decode contract: bytes -> from_json(partial schema) ->
  null-filter -> flatten, including schema-on-read projection of
  undeclared fields (K1) and the F1 null filter,
- the sink wire format: to_json(struct(*)) into a single ``value`` column,
- the round trip: decode(encode(df)) == df, schema and values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.schemas import (
    EXPEDIA_EXT_SCHEMA,
    EXPEDIA_STREAM_SCHEMA,
)
from m12_kafkastreams_python_azure_spark.sources.readers import (
    decode_kafka_value,
    kafka_source_options,
)
from m12_kafkastreams_python_azure_spark.streaming.pipeline import (
    encode_kafka_value,
)


def test_source_options_contract():
    opts = kafka_source_options("expedia", "broker:9092", "earliest")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "expedia",
        "startingOffsets": "earliest",
    }


def test_decode_projects_declared_fields_only(spark):
    """ksql CREATE STREAM declares 3 of 21 fields (K1): undeclared JSON keys
    must be ignored, not errors — schema-on-read projection."""
    wire = spark.createDataFrame(
        [
            ('{"id": 1, "hotel_id": 7, "stay_category": "Short stay", "extra": 99}',),
            ('{"id": 2, "hotel_id": 8, "stay_category": "Long stay"}',),
        ],
        "value string",
    ).select(F.col("value").cast("binary").alias("value"))
    out = decode_kafka_value(wire, EXPEDIA_STREAM_SCHEMA)
    assert out.columns == ["id", "hotel_id", "stay_category"]
    rows = {r.id: (r.hotel_id, r.stay_category) for r in out.collect()}
    assert rows == {1: (7, "Short stay"), 2: (8, "Long stay")}


def test_decode_drops_undecodable_messages(spark):
    """F1 null filter (reference src/main.py:43-45): a message that is not
    JSON at all decodes to a null struct and is dropped."""
    wire = spark.createDataFrame(
        [("not json at all",), ('{"id": 3, "hotel_id": 9, "stay_category": "x"}',)],
        "value string",
    ).select(F.col("value").cast("binary").alias("value"))
    out = decode_kafka_value(wire, EXPEDIA_STREAM_SCHEMA)
    assert [r.id for r in out.collect()] == [3]


def test_encode_wire_format(spark):
    df = spark.createDataFrame([(1, 7, "Short stay")], "id long, hotel_id long, stay_category string")
    enc = encode_kafka_value(df)
    assert enc.columns == ["value"]
    assert enc.schema["value"].dataType.simpleString() == "string"
    payload = enc.first().value
    assert '"id":1' in payload and '"stay_category":"Short stay"' in payload


def test_round_trip_enriched_record(spark, sf_dir):
    """encode -> decode over the enriched record is lossless: same schema,
    same values (the reference's Faust JSON round trip, src/main.py:37,40)."""
    from m12_kafkastreams_python_azure_spark.operators.analytics import q_stay_enrich

    df = q_stay_enrich(spark, sf_dir).limit(200)
    back = decode_kafka_value(
        encode_kafka_value(df).select(F.col("value").cast("binary").alias("value")),
        df.schema,
    )
    # nullability is not representable on a JSON wire — names/types must match
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in df.collect()}


def test_round_trip_expedia_ext_schema(spark):
    """Same round trip over a hand-built full ExpediaExt record (all 21
    fields of the reference's ExpediaExtRecord, src/main.py:7-31)."""
    row = {f.name: None for f in EXPEDIA_EXT_SCHEMA.fields}
    row.update(
        id=5, hotel_id=77, stay_category="Short stay", site_name=2,
        date_time="0000-00-00 00:00:00", srch_ci="2016-10-01", srch_co="2016-10-03",
        user_id=10, is_mobile=1, is_package=0, channel=9,
    )
    df = spark.createDataFrame([tuple(row[f.name] for f in EXPEDIA_EXT_SCHEMA.fields)],
                               EXPEDIA_EXT_SCHEMA)
    back = decode_kafka_value(
        encode_kafka_value(df).select(F.col("value").cast("binary").alias("value")),
        EXPEDIA_EXT_SCHEMA,
    )
    assert back.schema == df.schema
    assert back.collect() == df.collect()
