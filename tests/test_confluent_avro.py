"""Confluent Schema-Registry wire format (Kafka-Avro) contract tests.

The framing (magic byte | 4-byte BE schema id | body) is pure Catalyst and
fully testable here. The avro BODY decode needs spark-avro's from_avro SQL
function, which this container bundles but does not service-register — that
path is probed and skipped with the documented reason when unusable (same
"cannot test here" stance as the live-broker path).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.sources.readers import (
    avro_functions_usable,
    confluent_frame,
    confluent_unframe,
    decode_confluent_avro,
)


def _framed(spark, schema_id=42):
    payload = spark.createDataFrame(
        [(b"\x02\x06abc",), (b"\x04\x02x",)], "value binary"
    )
    return confluent_frame(payload, schema_id)


def test_frame_layout_is_confluent_wire_format(spark):
    row = _framed(spark, schema_id=0x01020304).first()
    assert bytes(row.value)[:5] == b"\x00\x01\x02\x03\x04"
    assert bytes(row.value)[5:] == b"\x02\x06abc"


def test_unframe_round_trip(spark):
    out = confluent_unframe(_framed(spark, 42)).collect()
    assert [r.schema_id for r in out] == [42, 42]
    assert {bytes(r.value) for r in out} == {b"\x02\x06abc", b"\x04\x02x"}


def test_unframe_drops_non_magic_and_filters_schema_id(spark):
    mixed = spark.createDataFrame(
        [
            (b"\x00\x00\x00\x00\x2aBODY",),   # id 42
            (b"\x00\x00\x00\x00\x07OTHER",),  # id 7
            (b"\x01garbage-not-confluent",),  # wrong magic -> dropped
        ],
        "value binary",
    )
    out = confluent_unframe(mixed, expect_schema_id=42).collect()
    assert len(out) == 1 and bytes(out[0].value) == b"BODY"
    both = confluent_unframe(mixed).collect()
    assert sorted(r.schema_id for r in both) == [7, 42]


def test_decode_body_via_spark_avro(spark):
    """Full Kafka-Avro decode when the avro functions are usable; otherwise
    assert the documented clear error (NOT an opaque analysis failure)."""
    schema_json = (
        '{"type":"record","name":"r","fields":['
        '{"name":"id","type":["long","null"]},'
        '{"name":"s","type":["string","null"]}]}'
    )
    if not avro_functions_usable(spark):
        framed = _framed(spark)
        with pytest.raises(RuntimeError, match="spark-avro"):
            decode_confluent_avro(framed, schema_json)
        pytest.skip(
            "spark-avro expression classes (AvroDataToCatalyst/"
            "CatalystDataToAvro) are in NO bundled jar and the sandbox "
            "has no network for --packages — proven unloadable, see "
            "docs/ROADMAP.md round-18 note #4"
        )
    from pyspark.sql.avro.functions import to_avro

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    framed = confluent_frame(
        df.select(to_avro(F.struct("id", "s")).alias("value")), 7
    )
    back = decode_confluent_avro(framed, schema_json, expect_schema_id=7)
    assert {(r.id, r.s) for r in back.collect()} == {(1, "a"), (2, "b")}


def test_unframe_drops_truncated_frames(spark):
    """A frame shorter than the 5-byte header (magic byte present) must be
    dropped, not passed through with a garbage schema id / empty body."""
    mixed = spark.createDataFrame(
        [(b"\x00\x00\x01",), (b"\x00",), (b"\x00\x00\x00\x00\x2aOK",)],
        "value binary",
    )
    out = confluent_unframe(mixed).collect()
    assert len(out) == 1
    assert out[0].schema_id == 42 and bytes(out[0].value) == b"OK"
