"""Source/ingest tests: S1 object-store scan (+partition discovery), S2 mask,
S3 schema-on-read, avro gate."""

from __future__ import annotations

import json
import os

import pytest

from m12_kafkastreams_python_azure_spark.schemas import (
    DATE_TIME_MASK,
    EXPEDIA_SCHEMA,
    EXPEDIA_STREAM_SCHEMA,
)
from m12_kafkastreams_python_azure_spark.sources.readers import (
    avro_available,
    read_avro,
    read_ingest_files,
    write_avro,
)
from tests.fixtures import gen_expedia_rows


@pytest.fixture(scope="module")
def blob_layout(tmp_path_factory):
    """Mimic the reference blob layout: topics/expedia/partition=N/*.json
    (reference README.md:2003-2019 — Spark auto-discovers partition=N)."""
    root = tmp_path_factory.mktemp("blob") / "topics" / "expedia"
    rows = gen_expedia_rows(300)
    for p in range(3):
        d = root / f"partition={p}"
        os.makedirs(d)
        with open(d / f"expedia+{p}+0.json", "w") as fh:
            for r in rows[p::3]:
                fh.write(json.dumps(r) + "\n")
    return str(root), rows


def test_ingest_scan_with_mask(spark, blob_layout):
    root, rows = blob_layout
    df = read_ingest_files(
        spark, root, EXPEDIA_SCHEMA, fmt="json", mask=("date_time", DATE_TIME_MASK)
    )
    assert df.count() == len(rows)
    assert {r[0] for r in df.select("date_time").distinct().collect()} == {DATE_TIME_MASK}
    # partition discovery surfaces the dir key as a column
    assert "partition" in df.columns
    assert {r[0] for r in df.select("partition").distinct().collect()} == {0, 1, 2}


def test_schema_on_read_projection(spark, blob_layout):
    """S3/K1: reading with the 3-field partial schema ignores the other 17
    JSON fields — ksql CREATE STREAM semantics."""
    root, rows = blob_layout
    df = spark.read.schema(EXPEDIA_STREAM_SCHEMA).json(f"{root}/partition=0")
    assert set(df.columns) == {"id", "hotel_id", "stay_category"}
    got = df.filter(df.id.isNotNull()).count()
    assert got == len(rows[0::3])
    # stay_category doesn't exist upstream of enrichment -> all NULL
    assert df.filter(df.stay_category.isNotNull()).count() == 0


def test_avro_roundtrip_or_clear_error(spark, tmp_path):
    """S1 avro scan: real round-trip when the module's classes are present
    (this container bundles them, short-name-unregistered), clear RuntimeError
    otherwise."""
    if not avro_available(spark):
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_avro(spark, str(tmp_path))
        return
    rows = gen_expedia_rows(50)
    src = spark.createDataFrame(
        [tuple(r[f.name] for f in EXPEDIA_SCHEMA.fields) for r in rows],
        EXPEDIA_SCHEMA,
    )
    write_avro(src, str(tmp_path / "av"))
    back = read_avro(spark, str(tmp_path / "av"), EXPEDIA_SCHEMA)
    assert back.count() == 50
    assert back.schema == EXPEDIA_SCHEMA


def test_corrupt_json_records_audited(spark, tmp_path):
    """Data-quality path: malformed JSON rows land in _corrupt_record
    (PERMISSIVE mode) instead of failing the pipeline — the F1 null-filter
    generalized to schema-level corruption."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = tmp_path / "mixed.json"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json\n"
        '{"id": 2, "name": "also ok"}\n'
        '{"id": "not-a-number", "name": 3}\n'
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()  # Spark requires materialization before querying _corrupt_record alone
    )
    assert df.count() == 4
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 2
    df.unpersist()
