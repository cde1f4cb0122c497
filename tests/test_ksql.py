"""The reference's three ksql REST payloads run verbatim on the Spark engine
(reference: ci_cd/ksql/{create_stream,create_table,select_hotels}.json)."""

from __future__ import annotations

import pytest

from m12_kafkastreams_python_azure_spark.ksql import KsqlContext
from m12_kafkastreams_python_azure_spark.operators.aggregate import hotels_count
from m12_kafkastreams_python_azure_spark.operators.enrich import enrich_expedia
from m12_kafkastreams_python_azure_spark.schemas import EXPEDIA_SCHEMA
from tests.fixtures import gen_expedia_rows

CREATE_STREAM = """{
    "ksql": "CREATE STREAM expedia_stream (id BIGINT, hotel_id BIGINT, stay_category VARCHAR) WITH (KAFKA_TOPIC='expedia_ext', VALUE_FORMAT='JSON');",
    "streamsProperties": {}
  }"""
CREATE_TABLE = """{
    "ksql": "CREATE TABLE hotels_count AS SELECT stay_category, COUNT(hotel_id) AS hotels_amount, COUNT_DISTINCT(hotel_id) AS distinct_hotels FROM expedia_stream GROUP BY stay_category;",
    "streamsProperties": {}
  }"""
SELECT_HOTELS = """{
    "ksql": "SELECT * FROM hotels_count EMIT CHANGES;",
    "streamsProperties": {}
  }"""


@pytest.fixture(scope="module")
def ksql_ctx(spark):
    ctx = KsqlContext(spark)
    raw = spark.createDataFrame(gen_expedia_rows(3000), EXPEDIA_SCHEMA)
    ctx.register_topic("expedia_ext", enrich_expedia(raw))
    return ctx


def test_reference_payloads_end_to_end(ksql_ctx, spark):
    stream = ksql_ctx.execute(CREATE_STREAM)
    assert stream.columns == ["id", "hotel_id", "stay_category"]  # K1 projection

    ksql_ctx.execute(CREATE_TABLE)
    result = ksql_ctx.execute(SELECT_HOTELS)
    got = {
        r["stay_category"]: (r["hotels_amount"], r["distinct_hotels"])
        for r in result.collect()
    }

    raw = spark.createDataFrame(gen_expedia_rows(3000), EXPEDIA_SCHEMA)
    want = {
        r["stay_category"]: (r["hotels_amount"], r["distinct_hotels"])
        for r in hotels_count(enrich_expedia(raw)).collect()
    }
    assert got == want
    assert len(got) == 5


def test_payloads_match_duckdb_oracle(ksql_ctx):
    """The three verbatim payloads' final hotels_count must equal an
    INDEPENDENT oracle: DuckDB computing the same aggregate (exact ANSI
    COUNT(DISTINCT)) over the same projected stream rows — not our own
    engine's batch twin."""
    import duckdb

    ksql_ctx.execute(CREATE_STREAM)
    ksql_ctx.execute(CREATE_TABLE)
    got = {
        r["stay_category"]: (r["hotels_amount"], r["distinct_hotels"])
        for r in ksql_ctx.execute(SELECT_HOTELS).collect()
    }

    pdf = ksql_ctx.execute("SELECT * FROM expedia_stream").toPandas()
    con = duckdb.connect()
    con.register("expedia_stream", pdf)
    want = {
        row[0]: (row[1], row[2])
        for row in con.execute(
            "SELECT stay_category, COUNT(hotel_id), COUNT(DISTINCT hotel_id) "
            "FROM expedia_stream GROUP BY stay_category"
        ).fetchall()
    }
    assert got == want
    assert len(got) == 5


def test_unknown_topic_is_clear_error(spark):
    ctx = KsqlContext(spark)
    with pytest.raises(ValueError, match="not registered"):
        ctx.execute(
            "CREATE STREAM s (id BIGINT) WITH (KAFKA_TOPIC='missing', VALUE_FORMAT='JSON');"
        )


def test_declared_but_missing_column_is_null(ksql_ctx):
    out = ksql_ctx.execute(
        "CREATE STREAM s2 (id BIGINT, nope VARCHAR) "
        "WITH (KAFKA_TOPIC='expedia_ext', VALUE_FORMAT='JSON');"
    )
    r = out.limit(1).collect()[0]
    assert r["nope"] is None  # ksql JSON schema-on-read: absent field -> NULL
