"""The reference's three REST payloads POSTed verbatim over HTTP to the
engine's ksql-compatible endpoints (reference: ci_cd/Makefile:112-127 drives
/ksql for the two DDL payloads and /query for the push query)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from m12_kafkastreams_python_azure_spark.ksql import KsqlContext
from m12_kafkastreams_python_azure_spark.ksql_rest import KsqlRestServer
from m12_kafkastreams_python_azure_spark.operators.enrich import enrich_expedia
from m12_kafkastreams_python_azure_spark.schemas import EXPEDIA_SCHEMA
from tests.fixtures import gen_expedia_rows
from tests.test_ksql import CREATE_STREAM, CREATE_TABLE, SELECT_HOTELS


@pytest.fixture(scope="module")
def rest(spark):
    ctx = KsqlContext(spark)
    raw = spark.createDataFrame(gen_expedia_rows(2000), EXPEDIA_SCHEMA)
    ctx.register_topic("expedia_ext", enrich_expedia(raw))
    server = KsqlRestServer(ctx)
    yield server
    server.close()


def _post(server, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}",
        data=payload.encode(),
        headers={"Content-Type": "application/vnd.ksql.v1+json; charset=utf-8"},
        method="POST",
    )
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read().decode())
    except urllib.error.HTTPError as err:  # 4xx still carries a JSON body
        return err.code, json.loads(err.read().decode())


def test_reference_rest_flow(rest, spark):
    status, out = _post(rest, "/ksql", CREATE_STREAM)
    assert status == 200 and out[0]["status"] == "SUCCESS"
    assert out[0]["columns"] == ["id", "hotel_id", "stay_category"]

    status, out = _post(rest, "/ksql", CREATE_TABLE)
    assert status == 200 and out[0]["status"] == "SUCCESS"

    status, rows = _post(rest, "/query", SELECT_HOTELS)
    assert status == 200
    got = {r["row"]["columns"][0]: tuple(r["row"]["columns"][1:]) for r in rows}
    assert len(got) == 5
    # independent check on one invariant: distinct <= amount per category
    assert all(d <= a for a, d in got.values())


def test_rest_error_is_ksql_shaped(rest):
    status, out = _post(
        rest, "/ksql",
        json.dumps({"ksql": "CREATE STREAM s (id BIGINT) WITH (KAFKA_TOPIC='missing', VALUE_FORMAT='JSON');"}),
    )
    assert status == 400
    assert out["@type"] == "statement_error" and "not registered" in out["message"]


def test_bare_sql_body_accepted(rest):
    """KsqlContext.execute accepts bare SQL; the REST layer must not 400 a
    statement it actually applied (response/side-effect agreement)."""
    status, out = _post(
        rest, "/ksql",
        "CREATE STREAM bare_s (id BIGINT, hotel_id BIGINT) "
        "WITH (KAFKA_TOPIC='expedia_ext', VALUE_FORMAT='JSON');",
    )
    assert status == 200 and out[0]["status"] == "SUCCESS"
    assert out[0]["columns"] == ["id", "hotel_id"]


def test_query_collect_is_capped(spark):
    """Any registered view is servable through /query, so the handler must
    never buffer unbounded rows on the driver: it fetches max_rows+1 via
    df.limit() (a CollectLimit in the Spark plan — the bound executes
    distributed, not post-hoc), returns max_rows, and appends a ksql-style
    finalMessage truncation marker."""
    from pyspark.sql import functions as F

    ctx = KsqlContext(spark)
    big = spark.range(100_000).select(
        F.col("id").alias("event_id"), (F.col("id") % 7).alias("bucket")
    )
    ctx.register_topic("big_topic", big)
    server = KsqlRestServer(ctx, max_rows=50)
    try:
        status, _ = _post(server, "/ksql", json.dumps({
            "ksql": "CREATE STREAM bigs (event_id BIGINT, bucket BIGINT) "
                    "WITH (KAFKA_TOPIC='big_topic', VALUE_FORMAT='JSON');",
            "streamsProperties": {},
        }))
        assert status == 200
        status, rows = _post(server, "/query", json.dumps({
            "ksql": "SELECT * FROM bigs;", "streamsProperties": {},
        }))
        assert status == 200
        assert len(rows) == 51  # 50 data rows + 1 truncation marker
        assert rows[-1]["finalMessage"] == "Query output truncated at 50 rows"
        assert all("row" in r for r in rows[:-1])

        # an under-cap result must NOT carry a marker
        status, rows = _post(server, "/query", json.dumps({
            "ksql": "SELECT bucket, COUNT(*) AS n FROM bigs GROUP BY bucket;",
            "streamsProperties": {},
        }))
        assert status == 200
        assert len(rows) == 7
        assert all("row" in r for r in rows)
    finally:
        server.close()


def test_query_serializes_timestamps(rest, spark):
    """/query must serialize temporal columns (windowed tables expose
    window.start as TIMESTAMP) instead of 400ing on json.dumps."""
    from pyspark.sql import functions as F

    ev = spark.range(10).select(
        F.col("id").alias("event_id"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 600).alias("ts"),
    )
    rest.ctx.register_topic("ts_topic", ev)
    status, _ = _post(rest, "/ksql", json.dumps({
        "ksql": "CREATE STREAM tse (event_id BIGINT, ts TIMESTAMP) WITH "
                "(KAFKA_TOPIC='ts_topic', TIMESTAMP='ts');",
        "streamsProperties": {},
    }))
    assert status == 200
    status, _ = _post(rest, "/ksql", json.dumps({
        "ksql": "CREATE TABLE tcount AS SELECT WINDOWSTART AS ws, COUNT(*) "
                "AS n FROM tse WINDOW TUMBLING (SIZE 1 HOURS) GROUP BY 1;",
        "streamsProperties": {},
    }))
    assert status == 200
    status, rows = _post(rest, "/query", json.dumps({
        "ksql": "SELECT * FROM tcount;", "streamsProperties": {},
    }))
    assert status == 200
    assert sum(r["row"]["columns"][1] for r in rows) == 10
    assert all(isinstance(r["row"]["columns"][0], str) for r in rows)
