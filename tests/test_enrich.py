"""Unit tests for the F3-F5 expression stack (FIXTURES.md §2 edge cases) and
the batch expedia pipeline vs a DuckDB oracle."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.aggregate import hotels_count
from m12_kafkastreams_python_azure_spark.operators.enrich import enrich_expedia, enrich_stay
from m12_kafkastreams_python_azure_spark.schemas import EXPEDIA_SCHEMA
from tests.fixtures import gen_expedia_rows

EDGE_CASES = [
    # (srch_ci, srch_co, expected) — FIXTURES.md §2 table
    ("2025-01-01", "2025-01-02", "Short stay"),
    ("2025-01-01", "2025-01-05", "Short stay"),
    ("2025-01-01", "2025-01-06", "Standard stay"),
    ("2025-01-01", "2025-01-11", "Standard stay"),
    ("2025-01-01", "2025-01-12", "Standard extended stay"),
    ("2025-01-01", "2025-01-15", "Standard extended stay"),
    ("2025-01-01", "2025-01-16", "Long stay"),
    ("2025-01-01", "2025-06-01", "Long stay"),
    ("2025-01-01", "2025-01-01", "Erroneous data"),  # duration 0
    ("2025-01-05", "2025-01-01", "Erroneous data"),  # negative
    ("not-a-date", "2025-01-02", "Erroneous data"),  # parse fail ci
    ("2025-01-01", "", "Erroneous data"),            # parse fail co
    (None, "2025-01-02", "Erroneous data"),          # null ci
]


def test_stay_category_edge_cases(spark):
    df = spark.createDataFrame(
        [(i, ci, co, exp) for i, (ci, co, exp) in enumerate(EDGE_CASES)],
        "id long, srch_ci string, srch_co string, expected string",
    )
    out = enrich_stay(df, "srch_ci", "srch_co").collect()
    for r in out:
        assert r["stay_category"] == r["expected"], (
            f"ci={r['srch_ci']} co={r['srch_co']}: "
            f"got {r['stay_category']}, want {r['expected']}"
        )


def test_one_row_out_per_input(spark):
    """Intended semantics: exactly one output row per non-null input
    (SURVEY.md §2 reference-bug divergence — no double emission)."""
    rows = gen_expedia_rows(2000)
    df = spark.createDataFrame(rows, EXPEDIA_SCHEMA)
    assert enrich_expedia(df).count() == len(rows)


def test_expedia_pipeline_vs_duckdb(spark, tmp_path):
    """End-to-end batch: enrich -> hotels_count == DuckDB exact oracle."""
    rows = gen_expedia_rows(5000)
    df = spark.createDataFrame(rows, EXPEDIA_SCHEMA)
    got = {
        r["stay_category"]: (r["hotels_amount"], r["distinct_hotels"])
        for r in hotels_count(enrich_expedia(df)).collect()
    }

    pq = str(tmp_path / "expedia.parquet")
    df_pd = df.toPandas()
    con = duckdb.connect()
    con.register("expedia_raw", df_pd)
    oracle = con.execute(
        """
        WITH e AS (
          SELECT hotel_id,
                 try_cast(srch_ci AS DATE) AS ci,
                 try_cast(srch_co AS DATE) AS co
          FROM expedia_raw
        ), cat AS (
          SELECT hotel_id,
                 CASE WHEN datediff('day', ci, co) BETWEEN 1 AND 4 THEN 'Short stay'
                      WHEN datediff('day', ci, co) BETWEEN 5 AND 10 THEN 'Standard stay'
                      WHEN datediff('day', ci, co) BETWEEN 11 AND 14 THEN 'Standard extended stay'
                      WHEN datediff('day', ci, co) > 14 THEN 'Long stay'
                      ELSE 'Erroneous data' END AS stay_category
          FROM e
        )
        SELECT stay_category, COUNT(hotel_id), COUNT(DISTINCT hotel_id)
        FROM cat GROUP BY 1
        """
    ).fetchall()
    want = {r[0]: (r[1], r[2]) for r in oracle}
    assert got == want
    # reference invariants
    for cat, (amount, distinct) in got.items():
        assert distinct <= amount
    assert set(got) == {
        "Short stay", "Standard stay", "Standard extended stay",
        "Long stay", "Erroneous data",
    }


def test_mask_field(spark):
    from m12_kafkastreams_python_azure_spark.sources.readers import mask_field

    rows = gen_expedia_rows(50)
    df = spark.createDataFrame(rows, EXPEDIA_SCHEMA)
    masked = mask_field(df, "date_time", "0000-00-00 00:00:00")
    vals = {r[0] for r in masked.select("date_time").distinct().collect()}
    assert vals == {"0000-00-00 00:00:00"}


def test_approx_distinct_within_rel_err(spark):
    rows = gen_expedia_rows(5000)
    df = spark.createDataFrame(rows, EXPEDIA_SCHEMA)
    enriched = enrich_expedia(df)
    exact = {
        r["stay_category"]: r["distinct_hotels"]
        for r in hotels_count(enriched, exact=True).collect()
    }
    approx = {
        r["stay_category"]: r["distinct_hotels"]
        for r in hotels_count(enriched, exact=False, rsd=0.05).collect()
    }
    for cat, ex in exact.items():
        assert abs(approx[cat] - ex) <= max(2, 0.1 * ex), (cat, ex, approx[cat])
