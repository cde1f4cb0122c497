"""Enrichment operator (F1-F6): derive ``stay_category`` per record.

The reference does this as a per-record Python Faust agent (reference:
src/main.py:40-95): null-filter, identity-copy all 20 fields, parse the
check-in/check-out date strings, diff in days, bucket into 5 categories.
Here the whole agent body compiles to Catalyst column expressions appended to
the input relation — a narrow (shuffle-free, partition-local) map, exactly as
partition-local as the reference's Kafka-partition-parallel agent, but
JVM-side and whole-stage-codegen'd instead of interpreted Python.

Works identically on batch and streaming DataFrames (same expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.functions.dates import (
    parse_date_lenient,
    stay_category,
    stay_duration_days,
)


def enrich_stay(
    df: DataFrame,
    check_in_col: str,
    check_out_col: str,
    out_col: str = "stay_category",
    dates_are_strings: bool = True,
) -> DataFrame:
    """Append ``stay_category`` derived from check-in/check-out columns.

    Parameterized on the column names (FIXTURES.md §6) so the same operator
    runs on the expedia-shaped fixture (string dates) or the driver star
    schema (date/timestamp columns, ``dates_are_strings=False``).
    """
    ci: Column = F.col(check_in_col)
    co: Column = F.col(check_out_col)
    if dates_are_strings:
        ci = parse_date_lenient(ci)
        co = parse_date_lenient(co)
    else:
        ci = ci.cast("date")
        co = co.cast("date")
    return df.withColumn(out_col, stay_category(stay_duration_days(ci, co)))


def enrich_expedia(df: DataFrame) -> DataFrame:
    """The full reference enrichment on an expedia-shaped input: null-filter
    (F1), identity projection (F2 — free), date parse/diff/bucket (F3-F5),
    emitting input + ``stay_category`` (F6). One output row per non-null
    input row (intended semantics; see SURVEY.md §2 bug note)."""
    filtered = df.filter(F.col("id").isNotNull())  # F1 (reference: src/main.py:43-45)
    return enrich_stay(filtered, "srch_ci", "srch_co", dates_are_strings=True)
