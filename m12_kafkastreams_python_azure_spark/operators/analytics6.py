"""Sixth query wave: four more canonical TPC-H query shapes (Q4, Q6, Q12,
Q14) and a grouped-map ``applyInPandas`` operator (per-group z-score) —
the batch Arrow path where a whole group lands in one pandas DataFrame.

The TPC-H shapes matter for plan quality, not novelty: Q6 is the pure
pushdown test (every predicate must reach the scan), Q12 is join +
conditional aggregation, Q14 is a ratio-of-sums over a join, Q4 is
EXISTS-with-date-range. Each is the smallest query that would expose a
missing optimization at 100 TB.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def q_priority_count_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in a date range having at least one late
    lineitem (EXISTS -> left-semi join), counted per priority."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    # this testdata has no commit/receipt dates; "late" proxy = top tax band
    late = load_table(spark, sf_dir, "lineitem").filter(F.col("l_tax") > 0.06)
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_PRIORITY_COUNT_Q4 = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_tax > 0.06
  )
GROUP BY o_orderpriority
"""


def q_forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure filter + single aggregate. The whole query is
    one scan — every predicate (date range, discount band, quantity cap)
    must show up in the parquet PushedFilters for the plan to be right."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * F.col("l_discount").cast("decimal(5,4)")
                ), 2
            ).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


ORACLE_FORECAST_REVENUE_Q6 = """
SELECT CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(l_discount AS DECIMAL(5,4))), 2) AS DOUBLE)
         AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


def q_shipmode_priority_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: join + conditional (CASE) aggregation — line counts
    split into high/low priority inside the aggregate, grouped by return
    flag (this testdata's stand-in for ship mode)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "A")
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


ORACLE_SHIPMODE_PRIORITY_Q12 = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_returnflag IN ('R', 'A')
GROUP BY l_returnflag
"""


def q_promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio-of-conditional-sums over a broadcast join
    (part is a dimension — it must broadcast, never shuffle lineitem)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-09-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(5,4)")
    )
    promo = F.col("p_type").startswith("PROMO")
    # exact decimal sums, then ONE double division: deterministic on any
    # partitioning and any engine (the market_share_q8 ratio pattern)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(promo, rev).otherwise(F.lit(0).cast("decimal(18,6)"))
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_PROMO_REVENUE_Q14 = """
SELECT ROUND(
         100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                          THEN CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(5,4)))
                          ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
         / CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(5,4)))) AS DOUBLE), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-09-01'
"""


ZSCORE_SCHEMA = "event_id long, event_type string, value double, zscore double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Whole-group pandas transform: z-score within the group (sample
    stddev, ddof=1 — matches SQL stddev_samp)."""
    mu = pdf["value"].mean()
    sd = pdf["value"].std(ddof=1)
    out = pdf[["event_id", "event_type", "value"]].copy()
    out["zscore"] = (pdf["value"] - mu) / sd if sd and sd > 0 else 0.0
    return out


def zscore_per_group(events: DataFrame, group_col: str = "event_type") -> DataFrame:
    """Grouped-map applyInPandas: each group arrives as ONE pandas frame.
    The Catalyst twin is a window aggregate; this exists to demonstrate the
    batch Arrow grouped path for logic that genuinely needs pandas/numpy
    (model scoring, scipy stats). Requires groups to fit in executor
    memory — at 100 TB prefer the window-function form unless the Python
    library is the point."""
    return (
        events.select("event_id", group_col, "value")
        .groupBy(group_col)
        .applyInPandas(_zscore_group, ZSCORE_SCHEMA)
    )


def q_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = zscore_per_group(ev)
    return out.select(
        "event_id", "event_type", F.round("zscore", 6).alias("zscore")
    )


ORACLE_ZSCORE_EVENTS = """
SELECT event_id, event_type,
       ROUND((value - avg(value) OVER (PARTITION BY event_type))
             / stddev_samp(value) OVER (PARTITION BY event_type), 6) AS zscore
FROM events
"""
