"""Thirteenth query wave: distribution profiling.

- ``histogram_bins``: fixed-width histogram of l_extendedprice computed as
  ONE pass + one tiny agg (bin = floor((x - lo) / width) — no sort, no
  window; the profiling shape that works at any scale, unlike
  quantile-by-sorting).
- ``benford_digits``: leading-digit distribution of order totals vs the
  Benford expectation — the classic data-quality / fraud screen; pure
  string/log arithmetic, zero shuffle beyond a 9-row agg.
- ``corr_battery``: Pearson correlation / covariance between lineitem
  numeric columns; algebraic aggregates (sum/sum-of-products) so map-side
  partials apply — one pass over the fact table for the whole matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

N_BINS = 20


def q_histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of l_extendedprice: bounds from one tiny
    min/max agg (folded in as literals), then bin = clamped
    floor((x - lo) / width). Single scan + one ~20-row aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    width = (float(hi) - float(lo)) / N_BINS
    bin_id = F.least(
        F.lit(N_BINS - 1),
        F.floor((F.col("l_extendedprice") - F.lit(float(lo))) / F.lit(width)),
    ).cast("long")
    return (
        li.select(bin_id.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            F.round(F.lit(float(lo)) + F.col("bin") * F.lit(width), 4).alias(
                "bin_lo"
            ),
            "n",
        )
    )


ORACLE_HISTOGRAM_BINS = f"""
WITH bounds AS (
  SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi
  FROM lineitem
),
binned AS (
  SELECT least({N_BINS - 1},
               CAST(floor((l_extendedprice - lo) / ((hi - lo) / {N_BINS}))
                    AS BIGINT)) AS bin,
         lo, hi
  FROM lineitem, bounds
)
SELECT bin,
       ROUND(lo + bin * ((hi - lo) / {N_BINS}), 4) AS bin_lo,
       count(*) AS n
FROM binned
GROUP BY bin, lo, hi
"""


def q_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of o_totalprice vs Benford's law
    expectation log10(1 + 1/d) — observed share, expected share, and the
    absolute deviation per digit. Natural amount data should track
    Benford closely; a big deviation flags synthetic/rounded data."""
    o = load_table(spark, sf_dir, "orders")
    # floor() explicitly: Spark's double->bigint cast truncates while
    # DuckDB's rounds — floor is the one spelling both agree on.
    digit = F.substring(
        F.floor("o_totalprice").cast("string"), 1, 1
    ).cast("int")
    counts = o.select(digit.alias("d")).groupBy("d").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("total"))
    expected = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("d"))
    share = F.col("n").cast("double") / F.col("total").cast("double")
    return (
        counts.join(F.broadcast(total))
        .select(
            "d",
            "n",
            F.round(share, 6).alias("observed"),
            F.round(expected, 6).alias("benford"),
            F.round(F.abs(share - expected), 6).alias("abs_dev"),
        )
    )


ORACLE_BENFORD_DIGITS = """
WITH counts AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                        1, 1) AS INT) AS d,
         count(*) AS n
  FROM orders GROUP BY 1
),
total AS (SELECT sum(n) AS total FROM counts)
SELECT d, n,
       ROUND(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS observed,
       ROUND(log10(1.0 + 1.0 / d), 6) AS benford,
       ROUND(abs(CAST(n AS DOUBLE) / CAST(total AS DOUBLE)
                 - log10(1.0 + 1.0 / d)), 6) AS abs_dev
FROM counts, total
"""


def q_corr_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations + covariance over lineitem numeric
    columns in ONE aggregation pass (corr/covar are algebraic — partial
    sums map-side, constant-size merge)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "corr_qty_price"
        ),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias(
            "corr_price_disc"
        ),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("corr_qty_disc"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
    )


ORACLE_CORR_BATTERY = """
SELECT count(*) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
       ROUND(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
       ROUND(corr(l_quantity, l_discount), 6) AS corr_qty_disc,
       ROUND(covar_samp(l_quantity, l_extendedprice), 4) AS covar_qty_price
FROM lineitem
"""
