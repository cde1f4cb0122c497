"""Twelfth query wave: gaps-and-islands and percent-of-total.

- ``orderkey_islands``: the classic gaps-and-islands pattern — group
  consecutive integer keys into runs via the ``key - row_number()``
  invariant (constant within a consecutive run). One sort-shuffle, no
  self-join; the standard completeness audit for ingested key ranges.
- ``region_revenue_share``: percent-of-total via an unpartitioned window
  sum over an already-aggregated frame — the total rides a single-row
  exchange, not a rescan of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table


def q_orderkey_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs of consecutive o_orderkey values: island start, end, length.
    ``k - row_number()`` is constant exactly within a consecutive run, so
    one groupBy on that difference yields the islands."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    ).distinct()
    w = Window.orderBy("k")
    runs = o.withColumn("grp", F.col("k") - F.row_number().over(w))
    return (
        runs.groupBy("grp")
        .agg(
            F.min("k").alias("island_start"),
            F.max("k").alias("island_end"),
            F.count(F.lit(1)).alias("island_len"),
        )
        .select("island_start", "island_end", "island_len")
    )


ORACLE_ORDERKEY_ISLANDS = """
WITH runs AS (
  SELECT k, k - row_number() OVER (ORDER BY k) AS grp
  FROM (SELECT DISTINCT o_orderkey AS k FROM orders)
)
SELECT min(k) AS island_start, max(k) AS island_end, count(*) AS island_len
FROM runs GROUP BY grp
"""


def q_region_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each region's share of total revenue: aggregate once, then a
    window-sum over the 5-row aggregate computes the denominator — the
    fact table is scanned exactly once."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_region = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum(rev).alias("revenue"))
    )
    w = Window.partitionBy()
    return per_region.select(
        "r_name",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w), 6).alias("share"),
    )


ORACLE_REGION_REVENUE_SHARE = """
WITH per_region AS (
  SELECT r_name, sum(l_extendedprice * (1 - l_discount)) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
)
SELECT r_name,
       ROUND(revenue, 2) AS revenue,
       ROUND(revenue / sum(revenue) OVER (), 6) AS share
FROM per_region
"""
