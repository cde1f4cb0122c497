"""Twelfth query wave: gaps-and-islands and percent-of-total.

- ``orderkey_islands``: the classic gaps-and-islands pattern — group
  consecutive integer keys into runs via the ``key - row_number()``
  invariant, sharded two-level (parallel key pass within value shards, a
  tiny segment-level stitch across shard boundaries) so no window scans
  the full key set on one task; the standard completeness audit for
  ingested key ranges.
- ``region_revenue_share``: percent-of-total via an unpartitioned window
  sum over an already-aggregated frame — the total rides a single-row
  exchange, not a rescan of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table


ISLAND_SHARD_WIDTH = 1 << 20  # 1M keys per shard for the key-level pass


def q_orderkey_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs of consecutive o_orderkey values: island start, end, length.

    Two-level shape so no window ever sees the whole key set (a naive
    unpartitioned ``row_number`` would funnel every key through one task):

    1. key level — ``k - row_number()`` within fixed-width VALUE shards
       (``k div W``; the window partitions by shard, so the heavy pass is
       fully parallel) yields per-shard island segments;
    2. segment level — segments are ~(#islands + #shards), orders of
       magnitude smaller than keys, so one small global window stitches
       segments that touch across a shard boundary
       (``start == lag(end) + 1``) into final islands.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k")
    ).distinct()
    shard = (F.col("k") / ISLAND_SHARD_WIDTH).cast("long")
    wk = Window.partitionBy("shard").orderBy("k")
    segs = (
        o.withColumn("shard", shard)
        .withColumn("grp", F.col("k") - F.row_number().over(wk))
        .groupBy("shard", "grp")
        .agg(
            F.min("k").alias("seg_start"),
            F.max("k").alias("seg_end"),
            F.count(F.lit(1)).alias("seg_len"),
        )
    )
    ws = Window.orderBy("seg_start")
    stitched = segs.withColumn(
        "new_island",
        F.when(
            F.col("seg_start") == F.lag("seg_end").over(ws) + 1, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "island_id", F.sum("new_island").over(ws.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        stitched.groupBy("island_id")
        .agg(
            F.min("seg_start").alias("island_start"),
            F.max("seg_end").alias("island_end"),
            F.sum("seg_len").alias("island_len"),
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
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(5,4)")
    )
    per_region = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.sum(rev).alias("revenue"))
    )
    w = Window.partitionBy()
    # exact decimal sums; the 5-row window total is a sum of exact
    # decimals (also exact), so the share divides two deterministic
    # doubles — the market_share_q8 ratio pattern
    return per_region.select(
        "r_name",
        F.round("revenue", 2).cast("double").alias("revenue"),
        F.round(
            F.col("revenue").cast("double")
            / F.sum("revenue").over(w).cast("double"),
            6,
        ).alias("share"),
    )


ORACLE_REGION_REVENUE_SHARE = """
WITH per_region AS (
  SELECT r_name, sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(5,4)))) AS revenue
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
)
SELECT r_name,
       CAST(ROUND(revenue, 2) AS DOUBLE) AS revenue,
       ROUND(CAST(revenue AS DOUBLE)
             / CAST(sum(revenue) OVER () AS DOUBLE), 6) AS share
FROM per_region
"""
