"""Eighth query wave: type-system evidence — cast/try_cast battery and
exact DECIMAL aggregation.

The decimal entry is the money-correctness statement: double sums drift
with partition count and add order (non-associative fp addition); casting
to DECIMAL(18,2) before aggregating makes the sum EXACT and therefore
independent of parallelism — the property a financial rollup needs and the
reason both engines agree bit-for-bit here with no rounding in the compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def q_cast_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts across the type lattice + try_cast null-on-failure semantics."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_totalprice").cast("long").alias("price_trunc"),
        F.col("o_totalprice").cast("string").alias("price_str"),
        F.col("o_orderdate").cast("date").alias("as_date"),
        F.col("o_orderdate").cast("string").alias("date_str"),
        F.col("o_orderpriority").try_cast("long").alias("prio_bad_cast"),
        F.substring("o_orderpriority", 1, 1).try_cast("long").alias("prio_digit"),
    )


ORACLE_CAST_BATTERY = """
SELECT o_orderkey,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(trunc(o_totalprice) AS BIGINT) AS price_trunc,
       CAST(o_totalprice AS VARCHAR) AS price_str,
       CAST(o_orderdate AS DATE) AS as_date,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS date_str,
       TRY_CAST(o_orderpriority AS BIGINT) AS prio_bad_cast,
       TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS prio_digit
FROM orders
"""


def q_decimal_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact money rollup: DECIMAL(18,2) sums are associative, so the
    result is identical at any partition count — unlike double sums."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.groupBy("l_returnflag").agg(
        F.sum(price).alias("exact_total"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_DECIMAL_TOTALS = """
SELECT l_returnflag,
       sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS exact_total,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the spark.sql TEXT interface — the engine's SQL
    entry path (same Catalyst plan as the DataFrame cube/rollup, arbitrary
    set list). Views are (re)registered from the parquet tables first."""
    from ..sources.readers import load_table as _lt

    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS grp_id,
               count(*) AS n,
               round(sum(o_totalprice), 2) AS total
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority,
       GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS grp_id,
       count(*) AS n,
       round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""
