"""Query surface over the driver testdata tables.

Two groups, each function ``(spark, sf_dir) -> DataFrame`` with an adjacent
DuckDB oracle SQL string (single module so Spark code and oracle can't drift):

1. Reference-surface analogs (SURVEY.md §2): mask (S2), schema-on-read JSON
   projection (S3/K1), null filter (F1), the date-parse/diff/bucket stack
   (F3-F5), and the flagship hotels_count aggregation (K2-K4), mapped onto
   the driver star schema per FIXTURES.md §6 (orders⋈lineitem plays the
   expedia role: o_orderdate=check-in, l_shipdate=check-out,
   l_suppkey=hotel_id).
2. General analytics (TPC-H-shaped) proving the engine's scan/join/agg/
   window/set-op/rollup breadth at scale.

Scale notes (100 TB stance): every join's small side is explicitly
``broadcast()``; aggregates rely on Catalyst's partial (map-side) aggregation;
all money sums are rounded at the final projection only; filters are plain
column predicates so they push into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.functions.dates import (
    stay_category,
    stay_category_case_sql,
)
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

# Mask constant mirrors the reference SMT (azure-source-cc.json:17).
MASK = "0000-00-00 00:00:00"


def _prep(spark: SparkSession) -> None:
    """Session invariants the oracle comparison depends on."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# ---------------------------------------------------------------- reference surface


def q_mask_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2: ingest-time field mask as a constant projection."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", "event_type", F.lit(MASK).alias("props"))


ORACLE_MASK_FIELD = f"""
SELECT event_id, event_type, '{MASK}' AS props FROM events
"""


def q_json_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/K1: schema-on-read — parse the JSON `props` payload with a partial
    declared schema; undeclared fields are simply not materialized."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )


ORACLE_JSON_PROJECTION = """
SELECT event_id, CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events
"""


def q_null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: drop null-payload records (reference: src/main.py:43-45)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("props").isNotNull() & F.col("user_id").isNotNull()).select(
        "event_id", "user_id", "event_type"
    )


ORACLE_NULL_FILTER = """
SELECT event_id, user_id, event_type FROM events
WHERE props IS NOT NULL AND user_id IS NOT NULL
"""


_DURATION_SQL = "datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))"


def _stay_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem with duration + stay_category (F3-F5 on the star
    schema). Column-pruned orders (2 cols) joined on the key; AQE converts
    to broadcast when the pruned side is small, sort-merge otherwise — both
    correct at 100 TB (same-key shuffle, no skew: orderkey is unique)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    dur = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return j.withColumn("duration_days", dur).withColumn(
        "stay_category", stay_category(F.col("duration_days"))
    )


def q_stay_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    return _stay_enriched(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "duration_days", "stay_category"
    )


ORACLE_STAY_ENRICH = f"""
SELECT l_orderkey, l_linenumber,
       CAST({_DURATION_SQL} AS INTEGER) AS duration_days,
       {stay_category_case_sql(_DURATION_SQL)} AS stay_category
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
"""


def q_hotels_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2-K4 flagship: COUNT + COUNT(DISTINCT) per stay_category.

    Partial-agg before the shuffle => only ~partitions x 5 rows move; the
    exact distinct plans Spark's two-phase expand. Flat-cost at 100 TB."""
    _prep(spark)
    from m12_kafkastreams_python_azure_spark.operators.aggregate import hotels_count

    return hotels_count(
        _stay_enriched(spark, sf_dir), "stay_category", "l_suppkey", exact=True
    )


ORACLE_HOTELS_COUNT = f"""
SELECT {stay_category_case_sql(_DURATION_SQL)} AS stay_category,
       COUNT(l_suppkey) AS hotels_amount,
       COUNT(DISTINCT l_suppkey) AS distinct_hotels
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------- general analytics


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy grouped aggregate with a pushed-down
    date filter. The canonical 100 TB pattern: filter+project push into the
    parquet scan, partial agg makes the shuffle tiny (6 groups)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    # money sums in DECIMAL (exact, partition-order-independent — the
    # region_revenue pattern below; these groups are the largest in the
    # suite, exactly where double ulp drift crosses the cent boundary
    # first). sum_qty stays a double sum: quantities are integer-valued,
    # so the sum is exact in double far past 2^50 rows.
    disc_price = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(5,4)")
    )
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2)
            .cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                        AS sum_qty,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
            AS DOUBLE)                                  AS sum_base_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(5,4)))), 2) AS DOUBLE)             AS sum_disc_price,
       ROUND(AVG(l_quantity), 6)                        AS avg_qty,
       ROUND(AVG(l_discount), 6)                        AS avg_disc,
       COUNT(*)                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective join + grouped revenue + deterministic
    top-10 (explicit tiebreak on the key so ordering is engine-independent)."""
    _prep(spark)
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(5,4)")
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


ORACLE_TOP_REVENUE_ORDERS = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(5,4)))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join. True dimensions (region/nation/supplier)
    are broadcast — no shuffle for those joins at any scale. orders⋈customer
    and lineitem⋈orders are fact-fact joins left to the planner (sort-merge
    with AQE at 100 TB; AQE converts to broadcast when a side turns out
    small, as at test SF)."""
    _prep(spark)
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # DECIMAL-exact money sum: a double sum is partition-order-dependent
    # and at sf1 the accumulated ulp error crossed the 2-decimal rounding
    # boundary against DuckDB (one group off by $0.01 — caught by the
    # round-13 sf1 oracle sweep). Per-row casts are deterministic (the
    # fixture's money columns carry <=2/<=4 decimals), the decimal product
    # is exact at (18,6), and a decimal sum is order-independent — the
    # same answer on any partitioning, which is also the right property
    # at 100 TB where partition counts change run to run. Output cast
    # back to double for a stable driver hash dtype.
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(5,4)")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders.select("o_orderkey", "o_custkey"),
              li.l_orderkey == F.col("o_orderkey"))
        .join(cust.select("c_custkey", "c_nationkey"),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue")
        )
    )


ORACLE_REGION_REVENUE = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(5,4)))), 2)
            AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _prep(spark)
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .join(F.broadcast(cust.select("c_custkey", "c_name")),
              F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "total_spend", "n_orders")
        .orderBy(F.col("total_spend").desc(), F.col("c_custkey"))
        .limit(10)
    )


ORACLE_TOP_CUSTOMERS = """
SELECT c_custkey, c_name,
       ROUND(SUM(o_totalprice), 2) AS total_spend,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey
LIMIT 10
"""


def q_window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window function: top-3 orders per customer by price (deterministic
    tiebreak). At scale: single shuffle on the partition key."""
    _prep(spark)
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


ORACLE_WINDOW_TOP_ORDERS = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
"""


def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time daily rollup (the batch shape of the streaming windowed
    aggregate): count, distinct users, value sum per (day, event_type)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.col("ts").cast("date").alias("day"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
    )


ORACLE_EVENTS_DAILY = """
SELECT CAST(ts AS DATE) AS day, event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(value), 2) AS value_sum
FROM events
GROUP BY 1, 2
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (EXCEPT) — plans as a null-aware anti join."""
    _prep(spark)
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    )
    return cust.exceptAll(orders.distinct()).distinct()


ORACLE_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey FROM customer
EXCEPT
SELECT o_custkey AS c_custkey FROM orders
"""


def q_purchase_and_click_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation (INTERSECT) — users who both purchased and clicked
    (plans as a left-semi join; non-empty on the testdata, unlike EXCEPT)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    click = ev.filter(F.col("event_type") == "click").select("user_id")
    return purch.intersect(click)


ORACLE_PURCHASE_AND_CLICK_USERS = """
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click'
"""


def q_rollup_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets family: ROLLUP over (returnflag, linestatus) with
    subtotal + grand-total rows."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


ORACLE_ROLLUP_RETURNFLAG = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""
