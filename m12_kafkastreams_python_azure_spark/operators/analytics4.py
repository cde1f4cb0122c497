"""Fourth query wave: JSON extraction, pivot, date/time battery,
deterministic sampling, and skew-resistant salted aggregation.

The salted aggregation is the scale-critical one: at 100 TB a handful of hot
keys (one viral user, one dominant category) can pin an entire groupBy on a
single reducer. Salting splits each key across N sub-aggregates and
recombines — same answer, bounded per-task state. AQE's skew handling covers
joins; salting covers aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction: pull ``$.k`` out of the ``events.props`` JSON
    string and aggregate per event type. ``get_json_object`` is a codegen'd
    JVM expression — the JSON never touches Python."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.avg("k").alias("k_avg"),
            F.max("k").alias("k_max"),
        )
    )


ORACLE_JSON_EXTRACT = """
SELECT event_type,
       count(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       avg(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_avg,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max
FROM events
GROUP BY event_type
"""


def q_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one row per day, one count column per event type. The pivot
    value list is PINNED (not discovered) — at scale that skips an extra
    distinct-scan job and keeps the output schema stable."""
    ev = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    return (
        ev.groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .na.fill(0, EVENT_TYPES)
    )


ORACLE_PIVOT_DAILY = """
SELECT CAST(ts AS DATE) AS day,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events
GROUP BY CAST(ts AS DATE)
"""


def q_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar battery over orders. ``dayofweek`` is normalized to
    Spark's convention (1=Sunday) in the oracle; everything else is
    convention-identical between the engines."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.quarter(d).alias("qtr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.add_months(d.cast("date"), 3).alias("plus3mo"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch_start"
        ),
    )


ORACLE_DATETIME_FUNCTIONS = """
SELECT o_orderkey,
       year(o_orderdate) AS yr,
       quarter(o_orderdate) AS qtr,
       month(o_orderdate) AS mon,
       dayofmonth(o_orderdate) AS dom,
       dayofweek(o_orderdate) + 1 AS dow,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(o_orderdate AS DATE) + 30 AS plus30,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3mo,
       datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start
FROM orders
"""


def q_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic key-based sampling: keep the ~5% of lineitem rows whose
    order key lands in one residue class, then summarize. Unlike RNG
    sampling this is reproducible across engines/runs and co-samples all
    rows of one order — the property training-data pipelines need for
    leakage-free holdouts. The filter is a pushdown-able predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    # decimal-exact sums (the region_revenue sf1 lesson): double sums are
    # partition-order-dependent and price_sum crossed the compare's
    # 6-decimal boundary at sf1; decimal sums are order-independent
    return (
        li.filter(F.pmod(F.col("l_orderkey"), F.lit(20)) == 3)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("qty_sum"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("price_sum"),
        )
    )


ORACLE_HASH_SAMPLE = """
SELECT l_returnflag,
       count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_sum,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS price_sum
FROM lineitem
WHERE l_orderkey % 20 = 3
GROUP BY l_returnflag
"""


def salted_count(df: DataFrame, key: str, salt_src: str, buckets: int = 8) -> DataFrame:
    """Two-stage skew-resistant count: groupBy (key, salt) then re-aggregate
    by key. A deterministic salt (hash of another column) spreads any hot
    key over ``buckets`` reducers in stage 1; stage 2 combines ``buckets``
    tiny partials per key. Same result as a plain groupBy-count."""
    salt = F.pmod(F.xxhash64(F.col(salt_src)), F.lit(buckets)).alias("__salt")
    partial = df.groupBy(F.col(key), salt).agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("n_events"))


def q_salted_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted per-user event counts — identical answer to the plain
    groupBy, robust to one user owning half the table."""
    ev = load_table(spark, sf_dir, "events")
    return salted_count(ev, key="user_id", salt_src="event_id", buckets=8)


ORACLE_SALTED_USER_COUNTS = """
SELECT user_id, count(*) AS n_events
FROM events
GROUP BY user_id
"""


def q_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional / null-handling scalar battery over orders: coalesce,
    nullif, least/greatest, count_if-style filtered aggregates."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_totalprice")
    return (
        o.select(
            "o_orderstatus",
            p,
            F.least(p, F.lit(50000.0)).alias("capped"),
            F.greatest(p, F.lit(1000.0)).alias("floored"),
            F.nullif(F.col("o_orderpriority"), F.lit("3-MEDIUM")).alias("prio_nn"),
        )
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            # decimal-exact money sums (the region_revenue sf1 lesson):
            # both raw double sums crossed the 6-decimal compare boundary
            # at sf1 on partition-order ulp drift
            F.sum(F.col("capped").cast("decimal(12,2)"))
            .cast("double")
            .alias("capped_sum"),
            F.sum(F.col("floored").cast("decimal(12,2)"))
            .cast("double")
            .alias("floored_sum"),
            F.count("prio_nn").alias("n_non_medium"),
            F.count_if(p > 100000.0).alias("n_big"),
            F.coalesce(F.avg(F.when(p < 0, p)), F.lit(0.0)).alias("neg_avg_or_zero"),
        )
    )


ORACLE_CONDITIONAL_FUNCTIONS = """
SELECT o_orderstatus,
       count(*) AS n,
       CAST(sum(CAST(least(o_totalprice, 50000.0) AS DECIMAL(12,2)))
            AS DOUBLE) AS capped_sum,
       CAST(sum(CAST(greatest(o_totalprice, 1000.0) AS DECIMAL(12,2)))
            AS DOUBLE) AS floored_sum,
       count(nullif(o_orderpriority, '3-MEDIUM')) AS n_non_medium,
       count(*) FILTER (o_totalprice > 100000.0) AS n_big,
       coalesce(avg(CASE WHEN o_totalprice < 0 THEN o_totalprice END), 0.0) AS neg_avg_or_zero
FROM orders
GROUP BY o_orderstatus
"""
