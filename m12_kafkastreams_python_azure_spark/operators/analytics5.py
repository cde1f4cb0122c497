"""Fifth query wave: statistical aggregates, correlated scalar subquery
(decorrelated Spark-side), HAVING, UNION ALL, regexp battery, and the batch
form of the tumbling time window.

The correlated-subquery entry shows the engine's stance: ksql/Spark both
execute correlated scalars as a decorrelated aggregate + re-join; we write
the decorrelated form explicitly (one extra small aggregate, one broadcast
join at scale) while the oracle keeps the correlated SQL spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def q_stats_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate battery per return flag. Computed over the
    small-magnitude columns (quantity 1..50, discount 0..0.1) so the
    single-pass moment algorithms of both engines agree to well inside the
    6-decimal compare."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    d = F.col("l_discount")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp(q), 6).alias("qty_stddev"),
        F.round(F.var_samp(q), 6).alias("qty_var"),
        F.round(F.stddev_pop(q), 6).alias("qty_stddev_pop"),
        F.round(F.var_pop(q), 6).alias("qty_var_pop"),
        F.round(F.corr(q, d), 6).alias("qty_disc_corr"),
        F.round(F.covar_samp(q, d), 6).alias("qty_disc_covar"),
        F.round(F.covar_pop(q, d), 6).alias("qty_disc_covar_pop"),
    )


ORACLE_STATS_BATTERY = """
SELECT l_returnflag,
       ROUND(stddev_samp(l_quantity), 6) AS qty_stddev,
       ROUND(var_samp(l_quantity), 6) AS qty_var,
       ROUND(stddev_pop(l_quantity), 6) AS qty_stddev_pop,
       ROUND(var_pop(l_quantity), 6) AS qty_var_pop,
       ROUND(corr(l_quantity, l_discount), 6) AS qty_disc_corr,
       ROUND(covar_samp(l_quantity, l_discount), 6) AS qty_disc_covar,
       ROUND(covar_pop(l_quantity, l_discount), 6) AS qty_disc_covar_pop
FROM lineitem
GROUP BY l_returnflag
"""


def q_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery shape: orders whose price exceeds 1.5x
    their customer's average. Decorrelated explicitly: per-customer avg
    (tiny aggregate) re-joined to orders — at 100 TB the aggregate output
    is |customers| rows and broadcasts."""
    orders = load_table(spark, sf_dir, "orders")
    cust_avg = orders.groupBy("o_custkey").agg(
        F.avg("o_totalprice").alias("cust_avg")
    )
    return (
        orders.join(F.broadcast(cust_avg), "o_custkey")
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


ORACLE_ABOVE_AVG_ORDERS = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE o_totalprice > (
  SELECT 1.5 * avg(o2.o_totalprice) FROM orders o2
  WHERE o2.o_custkey = o.o_custkey
)
"""


def q_big_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity clears a threshold
    (HAVING), enriched with the order header. The HAVING prunes before the
    join, so only qualifying orderkeys reach it."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return big.join(orders, big.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.round("sum_qty", 2).alias("sum_qty"),
    )


ORACLE_BIG_ORDERS_HAVING = """
SELECT l_orderkey, o_orderdate, o_totalprice, ROUND(sum_qty, 2) AS sum_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
) big JOIN orders ON l_orderkey = o_orderkey
"""


def q_union_all_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: merge two differently-shaped activity sources (orders and
    events) into one (kind, actor, yr) ledger and count — the schema-align +
    unionByName pattern."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.lit("order").alias("kind"),
        F.col("o_custkey").alias("actor"),
        F.year("o_orderdate").alias("yr"),
    )
    events = load_table(spark, sf_dir, "events").select(
        F.lit("event").alias("kind"),
        F.col("user_id").alias("actor"),
        F.year("ts").alias("yr"),
    )
    return (
        orders.unionByName(events)
        .groupBy("kind", "yr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("actor").alias("n_actors"),
        )
    )


ORACLE_UNION_ALL_ACTIVITY = """
WITH ledger AS (
  SELECT 'order' AS kind, o_custkey AS actor, year(o_orderdate) AS yr FROM orders
  UNION ALL
  SELECT 'event' AS kind, user_id AS actor, year(ts) AS yr FROM events
)
SELECT kind, yr, count(*) AS n, count(DISTINCT actor) AS n_actors
FROM ledger GROUP BY kind, yr
"""


def q_regexp_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp scalar battery over documents: global replace, first-group
    extract, match test, match count. (DuckDB needs the 'g' flag to match
    Spark's replace-all semantics.)"""
    docs = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return docs.select(
        "doc_id",
        F.length(F.regexp_replace(t, "[aeiou]", "")).alias("novowel_len"),
        F.regexp_extract(t, "([a-z]+)", 1).alias("first_word"),
        t.rlike("spark").cast("int").alias("mentions_spark"),
        F.size(F.regexp_extract_all(t, F.lit("[a-z]{5,}"), F.lit(0))).alias("n_long_words"),
    )


ORACLE_REGEXP_BATTERY = """
SELECT doc_id,
       length(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len,
       coalesce(regexp_extract(text, '([a-z]+)', 1), '') AS first_word,
       CAST(regexp_matches(text, 'spark') AS INTEGER) AS mentions_spark,
       len(regexp_extract_all(text, '[a-z]{5,}', 0)) AS n_long_words
FROM documents
"""


def q_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the streaming tumbling window (streaming.windows
    .tumbling_counts): same ``F.window`` expression, finite input — the
    stream-batch equivalence pair the oracle can check."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


ORACLE_TUMBLING_HOURLY = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       ROUND(sum(value), 6) AS value_sum
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""
