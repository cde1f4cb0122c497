"""Second wave of query-surface coverage: subqueries (semi/anti joins),
sessionization, scalar string/math functions, percentiles, lenient date
parsing — each ``(spark, sf_dir) -> DataFrame`` with an adjacent DuckDB
oracle (same conventions as ``analytics.py``).

Scale notes: EXISTS/NOT IN compile to broadcast/shuffled semi- and
anti-joins (no per-row subquery execution); sessionization is one shuffle on
the session key + a sort within partitions (Spark's window exec); scalar
functions are free (codegen'd projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.functions.dates import parse_date_lenient
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def q_priority_orders_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery -> left-semi join.
    Orders counted per priority where some lineitem shipped after order date."""
    _prep(spark)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = li.filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_PRIORITY_ORDERS_EXISTS = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_orderpriority
"""


def q_orders_no_lineitems_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join: orders with no early-shipped lineitem."""
    _prep(spark)
    orders = load_table(spark, sf_dir, "orders")
    early = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp")
    )
    return (
        orders.join(early, orders.o_orderkey == early.l_orderkey, "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_ORDERS_NO_LINEITEMS_ANTI = """
SELECT o_orderstatus, COUNT(*) AS n_orders
FROM orders
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
)
GROUP BY o_orderstatus
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + running sum — the
    batch shape of a streaming session window. One shuffle on user_id."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn(
        "new_session",
        (
            # NTZ has no direct bigint cast; via TIMESTAMP is exact (UTC session)
            F.col("ts").cast("timestamp").cast("long")
            - F.lag(F.col("ts").cast("timestamp").cast("long")).over(w)
            > 1800
        )
        .cast("int")
        .alias("new_session"),
    ).withColumn("new_session", F.coalesce(F.col("new_session"), F.lit(1)))
    sessions = gapped.withColumn(
        "session_seq", F.sum("new_session").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .withColumnRenamed("session_seq", "session_id")
        .withColumn("session_id", F.col("session_id").cast("long"))
    )


ORACLE_SESSIONIZE_EVENTS = """
WITH gapped AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) > 1800
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gapped
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""


def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string-function battery over part names (codegen'd projection)."""
    _prep(spark)
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace(F.col("p_name"), "[aeiou]", "").alias("name_novowel"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_first"),
    )


ORACLE_STRING_FUNCTIONS = """
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_name, 1, 5) AS name_pfx,
       CONCAT_WS('|', p_brand, p_type) AS brand_type,
       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel,
       string_split(p_type, ' ')[1] AS type_first
FROM part
"""


def q_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math-function battery over prices."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt(F.col("l_extendedprice")), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1.0), 6).alias("price_ln"),
        F.round(F.pow(F.col("l_discount") + 1.0, 2), 6).alias("disc_sq"),
        F.ceil(F.col("l_quantity")).cast("long").alias("qty_ceil"),
        F.floor(F.col("l_quantity") / 7).cast("long").alias("qty_div7"),
        F.abs(F.col("l_tax") - 0.05).alias("tax_dev"),
    )


ORACLE_MATH_FUNCTIONS = """
SELECT l_orderkey, l_linenumber,
       ROUND(sqrt(l_extendedprice), 6) AS price_sqrt,
       ROUND(ln(l_extendedprice + 1.0), 6) AS price_ln,
       ROUND(pow(l_discount + 1.0, 2), 6) AS disc_sq,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_quantity / 7) AS BIGINT) AS qty_div7,
       abs(l_tax - 0.05) AS tax_dev
FROM lineitem
"""


def q_quantity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per return flag (Spark ``percentile``
    == DuckDB ``quantile_cont``)."""
    _prep(spark)
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("qty_p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("qty_p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias("price_p99"),
    )


ORACLE_QUANTITY_PERCENTILES = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
       ROUND(quantile_cont(l_quantity, 0.9), 6) AS qty_p90,
       ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
FROM lineitem
GROUP BY l_returnflag
"""


def q_date_parse_lenient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 on driver data: round-trip timestamps through strings in mixed
    formats and parse back leniently (null = unparseable contract)."""
    _prep(spark)
    ev = load_table(spark, sf_dir, "events")
    # deterministic mixed formats keyed by event_id
    as_str = ev.select(
        "event_id",
        F.when(F.col("event_id") % 3 == 0, F.date_format("ts", "yyyy-MM-dd"))
        .when(F.col("event_id") % 3 == 1, F.date_format("ts", "yyyy/MM/dd"))
        .otherwise(F.lit("not-a-date"))
        .alias("ts_str"),
    )
    return as_str.select(
        "event_id", parse_date_lenient(F.col("ts_str")).alias("parsed_date")
    )


ORACLE_DATE_PARSE_LENIENT = """
SELECT event_id,
       CASE WHEN event_id % 3 = 0 THEN CAST(strftime(ts, '%Y-%m-%d') AS DATE)
            WHEN event_id % 3 = 1 THEN CAST(strptime(strftime(ts, '%Y/%m/%d'), '%Y/%m/%d') AS DATE)
            ELSE NULL END AS parsed_date
FROM events
"""
