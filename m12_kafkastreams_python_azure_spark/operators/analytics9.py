"""Ninth query wave: window FRAMES (RANGE vs ROWS, first/last/nth_value),
median, bitwise aggregates, array set operations, and a ``mapInArrow``
operator (the lowest-overhead Python path: raw Arrow RecordBatches, no
pandas materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table


def q_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame semantics battery: ROWS running frame vs whole-partition frame
    with first/last/nth_value. last_value needs the full-partition frame —
    the classic frame-default trap, spelled explicitly on both engines."""
    o = load_table(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    rows3 = order_w.rowsBetween(-2, Window.currentRow)
    full = order_w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.avg("o_totalprice").over(rows3), 6).alias("moving_avg3"),
        F.first("o_totalprice").over(full).alias("first_price"),
        F.last("o_totalprice").over(full).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(full).alias("second_price"),
    )


ORACLE_WINDOW_FRAMES = """
SELECT o_orderkey, o_custkey,
       ROUND(avg(o_totalprice) OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg3,
       first_value(o_totalprice) OVER w_full AS first_price,
       last_value(o_totalprice) OVER w_full AS last_price,
       nth_value(o_totalprice, 2) OVER w_full AS second_price
FROM orders
WINDOW w_full AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_median_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median + min/max spread per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.median("l_quantity"), 6).alias("qty_median"),
        F.round(F.median("l_extendedprice"), 6).alias("price_median"),
        F.min("l_quantity").alias("qty_min"),
        F.max("l_quantity").alias("qty_max"),
    )


ORACLE_MEDIAN_AGGREGATES = """
SELECT l_linestatus,
       ROUND(median(l_quantity), 6) AS qty_median,
       ROUND(median(l_extendedprice), 6) AS price_median,
       min(l_quantity) AS qty_min,
       max(l_quantity) AS qty_max
FROM lineitem
GROUP BY l_linestatus
"""


def q_bitwise_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates over event ids per user — the flag-set
    merge pattern (e.g. OR-ing capability bitmasks)."""
    ev = load_table(spark, sf_dir, "events")
    masked = F.col("event_id").bitwiseAND(F.lit(255))
    return ev.groupBy("user_id").agg(
        F.bit_and(masked).alias("flags_and"),
        F.bit_or(masked).alias("flags_or"),
        F.bit_xor(masked).alias("flags_xor"),
    )


ORACLE_BITWISE_AGGREGATES = """
SELECT user_id,
       bit_and(event_id & 255) AS flags_and,
       bit_or(event_id & 255) AS flags_or,
       bit_xor(event_id & 255) AS flags_xor
FROM events
GROUP BY user_id
"""


def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set algebra between consecutive docs' word sets: union /
    intersect / except sizes plus the sorted intersection as a CSV string
    (canonicalized so both engines hash-match)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.array_distinct(F.split(F.trim("text"), "\\s+"))
    a = docs.select(F.col("doc_id").alias("id_a"), words.alias("wa"))
    b = docs.select(F.col("doc_id").alias("id_b"), words.alias("wb"))
    j = a.join(b, F.col("id_a") + 1 == F.col("id_b"))
    return j.select(
        "id_a",
        "id_b",
        F.size(F.array_union("wa", "wb")).alias("n_union"),
        F.size(F.array_intersect("wa", "wb")).alias("n_intersect"),
        F.size(F.array_except("wa", "wb")).alias("n_only_a"),
        F.concat_ws(",", F.array_sort(F.array_intersect("wa", "wb"))).alias(
            "common_words"
        ),
    )


ORACLE_ARRAY_SET_OPS = """
WITH w AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\\s+')) AS ws
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       len(list_distinct(list_concat(a.ws, b.ws))) AS n_union,
       len(list_intersect(a.ws, b.ws)) AS n_intersect,
       len(list_filter(a.ws, x -> NOT list_contains(b.ws, x))) AS n_only_a,
       -- COALESCE: DuckDB array_to_string([]) is NULL, Spark concat_ws
       -- is '' — fires only when adjacent docs share zero words (first
       -- occurs at sf0.1; caught by the tier-robustness sweep)
       COALESCE(array_to_string(list_sort(list_intersect(a.ws, b.ws)), ','),
                '') AS common_words
FROM w a JOIN w b ON a.doc_id + 1 = b.doc_id
"""


def q_arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow: UTF-8 byte accounting per language, computed on raw
    Arrow RecordBatches (no pandas conversion at all) then aggregated
    JVM-side. The minimal-overhead shape for byte-level Python kernels."""
    import pyarrow as pa

    def batches(it):
        for batch in it:
            langs = batch.column("lang")
            texts = batch.column("text")
            nbytes = pa.array(
                [
                    len(t.as_py().encode("utf-8")) if t.is_valid else 0
                    for t in texts
                ],
                type=pa.int64(),
            )
            yield pa.RecordBatch.from_arrays([langs, nbytes], ["lang", "nbytes"])

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    par = spark.sparkContext.defaultParallelism
    sized = docs.repartition(par).mapInArrow(batches, "lang string, nbytes long")
    return sized.groupBy("lang").agg(
        F.sum("nbytes").alias("total_bytes"),
        F.count(F.lit(1)).alias("n_docs"),
    )


ORACLE_ARROW_BYTE_STATS = """
SELECT lang, CAST(sum(strlen(text)) AS BIGINT) AS total_bytes, count(*) AS n_docs
FROM documents
GROUP BY lang
"""


def q_string_functions2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery: LIKE patterns, split_part, translate, padding,
    repeat/reverse, left/right slices, replace, contains family."""
    o = load_table(spark, sf_dir, "orders")
    p = F.col("o_orderpriority")
    return o.select(
        "o_orderkey",
        p.like("%URGENT%").cast("int").alias("is_urgent_like"),
        F.split_part(p, F.lit("-"), F.lit(2)).alias("prio_word"),
        F.translate(p, "-", "_").alias("prio_underscored"),
        F.lpad(F.col("o_orderkey").cast("string"), 10, "0").alias("key_padded"),
        F.repeat(F.left(p, F.lit(1)), 2).alias("code_doubled"),
        F.reverse(F.col("o_orderstatus")).alias("status_rev"),
        F.right(p, F.lit(3)).alias("prio_tail"),
        F.replace(p, F.lit("HIGH"), F.lit("H")).alias("prio_short"),
        F.contains(p, F.lit("LOW")).cast("int").alias("has_low"),
        F.startswith(p, F.lit("1")).cast("int").alias("is_first"),
        F.endswith(p, F.lit("ED")).cast("int").alias("ends_ed"),
    )


ORACLE_STRING_FUNCTIONS2 = """
SELECT o_orderkey,
       CAST(o_orderpriority LIKE '%URGENT%' AS INTEGER) AS is_urgent_like,
       split_part(o_orderpriority, '-', 2) AS prio_word,
       translate(o_orderpriority, '-', '_') AS prio_underscored,
       lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS key_padded,
       repeat(left(o_orderpriority, 1), 2) AS code_doubled,
       reverse(o_orderstatus) AS status_rev,
       right(o_orderpriority, 3) AS prio_tail,
       replace(o_orderpriority, 'HIGH', 'H') AS prio_short,
       CAST(contains(o_orderpriority, 'LOW') AS INTEGER) AS has_low,
       CAST(starts_with(o_orderpriority, '1') AS INTEGER) AS is_first,
       CAST(ends_with(o_orderpriority, 'ED') AS INTEGER) AS ends_ed
FROM orders
"""


def q_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin pattern (TPC-H Q2 shape): per part, the supplier with the
    lowest observed price. Implemented as ONE aggregate — min over a
    (price, suppkey) struct, which is a deterministic argmin with suppkey
    tie-break — instead of the naive min-then-join-back double scan."""
    li = load_table(spark, sf_dir, "lineitem")
    m = F.min(F.struct("l_extendedprice", "l_suppkey")).alias("m")
    return (
        li.groupBy("l_partkey")
        .agg(m)
        .select(
            "l_partkey",
            F.col("m.l_extendedprice").alias("min_price"),
            F.col("m.l_suppkey").alias("best_suppkey"),
        )
    )


ORACLE_CHEAPEST_SUPPLIER = """
WITH mp AS (
  SELECT l_partkey, min(l_extendedprice) AS min_price
  FROM lineitem GROUP BY l_partkey
)
SELECT mp.l_partkey, mp.min_price, min(l.l_suppkey) AS best_suppkey
FROM mp JOIN lineitem l
  ON l.l_partkey = mp.l_partkey AND l.l_extendedprice = mp.min_price
GROUP BY mp.l_partkey, mp.min_price
"""


def q_trailing_hour_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over event time: per event, how many events the
    same user produced in the trailing hour (inclusive). RANGE (value-based)
    vs ROWS (count-based) is the frame distinction that matters for
    irregular time series."""
    ev = load_table(spark, sf_dir, "events")
    hour_us = 3600 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-(hour_us - 1), Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_hour"),
        F.round(F.sum("value").over(w), 6).alias("value_trailing_hour"),
    )


ORACLE_TRAILING_HOUR_COUNTS = """
SELECT event_id, user_id,
       count(*) OVER w AS n_trailing_hour,
       ROUND(sum(value) OVER w, 6) AS value_trailing_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3599999999 PRECEDING AND CURRENT ROW)
"""


def q_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (explode with ordinality): the first three words of each
    document with their positions — one output row per (doc, position)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), "\\s+")
    return (
        docs.select("doc_id", F.posexplode(F.slice(words, 1, 3)).alias("pos", "word"))
    )


ORACLE_WORD_POSITIONS = """
WITH ws AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents
)
SELECT doc_id, u['pos'] AS pos, u['word'] AS word
FROM (
  SELECT doc_id,
         unnest(list_transform(range(1, least(3, len(w)) + 1),
                               i -> {'pos': i - 1, 'word': w[i]})) AS u
  FROM ws
)
"""
