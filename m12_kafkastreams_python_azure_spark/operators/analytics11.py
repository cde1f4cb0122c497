"""Eleventh query wave: string edit distance and a conversion funnel.

- ``edit_distance_pairs``: Levenshtein over a deterministic candidate pair
  set (consecutive doc ids) on truncated prefixes — the fuzzy-matching
  primitive for record linkage / near-dup triage. Bounding the operand
  length is the scale discipline: Levenshtein is O(len^2) per pair, so at
  100 TB you run it on prefixes/sketch survivors, never raw documents.
- ``purchase_funnel``: classic event-funnel (first click -> first purchase
  strictly after it, per user) via two conditional min-aggregates — one
  shuffle on user_id, no self-join, then a tiny per-day rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def q_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein distance between consecutive documents' 40-char prefixes
    (deterministic pair set; join is a 1-to-1 equi-join on doc_id+1)."""
    docs = load_table(spark, sf_dir, "documents")
    a = docs.select(
        F.col("doc_id").alias("id_a"), F.substring("text", 1, 40).alias("pa")
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"), F.substring("text", 1, 40).alias("pb")
    )
    return (
        a.join(b, a.id_a + 1 == b.id_b)
        .select(
            "id_a",
            "id_b",
            F.levenshtein("pa", "pb").alias("edit_dist"),
            F.length("pa").alias("len_a"),
            F.length("pb").alias("len_b"),
        )
    )


ORACLE_EDIT_DISTANCE_PAIRS = """
WITH p AS (
  SELECT doc_id, substr(text, 1, 40) AS pre FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.pre, b.pre) AS INTEGER) AS edit_dist,
       CAST(strlen(a.pre) AS INTEGER) AS len_a,
       CAST(strlen(b.pre) AS INTEGER) AS len_b
FROM p a JOIN p b ON a.doc_id + 1 = b.doc_id
"""


def q_purchase_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user click->purchase funnel rolled up by first-click day:
    users who clicked, and how many later purchased (strictly after their
    first click). Two conditional aggregates over one user_id shuffle —
    the no-self-join funnel shape that survives any scale."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias(
                "first_click"
            ),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
                "first_purchase_any"
            ),
        )
        .filter(F.col("first_click").isNotNull())
        .withColumn(
            "converted",
            (
                F.col("first_purchase_any").isNotNull()
                & (F.col("first_purchase_any") > F.col("first_click"))
            ).cast("int"),
        )
    )
    return (
        per_user.groupBy(F.to_date("first_click").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_clickers"),
            F.sum("converted").alias("n_converted"),
            F.round(F.avg("converted"), 6).alias("conversion_rate"),
        )
    )


ORACLE_PURCHASE_FUNNEL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase_any
  FROM events GROUP BY user_id
), conv AS (
  SELECT first_click,
         CASE WHEN first_purchase_any IS NOT NULL
                   AND first_purchase_any > first_click
              THEN 1 ELSE 0 END AS converted
  FROM per_user WHERE first_click IS NOT NULL
)
SELECT CAST(first_click AS DATE) AS cohort_day,
       count(*) AS n_clickers,
       CAST(sum(converted) AS BIGINT) AS n_converted,
       ROUND(avg(converted), 6) AS conversion_rate
FROM conv GROUP BY 1
"""


def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type battery over orders: construction (map_from_arrays),
    element access, cardinality, and key listing — all Catalyst map
    expressions, reduced to scalar columns so the oracle compare is
    representation-independent (DuckDB map access returns single-element
    lists; the oracle unwraps with [1])."""
    o = load_table(spark, sf_dir, "orders")
    m = F.map_from_arrays(
        F.array(F.lit("status"), F.lit("priority")),
        F.array(F.col("o_orderstatus"), F.col("o_orderpriority")),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "priority").alias("priority_val"),
        F.size(m).alias("n_entries"),
        F.concat_ws(",", F.map_keys(m)).alias("keys_csv"),
    )


ORACLE_MAP_FUNCTIONS = """
WITH m AS (
  SELECT o_orderkey,
         MAP(['status', 'priority'], [o_orderstatus, o_orderpriority]) AS mp
  FROM orders
)
SELECT o_orderkey,
       mp['status'][1] AS status_val,
       mp['priority'][1] AS priority_val,
       CAST(cardinality(mp) AS INTEGER) AS n_entries,
       array_to_string(map_keys(mp), ',') AS keys_csv
FROM m
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-event-type rates applied via
    a key-modulo predicate (purchase 100%, click 10%, rest 2%) — fully
    reproducible across engines and runs, unlike seeded RNG sampling, and
    it pushes into the scan as an ordinary filter. The rollup counts what
    survived per stratum."""
    ev = load_table(spark, sf_dir, "events")
    rate = (
        F.when(F.col("event_type") == "purchase", 100)
        .when(F.col("event_type") == "click", 10)
        .otherwise(2)
    )
    return (
        ev.filter(F.pmod(F.col("event_id"), F.lit(100)) < rate)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


ORACLE_STRATIFIED_SAMPLE = """
SELECT event_type,
       count(*) AS n_sampled,
       count(DISTINCT user_id) AS n_users
FROM events
WHERE event_id % 100 < CASE event_type
                         WHEN 'purchase' THEN 100
                         WHEN 'click' THEN 10
                         ELSE 2 END
GROUP BY event_type
"""
