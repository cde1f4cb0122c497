"""Seventh query wave: explode/UNNEST (word count), ordered string
aggregation, and the date-spine gap-filling pattern (generator + left join).

Explode is the scale-sensitive one: a word-level explode multiplies row
count by ~tokens-per-doc. The aggregation after it relies on partial
(map-side) aggregation so the shuffle carries (word, partial count), never
the exploded rows themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic word count over documents: split -> explode -> count, top 50
    by frequency (tie-broken by word for determinism)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split(F.trim("text"), "\\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("word"))
        .limit(50)
    )


ORACLE_WORD_COUNT = """
SELECT word, count(*) AS n
FROM (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents
)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 50
"""


def q_user_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: each user's distinct event types as one
    sorted CSV string + counts — the collect_set -> array_sort -> concat_ws
    composition (listagg semantics, deterministic by construction)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias(
            "event_types"
        ),
        F.countDistinct("event_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_USER_EVENT_PROFILE = """
SELECT user_id,
       array_to_string(list_sort(list_distinct(list(event_type))), ',') AS event_types,
       count(DISTINCT event_type) AS n_types,
       count(*) AS n_events
FROM events
GROUP BY user_id
"""


def q_date_spine_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filling date spine: generate every day in the events range
    (``sequence`` + explode — the generator side is tiny), left-join the
    daily purchase counts, zero-fill missing days. The spine broadcasts;
    the fact side aggregates BEFORE the join, so the join moves one row per
    day, not per event."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.to_date(F.min("ts")).alias("d0"), F.to_date(F.max("ts")).alias("d1")
    )
    spine = bounds.select(
        F.explode(
            F.sequence("d0", "d1", F.expr("interval 1 day"))
        ).alias("day")
    )
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 6).alias("purchase_value"),
        )
    )
    return (
        spine.join(daily, "day", "left")
        .na.fill({"n_purchases": 0, "purchase_value": 0.0})
        .select("day", "n_purchases", "purchase_value")
    )


ORACLE_DATE_SPINE_DAILY = """
WITH bounds AS (
  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
),
spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
daily AS (
  SELECT CAST(ts AS DATE) AS day,
         count(*) AS n_purchases,
         ROUND(sum(value), 6) AS purchase_value
  FROM events WHERE event_type = 'purchase'
  GROUP BY CAST(ts AS DATE)
)
SELECT s.day,
       coalesce(d.n_purchases, 0) AS n_purchases,
       coalesce(d.purchase_value, 0.0) AS purchase_value
FROM spine s LEFT JOIN daily d ON s.day = d.day
"""
