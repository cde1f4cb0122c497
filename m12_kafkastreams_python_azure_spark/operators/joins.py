"""Temporal and range joins — operator classes the reference surface lacks
(SURVEY.md §2 "categories with no instances") but any large-scale analytics
engine needs. All pure DataFrame ops; no UDFs, no driver-side loops.

Scale notes (the part that matters at 100 TB):

- **As-of join** (`asof_join`): Spark has no built-in. The naive encoding —
  inequality join ``l.t >= r.t`` then argmax per left row — explodes to
  O(|L| * avg right rows per key) intermediate rows before the aggregate
  prunes them. We instead use the union-spine pattern: tag both sides, union
  on a common ``(key, time)`` spine, and carry the latest right-side row
  forward with ``last(ignorenulls) over (partition by key order by time)``.
  One shuffle on the key, zero row explosion, linear work — the same trick
  log-structured engines use for point-in-time joins.
- **Band join** (`q_value_band_join`): non-equi join against a tiny ranges
  dimension. Broadcast the dimension explicitly → BroadcastNestedLoopJoin
  over 3 rows, which is effectively a map-side CASE; never a shuffle.
- **Interval self-join** (`q_event_pairs_10min`): "pairs of events from the
  same user within T" is a range join. The scalable encoding buckets time
  into T-sized buckets and joins on ``(key, bucket)`` with the left side
  exploded to ``{bucket, bucket+1}`` candidates, then applies the exact
  range filter — candidate volume is O(events per key per 2T window)
  instead of O(events per key)^2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` for the same key (inclusive, like DuckDB
    ``ASOF JOIN ... ON l.ts >= r.ts``). Inner semantics: left rows with no
    prior right row are dropped.

    ``direction="forward"`` flips the match to the SMALLEST
    ``right_ts >= left_ts`` (DuckDB ``ASOF JOIN ... ON l.ts <= r.ts``) —
    same union-spine, same single Window, just ordered descending.

    Right-side values are carried as ONE struct so that NULLs inside a
    matched row are preserved (``last(ignorenulls)`` on individual columns
    would skip over them to an older row).

    Ties on the timestamp are resolved toward the greatest
    ``right_value_cols[0]`` — pre-deduplicate the right side if several
    rows can share (key, ts).
    """
    lcols = left.columns
    l = left.select(
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{dict(right.dtypes)[c]}" for c in right_value_cols
            ) + ">"
        ).alias("__r"),
    )
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{dict(left.dtypes)[c]}" for c in lcols) + ">"
        ).alias("__l"),
        F.struct(*right_value_cols).alias("__r"),
    )
    # Right rows sort before left rows at equal timestamps (__side 0 < 1), so
    # an exactly-simultaneous right row is visible to the left row: inclusive.
    # Forward mode walks time descending, so "preceding" in window order is
    # "following" in time — the carried value is the nearest LATER right row.
    if direction == "backward":
        order = [F.col("__t").asc(), F.col("__side").asc()]
    elif direction == "forward":
        order = [F.col("__t").desc(), F.col("__side").asc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
        .filter(F.col("__match").isNotNull())
    )
    return carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(c) for c in right_value_cols],
    )


def q_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment: each event gets the most recent order
    (by o_orderdate <= event ts) of the matching customer. Orders are
    pre-deduplicated to one per (custkey, orderdate) — max orderkey — so
    the as-of match is deterministic on both engines."""
    events = load_table(spark, sf_dir, "events")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts"),
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_value_cols=["o_orderkey", "o_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_orderdate").alias("asof_orderdate"),
    )


ORACLE_ASOF_LATEST_ORDER = """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       o1.o_orderkey AS asof_orderkey,
       o1.o_orderdate AS asof_orderdate
FROM events e ASOF JOIN o1
  ON e.user_id = o1.o_custkey AND e.ts >= o1.o_orderdate
"""


def q_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of: each event gets the NEXT order (smallest
    o_orderdate >= event ts) of the matching customer — the
    "what happened after" temporal join (attribution / outcome labeling).
    Same join-free union-spine plan as the backward variant."""
    events = load_table(spark, sf_dir, "events")
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        events.select("event_id", "user_id", "ts"),
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_ts="ts",
        right_ts="o_orderdate",
        right_value_cols=["o_orderkey", "o_orderdate"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_orderdate").alias("next_orderdate"),
    )


ORACLE_ASOF_NEXT_ORDER = """
WITH o1 AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id,
       o1.o_orderkey AS next_orderkey,
       o1.o_orderdate AS next_orderdate
FROM events e ASOF JOIN o1
  ON e.user_id = o1.o_custkey AND e.ts <= o1.o_orderdate
"""


#: Tiny value-band dimension — broadcast side of the band join.
VALUE_BANDS = [("low", 0.0, 50.0), ("mid", 50.0, 200.0), ("high", 200.0, 10**9 * 1.0)]


def q_value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (range) join: classify every event's ``value`` into a named band
    via a non-equi join against a 3-row broadcast dimension, then aggregate
    per (event_type, band). The broadcast makes the physical plan a
    BroadcastNestedLoopJoin — a map-side lookup, no shuffle for the join."""
    events = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(VALUE_BANDS, "band string, lo double, hi double")
    joined = events.join(
        F.broadcast(bands),
        (events.value >= bands.lo) & (events.value < bands.hi),
        "inner",
    )
    return (
        joined.groupBy("event_type", "band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("value_sum"),
        )
    )


ORACLE_VALUE_BAND_JOIN = """
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 50.0), ('mid', 50.0, 200.0), ('high', 200.0, 1000000000.0)
)
SELECT e.event_type, b.band,
       count(*) AS n_events,
       sum(e.value) AS value_sum
FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY e.event_type, b.band
"""


def q_event_pairs_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval self-join: unordered pairs of events by the same user within
    10 minutes, each pair emitted once (ordered by time, then event_id).

    Bucketed encoding: join on (user, 10-min bucket) with the earlier event
    exploded to {bucket, bucket+1}, then the exact microsecond-range filter.
    Candidate volume is bounded by events-per-user-per-20min — survives any
    table size as long as per-key-per-window density is bounded, which is
    the same assumption any streaming interval join makes.
    """
    bucket_us = 600 * 1_000_000  # 10 minutes in microseconds
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        # events.ts is TIMESTAMP_NTZ in the driver's parquet; session TZ is
        # pinned UTC, so the NTZ->LTZ cast is exact and matches epoch_us().
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    a = ev.select(
        F.col("event_id").alias("id1"),
        F.col("user_id").alias("u"),
        F.col("us").alias("us1"),
        F.explode(
            F.array(
                (F.col("us") / bucket_us).cast("long"),
                (F.col("us") / bucket_us).cast("long") + 1,
            )
        ).alias("bkt"),
    )
    b = ev.select(
        F.col("event_id").alias("id2"),
        F.col("user_id").alias("u2"),
        F.col("us").alias("us2"),
        (F.col("us") / bucket_us).cast("long").alias("bkt2"),
    )
    pairs = a.join(b, (a.u == b.u2) & (a.bkt == b.bkt2), "inner").filter(
        (F.col("us2") >= F.col("us1"))
        & (F.col("us2") - F.col("us1") <= bucket_us)
        & ((F.col("us2") > F.col("us1")) | (F.col("id2") > F.col("id1")))
    )
    return pairs.select(
        "id1",
        "id2",
        F.col("u").alias("user_id"),
        (F.col("us2") - F.col("us1")).alias("gap_us"),
    )


ORACLE_EVENT_PAIRS_10MIN = """
SELECT a.event_id AS id1, b.event_id AS id2, a.user_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= 600000000
 AND (b.ts > a.ts OR b.event_id > a.event_id)
"""
