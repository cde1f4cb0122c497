"""Slowly-changing-dimension (SCD type 2) history build.

The lakehouse dimension-maintenance pattern: given every observed version
of a dimension row (key, attributes, effective date), produce the
versioned history — each version carries ``valid_from`` / ``valid_to``
(next version's start, open-ended NULL for the current one) and an
``is_current`` flag. MERGE-style application of a daily delta is the
incremental special case (``sources/maintenance.merge_upsert`` covers the
overwrite flavor); this operator builds the full interval table, which is
also the backfill path.

Scale shape: ONE window over (key) ordered by effective date — shuffle
keyed on the dimension key (uniform), no joins, no global sort. At 100 TB
dimension scale this is a single pass; the fact-side as-of join against
the produced intervals is `joins.q_asof_latest_order`'s union-spine
pattern.

The synthetic corpus has no change stream, so the query derives a
deterministic one: every customer yields 1-3 versions (keyed off
custkey % 3) with the market segment rotated per version and effective
dates spaced 30 days — enough churn that interval construction, closing,
and the is_current flag are all exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]


def scd2_history(
    versions: DataFrame,
    key_col: str = "c_custkey",
    effective_col: str = "effective_date",
) -> DataFrame:
    """Interval table from a version stream: valid_from = own effective
    date, valid_to = next version's (NULL if none), is_current flag."""
    w = Window.partitionBy(key_col).orderBy(effective_col)
    nxt = F.lead(effective_col).over(w)
    return versions.withColumn("valid_to", nxt).withColumn(
        "is_current", F.col("valid_to").isNull()
    ).withColumnRenamed(effective_col, "valid_from")


def _versions(
    cust: DataFrame, anchor: str = "2024-01-01", spacing_days: int = 30
) -> DataFrame:
    """Deterministic synthetic change stream: custkey % 3 + 1 versions per
    customer; version v (0-based) shifts the segment v steps through the
    segment ring and takes effect spacing_days*v days after anchor."""
    n_versions = (F.col("c_custkey") % 3 + 1).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_versions - 1)).alias("v")
    seg_ring = F.array(*[F.lit(s) for s in SEGMENTS])
    base_pos = F.array_position(seg_ring, F.col("c_mktsegment"))  # 1-based
    return (
        cust.select("c_custkey", "c_mktsegment", idx)
        .select(
            "c_custkey",
            F.element_at(
                seg_ring,
                ((base_pos - 1 + F.col("v")) % len(SEGMENTS) + 1).cast("int"),
            ).alias("segment"),
            F.date_add(
                F.lit(anchor).cast("date"), F.col("v") * spacing_days
            ).alias("effective_date"),
        )
    )


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return scd2_history(_versions(cust))


_SEG_LIST = "[" + ", ".join(f"'{s}'" for s in SEGMENTS) + "]"

ORACLE_SCD2_HISTORY = f"""
WITH versions AS (
  SELECT c_custkey,
         segs[CAST((list_position(segs, c_mktsegment) - 1 + v)
              % {len(SEGMENTS)} + 1 AS INT)] AS segment,
         DATE '2024-01-01' + CAST(v * 30 AS INT) AS effective_date
  FROM (
    SELECT c_custkey, c_mktsegment,
           unnest(range(0, CAST(c_custkey % 3 + 1 AS INT))) AS v,
           {_SEG_LIST} AS segs
    FROM customer
  )
)
SELECT c_custkey, segment,
       effective_date AS valid_from,
       lead(effective_date) OVER (PARTITION BY c_custkey
                                  ORDER BY effective_date) AS valid_to,
       lead(effective_date) OVER (PARTITION BY c_custkey
                                  ORDER BY effective_date) IS NULL
         AS is_current
FROM versions
"""


# ------------------------------------------- point-in-time lookup (PIT)

# Version stream anchored INSIDE the order date range (1995-2001) so the
# as-of resolution actually varies per order: v=0 predates every order,
# later versions land mid-range at 720-day spacing.
PIT_ANCHOR = "1994-01-01"
PIT_SPACING_DAYS = 720


def scd2_pit_lookup(
    orders: DataFrame,
    versions: DataFrame,
    key_col: str = "c_custkey",
    effective_col: str = "effective_date",
    attr_col: str = "segment",
) -> DataFrame:
    """Resolve, for every order, the dimension attribute that was valid
    AT the order's timestamp — the query side of SCD2 (the history build
    above is the maintenance side).

    The classic spelling is a range join on
    ``valid_from <= ts < valid_to``, which Spark executes as a
    BroadcastNestedLoopJoin (fine for small dims, quadratic pain past
    that). This is the union-spine spelling instead (the
    ``joins.asof_latest_order`` discipline): versions and orders union
    on (key, ts), one window per key carries the latest version
    attribute forward, order rows read it — NO join operator in the
    plan, one shuffle on the dimension key, linear at any fact:dim
    ratio. Version rows sort BEFORE same-timestamp order rows (kind 0
    < 1), so a version is effective ON its start date — matching the
    oracle's inclusive ``>= valid_from``.

    Orders that predate the key's FIRST version are DROPPED (not
    emitted with a NULL attribute), matching the range-join spelling's
    inner-join semantics — an order before any version has no valid
    dimension row, and the two spellings must agree on late-starting
    version streams too (ADVICE r10)."""
    v = versions.select(
        F.col(key_col).alias("k"),
        F.col(effective_col).cast("timestamp").alias("ts"),
        F.lit(0).alias("kind"),
        F.col(attr_col).alias("attr"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    o = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.lit(1).alias("kind"),
        F.lit(None).cast("string").alias("attr"),
        "o_orderkey",
        "o_totalprice",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = v.unionByName(o).withColumn(
        "attr_at", F.last("attr", ignorenulls=True).over(w)
    )
    return filled.filter(
        (F.col("kind") == 1) & F.col("attr_at").isNotNull()
    ).select(
        "o_orderkey",
        F.col("k").alias(key_col),
        "ts",
        F.col("attr_at").alias(attr_col),
        "o_totalprice",
    )


def q_scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders resolved against the segment valid at order time, rolled
    up per (segment, order year) — the aggregate keeps the driver row
    compact while any single mis-resolved order shifts a bucket."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    versions = _versions(
        cust, anchor=PIT_ANCHOR, spacing_days=PIT_SPACING_DAYS
    )
    pit = scd2_pit_lookup(orders, versions)
    return pit.groupBy(
        F.col("segment").alias("seg_at"),
        F.year("ts").alias("o_year"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


ORACLE_SCD2_PIT_LOOKUP = f"""
WITH versions AS (
  SELECT c_custkey,
         segs[CAST((list_position(segs, c_mktsegment) - 1 + v)
              % {len(SEGMENTS)} + 1 AS INT)] AS segment,
         DATE '{PIT_ANCHOR}' + CAST(v * {PIT_SPACING_DAYS} AS INT)
           AS effective_date
  FROM (
    SELECT c_custkey, c_mktsegment,
           unnest(range(0, CAST(c_custkey % 3 + 1 AS INT))) AS v,
           {_SEG_LIST} AS segs
    FROM customer
  )
),
hist AS (
  SELECT c_custkey, segment,
         effective_date AS valid_from,
         lead(effective_date) OVER (PARTITION BY c_custkey
                                    ORDER BY effective_date) AS valid_to
  FROM versions
),
pit AS (
  SELECT h.segment AS seg_at, year(o_orderdate) AS o_year, o_totalprice
  FROM orders o
  JOIN hist h
    ON o.o_custkey = h.c_custkey
   AND o.o_orderdate >= CAST(valid_from AS TIMESTAMP)
   AND (valid_to IS NULL OR o.o_orderdate < CAST(valid_to AS TIMESTAMP))
)
SELECT seg_at, o_year,
       count(*) AS n_orders,
       ROUND(sum(o_totalprice), 2) AS total_price
FROM pit
GROUP BY 1, 2
"""
