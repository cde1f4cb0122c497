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


def _versions(cust: DataFrame) -> DataFrame:
    """Deterministic synthetic change stream: custkey % 3 + 1 versions per
    customer; version v (0-based) shifts the segment v steps through the
    segment ring and takes effect 30*v days after 2024-01-01."""
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
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("v") * 30).alias(
                "effective_date"
            ),
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
