"""Data-quality gate: the validation pass a training-data pipeline runs
before (and after) every transformation stage.

One aggregation pass computes the whole profile — null fractions, key
uniqueness, domain/range violations — instead of one job per rule (at
100 TB, N separate `count()` rules cost N scans; a single agg costs one).
Referential integrity is the only rule that needs a second input, and its
check is an anti-join that broadcasts the smaller key set.

``q_quality_report`` profiles the ``orders`` table and is DuckDB-oracle
checked value-for-value.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """One-pass profile: per column, null count + approx-free distinct
    count is intentionally NOT included (exact distinct per column would
    multiply the shuffle); instead callers get null/total and add targeted
    uniqueness checks via :func:`duplicate_keys` where the contract
    demands it. Output: one row per column (col, n_rows, n_null,
    null_frac)."""
    n = F.count(F.lit(1))
    aggs = [n.alias("n_rows")]
    for c in columns:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
    row = df.agg(*aggs)
    stacked = row.selectExpr(
        "n_rows",
        "stack({}, {}) as (col, n_null)".format(
            len(columns),
            ", ".join(f"'{c}', __null_{c}" for c in columns),
        ),
    )
    return stacked.select(
        "col",
        "n_rows",
        "n_null",
        F.round(F.col("n_null") / F.col("n_rows"), 6).alias("null_frac"),
    )


def duplicate_keys(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Keys that violate a uniqueness contract (appear more than once)."""
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def orphan_keys(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential-integrity violations: child keys with no parent row.
    The parent key set is distinct-projected and broadcast when small;
    with no hint AQE falls back to a shuffled anti-join at scale."""
    parents = parent.select(F.col(parent_key).alias(child_key)).distinct()
    return (
        child.select(child_key)
        .join(parents, child_key, "left_anti")
        .groupBy(child_key)
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )


def range_violations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Domain/range rule violations counted in ONE pass: ``rules`` maps a
    rule name to a boolean Column that is True when the row VIOLATES the
    rule. Output: (rule, n_violations)."""
    aggs = [
        F.sum(cond.cast("long")).alias(name) for name, cond in rules.items()
    ]
    row = df.agg(*aggs)
    return row.selectExpr(
        "stack({}, {}) as (rule, n_violations)".format(
            len(rules), ", ".join(f"'{n}', {n}" for n in rules)
        )
    )


def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality gate over orders: column null profile + domain rules, one
    aggregation pass each, unioned into a single (check, metric, value)
    report."""
    o = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    nulls = profile(o, cols).select(
        F.lit("null_frac").alias("check"),
        F.col("col").alias("metric"),
        F.col("null_frac").cast("double").alias("value"),
    )
    rules = range_violations(
        o,
        {
            "nonpositive_price": F.col("o_totalprice") <= 0,
            "bad_status": ~F.col("o_orderstatus").isin("F", "O", "P"),
            "date_out_of_range": (F.col("o_orderdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("o_orderdate") > F.lit("2000-01-01").cast("timestamp")),
        },
    ).select(
        F.lit("violations").alias("check"),
        F.col("rule").alias("metric"),
        F.col("n_violations").cast("double").alias("value"),
    )
    dups = duplicate_keys(o, ["o_orderkey"]).agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        F.lit("uniqueness").alias("check"),
        F.lit("o_orderkey_dups").alias("metric"),
        F.col("n").cast("double").alias("value"),
    )
    return nulls.unionByName(rules).unionByName(dups)


ORACLE_QUALITY_REPORT = """
WITH nulls AS (
  SELECT 'null_frac' AS "check", col AS metric, CAST(val AS DOUBLE) AS value
  FROM (
    SELECT
      ROUND(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS o_orderkey,
      ROUND(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS o_custkey,
      ROUND(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS o_orderstatus,
      ROUND(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS o_totalprice,
      ROUND(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS o_orderdate
    FROM orders
  ) UNPIVOT (val FOR col IN (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate))
), viols AS (
  SELECT 'violations' AS "check", rule AS metric, CAST(val AS DOUBLE) AS value
  FROM (
    SELECT
      sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS nonpositive_price,
      sum(CASE WHEN o_orderstatus NOT IN ('F', 'O', 'P') THEN 1 ELSE 0 END) AS bad_status,
      sum(CASE WHEN o_orderdate < TIMESTAMP '1990-01-01'
                 OR o_orderdate > TIMESTAMP '2000-01-01' THEN 1 ELSE 0 END) AS date_out_of_range
    FROM orders
  ) UNPIVOT (val FOR rule IN (nonpositive_price, bad_status, date_out_of_range))
), dups AS (
  SELECT 'uniqueness' AS "check", 'o_orderkey_dups' AS metric,
         CAST(count(*) AS DOUBLE) AS value
  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
)
SELECT * FROM nulls UNION ALL SELECT * FROM viols UNION ALL SELECT * FROM dups
"""
