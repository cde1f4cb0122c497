"""Vectorized Pandas-UDF operators — the Arrow batch path.

Most of this engine stays JVM-side on purpose; this module is the pattern
for when Python is genuinely required (numpy/scipy-style math, model
inference). Rules it demonstrates:

- ``@pandas_udf`` (Arrow-batched, zero-copy columnar transfer), never
  row-at-a-time ``F.udf`` — the ~10-100x difference the PySpark docs cite.
- The UDF does ONLY the Python-native part (numpy vector math); everything
  expressible in Catalyst stays in Catalyst around it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from m12_kafkastreams_python_azure_spark.functions.vectors import l2_norm
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def _make_normalize_udf():
    # Built lazily: the pandas_udf decorator resolves its return type against
    # the active SparkSession, so module import must not require one.
    @pandas_udf("array<double>")
    def normalize_vec(emb: pd.Series) -> pd.Series:
        """L2-normalize each embedding with numpy — one Arrow batch per
        task, ~dim*batch flops vectorized in C."""
        def _norm(v):
            a = np.asarray(v, dtype=np.float64)
            n = np.sqrt(np.dot(a, a))
            return (a / n) if n > 0 else a
        return emb.map(_norm)

    return normalize_vec


def normalize_embeddings(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("nvec", _make_normalize_udf()(F.col(vec_col)))


def q_normalize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas-UDF normalization, verified through Catalyst-side summaries of
    the normalized vector (unit norm, first element, checksum). numpy's
    pairwise summation and the oracle's left-fold agree to ~1e-15 — far
    inside the 6-decimal compare."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = normalize_embeddings(emb)
    return out.select(
        "vec_id",
        F.round(l2_norm(F.col("nvec")), 6).alias("unit_norm"),
        F.round(F.element_at("nvec", 1), 6).alias("first_val"),
        F.round(
            F.aggregate("nvec", F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("checksum"),
    )


ORACLE_NORMALIZE_EMBEDDINGS = """
WITH n AS (
  SELECT vec_id,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm,
         CAST(embedding AS DOUBLE[]) AS e
  FROM embeddings
)
SELECT vec_id,
       ROUND(CASE WHEN nrm > 0
             THEN sqrt(list_dot_product(list_transform(e, x -> x / nrm),
                                        list_transform(e, x -> x / nrm)))
             ELSE 0.0 END, 6) AS unit_norm,
       ROUND(CASE WHEN nrm > 0 THEN e[1] / nrm ELSE e[1] END, 6) AS first_val,
       ROUND(CASE WHEN nrm > 0
             THEN list_sum(list_transform(e, x -> x / nrm))
             ELSE list_sum(e) END, 6) AS checksum
FROM n
"""


def _make_geomean_udf():
    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        """Grouped-aggregate pandas UDF (Series -> scalar): geometric mean
        via mean-of-logs, numpy-vectorized per Arrow batch."""
        a = np.asarray(v, dtype=np.float64)
        a = a[a > 0]
        return float(np.exp(np.log(a).mean())) if a.size else 0.0

    return geomean


def q_geomean_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas GROUPED_AGG UDF surface: per-status geometric mean of order
    prices. (The third UDF API shape after scalar pandas_udf and
    applyInPandas — each Arrow-batched, none row-at-a-time.)"""
    # Filter non-positive prices BEFORE both aggregates so group membership
    # and n match the oracle's WHERE exactly (a group of only non-positive
    # prices is absent on both sides; TPC-H data never hits this, but the
    # contract shouldn't depend on that).
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    geomean = _make_geomean_udf()
    # Spark disallows mixing a grouped-agg pandas UDF with built-in
    # aggregates in one agg — run them as two aggregates over the same
    # shuffle key and join (3 groups; the join is trivial).
    g = o.groupBy("o_orderstatus").agg(
        F.round(geomean(F.col("o_totalprice")), 4).alias("geo_mean_price")
    )
    n = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    return g.join(n, "o_orderstatus")


ORACLE_GEOMEAN_PRICES = """
SELECT o_orderstatus,
       ROUND(exp(avg(ln(o_totalprice))), 4) AS geo_mean_price,
       count(*) AS n
FROM orders
WHERE o_totalprice > 0
GROUP BY o_orderstatus
"""
