"""IVF (inverted-file) approximate nearest neighbor over the embeddings
table — the disk-/cluster-scale ANN layout: a small coarse quantizer
(k-means centroids) partitions the corpus into inverted lists; a query
probes only its ``nprobe`` closest lists.

Spark-first shape:

- **Train**: k-means on the corpus with DataFrame ops only — assignment is
  a broadcast argmax against the centroid literal array; the update step is
  ``posexplode -> groupBy(centroid, dim) avg -> rebuild array``. Each
  iteration is one narrow pass + one small shuffle of (k*dim) partial sums.
- **Index**: every vector tagged with its nearest centroid id — at scale
  you would ``write.partitionBy("centroid_id")`` so a probe prunes files.
- **Query**: broadcast the (tiny) query set with their nprobe probe lists,
  join on centroid id — each query scans ~nprobe/k of the corpus instead of
  all of it.

Centroid seeds are the k lowest vec_ids (deterministic, no RNG in the
plan); 2 Lloyd iterations by default — enough to spread the lists, and the
whole train cost is bounded and reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.functions.vectors import dot_product, l2_norm
from m12_kafkastreams_python_azure_spark.operators.similarity import EMBED_DIM
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def _centroid_array(centroids: list[tuple[int, list[float]]]) -> F.Column:
    """Centroids as one literal array<struct<cid,vec,norm>> for broadcast-free
    argmax assignment (the literal ships inside the task binary)."""
    entries = []
    for cid, vec in centroids:
        norm = sum(x * x for x in vec) ** 0.5
        entries.append(
            F.struct(
                F.lit(cid).alias("cid"),
                F.array(*[F.lit(float(x)) for x in vec]).alias("cvec"),
                F.lit(float(norm)).alias("cnorm"),
            )
        )
    return F.array(*entries)


def _assign(df: DataFrame, centroids: list[tuple[int, list[float]]], vec_col: str) -> DataFrame:
    """Nearest-centroid assignment (cosine): pure Catalyst argmax — build
    (sim, cid) structs per centroid, take array_max. No shuffle."""
    carr = _centroid_array(centroids)
    vec = F.col(vec_col)
    # Ranking-only score: ||v|| is a positive per-row constant across
    # centroids, so dividing by it cannot change the argmax — and keeping
    # l2_norm(vec) OUT of the lambda matters: Catalyst re-evaluates
    # lambda-captured trees per element, so the embedded norm fold would
    # run once per centroid (see dedup.star_pairs).
    scored = F.transform(
        carr,
        lambda c: F.struct(
            (dot_product(vec, c["cvec"]) / c["cnorm"]).alias("sim"),
            c["cid"].alias("cid"),
        ),
    )
    best = F.array_max(scored)
    return df.withColumn("centroid_id", best["cid"])


def _update(assigned: DataFrame, vec_col: str, dim: int) -> list[tuple[int, list[float]]]:
    """Lloyd update: new centroid = mean of its members, computed
    distributedly (posexplode -> avg per (centroid, dim)); only k*dim
    aggregated doubles reach the driver."""
    rows = (
        assigned.select("centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("centroid_id", "pos")
        .agg(F.avg(F.col("x").cast("double")).alias("m"))
        .groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("centroid_id", F.transform("pm", lambda s: s["m"]).alias("cvec"))
        .collect()
    )
    return sorted((r.centroid_id, list(r.cvec)) for r in rows)


def train_ivf(
    df: DataFrame,
    k: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = EMBED_DIM,
    sample_fraction: float = 1.0,
) -> list[tuple[int, list[float]]]:
    """k-means coarse quantizer: seeds = k lowest-id vectors, ``iters``
    Lloyd rounds. Deterministic end to end.

    ``sample_fraction`` < 1 trains on a deterministic key-hash sample —
    the standard IVF practice at corpus scale (centroid quality needs a
    representative sample, not every vector; the full corpus is only
    assigned once, by ``build_ivf_index``). The sample predicate is a
    plain filter, so it pushes into the scan."""
    if not 0.0 < sample_fraction <= 1.0:
        raise ValueError(f"sample_fraction must be in (0, 1], got {sample_fraction}")
    if sample_fraction < 1.0:
        buckets = 1_000_000
        threshold = int(buckets * sample_fraction)
        if threshold == 0:
            raise ValueError(
                f"sample_fraction={sample_fraction} rounds to an empty sample"
            )
        df = df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(buckets)) < threshold)
    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(vec_col)
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(
            f"need >= k={k} vectors to seed the quantizer, sample has {len(seeds)} "
            "(raise sample_fraction or lower k)"
        )
    centroids = [(i, [float(x) for x in r[0]]) for i, r in enumerate(seeds)]
    for _ in range(iters):
        centroids = _update(_assign(df, centroids, vec_col), vec_col, dim)
    return centroids


def build_ivf_index(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Tag every vector with its inverted-list id. At scale, persist with
    ``.write.partitionBy("centroid_id")`` so probes prune at the file level."""
    return _assign(df, centroids, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col)).alias("cnorm"),
        "centroid_id",
    )


def ann_ivf_topk(
    index: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``nprobe`` closest inverted lists per query, exact-score
    within them, keep top-k. One equi-join on centroid_id (queries
    broadcast), one small top-k window."""
    carr = _centroid_array(centroids)
    vec = F.col(vec_col)
    # ||v|| dropped from the probe ranking for the same two reasons as in
    # _assign: it is constant across centroids (order-preserving) and a
    # lambda-captured l2_norm would re-run per centroid.
    scored_centroids = F.transform(
        carr,
        lambda c: F.struct(
            (dot_product(vec, c["cvec"]) / c["cnorm"]).alias("sim"),
            c["cid"].alias("cid"),
        ),
    )
    probes = F.slice(F.array_sort(scored_centroids, lambda a, b: F.when(
        a["sim"] > b["sim"], -1).when(a["sim"] < b["sim"], 1).otherwise(0)
    ), 1, nprobe)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnorm"),
        F.explode(F.transform(probes, lambda p: p["cid"])).alias("centroid_id"),
    )
    scored = (
        index.join(F.broadcast(q), on="centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "sim",
            dot_product(F.col("qvec"), F.col("cvec"))
            / (F.col("qnorm") * F.col("cnorm")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 for the first 8 vectors (rows-only driver check —
    approximate by design; recall vs the exact baseline is asserted in
    tests/test_ivf.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf(emb, k=16, iters=2)
    index = build_ivf_index(emb, centroids)
    return ann_ivf_topk(index, emb.filter(F.col("vec_id") < 8), centroids, k=5, nprobe=4)
