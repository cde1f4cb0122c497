"""Contrastive-training data mining and embedding-space diagnostics.

Two operators a large-scale training-data pipeline runs between dedup
and training:

- ``hard_negative_mining`` — for every anchor vector, the top-k most
  similar vectors carrying a DIFFERENT label (the hard negatives that
  make contrastive/dense-retriever training work — Karpukhin et al.
  2020 DPR; Xiong et al. 2021 ANCE mine exactly this from an ANN index
  over the corpus). Exact spelling is the oracle-checkable ground
  truth; ``method="ivf"`` swaps the candidate stage for the persisted
  IVF index through ``api.ann_topk`` with oversampling (label filtering
  happens AFTER candidate generation, so the probe must over-fetch —
  the classic mining-loop shape).

- ``anisotropy_audit`` — mean pairwise cosine over the whole embedding
  corpus in O(n·dim), via the identity
  ``sum_{i != j} v̂_i·v̂_j = ||sum v̂||^2 - n`` for unit-normalized
  vectors: an embedding space whose mean pairwise cosine drifts toward
  1 has collapsed into a narrow cone (Ethayarajh 2019, "How Contextual
  are Contextualized Word Representations?") and ANN recall, dedup
  thresholds, and contrastive temperature are all miscalibrated. The
  naive audit is O(n^2); the identity makes it two narrow passes, so it
  runs casually at 100 TB.

Cites reference behavior: none — the reference (src/main.py) has no
embedding surface; these extend the training-data-pipeline roadmap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import dot_product_unrolled, l2_norm
from ..sources.readers import load_table
from .similarity import _probe_dim

HARD_NEG_K = 5
HARD_NEG_OVERSAMPLE = 4  # ivf path over-fetches k*this before label filter
EMB_DIM = 64  # the embeddings fixture's width (projections.SRC_DIM)


def hard_negative_mining(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = HARD_NEG_K,
    method: str = "ivf",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int | None = None,
    **ann_kwargs,
) -> DataFrame:
    """Top-k nearest corpus vectors per anchor with ``label != anchor
    label``. Output: (anchor_id, negative_id, sim, rank). Default is
    the IVF path (the all-pairs scan stays quarantined behind an
    explicit ``method="exact"``, the engine-wide discipline).

    - ``exact``: anchors broadcast, corpus streams partition-local, one
      bounded top-k window — the oracle-checkable ground truth, O(n*|A|)
      by design (validation scale; same contract as
      ``similarity.ann_bruteforce_topk``).
    - ``ivf``: candidates come from ``api.ann_topk(method="ivf")`` with
      ``k * HARD_NEG_OVERSAMPLE`` over-fetch, then the label filter and
      a re-rank keep k — the 100 TB path (persisted index, partition-
      pruned probes). Over-fetching is how mining loops absorb the
      post-filter: a probe that returned exactly k would under-deliver
      whenever same-label vectors crowd the neighborhood.
    """
    if method == "exact":
        if dim is None:
            dim = _probe_dim(corpus, vec_col)
        parallelism = corpus.sparkSession.sparkContext.defaultParallelism
        a = anchors.select(
            F.col(id_col).alias("anchor_id"),
            F.col(vec_col).alias("avec"),
            l2_norm(F.col(vec_col)).alias("anorm"),
            F.col(label_col).alias("alabel"),
        )
        c = corpus.repartition(parallelism).select(
            F.col(id_col).alias("negative_id"),
            F.col(vec_col).alias("cvec"),
            l2_norm(F.col(vec_col)).alias("cnorm"),
            F.col(label_col).alias("nlabel"),
        )
        scored = (
            c.crossJoin(F.broadcast(a))
            .filter(
                (F.col("negative_id") != F.col("anchor_id"))
                & (F.col("nlabel") != F.col("alabel"))
            )
            .withColumn(
                "sim",
                dot_product_unrolled(F.col("avec"), F.col("cvec"), dim)
                / (F.col("anorm") * F.col("cnorm")),
            )
        )
    elif method == "ivf":
        from m12_kafkastreams_python_azure_spark.operators import api as _api
        from m12_kafkastreams_python_azure_spark.operators.dedup import (
            collapse_exact_groups,
        )

        # Collapse byte-identical (vector, label) contents to their min-id
        # representative BEFORE the candidate stage — the engine-wide
        # duplicate law (docs/SCALE.md round 6), which the mining path
        # violated until the round-13 100x probe measured the failure
        # mode: on a duplicate-heavy corpus every copy of the anchor's own
        # content crowds the k*OVERSAMPLE candidate list, the label filter
        # then removes ALL of them, and the output starves (ZERO pairs at
        # 100x replication; 6% under-delivery already at 10x). Over
        # distinct contents the over-fetch behaves as sized, the index is
        # duplication-free, and the k negatives are k DISTINCT contents —
        # what a contrastive batch actually wants (duplicate negatives
        # contribute identical gradients). On a duplicate-free corpus the
        # collapse is an exact identity (reps == corpus; pinned by the
        # full-probe == exact parity test).
        _, reps = collapse_exact_groups(corpus, [vec_col, label_col], id_col)
        neigh = _api.ann_topk(
            reps,
            anchors,
            method="ivf",
            k=k * HARD_NEG_OVERSAMPLE,
            id_col=id_col,
            vec_col=vec_col,
            **ann_kwargs,
        )
        alab = anchors.select(
            F.col(id_col).alias("query_id"), F.col(label_col).alias("alabel")
        )
        nlab = reps.select(
            F.col(id_col).alias("neighbor_id"), F.col(label_col).alias("nlabel")
        )
        scored = (
            neigh.join(F.broadcast(alab), "query_id")
            .join(nlab, "neighbor_id")
            .filter(F.col("nlabel") != F.col("alabel"))
            .select(
                F.col("query_id").alias("anchor_id"),
                F.col("neighbor_id").alias("negative_id"),
                "sim",
            )
        )
    else:
        raise ValueError(f"unknown mining method: {method!r} (exact|ivf)")
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("sim").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id",
            "negative_id",
            F.round("sim", 6).alias("sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row: every 10th vector anchors (the kNN splits' contract),
    the full corpus supplies negatives."""
    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 10 == 0)
    return hard_negative_mining(emb, anchors, k=HARD_NEG_K, method="exact")


ORACLE_HARD_NEGATIVE_MINING = f"""
WITH scored AS (
  SELECT a.vec_id AS anchor_id, c.vec_id AS negative_id,
         list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
         / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
            * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])))) AS sim_raw
  FROM embeddings a, embeddings c
  WHERE a.vec_id % 10 = 0 AND c.vec_id <> a.vec_id AND c.label <> a.label
), ranked AS (
  SELECT anchor_id, negative_id, sim_raw,
         ROW_NUMBER() OVER (PARTITION BY anchor_id
                            ORDER BY sim_raw DESC, negative_id) AS rank
  FROM scored
)
SELECT anchor_id, negative_id, ROUND(sim_raw, 6) AS sim,
       CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= {HARD_NEG_K}
"""


def anisotropy_audit(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """One-row corpus diagnostic: (n_vectors, mean_pairwise_cos,
    mean_norm). Zero-norm vectors are excluded (no direction). Two
    narrow passes — a per-vector norm aggregate and a per-dimension
    normalized-sum aggregate whose dim-sized result collapses to
    ``S = ||sum v̂||^2`` — then mean pairwise cosine is ``(S - n) /
    (n (n - 1))``. Nothing quadratic anywhere; the per-dim partial sums
    are dim-bounded rows, map-side combined."""
    v = emb.select(
        F.col(vec_col).cast("array<double>").alias("ve"),
        l2_norm(vec_col).alias("nrm"),
    ).filter(F.col("nrm") > 0.0)
    stats = v.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.avg("nrm").alias("mean_norm_raw"),
    )
    # the lambda captures `nrm`, a plain projected ATTRIBUTE — re-
    # evaluation per element is an attribute read, not a re-computed
    # tree (the HOF gotcha only bites captured expression trees)
    sums = (
        v.select(
            F.posexplode(
                F.transform("ve", lambda x: x / F.col("nrm"))
            ).alias("pos", "x")
        )
        .groupBy("pos")
        .agg(F.sum("x").alias("sd"))
        .agg(F.sum(F.col("sd") * F.col("sd")).alias("S"))
    )
    return (
        stats.crossJoin(F.broadcast(sums))
        .select(
            "n_vectors",
            F.round(
                (F.col("S") - F.col("n_vectors"))
                / (
                    F.col("n_vectors").cast("double")
                    * (F.col("n_vectors") - F.lit(1)).cast("double")
                ),
                6,
            ).alias("mean_pairwise_cos"),
            F.round("mean_norm_raw", 6).alias("mean_norm"),
        )
    )


def q_anisotropy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return anisotropy_audit(load_table(spark, sf_dir, "embeddings"))


ORACLE_ANISOTROPY_AUDIT = f"""
WITH v AS (
  SELECT CAST(embedding AS DOUBLE[]) AS ve,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                               CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings
  WHERE sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[]))) > 0.0
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vectors, avg(nrm) AS mean_norm_raw
  FROM v
), e AS (
  -- EMB_DIM literal: DuckDB generate_series cannot correlate on len(ve)
  SELECT gs.i AS pos, ve[gs.i] / nrm AS x
  FROM v, generate_series(1, {EMB_DIM}) AS gs(i)
), sums AS (
  SELECT SUM(sd * sd) AS S
  FROM (SELECT pos, SUM(x) AS sd FROM e GROUP BY pos)
)
SELECT n_vectors,
       ROUND((S - n_vectors) / (CAST(n_vectors AS DOUBLE)
             * (n_vectors - 1)), 6) AS mean_pairwise_cos,
       ROUND(mean_norm_raw, 6) AS mean_norm
FROM stats CROSS JOIN sums
"""


def q_hard_negative_mining_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION spelling of hard-negative mining: IVF candidate
    stage (persisted index, 4x over-fetch) feeding the label filter +
    re-rank. Bench/scale entry — approximate by design, so rows-only:
    bounded by the oracle-checked exact twin ``hard_negative_mining``
    plus the full-probe == exact parity test (test_mining.py)."""
    from m12_kafkastreams_python_azure_spark.operators.api import ivf_index_dir
    from m12_kafkastreams_python_azure_spark.operators.ivf import default_nprobe

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 10 == 0)
    k = HARD_NEG_K
    return hard_negative_mining(
        emb,
        anchors,
        k=k,
        method="ivf",
        nprobe=default_nprobe(k * HARD_NEG_OVERSAMPLE),
        index_path=ivf_index_dir(sf_dir, "hard_negative_mining_ivf"),
    )
