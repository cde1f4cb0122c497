"""Product-quantization (PQ) approximate nearest neighbor — the
compressed-domain ANN layout (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011; the Faiss ``PQ`` index family).

Why it matters at 100 TB: the raw ``embedding`` column is ``dim * 4``
bytes/row; the PQ code is ``m`` bytes/row (16x smaller at dim=64, m=16).
The ANN scan then reads ONLY the code column — a column-pruned parquet
scan of bytes, not vectors — and scores each candidate with ``m`` table
lookups instead of a ``dim``-wide dot product. Composes with the IVF
coarse quantizer in ``ivf.py`` (probe lists first, ADC-score inside the
probed lists) exactly like Faiss ``IVFPQ``.

Spark-first shape, mirroring ``ivf.py``:

- **Train** (all ``m`` codebooks in ONE k-means loop): vectors are
  L2-normalized (so L2 distance is cosine-monotone: ||q-x||^2 = 2-2cos),
  sliced into ``m`` subvectors, and exploded to (vec_id, sub_id, subvec)
  rows; assignment is a per-row argmin against the sub_id's codebook
  (one narrow pass for ALL subspaces), the Lloyd update one small
  groupBy(sub_id, cid, pos) shuffle. Seeds = the ``ksub`` lowest-id
  vectors' slices — deterministic, no RNG.
- **Encode**: one narrow pass -> ``array<int>`` of ``m`` codes.
- **Query (ADC)**: each query precomputes its m x ksub lookup table of
  partial squared distances ONCE; candidates are scored by summing ``m``
  table lookups selected by their code bytes. Queries (tiny) broadcast;
  the corpus-side scan never shuffles. Exact re-rank of the top
  ``rerank`` ADC candidates restores near-exact top-k (the standard
  PQ + re-rank pipeline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.functions.vectors import (
    dot_product_unrolled,
    l2_norm,
)
from m12_kafkastreams_python_azure_spark.operators.similarity import _probe_dim
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

PQ_M = 16      # subspaces
PQ_KSUB = 16   # centroids per subspace (4-bit codes)


def _normalize(vec: Column) -> Column:
    """L2-normalize to double precision (guarded against zero vectors)."""
    n = l2_norm(vec)
    return F.transform(vec, lambda x: x.cast("double") / F.when(n > 0, n).otherwise(F.lit(1.0)))


def _sub_slices(vec: Column, m: int, dsub: int) -> Column:
    """array<array<double>> of the m subvectors of a (normalized) vector."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda j: F.slice(vec, j * dsub + 1, dsub),
    )


def _l2sq(a: Column, b: Column) -> Column:
    d = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def _codebook_lit(codebooks: list[list[list[float]]]) -> Column:
    """All m codebooks as ONE literal array<array<array<double>>> —
    m x ksub x dsub constants ship as data in a single literal node, not
    as m*ksub*dsub expression-tree leaves (the giant-literal-tree driver
    cost documented in the verify skill)."""
    return F.lit(codebooks)


def _assign_codes(df: DataFrame, codebooks: list[list[list[float]]],
                  vec_col: str, m: int, dsub: int) -> DataFrame:
    """Add ``codes``: array<int> of per-subspace argmin-L2 centroid ids.
    Narrow — no shuffle; all m assignments in one pass."""
    cb = _codebook_lit(codebooks)
    ksub = len(codebooks[0])
    subs = _sub_slices(_normalize(F.col(vec_col)), m, dsub)
    # per subspace j: argmin over cb[j] -> struct(dist, cid) array_min
    codes = F.zip_with(
        subs,
        cb,
        lambda sv, book: F.array_min(
            F.zip_with(
                book,
                F.sequence(F.lit(0), F.lit(ksub - 1)),
                lambda cvec, cid: F.struct(
                    _l2sq(sv, cvec).alias("dist"), cid.alias("cid")
                ),
            )
        )["cid"],
    )
    return df.withColumn("codes", codes)


def train_pq(
    df: DataFrame,
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Train all m sub-codebooks jointly: one exploded (vec_id, sub_id,
    subvec) frame, ``iters`` Lloyd rounds of [narrow argmin assignment ->
    one groupBy(sub_id, cid, pos) shuffle of k*dim partial means]. Only
    m*ksub*dsub aggregated doubles ever reach the driver. Deterministic:
    seeds are the ksub lowest-id vectors' slices; empty clusters keep
    their previous centroid."""
    if dim is None:
        dim = _probe_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    dsub = dim // m
    seed_rows = df.orderBy(id_col).limit(ksub).select(vec_col).collect()
    if len(seed_rows) < ksub:
        raise ValueError(f"need >= ksub={ksub} vectors, have {len(seed_rows)}")
    seed_vecs = []
    for r in seed_rows:
        v = [float(x) for x in r[0]]
        n = sum(x * x for x in v) ** 0.5 or 1.0
        seed_vecs.append([x / n for x in v])
    codebooks = [
        [seed_vecs[c][j * dsub:(j + 1) * dsub] for c in range(ksub)]
        for j in range(m)
    ]
    subs = df.select(
        F.posexplode(
            _sub_slices(_normalize(F.col(vec_col)), m, dsub)
        ).alias("sub_id", "subvec")
    )
    for _ in range(iters):
        cb = _codebook_lit(codebooks)
        ksub_seq = F.sequence(F.lit(0), F.lit(ksub - 1))
        book = F.element_at(cb, F.col("sub_id") + 1)
        assigned = subs.withColumn(
            "cid",
            F.array_min(
                F.zip_with(
                    book,
                    ksub_seq,
                    lambda cvec, cid: F.struct(
                        _l2sq(F.col("subvec"), cvec).alias("dist"),
                        cid.alias("cid"),
                    ),
                )
            )["cid"],
        )
        rows = (
            assigned.select("sub_id", "cid", F.posexplode("subvec").alias("pos", "x"))
            .groupBy("sub_id", "cid", "pos")
            .agg(F.avg("x").alias("mval"))
            .groupBy("sub_id", "cid")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("pm"))
            .select("sub_id", "cid", F.transform("pm", lambda s: s["mval"]).alias("cvec"))
            .collect()
        )
        for r in rows:
            codebooks[r["sub_id"]][r["cid"]] = [float(x) for x in r["cvec"]]
    return codebooks


def encode_pq(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes): the 16x-compressed index representation. At scale this
    is what you persist (and all the ADC scan ever reads)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    return _assign_codes(df, codebooks, vec_col, m, dsub).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )


def ann_pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    raw: DataFrame,
    k: int = 5,
    rerank: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """ADC scan + exact re-rank.

    Stage 1 (compressed domain): each query's m x ksub ADC table is
    computed once on the (tiny, broadcast) query side; every candidate is
    scored by m table lookups on its code bytes — the corpus side reads
    ONLY ``codes``. Top ``rerank`` per query survive.
    Stage 2 (exact): the <= queries*rerank survivors join back to the raw
    vectors (broadcast of the survivor ids) for an exact-cosine top-k —
    the output ranks are exact similarities over the PQ candidate set."""
    if dim is None:
        dim = _probe_dim(raw, vec_col)
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    cb = _codebook_lit(codebooks)
    qsubs = _sub_slices(_normalize(F.col(vec_col)), m, dsub)
    # ADC table: adc[j][c] = ||q_sub_j - codebook[j][c]||^2
    adc = F.zip_with(
        qsubs, cb,
        lambda sv, book: F.transform(book, lambda cvec: _l2sq(sv, cvec)),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), adc.alias("adc")
    )
    approx = (
        encoded.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "adist",
            F.aggregate(
                F.zip_with(
                    F.col("codes"), F.col("adc"),
                    lambda code, row: F.element_at(row, code + 1),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("neighbor_id"))
    cand = (
        approx.withColumn("arank", F.row_number().over(w))
        .filter(F.col("arank") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # exact re-rank over the bounded candidate set
    nb = raw.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        l2_norm(F.col(vec_col)).alias("cnorm"),
    )
    qv = raw.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        l2_norm(F.col(vec_col)).alias("qnorm"),
    )
    scored = (
        cand.join(nb, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn(
            "sim",
            dot_product_unrolled(F.col("qvec"), F.col("cvec"), dim)
            / (F.col("qnorm") * F.col("cnorm")),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN top-5 for the first 8 vectors (rows-only driver check —
    approximate by design; recall vs the exact baseline is asserted in
    tests/test_pq.py, and the exact twin ``ann_topk`` is oracle-green)."""
    emb = load_table(spark, sf_dir, "embeddings")
    codebooks = train_pq(emb)
    encoded = encode_pq(emb, codebooks)
    return ann_pq_topk(
        encoded, emb.filter(F.col("vec_id") < 8), codebooks, emb, k=5, rerank=64
    )
