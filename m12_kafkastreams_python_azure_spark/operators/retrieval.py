"""Lexical retrieval over the ``documents`` table: BM25 ranking.

Training-data curation uses retrieval to MINE targeted subsets out of a
web corpus (domain-focused continued-pretraining sets, seed expansion for
a classifier, eval-adjacent document audits). BM25 (Robertson et al.,
TREC-3; the Lucene-default scoring function) is the lexical baseline any
such miner starts from; the embedding twin is ``similarity.ann_topk`` and
a production system fuses both.

Scale shape (100 TB): the token explode is filtered to the QUERY TERMS
while still narrow — the (doc, term) tf aggregate only ever sees rows
matching the handful of query words, so its shuffle is proportional to
the hit set, not the corpus. Doc length rides the tf aggregation keys
(one shared split per scan, CSE'd by codegen — no separate dl join).
Corpus stats (N, avgdl) are one tiny all-up aggregate (broadcast as a
literal join); df per term is a |terms|-row aggregate. Top-k is
orderBy().limit() — a distributed TakeOrderedAndProject, never a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.functions.vectors import (
    dot_product_unrolled,
    l2_norm,
)
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ["spark", "join", "window"]
BM25_TOP = 20


def bm25_retrieval(
    docs: DataFrame,
    query_terms: list[str] | None = None,
    k1: float = BM25_K1,
    b: float = BM25_B,
    top: int = BM25_TOP,
) -> DataFrame:
    """Top-``top`` documents by BM25 score for a bag-of-words query.

    idf is the Lucene spelling ``ln(1 + (N - df + 0.5)/(df + 0.5))`` —
    always positive, so a term in >half the corpus can't flip scores
    negative. tf saturates via k1; b length-normalizes against the
    corpus mean doc length. Ties break on doc_id for determinism."""
    terms = query_terms or BM25_QUERY
    # ONE tokenization per scan: doc length and the exploded tokens both
    # derive from the same `words` projection, so whole-stage codegen's
    # common-subexpression elimination evaluates split() once per document
    # (previously the tf path and the dl path each re-split every doc).
    # Carrying dl through the tf groupBy keys (functionally dependent on
    # doc_id) also deletes the tf⋈dl shuffle join the old plan paid.
    toked = docs.select(
        "doc_id", F.split(F.trim("text"), r"\s+").alias("words")
    )
    toks = toked.select(
        "doc_id",
        F.size("words").cast("double").alias("dl"),
        F.explode("words").alias("word"),
    )
    # filter BEFORE the aggregate: the tf shuffle carries only query-term
    # hits (isin over a literal handful — scan-side, codegen'd)
    tf = (
        toks.filter(F.col("word").isin(terms))
        .groupBy("doc_id", "dl", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # corpus stats need ALL docs (the hit-filtered tf stream can't supply
    # avgdl) — a second scan, but a split-once one; at 100 TB this pair
    # (N, avgdl) is a corpus constant you'd memoize alongside the data.
    stats = toked.select(F.size("words").cast("double").alias("dl")).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    df_ = tf.groupBy("word").agg(F.countDistinct("doc_id").cast("double").alias("df"))
    idf = df_.crossJoin(F.broadcast(stats)).select(
        "word",
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
        "avgdl",
    )
    scored = (
        tf.join(F.broadcast(idf), "word")
        .withColumn(
            "contrib",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(
            F.round(F.sum("contrib"), 6).alias("bm25"),
            F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        )
    )
    from pyspark.sql import Window

    rank_w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return (
        scored.orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(top)
        .withColumn("rank", F.row_number().over(rank_w).cast("int"))
        .select("doc_id", "bm25", "n_terms_hit", "rank")
    )


def q_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_retrieval(load_table(spark, sf_dir, "documents"))


def _oracle_bm25(top: int | None = None) -> str:
    top = BM25_TOP if top is None else top
    terms = ", ".join(f"('{t}')" for t in BM25_QUERY)
    return f"""
WITH terms(word) AS (VALUES {terms}),
toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
  FROM documents
),
tf AS (
  SELECT doc_id, word, count(*) AS tf
  FROM toks WHERE word IN (SELECT word FROM terms)
  GROUP BY doc_id, word
),
dl AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS DOUBLE) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl
),
idf AS (
  SELECT word,
         ln(1.0 + (s.n_docs - df + 0.5) / (df + 0.5)) AS idf, s.avgdl
  FROM (SELECT word, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM tf GROUP BY word) d, stats s
),
scored AS (
  SELECT t.doc_id,
         ROUND(SUM(i.idf * (t.tf * ({BM25_K1} + 1))
               / (t.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * l.dl / i.avgdl))), 6)
           AS bm25,
         CAST(count(*) AS BIGINT) AS n_terms_hit
  FROM tf t JOIN idf i USING (word) JOIN dl l USING (doc_id)
  GROUP BY t.doc_id
)
SELECT doc_id, bm25, n_terms_hit,
       CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rank
FROM scored
QUALIFY rank <= {top}
"""


ORACLE_BM25_RETRIEVAL = _oracle_bm25()


# ------------------------------- hybrid lexical + dense fusion (RRF)

RRF_K = 60      # the canonical reciprocal-rank-fusion constant
RRF_POOL = 50   # per-ranker candidate pool feeding the fusion
RRF_TOP = 20


def hybrid_rrf_retrieval(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str] | None = None,
    k: int = RRF_K,
    pool: int = RRF_POOL,
    top: int = RRF_TOP,
) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009
    — the standard lexical+dense fuser in production search): BM25 ranks
    a candidate pool lexically; its TOP-1 hit seeds a dense
    query-by-example ranking (cosine against the seed's embedding — the
    classic seed-expansion mining flow for curation subsets); the two
    rank lists fuse as sum(1 / (k + rank_i)), with a doc absent from one
    list contributing only its present term. Output: the fused top-k
    with both ranks carried for audit.

    Scale shape: BM25's hit-filtered aggregate (see ``bm25_retrieval``)
    + ONE O(n) cosine pass against a broadcast 1-row seed (never a pair
    join; the ANN front door for bigger pools is ``api.ann_topk``); both
    rankers end in orderBy().limit() TakeOrderedAndProject pools of
    ``pool`` rows, so the rank windows and the full-outer fusion run on
    <= 2*pool rows. Ties in every ordering break on doc_id — the ranks,
    the seed choice, and the final cut are engine-deterministic."""
    lex = bm25_retrieval(docs, query_terms, top=pool).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )
    from m12_kafkastreams_python_azure_spark.operators.similarity import (
        _probe_dim,
    )

    dim = _probe_dim(emb, "embedding")
    seed = (
        lex.filter(F.col("lex_rank") == 1)
        .join(emb, lex.doc_id == emb.vec_id)
        .select(
            F.col("embedding").alias("svec"),
            l2_norm(F.col("embedding")).alias("snorm"),
        )
    )
    dense_scored = emb.crossJoin(F.broadcast(seed)).select(
        F.col("vec_id").alias("doc_id"),
        (
            dot_product_unrolled(F.col("embedding"), F.col("svec"), dim)
            / (l2_norm(F.col("embedding")) * F.col("snorm"))
        ).alias("cos"),
    )
    rank_w = Window.orderBy(F.desc("cos"), F.asc("doc_id"))
    dense = (
        dense_scored.orderBy(F.desc("cos"), F.asc("doc_id"))
        .limit(pool)
        .withColumn("dense_rank", F.row_number().over(rank_w).cast("int"))
        .select("doc_id", "dense_rank")
    )
    fused = lex.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(k)) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(k)) + F.col("dense_rank")),
                F.lit(0.0),
            )
        ).alias("_rrf"),
    )
    return (
        fused.orderBy(F.desc("_rrf"), F.asc("doc_id"))
        .limit(top)
        .select(
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round("_rrf", 6).alias("rrf_score"),
        )
    )


def q_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hybrid_rrf_retrieval(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )


_COS_SQL = (
    "list_dot_product(CAST(e.embedding AS DOUBLE[]), s.svec)"
    " / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),"
    " CAST(e.embedding AS DOUBLE[])))"
    " * s.snorm)"
)

ORACLE_HYBRID_RRF_RETRIEVAL = f"""
WITH bm AS ({_oracle_bm25(RRF_POOL)}),
lex AS (
  SELECT doc_id, CAST(rank AS INTEGER) AS lex_rank FROM bm
),
seed AS (
  SELECT CAST(e.embedding AS DOUBLE[]) AS svec,
         sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[]))) AS snorm
  FROM embeddings e JOIN lex ON e.vec_id = lex.doc_id
  WHERE lex.lex_rank = 1
),
dense_scored AS (
  SELECT e.vec_id AS doc_id, {_COS_SQL} AS cos
  FROM embeddings e, seed s
),
dense AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INTEGER)
           AS dense_rank
  FROM dense_scored
  QUALIFY dense_rank <= {RRF_POOL}
),
fused AS (
  SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
         l.lex_rank, d.dense_rank,
         COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + l.lex_rank), 0.0)
         + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + d.dense_rank), 0.0)
           AS rrf
  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.doc_id
)
SELECT doc_id, lex_rank, dense_rank, ROUND(rrf, 6) AS rrf_score
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {RRF_TOP}
"""


# ------------------------- batched multi-seed hybrid fusion (RRF x seeds)

RRF_SEEDS = 4       # seed-table size for the batched spelling
RRF_SALT_P = 16     # phase-1 salt cells for the per-seed dense top-pool


def hybrid_rrf_multi(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: list[str] | None = None,
    n_seeds: int = RRF_SEEDS,
    k: int = RRF_K,
    pool: int = RRF_POOL,
    top: int = RRF_TOP,
) -> DataFrame:
    """Batched multi-seed hybrid RRF (VERDICT r14 #4): a production
    mining run issues MANY query-by-example seeds, and the single-seed
    ``hybrid_rrf_retrieval`` would pay one O(n·dim) corpus scan per
    seed. This spelling scores the corpus against a broadcast SEED
    TABLE in ONE pass (the ``semantic_decontaminate`` shape): seeds =
    the BM25 pool's top ``n_seeds`` hits (each carrying its embedding),
    dense scores = one corpus scan x |seeds| broadcast rows, per-seed
    rank lists fused with the shared lexical ranking per seed. Output:
    (seed_id, doc_id, lex_rank, dense_rank, rrf_score) — the top
    ``top`` fused docs PER SEED, both ranks carried for audit.

    Scale shape: one O(n·dim·|seeds|) scan (columnar, broadcast seed
    table, no shuffle until the rank pools); the per-seed dense
    top-``pool`` uses the salted two-phase head (the
    ``zipf_vocab_audit`` discipline — phase 1 ranks inside (seed, salt)
    cells so no task ever buffers a seed's whole corpus ranking, phase
    2 re-ranks the <= salt*pool survivors per seed); everything after
    the pools runs on <= |seeds|*2*pool rows. Ties in every ordering
    break on doc_id. A seed doc with no embedding row drops out of the
    seed table (inner join) — lexical-only docs are still fusable as
    RESULTS, just not usable as dense probes."""
    lex = bm25_retrieval(docs, query_terms, top=pool).select(
        "doc_id", F.col("rank").alias("lex_rank")
    )
    from m12_kafkastreams_python_azure_spark.operators.similarity import (
        _probe_dim,
    )

    dim = _probe_dim(emb, "embedding")
    seeds = (
        lex.filter(F.col("lex_rank") <= n_seeds)
        .join(emb, lex.doc_id == emb.vec_id)
        .select(
            F.col("doc_id").alias("seed_id"),
            F.col("embedding").alias("svec"),
            l2_norm(F.col("embedding")).alias("snorm"),
        )
    )
    dense_scored = emb.crossJoin(F.broadcast(seeds)).select(
        "seed_id",
        F.col("vec_id").alias("doc_id"),
        (
            dot_product_unrolled(F.col("embedding"), F.col("svec"), dim)
            / (l2_norm(F.col("embedding")) * F.col("snorm"))
        ).alias("cos"),
    )
    w1 = Window.partitionBy("seed_id", "_salt").orderBy(
        F.desc("cos"), F.asc("doc_id")
    )
    survivors = (
        dense_scored.withColumn(
            "_salt", F.pmod(F.xxhash64("doc_id"), F.lit(RRF_SALT_P))
        )
        .withColumn("_rk1", F.row_number().over(w1))
        .filter(F.col("_rk1") <= pool)
    )
    w2 = Window.partitionBy("seed_id").orderBy(F.desc("cos"), F.asc("doc_id"))
    dense = (
        survivors.withColumn("dense_rank", F.row_number().over(w2))
        .filter(F.col("dense_rank") <= pool)
        .select("seed_id", "doc_id", F.col("dense_rank").cast("int").alias("dense_rank"))
    )
    lex_per_seed = seeds.select("seed_id").crossJoin(lex)
    fused = dense.join(
        lex_per_seed, ["seed_id", "doc_id"], "full_outer"
    ).select(
        "seed_id",
        "doc_id",
        "lex_rank",
        "dense_rank",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(k)) + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(k)) + F.col("dense_rank")),
                F.lit(0.0),
            )
        ).alias("_rrf"),
    )
    wf = Window.partitionBy("seed_id").orderBy(F.desc("_rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("_frk", F.row_number().over(wf))
        .filter(F.col("_frk") <= top)
        .select(
            "seed_id",
            "doc_id",
            "lex_rank",
            "dense_rank",
            F.round("_rrf", 6).alias("rrf_score"),
        )
    )


def q_hybrid_rrf_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hybrid_rrf_multi(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )


ORACLE_HYBRID_RRF_MULTI = f"""
WITH bm AS ({_oracle_bm25(RRF_POOL)}),
lex AS (
  SELECT doc_id, CAST(rank AS INTEGER) AS lex_rank FROM bm
),
seeds AS (
  SELECT l.doc_id AS seed_id,
         CAST(e.embedding AS DOUBLE[]) AS svec,
         sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                               CAST(e.embedding AS DOUBLE[]))) AS snorm
  FROM lex l JOIN embeddings e ON e.vec_id = l.doc_id
  WHERE l.lex_rank <= {RRF_SEEDS}
),
dense_scored AS (
  SELECT s.seed_id, e.vec_id AS doc_id, {_COS_SQL} AS cos
  FROM embeddings e, seeds s
),
dense AS (
  SELECT seed_id, doc_id,
         CAST(row_number() OVER (PARTITION BY seed_id
                                 ORDER BY cos DESC, doc_id) AS INTEGER)
           AS dense_rank
  FROM dense_scored
  QUALIFY dense_rank <= {RRF_POOL}
),
lex_per_seed AS (
  SELECT s.seed_id, l.doc_id, l.lex_rank FROM (SELECT seed_id FROM seeds) s, lex l
),
fused AS (
  SELECT COALESCE(d.seed_id, l.seed_id) AS seed_id,
         COALESCE(d.doc_id, l.doc_id) AS doc_id,
         l.lex_rank, d.dense_rank,
         COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + l.lex_rank), 0.0)
         + COALESCE(CAST(1.0 AS DOUBLE) / ({RRF_K} + d.dense_rank), 0.0)
           AS rrf
  FROM dense d
  FULL OUTER JOIN lex_per_seed l
    ON d.seed_id = l.seed_id AND d.doc_id = l.doc_id
)
SELECT seed_id, doc_id, lex_rank, dense_rank, ROUND(rrf, 6) AS rrf_score
FROM fused
QUALIFY row_number() OVER (PARTITION BY seed_id ORDER BY rrf DESC, doc_id)
        <= {RRF_TOP}
"""


# ----------------------------------------- retrieval quality evaluation

EVAL_MIN_TERMS = 2  # relevance rule: doc carries >= 2 distinct query terms


def retrieval_eval(
    ranking: DataFrame,
    relevant: DataFrame,
    k: int = BM25_TOP,
) -> DataFrame:
    """Rank-quality metrics of a retrieval run against a relevance set:
    MRR, nDCG@k (binary gains), precision@k, recall@k — the audit a
    curation stack runs before trusting a miner's output as a training
    subset. ``ranking`` = (doc_id, rank) with rank 1-based and <= k;
    ``relevant`` = (doc_id) gold rows. One summary row out.

    All-aggregate shape: one broadcast semi-join marks relevant hits in
    the (tiny, <= k-row) ranking; MRR/DCG are conditional aggregates
    over it; IDCG explodes a 1..min(R,k) sequence from the single
    scalar row — nothing scales with the corpus but the relevance rule
    the caller evaluates."""
    hits = ranking.join(
        F.broadcast(relevant.select("doc_id").distinct()), "doc_id", "semi"
    )
    n_rel = relevant.select("doc_id").distinct().agg(
        F.count(F.lit(1)).alias("n_relevant")
    )
    agg = (
        hits.agg(
            F.count(F.lit(1)).alias("n_hits_at_k"),
            F.min("rank").alias("_first"),
            F.sum(F.lit(1.0) / F.log2(F.col("rank") + F.lit(1.0))).alias(
                "_dcg"
            ),
        )
        .crossJoin(F.broadcast(n_rel))
    )
    idcg = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_relevant"), F.lit(k))),
        F.lit(0.0),
        lambda acc, i: acc + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
    )
    return agg.select(
        F.col("n_relevant").cast("long").alias("n_relevant"),
        F.col("n_hits_at_k").cast("long").alias("n_hits_at_k"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("_first"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(
            F.when(
                F.col("n_relevant") > 0,
                F.coalesce(F.col("_dcg"), F.lit(0.0)) / idcg,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg_at_k"),
        F.round(
            F.col("n_hits_at_k").cast("double") / F.lit(float(k)), 6
        ).alias("precision_at_k"),
        F.round(
            F.when(
                F.col("n_relevant") > 0,
                F.col("n_hits_at_k").cast("double") / F.col("n_relevant"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("recall_at_k"),
    )


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25's top-20 evaluated against a deterministic relevance rule —
    documents carrying >= EVAL_MIN_TERMS distinct query terms (a
    term-presence gold standard both engines derive identically)."""
    docs = load_table(spark, sf_dir, "documents")
    ranking = bm25_retrieval(docs).select("doc_id", "rank")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    )
    relevant = (
        toks.filter(F.col("word").isin(BM25_QUERY))
        .groupBy("doc_id")
        .agg(F.count_distinct("word").alias("nt"))
        .filter(F.col("nt") >= EVAL_MIN_TERMS)
        .select("doc_id")
    )
    return retrieval_eval(ranking, relevant)


def _oracle_retrieval_eval() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25_QUERY)
    return f"""
WITH bm AS ({_oracle_bm25()}),
ranking AS (SELECT doc_id, rank FROM bm),
terms(word) AS (VALUES {terms}),
relevant AS (
  SELECT doc_id
  FROM (
    SELECT doc_id, count(DISTINCT word) AS nt
    FROM (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
    ) WHERE word IN (SELECT word FROM terms)
    GROUP BY doc_id
  ) WHERE nt >= {EVAL_MIN_TERMS}
),
nrel AS (SELECT CAST(count(*) AS BIGINT) AS n_relevant FROM relevant),
hits AS (
  SELECT r.rank FROM ranking r JOIN relevant USING (doc_id)
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_hits_at_k,
         min(rank) AS first_rank,
         COALESCE(sum(CAST(1.0 AS DOUBLE) / log2(rank + 1.0)), 0.0) AS dcg
  FROM hits
),
idcg AS (
  SELECT COALESCE(sum(CAST(1.0 AS DOUBLE) / log2(i + 1.0)), 0.0) AS idcg
  FROM (SELECT unnest(range(1, {BM25_TOP} + 1)) AS i), nrel
  WHERE i <= least(n_relevant, {BM25_TOP})
)
SELECT n_relevant, n_hits_at_k,
       ROUND(COALESCE(CAST(1.0 AS DOUBLE) / first_rank, 0.0), 6) AS mrr,
       ROUND(CASE WHEN n_relevant > 0 THEN dcg / idcg ELSE 0.0 END, 6)
         AS ndcg_at_k,
       ROUND(CAST(n_hits_at_k AS DOUBLE) / {BM25_TOP}, 6) AS precision_at_k,
       ROUND(CASE WHEN n_relevant > 0
                  THEN CAST(n_hits_at_k AS DOUBLE) / n_relevant
                  ELSE 0.0 END, 6) AS recall_at_k
FROM agg, nrel, idcg
"""


ORACLE_RETRIEVAL_EVAL = _oracle_retrieval_eval()
