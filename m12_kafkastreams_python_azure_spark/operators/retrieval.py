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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def _oracle_bm25() -> str:
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
QUALIFY rank <= {BM25_TOP}
"""


ORACLE_BM25_RETRIEVAL = _oracle_bm25()
