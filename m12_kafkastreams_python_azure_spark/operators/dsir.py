"""DSIR-style data selection via hashed-n-gram importance resampling.

Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling" (arXiv:2302.03169): estimate target and raw data
distributions as bag-of-hashed-n-gram models, weight every raw document
by the log likelihood ratio, and resample with Gumbel-top-k (Vieira
2014; Kool et al. 2019) — selecting n documents without replacement
with probability proportional to softmax of their importance weights,
deterministically given the per-document uniform draw.

Spark-first shape (the reason this scales to 100 TB):

- the two n-gram models are HASHED into ``DSIR_BUCKETS`` buckets, so
  each model is a bounded <=B-row count table built by one map-side-
  combined groupBy and shipped via broadcast joins — no vocabulary-sized
  state anywhere, exactly the paper's hashed-feature trick;
- gram totals ride as lazy 1-row broadcast aggregates (the engine's
  scalar idiom — constructing the DataFrame launches no job);
- per-document weights are one explode + two broadcast joins + one
  doc_id-keyed sum — a single shuffle on doc_id;
- selection is ``ORDER BY gumbel_key LIMIT n`` =
  TakeOrderedAndProject — per-partition heaps merged on the driver,
  never a single-partition global sort;
- the Gumbel noise derives from md5(doc_id) — the one hash both
  engines share byte-for-byte — so the draw is reproducible across
  Spark and the DuckDB oracle, and re-running selection on the same
  corpus yields the same sample (auditable curation).

Cites reference behavior: none — the reference (src/main.py) has no
sampling surface; this is part of the training-data-pipeline extension
mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .corpus import word_ngrams, word_ngrams_sql

DSIR_BUCKETS = 256  # one md5 byte; both engines collide identically
DSIR_ALPHA = 0.5  # add-alpha smoothing for unseen buckets
DSIR_SELECT_N = 100  # documents kept by the driver query
DSIR_TARGET_SOURCES = ("src0", "src1")


def _tokens(text: Column) -> Column:
    return F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")


def _grams(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, bucket) per gram INSTANCE — unigrams + bigrams, each
    hashed to one md5 byte. Multiplicity is kept: the weight is a sum
    over gram instances, i.e. the bag-of-ngrams log likelihood ratio."""
    t = F.col(text_col)
    grams = F.concat(_tokens(t), word_ngrams(t, 2))
    return df.select(
        "doc_id", F.explode(grams).alias("g")
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("g")), 1, 2), 16, 10)
        .cast("long")
        .alias("b"),
    )


def _gumbel_key(id_col: Column) -> Column:
    """Standard Gumbel noise from a deterministic md5-derived uniform:
    u = (md5_52bits + 0.5) / 2^52 in (0,1), g = -ln(-ln(u)). Adding g to
    the log-weight and taking top-n samples n docs without replacement
    proportional to softmax(log-weights) — numerically safe in log
    space (no exp of the weight is ever taken)."""
    v = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 13), 16, 10).cast(
        "double"
    )
    u = (v + F.lit(0.5)) / F.lit(float(1 << 52))
    return -F.log(-F.log(u))


def dsir_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """Per-raw-document importance log-weight
    ``logw = sum_g [ln p_t(bucket(g)) - ln p_r(bucket(g))]`` under
    add-alpha-smoothed hashed-n-gram models. Output: every raw doc_id
    with (log_weight, n_grams); gram-less docs score 0 (neutral).

    Both count tables and both totals are bounded and broadcast; the
    only shuffle over corpus-sized data is the final doc_id sum."""
    from pyspark.sql.window import Window

    tg = _grams(target, text_col)
    rg = _grams(raw, text_col)
    # the model total rides INSIDE each count table as a window over the
    # post-aggregation <=B rows (single partition of at most `buckets`
    # rows — bounded by construction, and it saves two whole extra
    # corpus scans + explodes that separate total subtrees would cost,
    # Spark having no cross-subtree CSE)
    wall = Window.partitionBy()
    # dense bucket spine: the TARGET model must cover every bucket a raw
    # gram can hash to (a bucket unseen in the target still needs the
    # smoothed probability and the global total), so the <=B count rows
    # join onto the full 0..B-1 spine before the total-window rides on
    spine = target.sparkSession.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("b")
    ).select(F.col("b").cast("long").alias("b"))
    tcounts = (
        spine.join(tg.groupBy("b").agg(F.count(F.lit(1)).alias("ct")), "b", "left")
        .withColumn("ct", F.coalesce("ct", F.lit(0)))
        .withColumn("nt", F.sum("ct").over(wall).cast("double"))
    )
    rcounts = (
        rg.groupBy("b")
        .agg(F.count(F.lit(1)).alias("cr"))
        .withColumn("nr", F.sum("cr").over(wall).cast("double"))
    )
    a = float(alpha)
    ab = float(alpha * buckets)
    scored = (
        # tcounts covers all B buckets (inner-equivalent); rcounts is
        # built from rg itself so every rg bucket is present — cr/nr
        # never null
        rg.join(F.broadcast(tcounts), "b", "left")
        .join(F.broadcast(rcounts), "b", "left")
        .select(
            "doc_id",
            (
                F.log(
                    (F.col("ct").cast("double") + F.lit(a))
                    / (F.col("nt") + F.lit(ab))
                )
                - F.log(
                    (F.col("cr").cast("double") + F.lit(a))
                    / (F.col("nr") + F.lit(ab))
                )
            ).alias("lr"),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("lr").alias("log_weight"),
            F.count(F.lit(1)).alias("n_grams"),
        )
    )
    return (
        raw.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        )
    )


def dsir_resample(
    target: DataFrame,
    raw: DataFrame,
    n: int = DSIR_SELECT_N,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """Gumbel-top-n selection over ``dsir_weights``: keep the n raw
    documents with the largest ``log_weight + Gumbel(md5(doc_id))`` —
    a without-replacement sample proportional to softmax(log-weights),
    reproducible across engines and runs. ``n`` is a literal, so the
    selection compiles to TakeOrderedAndProject (distributed partial
    top-n), never a global sort."""
    w = dsir_weights(target, raw, text_col, buckets, alpha)
    keyed = w.withColumn(
        "gumbel_key", F.col("log_weight") + _gumbel_key(F.col("doc_id"))
    )
    return keyed.orderBy(F.col("gumbel_key").desc(), "doc_id").limit(n)


def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver row: target = sources src0/src1, raw = everything else;
    keep DSIR_SELECT_N docs. Rounding to 6 places absorbs cross-engine
    ln() ulp differences (the established float contract)."""
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin(*DSIR_TARGET_SOURCES))
    raw = docs.filter(~F.col("source").isin(*DSIR_TARGET_SOURCES))
    sel = dsir_resample(target, raw)
    return sel.select(
        "doc_id",
        F.round("log_weight", 6).alias("log_weight"),
        "n_grams",
        F.round("gumbel_key", 6).alias("gumbel_key"),
    )


def _nibble(expr: str, i: int) -> str:
    return f"(strpos('0123456789abcdef', substr(md5({expr}), {i}, 1)) - 1)"


def _md5_int_sql(expr: str, nchars: int) -> str:
    """DuckDB spelling of Spark's conv(substring(md5(x),1,nchars),16,10):
    a horner sum over hex nibbles (DuckDB has no hex->int conv)."""
    terms = " + ".join(
        f"{_nibble(expr, i + 1)} * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    )
    return f"({terms})"


_TGT_LIST = "(" + ",".join(f"'{s}'" for s in DSIR_TARGET_SOURCES) + ")"
_GRAMS_SQL = (
    "list_concat(list_filter(string_split_regex(trim(text), '\\s+'),"
    " w -> w <> ''), " + word_ngrams_sql("text", 2) + ")"
)

ORACLE_DSIR_RESAMPLE = f"""
WITH tg AS (
  SELECT {_md5_int_sql("g", 2)} AS b
  FROM documents, unnest({_GRAMS_SQL}) AS t(g)
  WHERE source IN {_TGT_LIST}
), rg AS (
  SELECT doc_id, {_md5_int_sql("g", 2)} AS b
  FROM documents, unnest({_GRAMS_SQL}) AS t(g)
  WHERE source NOT IN {_TGT_LIST}
), tc AS (SELECT b, count(*) AS ct FROM tg GROUP BY b),
rc AS (SELECT b, count(*) AS cr FROM rg GROUP BY b),
tot AS (SELECT (SELECT CAST(count(*) AS DOUBLE) FROM tg) AS nt,
               (SELECT CAST(count(*) AS DOUBLE) FROM rg) AS nr),
scored AS (
  SELECT rg.doc_id,
         SUM(ln((COALESCE(tc.ct, 0) + {DSIR_ALPHA}) / (tot.nt + {DSIR_ALPHA * DSIR_BUCKETS}))
             - ln((COALESCE(rc.cr, 0) + {DSIR_ALPHA}) / (tot.nr + {DSIR_ALPHA * DSIR_BUCKETS})))
           AS log_weight,
         CAST(count(*) AS BIGINT) AS n_grams
  FROM rg LEFT JOIN tc USING (b) LEFT JOIN rc USING (b) CROSS JOIN tot
  GROUP BY rg.doc_id
), weighted AS (
  SELECT d.doc_id,
         COALESCE(s.log_weight, 0.0) AS log_weight,
         COALESCE(s.n_grams, 0) AS n_grams,
         COALESCE(s.log_weight, 0.0)
           + (- ln(- ln(({_md5_int_sql("CAST(d.doc_id AS VARCHAR)", 13)} + 0.5)
                        / {float(1 << 52)!r})))
           AS gumbel_key
  FROM documents d LEFT JOIN scored s USING (doc_id)
  WHERE d.source NOT IN {_TGT_LIST}
)
SELECT doc_id, ROUND(log_weight, 6) AS log_weight, n_grams,
       ROUND(gumbel_key, 6) AS gumbel_key
FROM weighted
ORDER BY gumbel_key DESC, doc_id
LIMIT {DSIR_SELECT_N}
"""


# ------------------------- persisted-model surface (streaming scorer)


def dsir_model_tables(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> tuple[DataFrame, DataFrame]:
    """The two hashed-n-gram models as SPINE-COMPLETE tables — exactly
    ``buckets`` rows each: (b, ct, nt) and (b, cr, nr). Batch
    ``dsir_weights`` derives the same numbers inline; this spelling
    exists so the models can be PERSISTED once and probed by many later
    scoring passes (the streaming processor's contract — and the real
    deployment shape: fit once on a raw sample, score shards forever).
    Spine-completeness matters for the persisted form: a shard gram may
    hash to a bucket the fitting sample never produced, and the smoothed
    probability + the global total must still be there."""
    spine = target.sparkSession.range(1).select(
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("b")
    ).select(F.col("b").cast("long").alias("b"))
    from pyspark.sql.window import Window

    wall = Window.partitionBy()
    tg = _grams(target, text_col)
    rg = _grams(raw, text_col)
    tmodel = (
        spine.join(tg.groupBy("b").agg(F.count(F.lit(1)).alias("ct")), "b", "left")
        .withColumn("ct", F.coalesce("ct", F.lit(0)))
        .withColumn("nt", F.sum("ct").over(wall).cast("double"))
    )
    rmodel = (
        spine.join(rg.groupBy("b").agg(F.count(F.lit(1)).alias("cr")), "b", "left")
        .withColumn("cr", F.coalesce("cr", F.lit(0)))
        .withColumn("nr", F.sum("cr").over(wall).cast("double"))
    )
    return tmodel, rmodel


def dsir_score_with_models(
    docs: DataFrame,
    tmodel: DataFrame,
    rmodel: DataFrame,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """Score documents against PRE-FIT models (the probe half of
    ``dsir_weights``): one explode + two <=B-row broadcast joins + one
    doc_id sum; gram-less docs come back neutral (0 weight). With
    models fit on the same target/raw split, this reproduces
    ``dsir_weights`` exactly — pinned in tests."""
    a = float(alpha)
    ab = float(alpha * buckets)
    g = _grams(docs, text_col)
    scored = (
        g.join(F.broadcast(tmodel), "b", "left")
        .join(F.broadcast(rmodel), "b", "left")
        .select(
            "doc_id",
            (
                F.log((F.col("ct").cast("double") + F.lit(a)) / (F.col("nt") + F.lit(ab)))
                - F.log((F.col("cr").cast("double") + F.lit(a)) / (F.col("nr") + F.lit(ab)))
            ).alias("lr"),
        )
        .groupBy("doc_id")
        .agg(F.sum("lr").alias("log_weight"), F.count(F.lit(1)).alias("n_grams"))
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        )
    )


def gumbel_key_col(id_col: Column) -> Column:
    """Public spelling of the deterministic Gumbel draw (streaming and
    batch must share it bit-for-bit)."""
    return _gumbel_key(id_col)
