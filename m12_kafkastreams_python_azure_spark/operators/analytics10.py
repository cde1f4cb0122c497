"""Tenth query wave: TF-IDF term ranking and deterministic hash-based
dataset splitting — the last two staple text-pipeline operators.

TF-IDF shape at scale: one explode (row count × tokens/doc), one (doc,word)
aggregate, one small (word) aggregate for document frequencies that
broadcasts back, one per-doc top-k window. The explode never crosses a
shuffle with full text — only (doc_id, word) pairs move.

The split uses md5 of the document id — a content-independent, engine-
portable hash — so the assignment is reproducible everywhere and co-moves
with the key (all shards of one doc land in one split), which is what
leakage-free holdouts require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.readers import load_table


def tfidf_top_terms(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document (smoothed idf = ln((N+1)/(df+1))+1),
    ties broken by term for determinism."""
    n_docs = docs.count()
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim("text"), "\\s+")).alias("word")
    ).filter(F.col("word") != "")
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(df_), "word").withColumn(
        "tfidf",
        F.col("tf")
        * (F.log((F.lit(float(n_docs + 1))) / (F.col("df") + 1)) + 1.0),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("word")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "doc_id", "word", "tf", "df", F.round("tfidf", 6).alias("tfidf"), "rnk"
        )
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, sf_dir, "documents"))


ORACLE_TFIDF_TOP_TERMS = """
WITH words AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
  FROM documents
),
tf AS (
  SELECT doc_id, word, count(*) AS tf FROM words WHERE word <> ''
  GROUP BY doc_id, word
),
dfreq AS (
  SELECT word, count(*) AS df FROM tf GROUP BY word
),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf, dfreq.df,
         tf.tf * (ln((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0) AS tfidf
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, word) AS rnk
  FROM scored
)
SELECT doc_id, word, tf, df, ROUND(tfidf, 6) AS tfidf, CAST(rnk AS INTEGER) AS rnk
FROM ranked WHERE rnk <= 3
"""


#: hex-nibble -> int SQL helper (shared trick with the multimodal oracle)
_NIBBLE = "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"


def dataset_split(
    docs: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """train/val/test assignment from the first byte of md5(id): content-
    independent, engine-portable, reproducible, and key-coherent."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10)
        .cast("int")
    )
    t_hi = 256 * train_pct // 100
    v_hi = 256 * (train_pct + val_pct) // 100
    return docs.withColumn(
        "split",
        F.when(bucket < t_hi, "train")
        .when(bucket < v_hi, "val")
        .otherwise("test"),
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dataset_split(docs).groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )


ORACLE_DATASET_SPLIT = f"""
WITH b AS (
  SELECT *, {_NIBBLE.format(i=1)} * 16 + {_NIBBLE.format(i=2)} AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 204 THEN 'train'
            WHEN bucket < 230 THEN 'val'
            ELSE 'test' END AS split,
       lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM b GROUP BY 1, 2
"""


def q_cte_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-CTE query through the spark.sql text interface: monthly
    revenue, month-over-month delta via a window, top month per year.
    Demonstrates WITH chains + window-over-aggregate in pure SQL."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        WITH monthly AS (
          SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
                 round(sum(o_totalprice), 2) AS revenue
          FROM orders_v GROUP BY year(o_orderdate), month(o_orderdate)
        ),
        with_delta AS (
          SELECT *, round(revenue - lag(revenue) OVER
                 (PARTITION BY yr ORDER BY mon), 2) AS mom_delta
          FROM monthly
        ),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY yr ORDER BY revenue DESC, mon) AS rnk
          FROM with_delta
        )
        SELECT yr, mon, revenue, mom_delta
        FROM ranked WHERE rnk = 1
        """
    )


ORACLE_CTE_SQL = """
WITH monthly AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mon,
         round(sum(o_totalprice), 2) AS revenue
  FROM orders GROUP BY year(o_orderdate), month(o_orderdate)
),
with_delta AS (
  SELECT *, round(revenue - lag(revenue) OVER
         (PARTITION BY yr ORDER BY mon), 2) AS mom_delta
  FROM monthly
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY yr ORDER BY revenue DESC, mon) AS rnk
  FROM with_delta
)
SELECT yr, mon, revenue, mom_delta
FROM ranked WHERE rnk = 1
"""


def q_full_outer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: per-customer order counts vs per-user event counts,
    keys present on either side survive with nulls filled — the
    reconciliation-report shape."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    events = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("key"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return (
        orders.join(events, "key", "full_outer")
        .select(
            "key",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            (F.col("n_orders").isNotNull() & F.col("n_events").isNotNull())
            .cast("int")
            .alias("both_sides"),
        )
    )


ORACLE_FULL_OUTER_ACTIVITY = """
WITH o AS (
  SELECT o_custkey AS key, count(*) AS n_orders FROM orders GROUP BY o_custkey
),
e AS (
  SELECT user_id AS key, count(*) AS n_events FROM events GROUP BY user_id
)
SELECT coalesce(o.key, e.key) AS key,
       coalesce(o.n_orders, 0) AS n_orders,
       coalesce(e.n_events, 0) AS n_events,
       CAST(o.key IS NOT NULL AND e.key IS NOT NULL AS INTEGER) AS both_sides
FROM o FULL OUTER JOIN e ON o.key = e.key
"""


def q_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long): per-status price metrics melted into
    (metric, value) rows — the inverse of the pivot operator."""
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.round(F.min("o_totalprice"), 2).alias("price_min"),
        F.round(F.avg("o_totalprice"), 2).alias("price_avg"),
        F.round(F.max("o_totalprice"), 2).alias("price_max"),
    )
    return wide.unpivot(
        ["o_orderstatus"],
        ["price_min", "price_avg", "price_max"],
        "metric",
        "value",
    )


ORACLE_UNPIVOT_METRICS = """
WITH wide AS (
  SELECT o_orderstatus,
         round(min(o_totalprice), 2) AS price_min,
         round(avg(o_totalprice), 2) AS price_avg,
         round(max(o_totalprice), 2) AS price_max
  FROM orders GROUP BY o_orderstatus
)
SELECT o_orderstatus, 'price_min' AS metric, price_min AS value FROM wide
UNION ALL
SELECT o_orderstatus, 'price_avg' AS metric, price_avg AS value FROM wide
UNION ALL
SELECT o_orderstatus, 'price_max' AS metric, price_max AS value FROM wide
"""


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-record-per-key (the CDC/compaction staple): one aggregate with
    max over a (timestamp, id, payload) struct — deterministic argmax with
    event_id tie-break, no window sort over the full table."""
    ev = load_table(spark, sf_dir, "events")
    m = F.max(
        F.struct(
            # NTZ->LTZ cast: exact under the UTC-pinned session, matches epoch_us().
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
            "event_type",
            "value",
        )
    ).alias("m")
    return (
        ev.groupBy("user_id")
        .agg(m)
        .select(
            "user_id",
            F.col("m.event_id").alias("last_event_id"),
            F.col("m.event_type").alias("last_event_type"),
            F.col("m.value").alias("last_value"),
        )
    )


ORACLE_LATEST_EVENT_PER_USER = """
WITH mx AS (
  SELECT user_id, max(epoch_us(ts)) AS us FROM events GROUP BY user_id
),
tied AS (
  SELECT e.user_id, max(e.event_id) AS last_event_id
  FROM events e JOIN mx ON e.user_id = mx.user_id AND epoch_us(e.ts) = mx.us
  GROUP BY e.user_id
)
SELECT t.user_id, t.last_event_id,
       e.event_type AS last_event_type, e.value AS last_value
FROM tied t JOIN events e ON e.event_id = t.last_event_id
"""


def q_hopping_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the sliding (hopping) window: 1-hour windows every 15
    minutes — each event lands in 4 windows (Spark's Expand). Oracle twin
    of ``streaming.windows.sliding_counts``."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("win"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )


ORACLE_HOPPING_HOURLY = """
WITH shifted AS (
  SELECT event_type,
         date_trunc('minute', ts)
           - to_minutes(CAST(extract(minute FROM ts) AS BIGINT) % 15)
           - to_minutes(45 - s.shift * 15) AS window_start
  FROM events
  CROSS JOIN (SELECT unnest(range(0, 4)) AS shift) s
)
SELECT window_start, event_type, count(*) AS n_events
FROM shifted
GROUP BY window_start, event_type
"""


#: pretraining mix rates out of 256 md5 buckets, per source language;
#: unlisted sources fall back to MIX_DEFAULT (~10%).
MIX_WEIGHTS = {"en": 256, "de": 128, "fr": 64, "es": 64}
MIX_DEFAULT = 26


def dataset_mix(
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    id_col: str = "doc_id",
    source_col: str = "lang",
) -> DataFrame:
    """Weighted dataset mixing — the pretraining-mix step: sample each
    source at its own rate, deterministically, from the same md5 bucket
    used by ``dataset_split`` (content-independent, engine-portable,
    reproducible; a doc keeps its fate across runs and engines). The
    per-source threshold is a scalar CASE — the whole mix is one narrow
    per-row filter (md5-derived, so not parquet-pushable, but evaluated
    in the scan stage): zero shuffles, trivially partition-parallel."""
    w = weights or MIX_WEIGHTS
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 2), 16, 10)
        .cast("int")
    )
    thr = F.coalesce(
        *[F.when(F.col(source_col) == k, F.lit(v)) for k, v in w.items()],
        F.lit(MIX_DEFAULT),
    )
    return docs.filter(bucket < thr)


def q_dataset_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dataset_mix(docs).groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )


# Derived from MIX_WEIGHTS/MIX_DEFAULT so editing the dict can never
# silently desynchronize the Spark filter from its DuckDB oracle.
_MIX_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in MIX_WEIGHTS.items())
    + f" ELSE {MIX_DEFAULT} END"
)

ORACLE_DATASET_MIX = f"""
WITH b AS (
  SELECT *, {_NIBBLE.format(i=1)} * 16 + {_NIBBLE.format(i=2)} AS bucket
  FROM documents
)
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
FROM b
WHERE bucket < {_MIX_CASE}
GROUP BY lang
"""
