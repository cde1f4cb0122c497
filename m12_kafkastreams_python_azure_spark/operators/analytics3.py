"""Third query wave: token counting, CUBE/grouping-sets, analytic (OVER)
window-function battery, array higher-order functions, EXCEPT set op.

These fill the SURVEY.md §2 "categories with no instances in the reference"
list (window OVER functions, grouping sets, set operations, array functions)
plus the training-pipeline text op (token counting) from the roadmap.
Everything is built-in Catalyst expressions — whole-stage codegen end to
end, no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import dot_product
from ..sources.readers import load_table

#: BPE-ish tokenizer regex: runs of letters, runs of digits, or a single
#: non-alphanumeric non-space symbol — the usual pre-tokenization split.
#: Kept engine-portable (no lookarounds) so Spark (Java regex) and the
#: DuckDB oracle (RE2) agree.
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting over ``documents.text`` (whitespace words + a BPE-ish
    regex token count), aggregated per language. ``regexp_extract_all`` is a
    codegen'd JVM expression — at 100 TB this is a pure map + one small agg
    shuffle keyed on ~tens of languages."""
    docs = load_table(spark, sf_dir, "documents")
    # The synthetic corpus is punctuation-free, which would make the regex
    # tokenizer indistinguishable from whitespace split. Tokenize a
    # deterministic punctuated derivation ("source:text.") instead so the
    # two counts genuinely differ and regexp_extract_all is exercised.
    punct = F.concat(F.col("source"), F.lit(":"), F.col("text"), F.lit("."))
    toks = docs.select(
        "lang",
        F.size(F.split(punct, "\\s+")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(punct, F.lit(TOKEN_RE), F.lit(0))).alias(
            "re_tokens"
        ),
    )
    return toks.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("ws_tokens_sum"),
        F.sum("re_tokens").alias("re_tokens_sum"),
        F.avg("re_tokens").alias("re_tokens_avg"),
    )


ORACLE_TOKEN_COUNT = """
WITH punct AS (
  SELECT lang, source || ':' || text || '.' AS ptext FROM documents
)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(len(string_split_regex(ptext, '\\s+'))) AS BIGINT) AS ws_tokens_sum,
       CAST(sum(len(regexp_extract_all(ptext, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))) AS BIGINT) AS re_tokens_sum,
       avg(len(regexp_extract_all(ptext, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))) AS re_tokens_avg
FROM punct
GROUP BY lang
"""


def q_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, event day): all 4 grouping combinations in one
    pass. Spark expands the cube map-side then runs one hash aggregate —
    same cost class as a plain groupBy at scale."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    return ev.cube("event_type", "day").agg(
        F.grouping_id("event_type", "day").alias("grp_id"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum"),
    )


ORACLE_CUBE_EVENTS = """
SELECT event_type, CAST(ts AS DATE) AS day,
       GROUPING(event_type) * 2 + GROUPING(CAST(ts AS DATE)) AS grp_id,
       count(*) AS n_events,
       sum(value) AS value_sum
FROM events
GROUP BY CUBE (event_type, CAST(ts AS DATE))
"""


def q_window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-function battery over orders, partitioned by customer and
    ordered by (o_orderdate, o_orderkey) — a unique sort key, so every rank/
    offset function is deterministic. One shuffle on o_custkey; all eight
    functions share the same window frame (single sort, single pass)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.lag("o_totalprice", 1).over(w).alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).alias("next_price"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.sum("o_totalprice").over(wsum).alias("running_total"),
    )


ORACLE_WINDOW_FUNCTIONS = """
SELECT o_orderkey, o_custkey,
       row_number() OVER w AS rn,
       rank() OVER w AS rnk,
       lag(o_totalprice, 1) OVER w AS prev_price,
       lead(o_totalprice, 1) OVER w AS next_price,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_total
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order-function battery over the embeddings table: size,
    element access, min/max, filter-count, and a double-precision left-fold
    (same evaluation order as DuckDB's list fold, so values hash-match)."""
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    return emb.select(
        "vec_id",
        "label",
        F.size(vec).alias("dim"),
        F.element_at(vec, 1).cast("double").alias("first_val"),
        F.array_min(vec).cast("double").alias("min_val"),
        F.array_max(vec).cast("double").alias("max_val"),
        F.size(F.filter(vec, lambda x: x > 0)).alias("n_positive"),
        dot_product(vec, vec).alias("sq_norm"),
    )


ORACLE_ARRAY_FUNCTIONS = """
SELECT vec_id, label,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(list_min(embedding) AS DOUBLE) AS min_val,
       CAST(list_max(embedding) AS DOUBLE) AS max_val,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       list_dot_product(embedding, embedding) AS sq_norm
FROM embeddings
"""


def q_inactive_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set op: customer keys that placed orders but never produced an
    event (order custkeys EXCEPT event user ids). Distinct set semantics,
    like SQL EXCEPT."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("custkey")
    )
    return orders.subtract(events)


ORACLE_INACTIVE_CUSTOMERS_EXCEPT = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT user_id AS custkey FROM events
"""
