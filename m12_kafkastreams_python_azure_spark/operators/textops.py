"""Text-analysis queries over the ``documents`` table.

Engine-roadmap operators for a 100 TB LLM-data pipeline (beyond the
reference's surface — SURVEY.md §2 bottom note): token counting, quality
scoring, language ID, document fingerprinting. All pure Catalyst column
expressions (no Python in the hot path); each has an adjacent DuckDB oracle
built from the same ``*_sql`` spellings in ``functions.text`` so Spark and
oracle can't drift.

Scale: all are narrow per-row maps — zero shuffles, trivially partition-
parallel at any data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.functions import text as T
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cols = T.quality_score_cols(F.col("text"))
    return docs.select(
        "doc_id",
        cols["n_tokens"].alias("n_tokens"),
        F.round(cols["mean_token_len"], 6).alias("mean_token_len"),
        F.round(cols["stopword_ratio"], 6).alias("stopword_ratio"),
        F.round(cols["alpha_ratio"], 6).alias("alpha_ratio"),
        F.round(cols["quality_score"], 6).alias("quality_score"),
    )


def _oracle_text_quality() -> str:
    s = T.quality_score_sql("text")
    return f"""
SELECT doc_id,
       {s['n_tokens']} AS n_tokens,
       ROUND({s['mean_token_len']}, 6) AS mean_token_len,
       ROUND({s['stopword_ratio']}, 6) AS stopword_ratio,
       ROUND({s['alpha_ratio']}, 6) AS alpha_ratio,
       ROUND({s['quality_score']}, 6) AS quality_score
FROM documents
"""


ORACLE_TEXT_QUALITY = _oracle_text_quality()


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.language_id(F.col("text")).alias("lang_pred"),
    )


ORACLE_LANG_ID = f"""
SELECT doc_id, {T.language_id_sql('text')} AS lang_pred FROM documents
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = T.doc_fingerprint(F.col("text"))
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.substring(fp, 1, 8).alias("fp_prefix"),
    )


ORACLE_DOC_FINGERPRINT = f"""
SELECT doc_id,
       {T.doc_fingerprint_sql('text')} AS fingerprint,
       substring({T.doc_fingerprint_sql('text')}, 1, 8) AS fp_prefix
FROM documents
"""
