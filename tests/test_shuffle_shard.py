"""shuffle_shard: deterministic training-order shuffle + sharding —
permutation properties, determinism, and the no-global-window plan pin."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import curation as CU
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_positions_are_contiguous_per_shard_and_cover_all_docs(spark):
    docs = load_table(spark, SF, "documents")
    out = CU.shuffle_shard(docs)
    n = docs.count()
    assert out.count() == n
    assert out.select("doc_id").distinct().count() == n
    bad = (
        out.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
        )
        .filter((F.col("lo") != 1) | (F.col("hi") != F.col("c")))
        .count()
    )
    assert bad == 0, "per-shard positions are not contiguous 1..n"


def test_order_is_deterministic_and_content_independent(spark):
    """Same ids -> same (shard, pos) regardless of run or text payload."""
    docs = load_table(spark, SF, "documents")
    a = {r.doc_id: (r.shard, r.pos) for r in CU.shuffle_shard(docs).collect()}
    scrambled = docs.withColumn("text", F.lit("x"))
    b = {
        r.doc_id: (r.shard, r.pos)
        for r in CU.shuffle_shard(scrambled).collect()
    }
    assert a == b


def test_plan_has_no_corpus_wide_window(spark, sf_dir):
    """The only window is keyed on shard (state bounded by shard size);
    an unpartitioned row_number would serialize the corpus on one task."""
    from m12_kafkastreams_python_azure_spark.plans.checks import explain_str

    s = explain_str(CU.q_shuffle_shard(spark, sf_dir))
    specs = set(re.findall(r"windowspecdefinition\((\w+)#", s))
    assert specs == {"shard"}, specs
