"""hash_sample_per_group: exact-k reproducible per-group sampling."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.curation import (
    SAMPLE_K,
    hash_sample_per_group,
)
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def test_exactly_k_per_group_and_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out1 = hash_sample_per_group(docs).collect()
    out2 = hash_sample_per_group(docs).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    per_group: dict[str, set] = {}
    for r in out1:
        per_group.setdefault(r["lang"], set()).add(r["sample_rank"])
    group_sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    for g, ranks in per_group.items():
        expect = min(SAMPLE_K, group_sizes[g])
        # ranks are exactly 1..k with no gaps (row_number, not rank)
        assert ranks == set(range(1, expect + 1))


def test_small_groups_survive_whole(spark):
    df = spark.createDataFrame(
        [(i, "tiny" if i < 3 else "big") for i in range(100)],
        "doc_id long, lang string",
    )
    out = hash_sample_per_group(df, k=10)
    counts = {r["lang"]: r["cnt"] for r in out.groupBy("lang").agg(
        F.count("doc_id").alias("cnt")
    ).collect()}
    assert counts == {"tiny": 3, "big": 10}
