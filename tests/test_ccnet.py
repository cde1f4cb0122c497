"""CCNet perplexity bucketing: planted-score ordering, tercile shape,
and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import corpus as C
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_planted_scores_order_buckets(spark):
    """Under the corpus-fit bigram MLE, a doc made of one repeated
    bigram scores log2(1)=0 (every transition certain); docs sharing
    diverse bigrams score negative. The repeated doc must land in head,
    the most surprising in tail."""
    rows = [
        # 3 docs, one lang: perfectly predictable / mixed / diverse
        (1, "x x x x x x x x", "aa"),
        (2, "a b a b c d c d", "aa"),
        (3, "a b c d e f g h", "aa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r.bucket): r for r in C.ccnet_buckets(docs).collect()}
    assert set(out) == {"head", "middle", "tail"}
    assert out["head"].n_docs == 1 and out["tail"].n_docs == 1
    assert out["head"].mean_log2p == 0.0
    assert out["head"].mean_log2p > out["middle"].mean_log2p > out["tail"].mean_log2p


def test_terciles_split_each_language_evenly(spark):
    docs = load_table(spark, SF, "documents")
    out = C.ccnet_buckets(docs)
    per = (
        out.groupBy("lang")
        .pivot("bucket", ["head", "middle", "tail"])
        .sum("n_docs")
        .collect()
    )
    for r in per:
        total = (r.head or 0) + (r.middle or 0) + (r.tail or 0)
        assert total > 0
        # terciles: no bucket may deviate by more than 1 from n/3
        for b in (r.head, r.middle, r.tail):
            assert abs((b or 0) - total / 3) <= 1, r
    # head must outscore tail in every language
    rows = {(r.lang, r.bucket): r.mean_log2p for r in out.collect()}
    langs = {k[0] for k in rows}
    for lang in langs:
        assert rows[(lang, "head")] > rows[(lang, "tail")]


def test_bucketing_is_deterministic(spark):
    docs = load_table(spark, SF, "documents")
    a = sorted(map(tuple, C.ccnet_buckets(docs).collect()))
    b = sorted(map(tuple, C.ccnet_buckets(docs).collect()))
    assert a == b
