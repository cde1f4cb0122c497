"""IVF ANN tests: the index partitions the corpus completely, and probing
nprobe lists recovers most of the exact top-k (recall floor)."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.ivf import (
    ann_ivf_topk,
    build_ivf_index,
    train_ivf,
)
from m12_kafkastreams_python_azure_spark.operators.similarity import (
    ann_bruteforce_topk,
)
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def test_ivf_index_partitions_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf(emb, k=8, iters=1)
    assert len(centroids) <= 8 and len(centroids) > 1
    index = build_ivf_index(emb, centroids)
    assert index.count() == emb.count()  # every vector in exactly one list
    n_lists = index.select("centroid_id").distinct().count()
    assert n_lists == len(centroids)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce_topk(emb, queries, k=5).collect()
    }
    centroids = train_ivf(emb, k=16, iters=2)
    index = build_ivf_index(emb, centroids)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(index, queries, centroids, k=5, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    """nprobe == k (scan every list) must reproduce the exact answer —
    the IVF machinery loses nothing; only probe pruning approximates."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 4)
    exact = {
        (r.query_id, r.neighbor_id, r.sim)
        for r in ann_bruteforce_topk(emb, queries, k=3).collect()
    }
    centroids = train_ivf(emb, k=8, iters=1)
    index = build_ivf_index(emb, centroids)
    full = {
        (r.query_id, r.neighbor_id, r.sim)
        for r in ann_ivf_topk(index, queries, centroids, k=3, nprobe=8).collect()
    }
    assert full == exact


def test_ivf_index_on_disk_prunes_partitions(spark, sf_dir, tmp_path):
    """The IVF layout promise at 100 TB: persist the index partitioned by
    centroid_id and a probe's centroid filter prunes at the FILE level —
    the scan carries a PartitionFilters entry on centroid_id and reads no
    non-probed list."""
    from m12_kafkastreams_python_azure_spark.plans.checks import explain_str

    emb = load_table(spark, sf_dir, "embeddings")
    centroids = train_ivf(emb, k=8, iters=1)
    index_dir = str(tmp_path / "ivf_index")
    build_ivf_index(emb, centroids).write.partitionBy("centroid_id").parquet(index_dir)

    on_disk = spark.read.parquet(index_dir)
    probed = on_disk.filter(F.col("centroid_id").isin(0, 3))
    plan = explain_str(probed)
    assert "PartitionFilters" in plan and "centroid_id" in plan.split("PartitionFilters", 1)[1][:200], plan
    # and the pruned read returns exactly the probed lists
    assert set(r.centroid_id for r in probed.select("centroid_id").distinct().collect()) <= {0, 3}


def test_ivf_sampled_training_keeps_recall(spark, sf_dir):
    """Training the quantizer on a 50% key-hash sample (the corpus-scale
    practice) must still produce an index with recall above the floor —
    centroids need a representative sample, not every vector."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce_topk(emb, queries, k=5).collect()
    }
    centroids = train_ivf(emb, k=16, iters=2, sample_fraction=0.5)
    index = build_ivf_index(emb, centroids)
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(index, queries, centroids, k=5, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"sampled-training recall {recall:.2f}"


def test_ivf_training_guards(spark, sf_dir):
    """Degenerate sampling must fail loudly, never return empty/undersized
    centroids (which would silently null-tag the whole index)."""
    import pytest as _pytest

    emb = load_table(spark, sf_dir, "embeddings")
    with _pytest.raises(ValueError, match="sample_fraction"):
        train_ivf(emb, k=8, sample_fraction=0.0)
    with _pytest.raises(ValueError, match="empty sample"):
        train_ivf(emb, k=8, sample_fraction=1e-9)
    with _pytest.raises(ValueError, match="need >= k"):
        train_ivf(emb, k=100_000, iters=0)
