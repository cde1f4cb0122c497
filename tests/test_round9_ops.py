"""Round-9 operator tests: IVF index lifecycle (persist / load / probe
without retraining, corpus-derived list sizing, probed-list file pruning).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import api as API
from m12_kafkastreams_python_azure_spark.operators import ivf as IV

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    return load_table(spark, SF, "embeddings")


def test_default_train_k_is_sqrt_n():
    assert IV.default_train_k(0) == 4  # floor
    assert IV.default_train_k(16) == 4
    assert IV.default_train_k(100) == 10
    assert IV.default_train_k(101) == 11  # ceil
    assert IV.default_train_k(1_000_000) == 1000
    # the r08 caveat: the ratio list-count/sqrt(n) must stay ~constant
    assert IV.default_train_k(100 * 1_000_000) == 10 * 1000


def test_ivf_probe_without_retrain_matches_fresh_index(spark, emb, tmp_path):
    """save -> load -> probe must equal the fresh-index probe exactly:
    the persisted index IS the index, not an approximation of it."""
    cents = IV.train_ivf(emb, k=8, iters=2)
    idx = IV.build_ivf_index(emb, cents)
    path = str(tmp_path / "ivf")
    IV.save_ivf_index(idx, cents, path)
    assert IV.ivf_index_exists(path)

    loaded_idx, loaded_cents = IV.load_ivf_index(spark, path)
    assert loaded_cents == [(c, [float(x) for x in v]) for c, v in cents]

    q = emb.filter(F.col("vec_id") < 6)
    fresh = sorted(map(tuple, IV.ann_ivf_topk(idx, q, cents, k=5, nprobe=3).collect()))
    loaded = sorted(
        map(tuple, IV.ann_ivf_topk(loaded_idx, q, loaded_cents, k=5, nprobe=3).collect())
    )
    pruned = sorted(
        map(
            tuple,
            IV.ann_ivf_topk(
                loaded_idx, q, loaded_cents, k=5, nprobe=3, prune_lists=True
            ).collect(),
        )
    )
    assert fresh == loaded
    assert fresh == pruned
    assert len(fresh) == 6 * 5


def test_pruned_probe_has_partition_filter(spark, emb, tmp_path):
    """prune_lists on a persisted index must surface as a parquet
    PartitionFilter — the file-skipping contract, not just a row filter."""
    cents = IV.train_ivf(emb, k=8, iters=1)
    path = str(tmp_path / "ivf")
    IV.save_ivf_index(IV.build_ivf_index(emb, cents), cents, path)
    loaded_idx, loaded_cents = IV.load_ivf_index(spark, path)
    q = emb.filter(F.col("vec_id") < 2)
    plan = (
        IV.ann_ivf_topk(loaded_idx, q, loaded_cents, k=3, nprobe=2, prune_lists=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan
    # the filter actually constrains centroid_id (not an empty filter list)
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "centroid_id" in m.group(1)


def test_ann_topk_index_path_builds_once_then_loads(spark, emb, tmp_path):
    """api.ann_topk(method='ivf', index_path=...) end-to-end lifecycle:
    first call trains+saves, second call loads (results identical); the
    saved artifact survives on disk between calls."""
    path = str(tmp_path / "annidx")
    q = emb.filter(F.col("vec_id") < 4)
    first = sorted(
        map(
            tuple,
            API.ann_topk(emb, q, k=5, method="ivf", train_k=8, nprobe=3,
                         index_path=path).collect(),
        )
    )
    assert IV.ivf_index_exists(path)
    # corrupt-proof: drop the in-memory objects entirely; the second call
    # must reconstruct everything from disk
    second = sorted(
        map(
            tuple,
            API.ann_topk(emb, q, k=5, method="ivf", nprobe=3,
                         index_path=path).collect(),
        )
    )
    assert first == second


def test_knn_label_vote_ivf_entry_reuses_persisted_index(spark):
    """The driver/bench entry: call twice, assert the second run reuses the
    fingerprint-keyed on-disk index (identical output, index dir present)."""
    path = API.ivf_index_dir(SF, "knn_label_vote_ivf")
    shutil.rmtree(path, ignore_errors=True)
    try:
        first = sorted(map(tuple, API.q_knn_label_vote_ivf(spark, SF).collect()))
        assert IV.ivf_index_exists(path)
        second = sorted(map(tuple, API.q_knn_label_vote_ivf(spark, SF).collect()))
        assert first == second
        assert len(first) > 0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_train_ivf_none_derives_sqrt_list_count(spark, emb):
    """train_ivf(k=None) sizes the quantizer from the corpus."""
    n = emb.count()
    cents = IV.train_ivf(emb, k=None, iters=1)
    assert len(cents) == IV.default_train_k(n)
