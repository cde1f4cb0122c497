"""Hard-negative mining and the anisotropy audit: planted-geometry
values, label-exclusion contract, IVF-vs-exact consistency, and plan
shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import mining as MN
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


# ----------------------------------------------- hard negative mining


def test_hard_negatives_exclude_same_label(spark):
    """The nearest vector overall shares the anchor's label — it must be
    skipped; the top negative is the nearest DIFFERENT-label vector."""
    rows = [
        (0, [1.0, 0.0, 0.0], 0),            # anchor
        (1, [0.99, 0.14, 0.0], 0),          # nearest, same label -> excluded
        (2, [0.9, 0.43, 0.0], 1),           # nearest hard negative
        (3, [0.0, 1.0, 0.0], 1),
        (4, [-1.0, 0.0, 0.0], 2),
    ]
    emb = _emb(spark, rows)
    anchors = emb.filter(F.col("vec_id") == 0)
    got = MN.hard_negative_mining(emb, anchors, k=2, method="exact").collect()
    assert [(r.anchor_id, r.negative_id, r.rank) for r in got] == [
        (0, 2, 1),
        (0, 3, 2),
    ]
    assert 1 not in {r.negative_id for r in got}


def test_ivf_mining_consistent_with_exact(spark):
    """Full-probe IVF candidates cover the corpus, so after the label
    filter the IVF spelling must reproduce the exact negatives."""
    emb = load_table(spark, SF, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 8)
    exact = {
        (r.anchor_id, r.negative_id, r.rank)
        for r in MN.hard_negative_mining(emb, anchors, k=3, method="exact").collect()
    }
    k_full = 16  # train_k for the test index: full probe == exact scan
    ivf = {
        (r.anchor_id, r.negative_id, r.rank)
        for r in MN.hard_negative_mining(
            emb, anchors, k=3, method="ivf", train_k=k_full, nprobe=k_full,
            iters=2,
        ).collect()
    }
    assert ivf == exact


def test_ivf_mining_never_returns_same_label(spark):
    emb = load_table(spark, SF, "embeddings")
    anchors = emb.filter(F.col("vec_id") % 25 == 0)
    out = MN.hard_negative_mining(
        emb, anchors, k=4, method="ivf", train_k=8, nprobe=2, iters=1
    )
    lab = emb.select(F.col("vec_id").alias("negative_id"), "label")
    alab = emb.select(
        F.col("vec_id").alias("anchor_id"), F.col("label").alias("alabel")
    )
    joined = out.join(lab, "negative_id").join(alab, "anchor_id")
    assert joined.filter(F.col("label") == F.col("alabel")).count() == 0
    # per-anchor at most k rows
    per = out.groupBy("anchor_id").count().agg(F.max("count")).first()[0]
    assert per <= 4


def test_ivf_mining_survives_duplicate_heavy_corpus(spark):
    """The round-13 100x probe measured the starvation mode: replicas of
    the anchor's own content crowd the over-fetched candidate list and
    the label filter empties it (0 pairs at 100x replication). With the
    exact-duplicate collapse in the candidate stage, a 20x-replicated
    corpus must (a) deliver the full k negatives per anchor, (b) emit
    only representative (min, i.e. original) ids, and (c) reproduce the
    exact mining result on the UNREPLICATED corpus — distinct contents
    are identical, so the full-probe answer is too."""
    emb = load_table(spark, SF, "embeddings")
    shift = 10_000_000
    rep = emb
    for i in range(1, 20):
        rep = rep.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * shift))
        )
    anchors = emb.filter(F.col("vec_id") < 8)
    k_full = 16
    got = MN.hard_negative_mining(
        rep, anchors, k=3, method="ivf", train_k=k_full, nprobe=k_full,
        iters=2,
    ).collect()
    assert all(r.negative_id < shift for r in got)
    per_anchor = {}
    for r in got:
        per_anchor[r.anchor_id] = per_anchor.get(r.anchor_id, 0) + 1
    assert set(per_anchor.values()) == {3}, per_anchor
    exact = {
        (r.anchor_id, r.negative_id, r.rank)
        for r in MN.hard_negative_mining(
            emb, anchors, k=3, method="exact"
        ).collect()
    }
    assert {(r.anchor_id, r.negative_id, r.rank) for r in got} == exact


def test_unknown_method_raises(spark):
    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="exact|ivf"):
        MN.hard_negative_mining(emb, emb.limit(1), method="lsh")


# --------------------------------------------------- anisotropy audit


def test_anisotropy_planted_geometries(spark):
    # identical vectors: a fully collapsed space -> mean pairwise cos 1
    same = _emb(spark, [(i, [3.0, 4.0, 0.0], 0) for i in range(5)])
    r = MN.anisotropy_audit(same).first()
    assert r.n_vectors == 5
    assert r.mean_pairwise_cos == pytest.approx(1.0, abs=1e-6)
    assert r.mean_norm == pytest.approx(5.0, abs=1e-6)

    # orthogonal basis: perfectly isotropic -> 0
    basis = _emb(
        spark,
        [(i, [1.0 if j == i else 0.0 for j in range(4)], 0) for i in range(4)],
    )
    r = MN.anisotropy_audit(basis).first()
    assert r.mean_pairwise_cos == pytest.approx(0.0, abs=1e-6)

    # antipodal pair -> -1
    pair = _emb(spark, [(0, [2.0, 0.0], 0), (1, [-2.0, 0.0], 0)])
    r = MN.anisotropy_audit(pair).first()
    assert r.mean_pairwise_cos == pytest.approx(-1.0, abs=1e-6)


def test_anisotropy_skips_zero_vectors(spark):
    rows = [(0, [1.0, 0.0], 0), (1, [0.0, 0.0], 0), (2, [1.0, 0.0], 0)]
    r = MN.anisotropy_audit(_emb(spark, rows)).first()
    assert r.n_vectors == 2
    assert r.mean_pairwise_cos == pytest.approx(1.0, abs=1e-6)


def test_anisotropy_plan_has_no_quadratic_node(spark):
    df = MN.q_anisotropy_audit(spark, SF)
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = s.split("\n\n")[0]
    assert "CartesianProduct" not in tree
    # the single crossJoin is the two 1-row aggregates meeting — both
    # sides are bounded; no corpus-sized side may feed a nested loop
    assert tree.count("Scan parquet") == 2


def test_hard_negative_mining_ivf_bench_spelling(spark):
    """The production (rows-only) spelling: per-anchor <= k rows, never
    a same-label negative, schema identical to the exact twin."""
    import m12_kafkastreams_python_azure_spark.operators.mining as MNM

    out = MNM.q_hard_negative_mining_ivf(spark, SF)
    rows = out.collect()
    assert rows
    assert out.columns == ["anchor_id", "negative_id", "sim", "rank"]
    per: dict = {}
    for r in rows:
        per[r.anchor_id] = per.get(r.anchor_id, 0) + 1
    assert max(per.values()) <= MN.HARD_NEG_K
    emb = load_table(spark, SF, "embeddings")
    lab = {r.vec_id: r.label for r in emb.select("vec_id", "label").collect()}
    for r in rows:
        assert lab[r.anchor_id] != lab[r.negative_id]


# ------------------------------------------------- IVF balance audit


def test_ivf_balance_audit_flags_drifted_inserts(spark, tmp_path):
    from m12_kafkastreams_python_azure_spark.operators.ivf import (
        build_ivf_index,
        insert_into_ivf_index,
        ivf_balance_audit,
        load_ivf_index,
        save_ivf_index,
        train_ivf,
    )

    emb = load_table(spark, SF, "embeddings")
    path = str(tmp_path / "ivf_bal")
    cents = train_ivf(emb, k=8, iters=2)
    save_ivf_index(build_ivf_index(emb, cents), cents, path)
    lists, _ = load_ivf_index(spark, path)
    healthy = ivf_balance_audit(lists, train_k=8).first()
    assert healthy.n_vectors == emb.count()
    assert healthy.n_lists <= 8
    assert not healthy.retrain, healthy

    # drift: insert 5x the corpus as copies of ONE vector — every copy
    # lands in a single list and the hot list dwarfs the mean
    one = emb.orderBy("vec_id").limit(1).collect()[0]
    skew = spark.createDataFrame(
        [(100_000 + i, list(one.embedding), int(one.label)) for i in range(2500)],
        "vec_id long, embedding array<double>, label int",
    )
    insert_into_ivf_index(skew, path)
    lists2, _ = load_ivf_index(spark, path)
    drifted = ivf_balance_audit(lists2, train_k=8).first()
    assert drifted.retrain, drifted
    assert drifted.imbalance > healthy.imbalance


def test_ivf_balance_audit_flags_outgrown_quantizer(spark):
    from m12_kafkastreams_python_azure_spark.operators.ivf import (
        ivf_balance_audit,
    )

    # 4 lists, 1000 vectors: mean list 250 >> 16*k -> the corpus wants
    # more lists even though balance is perfect
    lists = spark.range(1000).select(
        (F.col("id") % 4).alias("centroid_id"), F.col("id").alias("vec_id")
    )
    r = ivf_balance_audit(lists, train_k=4).first()
    assert r.retrain and r.imbalance < 1.01
