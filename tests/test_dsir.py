"""DSIR importance-resampling tests: planted distribution shift, weight
semantics, determinism, and the plan shape (broadcast models, top-n via
TakeOrderedAndProject, no single-partition sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import dsir as DS

SF = "/root/testdata/sf0.001"


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_planted_shift_selects_target_like_docs(spark):
    """Raw docs written in the TARGET's vocabulary must out-weight raw
    docs written in a disjoint vocabulary — and dominate the selection.
    Weights are softmax-sampled, so assert on the weights (deterministic
    signal) and on the selection containing the target-like majority."""
    target = _docs(
        spark,
        [(1000 + i, "alpha beta gamma delta epsilon zeta", "tgt") for i in range(20)],
    )
    raw_rows = [
        # 10 target-like docs (share the target vocabulary)
        (i, "alpha beta gamma delta epsilon zeta", "raw") for i in range(10)
    ] + [
        # 30 off-distribution docs (disjoint vocabulary)
        (100 + i, "omega psi chi phi upsilon tau", "raw") for i in range(30)
    ]
    raw = _docs(spark, raw_rows)
    w = {r.doc_id: r.log_weight for r in DS.dsir_weights(target, raw).collect()}
    assert len(w) == 40
    like = [w[i] for i in range(10)]
    unlike = [w[100 + i] for i in range(30)]
    assert min(like) > max(unlike), (min(like), max(unlike))
    assert min(like) > 0 > max(unlike)

    sel = {r.doc_id for r in DS.dsir_resample(target, raw, n=10).collect()}
    assert len(sel) == 10
    # the shift is extreme (disjoint vocabularies), so the softmax mass
    # sits almost entirely on the 10 target-like docs
    assert len(sel & set(range(10))) >= 8


def test_gramless_docs_score_neutral_zero(spark):
    target = _docs(spark, [(1, "a b c", "t")])
    raw = _docs(spark, [(2, "a b", "r"), (3, None, "r"), (4, "   ", "r")])
    w = {r.doc_id: (r.log_weight, r.n_grams) for r in DS.dsir_weights(target, raw).collect()}
    assert w[3] == (0.0, 0)
    assert w[4] == (0.0, 0)
    assert w[2][1] == 3  # 2 unigrams + 1 bigram


def test_resample_is_deterministic_and_reproducible(spark):
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    target = docs.filter(F.col("source").isin(*DS.DSIR_TARGET_SOURCES))
    raw = docs.filter(~F.col("source").isin(*DS.DSIR_TARGET_SOURCES))
    a = sorted(r.doc_id for r in DS.dsir_resample(target, raw, n=25).collect())
    b = sorted(r.doc_id for r in DS.dsir_resample(target, raw, n=25).collect())
    assert a == b and len(a) == 25
    # Gumbel-top-k nesting: a smaller sample is a prefix of a larger one
    # under the same keys
    big = sorted(r.doc_id for r in DS.dsir_resample(target, raw, n=40).collect())
    assert set(a) <= set(big)


def test_plan_topn_is_distributed_and_models_broadcast(spark):
    s = explain_str(DS.q_dsir_resample(spark, SF))
    assert "TakeOrderedAndProject" in s, "top-n must not be a global sort"
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s  # totals ride IN the models
    assert "BroadcastHashJoin" in s  # the bounded count-table models
    # the only Exchanges allowed: broadcasts + the doc_id hash aggs —
    # never a single-partition range/sort exchange
    assert "rangepartitioning" not in s.lower()
    # scan budget: raw ids + raw grams-for-scoring + raw counts + target
    # counts — the separate totals subtrees were folded into the models
    # (count in the plan TREE only; the detail section repeats nodes)
    tree = s.split("\n\n")[0]
    assert tree.count("Scan parquet") == 4, tree.count("Scan parquet")


def test_construction_is_lazy(spark):
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, SF, "documents")
    target = docs.filter(F.col("source").isin(*DS.DSIR_TARGET_SOURCES))
    raw = docs.filter(~F.col("source").isin(*DS.DSIR_TARGET_SOURCES))
    sc = spark.sparkContext
    group = "lazy-check-dsir"
    sc.setJobGroup(group, "construction must be lazy")
    try:
        DS.dsir_resample(target, raw)
    finally:
        sc.setJobGroup(None, None)
    assert sc.statusTracker().getJobIdsForGroup(group) == []
