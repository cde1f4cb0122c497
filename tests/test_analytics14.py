"""Round-10 TPC-H wave (analytics14) + linear quality classifier tests.

Correctness vs DuckDB is covered by tests/test_oracle.py (these entries
are all in ``oracle_sql()``); here we pin the SEMANTICS of the two
adapted queries on synthetic scenarios and the PLAN SHAPES that make the
wave scale: dimension broadcasts, no accidental cartesians, and the
classifier's zero-shuffle narrow pass.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import analytics14 as A14
from m12_kafkastreams_python_azure_spark.operators.corpus import (
    CLF_BIAS,
    CLF_SCALE,
    CLF_THRESHOLD,
    CLF_WEIGHTS,
    quality_classifier,
)


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


# ------------------------------------------------------------------ Q21


def test_lone_fault_semantics_on_synthetic_orders(spark):
    """Order 1: suppliers 10 and 11, only 10 has a return -> 10 is at
    fault. Order 2: suppliers 10 and 11 BOTH return -> nobody is solely
    at fault. Order 3: single-supplier order with a return -> excluded
    (no co-suppliers to have let down). Order 4: multi-supplier, no
    returns -> excluded."""
    li = spark.createDataFrame(
        [
            (1, 10, "R"), (1, 11, "N"),
            (2, 10, "R"), (2, 11, "R"),
            (3, 12, "R"),
            (4, 10, "N"), (4, 12, "A"),
        ],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    )
    s = spark.createDataFrame(
        [(10, "SUPP_10"), (11, "SUPP_11"), (12, "SUPP_12")],
        "s_suppkey long, s_name string",
    )
    rows = {r["s_name"]: r["numwait"] for r in A14.lone_fault_suppliers(li, s).collect()}
    assert rows == {"SUPP_10": 1}


def test_lone_fault_counts_each_order_once(spark):
    """Multiple returned LINES by the same supplier in one order are one
    fault, not many — the per-(order, supplier) pre-aggregation is what
    guarantees it."""
    li = spark.createDataFrame(
        [(1, 10, "R"), (1, 10, "R"), (1, 10, "R"), (1, 11, "N")],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    )
    s = spark.createDataFrame(
        [(10, "SUPP_10"), (11, "SUPP_11")], "s_suppkey long, s_name string"
    )
    rows = A14.lone_fault_suppliers(li, s).collect()
    assert [(r["s_name"], r["numwait"]) for r in rows] == [("SUPP_10", 1)]


# ------------------------------------------------------- plan hygiene


def test_q7_nation_slices_broadcast_no_cartesian(spark, sf_dir):
    s = explain_str(A14.q_volume_shipping_q7(spark, sf_dir))
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_q8_part_filter_pushes_to_scan(spark, sf_dir):
    s = explain_str(A14.q_market_share_q8(spark, sf_dir))
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s
    # the p_type predicate must reach the part parquet scan
    assert "PushedFilters" in s and A14.Q8_TYPE in s


def test_q10_predicates_push_into_both_fact_scans(spark, sf_dir):
    s = explain_str(A14.q_returned_items_q10(spark, sf_dir))
    assert "TakeOrderedAndProject" in s  # top-20, never a global sort
    # guard the split: a scan-strategy change that drops PushedFilters
    # entirely should fail the assertion, not raise IndexError
    assert "PushedFilters" in s, "no PushedFilters section in plan"
    assert (
        "EqualTo(l_returnflag,R)" in s
        or "l_returnflag" in s.split("PushedFilters")[1]
    )


def test_q15_max_is_broadcast_hash_join(spark, sf_dir):
    """The scalar-subquery max must come back as a 1-row broadcast HASH
    join (equality on rounded revenue), not a nested loop."""
    s = explain_str(A14.q_top_supplier_q15(spark, sf_dir))
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    assert "BroadcastNestedLoopJoin" not in s


def test_q21_single_orderkey_shuffle_no_self_join(spark, sf_dir):
    """The EXISTS/NOT-EXISTS rewrite must NOT contain a join of lineitem
    with lineitem — only (agg ⋈ agg) on l_orderkey plus the supplier
    broadcast. Detectable: exactly ONE scan of the lineitem parquet."""
    s = explain_str(A14.q_lone_fault_supplier_q21(spark, sf_dir))
    assert s.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in s


# -------------------------------------------------- quality classifier


def test_classifier_plan_is_shuffle_free(spark):
    """Inference must be a narrow pass: no Exchange anywhere in the
    plan — the weight map is a constant-folded literal, the token sum an
    array aggregate, so each partition classifies independently."""
    docs = spark.createDataFrame(
        [(1, "data query fast"), (2, "the a slow")], "doc_id long, text string"
    )
    s = explain_str(quality_classifier(docs))
    assert "Exchange" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_classifier_scores_match_reference_formula(spark):
    docs = spark.createDataFrame(
        [
            (1, "data data query"),       # strongly positive
            (2, "the a the a"),           # strongly negative
            (3, "unknown words only"),    # all OOV -> sigmoid(bias)
            (4, "   "),                   # no tokens -> dropped
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
    assert set(rows) == {1, 2, 3}

    def ref(tokens):
        z = CLF_SCALE * sum(CLF_WEIGHTS.get(t, 0.0) for t in tokens) / len(
            tokens
        ) + CLF_BIAS
        return 1.0 / (1.0 + math.exp(-z))

    for doc_id, toks in [
        (1, ["data", "data", "query"]),
        (2, ["the", "a", "the", "a"]),
        (3, ["unknown", "words", "only"]),
    ]:
        expected = ref(toks)
        assert abs(rows[doc_id]["quality_prob"] - round(expected, 6)) < 1e-9
        assert rows[doc_id]["keep"] == (expected >= CLF_THRESHOLD)
        assert rows[doc_id]["n_tok"] == len(toks)


def test_classifier_keep_rate_is_mixed_on_corpus(spark, sf_dir):
    """The synthetic corpus mixes positive- and negative-weight tokens:
    the classifier must actually split it (both classes present), not
    degenerate to all-keep or all-drop."""
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    out = quality_classifier(load_table(spark, sf_dir, "documents"))
    counts = {r["keep"]: r["n"] for r in out.groupBy("keep").agg(
        F.count(F.lit(1)).alias("n")
    ).collect()}
    assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0


# ------------------------------------------------ SCD2 point-in-time


def test_pit_lookup_plan_has_no_join(spark, sf_dir):
    """The union-spine spelling must contain NO join operator — the
    range-join alternative becomes a BroadcastNestedLoopJoin."""
    from m12_kafkastreams_python_azure_spark.operators import scd as SCD

    s = explain_str(SCD.q_scd2_pit_lookup(spark, sf_dir))
    assert "Join" not in s
    assert "CartesianProduct" not in s


def test_pit_lookup_resolves_versions_at_order_time(spark):
    from m12_kafkastreams_python_azure_spark.operators.scd import (
        scd2_pit_lookup,
    )

    versions = spark.createDataFrame(
        [
            (1, "OLD", "2000-01-01"),
            (1, "NEW", "2000-06-01"),
            (2, "ONLY", "2000-01-01"),
        ],
        "c_custkey long, segment string, effective_date string",
    ).withColumn("effective_date", F.col("effective_date").cast("date"))
    orders = spark.createDataFrame(
        [
            (100, 1, "2000-03-15", 10.0),  # before the change -> OLD
            (101, 1, "2000-06-01", 20.0),  # ON the change date -> NEW
            (102, 1, "2000-09-01", 30.0),  # after -> NEW
            (103, 2, "2000-02-01", 40.0),  # single version -> ONLY
        ],
        "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    rows = {r["o_orderkey"]: r["segment"] for r in scd2_pit_lookup(orders, versions).collect()}
    assert rows == {100: "OLD", 101: "NEW", 102: "NEW", 103: "ONLY"}


# ------------------------------------------------- round-18 wave plan pins

def test_q3_top10_is_take_ordered_not_global_sort(spark, sf_dir):
    """Q3's top-10 must be a TakeOrderedAndProject (per-partition heads +
    one merge), never a full Sort, and the segment slice must broadcast."""
    plan = explain_str(A14.q_shipping_priority_q3(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "TakeOrderedAndProject" in tree
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree


def test_q5_broadcasts_every_dimension(spark, sf_dir):
    """Q5: the region-filtered nation/supplier slices broadcast; the only
    shuffle joins are the fact-fact ones (lineitem⋈orders⋈customer)."""
    plan = explain_str(A14.q_local_supplier_volume_q5(spark, sf_dir))
    tree = plan.split("\n\n")[0]
    assert "BroadcastHashJoin" in tree
    assert "CartesianProduct" not in tree
    assert "BroadcastNestedLoopJoin" not in tree


def test_q13_exclusion_rides_in_the_join_condition(spark):
    """The o_orderpriority exclusion must sit IN the LEFT join: an
    excluded-but-matched customer counts ZERO orders (not a dropped
    row). Customer 2's only order is 5-LOW -> c_count 0, alongside the
    never-ordered customer 3."""
    c = spark.createDataFrame([(1,), (2,), (3,)], "c_custkey long")
    o = spark.createDataFrame(
        [(1, 10, "1-URGENT"), (1, 11, "5-LOW"), (2, 12, "5-LOW")],
        "o_custkey long, o_orderkey long, o_orderpriority string",
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    got = {r.c_custkey: r.c_count for r in per_cust.collect()}
    assert got == {1: 1, 2: 0, 3: 0}


def test_q18_scans_lineitem_once(spark, sf_dir):
    """The classic Q18 IN-subquery spelling scans lineitem twice; the
    single-aggregation rewrite must show exactly ONE lineitem scan."""
    plan = explain_str(A14.q_large_volume_customer_q18(spark, sf_dir))
    assert plan.count("lineitem.parquet") == 1  # the q21 detection style
    assert "CartesianProduct" not in plan
