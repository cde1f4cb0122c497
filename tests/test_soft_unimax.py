"""SoftDeDup commonness weights and UniMax waterfill: hand-computable
planted geometry, boundary cases, and the gate-free / cap contracts."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import curation as CU
from m12_kafkastreams_python_azure_spark.operators import dedup as D


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_soft_dedup_unique_doc_keeps_full_weight(spark):
    """Fully-unique docs: commonness 0, weight 1; exact copies share all
    grams, so each copy's commonness reflects the other copies and its
    weight drops — yet NO doc is dropped (gate-free contract)."""
    uniq = "u1 u2 u3 u4 u5 u6"
    dup = "d1 d2 d3 d4 d5 d6"
    rows = [(1, uniq)] + [(i, dup) for i in range(2, 12)]
    out = {r.doc_id: r for r in D.soft_dedup_weights(_docs(spark, rows)).collect()}
    assert len(out) == 11  # nothing dropped
    assert out[1].commonness == 0.0 and out[1].weight == 1.0
    # 10 copies among 11 docs: each dup gram's df=10 -> (10-1)/(11-1)=0.9
    assert out[2].commonness == 0.9
    assert out[2].weight == round(1 / (1 + D.SOFT_DEDUP_GAMMA * 0.9), 6)
    assert all(out[i].weight == out[2].weight for i in range(3, 12))


def test_soft_dedup_single_doc_corpus_is_defined(spark):
    out = D.soft_dedup_weights(_docs(spark, [(1, "a b c d")])).collect()
    assert len(out) == 1
    assert out[0].commonness == 0.0 and out[0].weight == 1.0


def test_unimax_waterfill_hand_computed(spark):
    """tokens [10, 20, 1000], 2-epoch caps [20, 40, 2000], budget
    1.5*1030 = 1545: the two tail languages cap at 2 epochs, the head
    takes the leftover 1485 tokens (1.485 epochs)."""
    rows = [
        (1, " ".join(f"a{i}" for i in range(10)), "tail_a"),
        (2, " ".join(f"b{i}" for i in range(20)), "tail_b"),
        (3, " ".join(f"c{i}" for i in range(1000)), "head"),
    ]
    docs = _docs(spark, rows, "doc_id long, text string, lang string")
    out = {r.lang: r for r in CU.unimax_allocation(docs).collect()}
    assert out["tail_a"].alloc_tokens == 20.0 and out["tail_a"].epochs == 2.0
    assert out["tail_b"].alloc_tokens == 40.0 and out["tail_b"].epochs == 2.0
    assert out["head"].alloc_tokens == 1485.0
    assert out["head"].epochs == 1.485
    # budget fully spent when not everyone is capped
    assert sum(r.alloc_tokens for r in out.values()) == 1545.0


def test_unimax_budget_above_total_caps_means_everyone_capped(spark):
    """budget_frac > max_epochs: the cap mass is the binding constraint;
    every language allocates exactly its cap."""
    rows = [
        (1, "a b c", "x"),
        (2, "d e f g h i", "y"),
    ]
    docs = _docs(spark, rows, "doc_id long, text string, lang string")
    out = {
        r.lang: r
        for r in CU.unimax_allocation(docs, max_epochs=2.0, budget_frac=5.0).collect()
    }
    assert out["x"].alloc_tokens == 6.0 and out["x"].epochs == 2.0
    assert out["y"].alloc_tokens == 12.0 and out["y"].epochs == 2.0


def test_unimax_uniform_langs_split_evenly(spark):
    rows = [
        (1, "a b c d", "p"),
        (2, "e f g h", "q"),
    ]
    docs = _docs(spark, rows, "doc_id long, text string, lang string")
    out = {
        r.lang: r
        for r in CU.unimax_allocation(docs, max_epochs=3.0, budget_frac=1.0).collect()
    }
    # nobody capped (caps 12 vs theta 4): uniform water level = 4 each
    assert out["p"].alloc_tokens == 4.0 and out["q"].alloc_tokens == 4.0


def test_new_operator_plans_have_no_cartesian_blowup(spark):
    """Plan pins for the round-14 operators: soft_dedup_weights and
    excerpt_screen must never plan a CartesianProduct (their joins are
    gram-keyed equi-joins); unimax_allocation's only nested-loop join is
    the broadcast of the 1-row water-level scalar, and nothing in any of
    the three evaluates Python row-at-a-time."""
    from m12_kafkastreams_python_azure_spark.operators import dedup as DD
    from m12_kafkastreams_python_azure_spark.plans.checks import explain_str
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    s = explain_str(DD.soft_dedup_weights(docs.select("doc_id", "text")))
    assert "CartesianProduct" not in s
    # the n_docs scalar is the one permitted 1-row broadcast
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s

    rare, sizes, hot = DD.build_containment_ref(docs.select("doc_id", "text"))
    s = explain_str(
        DD.containment_against(DD.docs_excerpt_stream(docs), rare, sizes, hot)
    )
    assert "CartesianProduct" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s

    s = explain_str(CU.unimax_allocation(docs))
    assert "CartesianProduct" not in s
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
