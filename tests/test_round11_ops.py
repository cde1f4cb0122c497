"""Round-11 late-wave operators: temperature sampling and the LSH
banding planner."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import curation as CU
from m12_kafkastreams_python_azure_spark.operators.dedup import (
    lsh_recall,
    minhash_plan,
)
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------- temperature sampling


def test_temperature_flattens_toward_the_tail(spark):
    """A skewed corpus (900 docs of lang a, 50 of b, 10 of c): at
    alpha<1 the head language must be kept at a LOWER rate than the
    tail; a tail language under budget keeps everything (prob 1)."""
    rows = (
        [(i, "t", "a") for i in range(900)]
        + [(1000 + i, "t", "b") for i in range(50)]
        + [(2000 + i, "t", "c") for i in range(10)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.lang: r for r in CU.temperature_sample(docs).collect()}
    assert out["a"].keep_prob < out["b"].keep_prob <= out["c"].keep_prob
    assert out["c"].keep_prob == 1.0  # tail language fully kept
    # head is genuinely downsampled
    assert out["a"].n_kept < out["a"].n_docs
    # kept counts are governed by the keep probabilities (binomial with
    # deterministic md5 draws — allow generous slack)
    assert abs(out["a"].n_kept - 900 * out["a"].keep_prob) < 90


def test_temperature_sample_is_deterministic_and_stable_under_growth(spark):
    """md5-keyed keeps: re-running gives identical counts, and adding a
    NEW language never flips an existing doc's keep draw (the draw
    depends only on doc_id; only the rate can change)."""
    docs = load_table(spark, SF, "documents")
    a = sorted(map(tuple, CU.temperature_sample(docs).collect()))
    b = sorted(map(tuple, CU.temperature_sample(docs).collect()))
    assert a == b

    # uniform corpus (equal lang sizes): every keep_prob equals the
    # budget fraction exactly — pow cancels
    uni = spark.createDataFrame(
        [(i * 10 + j, "t", f"l{j}") for i in range(40) for j in range(4)],
        "doc_id long, text string, lang string",
    )
    out = {r.lang: r.keep_prob for r in CU.temperature_sample(uni).collect()}
    assert len(out) == 4
    for v in out.values():
        assert v == pytest.approx(CU.TEMP_BUDGET_FRAC, abs=1e-6)


def test_alpha_one_reproduces_uniform_budget(spark):
    """alpha=1 is no flattening: keep_prob = budget_frac for every
    language regardless of skew."""
    rows = [(i, "t", "a") for i in range(90)] + [
        (100 + i, "t", "b") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r.lang: r.keep_prob for r in CU.temperature_sample(docs, alpha=1.0).collect()}
    assert out["a"] == pytest.approx(0.5, abs=1e-9)
    assert out["b"] == pytest.approx(0.5, abs=1e-9)


# ------------------------------------------------- LSH banding planner


def test_planner_meets_target_and_is_minimal():
    plan = minhash_plan(0.8, target_recall=0.95)
    assert plan["recall_at_threshold"] >= 0.95
    k, b, r = plan["num_hashes"], plan["bands"], plan["rows_per_band"]
    assert k == b * r
    # no smaller k meets the target (planner minimality)
    for k2 in range(2, k):
        ok = any(
            k2 % r2 == 0 and lsh_recall(0.8, k2 // r2, r2) >= 0.95
            for r2 in range(1, k2 + 1)
        )
        assert not ok, (k2, plan)


def test_planner_prefers_sharper_curves_at_equal_cost():
    """At equal k, the planner returns the LARGEST viable r — the
    sharper S-curve admits fewer sub-threshold candidates."""
    plan = minhash_plan(0.9, target_recall=0.9)
    k, r = plan["num_hashes"], plan["rows_per_band"]
    viable = [
        r2 for r2 in range(1, k + 1)
        if k % r2 == 0 and lsh_recall(0.9, k // r2, r2) >= 0.9
    ]
    assert r == max(viable)


def test_planner_matches_the_measured_sweep():
    """SCALE.md banding sweep: (k=16, b=8, r=2) hit recall 1.000 on
    J~0.8 twins; the S-curve formula must agree it clears 0.99. The
    sweep's r=4 configs measured LOWER empirical recall than the curve
    at exactly J=0.8 because real twins spread below the nominal J —
    the formula ordering must still match the measured ordering."""
    assert lsh_recall(0.8, 8, 2) > 0.99
    assert lsh_recall(0.8, 8, 2) > lsh_recall(0.8, 8, 4) > lsh_recall(0.8, 4, 4)
    # a twin at the lower edge of the sweep's spread explains the
    # measured 0.752 for (32, b=8, r=4): the curve collapses fast
    assert lsh_recall(0.65, 8, 4) < 0.8


def test_planner_rejects_impossible_targets():
    with pytest.raises(ValueError, match="no banding"):
        minhash_plan(0.05, target_recall=0.999, max_hashes=4)
    with pytest.raises(ValueError):
        minhash_plan(1.5)


# ------------------------------------------- content-defined chunking


def test_cdc_boundaries_survive_a_prefix_insertion(spark):
    """THE content-defined property: inserting tokens at the front of a
    copy shifts every fixed-width segment but leaves post-edit CDC
    boundaries (hash of the last W tokens) in place — the clone's tail
    chunks identically and cross-doc dedup fires."""
    base = " ".join(f"tok{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, base), (2, "three new tokens " + base)],
        "doc_id long, text string",
    )
    ch = {
        (r.doc_id, r.chunk_idx): r.chunk
        for r in CU.cdc_chunks(docs).collect()
    }
    a = [v for (d, _), v in sorted(ch.items()) if d == 1]
    b = [v for (d, _), v in sorted(ch.items()) if d == 2]
    shared = set(a) & set(b)
    # everything after the first post-insertion boundary is identical
    assert len(shared) >= len(a) - 2, (len(shared), len(a))

    out = {r.doc_id: r for r in CU.cdc_chunk_dedup(docs).collect()}
    assert out[1].n_shared >= out[1].n_chunks - 2
    assert out[2].shared_frac > 0.8

    # the SAME edit defeats fixed-width segmentation almost entirely
    segs = {r.doc_id: r for r in CU.segment_dedup(docs, min_docs=2).collect()}
    assert segs[1].n_boiler <= 1  # shifted 20-word grid: ~no matches


def test_cdc_chunks_reassemble_the_document(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(57)))],
        "doc_id long, text string",
    )
    rows = sorted(
        CU.cdc_chunks(docs).collect(), key=lambda r: r.chunk_idx
    )
    rebuilt = " ".join(r.chunk for r in rows)
    assert rebuilt == docs.first().text


def test_cdc_short_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, None), (3, "solo")],
        "doc_id long, text string",
    )
    ch = CU.cdc_chunks(docs).collect()
    got = {(r.doc_id, r.chunk_idx, r.chunk) for r in ch}
    # below the window size: one chunk, the whole doc; null text: no rows
    assert got == {(1, 0, "a b"), (3, 0, "solo")}
