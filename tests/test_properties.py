"""Property-based tests (hypothesis) for the engine's core semantics:
the stay-category bucketing (reference F3-F5) and the similarity math.

These complement the oracle sweep: the oracle checks agreement on one
dataset; these check the CONTRACT on arbitrary inputs.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.enrich import enrich_stay

# one shared batch per test run keeps the Spark round-trips bounded
_DATES = st.dates(min_value=dt.date(1990, 1, 1), max_value=dt.date(2030, 1, 1))


def _expected_category(ci: dt.date, co: dt.date) -> str:
    d = (co - ci).days
    if 1 <= d <= 4:
        return "Short stay"
    if 5 <= d <= 10:
        return "Standard stay"
    if 11 <= d <= 14:
        return "Standard extended stay"
    if d > 14:
        return "Long stay"
    return "Erroneous data"  # d <= 0, reference src/main.py:71,86-93 intended semantics


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(_DATES, _DATES), min_size=1, max_size=30))
def test_stay_category_matches_reference_rules(spark, pairs):
    rows = [(i, ci.isoformat(), co.isoformat()) for i, (ci, co) in enumerate(pairs)]
    df = spark.createDataFrame(rows, "id long, srch_ci string, srch_co string")
    got = {
        r.id: r.stay_category
        for r in enrich_stay(df, "srch_ci", "srch_co").collect()
    }
    for i, (ci, co) in enumerate(pairs):
        assert got[i] == _expected_category(ci, co), (i, ci, co)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=10
    ),
    st.text(alphabet="ab ", min_size=1, max_size=40),
)
def test_unparseable_dates_always_erroneous(spark, cis, co):
    rows = [(i, ci, co) for i, ci in enumerate(cis)]
    df = spark.createDataFrame(rows, "id long, srch_ci string, srch_co string")
    out = enrich_stay(df, "srch_ci", "srch_co").collect()
    for r in out:
        assert r.stay_category == "Erroneous data"


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.integers(0, 9), min_size=1, max_size=20),
    st.lists(st.integers(0, 9), min_size=1, max_size=20),
)
def test_jaccard_bounds_and_identity(spark, xs, ys):
    from m12_kafkastreams_python_azure_spark.operators.dedup import jaccard

    df = spark.createDataFrame(
        [([f"t{x}" for x in xs], [f"t{y}" for y in ys])],
        "a array<string>, b array<string>",
    )
    j_ab, j_aa = df.select(
        jaccard(F.array_distinct("a"), F.array_distinct("b")).alias("jab"),
        jaccard(F.array_distinct("a"), F.array_distinct("a")).alias("jaa"),
    ).first()
    assert 0.0 <= j_ab <= 1.0
    assert j_aa == 1.0
    if set(xs) == set(ys):
        assert j_ab == 1.0


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="abcd ", min_size=1, max_size=30), min_size=2, max_size=8))
def test_simhash_identical_texts_zero_hamming(spark, texts):
    from m12_kafkastreams_python_azure_spark.operators.dedup import (
        hamming64,
        simhash64,
    )

    df = spark.createDataFrame([(t,) for t in texts], "t string")
    sigs = df.select(simhash64(F.col("t")).alias("s"), "t").collect()
    by_text = {}
    for r in sigs:
        by_text.setdefault(r.t, set()).add(r.s)
    # simhash is a pure function of the text
    for t, s in by_text.items():
        assert len(s) == 1, t


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 6)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=12,
        unique=True,
    )
)
def test_pagerank_mass_conserved_on_symmetrized_graphs(spark, edge_list):
    """On ANY symmetrized edge set (meets the out-edge precondition), the
    rank vector sums to 1 (±rounding) and every node appears exactly once."""
    from m12_kafkastreams_python_azure_spark.operators.graph import pagerank

    sym = list({(str(a), str(b)) for a, b in edge_list} | {(str(b), str(a)) for a, b in edge_list})
    edges = spark.createDataFrame(sym, "src string, dst string")
    out = pagerank(edges, iters=3).collect()
    nodes = {n for e in sym for n in e}
    assert {r.node for r in out} == nodes
    assert abs(sum(r.rank for r in out) - 1.0) < 1e-4


@settings(max_examples=10, deadline=None)
@given(
    st.binary(min_size=0, max_size=40),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_confluent_frame_round_trip_any_payload(spark, payload, schema_id):
    """frame -> unframe is lossless for arbitrary bodies and schema ids."""
    from m12_kafkastreams_python_azure_spark.sources.readers import (
        confluent_frame,
        confluent_unframe,
    )

    df = spark.createDataFrame([(payload,)], "value binary")
    out = confluent_unframe(confluent_frame(df, schema_id)).collect()
    assert len(out) == 1
    assert out[0].schema_id == schema_id
    assert bytes(out[0].value or b"") == payload
