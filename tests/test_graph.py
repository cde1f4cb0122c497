"""Connected-components unit tests: known graphs, chains (pointer-jumping
convergence), and singleton handling."""

from __future__ import annotations

from m12_kafkastreams_python_azure_spark.operators.graph import (
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        (r.id, r.comp) for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_long_chain_converges(spark):
    # a 40-node chain: plain propagation would need 40 rounds; pointer
    # jumping must converge within the 20-iteration cap
    chain = [(i, i + 1) for i in range(40)]
    got = _cc(spark, chain)
    assert got == {(i, 0) for i in range(41)}


def test_cycle_and_cross_edges(spark):
    got = _cc(spark, [(5, 6), (6, 7), (7, 5), (7, 8), (2, 8)])
    assert got == {(5, 2), (6, 2), (7, 2), (8, 2), (2, 2)}


def test_pagerank_two_node_cycle(spark):
    """a<->b: perfect symmetry, every iteration preserves rank 0.5/0.5."""
    from m12_kafkastreams_python_azure_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=5).collect()}
    assert got == {"a": 0.5, "b": 0.5}


def test_pagerank_star_center_dominates(spark):
    """Symmetrized star (c hub, 3 leaves): the hub must out-rank every leaf
    and ranks must sum to ~1 (no dangling mass on a symmetrized graph)."""
    from m12_kafkastreams_python_azure_spark.operators.graph import pagerank

    leaves = ["x", "y", "z"]
    edges = spark.createDataFrame(
        [("c", v) for v in leaves] + [(v, "c") for v in leaves],
        "src string, dst string",
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=10).collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-4
    assert all(got["c"] > got[v] for v in leaves), got


def test_pagerank_keeps_no_inedge_nodes_and_conserves_mass(spark):
    """Directed graph meeting the out-edge precondition where node c has NO
    in-edges: c must still appear (teleport floor (1-d)/N) and total mass
    must stay 1 — a dropped node would also leak its outgoing mass."""
    from m12_kafkastreams_python_azure_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("c", "a")], "src string, dst string"
    )
    got = {r.node: r.rank for r in pagerank(edges, iters=3).collect()}
    assert set(got) == {"a", "b", "c"}
    assert abs(sum(got.values()) - 1.0) < 1e-5, got
    assert got["c"] == round(0.15 / 3, 6)
