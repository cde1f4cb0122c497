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
