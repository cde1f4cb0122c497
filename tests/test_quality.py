"""Data-quality gate unit tests on crafted violations (the oracle query
covers the clean-table profile; these prove the detectors actually fire)."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.quality import (
    duplicate_keys,
    orphan_keys,
    profile,
    range_violations,
)


def test_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, None)], "k long, v string"
    )
    got = {r.col: (r.n_null, r.null_frac) for r in profile(df, ["k", "v"]).collect()}
    assert got == {"k": (1, round(1 / 3, 6)), "v": (2, round(2 / 3, 6))}


def test_duplicate_keys_fires(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (3,), (3,), (3,)], "k long")
    got = {r.k: r.n for r in duplicate_keys(df, ["k"]).collect()}
    assert got == {1: 2, 3: 3}


def test_orphan_keys_fires(spark):
    child = spark.createDataFrame([(1,), (1,), (9,), (8,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "pk long")
    got = {r.fk: r.n_orphans for r in orphan_keys(child, "fk", parent, "pk").collect()}
    assert got == {9: 1, 8: 1}


def test_range_violations_single_pass(spark):
    df = spark.createDataFrame([(5,), (-1,), (200,)], "x long")
    got = {
        r.rule: r.n_violations
        for r in range_violations(
            df, {"neg": F.col("x") < 0, "too_big": F.col("x") > 100}
        ).collect()
    }
    assert got == {"neg": 1, "too_big": 1}
