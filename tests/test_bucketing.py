"""Bucketed co-located join: same answer as the plain join, with NO Exchange
in the physical plan — the pay-the-shuffle-once storage layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.plans.checks import explain_str
from m12_kafkastreams_python_azure_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed(li, "b_lineitem", "o_orderkey", num_buckets=8)
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "o_orderkey", force_merge=True).groupBy(
        "o_orderpriority"
    ).agg(F.sum("l_quantity").alias("qty"))
    plan = explain_str(joined)
    assert "SortMergeJoin" in plan
    # exactly ONE Exchange allowed: the one feeding the final aggregation.
    # The join of two same-bucketed tables must not add any.
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    lt, rt = bucketed_tables
    bucketed = (
        bucketed_join(spark, lt, rt, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    plain = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    """Hive-style partitionBy layout + partition pruning: a day-filtered
    read must show PartitionFilters in the scan and touch only that
    partition's files — the file-level pruning that makes 100 TB range
    scans cheap."""
    from m12_kafkastreams_python_azure_spark.plans.checks import explain_str

    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").parquet(out)

    back = spark.read.parquet(out)
    one_day = back.filter(F.col("day") == "2024-01-03")
    plan = explain_str(one_day)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), f"no partition filter: {plan[:800]}"
    # correctness: partition column round-trips
    expected = ev.filter(F.col("day") == "2024-01-03").count()
    assert one_day.count() == expected
    assert expected > 0
