"""blocked_link's mega-block guard (VERDICT r12 #5): a planted hot
block must spread across bounded grid-salt cells without changing the
output by one pair."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import linkage as LK

N_MEGA = 1500  # rows per side sharing ONE block suffix
CAP = 200


def _mega_block_sides(spark):
    """Every name ends with the same 4-char suffix 'CORP' — the
    degenerate generic-key case (all rows in one block). Rights are the
    lefts with one mid-name character deleted (dist 1 to their own
    left, >=1 to others)."""
    left = spark.range(N_MEGA).select(
        F.col("id").alias("l_key"),
        F.format_string("Name %05d holdings CORP", F.col("id")).alias("l_name"),
    )
    right = spark.range(N_MEGA).select(
        F.col("id").alias("r_key"),
        F.concat(
            F.lit("Name "),
            F.format_string("%05d", F.col("id")),
            F.lit(" holding CORP"),  # 'holdings' -> 'holding': one deletion
        ).alias("r_name"),
    )
    return left, right


def test_mega_block_output_identical_to_unguarded(spark):
    """Grid salting is output-transparent: the guarded pair set must be
    byte-identical to a single-cell run, with every planted identity
    pair present at dist 1."""
    left, right = _mega_block_sides(spark)
    guarded = sorted(
        map(tuple, LK.blocked_link(left, right, max_block=CAP).collect())
    )
    single_cell = sorted(
        map(tuple, LK.blocked_link(left, right, max_block=10**9).collect())
    )
    assert guarded == single_cell
    identity = {(a, b) for a, b, _ in guarded if a == b}
    assert identity == {(i, i) for i in range(N_MEGA)}


def test_mega_block_cells_are_bounded_and_plural(spark):
    """The guard's mechanism: the planted block must split into
    ceil(n/cap)^2 salt cells, each carrying ~cap rows per side (2x
    slack for hash unevenness) — no cell big enough to pin a task."""
    left, right = _mega_block_sides(spark)
    lb = left.withColumn("blk", F.expr(f"right(l_name, {LK.BLOCK_SUFFIX})"))
    rb = right.withColumn("blk", F.expr(f"right(r_name, {LK.BLOCK_SUFFIX})"))
    cells = (
        LK._salted_candidates(lb, rb, CAP)
        .groupBy("blk", "_salt_l", "_salt_r")
        .count()
        .collect()
    )
    import math

    n_salt = math.ceil(N_MEGA / CAP)
    assert len(cells) == n_salt * n_salt
    assert sum(r["count"] for r in cells) == N_MEGA * N_MEGA
    assert max(r["count"] for r in cells) <= (2 * CAP) ** 2


def test_small_blocks_take_the_single_cell_path(spark):
    """Blocks under the cap must get salt counts of 1 — the guard is a
    no-op on healthy block keys (the TPC-H suffix case)."""
    left = spark.createDataFrame(
        [(i, f"Alpha xx {i:04d}") for i in range(20)], "l_key long, l_name string"
    )
    right = spark.createDataFrame(
        [(i, f"Alpha x {i:04d}") for i in range(20)], "r_key long, r_name string"
    )
    lb = left.withColumn("blk", F.expr(f"right(l_name, {LK.BLOCK_SUFFIX})"))
    rb = right.withColumn("blk", F.expr(f"right(r_name, {LK.BLOCK_SUFFIX})"))
    cand = LK._salted_candidates(lb, rb, LK.MAX_BLOCK)
    salts = cand.select("_salt_l", "_salt_r").distinct().collect()
    assert [(r["_salt_l"], r["_salt_r"]) for r in salts] == [(0, 0)]
