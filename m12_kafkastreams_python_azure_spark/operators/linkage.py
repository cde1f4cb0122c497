"""Record linkage: blocked fuzzy matching — the O(n²)-killer pattern.

Entity resolution at 100 TB never compares all pairs. The standard shape:

1. derive a cheap BLOCKING KEY (here: the name's last-4-character suffix;
   phonetic codes, sorted token prefixes, or LSH buckets in richer
   settings),
2. equi-join on the block key (a plain shuffle join — no cartesian),
3. verify candidates with the expensive measure (Levenshtein) inside the
   block only.

Cost drops from |L|x|R| to sum over blocks of |L_b|x|R_b|. Block-key
choice is the whole game: TPC-H customer names share the literal prefix
``Customer#`` — a PREFIX block would put every row in one mega block
(quadratic again), while the numeric SUFFIX is near-unique, giving O(1)
blocks. The suffix is also invariant under the planted corruption
(a single character deletion before the suffix shifts positions but not
the trailing characters), so recall on planted pairs is exactly 1.0.

The synthetic corpus has no naturally dirty twin, so the query derives one
deterministically: every customer name gets one character deleted at a
key-dependent position. The linkage must re-find the (custkey, custkey)
identity pairs purely from the strings — recall is checkable exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table

BLOCK_SUFFIX = 4  # block on the last 4 chars of the name
MAX_EDIT = 2
MAX_BLOCK = 1000  # per-side, per-salt-cell row cap inside one block


def perturbed_names(cust: DataFrame) -> DataFrame:
    """Deterministic dirty twin: delete the character at 1-based position
    (custkey % 8) + 2 of c_name (inside the 'Customer#' prefix region —
    where real-world typos in structured names land)."""
    dirty = F.concat(
        F.expr("substring(c_name, 1, CAST(c_custkey % 8 + 1 AS INT))"),
        F.expr("substring(c_name, CAST(c_custkey % 8 + 3 AS INT), 10000)"),
    )
    return cust.select(
        F.col("c_custkey").alias("r_key"),
        dirty.alias("r_name"),
    )


def _salted_candidates(
    lb: DataFrame, rb: DataFrame, max_block: int
) -> DataFrame:
    """Grid-salted block join (the mega-block guard, VERDICT r12 #5).

    A hot block (many rows sharing one suffix) makes the plain
    ``join(rb, "blk")`` emit |L_b| x |R_b| candidate pairs INSIDE ONE
    JOIN KEY. AQE's skew-join split parallelizes the hot key's scan
    ranges (measured: a planted 4k x 4k block runs at the same wall
    either way), but every split task still sort-merge-BUFFERS the
    entire right-side group of that key — per-key state AQE never
    bounds, and the piece that spills once a hot key outgrows executor
    memory at real scale. Exact linkage cannot borrow
    ``dedup.star_pairs``'s linear overflow: near-dup clustering only
    needs the block to stay CONNECTED, while linkage's output contract
    is every verified pair, so dropping in-block pairs changes the
    answer. What CAN be bounded without touching the output is the
    per-task volume: each side of a block is split into
    ceil(n/max_block) deterministic salt groups and each side explodes
    across the OTHER side's salt range, so the join key becomes
    (blk, salt_l, salt_r) and a cell carries ~max_block rows per side
    (uniform xxhash64 salting; the planted-mega-block test pins a 2x
    slack bound) — total work is unchanged (inherent to exact
    linkage; shrinking it is a recall policy — block purging or key
    refinement — not an execution concern), but it now spreads across
    ceil(|L_b|/max_block) * ceil(|R_b|/max_block) parallel tasks instead
    of pinning one. Small blocks get salt counts of 1 and take this
    path untouched — same pairs, same single cell.

    The guard's steady-state cost is two blk-keyed count aggs (map-side
    combined partial counts — key traffic only) whose results are
    FILTERED to the oversized blocks before the join-back: hot blocks
    are at most n/max_block and in practice a handful, so AQE broadcasts
    the filtered side and healthy rows never pay a per-row shuffle for
    the guard (the unconditional join-back spelling cost 3x on the
    bench's all-healthy corpus). LEFT-join misses mean 'block under the
    cap' and coalesce to a single cell."""
    lc_hot = (
        lb.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("_nl"))
        .filter(F.col("_nl") > max_block)
    )
    rc_hot = (
        rb.groupBy("blk")
        .agg(F.count(F.lit(1)).alias("_nr"))
        .filter(F.col("_nr") > max_block)
    )
    n_salt_l = F.coalesce(
        F.ceil(F.col("_nl") / max_block).cast("int"), F.lit(1)
    )
    n_salt_r = F.coalesce(
        F.ceil(F.col("_nr") / max_block).cast("int"), F.lit(1)
    )
    ls = (
        lb.join(lc_hot, "blk", "left")
        .join(rc_hot, "blk", "left")
        .withColumn("_salt_l", F.pmod(F.xxhash64("l_key"), n_salt_l).cast("int"))
        .withColumn("_salt_r", F.explode(F.sequence(F.lit(0), n_salt_r - 1)))
        .drop("_nl", "_nr")
    )
    rs = (
        rb.join(rc_hot, "blk", "left")
        .join(lc_hot, "blk", "left")
        .withColumn("_salt_r", F.pmod(F.xxhash64("r_key"), n_salt_r).cast("int"))
        .withColumn("_salt_l", F.explode(F.sequence(F.lit(0), n_salt_l - 1)))
        .drop("_nl", "_nr")
    )
    return ls.join(rs, ["blk", "_salt_l", "_salt_r"])


def blocked_link(
    left: DataFrame, right: DataFrame, max_block: int = MAX_BLOCK
) -> DataFrame:
    """Blocked fuzzy join: suffix-block equi-join then Levenshtein
    verify, with the grid-salt guard bounding any one block's join cell
    to ``max_block`` rows per side (see ``_salted_candidates``)."""
    lb = left.withColumn("blk", F.expr(f"right(l_name, {BLOCK_SUFFIX})"))
    rb = right.withColumn("blk", F.expr(f"right(r_name, {BLOCK_SUFFIX})"))
    cand = _salted_candidates(lb, rb, max_block)
    return (
        cand.withColumn("dist", F.levenshtein("l_name", "r_name"))
        .filter(F.col("dist") <= MAX_EDIT)
        .select("l_key", "r_key", "dist")
    )


def q_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link clean customer names to their perturbed twins; return matched
    pairs with edit distance plus a correctness marker (is_true_match =
    the keys agree — the planted ground truth; every true pair must
    surface because the suffix block key survives the corruption)."""
    cust = load_table(spark, sf_dir, "customer")
    left = cust.select(
        F.col("c_custkey").alias("l_key"), F.col("c_name").alias("l_name")
    )
    right = perturbed_names(cust)
    return blocked_link(left, right).select(
        "l_key",
        "r_key",
        "dist",
        (F.col("l_key") == F.col("r_key")).alias("is_true_match"),
    )


ORACLE_RECORD_LINKAGE = f"""
WITH left_side AS (
  SELECT c_custkey AS l_key, c_name AS l_name,
         right(c_name, {BLOCK_SUFFIX}) AS blk
  FROM customer
),
right_side AS (
  SELECT c_custkey AS r_key,
         substring(c_name, 1, CAST(c_custkey % 8 + 1 AS INT))
           || substring(c_name, CAST(c_custkey % 8 + 3 AS INT), 10000)
           AS r_name
  FROM customer
),
right_blocked AS (
  SELECT r_key, r_name, right(r_name, {BLOCK_SUFFIX}) AS blk
  FROM right_side
)
SELECT l.l_key, r.r_key,
       CAST(levenshtein(l.l_name, r.r_name) AS INTEGER) AS dist,
       l.l_key = r.r_key AS is_true_match
FROM left_side l JOIN right_blocked r USING (blk)
WHERE levenshtein(l.l_name, r.r_name) <= {MAX_EDIT}
"""
