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


def blocked_link(left: DataFrame, right: DataFrame) -> DataFrame:
    """Blocked fuzzy join: suffix-block equi-join then Levenshtein verify."""
    lb = left.withColumn("blk", F.expr(f"right(l_name, {BLOCK_SUFFIX})"))
    rb = right.withColumn("blk", F.expr(f"right(r_name, {BLOCK_SUFFIX})"))
    cand = lb.join(rb, "blk")
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
