"""Table-maintenance operators: batch upsert (MERGE-style) and small-file
compaction over plain parquet directories.

Plain OSS Spark has no transactional MERGE on parquet (that's Delta/Iceberg
territory); these give the pipeline the two maintenance primitives it
actually needs, with the same rewrite discipline those formats use under
the hood:

- **Upsert**: new version of a keyed row replaces the old; implemented as
  ``target ANTI-JOIN updates  UNION  updates`` written to a new directory —
  the updates side is usually small, so the anti-join broadcasts it and the
  big side streams through untouched.
- **Compaction**: streaming sinks and per-batch appends produce small
  files; a periodic coalesce-rewrite restores scan efficiency (fewer
  tasks, bigger row groups). At 100 TB you compact per partition-dir.

Both write to a NEW directory and leave the source intact — the atomic
swap (rename / pointer flip) belongs to whatever catalog sits above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fs import dir_has_data, same_location


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    updates: DataFrame,
    key_col: str,
    out_dir: str,
    allow_schema_evolution: bool = False,
) -> None:
    """MERGE semantics on parquet: rows in ``updates`` replace target rows
    with the same key; unmatched update rows are inserts. If several update
    rows share a key, the caller must have deduplicated (asserted here —
    silent last-writer-wins hides bugs).

    ``allow_schema_evolution=True`` is the Delta-style ADDITIVE evolution:
    columns present on only one side come through as NULLs on the other
    (``unionByName(allowMissingColumns=True)``) — new columns appear, old
    ones are never dropped. Default False: any schema drift raises at
    analysis time, which is the right contract for a pinned-schema table."""
    dup = updates.groupBy(key_col).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(f"updates contain duplicate {key_col} values")
    if same_location(spark, out_dir, target_dir):
        # The overwrite write reads target_dir lazily mid-write — writing
        # onto the input would corrupt it. A catalog pointer-flip is the
        # caller's job; we only ever write fresh directories. (Scheme-aware
        # compare: 'file:///x' and '/x' are the same directory.)
        raise ValueError("out_dir must differ from target_dir")
    if dir_has_data(spark, target_dir):
        # Only a genuinely-missing target means "pure insert". Schema
        # mismatches (unionByName) and IO errors must propagate — silently
        # degrading to insert would drop every non-updated target row.
        target = spark.read.parquet(target_dir)
        kept = target.join(F.broadcast(updates.select(key_col)), key_col, "left_anti")
        merged = kept.unionByName(
            updates, allowMissingColumns=allow_schema_evolution
        )
    else:
        merged = updates  # no target yet: pure insert
    merged.write.mode("overwrite").parquet(out_dir)


#: Back-compat alias — the canonical home is sources.fs (shared with the
#: streaming dedup; it is generic filesystem logic, not maintenance logic).
_dir_has_data = dir_has_data


def compact_parquet(
    spark: SparkSession, src_dir: str, out_dir: str, target_files: int = 4
) -> None:
    """Rewrite a fragmented parquet dir into ``target_files`` files.
    ``coalesce`` (not repartition) — no shuffle, just fewer write tasks."""
    if same_location(spark, out_dir, src_dir):
        raise ValueError("out_dir must differ from src_dir")
    spark.read.parquet(src_dir).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(out_dir)


def delete_keys(
    spark: SparkSession,
    target_dir: str,
    keys: DataFrame,
    key_col: str,
    out_dir: str,
) -> int:
    """Targeted row deletion (the right-to-be-forgotten primitive): rewrite
    the table without any row whose key appears in ``keys``. The key list
    broadcasts; the table streams through one anti-join. Returns the number
    of rows deleted."""
    if same_location(spark, out_dir, target_dir):
        raise ValueError("out_dir must differ from target_dir")
    target = spark.read.parquet(target_dir)
    kept = target.join(
        F.broadcast(keys.select(key_col).distinct()), key_col, "left_anti"
    )
    kept.write.mode("overwrite").parquet(out_dir)
    return target.count() - spark.read.parquet(out_dir).count()
