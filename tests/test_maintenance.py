"""Table maintenance: MERGE-style upsert and small-file compaction."""

from __future__ import annotations

import glob

import pytest

from m12_kafkastreams_python_azure_spark.sources.maintenance import (
    compact_parquet,
    delete_keys,
    merge_upsert,
)


def test_merge_upsert_replaces_and_inserts(spark, tmp_path):
    t = str(tmp_path / "t0")
    out = str(tmp_path / "t1")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, score double",
    ).write.parquet(t)
    updates = spark.createDataFrame(
        [(2, "b2", 25.0), (4, "d", 40.0)], "id long, name string, score double"
    )
    merge_upsert(spark, t, updates, "id", out)
    got = {r.id: (r.name, r.score) for r in spark.read.parquet(out).collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 25.0), 3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_upsert_rejects_duplicate_keys(spark, tmp_path):
    t = str(tmp_path / "t0")
    spark.createDataFrame([(1, "a")], "id long, name string").write.parquet(t)
    dup = spark.createDataFrame([(2, "x"), (2, "y")], "id long, name string")
    with pytest.raises(ValueError, match="duplicate"):
        merge_upsert(spark, t, dup, "id", str(tmp_path / "t1"))


def test_merge_upsert_into_empty_target(spark, tmp_path):
    out = str(tmp_path / "t1")
    updates = spark.createDataFrame([(1, "a")], "id long, name string")
    merge_upsert(spark, str(tmp_path / "missing"), updates, "id", out)
    assert spark.read.parquet(out).count() == 1


def test_compact_parquet_reduces_files_keeps_rows(spark, tmp_path):
    src = str(tmp_path / "frag")
    out = str(tmp_path / "compact")
    spark.range(1000).repartition(16).write.parquet(src)
    assert len(glob.glob(f"{src}/part-*.parquet")) == 16
    compact_parquet(spark, src, out, target_files=2)
    assert len(glob.glob(f"{out}/part-*.parquet")) <= 2
    assert spark.read.parquet(out).count() == 1000


def test_delete_keys_removes_only_listed(spark, tmp_path):
    from m12_kafkastreams_python_azure_spark.sources.maintenance import delete_keys

    t, out = str(tmp_path / "t"), str(tmp_path / "t2")
    spark.createDataFrame(
        [(i, f"u{i}") for i in range(10)], "user_id long, name string"
    ).write.parquet(t)
    doomed = spark.createDataFrame([(3,), (7,), (99,)], "user_id long")
    n = delete_keys(spark, t, doomed, "user_id", out)
    assert n == 2  # 99 didn't exist
    left = {r.user_id for r in spark.read.parquet(out).collect()}
    assert left == set(range(10)) - {3, 7}


def test_schema_evolution_merge_on_read(spark, tmp_path):
    """Schema evolution: a later batch adds a column; mergeSchema unifies
    and back-fills nulls for the old files — the append-only evolution
    pattern an ingest pipeline needs."""
    d = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    ).write.parquet(d)
    spark.createDataFrame(
        [(3, "c", 0.9)], "id long, name string, score double"
    ).write.mode("append").parquet(d)
    merged = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows[3] == 0.9 and rows[1] is None and rows[2] is None


def test_merge_upsert_schema_evolution(spark, tmp_path):
    """Additive evolution: an update set carrying a NEW column merges with
    the old target (old rows get NULL for the new column); without the
    flag, drift raises at analysis time instead of silently degrading."""
    import pytest as _pytest
    from pyspark.sql.utils import AnalysisException

    target_dir = str(tmp_path / "t")
    out1 = str(tmp_path / "o1")
    out2 = str(tmp_path / "o2")
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").write.parquet(target_dir)
    updates = spark.createDataFrame([(2, "B", 9.5)], "k long, v string, score double")

    with _pytest.raises(AnalysisException):
        merge_upsert(spark, target_dir, updates, "k", out1)

    merge_upsert(spark, target_dir, updates, "k", out2, allow_schema_evolution=True)
    got = {r.k: (r.v, r.score) for r in spark.read.parquet(out2).collect()}
    assert got == {1: ("a", None), 2: ("B", 9.5)}


def test_self_overwrite_guards(spark, tmp_path):
    """Every rewrite primitive must refuse out_dir == input dir — including
    the same directory spelled with and without a file:// scheme."""
    import pytest as _pytest

    d = str(tmp_path / "t2")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(d)
    updates = spark.createDataFrame([(1, "b")], "k long, v string")
    keys = spark.createDataFrame([(1,)], "k long")
    for call in (
        lambda: merge_upsert(spark, d, updates, "k", d),
        lambda: merge_upsert(spark, "file://" + d, updates, "k", d),
        lambda: compact_parquet(spark, d, d),
        lambda: delete_keys(spark, d, keys, "k", "file://" + d),
    ):
        with _pytest.raises(ValueError, match="must differ"):
            call()
