"""Z-order layout: the multi-dimensional clustering claim is measurable.

Parquet scans prune via per-file/row-group min-max stats. A write sorted by
one column gives tight stats on that column only; the Z-ordered write must
give small bounding rectangles in BOTH dimensions, which is exactly what
lets a selective predicate on either column skip most files at 100 TB.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.sources.layout import (
    ZBITS,
    interleave_bits,
    zorder_by,
)
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

N_FILES = 8


def _norm_area(files: list[str], lo_u, hi_u, lo_v, hi_v) -> float:
    """Mean normalized bounding-rectangle area across files: for each file,
    (user_id range x value range) as a fraction of the full 2-D domain.
    1.0 = every file spans everything (no skipping possible); small =
    selective predicates on either column hit few files."""
    areas = []
    for f in files:
        md = pq.read_metadata(f)
        mins = {"user_id": None, "value": None}
        maxs = {"user_id": None, "value": None}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in mins and col.statistics is not None:
                    s = col.statistics
                    mins[name] = s.min if mins[name] is None else min(mins[name], s.min)
                    maxs[name] = s.max if maxs[name] is None else max(maxs[name], s.max)
        du = (maxs["user_id"] - mins["user_id"]) / (hi_u - lo_u)
        dv = (maxs["value"] - mins["value"]) / (hi_v - lo_v)
        areas.append(du * dv)
    return sum(areas) / len(areas)


def test_zorder_write_clusters_both_dimensions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()

    base = str(tmp_path / "unordered")
    zord = str(tmp_path / "zordered")
    # baseline: same file count, arrival order (round-robin) — the layout
    # a naive ingest produces
    ev.repartition(N_FILES).write.parquet(base)
    zorder_by(ev, "user_id", "value", num_files=N_FILES).write.parquet(zord)

    a_base = _norm_area(glob.glob(f"{base}/*.parquet"), lo_u, hi_u, lo_v, hi_v)
    a_zord = _norm_area(glob.glob(f"{zord}/*.parquet"), lo_u, hi_u, lo_v, hi_v)
    # unordered files each span ~the whole domain; z-ordered files must
    # cover a small rectangle — at least 2x smaller on average, typically
    # far more (observed ~0.1 vs ~1.0 at sf0.001).
    assert a_base > 0.5, f"baseline unexpectedly clustered: {a_base}"
    assert a_zord < a_base / 2, (
        f"z-order did not shrink file bounding areas: {a_zord} vs {a_base}"
    )

    # and the layout is lossless: a 2-D selective read returns the same
    # rows as filtering the original
    pred = (F.col("user_id") < (lo_u + hi_u) / 2) & (
        F.col("value") > (lo_v + hi_v) / 2
    )
    got = sorted(
        r["event_id"]
        for r in spark.read.parquet(zord).filter(pred).collect()
    )
    want = sorted(r["event_id"] for r in ev.filter(pred).collect())
    assert got == want and len(got) > 0


def test_interleave_bits_is_monotone_grid_bijection(spark):
    """Morton key sanity: distinct cells map to distinct keys, and the key
    of (a, b) bounds the grid: 2^(2*ZBITS) - 1 max."""
    grid = spark.range(0, 1 << ZBITS).selectExpr("id AS a").crossJoin(
        spark.range(0, 16).selectExpr("id AS b")
    )
    keyed = grid.select(
        "a", "b", interleave_bits(F.col("a"), F.col("b")).alias("z")
    )
    n = keyed.count()
    assert keyed.select("z").distinct().count() == n  # injective
    mx = keyed.agg(F.max("z")).first()[0]
    assert mx < (1 << (2 * ZBITS))


@pytest.mark.parametrize("a,b,expected", [(0, 0, 0), (1, 0, 1), (0, 1, 2),
                                          (1, 1, 3), (255, 255, 65535)])
def test_interleave_bits_known_values(spark, a, b, expected):
    row = (
        spark.range(1)
        .select(interleave_bits(F.lit(a), F.lit(b)).alias("z"))
        .first()
    )
    assert row["z"] == expected
