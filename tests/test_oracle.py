"""Mirror of the driver's correctness gate: run every ``queries()`` entry in
Spark and its ``oracle_sql()`` in DuckDB on the same parquet tables, compare
row counts and order-insensitive values.

Runs at sf0.001 for speed (the driver runs sf0.01); set
``SPARK_GRAFT_TEST_SF`` to point elsewhere.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, int):
        return float(v) if not isinstance(v, bool) else v
    return v


def _canon(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(_norm(vals[i]) for i in order))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    res = con.execute(ORACLES[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _canon(spark_rows, spark_cols)
    d = _canon(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first 3: {mismatches[:3]}"


def test_rows_only_queries_run(spark, sf_dir):
    for name in sorted(set(QUERIES) - set(ORACLES)):
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    cats = {r["stay_category"] for r in rows}
    assert cats <= {
        "Short stay", "Standard stay", "Standard extended stay",
        "Long stay", "Erroneous data",
    }
    for r in rows:
        assert r["distinct_hotels"] <= r["hotels_amount"]
