"""Mirror of the driver's correctness gate: run every ``queries()`` entry in
Spark and its ``oracle_sql()`` in DuckDB on the same parquet tables, compare
row counts and order-insensitive values.

Runs at sf0.001 for speed (the driver runs sf0.01); set
``SPARK_GRAFT_TEST_SF`` to point elsewhere.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)
import __spark_entry__ as entrymod
from oracle_sweep import compare_frames

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


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, sf_dir, name):
    """TYPE-STRICT compare through pandas, matching the driver's value-hash
    path: DuckDB HUGEINT/DECIMAL surface as float64 through `.df()` and
    must mismatch a Spark int64 (the class of bug that costs a driver
    hash). Delegates to scripts/oracle_sweep.compare_frames so the CI test
    and the standalone sweep cannot drift apart."""
    spdf = QUERIES[name](spark, sf_dir).toPandas()
    spdf.columns = [c.lower() for c in spdf.columns]
    con = _duck(sf_dir)
    ddf = con.execute(ORACLES[name]).df()
    ddf.columns = [c.lower() for c in ddf.columns]
    con.close()
    err = compare_frames(spdf, ddf)
    assert err is None, f"{name}: {err}"


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
