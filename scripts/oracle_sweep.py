"""Local mirror of the driver's correctness gate, TYPE-STRICT.

Runs every ``__spark_entry__.queries()`` entry in Spark and its
``oracle_sql()`` in DuckDB over the same parquet tables, then compares:

- column-name sets (case-insensitive)
- row counts
- pandas dtype *kind* per column (int vs float mismatch = FAIL — this is
  what the driver's value hash catches: DuckDB sum(int) is HUGEINT which
  surfaces as float64 through pandas, while Spark BIGINT stays int64)
- values (order-insensitive, floats rounded to 6 places)

Usage: python scripts/oracle_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # single-file tiers (testdata/sf*) are plain files; the derived
        # sf1 tier (scripts/gen_sf1.py) is Spark-written DIRECTORIES of
        # part files — DuckDB needs the glob form for those
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def norm_val(v):
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return None
    # Dates/timestamps: the driver's hash treated Spark date == DuckDB
    # midnight-timestamp as equal in r01 — normalize both to ISO date when
    # the time-of-day is zero.
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        if v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return round(float(v), 6)
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return round(f, 6)
    if isinstance(v, (int, np.integer)) and not isinstance(v, bool):
        return int(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_val(x) for x in v)
    return v


def canon(df):
    cols = sorted(df.columns)
    rows = [tuple(norm_val(v) for v in row) for row in df[cols].itertuples(index=False)]
    return cols, sorted(rows, key=repr)


def dtype_kinds(df):
    return {c.lower(): df[c].dtype.kind for c in df.columns}


def compare_frames(spdf, ddf) -> str | None:
    """Type-strict compare of a Spark-result DataFrame (toPandas) against a
    DuckDB-result DataFrame (.df()), both already lower-cased on columns.
    Returns None on match, else a short failure description. Importable by
    tests (tests/test_oracle.py) so CI applies the same strictness as the
    driver's value hash."""
    if sorted(spdf.columns) != sorted(ddf.columns):
        return f"cols spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}"
    if len(spdf) != len(ddf):
        return f"rows spark={len(spdf)} duck={len(ddf)}"
    sk, dk = dtype_kinds(spdf), dtype_kinds(ddf)
    tmis = [
        c for c in sk
        if {sk[c], dk[c]} == {"i", "f"} and not spdf[c].isna().any() and not ddf[c].isna().any()
    ]
    if tmis:
        return f"TYPE mismatch (int vs float): {[(c, sk[c], dk[c]) for c in tmis]}"
    _, srows = canon(spdf)
    _, drows = canon(ddf)
    bad = [(a, b) for a, b in zip(srows, drows) if a != b]
    if bad:
        return f"{len(bad)} value mismatches; first: {bad[:2]}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from m12_kafkastreams_python_azure_spark.session import get_spark

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark(app_name="oracle-sweep", shuffle_partitions=16)

    results = {}
    names = [n for n in queries if not only or n in only]
    for name in names:
        out = {"pass": False, "err": None, "notes": []}
        try:
            sdf = queries[name](spark, sf_dir)
            spdf = sdf.toPandas()
            spdf.columns = [c.lower() for c in spdf.columns]
            if name not in oracles:
                out["pass"] = True
                out["notes"].append(f"rows-only: {len(spdf)} rows")
                results[name] = out
                spark.catalog.clearCache()
                print(f"{name}: ROWS-ONLY {len(spdf)}", flush=True)
                continue
            con = duck_con(sf_dir)
            ddf = con.execute(oracles[name]).df()
            ddf.columns = [c.lower() for c in ddf.columns]
            con.close()

            err = compare_frames(spdf, ddf)
            if err is None:
                out["pass"] = True
            else:
                out["err"] = err
        except Exception as e:  # noqa: BLE001
            out["err"] = f"{type(e).__name__}: {e}"[:500]
        results[name] = out
        spark.catalog.clearCache()
        print(f"{name}: {'PASS' if out['pass'] else 'FAIL ' + str(out['err'])[:200]}", flush=True)

    fails = {n: r["err"] for n, r in results.items() if not r["pass"]}
    print(json.dumps({"total": len(results), "fail": len(fails), "failures": fails}, indent=2))
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
