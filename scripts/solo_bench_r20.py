"""Time individual headline queries with bench.py's exact methodology
(best-of-3-to-6 converged min, caches cleared between queries) without
running the whole suite — the round-20 optimization measurement loop.

Usage: python scripts/solo_bench_r20.py q1 [q2 ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
import __spark_entry__ as entrymod  # noqa: E402
from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: solo_bench_r20.py <query> [query ...]")
    spark = get_spark(app_name="solo-bench-r20")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()
    # the bench's standard warm-up (JIT + Python-worker spin-up)
    queries["hotels_count"](spark, bench.SF_DIR).count()
    spark.range(0, 64, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).count()
    timings, errors, runmeta = bench.run_headline(spark, queries, names)
    print(json.dumps(
        {"timings": timings, "errors": errors, "runmeta": runmeta,
         "sf_dir": bench.SF_DIR},
        indent=1,
    ))


if __name__ == "__main__":
    main()
