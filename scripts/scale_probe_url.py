"""Scale ladder + replication probe for URL-level dedup
(round-18 newcomer ``curation.url_dedup``).

Two claims converted to measured evidence per rung:

- **Group-exactness under replication**: url_dedup is canonicalize (a
  pure per-row map) + ONE hash groupBy. Replicating the URL table
  k-fold with UNCHANGED doc_ids (byte-identical raw URLs per replica)
  must leave the canonical group set and every group's kept_doc_id
  EXACTLY unchanged while every n_docs scales exactly k-fold. Any
  divergence means the canonical form or the keep rule depends on
  something besides the row — the op would not be a pure dedup.
- **Wall ladder**: the plan is a narrow canonicalize pass into a single
  partial-aggregated exchange (plan-pinned in
  tests/test_curation.test_url_dedup_plan_is_one_hash_agg), so wall
  should grow ~linearly with NO quadratic cliff; at 100 TB the shuffle
  moves one row per (partition, canonical_url) — the map-side combine
  collapses duplicate-heavy crawls before the wire, exactly the case
  URL dedup exists for.

Prints one JSON line.

Usage: python scripts/scale_probe_url.py [sf_dir] [max_rung]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from m12_kafkastreams_python_azure_spark.operators import curation as CU  # noqa: E402
from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402
from m12_kafkastreams_python_azure_spark.sources.readers import (  # noqa: E402
    load_table,
    parallel_scan,
)

RUNGS = (1, 10, 100)


def replicate(urls, times: int):
    """k-fold replication with UNCHANGED doc_ids: the fixture
    (docs_with_urls, doc_id-residue-driven) is applied BEFORE
    replication so every replica carries byte-identical raw URLs and
    the group structure is exactly preserved."""
    out = urls
    for _ in range(1, times):
        out = out.unionByName(urls)
    return out


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    max_rung = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    spark = get_spark(app_name="url-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = parallel_scan(load_table(spark, sf_dir, "documents"))
    urls = CU.docs_with_urls(base).persist()
    n_docs = urls.count()

    base_groups = {
        r.canonical_url: (r.kept_doc_id, r.n_docs)
        for r in CU.url_dedup(urls).collect()
    }
    result: dict[str, object] = {
        "sf_dir": sf_dir,
        "n_docs_base": n_docs,
        "n_groups": len(base_groups),
    }
    rungs_out = {}
    for rung in [r for r in RUNGS if r <= max_rung]:
        corpus = replicate(urls, rung)
        wall = timed(lambda c=corpus: CU.url_dedup(c).count())
        got = {
            r.canonical_url: (r.kept_doc_id, r.n_docs)
            for r in CU.url_dedup(corpus).collect()
        }
        # group set + keep rule unchanged; counts exactly k-fold
        assert set(got) == set(base_groups), rung
        for cu, (kd, nd) in got.items():
            bk, bn = base_groups[cu]
            assert kd == bk and nd == bn * rung, (rung, cu, kd, nd, bk, bn)
        rungs_out[str(rung)] = {
            "urls": n_docs * rung,
            "groups": len(got),
            "wall_sec": round(wall, 2),
        }
    result["replication_exactness"] = True
    result["rungs"] = rungs_out
    print(json.dumps(result))


if __name__ == "__main__":
    main()
