"""Scale ladder + replication probe for C4 line-level cleaning
(round-17 newcomer ``curation.c4_line_filter``).

Two claims converted to measured evidence per rung:

- **Per-doc determinism under replication**: c4_line_filter is a pure
  per-row map+filter — replicating the corpus k-fold (shifted doc_ids,
  same texts) must produce exactly k times the kept rows, with every
  replica's (n_lines, n_kept, clean_text) identical to its original's.
  Any divergence means corpus-level state leaked into what is claimed
  to be a narrow pass.
- **Wall ladder**: the plan is one WholeStageCodegen project+filter
  over the scan (no Exchange — plan-pinned in tests/test_c4.py), so
  wall should grow ~linearly in corpus size with NO shuffle cliff at
  any rung; at 100 TB it runs at scan speed on every executor
  independently.

Prints one JSON line.

Usage: python scripts/scale_probe_c4.py [sf_dir] [max_rung]
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
SHIFT = 10_000_000


def replicate(docs, times: int):
    """k-fold replication with shifted doc_ids. The fixture
    (docs_with_planted_lines, doc_id-residue-driven) is applied BEFORE
    replication, so every replica carries byte-identical line-structured
    text and the filter — which never looks at doc_id — must treat each
    band identically."""
    out = docs
    for i in range(1, times):
        out = out.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
        )
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
    spark = get_spark(app_name="c4-probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    base = parallel_scan(load_table(spark, sf_dir, "documents"))
    # fixture once, then replicate the LINE-STRUCTURED text so every
    # replica is byte-identical per doc (residue-safe: the planted lines
    # are already in the text; only the filter's doc_id-independent line
    # rules run downstream)
    lined = CU.docs_with_planted_lines(base).persist()
    n_docs = lined.count()

    result: dict[str, object] = {"sf_dir": sf_dir, "n_docs_base": n_docs}
    base_kept = CU.c4_line_filter(lined).count()
    rungs_out = {}
    for rung in [r for r in RUNGS if r <= max_rung]:
        corpus = replicate(lined, rung)
        wall = timed(lambda c=corpus: CU.c4_line_filter(c).count())
        kept = CU.c4_line_filter(corpus).count()
        # pure per-row pass: kept rows must scale EXACTLY k-fold
        assert kept == base_kept * rung, (rung, kept, base_kept)
        rungs_out[str(rung)] = {
            "docs": n_docs * rung,
            "kept": kept,
            "wall_sec": round(wall, 2),
        }
    # value identity across one replica band (replica 1 vs originals)
    if max_rung >= 10:
        two = replicate(lined, 2)
        out = CU.c4_line_filter(two)
        a = out.filter(F.col("doc_id") < SHIFT)
        b = out.filter(F.col("doc_id") >= SHIFT).withColumn(
            "doc_id", F.col("doc_id") - F.lit(SHIFT)
        )
        diff = a.exceptAll(b).count() + b.exceptAll(a).count()
        assert diff == 0, f"replica band diverged: {diff} rows"
        result["replica_value_identity"] = True
    result["rungs"] = rungs_out
    print(json.dumps(result))


if __name__ == "__main__":
    main()
