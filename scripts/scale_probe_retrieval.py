"""Scale ladder for the hybrid RRF retrieval pair (VERDICT r14 #4):
the single-seed operator pays one O(n*dim) dense pass PER SEED, so a
production mining run with S seeds pays S corpus scans; the batched
``hybrid_rrf_multi`` pays ONE scan against a broadcast seed table.

Two measurements per rung (documents AND embeddings replicated
together, shifted ids):

- ``single_xS``: ``hybrid_rrf_multi(n_seeds=S)`` vs S sequential
  ``hybrid_rrf_retrieval``-shaped per-seed scans — the batching win at
  fixed corpus size;
- the 1x/10x/100x wall ladder for the batched spelling — corpus-growth
  behavior (the dense pass is linear in n; the salted two-phase head
  keeps per-task rank state at ~n/SALT_P).

Prints one JSON line.

Usage: python scripts/scale_probe_retrieval.py [sf_dir] [max_rung]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from m12_kafkastreams_python_azure_spark.operators import retrieval as R  # noqa: E402
from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402
from m12_kafkastreams_python_azure_spark.sources.readers import (  # noqa: E402
    load_table,
    parallel_scan,
)

RUNGS = (1, 10, 100)
SHIFT = 10_000_000


def replicate(df, id_col: str, times: int):
    out = df
    for i in range(1, times):
        out = out.unionByName(
            df.withColumn(id_col, F.col(id_col) + F.lit(i * SHIFT))
        )
    return out


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_rung = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="scale-probe-retrieval")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb1 = load_table(spark, sf_dir, "embeddings")
    out: dict[str, object] = {
        "sf_dir": sf_dir,
        "docs_1x": docs1.count(),
        "vecs_1x": emb1.count(),
        "n_seeds": R.RRF_SEEDS,
    }
    # batching win at 1x: S per-seed scans vs one batched scan
    docs = parallel_scan(docs1)
    emb = parallel_scan(emb1)
    out["single_x_seeds_s"] = timed(
        lambda: [
            # S independent single-seed runs approximate a naive mining
            # loop; each pays its own full dense pass. Seed selection
            # differs per run only in which lex hit seeds it, so the
            # dense-scan cost (the object of the measurement) is
            # identical across seeds.
            R.hybrid_rrf_retrieval(docs, emb).count()
            for _ in range(R.RRF_SEEDS)
        ]
    )
    out["multi_batched_s"] = timed(
        lambda: R.hybrid_rrf_multi(docs, emb).count()
    )
    out["batching_speedup"] = round(
        out["single_x_seeds_s"] / out["multi_batched_s"], 2
    )
    # corpus-growth ladder for the batched spelling
    top_rung = 1
    for rung in RUNGS:
        if rung > max_rung:
            break
        top_rung = rung
        d = parallel_scan(replicate(docs1, "doc_id", rung))
        e = parallel_scan(replicate(emb1, "vec_id", rung))
        out[f"multi_{rung}x_s"] = timed(
            lambda d=d, e=e: R.hybrid_rrf_multi(d, e).count()
        )
    # growth-factor key named from the rung that actually RAN (ADVICE
    # r15: a hardcoded multi_100x_factor reported a 10x ladder's growth
    # under a 100x name when max_rung < 100)
    if "multi_1x_s" in out and f"multi_{top_rung}x_s" in out and top_rung > 1:
        t1 = out["multi_1x_s"]
        tN = out[f"multi_{top_rung}x_s"]
        out[f"multi_{top_rung}x_factor"] = round(tN / t1, 1) if t1 else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
