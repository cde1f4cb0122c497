"""Scale ladder + replication-invariance probe for the DoReMi pair
(round-16 newcomers ``curation.doremi_weights`` / ``doremi_resample``).

Two claims converted to measured evidence per rung:

- **Invariance (correctness under duplication)**: replicating the whole
  corpus k-fold must leave the WEIGHTS table exactly unchanged apart
  from n_docs scaling by k — the bigram MLE's numerator and denominator
  both scale by k (P(w|h) = k*c_bi / (k*c_w1)), per-doc scores are
  identical, per-domain means are identical, count shares are identical.
  A divergence here means a guard/denominator somewhere is NOT a pure
  ratio (the engine's replicated-corpus-probe discipline — this is how
  the r13 probe caught the mining candidate starvation).
- **Wall ladder**: the dominant cost is the bigram scorer (one explode,
  vocabulary-bounded model broadcasts, one doc-keyed agg); the mixture
  math runs on a |domains|-row table, so wall should grow ~linearly in
  corpus size and never quadratically.

Prints one JSON line.

Usage: python scripts/scale_probe_doremi.py [sf_dir] [max_rung]
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


def replicate(df, times: int):
    out = df
    for i in range(1, times):
        out = out.unionByName(
            df.withColumn("doc_id", F.col("doc_id") + F.lit(i * SHIFT))
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    max_rung = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="scale-probe-doremi")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    )
    base = {
        r[0]: r
        for r in CU.doremi_weights(parallel_scan(docs1)).collect()
    }
    out: dict[str, object] = {
        "sf_dir": sf_dir,
        "docs_1x": docs1.count(),
        "n_domains": len(base),
    }
    top_rung = 1
    for rung in RUNGS:
        if rung > max_rung:
            break
        top_rung = rung
        rep = parallel_scan(replicate(docs1, rung))
        out[f"weights_{rung}x_s"] = timed(
            lambda rep=rep: CU.doremi_weights(rep).count()
        )
        got = {r[0]: r for r in CU.doremi_weights(rep).collect()}
        # replication invariance: same domains, n_docs scales by rung,
        # mean/excess/weight byte-identical (6-decimal published cols)
        ok = set(got) == set(base) and all(
            got[s].n_docs == base[s].n_docs * rung
            and got[s].mean_log2p == base[s].mean_log2p
            and got[s].excess == base[s].excess
            and got[s].weight == base[s].weight
            for s in base
        )
        out[f"weights_{rung}x_invariant"] = ok
        out[f"resample_{rung}x_s"] = timed(
            lambda rep=rep: CU.doremi_resample(rep).count()
        )
    if top_rung > 1 and out.get("weights_1x_s"):
        out[f"weights_{top_rung}x_factor"] = round(
            out[f"weights_{top_rung}x_s"] / out["weights_1x_s"], 1
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
