"""100x rung for hard_negative_mining_ivf (VERDICT r12 #7 — the one
heavy round-11 newcomer without a ladder row).

Replicates sf0.1 embeddings 1x/10x/100x with shifted vec_ids (the 10M
shift is divisible by 10, so the every-10th anchor contract is
preserved — anchors grow WITH the corpus, the corpus-proportional-query
shape documented for knn_label_vote_ivf in docs/SCALE.md round 8).
Per rung: the IVF index is built+persisted by an untimed warm call (the
offline-build discipline bench.py uses for knn_label_vote_ivf), then
the mining query — load + pruned probe + label filter + re-rank — is
timed best-of-2. Prints one JSON line with walls, anchor counts, output
rows, and per-anchor milliseconds (the number that must stay ~flat for
the design to hold; total wall cannot — both sides grow).

Usage: python scripts/scale_probe_mining.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from m12_kafkastreams_python_azure_spark.operators import mining as MN  # noqa: E402
from m12_kafkastreams_python_azure_spark.operators.ivf import (  # noqa: E402
    default_nprobe,
)
from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402
from m12_kafkastreams_python_azure_spark.sources.readers import (  # noqa: E402
    load_table,
    parallel_scan,
)

RUNGS = (1, 10, 100)
SHIFT = 10_000_000  # % 10 == 0: replicas keep anchor membership


def replicate(emb, times: int):
    out = emb
    for i in range(1, times):
        out = out.unionByName(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * SHIFT))
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="scale-probe-mining")
    spark.sparkContext.setLogLevel("ERROR")
    emb1 = load_table(spark, sf_dir, "embeddings")
    out: dict[str, object] = {"sf_dir": sf_dir, "vectors_1x": emb1.count()}
    k = MN.HARD_NEG_K
    nprobe = default_nprobe(k * MN.HARD_NEG_OVERSAMPLE)
    work = tempfile.mkdtemp(prefix="mining_probe_")
    try:
        for rung in RUNGS:
            emb = parallel_scan(replicate(emb1, rung))
            anchors = emb.filter(F.col("vec_id") % 10 == 0)
            idx = f"{work}/ivf_{rung}x"

            def run():
                return MN.hard_negative_mining(
                    emb, anchors, k=k, method="ivf",
                    nprobe=nprobe, index_path=idx,
                ).count()

            n_pairs = run()  # untimed: builds + persists the index
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                best = min(best, time.perf_counter() - t0)
            n_anchors = anchors.count()
            out[f"hnm_ivf_{rung}x_s"] = round(best, 2)
            out[f"hnm_ivf_{rung}x_anchors"] = n_anchors
            out[f"hnm_ivf_{rung}x_pairs"] = n_pairs
            out[f"hnm_ivf_{rung}x_ms_per_anchor"] = round(
                1000.0 * best / n_anchors, 3
            )
        out["hnm_ivf_100x_factor"] = round(
            out["hnm_ivf_100x_s"] / out["hnm_ivf_1x_s"], 1
        )
        out["hnm_ivf_100x_per_anchor_factor"] = round(
            out["hnm_ivf_100x_ms_per_anchor"] / out["hnm_ivf_1x_ms_per_anchor"],
            2,
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
