"""Replicated-corpus ladder for the round-16 winnowing pair
(``textops.winnow_fingerprints`` / ``winnow_pairs``).

Claims converted to measured evidence (the containment-probe
discipline — scale probes are bug finders, not just benchmarks):

- **Duplicate law**: winnow_pairs is a bucketed candidate generator
  with a df cap, so on a k-fold REPLICATED corpus (the web-scale shape)
  the planted-excerpt pairs must still all be found — replicas collapse
  to their representatives before fingerprinting, so candidate df never
  inflates past max_df and recall equals the 1x count exactly.
- **Sparsity**: the winnow selection shuffles ~2/(w+1) of the k-gram
  rows a full-gram containment pass shuffles; the ladder records both
  the fingerprint count and wall per rung.

Replica ids shift by a multiple of 20 (to preserve the doc_id % 20
planted-clone population) sized from the data, and the whole ladder
must stay below CONTAIN_CLONE_SHIFT (the aliasing guard the r15 ADVICE
added to the containment probe, sized from the largest rung that runs).

Prints one JSON line.

Usage: python scripts/scale_probe_winnow.py [sf_dir] [max_rung]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from m12_kafkastreams_python_azure_spark.operators import dedup as D  # noqa: E402
from m12_kafkastreams_python_azure_spark.operators import textops as T  # noqa: E402
from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402
from m12_kafkastreams_python_azure_spark.sources.readers import (  # noqa: E402
    load_table,
    parallel_scan,
)

RUNGS = (1, 10, 100)
SHIFT = 10_000_000


def replicated(docs, times: int, shift: int):
    out = docs
    for i in range(1, times):
        out = out.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        )
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_rung = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="scale-probe-winnow")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n1 = docs1.count()
    top_rung = max((r for r in RUNGS if r <= max_rung), default=1)
    max_id = int(docs1.agg(F.max("doc_id")).first()[0])
    shift = max(SHIFT, max_id + 1)
    shift += (-shift) % 20  # keep doc_id % 20, so clones plant identically
    if max_id + (top_rung - 1) * shift >= D.CONTAIN_CLONE_SHIFT:
        raise SystemExit("ladder would alias planted-clone ids")

    planted1 = docs1.filter(F.col("doc_id") % 20 == 0).count()
    out: dict[str, object] = {
        "sf_dir": sf_dir,
        "docs_1x": n1,
        "planted_expected": planted1,
        "replica_shift": shift,
    }
    for rung in RUNGS:
        if rung > max_rung:
            break
        rep = parallel_scan(replicated(docs1, rung, shift))
        corpus = D.docs_with_planted_contained(rep)
        t0 = time.perf_counter()
        fp_n = T.winnow_fingerprints(corpus).count()
        out[f"fps_{rung}x_n"] = fp_n
        out[f"fps_{rung}x_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        pairs = T.winnow_pairs(corpus)
        agg = pairs.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(
                (
                    (F.col("id_b") - F.col("id_a"))
                    == F.lit(D.CONTAIN_CLONE_SHIFT)
                ).cast("long")
            ).alias("planted"),
        ).first()
        out[f"pairs_{rung}x_s"] = round(time.perf_counter() - t0, 2)
        out[f"pairs_{rung}x_n"] = int(agg.pairs)
        # replicas collapse to the 1x reps: recall == the 1x planted
        # count at EVERY rung, or the df guard is eating duplicates
        out[f"pairs_{rung}x_planted"] = int(agg.planted or 0)
        out[f"pairs_{rung}x_recall_ok"] = (
            int(agg.planted or 0) >= int(0.8 * planted1)
            and int(agg.planted or 0)
            == out.get("pairs_1x_planted", int(agg.planted or 0))
        )
    if top_rung > 1 and out.get("pairs_1x_s"):
        out[f"pairs_{top_rung}x_factor"] = round(
            out[f"pairs_{top_rung}x_s"] / out["pairs_1x_s"], 1
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
