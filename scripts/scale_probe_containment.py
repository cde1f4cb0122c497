"""Scale ladder for containment_near_dup (VERDICT r13 #1 probe + #6 rung).

Two ladders over sf0.1 documents at 1x/10x/100x, separating the two ways
a corpus grows:

- **replicated** (duplicate-heavy, the web-scale shape and the failure
  mode VERDICT r13 #1 flagged): every rung is byte-identical replicas
  with shifted doc_ids. The collapse-first duplicate law must (a) keep
  FULL planted-clone recall — the pre-fix code returned zero planted
  pairs here because replicas pushed every shared gram past max_df —
  and (b) bound downstream work by DISTINCT content, so wall grows only
  with the collapse shuffle itself.
- **distinct** (true corpus growth): every replica's tokens are
  suffixed with the replica index, so gram spaces are disjoint and the
  gram shuffle + bucket expansion genuinely grow 100x. This is the
  honest wall-clock rung for "what if the corpus were really 100x".

Prints one JSON line with per-rung wall seconds, pair counts, planted
recall, and 100x factors.

Usage: python scripts/scale_probe_containment.py [sf_dir] [max_rung]
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
from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402
from m12_kafkastreams_python_azure_spark.sources.readers import (  # noqa: E402
    load_table,
    parallel_scan,
)

RUNGS = (1, 10, 100)
SHIFT = 10_000_000


def checked_shift(docs, max_rung: int) -> int:
    """Replica-id shift with the aliasing guard (ADVICE r14): replica
    ids ``doc_id + i*shift`` must stay strictly below
    ``CONTAIN_CLONE_SHIFT`` (1e9) or the top rung's replicas alias the
    planted-clone id space and silently reintroduce the exact bug the
    1e9 clone shift fixed (at sf1, ids ~1e8 + 99*1e7 reach ~1.09e9).
    Derive from the data: shift >= max(doc_id)+1 keeps replica spaces
    disjoint; then assert the whole ladder fits under the clone shift."""
    max_id = int(docs.agg(F.max("doc_id")).first()[0])
    # multiple of 20: replica ids must keep doc_id % 20, or the planted
    # clone population (every 20th doc) would differ per replica and the
    # recall expectation expected_planted * rung would be wrong
    shift = max(SHIFT, max_id + 1)
    shift += (-shift) % 20
    top = max_id + (max_rung - 1) * shift
    if top >= D.CONTAIN_CLONE_SHIFT:
        raise SystemExit(
            f"ladder would alias planted-clone ids: max replica id {top} "
            f">= CONTAIN_CLONE_SHIFT {D.CONTAIN_CLONE_SHIFT}; lower the "
            f"max_rung or raise CONTAIN_CLONE_SHIFT"
        )
    return shift


def replicated(docs, times: int, shift: int = SHIFT):
    out = docs
    for i in range(1, times):
        out = out.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        )
    return out


def distinct(docs, times: int, shift: int = SHIFT):
    """Disjoint-gram growth: suffix every token with the replica index
    so replica i's grams share nothing with replica j's — the corpus is
    genuinely ``times`` bigger for the gram shuffle, sizes, and bucket
    expansion (a plain prefix token would instead share ~all grams
    across replicas and measure only the ubiquity guard)."""
    out = docs
    for i in range(1, times):
        out = out.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(i * shift)).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"(\S+)", rf"$1x{i}").alias(
                    "text"
                ),
            )
        )
    return out


def run_rung(docs):
    """Time the full operator (plant + collapse + containment) and
    return (wall_s, total_pairs, planted_pairs)."""
    t0 = time.perf_counter()
    out = D.containment_pairs(D.docs_with_planted_contained(docs))
    agg = out.agg(
        F.count(F.lit(1)).alias("pairs"),
        F.sum(
            (
                F.col("id_b") - F.col("id_a") == F.lit(D.CONTAIN_CLONE_SHIFT)
            ).cast("long")
        ).alias("planted"),
    ).first()
    wall = round(time.perf_counter() - t0, 2)
    return wall, int(agg.pairs), int(agg.planted or 0)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_rung = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_spark(app_name="scale-probe-containment")
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n1 = docs1.count()
    # size the aliasing guard from the largest rung that actually RUNS,
    # not the raw argv (ADVICE r15: max_rung=50 validated a 50-replica
    # ladder while only the 10x rung executed — the guard could refuse a
    # configuration that is safe in practice)
    top_rung = max((r for r in RUNGS if r <= max_rung), default=1)
    shift = checked_shift(docs1, top_rung)
    expected_planted = docs1.filter(F.col("doc_id") % 20 == 0).count()
    out: dict[str, object] = {
        "sf_dir": sf_dir,
        "docs_1x": n1,
        "planted_expected_1x": expected_planted,
        "replica_shift": shift,
    }
    for rung in RUNGS:
        if rung > max_rung:
            break
        rep = parallel_scan(replicated(docs1, rung, shift))
        w, pairs, planted = run_rung(rep)
        out[f"replicated_{rung}x_s"] = w
        out[f"replicated_{rung}x_pairs"] = pairs
        # replicas collapse to the 1x reps: full recall == the 1x count
        out[f"replicated_{rung}x_planted"] = planted
        out[f"replicated_{rung}x_recall_ok"] = planted == expected_planted

        dis = parallel_scan(distinct(docs1, rung, shift))
        w, pairs, planted = run_rung(dis)
        out[f"distinct_{rung}x_s"] = w
        out[f"distinct_{rung}x_pairs"] = pairs
        # every replica plants its own clones on its own gram space
        out[f"distinct_{rung}x_planted"] = planted
        out[f"distinct_{rung}x_recall_ok"] = planted == expected_planted * rung
    # growth-factor keys named from the rung that actually ran (the
    # scale_probe_retrieval ADVICE-r15 fix, mirrored here)
    for ladder in ("replicated", "distinct"):
        t1 = out.get(f"{ladder}_1x_s")
        tN = out.get(f"{ladder}_{top_rung}x_s")
        if t1 and tN and top_rung > 1:
            out[f"{ladder}_{top_rung}x_factor"] = round(tN / t1, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
