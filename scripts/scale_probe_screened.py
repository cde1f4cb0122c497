"""Scale ladder for containment_screened vs exact containment_pairs
(ROADMAP r17 #2, built in r16): the measured end-to-end win of the
winnow-screen -> full-gram-verify composition over the exact operator,
plus its recall, at 1x/10x/100x.

Ladders (shared with scale_probe_containment via import):

- **overlap** (shared-boilerplate web shape — the ladder screening is
  FOR): every replica keeps the first 25% of each doc's tokens
  verbatim and suffixes the rest with its replica index, so every
  cross-replica pair shares the boilerplate prefix at containment
  ~0.25 — BELOW both thresholds. The exact operator must count every
  shared boilerplate gram of every sub-threshold pair at full gram
  density; the screen rejects those pairs at 2/(w+1) fingerprint
  density and the verify only ever sees the planted true pairs. The
  win factor ``exact_s / screened_s`` here is the headline number.
  Rungs stay under the ubiquity cap (boilerplate gram df == rung must
  be <= max_df=64, or the hot-gram guard deletes the comparison).
- **distinct** (disjoint-gram growth): BOTH operators run per rung —
  the HONEST overhead row: with no sub-threshold overlap to reject,
  the screen is pure extra work and the exact operator wins (the
  front-door guidance in containment_screened's docstring).
- **replicated** (duplicate-heavy shape): screened only — the
  collapse-first duplicate law must keep FULL planted recall exactly
  as the exact operator does (the exact twin's replicated numbers
  live in the scale_probe_containment artifact).

Recall on every rung: screened pair set vs exact pair set (subset by
construction — the verify math is identical; tests/test_screened.py
pins value-parity).

Prints one JSON line. Usage:
python scripts/scale_probe_screened.py [sf_dir] [max_rung]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F  # noqa: E402

from scale_probe_containment import (  # noqa: E402
    RUNGS,
    checked_shift,
    distinct,
    replicated,
)

from m12_kafkastreams_python_azure_spark.operators import dedup as D  # noqa: E402
from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402
from m12_kafkastreams_python_azure_spark.sources.readers import (  # noqa: E402
    load_table,
    parallel_scan,
)


# Overlap rungs stop at 10: the sf0.1 documents table has a ~40-word
# vocabulary, so beyond ~10 near-copies per base doc even ORDINARY grams
# cross the max_df=64 ubiquity cap corpus-wide and the guard deletes the
# boilerplate comparison for BOTH operators (measured at a 32x rung:
# exact loses planted pairs too) — the ladder stops measuring screening
# and starts measuring the vocabulary of the synthetic fixture.
OVERLAP_RUNGS = (1, 10)
OVERLAP_FRAC = 0.25


def overlap(docs, times: int, shift: int, frac: float = OVERLAP_FRAC):
    """Shared-boilerplate growth: replica i keeps the first ``frac`` of
    each doc's tokens verbatim and suffixes the rest with the replica
    index. Cross-replica containment lands at ~frac for doc-doc pairs
    and ~frac/0.6 for clone-involving pairs — 0.25 keeps BOTH under the
    0.5 screen bound (0.3 would push clone cross-pairs to exactly 0.5
    and re-admit them), so the screen rejects all boilerplate pairs at
    fingerprint density while the exact operator counts their shared
    grams in full."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    keep = F.ceil(F.size(toks) * F.lit(frac)).cast("int")
    out = docs
    for i in range(1, times):
        head = F.slice(toks, 1, keep)
        tail = F.transform(
            F.slice(toks, keep + 1, F.size(toks)),
            lambda x: F.concat(x, F.lit(f"x{i}")),
        )
        out = out.unionByName(
            docs.select(
                (F.col("doc_id") + F.lit(i * shift)).alias("doc_id"),
                F.concat_ws(" ", F.concat(head, tail)).alias("text"),
            )
        )
    return out


def shuffle_write_bytes(spark) -> int | None:
    """Total shuffle WRITE bytes across all completed stages so far,
    from the UI status API (the probe enables spark.ui.enabled). The
    bytes-over-network cost is the metric the local wall clock cannot
    see — in one JVM a shuffle is a memory copy; on a 1000-executor
    cluster it is the bottleneck the screen exists to shrink."""
    import json as _json
    import urllib.request

    try:
        base = spark.sparkContext.uiWebUrl
        apps = _json.loads(
            urllib.request.urlopen(f"{base}/api/v1/applications", timeout=5)
            .read()
        )
        app_id = apps[0]["id"]
        stages = _json.loads(
            urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=10,
            ).read()
        )
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return None


def run_op(spark, docs, op):
    """Time op (plant + collapse + screen/verify) on the planted corpus;
    return (wall_s, pair_set, planted_count, shuffle_mb)."""
    b0 = shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    out = op(D.docs_with_planted_contained(docs))
    rows = out.select("id_a", "id_b").collect()
    wall = round(time.perf_counter() - t0, 2)
    b1 = shuffle_write_bytes(spark)
    sh_mb = (
        round((b1 - b0) / 1e6, 1) if b0 is not None and b1 is not None else None
    )
    pairs = {(r.id_a, r.id_b) for r in rows}
    planted = sum(
        1 for a, b in pairs if b - a == D.CONTAIN_CLONE_SHIFT
    )
    return wall, pairs, planted, sh_mb


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_rung = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    # UI on: the status API is how per-op shuffle bytes are read
    spark = get_spark(
        app_name="scale-probe-screened",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs1 = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n1 = docs1.count()
    # size the aliasing guard from the largest rung of EITHER ladder
    # that actually runs (the ADVICE-r15 clamp rule)
    top_rung = max(
        (r for r in (*RUNGS, *OVERLAP_RUNGS) if r <= max_rung), default=1
    )
    shift = checked_shift(docs1, top_rung)
    expected_planted = docs1.filter(F.col("doc_id") % 20 == 0).count()
    out: dict[str, object] = {
        "sf_dir": sf_dir,
        "docs_1x": n1,
        "planted_expected_1x": expected_planted,
        "replica_shift": shift,
    }
    def both(tag, corpus, rung):
        we, exact, pe, emb = run_op(spark, corpus, D.containment_pairs)
        ws, scr, ps, smb = run_op(spark, corpus, D.containment_screened)
        out[f"{tag}_exact_s"] = we
        out[f"{tag}_screened_s"] = ws
        out[f"{tag}_exact_shuffle_mb"] = emb
        out[f"{tag}_screened_shuffle_mb"] = smb
        if emb and smb:
            out[f"{tag}_shuffle_ratio"] = round(emb / smb, 2)
        out[f"{tag}_exact_pairs"] = len(exact)
        out[f"{tag}_screened_pairs"] = len(scr)
        out[f"{tag}_subset_ok"] = scr <= exact
        out[f"{tag}_pair_recall"] = round(
            len(scr) / len(exact), 4
        ) if exact else 1.0
        # every replica plants its own clone population; exact and
        # screened recall are flagged SEPARATELY (at a deep-enough
        # overlap rung the ubiquity cap takes pairs from BOTH — that is
        # a fixture-vocabulary effect, not a screen miss)
        out[f"{tag}_exact_planted_ok"] = pe == expected_planted * rung
        out[f"{tag}_screened_planted_ok"] = ps == pe
        out[f"{tag}_win_factor"] = round(we / ws, 2) if ws else None

    for rung in OVERLAP_RUNGS:
        if rung > max_rung:
            break
        both(f"overlap_{rung}x", parallel_scan(overlap(docs1, rung, shift)), rung)
    for rung in RUNGS:
        if rung > max_rung:
            break
        both(f"distinct_{rung}x", parallel_scan(distinct(docs1, rung, shift)), rung)

        rep = parallel_scan(replicated(docs1, rung, shift))
        ws, scr, ps, smb = run_op(spark, rep, D.containment_screened)
        out[f"replicated_{rung}x_screened_s"] = ws
        out[f"replicated_{rung}x_screened_pairs"] = len(scr)
        # replicas collapse to the 1x reps: full recall == the 1x count
        out[f"replicated_{rung}x_planted_recall_ok"] = ps == expected_planted
    # growth-factor keys named from the rung that actually ran (the
    # scale_probe_retrieval ADVICE-r15 rule)
    t1 = out.get("distinct_1x_screened_s")
    tN = out.get(f"distinct_{top_rung}x_screened_s")
    if t1 and tN and top_rung > 1:
        out[f"distinct_{top_rung}x_screened_factor"] = round(tN / t1, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
