"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q": sec, ...}, "sf": <sf>}

Each query is materialized via a count-style collect (aggregates collect
fully; wide row sets are counted) after a warm-up of the input scans.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# A 40+-query session accumulates broadcast/shuffle/codegen state; at the
# default 8g heap the tail of the suite becomes GC-bound (observed: the
# same query 3-8x slower inside the suite than standalone). Size the heap
# to the machine — a quarter of physical RAM capped at 24g — so the bench
# stays in steady state on a big box without OOMing a small one; override
# via SPARK_DRIVER_MEM.
try:
    _phys_gb = (os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")) >> 30
except (ValueError, OSError):
    _phys_gb = 32
os.environ.setdefault("SPARK_DRIVER_MEM", f"{max(4, min(24, _phys_gb // 4))}g")

from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402
from m12_kafkastreams_python_azure_spark.sources.readers import (  # noqa: E402
    release_parallel_caches,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship reference query + the scan/join/agg/window
# breadth + the training-data-pipeline operators.
HEADLINE = [
    "hotels_count",
    "stay_enrich",
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "window_top_orders",
    "events_daily",
    "dedup_exact",
    "text_quality",
    "minhash_near_dup",
    "simhash_near_dup",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "ann_topk",
    "ann_lsh",
    "ann_ivf",
    "asof_latest_order",
    "event_pairs_10min",
    "window_functions",
    "token_count",
    "salted_user_counts",
    "pivot_daily",
    "json_extract",
    "word_count",
    "clean_corpus",
    "dedup_clusters",
    "pagerank_parts",
    "media_features",
    "normalize_embeddings",
    "tfidf_top_terms",
    "trailing_hour_counts",
    "latest_event_per_user",
    "edit_distance_pairs",
    "purchase_funnel",
    "decontaminate",
    "gopher_quality",
    "pii_scrub",
    "bigram_lm_score",
    "hll_merge_bound",
    "quantile_sketch_bound",
    "heavy_hitters",
    "zorder_key",
    "record_linkage",
    "rollup_merge",
    "scd2_history",
    "pack_sequences",
    "histogram_bins",
    "benford_digits",
    "corr_battery",
    "cms_merge_bound",
    "vocab_encode",
]


def run_headline(spark, queries, names, sf_dir=None):
    """Time each named query (best of two runs), with per-query fault
    isolation: one broken query must never zero out the whole bench
    artifact — its error is recorded and the rest keep running.
    Returns (timings, errors)."""
    sf_dir = sf_dir or SF_DIR
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        best = float("inf")
        # Two runs, report the best: the first run pays one-time JIT costs
        # (Janino codegen compile of large generated expressions) that are
        # amortized away in any sustained workload; the second run measures
        # the plan. count() materializes the full plan; for top-k/agg
        # queries the result is tiny, for wide ones we avoid driver
        # transfer cost.
        try:
            for _ in range(2):
                df = queries[name](spark, sf_dir)
                t0 = time.perf_counter()
                df.count()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 3)
        except Exception as e:  # noqa: BLE001
            errors[name] = f"{type(e).__name__}: {e}"[:500]
        # operators that persist intermediates would otherwise accumulate
        # cache across the suite and skew later queries via memory pressure
        # (clearCache drops DF-level cache; release_parallel_caches frees
        # the dedup/LSH persist registry, which clearCache does not track)
        spark.catalog.clearCache()
        release_parallel_caches()
    return timings, errors


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = entrymod.queries()

    # Warm the JVM + file system cache so timings measure the plans,
    # and spin up the per-core Python workers once so Arrow-path queries
    # measure steady-state, not interpreter cold start.
    queries["hotels_count"](spark, SF_DIR).count()
    spark.range(0, 64, 1, spark.sparkContext.defaultParallelism).mapInPandas(
        lambda it: it, "id long"
    ).count()

    timings, errors = run_headline(spark, queries, HEADLINE)

    try:
        streaming_eps = _streaming_throughput(spark)
    except Exception as e:  # noqa: BLE001
        streaming_eps = None
        errors["__streaming__"] = f"{type(e).__name__}: {e}"[:500]

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "streaming_events_per_sec": streaming_eps,
    }
    if errors:
        # 'value' sums only the queries that ran — mark the total partial
        # so a crash can never read as a round-over-round speedup
        out["errors"] = errors
        out["partial"] = True
    print(json.dumps(out))


def _streaming_throughput(spark) -> float:
    """Events/s through the flagship-shaped streaming aggregation: the
    events table replayed through a file-source update-mode keyed count
    (state store + shuffle, the reference's analyze-stage profile). The
    reference's producer ran at 1 rec/s (producer-app-data.yaml:36).

    Best of three replays (fresh checkpoint each): the first replay pays
    one-time costs (state-store init, streaming codegen) that a sustained
    pipeline amortizes away — same best-of-N discipline as the batch
    timings above, and it keeps the recorded number comparable across
    rounds instead of tracking cold-start noise."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        ev = load_table(spark, SF_DIR, "events")
        n = ev.count()
        src = f"{work}/src"
        ev.select("event_id", "ts", "user_id", "event_type", "value").coalesce(
            4
        ).write.json(src)
        # Best of three replays: after the 49-query batch suite the first
        # replay can read 30-40% low while the JVM settles (observed);
        # three replays pin the steady-state number (~2 s each).
        best = float("inf")
        for i in range(3):
            stream = (
                spark.readStream.schema(
                    "event_id long, ts timestamp, user_id long, "
                    "event_type string, value double"
                )
                .json(src)
                .groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.approx_count_distinct("user_id").alias("u"),
                )
            )
            q = (
                stream.writeStream.format("memory")
                .queryName(f"bench_stream_{i}")
                .outputMode("update")
                .option("checkpointLocation", f"{work}/ck{i}")
                .start()
            )
            t0 = time.perf_counter()
            q.processAllAvailable()
            best = min(best, time.perf_counter() - t0)
            q.stop()
        return round(n / best, 1)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
