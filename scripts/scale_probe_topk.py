"""Scale ladder for the ksql TOPK/TOPKDISTINCT two-phase pre-prune
(round-19 newcomers, ``ksql._topk_preprune`` — VERDICT r18 #4).

Three claims converted to measured evidence per replication rung:

- **Value-identity**: the pre-pruned two-phase plan (phase 1 ranks
  within (keys, spark_partition_id) and keeps <= k rows / <= k distinct
  values; phase 2 aggregates the survivors) must equal the plain
  aggregate-expression spelling EXACTLY — for TOPK (row_number prune)
  and TOPKDISTINCT (dense_rank prune; row_number would evict a rare
  value hidden under k duplicates of a larger one) alike.
- **Pre-agg row bound**: the rows REACHING the final aggregate are
  bounded by k x input-partitions x |groups| — as the corpus replicates
  k-fold (same 5 event_type groups, per-group row count scaling
  linearly), the pre-agg/total ratio must COLLAPSE, which is the whole
  point: the final aggregate's per-group state never sees the corpus's
  growth, only the partition count's.
- **Wall ladder**: both spellings are one exchange + per-group work;
  wall should stay ~linear with no quadratic cliff, with the prune's
  advantage growing as per-group row counts grow (the unpruned
  collect_list materializes every row of the group in agg state).

Prints one JSON line.

Usage: python scripts/scale_probe_topk.py [sf_dir] [max_rung]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from m12_kafkastreams_python_azure_spark.ksql import KsqlContext  # noqa: E402
from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402
from m12_kafkastreams_python_azure_spark.sources.readers import (  # noqa: E402
    load_table,
)

RUNGS = (1, 10, 100)
K = 5


def replicate(ev, times: int):
    """k-fold replication with shifted event_ids and UNCHANGED
    (event_type, value) pairs: the per-group top-k VALUE multiset uses
    each value's global maximum ranks, so replication must leave both
    TOPK and TOPKDISTINCT results exactly unchanged — any drift means a
    prune rung dropped a value it should have kept."""
    n = ev.count()
    parts = [
        ev.select(
            (F.col("event_id") + F.lit(i * n)).alias("event_id"),
            "ts",
            "event_type",
            "value",
        )
        for i in range(times)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    max_rung = int(sys.argv[2]) if len(sys.argv) > 2 else RUNGS[-1]

    spark = get_spark(app_name="scale-probe-topk", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )

    results = []
    for rung in [r for r in RUNGS if r <= max_rung]:
        rep = replicate(ev, rung).persist()
        total = rep.count()

        ctx = KsqlContext(spark)
        ctx.register_topic("probe_topic", rep)
        ctx.execute(
            "CREATE STREAM evp (event_id BIGINT, ts TIMESTAMP, "
            "event_type VARCHAR, value DOUBLE) WITH "
            "(KAFKA_TOPIC='probe_topic', VALUE_FORMAT='JSON', "
            "TIMESTAMP='ts');"
        )
        row = {"rung": rung, "rows": total}
        for fn, agg in (
            ("TOPK", "collect_list"),
            ("TOPKDISTINCT", "collect_set"),
        ):
            stmt = (
                f"SELECT event_type, {fn}(value, {K}) AS tv FROM evp "
                "GROUP BY event_type"
            )
            pruned_sql = ctx._rewrite_select(stmt)
            assert "__ksql_pid" in pruned_sql, "pre-prune did not engage"
            t0 = time.perf_counter()
            pruned = {
                r["event_type"]: tuple(r["tv"])
                for r in spark.sql(pruned_sql).collect()
            }
            w_pruned = time.perf_counter() - t0
            unpruned_sql = (
                f"SELECT event_type, slice(sort_array({agg}(value), "
                f"false), 1, {K}) AS tv FROM evp GROUP BY event_type"
            )
            t0 = time.perf_counter()
            unpruned = {
                r["event_type"]: tuple(r["tv"])
                for r in spark.sql(unpruned_sql).collect()
            }
            w_unpruned = time.perf_counter() - t0
            # rows reaching the final aggregate: the derived prune table
            # (between the outer FROM and the outer GROUP BY)
            inner = pruned_sql[
                pruned_sql.index("FROM (") + 5: pruned_sql.rindex(" GROUP BY")
            ]
            pre_agg = spark.sql(f"SELECT COUNT(*) AS n FROM {inner}").collect()[
                0
            ]["n"]
            key = fn.lower()
            row[key] = {
                "identical": pruned == unpruned,
                "wall_pruned_s": round(w_pruned, 3),
                "wall_unpruned_s": round(w_unpruned, 3),
                "pre_agg_rows": pre_agg,
                "pre_agg_ratio": round(pre_agg / total, 5),
            }
            assert pruned == unpruned, f"{fn} rung {rung}: value drift"
        results.append(row)
        rep.unpersist()
        spark.catalog.clearCache()

    print(json.dumps({"probe": "ksql_topk_preprune", "k": K,
                      "sf_dir": sf_dir, "rungs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
