"""Generate the persisted SF1 bench tier at ``testdata_sf1/`` (repo root).

The driver's testdata tree is read-only and tops out at sf0.1, so the SF1
tier is derived: each sf0.1 table replicated REPLICAS(=10)x with
consistent key shifts — every foreign key shifts by the same per-replica
offset as its primary key, so join cardinalities scale linearly and
referential integrity holds exactly (replica i of lineitem joins replica i
of orders, and so on). region/nation stay fixed (constant-size dimensions,
as in TPC-H proper). Deterministic: same input -> byte-stable row set
(no RNG anywhere).

Two deliberate workload consequences of replication, both documented in
docs/SCALE.md: document texts repeat 10x (exact/near-dup operators face a
10x-duplicate corpus — the web-scale shape they exist for), and embedding
vectors repeat 10x (ANN candidate structure densifies).

Output layout: ``testdata_sf1/{table}.parquet`` as a DIRECTORY of part
files (8 for the big tables). The driver tables are single parquet files
with ONE row group, so Spark scans them in a single task — and a bare
``repartition(n)`` does not help because Catalyst pushes projections
below the round-robin exchange, leaving expensive expressions in the
one-task scan stage (the ``_parallel_text`` repartition+persist barrier
exists for exactly that). Multi-part output sidesteps all of it: the
sf1 scan parallelizes at the source.

Usage: python scripts/gen_sf1.py  (~30 s; skips tables already present)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from m12_kafkastreams_python_azure_spark.session import get_spark  # noqa: E402
from m12_kafkastreams_python_azure_spark.sources.readers import load_table  # noqa: E402

SRC = "/root/testdata/sf0.1"
OUT = os.path.join(REPO, "testdata_sf1")
REPLICAS = 10
SHIFT = 10_000_000  # > any sf0.1 key; replica i adds i*SHIFT to every key

# table -> columns that carry entity keys (all shift together per replica)
KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]
BIG_TABLES = {"lineitem", "orders", "events"}  # 8 part files; rest 4


def replicate(df, key_cols):
    out = df
    for i in range(1, REPLICAS):
        shifted = df
        for c in key_cols:
            shifted = shifted.withColumn(c, F.col(c) + F.lit(i * SHIFT))
        out = out.unionByName(shifted)
    return out


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    spark = get_spark(app_name="gen-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    for t in COPY_AS_IS + list(KEY_COLS):
        dest = f"{OUT}/{t}.parquet"
        if os.path.exists(dest):
            print(f"{t}: exists, skipping")
            continue
        df = load_table(spark, SRC, t)
        if t in KEY_COLS:
            df = replicate(df, KEY_COLS[t])
        n_files = 8 if t in BIG_TABLES else 4 if t in KEY_COLS else 1
        df.repartition(n_files).write.mode("overwrite").parquet(dest)
        # count the WRITTEN parquet (footer metadata — free) instead of
        # re-running the 10-way replicated union a second time per table
        n = spark.read.parquet(dest).count()
        print(f"{t}: {n} rows -> {dest} ({n_files} files)")
    spark.stop()


if __name__ == "__main__":
    main()
