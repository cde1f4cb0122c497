"""Bucketed tables: pre-shuffled storage for co-located, exchange-free joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both sides.
Bucketing pays that shuffle ONCE at write time: both tables are written
hash-partitioned (and sorted) on the join key into the same bucket count, so
every future join on that key is a zero-exchange sort-merge of aligned
buckets. This module wraps the write/read/verify cycle; the
no-Exchange-in-plan property is asserted in tests/test_bucketing.py.

Bucketed writes need a table catalog (``saveAsTable``) — plain
``.parquet(path)`` cannot record bucket metadata. The session's default
warehouse dir is used; at scale point ``spark.sql.warehouse.dir`` at the
lake.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) managed table. The one
    shuffle this triggers is the one all downstream joins skip."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    force_merge: bool = False,
) -> DataFrame:
    """Join two same-bucketed tables on the bucket key. With matching bucket
    counts Spark aligns buckets 1:1 — the plan contains no Exchange.

    ``force_merge`` pins a sort-merge join; without it the planner may still
    pick broadcast when a side is tiny (fine too — also exchange-free for
    the big side). At real fact-fact scale SMJ is what runs, and the bucket
    alignment is what deletes both shuffles.
    """
    left = spark.table(left_table)
    if force_merge:
        left = left.hint("merge")
    return left.join(spark.table(right_table), on)
