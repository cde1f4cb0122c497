"""The hotels_count aggregation (K2-K4): the reference's flagship query.

ksqlDB: ``CREATE TABLE hotels_count AS SELECT stay_category,
COUNT(hotel_id) AS hotels_amount, COUNT_DISTINCT(hotel_id) AS distinct_hotels
FROM expedia_stream GROUP BY stay_category`` (reference:
ci_cd/ksql/create_table.json:2).

Spark-first: ``groupBy().agg()`` — Catalyst plans a partial (map-side) hash
aggregate before the shuffle and a final hash aggregate after, which is
strictly better than ksql's single post-repartition aggregate. The group-key
cardinality is tiny (5 categories) so the shuffle moves only
``partitions x 5`` pre-aggregated rows regardless of input size — this plan
is flat-cost at 100 TB. For the distinct count, Spark's exact
``countDistinct`` plans a two-phase expand+aggregate (shuffle on
(category, hotel_id) then on category); ``approx_count_distinct`` (HLL,
single pass, matches ksqlDB's documented approximate semantics) is the
scale path and available via ``exact=False``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hotels_count(
    df: DataFrame,
    category_col: str = "stay_category",
    key_col: str = "hotel_id",
    exact: bool = True,
    rsd: float = 0.05,
) -> DataFrame:
    distinct = (
        F.count_distinct(F.col(key_col))
        if exact
        else F.approx_count_distinct(F.col(key_col), rsd)
    )
    return df.groupBy(category_col).agg(
        F.count(F.col(key_col)).alias("hotels_amount"),
        distinct.alias("distinct_hotels"),
    )
