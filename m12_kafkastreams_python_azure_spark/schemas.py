"""Record schemas for the expedia pipeline.

Mirrors the reference's typed records (reference: src/main.py:7-31 — the
``ExpediaRecord``/``ExpediaExtRecord`` Faust records) and the ksql stage's
schema-on-read projection (reference: ci_cd/ksql/create_stream.json:2).

Divergence (documented, see SURVEY.md §1.3): the reference declares ``id`` as
``float`` in Faust but ``BIGINT`` in ksql; we standardize on LongType
end-to-end since the dataset ids are integral.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# The constant the ingest-time MaskField SMT writes over date_time
# (reference: azure-source-cc.json:14-17).
DATE_TIME_MASK = "0000-00-00 00:00:00"

# 20-column raw record (reference: src/main.py:7-27).
EXPEDIA_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("date_time", StringType()),
        StructField("site_name", LongType()),
        StructField("posa_container", LongType()),
        StructField("user_location_country", LongType()),
        StructField("user_location_region", LongType()),
        StructField("user_location_city", LongType()),
        StructField("orig_destination_distance", DoubleType()),
        StructField("user_id", LongType()),
        StructField("is_mobile", LongType()),
        StructField("is_package", LongType()),
        StructField("channel", LongType()),
        StructField("srch_ci", StringType()),
        StructField("srch_co", StringType()),
        StructField("srch_adults_cnt", LongType()),
        StructField("srch_children_cnt", LongType()),
        StructField("srch_rm_cnt", LongType()),
        StructField("srch_destination_id", LongType()),
        StructField("srch_destination_type_id", LongType()),
        StructField("hotel_id", LongType()),
    ]
)

# Enriched record = raw + stay_category (reference: src/main.py:30-31).
EXPEDIA_EXT_SCHEMA = StructType(
    EXPEDIA_SCHEMA.fields + [StructField("stay_category", StringType())]
)

# ksql CREATE STREAM projects 3 of the 21 JSON fields — schema-on-read
# (reference: ci_cd/ksql/create_stream.json:2). Spark's from_json with a
# partial schema has the same projection semantics.
EXPEDIA_STREAM_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("hotel_id", LongType()),
        StructField("stay_category", StringType()),
    ]
)
