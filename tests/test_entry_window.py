"""Guards the driver's 50-entry CORRECTNESS window in ``__spark_entry__``.

The driver records rows for exactly the FIRST 50 dict entries of
``queries()``; anything appended beyond position 50 silently never gets a
driver-checked row.  These tests pin the curated composition (module
docstring of ``__spark_entry__``) so a future append can't drift the
window — flagged missing by round-3 and round-4 ADVICE/VERDICT.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

WINDOW = 50

# Reference-surface queries (SURVEY.md §2 S2/S3/F1/F3-F5/K2-K4): always the
# first five entries, every round.
REFERENCE_SURFACE = [
    "mask_field",
    "json_projection",
    "null_filter",
    "stay_enrich",
    "hotels_count",
]

# Code/oracle changed in round 10 — each needs a fresh driver row
# (phash_near_dup: planted near-dup corpus so the row value-checks real
# pairs, VERDICT r09 #2; image_dhash: oracle builder parameterized
# alongside; knn_label_vote_ivf: probe sizing revisited, VERDICT r09 #7).
CHANGED_IN_R10 = [
    "phash_near_dup",
    "image_dhash",
    "knn_label_vote_ivf",
]

# NEW in round 10: video near-dup (per-frame perceptual hashes composed
# into clip-level matched-frame-fraction pairs; fully oracle-checked,
# planted trimmed clones provide real positives — VERDICT r09 #4).
NEW_IN_R10 = [
    "video_near_dup",
    "audio_near_dup",
]

# The sixteen r02 rows VERDICT r09 #3 named as stale, rotated back in.
R02_ROTATED_IN_R10 = [
    "big_orders_having",
    "cast_battery",
    "date_spine_daily",
    "decimal_totals",
    "forecast_revenue_q6",
    "grouping_sets",
    "priority_count_q4",
    "promo_revenue_q14",
    "regexp_battery",
    "shipmode_priority_q12",
    "tumbling_hourly",
    "union_all_activity",
    "user_event_profile",
    "window_frames",
    "word_count",
    "zscore_events",
]

# The fourteen r04 rows VERDICT r09 #3 named as stale, rotated back in.
R04_ROTATED_IN_R10 = [
    "asof_latest_order",
    "asof_next_order",
    "cte_sql",
    "dataset_split",
    "edit_distance_pairs",
    "histogram_bins",
    "hopping_hourly",
    "map_functions",
    "purchase_funnel",
    "quality_report",
    "stratified_sample",
    "tfidf_top_terms",
    "value_band_join",
    "zorder_key",
]

# Ten of the eleven next-stalest rows (last driver rows r05);
# word_positions ceded its slot to audio_near_dup and rotates first
# next round.
R05_ROTATED_IN_R10 = [
    "array_set_ops",
    "arrow_byte_stats",
    "benford_digits",
    "bitwise_aggregates",
    "cheapest_supplier",
    "corr_battery",
    "median_aggregates",
    "orderkey_islands",
    "region_revenue_share",
    "string_functions2",
]

# The only window entry allowed to lack a DuckDB oracle: k-means probing
# is not SQL-expressible; bounded by the oracle-checked exact twins
# (ann_topk, knn_label_vote — green rows on record) plus recall/parity
# tests. phash_near_dup and video_near_dup are NOT here: their candidate
# stages are complete (pigeonhole banding / exact frame-hash equi-join),
# so both are fully oracle-checked despite being LSH-shaped.
ROWS_ONLY = {
    "knn_label_vote_ivf",
}


def test_window_is_exactly_the_curated_set():
    window = list(entrymod.queries())[:WINDOW]
    expected = (
        REFERENCE_SURFACE + CHANGED_IN_R10 + NEW_IN_R10
        + R02_ROTATED_IN_R10 + R04_ROTATED_IN_R10 + R05_ROTATED_IN_R10
    )
    assert len(expected) == WINDOW
    assert window == expected


def test_reference_surface_leads_the_window():
    assert list(entrymod.queries())[:5] == REFERENCE_SURFACE


def test_no_duplicate_query_names():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))


def test_every_window_entry_has_an_oracle_except_rows_only():
    window = list(entrymod.queries())[:WINDOW]
    oracles = entrymod.oracle_sql()
    missing = {k for k in window if k not in oracles}
    assert missing == ROWS_ONLY


def test_every_oracle_key_is_a_query():
    queries = entrymod.queries()
    assert set(entrymod.oracle_sql()) <= set(queries)


def test_bpe_train_is_outside_the_window():
    """bpe_train is a bench-only surface: a 16-merge driver loop is too
    heavy for the driver's per-round sweep and has no single-statement
    SQL twin — it must never drift into the first 50."""
    names = list(entrymod.queries())
    assert "bpe_train" in names
    assert names.index("bpe_train") >= WINDOW
