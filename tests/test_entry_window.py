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

# Code changed in round 9 — each needs a fresh driver row
# (pmi_bigrams: NULL-text doc-count fix; source_length_drift: NULL text
# filtered identically on both sides; knn_label_vote_ivf: persisted
# sqrt(n)-list index via ivf.load_ivf_index; simhash_near_dup: banding
# core extracted into dedup.banded_hamming_pairs).
CHANGED_IN_R09 = [
    "pmi_bigrams",
    "source_length_drift",
    "knn_label_vote_ivf",
    "simhash_near_dup",
]

# NEW in round 9: ExactSubstr span removal (Lee et al. 2022) and the
# perceptual-hash image-dedup pair (signature table + banded-Hamming
# pairs, both fully oracle-checked).
NEW_IN_R09 = [
    "exact_substring_dedup",
    "image_dhash",
    "phash_near_dup",
]

# The nineteen entries VERDICT r08 named as stale, rotated back in
# (last driver rows r07).
ROTATED_IN_R09 = [
    "vocab_encode",
    "quality_percentile_filter",
    "pii_scrub",
    "bigram_lm_score",
    "sq_error_stats",
    "geomean_prices",
    "bpe_pair_counts",
    "ann_pq",
    "ann_ivfpq",
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "top_customers",
    "window_top_orders",
    "events_daily",
    "window_functions",
    "string_functions",
    "math_functions",
    "sessionize_events",
]

# The nineteen OLDEST remaining entries (last driver rows r01/r02).
OLDEST_ROTATED_IN_R09 = [
    "customers_without_orders",
    "purchase_and_click_users",
    "rollup_returnflag",
    "priority_orders_exists",
    "orders_no_lineitems_anti",
    "quantity_percentiles",
    "date_parse_lenient",
    "token_count",
    "cube_events",
    "array_functions",
    "inactive_customers_except",
    "json_extract",
    "pivot_daily",
    "datetime_functions",
    "hash_sample",
    "salted_user_counts",
    "conditional_functions",
    "stats_battery",
    "above_avg_orders",
]

# The only window entries allowed to lack a DuckDB oracle: LSH banding,
# k-means probing, and PQ codebooks are not SQL-expressible; each is
# bounded by an oracle-checked exact twin with a green row on record
# (ngram_jaccard_pairs for simhash, ann_topk for ann_pq/ann_ivfpq,
# knn_label_vote for knn_label_vote_ivf) plus recall/parity tests.
# phash_near_dup is NOT here: its banding is pigeonhole-complete, so it
# is fully oracle-checked despite being an LSH under the hood.
ROWS_ONLY = {
    "knn_label_vote_ivf",
    "simhash_near_dup",
    "ann_pq",
    "ann_ivfpq",
}


def test_window_is_exactly_the_curated_set():
    window = list(entrymod.queries())[:WINDOW]
    expected = (
        REFERENCE_SURFACE + CHANGED_IN_R09 + NEW_IN_R09 + ROTATED_IN_R09
        + OLDEST_ROTATED_IN_R09
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
