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

# The six round-14 newcomers: the only oracle-eligible queries never
# driver-rowed entering round 15 (VERDICT r14 #1) — they head the window
# right after the reference surface.
NEVER_ROWED_R14_WAVE = [
    "excerpt_screen",
    "soft_dedup_weights",
    "unimax_allocation",
    "hybrid_rrf_retrieval",
    "vocab_kl_drift",
    "retrieval_eval",
]

# Round-15 newcomers (never rowed): the soft-dedup selection consumer
# (VERDICT r14 #6), the frozen-reference soft-dedup screen (VERDICT r14
# #5), the batched multi-seed RRF (VERDICT r14 #4).
NEVER_ROWED_R15_WAVE = [
    "weighted_budget_select",
    "soft_dedup_screen",
    "hybrid_rrf_multi",
]

# Plan-affecting code changes in round 15 re-enter the window (the
# window-hygiene rule): ccnet_buckets routes zero-bigram docs to an
# explicit 'unscored' bucket (ADVICE r14); token_budget_select's fill
# was factored into the shared _budget_fill helper (soft_dedup_weights'
# commonness-rounding change rides its NEVER_ROWED_R14_WAVE slot).
CODE_CHANGED_R15 = [
    "ccnet_buckets",
    "token_budget_select",
]

# ALL twenty-nine remaining r10-row queries — the stalest ledger cohort,
# fully retired this rotation (VERDICT r14 #3).
R10_ROTATED_IN_R15 = [
    "tumbling_hourly",
    "union_all_activity",
    "user_event_profile",
    "window_frames",
    "word_count",
    "zscore_events",
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
    "array_set_ops",
    "arrow_byte_stats",
    "benford_digits",
    "bitwise_aggregates",
    "cheapest_supplier",
    "corr_battery",
    "median_aggregates",
    "orderkey_islands",
    "string_functions2",
]

# The five stalest r12-row queries fill the remaining slots (the other
# thirty-two r12 rows head the round-16 queue).
R12_HEAD_IN_R15 = [
    "word_positions",
    "audio_fingerprints",
    "semantic_decontaminate",
    "quality_percentile_filter",
    "dedup_keep_best",
]

# Round 15's window has NO rows-only entry: every in-window query is
# fully oracle-checked.
ROWS_ONLY: set[str] = set()


def test_window_is_exactly_the_curated_set():
    window = list(entrymod.queries())[:WINDOW]
    expected = (
        REFERENCE_SURFACE + NEVER_ROWED_R14_WAVE + NEVER_ROWED_R15_WAVE
        + CODE_CHANGED_R15 + R10_ROTATED_IN_R15 + R12_HEAD_IN_R15
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
    assert names[-1] == "bpe_train"


def test_production_ivf_spellings_still_declared():
    """knn_label_vote_ivf and hard_negative_mining_ivf must stay
    queries() entries (bench surfaces, rows-only by design) even though
    their correctness bounds ride in the ledger via knn_ivf_agreement
    and the exact hard_negative_mining twin."""
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    for prod in ("knn_label_vote_ivf", "hard_negative_mining_ivf"):
        assert prod in names
        assert names.index(prod) >= WINDOW
        assert prod not in oracles
