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

# The six entries that had never had a driver CORRECTNESS row at the end
# of round 18 (VERDICT r18 #1, verbatim): the four r18 TPC-H closers
# (added after the r18 window was sealed; judge re-run PASS) and the two
# rows-only bench surfaces, explicitly rotated in for sane-spark_rows
# rows — the VERDICT overrides the earlier bpe-train-stays-last pin for
# this round.
NEVER_ROWED = [
    "shipping_priority_q3",
    "local_supplier_volume_q5",
    "customer_distribution_q13",
    "large_volume_customer_q18",
    "bpe_train",
    "hard_negative_mining_ivf",
]

# Round-19 newcomers: the ksql TOPK / HISTOGRAM aggregate spellings
# (VERDICT r18 #4), canonicalized to sorted strings for the driver hash.
R19_NEWCOMERS = [
    "ksql_topk",
    "ksql_histogram",
    "ksql_topk_distinct",
]

# Code changes in round 19 re-enter the window (the window-hygiene
# rule): url_dedup's canonicalization now splits the query at the FIRST
# '?' only (ADVICE r18 #3), c4_line_filter gained the badwords_path
# production-blocklist parameter (VERDICT r18 #8), and
# embedding_near_dup_lsh count-gates its verify broadcast (VERDICT r18
# #3 — rows-only by design, bounded by the oracle-checked exact twin).
CODE_CHANGED_R19 = [
    "url_dedup",
    "c4_line_filter",
    "embedding_near_dup_lsh",
]

# The head of the r15 cohort (ledger order) fills the remaining 33
# slots; the nine-entry remainder (corr_battery first) heads the r20
# queue.
R15_HEAD_IN_R19 = [
    "unimax_allocation",
    "hybrid_rrf_retrieval",
    "vocab_kl_drift",
    "retrieval_eval",
    "weighted_budget_select",
    "soft_dedup_screen",
    "hybrid_rrf_multi",
    "token_budget_select",
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
]

# Round 19's window carries exactly three rows-only entries — the two
# VERDICT-rotated bench surfaces plus the code-changed LSH front door;
# everything else in the window is fully oracle-checked.
ROWS_ONLY: set[str] = {
    "bpe_train",
    "hard_negative_mining_ivf",
    "embedding_near_dup_lsh",
}


def test_window_is_exactly_the_curated_set():
    window = list(entrymod.queries())[:WINDOW]
    expected = (
        REFERENCE_SURFACE + NEVER_ROWED + R19_NEWCOMERS
        + CODE_CHANGED_R19 + R15_HEAD_IN_R19
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


def test_bpe_train_rotated_in_for_r19_only():
    """bpe_train is normally a bench-only surface (a 16-merge driver
    loop with no single-statement SQL twin), but VERDICT r18 #1
    explicitly rotates it into the r19 window for a first sane-
    spark_rows driver row. It sits in the never-rowed block; after this
    round it returns to the tail."""
    names = list(entrymod.queries())
    assert names.index("bpe_train") == 9
    assert "bpe_train" not in entrymod.oracle_sql()


def test_production_ivf_spellings_still_declared():
    """knn_label_vote_ivf stays a rows-only bench surface outside the
    window; hard_negative_mining_ivf is identical in kind but sits
    IN-window this round per VERDICT r18 #1 (never-rowed debt)."""
    names = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    for prod in ("knn_label_vote_ivf", "hard_negative_mining_ivf"):
        assert prod in names
        assert prod not in oracles
    assert names.index("knn_label_vote_ivf") >= WINDOW
    assert names.index("hard_negative_mining_ivf") == 10
