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

# Round-16 newcomers (never rowed): DoReMi-style score-driven domain
# reweighting and its selection consumer (the weighted_budget_select
# close-the-loop discipline), the winnowing pair, and the composed
# screened-containment front door plus its subsumption-prune consumer
# (ROADMAP r17 #2 pulled forward into r16).
NEVER_ROWED_R16_WAVE = [
    "doremi_weights",
    "doremi_resample",
    "winnow_fingerprints",
    "winnow_pairs",
    "containment_screened",
    "subsumption_prune",
    "shuffle_shard",
]

# Plan-affecting code change in round 16 re-enters the window (the
# window-hygiene rule): ccnet_buckets' unscored bucket now derives from
# the <2-token narrow predicate instead of a left-anti join against the
# unpersisted scorer output (VERDICT r15 #1).
CODE_CHANGED_R16 = [
    "ccnet_buckets",
]

# ALL thirty-two remaining r12-row queries — the stalest ledger cohort,
# fully retired this rotation (VERDICT r15 #2; named query-by-query in
# the r15 rotation queue).
R12_ROTATED_IN_R16 = [
    "lone_fault_supplier_q21",
    "dormant_rich_customers_q22",
    "quality_classifier",
    "jl_project",
    "token_entropy",
    "hash_sample_per_group",
    "trigram_backoff_score",
    "ngram_novelty",
    "scd2_pit_lookup",
    "knn_ivf_agreement",
    "dsir_resample",
    "hll_merge_bound",
    "quantile_sketch_bound",
    "heavy_hitters",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "pagerank_parts",
    "ann_topk",
    "embedding_near_dup",
    "normalize_embeddings",
    "text_quality",
    "clean_corpus",
    "decontaminate",
    "gopher_quality",
    "pack_sequences",
    "media_features",
    "rollup_merge",
    "scd2_history",
    "semantic_dedup",
    "dedup_stats",
    "dup_span_coverage",
]

# The head of the r13 cohort (ledger order) fills the remaining slots;
# the seven r16 newcomers displaced knn_label_vote, bpe_merges,
# bpe_encode, source_overlap, record_linkage, bm25_retrieval and
# decontaminate_bloom to the r17 queue head.
R13_HEAD_IN_R16 = [
    "hard_negative_mining",
    "anisotropy_audit",
    "temperature_sample",
    "cdc_chunk_dedup",
    "quality_calibration",
]

# Round 16's window has NO rows-only entry: every in-window query is
# fully oracle-checked.
ROWS_ONLY: set[str] = set()


def test_window_is_exactly_the_curated_set():
    window = list(entrymod.queries())[:WINDOW]
    expected = (
        REFERENCE_SURFACE + NEVER_ROWED_R16_WAVE + CODE_CHANGED_R16
        + R12_ROTATED_IN_R16 + R13_HEAD_IN_R16
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
