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

# Rotation-queue head (VERDICT r10 #1): word_positions ceded its r10
# slot; audio_fingerprints/semantic_decontaminate were new-in-r10 at
# 51+; quality_percentile_filter/dedup_keep_best gained shared-subtree
# persists in r10 after that round's window was pinned.
QUEUE_HEAD = [
    "word_positions",
    "audio_fingerprints",
    "semantic_decontaminate",
    "quality_percentile_filter",
    "dedup_keep_best",
]

# The sixteen late-round-10 queries that never had a driver row
# (judge-swept 18/18 green in r10; VERDICT r10 #1).
LATE_R10_WAVE = [
    "volume_shipping_q7",
    "market_share_q8",
    "returned_items_q10",
    "top_supplier_q15",
    "small_qty_revenue_q17",
    "disjunctive_revenue_q19",
    "lone_fault_supplier_q21",
    "dormant_rich_customers_q22",
    "quality_classifier",
    "jl_project",
    "token_entropy",
    "hash_sample_per_group",
    "trigram_backoff_score",
    "ngram_novelty",
    "scd2_pit_lookup",
    "decontaminate_bloom",
]

# NEW in round 11: the IVF vote bound as an oracle-checked summary row
# (VERDICT r10 #6) and DSIR importance resampling (VERDICT r10 #5).
NEW_IN_R11 = [
    "knn_ivf_agreement",
    "dsir_resample",
]

# Next-stalest rows: last driver rows r06.
R06_ROTATED_IN_R11 = [
    "hll_merge_bound",
    "quantile_sketch_bound",
    "heavy_hitters",
]

# Nineteen of the forty-two r08-row queries (the oracle-checked cohort;
# the remaining twenty-three rotate next round, stalest first).
R08_ROTATED_IN_R11 = [
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
    "record_linkage",
    "scd2_history",
    "semantic_dedup",
    "dedup_stats",
    "dup_span_coverage",
]

# Round 11's window has NO rows-only entry: knn_label_vote_ivf (the only
# r10 one) moved to 51+ as the production bench spelling, and its bound
# now lives in-window as the fully oracle-checked knn_ivf_agreement.
ROWS_ONLY: set[str] = set()


def test_window_is_exactly_the_curated_set():
    window = list(entrymod.queries())[:WINDOW]
    expected = (
        REFERENCE_SURFACE + QUEUE_HEAD + LATE_R10_WAVE + NEW_IN_R11
        + R06_ROTATED_IN_R11 + R08_ROTATED_IN_R11
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


def test_production_ivf_spelling_still_declared():
    """knn_label_vote_ivf must stay a queries() entry (bench surface,
    rows-only by design) even though its correctness bound now rides
    in-window as knn_ivf_agreement."""
    names = list(entrymod.queries())
    assert "knn_label_vote_ivf" in names
    assert names.index("knn_label_vote_ivf") >= WINDOW
    assert "knn_label_vote_ivf" not in entrymod.oracle_sql()
