"""Winnowing fingerprints (Schleimer et al. 2003) and the MOSS-style
pairs consumer: the selection guarantee, tie-break and window edge
rules, density, and subsumption detection on planted excerpts."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import textops as T
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"

K, W = T.WINNOW_K, T.WINNOW_W


def test_guarantee_shared_run_shares_a_fingerprint(spark):
    """The winnowing guarantee: any shared token run of >= w+k-1 tokens
    contributes at least one identical selected HASH to both docs —
    regardless of the differing context around the run."""
    run = " ".join(f"s{i}" for i in range(W + K - 1))  # exactly w+k-1
    rows = [
        (1, "left padding words here " + run + " tail one", None),
        (2, "completely different prefix " + run + " other ending", None),
        (3, "no shared content at all in this document", None),
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    fp = T.winnow_fingerprints(docs)
    by_doc = {
        r.doc_id: set(r.hs)
        for r in fp.groupBy("doc_id")
        .agg(F.collect_set("fp_hash").alias("hs"))
        .collect()
    }
    assert by_doc[1] & by_doc[2], "shared run produced no shared fingerprint"
    assert not (by_doc[1] & by_doc[3] & by_doc[2])


def test_short_docs_yield_no_fingerprints(spark):
    """Docs below the guarantee length (fewer than w+k-1 tokens) have no
    filled window and select nothing."""
    short = " ".join(f"t{i}" for i in range(W + K - 2))  # one token short
    docs = spark.createDataFrame(
        [(1, short), (2, short + " extra")], "doc_id long, text string"
    )
    got = {r.doc_id for r in T.winnow_fingerprints(docs).collect()}
    assert got == {2}


def test_rightmost_tie_break_on_constant_text(spark):
    """All-identical tokens make every k-gram hash equal; each window
    must select its RIGHTMOST position (the Schleimer et al. robust
    rule), so the selected positions are exactly w .. m."""
    m_tokens = 12
    docs = spark.createDataFrame(
        [(1, " ".join(["a"] * m_tokens))], "doc_id long, text string"
    )
    m = m_tokens - K + 1  # k-gram count
    got = sorted(r.fp_pos for r in T.winnow_fingerprints(docs).collect())
    assert got == list(range(W, m + 1)), got


def test_density_matches_the_paper(spark):
    """Expected selection density is 2/(w+1) of the k-grams (Schleimer
    et al. §4) — on the fixture corpus the measured density must sit
    near it (generous band: the corpus vocabulary is tiny)."""
    docs = load_table(spark, SF, "documents")
    n_fp = T.winnow_fingerprints(docs).count()
    n_kg = docs.select(
        F.explode(
            __import__(
                "m12_kafkastreams_python_azure_spark.operators.corpus",
                fromlist=["word_ngrams"],
            ).word_ngrams(F.col("text"), K)
        )
    ).count()
    density = n_fp / n_kg
    assert 0.2 < density < 0.5, density


def test_pairs_detect_planted_prefix_excerpts(spark):
    """Every planted 60%-prefix clone must pair with its original at
    high containment: interior windows of the shared prefix select the
    same hashes on both sides."""
    from m12_kafkastreams_python_azure_spark.operators.dedup import (
        CONTAIN_CLONE_SHIFT,
        docs_with_planted_contained,
    )

    docs = docs_with_planted_contained(
        load_table(spark, SF, "documents").select("doc_id", "text")
    )
    pairs = {
        (r.id_a, r.id_b): r.containment for r in T.winnow_pairs(docs).collect()
    }
    planted = [
        r.doc_id
        for r in docs.filter(
            F.col("doc_id") >= CONTAIN_CLONE_SHIFT
        ).collect()
    ]
    assert planted
    found = 0
    for clone in planted:
        orig = clone - CONTAIN_CLONE_SHIFT
        c = pairs.get((orig, clone)) or pairs.get((clone, orig))
        if c is not None:
            assert c >= T.WINNOW_THRESHOLD
            found += 1
    # the screening tier must catch nearly all planted excerpts (a clone
    # whose prefix is shorter than the guarantee length may escape)
    assert found >= 0.8 * len(planted), (found, len(planted))


def test_pairs_are_over_distinct_contents(spark):
    """Duplicate law: exact duplicates collapse before fingerprinting —
    a corpus of two identical docs emits NO pair (exact dedup's domain),
    not a containment-1.0 pair."""
    text = " ".join(f"z{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    assert T.winnow_pairs(docs).count() == 0
