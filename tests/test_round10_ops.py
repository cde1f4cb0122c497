"""Round-10 operator tests: planted-near-dup media corpus (makes the
phash_near_dup driver row non-trivial), video near-duplicate detection
over per-frame perceptual hashes, and the bpe_train / keep-best-stream
bench surfaces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import multimodal as M

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    return load_table(spark, SF, "documents")


def test_planted_corpus_produces_real_pairs(spark, docs):
    """The base fixture has no pairs within hamming <= 6 (min pairwise
    dHash hamming ~12), so the planted corpus must (a) produce >0 pairs,
    (b) contain EVERY (doc_id, doc_id+OFFSET) planted pair at hamming
    <= 2 — the single-byte edit moves one pooled window mean, touching at
    most the two adjacent comparison bits."""
    media = M.media_with_planted_near_dups(docs)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in M.phash_near_dup(media).collect()
    }
    assert pairs, "planted corpus must produce pairs"
    planted_ids = [
        r.doc_id
        for r in docs.filter(
            (F.col("doc_id") % M.PLANT_EVERY == 0) & F.col("text").isNotNull()
        ).select("doc_id").collect()
    ]
    assert planted_ids
    for did in planted_ids:
        key = (did, did + M.PLANT_ID_OFFSET)
        assert key in pairs, f"planted pair {key} missing"
        assert pairs[key] <= 2, f"planted pair {key} hamming {pairs[key]} > 2"


def test_base_corpus_has_no_pairs(spark, docs):
    """Documents-fixture sparsity pin: without planting the pair query is
    legitimately empty — the property that made the r09 driver row
    trivial and the planting necessary."""
    media = M.media_from_documents(docs)
    assert M.phash_near_dup(media).count() == 0
