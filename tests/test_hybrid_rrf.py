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


def test_retrieval_eval_hand_computed(spark):
    """Planted geometry: ranking [1..4], relevant = {ranks 2 and 4} of 3
    gold docs (one unretrieved). MRR = 1/2; DCG = 1/log2(3)+1/log2(5);
    IDCG = 1/log2(2)+1/log2(3)+1/log2(4) (3 relevant, k=20);
    precision@20 = 2/20; recall = 2/3."""
    import math

    ranking = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3), (40, 4)], "doc_id long, rank int"
    )
    relevant = spark.createDataFrame([(20,), (40,), (99,)], "doc_id long")
    r = R.retrieval_eval(ranking, relevant, k=20).first()
    assert r.n_relevant == 3 and r.n_hits_at_k == 2
    assert r.mrr == 0.5
    dcg = 1 / math.log2(3) + 1 / math.log2(5)
    idcg = 1 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert r.ndcg_at_k == round(dcg / idcg, 6)
    assert r.precision_at_k == 0.1 and r.recall_at_k == round(2 / 3, 6)


def test_retrieval_eval_no_hits_is_all_zero(spark):
    ranking = spark.createDataFrame([(10, 1)], "doc_id long, rank int")
    relevant = spark.createDataFrame([(99,)], "doc_id long")
    r = R.retrieval_eval(ranking, relevant, k=5).first()
    assert (r.mrr, r.ndcg_at_k, r.precision_at_k, r.recall_at_k) == (
        0.0, 0.0, 0.0, 0.0,
    )


def test_multi_seed_restricts_to_single_seed_result(spark):
    """The batched spelling's seed_id == BM25-top-1 slice must equal
    the single-seed operator's output exactly (same pools, same fusion,
    same cut) — the batching is a plan change, not a semantics change."""
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    single = {
        (r.doc_id, r.lex_rank, r.dense_rank, r.rrf_score)
        for r in R.hybrid_rrf_retrieval(docs, emb).collect()
    }
    top1 = (
        R.bm25_retrieval(docs, top=R.RRF_POOL)
        .filter("rank = 1")
        .first()
        .doc_id
    )
    multi = {
        (r.doc_id, r.lex_rank, r.dense_rank, r.rrf_score)
        for r in R.hybrid_rrf_multi(docs, emb).collect()
        if r.seed_id == top1
    }
    assert multi == single and len(single) > 0


def test_multi_seed_emits_per_seed_topk_and_every_seed_self_tops(spark):
    """Each seed gets its own fused top-k; a seed doc is dense rank 1
    against itself AND sits in the lexical pool, so it must top its own
    seed's fused list."""
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    out = R.hybrid_rrf_multi(docs, emb).collect()
    by_seed: dict[int, list] = {}
    for r in out:
        by_seed.setdefault(r.seed_id, []).append(r)
    assert len(by_seed) == R.RRF_SEEDS
    for seed_id, rows in by_seed.items():
        assert 0 < len(rows) <= R.RRF_TOP
        best = min(rows, key=lambda r: (-r.rrf_score, r.doc_id))
        assert best.doc_id == seed_id and best.dense_rank == 1


def test_multi_seed_dense_pool_uses_salted_two_phase(spark):
    """Scale-shape pin: the per-seed dense ranking must go through the
    salted two-phase head (a window keyed on the salt cell before the
    per-seed re-rank), so no task ever buffers a seed's whole corpus
    ranking."""
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    df = R.hybrid_rrf_multi(docs, emb)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "_salt" in plan
