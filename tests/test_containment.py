"""n-gram containment near-dup: planted subsumption recall, the
asymmetry Jaccard misses, and the ubiquity guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import dedup as D
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_excerpt_has_full_containment_but_low_jaccard(spark):
    """A 6-token excerpt of a 20-token doc: containment 1.0 (every
    excerpt gram is in the original), Jaccard well under any dedup
    threshold — the pair symmetric near-dup misses by construction."""
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc wd we wf wg wh wi wj"
    rows = [(1, base), (2, "w0 w1 w2 w3 w4 w5")]
    out = D.containment_pairs(_docs(spark, rows), threshold=0.8).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment == 1.0
    # the excerpt side is the fully-contained one; the long side is not
    assert r.containment_b == 1.0 and r.containment_a < 0.3
    # symmetric Jaccard on the same pair is far below the 0.5 dedup bar
    j = D.jaccard(
        D.shingles(F.lit(base)), D.shingles(F.lit("w0 w1 w2 w3 w4 w5"))
    )
    assert spark.range(1).select(j.alias("j")).first().j < 0.3


def test_unrelated_docs_emit_nothing(spark):
    rows = [(1, "a b c d e f g"), (2, "p q r s t u v")]
    assert D.containment_pairs(_docs(spark, rows)).count() == 0


def test_ubiquitous_grams_do_not_generate_candidates(spark):
    """A gram shared by more than max_df docs must be excluded from both
    candidate generation and the denominators: 100 docs sharing ONLY a
    boilerplate sentence emit zero pairs at max_df=8."""
    boiler = "all rights reserved contact us today"
    rows = [(i, f"unique{i} token{i} {boiler}") for i in range(100)]
    out = D.containment_pairs(_docs(spark, rows), max_df=8)
    assert out.count() == 0


def test_planted_clone_recall_on_the_fixture(spark):
    """Every planted prefix clone must pair with its source at
    containment 1.0 (clone grams are a subset of the source's; both
    sides' sizes use the SAME df-filtered gram universe)."""
    docs = load_table(spark, SF, "documents")
    out = D.containment_pairs(D.docs_with_planted_contained(docs)).collect()
    planted = {
        (r.id_a, r.id_b): r
        for r in out
        if r.id_b - D.CONTAIN_CLONE_SHIFT == r.id_a
    }
    n_expected = docs.filter(F.col("doc_id") % 20 == 0).count()
    assert len(planted) == n_expected
    assert all(r.containment == 1.0 for r in planted.values())


def test_replicated_corpus_keeps_full_recall(spark):
    """The duplicate law (VERDICT r13 #1): containment is a bucketed
    candidate generator, so exact duplicates must collapse to min-id
    representatives BEFORE the gram explode. Without it, a 10x-replicated
    corpus pushes every shared gram's document frequency past max_df, the
    ubiquity anti-join drops those grams from candidates AND denominators,
    and the planted excerpt pair silently vanishes. With it, the
    replicated corpus must reproduce the unreplicated answer exactly."""
    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 wa wb wc wd we wf wg wh wi wj"
    rows = [(1, base), (2, "w0 w1 w2 w3 w4 w5"), (3, "p q r s t u v x y z")]
    docs = _docs(spark, rows)
    shift = 1000
    rep = docs
    for i in range(1, 11):
        rep = rep.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * shift))
        )
    out = D.containment_pairs(rep, max_df=8).collect()
    assert len(out) == 1
    r = out[0]
    # min-id representatives only: the original ids, full containment
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment == 1.0
    # and the replicated answer IS the unreplicated answer
    base_out = D.containment_pairs(docs, max_df=8).collect()
    assert [(x.id_a, x.id_b, x.containment) for x in base_out] == [
        (r.id_a, r.id_b, r.containment)
    ]


def test_duplicate_ids_never_emit_self_pairs(spark):
    """Belt-and-braces guard: a caller feeding literally duplicate
    doc_ids (same id, same text — e.g. an upstream union bug) must not
    produce id_a == id_b rows or double-counted pairs."""
    rows = [
        (1, "w0 w1 w2 w3 w4 w5 w6 w7"),
        (1, "w0 w1 w2 w3 w4 w5 w6 w7"),
        (2, "w0 w1 w2 w3 w4 w5"),
    ]
    out = D.containment_pairs(_docs(spark, rows)).collect()
    assert all(r.id_a != r.id_b for r in out)
    assert len(out) == len({(r.id_a, r.id_b) for r in out})


def test_clone_shift_clears_the_sf1_replica_id_space(spark):
    """ADVICE r13: gen_sf1.py shifts replica i's keys by i*10_000_000, so
    sf1 doc_ids reach ~10^8; the planted-clone shift must sit strictly
    above that or clone ids alias real replica ids."""
    assert D.CONTAIN_CLONE_SHIFT > 10 * 10_000_000
