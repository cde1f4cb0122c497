"""Quality bounds for the approximate operators: the LSH near-dup search
must recover nearly all truly-similar pairs (recall floor vs the exact
oracle-checked twin), and HLL distinct counts must sit within their
configured relative error."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.dedup import (
    jaccard,
    minhash_near_dup_pairs,
    shingles,
    simhash_near_dup_pairs,
)
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def _mutated_corpus(spark):
    """100 base docs + a near-dup twin each (1 of ~20 words changed,
    J ≈ 0.8): known ground truth (i, i+1000) for every i."""
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
             "golf", "hotel", "india", "juliet", "kilo", "lima"]
    rows = []
    for i in range(100):
        base = [words[(i * 7 + k * 3) % len(words)] for k in range(20)]
        rows.append((i, " ".join(base)))
        twin = list(base)
        twin[(i * 5) % 20] = "zulu"
        rows.append((1000 + i, " ".join(twin)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_recall_on_known_near_dups(spark):
    """Each (base, twin) pair shares ~80% of shingles; at (k=16, b=8) the
    banding probability at J=0.6 is ~97%, so recall over 100 true pairs
    must clear 85%."""
    docs = _mutated_corpus(spark)
    truth = {(i, 1000 + i) for i in range(100)}
    found = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(docs, jaccard_threshold=0.4).collect()
    }
    recall = len(truth & found) / len(truth)
    assert recall >= 0.85, f"LSH recall {recall:.2f} on {len(truth)} true pairs"
    # and everything reported really is similar (verify stage guarantees it)
    a = docs.select(F.col("doc_id").alias("id_a"), shingles(F.col("text")).alias("sh_a"))
    b = docs.select(F.col("doc_id").alias("id_b"), shingles(F.col("text")).alias("sh_b"))
    sims = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("j", jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("j") >= 0.4)
    )
    exact_pairs = {(r.id_a, r.id_b) for r in sims.collect()}
    assert found <= exact_pairs


def test_simhash_finds_exact_duplicates(spark):
    """Identical texts have identical simhash (Hamming 0) and MUST pair."""
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "a completely different sentence about spark engines"),
            (4, "unrelated words entirely here now")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in simhash_near_dup_pairs(df, max_hamming=3).collect()}
    assert pairs.get((1, 2)) == 0


def test_embedding_lsh_near_dup_bounded_by_exact(spark, sf_dir):
    """The banded sign-LSH near-dup path: every emitted pair must also be an
    exact-path pair (verify stage guarantees precision 1.0), and recall on
    strongly-similar pairs (cosine >= 0.7 — the band collision probability
    is ~0.95+ there) must clear the floor."""
    from m12_kafkastreams_python_azure_spark.operators.api import (
        embedding_near_dup_lsh,
    )
    from m12_kafkastreams_python_azure_spark.operators.similarity import (
        embedding_near_dup_exact,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    exact = {(r.id_a, r.id_b): r.sim for r in embedding_near_dup_exact(emb).collect()}
    found = {(r.id_a, r.id_b) for r in embedding_near_dup_lsh(emb).collect()}
    assert found <= set(exact), "LSH emitted a pair the exact path did not"
    # This synthetic corpus tops out near cosine 0.6 — a deliberately hard
    # regime for sign-LSH (designed for 0.8+), so the floor reflects the
    # banding probability there, not near-dup-grade recall. Deterministic
    # planes + deterministic data -> a stable measured value (0.80 at
    # sf0.001, 0.77 at sf0.1).
    assert exact, "fixture should contain near-dup pairs"
    recall = len(set(exact) & found) / len(exact)
    assert recall >= 0.6, f"recall {recall:.2f} over {len(exact)} exact pairs"


def test_hll_within_configured_error(spark, sf_dir):
    """approx_count_distinct at rsd=0.05 lands within 3 standard errors of
    the exact count (deterministic given the fixed dataset)."""
    ev = load_table(spark, sf_dir, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.05).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) <= max(1, 0.15 * row.exact), row
