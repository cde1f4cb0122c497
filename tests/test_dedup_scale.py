"""Skew demonstration for LSH dedup at scale: a planted mega-bucket (3k
identical boilerplate docs) must not pin a task on a quadratic bucket
expansion, while recall on planted true near-dup pairs stays above the
floor (a true pair has b-1 other bands to surface through).

The unguarded cost is asserted analytically (sum of C(bucket,2) over the
banded buckets) instead of executing the quadratic plan — running the
multi-million-pair expansion this test exists to prevent would defeat the point.

Overflow semantics (round 5): an oversized bucket is STAR-expanded
(min-id hub -> every other member, linear) instead of dropped — the
mega-cluster stays discoverable and connected for CC clustering, at
O(bucket) cost per band instead of O(bucket^2).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.dedup import (
    minhash_near_dup_pairs,
    minhash_signature,
    shingles,
)

BOILERPLATE = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet", "kilo", "lima"]
N_BOILER = 3_000  # 3x the max_bucket cap; C(3k,2)=4.5M unguarded pairs
N_TWINS = 100


def _skewed_corpus(spark):
    """N_BOILER identical docs (the mega-bucket) + 100 (base, twin)
    near-dup pairs with known ids: truth = {(50000+i, 100000+i)}."""
    rows = [(i, BOILERPLATE) for i in range(N_BOILER)]
    for i in range(N_TWINS):
        base = [WORDS[(i * 7 + k * 3) % len(WORDS)] for k in range(20)]
        rows.append((50_000 + i, " ".join(base)))
        twin = list(base)
        twin[(i * 5) % 20] = "zulu"
        rows.append((100_000 + i, " ".join(twin)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_mega_bucket_guard_bounds_expansion_and_keeps_recall(spark):
    docs = _skewed_corpus(spark)

    # 1) The planted skew is real: compute banded bucket sizes the same way
    #    the operator does and show the unguarded pair expansion would be
    #    quadratic (>= C(N_BOILER, 2) pairs in ONE task's bucket).
    num_hashes, bands, rows_per_band, max_bucket = 16, 8, 2, 1000
    sig = (
        docs.select("doc_id", shingles(F.col("text")).alias("sh"))
        .filter(F.size("sh") > 0)
        .withColumn("hb", F.transform(F.col("sh"), lambda s: F.xxhash64(s)))
        .withColumn("sig", minhash_signature(F.col("hb"), num_hashes))
    )
    banded = sig.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band))
                ).alias("bh")
                for b in range(bands)
            ])
        ).alias("bh"),
    )
    sizes = banded.groupBy("bh").count()
    unguarded_pairs = sizes.select(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
    ).first().p
    guarded_pairs = sizes.filter(F.col("count") <= max_bucket).select(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p")
    ).first().p or 0
    assert unguarded_pairs >= N_BOILER * (N_BOILER - 1) / 2, unguarded_pairs
    # guard keeps the worst bucket's expansion out: >= 3 orders of magnitude
    assert guarded_pairs < unguarded_pairs / 1000, (guarded_pairs, unguarded_pairs)

    # 2) The guarded operator completes and recall on the planted TRUE
    #    near-dup pairs clears the floor (twins land in small buckets,
    #    untouched by the guard).
    found = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(
            docs, jaccard_threshold=0.4, max_bucket=max_bucket
        ).collect()
    }
    truth = {(50_000 + i, 100_000 + i) for i in range(N_TWINS)}
    recall = len(truth & found) / len(truth)
    assert recall >= 0.85, f"recall {recall:.2f} with mega-bucket guard on"
    # 3) Overflow path: the boilerplate mega-group contributed EXACTLY a
    #    star — linear in bucket size (N_BOILER-1 spokes from hub id 0),
    #    not the quadratic pair set, and not zero (the cluster must stay
    #    connected for the CC clustering stage).
    boiler = {(a, b) for a, b in found if a < 50_000}
    assert len(boiler) == N_BOILER - 1, len(boiler)
    assert all(a == 0 for a, _ in boiler), "star hub must be the min id"
    assert {b for _, b in boiler} == set(range(1, N_BOILER))


def test_star_pairs_safe_under_duplicate_ids(spark):
    """star_pairs must stay self-protecting if a caller ever feeds it
    duplicate ids: the hub side is sized off the post-remove spoke array,
    so duplicated hub values can't produce null-padded (hub, null) structs
    or misaligned zip_with sides (round-5 ADVICE)."""
    from m12_kafkastreams_python_azure_spark.operators.dedup import star_pairs

    df = spark.createDataFrame(
        [([3, 1, 1, 7, 5],), ([2, 2],), ([9],)], "ids array<long>"
    ).select(star_pairs(F.col("ids")).alias("pairs"))
    got = [sorted((p.id_a, p.id_b) for p in r.pairs) for r in df.collect()]
    # duplicated hub (1 twice): every copy removed, spokes = {3, 7, 5}
    assert got[0] == [(1, 3), (1, 5), (1, 7)]
    # all-duplicate bucket: no spokes left, empty star (no null structs)
    assert got[1] == []
    # singleton bucket: nothing to pair
    assert got[2] == []
    flat = [p for pairs in got for p in pairs]
    assert all(a is not None and b is not None for a, b in flat)


def test_exact_collapse_expansion_on_duplicated_corpus(spark, sf_dir):
    """The collapse_exact pre-pass (the production stage in front of every
    near-dup pass; sf1 is 10x-replicated by construction) must (a) never
    lose a pair the uncollapsed LSH finds, (b) emit EVERY exact-duplicate
    pair at the exact-dup metric (Jaccard 1.0), and (c) preserve the
    verified metric on cross-group pairs."""
    from m12_kafkastreams_python_azure_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # 2x-replicated corpus with shifted ids (the gen_sf1 recipe in small)
    SHIFT = 1_000_000
    dup = docs.unionByName(
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(SHIFT))
    )
    on = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(dup, collapse_exact=True).collect()
    }
    off = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_near_dup_pairs(dup, collapse_exact=False).collect()
    }
    # (a) recall can only improve, and shared pairs carry identical metrics
    assert set(off) <= set(on)
    assert all(on[k] == v for k, v in off.items())
    # (b) every (d, d+SHIFT) exact-dup pair is present at exactly 1.0
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    for d in ids:
        assert on.get((d, d + SHIFT)) == 1.0


def test_collapse_does_not_emit_null_metric_pairs(spark):
    """NULL texts / NULL and zero-norm vectors are dropped by the
    uncollapsed paths (NULL metric never passes the verify filter) — the
    collapse branch must not resurrect them as within-group pairs."""
    from m12_kafkastreams_python_azure_spark.operators.api import (
        embedding_near_dup_lsh,
    )
    from m12_kafkastreams_python_azure_spark.operators.dedup import (
        minhash_near_dup_pairs,
        simhash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "a b"), (4, "a b"), (5, "x y z w v u t s")],
        "doc_id long, text string",
    )
    # minhash treats a NULL/short text as the single ''-shingle set (so
    # identical NULLs legitimately pair at Jaccard 1.0 — in BOTH paths);
    # the collapse branch must match the uncollapsed output exactly
    mh_on = {tuple(r) for r in minhash_near_dup_pairs(docs, collapse_exact=True).collect()}
    mh_off = {tuple(r) for r in minhash_near_dup_pairs(docs, collapse_exact=False).collect()}
    assert mh_on == mh_off == {(3, 4, 1.0), (1, 2, 1.0)}
    # simhash DROPS NULL-simhash (token-free) texts in the uncollapsed
    # path — the collapse branch must not resurrect them
    sh = simhash_near_dup_pairs(docs, collapse_exact=True).collect()
    assert all(r["hamming"] is not None for r in sh)
    assert not any(r["id_a"] in (1, 2) or r["id_b"] in (1, 2) for r in sh)
    emb = spark.createDataFrame(
        [(1, None), (2, None), (3, [0.0, 0.0]), (4, [0.0, 0.0]),
         (5, [1.0, 0.0]), (6, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    pairs = embedding_near_dup_lsh(emb, dim=2, collapse_exact=True).collect()
    assert all(r["sim"] is not None for r in pairs)
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(5, 6)}
