"""Structural invariants for the corpus-hygiene / SCD2 / linkage wave —
properties the oracle equality check can't express (it only proves
Spark == DuckDB, not that both are right)."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import corpus as C
from m12_kafkastreams_python_azure_spark.operators import linkage as LK
from m12_kafkastreams_python_azure_spark.operators import scd as SCD
from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def test_pack_sequences_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    packed = C.pack_sequences(docs).collect()
    assert len(packed) == docs.count()  # every doc placed exactly once
    by_shard: dict[int, list] = {}
    for r in packed:
        assert 0 <= r["start_offset"] < C.PACK_BUDGET
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        # concat-then-chunk: global start position == running token sum,
        # sequence ids are the chunk index — non-decreasing, gap-free over
        # the chunks that contain at least one doc start
        cum = 0
        prev_seq = 0
        for r in rows:
            assert r["seq_in_shard"] == cum // C.PACK_BUDGET
            assert r["start_offset"] == cum % C.PACK_BUDGET
            assert r["seq_in_shard"] >= prev_seq
            prev_seq = r["seq_in_shard"]
            cum += r["n_tok"]


def test_scd2_intervals_partition_time(spark, sf_dir):
    hist = SCD.q_scd2_history(spark, sf_dir)
    # exactly one open (current) version per key
    per_key = hist.groupBy("c_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    bad = per_key.filter(F.col("n_current") != 1).count()
    assert bad == 0
    # versions per key match the planted churn (custkey % 3 + 1)
    mism = per_key.filter(
        F.col("n_versions") != (F.col("c_custkey") % 3 + 1)
    ).count()
    assert mism == 0
    # intervals chain: valid_to of version v == valid_from of v+1 (no gaps,
    # no overlaps) — check via self-join on (key, valid_to == next valid_from)
    h = hist.select("c_custkey", "valid_from", "valid_to")
    closed = h.filter(F.col("valid_to").isNotNull())
    chained = closed.join(
        h.select(
            F.col("c_custkey").alias("k2"), F.col("valid_from").alias("vf2")
        ),
        (F.col("c_custkey") == F.col("k2"))
        & (F.col("valid_to") == F.col("vf2")),
    )
    assert chained.count() == closed.count()


def test_record_linkage_full_recall_on_planted_pairs(spark, sf_dir):
    out = LK.q_record_linkage(spark, sf_dir)
    n_cust = load_table(spark, sf_dir, "customer").count()
    true_matches = out.filter("is_true_match").count()
    assert true_matches == n_cust  # suffix block key survives the deletion
    # every true pair is a single-character deletion: distance exactly 1
    assert out.filter("is_true_match AND dist != 1").count() == 0


def test_decontaminate_flags_only_train_docs(spark, sf_dir):
    out = C.q_decontaminate(spark, sf_dir)
    assert out.filter(F.col("doc_id") % C.EVAL_MOD == 0).count() == 0
    assert out.filter("n_collisions > n_grams").count() == 0
    rows = out.collect()
    assert len(rows) > 0  # discriminative: some contamination exists


# ----------------------------------------- trigram stupid-backoff LM


def test_trigram_backoff_tiers(spark):
    """One eval doc per backoff tier: fully-seen trigrams (S = c3/c2),
    unseen trigram with seen (w2,w3) bigram (S = a*c2/c1), unseen bigram
    with seen w3 (S = a^2*c1/N), and full OOV (S = a^2/N)."""
    import math

    from m12_kafkastreams_python_azure_spark.operators.corpus import (
        BACKOFF_ALPHA as A,
        trigram_backoff_score,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),   # train
            (2, "a b c d"),   # train
            (3, "a b c d"),   # eval: both trigrams seen
            (6, "b b c d"),   # eval: 'b b c' unseen, bigram 'b c' seen
            (9, "x y z w"),   # eval: full OOV floor twice
            (12, "d a d a"),  # eval: bigrams unseen, w3 seen
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in trigram_backoff_score(docs).collect()}
    n = 8.0  # train tokens

    assert rows[3]["n_backoff"] == 0
    assert rows[3]["avg_log2s"] == 0.0  # log2(1) twice

    exp6 = (math.log2(A * 2 / 2) + math.log2(1.0)) / 2
    assert rows[6]["n_backoff"] == 1
    assert abs(rows[6]["avg_log2s"] - round(exp6, 6)) < 1e-9

    exp9 = math.log2(A * A / n)
    assert rows[9]["n_backoff"] == 2
    assert abs(rows[9]["avg_log2s"] - round(exp9, 6)) < 1e-9

    exp12 = math.log2(A * A * 2 / n)
    assert rows[12]["n_backoff"] == 2
    assert abs(rows[12]["avg_log2s"] - round(exp12, 6)) < 1e-9


def test_trigram_backoff_model_never_sees_eval(spark):
    """A trigram that appears ONLY in an eval doc must not score as seen
    (train/eval leakage would make perplexity-style filtering circular)."""
    from m12_kafkastreams_python_azure_spark.operators.corpus import (
        trigram_backoff_score,
    )

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "q q q"), (6, "q q q")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in trigram_backoff_score(docs).collect()}
    # 'q q q' occurs in BOTH eval docs (3 and 6) but in no train doc:
    # it must hit the OOV floor, not count itself
    assert rows[3]["n_backoff"] == 1 and rows[6]["n_backoff"] == 1
    assert rows[3]["avg_log2s"] == rows[6]["avg_log2s"] < 0


def test_ngram_novelty_planted_duplicate(spark):
    from m12_kafkastreams_python_azure_spark.operators.audits import (
        ngram_novelty,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),   # both 4-grams first seen here
            (2, "a b c d e"),   # verbatim dup -> nothing novel
            (3, "a b c d x"),   # shares 'a b c d', adds 'b c d x'
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_novelty(docs).collect()}
    assert rows[1]["novelty"] == 1.0 and rows[1]["n_distinct_grams"] == 2
    assert rows[2]["novelty"] == 0.0
    assert rows[3]["n_novel"] == 1 and rows[3]["novelty"] == 0.5


def test_ngram_novelty_hashed_equals_string_grams(spark, sf_dir):
    """The hashed-gram shuffle (production default) must produce the
    EXACT output of the string-gram spelling — hashing only renames the
    internal shuffle keys."""
    from m12_kafkastreams_python_azure_spark.operators.audits import (
        ngram_novelty,
    )
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    hashed = sorted(map(tuple, ngram_novelty(docs, use_hashed_grams=True).collect()))
    strings = sorted(map(tuple, ngram_novelty(docs, use_hashed_grams=False).collect()))
    assert hashed == strings


# ------------------------------------- bloom-prefiltered decontamination


def test_bloom_decontaminate_equals_broadcast_decontaminate(spark, sf_dir):
    """The bloom is a transparent prefilter: output must equal the
    broadcast-semi-join spelling EXACTLY (false positives die in the
    confirm join, false negatives are impossible by construction)."""
    from m12_kafkastreams_python_azure_spark.operators.corpus import (
        decontaminate,
        decontaminate_bloom,
    )
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, decontaminate(docs).collect()))
    b = sorted(map(tuple, decontaminate_bloom(docs).collect()))
    assert a == b
    assert len(a) > 0  # the planted eval overlap must actually fire


def test_prebuilt_bloom_artifact_matches_per_call_build(spark, sf_dir):
    """build_decontam_bloom once + N decontaminate_bloom calls (the
    amortized 100 TB lifecycle, VERDICT r12 #3) must produce exactly the
    per-call-build output — on the full corpus AND on shard subsets
    (the batch mirror of the streaming processor's build-once
    discipline)."""
    from pyspark.sql import functions as F

    from m12_kafkastreams_python_azure_spark.operators.corpus import (
        build_decontam_bloom,
        decontaminate_bloom,
    )
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    art = build_decontam_bloom(docs)
    full_pre = sorted(map(tuple, decontaminate_bloom(docs, bloom=art).collect()))
    full_def = sorted(map(tuple, decontaminate_bloom(docs).collect()))
    assert full_pre == full_def and len(full_pre) > 0
    # shard reuse: screening half the train corpus against the SAME
    # artifact returns exactly that half's rows
    shard = docs.filter(F.col("doc_id") % 2 == 0)
    shard_rows = sorted(
        map(tuple, decontaminate_bloom(shard, bloom=art).collect())
    )
    expected = sorted(t for t in full_pre if t[0] % 2 == 0)
    assert shard_rows == expected


def test_prebuilt_bloom_rejects_mismatched_ngram_order(spark, sf_dir):
    import pytest

    from m12_kafkastreams_python_azure_spark.operators.corpus import (
        DECONTAM_N,
        build_decontam_bloom,
        decontaminate_bloom,
    )
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    art = build_decontam_bloom(docs, n=DECONTAM_N)
    with pytest.raises(ValueError):
        decontaminate_bloom(docs, n=DECONTAM_N + 1, bloom=art)


def test_bloom_has_no_false_negatives(spark):
    """Every member of the build set must pass might_contain — the
    bloom guarantee the exactness proof rests on."""
    from m12_kafkastreams_python_azure_spark.operators.corpus import (
        bloom_might_contain,
        build_gram_bloom,
    )
    from pyspark.sql import functions as F

    grams = spark.createDataFrame(
        [(f"gram number {i}",) for i in range(500)], "gram string"
    )
    bloom, m_bits = build_gram_bloom(grams)
    n_pass = grams.filter(
        bloom_might_contain(bloom, m_bits, F.col("gram"))
    ).count()
    assert n_pass == 500


def test_bloom_prunes_non_members(spark):
    """~1% FP rate at 10 bits/item: the overwhelming majority of a
    disjoint probe set must be rejected by the prefilter alone."""
    from m12_kafkastreams_python_azure_spark.operators.corpus import (
        bloom_might_contain,
        build_gram_bloom,
    )
    from pyspark.sql import functions as F

    build = spark.createDataFrame(
        [(f"member {i}",) for i in range(500)], "gram string"
    )
    probe = spark.createDataFrame(
        [(f"outsider {i}",) for i in range(2000)], "gram string"
    )
    bloom, m_bits = build_gram_bloom(build)
    fp = probe.filter(bloom_might_contain(bloom, m_bits, F.col("gram"))).count()
    assert fp < 2000 * 0.05  # generous bound over the ~1% design point
