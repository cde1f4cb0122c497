"""CCNet perplexity bucketing: planted-score ordering, tercile shape,
and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import corpus as C
from m12_kafkastreams_python_azure_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_planted_scores_order_buckets(spark):
    """Under the corpus-fit bigram MLE, a doc made of one repeated
    bigram scores log2(1)=0 (every transition certain); docs sharing
    diverse bigrams score negative. The repeated doc must land in head,
    the most surprising in tail."""
    rows = [
        # 3 docs, one lang: perfectly predictable / mixed / diverse
        (1, "x x x x x x x x", "aa"),
        (2, "a b a b c d c d", "aa"),
        (3, "a b c d e f g h", "aa"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {(r.bucket): r for r in C.ccnet_buckets(docs).collect()}
    assert set(out) == {"head", "middle", "tail"}
    assert out["head"].n_docs == 1 and out["tail"].n_docs == 1
    assert out["head"].mean_log2p == 0.0
    assert out["head"].mean_log2p > out["middle"].mean_log2p > out["tail"].mean_log2p


def test_terciles_split_each_language_evenly(spark):
    docs = load_table(spark, SF, "documents")
    out = C.ccnet_buckets(docs)
    per = (
        out.groupBy("lang")
        .pivot("bucket", ["head", "middle", "tail"])
        .sum("n_docs")
        .collect()
    )
    for r in per:
        total = (r.head or 0) + (r.middle or 0) + (r.tail or 0)
        assert total > 0
        # terciles: no bucket may deviate by more than 1 from n/3
        for b in (r.head, r.middle, r.tail):
            assert abs((b or 0) - total / 3) <= 1, r
    # head must outscore tail in every language
    rows = {(r.lang, r.bucket): r.mean_log2p for r in out.collect()}
    langs = {k[0] for k in rows}
    for lang in langs:
        assert rows[(lang, "head")] > rows[(lang, "tail")]


def test_bucketing_is_deterministic(spark):
    docs = load_table(spark, SF, "documents")
    a = sorted(map(tuple, C.ccnet_buckets(docs).collect()))
    b = sorted(map(tuple, C.ccnet_buckets(docs).collect()))
    assert a == b


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_approx_thresholds_have_no_window(spark):
    """The web-scale path (VERDICT r12 #2) must not buffer a language on
    a reducer: no Window operator anywhere in the plan — the cutoffs are
    a percentile_approx aggregate joined back. The exact default keeps
    its per-language window (the oracle-parity spelling)."""
    docs = load_table(spark, SF, "documents")
    approx_plan = explain_str(C.ccnet_buckets(docs, thresholds="approx"))
    assert "Window" not in approx_plan
    assert "approx_percentile" in approx_plan or "percentile_approx" in approx_plan
    exact_plan = explain_str(C.ccnet_buckets(docs, thresholds="exact"))
    assert "Window" in exact_plan


def test_approx_thresholds_match_exact_within_sketch_tolerance(spark):
    """Parity at sf0.1 (10x the driver's correctness tier — the tier the
    round-11 robustness sweep established): per-(lang, bucket) counts
    from the approx path must sit within the documented band — the
    sketch's <=0.01% rank error plus the tie width at the cutoff (the
    exact path splits tied scores by doc_id; the threshold comparison
    cannot). Scores are rounded to 6 places by the scorer, so cutoff
    ties are real but narrow on this corpus."""
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    exact = {
        (r.lang, r.bucket): r.n_docs
        for r in C.ccnet_buckets(docs, thresholds="exact").collect()
    }
    approx = {
        (r.lang, r.bucket): r.n_docs
        for r in C.ccnet_buckets(docs, thresholds="approx").collect()
    }
    assert set(exact) == set(approx)
    lang_totals: dict[str, int] = {}
    for (lang, _), n in exact.items():
        lang_totals[lang] = lang_totals.get(lang, 0) + n
    # tie width at the cutoffs: the largest same-score cohort per language
    # bounds how many docs a threshold decision can move between buckets
    from m12_kafkastreams_python_azure_spark.operators.corpus import (
        bigram_lm_score,
    )

    ties = {
        r.lang: r.w
        for r in (
            bigram_lm_score(docs)
            .join(docs.select("doc_id", "lang"), "doc_id")
            .groupBy("lang", "avg_log2p")
            .count()
            .groupBy("lang")
            .agg(F.max("count").alias("w"))
            .collect()
        )
    }
    for key, n_exact in exact.items():
        lang = key[0]
        band = max(2, ties[lang], round(0.0001 * lang_totals[lang]) + 1)
        assert abs(approx[key] - n_exact) <= band, (key, n_exact, approx[key], band)


def test_default_is_exact_and_bad_value_raises(spark):
    import pytest

    docs = load_table(spark, SF, "documents")
    a = sorted(map(tuple, C.ccnet_buckets(docs).collect()))
    b = sorted(map(tuple, C.ccnet_buckets(docs, thresholds="exact").collect()))
    assert a == b
    with pytest.raises(ValueError):
        C.ccnet_buckets(docs, thresholds="median")


def test_zero_bigram_docs_route_to_unscored_bucket(spark):
    """ADVICE r14: a doc the scorer yields no score for (fewer than two
    tokens -> zero bigrams) must appear in an explicit 'unscored' bucket
    on BOTH threshold paths — not silently vanish from the rollup — and
    must not perturb the scorable docs' tercile split."""
    rows = [
        (1, "x x x x x x x x", "aa"),
        (2, "a b a b c d c d", "aa"),
        (3, "a b c d e f g h", "aa"),
        (4, "solo", "aa"),       # 1 token: zero bigrams
        (5, "", "aa"),           # empty: zero bigrams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    for mode in ("exact", "approx"):
        out = {r.bucket: r for r in C.ccnet_buckets(docs, thresholds=mode).collect()}
        assert out["unscored"].n_docs == 2, (mode, out)
        assert out["unscored"].mean_log2p is None
        assert out["unscored"].worst_log2p is None
        # every scorable doc still lands in a scored bucket (the approx
        # path's threshold-vs-rank tie handling may shape the split
        # differently on a 3-doc language — the documented divergence)
        scored_n = sum(r.n_docs for b, r in out.items() if b != "unscored")
        assert scored_n == 3, (mode, out)
    # the exact path's tercile split is unchanged by the unscored rows
    exact = {r.bucket: r for r in C.ccnet_buckets(docs).collect()}
    assert exact["head"].n_docs == 1 and exact["tail"].n_docs == 1, exact
    # every input doc lands in exactly one bucket
    total = sum(
        r.n_docs for r in C.ccnet_buckets(docs).collect()
    )
    assert total == len(rows)
