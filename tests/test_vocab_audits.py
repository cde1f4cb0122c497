"""Zipf vocabulary fit and BPE tokenizer fertility: planted-geometry
values and the degenerate-slice ordering they exist to detect."""

from __future__ import annotations

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import audits as AU
from m12_kafkastreams_python_azure_spark.operators import textops as T


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_zipf_slope_separates_powerlaw_from_uniform(spark):
    """A source whose word frequencies follow freq(r) ~ N/r must fit a
    slope near -1; a source where every word appears exactly once fits
    slope 0 (no frequency decay at all) — the degenerate-slice signal."""
    # power-law source: word w_r repeated ceil(60/r) times, r = 1..20
    zipf_words = []
    for r in range(1, 21):
        zipf_words += [f"w{r:02d}"] * (-(-60 // r))
    uniform_words = [f"u{i:03d}" for i in range(200)]
    rows = [
        (1, " ".join(zipf_words), "en", "zipfy", 0),
        (2, " ".join(uniform_words), "en", "flat", 0),
    ]
    out = {
        r.source: r for r in AU.zipf_vocab_audit(_docs(spark, rows)).collect()
    }
    assert out["zipfy"].n_types == 20
    assert out["flat"].n_types == 200 and out["flat"].n_tokens == 200
    assert -1.3 < out["zipfy"].zipf_slope < -0.7
    assert out["flat"].zipf_slope == 0.0
    assert out["flat"].zipf_r2 is None  # zero frequency variance: no fit
    assert out["zipfy"].zipf_r2 > 0.95


def test_zipf_single_type_slice_yields_null_fit(spark):
    """One type -> one rank -> zero rank variance: both fit columns NULL
    instead of an ANSI divide-by-zero crash (the guard the operator
    carries because degenerate slices are exactly its subject)."""
    rows = [(1, " ".join(["same"] * 30), "en", "mono", 0)]
    r = AU.zipf_vocab_audit(_docs(spark, rows)).first()
    assert r.n_types == 1 and r.n_tokens == 30
    assert r.zipf_slope is None and r.zipf_r2 is None


def test_zipf_max_rank_caps_the_fit_head(spark):
    """The regression must only see the top max_rank types (the head
    where the power law holds): capping at 5 on a 20-type source changes
    the fit, and both spellings stay deterministic."""
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * (-(-60 // r))
    rows = [(1, " ".join(words), "en", "s", 0)]
    full = AU.zipf_vocab_audit(_docs(spark, rows)).first()
    head = AU.zipf_vocab_audit(_docs(spark, rows), max_rank=5).first()
    assert full.n_types == head.n_types == 20  # totals never capped
    assert full.zipf_slope != head.zipf_slope


def test_fertility_orders_merged_vs_shattered_language(spark):
    """A language of one highly repeated 2-char word compresses to one
    token per word under the corpus BPE (its pair dominates the merge
    table); a language of long unique words shatters — fertility must
    order them, and token/word totals must be exact."""
    aa_text = " ".join(["zz"] * 50)
    bb_text = "abcdef ghijkl mnopqr stuvwx"
    rows = [
        (1, aa_text, "aa", "s", len(aa_text.replace(" ", ""))),
        (2, bb_text, "bb", "s", len(bb_text.replace(" ", ""))),
    ]
    out = {r.lang: r for r in T.tokenizer_fertility(_docs(spark, rows)).collect()}
    assert out["aa"].n_words == 50 and out["bb"].n_words == 4
    assert out["aa"].fertility == 1.0  # 'z z' is the top merge; 'zz' -> 1 token
    assert out["bb"].fertility > 2.0
    assert out["aa"].chars_per_token == 2.0


def test_fertility_rollup_is_consistent_with_bpe_encode(spark):
    """The per-lang rollup must sum exactly to bpe_encode's per-doc
    numbers — no rows dropped, no double counting."""
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    per_doc = (
        T.bpe_encode(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.sum("n_tokens").alias("t"), F.sum("n_words").alias("w"))
    )
    want = {(r.lang, r.t, r.w) for r in per_doc.collect()}
    got = {
        (r.lang, r.n_tokens, r.n_words)
        for r in T.tokenizer_fertility(docs).collect()
    }
    assert got == want
