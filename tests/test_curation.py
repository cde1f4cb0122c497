"""Behavioral invariants for the round-6 curation wave
(``operators/curation.py``) on PLANTED data — the oracle sweep
(``test_oracle.py``) covers parity on the driver tables; these tests pin
the semantics the oracle can't see failing (e.g. that a planted
boilerplate segment actually disappears, or that domain_cap's salted
two-phase is partitioning-invariant).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import curation as CU

BOILER = "w1 w2 w3 w4 w5 w6 w7 w8"  # exactly SEG_WORDS words


@pytest.fixture(scope="module")
def planted_docs(spark):
    uniq = ["alpha beta gamma delta epsilon zeta eta theta"][0]
    rows = [
        # 3 docs sharing the same leading 8-word segment -> boilerplate
        (1, f"{BOILER} doc one tail words here and now okay"),
        (2, f"{BOILER} doc two different tail entirely for this"),
        (3, f"{BOILER} doc three yet another tail of words"),
        # a doc with a unique 8-word segment -> kept intact
        (4, f"{uniq} unique tail"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_boilerplate_segment_is_removed(planted_docs):
    out = {
        r["doc_id"]: r
        for r in CU.segment_dedup(planted_docs).collect()
    }
    for d in (1, 2, 3):
        assert out[d]["n_boiler"] == 1
        assert BOILER not in out[d]["kept_text"]
        # the non-boilerplate remainder survives in order
        assert out[d]["kept_text"].startswith("doc")
    assert out[4]["n_boiler"] == 0
    assert out[4]["kept_text"] == planted_docs.filter("doc_id=4").first()["text"]


def test_segment_dedup_all_boiler_doc_keeps_empty_text(spark):
    # every segment shared by all 3 docs -> kept_text must be '' (not null)
    docs = spark.createDataFrame(
        [(i, BOILER) for i in range(3)], "doc_id long, text string"
    )
    for r in CU.segment_dedup(docs).collect():
        assert r["kept_text"] == ""
        assert r["n_segments"] == r["n_boiler"] == 1


def test_chunk_documents_covers_every_word_in_order(spark):
    n_words = 100
    text = " ".join(f"t{i}" for i in range(n_words))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = sorted(
        CU.chunk_documents(docs).collect(), key=lambda r: r["chunk_idx"]
    )
    # stride coverage: chunk i starts at word i*stride
    rebuilt = []
    for r in chunks:
        words = r["chunk_text"].split(" ")
        assert r["n_tokens"] == len(words)
        assert len(words) <= CU.CHUNK_WORDS
        start = r["chunk_idx"] * CU.CHUNK_STRIDE
        assert words == [f"t{i}" for i in range(start, min(start + len(words), n_words))]
        rebuilt.extend(words)
    assert set(rebuilt) == {f"t{i}" for i in range(n_words)}
    # no chunk window starts past the end
    assert chunks[-1]["chunk_idx"] * CU.CHUNK_STRIDE < n_words


def test_chunk_documents_short_doc_is_one_chunk(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    rows = CU.chunk_documents(docs).collect()
    assert len(rows) == 1
    assert rows[0]["chunk_text"] == "a b c"
    assert rows[0]["n_tokens"] == 3


def test_domain_cap_is_partitioning_invariant(spark):
    # 1 mega-source (60 docs) + 1 small source (3 docs); result must be the
    # same whether the input arrives in 1 partition or 16.
    rows = [(i, "big", 1000 - i) for i in range(60)] + [
        (100 + i, "small", 10 + i) for i in range(3)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got_1 = {
        (r["doc_id"], r["rk"]) for r in CU.domain_cap(docs.coalesce(1)).collect()
    }
    got_16 = {
        (r["doc_id"], r["rk"]) for r in CU.domain_cap(docs.repartition(16)).collect()
    }
    assert got_1 == got_16
    # cap respected; small source fully kept with dense ranks
    assert sum(1 for d, _ in got_1 if d < 100) == CU.DOMAIN_CAP
    assert {(d, r) for d, r in got_1 if d >= 100} == {(102, 1), (101, 2), (100, 3)}
    # ranks follow n_chars DESC: doc 0 (n_chars=1000) is rank 1
    assert (0, 1) in got_1


def test_semantic_dedup_keeps_min_id_representative(spark):
    # cluster 0: ids 10 and 20 identical (cos=1) -> 20 dropped, 10 kept;
    # id 30 orthogonal -> kept. cluster 1: same vector as id 20 but a
    # different cluster -> NOT compared, kept.
    rows = [
        (10, [1.0, 0.0, 0.0, 0.0], 0),
        (20, [1.0, 0.0, 0.0, 0.0], 0),
        (30, [0.0, 1.0, 0.0, 0.0], 0),
        (40, [1.0, 0.0, 0.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    kept = {r["vec_id"] for r in CU.semantic_dedup(emb, dim=4).collect()}
    assert kept == {10, 30, 40}


def test_semantic_dedup_is_salt_invariant(spark, sf_dir):
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    kept_1 = {r["vec_id"] for r in CU.semantic_dedup(emb, salt=1).collect()}
    kept_8 = {r["vec_id"] for r in CU.semantic_dedup(emb, salt=8).collect()}
    assert kept_1 == kept_8
    assert 0 < len(kept_8) < emb.count()  # non-degenerate on driver data


def test_semantic_dedup_plan_is_cluster_blocked(spark):
    # the pairwise join must be an equi-join on the cluster id, not a
    # cartesian/BNLJ over all pairs
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0], 0), (2, [0.0, 1.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    plan = CU.semantic_dedup(emb, dim=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_dedup_null_and_zero_vectors_survive(spark):
    # NULL cosine can neither dominate nor be dominated: NULL/zero-norm
    # rows must ALL survive, collapsed or not (the collapse routes them
    # around the rep-grouping instead of dropping non-reps)
    rows = [
        (1, [1.0, 0.0], 0), (2, [1.0, 0.0], 0),   # exact dups: keep 1 only
        (3, None, 0), (4, None, 0),                # identical NULLs: keep both
        (5, [0.0, 0.0], 0), (6, [0.0, 0.0], 0),    # identical zeros: keep both
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    for collapse in (True, False):
        kept = {r["vec_id"] for r in CU.semantic_dedup(emb, dim=2, collapse_exact=collapse).collect()}
        assert kept == {1, 3, 4, 5, 6}, (collapse, kept)


def test_semantic_dedup_tau_ge_1_falls_back_to_uncollapsed(spark):
    # at tau >= 1 the collapse proof doesn't hold (float self-cosine may
    # round below 1) — the collapsed path must not silently diverge
    rows = [(1, [1.0, 0.5, 0.25], 0), (2, [1.0, 0.5, 0.25], 0)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    # tau = 1.0 exactly, and tau inside the float-rounding band just
    # below 1 (where a self-cosine can round below tau): both must fall
    # back to the uncollapsed plan rather than diverge
    for tau in (1.0, 1.0 - 1e-12):
        on = {r["vec_id"] for r in CU.semantic_dedup(emb, tau=tau, dim=3, collapse_exact=True).collect()}
        off = {r["vec_id"] for r in CU.semantic_dedup(emb, tau=tau, dim=3, collapse_exact=False).collect()}
        assert on == off, tau


def test_dup_span_coverage_catches_shifted_boilerplate(spark):
    """A boilerplate run that appears at DIFFERENT offsets in different
    docs (which segment_dedup's fixed segmentation can miss) must still
    be flagged by the overlapping-span metric; a fully unique doc scores
    dup_frac 0."""
    run = " ".join(f"b{i}" for i in range(CU.DUP_SPAN_N))  # 8-word boilerplate
    docs = spark.createDataFrame(
        [
            (1, f"{run} unique1a unique1b unique1c"),
            (2, f"lead2a lead2b lead2c {run}"),       # same run, shifted offset
            (3, "only original words appear in here nothing shared today ok"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in CU.dup_span_coverage(docs).collect()}
    # docs 1 and 2: exactly the 8 boilerplate words covered
    assert out[1]["n_covered"] == CU.DUP_SPAN_N
    assert out[2]["n_covered"] == CU.DUP_SPAN_N
    assert out[1]["dup_frac"] > 0.6 and out[2]["dup_frac"] > 0.6
    assert out[3]["n_covered"] == 0 and out[3]["dup_frac"] == 0.0


def test_quality_percentile_filter_is_per_language(spark):
    """The cutoff must be per-LANG: a language whose scores are uniformly
    low still keeps its own top quantile (stratification — one language's
    distribution cannot starve another's)."""
    # lang 'aa': clean alpha text (high score); lang 'zz': digit-heavy
    # (low alpha_ratio -> low score). Both must appear in the output.
    rows = [(i, "the quick brown fox jumps over the lazy dog again", "aa")
            for i in range(8)]
    rows += [(100 + i, "00 11 22 33 44 55 66 77 88 99 " + "0" * (i + 1), "zz")
             for i in range(8)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = CU.quality_percentile_filter(docs).collect()
    langs = {r["lang"] for r in out}
    assert langs == {"aa", "zz"}
    # every emitted row's score >= its own language's cutoff
    assert all(r["quality_score"] >= r["lang_cut"] for r in out)
    # the low-scoring language's cutoff is strictly below the high one's
    cuts = {r["lang"]: r["lang_cut"] for r in out}
    assert cuts["zz"] < cuts["aa"]


def test_quality_percentile_approx_matches_exact_on_driver_tier(spark, sf_dir):
    """The production default (percentile_approx, bounded per-group sketch
    memory) and the oracle-parity exact path must select the same rows on
    the test tier — the documented tolerance is <=1 boundary row per
    language at accuracy 1e4 (observed-value vs interpolated-cut
    disagreement exactly at the quantile boundary)."""
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = CU.parallel_scan(load_table(spark, sf_dir, "documents"))
    approx = {r["doc_id"] for r in
              CU.quality_percentile_filter(docs, approx=True).collect()}
    exact = {r["doc_id"] for r in
             CU.quality_percentile_filter(docs, approx=False).collect()}
    n_langs = docs.select("lang").distinct().count()
    assert len(approx ^ exact) <= n_langs, (
        f"approx/exact diverge by {len(approx ^ exact)} rows "
        f"(> {n_langs} languages)"
    )


def test_dup_span_hashed_grams_match_string_grams(spark, sf_dir):
    """use_hashed_grams=True (8-byte shuffle keys, the production default)
    must produce byte-identical output to the string-gram path the DuckDB
    oracle mirrors — on real driver-tier text, not just planted docs."""
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = CU.parallel_scan(load_table(spark, sf_dir, "documents"))
    hashed = sorted(
        CU.dup_span_coverage(docs, use_hashed_grams=True).collect()
    )
    strings = sorted(
        CU.dup_span_coverage(docs, use_hashed_grams=False).collect()
    )
    assert hashed == strings


# ------------------------------------------------------------ url dedup (r18)

def test_url_canonicalize_rules(spark):
    """Every canonicalization rule on a hand-built case each."""
    cases = [
        # (raw, canonical)
        ("http://example.com/a", "https://example.com/a"),          # scheme
        ("https://WWW.Example.COM/a", "https://example.com/a"),     # case+www
        ("https://example.com/a/", "https://example.com/a"),        # slash
        ("https://example.com/a#frag", "https://example.com/a"),    # fragment
        ("https://example.com/a?utm_source=x&q=1",
         "https://example.com/a?q=1"),                              # tracking
        ("https://example.com/a?b=2&a=1",
         "https://example.com/a?a=1&b=2"),                          # sort
        ("https://example.com/a?utm_campaign=c&fbclid=z&gclid=y",
         "https://example.com/a"),                                  # all dropped
        ("https://example.com", "https://example.com"),             # no path
        ("https://wwwx.example.com/a", "https://wwwx.example.com/a"),  # not www.
        # ADVICE r18 #3: only the FIRST '?' delimits the query — a second
        # literal '?' is query content and must survive in full
        ("https://example.com/a?b=1?c=2", "https://example.com/a?b=1?c=2"),
        ("https://example.com/a?b=2?x&a=1",
         "https://example.com/a?a=1&b=2?x"),
    ]
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(cases)],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.canonical_url for r in CU.url_canonicalize(df).collect()
    }
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_dedup_collapses_spelling_variants(spark):
    rows = [
        (10, "http://www.shop.example/item/7?utm_source=mail"),
        (11, "https://shop.example/item/7/"),
        (12, "https://SHOP.example/item/7#reviews"),
        (13, "https://shop.example/item/8"),  # different page
    ]
    out = {
        r.canonical_url: (r.kept_doc_id, r.n_docs)
        for r in CU.url_dedup(
            spark.createDataFrame(rows, "doc_id long, url string")
        ).collect()
    }
    assert out == {
        "https://shop.example/item/7": (10, 3),
        "https://shop.example/item/8": (13, 1),
    }


def test_url_dedup_plan_is_one_hash_agg(spark, sf_dir):
    """Scale pin: canonicalization is narrow; the dedup is ONE hash
    aggregate — no window, no join, exactly one exchange (the groupBy)."""
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    df = CU.url_dedup(CU.docs_with_urls(load_table(spark, sf_dir, "documents")))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    tree = plan.split("\n\n")[0]
    assert "Window" not in tree and "Join" not in tree
    assert tree.count("Exchange") == 1
    assert "HashAggregate" in tree


def test_url_canonicalize_streams_stateless(spark, tmp_path):
    """url_canonicalize is a stateless narrow pass: the SAME code runs
    unchanged on a streaming DataFrame (append mode, no state store) and
    emits exactly the batch canonical forms. (The dedup itself is the
    stateful half — batch url_dedup, or streaming dropDuplicates on
    canonical_url with first-seen keep semantics.)"""
    import json as _json

    rows = [
        (1, "http://www.shop.example/item/7?utm_source=mail"),
        (2, "https://SHOP.example/item/7/"),
        (3, "https://shop.example/item/8#reviews"),
    ]
    d = tmp_path / "urls"
    d.mkdir()
    with open(d / "p0.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps({"doc_id": r[0], "url": r[1]}) + "\n")
    stream = spark.readStream.schema("doc_id long, url string").json(str(d))
    out = CU.url_canonicalize(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("url_canon_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r.doc_id, r.canonical_url)
        for r in spark.sql("SELECT * FROM url_canon_stream").collect()
    }
    assert got == {
        (1, "https://shop.example/item/7"),
        (2, "https://shop.example/item/7"),
        (3, "https://shop.example/item/8"),
    }


def test_url_tracking_params_case_insensitive_and_valueless(spark):
    """'?UTM_SOURCE=x' and a bare '?fbclid' are tracking params too —
    both must strip so the spellings dedup together (r18 review
    finding #6)."""
    rows = [
        (1, "https://x.example/p?utm_source=a"),
        (2, "https://x.example/p?UTM_SOURCE=a"),
        (3, "https://x.example/p?fbclid"),
        (4, "https://x.example/p?Gclid=z&q=1"),
    ]
    got = {
        r.doc_id: r.canonical_url
        for r in CU.url_canonicalize(
            spark.createDataFrame(rows, "doc_id long, url string")
        ).collect()
    }
    assert got[1] == got[2] == got[3] == "https://x.example/p"
    assert got[4] == "https://x.example/p?q=1"


def test_url_second_question_mark_does_not_collapse(spark):
    """Two URLs differing only PAST a second literal '?' are different
    pages and must not dedup together (ADVICE r18 #3: the old
    split_part(rest, '?', 2) truncated both to 'b=1' and collapsed
    them)."""
    rows = [
        (1, "https://x.example/p?b=1?c=2"),
        (2, "https://x.example/p?b=1?c=3"),
    ]
    out = CU.url_dedup(
        spark.createDataFrame(rows, "doc_id long, url string")
    ).collect()
    assert len(out) == 2
    assert {r.canonical_url for r in out} == {
        "https://x.example/p?b=1?c=2",
        "https://x.example/p?b=1?c=3",
    }
