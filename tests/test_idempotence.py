"""Idempotence property: canon(canon(u)) == canon(u) (VERDICT r19 #1).

The round-19 self-review found ``url_canonicalize`` was NOT idempotent:
``^www\\.`` stripped exactly one leading ``www.`` and ``/$`` exactly one
trailing slash, so ``http://www.www.example.com/p//`` canonicalized to
``https://www.example.com/p/`` — one pass short of the fixed point —
and the two raw spellings never collapsed into one ``url_dedup`` group.
Round 20 fixed both anchors (``^(www\\.)+`` / ``/+$``) in the Spark
expressions AND the DuckDB oracle in lockstep; this property test pins
the fixed point over an adversarial combinatorial URL batch so a future
normalizer edit cannot silently reintroduce a non-idempotent rule.
"""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators import curation as CU


def _adversarial_urls() -> list[str]:
    """Combinatorial batch over every rule's edge axis: scheme x www
    repetition x host case x path x trailing slashes x query (tracking /
    out-of-order / embedded '?') x fragment — 960 URLs, plus hand-picked
    pathological spellings."""
    schemes = ["http://", "https://"]
    wwws = ["", "www.", "www.www.", "WWW.www."]
    hosts = ["example.com", "Sub.Example.COM"]
    paths = ["", "/p", "/p/q"]
    slashes = ["", "/", "//", "///"]
    queries = ["", "?b=2&a=1", "?utm_source=x&a=1", "?a=1?x=2&b=3"]
    frags = ["", "#frag"]
    combos = [
        s + w + h + p + sl + q + f
        for s, w, h, p, sl, q, f in itertools.product(
            schemes, wwws, hosts, paths, slashes, queries, frags
        )
    ]
    return combos + [
        "http://www.www.example.com/p//",  # the VERDICT r19 finding verbatim
        "https://www.www.www.example.com///",
        "http://wwwx.www.example.com/p/",  # inner www. is NOT leading
        "https://www.example.com/www./",   # www. inside the path survives
        "https://example.com/?utm_source=",
        "https://WWW.EXAMPLE.COM//",
    ]


def test_url_canonicalize_idempotent(spark):
    urls = _adversarial_urls()
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    once = CU.url_canonicalize(df).select(
        "doc_id", F.col("canonical_url").alias("c1")
    )
    twice = CU.url_canonicalize(
        once.select("doc_id", "c1", F.col("c1").alias("url"))
    ).select("doc_id", "c1", F.col("canonical_url").alias("c2"))
    bad = [
        (urls[r.doc_id], r.c1, r.c2)
        for r in twice.collect()
        if r.c1 != r.c2
    ]
    assert bad == [], f"non-idempotent canonicalizations: {bad[:5]}"


def test_url_canonicalize_double_www_double_slash_collapse(spark):
    """The exact round-19 wrong-answer case: both pathological spellings
    must reach the fixed point in ONE pass now."""
    df = spark.createDataFrame(
        [
            (0, "http://www.www.example.com/p//"),
            (1, "https://example.com/p"),
            (2, "https://www.example.com/p/"),
        ],
        "doc_id long, url string",
    )
    got = {
        r.doc_id: r.canonical_url for r in CU.url_canonicalize(df).collect()
    }
    assert got == {i: "https://example.com/p" for i in range(3)}
    out = CU.url_dedup(df).collect()
    assert len(out) == 1 and out[0].n_docs == 3 and out[0].kept_doc_id == 0
