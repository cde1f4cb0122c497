"""C4-style line-level cleaning (curation.c4_line_filter): planted
line- and page-rule behaviors, reassembly order, and the zero-shuffle
plan pin. Oracle parity rides test_oracle.py via the entry registration."""

from __future__ import annotations

from m12_kafkastreams_python_azure_spark.operators import curation as CU
from m12_kafkastreams_python_azure_spark.plans.checks import explain_str


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = "one two three four five six."  # 6 words, terminal '.'


def test_line_rules(spark):
    rows = [
        # doc 1: 3 good lines + every line-rule negative -> page kept,
        # negatives dropped, order preserved
        (
            1,
            "\n".join(
                [
                    GOOD,
                    "no terminal punctuation here at all",  # no terminal mark
                    "short line four.",  # < 5 words
                    GOOD.replace("six", "seven"),
                    "enable javascript to view this page.",  # javascript
                    "is this a question line?",  # '?' terminates, 5 words
                ]
            ),
        ),
    ]
    out = CU.c4_line_filter(_docs(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_lines, r.n_kept) == (6, 3)
    assert r.clean_text.split("\n") == [
        GOOD,
        GOOD.replace("six", "seven"),
        "is this a question line?",
    ]


def test_page_rules(spark):
    three_good = "\n".join([GOOD, GOOD, GOOD])
    rows = [
        (1, three_good),  # survives
        (2, "\n".join([GOOD, GOOD])),  # < 3 kept lines
        (3, three_good + "\nWe need Lorem Ipsum filler."),  # lorem ipsum
        (4, three_good + "\nif (x) { return; }"),  # brace
        (5, three_good + "\nthis page mentions badword1 clearly."),  # blocklist
        # blocklist matches word-boundary OCCURRENCES (ADVICE r17 #5):
        # 'badword1x' is a different word — not a hit ...
        (6, three_good + "\nthis page mentions badword1x clearly."),
        # ... but punctuation-adjacent 'badword1.' IS one (C4 semantics)
        (7, three_good + "\nthis page ends with badword1."),
        (8, three_good + "\nBADWORD2, capitalized and comma'd."),
    ]
    kept = sorted(r.doc_id for r in CU.c4_line_filter(_docs(spark, rows)).collect())
    assert kept == [1, 6]


def test_fixture_plants_every_rule(spark, sf_dir):
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    docs = CU.docs_with_planted_lines(load_table(spark, sf_dir, "documents"))
    corpus = {r.doc_id: r.text for r in docs.collect()}
    assert any("javascript now." in t for t in corpus.values())
    assert CU.C4_LOREM_LINE in corpus[0]  # doc 0 hits 37, 41 and 43
    assert CU.C4_BRACE_LINE in corpus[0]
    assert CU.C4_BADWORD_LINE in corpus[0]
    out = {r.doc_id for r in CU.c4_line_filter(docs).collect()}
    assert 0 not in out and len(out) > 0


def test_plan_is_exchange_free(spark, sf_dir):
    from m12_kafkastreams_python_azure_spark.sources.readers import load_table

    plan = explain_str(
        CU.c4_line_filter(
            CU.docs_with_planted_lines(load_table(spark, sf_dir, "documents"))
        )
    )
    assert "Exchange" not in plan  # one narrow scan->project->filter pass
    assert "BroadcastNestedLoopJoin" not in plan and "Join" not in plan


def test_c4_streams_stateless(spark, tmp_path):
    """c4_line_filter is a stateless narrow pass, so the SAME code runs
    unchanged on a streaming DataFrame (append mode, no state store) and
    emits exactly the batch rows."""
    import json as _json

    rows = [
        (1, "\n".join([GOOD, GOOD, GOOD])),
        (2, "\n".join([GOOD, GOOD])),  # dropped: < 3 kept lines
        (3, "\n".join([GOOD, GOOD, GOOD, "We need lorem ipsum filler."])),
    ]
    d = tmp_path / "docs"
    d.mkdir()
    with open(d / "p0.json", "w") as fh:
        for r in rows:
            fh.write(_json.dumps({"doc_id": r[0], "text": r[1]}) + "\n")
    stream = spark.readStream.schema("doc_id long, text string").json(str(d))
    out = CU.c4_line_filter(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("c4_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {tuple(r) for r in spark.sql("SELECT * FROM c4_stream").collect()}
    want = {tuple(r) for r in CU.c4_line_filter(_docs(spark, rows)).collect()}
    assert got == want and {t[0] for t in got} == {1}


def test_empty_badwords_disables_the_blocklist_rule(spark):
    """badwords=() must disable the rule, not build '\\b()\\b' (which
    matches every page and drops the corpus — r18 review finding #2)."""
    three_good = "\n".join([GOOD, GOOD, GOOD])
    kept = CU.c4_line_filter(
        _docs(spark, [(1, three_good)]), badwords=()
    ).collect()
    assert [r.doc_id for r in kept] == [1]


def test_badwords_path_loads_and_filters_at_size(spark, tmp_path):
    """VERDICT r18 #8: production plugs in the full published blocklist
    via badwords_path (file, one entry per line) instead of a code edit.
    A 150-entry list exercises the rlike alternation at size; the hit
    entry sits deep in the list and adjacent to punctuation (occurrence
    semantics), and file hygiene (comments, blanks, case, duplicates)
    goes through load_badwords."""
    words = [f"blocked{i}" for i in range(150)]
    p = tmp_path / "badwords.txt"
    p.write_text(
        "# full production blocklist\n\n"
        + "\n".join(words)
        + "\nBLOCKED42\n"  # duplicate in different case — dropped
    )
    loaded = CU.load_badwords(str(p))
    assert loaded == tuple(words)

    three_good = "\n".join([GOOD, GOOD, GOOD])
    rows = [
        (1, three_good),                                   # clean page
        (2, three_good + "\nsee blocked137, then more."),  # deep hit + punct
        (3, three_good + "\nblocked9x is not a hit here."),  # substring only
    ]
    kept = sorted(
        r.doc_id
        for r in CU.c4_line_filter(
            _docs(spark, rows), badwords_path=str(p)
        ).collect()
    )
    assert kept == [1, 3]

    # an all-comments/blank file means an EMPTY list -> rule disabled
    empty = tmp_path / "empty.txt"
    empty.write_text("# nothing\n\n")
    kept2 = CU.c4_line_filter(
        _docs(spark, [(2, rows[1][1])]), badwords_path=str(empty)
    ).collect()
    assert [r.doc_id for r in kept2] == [2]
