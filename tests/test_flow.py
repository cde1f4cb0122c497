"""End-to-end reference-flow tests: the one-call switch-over surface.

Batch flow == DuckDB oracle over the same raw file; streaming flow's final
state == batch answer (stream-batch equivalence on the whole pipeline, not
just the aggregate)."""

from __future__ import annotations

import duckdb
import pytest

from m12_kafkastreams_python_azure_spark.flow import (
    reference_flow_batch,
    reference_flow_streaming,
)
from tests.fixtures import gen_expedia_rows, write_json_files


@pytest.fixture(scope="module")
def ingest_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ingest"))
    # 4 files -> 4 micro-batches in the streaming flow (maxFilesPerTrigger=1)
    write_json_files(gen_expedia_rows(4000), d, num_files=4)
    return d


def _expected(ingest_dir):
    """Independent oracle: DuckDB computes the full mask->enrich->aggregate
    flow over the whole ingest directory (intended 1-in/1-out semantics,
    including the F1 null-id drop)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW raw AS SELECT * FROM read_json_auto('{ingest_dir}/*.json')"
    )
    rows = con.execute("""
        WITH enriched AS (
          SELECT hotel_id,
                 CASE WHEN try_cast(srch_ci AS DATE) IS NULL
                        OR try_cast(srch_co AS DATE) IS NULL THEN 'Erroneous data'
                      WHEN datediff('day', try_cast(srch_ci AS DATE), try_cast(srch_co AS DATE)) BETWEEN 1 AND 4 THEN 'Short stay'
                      WHEN datediff('day', try_cast(srch_ci AS DATE), try_cast(srch_co AS DATE)) BETWEEN 5 AND 10 THEN 'Standard stay'
                      WHEN datediff('day', try_cast(srch_ci AS DATE), try_cast(srch_co AS DATE)) BETWEEN 11 AND 14 THEN 'Standard extended stay'
                      WHEN datediff('day', try_cast(srch_ci AS DATE), try_cast(srch_co AS DATE)) > 14 THEN 'Long stay'
                      ELSE 'Erroneous data' END AS stay_category
          FROM raw WHERE id IS NOT NULL
        )
        SELECT stay_category, count(hotel_id) AS hotels_amount,
               count(DISTINCT hotel_id) AS distinct_hotels
        FROM enriched GROUP BY stay_category
    """).fetchall()
    con.close()
    return {r[0]: (r[1], r[2]) for r in rows}


def test_batch_flow_matches_duckdb_oracle(spark, ingest_dir):
    got = {
        r.stay_category: (r.hotels_amount, r.distinct_hotels)
        for r in reference_flow_batch(spark, ingest_dir).collect()
    }
    assert got == _expected(ingest_dir)
    assert len(got) == 5


def test_streaming_flow_converges_to_batch(spark, ingest_dir, tmp_path):
    q = reference_flow_streaming(
        spark, ingest_dir, str(tmp_path / "ck"), name="flow_hotels"
    )
    try:
        q.processAllAvailable()
        # The update-mode memory sink appends one change row per (key,
        # trigger) in NO guaranteed order; both counters are monotone
        # non-decreasing as data accumulates, so max-per-key IS the final
        # state (same compaction HotelsCountStream.table() uses).
        latest: dict[str, tuple[int, int]] = {}
        for r in spark.table("flow_hotels").collect():
            amount, distinct = latest.get(r.stay_category, (0, 0))
            latest[r.stay_category] = (
                max(amount, r.hotels_amount),
                max(distinct, r.distinct_hotels),
            )
        # 4 source files x maxFilesPerTrigger=1 -> multiple triggers: the
        # change stream must contain more rows than final keys
        assert spark.table("flow_hotels").count() > len(latest)
    finally:
        q.stop()
    batch = {
        r.stay_category: (r.hotels_amount, r.distinct_hotels)
        for r in reference_flow_batch(spark, ingest_dir).collect()
    }
    assert set(latest) == set(batch)
    for cat, (amount, distinct) in batch.items():
        got_amount, got_distinct = latest[cat]
        assert got_amount == amount, cat
        # streaming distinct is HLL-approximate (ksqlDB semantics)
        assert abs(got_distinct - distinct) <= max(1, 0.15 * distinct), cat
