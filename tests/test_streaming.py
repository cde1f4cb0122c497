"""End-to-end streaming tests (SURVEY.md §5 layers 3-4): file-source stream
-> enrich -> project -> stateful aggregate; assert stream-batch equivalence
and the EMIT CHANGES monotonicity invariant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.operators.aggregate import hotels_count
from m12_kafkastreams_python_azure_spark.operators.enrich import enrich_expedia
from m12_kafkastreams_python_azure_spark.schemas import EXPEDIA_SCHEMA
from m12_kafkastreams_python_azure_spark.sources.readers import (
    read_json_stream_from_files,
)
from m12_kafkastreams_python_azure_spark.streaming.pipeline import (
    HotelsCountStream,
    expedia_stream_projection,
    hotels_count_streaming,
    write_update_to_memory,
)
from tests.fixtures import gen_expedia_rows, write_json_files

N_ROWS = 4000


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("expedia_stream")
    write_json_files(gen_expedia_rows(N_ROWS), str(d), num_files=4)
    return str(d)


def _batch_truth(spark, stream_dir):
    batch = spark.read.schema(EXPEDIA_SCHEMA).json(stream_dir)
    return {
        r["stay_category"]: (r["hotels_amount"], r["distinct_hotels"])
        for r in hotels_count(enrich_expedia(batch)).collect()
    }


def test_stream_batch_equivalence_exact(spark, stream_dir, tmp_path):
    """Exact two-phase streaming distinct == batch exact answer."""
    stream = read_json_stream_from_files(spark, stream_dir, EXPEDIA_SCHEMA)
    projected = expedia_stream_projection(enrich_expedia(stream))
    hc = HotelsCountStream(projected, name="hc_exact", checkpoint_root=str(tmp_path / "ck"))
    try:
        hc.process_available()
        got = {
            r["stay_category"]: (r["hotels_amount"], r["distinct_hotels"])
            for r in hc.table().collect()
        }
    finally:
        hc.stop()
    assert got == _batch_truth(spark, stream_dir)


def test_stream_approx_mode(spark, stream_dir, tmp_path):
    """Approx (HLL) streaming mode: counts exact, distinct within rel err."""
    stream = read_json_stream_from_files(spark, stream_dir, EXPEDIA_SCHEMA)
    projected = expedia_stream_projection(enrich_expedia(stream))
    q = write_update_to_memory(
        hotels_count_streaming(projected), "hc_approx", str(tmp_path / "ck2")
    )
    try:
        q.processAllAvailable()
        latest = {
            r["stay_category"]: (r["hotels_amount"], r["distinct_hotels"])
            for r in spark.sql(
                "SELECT stay_category, max(hotels_amount) hotels_amount,"
                " max(distinct_hotels) distinct_hotels FROM hc_approx GROUP BY 1"
            ).collect()
        }
    finally:
        q.stop()
    truth = _batch_truth(spark, stream_dir)
    assert set(latest) == set(truth)
    for cat, (amount, distinct) in latest.items():
        assert amount == truth[cat][0]  # plain count is exact
        ex = truth[cat][1]
        assert abs(distinct - ex) <= max(2, 0.15 * ex)


def test_update_stream_monotone(spark, stream_dir, tmp_path):
    """EMIT CHANGES behavior: per-key counts monotone non-decreasing across
    micro-batches (reference README.md:2310-2374)."""
    stream = read_json_stream_from_files(spark, stream_dir, EXPEDIA_SCHEMA)
    projected = expedia_stream_projection(enrich_expedia(stream))
    amounts = projected.groupBy("stay_category").agg(
        F.count("hotel_id").alias("hotels_amount")
    )
    q = write_update_to_memory(amounts, "hc_mono", str(tmp_path / "ck3"))
    try:
        q.processAllAvailable()
        rows = spark.table("hc_mono").collect()
    finally:
        q.stop()
    # memory sink appends update rows in emission order per micro-batch;
    # reconstruct per-key sequence and assert monotone
    seq: dict[str, list[int]] = {}
    for r in rows:
        seq.setdefault(r["stay_category"], []).append(r["hotels_amount"])
    assert len(rows) > len(seq), "expected multiple micro-batch updates"
    for cat, vals in seq.items():
        assert vals == sorted(vals), (cat, vals)
