"""Multi-micro-batch streaming validation on real testdata: the events
table replayed as 10 separate files with maxFilesPerTrigger=1 — ten
incremental state updates — must converge to exactly the batch answer.
This exercises state-store accumulation across many triggers, not just the
single-batch case the fixture tests cover."""

from __future__ import annotations


from pyspark.sql import functions as F

from m12_kafkastreams_python_azure_spark.sources.readers import load_table


def test_ten_microbatches_converge_to_batch_answer(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "chunks")
    # replay the table as 10 files (deterministic assignment by event_id)
    ev.withColumn("chunk", F.pmod("event_id", F.lit(10))).write.mode(
        "overwrite"
    ).partitionBy("chunk").json(src)

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(src + "/chunk=*")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
        )
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("scale_counts")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        n_batches = len(q.recentProgress)
        got = {
            r.event_type: (r.n, r.v)
            for r in spark.table("scale_counts").collect()
        }
    finally:
        q.stop()
    expected = {
        r.event_type: (r.n, r.v)
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("v"),
        )
        .collect()
    }
    assert got == expected
    assert n_batches >= 10, f"expected >=10 micro-batches, saw {n_batches}"
