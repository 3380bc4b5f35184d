"""Checkpoint-restart recovery and idempotent foreachBatch sinks."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.streaming.sinks import (
    start_stream_to_parquet,
)

SCHEMA = "id long, v double"


def _write_batch(spark, src, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(src)


def test_checkpoint_restart_processes_each_row_exactly_once(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, [(1, 1.0), (2, 2.0)])
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_stream_to_parquet(stream, out, ckpt)
    q.processAllAvailable()
    q.stop()

    first_run = spark.read.parquet(out)
    assert sorted(r.id for r in first_run.collect()) == [1, 2]

    # new data lands while the query is DOWN; restart with same checkpoint
    _write_batch(spark, src, [(3, 3.0)])
    stream2 = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = start_stream_to_parquet(stream2, out, ckpt)
    q2.processAllAvailable()
    q2.stop()

    final = spark.read.parquet(out)
    ids = sorted(r.id for r in final.collect())
    assert ids == [1, 2, 3], f"restart must resume, not reprocess: {ids}"
    # epoch directories are the idempotence unit
    epochs = {r.epoch for r in final.select("epoch").distinct().collect()}
    assert len(epochs) >= 2


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicates across micro-batches (within the watermark) are dropped;
    distinct keys all survive."""
    from impala_base_to_cdw_sizing_spark.streaming.dedup_stream import (
        dedup_stream,
    )

    src = str(tmp_path / "dsrc")
    schema = "ts_ms long, doc_hash string"
    minute = 60_000
    # batch 1: a, b ; batch 2 (separate file → separate micro-batch):
    # duplicate of a within the watermark + new c
    spark.createDataFrame(
        [(1 * minute, "a"), (2 * minute, "b")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [(3 * minute, "a"), (4 * minute, "c")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    keys = [r.doc_hash for r in spark.sql("SELECT * FROM dedup_out").collect()]
    assert sorted(keys) == ["a", "b", "c"], keys  # 'a' emitted exactly once


def test_foreachbatch_overwrite_is_redelivery_safe(spark, tmp_path):
    from impala_base_to_cdw_sizing_spark.streaming.sinks import (
        idempotent_parquet_sink,
    )

    out = str(tmp_path / "out2")
    sink = idempotent_parquet_sink(out)
    batch = spark.createDataFrame([(1, 1.0), (2, 2.0)], SCHEMA)
    sink(batch, epoch_id=7)
    sink(batch, epoch_id=7)  # simulated re-delivery of the same epoch
    got = spark.read.parquet(out)
    assert got.count() == 2  # overwritten, not duplicated
    assert got.filter(F.col("epoch") == 7).count() == 2
