"""Streaming drift monitor: the update-mode count state + shared PSI
arithmetic must reproduce the batch rel_drift_psi output exactly once
the stream has consumed the batch op's current window, and must yield
a finite PSI after every intermediate micro-batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _split_current_window(spark, n_batches=4):
    from impala_base_to_cdw_sizing_spark.operators.olap_extra import (
        _INC_CUT_NS,
    )
    from impala_base_to_cdw_sizing_spark.sources.files import load_events

    e = load_events(spark, SF_SMALL).select("event_type", "value", "ts")
    ref_w = e.filter(F.col("ts") < _INC_CUT_NS)
    cur_w = e.filter(F.col("ts") >= _INC_CUT_NS).withColumn(
        "part", F.monotonically_increasing_id() % n_batches
    )
    return ref_w, cur_w, e.select("event_type").distinct()


def test_stream_psi_equals_batch_and_is_defined_midstream(spark, tmp_path):
    from impala_base_to_cdw_sizing_spark.operators.olap_extra import (
        psi_bin_expr,
        q_drift_psi,
    )
    from impala_base_to_cdw_sizing_spark.streaming.drift_stream import (
        binned_counts_stream,
        psi_against_reference,
    )

    n_batches = 4
    ref_w, cur_w, types = _split_current_window(spark, n_batches)
    ref_counts = (
        ref_w.selectExpr("event_type", f"{psi_bin_expr('value')} AS bin")
        .groupBy("event_type", "bin")
        .agg(F.count("*").cast("long").alias("r"))
        .localCheckpoint(eager=True)
    )
    types = types.localCheckpoint(eager=True)

    # feed the current window as n_batches files, one per trigger
    src = str(tmp_path / "src")
    schema = "event_type string, value double"
    for b in range(n_batches):
        cur_w.filter(F.col("part") == b).select(
            "event_type", "value"
        ).coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        binned_counts_stream(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("drift_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # mid-stream: PSI defined and finite from the CURRENT state
        snap = spark.sql("SELECT * FROM drift_counts")
        mid = psi_against_reference(snap, ref_counts, types).collect()
        assert mid and all(r.psi == r.psi for r in mid)  # no NaN
    finally:
        q.stop()

    # final state == the batch op's current-window counts, so the
    # shared arithmetic must reproduce rel_drift_psi EXACTLY
    final_counts = spark.sql("SELECT * FROM drift_counts")
    got = {
        r.event_type: (r.psi_nano, r.band)
        for r in psi_against_reference(final_counts, ref_counts, types).collect()
    }
    want = {
        r.event_type: (r.psi_nano, r.band)
        for r in q_drift_psi(spark, SF_SMALL).collect()
    }
    assert got == want
