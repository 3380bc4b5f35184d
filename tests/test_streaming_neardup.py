"""Streaming LSH near-dup candidates: bounded per-bucket state, pairs
emitted on arrival, stream ≡ batch on the same arrival order — including
across micro-batch boundaries."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators.text import _MH_SMALL, _band_frame
from impala_base_to_cdw_sizing_spark.streaming.neardup_stream import (
    neardup_candidates_batch,
    neardup_candidates_stream,
)
from tests.conftest import SF_SMALL

CAP = 8
BANDED_SCHEMA = "doc_id long, arrival long, band_id long, band_key long"


def _banded(spark):
    # the real LSH banding of the corpus (small signature keeps the
    # test fast), arrival = doc_id so the order is replayable
    return (
        _band_frame(spark, SF_SMALL, *_MH_SMALL)
        .selectExpr("doc_id", "doc_id AS arrival", "CAST(band_id AS LONG) AS band_id", "band_key")
    )


def _run_stream(spark, tmp_path, frames):
    """Feed ``frames`` as successive micro-batches via a file source."""
    src = str(tmp_path / "src")
    out_name = "neardup_out"
    first = True
    q = None
    for f in frames:
        f.coalesce(1).write.mode("append").parquet(src)
        if first:
            stream = spark.readStream.schema(BANDED_SCHEMA).parquet(src)
            q = (
                neardup_candidates_stream(stream, cap=CAP)
                .writeStream.outputMode("append")
                .format("memory")
                .queryName(out_name)
                .start()
            )
            first = False
        q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {out_name}")


def test_stream_equals_batch_across_microbatches(spark, tmp_path):
    banded = _banded(spark).cache()
    cut = 250  # arrival split: two micro-batches
    frames = [
        banded.filter(F.col("arrival") < cut),
        banded.filter(F.col("arrival") >= cut),
    ]
    got = {
        (r.band_id, r.band_key, r.doc_a, r.doc_b)
        for r in _run_stream(spark, tmp_path, frames).collect()
    }
    want = {
        (r.band_id, r.band_key, r.doc_a, r.doc_b)
        for r in neardup_candidates_batch(banded, cap=CAP).collect()
    }
    assert got == want
    assert want, "fixture must produce candidate pairs"
    banded.unpersist()


def test_hot_bucket_state_and_fanout_are_capped(spark, tmp_path):
    # one synthetic hot bucket: 40 docs, same band key
    rows = [(i, i, 0, 12345) for i in range(40)]
    hot = spark.createDataFrame(rows, BANDED_SCHEMA)
    out = _run_stream(spark, tmp_path, [hot]).collect()
    # every arrival pairs with at most CAP priors...
    from collections import Counter

    per_new = Counter(r.doc_b for r in out)
    assert max(per_new.values()) <= CAP
    # ...and only the first CAP docs ever act as priors (bounded state)
    assert {r.doc_a for r in out} == set(range(CAP))
    # total pairs: choose-2 over the first CAP, plus CAP per later doc
    expect = CAP * (CAP - 1) // 2 + (40 - CAP) * CAP
    assert len(out) == expect
