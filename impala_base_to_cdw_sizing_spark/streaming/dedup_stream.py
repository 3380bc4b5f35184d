"""Streaming deduplication — the training-data-pipeline dedup operator in
its incremental form.

``dropDuplicatesWithinWatermark`` keeps bounded state: a duplicate
arriving within the watermark horizon of its first occurrence is dropped;
state for keys older than the watermark is evicted (so an unbounded
stream never accumulates unbounded dedup state — the property exact
batch dedup cannot offer)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WATERMARK = "1 hour"


def dedup_stream(events: DataFrame, key_col: str = "doc_hash") -> DataFrame:
    """Stream of (ts_ms, doc_hash, …) → first occurrence per key within
    the watermark horizon."""
    with_ts = events.withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    return (
        with_ts.withWatermark("ts", WATERMARK)
        .dropDuplicatesWithinWatermark([key_col])
    )
