"""Stream-stream event-time interval join — the conversion-funnel shape
(view → purchase within an hour) as a Structured Streaming job.

This is the one Structured Streaming capability the other streaming
modules don't exercise: BOTH join sides are unbounded streams, so the
engine must buffer each side in state and emit matches as they arrive.
The join condition carries an event-time range (purchase within
[view_ts, view_ts + 1h]) and both sides are watermarked — together these
bound the state: a buffered view can be dropped once the watermark
passes view_ts + 1h, a buffered purchase once it can no longer match any
future view. Without the time bounds the state would grow forever; the
range condition is what makes a stream-stream join production-viable.

Batch twin: the identical join expressed over the same static frames —
``tests/test_streaming_join.py`` asserts stream ≡ batch row-for-row
(inner joins emit on match, so no watermark-close is needed to compare).

At scale: state is partitioned by the equi-join key (user_id), so the
join shuffles each side once on user_id and matches within partitions;
watermark-driven eviction keeps per-key state at O(events per hour),
not O(stream history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JOIN_WINDOW_MS = 3_600_000  # purchase must follow the view within 1 hour
WATERMARK = "2 hours"


def event_stream(spark: SparkSession, events_dir: str, schema) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split one event stream into watermarked view/purchase sides."""
    with_ts = events.withColumn("ts", F.timestamp_millis(F.col("ts_ms")))
    views = (
        with_ts.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", WATERMARK)
    )
    purchases = (
        with_ts.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    return views, purchases


def _joined(views: DataFrame, purchases: DataFrame) -> DataFrame:
    return views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {JOIN_WINDOW_MS} MILLISECONDS")
        ),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.unix_millis("view_ts").alias("view_ts_ms"),
        F.unix_millis("purchase_ts").alias("purchase_ts_ms"),
    )


def view_purchase_join(events: DataFrame) -> DataFrame:
    """Streaming inner join: every (view, purchase-within-1h) pair per
    user. Append-mode output; matches emit as they arrive."""
    views, purchases = _sides(events)
    return _joined(views, purchases)


def batch_equivalent(events: DataFrame) -> DataFrame:
    """The identical join over static frames (the equivalence target)."""
    views, purchases = _sides(events)
    return _joined(views, purchases)


def _left_joined(views: DataFrame, purchases: DataFrame) -> DataFrame:
    joined = views.join(
        purchases,
        (F.col("v_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {JOIN_WINDOW_MS} MILLISECONDS")
        ),
        "leftOuter",
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "purchase_id",
        F.unix_millis("view_ts").alias("view_ts_ms"),
        F.unix_millis("purchase_ts").alias("purchase_ts_ms"),
    )


def view_purchase_left_join(events: DataFrame) -> DataFrame:
    """LEFT OUTER stream-stream join: every view, with its purchase if
    one arrived within the hour, else nulls. The outer semantics are the
    interesting part: an unmatched view CANNOT emit when first seen (its
    purchase may still arrive) — it emits null-extended only once the
    watermark passes ``view_ts + 1h``, i.e. when a match has become
    impossible. Views too close to the end of the stream never emit
    (their match window is still open) — pinned in tests, because this
    is the semantic difference between a batch left join and a streaming
    one that engineers trip over."""
    views, purchases = _sides(events)
    return _left_joined(views, purchases)


def batch_left_equivalent(events: DataFrame) -> DataFrame:
    """Batch left join — equivalence target for the CLOSED portion of
    the stream (views whose match window the watermark has passed)."""
    views, purchases = _sides(events)
    return _left_joined(views, purchases)


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str = "join_stream"
) -> DataFrame:
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}")
