"""Streaming sinks with exactly-once semantics.

``foreachBatch`` + deterministic per-epoch output paths gives an
idempotent parquet sink: re-delivery of an epoch overwrites the same
directory instead of appending duplicates — the standard recipe when the
target lacks transactions. Combined with a checkpoint location, a
restarted query resumes from the recorded offsets and never reprocesses
committed epochs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def idempotent_parquet_sink(out_dir: str):
    """Returns a foreachBatch function writing each epoch to
    ``out_dir/epoch=<id>`` with overwrite (re-delivery-safe)."""

    def write_epoch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.write.mode("overwrite")
            .parquet(f"{out_dir}/epoch={epoch_id}")
        )

    return write_epoch


def start_stream_to_parquet(
    stream_df: DataFrame, out_dir: str, checkpoint_dir: str
):
    """Start a recoverable stream: offsets + sink progress live in the
    checkpoint; restarting with the same checkpoint resumes exactly where
    the previous run stopped."""
    return (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(idempotent_parquet_sink(out_dir))
        .start()
    )
