"""Cascading time rollups (continuous-aggregate style): raw events →
hourly partials → daily aggregates *merged from the hourly partials*.

The operator materializes the classic multi-resolution rollup used by
hypertable/continuous-aggregate systems: each resolution is computed by
MERGING the next-finer partials (sum/count/min/max are mergeable; avg
derives from sum/count at read time), never by rescanning raw data.

The oracle computes the daily aggregate DIRECTLY from raw events, so the
exact-match check itself proves merge correctness of the cascade
(aggregate-of-aggregates ≡ aggregate-of-raw). At 100 TB the hourly layer
is the only raw scan; coarser layers shuffle tiny partial tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .aggregates import dsum_sql
from .queries_ext import register

_HOUR_MS = 3_600_000
_DAY_MS = 86_400_000


def hourly_partials(events: DataFrame) -> DataFrame:
    """Raw → hourly partial aggregates (the only raw scan)."""
    return (
        events.withColumn(
            "hour_ms", F.expr(f"(ts div 1000000) div {_HOUR_MS} * {_HOUR_MS}")
        )
        .groupBy("hour_ms", "event_type")
        .agg(
            F.count("*").alias("n"),
            # partials stay DECIMAL through the cascade — exact merge by
            # construction (cast to double only at the final resolution)
            F.sum(F.col("value").cast("decimal(38,6)")).alias("sum_value_dec"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def merge_to_daily(hourly: DataFrame) -> DataFrame:
    """Hourly partials → daily aggregates by MERGE (no raw rescan)."""
    return (
        hourly.withColumn(
            "day_ms", F.expr(f"hour_ms div {_DAY_MS} * {_DAY_MS}")
        )
        .groupBy("day_ms", "event_type")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_value_dec").cast("double").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
        .withColumn("avg_value", F.col("sum_value") / F.col("n"))
    )


def q_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.files import load_events

    events = load_events(spark, sf_dir)
    return merge_to_daily(hourly_partials(events))


# Oracle: daily DIRECTLY from raw — equality proves the merge is lossless.
SQL_ROLLUP_CASCADE = f"""
SELECT
  (epoch_ns(ts) // 1000000) // {_DAY_MS} * {_DAY_MS} AS day_ms,
  event_type,
  COUNT(*) AS n,
  {dsum_sql('value')} AS sum_value,
  MIN(value) AS min_value,
  MAX(value) AS max_value,
  {dsum_sql('value')} / COUNT(*) AS avg_value
FROM events
GROUP BY 1, 2
"""


def register_all() -> None:
    register("events_rollup_cascade", q_rollup_cascade, SQL_ROLLUP_CASCADE)
