"""SparkSession factory with scale-minded defaults.

Local test runs use ``local[N]``; on a real cluster only the master/memory
settings change — the SQL knobs below (AQE, UTC, Arrow) are correct at any
scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_spark(
    app_name: str = "impala_base_to_cdw_sizing_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession.

    Defaults are tuned for the local[32] test box but every knob is
    cluster-safe:

    - AQE on (runtime re-plan, skew-join handling, partition coalescing).
    - UTC session timezone (determinism + DuckDB-oracle comparability).
    - Arrow enabled for the few Pandas-UDF paths (multimodal/similarity).
    - shuffle.partitions sized to parallelism, not the 200 default.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # testdata events.parquet uses TIMESTAMP(NANOS); read as raw long
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
