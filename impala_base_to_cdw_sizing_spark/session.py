"""SparkSession factory with scale-minded defaults.

Local test runs use ``local[N]``; on a real cluster only the master/memory
settings change — the SQL knobs below (AQE, UTC, Arrow) are correct at any
scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _driver_memory() -> str:
    """Heap for the single local-mode JVM: ``SPARK_DRIVER_MEMORY`` if set,
    else 25% of physical RAM clamped to [8g, 48g].

    In ``local[N]`` the driver JVM IS the whole cluster — N executor
    threads, shuffle buffers, and every ``localCheckpoint`` block share
    one heap that a real deployment would spread over N executors. A
    flat 8g default silently turned the r9 sf30 scale probes into GC
    benchmarks: the three heavies measured α≈1.4-1.7 over a 3× scale-up
    purely from GCLocker retry storms (and the instrumented probe died
    with ``OutOfMemoryError: Java heap space``), while the same plans at
    the same sf with an adequate heap scale linearly. Sizing the harness
    heap to the box keeps large-sf runs measuring the engine, not the
    collector; the env var stays the override for spill-pressure tests
    that NEED a small heap.
    """
    env = os.environ.get("SPARK_DRIVER_MEMORY")
    if env:
        return env
    try:
        with open("/proc/meminfo") as fh:
            total_kb = int(fh.readline().split()[1])
        quarter_g = total_kb // (4 * 1024 * 1024)
        return f"{min(48, max(8, quarter_g))}g"
    except (OSError, ValueError, IndexError):
        return "8g"


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
        .config("spark.driver.memory", _driver_memory())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
