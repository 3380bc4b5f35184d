"""Execution mode for tiny iterative rounds (r15, guide §1.2/§2.4).

The iterative operators (star-contraction connected components, damped
power iteration) loop over frames of a few thousand rows. With AQE on,
EVERY tiny shuffle of EVERY round becomes its own re-optimized query
stage and its own job — dedup_hybrid planned 87 jobs at sf0.1, almost
all runtime re-planning of sub-5k-row frames whose sizes AQE has
nothing to correct (no skew, no mis-estimates at that scale). The
job-scheduling and re-planning overhead, not the data, dominated those
rounds.

:func:`small_plan_mode` turns AQE off and scales the shuffle width to
the loop's row count for the duration of the rounds, restoring both
confs on exit so everything else on the session (including the final
joins the loops return lazily AFTER exiting — those are checkpointed
RDD reads planned under the restored confs) keeps the session defaults.

Scale safety: the threshold derives from the cluster width (~2k rows
per core), so at any real scale the gate never fires and the loops run
exactly as before. The knob is per-loop row counts, not a tuned local
constant.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

# below ~2k rows/core the per-round frames are pure scheduling overhead
_ROWS_PER_CORE = 2048
# shuffle width target inside the gated rounds: one partition per ~4k rows
_ROWS_PER_PARTITION = 4096


@contextmanager
def small_plan_mode(spark: SparkSession, n_rows: int):
    """AQE off + row-scaled shuffle width while ``n_rows``-sized
    iterative rounds plan and execute; no-op above ~2k rows per core.
    Yields True iff the gate engaged."""
    small = n_rows < _ROWS_PER_CORE * spark.sparkContext.defaultParallelism
    if not small:
        yield False
        return
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    old_width = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(max(2, min(int(old_width), n_rows // _ROWS_PER_PARTITION + 2))),
    )
    try:
        yield True
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", old_width)
