"""Segmented exact global ranking — the scale-safe replacement for the
one remaining single-partition plan shape (``row_number()``/``NTILE()``
over an unpartitioned window).

A global ordered rank decomposes exactly into (1) a local rank inside a
coarse *ordering-consistent* bucket plus (2) a broadcast carry-in of the
row counts of all earlier buckets — the same two-phase decomposition the
segmented sweep uses for running sums (``sweep.py:121``) and budget
selection uses for cumulative token mass (``curation.py:461``), applied
to pure ranks. "Ordering-consistent" means every row of bucket *b* sorts
before every row of bucket *b+1* and rows that compare equal on the
leading order column share a bucket; both hold whenever the bucket is a
monotone quantization of that leading column, which is how all callers
here construct it.

At 100 TB the per-bucket windows run in parallel across executors (AQE
re-splits an oversized bucket), the counts frame is ``n_buckets`` rows,
and the carry is computed by a triangular self-join so even that tiny
frame never touches a partition-less window (the sweep's precedent —
Spark logs a single-partition warning on every unpartitioned window, and
the plan shape is the thing being audited).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def segmented_row_number(
    df: DataFrame,
    order_cols: list[Column],
    bucket: str = "bucket",
    out: str = "grank",
) -> DataFrame:
    """Add ``out`` = the exact 1-based global ``row_number()`` over
    ``order_cols``, computed without a global sort.

    ``df[bucket]`` must be an ordering-consistent coarse partitioner for
    ``order_cols`` (see module docstring). Ranks are integers, so
    ``local rank + carry-in`` is bit-equal to the single-window plan —
    pinned by the ``*_sequential`` twins running against the SAME
    sequential DuckDB oracle, and by ``tests/test_segmented_rank.py``.
    """
    w_local = Window.partitionBy(bucket).orderBy(*order_cols)
    local = df.withColumn("_lrk", F.row_number().over(w_local))
    counts = df.groupBy(bucket).agg(F.count("*").alias("_bn"))
    t, p = counts.alias("t"), counts.alias("p")
    carry = (
        t.join(F.broadcast(p), F.col(f"p.{bucket}") < F.col(f"t.{bucket}"), "left")
        .groupBy(F.col(f"t.{bucket}").alias(bucket))
        .agg(F.coalesce(F.sum("p._bn"), F.lit(0)).cast("long").alias("_carry"))
    )
    return (
        local.join(F.broadcast(carry), bucket)
        .withColumn(out, (F.col("_carry") + F.col("_lrk")).cast("long"))
        .drop("_lrk", "_carry")
    )


def ntile_expr(rank: str, n: str, k: int) -> str:
    """SQL expression computing ``NTILE(k)`` from a 1-based global rank
    ``rank`` and total row count ``n`` — the exact SQL-standard split:
    the first ``n % k`` tiles get ``ceil(n/k)`` rows, the rest get
    ``floor(n/k)``. With the rank supplied by
    :func:`segmented_row_number` this turns NTILE into a per-row O(1)
    expression — no window at all.

    The ``greatest(q, 1)`` guards the unreachable ELSE branch when
    ``n < k`` (then ``n % k = n`` and every rank takes the THEN branch);
    Spark 4 runs ANSI mode where an evaluated ``DIV 0`` would raise.
    """
    q = f"(({n}) DIV {k})"
    r = f"(({n}) % {k})"
    big = f"({q} + 1)"
    return (
        f"CASE WHEN ({rank}) <= {r} * {big}"
        f" THEN (({rank}) - 1) DIV {big} + 1"
        f" ELSE {r} + ((({rank}) - 1) - {r} * {big}) DIV greatest({q}, 1) + 1"
        f" END"
    )
