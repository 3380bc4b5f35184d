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


# calendar-week segments: WindowExec pays a per-group setup cost, so the
# bucket count is a real knob — measured at sf1 (1M events, 15k users):
# 1-day buckets (users×31 groups) 4.4 s, 7-day (users×5) 0.53 s vs 0.52 s
# for the sequential single-window lag. A week still bounds a hot user's
# largest window partition to span/horizon of their history (~20% here,
# ~2% at a year-long 100 TB corpus) instead of all of it.
_SESS_SPAN_NS = 7 * 86_400 * 1_000_000_000


def sessionize_flags(
    ev: DataFrame,
    gap_ns: int,
    span_ns: int = _SESS_SPAN_NS,
    with_session_id: bool = False,
) -> DataFrame:
    """Skew-proof session-boundary flags (r9: the skewed scale gate
    measured the single ``Window.partitionBy(user_id)`` lag jumping from
    α≈0.1 to α≈1.0 when one user carries ~30% of events — that user's
    whole history serializes into one task).

    Decomposition: partition by ``(user_id, bucket)`` where ``bucket =
    ts DIV span_ns`` (a calendar-week quantization — data-independent,
    ordering-consistent, no driver action). The local ``lag`` covers
    every row except each bucket's first; that row's predecessor is the
    LAST row of the user's previous non-empty bucket, whose ``ts`` is
    that bucket's ``max(ts)`` — carried via a per-user window over the
    per-(user, bucket) summary frame, which holds at most
    horizon/span rows per user (≈5 here) regardless of how hot the
    user is. All arithmetic is integer ns, so the flags are bit-equal
    to the sequential single-window form — pinned by the
    ``*_sequential`` twins sharing the same DuckDB oracle.

    With ``with_session_id=True`` the 1-based per-user session id is
    added the same two-phase way: local running flag-sum plus the
    carried count of sessions in earlier buckets.

    Input needs columns ``user_id, ts, event_id`` (ts: epoch nanos).
    Output adds ``new_session`` (and optionally ``session_id``).
    """
    b = ev.withColumn("bucket", F.expr(f"ts DIV {span_ns}"))
    w_local = Window.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    w_user = Window.partitionBy("user_id").orderBy("bucket")

    # one pass over the events frame: local lag + the per-bucket facts
    # the carry needs (first/last ts, count of strictly-local gaps) — so
    # ALL cross-bucket arithmetic runs on the tiny summary frame and the
    # events frame is joined exactly once.
    # the locally-lagged frame feeds both the bucket summary and the
    # carry join; the subplans are identical so Spark reuses the shuffle
    # exchange, and the window itself is cheap at week granularity —
    # keeping the plan fully lazy (no checkpoint side effects at query
    # construction).
    loc = b.withColumn("_prev_local", F.lag("ts").over(w_local))
    gap_local = (
        F.col("_prev_local").isNotNull()
        & (F.col("ts") - F.col("_prev_local") > gap_ns)
    ).cast("long")
    summ = loc.groupBy("user_id", "bucket").agg(
        F.min("ts").alias("_bmin"),
        F.max("ts").alias("_bmax"),
        F.sum(gap_local).alias("_nlocal"),
    )
    carry = (
        summ.withColumn("_carry_ts", F.lag("_bmax").over(w_user))
        .withColumn(
            "_first_new",
            (
                F.col("_carry_ts").isNull()
                | (F.col("_bmin") - F.col("_carry_ts") > gap_ns)
            ).cast("long"),
        )
        .withColumn("_n_new", F.col("_nlocal") + F.col("_first_new"))
        .withColumn(
            "_carry_n",
            F.coalesce(
                F.sum("_n_new").over(
                    w_user.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("user_id", "bucket", "_carry_ts", "_carry_n")
    )
    flagged = (
        loc.join(carry, ["user_id", "bucket"])
        .withColumn("_prev", F.coalesce(F.col("_prev_local"), F.col("_carry_ts")))
        .withColumn(
            "new_session",
            (F.col("_prev").isNull() | (F.col("ts") - F.col("_prev") > gap_ns))
            .cast("long"),
        )
        .drop("_prev_local", "_carry_ts", "_prev")
    )
    if not with_session_id:
        return flagged.drop("bucket", "_carry_n")
    return (
        flagged.withColumn(
            "_local_cum",
            F.sum("new_session").over(
                w_local.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "session_id", (F.col("_carry_n") + F.col("_local_cum")).cast("long")
        )
        .drop("_local_cum", "_carry_n", "bucket")
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
