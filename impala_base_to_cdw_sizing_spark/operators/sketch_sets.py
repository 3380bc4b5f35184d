"""Set-sketch operators (r8): bitmap membership rollups and KMV
(k-minimum-values) distinct sketches — the two mergeable set-summary
classes the sketch tier (Count-Min, Space-Saving, HLL-rollup,
histogram-quantile) did not yet cover.

- ``sketch_bitmap_rollup``: per (event_type, day) a 60-bit membership
  bitmap of ``user_id % 60`` slots, built two ways in one query —
  directly from rows, and by OR-merging the per-hour bitmaps — with the
  merge ≡ recompute witness as an output column (the
  ``rel_incremental_rollup`` pattern applied to bitmap indexes; BIT_OR
  is the canonical mergeable bitmap aggregate, one BIGINT per group at
  any scale). ``bit_count`` gives the slot-occupancy estimate the way
  bitmap indexes answer membership cardinality.
- ``sketch_kmv_distinct``: per event_type the k smallest DISTINCT
  deterministic hashes of user_id (Knuth multiplicative, exact 64-bit
  integer arithmetic: max user_id·2654435761 ≪ 2^63) — the
  Bar-Yossef et al. 2002 KMV estimator ``(k−1)·M/h_k``. Mergeability
  is the whole point of KMV (union sketches = re-take k smallest of
  the sketch union), so the query computes the sketch twice — once
  over all rows, once by merging two per-half sketches — and emits the
  merge ≡ recompute witness per type. The estimate is one double
  division of exact integers (bit-equal cross-engine); accuracy is
  pinned against the exact distinct count as a within-25% flag (the
  k=64 theoretical relative error is ~1/√(k−2) ≈ 12.6%).

Both are two-phase partial aggregates / partitioned windows — no
global window, no driver round-trips; sketch size is O(groups · k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries_ext import register_extra
from ..sources.files import load_events

_KNUTH = 2654435761
_BITS = 60  # slots per bitmap word (fits a BIGINT with sign headroom)
_KMV_K = 64
_KMV_M = 1 << 31

_SLOT = f"shiftleft(CAST(1 AS BIGINT), CAST(user_id % {_BITS} AS INT))"
_DUCK_SLOT = f"(CAST(1 AS BIGINT) << CAST(user_id % {_BITS} AS INT))"
_DAY = "CAST(ts DIV 86400000000000 AS BIGINT)"
_HOUR = "CAST(ts DIV 3600000000000 AS BIGINT)"
_DUCK_DAY = "CAST(epoch_ns(ts) // 86400000000000 AS BIGINT)"
_DUCK_HOUR = "CAST(epoch_ns(ts) // 3600000000000 AS BIGINT)"


def q_bitmap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).selectExpr(
        "event_type", f"{_DAY} AS day", f"{_HOUR} AS hr", f"{_SLOT} AS slot"
    )
    hourly = ev.groupBy("event_type", "day", "hr").agg(
        F.expr("bit_or(slot)").alias("bm_hour")
    )
    merged = hourly.groupBy("event_type", "day").agg(
        F.expr("bit_or(bm_hour)").alias("bm_merged")
    )
    direct = ev.groupBy("event_type", "day").agg(
        F.expr("bit_or(slot)").alias("bm_day")
    )
    return (
        direct.join(merged, ["event_type", "day"])
        .selectExpr(
            "event_type", "day", "bm_day",
            "CAST(bit_count(bm_day) AS BIGINT) AS occupied_slots",
            "bm_day = bm_merged AS merge_equals_recompute",
        )
    )


SQL_BITMAP_ROLLUP = f"""
WITH ev AS (
  SELECT event_type, {_DUCK_DAY} AS day, {_DUCK_HOUR} AS hr, {_DUCK_SLOT} AS slot
  FROM events
),
hourly AS (
  SELECT event_type, day, hr, bit_or(slot) AS bm_hour
  FROM ev GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_type, day, bit_or(bm_hour) AS bm_merged
  FROM hourly GROUP BY 1, 2
),
direct AS (
  SELECT event_type, day, bit_or(slot) AS bm_day FROM ev GROUP BY 1, 2
)
SELECT event_type, day, bm_day,
  CAST(bit_count(bm_day) AS BIGINT) AS occupied_slots,
  bm_day = bm_merged AS merge_equals_recompute
FROM direct JOIN merged USING (event_type, day)
"""


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_events(spark, sf_dir).selectExpr(
        "event_type",
        "user_id",
        f"(user_id * {_KNUTH}) % {_KMV_M} AS h",
        "user_id % 2 AS half",
    )
    # the distinct hash frame feeds three window branches (full sketch,
    # per-half sketches); it is (types × users)-sized — materialize it
    # once (eager localCheckpoint, GC-scoped) instead of re-running the
    # corpus distinct per branch
    hashes = ev.select("event_type", "h", "half").distinct().localCheckpoint()
    w_full = Window.partitionBy("event_type").orderBy("h")
    full = (
        hashes.withColumn("rk", F.row_number().over(w_full))
        .filter(F.col("rk") <= _KMV_K)
        .select("event_type", "h", "rk")
    )
    w_half = Window.partitionBy("event_type", "half").orderBy("h")
    halves = (
        hashes.withColumn("hrk", F.row_number().over(w_half))
        .filter(F.col("hrk") <= _KMV_K)
        .select("event_type", "h")
    )
    w_m = Window.partitionBy("event_type").orderBy("h")
    merged = (
        halves.withColumn("mrk", F.row_number().over(w_m))
        .filter(F.col("mrk") <= _KMV_K)
        .selectExpr("event_type", "h AS mh", "mrk")
    )
    # full-outer align by rank: a row missing on either side means the
    # sketches diverged — the CASE maps the null comparison to 0, so a
    # MIN over matches can never vacuously pass (a bare boolean cast
    # would turn the null into an ignored row)
    fs, ms = full.alias("fs"), merged.alias("ms")
    witness = (
        fs.join(
            ms,
            (F.col("fs.event_type") == F.col("ms.event_type"))
            & (F.col("fs.rk") == F.col("ms.mrk")),
            "full",
        )
        .groupBy(
            F.coalesce(
                F.col("fs.event_type"), F.col("ms.event_type")
            ).alias("event_type")
        )
        .agg(
            F.min(
                F.when(F.col("fs.h") == F.col("ms.mh"), 1).otherwise(0)
            ).alias("all_match")
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_exact")
    )
    kth = full.groupBy("event_type").agg(
        F.count("*").cast("long").alias("sketch_n"),
        F.max("h").cast("long").alias("kth_hash"),
    )
    return (
        kth.join(exact, "event_type")
        .join(witness, "event_type")
        .selectExpr(
            "event_type",
            "sketch_n",
            "kth_hash",
            "n_exact",
            # sketch not full => the sketch IS the distinct set: exact
            f"CASE WHEN sketch_n < {_KMV_K} THEN CAST(sketch_n AS DOUBLE)"
            f" ELSE CAST(({_KMV_K} - 1) * CAST({_KMV_M} AS BIGINT) AS DOUBLE)"
            f" / CAST(kth_hash AS DOUBLE) END AS est_distinct",
            "all_match = 1 AS merge_equals_recompute",
        )
        .selectExpr(
            "event_type", "sketch_n", "kth_hash", "n_exact", "est_distinct",
            "abs(est_distinct - n_exact) / n_exact <= 0.25 AS within_25pct",
            "merge_equals_recompute",
        )
    )


SQL_KMV_DISTINCT = f"""
WITH ev AS (
  SELECT event_type, user_id,
    (user_id * {_KNUTH}) % {_KMV_M} AS h, user_id % 2 AS half
  FROM events
),
hashes AS (SELECT DISTINCT event_type, h, half FROM ev),
f AS (
  SELECT event_type, h, rk FROM (
    SELECT event_type, h, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY h) AS rk
    FROM hashes
  ) WHERE rk <= {_KMV_K}
),
halves AS (
  SELECT event_type, h FROM (
    SELECT event_type, h, ROW_NUMBER() OVER (
      PARTITION BY event_type, half ORDER BY h) AS hrk
    FROM hashes
  ) WHERE hrk <= {_KMV_K}
),
m AS (
  SELECT event_type, h AS mh, mrk FROM (
    SELECT event_type, h, ROW_NUMBER() OVER (
      PARTITION BY event_type ORDER BY h) AS mrk
    FROM halves
  ) WHERE mrk <= {_KMV_K}
),
witness AS (
  SELECT COALESCE(f.event_type, m.event_type) AS event_type,
    MIN(CASE WHEN f.h = m.mh THEN 1 ELSE 0 END) AS all_match
  FROM f FULL JOIN m ON f.event_type = m.event_type AND f.rk = m.mrk
  GROUP BY 1
),
exact AS (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact
  FROM ev GROUP BY 1
),
kth AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sketch_n,
    CAST(MAX(h) AS BIGINT) AS kth_hash
  FROM f GROUP BY 1
)
SELECT event_type, sketch_n, kth_hash, n_exact, est_distinct,
  abs(est_distinct - n_exact) / n_exact <= 0.25 AS within_25pct,
  merge_equals_recompute
FROM (
  SELECT event_type, sketch_n, kth_hash, n_exact,
    CASE WHEN sketch_n < {_KMV_K} THEN CAST(sketch_n AS DOUBLE)
      ELSE CAST(({_KMV_K} - 1) * CAST({_KMV_M} AS BIGINT) AS DOUBLE)
        / CAST(kth_hash AS DOUBLE) END AS est_distinct,
    all_match = 1 AS merge_equals_recompute
  FROM kth JOIN exact USING (event_type) JOIN witness USING (event_type)
)
"""


_SLIDE_K = 32
_SLIDE_HOURS = 24


def q_kmv_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users — THE query exact methods cannot
    window (distinct doesn't decompose over overlapping frames) and the
    reason mergeable sketches exist: build one KMV sketch per
    (event_type, hour), then answer "distinct users in the trailing
    24 h" for EVERY hour by merging the window's hourly sketches
    (union the ≤ 24·k hashes, re-take the k smallest — the KMV merge).
    The fan-out is each hourly sketch row exploding into the ≤24 target
    hours it serves: intermediate size is hours·k·24, a function of the
    clock and the sketch — INDEPENDENT of event volume, which is the
    100 TB story (the exact computation would carry every distinct user
    into every overlapping window). Targets are restricted to hours
    that exist in the data; estimates are the same exact-integer
    arithmetic as :func:`q_kmv_distinct`."""
    ev = load_events(spark, sf_dir).selectExpr(
        "event_type",
        f"{_HOUR} AS hr",
        f"(user_id * {_KNUTH}) % {_KMV_M} AS h",
    )
    hourly_hashes = ev.select("event_type", "hr", "h").distinct()
    w_h = Window.partitionBy("event_type", "hr").orderBy("h")
    sketch = (
        hourly_hashes.withColumn("rn", F.row_number().over(w_h))
        .filter(F.col("rn") <= _SLIDE_K)
        .select("event_type", "hr", "h")
    )
    return kmv_sliding_from_sketch(sketch)


def kmv_sliding_from_sketch(sketch: DataFrame) -> DataFrame:
    """The sliding merge + estimate over an hourly-sketch frame
    (event_type, hr, h) — SHARED by the batch op above and the
    streaming sketch maintainer (``streaming/kmv_stream.py``), so the
    stream ≡ batch identity is the same code path, not a mirrored
    reimplementation (the drift_stream/psi_table contract).

    The sketch frame is hours × k rows — the eager localCheckpoint
    both materializes it once for the two reads below (hours + fan-out)
    and severs the lineage so the internal self-join resolves for ANY
    caller (the memory-sink snapshot the streaming test feeds in
    otherwise trips conflicting-reference resolution)."""
    sketch = sketch.localCheckpoint()
    hours = sketch.select("event_type", "hr").distinct().selectExpr(
        "event_type", "hr AS target_hr"
    )
    fanned = (
        sketch.selectExpr(
            "event_type", "h",
            f"explode(sequence(hr, hr + {_SLIDE_HOURS - 1})) AS target_hr",
        )
        .join(hours, ["event_type", "target_hr"])
        .select("event_type", "target_hr", "h")
        .distinct()
    )
    w_t = Window.partitionBy("event_type", "target_hr").orderBy("h")
    merged = (
        fanned.withColumn("rn", F.row_number().over(w_t))
        .filter(F.col("rn") <= _SLIDE_K)
    )
    return merged.groupBy("event_type", "target_hr").agg(
        F.count("*").cast("long").alias("sketch_n"),
        F.max("h").cast("long").alias("kth_hash"),
    ).selectExpr(
        "event_type", "target_hr", "sketch_n", "kth_hash",
        f"CASE WHEN sketch_n < {_SLIDE_K} THEN CAST(sketch_n AS DOUBLE)"
        f" ELSE CAST(({_SLIDE_K} - 1) * CAST({_KMV_M} AS BIGINT) AS DOUBLE)"
        f" / CAST(kth_hash AS DOUBLE) END AS est_distinct_24h",
    )


SQL_KMV_SLIDING = f"""
WITH ev AS (
  SELECT event_type, {_DUCK_HOUR} AS hr,
    (user_id * {_KNUTH}) % {_KMV_M} AS h
  FROM events
),
hourly_hashes AS (SELECT DISTINCT event_type, hr, h FROM ev),
sketch AS (
  SELECT event_type, hr, h FROM (
    SELECT event_type, hr, h, ROW_NUMBER() OVER (
      PARTITION BY event_type, hr ORDER BY h) AS rn
    FROM hourly_hashes
  ) WHERE rn <= {_SLIDE_K}
),
hours AS (SELECT DISTINCT event_type, hr AS target_hr FROM hourly_hashes),
fanned AS (
  SELECT DISTINCT s.event_type, s.hr + o.off AS target_hr, s.h
  FROM sketch s, UNNEST(range(0, {_SLIDE_HOURS})) AS o(off)
  JOIN hours t ON t.event_type = s.event_type
    AND t.target_hr = s.hr + o.off
),
merged AS (
  SELECT event_type, target_hr, h FROM (
    SELECT event_type, target_hr, h, ROW_NUMBER() OVER (
      PARTITION BY event_type, target_hr ORDER BY h) AS rn
    FROM fanned
  ) WHERE rn <= {_SLIDE_K}
)
SELECT event_type, target_hr, sketch_n, kth_hash,
  CASE WHEN sketch_n < {_SLIDE_K} THEN CAST(sketch_n AS DOUBLE)
    ELSE CAST(({_SLIDE_K} - 1) * CAST({_KMV_M} AS BIGINT) AS DOUBLE)
      / CAST(kth_hash AS DOUBLE) END AS est_distinct_24h
FROM (
  SELECT event_type, target_hr, CAST(COUNT(*) AS BIGINT) AS sketch_n,
    CAST(MAX(h) AS BIGINT) AS kth_hash
  FROM merged GROUP BY 1, 2
)
"""


def register_all() -> None:
    register_extra("sketch_bitmap_rollup", q_bitmap_rollup, SQL_BITMAP_ROLLUP)
    register_extra("sketch_kmv_distinct", q_kmv_distinct, SQL_KMV_DISTINCT)
    register_extra("sketch_kmv_sliding", q_kmv_sliding, SQL_KMV_SLIDING)
