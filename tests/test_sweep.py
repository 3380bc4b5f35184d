"""Sweep-line properties: brute-force equivalence and segmented ≡ global."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators.sweep import (
    explode_events,
    running_sums,
    sweep_maxima,
)

KEPT_SCHEMA = (
    "seq long, start_ms long, end_ms long, admission_wait long, "
    "num_backends long, reqd_cache_gb double, reqd_agg_mem double, "
    "memory_spilled_gb double, avg_vcores double, avg_data_rate double, "
    "min_executor_pod_raw double"
)


def _random_kept(n: int, seed: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        start = rng.randrange(0, 10_000)
        dur = rng.randrange(1, 2_000)
        rows.append(
            (
                i, start, start + dur, rng.randrange(0, 5),
                rng.randrange(1, 8),
                round(rng.uniform(0, 100), 2), round(rng.uniform(0, 100), 2),
                round(rng.uniform(0, 50), 2), round(rng.uniform(0, 16), 2),
                round(rng.uniform(0, 10), 2), round(rng.uniform(0, 120), 2),
            )
        )
    return rows


def brute_force_max_concurrency(rows) -> int:
    """Reference semantics (impala_query_sizing.py:372-383): sort events,
    running count, max only at start events; ties ordered (ts, seq, start-first)."""
    events = []
    for r in rows:
        seq, start, end, wait = r[0], r[1], r[2], r[3]
        events.append((start + wait, seq, 0, +1))  # sign DESC: start first
        events.append((end, seq, 1, -1))
    events.sort()
    cur = best = 0
    for _, _, _, delta in events:
        cur += delta
        if delta > 0:
            best = max(best, cur)
    return best


def test_sweep_matches_brute_force(spark):
    for seed in (1, 7, 42):
        rows = _random_kept(60, seed)
        kept = spark.createDataFrame(rows, KEPT_SCHEMA)
        maxima = sweep_maxima(running_sums(explode_events(kept))).collect()[0]
        assert maxima.max_concurrent_queries == brute_force_max_concurrency(rows)


def test_segmented_equals_global(spark):
    rows = _random_kept(300, seed=99)
    kept = spark.createDataFrame(rows, KEPT_SCHEMA)
    ev = explode_events(kept)
    glob = running_sums(ev, segmented=False).orderBy("event_pos").collect()
    seg = running_sums(ev, segmented=True, n_buckets=8).orderBy("event_pos").collect()
    assert len(glob) == len(seg) == 600
    for g, s in zip(glob, seg):
        # integer micro-unit arithmetic → exact equality, no tolerance
        assert g == s, f"divergence at event_pos={g.event_pos}: {g} vs {s}"


def test_end_events_cancel_to_zero(spark):
    rows = _random_kept(40, seed=3)
    kept = spark.createDataFrame(rows, KEPT_SCHEMA)
    last = (
        running_sums(explode_events(kept))
        .orderBy(F.col("event_pos").desc())
        .limit(1)
        .collect()[0]
    )
    assert last.run_queries == 0
    for m in ("run_pods", "run_cache", "run_mem", "run_cpu", "run_spill"):
        assert getattr(last, m) == 0.0, m
