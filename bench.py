"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf", "reps"}.

Each query is forced end-to-end with the noop sink (full column
materialization — a bare count() would let Catalyst prune the work).

Noise robustness (VERDICT r3 item 6): single-pass local timings showed
up to 4.5x machine-noise spread on identical code, so the suite runs
``--reps N`` full passes (default 3, or $SPARK_GRAFT_REPS) and reports
the per-query MIN across passes — the comparable number BASELINE.md's
r3 variance analysis had to reconstruct by hand. The cache is cleared
between passes so every rep pays the same intra-pass plan-keyed cache
sharing the single-pass numbers did (min-of-reps stays like-for-like
with earlier rounds' best case, not an artifact of warm caches).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def _reps_from_argv() -> int:
    argv = sys.argv[1:]
    if "--reps" in argv:
        return max(1, int(argv[argv.index("--reps") + 1]))
    for a in argv:
        if a.startswith("--reps="):
            return max(1, int(a.split("=", 1)[1]))
    return max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))


def _run_pass(spark, sf_dir: str, ent) -> dict[str, float]:
    timings: dict[str, float] = {}
    for name, fn in ent.queries().items():
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    # headline: ONE full EP2 pipeline pass (the reference's whole program —
    # derive+classify+route+aggregates+sweep+reports off a single cached
    # derive), comparable to the reference's single-node end-to-end run.
    t0 = time.perf_counter()
    from impala_base_to_cdw_sizing_spark.config import DEFAULT_PARAMS
    from impala_base_to_cdw_sizing_spark.plans.pipeline import run_sizing
    from impala_base_to_cdw_sizing_spark.plans.reports import (
        collect_report_values,
    )
    from impala_base_to_cdw_sizing_spark.sources.synthetic import (
        query_history_from_events,
    )

    res = run_sizing(query_history_from_events(spark, sf_dir), DEFAULT_PARAMS)
    collect_report_values(res, DEFAULT_PARAMS)  # forces every branch
    # unpersist the frames that actually hold the caches (kept is a
    # filter over derived, unpersisting it was a no-op)
    if res.routed.derived is not None:
        res.routed.derived.unpersist()
    res.summary.unpersist()
    if res.sweep_events is not None:
        res.sweep_events.unpersist()
    timings["ep2_full_pipeline"] = round(time.perf_counter() - t0, 3)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    reps = _reps_from_argv()

    import __spark_entry__ as ent
    from impala_base_to_cdw_sizing_spark.session import build_spark
    from impala_base_to_cdw_sizing_spark.sources.synthetic import _QH_MEMO

    # width scales with the input dir (r10 verdict #6) — at sf0.1 this
    # stays at the core count, so driver-bench numbers are comparable;
    # ≥sf1 runs get the measured wider-shuffle remediation automatically
    spark = build_spark("bench", data_dir=sf_dir)
    shuffle_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    # warm the JVM + parquet footers so per-query numbers measure the
    # queries, not session startup
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

    passes = []
    for _ in range(reps):
        passes.append(_run_pass(spark, sf_dir, ent))
        # reset cross-query cache sharing so every pass is like-for-like
        spark.catalog.clearCache()
        _QH_MEMO.clear()

    timings = {
        name: min(p[name] for p in passes) for name in passes[0]
    }
    total = round(sum(timings.values()), 3)
    # the declared tier widened from 50 queries in r9+ (flagship
    # promotions, sizing_report_values, sizing_api_flatten); the
    # r1-comparable number for the ≤2x baseline gate is the subtotal over
    # the original registry — everything except the post-r1 names
    # (BASELINE.md records both)
    from impala_base_to_cdw_sizing_spark.operators.queries_ext import PROMOTED

    post_r1 = set(PROMOTED) | {
        "sizing_report_values",  # r10 addition
        "sizing_api_flatten",  # r11 addition
    }
    legacy50 = round(
        sum(t for n, t in timings.items() if n not in post_r1), 3
    )
    print(
        json.dumps(
            {
                "metric": "suite_total",
                "value": total,
                "unit": "sec",
                # round-over-round comparisons read queries_min (r10
                # verdict #7); queries stays as the min-of-reps alias it
                # has carried since r3 so older tooling keeps working,
                # and queries_single records the UN-minned first pass so
                # the noise band is visible in the artifact itself.
                "queries": timings,
                "queries_min": timings,
                "queries_single": passes[0],
                "legacy50_total": legacy50,
                "sf": sf,
                "reps": reps,
                "shuffle_partitions": shuffle_partitions,
            }
        )
    )


if __name__ == "__main__":
    main()
