"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value" (total sec), "unit", "queries": {name: sec},
"sf"}.

Each query is forced end-to-end with the noop sink (full column
materialization — a bare count() would let Catalyst prune the work).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as ent
    from impala_base_to_cdw_sizing_spark.session import build_spark

    spark = build_spark("bench")

    # warm the JVM + parquet footers so per-query numbers measure the
    # queries, not session startup
    spark.read.parquet(f"{sf_dir}/events.parquet").count()

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

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
