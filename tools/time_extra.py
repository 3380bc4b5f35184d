"""Hazard hunt over the extra tier: time every ``extra_queries()`` entry
at a given sf dir (1 pass, noop sink) and print one JSON line, same
shape as bench.py. Not a benchmark protocol — a scaling-exponent probe:
run at two sfs and feed both outputs to tools/scaling_report.py to find
super-linear growth in the pytest-verified tier the way BASELINE.md r5
did for the declared tier (which caught dedup_simhash at alpha=2.0).

Usage: SPARK_GRAFT_SF_DIR=... python tools/time_extra.py [name ...]
(names filter the run to a subset — the sf3 exponent passes only re-run
the heavy queries, not all 90+)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        # tolerate suffixed dirs like .testdata/sf1skew
        tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        sf = float(tail.rstrip("abcdefghijklmnopqrstuvwxyz"))
    except ValueError:
        sf = -1.0

    import __spark_entry__ as ent
    from impala_base_to_cdw_sizing_spark.session import build_spark

    # data_dir engages the scale-aware shuffle width (sf10 → ~209
    # partitions), matching the bench/probe protocol since r11
    spark = build_spark("time-extra", data_dir=sf_dir)
    timings: dict[str, float] = {}
    wanted = set(sys.argv[1:])
    registry = ent.extra_queries()
    if wanted:
        # explicit names may come from either tier — the sf-scaling
        # passes probe declared heavies (dedup_components, ...) too
        registry = dict(registry)
        registry.update(ent.queries())
        missing = wanted - set(registry)
        if missing:
            sys.exit(f"unknown queries: {sorted(missing)}")
        registry = {n: registry[n] for n in sorted(wanted)}
    for name, fn in registry.items():
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # noqa: BLE001
            timings[name] = -1.0
            print(f"ERR {name}: {str(e)[:160]}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "extra_tier_single_pass",
                "value": round(sum(t for t in timings.values() if t > 0), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "reps": 1,
            }
        )
    )


if __name__ == "__main__":
    main()
