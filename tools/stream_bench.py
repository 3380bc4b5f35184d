"""Streaming sustained-load probe (r5 verdict #8): ≥100 micro-batches
through Space-Saving heavy hitters and TTL near-dup candidates, one
JSON line out with rows/s and the per-batch state-store series. The
structural assertions live in tests/test_streaming_load.py; this tool
records the numbers for BASELINE.md's streaming section.

Usage: python tools/stream_bench.py [n_batches]
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 100

    from impala_base_to_cdw_sizing_spark.session import build_spark
    from impala_base_to_cdw_sizing_spark.streaming.loadgen import (
        run_heavyhitters_load,
        run_neardup_load,
    )

    spark = build_spark("stream-bench")
    workdir = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        hh = run_heavyhitters_load(spark, workdir, n_batches=n_batches)
        nd = run_neardup_load(spark, workdir, n_batches=n_batches)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    for r in (hh, nd):
        # the full series is for the test/inspection; keep the JSON
        # line readable with a decimated view
        series = r.pop("state_rows_series")
        r.pop("state_bytes_series")
        r["state_rows_every_10"] = series[::10] + [series[-1]]
    print(
        json.dumps(
            {
                "metric": "stream_load",
                "value": round(hh["busy_sec"] + nd["busy_sec"], 3),
                "unit": "sec",
                "heavyhitters": hh,
                "neardup_ttl": nd,
                "n_batches": n_batches,
            }
        )
    )


if __name__ == "__main__":
    main()
