"""Streaming sustained-load probe (r5 verdict #8): ≥100 micro-batches
through Space-Saving heavy hitters and TTL near-dup candidates, one
JSON line out with rows/s and the per-batch state-store series. The
structural assertions live in tests/test_streaming_load.py; this tool
records the numbers for BASELINE.md's streaming section.

Usage: python tools/stream_bench.py [n_batches] [--scale N]

``--scale`` multiplies the rows per trigger (r7 verdict #7: the 1-file
default is ~500 rows/batch for heavy hitters and ~200 for near-dup —
trigger-floor dominated, so its rows/s understates throughput; run
--scale 10 and --scale 100 for numbers where per-row work, not trigger
overhead, is the denominator). The state bounds are row-count
INDEPENDENT by construction (heavy-hitter state is one row per shard;
near-dup live buckets are set by the key window + TTL horizon, and
``--scale`` multiplies docs per key, not keys), so the same per-batch
state assertions hold at every scale — re-checked here, not just in
the scale-1 pytest.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_batches = int(args[0]) if args else 100
    scale = 1
    for i, a in enumerate(sys.argv):
        if a == "--scale":
            scale = int(sys.argv[i + 1])
        elif a.startswith("--scale="):
            scale = int(a.split("=", 1)[1])

    from impala_base_to_cdw_sizing_spark.session import build_spark
    from impala_base_to_cdw_sizing_spark.streaming.loadgen import (
        run_heavyhitters_load,
        run_neardup_load,
        run_session_load,
    )

    spark = build_spark("stream-bench")
    workdir = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        hh = run_heavyhitters_load(
            spark, workdir, n_batches=n_batches, rows_per_batch=500 * scale
        )
        nd = run_neardup_load(
            spark, workdir, n_batches=n_batches, docs_per_key=10 * scale
        )
        se = run_session_load(
            spark, workdir, n_batches=n_batches, rows_per_batch=500 * scale
        )
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    for r, label in ((hh, "heavyhitters"), (nd, "neardup"), (se, "session")):
        assert r["state_rows_max"] <= r["state_bound"], (
            f"{label}: state rows {r['state_rows_max']} exceeded the "
            f"structural bound {r['state_bound']} at scale {scale}"
        )
    for r in (hh, nd, se):
        # the full series is for the test/inspection; keep the JSON
        # line readable with a decimated view
        series = r.pop("state_rows_series")
        r.pop("state_bytes_series")
        r["state_rows_every_10"] = series[::10] + [series[-1]]
    print(
        json.dumps(
            {
                "metric": "stream_load",
                "value": round(hh["busy_sec"] + nd["busy_sec"] + se["busy_sec"], 3),
                "unit": "sec",
                "heavyhitters": hh,
                "neardup_ttl": nd,
                "session": se,
                "n_batches": n_batches,
                "scale": scale,
            }
        )
    )


if __name__ == "__main__":
    main()
