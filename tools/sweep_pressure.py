"""Segmented sweep under real memory pressure (r7 verdict #8).

The 128 GiB sandbox never pressures memory, so the segmented sweep's
spill story rested on AQE prose. This script makes it a measurement: a
DEDICATED low-memory session (2 GiB driver in local mode = executors
share it, memory.fraction squeezed to 0.15, local[4]) runs
the segmented sweep AND the sequential twin over sf3 (~2.6 M kept
intervals → 5.2 M ±events), asserts the two remain row-for-row equal
under spill, and reports the actual spill volume from the status REST
API. Exit 0 = bit-equality held under pressure; the JSON line carries
the evidence (memoryBytesSpilled / diskBytesSpilled > 0, else the run
proves only headroom, not spill behavior — the test checks this).

Usage: python tools/sweep_pressure.py [sf_dir]   (default .testdata/sf3)
Driven by tests/test_sweep_under_pressure.py via subprocess (a fresh
JVM is the only way to pin driver memory).
"""

from __future__ import annotations

import json
import sys
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else ".testdata/sf3"

    import os

    os.environ["SPARK_DRIVER_MEMORY"] = "2g"
    from impala_base_to_cdw_sizing_spark.session import build_spark

    spark = build_spark(
        "sweep-pressure",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={
            # squeeze execution+storage memory so the per-bucket sorts
            # and the exchange genuinely spill at sf3 (~300 MB unified
            # memory against a multi-hundred-MB sort)
            "spark.memory.fraction": "0.15",
            "spark.ui.enabled": "true",
            "spark.ui.port": "0",  # any free port; read back from uiWebUrl
        },
    )
    import __spark_entry__ as ent
    from impala_base_to_cdw_sizing_spark.operators.sweep import (
        explode_events,
        running_sums,
    )
    from pyspark.sql import functions as F

    events = explode_events(ent._kept(spark, sf_dir))

    def digest(df):
        # order-independent row digest computed IN Spark — collecting
        # 10.5M rows into a squeezed driver would thrash the driver
        # heap and measure the wrong thing. sum of per-row xxhash64
        # over every column (cast to string) detects any value change;
        # count pins cardinality.
        cols = [F.col(c).cast("string") for c in df.columns]
        return df.agg(
            F.count("*").alias("n"),
            # DECIMAL(38,0) sum: exact and overflow-free for 10M 64-bit
            # terms (ANSI mode makes a BIGINT sum of hashes throw)
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
        ).first()

    dg_seg = digest(running_sums(events, segmented=True))
    dg_seq = digest(running_sums(events, segmented=False))
    equal = tuple(dg_seg) == tuple(dg_seq)
    n_rows = dg_seg["n"]

    # spill evidence from the status REST API (UI enabled above)
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
    )
    mem_spill = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk_spill = sum(s.get("diskBytesSpilled", 0) for s in stages)

    print(
        json.dumps(
            {
                "metric": "sweep_under_pressure",
                "sf_dir": sf_dir,
                "rows": int(n_rows),
                "segmented_equals_sequential": equal,
                "memoryBytesSpilled": mem_spill,
                "diskBytesSpilled": disk_spill,
                "driver_memory": "2g",
                "memory_fraction": 0.15,
                "shuffle_partitions": 8,
            }
        )
    )
    return 0 if (equal and n_rows > 0) else 1


if __name__ == "__main__":
    raise SystemExit(main())
