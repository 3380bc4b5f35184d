"""EP2 replay: CSV round-trip through the CLI surface (A5 + I2 + B1-B4)."""

from __future__ import annotations

import csv
import subprocess
import sys
from pathlib import Path
import pytest

ROWS = [
    # query_id, pool, start_time, end_time, duration_millis, reqd_cache_gb,
    # reqd_agg_mem, memory_spilled_gb, cpu_time_sec, query_type,
    # admission_wait, num_backends
    ("q1", "etl", "2021-07-12T01:00:00.000Z", "2021-07-12T01:00:10.000Z",
     10000, 100.0, 150.0, 0.0, 20.0, "QUERY", 0, 2),
    ("q2", "bi", "2021-07-12T01:00:05.500Z", "2021-07-12T01:00:25.500Z",
     20000, 2500.0, 900.0, 1200.0, 120.0, "QUERY", 500, 4),
    ("q3", "etl", "2021-07-12T01:00:20.000Z", "2021-07-12T01:01:00.000Z",
     40000, 90000.0, 45000.0, 0.0, 400.0, "QUERY", 0, 8),  # pruned (pods>100)
]

HEADER = [
    "query_id", "pool", "start_time", "end_time", "duration_millis",
    "reqd_cache_gb", "reqd_agg_mem", "memory_spilled_gb", "cpu_time_sec",
    "query_type", "admission_wait", "num_backends",
]


@pytest.mark.slow  # re-tiered r15: driver gate = fast tier; this test's coverage stays in the release gate (pytest -m "")
def test_replay_cli_end_to_end(tmp_path: Path):
    input_csv = tmp_path / "history.csv"
    with input_csv.open("w", newline="") as f:
        w = csv.writer(f)
        w.writerow(HEADER)
        w.writerows(ROWS)
    conf = tmp_path / "sizing.conf"
    conf.write_text(
        "\n".join(
            [
                f"input_file={input_csv}",
                f"output_file={tmp_path}/out_main",
                f"prune_output_file={tmp_path}/out_pruned",
                f"skip_query_file={tmp_path}/out_skipped",
                "pod_limit=100",
            ]
        )
    )
    proc = subprocess.run(
        [sys.executable, "-m", "impala_base_to_cdw_sizing_spark", str(conf)],
        capture_output=True, text=True, timeout=300,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "Individual Query Analysis" in out
    assert " Total Queries: 3" in out  # pruned row still counted (G1)
    assert "Queries Over Pod Limit ( 100 ): 1" in out
    main_csv = next((tmp_path / "out_main").glob("*.csv")).read_text()
    assert main_csv.splitlines()[0].startswith("query_id,pool,start_time")
    assert "q3" not in main_csv  # pruned out of the main sink
    pruned_csv = next((tmp_path / "out_pruned").glob("*.csv")).read_text()
    assert "q3" in pruned_csv
    # 24-column contract incl. the preserved header typo
    assert "in_executor_pod_spill" in main_csv.splitlines()[0]


def test_cli_arg_validation(tmp_path: Path):
    repo = str(Path(__file__).resolve().parent.parent)
    r = subprocess.run(
        [sys.executable, "-m", "impala_base_to_cdw_sizing_spark"],
        capture_output=True, text=True, timeout=60, cwd=repo,
    )
    assert r.returncode == 1 and "Config file parameter required" in r.stdout
    r = subprocess.run(
        [sys.executable, "-m", "impala_base_to_cdw_sizing_spark", "/nope.conf"],
        capture_output=True, text=True, timeout=60, cwd=repo,
    )
    assert r.returncode == 1 and "doesn't exist" in r.stdout
