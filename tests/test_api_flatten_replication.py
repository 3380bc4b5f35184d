"""Pure-Python replication of ``sizing_api_flatten`` (third engine).

The declared row is already Spark-vs-DuckDB exact; this test recomputes
every flattened value in plain Python straight from the fixture
generator's ``make_doc`` (NOT from the parquet file — so a fixture/
generator drift is also caught) and compares row-for-row. ``round2`` is
replicated as ``floor(x*100 + 0.5)/100`` with ``math.floor`` on the same
IEEE doubles, which is the exact op sequence both engines run.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest
from tools.gen_api_fixture import N_DOCS, make_doc  # noqa: E402

GB = 1024 * 1024 * 1024


def _round2(x: float | None) -> float | None:
    return None if x is None else math.floor(x * 100.0 + 0.5) / 100.0


def _num(attrs: dict | None, key: str) -> float | None:
    if attrs is None or key not in attrs:
        return None
    return float(attrs[key])


def _expected_row(i: int) -> tuple:
    d = make_doc(i)
    a = d["attributes"]
    has_mem = a is not None and "memory_aggregate_peak" in a
    mem = _num(a, "memory_aggregate_peak")
    route = (
        "rejected"
        if d["queryType"] != "QUERY"
        else ("accepted" if has_mem else "skipped")
    )
    aw = a.get("admission_wait") if a else None
    nb = a.get("num_backends") if a else None
    return (
        d["queryId"],
        a.get("pool") if a else None,
        d["startTime"],
        d["endTime"],
        d["durationMillis"],
        _round2(_num(a, "hdfs_bytes_read") / GB if a else None)
        if a and "hdfs_bytes_read" in a else None,
        _round2(mem / GB) if mem is not None else None,
        _round2(_num(a, "memory_spilled") / GB) if a and "memory_spilled" in a else None,
        _round2(_num(a, "thread_cpu_time") / 1000) if a and "thread_cpu_time" in a else None,
        d["queryType"],
        int(aw) if aw is not None else None,
        int(nb) if nb is not None else None,
        has_mem,
        d["queryState"],
        d["user"],
        route,
    )


@pytest.mark.slow  # re-tiered r15: driver gate = fast tier; this test's coverage stays in the release gate (pytest -m "")
def test_spark_flatten_matches_pure_python(spark):
    from impala_base_to_cdw_sizing_spark.operators.api_flatten import (
        q_sizing_api_flatten,
    )

    got = {
        r[0]: tuple(r)
        for r in q_sizing_api_flatten(spark, "unused").collect()
    }
    assert len(got) == N_DOCS
    mismatches = []
    for i in range(N_DOCS):
        want = _expected_row(i)
        if got[want[0]] != want:
            mismatches.append((i, got[want[0]], want))
    assert not mismatches, mismatches[:3]


def test_fixture_file_matches_generator(spark):
    """The COMMITTED parquet must be byte-for-value identical to what
    the generator produces today — regenerating must be a no-op."""
    import pyarrow.parquet as pq

    from impala_base_to_cdw_sizing_spark.operators.api_flatten import FIXTURE

    table = pq.read_table(FIXTURE)
    assert table.num_rows == N_DOCS
    rows = table.to_pylist()
    for i in (0, 1, 36, 37, 500, 1000, N_DOCS - 1):
        want = make_doc(i)
        gotattrs = rows[i].pop("attributes")
        wantattrs = want.pop("attributes")
        assert rows[i] == want, i
        # pyarrow returns MAP as list of (k, v) tuples
        assert (
            None if gotattrs is None else dict(gotattrs)
        ) == wantattrs, i
