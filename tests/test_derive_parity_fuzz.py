"""Fuzz the derive dual-definition: Spark ``derive()`` and the generated
DuckDB ``derived_cte`` must agree bit-for-bit on arbitrary inputs, not
just the synthetic corpus (guards the round2/ceil/division twins against
boundary regressions)."""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings, strategies as st

import pytest
from impala_base_to_cdw_sizing_spark.config import DEFAULT_PARAMS
from impala_base_to_cdw_sizing_spark.operators.derive import (
    DERIVED_COLUMNS,
    derive,
    derived_cte,
)

QH_SCHEMA = (
    "seq long, duration_millis long, reqd_cache_gb double, reqd_agg_mem double, "
    "memory_spilled_gb double, cpu_time_sec double, admission_wait long, "
    "num_backends long"
)

pos_double = st.floats(
    min_value=0.0, max_value=1e6, allow_nan=False, allow_infinity=False
)

row_strategy = st.tuples(
    st.integers(min_value=1, max_value=100_000_000),  # duration_millis
    pos_double,  # reqd_cache_gb
    pos_double,  # reqd_agg_mem
    pos_double,  # memory_spilled_gb
    pos_double,  # cpu_time_sec
    st.integers(min_value=0, max_value=100_000),  # admission_wait
    st.integers(min_value=1, max_value=128),  # num_backends
)

_SPARK = None


@pytest.mark.slow  # re-tiered r15: driver gate = fast tier; this test's coverage stays in the release gate (pytest -m "")
def test_derive_twins_agree_on_fuzzed_inputs(spark):
    global _SPARK
    _SPARK = spark

    @settings(max_examples=15, deadline=None)
    @given(st.lists(row_strategy, min_size=1, max_size=100))
    def check(rows):
        data = [(i, *r) for i, r in enumerate(rows)]
        sdf = _SPARK.createDataFrame(data, QH_SCHEMA)
        got = (
            derive(sdf, DEFAULT_PARAMS)
            .select("seq", *DERIVED_COLUMNS)
            .toPandas()
            .sort_values("seq")
            .reset_index(drop=True)
        )

        con = duckdb.connect()
        pdf = pd.DataFrame(
            data,
            columns=[
                "seq", "duration_millis", "reqd_cache_gb", "reqd_agg_mem",
                "memory_spilled_gb", "cpu_time_sec", "admission_wait",
                "num_backends",
            ],
        )
        con.register("qh", pdf)
        cte = derived_cte(DEFAULT_PARAMS, source="qh")
        want = (
            con.execute(
                f"WITH {cte} SELECT seq, "
                + ", ".join(DERIVED_COLUMNS)
                + " FROM derived ORDER BY seq"
            )
            .fetch_df()
            .reset_index(drop=True)
        )
        for c in ["seq", *DERIVED_COLUMNS]:
            gv, wv = got[c].tolist(), want[c].tolist()
            assert gv == wv, (
                f"col {c} diverged: first mismatch "
                f"{next((i, a, b) for i, (a, b) in enumerate(zip(gv, wv)) if a != b)}"
            )

    check()
