"""Chi-square independence: float-reference replication (the integer
micro-pipeline must land within its documented truncation bound of the
textbook float formula) plus power/level behavior on fixtures with
KNOWN dependence structure."""

from __future__ import annotations

from collections import Counter

from impala_base_to_cdw_sizing_spark.operators import stats_tests as ST
from impala_base_to_cdw_sizing_spark.sources.files import load_events
from tests.conftest import SF_ORACLE


def _chi2_float(cells):
    rows, cols, n = Counter(), Counter(), 0
    for (t, h), obs in cells.items():
        rows[t] += obs
        cols[h] += obs
        n += obs
    stat = 0.0
    for (t, h), obs in cells.items():
        exp = rows[t] * cols[h] / n
        stat += (obs - exp) ** 2 / exp
    return stat, n, len(rows), len(cols)


def test_chi2_matches_float_reference_within_truncation(spark):
    ev = load_events(spark, SF_ORACLE).selectExpr(
        "event_type", "CAST((ts DIV 3600000000000) % 24 AS BIGINT) AS hod"
    ).collect()
    cells = Counter((r.event_type, r.hod) for r in ev)
    ref, n, r_, c_ = _chi2_float(cells)
    row = ST.q_chi2_independence(spark, SF_ORACLE).collect()[0]
    assert (row.n_total, row.n_types, row.n_hods) == (n, r_, c_)
    assert row.dof == (r_ - 1) * (c_ - 1)
    # per-cell truncation < 1 micro-unit, scaled by N at the end
    bound = len(cells) * n / ST._MICRO
    assert abs(row.chi2 - ref) <= bound
    assert row.crit_05 is not None


def _cells_df(spark, cells):
    return spark.createDataFrame(
        [(t, h, n) for (t, h), n in sorted(cells.items())],
        "event_type STRING, hod BIGINT, obs BIGINT",
    )


def test_chi2_rejects_on_dependent_fixture(spark):
    # perfectly dependent 2x2: type a only at hod 0, type b only at hod 1
    cells = {("a", 0): 500, ("a", 1): 1, ("b", 0): 1, ("b", 1): 500}
    row = ST.chi2_from_cells(spark, _cells_df(spark, cells)).collect()[0]
    assert row.dof == 1
    assert row.reject_independence_05 is True
    assert row.chi2 > 900  # near-perfect association on ~1000 rows


def test_chi2_accepts_on_independent_fixture(spark):
    # exactly proportional margins => chi2 == 0
    cells = {("a", 0): 300, ("a", 1): 100, ("b", 0): 600, ("b", 1): 200}
    row = ST.chi2_from_cells(spark, _cells_df(spark, cells)).collect()[0]
    assert row.dof == 1
    assert row.reject_independence_05 is False
    assert abs(row.chi2) < 0.01
