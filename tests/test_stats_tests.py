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


def test_chi2_null_in_indeterminate_window(spark):
    """r8 ADVICE: the per-cell floor is downward-biased by up to
    cells·N·10^-6 χ² units; when the computed statistic sits below the
    critical value but within that bound of it, the decision could flip
    and must be NULL, not a confident FALSE. 2×2 at N = 10^6 gives a
    4-unit-wide window, so a mild association (χ² ≈ 2.56 < 3.841 <
    2.56 + 4) lands inside it. The fixture also demonstrates the bias is
    REAL, not theoretical: the per-cell floors eat the entire statistic
    (computed χ² = 0.0 where the float reference says 2.56), so without
    the bound the decision would read as a confident FALSE off a number
    that is 2.56 too low."""
    cells = {
        ("a", 0): 250_400, ("a", 1): 249_600,
        ("b", 0): 249_600, ("b", 1): 250_400,
    }
    ref, _, _, _ = _chi2_float(cells)
    assert 2.0 < ref < 3.841  # true statistic: inside the window
    row = ST.chi2_from_cells(spark, _cells_df(spark, cells)).collect()[0]
    assert row.dof == 1
    assert row.chi2 <= ref <= row.chi2 + row.chi2_err_bound
    assert row.chi2_err_bound == 4.0  # 4 cells · 10^6 rows · 10^-6
    assert row.reject_independence_05 is None


def test_benford_degenerate_input_counts_absent_digits(spark):
    """r8 ADVICE: a first digit with zero observations must contribute
    its full (0 − n_expected)²/n_expected term. All-nines input: 8 of 9
    digits are absent, yet all 9 rows come back and χ² replicates the
    pure-python left-join arithmetic (the old inner join dropped the 8
    absent digits and understated χ² by their entire expected mass)."""
    n = 10_000
    rows = ST.benford_from_digit_counts(
        spark, _digit_counts_df(spark, {"9": n})
    ).collect()
    assert len(rows) == 9
    chi2_milli = 0
    for d, p in ST._BENFORD_MICRO.items():
        exp = (n * p) // 1_000_000
        obs = n if d == 9 else 0
        chi2_milli += ((obs - exp) * (obs - exp) * 1000) // exp
    for r in rows:
        assert r.chi2 == chi2_milli / 1000.0
        assert r.reject_benford_05 is True
    by_d = {r.digit: r for r in rows}
    assert by_d["1"].n_obs == 0
    assert by_d["1"].contrib_milli == (
        by_d["1"].n_expected * 1000  # (0-e)²·1000 DIV e == e·1000 exactly
    )


def _digit_counts_df(spark, counts):
    return spark.createDataFrame(
        [(d, n) for d, n in sorted(counts.items())],
        "digit STRING, n_obs BIGINT",
    )


def test_benford_rejects_uniform_accepts_geometric(spark):
    """Power and level on KNOWN distributions: the corpus's uniform
    prices must reject (uniform first digits are nowhere near
    log10(1+1/d)), and a geometric sample with Benford-exact digit
    proportions must accept."""
    rows = ST.q_benford_digits(spark, SF_ORACLE).collect()
    assert len(rows) == 9
    assert all(r.reject_benford_05 is True for r in rows)
    # observed counts really came from the data: digits 1-4 dominate
    by_d = {r.digit: r.n_obs for r in rows}
    assert min(by_d[str(d)] for d in (1, 2, 3, 4)) > 4 * by_d["5"]

    # conforming fixture: counts proportional to log10(1+1/d)
    n = 1_000_000
    conforming = {
        str(d): (n * p) // 1_000_000 for d, p in ST._BENFORD_MICRO.items()
    }
    rows2 = ST.benford_from_digit_counts(
        spark, _digit_counts_df(spark, conforming)
    ).collect()
    assert all(r.reject_benford_05 is False for r in rows2)
    assert all(abs(r.n_obs - r.n_expected) <= 1 for r in rows2)


def test_benford_replicates_in_pure_python(spark):
    prices = (
        spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
        .selectExpr("floor(o_totalprice) AS p")
        .collect()
    )
    counts = Counter(str(int(r.p))[0] for r in prices)
    n = sum(counts.values())
    expect = {}
    chi2_milli = 0
    for d, p in ST._BENFORD_MICRO.items():
        exp = (n * p) // 1_000_000
        diff = counts[str(d)] - exp
        c = (diff * diff * 1000) // exp
        chi2_milli += c
        expect[str(d)] = (counts[str(d)], exp, c)
    rows = ST.q_benford_digits(spark, SF_ORACLE).collect()
    for r in rows:
        obs, exp, c = expect[r.digit]
        assert (r.n_obs, r.n_expected, r.contrib_milli) == (obs, exp, c)
        assert r.chi2 == chi2_milli / 1000.0
