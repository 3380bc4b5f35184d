"""Adversarial checks for rel_hourly_trend_ols and
rel_seasonal_residuals: exact pure-Python replication of the OLS
closed form (integer sufficient statistics + identical float ops), and
an injected-anomaly fixture proving the seasonal rule flags a genuine
spike while treating the recurring rush hour as baseline — the exact
case the single-median spike rule (rel_hourly_spikes_mad) gets wrong.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators import funnels
from impala_base_to_cdw_sizing_spark.sources.files import load_events
from tests.conftest import SF_SMALL


def test_ols_replicates_in_pure_python(spark):
    hourly = (
        load_events(spark, SF_SMALL)
        .selectExpr("event_type", "(ts div 1000000) div 3600000 AS hr")
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("y"))
        .collect()
    )
    per_type = defaultdict(list)
    for r in hourly:
        per_type[r.event_type].append((r.hr, r.y))
    got = {r.event_type: r for r in funnels.q_hourly_trend_ols(spark, SF_SMALL).collect()}
    assert set(got) == set(per_type)
    for et, pts in per_type.items():
        hr0 = min(h for h, _ in pts)
        xs = [h - hr0 for h, _ in pts]
        ys = [y for _, y in pts]
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        den = n * sxx - sx * sx
        slope = float(n * sxy - sx * sy) / float(den)
        intercept = float(sy) / n - slope * (float(sx) / n)
        r = got[et]
        # same integer statistics + same IEEE op sequence = bit equality
        assert r.n_hours == n and r.sy == sy
        assert r.slope == slope and r.intercept == intercept


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, ts, uid, et) for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string",
    ).selectExpr(
        "event_id", "ts", "user_id", "event_type",
        "CAST(0.0 AS double) AS value", "CAST(NULL AS string) AS props",
    )


def test_seasonal_flags_injected_spike_not_rush_hour(spark, tmp_path):
    """14 days: hour 8 is ALWAYS busy (rush hour, 30 events), every
    other hour quiet (3 events); day 7 hour 14 carries an injected
    incident (40 events). The single-median rule would flag every rush
    hour; the seasonal rule must flag ONLY the incident cell."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for day in range(14):
        for hod in range(24):
            base = 30 if hod == 8 else 3
            if day == 7 and hod == 14:
                base = 40
            for k in range(base):
                ts = t0 + dt.timedelta(days=day, hours=hod, seconds=k)
                rows.append((ts, day * 100 + k, "click"))
    _mk_events(spark, rows).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    out = funnels.q_seasonal_residuals(spark, str(tmp_path)).collect()
    flagged = {(r.day, r.hod) for r in out if r.is_anomaly}
    incident_day = next(
        r.day for r in out if r.n == 40 and r.hod == 14
    )
    assert flagged == {(incident_day, 14)}
    # rush-hour cells are baseline: residual 0, never anomalous
    rush = [r for r in out if r.hod == 8]
    assert rush and all(r.baseline == 30 and r.resid == 0 for r in rush)
    # contrast: the per-type single-median rule sees every rush hour as
    # a spike (median over ALL hours is the quiet 3) — the failure mode
    # the seasonal operator exists to fix
    mad_rows = funnels.q_hourly_spikes_mad(spark, str(tmp_path)).collect()
    rush_flag = [r for r in mad_rows if r.is_spike and r.n == 30]
    assert rush_flag, "single-median rule should flag rush hours here"
