"""Behavioral pins for funnel/retention (oracle parity in
test_extra_tier): the strict ordering must actually bind, and the
retention triangle must be self-consistent."""

from __future__ import annotations

from impala_base_to_cdw_sizing_spark.operators.funnels import (
    q_funnel_steps,
    q_retention_cohorts,
)
from impala_base_to_cdw_sizing_spark.sources.files import load_events
from tests.conftest import SF_ORACLE


def test_funnel_ordering_binds(spark):
    rows = q_funnel_steps(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        # stages are prefix-monotone: a NULL stage nulls everything after
        stages = [r.view_ns, r.click_ns, r.purchase_ns]
        seen_null = False
        for s in stages:
            if s is None:
                seen_null = True
            else:
                assert not seen_null, r
        assert r.stage_reached == sum(s is not None for s in stages)
        # completed stages are strictly increasing in time
        present = [s for s in stages if s is not None]
        assert present == sorted(present) and len(set(present)) == len(present)
    # the dense fixture converts everyone — the stall semantics are
    # pinned on a constructed log below
    assert any(r.stage_reached == 3 for r in rows), "no conversions — vacuous"


def test_funnel_strict_order_bites_on_constructed_log(spark, tmp_path):
    """Events exist but out of ORDER: the funnel must stall — this is
    what separates it from three existence checks."""
    rows = [
        # user 1: purchase then click then view — stalls after view
        (1, "2024-01-01 10:00:00", 1, "purchase", 1.0, "{}"),
        (2, "2024-01-02 10:00:00", 1, "click", 1.0, "{}"),
        (3, "2024-01-03 10:00:00", 1, "view", 1.0, "{}"),
        # user 2: clean view -> click -> purchase
        (4, "2024-01-01 09:00:00", 2, "view", 1.0, "{}"),
        (5, "2024-01-02 09:00:00", 2, "click", 1.0, "{}"),
        (6, "2024-01-03 09:00:00", 2, "purchase", 1.0, "{}"),
        # user 3: view, then purchase BEFORE any click — stalls at click
        (7, "2024-01-01 08:00:00", 3, "view", 1.0, "{}"),
        (8, "2024-01-02 08:00:00", 3, "purchase", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.user_id: r for r in q_funnel_steps(spark, str(tmp_path)).collect()}
    assert got[1].stage_reached == 1  # click/purchase predate the view
    assert got[1].click_ns is None and got[1].purchase_ns is None
    assert got[2].stage_reached == 3
    assert got[2].view_ns < got[2].click_ns < got[2].purchase_ns
    assert got[3].stage_reached == 1  # purchase without a qualifying click
    assert got[3].purchase_ns is None


def test_scd2_intervals_tile_each_user_history(spark):
    """Intervals must tile: per user, run_ids are 1..N, exactly one open
    interval (the last), each interval's valid_to equals the next's
    valid_from, attrs of adjacent runs differ (change-compressed), and
    n_events sums back to the user's event count."""
    from impala_base_to_cdw_sizing_spark.operators.funnels import (
        q_scd2_intervals,
    )

    rows = q_scd2_intervals(spark, SF_ORACLE).collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r.user_id, []).append(r)
    ev_counts = {
        r.user_id: r.n
        for r in load_events(spark, SF_ORACLE)
        .groupBy("user_id").count().withColumnRenamed("count", "n").collect()
    }
    assert set(per_user) == set(ev_counts)
    for u, ivs in per_user.items():
        ivs.sort(key=lambda r: r.run_id)
        assert [r.run_id for r in ivs] == list(range(1, len(ivs) + 1))
        assert sum(r.n_events for r in ivs) == ev_counts[u]
        opens = [r for r in ivs if r.valid_to_ns is None]
        assert opens == [ivs[-1]]
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to_ns == b.valid_from_ns
            assert a.attr != b.attr  # runs are maximal


def test_retention_triangle_consistency(spark):
    rows = q_retention_cohorts(spark, SF_ORACLE).collect()
    assert rows
    by_cohort = {}
    for r in rows:
        assert r.week_offset >= 0
        by_cohort.setdefault(r.cohort_week, {})[r.week_offset] = r.n_users
    n_users_total = (
        load_events(spark, SF_ORACLE).select("user_id").distinct().count()
    )
    # offset 0 exists for every cohort and the cohort sizes sum to the
    # user population (every user is in exactly one cohort)
    assert all(0 in offs for offs in by_cohort.values())
    assert sum(offs[0] for offs in by_cohort.values()) == n_users_total
    # retention can never exceed the cohort's size
    for offs in by_cohort.values():
        assert all(n <= offs[0] for n in offs.values())


def test_funnel_window_replicates_and_differs_from_unbounded(spark):
    """Pure-Python windowFunnel replication (any-start, earliest-next
    greedy) and the semantic claim: the 24h deadline must genuinely
    disagree with rel_funnel_steps' unbounded earliest-chain on this
    corpus — otherwise the operator adds nothing."""
    from collections import Counter, defaultdict

    from impala_base_to_cdw_sizing_spark.operators.funnels import (
        _WF_NS,
        q_funnel_steps,
        q_funnel_window,
    )
    from impala_base_to_cdw_sizing_spark.sources.files import load_events
    from tests.conftest import SF_ORACLE

    ev = load_events(spark, SF_ORACLE).select(
        "user_id", "event_type", "ts"
    ).collect()
    by_user = defaultdict(lambda: defaultdict(list))
    for r in ev:
        by_user[r.user_id][r.event_type].append(r.ts)
    hist = Counter()
    for u, evs in by_user.items():
        views = sorted(evs.get("view", []))
        clicks = sorted(evs.get("click", []))
        purchases = sorted(evs.get("purchase", []))
        depth = 0
        for t1 in views:
            d = 1
            t2 = next(
                (t for t in clicks if t > t1 and t <= t1 + _WF_NS), None
            )
            if t2 is not None:
                d = 2
                t3 = next(
                    (t for t in purchases if t > t2 and t <= t1 + _WF_NS),
                    None,
                )
                if t3 is not None:
                    d = 3
            depth = max(depth, d)
        hist[depth] += 1
    rows = q_funnel_window(spark, SF_ORACLE).collect()
    got = {r.depth: r.n_users for r in rows}
    assert got == {d: n for d, n in hist.items()}
    n_total = sum(hist.values())
    for r in rows:
        assert r.n_total == n_total and r.share == r.n_users / n_total
    # the deadline bites: bounded depth-3 count < unbounded stage-3 count
    unbounded3 = sum(
        1
        for r in q_funnel_steps(spark, SF_ORACLE).collect()
        if r.stage_reached == 3
    )
    assert got.get(3, 0) < unbounded3
