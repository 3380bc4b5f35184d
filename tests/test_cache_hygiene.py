"""Registry-session cache hygiene (r4 verdict #5): a long-lived session
running registered queries must not accumulate storage memory. The
twice-read materializations inside sketch_countmin_topk, mix_sources,
and rel_tpch_q15_topview are localCheckpoints (GC-scoped), not cache()
entries; the plan-keyed caches that remain (the shared MinHash signature
pipeline) must be REUSED across runs, not duplicated."""

from __future__ import annotations

import __spark_entry__ as ent
from tests.conftest import SF_SMALL


def _cached_plans(spark) -> int:
    cm = spark._jsparkSession.sharedState().cacheManager()
    if cm.isEmpty():
        return 0
    # CachedData entries, via the IndexedSeq the manager exposes
    return cm.cachedData().size()


def test_converted_queries_leave_no_cache_entries(spark):
    spark.catalog.clearCache()
    qs = ent.extra_queries()
    for name in ["sketch_countmin_topk", "mix_sources", "rel_tpch_q15_topview"]:
        qs[name](spark, SF_SMALL).collect()
    assert _cached_plans(spark) == 0, (
        "twice-read materializations must be GC-scoped localCheckpoints, "
        "not unreleased cache() entries"
    )


def test_plan_keyed_caches_are_flat_across_repeat_runs(spark):
    """The dedup family's shared MinHash cache is plan-keyed: a second
    run of the same query must hit the same entry, so the cache-entry
    count is identical after run 1 and run 2 — flat, not growing."""
    spark.catalog.clearCache()
    qs = ent.extra_queries()
    qs["graph_pagerank"](spark, SF_SMALL).collect()
    after_first = _cached_plans(spark)
    qs["graph_pagerank"](spark, SF_SMALL).collect()
    qs["graph_pagerank_conserving"](spark, SF_SMALL).collect()
    after_repeat = _cached_plans(spark)
    assert after_repeat == after_first, (
        f"cache entries grew across repeat runs: {after_first} -> {after_repeat}"
    )
    spark.catalog.clearCache()
