"""K-means properties + partitioned-write partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

import pytest
from tests.conftest import SF_SMALL


def test_kmeans_inertia_decreases_with_iterations(spark, monkeypatch):
    import impala_base_to_cdw_sizing_spark.operators.kmeans as km

    def total_inertia(n_iters: int) -> int:
        monkeypatch.setattr(km, "N_ITERS", n_iters)
        rows = km.q_kmeans_assignments(spark, SF_SMALL).collect()
        assert sum(r.n_points for r in rows) == 500  # every vector assigned
        return sum(r.inertia_micro for r in rows)

    i0, i1, i2 = total_inertia(0), total_inertia(1), total_inertia(2)
    # Lloyd iterations never increase inertia
    assert i1 <= i0 and i2 <= i1
    assert i1 < i0  # and at least the first step actually improves


@pytest.mark.slow  # re-tiered r15: driver gate = fast tier; this test's coverage stays in the release gate (pytest -m "")
def test_partitioned_write_enables_partition_pruning(spark, tmp_path):
    """The scale-critical sink property: a partitionBy write must let a
    later filtered read prune partitions at planning time."""
    from impala_base_to_cdw_sizing_spark.config import DEFAULT_PARAMS
    from impala_base_to_cdw_sizing_spark.plans.pipeline import run_sizing
    from impala_base_to_cdw_sizing_spark.sources.synthetic import (
        query_history_from_events,
    )

    res = run_sizing(query_history_from_events(spark, SF_SMALL), DEFAULT_PARAMS)
    out = str(tmp_path / "by_pool")
    res.routed.kept.select("query_id", "pool", "min_executor_pod").write.mode(
        "overwrite"
    ).partitionBy("pool").parquet(out)

    back = spark.read.parquet(out).filter(F.col("pool") == "click")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "click" in plan
    n_dirs = len(list((tmp_path / "by_pool").glob("pool=*")))
    assert n_dirs >= 3  # several pools materialized as partition dirs
    assert back.count() > 0
