"""Partitioned-layout pruning, proven at the plan level: a literal
partition-key filter must become a PartitionFilter on the scan (static
pruning), and a join against a filtered dim must inject a
dynamicpruningexpression (DPP) — row-count equality alone would pass
even if the engine scanned everything."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.sinks.layout import (
    read_partitioned,
    write_partitioned,
)
from impala_base_to_cdw_sizing_spark.sources.files import load_events
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def part_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "events_by_type")
    write_partitioned(load_events(spark, SF_SMALL), path, ["event_type"])
    return path


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_static_partition_pruning(spark, part_path):
    ev = read_partitioned(spark, part_path)
    one_type = ev.filter(F.col("event_type") == "purchase")
    plan = _executed_plan(one_type)
    assert "PartitionFilters" in plan
    # the filter must be ON the scan, not a post-scan Filter over all rows
    assert "purchase" in plan.split("PartitionFilters", 1)[1][:200]
    # and it still answers correctly
    want = load_events(spark, SF_SMALL).filter(
        F.col("event_type") == "purchase"
    ).count()
    assert one_type.count() == want > 0


def test_dynamic_partition_pruning(spark, part_path):
    ev = read_partitioned(spark, part_path)
    # dim: one row per event_type with a selective filter — the classic
    # fact-join-filtered-dim shape DPP exists for
    dim = (
        load_events(spark, SF_SMALL)
        .groupBy("event_type")
        .count()
        .withColumnRenamed("event_type", "d_type")
        .filter(F.col("count") > 0)
        .orderBy("d_type")
        .limit(1)
    )
    joined = ev.join(dim, ev.event_type == dim.d_type)
    plan = _executed_plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:3000]
    # correctness: equals the plain (unpartitioned) join
    plain = load_events(spark, SF_SMALL).join(
        dim, F.col("event_type") == dim.d_type
    )
    assert joined.count() == plain.count() > 0


def test_partitioned_roundtrip_loses_no_rows(spark, part_path):
    assert (
        read_partitioned(spark, part_path).count()
        == load_events(spark, SF_SMALL).count()
    )
