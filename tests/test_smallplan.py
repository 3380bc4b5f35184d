"""small_plan_mode contract (r15): the tiny-iterative-round execution
mode must (a) engage only below the row threshold, (b) set AQE off and a
row-scaled shuffle width inside the block, and (c) restore BOTH confs on
every exit path — the power-iteration and star-contraction loops run
under it, and a leaked conf would silently reshape every later query on
the shared session."""

import pytest

from impala_base_to_cdw_sizing_spark.operators.smallplan import (
    _ROWS_PER_CORE,
    small_plan_mode,
)


def _confs(spark):
    return (
        spark.conf.get("spark.sql.adaptive.enabled"),
        spark.conf.get("spark.sql.shuffle.partitions"),
    )


def test_gate_engages_and_restores_below_threshold(spark):
    before = _confs(spark)
    with small_plan_mode(spark, 5_000) as engaged:
        assert engaged is True
        aqe, width = _confs(spark)
        assert aqe == "false"
        # 5000 rows -> 5000//4096 + 2 = 3 partitions (capped by session width)
        assert int(width) == min(int(before[1]), 3)
        assert int(width) >= 2
    assert _confs(spark) == before


def test_gate_noop_at_scale(spark):
    before = _confs(spark)
    n = _ROWS_PER_CORE * spark.sparkContext.defaultParallelism
    with small_plan_mode(spark, n) as engaged:  # at threshold: NOT small
        assert engaged is False
        assert _confs(spark) == before
    assert _confs(spark) == before


def test_confs_restored_when_loop_body_raises(spark):
    before = _confs(spark)
    with pytest.raises(RuntimeError, match="boom"):
        with small_plan_mode(spark, 100):
            raise RuntimeError("boom")
    assert _confs(spark) == before


def test_gated_rounds_compute_the_same_frame(spark):
    # the same tiny shuffle-bearing aggregate inside and outside the
    # gate: identical rows (partitioning must never change results)
    df = spark.range(0, 1000).selectExpr("id % 7 AS k", "id AS v")
    expected = sorted(df.groupBy("k").sum("v").collect())
    with small_plan_mode(spark, 1000) as engaged:
        assert engaged is True
        got = sorted(df.groupBy("k").sum("v").collect())
    assert got == expected
