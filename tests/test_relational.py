"""Relational-operator properties beyond the oracle gate."""

from __future__ import annotations

from impala_base_to_cdw_sizing_spark.operators.relational import (
    q_setops,
    q_tpch_q3,
    q_tpch_q5,
    setops_via_native_operators,
)

from tests.conftest import SF_SMALL


def test_setops_single_pass_equals_native_operators(spark):
    fast = q_setops(spark, SF_SMALL).collect()[0]
    native = setops_via_native_operators(spark, SF_SMALL).collect()[0]
    assert fast.asDict() == native.asDict()


def test_q3_broadcasts_customer_dim(spark):
    plan = (
        q_tpch_q3(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan


def test_q5_star_join_is_broadcast_heavy(spark):
    plan = (
        q_tpch_q5(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    )
    # all four dims (customer, supplier, nation, region) broadcast: no
    # sort-merge join should appear in the star lookup side
    assert plan.count("BroadcastHashJoin") >= 3
