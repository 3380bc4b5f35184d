"""Relational-operator properties beyond the oracle gate."""

from __future__ import annotations

from impala_base_to_cdw_sizing_spark.operators.relational import (
    q_setops,
    q_tpch_q3,
    q_tpch_q4,
    q_tpch_q5,
    q_tpch_q6,
    q_tpch_q13,
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


def test_q6_filters_reach_the_scan(spark):
    """The plan-shape contract for q6: all conjuncts land in the parquet
    reader's PushedFilters and the scan reads only the 3 needed columns."""
    plan = (
        q_tpch_q6(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    )
    pushed = plan[plan.index("PushedFilters") :].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"
    read = plan[plan.index("ReadSchema") :].splitlines()[0]
    assert "l_extendedprice" in read
    assert "l_tax" not in read and "l_orderkey" not in read


def test_q4_is_semi_join(spark):
    plan = (
        q_tpch_q4(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan


def test_q13_keeps_zero_order_customers(spark):
    rows = {r.c_count: r.custdist for r in q_tpch_q13(spark, SF_SMALL).collect()}
    import duckdb

    n_zero = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF_SMALL}/customer.parquet' c "
        f"WHERE NOT EXISTS (SELECT 1 FROM '{SF_SMALL}/orders.parquet' "
        "WHERE o_custkey = c.c_custkey AND o_orderpriority <> '1-URGENT')"
    ).fetchone()[0]
    assert rows.get(0, 0) == n_zero
