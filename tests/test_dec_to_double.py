"""The decimal→double conversion hazard, pinned at the unit level.

Found by the r4 full-registry sweep at sf0.1: DuckDB's direct
``CAST(decimal AS DOUBLE)`` converts the scaled integer to double and
divides by 10^scale — two roundings — which differs from the correctly
rounded value by 1 ulp once the scaled integer exceeds 2^53 (the
measured case: sizing_summary_pool's util_mem). Spark's BigDecimal
path is correctly rounded, so every oracle decimal→double must route
through the exact VARCHAR form (``dec_to_double_sql``)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from impala_base_to_cdw_sizing_spark.operators.aggregates import (  # noqa: E402
    dec_to_double_sql,
    dsum_sql,
)

# the sf0.1 value that exposed the bug: 86047380724.118065 * 10^6 ≈
# 8.6e16 > 2^53, so DuckDB's two-step cast lands 1 ulp low
_CASE = "86047380724.118065"


def test_direct_cast_double_rounds_and_varchar_route_does_not():
    con = duckdb.connect()
    direct, routed = con.execute(
        f"SELECT CAST(d AS DOUBLE), {dec_to_double_sql('d')} "
        f"FROM (SELECT CAST('{_CASE}' AS DECIMAL(38,6)) AS d)"
    ).fetchone()
    correct = float(_CASE)  # Python strtod: correctly rounded
    assert routed == correct
    # document WHY the helper exists: the direct cast really is wrong
    # here (if DuckDB ever fixes it, this flags the helper as removable)
    assert direct != correct


def test_dsum_sql_uses_the_routed_conversion():
    sql = dsum_sql("x")
    assert "AS STRING" in sql
    con = duckdb.connect()
    # an order-independence + correctness smoke over a sum big enough
    # to cross 2^53 micro-units
    (got,) = con.execute(
        f"SELECT {dsum_sql('x')} FROM (SELECT unnest(["
        + ", ".join(f"{_CASE}" for _ in range(4))
        + "]) AS x)"
    ).fetchone()
    from decimal import Decimal

    # correctly-rounded expectation: float() of the EXACT decimal sum
    # (dividing a float by 1e6 would double-round just like the bug)
    assert got == float(Decimal(_CASE) * 4)
