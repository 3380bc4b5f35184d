"""Extra-tier parity: near-duplicate formulations (second dialects of an
already-checked oracle, metric companions, the per-op views of
text_profile) are registered via ``register_extra`` and oracle-verified
HERE with the exact comparator the declared tier uses
(tools/compare_oracle.compare_frames). The strongest flagships are hoisted
into the declared tier via ``queries_ext.PROMOTED`` (r8 verdict task 1)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow  # release-gate tier (r8 verdict #8)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_SMALL  # noqa: E402
from tools.compare_oracle import compare_frames, duck_connection  # noqa: E402

import __spark_entry__ as ent  # noqa: E402


def _cases():
    qs, oracles = ent.extra_queries(), ent.extra_oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


def test_extra_tier_is_nonempty_and_fully_oracled():
    qs, oracles = ent.extra_queries(), ent.extra_oracle_sql()
    assert set(qs) == set(oracles)  # nothing hides in the extra tier
    # every declared query has an oracle and the tiers are disjoint
    assert set(ent.queries()) == set(ent.oracle_sql())
    assert not set(qs) & set(ent.queries())
    # promoted flagships actually landed in the declared tier, early
    # enough to survive a truncated report (after the 11 sizing rows)
    from impala_base_to_cdw_sizing_spark.operators import queries_ext

    declared_order = list(ent.queries())
    for name in queries_ext.PROMOTED:
        assert name in declared_order
        assert declared_order.index(name) < 50 - len(queries_ext.PROMOTED)


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_extra_query_matches_oracle(spark, name, fn, sql):
    spark_pdf = fn(spark, SF_SMALL).toPandas()
    con = duck_connection(SF_SMALL)
    duck_pdf = con.execute(sql).fetch_df()
    issues = compare_frames(name, spark_pdf, duck_pdf)
    assert not issues, f"{name}: " + "; ".join(issues)
