"""Every declared query must exactly match its DuckDB oracle at sf0.001
(the driver runs the same comparison at sf0.01 — tools/compare_oracle.py
mirrors it and is run at sf0.01 in CI-equivalent manual runs)."""

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
    qs, oracles = ent.queries(), ent.oracle_sql()
    return [(name, fn, oracles.get(name)) for name, fn in qs.items()]


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_query_matches_oracle(spark, name, fn, sql):
    spark_pdf = fn(spark, SF_SMALL).toPandas()
    if sql is None:
        pytest.skip(f"{name}: rows-only check (no oracle)")
    con = duck_connection(SF_SMALL)
    duck_pdf = con.execute(sql).fetch_df()
    issues = compare_frames(name, spark_pdf, duck_pdf)
    assert not issues, f"{name}: " + "; ".join(issues)
