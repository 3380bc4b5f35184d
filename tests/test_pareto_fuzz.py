"""Hypothesis property: the segmented cumulative-revenue decomposition
(ordering-consistent buckets + within-bucket window + triangular carry)
must equal the sequential cumulative sum on ARBITRARY revenue
multisets — heavy ties, single customers, all-equal revenues, values
straddling bucket boundaries — not just the corpus distribution."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest
from impala_base_to_cdw_sizing_spark.operators.olap_extra import (
    _ABC_BUCKET_CENTS,
    pareto_classes,
)

_revs = st.lists(
    st.integers(min_value=1, max_value=3 * _ABC_BUCKET_CENTS),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_revs)
@pytest.mark.slow  # re-tiered r15: driver gate = fast tier; this test's coverage stays in the release gate (pytest -m "")
def test_segmented_cumshare_equals_sequential(spark, revs):
    rows = [(i, int(v)) for i, v in enumerate(revs)]
    df = spark.createDataFrame(rows, "o_custkey LONG, rev LONG")
    got = {
        r.o_custkey: (r.cum, r.total, r.abc_class)
        for r in pareto_classes(df).collect()
    }
    ordered = sorted(rows, key=lambda kv: (-kv[1], kv[0]))
    total = sum(v for _, v in ordered)
    cum = 0
    for ck, v in ordered:
        cum += v
        cls = (
            "A"
            if cum * 100 <= total * 80
            else ("B" if cum * 100 <= total * 95 else "C")
        )
        assert got[ck] == (cum, total, cls)
