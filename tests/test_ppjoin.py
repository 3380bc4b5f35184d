"""Prefix-filter join: EXACTNESS is the operator's whole claim (unlike
MinHash/SimHash it may not miss a single pair above τ), so the result
set is checked pair-for-pair against a pure-Python brute force over all
doc pairs, and the pruning stats are sanity-bounded."""

from __future__ import annotations

from impala_base_to_cdw_sizing_spark.operators import ppjoin as P
from impala_base_to_cdw_sizing_spark.operators.text import _docs
from pyspark.sql import functions as F
from tests.conftest import SF_ORACLE, SF_SMALL


def _shingles(text: str) -> frozenset:
    toks = text.split(" ")
    if len(toks) < 3:
        return frozenset([" ".join(toks)])
    return frozenset(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )


def _brute_force(docs):
    sets = {r.doc_id: _shingles(r.text) for r in docs}
    ids = sorted(sets)
    out = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            common = len(sets[a] & sets[b])
            na, nb = len(sets[a]), len(sets[b])
            if 3 * common >= na + nb:  # J >= 1/2 in integers
                out[(a, b)] = (common, common / (na + nb - common))
    return out


def test_prefixfilter_is_exact_vs_brute_force(spark):
    docs = _docs(spark, SF_SMALL).collect()
    expect = _brute_force(docs)
    rows = P.q_prefixfilter(spark, SF_SMALL).collect()
    got = {(r.doc_a, r.doc_b): (r.n_common, r.jaccard) for r in rows}
    assert got == expect
    assert len(got) > 0  # the fixture has injected near-dups


def test_prefixfilter_stats_prune_and_recall(spark):
    r = P.q_prefixfilter_stats(spark, SF_ORACLE).collect()[0]
    # the prefix index must propose far fewer candidates than the
    # df<=50 inverted index on the same corpus (measured 772 vs 11533)
    assert r.n_prefix_candidates < r.n_baseline_candidates // 5
    assert 0.0 < r.candidate_ratio < 0.2
    # ...and still find every tau-pair the full verify finds
    n_true = P.q_prefixfilter(spark, SF_ORACLE).count()
    assert r.n_result_pairs == n_true > 0
    # candidates always cover results
    assert r.n_result_pairs <= r.n_prefix_candidates
