"""Properties of the sampling / packing operators beyond the oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators.sampling import (
    q_pack_sequences,
    q_sample_stratified,
)
from tests.conftest import SF_SMALL

BUDGET = 2048


def test_stratified_sample_bounded_and_deterministic(spark):
    a = q_sample_stratified(spark, SF_SMALL).collect()
    per_lang = {}
    for r in a:
        per_lang[r.lang] = per_lang.get(r.lang, 0) + 1
    assert all(n <= 50 for n in per_lang.values())
    assert len(per_lang) > 1  # stratification actually sees classes
    b = q_sample_stratified(spark, SF_SMALL).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)


def test_packing_respects_greedy_budget_bound(spark):
    packs = (
        q_pack_sequences(spark, SF_SMALL)
        .groupBy("lang", "pack_id")
        .agg(
            F.sum("n_tokens").alias("pack_tokens"),
            F.max("n_tokens").alias("max_doc"),
        )
        .collect()
    )
    assert packs
    for r in packs:
        # greedy cumsum binning overflows a pack by at most one document
        assert r.pack_tokens <= BUDGET + r.max_doc, r
    # packs are dense: ids per lang are 0..max with no gaps
    by_lang: dict[str, set] = {}
    for r in packs:
        by_lang.setdefault(r.lang, set()).add(r.pack_id)
    for lang, ids in by_lang.items():
        assert ids == set(range(len(ids))), (lang, sorted(ids))
