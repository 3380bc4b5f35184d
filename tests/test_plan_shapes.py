"""Plan-shape pins for the two heaviest extension queries (VERDICT r3
item 5): the scale-critical properties — salted aggregation inside the
CC iteration, no broadcast hint on the CC label frame, the LSH bucket
cap applied before the band join — were docstring claims; these tests
assert them on the actual Catalyst plans, the same way
test_partition_pruning pins pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators.skew import salted_agg
from impala_base_to_cdw_sizing_spark.operators.similarity import (
    _BUCKET_CAP,
    _banded_spark,
    _capped_spark,
    q_lsh_ann,
)
from impala_base_to_cdw_sizing_spark.operators.text import q_dedup_components
from tests.conftest import SF_SMALL


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_dedup_components_never_hints_broadcast(spark):
    """The label frame can exceed broadcast limits on a real corpus, so
    the whole CC pipeline must contain NO broadcast hint anywhere —
    AQE may still choose a broadcast at runtime when the frame is
    actually small, which is exactly the intended division of labor."""
    df = q_dedup_components(spark, SF_SMALL)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed[:2000]
    assert "UnresolvedHint" not in analyzed


def test_cc_neighbor_min_is_salted_two_phase(spark):
    """The CC iteration's neighbor-min goes through salted_agg (hub
    guard). The per-iteration frames are localCheckpoint-ed (lineage
    deliberately truncated), so pin the plan of the salted aggregation
    itself: a partial aggregate keyed on (key, _salt) below a final
    aggregate keyed on the key alone."""
    contrib = spark.range(1000).selectExpr(
        "id % 7 AS doc_a", "id % 97 AS cluster"
    )
    nbr = salted_agg(
        contrib,
        "doc_a",
        aggs=lambda d: [F.min("cluster").alias("part_min")],
        combine=lambda d: [F.min("part_min").alias("nbr_min")],
        n_salts=16,
    )
    plan = _optimized(nbr)
    # two distinct grouping phases, the inner one salted
    aggs = [ln for ln in plan.splitlines() if "Aggregate" in ln]
    assert len(aggs) >= 2, plan
    assert any("_salt" in ln for ln in aggs), plan
    # the final (outermost) aggregate is keyed on doc_a WITHOUT the salt
    assert "_salt" not in aggs[0], aggs[0]
    # and the answer matches the unsalted aggregation
    want = {
        (r.doc_a, r.part_min)
        for r in contrib.groupBy("doc_a").agg(F.min("cluster").alias("part_min")).collect()
    }
    assert {(r.doc_a, r.nbr_min) for r in nbr.collect()} == want


def test_lsh_candidate_side_is_capped_before_join(spark):
    """sim_lsh_ann: the candidate frame must carry the per-bucket cap
    (row_number <= _BUCKET_CAP) and the full query plan must contain
    BOTH windows — the bucket cap and the final top-3 re-rank. Removing
    the cap-before-join (the hot-bucket guard) collapses the plan to a
    single window and this test fails."""
    emb = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS v")
    )
    capped = _capped_spark(_banded_spark(emb))
    cap_plan = _optimized(capped)
    assert "row_number" in cap_plan, cap_plan
    assert f"<= {_BUCKET_CAP}" in cap_plan.replace("rn#", "rn #"), cap_plan
    # bucket partitioning is the window key
    assert "band_id" in cap_plan and "band_key" in cap_plan

    full_plan = _optimized(q_lsh_ann(spark, SF_SMALL))
    assert full_plan.count("row_number") >= 2, full_plan
    assert f"<= {_BUCKET_CAP}" in full_plan
