"""IVF-PQ properties that the oracle parity run can't see: the index's
compression contract (codes in range, one row per vector), and the
measured claim that exact refinement dominates ADC-only ranking on both
test corpora (the reason sim_pq_refine is the production shape)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pytest
from tests.conftest import SF_ORACLE, SF_SMALL  # noqa: E402

from impala_base_to_cdw_sizing_spark.operators.pq import (  # noqa: E402
    _K,
    _M,
    _N_CELLS,
    _pq_index,
    q_pq_recall,
    q_pq_refine_recall,
    q_pq_trained,
)


def test_index_is_the_compressed_form(spark):
    idx = _pq_index(spark, SF_SMALL).toPandas()
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    # one row per vector; schema is exactly cell + M byte-range codes —
    # the 64-float row is NOT in the index (that's the 64x compression)
    assert len(idx) == emb.count()
    assert list(idx.columns) == ["vec_id", "cell_id"] + [f"c{m}" for m in range(_M)]
    for m in range(_M):
        assert idx[f"c{m}"].between(0, _K - 1).all()
    assert idx["cell_id"].between(0, _N_CELLS - 1).all()
    # seeds are their own nearest codeword in every subspace (d2 = 0)
    seeds = idx[idx.vec_id < _K]
    for m in range(_M):
        assert (seeds[f"c{m}"] == seeds.vec_id).all()


def test_refine_dominates_adc_only(spark):
    for sf in (SF_SMALL, SF_ORACLE):
        adc = q_pq_recall(spark, sf).collect()[0]
        ref = q_pq_refine_recall(spark, sf).collect()[0]
        assert ref.recall_at3 > adc.recall_at3, (sf, adc, ref)
        # the refined search is a real ANN, not a coin flip: at least
        # 2/3 of the exact top-3 set comes back on both corpora
        assert ref.recall_at3 >= 2 / 3, (sf, ref)


def test_training_strictly_reduces_distortion_everywhere(spark):
    # Lloyd from the seed init can never worsen it (monotone
    # convergence); on this corpus it strictly improves EVERY subspace
    # (measured ~25% at sf0.01) — equality would mean the training is
    # dead code
    rows = q_pq_trained(spark, SF_ORACLE).collect()
    assert len(rows) == _M
    for r in rows:
        assert r.improved
        assert r.d_trained_micro < r.d_seed_micro, r


@pytest.mark.slow  # re-tiered r15: driver gate = fast tier; this test's coverage stays in the release gate (pytest -m "")
def test_multiprobe_dominates_single_probe_within_budget(spark):
    """r5 verdict #4 done-bar: the multi-probe refined search must be
    at least as good as the single-probe refined search on BOTH fixture
    corpora (structural: per-cell shortlists make the multi-probe
    re-rank pool a superset of the single-probe pool), within an
    nprobe× candidate budget (structural: top-_REFINE_R per probed
    cell, nprobe cells)."""
    from pyspark.sql import functions as F

    from impala_base_to_cdw_sizing_spark.operators.pq import (
        _PQ_NPROBE,
        _REFINE_R,
        _adc_scored,
        q_pq_multiprobe_recall,
        q_pq_refine_recall,
    )

    for sf in (SF_SMALL, SF_ORACLE):
        single = q_pq_refine_recall(spark, sf).first()
        multi = q_pq_multiprobe_recall(spark, sf).first()
        assert multi["n_hits"] >= single["n_hits"], (sf, single, multi)
        assert multi["recall_at3"] >= single["recall_at3"]

    # candidate budget: per-query ADC pairs grow at most nprobe×, and
    # the shortlist is capped at _REFINE_R per probed cell
    n1 = _adc_scored(spark, SF_SMALL, nprobe=1).count()
    n4 = _adc_scored(spark, SF_SMALL, nprobe=_PQ_NPROBE).count()
    assert 0 < n1 <= n4 <= _PQ_NPROBE * n1

    # superset property of the probed cells: every single-probe
    # (q, candidate) pair is present in the multi-probe pair set
    p1 = {
        (r.q_id, r.c_id)
        for r in _adc_scored(spark, SF_SMALL, nprobe=1)
        .select("q_id", "c_id")
        .collect()
    }
    p4 = {
        (r.q_id, r.c_id)
        for r in _adc_scored(spark, SF_SMALL, nprobe=_PQ_NPROBE)
        .select("q_id", "c_id")
        .collect()
    }
    assert p1 <= p4
    assert _REFINE_R > 0
