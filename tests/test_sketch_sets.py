"""Adversarial checks for the r8 set sketches — parity alone would
accept a witness column that is identically FALSE in both engines, so
the witnesses' truth is asserted here, plus a pure-Python replication
of the KMV estimate (the det-ln-composition defense, applied to the
estimator arithmetic)."""

from __future__ import annotations

from collections import defaultdict

from impala_base_to_cdw_sizing_spark.operators import sketch_sets as SS
from impala_base_to_cdw_sizing_spark.sources.files import load_events
from tests.conftest import SF_SMALL


def test_bitmap_rollup_witness_holds_and_bounds(spark):
    rows = SS.q_bitmap_rollup(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert r.merge_equals_recompute is True
        assert 1 <= r.occupied_slots <= SS._BITS
    # occupancy is a real signal, not a constant artifact
    assert max(r.occupied_slots for r in rows) > min(
        r.occupied_slots for r in rows
    )
    # at sf0.01 the busy days genuinely fill the slot space
    from tests.conftest import SF_ORACLE

    rows01 = SS.q_bitmap_rollup(spark, SF_ORACLE).collect()
    assert all(r.merge_equals_recompute is True for r in rows01)
    assert max(r.occupied_slots for r in rows01) > SS._BITS // 2


def test_kmv_replicates_in_pure_python_and_witness_holds(spark):
    ev = (
        load_events(spark, SF_SMALL)
        .select("event_type", "user_id")
        .collect()
    )
    users = defaultdict(set)
    for r in ev:
        users[r.event_type].add(r.user_id)
    got = {r.event_type: r for r in SS.q_kmv_distinct(spark, SF_SMALL).collect()}
    assert set(got) == set(users)
    for et, uids in users.items():
        hashes = sorted({(u * SS._KNUTH) % SS._KMV_M for u in uids})
        sketch = hashes[: SS._KMV_K]
        r = got[et]
        assert r.merge_equals_recompute is True
        assert r.n_exact == len(uids)
        assert r.sketch_n == len(sketch)
        assert r.kth_hash == sketch[-1]
        if len(sketch) < SS._KMV_K:
            expected = float(len(sketch))
        else:
            expected = float((SS._KMV_K - 1) * SS._KMV_M) / float(sketch[-1])
        assert r.est_distinct == expected
        # the estimator itself carries signal on a full sketch
        if r.sketch_n == SS._KMV_K:
            assert abs(r.est_distinct - r.n_exact) / r.n_exact <= 0.25
