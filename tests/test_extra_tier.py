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
    # promoted flagships actually landed in the declared tier; since r10
    # the declared tail ROTATES by round (r9 verdict #1), so the pinned
    # invariant is no longer "promoted inside the first 34" but the
    # rotation contract itself: the sizing rows always lead, and any two
    # CONSECUTIVE rounds' driver samples (first 50 rows) jointly cover
    # every declared name — promoted included.
    import __spark_entry__ as entry_mod
    from impala_base_to_cdw_sizing_spark.operators import queries_ext

    declared_order = list(ent.queries())
    for name in queries_ext.PROMOTED:
        assert name in declared_order

    sizing = list(entry_mod._SIZING_QUERIES)
    assert declared_order[: len(sizing)] == sizing
    rnd = entry_mod._round_number()
    window = entry_mod._DRIVER_SAMPLE_ROWS - len(sizing)

    # Reconstruct the canonical (unrotated) order from the REGISTRATION
    # source — head names first, then queries_ext registration order —
    # instead of un-rotating the already-rotated declared order, which
    # only re-canonicalizes head entries (r10 ADVICE).
    ext_reg = list(queries_ext.queries())
    head = [n for n in entry_mod._ROTATION_HEAD if n in ext_reg]
    canon = head + [n for n in ext_reg if n not in set(head)]
    assert sorted(canon) == sorted(
        n for n in declared_order if n not in entry_mod._SIZING_QUERIES
    )

    def sample_at(round_no: int) -> set[str]:
        shift = ((round_no - 10) * window) % len(canon)
        rotated = canon[shift:] + canon[:shift]
        return set(sizing) | set(rotated[:window])

    # the reconstruction must reproduce the ACTUAL driver sample (first
    # 50 rows of queries()) for the current round, exactly
    assert sample_at(rnd) == set(
        declared_order[: entry_mod._DRIVER_SAMPLE_ROWS]
    )
    # and two consecutive rounds' samples jointly cover every declared name
    assert sample_at(rnd) | sample_at(rnd + 1) == set(declared_order)

    # r11 verdict #6/#8 — the declared-tier FREEZE, pinned: rotation
    # capacity is exactly full (76 rotating names = 2 windows of 38,
    # zero slack), so consecutive samples must PARTITION the rotating
    # tier — any off-by-one in the shift arithmetic would silently
    # leave names uncovered. Growing the declared tier past 2*window
    # breaks this two-round coverage guarantee; the decision (recorded
    # in README's driver-contract section) is to keep the tier frozen
    # at 88 and leave the 137 extras pytest-oracle-checked every round.
    assert len(canon) == 2 * window, (
        f"declared rotating tier must stay exactly 2 windows "
        f"({2 * window}), got {len(canon)} — see README driver contract"
    )
    ext_this = sample_at(rnd) - set(sizing)
    ext_next = sample_at(rnd + 1) - set(sizing)
    assert not ext_this & ext_next, (
        "consecutive driver samples overlap on rotating names — "
        "zero-slack tiling broken"
    )
    assert ext_this | ext_next == set(canon)


@pytest.mark.parametrize("name,fn,sql", _cases(), ids=[c[0] for c in _cases()])
def test_extra_query_matches_oracle(spark, name, fn, sql):
    spark_pdf = fn(spark, SF_SMALL).toPandas()
    con = duck_connection(SF_SMALL)
    duck_pdf = con.execute(sql).fetch_df()
    issues = compare_frames(name, spark_pdf, duck_pdf)
    assert not issues, f"{name}: " + "; ".join(issues)


def test_canonical_query_order_covers_declared_tier():
    """bench.py iterates canonical_query_order(); it must stay a
    permutation of the declared queries() keys (rotation-independent
    order, same name set) with the sizing rows leading."""
    import __spark_entry__ as entry_mod

    order = entry_mod.canonical_query_order()
    assert len(order) == len(set(order))
    assert set(order) == set(ent.queries())
    sizing = list(entry_mod._SIZING_QUERIES)
    assert order[: len(sizing)] == sizing
