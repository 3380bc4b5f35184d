"""Behavioral pins for mixture.py (oracle parity runs in test_extra_tier).

Parity alone can't catch a vacuous query — both engines happily agree on
all-false output. These tests pin the semantics: the Bloom filter's
no-false-negative guarantee with nonzero measured false positives, and
the mixture sampler actually downsampling over-share sources.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_SMALL  # noqa: E402

from impala_base_to_cdw_sizing_spark.operators.mixture import (  # noqa: E402
    q_dedup_bloom,
    q_mix_sources,
)


def test_bloom_no_false_negatives_and_some_false_positives(spark):
    rows = q_dedup_bloom(spark, SF_SMALL).collect()
    members = [r for r in rows if r["exact_dup"]]
    assert members, "corpus-member probes must exist"
    # Bloom guarantee: a present digest can NEVER miss
    assert all(r["bloom_hit"] for r in members)
    # fixture is sized so the false-positive branch is exercised
    assert any(r["false_positive"] for r in rows)
    # and a false positive is never an exact dup, by definition
    assert all(not r["exact_dup"] for r in rows if r["false_positive"])


def test_mix_sources_downsamples_toward_equal_share(spark):
    rows = q_mix_sources(spark, SF_SMALL).collect()
    assert len(rows) == 20  # one row per source
    downsampled = [r for r in rows if r["keep_rate"] < 1.0]
    assert downsampled, "over-share sources must be downsampled"
    for r in rows:
        assert 0.0 < r["keep_rate"] <= 1.0
        assert r["n_kept"] <= r["n_docs"]
        assert r["tokens_kept"] <= r["avail_tokens"]
        if r["keep_rate"] < 1.0:
            # the realized sample can't exceed availability, and a
            # strictly-downsampled source must drop something at the
            # fixture's doc counts (25 docs/source, rate ~0.5)
            assert r["n_kept"] < r["n_docs"]
