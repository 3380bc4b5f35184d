"""Invariants of the derived scaling dataset (tools/gen_sf1.py).

The sf1/sf3 scaling measurements in BASELINE.md are only meaningful if
the derived data actually preserves the sf0.1 workload shape: same
per-key fan-out, same duplicate RATE (not 10x dup groups of 10x size),
and no accidental cross-copy near-duplicate links that would make the
candidate graphs quadratic in the copy count. Pinned here on a tiny
3-copy derivation of sf0.001 — pandas only, no Spark session needed.
"""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMALL
from tools.gen_sf1 import generate

COPIES = 3


@pytest.fixture(scope="module")
def derived(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("derived_sf"))
    generate(SF_SMALL, out, COPIES)
    return out


def _read(d, t, cols=None):
    return pq.read_table(f"{d}/{t}.parquet", columns=cols).to_pandas()


def test_row_counts_and_fixed_dims(derived):
    for t in ["customer", "orders", "lineitem", "events", "documents", "embeddings"]:
        assert len(_read(derived, t)) == COPIES * len(_read(SF_SMALL, t))
    for t in ["region", "nation"]:
        pd.testing.assert_frame_equal(_read(derived, t), _read(SF_SMALL, t))


def test_fk_integrity_and_fanout(derived):
    li = _read(derived, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey"])
    o = _read(derived, "orders", ["o_orderkey", "o_custkey"])
    assert li.l_orderkey.isin(set(o.o_orderkey)).all()
    assert li.l_partkey.isin(set(_read(derived, "part", ["p_partkey"]).p_partkey)).all()
    assert o.o_custkey.isin(set(_read(derived, "customer", ["c_custkey"]).c_custkey)).all()
    # per-key fan-out identical to the base: more keys, same group sizes
    base_li = _read(SF_SMALL, "lineitem", ["l_orderkey"])
    assert (
        li.groupby("l_orderkey").size().value_counts().sort_index() // COPIES
    ).equals(base_li.groupby("l_orderkey").size().value_counts().sort_index())


def test_duplicate_rate_preserved_exactly(derived):
    base = _read(SF_SMALL, "documents", ["text"])
    der = _read(derived, "documents", ["text"])
    base_groups = base.text.value_counts()
    der_groups = der.text.value_counts()
    # same exact-dup group-size histogram, scaled by COPIES — no group
    # merging across copies, no group splitting within one
    assert (
        der_groups.value_counts().sort_index()
        // COPIES
    ).equals(base_groups.value_counts().sort_index())


def test_no_cross_copy_shingles(derived):
    docs = _read(derived, "documents", ["doc_id", "text"]).set_index("doc_id")
    stride = len(_read(SF_SMALL, "documents"))

    def shingles(s):
        w = s.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    for base_id in range(0, 40):
        sets = [shingles(docs.loc[base_id + c * stride, "text"]) for c in range(COPIES)]
        for a in range(COPIES):
            for b in range(a + 1, COPIES):
                assert not (sets[a] & sets[b])
    # n_chars stays consistent with the perturbed text
    full = _read(derived, "documents", ["text", "n_chars"])
    assert (full.n_chars == full.text.str.len()).all()


def test_embedding_rotation_preserves_within_copy_geometry(derived):
    import numpy as np

    emb = _read(derived, "embeddings", ["vec_id", "embedding"]).set_index("vec_id")
    stride = len(_read(SF_SMALL, "embeddings"))
    m0 = np.stack(emb.loc[0 : stride - 1, "embedding"].to_numpy())
    m1 = np.stack(emb.loc[stride : 2 * stride - 1, "embedding"].to_numpy())
    # each vector keeps the exact multiset of components (rotation only),
    # so norms/cosines match mathematically; float sums reorder, so the
    # numeric check is allclose, not bit-equality
    assert (np.sort(m0, axis=1) == np.sort(m1, axis=1)).all()
    # dots concentrate near 0 for random embeddings -> absolute tolerance
    assert np.allclose(m0[:50] @ m0[:50].T, m1[:50] @ m1[:50].T, atol=1e-5)
    # but copies are NOT clones of each other
    assert not (m0 == m1).all()


def test_skew_hot_vectors_distinct_and_near_dup(tmp_path_factory):
    """r9 ADVICE: the skew-mode hot-cluster offset must be injective per
    id — the old (id*13)%dim index + id%7 magnitude produced bit-equal
    vectors for ids congruent mod 7*dim (0 and 448 collide inside even a
    3-copy sf0.001 derivation), silently collapsing exact dedup."""
    import numpy as np

    out = str(tmp_path_factory.mktemp("derived_skew"))
    generate(SF_SMALL, out, COPIES, skew=True)
    emb = _read(out, "embeddings", ["vec_id", "embedding"])
    hot = emb[emb["vec_id"] % 4 == 0]
    assert len(hot) > 300  # the collision range is exercised
    sigs = {tuple(v) for v in hot["embedding"]}
    assert len(sigs) == len(hot)  # no two hot vectors bit-equal
    # near-dup semantics preserved: every hot vector stays ~parallel to
    # the cluster axis (offsets are <= 0.022 on a unit base component)
    m = np.stack(hot["embedding"].to_numpy())
    cos = m[:, 0] / np.linalg.norm(m, axis=1)
    assert (cos > 0.999).all()
