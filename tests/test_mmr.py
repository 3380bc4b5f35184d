"""MMR re-rank: pure-Python replication of the greedy chain (exact
same IEEE arithmetic as the engines) plus the diversity claim —
re-ranked picks are measurably less redundant than the plain top-5."""

from __future__ import annotations

import math
from collections import defaultdict

from impala_base_to_cdw_sizing_spark.operators import mmr as M
from impala_base_to_cdw_sizing_spark.operators.similarity import N_QUERIES, _emb
from tests.conftest import SF_ORACLE, SF_SMALL


def _dot(a, b):
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _mmr_python(rows):
    vecs = {r.vec_id: [float(x) for x in r.v] for r in rows}
    norm2 = {i: _dot(v, v) for i, v in vecs.items()}
    out = {}
    for q in range(N_QUERIES):
        rels = {
            c: _dot(vecs[q], vecs[c]) / math.sqrt(norm2[q] * norm2[c])
            for c in vecs
            if c != q
        }
        short = sorted(rels, key=lambda c: (-rels[c], c))[: M._SHORTLIST]
        selected = []
        for k in range(1, M._MMR_K + 1):
            best = None
            for c in short:
                if c in (s for s, _ in selected):
                    continue
                red = (
                    max(
                        _dot(vecs[c], vecs[s])
                        / math.sqrt(norm2[c] * norm2[s])
                        for s, _ in selected
                    )
                    if selected
                    else 0.0
                )
                score = rels[c] - red
                if best is None or (-score, c) < (-best[2], best[0]):
                    best = (c, red, score)
            selected.append((best[0], best[1]))
            out[(q, k)] = (best[0], rels[best[0]], best[1])
    return out


def test_mmr_replicates_in_pure_python(spark):
    rows = _emb(spark, SF_SMALL).collect()
    expect = _mmr_python(rows)
    got = M.q_mmr_rerank(spark, SF_SMALL).collect()
    assert len(got) == N_QUERIES * M._MMR_K
    for r in got:
        nid, rel, red = expect[(r.q_id, r.mmr_rank)]
        assert r.neighbor_id == nid
        assert r.rel == rel and r.redundancy == red


def test_mmr_reduces_redundancy_vs_plain_topk(spark):
    """The operator's reason to exist: on the near-dup-bearing corpus,
    MMR's selected set must (a) differ from the plain top-5 for at
    least one query and (b) have lower max pairwise similarity inside
    the selected set."""
    rows = _emb(spark, SF_ORACLE).collect()
    vecs = {r.vec_id: [float(x) for x in r.v] for r in rows}
    norm2 = {i: _dot(v, v) for i, v in vecs.items()}

    def cos(a, b):
        return _dot(vecs[a], vecs[b]) / math.sqrt(norm2[a] * norm2[b])

    got = defaultdict(list)
    for r in M.q_mmr_rerank(spark, SF_ORACLE).collect():
        got[r.q_id].append(r.neighbor_id)
    differs = 0
    diversity_gain = 0.0
    for q in range(N_QUERIES):
        rels = sorted(
            (c for c in vecs if c != q), key=lambda c: (-cos(q, c), c)
        )
        plain = rels[: M._MMR_K]
        mmr_set = got[q]
        if set(plain) != set(mmr_set):
            differs += 1

        def max_pair(ids):
            return max(
                cos(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]
            )

        diversity_gain += max_pair(plain) - max_pair(mmr_set)
    assert differs > 0
    assert diversity_gain > 0
