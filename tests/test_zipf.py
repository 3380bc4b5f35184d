"""Zipf fit: full pure-Python replication — top-100 selection,
triangular ranks, the det-ln micro pipeline (16 machine sqrts + the
atanh series, bit-for-bit), exact OLS sums, and the final double
arithmetic — plus the structural claims (negative slope, meaningful
r², guard-compliant plan shape is covered by the registry-wide
window lint)."""

from __future__ import annotations

import math
from collections import Counter

from impala_base_to_cdw_sizing_spark.operators import zipf as Z
from impala_base_to_cdw_sizing_spark.operators.text import _docs
from tests.conftest import SF_SMALL


def _det_ln_micro(ratio: float) -> int:
    y = float(ratio)
    for _ in range(16):
        y = math.sqrt(y)
    z = (y - 1.0) / (y + 1.0)
    z2 = z * z
    series = 2.0 * z * (1.0 + z2 * (1.0 / 3.0 + z2 * (1.0 / 5.0 + z2 * (1.0 / 7.0))))
    return math.floor(65536.0 * series * 1000000.0 + 0.5)


def _shingles(text: str):
    toks = text.split(" ")
    if len(toks) < 3:
        return [" ".join(toks)]
    return [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]


def test_zipf_fit_replicates_in_pure_python(spark):
    docs = _docs(spark, SF_SMALL).collect()
    freqs = Counter(s for d in docs for s in _shingles(d.text))
    top = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[: Z._TOP]
    pts = []
    for i, (sh, f) in enumerate(top):
        rank = i + 1  # (-freq, shingle) order IS the better-than count
        pts.append((_det_ln_micro(rank), _det_ln_micro(f)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    intercept = (float(sy) - slope * float(sx)) / float(n) / 1000000.0
    r2 = (
        float(n * sxy - sx * sy)
        * float(n * sxy - sx * sy)
        / (float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    )
    row = Z.q_zipf_fit(spark, SF_SMALL).collect()[0]
    assert row.n == n
    assert row.slope == slope
    assert row.intercept_ln == intercept
    assert row.r2 == r2
    # a law is actually being fit: decay exists and explains most
    # variance in ln-ln space
    assert row.slope < 0
    assert 0.5 < row.r2 <= 1.0


def test_heaps_fit_replicates_and_shapes(spark):
    """Heaps'-law growth: replicate deciles, first-touch vocabulary
    counts, and the det-ln OLS; assert the law's shape — vocabulary
    monotone, final point = total distinct shingles, 0 < beta < 1
    (sub-linear growth), high r² in ln-ln space."""
    docs = sorted(_docs(spark, SF_SMALL).collect(), key=lambda d: d.doc_id)
    ids = [d.doc_id for d in docs]
    lo, hi = min(ids), max(ids)
    pts = []
    for d in range(1, Z._HEAPS_POINTS + 1):
        t = lo - 1 + ((hi - lo + 1) * d) // Z._HEAPS_POINTS
        seen = set()
        n_docs = 0
        for doc in docs:
            if doc.doc_id <= t:
                n_docs += 1
                seen.update(_shingles(doc.text))
        pts.append((d, n_docs, len(seen)))
    xy = [(_det_ln_micro(n), _det_ln_micro(v)) for _, n, v in pts]
    n = len(xy)
    sx = sum(x for x, _ in xy); sy = sum(y for _, y in xy)
    sxy = sum(x * y for x, y in xy)
    sxx = sum(x * x for x, _ in xy); syy = sum(y * y for _, y in xy)
    beta = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    r2 = (
        float(n * sxy - sx * sy) ** 2
        / (float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    )
    rows = sorted(Z.q_heaps_fit(spark, SF_SMALL).collect(), key=lambda r: r.decile)
    assert [(r.decile, r.n_docs, r.vocab) for r in rows] == pts
    for r in rows:
        assert r.beta == beta and r.r2 == r2
    vocabs = [r.vocab for r in rows]
    assert vocabs == sorted(vocabs)
    all_sh = set()
    for d in docs:
        all_sh.update(_shingles(d.text))
    assert vocabs[-1] == len(all_sh)
    assert 0.0 < rows[0].beta < 1.0
    assert rows[0].r2 > 0.9
