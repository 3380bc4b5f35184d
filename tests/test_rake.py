"""RAKE keyword extraction: full pure-Python replication (segmentation,
occurrence-weighted word stats, integer micro-scoring, top-20 cut) plus
structural sanity — phrases contain no stopwords and scores order the
output."""

from __future__ import annotations

from collections import Counter, defaultdict

from impala_base_to_cdw_sizing_spark.operators import rake as R
from impala_base_to_cdw_sizing_spark.operators.text import _docs
from tests.conftest import SF_SMALL


def _rake_python(docs):
    phrases = []  # every occurrence
    for d in docs:
        cur = []
        for tok in d.text.split(" "):
            if tok in R._STOP:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(tok)
        if cur:
            phrases.append(cur)
    phrases = [p for p in phrases if len(p) <= R._MAX_PHRASE]
    freq, deg = Counter(), Counter()
    for p in phrases:
        for w in p:
            freq[w] += 1
            deg[w] += len(p)
    w_micro = {w: (deg[w] * R._MICRO) // freq[w] for w in freq}
    occ = Counter(" ".join(p) for p in phrases)
    rows = []
    for phrase, n_occ in occ.items():
        words = phrase.split(" ")
        rows.append(
            (phrase, len(words), n_occ, sum(w_micro[w] for w in words))
        )
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[: R._TOP]


def test_rake_replicates_in_pure_python(spark):
    docs = _docs(spark, SF_SMALL).collect()
    expect = _rake_python(docs)
    got = [
        (r.phrase, r.n_words, r.n_occurrences, r.score_micro)
        for r in R.q_rake_keywords(spark, SF_SMALL).collect()
    ]
    assert got == expect
    # structural: no stopword inside any candidate, multi-word phrases
    # dominate the top (RAKE's whole point vs per-term scoring)
    for phrase, n_words, _, _ in got:
        assert not set(phrase.split(" ")) & set(R._STOP)
    assert sum(1 for _, n, _, _ in got if n > 1) > len(got) // 2
