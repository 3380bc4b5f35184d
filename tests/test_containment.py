"""Containment semantics: the asymmetric score must catch a snippet
pasted inside a much larger page — the case symmetric Jaccard is blind
to at any sane threshold."""

from __future__ import annotations

from impala_base_to_cdw_sizing_spark.operators.text import (
    _CONTAIN_ANCHOR_CAP,
    _CONTAIN_DF_CUT,
    _CONTAIN_TAU,
    q_ngram_containment,
)
from tests.conftest import SF_ORACLE


def _run(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return q_ngram_containment(spark, str(tmp_path)).toPandas()


def test_snippet_inside_page_found_jaccard_blind(spark, tmp_path):
    snippet_words = [f"s{i}" for i in range(12)]
    page_words = [f"p{i}" for i in range(300)] + snippet_words
    rows = [
        (1, " ".join(snippet_words), "en", "a", 1),
        (2, " ".join(page_words), "en", "a", 1),
        (3, " ".join(f"z{i}" for i in range(40)), "en", "a", 1),
    ]
    out = _run(spark, tmp_path, rows)
    assert len(out) == 1
    r = out.iloc[0]
    # the snippet (all 10 of its 3-gram shingles inside the page) is
    # fully contained; the symmetric score is tiny
    assert (r.doc_small, r.doc_big) == (1, 2)
    assert r.containment == 1.0
    assert r.jaccard < 0.05
    assert r.jaccard < _CONTAIN_TAU  # jaccard-threshold dedup misses it


def test_hot_snippet_sixty_copies_detected(spark, tmp_path):
    """The r5 ceiling: a snippet pasted into 60 docs puts every snippet
    shingle at df=60 > _CONTAIN_DF_CUT, so the rare-pair path alone
    returns ZERO rows — the hot-shingle anchor path must catch it.
    60 <= _CONTAIN_ANCHOR_CAP, so detection here is exact: every doc
    pair among the 60 shares all snippet shingles via the anchor join."""
    n_copies = 60
    assert _CONTAIN_DF_CUT < n_copies <= _CONTAIN_ANCHOR_CAP
    snippet = " ".join(f"s{i}" for i in range(12))  # 10 interior shingles
    rows = [
        # each copy embeds the snippet in ONE unique filler token per
        # side: 14 tokens -> 12 shingles, of which the 10 fully inside
        # the snippet are shared by every pair (the 2 boundary shingles
        # carry the per-doc filler token) -> containment 10/12 ~ 0.83
        (d, f"u{d}a {snippet} u{d}b", "en", "a", 1)
        for d in range(1, n_copies + 1)
    ] + [(1000, " ".join(f"z{i}" for i in range(40)), "en", "a", 1)]
    out = _run(spark, tmp_path, rows)
    assert len(out) == n_copies * (n_copies - 1) // 2
    assert (out.n_common == 10).all()
    assert (abs(out.containment - 10 / 12) < 1e-12).all()
    assert (out.containment >= _CONTAIN_TAU).all()
    assert set(out.doc_small) <= set(range(1, n_copies + 1))
    assert 1000 not in set(out.doc_big)


def test_corpus_pairs_dominate_their_jaccard(spark):
    out = q_ngram_containment(spark, SF_ORACLE).toPandas()
    assert len(out) > 0  # non-vacuous on the planted near-dups
    assert (out.containment >= _CONTAIN_TAU).all()
    # containment >= jaccard always (|A∩B|/min >= |A∩B|/|A∪B|)
    assert (out.containment >= out.jaccard - 1e-12).all()
