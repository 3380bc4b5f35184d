"""Non-vacuity of the Gopher-style quality rules: the synthetic corpus is
clean (every real document passes), so each rule is exercised here on
synthesized degenerate documents — same pattern as the PII-scrub
non-vacuity test."""

from __future__ import annotations

from impala_base_to_cdw_sizing_spark.operators.text import gopher_signals

DOCS = [
    # (doc_id, text, expected_pass, failing_signal)
    (0, "a normal sentence with several distinct readable words here", True, None),
    (1, "tiny doc", False, "n_tokens"),  # under the minimum length
    (2, " ".join(["spam spam spam"] * 20), False, "dup_3gram_frac"),
    (3, " ".join(["buy now"] * 40), False, "top_2gram_frac"),
    (4, " ".join(["$$$", "###", "!!!", "%%%", "&&&", "@@@"] * 3), False, "symbol_ratio"),
    (5, " ".join(["a", "b", "c", "d", "e", "f", "g", "h"] * 2), False, "mean_word_len"),
    (6, " ".join(["pneumonoultramicroscopicsilicovolcanoconiosis"] * 9), False, "mean_word_len"),
]


def test_each_rule_fires_on_its_degenerate_doc(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in DOCS], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in gopher_signals(df).collect()}
    for doc_id, _, expected_pass, signal in DOCS:
        r = rows[doc_id]
        assert r.gopher_pass == expected_pass, (doc_id, signal, r)
    # the specific signal is the one out of band, not a different rule
    assert rows[2].dup_3gram_frac > 0.5
    assert rows[3].top_2gram_frac > 0.3
    assert rows[4].symbol_ratio > 0.3
    assert rows[5].mean_word_len < 2.0
    assert rows[6].mean_word_len > 12.0


def test_clean_doc_signals_are_sane(spark):
    df = spark.createDataFrame([DOCS[0][:2]], "doc_id long, text string")
    r = gopher_signals(df).collect()[0]
    assert 0.0 <= r.dup_3gram_frac < 0.1
    assert r.numeric_frac == 0.0
    assert 2.0 <= r.mean_word_len <= 12.0
