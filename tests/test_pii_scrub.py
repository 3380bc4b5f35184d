"""PII scrub rules exercised on synthesized PII (the documents corpus
contains no digits/emails, so the oracle check alone is pass-through)."""

from __future__ import annotations

import duckdb

from impala_base_to_cdw_sizing_spark.operators.text import _PII_RULES, scrub_pii

CASES = [
    # (input, expected scrub)
    (0, "contact john-doe@ex-ample.com now", "contact <EMAIL> now"),
    (1, "user+tag@gmail.com wrote", "<EMAIL> wrote"),
    (2, "ssn 123-45-6789 on file", "ssn <SSN> on file"),
    (3, "card 4111111111111111 and 12345678", "card <NUM> and <NUM>"),
    (4, "short 123456 stays", "short 123456 stays"),  # <7 digits untouched
    (5, "two a@b.co b@c.io hits", "two <EMAIL> <EMAIL> hits"),  # 'g' semantics
    (6, "clean text stays clean", "clean text stays clean"),
]


def test_scrub_rules_on_synthesized_pii(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in CASES], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in scrub_pii(df).collect()}
    for i, _, want in CASES:
        assert got[i].scrubbed == want, f"case {i}"
        assert got[i].was_redacted == (1 if want != CASES[i][1] else 0)


def test_langid_on_synthesized_language_text(spark):
    """The corpus's languages share one vocabulary, so langid accuracy is
    uncheckable there; synthesized marker-bearing text pins the heuristic."""
    from impala_base_to_cdw_sizing_spark.operators.text import q_text_langid

    rows = [
        (0, "the cat and the dog of a house in town", "en"),
        (1, "der hund und die katze ist das tier", "de"),
        (2, "le chat et la maison les arbres des champs", "fr"),
        (3, "el perro y los gatos en la casa de", "es"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    import tempfile

    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r.doc_id: r for r in q_text_langid(spark, d).collect()}
    assert got[0].predicted_lang == "en" and got[0].is_correct == 1
    assert got[1].predicted_lang == "de" and got[1].is_correct == 1
    assert got[2].predicted_lang == "fr" and got[2].is_correct == 1
    # 'es' markers overlap fr/en ('de','en','la'...); at minimum the
    # hit counters must see the es markers
    assert got[3].hits_es >= 3


def test_scrub_parity_spark_vs_duckdb_on_pii(spark):
    """The oracle's regexp chain must agree with Spark on text that
    actually fires every rule (incl. global-replace semantics)."""
    expr = "text"
    for pat, repl in _PII_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in CASES], "doc_id long, text string"
    )
    spark_out = {r.doc_id: r.scrubbed for r in scrub_pii(df).collect()}
    for i, t, _ in CASES:
        duck = con.execute(
            f"SELECT {expr} FROM (SELECT ? AS text)", [t]
        ).fetchone()[0]
        assert spark_out[i] == duck, f"case {i}: spark={spark_out[i]!r} duck={duck!r}"


def test_curate_corpus_single_shuffle_and_nonvacuous(spark):
    """The curation capstone must (a) keep a strict, nonempty subset —
    every stage fires on the real corpus — and (b) plan exactly ONE
    exchange: stats/langid/scrub fuse into one narrow projection and only
    the fingerprint-dedup window shuffles."""
    from impala_base_to_cdw_sizing_spark.operators.text import q_curate_corpus
    from tests.conftest import SF_SMALL

    df = q_curate_corpus(spark, SF_SMALL)
    total = spark.read.parquet(f"{SF_SMALL}/documents.parquet").count()
    kept = df.count()
    assert 0 < kept < total
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
