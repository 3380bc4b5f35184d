"""Positional inverted-index phrase search (late r8).

``text_phrase_search`` — the search-engine primitive the text tier
(BM25 ranking, TF-IDF terms, chunking) did not yet have: exact PHRASE
matching via a positional posting list. The corpus is exploded once
into ``(doc_id, term, pos)`` postings; a small phrase dimension
``(phrase_id, off, term)`` — one row per phrase token — broadcast-joins
against the postings on ``term``; aligning on ``start = pos − off`` and
counting matched offsets per ``(phrase_id, doc_id, start)`` yields a
full phrase occurrence exactly where the count equals the phrase
length. This is the standard conjunctive positional join every
inverted-index engine (Lucene's PhraseQuery) runs, expressed as two
shuffles: postings build (groupBy-free explode) and the
match aggregation.

The phrase set deliberately includes a repeated-term phrase
(``table table key``) — the case naive pairwise adjacency joins get
wrong if they dedup terms — and a high-frequency bigram
(``value table``) so hit counts are a real distribution, not 0/1.
Per (phrase, doc, start) each offset matches at most one posting row,
so ``COUNT(*) = plen`` is exactly "all positions present".

Scale shape: postings are corpus-token-sized, shuffled by term
(the inverted index build); the phrase dim is rows=Σ phrase tokens —
broadcast. No window at all; output is one row per (phrase, matching
doc). At 100 TB the postings frame is the stored index (write once,
scan per query batch), and the phrase dim swaps per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .queries_ext import register_extra
from .text import DUCK_TOKENS, SPARK_TOKENS, _docs

PHRASES = [(1, "value table"), (2, "table table key")]


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    postings = (
        _docs(spark, sf_dir)
        .withColumn("tokens", F.expr(SPARK_TOKENS))
        .selectExpr("doc_id", "posexplode(tokens) AS (pos0, term)")
        .selectExpr("doc_id", "term", "pos0 + 1 AS pos")
    )
    phr = (
        spark.createDataFrame(PHRASES, "phrase_id INT, phrase STRING")
        .selectExpr(
            "phrase_id",
            "phrase",
            "size(split(phrase, ' ')) AS plen",
            "posexplode(split(phrase, ' ')) AS (off, term)",
        )
        .select("phrase_id", "phrase", "plen", "off", "term")
    )
    aligned = (
        postings.join(F.broadcast(phr), "term")
        .selectExpr("phrase_id", "phrase", "plen", "doc_id", "pos - off AS start")
    )
    occurrences = (
        aligned.groupBy("phrase_id", "phrase", "plen", "doc_id", "start")
        .agg(F.count("*").alias("n_matched"))
        .filter(F.col("n_matched") == F.col("plen"))
    )
    return occurrences.groupBy("phrase_id", "phrase", "doc_id").agg(
        F.count("*").cast("long").alias("n_hits"),
        F.min("start").cast("long").alias("first_pos"),
    )


_DUCK_PHRASES = ", ".join(f"({i}, '{p}')" for i, p in PHRASES)

SQL_PHRASE_SEARCH = f"""
WITH postings AS (
  SELECT doc_id, unnest(toks) AS term,
    generate_subscripts(toks, 1) AS pos
  FROM (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents)
),
phrases(phrase_id, phrase) AS (VALUES {_DUCK_PHRASES}),
phr AS (
  SELECT phrase_id, phrase,
    len(string_split(phrase, ' ')) AS plen,
    unnest(string_split(phrase, ' ')) AS term,
    generate_subscripts(string_split(phrase, ' '), 1) - 1 AS off
  FROM phrases
),
aligned AS (
  SELECT p.phrase_id, p.phrase, p.plen, s.doc_id, s.pos - p.off AS start
  FROM postings s JOIN phr p USING (term)
),
occurrences AS (
  SELECT phrase_id, phrase, doc_id, start
  FROM aligned
  GROUP BY phrase_id, phrase, plen, doc_id, start
  HAVING COUNT(*) = plen
)
SELECT phrase_id, phrase, doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_hits,
  CAST(MIN(start) AS BIGINT) AS first_pos
FROM occurrences GROUP BY 1, 2, 3
"""


def register_all() -> None:
    register_extra("text_phrase_search", q_phrase_search, SQL_PHRASE_SEARCH)
