"""SimHash scale bounds (r5): the r4 byte-band form measured exactly
quadratic between sf1 and sf3 (alpha=2.00 — 16.9s -> 151.9s). Two causes,
both pinned here: (a) 256 values per band saturate once n >> 256, and
(b) the synthetic corpus is simhash-HOMOGENEOUS — its tiny shared
vocabulary makes most docs agree on most signature bits, so one
(band, value) bucket holds nearly the whole corpus at any band width.
The r5 form widens bands to 12 bits AND adds a hard per-bucket anchor
cap mirrored in the oracle: candidate work is <= CAP * n per band no
matter how pathological the bucket pileup gets."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators.text import (
    _SIM_BUCKET_CAP,
    _docs,
    q_dedup_simhash,
    simhash_bands,
)

N = 300  # > _SIM_BUCKET_CAP so the cap binds on the degenerate corpus


@pytest.fixture()
def identical_docs_sf(spark, tmp_path):
    """N byte-identical documents: one simhash value, every band bucket
    holds the whole corpus — the boilerplate-crawl pathology."""
    text = "spark line column order small sort value scan hash group"
    rows = [(i, text, "en", "web", len(text)) for i in range(N)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


@pytest.fixture()
def diverse_docs_sf(spark, tmp_path):
    """N docs over a large disjoint-ish vocabulary (deterministic, no
    RNG): token sets barely overlap, signature bits decorrelate, and
    band buckets stay far below the cap — the benign regime."""
    rows = []
    for i in range(N):
        words = " ".join(f"w{(i * 37 + k * 13) % 7919}x{k % 11}" for k in range(40))
        rows.append((i, words, "en", "web", len(words)))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_identical_corpus_pairs_linear_not_quadratic(spark, identical_docs_sf):
    out = q_dedup_simhash(spark, identical_docs_sf)
    n_pairs = out.count()
    # anchors are ids 0..CAP-1 in every band; after the DISTINCT the
    # pair set is exactly {(a, b): a < CAP, a < b < N} — linear in N
    expected = sum(N - 1 - a for a in range(_SIM_BUCKET_CAP))
    assert n_pairs == expected
    assert n_pairs <= _SIM_BUCKET_CAP * N
    assert n_pairs < N * (N - 1) // 2
    # identical docs: hamming is 0 on every emitted pair
    assert out.filter("hamming != 0").count() == 0


def test_cap_does_not_bind_on_diverse_corpus(spark, diverse_docs_sf):
    """With a real (diverse-vocabulary) corpus the busiest bucket sits
    far below the cap, so the capped rule IS the exact banded rule —
    recall loss only ever happens on pathological pileups."""
    bands = simhash_bands(_docs(spark, diverse_docs_sf))
    busiest = (
        bands.groupBy("band_id", "nibble").count().agg(F.max("count")).collect()[0][0]
    )
    assert busiest < _SIM_BUCKET_CAP
    # and the full query output on this corpus equals the uncapped rule:
    # every emitted pair's reverse-check — brute-force the band join
    a, b = bands.alias("a"), bands.alias("b")
    uncapped = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.nibble") == F.col("b.nibble"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS BIGINT)").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )
    got = {tuple(r) for r in q_dedup_simhash(spark, diverse_docs_sf).collect()}
    want = {tuple(r) for r in uncapped.collect()}
    assert got == want


def test_synthetic_corpus_is_the_pathological_regime(spark):
    """Documents.parquet's shared tiny vocabulary makes the corpus
    simhash-homogeneous — the busiest bucket IS ~the whole corpus. This
    pins the fixture property the quadratic blowup came from (and why
    the cap, not band width alone, is the scale fix)."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    n = docs.count()
    busiest = (
        simhash_bands(docs)
        .groupBy("band_id", "nibble")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert busiest > n // 2
