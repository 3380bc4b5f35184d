"""Structural pair-growth bounds for the two Θ(n)-output candidate
generators the r8 sf3→sf10 probe flagged (α ≈ 1.0 — their floor, since
both emit per-anchor results):

- ``emb_hard_negatives``: scored candidate pairs ≤ n·bands·cap — the
  linearity bound the ceiling-saturation measurement (pairs/anchor
  234.5 at BOTH sf3 and sf10) rests on.
- ``mm_phash_neardup``: the r8-added ``_PH_BUCKET_CAP`` makes each
  (band, value) bucket contribute ≤ min(cap, B)·B candidate pairs
  instead of B² — before the cap the 16-bit key population grows
  ~n/65536 per band and the join was quadratic (the dedup_simhash r5
  defect, one modality over). Verified by computing the bucket
  histogram and the actual capped-join size on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE, SF_SMALL


def test_hard_negative_pairs_within_linear_bound(spark):
    from impala_base_to_cdw_sizing_spark.operators import similarity as S

    for sf in (SF_SMALL, SF_ORACLE):
        emb = S._emb(spark, sf)
        banded = S._banded_spark(emb)
        anchors = banded.selectExpr("vec_id AS a_id", "band_id", "band_key")
        cand = S._capped_spark(banded).selectExpr(
            "vec_id AS c_id", "band_id", "band_key"
        )
        pairs = (
            anchors.join(cand, ["band_id", "band_key"])
            .filter(F.col("a_id") != F.col("c_id"))
            .select("a_id", "c_id")
            .distinct()
        )
        n = emb.count()
        assert pairs.count() <= n * S._N_BANDS_EMB * S._BUCKET_CAP
        # and per anchor: nobody exceeds the bands*cap candidate budget
        worst = (
            pairs.groupBy("a_id").count().agg(F.max("count")).first()[0]
        )
        assert worst <= S._N_BANDS_EMB * S._BUCKET_CAP


def test_phash_neardup_candidates_obey_bucket_cap(spark):
    from impala_base_to_cdw_sizing_spark.operators import multimodal as M

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")

    import pandas as pd

    def _batches(it):
        for pdf in it:
            full = [int(M._dhash_bmp(p), 16) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "hi": [h >> 32 for h in full],
                    "lo": [h & 0xFFFFFFFF for h in full],
                }
            )

    hashed = M.with_bmp_payload(docs).mapInPandas(
        _batches, "doc_id long, hi long, lo long"
    )
    banded = hashed.selectExpr(
        "doc_id",
        "explode(array("
        " struct(0 AS band_id, hi div 65536 AS band_val),"
        " struct(1 AS band_id, hi % 65536 AS band_val),"
        " struct(2 AS band_id, lo div 65536 AS band_val),"
        " struct(3 AS band_id, lo % 65536 AS band_val))) AS band",
    ).select("doc_id", "band.band_id", "band.band_val")
    hist = banded.groupBy("band_id", "band_val").count().collect()
    cap = M._PH_BUCKET_CAP
    capped_bound = sum(min(r["count"], cap) * r["count"] for r in hist)
    uncapped = sum(r["count"] * r["count"] for r in hist)

    # the capped a-side join size can never exceed Σ min(cap,B)·B ...
    from pyspark.sql import Window

    w = Window.partitionBy("band_id", "band_val").orderBy("doc_id")
    anchors = (
        banded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .drop("rn")
    )
    joined = anchors.selectExpr(
        "doc_id AS doc_a", "band_id", "band_val"
    ).join(
        banded.selectExpr("doc_id AS doc_b", "band_id", "band_val"),
        ["band_id", "band_val"],
    )
    got = joined.count()
    assert got == capped_bound
    # ... and the quadratic form is what the cap protects against once
    # any bucket exceeds it (cap binds ⇔ the two sums diverge)
    assert capped_bound <= uncapped
    if any(r["count"] > cap for r in hist):
        assert capped_bound < uncapped
