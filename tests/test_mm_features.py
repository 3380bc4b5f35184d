"""Multimodal resize/feature-extract plumbing and the Pandas-UDF cosine
equivalence with the expression form."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_media,
    with_payload,
)
from impala_base_to_cdw_sizing_spark.operators.similarity import (
    SPARK_DOT,
    cosine_pandas_udf,
)

from tests.conftest import SF_SMALL


def test_resize_preserves_aspect_and_bounds(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(30)
    out = resize_media(with_payload(docs), max_dim=8).collect()
    assert len(out) == 30
    for r in out:
        assert 1 <= r.thumb_width <= 8 and 1 <= r.thumb_height <= 8
        assert max(r.thumb_width, r.thumb_height) == 8  # longest side hits max
        assert len(r.thumb_bytes) <= r.thumb_width * r.thumb_height


def test_feature_extraction_feeds_similarity_ops(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(50)
    feats = extract_features(with_payload(docs))
    row = feats.first()
    assert len(row.features) == FEATURE_DIM
    assert abs(sum(row.features) - 1.0) < 1e-5  # L1-normalized
    # the array<float> output plugs straight into the expression-level
    # vector math the ANN operators use
    normed = feats.selectExpr(
        "doc_id",
        "transform(features, x -> CAST(x AS DOUBLE)) AS v",
    ).selectExpr("doc_id", f"{SPARK_DOT.format(a='v', b='v')} AS norm2")
    assert normed.filter(F.col("norm2") > 0).count() == 50


def test_pandas_udf_cosine_matches_expression_form(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").limit(40)
    pairs = (
        emb.selectExpr(
            "vec_id AS a_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS va"
        )
        .crossJoin(
            emb.selectExpr(
                "vec_id AS b_id",
                "transform(embedding, x -> CAST(x AS DOUBLE)) AS vb",
            )
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .limit(200)
    )
    cos_udf = cosine_pandas_udf()
    both = pairs.select(
        "a_id", "b_id",
        (
            F.expr(SPARK_DOT.format(a="va", b="vb"))
            / F.sqrt(
                F.expr(SPARK_DOT.format(a="va", b="va"))
                * F.expr(SPARK_DOT.format(a="vb", b="vb"))
            )
        ).alias("expr_cos"),
        cos_udf("va", "vb").alias("udf_cos"),
    )
    for r in both.collect():
        assert abs(r.expr_cos - r.udf_cos) < 1e-12, (r.a_id, r.b_id)
