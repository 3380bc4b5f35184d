"""Large-star/small-star CC must compute the identical component-min
labels as convergent min-label propagation — on chains (worst case for
propagation), stars, cliques, and seeded random graphs — while using
O(log) rounds instead of diameter-bounded rounds."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators.text import (
    cc_labels_converged,
    cc_labels_star,
)


def _sym(spark, pairs, node_ids):
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    edges = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    nodes = spark.createDataFrame([(i,) for i in node_ids], "doc_id long")
    return edges, nodes


def _labels(df):
    return {r.doc_id: r.cluster for r in df.collect()}


def test_star_collapses_long_chain(spark):
    n = 24  # diameter 24: propagation needs 24 rounds, star needs ~log
    pairs = [(i, i + 1) for i in range(n)]
    edges, nodes = _sym(spark, pairs, range(n + 1))
    got = _labels(cc_labels_star(edges, nodes))
    assert set(got.values()) == {0}
    assert got == _labels(cc_labels_converged(edges, nodes))


def test_star_equals_converged_on_mixed_shapes(spark):
    # star, two triangles sharing a vertex, clique, singleton
    pairs = [
        (0, 1), (0, 2), (0, 3),
        (10, 11), (11, 12), (10, 12), (12, 13), (13, 14), (12, 14),
        (20, 21), (20, 22), (20, 23), (21, 22), (21, 23), (22, 23),
    ]
    ids = [0, 1, 2, 3, 10, 11, 12, 13, 14, 20, 21, 22, 23, 99]
    edges, nodes = _sym(spark, pairs, ids)
    star = _labels(cc_labels_star(edges, nodes))
    conv = _labels(cc_labels_converged(edges, nodes))
    assert star == conv
    assert star[99] == 99


def test_star_equals_converged_on_random_graphs(spark):
    rng = random.Random(42)
    for trial in range(3):
        n = 40
        pairs = list(
            {
                tuple(sorted(rng.sample(range(n), 2)))
                for _ in range(rng.randint(10, 60))
            }
        )
        edges, nodes = _sym(spark, pairs, range(n))
        assert _labels(cc_labels_star(edges, nodes)) == _labels(
            cc_labels_converged(edges, nodes)
        ), f"trial {trial} diverged"
