"""Round-2 additions: salted sequence packing, convergent connected
components, and the range-join classifier on the declared path."""

from __future__ import annotations

from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators.sampling import (
    q_pack_sequences,
    q_pack_sequences_plain,
)
from impala_base_to_cdw_sizing_spark.operators.text import (
    _CC_ITERS,
    cc_labels_converged,
)
from tests.conftest import SF_SMALL


def test_pack_salted_equals_plain(spark):
    """The salted/segmented packing (registered path) must be bit-equal
    to the single-window form for every row."""
    salted = {
        r.doc_id: (r.lang, r.n_tokens, r.cum_tokens, r.pack_id)
        for r in q_pack_sequences(spark, SF_SMALL).collect()
    }
    plain = {
        r.doc_id: (r.lang, r.n_tokens, r.cum_tokens, r.pack_id)
        for r in q_pack_sequences_plain(spark, SF_SMALL).collect()
    }
    assert salted == plain


def _chain_graph(spark, n: int):
    """Path graph 0-1-2-…-n (diameter n), symmetric edge list."""
    pairs = [(i, i + 1) for i in range(n)]
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    edges = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    nodes = spark.range(n + 1).withColumnRenamed("id", "doc_id")
    return edges, nodes


def _unrolled_labels(edges, nodes, iters: int):
    """The fixed-horizon propagation exactly as q_dedup_components unrolls
    it (kept for the oracle; splits chains longer than the horizon)."""
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster"))
    for _ in range(iters):
        nbr = (
            edges.join(labels, edges.doc_b == labels.doc_id)
            .groupBy("doc_a")
            .agg(F.min("cluster").alias("nbr_min"))
        )
        labels = labels.join(nbr, labels.doc_id == nbr.doc_a, "left").select(
            "doc_id",
            F.least(
                F.col("cluster"), F.coalesce("nbr_min", F.col("cluster"))
            ).alias("cluster"),
        )
    return labels


def test_cc_converged_clusters_chain_the_unrolled_form_splits(spark):
    """A 10-link chain has diameter 10 > _CC_ITERS=4: the unrolled oracle
    form reports split clusters, the convergent runtime variant must
    collapse it to ONE cluster."""
    edges, nodes = _chain_graph(spark, 10)
    unrolled = {
        r.doc_id: r.cluster
        for r in _unrolled_labels(edges, nodes, _CC_ITERS).collect()
    }
    assert len(set(unrolled.values())) > 1  # the horizon really splits it
    converged = {
        r.doc_id: r.cluster for r in cc_labels_converged(edges, nodes).collect()
    }
    assert set(converged.values()) == {0}


def test_cc_converged_equals_unrolled_within_horizon(spark):
    """On graphs with diameter ≤ _CC_ITERS the two forms agree — a star,
    two triangles, and singletons (diameter ≤ 2)."""
    pairs = [(0, 1), (0, 2), (0, 3), (10, 11), (11, 12), (10, 12), (20, 21)]
    edges = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    edges = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [0, 1, 2, 3, 10, 11, 12, 20, 21, 99]], "doc_id long"
    )
    unrolled = {
        r.doc_id: r.cluster
        for r in _unrolled_labels(edges, nodes, _CC_ITERS).collect()
    }
    converged = {
        r.doc_id: r.cluster for r in cc_labels_converged(edges, nodes).collect()
    }
    assert unrolled == converged
    assert converged[99] == 99  # singleton keeps its own label
