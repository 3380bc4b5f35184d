"""Behavioral pins for graph_pagerank (oracle parity runs in
test_extra_tier): centrality must actually separate hubs from leaves
and handle isolated docs per the documented contract."""

from __future__ import annotations

from impala_base_to_cdw_sizing_spark.operators.graph_rank import (
    _NANO,
    pagerank_ranks,
    q_graph_pagerank,
)
from tests.conftest import SF_SMALL


def test_pagerank_corpus_invariants(spark):
    rows = q_graph_pagerank(spark, SF_SMALL).collect()
    assert len(rows) == 500
    n = len(rows)
    base = (15 * _NANO) // (100 * n)
    isolated = [r for r in rows if r.outdeg == 0]
    connected = [r for r in rows if r.outdeg > 0]
    assert isolated and connected, "fixture needs both populations"
    # documented contract: isolated docs hold exactly the teleport base
    assert all(r.rank_nano == base for r in isolated)
    # every connected doc receives at least one contribution on top
    assert all(r.rank_nano > base for r in connected)
    # truncation only ever loses mass: total stays under the unit budget
    assert sum(r.rank_nano for r in rows) <= _NANO


def test_pagerank_degenerate_graphs(spark):
    empty_docs = spark.createDataFrame([], "doc_id long")
    empty_edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert pagerank_ranks(empty_edges, empty_docs).count() == 0
    one = spark.createDataFrame([(7,)], "doc_id long")
    rows = pagerank_ranks(empty_edges, one).collect()
    assert len(rows) == 1
    # single isolated doc: full teleport base at N=1
    assert rows[0].rank_nano == (15 * _NANO) // 100
    assert rows[0].outdeg == 0


def test_pagerank_hub_outranks_leaves_on_star(spark):
    """A 1-hub/12-leaf star: the hub aggregates every leaf's damped
    mass while each leaf gets only a 1/12 share back — rank must
    separate them decisively (near-dup-corpus near-cliques equalize
    ranks, so the hub property needs a shaped graph to pin)."""
    n_leaves = 12
    pairs = [(0, i) for i in range(1, n_leaves + 1)]
    edges = spark.createDataFrame(
        pairs + [(b, a) for a, b in pairs], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame(
        [(i,) for i in range(n_leaves + 1)], "doc_id long"
    )
    got = {r.doc_id: r for r in pagerank_ranks(edges, docs).collect()}
    hub, leaves = got[0], [got[i] for i in range(1, n_leaves + 1)]
    assert hub.outdeg == n_leaves
    assert all(hub.rank_nano > 2 * l.rank_nano for l in leaves)
    # leaves are symmetric: identical integer ranks, no float fuzz
    assert len({l.rank_nano for l in leaves}) == 1
