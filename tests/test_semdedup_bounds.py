"""SemDeDup scale bounds: the degenerate one-cluster corpus (every
embedding identical — the boilerplate-crawl pathology) must produce a
candidate-pair count bounded by CAP·n, not n²/2, while keeping the
documented keep-lowest-id semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from impala_base_to_cdw_sizing_spark.operators.curation import (
    _SEM_CELL_CAP,
    _sem_assigned,
    _sem_candidate_pairs,
    q_dedup_semantic,
)
from impala_base_to_cdw_sizing_spark.operators.similarity import DIM

N = 300  # > _SEM_CELL_CAP so the cap actually binds


@pytest.fixture()
def one_cluster_sf(spark, tmp_path):
    """N identical embeddings: every Lloyd centroid collapses to the same
    point, the lowest-id tie-break puts the whole corpus in cell 0."""
    rows = [(i, "en", [1.0] * DIM) for i in range(N)]
    df = spark.createDataFrame(
        rows, f"vec_id long, label string, embedding array<float>"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    return str(tmp_path)


def test_one_cluster_candidates_bounded(spark, one_cluster_sf):
    assigned = _sem_assigned(spark, one_cluster_sf)
    # the degenerate geometry really did collapse into one cell
    assert assigned.select("cluster").distinct().count() == 1
    n_pairs = _sem_candidate_pairs(assigned).count()
    # anchors are ids 0.._SEM_CELL_CAP-1; each pairs with every higher id:
    # sum_{a=0}^{CAP-1} (N-1-a) — linear in N, and far below N(N-1)/2
    expected = sum(N - 1 - a for a in range(_SEM_CELL_CAP))
    assert n_pairs == expected
    assert n_pairs <= _SEM_CELL_CAP * N
    assert n_pairs < N * (N - 1) // 2


def test_one_cluster_dedup_keeps_only_lowest_id(spark, one_cluster_sf):
    out = {r.vec_id: r.is_dup for r in q_dedup_semantic(spark, one_cluster_sf).collect()}
    assert len(out) == N
    # identical vectors: cosine 1 >= tau to anchor 0 — everything but the
    # lowest id is a duplicate, cap or no cap
    assert out[0] is False
    assert all(out[i] for i in range(1, N))


def test_quantizer_cell_count_scales_with_corpus(spark):
    """On the real fixture the trained quantizer uses ceil(sqrt(n)) init
    cells — the paper-regime scaling the r4 verdict asked for — so
    expected cell size is ~sqrt(n), not n/8."""
    assigned = _sem_assigned(spark, "/root/testdata/sf0.001")
    n = assigned.count()
    n_cells = assigned.select("cluster").distinct().count()
    k_init = int(n**0.5) + (n**0.5 % 1 > 0)
    # Lloyd can empty some cells but the surviving count must be in the
    # sqrt regime, far above the old constant 8
    assert n_cells > 8
    assert n_cells <= k_init
    # no cell holds more than a small multiple of sqrt(n) on benign data
    biggest = (
        assigned.groupBy("cluster").count().agg(F.max("count")).collect()[0][0]
    )
    assert biggest <= 6 * k_init


def test_capped_training_parity_when_caps_bind(spark, tmp_path):
    """r12 quantizer bounds: k = least(ceil(sqrt(n)), k_cap) and Lloyd
    training restricted to the vec_id < train_cap prefix sample are
    mirrored verbatim in the oracle CTE chain. The shipped caps
    (4096 / 65536) are inert at every test sf, so this test BINDS both
    with tiny values on a synthetic corpus and checks engine parity of
    the full train→assign chain under them."""
    import duckdb

    from impala_base_to_cdw_sizing_spark.operators.kmeans import (
        _assign,
        _cte_chain,
        _emb_norm,
        trained_centroids,
    )

    n, k_cap, train_cap = 240, 5, 100  # sqrt(240) ≈ 15.5 > 5: both bind
    rows = [
        (
            i,
            "en",
            [
                ((i * 7 + j * 13) % 29) / 29.0
                + (1.0 if j == i % DIM else 0.0)
                for j in range(DIM)
            ],
        )
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, label string, embedding array<float>"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )

    emb = _emb_norm(spark, str(tmp_path))
    k_frame = emb.agg(
        F.least(F.ceil(F.sqrt(F.count("*"))), F.lit(k_cap))
        .cast("long")
        .alias("k")
    )
    got = {
        r.vec_id: r.cluster
        for r in _assign(
            emb, trained_centroids(emb, k_frame=k_frame, train_cap=train_cap)
        )
        .select("vec_id", "cluster")
        .collect()
    }

    parts, _ = _cte_chain(dynamic_k=True, k_cap=k_cap, train_cap=train_cap)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet/*.parquet')"
    )
    want = {
        int(v): int(c)
        for v, c in con.execute(
            "WITH " + ",\n".join(parts) + " SELECT vec_id, cluster FROM final"
        ).fetchall()
    }
    assert got == want
    # the k cap really bound the cell count
    assert len(set(got.values())) <= k_cap
