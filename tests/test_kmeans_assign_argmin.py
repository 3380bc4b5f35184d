"""Pure-Python replication of the map-side k-means argmin (late r11).

``kmeans._assign`` was rewritten from a row_number-window argmin to a
``min(struct(dist2, cluster, ...))`` partial aggregation with the
centroid self-dot hoisted before the cross join. Both changes are
claimed value-preserving; this test replays the assignment bit-for-bit
in Python over adversarial vectors — including exact distance TIES,
where the (dist2 asc, cluster asc) lexicographic struct order must pick
the LOWEST cluster id, the same tie-break the oracle's
ROW_NUMBER ... ORDER BY dist2, cluster replays.
"""

from __future__ import annotations

import struct as _struct

from pyspark.sql import functions as F


def _py_dot(a, b):
    # the engines' left fold: acc starts at 0.0, adds in index order
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _py_assign(vectors, centroids):
    """vec_id -> (cluster, dist2) replaying _assign's double arithmetic:
    dist2 = v·v + cv·cv − 2·(v·cv), argmin by (dist2, cluster)."""
    out = {}
    for vid, v in vectors:
        norm2 = _py_dot(v, v)
        best = None
        for cid, cv in centroids:
            d2 = norm2 + _py_dot(cv, cv) - 2 * _py_dot(v, cv)
            key = (d2, cid)
            if best is None or key < best:
                best = key
        out[vid] = (best[1], best[0])
    return out


def _bits(x: float) -> int:
    return _struct.unpack("<q", _struct.pack("<d", x))[0]


def test_assign_matches_python_replay_including_ties(spark):
    from impala_base_to_cdw_sizing_spark.operators.kmeans import _assign

    dim = 4
    # centroids 0 and 1 are IDENTICAL -> every vector ties exactly on
    # dist2 between them; the tie-break must always pick cluster 0.
    centroids = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.25, -3.5]),
        (3, [0.1, 0.2, 0.3, 0.4]),
    ]
    # adversarial doubles: denormal-ish, negative zero, large magnitude
    vectors = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.25, -3.5]),
        (2, [-0.0, 1e-300, -1e16, 0.3333333333333333]),
        (3, [0.1, 0.2, 0.3, 0.4]),
        (4, [7.1, -2.9, 0.0001, 123456.789]),
        (5, [0.5, 0.5, 0.5, 0.5]),
    ]
    expected = _py_assign(vectors, centroids)

    emb = spark.createDataFrame(
        [(vid, v, _py_dot(v, v)) for vid, v in vectors],
        "vec_id: long, v: array<double>, norm2: double",
    ).withColumn("label", F.lit("x"))
    cents = spark.createDataFrame(
        [(cid, cv) for cid, cv in centroids],
        "cluster: long, cv: array<double>",
    )
    got = {r.vec_id: r.cluster for r in _assign(emb, cents).collect()}

    assert got == {vid: c for vid, (c, _) in expected.items()}
    # the tied vectors landed on the LOWER of the identical centroids
    assert got[0] == 0 and got[5] in (0, 2, 3)


def test_assign_dist2_doubles_are_bit_identical_to_python(spark):
    """Beyond the argmin: the dist2 double for the winning centroid must
    be the exact IEEE result of the replayed expression — the property
    every downstream oracle (inertia sums, IVF cells, SemDeDup cells)
    rests on."""
    from impala_base_to_cdw_sizing_spark.operators.kmeans import _emb_norm, _assign
    from impala_base_to_cdw_sizing_spark.operators.similarity import SPARK_DOT
    from tests.conftest import SF_SMALL

    emb = _emb_norm(spark, SF_SMALL).limit(50)
    cents = (
        emb.limit(5)
        .selectExpr("vec_id AS cluster", "v AS cv")
        .localCheckpoint(eager=True)
    )
    assigned = _assign(emb, cents)
    withd = assigned.join(F.broadcast(cents), "cluster").withColumn(
        "dist2",
        F.col("norm2")
        + F.expr(SPARK_DOT.format(a="cv", b="cv"))
        - 2 * F.expr(SPARK_DOT.format(a="v", b="cv")),
    )
    rows = withd.select("vec_id", "v", "cluster", "dist2").collect()
    cmap = {r.cluster: r.cv for r in cents.collect()}
    vecs = [(r.vec_id, r.v) for r in rows]
    expected = _py_assign(vecs, sorted(cmap.items()))
    for r in rows:
        exp_cluster, exp_d2 = expected[r.vec_id]
        assert r.cluster == exp_cluster, r.vec_id
        assert _bits(r.dist2) == _bits(exp_d2), (r.vec_id, r.dist2, exp_d2)
