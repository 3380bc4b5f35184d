"""Binary (1-bit) sign quantization ANN — the fourth, most extreme
compression point on the similarity family's curve.

The family so far: exact cosine (64 doubles/vec), IVF (cell-routed),
PQ (8 bytes/vec, trained codebooks), SQ8 (64 bytes/vec, no training).
Binary quantization is the Faiss ``BinaryFlat`` / Weaviate BQ point:
ONE bit per dimension — 8 bytes/vec at DIM=64, 64x compression with no
training pass — and distance becomes Hamming over machine words
(XOR + POPCOUNT), the cheapest similarity kernel that exists: two
BIGINT xors and two bit_counts per candidate, no floats at all in the
scan. The standard production shape is binary scan → exact re-rank;
the recall twin here measures exactly what that first stage gives up.

Determinism contract:
- thresholds are per-dim MIDRANGE ((min+max)/2) — min/max are exact
  order-independent doubles, unlike a mean, which would drag an
  order-dependent float sum across engines;
- each vector packs ``v[i] > mid[i]`` into two 32-bit words (dims
  0-31 → word lo, 32-63 → word hi) via an integer fold — two BIGINTs
  per vector, never touching the sign bit, so no overflow semantics
  to reconcile;
- Hamming = bit_count(lo_a XOR lo_b) + bit_count(hi_a XOR hi_b) —
  pure integer ops, bit-equal cross-engine by construction (the XOR
  spelling differs per dialect: Spark ``^`` vs DuckDB ``xor()`` —
  DuckDB's ``^`` is POWER).

Scale: the stats frame is DIM rows (broadcast); the packed index is
16 bytes/vec — at 100 TB of raw vectors the binary index is ~1.6 TB,
scanned with two xors/popcounts per row and finished by a per-query
top-k window (TakeOrderedAndProject shape). The 5-query broadcast
crossJoin is the documented exact-kernel fixture, same as
``sim_cosine_topk`` / ``sim_sq8_ann``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries_ext import register_extra
from .similarity import (
    DIM,
    DUCK_DOT,
    DUCK_EMB,
    N_QUERIES,
    SQL_COSINE_TOPK,
    TOP_K,
    _emb,
    _recall_vs_exact,
    q_cosine_topk,
)

_HALF = DIM // 2  # 32 dims per packed word

_SPARK_PACK = (
    "aggregate(sequence(0, {n} - 1), CAST(0 AS BIGINT), (acc, i) ->"
    " acc + CASE WHEN element_at(v, i + {off} + 1)"
    " > element_at(mids, i + {off} + 1)"
    " THEN shiftleft(CAST(1 AS BIGINT), i) ELSE CAST(0 AS BIGINT) END)"
)
_DUCK_PACK = (
    "CAST(list_sum(list_transform(range(0, {n}), i ->"
    " CASE WHEN v[i + {off} + 1] > mids[i + {off} + 1]"
    " THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END))"
    " AS BIGINT)"
)


def _packed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, w_lo, w_hi): the stored binary index — two BIGINTs per
    vector, thresholds broadcast from a DIM-row stats frame."""
    emb = _emb(spark, sf_dir)
    stats = (
        emb.selectExpr("posexplode(v) AS (pos, x)")
        .groupBy("pos")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(pos, lo, hi))),"
                " s -> (s.lo + s.hi) / 2.0) AS mids"
            )
        )
    )
    return emb.crossJoin(F.broadcast(stats)).selectExpr(
        "vec_id",
        _SPARK_PACK.format(n=_HALF, off=0) + " AS w_lo",
        _SPARK_PACK.format(n=_HALF, off=_HALF) + " AS w_hi",
    )


def q_binary_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = _packed(spark, sf_dir)
    q = packed.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS q_id", "w_lo AS q_lo", "w_hi AS q_hi"
    )
    cand = packed.selectExpr("vec_id AS c_id", "w_lo AS c_lo", "w_hi AS c_hi")
    scored = (
        F.broadcast(q)
        .crossJoin(cand)
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "hamming",
            F.expr(
                "CAST(bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi)"
                " AS BIGINT)"
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("hamming").asc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "rank", F.col("c_id").alias("neighbor_id"), "hamming")
    )


_SQL_PACKED = f"""
emb AS ({DUCK_EMB}),
stats AS (
  SELECT list((lo + hi) / 2.0 ORDER BY pos) AS mids
  FROM (
    SELECT u.p AS pos, MIN(v[u.p]) AS lo, MAX(v[u.p]) AS hi
    FROM emb, UNNEST(range(1, {DIM} + 1)) AS u(p)
    GROUP BY u.p
  )
),
packed AS (
  SELECT vec_id,
    {_DUCK_PACK.format(n=_HALF, off=0)} AS w_lo,
    {_DUCK_PACK.format(n=_HALF, off=_HALF)} AS w_hi
  FROM emb, stats
)"""

SQL_BINARY_HAMMING = f"""
WITH {_SQL_PACKED},
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS c_id,
    CAST(bit_count(xor(q.w_lo, c.w_lo))
      + bit_count(xor(q.w_hi, c.w_hi)) AS BIGINT) AS hamming
  FROM packed q JOIN packed c
    ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
)
SELECT q_id, rank, c_id AS neighbor_id, hamming FROM (
  SELECT q_id, c_id, hamming,
    ROW_NUMBER() OVER (PARTITION BY q_id
      ORDER BY hamming ASC, c_id ASC) AS rank
  FROM scored
) WHERE rank <= {TOP_K}
"""


def q_binary_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall companion: fraction of the exact cosine top-3 the binary
    scan returns — the acceptance number for the 64x-compressed first
    stage (compare sim_sq8_recall's 8x point and sim_pq_recall's
    trained 64x point on the same fixture)."""
    exact3 = (
        q_cosine_topk(spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select("q_id", "neighbor_id")
    )
    ann3 = q_binary_hamming(spark, sf_dir).select("q_id", "neighbor_id")
    return _recall_vs_exact(exact3, ann3)


SQL_BINARY_RECALL = f"""
WITH exact3 AS (
  SELECT q_id, neighbor_id FROM ({SQL_COSINE_TOPK.strip()}) WHERE rank <= 3
),
ann3 AS (
  SELECT q_id, neighbor_id FROM ({SQL_BINARY_HAMMING.strip()})
)
SELECT
  (SELECT COUNT(*) FROM exact3) AS n_exact,
  COUNT(*) AS n_hits,
  CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM exact3) AS recall_at3
FROM exact3 JOIN ann3 USING (q_id, neighbor_id)
"""


_OVERSAMPLE = 8 * TOP_K  # binary stage keeps 40 candidates per query
_DUCK_NORM2 = DUCK_DOT.format(a="v", b="v")
_DUCK_DOT_QC = DUCK_DOT.format(a="q.v", b="c.v")


def q_binary_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production two-stage shape: binary Hamming scan keeps an
    oversampled candidate set (8x the final k — the 16-byte index does
    the heavy scan), then the exact cosine kernel re-ranks ONLY those
    candidates. The float work drops from corpus-size to 40 rows per
    query regardless of corpus size — the ``sim_pq_refine`` pattern on
    the cheaper first stage."""
    packed = _packed(spark, sf_dir)
    q = packed.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS q_id", "w_lo AS q_lo", "w_hi AS q_hi"
    )
    cand = packed.selectExpr("vec_id AS c_id", "w_lo AS c_lo", "w_hi AS c_hi")
    w_h = Window.partitionBy("q_id").orderBy(
        F.col("hamming").asc(), F.col("c_id").asc()
    )
    shortlist = (
        F.broadcast(q)
        .crossJoin(cand)
        .filter(F.col("q_id") != F.col("c_id"))
        .withColumn(
            "hamming",
            F.expr(
                "CAST(bit_count(q_lo ^ c_lo) + bit_count(q_hi ^ c_hi)"
                " AS BIGINT)"
            ),
        )
        .withColumn("hrk", F.row_number().over(w_h))
        .filter(F.col("hrk") <= _OVERSAMPLE)
        .select("q_id", "c_id")
    )
    emb = _emb(spark, sf_dir).withColumn(
        "norm2", F.expr("aggregate(zip_with(v, v, (x, y) -> x * y),"
                        " CAST(0 AS DOUBLE), (acc, x) -> acc + x)")
    )
    qv = emb.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS q_id", "v AS qv", "norm2 AS q_norm2"
    )
    cv = emb.selectExpr("vec_id AS c_id", "v AS cv", "norm2 AS c_norm2")
    rescored = (
        shortlist.join(F.broadcast(qv), "q_id")
        .join(cv, "c_id")
        .withColumn(
            "cosine",
            F.expr(
                "aggregate(zip_with(qv, cv, (x, y) -> x * y),"
                " CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
            )
            / F.sqrt(F.col("q_norm2") * F.col("c_norm2")),
        )
    )
    w_c = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w_c).cast("long"))
        .filter(F.col("rank") <= TOP_K)
        .select("q_id", "rank", F.col("c_id").alias("neighbor_id"), "cosine")
    )


SQL_BINARY_REFINE = f"""
WITH {_SQL_PACKED},
shortlist AS (
  SELECT q_id, c_id FROM (
    SELECT q.vec_id AS q_id, c.vec_id AS c_id,
      ROW_NUMBER() OVER (PARTITION BY q.vec_id
        ORDER BY CAST(bit_count(xor(q.w_lo, c.w_lo))
          + bit_count(xor(q.w_hi, c.w_hi)) AS BIGINT) ASC,
          c.vec_id ASC) AS hrk
    FROM packed q JOIN packed c
      ON q.vec_id < {N_QUERIES} AND q.vec_id <> c.vec_id
  ) WHERE hrk <= {_OVERSAMPLE}
),
normed AS (
  SELECT vec_id, v, {_DUCK_NORM2} AS norm2 FROM emb
),
rescored AS (
  SELECT s.q_id, s.c_id,
    {_DUCK_DOT_QC} / sqrt(q.norm2 * c.norm2) AS cosine
  FROM shortlist s
  JOIN normed q ON q.vec_id = s.q_id
  JOIN normed c ON c.vec_id = s.c_id
)
SELECT q_id, rank, c_id AS neighbor_id, cosine FROM (
  SELECT q_id, c_id, cosine,
    ROW_NUMBER() OVER (PARTITION BY q_id
      ORDER BY cosine DESC, c_id ASC) AS rank
  FROM rescored
) WHERE rank <= {TOP_K}
"""


def q_binary_refine_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the two-stage binary+rerank pipeline vs the exact
    top-3 — the number that justifies shipping the 64x-compressed scan
    (contrast ``sim_binary_recall``: same index, no re-rank)."""
    exact3 = (
        q_cosine_topk(spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select("q_id", "neighbor_id")
    )
    ann3 = q_binary_refine(spark, sf_dir).select("q_id", "neighbor_id")
    return _recall_vs_exact(exact3, ann3)


SQL_BINARY_REFINE_RECALL = f"""
WITH exact3 AS (
  SELECT q_id, neighbor_id FROM ({SQL_COSINE_TOPK.strip()}) WHERE rank <= 3
),
ann3 AS (
  SELECT q_id, neighbor_id FROM ({SQL_BINARY_REFINE.strip()})
)
SELECT
  (SELECT COUNT(*) FROM exact3) AS n_exact,
  COUNT(*) AS n_hits,
  CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM exact3) AS recall_at3
FROM exact3 JOIN ann3 USING (q_id, neighbor_id)
"""


def register_all() -> None:
    register_extra("sim_binary_hamming", q_binary_hamming, SQL_BINARY_HAMMING)
    register_extra("sim_binary_recall", q_binary_recall, SQL_BINARY_RECALL)
    register_extra("sim_binary_refine", q_binary_refine, SQL_BINARY_REFINE)
    register_extra(
        "sim_binary_refine_recall",
        q_binary_refine_recall,
        SQL_BINARY_REFINE_RECALL,
    )
