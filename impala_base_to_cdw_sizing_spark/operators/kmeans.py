"""Iterative algorithm coverage: Lloyd k-means over the embeddings table,
expressed as a fixed number of unrolled DataFrame iterations.

Each iteration is (1) an assignment join — every vector to its nearest
centroid by L2², broadcast k rows — and (2) a centroid recompute —
posexplode + integer nano-unit sums per (cluster, dim). Both steps are
deterministic (argmin ties break on cluster id; sums are exact integers),
so even this *iterative* algorithm is DuckDB-oracle-checkable with the
same unrolling. Spark's driver loop only grows the plan; no data ever
reaches the driver.

Scale: per iteration, one broadcast join (k×dim doubles — tiny at any k
that fits a sane model) + one shuffle keyed by (cluster, dim) with
map-side partial aggregation. The classic distributed k-means plan;
``ml.clustering.KMeans`` produces the same shape with sampling-based
init, which is deliberately replaced by deterministic first-k init here
so the oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries_ext import register
from .similarity import DIM, DUCK_DOT, DUCK_EMB, SPARK_DOT

K = 8
N_ITERS = 2
_NANO = 1_000_000_000.0


def _assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """vectors × broadcast centroids → nearest cluster per vector."""
    dists = emb.crossJoin(F.broadcast(centroids)).withColumn(
        "dist2",
        F.col("norm2")
        + F.expr(SPARK_DOT.format(a="cv", b="cv"))
        - 2 * F.expr(SPARK_DOT.format(a="v", b="cv")),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dist2").asc(), F.col("cluster").asc()
    )
    return (
        dists.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("vec_id", "label", "v", "norm2", "cluster")
    )


def _recompute(assigned: DataFrame) -> DataFrame:
    """new centroids: per-cluster per-dim mean via exact nano-unit sums,
    reassembled into an ordered array column."""
    exploded = assigned.select(
        "cluster", F.posexplode("v").alias("pos", "x")
    ).withColumn("x_nano", F.floor(F.col("x") * _NANO + 0.5).cast("long"))
    means = (
        exploded.groupBy("cluster", "pos")
        .agg(
            F.sum(F.col("x_nano").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        )
        .selectExpr(
            "cluster", "pos",
            f"CAST(s AS DOUBLE) / {_NANO} / n AS m",
        )
    )
    return means.groupBy("cluster").agg(
        F.expr("transform(array_sort(collect_list(struct(pos, m))), p -> p.m)").alias("cv")
    )


def q_kmeans_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means after ``N_ITERS`` unrolled Lloyd iterations: cluster sizes
    and exact per-cluster inertia (micro-quantized for oracle parity)."""
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .selectExpr(
            "vec_id", "label",
            "transform(embedding, x -> CAST(x AS DOUBLE)) AS v",
        )
        .withColumn("norm2", F.expr(SPARK_DOT.format(a="v", b="v")))
    )
    centroids = emb.filter(F.col("vec_id") < K).selectExpr(
        "vec_id AS cluster", "v AS cv"
    )
    assigned = None
    for _ in range(N_ITERS):
        assigned = _assign(emb, centroids)
        centroids = _recompute(assigned)
    final = _assign(emb, centroids)
    with_dist = final.join(centroids, "cluster").withColumn(
        "dist2",
        F.col("norm2")
        + F.expr(SPARK_DOT.format(a="cv", b="cv"))
        - 2 * F.expr(SPARK_DOT.format(a="v", b="cv")),
    )
    return with_dist.groupBy("cluster").agg(
        F.count("*").alias("n_points"),
        F.sum(F.floor(F.col("dist2") * 1_000_000.0 + 0.5).cast("long")).alias(
            "inertia_micro"
        ),
    )


def _iteration_sql(prev: str, i: int) -> str:
    """One unrolled Lloyd iteration as two CTEs over ``prev`` centroids."""
    return f"""
assign{i} AS (
  SELECT vec_id, v, norm2, cluster FROM (
    SELECT e.vec_id, e.v, e.norm2, c.cluster,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        e.norm2 + {DUCK_DOT.format(a='c.cv', b='c.cv')}
          - 2 * {DUCK_DOT.format(a='e.v', b='c.cv')} ASC, c.cluster ASC) AS r
    FROM normed e, {prev} c
  ) WHERE r = 1
),
cent{i} AS (
  SELECT cluster, list(m ORDER BY pos) AS cv
  FROM (
    SELECT cluster, pos, CAST(SUM(CAST(x_nano AS DECIMAL(38,0))) AS DOUBLE)
      / {_NANO} / COUNT(*) AS m
    FROM (
      SELECT a.cluster, CAST(i - 1 AS INTEGER) AS pos,
        CAST(floor(a.v[i] * {_NANO} + 0.5) AS BIGINT) AS x_nano
      FROM assign{i} a, (SELECT unnest(range(1, {DIM + 1})) AS i)
    ) GROUP BY cluster, pos
  ) GROUP BY cluster
)"""


def _kmeans_sql() -> str:
    parts = [
        f"emb AS ({DUCK_EMB})",
        f"normed AS (SELECT vec_id, v, {DUCK_DOT.format(a='v', b='v')} AS norm2 FROM emb)",
        f"cent0 AS (SELECT vec_id AS cluster, v AS cv FROM normed WHERE vec_id < {K})",
    ]
    prev = "cent0"
    for i in range(1, N_ITERS + 1):
        parts.append(_iteration_sql(prev, i).strip())
        prev = f"cent{i}"
    final = f"""
final AS (
  SELECT vec_id, norm2, v, cluster FROM (
    SELECT e.vec_id, e.norm2, e.v, c.cluster,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        e.norm2 + {DUCK_DOT.format(a='c.cv', b='c.cv')}
          - 2 * {DUCK_DOT.format(a='e.v', b='c.cv')} ASC, c.cluster ASC) AS r
    FROM normed e, {prev} c
  ) WHERE r = 1
)"""
    parts.append(final.strip())
    return (
        "WITH " + ",\n".join(parts) + f"""
SELECT f.cluster, COUNT(*) AS n_points,
  CAST(SUM(CAST(floor((f.norm2 + {DUCK_DOT.format(a='c.cv', b='c.cv')}
    - 2 * {DUCK_DOT.format(a='f.v', b='c.cv')}) * 1000000.0 + 0.5) AS BIGINT))
    AS BIGINT) AS inertia_micro
FROM final f JOIN {prev} c ON f.cluster = c.cluster
GROUP BY f.cluster
"""
    )


def register_all() -> None:
    register("kmeans_clusters", q_kmeans_assignments, _kmeans_sql())
