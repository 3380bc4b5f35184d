"""Product-quantization ANN (IVF-PQ) over the ``embeddings`` table —
the codebook tier of the similarity stack (brute force → LSH → IVF →
IVF-PQ), after Jégou/Douze/Schmid 2011, "Product Quantization for
Nearest Neighbor Search" (the FAISS ``IVFPQ`` index shape).

The 64-dim vectors are L2-normalized, split into ``_M = 8`` subspaces of
8 dims; each subspace gets a ``_K = 16``-entry codebook (the sub-vectors
of the first 16 corpus vectors — the same fixed-seed quantizer the IVF
tier uses for its coarse cells, so the whole index is deterministic and
both engines derive it from the data, no driver-side training). Every
vector is encoded to 8 one-byte codes; a query is answered by
asymmetric distance computation (ADC): one 8x16 lookup table of exact
query-sub-vector x centroid inner products, then each candidate scores
as 8 table lookups summed — never touching the candidate's raw floats.

Why this is THE 100 TB shape: the index stores 8 bytes + a cell id per
vector (64x smaller than the raw 64-float row), the scan side of the
search reads only ``(cell_id, codes)`` — a column-pruned parquet scan —
and the per-candidate cost is 8 array lookups instead of a 64-term dot
product. Candidates are restricted to the query's IVF cell exactly as in
``sim_ivf_ann``; the LUT build (5 queries x 16 seeds) is a broadcast
map. Determinism: normalization, sub-space folds, and the 8-term ADC sum
all run in fixed index order in both engines; argmin code assignment
tie-breaks on the lowest code via lexicographic struct/ROW min.

Accuracy is measured, not asserted: ``sim_pq_recall`` reports recall@3
vs the exact cosine top-3 (the ``sim_lsh_recall`` pattern), and
``tests/test_pq.py`` pins codes in range, the 64x compression ratio,
and the ADC-vs-exact rank agreement on the self-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .queries_ext import register_extra
from .similarity import (
    DUCK_DOT,
    N_QUERIES,
    SPARK_DOT,
    SQL_COSINE_TOPK,
    _emb,
    _recall_vs_exact,
    q_cosine_topk,
)

_M = 8  # subspaces
_SUBD = 8  # dims per subspace (8 x 8 = 64)
_K = 16  # codes per subspace codebook (vec_id < _K are the seeds)
_N_CELLS = 8  # coarse IVF cells (vec_id < 8 double as cell centroids)
_TOPK = 3


# --- per-subspace fold expressions (fixed index order in both engines) ------


def _spark_sub(a: str, b: str, m: int, op: str) -> str:
    off = m * _SUBD + 1
    body = "x * y" if op == "dot" else "(x - y) * (x - y)"
    return (
        f"aggregate(zip_with(slice({a}, {off}, {_SUBD}), "
        f"slice({b}, {off}, {_SUBD}), (x, y) -> {body}), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _duck_sub(a: str, b: str, m: int, op: str) -> str:
    off = m * _SUBD + 1
    term = (
        f"{a}[{off} + i] * {b}[{off} + i]"
        if op == "dot"
        else f"({a}[{off} + i] - {b}[{off} + i]) * ({a}[{off} + i] - {b}[{off} + i])"
    )
    return (
        f"list_reduce([CAST(0 AS DOUBLE)] || "
        f"list_transform(range(0, {_SUBD}), i -> {term}), (acc, x) -> acc + x)"
    )


def _normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _emb(spark, sf_dir)
        .withColumn("norm2", F.expr(SPARK_DOT.format(a="v", b="v")))
        .selectExpr("vec_id", "transform(v, x -> x / sqrt(norm2)) AS v")
    )


def _pq_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored index: ``(vec_id, cell_id, c0..c7)`` — one byte-range
    code per subspace plus the coarse cell. At scale THIS is the table
    the search scans; the raw vectors are read only by the encoder."""
    emb = _normalized(spark, sf_dir)
    cellseeds = emb.filter(F.col("vec_id") < _N_CELLS).selectExpr(
        "vec_id AS cell_id", "v AS cv"
    )
    wcell = Window.partitionBy("vec_id").orderBy(
        F.col("ip").desc(), F.col("cell_id").asc()
    )
    cells = (
        emb.crossJoin(F.broadcast(cellseeds))
        .withColumn("ip", F.expr(SPARK_DOT.format(a="v", b="cv")))
        .withColumn("r", F.row_number().over(wcell))
        .filter(F.col("r") == 1)
        .select("vec_id", "cell_id")
    )
    seeds = emb.filter(F.col("vec_id") < _K).selectExpr("vec_id AS code", "v AS sv")
    dists = emb.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "code",
        *[
            F.expr(_spark_sub("v", "sv", m, "d2")).alias(f"d{m}")
            for m in range(_M)
        ],
    )
    codes = dists.groupBy("vec_id").agg(
        *[
            F.min(F.struct(F.col(f"d{m}").alias("d"), F.col("code").alias("c")))
            .getField("c")
            .cast("long")
            .alias(f"c{m}")
            for m in range(_M)
        ]
    )
    # the search references the index on both join sides (query cells +
    # candidates) — materialize once, GC-scoped (the repo's
    # cache-hygiene pattern: no unpersist bookkeeping, blocks release
    # with the frame)
    return cells.join(codes, "vec_id").localCheckpoint(eager=True)


def _adc_scored(spark: SparkSession, sf_dir: str, nprobe: int = 1) -> DataFrame:
    """Every (query, candidate) pair with its ADC score — the shared
    core of the ADC-only, refined, and multi-probe searches. With
    ``nprobe > 1`` the QUERY side fans out to its ``nprobe``
    highest-inner-product coarse cells (the ``sim_ivf_multiprobe``
    shape); candidates stay routed by their single home cell, so each
    candidate can appear in at most one probed cell and the pair set
    for ``nprobe = n`` is a superset of ``nprobe = 1``'s, bounded by
    ``n×`` the single-probe candidate budget."""
    emb = _normalized(spark, sf_dir)
    index = _pq_index(spark, sf_dir)
    seeds = emb.filter(F.col("vec_id") < _K).selectExpr("vec_id AS code", "v AS sv")
    luts = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(seeds))
        .select(
            F.col("vec_id").alias("q_id"),
            "code",
            *[
                F.expr(_spark_sub("v", "sv", m, "dot")).alias(f"p{m}")
                for m in range(_M)
            ],
        )
        .groupBy("q_id")
        .agg(
            *[
                F.expr(
                    f"transform(sort_array(collect_list("
                    f"named_struct('k', code, 'p', p{m}))), x -> x.p)"
                ).alias(f"lut{m}")
                for m in range(_M)
            ]
        )
    )
    if nprobe == 1:
        q = luts.join(
            index.selectExpr("vec_id AS q_id", "cell_id"), "q_id"
        )
    else:
        cellseeds = emb.filter(F.col("vec_id") < _N_CELLS).selectExpr(
            "vec_id AS cell_id", "v AS cv"
        )
        wprobe = Window.partitionBy("q_id").orderBy(
            F.col("ip").desc(), F.col("cell_id").asc()
        )
        qcells = (
            emb.filter(F.col("vec_id") < N_QUERIES)
            .selectExpr("vec_id AS q_id", "v AS qv")
            .crossJoin(F.broadcast(cellseeds))
            .withColumn("ip", F.expr(SPARK_DOT.format(a="qv", b="cv")))
            .withColumn("r", F.row_number().over(wprobe))
            .filter(F.col("r") <= nprobe)
            .select("q_id", "cell_id")
        )
        q = luts.join(qcells, "q_id")
    adc = " + ".join(
        f"element_at(lut{m}, CAST(c{m} + 1 AS INT))" for m in range(_M)
    )
    return (
        q.join(index.withColumnRenamed("vec_id", "c_id"), "cell_id")
        .filter(F.col("c_id") != F.col("q_id"))
        .withColumn("adc_ip", F.expr(adc))
    )


def q_pq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search: ADC top-3 per query within the query's coarse cell.
    Output ``(q_id, rank, neighbor_id, adc_ip)`` — ``adc_ip`` is the
    quantized inner product (the ranking key), not the exact cosine."""
    scored = _adc_scored(spark, sf_dir)
    wtop = Window.partitionBy("q_id").orderBy(
        F.col("adc_ip").desc(), F.col("c_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rank") <= _TOPK)
        .select("q_id", "rank", F.col("c_id").alias("neighbor_id"), "adc_ip")
    )


_REFINE_R = 32  # ADC shortlist size fed to the exact re-rank


def q_pq_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF-PQ shape (FAISS ``IndexRefine``): ADC shortlists
    the top ``_REFINE_R`` candidates per query from the compressed index,
    then ONLY those rows read their raw vectors for an exact cosine
    re-rank of the top-3. Chosen by measurement (``sim_pq_refine_recall``
    vs ``sim_pq_recall``): ADC-only recall@3 is 0.27/0.40 at
    sf0.001/sf0.01 on this corpus (random embeddings have no cluster
    structure, so 16-code quantization noise swamps the thin cosine
    margins), R=32 refinement lifts it to 0.93/0.80 — the single-probe
    coarse-cell ceiling (``sim_ivf_recall``). At scale the refine step
    reads R x n_queries raw vectors instead of the whole corpus: the
    scan stays on the 8-byte codes."""
    return _refined(spark, sf_dir, nprobe=1)


def _refined(spark: SparkSession, sf_dir: str, nprobe: int) -> DataFrame:
    """ADC shortlist → exact re-rank. The shortlist is taken PER PROBED
    CELL (top ``_REFINE_R`` by ADC within each ``(q_id, cell_id)``) —
    the classic IVF-PQ scan shape (per-list candidates, then merge).
    Two properties follow: the candidate budget is exactly
    ``nprobe × _REFINE_R`` per query, and the home cell's shortlist is
    always a subset of the multi-probe shortlist, so the exact re-rank
    sees a superset of the single-probe pool and recall@k can only
    rise (a global top-R over the pooled cells loses BOTH properties:
    ADC noise from extra cells can evict home-cell candidates —
    measured: recall fell 0.93 → 0.80 with a pooled shortlist)."""
    scored = _adc_scored(spark, sf_dir, nprobe=nprobe)
    wadc = Window.partitionBy("q_id", "cell_id").orderBy(
        F.col("adc_ip").desc(), F.col("c_id").asc()
    )
    short = (
        scored.withColumn("r", F.row_number().over(wadc))
        .filter(F.col("r") <= _REFINE_R)
        .select("q_id", "c_id")
    )
    emb = _normalized(spark, sf_dir)
    qv = emb.filter(F.col("vec_id") < N_QUERIES).selectExpr(
        "vec_id AS q_id", "v AS qv"
    )
    cv = emb.selectExpr("vec_id AS c_id", "v AS cv")
    exact = (
        short.join(qv, "q_id")
        .join(cv, "c_id")
        .withColumn("cosine", F.expr(SPARK_DOT.format(a="qv", b="cv")))
    )
    wtop = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("c_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(wtop).cast("long"))
        .filter(F.col("rank") <= _TOPK)
        .select("q_id", "rank", F.col("c_id").alias("neighbor_id"), "cosine")
    )


_PQ_NPROBE = 4  # matched to sim_ivf_multiprobe's measured knob


def q_pq_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full production composition (r5 verdict #4): IVF multi-probe
    (``_PQ_NPROBE`` cells per query) × PQ ADC shortlist × exact re-rank.
    ``sim_pq_refine``'s measured recall (0.93/0.80) was capped by the
    single-probe coarse cell — the true neighbor sometimes lives in
    another cell, and no amount of in-cell refinement can recover it.
    Probing 4 cells removes exactly that ceiling at ≤4× the candidate
    budget (pinned structurally in tests/test_pq.py)."""
    return _refined(spark, sf_dir, nprobe=_PQ_NPROBE)


def _sql_adc_cte(nprobe: int = 1) -> str:
    d2_cols = ",\n    ".join(
        f"{_duck_sub('n.v', 's.sv', m, 'd2')} AS d{m}" for m in range(_M)
    )
    min_cols = ",\n    ".join(
        f"min({{'d': d{m}, 'c': code}}).c AS c{m}" for m in range(_M)
    )
    ip_cols = ",\n    ".join(
        f"{_duck_sub('q.v', 's.sv', m, 'dot')} AS p{m}" for m in range(_M)
    )
    lut_cols = ",\n    ".join(
        f"list(p{m} ORDER BY code) AS lut{m}" for m in range(_M)
    )
    adc = " + ".join(f"q.lut{m}[i.c{m} + 1]" for m in range(_M))
    return f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
n AS (
  SELECT vec_id,
    list_transform(v0, x -> x / sqrt({DUCK_DOT.format(a='v0', b='v0')})) AS v
  FROM emb
),
cellseeds AS (SELECT vec_id AS cell_id, v AS cv FROM n WHERE vec_id < {_N_CELLS}),
cells AS (
  SELECT vec_id, cell_id FROM (
    SELECT n.vec_id, s.cell_id, ROW_NUMBER() OVER (
      PARTITION BY n.vec_id
      ORDER BY {DUCK_DOT.format(a='n.v', b='s.cv')} DESC, s.cell_id ASC) AS r
    FROM n, cellseeds s
  ) WHERE r = 1
),
seeds AS (SELECT vec_id AS code, v AS sv FROM n WHERE vec_id < {_K}),
dists AS (
  SELECT n.vec_id, s.code,
    {d2_cols}
  FROM n, seeds s
),
codes AS (
  SELECT vec_id,
    {min_cols}
  FROM dists GROUP BY vec_id
),
idx AS (SELECT c.vec_id, c.cell_id, d.* EXCLUDE (vec_id)
        FROM cells c JOIN codes d ON c.vec_id = d.vec_id),
ips AS (
  SELECT q.vec_id AS q_id, s.code,
    {ip_cols}
  FROM n q, seeds s WHERE q.vec_id < {N_QUERIES}
),
luts AS (
  SELECT q_id,
    {lut_cols}
  FROM ips GROUP BY q_id
),
qcells AS (
  SELECT q_id, cell_id FROM (
    SELECT n.vec_id AS q_id, s.cell_id, ROW_NUMBER() OVER (
      PARTITION BY n.vec_id
      ORDER BY {DUCK_DOT.format(a='n.v', b='s.cv')} DESC, s.cell_id ASC) AS r
    FROM n, cellseeds s WHERE n.vec_id < {N_QUERIES}
  ) WHERE r <= {nprobe}
),
qside AS (
  SELECT l.*, qc.cell_id FROM luts l JOIN qcells qc ON qc.q_id = l.q_id
),
scored AS (
  SELECT q.q_id, q.cell_id, i.vec_id AS c_id, {adc} AS adc_ip
  FROM qside q JOIN idx i ON q.cell_id = i.cell_id AND i.vec_id <> q.q_id
)"""


def _sql_pq_ann() -> str:
    return f"""
{_sql_adc_cte()}
SELECT q_id, rank, c_id AS neighbor_id, adc_ip FROM (
  SELECT q_id, c_id, adc_ip, ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY adc_ip DESC, c_id ASC) AS rank
  FROM scored
) WHERE rank <= {_TOPK}
"""


def _sql_pq_refine(nprobe: int = 1) -> str:
    return f"""
{_sql_adc_cte(nprobe)},
short AS (
  SELECT q_id, c_id FROM (
    SELECT q_id, c_id, ROW_NUMBER() OVER (
      PARTITION BY q_id, cell_id ORDER BY adc_ip DESC, c_id ASC) AS r
    FROM scored
  ) WHERE r <= {_REFINE_R}
),
exact AS (
  SELECT s.q_id, s.c_id,
    {DUCK_DOT.format(a='qn.v', b='cn.v')} AS cosine
  FROM short s
  JOIN n qn ON qn.vec_id = s.q_id
  JOIN n cn ON cn.vec_id = s.c_id
)
SELECT q_id, rank, c_id AS neighbor_id, cosine FROM (
  SELECT q_id, c_id, cosine, ROW_NUMBER() OVER (
    PARTITION BY q_id ORDER BY cosine DESC, c_id ASC) AS rank
  FROM exact
) WHERE rank <= {_TOPK}
"""


def q_pq_multiprobe_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the multi-probe refined IVF-PQ search — the number
    that shows the single-probe cell ceiling removed (tests pin it ≥
    ``sim_pq_refine_recall`` on both fixture corpora)."""
    exact3 = (
        q_cosine_topk(spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select("q_id", "neighbor_id")
    )
    ann3 = q_pq_multiprobe(spark, sf_dir).select("q_id", "neighbor_id")
    return _recall_vs_exact(exact3, ann3)


def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the ADC-only IVF-PQ search vs the exact cosine top-3 —
    the number that tells you what the 64x index compression costs on
    THIS corpus (compare with ``sim_ivf_recall``, which isolates the
    coarse quantizer: the gap between the two is the PQ quantization
    loss, and ``sim_pq_refine_recall`` shows what refinement buys back)."""
    exact3 = (
        q_cosine_topk(spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select("q_id", "neighbor_id")
    )
    ann3 = q_pq_ann(spark, sf_dir).select("q_id", "neighbor_id")
    return _recall_vs_exact(exact3, ann3)


def q_pq_refine_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the refined IVF-PQ search — ``tests/test_pq.py`` pins
    that it dominates the ADC-only number on both test corpora."""
    exact3 = (
        q_cosine_topk(spark, sf_dir)
        .filter(F.col("rank") <= 3)
        .select("q_id", "neighbor_id")
    )
    ann3 = q_pq_refine(spark, sf_dir).select("q_id", "neighbor_id")
    return _recall_vs_exact(exact3, ann3)


def _sql_recall(ann_sql: str) -> str:
    return f"""
WITH exact3 AS (
  SELECT q_id, neighbor_id FROM ({SQL_COSINE_TOPK.strip()}) WHERE rank <= 3
),
ann3 AS (
  SELECT q_id, neighbor_id FROM ({ann_sql.strip()})
)
SELECT
  (SELECT COUNT(*) FROM exact3) AS n_exact,
  COUNT(*) AS n_hits,
  CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM exact3) AS recall_at3
FROM exact3 JOIN ann3 USING (q_id, neighbor_id)
"""


# --- trained subspace codebooks (per-subspace Lloyd) -------------------------
#
# The fixed-seed codebook above is training-free; real IVFPQ trains each
# subspace's codebook with k-means. Instead of 8 separate Lloyd chains,
# the vectors explode into (vec_id, m, sub-vector) rows and ONE unrolled
# chain runs with the subspace id as part of every key: assignment
# windows partition by (vec_id, m), centroid recompute groups by
# (m, code, pos) — 8 independent 8-dim k-means as a single grouped
# computation (the kmeans.py pattern, one more key column). Init is the
# SAME fixed seeds the static codebook uses, so Lloyd's monotone
# convergence guarantees per-subspace distortion can only fall — the
# claim `sim_pq_trained` emits per subspace and `tests/test_pq.py` pins.

_TRAIN_ITERS = 2


def _sub_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _normalized(spark, sf_dir).selectExpr(
        "vec_id", "v",
        f"explode(sequence(0, {_M - 1})) AS m",
    ).selectExpr(
        "vec_id", "m",
        f"slice(v, m * {_SUBD} + 1, {_SUBD}) AS sv",
    ).withColumn("sn", F.expr(SPARK_DOT.format(a="sv", b="sv")))


def _sub_assign(sub: DataFrame, cent: DataFrame) -> DataFrame:
    dists = (
        sub.join(F.broadcast(cent), "m")
        .withColumn(
            "d2",
            F.col("sn")
            + F.expr(SPARK_DOT.format(a="cv", b="cv"))
            - 2 * F.expr(SPARK_DOT.format(a="sv", b="cv")),
        )
    )
    w = Window.partitionBy("vec_id", "m").orderBy(
        F.col("d2").asc(), F.col("code").asc()
    )
    return (
        dists.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("vec_id", "m", "sv", "sn", "code", "d2")
    )


_NANO = 1_000_000_000.0


def _sub_recompute(assigned: DataFrame) -> DataFrame:
    exploded = assigned.select(
        "m", "code", F.posexplode("sv").alias("pos", "x")
    ).withColumn("x_nano", F.floor(F.col("x") * _NANO + 0.5).cast("long"))
    means = (
        exploded.groupBy("m", "code", "pos")
        .agg(
            F.sum(F.col("x_nano").cast("decimal(38,0)")).alias("s"),
            F.count("*").alias("n"),
        )
        .selectExpr("m", "code", "pos", f"CAST(s AS DOUBLE) / {_NANO} / n AS mn")
    )
    return means.groupBy("m", "code").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(pos, mn))), p -> p.mn)"
        ).alias("cv")
    )


def q_pq_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-subspace quantization distortion of the fixed-seed codebook vs
    the Lloyd-trained one (``_TRAIN_ITERS`` unrolled rounds from the same
    seeds): ``(m, n_vectors, d_seed_micro, d_trained_micro, improved)``.
    ``improved`` is Lloyd's monotone-convergence guarantee materialized
    as a column — training from an init can never worsen that init's
    total distortion."""
    # read 2 + _TRAIN_ITERS times (seed assignment, each round, final
    # assignment) — materialize once, GC-scoped
    sub = _sub_rows(spark, sf_dir).localCheckpoint(eager=True)
    cent = sub.filter(F.col("vec_id") < _K).selectExpr(
        "m", "vec_id AS code", "sv AS cv"
    )
    seed_assign = _sub_assign(sub, cent)
    trained = cent
    for _ in range(_TRAIN_ITERS):
        trained = _sub_recompute(_sub_assign(sub, trained))
    trained_assign = _sub_assign(sub, trained)

    def _distortion(assigned: DataFrame, col: str) -> DataFrame:
        return assigned.groupBy("m").agg(
            F.count("*").alias("n_vectors"),
            F.sum(
                F.floor(F.col("d2") * 1_000_000.0 + 0.5).cast("long")
            ).alias(col),
        )

    seed_d = _distortion(seed_assign, "d_seed_micro")
    trained_d = _distortion(trained_assign, "d_trained_micro").drop("n_vectors")
    return (
        seed_d.join(trained_d, "m")
        .selectExpr(
            "CAST(m AS BIGINT) AS m", "n_vectors",
            "d_seed_micro", "d_trained_micro",
            "d_trained_micro <= d_seed_micro AS improved",
        )
    )


def _sql_sub_dot(a: str, b: str) -> str:
    return DUCK_DOT.format(a=a, b=b)


def _sql_sub_iteration(prev: str, i: int) -> str:
    return f"""
sassign{i} AS (
  SELECT vec_id, m, sv, sn, code, d2 FROM (
    SELECT s.vec_id, s.m, s.sv, s.sn, c.code,
      s.sn + {_sql_sub_dot('c.cv', 'c.cv')} - 2 * {_sql_sub_dot('s.sv', 'c.cv')} AS d2,
      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        s.sn + {_sql_sub_dot('c.cv', 'c.cv')}
          - 2 * {_sql_sub_dot('s.sv', 'c.cv')} ASC, c.code ASC) AS r
    FROM sub s JOIN {prev} c ON s.m = c.m
  ) WHERE r = 1
),
scent{i} AS (
  SELECT m, code, list(mn ORDER BY pos) AS cv
  FROM (
    SELECT m, code, pos,
      CAST(SUM(CAST(x_nano AS DECIMAL(38,0))) AS DOUBLE) / {_NANO} / COUNT(*) AS mn
    FROM (
      SELECT a.m, a.code, CAST(i AS INTEGER) AS pos,
        CAST(floor(a.sv[i] * {_NANO} + 0.5) AS BIGINT) AS x_nano
      FROM sassign{i} a, (SELECT unnest(range(1, {_SUBD} + 1)) AS i)
    ) GROUP BY m, code, pos
  ) GROUP BY m, code
)"""


def _sql_pq_trained() -> str:
    parts = [
        "emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings)",
        f"""n AS (
  SELECT vec_id,
    list_transform(v0, x -> x / sqrt({DUCK_DOT.format(a='v0', b='v0')})) AS v
  FROM emb
)""",
        f"""sub AS (
  SELECT vec_id, m, sv, {_sql_sub_dot('sv', 'sv')} AS sn FROM (
    SELECT vec_id, CAST(u.m AS BIGINT) AS m,
      v[(u.m * {_SUBD} + 1):(u.m * {_SUBD} + {_SUBD})] AS sv
    FROM n, UNNEST(range(0, {_M})) AS u(m)
  )
)""",
        f"scent0 AS (SELECT m, vec_id AS code, sv AS cv FROM sub WHERE vec_id < {_K})",
    ]
    prev = "scent0"
    for i in range(1, _TRAIN_ITERS + 1):
        parts.append(_sql_sub_iteration(prev, i).strip())
        prev = f"scent{i}"
    final_assign = f"""
sfinal AS (
  SELECT vec_id, m, code, d2 FROM (
    SELECT s.vec_id, s.m, c.code,
      s.sn + {_sql_sub_dot('c.cv', 'c.cv')} - 2 * {_sql_sub_dot('s.sv', 'c.cv')} AS d2,
      ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m ORDER BY
        s.sn + {_sql_sub_dot('c.cv', 'c.cv')}
          - 2 * {_sql_sub_dot('s.sv', 'c.cv')} ASC, c.code ASC) AS r
    FROM sub s JOIN {prev} c ON s.m = c.m
  ) WHERE r = 1
)"""
    parts.append(final_assign.strip())
    return (
        "WITH " + ",\n".join(parts) + """
SELECT s.m, s.n_vectors, s.d_seed_micro, t.d_trained_micro,
  t.d_trained_micro <= s.d_seed_micro AS improved
FROM (
  SELECT m, COUNT(*) AS n_vectors,
    CAST(SUM(CAST(floor(d2 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
      AS d_seed_micro
  FROM sassign1 GROUP BY m
) s JOIN (
  SELECT m, CAST(SUM(CAST(floor(d2 * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
      AS d_trained_micro
  FROM sfinal GROUP BY m
) t ON s.m = t.m
"""
    )


def register_all() -> None:
    register_extra("sim_pq_ann", q_pq_ann, _sql_pq_ann())
    register_extra("sim_pq_refine", q_pq_refine, _sql_pq_refine())
    register_extra("sim_pq_recall", q_pq_recall, _sql_recall(_sql_pq_ann()))
    register_extra(
        "sim_pq_refine_recall", q_pq_refine_recall, _sql_recall(_sql_pq_refine())
    )
    register_extra("sim_pq_trained", q_pq_trained, _sql_pq_trained())
    register_extra(
        "sim_pq_multiprobe", q_pq_multiprobe, _sql_pq_refine(_PQ_NPROBE)
    )
    register_extra(
        "sim_pq_multiprobe_recall",
        q_pq_multiprobe_recall,
        _sql_recall(_sql_pq_refine(_PQ_NPROBE)),
    )
