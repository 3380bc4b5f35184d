"""Count-min sketch over corpus 3-gram shingles + heavy-hitter verification.

Completes the classic sketch trio alongside ``dedup_bloom`` (membership)
and ``rel_hll_rollup`` (distinct count): count-min answers "how often
does X occur?" from a fixed d×w counter table, however large the stream.
The build is the same distributed shape as the Bloom bitmap: each token
occurrence explodes to d (row, col) cells, one ``groupBy`` with map-side
combine collapses them — the sketch is d·w rows total (4·1024 here),
broadcastable, and mergeable across partitions/days by cell-wise
addition (sums commute — unlike exact top-k state).

Items are word 3-grams, not raw tokens — the fixture vocabulary is 31
tokens (collision-free at any useful w) but ~16k distinct shingles, so
the 4×1024 sketch shows real collision behavior at fixture scale.

The query reports the corpus's top heavy hitters with their EXACT count
next to the sketch ESTIMATE and the overestimate delta. Both engines
build the identical sketch (portable charfold hash → same cells), so
exact values, estimates, and deltas all hash-match — the one-sided error
guarantee (estimate ≥ truth, excess bounded by collisions ≈ N/w per
row) is pinned in tests as a hard invariant, not a tolerance flag.

Scale: one token-explode shuffle for the sketch (4× rows in, d·w rows
out via partial aggregation), one for the exact candidates; the
estimate join broadcasts the 4096-row sketch. At 100 TB drop the exact
candidate pass and probe the sketch directly — the point of the
structure — or keep it on a sampled slice as the accuracy monitor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .hashes import UHASH_COEFFS, uhash_expr
from .queries_ext import register_extra
from .text import (
    DUCK_SHINGLES,
    DUCK_TOKENS,
    SPARK_SHINGLES,
    SPARK_TOKENS,
    duck_charfold,
    spark_charfold,
)

_CM_W = 1024  # columns per row
# row hashes from the shared audited family (hashes.py) — same
# coefficients as the Bloom filter by documented choice
_CM_ROWS = UHASH_COEFFS
_TOP_K = 20


def _cells(h: str, dialect: str) -> str:
    cells = ", ".join(
        (
            f"struct({r} AS row_id,"
            f" CAST({uhash_expr(h, a, b, _CM_W)} AS BIGINT) AS col_id)"
            if dialect == "spark"
            else
            f"{{'row_id': {r},"
            f" 'col_id': CAST({uhash_expr(h, a, b, _CM_W)} AS BIGINT)}}"
        )
        for r, (a, b) in enumerate(_CM_ROWS)
    )
    return f"array({cells})" if dialect == "spark" else f"[{cells}]"


def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .selectExpr(f"{SPARK_TOKENS} AS tokens")
        .selectExpr(f"explode({SPARK_SHINGLES}) AS token")
        .withColumn("h", F.expr(spark_charfold("token")))
    ).localCheckpoint(eager=True)  # read twice (sketch build + exact
    # candidates): without materialization each pass re-explodes and
    # re-hashes every shingle. localCheckpoint, not cache(): the blocks
    # are released when the query's frames are garbage-collected, so a
    # long-lived session running the whole registry stays flat without
    # a manual unpersist it has no hook to call.
    sketch = (
        toks.selectExpr(f"explode({_cells('h', 'spark')}) AS cell")
        .groupBy("cell.row_id", "cell.col_id")
        .agg(F.count("*").alias("counter"))
    )
    top = (
        toks.groupBy("token", "h")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("token").asc())
        .limit(_TOP_K)
    )
    probes = top.selectExpr(
        "token", "exact_n", f"explode({_cells('h', 'spark')}) AS cell"
    ).select("token", "exact_n", "cell.row_id", "cell.col_id")
    return (
        probes.join(F.broadcast(sketch), ["row_id", "col_id"])
        .groupBy("token", "exact_n")
        .agg(F.min("counter").alias("est_n"))
        .selectExpr(
            "token", "exact_n", "est_n", "est_n - exact_n AS overestimate"
        )
    )


SQL_COUNTMIN = f"""
WITH toks AS (
  SELECT token, {duck_charfold('token')} AS h
  FROM (SELECT unnest({DUCK_SHINGLES}) AS token
        FROM (SELECT {DUCK_TOKENS} AS tokens FROM documents))
),
cells AS (
  SELECT unnest({_cells('h', 'duck')}) AS cell FROM toks
),
sketch AS (
  SELECT cell.row_id AS row_id, cell.col_id AS col_id, COUNT(*) AS counter
  FROM cells GROUP BY 1, 2
),
top AS (
  SELECT token, h, COUNT(*) AS exact_n
  FROM toks GROUP BY 1, 2
  ORDER BY exact_n DESC, token ASC LIMIT {_TOP_K}
),
probes AS (
  SELECT token, exact_n, cell.row_id AS row_id, cell.col_id AS col_id
  FROM (SELECT token, exact_n, unnest({_cells('h', 'duck')}) AS cell FROM top)
)
SELECT token, exact_n, CAST(MIN(counter) AS BIGINT) AS est_n,
  CAST(MIN(counter) - exact_n AS BIGINT) AS overestimate
FROM probes JOIN sketch USING (row_id, col_id)
GROUP BY token, exact_n
"""


def register_all() -> None:
    register_extra("sketch_countmin_topk", q_countmin_heavy_hitters, SQL_COUNTMIN)
