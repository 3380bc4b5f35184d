"""Pin Spark's exact-percentile interpolation semantics (r10).

The full-registry parity sweep on the regenerated skewed sf0.01 caught
`rel_exact_percentiles` 1 ulp apart on p99: DuckDB's ``quantile_cont``
computes ``lo + (hi - lo)*frac`` while Spark's ``percentile`` uses
``(hi_i - pos)*lo + (pos - lo_i)*hi`` AND short-circuits to the key when
the two bracketing keys are equal (which duplicate-heavy data hits
constantly — the skewed corpus put identical prices at the p99 bracket,
where the weighted form rounds to ...79000000001). The oracle now spells
out Spark's formula including the shortcut; this test replicates it in
pure Python against Spark on crafted duplicate-heavy data so the
semantics stay pinned independent of any dataset.
"""

from __future__ import annotations

import math

import duckdb
import pytest


def _spark_formula(sorted_vals: list[float], p: float) -> float:
    """Pure-Python replication of Spark Percentile.getPercentile and of
    the oracle CTE in olap_extra.SQL_EXACT_PERCENTILES."""
    n = len(sorted_vals)
    pos = p * float(n - 1)
    lo_i, hi_i = math.floor(pos), math.ceil(pos)
    lo, hi = sorted_vals[lo_i], sorted_vals[hi_i]
    if lo_i == hi_i or lo == hi:
        return lo
    return (hi_i - pos) * lo + (pos - lo_i) * hi


CASES = [
    # duplicate bracket: interpolation must NOT run (the 1-ulp trap)
    [103974.79] * 5 + [1.0] * 95,
    # interpolating bracket with a rounding-visible frac
    [0.1, 0.3],
    [1.7, 9.1, 3.3, 2.2, 8.8, 0.4, 5.5],
    # irrational-ish doubles
    [10.0 / 3, 20.0 / 7, 1.0 / 9, 22.0 / 7],
]
PS = [0.25, 0.5, 0.75, 0.99]


def test_spark_matches_replication_and_oracle_formula(spark):
    for vals in CASES:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        got = df.selectExpr(
            "percentile(v, array(0.25D, 0.5D, 0.75D, 0.99D)) AS ps"
        ).first().ps
        s = sorted(vals)
        for p, g in zip(PS, got):
            expect = _spark_formula(s, p)
            assert g == expect, (vals[:4], p, repr(g), repr(expect))


def test_duckdb_oracle_case_matches_spark_formula():
    """The oracle's CASE (incl. the lo.v = hi.v shortcut) over ranked
    rows reproduces the Python replication bit-for-bit in DuckDB."""
    con = duckdb.connect()
    for vals in CASES:
        con.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM (VALUES "
                    + ",".join(f"({v!r}::DOUBLE)" for v in vals) + ") AS t(v)")
        rows = con.execute("""
WITH ranked AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
  FROM t
),
cuts AS (
  SELECT g.n, p.p,
    p.p * CAST(g.n - 1 AS DOUBLE) AS pos,
    CAST(floor(p.p * CAST(g.n - 1 AS DOUBLE)) AS BIGINT) AS lo_i,
    CAST(ceil(p.p * CAST(g.n - 1 AS DOUBLE)) AS BIGINT) AS hi_i
  FROM (SELECT DISTINCT n FROM ranked) g
  CROSS JOIN (SELECT CAST(UNNEST([0.25, 0.5, 0.75, 0.99]) AS DOUBLE) AS p) p
)
SELECT c.p,
  CASE WHEN c.lo_i = c.hi_i OR lo.v = hi.v THEN lo.v
       ELSE (CAST(c.hi_i AS DOUBLE) - c.pos) * lo.v
          + (c.pos - CAST(c.lo_i AS DOUBLE)) * hi.v END AS val
FROM cuts c
JOIN ranked lo ON lo.rn = c.lo_i + 1
JOIN ranked hi ON hi.rn = c.hi_i + 1
ORDER BY c.p
""").fetchall()
        s = sorted(vals)
        for p, val in rows:
            assert val == _spark_formula(s, p), (vals[:4], p, repr(val))
