"""Scalar expression helpers shared across operators.

Everything here is a *native* Spark expression (JVM-side, whole-stage
codegen) — the reference's two user functions ``get_tsize`` and
``bytimestamp`` (``impala_query_sizing.py:71-84,351-352``) become native
expressions; no Python UDFs on parity paths (SURVEY.md §2.J).

``round2`` is deliberately NOT the engines' ``round()``: Spark rounds
HALF_UP via BigDecimal while DuckDB rounds via C semantics, and the two can
disagree on binary-exact halves (e.g. 0.125). ``floor(x*100 + 0.5)/100``
is the same IEEE op sequence in both engines, so oracle hashes match.
All reference values are non-negative, where this equals HALF_UP.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round2(c: Column) -> Column:
    """Deterministic 2-decimal HALF_UP rounding for non-negative values
    (mirrors the reference's pervasive ``round(x, 2)``,
    ``impala_query_sizing.py:203-206,220-227``)."""
    return F.floor(c * 100.0 + 0.5) / 100.0


ROUND2_SQL = "(floor(({x}) * 100.0 + 0.5) / 100.0)"


def round2_sql(x: str) -> str:
    """DuckDB-side twin of :func:`round2`."""
    return ROUND2_SQL.format(x=x)


def ceil_long(c: Column) -> Column:
    """``int(math.ceil(x))`` (``impala_query_sizing.py:72,236,241,...``) —
    Spark ``ceil`` already returns LongType; oracle side must
    ``CAST(ceil(x) AS BIGINT)`` since DuckDB's ceil returns DOUBLE."""
    return F.ceil(c).cast("long")


def ceil_long_sql(x: str) -> str:
    return f"CAST(ceil({x}) AS BIGINT)"
