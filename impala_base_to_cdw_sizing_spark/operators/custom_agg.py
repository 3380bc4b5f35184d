"""Custom aggregates: the Arrow GROUPED_AGG Pandas-UDF path.

Spark has no public Python UDAF; the supported escape hatch is a
grouped-agg Pandas UDF — each group's column arrives as ONE Arrow-backed
``pd.Series`` and the UDF returns a scalar. That is the right shape for
order-statistics the built-ins don't expose with deterministic semantics
across engines.

Statistic choice matters for oracle parity: an interpolated median
(``(a+b)/2`` vs ``a+(b-a)*0.5``) differs in the last ulp between
engines, and a float *sum* inside the UDF would depend on Arrow batch
concatenation order. The LOWER median — sorted values, index
``(n-1)//2`` — is an actual element of the group, order-independent and
bit-exact; it equals DuckDB's ``quantile_disc(x, 0.5)`` (verified over
odd/even/singleton groups).

Scale: grouped-agg ships each whole group through Arrow to Python — fine
for bounded groups (per-type, per-tenant); for huge groups prefer the
two-phase built-ins. That trade-off is the documented contract here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def make_grouped_aggs():
    """Build the grouped-agg UDFs lazily: ``pandas_udf`` parses its DDL
    return type against the ACTIVE session at decoration time, so
    module-import-time decoration breaks any import that happens before
    a SparkSession exists (e.g. pytest collection)."""

    @pandas_udf("double")
    def lower_median(v: pd.Series) -> float:
        s = v.sort_values(ignore_index=True)
        return float(s.iloc[(len(s) - 1) // 2])

    @pandas_udf("long")
    def group_size(v: pd.Series) -> int:
        return int(len(v))

    return lower_median, group_size


def q_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type lower median of ``events.value`` via the grouped-agg
    Pandas UDF. Spark refuses to mix grouped-agg Pandas UDFs with
    built-in aggregates in one ``agg`` (INVALID_PANDAS_UDF_PLACEMENT),
    so the companion count is a second Pandas aggregate — both ride the
    same single shuffle."""
    from ..sources.files import load_events

    lower_median, group_size = make_grouped_aggs()
    ev = load_events(spark, sf_dir).select("event_type", "value")
    return ev.groupBy("event_type").agg(
        group_size("value").alias("n"),
        lower_median("value").alias("median_value"),
    )


SQL_GROUPED_MEDIAN = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
  quantile_disc(value, 0.5) AS median_value
FROM events GROUP BY event_type
"""


def register_all() -> None:
    from .queries_ext import register_extra

    register_extra("agg_grouped_median", q_grouped_median, SQL_GROUPED_MEDIAN)
