"""Range-bucket t-shirt classification — SURVEY.md §2.E (E1/E2).

The reference's ``get_tsize`` (``impala_query_sizing.py:71-84``) ceils its
input and linearly scans a range-keyed dict. Here it is:

1. :func:`tsize_expr` — a ``when()`` chain: the default. Pure expression,
   evaluated inside whole-stage codegen, zero shuffle, zero join. This is
   the 100 TB path.
2. :func:`classify_range_join` — a broadcast non-equi range join against
   the ``size_buckets`` dimension. Catalyst picks
   BroadcastNestedLoopJoin; at 5 bucket rows that is one comparison chain
   per row, also scale-safe. Kept as the generic range-join operator (the
   reference's only "join", SURVEY §2.J) and property-tested equal to (1).

Faithful semantics: input is ceiled first (``:72``); values beyond the last
bucket (x > 999) fall off the dict scan and return ``None`` → NULL here.
The ``cache_gb`` bucket table is dead code in the reference (the
``ttype == 'cache'`` branch at ``:73-78`` is unreachable, SURVEY §2.E2) —
shipped in the dimension table, never used by the sizing pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import SIZE_BUCKET_ROWS, size_buckets


def _buckets(dim: str) -> list[tuple[int, int, str]]:
    return [(lo, hi, label) for d, lo, hi, label in SIZE_BUCKET_ROWS if d == dim]


def tsize_expr(c: Column, dim: str = "pods") -> Column:
    """``get_tsize`` as a native when-chain. ``c`` may be fractional; it is
    ceiled exactly like the reference (``impala_query_sizing.py:72``)."""
    x = F.ceil(c).cast("long")
    expr: Column | None = None
    for lo, hi, label in _buckets(dim):
        cond = (x >= lo) & (x <= hi)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return expr.otherwise(F.lit(None).cast("string"))


def tsize_case_sql(x: str, dim: str = "pods") -> str:
    """ANSI CASE form of :func:`tsize_expr` — valid in BOTH DuckDB
    (oracle side) and Spark SQL (``tsize_case_spark`` alias below)."""
    xe = f"CAST(ceil({x}) AS BIGINT)"
    whens = "\n    ".join(
        f"WHEN {xe} >= {lo} AND {xe} <= {hi} THEN '{label}'"
        for lo, hi, label in _buckets(dim)
    )
    return f"(CASE {whens} ELSE NULL END)"


tsize_case_spark = tsize_case_sql  # the CASE chain is dialect-portable


def classify(df: DataFrame) -> DataFrame:
    """Attach the five t-shirt labels the reference computes
    (``impala_query_sizing.py:252-259``): one per pod dimension plus the
    overall ``recommended_tsize`` (classified on the *pre-ceil* max, which
    ceils to the same bucket input)."""
    return df.withColumns(
        {
            "tsize_cache": tsize_expr(F.col("min_exec_pod_cache")),
            "tsize_mem": tsize_expr(F.col("min_exec_pod_mem")),
            "tsize_cpu": tsize_expr(F.col("min_exec_pod_cpu")),
            "tsize_spill": tsize_expr(F.col("min_exec_pod_spill")),
            "recommended_tsize": tsize_expr(F.col("min_executor_pod_raw")),
        }
    )


def classify_cte(source: str = "derived") -> str:
    """Oracle CTE mirroring :func:`classify`."""
    return f"""classified AS (
  SELECT *,
    {tsize_case_sql("min_exec_pod_cache")} AS tsize_cache,
    {tsize_case_sql("min_exec_pod_mem")} AS tsize_mem,
    {tsize_case_sql("min_exec_pod_cpu")} AS tsize_cpu,
    {tsize_case_sql("min_exec_pod_spill")} AS tsize_spill,
    {tsize_case_sql("min_executor_pod_raw")} AS recommended_tsize
  FROM {source}
)"""


def classify_range_join_melted(
    df: DataFrame, pairs: list[tuple[str, str]], dim: str = "pods"
) -> DataFrame:
    """Fourth equivalent form (r9 verdict residual nit): instead of one
    broadcast range join PER classified column (five sequential BNLJs in
    ``sizing_derive_rangejoin``), melt the five value columns into
    ``(seq, out_name, val)`` long form, run ONE broadcast range join
    against the bucket dim, and pivot back on ``seq``.

    Why it is NOT the primary: the five sequential BNLJs are
    shuffle-FREE pipelined broadcasts (each a 5-row dim scan per task),
    while the pivot-back here shuffles 5x the fact rows — and the
    when-chain form is pure expression (0 exchanges). At 100 TB
    zero-shuffle wins; this form exists to document the melt pattern
    and is pinned bit-equal to the other three by
    ``tests/test_classify.py::test_melted_range_join_equals_when_chain``.
    """
    # stack() needs one common type; the pod columns mix BIGINT (already
    # ceiled) and DOUBLE (the pre-ceil raw max) — DOUBLE holds both
    # exactly here (pods < 2^53) and ceil() lands on the same bucket
    stack_expr = "stack({n}, {args}) AS (out_name, val)".format(
        n=len(pairs),
        args=", ".join(f"'{out}', CAST({val} AS DOUBLE)" for val, out in pairs),
    )
    long = df.selectExpr("seq AS _seq", stack_expr)
    b = size_buckets(df.sparkSession, dim).select("lo", "hi", "label")
    x = F.ceil(F.col("val")).cast("long")
    joined = long.join(F.broadcast(b), (x >= b.lo) & (x <= b.hi), "left")
    # F.max, not F.first: if bucket ranges ever overlapped, first() would
    # be order-nondeterministic while max() stays deterministic by
    # construction (r10 ADVICE). With the disjoint shipped buckets each
    # group has at most one non-NULL label, so max == the single match.
    wide = (
        joined.groupBy("_seq")
        .pivot("out_name", [out for _, out in pairs])
        .agg(F.max("label"))
    )
    return df.join(wide, df["seq"] == wide["_seq"], "left").drop("_seq")


def classify_bucketizer(
    df: DataFrame, value_col: str, out_col: str = "label", dim: str = "pods"
) -> DataFrame:
    """Third equivalent form (SURVEY §2.E1 option 3): ``ml.feature
    .Bucketizer``. The buckets are contiguous after ceil, so right-open
    splits ``[lo0, lo1, …, hi_last+1]`` reproduce the dict scan; values
    past the last bucket keep the reference's ``None`` via the invalid
    bucket index."""
    from pyspark.ml.feature import Bucketizer

    buckets = _buckets(dim)
    splits = [float(lo) for lo, _, _ in buckets] + [buckets[-1][1] + 1.0, float("inf")]
    labels = [label for _, _, label in buckets]
    ceiled = df.withColumn("_ceiled", F.ceil(F.col(value_col)).cast("double"))
    bucketed = Bucketizer(
        splits=splits, inputCol="_ceiled", outputCol="_bucket",
        handleInvalid="keep",
    ).transform(ceiled)
    label_expr = F.element_at(
        F.lit(labels), (F.col("_bucket") + 1).cast("int")
    )  # the overflow split (last) indexes past the array → NULL
    return bucketed.withColumn(
        out_col,
        F.when(F.col("_bucket") < len(labels), label_expr),
    ).drop("_ceiled", "_bucket")


def classify_range_join(
    df: DataFrame, value_col: str, out_col: str = "label", dim: str = "pods"
) -> DataFrame:
    """Generic broadcast range-join classification: non-equi join of facts
    against the bucket dimension on ``lo <= ceil(x) <= hi``. Left join so
    out-of-range values keep the reference's ``None``."""
    b = size_buckets(df.sparkSession, dim).select("lo", "hi", "label")
    x = F.ceil(F.col(value_col)).cast("long")
    joined = df.join(
        F.broadcast(b), (x >= b.lo) & (x <= b.hi), "left"
    )
    return joined.drop("lo", "hi").withColumnRenamed("label", out_col)
