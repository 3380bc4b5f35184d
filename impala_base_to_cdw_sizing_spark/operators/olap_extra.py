"""Additional OLAP surface: pivot, cube, window-function suite, scalar
string/date functions, approximate aggregates (SURVEY.md §2.J breadth).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .aggregates import dsum, dsum_sql
from .queries_ext import register, register_extra
from ..sources.files import ROWS_PER_TASK_COLLAPSING, read_input

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_input(spark, sf_dir, name)


def _t_collapsing(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Reader for collapsing-aggregate consumers: the pipeline head is a
    partial aggregate that collapses rows before any exchange, so the
    scan is never fanned (see ``ROWS_PER_TASK_COLLAPSING``)."""
    return read_input(spark, sf_dir, name, ROWS_PER_TASK_COLLAPSING)


# --- pivot (G5's generic form) --------------------------------------------------


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """status × priority count matrix via ``groupBy().pivot()`` with an
    explicit value list (no extra distinct-scan job, stable columns)."""
    orders = _t(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
        .na.fill(0)
    )
    renames = {p: f"n_{p[0]}" for p in _PRIORITIES}  # n_1 … n_5
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    return out


SQL_PIVOT = """
SELECT o_orderstatus,
  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_1,
  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS n_2,
  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS n_3,
  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS n_4,
  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS n_5
FROM orders GROUP BY o_orderstatus
"""


# --- cube -------------------------------------------------------------------------


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE as a two-level cascade (r15, guide §2.3 "aggregate before
    you shuffle"): Catalyst plans ``cube`` as Expand(4 grouping sets) ×
    every input row — 4× the rows through the partial-aggregate hash —
    but (count, exact-decimal sum) are re-aggregable, so the base
    GROUP BY collapses the table to its ~|flag×status| cells FIRST and
    the Expand multiplies only those few rows. Bit-identical output:
    decimal re-summing is exact, the single double cast happens at the
    end, ``coalesce`` restores count's non-null type, and a
    data-NULL key contributes to exactly the same grouping-set rows
    from the cell frame as from the raw rows (measured identical at
    sf0.1; the same DuckDB oracle covers both). The grouping-sets twin
    (``rel_grouping_sets``, 3 sets over orders) measured FASTER in its
    single-pass Expand form — 0.50 vs 0.60 s — so it keeps that shape;
    the cascade pays off when the expansion factor and input size are
    both high."""
    from .aggregates import DEC

    # r15: collapsing consumer — the cell pre-agg IS the collapse, so
    # the scan is read unfanned (fan measured 0.97 vs 0.46 s unfanned)
    li = _t_collapsing(spark, sf_dir, "lineitem")
    cells = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("_n"),
        F.sum(F.col("l_quantity").cast(DEC)).alias("_s"),
    )
    return cells.cube("l_returnflag", "l_linestatus").agg(
        F.coalesce(F.sum("_n"), F.lit(0).cast("long")).alias("n"),
        F.sum("_s").cast("double").alias("sum_qty"),
    )


SQL_CUBE = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
  {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


# --- window-function suite -----------------------------------------------------------


def q_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / lag / lead / running sum over one ordered
    partition spec (single shuffle, all functions share the sort)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 3)
    order = [F.col("l_shipdate").asc(), F.col("l_orderkey").asc(),
             F.col("l_linenumber").asc()]
    w = Window.partitionBy("l_suppkey").orderBy(*order)
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank()
        .over(Window.partitionBy("l_suppkey").orderBy("l_quantity"))
        .cast("long")
        .alias("qty_rank"),
        F.dense_rank()
        .over(Window.partitionBy("l_suppkey").orderBy("l_quantity"))
        .cast("long")
        .alias("qty_dense_rank"),
        F.lag("l_orderkey").over(w).alias("prev_orderkey"),
        F.lead("l_orderkey").over(w).alias("next_orderkey"),
        F.sum(F.col("l_quantity").cast("decimal(38,6)"))
        .over(wsum)
        .cast("double")
        .alias("running_qty"),
    )


SQL_WINDOW_SUITE = """
SELECT l_suppkey, l_orderkey, l_linenumber,
  ROW_NUMBER() OVER w AS rn,
  RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity) AS qty_rank,
  DENSE_RANK() OVER (PARTITION BY l_suppkey ORDER BY l_quantity) AS qty_dense_rank,
  LAG(l_orderkey) OVER w AS prev_orderkey,
  LEAD(l_orderkey) OVER w AS next_orderkey,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6)))
       OVER (PARTITION BY l_suppkey
             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty
FROM lineitem
WHERE l_suppkey <= 3
WINDOW w AS (PARTITION BY l_suppkey
             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC)
"""


# --- scalar string/date function coverage ----------------------------------------------


def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar functions the reference actually uses (SURVEY §2.J last
    row): substring, lpad/rjust, concat, upper/lower, regexp_replace,
    date parts via epoch arithmetic, greatest/least, base64 round-trip."""
    cust = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("padded_key"),
        F.concat_ws("|", "c_mktsegment", F.col("c_nationkey").cast("string")).alias(
            "seg_nation"
        ),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.greatest(F.col("c_acctbal"), F.lit(0.0)).alias("bal_floor0"),
        F.least(F.col("c_acctbal"), F.lit(5000.0)).alias("bal_cap"),
        F.length("c_name").cast("long").alias("name_len"),
        # A2's secret decode as an in-plan expression: encode → base64 →
        # unbase64 → utf-8 (impala_query_sizing.py:95-96 twin)
        F.base64(F.encode("c_name", "UTF-8")).alias("name_b64"),
        F.decode(F.unbase64(F.base64(F.encode("c_name", "UTF-8"))), "UTF-8").alias(
            "name_roundtrip"
        ),
    )


SQL_SCALAR_FUNCS = """
SELECT c_custkey,
  substring(c_name, 1, 8) AS name_prefix,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS padded_key,
  c_mktsegment || '|' || CAST(c_nationkey AS VARCHAR) AS seg_nation,
  upper(c_mktsegment) AS seg_upper,
  lower(c_name) AS name_lower,
  regexp_replace(c_name, '[0-9]+', '#', 'g') AS name_masked,
  greatest(c_acctbal, CAST(0.0 AS DOUBLE)) AS bal_floor0,
  least(c_acctbal, CAST(5000.0 AS DOUBLE)) AS bal_cap,
  length(c_name) AS name_len,
  base64(encode(c_name)) AS name_b64,
  CAST(from_base64(base64(encode(c_name))) AS VARCHAR) AS name_roundtrip
FROM customer
"""


# --- approximate aggregates (rows-only: approx ≠ oracle-hashable) ------------------------


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct + approximate quantiles, made oracle-checkable: the
    exact distinct counts are compared value-for-value against DuckDB,
    and the sketch estimates are pinned as within-tolerance booleans
    (HLL++ and KLL are deterministic for a fixed dataset, so the flags
    are stable across runs/partitionings — the oracle asserts literal 1).
    The previous rows-only form hid the estimates from the gate entirely.

    Plan note: TWO different COUNT(DISTINCT) columns plus non-distinct
    aggregates in ONE agg forces Catalyst's Expand (every input row
    replicated once per distinct group — 3× the data through the shuffle)
    and pushes the whole mix into a single object-hash aggregate with the
    exact-percentile buffer. Splitting into three single-purpose 1-row
    aggregates (each a plain two-phase partial agg over a pruned
    single-column scan) and cross-joining the 1-row results measured
    22.8 s → 4.4 s at sf0.1 — and at 100 TB the Expand would have tripled
    shuffle volume, so the split is the scale plan, not a micro-opt."""
    # r15: the two COUNT DISTINCT subtrees are collapsing consumers —
    # their partial-distinct stage collapses raw rows before the first
    # exchange, so the fan-out exchange only moved 600 k raw keys the
    # partial agg was about to fold (measured 2.0 → 1.1 s per agg).
    # The exact-percentile agg keeps the fanned read: it buffers every
    # value (heavy per row), and fan measurably helps it (1.9 vs 2.3).
    li_keys = _t_collapsing(spark, sf_dir, "lineitem")
    li = _t(spark, sf_dir, "lineitem")
    parts = li_keys.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", 0.02).alias("_approx_parts"),
    )
    orders = li_keys.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("_approx_orders"),
    )
    medians = li.agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("_approx_median"),
        F.expr("percentile(l_extendedprice, CAST(0.5 AS DOUBLE))").alias(
            "_exact_median"
        ),
    )
    return parts.crossJoin(orders).crossJoin(medians).selectExpr(
        "exact_parts",
        "exact_orders",
        "CAST(abs(_approx_parts - exact_parts) <= 0.05 * exact_parts AS BIGINT)"
        " AS parts_within_5pct",
        "CAST(abs(_approx_orders - exact_orders) <= 0.05 * exact_orders AS BIGINT)"
        " AS orders_within_5pct",
        "CAST(abs(_approx_median - _exact_median) <= 0.02 * _exact_median AS BIGINT)"
        " AS median_within_2pct",
    )


SQL_APPROX_DISTINCT = """
SELECT COUNT(DISTINCT l_partkey) AS exact_parts,
  COUNT(DISTINCT l_orderkey) AS exact_orders,
  CAST(1 AS BIGINT) AS parts_within_5pct,
  CAST(1 AS BIGINT) AS orders_within_5pct,
  CAST(1 AS BIGINT) AS median_within_2pct
FROM lineitem
"""


# --- explicit grouping sets -----------------------------------------------------


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS ((status), (priority), ()) — the general form that
    rollup/cube specialize. Declared via parameterized Spark SQL (Catalyst
    plans SQL and DataFrame identically; the DataFrame API has no
    grouping-sets verb). The DataFrame is bound as a parameter — no named
    temp view, no shared-catalog side effects."""
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
          {dsum_sql('o_totalprice')} AS sum_total
        FROM {{orders}}
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
        orders=_t(spark, sf_dir, "orders"),
    )


SQL_GROUPING_SETS = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
  {dsum_sql('o_totalprice')} AS sum_total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- exact percentiles ------------------------------------------------------------


def q_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles per group. (The sorted
    per-group pass is the expensive exact form; ``percentile_approx`` in
    rel_approx_distinct is the sketch-based scale path.)

    Float note (r10): Spark's ``percentile`` interpolates as
    ``(hi_i - pos)*lo + (pos - lo_i)*hi`` while DuckDB's
    ``quantile_cont`` computes ``lo + (hi - lo)*frac`` — algebraically
    identical, rounded differently (measured 1 ulp apart on p99 at
    skewed sf0.01). The oracle therefore spells out Spark's exact
    formula over ranked rows instead of calling ``quantile_cont``;
    every input to the two multiplies is the identical double in both
    engines, so the products and sum are bit-equal."""
    li = _t(spark, sf_dir, "lineitem")
    # one percentile(array(...)) call: the exact aggregator buffers each
    # group's values once for all four cut points, not once per point
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.expr(
                "percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.99D))"
            ).alias("ps"),
        )
        .select(
            "l_returnflag", "n",
            F.col("ps")[0].alias("p25"), F.col("ps")[1].alias("p50"),
            F.col("ps")[2].alias("p75"), F.col("ps")[3].alias("p99"),
        )
    )


SQL_EXACT_PERCENTILES = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice AS v,
    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
cuts AS (
  SELECT g.l_returnflag, g.n, p.p,
    p.p * CAST(g.n - 1 AS DOUBLE) AS pos,
    CAST(floor(p.p * CAST(g.n - 1 AS DOUBLE)) AS BIGINT) AS lo_i,
    CAST(ceil(p.p * CAST(g.n - 1 AS DOUBLE)) AS BIGINT) AS hi_i
  FROM (SELECT DISTINCT l_returnflag, n FROM ranked) g
  CROSS JOIN (SELECT CAST(UNNEST([0.25, 0.5, 0.75, 0.99]) AS DOUBLE) AS p) p
),
interp AS (
  -- Spark Percentile.getPercentile: returns the key WITHOUT interpolating
  -- when the two bracketing keys are equal (duplicate-heavy data hits
  -- this constantly), else (hi_i - pos)*lo + (pos - lo_i)*hi
  SELECT c.l_returnflag, c.n, c.p,
    CASE WHEN c.lo_i = c.hi_i OR lo.v = hi.v THEN lo.v
         ELSE (CAST(c.hi_i AS DOUBLE) - c.pos) * lo.v
            + (c.pos - CAST(c.lo_i AS DOUBLE)) * hi.v END AS val
  FROM cuts c
  JOIN ranked lo ON lo.l_returnflag = c.l_returnflag AND lo.rn = c.lo_i + 1
  JOIN ranked hi ON hi.l_returnflag = c.l_returnflag AND hi.rn = c.hi_i + 1
)
SELECT l_returnflag, any_value(n) AS n,
  MAX(CASE WHEN p = 0.25 THEN val END) AS p25,
  MAX(CASE WHEN p = 0.5  THEN val END) AS p50,
  MAX(CASE WHEN p = 0.75 THEN val END) AS p75,
  MAX(CASE WHEN p = 0.99 THEN val END) AS p99
FROM interp GROUP BY l_returnflag
"""


# --- window navigation functions ----------------------------------------------------


def q_window_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value, ntile, percent_rank, cume_dist over one
    deterministic partition order."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 2)
    w = Window.partitionBy("l_suppkey").orderBy(
        F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.first("l_orderkey").over(wfull).alias("first_ok"),
        F.last("l_orderkey").over(wfull).alias("last_ok"),
        F.nth_value("l_orderkey", 3).over(wfull).alias("third_ok"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


SQL_WINDOW_NAVIGATION = """
SELECT l_suppkey, l_orderkey, l_linenumber,
  FIRST_VALUE(l_orderkey) OVER wf AS first_ok,
  LAST_VALUE(l_orderkey) OVER wf AS last_ok,
  NTH_VALUE(l_orderkey, 3) OVER wf AS third_ok,
  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
  PERCENT_RANK() OVER w AS pct_rank,
  CUME_DIST() OVER w AS cume
FROM lineitem
WHERE l_suppkey <= 2
WINDOW
  w AS (PARTITION BY l_suppkey ORDER BY l_orderkey ASC, l_linenumber ASC),
  wf AS (PARTITION BY l_suppkey ORDER BY l_orderkey ASC, l_linenumber ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


# --- ordered array aggregation ---------------------------------------------------------


def q_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list + sort + join — emitted as a delimited string so the
    array content is hash-comparable across engines."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.array_join(
            F.sort_array(F.collect_set("l_linestatus")), ","
        ).alias("statuses"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_set("l_suppkey")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("suppliers"),
    )


SQL_ARRAY_AGG = """
SELECT l_returnflag,
  array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
  array_to_string(
    list_transform(list_sort(list(DISTINCT l_suppkey)), x -> CAST(x AS VARCHAR)),
    ',') AS suppliers
FROM lineitem GROUP BY l_returnflag
"""


# --- correlated scalar subquery ----------------------------------------------------


def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers above their segment's average balance — correlated scalar
    subquery form (Catalyst decorrelates it into the same aggregate+join
    plan a manual rewrite produces)."""
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment, c_acctbal
        FROM {c} outer_c
        WHERE c_acctbal > (
          -- decimal-sum average: order-independent, engine-identical
          SELECT CAST(SUM(CAST(i.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*)
          FROM {c} i
          WHERE i.c_mktsegment = outer_c.c_mktsegment
        )
        """,
        c=_t(spark, sf_dir, "customer"),
    )


SQL_CORRELATED = """
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer outer_c
WHERE c_acctbal > (
  SELECT CAST(CAST(SUM(CAST(i.c_acctbal AS DECIMAL(38,6))) AS STRING) AS DOUBLE) / COUNT(*)
  FROM customer i
  WHERE i.c_mktsegment = outer_c.c_mktsegment
)
"""


# --- RANGE window frame (value-range sliding aggregate) --------------------------

_30D_MS = 30 * 86_400_000


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day per-customer order stats via a RANGE frame — the
    frame boundary is a VALUE offset on the ordering column, not a row
    count, so ties (same-day orders) are all peers of each other and the
    result is deterministic without a tiebreak. The rolling sum runs in
    DECIMAL so frame-internal addition order can't produce float drift
    against the oracle."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
            "orderdate_ms"
        ),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("orderdate_ms")
        .rangeBetween(-_30D_MS, 0)
    )
    return orders.select(
        "o_custkey", "o_orderkey", "orderdate_ms",
        F.count("*").over(w).alias("n_orders_30d"),
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


SQL_WINDOW_RANGE_FRAME = f"""
SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS orderdate_ms,
  COUNT(*) OVER w AS n_orders_30d,
  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER w AS STRING) AS DOUBLE) AS spend_30d
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch_ms(o_orderdate)
  RANGE BETWEEN {_30D_MS} PRECEDING AND CURRENT ROW)
"""


# --- upsert / snapshot merge (SCD apply without a table format) -------------------


def q_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a change batch (upserts + deletes) to a snapshot — the MERGE
    INTO shape, expressed as a full outer join + per-row resolution so it
    needs no transactional table format. Derived deterministically from
    ``orders``: base = keys not ≡0 (mod 3); changes = keys ≡0 (mod 2)
    with a 10% price bump, of which keys ≡0 (mod 7) are deletes. At
    scale this is one co-partitioned shuffle join on the merge key (or
    zero shuffles off bucketed tables — tests/test_bucketing.py)."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    changes = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("new_price"),
        (F.col("o_orderkey") % 7 == 0).alias("is_delete"),
    )
    merged = base.alias("b").join(
        changes.alias("c"), "o_orderkey", "full_outer"
    )
    return (
        merged.filter(~F.coalesce("is_delete", F.lit(False)))
        .select(
            "o_orderkey",
            F.coalesce("new_price", F.col("o_totalprice")).alias("price"),
            F.when(
                F.col("new_price").isNotNull()
                & F.col("o_totalprice").isNotNull(),
                "updated",
            )
            .when(F.col("new_price").isNotNull(), "inserted")
            .otherwise("unchanged")
            .alias("row_state"),
        )
    )


SQL_UPSERT_SNAPSHOT = """
WITH base AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <> 0
),
changes AS (
  SELECT o_orderkey, o_totalprice * 1.1 AS new_price,
    (o_orderkey % 7 = 0) AS is_delete
  FROM orders WHERE o_orderkey % 2 = 0
)
SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
  COALESCE(c.new_price, b.o_totalprice) AS price,
  CASE WHEN c.new_price IS NOT NULL AND b.o_totalprice IS NOT NULL THEN 'updated'
       WHEN c.new_price IS NOT NULL THEN 'inserted'
       ELSE 'unchanged' END AS row_state
FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
WHERE NOT COALESCE(c.is_delete, FALSE)
"""


# --- row provenance via metadata columns ----------------------------------------


def q_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level provenance without a lineage system: every scan exposes
    its source file through the hidden ``_metadata`` struct (DuckDB:
    ``filename=true``), so per-file row accounting — the audit a
    quarantine/backfill pipeline starts from — is a plain aggregation.
    The multi-file case (per-file counts over a partitioned write) is
    exercised in tests/test_catalog_formats.py; this registered form
    audits three tables in one union."""
    parts = []
    for name in ("lineitem", "orders", "customer"):
        parts.append(
            _t(spark, sf_dir, name)
            .select(F.col("_metadata.file_name").alias("file_name"))
            .groupBy("file_name")
            .agg(F.count("*").alias("n_rows"))
            .withColumn("table_name", F.lit(name))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("table_name", "file_name", "n_rows")


def _provenance_sql() -> str:
    # The comparator's pre-registered views hide the source path, so the
    # oracle pins the fixture layout's known single file per table
    # (<table>.parquet) and verifies the counts — the Spark side is the
    # one genuinely reading the hidden ``_metadata`` column, which is
    # the behavior under test.
    blocks = " UNION ALL ".join(
        f"""
  SELECT '{name}' AS table_name, '{name}.parquet' AS file_name,
    COUNT(*) AS n_rows
  FROM {name}"""
        for name in ("lineitem", "orders", "customer")
    )
    return f"SELECT * FROM ({blocks})"


# --- mergeable distinct-count sketches (HLL rollup) ------------------------------


def q_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pattern that makes distinct counts SCALE: per-day HLL sketches
    (``hll_sketch_agg``, Apache DataSketches) merged across days with
    ``hll_union_agg`` — a re-aggregable distinct, unlike a raw
    COUNT(DISTINCT) which cannot roll up (``sum_daily_exact`` in the
    output deliberately shows the double-counting a naive daily-sum
    commits; the sketch merge does not). At 100 TB the daily sketches are
    a few KB per (day, type) — the rollup reads sketches, never re-scans
    events.

    Oracle-checkable the same way as ``rel_approx_distinct``: exact
    distincts are value-matched, and the merged-sketch estimate is pinned
    as a within-2% boolean (DataSketches HLL is insertion-order
    independent, so the flag is deterministic for a fixed dataset)."""
    from ..sources.files import load_events

    ev = load_events(spark, sf_dir).selectExpr(
        "event_type", "user_id", "(ts div 1000000000) div 86400 AS day"
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("sk"),
        F.countDistinct("user_id").alias("daily_exact"),
    )
    rolled = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("_merged_est"),
        F.sum("daily_exact").alias("sum_daily_exact"),
        F.count("*").alias("n_days"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return rolled.join(exact, "event_type").selectExpr(
        "event_type", "exact_users", "sum_daily_exact", "n_days",
        "CAST(abs(_merged_est - exact_users) <= 0.02 * exact_users AS BIGINT)"
        " AS merged_within_2pct",
        # the lesson in one column: naive daily-sum double-counts
        "CAST(sum_daily_exact >= exact_users AS BIGINT) AS daily_sum_overcounts",
    )


SQL_HLL_ROLLUP = """
WITH ev AS (
  SELECT event_type, user_id, (epoch_ns(ts) // 1000000000) // 86400 AS day
  FROM events
),
daily AS (
  SELECT event_type, day, COUNT(DISTINCT user_id) AS daily_exact
  FROM ev GROUP BY 1, 2
),
rolled AS (
  SELECT event_type, CAST(SUM(daily_exact) AS BIGINT) AS sum_daily_exact,
    COUNT(*) AS n_days
  FROM daily GROUP BY 1
)
SELECT e.event_type, e.exact_users, r.sum_daily_exact, r.n_days,
  CAST(1 AS BIGINT) AS merged_within_2pct,
  CAST(r.sum_daily_exact >= e.exact_users AS BIGINT) AS daily_sum_overcounts
FROM (SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
      FROM ev GROUP BY 1) e
JOIN rolled r USING (event_type)
"""


# --- mergeable quantile rollup (equi-width histogram) ------------------------------

_QHIST_BINS = 32


def q_histogram_rollup_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile counterpart of ``rel_hll_rollup``: exact percentiles
    cannot roll up (a global sort re-reads everything), so each day keeps
    a ``_QHIST_BINS``-bin equi-width histogram of ``value`` and the
    rollup MERGES histograms by summing bin counts — sketches are read,
    events are re-scanned never. The median estimate from the merged
    histogram (upper edge of the bin where cumulative mass crosses 1/2)
    is then compared against the true lower median; the estimate's error
    is mathematically < one bin width, emitted as the always-true
    ``err_lt_width`` witness column.

    Everything runs in integer micro-units (value quantized once,
    bin = (v - vmin) DIV width with width an integer), so the estimate,
    the exact median, and the error bound are bit-identical across
    engines — no tolerance anywhere."""
    from ..sources.files import load_events

    ev = load_events(spark, sf_dir).selectExpr(
        "event_type",
        "(ts div 1000000000) div 86400 AS day",
        "CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v",
    )
    stats = ev.groupBy("event_type").agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.count("*").alias("n"),
    )
    binned = ev.join(F.broadcast(stats), "event_type").selectExpr(
        "event_type", "day", "n", "vmin",
        f"(vmax - vmin) DIV {_QHIST_BINS} + 1 AS width",
        f"(v - vmin) DIV ((vmax - vmin) DIV {_QHIST_BINS} + 1) AS bin",
    )
    daily = binned.groupBy(
        "event_type", "day", "bin", "n", "vmin", "width"
    ).agg(F.count("*").alias("cnt"))
    rolled = daily.groupBy("event_type", "bin", "n", "vmin", "width").agg(
        F.sum("cnt").alias("cnt")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    est = (
        rolled.withColumn("cum", F.sum("cnt").over(wcum))
        .filter(F.col("cum") * 2 >= F.col("n"))
        .groupBy("event_type", "n", "vmin", "width")
        .agg(F.min("bin").alias("med_bin"))
        .selectExpr(
            "event_type", "n", "width",
            "vmin + (med_bin + 1) * width - 1 AS est_p50_micro",
        )
    )
    wmed = Window.partitionBy("event_type").orderBy("v", "day")
    exact = (
        ev.withColumn("rn", F.row_number().over(wmed))
        .join(F.broadcast(stats.select("event_type", "n")), "event_type")
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .groupBy("event_type")
        .agg(F.min("v").alias("exact_p50_micro"))
    )
    return est.join(exact, "event_type").selectExpr(
        "event_type", "n", "est_p50_micro", "exact_p50_micro",
        "abs(est_p50_micro - exact_p50_micro) < width AS err_lt_width",
    )


SQL_HISTOGRAM_ROLLUP = f"""
WITH ev AS (
  SELECT event_type, (epoch_ns(ts) // 1000000000) // 86400 AS day,
    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
  FROM events
),
stats AS (
  SELECT event_type, MIN(v) AS vmin, MAX(v) AS vmax,
    CAST(COUNT(*) AS BIGINT) AS n
  FROM ev GROUP BY 1
),
binned AS (
  SELECT e.event_type, e.day, s.n, s.vmin,
    (s.vmax - s.vmin) // {_QHIST_BINS} + 1 AS width,
    (e.v - s.vmin) // ((s.vmax - s.vmin) // {_QHIST_BINS} + 1) AS bin
  FROM ev e JOIN stats s USING (event_type)
),
daily AS (
  SELECT event_type, day, bin, n, vmin, width, COUNT(*) AS cnt
  FROM binned GROUP BY 1, 2, 3, 4, 5, 6
),
rolled AS (
  SELECT event_type, bin, n, vmin, width, CAST(SUM(cnt) AS BIGINT) AS cnt
  FROM daily GROUP BY 1, 2, 3, 4, 5
),
est AS (
  SELECT event_type, n, width,
    vmin + (MIN(bin) + 1) * width - 1 AS est_p50_micro
  FROM (
    SELECT *, SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM rolled
  ) WHERE cum * 2 >= n
  GROUP BY event_type, n, vmin, width
),
exact AS (
  SELECT event_type, MIN(v) AS exact_p50_micro FROM (
    SELECT e.event_type, e.v, s.n,
      ROW_NUMBER() OVER (PARTITION BY e.event_type ORDER BY e.v, e.day) AS rn
    FROM ev e JOIN stats s USING (event_type)
  ) WHERE rn = (n + 1) // 2
  GROUP BY event_type
)
SELECT e.event_type, e.n, e.est_p50_micro, x.exact_p50_micro,
  abs(e.est_p50_micro - x.exact_p50_micro) < e.width AS err_lt_width
FROM est e JOIN exact x USING (event_type)
"""


# --- calendar semantics -----------------------------------------------------------


def q_calendar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar arithmetic where engine conventions genuinely differ,
    aligned explicitly (UTC session pinned in session.py):

    - ISO day-of-week: Spark ``dayofweek`` is 1=Sunday, DuckDB ``dow``
      is 0=Sunday — both normalize to ISO 1=Monday..7=Sunday;
    - ISO week number (both engines implement ISO-8601 here);
    - month-end clamping: +1 month from Jan 31 must land on the last
      day of February in BOTH engines (Spark ``add_months``, DuckDB
      ``date + INTERVAL``);
    - ``date_trunc`` to month, surfaced as exact epoch millis.

    Aggregated per (year, quarter) so the output is a small stable
    frame while every order's date flows through the expressions."""
    orders = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderkey",
        "CAST(o_orderdate AS DATE) AS d",
    )
    per_day = orders.selectExpr(
        "CAST(year(d) AS BIGINT) AS yr",
        "CAST(quarter(d) AS BIGINT) AS qtr",
        "((dayofweek(d) + 5) % 7) + 1 AS iso_dow",
        "weekofyear(d) AS iso_week",
        "unix_millis(CAST(date_trunc('month', d) AS TIMESTAMP)) AS month_start_ms",
        "CAST(day(add_months(d, 1)) AS BIGINT) AS day_next_month",
    )
    return per_day.groupBy("yr", "qtr").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("iso_dow").alias("sum_iso_dow"),
        F.sum("iso_week").alias("sum_iso_week"),
        F.min("month_start_ms").alias("first_month_ms"),
        F.max("month_start_ms").alias("last_month_ms"),
        F.sum("day_next_month").alias("sum_day_next_month"),
    )


SQL_CALENDAR_FUNCS = """
WITH per_day AS (
  SELECT
    CAST(year(d) AS BIGINT) AS yr,
    CAST(quarter(d) AS BIGINT) AS qtr,
    CAST(isodow(d) AS BIGINT) AS iso_dow,
    CAST(weekofyear(d) AS BIGINT) AS iso_week,
    epoch_ms(CAST(date_trunc('month', d) AS TIMESTAMP)) AS month_start_ms,
    CAST(day(d + INTERVAL 1 MONTH) AS BIGINT) AS day_next_month
  FROM (SELECT CAST(o_orderdate AS DATE) AS d FROM orders)
)
SELECT yr, qtr, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(iso_dow) AS BIGINT) AS sum_iso_dow,
  CAST(SUM(iso_week) AS BIGINT) AS sum_iso_week,
  MIN(month_start_ms) AS first_month_ms,
  MAX(month_start_ms) AS last_month_ms,
  CAST(SUM(day_next_month) AS BIGINT) AS sum_day_next_month
FROM per_day
GROUP BY yr, qtr
"""


# --- NULL semantics ---------------------------------------------------------------


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling contract over a deterministically nulled column —
    the fixtures carry no NULLs, so every other query's null paths are
    structurally dead; this one makes them live. ``o_custkey % 7 == 3``
    rows get a NULL price via NULLIF, then per order-priority:

    - COUNT(*) vs COUNT(col) (nulls counted vs skipped),
    - SUM/MIN ignoring NULLs (and their behavior on all-present groups),
    - COALESCE fallback totals,
    - null-SAFE equality counts (Spark ``<=>`` ≡ DuckDB
      ``IS NOT DISTINCT FROM``) against a second nullable column —
      the operator pair whose agreement is worth proving, since plain
      ``=`` returns NULL and silently drops rows from a filter."""
    orders = _t(spark, sf_dir, "orders").selectExpr(
        "o_orderpriority",
        "CASE WHEN o_custkey % 7 = 3 THEN CAST(NULL AS DOUBLE)"
        " ELSE o_totalprice END AS price",
        "CASE WHEN o_custkey % 11 = 3 THEN CAST(NULL AS DOUBLE)"
        " ELSE o_totalprice END AS price2",
    )
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.count("price").cast("long").alias("n_present"),
        dsum(F.col("price")).alias("sum_present"),
        F.min("price").alias("min_present"),
        dsum(F.coalesce("price", F.lit(0.0))).alias("sum_coalesced"),
        F.sum(F.col("price").eqNullSafe(F.col("price2")).cast("long")).alias(
            "n_nullsafe_eq"
        ),
        F.sum((F.col("price") == F.col("price2")).cast("long")).alias(
            "n_plain_eq"  # NULL comparisons fall out of the sum entirely
        ),
    )


SQL_NULL_SEMANTICS = f"""
WITH o AS (
  SELECT o_orderpriority,
    CASE WHEN o_custkey % 7 = 3 THEN CAST(NULL AS DOUBLE)
         ELSE o_totalprice END AS price,
    CASE WHEN o_custkey % 11 = 3 THEN CAST(NULL AS DOUBLE)
         ELSE o_totalprice END AS price2
  FROM orders
)
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(COUNT(price) AS BIGINT) AS n_present,
  {dsum_sql('price')} AS sum_present,
  MIN(price) AS min_present,
  {dsum_sql('COALESCE(price, 0.0)')} AS sum_coalesced,
  CAST(SUM(CASE WHEN price IS NOT DISTINCT FROM price2 THEN 1 ELSE 0 END)
    AS BIGINT) AS n_nullsafe_eq,
  CAST(SUM(CASE WHEN price = price2 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_plain_eq
FROM o
GROUP BY o_orderpriority
"""


# --- incremental aggregate maintenance ---------------------------------------------

# snapshot/delta cut: events strictly before 2024-01-21 UTC are the
# "already rolled up" history, the rest is the newly-arrived partition
_INC_CUT_NS = 1_705_795_200_000_000_000

# null-safe two-sided min/max merge — written once, used verbatim in
# both dialects (Spark's least() skips NULLs but DuckDB's returns NULL,
# so the explicit CASE is the portable form)
_MERGE_MIN = (
    "CASE WHEN {a} IS NULL THEN {b} WHEN {b} IS NULL THEN {a}"
    " ELSE least({a}, {b}) END"
)
_MERGE_MAX = (
    "CASE WHEN {a} IS NULL THEN {b} WHEN {b} IS NULL THEN {a}"
    " ELSE greatest({a}, {b}) END"
)


def q_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance — the algebraic-merge contract a
    100 TB warehouse depends on, as a query with its own proof.

    History (events before the cut) is aggregated once; the new
    partition is aggregated alone; the published rollup is the MERGE of
    the two states (counts add, decimal sums add exactly, min/max
    combine null-safely) — history is never rescanned. The operator
    emits the merged rollup per event_type PLUS a ``consistent``
    witness comparing every merged figure against a full recompute, so
    the mergeability claim is checked row-by-row in both engines, not
    asserted. Decimal sums merge BEFORE the double conversion: merging
    after (double + double of per-part sums) is where real pipelines
    silently drift from their recompute.

    Scale: three partial-agg passes over disjoint slices (the recompute
    pass exists only for the witness; production drops it), merge join
    on the group key, event_type cardinality rows out."""
    from ..sources.files import load_events

    e = load_events(spark, sf_dir)
    DEC = "decimal(38,6)"

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").cast("long").alias(f"n_{tag}"),
            F.sum(F.col("value").cast(DEC)).alias(f"sum_{tag}"),
            F.min("value").alias(f"min_{tag}"),
            F.max("value").alias(f"max_{tag}"),
        )
    snap = agg(e.filter(F.col("ts") < _INC_CUT_NS), "s")
    delta = agg(e.filter(F.col("ts") >= _INC_CUT_NS), "d")
    full = agg(e, "f")
    merged = (
        snap.join(delta, "event_type", "full_outer")
        .selectExpr(
            "event_type",
            "coalesce(n_s, 0) + coalesce(n_d, 0) AS n",
            f"CAST(coalesce(sum_s, CAST(0 AS {DEC}))"
            f" + coalesce(sum_d, CAST(0 AS {DEC})) AS {DEC}) AS sum_dec",
            _MERGE_MIN.format(a="min_s", b="min_d") + " AS min_v",
            _MERGE_MAX.format(a="max_s", b="max_d") + " AS max_v",
        )
    )
    return (
        merged.join(full, "event_type")
        .selectExpr(
            "event_type", "n",
            "CAST(sum_dec AS DOUBLE) AS sum_value",
            "min_v", "max_v",
            "CAST(n = n_f AND sum_dec = sum_f AND min_v = min_f"
            " AND max_v = max_f AS BIGINT) AS consistent",
        )
        .orderBy("event_type")
    )


def _sql_incremental_rollup() -> str:
    from .aggregates import dec_to_double_sql

    mmin = _MERGE_MIN.format(a="min_s", b="min_d")
    mmax = _MERGE_MAX.format(a="max_s", b="max_d")
    return f"""
WITH e AS (SELECT event_type, epoch_ns(ts) AS ts, value FROM events),
snap AS (
  SELECT event_type, COUNT(*) AS n_s,
    SUM(CAST(value AS DECIMAL(38,6))) AS sum_s,
    MIN(value) AS min_s, MAX(value) AS max_s
  FROM e WHERE ts < {_INC_CUT_NS} GROUP BY 1
),
delta AS (
  SELECT event_type, COUNT(*) AS n_d,
    SUM(CAST(value AS DECIMAL(38,6))) AS sum_d,
    MIN(value) AS min_d, MAX(value) AS max_d
  FROM e WHERE ts >= {_INC_CUT_NS} GROUP BY 1
),
full_agg AS (
  SELECT event_type, COUNT(*) AS n_f,
    SUM(CAST(value AS DECIMAL(38,6))) AS sum_f,
    MIN(value) AS min_f, MAX(value) AS max_f
  FROM e GROUP BY 1
),
merged AS (
  SELECT coalesce(s.event_type, d.event_type) AS event_type,
    coalesce(n_s, 0) + coalesce(n_d, 0) AS n,
    CAST(coalesce(sum_s, CAST(0 AS DECIMAL(38,6)))
      + coalesce(sum_d, CAST(0 AS DECIMAL(38,6))) AS DECIMAL(38,6))
      AS sum_dec,
    {mmin} AS min_v, {mmax} AS max_v
  FROM snap s FULL OUTER JOIN delta d ON s.event_type = d.event_type
)
SELECT event_type, n, {dec_to_double_sql('sum_dec')} AS sum_value,
  min_v, max_v,
  CAST(n = n_f AND sum_dec = sum_f AND min_v = min_f
    AND max_v = max_f AS BIGINT) AS consistent
FROM merged JOIN full_agg USING (event_type)
ORDER BY event_type
"""


# --- distribution drift (population stability index) -------------------------------

_PSI_BINS = 10
_PSI_BIN_W = 50.0  # value in [0, ~500] → floor(value/50) clamped to 0..9
# industry-standard PSI bands: <0.1 stable, 0.1-0.25 moderate, >0.25 major
_PSI_BAND = (
    "CASE WHEN psi < 0.1 THEN 'stable' "
    "WHEN psi <= 0.25 THEN 'moderate' ELSE 'major' END"
)


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: PSI of the ``value`` distribution per
    event_type between the reference window (events before the
    incremental-rollup cut) and the current window — the number an
    ingest pipeline alarms on before a silent upstream change poisons
    training data. PSI = sum_b (c_b - r_b)(ln c_b - ln r_b) over binned
    shares, add-one smoothed on a DENSE type x bin grid so empty bins
    are defined in both windows.

    Portability is the DSIR construction end-to-end: each bin's
    ``ln((c'*R')/(r'*C'))`` is a ln of an exact BIGINT-product ratio
    through the shared sqrt/atanh deterministic ln, each term quantized
    to integer nano-units BEFORE the per-type sum (order-independent),
    one double division at the end. Scale: two partial-agg passes over
    disjoint slices, a #types x #bins grid (tiny, broadcast-joined),
    output one row per type."""
    from ..sources.files import load_events

    # r15: collapsing consumer — both windows' counts() collapse to the
    # tiny #types x #bins grid at their first partial agg, so the scan
    # is read unfanned (measured 0.78 -> 0.54 s at sf0.1)
    e = load_events(spark, sf_dir, ROWS_PER_TASK_COLLAPSING).selectExpr(
        "event_type",
        "ts",
        f"least({_PSI_BINS - 1}, greatest(0,"
        f" CAST(floor(value / {_PSI_BIN_W}) AS INT))) AS bin",
    )

    def counts(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type", "bin").agg(
            F.count("*").cast("long").alias(tag)
        )

    ref = counts(e.filter(F.col("ts") < _INC_CUT_NS), "r")
    cur = counts(e.filter(F.col("ts") >= _INC_CUT_NS), "c")
    types = e.select("event_type").distinct()
    return psi_table(ref, cur, types)


def psi_bin_expr(value_col: str = "value") -> str:
    """The shared binning expression (Spark SQL dialect)."""
    return (
        f"least({_PSI_BINS - 1}, greatest(0,"
        f" CAST(floor({value_col} / {_PSI_BIN_W}) AS INT)))"
    )


def psi_table(ref: DataFrame, cur: DataFrame, types: DataFrame) -> DataFrame:
    """PSI per event_type from two count frames ``(event_type, bin, r)``
    / ``(event_type, bin, c)`` — the batch op and the streaming drift
    monitor share this exact arithmetic, so stream-cumulative PSI ==
    batch PSI is a testable identity, not an analogy."""
    from .curation import _DET_LN_W, _DET_LN_Y, _DET_LN_Z, _DET_LN_Z2

    grid = types.selectExpr(
        "event_type",
        f"explode(sequence(0, {_PSI_BINS - 1})) AS bin",
    )
    terms = (
        grid.join(ref, ["event_type", "bin"], "left")
        .join(cur, ["event_type", "bin"], "left")
        .selectExpr(
            "event_type", "bin",
            "coalesce(r, 0) + 1 AS rp", "coalesce(c, 0) + 1 AS cp",
        )
        .withColumn(
            "r_tot", F.sum("rp").over(Window.partitionBy("event_type"))
        )
        .withColumn(
            "c_tot", F.sum("cp").over(Window.partitionBy("event_type"))
        )
        .selectExpr(
            "event_type", "rp", "cp", "r_tot", "c_tot",
            "CAST(cp * r_tot AS DOUBLE) / CAST(rp * c_tot AS DOUBLE) AS ratio",
        )
        .selectExpr(
            "event_type", "rp", "cp", "r_tot", "c_tot", f"{_DET_LN_Y} AS y"
        )
        .selectExpr(
            "event_type", "rp", "cp", "r_tot", "c_tot", f"{_DET_LN_Z} AS z"
        )
        .selectExpr(
            "event_type", "rp", "cp", "r_tot", "c_tot", "z",
            f"{_DET_LN_Z2} AS z2",
        )
        .selectExpr(
            "event_type", "rp", "cp", "r_tot", "c_tot",
            f"{_DET_LN_W} AS ln_micro",
        )
        .selectExpr(
            "event_type",
            "CAST(floor((CAST(cp AS DOUBLE) / c_tot"
            " - CAST(rp AS DOUBLE) / r_tot)"
            " * (CAST(ln_micro AS DOUBLE) / 1000000.0)"
            " * 1000000000.0 + 0.5) AS BIGINT) AS term_nano",
        )
    )
    return (
        terms.groupBy("event_type")
        .agg(F.sum("term_nano").alias("psi_nano"))
        .selectExpr(
            "event_type", "psi_nano",
            "CAST(psi_nano AS DOUBLE) / 1000000000.0 AS psi",
        )
        .selectExpr("event_type", "psi_nano", "psi", f"{_PSI_BAND} AS band")
        .orderBy("event_type")
    )


def _sql_drift_psi() -> str:
    from .curation import _DET_LN_W, _DET_LN_Y, _DET_LN_Z, _DET_LN_Z2

    return f"""
WITH e AS (
  SELECT event_type, epoch_ns(ts) AS ts,
    least({_PSI_BINS - 1}, greatest(0,
      CAST(floor(value / {_PSI_BIN_W}) AS INT))) AS bin
  FROM events
),
ref AS (
  SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS r
  FROM e WHERE ts < {_INC_CUT_NS} GROUP BY 1, 2
),
cur AS (
  SELECT event_type, bin, CAST(COUNT(*) AS BIGINT) AS c
  FROM e WHERE ts >= {_INC_CUT_NS} GROUP BY 1, 2
),
grid AS (
  SELECT event_type, CAST(u.b AS INT) AS bin
  FROM (SELECT DISTINCT event_type FROM e),
       UNNEST(range(0, {_PSI_BINS})) AS u(b)
),
smoothed AS (
  SELECT g.event_type, g.bin,
    coalesce(r, 0) + 1 AS rp, coalesce(c, 0) + 1 AS cp,
    CAST(SUM(coalesce(r, 0) + 1)
      OVER (PARTITION BY g.event_type) AS BIGINT) AS r_tot,
    CAST(SUM(coalesce(c, 0) + 1)
      OVER (PARTITION BY g.event_type) AS BIGINT) AS c_tot
  FROM grid g
  LEFT JOIN ref USING (event_type, bin)
  LEFT JOIN cur USING (event_type, bin)
),
terms AS (
  SELECT event_type,
    CAST(floor((CAST(cp AS DOUBLE) / c_tot - CAST(rp AS DOUBLE) / r_tot)
      * (CAST(ln_micro AS DOUBLE) / 1000000.0)
      * 1000000000.0 + 0.5) AS BIGINT) AS term_nano
  FROM (
    SELECT event_type, rp, cp, r_tot, c_tot, {_DET_LN_W} AS ln_micro FROM (
      SELECT event_type, rp, cp, r_tot, c_tot, z, {_DET_LN_Z2} AS z2 FROM (
        SELECT event_type, rp, cp, r_tot, c_tot, {_DET_LN_Z} AS z FROM (
          SELECT event_type, rp, cp, r_tot, c_tot, {_DET_LN_Y} AS y FROM (
            SELECT event_type, rp, cp, r_tot, c_tot,
              CAST(cp * r_tot AS DOUBLE) / CAST(rp * c_tot AS DOUBLE) AS ratio
            FROM smoothed
          )
        )
      )
    )
  )
)
SELECT event_type, psi_nano, psi, {_PSI_BAND} AS band
FROM (
  SELECT event_type, CAST(SUM(term_nano) AS BIGINT) AS psi_nano,
    CAST(SUM(term_nano) AS DOUBLE) / 1000000000.0 AS psi
  FROM terms GROUP BY 1
)
ORDER BY event_type
"""


# --- skyline / Pareto frontier -----------------------------------------------------

_SKY_SALTS = 16


# join-view IVM snapshot/delta cut on o_orderdate (mid-range)
_IVM_CUT = "1996-01-01"


def q_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental JOIN-view maintenance — the materialized-view
    algebra ``rel_incremental_rollup`` proves for plain rollups,
    extended to an aggregate over a join: the view is per-nation order
    counts and decimal revenue over ``orders ⋈ customer``. An
    insert-only delta of orders (orderdate ≥ the cut) maintains the
    view as ``V_new = merge(V_old, agg(ΔA ⋈ B))`` — the ΔA⋈B term of
    the classic delta-join rule (the A⋈ΔB term is zero for a
    dimension-stable fact delta, which is exactly the nightly-load
    shape). History is never rescanned; the ``consistent`` witness
    column re-derives every figure from a full recompute so the
    algebra is checked per nation in both engines. Decimal sums merge
    BEFORE any double conversion (the rollup lesson)."""
    orders = read_input(spark, sf_dir, "orders")
    cust = read_input(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    DEC = "decimal(38,6)"

    def view(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.join(cust, "o_custkey")
            .groupBy("c_nationkey")
            .agg(
                F.count("*").cast("long").alias(f"n_{tag}"),
                F.sum(F.col("o_totalprice").cast(DEC)).alias(f"rev_{tag}"),
            )
        )

    snap = view(orders.filter(F.col("o_orderdate") < _IVM_CUT), "s")
    delta = view(orders.filter(F.col("o_orderdate") >= _IVM_CUT), "d")
    full = view(orders, "f")
    merged = snap.join(delta, "c_nationkey", "full_outer").selectExpr(
        "c_nationkey",
        "coalesce(n_s, 0) + coalesce(n_d, 0) AS n",
        f"CAST(coalesce(rev_s, CAST(0 AS {DEC}))"
        f" + coalesce(rev_d, CAST(0 AS {DEC})) AS {DEC}) AS rev_dec",
    )
    return merged.join(full, "c_nationkey").selectExpr(
        "c_nationkey", "n",
        "CAST(rev_dec AS DOUBLE) AS revenue",
        "n = n_f AND rev_dec = rev_f AS consistent",
    )


def _sql_incremental_join_view() -> str:
    from .aggregates import dec_to_double_sql

    return f"""
WITH cust AS (SELECT c_custkey AS o_custkey, c_nationkey FROM customer),
snap AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_s,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS rev_s
  FROM orders JOIN cust USING (o_custkey)
  WHERE o_orderdate < '{_IVM_CUT}' GROUP BY 1
),
delta AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_d,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS rev_d
  FROM orders JOIN cust USING (o_custkey)
  WHERE o_orderdate >= '{_IVM_CUT}' GROUP BY 1
),
f AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_f,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS rev_f
  FROM orders JOIN cust USING (o_custkey) GROUP BY 1
),
merged AS (
  SELECT COALESCE(snap.c_nationkey, delta.c_nationkey) AS c_nationkey,
    COALESCE(n_s, 0) + COALESCE(n_d, 0) AS n,
    CAST(COALESCE(rev_s, CAST(0 AS DECIMAL(38,6)))
      + COALESCE(rev_d, CAST(0 AS DECIMAL(38,6))) AS DECIMAL(38,6)) AS rev_dec
  FROM snap FULL JOIN delta ON snap.c_nationkey = delta.c_nationkey
)
SELECT c_nationkey, n, {dec_to_double_sql('rev_dec')} AS revenue,
  n = n_f AND rev_dec = rev_f AS consistent
FROM merged JOIN f USING (c_nationkey)
"""


def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline of orders — maximize ``o_totalprice``, minimize
    ``o_orderdate`` (the "largest order seen by each date" frontier).
    A dominates B iff price_A >= price_B AND date_A <= date_B with one
    strict; coincident (price, date) points keep only the lowest
    orderkey (a deterministic distinct-frontier convention).

    The 2-D skyline needs no pairwise dominance join: sort by (price
    DESC, date ASC, key ASC) and a row is on the frontier iff its date
    beats the running MIN date of everything before it — one window
    scan. Distribution is the classic two-phase skyline: a LOCAL scan
    per salt partition (prunes all but each partition's frontier — the
    16 parallel windows carry the bulk of the data), then the SAME scan
    globally over the union of local frontiers. The result provably
    equals the single-pass skyline: a row dominated anywhere is
    dominated by something that survives its own salt's local pass.

    The global pass is SEGMENTED (r13 verdict #5): through r13 it was a
    partition-less window sanctioned by the bounded-input precedent,
    but a 2-D frontier is only "bounded" on friendly data — when price
    and date are anti-correlated (every order pricier AND later than
    the last) NOTHING is dominated, the local passes prune zero rows,
    and the global window would drag the whole table through one
    partition. The prefix-MIN is associative, so it decomposes exactly
    like the ABC running sum above: ordering-consistent $10k price
    buckets (negated so ascending bucket = descending price; equal
    prices share a bucket) carry the running min per bucket in
    parallel, and earlier buckets' min date arrives as a broadcast
    triangular carry-in over the bucket-count-sized min frame.
    ``least`` of (carry, local prefix min) is bit-equal to the single
    scan — dates are exact integers, no float reassociation — pinned by
    the unchanged sequential DuckDB oracle and the adversarial
    anti-correlated fixture in tests/test_r7_ops.py."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )

    def scan(df: DataFrame, part: list) -> DataFrame:
        w = Window.partitionBy(*part).orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        ).rowsBetween(Window.unboundedPreceding, -1)
        return df.withColumn(
            "best_d", F.min("o_orderdate").over(w)
        ).filter(
            F.col("best_d").isNull()
            | (F.col("o_orderdate") < F.col("best_d"))
        ).drop("best_d")

    local = scan(
        orders.withColumn(
            "salt", (F.col("o_orderkey") % _SKY_SALTS).cast("int")
        ),
        ["salt"],
    ).drop("salt")

    # segmented global pass: per-bucket prefix min + broadcast carry-in
    # of earlier (higher-price) buckets' min date — see docstring. The
    # local-frontier union is read THREE times below (bucket mins, the
    # carry join, the per-bucket window); eager localCheckpoint
    # materializes the one expensive table pass once (the countmin.py:74
    # / graph_rank.py:317 multiply-read precedent) instead of re-running
    # the 16 salt windows per consumer.
    seg = local.withColumn(
        "_sky_b",
        F.expr(
            f"-(CAST(o_totalprice * 100 AS BIGINT) DIV {_ABC_BUCKET_CENTS})"
        ).cast("long"),
    ).localCheckpoint(eager=True)
    w_local = (
        Window.partitionBy("_sky_b")
        .orderBy(
            F.col("o_totalprice").desc(),
            F.col("o_orderdate").asc(),
            F.col("o_orderkey").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bmins = seg.groupBy("_sky_b").agg(F.min("o_orderdate").alias("_bmin"))
    t, p = bmins.alias("t"), bmins.alias("p")
    carry = (
        t.join(F.broadcast(p), F.col("p._sky_b") < F.col("t._sky_b"), "left")
        .groupBy(F.col("t._sky_b").alias("_sky_b"))
        .agg(F.min("p._bmin").alias("_carry"))
    )
    frontier = (
        seg.withColumn("_lmin", F.min("o_orderdate").over(w_local))
        .join(F.broadcast(carry), "_sky_b")
        .withColumn("best_d", F.least("_carry", "_lmin"))
        .filter(
            F.col("best_d").isNull()
            | (F.col("o_orderdate") < F.col("best_d"))
        )
    )
    return frontier.select(
        "o_orderkey",
        "o_totalprice",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias(
            "orderdate_ms"
        ),
    )


SQL_SKYLINE = """
SELECT o_orderkey, o_totalprice, epoch_ms(o_orderdate) AS orderdate_ms FROM (
  SELECT o_orderkey, o_totalprice, o_orderdate,
    MIN(o_orderdate) OVER (
      ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_d
  FROM orders
) WHERE best_d IS NULL OR o_orderdate < best_d
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of ``rel_pivot``: the wide
    status × priority count matrix back to long (status, priority, n)
    form, via Spark's ``stack`` table-generating expression (the
    idiomatic wide→long rewrite; one scan, no joins). Zero-count cells
    are kept — a melt must be information-preserving so that
    pivot→unpivot is the identity (asserted in tests)."""
    wide = q_pivot(spark, sf_dir)
    n = len(_PRIORITIES)
    stack_args = ", ".join(
        f"'{p}', n_{p[0]}" for p in _PRIORITIES
    )
    return wide.selectExpr(
        "o_orderstatus",
        f"stack({n}, {stack_args}) AS (o_orderpriority, n)",
    ).selectExpr("o_orderstatus", "o_orderpriority", "CAST(n AS BIGINT) AS n")


_SQL_UNPIVOT_ARMS = "\n  UNION ALL\n".join(
    f"""SELECT o_orderstatus, '{p}' AS o_orderpriority,
    CAST(COUNT(*) FILTER (WHERE o_orderpriority = '{p}') AS BIGINT) AS n
  FROM orders GROUP BY 1"""
    for p in _PRIORITIES
)

SQL_UNPIVOT = f"""
{_SQL_UNPIVOT_ARMS}
"""


def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE per group with a pinned tie policy — the aggregate ANSI
    SQL:2023 added (and DuckDB ships) that Spark lacks as a builtin:
    most frequent o_orderpriority per o_orderstatus, ties broken by the
    SMALLEST value (both engines' native mode() leaves ties
    implementation-defined, so neither is used — the rank form makes
    the tie deterministic and cross-engine)."""
    orders = _t(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .selectExpr(
            "o_orderstatus",
            "o_orderpriority AS mode_priority",
            "n AS mode_n",
        )
    )


SQL_MODE_PER_GROUP = """
SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_n
FROM (
  SELECT o_orderstatus, o_orderpriority, n, ROW_NUMBER() OVER (
    PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority ASC) AS rk
  FROM (
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders GROUP BY 1, 2
  )
) WHERE rk = 1
"""


_ABC_CENTS = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
_ABC_DUCK_CENTS = "CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)"
_ABC_BUCKET_CENTS = 1_000_000  # $10k revenue buckets


def q_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / ABC inventory classification — customers split into
    A (first 80% of cumulative revenue), B (80-95%), C (tail) — the
    classic global-cumulative-share query, computed with the segmented
    decomposition (`segmented.py`): revenue is quantized into
    ordering-consistent $10k buckets (negated so ascending bucket =
    descending revenue), the running sum windows PARTITION BY bucket,
    and earlier-bucket revenue arrives as a broadcast triangular carry
    — exact BIGINT cents everywhere (floor(x*100+0.5) is the house
    rounding rule), class cuts as integer comparisons
    (cum·100 ≤ total·80), zero global windows. Output: 3-row class
    summary with exact revenue and one display-division share."""
    rev = (
        # r15: collapsing consumer — the per-customer partial agg folds
        # 10x before the first exchange, so the scan is read unfanned
        # (measured: gini 0.98->0.60, pareto 1.39->0.92, lorenz
        # 1.71->1.17 s at sf0.1)
        _t_collapsing(spark, sf_dir, "orders")
        .selectExpr("o_custkey", f"{_ABC_CENTS} AS cents")
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("long").alias("rev"))
    )
    classed = pareto_classes(rev)
    return classed.groupBy("abc_class").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("rev").cast("long").alias("class_rev_cents"),
        F.max("total").cast("long").alias("total_cents"),
    ).selectExpr(
        "abc_class",
        "n_customers",
        "class_rev_cents",
        "CAST(class_rev_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)"
        " AS rev_share",
    )


def pareto_classes(rev: "DataFrame") -> "DataFrame":
    """Per-customer (o_custkey, rev, cum, total, abc_class) via the
    segmented decomposition — split out (the ``chi2_from_cells``
    pattern) so the hypothesis fuzz can pit the segmented cumulative
    sum against a sequential Python computation on arbitrary revenue
    multisets, not just this corpus."""
    rev = rev.withColumn(
        "bucket", F.expr(f"-(rev DIV {_ABC_BUCKET_CENTS})").cast("long")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy(F.col("rev").desc(), F.col("o_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = rev.withColumn("run", F.sum("rev").over(w_local))
    totals = rev.groupBy("bucket").agg(F.sum("rev").alias("b_rev"))
    t, p = totals.alias("t"), totals.alias("p")
    carry = (
        t.join(F.broadcast(p), F.col("p.bucket") < F.col("t.bucket"), "left")
        .groupBy(F.col("t.bucket").alias("bucket"))
        .agg(F.coalesce(F.sum("p.b_rev"), F.lit(0)).cast("long").alias("carry"))
    )
    grand = rev.agg(F.sum("rev").cast("long").alias("total"))
    return (
        local.join(F.broadcast(carry), "bucket")
        .crossJoin(F.broadcast(grand))
        .selectExpr(
            "o_custkey",
            "rev",
            "carry + run AS cum",
            "total",
            "CASE WHEN (carry + run) * 100 <= total * 80 THEN 'A'"
            " WHEN (carry + run) * 100 <= total * 95 THEN 'B'"
            " ELSE 'C' END AS abc_class",
        )
    )


SQL_PARETO_ABC = f"""
WITH rev AS (
  SELECT o_custkey, CAST(SUM({_ABC_DUCK_CENTS}) AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
cum AS (
  SELECT o_custkey, rev,
    CAST(SUM(rev) OVER (ORDER BY rev DESC, o_custkey ASC
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
    CAST(SUM(rev) OVER () AS BIGINT) AS total
  FROM rev
),
classed AS (
  SELECT o_custkey, rev,
    CASE WHEN cum * 100 <= total * 80 THEN 'A'
      WHEN cum * 100 <= total * 95 THEN 'B'
      ELSE 'C' END AS abc_class,
    total
  FROM cum
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_customers,
  CAST(SUM(rev) AS BIGINT) AS class_rev_cents,
  CAST(SUM(rev) AS DOUBLE) / CAST(MAX(total) AS DOUBLE) AS rev_share
FROM classed GROUP BY 1
"""


def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the inequality summary
    that pairs with ``rel_pareto_abc``'s classification: with revenues
    sorted ASCENDING and 1-based ranks i,
    G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n. Ranks come from
    ``segmented_row_number`` (ordering-consistent revenue buckets +
    triangular carry — no global window); Σ(i·xᵢ) is computed as
    SUM(DECIMAL(19)·DECIMAL(19) → DECIMAL(38)) so the product of a
    10⁷-scale rank and 10¹⁰-scale cents never overflows and the sum
    stays order-independent exact. The only doubles are the two final
    display divisions."""
    from .segmented import segmented_row_number

    rev = (
        # r15: collapsing consumer — the per-customer partial agg folds
        # 10x before the first exchange, so the scan is read unfanned
        # (measured: gini 0.98->0.60, pareto 1.39->0.92, lorenz
        # 1.71->1.17 s at sf0.1)
        _t_collapsing(spark, sf_dir, "orders")
        .selectExpr("o_custkey", f"{_ABC_CENTS} AS cents")
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .withColumn(
            "bucket", F.expr(f"rev DIV {_ABC_BUCKET_CENTS}").cast("long")
        )
    )
    ranked = segmented_row_number(
        rev, [F.col("rev").asc(), F.col("o_custkey").asc()], out="grank"
    )
    sums = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.expr("CAST(rev AS DECIMAL(38,0))")).alias("s0"),
        F.sum(
            F.expr(
                "CAST(grank AS DECIMAL(19,0)) * CAST(rev AS DECIMAL(19,0))"
            )
        ).alias("s1"),
    )
    return sums.selectExpr(
        "n",
        "CAST(s0 AS STRING) AS total_cents",
        "2.0 * CAST(CAST(s1 AS STRING) AS DOUBLE)"
        " / (CAST(n AS DOUBLE) * CAST(CAST(s0 AS STRING) AS DOUBLE))"
        " - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini",
    )


SQL_GINI = f"""
WITH rev AS (
  SELECT o_custkey, CAST(SUM({_ABC_DUCK_CENTS}) AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT rev, ROW_NUMBER() OVER (ORDER BY rev ASC, o_custkey ASC) AS grank
  FROM rev
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
    SUM(CAST(rev AS DECIMAL(38,0))) AS s0,
    SUM(CAST(grank AS DECIMAL(19,0)) * CAST(rev AS DECIMAL(19,0))) AS s1
  FROM ranked
)
SELECT n, CAST(s0 AS STRING) AS total_cents,
  2.0 * CAST(CAST(s1 AS STRING) AS DOUBLE)
    / (CAST(n AS DOUBLE) * CAST(CAST(s0 AS STRING) AS DOUBLE))
    - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
FROM sums
"""


def q_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz-curve deciles — the curve behind ``rel_gini``'s scalar:
    customers in ascending revenue order split into 10 equal-count
    tiles, each reporting its exact revenue mass and cumulative share.
    Ranks come from ``segmented_row_number``; the tile assignment is
    ``ntile_expr`` — the closed-form SQL-standard NTILE from a global
    rank, O(1) per row, no window at all; the cumulative share is a
    10-row triangular carry. Everything is BIGINT cents until the two
    display divisions."""
    from .segmented import ntile_expr, segmented_row_number

    rev = (
        # r15: collapsing consumer — the per-customer partial agg folds
        # 10x before the first exchange, so the scan is read unfanned
        # (measured: gini 0.98->0.60, pareto 1.39->0.92, lorenz
        # 1.71->1.17 s at sf0.1)
        _t_collapsing(spark, sf_dir, "orders")
        .selectExpr("o_custkey", f"{_ABC_CENTS} AS cents")
        .groupBy("o_custkey")
        .agg(F.sum("cents").cast("long").alias("rev"))
        .withColumn(
            "bucket", F.expr(f"rev DIV {_ABC_BUCKET_CENTS}").cast("long")
        )
    )
    ranked = segmented_row_number(
        rev, [F.col("rev").asc(), F.col("o_custkey").asc()], out="grank"
    )
    n_total = ranked.agg(F.count("*").cast("long").alias("n"))
    tiled = ranked.crossJoin(F.broadcast(n_total)).selectExpr(
        "rev", f"CAST({ntile_expr('grank', 'n', 10)} AS BIGINT) AS decile"
    )
    per_tile = tiled.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("rev").cast("long").alias("tile_rev"),
    )
    a, b = per_tile.alias("a"), per_tile.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(F.col("a.decile").alias("decile"))
        .agg(F.sum("b.tile_rev").cast("long").alias("cum_rev"))
    )
    grand = per_tile.agg(F.sum("tile_rev").cast("long").alias("total"))
    return (
        per_tile.join(cum, "decile")
        .crossJoin(F.broadcast(grand))
        .selectExpr(
            "decile",
            "n_customers",
            "tile_rev",
            "cum_rev",
            "CAST(tile_rev AS DOUBLE) / CAST(total AS DOUBLE) AS tile_share",
            "CAST(cum_rev AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share",
        )
    )


SQL_LORENZ_DECILES = f"""
WITH rev AS (
  SELECT o_custkey, CAST(SUM({_ABC_DUCK_CENTS}) AS BIGINT) AS rev
  FROM orders GROUP BY 1
),
tiled AS (
  SELECT rev, CAST(NTILE(10) OVER (ORDER BY rev ASC, o_custkey ASC)
    AS BIGINT) AS decile
  FROM rev
),
per_tile AS (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
    CAST(SUM(rev) AS BIGINT) AS tile_rev
  FROM tiled GROUP BY 1
),
cum AS (
  SELECT a.decile, CAST(SUM(b.tile_rev) AS BIGINT) AS cum_rev
  FROM per_tile a JOIN per_tile b ON b.decile <= a.decile
  GROUP BY 1
),
grand AS (SELECT CAST(SUM(tile_rev) AS BIGINT) AS total FROM per_tile)
SELECT decile, n_customers, tile_rev, cum_rev,
  CAST(tile_rev AS DOUBLE) / CAST(total AS DOUBLE) AS tile_share,
  CAST(cum_rev AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
FROM per_tile JOIN cum USING (decile), grand
"""


def register_all() -> None:
    register("rel_correlated_subquery", q_correlated_subquery, SQL_CORRELATED)
    register("rel_exact_percentiles", q_exact_percentiles, SQL_EXACT_PERCENTILES)
    register("rel_grouping_sets", q_grouping_sets, SQL_GROUPING_SETS)
    register("rel_window_suite", q_window_suite, SQL_WINDOW_SUITE)
    register("rel_scalar_funcs", q_scalar_funcs, SQL_SCALAR_FUNCS)
    register("rel_approx_distinct", q_approx_distinct, SQL_APPROX_DISTINCT)
    # pytest-verified tier (driver report caps at 50 rows): navigation
    # functions are a subset of rel_window_suite, CUBE is the special
    # case of rel_grouping_sets, PIVOT is demonstrated end-to-end by the
    # flagship sizing_size_matrix, array_agg by rel_scalar_funcs'
    # collection functions + text's collect paths
    register_extra("rel_window_navigation", q_window_navigation, SQL_WINDOW_NAVIGATION)
    register_extra("rel_array_agg", q_array_agg, SQL_ARRAY_AGG)
    register_extra("rel_pivot", q_pivot, SQL_PIVOT)
    register_extra("rel_unpivot", q_unpivot, SQL_UNPIVOT)
    register_extra("rel_mode_per_group", q_mode_per_group, SQL_MODE_PER_GROUP)
    register_extra("rel_pareto_abc", q_pareto_abc, SQL_PARETO_ABC)
    register_extra("rel_gini", q_gini, SQL_GINI)
    register_extra("rel_lorenz_deciles", q_lorenz_deciles, SQL_LORENZ_DECILES)
    register_extra("rel_cube", q_cube, SQL_CUBE)
    register_extra(
        "rel_window_range_frame", q_window_range_frame, SQL_WINDOW_RANGE_FRAME
    )
    register_extra("rel_upsert_snapshot", q_upsert_snapshot, SQL_UPSERT_SNAPSHOT)
    register_extra("rel_hll_rollup", q_hll_rollup, SQL_HLL_ROLLUP)
    register_extra(
        "rel_histogram_rollup_quantile",
        q_histogram_rollup_quantile,
        SQL_HISTOGRAM_ROLLUP,
    )
    register_extra("rel_null_semantics", q_null_semantics, SQL_NULL_SEMANTICS)
    register_extra("rel_calendar_funcs", q_calendar_funcs, SQL_CALENDAR_FUNCS)
    register_extra("rel_skyline", q_skyline, SQL_SKYLINE)
    register_extra(
        "rel_incremental_rollup", q_incremental_rollup, _sql_incremental_rollup()
    )
    register_extra(
        "rel_incremental_join_view",
        q_incremental_join_view,
        _sql_incremental_join_view(),
    )
    register_extra("rel_drift_psi", q_drift_psi, _sql_drift_psi())
    register_extra("rel_file_provenance", q_file_provenance, _provenance_sql())
