"""The remaining TPC-H query patterns (Q2/Q8/Q9/Q11/Q12/Q14/Q15/Q16/Q17/
Q20/Q21/Q22), adapted to the testdata's reduced star schema.

With relational.py (Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q13/Q18/Q19) this completes all
22 TPC-H query *shapes* — each exercising a distinct physical pattern the
engine must plan correctly at 100 TB. The testdata has no ``partsupp``
table and no commit/receipt dates, so:

- ``partsupp`` is derived deterministically from ``lineitem`` as the
  distinct (partkey, suppkey) pairs with ``supplycost = min(unit price)``
  (``_psup`` below) — both engines compute the identical frame, so the
  min-cost-supplier (Q2), value-threshold (Q11), and excess-stock (Q20)
  patterns run unmodified on the derived view.
- "late" lineitems (Q12/Q21's receipt>commit predicate) are adapted to
  ``l_returnflag = 'R'`` / ``l_shipdate > o_orderdate`` — the join and
  exists/not-exists shapes are the point, not the calendar columns.

Float determinism: every unordered SUM runs in DECIMAL(38,6)
(``aggregates.dsum``); scalar thresholds (Q11/Q15/Q17/Q22) are computed
from those exact sums, so cross-engine equality comparisons on the
derived doubles are exact, not tolerance-based.

All twelve register in the pytest-verified extra tier (the driver's
declared report is capped at 50 rows and holds one entry per operator
family; these are additional *compositions* of already-declared join/agg/
subquery operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .aggregates import dsum, dsum_sql
from .queries_ext import register_extra
from ..sources.files import read_input


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_input(spark, sf_dir, name)


# Derived partsupp: one row per (partkey, suppkey) ever shipped, costed at
# the minimum observed unit price. MIN over doubles is order-independent,
# and the unit price is the same IEEE division in both engines.
def _psup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"))
    )


SQL_PSUP = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
    MIN(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2
"""


# --- Q2: minimum-cost supplier (correlated MIN subquery over a join chain) -------


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each qualifying part, the EUROPE supplier(s) whose
    supplycost equals the regional minimum for that part. The Spark plan
    is the decorrelated form — aggregate the regional min per part once,
    equi-join back on (partkey, cost) — while the oracle states the
    textbook correlated subquery; Catalyst would decorrelate the SQL to
    this same plan, and the pair proves the two formulations agree."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eur_supp = (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eur_ps = _psup(spark, sf_dir).join(
        F.broadcast(eur_supp), F.col("ps_suppkey") == F.col("s_suppkey")
    )
    min_cost = eur_ps.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    # no broadcast hint on min_cost: it is partkey-cardinality (grows
    # with SF) — the equi-join shuffles on ps_partkey and AQE broadcasts
    # at runtime only when the frame is actually small
    return (
        eur_ps.join(min_cost, "ps_partkey")
        .filter(F.col("ps_supplycost") == F.col("min_cost"))
        .join(part, F.col("ps_partkey") == part.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
            F.col("ps_supplycost").alias("supplycost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
        )
        .limit(100)
    )


SQL_Q2 = f"""
WITH psup AS ({SQL_PSUP})
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
  ps_supplycost AS supplycost
FROM part, psup, supplier, nation, region
WHERE p_partkey = ps_partkey AND s_suppkey = ps_suppkey
  AND p_size = 15
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'EUROPE'
  AND ps_supplycost = (
    SELECT MIN(i.ps_supplycost)
    FROM psup i, supplier s2, nation n2, region r2
    WHERE i.ps_partkey = p_partkey AND s2.s_suppkey = i.ps_suppkey
      AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


# --- Q8: market share (conditional share of a decimal-sum volume) ----------------


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_3 suppliers' share of AMERICA customers' order
    volume per year — the conditional-numerator / total-denominator share
    aggregate. Both sums run in decimal so the share division is exact."""
    nat = _t(spark, sf_dir, "nation")
    cust_nat = nat.selectExpr("n_nationkey AS cn_key", "n_regionkey AS cn_region")
    supp_nat = nat.selectExpr("n_nationkey AS sn_key", "n_name AS supp_nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust_nat), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(reg), F.col("cn_region") == reg.r_regionkey)
        .join(F.broadcast(supp_nat), supp.s_nationkey == F.col("sn_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            dsum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0)).alias(
                "nation_volume"
            ),
            dsum(vol).alias("total_volume"),
        )
        .withColumn("mkt_share", F.col("nation_volume") / F.col("total_volume"))
    )


SQL_Q8 = f"""
SELECT o_year,
  {dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
    AS nation_volume,
  {dsum_sql('volume')} AS total_volume,
  {dsum_sql("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0.0 END")}
    / {dsum_sql('volume')} AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
    l_extendedprice * (1 - l_discount) AS volume,
    n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
GROUP BY o_year
"""


# --- Q9: product-line profit by nation and year ----------------------------------


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit per supplier nation per year over a LIKE-filtered
    part subset. Supply cost is the derived 60%-of-retail stand-in (the
    testdata has no ps_supplycost); the profit expression mixes two fact
    columns and a dim column — the multi-table arithmetic shape."""
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .withColumn("o_year", F.year("l_shipdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(dsum(profit).alias("sum_profit"), F.count("*").alias("n_lines"))
    )


SQL_Q9 = f"""
SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
  {dsum_sql('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity')}
    AS sum_profit,
  COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY 1, 2
"""


# --- Q11: important inventory (HAVING against a global scalar) -------------------


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: per-part value for one region's suppliers, kept only
    where it exceeds a multiple of the AVERAGE part value — a group-by
    whose HAVING references a scalar aggregate of the same frame (the
    original's fraction-of-total threshold is SF-dependent; avg-relative
    is the same plan shape and non-vacuous at every scale factor). The
    scalar is a 1-row broadcast cross join; the per-part frame is
    computed once and reused for the average, not re-scanned."""
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = _t(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_part = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("l_partkey")
        .agg(dsum(value).alias("part_value"))
    )
    avg_value = per_part.agg(
        (
            F.sum(F.col("part_value").cast("decimal(38,6)")).cast("double")
            / F.count("*")
        ).alias("avg_value")
    )
    return (
        per_part.crossJoin(F.broadcast(avg_value))
        .filter(F.col("part_value") > 1.5 * F.col("avg_value"))
        .select("l_partkey", "part_value")
    )


SQL_Q11 = f"""
WITH per_part AS (
  SELECT l_partkey, {dsum_sql('l_extendedprice * (1 - l_discount)')} AS part_value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > 1.5 * (
  SELECT CAST(CAST(SUM(CAST(part_value AS DECIMAL(38,6))) AS STRING) AS DOUBLE) / COUNT(*)
  FROM per_part)
"""


# --- Q12: late shipments by priority class (two-level conditional counts) --------


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: join fact-to-fact, then CASE-bucketed counts per group —
    the high/low-priority split of late lineitems. Adapted: "late" is
    ``l_shipdate > o_orderdate`` (no commit/receipt dates in testdata) and
    the group key is ``l_linestatus`` (no shipmode column)."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(li.l_shipdate > orders.o_orderdate)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


SQL_Q12 = """
SELECT l_linestatus,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > o_orderdate
GROUP BY l_linestatus
"""


# --- Q14: promotion revenue share (conditional share, single join) ---------------


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-10-01")))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(0.0)).alias(
                "promo_revenue"
            ),
            dsum(vol).alias("total_revenue"),
        )
        .withColumn(
            "promo_pct", 100.0 * F.col("promo_revenue") / F.col("total_revenue")
        )
    )


SQL_Q14 = f"""
SELECT
  {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
    AS promo_revenue,
  {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue,
  100.0 * {dsum_sql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
    / {dsum_sql('l_extendedprice * (1 - l_discount)')} AS promo_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""


# --- Q15: top supplier (view + equality against its own MAX) ---------------------


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: a revenue view reused twice — once grouped, once for its
    MAX — with an equality filter joining the two. The decimal revenue
    sums make the double equality exact in both engines. The view is
    localCheckpoint-ed (Spark would otherwise recompute the aggregation
    for each use; the blocks release on GC, unlike cache(), so repeated
    registry runs don't accumulate storage)."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        ))
    ).localCheckpoint(eager=True)
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "s_acctbal", "total_revenue")
    )


SQL_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    {dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name, s_acctbal, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


# --- Q16: supplier counts by part attribute (NOT-IN + count distinct) ------------


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier count per part attribute triple, with
    a NOT-IN exclusion subquery (negative-balance suppliers stand in for
    the comment-flagged complaints). The NOT IN becomes a left-anti
    broadcast join on the tiny exclusion set."""
    li_pairs = (
        _t(spark, sf_dir, "lineitem")
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .distinct()
    )
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = _t(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_key"))
    return (
        li_pairs.join(part, F.col("ps_partkey") == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            F.col("ps_suppkey") == F.col("bad_key"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


SQL_Q16 = """
SELECT p_brand, p_type, p_size,
  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem) pairs
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q17: small-quantity revenue (correlated AVG against the same fact) ----------


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: lineitems below 30% of their part's average quantity —
    the correlated-AVG-on-the-same-fact pattern. Decorrelated as a
    per-part aggregate joined back (what Catalyst produces for the SQL
    form); the per-part average runs as exact decimal-sum / count so the
    0.3×avg threshold (widened from TPC-H's 0.2 so the fixture corpus
    admits lines at every test scale) compares identically in both
    engines."""
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#5") & (F.col("p_size") < 25)
    )
    li = _t(spark, sf_dir, "lineitem")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("ap_key")).agg(
        (dsum(F.col("l_quantity")) / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == F.col("ap_key"))
        .filter(F.col("l_quantity") < 0.3 * F.col("avg_qty"))
        .agg(
            (dsum(F.col("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_lines"),
        )
    )


SQL_Q17 = f"""
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly,
  COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS ap_key,
    {dsum_sql('l_quantity')} / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY 1
) a ON l_partkey = ap_key
WHERE p_brand = 'Brand#5' AND p_size < 25
  AND l_quantity < 0.3 * avg_qty
"""


# --- Q20: dominant suppliers (nested semi-join chain) ----------------------------


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers qualified through a nested subquery chain —
    part-name filter → per-(part, supplier) shipped quantity in a year →
    threshold against the part's total → semi-join up to the supplier
    list. Adapted threshold: the supplier's own 1998 volume for the part
    exceeds 30% of ALL suppliers' 1998 volume for it ("dominant
    supplier"; the original compares availqty, which the testdata lacks).
    Every step is an equi-join or aggregate — no correlated execution."""
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp = _t(spark, sf_dir, "supplier")
    part_ids = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li98 = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1998-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1999-01-01")))
        )
        .join(F.broadcast(part_ids), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    per_ps = li98.groupBy("l_partkey", "l_suppkey").agg(
        dsum(F.col("l_quantity")).alias("supp_qty")
    )
    per_part = li98.groupBy(F.col("l_partkey").alias("tp_key")).agg(
        dsum(F.col("l_quantity")).alias("part_qty")
    )
    dominant = (
        per_ps.join(per_part, per_ps.l_partkey == F.col("tp_key"))
        .filter(F.col("supp_qty") > 0.3 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .join(dominant, supp.s_suppkey == dominant.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


SQL_Q20 = f"""
WITH li98 AS (
  SELECT l_partkey, l_suppkey, l_quantity
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate < TIMESTAMP '1999-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
),
per_ps AS (
  SELECT l_partkey, l_suppkey, {dsum_sql('l_quantity')} AS supp_qty
  FROM li98 GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey AS tp_key, {dsum_sql('l_quantity')} AS part_qty
  FROM li98 GROUP BY 1
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (
    SELECT l_suppkey FROM per_ps JOIN per_part ON l_partkey = tp_key
    WHERE supp_qty > 0.3 * part_qty)
"""


# --- Q21: suppliers who kept orders waiting (EXISTS + NOT EXISTS self-joins) -----


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: per-supplier count of multi-supplier orders where ONLY
    this supplier failed — one EXISTS (another supplier in the order) and
    one NOT EXISTS (another supplier also failed) against the same fact.
    Adapted: "failed" is ``l_returnflag = 'R'`` on an ``o_orderstatus =
    'F'`` order. Both quantifiers compile to one aggregated self-frame:
    per (order, supplier) roll-up, then per-order supplier/failure counts
    — two shuffles total, no correlated re-scans."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("failed"))
    )
    per_order = per_os.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.count("*").alias("n_supp"),
        F.sum("failed").alias("n_failed"),
    )
    waiting = (
        per_os.filter(F.col("failed") == 1)
        .join(per_order, per_os.l_orderkey == F.col("ok"))
        .filter((F.col("n_supp") > 1) & (F.col("n_failed") == 1))
    )
    return (
        waiting.join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


SQL_Q21 = """
WITH per_os AS (
  SELECT l_orderkey, l_suppkey,
    MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS failed
  FROM lineitem
  WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  GROUP BY 1, 2
),
per_order AS (
  SELECT l_orderkey AS ok, COUNT(*) AS n_supp, SUM(failed) AS n_failed
  FROM per_os GROUP BY 1
)
SELECT s_name, COUNT(*) AS numwait
FROM per_os
JOIN per_order ON l_orderkey = ok
JOIN supplier ON l_suppkey = s_suppkey
WHERE failed = 1 AND n_supp > 1 AND n_failed = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# --- Q22: idle high-balance customers (anti join + scalar AVG subquery) ----------


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: customers in selected "country codes" with
    above-average positive balance and NO RECENT orders — a scalar
    subquery threshold plus an anti join. Adapted: the code is
    ``c_nationkey % 10`` (no phone column) and "idle" means no order
    since 2000-07-01 (every customer has SOME order in this corpus, so
    the original's all-time NOT EXISTS would be vacuous; the recency
    predicate pushes into the anti-join side's scan). The average is
    exact decimal-sum / count."""
    codes = (1, 3, 5, 7)
    cust = _t(spark, sf_dir, "customer").withColumn(
        "cntrycode", (F.col("c_nationkey") % 10).cast("long")
    )
    in_codes = cust.filter(F.col("cntrycode").isin(*codes))
    avg_bal = in_codes.filter(F.col("c_acctbal") > 0).agg(
        (dsum(F.col("c_acctbal")) / F.count("*")).alias("avg_bal")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-07-01")))
        .select("o_custkey")
    )
    return (
        in_codes.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, in_codes.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count("*").alias("numcust"),
            dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
    )


SQL_Q22 = f"""
WITH in_codes AS (
  SELECT c_custkey, c_acctbal, CAST(c_nationkey % 10 AS BIGINT) AS cntrycode
  FROM customer WHERE c_nationkey % 10 IN (1, 3, 5, 7)
)
SELECT cntrycode, COUNT(*) AS numcust, {dsum_sql('c_acctbal')} AS totacctbal
FROM in_codes
WHERE c_acctbal > (
  SELECT {dsum_sql('c_acctbal')} / COUNT(*) FROM in_codes WHERE c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY cntrycode
"""


def register_all() -> None:
    register_extra("rel_tpch_q2_mincost", q_tpch_q2, SQL_Q2)
    register_extra("rel_tpch_q8_share", q_tpch_q8, SQL_Q8)
    register_extra("rel_tpch_q9_profit", q_tpch_q9, SQL_Q9)
    register_extra("rel_tpch_q11_threshold", q_tpch_q11, SQL_Q11)
    register_extra("rel_tpch_q12_latecounts", q_tpch_q12, SQL_Q12)
    register_extra("rel_tpch_q14_promo", q_tpch_q14, SQL_Q14)
    register_extra("rel_tpch_q15_topview", q_tpch_q15, SQL_Q15)
    register_extra("rel_tpch_q16_notin", q_tpch_q16, SQL_Q16)
    register_extra("rel_tpch_q17_corravg", q_tpch_q17, SQL_Q17)
    register_extra("rel_tpch_q20_nested", q_tpch_q20, SQL_Q20)
    register_extra("rel_tpch_q21_quantifiers", q_tpch_q21, SQL_Q21)
    register_extra("rel_tpch_q22_idle", q_tpch_q22, SQL_Q22)
