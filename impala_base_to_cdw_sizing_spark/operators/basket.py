"""Market-basket association lift over event streams.

The classic retail-analytics co-occurrence query the reference's sizing
domain never needed but any event-warehouse user runs: which event
types co-occur in the same (user, day) basket more than independence
predicts?  lift(a,b) = N·n_ab / (n_a·n_b) over baskets, support and
confidence alongside.

Scale shape: the basket self-join is bounded by the ITEM ALPHABET, not
the data — a basket holds at most |distinct event_type| items (5 here),
so pair generation is ≤ |alphabet|²/2 rows per basket and the output is
at most alphabet-squared rows. The heavy work is the two exact
distinct-aggregations, which are plain shuffle group-bys; everything
after them operates on frames the size of the alphabet and broadcasts.
Every statistic is a double division of exact BIGINT products
(N ≤ ~1e9 baskets at 100 TB keeps N·n_ab < 2^63), so Spark and DuckDB
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import load_events
from .queries_ext import register_extra

_DAY_NS = 86_400_000_000_000


def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise lift / support / confidence over (user, day) baskets.

    One row per unordered item pair (item_a < item_b) that co-occurs at
    least once: basket counts n_a, n_b, n_ab, the total basket count
    n_baskets, and

      lift        = n_baskets·n_ab / (n_a·n_b)   (>1 ⇒ attraction)
      support     = n_ab / n_baskets
      conf_a_to_b = n_ab / n_a

    All ratios are single divisions of exact 64-bit integers — IEEE
    division is correctly rounded, so both engines produce the same
    double without quantization.
    """
    items = (
        load_events(spark, sf_dir)
        .selectExpr(
            "user_id", f"CAST(ts DIV {_DAY_NS} AS BIGINT) AS day", "event_type"
        )
        .distinct()
    )
    a, b = items.alias("a"), items.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.day") == F.col("b.day"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    item_counts = items.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_item")
    )
    totals = items.selectExpr("user_id", "day").distinct().agg(
        F.count("*").cast("long").alias("n_baskets")
    )
    return (
        pair_counts.join(
            F.broadcast(item_counts.selectExpr("event_type AS item_a", "n_item AS n_a")),
            "item_a",
        )
        .join(
            F.broadcast(item_counts.selectExpr("event_type AS item_b", "n_item AS n_b")),
            "item_b",
        )
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "item_a",
            "item_b",
            "n_a",
            "n_b",
            "n_ab",
            "n_baskets",
            "CAST(n_baskets * n_ab AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)"
            " AS lift",
            "CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support",
            "CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS conf_a_to_b",
        )
    )


SQL_BASKET_LIFT = f"""
WITH items AS (
  SELECT DISTINCT user_id,
    CAST(epoch_ns(ts) // {_DAY_NS} AS BIGINT) AS day, event_type
  FROM events
),
pair_counts AS (
  SELECT a.event_type AS item_a, b.event_type AS item_b,
    CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM items a JOIN items b
    ON a.user_id = b.user_id AND a.day = b.day
   AND a.event_type < b.event_type
  GROUP BY 1, 2
),
item_counts AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_item
  FROM items GROUP BY 1
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_baskets
  FROM (SELECT DISTINCT user_id, day FROM items)
)
SELECT item_a, item_b, ca.n_item AS n_a, cb.n_item AS n_b, n_ab,
  n_baskets,
  CAST(n_baskets * n_ab AS DOUBLE) / CAST(ca.n_item * cb.n_item AS DOUBLE)
    AS lift,
  CAST(n_ab AS DOUBLE) / CAST(n_baskets AS DOUBLE) AS support,
  CAST(n_ab AS DOUBLE) / CAST(ca.n_item AS DOUBLE) AS conf_a_to_b
FROM pair_counts
JOIN item_counts ca ON ca.event_type = item_a
JOIN item_counts cb ON cb.event_type = item_b
CROSS JOIN totals
"""


def register_all() -> None:
    register_extra("rel_basket_lift", q_basket_lift, SQL_BASKET_LIFT)
