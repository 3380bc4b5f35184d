"""Catalog helper: register the star schema + engine views so users can
work in pure Spark SQL (`spark.sql(...)`) against the same tables the
DataFrame API uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from .sources.files import read_input

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """One temp view per testdata table, plus the derived ``query_history``
    view the sizing pipeline consumes."""
    from .sources.files import load_events

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in TABLES:
        if t == "events":
            # normalized ts (epoch-nanos bigint) — same frame every
            # DataFrame-path operator sees, whatever the parquet type
            load_events(spark, sf_dir).createOrReplaceTempView(t)
        else:
            read_input(spark, sf_dir, t).createOrReplaceTempView(t)

    from .sources.synthetic import query_history_from_events

    query_history_from_events(spark, sf_dir).createOrReplaceTempView(
        "query_history"
    )


def sql(spark: SparkSession, query: str) -> DataFrame:
    """Thin passthrough — Catalyst produces the same plans for SQL and
    DataFrame formulations; exposed for users migrating SQL workloads."""
    return spark.sql(query)
