"""Bucketed tables co-locate joins: no shuffle on either side (the
pre-partitioning strategy for repeated 100 TB fact-fact joins)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    for name, df, key in (("li_b", li, "l_orderkey"), ("ord_b", orders, "o_orderkey")):
        (
            df.write.mode("overwrite")
            .option("path", str(wh / name))
            .bucketBy(8, key)
            .sortBy(key)
            .saveAsTable(name)
        )
    return spark


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    joined = spark.table("li_b").join(
        spark.table("ord_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # disable auto-broadcast so the join strategy must rely on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    # bucketed scans feed the join directly: no shuffle exchange anywhere
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_bucketed_join_results_match_plain_join(bucketed):
    spark = bucketed
    plain = (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .join(
            spark.read.parquet(f"{SF_SMALL}/orders.parquet"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .count()
    )
    bucketed_count = (
        spark.table("li_b")
        .join(spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert bucketed_count == plain
