"""applyInPandasWithState custom operator: per-pool running concurrency."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from impala_base_to_cdw_sizing_spark.config import DEFAULT_PARAMS
from impala_base_to_cdw_sizing_spark.operators.sweep import explode_events
from impala_base_to_cdw_sizing_spark.plans.pipeline import run_sizing
from impala_base_to_cdw_sizing_spark.sources.synthetic import (
    query_history_from_events,
)
from impala_base_to_cdw_sizing_spark.streaming.stateful import (
    stateful_concurrency,
)

from tests.conftest import SF_SMALL
import pytest

SCHEMA = T.StructType(
    [
        T.StructField("pool", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("seq", T.LongType()),
        T.StructField("sign", T.IntegerType()),
    ]
)


@pytest.mark.slow  # re-tiered r15: driver gate = fast tier; this test's coverage stays in the release gate (pytest -m "")
def test_stateful_concurrency_final_state(spark, tmp_path):
    qh = query_history_from_events(spark, SF_SMALL)
    res = run_sizing(qh, DEFAULT_PARAMS)
    kept_pools = res.routed.kept.select("seq", "pool")
    ev = (
        explode_events(res.routed.kept)
        .join(kept_pools, "seq")
        .select("pool", "ts_ms", "seq", "sign")
    )
    path = str(tmp_path / "ev")
    ev.coalesce(1).write.mode("overwrite").parquet(path)

    stream = spark.readStream.schema(SCHEMA).parquet(path)
    q = (
        stateful_concurrency(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    out = spark.sql(
        "SELECT pool, max(events_seen) AS seen, "
        "max_by(net_open, events_seen) AS final_net FROM stateful_out GROUP BY pool"
    ).collect()

    want = {
        r.pool: r.n
        for r in ev.groupBy("pool").agg(F.count("*").alias("n")).collect()
    }
    got = {r.pool: r for r in out}
    assert set(got) == set(want)
    for pool, n in want.items():
        assert got[pool].seen == n  # every event folded into state
        assert got[pool].final_net == 0  # all intervals closed
