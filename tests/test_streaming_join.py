"""Stream-stream interval join: stream ≡ batch on the same event files.

The funnel join (view → purchase within 1 h per user) runs once as a
Structured Streaming job over multiple micro-batches and once as the
identical batch join; the match sets must be equal row-for-row. Matches
whose sides arrive in DIFFERENT micro-batches are the interesting case —
the state store must hold the earlier side until the later one arrives —
so the fixture places one slice boundary between a known match's view
and purchase, guaranteeing a cross-batch pair exists.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import pytest
from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_SMALL  # noqa: E402

from impala_base_to_cdw_sizing_spark.sources.files import load_events  # noqa: E402
from impala_base_to_cdw_sizing_spark.streaming.join_stream import (  # noqa: E402
    batch_equivalent,
    batch_left_equivalent,
    event_stream,
    run_stream_to_memory,
    view_purchase_join,
    view_purchase_left_join,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

_WM_DELAY_MS = 2 * 3_600_000  # join_stream.WATERMARK
_JOIN_WINDOW_MS = 3_600_000


@pytest.fixture(scope="module")
def event_fixture(spark, tmp_path_factory):
    """Write the events as time-ordered slices (oldest first, distinct
    mtimes) — a stream arrives roughly in event-time order; round-robin
    files would put the whole month in batch 1, advance the watermark to
    the end, and (correctly!) drop every later batch as late data. One
    cut lands BETWEEN a known match's view and purchase so at least one
    pair must straddle micro-batches — the state-retention path (buffer
    the view until its purchase arrives) is exercised by construction,
    not fixture luck. Module-scoped: the slice writes (with their
    mtime-separating sleeps) run once for all tests here."""
    ev = load_events(spark, SF_SMALL).selectExpr(
        "event_id", "user_id", "event_type", "ts div 1000000 AS ts_ms"
    )
    path = str(tmp_path_factory.mktemp("stream_join") / "events")
    first = min(batch_equivalent(ev).collect(), key=lambda r: r.view_ts_ms)
    split_cut = float((first.view_ts_ms + first.purchase_ts_ms) // 2)
    cuts = sorted(
        set(ev.approxQuantile("ts_ms", [0.33, 0.66], 0.0)) | {split_cut}
    )
    lo = float("-inf")
    for cut in [*cuts, float("inf")]:
        sl = ev.filter((ev.ts_ms > lo) & (ev.ts_ms <= cut))
        sl.coalesce(1).write.mode("append").parquet(path)
        lo = cut
        time.sleep(1.1)  # distinct mtime per slice pins replay order
    return path, spark.read.schema(SCHEMA).parquet(path), cuts


def _key(r):
    return (r.user_id, r.view_id, r.purchase_id)


def test_stream_join_equals_batch_join(spark, event_fixture):
    path, static, cuts = event_fixture
    got = run_stream_to_memory(
        view_purchase_join(event_stream(spark, path, SCHEMA)), "vp_join_test"
    ).collect()
    want = batch_equivalent(static).collect()
    assert len(want) > 0, "fixture must produce view→purchase matches"
    # the fixture guarantees >=1 match straddles a micro-batch boundary
    assert any(
        r.view_ts_ms <= c < r.purchase_ts_ms for r in want for c in cuts
    ), "no cross-batch match — the state-retention path went untested"
    assert {_key(r) for r in got} == {_key(r) for r in want}
    got_full = {_key(r): (r.view_ts_ms, r.purchase_ts_ms) for r in got}
    want_full = {_key(r): (r.view_ts_ms, r.purchase_ts_ms) for r in want}
    assert got_full == want_full
    # the stream's emitted pairs all satisfy the interval bound (same
    # rows as batch by the equality above, checked on the STREAM output)
    for r in got:
        assert 0 <= r.purchase_ts_ms - r.view_ts_ms <= _JOIN_WINDOW_MS


@pytest.mark.slow  # re-tiered r15: driver gate = fast tier; this test's coverage stays in the release gate (pytest -m "")
def test_stream_left_join_emits_closed_unmatched_views(spark, event_fixture):
    """Outer-join streaming semantics: matched pairs emit eagerly;
    unmatched views emit null-extended ONLY once the watermark closes
    their 1-hour match window; views whose window is still open at
    end-of-stream do not emit at all."""
    path, static, _cuts = event_fixture
    got = run_stream_to_memory(
        view_purchase_left_join(event_stream(spark, path, SCHEMA)),
        "vp_left_join_test",
    ).collect()
    want = batch_left_equivalent(static).collect()

    got_matched = {_key(r) for r in got if r.purchase_id is not None}
    want_matched = {_key(r) for r in want if r.purchase_id is not None}
    assert got_matched == want_matched  # inner portion identical

    # the stream's final global watermark is min over the PER-SIDE event
    # maxima minus the delay (each side advances its own watermark; the
    # join uses the min) — using a single global max would overestimate
    # it and demand emissions the engine correctly withheld
    from pyspark.sql import functions as F

    maxima = (
        static.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(F.max("ts_ms").alias("mx"))
        .collect()
    )
    per_side_max = {r["event_type"]: r["mx"] for r in maxima}
    final_wm = min(per_side_max["view"], per_side_max["purchase"]) - _WM_DELAY_MS

    got_unmatched = {r.view_id for r in got if r.purchase_id is None}
    want_unmatched_closed = {
        r.view_id
        for r in want
        if r.purchase_id is None and r.view_ts_ms + _JOIN_WINDOW_MS < final_wm
    }
    # every batch-unmatched view whose window provably closed must have
    # emitted; stream may additionally emit some in the boundary zone
    assert want_unmatched_closed <= got_unmatched
    assert want_unmatched_closed, "fixture must close some unmatched views"
    # and the stream never emits an unmatched row for a view the batch
    # join matched
    batch_matched_views = {r.view_id for r in want if r.purchase_id is not None}
    assert not (got_unmatched & batch_matched_views)


def test_stream_static_enrichment_equals_batch(spark, event_fixture):
    """Stream-static join: the streaming side enriches against a STATIC
    dimension (per-user lifetime profile computed once from history) —
    no state, no watermark interplay; the static side re-resolves per
    micro-batch. Every streamed event must carry its profile, equal to
    the batch join."""
    from pyspark.sql import functions as F

    path, static, _cuts = event_fixture
    profile = (
        static.groupBy("user_id")
        .agg(F.count("*").alias("n_events_ever"))
    )
    stream = event_stream(spark, path, SCHEMA)
    enriched = stream.join(profile, "user_id").select(
        "event_id", "user_id", "n_events_ever"
    )
    got = run_stream_to_memory(enriched, "stream_static_test").collect()
    want = static.join(profile, "user_id").select(
        "event_id", "user_id", "n_events_ever"
    ).collect()
    assert len(got) == len(want) > 0
    assert {(r.event_id, r.n_events_ever) for r in got} == {
        (r.event_id, r.n_events_ever) for r in want
    }
