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

from pyspark.sql import types as T

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tests.conftest import SF_SMALL  # noqa: E402

from impala_base_to_cdw_sizing_spark.sources.files import load_events  # noqa: E402
from impala_base_to_cdw_sizing_spark.streaming.join_stream import (  # noqa: E402
    batch_equivalent,
    event_stream,
    run_stream_to_memory,
    view_purchase_join,
)

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)


def _event_files(spark, tmp_path):
    """Write the events as time-ordered slices (oldest first, distinct
    mtimes) — a stream arrives roughly in event-time order; round-robin
    files would put the whole month in batch 1, advance the watermark to
    the end, and (correctly!) drop every later batch as late data. One
    cut lands BETWEEN a known match's view and purchase so at least one
    pair must straddle micro-batches — the state-retention path (buffer
    the view until its purchase arrives) is exercised by construction,
    not fixture luck."""
    ev = load_events(spark, SF_SMALL).selectExpr(
        "event_id", "user_id", "event_type", "ts div 1000000 AS ts_ms"
    )
    path = str(tmp_path / "events")
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


def test_stream_join_equals_batch_join(spark, tmp_path):
    path, static, cuts = _event_files(spark, tmp_path)
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


def test_stream_join_respects_the_interval_bound(spark, tmp_path):
    _path, static, _cuts = _event_files(spark, tmp_path)
    rows = batch_equivalent(static).collect()
    for r in rows:
        assert 0 <= r.purchase_ts_ms - r.view_ts_ms <= 3_600_000


def test_stream_left_join_emits_closed_unmatched_views(spark, tmp_path):
    """Outer-join streaming semantics: matched pairs emit eagerly;
    unmatched views emit null-extended ONLY once the watermark closes
    their 1-hour match window; views whose window is still open at
    end-of-stream do not emit at all."""
    from impala_base_to_cdw_sizing_spark.streaming.join_stream import (
        batch_left_equivalent,
        view_purchase_left_join,
    )

    path, static, _cuts = _event_files(spark, tmp_path)
    got = run_stream_to_memory(
        view_purchase_left_join(event_stream(spark, path, SCHEMA)),
        "vp_left_join_test",
    ).collect()
    want = batch_left_equivalent(static).collect()

    got_matched = {_key(r) for r in got if r.purchase_id is not None}
    want_matched = {_key(r) for r in want if r.purchase_id is not None}
    assert got_matched == want_matched  # inner portion identical

    # the final watermark the stream reached: max event time - 2h delay
    max_ts = max(r.view_ts_ms for r in want)
    for r in want:
        if r.purchase_ts_ms is not None:
            max_ts = max(max_ts, r.purchase_ts_ms)
    final_wm_closed = max_ts - 2 * 3_600_000 - 3_600_000  # wm delay + join window

    got_unmatched = {r.view_id for r in got if r.purchase_id is None}
    want_unmatched_closed = {
        r.view_id
        for r in want
        if r.purchase_id is None and r.view_ts_ms < final_wm_closed
    }
    # every batch-unmatched view whose window provably closed must have
    # emitted; stream may additionally emit some in the boundary zone
    assert want_unmatched_closed <= got_unmatched
    assert want_unmatched_closed, "fixture must close some unmatched views"
    # and the stream never emits an unmatched row for a view the batch
    # join matched
    batch_matched_views = {r.view_id for r in want if r.purchase_id is not None}
    assert not (got_unmatched & batch_matched_views)
