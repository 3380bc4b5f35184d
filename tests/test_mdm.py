"""Golden-record survivorship: pure-Python replication plus the
structural claim that makes the operator non-trivial — surviving
fields genuinely come from different source rows."""

from __future__ import annotations

import re
from collections import defaultdict

from impala_base_to_cdw_sizing_spark.operators import mdm as M
from impala_base_to_cdw_sizing_spark.sources.files import load_events
from tests.conftest import SF_SMALL

_K = re.compile('"k": *([0-9]+)')


def _replicate(events):
    seqs = defaultdict(list)
    for r in events:
        seqs[r.user_id].append(r)
    out = {}
    for uid, rs in seqs.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        lv = next(
            (r.value for r in reversed(rs) if r.event_type != "error"), -1.0
        )
        lk = -1
        for r in reversed(rs):
            if r.event_type in ("purchase", "signup"):
                m = _K.search(r.props)
                if m:
                    lk = int(m.group(1))
                    break
        out[uid] = (
            len(rs),
            rs[0].ts,
            rs[-1].ts,
            rs[-1].event_type,
            lv,
            lk,
        )
    return out


def test_golden_record_replicates_in_pure_python(spark):
    events = load_events(spark, SF_SMALL).collect()
    expect = _replicate(events)
    rows = M.q_golden_record(spark, SF_SMALL).collect()
    assert len(rows) == len(expect)
    for r in rows:
        assert (
            r.n_events,
            r.first_ts,
            r.last_ts,
            r.last_event_type,
            r.last_value_nonerror,
            r.last_props_k,
        ) == expect[r.user_id]


def test_golden_record_fields_survive_from_different_rows(spark):
    """If survivorship degenerated into 'take the latest row', the
    operator would be a plain argmax — assert users exist whose last
    event is an error (so last_value_nonerror came from an earlier
    row) and users whose props survived from a non-final event."""
    events = load_events(spark, SF_SMALL).collect()
    rows = {r.user_id: r for r in M.q_golden_record(spark, SF_SMALL).collect()}
    seqs = defaultdict(list)
    for r in events:
        seqs[r.user_id].append(r)
    split_value = split_props = 0
    for uid, rs in seqs.items():
        rs.sort(key=lambda r: (r.ts, r.event_id))
        last = rs[-1]
        if last.event_type == "error" and rows[uid].last_value_nonerror != -1.0:
            assert rows[uid].last_value_nonerror != last.value
            split_value += 1
        if last.event_type not in ("purchase", "signup") and rows[
            uid
        ].last_props_k != -1:
            split_props += 1
    assert split_value > 0
    assert split_props > 0
