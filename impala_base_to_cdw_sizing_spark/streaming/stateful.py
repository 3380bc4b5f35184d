"""Custom stateful streaming operator — ``applyInPandasWithState``
(SURVEY.md §2.J streaming row: the reference's sweep as a *stateful*
stream rather than a windowed aggregate).

Tracks per-pool running concurrency across micro-batches: state carries
the net open-query count and the max observed; each batch folds its
events (time-ordered within the batch) into the state and emits one row
per pool per batch. This is the Spark-idiomatic form of the reference's
accumulator loop (``impala_query_sizing.py:372-396``) when events arrive
incrementally.

State is bounded (two numbers per pool), so this scales to arbitrary
stream length; pool cardinality controls state size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "pool string, events_seen long, net_open long, max_concurrent long"
)
STATE_SCHEMA = "net long, max long, seen long"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    net, mx, seen = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts_ms", "seq", "sign"], ascending=[True, True, False])
        for sign in pdf["sign"]:
            net += int(sign)
            seen += 1
            if sign > 0 and net > mx:
                mx = net
    state.update((net, mx, seen))
    yield pd.DataFrame(
        {
            "pool": [key[0]],
            "events_seen": [seen],
            "net_open": [net],
            "max_concurrent": [mx],
        }
    )


def stateful_concurrency(events: DataFrame) -> DataFrame:
    """events(pool, ts_ms, seq, sign) stream → per-pool running state.

    Output mode 'update': one row per pool per micro-batch with the
    state *after* that batch.
    """
    return events.groupBy("pool").applyInPandasWithState(
        _update,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
