"""Streaming distribution-drift monitor — the stream twin of
``rel_drift_psi``.

An ingest pipeline does not get to re-scan the reference window per
micro-batch: the reference histogram is computed ONCE (batch, before
deployment) and the live stream maintains only the current-window bin
counts — a streaming ``groupBy(event_type, bin).count()`` in update
mode, state bounded at #types x #bins rows forever. PSI is then pure
arithmetic over (reference, current) counts, evaluated on the updated
counts after each micro-batch.

The contract that keeps this honest: the arithmetic is the SAME
function the batch op uses (``olap_extra.psi_table`` — shared code,
not a reimplementation), so after the stream has consumed exactly the
batch op's current window, the streaming monitor's PSI table must
equal ``rel_drift_psi``'s output row-for-row. That identity is pinned
in ``tests/test_streaming_drift.py`` across multiple micro-batches,
along with the mid-stream monotone property a monitor needs: PSI is
defined (and finite) after EVERY batch, not just at the end.

Scale: the streaming state is the dense count grid (tiny, constant);
the reference is a broadcast local frame; each batch's PSI evaluation
touches #types x #bins rows. Nothing in this path grows with the
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.olap_extra import psi_bin_expr


def binned_counts_stream(events: DataFrame) -> DataFrame:
    """events stream (event_type, value, ...) → update-mode cumulative
    counts per (event_type, bin). This is the ONLY stateful piece —
    state is one row per occupied grid cell, bounded by construction."""
    from pyspark.sql import functions as F

    return (
        events.selectExpr("event_type", f"{psi_bin_expr('value')} AS bin")
        .groupBy("event_type", "bin")
        .agg(F.count("*").cast("long").alias("c"))
    )


def psi_against_reference(
    cur_counts: DataFrame, ref_counts: DataFrame, types: DataFrame
) -> DataFrame:
    """Current-counts snapshot + static reference → the PSI table, via
    the exact batch arithmetic (``psi_table``)."""
    from ..operators.olap_extra import psi_table

    return psi_table(ref_counts, cur_counts, types)
