"""Streaming heavy hitters with bounded state — the Space-Saving summary
(Metwally/Agrawal/El Abbadi 2005, "Efficient Computation of Frequent and
Top-k Elements in Data Streams") as an ``applyInPandasWithState``
operator.

Sharding: items route to ``hash(item) % n_groups`` state groups, so each
group runs an INDEPENDENT capacity-``cap`` summary over a disjoint slice
of the item space. State per group is three parallel arrays of at most
``cap`` entries — constant memory per group no matter how long the
stream runs, which is the whole point: an exact streaming groupBy-count
holds one counter per DISTINCT item forever (unbounded on an open item
domain), Space-Saving holds ``cap`` and still guarantees:

- no false negatives: any item whose true group-local frequency exceeds
  N_g / cap is tracked at all times;
- per-item bounds: est_count - err <= true_count <= est_count.

Both guarantees are pinned against exact batch counts in
``tests/test_streaming_heavyhitters.py``, along with stream ≡ sequential
reference across micro-batch boundaries and the state-size bound.

Determinism: rows fold in (ts_ms, seq) order within each batch; eviction
picks the minimum (count, item) lexicographically, so the summary is a
pure function of the arrival order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEFAULT_CAP = 8

OUTPUT_SCHEMA = "grp long, item string, est_count long, err long"
STATE_SCHEMA = "items array<string>, counts array<long>, errs array<long>"


def spacesaving_fold(
    rows: list[str], summary: dict[str, list[int]], cap: int
) -> None:
    """The textbook update, in place: ``summary[item] = [count, err]``."""
    for item in rows:
        if item in summary:
            summary[item][0] += 1
        elif len(summary) < cap:
            summary[item] = [1, 0]
        else:
            evict = min(summary, key=lambda k: (summary[k][0], k))
            mincnt = summary[evict][0]
            del summary[evict]
            summary[item] = [mincnt + 1, mincnt]


def make_update(cap: int = DEFAULT_CAP):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, errs = state.get
            summary = {
                i: [int(c), int(e)] for i, c, e in zip(items, counts, errs)
            }
        else:
            summary = {}
        # A group's micro-batch can span multiple Arrow record batches
        # (default batch size ~10k rows), and sorting each chunk
        # independently would fold rows out of global (ts_ms, seq)
        # order — concat first, sort ONCE, then fold.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts_ms", "seq"]
            )
            spacesaving_fold(list(batch["item"]), summary, cap)
        ordered = sorted(summary)
        state.update(
            (
                ordered,
                [summary[i][0] for i in ordered],
                [summary[i][1] for i in ordered],
            )
        )
        yield pd.DataFrame(
            {
                "grp": [key[0]] * len(ordered),
                "item": ordered,
                "est_count": [summary[i][0] for i in ordered],
                "err": [summary[i][1] for i in ordered],
            }
        )

    return _update


def heavyhitters_stream(
    events: DataFrame, cap: int = DEFAULT_CAP, output_mode: str = "update"
) -> DataFrame:
    """events(grp, item, ts_ms, seq) stream → the full capacity-``cap``
    summary of every state group after each micro-batch (the latest row
    set per group is the current summary). ``output_mode='append'``
    pairs with a file sink for checkpoint-recoverable runs: the sink
    then holds the full snapshot history, exactly once."""
    return events.groupBy("grp").applyInPandasWithState(
        make_update(cap),
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        output_mode,
        GroupStateTimeout.NoTimeout,
    )


def global_topk(summary: DataFrame, k: int, cap: int = DEFAULT_CAP) -> DataFrame:
    """Merged view over the per-shard summaries (r5 verdict #5).

    Shards partition the item space (items route by ``hash(item) %
    n_groups``), so an item lives in exactly one shard's summary and
    the UNION of the shard summaries IS the global summary — merging is
    selection, not counter addition. The honest combined guarantee is
    therefore per-shard, surfaced as a column: ``guarantee_bound =
    max_g(N_g) / cap``, where ``N_g = sum(est_count)`` over shard g's
    summary (a Space-Saving invariant: every arrival adds exactly 1 to
    the summary's total, evictions preserve it, so the summary total
    equals the shard's stream length). Any item whose true GLOBAL count
    exceeds ``guarantee_bound`` exceeds its own shard's ``N_g / cap``
    and is guaranteed present — no false negatives above the bound.
    Per-item bounds carry over unchanged: ``est - err <= true <= est``.

    The output keeps EVERY row with ``est_count > guarantee_bound`` in
    addition to the top-``k`` by estimate (r6 ADVICE: a plain
    ``rank <= k`` cut could push a true heavy hitter out of the view
    when other items carry inflated estimates, so the no-false-negative
    guarantee would only hold pre-truncation). ``true <= est``, so any
    item with ``true > guarantee_bound`` satisfies the kept predicate —
    the guarantee survives truncation. The result is still bounded by
    ``n_groups * cap`` rows by construction, never by the stream, so
    the partition-less window is safe at any scale.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    totals = summary.groupBy("grp").agg(
        F.sum("est_count").alias("n_g")
    )
    bound = totals.agg(
        (F.max("n_g") / F.lit(cap)).alias("guarantee_bound")
    )
    w = Window.orderBy(F.col("est_count").desc(), F.col("item").asc())
    return (
        summary.join(totals, "grp")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(bound))
        .filter(
            (F.col("rank") <= k)
            | (F.col("est_count") > F.col("guarantee_bound"))
        )
        .select(
            "rank", "item", "grp", "est_count", "err", "n_g",
            "guarantee_bound",
        )
    )
