"""End-to-end sizing pipeline (the reference's EP2 replay lifecycle,
SURVEY.md §3): ingest → derive → classify → route → aggregate → sweep →
report values.

One cached derived DataFrame fans out to all branches — the derive block
runs once, every downstream branch is a filter/aggregate over it
(mirrors the reference's single row loop feeding multiple sinks).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..config import SizingParams
from ..operators.aggregates import argmax_query, size_matrix, summarize, utilization
from ..operators.classify import classify
from ..operators.derive import derive
from ..operators.route import RoutedPlan, route
from ..operators.sweep import explode_events, running_sums, sweep_maxima


@dataclass
class SizingResult:
    routed: RoutedPlan
    classified_kept: DataFrame
    summary: DataFrame          # single row: G1-G3, G6, G8
    argmax: DataFrame           # single row: G4
    matrix: DataFrame           # long-form size × dim counts (G5)
    utilization: DataFrame      # single row: G7
    sweep_running: DataFrame    # per-event running sums (F1-F3)
    sweep_maxima: DataFrame     # single row (F4)
    sweep_events: DataFrame | None = None  # cached explode; unpersist when done


def prepare_query_history(flat: DataFrame) -> DataFrame:
    """Boundary adapter: ISO-string timestamps (API/replay form) → the
    engine's epoch-millis interval columns + a deterministic ``seq``
    ordering key (SURVEY §7.3.3: one canonical internal schema, two
    boundary adapters).

    ``seq`` only has to be a deterministic total tie-break for the sweep
    and argmax — it is derived per-row as ``xxhash64(query_id)``
    (query_id is unique), NOT a global ``row_number()`` window, which
    would collapse every ingest to a single partition. Shuffle-free and
    partitioning-independent."""
    from pyspark.sql import functions as F

    return flat.withColumns(
        {
            "start_ms": F.unix_millis(F.to_timestamp("start_time")),
            "end_ms": F.unix_millis(F.to_timestamp("end_time")),
            "admission_wait": F.col("admission_wait").cast("long"),
            "num_backends": F.col("num_backends").cast("long"),
            "seq": F.xxhash64("query_id"),
        }
    )


def run_api_sizing(
    spark,
    params: SizingParams,
    fetcher=None,
    segmented_sweep: bool = True,
) -> SizingResult:
    """EP1: the reference's API-mode program (``impala_query_sizing.py:
    309-341``) — paged CM fetch → flatten → the shared sizing pipeline.

    ``fetcher`` is injectable (tests drive a loopback ``http.server``);
    by default it is the production ``requests_fetcher`` built from the
    params' CM connection fields. Everything downstream of the flatten is
    the SAME code path as EP2 replay, so EP1 ≡ EP2 on equivalent data is
    structural — pinned end-to-end in tests/test_ep1_e2e.py.
    """
    from ..sources.cm_api import (
        flatten_api_docs,
        load_api_queries,
        requests_fetcher,
    )

    if fetcher is None:
        fetcher = requests_fetcher(
            params.cm_url, params.cluster_name,
            params.user_name, params.password,
        )
    docs = load_api_queries(
        spark, fetcher, params.from_date, params.to_date, params.pool or None
    )
    qh = prepare_query_history(flatten_api_docs(docs))
    return run_sizing(qh, params, segmented_sweep=segmented_sweep)


def run_sizing(
    query_history: DataFrame,
    params: SizingParams,
    segmented_sweep: bool = True,
) -> SizingResult:
    routed = route(query_history, params, derive)
    classified_kept = classify(routed.kept)
    # G1 counts the cached derived table (row-equal to accepted) so the
    # count doesn't re-derive from source; the 1-row summary is itself
    # cached because three consumers read it (reports, utilization,
    # workload-size lookup)
    summary = summarize(routed.kept, routed.derived).cache()
    # events feed both the running-sums output and the maxima (and, when
    # segmented, the quantile pass) — cache so the explode runs once
    events = explode_events(routed.kept).cache()
    running = running_sums(events, segmented=segmented_sweep)
    return SizingResult(
        routed=routed,
        classified_kept=classified_kept,
        summary=summary,
        argmax=argmax_query(routed.kept),
        matrix=size_matrix(classified_kept),
        utilization=utilization(summary, params),
        sweep_running=running,
        sweep_maxima=sweep_maxima(running),
        sweep_events=events,
    )
