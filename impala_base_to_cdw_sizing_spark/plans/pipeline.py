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


def run_sizing(
    query_history: DataFrame,
    params: SizingParams,
    segmented_sweep: bool = False,
) -> SizingResult:
    routed = route(query_history, params, derive)
    classified_kept = classify(routed.kept)
    summary = summarize(routed.kept, routed.accepted)
    running = running_sums(explode_events(routed.kept), segmented=segmented_sweep)
    return SizingResult(
        routed=routed,
        classified_kept=classified_kept,
        summary=summary,
        argmax=argmax_query(routed.kept),
        matrix=size_matrix(classified_kept),
        utilization=utilization(summary, params),
        sweep_running=running,
        sweep_maxima=sweep_maxima(running),
    )
