"""Extended query registry: generic OLAP coverage (joins, top-k, set ops,
grouping) and the training-data-pipeline operators (dedup, similarity,
text analysis, multimodal). Filled in as operators land; kept separate so
``__spark_entry__`` stays a thin contract file.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable[[SparkSession, str], DataFrame], sql: str | None) -> None:
    _QUERIES[name] = fn
    if sql is not None:
        _ORACLES[name] = sql


_LOADED = False


def _load_providers() -> None:
    """Import provider modules (they call :func:`register` at import)."""
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    from . import (
        asof,
        kmeans,
        multimodal,
        olap_extra,
        relational,
        sampling,
        similarity,
        text,
    )

    from . import rollup_cascade

    relational.register_all()
    olap_extra.register_all()
    rollup_cascade.register_all()
    asof.register_all()
    text.register_all()
    similarity.register_all()
    kmeans.register_all()
    multimodal.register_all()
    sampling.register_all()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load_providers()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_providers()
    return dict(_ORACLES)
