"""Sizing parameters — the engine's configuration contract.

Mirrors the ``key=value`` config of the reference
(``/root/reference/sizing.conf:1-29``, parsed at
``/root/reference/impala_query_sizing.py:88-117``) as a typed dataclass.

Faithful-vs-fixed ledger (SURVEY.md §7.0):
- ``cache_adjustment_pct`` is parsed but never applied in the reference
  (``impala_query_sizing.py:102`` with no use site) — we keep the field and
  likewise never apply it.
- ``scratch_adjustment_pct`` is present in the sample conf but never parsed
  (``sizing.conf:13``) — same here: accepted, ignored.
- ``mt_scaling_factor = round(0.93**(mt_dop-1) * mt_dop, 2)`` is a
  config-time scalar (``impala_query_sizing.py:112``).
- ``parallel_factor = max(mt_scaling_factor, vcores_per_node)`` — the
  per-query vcores cap is commented out in the reference
  (``impala_query_sizing.py:228-230``), so this is a config-time constant;
  we keep the ``max`` so re-enabling the cap is a one-line change.
"""

from __future__ import annotations

import base64
from dataclasses import dataclass, field
from pathlib import Path


@dataclass(frozen=True)
class SizingParams:
    """Typed sizing configuration with the reference's sample defaults
    (``/root/reference/sizing.conf:6-24``)."""

    from_date: str = "2021-07-12T00:00:00Z"
    to_date: str = "2021-08-12T00:00:00Z"
    pool: str | None = None  # None/'' => no pool filter

    mem_adjustment_pct: int = 100
    cache_adjustment_pct: int = 100  # parsed-but-never-applied (faithful)
    cpu_adjustment_pct: int = 80

    scratch_gb_per_node: int = 1000
    cache_gb_per_node: int = 1000
    query_mem_per_node: int = 200
    vcores_per_node: int = 16

    pod_limit: int = 100
    mt_dop: int = 12

    # sinks (EP2 replay parity)
    output_file: str | None = None
    prune_output_file: str | None = None
    skip_query_file: str | None = None
    input_file: str | None = None

    # API source (EP1)
    cm_url: str | None = None
    cluster_name: str | None = None
    user_name: str | None = None
    password: str | None = field(default=None, repr=False)

    @property
    def mt_scaling_factor(self) -> float:
        """``round(0.93**(mt_dop-1) * mt_dop, 2)``
        (``impala_query_sizing.py:112``; =5.40 for mt_dop=12)."""
        return round(0.93 ** (self.mt_dop - 1) * self.mt_dop, 2)

    @property
    def parallel_factor(self) -> float:
        """``max(mt_scaling_factor, vcores_per_node)``
        (``impala_query_sizing.py:229-230``; per-query cap disabled)."""
        return max(self.mt_scaling_factor, float(self.vcores_per_node))


def parse_conf(path: str | Path) -> SizingParams:
    """Parse a reference-style ``key=value`` config file
    (``impala_query_sizing.py:88-92``): no comments, no quoting, one pair
    per line; trailing whitespace in values tolerated (the sample file has
    trailing tabs on ``pool``)."""
    raw: dict[str, str] = {}
    for line in Path(path).read_text().splitlines():
        if not line.strip():
            continue
        key, _, value = line.partition("=")
        raw[key.strip()] = value.strip()

    password = None
    if "pfile" in raw and Path(raw["pfile"]).exists():
        # base64-decoded secret file (impala_query_sizing.py:95-96)
        password = base64.b64decode(
            Path(raw["pfile"]).read_text().rstrip()
        ).decode("utf-8")

    def _int(key: str, default: int) -> int:
        return int(raw[key]) if key in raw else default

    return SizingParams(
        from_date=raw.get("from", SizingParams.from_date),
        to_date=raw.get("to", SizingParams.to_date),
        pool=raw.get("pool") or None,
        mem_adjustment_pct=_int("mem_adjustment_pct", 100),
        cache_adjustment_pct=_int("cache_adjustment_pct", 100),
        cpu_adjustment_pct=_int("cpu_adjustment_pct", 80),
        scratch_gb_per_node=_int("scratch_gb_per_node", 1000),
        cache_gb_per_node=_int("cache_gb_per_node", 1000),
        query_mem_per_node=_int("query_mem_per_node", 200),
        vcores_per_node=_int("vcores_per_node", 16),
        pod_limit=_int("pod_limit", 100),
        mt_dop=_int("mt_dop", 12),
        output_file=raw.get("output_file"),
        prune_output_file=raw.get("prune_output_file"),
        skip_query_file=raw.get("skip_query_file"),
        input_file=raw.get("input_file"),
        cm_url=raw.get("cm_url"),
        cluster_name=raw.get("cluster_name"),
        user_name=raw.get("user_name"),
        password=password,
    )


DEFAULT_PARAMS = SizingParams()
