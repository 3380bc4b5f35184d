"""EP2 with sinks on disk at sf1 (r7 verdict #5) — slow.

``bench.py``'s ep2_full_pipeline row uses a noop sink; the reference's
actual mode writes three CSV outputs. This test runs the complete EP2 —
pipeline + ``write_sizing_outputs`` + reports — at the sf1 derivation
and pins the sink layout contract at scale: the main and skipped sinks
exist with headers/parts, the pruned sink obeys the lazy-open rule
(only written because pruned rows exist — and the reference's B2
contract says a prune-free run must NOT create it, separately pinned
at tiny scale in test_sources_sinks), and row counts reconcile with
the router's splits. Skips when the gitignored .testdata/sf1
derivation is absent (tools/gen_sf1.py).
"""

from __future__ import annotations

from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parent.parent
_SF1 = _REPO / ".testdata" / "sf1"


@pytest.mark.slow
def test_ep2_sink_layout_at_sf1(spark, tmp_path):
    if not _SF1.exists():
        pytest.skip(".testdata/sf1 not generated (tools/gen_sf1.py)")
    import sys

    sys.path.insert(0, str(_REPO / "tools"))
    from ep2_bench import run_ep2_with_sinks

    out = run_ep2_with_sinks(spark, str(_SF1), str(tmp_path))
    rows, parts = out["rows"], out["part_files"]

    # sf1 = 10 key-strided copies of sf0.1 (~870k kept queries): every
    # split is non-empty, so all three sinks exist on disk
    assert rows["kept"] > 500_000
    assert rows["pruned"] > 0 and rows["skipped"] > 0
    assert parts["kept"] >= 1 and parts["skipped"] >= 1
    assert parts["pruned"] >= 1  # lazy sink DID open (pruned rows exist)

    # layout: a directory of part files with a header per part — the
    # distributed contract (never one serialized file by accident)
    main_dir = tmp_path / "sizing.csv"
    part_files = sorted(main_dir.glob("part-*"))
    assert len(part_files) == parts["kept"]
    header = part_files[0].read_text().splitlines()[0]
    assert header.startswith("query_id,pool,start_time")
    assert "in_executor_pod_spill" in header  # reference's header typo kept

    # row reconciliation: CSV data lines == kept count
    n_lines = sum(
        max(0, len(p.read_text().splitlines()) - 1) for p in part_files
    )
    assert n_lines == rows["kept"]
