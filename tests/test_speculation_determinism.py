"""Task-retry/speculation determinism (r8 verdict #7), slow tier.

Runs ``tools/speculation_check.py`` in a subprocess (speculation is a
SparkContext-level conf, so the check needs sessions the shared fixture
cannot provide): the five cap-bearing queries execute once under
aggressive speculation (nearly every task gets a racing duplicate
attempt) and once clean, and their collected results must be exactly
equal — any timing-dependent anchor selection would diff.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow


def test_cap_bearing_queries_are_retry_deterministic():
    proc = subprocess.run(
        [sys.executable, "tools/speculation_check.py"],
        capture_output=True, text=True, timeout=1200,
        cwd=str(Path(__file__).resolve().parent.parent),
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    verdicts = json.loads(line).get("queries", {})
    assert proc.returncode == 0, f"{verdicts or proc.stderr[-2000:]}"
    assert set(verdicts.values()) == {"ok"}, verdicts
