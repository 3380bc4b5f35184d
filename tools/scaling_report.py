"""Per-query scaling exponents from two bench runs (VERDICT r4 item #1).

Reads two ``bench.py`` JSON outputs taken at different scale factors and
prints a markdown table of empirical scaling exponents

    alpha = log(t_hi / t_lo) / log(sf_hi / sf_lo)

per query, flagging anything materially super-linear. alpha <= ~1.15 is
linear-or-better (constant overheads at the small end usually push
alpha BELOW 1 — fixed planning/session cost amortizes as sf grows);
alpha in (1.15, 1.45] is mildly super-linear (worth a cause note);
alpha > 1.45 is flagged as a scale hazard.

Usage: python tools/scaling_report.py bench_lo.json bench_hi.json
"""

from __future__ import annotations

import json
import math
import sys


def load(path: str) -> dict:
    with open(path) as f:
        rec = json.loads(f.read().strip().splitlines()[-1])
    # the stdout line defaults to the 13-row sizing subset unless
    # SPARK_GRAFT_BENCH_FULL=1; fall back to the detail file's full
    # per-query mins so a probe run can't silently shrink coverage
    # (r12 ADVICE)
    detail = rec.get("detail_file")
    if detail and rec.get("n_queries", 0) > len(rec.get("queries", {})):
        import os

        if not os.path.isabs(detail):
            detail = os.path.join(os.path.dirname(os.path.abspath(path)), detail)
        try:
            with open(detail) as f:
                rec = {**rec, "queries": json.load(f)["queries_min"]}
        except (OSError, KeyError, json.JSONDecodeError) as exc:
            # loud, not silent (r12/r13 ADVICE): without the detail file
            # the table covers only the compact stdout subset
            print(
                f"WARNING: {path}: detail file {detail!r} unreadable "
                f"({exc}); table covers only {len(rec.get('queries', {}))}"
                f"/{rec.get('n_queries', '?')} queries",
                file=sys.stderr,
            )
    return rec


def main() -> None:
    lo, hi = load(sys.argv[1]), load(sys.argv[2])
    ratio_sf = hi["sf"] / lo["sf"]
    rows = []
    skipped = []
    for name, t_lo in sorted(lo["queries"].items()):
        t_hi = hi["queries"].get(name)
        if t_hi is None:
            skipped.append(name)
            continue
        t_lo = max(t_lo, 1e-3)
        alpha = math.log(max(t_hi, 1e-3) / t_lo) / math.log(ratio_sf)
        rows.append((alpha, name, t_lo, t_hi))
    rows.sort(reverse=True)
    flag = lambda a: "**HAZARD**" if a > 1.45 else ("note" if a > 1.15 else "ok")
    print(f"| query | t(sf{lo['sf']}) s | t(sf{hi['sf']}) s | alpha | verdict |")
    print("|---|---|---|---|---|")
    for alpha, name, t_lo, t_hi in rows:
        print(f"| {name} | {t_lo:.2f} | {t_hi:.2f} | {alpha:.2f} | {flag(alpha)} |")
    total = math.log(hi["value"] / lo["value"]) / math.log(ratio_sf)
    print(f"| **suite total** | {lo['value']:.1f} | {hi['value']:.1f} | {total:.2f} | {flag(total)} |")
    expected = max(lo.get("n_queries", 0), hi.get("n_queries", 0))
    if skipped or (expected and len(rows) < expected):
        print(
            f"\nWARNING: exponents cover {len(rows)}/{expected or '?'} queries"
            + (f"; missing in hi run: {', '.join(sorted(skipped))}" if skipped else "")
            + " — rerun both benches with SPARK_GRAFT_BENCH_FULL=1",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
