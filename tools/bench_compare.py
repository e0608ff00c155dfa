"""Compare two bench outputs per query, host-drift-normalized.

Usage: python tools/bench_compare.py [OLD.json] [NEW.json] [--md]

Defaults (the r7 lesson: regression calls MUST anchor on DRIVER
artifacts, not a pre-driver local run): OLD defaults to the highest-
numbered BENCH_r{N}.json in the repo root — the last driver-recorded
bench — and NEW defaults to BENCH.json, the durable record of the most
recent local bench.py run. Pass paths explicitly to override.

Accepts either bench.py's raw one-line JSON or the driver's BENCH_r{N}.json
wrapper (which nests the line under "parsed"). For each query it prints
old/new seconds, the raw ratio, and — when both files carry the ``calib``
host-speed probe — the CALIB-ADJUSTED ratio (raw ratio divided by
calib_new/calib_old), which removes container drift from the comparison.
When both files carry ``queries_min`` (bench.py's durable BENCH.json
does; the driver wrapper's "parsed" line does not), the comparison is
min-vs-min — the best observed cold-cache execution on each side —
otherwise median-vs-median; min-vs-median cross-comparisons are refused
because they bias every ratio upward (the r5→r6 ambiguity this tool
exists to end).

``--md`` emits a markdown table (for BENCH_COMPARE.md). Exit code is 2
when any query's adjusted (or raw, if no calib) ratio exceeds
REGRESSION_THRESHOLD — the "fix anything >1.3× adjusted" gate.
"""

from __future__ import annotations

import json
import sys

REGRESSION_THRESHOLD = 1.3


def load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc:
        return doc
    parsed = doc.get("parsed")
    if not isinstance(parsed, dict):
        raise SystemExit(f"{path}: no 'queries' and no parseable 'parsed'")
    return parsed


def pick_series(old: dict, new: dict) -> tuple[dict, dict, str]:
    """min-vs-min when BOTH sides have it, else median-vs-median."""
    if "queries_min" in old and "queries_min" in new:
        return old["queries_min"], new["queries_min"], "min-of-n"
    return old["queries"], new["queries"], "median-of-n"


def latest_driver_bench() -> str:
    """Highest-numbered BENCH_r{N}.json next to the repo root."""
    import glob
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cands = glob.glob(os.path.join(root, "BENCH_r*.json"))
    num = lambda p: int(re.search(r"BENCH_r(\d+)", p).group(1))
    if not cands:
        raise SystemExit("no BENCH_r*.json driver artifact found")
    return max(cands, key=num)


def main() -> None:
    import os

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    md = "--md" in sys.argv
    if len(args) == 0:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        args = [latest_driver_bench(), os.path.join(root, "BENCH.json")]
    elif len(args) == 1:
        args = [latest_driver_bench(), args[0]]
    print(f"old={args[0]}  new={args[1]}", file=sys.stderr)
    old, new = load(args[0]), load(args[1])
    oq, nq, series = pick_series(old, new)
    co, cn = old.get("calib"), new.get("calib")
    drift = (cn / co) if co and cn else None

    rows = []
    for name in sorted(set(oq) | set(nq), key=lambda q: -nq.get(q, 0.0)):
        o, n = oq.get(name), nq.get(name)
        raw = n / o if o and n and o > 0 and n > 0 else None
        adj = raw / drift if raw is not None and drift else None
        rows.append((name, o, n, raw, adj))

    worst = [
        (name, adj if adj is not None else raw)
        for name, _, _, raw, adj in rows
        if (adj if adj is not None else raw) is not None
        and (adj if adj is not None else raw) > REGRESSION_THRESHOLD
    ]

    head = (
        f"series={series}; total {old['value']:.2f}s -> {new['value']:.2f}s "
        f"(x{new['value'] / old['value']:.2f}); "
        f"calib {co if co is not None else '-'} -> "
        f"{cn if cn is not None else '-'}"
        + (f" (host drift x{drift:.2f}; ratios below are drift-adjusted)"
           if drift else " (no calib on one side: RAW ratios only)")
    )
    if md:
        print(f"# bench compare\n\n{head}\n")
        print("| query | old s | new s | raw | adjusted |")
        print("|---|---:|---:|---:|---:|")
        for name, o, n, raw, adj in rows:
            f = lambda v, p="%.2f": (p % v) if v is not None else "-"
            print(f"| {name} | {f(o, '%.3f')} | {f(n, '%.3f')} |"
                  f" {f(raw)} | {f(adj)} |")
        if worst:
            print(f"\n**regressions > x{REGRESSION_THRESHOLD} adjusted:** "
                  + ", ".join(f"{n} (x{r:.2f})" for n, r in worst))
        else:
            print(f"\nNo query exceeds x{REGRESSION_THRESHOLD} adjusted.")
    else:
        print(head)
        print(f"{'query':34s} {'old':>8s} {'new':>8s} {'raw':>6s} {'adj':>6s}")
        for name, o, n, raw, adj in rows:
            f = lambda v, w=8: (f"%{w}.3f" % v) if v is not None else " " * (w - 1) + "-"
            fr = lambda v: (f"{v:6.2f}") if v is not None else "   n/a"
            print(f"{name:34s} {f(o)} {f(n)} {fr(raw)} {fr(adj)}")
        if worst:
            print(f"regressions > x{REGRESSION_THRESHOLD}: "
                  + ", ".join(f"{n} (x{r:.2f})" for n, r in worst))
    sys.exit(2 if worst else 0)


if __name__ == "__main__":
    main()
