"""Compare two bench outputs per query.

Usage: python tools/bench_compare.py OLD.json NEW.json

Accepts either bench.py's raw one-line JSON or the driver's BENCH_r{N}.json
wrapper (which nests the line under "parsed"). Prints per-query old/new
seconds and the ratio, sorted by new cost — remember this container's
~1.7× run-to-run jitter when reading single-digit ratios (README).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    return doc.get("parsed", doc)


def main() -> None:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old["queries"], new["queries"]
    print(f"total: {old['value']:.2f}s -> {new['value']:.2f}s "
          f"(x{new['value'] / old['value']:.2f}); "
          f"n={old.get('n', 1)} -> {new.get('n', 1)}")
    print(f"{'query':34s} {'old':>7s} {'new':>7s} {'ratio':>6s}")
    for name in sorted(set(oq) | set(nq), key=lambda q: -nq.get(q, 0.0)):
        o, n = oq.get(name), nq.get(name)
        ratio = f"{n / o:6.2f}" if o and n and o > 0 else "   n/a"
        fmt = lambda v: f"{v:7.2f}" if v is not None else "      -"
        print(f"{name:34s} {fmt(o)} {fmt(n)} {ratio}")


if __name__ == "__main__":
    main()
