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

Drift-band guard (r13 verdict item 1): the calib probe is a single
JIT-sensitive JVM burst and has been observed swinging 2.75× while the
workload moved 0.93× (BENCH_COMPARE.md r10 postmortem declared swings
like that non-renormalizable). When the calib ratio falls OUTSIDE
``DRIFT_BAND`` the adjusted column is suppressed entirely: ratios are
RAW-only with a loud warning, and the regression gate runs on the raw
ratios — a calib pair that extreme tells you the probe sampled two
different JIT/contention phases, not that the host got 2.75× faster.

Old-side min recovery: the driver's BENCH_r{N}.json wrapper nests only
the stdout line (medians, no ``queries_min``), but the driver's own
bench run also wrote the git-tracked BENCH.json in the SAME commit —
when the old side lacks ``queries_min``, this tool recovers it from
``git show <commit-of-BENCH_r{N}>:BENCH.json`` (verified to be the same
run by matching totals) so min-vs-min engages on driver artifacts.
When the wrapper is NOT YET COMMITTED (the judge runs the compare
before the round's artifact commit — exactly the r17 false exit-2),
recovery falls back to the WORKING-TREE BENCH.json under the same
same-run totals check.

Min corroboration (r17 verdict task 3): a 3-sample median is inflated
by any slow iteration (r17's iteration totals spread 1.9×), so when
min data exists for a query, a mover must ALSO read > x1.15 min-vs-min
(raw) to gate. Movers excused this way print a dedicated
"median-jitter" call-out — the judge's q19 adjudication (median x2.28,
min-vs-min x1.00 on an untouched module) mechanized. Additionally,
whenever the displayed series is min-of-n, queries whose MEDIAN raw
ratio exceeds the threshold while their min ratio stays ≤ x1.15 get
the same informational call-out, so the median movement is visible
without gating.

Known-noisy suppression: ``async_ordered_identity`` inside its measured
0.8–1.7 s GIL-contention band (BENCH_COMPARE.md r8 adjudication) is
excluded from the regression gate — it moves >2× raw with co-located
CPU load on unchanged code. It still prints.
"""

from __future__ import annotations

import json
import sys

REGRESSION_THRESHOLD = 1.3
#: Calib ratios outside this band are treated as probe artifacts, not
#: host drift: suppress adjusted ratios, gate on raw (r13 verdict).
DRIFT_BAND = (0.67, 1.5)
#: (query, low_s, high_s): new-side seconds inside the band are excluded
#: from the regression gate — measured same-code jitter envelopes.
NOISY_BANDS = {"async_ordered_identity": (0.8, 1.7)}

#: Queries whose wall time is dominated by DRIVER-LOOP overhead — many
#: tiny driver-submitted jobs with Python between them (a collect per
#: merge/BFS/Lloyd/convergence round), so per-job scheduling + collect
#: latency, not data-plane throughput, sets their time. The r15 round
#: showed this class swings up to 5.5× raw under host contention while
#: jvm/arrow/shuffle probes move far less; bench.py's calib_basket
#: gained a matching 'driverloop' probe (fixed 10-round 1-row argmax
#: collect loop) so this class adjusts by ITS regime like the others.
#: Membership is by implementation shape (grep: collect() inside a
#: round loop): bpe.py:175, clustering.py:130, graph.py:145,
#: components.py:212, centroids.py:61/71, pca.py:166 driver power
#: iteration, dsir.py:204-207 broadcast collects.
DRIVERLOOP_QUERIES = {
    "bpe_merges",
    "pca_top_component",
    "semantic_kmeans",
    "semantic_clusters",
    "nearest_centroid",
    "graph_shortest_hops",
    "dedup_components",
    "curated_corpus_neardup",
    "multimodal_neardup",
    "dsir_resample",
}


def load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    if "queries" in doc:
        return doc
    parsed = doc.get("parsed")
    if not isinstance(parsed, dict):
        raise SystemExit(f"{path}: no 'queries' and no parseable 'parsed'")
    return parsed


def recover_min_from_git(wrapper_path: str, parsed: dict) -> dict | None:
    """For a driver BENCH_r{N}.json (no ``queries_min``): read the
    git-tracked BENCH.json from the commit that introduced the wrapper —
    the driver's bench run wrote both in the same commit. An UNCOMMITTED
    wrapper (no git history yet — the judge's pre-commit compare, the
    r18 fix) falls back to the working-tree BENCH.json under the same
    same-run check. Returns the full BENCH.json dict only if it is
    verifiably the SAME run (totals match to the cent); None on any
    git/shape mismatch."""
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    name = os.path.basename(wrapper_path)
    doc = None
    try:
        commit = subprocess.run(
            ["git", "log", "--format=%H", "-n", "1", "--", name],
            cwd=root, capture_output=True, text=True, check=True,
        ).stdout.strip()
        if commit:
            blob = subprocess.run(
                ["git", "show", f"{commit}:BENCH.json"],
                cwd=root, capture_output=True, text=True, check=True,
            ).stdout
            doc = json.loads(blob)
    except (subprocess.CalledProcessError, json.JSONDecodeError, OSError):
        doc = None
    if doc is None:
        # Wrapper absent from git history (or git unavailable): the run
        # that wrote it also wrote the repo-root BENCH.json — try the
        # working tree, gated by the identical same-run totals check.
        try:
            with open(os.path.join(root, "BENCH.json")) as fh:
                doc = json.load(fh)
        except (OSError, json.JSONDecodeError):
            return None
    if "queries_min" not in doc:
        return None
    if abs(doc.get("value", -1) - parsed.get("value", -2)) > 0.01:
        return None  # different run — do not silently mix
    return doc


def pick_series(old: dict, new: dict) -> tuple[dict, dict, str]:
    """min-vs-min when BOTH sides have it, else median-vs-median."""
    if "queries_min" in old and "queries_min" in new:
        return old["queries_min"], new["queries_min"], "min-of-n"
    return old["queries"], new["queries"], "median-of-n"


def load_regimes() -> dict[str, str]:
    """query → runtime regime ('arrow' | 'shuffle' | 'jvm'), mechanized
    from PLAN_AUDIT.md: an Arrow/Python stage puts a query in the
    arrow regime (GIL/worker-bound — the r8 postmortem's class); else
    ≥4 hash exchanges marks it shuffle-bound; everything else is
    whole-stage-codegen jvm. Empty dict if the audit file is absent."""
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "PLAN_AUDIT.md")
    regimes: dict[str, str] = {}
    try:
        with open(path) as fh:
            for line in fh:
                m = re.match(
                    r"\| (\S+?) [^|]*\| (\d+) \|[^|]*\|[^|]*\|[^|]*\|"
                    r"[^|]*\|[^|]*\|[^|]*\| (✓?) *\|",
                    line,
                )
                if not m:
                    continue
                name, shuf, py = m.group(1), int(m.group(2)), m.group(3)
                regimes[name] = (
                    "arrow" if py else ("shuffle" if shuf >= 4 else "jvm")
                )
    except OSError:
        return {}
    return regimes


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
    def with_recovered_min(doc: dict, path: str, side: str) -> dict:
        if "queries_min" in doc or "BENCH_r" not in os.path.basename(path):
            return doc
        rec = recover_min_from_git(path, doc)
        if rec is None:
            return doc
        print(
            f"{side}-side queries_min recovered from the git-tracked "
            f"BENCH.json at the {os.path.basename(path)} commit "
            f"(same-run totals verified)",
            file=sys.stderr,
        )
        return rec

    old = with_recovered_min(old, args[0], "old")
    new = with_recovered_min(new, args[1], "new")
    oq, nq, series = pick_series(old, new)
    # Raw min- and median-ratio maps for corroboration (r18, verdict
    # task 3): a 3-sample median inflates under intra-run spread (r17's
    # iteration totals ranged 1.9×), so min data — native or recovered —
    # corroborates or excuses any flagged mover below.
    min_ratio: dict[str, float] = {}
    if "queries_min" in old and "queries_min" in new:
        mo, mn = old["queries_min"], new["queries_min"]
        min_ratio = {
            q: mn[q] / mo[q]
            for q in set(mo) & set(mn)
            if mo[q] > 0 and mn[q] > 0
        }
    qo_med, qn_med = old.get("queries", {}), new.get("queries", {})
    med_ratio = {
        q: qn_med[q] / qo_med[q]
        for q in set(qo_med) & set(qn_med)
        if qo_med[q] > 0 and qn_med[q] > 0
    }
    co, cn = old.get("calib"), new.get("calib")
    raw_drift = (cn / co) if co and cn else None
    # Outside the band the probe pair is an artifact, not host drift:
    # suppress adjustment entirely and gate on raw ratios.
    drift_artifact = raw_drift is not None and not (
        DRIFT_BAND[0] <= raw_drift <= DRIFT_BAND[1]
    )
    drift = None if drift_artifact else raw_drift

    # Per-regime basket adjustment (BENCH_COMPARE.md r14): when both
    # sides carry calib_basket, each query is adjusted by ITS regime's
    # component ratio (jvm/arrow/shuffle, classified from PLAN_AUDIT.md)
    # instead of the single JVM scalar. A component pair outside the
    # drift band is dropped (that regime falls back to the scalar/raw).
    bo, bn = old.get("calib_basket"), new.get("calib_basket")
    basket_drift: dict[str, float] = {}
    if isinstance(bo, dict) and isinstance(bn, dict):
        for comp in ("jvm", "arrow", "shuffle", "driverloop"):
            if bo.get(comp) and bn.get(comp):
                r = bn[comp] / bo[comp]
                # The driverloop probe measures per-job fixed overhead,
                # which legitimately swings wider than codegen
                # throughput under contention (observed up to 5.5× on
                # the workload side in r15) — give it a wider credible
                # band so a genuinely-contended sample still adjusts
                # instead of falling back to the jvm scalar.
                lo, hi = (0.5, 3.0) if comp == "driverloop" else DRIFT_BAND
                if lo <= r <= hi:
                    basket_drift[comp] = r
    regimes = load_regimes() if basket_drift else {}
    # Driver-loop membership overrides the plan-shape classification:
    # a kmeans round IS one scan + one agg (jvm by plan shape), but its
    # wall time is N driver round-trips (r15 verdict item 1). Only
    # effective when both sides carry the 'driverloop' basket probe —
    # old artifacts without it fall back to the plan-shape regime.
    if "driverloop" in basket_drift:
        for q in DRIVERLOOP_QUERIES:
            regimes[q] = "driverloop"

    rows = []
    for name in sorted(set(oq) | set(nq), key=lambda q: -nq.get(q, 0.0)):
        o, n = oq.get(name), nq.get(name)
        raw = n / o if o and n and o > 0 and n > 0 else None
        divisor = basket_drift.get(regimes.get(name, "jvm")) or drift
        adj = raw / divisor if raw is not None and divisor else None
        rows.append((name, o, n, raw, adj))

    def in_noisy_band(name: str, n: float | None) -> bool:
        band = NOISY_BANDS.get(name)
        return band is not None and n is not None and band[0] <= n <= band[1]

    # Raw corroboration (r16): an adjusted-ratio flag whose RAW ratio is
    # flat is a PROBE artifact, not a regression — r16 saw the arrow
    # probe swing ×0.69 on an idle host, inflating four flat-raw queries
    # past the adjusted gate (multimodal_neardup_incremental raw ×1.02 →
    # adj ×1.48). The excused ceiling is REGIME-DEPENDENT because the
    # divisor band is: for jvm/arrow/shuffle rows (divisor floor
    # DRIFT_BAND[0]=0.67) the worst real regression this can excuse is
    # raw ≤1.15 / 0.67 ≈ adj ×1.72; for driverloop rows (floor 0.5) it
    # is raw ≤1.15 / 0.5 ≈ adj ×2.3 (r17, per ADVICE). Acceptable
    # against the recurring false exit-2s — the per-job-latency regime
    # is exactly where this host swings hardest and a raw ≤1.15 mover
    # is bounded in absolute seconds — but driverloop-excused rows
    # above the ×1.72 cross-regime ceiling get their own call-out so a
    # reader sizes the residual risk correctly. Unconfirmed flags still
    # PRINT below, they just don't gate.
    RAW_CORROBORATION = 1.15
    CROSS_REGIME_CEILING = round(RAW_CORROBORATION / DRIFT_BAND[0], 2)  # 1.72
    # Cross-series corroboration (r18, verdict task 3): a real code
    # regression shifts the WHOLE timing distribution, so a flagged
    # mover must read > x1.15 on EVERY available raw series (min AND
    # median) to gate. One series moving while the other is flat is
    # sampling noise: the r17 q19 shape (median x2.28, min x1.00 —
    # iteration spread inflating a 3-sample median) and its mirror
    # (token_percentiles min x1.22, median x0.99 — one lucky old-side
    # min). Excused movers print in the call-outs below, never gate.
    def series_corroborated(name: str) -> bool:
        for other in (min_ratio, med_ratio):
            if name in other and other[name] <= RAW_CORROBORATION:
                return False
        return True

    worst = [
        (name, adj if adj is not None else raw)
        for name, _, n, raw, adj in rows
        if (adj if adj is not None else raw) is not None
        and (adj if adj is not None else raw) > REGRESSION_THRESHOLD
        and (raw is None or raw > RAW_CORROBORATION)
        and series_corroborated(name)
        and not in_noisy_band(name, n)
    ]
    # Movers flagged on the DISPLAYED series but excused by the other
    # series reading flat — informational, never gated.
    cross_excused = [
        (name, raw, min_ratio.get(name), med_ratio.get(name))
        for name, _, n, raw, adj in rows
        if (adj if adj is not None else raw) is not None
        and (adj if adj is not None else raw) > REGRESSION_THRESHOLD
        and raw is not None and raw > RAW_CORROBORATION
        and not series_corroborated(name)
        and not in_noisy_band(name, n)
    ]
    excused_names = {name for name, *_ in cross_excused}
    # Median movers with a flat min that never flagged the displayed
    # series at all (min-of-n display hides them): same call-out class.
    median_jitter = sorted(
        (name, med_ratio[name], min_ratio[name])
        for name in med_ratio
        if name in min_ratio
        and name not in excused_names
        and med_ratio[name] > REGRESSION_THRESHOLD
        and min_ratio[name] <= RAW_CORROBORATION
        and not in_noisy_band(name, nq.get(name))
    )
    probe_inflated = [
        (name, adj, raw)
        for name, _, n, raw, adj in rows
        if adj is not None and adj > REGRESSION_THRESHOLD
        and raw is not None and raw <= RAW_CORROBORATION
        and not in_noisy_band(name, n)
    ]
    # Driverloop rows excused by raw corroboration but whose adjusted
    # ratio exceeds what any OTHER regime could reach while excused —
    # the blind spot the regime-dependent ceiling opens. Not gated
    # (divisor < 0.67 means the probe says the host got much faster on
    # per-job latency, the classic recovery-round signature where
    # partial-share driverloop queries legitimately under-track the
    # probe), but called out loudly for manual adjudication.
    driverloop_excused_high = [
        (name, adj, raw)
        for name, adj, raw in probe_inflated
        if regimes.get(name) == "driverloop" and adj > CROSS_REGIME_CEILING
    ]

    head = (
        f"series={series}; total {old['value']:.2f}s -> {new['value']:.2f}s "
        f"(x{new['value'] / old['value']:.2f}); "
        f"calib {co if co is not None else '-'} -> "
        f"{cn if cn is not None else '-'}"
        + (
            " (basket drift "
            + ", ".join(f"{k} x{v:.2f}" for k, v in basket_drift.items())
            + "; adjusted per regime)"
            if basket_drift
            else f" (host drift x{drift:.2f}; ratios below are drift-adjusted)"
            if drift
            else (
                f" *** WARNING: calib ratio x{raw_drift:.2f} is outside "
                f"the credible drift band [{DRIFT_BAND[0]}, {DRIFT_BAND[1]}] "
                f"— treating the probe pair as a JIT/contention artifact; "
                f"RAW ratios only, regression gate runs on raw ***"
                if drift_artifact
                else " (no calib on one side: RAW ratios only)"
            )
        )
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
        if probe_inflated:
            print("\n**probe-inflated, unconfirmed (adjusted > "
                  f"x{REGRESSION_THRESHOLD} but raw <= x{RAW_CORROBORATION}"
                  "; not gated):** "
                  + ", ".join(f"{n} (adj x{a:.2f}, raw x{r:.2f})"
                              for n, a, r in probe_inflated))
        if driverloop_excused_high:
            print("\n**DRIVERLOOP-EXCUSED ABOVE CROSS-REGIME CEILING "
                  f"x{CROSS_REGIME_CEILING} — adjudicate manually:** "
                  + ", ".join(f"{n} (adj x{a:.2f}, raw x{r:.2f})"
                              for n, a, r in driverloop_excused_high))
        if cross_excused:
            print("\n**cross-series-excused, other series flat (not "
                  "gated):** "
                  + ", ".join(
                      f"{n} (raw x{r:.2f}, min x{mn:.2f}, median x{md:.2f})"
                      for n, r, mn, md in cross_excused))
        if median_jitter:
            print("\n**median-jitter, min-corroborated flat (not "
                  "gated):** "
                  + ", ".join(f"{n} (median x{md_r:.2f}, min x{mn_r:.2f})"
                              for n, md_r, mn_r in median_jitter))
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
        if probe_inflated:
            print("probe-inflated, unconfirmed (not gated): "
                  + ", ".join(f"{n} (adj x{a:.2f}, raw x{r:.2f})"
                              for n, a, r in probe_inflated))
        if driverloop_excused_high:
            print("DRIVERLOOP-EXCUSED ABOVE CROSS-REGIME CEILING "
                  f"x{CROSS_REGIME_CEILING} — adjudicate manually: "
                  + ", ".join(f"{n} (adj x{a:.2f}, raw x{r:.2f})"
                              for n, a, r in driverloop_excused_high))
        if cross_excused:
            print("cross-series-excused, other series flat (not gated): "
                  + ", ".join(
                      f"{n} (raw x{r:.2f}, min x{mn:.2f}, median x{md:.2f})"
                      for n, r, mn, md in cross_excused))
        if median_jitter:
            print("median-jitter, min-corroborated flat (not gated): "
                  + ", ".join(f"{n} (median x{md_r:.2f}, min x{mn_r:.2f})"
                              for n, md_r, mn_r in median_jitter))
    sys.exit(2 if worst else 0)


if __name__ == "__main__":
    main()
