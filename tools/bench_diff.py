"""Round-over-round bench comparator: the verdict's perf table in one command.

    python tools/bench_diff.py BENCH_r03.json BENCH_r05.json
    python tools/bench_diff.py --threshold 1.5 old.json new.json

Accepts either the driver's ``BENCH_rN.json`` wrapper (preferring its
``parsed`` payload, else recovering min-of-trials timings from the raw
``tail`` — the r03 artifact has trials but an unparseable headline line)
or a raw ``bench.py`` JSON line saved to a file.  A file with no
recoverable timings at all (the r04 import crash) errors with exit 2.

Per shared query it compares best-of-trials seconds and prints every move
beyond the threshold (default 1.25×, the convention the round verdicts
grade with), plus the shared-subset totals.  Queries only present on one
side are listed so coverage changes are visible, never silent.

Exit code: 1 if any REGRESSION beyond threshold (wire-able into a gate),
else 0.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as fh:
        text = fh.read()
    try:
        data = json.loads(text)
    except json.JSONDecodeError:
        # raw bench.py stdout: line-delimited JSON (all-runs detail line,
        # then the headline line) — take the last line carrying `queries`
        data = {}
        for line in text.splitlines():
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict) and obj.get("queries"):
                data = obj
        if not data:
            raise ValueError(f"{path}: no parseable bench JSON") from None
    tail = ""
    if "parsed" in data or "rc" in data:  # driver wrapper
        tail = data.get("tail") or ""
        data = data.get("parsed") or {}
    queries = data.get("queries")
    if not queries and tail:
        # recover from the raw tail: bench.py emits per-query trial arrays
        # ("name": [t1, t2, ...]) before the headline line — usable even
        # when the headline line itself was unparseable (the r03 artifact)
        trials = re.findall(r'"(\w+)": \[([0-9., ]+)\]', tail)
        queries = {
            name: min(float(t) for t in vals.split(","))
            for name, vals in trials
        }
    if not queries and tail:
        # r07+ format: the headline line is constant-size (no queries at
        # all) and the per-query timings live on the compact "timings"
        # detail line ("name":1.234,...).  The driver tail keeps only the
        # last 2000 chars, so this recovers the timings line's suffix —
        # a PARTIAL set; diffs against it compare the shared subset only.
        # The leading [{,] context requirement discards a first pair whose
        # query name was cut mid-line by the truncation (e.g. a surviving
        # `ine_pairs":12.3` suffix would otherwise mint a bogus key); the
        # trailing delimiter is a lookahead so consecutive pairs sharing a
        # comma both match.
        meta = {"sf", "value", "n_queries"}
        pairs = re.findall(
            r'[{,]"(\w+)":([0-9]+(?:\.[0-9]+)?)(?=[,}])', tail
        )
        queries = {k: float(v) for k, v in pairs if k not in meta}
    if not queries:
        raise ValueError(f"{path}: no per-query timings found")
    return {k: float(v) for k, v in queries.items()}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.25,
                    help="flag ratio beyond this (default 1.25)")
    args = ap.parse_args()

    try:
        old = load_queries(args.old)
        new = load_queries(args.new)
    except (OSError, ValueError, json.JSONDecodeError) as exc:
        print(f"bench_diff: {exc}", file=sys.stderr)
        return 2

    shared = sorted(set(old) & set(new))
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    regressions, improvements = [], []
    for q in shared:
        ratio = new[q] / old[q] if old[q] > 0 else float("inf")
        if ratio > args.threshold:
            regressions.append((ratio, q))
        elif ratio < 1 / args.threshold:
            improvements.append((ratio, q))

    t_old = sum(old[q] for q in shared)
    t_new = sum(new[q] for q in shared)
    if shared:
        # median per-query ratio: the one-number drift-vs-regression call —
        # whole-host drift moves the median with it, a real per-query
        # regression moves only its own ratio
        ratios = sorted(
            new[q] / old[q] for q in shared if old[q] > 0
        ) or [float("nan")]
        mid = len(ratios) // 2
        median = (
            ratios[mid]
            if len(ratios) % 2
            else (ratios[mid - 1] + ratios[mid]) / 2
        )
        print(f"shared queries: {len(shared)}   "
              f"total {t_old:.1f} s -> {t_new:.1f} s "
              f"({t_new / t_old:.2f}x)   median per-query {median:.2f}x")
    else:
        print("no shared queries")

    for ratio, q in sorted(regressions, reverse=True):
        print(f"REGRESSION {ratio:5.2f}x  {q}: "
              f"{old[q]:.3f} s -> {new[q]:.3f} s")
    for ratio, q in sorted(improvements):
        print(f"improved   {ratio:5.2f}x  {q}: "
              f"{old[q]:.3f} s -> {new[q]:.3f} s")
    if not regressions and not improvements:
        print(f"no moves beyond {args.threshold}x on the shared subset")

    if only_old:
        print(f"dropped from new bench ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"new in new bench ({len(only_new)}): {', '.join(only_new)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
