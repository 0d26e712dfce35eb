"""Pre-commit smoke gate: the tree must PARSE, IMPORT, and answer ONE query
before any commit — especially the end-of-round snapshot.

Two consecutive rounds shipped a broken driver artifact for mechanically
preventable reasons (r03: unparseable bench tail line; r04: an unterminated
docstring in operators/dedup.py that made ``import __spark_entry__`` fail, so
the correctness gate ran ZERO queries).  Every check here is sub-second to a
few seconds; run it before EVERY commit:

    python tools/smoke.py

Checks, in order (fail-fast, non-zero exit on the first failure):

1. ``compileall`` over ``cerebro_spark/``, ``__spark_entry__.py``,
   ``bench.py``, ``tools/`` — catches syntax errors anywhere in the tree.
2. ``import __spark_entry__`` and assert the registry holds >= 163 queries
   with ``oracle_sql()`` keys a subset of ``queries()`` keys — catches
   import-time breakage beyond syntax (bad imports, module-level errors).
3. One end-to-end oracle query (``weather_chain`` by default, override via
   argv) through ``tools/check.py`` at sf0.001 — catches runtime breakage in
   the session bootstrap, IO layer, and the Spark-vs-DuckDB compare harness.
4. ``tools/plan_audit.py`` over a fixed ~15-query §2-parity subset at
   sf0.001 — the plan SHAPE is part of the contract (pushdown, no
   single-partition windows, no stray Python, no unjustified nested
   loops); a regression like the seasonal_decompose sliding-frame trap
   (503 s at 5M rows) gets caught at commit time, not at the next soak.
"""

from __future__ import annotations

import compileall
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MIN_QUERIES = 163
SMOKE_SF = "/root/testdata/sf0.001"

#: §2-parity representatives, one per operator family — the plan-shape
#: canary set for smoke step 4 (full 163-query audit stays in
#: tools/plan_audit.py for round soaks).
PLAN_CANARIES = [
    "client_query",        # Q1-Q6 scan→range→pivot chain
    "weather_chain",       # S16 transform chain
    "rolling_value",       # T17 time rolling window (keyless auto-bucket)
    "hwm",                 # T22 high-water-mark advance
    "pricing_summary",     # wide agg (TPC-H Q1 shape)
    "dedup_exact",         # hash-groupBy dedup
    "minhash_lsh_pairs",   # banded LSH equi-join
    "simhash_pairs",       # pigeonhole block join
    "ann_cosine_topk",     # bounded-broadcast ANN
    "semantic_dedup",      # k-means blocking + Arrow matmul
    "tfidf_top_terms",     # vocab TakeOrdered + broadcast join
    "ohlc_6h",             # TSDB bucket agg
    "asof_join_forward",   # keyless two-level carry
    "seasonal_decompose",  # bucket-grid pre-agg (the 503 s trap lives here)
    "pack_tokens",         # greedy packing mapInPandas stage
    "dhash_docs",          # shuffle-free JVM perceptual fingerprint (r9)
]


def main() -> int:
    os.chdir(REPO)
    sys.path.insert(0, REPO)

    # 1. parse the whole tree
    targets = ["cerebro_spark", "tools", "__spark_entry__.py", "bench.py"]
    for t in targets:
        ok = compileall.compile_file(t, quiet=2) if t.endswith(".py") else (
            compileall.compile_dir(t, quiet=2)
        )
        if not ok:
            print(f"SMOKE FAIL: compileall {t}", file=sys.stderr)
            return 1
    print("smoke 1/6: compileall ok")

    # 2. import the driver entry and sanity-check the registry
    try:
        import __spark_entry__ as entry

        qs = entry.queries()
        oracles = entry.oracle_sql()
    except Exception as exc:  # noqa: BLE001 — any import failure is the point
        print(f"SMOKE FAIL: import __spark_entry__: {exc!r}", file=sys.stderr)
        return 1
    if len(qs) < MIN_QUERIES:
        print(f"SMOKE FAIL: registry shrank: {len(qs)} < {MIN_QUERIES}", file=sys.stderr)
        return 1
    extra = set(oracles) - set(qs)
    if extra:
        print(f"SMOKE FAIL: oracle keys not in queries(): {sorted(extra)}", file=sys.stderr)
        return 1
    # _prioritize silently skips names absent from the registry — a typo in
    # _SNAPSHOT_PRIORITY would silently drop a query from the driver gate
    ghost = [n for n in entry._SNAPSHOT_PRIORITY if n not in qs]
    if ghost:
        print(f"SMOKE FAIL: _SNAPSHOT_PRIORITY names not in queries(): {ghost}", file=sys.stderr)
        return 1
    print(f"smoke 2/6: import ok ({len(qs)} queries, {len(oracles)} oracles, "
          f"priority list consistent)")

    # 3. one oracle query end-to-end (subprocess: fresh interpreter, like the driver)
    names = sys.argv[1:] or ["weather_chain"]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"), SMOKE_SF, *names],
        capture_output=True,
        text=True,
        timeout=600,
    )
    tail = (proc.stdout or "").strip().splitlines()[-1:] or ["<no output>"]
    if proc.returncode != 0 or "all green" not in (proc.stdout or ""):
        print(f"SMOKE FAIL: check.py {names}: rc={proc.returncode} tail={tail}", file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        return 1
    print(f"smoke 3/6: check.py {names} ok ({tail[0]})")

    # 4. plan-shape audit on the §2-parity canary subset
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "plan_audit.py"),
         SMOKE_SF, *PLAN_CANARIES],
        capture_output=True,
        text=True,
        timeout=600,
    )
    tail = (proc.stdout or "").strip().splitlines()[-1:] or ["<no output>"]
    if proc.returncode != 0 or "all plans clean" not in (proc.stdout or ""):
        print(f"SMOKE FAIL: plan_audit canaries: rc={proc.returncode} "
              f"tail={tail}", file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        return 1
    print(f"smoke 4/6: plan_audit ok ({len(PLAN_CANARIES)} canary plans clean)")

    # 5. doc-consistency gate (QUERIES.md/README counts + table rows vs the
    # live registry — two review passes caught silent drift here)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "doc_check.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    if proc.returncode != 0:
        print(f"SMOKE FAIL: doc_check: {proc.stdout.strip()}", file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        return 1
    print(f"smoke 5/6: {proc.stdout.strip()}")

    # 6. rotation-ledger gate (head-50 vs the recomputed never-gated set —
    # r05-r07 each had to redo this by hand after a prose comment drifted)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rotation_check.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    if proc.returncode != 0:
        print(f"SMOKE FAIL: rotation_check: {proc.stdout.strip()}",
              file=sys.stderr)
        print(proc.stderr[-2000:], file=sys.stderr)
        return 1
    print(f"smoke 6/6: {proc.stdout.strip().splitlines()[0]}")
    print("SMOKE GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
