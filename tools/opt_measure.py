"""Per-query isolated measurement for the optimization rounds.

Times each named query with the noop sink (bench.py methodology: warm
session, best of N runs) and optionally writes ``explain("formatted")`` to
``plans/<tag_dir>/<name>_<tag>.txt`` so plan-shape claims are checkable.

Usage:
    python tools/opt_measure.py [--sf SF_DIR] [--runs N] [--plans TAG] q1 q2 ...

``--plans before`` writes plans/r11/<q>_before.txt; ``--plans after`` the
after-side.  Timing methodology is identical to bench.py (noop sink, min of
runs) so numbers are comparable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans", default=None, help="tag (before/after) to dump plans/r11/<q>_<tag>.txt")
    ap.add_argument("--plans-dir", default="/root/repo/plans/r11")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry
    from cerebro_spark.session import get_spark

    spark = get_spark("opt-measure", shuffle_partitions=32)
    qs = entry.queries()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JIT warmup
    # warm the parquet reader path like bench.py does
    try:
        qs[args.names[0]](spark, args.sf.replace("0.1", "0.001")).write.mode(
            "overwrite"
        ).format("noop").save()
    except Exception:
        pass

    if args.plans:
        os.makedirs(args.plans_dir, exist_ok=True)

    out: dict[str, list[float]] = {}
    for name in args.names:
        if name not in qs:
            print(f"?? unknown query {name}")
            continue
        if args.plans:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"{args.plans_dir}/{name}_{args.plans}.txt", "w") as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(f"opt:{name}")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            df.write.mode("overwrite").format("noop").save()
            out.setdefault(name, []).append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        print(f"{name:40s} min={min(out[name]):7.3f}  runs={out[name]}")
    print(json.dumps({"sf": args.sf, "loadavg": list(os.getloadavg()), "mins": {n: min(r) for n, r in out.items()}}))


if __name__ == "__main__":
    main()
