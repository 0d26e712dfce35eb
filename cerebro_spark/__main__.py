"""CLI daemon (C4 parity — reference `cerebro/__main__.py:30-98`:
``cerebro [--sources a,b | --profile p] start``).

    python -m cerebro_spark start --config cfg.yaml --store /data/points \
        [--profile apo | --sources s1,s2] [--checkpoint /data/ckpt]
    python -m cerebro_spark status --config cfg.yaml ...
    python -m cerebro_spark sql --sf-dir /root/testdata/sf0.01 \
        --query "SELECT lang, count(*) FROM documents GROUP BY 1"

No pidfile daemonization — on a cluster the scheduler (YARN/k8s) owns the
process lifecycle; ``start`` blocks on the streaming queries.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cerebro-spark")
    p.add_argument("command", choices=["start", "status", "metrics", "sql", "explain", "maintain"])
    p.add_argument("--config", default=None, help="YAML/JSON config path")
    p.add_argument("--sf-dir", default=None, help="testdata dir for `sql`")
    p.add_argument("--query", default=None, help="SQL text for `sql`")
    p.add_argument("--name", default=None, help="registered query name for `explain`")
    p.add_argument("--compact", action="store_true", help="`maintain`: rewrite small files per partition")
    p.add_argument("--expire-days", type=int, default=None, help="`maintain`: drop date partitions older than N days")
    p.add_argument("--dry-run", action="store_true", help="`maintain`: list expirable partitions without deleting")
    p.add_argument("--zorder", default=None, help="`maintain`: comma-separated columns to Z-order cluster by")
    p.add_argument("--output", default=None, help="`maintain --zorder`: destination path for the clustered rewrite")
    p.add_argument("--target-files", type=int, default=32, help="`maintain --zorder`: output file count")
    p.add_argument("--limit", type=int, default=20, help="`sql` print row cap")
    p.add_argument("--store", default=None, help="point-store output path")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--profile", default=None)
    p.add_argument("--sources", default=None, help="comma-separated source names")
    p.add_argument("--timeout", type=float, default=None, help="stop after N seconds")
    p.add_argument(
        "--socket",
        default=None,
        help="unix-socket path for the status/restart control surface "
        "(reference serves /tmp/cerebro.sock)",
    )
    args = p.parse_args(argv)

    from cerebro_spark.session import get_spark

    if args.command == "maintain":
        # the periodic store-maintenance job: retention first (no point
        # compacting doomed partitions), then compaction of what's left —
        # the scheduler runs this daily over CLOSED partitions
        if not args.store:
            p.error("maintain requires --store")
        if args.expire_days is None and not args.compact and not args.zorder:
            p.error("maintain requires --expire-days, --compact and/or --zorder")
        from cerebro_spark.io import compact_store, expire_partitions, store_health

        spark = get_spark("cerebro-spark-maintain")
        if args.expire_days is not None:
            gone = expire_partitions(
                spark, args.store, args.expire_days, dry_run=args.dry_run
            )
            verb = "would expire" if args.dry_run else "expired"
            print(f"{verb} {len(gone)} partition(s)")
            for g in gone:
                print(f"  {g}")
        if args.compact and not args.dry_run:
            compact_store(spark, args.store)
            print("compacted")
        if args.zorder:
            if not args.output:
                p.error("--zorder requires --output (clustered rewrite path)")
            from cerebro_spark.io import write_zordered

            cols = args.zorder.split(",")
            if not args.dry_run:
                write_zordered(
                    spark.read.parquet(args.store),
                    args.output,
                    cols,
                    target_files=args.target_files,
                )
            print(f"zordered by {cols} -> {args.output}")
        for row in store_health(spark, args.store).collect():
            print(
                f"{row['partition']}: files={row['n_files']} rows={row['n_rows']} "
                f"small_files={row['small_files']}"
            )
        return 0

    if args.command == "explain":
        # plan transparency surface: the formatted physical plan of any
        # registered query plus the 100 TB anti-pattern audit verdict — the
        # same checks tests/test_plan_shapes.py gates on, exposed for ad-hoc
        # "is my filter pushed down?" inspection.
        import __spark_entry__ as entry
        from cerebro_spark.io import DEFAULT_SF_DIR
        from tools.plan_audit import audit_plan

        qs = entry.queries()
        if not args.name or args.name not in qs:
            p.error(
                "explain requires --name, one of: " + ", ".join(sorted(qs))
            )
        spark = get_spark("cerebro-spark-explain")
        df = qs[args.name](spark, args.sf_dir or DEFAULT_SF_DIR)
        df.explain("formatted")
        problems = audit_plan(
            args.name, df._jdf.queryExecution().executedPlan().toString()
        )
        if problems:
            print(f"AUDIT: WEAK — {problems}")
            return 1
        print("AUDIT: clean (no single-partition windows, undocumented "
              "nested-loop joins, or Python in the plan)")
        return 0

    if args.command == "sql":
        from cerebro_spark.io import DEFAULT_SF_DIR, register_views

        if not args.query:
            p.error("sql requires --query")
        spark = get_spark("cerebro-spark-sql")
        register_views(spark, args.sf_dir or DEFAULT_SF_DIR)
        spark.sql(args.query).show(args.limit, truncate=False)
        return 0

    if not args.config or not args.store:
        p.error(f"{args.command} requires --config and --store")

    from cerebro_spark.config.loader import IngestRunner

    spark = get_spark("cerebro-spark-daemon")
    runner = IngestRunner(
        spark,
        args.config,
        store_path=args.store,
        checkpoint_root=args.checkpoint or f"{args.store}/_checkpoints",
        profile=args.profile,
        sources=args.sources.split(",") if args.sources else None,
    )
    if args.command == "status":
        runner.start()
        for name, active in runner.status().items():
            print(f"{name}: {'running' if active else 'stopped'}")
        runner.stop()
        return 0

    if args.command == "metrics":
        import json as _json
        import time as _time

        runner.start()
        _time.sleep(2)  # let the first micro-batch land so progress exists
        print(_json.dumps(runner.metrics(), indent=2))
        runner.stop()
        return 0

    runner.start()
    ctl = None
    if args.socket:
        from cerebro_spark.control import ControlServer

        ctl = ControlServer(runner, args.socket).start()
    try:
        runner.await_all(args.timeout)
    finally:
        if ctl is not None:
            ctl.stop()
        runner.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
