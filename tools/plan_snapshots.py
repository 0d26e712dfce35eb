"""Write PLANS.md: the formatted physical plan of each flagship query with
the scale-relevant evidence called out (PushedFilters, broadcast joins,
partial aggregation, exchange reuse).  Regenerate after plan-shape changes:

    python tools/plan_snapshots.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SHOWCASE = {
    "weather_chain": "Flagship chain — 9 rolling aggregates collapse to 3 "
    "Window operators; dedup is a map-side min_by aggregate, not a window.",
    "time_range": "Time predicates reach the parquet scan (PushedFilters) — "
    "row-group pruning does the work at 100 TB.",
    "revenue_by_nation": "Snowflake join — constant-size dims broadcast, the "
    "fact side never moves twice.",
    "top_unshipped": "Top-N via TakeOrderedAndProject (per-partition top-k + "
    "merge), no single-partition window.",
    "ngram_jaccard": "Posting-list pair generation: one groupBy(shingle), "
    "pairs exploded in-array — no self-join, 8-byte shuffle keys.",
    "pricing_summary": "One shuffle; partial_ aggregate functions before the "
    "exchange = map-side combine.",
    "chunk_dedup": "Corpus chunk dedup via min(struct) aggregate — partial "
    "agg absorbs boilerplate-chunk skew; no window over the chunk key.",
    "user_retention": "Set algebra over per-day theta sketches; the events "
    "scan happens once to build daily sketches, the rest is sketch math.",
    "winnow_fingerprints": "Winnowing as two whole-stage-codegen projection "
    "passes (k-gram hashes, window minima); the only shuffle is the final "
    "distinct aggregate.",
    "profit_by_nation_year": "Q9 shape — selective part filter prunes "
    "first, nation broadcast, e4 BIGINT money sums combine map-side.",
    "length_deciles": "Decile boundaries as a broadcast 1-row aggregate — "
    "no global NTILE sort anywhere in the plan.",
    "ohlc_6h": "Candlestick rollup in ONE aggregation — min_by/max_by over "
    "the (ts, id) ordering struct combine map-side; no window, no self-join.",
    "ks_drift": "Drift statistic whose state is keys × 64 bins: one "
    "broadcast span row, one groupBy, a per-key cumulative window over "
    "≤64 rows.",
    "bigram_pmi": "Collocations: vocab-sized aggregates + two word-key "
    "joins; min-count floor shrinks the probe side BEFORE the joins.",
    "cohort_retention": "User-grain min-aggregate joined back onto distinct "
    "user-week activity; the fact table is scanned once, no window.",
    "session_incident_overlap": "Interval×interval overlap as a bucket "
    "EQUI-join (hash or sort-merge, AQE's size call — broadcast-hash at "
    "this SF) — no BroadcastNestedLoopJoin anywhere; the exactly-once "
    "filter rides the join condition.",
    "winsorized_value": "Exact per-key quantiles with NO data-sized sort: "
    "the window runs over the value-GRID aggregate (span·scale rows), the "
    "fact table only passes through combinable groupBys.",
    "bloom_semijoin": "Runtime-filter pattern — the Bloom words build as ONE "
    "combinable bit_or aggregate; the probe is a zero-shuffle projection "
    "(no join operator on the probe side at all).",
    "spatial_pairs": "Spatial radius join — cell + 3x3-neighborhood explode "
    "turns the geo predicate into a plain shuffled equi-join (no "
    "BroadcastNestedLoop anywhere); the distance filter runs post-join in "
    "codegen.",
    "changepoints_value": "Binary segmentation — the fact collapses to the "
    "hourly grid in one partial-agg scan; every Window partitions by key "
    "over grid rows; level 2 reuses the localCheckpointed grid (no second "
    "FileScan).",
    "quantile_normalize_check": "Value-grid quantile mapping — windows run "
    "over grid rows, the value-at-rank lookup is the union-merge as-of "
    "join (one Exchange, no range join).",
    "kendall_tau_value_hour": "Tau-b pair counting with NO pair "
    "enumeration — one combinable cell aggregate is the only data-sized "
    "stage; the dense grid, its two cumulative windows, and the tie-term "
    "reduces are all quantization-bounded.",
    "value_decile_lift": "Gains table with NO global NTILE — exact-rank "
    "boundaries from a grid cumulative, one 9-boundary broadcast back "
    "onto the units, a 10-row reduce.",
    "mutual_topk_pairs": "Reciprocal top-1 inside blocks: the block "
    "equi-join is the only data-sized exchange; the argmax is a "
    "combinable max_by (no window) and reciprocity is an unordered-edge "
    "groupBy (count == 2), not a self-join.",
    "bootstrap_ci_mean": "100 bootstrap replicates from ONE scan: explode "
    "is a projection (no shuffle), the only exchange carries 100 "
    "pre-combined partial sums per partition.",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry
    from cerebro_spark.session import get_spark

    spark = get_spark("plan-snapshots", shuffle_partitions=16)
    qs = entry.queries()
    out = [
        "# PLANS — physical-plan snapshots of the flagship queries",
        "",
        f"Generated by `python tools/plan_snapshots.py {sf_dir}`; regenerate",
        "after plan-shape changes.  What to look for is annotated per query;",
        "`tools/plan_audit.py` enforces the anti-pattern side automatically.",
        "",
    ]
    for name, note in SHOWCASE.items():
        if name not in qs:
            continue
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # trim huge expression lists for readability; keep operator shape
        lines = []
        for ln in plan.splitlines():
            ln = ln.rstrip()
            if len(ln) > 160:
                ln = ln[:157] + "..."
            lines.append(ln)
            if len(lines) >= 40:
                lines.append("   ... (truncated)")
                break
        evidence = []
        if re.search(r"PushedFilters: \[[^\]]", plan):
            evidence.append("filters pushed to parquet")
        if "BroadcastHashJoin" in plan:
            evidence.append("broadcast hash join")
        if "partial_" in plan or "partial" in plan.lower():
            evidence.append("map-side partial aggregation")
        if "TakeOrderedAndProject" in plan:
            evidence.append("TakeOrderedAndProject top-k")
        if "ReusedExchange" in plan:
            evidence.append("exchange reuse")
        out += [
            f"## `{name}`",
            "",
            note,
            "",
            f"*Observed in plan:* {', '.join(evidence) if evidence else '(see below)'}",
            "",
            "```",
            *lines,
            "```",
            "",
        ]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"PLANS.md written ({len(SHOWCASE)} queries)")


if __name__ == "__main__":
    main()
