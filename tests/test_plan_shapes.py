"""Physical-plan shape guards: regressions in partitioning/broadcast/window
strategy show up here before they show up as slow bench numbers.

These assert on executed-plan text — the same properties `.explain` review
verified manually (ARCHITECTURE.md scale notes)."""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_weather_chain_windows_are_partitioned(spark, sf_dir):
    plan = _plan(entry.q_weather_chain(spark, sf_dir))
    # the overlap-bucket path partitions every Window by __bkt — a global
    # (unpartitioned) RANGE window would serialize onto one task
    assert "Window" in plan
    assert "__bkt" in plan
    # 9 aggregates collapse into one Window operator per frame (3), not 9
    assert plan.count("Window ") <= 4


def test_dim_joins_broadcast(spark, sf_dir):
    plan = _plan(entry.q_revenue_by_nation(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_time_range_pushdown(spark, sf_dir):
    plan = _plan(entry.q_time_range(spark, sf_dir))
    assert "PushedFilters" in plan
    # the raw ns-column range predicate reaches the scan
    assert "GreaterThanOrEqual(ts," in plan


def test_ngram_no_cartesian(spark, sf_dir):
    from cerebro_spark.queries.extensions import q_ngram_jaccard

    plan = _plan(q_ngram_jaccard(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_anti_semi_join_strategies(spark, sf_dir):
    from cerebro_spark.queries.tsdb_q import q_orders_no_big_items
    from cerebro_spark.queries.volume_q import q_orders_with_returns

    assert "LeftAnti" in _plan(q_orders_no_big_items(spark, sf_dir))
    assert "LeftSemi" in _plan(q_orders_with_returns(spark, sf_dir))


@pytest.mark.slow
def test_all_registered_queries_pass_plan_audit(spark, sf_dir):
    """Every registry query must pass the 100 TB anti-pattern audit
    (single-partition windows, nested-loop joins outside the documented
    bounded-broadcast allowlist, row-at-a-time Python, unexpected Arrow
    stages) — the pytest twin of `python tools/plan_audit.py`."""
    from tools.plan_audit import audit_plan

    bad = {}
    for name, fn in entry.queries().items():
        plan = _plan(fn(spark, sf_dir))
        problems = audit_plan(name, plan)
        if problems:
            bad[name] = problems
    assert not bad, bad


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Selective-dim joins get a runtime BLOOM FILTER on the fact scan —
    rows whose key can't match are dropped BEFORE the shuffle.  In
    production the trigger is the application-side scan exceeding
    `...applicationSideScanSizeThreshold` (default 10 GB — every 100 TB
    fact table qualifies); the sf0.01 fixture sits under it, so this test
    pins the threshold at 0 to exercise the same injection path and
    asserts the engine still plans it."""
    old = {
        "spark.sql.autoBroadcastJoinThreshold":
            spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold":
            spark.conf.get(
                "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
            ),
    }
    try:
        from cerebro_spark.io import load_table

        assert (
            spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
            == "true"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        li = load_table(spark, "lineitem", sf_dir)
        orders = load_table(spark, "orders", sf_dir)
        sel = orders.filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(sel, li.l_orderkey == sel.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom" in plan.lower(), plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


# ---------------------------------------------------------------------------
# bench.py driver contract
# ---------------------------------------------------------------------------

def test_bench_headline_line_is_constant_size_and_parseable():
    # The driver tail-captures only the LAST 2000 stdout chars.  BENCH_r03
    # and BENCH_r06 both recorded parsed:null when per-query content pushed
    # the final line past that; the final line is now constant-size — pin
    # it well under the buffer even at 10x the current headline count.
    import json

    import bench

    timings = {f"a_very_long_query_name_{i:04d}": 123.4567 for i in range(1500)}
    line = bench.headline_line(timings, 0.1)
    assert len(line) < 1800
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == 1500
    assert parsed["value"] == round(123.4567 * 1500, 4)
    assert "queries" not in parsed  # per-query detail lives on earlier lines
    # host-load attribution rides in-band (r9 lesson: the driver artifact
    # landed hot and the loadavg evidence lived only in side notes);
    # headline_line deliberately emits loadavg=null where os.getloadavg
    # is unavailable, so accept that documented fallback too
    assert parsed["loadavg"] is None or len(parsed["loadavg"]) == 3
