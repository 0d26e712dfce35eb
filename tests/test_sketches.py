"""Mergeable HLL distinct-count rollups: tolerance vs exact, lossless
union-over-days property, and parquet persistence of the sketch column."""

import datetime as dt

from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.tsdb import (
    distinct_over_range,
    distinct_sketch_rollup,
)


def test_sketch_rollup_tolerance_and_merge(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    daily = distinct_sketch_rollup(ev, "user_id", keys=("event_type",))

    # (1) whole-table estimate per event_type within 3*rsd of exact
    est = {
        r["event_type"]: r["approx_distinct"]
        for r in distinct_over_range(daily, keys=("event_type",)).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    rsd = 0.008  # lg_k=14
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(1.0, 3 * rsd * n), (k, est[k], n)

    # (2) union of daily sketches == sketch built directly over the range
    #     (register-wise max is lossless for fixed lg_k)
    lo, hi = dt.datetime(2024, 1, 5), dt.datetime(2024, 2, 1)
    via_rollup = distinct_over_range(daily, lo, hi).collect()[0]
    direct = (
        ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("user_id", F.lit(14))
            ).alias("approx_distinct")
        )
        .collect()[0]
    )
    assert via_rollup["approx_distinct"] == direct["approx_distinct"]


def test_sketch_rollup_survives_parquet(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir)
    daily = distinct_sketch_rollup(ev, "user_id")
    path = str(tmp_path / "sketches")
    daily.write.parquet(path)

    live = distinct_over_range(daily).collect()[0]["approx_distinct"]
    persisted = distinct_over_range(spark.read.parquet(path)).collect()[0][
        "approx_distinct"
    ]
    assert live == persisted


def test_kll_quantile_rollup_tolerance(spark, sf_dir):
    from cerebro_spark.operators.tsdb import (
        quantile_sketch_rollup,
        quantiles_over_range,
    )

    ev = load_table(spark, "events", sf_dir)
    daily = quantile_sketch_rollup(ev, "value")
    lo, hi = dt.datetime(2024, 1, 3), dt.datetime(2024, 1, 25)
    got = quantiles_over_range(daily, (0.5, 0.95), lo, hi).collect()[0]

    sub = ev.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    exact = sub.selectExpr(
        "percentile(value, 0.5) AS p50", "percentile(value, 0.95) AS p95",
        "min(value) AS lo", "max(value) AS hi", "count(*) AS n"
    ).collect()[0]
    assert got["n_rows"] == exact["n"]
    # KLL default k: rank error ~1.7%; map to value-space via the range
    spread = exact["hi"] - exact["lo"]
    assert abs(got["p50"] - exact["p50"]) <= 0.05 * spread
    assert abs(got["p95"] - exact["p95"]) <= 0.05 * spread


def test_theta_retention_matches_exact(spark, sf_dir):
    from cerebro_spark.operators.tsdb import (
        retention_between,
        theta_sketch_rollup,
    )

    ev = load_table(spark, "events", sf_dir)
    daily = theta_sketch_rollup(ev, "user_id")
    wa = (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8))
    wb = (dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 15))
    got = retention_between(daily, wa, wb).collect()[0]

    def users(w):
        return {
            r["user_id"]
            for r in ev.filter(
                (F.col("ts") >= F.lit(w[0])) & (F.col("ts") < F.lit(w[1]))
            ).select("user_id").distinct().collect()
        }

    ua, ub = users(wa), users(wb)
    # theta is exact below its sampling threshold (~4k entries); the events
    # table has 150 users so every estimate must be exact here
    assert got["a_distinct"] == len(ua)
    assert got["b_distinct"] == len(ub)
    assert got["retained"] == len(ua & ub)
    assert got["churned"] == len(ua - ub)
    assert got["new"] == len(ub - ua)
