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
