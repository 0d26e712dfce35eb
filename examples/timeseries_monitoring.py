"""Time-series monitoring, end to end: the anomaly/drift/trend stack an
on-call dashboard runs over a metric stream.

    python examples/timeseries_monitoring.py [sf_dir]

Stages, cheap-to-deep — each answers the question the previous one raises:
1. trend          — per-series OLS line (is it moving? how fast?)
2. changepoints   — binary segmentation (WHEN did the level shift?)
3. anomalies      — generalized-ESD rounds (which points are outliers,
                    after earlier removals are accounted for?)
4. lead-lag       — cross-correlation sweep (does views lead purchases,
                    and by how many hours?)
5. drift          — Jensen-Shannon each source vs the corpus (which
                    feed changed shape?)
6. sequential     — always-valid mSPRT p-value per day (can on-call
                    peek daily without inflating false alarms?)

Every stage is the oracle-gated operator from `cerebro_spark.operators`
(QUERIES.md rows: ols_trend, changepoints_value, esd_anomalies,
lead_lag_corr, js_drift, msprt_monitor).
"""

import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.profile import js_divergence, msprt_monitor
from cerebro_spark.operators.tsdb import (
    binseg_changepoints,
    cross_corr,
    esd_outliers,
    ols_trend,
)
from cerebro_spark.session import get_spark


def main(sf_dir: str) -> None:
    spark = get_spark("timeseries-monitoring", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, "events", sf_dir)

    print("\n1. trend: per-series OLS line (value-units/day)")
    ols_trend(ev, "value", "ts", ["event_type"]).orderBy("event_type").show()

    print("2. changepoints: depth-2 binary segmentation of the hourly means")
    binseg_changepoints(ev, "value", "ts", ["event_type"]).orderBy(
        "event_type", "level", "segment"
    ).show(8, False)

    print("3. anomalies: generalized-ESD rounds per series")
    esd_outliers(ev, "value", ["event_type"], k=3).orderBy(
        "event_type", "round"
    ).show(8, False)

    print("4. lead-lag: does 'view' lead 'purchase'?")
    cross_corr(ev, "event_type", "view", "purchase", "value", "ts", 3600, 3).show()

    print("5. drift: Jensen-Shannon value-shape per event_type vs corpus")
    shaped = ev.withColumn(
        "vbucket", F.floor(F.col("value") / 100).cast("long")
    )
    js_divergence(shaped, "event_type", "vbucket").show()

    print("6. sequential monitor: always-valid p per day (arms = user parity)")
    monitored = ev.withColumn("arm", F.pmod(F.col("user_id"), F.lit(2)))
    msprt_monitor(monitored, "arm", "value", "ts", tau2=25.0, arm_a=0, arm_b=1) \
        .orderBy("day").show(10)

    print("monitoring stack complete — every stage above is oracle-gated")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
