"""The overlap-bucket scale path for rolling windows must be EXACTLY equal to
the single-partition global path (it's the same math, parallelized)."""

import datetime as dt

from cerebro_spark.operators.timeops import rolling_by_time

SPECS = {
    "a5": ("avg", "x", 300),
    "m30": ("max", "x", 1800),
    "s60": ("sum", "x", 3600),
}


def test_scale_path_equals_global(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    secs = 0
    v = 7.0
    for i in range(3000):
        secs += 11 + (i * 53) % 977  # irregular, spans multiple day-buckets
        v = (v * 13 + 5) % 83
        rows.append((base + dt.timedelta(seconds=secs), float(v)))
    df = spark.createDataFrame(rows, ["ts", "x"])

    glob = rolling_by_time(df, SPECS, "ts").collect()
    # bucket width barely above the max window → many buckets, max context
    par = rolling_by_time(df, SPECS, "ts", scale_bucket_seconds=3600).collect()

    key = lambda r: r["ts"]
    g = sorted(glob, key=key)
    p = sorted(par, key=key)
    assert len(g) == len(p) == 3000
    for a, b in zip(g, p):
        assert a == b
