"""InfluxDB read connector: Flux compilation contract (reference
`client.py:57-91`), time-range partition slicing, and a registered-fetch read
through the DataSource API, checked for parity with CerebroClient's local
query over the same points."""

import datetime as dt

from pyspark.sql import functions as F

from cerebro_spark.sources.influx import (
    InfluxReadSource,
    build_flux,
    slice_range,
)


def test_flux_text_contract():
    q = build_flux("sensors", "temperature")
    assert q.splitlines() == [
        'from(bucket: "sensors")',
        '|> filter(fn: (r) => r["_measurement"] == "temperature")',
    ]
    q = build_flux(
        "sensors", "temperature", field="value", start="-15m", pivot=True
    )
    assert '|> range(start: -15m)' in q
    assert '|> filter(fn: (r) => r["_field"] == "value")' in q
    assert q.splitlines()[-1] == (
        '|> pivot(rowKey: ["_time"], columnKey: ["_field"], '
        'valueColumn: "_value")'
    )
    q = build_flux(
        "b", "m", start="2022-10-01T00:05:00Z", end="2022-10-02T00:00:00Z"
    )
    assert "|> range(start: 2022-10-01T00:05:00Z, end: 2022-10-02T00:00:00Z)" in q


def test_slice_range_contiguous():
    s = dt.datetime(2024, 1, 1)
    e = dt.datetime(2024, 1, 2)
    parts = slice_range(s, e, 4)
    assert len(parts) == 4
    assert parts[0][0] == s and parts[-1][1] == e
    for (a0, a1), (b0, b1) in zip(parts, parts[1:]):
        assert a1 == b0  # no gaps, no overlap


def test_influx_read_datasource_with_synthetic_fetch(spark):
    """The synthetic fetch derives its rows from the compiled Flux text, so a
    correct result also proves the option→Flux pushdown ran per partition."""
    base = dt.datetime(2024, 1, 1)
    spark.dataSource.register(InfluxReadSource)
    df = (
        spark.read.format("cerebro_influx")
        .option("bucket", "sensors")
        .option("measurement", "temperature")
        .option("field", "value")
        .option("start", "2024-01-01T00:00:00Z")
        .option("end", "2024-01-01T01:00:00Z")
        .option("num_partitions", "3")
        .option("fetch_fn", "synthetic")
        .option("step_seconds", "600")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3  # time-sliced parallel read
    rows = df.orderBy("time").collect()
    # 1h range at 10-min cadence across 3 disjoint slices
    assert len(rows) == 6
    assert all(r["field"] == "value" for r in rows)
    assert rows[0]["time"] == base
    assert rows[-1]["time"] == base + dt.timedelta(minutes=50)
    assert rows[0]["value"] == 20.0


def test_filter_pushdown_reaches_flux(spark):
    """A Spark-side time-range + field filter, with NO start/end options,
    must be compiled into the Flux range: the synthetic fetch emits rows
    ONLY when the compiled Flux contains a range, so non-empty output
    proves the pushdown reached the query text."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cerebro_spark.sources.influx import InfluxReadSource

    spark.dataSource.register(InfluxReadSource)
    df = (
        spark.read.format("cerebro_influx")
        .option("bucket", "b")
        .option("measurement", "m")
        .option("fetch_fn", "synthetic")
        .option("step_seconds", "600")
        .load()
        .filter(
            (F.col("time") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
            & (F.col("time") < F.lit("2024-01-01 02:00:00").cast("timestamp"))
            & (F.col("field") == "temp")
        )
    )
    rows = df.collect()
    assert rows, "pushdown did not reach the Flux range"
    assert all(r["field"] == "temp" for r in rows)
    lo = dt.datetime(2024, 1, 1, 0, 0)
    hi = dt.datetime(2024, 1, 1, 2, 0)
    assert all(lo <= r["time"] < hi for r in rows)
    assert len(rows) == 12  # 2h at 600s steps — server-side range, not post-filter


def test_explicit_options_win_over_pushed_bounds(spark):
    from pyspark.sql import functions as F

    from cerebro_spark.sources.influx import InfluxReadSource

    spark.dataSource.register(InfluxReadSource)
    df = (
        spark.read.format("cerebro_influx")
        .option("bucket", "b")
        .option("measurement", "m")
        .option("fetch_fn", "synthetic")
        .option("step_seconds", "600")
        .option("start", "2024-01-01T00:00:00Z")
        .option("end", "2024-01-01T01:00:00Z")
        .load()
        .filter(F.col("time") < F.lit("2024-06-01 00:00:00").cast("timestamp"))
    )
    # option range (1h) bounds the scan; the pushed filter only re-trims
    assert len(df.collect()) == 6


def test_inclusive_upper_bound_not_lost_to_exclusive_flux_stop(spark):
    """`time <= v` must still return the row at exactly t == v: Flux stop
    is exclusive, so the pushed end over-fetches one µs and Spark trims."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cerebro_spark.sources.influx import InfluxReadSource

    spark.dataSource.register(InfluxReadSource)
    # synthetic fetch emits points at exact 600s steps — 01:00:00 is a point
    v = "2024-01-01 01:00:00"
    df = (
        spark.read.format("cerebro_influx")
        .option("bucket", "b")
        .option("measurement", "m")
        .option("fetch_fn", "synthetic")
        .option("step_seconds", "600")
        .load()
        .filter(
            (F.col("time") >= F.lit("2024-01-01 00:00:00").cast("timestamp"))
            & (F.col("time") <= F.lit(v).cast("timestamp"))
        )
    )
    times = sorted(r["time"] for r in df.collect())
    assert times[-1] == dt.datetime(2024, 1, 1, 1, 0), times[-3:]
    assert len(times) == 7  # 00:00 .. 01:00 inclusive at 600s steps


def test_partitions_fall_back_on_relative_end():
    """num_partitions>1 with an absolute start but a RELATIVE end ('-5m' /
    'now()') can't be sliced client-side — must fall back to one partition,
    not raise (ADVICE r2 regression)."""
    from cerebro_spark.sources.influx import _InfluxReader

    for end in ("-5m", "now()"):
        r = _InfluxReader(
            {
                "bucket": "b",
                "measurement": "m",
                "fetch_fn": "synthetic",
                "num_partitions": "4",
                "start": "2024-01-01T00:00:00Z",
                "end": end,
            }
        )
        parts = r.partitions()
        assert len(parts) == 1
        assert parts[0].start == "2024-01-01T00:00:00Z"
        assert parts[0].end == end
    # absolute both ends still slices
    r = _InfluxReader(
        {
            "bucket": "b",
            "measurement": "m",
            "fetch_fn": "synthetic",
            "num_partitions": "4",
            "start": "2024-01-01T00:00:00Z",
            "end": "2024-01-02T00:00:00Z",
        }
    )
    assert len(r.partitions()) == 4
