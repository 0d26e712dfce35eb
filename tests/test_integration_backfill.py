"""End-to-end integration of the reference's §3.3 backfill lifecycle:
simulated API payload → weather transform chain → unpivot to points →
partitioned store → CerebroClient query — the complete loop a cerebro user
runs (fetch, transform, ingest, query back)."""

import datetime as dt

from pyspark.sql import functions as F

from cerebro_spark.operators.pivot import unpivot_to_points
from cerebro_spark.operators.weather import lco_weather_pipeline
from cerebro_spark.plans.client import CerebroClient
from cerebro_spark.schema import LCO_WEATHER_SCHEMA
from cerebro_spark.streaming.sinks import parquet_point_sink


def test_backfill_lifecycle(spark, tmp_path):
    # 1. "API" payload lands as a file (the reference fetches HTTP → Polars)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(120):
        ts = base + dt.timedelta(minutes=1 * i, seconds=(i * 7) % 50)
        rows.append(
            (
                ts.strftime("%Y-%m-%dT%H:%M:%S"),
                50.0 + (i % 20),          # °F
                1013.0, 180.0, 200.0, 160.0, 0.0,
                5.0 + (i % 7), 8.0 + (i % 5), 2.0,
                40.0 + (i % 30),
            )
        )
    api_file = str(tmp_path / "api")
    spark.createDataFrame(rows, LCO_WEATHER_SCHEMA).write.mode(
        "overwrite"
    ).parquet(api_file)

    # 2. transform chain (T8-T19)
    weather = lco_weather_pipeline(
        spark.read.schema(LCO_WEATHER_SCHEMA).parquet(api_file),
        source="dupont",
        scale_bucket_seconds=86400,
    )
    assert "wind_speed_avg_30m" in weather.columns

    # 3. wide rows → canonical points → partitioned store (T21 + K3 shape)
    points = unpivot_to_points(
        weather,
        measurement="weather",
        time_col="ts",
        tags={"observatory": "lco", "source": "dupont"},
        bucket="weather",
    )
    store = str(tmp_path / "store")
    parquet_point_sink(points, store)

    # 4. query back through the client (Q1-Q6)
    client = CerebroClient(spark, {"weather": spark.read.parquet(store)})
    out = client.query(
        "weather",
        measurement="weather",
        field="temperature",
        start=base,
        end=base + dt.timedelta(days=1),
    ).orderBy("time")
    got = out.collect()
    assert len(got) == 120
    # °F→°C round-trips through the store: 50F = 10C
    assert abs(got[0]["temperature"] - 10.0) < 1e-5

    # and an aggregate-window query over the stored points
    hourly = client.query(
        "weather",
        measurement="weather",
        field="dew_point",
        start=base,
        end=base + dt.timedelta(days=1),
        aggregate_window=(3600, "avg"),
    )
    assert hourly.count() == 2  # minutes 0-119 → two hourly buckets
