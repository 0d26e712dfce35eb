"""Flagship pipeline tests: the LCO weather chain (SURVEY §7 step 2).

Builds a weather-shaped fixture (FIXTURES.md F2) in-memory and checks each
chain step's semantics against hand-computed expectations, plus a DuckDB
cross-check of the rolling windows on irregular timestamps (the operator the
survey flags as the most likely silent mismatch).
"""

import datetime as dt
import math

import duckdb
import pytest
from pyspark.sql import Row

from cerebro_spark.operators.weather import lco_weather_pipeline


def _mkrow(ts, temp=50.0, wsa=5.0, wsm=8.0, wda=180.0, rh=40.0, **kw):
    base = dict(
        ts=ts,
        temperature=temp,
        air_pressure=1013.0,
        wind_dir_avg=wda,
        wind_dir_max=200.0,
        wind_dir_min=160.0,
        rain_intensity=0.0,
        wind_speed_avg=wsa,
        wind_speed_max=wsm,
        wind_speed_min=2.0,
        relative_humidity=rh,
    )
    base.update(kw)
    return Row(**base)


@pytest.fixture()
def weather_df(spark):
    rows = [
        _mkrow("2024-01-01T00:00:00", temp=50.0, wsa=4.0, wsm=6.0),
        _mkrow("2024-01-01T00:02:30", temp=52.0, wsa=6.0, wsm=9.0),
        _mkrow("2024-01-01T00:02:30", temp=52.0, wsa=6.0, wsm=9.0),  # dup ts (T8)
        _mkrow("2024-01-01T00:04:59", temp=54.0, wsa=8.0, wsm=12.0),
        _mkrow("2024-01-01T00:05:01", temp=54.0, wsa=10.0, wsm=14.0),
        # all-null value row (T15)
        Row(
            ts="2024-01-01T00:06:00",
            temperature=None,
            air_pressure=None,
            wind_dir_avg=None,
            wind_dir_max=None,
            wind_dir_min=None,
            rain_intensity=None,
            wind_speed_avg=None,
            wind_speed_max=None,
            wind_speed_min=None,
            relative_humidity=None,
        ),
        # null wind (T16) but non-null temp — dropped by drop_nulls not by T15
        _mkrow("2024-01-01T00:07:00", wsa=None),
        # gap > 30 min — windows reset
        _mkrow("2024-01-01T01:00:00", temp=60.0, wsa=20.0, wsm=25.0),
    ]
    return spark.createDataFrame(rows)


def test_chain_shape_and_semantics(weather_df):
    out = lco_weather_pipeline(weather_df, source="dupont").orderBy("ts")
    rows = out.collect()

    # dup ts collapsed, all-null row dropped, null-wind row dropped
    assert len(rows) == 5
    # T13: 50F -> 10C
    assert math.isclose(rows[0]["temperature"], 10.0, rel_tol=1e-6)
    # T14: literal source
    assert rows[0]["source"] == "dupont"
    # T18: dew point = temp - round((100-rh)/5, 2)
    assert math.isclose(rows[0]["dew_point"], 10.0 - 12.0, rel_tol=1e-6)
    # T19: floats are float32
    assert dict(out.dtypes)["temperature"] == "float"
    assert dict(out.dtypes)["wind_speed_avg_5m"] == "float"

    # T17 rolling 5m mean: at 00:04:59 window covers 00:00:00..00:04:59 → (4+6+8)/3
    r = {str(x["ts"]): x for x in rows}
    assert math.isclose(
        r["2024-01-01 00:04:59"]["wind_speed_avg_5m"], (4 + 6 + 8) / 3, rel_tol=1e-6
    )
    # at 00:05:01 the 00:00:00 row has aged out (window is (t-5m, t])
    assert math.isclose(
        r["2024-01-01 00:05:01"]["wind_speed_avg_5m"], (6 + 8 + 10) / 3, rel_tol=1e-6
    )
    # gust max over 30m at 00:05:01 → max of all so far
    assert math.isclose(r["2024-01-01 00:05:01"]["wind_gust_30m"], 14.0, rel_tol=1e-6)
    # after the >30m gap, windows contain only the new row
    assert math.isclose(r["2024-01-01 01:00:00"]["wind_speed_avg_30m"], 20.0, rel_tol=1e-6)


def test_rolling_matches_duckdb_oracle(spark):
    """Rolling windows on jittered irregular timestamps vs DuckDB RANGE frames."""
    base = dt.datetime(2024, 1, 1)
    rows = []
    v = 1.0
    secs = 0
    for i in range(200):
        secs += 7 + (i * 37) % 113  # deterministic jitter
        v = (v * 31 + 17) % 97
        rows.append((base + dt.timedelta(seconds=secs), float(v)))
    df = spark.createDataFrame(rows, ["ts", "x"])

    from cerebro_spark.operators.timeops import rolling_by_time

    out = rolling_by_time(
        df, {"x_avg_5m": ("avg", "x", 300), "x_max_10m": ("max", "x", 600)}, "ts"
    )
    got = {
        str(r["ts"]): (r["x_avg_5m"], r["x_max_10m"])
        for r in out.collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE t (ts TIMESTAMP, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = con.execute(
        """
        SELECT ts,
               avg(x) OVER (ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                            RANGE BETWEEN 299 PRECEDING AND CURRENT ROW) AS a,
               max(x) OVER (ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                            RANGE BETWEEN 599 PRECEDING AND CURRENT ROW) AS m
        FROM t ORDER BY ts
        """
    ).fetchall()
    assert len(exp) == len(got)
    for ts, a, m in exp:
        ga, gm = got[str(ts)]
        assert math.isclose(ga, a, rel_tol=1e-9), ts
        assert math.isclose(gm, m, rel_tol=1e-9), ts
