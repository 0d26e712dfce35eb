"""The flagship batch pipeline: LCO weather chain (SURVEY §3.3, §7 step 2).

Re-expresses the reference's ``get_lco_weather_data`` transform chain
(``/root/reference/cerebro/tools.py:188-283``) as one declarative DataFrame
pipeline: literal source col (T14) → °F→°C (T13) → all-null-row drop (T15) →
dedup by ts (T8) → wind null-drop (T16) → 5m/10m/30m time-range rolling
windows (T17) → dew point (T18) → float32 down-cast (T19).

Plan shape at scale: filters sit below the shuffles so they push into the
scan; the dedup hash-shuffles on ts; the nine rolling aggregates collapse to
three Window operators (one per frame width) over ONE sort, parallelized by
exact overlap-bucketing (``rolling_by_time(scale_bucket_seconds=86400)``) so a
year of data windows as ~365-way parallel work instead of one global sort.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cerebro_spark.functions.conversions import dew_point, fahrenheit_to_celsius
from cerebro_spark.operators.timeops import (
    cast_ts,
    dedup_by_time,
    filter_time_range,
    rolling_by_time,
)

from functools import reduce

WINDOW_SIZES = {"5m": 300, "10m": 600, "30m": 1800}

#: value columns considered by the all-null row drop (everything except
#: ts/source — reference `tools.py:239` excludes exactly those two).
_VALUE_COLS = [
    "temperature",
    "air_pressure",
    "wind_dir_avg",
    "wind_dir_max",
    "wind_dir_min",
    "rain_intensity",
    "wind_speed_avg",
    "wind_speed_max",
    "wind_speed_min",
    "relative_humidity",
]


def lco_weather_pipeline(
    df: DataFrame,
    source: str = "dupont",
    start: str | dt.datetime | None = None,
    end: str | dt.datetime | None = None,
    ts_is_string: bool = True,
    partition_by: list[str] | None = None,
    dedup_tiebreak: str | None = None,
    scale_bucket_seconds: int | None = 86400,
) -> DataFrame:
    """Run the full weather chain on a weather-shaped DataFrame.

    ``df`` must have the `LCO_WEATHER_SCHEMA` columns (ts + the 10 value
    columns).  Returns the reference's output shape: the input columns plus
    ``source``, 9 rolling columns, and ``dew_point`` — all floats down-cast to
    float32 (reference `tools.py:281`).
    """
    value_cols = [c for c in _VALUE_COLS if c in df.columns]

    if ts_is_string:
        df = cast_ts(df, "ts")  # T9
    df = filter_time_range(df, start, end, "ts")  # T10
    df = df.withColumn("source", F.lit(source))  # T14

    # T13 — Fahrenheit→Celsius.
    df = df.withColumn("temperature", fahrenheit_to_celsius(F.col("temperature")))

    # T15 — drop rows where every value column is null (`tools.py:239`).
    df = df.na.drop(how="all", subset=value_cols)

    # T8 — sort+unique by ts (`tools.py:241-243`).  Pass ``dedup_tiebreak`` for
    # a deterministic survivor (required for oracle comparison); the reference's
    # `.unique("ts")` keeps an arbitrary row.
    df = dedup_by_time(df, "ts", tiebreak=dedup_tiebreak)

    # T16 — drop rows null in the wind columns used by the rolling ops
    # (`tools.py:244-245`).
    df = df.na.drop(subset=["wind_speed_avg", "wind_speed_max", "wind_dir_avg"])

    # T17 — 9 time-range rolling columns (`tools.py:248-272`).
    specs = {}
    for label, seconds in WINDOW_SIZES.items():
        specs[f"wind_speed_avg_{label}"] = ("avg", "wind_speed_avg", seconds)
        specs[f"wind_gust_{label}"] = ("max", "wind_speed_max", seconds)
        specs[f"wind_dir_avg_{label}"] = ("avg", "wind_dir_avg", seconds)
    df = rolling_by_time(
        df,
        specs,
        "ts",
        partition_by=partition_by,
        scale_bucket_seconds=None if partition_by else scale_bucket_seconds,
    )

    # T18 — dew point (`tools.py:274-278`).
    df = df.withColumn(
        "dew_point", dew_point(F.col("temperature"), F.col("relative_humidity"))
    )

    # T19 — float columns → float32 (`tools.py:281`).
    floats = [
        f.name
        for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float")
    ]
    for c in floats:
        df = df.withColumn(c, F.col(c).cast("float"))
    return df


def lco_seeing_pipeline(
    df: DataFrame,
    source: str = "dimm",
    start: str | dt.datetime | None = None,
    end: str | dt.datetime | None = None,
    ts_is_string: bool = True,
    dedup_tiebreak: str | None = None,
) -> DataFrame:
    """The seeing chain (reference ``get_lco_seeing_data`` `tools.py:286-343`
    + source-level post-processing `lco.py:93-100`):

    lit source (T14) → drop counts/air_temp (T20) → all-null row drop (T15) →
    float32 cast (T19) → dedup by ts (T8) → drop the source column and rename
    ``elevation``→``altitude`` for dimm (T20, `lco.py:93-95`).
    """
    if ts_is_string:
        df = cast_ts(df, "ts")
    df = filter_time_range(df, start, end, "ts")
    df = df.withColumn("source", F.lit(source))
    df = df.drop("counts", "air_temp")  # T20 (`tools.py:334`, strict=False)
    value_cols = [
        c for c in df.columns if c not in ("ts", "source", dedup_tiebreak)
    ]
    df = df.na.drop(how="all", subset=value_cols)  # T15 (`tools.py:337`)
    for c, f in [(f.name, f) for f in df.schema.fields]:
        if f.dataType.typeName() in ("double", "float"):
            df = df.withColumn(c, F.col(c).cast("float"))  # T19 (`tools.py:340`)
    df = dedup_by_time(df, "ts", tiebreak=dedup_tiebreak)  # T8 (`lco.py:93`)
    df = df.drop("source")  # `lco.py:93`
    if source == "dimm" and "elevation" in df.columns:
        df = df.withColumnRenamed("elevation", "altitude")  # `lco.py:94-95`
    return df


def paginated_concat(
    chunks: list[DataFrame],
    time_col: str = "ts",
    tiebreak: str | None = None,
) -> DataFrame:
    """T11 — chunked-fetch concat with overlap removal (reference
    `tools.py:117-169`: 15-day chunks overlapping 0.1 day, ``polars.concat``
    then sort+unique on ts).  Union is shuffle-free; the overlap duplicates
    are removed by the same map-side-combinable dedup as T8."""
    unioned = reduce(lambda a, b: a.unionByName(b), chunks)
    return dedup_by_time(unioned, time_col, tiebreak=tiebreak)
