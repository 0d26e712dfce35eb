"""Canonical schemas for the point model and the LCO batch tables.

The reference's single fundamental abstraction is the InfluxDB-style data
point: ``{measurement, tags, fields, time}`` batched as ``DataPoints(bucket,
data)`` (``/root/reference/cerebro/sources/source.py:35-37``; point shape
``cerebro/tools.py:394-399``).  Field sets are dynamic per point (SURVEY §1.3),
so the Spark mapping keeps fields as maps, split by type because Spark maps are
homogeneous (SURVEY §1.4).

At 100 TB the point table is stored long-format, partitioned by
``bucket``/date; wide per-measurement views are derived by pivot (Q5) so the
scan only ever reads the map columns it needs.
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Canonical point-stream schema (SURVEY §1.4).  One row = one point.
POINT_SCHEMA = T.StructType(
    [
        T.StructField("measurement", T.StringType(), False),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("fields", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("fields_str", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("fields_bool", T.MapType(T.StringType(), T.BooleanType()), True),
        # Reference stamps ns-epoch ints (cerebro.py:407-411); Spark timestamps
        # are µs — the ns→µs truncation is a documented delta (SURVEY §1.4).
        T.StructField("time", T.TimestampType(), True),
        T.StructField("bucket", T.StringType(), True),
    ]
)

#: LCO weather API schema — reference `tools.py:32-46` (LCO_WEATHER_SCHEMA).
#: Reference deliberately down-casts floats to f32 (`tools.py:281`).
LCO_WEATHER_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.StringType(), True),
        T.StructField("temperature", T.FloatType(), True),
        T.StructField("air_pressure", T.FloatType(), True),
        T.StructField("wind_dir_avg", T.FloatType(), True),
        T.StructField("wind_dir_max", T.FloatType(), True),
        T.StructField("wind_dir_min", T.FloatType(), True),
        T.StructField("rain_intensity", T.FloatType(), True),
        T.StructField("wind_speed_avg", T.FloatType(), True),
        T.StructField("wind_speed_max", T.FloatType(), True),
        T.StructField("wind_speed_min", T.FloatType(), True),
        T.StructField("relative_humidity", T.FloatType(), True),
    ]
)

#: LCO seeing DIMM schema — reference `tools.py:48-56`.
LCO_SEEING_DIMM_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.StringType(), True),
        T.StructField("seeing", T.FloatType(), True),
        T.StructField("counts", T.FloatType(), True),
        T.StructField("azimuth", T.FloatType(), True),
        T.StructField("elevation", T.FloatType(), True),
    ]
)

#: LCO seeing Magellan schema — reference `tools.py:58-65`.
LCO_SEEING_MAGELLAN_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.StringType(), True),
        T.StructField("seeing", T.FloatType(), True),
        T.StructField("counts", T.FloatType(), True),
        T.StructField("air_temp", T.FloatType(), True),
    ]
)

#: Driver testdata table names (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
