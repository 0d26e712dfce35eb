"""Oracle-checked queries for the remaining batch-chain operators:
the seeing pipeline (T20 column drop/rename), paginated concat (T11),
drift relay→bool (S6), and the map-field allow-list (T3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.functions.parsers import map_allowlist
from cerebro_spark.io import load_table
from cerebro_spark.operators.timeops import filter_time_range
from cerebro_spark.operators.weather import lco_seeing_pipeline, paginated_concat


# ---------------------------------------------------------------------------
# seeing chain (T9/T10/T14/T15/T19/T20/T8 + rename)
# ---------------------------------------------------------------------------

def _seeing_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    nn = lambda cond, col: F.when(cond, F.lit(None).cast("double")).otherwise(col)
    allnull = F.col("event_id") % 53 == 0
    return ev.select(
        F.date_trunc("second", F.col("ts")).alias("ts"),
        F.col("event_id"),
        nn(allnull, F.col("value") % F.lit(5.0)).alias("seeing"),
        nn(allnull, (F.col("event_id") % 1000).cast("double")).alias("counts"),
        nn(allnull | (F.col("event_id") % 19 == 0), (F.col("event_id") % 360).cast("double")).alias("azimuth"),
        nn(allnull, (F.col("event_id") % 90).cast("double")).alias("elevation"),
    )


def q_seeing_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _seeing_synth(spark, sf_dir)
    out = lco_seeing_pipeline(
        df, source="dimm", ts_is_string=False, dedup_tiebreak="event_id"
    )
    return out.drop("event_id")


_SEEING_SQL = """
WITH synth AS (
  SELECT date_trunc('second', ts) AS ts, event_id,
    CASE WHEN event_id % 53 = 0 THEN NULL ELSE fmod(value, 5.0) END AS seeing,
    CASE WHEN event_id % 53 = 0 THEN NULL ELSE CAST(event_id % 1000 AS DOUBLE) END AS counts,
    CASE WHEN event_id % 53 = 0 OR event_id % 19 = 0 THEN NULL
         ELSE CAST(event_id % 360 AS DOUBLE) END AS azimuth,
    CASE WHEN event_id % 53 = 0 THEN NULL ELSE CAST(event_id % 90 AS DOUBLE) END AS elevation
  FROM events
),
dropped AS (
  -- counts dropped (tools.py:334); all-null drop on remaining value cols
  SELECT ts, event_id,
    CAST(seeing AS REAL) AS seeing, CAST(azimuth AS REAL) AS azimuth,
    CAST(elevation AS REAL) AS altitude
  FROM synth
  WHERE NOT (seeing IS NULL AND azimuth IS NULL AND elevation IS NULL)
)
SELECT ts, seeing, azimuth, altitude FROM (
  SELECT *, row_number() OVER (PARTITION BY ts ORDER BY event_id) AS rn FROM dropped
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# T11 — paginated chunk concat with overlap
# ---------------------------------------------------------------------------

def q_paginated_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir).select("event_id", "ts", "value")
    # two simulated 15-day fetches with ~2.4h overlap (reference overlaps 0.1d)
    chunk_a = filter_time_range(ev, None, "2024-01-16 00:00:00", "ts")
    chunk_b = filter_time_range(ev, "2024-01-15 21:36:00", None, "ts")
    return paginated_concat([chunk_a, chunk_b], "ts", tiebreak="event_id")


_PAGINATED_SQL = """
SELECT event_id, ts, value FROM events
"""


# ---------------------------------------------------------------------------
# S6 — drift relay→bool + null-category skip
# ---------------------------------------------------------------------------

def q_drift_relay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Models the drift read loop (`drift.py:130-166`): devices with a null
    category are skipped (`drift.py:137-139`); relay-type values map
    closed→true / open→false (`drift.py:149-151`)."""
    ev = load_table(spark, "events", sf_dir)
    readings = ev.select(
        "event_id",
        F.when(F.col("event_id") % 37 == 0, F.lit(None)).otherwise(
            F.col("event_type")
        ).alias("category"),
        F.when(F.col("event_id") % 2 == 0, F.lit("closed")).otherwise(
            F.lit("open")
        ).alias("state"),
    )
    out = (
        readings.filter(F.col("category").isNotNull())
        .withColumn(
            "relay_closed",
            F.when(F.col("state") == "closed", F.lit(True)).otherwise(F.lit(False)),
        )
        .select("event_id", F.col("category").alias("measurement"), "relay_closed")
    )
    return out


_DRIFT_SQL = """
SELECT event_id, event_type AS measurement,
  CASE WHEN event_id % 2 = 0 THEN true ELSE false END AS relay_closed
FROM events WHERE event_id % 37 <> 0
"""


# ---------------------------------------------------------------------------
# T3 — map-field allow-list pruning
# ---------------------------------------------------------------------------

def q_map_allowlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    pts = ev.select(
        "event_id",
        F.create_map(
            F.lit("value"), F.col("value"),
            F.lit("user_id"), F.col("user_id").cast("double"),
            F.lit("noise"), F.lit(0.0),
        ).alias("fields"),
    )
    pruned = map_allowlist(pts, ["value", "user_id"], "fields")
    return pruned.select(
        "event_id",
        F.explode("fields").alias("field", "fvalue"),
    )


_MAP_ALLOWLIST_SQL = """
SELECT event_id, 'value' AS field, value AS fvalue FROM events
UNION ALL
SELECT event_id, 'user_id' AS field, CAST(user_id AS DOUBLE) AS fvalue FROM events
"""


QUERIES = {
    "seeing_chain": q_seeing_chain,
    "paginated_concat": q_paginated_concat,
    "drift_relay": q_drift_relay,
    "map_allowlist": q_map_allowlist,
}

ORACLES = {
    "seeing_chain": _SEEING_SQL,
    "paginated_concat": _PAGINATED_SQL,
    "drift_relay": _DRIFT_SQL,
    "map_allowlist": _MAP_ALLOWLIST_SQL,
}
