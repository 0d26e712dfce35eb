"""Oracle-checked queries for the time-series joins (as-of, range) — DuckDB
has native ASOF JOIN, giving an independent reference implementation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.joins import asof_join, range_join


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's most recent purchase at-or-before it
    (the quotes-to-trades shape; union-merge implementation vs DuckDB's
    native ASOF JOIN)."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(clicks, purchases, "ts", by=["user_id"])
    return out.select("event_id", "user_id", "ts", "value", "value_right")


_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts, l.value, r.value AS value_right
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a 1-hour staleness tolerance: matches older than the
    tolerance are nulled (InfluxDB/kdb-style bounded as-of)."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, "ts", by=["user_id"], tolerance_seconds=3600
    )
    return out.select("event_id", "user_id", "ts", "value_right")


_ASOF_TOL_SQL = """
SELECT l.event_id, l.user_id, l.ts,
  CASE WHEN r.ts IS NOT NULL
        AND CAST(floor(epoch(l.ts)) AS BIGINT) - CAST(floor(epoch(r.ts)) AS BIGINT) <= 3600
       THEN r.value END AS value_right
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 30 minutes after an error by the same user —
    interval containment via bucketed equi-join (no nested-loop)."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1800 SECONDS")).alias("end"),
    )
    out = range_join(
        purchases, errors, "ts", "start", "end", by=["user_id"],
        bucket_seconds=1800,
    )
    return out.select("event_id", "error_id", "user_id", "ts")


_RANGE_SQL = """
SELECT p.event_id, e.event_id AS error_id, p.user_id, p.ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL '1800 seconds'
"""


QUERIES = {
    "asof_join": q_asof_join,
    "asof_join_tolerance": q_asof_join_tolerance,
    "range_join": q_range_join,
}

ORACLES = {
    "asof_join": _ASOF_SQL,
    "asof_join_tolerance": _ASOF_TOL_SQL,
    "range_join": _RANGE_SQL,
}
