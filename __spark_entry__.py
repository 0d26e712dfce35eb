"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one (or one family of) SURVEY §2 operators
through the ``cerebro_spark`` package; ``oracle_sql()`` holds the equivalent
DuckDB SQL.  Column names are aliased identically on both sides (driver hashes
sort columns by name).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# the driver may import this module by file path from any cwd — make the
# sibling cerebro_spark package importable regardless
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cerebro_spark.functions.conversions import (
    dew_point,
    fahrenheit_to_celsius,
    volts_to_torr,
)
from cerebro_spark.io import load_table
from cerebro_spark.operators.pivot import pivot_fields, unpivot_to_points
from cerebro_spark.operators.timeops import (
    dedup_by_time,
    filter_time_range,
    relative_range,
    rolling_by_time,
)
from cerebro_spark.operators.weather import lco_weather_pipeline
from cerebro_spark.plans.client import CerebroClient
from cerebro_spark.queries import analytics_q as _aq
from cerebro_spark.queries import batch_q as _bq
from cerebro_spark.queries import extensions as _ext
from cerebro_spark.queries import joins_q as _jq
from cerebro_spark.queries import multimodal_q as _mmq
from cerebro_spark.queries import parsers_q as _pq
from cerebro_spark.queries import pipeline_q as _plq
from cerebro_spark.queries import streaming_q as _sq
from cerebro_spark.queries import text_q as _txq
from cerebro_spark.queries import tsdb_q as _tq
from cerebro_spark.queries import volume_q as _vq

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


# ---------------------------------------------------------------------------
# flagship: the LCO weather chain (SURVEY §3.3 / §7 step 2) on a weather-shaped
# projection of `events` (deterministic synthesis so the DuckDB oracle can
# reproduce it exactly).
# ---------------------------------------------------------------------------

def _weather_synth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    allnull = F.col("event_id") % 97 == 0

    def nn(extra_null, col):
        cond = allnull | extra_null if extra_null is not None else allnull
        return F.when(cond, F.lit(None).cast("double")).otherwise(col)

    return ev.select(
        F.date_trunc("second", F.col("ts")).alias("ts"),
        F.col("event_id"),
        nn(None, F.col("value")).alias("temperature"),
        nn(None, F.lit(990.0) + (F.col("event_id") % 50)).alias("air_pressure"),
        nn(F.col("event_id") % 31 == 0, ((F.col("event_id") * 7) % 360).cast("double")).alias("wind_dir_avg"),
        nn(F.col("event_id") % 23 == 0, F.col("value") % F.lit(30.0)).alias("wind_speed_avg"),
        nn(F.col("event_id") % 29 == 0, (F.col("value") % F.lit(40.0)) + F.lit(5.0)).alias("wind_speed_max"),
        nn(None, (F.col("event_id") % 101).cast("double")).alias("relative_humidity"),
    )


_WEATHER_SYNTH_SQL = """
    SELECT date_trunc('second', ts) AS ts, event_id,
      CASE WHEN event_id % 97 = 0 THEN NULL ELSE value END AS temperature,
      CASE WHEN event_id % 97 = 0 THEN NULL ELSE 990.0 + (event_id % 50) END AS air_pressure,
      CASE WHEN event_id % 97 = 0 OR event_id % 31 = 0 THEN NULL
           ELSE CAST((event_id * 7) % 360 AS DOUBLE) END AS wind_dir_avg,
      CASE WHEN event_id % 97 = 0 OR event_id % 23 = 0 THEN NULL
           ELSE fmod(value, 30.0) END AS wind_speed_avg,
      CASE WHEN event_id % 97 = 0 OR event_id % 29 = 0 THEN NULL
           ELSE fmod(value, 40.0) + 5.0 END AS wind_speed_max,
      CASE WHEN event_id % 97 = 0 THEN NULL ELSE CAST(event_id % 101 AS DOUBLE) END AS relative_humidity
    FROM events
"""


def q_weather_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _weather_synth(spark, sf_dir)
    out = lco_weather_pipeline(
        df, source="dupont", ts_is_string=False, dedup_tiebreak="event_id"
    )
    return out.drop("event_id")


_WEATHER_CHAIN_SQL = f"""
WITH synth AS ({_WEATHER_SYNTH_SQL}),
conv AS (
  SELECT ts, event_id, (temperature - 32.0) * 5.0 / 9.0 AS temperature,
         air_pressure, wind_dir_avg, wind_speed_avg, wind_speed_max, relative_humidity
  FROM synth
  WHERE NOT (temperature IS NULL AND air_pressure IS NULL AND wind_dir_avg IS NULL
             AND wind_speed_avg IS NULL AND wind_speed_max IS NULL
             AND relative_humidity IS NULL)
),
dedup AS (
  SELECT ts, event_id, temperature, air_pressure, wind_dir_avg, wind_speed_avg,
         wind_speed_max, relative_humidity
  FROM (SELECT *, row_number() OVER (PARTITION BY ts ORDER BY event_id) AS rn FROM conv)
  WHERE rn = 1
),
clean AS (
  SELECT * FROM dedup
  WHERE wind_speed_avg IS NOT NULL AND wind_speed_max IS NOT NULL
        AND wind_dir_avg IS NOT NULL
),
win AS (
  SELECT ts, temperature, air_pressure, wind_dir_avg, wind_speed_avg, wind_speed_max,
         relative_humidity,
    avg(wind_speed_avg) OVER w5 AS wind_speed_avg_5m,
    avg(wind_speed_avg) OVER w10 AS wind_speed_avg_10m,
    avg(wind_speed_avg) OVER w30 AS wind_speed_avg_30m,
    max(wind_speed_max) OVER w5 AS wind_gust_5m,
    max(wind_speed_max) OVER w10 AS wind_gust_10m,
    max(wind_speed_max) OVER w30 AS wind_gust_30m,
    avg(wind_dir_avg) OVER w5 AS wind_dir_avg_5m,
    avg(wind_dir_avg) OVER w10 AS wind_dir_avg_10m,
    avg(wind_dir_avg) OVER w30 AS wind_dir_avg_30m
  FROM clean
  WINDOW
    w5 AS (ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 299 PRECEDING AND CURRENT ROW),
    w10 AS (ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 599 PRECEDING AND CURRENT ROW),
    w30 AS (ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 1799 PRECEDING AND CURRENT ROW)
)
SELECT ts,
  CAST(temperature AS REAL) AS temperature,
  CAST(air_pressure AS REAL) AS air_pressure,
  CAST(wind_dir_avg AS REAL) AS wind_dir_avg,
  CAST(wind_speed_avg AS REAL) AS wind_speed_avg,
  CAST(wind_speed_max AS REAL) AS wind_speed_max,
  CAST(relative_humidity AS REAL) AS relative_humidity,
  'dupont' AS source,
  CAST(wind_speed_avg_5m AS REAL) AS wind_speed_avg_5m,
  CAST(wind_gust_5m AS REAL) AS wind_gust_5m,
  CAST(wind_dir_avg_5m AS REAL) AS wind_dir_avg_5m,
  CAST(wind_speed_avg_10m AS REAL) AS wind_speed_avg_10m,
  CAST(wind_gust_10m AS REAL) AS wind_gust_10m,
  CAST(wind_dir_avg_10m AS REAL) AS wind_dir_avg_10m,
  CAST(wind_speed_avg_30m AS REAL) AS wind_speed_avg_30m,
  CAST(wind_gust_30m AS REAL) AS wind_gust_30m,
  CAST(wind_dir_avg_30m AS REAL) AS wind_dir_avg_30m,
  CAST(temperature - round((100.0 - relative_humidity) / 5.0, 2) AS REAL) AS dew_point
FROM win
"""


# ---------------------------------------------------------------------------
# individual operator queries (SURVEY §2.3 / §2.4)
# ---------------------------------------------------------------------------

def q_dedup_by_second(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8 — dedup on second-truncated ts, deterministic min-event_id survivor."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "ts_sec", F.date_trunc("second", F.col("ts"))
    )
    out = dedup_by_time(ev, "ts_sec", tiebreak="event_id")
    return out.select("event_id", "ts_sec", "user_id", "event_type", "value")


_DEDUP_SQL = """
SELECT event_id, ts_sec, user_id, event_type, value
FROM (
  SELECT event_id, date_trunc('second', ts) AS ts_sec, user_id, event_type, value,
         row_number() OVER (PARTITION BY date_trunc('second', ts) ORDER BY event_id) AS rn
  FROM events
) WHERE rn = 1
"""


def q_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10 — inclusive time-range filter (pushed into the parquet scan)."""
    ev = load_table(spark, "events", sf_dir)
    out = filter_time_range(ev, "2024-01-10 00:00:00", "2024-01-20 00:00:00", "ts")
    return out.select("event_id", "ts", "event_type", "value")


_TIME_RANGE_SQL = """
SELECT event_id, ts, event_type, value FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-20 00:00:00'
"""


def q_rolling_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T17 — time-range rolling aggregates over the irregular events series."""
    ev = load_table(spark, "events", sf_dir)
    # note: a rolling SUM over ~300 double terms at magnitude 1e4 differs from
    # the oracle in the 6th significant digit (summation-order fp noise) — the
    # window family is exercised with avg/max/min whose relative error stays
    # far inside the canonicalization rounding.
    out = rolling_by_time(
        ev,
        {
            "value_avg_5m": ("avg", "value", 300),
            "value_max_30m": ("max", "value", 1800),
            "value_min_1h": ("min", "value", 3600),
        },
        "ts",
        scale_bucket_seconds=86400,
    )
    return out.select("event_id", "ts", "value", "value_avg_5m", "value_max_30m", "value_min_1h")


_ROLLING_SQL = """
SELECT event_id, ts, value,
  avg(value) OVER w5 AS value_avg_5m,
  max(value) OVER w30 AS value_max_30m,
  min(value) OVER w60 AS value_min_1h
FROM events
WINDOW
  w5 AS (ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 299 PRECEDING AND CURRENT ROW),
  w30 AS (ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 1799 PRECEDING AND CURRENT ROW),
  w60 AS (ORDER BY CAST(floor(epoch(ts)) AS BIGINT) RANGE BETWEEN 3599 PRECEDING AND CURRENT ROW)
"""


def q_relative_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T23/T7 — relative time window: last 5 days before the data's max ts."""
    ev = load_table(spark, "events", sf_dir)
    out = relative_range(ev, 5 * 86400, "ts")
    return out.select("event_id", "ts", "value")


_RELATIVE_RANGE_SQL = """
SELECT event_id, ts, value FROM events
WHERE ts >= (SELECT max(ts) - INTERVAL '432000 seconds' FROM events)
"""


def q_pivot_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 — long→wide pivot: avg value per user per event_type."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.avg("value"))
    )


_PIVOT_SQL = """
SELECT user_id,
  avg(value) FILTER (event_type = 'click') AS click,
  avg(value) FILTER (event_type = 'error') AS error,
  avg(value) FILTER (event_type = 'purchase') AS purchase,
  avg(value) FILTER (event_type = 'signup') AS signup,
  avg(value) FILTER (event_type = 'view') AS view
FROM events GROUP BY user_id
"""


def q_bitmask_unpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12 — 16-bit bitmask → 16 per-channel rows (reference `lvm.py:396-418`)."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "mask", F.col("event_id") % 65536
    )
    out = ev.select(
        "event_id",
        "mask",
        F.explode(F.sequence(F.lit(0), F.lit(15))).alias("channel"),
    ).select(
        "event_id",
        "channel",
        F.concat(F.lit("ch"), F.col("channel")).alias("channel_name"),
        F.expr("shiftright(mask, CAST(channel AS INT)) % 2").alias("bit"),
    )
    return out


_BITMASK_SQL = """
SELECT event_id, ch AS channel, 'ch' || CAST(ch AS VARCHAR) AS channel_name,
       (CAST(event_id % 65536 AS BIGINT) >> ch) % 2 AS bit
FROM events, generate_series(0, 15) AS g(ch)
"""


def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2-analog — extract nested JSON props into a flat typed column."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("props_k"),
    )


_JSON_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS props_k FROM events
"""


def q_unit_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13/T18 — °F→°C, dew point, volts→Torr as columnar expressions."""
    ev = load_table(spark, "events", sf_dir)
    temp_c = fahrenheit_to_celsius(F.col("value"))
    rh = (F.col("event_id") % 101).cast("double")
    # pressure emitted as %.6e string: pow() differs by 1 ulp between the two
    # engines' libm, which a near-exact hash can see — a 7-sig-digit canonical
    # string is stable on both sides.
    return ev.select(
        "event_id",
        temp_c.alias("temp_c"),
        dew_point(temp_c, rh).alias("dew_point"),
        F.format_string(
            "%.6e", volts_to_torr(F.col("value") / F.lit(100.0))
        ).alias("pressure_torr"),
    )


_UNIT_SQL = """
SELECT event_id,
  (value - 32.0) * 5.0 / 9.0 AS temp_c,
  (value - 32.0) * 5.0 / 9.0 - round((100.0 - CAST(event_id % 101 AS DOUBLE)) / 5.0, 2) AS dew_point,
  printf('%.6e', power(10.0, (value / 100.0) * 2.0 + -10.0) * 0.00750062) AS pressure_torr
FROM events
"""


def q_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T21 — wide→long unpivot (value columns → field/value rows)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        "ts",
        F.expr(
            "stack(2, 'value', value, 'user_id', CAST(user_id AS DOUBLE)) AS (field, value)"
        ),
    )


_UNPIVOT_SQL = """
SELECT event_id, ts, 'value' AS field, value FROM events
UNION ALL
SELECT event_id, ts, 'user_id' AS field, CAST(user_id AS DOUBLE) AS value FROM events
"""


def q_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T22 — high-water-mark: max ts truncated to seconds (`lco.py:116-122`)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(F.date_trunc("second", F.max("ts")).alias("hwm"))


_HWM_SQL = "SELECT date_trunc('second', max(ts)) AS hwm FROM events"


def q_client_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-Q6 — CerebroClient parity: points store → range → measurement →
    field filter → pivot (reference `client.py:57-129`)."""
    ev = load_table(spark, "events", sf_dir)
    points = unpivot_to_points(
        ev,
        measurement="events",
        time_col="ts",
        tags={"source": "driver"},
        value_cols=["value", "user_id"],
        bucket="telemetry",
    )
    client = CerebroClient(spark, {"telemetry": points})
    return client.query(
        "telemetry",
        measurement="events",
        field="value",
        start="2024-01-05 00:00:00",
        end="2024-01-25 00:00:00",
    )


_CLIENT_SQL = """
SELECT ts AS time, value FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00' AND ts < TIMESTAMP '2024-01-25 00:00:00'
"""


# ---------------------------------------------------------------------------
# analytic volume queries (engine breadth; shuffle/broadcast design surface)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation: map-side partial agg, one shuffle."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
  sum(l_quantity) AS sum_qty,
  sum(l_extendedprice) AS sum_base_price,
  sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
  avg(l_quantity) AS avg_qty,
  avg(l_extendedprice) AS avg_price,
  avg(l_discount) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join pipeline: fact × broadcast dims (customer→nation→region)."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with SF — AQE broadcasts it only while it fits;
        # nation is constant-size, so its hint is unconditional
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


_REVENUE_SQL = """
SELECT n_name,
  sum(l_extendedprice * (1 - l_discount)) AS revenue,
  count(*) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: selective join + agg + deterministic top-N."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    agg = (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )
    # TakeOrderedAndProject top-k + bounded rank: a global row_number window
    # serializes the whole post-agg set through one task at scale (round-1
    # single-partition WindowExec warning).
    from cerebro_spark.operators.util import top_k_ranked

    return top_k_ranked(
        agg.select("o_orderkey", "o_orderdate", "o_orderpriority", "revenue"),
        [("revenue", "desc"), ("o_orderkey", "asc")],
        k=10,
    )


_TOP_UNSHIPPED_SQL = """
SELECT o_orderkey, o_orderdate, o_orderpriority, revenue, rank FROM (
  SELECT o_orderkey, o_orderdate, o_orderpriority,
         sum(l_extendedprice * (1 - l_discount)) AS revenue,
         row_number() OVER (ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, o_orderkey ASC) AS rank
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  WHERE c_mktsegment = 'BUILDING' AND l_shipdate > o_orderdate
  GROUP BY o_orderkey, o_orderdate, o_orderpriority
) WHERE rank <= 10
"""


def q_downsample_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window downsample (the agg the reference left to InfluxDB)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket_ts"),
            "event_type",
        )
        .agg(
            F.avg("value").alias("value_avg"),
            F.min("value").alias("value_min"),
            F.max("value").alias("value_max"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_DOWNSAMPLE_SQL = """
SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
  avg(value) AS value_avg, min(value) AS value_min, max(value) AS value_max,
  count(*) AS n
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_weather_chain(spark, "/root/testdata/sf0.001")


# The per-round correctness snapshot has covered exactly 50 queries per round
# (CORRECTNESS_r01 == CORRECTNESS_r02 key set == the first 50 registered at the
# round-1 snapshot).  Rotate queries that have never had a hard-gate row to the
# FRONT of the registry so they get driver-checked this round; the
# previously-green remainder keeps local-oracle coverage via tools/check.py.
# ROTATION HISTORY (recompute from CORRECTNESS_r*.json before trusting):
# r04 gated zero (import crash); r05 gated the head-50 of the round-4
# rotation list (all green); r06 gated its staged head-50 (all green)
# but left 53 never-gated; r07 executed the debt-first rotation — its
# staged head-50 gated ALL GREEN (CORRECTNESS_r07.json keys verified ==
# that head by tools/rotation_check.py), bringing the cumulative ledger
# to 249/261 with exactly 12 never-gated (3 staged debt + 9 r07 births).
# r08 promotes those 12 to the head (below any r08 births) and moves the
# gated r07 head-50 to the tail.  POLICY: new queries enter at the very
# front so they gate the round they are born — EXCEPT while never-gated
# debt exceeds one 50-query snapshot (the r06 lesson): then births
# register BELOW the cutoff with local-oracle + pytest evidence and gate
# the following round.  Debt is now 12 < 50, so the front-of-head policy
# applies again this round.  tools/rotation_check.py (smoke gate step 6)
# mechanically enforces all of the above — trust it, not this prose.
#
# R08 SECOND SESSION: the head filled to EXACTLY 50 (12 in-session
# births + the 38 staged), after which 20 more births (plus the
# post-close rmst_lifetime) registered below the cutoff per the
# staged-debt precedent.  R09 (this round) executes the move: the
# gated r08 head-50 goes to the tail, the 21 staged late births are
# promoted to the head.  Gating them closes the cumulative ledger at
# 320/320 driver-gated.  R09 births front-insert above them (29 free
# slots at the cutover).
_SNAPSHOT_PRIORITY = [
    # R11 HEAD: r11 births front-insert here as they land (41 free slots
    # at the cutover — every r10 entry below is driver-gated green in
    # CORRECTNESS_r10, so the head carries zero debt).
    "bpe_encode_check",       # text -> subword-id sequences under the
                              # trained merge table (train + vocab + encode)
    "pack_sequences_check",   # boundary-preserving first-fit sequence
                              # packing (oracle = recursive-CTE fold)
    "streaming_video_neardup_check",  # video_signature wired into the
                              # online media sink (last unwired modality)
    # --- r11 cutoff: everything below is driver-gated green (r01-r10) ---
    # R10 HEAD: r10 births front-insert here as they land (50 free slots
    # at the cutover — every r09 entry below is driver-gated green in
    # CORRECTNESS_r09, so the head carries zero debt).
    "streaming_media_neardup_check",  # online media dedup sink end-to-end
    "hamming_index_probe",    # persisted Hamming index online lookup
    "image_dhash_nulls",      # fail-soft NULL/corrupt payload gate
    "video_neardup_pairs",    # video dedup: frame hashes -> temporal majority
                              # signature -> banded join -> overlap verify
    "bpe_train_merges",       # distributed BPE merge-table learning (6 rounds)
    "bpe_fertility_by_lang",  # fertility under the TRAINED merge table
    "dhash_ahash_vote_pairs", # two-vote precision gate (dhash ∧ ahash)
    "video_dedup_clusters",   # video dedup end-to-end (verify -> CC)
    "wordpiece_train_merges", # WordPiece likelihood-argmax merge training
    # --- r10 cutoff: everything below is driver-gated green (r01-r09) ---
    # R09 HEAD: r09 births front-insert here as they land (29 free
    # slots), followed by the 21 staged r08 late births promoted per the
    # staged-debt policy — gating them closes the ledger at 320/320.
    #
    # R09 BIRTHS (front-inserted, gate this round) — the multimodal
    # growth the r8 verdict ordered:
    "dhash_docs",             # 60-bit byte-dHash perceptual fingerprints
    "image_dhash_bmp",        # REAL BMP decode -> pixel dHash, byte oracle
    "image_thumbnails",       # REAL decode -> exact area-mean resize
    "video_frame_luma",       # REAL AVI round-trip -> frame luma sums
    "video_shot_cuts",        # shot-boundary detection over decoded frames
    "dhash_variant_pairs",    # brightness-shift near-dup banded pairs
    "dhash_dedup_clusters",   # perceptual dedup end-to-end (pairs -> CC)
    "streaming_dhash_check",  # streamed fingerprints == batch == oracle
    "cross_modal_dups",       # image near-dup x text-disjoint composition
    "audio_fingerprints",     # band-energy fp through real WAV round-trip
    "audio_scale_match",      # gain-invariant clip matching (fp equi-join)
    "audio_neardup_pairs",    # near-match retrieval (banded 32-bit fp)
    "media_sniff_meta",       # real BMP/WAV header write+parse metadata
    #
    # R08 LATE BIRTHS (promoted to head, gate this round):
    "mann_whitney_value",     # rank-sum test (outlier-immune A/B)
    "kruskal_value_type",     # k-group rank ANOVA (H + epsilon-sq)
    "event_study_weekly",     # DiD parallel-trends validity readout
    "burrows_delta",          # stylometric source-pair distance
    "ols_value_hour_dow",     # two-regressor OLS (partial effects)
    "yuen_trimmed_value",     # Yuen trimmed-mean robust A/B t
    "doc_novelty",            # per-doc surprisal profile per source
    "label_silhouette",       # centroid silhouette cluster quality
    "fightin_words",          # Dirichlet-prior log-odds distinctive terms
    "hill_diversity",         # Hill-number diversity profile (q=0,1,2)
    "purchase_hour_trend",    # Cochran-Armitage ordered trend test
    "seasonality_strength",   # Hyndman seasonal/trend strength readout
    "revenue_per_event_ztest",  # ratio-metric A/B (delta method)
    "levene_value_type",      # Brown-Forsythe equal-variance gate
    "forecast_backtest",      # seasonal-naive MASE/sMAPE backtest
    "trade_reciprocity",      # directed-edge reciprocity diagnostic
    "vocab_jaccard",          # pairwise source vocabulary overlap
    "langid_prf1",            # per-class language-ID precision/recall
    "dedup_savings",          # exact-dup sizing (docs + bytes saved)
    "revenue_concentration",  # inverse-Lorenz top-k% concentration
    "rmst_lifetime",          # restricted mean survival time at tau
    # --- r09 cutoff: the queries above plus any r09 front-of-head
    # births gate in CORRECTNESS_r09 ---
    # r08 head-50, gated green in CORRECTNESS_r08 (moved to tail per
    # the staged procedure).  R08 BIRTHS:
    "mutual_topk_pairs",      # reciprocal top-1 cosine (MNN alignment)
    "ttr_by_source",          # type-token + hapax lexical diversity
    "heaps_law_fit",          # vocabulary-growth exponent (Heaps' law)
    "good_turing_unseen",     # unseen-mass estimate (corpus coverage)
    "brier_decomposition",    # Brier reliability/resolution/uncertainty
    "nelson_aalen_hazard",    # cumulative hazard (survival family)
    "logrank_survival",       # two-sample log-rank test
    "value_decile_lift",      # gains/lift table (model eval)
    "kendall_tau_value_hour", # Kendall tau-b pairwise concordance
    "anova_value_type",       # one-way ANOVA F + eta-squared
    "theil_index_type",       # Theil T inequality (entropy family)
    "hhi_supplier_share",     # Herfindahl concentration per nation
    "ranker_sign_test",       # paired nDCG sign test (ranker A/B readout)
    "domain_guarded_split",   # registered-domain leakage-guarded split
    "decontaminate_eval",     # train×eval near-dup decontamination join
    "source_mrr",             # MRR@10 known-item retrieval metric
    "event_fleiss_kappa",     # multi-rater chance-corrected agreement
    "mde_value",              # minimum-detectable-effect planning readout
    "bt_brand_strengths",     # Bradley-Terry preference strengths (MM)
    "cms_top_terms",          # count-min sketch vs exact heavy hitters
    "readability_by_source",  # Flesch reading-ease text quality
    "t_closeness_events",     # t-closeness privacy audit (EMD per QI class)
    "fk_integrity",           # referential-integrity orphan audit
    "streaming_cms_check",    # CMS operator streamed == batch == oracle
    "hill_value_tail",        # Hill heavy-tail index (top-k order stats)
    "clustering_parts",       # local clustering coefficient (LCC)
    "lang_fertility",         # tokenizer fertility per language
    "value_dispersion",       # variance-to-mean burstiness per type
    "mcnemar_langid",         # McNemar paired-classifier test
    "eb_user_value",          # empirical-Bayes shrunk per-user means
    "streaming_distinct_check",  # HLL windowed distinct: stream == batch
    "nation_modularity",      # Newman modularity of a metadata partition
    "parts_assortativity",    # degree assortativity (join-skew structure)
    "event_transition_entropy",  # H(next|prev) sequence predictability
    "spearman_value_hour",    # Spearman rank correlation (grid midranks)
    "ips_event_value",        # IPS off-policy value of uniform exploration
    "qte_value",              # quantile treatment effects per p
    "paired_t_value",         # within-user paired t across the launch
    #
    # STAGED DEBT (3) — below the r07 cutoff, never driver-gated:
    "dsir_topk",
    "rfm_segments",
    "event_transitions",
    # R07 BIRTHS (9) — registered below the r07 cutoff per the
    # debt-clearance policy; each local-oracle green at sf0.001+sf0.01,
    # pytest + plan-audit evidence; gate now:
    "haversine_pairs",
    "url_canonical_dedup",
    "zipf_slope",
    "auc_purchase_value",
    "lang_id_kappa",
    "w1_chars_drift",
    "source_ndcg",
    "did_launch_value",
    "neyman_value_alloc",
    # --- everything below here is driver-gated green (r01-r08) and keeps
    # local-oracle coverage via tools/check.py ---
    # r07 head-50, gated green in CORRECTNESS_r07 (moved to tail per the
    # staged procedure):
    "streaming_ohlc_6h",
    "streaming_percentiles_check",
    "streaming_sessionize_closed",
    "streaming_cusum_check",
    "streaming_dedup_check",
    "streaming_deadband_check",
    "streaming_outer_join_check",
    "streaming_join_check",
    "rsi_14",
    "seasonal_decompose",
    "session_stats",
    "stochastic_14",
    "temperature_mix",
    "value_corr_matrix",
    "value_heatmap",
    "phrase_match",
    "purchase_attribution",
    "prefix_dup_pairs",
    "revenue_gini",
    "funnel_latency",
    "chi2_event_hour",
    "window_funnel",
    "ewma_level",
    "hits_trade",
    "reach_3hop",
    "scd2_intervals",
    "benford_profile",
    "psi_drift",
    "theil_sen_trend",
    "inverted_postings",
    "ppr_trade_recs",
    "incremental_rollup_check",
    "textrank_keywords",
    "order_snapshot_diff",
    "k_anonymity_events",
    "hybrid_rrf_topk",
    "kcore_trade",
    "lpa_communities",
    "supplier_overlap",
    "part_affinity",
    "fuzzy_block_stats",
    "bm25_topk",
    "fuzzy_part_pairs",
    "moments_by_type",
    "mann_kendall_trend",
    "holt_forecast_check",
    "ab_test_ztest",
    "survival_km",
    "pagerank_trade",
    "triangle_parts",
    # r06 head-50, gated green in CORRECTNESS_r06 (moved to tail per the
    # staged procedure):
    "weighted_pick_k",
    "trending_daily",
    "change_contribution",
    "log_templates",
    "column_profile",
    "table_fingerprint",
    "ols_trend",
    "scd2_snapshot",
    "streaming_msprt_check",
    "quantile_normalize_check",
    "info_gain_ranking",
    "js_drift",
    "time_decay_attribution",
    "l_diversity_events",
    "top_paths",
    "spatial_pairs",
    "msprt_monitor",
    "jl_distortion",
    "target_encode_oof",
    "adamic_adar_links",
    "lead_lag_corr",
    "changepoints_value",
    "markov_attribution",
    "esd_anomalies",
    "sax_motifs",
    "bloom_semijoin",
    "audience_overlap",
    "mi_event_hour",
    "vocab_coverage",
    "interval_bucket_stats",
    "streaming_enrich_check",
    "srm_check",
    "golden_user_record",
    "embedding_drift",
    "conformal_value",
    "winsorized_value",
    "mmr_rerank",
    "calibration_events",
    "session_incident_overlap",
    "cuped_adjust",
    "bootstrap_ci_mean",
    "domain_cap_sample",
    "clean_text_roundtrip",
    "approx_top_terms",
    "asof_join_nearest",
    "bollinger_20",
    "bpe_merge_candidates",
    "error_burn_rate",
    "hard_negatives",
    "packing_efficiency",
    # ROUND-4 ROTATION: the 61 queries with no driver CORRECTNESS row in
    # r01-r03 (VERDICT r3 ask #1).  Driver snapshots the FIRST 50.
    "zscore_outliers",
    "tfidf_top_terms",
    "top_ngrams",
    "chunk_documents",
    "redact_pii",
    "label_centroids",
    "deterministic_sample",
    "train_val_test",
    "events_cube",
    "client_query_wide",
    "top_suppliers",
    "promo_revenue_share",
    "cheapest_part_per_brand",
    "customers_per_region",
    "orders_with_returns",
    "part_size_stats",
    "users_purchase_no_error",
    "winnow_fingerprints",
    "winnow_overlap",
    "lsh_bucket_stats",
    "corpus_composition",
    "length_deciles",
    "profit_by_nation_year",
    "important_parts",
    "supplier_breadth",
    "dominant_suppliers",
    "interarrival_stats",
    "cohort_retention",
    "revenue_rollup",
    "prep_funnel",
    "embedding_dim_variance",
    "hourly_seasonality",
    "value_autocorr",
    "merged_quantiles_check",
    "merged_distinct_check",
    "min_cost_supplier",
    "ohlc_6h",
    "twa_6h",
    "minmax_downsample",
    "mad_outliers",
    "ks_drift",
    "bigram_pmi",
    "weighted_sample",
    "rolling_revenue_7d",
    "entropy_per_source",
    "centroid_similarity",
    "pq_recall",
    "key_skew_report",
    "cusum_alerts",
    "asof_join_forward",
]


def _prioritize(d: dict) -> dict:
    head = {k: d[k] for k in _SNAPSHOT_PRIORITY if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _prioritize({
        "weather_chain": q_weather_chain,
        "dedup_by_second": q_dedup_by_second,
        "time_range": q_time_range,
        "rolling_value": q_rolling_value,
        "relative_range": q_relative_range,
        "pivot_event_type": q_pivot_event_type,
        "bitmask_unpack": q_bitmask_unpack,
        "json_flatten": q_json_flatten,
        "unit_conversions": q_unit_conversions,
        "unpivot_long": q_unpivot_long,
        "hwm": q_hwm,
        "client_query": q_client_query,
        "pricing_summary": q_pricing_summary,
        "revenue_by_nation": q_revenue_by_nation,
        "top_unshipped": q_top_unshipped,
        "downsample_1h": q_downsample_1h,
        **_ext.QUERIES,
        **_pq.QUERIES,
        **_bq.QUERIES,
        **_tq.QUERIES,
        **_txq.QUERIES,
        **_plq.QUERIES,
        **_vq.QUERIES,
        **_jq.QUERIES,
        **_aq.QUERIES,
        **_sq.QUERIES,
        **_mmq.QUERIES,
    })


def oracle_sql() -> dict[str, str]:
    return _prioritize({
        "weather_chain": _WEATHER_CHAIN_SQL,
        "dedup_by_second": _DEDUP_SQL,
        "time_range": _TIME_RANGE_SQL,
        "rolling_value": _ROLLING_SQL,
        "relative_range": _RELATIVE_RANGE_SQL,
        "pivot_event_type": _PIVOT_SQL,
        "bitmask_unpack": _BITMASK_SQL,
        "json_flatten": _JSON_SQL,
        "unit_conversions": _UNIT_SQL,
        "unpivot_long": _UNPIVOT_SQL,
        "hwm": _HWM_SQL,
        "client_query": _CLIENT_SQL,
        "pricing_summary": _PRICING_SQL,
        "revenue_by_nation": _REVENUE_SQL,
        "top_unshipped": _TOP_UNSHIPPED_SQL,
        "downsample_1h": _DOWNSAMPLE_SQL,
        **_ext.ORACLES,
        **_pq.ORACLES,
        **_bq.ORACLES,
        **_tq.ORACLES,
        **_txq.ORACLES,
        **_plq.ORACLES,
        **_vq.ORACLES,
        **_jq.ORACLES,
        **_aq.ORACLES,
        **_sq.ORACLES,
        **_mmq.ORACLES,
    })
