"""Oracle-checked queries for the TSDB verb set (derivative / increase /
gap-filled downsampling / distinct-user counts) and remaining join shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.multimodal import attach_media_meta, frame_sample_plan
from cerebro_spark.operators.tsdb import (
    derivative,
    downsample,
    gapfill,
    increase,
    quantile_sketch_rollup,
    quantiles_over_range,
    retention_between,
    rolling_distinct,
    theta_sketch_rollup,
)


def q_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    out = derivative(
        ev, "value", "ts", partition_by=["user_id"], order_extra=["event_id"]
    )
    return out.select("event_id", "user_id", "ts", "value", "derivative")


_DERIVATIVE_SQL = """
SELECT event_id, user_id, ts, value,
  CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 0
       THEN (value - lag(value) OVER w)
            / (CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w)
       ELSE NULL END AS derivative
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_increase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    out = increase(ev, "value", "ts", partition_by=["user_id"])
    return out.select("event_id", "user_id", "ts", "increase")


_INCREASE_SQL = """
SELECT event_id, user_id, ts,
  CASE WHEN lag(value) OVER w IS NULL THEN NULL
       ELSE greatest(value - lag(value) OVER w, 0.0) END AS increase
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts)
"""


_BUCKET = 21600  # 6 h


def q_downsample_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    ds = downsample(
        ev,
        _BUCKET,
        {"value_avg": F.avg("value"), "n": F.count(F.lit(1))},
        "ts",
        keys=["event_type"],
    )
    return gapfill(
        ds, _BUCKET, "bucket_ts", keys=["event_type"], ffill=True
    )


_GAPFILL_SQL = f"""
WITH agg AS (
  SELECT event_type,
    make_timestamp(CAST(floor(epoch(ts) / {_BUCKET}) * {_BUCKET} AS BIGINT) * 1000000) AS bucket_ts,
    avg(value) AS value_avg, count(*) AS n
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT event_type, min(epoch(bucket_ts)) AS lo, max(epoch(bucket_ts)) AS hi
  FROM agg GROUP BY 1
),
axis AS (
  SELECT event_type, make_timestamp(CAST(lo + {_BUCKET} * i AS BIGINT) * 1000000) AS bucket_ts
  FROM span, generate_series(0, 2000) AS g(i)
  WHERE lo + {_BUCKET} * i <= hi
),
dense AS (
  SELECT a.event_type, a.bucket_ts, agg.value_avg, agg.n
  FROM axis a LEFT JOIN agg USING (event_type, bucket_ts)
)
SELECT event_type, bucket_ts,
  last_value(value_avg IGNORE NULLS) OVER w AS value_avg,
  last_value(n IGNORE NULLS) OVER w AS n
FROM dense
WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.count_distinct(F.col("user_id")).alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


_DISTINCT_USERS_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  count(DISTINCT user_id) AS n_users, count(*) AS n_events
FROM events GROUP BY 1
"""


def q_approx_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct counts, hard-gated via a tolerance encoding: the
    sketch value itself can't be hash-compared across engines, so the query
    emits the EXACT count (oracle-checkable) plus a boolean asserting the
    HLL estimate landed within 3·rsd of it.  A broken sketch (or a broken
    bound) flips the boolean and fails the driver hash."""
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("__approx"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )
    return agg.select(
        "day",
        "n_users",
        (
            F.abs(F.col("__approx") - F.col("n_users"))
            <= 3 * 0.02 * F.col("n_users")
        ).alias("within_3rsd"),
    )


_APPROX_USERS_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  count(DISTINCT user_id) AS n_users, TRUE AS within_3rsd
FROM events GROUP BY 1
"""


def q_orders_no_big_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join shape: orders with no high-quantity lineitem."""
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir).filter(F.col("l_quantity") > 45)
    return orders.join(
        li, orders.o_orderkey == li.l_orderkey, "left_anti"
    ).select("o_orderkey", "o_totalprice")


_ANTI_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    vids = attach_media_meta(docs, media_type="video", fmt="fake")
    return frame_sample_plan(vids, every_ms=500).select("doc_id", "frame_ts_ms")


_FRAME_SAMPLE_SQL = """
SELECT doc_id, 500 * i AS frame_ts_ms
FROM (SELECT doc_id, length(text) * 10 AS duration_ms FROM documents),
     generate_series(0, 100) AS g(i)
WHERE i <= greatest(CAST(floor(duration_ms / 500.0) AS INTEGER) - 1, 0)
"""


def q_percentiles_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per day (p50/p95) + approx twin is the
    HLL-style sketch path (not oracled, see approx_users_daily)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )


def q_approx_percentiles_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based percentiles per day (``percentile_approx`` — Greenwald-
    Khanna summaries, mergeable across partitions, bounded memory — the
    100 TB path where exact ``percentile`` must hold all values per group).
    Hard-gated via a tolerance encoding (see ``approx_users_daily``): the
    query emits the exact per-day row count plus booleans asserting each
    sketch value lies inside exact rank bands — p45–p55 for the median,
    p88–max for p95 (upper band open to max: at small per-group n the
    sketch returns an observed sample whose rank can sit above an
    interpolated p97).  tests/test_tsdb_edges.py recomputes the bands
    independently."""
    ev = load_table(spark, "events", sf_dir)
    agg = ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day")).agg(
        F.percentile_approx("value", 0.5, 1000).alias("__p50a"),
        F.percentile_approx("value", 0.95, 1000).alias("__p95a"),
        F.expr(
            "percentile(value, array(0.45D, 0.55D, 0.88D, 1.0D))"
        ).alias("__bands"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "day",
        "n",
        F.col("__p50a").between(
            F.col("__bands")[0], F.col("__bands")[1]
        ).alias("p50_in_band"),
        F.col("__p95a").between(
            F.col("__bands")[2], F.col("__bands")[3]
        ).alias("p95_in_band"),
    )


_APPROX_PCTL_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n,
  TRUE AS p50_in_band, TRUE AS p95_in_band
FROM events GROUP BY 1
"""


_PERCENTILES_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  quantile_cont(value, 0.5) AS p50,
  quantile_cont(value, 0.95) AS p95
FROM events GROUP BY 1
"""


def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of value per event_type (width 50 over [0,500))."""
    ev = load_table(spark, "events", sf_dir)
    bucket = F.floor(F.col("value") / 50).cast("int")
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


_HISTOGRAM_SQL = """
SELECT event_type, CAST(floor(value / 50) AS INTEGER) AS bucket, count(*) AS n
FROM events GROUP BY 1, 2
"""


def q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 2) — windowed standardization."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type")
    z = (F.col("value") - F.avg("value").over(w)) / F.stddev_samp("value").over(w)
    # z rounded to 6 dp both sides: avg/stddev summation-order noise in the
    # low bits would break the driver's near-exact hash.
    return (
        ev.withColumn("z", z)
        .filter(F.abs(F.col("z")) > 2)
        .select("event_id", "event_type", "value", F.round("z", 6).alias("z"))
    )


_ZSCORE_SQL = """
SELECT event_id, event_type, value, round(z, 6) AS z FROM (
  SELECT event_id, event_type, value,
    (value - avg(value) OVER (PARTITION BY event_type))
      / stddev_samp(value) OVER (PARTITION BY event_type) AS z
  FROM events
) WHERE abs(z) > 2
"""


def q_client_agg_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1-Q6 + aggregateWindow: the client-side Flux downsampling analog."""
    from cerebro_spark.operators.pivot import unpivot_to_points
    from cerebro_spark.plans.client import CerebroClient

    ev = load_table(spark, "events", sf_dir)
    points = unpivot_to_points(
        ev, measurement="events", time_col="ts", value_cols=["value"],
        bucket="telemetry",
    )
    client = CerebroClient(spark, {"telemetry": points})
    return client.query(
        "telemetry", "events", field="value",
        start="2024-01-01 00:00:00", end="2024-02-01 00:00:00",
        aggregate_window=(3600, "avg"),
    )


_CLIENT_AGG_SQL = """
SELECT make_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) * 1000000) AS time,
       avg(value) AS value
FROM events
WHERE ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-02-01 00:00:00'
GROUP BY 1
"""


def q_client_query_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 multi-field pivot: no field filter → one column per field."""
    from cerebro_spark.operators.pivot import unpivot_to_points
    from cerebro_spark.plans.client import CerebroClient

    ev = load_table(spark, "events", sf_dir)
    points = unpivot_to_points(
        ev, measurement="events", time_col="ts",
        value_cols=["value", "user_id"], bucket="telemetry",
    )
    client = CerebroClient(spark, {"telemetry": points})
    return client.query(
        "telemetry", "events",
        start="2024-01-10 00:00:00", end="2024-01-12 00:00:00",
    )


_CLIENT_WIDE_SQL = """
SELECT ts AS time, value, CAST(user_id AS DOUBLE) AS user_id FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts < TIMESTAMP '2024-01-12 00:00:00'
"""


def q_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week retention/churn from per-day theta sketches — the set
    algebra (|A∩B|, |A∖B|, |B∖A|) runs over the ROLLUP, never a raw-table
    self-join.  Theta sketches are EXACT below their sampling threshold
    (~4k distinct at the default lgK); the user population here is far
    under it, so the oracle can be exact set arithmetic.  At real scale
    the same query returns estimates with ~1.6% rse — the plan shape is
    identical."""
    import datetime as dt

    ev = load_table(spark, "events", sf_dir)
    daily = theta_sketch_rollup(ev, "user_id")
    out = retention_between(
        daily,
        (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)),
        (dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 15)),
    )
    return out.select(
        *[F.round(F.col(c)).cast("long").alias(c) for c in out.columns]
    )


_USER_RETENTION_SQL = """
WITH a AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-08'
),
b AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
)
SELECT
  (SELECT count(*) FROM a) AS a_distinct,
  (SELECT count(*) FROM b) AS b_distinct,
  (SELECT count(*) FROM a WHERE user_id IN (SELECT user_id FROM b)) AS retained,
  (SELECT count(*) FROM a WHERE user_id NOT IN (SELECT user_id FROM b)) AS churned,
  (SELECT count(*) FROM b WHERE user_id NOT IN (SELECT user_id FROM a)) AS new
"""



def q_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry gap detection: per event_type, intervals where no event
    arrived for more than one hour (lag window per type — the uptime/
    connectivity report every telemetry operator asks of this data;
    reference sources only LOG disconnects, they can't query them)."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # µs-exact gap, floored to whole seconds AFTER the subtraction — a
    # per-timestamp seconds cast floors each side first and disagrees with
    # the oracle by 1s when the fractional parts straddle a boundary
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev)
    return (
        ev.select(
            "event_type", "ts", prev.alias("prev_ts"), gap_us.alias("gap_us")
        )
        .filter(F.col("gap_us") > 3600 * 1_000_000)
        .select(
            "event_type",
            F.col("prev_ts").alias("gap_start"),
            F.col("ts").alias("gap_end"),
            F.expr("gap_us div 1000000").alias("gap_seconds"),
        )
    )


_GAP_REPORT_SQL = """
SELECT event_type, prev_ts AS gap_start, ts AS gap_end,
       (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 AS gap_seconds
FROM (
  SELECT event_type, ts,
    lag(ts) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev_ts
  FROM events
)
WHERE epoch_us(ts) - epoch_us(prev_ts) > CAST(3600000000 AS BIGINT)
"""


def q_volume_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly monitor: daily event counts per type vs the
    trailing 7-day mean/stddev (excluding today); |z| ≥ 2 flags a drifted
    day.  The window runs over DAILY AGGREGATES (≈ types × days rows), so
    the unbounded-preceding frame is calendar-bounded, not data-bounded."""
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    # flat trailing window (sd = 0 or a single row) ⇒ no defined z — the
    # NULL drops at the filter on both engines (nullif in the oracle)
    z = F.when(sd > 0, (F.col("n") - mu) / sd)
    return (
        daily.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(mu, 4).alias("trailing_mean"),
            F.round(z, 4).alias("z"),
        )
        .filter(F.abs(F.col("z")) >= 2.0)
    )


_VOLUME_DRIFT_SQL = """
WITH daily AS (
  SELECT event_type, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, day, n,
    round(avg(n) OVER w, 4) AS trailing_mean,
    round((n - avg(n) OVER w) / nullif(stddev_samp(n) OVER w, 0), 4) AS z
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT * FROM scored WHERE abs(z) >= 2.0
"""



def q_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BINARY-payload dedup groups (media dedup step 0, before any
    perceptual hashing): md5 over raw bytes, hash-groupBy — the digest is
    computed on the binary column itself, proving the engine's opaque-blob
    path end to end (synthesized payloads: utf-8 doc bytes)."""
    docs = load_table(spark, "documents", sf_dir)
    payloads = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return (
        payloads.groupBy(F.md5("payload").alias("digest"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_id"),
            F.min(F.octet_length("payload")).alias("payload_bytes"),
        )
        .filter(F.col("n_copies") > 1)
    )


_PAYLOAD_DEDUP_SQL = """
SELECT md5(text) AS digest,
       count(*) AS n_copies,
       min(doc_id) AS canonical_id,
       min(octet_length(encode(text))) AS payload_bytes
FROM documents
GROUP BY 1 HAVING count(*) > 1
"""



def q_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (the WAU curve) from per-day
    theta sketches — union 7 sketches per day instead of re-scanning
    events; exact below the sketch sampling threshold, so the oracle is an
    exact windowed COUNT(DISTINCT)."""
    ev = load_table(spark, "events", sf_dir)
    daily = theta_sketch_rollup(ev, "user_id")
    return rolling_distinct(daily, window_buckets=7)


_ROLLING_ACTIVE_SQL = """
WITH days AS (
  SELECT DISTINCT date_trunc('day', ts) AS window_end FROM events
)
SELECT d.window_end,
  (SELECT count(DISTINCT e.user_id) FROM events e
   WHERE e.ts >= d.window_end - INTERVAL 6 DAY
     AND e.ts < d.window_end + INTERVAL 1 DAY) AS distinct_keys,
  (SELECT count(DISTINCT date_trunc('day', e.ts)) FROM events e
   WHERE e.ts >= d.window_end - INTERVAL 6 DAY
     AND e.ts < d.window_end + INTERVAL 1 DAY) AS buckets_in_window
FROM days d
"""



def q_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per day, active users split into first-ever-seen
    vs returning.  First-seen is a per-user MIN aggregate joined back to
    the per-(day,user) activity set — two shuffles on user_id, no window
    over the fact table and no cumulative self-join."""
    ev = load_table(spark, "events", sf_dir)
    day_user = (
        ev.select(
            F.date_trunc("day", "ts").alias("day"), "user_id"
        ).distinct()
    )
    first_seen = day_user.groupBy("user_id").agg(
        F.min("day").alias("first_day")
    )
    return (
        day_user.join(first_seen, "user_id")
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum((F.col("day") == F.col("first_day")).cast("long")).alias(
                "n_new"
            ),
        )
        .select(
            "day",
            "n_active",
            "n_new",
            (F.col("n_active") - F.col("n_new")).alias("n_returning"),
        )
    )


_NEW_VS_RETURNING_SQL = """
WITH day_user AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
),
first_seen AS (
  SELECT user_id, min(day) AS first_day FROM day_user GROUP BY 1
)
SELECT day,
  count(*) AS n_active,
  CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
  CAST(count(*) - sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
    AS n_returning
FROM day_user JOIN first_seen USING (user_id)
GROUP BY day
"""


def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival-time profile: lag window PARTITIONED BY
    user (thousands of small independent partitions — scales), then exact
    percentiles of the per-user gaps per event type.  The telemetry-health
    twin of ``gap_report`` at user granularity."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap = (F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w))
    return (
        ev.select("user_id", "event_type", gap.alias("__gap"))
        .filter(F.col("__gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.expr("percentile(__gap, 0.5)"), 4).alias("p50_gap_s"),
            F.round(F.expr("percentile(__gap, 0.95)"), 4).alias("p95_gap_s"),
            F.max("__gap").alias("max_gap_s"),
        )
    )


_INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
    CAST(floor(epoch(ts)) AS BIGINT)
      - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
          PARTITION BY user_id, event_type ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT event_type, count(*) AS n_gaps,
  round(quantile_cont(gap, 0.5), 4) AS p50_gap_s,
  round(quantile_cont(gap, 0.95), 4) AS p95_gap_s,
  max(gap) AS max_gap_s
FROM gaps WHERE gap IS NOT NULL
GROUP BY 1
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week, the
    fraction still active k weeks later.  Per-user MIN aggregate joined
    back onto distinct (user, week) activity — no fact-table window, no
    cumulative self-join; both sides of the join are user-grain (already
    far smaller than the fact table)."""
    ev = load_table(spark, "events", sf_dir)
    week = F.floor(
        (F.col("ts").cast("long") - F.lit(1704067200)) / (7 * 86400)
    ).cast("int")
    active = ev.select("user_id", week.alias("week")).distinct()
    first = active.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        active.join(first, "user_id")
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


_COHORT_RETENTION_SQL = """
WITH active AS (
  SELECT DISTINCT user_id,
    CAST(floor((epoch(ts) - 1704067200) / 604800) AS INT) AS week
  FROM events
),
first AS (SELECT user_id, min(week) AS cohort_week FROM active GROUP BY 1)
SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_active
FROM active JOIN first USING (user_id)
GROUP BY 1, 2
"""


def q_merged_quantiles_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard gate for the KLL sketch MERGE path (the per-day sketch path is
    pytest-covered; this gates merging): p50/p95 over Jan 8-22 computed by
    merging 14 daily sketches must land in exact p45-p55 / p88-max rank
    bands over the same range (tolerance encoding, see
    ``approx_percentiles_daily``).  The oracle predicts the exact range
    row-count and all-true bands."""
    import datetime as dt

    ev = load_table(spark, "events", sf_dir)
    daily = quantile_sketch_rollup(ev, "value")
    start, end = dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 22)
    merged = quantiles_over_range(
        daily, probabilities=(0.5, 0.95), start=start, end=end
    )
    in_range = ev.filter((F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end)))
    bands = in_range.agg(
        F.expr("percentile(value, array(0.45D, 0.55D, 0.88D, 1.0D))").alias(
            "__b"
        ),
        F.count(F.lit(1)).alias("__n"),
    )
    return merged.crossJoin(F.broadcast(bands)).select(
        F.col("n_rows"),
        (F.col("__n") == F.col("n_rows")).alias("count_consistent"),
        F.col("p50").between(F.col("__b")[0], F.col("__b")[1]).alias(
            "p50_in_band"
        ),
        F.col("p95").between(F.col("__b")[2], F.col("__b")[3]).alias(
            "p95_in_band"
        ),
    )


_MERGED_QUANTILES_SQL = """
SELECT count(*) AS n_rows, TRUE AS count_consistent,
  TRUE AS p50_in_band, TRUE AS p95_in_band
FROM events
WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'
"""


def q_merged_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard gate for the HLL sketch UNION path (twin of
    ``merged_quantiles_check``): distinct users over Jan 8-22 from 14
    merged daily sketches must land within 3·rsd (rsd = 1.04/√2^lg_k,
    ~0.81% at lg_k=14) of the exact distinct count, which the oracle
    verifies exactly."""
    import datetime as dt

    from cerebro_spark.operators.tsdb import (
        distinct_over_range,
        distinct_sketch_rollup,
    )

    ev = load_table(spark, "events", sf_dir)
    start, end = dt.datetime(2024, 1, 8), dt.datetime(2024, 1, 22)
    lg_k = 14
    rsd = 1.04 / (2 ** (lg_k / 2))  # standard HLL error for this lg_k
    est = distinct_over_range(
        distinct_sketch_rollup(ev, "user_id", lg_k=lg_k), start=start, end=end
    )
    exact = ev.filter(
        (F.col("ts") >= F.lit(start)) & (F.col("ts") < F.lit(end))
    ).agg(F.count_distinct("user_id").alias("n_users"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_users",
        "n_rows",
        (
            F.abs(F.col("approx_distinct") - F.col("n_users"))
            <= 3 * rsd * F.col("n_users")
        ).alias("within_3rsd"),
    )


_MERGED_DISTINCT_SQL = """
SELECT count(DISTINCT user_id) AS n_users, count(*) AS n_rows,
  TRUE AS within_3rsd
FROM events
WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-22'
"""


def q_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal profile: avg/count of value by (event_type, hour-of-day) —
    the Grafana-style daily-shape panel; one partial-agg shuffle.

    Average via e2 fixed-point sums (value is exact at 2 decimals), NO
    rounding: round(avg(double)) hit .00005 boundaries where the engines'
    summation orders (and then their round() implementations — Spark
    BigDecimal HALF_UP vs DuckDB double multiply-round) disagreed.  With an
    order-independent BIGINT sum, the division chain s/100.0/n is the same
    IEEE operations on both engines → bit-identical doubles, nothing to
    round.
    """
    ev = load_table(spark, "events", sf_dir)
    v_e2 = F.round(F.col("value") * 100).cast("long")
    return (
        ev.groupBy("event_type", F.hour("ts").alias("hod"))
        .agg(
            F.sum(v_e2).alias("__s"), F.count(F.lit(1)).alias("n")
        )
        .select(
            "event_type",
            "hod",
            (F.col("__s").cast("double") / 100.0 / F.col("n")).alias(
                "value_avg"
            ),
            "n",
        )
    )


_HOURLY_SEASONALITY_SQL = """
SELECT event_type, hod,
  CAST(s AS DOUBLE) / 100.0 / n AS value_avg, n
FROM (
  SELECT event_type, CAST(hour(ts) AS INT) AS hod,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
    count(*) AS n
  FROM events GROUP BY 1, 2
)
"""


def q_value_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of value per event_type: lag window partitioned
    by type (5 independent partitions at any scale — the per-series layout),
    then Pearson corr as one aggregate.  The trend-vs-noise diagnostic for a
    telemetry series."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_type", "value", F.lag("value").over(w).alias("__prev")
    ).filter(F.col("__prev").isNotNull())
    return lagged.groupBy("event_type").agg(
        F.round(F.corr("value", "__prev"), 6).alias("autocorr_lag1"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


_VALUE_AUTOCORR_SQL = """
WITH lagged AS (
  SELECT event_type, value,
    lag(value) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT event_type, round(corr(value, prev), 6) AS autocorr_lag1,
  count(*) AS n_pairs
FROM lagged WHERE prev IS NOT NULL
GROUP BY 1
"""


QUERIES = {
    "derivative": q_derivative,
    "counter_increase": q_increase,
    "downsample_gapfill": q_downsample_gapfill,
    "distinct_users_daily": q_distinct_users_daily,
    "approx_users_daily": q_approx_users_daily,
    "approx_percentiles_daily": q_approx_percentiles_daily,
    "orders_no_big_items": q_orders_no_big_items,
    "frame_sample": q_frame_sample,
    "client_agg_window": q_client_agg_window,
    "client_query_wide": q_client_query_wide,
    "percentiles_daily": q_percentiles_daily,
    "value_histogram": q_value_histogram,
    "zscore_outliers": q_zscore_outliers,
    "user_retention": q_user_retention,
    "gap_report": q_gap_report,
    "volume_drift": q_volume_drift,
    "payload_dedup": q_payload_dedup,
    "rolling_active_users": q_rolling_active_users,
    "new_vs_returning": q_new_vs_returning,
    "interarrival_stats": q_interarrival_stats,
    "merged_quantiles_check": q_merged_quantiles_check,
    "merged_distinct_check": q_merged_distinct_check,
    "hourly_seasonality": q_hourly_seasonality,
    "value_autocorr": q_value_autocorr,
    "cohort_retention": q_cohort_retention,
}

ORACLES = {
    "derivative": _DERIVATIVE_SQL,
    "counter_increase": _INCREASE_SQL,
    "downsample_gapfill": _GAPFILL_SQL,
    "distinct_users_daily": _DISTINCT_USERS_SQL,
    "approx_users_daily": _APPROX_USERS_SQL,
    "approx_percentiles_daily": _APPROX_PCTL_SQL,
    "orders_no_big_items": _ANTI_SQL,
    "frame_sample": _FRAME_SAMPLE_SQL,
    "client_agg_window": _CLIENT_AGG_SQL,
    "client_query_wide": _CLIENT_WIDE_SQL,
    "percentiles_daily": _PERCENTILES_SQL,
    "value_histogram": _HISTOGRAM_SQL,
    "zscore_outliers": _ZSCORE_SQL,
    "user_retention": _USER_RETENTION_SQL,
    "gap_report": _GAP_REPORT_SQL,
    "volume_drift": _VOLUME_DRIFT_SQL,
    "payload_dedup": _PAYLOAD_DEDUP_SQL,
    "rolling_active_users": _ROLLING_ACTIVE_SQL,
    "new_vs_returning": _NEW_VS_RETURNING_SQL,
    "interarrival_stats": _INTERARRIVAL_SQL,
    "merged_quantiles_check": _MERGED_QUANTILES_SQL,
    "merged_distinct_check": _MERGED_DISTINCT_SQL,
    "hourly_seasonality": _HOURLY_SEASONALITY_SQL,
    "value_autocorr": _VALUE_AUTOCORR_SQL,
    "cohort_retention": _COHORT_RETENTION_SQL,
}


def q_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fill(linear): null out ~1/7 of values deterministically, interpolate
    per event_type series."""
    from cerebro_spark.operators.tsdb import interpolate_linear

    ev = load_table(spark, "events", sf_dir).select(
        "event_id",
        "event_type",
        "ts",
        F.when(F.col("event_id") % 7 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    out = interpolate_linear(ev, "v", "ts", partition_by=["event_type"])
    return out.select("event_id", "event_type", "ts", "v", "v_interp")


_INTERPOLATE_SQL = """
WITH base AS (
  SELECT event_id, event_type, ts,
    CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS v,
    epoch(ts) AS sec
  FROM events
),
ctx AS (
  SELECT event_id, event_type, ts, v, sec,
    last_value(v IGNORE NULLS) OVER wb AS prev_v,
    last_value(CASE WHEN v IS NOT NULL THEN sec END IGNORE NULLS) OVER wb AS prev_t,
    first_value(v IGNORE NULLS) OVER wf AS next_v,
    first_value(CASE WHEN v IS NOT NULL THEN sec END IGNORE NULLS) OVER wf AS next_t
  FROM base
  WINDOW
    wb AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wf AS (PARTITION BY event_type ORDER BY ts ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, event_type, ts, v,
  CASE WHEN v IS NOT NULL THEN v
       WHEN prev_v IS NOT NULL AND next_v IS NOT NULL AND next_t > prev_t
       THEN prev_v + (next_v - prev_v) * (sec - prev_t) / (next_t - prev_t)
       ELSE NULL END AS v_interp
FROM ctx
"""

QUERIES["interpolate_linear"] = q_interpolate
ORACLES["interpolate_linear"] = _INTERPOLATE_SQL


# ---------------------------------------------------------------------------
# round-5 TSDB verbs: OHLC, time-weighted average, min/max downsample,
# MAD outliers, KS drift
# ---------------------------------------------------------------------------

def q_ohlc_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick downsample (reference delegates this to Flux
    first()/last()/min()/max(); cerebro/client.py:57-91 builds the range —
    here it's one native groupBy)."""
    from cerebro_spark.operators.tsdb import ohlc

    ev = load_table(spark, "events", sf_dir)
    return ohlc(
        ev, _BUCKET, "value", "ts", keys=["event_type"], tiebreak=["event_id"]
    )


_OHLC_SQL = f"""
SELECT
  make_timestamp(CAST(floor(epoch(ts) / {_BUCKET}) * {_BUCKET} AS BIGINT) * 1000000) AS bucket_ts,
  event_type,
  (min(struct_pack(t := ts, id := event_id, v := value))).v AS open,
  max(value) AS high,
  min(value) AS low,
  (max(struct_pack(t := ts, id := event_id, v := value))).v AS close,
  count(*) AS n
FROM events
GROUP BY 1, 2
"""


def q_twa_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cerebro_spark.operators.tsdb import time_weighted_avg

    ev = load_table(spark, "events", sf_dir)
    out = time_weighted_avg(
        ev, _BUCKET, "value", "ts", keys=["event_type"], tiebreak=["event_id"]
    )
    return out.select(
        "bucket_ts", "event_type", F.round("twa", 4).alias("twa"), "n"
    )


_TWA_SQL = f"""
WITH h AS (
  SELECT event_type,
    floor(epoch(ts) / {_BUCKET}) * {_BUCKET} AS bkt,
    value AS v,
    lead(epoch(ts)) OVER (
      PARTITION BY event_type, floor(epoch(ts) / {_BUCKET}) * {_BUCKET}
      ORDER BY epoch(ts), event_id
    ) - epoch(ts) AS hold
  FROM events
)
SELECT make_timestamp(CAST(bkt AS BIGINT) * 1000000) AS bucket_ts, event_type,
  round(CASE WHEN sum(hold) > 0 THEN sum(v * hold) / sum(hold)
             ELSE avg(v) END, 4) AS twa,
  count(*) AS n
FROM h GROUP BY bkt, event_type
"""


def q_minmax_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cerebro_spark.operators.tsdb import minmax_downsample

    ev = load_table(spark, "events", sf_dir)
    return minmax_downsample(
        ev, _BUCKET, "value", "ts", keys=["event_type"], tiebreak=["event_id"]
    )


_MINMAX_SQL = f"""
WITH g AS (
  SELECT event_type,
    make_timestamp(CAST(floor(epoch(ts) / {_BUCKET}) * {_BUCKET} AS BIGINT) * 1000000) AS bucket_ts,
    min(struct_pack(v := value, t := ts, id := event_id)) AS lo,
    max(struct_pack(v := value, t := ts, id := event_id)) AS hi
  FROM events GROUP BY 1, 2
)
SELECT bucket_ts, event_type, 'min' AS kind, lo.t AS ts, lo.v AS value FROM g
UNION ALL
SELECT bucket_ts, event_type, 'max' AS kind, hi.t AS ts, hi.v AS value FROM g
"""


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cerebro_spark.operators.tsdb import mad_outliers

    ev = load_table(spark, "events", sf_dir)
    out = mad_outliers(ev, "value", keys=["event_type"], k=3.0)
    return out.select(
        "event_id",
        "event_type",
        "value",
        F.round("med", 6).alias("med"),
        F.round("mad", 6).alias("mad"),
        "is_outlier",
    )


_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med FROM events GROUP BY 1
),
resid AS (
  SELECT e.event_id, e.event_type, e.value, m.med,
         abs(e.value - m.med) AS r
  FROM events e JOIN med m USING (event_type)
),
mad AS (
  SELECT event_type, quantile_cont(r, 0.5) AS mad FROM resid GROUP BY 1
)
SELECT r.event_id, r.event_type, r.value,
  round(r.med, 6) AS med, round(d.mad, 6) AS mad,
  r.r > 3.0 * 1.4826 * d.mad AS is_outlier
FROM resid r JOIN mad d USING (event_type)
"""


def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cerebro_spark.operators.tsdb import ks_drift

    ev = load_table(spark, "events", sf_dir)
    return ks_drift(ev, "value", "ts", keys=["event_type"], bins=64)


_KS_SQL = """
WITH vspan AS (
  SELECT min(value) AS vmin, max(value) AS vmax FROM events
),
tspan AS (
  SELECT event_type, min(epoch(ts)) AS tmin, max(epoch(ts)) AS tmax
  FROM events GROUP BY 1
),
binned AS (
  SELECT e.event_type,
    CAST(least(floor((e.value - s.vmin) / (s.vmax - s.vmin) * 64), 63) AS BIGINT) AS bin,
    epoch(e.ts) <= (k.tmin + k.tmax) / 2 AS early
  FROM events e
  JOIN tspan k USING (event_type)
  CROSS JOIN vspan s
),
counts AS (
  SELECT event_type, bin,
    CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS ne,
    CAST(sum(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS nl
  FROM binned GROUP BY 1, 2
),
cdf AS (
  SELECT event_type, ne, nl,
    CAST(sum(ne) OVER wc AS DOUBLE) / sum(ne) OVER wt AS ce,
    CAST(sum(nl) OVER wc AS DOUBLE) / sum(nl) OVER wt AS cl
  FROM counts
  WINDOW
    wc AS (PARTITION BY event_type ORDER BY bin
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    wt AS (PARTITION BY event_type)
)
SELECT event_type, round(max(abs(ce - cl)), 6) AS ks,
  CAST(sum(ne) AS BIGINT) AS n_early, CAST(sum(nl) AS BIGINT) AS n_late
FROM cdf GROUP BY event_type
"""


QUERIES["ohlc_6h"] = q_ohlc_6h
ORACLES["ohlc_6h"] = _OHLC_SQL
QUERIES["twa_6h"] = q_twa_6h
ORACLES["twa_6h"] = _TWA_SQL
QUERIES["minmax_downsample"] = q_minmax_downsample
ORACLES["minmax_downsample"] = _MINMAX_SQL
QUERIES["mad_outliers"] = q_mad_outliers
ORACLES["mad_outliers"] = _MAD_SQL
QUERIES["ks_drift"] = q_ks_drift
ORACLES["ks_drift"] = _KS_SQL


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops diagnostics: heavy-hitter report for the events user_id key
    (the pre-join skew check — decides salting / AQE skew handling)."""
    from cerebro_spark.operators.profile import key_skew_report

    ev = load_table(spark, "events", sf_dir)
    return key_skew_report(ev, "user_id", top=10)


_KEY_SKEW_SQL = """
WITH counts AS (
  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS cnt
  FROM events GROUP BY 1
),
stats AS (
  SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS total_rows,
         quantile_cont(cnt, 0.5) AS p50
  FROM counts
),
top AS (
  SELECT key, cnt,
    CAST(row_number() OVER (ORDER BY cnt DESC, key ASC) AS INT) AS rank
  FROM counts ORDER BY cnt DESC, key ASC LIMIT 10
)
SELECT rank, key, cnt,
  round(CAST(cnt AS DOUBLE) / total_rows, 6) AS share,
  round(CAST(cnt AS DOUBLE) / p50, 2) AS x_median,
  n_keys, total_rows
FROM top, stats
"""

QUERIES["key_skew_report"] = q_key_skew_report
ORACLES["key_skew_report"] = _KEY_SKEW_SQL


def q_cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift alarm per event_type (closed-form two-window plan — see
    operators.tsdb.cusum)."""
    from cerebro_spark.operators.tsdb import cusum

    ev = load_table(spark, "events", sf_dir)
    out = cusum(
        ev, "value", "ts", keys=["event_type"], tiebreak=["event_id"]
    )
    return out.select(
        "event_id",
        "event_type",
        "ts",
        "cusum",
        "is_alert",
        F.round("mu", 6).alias("mu"),
        F.round("sigma", 6).alias("sigma"),
    )


_CUSUM_SQL = """
WITH stats AS (
  SELECT event_type,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s1,
    CAST(sum(CAST(round(value * 100) AS BIGINT) * CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s2,
    count(*) AS n
  FROM events GROUP BY 1
),
base AS (
  SELECT event_type,
    CAST(s1 AS DOUBLE) / 100.0 / n AS mu,
    sqrt(greatest(CAST(s2 AS DOUBLE) / 10000.0 / n
         - (CAST(s1 AS DOUBLE) / 100.0 / n) * (CAST(s1 AS DOUBLE) / 100.0 / n),
         0.0)) AS sigma
  FROM stats
),
p AS (
  SELECT e.event_id, e.event_type, e.ts, b.mu, b.sigma,
    sum(e.value - b.mu - 0.5 * b.sigma) OVER (
      PARTITION BY e.event_type ORDER BY e.ts, e.event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    ) AS pref
  FROM events e JOIN base b USING (event_type)
),
s AS (
  SELECT event_id, event_type, ts, mu, sigma,
    pref - least(0.0, min(pref) OVER (
      PARTITION BY event_type ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )) AS cu
  FROM p
)
SELECT event_id, event_type, ts, round(cu, 6) AS cusum,
  cu > 4.0 * sigma AS is_alert,
  round(mu, 6) AS mu, round(sigma, 6) AS sigma
FROM s
"""

QUERIES["cusum_alerts"] = q_cusum_alerts
ORACLES["cusum_alerts"] = _CUSUM_SQL


def q_value_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × value-octile heatmap (the Grafana heatmap panel feed):
    octile boundaries come from ONE exact-percentile aggregate broadcast
    onto the scan — same no-global-NTILE discipline as length_deciles;
    state is 24 × 8 cells regardless of row count."""
    ev = load_table(spark, "events", sf_dir)
    # boundaries rounded to e6: the engines' interpolation formulas
    # (l+f·(u−l) vs l·(1−f)+u·f) differ by 1 ulp on equal neighbors, which
    # flips strict-< for data sitting exactly on a boundary; values are
    # e2-grid and boundaries e3-grid, so e6 rounding is noise-free margin
    bounds = ev.agg(
        F.transform(
            F.expr(
                "percentile(value, array(0.125D,0.25D,0.375D,0.5D,0.625D,0.75D,0.875D))"
            ),
            lambda x: F.round(x, 6),
        ).alias("__b")
    )
    with_bin = ev.crossJoin(F.broadcast(bounds)).select(
        F.hour("ts").alias("hod"),
        # octile = count of boundaries strictly below the value (ties go
        # DOWN on both engines via strict <)
        F.size(F.filter(F.col("__b"), lambda b: b < F.col("value"))).alias(
            "octile"
        ),
    )
    return with_bin.groupBy("hod", "octile").agg(
        F.count(F.lit(1)).alias("n")
    )


_VALUE_HEATMAP_SQL = """
WITH bounds AS (
  SELECT list_transform(
           quantile_cont(value, [0.125,0.25,0.375,0.5,0.625,0.75,0.875]),
           x -> round(x, 6)) AS b
  FROM events
)
SELECT CAST(hour(ts) AS INT) AS hod,
  CAST(len(list_filter(b, x -> x < value)) AS INT) AS octile,
  count(*) AS n
FROM events, bounds
GROUP BY 1, 2
"""


def q_error_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE burn-rate alert: per 1 h bucket, the error share of all events
    and the trailing-6-bucket share, alerting when the long window burns
    >2× the corpus baseline (multiwindow burn-rate alerting).  Counts are
    exact integers end-to-end; shares divide BIGINTs in the same order on
    both engines, so no rounding is needed anywhere."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        F.floor(F.col("ts").cast("long") / 3600).alias("__h")
    ).agg(
        F.sum((F.col("event_type") == "error").cast("long")).alias("err"),
        F.count(F.lit(1)).alias("total"),
    )
    w6 = Window.orderBy("__h").rangeBetween(-5, 0)
    # baseline from the same aggregate — 1-row broadcast
    base = hourly.agg(
        (F.sum("err").cast("double") / F.sum("total")).alias("__rate")
    )
    out = hourly.crossJoin(F.broadcast(base)).select(
        F.timestamp_seconds(F.col("__h") * 3600).alias("bucket_ts"),
        "err",
        "total",
        (F.col("err").cast("double") / F.col("total")).alias("share_1h"),
        (
            F.sum("err").over(w6).cast("double") / F.sum("total").over(w6)
        ).alias("share_6h"),
        F.col("__rate").alias("baseline"),
    )
    return out.withColumn(
        "is_burning", F.col("share_6h") > 2.0 * F.col("baseline")
    )


_ERROR_BURN_SQL = """
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
    CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS err,
    count(*) AS total
  FROM events GROUP BY 1
),
base AS (
  SELECT CAST(sum(err) AS DOUBLE) / sum(total) AS rate FROM hourly
)
SELECT make_timestamp(h * 3600 * 1000000) AS bucket_ts, err, total,
  CAST(err AS DOUBLE) / total AS share_1h,
  CAST(sum(err) OVER w AS DOUBLE) / sum(total) OVER w AS share_6h,
  rate AS baseline,
  (CAST(sum(err) OVER w AS DOUBLE) / sum(total) OVER w) > 2.0 * rate AS is_burning
FROM hourly, base
WINDOW w AS (ORDER BY h RANGE BETWEEN 5 PRECEDING AND CURRENT ROW)
"""

QUERIES["value_heatmap"] = q_value_heatmap
ORACLES["value_heatmap"] = _VALUE_HEATMAP_SQL
QUERIES["error_burn_rate"] = q_error_burn_rate
ORACLES["error_burn_rate"] = _ERROR_BURN_SQL


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session statistics via Spark's NATIVE ``session_window``
    (the engine-managed variant of the manual lag/cumsum `sessionize` —
    same 30-min-gap semantics, one groupBy, no window-function pass).
    Durations in exact unix-micros BIGINTs end-to-end: a session's span is
    (window end − gap) − window start, summed as integers, so the per-user
    average is one deterministic division — no double-sum noise, no
    rounding (the hourly_seasonality lesson).  Boundary discipline: an
    event exactly `gap` after the previous one starts a NEW session on
    both engines (session windows are [start, last+gap) half-open; the
    oracle's island rule uses the matching ``>= gap`` split)."""
    gap_us = 1800 * 1_000_000
    ev = load_table(spark, "events", sf_dir)
    sessions = (
        ev.groupBy(
            F.session_window(F.col("ts"), "1800 seconds").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            (
                F.unix_micros(F.col("w.end"))
                - F.lit(gap_us)
                - F.unix_micros(F.col("w.start"))
            ).alias("span_us"),
        )
    )
    return sessions.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.max("n_events").alias("max_session_events"),
        (F.sum("span_us").cast("double") / 1000000.0 / F.count(F.lit(1))).alias(
            "avg_span_s"
        ),
    )


_SESSION_STATS_SQL = """
WITH marked AS (
  SELECT user_id, epoch_us(ts) AS us,
    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w >= 1800000000
         THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
  SELECT user_id, us,
    sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
),
per_session AS (
  SELECT user_id, sid, count(*) AS n_events,
    CAST(max(us) - min(us) AS BIGINT) AS span_us
  FROM sessions GROUP BY 1, 2
)
SELECT user_id,
  count(*) AS n_sessions,
  CAST(sum(n_events) AS BIGINT) AS total_events,
  CAST(max(n_events) AS BIGINT) AS max_session_events,
  CAST(sum(span_us) AS DOUBLE) / 1000000.0 / count(*) AS avg_span_s
FROM per_session GROUP BY user_id
"""

QUERIES["session_stats"] = q_session_stats
ORACLES["session_stats"] = _SESSION_STATS_SQL


def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive decomposition of each event_type series: 24h centered
    moving-average trend + hour-of-day seasonal profile + residual."""
    from cerebro_spark.operators.tsdb import seasonal_decompose

    ev = load_table(spark, "events", sf_dir)
    out = seasonal_decompose(ev, "value", "ts", keys=["event_type"])
    return out.select(
        "event_id", "event_type", "ts", "value", "trend", "seasonal", "residual"
    )


_SEASONAL_SQL = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
    count(*) AS c
  FROM events GROUP BY 1, 2
),
tb AS (
  SELECT event_type, b,
    CAST(sum(s) OVER wb AS DOUBLE) / 100.0 / sum(c) OVER wb AS trend_raw
  FROM hourly
  WINDOW wb AS (PARTITION BY event_type ORDER BY b
                RANGE BETWEEN 12 PRECEDING AND 11 FOLLOWING)
),
t AS (
  SELECT e.event_id, e.event_type, e.ts, e.value, tb.trend_raw,
    CAST(hour(e.ts) AS INT) AS u
  FROM events e
  JOIN tb ON tb.event_type = e.event_type
         AND tb.b = CAST(floor(epoch(e.ts) / 3600) AS BIGINT)
),
prof AS (
  SELECT event_type, u, avg(value - trend_raw) AS seasonal_raw
  FROM t GROUP BY 1, 2
)
SELECT event_id, t.event_type, ts, value,
  trend_raw AS trend,
  round(seasonal_raw, 4) AS seasonal,
  round(value - trend_raw - seasonal_raw, 4) AS residual
FROM t JOIN prof ON t.event_type = prof.event_type AND t.u = prof.u
"""

QUERIES["seasonal_decompose"] = q_seasonal_decompose
ORACLES["seasonal_decompose"] = _SEASONAL_SQL


def q_rsi_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative Strength Index (14-sample, simple-average form) per series —
    the classic momentum oscillator (Flux ``relativeStrengthIndex``).
    Gains/losses in exact e2 BIGINTs (value diffs are e2-exact), rolling
    ROWS-frame sums stay integers, so RSI's division chain is
    bit-deterministic — rounding only as presentation (4 dp)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    e2 = F.round(F.col("value") * 100).cast("long")
    diff = e2 - F.lag(e2).over(w)
    d = ev.select(
        "event_id", "event_type", "ts",
        F.when(diff > 0, diff).otherwise(F.lit(0)).alias("__gain"),
        F.when(diff < 0, -diff).otherwise(F.lit(0)).alias("__loss"),
        F.row_number().over(w).alias("__rn"),
    )
    w14 = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-13, 0)
    )
    g = F.sum("__gain").over(w14).cast("double")
    l = F.sum("__loss").over(w14).cast("double")
    rsi = F.when(
        (g + l) > 0, 100.0 * g / (g + l)
    ).otherwise(F.lit(50.0))
    return (
        d.withColumn("rsi", F.round(rsi, 4))
        .filter(F.col("__rn") >= 15)  # full 14-diff window only
        .select("event_id", "event_type", "ts", "rsi")
    )


_RSI_SQL = """
WITH d AS (
  SELECT event_id, event_type, ts,
    CAST(round(value * 100) AS BIGINT)
      - lag(CAST(round(value * 100) AS BIGINT)) OVER w AS diff,
    row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
),
gl AS (
  SELECT event_id, event_type, ts, rn,
    CASE WHEN diff > 0 THEN diff ELSE 0 END AS gain,
    CASE WHEN diff < 0 THEN -diff ELSE 0 END AS loss
  FROM d
),
roll AS (
  SELECT event_id, event_type, ts, rn,
    CAST(sum(gain) OVER w14 AS DOUBLE) AS g,
    CAST(sum(loss) OVER w14 AS DOUBLE) AS l
  FROM gl
  WINDOW w14 AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT event_id, event_type, ts,
  round(CASE WHEN g + l > 0 THEN 100.0 * g / (g + l) ELSE 50.0 END, 4) AS rsi
FROM roll WHERE rn >= 15
"""


def q_value_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-series Pearson correlation matrix: event types pivot to hourly
    bucket averages, pairs correlate over the shared bucket axis — the
    'which metrics move together' panel.  State is buckets × types, pairs
    are types², both bounded; corr carries double-sum noise → round 4."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        F.floor(F.col("ts").cast("long") / 3600).alias("__h"),
        "event_type",
    ).agg(F.avg("value").alias("__v"))
    a = hourly.select(
        "__h", F.col("event_type").alias("type_a"), F.col("__v").alias("va")
    )
    b = hourly.select(
        "__h", F.col("event_type").alias("type_b"), F.col("__v").alias("vb")
    )
    j = a.join(b, "__h").filter(F.col("type_a") < F.col("type_b"))
    return (
        j.groupBy("type_a", "type_b")
        .agg(
            F.round(F.corr("va", "vb"), 4).alias("corr"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    )


_CORR_MATRIX_SQL = """
WITH hourly AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, event_type,
         avg(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
  round(corr(a.v, b.v), 4) AS corr,
  count(*) AS n_buckets
FROM hourly a JOIN hourly b ON a.h = b.h AND a.event_type < b.event_type
GROUP BY 1, 2
"""

QUERIES["rsi_14"] = q_rsi_14
ORACLES["rsi_14"] = _RSI_SQL
QUERIES["value_corr_matrix"] = q_value_corr_matrix
ORACLES["value_corr_matrix"] = _CORR_MATRIX_SQL


def q_bollinger_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (20-sample rolling mean ± 2σ) per series — the
    monitoring-envelope verb.  Rolling Σx and Σx² as e2/e4 BIGINTs over a
    ROWS frame keep every derived double bit-deterministic across engines
    (same discipline as cusum's baseline), so mid/upper/lower ship
    UNROUNDED — exact ratios would land on round() boundaries otherwise."""
    ev = load_table(spark, "events", sf_dir)
    e2 = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    s1 = F.sum(e2).over(w).cast("double")
    s2 = F.sum(e2 * e2).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    mid = s1 / 100.0 / n
    sigma = F.sqrt(F.greatest(s2 / 10000.0 / n - mid * mid, F.lit(0.0)))
    d = ev.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        mid.alias("mid"),
        (mid + 2.0 * sigma).alias("upper"),
        (mid - 2.0 * sigma).alias("lower"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("__rn"),
    )
    return (
        d.filter(F.col("__rn") >= 20)  # full windows only
        .withColumn(
            "breakout",
            (F.col("value") > F.col("upper"))
            | (F.col("value") < F.col("lower")),
        )
        .drop("__rn")
    )


_BOLLINGER_SQL = """
WITH r AS (
  SELECT event_id, event_type, ts, value,
    CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w20 AS DOUBLE) AS s1,
    CAST(sum(CAST(round(value * 100) AS BIGINT)
             * CAST(round(value * 100) AS BIGINT)) OVER w20 AS DOUBLE) AS s2,
    CAST(count(*) OVER w20 AS DOUBLE) AS n,
    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM events
  WINDOW w20 AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
)
SELECT event_id, event_type, ts, value,
  s1 / 100.0 / n AS mid,
  s1 / 100.0 / n + 2.0 * sqrt(greatest(s2 / 10000.0 / n
    - (s1 / 100.0 / n) * (s1 / 100.0 / n), 0.0)) AS upper,
  s1 / 100.0 / n - 2.0 * sqrt(greatest(s2 / 10000.0 / n
    - (s1 / 100.0 / n) * (s1 / 100.0 / n), 0.0)) AS lower,
  (value > s1 / 100.0 / n + 2.0 * sqrt(greatest(s2 / 10000.0 / n
    - (s1 / 100.0 / n) * (s1 / 100.0 / n), 0.0)))
  OR (value < s1 / 100.0 / n - 2.0 * sqrt(greatest(s2 / 10000.0 / n
    - (s1 / 100.0 / n) * (s1 / 100.0 / n), 0.0))) AS breakout
FROM r WHERE rn >= 20
"""

QUERIES["bollinger_20"] = q_bollinger_20
ORACLES["bollinger_20"] = _BOLLINGER_SQL


def q_stochastic_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator %K (position of the current value inside the
    rolling 14-sample min/max channel, a.k.a. Donchian position).  Rolling
    extrema of e2 BIGINTs are exact; the ratio is one deterministic
    division (constant windows → channel width 0 → defined as 50)."""
    ev = load_table(spark, "events", sf_dir)
    e2 = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-13, 0)
    )
    lo = F.min(e2).over(w)
    hi = F.max(e2).over(w)
    k = F.when(
        hi > lo,
        100.0 * (e2 - lo).cast("double") / (hi - lo).cast("double"),
    ).otherwise(F.lit(50.0))
    d = ev.select(
        "event_id",
        "event_type",
        "ts",
        "value",
        (lo.cast("double") / 100.0).alias("channel_low"),
        (hi.cast("double") / 100.0).alias("channel_high"),
        k.alias("pct_k"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("ts", "event_id"))
        .alias("__rn"),
    )
    return d.filter(F.col("__rn") >= 14).drop("__rn")


_STOCHASTIC_SQL = """
WITH r AS (
  SELECT event_id, event_type, ts, value,
    min(CAST(round(value * 100) AS BIGINT)) OVER w14 AS lo,
    max(CAST(round(value * 100) AS BIGINT)) OVER w14 AS hi,
    CAST(round(value * 100) AS BIGINT) AS e2,
    row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) AS rn
  FROM events
  WINDOW w14 AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT event_id, event_type, ts, value,
  CAST(lo AS DOUBLE) / 100.0 AS channel_low,
  CAST(hi AS DOUBLE) / 100.0 AS channel_high,
  CASE WHEN hi > lo
       THEN 100.0 * CAST(e2 - lo AS DOUBLE) / CAST(hi - lo AS DOUBLE)
       ELSE 50.0 END AS pct_k
FROM r WHERE rn >= 14
"""

QUERIES["stochastic_14"] = q_stochastic_14
ORACLES["stochastic_14"] = _STOCHASTIC_SQL


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event_type (tsdb.psi_drift): 10
    equal-width bins over each series' EARLY-half value span, Laplace
    smoothing, per-bin terms quantized to 1e-9 BIGINTs and summed exactly
    (operator docstring) — the mass-movement drift alarm complementing
    ks_drift's CDF-shape alarm."""
    from cerebro_spark.operators.tsdb import psi_drift

    ev = load_table(spark, "events", sf_dir)
    return psi_drift(ev, "value", "ts", keys=["event_type"], bins=10)


_PSI_SQL = """
WITH tspan AS (
  SELECT event_type, min(epoch(ts)) AS tmin, max(epoch(ts)) AS tmax
  FROM events GROUP BY 1
),
d AS (
  SELECT e.event_type, e.value AS v,
    epoch(e.ts) <= (k.tmin + k.tmax) / 2 AS early
  FROM events e JOIN tspan k USING (event_type)
),
vspan AS (
  SELECT event_type, min(v) AS vmin, max(v) AS vmax
  FROM d WHERE early GROUP BY 1
),
binned AS (
  SELECT d.event_type,
    CASE WHEN s.vmax > s.vmin
      THEN greatest(least(CAST(floor((d.v - s.vmin) / (s.vmax - s.vmin) * 10)
                               AS BIGINT), 9), 0)
      ELSE 0 END AS bin,
    d.early
  FROM d JOIN vspan s USING (event_type)
),
counts AS (
  SELECT event_type, bin,
    CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS ne,
    CAST(sum(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS nl
  FROM binned GROUP BY 1, 2
),
grid AS (
  SELECT event_type, CAST(g.b AS BIGINT) AS bin
  FROM tspan, generate_series(0, 9) AS g(b)
),
full_grid AS (
  SELECT grid.event_type, grid.bin,
    coalesce(c.ne, 0) AS ne, coalesce(c.nl, 0) AS nl
  FROM grid LEFT JOIN counts c
    ON grid.event_type = c.event_type AND grid.bin = c.bin
),
scored AS (
  SELECT event_type, ne, nl,
    CAST(floor(
      (CAST(nl + 1 AS DOUBLE) / (sum(nl) OVER w + 10)
       - CAST(ne + 1 AS DOUBLE) / (sum(ne) OVER w + 10))
      * ln((CAST(nl + 1 AS DOUBLE) / (sum(nl) OVER w + 10))
           / (CAST(ne + 1 AS DOUBLE) / (sum(ne) OVER w + 10)))
      * 1e9 + 0.5) AS BIGINT) AS t9
  FROM full_grid
  WINDOW w AS (PARTITION BY event_type)
)
SELECT event_type, sum(t9) / 1e9 AS psi,
  CAST(sum(ne) AS BIGINT) AS n_early, CAST(sum(nl) AS BIGINT) AS n_late
FROM scored GROUP BY event_type
"""

QUERIES["psi_drift"] = q_psi_drift
ORACLES["psi_drift"] = _PSI_SQL


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust daily trend per event_type (tsdb.theil_sen):
    median of all pairwise slopes between daily means — outlier-immune
    where the OLS slope is not.  Daily means are exact 1e-6 fixed-point
    sums; the median picks middle elements by row_number (no
    interpolation), so the slope needs no output rounding (operator
    docstring)."""
    from cerebro_spark.operators.tsdb import theil_sen

    ev = load_table(spark, "events", sf_dir)
    return theil_sen(ev, "value", "ts", keys=["event_type"], bucket_seconds=86400)


_THEIL_SEN_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS b,
    (CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
     / count(*)) / 1e6 AS m
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type, (b.m - a.m) / CAST(b.b - a.b AS DOUBLE) AS s
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.b < b.b
),
ranked AS (
  SELECT event_type, s,
    row_number() OVER (PARTITION BY event_type ORDER BY s) AS rn,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM pairs
)
SELECT event_type, sum(s) / count(*) AS slope_med,
  CAST(max(n) AS BIGINT) AS n_pairs
FROM ranked
WHERE rn = floor((n + 1) / 2) OR rn = floor(n / 2) + 1
GROUP BY event_type
"""

QUERIES["theil_sen_trend"] = q_theil_sen_trend
ORACLES["theil_sen_trend"] = _THEIL_SEN_SQL


def q_ewma_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA smoothed level per event_type over daily-bucket means
    (timeops.ewma, α=0.3): exact fixed-point bucket means folded in time
    order with identical operation order on both engines (the sorted-fold
    rule), so the smoothed double is bit-identical without rounding."""
    from cerebro_spark.operators.timeops import ewma

    ev = load_table(spark, "events", sf_dir)
    return ewma(
        ev, "value", "ts", keys=["event_type"], bucket_seconds=86400, alpha=0.3
    )


_EWMA_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS b,
    (CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
     / count(*)) / 1e6 AS m
  FROM events GROUP BY 1, 2
)
SELECT event_type,
  list_reduce(list(m ORDER BY b), (a, x) -> 0.3 * x + 0.7 * a) AS ewma,
  count(*) AS n_buckets,
  max(b) AS last_bucket
FROM daily GROUP BY event_type
"""

QUERIES["ewma_level"] = q_ewma_level
ORACLES["ewma_level"] = _EWMA_SQL


def q_moments_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-exact distribution moments per event_type
    (profile.moments_profile): two-pass central moments with
    power-matched fixed-point integer sums — the deterministic twin of
    F.skewness/F.kurtosis, whose float accumulation order is not."""
    from cerebro_spark.operators.profile import moments_profile

    ev = load_table(spark, "events", sf_dir)
    return moments_profile(ev, "value", keys=["event_type"])


_MOMENTS_SQL = """
WITH means AS (
  SELECT event_type,
    (CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
     / count(*)) / 1e6 AS mean
  FROM events GROUP BY 1
),
terms AS (
  SELECT e.event_type, m.mean,
    CAST(floor((e.value - m.mean) * (e.value - m.mean) * 1e6 + 0.5)
         AS BIGINT) AS t2,
    CAST(floor((e.value - m.mean) * (e.value - m.mean) * (e.value - m.mean)
               * 1e3 + 0.5) AS BIGINT) AS t3,
    CAST(floor((e.value - m.mean) * (e.value - m.mean) * (e.value - m.mean)
               * (e.value - m.mean) + 0.5) AS BIGINT) AS t4
  FROM events e JOIN means m USING (event_type)
),
agg AS (
  SELECT event_type, mean, count(*) AS n,
    sum(t2) AS s2, sum(t3) AS s3, sum(t4) AS s4
  FROM terms GROUP BY 1, 2
)
SELECT event_type, n, mean,
  (CAST(s2 AS DOUBLE) / n) / 1e6 AS var_pop,
  ((CAST(s3 AS DOUBLE) / n) / 1e3)
    / (((CAST(s2 AS DOUBLE) / n) / 1e6)
       * sqrt((CAST(s2 AS DOUBLE) / n) / 1e6)) AS skewness,
  (CAST(s4 AS DOUBLE) / n)
    / (((CAST(s2 AS DOUBLE) / n) / 1e6)
       * ((CAST(s2 AS DOUBLE) / n) / 1e6)) AS kurtosis
FROM agg
"""

QUERIES["moments_by_type"] = q_moments_by_type
ORACLES["moments_by_type"] = _MOMENTS_SQL


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall monotonic-trend test per event_type over daily-bucket
    means (tsdb.mann_kendall): S is a pure integer pair count, the
    tie-corrected variance and z are fixed IEEE chains over exact
    integers — the nonparametric significance companion to
    theil_sen_trend's slope magnitude."""
    from cerebro_spark.operators.tsdb import mann_kendall

    ev = load_table(spark, "events", sf_dir)
    return mann_kendall(ev, "value", "ts", keys=["event_type"], bucket_seconds=86400)


_MANN_KENDALL_SQL = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS b,
    (CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
     / count(*)) / 1e6 AS m
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT a.event_type,
    CAST(sum(CAST(sign(b.m - a.m) AS BIGINT)) AS BIGINT) AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.b < b.b
  GROUP BY 1
),
nb AS (SELECT event_type, count(*) AS n_buckets FROM daily GROUP BY 1),
ties AS (
  SELECT event_type, sum(t * (t - 1) * (2 * t + 5)) AS tc FROM (
    SELECT event_type, m, count(*) AS t FROM daily GROUP BY 1, 2
  ) WHERE t > 1 GROUP BY 1
)
SELECT nb.event_type, s.s_stat, CAST(nb.n_buckets AS BIGINT) AS n_buckets,
  CAST(nb.n_buckets * (nb.n_buckets - 1) * (2 * nb.n_buckets + 5)
       - coalesce(ties.tc, 0) AS DOUBLE) / 18.0 AS var_s,
  CASE
    WHEN s.s_stat > 0 THEN (s.s_stat - 1)
      / sqrt(CAST(nb.n_buckets * (nb.n_buckets - 1) * (2 * nb.n_buckets + 5)
                  - coalesce(ties.tc, 0) AS DOUBLE) / 18.0)
    WHEN s.s_stat < 0 THEN (s.s_stat + 1)
      / sqrt(CAST(nb.n_buckets * (nb.n_buckets - 1) * (2 * nb.n_buckets + 5)
                  - coalesce(ties.tc, 0) AS DOUBLE) / 18.0)
    ELSE 0.0
  END AS z
FROM nb JOIN s USING (event_type)
LEFT JOIN ties USING (event_type)
"""

QUERIES["mann_kendall_trend"] = q_mann_kendall_trend
ORACLES["mann_kendall_trend"] = _MANN_KENDALL_SQL


def q_holt_forecast_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle gate for the LAST previously pytest-only operator
    (tsdb.holt_winters_forecast, the Flux holtWinters() parity verb):
    the coupled level/trend recurrence is mirrored by a DuckDB RECURSIVE
    CTE walking the same buckets — a genuine independent second
    implementation (same pattern as streaming_deadband_check).

    Bit-parity recipe: the operator is fed PRE-BUCKETED exact hourly
    means (tsdb.bucket_means fixed-point contract), so its internal
    downsample's avg sees ONE row per bucket and is exact; both engines
    then execute the identical float op sequence (α=0.5 and 1−α=0.5,
    β=0.3 and 1−β=0.7 are all exactly representable / correctly-rounded
    literals), so every forecast double matches bit-for-bit with no
    output rounding."""
    from cerebro_spark.operators.tsdb import bucket_means, holt_winters_forecast

    ev = load_table(spark, "events", sf_dir)
    hourly = bucket_means(ev, "value", "ts", ["event_type"], 3600)
    pre = hourly.select(
        "event_type",
        F.timestamp_seconds(F.col("__b") * 3600).alias("ts"),
        F.col("__m").alias("value"),
    )
    return holt_winters_forecast(
        pre,
        "value",
        "ts",
        keys=["event_type"],
        bucket_seconds=3600,
        alpha=0.5,
        beta=0.3,
        horizon=5,
    )


_HOLT_SQL = """
WITH RECURSIVE buckets AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b,
    (CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
     / count(*)) / 1e6 AS y
  FROM events GROUP BY 1, 2
),
ordered AS (
  SELECT event_type, y,
    row_number() OVER (PARTITION BY event_type ORDER BY b) AS rn,
    max(b) OVER (PARTITION BY event_type) AS maxb,
    count(*) OVER (PARTITION BY event_type) AS n
  FROM buckets
),
walk AS (
  SELECT o1.event_type, CAST(1 AS BIGINT) AS rn,
    o1.y AS level, o2.y - o1.y AS trend, o1.n, o1.maxb
  FROM ordered o1 JOIN ordered o2
    ON o1.event_type = o2.event_type AND o1.rn = 1 AND o2.rn = 2
  UNION ALL
  SELECT w.event_type, o.rn,
    CAST(0.5 AS DOUBLE) * o.y
      + CAST(0.5 AS DOUBLE) * (w.level + w.trend),
    CAST(0.3 AS DOUBLE)
      * ((CAST(0.5 AS DOUBLE) * o.y
          + CAST(0.5 AS DOUBLE) * (w.level + w.trend)) - w.level)
      + CAST(0.7 AS DOUBLE) * w.trend,
    w.n, w.maxb
  FROM walk w JOIN ordered o
    ON o.event_type = w.event_type AND o.rn = w.rn + 1
),
final AS (SELECT * FROM walk WHERE rn = n)
SELECT f.event_type, CAST(h.step AS INT) AS step,
  make_timestamp((f.maxb + h.step) * 3600 * 1000000) AS forecast_ts,
  f.level + f.trend * h.step AS yhat
FROM final f, generate_series(1, 5) AS h(step)
"""

QUERIES["holt_forecast_check"] = q_holt_forecast_check
ORACLES["holt_forecast_check"] = _HOLT_SQL


def q_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX motif discovery (tsdb.sax_motifs): per event_type, the 3 most
    recurrent 4-symbol PAA-rank words over hourly bucket means — e6-exact
    bucket means, ntile rank-band symbolization, total-order tie-breaks
    throughout (operator docstring)."""
    from cerebro_spark.operators.tsdb import sax_motifs

    ev = load_table(spark, "events", sf_dir)
    return sax_motifs(
        ev, "ts", "value", ["event_type"],
        bucket="1 hour", word_len=4, alphabet=4, top=3,
    )


_SAX_MOTIFS_SQL = """
WITH paa AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
    CAST(sum(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
      / count(*) AS m
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
sym AS (
  SELECT event_type, bucket_ts,
    ntile(4) OVER (PARTITION BY event_type
                   ORDER BY m ASC, bucket_ts ASC) AS s
  FROM paa
),
words AS (
  SELECT event_type,
    CAST(s AS VARCHAR)
      || CAST(lead(s, 1) OVER w AS VARCHAR)
      || CAST(lead(s, 2) OVER w AS VARCHAR)
      || CAST(lead(s, 3) OVER w AS VARCHAR) AS motif,
    lead(s, 3) OVER w IS NOT NULL AS isfull
  FROM sym
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts ASC)
),
counts AS (
  SELECT event_type, motif, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM words WHERE isfull GROUP BY 1, 2
)
SELECT event_type, motif, n_occurrences, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY event_type ORDER BY n_occurrences DESC, motif ASC) AS rank
  FROM counts
)
WHERE rank <= 3
"""

QUERIES["sax_motifs"] = q_sax_motifs
ORACLES["sax_motifs"] = _SAX_MOTIFS_SQL


def q_esd_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized-ESD anomaly rounds (tsdb.esd_outliers): per event_type,
    the k=3 Rosner removal rounds — one scan + closed-form updates over
    the bounded extreme-candidate pivot (operator docstring).  The oracle
    unrolls the identical integer-exact recurrence in SQL."""
    from cerebro_spark.operators.tsdb import esd_outliers

    ev = load_table(spark, "events", sf_dir)
    return esd_outliers(ev, "value", ["event_type"], k=3)


def _esd_sql(k: int = 3) -> str:
    """Unrolled DuckDB twin of tsdb.esd_outliers (identical integer
    decision arithmetic; HUGEINT plays DECIMAL(38,0)'s role)."""
    rounds = []
    prev = "state0"
    for r in range(1, k + 1):
        rounds.append(f"""
r{r} AS (
  SELECT *,
    (CASE ilo {" ".join(f"WHEN {i} THEN lo{i}" for i in range(1, k + 1))} END) AS loq_{r},
    (CASE ihi {" ".join(f"WHEN {i} THEN hi{i}" for i in range(1, k + 1))} END) AS hiq_{r}
  FROM {prev}
),
r{r}b AS (
  SELECT *,
    (s - loq_{r} * n) AS devlo_{r},
    (hiq_{r} * n - s) AS devhi_{r},
    (hiq_{r} * n - s) >= (s - loq_{r} * n) AS takehi_{r},
    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      AS varnum_{r},
    (n >= 3 AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) > 0)
      AS ok_{r}
  FROM r{r}
),
r{r}c AS (
  SELECT *,
    CASE WHEN takehi_{r} THEN hiq_{r} ELSE loq_{r} END AS remq_{r},
    CASE WHEN ok_{r} THEN round(
      (CAST(greatest(devhi_{r}, devlo_{r}) AS DOUBLE) / n)
      / sqrt(varnum_{r} / (n - 1)), 6) END AS rstat_{r},
    n AS nbefore_{r}
  FROM r{r}b
),
s{r} AS (
  SELECT event_type, lo1, lo2, lo3, hi1, hi2, hi3,
    CASE WHEN ok_{r} THEN n - 1 ELSE n END AS n,
    CASE WHEN ok_{r} THEN s - remq_{r} ELSE s END AS s,
    CASE WHEN ok_{r} THEN ss - remq_{r} * remq_{r} ELSE ss END AS ss,
    CASE WHEN ok_{r} AND NOT takehi_{r} THEN ilo + 1 ELSE ilo END AS ilo,
    CASE WHEN ok_{r} AND takehi_{r} THEN ihi + 1 ELSE ihi END AS ihi,
    {", ".join(f"ok_{j}, remq_{j}, rstat_{j}, nbefore_{j}" for j in range(1, r + 1))}
  FROM r{r}c
)""")
        prev = f"s{r}"
    emits = "\nUNION ALL\n".join(
        f"SELECT event_type, {r} AS round, "
        f"CAST(remq_{r} AS DOUBLE) / 1e3 AS value, rstat_{r} AS r_stat, "
        f"CAST(nbefore_{r} AS BIGINT) AS n_before FROM s{k} WHERE ok_{r}"
        for r in range(1, k + 1)
    )
    return f"""
WITH base AS (
  SELECT event_type, CAST(floor(value * 1e3 + 0.5) AS BIGINT) AS q
  FROM events WHERE value IS NOT NULL
),
aggs AS (
  SELECT event_type, count(*) AS n, sum(q) AS s, sum(q * q) AS ss
  FROM base GROUP BY 1
),
ranked AS (
  SELECT event_type, q,
    row_number() OVER (PARTITION BY event_type ORDER BY q ASC) AS rlo,
    row_number() OVER (PARTITION BY event_type ORDER BY q DESC) AS rhi
  FROM base
),
cpivot AS (
  SELECT event_type,
    {", ".join(f"max(CASE WHEN rlo = {i} THEN q END) AS lo{i}" for i in range(1, k + 1))},
    {", ".join(f"max(CASE WHEN rhi = {i} THEN q END) AS hi{i}" for i in range(1, k + 1))}
  FROM ranked WHERE rlo <= {k} OR rhi <= {k}
  GROUP BY 1
),
state0 AS (
  SELECT aggs.event_type, lo1, lo2, lo3, hi1, hi2, hi3, n, s, ss,
    1 AS ilo, 1 AS ihi
  FROM aggs JOIN cpivot USING (event_type)
),{",".join(rounds)}
SELECT round, event_type, value, r_stat, n_before FROM ({emits})
"""


_ESD_SQL = _esd_sql(3)

QUERIES["esd_anomalies"] = q_esd_anomalies
ORACLES["esd_anomalies"] = _ESD_SQL


def q_changepoints_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation changepoints (tsdb.binseg_changepoints): per
    event_type the depth-2 mean-shift splits of the hourly value series —
    exact integer prefix sums, one correctly-rounded IEEE division as the
    argmax key (operator docstring).  The oracle replays the identical
    window arithmetic in SQL."""
    from cerebro_spark.operators.tsdb import binseg_changepoints

    ev = load_table(spark, "events", sf_dir)
    return binseg_changepoints(ev, "value", "ts", ["event_type"], 3600, 2)


_BINSEG_LEVEL_SQL = """
  SELECT {part}, b,
    ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY b) AS i,
    SUM(m) OVER (PARTITION BY {part} ORDER BY b
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p,
    COUNT(*) OVER (PARTITION BY {part}) AS t,
    SUM(m) OVER (PARTITION BY {part}) AS s
  FROM {src}
"""

_BINSEG_SQL = f"""
WITH grid AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b,
         SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS sq, COUNT(*) AS c
  FROM events WHERE value IS NOT NULL
  GROUP BY 1, 2
),
g AS (
  SELECT event_type, b,
         CASE WHEN sq < 0 THEN -((-sq) // c) ELSE sq // c END AS m
  FROM grid
),
l1 AS ({_BINSEG_LEVEL_SQL.format(part="event_type", src="g")}),
sc1 AS (
  SELECT *,
    CAST(CAST(p AS HUGEINT) * p * (t - i)
         + CAST(s - p AS HUGEINT) * (s - p) * i AS DOUBLE)
      / (i * (t - i)) AS score
  FROM l1 WHERE i >= 2 AND i <= t - 2
),
b1 AS (
  SELECT event_type, b AS cut, i, t, s, score FROM sc1
  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                             ORDER BY score DESC, i ASC) = 1
),
g2 AS (
  SELECT g.event_type, g.b, g.m,
         CASE WHEN g.b <= b1.cut THEN 0 ELSE 1 END AS seg
  FROM g JOIN b1 USING (event_type)
),
l2 AS ({_BINSEG_LEVEL_SQL.format(part="event_type, seg", src="g2")}),
sc2 AS (
  SELECT *,
    CAST(CAST(p AS HUGEINT) * p * (t - i)
         + CAST(s - p AS HUGEINT) * (s - p) * i AS DOUBLE)
      / (i * (t - i)) AS score
  FROM l2 WHERE i >= 2 AND i <= t - 2
),
b2 AS (
  SELECT event_type, seg, b AS cut, i, t, s, score FROM sc2
  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, seg
                             ORDER BY score DESC, i ASC) = 1
)
SELECT event_type, 1 AS level, 0 AS segment, cut AS split_bucket,
  i AS n_left, t - i AS n_right,
  round((score - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / t) / 1e12, 6) AS gain
FROM b1
UNION ALL
SELECT event_type, 2 AS level, seg AS segment, cut AS split_bucket,
  i AS n_left, t - i AS n_right,
  round((score - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / t) / 1e12, 6) AS gain
FROM b2
"""

QUERIES["changepoints_value"] = q_changepoints_value
ORACLES["changepoints_value"] = _BINSEG_SQL


def q_lead_lag_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead–lag cross-correlation (tsdb.cross_corr): Pearson r between
    hourly view means at t and purchase means at t+lag for lag −3..+3 —
    exact integer Pearson pieces, √·√ denominator as two correctly-
    rounded IEEE sqrts (operator docstring)."""
    from cerebro_spark.operators.tsdb import cross_corr

    ev = load_table(spark, "events", sf_dir)
    return cross_corr(ev, "event_type", "view", "purchase", "value", "ts", 3600, 3)


_LEAD_LAG_SQL = """
WITH qa AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b,
         SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS sq, COUNT(*) AS c
  FROM events WHERE event_type = 'view' AND value IS NOT NULL GROUP BY 1
),
ga AS (SELECT b, CASE WHEN sq < 0 THEN -((-sq) // c) ELSE sq // c END AS ma FROM qa),
qb AS (
  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b,
         SUM(CAST(floor(value * 1e6 + 0.5) AS BIGINT)) AS sq, COUNT(*) AS c
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL GROUP BY 1
),
gb AS (SELECT b, CASE WHEN sq < 0 THEN -((-sq) // c) ELSE sq // c END AS mb FROM qb),
lags AS (SELECT CAST(x AS BIGINT) AS lag FROM range(-3, 4) t(x)),
j AS (
  SELECT lag, ma, mb
  FROM ga CROSS JOIN lags JOIN gb ON gb.b = ga.b + lags.lag
),
a AS (
  SELECT lag, COUNT(*) AS n, SUM(ma) AS sa, SUM(mb) AS sb,
         SUM(CAST(ma AS HUGEINT) * mb) AS sab,
         SUM(CAST(ma AS HUGEINT) * ma) AS saa,
         SUM(CAST(mb AS HUGEINT) * mb) AS sbb
  FROM j GROUP BY 1
)
SELECT lag, n AS n_overlap,
  CASE WHEN (n * saa - CAST(sa AS HUGEINT) * sa) > 0
        AND (n * sbb - CAST(sb AS HUGEINT) * sb) > 0
  THEN round(
    CAST(n * sab - CAST(sa AS HUGEINT) * sb AS DOUBLE)
    / (sqrt(CAST(n * saa - CAST(sa AS HUGEINT) * sa AS DOUBLE))
       * sqrt(CAST(n * sbb - CAST(sb AS HUGEINT) * sb AS DOUBLE))), 6)
  END AS corr
FROM a ORDER BY lag
"""

QUERIES["lead_lag_corr"] = q_lead_lag_corr
ORACLES["lead_lag_corr"] = _LEAD_LAG_SQL


def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend line (tsdb.ols_trend): slope per day,
    intercept, R² from ONE combinable aggregate of exact integer moment
    sums — the dashboard companion of theil_sen_trend (robust) and
    mann_kendall_trend (significance)."""
    from cerebro_spark.operators.tsdb import ols_trend

    ev = load_table(spark, "events", sf_dir)
    return ols_trend(ev, "value", "ts", ["event_type"])


_OLS_TREND_SQL = """
WITH base AS (
  SELECT event_type, epoch(ts) AS t,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL
),
anchored AS (
  SELECT event_type,
         CAST(floor(t - MIN(t) OVER (PARTITION BY event_type)) AS BIGINT) AS x,
         y
  FROM base
),
agg AS (
  SELECT event_type, COUNT(*) AS n,
    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
    SUM(CAST(x AS HUGEINT) * y) AS sxy,
    SUM(CAST(x AS HUGEINT) * x) AS sxx,
    SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM anchored GROUP BY 1
),
d AS (
  SELECT event_type, n,
    CAST(n AS HUGEINT) * sxx - sx * sx AS dxx,
    CAST(n AS HUGEINT) * syy - sy * sy AS dyy,
    CAST(n AS HUGEINT) * sxy - sx * sy AS dxy,
    sx, sy
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n,
  CASE WHEN n >= 2 AND dxx > 0
    THEN round(CAST(dxy AS DOUBLE) / CAST(dxx AS DOUBLE) * 86400.0 / 1e6, 6)
  END AS slope_per_day,
  CASE WHEN n >= 2 AND dxx > 0
    THEN round((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                - (CAST(dxy AS DOUBLE) / CAST(dxx AS DOUBLE))
                  * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 1e6, 6)
  END AS intercept,
  CASE WHEN n >= 2 AND dxx > 0 AND dyy > 0
    THEN round((CAST(dxy AS DOUBLE) * CAST(dxy AS DOUBLE))
               / (CAST(dxx AS DOUBLE) * CAST(dyy AS DOUBLE)), 6)
  END AS r2
FROM d
"""

QUERIES["ols_trend"] = q_ols_trend
ORACLES["ols_trend"] = _OLS_TREND_SQL


def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal/trend strength (tsdb.decomposition_strength): Hyndman's
    1 - Var(R)/Var(S+R) per event_type from the seasonal_decompose
    components - the one-number model-triage readout."""
    from cerebro_spark.operators.tsdb import decomposition_strength

    ev = load_table(spark, "events", sf_dir)
    return decomposition_strength(ev, "value", "ts", keys=["event_type"])


_STRENGTH_SQL = f"""
WITH decomp AS ({_SEASONAL_SQL}),
q AS (
  SELECT event_type,
    CAST(floor((seasonal + residual) * 10000.0 + 0.5) AS BIGINT) AS sr,
    CAST(floor(residual * 10000.0 + 0.5) AS BIGINT) AS r,
    CAST(floor((trend + residual) * 10000.0 + 0.5) AS BIGINT) AS tr
  FROM decomp
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
    sum(CAST(sr AS HUGEINT)) AS sa, sum(CAST(sr AS HUGEINT) * sr) AS saa,
    sum(CAST(r AS HUGEINT)) AS sb, sum(CAST(r AS HUGEINT) * r) AS sbb,
    sum(CAST(tr AS HUGEINT)) AS sc, sum(CAST(tr AS HUGEINT) * tr) AS scc
  FROM q GROUP BY event_type
)
SELECT event_type, n,
  CASE WHEN CAST(n AS HUGEINT) * saa - sa * sa > 0 THEN
    round(greatest(0.0, 1.0
      - CAST(CAST(n AS HUGEINT) * sbb - sb * sb AS DOUBLE)
        / CAST(CAST(n AS HUGEINT) * saa - sa * sa AS DOUBLE)), 6)
  END AS strength_seasonal,
  CASE WHEN CAST(n AS HUGEINT) * scc - sc * sc > 0 THEN
    round(greatest(0.0, 1.0
      - CAST(CAST(n AS HUGEINT) * sbb - sb * sb AS DOUBLE)
        / CAST(CAST(n AS HUGEINT) * scc - sc * sc AS DOUBLE)), 6)
  END AS strength_trend
FROM agg
"""

QUERIES["seasonality_strength"] = q_seasonality_strength
ORACLES["seasonality_strength"] = _STRENGTH_SQL


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive backtest (tsdb.forecast_backtest): MASE + sMAPE of
    the 24h-lag forecaster per event_type on the hourly grid — the
    scale-free 'does the calendar buy anything' readout."""
    from cerebro_spark.operators.tsdb import forecast_backtest

    ev = load_table(spark, "events", sf_dir)
    return forecast_backtest(ev, "value", "ts", keys=["event_type"])


_BACKTEST_SQL = """
WITH hourly AS (
  SELECT event_type, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS b,
    sum(CAST(round(CAST(value AS DOUBLE) * 100) AS BIGINT)) AS s,
    CAST(count(*) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
g AS (
  SELECT event_type, b, CAST(s AS DOUBLE) / CAST(c AS DOUBLE) AS y
  FROM hourly
),
lagged AS (
  SELECT event_type, b, y,
    CASE WHEN lag(b, 1) OVER w = b - 1 THEN lag(y, 1) OVER w END AS p1,
    CASE WHEN lag(b, 24) OVER w = b - 24 THEN lag(y, 24) OVER w END AS ps
  FROM g
  WINDOW w AS (PARTITION BY event_type ORDER BY b)
),
terms AS (
  SELECT event_type,
    CASE WHEN ps IS NOT NULL THEN
      CAST(floor(abs(y - ps) * 1000000.0 + 0.5) AS BIGINT) END AS es,
    CASE WHEN p1 IS NOT NULL THEN
      CAST(floor(abs(y - p1) * 1000000.0 + 0.5) AS BIGINT) END AS e1,
    CASE WHEN ps IS NOT NULL AND abs(y) + abs(ps) > 0 THEN
      CAST(floor(2.0 * abs(y - ps) / (abs(y) + abs(ps))
                 * 1000000.0 + 0.5) AS BIGINT) END AS sm
  FROM lagged
),
agg AS (
  SELECT event_type,
    CAST(count(es) AS BIGINT) AS n_scored,
    sum(CAST(es AS HUGEINT)) AS ses,
    CAST(count(e1) AS BIGINT) AS n1,
    sum(CAST(e1 AS HUGEINT)) AS se1,
    CAST(count(sm) AS BIGINT) AS nsm,
    sum(CAST(sm AS HUGEINT)) AS ssm
  FROM terms GROUP BY event_type
)
SELECT event_type, n_scored,
  CASE WHEN n_scored > 0 THEN
    round(CAST(ses AS DOUBLE) / CAST(n_scored AS DOUBLE) / 1000000.0, 6)
  END AS mae_seasonal,
  CASE WHEN n1 > 0 THEN
    round(CAST(se1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 1000000.0, 6)
  END AS mae_naive,
  CASE WHEN n_scored > 0 AND n1 > 0 AND se1 > 0 THEN
    round((CAST(ses AS DOUBLE) / CAST(n_scored AS DOUBLE) / 1000000.0)
          / (CAST(se1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 1000000.0), 6)
  END AS mase,
  CASE WHEN nsm > 0 THEN
    round(CAST(ssm AS DOUBLE) / CAST(nsm AS DOUBLE) / 1000000.0, 6)
  END AS smape
FROM agg
"""

QUERIES["forecast_backtest"] = q_forecast_backtest
ORACLES["forecast_backtest"] = _BACKTEST_SQL
