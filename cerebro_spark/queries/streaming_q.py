"""Batch-equivalence gates for the stateful streaming twins.

The streaming operators in ``streaming/stateful.py`` mirror batch TSDB
verbs (``tsdb.ohlc``, windowed percentiles); until round 6 their only
evidence was pytest.  These queries run the REAL streaming path — a
parquet replay through ``availableNow`` with a checkpoint, complete-mode
windows, a memory sink — and hand the streamed result to the driver's
Spark-vs-DuckDB oracle gate:

- ``streaming_ohlc_6h``: the streamed OHLC windows themselves are the
  query result, and the oracle is the same 6-hour-bucket SQL the batch
  ``ohlc_6h`` query gates against — a hash match proves
  streaming == batch == independent engine on real data.
- ``streaming_percentiles_check``: ``percentile_approx`` sketches are not
  reproducible in DuckDB, so the equivalence is encoded in the output
  (the recall-gate pattern): full-outer-join the streamed windows against
  the batch twin computed with identical arguments and emit window/
  mismatch counts the oracle pins as constants (0 missing, 0 mismatched).

Scale note: the replay is a real Structured Streaming run — state per
window is four scalars (OHLC) or three GK sketches (percentiles), so the
same plan holds on an unbounded production stream; ``availableNow`` only
changes the trigger, not the operators.

Reference: cerebro's daemon computes no windowed rollups itself (it
delegates to InfluxDB tasks downstream, `cerebro/observer.py`); these
twins are the engine-native replacement, so the gate is equivalence to
the batch verbs rather than to a reference file.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.io import load_table

_BUCKET = 21600  # 6 h — matches queries/tsdb_q.py's batch ohlc_6h


def _events_as_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → canonical point frame (measurement/fields/time) with the
    event id carried in ``fields`` for deterministic open/close ties."""
    return load_table(spark, "events", sf_dir).select(
        F.col("event_type").alias("measurement"),
        F.create_map(
            F.lit("value"), F.col("value").cast("double"),
            F.lit("event_id"), F.col("event_id").cast("double"),
        ).alias("fields"),
        F.col("ts").alias("time"),
    )


def _run_available_now(points_df: DataFrame, twin) -> DataFrame:
    """Replay a batch point frame through a streaming twin: spool to
    parquet, readStream it, run ``twin`` on the stream, collect
    complete-mode windows into a memory sink, return them as a batch
    frame.  The temp spool/checkpoint dir is removed after termination
    (the memory sink owns the rows)."""
    spark = points_df.sparkSession
    name = f"stream_gate_{uuid.uuid4().hex[:12]}"
    tmp = tempfile.mkdtemp(prefix=name)
    try:
        points_df.write.mode("overwrite").parquet(f"{tmp}/in")
        stream = spark.readStream.schema(points_df.schema).parquet(f"{tmp}/in")
        q = (
            twin(stream)
            .writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


def q_streaming_ohlc_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cerebro_spark.streaming.stateful import streaming_ohlc

    out = _run_available_now(
        _events_as_points(spark, sf_dir),
        lambda s: streaming_ohlc(
            s, window="6 hours", watermark="10 minutes",
            tiebreak_field="event_id",
        ),
    )
    return out.select(
        F.col("window_start").alias("bucket_ts"),
        F.col("measurement").alias("event_type"),
        "open", "high", "low", "close",
        F.col("n_points").alias("n"),
    )


# identical to the batch ohlc_6h oracle: with UTC sessions, Spark's
# 6-hour tumbling window start == floor(epoch/21600)*21600
_STREAMING_OHLC_SQL = f"""
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


def q_streaming_percentiles_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cerebro_spark.streaming.stateful import streaming_percentiles

    accuracy = 1000
    streamed = _run_available_now(
        _events_as_points(spark, sf_dir),
        lambda s: streaming_percentiles(
            s, window="6 hours", watermark="10 minutes", accuracy=accuracy
        ),
    )
    batch = (
        _events_as_points(spark, sf_dir)
        .groupBy(F.window("time", "6 hours").alias("w"), "measurement")
        .agg(
            F.percentile_approx(
                F.element_at("fields", F.lit("value")), 0.5, accuracy
            ).alias("p50"),
            F.percentile_approx(
                F.element_at("fields", F.lit("value")), 0.95, accuracy
            ).alias("p95"),
            F.percentile_approx(
                F.element_at("fields", F.lit("value")), 0.99, accuracy
            ).alias("p99"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select(F.col("w.start").alias("window_start"), "measurement",
                "p50", "p95", "p99", "n_points")
    )
    j = streamed.alias("s").join(
        batch.alias("b"), ["window_start", "measurement"], "full_outer"
    )
    mismatch = (
        F.col("s.p50").eqNullSafe(F.col("b.p50"))
        & F.col("s.p95").eqNullSafe(F.col("b.p95"))
        & F.col("s.p99").eqNullSafe(F.col("b.p99"))
        & F.col("s.n_points").eqNullSafe(F.col("b.n_points"))
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(
            (F.col("s.p50").isNull() | F.col("b.p50").isNull()).cast("long")
        ).alias("missing_windows"),
        F.sum((~mismatch).cast("long")).alias("value_mismatches"),
    )


_STREAMING_PCTL_SQL = f"""
SELECT CAST(count(*) AS BIGINT) AS n_windows,
       CAST(0 AS BIGINT) AS missing_windows,
       CAST(0 AS BIGINT) AS value_mismatches
FROM (
  SELECT DISTINCT floor(epoch(ts) / {_BUCKET}), event_type FROM events
)
"""


QUERIES = {
    "streaming_ohlc_6h": q_streaming_ohlc_6h,
    "streaming_percentiles_check": q_streaming_percentiles_check,
}

ORACLES = {
    "streaming_ohlc_6h": _STREAMING_OHLC_SQL,
    "streaming_percentiles_check": _STREAMING_PCTL_SQL,
}
