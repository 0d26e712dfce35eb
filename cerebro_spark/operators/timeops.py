"""Time-series operators (SURVEY §2.3: T7-T10, T17, T22, T23).

All pure DataFrame→DataFrame functions — no collect, no Python row loops, so
every one of them distributes.  The rolling-window family (T17) is the flagship
operator: time-RANGE windows over irregularly-sampled series.

Scale notes (100 TB):
- ``rolling_by_time`` uses a window ordered by event-time *within partition
  keys*.  An unpartitioned ``Window.orderBy`` serializes onto one task; always
  pass ``partition_by`` (device / measurement / series id) at scale.  The
  driver's `events` table is a single series, so the oracle queries use the
  single-partition form at sf≤0.1 — documented, deliberate.
- dedup is expressed as max/min-row-per-key groupBy (map-side partial agg)
  rather than a row_number window when possible: one shuffle, combiner-friendly.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cast_ts(df: DataFrame, col: str = "ts", fmt: str | None = None) -> DataFrame:
    """T9 — string→timestamp cast (reference `tools.py:172-177`: str → datetime,
    unit ms, tz UTC).  Session timezone is UTC so `to_timestamp` matches."""
    expr = F.to_timestamp(F.col(col), fmt) if fmt else F.to_timestamp(F.col(col))
    return df.withColumn(col, expr)


def dedup_by_time(
    df: DataFrame,
    time_col: str = "ts",
    tiebreak: str | None = None,
    keys: list[str] | None = None,
) -> DataFrame:
    """T8 — sort+dedup by timestamp (reference `tools.py:169,241-245`:
    ``df.sort("ts").unique("ts")``).

    With ``tiebreak`` the survivor is deterministic (lowest tiebreak value) —
    required for oracle comparison; without it this is ``dropDuplicates``
    (reference semantics: arbitrary survivor).

    Implemented as a window row_number filter; the window partitions by the
    dedup key so it hash-shuffles on ``time_col`` — co-partitioned, skew-free
    (timestamps are near-unique), scales linearly.
    """
    part = (keys or []) + [time_col]
    if tiebreak is None:
        return df.dropDuplicates(part)
    w = Window.partitionBy(*part).orderBy(F.col(tiebreak).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def filter_time_range(
    df: DataFrame,
    start: str | dt.datetime | None,
    end: str | dt.datetime | None,
    time_col: str = "ts",
) -> DataFrame:
    """T10 — keep ``start <= ts <= end`` (reference `tools.py:179-183`).
    Inclusive bounds, matching the reference's closed interval.

    Declarative filter → Catalyst pushes it into the parquet scan (partition
    pruning + row-group min/max skipping at scale)."""
    if start is not None:
        df = df.filter(F.col(time_col) >= F.lit(start).cast("timestamp"))
    if end is not None:
        df = df.filter(F.col(time_col) <= F.lit(end).cast("timestamp"))
    return df


def relative_range(
    df: DataFrame,
    last_seconds: float,
    time_col: str = "ts",
    now: dt.datetime | None = None,
) -> DataFrame:
    """T23 — relative-time resolution (reference `tools.py:70-86`: negative
    start_time = seconds before now).  ``now`` defaults to the data's max
    timestamp so results are deterministic/replayable; pass wall-clock ``now``
    for the daemon behavior.

    The max-timestamp scalar is computed as a 1-row aggregate and broadcast
    into the filter — no driver collect of data rows.
    """
    if now is not None:
        cutoff = F.lit(now).cast("timestamp") - F.expr(
            f"INTERVAL {int(last_seconds)} SECOND"
        )
        return df.filter(F.col(time_col) >= cutoff)
    bound = df.select(
        (F.max(time_col) - F.expr(f"INTERVAL {int(last_seconds)} SECOND")).alias("c")
    )
    return df.join(F.broadcast(bound)).filter(F.col(time_col) >= F.col("c")).drop("c")


def stale_filter(
    df: DataFrame,
    max_age_seconds: float,
    time_col: str = "time",
    now_col: Column | None = None,
) -> DataFrame:
    """T7 — stale-data filter (reference `lvm.py:79-82`: Govee skips points
    older than ``2*delay``).  Batch form; the streaming form is
    ``withWatermark`` + this same predicate (streaming/ingest.py)."""
    now = now_col if now_col is not None else F.current_timestamp()
    return df.filter(
        F.col(time_col).cast("double") > now.cast("double") - F.lit(max_age_seconds)
    )


def rolling_by_time(
    df: DataFrame,
    specs: dict[str, tuple[str, str, int]],
    time_col: str = "ts",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """T17 — time-based rolling windows over an irregular series (reference
    `tools.py:248-272`: rolling mean of wind speed/dir + rolling max of gusts
    over 5m/10m/30m keyed by timestamp).

    ``specs`` maps output column → (agg ∈ {avg,max,min,sum}, source col,
    window seconds).  Window frame is ``RANGE BETWEEN (w-1) PRECEDING AND
    CURRENT ROW`` over epoch-seconds — i.e. a closed window of width ``w``
    ending at the current row, the Spark analog of Polars
    ``rolling_mean_by(..., window_size="5m")`` (left-open (t-5m, t] at 1-second
    resolution).

    At scale: pass ``partition_by`` (station / device) so each series windows
    independently with no global sort.
    """
    order = F.col(time_col).cast("long")
    base = (
        Window.partitionBy(*partition_by).orderBy(order)
        if partition_by
        else Window.orderBy(order)
    )
    out = df
    aggs = {"avg": F.avg, "max": F.max, "min": F.min, "sum": F.sum}
    for out_col, (agg, src, seconds) in specs.items():
        w = base.rangeBetween(-(seconds - 1), 0)
        out = out.withColumn(out_col, aggs[agg](F.col(src)).over(w))
    return out


def hwm_advance(df: DataFrame, time_col: str = "ts") -> dt.datetime | None:
    """T22 — incremental high-water-mark (reference `lco.py:116-122`:
    start_time = max(ts) of last batch, truncated to seconds).  Used by the
    polling connectors; in Structured Streaming the checkpoint owns this."""
    row = df.select(F.date_trunc("second", F.max(time_col)).alias("hwm")).first()
    return row["hwm"] if row else None
