"""Custom stateful streaming operators.

- ``streaming_downsample``: watermarked tumbling-window aggregation (the
  continuous version of the batch downsample; late data handled by the
  watermark, state bounded per window).
- ``streaming_sessionize``: session windows with a custom gap rule via
  ``applyInPandasWithState`` — the operator class Spark's built-ins don't
  cover directly (per-key session accumulation with custom emit semantics).

State discipline at scale: both operators key their state by a high-cardinality
column (user / measurement+tags) so state shards across executors; watermarks /
state timeouts bound memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_downsample(
    points: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    time_col: str = "time",
) -> DataFrame:
    """Continuous tumbling-window rollup of the canonical point stream:
    per (window, measurement) count + per-field aggregate of the ``value``
    field.  Append-mode compatible (watermark closes windows)."""
    return (
        points.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), "measurement")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.avg(F.element_at(F.col("fields"), "value")).alias("value_avg"),
            F.min(F.element_at(F.col("fields"), "value")).alias("value_min"),
            F.max(F.element_at(F.col("fields"), "value")).alias("value_max"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "measurement",
            "n_points",
            "value_avg",
            "value_min",
            "value_max",
        )
    )


def streaming_dedup(
    points: DataFrame,
    key_cols: list[str] | None = None,
    watermark: str = "10 minutes",
    time_col: str = "time",
) -> DataFrame:
    """Streaming exact dedup — the continuous twin of ``dedup.exact_dedup``.

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes the key's event time, so state is bounded by (arrival
    rate × watermark window) instead of growing with the whole stream —
    a plain ``dropDuplicates`` on a stream never evicts and OOMs at 100 TB.
    Duplicates arriving within the watermark window are dropped even when
    their event times differ by less than the watermark (the semantics a
    redelivering transport — AMQP/at-least-once poll replay — needs).
    """
    # default key: measurement + event time (map-typed ``tags`` can't be a
    # dedup key — Spark set-ops reject map columns; promote tags to a string
    # digest upstream if per-tag identity matters)
    key_cols = key_cols or ["measurement", time_col]
    return points.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


_SESSION_STATE_SCHEMA = "start long, last long, n long, vsum double"
_SESSION_OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, value_sum double"
)


def _session_fn(gap_seconds: int, use_timeout: bool = True):
    gap_ns = int(gap_seconds) * 1_000_000_000

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, vsum = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="ns")],
                    "session_end": [pd.Timestamp(last, unit="ns")],
                    "n_events": [n],
                    "value_sum": [vsum],
                }
            )
            return

        # ignore_index: a key spanning multiple Arrow chunks would otherwise
        # concat with duplicate index labels, and any label-based alignment
        # silently mispairs timestamps with values.  Sort whole rows by ts and
        # iterate positionally — no index round-trip at all.
        rows = pd.concat(list(batches), ignore_index=True).sort_values("ts")
        # state carries NANOSECONDS (int64), not truncated seconds: the gap
        # test and the emitted session bounds must match the batch twin's
        # exact timestamps (events carry sub-second precision)
        ns = rows["ts"].astype("int64")
        closed = []
        if state.exists:
            start, last, n, vsum = state.get
        else:
            start, last, n, vsum = None, None, 0, 0.0
        for t, v in zip(ns, rows["value"]):
            if last is not None and t - last > gap_ns:
                closed.append((start, last, n, vsum))
                start, n, vsum = t, 0, 0.0
            if start is None:
                start = t
            last = t
            n += 1
            vsum += float(v)
        state.update((int(start), int(last), int(n), float(vsum)))
        if use_timeout:
            state.setTimeoutDuration(gap_seconds * 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="ns") for s, _, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="ns") for _, e, _, _ in closed],
                    "n_events": [n for _, _, n, _ in closed],
                    "value_sum": [v for _, _, _, v in closed],
                }
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    emit_on_timeout: bool = True,
) -> DataFrame:
    """Arbitrary-gap session windows over a streaming (or batch) events frame
    with ``applyInPandasWithState``: per-user state = open session
    (start/last/n/sum); a session closes when a gap exceeds ``gap_seconds``
    (emitted immediately) or on state timeout (emitted at expiry).

    ``emit_on_timeout=False`` disables the processing-time timeout: open
    sessions then stay in state until a later event closes them by gap.
    Use it for finite availableNow replays (the batch-equivalence gate) —
    a registered processing-time timeout keeps an availableNow query
    running extra empty batches waiting for wall-clock expiry, so the
    replay would block for ``gap_seconds`` instead of terminating with
    the data.  Live deployments keep the default (a user who walks away
    still gets their last session flushed).

    Input needs ``user_id``, ``ts``, ``value``.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds, use_timeout=emit_on_timeout),
            outputStructType=_SESSION_OUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if emit_on_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )


def _deadband_fn(delta: float, key_col: str):
    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        last = state.get[0] if state.exists else None
        for pdf in batches:
            pdf = pdf.sort_values("ts")
            keep = []
            for i, v in enumerate(pdf["value"]):
                if last is None or abs(float(v) - last) >= delta:
                    keep.append(i)
                    last = float(v)
            if keep:
                yield pdf.iloc[keep]
        if last is not None:
            state.update((float(last),))

    return fn


def streaming_deadband(
    events: DataFrame,
    key_col: str = "user_id",
    delta: float = 1.0,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Deadband compression — the classic TSDB ingest filter: per key, emit
    a row only when the value moved ≥ ``delta`` from the LAST EMITTED value
    (not the previous sample, which a plain ``lag`` window would compare —
    the reference's Govee stale-filter is the time-axis analog of this
    value-axis filter, `lvm.py:117-125`).

    Per-key state is ONE float (``applyInPandasWithState``; the newer
    ``transformWithStateInPandas`` API needs google.protobuf, absent in
    this container — same Arrow-batched execution either way), so state is
    O(keys).  Input needs (``key_col``, ts, value).
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    state_schema = StructType([StructField("last", DoubleType())])
    return (
        events.withWatermark("ts", watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _deadband_fn(delta, key_col),
            outputStructType=events.schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_ohlc(
    points: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    time_col: str = "time",
    tiebreak_field: str | None = None,
) -> DataFrame:
    """Continuous OHLC rollup of the point stream — the streaming twin of
    ``operators.tsdb.ohlc``: per (window, measurement) open/high/low/close
    of the ``value`` field, with open/close picked by event time via
    ``min_by``/``max_by`` (map-side-combinable, so the state per window is
    four scalars, not a buffer of rows).

    ``tiebreak_field`` names a ``fields`` entry appended to the ordering
    struct so duplicate timestamps pick open/close deterministically —
    the same contract as the batch twin's ``tiebreak`` columns (without
    it, ties pick an arbitrary row; the batch-equivalence gate
    ``streaming_ohlc_6h`` relies on this).

    Watermark closes windows for append-mode emission; late rows beyond the
    watermark are dropped by the engine — same contract as the downsample.
    """
    v = F.element_at(F.col("fields"), "value")
    order = (
        F.struct(F.col(time_col),
                 F.element_at(F.col("fields"), tiebreak_field))
        if tiebreak_field
        else F.col(time_col)
    )
    return (
        points.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), "measurement")
        .agg(
            F.min_by(v, order).alias("open"),
            F.max(v).alias("high"),
            F.min(v).alias("low"),
            F.max_by(v, order).alias("close"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "measurement",
            "open",
            "high",
            "low",
            "close",
            "n_points",
        )
    )


def streaming_percentiles(
    points: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    time_col: str = "time",
    accuracy: int = 1000,
) -> DataFrame:
    """Continuous windowed percentiles of the ``value`` field — the
    streaming twin of ``percentiles_daily``'s sketch path: per (window,
    measurement) p50/p95/p99 via ``percentile_approx`` (Greenwald-Khanna
    summaries — MERGEABLE, so window state is one bounded sketch per
    group, never a value buffer; exact percentiles would have to hold
    every row in state).
    """
    v = F.element_at(F.col("fields"), "value")
    return (
        points.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), "measurement")
        .agg(
            F.percentile_approx(v, 0.5, accuracy).alias("p50"),
            F.percentile_approx(v, 0.95, accuracy).alias("p95"),
            F.percentile_approx(v, 0.99, accuracy).alias("p99"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "measurement",
            "p50",
            "p95",
            "p99",
            "n_points",
        )
    )


def _cusum_fn(mu: float, sigma: float, slack_sigmas: float, alert_sigmas: float):
    k = slack_sigmas * sigma
    h = alert_sigmas * sigma

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        s = state.get[0] if state.exists else 0.0
        for pdf in batches:
            pdf = pdf.sort_values(["ts"]).reset_index(drop=True)
            cs, alerts = [], []
            for v in pdf["value"]:
                s = max(0.0, s + (float(v) - mu - k))
                cs.append(s)
                alerts.append(s > h)
            out = pdf[["ts", "value"]].copy()
            out.insert(0, "key", key[0])
            out["cusum"] = cs
            out["is_alert"] = alerts
            yield out
        state.update((float(s),))

    return fn


def streaming_cusum(
    events: DataFrame,
    mu: float,
    sigma: float,
    key_col: str = "user_id",
    slack_sigmas: float = 0.5,
    alert_sigmas: float = 4.0,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming CUSUM drift alarm — the textbook sequential recurrence
    Sᵢ = max(0, Sᵢ₋₁ + (xᵢ − μ − kσ)), which genuinely needs carried state
    online (the batch twin ``operators.tsdb.cusum`` uses the closed
    two-window form instead; the recurrence here keeps ONE float per key).

    μ/σ are the *training baseline*, passed in (computed offline by the
    batch operator) — estimating them online would make the alarm chase its
    own drift.  Input needs (``key_col``, ts, value).
    """
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        StructField,
        StructType,
        TimestampType,
    )

    key_field = events.schema[key_col]
    out_schema = StructType(
        [
            StructField("key", key_field.dataType),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
            StructField("cusum", DoubleType()),
            StructField("is_alert", BooleanType()),
        ]
    )
    state_schema = StructType([StructField("s", DoubleType())])
    return (
        events.withWatermark("ts", watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            _cusum_fn(mu, sigma, slack_sigmas, alert_sigmas),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def _msprt_fn(arm_a, arm_b):
    """Exact integer cumulative-moment carrier for streaming_msprt: the
    per-group state is six BIGINTs (n, Σq, Σq² per arm) updated with
    unbounded Python ints and emitted per day — no floats anywhere, so
    the streamed moments are BIT-identical to the batch cumulative
    window over the same quantized inputs."""
    import pandas as pd

    def fn(key, pdfs, state):
        if state.exists:
            na, sa, ssa, nb, sb, ssb = (int(x) for x in state.get)
        else:
            na = sa = ssa = nb = sb = ssb = 0
        rows = pd.concat(list(pdfs))
        out = []
        if len(rows):
            rows = rows.sort_values("day", kind="mergesort")
            for day, grp in rows.groupby("day", sort=True):
                a = grp[grp["arm"] == arm_a]["q"]
                b = grp[grp["arm"] == arm_b]["q"]
                na += int(len(a)); sa += int(a.sum()) if len(a) else 0
                ssa += int((a.astype("object") ** 2).sum()) if len(a) else 0
                nb += int(len(b)); sb += int(b.sum()) if len(b) else 0
                ssb += int((b.astype("object") ** 2).sum()) if len(b) else 0
                out.append((int(day), na, sa, ssa, nb, sb, ssb))
        state.update((na, sa, ssa, nb, sb, ssb))
        yield pd.DataFrame(
            out,
            columns=["day", "na", "sa", "ssa", "nb", "sb", "ssb"],
        )

    return fn


def streaming_msprt(
    events: DataFrame,
    arm_a=0,
    arm_b=1,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming twin of ``profile.msprt_monitor``: carries the six
    cumulative integer moments (n, Σq, Σq² per arm) in state and emits
    them per day — the always-valid p-value chain is then pure column
    arithmetic downstream, exactly as in the batch operator.  Input
    needs (``ts`` timestamp, ``day`` long, ``arm`` long, ``q`` long —
    pre-quantized by the caller so the Python stage touches only
    integers; unbounded Python ints make Σq² exact at any scale, which
    LongType state then bounds at ~10⁹ rows for e2 quantization —
    documented like esd_outliers' overflow envelope).

    ONE state group per experiment (a single monitoring timeline, the
    same scope as the batch operator) — sequential by nature, like the
    Holt recurrence; the fact-sized work (quantize, day-bucket) happens
    in codegen BEFORE the Arrow stage.

    ORDERING CONTRACT (same caveat class as sessionize/CUSUM): micro-
    batches must arrive in event order and each must hold whole days —
    a day split across batches emits that day twice (with partial then
    complete cumulative moments; under replay the LAST row per day
    wins), and out-of-order arrival folds rows into the cumulative
    moments in the wrong sequence, corrupting every later day's values.
    The equivalence gate replays with ordered_single_batch=True; a
    production feed must be a time-ordered log (e.g. a date-partitioned
    spool) or must dedup on day downstream, keeping the max-n row.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("day", LongType()),
            StructField("na", LongType()),
            StructField("sa", LongType()),
            StructField("ssa", LongType()),
            StructField("nb", LongType()),
            StructField("sb", LongType()),
            StructField("ssb", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField(c, LongType()) for c in ("na", "sa", "ssa", "nb", "sb", "ssb")]
    )
    return (
        events.withWatermark("ts", watermark)
        .withColumn("__exp", F.lit(1))
        .groupBy("__exp")
        .applyInPandasWithState(
            _msprt_fn(0 if arm_a is None else arm_a, 1 if arm_b is None else arm_b),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def streaming_distinct(
    points: DataFrame,
    window: str = "1 hour",
    watermark: str = "10 minutes",
    time_col: str = "time",
    rsd: float = 0.02,
) -> DataFrame:
    """Continuous windowed approximate-distinct of the ``value`` field —
    the streaming twin of the batch HLL++ distinct rollups
    (``merged_distinct_check``'s family): per (window, measurement) an
    ``approx_count_distinct`` plus the exact row count.  HLL++ registers
    are MERGEABLE and bounded (~1.5 KB at rsd 2%), so window state never
    grows with cardinality — the property that makes per-window distinct
    viable on an unbounded stream (exact distinct would hold every key
    in state).  The register-max merge is ORDER-INSENSITIVE, so the
    availableNow replay equals the batch aggregate bit-for-bit — the
    equivalence its gate (``streaming_distinct_check``) pins.
    """
    v = F.element_at(F.col("fields"), "value")
    return (
        points.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), "measurement")
        .agg(
            F.approx_count_distinct(v, rsd).alias("approx_distinct"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "measurement",
            "approx_distinct",
            "n_points",
        )
    )
