"""TSDB-style query operators beyond the reference's Flux delegation.

The reference pushes every aggregation beyond §2.4's scan/filter/pivot into
InfluxDB (SURVEY §2.4: "everything heavier is left to InfluxDB/Flux").  Our
engine exposes them natively — the standard TSDB verb set:

- ``derivative`` / ``rate``: per-series value change per second;
- ``increase``: monotonic counter delta over a window;
- ``downsample``: tumbling-bucket aggregates (see also `downsample_1h` query);
- ``gapfill`` + ``ffill``: dense time axis with optional last-value carry.

All are window/groupBy compositions — one shuffle each, partitioned by series
keys so they scale horizontally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def derivative(
    df: DataFrame,
    value_col: str,
    time_col: str = "ts",
    partition_by: list[str] | None = None,
    out_col: str = "derivative",
    order_extra: list[str] | None = None,
    scale_bucket_seconds: int = 86400,
) -> DataFrame:
    """dv/dt per series: (value - lag(value)) / (epoch_seconds - lag(...)).

    Null on the first row of each series and on zero/negative dt (duplicate
    timestamps), matching InfluxDB ``derivative(nonNegative: false)``.
    """
    secs = F.col(time_col).cast("long")
    if partition_by:
        order = [F.col(time_col)] + [F.col(c) for c in (order_extra or [])]
        w = Window.partitionBy(*partition_by).orderBy(*order)
        dv = F.col(value_col) - F.lag(value_col).over(w)
        dts = secs - F.lag(secs).over(w)
        return df.withColumn(
            out_col,
            F.when(dts > 0, dv / dts).otherwise(F.lit(None).cast("double")),
        )
    # keyless = a single global series: two-level bucketed lag instead of an
    # unpartitioned window (which would serialize every row through one task)
    tmp = _global_lag_struct(
        df.withColumn("__secs", secs),
        [value_col, "__secs"],
        time_col,
        order_extra,
        scale_bucket_seconds,
    )
    dv = F.col(value_col) - F.col("__prev").getField(value_col)
    dts = F.col("__secs") - F.col("__prev").getField("__secs")
    return (
        tmp.withColumn(
            out_col,
            F.when(dts > 0, dv / dts).otherwise(F.lit(None).cast("double")),
        )
        .drop("__secs", "__prev")
    )


def increase(
    df: DataFrame,
    value_col: str,
    time_col: str = "ts",
    partition_by: list[str] | None = None,
    out_col: str = "increase",
    scale_bucket_seconds: int = 86400,
) -> DataFrame:
    """Counter increase vs previous sample, clamped at 0 on resets; null on
    each series' first sample (InfluxDB/PromQL ``increase`` semantics —
    note Spark's ``greatest`` ignores nulls, so the first-row case must be
    guarded explicitly or it would read as a 0.0 increase)."""
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(time_col)
        prev = F.lag(value_col).over(w)
        return df.withColumn(
            out_col,
            F.when(prev.isNotNull(), F.greatest(F.col(value_col) - prev, F.lit(0.0))),
        )
    # keyless: two-level bucketed lag (see derivative)
    tmp = _global_lag_struct(
        df, [value_col], time_col, scale_bucket_seconds=scale_bucket_seconds
    )
    prev = F.col("__prev").getField(value_col)
    return tmp.withColumn(
        out_col,
        F.when(prev.isNotNull(), F.greatest(F.col(value_col) - prev, F.lit(0.0))),
    ).drop("__prev")


def downsample(
    df: DataFrame,
    bucket_seconds: int,
    aggs: dict[str, Column],
    time_col: str = "ts",
    keys: list[str] | None = None,
) -> DataFrame:
    """Tumbling-bucket aggregation: bucket = floor(epoch / width) * width."""
    bucket = F.timestamp_seconds(
        F.floor(F.col(time_col).cast("long") / bucket_seconds) * bucket_seconds
    ).alias("bucket_ts")
    cols = [bucket] + [F.col(k) for k in (keys or [])]
    return df.groupBy(*cols).agg(*[c.alias(n) for n, c in aggs.items()])


def gapfill(
    df: DataFrame,
    bucket_seconds: int,
    time_col: str = "bucket_ts",
    keys: list[str] | None = None,
    fill_cols: list[str] | None = None,
    ffill: bool = False,
) -> DataFrame:
    """Densify a downsampled frame: emit one row per (key, bucket) over each
    key's [min, max] bucket range; missing buckets get null values, optionally
    carried forward (``ffill``) with ``last(ignorenulls)``.

    The dense axis is built per key group with ``sequence`` + ``explode`` —
    distributed, no driver-side calendar.  State is bounded by each key's own
    span, so skewed spans don't serialize the job.
    """
    keys = keys or []
    fill_cols = fill_cols or [
        c for c in df.columns if c != time_col and c not in keys
    ]
    secs = F.col(time_col).cast("long")
    spans = df.groupBy(*[F.col(k) for k in keys] if keys else []).agg(
        F.min(secs).alias("__lo"), F.max(secs).alias("__hi")
    )
    axis = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(bucket_seconds))
        ).alias("__sec"),
    ).select(*keys, F.timestamp_seconds(F.col("__sec")).alias(time_col))
    dense = axis.join(df, on=keys + [time_col], how="left")
    if ffill:
        if keys:
            w = Window.partitionBy(*keys).orderBy(time_col).rowsBetween(
                Window.unboundedPreceding, 0
            )
            for c in fill_cols:
                dense = dense.withColumn(c, F.last(c, ignorenulls=True).over(w))
        else:
            # Keyless ffill is a GLOBAL prefix scan — an unpartitioned running
            # window would serialize every row through one task (round-1 scale
            # flag).  Two-level scan instead: parallel within-bucket carry +
            # a per-bucket summary (one row per bucket) whose own scan is the
            # only single-task stage.
            dense = _global_ffill(dense, time_col, fill_cols)
    return dense


def _global_ffill(
    df: DataFrame,
    time_col: str,
    fill_cols: list[str],
    scale_bucket_seconds: int = 86400,
    descending: bool = False,
) -> DataFrame:
    """Forward-fill with no series key, parallelized as a two-level prefix
    scan: (1) within time buckets, the running ``last(ignorenulls)`` runs in
    parallel across bucket partitions; (2) each bucket's final non-null value
    per column is aggregated to ONE summary row per bucket, and the carry-in
    for bucket k = running last over summaries of buckets < k.  The summary
    scan is the only unpartitioned window and sees #buckets rows (days, not
    samples), so the single task is bounded by calendar span, not data volume.

    ``descending=True`` runs the mirror (backward-fill: carry the next
    value backwards) — the forward-looking half of linear interpolation.
    """
    b = F.floor(F.col(time_col).cast("long") / scale_bucket_seconds)
    df_b = df.withColumn("__b", b)
    # Tie discipline at duplicate timestamps: ONE shared tie key — the
    # struct of ALL fill columns — orders every column's window AND keys
    # the bucket summary, so the within-bucket carry and the cross-bucket
    # carry agree on which same-ts row wins.  A shared orderBy matters for
    # the plan too: identical window specs collapse to a single Sort +
    # Window operator (a per-column tie key planned one Sort+Window PER
    # COLUMN — F full sorts of the bucketed data for F fill columns).
    allkey = F.struct(*[F.col(c).alias(c) for c in fill_cols])
    tie = allkey.desc() if descending else allkey.asc()
    order = (
        F.col(time_col).desc() if descending else F.col(time_col).asc(),
        tie,
    )
    wb = Window.partitionBy("__b").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = df_b
    for c in fill_cols:
        # original fill_cols feed `allkey` via df_b's projection, so the
        # filled values must land in fresh columns and swap in afterwards
        local = local.withColumn(
            f"__f_{c}", F.last(c, ignorenulls=True).over(wb)
        )
    for c in fill_cols:
        local = local.withColumn(c, F.col(f"__f_{c}")).drop(f"__f_{c}")
    pick = F.min_by if descending else F.max_by
    summary = df_b.groupBy("__b").agg(
        *[
            pick(
                c,
                F.when(
                    F.col(c).isNotNull(),
                    F.struct(F.col(time_col).alias("t"), allkey.alias("k")),
                ),
            ).alias(f"__last_{c}")
            for c in fill_cols
        ]
    )
    ws = Window.orderBy(
        F.col("__b").desc() if descending else F.col("__b").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    carry = summary.select(
        "__b",
        *[
            F.last(f"__last_{c}", ignorenulls=True).over(ws).alias(f"__carry_{c}")
            for c in fill_cols
        ],
    )
    out = local.join(F.broadcast(carry), "__b", "left")
    for c in fill_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__carry_{c}")))
    return out.drop("__b", *[f"__carry_{c}" for c in fill_cols])


def _global_lag_struct(
    df: DataFrame,
    carry_cols: list[str],
    time_col: str,
    order_extra: list[str] | None = None,
    scale_bucket_seconds: int = 86400,
    out_col: str = "__prev",
) -> DataFrame:
    """Global (keyless) ``lag`` of a whole row struct via the same two-level
    scan: within-bucket ``lag`` runs in parallel; only each bucket's FIRST row
    needs the previous non-empty bucket's last row, delivered by a
    #buckets-sized summary + broadcast join.  All carried values come from
    one row (struct), never mixed."""
    order_extra = order_extra or []
    b = F.floor(F.col(time_col).cast("long") / scale_bucket_seconds)
    dfb = df.withColumn("__b", b)
    row_struct = F.struct(*[F.col(c).alias(c) for c in carry_cols])
    # The carried row struct itself is the final sort key on BOTH levels, so
    # ties on (time, order_extra) resolve to the same physical row in the
    # within-bucket lag and the bucket summary (ADVICE r2: max_by ties at
    # duplicate timestamps must not disagree with the window pass).
    order = [F.col(time_col)] + [F.col(c) for c in order_extra] + [row_struct]
    wb = Window.partitionBy("__b").orderBy(*order)
    dfb = dfb.withColumn(out_col, F.lag(row_struct).over(wb))
    okey = F.struct(
        F.col(time_col), *[F.col(c) for c in order_extra], row_struct.alias("__r")
    )
    summary = dfb.groupBy("__b").agg(F.max_by(row_struct, okey).alias("__blast"))
    ws = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    carry = summary.select(
        "__b", F.last("__blast", ignorenulls=True).over(ws).alias("__carry")
    )
    out = dfb.join(F.broadcast(carry), "__b", "left")
    out = out.withColumn(out_col, F.coalesce(F.col(out_col), F.col("__carry")))
    return out.drop("__b", "__carry")


def interpolate_linear(
    df: DataFrame,
    value_col: str,
    time_col: str = "ts",
    partition_by: list[str] | None = None,
    out_col: str | None = None,
    scale_bucket_seconds: int = 86400,
) -> DataFrame:
    """Linear interpolation of null values between the nearest non-null
    neighbors (InfluxDB ``fill(linear)``): v = prev + (next-prev)·(t-t₀)/(t₁-t₀).
    Leading/trailing nulls stay null.

    Pure window composition — JVM-side, one sort per series partition:
    ``last(ignorenulls)`` looking back and ``first(ignorenulls)`` looking
    forward carry the bracketing values and their timestamps.
    """
    out_col = out_col or f"{value_col}_interp"
    secs = F.col(time_col).cast("double")
    v = F.col(value_col)
    t_at_v = F.when(v.isNotNull(), secs)
    if partition_by:
        asc = Window.partitionBy(*partition_by).orderBy(F.col(time_col).asc())
        desc = Window.partitionBy(*partition_by).orderBy(F.col(time_col).desc())
        # Both lookups are RUNNING frames (unbounded-preceding → current),
        # which WindowExec evaluates incrementally in O(n).  The naive
        # formulation — ``first(ignorenulls) over (current → unbounded
        # FOLLOWING)`` — re-scans the remainder of the partition per row and
        # is O(n²) (184 s vs 0.6 s at 100k rows); the forward scan is instead
        # a running frame over the DESCENDING order.
        back = asc.rowsBetween(Window.unboundedPreceding, 0)
        fwd = desc.rowsBetween(Window.unboundedPreceding, 0)
        prev_v = F.last(v, ignorenulls=True).over(back)
        prev_t = F.last(t_at_v, ignorenulls=True).over(back)
        next_v = F.last(v, ignorenulls=True).over(fwd)
        next_t = F.last(t_at_v, ignorenulls=True).over(fwd)
        interp = F.when(v.isNotNull(), v).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull() & (next_t > prev_t),
                prev_v + (next_v - prev_v) * (secs - prev_t) / (next_t - prev_t),
            )
        )
        return df.withColumn(out_col, interp)
    # keyless = one global series: both directional scans go through the
    # two-level bucketed prefix scan instead of unpartitioned running
    # windows.  __pv/__pt (and __nv/__nt) are null on exactly the same rows,
    # so independent per-column fills still pick values from one source row.
    tmp = (
        df.withColumn("__pv", v)
        .withColumn("__pt", t_at_v)
        .withColumn("__nv", v)
        .withColumn("__nt", t_at_v)
    )
    tmp = _global_ffill(tmp, time_col, ["__pv", "__pt"], scale_bucket_seconds)
    tmp = _global_ffill(
        tmp, time_col, ["__nv", "__nt"], scale_bucket_seconds, descending=True
    )
    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            F.col("__pv").isNotNull()
            & F.col("__nv").isNotNull()
            & (F.col("__nt") > F.col("__pt")),
            F.col("__pv")
            + (F.col("__nv") - F.col("__pv"))
            * (secs - F.col("__pt"))
            / (F.col("__nt") - F.col("__pt")),
        )
    )
    return tmp.withColumn(out_col, interp).drop("__pv", "__pt", "__nv", "__nt")


def distinct_sketch_rollup(
    df: DataFrame,
    key_col: str,
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
    lg_k: int = 14,
) -> DataFrame:
    """Mergeable distinct-count rollup: per (keys, time bucket), a
    DataSketches HLL sketch of ``key_col`` (binary column) plus the row
    count.  The 100 TB shape for "distinct users over <arbitrary range>":
    the raw table is read ONCE to build per-day sketches; any later range
    query unions the few relevant sketches (register-wise max — lossless for
    a fixed lg_k, so a union over daily sketches equals the sketch built
    directly over the range).  lg_k=14 → ~0.8% rsd at 16 KiB per sketch.
    """
    bucket = F.timestamp_seconds(
        (F.col(ts_col).cast("long") / bucket_seconds).cast("long")
        * bucket_seconds
    ).alias("bucket_ts")
    return df.groupBy(*keys, bucket).agg(
        F.hll_sketch_agg(key_col, F.lit(lg_k)).alias("sketch"),
        F.count(key_col).alias("n_rows"),
    )


def distinct_over_range(
    sketches: DataFrame,
    start=None,
    end=None,
    keys: tuple[str, ...] = (),
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Approximate distinct count over [start, end) from a sketch rollup —
    no raw-table access: filter the bucket rows, union their sketches per
    group, estimate.  Works on a persisted rollup (binary parquet column)
    exactly as on a live one."""
    df = sketches
    if start is not None:
        df = df.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        df = df.filter(F.col(ts_col) < F.lit(end))
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    return grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(
            "approx_distinct"
        ),
        F.sum("n_rows").alias("n_rows"),
    )


def quantile_sketch_rollup(
    df: DataFrame,
    value_col: str,
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Mergeable quantile rollup: per (keys, time bucket), a KLL sketch of
    ``value_col`` (binary column, ~1.7% rank error at the default k).  The
    companion to ``distinct_sketch_rollup`` for percentiles: raw data is
    read once; percentiles over ANY later range come from merging the few
    relevant sketches — unlike ``percentile_approx``, whose GK state exists
    only inside one aggregation."""
    bucket = F.timestamp_seconds(
        (F.col(ts_col).cast("long") / bucket_seconds).cast("long")
        * bucket_seconds
    ).alias("bucket_ts")
    return df.groupBy(*keys, bucket).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias(
            "qsketch"
        ),
        F.count(value_col).alias("n_rows"),
    )


def quantiles_over_range(
    sketches: DataFrame,
    probabilities: tuple[float, ...] = (0.5, 0.95, 0.99),
    start=None,
    end=None,
    keys: tuple[str, ...] = (),
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Percentiles over [start, end) by merging KLL sketches — no raw scan.
    One output column ``p<percentile>`` per requested probability."""
    df = sketches
    if start is not None:
        df = df.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        df = df.filter(F.col(ts_col) < F.lit(end))
    grouped = df.groupBy(*keys) if keys else df.groupBy()
    merged = grouped.agg(
        F.kll_merge_agg_double("qsketch").alias("__m"),
        F.sum("n_rows").alias("n_rows"),
    )
    cols = [
        F.kll_sketch_get_quantile_double("__m", F.lit(p)).alias(
            "p" + format(p * 100, "g").replace(".", "_")
        )
        for p in probabilities
    ]
    return merged.select(*keys, *cols, "n_rows")


def theta_sketch_rollup(
    df: DataFrame,
    key_col: str,
    keys: tuple[str, ...] = (),
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Theta-sketch rollup of ``key_col`` per (keys, time bucket).  Theta
    sketches support SET ALGEBRA across sketches (union / intersection /
    difference), which HLL cannot: retention ("active in BOTH windows") and
    churn ("active in A but not B") become sketch expressions over the
    rollup instead of fact-table self-joins."""
    bucket = F.timestamp_seconds(
        (F.col(ts_col).cast("long") / bucket_seconds).cast("long")
        * bucket_seconds
    ).alias("bucket_ts")
    return df.groupBy(*keys, bucket).agg(
        F.theta_sketch_agg(key_col).alias("tsketch")
    )


def retention_between(
    sketches: DataFrame,
    window_a,
    window_b,
    ts_col: str = "bucket_ts",
) -> DataFrame:
    """Retention/churn between two time windows from a theta rollup:
    one row (a_distinct, b_distinct, retained, churned, new) where
    retained = |A ∩ B|, churned = |A \\ B|, new = |B \\ A| — computed
    entirely from per-day sketches (at 100 TB the raw-data alternative is
    two fact scans plus a distinct-key self-join)."""
    def union_window(lo, hi):
        return (
            sketches.filter(
                (F.col(ts_col) >= F.lit(lo)) & (F.col(ts_col) < F.lit(hi))
            )
            .agg(F.theta_union_agg("tsketch").alias("s"))
        )

    a = union_window(*window_a).select(F.col("s").alias("a"))
    b = union_window(*window_b).select(F.col("s").alias("b"))
    return a.crossJoin(b).select(
        F.theta_sketch_estimate("a").alias("a_distinct"),
        F.theta_sketch_estimate("b").alias("b_distinct"),
        F.theta_sketch_estimate(F.theta_intersection("a", "b")).alias(
            "retained"
        ),
        F.theta_sketch_estimate(F.theta_difference("a", "b")).alias(
            "churned"
        ),
        F.theta_sketch_estimate(F.theta_difference("b", "a")).alias("new"),
    )


def rolling_distinct(
    sketches: DataFrame,
    window_buckets: int = 7,
    ts_col: str = "bucket_ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Trailing-window distinct counts from a theta rollup: for every
    bucket, |distinct keys over the last ``window_buckets`` buckets| by
    unioning that many sketches — the DAU/WAU/MAU query family with no
    raw-table access and no distinct-over-self-join.

    Shape: the rollup (days × keys, tiny) explodes ×window into
    (target bucket, member sketch) pairs, then one groupBy unions each
    target's sketches.  Work is O(buckets × window × sketch_size),
    independent of corpus size.  Exact below the theta sampling threshold
    (~4k distinct), ~1.6% rse above it.
    """
    step = F.explode(
        F.sequence(F.lit(0), F.lit(window_buckets - 1))
    ).alias("__i")
    member = sketches.select(F.col(ts_col), F.col("tsketch"), step)
    target = F.timestamp_seconds(
        F.col(ts_col).cast("long") + F.col("__i") * bucket_seconds
    ).alias("window_end")
    contrib = member.select(target, "tsketch")
    # only windows whose end bucket actually exists in the rollup
    ends = sketches.select(F.col(ts_col).alias("window_end")).distinct()
    return (
        contrib.join(ends, "window_end")
        .groupBy("window_end")
        .agg(
            F.round(
                F.theta_sketch_estimate(F.theta_union_agg("tsketch"))
            ).cast("long").alias("distinct_keys"),
            F.count(F.lit(1)).alias("buckets_in_window"),
        )
    )


def ohlc(
    df: DataFrame,
    bucket_seconds: int,
    value_col: str,
    time_col: str = "ts",
    keys: list[str] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Open/high/low/close per tumbling bucket — the candlestick downsample
    every TSDB ships (Influx ``first/last/min/max``, Timescale ``ohlc``).

    One groupBy, all map-side-combinable aggregates: ``min_by``/``max_by``
    over a (time, *tiebreak) ordering struct pick open/close, plain
    ``min``/``max`` give low/high.  Determinism at duplicate timestamps
    requires ``tiebreak`` (e.g. an id column) in the ordering struct —
    without it ties pick an arbitrary row (the round-1 ADVICE lesson on
    max_by ties).
    """
    order = F.struct(
        F.col(time_col), *[F.col(c) for c in (tiebreak or [])]
    )
    bucket = F.timestamp_seconds(
        F.floor(F.col(time_col).cast("long") / bucket_seconds) * bucket_seconds
    ).alias("bucket_ts")
    v = F.col(value_col)
    return df.groupBy(bucket, *[F.col(k) for k in (keys or [])]).agg(
        F.min_by(v, order).alias("open"),
        F.max(v).alias("high"),
        F.min(v).alias("low"),
        F.max_by(v, order).alias("close"),
        F.count(F.lit(1)).alias("n"),
    )


def time_weighted_avg(
    df: DataFrame,
    bucket_seconds: int,
    value_col: str,
    time_col: str = "ts",
    keys: list[str] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Time-weighted average per tumbling bucket: each sample is weighted by
    its hold time (gap to the next sample *within the bucket*), so irregular
    series don't over-count burst periods — the Timescale ``time_weight
    ('LOCF')`` / Influx ``integral/elapsed`` semantics.

    TWA = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last−t_first) over each (key, bucket) group;
    a single-sample (or all-same-timestamp) bucket degrades to the plain
    mean of its rows.  The lead window partitions by (key, bucket) — tasks
    scale with bucket count, never a global sort.  ``tiebreak`` columns
    extend the window ordering so duplicate timestamps weight
    deterministically (ties get zero hold time; the last tied row carries
    the gap).
    """
    keys = keys or []
    bucket = (
        F.floor(F.col(time_col).cast("long") / bucket_seconds) * bucket_seconds
    ).alias("__bucket")
    d = df.select(
        bucket,
        *[F.col(k) for k in keys],
        F.col(time_col).cast("double").alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
        *[F.col(c) for c in (tiebreak or []) if c not in keys],
    )
    w = Window.partitionBy("__bucket", *keys).orderBy(
        "__t", *[F.col(c) for c in (tiebreak or [])]
    )
    d = d.withColumn("__hold", F.lead("__t").over(w) - F.col("__t"))
    return (
        d.groupBy("__bucket", *keys)
        .agg(
            F.when(
                F.sum("__hold") > 0,
                F.sum(F.col("__v") * F.col("__hold")) / F.sum("__hold"),
            )
            .otherwise(F.avg("__v"))
            .alias("twa"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.timestamp_seconds(F.col("__bucket")).alias("bucket_ts"),
            *keys,
            "twa",
            "n",
        )
    )


def minmax_downsample(
    df: DataFrame,
    bucket_seconds: int,
    value_col: str,
    time_col: str = "ts",
    keys: list[str] | None = None,
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Extrema-preserving downsample for plotting: per tumbling bucket keep
    the min-value and max-value sample (timestamp + value), so a rendered
    line never loses a spike — the practical cousin of LTTB that stays a
    pure one-shuffle aggregation (LTTB's previous-selection recurrence
    doesn't distribute).

    Ties on value resolve by (time, *tiebreak) lexicographically — the min
    sample takes the EARLIEST tied row, the max sample the LATEST (both
    sides of the struct comparison, identical in Spark and the oracle) —
    making the output deterministic and oracle-reproducible.
    """
    order_min = F.struct(
        F.col(value_col),
        F.col(time_col),
        *[F.col(c) for c in (tiebreak or [])],
    )
    bucket = F.timestamp_seconds(
        F.floor(F.col(time_col).cast("long") / bucket_seconds) * bucket_seconds
    ).alias("bucket_ts")
    grouped = df.groupBy(bucket, *[F.col(k) for k in (keys or [])]).agg(
        F.min_by(F.struct(F.col(time_col).alias("t"), F.col(value_col).alias("v")), order_min).alias("__lo"),
        F.max_by(F.struct(F.col(time_col).alias("t"), F.col(value_col).alias("v")), order_min).alias("__hi"),
    )
    lo = grouped.select(
        "bucket_ts",
        *(keys or []),
        F.lit("min").alias("kind"),
        F.col("__lo.t").alias(time_col),
        F.col("__lo.v").alias(value_col),
    )
    hi = grouped.select(
        "bucket_ts",
        *(keys or []),
        F.lit("max").alias("kind"),
        F.col("__hi.t").alias(time_col),
        F.col("__hi.v").alias(value_col),
    )
    return lo.unionByName(hi)


def mad_outliers(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    k: float = 3.0,
    time_col: str = "ts",
) -> DataFrame:
    """Robust outlier flags via median absolute deviation: |v − median| >
    k·1.4826·MAD per key group.  Two exact-percentile aggregations (median,
    then MAD over the re-joined residuals) — both map-side partial, the
    group cardinality (event types / series) bounds the state, and the
    per-key medians broadcast back onto the fact rows.

    Exact ``percentile`` (interpolated) matches DuckDB ``quantile_cont`` so
    the oracle reproduces bit-for-bit at sf gates; at the 100 TB target the
    drop-in is ``percentile_approx`` with a documented rank-error bound.

    Output adds ``med``, ``mad``, ``is_outlier``; inputs already carrying
    one of those names are rejected (internals stay ``__``-prefixed so
    the mid-plan joins can never collide with user columns).
    """
    keys = keys or []
    clash = {"med", "mad", "is_outlier"} & set(df.columns)
    if clash:
        raise ValueError(
            f"mad_outliers: input columns {sorted(clash)} collide with the "
            "operator's output columns; rename them first"
        )
    v = F.col(value_col).cast("double")
    med = df.groupBy(*keys).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    joined = df.join(F.broadcast(med), on=keys) if keys else df.crossJoin(
        F.broadcast(med)
    )
    resid = joined.withColumn("__resid", F.abs(v - F.col("__med")))
    mad = resid.groupBy(*keys).agg(
        F.expr("percentile(__resid, 0.5)").alias("__mad")
    )
    out = resid.join(F.broadcast(mad), on=keys) if keys else resid.crossJoin(
        F.broadcast(mad)
    )
    return (
        out.withColumn(
            "is_outlier",
            F.col("__resid") > F.lit(k) * F.lit(1.4826) * F.col("__mad"),
        )
        .drop("__resid")
        .withColumnRenamed("__med", "med")
        .withColumnRenamed("__mad", "mad")
    )


def ks_drift(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: list[str] | None = None,
    bins: int = 64,
) -> DataFrame:
    """Distribution-drift monitor: two-sample Kolmogorov–Smirnov statistic
    between the early and late half of **each series' own** time span,
    computed on a shared fixed grid of ``bins`` value buckets.

    The exact KS over raw samples needs a per-key sort of all points; the
    binned variant is the scale form — one groupBy to (key, bin, side)
    counts (state = keys × bins, independent of row count), a per-key
    cumulative window over ≤``bins`` rows, and a max.  Bin-resolution error
    is bounded by 1/bins, plenty for a drift alarm.

    The early/late midpoint is PER KEY (a series active only in part of the
    global window still splits around its own span — a series that appeared
    or disappeared is exactly the one the alarm must cover), computed by one
    keyed min/max aggregate broadcast back.  Value bin edges stay GLOBAL so
    every key's two CDFs share one grid and every engine reproduces the
    same buckets bit-for-bit.  ``ks`` is null only for the degenerate
    single-instant series (no late half exists).
    """
    keys = keys or []
    t = F.col(time_col).cast("double")
    v = F.col(value_col).cast("double")
    vspan = df.agg(
        F.min(v).alias("__vmin"),
        F.max(v).alias("__vmax"),
    )
    d = df.crossJoin(F.broadcast(vspan))
    if keys:
        tspan = df.groupBy(*keys).agg(
            F.min(t).alias("__tmin"), F.max(t).alias("__tmax")
        )
        d = d.join(F.broadcast(tspan), on=keys)
    else:
        tspan = df.agg(F.min(t).alias("__tmin"), F.max(t).alias("__tmax"))
        d = d.crossJoin(F.broadcast(tspan))
    is_early = t <= (F.col("__tmin") + F.col("__tmax")) / 2
    # constant-valued column → one bin (ANSI mode would otherwise raise
    # DIVIDE_BY_ZERO on the range normalization)
    bin_ = F.when(
        F.col("__vmax") > F.col("__vmin"),
        F.least(
            F.floor(
                (v - F.col("__vmin"))
                / (F.col("__vmax") - F.col("__vmin"))
                * bins
            ),
            F.lit(bins - 1),
        ),
    ).otherwise(F.lit(0)).cast("long")
    counts = (
        d.select(*keys, bin_.alias("__bin"), is_early.alias("__early"))
        .groupBy(*keys, "__bin")
        .agg(
            F.sum(F.col("__early").cast("long")).alias("__ne"),
            F.sum((~F.col("__early")).cast("long")).alias("__nl"),
        )
    )
    wcum = Window.partitionBy(*keys).orderBy("__bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy(*keys)
    # a key whose rows all fall on one side has a zero denominator — emit
    # null CDF (→ null ks) instead of an ANSI divide-by-zero
    tot_e, tot_l = F.sum("__ne").over(wtot), F.sum("__nl").over(wtot)
    cdf = counts.select(
        *keys,
        F.when(tot_e > 0, F.sum("__ne").over(wcum).cast("double") / tot_e)
        .alias("__ce"),
        F.when(tot_l > 0, F.sum("__nl").over(wcum).cast("double") / tot_l)
        .alias("__cl"),
        F.col("__ne"),
        F.col("__nl"),
    )
    return cdf.groupBy(*keys).agg(
        F.round(F.max(F.abs(F.col("__ce") - F.col("__cl"))), 6).alias("ks"),
        F.sum("__ne").alias("n_early"),
        F.sum("__nl").alias("n_late"),
    )


def cusum(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: list[str] | None = None,
    tiebreak: list[str] | None = None,
    slack_sigmas: float = 0.5,
    alert_sigmas: float = 4.0,
) -> DataFrame:
    """One-sided CUSUM change detection per series: alert when the
    cumulative upward deviation from the series mean exceeds
    ``alert_sigmas``·σ (Page 1954) — the standard drift alarm for sensor /
    counter telemetry.

    The textbook recurrence Sᵢ = max(0, Sᵢ₋₁ + (xᵢ − μ − kσ)) looks
    sequential, but has the closed form **Sᵢ = Pᵢ − min(0, min_{j≤i} Pⱼ)**
    with P the ordered prefix sum of the deviations — so it distributes as
    two stacked windows (running sum + running min) partitioned by series
    key.  No recursion, no per-row Python, no state beyond the window.

    μ and σ come from order-independent fixed-point sums (value is e2-exact
    in this corpus): Σx·100 and Σ(x·100)² as BIGINTs, so both engines derive
    bit-identical baselines.  The e4 square sum holds to ~8×10⁹ rows per
    key at this value range; beyond that switch the baseline to a sampled
    estimate (the alarm only needs 2-digit σ).

    Output adds ``mu``, ``sigma``, ``cusum``, ``is_alert``; inputs already
    carrying one of those names are rejected (internals stay
    ``__``-prefixed so the mid-plan joins can never collide with user
    columns).
    """
    keys = keys or []
    clash = {"mu", "sigma", "cusum", "is_alert"} & set(df.columns)
    if clash:
        raise ValueError(
            f"cusum: input columns {sorted(clash)} collide with the "
            "operator's output columns; rename them first"
        )
    e2 = F.round(F.col(value_col) * 100).cast("long")
    stats = df.groupBy(*keys).agg(
        F.sum(e2).alias("__s1"),
        F.sum(e2 * e2).alias("__s2"),
        F.count(F.lit(1)).alias("__n"),
    ).select(
        *keys,
        (F.col("__s1").cast("double") / 100.0 / F.col("__n")).alias("__mu"),
        # greatest(·, 0): the two FP paths for E[x²]−E[x]² can differ by an
        # ulp on constant series, and sqrt(−ε) would poison every downstream
        # comparison with NaN
        F.sqrt(
            F.greatest(
                F.col("__s2").cast("double") / 10000.0 / F.col("__n")
                - (F.col("__s1").cast("double") / 100.0 / F.col("__n"))
                * (F.col("__s1").cast("double") / 100.0 / F.col("__n")),
                F.lit(0.0),
            )
        ).alias("__sigma"),
    )
    joined = (
        df.join(F.broadcast(stats), on=keys)
        if keys
        else df.crossJoin(F.broadcast(stats))
    )
    dev = (
        F.col(value_col).cast("double")
        - F.col("__mu")
        - F.lit(slack_sigmas) * F.col("__sigma")
    )
    order = [F.col(time_col)] + [F.col(c) for c in (tiebreak or [])]
    if keys:
        w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
            Window.unboundedPreceding, 0
        )
        with_p = joined.withColumn("__p", F.sum(dev).over(w))
        s = F.col("__p") - F.least(F.lit(0.0), F.min("__p").over(w))
    else:
        # KEYLESS (one global series): the closed form needs the running
        # prefix sum P and running min of P — both distribute as two-level
        # scans (within-time-bucket window in parallel + ONE summary row
        # per bucket through the only unpartitioned window, calendar-sized).
        # P_i = offset(bucket) + P_local;  min_{j<=i} P_j =
        # min(prevmin(bucket), offset(bucket) + minP_local up to i).
        bkt = F.floor(F.col(time_col).cast("long") / 86400)
        m = joined.withColumn("__bkt", bkt).withColumn("__d", dev)
        w_in = (
            Window.partitionBy("__bkt")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        m = m.withColumn("__pl", F.sum("__d").over(w_in)).withColumn(
            "__ml", F.min("__pl").over(w_in)
        )
        summ = m.groupBy("__bkt").agg(
            F.sum("__d").alias("__t"), F.min("__pl").alias("__bm")
        )
        w_s = Window.orderBy("__bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        w_incl = Window.orderBy("__bkt").rowsBetween(
            Window.unboundedPreceding, 0
        )
        w_b = Window.orderBy("__bkt")
        carry = summ.select(
            "__bkt",
            "__bm",
            F.coalesce(F.sum("__t").over(w_s), F.lit(0.0)).alias("__off"),
        )
        carry = carry.select(
            "__bkt",
            "__off",
            F.min(F.col("__off") + F.col("__bm")).over(w_incl).alias(
                "__selfmin"
            ),
        )
        # prevmin(bucket) = min over STRICTLY earlier buckets of
        # (offset(b') + minP_local(b')) — lag the inclusive running min
        carry = carry.select(
            "__bkt", "__off", F.lag("__selfmin").over(w_b).alias("__pm")
        )
        with_p = m.join(F.broadcast(carry), "__bkt").withColumn(
            "__p", F.col("__off") + F.col("__pl")
        )
        runmin = F.least(
            F.coalesce(F.col("__pm"), F.lit(float("inf"))),
            F.col("__off") + F.col("__ml"),
        )
        s = F.col("__p") - F.least(F.lit(0.0), runmin)
    return (
        with_p.withColumn("cusum", F.round(s, 6))
        .withColumn("is_alert", s > F.lit(alert_sigmas) * F.col("__sigma"))
        .drop(
            "__p", "__s1", "__s2", "__n",
            "__bkt", "__d", "__pl", "__ml", "__off", "__pm",
        )
        .withColumnRenamed("__mu", "mu")
        .withColumnRenamed("__sigma", "sigma")
    )


def seasonal_decompose(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: list[str] | None = None,
    trend_window_seconds: int = 86400,
    season_unit: str = "hour",
) -> DataFrame:
    """Additive seasonal decomposition per series: value = trend + seasonal
    + residual (classical moving-average decomposition; Flux ships the
    Holt-Winters cousin, Timescale leaves it to the client).

    - trend: centered ``trend_window_seconds`` moving average ON THE
      HOURLY BUCKET GRID — per-bucket e2 BIGINT sums first, then a
      24-bucket sliding frame over the bucket axis, joined back to rows.
      Two reasons: (a) determinism — integer sums are order-independent
      (raw double window avgs differ in the last ulp across engines on
      centered frames); (b) SCALE — Spark rebuilds sliding-frame
      aggregates per row, so a per-row ±12h frame costs O(rows ×
      frame-rows) (soaked: 503 s at 5M rows/1s density vs ~5 s on the
      bucket grid); the bucket-grid frame is ≤24 entries regardless of
      density, and classical decomposition is defined on the regular grid
      anyway;
    - seasonal: per (key, hour-of-day) mean of the detrended series — a
      bounded keys × 24 profile broadcast back;
    - residual: what's left — the anomaly signal.

    Outputs round at 4 dp on both engines: residuals are DIFFERENCES of
    similar magnitudes, so the raw doubles amplify relative FP noise past
    the driver canonicalizer's 14 significant digits.
    """
    keys = keys or []
    n_buckets = trend_window_seconds // 3600
    half_b = n_buckets // 2
    sec = F.col(time_col).cast("long")
    v = F.col(value_col).cast("double")
    v_e2 = F.round(v * 100).cast("long")
    b = F.floor(sec / 3600)
    hourly = (
        df.groupBy(*keys, b.alias("__b"))
        .agg(F.sum(v_e2).alias("__s"), F.count(F.lit(1)).alias("__c"))
    )
    wb = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rangeBetween(-half_b, half_b - 1)
    )
    trend_b = hourly.select(
        *keys,
        "__b",
        (
            F.sum("__s").over(wb).cast("double")
            / 100.0
            / F.sum("__c").over(wb)
        ).alias("__trend"),
    )
    with_trend = df.withColumn("__b", b).join(
        trend_b, on=keys + ["__b"]
    ).withColumn("__detr", v - F.col("__trend"))
    unit = F.hour(F.col(time_col)) if season_unit == "hour" else F.dayofweek(
        F.col(time_col)
    )
    with_unit = with_trend.withColumn("__u", unit)
    profile = with_unit.groupBy(*keys, "__u").agg(
        F.avg("__detr").alias("__seasonal")
    )
    joined = with_unit.join(F.broadcast(profile), on=keys + ["__u"])
    # trend stays UNROUNDED: its value chain is bit-deterministic (integer
    # window sums), and exact e2/cnt ratios land on .00005 boundaries where
    # the engines' round() implementations disagree (the hourly_seasonality
    # lesson); seasonal/residual carry group-avg FP noise that keeps them
    # off exact boundaries, so round-4 is safe there
    return (
        joined.withColumn("trend", F.col("__trend"))
        .withColumn("seasonal", F.round("__seasonal", 4))
        .withColumn(
            "residual",
            F.round(v - F.col("__trend") - F.col("__seasonal"), 4),
        )
        .drop("__trend", "__detr", "__seasonal", "__u", "__b")
    )


def holt_winters_forecast(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: list[str] | None = None,
    bucket_seconds: int = 3600,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 24,
    max_buckets: int = 500_000,
) -> DataFrame:
    """Per-series Holt (double-exponential) forecast — the Flux
    ``holtWinters()`` verb (reference users call it server-side; here it's
    native).  Fixed smoothing constants, no parameter optimization: the
    recurrences ℓₜ = α·xₜ + (1−α)(ℓₜ₋₁+bₜ₋₁), bₜ = β(ℓₜ−ℓₜ₋₁)+(1−β)bₜ₋₁
    are inherently sequential, so each series runs as ONE Arrow-batched
    pandas group (`applyInPandas`) over its downsampled buckets — state is
    two floats, and series parallelism comes from the group key.
    Genuinely non-SQL-expressible (coupled recurrence), hence
    pytest-verified rather than oracle-gated.

    SCALE BOUND (VERDICT r3 #6): raw row count never reaches the pandas
    group — ``downsample`` pre-aggregates map-side first, so a 5M-row/1 Hz
    single series enters the fit as span/bucket ≈ 1.4k hourly buckets (see
    SCALE_NOTES soak).  The group size is therefore CALENDAR-bounded:
    span_seconds / bucket_seconds, independent of sample rate.  As a
    backstop for adversarial spans (centuries at 1 s buckets),
    ``max_buckets`` keeps only each series' most recent N buckets before
    the fit — exponential smoothing forgets geometrically (weight of a
    bucket m steps back is α(1−α)^m < 1e-9 within a few dozen steps at
    α=0.5), so truncation at 500k buckets is exact to double precision.

    Emits ``horizon`` rows per series: (keys…, step, forecast_ts, yhat).
    """
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        StructField,
        StructType,
        TimestampType,
    )

    keys = keys or []
    ds = downsample(
        df, bucket_seconds, {"__y": F.avg(F.col(value_col))}, time_col, keys
    )
    if max_buckets is not None:
        # keep each series' most recent max_buckets buckets: rank from the
        # newest side, shuffle-compatible with the applyInPandas grouping
        wmb = Window.partitionBy(*keys).orderBy(F.col("bucket_ts").desc())
        ds = (
            ds.withColumn("__rn", F.row_number().over(wmb))
            .filter(F.col("__rn") <= max_buckets)
            .drop("__rn")
        )
    key_fields = [
        f for f in ds.schema.fields if f.name in keys
    ]
    out_schema = StructType(
        key_fields
        + [
            StructField("step", IntegerType(), False),
            StructField("forecast_ts", TimestampType(), False),
            StructField("yhat", DoubleType(), False),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        ys = pdf["__y"].tolist()
        if len(ys) < 2:
            return pd.DataFrame(columns=[f.name for f in out_schema.fields])
        level, trend = float(ys[0]), float(ys[1]) - float(ys[0])
        for x in ys[1:]:
            prev = level
            level = alpha * float(x) + (1 - alpha) * (level + trend)
            trend = beta * (level - prev) + (1 - beta) * trend
        last_ts = pdf["bucket_ts"].iloc[-1]
        rows = {
            "step": list(range(1, horizon + 1)),
            "forecast_ts": [
                last_ts + pd.Timedelta(seconds=bucket_seconds * h)
                for h in range(1, horizon + 1)
            ],
            "yhat": [level + trend * h for h in range(1, horizon + 1)],
        }
        for k in keys:
            rows[k] = [pdf[k].iloc[0]] * horizon
        return pd.DataFrame(rows)[[f.name for f in out_schema.fields]]

    grouped = ds.groupBy(*keys) if keys else ds.groupBy(F.lit(1).alias("__g"))
    out = grouped.applyInPandas(fit, out_schema)
    return out


def psi_drift(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: list[str] | None = None,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index between the early and late half of each
    series' own time span — the standard model-monitoring drift score
    (PSI < 0.1 stable, > 0.25 shifted).

    ``PSI = Σ_bins (p_late − p_early) · ln(p_late / p_early)`` with
    Laplace-smoothed proportions ``p = (cnt + 1) / (n + bins)`` so empty
    bins contribute finite terms.  Bin edges are equal-width over the
    EARLY window's per-key value span (PSI bins on the reference
    distribution); late values outside the reference span clamp into the
    edge bins.

    Cross-engine determinism: proportions are single IEEE divisions of
    exact integers; ln is libm-identical; each bin's (always-nonnegative)
    term is quantized to a 1e-9 BIGINT and the per-key total is an EXACT
    integer sum over the full ``bins`` grid (missing bins are
    materialized via a keys × sequence cross join — they still carry
    smoothing mass).

    Scale shape: two keyed min/max aggregates broadcast back, one
    combinable (key, bin) groupBy — state is keys × bins, independent of
    row count — then window sums over ≤``bins`` rows per key.  Same
    monitor family as ``ks_drift`` (which compares CDF shape; PSI weights
    mass movement, the complementary alarm).
    """
    keys = keys or []
    t = F.col(time_col).cast("double")
    v = F.col(value_col).cast("double")
    if keys:
        tspan = df.groupBy(*keys).agg(
            F.min(t).alias("__tmin"), F.max(t).alias("__tmax")
        )
        d = df.join(F.broadcast(tspan), on=keys)
    else:
        tspan = df.agg(F.min(t).alias("__tmin"), F.max(t).alias("__tmax"))
        d = df.crossJoin(F.broadcast(tspan))
    is_early = t <= (F.col("__tmin") + F.col("__tmax")) / 2
    d = d.select(*keys, v.alias("__v"), is_early.alias("__early"))
    early = d.filter("__early")
    if keys:
        vspan = early.groupBy(*keys).agg(
            F.min("__v").alias("__vmin"), F.max("__v").alias("__vmax")
        )
        d = d.join(F.broadcast(vspan), on=keys)
    else:
        vspan = early.agg(
            F.min("__v").alias("__vmin"), F.max("__v").alias("__vmax")
        )
        d = d.crossJoin(F.broadcast(vspan))
    bin_ = F.when(
        F.col("__vmax") > F.col("__vmin"),
        F.greatest(
            F.least(
                F.floor(
                    (F.col("__v") - F.col("__vmin"))
                    / (F.col("__vmax") - F.col("__vmin"))
                    * bins
                ),
                F.lit(bins - 1),
            ),
            F.lit(0),
        ),
    ).otherwise(F.lit(0)).cast("long")
    counts = (
        d.select(*keys, bin_.alias("__bin"), F.col("__early"))
        .groupBy(*keys, "__bin")
        .agg(
            F.sum(F.col("__early").cast("long")).alias("__ne"),
            F.sum((~F.col("__early")).cast("long")).alias("__nl"),
        )
    )
    grid = tspan.select(*keys).withColumn(
        "__bin", F.explode(F.sequence(F.lit(0), F.lit(bins - 1)))
    ).withColumn("__bin", F.col("__bin").cast("long"))
    full = grid.join(counts, [*keys, "__bin"], "left").select(
        *keys,
        "__bin",
        F.coalesce("__ne", F.lit(0)).alias("__ne"),
        F.coalesce("__nl", F.lit(0)).alias("__nl"),
    )
    wtot = Window.partitionBy(*keys)
    pe = (F.col("__ne") + 1).cast("double") / (
        F.sum("__ne").over(wtot) + F.lit(bins)
    )
    pl = (F.col("__nl") + 1).cast("double") / (
        F.sum("__nl").over(wtot) + F.lit(bins)
    )
    term = (pl - pe) * F.log(pl / pe)
    scored = full.select(
        *keys,
        F.col("__ne"),
        F.col("__nl"),
        F.floor(term * F.lit(1.0e9) + F.lit(0.5)).cast("long").alias("__t9"),
    )
    return scored.groupBy(*keys).agg(
        (F.sum("__t9") / F.lit(1.0e9)).alias("psi"),
        F.sum("__ne").alias("n_early"),
        F.sum("__nl").alias("n_late"),
    )


def bucket_means(
    df: DataFrame,
    value_col: str,
    time_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Per-(key, time-bucket) means with the exact 1e-6 fixed-point
    contract — returns ``(keys…, __b BIGINT, __m DOUBLE)``.

    Values are floor-quantized to 1e-6 BIGINTs so the per-bucket sum is an
    EXACT integer in any summation order, and the mean is the fixed chain
    ``(sum::DOUBLE / count) / 1e6`` — mirrored verbatim by the SQL oracles.
    The shared pre-aggregation grid for the trend/smoothing family
    (theil_sen, timeops.ewma): bucket first, THEN run the quadratic or
    recursive step over the bounded grid.
    """
    keys = keys or []
    t = F.col(time_col).cast("double")
    q = F.floor(F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)).cast(
        "long"
    )
    return (
        df.select(
            *keys, F.floor(t / bucket_seconds).cast("long").alias("__b"), q.alias("__q")
        )
        .groupBy(*keys, "__b")
        .agg(
            ((F.sum("__q").cast("double") / F.count(F.lit(1))) / F.lit(1.0e6)).alias(
                "__m"
            )
        )
    )


def theil_sen(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: list[str] | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Theil–Sen robust trend estimator per series: the MEDIAN of all
    pairwise slopes between time-bucket means — up to ~29% outlier
    contamination cannot move it, unlike the OLS slope.

    Rows are first reduced to per-(key, bucket) means (exact 1e-6
    fixed-point integer sums, so the means are engine-deterministic), then
    all bucket pairs (i < j) yield slopes ``(m_j − m_i) / (j − i)`` in
    value-units per bucket, and the median is taken WITHOUT interpolation
    ambiguity: the one (n odd) or two (n even) middle elements are picked
    by row_number and averaged — every step is a single IEEE op, so no
    quantization of the result is needed.

    Scale shape: the pairwise self-join is quadratic in BUCKETS PER KEY,
    never in rows — the operator contract is the same as
    ``seasonal_decompose``'s: pre-aggregate to a bounded grid (the default
    daily bucket bounds a year of data at 366 points → ~67k pairs per
    key).  For multi-year spans pass a coarser ``bucket_seconds``.  One
    combinable groupBy, one keyed self-join over the bucket grid, two
    windows over the pair frame.
    """
    keys = keys or []
    daily = bucket_means(df, value_col, time_col, keys, bucket_seconds)
    a = daily.select(*keys, F.col("__b").alias("__ba"), F.col("__m").alias("__ma"))
    b = daily.select(*keys, F.col("__b").alias("__bb"), F.col("__m").alias("__mb"))
    pairs = a.join(b, keys if keys else None) if keys else a.crossJoin(b)
    pairs = pairs.filter(F.col("__ba") < F.col("__bb")).select(
        *keys,
        (
            (F.col("__mb") - F.col("__ma"))
            / (F.col("__bb") - F.col("__ba")).cast("double")
        ).alias("__s"),
    )
    wn = Window.partitionBy(*keys)
    wr = Window.partitionBy(*keys).orderBy("__s")
    ranked = pairs.select(
        *keys,
        "__s",
        F.row_number().over(wr).alias("__rn"),
        F.count(F.lit(1)).over(wn).alias("__n"),
    )
    mid = ranked.filter(
        (F.col("__rn") == F.floor((F.col("__n") + 1) / 2))
        | (F.col("__rn") == F.floor(F.col("__n") / 2) + 1)
    )
    return mid.groupBy(*keys).agg(
        (F.sum("__s") / F.count(F.lit(1))).alias("slope_med"),
        F.max("__n").alias("n_pairs"),
    )


def mann_kendall(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: list[str] | None = None,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Mann–Kendall monotonic-trend test per series over time-bucket
    means — ``(keys…, s_stat, n_buckets, var_s, z)``.  The nonparametric
    companion to ``theil_sen``: S = Σ_{i<j} sign(m_j − m_i) counts
    concordant minus discordant bucket pairs (a pure INTEGER, so the test
    statistic itself is trivially engine-exact); the normal approximation
    ``Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18`` (tie-corrected)
    and ``z = (S∓1)/√Var(S)`` are fixed chains of single IEEE ops over
    exact integers (sqrt is IEEE-correctly-rounded), mirrored in the SQL
    oracle.

    Ties group on the EXACT bucket means, which are themselves
    deterministic (``bucket_means``' fixed-point contract), so both
    engines see identical tie multiplicities.

    Scale shape: same contract as ``theil_sen`` — quadratic in BUCKETS
    per key (bounded grid), never in rows; one combinable groupBy, one
    keyed self-join, one tie groupBy.
    """
    keys = keys or []
    daily = bucket_means(df, value_col, time_col, keys, bucket_seconds)
    a = daily.select(*keys, F.col("__b").alias("__ba"), F.col("__m").alias("__ma"))
    b = daily.select(*keys, F.col("__b").alias("__bb"), F.col("__m").alias("__mb"))
    pairs = (a.join(b, keys) if keys else a.crossJoin(b)).filter(
        F.col("__ba") < F.col("__bb")
    )
    s = pairs.groupBy(*keys).agg(
        F.sum(F.signum(F.col("__mb") - F.col("__ma")).cast("long")).alias("s_stat")
    )
    nb = daily.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_buckets"))
    ties = (
        daily.groupBy(*keys, "__m")
        .agg(F.count(F.lit(1)).alias("__t"))
        .filter(F.col("__t") > 1)
        .groupBy(*keys)
        .agg(
            F.sum(
                F.col("__t") * (F.col("__t") - 1) * (2 * F.col("__t") + 5)
            ).alias("__tc")
        )
    )
    joined = (
        nb.join(s, keys) if keys else nb.crossJoin(s)
    )
    joined = joined.join(ties, keys, "left") if keys else joined.crossJoin(
        F.broadcast(ties.select(F.col("__tc")))
    )
    n = F.col("n_buckets")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.coalesce(F.col("__tc"), F.lit(0)))
        .cast("double")
        / F.lit(18.0)
    )
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1) / F.sqrt(var_s))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return joined.select(
        *keys, "s_stat", "n_buckets", var_s.alias("var_s"), z.alias("z")
    )


def sax_motifs(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_cols: "list[str] | None" = None,
    bucket: str = "1 hour",
    word_len: int = 4,
    alphabet: int = 4,
    top: int = 5,
) -> DataFrame:
    """SAX motif discovery: which short value-shape patterns RECUR in a
    series?  PAA-downsample to per-bucket means, discretize each key's
    buckets into ``alphabet`` rank bands (SAX symbolization — Lin et al.
    2003, the public SAX paper), slide a ``word_len``-symbol window, and
    return each key's ``top`` most frequent words —
    ``(*keys, motif, n_occurrences, rank)``.

    The motif answers "does this telemetry channel have a repeating daily
    ramp / sawtooth / spike-recover signature?" without any FFT or model
    fit — the classic cheap motif detector over billions of points.

    Symbolization here uses per-key RANK bands (``ntile``) instead of the
    paper's Gaussian breakpoints: breakpoints adapt to each key's actual
    distribution, and rank bands are ORDER-determined — no float equality
    across engines, just a total order (see below).  Words span sequence-
    consecutive buckets; a gap in the series simply joins its neighbors
    (documented semantics — gapfill first if strict hourly adjacency
    matters).

    Cross-engine determinism: the PAA mean is CAST(sum_q AS DOUBLE)/cnt
    of e6-quantized BIGINT sums — one correctly-rounded IEEE division of
    exact integers, so both engines order identical doubles; ntile and
    the word/lead windows order by (mean, bucket_ts) — a total order; the
    final per-key rank orders by (count DESC, motif ASC) — total again.

    Scale shape: the data-sized stage is ONE combinable groupBy down to
    (key, bucket) rows.  Every window after it is partitioned BY KEY over
    bucket-count rows (bounded by time-range/bucket, never by row count)
    — the repo's standard two-level pattern for per-key sequence ops.

    Reference parity: no reference counterpart — TSDB analytics extension
    next to seasonal_decompose/value_autocorr (driver brief).
    """
    keys = key_cols or []
    paa = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(
            *keys,
            F.window(F.col(ts_col), bucket)["start"].alias("bucket_ts"),
        )
        .agg(
            F.sum(
                F.floor(F.col(value_col) * F.lit(1.0e6) + F.lit(0.5))
                .cast("long")
            ).alias("__sq"),
            F.count(F.lit(1)).alias("__c"),
        )
        .select(
            *keys,
            "bucket_ts",
            (F.col("__sq").cast("double") / F.col("__c")).alias("__mean"),
        )
    )
    wsym = Window.partitionBy(*keys).orderBy(
        F.col("__mean").asc(), F.col("bucket_ts").asc()
    )
    sym = paa.select(
        *keys, "bucket_ts", F.ntile(alphabet).over(wsym).alias("__s")
    )
    wseq = Window.partitionBy(*keys).orderBy(F.col("bucket_ts").asc())
    parts = [
        F.lead(F.col("__s"), i).over(wseq).cast("string")
        for i in range(1, word_len)
    ]
    words = sym.select(
        *keys,
        F.concat_ws("", F.col("__s").cast("string"), *parts).alias("motif"),
        parts[-1].isNotNull().alias("__full"),
    ).filter(F.col("__full"))
    counts = words.groupBy(*keys, "motif").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    wrank = Window.partitionBy(*keys).orderBy(
        F.col("n_occurrences").desc(), F.col("motif").asc()
    )
    return (
        counts.select(
            *keys, "motif", "n_occurrences",
            F.row_number().over(wrank).alias("rank"),
        )
        .filter(F.col("rank") <= top)
    )


def esd_outliers(
    df: DataFrame,
    value_col: str = "value",
    key_cols: "list[str] | None" = None,
    k: int = 3,
) -> DataFrame:
    """Generalized-ESD outlier rounds (Rosner 1983): per key, iteratively
    remove the single most mean-deviant value and report each round —
    ``(*keys, round, value, r_stat, n_before)``.  ``r_stat`` is Rosner's
    Rᵢ = max|x − mean|/s over the set BEFORE the removal; compare against
    the λᵢ critical values offline to pick the anomaly count.

    The textbook algorithm is sequential (mean/std change after every
    removal) and naively needs k full passes.  This implementation does
    it in ONE scan + closed-form updates, exactly:

    * the argmax of |x − mean| is ALWAYS an extreme of the remaining
      values (|x − m| is maximized at an endpoint of the value range), so
      across all k rounds only the k smallest ∪ k largest values per key
      can ever be removed;
    * one combinable aggregation gets (n, Σq, Σq²); a per-key window over
      the scan pivots the 2k candidate extremes into bounded columns;
    * the k rounds then unroll into pure column arithmetic — each removal
      updates n ← n−1, Σq ← Σq−q, Σq² ← Σq²−q² in closed form.

    Exactness: values are e3-quantized BIGINTs; the round's argmax choice
    compares the INTEGER deviations n·q − Σq (no floats anywhere in the
    decision; ties pick the high side); Σq² is summed as DECIMAL(38,0)
    (engine-exact, overflow-free to ~10⁹ rows/key at |value| ≤ 5·10⁵
    quantized); Rᵢ is one fixed IEEE chain over those exact integers,
    rounded to 6 dp.  Rounds stop (emit nothing) once n < 3 or the
    remaining variance is zero.

    Scale shape: one scan → combinable agg + per-key top/bottom-k window
    (the candidate pivot), then k·O(1) arithmetic per key.  No driver
    loop, no repeated scans, no data-sized windows beyond the standard
    per-key extremes rank.

    Reference parity: no reference counterpart — anomaly-detection
    extension next to mad_outliers/cusum (driver brief).
    """
    keys = key_cols or []
    q = F.floor(F.col(value_col) * F.lit(1.0e3) + F.lit(0.5)).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        *keys, q.alias("__q")
    )
    aggs = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__q").alias("__s"),
        F.sum((F.col("__q") * F.col("__q")).cast("decimal(38,0)"))
        .alias("__ss"),
    )
    wlo = Window.partitionBy(*keys).orderBy(F.col("__q").asc())
    whi = Window.partitionBy(*keys).orderBy(F.col("__q").desc())
    cands = (
        base.withColumn("__rlo", F.row_number().over(wlo))
        .withColumn("__rhi", F.row_number().over(whi))
        .filter((F.col("__rlo") <= k) | (F.col("__rhi") <= k))
    )
    pivot = cands.groupBy(*keys).agg(
        *[
            F.max(F.when(F.col("__rlo") == i, F.col("__q"))).alias(f"__lo{i}")
            for i in range(1, k + 1)
        ],
        *[
            F.max(F.when(F.col("__rhi") == i, F.col("__q"))).alias(f"__hi{i}")
            for i in range(1, k + 1)
        ],
    )
    st = aggs.join(pivot, keys) if keys else aggs.crossJoin(pivot)
    # Each round's closed-form state is MATERIALIZED as projected columns
    # (one select per round) instead of one giant nested expression: the
    # single-expression unroll embedded round r−1's whole tree many times
    # over (n/s/ss each appear in dev, var, r_stat, ok AND the next
    # round's updates), so plan size — and Catalyst analysis time — grew
    # exponentially in k (measured ~3.8 s of the 4.3 s query at k=3 was
    # driver planning).  Column refs between selects keep the tree linear
    # in k; CollapseProject leaves multi-use aliases alone, so the
    # optimizer cannot re-inline the blowup.  Identical arithmetic.
    lo_cols = [f"__lo{i}" for i in range(1, k + 1)]
    hi_cols = [f"__hi{i}" for i in range(1, k + 1)]
    st = st.select(
        *keys, "__n", "__s", "__ss", *lo_cols, *hi_cols,
        F.lit(1).alias("__ilo"), F.lit(1).alias("__ihi"),
    )
    ecols: "list[str]" = []
    for r in range(1, k + 1):
        n, s, ss = F.col("__n"), F.col("__s"), F.col("__ss")
        i_lo, i_hi = F.col("__ilo"), F.col("__ihi")
        lo_q = F.lit(None).cast("long")
        hi_q = F.lit(None).cast("long")
        for i in range(k, 0, -1):
            lo_q = F.when(i_lo == i, F.col(f"__lo{i}")).otherwise(lo_q)
            hi_q = F.when(i_hi == i, F.col(f"__hi{i}")).otherwise(hi_q)
        dev_lo = s - lo_q * n
        dev_hi = hi_q * n - s
        take_hi = dev_hi >= dev_lo
        rem_q = F.when(take_hi, hi_q).otherwise(lo_q)
        dev = F.greatest(dev_hi, dev_lo)
        var_num = ss.cast("double") - s.cast("double") * s.cast("double") / n
        ok = (n >= 3) & (var_num > 0)
        r_stat = F.round(
            (dev.cast("double") / n) / F.sqrt(var_num / (n - F.lit(1))), 6
        )
        st = st.select(
            *keys, *lo_cols, *hi_cols, *ecols,
            F.when(
                ok,
                F.struct(
                    F.lit(r).alias("round"),
                    (rem_q.cast("double") / F.lit(1.0e3)).alias("value"),
                    r_stat.alias("r_stat"),
                    n.cast("long").alias("n_before"),
                ),
            ).alias(f"__e{r}"),
            # closed-form removal update (guarded so later rounds see
            # frozen state once emission stopped — matches the oracle)
            F.when(ok, n - 1).otherwise(n).alias("__n"),
            F.when(ok, s - rem_q).otherwise(s).alias("__s"),
            F.when(ok, ss - (rem_q * rem_q).cast("decimal(38,0)"))
            .otherwise(ss).alias("__ss"),
            F.when(ok & ~take_hi, i_lo + 1).otherwise(i_lo).alias("__ilo"),
            F.when(ok & take_hi, i_hi + 1).otherwise(i_hi).alias("__ihi"),
        )
        ecols.append(f"__e{r}")
    out = st.select(
        *keys,
        F.explode(
            F.filter(
                F.array(*[F.col(c) for c in ecols]), lambda x: x.isNotNull()
            )
        ).alias("__e"),
    )
    return out.select(
        *keys,
        F.col("__e.round").alias("round"),
        F.col("__e.value").alias("value"),
        F.col("__e.r_stat").alias("r_stat"),
        F.col("__e.n_before").alias("n_before"),
    )


def _int_bucket_means(
    df: DataFrame,
    value_col: str,
    time_col: str,
    keys: "list[str]",
    bucket_seconds: int,
) -> DataFrame:
    """Per-(key, bucket) INTEGER e6 means — ``(keys…, __b, __m BIGINT)``.

    Like :func:`bucket_means` but the mean itself is an integer (the e6
    sum divided with truncation toward zero), so downstream prefix sums
    and squared terms stay engine-exact.  The truncating division is
    spelled sign-safely (``sign · (|s| DIV c)``) because Spark's ``DIV``
    truncates toward zero while other engines' integer division may
    floor — on non-negative operands every engine agrees.
    """
    t = F.col(time_col).cast("double")
    q = F.floor(F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)).cast(
        "long"
    )
    g = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *keys,
            F.floor(t / bucket_seconds).cast("long").alias("__b"),
            q.alias("__q"),
        )
        .groupBy(*keys, "__b")
        .agg(F.sum("__q").alias("__s"), F.count(F.lit(1)).alias("__c"))
    )
    m = F.when(
        F.col("__s") < 0, -F.expr("(-__s) DIV __c")
    ).otherwise(F.expr("__s DIV __c"))
    return g.select(*keys, "__b", m.alias("__m"))


def _best_split(grid: DataFrame, part: "list[str]", min_seg: int) -> DataFrame:
    """Best single changepoint per partition of the integer-mean grid:
    ``(part…, split_bucket, n_left, n_right, gain)``.

    For a split after position i the SSE reduction is
    ``P_i²/i + (S−P_i)²/(T−i) − S²/T``; the argmax over i needs only
    ``A(i) = P_i²(T−i) + (S−P_i)²·i`` over denominator ``i(T−i)``.  Both
    are computed from EXACT integer prefix sums (DECIMAL(38,0) squares —
    overflow-free to ~10⁴ buckets at |mean| ≤ 10³), and the comparison
    key ``A/d`` is ONE IEEE division of exactly-cast operands — correctly
    rounded, so every engine orders candidates identically; ties take the
    earliest split.  All windows run over bucket-count rows per key.
    """
    wseq = Window.partitionBy(*part).orderBy("__b")
    wall = Window.partitionBy(*part)
    g = (
        grid.withColumn("__i", F.row_number().over(wseq))
        .withColumn(
            "__P",
            F.sum("__m").over(
                wseq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .withColumn("__T", F.count(F.lit(1)).over(wall))
        .withColumn("__S", F.sum("__m").over(wall))
    )
    cand = g.filter(
        (F.col("__i") >= min_seg) & (F.col("__i") <= F.col("__T") - min_seg)
    )
    pd_ = F.col("__P").cast("decimal(38,0)")
    rd = (F.col("__S") - F.col("__P")).cast("decimal(38,0)")
    a = pd_ * pd_ * (F.col("__T") - F.col("__i")).cast("decimal(38,0)") + (
        rd * rd * F.col("__i").cast("decimal(38,0)")
    )
    d = (F.col("__i") * (F.col("__T") - F.col("__i"))).cast("double")
    scored = cand.withColumn("__score", a.cast("double") / d)
    wpick = Window.partitionBy(*part).orderBy(
        F.col("__score").desc(), F.col("__i").asc()
    )
    best = scored.withColumn("__r", F.row_number().over(wpick)).filter(
        F.col("__r") == 1
    )
    sdbl = F.col("__S").cast("double")
    gain = F.round(
        (F.col("__score") - sdbl * sdbl / F.col("__T").cast("double"))
        / F.lit(1.0e12),
        6,
    )
    return best.select(
        *part,
        F.col("__b").alias("split_bucket"),
        F.col("__i").cast("long").alias("n_left"),
        (F.col("__T") - F.col("__i")).cast("long").alias("n_right"),
        gain.alias("gain"),
    )


def binseg_changepoints(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: "list[str] | None" = None,
    bucket_seconds: int = 3600,
    min_seg: int = 2,
) -> DataFrame:
    """Binary-segmentation changepoint detection (Scott & Knott 1974 —
    the classic top-down CPD) per key over the bucketed mean series —
    ``(keys…, level, segment, split_bucket, n_left, n_right, gain)``.

    Level 1 is the best mean-shift split of the whole series; level 2
    re-splits each resulting half (segment 0 = left, 1 = right) — three
    changepoints max, the standard depth-2 unroll.  ``gain`` is the SSE
    reduction of the bucket-mean series in value² units (e6 quantization
    divided back out), rounded to 6 dp.

    Exactness: the series is the INTEGER e6 bucket mean, prefix sums are
    exact BIGINTs, the argmax key is one IEEE division of exactly-cast
    DECIMAL(38,0) operands — deterministic in any engine, ties to the
    earliest position.  Scale shape: one fact scan → combinable
    per-bucket agg (the grid is localCheckpoint'ed so level 2 reuses it
    without a second scan); every window is per-key over BUCKET-count
    rows (hours/days), never data-sized.

    Reference parity: no reference counterpart — changepoint extension
    next to cusum/esd_outliers (driver brief).
    """
    keys = keys or []
    grid = _int_bucket_means(df, value_col, time_col, keys, bucket_seconds)
    grid = grid.localCheckpoint(eager=True)
    l1 = _best_split(grid, keys, min_seg)
    out1 = l1.select(
        *keys,
        F.lit(1).alias("level"),
        F.lit(0).alias("segment"),
        "split_bucket",
        "n_left",
        "n_right",
        "gain",
    )
    splits = l1.select(*keys, F.col("split_bucket").alias("__cut"))
    segged = grid.join(F.broadcast(splits), keys, "inner").withColumn(
        "__seg", F.when(F.col("__b") <= F.col("__cut"), F.lit(0)).otherwise(F.lit(1))
    )
    l2 = _best_split(segged, [*keys, "__seg"], min_seg)
    out2 = l2.select(
        *keys,
        F.lit(2).alias("level"),
        F.col("__seg").alias("segment"),
        "split_bucket",
        "n_left",
        "n_right",
        "gain",
    )
    return out1.unionByName(out2)


def cross_corr(
    df: DataFrame,
    series_col: str,
    series_a: str,
    series_b: str,
    value_col: str = "value",
    time_col: str = "ts",
    bucket_seconds: int = 3600,
    max_lag: int = 3,
) -> DataFrame:
    """Lead–lag cross-correlation between two series of one long table:
    Pearson r between bucket means of ``series_a`` at time t and
    ``series_b`` at time t+lag, for every lag in [−max_lag, +max_lag] —
    ``(lag, n_overlap, corr)``.  A positive best lag means A LEADS B —
    the does-views-today-predict-purchases-tomorrow question.

    Exactness: bucket means are INTEGER e6 (see ``_int_bucket_means``);
    per lag the Pearson pieces (n, Σa, Σb, Σab, Σa², Σb²) are exact
    integer sums (products in DECIMAL(38,0)); r is then numerator /
    (√da·√db) — three correctly-rounded IEEE ops over exactly-cast
    integers, identical in any engine, rounded to 6 dp.  Zero-variance
    lags yield NULL.

    Scale shape: the fact collapses to two bucket grids first; the lag
    join and the Pearson agg run over BUCKET-count rows (the 7-way lag
    fan-out is on the grid, not the fact).
    """
    base = df.filter(F.col(series_col).isin([series_a, series_b]))
    ga = _int_bucket_means(
        base.filter(F.col(series_col) == series_a),
        value_col, time_col, [], bucket_seconds,
    ).select(F.col("__b").alias("__ba"), F.col("__m").alias("__ma"))
    gb = _int_bucket_means(
        base.filter(F.col(series_col) == series_b),
        value_col, time_col, [], bucket_seconds,
    ).select(F.col("__b").alias("__bb"), F.col("__m").alias("__mb"))
    lags = ga.sparkSession.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("long").alias("lag")
    )
    j = ga.crossJoin(F.broadcast(lags)).join(
        gb, F.col("__bb") == F.col("__ba") + F.col("lag"), "inner"
    )
    dec = "decimal(38,0)"
    agg = j.groupBy("lag").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__ma").alias("__sa"),
        F.sum("__mb").alias("__sb"),
        F.sum((F.col("__ma").cast(dec) * F.col("__mb"))).alias("__sab"),
        F.sum((F.col("__ma").cast(dec) * F.col("__ma"))).alias("__saa"),
        F.sum((F.col("__mb").cast(dec) * F.col("__mb"))).alias("__sbb"),
    )
    n = F.col("__n").cast(dec)
    num = n * F.col("__sab") - F.col("__sa").cast(dec) * F.col("__sb")
    da = n * F.col("__saa") - F.col("__sa").cast(dec) * F.col("__sa")
    db = n * F.col("__sbb") - F.col("__sb").cast(dec) * F.col("__sb")
    corr = F.when(
        (da > 0) & (db > 0),
        F.round(
            num.cast("double")
            / (F.sqrt(da.cast("double")) * F.sqrt(db.cast("double"))),
            6,
        ),
    )
    return agg.select(
        "lag", F.col("__n").cast("long").alias("n_overlap"), corr.alias("corr")
    ).orderBy("lag")


def ols_trend(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: "list[str] | None" = None,
) -> DataFrame:
    """Per-key ordinary-least-squares trend line — ``(keys…, n, slope,
    intercept, r2)`` with slope in value-units per DAY.  The classic
    "fit a trend per series" verb: theil_sen is the robust/outlier-proof
    sibling, mann_kendall the significance test; OLS is what dashboards
    draw.

    Exactness: x is the exact integer SECOND within the key's own span
    (epoch − per-key min, so the x² sums stay small), y the e6-quantized
    value; the five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) are exact
    DECIMAL(38,0) integers (overflow-free to ~10⁹ rows/key over a
    30-year span), and slope/intercept/R² are fixed IEEE chains over
    their exact-cast values, rounded to 6 dp.  Degenerate keys (n < 2 or
    zero x-variance) yield NULL slope/intercept/r2.

    Scale shape: one keyed min-aggregate broadcast back (the span
    anchor), then ONE combinable groupBy — no window, no sort, no
    second scan of the fact beyond the anchor join.
    """
    keys = keys or []
    t = F.col(time_col).cast("double")
    qy = F.floor(F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)).cast(
        "long"
    )
    base = df.filter(F.col(value_col).isNotNull()).select(
        *keys, t.alias("__t"), qy.alias("__y")
    )
    if keys:
        anchor = base.groupBy(*keys).agg(F.min("__t").alias("__t0"))
        base = base.join(F.broadcast(anchor), keys)
    else:
        anchor = base.agg(F.min("__t").alias("__t0"))
        base = base.crossJoin(F.broadcast(anchor))
    x = F.floor(F.col("__t") - F.col("__t0")).cast("long")
    dec = "decimal(38,0)"
    agg = base.select(*keys, x.alias("__x"), "__y").groupBy(*keys).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("__x").cast(dec)).alias("__sx"),
        F.sum(F.col("__y").cast(dec)).alias("__sy"),
        F.sum(F.col("__x").cast(dec) * F.col("__y")).alias("__sxy"),
        F.sum(F.col("__x").cast(dec) * F.col("__x")).alias("__sxx"),
        F.sum(F.col("__y").cast(dec) * F.col("__y")).alias("__syy"),
    )
    n = F.col("__n").cast(dec)
    dxx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dyy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    dxy = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    ok = (F.col("__n") >= 2) & (dxx > 0)
    slope_sec = dxy.cast("double") / dxx.cast("double")  # e6-units per second
    slope = F.when(ok, F.round(slope_sec * F.lit(86400.0) / F.lit(1.0e6), 6))
    intercept = F.when(
        ok,
        F.round(
            (
                F.col("__sy").cast("double") / F.col("__n").cast("double")
                - slope_sec
                * (F.col("__sx").cast("double") / F.col("__n").cast("double"))
            )
            / F.lit(1.0e6),
            6,
        ),
    )
    r2 = F.when(
        ok & (dyy > 0),
        F.round(
            (dxy.cast("double") * dxy.cast("double"))
            / (dxx.cast("double") * dyy.cast("double")),
            6,
        ),
    )
    return agg.select(
        *keys,
        F.col("__n").cast("long").alias("n"),
        slope.alias("slope_per_day"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    )


def decomposition_strength(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: "list[str] | None" = None,
    trend_window_seconds: int = 86400,
    season_unit: str = "hour",
) -> DataFrame:
    """Seasonal / trend STRENGTH per series (Hyndman & Athanasopoulos,
    FPP3 §4.4) — per key ``(keys…, n, strength_seasonal,
    strength_trend)``: ``1 − Var(R)/Var(S+R)`` and ``1 − Var(R)/Var(T+R)``
    clamped at 0, from the seasonal_decompose components.  The one-number
    readout of the decomposition: strength_seasonal ≈ 0 means the
    hour-of-day profile is noise (drop the seasonal model), ≈ 1 means the
    series is all calendar; likewise for trend — the triage that decides
    between holt_winters_forecast and a flat ewma_level.

    Exactness: the decomposition's seasonal/residual are already
    4 dp-rounded doubles (exact e4 integers) and its trend chain is
    bit-deterministic, so (S+R), R and (T+R) are e4-floor-quantized
    BIGINTs whose variance moments are exact DECIMAL(38,0); each
    strength is one fixed IEEE chain, rounded 6 dp; NULL when the
    denominator variance is 0.

    Scale shape: seasonal_decompose's own shape (bucket-grid windows,
    bounded profiles) plus ONE combinable per-key moment aggregate.

    Reference parity: no reference counterpart — time-series extension
    next to seasonal_decompose (driver brief).
    """
    keys = keys or []
    dec = "decimal(38,0)"
    comp = seasonal_decompose(
        df, value_col, time_col, keys, trend_window_seconds, season_unit
    )

    def q4(c):
        return F.floor(c * F.lit(1.0e4) + F.lit(0.5)).cast("long")

    base = comp.select(
        *keys,
        q4(F.col("seasonal") + F.col("residual")).alias("__sr"),
        q4(F.col("residual")).alias("__r"),
        q4(F.col("trend") + F.col("residual")).alias("__tr"),
    )

    def moments(c_, pre):
        return [
            F.sum(F.col(c_).cast(dec)).alias(f"__{pre}s"),
            F.sum(F.col(c_).cast(dec) * F.col(c_)).alias(f"__{pre}ss"),
        ]

    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *moments("__sr", "a"),
        *moments("__r", "b"),
        *moments("__tr", "c"),
    )
    n = F.col("n").cast(dec)

    def var_num(pre):
        return n * F.col(f"__{pre}ss") - F.col(f"__{pre}s") * F.col(
            f"__{pre}s"
        )

    def strength(den_pre):
        den = var_num(den_pre)
        return F.when(
            den > 0,
            F.round(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0)
                    - var_num("b").cast("double") / den.cast("double"),
                ),
                6,
            ),
        )

    return agg.select(
        *keys,
        "n",
        strength("a").alias("strength_seasonal"),
        strength("c").alias("strength_trend"),
    )


def forecast_backtest(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: "list[str] | None" = None,
    season_buckets: int = 24,
) -> DataFrame:
    """Seasonal-naive forecast backtest per series — per key ``(keys…,
    n_scored, mae_seasonal, mae_naive, mase, smape)``: score the
    standard seasonal-naive forecaster (ŷ_b = y_{b−24}) against the
    hourly bucket actuals, with the plain naive (ŷ_b = y_{b−1}) as the
    scaling baseline.  MASE = MAE_seasonal/MAE_naive (Hyndman &
    Koehler 2006) is the scale-free go/no-go: MASE ≥ 1 means the
    calendar buys nothing and holt_winters_forecast is wasted compute;
    sMAPE is the percentage-style companion.  Buckets missing either
    lag are excluded from that metric's numerator AND denominator.

    Exactness: bucket means are exact rationals of e2 integer sums;
    each per-bucket error term (|e|, the sMAPE ratio) is e6-floor-
    REquantized from one identical IEEE chain, so the cross-bucket sums
    are order-free integers; final metrics are single divisions,
    rounded 6 dp.

    Scale shape: one combinable per-bucket aggregate over the fact (the
    only data-sized stage), two lag windows over the per-key BUCKET
    grid (calendar-bounded, never data-sized), one per-key reduce.

    Reference parity: no reference counterpart — forecast-evaluation
    extension next to holt_forecast_check (driver brief).
    """
    from pyspark.sql import Window

    keys = keys or []
    dec = "decimal(38,0)"
    sec = F.col(time_col).cast("long")
    v_e2 = F.round(F.col(value_col).cast("double") * 100).cast("long")
    hourly = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, F.floor(sec / 3600).alias("__b"))
        .agg(
            F.sum(v_e2).cast(dec).alias("__s"),
            F.count(F.lit(1)).cast(dec).alias("__c"),
        )
    )
    w = Window.partitionBy(*keys).orderBy("__b")
    # calendar-bounded per-key bucket grid; lag rows must be the ADJACENT
    # bucket numbers, not just the previous grid row
    g = hourly.select(
        *keys,
        "__b",
        (F.col("__s").cast("double") / F.col("__c").cast("double")).alias(
            "__y"
        ),
    )
    lag1 = F.when(
        F.lag("__b", 1).over(w) == F.col("__b") - 1,
        F.lag("__y", 1).over(w),
    )
    lagS = F.when(
        F.lag("__b", season_buckets).over(w)
        == F.col("__b") - season_buckets,
        F.lag("__y", season_buckets).over(w),
    )
    scored = g.select(
        *keys,
        "__y",
        lag1.alias("__p1"),
        lagS.alias("__ps"),
    )

    def q6(c):
        return F.floor(c * F.lit(1.0e6) + F.lit(0.5)).cast("long")

    es = F.when(
        F.col("__ps").isNotNull(), q6(F.abs(F.col("__y") - F.col("__ps")))
    )
    e1 = F.when(
        F.col("__p1").isNotNull(), q6(F.abs(F.col("__y") - F.col("__p1")))
    )
    smape_t = F.when(
        F.col("__ps").isNotNull()
        & ((F.abs(F.col("__y")) + F.abs(F.col("__ps"))) > 0),
        q6(
            F.lit(2.0)
            * F.abs(F.col("__y") - F.col("__ps"))
            / (F.abs(F.col("__y")) + F.abs(F.col("__ps")))
        ),
    )
    agg = scored.groupBy(*keys).agg(
        F.count("__ps").cast("long").alias("n_scored"),
        F.sum(es.cast(dec)).alias("__es"),
        F.count("__p1").cast("long").alias("__n1"),
        F.sum(e1.cast(dec)).alias("__e1"),
        F.count(smape_t).cast("long").alias("__nsm"),
        F.sum(smape_t.cast(dec)).alias("__sm"),
    )
    mae_s = F.col("__es").cast("double") / F.col("n_scored").cast(
        "double"
    ) / F.lit(1.0e6)
    mae_1 = F.col("__e1").cast("double") / F.col("__n1").cast(
        "double"
    ) / F.lit(1.0e6)
    return agg.select(
        *keys,
        "n_scored",
        F.when(F.col("n_scored") > 0, F.round(mae_s, 6)).alias(
            "mae_seasonal"
        ),
        F.when(F.col("__n1") > 0, F.round(mae_1, 6)).alias("mae_naive"),
        F.when(
            (F.col("n_scored") > 0) & (F.col("__n1") > 0) & (F.col("__e1") > 0),
            F.round(mae_s / mae_1, 6),
        ).alias("mase"),
        F.when(
            F.col("__nsm") > 0,
            F.round(
                F.col("__sm").cast("double")
                / F.col("__nsm").cast("double")
                / F.lit(1.0e6),
                6,
            ),
        ).alias("smape"),
    )
