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

    Implemented as ``groupBy(key).agg(min_by(struct(others), tiebreak))``
    rather than a row_number window: the aggregate is map-side combinable, so
    the shuffle moves one row per key instead of every row followed by a
    per-key sort — strictly less data movement at 100 TB.  (Requires a unique
    ``tiebreak`` per key group, e.g. an event id, for determinism.)
    """
    part = (keys or []) + [time_col]
    if tiebreak is None:
        return df.dropDuplicates(part)
    others = [c for c in df.columns if c not in part]
    out = df.groupBy(*part).agg(
        F.min_by(F.struct(*[F.col(c) for c in others]), F.col(tiebreak)).alias("__s")
    )
    return out.select(*part, "__s.*").select(*df.columns)


def filter_time_range(
    df: DataFrame,
    start: str | dt.datetime | None,
    end: str | dt.datetime | None,
    time_col: str = "ts",
) -> DataFrame:
    """T10 — keep ``start <= ts <= end`` (reference `tools.py:179-183`).
    Inclusive bounds, matching the reference's closed interval.

    Declarative filter → Catalyst pushes it into the parquet scan (partition
    pruning + row-group min/max skipping at scale).  When the loader kept a
    raw nanosecond twin column (``{time_col}__ns``), an equivalent predicate
    on it is added as well — the raw-column comparison is what actually
    reaches ``PushedFilters`` (the converted column is a derived expression
    Catalyst cannot push)."""
    raw = f"{time_col}__ns"
    has_raw = raw in df.columns

    def _ns(bound) -> int:
        # Integer arithmetic throughout: float timestamp()*1e6 can land 1 µs
        # low (double resolution ~0.24 µs at current epochs), which would
        # silently drop rows lying exactly on a closed-interval bound.  Aware
        # non-UTC datetimes are CONVERTED (astimezone), not reinterpreted.
        if isinstance(bound, str):
            bound = dt.datetime.fromisoformat(bound)
        if bound.tzinfo is None:
            bound = bound.replace(tzinfo=dt.timezone.utc)
        else:
            bound = bound.astimezone(dt.timezone.utc)
        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        delta = bound - epoch
        secs = delta.days * 86400 + delta.seconds
        return (secs * 1_000_000 + delta.microseconds) * 1000

    if start is not None:
        df = df.filter(F.col(time_col) >= F.lit(start).cast("timestamp"))
        if has_raw:
            df = df.filter(F.col(raw) >= F.lit(_ns(start)))
    if end is not None:
        df = df.filter(F.col(time_col) <= F.lit(end).cast("timestamp"))
        if has_raw:
            # converted time truncates ns→µs, so the raw bound must cover the
            # truncated tail: end µs + 999 ns still truncates inside the bound
            df = df.filter(F.col(raw) <= F.lit(_ns(end) + 999))
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


_ROLL_AGGS = {"avg": F.avg, "max": F.max, "min": F.min, "sum": F.sum}


def rolling_by_time(
    df: DataFrame,
    specs: dict[str, tuple[str, str, int]],
    time_col: str = "ts",
    partition_by: list[str] | None = None,
    scale_bucket_seconds: int | None = None,
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

    Physical-plan shape: the order key is materialized once and every window
    expression is emitted in a single ``select`` — Catalyst's CollapseWindow
    then merges same-frame aggregates, giving one Window operator per distinct
    frame over ONE sort (vs. one sort per aggregate if chained via
    ``withColumn`` with per-call order expressions).

    Scale paths:
    - ``partition_by`` (station / device / series id): each series windows
      independently — the natural key for multi-series data.
    - ``scale_bucket_seconds`` (single global series): EXACT parallel rolling
      windows via overlap buckets.  Rows are hashed into time buckets of this
      width (must be ≥ the largest window); rows within max-window of a bucket
      end are also copied into the next bucket as context-only rows, windows
      are computed per bucket in parallel, and context rows are dropped from
      the output.  Turns the all-rows-to-one-task global sort into
      #buckets-way parallelism at the cost of duplicating a boundary fraction
      (≤ max_window/bucket_width) of rows.
    """
    order_col = "__roll_ord"
    out = df.withColumn(order_col, F.col(time_col).cast("long"))

    if not partition_by and scale_bucket_seconds is None:
        # keyless default: auto-size the overlap buckets instead of falling
        # into an unpartitioned global window (the round-1 scale trap).
        # 8× the widest window bounds the context-copy duplication at
        # ≤ 12.5% while keeping #buckets ≈ span/8w — plenty of parallelism
        # for any realistic span/window ratio.  Callers can still pin a
        # width explicitly.
        scale_bucket_seconds = 8 * max(s for _, _, s in specs.values())
    if scale_bucket_seconds is not None and not partition_by:
        max_w = max(s for _, _, s in specs.values())
        assert scale_bucket_seconds >= max_w, (
            "bucket width must cover the largest window"
        )
        bucket = F.floor(F.col(order_col) / scale_bucket_seconds)
        in_ctx_zone = (
            F.col(order_col) % scale_bucket_seconds
            >= scale_bucket_seconds - max_w
        )
        # Single-pass bucket assignment: each row explodes into its own bucket
        # plus (when within max_w of the bucket end) a context-only copy in
        # the next bucket.  A union of two branches would compute the entire
        # upstream twice — at 100 TB that is two full scans.
        own = F.struct(bucket.alias("b"), F.lit(False).alias("c"))
        ctx = F.struct((bucket + 1).alias("b"), F.lit(True).alias("c"))
        assign = F.when(in_ctx_zone, F.array(own, ctx)).otherwise(F.array(own))
        exploded = (
            out.select("*", F.explode(assign).alias("__a"))
            .withColumn("__bkt", F.col("__a.b"))
            .withColumn("__ctx", F.col("__a.c"))
            .drop("__a")
        )
        base = Window.partitionBy("__bkt").orderBy(F.col(order_col))
        cols = [
            _ROLL_AGGS[agg](F.col(src))
            .over(base.rangeBetween(-(seconds - 1), 0))
            .alias(out_col)
            for out_col, (agg, src, seconds) in specs.items()
        ]
        return (
            exploded.select("*", *cols)
            .filter(~F.col("__ctx"))
            .drop("__bkt", "__ctx", order_col)
        )

    base = (
        Window.partitionBy(*partition_by).orderBy(F.col(order_col))
        if partition_by
        else Window.orderBy(F.col(order_col))
    )
    cols = [
        _ROLL_AGGS[agg](F.col(src))
        .over(base.rangeBetween(-(seconds - 1), 0))
        .alias(out_col)
        for out_col, (agg, src, seconds) in specs.items()
    ]
    return out.select("*", *cols).drop(order_col)


def hwm_advance(df: DataFrame, time_col: str = "ts") -> dt.datetime | None:
    """T22 — incremental high-water-mark (reference `lco.py:116-122`:
    start_time = max(ts) of last batch, truncated to seconds).  Used by the
    polling connectors; in Structured Streaming the checkpoint owns this."""
    row = df.select(F.date_trunc("second", F.max(time_col)).alias("hwm")).first()
    return row["hwm"] if row else None


def window_funnel(
    df: DataFrame,
    step_predicates: list[Column],
    time_col: str = "ts",
    keys: list[str] | None = None,
    window_seconds: int = 86400,
) -> DataFrame:
    """Ordered multi-step funnel (the ClickHouse ``windowFunnel`` shape,
    anchored at the FIRST step-1 event): per key, how deep into the
    ordered step sequence did events progress, where every later step must
    occur strictly after the previous step's match and within
    ``window_seconds`` of the step-1 anchor.

    Returns ``(keys…, level INT, t1)``: ``level`` = number of steps
    matched (≥1 — keys with no step-1 event are absent), ``t1`` the
    anchor time.  "Anchored at first" is the deterministic greedy variant:
    a single canonical chain per key (min-aggregates all the way down), so
    the result is engine-exact with no tie ambiguity — ClickHouse's
    any-chain-start semantics would need per-key event arrays.

    Scale shape: one filtered scan + combinable min-groupBy PER STEP
    (filters push to parquet; each step frame is key-sized), chained with
    equi-joins on the key — co-partitioned shuffles, no self-join of the
    fact table against itself and no per-key arrays.  Step count is the
    (small, fixed) funnel depth.

    Reference parity: no reference counterpart — product-analytics
    extension next to sessionize/retention.
    """
    keys = keys or ["user_id"]
    t = F.col(time_col)
    cur = (
        df.filter(step_predicates[0])
        .groupBy(*keys)
        .agg(F.min(t).alias("t1"))
    )
    frames = [cur]
    for i, pred in enumerate(step_predicates[1:], start=2):
        prev_t = f"t{i - 1}"
        nxt = (
            df.filter(pred)
            .join(frames[-1], keys)
            .filter(
                (t > F.col(prev_t))
                & (
                    t
                    <= F.col("t1")
                    + F.expr(f"INTERVAL {int(window_seconds)} SECONDS")
                )
            )
            .groupBy(*keys)
            .agg(F.min(t).alias(f"t{i}"), F.min("t1").alias("t1"))
        )
        frames.append(nxt)
    out = frames[0]
    for i, fr in enumerate(frames[1:], start=2):
        out = out.join(
            fr.select(*keys, f"t{i}"), keys, "left"
        )
    # deepest matched step wins: each later `when` WRAPS the previous
    # expression, so building shallow→deep leaves the deepest test
    # outermost (building deep→shallow would misclassify level-3 users
    # as level 2)
    level = F.lit(1)
    for i in range(2, len(frames) + 1):
        level = F.when(F.col(f"t{i}").isNotNull(), F.lit(i)).otherwise(level)
    return out.select(
        *keys,
        level.cast("int").alias("level"),
        "t1",
        *[f"t{i}" for i in range(2, len(frames) + 1)],
    )


def ewma(
    df: DataFrame,
    value_col: str = "value",
    time_col: str = "ts",
    keys: list[str] | None = None,
    bucket_seconds: int = 86400,
    alpha: float = 0.3,
) -> DataFrame:
    """Exponentially-weighted moving average per series, over time-bucket
    means — returns ``(keys…, ewma DOUBLE, n_buckets, last_bucket)`` where
    ``ewma`` is the smoothed level after folding all buckets in time
    order (``s ← α·x + (1−α)·s``, seeded with the first bucket's mean).

    Cross-engine determinism: bucket means are exact 1e-6 fixed-point
    integer sums (the theil_sen trick); the recursive fold is evaluated
    over ONE explicitly sorted per-key array with identical operation
    order on both engines (``F.aggregate`` over ``array_sort(collect_list)``
    ⇄ DuckDB ``list_reduce(list(m ORDER BY b))`` — the SCALE_NOTES sorted-
    fold rule), so the result is bit-identical with no output rounding.

    Scale shape: one combinable (key, bucket) groupBy, then a per-key
    collect of BUCKET-GRID size (bounded by span/bucket_seconds — the
    seasonal_decompose contract: pre-aggregate to a bounded grid, never
    collect raw rows; a year of daily buckets is 366 elements).  The fold
    itself is JVM-side (``F.aggregate``), no Python in the plan.
    """
    from cerebro_spark.operators.tsdb import bucket_means

    keys = keys or []
    daily = bucket_means(df, value_col, time_col, keys, bucket_seconds)
    grouped = daily.groupBy(*keys) if keys else daily.groupBy()
    arr = F.array_sort(F.collect_list(F.struct("__b", "__m")))
    folded = grouped.agg(
        arr.alias("__arr"),
        F.count(F.lit(1)).alias("n_buckets"),
        F.max("__b").alias("last_bucket"),
    )
    rest = F.slice(
        F.col("__arr"), 2, F.greatest(F.size("__arr") - 1, F.lit(0))
    )
    smoothed = F.aggregate(
        rest,
        F.element_at(F.col("__arr"), 1)["__m"],
        lambda acc, x: F.lit(alpha) * x["__m"] + F.lit(1.0 - alpha) * acc,
    )
    return folded.select(
        *keys, smoothed.alias("ewma"), "n_buckets", "last_bucket"
    )


def top_paths(
    df: DataFrame,
    user_col: str = "user_id",
    event_col: str = "event_type",
    time_col: str = "ts",
    id_col: str = "event_id",
    max_len: int = 4,
    day_seconds: int = 86400,
    top_k: int = 20,
) -> DataFrame:
    """Most common user journeys: per (user, day) the first ``max_len``
    events joined into a ``a>b>c`` path string, counted across all
    user-days — the top-k ``(path, n_sessions)``.  The "what do people
    actually DO first" view behind every onboarding/funnel redesign;
    ``window_funnel`` checks ONE hypothesized order, this discovers the
    orders that exist.

    Determinism: events order by (ts, id) — the id tiebreak makes
    same-timestamp rows unambiguous in any engine; the top-k orders by
    (count desc, path asc), a total order.

    Scale shape: one per-(user, day) window (row_number, keyed — the
    standard sessionize sort; a pathological mega-user-day sorts its own
    partition only), rows beyond ``max_len`` dropped BEFORE the
    collect_list, so the per-group state is ≤ max_len structs; then a
    combinable path count.  No self-joins, no data-sized global state.

    Reference parity: no reference counterpart — product-analytics
    extension next to window_funnel/purchase_attribution (driver brief).
    """
    day = F.floor(F.col(time_col).cast("double") / day_seconds).cast("long")
    w = Window.partitionBy(user_col, "__day").orderBy(
        F.col(time_col).asc(), F.col(id_col).asc()
    )
    seq = (
        df.select(
            user_col, event_col, time_col, id_col, day.alias("__day")
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= max_len)
    )
    paths = seq.groupBy(user_col, "__day").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__rn"), F.col(event_col).alias("e")))
                ),
                lambda x: x["e"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(top_k)
    )


def time_decay_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    event_col: str = "event_type",
    time_col: str = "ts",
    conversion_event: str = "purchase",
    channel_events: "list[str] | None" = None,
    lookback_seconds: int = 604800,
    halflife_seconds: int = 86400,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Time-decay multi-touch attribution: every channel touch within
    ``lookback_seconds`` before a conversion earns ``2^(−Δt/halflife)``
    credit; returns per channel ``(channel, touches, weight, share)``.
    The fair middle ground between last-touch (purchase_attribution) and
    the model-based Markov removal effects (markov_attribution).

    Exactness: Δt is an exact double difference of epoch seconds; the
    decay is computed as ``exp(−Δt·ln2/halflife)`` (one fixed IEEE
    chain) and e9-quantized PER PAIR, so channel sums are exact integers
    in any order; weight and share divide those integers once, 6 dp.

    Scale shape: the touch×conversion pairing is the bucket-exploded
    interval equi-join (the range_join pattern — conversions replicate
    into lookback/bucket buckets, touches compute one bucket, join on
    (user, bucket), exact time predicate after; no inequality join).
    Candidate mass is per-user touches × conversions within the
    lookback — the heavy-user skew is bounded by the lookback window.
    The final share normalization is a keyless window over the
    CHANNEL-count frame (≤ |event types| rows).

    Reference parity: no reference counterpart — attribution extension
    (driver brief).
    """
    channels = channel_events or ["view", "click"]
    ln2 = 0.6931471805599453
    tp = F.col(time_col).cast("double")
    conv = df.filter(F.col(event_col) == conversion_event).select(
        F.col(user_col).alias("__u"), tp.alias("__tp")
    )
    b0 = F.floor((F.col("__tp") - lookback_seconds) / bucket_seconds).cast("long")
    b1 = F.floor(F.col("__tp") / bucket_seconds).cast("long")
    iv = conv.select("__u", "__tp", F.explode(F.sequence(b0, b1)).alias("__bkt"))
    touch = df.filter(F.col(event_col).isin(channels)).select(
        F.col(user_col).alias("__u"),
        F.col(event_col).alias("channel"),
        F.col(time_col).cast("double").alias("__tt"),
    )
    pt = touch.withColumn(
        "__bkt", F.floor(F.col("__tt") / bucket_seconds).cast("long")
    )
    pairs = pt.join(iv, ["__u", "__bkt"]).filter(
        (F.col("__tt") >= F.col("__tp") - F.lit(float(lookback_seconds)))
        & (F.col("__tt") <= F.col("__tp"))
    )
    we9 = F.floor(
        F.exp(
            -(F.col("__tp") - F.col("__tt"))
            * F.lit(ln2)
            / F.lit(float(halflife_seconds))
        )
        * F.lit(1.0e9)
        + F.lit(0.5)
    ).cast("long")
    agg = pairs.select("channel", we9.alias("__w")).groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("touches"),
        F.sum("__w").alias("__sw"),
    )
    # keyless window over the CHANNEL frame (≤ |event types| rows)
    wall = Window.partitionBy()
    return agg.select(
        "channel",
        "touches",
        F.round(F.col("__sw").cast("double") / F.lit(1.0e9), 6).alias("weight"),
        F.round(
            F.col("__sw").cast("double") / F.sum("__sw").over(wall).cast("double"),
            6,
        ).alias("share"),
    )


def trending_topk(
    df: DataFrame,
    item_col: str,
    time_col: str = "ts",
    bucket_seconds: int = 86400,
    k: int = 3,
) -> DataFrame:
    """Per-bucket trending items — for every time bucket the top-k items
    by count with rank and share: ``(bucket, rank, item, n, share)``.
    The "what's hot today" feed behind every trending panel; the
    global-top-N family (top_suppliers, approx_top_terms) answers the
    all-time question, this answers it per period.

    Exactness: counts are exact integers; rank orders by (count desc,
    item asc) — a total order, so rank-k cutoffs are engine-identical;
    share divides two exact integers, 6 dp.

    Scale shape: one combinable (bucket, item) aggregate over the fact,
    then a rank window PARTITIONED BY BUCKET over item-count rows and a
    bucket-count-sized totals join — nothing data-sized passes a window.
    """
    from pyspark.sql import Window

    b = F.floor(F.col(time_col).cast("double") / bucket_seconds).cast("long")
    cells = (
        df.filter(F.col(item_col).isNotNull())
        .select(b.alias("bucket"), F.col(item_col).alias("item"))
        .groupBy("bucket", "item")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cells.groupBy("bucket").agg(F.sum("n").alias("__t"))
    w = Window.partitionBy("bucket").orderBy(F.col("n").desc(), F.col("item").asc())
    return (
        cells.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .join(F.broadcast(tot), "bucket")
        .select(
            "bucket",
            "rank",
            "item",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("__t").cast("double"), 6)
            .alias("share"),
        )
    )
