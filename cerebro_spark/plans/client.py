"""Query layer — CerebroClient parity (SURVEY §2.4, §3.2).

The reference client compiles (bucket, measurement, field, start, end) into a
Flux string executed by InfluxDB (``/root/reference/cerebro/client.py:57-91``):
scan → range → measurement filter → optional field filter → pivot.  Here the
same parameters build a DataFrame expression chain over our stored point
tables, and Catalyst is the planner the reference never had — the time/
measurement predicates push into the parquet scan (partition pruning when the
store is date/bucket-partitioned).

Relative times: the reference accepts Flux-style ``-15m``/``-1h`` bounds
(`client.py:70-78`); ``_resolve_time`` reproduces that (T23).
"""

from __future__ import annotations

import datetime as dt
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.operators.pivot import explode_fields, pivot_fields

_REL_RE = re.compile(r"^-(\d+(?:\.\d+)?)(s|m|h|d|w)$")
_UNIT_SECONDS = {"s": 1, "m": 60, "h": 3600, "d": 86400, "w": 604800}


def _resolve_time(
    value: str | float | dt.datetime | None,
    now: dt.datetime,
) -> dt.datetime | None:
    """Flux-style bound → absolute UTC datetime.

    Accepts ISO strings, datetimes, negative floats (seconds before now —
    reference `tools.py:70-86`), and Flux relative strings like ``-15m``
    (reference `client.py:111-114`).
    """
    if value is None:
        return None
    if isinstance(value, dt.datetime):
        return value
    if isinstance(value, (int, float)):
        if value < 0:
            return now + dt.timedelta(seconds=float(value))
        return dt.datetime.fromtimestamp(float(value), tz=dt.timezone.utc).replace(
            tzinfo=None
        )
    m = _REL_RE.match(value.strip())
    if m:
        qty, unit = float(m.group(1)), m.group(2)
        return now - dt.timedelta(seconds=qty * _UNIT_SECONDS[unit])
    return dt.datetime.fromisoformat(value.replace("Z", "+00:00")).replace(tzinfo=None)


class CerebroClient:
    """Query interface over stored point tables.

    ``store`` maps bucket name → a function or path yielding the canonical
    point DataFrame (POINT_SCHEMA).  ``query`` mirrors the reference signature
    (`client.py:93-129`) and returns the pivoted wide DataFrame.
    """

    def __init__(
        self,
        spark: SparkSession,
        store: dict[str, str] | None = None,
        now: dt.datetime | None = None,
    ):
        self.spark = spark
        self.store = store or {}
        self.rollups: dict[str, object] = {}
        self._now = now  # pinned clock for deterministic tests

    def register_bucket(self, bucket: str, path_or_df: str | DataFrame) -> None:
        self.store[bucket] = path_or_df

    def register_rollup(self, bucket: str, path_or_df: str | DataFrame) -> None:
        """Attach a maintained daily rollup (``operators.rollup`` layout:
        measurement, field, date, n, vmin, vmax, vsum) — day-aligned
        ``aggregate_window`` queries are then rewritten onto it."""
        self.rollups[bucket] = path_or_df

    def _scan(self, bucket: str) -> DataFrame:
        """Q1 — bucket scan (`client.py:68`)."""
        src = self.store[bucket]
        return src if isinstance(src, DataFrame) else self.spark.read.parquet(src)

    def _rollup_scan(self, bucket: str) -> DataFrame:
        src = self.rollups[bucket]
        return src if isinstance(src, DataFrame) else self.spark.read.parquet(src)

    def _try_rollup_rewrite(
        self,
        bucket: str,
        measurement: str,
        field: str | None,
        t0: dt.datetime | None,
        t1: dt.datetime | None,
        every: int,
        fn: str,
    ) -> DataFrame | None:
        """Materialized-view rewrite: serve a day-aligned aggregateWindow
        from the maintained daily rollup instead of re-reading raw points.

        Applicability (else return None and the raw path runs): a rollup is
        registered for the bucket, ``every`` is a whole number of days, the
        range bounds land on day boundaries, and ``fn`` is decomposable from
        (n, vmin, vmax, vsum) — avg as sum/count stays EXACT, not an
        average-of-averages.  At 100 TB this turns every dashboard-grain
        query from a fact-table scan into a rollup read that is smaller by
        the per-day point count, with date partition pruning intact.
        """
        def midnight(t: dt.datetime | None) -> bool:
            return t is None or (t.hour, t.minute, t.second, t.microsecond) == (0, 0, 0, 0)

        if (
            bucket not in self.rollups
            or every % 86400 != 0
            or not midnight(t0)
            or not midnight(t1)
            or fn not in ("avg", "mean", "min", "max", "sum", "count")
        ):
            return None
        r = self._rollup_scan(bucket).filter(F.col("measurement") == measurement)
        if t0 is not None:
            r = r.filter(F.col("date") >= F.lit(t0.date()))
        if t1 is not None:
            r = r.filter(F.col("date") < F.lit(t1.date()))
        if field is not None:
            r = r.filter(F.col("field") == field)
        value = {
            "avg": F.sum("vsum") / F.sum("n"),
            "mean": F.sum("vsum") / F.sum("n"),
            "min": F.min("vmin"),
            "max": F.max("vmax"),
            "sum": F.sum("vsum"),
            "count": F.sum("n"),
        }[fn]
        day_epoch = F.col("date").cast("timestamp").cast("long")
        return (
            r.groupBy(
                F.timestamp_seconds(
                    F.floor(day_epoch / every) * every
                ).alias("time"),
                "measurement",
                "field",
            )
            .agg(value.alias("value"))
        )

    def query(
        self,
        bucket: str,
        measurement: str,
        field: str | None = None,
        start: str | float | dt.datetime = "-1d",
        end: str | float | dt.datetime | None = None,
        pivot: bool = True,
        aggregate_window: tuple[int, str] | None = None,
    ) -> DataFrame:
        """Q1-Q6 — scan → range → measurement filter → field filter → pivot.

        ``aggregate_window=(every_seconds, fn)`` adds the Flux
        ``aggregateWindow(every: …, fn: …)`` downsampling step (fn ∈
        avg/min/max/sum/count) applied per field over tumbling buckets —
        the aggregation surface the reference delegated to InfluxDB."""
        now = self._now or dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
        df = self._scan(bucket)

        # Q2 — time-range predicate (`client.py:70-78`); closed-open [start, stop)
        # matching Flux range() semantics.
        t0, t1 = _resolve_time(start, now), _resolve_time(end, now)
        if t0 is not None:
            df = df.filter(F.col("time") >= F.lit(t0))
        if t1 is not None:
            df = df.filter(F.col("time") < F.lit(t1))

        # Q3 — measurement filter (`client.py:80`).
        df = df.filter(F.col("measurement") == measurement)

        # Q4 — field filter (`client.py:82-83`).  With a concrete field the
        # long view is a direct map extraction — no explode of every entry,
        # so only the requested key is materialized per row; the explode path
        # is reserved for field=None (all fields).
        if field is not None:
            long = df.select(
                "time",
                "measurement",
                F.lit(field).alias("field"),
                F.element_at(F.col("fields"), field).alias("value"),
            ).filter(F.col("value").isNotNull())
        else:
            long = explode_fields(df).select(
                "time", "measurement", "field", "value"
            )

        if aggregate_window is not None:
            every, fn = aggregate_window
            rolled = self._try_rollup_rewrite(
                bucket, measurement, field, t0, t1, every, fn
            )
            if rolled is not None:
                long = rolled
            else:
                aggs = {
                    "avg": F.avg, "mean": F.avg, "min": F.min, "max": F.max,
                    "sum": F.sum, "count": F.count,
                }
                long = (
                    long.groupBy(
                        F.timestamp_seconds(
                            F.floor(F.col("time").cast("long") / every) * every
                        ).alias("time"),
                        "measurement",
                        "field",
                    )
                    .agg(aggs[fn]("value").alias("value"))
                )

        if not pivot:
            return long

        # Q5 — long→wide pivot (`client.py:85-90`).
        values = [field] if field is not None else None
        return pivot_fields(long, "field", "value", row_keys=["time"], values=values)
