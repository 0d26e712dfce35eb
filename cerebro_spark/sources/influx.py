"""InfluxDB v2 READ connector: ``spark.read.format("cerebro_influx")``.

The reference's query path compiles (bucket, measurement, field, range) to a
Flux string and fetches a pandas frame over HTTP
(`/root/reference/cerebro/client.py:57-129`).  The Spark-native shape is a
batch ``DataSource`` whose *predicate pushdown happens at Flux-compilation
time*: bucket/measurement/field/start/end arrive as reader options and are
compiled into the server-side Flux pipeline, so Influx — not Spark — does the
filtering, exactly like the reference client.

Scale design: the requested time range is split into ``num_partitions``
disjoint sub-ranges, one Flux query per Spark partition, so a year-long
backfill read fans out across executors instead of serializing through one
HTTP response.

The actual HTTP fetch is feature-flagged (``influxdb-client`` is not
installed in CI); tests and offline use register a fetch function by name in
``FETCH_REGISTRY`` (same pattern as ``POLL_REGISTRY``) returning
``(time, field, value)`` tuples.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Callable

#: name → fn(flux: str, options: dict) -> iterable[(datetime, str, float)]
FETCH_REGISTRY: dict[str, Callable] = {}


def register_fetch_fn(name: str):
    def deco(fn: Callable):
        FETCH_REGISTRY[name] = fn
        return fn

    return deco


def build_flux(
    bucket: str,
    measurement: str,
    field: str | None = None,
    start: str | None = None,
    end: str | None = None,
    pivot: bool = False,
) -> str:
    """Compile the reference's query plan (Q1-Q5) to Flux text
    (`client.py:57-91`): bucket scan → optional range → measurement filter →
    optional field filter → optional pivot.  ``start``/``end`` accept ISOT
    (``2022-10-01T00:05:00Z``) or relative (``-15m``) forms, passed through
    verbatim — Flux owns relative-time resolution server-side."""
    lines = [f'from(bucket: "{bucket}")']
    if start is not None or end is not None:
        parts = []
        if start is not None:
            parts.append(f"start: {start}")
        if end is not None:
            parts.append(f"end: {end}")
        lines.append(f"|> range({', '.join(parts)})")
    lines.append(f'|> filter(fn: (r) => r["_measurement"] == "{measurement}")')
    if field:
        lines.append(f'|> filter(fn: (r) => r["_field"] == "{field}")')
    if pivot:
        lines.append(
            '|> pivot(rowKey: ["_time"], columnKey: ["_field"], '
            'valueColumn: "_value")'
        )
    return "\n".join(lines)


def slice_range(
    start: dt.datetime, end: dt.datetime, n: int
) -> list[tuple[dt.datetime, dt.datetime]]:
    """Split [start, end) into ``n`` contiguous sub-ranges (last one absorbs
    the remainder) — the per-partition Flux range bounds."""
    total = (end - start).total_seconds()
    if total <= 0 or n <= 1:
        return [(start, end)]
    width = total / n
    bounds = [start + dt.timedelta(seconds=width * i) for i in range(n)] + [end]
    return [(bounds[i], bounds[i + 1]) for i in range(n)]


def _isot(t: dt.datetime) -> str:
    if t.tzinfo is not None:
        t = t.astimezone(dt.timezone.utc).replace(tzinfo=None)
    return t.isoformat() + "Z"


@register_fetch_fn("synthetic")
def _synthetic_fetch(flux: str, options: dict):
    """Deterministic offline fetch: parses the range bounds out of the
    compiled Flux text (proving the pushdown reached the query) and emits one
    point per ``step_seconds`` inside them.  Stand-in for a live server in
    tests and demos."""
    import re

    m = re.search(r"range\(start: ([^,)]+)(?:, end: ([^)]+))?\)", flux)
    if not m:
        return
    start = dt.datetime.fromisoformat(m.group(1).rstrip("Z"))
    end = (
        dt.datetime.fromisoformat(m.group(2).rstrip("Z"))
        if m.group(2)
        else start + dt.timedelta(hours=1)
    )
    fm = re.search(r'r\["_field"\] == "([^"]+)"', flux)
    field = fm.group(1) if fm else "value"
    step = int(options.get("step_seconds", "60"))
    t = start
    i = 0
    while t < end:
        yield (t, field, 20.0 + (i % 10))
        t += dt.timedelta(seconds=step)
        i += 1


@register_fetch_fn("http")
def _http_fetch(flux: str, options: dict):
    """Real HTTP fetch via influxdb-client — feature-flagged: raises with a
    clear message when the library isn't installed (reference
    `client.py:18-56` connection setup)."""
    import os

    try:
        from influxdb_client import InfluxDBClient  # type: ignore
    except ImportError as exc:  # pragma: no cover — lib not in CI
        raise RuntimeError(
            "influxdb-client not installed; register a custom fetch fn or "
            "install the client to read from a live server"
        ) from exc
    token = os.environ.get(options.get("token_env", "INFLUXDB_V2_TOKEN"))
    with InfluxDBClient(
        url=options.get("url", "http://localhost:8086"),
        token=token,
        org=options.get("org", "sdss5"),
    ) as client:  # pragma: no cover
        tables = client.query_api().query(flux)
        for table in tables:
            for rec in table.records:
                yield (rec.get_time(), rec.get_field(), rec.get_value())


try:  # PySpark 4 Python DataSource API
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class _RangePartition(InputPartition):
        def __init__(self, start: str | None, end: str | None):
            self.start = start
            self.end = end

    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    class _InfluxReader(DataSourceReader):
        def __init__(self, options):
            self.options = dict(options)
            # Resolve the fetch fn DRIVER-SIDE: the reader is pickled to
            # executors, where runtime-registered fns (tests, app code) are
            # absent from a freshly imported registry — capturing the
            # function itself ships it with the reader.
            self.fetch = FETCH_REGISTRY[self.options.get("fetch_fn", "http")]

        def pushFilters(self, filters):
            """Catalyst → Flux pushdown (SURVEY §4 candidate (b)): ``time``
            range bounds and ``field`` equality tighten the server-side
            Flux pipeline, so Influx — not Spark — drops the rows.  Every
            filter is also RETURNED (Spark re-evaluates them), so a fetch
            fn that ignores the compiled range can't corrupt results —
            pushdown here is a scan reduction, never the correctness
            boundary.  Explicit start/end options win over pushed bounds
            (they may be relative forms the user chose deliberately)."""
            for f in filters:
                col = f.attribute[0] if getattr(f, "attribute", None) else None
                v = getattr(f, "value", None)
                if col == "time" and isinstance(
                    f, (GreaterThan, GreaterThanOrEqual)
                ) and "start" not in self.options:
                    if isinstance(v, dt.datetime):
                        self.options["start"] = _isot(v)
                elif col == "time" and isinstance(
                    f, (LessThan, LessThanOrEqual)
                ) and "end" not in self.options:
                    # Flux range(stop:) is EXCLUSIVE.  `time < v` maps 1:1;
                    # `time <= v` must over-fetch by one µs tick or the row
                    # at exactly t == v is withheld server-side and Spark's
                    # re-evaluation can't restore it (pushdown must only
                    # ever over-fetch).
                    if isinstance(v, dt.datetime):
                        if isinstance(f, LessThanOrEqual):
                            v = v + dt.timedelta(microseconds=1)
                        self.options["end"] = _isot(v)
                elif (
                    col == "field"
                    and isinstance(f, EqualTo)
                    and "field" not in self.options
                    and isinstance(v, str)
                ):
                    self.options["field"] = v
                yield f

        def partitions(self):
            o = self.options
            n = int(o.get("num_partitions", "1"))
            start, end = o.get("start"), o.get("end")
            # Absolute bounds split into per-partition sub-ranges; relative
            # or open ranges (either endpoint, e.g. '-5m' / 'now()') can't be
            # sliced client-side → single partition.
            if n > 1 and start and end:
                try:
                    s = dt.datetime.fromisoformat(start.rstrip("Z"))
                    e = dt.datetime.fromisoformat(end.rstrip("Z"))
                except ValueError:
                    return [_RangePartition(start, end)]
                return [
                    _RangePartition(_isot(a), _isot(b))
                    for a, b in slice_range(s, e, n)
                ]
            return [_RangePartition(start, end)]

        def read(self, partition: _RangePartition):
            o = self.options
            flux = build_flux(
                o["bucket"],
                o["measurement"],
                field=o.get("field"),
                start=partition.start,
                end=partition.end,
                pivot=False,
            )
            for t, f, v in self.fetch(flux, o):
                yield (t, f, float(v) if v is not None else None)

    class InfluxReadSource(DataSource):
        """``spark.read.format("cerebro_influx")`` after
        ``spark.dataSource.register(InfluxReadSource)``.  Long shape —
        pivot to wide with ``operators.pivot.pivot_fields`` (Q5)."""

        @classmethod
        def name(cls) -> str:
            return "cerebro_influx"

        def schema(self) -> str:
            return "time timestamp, field string, value double"

        def reader(self, schema):
            return _InfluxReader(self.options)

except ImportError:  # pragma: no cover — pre-4.0 PySpark
    class InfluxReadSource:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise RuntimeError("PySpark>=4 Python DataSource API required")
