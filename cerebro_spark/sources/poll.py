"""Polling connector as a native PySpark (4.x) Python DataSource.

The reference's source model is poll-with-retry on an asyncio loop
(``TCPSource._read_internal`` every ``delay`` seconds with reconnect —
`/root/reference/cerebro/sources/source.py:134-229`), with incremental
high-water-mark feeds for HTTP APIs (`lco.py:116-122`).  The Spark-native
shape is a custom streaming ``DataSource``: the poll happens once per
micro-batch, the HWM lives in the *checkpointed offset* (exactly-once across
restarts — stronger than the reference's in-memory ``start_time``), and the
trigger interval supplies the cadence (T24's scheduled-command timer).

Poll functions are plain Python callables registered by name (the options
dict only carries strings across the driver/worker boundary):

    @register_poll_fn("my_device")
    def poll(offset: int, options: dict) -> tuple[list[tuple], int]:
        ...return (point_rows, new_offset)

A poll fn may instead return a 3-tuple ``(rows, new_offset, state)`` where
``state`` is an opaque string checkpointed INSIDE the offset and handed back
on the next poll as ``options["__state"]`` — the Spark-native home for the
reference's incremental HTTP high-water-mark (`lco.py:116-122` keeps
``start_time`` in daemon memory and loses it on restart; here it survives in
the streaming checkpoint).

Row shape = POINT_SCHEMA tuples.  Transient poll failures follow the
reference's reconnect policy via ``ExponentialBackoff`` (C5 —
`protocols.py:24-28`: initial 1 s, factor e, Gaussian jitter σ≈0.1196,
cap 3600 s), bounded inside a single micro-batch.
"""

from __future__ import annotations

import math
import random
from collections.abc import Callable

POLL_REGISTRY: dict[str, Callable] = {}


def register_poll_fn(name: str):
    """Register ``fn(offset, options) -> (rows, new_offset)`` under ``name``.

    OFFSET CONTRACT: ``new_offset - offset`` must equal ``len(rows)`` — one
    offset unit per emitted row — and the fn must be deterministic in
    ``offset`` for replay.  Checkpoint recovery replays a committed batch by
    re-polling and slicing to the committed span; a fn that advances the HWM
    by a different amount than it emits rows would have its replay silently
    mis-sliced (`_PollStreamReader.readBetweenOffsets`).  Snapshot-style fns
    that emit 0 rows on error but still advance are tolerated (replay
    under-fills, documented there).
    """

    def deco(fn: Callable):
        POLL_REGISTRY[name] = fn
        return fn

    return deco


class ExponentialBackoff:
    """C5 — reconnect backoff with the reference's constants
    (`protocols.py:24-28`): delay ← min(delay·e, 3600), Gaussian jitter.
    Deterministic when seeded (tests)."""

    initial_delay = 1.0
    factor = math.e
    jitter = 0.119626565582
    max_delay = 3600.0

    def __init__(self, seed: int | None = None):
        self._delay = self.initial_delay
        self._rng = random.Random(seed)
        self.retries = 0

    def next_delay(self) -> float:
        self.retries += 1
        self._delay = min(self._delay * self.factor, self.max_delay)
        d = self._delay
        if self.jitter:
            d = self._rng.normalvariate(d, d * self.jitter)
        return max(0.0, min(d, self.max_delay * (1 + 4 * self.jitter)))

    def reset(self) -> None:
        self._delay = self.initial_delay
        self.retries = 0


@register_poll_fn("synthetic")
def _synthetic_poll(offset: int, options: dict) -> tuple[list[tuple], int]:
    """Deterministic synthetic telemetry: ``rows_per_poll`` points per call,
    value = f(offset) — the test stand-in for a device read."""
    n = int(options.get("rows_per_poll", "5"))
    measurement = options.get("measurement", "synthetic")
    rows = []
    for i in range(n):
        seq = offset + i
        rows.append(
            (
                measurement,
                {"source": "poll"},
                {"value": float((seq * 37) % 1000) / 10.0, "seq": float(seq)},
                None,
                None,
                None,  # time stamped centrally (T5)
                options.get("bucket"),
            )
        )
    return rows, offset + n


try:  # PySpark 4 Python DataSource API
    from pyspark.sql.datasource import (
        DataSource,
        SimpleDataSourceStreamReader,
    )

    class _PollStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, schema, options):
            self.schema_ = schema
            self.options = dict(options)
            self.fn = POLL_REGISTRY[self.options.get("poll_fn", "synthetic")]
            self.max_retries = int(self.options.get("max_retries", "3"))

        def initialOffset(self) -> dict:
            return {"hwm": int(self.options.get("start_offset", "0"))}

        def _call(self, start: dict) -> tuple[list, dict]:
            """Invoke the poll fn with the checkpointed opaque state (if
            any) injected as ``options["__state"]``; normalize 2- and
            3-tuple returns to (rows, offset_dict)."""
            opts = dict(self.options)
            if start.get("state") is not None:
                opts["__state"] = start["state"]
            out = self.fn(int(start["hwm"]), opts)
            if len(out) == 3:
                rows, new_hwm, state = out
                return list(rows), {"hwm": int(new_hwm), "state": state}
            rows, new_hwm = out
            return list(rows), {"hwm": int(new_hwm)}

        def read(self, start: dict):
            backoff = ExponentialBackoff(seed=0)
            last_exc: Exception | None = None
            for _ in range(self.max_retries):
                try:
                    rows, end = self._call(start)
                    return iter(rows), end
                except Exception as exc:  # noqa: BLE001 — retry transient reads
                    last_exc = exc
                    backoff.next_delay()  # bounded in-batch; no sleep in tests
            raise last_exc  # type: ignore[misc]

        def readBetweenOffsets(self, start: dict, end: dict):
            # Replay contract: registered poll fns must be deterministic in
            # offset.  The replayed batch is additionally SLICED to the
            # committed offset span, so a changed option (e.g. rows_per_poll
            # across a restart) cannot replay more rows than the original
            # batch committed.  Fns that over-advance hwm on empty reads
            # (snapshot polls hitting a transient error) can still under-fill
            # a replay — inherent for non-deterministic state, documented.
            rows, replay_end = self._call(start)
            delta = int(end["hwm"]) - int(start["hwm"])
            replay_delta = int(replay_end["hwm"]) - int(start["hwm"])
            if replay_delta != len(rows):
                # Fn violates the rows-per-offset contract (see
                # register_poll_fn): slicing by offset span would lose data.
                # Return the replay unsliced and warn — over-delivery is
                # recoverable downstream (idempotent sink), silent loss isn't.
                import warnings

                warnings.warn(
                    f"poll fn {self.options.get('poll_fn')!r} advanced hwm by "
                    f"{replay_delta} but emitted {len(rows)} rows; replay not "
                    "sliced (rows-per-offset contract violated)",
                    stacklevel=2,
                )
                return iter(rows)
            if 0 <= delta < len(rows):
                rows = rows[:delta]
            return iter(rows)

    class PollDataSource(DataSource):
        """``spark.readStream.format("cerebro_poll")`` after
        ``spark.dataSource.register(PollDataSource)``."""

        @classmethod
        def name(cls) -> str:
            return "cerebro_poll"

        def schema(self) -> str:
            return (
                "measurement string, tags map<string,string>, "
                "fields map<string,double>, fields_str map<string,string>, "
                "fields_bool map<string,boolean>, time timestamp, bucket string"
            )

        def simpleStreamReader(self, schema):
            return _PollStreamReader(schema, self.options)

except ImportError:  # pragma: no cover — pre-4.0 PySpark
    DataSource = None  # type: ignore[assignment]

    class PollDataSource:  # type: ignore[no-redef]
        def __init__(self, *a, **k):
            raise RuntimeError("PySpark>=4 Python DataSource API required")


@register_poll_fn("file_exists")
def _file_exists_poll(offset: int, options: dict) -> tuple[list[tuple], int]:
    """S11 — CheckFileExistsSource (`/root/reference/cerebro/sources/lvm.py:243-309`):
    emits ``file_exists {basename: 0|1}`` per poll."""
    import os.path

    path = options["file"]
    base = os.path.basename(path)
    row = (
        "file_exists",
        {"source": "file_exists"},
        {base: 1.0 if os.path.exists(path) else 0.0},
        None,
        None,
        None,
        options.get("bucket", "sensors"),
    )
    return [row], offset + 1


def _decode_escapes(s: str) -> str:
    """Spark options are plain strings; let callers write ``\\n`` / ``\\r``."""
    return s.encode().decode("unicode_escape")


@register_poll_fn("tcp_request")
def _tcp_request_poll(offset: int, options: dict) -> tuple[list[tuple], int]:
    """S2/S7/S8/S10 transport — request/reply over a real TCP socket, one
    reply per poll (the reference's ``TCPSource._read_internal`` shape:
    `/root/reference/cerebro/sources/source.py:213-229`, Govee/Sens4/LN2
    `lvm.py:57-109,139-174,212-240`).

    Options: ``host``, ``port``, optional ``request`` (escapes allowed),
    ``terminator`` (default ``\\n``), ``timeout_s``.  The raw reply rides in
    ``fields_str.raw`` — protocol semantics stay in the declarative parse
    stage (``parse_govee`` / ``parse_sens4`` / ``parse_ln2``), keeping the
    transport generic.  Socket errors raise → the reader's C5 backoff retries.
    Live sockets are not offset-deterministic; checkpoint replay is bounded
    by the committed span slice in ``readBetweenOffsets``.
    """
    import socket

    host = options.get("host", "127.0.0.1")
    port = int(options["port"])
    timeout = float(options.get("timeout_s", "5"))
    request = options.get("request")
    term = _decode_escapes(options.get("terminator", "\n")).encode()
    with socket.create_connection((host, port), timeout=timeout) as sock:
        sock.settimeout(timeout)
        if request:
            sock.sendall(_decode_escapes(request).encode())
        buf = b""
        while not buf.endswith(term):
            chunk = sock.recv(4096)
            if not chunk:
                break
            buf += chunk
    row = (
        options.get("measurement", "tcp_raw"),
        {"source": options.get("source_name", "tcp"), "host": host},
        None,
        {"raw": buf.decode(errors="replace")},
        None,
        None,  # stamped centrally (T5)
        options.get("bucket"),
    )
    return [row], offset + 1


@register_poll_fn("udp_request")
def _udp_request_poll(offset: int, options: dict) -> tuple[list[tuple], int]:
    """S12 transport — datagram request/reply (the ADAM thermistor read:
    `/root/reference/cerebro/sources/lvm.py:380-426`).  Sends ``request``,
    returns the raw reply datagram in ``fields_str.raw`` for the
    ``parse_thermistor`` stage."""
    import socket

    host = options.get("host", "127.0.0.1")
    port = int(options["port"])
    timeout = float(options.get("timeout_s", "5"))
    request = _decode_escapes(options.get("request", "$016\r\n")).encode()
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    try:
        sock.settimeout(timeout)
        sock.sendto(request, (host, port))
        data, _ = sock.recvfrom(int(options.get("bufsize", "4096")))
    finally:
        sock.close()
    row = (
        options.get("measurement", "udp_raw"),
        {"source": options.get("source_name", "udp"), "host": host},
        None,
        {"raw": data.decode(errors="replace")},
        None,
        None,
        options.get("bucket"),
    )
    return [row], offset + 1


@register_poll_fn("tpm_snapshot")
def _tpm_snapshot_poll(offset: int, options: dict) -> tuple[list[tuple], int]:
    """S14 — TPMSource (`/root/reference/cerebro/sources/tpm.py:24-93`): read
    the shared telemetry snapshot (here: a JSON file standing in for the TPM
    multicast client's dict) once per poll; the whole flattened dict becomes
    one point's fields."""
    import json

    from cerebro_spark.functions.parsers import _flatten

    try:
        with open(options["file"]) as fh:
            snapshot = json.load(fh)
    except (OSError, ValueError):
        return [], offset + 1
    flat, _ = _flatten(snapshot)
    fields = {
        k: float(v)
        for k, v in flat.items()
        if isinstance(v, (int, float)) and not isinstance(v, bool)
    }
    fields_str = {k: str(v) for k, v in flat.items() if isinstance(v, str)}
    fields_bool = {k: v for k, v in flat.items() if isinstance(v, bool)}
    row = (
        options.get("measurement", "tpm"),
        {"source": "tpm"},
        fields or None,
        fields_str or None,
        fields_bool or None,
        None,
        options.get("bucket"),
    )
    return [row], offset + 1


@register_poll_fn("http_request")
def _http_request_poll(
    offset: int, options: dict
) -> tuple[list[tuple], int, str | None]:
    """S15/S16 streaming transport — incremental HTTP fetch with a
    time-based high-water-mark, the reference's LCO feed loop
    (`/root/reference/cerebro/sources/lco.py:116-122`: GET with
    ``start_time=<last seen ts>``, then HWM ← last row's second-precision
    ISO timestamp).  The HWM here lives in the checkpointed offset state
    (3-tuple return), so a restarted query resumes from the committed
    watermark instead of the reference's in-memory ``start_time``.

    Options: ``url`` (required); ``hwm_param`` (query parameter carrying
    the watermark, default ``start_time``); ``initial_start`` (first-poll
    value, default ``-120`` = the reference's relative-seconds form);
    ``time_field`` (default ``ts``); ``rows_key`` (when the payload is a
    dict, the key holding the row list; default ``results``);
    ``measurement``, ``source_name``, ``bucket``, ``timeout_s``.

    Response rows are JSON objects; the ``time_field`` value (ISO 8601)
    becomes the point time, numeric members land in ``fields``, strings in
    ``fields_str``, booleans in ``fields_bool`` — ready for the
    ``lco_weather_pipeline`` / ``lco_seeing_pipeline`` parse stages.
    HTTP errors raise → the reader's C5 backoff retries.  Replay after a
    crash re-issues the committed watermark's request; the committed-span
    slice in ``readBetweenOffsets`` bounds over-delivery.
    """
    import datetime as dt
    import json as _json
    import urllib.parse
    import urllib.request

    url = options["url"]
    hwm_param = options.get("hwm_param", "start_time")
    time_field = options.get("time_field", "ts")
    state = options.get("__state") or options.get("initial_start", "-120")
    sep = "&" if "?" in url else "?"
    full = f"{url}{sep}{urllib.parse.urlencode({hwm_param: state})}"
    with urllib.request.urlopen(
        full, timeout=float(options.get("timeout_s", "10"))
    ) as resp:
        payload = _json.load(resp)
    if isinstance(payload, dict):
        payload = payload.get(options.get("rows_key", "results"), [])

    rows: list[tuple] = []
    last_ts: dt.datetime | None = None
    for rec in payload:
        rec = dict(rec)
        raw_ts = rec.pop(time_field, None)
        t = None
        if raw_ts is not None:
            t = dt.datetime.fromisoformat(str(raw_ts).replace("Z", "+00:00"))
            if t.tzinfo is not None:
                t = t.astimezone(dt.timezone.utc).replace(tzinfo=None)
            if last_ts is None or t > last_ts:
                last_ts = t
        fields = {
            k: float(v)
            for k, v in rec.items()
            if isinstance(v, (int, float)) and not isinstance(v, bool)
        }
        fields_str = {k: v for k, v in rec.items() if isinstance(v, str)}
        fields_bool = {k: v for k, v in rec.items() if isinstance(v, bool)}
        rows.append(
            (
                options.get("measurement", "http"),
                {"source": options.get("source_name", "http")},
                fields or None,
                fields_str or None,
                fields_bool or None,
                t,
                options.get("bucket"),
            )
        )
    new_state = state
    if last_ts is not None:
        # the reference's HWM discipline (lco.py:117-122): second-precision
        # ISO of the newest row — the server side treats it as exclusive
        new_state = last_ts.replace(microsecond=0).isoformat()
    return rows, offset + len(rows), new_state
