"""Native AMQP 0-9-1 consumer (RabbitMQ-compatible) — no client library.

The reference's bus source subscribes to a RabbitMQ exchange via aio-pika
(`/root/reference/cerebro/sources/AMQP.py:85-216`); this container has no
AMQP library and no broker, so this module speaks the wire protocol
directly: a minimal, dependency-free 0-9-1 client covering exactly the
consumer surface the bus transport needs — PLAIN auth handshake, one
channel, passive/active queue declare, ``Basic.Get`` polling, and
``Basic.Ack``.

Two consumption modes:

* ``Basic.Get`` (poll, the default): every other external feed in this
  engine is a poll transport (``sources/poll.py`` — TCP/UDP/HTTP/TPM), pull
  bounds batch size naturally, and the broker keeps the delivery cursor —
  so the spool pump (``bus.amqp_to_spool``) gets at-least-once semantics
  from ack-after-write with zero client state.  Telemetry buses (the
  reference's actor replies) are low-rate, so the per-message round-trip
  is immaterial.
* ``Basic.Consume`` (push, ``mode: consume``): for higher-rate queues the
  Get round-trip dominates; ``consume_start`` + ``consume_drain`` let the
  broker stream deliveries ahead of the client, bounded by ``basic.qos``
  prefetch (the batch-size bound that Get gave for free).  Same
  ack-after-write contract: unacked deliveries requeue on disconnect.

The frame codec lives in module functions so the loopback test broker
(tests/amqp_fake_broker.py) speaks BYTE-IDENTICAL frames from the server
side — the contract test is frame-level, not mocked.

Protocol reference: AMQP 0-9-1 specification (class/method ids and frame
grammar are from the public spec; no broker code consulted).
"""

from __future__ import annotations

import socket
import struct

FRAME_METHOD = 1
FRAME_HEADER = 2
FRAME_BODY = 3
FRAME_HEARTBEAT = 8
FRAME_END = 0xCE

# (class, method) ids used here — AMQP 0-9-1 spec numbering
CONNECTION_START = (10, 10)
CONNECTION_START_OK = (10, 11)
CONNECTION_TUNE = (10, 30)
CONNECTION_TUNE_OK = (10, 31)
CONNECTION_OPEN = (10, 40)
CONNECTION_OPEN_OK = (10, 41)
CONNECTION_CLOSE = (10, 50)
CONNECTION_CLOSE_OK = (10, 51)
CHANNEL_OPEN = (20, 10)
CHANNEL_OPEN_OK = (20, 11)
CHANNEL_CLOSE = (20, 40)
CHANNEL_CLOSE_OK = (20, 41)
EXCHANGE_DECLARE = (40, 10)
EXCHANGE_DECLARE_OK = (40, 11)
QUEUE_DECLARE = (50, 10)
QUEUE_DECLARE_OK = (50, 11)
QUEUE_BIND = (50, 20)
QUEUE_BIND_OK = (50, 21)
BASIC_QOS = (60, 10)
BASIC_QOS_OK = (60, 11)
BASIC_CONSUME = (60, 20)
BASIC_CONSUME_OK = (60, 21)
BASIC_CANCEL = (60, 30)
BASIC_CANCEL_OK = (60, 31)
BASIC_DELIVER = (60, 60)
BASIC_GET = (60, 70)
BASIC_GET_OK = (60, 71)
BASIC_GET_EMPTY = (60, 72)
BASIC_ACK = (60, 80)

PROTOCOL_HEADER = b"AMQP\x00\x00\x09\x01"


class AMQPError(Exception):
    """Protocol-level failure (server Close, malformed frame, auth reject)."""


# --- wire primitives (shared with the loopback test broker) -----------------


def shortstr(s: str) -> bytes:
    b = s.encode("utf-8")
    if len(b) > 255:
        raise AMQPError(f"shortstr too long: {len(b)}")
    return bytes([len(b)]) + b


def longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def empty_table() -> bytes:
    return struct.pack(">I", 0)


def parse_shortstr(buf: bytes, off: int) -> tuple[str, int]:
    n = buf[off]
    return buf[off + 1 : off + 1 + n].decode("utf-8"), off + 1 + n


def parse_longstr(buf: bytes, off: int) -> tuple[bytes, int]:
    (n,) = struct.unpack_from(">I", buf, off)
    return buf[off + 4 : off + 4 + n], off + 4 + n


def method_payload(class_id: int, method_id: int, args: bytes = b"") -> bytes:
    return struct.pack(">HH", class_id, method_id) + args


def build_frame(ftype: int, channel: int, payload: bytes) -> bytes:
    return (
        struct.pack(">BHI", ftype, channel, len(payload))
        + payload
        + bytes([FRAME_END])
    )


def recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise AMQPError("connection closed mid-frame")
        buf += chunk
    return buf


def read_frame(sock: socket.socket) -> tuple[int, int, bytes]:
    head = recv_exact(sock, 7)
    ftype, channel, size = struct.unpack(">BHI", head)
    payload = recv_exact(sock, size)
    end = recv_exact(sock, 1)[0]
    if end != FRAME_END:
        raise AMQPError(f"bad frame end 0x{end:02x}")
    return ftype, channel, payload


def encode_table(table: dict) -> bytes:
    """AMQP field table encoder (the subset of value types the telemetry
    bus uses: str→longstr 'S', bool 't', int 'l', float 'd', dict 'F',
    None 'V').  Used by the loopback test broker to attach basic-properties
    headers; the client only ever parses."""
    body = b""
    for key, val in table.items():
        body += shortstr(key)
        if isinstance(val, bool):
            body += b"t" + (b"\x01" if val else b"\x00")
        elif isinstance(val, str):
            body += b"S" + longstr(val.encode("utf-8"))
        elif isinstance(val, int):
            body += b"l" + struct.pack(">q", val)
        elif isinstance(val, float):
            body += b"d" + struct.pack(">d", val)
        elif isinstance(val, dict):
            body += b"F" + encode_table(val)
        elif val is None:
            body += b"V"
        else:
            raise AMQPError(f"unsupported table value type {type(val)}")
    return struct.pack(">I", len(body)) + body


def parse_table(buf: bytes, off: int) -> tuple[dict, int]:
    """AMQP field table parser — all value types a RabbitMQ peer emits
    (spec + RabbitMQ's errata types 'b'/'B'/'u'/'i').  Unknown type octets
    raise rather than silently desynchronizing the frame."""
    (size,) = struct.unpack_from(">I", buf, off)
    off += 4
    end = off + size
    out: dict = {}
    while off < end:
        key, off = parse_shortstr(buf, off)
        val, off = _parse_field_value(buf, off)
        out[key] = val
    return out, off


def _parse_field_value(buf: bytes, off: int):
    t = buf[off : off + 1]
    off += 1
    if t == b"S":
        raw, off = parse_longstr(buf, off)
        return raw.decode("utf-8", errors="replace"), off
    if t == b"t":
        return bool(buf[off]), off + 1
    if t in (b"b", b"B"):
        return buf[off] if t == b"B" else struct.unpack_from(">b", buf, off)[0], off + 1
    if t in (b"u", b"U"):
        return struct.unpack_from(">H" if t == b"u" else ">h", buf, off)[0], off + 2
    if t in (b"I", b"i"):
        return struct.unpack_from(">i" if t == b"I" else ">I", buf, off)[0], off + 4
    if t in (b"l", b"L"):
        return struct.unpack_from(">q", buf, off)[0], off + 8
    if t == b"f":
        return struct.unpack_from(">f", buf, off)[0], off + 4
    if t == b"d":
        return struct.unpack_from(">d", buf, off)[0], off + 8
    if t == b"D":  # decimal: scale octet + long
        scale = buf[off]
        (raw,) = struct.unpack_from(">i", buf, off + 1)
        return raw / (10**scale), off + 5
    if t == b"T":  # timestamp (posix seconds)
        return struct.unpack_from(">Q", buf, off)[0], off + 8
    if t == b"F":
        return parse_table(buf, off)
    if t == b"A":  # array: size then typed values
        (size,) = struct.unpack_from(">I", buf, off)
        off += 4
        end = off + size
        vals = []
        while off < end:
            v, off = _parse_field_value(buf, off)
            vals.append(v)
        return vals, off
    if t == b"x":
        raw, off = parse_longstr(buf, off)
        return raw, off
    if t == b"V":
        return None, off
    raise AMQPError(f"unknown field-table value type {t!r}")


#: Basic-class property list, spec order: (flag bit, parser kind).
_BASIC_PROPS = [
    (1 << 15, "shortstr"),  # content-type
    (1 << 14, "shortstr"),  # content-encoding
    (1 << 13, "table"),     # headers
    (1 << 12, "octet"),     # delivery-mode
    (1 << 11, "octet"),     # priority
    (1 << 10, "shortstr"),  # correlation-id
    (1 << 9, "shortstr"),   # reply-to
    (1 << 8, "shortstr"),   # expiration
    (1 << 7, "shortstr"),   # message-id
    (1 << 6, "longlong"),   # timestamp
    (1 << 5, "shortstr"),   # type
    (1 << 4, "shortstr"),   # user-id
    (1 << 3, "shortstr"),   # app-id
    (1 << 2, "shortstr"),   # cluster-id
]


def parse_basic_headers(payload: bytes) -> dict:
    """Extract the ``headers`` table from a Basic content-header frame
    payload (class, weight, body size, property flags, property list) —
    empty dict when the publisher set no headers.  Walks every present
    property in spec order so headers parse correctly regardless of which
    other properties (content-type, delivery-mode, ...) are also set."""
    (flags,) = struct.unpack_from(">H", payload, 12)
    off = 14
    for bit, kind in _BASIC_PROPS:
        if not flags & bit:
            continue
        if kind == "table":
            headers, off = parse_table(payload, off)
            return headers
        if kind == "shortstr":
            _, off = parse_shortstr(payload, off)
        elif kind == "octet":
            off += 1
        elif kind == "longlong":
            off += 8
    return {}


def content_header_payload(
    class_id: int, body_size: int, headers: dict | None = None
) -> bytes:
    # weight=0; property flags carry only the headers table when given
    flags = 1 << 13 if headers else 0
    out = struct.pack(">HHQH", class_id, 0, body_size, flags)
    if headers:
        out += encode_table(headers)
    return out


# --- the client --------------------------------------------------------------


class AMQPClient:
    """Single-channel AMQP 0-9-1 consumer.

    >>> c = AMQPClient("rabbit.host", username="svc", password="...")
    >>> c.connect()
    >>> c.declare_queue("telemetry", passive=True)
    >>> for routing_key, body in c.drain("telemetry", max_messages=500):
    ...     handle(routing_key, body)
    >>> c.close()
    """

    CHANNEL = 1

    def __init__(
        self,
        host: str,
        port: int = 5672,
        username: str = "guest",
        password: str = "guest",
        vhost: str = "/",
        timeout: float = 10.0,
        ssl: "bool | object" = False,
    ):
        """``ssl``: False (default) = cleartext TCP — credentials go as
        SASL PLAIN in the clear, loopback/trusted-network only; True = wrap
        the socket with a default-verifying ``ssl.SSLContext`` (amqps,
        port 5671 by convention — pass it explicitly); or pass a
        pre-configured ``SSLContext`` for custom CAs / client certs."""
        self.host, self.port = host, port
        self.username, self.password = username, password
        self.vhost = vhost
        self.timeout = timeout
        self.ssl = ssl
        self._sock: socket.socket | None = None

    # -- frame I/O -----------------------------------------------------------

    def _send(self, ftype: int, channel: int, payload: bytes) -> None:
        assert self._sock is not None
        self._sock.sendall(build_frame(ftype, channel, payload))

    def _send_method(self, cm: tuple[int, int], args: bytes = b"") -> None:
        self._send(FRAME_METHOD, self.CHANNEL if cm[0] != 10 else 0,
                   method_payload(*cm, args))

    def _read_method(self) -> tuple[tuple[int, int], bytes]:
        """Next method frame (heartbeats skipped); server-initiated
        Connection.Close is answered with Close-Ok and raised."""
        assert self._sock is not None
        while True:
            ftype, _ch, payload = read_frame(self._sock)
            if ftype == FRAME_HEARTBEAT:
                continue
            if ftype != FRAME_METHOD:
                raise AMQPError(f"unexpected frame type {ftype}")
            cm = struct.unpack_from(">HH", payload, 0)
            args = payload[4:]
            if cm == CONNECTION_CLOSE:
                (code,) = struct.unpack_from(">H", args, 0)
                text, _ = parse_shortstr(args, 2)
                try:
                    self._send(FRAME_METHOD, 0,
                               method_payload(*CONNECTION_CLOSE_OK))
                finally:
                    self._teardown()
                raise AMQPError(f"server closed connection: {code} {text}")
            if cm == CHANNEL_CLOSE:
                # e.g. 404 NOT_FOUND from a passive declare of a missing
                # queue.  Acknowledge, then tear down: the one channel is
                # dead and reopening it mid-session is not worth the state
                # machine — callers reconnect (the pump's backoff path).
                (code,) = struct.unpack_from(">H", args, 0)
                text, _ = parse_shortstr(args, 2)
                try:
                    self._send(FRAME_METHOD, _ch,
                               method_payload(*CHANNEL_CLOSE_OK))
                finally:
                    self._teardown()
                raise AMQPError(f"server closed channel: {code} {text}")
            return cm, args

    def _expect(self, cm: tuple[int, int]) -> bytes:
        got, args = self._read_method()
        if got != cm:
            raise AMQPError(f"expected {cm}, got {got}")
        return args

    # -- lifecycle -----------------------------------------------------------

    def connect(self) -> None:
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout
        )
        if self.ssl:
            import ssl as _ssl

            ctx = (
                self.ssl
                if isinstance(self.ssl, _ssl.SSLContext)
                else _ssl.create_default_context()
            )
            self._sock = ctx.wrap_socket(self._sock, server_hostname=self.host)
        self._sock.sendall(PROTOCOL_HEADER)
        self._expect(CONNECTION_START)  # server capabilities: not needed
        sasl = b"\x00" + self.username.encode() + b"\x00" + self.password.encode()
        self._send(FRAME_METHOD, 0, method_payload(
            *CONNECTION_START_OK,
            empty_table() + shortstr("PLAIN") + longstr(sasl) + shortstr("en_US"),
        ))
        tune = self._expect(CONNECTION_TUNE)
        channel_max, frame_max, _heartbeat = struct.unpack_from(">HIH", tune, 0)
        # echo the server's limits; heartbeat 0 = disabled.  The persistent
        # pump idles between drains, so a silently-dead peer (broker
        # restart, NAT drop) is detected at the NEXT cycle's send/recv —
        # bounded by pump_interval + the socket timeout — and the backoff
        # reconnect path re-dials.  Acceptable for a polling consumer;
        # a heartbeat thread is not worth the concurrency surface.
        self._send(FRAME_METHOD, 0, method_payload(
            *CONNECTION_TUNE_OK,
            struct.pack(">HIH", channel_max, frame_max, 0),
        ))
        self._send(FRAME_METHOD, 0, method_payload(
            *CONNECTION_OPEN, shortstr(self.vhost) + shortstr("") + b"\x00"
        ))
        self._expect(CONNECTION_OPEN_OK)
        self._send(FRAME_METHOD, self.CHANNEL,
                   method_payload(*CHANNEL_OPEN, shortstr("")))
        self._expect(CHANNEL_OPEN_OK)

    def close(self) -> None:
        if self._sock is None:
            return
        try:
            self._send(FRAME_METHOD, 0, method_payload(
                *CONNECTION_CLOSE,
                struct.pack(">H", 200) + shortstr("bye") + struct.pack(">HH", 0, 0),
            ))
            self._expect(CONNECTION_CLOSE_OK)
        except (AMQPError, OSError):
            pass  # closing anyway
        self._teardown()

    def _teardown(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    # -- consumer surface ----------------------------------------------------

    def declare_queue(
        self, queue: str, passive: bool = False, durable: bool = False
    ) -> int:
        """Declare (or, with ``passive``, assert existence of) a queue;
        returns the broker's current message count."""
        bits = (0b00001 if passive else 0) | (0b00010 if durable else 0)
        self._send_method(
            QUEUE_DECLARE,
            struct.pack(">H", 0) + shortstr(queue) + bytes([bits]) + empty_table(),
        )
        args = self._expect(QUEUE_DECLARE_OK)
        _name, off = parse_shortstr(args, 0)
        (message_count,) = struct.unpack_from(">I", args, off)
        return message_count

    def declare_exchange(
        self,
        exchange: str,
        ex_type: str = "topic",
        passive: bool = False,
        durable: bool = False,
    ) -> None:
        """Declare (or, with ``passive``, assert existence of) an exchange —
        the reference's bus topology entry point (its consumer binds a queue
        to the actor exchange, `AMQP.py:140-160`)."""
        bits = (0b00001 if passive else 0) | (0b00010 if durable else 0)
        self._send_method(
            EXCHANGE_DECLARE,
            struct.pack(">H", 0)
            + shortstr(exchange)
            + shortstr(ex_type)
            + bytes([bits])
            + empty_table(),
        )
        self._expect(EXCHANGE_DECLARE_OK)

    def bind_queue(
        self, queue: str, exchange: str, routing_key: str = "#"
    ) -> None:
        """Bind ``queue`` to ``exchange`` under ``routing_key`` (default
        ``#`` = every message on a topic exchange — the telemetry-bus
        firehose the reference consumes)."""
        self._send_method(
            QUEUE_BIND,
            struct.pack(">H", 0)
            + shortstr(queue)
            + shortstr(exchange)
            + shortstr(routing_key)
            + b"\x00"  # no-wait = false
            + empty_table(),
        )
        self._expect(QUEUE_BIND_OK)

    def get(self, queue: str, no_ack: bool = False):
        """One ``Basic.Get`` poll:
        ``(delivery_tag, routing_key, body, headers)`` or ``None`` when the
        queue is empty.  ``headers`` is the basic-properties headers table
        ({} when the publisher set none) — the reference's actor replies
        carry their sender there, not in the routing key
        (`AMQP.py:105-118`: routing keys on a clu bus are
        ``reply.<commander>``)."""
        assert self._sock is not None
        self._send_method(
            BASIC_GET,
            struct.pack(">H", 0) + shortstr(queue) + (b"\x01" if no_ack else b"\x00"),
        )
        cm, args = self._read_method()
        if cm == BASIC_GET_EMPTY:
            return None
        if cm != BASIC_GET_OK:
            raise AMQPError(f"expected Get-Ok/Get-Empty, got {cm}")
        (delivery_tag,) = struct.unpack_from(">Q", args, 0)
        off = 8 + 1  # + redelivered bit
        _exchange, off = parse_shortstr(args, off)
        routing_key, off = parse_shortstr(args, off)
        body, headers = self._read_content()
        return delivery_tag, routing_key, body, headers

    def _read_content(self) -> tuple[bytes, dict]:
        """Content header frame + body frames until body-size consumed —
        shared by Get-Ok and Deliver."""
        ftype, _ch, payload = read_frame(self._sock)
        if ftype != FRAME_HEADER:
            raise AMQPError(f"expected content header, got frame type {ftype}")
        _cls, _weight, body_size = struct.unpack_from(">HHQ", payload, 0)
        headers = parse_basic_headers(payload)
        body = b""
        while len(body) < body_size:
            ftype, _ch, chunk = read_frame(self._sock)
            if ftype != FRAME_BODY:
                raise AMQPError(f"expected body frame, got type {ftype}")
            body += chunk
        return body, headers

    def ack(self, delivery_tag: int, multiple: bool = False) -> None:
        self._send_method(
            BASIC_ACK,
            struct.pack(">Q", delivery_tag) + (b"\x01" if multiple else b"\x00"),
        )

    def drain(
        self, queue: str, max_messages: int = 1000, ack: bool = True
    ) -> list[tuple[str, bytes]]:
        """Poll up to ``max_messages`` off ``queue``; with ``ack`` each
        message is acknowledged AFTER it is appended to the result (callers
        needing write-then-ack batching — the spool pump — pass
        ``ack=False`` and ack via the returned tags of ``drain_tagged``)."""
        return [(rk, body) for _tag, rk, body, _hdrs in
                self.drain_tagged(queue, max_messages, ack=ack)]

    def drain_tagged(
        self, queue: str, max_messages: int = 1000, ack: bool = True
    ) -> list[tuple[int, str, bytes, dict]]:
        out: list[tuple[int, str, bytes, dict]] = []
        for _ in range(max_messages):
            msg = self.get(queue)
            if msg is None:
                break
            tag, rk, body, headers = msg
            out.append((tag, rk, body, headers))
            if ack:
                self.ack(tag)
        return out

    # -- push mode (Basic.Consume) --------------------------------------------

    def qos(self, prefetch_count: int) -> None:
        """``basic.qos``: cap unacked deliveries the broker pushes ahead —
        the push-mode equivalent of Get's natural batch bound.  0 = unlimited
        (don't: an ack-after-fsync pump would buffer the whole queue)."""
        self._send_method(
            BASIC_QOS, struct.pack(">IH", 0, prefetch_count) + b"\x00"
        )
        self._expect(BASIC_QOS_OK)

    def consume_start(self, queue: str, no_ack: bool = False) -> str:
        """``basic.consume``: register this channel as a push consumer of
        ``queue``; returns the server-assigned consumer tag (pass to
        ``consume_cancel``).  Call ``qos`` first to bound prefetch."""
        bits = 0b0010 if no_ack else 0
        self._send_method(
            BASIC_CONSUME,
            struct.pack(">H", 0)
            + shortstr(queue)
            + shortstr("")  # consumer-tag: let the server assign
            + bytes([bits])
            + empty_table(),
        )
        args = self._expect(BASIC_CONSUME_OK)
        tag, _ = parse_shortstr(args, 0)
        return tag

    def _read_delivery(self, args: bytes) -> tuple[int, str, bytes, dict]:
        _ctag, off = parse_shortstr(args, 0)
        (delivery_tag,) = struct.unpack_from(">Q", args, off)
        off += 8 + 1  # + redelivered bit
        _exchange, off = parse_shortstr(args, off)
        routing_key, off = parse_shortstr(args, off)
        body, headers = self._read_content()
        return delivery_tag, routing_key, body, headers

    def consume_drain(
        self, max_messages: int = 1000, idle_timeout: float = 1.0
    ) -> list[tuple[int, str, bytes, dict]]:
        """Collect pushed ``Deliver``s until ``max_messages`` or the socket
        has been silent for ``idle_timeout`` seconds.  Does NOT ack — the
        pump acks after the spool write, exactly like the Get path.

        The idle timeout is detected between frames; pick it above the
        broker's frame latency (a timeout that fires mid-frame desyncs the
        connection, which surfaces as AMQPError and takes the caller's
        reconnect path — the same failure mode as any half-dead socket).
        """
        assert self._sock is not None
        out: list[tuple[int, str, bytes, dict]] = []
        prev = self._sock.gettimeout()
        self._sock.settimeout(idle_timeout)
        try:
            while len(out) < max_messages:
                try:
                    cm, args = self._read_method()
                except TimeoutError:  # socket.timeout is TimeoutError (3.10+)
                    break
                if cm == BASIC_DELIVER:
                    out.append(self._read_delivery(args))
                elif cm == BASIC_CANCEL:
                    # server-initiated cancel (queue deleted / node failover)
                    raise AMQPError("server cancelled the consumer")
                else:
                    raise AMQPError(f"unexpected method in consume: {cm}")
        finally:
            if self._sock is not None:
                self._sock.settimeout(prev)
        return out

    def consume_cancel(
        self, consumer_tag: str
    ) -> list[tuple[int, str, bytes, dict]]:
        """``basic.cancel``: stop the push flow.  Deliveries already in
        flight between Cancel and Cancel-Ok are drained and RETURNED — the
        caller either processes+acks them or leaves them unacked for the
        broker to requeue on disconnect."""
        self._send_method(BASIC_CANCEL, shortstr(consumer_tag) + b"\x00")
        inflight: list[tuple[int, str, bytes, dict]] = []
        while True:
            cm, args = self._read_method()
            if cm == BASIC_CANCEL_OK:
                return inflight
            if cm == BASIC_DELIVER:
                inflight.append(self._read_delivery(args))
            else:
                raise AMQPError(f"expected Cancel-Ok/Deliver, got {cm}")
