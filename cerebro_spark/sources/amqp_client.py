"""Native AMQP 0-9-1 consumer (RabbitMQ-compatible) — no client library.

The reference's bus source subscribes to a RabbitMQ exchange via aio-pika
(`/root/reference/cerebro/sources/AMQP.py:85-216`); this container has no
AMQP library and no broker, so this module speaks the wire protocol
directly: a minimal, dependency-free 0-9-1 client covering exactly the
consumer surface the bus transport needs — PLAIN auth handshake, one
channel, passive/active queue declare, ``Basic.Get`` polling, and
``Basic.Ack``.

Why ``Basic.Get`` (poll) rather than ``Basic.Consume`` (push): every other
external feed in this engine is a poll transport (``sources/poll.py`` —
TCP/UDP/HTTP/TPM), pull bounds batch size naturally, and the broker keeps
the delivery cursor — so the spool pump (``bus.amqp_to_spool``) gets
at-least-once semantics from ack-after-write with zero client state.
RabbitMQ documents basic.get as lower-throughput than consume; the pump
amortizes that by draining in batches, and telemetry buses (the reference's
actor replies) are low-rate.

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
QUEUE_DECLARE = (50, 10)
QUEUE_DECLARE_OK = (50, 11)
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


def content_header_payload(class_id: int, body_size: int) -> bytes:
    # weight=0, no properties (flags=0)
    return struct.pack(">HHQH", class_id, 0, body_size, 0)


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
    ):
        self.host, self.port = host, port
        self.username, self.password = username, password
        self.vhost = vhost
        self.timeout = timeout
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

    def get(self, queue: str, no_ack: bool = False):
        """One ``Basic.Get`` poll: ``(delivery_tag, routing_key, body)`` or
        ``None`` when the queue is empty."""
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
        # content header then body frames until body_size consumed
        ftype, _ch, payload = read_frame(self._sock)
        if ftype != FRAME_HEADER:
            raise AMQPError(f"expected content header, got frame type {ftype}")
        _cls, _weight, body_size = struct.unpack_from(">HHQ", payload, 0)
        body = b""
        while len(body) < body_size:
            ftype, _ch, chunk = read_frame(self._sock)
            if ftype != FRAME_BODY:
                raise AMQPError(f"expected body frame, got type {ftype}")
            body += chunk
        return delivery_tag, routing_key, body

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
        return [(rk, body) for _tag, rk, body in
                self.drain_tagged(queue, max_messages, ack=ack)]

    def drain_tagged(
        self, queue: str, max_messages: int = 1000, ack: bool = True
    ) -> list[tuple[int, str, bytes]]:
        out: list[tuple[int, str, bytes]] = []
        for _ in range(max_messages):
            msg = self.get(queue)
            if msg is None:
                break
            tag, rk, body = msg
            out.append((tag, rk, body))
            if ack:
                self.ack(tag)
        return out
