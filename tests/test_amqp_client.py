"""Native AMQP 0-9-1 consumer contract tests — real frames over a loopback
socket (tests/amqp_fake_broker.py), no mocks: handshake, queue declare,
Basic.Get polling, ack-after-spool-write, crash redelivery, and the full
pump → spool → bus_messages_to_points pipeline."""

import pytest
import json

from pyspark.sql import functions as F

from cerebro_spark.sources.amqp_client import AMQPClient
from cerebro_spark.sources.bus import (
    BUS_MESSAGE_SCHEMA,
    amqp_to_spool,
    bus_messages_to_points,
)
from tests.amqp_fake_broker import FakeBroker


def _broker(messages):
    b = FakeBroker(messages)
    b.start()
    return b


def _cfg(broker, **kw):
    return {
        "host": "127.0.0.1",
        "port": broker.port,
        "queue": "telemetry",
        "declare": "active",
        **kw,
    }


def test_client_handshake_get_ack_empty():
    broker = _broker([("lab.sensor", json.dumps({"temp": 21.5}).encode())])
    try:
        c = AMQPClient("127.0.0.1", port=broker.port)
        c.connect()
        assert c.declare_queue("telemetry") == 1
        tag, rk, body, headers = c.get("telemetry")
        assert rk == "lab.sensor" and json.loads(body) == {"temp": 21.5}
        assert headers == {}  # no basic-properties headers published
        c.ack(tag)
        assert c.get("telemetry") is None  # Get-Empty path
        c.close()
        assert broker.acked == [tag]
    finally:
        broker.stop()


@pytest.mark.slow
def test_pump_spools_then_acks_and_is_idempotent(tmp_path):
    msgs = [
        (
            f"actor.{i}",
            json.dumps({"v": float(i), "controller": f"c{i % 2}"}).encode(),
        )
        for i in range(7)
    ] + [("actor.raw", b"\x00not-json\xff")]
    broker = _broker(msgs)
    spool = str(tmp_path / "spool")
    try:
        n = amqp_to_spool(spool, _cfg(broker), batch_size=3)
        assert n == 8
        assert len(broker.acked) == 8 and not broker.unacked
        # a second pump finds the queue empty — no dup spool files
        assert amqp_to_spool(spool, _cfg(broker)) == 0
    finally:
        broker.stop()

    # the spooled batches feed the transport-agnostic pipeline
    from cerebro_spark.session import get_spark

    spark = get_spark("amqp-test")
    messages = spark.read.schema(BUS_MESSAGE_SCHEMA).json(spool)
    assert messages.count() == 8
    pts = bus_messages_to_points(messages, groupers=["controller"], bucket="b")
    rows = {r["measurement"]: r for r in pts.collect()}
    assert rows["actor.3"]["fields"]["v"] == 3.0
    assert rows["actor.3"]["tags"] == {"controller": "c1"}
    # the non-JSON body survived as a raw-string point, not a drop
    assert "not-json" in rows["actor.raw"]["fields_str"]["raw"]


def test_crash_between_spool_write_and_ack_redelivers():
    msgs = [(f"k{i}", json.dumps({"i": i}).encode()) for i in range(5)]
    broker = _broker(msgs)
    try:
        c = AMQPClient("127.0.0.1", port=broker.port)
        c.connect()
        taken = c.drain_tagged("telemetry", max_messages=3, ack=False)
        assert [rk for _, rk, _, _ in taken] == ["k0", "k1", "k2"]
        c._teardown()  # crash before ack
        # next connection sees ALL five again, the first three redelivered
        # in their original order (the broker requeues unacked at the front)
        c2 = AMQPClient("127.0.0.1", port=broker.port)
        c2.connect()
        again = c2.drain("telemetry", max_messages=10, ack=True)
        assert [rk for rk, _ in again] == ["k0", "k1", "k2", "k3", "k4"]
        c2.close()
        assert not broker.unacked and not broker.queue
    finally:
        broker.stop()


def test_pump_after_partial_crash_no_message_loss(tmp_path):
    """At-least-once end-to-end: a pump that dies between spool-write and
    ack leaves the batch in the broker; the next pump re-spools it (dup
    rows possible, loss impossible)."""
    msgs = [(f"k{i}", json.dumps({"i": i}).encode()) for i in range(4)]
    broker = _broker(msgs)
    spool = str(tmp_path / "spool")
    try:
        # simulate the crash with a client that writes the spool then dies
        from cerebro_spark.sources.bus import publish_messages

        c = AMQPClient("127.0.0.1", port=broker.port)
        c.connect()
        taken = c.drain_tagged("telemetry", max_messages=2, ack=False)
        publish_messages(
            spool, [(rk, json.loads(b)) for _, rk, b, _ in taken]
        )
        c._teardown()  # died before ack

        n = amqp_to_spool(spool, _cfg(broker))
        assert n == 4  # the 2 unacked redeliveries + the 2 never-seen
    finally:
        broker.stop()

    from cerebro_spark.session import get_spark

    spark = get_spark("amqp-test")
    df = spark.read.schema(BUS_MESSAGE_SCHEMA).json(spool)
    # 2 spooled by the crashed pump + 4 by the recovery pump; every
    # original message present at least once
    assert df.count() == 6
    senders = {r["sender"] for r in df.select("sender").distinct().collect()}
    assert senders == {"k0", "k1", "k2", "k3"}


def test_amqp_source_via_config_runner(spark, tmp_path):
    """config-declared `type: amqp` source: the pump thread drains the
    loopback broker into the spool, the streaming query turns the spool
    into enriched points in the store, and IngestRunner.stop also stops
    the pump thread."""
    import time

    from cerebro_spark.config.loader import _PUMP_THREADS, IngestRunner

    msgs = [
        (f"actor.{i}", json.dumps({"v": float(i), "controller": "sp1"}).encode())
        for i in range(6)
    ]
    broker = _broker(msgs)
    try:
        runner = IngestRunner(
            spark,
            {
                "sources": {
                    "bus1": {
                        "type": "amqp",
                        "host": "127.0.0.1",
                        "port": broker.port,
                        "queue": "telemetry",
                        "declare": "active",
                        "spool_dir": str(tmp_path / "spool"),
                        "pump_interval": 0.2,
                        "groupers": ["controller"],
                        "delay": 1,
                    }
                }
            },
            store_path=str(tmp_path / "store"),
            checkpoint_root=str(tmp_path / "ckpt"),
        )
        runner.start()
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(str(tmp_path / "store")).count()
            except Exception:
                n = 0
            if n >= 6:
                break
            time.sleep(1)
        pump_key = (str(tmp_path / "ckpt"), "bus1")  # (runner ns, source)
        pump_thread = _PUMP_THREADS[pump_key][0]
        assert runner.metrics()["bus1"]["pump_alive"] is True
        runner.stop()
        assert n >= 6
        out = spark.read.parquet(str(tmp_path / "store"))
        rows = {r["measurement"]: r for r in out.collect()}
        assert rows["actor.4"]["fields"]["v"] == 4.0
        assert rows["actor.4"]["tags"]["controller"] == "sp1"
        assert len(broker.acked) == 6 and not broker.unacked
        # the pump thread was signalled and winds down with the source
        assert pump_key not in _PUMP_THREADS
        pump_thread.join(timeout=10)
        assert not pump_thread.is_alive()
    finally:
        broker.stop()


def test_exchange_bind_consumer_topology(tmp_path):
    """Reference parity (`AMQP.py:140-160`): the consumer binds its queue
    into a pre-existing exchange topology.  With `exchange` configured the
    pump asserts the exchange (passively, when declare is passive... here
    'active' creates the queue but the exchange 'actors' pre-exists) and
    binds queue->exchange under the binding key before draining."""
    broker = _broker([("reply.c1", json.dumps({"v": 1.0}).encode())])
    spool = str(tmp_path / "spool")
    try:
        n = amqp_to_spool(
            spool,
            _cfg(broker, exchange="actors", binding_key="reply.#"),
        )
        assert n == 1
        assert broker.bindings == [("telemetry", "actors", "reply.#")]
    finally:
        broker.stop()


def test_passive_declare_missing_exchange_raises_404():
    """RabbitMQ fails a passive declare of a missing exchange with
    Channel.Close 404 — the client must surface it and tear down, exactly
    like the missing-queue path."""
    import pytest

    broker = _broker([])
    try:
        c = AMQPClient("127.0.0.1", port=broker.port)
        c.connect()
        c.declare_exchange("actors", passive=True)  # pre-existing: fine
        with pytest.raises(Exception, match="404"):
            c.declare_exchange("ghosts", passive=True)
        assert c._sock is None
    finally:
        broker.stop()


def test_passive_declare_missing_queue_raises_404():
    """RabbitMQ fails a passive declare of a missing queue with
    Channel.Close 404; the client must reply Close-Ok, tear down, and
    surface a clear error (the pump's backoff path retries)."""
    import pytest

    broker = _broker([])
    try:
        c = AMQPClient("127.0.0.1", port=broker.port)
        c.connect()
        with pytest.raises(Exception, match="404"):
            c.declare_queue("missing", passive=True)
        assert c._sock is None  # channel dead -> client tears down
    finally:
        broker.stop()


def test_amqp_source_missing_params_fail_fast(spark, tmp_path):
    """A misconfigured amqp source (missing required params) fails at
    start() — it must NOT spawn a pump thread that would silently retry a
    permanent config error behind its keep-running backoff forever."""
    import pytest

    from cerebro_spark.config.loader import _PUMP_THREADS, IngestRunner

    runner = IngestRunner(
        spark,
        {"sources": {"bad": {"type": "amqp", "host": "127.0.0.1",
                             "spool_dir": str(tmp_path / "s")}}},
        store_path=str(tmp_path / "store"),
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    with pytest.raises(KeyError, match="queue"):
        runner.start()
    assert all(name != "bad" for _ns, name in _PUMP_THREADS)


def test_amqp_source_bad_port_fails_fast(spark, tmp_path):
    """A non-numeric port is a permanent config error — it must raise at
    start(), not back off silently inside the pump's retry loop."""
    import pytest

    from cerebro_spark.config.loader import _PUMP_THREADS, IngestRunner

    runner = IngestRunner(
        spark,
        {"sources": {"badport": {"type": "amqp", "host": "127.0.0.1",
                                 "port": "rabbit", "queue": "telemetry",
                                 "spool_dir": str(tmp_path / "s")}}},
        store_path=str(tmp_path / "store"),
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    with pytest.raises(ValueError, match="port"):
        runner.start()
    assert all(name != "badport" for _ns, name in _PUMP_THREADS)


def test_sender_header_overrides_routing_key(tmp_path):
    """Reference parity (`AMQP.py:105-118`): on a clu bus the routing key
    is `reply.<commander>` — the replying actor is in the message headers.
    The pump must prefer the `sender` header and fall back to the routing
    key for bare publishers."""
    broker = _broker([
        ("reply.commander1", json.dumps({"v": 1.0}).encode(),
         {"sender": "scale_actor", "message_id": 7}),
        ("plain.route", json.dumps({"v": 2.0}).encode()),  # no headers
    ])
    spool = str(tmp_path / "spool")
    try:
        assert amqp_to_spool(spool, _cfg(broker)) == 2
    finally:
        broker.stop()

    senders = set()
    import glob

    for f in glob.glob(spool + "/*.json"):
        with open(f) as fh:
            senders.update(json.loads(line)["sender"] for line in fh)
    assert senders == {"scale_actor", "plain.route"}


def test_field_table_codec_roundtrip_property():
    """encode_table ∘ parse_table == identity for every value shape the
    encoder emits (str/bool/int/float/None/nested dict) — property-based,
    because header tables come from arbitrary publishers."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from cerebro_spark.sources.amqp_client import encode_table, parse_table

    scalars = st.one_of(
        st.booleans(),  # before ints: bool is an int subclass in Python
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.floats(allow_nan=False, allow_infinity=False),
        st.text(max_size=40),
        st.none(),
    )
    tables = st.dictionaries(
        st.text(min_size=1, max_size=30),
        st.one_of(
            scalars,
            st.dictionaries(st.text(min_size=1, max_size=10), scalars, max_size=3),
        ),
        max_size=8,
    )

    @given(tables)
    @settings(max_examples=200, deadline=None)
    def roundtrip(table):
        buf = encode_table(table)
        parsed, off = parse_table(buf, 0)
        assert parsed == table
        assert off == len(buf)

    roundtrip()


def test_client_parses_headers_table():
    """The basic-properties headers table round-trips through the real
    content-header frame (longstr/bool/int/float/nested values)."""
    hdrs = {"sender": "a1", "ok": True, "n": 3, "x": 1.5,
            "nested": {"k": "v"}}
    broker = _broker([("rk", b"{}", hdrs)])
    try:
        c = AMQPClient("127.0.0.1", port=broker.port)
        c.connect()
        tag, rk, _body, headers = c.get("telemetry")
        assert headers == hdrs
        c.ack(tag)
        c.close()
    finally:
        broker.stop()


def test_user_alias_matches_reference_config_key(spark, tmp_path):
    """The reference AMQPSource config key is `user`; a migrated cerebro
    YAML must authenticate as that user, not silently as guest."""
    import cerebro_spark.config.loader as loader_mod
    from cerebro_spark.config.loader import SOURCE_REGISTRY, _PUMP_NAMESPACE

    # build directly (no runner) with `user`: the pump must authenticate
    # as that user — the loopback broker records the SASL PLAIN response
    broker = _broker([])
    try:
        df = SOURCE_REGISTRY["amqp"](
            spark, "aliascheck",
            host="127.0.0.1", port=broker.port, queue="telemetry",
            declare="active", user="svc_account",
            spool_dir=str(tmp_path / "spool"), pump_interval=60,
        )
        assert df is not None
        # the spawned pump connects as svc_account: the fake broker records
        # the SASL response of the last handshake
        import time

        deadline = time.time() + 10
        while time.time() < deadline and broker.last_sasl is None:
            time.sleep(0.1)
        assert broker.last_sasl is not None
        assert broker.last_sasl.split(b"\x00")[1] == b"svc_account"
    finally:
        loader_mod._stop_pump(_PUMP_NAMESPACE.get(), "aliascheck")
        broker.stop()


# ---------------------------------------------------------------------------
# Basic.Consume push mode
# ---------------------------------------------------------------------------

def test_consume_push_respects_prefetch_and_acks():
    msgs = [(f"k{i}", json.dumps({"i": i}).encode()) for i in range(5)]
    broker = _broker(msgs)
    try:
        c = AMQPClient("127.0.0.1", port=broker.port)
        c.connect()
        c.declare_queue("telemetry")
        c.qos(2)  # broker may push at most 2 unacked
        ctag = c.consume_start("telemetry")
        first = c.consume_drain(max_messages=10, idle_timeout=0.3)
        # prefetch window of 2 with no acks -> exactly 2 in flight
        assert [rk for _, rk, _, _ in first] == ["k0", "k1"]
        assert len(broker.unacked) == 2 and len(broker.queue) == 3
        # acking frees the window -> the broker pushes the next 2 (the
        # window refills per ack, so k4 stays queued until another ack)
        c.ack(first[-1][0], multiple=True)
        rest = c.consume_drain(max_messages=10, idle_timeout=0.3)
        assert [rk for _, rk, _, _ in rest] == ["k2", "k3"]
        c.ack(rest[-1][0], multiple=True)
        last = c.consume_drain(max_messages=10, idle_timeout=0.3)
        assert [rk for _, rk, _, _ in last] == ["k4"]
        c.ack(last[-1][0], multiple=True)
        assert c.consume_cancel(ctag) == []
        c.close()
        assert sorted(broker.acked) == [1, 2, 3, 4, 5]
        assert not broker.unacked and not broker.queue
    finally:
        broker.stop()


def test_consume_cancel_returns_inflight_deliveries():
    msgs = [(f"k{i}", json.dumps({"i": i}).encode()) for i in range(3)]
    broker = _broker(msgs)
    try:
        c = AMQPClient("127.0.0.1", port=broker.port)
        c.connect()
        c.declare_queue("telemetry")
        c.qos(0)  # unlimited: everything is pushed immediately
        ctag = c.consume_start("telemetry")
        # cancel WITHOUT draining: the pushed deliveries race the Cancel-Ok
        # and must come back from consume_cancel, not be lost
        inflight = c.consume_cancel(ctag)
        assert [rk for _, rk, _, _ in inflight] == ["k0", "k1", "k2"]
        c._teardown()  # drop without acking -> broker requeues all three
        c2 = AMQPClient("127.0.0.1", port=broker.port)
        c2.connect()
        again = c2.drain("telemetry", max_messages=10, ack=True)
        assert [rk for rk, _ in again] == ["k0", "k1", "k2"]
        c2.close()
    finally:
        broker.stop()


def test_pump_consume_mode_spools_everything(tmp_path):
    msgs = [
        (f"actor.{i}", json.dumps({"v": float(i)}).encode()) for i in range(9)
    ]
    broker = _broker(msgs)
    spool = str(tmp_path / "spool")
    try:
        cfg = _cfg(broker, mode="consume", idle_timeout=0.3)
        n = amqp_to_spool(spool, cfg, batch_size=4)
        assert n == 9
        assert len(broker.acked) == 9
        assert not broker.unacked and not broker.queue
        # a second consume-mode pump on the empty queue spools nothing
        assert amqp_to_spool(spool, cfg, batch_size=4) == 0
    finally:
        broker.stop()
    spooled = []
    for f in sorted((tmp_path / "spool").glob("*.json")):
        spooled += [json.loads(line) for line in f.read_text().splitlines()]
    assert sorted(m["sender"] for m in spooled) == sorted(
        f"actor.{i}" for i in range(9)
    )


def test_amqp_source_config_runner_consume_mode(spark, tmp_path):
    """`type: amqp` with `mode: consume`: the loader passes mode/idle_timeout
    through to the pump, which drains via Basic.Consume push — same store
    output and ack accounting as the Get path."""
    import time

    from cerebro_spark.config.loader import IngestRunner

    msgs = [
        (f"actor.{i}", json.dumps({"v": float(i), "controller": "sp2"}).encode())
        for i in range(5)
    ]
    broker = _broker(msgs)
    try:
        runner = IngestRunner(
            spark,
            {
                "sources": {
                    "busc": {
                        "type": "amqp",
                        "host": "127.0.0.1",
                        "port": broker.port,
                        "queue": "telemetry",
                        "declare": "active",
                        "mode": "consume",
                        "idle_timeout": 0.3,
                        "spool_dir": str(tmp_path / "spool"),
                        "pump_interval": 0.2,
                        "groupers": ["controller"],
                        "delay": 1,
                    }
                }
            },
            store_path=str(tmp_path / "store"),
            checkpoint_root=str(tmp_path / "ckpt"),
        )
        runner.start()
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(str(tmp_path / "store")).count()
            except Exception:
                n = 0
            if n >= 5:
                break
            time.sleep(1)
        runner.stop()
        assert n >= 5
        rows = {
            r["measurement"]: r
            for r in spark.read.parquet(str(tmp_path / "store")).collect()
        }
        assert rows["actor.2"]["fields"]["v"] == 2.0
        assert len(broker.acked) == 5 and not broker.unacked
    finally:
        broker.stop()


def test_pump_consume_mode_cap_is_exact_with_owned_client(tmp_path):
    """max_messages is exact in consume mode when the pump owns the
    connection: cancel-racing deliveries are left unacked and requeue on
    close instead of being spooled past the cap."""
    msgs = [(f"k{i}", json.dumps({"i": i}).encode()) for i in range(9)]
    broker = _broker(msgs)
    spool = str(tmp_path / "spool")
    try:
        cfg = _cfg(broker, mode="consume", idle_timeout=0.3)
        n = amqp_to_spool(spool, cfg, max_messages=4, batch_size=100)
        assert n == 4
        assert len(broker.acked) == 4
        # the rest requeued on close — nothing stranded unacked
        assert not broker.unacked and len(broker.queue) == 5
        # a second pump picks up exactly the remainder
        assert amqp_to_spool(spool, cfg, max_messages=100, batch_size=100) == 5
        assert not broker.unacked and not broker.queue
    finally:
        broker.stop()


def test_pump_rejects_unknown_mode(tmp_path):
    import pytest as _pytest

    broker = _broker([])
    try:
        with _pytest.raises(ValueError, match="mode must be"):
            amqp_to_spool(
                str(tmp_path / "spool"), _cfg(broker, mode="push")
            )
    finally:
        broker.stop()
