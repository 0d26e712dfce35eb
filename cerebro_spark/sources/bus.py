"""Message-bus transport for actor replies (S5) — Structured Streaming shape.

The reference subscribes to a RabbitMQ exchange and turns every actor reply
into points: flatten the JSON body, promote grouper subkeys to tags,
allow-list filter flattened keys, measurement = sender
(`/root/reference/cerebro/sources/AMQP.py:85-216`).

Spark-native transport: the bus is any Structured Streaming source producing
``(sender, body)`` message rows.  On a real cluster that is the Kafka reader
(``spark.readStream.format("kafka")`` — RabbitMQ exchanges bridge to Kafka
topics); offline and in tests it is a file-backed spool directory (one JSON
file per producer batch, the standard file-source contract: files appear
atomically, Spark tracks processed files in the checkpoint).  Everything
downstream of the message frame is shared, so swapping transports is a
one-line change.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: message frame every bus transport must produce.
BUS_MESSAGE_SCHEMA = "sender string, body string"

#: the fixed output schema of Spark's Kafka source (kafka-0-10-sql) — what
#: ``kafka_frame_to_messages`` maps FROM.  Pinned here so the no-broker
#: contract test can construct it and prove the mapping lands on
#: BUS_MESSAGE_SCHEMA.
KAFKA_SOURCE_SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset long, timestamp timestamp, timestampType int"
)


def kafka_bus_options(config: dict) -> dict[str, str]:
    """Reader options for the Kafka transport, derived from the SAME config
    dict the file-spool path uses (``config/loader.py`` source entries):
    ``bootstrap_servers`` + ``topic`` required, ``starting_offsets`` /
    ``fail_on_data_loss`` / ``max_offsets_per_trigger`` optional.  Kept as a
    pure function so tests pin the option names without a broker."""
    opts = {
        "kafka.bootstrap.servers": config["bootstrap_servers"],
        "subscribe": config["topic"],
        "startingOffsets": config.get("starting_offsets", "earliest"),
        # the bus is telemetry, not a ledger: expired/compacted offsets warn
        # rather than kill the ingest daemon (C5's keep-running posture)
        "failOnDataLoss": str(config.get("fail_on_data_loss", False)).lower(),
    }
    if "max_offsets_per_trigger" in config:
        opts["maxOffsetsPerTrigger"] = str(config["max_offsets_per_trigger"])
    return opts


def kafka_frame_to_messages(kafka_df: DataFrame) -> DataFrame:
    """Kafka record frame → the canonical ``(sender, body)`` message frame.
    sender = the record key utf8-decoded (the AMQP routing-key analog,
    `AMQP.py:105-118`), falling back to the topic for key-less producers;
    body = the value utf8-decoded.  Works on streaming and batch frames."""
    return kafka_df.select(
        F.coalesce(F.col("key").cast("string"), F.col("topic")).alias(
            "sender"
        ),
        F.col("value").cast("string").alias("body"),
    )


def publish_messages(spool_dir: str, messages: list[tuple[str, dict]]) -> str:
    """Producer side of the file bus: append one JSON-lines file containing
    ``messages`` = [(sender, body_dict), ...].  Written via tmp-name +
    fsync + rename + directory fsync, so the streaming file source never
    sees a partial file AND a batch that has been acknowledged upstream
    (the AMQP pump acks after this returns) survives a power failure, not
    just a process crash."""
    os.makedirs(spool_dir, exist_ok=True)
    name = f"batch-{uuid.uuid4().hex}.json"
    tmp = os.path.join(spool_dir, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for sender, body in messages:
            fh.write(json.dumps({"sender": sender, "body": json.dumps(body)}))
            fh.write("\n")
        fh.flush()
        os.fsync(fh.fileno())
    final = os.path.join(spool_dir, name)
    os.rename(tmp, final)
    dir_fd = os.open(spool_dir, os.O_RDONLY)
    try:
        os.fsync(dir_fd)  # persist the rename itself
    finally:
        os.close(dir_fd)
    return final


def amqp_to_spool(
    spool_dir: str,
    amqp: dict,
    max_messages: int = 1000,
    batch_size: int = 100,
    client=None,
) -> int:
    """Native RabbitMQ consumer → file-bus spool pump: drain the queue with
    the dependency-free 0-9-1 client (``sources/amqp_client.py``), write
    each batch to the spool via the atomic-rename ``publish_messages``, and
    ack ONLY AFTER the batch file is durably in place — a crash between
    write and ack redelivers the batch (at-least-once; duplicate telemetry
    points collapse downstream at the T8 sort+dedup stage).  Returns the
    number of messages spooled.

    ``amqp`` config keys: ``host`` (required), ``port``/``username``/
    ``password``/``vhost`` (defaults: 5672/guest/guest//), ``queue``
    (required), ``declare`` ("passive" default — assert the queue exists;
    "active" creates it, for tests/dev); optionally ``exchange`` (+
    ``exchange_type`` default "topic", ``binding_key`` default "#") to
    bind the queue to an existing exchange before draining — the
    reference's topology (its consumer binds to the actor exchange,
    `AMQP.py:140-160`), so pointing this pump at a clu bus needs no
    manual broker setup.  The exchange itself is asserted passively
    unless ``declare`` is "active" (tests/dev create it).

    ``mode``: "get" (default) polls with ``Basic.Get`` — one round-trip per
    message, fine for telemetry rates; "consume" registers a
    ``Basic.Consume`` push consumer with ``basic.qos`` prefetch =
    ``min(batch_size, max_messages)`` (at most one unspooled batch in
    flight) and collects deliveries until ``idle_timeout`` seconds of
    silence — the higher-throughput path when the queue outruns the Get
    round-trip.  Both modes share the same ack-after-spool-write contract.
    Cap semantics: with an owned connection ``max_messages`` is exact
    (cancel-racing deliveries are left unacked and requeue on close); with
    a caller-provided ``client`` they are spooled+acked instead — the
    connection stays open, so stranding them unacked would make them
    invisible — and the return value may exceed ``max_messages`` by up to
    the prefetch window.

    sender = the message's basic-properties ``sender`` header when present
    — the reference derives sender from the message header, not the routing
    key (`AMQP.py:105-118`; clu routing keys are ``reply.<commander>``, the
    commander, not the replying actor) — falling back to the routing key
    for bare publishers (tests, plain telemetry producers).  body must be a
    JSON object — non-JSON bodies are spooled as
    ``{"raw": <utf8-replaced text>}`` so nothing is silently dropped and
    the flatten stage still yields a (diagnosable) point.

    Run the pump from a scheduler loop (the daemon's trigger cadence or
    cron) next to the streaming query reading the spool; Spark's file
    source gives the downstream pipeline exactly-once over the spool files.
    Cluster alternative remains the Kafka transport below.

    Pass ``client`` (a connected ``AMQPClient``) to reuse one broker
    connection across pump cycles — the config-driven pump thread does;
    ownership stays with the caller (not closed here).
    """
    from cerebro_spark.sources.amqp_client import AMQPClient, AMQPError

    own_client = client is None
    if own_client:
        client = AMQPClient(
            amqp["host"],
            port=int(amqp.get("port", 5672)),
            username=amqp.get("username", "guest"),
            password=amqp.get("password", "guest"),
            vhost=amqp.get("vhost", "/"),
            ssl=amqp.get("ssl", False),
        )
        client.connect()
    queue = amqp["queue"]
    total = 0
    try:
        passive = amqp.get("declare", "passive") == "passive"
        client.declare_queue(queue, passive=passive)
        if amqp.get("exchange"):
            client.declare_exchange(
                amqp["exchange"],
                ex_type=amqp.get("exchange_type", "topic"),
                passive=passive,
            )
            client.bind_queue(
                queue, amqp["exchange"], amqp.get("binding_key", "#")
            )
        def _spool_and_ack(tagged) -> None:
            messages = []
            for _tag, routing_key, body, headers in tagged:
                try:
                    payload = json.loads(body)
                    if not isinstance(payload, dict):
                        raise ValueError("non-object JSON body")
                except (ValueError, UnicodeDecodeError):
                    payload = {"raw": body.decode("utf-8", errors="replace")}
                sender = headers.get("sender")
                if not isinstance(sender, str) or not sender:
                    sender = routing_key
                messages.append((sender, payload))
            publish_messages(spool_dir, messages)
            # batch is on disk — now release it broker-side (multiple-ack
            # up to the batch's last delivery tag)
            client.ack(tagged[-1][0], multiple=True)

        mode = amqp.get("mode", "get")
        if mode not in ("get", "consume"):
            # fail loudly: a typo'd mode silently falling back to Get would
            # leave a high-rate queue on the slow path with no diagnostics
            raise ValueError(
                f"amqp mode must be 'get' or 'consume', got {mode!r}"
            )
        if mode == "consume":
            # push mode: the broker streams ahead of the client, bounded by
            # the prefetch window (≤ one batch AND ≤ the per-call cap, so
            # cancel-racing deliveries can never blow max_messages by more
            # than the window)
            client.qos(min(batch_size, max_messages))
            ctag = client.consume_start(queue)
            try:
                while total < max_messages:
                    tagged = client.consume_drain(
                        max_messages=min(batch_size, max_messages - total),
                        idle_timeout=float(amqp.get("idle_timeout", 1.0)),
                    )
                    if not tagged:
                        break
                    _spool_and_ack(tagged)
                    total += len(tagged)
            finally:
                # Cancel cleanly only if the connection is still alive — a
                # torn-down client (broker restart mid-drain) must not have
                # its AMQPError replaced by a second failure from writing
                # Basic.Cancel to a dead socket.
                if client._sock is not None:
                    try:
                        inflight = client.consume_cancel(ctag)
                    except (AMQPError, OSError):
                        inflight = []  # connection died racing the cancel
                    if inflight and own_client:
                        # leaving them unacked is safe AND keeps the
                        # max_messages cap honest: close() below drops the
                        # connection and the broker requeues unacked
                        pass
                    elif inflight:
                        # reused connection: unacked deliveries would stay
                        # invisible until the connection drops — spool+ack
                        # them (documented overshoot ≤ the prefetch window)
                        _spool_and_ack(inflight)
                        total += len(inflight)
        else:
            while total < max_messages:
                tagged = client.drain_tagged(
                    queue, min(batch_size, max_messages - total), ack=False
                )
                if not tagged:
                    break
                _spool_and_ack(tagged)
                total += len(tagged)
    finally:
        if own_client:
            client.close()
    return total


def read_bus_stream(
    spark: SparkSession,
    spool_dir: str | None = None,
    kafka: dict | None = None,
) -> DataFrame:
    """Consumer side: streaming frame of ``(sender, body)`` messages from
    either transport — ``spool_dir`` (file bus: offline/tests) or ``kafka``
    (a config dict for ``kafka_bus_options``; cluster deployments).  The
    downstream pipeline (``bus_messages_to_points`` onward) is
    transport-agnostic."""
    if (spool_dir is None) == (kafka is None):
        raise ValueError("exactly one of spool_dir / kafka is required")
    if kafka is not None:
        reader = spark.readStream.format("kafka")
        for k, v in kafka_bus_options(kafka).items():
            reader = reader.option(k, v)
        return kafka_frame_to_messages(reader.load())
    return spark.readStream.schema(BUS_MESSAGE_SCHEMA).json(spool_dir)


def bus_messages_to_points(
    messages: DataFrame,
    groupers: list[str] | None = None,
    keywords: list[str] | None = None,
    bucket: str | None = None,
) -> DataFrame:
    """Actor replies → canonical points (the ``process_keyword`` semantics,
    `AMQP.py:192-216`): flatten the JSON body (lists dropped), groupers → tags,
    optional allow-list on flattened keys, measurement = sender.  Works on
    both streaming and batch frames — flattening is the Arrow ``mapInPandas``
    stage shared with the batch parser."""
    from cerebro_spark.functions.parsers import flatten_json_dynamic

    flat = flatten_json_dynamic(messages, json_col="body", groupers=groupers)
    if keywords:
        from cerebro_spark.functions.parsers import map_allowlist

        for mcol in ("fields", "fields_str", "fields_bool"):
            flat = map_allowlist(flat, keywords, map_col=mcol)
    return flat.select(
        F.col("sender").alias("measurement"),
        F.col("groupings").alias("tags"),
        "fields",
        "fields_str",
        "fields_bool",
        F.lit(None).cast("timestamp").alias("time"),  # stamped centrally (T5)
        F.lit(bucket).alias("bucket"),
    )
