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
    ``messages`` = [(sender, body_dict), ...].  Written via tmp-name + rename
    so the streaming file source never sees a partial file."""
    os.makedirs(spool_dir, exist_ok=True)
    name = f"batch-{uuid.uuid4().hex}.json"
    tmp = os.path.join(spool_dir, f".{name}.tmp")
    with open(tmp, "w") as fh:
        for sender, body in messages:
            fh.write(json.dumps({"sender": sender, "body": json.dumps(body)}))
            fh.write("\n")
    final = os.path.join(spool_dir, name)
    os.rename(tmp, final)
    return final


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
