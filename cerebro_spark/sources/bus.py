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


def read_bus_stream(spark: SparkSession, spool_dir: str) -> DataFrame:
    """Consumer side: streaming frame of ``(sender, body)`` messages.  For a
    Kafka bus replace with ``format("kafka")`` + the same two-column select —
    the downstream pipeline is transport-agnostic."""
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
