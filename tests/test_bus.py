"""File-backed message bus end-to-end (S5 transport): publish actor replies
to the spool, stream them through flatten → points → central ingest, and
check the reference's AMQP semantics (`AMQP.py:192-216`) on the stored rows."""

import time

from pyspark.sql import functions as F

from cerebro_spark.sources.bus import (
    bus_messages_to_points,
    publish_messages,
    read_bus_stream,
)


MESSAGES = [
    (
        "lvmscp",
        {
            "status": {
                "mod2": {"tempa": 21.3, "tempb": 20.9},
                "controller": "sp2",
                "names": [1, 2],  # lists dropped by the flattener
            }
        },
    ),
    ("lvmscp", {"status": {"mod2": {"tempa": 22.0}, "controller": "sp3"}}),
    ("archon", {"power": True, "state": "IDLE"}),
]


def test_bus_points_batch_semantics(spark):
    msgs = spark.createDataFrame(
        [(s, __import__("json").dumps(b)) for s, b in MESSAGES],
        "sender string, body string",
    )
    pts = bus_messages_to_points(msgs, groupers=["controller"]).collect()
    by_m = {}
    for r in pts:
        by_m.setdefault(r["measurement"], []).append(r)
    scp = sorted(by_m["lvmscp"], key=lambda r: r["fields"]["status.mod2.tempa"])[0]
    assert scp["fields"] == {"status.mod2.tempa": 21.3, "status.mod2.tempb": 20.9}
    assert scp["tags"] == {"controller": "sp2"}  # grouper promoted to tag
    assert "status.names" not in scp["fields"]   # list dropped
    arc = by_m["archon"][0]
    assert arc["fields_bool"] == {"power": True}
    assert arc["fields_str"] == {"state": "IDLE"}


def test_bus_allowlist(spark):
    import json

    msgs = spark.createDataFrame(
        [(s, json.dumps(b)) for s, b in MESSAGES], "sender string, body string"
    )
    pts = bus_messages_to_points(
        msgs, groupers=["controller"], keywords=["status.mod2.tempa"]
    )
    rows = pts.filter(F.col("measurement") == "lvmscp").collect()
    for r in rows:
        assert set(r["fields"].keys()) <= {"status.mod2.tempa"}


def test_bus_stream_to_store_end_to_end(spark, tmp_path):
    from cerebro_spark.streaming.ingest import run_ingest

    spool = str(tmp_path / "spool")
    publish_messages(spool, MESSAGES[:2])
    store = str(tmp_path / "store")
    stream = read_bus_stream(spark, spool)
    pts = bus_messages_to_points(stream, groupers=["controller"], bucket="actors")
    q = run_ingest(
        spark,
        pts,
        sink_path=store,
        checkpoint=str(tmp_path / "ckpt"),
        instance_tags={"observatory": "lco"},
        default_bucket="actors",
        available_now=True,
        query_name="bus-e2e",
    )
    q.awaitTermination(120)

    # second producer batch + second drain on the same checkpoint: only the
    # new file is processed (bus offset tracking via file-source checkpoint)
    publish_messages(spool, MESSAGES[2:])
    q2 = run_ingest(
        spark,
        read_bus_stream(spark, spool).transform(
            lambda df: bus_messages_to_points(
                df, groupers=["controller"], bucket="actors"
            )
        ),
        sink_path=store,
        checkpoint=str(tmp_path / "ckpt"),
        instance_tags={"observatory": "lco"},
        default_bucket="actors",
        available_now=True,
        query_name="bus-e2e-2",
    )
    q2.awaitTermination(120)

    out = spark.read.parquet(store)
    assert out.count() == 3  # no duplicates across restarts
    assert out.filter(F.col("time").isNull()).count() == 0  # T5 stamped
    tags = {r["tags"].get("controller") for r in out.collect()}
    assert {"sp2", "sp3", None} == tags
    # instance tags merged, point tags win on conflict (T6)
    assert all(r["tags"]["observatory"] == "lco" for r in out.collect())
    assert {r["measurement"] for r in out.collect()} == {"lvmscp", "archon"}


def test_kafka_transport_contract_pinned(spark):
    """VERDICT r3 ask #7 — the 'one-line swap' claim, pinned without a
    broker: (a) reader options derive from the same config shape the
    file-spool path uses; (b) a frame with Kafka's fixed source schema maps
    onto BUS_MESSAGE_SCHEMA; (c) the mapped messages produce IDENTICAL
    points to the file-bus path for the same payloads."""
    import json

    from pyspark.sql import Row

    from cerebro_spark.sources.bus import (
        BUS_MESSAGE_SCHEMA,
        KAFKA_SOURCE_SCHEMA,
        kafka_bus_options,
        kafka_frame_to_messages,
        read_bus_stream,
    )

    # (a) option construction from shared config
    cfg = {
        "bootstrap_servers": "broker-1:9092,broker-2:9092",
        "topic": "actor-replies",
        "max_offsets_per_trigger": 10000,
    }
    opts = kafka_bus_options(cfg)
    assert opts == {
        "kafka.bootstrap.servers": "broker-1:9092,broker-2:9092",
        "subscribe": "actor-replies",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
        "maxOffsetsPerTrigger": "10000",
    }
    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        read_bus_stream(spark)  # neither transport picked

    # (b) schema mapping: Kafka record frame → message frame
    import datetime as dt

    kafka_rows = [
        Row(
            key=sender.encode(),
            value=json.dumps(body).encode(),
            topic="actor-replies",
            partition=0,
            offset=i,
            timestamp=dt.datetime(2024, 1, 1),
            timestampType=0,
        )
        for i, (sender, body) in enumerate(MESSAGES)
    ] + [
        Row(  # key-less producer → sender falls back to topic
            key=None,
            value=json.dumps({"x": 1.0}).encode(),
            topic="actor-replies",
            partition=0,
            offset=99,
            timestamp=dt.datetime(2024, 1, 1),
            timestampType=0,
        )
    ]
    kframe = spark.createDataFrame(kafka_rows, KAFKA_SOURCE_SCHEMA)
    messages = kafka_frame_to_messages(kframe)
    assert messages.schema == spark.createDataFrame(
        [], BUS_MESSAGE_SCHEMA
    ).schema
    assert messages.filter("sender = 'actor-replies'").count() == 1

    # (c) parsed points equal the file-bus path's for the same payloads
    spool_like = spark.createDataFrame(
        [Row(sender=s, body=json.dumps(b)) for s, b in MESSAGES],
        BUS_MESSAGE_SCHEMA,
    )
    via_kafka = bus_messages_to_points(
        messages.filter("sender != 'actor-replies'"), bucket="actors"
    )
    via_spool = bus_messages_to_points(spool_like, bucket="actors")
    assert via_kafka.schema == via_spool.schema

    def canon(df):
        return sorted(
            (
                r["measurement"],
                tuple(sorted((r["fields"] or {}).items())),
                tuple(sorted((r["fields_str"] or {}).items())),
                tuple(sorted((r["fields_bool"] or {}).items())),
            )
            for r in df.collect()
        )

    assert canon(via_kafka) == canon(via_spool)
