"""Live socket transports: TCP/UDP poll fns against in-process loopback
servers speaking the reference device line formats (FIXTURES F4/F6), and the
end-to-end chain socket → PollDataSource → central ingest → store → parse →
client read-back (reference `source.py:213-229`, `lvm.py:380-426`)."""

import datetime as dt
import socketserver
import threading
import time

from pyspark.sql import functions as F

from cerebro_spark.sources.poll import POLL_REGISTRY, PollDataSource

GOVEE_ADDR = "A4:C1:38:82:A2:88"


def _govee_line() -> str:
    isot = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None).isoformat()
    return f"{GOVEE_ADDR} 23.41 41.2 87 {isot}\n"


class _GoveeHandler(socketserver.StreamRequestHandler):
    def handle(self):
        line = self.rfile.readline().decode()
        if line.startswith("status "):
            self.wfile.write(_govee_line().encode())
        else:
            self.wfile.write(b"?\n")


class _ThermistorUDP(socketserver.BaseRequestHandler):
    def handle(self):
        data, sock = self.request
        if data == b"$016\r\n":
            sock.sendto(b"!01A3F0\r", self.client_address)


def _start_tcp(handler):
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def _start_udp(handler):
    srv = socketserver.ThreadingUDPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]


def test_tcp_request_poll_govee_line():
    srv, port = _start_tcp(_GoveeHandler)
    try:
        rows, off = POLL_REGISTRY["tcp_request"](
            0,
            {
                "port": str(port),
                "request": f"status {GOVEE_ADDR}\\n",
                "measurement": "govee_raw",
            },
        )
    finally:
        srv.shutdown()
    assert off == 1 and len(rows) == 1
    m, tags, fields, fstr, fbool, t, bucket = rows[0]
    assert m == "govee_raw" and fields is None
    parts = fstr["raw"].split()
    assert parts[0] == GOVEE_ADDR and float(parts[1]) == 23.41


def test_tcp_request_poll_not_found_reply():
    srv, port = _start_tcp(_GoveeHandler)
    try:
        rows, _ = POLL_REGISTRY["tcp_request"](
            0, {"port": str(port), "request": "nope\\n"}
        )
    finally:
        srv.shutdown()
    assert rows[0][3]["raw"] == "?\n"  # parse stage drops '?' lines


def test_udp_request_poll_thermistor_bitmask():
    srv, port = _start_udp(_ThermistorUDP)
    try:
        rows, off = POLL_REGISTRY["udp_request"](
            0, {"port": str(port), "request": "$016\\r\\n"}
        )
    finally:
        srv.shutdown()
    assert off == 1
    assert rows[0][3]["raw"] == "!01A3F0\r"


def test_tcp_poll_connection_refused_raises():
    import pytest

    with pytest.raises(OSError):
        POLL_REGISTRY["tcp_request"](0, {"port": "1", "timeout_s": "0.2"})


def test_socket_to_store_to_client_end_to_end(spark, tmp_path):
    """The full reference data path on a real socket: device TCP server →
    tcp_request poll stream → central ingest (tags/stamping/partitioned
    store) → parse_govee → CerebroClient query over the parsed points."""
    from cerebro_spark.functions.parsers import parse_govee
    from cerebro_spark.plans.client import CerebroClient
    from cerebro_spark.streaming.ingest import run_ingest

    srv, port = _start_tcp(_GoveeHandler)
    spark.dataSource.register(PollDataSource)
    raw_store = str(tmp_path / "raw_store")
    stream = (
        spark.readStream.format("cerebro_poll")
        .option("poll_fn", "tcp_request")
        .option("port", str(port))
        .option("request", f"status {GOVEE_ADDR}\\n")
        .option("measurement", "govee_raw")
        .option("bucket", "sensors")
        .load()
    )
    q = run_ingest(
        spark,
        stream,
        sink_path=raw_store,
        checkpoint=str(tmp_path / "ckpt"),
        instance_tags={"observatory": "lvm"},
        default_bucket="sensors",
        processing_time="1 seconds",
        query_name="tcp-e2e",
    )
    try:
        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(raw_store).count()
            except Exception:
                n = 0
            if n >= 2:
                break
            time.sleep(1)
    finally:
        q.stop()
        srv.shutdown()
    assert n >= 2

    raw = spark.read.parquet(raw_store)
    assert raw.filter(F.col("time").isNull()).count() == 0  # T5 stamped
    assert raw.select("tags").first()["tags"]["observatory"] == "lvm"  # T6

    parsed = parse_govee(
        raw.select(F.col("fields_str")["raw"].alias("line")),
        expected_address=GOVEE_ADDR,
        stale_seconds=None,
    )
    pts = parsed.withColumn("fields_str", F.lit(None).cast("map<string,string>"))
    pts = pts.withColumn("fields_bool", F.lit(None).cast("map<string,boolean>"))
    pts = pts.withColumn("bucket", F.lit("sensors"))
    client = CerebroClient(spark, {"sensors": pts.select(
        "measurement", "tags", "fields", "fields_str", "fields_bool", "time", "bucket"
    )})
    wide = client.query("sensors", "temperature", field="value")
    got = wide.collect()
    assert len(got) >= 1
    assert all(abs(r["value"] - 23.41) < 1e-9 for r in got)
