"""Control-surface socket server (C3 parity — reference status socket)."""

import pytest
import json

from cerebro_spark.control import ControlServer, query


class _FakeRunner:
    def __init__(self):
        self.restarted = []

    def status(self):
        return {"s1": True, "s2": False}

    def metrics(self):
        return {"s1": {"active": True, "input_rows_per_sec": 3.0}}

    def restart(self, name):
        if name == "bad":
            raise KeyError(name)
        self.restarted.append(name)


def test_status_restart_protocol(tmp_path):
    runner = _FakeRunner()
    sock = str(tmp_path / "ctl.sock")
    ctl = ControlServer(runner, sock).start()
    try:
        assert json.loads(query(sock, "status")) == {"s1": True, "s2": False}
        assert json.loads(query(sock, "metrics"))["s1"]["input_rows_per_sec"] == 3.0
        assert query(sock, "restart s2") == "true"
        assert runner.restarted == ["s2"]
        # reference replies false on any restart failure (cerebro.py:451-456)
        assert query(sock, "restart bad") == "false"
        assert query(sock, "nonsense") == "false"
    finally:
        ctl.stop()


def test_socket_cleaned_up(tmp_path):
    sock = str(tmp_path / "ctl.sock")
    ctl = ControlServer(_FakeRunner(), sock).start()
    ctl.stop()
    import os

    assert not os.path.exists(sock)
    # restart over a stale path works (server unlinks before bind)
    ctl2 = ControlServer(_FakeRunner(), sock).start()
    assert query(sock, "status")
    ctl2.stop()


def test_live_runner_end_to_end(tmp_path, spark):
    """Real IngestRunner + real streaming query behind the socket."""
    from cerebro_spark.config.loader import IngestRunner

    cfg = {
        "sources": {
            "poll1": {
                "type": "poll",
                "poll_fn": "synthetic",
                "rows_per_poll": "3",
                "delay": 1,
            }
        }
    }
    runner = IngestRunner(
        spark,
        cfg,
        store_path=str(tmp_path / "store"),
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    runner.start()
    sock = str(tmp_path / "ctl.sock")
    ctl = ControlServer(runner, sock).start()
    try:
        st = json.loads(query(sock, "status"))
        assert st == {"poll1": True}
        m = json.loads(query(sock, "metrics"))
        assert m["poll1"]["active"] is True  # progress fields fill after 1st batch
        assert query(sock, "restart poll1") == "true"
        assert json.loads(query(sock, "status"))["poll1"] is True
    finally:
        ctl.stop()
        runner.stop()


@pytest.mark.slow
def test_sql_cli_command(tmp_path):
    """`python -m cerebro_spark sql` runs a query over the registered views
    from any cwd (subprocess — the exact user invocation)."""
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable, "-m", "cerebro_spark", "sql",
            "--sf-dir", "/root/testdata/sf0.001",
            "--query", "SELECT count(*) AS n FROM region",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "|5" in out.stdout.replace(" ", "") or "| 5" in out.stdout


@pytest.mark.slow
def test_explain_cli_command(tmp_path):
    """`python -m cerebro_spark explain --name <query>` prints the formatted
    plan and the plan-audit verdict (subprocess, any cwd)."""
    import subprocess
    import sys

    out = subprocess.run(
        [
            sys.executable, "-m", "cerebro_spark", "explain",
            "--name", "pricing_summary",
            "--sf-dir", "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Physical Plan" in out.stdout
    assert "AUDIT: clean" in out.stdout
    # unknown names list the registry instead of stack-tracing
    bad = subprocess.run(
        [sys.executable, "-m", "cerebro_spark", "explain", "--name", "nope"],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
        timeout=300,
    )
    assert bad.returncode != 0
    assert "weather_chain" in bad.stderr


@pytest.mark.slow
def test_maintain_cli_command(spark, tmp_path):
    """`python -m cerebro_spark maintain` runs retention + compaction over a
    (bucket, date)-partitioned store and prints the health report."""
    import datetime as dt
    import subprocess
    import sys

    store = str(tmp_path / "mstore")
    rows = [
        ("m", dt.datetime(2020, 1, 1, 12), 1.0, "sensors", dt.date(2020, 1, 1)),
        ("m", dt.datetime.now(), 2.0, "sensors", dt.date.today()),
    ]
    spark.createDataFrame(
        rows,
        "measurement string, time timestamp, v double, bucket string, date date",
    ).write.partitionBy("bucket", "date").parquet(store)

    out = subprocess.run(
        [
            sys.executable, "-m", "cerebro_spark", "maintain",
            "--store", store, "--expire-days", "365", "--compact",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "expired 1 partition(s)" in out.stdout
    assert "compacted" in out.stdout
    assert "date=2020-01-01" in out.stdout  # listed in the expiry report
    left = spark.read.parquet(store)
    assert left.count() == 1  # only today's row survives


@pytest.mark.slow
def test_maintain_zorder_cli(spark, tmp_path):
    import subprocess
    import sys

    src = str(tmp_path / "zsrc")
    out_path = str(tmp_path / "zout")
    spark.range(5000).selectExpr(
        "id", "id % 100 as a", "cast(id % 7 as double) as b"
    ).write.parquet(src)
    out = subprocess.run(
        [
            sys.executable, "-m", "cerebro_spark", "maintain",
            "--store", src, "--zorder", "a,b",
            "--output", out_path, "--target-files", "4",
        ],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        env={**__import__("os").environ, "PYTHONPATH": "/root/repo"},
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "zordered by ['a', 'b']" in out.stdout
    assert spark.read.parquet(out_path).count() == 5000
