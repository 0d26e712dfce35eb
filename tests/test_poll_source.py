"""Custom Python DataSource poller: HWM offsets advance, points flow through
the canonical ingest, backoff follows the reference constants (C5)."""

import math

from pyspark.sql import functions as F

from cerebro_spark.sources.poll import (
    ExponentialBackoff,
    PollDataSource,
    register_poll_fn,
)


def test_backoff_constants():
    b = ExponentialBackoff(seed=1)
    assert b.initial_delay == 1.0
    assert math.isclose(b.factor, math.e)
    assert b.max_delay == 3600.0
    d1 = b.next_delay()
    d2 = b.next_delay()
    # first retry ≈ e, second ≈ e² (± jitter σ≈0.12)
    assert 1.5 < d1 < 4.5
    assert 4.0 < d2 < 11.0
    many = [b.next_delay() for _ in range(12)]
    assert max(many) <= 3600 * (1 + 4 * b.jitter)
    b.reset()
    assert b.retries == 0


def test_poll_reader_offsets():
    from cerebro_spark.sources.poll import _PollStreamReader

    r = _PollStreamReader(None, {"rows_per_poll": "3", "poll_fn": "synthetic"})
    assert r.initialOffset() == {"hwm": 0}
    rows, off = r.read({"hwm": 0})
    rows = list(rows)
    assert len(rows) == 3 and off == {"hwm": 3}
    rows2, off2 = r.read(off)
    assert off2 == {"hwm": 6}
    # deterministic replay between offsets
    replay = list(r.readBetweenOffsets({"hwm": 0}, {"hwm": 3}))
    assert replay == rows


def test_poll_retry_then_fail():
    calls = {"n": 0}

    @register_poll_fn("flaky")
    def flaky(offset, options):
        calls["n"] += 1
        raise ConnectionError("down")

    from cerebro_spark.sources.poll import _PollStreamReader

    r = _PollStreamReader(None, {"poll_fn": "flaky", "max_retries": "2"})
    try:
        r.read({"hwm": 0})
        raise AssertionError("expected ConnectionError")
    except ConnectionError:
        pass
    assert calls["n"] == 2


def test_poll_source_streaming(spark, tmp_path):
    spark.dataSource.register(PollDataSource)
    df = (
        spark.readStream.format("cerebro_poll")
        .option("rows_per_poll", "4")
        .option("measurement", "pressure")
        .load()
    )
    assert df.isStreaming
    from cerebro_spark.streaming.ingest import run_ingest

    q = run_ingest(
        spark,
        df,
        sink_path=str(tmp_path / "store"),
        checkpoint=str(tmp_path / "ckpt"),
        instance_tags={"observatory": "lco"},
        default_bucket="sensors",
        processing_time="1 seconds",
        query_name="poll-test",
    )
    try:
        import time

        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            try:
                n = spark.read.parquet(str(tmp_path / "store")).count()
            except Exception:
                n = 0
            if n >= 8:
                break
            time.sleep(1)
    finally:
        q.stop()
    assert n >= 8
    out = spark.read.parquet(str(tmp_path / "store"))
    seqs = sorted(r["fields"]["seq"] for r in out.collect())
    # HWM advanced without gaps or duplicates
    assert seqs == [float(i) for i in range(len(seqs))]
    assert out.filter(F.col("time").isNull()).count() == 0  # T5 stamped


def test_file_exists_poll(tmp_path):
    from cerebro_spark.sources.poll import POLL_REGISTRY

    f = tmp_path / "probe.txt"
    rows, off = POLL_REGISTRY["file_exists"](0, {"file": str(f)})
    assert rows[0][2] == {"probe.txt": 0.0} and off == 1
    f.write_text("x")
    rows, _ = POLL_REGISTRY["file_exists"](1, {"file": str(f)})
    assert rows[0][2] == {"probe.txt": 1.0}
    assert rows[0][0] == "file_exists"


def test_tpm_snapshot_poll(tmp_path):
    import json

    from cerebro_spark.sources.poll import POLL_REGISTRY

    snap = tmp_path / "tpm.json"
    snap.write_text(json.dumps(
        {"alt": {"pos": 45.2, "moving": True}, "state": "TRACKING", "arr": [1, 2]}
    ))
    rows, off = POLL_REGISTRY["tpm_snapshot"](0, {"file": str(snap)})
    assert off == 1 and len(rows) == 1
    m, tags, fields, fstr, fbool, t, bucket = rows[0]
    assert fields == {"alt.pos": 45.2}
    assert fstr == {"state": "TRACKING"}
    assert fbool == {"alt.moving": True}  # list dropped, nested flattened
    # missing file → empty batch, offset still advances (poll loop continues)
    rows2, off2 = POLL_REGISTRY["tpm_snapshot"](1, {"file": str(tmp_path / "nope")})
    assert rows2 == [] and off2 == 2


def test_poll_source_via_config_runner(spark, tmp_path):
    """config-declared `type: poll` source runs through IngestRunner."""
    from cerebro_spark.config.loader import IngestRunner

    runner = IngestRunner(
        spark,
        {
            "sources": {
                "dev1": {
                    "type": "poll",
                    "poll_fn": "synthetic",
                    "rows_per_poll": "3",
                    "measurement": "pressure",
                    "delay": 1,
                }
            }
        },
        store_path=str(tmp_path / "store"),
        checkpoint_root=str(tmp_path / "ckpt"),
    )
    runner.start()
    import time

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
    runner.stop()
    assert n >= 6
    out = spark.read.parquet(str(tmp_path / "store"))
    assert out.filter(F.col("measurement") == "pressure").count() == out.count()


def test_replay_contract_violation_warns_not_slices():
    """A poll fn that advances hwm by 1 while emitting N rows violates the
    rows-per-offset contract: replay must deliver ALL rows (over-delivery is
    recoverable via the idempotent sink; slicing would silently lose data)
    and warn."""
    import warnings

    from cerebro_spark.sources.poll import _PollStreamReader

    @register_poll_fn("bulk_per_offset")
    def bulk(offset, options):
        rows = [("m", None, {"v": float(i)}, None, None, None, "b")
                for i in range(3)]
        return rows, offset + 1  # 3 rows, hwm advances by 1

    r = _PollStreamReader(None, {"poll_fn": "bulk_per_offset"})
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        replay = list(r.readBetweenOffsets({"hwm": 0}, {"hwm": 1}))
    assert len(replay) == 3          # NOT sliced to the offset delta of 1
    assert any("rows-per-offset" in str(x.message) for x in w)
