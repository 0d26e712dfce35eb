"""CDC keyed-upsert sink (bucketed read-modify-write merge) and the
stream-stream enrichment join."""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cerebro_spark.streaming.ingest import streaming_enrich_join
from cerebro_spark.streaming.sinks import keyed_upsert_sink


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def test_keyed_upsert_merges_latest_per_key(spark, tmp_path):
    store = str(tmp_path / "store")
    sink = keyed_upsert_sink(store, key_cols=["k"], ts_col="time", n_buckets=8)

    b0 = spark.createDataFrame(
        [Row(k="a", v=1.0, time=_t(0)), Row(k="b", v=2.0, time=_t(1))]
    )
    sink(b0, 0)
    b1 = spark.createDataFrame(
        [
            Row(k="b", v=20.0, time=_t(5)),   # update: newer ts wins
            Row(k="c", v=3.0, time=_t(6)),    # insert
            Row(k="a", v=-1.0, time=_t(0)),   # same-ts: batch row wins
        ]
    )
    sink(b1, 1)

    got = {
        r["k"]: (r["v"], r["time"])
        for r in spark.read.parquet(store).collect()
    }
    assert got == {
        "a": (-1.0, _t(0)),
        "b": (20.0, _t(5)),
        "c": (3.0, _t(6)),
    }


def test_keyed_upsert_retried_batch_converges(spark, tmp_path):
    store = str(tmp_path / "store")
    sink = keyed_upsert_sink(store, key_cols=["k"], ts_col="time", n_buckets=8)
    b0 = spark.createDataFrame([Row(k="a", v=1.0, time=_t(0))])
    b1 = spark.createDataFrame([Row(k="a", v=9.0, time=_t(3))])
    sink(b0, 0)
    sink(b1, 1)
    sink(b1, 1)  # replay after a simulated checkpoint-recovery retry
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 1 and rows[0]["v"] == 9.0


def test_keyed_upsert_stale_update_ignored(spark, tmp_path):
    store = str(tmp_path / "store")
    sink = keyed_upsert_sink(store, key_cols=["k"], ts_col="time", n_buckets=4)
    sink(spark.createDataFrame([Row(k="a", v=5.0, time=_t(9))]), 0)
    # late-arriving older version must not clobber the newer row
    sink(spark.createDataFrame([Row(k="a", v=1.0, time=_t(2))]), 1)
    rows = spark.read.parquet(store).collect()
    assert len(rows) == 1 and rows[0]["v"] == 5.0


def test_keyed_upsert_only_touched_buckets_rewritten(spark, tmp_path):
    store = str(tmp_path / "store")
    sink = keyed_upsert_sink(store, key_cols=["k"], ts_col="time", n_buckets=64)
    keys = [Row(k=f"k{i}", v=float(i), time=_t(0)) for i in range(20)]
    sink(spark.createDataFrame(keys), 0)
    before = {
        str(p): p.stat().st_mtime
        for p in (tmp_path / "store").glob("__bucket=*/*.parquet")
    }
    # single-key update: at most one bucket partition may change
    sink(spark.createDataFrame([Row(k="k3", v=99.0, time=_t(5))]), 1)
    after = {
        str(p): p.stat().st_mtime
        for p in (tmp_path / "store").glob("__bucket=*/*.parquet")
    }
    unchanged = [p for p in before if p in after and before[p] == after[p]]
    assert len(unchanged) >= len(before) - 1
    got = {r["k"]: r["v"] for r in spark.read.parquet(store).collect()}
    assert got["k3"] == 99.0 and len(got) == 20


def test_streaming_enrich_join_tolerance_window(spark, tmp_path):
    """Points match only metadata versions within [t - tolerance, t]."""
    pts_dir, meta_dir = str(tmp_path / "pts"), str(tmp_path / "meta")
    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    pts = spark.createDataFrame(
        [
            Row(device="d1", time=_t(30), value=1.0),
            Row(device="d2", time=_t(30), value=2.0),  # no meta in window
        ]
    )
    meta = spark.createDataFrame(
        [
            Row(device="d1", updated_at=_t(10), site="north"),  # in window
            Row(device="d2", updated_at=dt.datetime(2024, 1, 1, 9), site="old"),
        ]
    )
    pts.write.parquet(pts_dir)
    meta.write.parquet(meta_dir)

    joined = streaming_enrich_join(
        spark.readStream.schema(pts.schema).parquet(pts_dir),
        spark.readStream.schema(meta.schema).parquet(meta_dir),
        key="device",
        points_ts="time",
        meta_ts="updated_at",
        tolerance="1 hour",
        watermark="0 seconds",
        how="inner",
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_dir).collect()
    # d1 enriched (meta 20 min old < 1 h); d2's meta is 3.5 h stale → dropped
    assert [(r["device"], r["site"]) for r in got] == [("d1", "north")]


def test_keyed_upsert_under_streaming_engine(spark, tmp_path):
    """foreachBatch wiring: a replayed CDC file stream merges into the
    keyed store through the streaming engine."""
    src_dir = str(tmp_path / "cdc")
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")

    updates = spark.createDataFrame(
        [
            Row(k="a", v=1.0, time=_t(0)),
            Row(k="a", v=3.0, time=_t(9)),   # later version in the same load
            Row(k="b", v=2.0, time=_t(1)),
        ]
    )
    updates.write.parquet(src_dir)

    q = (
        spark.readStream.schema(updates.schema)
        .parquet(src_dir)
        .writeStream.foreachBatch(
            keyed_upsert_sink(store, key_cols=["k"], ts_col="time", n_buckets=4)
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["k"]: r["v"] for r in spark.read.parquet(store).collect()}
    assert got == {"a": 3.0, "b": 2.0}


def test_keyed_upsert_same_ts_tie_is_deterministic(spark, tmp_path):
    """Two same-key same-ts rows in one batch must pick the same winner on
    replay (partition order is not stable across retries)."""
    rows = [Row(k="a", v=float(i), time=_t(0)) for i in (1, 2)]
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    for store, batch in (
        (s1, spark.createDataFrame(rows).repartition(2)),
        (s2, spark.createDataFrame(list(reversed(rows))).repartition(3)),
    ):
        sink = keyed_upsert_sink(store, key_cols=["k"], ts_col="time")
        sink(batch, 0)
    w1 = spark.read.parquet(s1).collect()[0]["v"]
    w2 = spark.read.parquet(s2).collect()[0]["v"]
    assert w1 == w2
