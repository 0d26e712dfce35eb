"""Crash-recovery proof for the exactly-once sink claims (VERDICT r3 ask
#4): a streaming query is KILLED between the sink's write and the
checkpoint commit (the sink fn completes its writes, then the batch
fails before Structured Streaming records the commit), then restarted
from the same checkpoint.  The engine replays the batch — same batch_id,
same data — and each sink's replay discipline must leave the store with
no duplicate and no missing rows.

The crash is injected with a foreachBatch wrapper that runs the real
sink, then raises — once, tracked by a marker file, because foreachBatch
runs driver-side and must stay picklable-free state."""

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql.streaming import StreamingQueryException

from cerebro_spark.streaming.sinks import (
    idempotent_parquet_sink,
    keyed_upsert_sink,
    neardup_filter_sink,
)


def _t(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


def _crash_after_write_once(sink, crash_batch_id: int, marker: str):
    """Wrap a foreachBatch sink: run it to completion, then die before the
    engine can commit — exactly once (the marker file records the death)."""

    def write(batch_df, batch_id):
        sink(batch_df, batch_id)
        if batch_id == crash_batch_id and not os.path.exists(marker):
            with open(marker, "w") as fh:
                fh.write("crashed")
            raise RuntimeError(
                f"injected crash after write of batch {batch_id}"
            )

    return write


def _run_stream(spark, src_dir, schema, sink_fn, ckpt):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")  # one input file per micro-batch
        .parquet(src_dir)
        .writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )


@pytest.mark.slow
def test_idempotent_parquet_sink_crash_between_write_and_commit(
    spark, tmp_path
):
    src, store, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    rows = [
        Row(event_id=i, v=float(i), time=_t(i % 60)) for i in range(30)
    ]
    df = spark.createDataFrame(rows)
    # three input files → three micro-batches at maxFilesPerTrigger=1
    for i, chunk in enumerate((rows[:10], rows[10:20], rows[20:])):
        spark.createDataFrame(chunk).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    marker = str(tmp_path / "crashed.marker")
    sink = _crash_after_write_once(
        idempotent_parquet_sink(store), crash_batch_id=1, marker=marker
    )

    q = _run_stream(spark, src, df.schema, sink, ckpt)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(120)
    assert os.path.exists(marker)
    # the doomed batch's data DID land before the "crash" —
    # this is exactly the torn state a real kill leaves
    assert os.path.isdir(f"{store}/batch_id=1")

    # restart from the same checkpoint: batch 1 replays and overwrites
    # its own directory; batch 2 then runs fresh
    q = _run_stream(spark, src, df.schema, sink, ckpt)
    q.awaitTermination(120)

    got = sorted(
        r["event_id"] for r in spark.read.parquet(store).collect()
    )
    assert got == list(range(30))  # no dupes, no loss


@pytest.mark.slow
def test_keyed_upsert_sink_crash_between_write_and_commit(spark, tmp_path):
    src, store, ckpt = (
        str(tmp_path / "src"),
        str(tmp_path / "store"),
        str(tmp_path / "ckpt"),
    )
    f0 = [Row(k="a", v=1.0, time=_t(0)), Row(k="b", v=2.0, time=_t(1))]
    f1 = [Row(k="b", v=20.0, time=_t(5)), Row(k="c", v=3.0, time=_t(6))]
    f2 = [Row(k="a", v=100.0, time=_t(9))]
    for chunk in (f0, f1, f2):
        spark.createDataFrame(chunk).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = spark.createDataFrame(f0).schema

    marker = str(tmp_path / "crashed.marker")
    sink = _crash_after_write_once(
        keyed_upsert_sink(store, key_cols=["k"], ts_col="time", n_buckets=4),
        crash_batch_id=1,
        marker=marker,
    )

    q = _run_stream(spark, src, schema, sink, ckpt)
    with pytest.raises(StreamingQueryException, match="injected crash"):
        q.awaitTermination(120)

    q = _run_stream(spark, src, schema, sink, ckpt)
    q.awaitTermination(120)

    out = spark.read.parquet(store).collect()
    got = {r["k"]: (r["v"], r["time"]) for r in out}
    # one row per key (replayed merge converged), latest version each
    assert len(out) == 3
    assert got == {
        "a": (100.0, _t(9)),
        "b": (20.0, _t(5)),
        "c": (3.0, _t(6)),
    }


@pytest.mark.slow
def test_neardup_sink_crash_before_params_marker(spark, tmp_path):
    """First-batch torn state for the LSH index: signatures and buckets
    written, the params marker NOT yet (it is written last for exactly
    this reason — sinks.py).  The replay must see have_index=False,
    rebuild the same per-batch dirs by overwrite, and the finished index
    must then filter near-dups normally with no duplicated signatures."""
    out, idx = str(tmp_path / "out"), str(tmp_path / "idx")
    sink = neardup_filter_sink(
        idx, out, content_col="text", id_col="doc_id", threshold=0.5
    )
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight"
    )
    b0 = spark.createDataFrame(
        [Row(doc_id=1, text=base), Row(doc_id=2, text="completely other "
             "content about spark structured streaming checkpoints here")]
    )
    sink(b0, 0)
    # simulate the crash window: marker write never happened
    import shutil

    shutil.rmtree(f"{idx}/params")
    assert os.path.isdir(f"{idx}/signatures/__batch=0")  # torn state

    # checkpoint replay of batch 0 → rebuild, then the marker lands
    sink(b0, 0)
    assert os.path.isdir(f"{idx}/params")
    sigs = spark.read.parquet(f"{idx}/signatures")
    assert sigs.count() == 2  # overwrite, not append: one signature per doc

    # batch 1: a near-dup of doc 1 is filtered, a fresh doc passes
    b1 = spark.createDataFrame(
        [
            Row(doc_id=3, text=base + " extra"),
            Row(doc_id=4, text="entirely new corpus material with zero "
                "overlap whatsoever in its shingle set at all friends"),
        ]
    )
    sink(b1, 1)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert kept == {1, 2, 4}
