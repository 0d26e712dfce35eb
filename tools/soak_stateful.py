"""Scale soak for the applyInPandasWithState sessionizer.

The batch-equivalence gate (queries/streaming_q.py) proves semantics at
sf0.01; this soak proves the SCALE properties at ~1M events / 10k users:

- wall time of the availableNow replay vs the batch window sessionizer
  (the streaming path pays state-store + Arrow overhead — measure it,
  don't guess);
- exact row-level equality of the streamed gap-closed sessions against
  the batch computation at that scale (the gate's claim, re-proven where
  the state store actually holds 10k keys);
- state boundedness is by construction (4 scalars per user), so the
  interesting number is throughput, not memory.

Synthetic data uses F.hash(uid, i) for jitter — NEVER modular arithmetic
(a mod-k generator cycles and silently degenerates the gap distribution;
round-5 soak lesson).

Usage: python tools/soak_stateful.py [n_events] [n_users]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

    from cerebro_spark.queries.streaming_q import _run_available_now
    from cerebro_spark.session import get_spark
    from cerebro_spark.streaming.stateful import streaming_sessionize

    spark = get_spark("soak-stateful", shuffle_partitions=32)

    # irregular per-user event times: mean gap ~600 s with hash jitter, so
    # a 1800 s session gap closes a realistic fraction of sessions
    ev = (
        spark.range(n_events)
        .select(
            (F.col("id") % n_users).alias("user_id"),
            F.col("id").alias("i"),
        )
        .withColumn(
            "step",
            300 + F.pmod(F.hash("user_id", "i"), F.lit(3000)).cast("long"),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1704067200)
                + F.sum("step").over(
                    Window.partitionBy("user_id").orderBy("i")
                )
            ),
        )
        .withColumn(
            "value", (F.pmod(F.hash("i"), F.lit(1000)) / 10.0).cast("double")
        )
        .select("user_id", "ts", "value")
    )
    ev.cache().count()

    # batch twin: closed sessions only (drop each user's last)
    t0 = time.perf_counter()
    w = Window.partitionBy("user_id").orderBy("ts")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    sess = (
        ev.withColumn(
            "sid",
            F.sum(
                F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )
    last = sess.groupBy("user_id").agg(F.max("sid").alias("last_sid"))
    batch_closed = (
        sess.join(last, "user_id")
        .filter(F.col("sid") < F.col("last_sid"))
        .drop("sid", "last_sid")
    )
    n_batch = batch_closed.cache().count()
    t_batch = time.perf_counter() - t0
    print(f"batch sessionize (window): {n_batch} closed sessions "
          f"in {t_batch:.1f} s")

    t0 = time.perf_counter()
    streamed = _run_available_now(
        ev,
        lambda s: streaming_sessionize(
            s, gap_seconds=1800, emit_on_timeout=False
        ),
        output_mode="append",
        ordered_single_batch=True,
    ).select(
        "user_id", "session_start", "session_end", "n_events",
        F.round("value_sum", 4).alias("value_sum"),
    )
    n_stream = streamed.cache().count()
    t_stream = time.perf_counter() - t0
    print(f"streaming sessionize (applyInPandasWithState, availableNow "
          f"replay): {n_stream} sessions in {t_stream:.1f} s "
          f"({n_events / max(t_stream, 1e-9):,.0f} events/s)")

    diff = batch_closed.exceptAll(streamed).count() + streamed.exceptAll(
        batch_closed
    ).count()
    print(f"row-level disagreement (exceptAll both ways): {diff}")
    verdict = "SOAK GREEN" if diff == 0 and n_stream == n_batch else "SOAK RED"
    print(f"{verdict}: {n_events:,} events / {n_users:,} users; "
          f"streaming/batch wall ratio {t_stream / t_batch:.1f}x")
    return 0 if verdict == "SOAK GREEN" else 1


if __name__ == "__main__":
    raise SystemExit(main())
