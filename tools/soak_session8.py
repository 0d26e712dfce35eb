"""Round-6 session-8 soak: the new operators at the scale the sf0.1 gate
can't show — each with a PLANTED closed-form truth.

1. info_gain_ranking at 10M rows x 4 planted features: a perfect copy of
   the label (MI = ln4, ratio 1), a half feature (ln2), an independent
   feature (0), and a high-cardinality determiner (MI = ln4 but gain
   ratio ln4/ln1000 — the memorizer penalty, visible only because the
   ratio exists).

2. quantile_normalize at 10M rows x 4 groups with identical shapes
   shifted +1000g: every group's (rank_target, mapped_value) sequence
   must be IDENTICAL across groups — the whole point of the transform —
   and a single-group corpus maps to itself.

3. streaming_msprt at 10M events / 365 days through the availableNow
   replay: the streamed cumulative integer moments must equal the batch
   window EXACTLY on all 365 days (the unbounded-Python-int state at
   volume), and the p chain must match the batch monitor's.

4. scd2_snapshot at 10M events / 100k users where every user's
   attribute is day%3: the snapshot at the planted mid-day holds
   EXACTLY one row per user, all carrying attr == mid_day%3.

    python tools/soak_session8.py [scale]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window
from pyspark.sql import functions as F

from cerebro_spark.operators.profile import (
    info_gain_ranking,
    quantile_normalize,
    scd2_collapse,
    scd2_snapshot_at,
)
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

spark = get_spark("soak-session8", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def banner(s: str) -> None:
    print(f"\n=== {s} ===", flush=True)


# ---------------------------------------------------------------------------
# 1. info_gain_ranking
# ---------------------------------------------------------------------------
N1 = int(10_000_000 * SCALE)
banner(f"info_gain_ranking: {N1:,} rows, 4 planted features")

t0 = time.time()
df1 = spark.range(N1).select(
    (F.col("id") % 4).cast("string").alias("label"),
    (F.col("id") % 4).alias("perfect"),
    (F.col("id") % 2).alias("half"),
    ((F.col("id") / 4).cast("long") % 4).alias("noise"),
    (F.col("id") % 1000).alias("high_card"),
)
out = {r["feature"]: r for r in info_gain_ranking(
    df1,
    {
        "perfect": F.col("perfect"),
        "half": F.col("half"),
        "noise": F.col("noise"),
        "high_card": F.col("high_card"),
    },
    "label",
).collect()}
t1 = time.time() - t0
assert abs(out["perfect"]["mi_nats"] - math.log(4)) < 5e-3
assert abs(out["perfect"]["gain_ratio"] - 1.0) < 1e-3
assert abs(out["half"]["mi_nats"] - math.log(2)) < 5e-3
assert abs(out["noise"]["mi_nats"]) < 5e-3
assert abs(out["high_card"]["mi_nats"] - math.log(4)) < 5e-3
assert abs(out["high_card"]["gain_ratio"] - math.log(4) / math.log(1000)) < 1e-3
print(f"{t1:.1f}s; MI = (ln4, ln2, 0, ln4) as planted; the memorizer's "
      f"gain ratio {out['high_card']['gain_ratio']:.3f} == ln4/ln1000")

# ---------------------------------------------------------------------------
# 2. quantile_normalize
# ---------------------------------------------------------------------------
N2 = int(10_000_000 * SCALE)
banner(f"quantile_normalize: {N2:,} rows x 4 shifted-identical groups")

t0 = time.time()
df2 = spark.range(N2).select(
    (F.col("id") % 4).cast("string").alias("g"),
    (
        ((F.col("id") / 4).cast("long") % 1000).cast("double")
        + (F.col("id") % 4).cast("double") * 1000.0
    ).alias("v"),
)
grid = quantile_normalize(df2, "g", "v", 1.0).collect()
t2 = time.time() - t0
byg = {}
for r in grid:
    byg.setdefault(r["group"], []).append(
        (r["q"] - int(r["group"]) * 1000, r["rank_target"], r["mapped_value"])
    )
seqs = {g: sorted(v) for g, v in byg.items()}
assert len(seqs) == 4 and all(len(s) == 1000 for s in seqs.values())
base = seqs["0"]
for g in ("1", "2", "3"):
    assert seqs[g] == base, f"group {g} misaligned"
print(f"{t2:.1f}s; all 4 groups' (rank_target, mapped_value) sequences "
      f"IDENTICAL after de-shifting — the transform aligned them exactly")

# ---------------------------------------------------------------------------
# 3. streaming_msprt at volume
# ---------------------------------------------------------------------------
N3 = int(10_000_000 * SCALE)
DAYS = 365
banner(f"streaming_msprt: {N3:,} events / {DAYS} days through availableNow")

from cerebro_spark.queries.streaming_q import _run_available_now
from cerebro_spark.streaming.stateful import streaming_msprt

t0 = time.time()
pts = spark.range(N3).select(
    ((F.col("id") / 2).cast("long") % DAYS).alias("day"),
    (F.col("id") % 2).alias("arm"),
    ((F.col("id") / 2).cast("long") * 104729 % 100000).alias("q"),
)
pts = pts.select(
    F.timestamp_seconds(F.col("day") * 86400).alias("ts"),
    "day", "arm", "q",
)
streamed = _run_available_now(
    pts, lambda s: streaming_msprt(s, 0, 1),
    output_mode="append", ordered_single_batch=True,
)
wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
daily = pts.groupBy("day").agg(
    F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("na_d"),
    F.sum(F.when(F.col("arm") == 0, F.col("q")).otherwise(0)).alias("sa_d"),
    F.sum(F.when(F.col("arm") == 0, F.col("q") * F.col("q")).otherwise(F.lit(0))).alias("ssa_d"),
    F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nb_d"),
    F.sum(F.when(F.col("arm") == 1, F.col("q")).otherwise(0)).alias("sb_d"),
    F.sum(F.when(F.col("arm") == 1, F.col("q") * F.col("q")).otherwise(F.lit(0))).alias("ssb_d"),
)
batch = daily.select(
    "day",
    F.sum("na_d").over(wcum).alias("bna"), F.sum("sa_d").over(wcum).alias("bsa"),
    F.sum("ssa_d").over(wcum).alias("bssa"), F.sum("nb_d").over(wcum).alias("bnb"),
    F.sum("sb_d").over(wcum).alias("bsb"), F.sum("ssb_d").over(wcum).alias("bssb"),
)
j = streamed.join(batch, "day", "full_outer")
mm = j.filter(
    (F.col("na") != F.col("bna")) | (F.col("sa") != F.col("bsa"))
    | (F.col("ssa") != F.col("bssa")) | (F.col("nb") != F.col("bnb"))
    | (F.col("sb") != F.col("bsb")) | (F.col("ssb") != F.col("bssb"))
    | F.col("na").isNull() | F.col("bna").isNull()
).count()
n_days = streamed.count()
t3 = time.time() - t0
assert n_days == DAYS and mm == 0, (n_days, mm)
print(f"{t3:.1f}s; streamed integer moments == batch window on all "
      f"{DAYS} days at {N3:,} events (unbounded-int state exact at volume)")

# ---------------------------------------------------------------------------
# 4. scd2_snapshot
# ---------------------------------------------------------------------------
N4 = int(10_000_000 * SCALE)
USERS = 100_000
banner(f"scd2_snapshot: {N4:,} events / {USERS:,} users, attr = day%3")

t0 = time.time()
ev4 = spark.range(N4).select(
    (F.col("id") % USERS).alias("k"),
    ((F.col("id") / USERS).cast("long")).alias("d"),
    F.col("id").alias("eid"),
)
ev4 = ev4.select(
    "k",
    (F.col("d") * 86400).cast("double").alias("ts"),
    (F.col("d") % 3).cast("string").alias("attr"),
    "eid",
)
days_per_user = N4 // USERS
mid_day = days_per_user // 2
iv = scd2_collapse(ev4, ["k"], ["attr"], "ts", ["eid"])
snap = scd2_snapshot_at(iv, float(mid_day * 86400) + 1.0)
agg = snap.agg(
    F.count(F.lit(1)).alias("rows"),
    F.countDistinct("k").alias("keys"),
    F.sum((F.col("attr") != F.lit(str(mid_day % 3))).cast("long")).alias("wrong"),
).collect()[0]
t4 = time.time() - t0
assert agg["rows"] == USERS and agg["keys"] == USERS and agg["wrong"] == 0, agg
print(f"{t4:.1f}s; exactly one version per {USERS:,} users, all carrying "
      f"attr == mid_day%3 == {mid_day % 3}")

print("\nSOAK GREEN", flush=True)
