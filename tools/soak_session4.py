"""Round-6 session-4 soak: the new operators at the scale the sf0.1 gate
can't show.

1. ``interval_overlap_join`` at 2M x 200k intervals with PLANTED truth:
   the left side is a grid of disjoint 10-minute sessions, the right side
   plants exactly one in-session incident for every 10th session plus a
   large mass of incidents in the gaps — so the expected pair count is
   known in closed form and the exactly-once guarantee is checkable as an
   equality (any bucket-dedup bug shows as a multiple).  Also measures
   the documented skew hazard: one pathological week-long interval is
   injected and must not blow the runtime (it replicates into
   week/bucket rows, bounded and predictable).

2. ``bootstrap_ci`` at 5M rows x 100 replicates (500M exploded rows):
   the explode is projection-only, the groupBy(replicate) is combinable —
   wall time should stay within a small multiple of the plain scan; the
   CI must bracket the true mean of the hash-uniform values and have
   ~1/sqrt(n) width (closed-form check, no referee engine needed).

3. ``mmr_rerank`` at 200k x 64-d corpus, 8 queries, k=10 over 100
   candidates: the cost must be dominated by the candidate top-k (one
   corpus scan), with the k-1 greedy iterations adding bounded small-job
   overhead; asserts no duplicate picks and rank-1 == cosine argmax.

    python tools/soak_session4.py [scale]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.joins import interval_overlap_join
from cerebro_spark.operators.profile import bootstrap_ci
from cerebro_spark.operators.similarity import mmr_rerank
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

spark = get_spark("soak-session4", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def banner(s: str) -> None:
    print(f"\n=== {s} ===", flush=True)


# ---------------------------------------------------------------------------
# 1. interval_overlap_join
# ---------------------------------------------------------------------------
N_SESS = int(2_000_000 * SCALE)
banner(f"interval_overlap_join: {N_SESS:,} sessions x {N_SESS // 10:,} incidents")

# sessions: session i = [i*900, i*900 + 600] (10 min active, 5 min gap)
sess = spark.range(N_SESS).select(
    F.col("id").alias("sid"),
    (F.col("id") * 900).alias("s_start"),
    (F.col("id") * 900 + 600).alias("s_end"),
)
# incidents: for every 10th session, one planted IN-SESSION hit at +300 s;
# for every 10th+5 session, one planted GAP incident at +700 s (no overlap)
hits = spark.range(0, N_SESS, 10).select(
    (F.col("id") * 900 + 300).alias("mid")
)
miss = spark.range(5, N_SESS, 10).select(
    (F.col("id") * 900 + 700 - 50).alias("mid")  # 650: in the 600..900 gap? no:
)
# gap runs (i*900+600, (i+1)*900); plant at +650 with ±20 window => 630..670
inc = (
    hits.select((F.col("mid") - 20).alias("i_start"), (F.col("mid") + 20).alias("i_end"))
    .unionByName(
        miss.select((F.col("mid") - 20).alias("i_start"), (F.col("mid") + 20).alias("i_end"))
    )
    .withColumn("iid", F.monotonically_increasing_id())
)
# the documented skew hazard: ONE week-long interval (replicates into
# 672 buckets at bucket=900 — bounded, must not dominate)
week = spark.range(1).select(
    F.lit(0).cast("long").alias("i_start"),
    F.lit(7 * 86400).cast("long").alias("i_end"),
    F.lit(-1).cast("long").alias("iid"),
)
inc = inc.unionByName(week)

t0 = time.time()
pairs = interval_overlap_join(
    sess, inc, "s_start", "s_end", "i_start", "i_end", bucket_seconds=900
)
n_pairs = pairs.count()
dt = time.time() - t0

n_hits = len(range(0, N_SESS, 10))
# the week interval [0, 604800] covers sessions 0..671 fully and session
# 672 starts at 604800 <= 604800 (closed) -> overlap; count sessions with
# s_start <= 604800: ids 0..671 have start <= 603900; id 672 start=604800
# == week end -> overlaps (closed).  = 673 pairs (when N_SESS > 672).
n_week = min(673, N_SESS)
expected = n_hits + n_week
print(f"pairs={n_pairs:,} expected={expected:,} wall={dt:.1f}s")
assert n_pairs == expected, (n_pairs, expected)

# ---------------------------------------------------------------------------
# 2. bootstrap_ci
# ---------------------------------------------------------------------------
N_BOOT = int(5_000_000 * SCALE)
banner(f"bootstrap_ci: {N_BOOT:,} rows x 100 replicates")

vals = spark.range(N_BOOT).select(
    F.col("id"),
    (((F.col("id") * 2654435761) % 10000).cast("double") / 100.0).alias("v"),
)
t0 = time.time()
row = bootstrap_ci(vals, "v", "id", b=100).collect()[0]
dt = time.time() - t0
true_mean = row["mean"]
width = row["ci_hi"] - row["ci_lo"]
# sigma(U[0,100)) ~ 28.87 -> 95% CI width ~ 2*1.96*28.87/sqrt(n)
pred = 2 * 1.96 * 28.87 / math.sqrt(N_BOOT)
print(f"n={row['n']:,} mean={true_mean:.4f} ci=[{row['ci_lo']:.4f}, "
      f"{row['ci_hi']:.4f}] width={width:.5f} predicted~{pred:.5f} "
      f"wall={dt:.1f}s")
assert row["ci_lo"] < true_mean < row["ci_hi"]
assert 0.3 * pred < width < 3.0 * pred, (width, pred)

# ---------------------------------------------------------------------------
# 3. mmr_rerank
# ---------------------------------------------------------------------------
N_VEC = int(200_000 * SCALE)
DIM = 64
banner(f"mmr_rerank: {N_VEC:,} x {DIM}-d corpus, 8 queries, k=10 of 100")

# deterministic dense vectors: v[j] = ((id*31 + j*17) % 97) / 97
emb = spark.range(N_VEC).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda j: ((F.col("id") * 31 + j * 17) % 97).cast("double") / 97.0,
    ).alias("embedding"),
)
t0 = time.time()
out = mmr_rerank(
    emb, emb.filter(F.col("vec_id") < 8), k=10, n_candidates=100, lam=0.5
).collect()
dt = time.time() - t0
by_q: dict[int, list] = {}
for r in out:
    by_q.setdefault(r["query_id"], []).append(r)
assert len(by_q) == 8
for q, rows in by_q.items():
    ids = [r["neighbor_id"] for r in rows]
    assert len(ids) == len(set(ids)) == 10, q          # no duplicate picks
    r1 = min(rows, key=lambda r: r["mmr_rank"])
    top = max(rows, key=lambda r: (r["cosine"], -r["neighbor_id"]))
    assert r1["cosine"] >= top["cosine"] - 1e-12       # rank1 = argmax rel
print(f"8 queries x 10 picks ok, wall={dt:.1f}s")

print("\nSOAK SESSION4 GREEN")
