"""Round-6 session-6 soak: the new operators at the scale the sf0.1 gate
can't show — each with a PLANTED closed-form truth, not just a wall clock.

1. binseg_changepoints at 10M rows x 4 keys with planted nested mean
   steps: level-1 and both level-2 splits must land EXACTLY on the
   planted bucket boundaries and the level-1 gain must equal the
   closed-form SSE reduction of the step series.

2. cross_corr at 10M rows where series B is series A shifted exactly
   +2 hours and affinely rescaled: corr(+2) == 1.0 as an equality,
   every other lag strictly below, and the overlap counts are floor
   arithmetic.

3. adamic_adar at ~5M edges with K planted degree-2 bridge neighbors
   all connecting the SAME pair: that pair's score is exactly K/ln 2
   and must rank first, above a sea of degree-50 background wedges.

4. kfold_target_encode at 10M rows x 1000 categories: bit-identical to
   a DuckDB HUGEINT referee computing the same rational on the same
   md5 folds (the grid is 5000 cells — every cell compared).

5. jl_project at 1M rows of unit basis vectors e_i: every projected
   squared norm is EXACTLY 1 (signs square to 1), so the distortion
   ratio is an equality at any scale; plus a random-cloud mean-ratio
   sanity band.

6. msprt_monitor at 10M events / 120 days with a null first half and a
   planted lift from day 60: p_always stays > 0.2 through day 59,
   collapses below 1e-6 by day 119, and is monotone non-increasing
   everywhere (the always-valid property, asserted on every step).

    python tools/soak_session6.py [scale]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.cluster import adamic_adar
from cerebro_spark.operators.profile import msprt_monitor
from cerebro_spark.operators.sampling import kfold_target_encode
from cerebro_spark.operators.similarity import jl_project
from cerebro_spark.operators.tsdb import binseg_changepoints, cross_corr
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

spark = get_spark("soak-session6", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def banner(s: str) -> None:
    print(f"\n=== {s} ===", flush=True)


# ---------------------------------------------------------------------------
# 1. binseg_changepoints: planted nested steps
# ---------------------------------------------------------------------------
N1 = int(10_000_000 * SCALE)
HOURS = 4000  # per key; levels 0/100/200/300 every 1000 hours
banner(f"binseg_changepoints: {N1:,} rows x 4 keys, {HOURS} hourly buckets")

t0 = time.time()
ev = spark.range(N1).select(
    (F.col("id") % 4).cast("string").alias("k"),
    ((F.col("id") / 4).cast("long") % HOURS).alias("h"),
)
ev = ev.select(
    "k",
    (F.col("h") * 3600).cast("double").alias("t"),
    (
        (F.col("h") / 1000).cast("long") * 100
    ).cast("double").alias("v"),
)
out = binseg_changepoints(ev, "v", "t", ["k"], 3600, 2).collect()
t1 = time.time() - t0
by = {}
for r in out:
    by.setdefault(r["k"], {})[(r["level"], r["segment"])] = r
for k in ("0", "1", "2", "3"):
    assert by[k][(1, 0)]["split_bucket"] == 1999, by[k]
    assert by[k][(2, 0)]["split_bucket"] == 999
    assert by[k][(2, 1)]["split_bucket"] == 2999
# closed-form level-1 gain on the mean series (4 steps of 1000 buckets,
# values 0/100/200/300): total SSE = 4000*Var = 4000*12500; split at the
# middle leaves each half with Var 2500 -> SSE 2000*2500*2 = 1e7;
# gain = 5e7 - 1e7 = 4e7
g = by["0"][(1, 0)]["gain"]
assert abs(g - 4.0e7) < 1e-3, g
print(f"{t1:.1f}s; all 4 keys: splits (1999 | 999, 2999), gain {g:,.0f} == 4e7")

# ---------------------------------------------------------------------------
# 2. cross_corr: planted +2h lead
# ---------------------------------------------------------------------------
N2 = int(10_000_000 * SCALE)
banner(f"cross_corr: {N2:,} rows, B = 3*A(t-2h) + 7")

t0 = time.time()
base = spark.range(N2).select(
    ((F.col("id") / 2).cast("long") % 5000).alias("h"),
    (F.col("id") % 2).alias("side"),
)
sa = base.filter("side = 0").select(
    F.lit("a").alias("s"),
    (F.col("h") * 3600).cast("double").alias("t"),
    ((F.col("h") * 37) % 101).cast("double").alias("v"),
)
sb = base.filter("side = 1").select(
    F.lit("b").alias("s"),
    ((F.col("h") + 2) * 3600).cast("double").alias("t"),
    (((F.col("h") * 37) % 101) * 3 + 7).cast("double").alias("v"),
)
cc = {r["lag"]: r for r in cross_corr(
    sa.unionByName(sb), "s", "a", "b", "v", "t", 3600, 3
).collect()}
t2 = time.time() - t0
assert cc[2]["corr"] == 1.0, cc[2]
assert cc[2]["n_overlap"] == 5000
for lag in (-3, -2, -1, 0, 1, 3):
    assert cc[lag]["corr"] is None or cc[lag]["corr"] < 0.999, cc[lag]
print(f"{t2:.1f}s; corr(+2) == 1.0 exactly, all other lags < 0.999")

# ---------------------------------------------------------------------------
# 3. adamic_adar: planted bridge pair
# ---------------------------------------------------------------------------
E3 = int(5_000_000 * SCALE)
K_BRIDGE = 1000
banner(f"adamic_adar: {E3:,} background edges + {K_BRIDGE} bridges on one pair")

t0 = time.time()
# background: neighbors w of degree 50 over a wide node id space
bg = spark.range(E3).select(
    (F.col("id") / 50).cast("long").alias("w"),
    (F.col("id") * 2654435761 % 10_000_000 + 100).alias("n"),
)
# bridges: K degree-2 neighbors all connecting nodes 1 and 2
br = spark.range(K_BRIDGE).select(
    (F.col("id") + 500_000_000).alias("w"), F.lit(1).cast("long").alias("n")
).unionByName(
    spark.range(K_BRIDGE).select(
        (F.col("id") + 500_000_000).alias("w"), F.lit(2).cast("long").alias("n")
    )
)
edges = bg.unionByName(br)
top = adamic_adar(edges, "n", "w", max_degree=200, top_k=5).collect()
t3 = time.time() - t0
best = top[0]
expect = K_BRIDGE * math.floor(1e9 / math.log(2.0) + 0.5) / 1e9
assert (best["node_a"], best["node_b"]) == (1, 2)
assert best["common"] == K_BRIDGE
assert abs(best["score"] - round(expect, 6)) < 1e-9, (best["score"], expect)
assert top[1]["score"] < best["score"] / 100  # background is noise
print(f"{t3:.1f}s; top pair (1,2) score {best['score']:.4f} == K/ln2, "
      f"runner-up {top[1]['score']:.4f}")

# ---------------------------------------------------------------------------
# 4. kfold_target_encode: DuckDB HUGEINT referee on every cell
# ---------------------------------------------------------------------------
N4 = int(10_000_000 * SCALE)
banner(f"kfold_target_encode: {N4:,} rows x 1000 categories vs DuckDB referee")

t0 = time.time()
fact = spark.range(N4).select(
    F.col("id"),
    (F.col("id") % 1000).cast("string").alias("cat"),
    ((F.col("id") * 7919 % 100000).cast("double") / 100.0 - 250.0).alias("y"),
)
grid = kfold_target_encode(fact, "cat", "y", "id", 5, 20)
rows = {(r["category"], r["fold"]): (r["n_fold"], r["enc"]) for r in grid.collect()}
t4a = time.time() - t0

import duckdb

t0 = time.time()
con = duckdb.connect()
hexpand = " + ".join(
    f"CAST((strpos('0123456789abcdef', substr(md5(CAST(id AS VARCHAR)), {j + 1}, 1)) - 1) AS BIGINT) * {16 ** (7 - j)}"
    for j in range(8)
)
ref = con.execute(f"""
WITH base AS (
  SELECT CAST(x % 1000 AS VARCHAR) AS category,
         ({hexpand}) % 5 AS fold,
         CAST(floor((CAST(x * 7919 % 100000 AS DOUBLE) / 100.0 - 250.0) * 1e6 + 0.5) AS BIGINT) AS q
  FROM (SELECT range AS x, CAST(range AS VARCHAR) AS idstr, range AS id FROM range({N4}))
),
cell AS (SELECT category, fold, COUNT(*) nf, SUM(q) sf FROM base GROUP BY 1,2),
cat AS (SELECT category, SUM(nf) nc, SUM(sf) sc FROM cell GROUP BY 1),
gtot AS (SELECT SUM(nf) ng, SUM(sf) sg FROM cell)
SELECT cell.category, cell.fold, nf,
  round(CAST(CAST(sc - sf AS HUGEINT) * ng + CAST(20 AS HUGEINT) * sg AS DOUBLE)
        / CAST(CAST(nc - nf + 20 AS HUGEINT) * ng AS DOUBLE) / 1e6, 6) AS enc
FROM cell JOIN cat USING (category) CROSS JOIN gtot
""").fetchall()
t4b = time.time() - t0
assert len(ref) == len(rows) == 5000
mism = 0
for c, f, nf, enc in ref:
    got = rows[(c, f)]
    if got != (nf, enc):
        mism += 1
assert mism == 0, f"{mism} cells differ"
print(f"spark {t4a:.1f}s, duckdb referee {t4b:.1f}s; all 5000 cells bit-identical")

# ---------------------------------------------------------------------------
# 5. jl_project: basis vectors -> exact unit norms
# ---------------------------------------------------------------------------
N5 = int(1_000_000 * SCALE)
banner(f"jl_project: {N5:,} unit basis vectors e_(id % 64)")

t0 = time.time()
basis = spark.range(N5).select(
    F.col("id"),
    F.expr(
        "transform(sequence(0, 63), j -> CAST(CASE WHEN j = id % 64 THEN 1.0 ELSE 0.0 END AS FLOAT))"
    ).alias("embedding"),
)
pn = jl_project(basis, "embedding", 64, 16, 0).select(
    F.expr("aggregate(proj, 0D, (a,x) -> a + x*x)").alias("pn")
)
bad = pn.filter(F.col("pn") != 1.0).count()
t5 = time.time() - t0
assert bad == 0
print(f"{t5:.1f}s; all {N5:,} projected norms EXACTLY 1.0 "
      f"(signs square to 1 -> no distortion on basis vectors)")

# ---------------------------------------------------------------------------
# 6. msprt_monitor: planted lift from day 60
# ---------------------------------------------------------------------------
N6 = int(10_000_000 * SCALE)
DAYS = 120
banner(f"msprt_monitor: {N6:,} events / {DAYS} days, lift planted from day 60")

t0 = time.time()
evs = spark.range(N6).select(
    ((F.col("id") / 2).cast("long") % DAYS).alias("d"),
    (F.col("id") % 2).alias("arm"),
    # noise keyed on id//2 so the two arms see IDENTICAL value streams in
    # the null phase (id*c % 1000 would leak parity into the noise: even
    # ids get even residues — a real 0.01 mean gap that a sequential test
    # with n=5M per arm CORRECTLY detects, which is power, not a null)
    ((F.col("id") / 2).cast("long") * 104729 % 1000).cast("double").alias("noise"),
)
evs = evs.select(
    (F.col("d") * 86400).cast("double").alias("t"),
    "arm",
    (
        F.col("noise") / 100.0
        + F.when((F.col("arm") == 1) & (F.col("d") >= 60), 2.0).otherwise(0.0)
    ).alias("v"),
)
mon = sorted(
    msprt_monitor(evs, "arm", "v", "t", tau2=1.0, arm_a=0, arm_b=1).collect(),
    key=lambda r: r["day"],
)
t6 = time.time() - t0
assert len(mon) == DAYS
ps = [r["p_always"] for r in mon]
assert all(a >= b for a, b in zip(ps, ps[1:])), "p_always must be monotone"
assert ps[59] > 0.2, ps[59]           # null phase: no false trigger
assert ps[-1] < 1e-6, ps[-1]          # planted lift detected
first_sig = next(i for i, p in enumerate(ps) if p < 0.01)
print(f"{t6:.1f}s; p day59 {ps[59]:.3f} (null held), first p<0.01 at day "
      f"{first_sig}, final {ps[-1]:.2e}; monotone on all {DAYS} steps")

print("\nSOAK GREEN", flush=True)
