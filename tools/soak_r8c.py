"""Round-8 late-birth soak: the staged rank-test / concentration /
silhouette operators at adversarial scale, each with a CLOSED-FORM
expected answer.

Claims to prove (operator docstrings):

1. **mann_whitney_u symmetry is exact at scale**: two arms carrying the
   IDENTICAL value multiset (every value once per arm — maximal
   cross-arm ties) must give U₁ = n₁n₂/2 exactly, z = 0, rank-biserial
   = 0 — any drift is quantization or overflow leaking in.
2. **levene_test symmetry**: two arms with identical spread → W = 0
   exactly (the medians and deviation multisets coincide).
3. **concentration_at boundary-cell ceiling is exact**: 1 000 planted
   whales (value 900) over 99 000 minnows (value 1) with p = 90% —
   target 899 100 sits INSIDE the whale cell, k = ⌈899100/900⌉ = 999.
4. **centroid_silhouette at 100k vectors**: 10 tight, far-apart planted
   clusters → every label's mean silhouette > 0.999; runtime is n·k
   distance rows, never n².

All content is id-derived (no RNG).  Results -> SCALE_NOTES.md:

    python tools/soak_r8c.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.profile import (
    concentration_at,
    levene_test,
    mann_whitney_u,
)
from cerebro_spark.operators.similarity import centroid_silhouette
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N = int(3_000_000 * SCALE)

spark = get_spark("soak-r8c")


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f} s -> {out}")
    return out


# -- 1. MWU identical-multiset arms -----------------------------------------
ids = spark.range(N)
both = ids.select(
    (F.col("id") % (N // 2)).cast("double").alias("v"),
    (F.col("id") >= N // 2).cast("int").alias("g"),
)
r = timed(
    f"mwu identical arms N={N:,}",
    lambda: mann_whitney_u(both, "g", "v", quant=1).collect()[0],
)
assert r["n1"] == N // 2 and r["n2"] == N // 2, r
assert r["u1"] == (N // 2) * (N // 2) / 2, r
assert r["rank_biserial"] == 0.0, r
assert r["z"] == 0.0, r

# -- 2. levene identical-spread arms ----------------------------------------
lv = ids.select(
    ((F.col("id") % 1000) + F.when(F.col("id") >= N // 2, 100000).otherwise(0))
    .cast("double")
    .alias("v"),
    (F.col("id") >= N // 2).cast("string").alias("g"),
)
r = timed(
    f"levene identical spreads N={N:,}",
    lambda: levene_test(lv, "g", "v", quant=1).collect()[0],
)
assert r["k_groups"] == 2 and r["w_stat"] == 0.0, r

# -- 3. concentration planted whales ----------------------------------------
W, M = 1_000, 99_000
units = spark.range(W + M).select(
    F.col("id").alias("u"),
    F.when(F.col("id") < W, F.lit(900.0)).otherwise(F.lit(1.0)).alias("v"),
)
r = timed(
    f"concentration {W:,} whales over {M:,} minnows",
    lambda: concentration_at(units, "u", "v", 90, 100).collect()[0],
)
assert r["n_units"] == W + M, r
assert r["total"] == 999000.0, r
assert r["k_units"] == 999, r

# -- 4. silhouette 100k vectors, 10 planted clusters ------------------------
NV = int(100_000 * SCALE)
DIM = 16
vec = spark.range(NV).select(
    F.col("id").alias("vec_id"),
    (F.col("id") % 10).alias("label"),
    F.array(
        *[
            (
                F.when(F.col("id") % 10 == k, 100.0).otherwise(0.0)
                + F.when(
                    F.lit(d) == 15,
                    (F.pmod(F.hash(F.col("id")), F.lit(100)) / 1000.0),
                ).otherwise(0.0)
            )
            for k, d in [(d % 10, d) for d in range(DIM)]
        ]
    ).alias("embedding"),
)
# axis d < 10 carries cluster k = d's spike; axis 15 a small per-point jitter
r = timed(
    f"silhouette NV={NV:,} x 10 clusters",
    lambda: centroid_silhouette(vec, "embedding", "label").collect(),
)
assert len(r) == 10, r
worst = min(x["mean_silhouette"] for x in r)
assert worst > 0.99, (worst, r[:2])

print("SOAK GREEN")
