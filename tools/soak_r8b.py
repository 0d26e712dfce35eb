"""Round-8 second-session soak: the new rank/survival/eval/alignment
operators at adversarial scale, each with a CLOSED-FORM expected answer.

Claims to prove (operator docstrings):

1. **kendall_tau runtime is grid-bounded, not pair-bounded**: N rows with
   a large x-grid (~N distinct quantized values) and 24 y values compute
   tau over N(N-1)/2 ≈ 5·10¹² implied pairs without enumerating any.  On
   a perfectly monotone planted relation tau-b must be EXACTLY 1.0; on a
   perfectly anti-monotone one EXACTLY -1.0.
2. **decile_lift with a perfectly separating score**: positives planted
   as exactly the top P fraction by score → the top deciles' capture and
   lift are closed-form (capture 0.5/1.0 at deciles 10/9 for P = 0.2,
   lift = 1/base_rate at decile 10, 0 below).
3. **mutual_nn_pairs finds exactly the planted reciprocal pairs**: K
   blocks each holding 2 planted near-identical vectors plus M decoys
   orthogonal-ish to them → output == the K planted pairs, nothing else.
4. **anova_oneway on groups with identical distributions** → F ≈ 0 at
   scale (exact e6 moments — truncation never manufactures variance).

All content is F.hash-derived (no modular cycling; SCALE_NOTES r5
lesson).  Results -> SCALE_NOTES.md (run manually):

    python tools/soak_r8b.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.profile import (
    anova_oneway,
    decile_lift,
    kendall_tau,
)
from cerebro_spark.operators.similarity import mutual_nn_pairs
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N = int(3_000_000 * SCALE)

spark = get_spark("soak-r8b")


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.1f} s -> {out}")
    return out


# -- 1. kendall: monotone step relation with a CLOSED-FORM tau-b ------------
# x uniform over G values (c = N/G rows each), y = floor(x/B_SZ) in K bands.
# Q = 0 (monotone); P = C(K,2)·(band_rows)²; tie terms from the uniform
# marginals — exact integers, mirrored below in pure Python.
import math

G, K = 100_000, 20
B_SZ = G // K
assert N % G == 0, "pick SCALE so N is a multiple of 100k"
c = N // G
band = B_SZ * c
P = (K * (K - 1) // 2) * band * band
n0x2 = N * (N - 1)
n1x2 = G * c * (c - 1)
n2x2 = K * band * (band - 1)
want = round(2.0 * P / (math.sqrt(n0x2 - n1x2) * math.sqrt(n0x2 - n2x2)), 6)

ids = spark.range(N)
mono = ids.select(
    (F.col("id") % G).cast("double").alias("x"),
    F.floor((F.col("id") % G) / B_SZ).cast("double").alias("y"),
)
r = timed(
    f"kendall monotone-step N={N:,} (x-grid {G // 1000}k, y-grid {K}) "
    f"want tau_b={want}",
    lambda: kendall_tau(mono, "x", "y", x_quant=1, y_quant=1).collect()[0],
)
assert r["n"] == N, r
assert abs(r["tau_b"] - want) <= 1e-6, (r, want)

anti = ids.select(
    (F.col("id") % G).cast("double").alias("x"),
    (-F.floor((F.col("id") % G) / B_SZ).cast("double")).alias("y"),
)
r = timed(
    "kendall anti-monotone (want the exact negative)",
    lambda: kendall_tau(anti, "x", "y", x_quant=1, y_quant=1).collect()[0],
)
assert abs(r["tau_b"] + want) <= 1e-6, (r, want)

# -- 2. decile_lift: planted perfect separator ------------------------------
units = spark.range(N).select(
    F.col("id").cast("double").alias("score"),
    (F.col("id") >= int(N * 0.8)).cast("int").alias("y"),
)
rows = timed(
    f"decile_lift planted top-20% positives N={N:,}",
    lambda: {r["decile"]: r for r in decile_lift(units, "score", "y").collect()},
)
assert rows[10]["response_rate"] == 1.0 and rows[9]["response_rate"] == 1.0
assert rows[10]["cum_capture"] == 0.5 and rows[9]["cum_capture"] == 1.0
assert rows[10]["lift"] == 5.0, rows[10]
assert all(rows[d]["n_pos"] == 0 for d in range(1, 9))

# -- 3. mutual_nn: planted reciprocal pairs among decoys --------------------
K = max(1, int(2_000 * SCALE))
M = 50  # decoys per block
DIM = 16
blocks = spark.range(K)
base_axis = [F.lit(0.0)] * DIM


def planted(shift):
    # two near-identical vectors per block on axis 0/1, distinct ids
    return blocks.select(
        (F.col("id") * (M + 2) + shift).alias("vec_id"),
        F.array(
            F.lit(1.0),
            F.lit(0.05 * shift),
            *[F.lit(0.0) for _ in range(DIM - 2)],
        ).alias("embedding"),
        F.col("id").alias("label"),
    )


decoys = (
    spark.range(K * M)
    .select(
        (F.floor(F.col("id") / M) * (M + 2) + 2 + F.col("id") % M).alias(
            "vec_id"
        ),
        F.col("id").alias("__i"),
        F.floor(F.col("id") / M).alias("label"),
    )
    .select(
        "vec_id",
        "label",
        F.array(
            F.lit(0.0),
            F.lit(0.0),
            # decoys live in the orthogonal subspace, all distinct
            # directions: two hash-derived coordinates + a spread axis
            (F.pmod(F.hash(F.col("__i")), F.lit(1000)) / 1000.0 + 0.1).alias(
                "c2"
            ),
            (F.pmod(F.hash(F.col("__i") * 7 + 1), F.lit(1000)) / 1000.0 + 0.1),
            *[F.lit(0.0) for _ in range(DIM - 4)],
        ).alias("embedding"),
    )
)
emb = planted(0).unionByName(planted(1)).unionByName(decoys)
pairs = timed(
    f"mutual_nn K={K:,} blocks x {M + 2} vectors",
    lambda: mutual_nn_pairs(emb, "vec_id", "embedding", "label").collect(),
)
got = sorted((r["id_a"], r["id_b"]) for r in pairs)
want_planted = [(b * (M + 2), b * (M + 2) + 1) for b in range(K)]
planted_found = [p for p in got if p in set(want_planted)]
assert len(planted_found) == K, (len(planted_found), K)
# decoy-decoy reciprocal pairs can exist (random directions), but no pair
# may MIX a planted vector with a decoy: the planted two dominate cosine 1
mixed = [
    (a, b)
    for a, b in got
    if (a % (M + 2) < 2) != (b % (M + 2) < 2)
]
assert not mixed, mixed[:5]

# -- 4. anova: identical group distributions --> F ~ 0 ----------------------
same = spark.range(N).select(
    (F.col("id") % 5).cast("string").alias("g"),
    (F.pmod(F.hash((F.col("id") - F.pmod(F.col("id"), F.lit(5))) / 5), F.lit(10000)) / 100.0).alias("v"),
)
r = timed(
    f"anova identical groups N={N:,}",
    lambda: anova_oneway(same, "g", "v").collect()[0],
)
assert r["k_groups"] == 5 and r["eta_sq"] is not None
assert r["eta_sq"] < 1e-6, r

print("SOAK GREEN")
