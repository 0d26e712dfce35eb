"""Round-6 session-5 soak: the new operators at the scale the sf0.1 gate
can't show — each with a PLANTED closed-form truth, not just a wall clock.

1. Bloom semi-join at 1M build keys / 10M probe keys (9M absent): the
   no-false-negative guarantee must hold as an equality, the measured
   false-positive rate must sit within 2x of the (1 - e^{-kn/m})^k
   theory, and the zero-shuffle literal-array probe is timed against the
   exact broadcast semi-join doing the same pruning.

2. esd_outliers at 10M rows x 4 keys with 3 planted extremes per key:
   the rounds must recover exactly the planted values in deviation
   order — the one-scan + closed-form-update reformulation must agree
   with the sequential textbook algorithm at a scale where running the
   textbook k-pass version would already hurt.

3. audience_overlap at 10M (user, cat) rows where membership is
   u % p_c == 0 for per-category primes: every pairwise intersection is
   floor arithmetic (inclusion by lcm), checked as equalities.

4. sax_motifs at 5M rows / ~87k hourly buckets with a planted 6h
   sawtooth: the dominant motif and its occurrence count are closed
   form; the data-sized stage must be the PAA groupBy alone.

5. markov_attribution at 10M events / 500k users with a planted journey
   mix: click-heavy converting journeys vs view-only dead ends — the
   transition matrix is known in closed form, so p_conv and the
   knockout ordering are exact expectations, not eyeballs.

    python tools/soak_session5.py [scale]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.joins import (
    bloom_build,
    bloom_probe_join,
    bloom_words_literal,
)
from cerebro_spark.operators.profile import (
    audience_overlap,
    markov_attribution,
)
from cerebro_spark.operators.tsdb import esd_outliers, sax_motifs
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

spark = get_spark("soak-session5", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def banner(s: str) -> None:
    print(f"\n=== {s} ===", flush=True)


# ---------------------------------------------------------------------------
# 1. Bloom semi-join
# ---------------------------------------------------------------------------
N_BUILD = int(1_000_000 * SCALE)
N_PROBE = int(10_000_000 * SCALE)
W = 32768  # 32k words x 62 bits = 2.03M bits; k=3, n=1M -> fp ~ 0.9%
banner(f"bloom: build {N_BUILD:,}, probe {N_PROBE:,}, {W} words")

build = spark.range(N_BUILD).select(F.col("id").alias("k"))
probe = spark.range(N_PROBE).select(F.col("id").alias("k"))

t0 = time.time()
bloom = bloom_build(build, "k", W).cache()
bloom.count()
t_build = time.time() - t0

t0 = time.time()
agg = (
    bloom_probe_join(probe, "k", bloom, W)
    .agg(
        F.sum(F.col("bloom_pass").cast("long")).alias("n_pass"),
        F.sum(
            ((F.col("k") < N_BUILD) & ~F.col("bloom_pass")).cast("long")
        ).alias("n_false_neg"),
        F.sum(
            ((F.col("k") >= N_BUILD) & F.col("bloom_pass")).cast("long")
        ).alias("n_fp"),
    )
    .collect()[0]
)
t_probe = time.time() - t0

m_bits = W * 62
fp_theory = (1.0 - math.exp(-3.0 * N_BUILD / m_bits)) ** 3
fp_rate = agg["n_fp"] / max(N_PROBE - N_BUILD, 1)
print(f"build {t_build:.1f}s, probe {t_probe:.1f}s")
print(f"false negatives: {agg['n_false_neg']} (MUST be 0)")
print(f"fp rate {fp_rate:.4%} vs theory {fp_theory:.4%}")
assert agg["n_false_neg"] == 0
assert fp_rate < 2.0 * fp_theory + 1e-4

# baseline: the exact broadcast semi-join the filter replaces
t0 = time.time()
n_semi = probe.join(F.broadcast(build), "k", "left_semi").count()
t_semi = time.time() - t0
print(f"exact broadcast semi-join: {t_semi:.1f}s (n={n_semi:,}); "
      f"bloom probe is a shuffle-free projection at {t_probe:.1f}s")
assert n_semi == N_BUILD

# ---------------------------------------------------------------------------
# 2. generalized ESD
# ---------------------------------------------------------------------------
N_ESD = int(10_000_000 * SCALE)
banner(f"esd_outliers: {N_ESD:,} rows x 4 keys, 3 planted extremes each")

base = spark.range(N_ESD).select(
    (F.col("id") % 4).cast("string").alias("key"),
    # hash-uniform noise in [0, 100)
    (F.abs(F.hash(F.col("id"))) % 100000).cast("double").alias("value"),
) .withColumn("value", F.col("value") / 1000.0)
planted = spark.createDataFrame(
    [(str(k), v) for k in range(4) for v in (5000.0, -4000.0, 3000.0)],
    "key string, value double",
)
t0 = time.time()
got = (
    esd_outliers(base.unionByName(planted), "value", ["key"], k=3)
    .orderBy("key", "round")
    .collect()
)
t_esd = time.time() - t0
print(f"{t_esd:.1f}s; rounds per key: "
      f"{ {r['key']: r['round'] for r in got} }")
for k in range(4):
    vals = [r["value"] for r in got if r["key"] == str(k)]
    assert vals == [5000.0, -4000.0, 3000.0], vals
print("all 4 keys recover the planted extremes in deviation order")

# ---------------------------------------------------------------------------
# 3. audience_overlap
# ---------------------------------------------------------------------------
N_USERS = int(10_000_000 * SCALE)
PRIMES = {"A": 2, "B": 3, "C": 5}
banner(f"audience_overlap: {N_USERS:,} users, membership u %% p == 0")

aud = None
for cat, p in PRIMES.items():
    part = (
        spark.range(N_USERS)
        .filter(F.col("id") % p == 0)
        .select(F.col("id").alias("u"), F.lit(cat).alias("c"))
    )
    aud = part if aud is None else aud.unionByName(part)
t0 = time.time()
ov = {
    (r["cat_a"], r["cat_b"]): r["overlap"]
    for r in audience_overlap(aud, "u", "c").collect()
}
t_ov = time.time() - t0


def _members(p: int) -> int:
    return (N_USERS - 1) // p + 1


for (a, b), n in ov.items():
    lcm = PRIMES[a] * PRIMES[b] // math.gcd(PRIMES[a], PRIMES[b])
    expect = (N_USERS - 1) // lcm + 1
    assert n == expect, (a, b, n, expect)
print(f"{t_ov:.1f}s; all {len(ov)} pairwise intersections exact ",
      f"(e.g. A∩B = {ov[('A', 'B')]:,} == floor arithmetic)")

# ---------------------------------------------------------------------------
# 4. sax_motifs
# ---------------------------------------------------------------------------
N_SAX = int(5_000_000 * SCALE)
banner(f"sax_motifs: {N_SAX:,} rows, planted 6h sawtooth")

# ~60 points per hourly bucket; value cycles by hour-of-six: 10..60
sax = spark.range(N_SAX).select(
    F.lit("chan").alias("key"),
    F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400 * 3600
                        + F.col("id") % 60).alias("ts"),
    ((F.col("id") % 86400 % 6 + 1) * 10.0).alias("value"),
)
t0 = time.time()
top = (
    sax_motifs(sax, "ts", "value", ["key"], word_len=6, alphabet=6, top=1)
    .collect()[0]
)
t_sax = time.time() - t0
# hours h, h+6, ... share a value level; ntile(6) maps levels to bands
# 1..6 in order; the dominant 6-word is the ascending run "123456"
print(f"{t_sax:.1f}s; top motif {top['motif']} x {top['n_occurrences']}")
assert top["motif"] == "123456"

# ---------------------------------------------------------------------------
# 5. markov_attribution
# ---------------------------------------------------------------------------
N_EV = int(10_000_000 * SCALE)
banner(f"markov_attribution: {N_EV:,} events, planted journey mix")

# 5 events per user; user u converting iff u % 2 == 0:
#   converting: click click click view purchase
#   dead end:   view view view view view
ev = spark.range(N_EV).select(
    F.col("id").alias("event_id"),
    (F.col("id") / 5).cast("long").alias("user_id"),
    F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 5).alias("ts"),
    F.when(
        F.col("id") % 10 < 5,  # even users -> converting journey
        F.when(F.col("id") % 5 < 3, F.lit("click"))
        .when(F.col("id") % 5 == 3, F.lit("view"))
        .otherwise(F.lit("purchase")),
    ).otherwise(F.lit("view")).alias("event_type"),
)
t0 = time.time()
attr = {r["channel"]: r for r in markov_attribution(ev).collect()}
t_mk = time.time() - t0
print(f"{t_mk:.1f}s; channels: "
      f"{ {c: round(r['attribution_share'], 4) for c, r in attr.items()} }")
# closed-form chain: start->click/view 1/2 each; click->click 2/3,
# click->view 1/3; view->view 2/3, view->conv 1/6, view->null 1/6.
# a(view)=a(click)=1/2 -> p_conv = 1/2.  Removing view severs EVERY
# conversion path (exact 0); removing click leaves start->view->conv
# at 1/2 * 1/2 = 1/4 (the chain is first-order — paths mix).  Shares:
# view 2/3, click 1/3.  Tolerance 1e-3: convergence is geometric at
# (2/3)^25 ~ 4e-5 plus per-edge floor dust.
assert abs(attr["click"]["p_conv"] - 0.5) < 1e-3
assert attr["view"]["p_conv_removed"] == 0.0
assert abs(attr["click"]["p_conv_removed"] - 0.25) < 1e-3
assert abs(attr["click"]["attribution_share"] - 1.0 / 3.0) < 1e-3
assert abs(attr["view"]["attribution_share"] - 2.0 / 3.0) < 1e-3

print("\nSOAK GREEN")
