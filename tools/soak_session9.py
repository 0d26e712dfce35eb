"""Round-6 session-9 soak: planted closed-form truths at 10M rows.

1. ols_trend at 10M rows x 4 keys on EXACT planted lines y = g·day + 10g:
   slope == g per day, intercept == 10g, r2 == 1, as equalities after
   6-dp rounding.

2. table_fingerprint at 10M rows: the same table reversed and
   repartitioned 7 ways matches on ALL 256 buckets; flipping ONE row's
   value changes at most 2 buckets (the old and new hash homes).

3. column_profile at 10M rows x 4 columns with planted null cadence and
   cardinalities: every count, null count, distinct count, and min/max
   string is closed-form exact.

    python tools/soak_session9.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.profile import column_profile, table_fingerprint
from cerebro_spark.operators.tsdb import ols_trend
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0

spark = get_spark("soak-session9", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def banner(s: str) -> None:
    print(f"\n=== {s} ===", flush=True)


# ---------------------------------------------------------------------------
# 1. ols_trend
# ---------------------------------------------------------------------------
N1 = int(10_000_000 * SCALE)
banner(f"ols_trend: {N1:,} rows x 4 keys, exact planted lines")

t0 = time.time()
df1 = spark.range(N1).select(
    (F.col("id") % 4 + 1).alias("g"),
    ((F.col("id") / 4).cast("long") % 2000).alias("d"),
)
df1 = df1.select(
    F.col("g").cast("string").alias("k"),
    (F.col("d") * 86400).cast("double").alias("t"),
    (F.col("g") * F.col("d") + 10 * F.col("g")).cast("double").alias("v"),
)
out = {r["k"]: r for r in ols_trend(df1, "v", "t", ["k"]).collect()}
t1 = time.time() - t0
for g in (1, 2, 3, 4):
    r = out[str(g)]
    assert r["slope_per_day"] == float(g), r
    assert r["intercept"] == float(10 * g), r
    assert r["r2"] == 1.0, r
print(f"{t1:.1f}s; all 4 keys: slope == g, intercept == 10g, r2 == 1.0 exactly")

# ---------------------------------------------------------------------------
# 2. table_fingerprint
# ---------------------------------------------------------------------------
N2 = int(10_000_000 * SCALE)
banner(f"table_fingerprint: {N2:,} rows, invariance + single-flip detection")

t0 = time.time()
a = spark.range(N2).select(
    F.col("id"), (F.col("id") % 1000).cast("string").alias("v")
)
b = (
    spark.range(N2)
    .select((N2 - 1 - F.col("id")).alias("id"))
    .select(F.col("id"), (F.col("id") % 1000).cast("string").alias("v"))
    .repartition(7)
)
cols = [F.col("id"), F.col("v")]
fa = {r["bucket"]: (r["n"], r["checksum"]) for r in table_fingerprint(a, cols).collect()}
fb = {r["bucket"]: (r["n"], r["checksum"]) for r in table_fingerprint(b, cols).collect()}
assert fa == fb and len(fa) == 256
c = spark.range(N2).select(
    F.col("id"),
    F.when(F.col("id") == N2 // 2, F.lit("FLIPPED"))
    .otherwise((F.col("id") % 1000).cast("string"))
    .alias("v"),
)
fc = {r["bucket"]: (r["n"], r["checksum"]) for r in table_fingerprint(c, cols).collect()}
diff = {k for k in set(fa) | set(fc) if fa.get(k) != fc.get(k)}
t2 = time.time() - t0
assert 1 <= len(diff) <= 2, diff
print(f"{t2:.1f}s; reversed+repartitioned twin matches all 256 buckets; "
      f"one flipped row isolates to {len(diff)} bucket(s)")

# ---------------------------------------------------------------------------
# 3. column_profile
# ---------------------------------------------------------------------------
N3 = int(10_000_000 * SCALE)
banner(f"column_profile: {N3:,} rows x 4 columns, planted cardinalities")

t0 = time.time()
df3 = spark.range(N3).select(
    F.col("id"),
    F.when(F.col("id") % 10 == 0, F.lit(None).cast("string"))
    .otherwise((F.col("id") % 7).cast("string"))
    .alias("mod7"),
    (F.col("id") % 100).alias("mod100"),
    F.lit("const").alias("c"),
)
out = {r["column"]: r for r in column_profile(
    df3,
    {"id": F.col("id"), "mod7": F.col("mod7"),
     "mod100": F.col("mod100"), "c": F.col("c")},
).collect()}
t3 = time.time() - t0
assert out["id"]["n_distinct"] == N3 and out["id"]["n_null"] == 0
assert out["id"]["min_value"] == "0"
assert out["mod7"]["n_null"] == N3 // 10 + (1 if N3 % 10 else 0)
assert out["mod7"]["n_distinct"] == 7
assert out["mod100"]["n_distinct"] == 100
assert (out["mod100"]["min_value"], out["mod100"]["max_value"]) == ("0", "99")
assert out["c"]["n_distinct"] == 1 and out["c"]["min_value"] == "const"
print(f"{t3:.1f}s; all planted counts/cardinalities/extremes exact "
      f"(incl. a {N3:,}-distinct exact count_distinct)")

print("\nSOAK GREEN", flush=True)
