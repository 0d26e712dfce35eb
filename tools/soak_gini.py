"""Round-6 soak: `gini_concentration` exactness + distribution at 10M keys.

What the pytest gates can't show: the two-level distributed ranking
(range buckets → cumulative offsets → per-bucket row_number) must produce
EXACTLY the global rank — i.e. the same Σ i·xᵢ as a brute-force global
sort — at a scale where a single-partition WindowExec would be the
bottleneck, and on a SKEWED value distribution where range buckets are
unevenly filled (the documented weak spot: heavy skew concentrates a
bucket; n_buckets=1024 default).

Exactness referee: DuckDB computes the same Gini by brute-force
row_number over the full 10M rows (it sorts 10M rows in ~1 s) and the two
doubles must match BIT-FOR-BIT (both engines run the identical fixed
IEEE chain over identical exact integers).

Value distribution: hash-derived (SCALE_NOTES r5: no modular cycling)
power-law-ish — v = (h mod 100)² ≤ 9801 — so mass concentrates in few
keys and bucket fill is skewed, while Σ i·v ≈ n²·mean/2 ≈ 1.6e17 stays
inside the operator's documented 2^63 exact-BIGINT bound (the first soak
run used (h mod 1000)³ and tripped ANSI ARITHMETIC_OVERFLOW — which is
itself evidence the overflow surfaces loudly, not as silent wraparound).

    python tools/soak_gini.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F

from cerebro_spark.operators.profile import gini_concentration
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N = int(10_000_000 * SCALE)

spark = get_spark("soak-gini")

vals = spark.range(N).select(
    F.col("id").alias("k"),
    (
        F.pmod(F.hash(F.col("id")), F.lit(100))
        * F.pmod(F.hash(F.col("id")), F.lit(100))
    ).cast("long").alias("v"),
)
path = "/tmp/soak_gini_vals.parquet"
vals.write.mode("overwrite").parquet(path)

t0 = time.time()
out = gini_concentration(
    spark.read.parquet(path), "v", "k"
).collect()[0]
dt = time.time() - t0
print(f"spark gini: {dt:.1f}s gini={out['gini']!r} n={out['n']:,} "
      f"total={out['total']:,}")

ref = duckdb.sql(f"""
WITH ranked AS (
  SELECT v, row_number() OVER (ORDER BY v, k) AS i
  FROM read_parquet('{path}/*.parquet')
),
agg AS (
  SELECT CAST(sum(v) AS BIGINT) AS s0, CAST(sum(i * v) AS BIGINT) AS s1,
         count(*) AS n
  FROM ranked
)
SELECT (2.0 * s1) / (CAST(s0 AS DOUBLE) * n) - CAST(n + 1 AS DOUBLE) / n
FROM agg
""").fetchone()[0]
print(f"duckdb brute-force gini={ref!r}")

assert out["n"] == N
assert out["gini"] == ref, f"gini mismatch: {out['gini']!r} != {ref!r}"
assert dt < 300, f"too slow: {dt:.1f}s"
print("SOAK GREEN")
