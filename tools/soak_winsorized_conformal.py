"""Round-6 session-4 soak #2: winsorized_mean and conformal_interval at 10M
rows, with DuckDB as a brute-force exactness referee.

``winsorized_mean`` must equal a global-sort exact-rank winsorization
BIT-FOR-BIT at a scale where the per-key sort it avoids would dominate —
the value-grid path's whole claim.  The value distribution is skewed
(squared hash) so grid cells fill unevenly.

``conformal_interval`` at 10M rows must (a) stay wall-clock-bounded by the
scan + the capped calibration sort (1000 rows/key), and (b) deliver the
distribution-free coverage ≥ 1−α on the ~2.5M-row test split — at this n
the empirical coverage should sit within a fraction of a percent of the
target, a much sharper check than the pytest's small-sample slack.

    python tools/soak_winsorized_conformal.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import functions as F

from cerebro_spark.operators.profile import conformal_interval, winsorized_mean
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N = int(10_000_000 * SCALE)

spark = get_spark("soak-winsorized-conformal", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

# skewed values: (h mod 1000)^2 / 100 in [0, 9980.01], mass near 0
df = spark.range(N).select(
    F.col("id"),
    (F.pmod(F.col("id") * 2654435761, F.lit(1000)) ** 2 / 100.0).alias("v"),
    (F.pmod(F.col("id"), F.lit(4))).cast("string").alias("k"),
)

print(f"=== winsorized_mean: {N:,} rows, 4 keys, skewed grid ===", flush=True)
t0 = time.time()
got = {r["k"]: r for r in winsorized_mean(df, "v", ["k"]).collect()}
dt = time.time() - t0

ref = duckdb.sql(f"""
WITH t AS (
  SELECT CAST((CAST(i AS HUGEINT) * 2654435761) % 1000 AS DOUBLE) AS h,
         i % 4 AS k
  FROM generate_series(0, {N - 1}) s(i)
),
q AS (
  SELECT CAST(k AS VARCHAR) AS k,
    CAST(floor((h * h / 100.0) * 100 + 0.5) AS BIGINT) AS q
  FROM t
),
ranked AS (
  SELECT k, q, row_number() OVER (PARTITION BY k ORDER BY q) AS rn,
    count(*) OVER (PARTITION BY k) AS n
  FROM q
),
bounds AS (
  SELECT k, min(n) AS n,
    min(CASE WHEN rn = CAST(floor((5 * n + 99) / 100.0) AS BIGINT) THEN q END) AS lo,
    min(CASE WHEN rn = CAST(floor((95 * n + 99) / 100.0) AS BIGINT) THEN q END) AS hi
  FROM ranked GROUP BY k
)
SELECT b.k, b.n,
  CAST(b.lo AS DOUBLE) / 100 AS p_lo, CAST(b.hi AS DOUBLE) / 100 AS p_hi,
  CAST(sum(greatest(least(q.q, b.hi), b.lo)) AS DOUBLE) / (100.0 * b.n) AS win_mean
FROM q JOIN bounds b USING (k)
GROUP BY 1, 2, 3, 4
""").fetchall()

for k, n, p_lo, p_hi, win in ref:
    g = got[k]
    assert g["n"] == n, (k, g["n"], n)
    assert g["p_lo"] == p_lo and g["p_hi"] == p_hi, (k, g["p_lo"], p_lo, g["p_hi"], p_hi)
    assert g["win_mean"] == win, (k, g["win_mean"], win)  # bit-for-bit
print(f"4 keys bit-identical to DuckDB global-sort referee, wall={dt:.1f}s")

print(f"\n=== conformal_interval: {N:,} rows, 4 groups ===", flush=True)
t0 = time.time()
rows = conformal_interval(df, "v", "k", "id").collect()
dt = time.time() - t0
assert len(rows) == 4
for r in rows:
    # calibration really is capped
    assert r["n_calib"] == 1000, r
    # sharp large-n coverage: within 2% of the 90% target (and >= it minus
    # the finite-calibration wobble ~ 1/sqrt(1000))
    assert 0.88 <= r["coverage"] <= 0.95, r
    print(f"  k={r['event_type'] if 'event_type' in r else r['k']}: "
          f"pred={r['pred']:.1f} qhat={r['qhat']:.1f} "
          f"coverage={r['coverage']:.4f} (n_test={r['n_test']:,})")
print(f"wall={dt:.1f}s")

print("\nSOAK WINSORIZED+CONFORMAL GREEN")
