"""Haversine-join scale soak: millions of rows, a planted hot cell, and
BOTH longitude seams, with a closed-form truth built on wide margins.

Layout (radius 2 km, |lat| <= 66):
- POSITIONS: a lat/lon lattice, rings every 0.2 deg of lat (22.2 km apart)
  x columns every 0.2 deg of lon (>= 9.0 km apart at 66 deg) — far beyond
  2 km, so positions never interact.  LEFT: COPIES rows per position.
  RIGHT per position: one NEAR point +0.009 deg lat (~1.0 km, certain
  pair) and one FAR point +0.054 deg lat (~6.0 km, certain non-pair).
- SEAMS: single-row certain pairs straddling the ANTIMERIDIAN
  (179.995 vs -179.995 — exercises the pmod normalization that makes
  +-180 continuous) and the PRIME MERIDIAN in normalized space
  (-0.005 vs +0.005 — exercises the modular band wraparound, since
  pmod maps the 0/360 seam there).  Seam rings sit 0.1 deg off the
  lattice rings so they cannot interact with it.
- HOT CELL: HOT_L left copies of one isolated point vs HOT_R right
  near-copies 0.5 km away — an uncapped candidate mass of HOT_L x HOT_R.
  With max_cell_size=100 the hot LEFT cell drops pre-join; the hot point
  is isolated, so the drop costs exactly its own pairs and the closed
  form is untouched.

Every pair/non-pair decision has a >=2x distance margin, so engine ulp
noise cannot move the count: expected = P*COPIES + K_AM + K_PM exactly.

    python tools/soak_haversine.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.joins import haversine_grid_join
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
# The lattice geometry is BOUNDED by the |lat| <= 66 window and the
# 0.2-deg spacing (650 rings x 1800 columns fills it); scale <= 1 shrinks
# the lattice, scale > 1 multiplies the per-position COPIES and the hot
# sizes instead — rows keep growing without rings/columns ever leaving
# the window (latitudes past 66 would be excluded by the join and
# longitudes past 180 would alias onto column 0, breaking the closed form).
_g = min(SCALE, 1.0)
RINGS = max(50, int(650 * _g ** 0.5))   # lat rings, 0.2 deg apart
COLS = max(100, int(1800 * _g ** 0.5))  # lon columns, 0.2 deg apart
COPIES = max(5, int(5 * SCALE))
K_SEAM = 600                                # rows per seam band
HOT_L = int(1_000_000 * SCALE)
HOT_R = int(200_000 * SCALE)

P = RINGS * COLS
spark = get_spark("soak-haversine", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

print(
    f"{RINGS} rings x {COLS} cols = {P:,} positions, {COPIES} copies "
    f"= {P * COPIES:,} lattice left; {2 * P:,} lattice right; "
    f"hot cell {HOT_L:,} x {HOT_R:,} "
    f"(uncapped candidate mass {HOT_L * HOT_R:,})",
    flush=True,
)

lat0, lon0 = -64.9, -179.9
pos_lat = lat0 + ((F.col("id") / COPIES).cast("long") % RINGS).cast("double") * 0.2
pos_lon = lon0 + (
    (F.col("id") / COPIES).cast("long") / RINGS
).cast("long").cast("double") * 0.2

left = spark.range(P * COPIES).select(
    F.col("id").alias("l_id"), pos_lat.alias("lat"), pos_lon.alias("lon")
)
r_lat = lat0 + (F.col("id") % RINGS).cast("double") * 0.2
r_lon = lon0 + (F.col("id") / RINGS).cast("long").cast("double") * 0.2
near = spark.range(P).select(
    F.col("id").alias("r_id"), (r_lat + 0.009).alias("lat"), r_lon.alias("lon")
)
far = spark.range(P).select(
    (F.col("id") + 10**9).alias("r_id"),
    (r_lat + 0.054).alias("lat"),
    r_lon.alias("lon"),
)

# seam bands: lat rings at 0.1-deg offsets from the lattice, certain pairs
seam_lat = (F.col("id").cast("double") * 0.2 - 60.0) + 0.1
am_l = spark.range(K_SEAM).select(
    (F.col("id") + 2 * 10**9).alias("l_id"),
    seam_lat.alias("lat"),
    F.lit(179.995).alias("lon"),
)
am_r = spark.range(K_SEAM).select(
    (F.col("id") + 2 * 10**9).alias("r_id"),
    seam_lat.alias("lat"),
    F.lit(-179.995).alias("lon"),
)
pm_l = spark.range(K_SEAM).select(
    (F.col("id") + 3 * 10**9).alias("l_id"),
    seam_lat.alias("lat"),
    F.lit(-0.005).alias("lon"),
)
pm_r = spark.range(K_SEAM).select(
    (F.col("id") + 3 * 10**9).alias("r_id"),
    seam_lat.alias("lat"),
    F.lit(0.005).alias("lon"),
)

# hot cell: isolated point 0.1 deg off every lattice ring/column
hot_l = spark.range(HOT_L).select(
    (F.col("id") + 4 * 10**9).alias("l_id"),
    F.lit(10.05).alias("lat"),
    F.lit(10.05).alias("lon"),
)
hot_r = spark.range(HOT_R).select(
    (F.col("id") + 4 * 10**9).alias("r_id"),
    F.lit(10.0545).alias("lat"),  # ~0.5 km north
    F.lit(10.05).alias("lon"),
)

big_left = left.unionByName(am_l).unionByName(pm_l).unionByName(hot_l)
big_right = (
    near.unionByName(far)
    .unionByName(am_r)
    .unionByName(pm_r)
    .unionByName(hot_r)
)

t0 = time.time()
n = haversine_grid_join(
    big_left, big_right, "lat", "lon", radius_km=2.0, max_cell_size=100
).count()
t = time.time() - t0

expected = P * COPIES + 2 * K_SEAM
assert n == expected, (n, expected)
print(
    f"{t:.1f}s; capped join = {n:,} pairs == closed form "
    f"({P:,} positions x {COPIES} copies + {K_SEAM} antimeridian "
    f"+ {K_SEAM} prime-meridian seam pairs); the far band contributed 0 "
    f"false positives and the cap pre-dropped a {HOT_L:,}-row cell that "
    f"would have generated {HOT_L * HOT_R:,} candidate pairs",
    flush=True,
)

print("\nSOAK GREEN", flush=True)
