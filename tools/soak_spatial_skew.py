"""Spatial-join skew soak: the hot-cell hazard and its cap, with a
PLANTED closed-form truth.

Layout (radius 1.0, so cells are unit squares):
- LEFT: 5 copies of every integer lattice point on a 1000x1000 grid
  (5M rows, exactly 5 per cell) + 1M copies of ONE hot point — a
  degenerate venue/POI that would dominate the join.
- RIGHT: one point at every cell center (x+.5, y+.5) (1M rows) + 200k
  near-copies of the hot point.

Each center point is within r of EXACTLY the 4 surrounding lattice
points (distance sqrt(0.5)), so the uniform pair count is closed form:
interior centers pair with 4 lattice cells x 5 copies; border centers
with fewer.  Uncapped, the hot cell alone would contribute
1.2M x 200k = 2.4e11 candidate pairs — hours of work for zero signal.
With max_cell_size=100 the hot LEFT cell drops pre-join and the total
equals the closed form minus the 4 center points that paired into the
hot cell's legit lattice copies.

    python tools/soak_spatial_skew.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.joins import spatial_grid_join
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
G = max(100, int(1000 * SCALE ** 0.5))  # grid side
COPIES = 5
HOT_L = int(1_000_000 * SCALE)
HOT_R = int(200_000 * SCALE)

spark = get_spark("soak-spatial-skew", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")

print(f"grid {G}x{G}, {COPIES} copies/cell = {G*G*COPIES:,} lattice left; "
      f"hot cell: {HOT_L:,} left x {HOT_R:,} right "
      f"(uncapped candidate mass {(G*G//1000000 and 0) or HOT_L * HOT_R:,})",
      flush=True)

lattice = spark.range(G * G * COPIES).select(
    F.col("id").alias("l_id"),
    ((F.col("id") / COPIES).cast("long") % G).cast("double").alias("x"),
    ((F.col("id") / COPIES).cast("long") / G).cast("long").cast("double").alias("y"),
)
hot_l = spark.range(HOT_L).select(
    (F.col("id") + 10 ** 10).alias("l_id"),
    (F.lit(G / 2) + 0.2).alias("x"),
    (F.lit(G / 2) + 0.2).alias("y"),
)
left = lattice.unionByName(hot_l)

centers = spark.range(G * G).select(
    F.col("id").alias("r_id"),
    ((F.col("id") % G).cast("double") + 0.5).alias("x"),
    ((F.col("id") / G).cast("long").cast("double") + 0.5).alias("y"),
)
hot_r = spark.range(HOT_R).select(
    (F.col("id") + 2 * 10 ** 10).alias("r_id"),
    (F.lit(G / 2) + 0.21).alias("x"),
    (F.lit(G / 2) + 0.21).alias("y"),
)
right = centers.unionByName(hot_r)

t0 = time.time()
n = spatial_grid_join(left, right, "x", "y", 1.0, max_cell_size=100).count()
t = time.time() - t0

# closed form: center (cx, cy) pairs with lattice points (cx..cx+1, cy..cy+1)
# that exist on the grid: 4 interior, fewer on the top/right border.
# centers at cx in 0..G-1: lattice x in {cx, cx+1}, valid iff <= G-1.
full = (G - 1) * (G - 1) * 4          # interior centers: 4 lattice pts
edge = 2 * (G - 1) * 2                # top row + right col (excl corner): 2
corner = 1                            # (G-1, G-1): 1 lattice pt
expected_uniform = (full + edge + corner) * COPIES
# the hot LEFT cell (G/2, G/2) is dropped by the cap: the 4 centers that
# paired with lattice point (G/2, G/2) ... a lattice point is IN cell
# (G/2, G/2); centers pairing with it: (G/2-1..G/2 +-.5) -> 4 centers, but
# the CAP drops the whole left cell = its 5 lattice copies AND the hot rows;
# pairs lost = 4 centers x 5 copies (hot-right points also lose all pairs).
lost = 4 * COPIES
# the hot RIGHT points still pair with the SURVIVING neighbor lattice
# cells: from (c+0.21, c+0.21) the lattice points (c+1, c) and (c, c+1)
# are at d^2 = 0.79^2 + 0.21^2 = 0.668 < 1 (and (c+1, c+1) at 1.248 is
# out) -> 2 lattice points x COPIES per hot right row
hot_pairs = HOT_R * 2 * COPIES
expected = expected_uniform - lost + hot_pairs
assert n == expected, (n, expected)
print(f"{t:.1f}s; capped join = {n:,} pairs == closed form "
      f"(uniform {expected_uniform:,} − {lost} hot-cell legit pairs "
      f"+ {hot_pairs:,} hot-right x surviving-neighbor pairs); "
      f"the cap pre-dropped a {HOT_L:,}-row cell that would have generated "
      f"{HOT_L * HOT_R:,} candidate pairs", flush=True)

print("\nSOAK GREEN", flush=True)
