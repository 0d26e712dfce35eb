"""Round-6 soak: `cluster.triangle_participation` hub-skew behavior.

The operator's entire pitch is the degree-ordered orientation: the naive
node-iterator builds Σ deg² wedges, so ONE hub with in-degree h costs h²/2
wedges (a 200k-spoke hub ⇒ 2·10¹⁰ wedge rows — a job that never finishes
locally).  Compact-forward orients every edge toward the (degree,node)-
larger endpoint, so the hub — having the maximum degree — gets out-degree
~0 and contributes ~0 wedges; wedge volume is bounded by O(m^1.5)
regardless of skew.

Graph: a star hub with SPOKES spokes (massive skew, zero triangles from
the hub itself because spokes are mutually unconnected) + RINGS planted
triangles among distinct low-degree nodes (ground truth).  The naive
Σ deg² wedge count is ~SPOKES²/2 ≈ 2e10 at the default size; the soak
asserts the operator finishes in seconds and returns exactly the planted
counts — which it can only do if the orientation actually killed the hub
wedges.

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_triangles.py [spokes] [rings]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.cluster import triangle_participation
from cerebro_spark.session import get_spark

SPOKES = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
RINGS = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000

spark = get_spark("soak-triangles")

HUB = 0
# spokes: 1..SPOKES all attached to the hub
star = spark.range(1, SPOKES + 1).select(
    F.lit(HUB).alias("src"), F.col("id").alias("dst")
)
# planted triangles on fresh node ids above the spoke range: nodes
# (base, base+1, base+2) per ring, all disjoint -> each node in EXACTLY 1
base = F.lit(SPOKES + 1) + F.col("id") * 3
tri_edges = spark.range(RINGS).select(base.alias("a")).selectExpr(
    "stack(3, a, a + 1, a + 1, a + 2, a, a + 2) AS (src, dst)"
)
edges = star.union(tri_edges)

t0 = time.perf_counter()
counts = triangle_participation(edges).cache()
n_nodes = counts.count()
wall = time.perf_counter() - t0
per_node = counts.agg(
    F.min("triangles"), F.max("triangles"), F.sum("triangles")
).first()

naive_wedges = SPOKES * (SPOKES - 1) // 2
print(
    f"spokes={SPOKES} rings={RINGS}: {wall:.2f}s, "
    f"{n_nodes} triangle nodes, per-node min/max={per_node[0]}/{per_node[1]}, "
    f"naive hub wedges avoided ≈ {naive_wedges:.2e}"
)
assert n_nodes == 3 * RINGS
assert per_node[0] == 1 and per_node[1] == 1 and per_node[2] == 3 * RINGS
assert wall < 120, f"hub wedges not suppressed? {wall:.1f}s"
print("SOAK GREEN")
