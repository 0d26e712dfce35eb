"""Connected-components scale soak.

Two adversarial graph shapes at ~1M edges each:
- ``clusters``: 100k clusters of size 10 (the realistic near-dup shape) —
  verifies round count stays at the fixed-point minimum and wall time is
  shuffle-bound, not round-bound.
- ``chain``: one path of 1M nodes (diameter 10⁶) — the shape where naive
  neighbor propagation needs 10⁶ rounds; the star contraction must finish
  in O(log n) ≈ 20.

Usage: python tools/soak_cc.py [edges_per_shape]
Results → SCALE_NOTES.md (run manually).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators import cluster
from cerebro_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000

spark = get_spark("soak-cc")


def run(name, edges, expect_components):
    rounds = 0
    orig = cluster._star_round

    def counting(e):
        nonlocal rounds
        rounds += 1
        return orig(e)

    cluster._star_round = counting
    try:
        t0 = time.perf_counter()
        comp = cluster.connected_components(edges, max_iter=40)
        n_comp = comp.select("component").distinct().count()
        n_nodes = comp.count()
        dt = time.perf_counter() - t0
    finally:
        cluster._star_round = orig
    print(
        json.dumps(
            {
                "graph": name,
                "edges": edges.count(),
                "nodes": n_nodes,
                "components": n_comp,
                "expected": expect_components,
                "rounds": rounds,
                "sec": round(dt, 2),
            }
        )
    )
    assert n_comp == expect_components, (n_comp, expect_components)


# 100k clusters × size 10: star edges (hub = id*10, spokes = id*10+1..9)
clusters = spark.range(N).select(
    ((F.col("id") / 9).cast("long") * 10).alias("id_a"),
    ((F.col("id") / 9).cast("long") * 10 + (F.col("id") % 9) + 1).alias("id_b"),
).filter(F.col("id_a") < (N // 9) * 10)
run("clusters", clusters, clusters.select("id_a").distinct().count())

# one chain of N+1 nodes
chain = spark.range(N).select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
run("chain", chain, 1)
