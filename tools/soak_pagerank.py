"""Round-6 soak: `cluster.pagerank` at graph scale — skewed-degree edges,
deep iteration, lineage control.

What the pytest gates can't show: (a) the per-iteration join+agg loop holds
its wall time as iterations stack (checkpoint_every cuts lineage — without
it Catalyst re-analyzes a plan that doubles per iteration), (b) hub skew
(power-law in-degree — the shape of any real trade/link graph) doesn't
produce a straggler, because the contribution aggregate partial-combines
map-side BEFORE the shuffle, so a 500k-in-edge hub arrives as ~32 partial
sums, not 500k rows to one task, and (c) quantized mass stays conserved at
node counts where per-node quantization error could accumulate.

Graph: M edges over N nodes; 10% of edges point at one of 100 hub nodes
(heavy in-degree skew), the rest uniform — all `F.hash`-derived (no modular
cycling; SCALE_NOTES r5 lesson).  Symmetrized, like the gated query, so no
dangling mass.

Asserted expectations:
  * total rank mass == 1 within N * quantum/2 (the only error source is the
    per-iteration quantization);
  * hub nodes outrank the uniform population (skew actually exercised);
  * 10 iterations cost < 3.5x of 3 iterations (super-linear growth = the
    lineage/Catalyst trap; 10/3 ≈ 3.3 is the linear ratio).

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_pagerank.py [edges] [nodes]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.cluster import pagerank
from cerebro_spark.session import get_spark

EDGES = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
NODES = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
HUBS = 100
QUANTUM = 1e-9

spark = get_spark("soak-pagerank")


def build_edges():
    e = spark.range(EDGES).select(
        F.pmod(F.hash("id", F.lit("s")), F.lit(NODES)).alias("src"),
        F.when(
            F.pmod(F.hash("id", F.lit("skew")), F.lit(10)) == 0,
            F.pmod(F.hash("id", F.lit("hub")), F.lit(HUBS)),
        )
        .otherwise(F.pmod(F.hash("id", F.lit("d")), F.lit(NODES)))
        .alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    return e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def run(iters: int) -> tuple[float, dict]:
    edges = build_edges()
    t0 = time.perf_counter()
    ranks = pagerank(
        edges, iterations=iters, quantum=QUANTUM, checkpoint_every=4
    )
    stats = ranks.agg(
        F.sum("rank").alias("mass"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("node") < HUBS, F.col("rank"))).alias("hub_mass"),
        F.max(F.when(F.col("node") >= HUBS, F.col("rank"))).alias("max_nonhub"),
        F.min(F.when(F.col("node") < HUBS, F.col("rank"))).alias("min_hub"),
    ).first()
    wall = time.perf_counter() - t0
    spark.catalog.clearCache()
    return wall, stats


t3, s3 = run(3)
t10, s10 = run(10)

n = s10["n"]
mass_tol = n * QUANTUM / 2 + 1e-6
print(f"edges={EDGES} nodes~{n} hubs={HUBS}")
print(f"3 iters : {t3:7.2f}s  mass={s3['mass']:.9f}")
print(
    f"10 iters: {t10:7.2f}s  mass={s10['mass']:.9f}  "
    f"hub_mass={s10['hub_mass']:.4f}  "
    f"min_hub={s10['min_hub']:.3e}  max_nonhub={s10['max_nonhub']:.3e}"
)
print(f"iter-scaling ratio t10/t3 = {t10 / t3:.2f} (linear ≈ 3.3)")

assert abs(s10["mass"] - 1.0) < mass_tol, f"mass leaked: {s10['mass']}"
assert abs(s3["mass"] - 1.0) < mass_tol, f"mass leaked: {s3['mass']}"
# every hub outranks every non-hub: ~10% of edge mass lands on 100 nodes
assert s10["min_hub"] > s10["max_nonhub"], "hub skew not reflected in ranks"
assert t10 < 3.5 * t3, (
    f"super-linear iteration cost ({t10:.1f}s vs {t3:.1f}s) — lineage trap?"
)
print("SOAK GREEN")
