"""Round-6 soak: the fourth-batch graph operators at graph scale —
`hits` and `bounded_reach`.

What the pytest gates can't show:

* **hits** — each half-iteration is one edge⋈score join + one combinable
  BIGINT-sum groupBy + a 1-row total broadcast; a power-law authority hub
  receives deg(hub) contributions, which must arrive as map-side integer
  partials, not deg(hub) rows into one task.  The eager checkpoint per
  half-iteration must keep per-iteration cost FLAT over many iterations
  (the lineage-blowup failure mode the sf0.1 bench caught at 2 iterations
  would be catastrophic at 8).
* **bounded_reach** — frontier expansion must be FRONTIER-sized, not
  visited-sized: a star-burst graph where hop 2 reaches millions of nodes
  exercises the distinct+anti-join at full width, while hops 3+ on an
  exhausted component must cost ~nothing (empty frontier short-circuit is
  the at-scale win: a naive visited-re-expansion would re-join millions of
  settled nodes against the edge list every remaining hop).

All input frames are F.hash-derived (no modular cycling; SCALE_NOTES r5
lesson).  Results -> SCALE_NOTES.md (run manually):

    python tools/soak_hits_reach.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.cluster import bounded_reach, hits
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
spark = get_spark("soak-hits-reach")


def timed(tag, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{tag}: {dt:.1f}s {out}")
    return dt, out


# ---------------------------------------------------------------------------
# 1. HITS on a power-law bipartite graph: 5M edges, one authority hub cited
#    by ~1M distinct hubs (its integer contributions must combine map-side),
#    8 iterations (4x the query's depth) to prove per-iteration cost stays
#    flat under the checkpoint-per-half-iteration policy.
# ---------------------------------------------------------------------------
N_EDGES = int(5_000_000 * SCALE)

edges = (
    spark.range(N_EDGES)
    .select(
        F.concat(F.lit("h"), F.pmod(F.hash(F.col("id")), F.lit(1_000_000))).alias(
            "src"
        ),
        F.when(
            F.pmod(F.hash(F.col("id"), F.lit(1)), F.lit(5)) == 0,
            F.lit("a_hub"),  # ~20% of edges cite one authority hub
        )
        .otherwise(
            F.concat(
                F.lit("a"), F.pmod(F.hash(F.col("id"), F.lit(2)), F.lit(200_000))
            )
        )
        .alias("dst"),
    )
    .distinct()
)
edges = edges.localCheckpoint(eager=True)
m = edges.count()
print(f"hits soak: {m:,} distinct edges, authority hub in-degree "
      f"{edges.filter(F.col('dst') == 'a_hub').count():,}")


def run_hits(iters):
    auths, hubs = hits(edges, iterations=iters, assume_distinct=True)
    top = auths.orderBy(F.col("authority").desc(), "node").limit(3).collect()
    mass = auths.agg(F.sum("authority")).first()[0]
    return {"top": [(r["node"], r["authority"]) for r in top], "l1_mass": mass}


dt2, out2 = timed("hits 2 iters", lambda: run_hits(2))
dt8, out8 = timed("hits 8 iters", lambda: run_hits(8))
assert out8["top"][0][0] == "a_hub", "hub must dominate authority"
assert abs(out8["l1_mass"] - 1_000_000_000) < 1_000_000, "L1 mass conserved"
# flat per-iteration cost: 8 iters must cost < ~6x the 2-iter run (per-iter
# cost flat => ratio ~4; lineage blowup => exponential)
assert dt8 < dt2 * 6, f"per-iteration cost not flat: {dt2:.1f}s -> {dt8:.1f}s"

# ---------------------------------------------------------------------------
# 2. bounded_reach star-burst: seed -> 1k gateways -> ~3M leaves (hop 2),
#    hop 3 finds nothing new.  The empty/settled tail must cost ~nothing
#    relative to the wide hop.
# ---------------------------------------------------------------------------
N_LEAVES = int(3_000_000 * SCALE)

gw = spark.range(1_000).select(
    F.lit("seed").alias("src"),
    F.concat(F.lit("g"), F.col("id")).alias("dst"),
)
leaves = spark.range(N_LEAVES).select(
    F.concat(F.lit("g"), F.pmod(F.hash(F.col("id")), F.lit(1_000))).alias("src"),
    F.concat(F.lit("l"), F.col("id")).alias("dst"),
)
burst = gw.union(leaves).localCheckpoint(eager=True)
print(f"reach soak: {burst.count():,} edges")


def run_reach(hops):
    got = bounded_reach(burst, ["seed"], max_hops=hops)
    return {r["dist"]: r["n"] for r in
            got.groupBy("dist").agg(F.count(F.lit(1)).alias("n")).collect()}


dt3, hist3 = timed("reach 3 hops", lambda: run_reach(3))
assert hist3[0] == 1 and hist3[1] == 1_000 and hist3[2] == N_LEAVES
assert 3 not in hist3  # exhausted at hop 2
dt6, hist6 = timed("reach 6 hops", lambda: run_reach(6))
assert hist6 == hist3
# hops 4-6 run on an EMPTY frontier: the exhausted tail must be cheap
assert dt6 < dt3 * 2.0, f"empty-frontier hops not cheap: {dt3:.1f}s -> {dt6:.1f}s"

print("SOAK GREEN")
