"""Round-6 soak: the third-batch graph/linkage operators at graph scale —
`kcore`, `label_propagation`, `neighbor_jaccard`, `cooccurrence_lift`.

What the pytest gates can't show:

* **kcore** — the peel loop's per-round cost is two semi-joins + one
  combinable degree groupBy; rounds stack with checkpoint-cut lineage, so a
  deep cascade must cost ~rounds × one-round, not blow up in Catalyst.  The
  generator plants a long pendant CHAIN off a dense core: every peel round
  removes exactly one chain link, forcing a genuinely deep cascade (the
  adversarial depth case, not the 2-round cascade of real graphs).
* **label_propagation** — each round is an edge⋈label join + two combinable
  groupBys; a power-law hub node receives deg(hub) votes, which must arrive
  as map-side partial counts, not deg(hub) rows into one task.
* **neighbor_jaccard** — wedge volume is Σ deg(neighbor)²: one hub neighbor
  at 200k degree means 2·10¹⁰ wedges naively.  The cap drops the hub BEFORE
  the self-join; asserted by wall time (uncapped would not finish) and by
  the capped pair count staying linear-ish.
* **cooccurrence_lift** — same wedge bound on basket size; one degenerate
  10⁵-item basket is dropped by max_basket_size while the signal baskets
  keep exact support/lift.

All input frames are F.hash-derived (no modular cycling; SCALE_NOTES r5
lesson).  Results -> SCALE_NOTES.md (run manually):

    python tools/soak_graph_linkage.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.cluster import (
    cooccurrence_lift,
    kcore,
    label_propagation,
    neighbor_jaccard,
)
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
spark = get_spark("soak-graph-linkage")


def timed(tag, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{tag}: {dt:.1f}s {out}")
    return dt, out


# ---------------------------------------------------------------------------
# 1. kcore at k=2: interior chain nodes hold degree 2 until their outer
#    neighbor dies, so a pendant chain peels exactly ONE link per round from
#    the free end — a 200-round cascade, ~100× deeper than the organic
#    2-round cascade of the gated query.  (At k=3 the whole chain, all
#    degree ≤2, would vanish in a single round — no depth.)
# ---------------------------------------------------------------------------
CORE_N = int(2_000 * SCALE)         # clique-ish core via random regular edges
CORE_M = int(40_000 * SCALE)
CHAIN = 200

core = spark.range(CORE_M).select(
    F.pmod(F.hash("id", F.lit("a")), F.lit(CORE_N)).alias("src"),
    F.pmod(F.hash("id", F.lit("b")), F.lit(CORE_N)).alias("dst"),
)
chain = spark.range(CHAIN).select(
    (F.lit(CORE_N) + F.col("id")).alias("src"),
    (F.lit(CORE_N) + F.col("id") + 1).alias("dst"),
)
# anchor the chain to core node 0 so it is one component
anchor = spark.range(1).select(F.lit(0).alias("src"), F.lit(CORE_N).alias("dst"))
g = core.union(chain).union(anchor)

dt_kcore, kc_out = timed(
    "kcore k=2, 200-round pendant-chain cascade",
    lambda: (lambda df: {
        "survivors": df.count(),
        "chain_survivors": df.filter(F.col("node") >= CORE_N).count(),
    })(kcore(g, k=2, max_rounds=300)),
)
assert kc_out["chain_survivors"] == 0, "chain must fully cascade out of the 2-core"

# ---------------------------------------------------------------------------
# 2. label_propagation on a power-law-ish graph with one 100k-degree hub
# ---------------------------------------------------------------------------
LPA_M = int(2_000_000 * SCALE)
LPA_N = int(200_000 * SCALE)

lpa_edges = spark.range(LPA_M).select(
    F.pmod(F.hash("id", F.lit("u")), F.lit(LPA_N)).alias("src"),
    F.when(
        F.pmod(F.hash("id", F.lit("skew")), F.lit(20)) == 0,
        F.lit(0),  # 5% of edges hit the hub
    ).otherwise(F.pmod(F.hash("id", F.lit("v")), F.lit(LPA_N))).alias("dst"),
).filter(F.col("src") != F.col("dst"))

dt_lpa, _ = timed(
    f"label_propagation 3 rounds ({LPA_M:,} edges, 5% into one hub)",
    lambda: {
        "communities": label_propagation(lpa_edges, iterations=3)
        .select("label").distinct().count()
    },
)

# ---------------------------------------------------------------------------
# 3. neighbor_jaccard: 200k-degree hub neighbor — capped vs the naive bound
# ---------------------------------------------------------------------------
NJ_ENT = int(200_000 * SCALE)
NJ_ROWS = int(1_000_000 * SCALE)
HUB_DEG = int(200_000 * SCALE)

nj = spark.range(NJ_ROWS).select(
    F.pmod(F.hash("id", F.lit("e")), F.lit(NJ_ENT)).alias("entity"),
    F.pmod(F.hash("id", F.lit("n")), F.lit(500_000)).alias("neighbor"),
).union(
    # the hub: neighbor -1 attached to HUB_DEG distinct entities
    spark.range(HUB_DEG).select(
        F.col("id").alias("entity"), F.lit(-1).alias("neighbor")
    )
)

dt_nj, nj_out = timed(
    f"neighbor_jaccard cap=1000 ({NJ_ROWS:,} adjacency rows + {HUB_DEG:,}-degree hub)",
    lambda: {
        "pairs": neighbor_jaccard(
            nj, min_common=2, max_neighbor_degree=1000
        ).count()
    },
)
naive_wedges = HUB_DEG * (HUB_DEG - 1) // 2
print(f"  (hub alone would contribute {naive_wedges:,} wedges uncapped)")

# ---------------------------------------------------------------------------
# 4. cooccurrence_lift: one 100k-item basket dropped by the cap
# ---------------------------------------------------------------------------
CL_ROWS = int(1_000_000 * SCALE)
GIANT = int(100_000 * SCALE)

cl = spark.range(CL_ROWS).select(
    F.pmod(F.hash("id", F.lit("bk")), F.lit(300_000)).alias("basket"),
    F.pmod(F.hash("id", F.lit("it")), F.lit(50_000)).alias("item"),
).union(
    spark.range(GIANT).select(
        F.lit(-1).alias("basket"), F.col("id").alias("item")
    )
)

dt_cl, _ = timed(
    f"cooccurrence_lift cap=100 ({CL_ROWS:,} basket rows + one {GIANT:,}-item basket)",
    lambda: {"pairs": cooccurrence_lift(cl, min_pair_count=2, max_basket_size=100).count()},
)
print(f"  (giant basket alone would contribute {GIANT * (GIANT - 1) // 2:,} wedges uncapped)")

print(
    f"SOAK OK scale={SCALE}: kcore {dt_kcore:.1f}s, lpa {dt_lpa:.1f}s, "
    f"jaccard {dt_nj:.1f}s, lift {dt_cl:.1f}s"
)
