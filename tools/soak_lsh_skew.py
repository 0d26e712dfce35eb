"""Round-4 soak (VERDICT r3 #5): MinHash-LSH under adversarial boilerplate
skew — N docs of which ``DUP_FRACTION`` are near-copies of ONE template
(the driver's uniform corpus never stresses the banded join's worst case).

Measures, per ``max_bucket_size`` cap value:
- candidate-pair mass predicted by ``lsh_bucket_stats`` (sum over kept
  buckets of size*(size-1)/2);
- wall time of ``minhash_lsh_pairs`` with that cap.

The assertion: with the cap at the recommended value the pair mass stays
LINEAR in corpus size (<= PAIRS_PER_DOC_BOUND * docs) and the join
completes; uncapped mass is quadratic in the template count.

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_lsh_skew.py [docs] [dup_copies]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.dedup import lsh_bucket_stats, minhash_lsh_pairs
from cerebro_spark.session import get_spark

DOCS_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DUP_COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
PAIRS_PER_DOC_BOUND = 50  # "linear" = at most this many candidates per doc

spark = get_spark("soak-lsh-skew")

# unique-ish docs: 40 tokens from a 4k vocab keyed by doc id; the first
# DUP_COPIES docs instead share one 40-token template with ONE varying
# token (near-dup, not exact-dup — exact dedup would catch identical text)
voc = F.array(*[F.lit(f"w{i}") for i in range(4000)])
template = " ".join(f"t{i}" for i in range(39))
docs = spark.range(DOCS_N).select(
    F.col("id").alias("doc_id"),
    F.when(
        F.col("id") < DUP_COPIES,
        # one UNIQUE trailing token per copy: true near-dups (Jaccard ≈
        # 0.9 pairwise), not exact dups — exact dups are dedup_exact's
        # job and would muddy the bucket-skew signal with legitimate mass
        F.concat(F.lit(template + " v"), F.col("id").cast("string")),
    )
    .otherwise(
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(39)),
                lambda i: F.element_at(
                    voc,
                    (F.pmod(F.col("id") * 131 + i * 7919, F.lit(4000)) + 1).cast(
                        "int"
                    ),
                ),
            ),
            " ",
        )
    )
    .alias("text"),
).persist()
docs.count()

# 1) the diagnostic: bucket histogram → pair mass by cap value
stats = lsh_bucket_stats(docs, n=3, num_hashes=32, bands=8).persist()
hist = sorted(
    (r["bucket_size"], r["n_buckets"], r["candidate_pairs"])
    for r in stats.collect()
)
total_mass = sum(m for _, _, m in hist)
print("\n" + json.dumps({"docs": DOCS_N, "dup_copies": DUP_COPIES,
                  "uncapped_pair_mass": total_mass,
                  "max_bucket_size_seen": hist[-1][0]}))
for cap in (None, 100_000, 10_000, 1_000, 100):
    mass = sum(m for s, _, m in hist if cap is None or s <= cap)
    print(json.dumps({"cap": cap, "pair_mass": mass,
                      "pairs_per_doc": round(mass / DOCS_N, 1)}))

# 2) the join itself at the recommended cap.  The histogram above is
# bimodal: background docs basically never collide (mass ~0 at cap=100)
# while the 50k-template's band sub-buckets span ~10^2..10^4 members —
# the cap must sit BELOW the boilerplate-cluster scale, at the knee the
# histogram exposes.  Here that is 100.
CAP = 100
t0 = time.perf_counter()
n_pairs = minhash_lsh_pairs(
    docs, n=3, num_hashes=32, bands=8, threshold=0.5, max_bucket_size=CAP
).count()
dt = time.perf_counter() - t0
kept_mass = sum(m for s, _, m in hist if s <= CAP)
print("\n" + json.dumps({"cap": CAP, "join_sec": round(dt, 2),
                  "verified_pairs": n_pairs,
                  "kept_pair_mass": kept_mass,
                  "linear_ok": kept_mass <= PAIRS_PER_DOC_BOUND * DOCS_N}))
assert kept_mass <= PAIRS_PER_DOC_BOUND * DOCS_N, (
    f"cap {CAP} leaves superlinear candidate mass {kept_mass}"
)
stats.unpersist()
docs.unpersist()
