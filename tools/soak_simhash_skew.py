"""Round-5 soak (VERDICT r4 #5): simhash_pairs under adversarial boilerplate
skew — the pigeonhole (block, segment) buckets have the same
template-cluster failure mode as the LSH band buckets, and the
``max_bucket_size`` cap was added symmetrically in round 4 but never
measured.  Same corpus shape as ``soak_lsh_skew.py``: N docs of which
``DUP_COPIES`` are near-copies of ONE template (one varying token), so
the template cluster's near-identical fingerprints pile k members into
each of its ``blocks`` buckets → k²/2 candidate pairs per bucket.

Measures, per cap value:
- candidate-pair mass predicted by ``simhash_bucket_stats`` (sum over
  kept buckets of size*(size-1)/2);
- wall time of ``simhash_pairs`` at the recommended cap.

The assertions: (a) the cap removes essentially ALL template mass — kept
mass <= 2× the birthday-background theory ``blocks·N²/2^(width+1)``; (b)
the capped join still finds >= 90% of the isolated near-dup pairs the
uncapped join would find (small-cluster recall preserved).

TWO KEY FINDINGS (first 1M-doc runs):

1. The cap cannot save an under-sized segment width.  At the default
   bits=48/blocks=4, a 12-bit segment gives 4096 buckets per block, so 1M
   docs average ~244 members per bucket from random birthday collisions
   alone — the MINIMUM bucket exceeds cap=100 and the capped join returns
   ZERO pairs (recall destroyed, not protected).  Width rule:
   ``2^width >= N / target_avg_bucket`` → width >= ~15 at 1M →
   ``bits=60, blocks=4``.
2. Even at the right width, simhash-pigeonhole background candidate mass
   is ``blocks·N²/2^(width+1)`` — QUADRATIC in N at fixed width (~67
   candidates/doc at 1M docs, width 15).  Since ``bits <= 60`` (signed
   long), the per-doc mass doubles with every corpus doubling past ~1M.
   The operator's documented applicability bound is ~1-2M docs per run
   (e.g. per dump/shard); beyond that use ``minhash_lsh_pairs`` (band
   width grows with num_hashes, unbounded) or Manku-style sorted-prefix
   tables over a >64-bit fingerprint.

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_simhash_skew.py [docs] [dup_copies] [bits]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.dedup import simhash_bucket_stats, simhash_pairs
from cerebro_spark.session import get_spark

DOCS_N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
DUP_COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
BITS = int(sys.argv[3]) if len(sys.argv) > 3 else 48
BLOCKS = 4
WIDTH = BITS // BLOCKS
# birthday-background candidate mass with uniform fingerprints: each of the
# BLOCKS segment tables holds N docs in 2^WIDTH buckets → Σ size²/2 ≈
# N²/2^(WIDTH+1) pairs per table.  The cap is doing its job if the kept
# mass is at most ~2× this floor (i.e. the template cluster's quadratic
# mass is gone and only honest background collisions remain).
BG_THEORY = BLOCKS * DOCS_N * DOCS_N // (2 ** (WIDTH + 1))

spark = get_spark("soak-simhash-skew")

# Corpus: the shared three-population generator (template cluster +
# isolated near-dup probe pairs + hash-random background) — see
# tools/soak_corpus.py for the populations and the round-5 note on why
# the background draw must be hash-based, not modular.
from soak_corpus import boilerplate_corpus, probe_pair_predicate

PAIR_N = 1000
docs = boilerplate_corpus(spark, DOCS_N, DUP_COPIES, PAIR_N).persist()
docs.count()

# 1) the diagnostic: bucket histogram → pair mass by cap value
stats = simhash_bucket_stats(docs, bits=BITS, blocks=4).persist()
hist = sorted(
    (r["bucket_size"], r["n_buckets"], r["candidate_pairs"])
    for r in stats.collect()
)
total_mass = sum(m for _, _, m in hist)
print("\n" + json.dumps({"docs": DOCS_N, "dup_copies": DUP_COPIES, "bits": BITS,
                  "uncapped_pair_mass": total_mass,
                  "max_bucket_size_seen": hist[-1][0]}))
for cap in (None, 100_000, 10_000, 1_000, 100):
    mass = sum(m for s, _, m in hist if cap is None or s <= cap)
    print(json.dumps({"cap": cap, "pair_mass": mass,
                      "pairs_per_doc": round(mass / DOCS_N, 1)}))

# 2) the join itself at the recommended cap (same knee logic as LSH: the
# histogram is bimodal — background segments collide only by chance while
# the template cluster's buckets hold ~DUP_COPIES members; the cap must sit
# below the boilerplate-cluster scale)
CAP = 100
t0 = time.perf_counter()
capped = simhash_pairs(
    docs, max_hamming=3, bits=BITS, blocks=4, max_bucket_size=CAP
).persist()
n_pairs = capped.count()
dt = time.perf_counter() - t0
kept_mass = sum(m for s, _, m in hist if s <= CAP)

# 3) recall probe: of the PAIR_N isolated near-dup pairs, how many does the
# CAPPED full-corpus join still find, vs how many the uncapped join finds
# on the probe subset alone (the intrinsic simhash ceiling — a one-token
# edit can flip > max_hamming bits, and that loss is NOT the cap's fault)?
lo, hi = DUP_COPIES, DUP_COPIES + 2 * PAIR_N
probe_pair = probe_pair_predicate(DUP_COPIES, PAIR_N)
probe_found_capped = capped.filter(probe_pair).count()
probe_docs = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
probe_ceiling = (
    simhash_pairs(probe_docs, max_hamming=3, bits=BITS, blocks=4)
    .filter(probe_pair)
    .count()
)
print("\n" + json.dumps({"cap": CAP, "join_sec": round(dt, 2),
                  "verified_pairs": n_pairs,
                  "kept_pair_mass": kept_mass,
                  "bg_theory_mass": BG_THEORY,
                  "probe_pairs": PAIR_N,
                  "probe_ceiling_uncapped": probe_ceiling,
                  "probe_found_capped": probe_found_capped,
                  "template_mass_gone": kept_mass <= 2 * BG_THEORY}))
assert kept_mass <= 2 * BG_THEORY, (
    f"cap {CAP} kept {kept_mass} candidate pairs but the birthday "
    f"background floor is only {BG_THEORY} — template mass survived the cap"
)
assert probe_ceiling > 0 and probe_found_capped >= 0.9 * probe_ceiling, (
    f"cap {CAP} lost small-cluster recall: {probe_found_capped}/{probe_ceiling}"
)
capped.unpersist()
stats.unpersist()
docs.unpersist()
