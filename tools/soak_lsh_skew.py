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

# Corpus: the shared three-population generator (template cluster +
# isolated near-dup probe pairs + hash-random background) — see
# tools/soak_corpus.py for the populations and the round-5 note on why
# the background draw must be hash-based, not modular (the original
# modular formula made every background bucket exceed the cap at 1M docs).
from soak_corpus import boilerplate_corpus, probe_pair_predicate

PAIR_N = 1000
docs = boilerplate_corpus(spark, DOCS_N, DUP_COPIES, PAIR_N).persist()
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
capped = minhash_lsh_pairs(
    docs, n=3, num_hashes=32, bands=8, threshold=0.5, max_bucket_size=CAP
).persist()
n_pairs = capped.count()
dt = time.perf_counter() - t0
kept_mass = sum(m for s, _, m in hist if s <= CAP)

# 3) recall probe: the capped full-corpus join must still find the isolated
# near-dup pairs; ceiling = the uncapped join on the probe subset alone
# (LSH's own band-collision probability, not the cap's doing)
lo, hi = DUP_COPIES, DUP_COPIES + 2 * PAIR_N
probe_pair = probe_pair_predicate(DUP_COPIES, PAIR_N)
probe_found_capped = capped.filter(probe_pair).count()
probe_docs = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
probe_ceiling = (
    minhash_lsh_pairs(probe_docs, n=3, num_hashes=32, bands=8, threshold=0.5)
    .filter(probe_pair)
    .count()
)
print("\n" + json.dumps({"cap": CAP, "join_sec": round(dt, 2),
                  "verified_pairs": n_pairs,
                  "kept_pair_mass": kept_mass,
                  "probe_pairs": PAIR_N,
                  "probe_ceiling_uncapped": probe_ceiling,
                  "probe_found_capped": probe_found_capped,
                  "linear_ok": kept_mass <= PAIRS_PER_DOC_BOUND * DOCS_N}))
assert kept_mass <= PAIRS_PER_DOC_BOUND * DOCS_N, (
    f"cap {CAP} leaves superlinear candidate mass {kept_mass}"
)
assert probe_ceiling > 0 and probe_found_capped >= 0.9 * probe_ceiling, (
    f"cap {CAP} lost small-cluster recall: {probe_found_capped}/{probe_ceiling}"
)
capped.unpersist()
stats.unpersist()
docs.unpersist()
