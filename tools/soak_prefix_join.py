"""Round-6 soak: `prefix_jaccard_pairs` at adversarial scale.

The claim to prove (operator docstring): prefix filtering stays cheap
exactly where the full inverted-index join blows up — UNIVERSAL tokens.
Every doc in this corpus shares one stopword-ish token; a full
inverted-index join (ngram-style, every token indexed) would enumerate
~n²/2 candidate pairs from that single posting list (~1.3·10⁹ pairs at
n=50k — a job that effectively never finishes locally), while prefix
filtering never indexes it: the stopword has maximal df, so it sorts
LAST in every doc's rarity order and no prefix is long enough to reach
it (docs here have ≥8 tokens; at t=0.8 the prefix is ⌈0.2·|d|⌉ ≈ 2-3
rare tokens).

Corpus: 50k docs over a 200k-token vocab, planted near-dup pairs (doc
2k+1 = doc 2k with one token changed → J = 9/11 ≈ 0.818 at 10 shared of
11-token union), every doc carrying the universal token 'the'.  With the
stopword the planted pairs hold J = 10/12 ≈ 0.833.

All id-derived content uses F.hash (no modular cycling; SCALE_NOTES r5
lesson).  Results -> SCALE_NOTES.md (run manually):

    python tools/soak_prefix_join.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.dedup import prefix_jaccard_pairs
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N_DOCS = int(50_000 * SCALE)

spark = get_spark("soak-prefix-join")

# Even ids: 10 hash-derived tokens + 'the'.  Odd ids: same tokens as id-1
# except slot 0 is replaced -> planted near-dup pair (J = 10/12 with the
# stopword).  Token space 200k: background collisions exist but rarely
# reach J >= 0.8.
base = spark.range(N_DOCS).select(
    F.col("id").alias("doc_id"),
    (F.col("id") - F.pmod(F.col("id"), F.lit(2))).alias("pair_base"),
    F.pmod(F.col("id"), F.lit(2)).alias("is_variant"),
)
tokens = base.select(
    "doc_id",
    F.concat_ws(
        " ",
        F.lit("the"),
        *[
            F.concat(
                F.lit("w"),
                F.pmod(
                    F.hash(
                        F.when(
                            (F.lit(k) == 0) & (F.col("is_variant") == 1),
                            F.col("doc_id") * 1_000_003,  # variant slot
                        ).otherwise(F.col("pair_base")),
                        F.lit(k),
                    ),
                    F.lit(200_000),
                ),
            )
            for k in range(10)
        ],
    ).alias("text"),
)
docs = tokens.localCheckpoint(eager=True)
print(f"prefix soak: {docs.count():,} docs, universal token 'the' in all")

t0 = time.time()
pairs = prefix_jaccard_pairs(docs, "text", "doc_id", threshold=0.8)
planted = pairs.filter(
    (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_a") % 2 == 0)
).count()
total = pairs.count()
dt = time.time() - t0
print(f"prefix join: {dt:.1f}s, {total:,} pairs >= 0.8, planted found "
      f"{planted:,}/{N_DOCS // 2:,}")

# every planted pair must be found (exactness), runtime must stay in the
# tens of seconds (the full-index join's stopword posting alone would be
# ~1.2e9 candidate pairs)
assert planted == N_DOCS // 2, "prefix filter dropped a planted pair"
assert dt < 300, f"prefix join too slow: {dt:.1f}s"
print("SOAK GREEN")
