"""Round-8 soak: `dedup.decontaminate` (asymmetric prefix cross-join) at
adversarial scale.

The claims to prove (operator docstrings):

1. **No false negatives, no noise**: every planted train×eval near-dup is
   flagged, and NOTHING else is (token space 200k, J ≥ 0.8 needs 10-of-12
   shared tokens — background collisions are essentially impossible).
2. **The stopword stays out of the prefixes**: every doc on BOTH sides
   carries a universal token 'the'; the full inverted-index cross join
   would enumerate |train|·|eval| ≈ 4·10⁸ candidates from that single
   posting list alone, while the rarity order sorts it LAST so no prefix
   reaches it.
3. **Asymmetry**: candidates are train×eval ONLY — the unioned self-join
   alternative would also pay for every train×train near-collision.

Corpus: TRAIN_N train docs of 10 hash-derived tokens + 'the' (all
distinct); EVAL_N eval docs of which PLANTED_N are one-token variants of
train doc ``e·stride`` (J = 10/12 ≈ 0.833) and the rest draw from a
disjoint hash stream.  All id-derived content uses F.hash (no modular
cycling; SCALE_NOTES r5 lesson).  Results -> SCALE_NOTES.md (run
manually):

    python tools/soak_decontaminate.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.dedup import decontaminate
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
TRAIN_N = int(200_000 * SCALE)
EVAL_N = 2_000
PLANTED_N = 1_000
STRIDE = TRAIN_N // PLANTED_N

spark = get_spark("soak-decontaminate")


def hash_tokens(seed_col, variant_slot0=None):
    cols = []
    for k in range(10):
        seed = seed_col
        if k == 0 and variant_slot0 is not None:
            seed = variant_slot0
        cols.append(
            F.concat(
                F.lit("w"),
                F.pmod(F.hash(seed, F.lit(k)), F.lit(200_000)),
            )
        )
    return F.concat_ws(" ", F.lit("the"), *cols)


train = spark.range(TRAIN_N).select(
    F.col("id").alias("doc_id"), hash_tokens(F.col("id")).alias("text")
).localCheckpoint(eager=True)

e = F.col("id")
planted_base = e * STRIDE  # the train doc this eval doc near-duplicates
eval_df = spark.range(EVAL_N).select(
    e.alias("doc_id"),
    F.when(
        e < PLANTED_N,
        hash_tokens(planted_base, variant_slot0=e * 1_000_003 + 7),
    )
    .otherwise(hash_tokens(e + F.lit(7_000_000_000)))
    .alias("text"),
).localCheckpoint(eager=True)

print(
    f"decontaminate soak: {train.count():,} train x {eval_df.count():,} "
    f"eval, {PLANTED_N:,} planted near-dups (J=10/12), universal 'the'"
)

t0 = time.time()
flagged = decontaminate(train, eval_df, "text", "doc_id", threshold=0.8)
rows = flagged.collect()
dt = time.time() - t0

got = {r["doc_id"]: r["first_eval_id"] for r in rows}
want = {e * STRIDE: e for e in range(PLANTED_N)}
extra = {k for k in got if k not in want}
missing = {k for k in want if k not in got}
wrong_eval = {k for k in want if k in got and got[k] != want[k]}
print(
    f"decontaminate: {dt:.1f}s, {len(got):,} flagged "
    f"(missing {len(missing)}, extra {len(extra)}, "
    f"wrong-eval {len(wrong_eval)})"
)

assert not missing, f"false negatives: {sorted(missing)[:5]}"
assert not extra, f"noise flags: {sorted(extra)[:5]}"
assert not wrong_eval, f"wrong eval attribution: {sorted(wrong_eval)[:5]}"
assert dt < 300, f"decontaminate too slow: {dt:.1f}s"
print("SOAK GREEN")
