"""Shared adversarial corpus for the near-dup skew soaks
(`soak_lsh_skew.py`, `soak_simhash_skew.py`) — ONE generator so the two
soaks always measure the same corpus (the round-4 modular-arithmetic bug
had to be fixed in lock-step in both copies; never again).

Three populations over ``docs_n`` rows:

- ids ``[0, dup_copies)``: near-copies of ONE 39-token template plus a
  unique trailing token — the boilerplate cluster the bucket cap must
  drop (true near-dups, not exact dups: exact dups are ``dedup_exact``'s
  job and would muddy the skew signal with legitimate mass).
- ids ``[dup_copies, dup_copies + 2*pair_n)``: ``pair_n`` isolated
  near-dup PAIRS (39 hash-generated tokens shared within the pair + one
  per-side token) — small clusters the cap must PRESERVE (recall probe).
- everything else: 40 tokens drawn from a 4k vocab via ``F.hash(id, i)``.
  The hash draw matters: the original ``(id*131 + i*7919) mod 4000``
  formula CYCLES with period 4000 in id, so at 1M docs every "unique"
  background doc repeated ~250× and every background bucket exceeded any
  reasonable cap — measuring the exact-dup pathology, not clean-background
  behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 4000
TEMPLATE = " ".join(f"t{i}" for i in range(39))


def _hash_tokens(seed_col, n: int):
    voc = F.array(*[F.lit(f"w{i}") for i in range(VOCAB_SIZE)])
    return F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(n - 1)),
            lambda i: F.element_at(
                voc,
                (F.pmod(F.hash(seed_col, i), F.lit(VOCAB_SIZE)) + 1).cast("int"),
            ),
        ),
        " ",
    )


def boilerplate_corpus(
    spark: SparkSession, docs_n: int, dup_copies: int, pair_n: int = 1000
) -> DataFrame:
    """(doc_id, text) frame with the three populations described above."""
    pair_idx = F.floor((F.col("id") - dup_copies) / 2)
    return spark.range(docs_n).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < dup_copies,
            F.concat(F.lit(TEMPLATE + " v"), F.col("id").cast("string")),
        )
        .when(
            (F.col("id") >= dup_copies)
            & (F.col("id") < dup_copies + 2 * pair_n),
            F.concat(
                _hash_tokens(pair_idx + F.lit(10_000_000), 39),
                F.lit(" p"),
                F.pmod(F.col("id"), F.lit(2)).cast("string"),
            ),
        )
        .otherwise(_hash_tokens(F.col("id"), 40))
        .alias("text"),
    )


def probe_pair_predicate(dup_copies: int, pair_n: int):
    """Filter for id_a/id_b pair frames selecting exactly the planted
    probe pairs (2k, 2k+1) within the probe id range."""
    lo, hi = dup_copies, dup_copies + 2 * pair_n
    return (
        (F.col("id_a") >= lo)
        & (F.col("id_a") < hi)
        & (F.col("id_b") == F.col("id_a") + 1)
        & (F.pmod(F.col("id_a") - F.lit(lo), F.lit(2)) == 0)
    )
