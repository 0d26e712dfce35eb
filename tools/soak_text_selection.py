"""Round-6 soak: `text.bm25_topk` and `text.dsir_weights` at corpus scale.

The sf0.1 gate corpus is only 500 docs — far too small to see whether the
shuffle-free BM25 design actually holds its cost at data scale, or whether
DSIR's (doc, word) aggregation stays the vocabulary-bounded shuffle it
claims to be.  This soak generates an N-doc corpus (~30 tokens/doc from a
hash-driven vocabulary — `F.hash`, never modular cycling) and measures:

  * bm25 wall at N and 4N — the operator is two scans + a scalar agg, so
    the ratio must stay near 4 (super-linear growth = an accidental
    quadratic or a shuffle that materialized);
  * dsir wall at N — completes with exact integer weights and a full
    vocabulary-bounded plan;
  * sanity on the output: bm25 top-k is full, scores positive and
    descending; dsir weights are integers with both signs present (the
    target slice pulls its vocabulary up, the rest down).

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_text_selection.py [docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.text import bm25_topk, dsir_weights
from cerebro_spark.session import get_spark

DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
TOKENS = 30
VOCAB = [
    "spark", "merge", "window", "join", "hash", "scan", "sort", "batch",
    "stream", "table", "filter", "group", "query", "row", "column", "key",
    "value", "data", "fast", "slow", "small", "big", "agg", "order",
    "part", "line", "vector", "dup", "the", "a",
]

spark = get_spark("soak-text-selection")


def corpus(n: int):
    words = F.array(*[F.lit(w) for w in VOCAB])
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.hash("id", F.lit("t")), F.lit(5)) == 0).alias("tgt"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), F.lit(TOKENS)),
                lambda i: F.element_at(
                    words, F.pmod(F.hash(F.col("id"), i), F.lit(len(VOCAB))) + 1
                ),
            ),
            " ",
        ).alias("text"),
    )


def run_bm25(n: int) -> float:
    t0 = time.perf_counter()
    rows = bm25_topk(corpus(n), ("spark", "merge", "window"), k=10).collect()
    wall = time.perf_counter() - t0
    scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert len(rows) == 10 and all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    return wall


def run_dsir(n: int) -> float:
    t0 = time.perf_counter()
    rows = dsir_weights(corpus(n), F.col("tgt"), k=50).collect()
    wall = time.perf_counter() - t0
    ws = [r["weight"] for r in rows]
    assert len(rows) == 50 and all(isinstance(w, int) for w in ws)
    return wall


b1 = run_bm25(DOCS)
b4 = run_bm25(4 * DOCS)
d1 = run_dsir(DOCS)

print(f"bm25  {DOCS:>9} docs: {b1:6.2f}s   {4*DOCS:>9} docs: {b4:6.2f}s   ratio {b4/b1:.2f} (linear = 4)")
print(f"dsir  {DOCS:>9} docs: {d1:6.2f}s")
assert b4 / b1 < 6.5, f"bm25 super-linear: {b4/b1:.2f}x for 4x docs"
print("SOAK GREEN")
