"""Scale soak for the round-3 training-data-prep operators: repetition
profile, unigram-LM scoring, mixture sampling, sequence packing, SemDeDup.
Synthetic tables 20-100× the sf0.1 driver data; results → SCALE_NOTES.md.

Usage: python tools/soak_prep.py [docs] [vecs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.session import get_spark

DOCS_N = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
VECS_N = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000

spark = get_spark("soak_prep")


def timed(name, df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    # leading newline defeats console-progress \r interleaving in captures
    print("\n" + json.dumps({"op": name, "sec": round(dt, 2)}), flush=True)
    return dt


vocab = [f"w{i}" for i in range(1000)]
docs = spark.range(DOCS_N).select(
    F.col("id").alias("doc_id"),
    F.concat(F.lit("src"), (F.col("id") % 64).cast("string")).alias("source"),
    F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(79)),
            lambda i: F.element_at(
                F.array(*[F.lit(w) for w in vocab]),
                ((F.pmod(F.col("id") * 131 + i * 7919, F.lit(1000))) + 1).cast("int"),
            ),
        ),
        " ",
    ).alias("text"),
)
docs.write.mode("overwrite").parquet("/tmp/soak/prep_docs")
docs = spark.read.parquet("/tmp/soak/prep_docs")
print(json.dumps({"table": "docs", "rows": docs.count()}))

vecs = spark.range(VECS_N).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.col("id") * 2654435761 + i * 40503, F.lit(2000)) - 1000)
        / 1000.0,
    ).cast("array<float>").alias("embedding"),
)
vecs.write.mode("overwrite").parquet("/tmp/soak/prep_vecs")
vecs = spark.read.parquet("/tmp/soak/prep_vecs")
print(json.dumps({"table": "vecs", "rows": vecs.count()}))

from cerebro_spark.operators.sampling import mixture_sample, pack_tokens
from cerebro_spark.operators.similarity import semantic_dedup
from cerebro_spark.operators.text import repetition_profile, unigram_nll

timed("repetition_profile", repetition_profile(docs))
timed("unigram_nll", unigram_nll(docs))
timed(
    "mixture_sample_8dom",
    mixture_sample(
        docs,
        {f"src{i}": w for i, w in enumerate([0.3, 0.2, 0.15, 0.1, 0.1, 0.05, 0.05, 0.05])},
        domain_col="source",
        key_col="doc_id",
    ),
)
timed(
    "pack_tokens_64shards",
    pack_tokens(docs, budget=2048, partition_col="source", order_col="doc_id"),
)
# k ≈ sqrt(N) clusters keeps expected within-cluster pair count near-linear
timed(
    "semantic_dedup_k224",
    semantic_dedup(vecs, dim=64, threshold=0.99, n_clusters=224),
)
