"""ANN soak at ≥1M vectors: find the LSH-vs-brute-force crossover.

Round-1 honesty note said LSH ≈ brute force at 50k vectors because the
one-shot call recomputes corpus buckets (planes×tables dot products per row ≈
a handful of query-equivalents).  This soak measures the three regimes that
matter at scale:

1. brute force, Q queries × N corpus — the baseline;
2. one-shot LSH (buckets computed in the same job) — wins once Q outgrows
   planes×tables / 64-dim-equivalents;
3. production LSH: corpus bucketed ONCE and persisted (what a 100 TB ingest
   does), per-batch query cost = bucket Q vectors + bucket-local join only.

Also records recall@k of LSH vs the exact top-k.

Usage: python tools/soak_ann.py [n_vecs] [n_queries] [planes] [tables]
Results → SCALE_NOTES.md (run manually).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.similarity import (
    cosine_lsh_bucket,
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)
from cerebro_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
Q = int(sys.argv[2]) if len(sys.argv) > 2 else 100
PLANES = int(sys.argv[3]) if len(sys.argv) > 3 else 12
TABLES = int(sys.argv[4]) if len(sys.argv) > 4 else 4
K = 5
DIM = 64

spark = get_spark("soak-ann")


def timed(name: str, fn):
    t0 = time.perf_counter()
    out = fn()
    sec = round(time.perf_counter() - t0, 2)
    print(json.dumps({"op": name, "sec": sec}), flush=True)
    return out, sec


# two-level modular mix so no two ids share a whole vector (a plain
# ``id*const % small`` has a short period → exact duplicates → trivial recall)
vecs = spark.range(N).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: (
            F.pmod(
                F.pmod(F.col("id") * 2654435761 + i * 40503, F.lit(1000003))
                * 2246822519,
                F.lit(2000),
            )
            - 1000
        )
        / 1000.0,
    ).cast("array<float>").alias("embedding"),
)
vecs.write.mode("overwrite").parquet("/tmp/soak/ann_vecs")
vecs = spark.read.parquet("/tmp/soak/ann_vecs")
queries = vecs.filter(F.col("vec_id") < Q)
print(json.dumps({"corpus": vecs.count(), "queries": Q, "planes": PLANES,
                  "tables": TABLES}), flush=True)

brute_rows, t_brute = timed(
    f"brute_{Q}q_x_{N}",
    lambda: cosine_topk_bruteforce(vecs, queries, k=K).collect(),
)

lsh_rows, t_lsh = timed(
    f"lsh_oneshot_{Q}q_x_{N}_p{PLANES}_t{TABLES}",
    lambda: cosine_topk_lsh(
        vecs, queries, dim=DIM, k=K, num_planes=PLANES, num_tables=TABLES
    ).collect(),
)

# production path: bucket the corpus once (ingest-time cost, amortized over
# every future query batch), persist, then measure the per-batch query cost.
def bucket_and_persist():
    cb = cosine_lsh_bucket(
        vecs, DIM, PLANES, num_tables=TABLES
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        "bucket",
        # directory-level shard key: full 2^planes×tables dirs would mean tiny
        # files locally; 256 shards still prune ~(1 - hit-rate) of the store
        # for small query batches, and a real deployment keys directly on
        # bucket.
        F.pmod(F.col("bucket"), F.lit(256)).alias("bucket_shard"),
    )
    cb.repartition("bucket_shard").write.mode("overwrite").partitionBy(
        "bucket_shard"
    ).parquet("/tmp/soak/ann_buckets")
    return spark.read.parquet("/tmp/soak/ann_buckets")


cb, t_bucket = timed(f"bucket_corpus_once_{N}", bucket_and_persist)


def query_prebucketed():
    from pyspark.sql import Window

    from cerebro_spark.operators.similarity import _dot, _norm

    qb = cosine_lsh_bucket(
        queries, DIM, PLANES, num_tables=TABLES
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "bucket")
    # query-driven partition pruning: the batch's bucket list is tiny (≤ Q ×
    # tables values) — pushing it down as literal IN filters lets the scan
    # skip non-matching shard directories and row groups entirely.
    qlist = [r["bucket"] for r in qb.select("bucket").distinct().collect()]
    shards = sorted({b % 256 for b in qlist})
    pruned = cb.filter(
        F.col("bucket_shard").isin(shards) & F.col("bucket").isin(qlist)
    )
    scored = (
        pruned.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cosine",
            _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .collect()
    )


pre_rows, t_pre = timed(f"lsh_prebucketed_query_{Q}q", query_prebucketed)

# recall@K of each LSH variant vs the exact answer
exact = {}
for r in brute_rows:
    exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])


def recall(rows):
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    per_q = [
        len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
    ]
    return round(sum(per_q) / len(per_q), 4)


print(
    json.dumps(
        {
            "recall_lsh_oneshot": recall(lsh_rows),
            "recall_lsh_prebucketed": recall(pre_rows),
            "speedup_oneshot": round(t_brute / t_lsh, 2),
            "speedup_prebucketed_query": round(t_brute / t_pre, 2),
            "bucket_amortized_over_batches": round(t_bucket / max(t_pre, 1e-9), 1),
        }
    ),
    flush=True,
)
print("done", flush=True)
