"""Scale soak: run the core operators on synthetic data 10-50× the sf0.1
driver tables and record throughput, to verify near-linear scaling of the
partition/shuffle strategy.  Results → SCALE_NOTES.md (run manually).

Usage: python tools/soak.py [events_rows] [docs] [vecs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.session import get_spark

EVENTS_N = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
DOCS_N = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
VECS_N = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000

spark = get_spark("soak")


def timed(name, df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(json.dumps({"op": name, "sec": round(dt, 2)}))
    return dt


# ---- synthetic tables (deterministic, generated distributed) ---------------
base = spark.range(EVENTS_N).select(
    F.col("id").alias("event_id"),
    F.timestamp_seconds(
        F.lit(1704067200) + (F.col("id") * 37 % 31_536_000)
    ).alias("ts"),  # one year span, shuffled order
    (F.col("id") % 10_000).alias("user_id"),
    (F.pmod(F.col("id") * 2654435761, F.lit(49000)) / 100.0 + 0.01).alias("value"),
)
base.write.mode("overwrite").parquet("/tmp/soak/events")
events = spark.read.parquet("/tmp/soak/events")
print(json.dumps({"table": "events", "rows": events.count()}))

vocab = [f"w{i}" for i in range(1000)]
docs = spark.range(DOCS_N).select(
    F.col("id").alias("doc_id"),
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
docs.write.mode("overwrite").parquet("/tmp/soak/docs")
docs = spark.read.parquet("/tmp/soak/docs")
print(json.dumps({"table": "docs", "rows": docs.count()}))

vecs = spark.range(VECS_N).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda i: (F.pmod(F.col("id") * 2654435761 + i * 40503, F.lit(2000)) - 1000)
        / 1000.0,
    ).cast("array<float>").alias("embedding"),
    (F.col("id") % 10).cast("int").alias("label"),
)
vecs.write.mode("overwrite").parquet("/tmp/soak/vecs")
vecs = spark.read.parquet("/tmp/soak/vecs")
print(json.dumps({"table": "vecs", "rows": vecs.count()}))

# ---- time-series operators at 50× sf0.1 ------------------------------------
from cerebro_spark.operators.timeops import dedup_by_time, rolling_by_time
from cerebro_spark.operators.tsdb import downsample, gapfill

timed(
    "rolling_3x_windows_bucketed",
    rolling_by_time(
        events,
        {
            "a5": ("avg", "value", 300),
            "m30": ("max", "value", 1800),
            "s60": ("sum", "value", 3600),
        },
        "ts",
        scale_bucket_seconds=86400,
    ),
)
timed(
    "dedup_by_second",
    dedup_by_time(
        events.withColumn("ts_sec", F.date_trunc("second", "ts")),
        "ts_sec",
        tiebreak="event_id",
    ),
)
from pyspark.sql import Window

w = Window.partitionBy("user_id").orderBy("ts", "event_id")
gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
sess = events.withColumn(
    "sid",
    F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    ),
).groupBy("user_id", "sid").agg(F.count(F.lit(1)).alias("n"))
timed("sessionize_10k_users", sess)

ds = downsample(
    events, 21600, {"v": F.avg("value"), "n": F.count(F.lit(1))}, "ts"
)
timed("downsample_gapfill", gapfill(ds, 21600, "bucket_ts"))

# ---- text/dedup operators at 20× sf0.1 -------------------------------------
from cerebro_spark.operators.dedup import (
    exact_dedup,
    minhash_signatures,
    ngram_jaccard_pairs,
)
from cerebro_spark.operators.text import text_profile

timed("exact_dedup", exact_dedup(docs))
timed("text_profile", text_profile(docs))
timed("minhash_signatures_16", minhash_signatures(docs, num_hashes=16))
timed(
    "ngram_jaccard_guarded",
    ngram_jaccard_pairs(docs, n=5, threshold=0.5, max_shingle_freq=100),
)

# ---- similarity at 25× sf0.1 ------------------------------------------------
from cerebro_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
)

queries = vecs.filter(F.col("vec_id") < 10)
timed("ann_bruteforce_10q_x_50k", cosine_topk_bruteforce(vecs, queries, k=5))
timed(
    "ann_lsh_10q_x_50k",
    cosine_topk_lsh(vecs, queries, dim=64, k=5, num_planes=8, num_tables=4),
)

# ---- skew demonstration: one hot key vs salted join -------------------------
hot = spark.range(2_000_000).select(
    F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 1000).alias("k"),
    F.col("id").alias("v"),
)  # 90% of rows share key 0
dim = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
spark.conf.set("spark.sql.adaptive.enabled", "false")  # isolate the effect
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
from cerebro_spark.operators.util import salted_join

timed("skewed_join_plain", hot.join(dim, "k").groupBy().agg(F.sum("w")))
timed("skewed_join_salted", salted_join(hot, dim, "k", salt_buckets=32).groupBy().agg(F.sum("w")))
spark.conf.set("spark.sql.adaptive.enabled", "true")
spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
print("done")
