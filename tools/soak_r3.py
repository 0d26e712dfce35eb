"""Round-3 soak: the new text/dedup operators at 10-40x sf0.1 doc counts.

Reuses the soak docs generator (1000-word vocab, 80-token docs) PLUS a
20% planted-duplicate tail (cloned token runs at random offsets) so the
dedup operators do real work.  Results -> SCALE_NOTES.md (run manually).

Usage: python tools/soak_r3.py [docs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.session import get_spark

DOCS_N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

spark = get_spark("soak-r3")


def timed(name, df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(json.dumps({"op": name, "sec": round(dt, 2)}))
    return dt


vocab = [f"w{i}" for i in range(1000)]
voc_arr = F.array(*[F.lit(w) for w in vocab])
# 80% unique-ish docs; 20% carry a shared 24-token run at a doc-dependent
# offset (exercises both the aligned-chunk and sliding-window paths)
shared = " ".join(f"s{i}" for i in range(24))
docs = spark.range(DOCS_N).select(
    F.col("id").alias("doc_id"),
    F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(79)),
            lambda i: F.element_at(
                voc_arr,
                ((F.pmod(F.col("id") * 131 + i * 7919, F.lit(1000))) + 1).cast(
                    "int"
                ),
            ),
        ),
        " ",
    ).alias("base_text"),
).select(
    "doc_id",
    F.when(
        F.col("doc_id") % 5 == 0,
        F.concat_ws(
            " ",
            F.array_join(
                F.slice(
                    F.split(F.col("base_text"), " "),
                    1,
                    (F.col("doc_id") % 37 + 3).cast("int"),
                ),
                " ",
            ),
            F.lit(shared),
            F.col("base_text"),
        ),
    )
    .otherwise(F.col("base_text"))
    .alias("text"),
)
docs.write.mode("overwrite").parquet("/tmp/soak/docs_r3")
docs = spark.read.parquet("/tmp/soak/docs_r3")
print(json.dumps({"table": "docs_r3", "rows": docs.count()}))

from cerebro_spark.operators.dedup import duplicated_span_profile
from cerebro_spark.operators.text import build_vocab, dedup_chunks, encode_tokens

timed("chunk_dedup", dedup_chunks(docs, chunk_tokens=16))
timed("dup_spans_w16", duplicated_span_profile(docs, window_tokens=16))
timed("vocab_encode", encode_tokens(docs, build_vocab(docs, vocab_size=256)))

# ---- CDC upsert merge at 2M-row store ---------------------------------------
import shutil
import time as _time

from pyspark.sql import functions as _F

from cerebro_spark.streaming.sinks import keyed_upsert_sink

STORE = "/tmp/soak/upsert_store"
shutil.rmtree(STORE, ignore_errors=True)
sink = keyed_upsert_sink(STORE, key_cols=["k"], ts_col="time", n_buckets=64)

base_rows = spark.range(2_000_000).select(
    _F.concat(_F.lit("k"), _F.col("id")).alias("k"),
    (_F.col("id") % 1000 / 10.0).alias("v"),
    _F.timestamp_seconds(_F.lit(1704067200) + _F.col("id") % 86400).alias("time"),
)
t0 = _time.perf_counter()
sink(base_rows, 0)
print(json.dumps({"op": "upsert_initial_load_2M", "sec": round(_time.perf_counter() - t0, 2)}))

# a 10k-key update batch: touches ≤ 64 buckets but only ~10k/2M of the rows
upd = spark.range(10_000).select(
    _F.concat(_F.lit("k"), (_F.col("id") * 200)).alias("k"),
    _F.lit(999.0).alias("v"),
    _F.timestamp_seconds(_F.lit(1704200000)).alias("time"),
)
t0 = _time.perf_counter()
sink(upd, 1)
print(json.dumps({"op": "upsert_10k_batch_into_2M", "sec": round(_time.perf_counter() - t0, 2)}))

got = spark.read.parquet(STORE)
n = got.count()
updated = got.filter(_F.col("v") == 999.0).count()
print(json.dumps({"check": "upsert", "rows": n, "updated": updated}))

# ---- sketch rollups at 20M events ------------------------------------------
from cerebro_spark.operators.tsdb import (
    distinct_over_range,
    distinct_sketch_rollup,
    quantile_sketch_rollup,
    quantiles_over_range,
)

big = spark.range(20_000_000).select(
    F.timestamp_seconds(
        F.lit(1704067200) + (F.col("id") * 37 % 31_536_000)
    ).alias("ts"),
    (F.pmod(F.col("id") * 2654435761, F.lit(5_000_000))).alias("user_id"),
    (F.pmod(F.col("id") * 48271, F.lit(100000)) / 100.0).alias("value"),
)
big.write.mode("overwrite").parquet("/tmp/soak/big_events")
big = spark.read.parquet("/tmp/soak/big_events")

t0 = _time.perf_counter()
hll = distinct_sketch_rollup(big, "user_id")
hll.write.mode("overwrite").parquet("/tmp/soak/hll_daily")
print(json.dumps({"op": "hll_rollup_build_20M", "sec": round(_time.perf_counter() - t0, 2)}))

hll = spark.read.parquet("/tmp/soak/hll_daily")
import datetime as _dt
lo, hi = _dt.datetime(2024, 3, 1), _dt.datetime(2024, 9, 1)
t0 = _time.perf_counter()
est = distinct_over_range(hll, lo, hi).collect()[0]["approx_distinct"]
print(json.dumps({"op": "hll_range_query", "sec": round(_time.perf_counter() - t0, 2), "est": int(est)}))
t0 = _time.perf_counter()
exact = (
    big.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
    .agg(F.countDistinct("user_id").alias("n")).collect()[0]["n"]
)
print(json.dumps({"op": "exact_range_distinct_raw", "sec": round(_time.perf_counter() - t0, 2), "exact": exact}))

t0 = _time.perf_counter()
kll = quantile_sketch_rollup(big, "value")
kll.write.mode("overwrite").parquet("/tmp/soak/kll_daily")
print(json.dumps({"op": "kll_rollup_build_20M", "sec": round(_time.perf_counter() - t0, 2)}))
t0 = _time.perf_counter()
q = quantiles_over_range(spark.read.parquet("/tmp/soak/kll_daily"), (0.5, 0.99), lo, hi).collect()[0]
print(json.dumps({"op": "kll_range_query", "sec": round(_time.perf_counter() - t0, 2), "p50": q["p50"], "p99": q["p99"]}))
