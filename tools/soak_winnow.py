"""Round-4 soak: winnowing fingerprints vs the full shingle index at 200k
docs (reuses the r3 generator: 1000-word vocab, ~80-token docs, 20% of docs
carrying a planted 24-token shared run at varying offsets).

Measures, at increasing doc counts:
- winnow_fingerprints wall time and fingerprint count vs the full distinct
  4-gram count (the index-size reduction winnowing buys);
- winnow_overlap_pairs wall time vs ngram_containment_pairs at the same
  guarantee floor (shared runs >= 7 tokens are detected by both).

Results -> SCALE_NOTES.md (run manually).

Usage: python tools/soak_winnow.py [docs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.session import get_spark

DOCS_N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

spark = get_spark("soak-winnow")


def timed(name, df, extra=None):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(json.dumps({"op": name, "sec": round(dt, 2), **(extra or {})}))
    return dt


vocab = [f"w{i}" for i in range(1000)]
voc_arr = F.array(*[F.lit(w) for w in vocab])
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
docs.write.mode("overwrite").parquet("/tmp/soak/docs_winnow")
docs = spark.read.parquet("/tmp/soak/docs_winnow")
print(json.dumps({"table": "docs_winnow", "rows": docs.count()}))

from cerebro_spark.operators.dedup import (
    _shingles,
    ngram_containment_pairs,
    winnow_fingerprints,
    winnow_overlap_pairs,
)

fps = winnow_fingerprints(docs, k=4, w=4)
timed("winnow_fingerprints_portable_md5", fps)
timed(
    "winnow_fingerprints_xxhash",
    winnow_fingerprints(docs, k=4, w=4, portable=False),
)
n_fp = fps.count()
n_grams = (
    docs.select(F.explode(_shingles("text", 4)).alias("s")).count()
)
print(
    json.dumps(
        {
            "fingerprints": n_fp,
            "full_4gram_postings": n_grams,
            "index_reduction": round(n_grams / n_fp, 2),
        }
    )
)

# the planted 24-token runs are detectable by both detectors; cap posting
# lists identically (the shared run's fingerprints are the hot keys)
timed(
    "winnow_overlap_pairs_portable",
    winnow_overlap_pairs(docs, k=4, w=4, min_shared=3, max_fp_freq=2000),
)
timed(
    "winnow_overlap_pairs_xxhash",
    winnow_overlap_pairs(
        docs, k=4, w=4, min_shared=3, max_fp_freq=2000, portable=False
    ),
)
timed(
    "ngram_containment_pairs",
    ngram_containment_pairs(
        docs, n=5, threshold=0.05, max_shingle_freq=2000
    ),
)
