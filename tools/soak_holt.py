"""Round-4 soak (VERDICT r3 #6): Holt-Winters with ONE dense series vs the
same row count spread over many series.  The claim under test: the
sequential pandas group sees BUCKETS, not rows (downsample pre-aggregates
map-side), so a single 5M-row 1 Hz series must run within ~10x of the
100-series case — not serialize 5M rows through one task.

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_holt.py [rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.tsdb import holt_winters_forecast
from cerebro_spark.session import get_spark

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000

spark = get_spark("soak-holt")


def timed(name, df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    print(json.dumps({"op": name, "sec": round(dt, 2)}))
    return dt


# 1 Hz samples: ROWS seconds of span (~58 days at 5M)
base = spark.range(ROWS).select(
    F.col("id"),
    F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    (
        F.sin(F.col("id").cast("double") / 86400.0 * 6.283) * 10.0
        + (F.col("id") % 97).cast("double") / 9.7
    ).alias("value"),
)

single = base.withColumn("series", F.lit("s0"))
multi = base.withColumn(
    "series", F.concat(F.lit("s"), (F.col("id") % 100).cast("string"))
)

t_multi = timed(
    "holt_100_series",
    holt_winters_forecast(multi, "value", "ts", keys=["series"]),
)
t_single = timed(
    "holt_1_series",
    holt_winters_forecast(single, "value", "ts", keys=["series"]),
)
ratio = t_single / t_multi if t_multi else float("inf")
print(
    json.dumps(
        {
            "rows": ROWS,
            "single_sec": round(t_single, 2),
            "multi_sec": round(t_multi, 2),
            "single_over_multi": round(ratio, 2),
            "bound_ok": ratio <= 10.0,
        }
    )
)
assert ratio <= 10.0, "single dense series serialized the fit"
