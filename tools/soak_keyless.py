"""Round-5 soak: the three KEYLESS two-level rewrites from round 4 —
as-of join (`joins._keyless_carry`), CUSUM (`tsdb.cusum` keyless branch),
and `rolling_by_time`'s auto-bucket default — measured at data scale.

Round 4 replaced the last three unpartitioned global-window plans with
per-day-bucket windows + a calendar-sized summary pass + broadcast carry,
and proved PARITY in pytest; this soak adds the missing wall-time evidence
that the rewrites actually parallelize (the point of the change), by
comparing each keyless op against the same op keyed 100 ways on the same
row count (the keyed path was never the problem — it is the baseline for
"embarrassingly parallel on this box").

Corpus: N rows at 1 Hz (N seconds ≈ N/86400 day-buckets — 5M rows ≈ 58
buckets), value = slow sine + hash noise, so CUSUM has drift structure and
rolling means are non-trivial.

Expectation asserted: each keyless op completes within FACTOR× its keyed
twin (same rows, same verb) — if a global single-task window sneaks back
in, the keyless side degrades by the task-parallelism factor (~32 on
local[32]) and the assertion trips.

Results -> SCALE_NOTES.md (run manually):
    python tools/soak_keyless.py [rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.joins import asof_join
from cerebro_spark.operators.timeops import rolling_by_time
from cerebro_spark.operators.tsdb import cusum
from cerebro_spark.session import get_spark

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
KEYS = 100
FACTOR = 3.0  # keyless must stay within this of the keyed twin

spark = get_spark("soak-keyless")

base = (
    spark.range(ROWS)
    .select(
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("ts"),
        (
            F.sin(F.col("id") / 50_000.0) * 10
            + (F.pmod(F.hash(F.col("id")), 1000) / 100.0)
        ).alias("value"),
        F.pmod(F.col("id"), KEYS).cast("int").alias("k"),
        F.col("id"),
    )
    .persist()
)
base.count()

right = (
    spark.range(ROWS // 10)
    .select(
        F.timestamp_seconds(
            F.lit(1_700_000_000) + F.col("id") * 10 + 3
        ).alias("ts"),
        (F.pmod(F.hash(F.col("id") * 7), 1000) / 10.0).alias("ref"),
        F.pmod(F.col("id"), KEYS).cast("int").alias("k"),
    )
    .persist()
)
right.count()


def bench(tag, df):
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    return round(time.perf_counter() - t0, 2)


results = {}

# CUSUM: keyed vs keyless (closed-form two-level scan)
results["cusum_keyed"] = bench(
    "cusum_keyed", cusum(base, "value", "ts", keys=["k"], tiebreak=["id"])
)
results["cusum_keyless"] = bench(
    "cusum_keyless", cusum(base, "value", "ts", keys=[], tiebreak=["id"])
)

# as-of join: keyed vs keyless (bucketed carry)
results["asof_keyed"] = bench(
    "asof_keyed", asof_join(base, right, "ts", by=["k"], right_cols=["ref"])
)
results["asof_keyless"] = bench(
    "asof_keyless", asof_join(base, right, "ts", by=[], right_cols=["ref"])
)

# rolling: the keyed twin is NOT comparable here — partitioning by k makes
# each series 100× sparser, so a 300 s RANGE frame covers ~3 rows keyed vs
# 300 rows keyless, and the keyless side's extra cost is the inherent
# O(rows × frame_rows) sliding-frame arithmetic on a DENSE series (the
# SCALE_NOTES density rule), not a serialization point.  What the round-4
# rewrite bought is parallelism, so measure exactly that:
# (a) keyless auto-bucket vs the OLD plan (one global bucket = the
#     unpartitioned window), at ROWS/5 to keep the slow side bounded;
# (b) near-linear scaling of the auto path from ROWS/5 to ROWS.
specs = {"roll_avg": ("avg", "value", 300), "roll_max": ("max", "value", 300)}
small = base.filter(F.col("id") < ROWS // 5)
results["rolling_auto_small"] = bench(
    "rolling_auto_small", rolling_by_time(small, specs)
)
results["rolling_global_small"] = bench(
    "rolling_global_small",
    rolling_by_time(small, specs, scale_bucket_seconds=ROWS + 1),
)
results["rolling_auto_full"] = bench(
    "rolling_auto_full", rolling_by_time(base, specs)
)

print("\n" + json.dumps({"rows": ROWS, "keys": KEYS, **results}))
for verb in ("cusum", "asof"):
    keyed, keyless = results[f"{verb}_keyed"], results[f"{verb}_keyless"]
    ok = keyless <= FACTOR * max(keyed, 0.5)
    print(json.dumps({"verb": verb, "keyed_sec": keyed,
                      "keyless_sec": keyless, "within_factor": ok}))
    assert ok, (
        f"keyless {verb} took {keyless}s vs keyed {keyed}s — "
        f"a serialization point is back in the keyless plan"
    )
speedup = results["rolling_global_small"] / max(results["rolling_auto_small"], 0.1)
scaling = results["rolling_auto_full"] / max(results["rolling_auto_small"], 0.1)
print(json.dumps({"verb": "rolling", "auto_vs_global_speedup": round(speedup, 1),
                  "scale_5x_rows_time_ratio": round(scaling, 1)}))
assert speedup >= 3.0, (
    f"auto-bucket rolling only {speedup:.1f}× faster than the global window "
    "— the overlap-bucket parallelism is not engaging"
)
assert scaling <= 8.0, (
    f"keyless rolling scaled {scaling:.1f}× for 5× rows — superlinear"
)

base.unpersist()
right.unpersist()
