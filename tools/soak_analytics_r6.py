"""Round-6 soak: the session-3 analytics operators at 10M events.

These are all window/groupBy compositions whose plans the audit already
machine-checks; what this soak adds is (a) wall-clock at 1000× the gate
SF on one box, (b) CONSERVATION invariants that a partitioning bug would
break silently:

* scd2_collapse — Σ n_events over intervals == input rows, and exactly
  one open (is_current) interval per user;
* window_funnel — level counts sum to the users-with-step-1 count and
  are monotone (level k ⊆ level k−1 by construction);
* psi_drift — n_early + n_late == N per key;
* moments_profile — n sums to N; kurtosis ≥ 1 + skewness² (a hard
  mathematical inequality for any distribution — Pearson);
* mann_kendall — |S| ≤ C(n_buckets, 2).

Input: 10M hash-derived events, 100k users, 5 types, 30-day span.

    python tools/soak_analytics_r6.py [scale]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from cerebro_spark.operators.profile import moments_profile, scd2_collapse
from cerebro_spark.operators.timeops import window_funnel
from cerebro_spark.operators.tsdb import mann_kendall, psi_drift
from cerebro_spark.session import get_spark

SCALE = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
N = int(10_000_000 * SCALE)
USERS = 100_000
TYPES = ["view", "click", "purchase", "signup", "error"]

spark = get_spark("soak-analytics-r6")

ev = spark.range(N).select(
    F.col("id").alias("event_id"),
    F.timestamp_seconds(
        F.lit(1704067200) + F.pmod(F.hash(F.col("id")), F.lit(30 * 86400))
    ).alias("ts"),
    F.pmod(F.hash(F.col("id"), F.lit(1)), F.lit(USERS)).alias("user_id"),
    F.element_at(
        F.array(*[F.lit(t) for t in TYPES]),
        (F.pmod(F.hash(F.col("id"), F.lit(2)), F.lit(5)) + 1).cast("int"),
    ).alias("event_type"),
    (F.pmod(F.hash(F.col("id"), F.lit(3)), F.lit(100000)) / 100.0).alias("value"),
)
ev = ev.localCheckpoint(eager=True)
print(f"analytics soak: {ev.count():,} events, {USERS:,} users")


def timed(tag, fn):
    t0 = time.time()
    out = fn()
    print(f"{tag}: {time.time() - t0:.1f}s {out}")
    return out


# 1. SCD2: conservation + exactly one open interval per user
def run_scd2():
    iv = scd2_collapse(
        ev, ["user_id"], ["event_type"], "ts", tiebreak_cols=["event_id"]
    )
    agg = iv.agg(
        F.sum("n_events").alias("rows"),
        F.sum(F.col("is_current").cast("long")).alias("open"),
        F.count(F.lit(1)).alias("intervals"),
    ).first()
    assert agg["rows"] == N, agg
    # exactly one open interval per user WITH EVENTS (at scale < 1 the
    # fixed 100k-user space leaves some users empty)
    active_users = ev.select("user_id").distinct().count()
    assert agg["open"] == active_users, (agg, active_users)
    return {"intervals": agg["intervals"]}


timed("scd2_collapse 10M", run_scd2)


# 2. funnel: level counts sum to users-with-view
def run_funnel():
    lv = window_funnel(
        ev,
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        keys=["user_id"],
        window_seconds=86400,
    )
    hist = {r["level"]: r["n"] for r in
            lv.groupBy("level").agg(F.count(F.lit(1)).alias("n")).collect()}
    viewers = ev.filter(F.col("event_type") == "view").select(
        "user_id").distinct().count()
    assert sum(hist.values()) == viewers, (hist, viewers)
    return hist


timed("window_funnel 10M", run_funnel)


# 3. PSI: split conservation
def run_psi():
    rows = psi_drift(ev, "value", "ts", keys=["event_type"]).collect()
    for r in rows:
        assert r["n_early"] + r["n_late"] > 0
    total = sum(r["n_early"] + r["n_late"] for r in rows)
    assert total == N, total
    return {r["event_type"]: round(r["psi"], 5) for r in rows}


timed("psi_drift 10M", run_psi)


# 4. moments: Pearson inequality kurtosis >= 1 + skewness^2
def run_moments():
    rows = moments_profile(ev, "value", keys=["event_type"]).collect()
    assert sum(r["n"] for r in rows) == N
    for r in rows:
        assert r["kurtosis"] >= 1 + r["skewness"] ** 2 - 1e-9, r
    return {r["event_type"]: round(r["kurtosis"], 3) for r in rows}


timed("moments_profile 10M", run_moments)


# 5. Mann-Kendall: |S| bounded by the pair count
def run_mk():
    rows = mann_kendall(ev, "value", "ts", keys=["event_type"]).collect()
    for r in rows:
        nb = r["n_buckets"]
        assert abs(r["s_stat"]) <= nb * (nb - 1) // 2, r
    return {r["event_type"]: r["s_stat"] for r in rows}


timed("mann_kendall 10M", run_mk)

print("SOAK GREEN")
