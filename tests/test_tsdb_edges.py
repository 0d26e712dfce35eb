"""Edge cases for the TSDB verb operators (the oracle covers the bulk)."""

import datetime as dt

from pyspark.sql import functions as F

from cerebro_spark.operators.tsdb import (
    derivative,
    downsample,
    gapfill,
    increase,
    interpolate_linear,
)


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=s)


def test_derivative_dup_second_null(spark):
    df = spark.createDataFrame(
        [(1, _t(0), 10.0), (2, _t(0), 20.0), (3, _t(10), 30.0)],
        ["id", "ts", "v"],
    )
    out = {r["id"]: r["derivative"] for r in
           derivative(df, "v", "ts", order_extra=["id"]).collect()}
    assert out[1] is None            # first row
    assert out[2] is None            # dt == 0 (same truncated second)
    assert out[3] == (30.0 - 20.0) / 10


def test_increase_clamps_resets(spark):
    df = spark.createDataFrame(
        [(_t(0), 10.0), (_t(10), 15.0), (_t(20), 2.0)], ["ts", "v"]
    )
    vals = [r["increase"] for r in
            increase(df, "v", "ts").orderBy("ts").collect()]
    assert vals == [None, 5.0, 0.0]  # counter reset clamped to 0


def test_gapfill_single_and_missing_buckets(spark):
    df = spark.createDataFrame(
        [(_t(0), 1.0), (_t(0) + dt.timedelta(hours=3), 4.0)], ["ts", "v"]
    )
    ds = downsample(df, 3600, {"v": F.avg("v")}, "ts")
    dense = gapfill(ds, 3600, "bucket_ts", ffill=True).orderBy("bucket_ts")
    vals = [r["v"] for r in dense.collect()]
    assert vals == [1.0, 1.0, 1.0, 4.0]  # 2 missing hours carried forward


def test_global_ffill_equals_naive_window(spark):
    """Two-level bucketed prefix scan == unpartitioned running window,
    including carries across empty buckets and leading nulls."""
    from pyspark.sql import Window

    from cerebro_spark.operators.tsdb import _global_ffill

    rows = [
        (_t(0), None, None),
        (_t(5), 1.0, None),
        (_t(12), None, "a"),
        (_t(31), None, None),   # bucket with no non-null values at width 10
        (_t(47), 4.0, None),
        (_t(55), None, "b"),
        (_t(68), None, None),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double, s string")
    got = _global_ffill(df, "ts", ["v", "s"], scale_bucket_seconds=10)
    w = Window.orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    want = df.withColumn("v", F.last("v", ignorenulls=True).over(w)).withColumn(
        "s", F.last("s", ignorenulls=True).over(w)
    )
    assert sorted(got.collect(), key=lambda r: r["ts"]) == sorted(
        want.collect(), key=lambda r: r["ts"]
    )


def test_keyless_lag_operators_equal_naive_window(spark):
    """Keyless derivative / increase / interpolate (two-level bucketed scan)
    must equal the naive unpartitioned-window formulation, including carries
    across bucket boundaries and a bucket whose rows are all null."""
    from pyspark.sql import Window

    rows = []
    for i in range(50):
        # irregular spacing crossing many 10 s buckets; nulls for interpolate
        v = None if i % 7 == 3 else float((i * 13) % 40)
        rows.append((_t(i * 3 + (i % 2)), v))
    df = spark.createDataFrame(rows, "ts timestamp, v double")

    got_d = derivative(df, "v", "ts", scale_bucket_seconds=10)
    w = Window.orderBy("ts")
    secs = F.col("ts").cast("long")
    naive_d = df.withColumn(
        "derivative",
        F.when(
            (secs - F.lag(secs).over(w)) > 0,
            (F.col("v") - F.lag("v").over(w)) / (secs - F.lag(secs).over(w)),
        ).otherwise(F.lit(None).cast("double")),
    )
    key = lambda r: r["ts"]  # noqa: E731
    assert sorted(got_d.collect(), key=key) == sorted(naive_d.collect(), key=key)

    got_i = increase(df, "v", "ts", scale_bucket_seconds=10)
    prev = F.lag("v").over(w)
    naive_i = df.withColumn(
        "increase",
        F.when(prev.isNotNull(), F.greatest(F.col("v") - prev, F.lit(0.0))),
    )
    assert sorted(got_i.collect(), key=key) == sorted(naive_i.collect(), key=key)

    got_l = interpolate_linear(df, "v", "ts", scale_bucket_seconds=10)
    back = w.rowsBetween(Window.unboundedPreceding, 0)
    fwd = Window.orderBy(F.col("ts").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    dsecs = F.col("ts").cast("double")
    t_at_v = F.when(F.col("v").isNotNull(), dsecs)
    pv = F.last("v", ignorenulls=True).over(back)
    pt = F.last(t_at_v, ignorenulls=True).over(back)
    nv = F.last("v", ignorenulls=True).over(fwd)
    nt = F.last(t_at_v, ignorenulls=True).over(fwd)
    naive_l = df.withColumn(
        "v_interp",
        F.when(F.col("v").isNotNull(), F.col("v")).otherwise(
            F.when(
                pv.isNotNull() & nv.isNotNull() & (nt > pt),
                pv + (nv - pv) * (dsecs - pt) / (nt - pt),
            )
        ),
    )
    assert sorted(got_l.collect(), key=key) == sorted(naive_l.collect(), key=key)


def test_approx_users_daily_within_hll_bound(spark):
    """The one non-oracled aggregate gets a tolerance oracle here: per day,
    |approx − exact| / exact ≤ 3·rsd (rsd=0.02 → 6%), the standard HLL
    error bound (documented in QUERIES.md)."""
    from cerebro_spark.queries.tsdb_q import (
        q_approx_users_daily,
        q_distinct_users_daily,
    )

    sf = "/root/testdata/sf0.01"
    exact = {
        r["day"]: r["n_users"] for r in q_distinct_users_daily(spark, sf).collect()
    }
    got = {
        r["day"]: (r["n_users"], r["within_3rsd"])
        for r in q_approx_users_daily(spark, sf).collect()
    }
    assert set(exact) == set(got)
    for day, n in exact.items():
        n_q, ok = got[day]
        assert n_q == n, (day, n_q, n)  # exact twin matches independently
        assert ok, day  # HLL estimate within 3·rsd, encoded in-query


def test_interpolate_leading_trailing_nulls(spark):
    df = spark.createDataFrame(
        [(_t(0), None), (_t(10), 10.0), (_t(20), None), (_t(30), 40.0),
         (_t(40), None)],
        "ts timestamp, v double",
    )
    out = [r["v_interp"] for r in
           interpolate_linear(df, "v", "ts").orderBy("ts").collect()]
    assert out[0] is None            # leading null stays
    assert out[1] == 10.0
    assert out[2] == 25.0            # midpoint of 10..40 over 10..30
    assert out[4] is None            # trailing null stays


def test_global_ffill_duplicate_ts_levels_agree(spark):
    """Duplicate timestamps straddling a bucket boundary: the cross-bucket
    carry must pick the same row the within-bucket window pass would
    (ADVICE r2 — max_by/min_by tie nondeterminism). Tie rule: value asc on
    the forward pass, so the MAX value among a tied timestamp wins."""
    from cerebro_spark.operators.tsdb import _global_ffill

    rows = [
        (_t(9), 1.0),
        (_t(9), 7.0),    # tie at bucket-final ts — 7.0 must be the carry
        (_t(15), None),  # next bucket: sees the carry
        (_t(25), None),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    for _ in range(3):  # determinism across runs
        got = _global_ffill(df, "ts", ["v"], scale_bucket_seconds=10)
        carried = [r["v"] for r in got.orderBy("ts", "v").collect()]
        assert carried == [1.0, 7.0, 7.0, 7.0]


def test_approx_percentiles_within_rank_bands(spark, sf_dir):
    """GK-sketch percentiles must land inside exact rank bands on every day
    (p45-p55 for the median, p88-max for p95) — the query now encodes the
    band check in its own output (round-4 gate hardening), and this test
    independently recomputes the sketch values to confirm the booleans are
    honest, not vacuous."""
    from cerebro_spark.io import load_table
    from cerebro_spark.queries.tsdb_q import q_approx_percentiles_daily

    got = {
        r["day"]: r for r in q_approx_percentiles_daily(spark, sf_dir).collect()
    }
    ev = load_table(spark, "events", sf_dir)
    indep = {
        r["day"]: r
        for r in ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.percentile_approx("value", 0.5, 1000).alias("p50a"),
            F.percentile_approx("value", 0.95, 1000).alias("p95a"),
            F.expr("percentile(value, 0.45)").alias("lo50"),
            F.expr("percentile(value, 0.55)").alias("hi50"),
            F.expr("percentile(value, 0.88)").alias("lo95"),
            F.max("value").alias("hi95"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }
    assert got and set(got) == set(indep)
    for day, r in got.items():
        b = indep[day]
        assert r["n"] == b["n"]
        assert r["p50_in_band"] == (b["lo50"] <= b["p50a"] <= b["hi50"]), day
        assert r["p95_in_band"] == (b["lo95"] <= b["p95a"] <= b["hi95"]), day
        assert r["p50_in_band"] and r["p95_in_band"], (day, dict(r.asDict()))


# ---------------------------------------------------------------------------
# round-5 verbs: ohlc / twa / minmax downsample / MAD / KS drift
# ---------------------------------------------------------------------------

def test_ohlc_dup_ts_deterministic(spark):
    from cerebro_spark.operators.tsdb import ohlc

    # two rows share the opening timestamp — tiebreak id decides open
    df = spark.createDataFrame(
        [(1, _t(0), 5.0), (2, _t(0), 7.0), (3, _t(30), 1.0), (4, _t(50), 9.0)],
        ["id", "ts", "v"],
    )
    row = ohlc(df, 3600, "v", "ts", tiebreak=["id"]).collect()[0]
    assert row["open"] == 5.0      # id=1 wins the t=0 tie
    assert row["high"] == 9.0
    assert row["low"] == 1.0
    assert row["close"] == 9.0
    assert row["n"] == 4


def test_time_weighted_avg_hold_semantics(spark):
    from cerebro_spark.operators.tsdb import time_weighted_avg

    # v=10 held 30 s, v=20 held 10 s, last sample weightless:
    # TWA = (10*30 + 20*10) / 40 = 12.5 (NOT the plain mean 20)
    df = spark.createDataFrame(
        [(1, _t(0), 10.0), (2, _t(30), 20.0), (3, _t(40), 50.0)],
        ["id", "ts", "v"],
    )
    row = time_weighted_avg(df, 3600, "v", "ts", tiebreak=["id"]).collect()[0]
    assert row["twa"] == 12.5
    # single-sample bucket degrades to the mean
    one = spark.createDataFrame([(1, _t(0), 42.0)], ["id", "ts", "v"])
    assert time_weighted_avg(one, 3600, "v", "ts").collect()[0]["twa"] == 42.0


def test_minmax_downsample_keeps_spike(spark):
    from cerebro_spark.operators.tsdb import minmax_downsample

    df = spark.createDataFrame(
        [(1, _t(0), 5.0), (2, _t(10), 99.0), (3, _t(20), 5.0)],
        ["id", "ts", "v"],
    )
    out = minmax_downsample(df, 3600, "v", "ts", tiebreak=["id"]).collect()
    by_kind = {r["kind"]: r for r in out}
    assert by_kind["max"]["v"] == 99.0 and by_kind["max"]["ts"] == _t(10)
    assert by_kind["min"]["v"] == 5.0 and by_kind["min"]["ts"] == _t(0)  # tie → earliest


def test_mad_outliers_flags_planted_spike(spark):
    from cerebro_spark.operators.tsdb import mad_outliers

    rows = [(i, _t(i), float(i % 7)) for i in range(50)] + [(99, _t(99), 1e6)]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    out = {r["id"]: r["is_outlier"] for r in mad_outliers(df, "v").collect()}
    assert out[99] is True
    assert sum(bool(v) for v in out.values()) == 1


def test_ks_drift_detects_shift(spark):
    from cerebro_spark.operators.tsdb import ks_drift

    # first half ~ U[0,1), second half ~ U[5,6): KS should be ~1
    rows = [(i, _t(i), (i % 10) / 10.0) for i in range(100)] + [
        (i, _t(i), 5.0 + (i % 10) / 10.0) for i in range(100, 200)
    ]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    ks = ks_drift(df, "v", "ts", keys=[]).collect()[0]["ks"]
    assert ks > 0.99
    # identical halves → KS 0
    same = spark.createDataFrame(
        [(i, _t(i), (i % 10) / 10.0) for i in range(200)], ["id", "ts", "v"]
    )
    assert ks_drift(same, "v", "ts", keys=[]).collect()[0]["ks"] < 0.06


def test_cusum_alerts_on_level_shift(spark):
    from cerebro_spark.operators.tsdb import cusum

    # stable series then a sustained +10σ level shift: alerts must fire
    # after the shift and only after it
    rows = [(i, _t(i), 5.0 + (i % 3) * 0.01) for i in range(200)] + [
        (i, _t(i), 9.0 + (i % 3) * 0.01) for i in range(200, 400)
    ]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    out = cusum(df, "v", "ts", tiebreak=["id"]).select("id", "is_alert").collect()
    alerts = {r["id"] for r in out if r["is_alert"]}
    assert alerts, "level shift must trigger"
    assert min(alerts) >= 200         # nothing fires before the shift
    assert 210 in alerts and 399 in alerts  # fires shortly after, stays on
    # no-shift series stays quiet
    quiet = spark.createDataFrame(
        [(i, _t(i), 5.0 + (i % 3) * 0.01) for i in range(400)],
        ["id", "ts", "v"],
    )
    assert not [
        r for r in cusum(quiet, "v", "ts", tiebreak=["id"]).collect()
        if r["is_alert"]
    ]


def test_ks_drift_constant_series_no_crash(spark):
    """Constant values collapse the bin range — must yield KS 0, not an
    ANSI DIVIDE_BY_ZERO from the range normalization."""
    from cerebro_spark.operators.tsdb import ks_drift

    df = spark.createDataFrame(
        [(i, _t(i), 5.0) for i in range(100)], ["id", "ts", "v"]
    )
    row = ks_drift(df, "v", "ts", keys=[]).collect()[0]
    assert row["ks"] == 0.0
    assert row["n_early"] + row["n_late"] == 100


def test_cusum_constant_series_quiet(spark):
    """σ=0 series: deviations are 0, S stays 0, no alerts, no crash."""
    from cerebro_spark.operators.tsdb import cusum

    df = spark.createDataFrame(
        [(i, _t(i), 5.0) for i in range(100)], ["id", "ts", "v"]
    )
    out = cusum(df, "v", "ts", tiebreak=["id"]).collect()
    assert all(r["cusum"] == 0.0 and not r["is_alert"] for r in out)


def test_ks_drift_per_key_span(spark):
    """The early/late split is per key: a key active only in the late part
    of the GLOBAL window still splits around its own span and gets a real
    ks (a series that appeared mid-window is exactly what the alarm must
    cover).  Only a degenerate single-instant key yields NULL ks."""
    from cerebro_spark.operators.tsdb import ks_drift

    # key 'a' spans the whole window; key 'b' exists only in the late 40%
    # but drifts WITHIN its own span (first half low, second half high)
    rows = [(i, _t(i), "a", float(i % 10)) for i in range(100)]
    rows += [
        (i, _t(i), "b", 0.0 if i < 80 else 9.0) for i in range(60, 100)
    ]
    rows += [(i, _t(0), "c", 1.0) for i in range(5)]  # single instant
    df = spark.createDataFrame(rows, ["id", "ts", "k", "v"])
    out = {r["k"]: r for r in ks_drift(df, "v", "ts", keys=["k"]).collect()}
    assert out["a"]["ks"] is not None
    # b: its own midpoint is t=79.5 → early=[60,79] all 0.0, late=[80,99]
    # all 9.0 → maximal drift
    assert out["b"]["ks"] == 1.0
    assert out["b"]["n_early"] == 20 and out["b"]["n_late"] == 20
    assert out["c"]["ks"] is None


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """A pure hour-of-day pattern decomposes into ~flat trend + the planted
    seasonal profile + ~zero residuals."""
    import datetime as dt

    from cerebro_spark.operators.tsdb import seasonal_decompose

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), float((i % 24) * 1.0))
        for i in range(24 * 14)  # two weeks hourly
    ]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    out = seasonal_decompose(df, "v", "ts", keys=[]).collect()
    # interior rows (full centered window): residuals vanish, seasonal
    # spans the planted amplitude
    interior = [r for r in out if 24 <= r["id"] < 24 * 13]
    assert max(abs(r["residual"]) for r in interior) < 1.0
    seas = {r["ts"].hour: r["seasonal"] for r in interior}
    assert seas[23] - seas[0] > 20  # planted 0..23 swing recovered


def test_holt_winters_extends_linear_trend(spark):
    from cerebro_spark.operators.tsdb import holt_winters_forecast

    # clean linear series: +2 per hour — Holt must keep the slope
    rows = [(i, _t(i * 3600), 100.0 + 2.0 * i) for i in range(48)]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    fc = holt_winters_forecast(
        df, "v", "ts", keys=[], bucket_seconds=3600, horizon=5
    ).orderBy("step").collect()
    assert len(fc) == 5
    last = 100.0 + 2.0 * 47
    for r in fc:
        assert abs(r["yhat"] - (last + 2.0 * r["step"])) < 0.5
    # per-key variant keeps series separate
    rows2 = [(i, _t(i * 3600), "a", 10.0 + i) for i in range(48)] + [
        (i, _t(i * 3600), "b", 500.0 - i) for i in range(48)
    ]
    df2 = spark.createDataFrame(rows2, ["id", "ts", "k", "v"])
    fc2 = holt_winters_forecast(
        df2, "v", "ts", keys=["k"], bucket_seconds=3600, horizon=3
    ).collect()
    by_k = {}
    for r in fc2:
        by_k.setdefault(r["k"], []).append(r["yhat"])
    assert all(y > 50 for y in by_k["a"]) and all(y < 500 for y in by_k["b"])
    assert by_k["a"][0] < by_k["b"][0]


def test_momentum_verbs_invariants(spark, sf_dir):
    """Unit invariants for the oracle-gated momentum verbs: RSI ∈ [0,100],
    %K ∈ [0,100] and inside-channel by construction, Bollinger mid between
    the bands with breakouts rare on stationary data."""
    from cerebro_spark.io import load_table
    from cerebro_spark.queries.tsdb_q import (
        q_bollinger_20,
        q_rsi_14,
        q_stochastic_14,
    )

    rsi = q_rsi_14(spark, sf_dir).agg(
        F.min("rsi"), F.max("rsi")
    ).first()
    assert 0.0 <= rsi[0] and rsi[1] <= 100.0

    st = q_stochastic_14(spark, sf_dir)
    bad = st.filter(
        (F.col("pct_k") < 0)
        | (F.col("pct_k") > 100)
        | (F.col("value") < F.col("channel_low") - 0.005)
        | (F.col("value") > F.col("channel_high") + 0.005)
    ).count()
    assert bad == 0

    bb = q_bollinger_20(spark, sf_dir)
    mid_ok = bb.filter(
        (F.col("mid") < F.col("lower")) | (F.col("mid") > F.col("upper"))
    ).count()
    assert mid_ok == 0
    n = bb.count()
    breakouts = bb.filter("breakout").count()
    assert breakouts / n < 0.2  # 2σ bands: breakouts are the tail


def test_cusum_keyless_two_level_matches_keyed(spark):
    """Keyless CUSUM (one global series) runs the two-level bucketed scan;
    it must equal the keyed path with a constant key across day-bucket
    boundaries (the closed-form S = P − min(0, min P) decomposed into
    per-bucket windows + a calendar-sized summary carry)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cerebro_spark.operators.tsdb import cusum

    # 300 samples spread over 4 days (crosses bucket boundaries), with a
    # planted level shift that drives S up in the last day
    rows = []
    for i in range(300):
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=20 * i)
        v = 5.0 + (i % 7) * 0.1 + (3.0 if i > 240 else 0.0)
        rows.append((i, ts, v))
    df = spark.createDataFrame(rows, ["id", "ts", "v"])

    keyless = cusum(df, "v", "ts", keys=[], tiebreak=["id"])
    keyed = cusum(
        df.withColumn("k", F.lit(1)), "v", "ts", keys=["k"], tiebreak=["id"]
    )
    got = {r["id"]: (r["cusum"], r["is_alert"]) for r in keyless.collect()}
    want = {r["id"]: (r["cusum"], r["is_alert"]) for r in keyed.collect()}
    assert got == want
    assert any(a for _, a in got.values())  # the shift actually alerts
    # plan shape: merged-row windows partition by the day bucket
    plan = keyless._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" in plan


def test_psi_drift_zero_for_identical_halves(spark):
    from cerebro_spark.operators.tsdb import psi_drift

    rows = [(i, _t(i), (i % 10) / 10.0) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    out = psi_drift(df, "v", "ts", keys=[]).collect()[0]
    # identical early/late distributions -> psi ~ 0 (exactly 0 up to the
    # n_early/n_late denominator mismatch, which is 0 here: 100/100 split)
    assert out["n_early"] == 100 and out["n_late"] == 100
    assert abs(out["psi"]) < 1e-6


def test_psi_drift_detects_mass_shift(spark):
    from cerebro_spark.operators.tsdb import psi_drift

    # early ~ U[0,1), late all piled at 0.95: big PSI
    rows = [(i, _t(i), (i % 10) / 10.0) for i in range(100)] + [
        (i, _t(i), 0.95) for i in range(100, 200)
    ]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    out = psi_drift(df, "v", "ts", keys=[]).collect()[0]
    assert out["psi"] > 1.0


def test_psi_drift_late_values_outside_reference_span_clamp(spark):
    from cerebro_spark.operators.tsdb import psi_drift

    # late values far outside the early span must land in the edge bins,
    # not crash or create bins outside 0..9
    rows = [(i, _t(i), float(i % 5)) for i in range(50)] + [
        (i, _t(i), 1e6 if i % 2 else -1e6) for i in range(50, 100)
    ]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    out = psi_drift(df, "v", "ts", keys=[]).collect()[0]
    assert out["n_late"] == 50 and out["psi"] > 0.5


def test_theil_sen_exact_on_clean_line(spark):
    from cerebro_spark.operators.tsdb import theil_sen

    # v = 3 + 2*day, two points per day -> every pairwise slope is 2.0
    rows = []
    for day in range(10):
        for j in (0, 1):
            rows.append((day * 2 + j, _t(day * 86400 + j), 3.0 + 2.0 * day))
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    out = theil_sen(df, "v", "ts", keys=[]).collect()[0]
    assert out["slope_med"] == 2.0
    assert out["n_pairs"] == 45  # C(10,2)


def test_theil_sen_ignores_outlier_day(spark):
    from cerebro_spark.operators.tsdb import theil_sen

    # one wrecked day cannot move the median slope (OLS would shift)
    rows = [(d, _t(d * 86400), 1.0 * d) for d in range(11)]
    rows[5] = (5, _t(5 * 86400), 1e5)
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    out = theil_sen(df, "v", "ts", keys=[]).collect()[0]
    assert out["slope_med"] == 1.0


def test_theil_sen_even_pair_count_median_is_middle_average(spark):
    from cerebro_spark.operators.tsdb import theil_sen

    # days 0,1,2,3 with means 0, 1, 4, 5: slopes {1,2,5/3,3,2,1} sorted
    # [1,1,5/3,2,2,3] -> median = (5/3+2)/2
    means = {0: 0.0, 1: 1.0, 2: 4.0, 3: 5.0}
    rows = [(d, _t(d * 86400), m) for d, m in means.items()]
    df = spark.createDataFrame(rows, ["id", "ts", "v"])
    out = theil_sen(df, "v", "ts", keys=[]).collect()[0]
    assert out["n_pairs"] == 6
    assert abs(out["slope_med"] - (5.0 / 3.0 + 2.0) / 2) < 1e-12


def test_mann_kendall_exact_small_cases(spark):
    import datetime as dt

    from cerebro_spark.operators.tsdb import mann_kendall

    t = lambda d: dt.datetime(2024, 1, 1) + dt.timedelta(days=d)  # noqa: E731
    # strictly increasing 5 buckets: S = C(5,2) = 10, Var = 5*4*15/18
    inc = spark.createDataFrame(
        [(t(d), float(d)) for d in range(5)], "ts timestamp, value double"
    )
    r = mann_kendall(inc, "value", "ts", keys=[]).collect()[0]
    assert r["s_stat"] == 10 and abs(r["var_s"] - 300 / 18) < 1e-12
    assert abs(r["z"] - 9 / (300 / 18) ** 0.5) < 1e-12
    # tie pair: means [1,1,2] -> S=2, Var = (66 - 18)/18
    tie = spark.createDataFrame(
        [(t(0), 1.0), (t(1), 1.0), (t(2), 2.0)], "ts timestamp, value double"
    )
    r2 = mann_kendall(tie, "value", "ts", keys=[]).collect()[0]
    assert r2["s_stat"] == 2 and abs(r2["var_s"] - 48 / 18) < 1e-12
    # decreasing -> symmetric negative z
    dec = spark.createDataFrame(
        [(t(d), float(-d)) for d in range(5)], "ts timestamp, value double"
    )
    r3 = mann_kendall(dec, "value", "ts", keys=[]).collect()[0]
    assert r3["s_stat"] == -10 and abs(r3["z"] + r["z"]) < 1e-12


def test_moments_profile_matches_hand_moments(spark):
    from cerebro_spark.operators.profile import moments_profile

    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = moments_profile(df, "value", keys=[]).collect()[0]
    n = len(vals)
    mean = sum(vals) / n
    m2 = sum((v - mean) ** 2 for v in vals) / n
    m3 = sum((v - mean) ** 3 for v in vals) / n
    m4 = sum((v - mean) ** 4 for v in vals) / n
    assert out["mean"] == mean and abs(out["var_pop"] - m2) < 1e-5
    assert abs(out["skewness"] - m3 / (m2 * m2**0.5)) < 1e-4
    assert abs(out["kurtosis"] - m4 / (m2 * m2)) < 1e-4


def test_moments_profile_symmetric_distribution_zero_skew(spark):
    from cerebro_spark.operators.profile import moments_profile

    vals = [-2.0, -1.0, 0.0, 1.0, 2.0] * 10
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    out = moments_profile(df, "value", keys=[]).collect()[0]
    assert out["skewness"] == 0.0 and out["mean"] == 0.0
