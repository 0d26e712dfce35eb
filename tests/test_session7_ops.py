"""Round-6 session-7 operator batch tests."""
import math

import pytest
from pyspark.sql import functions as F

from cerebro_spark.operators.joins import spatial_grid_join


def _pts(spark, rows, schema="id long, x double, y double"):
    return spark.createDataFrame(rows, schema)


def test_spatial_grid_join_matches_bruteforce(spark):
    # deterministic scatter incl. cell-border and corner cases
    left = [(i, float((i * 7) % 50) / 3.0, float((i * 13) % 50) / 3.0) for i in range(60)]
    right = [(j, float((j * 11) % 50) / 3.0, float((j * 17) % 50) / 3.0) for j in range(60)]
    r = 1.5
    got = {
        (row["l_id"], row["r_id"])
        for row in spatial_grid_join(
            _pts(spark, left).withColumnRenamed("id", "l_id"),
            _pts(spark, right).withColumnRenamed("id", "r_id"),
            "x", "y", r,
        ).collect()
    }
    expect = {
        (i, j)
        for (i, xi, yi) in left
        for (j, xj, yj) in right
        if (xi - xj) ** 2 + (yi - yj) ** 2 <= r * r
    }
    assert got == expect and len(expect) > 50


def test_spatial_grid_join_exact_radius_boundary(spark):
    # distance exactly r is INCLUDED (<=); just beyond excluded
    left = [(1, 0.0, 0.0)]
    right = [(10, 3.0, 4.0), (11, 3.0, 4.0001)]
    out = spatial_grid_join(
        _pts(spark, left).withColumnRenamed("id", "l_id"),
        _pts(spark, right).withColumnRenamed("id", "r_id"),
        "x", "y", 5.0,
    ).collect()
    assert [(r["r_id"], r["dist"]) for r in out] == [(10, 5.0)]


def test_spatial_grid_join_each_pair_once(spark):
    # points sharing a location: every pair exactly once, dist 0
    left = [(i, 2.0, 2.0) for i in range(3)]
    right = [(j, 2.0, 2.0) for j in range(4)]
    out = spatial_grid_join(
        _pts(spark, left).withColumnRenamed("id", "l_id"),
        _pts(spark, right).withColumnRenamed("id", "r_id"),
        "x", "y", 1.0,
    ).collect()
    assert len(out) == 12
    assert all(r["dist"] == 0.0 for r in out)


def test_spatial_grid_join_hot_cell_cap(spark):
    dense = [(i, 5.0, 5.0) for i in range(100)]
    sparse = [(1000, 50.0, 50.0)]
    right = [(2000, 5.1, 5.1), (2001, 50.1, 50.1)]
    out = spatial_grid_join(
        _pts(spark, dense + sparse).withColumnRenamed("id", "l_id"),
        _pts(spark, right).withColumnRenamed("id", "r_id"),
        "x", "y", 1.0, max_cell_size=10,
    ).collect()
    # the 100-point cell is dropped; the sparse cell survives
    assert [(r["l_id"], r["r_id"]) for r in out] == [(1000, 2001)]


# ---------------------------------------------------------------------------
# top_paths
# ---------------------------------------------------------------------------

def test_top_paths_orders_and_truncates(spark):
    from cerebro_spark.operators.timeops import top_paths

    rows = []
    # user 1 day 0: a,b,c,d,e (5 events -> truncated to a>b>c>d)
    for i, e in enumerate("abcde"):
        rows.append((1, e, float(i), i))
    # user 2 day 0: same first four in SAME timestamps but shuffled ids ->
    # id tiebreak must order deterministically
    rows += [(2, "b", 0.0, 11), (2, "a", 0.0, 10), (2, "d", 1.0, 13), (2, "c", 1.0, 12)]
    # user 1 day 1: x alone
    rows.append((1, "x", 86400.0 + 5, 99))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts double, event_id long")
    out = {r["path"]: r["n_sessions"] for r in top_paths(df).collect()}
    assert out == {"a>b>c>d": 2, "x": 1}


def test_top_paths_topk_total_order(spark):
    from cerebro_spark.operators.timeops import top_paths

    rows = []
    for u in range(6):
        rows.append((u, "z" if u % 2 else "a", 0.0, u))
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts double, event_id long")
    out = top_paths(df, top_k=1).collect()
    assert [(r["path"], r["n_sessions"]) for r in out] == [("a", 3)]


# ---------------------------------------------------------------------------
# l_diversity
# ---------------------------------------------------------------------------

def test_l_diversity_uniform_group_entropy_equals_distinct(spark):
    from cerebro_spark.operators.profile import l_diversity

    # group g1: 4 values x 3 rows each (uniform) -> l_distinct=4, l_entropy=4
    # group g2: one value only -> l=1, entropy-l=1 (fully disclosing, ranks first)
    rows = [("g1", v) for v in [1, 2, 3, 4] * 3] + [("g2", 9)] * 5
    df = spark.createDataFrame(rows, "g string, s long")
    out = l_diversity(df, [F.col("g")], "s").collect()
    assert [r["qi_0"] for r in out] == ["g2", "g1"]
    g2, g1 = out[0], out[1]
    assert (g2["l_distinct"], g2["l_entropy"]) == (1, 1.0)
    assert g1["l_distinct"] == 4
    assert g1["l_entropy"] == pytest.approx(4.0, abs=1e-4)


def test_l_diversity_skewed_entropy_below_distinct(spark):
    from cerebro_spark.operators.profile import l_diversity

    # 97 of one value, 1 each of three others: distinct 4, effective ~1.2
    rows = [("g", 0)] * 97 + [("g", 1), ("g", 2), ("g", 3)]
    df = spark.createDataFrame(rows, "g string, s long")
    r = l_diversity(df, [F.col("g")], "s").collect()[0]
    assert r["l_distinct"] == 4
    h = -(0.97 * math.log(0.97) + 3 * 0.01 * math.log(0.01))
    assert r["l_entropy"] == pytest.approx(math.exp(h), abs=1e-3)
    assert r["l_entropy"] < 2.0


def test_l_diversity_accepts_string_colnames(spark):
    # qi_cols takes names or Columns, same contract as k_anonymity (ADVICE r6)
    from cerebro_spark.operators.profile import l_diversity

    rows = [("g1", v) for v in [1, 2, 3, 4] * 3] + [("g2", 9)] * 5
    df = spark.createDataFrame(rows, "g string, s long")
    by_name = l_diversity(df, ["g"], "s").collect()
    by_col = l_diversity(df, [F.col("g")], "s").collect()
    assert by_name == by_col


def test_l_diversity_null_sensitive_excluded(spark):
    from cerebro_spark.operators.profile import l_diversity

    rows = [("g", 1), ("g", None), ("g", 2)]
    df = spark.createDataFrame(rows, "g string, s string")
    r = l_diversity(df, [F.col("g")], "s").collect()[0]
    assert r["n"] == 2 and r["l_distinct"] == 2


# ---------------------------------------------------------------------------
# time_decay_attribution
# ---------------------------------------------------------------------------

def test_time_decay_attribution_halflife_weights(spark):
    from cerebro_spark.operators.timeops import time_decay_attribution

    # purchase at t=2d; view 1 halflife before (w=0.5), click 2 before (w=0.25)
    rows = [
        (1, "view", 86400.0),
        (1, "click", 0.0),
        (1, "purchase", 2 * 86400.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts double")
    out = {r["channel"]: r for r in time_decay_attribution(df).collect()}
    assert out["view"]["weight"] == pytest.approx(0.5, abs=1e-6)
    assert out["click"]["weight"] == pytest.approx(0.25, abs=1e-6)
    assert out["view"]["share"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["click"]["share"] == pytest.approx(1 / 3, abs=1e-6)


def test_time_decay_attribution_lookback_and_future_excluded(spark):
    from cerebro_spark.operators.timeops import time_decay_attribution

    rows = [
        (1, "view", 0.0),                 # 8 days before -> outside lookback
        (1, "click", 9 * 86400.0),        # after the purchase -> excluded
        (1, "view", 8 * 86400.0 - 10.0),  # just inside
        (1, "purchase", 8 * 86400.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts double")
    out = time_decay_attribution(df).collect()
    assert len(out) == 1
    assert out[0]["channel"] == "view" and out[0]["touches"] == 1
    assert out[0]["share"] == 1.0


def test_time_decay_attribution_multi_conversion_touch_counted_per_pair(spark):
    from cerebro_spark.operators.timeops import time_decay_attribution

    # one touch before TWO purchases earns credit twice (pair-level model)
    rows = [
        (1, "view", 0.0),
        (1, "purchase", 86400.0),
        (1, "purchase", 2 * 86400.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, ts double")
    out = time_decay_attribution(df).collect()[0]
    assert out["touches"] == 2
    assert out["weight"] == pytest.approx(0.75, abs=1e-6)


# ---------------------------------------------------------------------------
# js_divergence
# ---------------------------------------------------------------------------

def test_js_divergence_identical_groups_zero(spark):
    from cerebro_spark.operators.profile import js_divergence

    rows = [(g, b) for g in ("s1", "s2") for b in (0, 1) for _ in range(10)]
    df = spark.createDataFrame(rows, "g string, b long")
    out = js_divergence(df, "g", "b").collect()
    assert all(r["js"] == 0.0 for r in out)


def test_js_divergence_disjoint_supports_textbook_value(spark):
    from cerebro_spark.operators.profile import js_divergence

    # s1 only bucket 0, s2 only bucket 1, equal sizes: q = (1/2, 1/2);
    # JS(p||q) for p=(1,0): 1/2*[1*ln(2*1/1.5) + 1/2*ln(2*.5/1.5) + 1/2*ln(2*.5/.5)]
    rows = [("s1", 0)] * 10 + [("s2", 1)] * 10
    df = spark.createDataFrame(rows, "g string, b long")
    out = {r["group"]: r["js"] for r in js_divergence(df, "g", "b").collect()}
    expect = 0.5 * (
        1.0 * math.log(2 * 1.0 / 1.5)
        + 0.5 * math.log(2 * 0.5 / 1.5)
        + 0.5 * math.log(2 * 0.5 / 0.5)
    )
    for g in ("s1", "s2"):
        assert out[g] == pytest.approx(expect, abs=1e-6)
    assert expect > 0.2  # bounded by ln2, meaningfully large here


def test_js_divergence_orders_most_drifted_first(spark):
    from cerebro_spark.operators.profile import js_divergence

    rows = (
        [("norm", b % 4) for b in range(40)]        # uniform over 0-3
        + [("same", b % 4) for b in range(40)]      # also uniform
        + [("odd", 9)] * 10                          # all in its own bucket
    )
    df = spark.createDataFrame(rows, "g string, b long")
    out = js_divergence(df, "g", "b").collect()
    assert out[0]["group"] == "odd"
    assert out[0]["js"] > out[1]["js"]


# ---------------------------------------------------------------------------
# info_gain_ranking
# ---------------------------------------------------------------------------

def test_info_gain_perfect_vs_independent_feature(spark):
    from cerebro_spark.operators.profile import info_gain_ranking

    # f_good determines the label exactly; f_noise is independent of it
    rows = [(i, "L%d" % (i % 2), "G%d" % (i % 2), "N%d" % ((i // 2) % 2))
            for i in range(40)]
    df = spark.createDataFrame(rows, "id long, label string, good string, noise string")
    out = {r["feature"]: r for r in info_gain_ranking(
        df, {"good": F.col("good"), "noise": F.col("noise")}, "label"
    ).collect()}
    assert out["good"]["mi_nats"] == pytest.approx(math.log(2), abs=1e-5)
    assert out["good"]["gain_ratio"] == pytest.approx(1.0, abs=1e-5)
    assert out["noise"]["mi_nats"] == pytest.approx(0.0, abs=1e-5)


def test_info_gain_orders_by_mi_and_handles_feature_nulls(spark):
    from cerebro_spark.operators.profile import info_gain_ranking

    rows = []
    for i in range(32):
        label = "L%d" % (i % 4)
        full = "F%d" % (i % 4)          # 2 bits
        half = "H%d" % (i % 2)          # 1 bit
        rows.append((label, full, half if i % 8 else None))
    df = spark.createDataFrame(rows, "label string, full string, half string")
    out = info_gain_ranking(df, {"full": F.col("full"), "half": F.col("half")}, "label").collect()
    assert [r["feature"] for r in out] == ["full", "half"]
    # the half feature's complete-case n excludes its NULL rows only
    assert out[0]["n"] == 32
    assert out[1]["n"] == 28


# ---------------------------------------------------------------------------
# quantile_normalize
# ---------------------------------------------------------------------------

def test_quantile_normalize_identical_groups_map_to_self(spark):
    from cerebro_spark.operators.profile import quantile_normalize

    rows = [(g, float(v)) for g in ("a", "b") for v in (1, 2, 3, 4) for _ in range(5)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize(df, "g", "v", 1.0).collect()
    # both groups already share the corpus distribution -> identity map
    assert all(r["mapped_value"] == float(r["q"]) for r in out)


def test_quantile_normalize_shifted_group_aligns(spark):
    from cerebro_spark.operators.profile import quantile_normalize

    # group a holds {0,1,2,3}, group b the same shape shifted +100:
    # after normalization b's cells land on corpus quantiles, and the
    # two groups map rank-for-rank to the SAME values
    rows = [("a", float(v)) for v in range(4) for _ in range(10)]
    rows += [("b", float(v + 100)) for v in range(4) for _ in range(10)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {(r["group"], r["q"]): r for r in quantile_normalize(df, "g", "v", 1.0).collect()}
    for i in range(4):
        assert out[("a", i)]["rank_target"] == out[("b", i + 100)]["rank_target"]
        assert out[("a", i)]["mapped_value"] == out[("b", i + 100)]["mapped_value"]


def test_quantile_normalize_midrank_formula(spark):
    from cerebro_spark.operators.profile import quantile_normalize

    # single group: cell with cnt=4 starting at cum_before=0 of ng=10,
    # corpus n=10 -> midrank (2*4-4+1+ ... ) -> r=(2*cum-cnt+1)/2 = 2.5,
    # R = ceil(2.5/10*10) = ceil(2.5) = 3
    rows = [("a", 0.0)] * 4 + [("a", 1.0)] * 6
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["q"]: r for r in quantile_normalize(df, "g", "v", 1.0).collect()}
    assert out[0]["rank_target"] == 3
    # second cell: cum=10, cnt=6 -> rnum=2*10-6+1=15 -> R=ceil(7.5)=8 -> maps to q=1
    assert out[1]["rank_target"] == 8
    assert out[1]["mapped_value"] == 1.0


# ---------------------------------------------------------------------------
# streaming_msprt (batch-side semantics of the state function)
# ---------------------------------------------------------------------------

def test_msprt_state_fn_cumulates_exactly():
    import pandas as pd

    from cerebro_spark.streaming.stateful import _msprt_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None
        @property
        def get(self):
            return self._v
        def update(self, v):
            self._v = tuple(v)
            self.exists = True

    fn = _msprt_fn(0, 1)
    st = FakeState()
    pdf = pd.DataFrame({
        "day": [0, 0, 1, 1, 1],
        "arm": [0, 1, 0, 1, 0],
        "q": [100, 200, 300, 400, 500],
        "ts": pd.to_datetime([0, 1, 2, 3, 4], unit="s"),
        "__exp": [1] * 5,
    })
    out = pd.concat(list(fn((1,), iter([pdf]), st)))
    assert list(out["day"]) == [0, 1]
    d1 = out[out["day"] == 1].iloc[0]
    assert (d1["na"], d1["sa"], d1["ssa"]) == (3, 900, 350000)
    assert (d1["nb"], d1["sb"], d1["ssb"]) == (2, 600, 200000)
    # second batch resumes from state
    pdf2 = pd.DataFrame({
        "day": [2], "arm": [1], "q": [10],
        "ts": pd.to_datetime([5], unit="s"), "__exp": [1],
    })
    out2 = pd.concat(list(fn((1,), iter([pdf2]), st)))
    d2 = out2.iloc[0]
    assert (d2["nb"], d2["sb"], d2["ssb"]) == (3, 610, 200100)
    assert (d2["na"], d2["sa"], d2["ssa"]) == (3, 900, 350000)


# ---------------------------------------------------------------------------
# scd2_snapshot_at
# ---------------------------------------------------------------------------

def test_scd2_snapshot_exactly_one_version_per_key(spark):
    from cerebro_spark.operators.profile import scd2_collapse, scd2_snapshot_at

    rows = [
        (1, "a", 0.0, 1), (1, "b", 100.0, 2), (1, "c", 200.0, 3),
        (2, "x", 50.0, 4),
    ]
    df = spark.createDataFrame(rows, "k long, attr string, ts double, id long")
    iv = scd2_collapse(df, ["k"], ["attr"], "ts", ["id"])
    # at t=150: user 1 is in version b (100 <= 150 < 200); user 2 in x
    snap = {r["k"]: r["attr"] for r in scd2_snapshot_at(iv, 150.0).collect()}
    assert snap == {1: "b", 2: "x"}
    # boundary: at exactly t=200 the interval is half-open -> version c
    snap2 = {r["k"]: r["attr"] for r in scd2_snapshot_at(iv, 200.0).collect()}
    assert snap2[1] == "c"
    # before any history for key 2
    snap3 = {r["k"]: r["attr"] for r in scd2_snapshot_at(iv, 10.0).collect()}
    assert snap3 == {1: "a"}


# ---------------------------------------------------------------------------
# ols_trend
# ---------------------------------------------------------------------------

def test_ols_trend_exact_line(spark):
    from cerebro_spark.operators.tsdb import ols_trend

    # y = 2*day + 5 exactly -> slope 2/day, intercept 5, r2 = 1
    rows = [("k", float(d * 86400), 2.0 * d + 5.0) for d in range(10)]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    r = ols_trend(df, "v", "t", ["k"]).collect()[0]
    assert r["slope_per_day"] == pytest.approx(2.0, abs=1e-6)
    assert r["intercept"] == pytest.approx(5.0, abs=1e-6)
    assert r["r2"] == pytest.approx(1.0, abs=1e-6)


def test_ols_trend_textbook_scatter(spark):
    from cerebro_spark.operators.tsdb import ols_trend

    # x in seconds 0..4, y = [1, 3, 2, 5, 4]: verify vs numpy polyfit
    ys = [1.0, 3.0, 2.0, 5.0, 4.0]
    rows = [("k", float(i), y) for i, y in enumerate(ys)]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    r = ols_trend(df, "v", "t", ["k"]).collect()[0]
    import numpy as np

    slope_sec, intercept = np.polyfit(np.arange(5.0), np.array(ys), 1)
    assert r["slope_per_day"] == pytest.approx(slope_sec * 86400, abs=1e-4)
    assert r["intercept"] == pytest.approx(intercept, abs=1e-5)
    assert 0 < r["r2"] < 1


def test_ols_trend_degenerate_null(spark):
    from cerebro_spark.operators.tsdb import ols_trend

    rows = [("one", 0.0, 1.0), ("flatx", 5.0, 1.0), ("flatx", 5.0, 2.0)]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    out = {r["k"]: r for r in ols_trend(df, "v", "t", ["k"]).collect()}
    assert out["one"]["slope_per_day"] is None      # n < 2
    assert out["flatx"]["slope_per_day"] is None    # zero x-variance


# ---------------------------------------------------------------------------
# table_fingerprint
# ---------------------------------------------------------------------------

def test_table_fingerprint_order_and_partition_invariant(spark):
    from cerebro_spark.operators.profile import table_fingerprint

    rows = [(i, "v%d" % (i % 3)) for i in range(100)]
    a = spark.createDataFrame(rows, "id long, v string")
    b = spark.createDataFrame(list(reversed(rows)), "id long, v string").repartition(7)
    fa = {r["bucket"]: (r["n"], r["checksum"]) for r in table_fingerprint(a, ["id", "v"], 16).collect()}
    fb = {r["bucket"]: (r["n"], r["checksum"]) for r in table_fingerprint(b, ["id", "v"], 16).collect()}
    assert fa == fb and sum(n for n, _ in fa.values()) == 100


def test_table_fingerprint_detects_single_row_change(spark):
    from cerebro_spark.operators.profile import table_fingerprint

    rows = [(i, "x") for i in range(50)]
    a = spark.createDataFrame(rows, "id long, v string")
    b = spark.createDataFrame(rows[:-1] + [(49, "y")], "id long, v string")
    fa = {r["bucket"]: r["checksum"] for r in table_fingerprint(a, ["id", "v"], 8).collect()}
    fb = {r["bucket"]: r["checksum"] for r in table_fingerprint(b, ["id", "v"], 8).collect()}
    diff = {k for k in set(fa) | set(fb) if fa.get(k) != fb.get(k)}
    assert 1 <= len(diff) <= 2  # the old row's bucket and/or the new row's


def test_table_fingerprint_null_vs_empty_distinct(spark):
    from cerebro_spark.operators.profile import table_fingerprint

    a = spark.createDataFrame([(None, "x")], "a string, b string")
    b = spark.createDataFrame([("", "x")], "a string, b string")
    fa = table_fingerprint(a, ["a", "b"], 1).collect()[0]["checksum"]
    fb = table_fingerprint(b, ["a", "b"], 1).collect()[0]["checksum"]
    assert fa != fb  # the NULL sentinel keeps them apart


# ---------------------------------------------------------------------------
# column_profile
# ---------------------------------------------------------------------------

def test_column_profile_counts_and_extremes(spark):
    from cerebro_spark.operators.profile import column_profile

    rows = [(1, "a"), (2, None), (3, "c"), (3, "a")]
    df = spark.createDataFrame(rows, "id long, s string")
    out = {r["column"]: r for r in column_profile(
        df, {"id": F.col("id"), "s": F.col("s")}
    ).collect()}
    assert out["id"]["n_rows"] == 4
    assert out["id"]["n_null"] == 0
    assert out["id"]["n_distinct"] == 3
    assert (out["id"]["min_value"], out["id"]["max_value"]) == ("1", "3")
    assert out["s"]["n_nonnull"] == 3
    assert out["s"]["n_null"] == 1
    assert out["s"]["n_distinct"] == 2
    assert (out["s"]["min_value"], out["s"]["max_value"]) == ("a", "c")


# ---------------------------------------------------------------------------
# log_templates
# ---------------------------------------------------------------------------

def test_log_templates_masks_varying_positions(spark):
    from cerebro_spark.operators.text import log_templates

    rows = [
        (1, "GET /users/1 200"),
        (2, "GET /users/7 200"),
        (3, "GET /users/9 500"),
        (4, "POST /login ok done"),   # different (n, first) group
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["template"]: r["n_messages"] for r in log_templates(df).collect()}
    assert out == {"GET <*> <*>": 3, "POST /login ok done": 1}


def test_log_templates_groups_by_count_and_first(spark):
    from cerebro_spark.operators.text import log_templates

    rows = [
        (1, "a x"),
        (2, "a x y"),   # same first token, different length -> other group
        (3, "b x"),     # same length, different first token -> other group
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["template"] for r in log_templates(df).collect()}
    assert out == {"a x", "a x y", "b x"}


def test_log_templates_caps_pathological_lines(spark):
    from cerebro_spark.operators.text import log_templates

    rows = [(1, "short line"), (2, " ".join(["t"] * 500))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = log_templates(df, max_tokens=100).collect()
    assert [r["template"] for r in out] == ["short line"]


# ---------------------------------------------------------------------------
# change_contribution
# ---------------------------------------------------------------------------

def test_change_contribution_slices_sum_to_total(spark):
    from cerebro_spark.operators.profile import change_contribution

    # early half: a=10/day, b=10/day; late half: a=30/day (a drove it all)
    rows = []
    for d in range(10):
        early = d < 5
        rows.append((float(d * 86400), "a", 10.0 if early else 30.0))
        rows.append((float(d * 86400), "b", 10.0))
    df = spark.createDataFrame(rows, "t double, g string, v double")
    out = {r["dim_value"]: r for r in change_contribution(
        df, {"g": F.col("g")}, "v", "t", top_k=10
    ).collect()}
    assert out["a"]["delta"] == pytest.approx(100.0, abs=1e-6)
    assert out["b"]["delta"] == pytest.approx(0.0, abs=1e-6)
    assert out["a"]["share"] == pytest.approx(1.0, abs=1e-6)
    assert out["b"]["share"] == pytest.approx(0.0, abs=1e-6)
    # decomposition identity: slice deltas sum to the total change
    assert sum(r["delta"] for r in out.values()) == pytest.approx(100.0, abs=1e-6)


def test_change_contribution_zero_total_share_null(spark):
    from cerebro_spark.operators.profile import change_contribution

    rows = [(0.0, "a", 5.0), (86400.0, "a", 5.0)]
    df = spark.createDataFrame(rows, "t double, g string, v double")
    r = change_contribution(df, {"g": F.col("g")}, "v", "t").collect()[0]
    assert r["delta"] == 0.0 and r["share"] is None


# ---------------------------------------------------------------------------
# trending_topk / weighted_sample_exact_k
# ---------------------------------------------------------------------------

def test_trending_topk_rank_and_share(spark):
    from cerebro_spark.operators.timeops import trending_topk

    rows = [(0.0, "a")] * 5 + [(0.0, "b")] * 3 + [(0.0, "c")] * 2 + [(86400.0, "b")]
    df = spark.createDataFrame(rows, "t double, item string")
    out = {(r["bucket"], r["rank"]): r for r in trending_topk(df, "item", "t", 86400, 2).collect()}
    assert out[(0, 1)]["item"] == "a" and out[(0, 1)]["share"] == 0.5
    assert out[(0, 2)]["item"] == "b" and out[(0, 2)]["n"] == 3
    assert (0, 3) not in out                     # k=2 cutoff
    assert out[(1, 1)]["item"] == "b" and out[(1, 1)]["share"] == 1.0


def test_weighted_sample_exact_k_properties(spark):
    import hashlib
    import math

    from cerebro_spark.operators.sampling import weighted_sample_exact_k

    rows = [(i, float((i % 10) + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r["id"] for r in weighted_sample_exact_k(df, "w", "id", 20).collect()]
    assert len(got) == len(set(got)) == 20       # exactly k, no replacement

    # matches the pure-Python Efraimidis-Spirakis ranking
    def key(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) + 1.0) / 2.0 ** 52
        return math.log(u) / w

    expect = sorted(rows, key=lambda r: (-key(r[0], r[1]), r[0]))[:20]
    assert sorted(got) == sorted(i for i, _ in expect)


def test_weighted_sample_exact_k_excludes_nonpositive(spark):
    from cerebro_spark.operators.sampling import weighted_sample_exact_k

    rows = [(1, 0.0), (2, -1.0), (3, None), (4, 5.0)]
    df = spark.createDataFrame(rows, "id long, w double")
    out = weighted_sample_exact_k(df, "w", "id", 10).collect()
    assert [r["id"] for r in out] == [4]


# ---------------------------------------------------------------------------
# property tests: binseg vs brute-force argmax; spatial join vs brute force
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HYP = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_HYP)
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=4, max_size=40),
)
def test_binseg_level1_matches_bruteforce(spark, vals):
    from cerebro_spark.operators.tsdb import binseg_changepoints

    rows = [("k", float(h * 3600), float(v)) for h, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, t double, v double")
    out = [r for r in binseg_changepoints(df, "v", "t", ["k"], 3600, 2).collect()
           if r["level"] == 1]
    # brute force over the integer e6 bucket means (one reading per bucket)
    m = [v * 10**6 for v in vals]
    T, S = len(m), sum(m)
    best = None
    for i in range(2, T - 1):
        P = sum(m[:i])
        a = P * P * (T - i) + (S - P) ** 2 * i
        score = a / (i * (T - i))
        # exact IEEE comparison: python computes the identical double
        if best is None or score > best[0]:
            best = (score, i)
    if best is None:
        assert out == []
        return
    assert len(out) == 1
    assert out[0]["n_left"] == best[1]


@settings(**_HYP)
@given(
    pts=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1, max_size=25,
    ),
    r10=st.integers(5, 40),
)
def test_spatial_grid_join_bruteforce_parity(spark, pts, r10):
    from cerebro_spark.operators.joins import spatial_grid_join

    r = r10 / 10.0
    left = [(i, x / 3.0, y / 3.0) for i, (x, y) in enumerate(pts)]
    right = [(j + 1000, y / 3.0, x / 3.0) for j, (x, y) in enumerate(pts)]
    ldf = spark.createDataFrame(left, "l_id long, x double, y double")
    rdf = spark.createDataFrame(right, "r_id long, x double, y double")
    got = {(row["l_id"], row["r_id"])
           for row in spatial_grid_join(ldf, rdf, "x", "y", r).collect()}
    expect = {(i, j) for (i, xi, yi) in left for (j, xj, yj) in right
              if (xi - xj) ** 2 + (yi - yj) ** 2 <= r * r}
    assert got == expect


@settings(**_HYP)
@given(
    vals=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(-50, 50)),
        min_size=2, max_size=60,
    ),
)
def test_quantile_normalize_matches_python_midrank_reference(spark, vals):
    from cerebro_spark.operators.profile import quantile_normalize

    df = spark.createDataFrame(
        [(g, float(v)) for g, v in vals], "g string, v double"
    )
    got = {(r["group"], r["q"]): (r["rank_target"], r["mapped_value"])
           for r in quantile_normalize(df, "g", "v", 1.0).collect()}

    # pure-Python reference: integer midranks -> ceil target rank ->
    # global value at that rank
    from collections import Counter

    by_g = {}
    for g, v in vals:
        by_g.setdefault(g, []).append(v)
    gcnt = Counter(v for _, v in vals)
    gvals = sorted(gcnt)
    n = len(vals)
    # global rank ranges
    lo = {}
    c = 0
    for q in gvals:
        lo[q] = c + 1
        c += gcnt[q]

    def value_at_rank(r):
        for q in gvals:
            if lo[q] <= r <= lo[q] + gcnt[q] - 1:
                return q
        raise AssertionError(r)

    import math

    expect = {}
    for g, xs in by_g.items():
        cnt = Counter(xs)
        ng = len(xs)
        cum = 0
        for q in sorted(cnt):
            cum += cnt[q]
            rnum = 2 * cum - cnt[q] + 1
            rk = math.ceil(rnum * n / (2 * ng))
            expect[(g, q)] = (rk, float(value_at_rank(rk)))
    assert got == expect
