"""Round-6 session-6 operator batch: binary-segmentation changepoints,
lead-lag cross-correlation, Adamic-Adar link prediction, leakage-safe
K-fold target encoding, Johnson-Lindenstrauss sign projection, and the
always-valid mSPRT sequential A/B monitor.

Cross-engine value checks live in the oracle gates (``changepoints_value``
etc.); these tests pin SEMANTICS on hand-built inputs where the right
answer is computable by hand or a tiny pure-Python reference.
"""

import math

import pytest
from pyspark.sql import functions as F

from cerebro_spark.operators.cluster import adamic_adar
from cerebro_spark.operators.profile import msprt_monitor
from cerebro_spark.operators.sampling import kfold_target_encode
from cerebro_spark.operators.similarity import jl_project, jl_sign_matrix
from cerebro_spark.operators.tsdb import binseg_changepoints, cross_corr


# ---------------------------------------------------------------------------
# binary-segmentation changepoints
# ---------------------------------------------------------------------------

def _step_series(spark, levels, per=10, key="k"):
    """One reading per hour; level changes every ``per`` hours."""
    rows = []
    h = 0
    for lv in levels:
        for _ in range(per):
            rows.append((key, float(h * 3600), float(lv)))
            h += 1
    return spark.createDataFrame(rows, "key string, t double, v double")


def test_binseg_finds_the_planted_step(spark):
    # 10 hours at 0.0 then 10 hours at 100.0 -> the ONLY split that zeroes
    # the SSE is after bucket index 10 (bucket id 9)
    df = _step_series(spark, [0.0, 100.0])
    out = binseg_changepoints(df, "v", "t", ["key"], 3600, 2).collect()
    l1 = [r for r in out if r["level"] == 1][0]
    assert l1["split_bucket"] == 9
    assert l1["n_left"] == 10 and l1["n_right"] == 10
    # SSE reduction of the mean series: total SSE = 20*(50^2) = 50000,
    # residual 0 -> gain = 50000
    assert l1["gain"] == pytest.approx(50000.0, abs=1e-3)


def test_binseg_level2_finds_the_nested_steps(spark):
    # four levels: 0,100 | 200,300 -> level-1 splits the middle, level-2
    # finds each half's internal step exactly
    df = _step_series(spark, [0.0, 100.0, 200.0, 300.0])
    out = binseg_changepoints(df, "v", "t", ["key"], 3600, 2).collect()
    l1 = [r for r in out if r["level"] == 1][0]
    assert l1["split_bucket"] == 19  # between 100s and 200s
    l2 = {r["segment"]: r for r in out if r["level"] == 2}
    assert l2[0]["split_bucket"] == 9
    assert l2[1]["split_bucket"] == 29


def test_binseg_flat_series_zero_gain_earliest_tie(spark):
    df = _step_series(spark, [5.0, 5.0])
    out = binseg_changepoints(df, "v", "t", ["key"], 3600, 2).collect()
    l1 = [r for r in out if r["level"] == 1][0]
    assert l1["gain"] == 0.0
    assert l1["n_left"] == 2  # all splits tie at 0 -> earliest (min_seg)


def test_binseg_short_segment_emits_no_level2(spark):
    # 3 buckets total: level 1 impossible splits (T < 2*min_seg) -> nothing
    df = _step_series(spark, [1.0], per=3)
    out = binseg_changepoints(df, "v", "t", ["key"], 3600, 2).collect()
    assert out == []


# ---------------------------------------------------------------------------
# lead-lag cross-correlation
# ---------------------------------------------------------------------------

def test_cross_corr_planted_lead(spark):
    # B is A shifted 2 hours later (plus a bend so corr<1 elsewhere):
    # at lag=+2 the overlap is a perfect linear map -> corr 1.0
    a = [(float(h * 3600), "a", float(h % 7)) for h in range(40)]
    b = [(float((h + 2) * 3600), "b", float(h % 7) * 3.0 + 1.0) for h in range(40)]
    df = spark.createDataFrame(a + b, "t double, s string, v double")
    out = {r["lag"]: r for r in cross_corr(df, "s", "a", "b", "v", "t", 3600, 3).collect()}
    assert out[2]["corr"] == pytest.approx(1.0, abs=1e-6)
    assert out[2]["n_overlap"] == 40
    for lag in (-3, -1, 0, 1, 3):
        assert out[lag]["corr"] != pytest.approx(1.0, abs=1e-4)


def test_cross_corr_zero_variance_is_null(spark):
    a = [(float(h * 3600), "a", 5.0) for h in range(10)]
    b = [(float(h * 3600), "b", float(h)) for h in range(10)]
    df = spark.createDataFrame(a + b, "t double, s string, v double")
    out = cross_corr(df, "s", "a", "b", "v", "t", 3600, 1).collect()
    assert all(r["corr"] is None for r in out)


# ---------------------------------------------------------------------------
# Adamic-Adar
# ---------------------------------------------------------------------------

def test_adamic_adar_textbook_weights(spark):
    # w1 links {1,2} (deg 2), w2 links {1,2,3} (deg 3):
    # AA(1,2) = 1/ln2 + 1/ln3; AA(1,3) = AA(2,3) = 1/ln3
    rows = [(1, "w1"), (2, "w1"), (1, "w2"), (2, "w2"), (3, "w2")]
    df = spark.createDataFrame(rows, "n long, w string")
    out = {(r["node_a"], r["node_b"]): r for r in adamic_adar(df, "n", "w").collect()}
    assert out[(1, 2)]["common"] == 2
    assert out[(1, 2)]["score"] == pytest.approx(1 / math.log(2) + 1 / math.log(3), abs=1e-6)
    assert out[(1, 3)]["score"] == pytest.approx(1 / math.log(3), abs=1e-6)


def test_adamic_adar_degree_cap_and_singletons(spark):
    # a neighbor above the cap contributes nothing; degree-1 neighbors
    # produce no pairs
    hub = [(i, "hub") for i in range(10)]
    rows = hub + [(1, "w"), (2, "w"), (7, "lonely")]
    df = spark.createDataFrame(rows, "n long, w string")
    out = adamic_adar(df, "n", "w", max_degree=5).collect()
    assert len(out) == 1
    assert (out[0]["node_a"], out[0]["node_b"]) == (1, 2)


def test_adamic_adar_duplicate_edges_collapse(spark):
    rows = [(1, "w"), (1, "w"), (2, "w"), (2, "w")]
    df = spark.createDataFrame(rows, "n long, w string")
    out = adamic_adar(df, "n", "w").collect()
    assert len(out) == 1 and out[0]["common"] == 1


# ---------------------------------------------------------------------------
# K-fold target encoding
# ---------------------------------------------------------------------------

def test_kfold_target_encode_is_leakage_safe(spark):
    # two categories with very different targets; check each cell against
    # the formula computed in pure Python with the SAME md5 fold
    import hashlib

    rows = [(i, "a" if i % 2 == 0 else "b", 100.0 if i % 2 == 0 else 0.0)
            for i in range(200)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = {(r["category"], r["fold"]): r
           for r in kfold_target_encode(df, "cat", "y", "id", 5, 20).collect()}

    def fold_of(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 5

    cells = {}
    for i, cat, y in rows:
        f = fold_of(i)
        q = math.floor(y * 1e6 + 0.5)
        n, s = cells.get((cat, f), (0, 0))
        cells[(cat, f)] = (n + 1, s + q)
    ng = sum(n for n, _ in cells.values())
    sg = sum(s for _, s in cells.values())
    for cat in ("a", "b"):
        nc = sum(n for (c, _), (n, _) in cells.items() if c == cat)
        sc = sum(s for (c, _), (_, s) in cells.items() if c == cat)
        for f in range(5):
            if (cat, f) not in cells:
                continue
            nf, sf = cells[(cat, f)]
            expect = ((sc - sf) * ng + 20 * sg) / (((nc - nf) + 20) * ng) / 1e6
            got = out[(cat, f)]
            assert got["n_fold"] == nf
            assert got["enc"] == pytest.approx(expect, abs=1e-6)
            # leakage check: the encoding moved toward the prior, never
            # toward the cell's own (extreme) mean
            own_mean = sf / nf / 1e6
            oof_mean = (sc - sf) / (nc - nf) / 1e6 if nc > nf else None
            if oof_mean is not None:
                assert abs(got["enc"] - oof_mean) <= abs(got["enc"] - own_mean) or (
                    abs(own_mean - oof_mean) < 1e-9
                )


def test_kfold_target_encode_single_fold_category_gets_prior(spark):
    # a category confined to one fold: its own fold's encoding has zero
    # in-category evidence -> exactly the smoothed global prior
    rows = [(1, "rare", 999.0)] + [(i, "base", 10.0) for i in range(2, 102)]
    df = spark.createDataFrame(rows, "id long, cat string, y double")
    out = kfold_target_encode(df, "cat", "y", "id", 5, 20).collect()
    import hashlib

    f_rare = int(hashlib.md5(b"1").hexdigest()[:8], 16) % 5
    rare = [r for r in out if r["category"] == "rare" and r["fold"] == f_rare][0]
    # global mean = (999 + 100*10)/101
    gmean = (999.0 + 1000.0) / 101.0
    assert rare["enc"] == pytest.approx(gmean, abs=1e-6)


# ---------------------------------------------------------------------------
# JL projection
# ---------------------------------------------------------------------------

def test_jl_sign_matrix_deterministic_and_pm1(spark):
    m1 = jl_sign_matrix(8, 4, seed=3)
    m2 = jl_sign_matrix(8, 4, seed=3)
    assert m1 == m2
    assert all(v in (-1, 1) for row in m1 for v in row)
    assert m1 != jl_sign_matrix(8, 4, seed=4)


def test_jl_project_matches_numpy(spark):
    import numpy as np

    vecs = [[float((i * 7 + j * 3) % 5) - 2.0 for j in range(8)] for i in range(6)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vecs)],
                               "id long, embedding array<float>")
    out = {r["id"]: r["proj"]
           for r in jl_project(df, "embedding", 8, 4, 0).collect()}
    s = np.array(jl_sign_matrix(8, 4, 0), dtype=np.float64)
    for i, v in enumerate(vecs):
        x = np.array(v, dtype=np.float32).astype(np.float64)
        expect = (x @ s) / math.sqrt(4.0)
        assert np.allclose(out[i], expect, atol=1e-9)


def test_jl_project_preserves_norms_on_average(spark):
    import numpy as np

    # full-rank random cloud (seeded — a sin(i+j) lattice would collapse
    # to a 2-D subspace and share one matrix-specific distortion)
    import numpy as np

    rng = np.random.RandomState(0).randn(200, 64).tolist()
    df = spark.createDataFrame([(i, [float(x) for x in v]) for i, v in enumerate(rng)],
                               "id long, embedding array<float>")
    rows = jl_project(df, "embedding", 64, 16, 0).select(
        F.expr("aggregate(proj, 0D, (a,x) -> a + x*x)").alias("pn"),
        F.expr("aggregate(embedding, 0D, (a,x) -> a + CAST(x AS DOUBLE)*CAST(x AS DOUBLE))").alias("xn"),
    ).collect()
    ratios = [r["pn"] / r["xn"] for r in rows]
    assert 0.9 < sum(ratios) / len(ratios) < 1.1  # E[ratio] = 1


# ---------------------------------------------------------------------------
# mSPRT monitor
# ---------------------------------------------------------------------------

def _msprt_df(spark, deltas):
    # two arms, 4 readings per arm per day; arm b shifted by deltas[d]
    rows = []
    for d, shift in enumerate(deltas):
        for i in range(4):
            t = float(d * 86400 + i * 1000)
            rows.append((t, 0, 10.0 + i))
            rows.append((t, 1, 10.0 + i + shift))
    return spark.createDataFrame(rows, "t double, arm int, v double")


def test_msprt_null_effect_keeps_p_high(spark):
    df = _msprt_df(spark, [0.0] * 10)
    out = msprt_monitor(df, "arm", "v", "t", tau2=25.0, arm_a=0, arm_b=1).collect()
    assert len(out) == 10
    assert all(r["p_always"] > 0.5 for r in out)
    assert all(r["delta"] == 0.0 for r in out)


def test_msprt_big_effect_drives_p_down_monotonically(spark):
    df = _msprt_df(spark, [50.0] * 10)
    out = sorted(
        msprt_monitor(df, "arm", "v", "t", tau2=25.0, arm_a=0, arm_b=1).collect(),
        key=lambda r: r["day"],
    )
    ps = [r["p_always"] for r in out]
    assert all(a >= b for a, b in zip(ps, ps[1:]))  # always-valid = monotone
    assert ps[-1] < 0.01
    assert out[-1]["delta"] == pytest.approx(-50.0, abs=1e-6)


def test_msprt_matches_textbook_formula_day1(spark):
    # one day, arms {10,11,12,13} vs {20,22,24,26}: compute logLambda by hand
    rows = [(0.0, 0, v) for v in (10.0, 11.0, 12.0, 13.0)] + [
        (0.0, 1, v) for v in (20.0, 22.0, 24.0, 26.0)
    ]
    df = spark.createDataFrame(rows, "t double, arm int, v double")
    out = msprt_monitor(df, "arm", "v", "t", tau2=4.0, arm_a=0, arm_b=1).collect()
    assert len(out) == 1
    r = out[0]
    va = 5.0 / 3.0 / 4.0      # var({10..13})/4
    vb = 20.0 / 3.0 / 4.0     # var({20,22,24,26})/4
    v = va + vb
    delta = 11.5 - 23.0
    ll = 0.5 * math.log(v / (v + 4.0)) + delta * delta * 4.0 / (2.0 * v * (v + 4.0))
    assert r["log_lambda"] == pytest.approx(ll, abs=1e-5)
    assert r["p_always"] == pytest.approx(min(1.0, math.exp(-round(ll, 6))), abs=1e-5)


def test_msprt_requires_two_arms(spark):
    df = spark.createDataFrame([(0.0, 0, 1.0)], "t double, arm int, v double")
    with pytest.raises(Exception):
        msprt_monitor(df, "arm", "v", "t")
