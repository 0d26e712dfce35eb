"""Round-8 second-batch operators: Kendall tau-b, one-way ANOVA, Theil T
inequality, and HHI market concentration.

Cross-engine value checks live in the oracle gates (``kendall_tau_value_hour``,
``anova_value_type``, ``theil_index_type``, ``hhi_supplier_share``); these
tests pin SEMANTICS on hand-built inputs where the right answer is computable
by hand or a tiny pure-Python reference.
"""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# kendall_tau
# ---------------------------------------------------------------------------

def _brute_tau_b(pairs):
    """O(n^2) reference: tau-b with tie correction."""
    n = len(pairs)
    p = q = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = pairs[i][0] - pairs[j][0]
            dy = pairs[i][1] - pairs[j][1]
            if dx == 0 and dy == 0:
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                p += 1
            else:
                q += 1
    n0 = n * (n - 1) / 2
    den = math.sqrt((n0 - tx) * (n0 - ty))
    return (p - q) / den


def _tau(spark, pairs):
    from cerebro_spark.operators.profile import kendall_tau

    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in pairs], "x double, y double"
    )
    return kendall_tau(df, "x", "y", x_quant=1, y_quant=1).collect()[0]


def test_kendall_matches_bruteforce_with_ties(spark):
    # deterministic pseudo-data with heavy ties on both axes
    pairs = [((7 * i * i + 3 * i) % 11, (5 * i + 2) % 4) for i in range(40)]
    out = _tau(spark, pairs)
    assert out["n"] == 40
    assert out["tau_b"] == pytest.approx(_brute_tau_b(pairs), abs=1e-6)


def test_kendall_perfect_orders(spark):
    up = [(i, 2 * i) for i in range(10)]
    down = [(i, -3 * i) for i in range(10)]
    assert _tau(spark, up)["tau_b"] == pytest.approx(1.0)
    assert _tau(spark, down)["tau_b"] == pytest.approx(-1.0)


def test_kendall_constant_axis_is_null(spark):
    out = _tau(spark, [(i, 5) for i in range(6)])
    assert out["tau_b"] is None


# ---------------------------------------------------------------------------
# anova_oneway
# ---------------------------------------------------------------------------

def _anova(spark, rows):
    from cerebro_spark.operators.profile import anova_oneway

    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, v double"
    )
    return anova_oneway(df, "g", "v").collect()[0]


def _brute_anova(rows):
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(v)
    n = sum(len(vs) for vs in groups.values())
    k = len(groups)
    mean = sum(sum(vs) for vs in groups.values()) / n
    ssb = sum(len(vs) * (sum(vs) / len(vs) - mean) ** 2 for vs in groups.values())
    ssw = sum(
        sum((v - sum(vs) / len(vs)) ** 2 for v in vs) for vs in groups.values()
    )
    f = (ssb / (k - 1)) / (ssw / (n - k))
    eta = ssb / (ssb + ssw)
    return f, eta


def test_anova_matches_bruteforce(spark):
    rows = [("a", 1.5), ("a", 2.0), ("a", 2.5), ("b", 4.0), ("b", 5.0),
            ("b", 4.5), ("c", 8.0), ("c", 7.5), ("c", 9.1)]
    out = _anova(spark, rows)
    f, eta = _brute_anova(rows)
    assert out["n"] == 9 and out["k_groups"] == 3
    assert out["f_stat"] == pytest.approx(f, rel=1e-5)
    assert out["eta_sq"] == pytest.approx(eta, rel=1e-5)


def test_anova_identical_groups_f_zero(spark):
    rows = [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0)]
    out = _anova(spark, rows)
    assert out["f_stat"] == pytest.approx(0.0)
    assert out["eta_sq"] == pytest.approx(0.0)


def test_anova_single_group_null(spark):
    out = _anova(spark, [("a", 1.0), ("a", 2.0)])
    assert out["f_stat"] is None


# ---------------------------------------------------------------------------
# theil_index
# ---------------------------------------------------------------------------

def _theil(spark, rows):
    from cerebro_spark.operators.profile import theil_index

    df = spark.createDataFrame(
        [(g, float(v)) for g, v in rows], "g string, v double"
    )
    return {
        r["group"]: r
        for r in theil_index(df, "g", "v").collect()
    }


def test_theil_equality_is_zero(spark):
    out = _theil(spark, [("a", 5.0)] * 8)
    assert out["a"]["theil_t"] == pytest.approx(0.0, abs=1e-5)
    assert out["a"]["n"] == 8 and out["a"]["mean"] == pytest.approx(5.0)


def test_theil_matches_bruteforce(spark):
    vals = [1.0, 2.0, 3.0, 10.0, 0.5]
    mu = sum(vals) / len(vals)
    want = sum((v / mu) * math.log(v / mu) for v in vals) / len(vals)
    out = _theil(spark, [("a", v) for v in vals])
    assert out["a"]["theil_t"] == pytest.approx(want, abs=1e-4)


def test_theil_drops_nonpositive(spark):
    out = _theil(spark, [("a", 2.0), ("a", 2.0), ("a", 0.0), ("a", -1.0)])
    assert out["a"]["n"] == 2
    assert out["a"]["theil_t"] == pytest.approx(0.0, abs=1e-5)


# ---------------------------------------------------------------------------
# hhi_concentration
# ---------------------------------------------------------------------------

def _hhi(spark, rows):
    from cerebro_spark.operators.profile import hhi_concentration

    df = spark.createDataFrame(
        [(m, f_, float(v)) for m, f_, v in rows],
        "m string, f string, v double",
    )
    return {
        r["market"]: r
        for r in hhi_concentration(df, "m", "f", "v").collect()
    }


def test_hhi_monopoly_and_uniform(spark):
    rows = [("mono", "s1", 10.0)]
    rows += [("flat", f"s{i}", 2.5) for i in range(4)]
    out = _hhi(spark, rows)
    assert out["mono"]["hhi"] == pytest.approx(1.0)
    assert out["mono"]["top_share"] == pytest.approx(1.0)
    assert out["flat"]["hhi"] == pytest.approx(0.25)
    assert out["flat"]["top_share"] == pytest.approx(0.25)
    assert out["flat"]["n_firms"] == 4


def test_hhi_aggregates_firm_rows_before_shares(spark):
    # s1 appears twice (3 + 3 = 6), s2 once (4): shares 0.6 / 0.4
    out = _hhi(spark, [("m", "s1", 3.0), ("m", "s1", 3.0), ("m", "s2", 4.0)])
    assert out["m"]["n_firms"] == 2
    assert out["m"]["hhi"] == pytest.approx(0.36 + 0.16)
    assert out["m"]["top_share"] == pytest.approx(0.6)


# ---------------------------------------------------------------------------
# nelson_aalen
# ---------------------------------------------------------------------------

def _na(spark, rows):
    from cerebro_spark.operators.profile import nelson_aalen

    df = spark.createDataFrame(rows, "t long, censored int")
    return {r["t"]: r for r in nelson_aalen(df, "t", "censored").collect()}


def test_nelson_aalen_hand_case(spark):
    # classic: events at t=1 (n=5), t=2 two events (n=4), censor at t=3,
    # event at t=4 (n=1)
    rows = [(1, 0), (2, 0), (2, 0), (3, 1), (4, 0)]
    out = _na(spark, rows)
    assert out[1]["n_at_risk"] == 5 and out[1]["d_events"] == 1
    assert out[1]["cum_hazard"] == pytest.approx(1 / 5, abs=1e-9)
    assert out[2]["n_at_risk"] == 4 and out[2]["d_events"] == 2
    assert out[2]["cum_hazard"] == pytest.approx(1 / 5 + 2 / 4, abs=1e-9)
    assert out[3]["d_events"] == 0
    assert out[3]["cum_hazard"] == pytest.approx(1 / 5 + 2 / 4, abs=1e-9)
    assert out[4]["n_at_risk"] == 1
    assert out[4]["cum_hazard"] == pytest.approx(1 / 5 + 2 / 4 + 1, abs=1e-9)


# ---------------------------------------------------------------------------
# logrank_test
# ---------------------------------------------------------------------------

def _brute_logrank(rows):
    """Pure-python reference: rows = (t, censored, g)."""
    times = sorted({t for t, c, _ in rows if c == 0})
    o1 = e1 = v = 0.0
    for t in times:
        n1 = sum(1 for tt, _, g in rows if tt >= t and g == 1)
        n2 = sum(1 for tt, _, g in rows if tt >= t and g == 0)
        d1 = sum(1 for tt, c, g in rows if tt == t and c == 0 and g == 1)
        d2 = sum(1 for tt, c, g in rows if tt == t and c == 0 and g == 0)
        n, d = n1 + n2, d1 + d2
        if d == 0:
            continue
        o1 += d1
        e1 += d * n1 / n
        if n > 1:
            v += d * (n1 / n) * (n2 / n) * (n - d) / (n - 1)
    return o1, e1, (o1 - e1) ** 2 / v


def test_logrank_matches_bruteforce(spark):
    from cerebro_spark.operators.profile import logrank_test

    # group 1 dies early, group 0 lives long → significant separation
    rows = [(1, 0, 1), (2, 0, 1), (2, 0, 1), (3, 1, 1), (4, 0, 1),
            (5, 0, 0), (6, 0, 0), (7, 1, 0), (8, 0, 0), (9, 0, 0)]
    df = spark.createDataFrame(rows, "t long, c int, g int")
    out = logrank_test(df, "t", "c", "g").collect()[0]
    o1, e1, chi2 = _brute_logrank(rows)
    assert out["n1"] == 5 and out["n2"] == 5
    assert out["o1"] == o1
    assert out["e1"] == pytest.approx(e1, abs=1e-4)
    assert out["chi2"] == pytest.approx(chi2, abs=1e-3)


def test_logrank_identical_groups_chi2_zero(spark):
    from cerebro_spark.operators.profile import logrank_test

    rows = [(t, 0, g) for t in (1, 2, 3, 4) for g in (0, 1)]
    df = spark.createDataFrame(rows, "t long, c int, g int")
    out = logrank_test(df, "t", "c", "g").collect()[0]
    # symmetric groups: O1 == E1 exactly
    assert out["chi2"] == pytest.approx(0.0, abs=1e-4)


# ---------------------------------------------------------------------------
# decile_lift
# ---------------------------------------------------------------------------

def test_decile_lift_separable_scores(spark):
    from cerebro_spark.operators.profile import decile_lift

    # 20 units, scores 1..20; positives are exactly the top 4 scores
    rows = [(float(i), 1 if i > 16 else 0) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = {r["decile"]: r for r in decile_lift(df, "s", "y").collect()}
    assert set(out) == set(range(1, 11))
    assert all(out[d]["n_units"] == 2 for d in out)
    # top two deciles hold all positives
    assert out[10]["n_pos"] == 2 and out[9]["n_pos"] == 2
    assert out[10]["response_rate"] == pytest.approx(1.0)
    assert out[10]["lift"] == pytest.approx(1.0 / 0.2)
    assert out[10]["cum_capture"] == pytest.approx(0.5)
    assert out[9]["cum_capture"] == pytest.approx(1.0)
    assert out[1]["cum_capture"] == pytest.approx(1.0)
    assert out[1]["lift"] == pytest.approx(0.0)


def test_decile_lift_boundary_ties_go_down(spark):
    from cerebro_spark.operators.profile import decile_lift

    # all scores identical → single bucket (decile 1) holding everyone
    rows = [(5.0, i % 2) for i in range(10)]
    df = spark.createDataFrame(rows, "s double, y int")
    out = decile_lift(df, "s", "y").collect()
    assert len(out) == 1 and out[0]["decile"] == 1
    assert out[0]["n_units"] == 10 and out[0]["n_pos"] == 5
    assert out[0]["lift"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# type_token_profile / good_turing_unseen / heaps_law_fit
# ---------------------------------------------------------------------------

def test_ttr_hand_case(spark):
    from cerebro_spark.operators.text import type_token_profile

    docs = spark.createDataFrame(
        [("s1", "a b a c"), ("s1", "a d"), ("s2", "x x x x")],
        "src string, text string",
    )
    out = {r["group"]: r for r in
           type_token_profile(docs, "text", "src").collect()}
    # s1: tokens a,b,a,c,a,d → 6 tokens, 4 types (a=3,b=1,c=1,d=1), 3 hapax
    assert out["s1"]["n_docs"] == 2
    assert out["s1"]["n_tokens"] == 6 and out["s1"]["n_types"] == 4
    assert out["s1"]["ttr"] == pytest.approx(4 / 6, abs=1e-6)
    assert out["s1"]["hapax_ratio"] == pytest.approx(3 / 4)
    # s2: one type seen 4 times → no hapax
    assert out["s2"]["n_types"] == 1 and out["s2"]["hapax_ratio"] == 0.0


def test_ttr_lowercases_and_skips_empty(spark):
    from cerebro_spark.operators.text import type_token_profile

    docs = spark.createDataFrame(
        [("s", "The THE the"), ("s", "  ")], "src string, text string"
    )
    out = type_token_profile(docs, "text", "src").collect()[0]
    assert out["n_types"] == 1 and out["n_tokens"] == 3


def test_good_turing_hand_case(spark):
    from cerebro_spark.operators.text import good_turing_unseen

    # counts: a=3, b=1, c=1, d=2 → N=7, N1=2, N2=1
    docs = spark.createDataFrame(
        [("a a a b",), ("c d d",)], "text string"
    )
    out = good_turing_unseen(docs, "text").collect()[0]
    assert out["n_tokens"] == 7 and out["n_types"] == 4
    assert out["n_singletons"] == 2 and out["n_doubletons"] == 1
    assert out["p_unseen"] == pytest.approx(2 / 7, abs=1e-6)
    assert out["gt_r1"] == pytest.approx(1.0)


def test_heaps_fit_recovers_powerlaw(spark):
    from cerebro_spark.operators.text import heaps_law_fit

    # synthetic corpus with V(N) = N exactly (every token new): beta = 1
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(5))) for i in range(64)],
        "doc_id long, text string",
    )
    out = heaps_law_fit(docs, "text", "doc_id", n_buckets=8).collect()[0]
    assert out["n_docs"] == 64
    assert out["n_tokens"] == 320 and out["n_types"] == 320
    assert out["heaps_beta"] == pytest.approx(1.0, abs=1e-5)
    assert out["r2"] == pytest.approx(1.0, abs=1e-6)


def test_heaps_fit_saturated_vocab_beta_zero(spark):
    from cerebro_spark.operators.text import heaps_law_fit

    # same 3 words in every doc: V saturates instantly → beta ≈ 0
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(64)], "doc_id long, text string"
    )
    out = heaps_law_fit(docs, "text", "doc_id", n_buckets=8).collect()[0]
    assert out["n_types"] == 3
    assert abs(out["heaps_beta"]) < 0.01


# ---------------------------------------------------------------------------
# brier_decomposition
# ---------------------------------------------------------------------------

def _brute_brier(pairs, quant=1000):
    from collections import defaultdict

    groups = defaultdict(lambda: [0, 0])
    for p, y in pairs:
        f = int(p * quant + 0.5)
        groups[f][0] += 1
        groups[f][1] += y
    n = len(pairs)
    ybar = sum(y for _, y in pairs) / n
    brier = sum((int(p * quant + 0.5) / quant - y) ** 2 for p, y in pairs) / n
    rel = sum(nk * (f / quant - pos / nk) ** 2
              for f, (nk, pos) in groups.items()) / n
    res = sum(nk * (pos / nk - ybar) ** 2
              for f, (nk, pos) in groups.items()) / n
    unc = ybar * (1 - ybar)
    return brier, rel, res, unc


def test_brier_decomposition_matches_bruteforce(spark):
    from cerebro_spark.operators.profile import brier_decomposition

    pairs = [((i % 10) / 10.0, 1 if (i * 7) % 10 < (i % 10) else 0)
             for i in range(200)]
    df = spark.createDataFrame(
        [(float(p), int(y)) for p, y in pairs], "p double, y int"
    )
    out = brier_decomposition(df, "p", "y").collect()[0]
    brier, rel, res, unc = _brute_brier(pairs)
    assert out["n"] == 200
    assert out["brier"] == pytest.approx(brier, abs=1e-5)
    assert out["reliability"] == pytest.approx(rel, abs=1e-5)
    assert out["resolution"] == pytest.approx(res, abs=1e-5)
    assert out["uncertainty"] == pytest.approx(unc, abs=1e-5)
    # Murphy identity
    assert out["brier"] == pytest.approx(
        out["reliability"] - out["resolution"] + out["uncertainty"], abs=1e-4
    )


def test_brier_perfect_forecaster(spark):
    from cerebro_spark.operators.profile import brier_decomposition

    rows = [(1.0, 1)] * 5 + [(0.0, 0)] * 5
    df = spark.createDataFrame(rows, "p double, y int")
    out = brier_decomposition(df, "p", "y").collect()[0]
    assert out["brier"] == pytest.approx(0.0)
    assert out["reliability"] == pytest.approx(0.0)
    assert out["resolution"] == pytest.approx(0.25)
    assert out["uncertainty"] == pytest.approx(0.25)


# ---------------------------------------------------------------------------
# mutual_nn_pairs
# ---------------------------------------------------------------------------

def test_mutual_nn_hand_case(spark):
    from cerebro_spark.operators.similarity import mutual_nn_pairs

    # block A: v1 and v2 point the same way (mutual), v3 is orthogonal-ish
    # and nearest to v1, but v1's top-1 is v2 → no pair with v3.
    # block B: v4/v5 mutual.
    rows = [
        (1, [1.0, 0.0, 0.0], "A"),
        (2, [0.9, 0.1, 0.0], "A"),
        (3, [0.0, 1.0, 0.1], "A"),
        (4, [0.0, 0.0, 1.0], "B"),
        (5, [0.1, 0.0, 0.9], "B"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = sorted(
        (r["id_a"], r["id_b"])
        for r in mutual_nn_pairs(df, "vec_id", "embedding", "label").collect()
    )
    assert out == [(1, 2), (4, 5)]


def test_mutual_nn_respects_blocks(spark):
    from cerebro_spark.operators.similarity import mutual_nn_pairs

    # identical vectors in different blocks never pair
    rows = [
        (1, [1.0, 0.0], "A"),
        (2, [1.0, 0.0], "B"),
        (3, [0.0, 1.0], "A"),
        (4, [0.0, 1.0], "B"),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = sorted(
        (r["id_a"], r["id_b"])
        for r in mutual_nn_pairs(df, "vec_id", "embedding", "label").collect()
    )
    # within each block the two vectors are each other's only neighbor
    assert out == [(1, 3), (2, 4)]


# ---------------------------------------------------------------------------
# property tests (hypothesis): invariances the hand cases can't cover
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSET = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 3)),
        min_size=5,
        max_size=30,
    )
)
@settings(**_HSET)
def test_kendall_property_matches_bruteforce(spark, pairs):
    out = _tau(spark, pairs)
    want = None
    n = len(pairs)
    n0 = n * (n - 1) / 2
    tx = sum(1 for i in range(n) for j in range(i + 1, n)
             if pairs[i][0] == pairs[j][0])
    ty = sum(1 for i in range(n) for j in range(i + 1, n)
             if pairs[i][1] == pairs[j][1])
    if tx < n0 and ty < n0:
        want = _brute_tau_b(pairs)
    if want is None:
        assert out["tau_b"] is None
    else:
        assert out["tau_b"] == pytest.approx(want, abs=1e-6)


@given(
    st.lists(st.floats(0.01, 100.0, allow_nan=False), min_size=2, max_size=20),
    st.integers(2, 9),
)
@settings(**_HSET)
def test_theil_scale_invariance(spark, vals, c):
    # Theil T is scale-free: T(c·x) == T(x) (values quantized to e6, so
    # compare at the metric's own 6 dp resolution with a quantization slack)
    base = _theil(spark, [("a", v) for v in vals])["a"]["theil_t"]
    scaled = _theil(spark, [("a", v * c) for v in vals])["a"]["theil_t"]
    assert scaled == pytest.approx(base, abs=5e-4)


@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.floats(0.1, 50.0, allow_nan=False)),
        min_size=2,
        max_size=20,
    ),
    st.integers(2, 9),
)
@settings(**_HSET)
def test_hhi_scale_invariance_and_bounds(spark, rows, c):
    # HHI is share-based: scaling every value by c changes nothing, and
    # 1/n_firms <= hhi <= 1 always holds
    base = _hhi(spark, [("m", f"f{f}", v) for f, v in rows])["m"]
    scaled = _hhi(spark, [("m", f"f{f}", v * c) for f, v in rows])["m"]
    assert scaled["hhi"] == pytest.approx(base["hhi"], abs=5e-4)
    assert base["n_firms"] >= 1
    assert 1.0 / base["n_firms"] - 1e-6 <= base["hhi"] <= 1.0 + 1e-6


@given(
    st.lists(
        st.tuples(st.integers(1, 8), st.booleans()),
        min_size=3,
        max_size=20,
    )
)
@settings(**_HSET)
def test_nelson_aalen_monotone_and_bounded_by_km(spark, rows):
    # H(t) is nondecreasing, and H >= -ln(KM) pointwise (Jensen: each
    # -ln(1 - d/n) >= d/n)
    import math as m

    data = [(t, 0 if not c else 1) for t, c in rows]
    out = sorted(_na(spark, data).values(), key=lambda r: r["t"])
    prev = 0.0
    km = 1.0
    for r in out:
        assert r["cum_hazard"] >= prev - 1e-12
        if r["n_at_risk"] > r["d_events"]:
            km *= 1 - r["d_events"] / r["n_at_risk"]
            assert r["cum_hazard"] <= -m.log(km) + 1e-9
        prev = r["cum_hazard"]


# ---------------------------------------------------------------------------
# mann_whitney_u / kruskal_wallis
# ---------------------------------------------------------------------------

def _brute_mwu(vals0, vals1):
    """Pure-python rank-sum reference with midranks + tie correction."""
    allv = sorted(vals0 + vals1)
    # midrank per distinct value
    mr = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        mr[allv[i]] = (i + 1 + j) / 2
        i = j
    n1, n2, n = len(vals1), len(vals0), len(vals0) + len(vals1)
    r1 = sum(mr[v] for v in vals1)
    u1 = r1 - n1 * (n1 + 1) / 2
    ties = 0
    from collections import Counter

    for t in Counter(allv).values():
        ties += t ** 3 - t
    var = n1 * n2 / 12 * ((n + 1) - ties / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2) / math.sqrt(var)
    rb = 1 - 2 * u1 / (n1 * n2)
    return u1, z, rb


def test_mann_whitney_matches_bruteforce(spark):
    from cerebro_spark.operators.profile import mann_whitney_u

    vals0 = [1.0, 2.0, 2.0, 3.0, 5.0, 8.0, 13.0]
    vals1 = [2.0, 4.0, 6.0, 6.0, 9.0, 14.0]
    rows = [(v, 0) for v in vals0] + [(v, 1) for v in vals1]
    df = spark.createDataFrame(rows, "v double, g int")
    out = mann_whitney_u(df, "g", "v", quant=1).collect()[0]
    u1, z, rb = _brute_mwu(vals0, vals1)
    assert out["n1"] == 6 and out["n2"] == 7
    assert out["u1"] == pytest.approx(u1)
    assert out["z"] == pytest.approx(z, abs=1e-6)
    assert out["rank_biserial"] == pytest.approx(rb, abs=1e-6)


def test_mann_whitney_all_tied_null_z(spark):
    from cerebro_spark.operators.profile import mann_whitney_u

    df = spark.createDataFrame([(5.0, i % 2) for i in range(8)], "v double, g int")
    out = mann_whitney_u(df, "g", "v", quant=1).collect()[0]
    assert out["z"] is None
    assert out["rank_biserial"] == pytest.approx(0.0)


def _brute_kruskal(groups):
    """Mirrors the operator's documented FLOOR-quantized metric: the
    cross-group rational (2R_g)^2/n_g is an exact integer floor (at
    n = 12 the coarseness is visible at the 3rd decimal; at gate scale
    the relative loss is ~1e-15)."""
    allv = sorted(v for vs in groups.values() for v in vs)
    mr2 = {}
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j] == allv[i]:
            j += 1
        mr2[allv[i]] = i + 1 + j  # 2·midrank, exact integer
        i = j
    n = len(allv)
    q = sum(
        (sum(mr2[v] for v in vs)) ** 2 // len(vs) for vs in groups.values()
    )
    h_raw = 3 * q / (n * (n + 1)) - 3 * (n + 1)
    from collections import Counter

    ties = sum(t ** 3 - t for t in Counter(allv).values())
    return h_raw / (1 - ties / (n ** 3 - n))


def test_kruskal_matches_bruteforce(spark):
    from cerebro_spark.operators.profile import kruskal_wallis

    groups = {"a": [1.0, 2.0, 3.0, 3.0], "b": [3.0, 5.0, 7.0],
              "c": [6.0, 8.0, 9.0, 9.0, 11.0]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v double")
    out = kruskal_wallis(df, "g", "v", quant=1).collect()[0]
    want = _brute_kruskal(groups)
    assert out["n"] == 12 and out["k_groups"] == 3
    assert out["h_stat"] == pytest.approx(want, abs=1e-5)
    k, n = 3, 12
    assert out["epsilon_sq"] == pytest.approx((want - k + 1) / (n - k), abs=1e-5)


# ---------------------------------------------------------------------------
# event_study
# ---------------------------------------------------------------------------

def test_event_study_hand_case(spark):
    from cerebro_spark.operators.profile import event_study

    # periods -2,-1,0: constant gap 1.0 pre, jump to 3.0 at launch
    rows = []
    for p, (tmean, cmean) in {-2: (5.0, 4.0), -1: (6.0, 5.0),
                              0: (9.0, 6.0)}.items():
        rows += [(tmean, 1, p), (cmean, 0, p)]
    df = spark.createDataFrame(rows, "v double, tr int, p long")
    out = {r["period"]: r for r in
           event_study(df, "v", F.col("tr") == 1, "p").collect()}
    assert out[-2]["gap"] == pytest.approx(1.0)
    assert out[-2]["gap_vs_base"] == pytest.approx(0.0)  # parallel pre-trend
    assert out[-1]["gap_vs_base"] == pytest.approx(0.0)
    assert out[0]["gap"] == pytest.approx(3.0)
    assert out[0]["gap_vs_base"] == pytest.approx(2.0)


def test_event_study_missing_base_period_keeps_rows(spark):
    from cerebro_spark.operators.profile import event_study

    rows = [(1.0, 1, 0), (2.0, 0, 0)]
    df = spark.createDataFrame(rows, "v double, tr int, p long")
    out = event_study(df, "v", F.col("tr") == 1, "p").collect()
    assert len(out) == 1 and out[0]["gap_vs_base"] is None


# ---------------------------------------------------------------------------
# burrows_delta
# ---------------------------------------------------------------------------

def test_burrows_delta_styles(spark):
    from cerebro_spark.operators.text import burrows_delta

    # the Burrows setting: a SHARED vocabulary used at different rates —
    # s1/s2 have near-identical profiles, s3 overuses 'the' and 'cat';
    # delta(s1,s2) must sit well below delta(s1,s3) and delta(s2,s3)
    docs = []
    for i in range(20):
        docs.append(("s1", "the cat sat on the mat and the dog ran"))
        docs.append(("s2", "the cat sat on the rug and the dog hid"))
        docs.append(("s3", "the the cat cat the cat the the cat the"))
    df = spark.createDataFrame(docs, "source string, text string")
    out = {(r["group_a"], r["group_b"]): r["delta"]
           for r in burrows_delta(df, "text", "source", top_n=6).collect()}
    assert out[("s1", "s2")] < out[("s1", "s3")]
    assert out[("s1", "s2")] < out[("s2", "s3")]


def test_burrows_delta_identical_groups_zero(spark):
    from cerebro_spark.operators.text import burrows_delta

    docs = [("a", "x y z w"), ("b", "x y z w"), ("c", "x y w q")]
    df = spark.createDataFrame(docs, "source string, text string")
    out = {(r["group_a"], r["group_b"]): r["delta"]
           for r in burrows_delta(df, "text", "source", top_n=5).collect()}
    assert out[("a", "b")] == pytest.approx(0.0, abs=1e-5)
    assert out[("a", "c")] > 0.1


# ---------------------------------------------------------------------------
# ols_two_factor / yuen_trimmed_t
# ---------------------------------------------------------------------------

def test_ols_two_factor_recovers_coefficients(spark):
    from cerebro_spark.operators.profile import ols_two_factor

    # exact plane y = 2 + 3*x1 - 0.5*x2 over a non-collinear design
    rows = [(2 + 3 * a - 0.5 * b, float(a), float(b))
            for a in range(6) for b in range(5)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = ols_two_factor(df, "y", "x1", "x2").collect()[0]
    assert out["n"] == 30
    assert out["b0"] == pytest.approx(2.0, abs=1e-5)
    assert out["b1"] == pytest.approx(3.0, abs=1e-5)
    assert out["b2"] == pytest.approx(-0.5, abs=1e-5)
    assert out["r2"] == pytest.approx(1.0, abs=1e-6)


def test_ols_two_factor_collinear_null(spark):
    from cerebro_spark.operators.profile import ols_two_factor

    rows = [(float(i), float(i), float(2 * i)) for i in range(10)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = ols_two_factor(df, "y", "x1", "x2").collect()[0]
    assert out["b1"] is None and out["r2"] is None


def test_ols_two_factor_partial_effect(spark):
    from cerebro_spark.operators.profile import ols_two_factor
    import numpy as np

    # y depends on x1 only, but x2 correlates with x1: the multivariable
    # fit must hand the shared variance to x1 (b2 ~ 0) — reference via
    # numpy lstsq
    rows = [(3.0 * a + 0.01 * ((a * 7 + b) % 5), float(a),
             float(a + ((b * 3) % 4)))
            for a in range(8) for b in range(6)]
    df = spark.createDataFrame(rows, "y double, x1 double, x2 double")
    out = ols_two_factor(df, "y", "x1", "x2").collect()[0]
    X = np.array([[1.0, r[1], r[2]] for r in rows])
    yv = np.array([r[0] for r in rows])
    beta = np.linalg.lstsq(X, yv, rcond=None)[0]
    assert out["b1"] == pytest.approx(beta[1], abs=1e-4)
    assert out["b2"] == pytest.approx(beta[2], abs=1e-4)


def test_yuen_outlier_immunity(spark):
    from cerebro_spark.operators.profile import yuen_trimmed_t

    # identical middles; arm 1 has a massive whale the 20% trim removes
    rows = [(float(v), 0) for v in range(1, 11)]
    rows += [(float(v), 1) for v in range(1, 10)] + [(10000.0, 1)]
    df = spark.createDataFrame(rows, "v double, g int")
    out = yuen_trimmed_t(df, "g", "v", quant=1).collect()[0]
    assert out["n1"] == 10 and out["n2"] == 10
    assert out["h1"] == 6 and out["h2"] == 6
    # trimmed means: ranks 3..8 of 1..10 = mean(3..8) = 5.5 both arms
    assert out["tmean1"] == pytest.approx(5.5)
    assert out["tmean2"] == pytest.approx(5.5)
    assert out["diff"] == pytest.approx(0.0)


def test_yuen_detects_shift(spark):
    from cerebro_spark.operators.profile import yuen_trimmed_t

    rows = [(float(v), 0) for v in range(1, 21)]
    rows += [(float(v) + 5.0, 1) for v in range(1, 21)]
    df = spark.createDataFrame(rows, "v double, g int")
    out = yuen_trimmed_t(df, "g", "v", quant=1).collect()[0]
    assert out["diff"] == pytest.approx(5.0)
    # hand check: h=12, SSW_w=385 per arm, d=385/132 → t = 5/√(2d) ≈ 2.0702
    assert out["t"] == pytest.approx(5.0 / math.sqrt(2 * 385 / 132), abs=1e-4)


# ---------------------------------------------------------------------------
# doc_novelty_profile / centroid_silhouette
# ---------------------------------------------------------------------------

def test_doc_novelty_orders_sources(spark):
    from cerebro_spark.operators.text import doc_novelty_profile
    import math as m

    # 'template' repeats one common word; 'fresh' docs are all-unique terms
    docs = [("template", "aaa aaa aaa aaa")] * 5
    docs += [("fresh", f"u{i}a u{i}b u{i}c u{i}d") for i in range(5)]
    df = spark.createDataFrame(docs, "source string, text string")
    out = {r["group"]: r for r in
           doc_novelty_profile(df, "text", "source").collect()}
    # corpus N = 40 tokens; 'aaa' count 20 -> surprisal ln(2); unique
    # terms count 1 -> ln(40)
    assert out["template"]["mean_novelty"] == pytest.approx(m.log(2), abs=1e-5)
    assert out["fresh"]["mean_novelty"] == pytest.approx(m.log(40), abs=1e-5)
    assert out["template"]["n_docs"] == 5


def test_silhouette_separated_vs_mixed(spark):
    from cerebro_spark.operators.similarity import centroid_silhouette

    # two tight, far-apart clusters -> s near 1; a label whose points sit
    # ON another centroid -> s near 0 or below
    rows = []
    for i in range(10):
        rows.append((i, [100.0 + (i % 3) * 0.1, 0.0], "a"))
        rows.append((100 + i, [-100.0 - (i % 3) * 0.1, 0.0], "b"))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r["label"]: r["mean_silhouette"] for r in
           centroid_silhouette(df, "embedding", "label").collect()}
    assert out["a"] > 0.99 and out["b"] > 0.99

    rows += [(200 + i, [100.0 + (i % 3) * 0.1, 0.0], "c") for i in range(5)]
    out2 = {r["label"]: r["mean_silhouette"] for r in
            centroid_silhouette(
                spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string"),
                "embedding", "label").collect()}
    # c sits on top of a's cluster: silhouette collapses toward 0
    assert out2["c"] < 0.1


def test_silhouette_singleton_scores_zero(spark):
    from cerebro_spark.operators.similarity import centroid_silhouette

    rows = [(1, [1.0, 0.0], "a"), (2, [5.0, 0.0], "b")]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    out = {r["label"]: r["mean_silhouette"] for r in
           centroid_silhouette(df, "embedding", "label").collect()}
    # each point IS its centroid: a = 0, b > 0 -> s = 1 by (b-a)/max
    assert out["a"] == pytest.approx(1.0)
    assert out["b"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# fightin_words / hill_diversity / cochran_armitage / decomposition_strength
# ---------------------------------------------------------------------------

def test_fightin_words_finds_planted_term(spark):
    from cerebro_spark.operators.text import fightin_words

    docs = [("s1", "common words here plus zebra zebra zebra")] * 10
    docs += [("s2", "common words here plus nothing special")] * 10
    df = spark.createDataFrame(docs, "source string, text string")
    out = fightin_words(df, "text", "source", top_k=3).collect()
    top_s1 = [r["term"] for r in out if r["group"] == "s1" and r["rank"] == 1]
    top_s2 = [r["term"] for r in out if r["group"] == "s2" and r["rank"] == 1]
    assert top_s1 == ["zebra"]
    assert top_s2[0] in ("nothing", "special")
    z1 = [r["z_logodds"] for r in out if r["group"] == "s1" and r["rank"] == 1]
    assert z1[0] > 2.0


def test_hill_diversity_orders(spark):
    from cerebro_spark.operators.text import hill_diversity
    import math as m

    # uniform over 4 types: q0 = q1 = q2 = 4; skewed: q0=2, q1 < 2, q2 < q1
    docs = [("uni", "a b c d")] * 5
    docs += [("skew", "x x x x x x x x x y")] * 2
    df = spark.createDataFrame(docs, "source string, text string")
    out = {r["group"]: r for r in hill_diversity(df, "text", "source").collect()}
    assert out["uni"]["richness"] == 4
    assert out["uni"]["hill_q1"] == pytest.approx(4.0, abs=1e-3)
    assert out["uni"]["hill_q2"] == pytest.approx(4.0, abs=1e-3)
    p = [0.9, 0.1]
    want_q1 = m.exp(-sum(x * m.log(x) for x in p))
    assert out["skew"]["richness"] == 2
    assert out["skew"]["hill_q1"] == pytest.approx(want_q1, abs=1e-3)
    assert out["skew"]["hill_q2"] == pytest.approx(1 / sum(x * x for x in p), abs=1e-3)
    assert out["skew"]["hill_q2"] < out["skew"]["hill_q1"] < 2


def test_cochran_armitage_trend(spark):
    from cerebro_spark.operators.profile import cochran_armitage

    # rate rises with score: 10%, 30%, 50%, 70% over scores 0..3
    rows = []
    for s_, rate in enumerate([1, 3, 5, 7]):
        rows += [(s_, 1)] * rate + [(s_, 0)] * (10 - rate)
    df = spark.createDataFrame(rows, "s int, y int")
    out = cochran_armitage(df, "s", "y").collect()[0]
    assert out["n"] == 40 and out["k_levels"] == 4
    assert out["slope_sign"] == 1
    # reference: z^2 equals the standard CA chi2 = 8.4-ish for this table
    n, N = [10] * 4, 40
    r = [1, 3, 5, 7]
    R = sum(r)
    pbar = R / N
    num = sum(s_ * (r[s_] - 10 * pbar) for s_ in range(4))
    var = pbar * (1 - pbar) * (sum(10 * s_ * s_ for s_ in range(4))
                               - sum(10 * s_ for s_ in range(4)) ** 2 / N)
    want = num / math.sqrt(var)
    assert out["z"] == pytest.approx(want, abs=1e-5)


def test_cochran_armitage_flat_is_zero(spark):
    from cerebro_spark.operators.profile import cochran_armitage

    rows = [(s_, 1 if i < 3 else 0) for s_ in range(4) for i in range(10)]
    df = spark.createDataFrame(rows, "s int, y int")
    out = cochran_armitage(df, "s", "y").collect()[0]
    assert out["z"] == pytest.approx(0.0)
    assert out["slope_sign"] == 0


def test_decomposition_strength_seasonal_series(spark):
    from cerebro_spark.operators.tsdb import decomposition_strength
    import datetime as dt

    # pure 24h-periodic signal, no noise: seasonal strength near 1
    rows = []
    base = dt.datetime(2024, 1, 1)
    for d in range(6):
        for h in range(24):
            rows.append(
                ("k", base + dt.timedelta(days=d, hours=h),
                 10.0 + (5.0 if h in (9, 10, 11) else 0.0))
            )
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = decomposition_strength(df, "value", "ts", keys=["k"]).collect()[0]
    assert out["strength_seasonal"] is not None
    assert out["strength_seasonal"] > 0.95


# ---------------------------------------------------------------------------
# ratio_metric_ztest / levene_test / forecast_backtest / graph_reciprocity
# ---------------------------------------------------------------------------

def test_ratio_metric_hand_case(spark):
    from cerebro_spark.operators.profile import ratio_metric_ztest

    # arm 0: every user 2 clicks / 10 views -> ratio 0.2, zero variance
    # arm 1: every user 3 clicks / 10 views -> ratio 0.3
    rows = []
    for u in range(10):
        rows += [(2 * u, 2.0, 10.0)]          # even user_id -> arm 0
        rows += [(2 * u + 1, 3.0, 10.0)]      # odd  user_id -> arm 1
    df = spark.createDataFrame(rows, "u long, x double, y double")
    out = ratio_metric_ztest(
        df, "u", "x", "y", F.pmod(F.col("u"), F.lit(2))
    ).collect()[0]
    assert out["n1"] == 10 and out["n2"] == 10
    assert out["ratio1"] == pytest.approx(0.2)
    assert out["ratio2"] == pytest.approx(0.3)
    assert out["diff"] == pytest.approx(0.1)
    assert out["z"] is None  # zero within-arm variance -> undefined z


def test_ratio_metric_matches_delta_reference(spark):
    from cerebro_spark.operators.profile import ratio_metric_ztest

    # heterogeneous units; reference via numpy-free python
    data = {0: [(2.0, 8.0), (1.0, 12.0), (4.0, 9.0), (3.0, 11.0)],
            1: [(5.0, 10.0), (2.0, 6.0), (6.0, 14.0), (3.0, 10.0)]}
    rows = []
    uid = 0
    for gg, units in data.items():
        for x, y in units:
            u = uid * 2 + gg
            rows.append((u, x, y))
            uid += 1
    df = spark.createDataFrame(rows, "u long, x double, y double")
    out = ratio_metric_ztest(
        df, "u", "x", "y", F.pmod(F.col("u"), F.lit(2))
    ).collect()[0]

    def ref(units):
        n = len(units)
        sx = sum(x for x, _ in units)
        sy = sum(y for _, y in units)
        r = sx / sy
        mx, my = sx / n, sy / n
        vx = sum((x - mx) ** 2 for x, _ in units) / (n - 1)
        vy = sum((y - my) ** 2 for _, y in units) / (n - 1)
        vxy = sum((x - mx) * (y - my) for x, y in units) / (n - 1)
        var_r = (vx - 2 * r * vxy + r * r * vy) / (n * my * my)
        return r, var_r

    r0, v0 = ref(data[0])
    r1, v1 = ref(data[1])
    assert out["ratio1"] == pytest.approx(r0, abs=1e-6)
    assert out["ratio2"] == pytest.approx(r1, abs=1e-6)
    assert out["z"] == pytest.approx((r1 - r0) / math.sqrt(v0 + v1), abs=1e-4)


def test_levene_equal_vs_unequal_variance(spark):
    from cerebro_spark.operators.profile import levene_test

    # same spread -> W ~ 0; then one group 10x wider -> W large
    tight = [("a", float(v)) for v in range(10)]
    tight += [("b", float(v) + 100.0) for v in range(10)]
    df = spark.createDataFrame(tight, "g string, v double")
    w_same = levene_test(df, "g", "v", quant=1).collect()[0]["w_stat"]
    assert w_same == pytest.approx(0.0, abs=1e-6)

    wide = [("a", float(v)) for v in range(10)]
    wide += [("b", float(10 * v)) for v in range(10)]
    df2 = spark.createDataFrame(wide, "g string, v double")
    w_diff = levene_test(df2, "g", "v", quant=1).collect()[0]["w_stat"]
    assert w_diff > 10


def test_forecast_backtest_perfect_seasonal(spark):
    from cerebro_spark.operators.tsdb import forecast_backtest
    import datetime as dt

    # exactly 24h-periodic: seasonal-naive is PERFECT (mae 0, mase 0),
    # plain naive is not
    rows = []
    base = dt.datetime(2024, 3, 1)
    for d in range(4):
        for h in range(24):
            rows.append(("k", base + dt.timedelta(days=d, hours=h),
                         float(10 + (h % 24))))
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = forecast_backtest(df, "value", "ts", keys=["k"]).collect()[0]
    assert out["n_scored"] == 72  # 96 buckets - 24 without the lag
    assert out["mae_seasonal"] == pytest.approx(0.0)
    assert out["mae_naive"] > 0
    assert out["mase"] == pytest.approx(0.0)
    assert out["smape"] == pytest.approx(0.0)


def test_forecast_backtest_gap_excludes_bucket(spark):
    from cerebro_spark.operators.tsdb import forecast_backtest
    import datetime as dt

    # a missing bucket must not fabricate a lag across the gap
    base = dt.datetime(2024, 3, 1)
    hours = [0, 1, 3]  # bucket 2 missing: naive lag invalid at bucket 3
    rows = [("k", base + dt.timedelta(hours=h), float(h)) for h in hours]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = forecast_backtest(df, "value", "ts", keys=["k"]).collect()[0]
    assert out["n_scored"] == 0           # no 24h lags exist at all
    assert out["mae_naive"] is not None   # bucket 1 had a valid 1h lag


def test_graph_reciprocity(spark):
    from cerebro_spark.operators.cluster import graph_reciprocity

    # a<->b reciprocal, a->c and c->d one-way, self-loop and dup dropped
    edges = [("a", "b"), ("b", "a"), ("a", "c"), ("c", "d"),
             ("a", "a"), ("a", "b")]
    df = spark.createDataFrame(edges, "src string, dst string")
    out = graph_reciprocity(df).collect()[0]
    assert out["n_edges"] == 4
    assert out["n_reciprocal"] == 2
    assert out["reciprocity"] == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# vocab_jaccard_pairs / langid_prf1 / dedup_savings / concentration_at
# ---------------------------------------------------------------------------

def test_vocab_jaccard_hand_case(spark):
    from cerebro_spark.operators.text import vocab_jaccard_pairs

    docs = [("s1", "a b c"), ("s1", "c d"),       # V1 = {a,b,c,d}
            ("s2", "c d e"),                       # V2 = {c,d,e}
            ("s3", "x y")]                         # V3 = {x,y}
    df = spark.createDataFrame(docs, "source string, text string")
    out = {(r["group_a"], r["group_b"]): r
           for r in vocab_jaccard_pairs(df, "text", "source").collect()}
    r12 = out[("s1", "s2")]
    assert r12["v_a"] == 4 and r12["v_b"] == 3 and r12["n_shared"] == 2
    assert r12["jaccard"] == pytest.approx(2 / 5)
    # disjoint vocabularies never co-occur on a term: no pair row at all
    assert ("s1", "s3") not in out and ("s2", "s3") not in out


def test_langid_prf1_hand_case(spark):
    from cerebro_spark.operators.text import langid_prf1

    # 'zh' text predicted zh (tp); an 'en' text with no stopwords ->
    # predicted unknown (en recall hit); an 'fr' label on accented text ok
    docs = [("你好 世界", "zh"),
            ("the cat and the dog of it", "en"),
            ("zxqj vvkw ppty", "en"),
            ("où est la fenêtre", "fr")]
    df = spark.createDataFrame(docs, "text string, lang string")
    out = {r["lang"]: r for r in langid_prf1(df, "text", "lang").collect()}
    assert out["zh"]["tp"] == 1 and out["zh"]["f1"] == pytest.approx(1.0)
    assert out["en"]["n_true"] == 2 and out["en"]["tp"] == 1
    assert out["en"]["recall"] == pytest.approx(0.5)
    assert out["fr"]["f1"] == pytest.approx(1.0)
    # 'unknown' never true: recall NULL, precision 0
    assert out["unknown"]["n_true"] == 0
    assert out["unknown"]["recall"] is None
    assert out["unknown"]["precision"] == pytest.approx(0.0)


def test_dedup_savings_hand_case(spark):
    from cerebro_spark.operators.dedup import dedup_savings

    docs = [("aaa", 3), ("aaa", 3), ("aaa", 3), ("bb", 2), ("c", 1)]
    df = spark.createDataFrame(docs, "text string, n_chars long")
    out = dedup_savings(df, "text", "n_chars").collect()[0]
    assert out["n_docs"] == 5 and out["n_groups"] == 3
    assert out["n_dup_docs"] == 2
    assert out["bytes_total"] == 12 and out["bytes_dup"] == 6
    assert out["dup_ratio"] == pytest.approx(0.5)
    assert out["max_group"] == 3


def test_concentration_hand_case(spark):
    from cerebro_spark.operators.profile import concentration_at

    # one whale = 90 of total 100: exactly 1 unit reaches 90%
    rows = [(1, 90.0)] + [(u, 1.0) for u in range(2, 12)]
    df = spark.createDataFrame(rows, "u long, v double")
    out = concentration_at(df, "u", "v", 90, 100).collect()[0]
    assert out["n_units"] == 11
    assert out["total"] == pytest.approx(100.0)
    assert out["k_units"] == 1
    assert out["share_of_units"] == pytest.approx(round(1 / 11, 6))


def test_concentration_uniform(spark):
    from cerebro_spark.operators.profile import concentration_at

    # 10 equal units: 90% needs ceil(9.0) = 9 units
    rows = [(u, 5.0) for u in range(10)]
    df = spark.createDataFrame(rows, "u long, v double")
    out = concentration_at(df, "u", "v", 90, 100).collect()[0]
    assert out["k_units"] == 9
    assert out["share_of_units"] == pytest.approx(0.9)


# ---------------------------------------------------------------------------
# rmst
# ---------------------------------------------------------------------------

def _rmst(spark, rows, tau):
    from cerebro_spark.operators.profile import rmst

    df = spark.createDataFrame(rows, "t long, censored int")
    return rmst(df, "t", "censored", tau=tau).collect()[0]


def test_rmst_hand_case(spark):
    # events at t=2 (2 of 4) and t=5 (1 of 2); censored at t=5
    # S: [0,2)=1, [2,5)=0.5, [5,..)=0.25
    rows = [(2, 0), (2, 0), (5, 0), (5, 1)]
    out = _rmst(spark, rows, tau=8)
    # area = 1*2 + 0.5*3 + 0.25*3 = 4.25
    assert out["n"] == 4
    assert out["rmst"] == pytest.approx(4.25, abs=1e-6)
    assert out["km_at_tau"] == pytest.approx(0.25, abs=1e-6)
    assert out["median_t"] == 2  # first time S <= 0.5


def test_rmst_tau_before_first_event(spark):
    rows = [(10, 0), (12, 0)]
    out = _rmst(spark, rows, tau=5)
    # nobody dies before tau: S = 1 on [0, 5] -> rmst = tau, S(tau) = 1
    assert out["rmst"] == pytest.approx(5.0)
    assert out["km_at_tau"] == pytest.approx(1.0)


def test_rmst_all_censored(spark):
    rows = [(3, 1), (7, 1)]
    out = _rmst(spark, rows, tau=10)
    assert out["rmst"] == pytest.approx(10.0)
    assert out["km_at_tau"] == pytest.approx(1.0)
    assert out["median_t"] is None
