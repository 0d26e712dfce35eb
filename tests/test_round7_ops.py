"""Round-7 operator batches: URL canonicalization + registered domain,
great-circle (haversine) grid join, Zipf rank-frequency slope, and the
evaluation layer (ROC-AUC, Cohen's kappa, Wasserstein-1 drift, nDCG@k).

Cross-engine value checks live in the oracle gates (``url_canonical_dedup``,
``haversine_pairs``, ``zipf_slope``, ``auc_purchase_value``,
``lang_id_kappa``, ``w1_chars_drift``, ``source_ndcg``); these tests pin
SEMANTICS on hand-built inputs where the right answer is computable by
hand or a tiny pure-Python reference.
"""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# canonicalize_url / registered_domain
# ---------------------------------------------------------------------------

def _canon(spark, urls):
    from cerebro_spark.operators.text import canonicalize_url

    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [
        r["c"] for r in df.select(canonicalize_url(F.col("u")).alias("c")).collect()
    ]


def test_canonicalize_url_collapses_equivalent_forms(spark):
    variants = [
        "https://WWW.Example.COM:8080/Page/7?utm_source=feed&id=2#frag",
        "http://example.com/Page/7/?id=2&utm_campaign=x",
        "example.com/Page/7?id=2",
        "HTTPS://www.Example.com/Page/7?utm_a=x&utm_b=y&id=2",
    ]
    assert set(_canon(spark, variants)) == {"example.com/Page/7?id=2"}


def test_canonicalize_url_preserves_identity_parts(spark):
    # path case, non-tracking params and their ORDER are page identity
    out = _canon(spark, [
        "https://x.com/Page/One?b=2&a=1",
        "https://x.com/Page/one?a=1&b=2",
    ])
    assert out == ["x.com/Page/One?b=2&a=1", "x.com/Page/one?a=1&b=2"]


def test_canonicalize_url_edge_cases(spark):
    out = _canon(spark, [
        "https://x.com/p?utm_source=a&utm_medium=b",  # all params tracking
        "ftp://Files.Example.org/",                   # non-http scheme, bare /
        "localhost:9000/x",                           # schemeless host:port
        "  https://x.com/a  ",                        # whitespace
        "https://x.com/p?utm_a=1&",                   # dangling separator
    ])
    assert out == [
        "x.com/p", "files.example.org", "localhost/x", "x.com/a", "x.com/p",
    ]


def test_canonicalize_url_path_ampersand_is_identity(spark):
    # '&' is a legal RFC 3986 path sub-delim: /a&b is a DIFFERENT page
    # from /a?b, and path segments must never be eaten as tracking params
    out = _canon(spark, [
        "https://x.com/a&b",
        "https://x.com/a?b",
        "https://x.com/a&ref=1/file",
        "https://x.com/section/a&b?id=1&utm_c=2",
    ])
    assert out == [
        "x.com/a&b",
        "x.com/a?b",
        "x.com/a&ref=1/file",
        "x.com/section/a&b?id=1",
    ]
    assert out[0] != out[1]


def test_canonicalize_url_keeps_functional_ref_param(spark):
    # bare ?ref= is a functional identity param on common sites (GitHub's
    # ?ref=<branch>) and must survive; only the ref_src tracking variant
    # (and a custom tracking_params override) strips it
    from cerebro_spark.operators.text import canonicalize_url

    out = _canon(spark, [
        "https://github.com/o/r/tree/main?ref=main",
        "https://github.com/o/r/tree/main?ref=dev",
        "https://x.com/p?ref_src=twsrc&id=1",
    ])
    assert out == [
        "github.com/o/r/tree/main?ref=main",
        "github.com/o/r/tree/main?ref=dev",
        "x.com/p?id=1",
    ]
    # the tracking list is caller-tunable per corpus
    df = spark.createDataFrame([("https://x.com/p?sid=9&id=1",)], "u string")
    row = df.select(
        canonicalize_url(F.col("u"), tracking_params="sid").alias("c")
    ).collect()[0]
    assert row["c"] == "x.com/p?id=1"


def test_canonicalize_url_idempotent(spark):
    from cerebro_spark.operators.text import canonicalize_url

    urls = [
        "https://WWW.Example.COM:8080/Page/7/?utm_source=f&id=2#z",
        "http://a.co.uk/x?utm_a=1&q=2&utm_b=3",
        "x.com",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    once = df.select(canonicalize_url(F.col("u")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c2"), "c")
    assert all(r["c2"] == r["c"] for r in twice.collect())


def test_registered_domain_profiles(spark):
    from cerebro_spark.operators.text import registered_domain

    cases = {
        "en.wikipedia.org/wiki/X": "wikipedia.org",
        "sub.example.co.uk/a": "example.co.uk",
        "deep.sub.example.com.au": "example.com.au",
        "example.com": "example.com",
        "localhost": "localhost",  # no dot -> the host itself
        "news.bbc.ac.uk": "bbc.ac.uk",
    }
    df = spark.createDataFrame([(u,) for u in cases], "u string")
    out = {
        r["u"]: r["d"]
        for r in df.select("u", registered_domain(F.col("u")).alias("d")).collect()
    }
    assert out == cases


# ---------------------------------------------------------------------------
# haversine_grid_join
# ---------------------------------------------------------------------------

def _hav_km(lat1, lon1, lat2, lon2):
    R = 6371.0088
    sp = math.sin(math.radians(lat2 - lat1) / 2)
    sl = math.sin(math.radians(lon2 - lon1) / 2)
    h = sp * sp + math.cos(math.radians(lat1)) * math.cos(
        math.radians(lat2)
    ) * (sl * sl)
    return 2 * R * math.asin(min(1.0, math.sqrt(h)))


def _planted_points(n, seed_mult):
    # deterministic pseudo-scatter over |lat|<=65, full lon range —
    # includes points hugging the antimeridian on both sides
    pts = []
    for i in range(n):
        lat = ((i * seed_mult * 37) % 1300) / 10.0 - 65.0
        lon = ((i * seed_mult * 61) % 3600) / 10.0 - 180.0
        pts.append((i, lat, lon))
    pts.append((n, 64.0, 179.95))      # antimeridian straddle pair
    pts.append((n + 1, 64.05, -179.95))
    return pts


def test_haversine_join_matches_bruteforce(spark):
    from cerebro_spark.operators.joins import haversine_grid_join

    left = _planted_points(120, 7)
    right = _planted_points(90, 11)
    ldf = spark.createDataFrame(
        [(i, la, lo) for i, la, lo in left], "lid long, lat double, lon double"
    )
    rdf = spark.createDataFrame(
        [(i, la, lo) for i, la, lo in right], "rid long, lat double, lon double"
    )
    r = 300.0
    got = {
        (row["lid"], row["rid"]): row["dist_km"]
        for row in haversine_grid_join(
            ldf.select("lid", "lat", "lon"),
            rdf.select("rid", F.col("lat").alias("rlat"), F.col("lon").alias("rlon"))
            .withColumnRenamed("rlat", "lat")
            .withColumnRenamed("rlon", "lon"),
            radius_km=r,
            max_abs_lat=66.0,
        ).select("lid", "rid", "dist_km").collect()
    }
    want = {}
    for li, lla, llo in left:
        for ri, rla, rlo in right:
            d = _hav_km(lla, llo, rla, rlo)
            if d <= r:
                want[(li, ri)] = round(d, 3)
    assert got == want
    assert want, "planted set must produce at least one pair"
    # the antimeridian STRADDLE pairs — left (64.0, 179.95) with right
    # (64.05, -179.95) and vice versa, ~11 km apart ACROSS ±180 — are found
    assert (120, 91) in got and 0.0 < got[(120, 91)] < 15.0
    assert (121, 90) in got and 0.0 < got[(121, 90)] < 15.0


def test_haversine_join_excludes_polar_rows(spark):
    from cerebro_spark.operators.joins import haversine_grid_join

    ldf = spark.createDataFrame(
        [(1, 80.0, 0.0), (2, 50.0, 0.0)], "lid long, lat double, lon double"
    )
    rdf = spark.createDataFrame(
        [(1, 80.0, 0.1), (2, 50.0, 0.1)], "rid long, lat double, lon double"
    )
    out = haversine_grid_join(ldf, rdf, radius_km=100.0, max_abs_lat=66.0)
    pairs = {(r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()}
    assert pairs == {(2, 2)}  # the 80-degree rows are outside the band


def test_haversine_join_hot_cell_cap(spark):
    from cerebro_spark.operators.joins import haversine_grid_join

    # 50 left points co-located in one cell + 1 isolated elsewhere
    left = [(i, 10.0, 10.0) for i in range(50)] + [(99, -30.0, 120.0)]
    right = [(1, 10.0, 10.01), (2, -30.0, 120.01)]
    ldf = spark.createDataFrame(left, "lid long, lat double, lon double")
    rdf = spark.createDataFrame(right, "rid long, lat double, lon double")
    out = haversine_grid_join(
        ldf, rdf, radius_km=50.0, max_cell_size=10
    )
    pairs = {(r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()}
    assert pairs == {(99, 2)}  # hot cell dropped pre-join, isolated survives


def test_haversine_known_distance(spark):
    from cerebro_spark.operators.joins import haversine_grid_join

    # 1 degree of latitude at the equator = pi*R/180 = 111.195 km
    ldf = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, lat double, lon double")
    rdf = spark.createDataFrame([(1, 1.0, 0.0)], "rid long, lat double, lon double")
    row = haversine_grid_join(ldf, rdf, radius_km=120.0).collect()[0]
    assert row["dist_km"] == pytest.approx(111.195, abs=0.001)


def test_haversine_rejects_bad_band(spark):
    from cerebro_spark.operators.joins import haversine_grid_join

    df = spark.createDataFrame([(1, 0.0, 0.0)], "i long, lat double, lon double")
    with pytest.raises(ValueError, match="max_abs_lat"):
        haversine_grid_join(df, df, radius_km=10.0, max_abs_lat=90.0)
    for bad_r in (0.0, -5.0):
        with pytest.raises(ValueError, match="radius_km"):
            haversine_grid_join(df, df, radius_km=bad_r)


# ---------------------------------------------------------------------------
# zipf_slope
# ---------------------------------------------------------------------------

def _zipf_ref(counts, top_n=200):
    """Pure-Python twin of text.zipf_slope's quantized ln-ln OLS."""
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_n]
    pts = [
        (
            math.floor(math.log(rank) * 1e6 + 0.5),
            math.floor(math.log(c) * 1e6 + 0.5),
        )
        for rank, (_t, c) in enumerate(top, start=1)
    ]
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    dxy, dxx, dyy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return (
        n,
        round(float(dxy) / float(dxx), 6),
        round(float(dxy) * float(dxy) / (float(dxx) * float(dyy)), 6),
        top[0][0],
        top[0][1],
    )


def test_zipf_slope_matches_python_reference(spark):
    from cerebro_spark.operators.text import zipf_slope

    # planted power law: term t_k appears floor(600/k) times
    counts = {f"t{k:02d}": 600 // k for k in range(1, 31)}
    docs = " ".join(" ".join([t] * c) for t, c in sorted(counts.items()))
    df = spark.createDataFrame([(docs,)], "text string")
    row = zipf_slope(df, top_n=20).collect()[0]
    n, slope, r2, top_term, top_count = _zipf_ref(counts, top_n=20)
    assert row["n_terms"] == n == 20
    assert row["zipf_slope"] == slope
    assert row["r2"] == r2
    assert (row["top_term"], row["top_count"]) == (top_term, top_count)
    # a floor(C/k) corpus is Zipfian: slope near -1, tight fit
    assert -1.1 < row["zipf_slope"] < -0.9 and row["r2"] > 0.99


def test_zipf_slope_flat_corpus_is_degenerate_safe(spark):
    from cerebro_spark.operators.text import zipf_slope

    # every term equally frequent: dyy = 0 -> r2 NULL, slope 0
    df = spark.createDataFrame([("a b c d a b c d",)], "text string")
    row = zipf_slope(df, top_n=10).collect()[0]
    assert row["n_terms"] == 4
    assert row["zipf_slope"] == 0.0
    assert row["r2"] is None


# ---------------------------------------------------------------------------
# roc_auc
# ---------------------------------------------------------------------------

def _auc_ref(pairs, quant=100):
    """Midrank Mann-Whitney AUC over quantized scores, pure Python."""
    from collections import Counter

    q = [(math.floor(s * quant + 0.5), y) for s, y in pairs]
    counts = Counter(s for s, _ in q)
    pos_at = Counter(s for s, y in q if y)
    s2 = 0
    cum = 0
    for s in sorted(counts):
        s2 += pos_at.get(s, 0) * (2 * cum + counts[s] + 1)
        cum += counts[s]
    P = sum(1 for _, y in q if y)
    N = len(q) - P
    return round((s2 - P * (P + 1)) / (2.0 * P * N), 6)


def test_roc_auc_matches_python_reference(spark):
    from cerebro_spark.operators.profile import roc_auc

    # separable + tied block: positives high, one tied clump in the middle
    pairs = (
        [(10.0 + i, True) for i in range(5)]
        + [(5.0, True), (5.0, False), (5.0, False)]
        + [(1.0 + i * 0.5, False) for i in range(6)]
    )
    df = spark.createDataFrame(pairs, "score double, y boolean")
    row = roc_auc(df, "score", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (6, 8)
    assert row["auc"] == _auc_ref(pairs)
    assert 0.9 < row["auc"] < 1.0  # tied clump keeps it below perfect


def test_roc_auc_perfect_random_and_degenerate(spark):
    from cerebro_spark.operators.profile import roc_auc

    perfect = [(float(i), i >= 5) for i in range(10)]
    df = spark.createDataFrame(perfect, "score double, y boolean")
    assert roc_auc(df, "score", "y").collect()[0]["auc"] == 1.0

    # all scores identical: AUC = 0.5 exactly (pure midrank ties)
    flat = [(1.0, i % 2 == 0) for i in range(10)]
    df = spark.createDataFrame(flat, "score double, y boolean")
    assert roc_auc(df, "score", "y").collect()[0]["auc"] == 0.5

    # no negatives -> NULL
    allpos = [(float(i), True) for i in range(5)]
    df = spark.createDataFrame(allpos, "score double, y boolean")
    assert roc_auc(df, "score", "y").collect()[0]["auc"] is None


# ---------------------------------------------------------------------------
# cohens_kappa
# ---------------------------------------------------------------------------

def test_cohens_kappa_textbook_case(spark):
    from cerebro_spark.operators.profile import cohens_kappa

    # classic 2x2: raters agree on 20 yes + 15 no of 50; marginals 25/25
    # and 30/20 -> p_o = 0.7, p_e = 0.5, kappa = 0.4
    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15
        + [("y", "n")] * 5 + [("n", "y")] * 10
    )
    r = cohens_kappa(
        spark.createDataFrame(rows, "a string, b string"), "a", "b"
    ).collect()[0]
    assert r["n"] == 50
    assert r["p_observed"] == 0.7
    assert r["p_expected"] == 0.5
    assert r["kappa"] == pytest.approx(0.4)


def test_cohens_kappa_bounds(spark):
    from cerebro_spark.operators.profile import cohens_kappa

    # perfect agreement -> 1.0
    rows = [("a", "a")] * 5 + [("b", "b")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] == 1.0
    # both raters constant (p_e = 1) -> NULL
    rows = [("a", "a")] * 5
    df = spark.createDataFrame(rows, "a string, b string")
    assert cohens_kappa(df, "a", "b").collect()[0]["kappa"] is None


# ---------------------------------------------------------------------------
# w1_drift
# ---------------------------------------------------------------------------

def test_w1_drift_identical_and_extreme(spark):
    from cerebro_spark.operators.profile import w1_drift

    # two groups with IDENTICAL distributions -> both w1 = 0
    rows = [("a", v) for v in range(100)] + [("b", v) for v in range(100)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in w1_drift(df, "v", "g", n_buckets=10).collect()}
    assert out["a"]["w1_norm"] == 0.0 and out["b"]["w1_norm"] == 0.0

    # group at the bottom bucket vs group at the top: each group's CDF
    # differs from the pooled 50/50 CDF by 0.5 over 9 of 10 buckets
    rows = [("lo", 0)] * 50 + [("hi", 99)] * 50
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in w1_drift(df, "v", "g", n_buckets=10).collect()}
    assert out["lo"]["w1_norm"] == pytest.approx(0.45)
    assert out["hi"]["w1_norm"] == pytest.approx(0.45)
    assert out["lo"]["w1_units"] == pytest.approx(45.0)


def test_w1_drift_shift_is_linear(spark):
    from cerebro_spark.operators.profile import w1_drift

    # shifting a uniform block by k buckets moves W1 by k/n_buckets
    rows = [("base", v) for v in range(100)] + [
        ("shift", v + 200) for v in range(100)
    ]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in w1_drift(df, "v", "g", n_buckets=30).collect()}
    # continuous truth: |F_group − F_pool| ramps 0→0.5 over the group's own
    # block, holds 0.5 across the gap, ramps back — ∫ = (25+50+25)/300 = 1/3,
    # and the 10-unit buckets tile the piecewise-linear CDFs exactly
    assert out["shift"]["w1_norm"] == out["base"]["w1_norm"]
    assert out["shift"]["w1_norm"] == pytest.approx(1 / 3, abs=1e-6)


# ---------------------------------------------------------------------------
# ndcg_at_k
# ---------------------------------------------------------------------------

def test_ndcg_matches_python_reference(spark):
    from cerebro_spark.operators.text import ndcg_at_k

    def ref(rels_in_rank_order, n_rel, k=10):
        qw = [math.floor(1e6 / math.log2(i + 1) + 0.5) for i in range(1, k + 1)]
        dcg = sum(r * qw[i] for i, r in enumerate(rels_in_rank_order[:k]))
        idcg = sum(qw[: min(k, n_rel)])
        return round(dcg / idcg, 6)

    # group g1: 12 docs ranked by score desc, relevant at ranks 1,3,11
    rows = []
    for i in range(12):
        rows.append(("g1", float(100 - i), i, i in (0, 2, 10)))
    # group g2: perfect ranking (both relevant docs on top)
    rows += [("g2", 9.0, 100, True), ("g2", 8.0, 101, True), ("g2", 7.0, 102, False)]
    # group g3: no relevant docs
    rows += [("g3", 1.0, 200, False)]
    df = spark.createDataFrame(rows, "g string, s double, i long, r boolean")
    out = {r["g"]: r for r in ndcg_at_k(df, "g", "s", "r", "i", k=10).collect()}
    g1 = [1 if i in (0, 2, 10) else 0 for i in range(12)]
    assert out["g1"]["ndcg_at_10"] == ref(g1, 3)
    assert out["g1"]["ndcg_at_10"] < 1.0  # the rank-11 hit is outside top-10
    assert out["g2"]["ndcg_at_10"] == 1.0
    assert out["g3"]["ndcg_at_10"] is None
    assert (out["g1"]["n_docs"], out["g1"]["n_rel"]) == (12, 3)


# ---------------------------------------------------------------------------
# did_estimate
# ---------------------------------------------------------------------------

def test_did_estimate_hand_cells(spark):
    from cerebro_spark.operators.profile import did_estimate

    # control: 10 -> 12 (+2); treated: 20 -> 27 (+7) => DiD = +5
    rows = (
        [(10.0, False, False)] * 4 + [(12.0, False, True)] * 2
        + [(20.0, True, False)] * 3 + [(27.0, True, True)] * 5
    )
    df = spark.createDataFrame(rows, "value double, t boolean, p boolean")
    r = did_estimate(df, "value", "t", "p").collect()[0]
    assert (r["n_c_pre"], r["n_c_post"], r["n_t_pre"], r["n_t_post"]) == (4, 2, 3, 5)
    assert (r["mean_c_pre"], r["mean_c_post"]) == (10.0, 12.0)
    assert (r["mean_t_pre"], r["mean_t_post"]) == (20.0, 27.0)
    assert r["did"] == 5.0


def test_did_estimate_empty_cell_is_null(spark):
    from cerebro_spark.operators.profile import did_estimate

    rows = [(1.0, False, False), (2.0, True, True)]  # no c_post / t_pre
    df = spark.createDataFrame(rows, "value double, t boolean, p boolean")
    r = did_estimate(df, "value", "t", "p").collect()[0]
    assert r["did"] is None


# ---------------------------------------------------------------------------
# neyman_allocation
# ---------------------------------------------------------------------------

def test_neyman_allocation_hand_strata(spark):
    from cerebro_spark.operators.sampling import neyman_allocation

    # stratum a: n=4, values {0,2,0,2} -> s^2 = 4/3, sd = 1.154701
    # stratum b: n=8, values {0,6,0,6,...} -> s^2 = 72/7... use {0,6}x4:
    #   mean 3, ss deviations 9*8 = 72, var = 72/7, sd = 3.207135
    # stratum c: constant -> sd NULL, weight 0
    rows = (
        [("a", 0.0), ("a", 2.0), ("a", 0.0), ("a", 2.0)]
        + [("b", 0.0), ("b", 6.0)] * 4
        + [("c", 5.0)] * 3
        + [("d", 9.0)]
    )
    df = spark.createDataFrame(rows, "h string, v double")
    out = {r["h"]: r for r in neyman_allocation(df, "v", "h", k=1000).collect()}
    assert out["a"]["sd"] == pytest.approx(math.sqrt(4 / 3), abs=1e-6)
    assert out["b"]["sd"] == pytest.approx(math.sqrt(72 / 7), abs=1e-6)
    # constant stratum: sd is truly 0.0 (and earns nothing); single-row
    # stratum: variance undefined -> NULL sd, zero weight
    assert out["c"]["sd"] == 0.0 and out["c"]["share"] == 0.0
    assert out["d"]["sd"] is None and out["d"]["share"] == 0.0
    wa, wb = 4 * math.sqrt(4 / 3), 8 * math.sqrt(72 / 7)
    assert out["a"]["share"] == pytest.approx(wa / (wa + wb), abs=1e-5)
    assert out["b"]["share"] == pytest.approx(wb / (wa + wb), abs=1e-5)
    assert out["a"]["n_alloc"] + out["b"]["n_alloc"] in (999, 1000, 1001)
    assert out["b"]["n_alloc"] > out["a"]["n_alloc"]  # bigger and wilder
