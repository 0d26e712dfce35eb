"""Round-7 operator batch: URL canonicalization + registered domain,
great-circle (haversine) grid join, Zipf rank-frequency slope.

Cross-engine value checks live in the oracle gates (``url_canonical_dedup``,
``haversine_pairs``, ``zipf_slope``); these tests pin SEMANTICS on
hand-built inputs where the right answer is computable by hand or a tiny
pure-Python reference.
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
