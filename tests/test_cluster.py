"""Connected components / duplicate-cluster resolution."""

from pyspark.sql import functions as F

from cerebro_spark.operators.cluster import (
    connected_components,
    duplicate_clusters,
    resolve_duplicates,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["id"]: r["component"] for r in connected_components(df).collect()
    }


def test_two_clusters_and_chain(spark):
    # cluster {1,2,3} (triangle), chain {10..15} (diameter 5), pair {20,21}
    edges = (
        [(1, 2), (2, 3), (1, 3)]
        + [(i, i + 1) for i in range(10, 15)]
        + [(20, 21)]
    )
    got = _cc(spark, edges)
    assert {k: v for k, v in got.items() if k < 10} == {1: 1, 2: 1, 3: 1}
    assert {k: v for k, v in got.items() if 10 <= k < 20} == {
        i: 10 for i in range(10, 16)
    }
    assert {k: v for k, v in got.items() if k >= 20} == {20: 20, 21: 20}


def test_long_chain_logn_rounds(spark):
    # 64-node chain: diameter 63 ≫ the ~12 star rounds available — only an
    # O(log n) contraction converges; plain neighbor propagation would not.
    edges = [(i, i + 1) for i in range(64)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(65)}


def test_reversed_and_duplicate_edges(spark):
    got = _cc(spark, [(2, 1), (1, 2), (3, 2), (2, 3), (3, 3)])
    assert got == {1: 1, 2: 1, 3: 1}


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_duplicate_clusters_and_resolve(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 5), (6, 7)], "id_a long, id_b long"
    )
    cl = {
        (r["doc_id"]): (r["canonical_id"], r["cluster_size"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert cl == {1: (1, 3), 3: (1, 3), 5: (1, 3), 6: (6, 2), 7: (6, 2)}
    kept = sorted(
        r["doc_id"] for r in resolve_duplicates(docs, pairs).collect()
    )
    # canonical 1 and 6 kept; 3, 5, 7 dropped; isolated 0,2,4 kept
    assert kept == [0, 1, 2, 4, 6]


# --- HITS --------------------------------------------------------------


def test_hits_one_iteration_exact(spark):
    # h1 -> {a1, a2}, h2 -> {a1}.  After one L1-normalized iteration:
    # a_raw = (a1: 2e9, a2: 1e9), Ta = 3e9 -> a1 = floor(2/3*1e9+.5),
    # h_raw = (h1: a1+a2 = 1e9, h2: a1), Th = 1_666_666_667.
    from cerebro_spark.operators.cluster import hits

    e = spark.createDataFrame(
        [("h1", "a1"), ("h1", "a2"), ("h2", "a1")], "src string, dst string"
    )
    auths, hubs = hits(e, iterations=1)
    a = {r["node"]: r["authority"] for r in auths.collect()}
    h = {r["node"]: r["hub"] for r in hubs.collect()}
    assert a == {"a1": 666666667, "a2": 333333333}
    assert h["h1"] == 600000000 and h["h2"] == 400000000


def test_hits_l1_mass_conserved(spark):
    # L1 normalization: each vector sums to `scale` up to n/2 ulps of
    # per-node rounding.
    from cerebro_spark.operators.cluster import hits

    edges = [(f"u{i}", f"v{(i * 7) % 5}") for i in range(20)]
    e = spark.createDataFrame(edges, "src string, dst string")
    auths, hubs = hits(e, iterations=3)
    ta = sum(r["authority"] for r in auths.collect())
    th = sum(r["hub"] for r in hubs.collect())
    assert abs(ta - 1_000_000_000) <= 5
    assert abs(th - 1_000_000_000) <= 20


def test_hits_authority_ordering(spark):
    # The node cited by every hub must out-rank a node cited by one.
    from cerebro_spark.operators.cluster import hits

    e = spark.createDataFrame(
        [("h1", "star"), ("h2", "star"), ("h3", "star"), ("h3", "minor")],
        "src string, dst string",
    )
    auths, _ = hits(e, iterations=2)
    a = {r["node"]: r["authority"] for r in auths.collect()}
    assert a["star"] > a["minor"]


# --- bounded BFS --------------------------------------------------------


def test_bounded_reach_chain(spark):
    from cerebro_spark.operators.cluster import bounded_reach

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
        "src string, dst string",
    )
    got = {r["node"]: r["dist"] for r in bounded_reach(e, ["a"], 3).collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}  # e is 4 hops out


def test_bounded_reach_min_dist_and_multiseed(spark):
    # diamond + cycle: settled nodes are never re-expanded at a larger
    # dist, and two seeds both settle at 0.
    from cerebro_spark.operators.cluster import bounded_reach

    e = spark.createDataFrame(
        [("s", "x"), ("s", "y"), ("x", "z"), ("y", "z"), ("z", "s"),
         ("t", "x")],
        "src string, dst string",
    )
    rows = bounded_reach(e, ["s", "t"], 3).collect()
    got = {r["node"]: r["dist"] for r in rows}
    assert len(rows) == len(got)  # one row per node
    assert got == {"s": 0, "t": 0, "x": 1, "y": 1, "z": 2}


def test_golden_record_survivorship(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.cluster import golden_record

    rows = [
        # cluster 1: freshest name is NULL -> falls back to freshest
        # NON-NULL ('beta', ts=20); city only set on the oldest row
        Row(doc_id=1, c=1, ts=10, name="alpha", city="rome"),
        Row(doc_id=2, c=1, ts=20, name="beta", city=None),
        Row(doc_id=3, c=1, ts=30, name=None, city=None),
        # cluster 2: all-null column stays NULL
        Row(doc_id=4, c=2, ts=5, name=None, city=None),
        # tie on ts -> larger id wins
        Row(doc_id=5, c=3, ts=7, name="x", city=None),
        Row(doc_id=6, c=3, ts=7, name="y", city=None),
    ]
    out = {r["cluster"]: r for r in golden_record(
        spark.createDataFrame(rows), "c", "ts", ["name", "city"]
    ).collect()}
    r1 = out[1]
    assert r1["n_members"] == 3 and r1["last_ts"] == 30
    assert r1["name"] == "beta" and r1["city"] == "rome"
    assert out[2]["name"] is None and out[2]["n_members"] == 1
    assert out[3]["name"] == "y"
