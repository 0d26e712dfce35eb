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
