"""IVF ANN: recall vs brute force, determinism, candidate pruning."""

from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    train_ivf_centroids,
)

DIM = 64


def _topk_sets(df):
    rows = df.collect()
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.orderBy("vec_id").limit(20)
    exact = _topk_sets(cosine_topk_bruteforce(emb, queries, k=5))
    # the sf0.001 fixture has only ~50 vectors — use a cluster count that
    # leaves meaningful cluster populations (corpus/n_clusters ≫ k)
    approx = _topk_sets(
        cosine_topk_ivf(emb, queries, DIM, k=5, n_clusters=8, nprobe=3)
    )
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    # 3/8 of the corpus scored; the synthetic embeddings cluster by label,
    # so recall should be well above the 37.5% random floor
    assert hits / total >= 0.6, f"recall {hits}/{total}"


def test_ivf_deterministic(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    c1 = train_ivf_centroids(emb, DIM, n_clusters=8, iters=1)
    c2 = train_ivf_centroids(emb, DIM, n_clusters=8, iters=1)
    assert c1 == c2
    queries = emb.orderBy("vec_id").limit(5)
    r1 = cosine_topk_ivf(emb, queries, DIM, k=3, centroids=c1).collect()
    r2 = cosine_topk_ivf(emb, queries, DIM, k=3, centroids=c2).collect()
    assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


def test_ivf_prunes_candidates(spark, sf_dir):
    """nprobe=1 must score ~1/n_clusters of the corpus per query, not all
    of it (the point of the index)."""
    from cerebro_spark.operators.similarity import _ivf_assign_expr

    emb = load_table(spark, "embeddings", sf_dir)
    cents = train_ivf_centroids(emb, DIM, n_clusters=8)
    assigned = _ivf_assign_expr(emb, cents, "embedding", nprobe=1)
    sizes = [
        r["n"]
        for r in assigned.groupBy("__cluster").agg(F.count("*").alias("n")).collect()
    ]
    n = emb.count()
    assert len(sizes) >= 4  # clusters actually used
    assert max(sizes) < 0.6 * n  # no degenerate all-in-one cluster


def test_persisted_ivf_index_prunes_partitions(spark, sf_dir, tmp_path):
    """Index build → query: results match the in-memory IVF path, and the
    scan reads ONLY the probed cluster directories."""
    from cerebro_spark.io import load_table
    from cerebro_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk_ivf,
        query_ivf_index,
        train_ivf_centroids,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    dim = len(emb.select("embedding").first()["embedding"])
    queries = emb.orderBy("vec_id").limit(2)
    path = str(tmp_path / "ivf")

    build_ivf_index(emb, path, dim, n_clusters=8)
    got = query_ivf_index(spark, path, queries, k=5, nprobe=2)

    # equivalence with the non-persisted path under the same centroids
    cent = spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    centroids = [list(r["centroid"]) for r in cent]
    ref = cosine_topk_ivf(
        emb, queries, dim, k=5, n_clusters=8, nprobe=2, centroids=centroids
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, ref.collect()))

    # pruning: the corpus scan carries a partition IN-filter over fewer
    # than all clusters (inputFiles() lists pre-pruning files, so assert on
    # the executed plan's PartitionFilters instead)
    import re

    plan = got._jdf.queryExecution().toString()
    m = re.search(r"cluster#\d+ IN \(([0-9,]+)\)", plan)
    assert m, plan[-2000:]
    assert 0 < len(m.group(1).split(",")) < 8


def test_append_ivf_index_searchable_no_rewrite(spark, sf_dir, tmp_path):
    """Appended vectors are immediately searchable, assigned with the
    existing centroids, and resident cluster files are not rewritten."""
    import os

    from cerebro_spark.io import load_table
    from cerebro_spark.operators.similarity import (
        append_ivf_index,
        build_ivf_index,
        query_ivf_index,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") < 400), path, dim=64)

    def files():
        out = {}
        for root, _, names in os.walk(f"{path}/corpus"):
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(root, n)
                    out[p] = os.path.getmtime(p)
        return out

    before = files()
    new = emb.filter(F.col("vec_id") >= 400).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    append_ivf_index(new, path)
    after = files()
    # resident files untouched (append adds files, never rewrites)
    for p, mt in before.items():
        assert p in after and after[p] == mt
    assert len(after) > len(before)

    # an appended vector is its own exact match through the index: probe
    # with the ORIGINAL >=400 vectors; the appended twin (id+100000) has
    # cosine 1.0 and must surface in top-k
    probes = emb.filter(F.col("vec_id") >= 480)
    got = query_ivf_index(spark, path, probes, k=3, nprobe=4).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    for qid, neighbors in by_q.items():
        assert qid + 100000 in neighbors, (qid, neighbors)
