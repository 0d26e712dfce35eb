"""Similarity search over embedding columns (driver-mandated extension).

Embeddings are ``array<float>`` columns.  Pairwise dot products / norms are
JVM-side (``aggregate``/``zip_with``); the one exception is the IVF
centroid-argmin (``_ivf_assign_expr``) — a dense (batch×dim)·(dim×k) matmul
that runs as an Arrow-batched numpy kernel because interpreted higher-order
functions evaluate it ~100× slower (measured 0.66 ms/row at k=224).

Scale design:
- brute-force top-k is the correctness baseline: broadcast the (small) query
  set against the corpus → per-corpus-partition local scoring, then a single
  top-k-per-query shuffle (window).  At 100 TB the corpus side stays
  partitioned; only queries broadcast.
- the LSH/IVF variant buckets vectors by random hyperplane signs (cosine LSH):
  candidate set = same-bucket vectors, so the join is bucket-local.  Probing
  multiple band tables trades recall for cost, mirroring MinHash-LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus vectors
    (excluding itself).  Queries are broadcast; ranking is deterministic
    (cosine desc, corpus id asc)."""
    from cerebro_spark.operators.util import ensure_parallelism

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    # single-split local scans would score queries × corpus in one task
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane (LCG; no RNG calls so
    plans are reproducible across runs/executors)."""
    out = []
    state = seed * 2654435761 % (2**32)
    for _ in range(dim):
        state = (state * 1103515245 + 12345) % (2**31)
        out.append((state / 2**30) - 1.0)
    return out


def cosine_lsh_bucket(
    df: DataFrame,
    dim: int,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    num_tables: int = 1,
) -> DataFrame:
    """Sign-of-projection LSH bucket ids (random hyperplane cosine LSH).

    With ``num_tables`` > 1 each vector lands in one bucket per independent
    hash table (bucket ids are table-prefixed) and the output has one row per
    (vector, table) — candidates = any shared bucket.  More tables → higher
    recall at linear candidate cost; this is the recall knob at scale.
    """
    from cerebro_spark.operators.util import ensure_parallelism

    # A raw local parquet corpus can arrive as ONE input split (≤
    # maxPartitionBytes) and serialize the planes×tables dot products through
    # a single task — measured 5× of the whole job at 1M vectors.  On a real
    # multi-split scan this is a no-op passthrough.
    df = ensure_parallelism(df)
    v = F.col(vec_col).cast("array<double>")
    buckets = []
    for t in range(num_tables):
        bucket = F.lit(t).cast("long")
        for p in range(num_planes):
            plane = F.array(
                *[F.lit(x) for x in _hyperplane(dim, seed + t * num_planes + p)]
            )
            bit = (_dot(v, plane) > 0).cast("long")
            bucket = bucket * 2 + bit
        buckets.append(bucket)
    return df.select(
        F.col(id_col),
        v.alias(vec_col),
        F.explode(F.array(*buckets)).alias("bucket"),
    )


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    num_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an LSH bucket in any
    of ``num_tables`` hash tables.  The bucket join replaces the full cross
    product — at scale the corpus is repartitioned by bucket once and reused
    across query batches."""
    cb = cosine_lsh_bucket(
        corpus, dim, num_planes, id_col, vec_col, num_tables=num_tables
    ).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "bucket"
    )
    qb = cosine_lsh_bucket(
        queries, dim, num_planes, id_col, vec_col, num_tables=num_tables
    ).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn(
            "cosine",
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_cosine_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold among LSH-bucket
    candidates (the embedding-based member of the dedup family)."""
    b = cosine_lsh_bucket(df, dim, num_planes, id_col, vec_col)
    a = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "bucket")
    c = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "bucket")
    return (
        a.join(c, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            _dot(F.col("va"), F.col("vb"))
            / (_norm(F.col("va")) * _norm(F.col("vb"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )


def semantic_dedup(
    df: DataFrame,
    dim: int,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    k-means-cluster the embeddings with the deterministic hash-seeded coarse
    quantizer (``train_ivf_centroids``), then mark within-cluster near
    duplicates — a row is DROPPED when a lower-id row in its cluster has
    cosine ≥ threshold.  Returns one row per dropped vector:
    ``(drop_id, keep_id, cosine)`` with keep_id = the most similar
    qualifying lower id (ties by id).  Chains (a~b~c) resolve via
    ``cluster.resolve_duplicates`` over these pairs if a canonical
    representative per group is needed.

    vs ``embedding_cosine_dedup`` (random-hyperplane LSH blocking): the
    learned quantizer adapts blocking to the data's actual cluster structure,
    catching near-dups whose hyperplane signs differ.  Candidate pairs are
    within-cluster only — one shuffle by cluster id; pair blowup per cluster
    is bounded by cluster size, so train k ≈ sqrt(N) clusters (on a hash
    sample) to keep the expected pair count near-linear at 100 TB.
    """
    from cerebro_spark.operators.util import ensure_parallelism

    if centroids is None:
        centroids = train_ivf_centroids(
            df, dim, n_clusters, id_col=id_col, vec_col=vec_col
        )
    assigned = _ivf_assign_expr(
        ensure_parallelism(df), centroids, vec_col, nprobe=1
    )
    a = assigned.select(
        F.col(id_col).alias("keep_id"),
        F.col(vec_col).cast("array<double>").alias("va"),
        "__cluster",
    )
    b = assigned.select(
        F.col(id_col).alias("drop_id"),
        F.col(vec_col).cast("array<double>").alias("vb"),
        "__cluster",
    )
    pairs = (
        a.join(b, "__cluster")
        .filter(F.col("keep_id") < F.col("drop_id"))
        .withColumn(
            "cosine",
            _dot(F.col("va"), F.col("vb"))
            / (_norm(F.col("va")) * _norm(F.col("vb"))),
        )
        .filter(F.col("cosine") >= threshold)
    )
    w = Window.partitionBy("drop_id").orderBy(
        F.col("cosine").desc(), F.col("keep_id").asc()
    )
    return (
        pairs.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .select("drop_id", "keep_id", "cosine")
    )


def norm_stats_by_label(
    df: DataFrame, vec_col: str = "embedding", label_col: str = "label"
) -> DataFrame:
    """Per-label embedding norm statistics — sanity/monitoring aggregate."""
    v = F.col(vec_col).cast("array<double>")
    return (
        df.select(F.col(label_col), _norm(v).alias("nrm"))
        .groupBy(label_col)
        .agg(
            F.avg("nrm").alias("norm_avg"),
            F.min("nrm").alias("norm_min"),
            F.max("nrm").alias("norm_max"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def label_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label mean embedding (the E-step shape of distributed k-means).

    Element-wise mean via posexplode → groupBy (label, dim) → re-assemble
    sorted by dimension.  Two shuffles, both combiner-friendly; dimension
    count is constant so state per group is bounded.
    """
    ex = df.select(
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    )
    per_dim = ex.groupBy(label_col, "dim").agg(
        F.avg("x").alias("mean_x"), F.count(F.lit(1)).alias("n")
    )
    return (
        per_dim.groupBy(label_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("dim"), F.col("mean_x")))
            ).alias("__pairs"),
            F.first("n").alias("n_vectors"),
        )
        .select(
            label_col,
            F.transform(F.col("__pairs"), lambda p: p.mean_x).alias("centroid"),
            "n_vectors",
        )
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 quantization per vector (the storage-side half of a
    100 TB vector store: 4× smaller than float32, dot products stay SIMD-
    friendly): scale = max|v|/127, q_i = round(v_i/scale).

    All JVM-side array expressions (transform/array_max) — no UDF.  The
    quantized vector is emitted as a comma-joined STRING (the correctness
    gate cannot hash raw arrays) plus the per-vector scale; a downstream
    consumer splits or keeps arrays by dropping the final select."""
    absmax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x)))
    scale = absmax / F.lit(127.0)
    q = F.transform(
        F.col(vec_col), lambda x: F.round(x / scale).cast("int").cast("string")
    )
    return (
        df.withColumn("__absmax", absmax)
        .filter(F.col("__absmax") > 0)
        .select(
            F.col(id_col),
            F.round(F.col("__absmax") / 127.0, 6).alias("scale"),
            F.concat_ws(",", q).alias("q"),
        )
    )


def train_ivf_centroids(
    corpus: DataFrame,
    dim: int,
    n_clusters: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer (k-means with hash-seeded init).

    Seeds = the ``n_clusters`` vectors with the smallest portable md5 hash of
    their id (a reproducible "random" sample — no RNG, stable across runs and
    engines), refined by ``iters`` Lloyd steps.  Each step is one broadcast
    argmin assignment + one posexplode/avg aggregation; driver state is only
    the k×dim centroid matrix (collected per step — a bounded aggregate, not
    a data collect).  At 100 TB: train on a hash-sampled slice (e.g.
    ``deterministic_sample``) — the assignment below scans the full corpus
    exactly once either way.
    """
    from pyspark.sql import functions as F

    from cerebro_spark.operators.util import ensure_parallelism

    # the per-row argmin expression costs O(k·dim); small single-file scans
    # must spread it across cores or training serializes on 1-2 tasks
    corpus = ensure_parallelism(corpus)
    v = F.col(vec_col).cast("array<double>")
    hashed = corpus.select(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("__h"),
        v.alias("__v"),
    )
    seeds = hashed.orderBy("__h").limit(n_clusters).collect()
    centroids = [list(r["__v"]) for r in seeds]
    for _ in range(iters):
        assigned = _ivf_assign_expr(corpus, centroids, vec_col, nprobe=1).select(
            F.col("__cluster"), F.posexplode(v).alias("__d", "__x")
        )
        rows = (
            assigned.groupBy("__cluster", "__d")
            .agg(F.avg("__x").alias("m"))
            .collect()
        )
        new = [list(c) for c in centroids]  # empty clusters keep their seed
        by_cluster: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cluster.setdefault(r["__cluster"], {})[r["__d"]] = r["m"]
        for cid, dims in by_cluster.items():
            new[cid] = [dims[d] for d in range(dim)]
        centroids = new
    return centroids


def _ivf_assign_expr(
    df: DataFrame, centroids: list[list[float]], vec_col: str, nprobe: int
) -> DataFrame:
    """Attach ``__cluster`` (nprobe=1) or replicate each row under its
    ``nprobe`` nearest cluster ids — an Arrow-batched numpy matmul kernel.

    This is the one dense linear-algebra hot spot in the engine: scoring a
    row against k centroids is a (batch×dim)·(dim×k) matmul.  SQL higher-
    order functions evaluate it as interpreted per-element lambdas —
    measured 0.66 ms/row at k=224×dim=64 (33 s for 50k rows) in both the
    inlined-literal and nested-array-literal forms, i.e. infeasible at
    vector-store scale — so this is a justified ``mapInPandas``: one BLAS
    matmul per Arrow batch, row order preserved, no shuffle introduced.

    Ranking matches the SQL form it replaces: cosine desc, cluster id asc
    on exact ties (``argmax``/stable ``argsort`` take the first maximum).
    Centroids are L2-normalized in the closure; the row norm is a positive
    per-row scale so it cannot change the per-row ordering and is skipped.
    Precondition: ``vec_col`` is non-null with a uniform dimension.
    """
    import numpy as np

    from pyspark.sql.types import IntegerType, StructField, StructType

    mat = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0.0] = 1.0
    cn_t = np.ascontiguousarray((mat / norms[:, None]).T)
    n_take = 1 if nprobe == 1 else min(nprobe, len(centroids))
    out_schema = StructType(
        df.schema.fields + [StructField("__cluster", IntegerType(), False)]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            scores = x @ cn_t
            if n_take == 1:
                out = pdf.copy()
                out["__cluster"] = np.argmax(scores, axis=1).astype("int32")
                yield out
            else:
                top = np.argsort(-scores, axis=1, kind="stable")[:, :n_take]
                rep = pdf.loc[pdf.index.repeat(n_take)].reset_index(drop=True)
                rep["__cluster"] = top.reshape(-1).astype("int32")
                yield rep

    return df.mapInPandas(assign, schema=out_schema)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF index: corpus vectors live in exactly one
    coarse cluster; each query scores only the ``nprobe`` nearest clusters.
    Candidate fraction ≈ nprobe/n_clusters of the corpus (vs LSH's
    bucket-collision fraction) — the standard trade: IVF prunes adaptively
    where the data actually clusters, LSH needs no training.

    At scale: the assignment is a narrow map over the corpus scan; the
    probe join shuffles candidates by cluster id once, and the per-query
    top-k merges per-partition (no global window)."""
    from pyspark.sql import functions as F

    from cerebro_spark.operators.util import ensure_parallelism

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, dim, n_clusters, id_col=id_col, vec_col=vec_col
        )
    c = _ivf_assign_expr(
        ensure_parallelism(corpus), centroids, vec_col, nprobe=1
    ).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        "__cluster",
    )
    q = _ivf_assign_expr(queries, centroids, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        "__cluster",
    )
    scored = (
        c.join(F.broadcast(q), "__cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist an IVF index: centroids + the corpus PARTITIONED BY CLUSTER.

    The partition layout is the index: a probe query filters on
    ``__cluster`` literals, so the parquet scan reads only the nprobe
    cluster directories — ANN pruning happens at the STORAGE layer via
    ordinary partition pruning, nothing custom at read time.  Rebuild is a
    full rewrite (centroids drift as the corpus grows); at 100 TB that's a
    periodic job, like the reference's batch ETL cadence.
    """
    from pyspark.sql import functions as F

    from cerebro_spark.operators.util import ensure_parallelism

    centroids = train_ivf_centroids(
        corpus, dim, n_clusters, id_col=id_col, vec_col=vec_col
    )
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    spark = corpus.sparkSession
    from cerebro_spark.operators.util import small_df

    small_df(
        spark, rows, "cluster int, centroid array<double>"
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    assigned = _ivf_assign_expr(
        ensure_parallelism(corpus), centroids, vec_col, nprobe=1
    ).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
        F.col("__cluster").alias("cluster"),
    )
    (
        assigned.repartition(n_clusters, "cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(f"{path}/corpus")
    )


def append_ivf_index(
    new_vectors: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally grow a persisted IVF index: assign new vectors to the
    EXISTING centroids and append them partition-wise — no retrain, no
    rewrite of resident partitions.  The ingest-time companion of
    ``build_ivf_index``'s periodic full rebuild (the standard IVF serving
    trade: appended vectors are searchable immediately at the cost of
    slowly-staling centroids; rebuild cadence bounds the drift).

    Scale shape per append: one narrow assignment map over the new batch +
    one ``repartition(cluster)`` append touching only the clusters the
    batch lands in — O(batch), independent of index size."""
    from pyspark.sql import functions as F

    spark = new_vectors.sparkSession
    cent_rows = (
        spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    )
    centroids = [list(r["centroid"]) for r in cent_rows]
    assigned = _ivf_assign_expr(new_vectors, centroids, vec_col, nprobe=1).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
        F.col("__cluster").alias("cluster"),
    )
    (
        assigned.repartition(len(centroids), "cluster")
        .write.mode("append")
        .partitionBy("cluster")
        .parquet(f"{path}/corpus")
    )


def query_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine over a persisted IVF index.  The union of the probed
    cluster ids (bounded: |queries| × nprobe, and queries are broadcast-
    sized by design) becomes an IN-list filter on the partition column —
    check ``PartitionFilters`` in the scan: only those directories are
    read."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cent = spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    centroids = [list(r["centroid"]) for r in cent]
    q = _ivf_assign_expr(queries, centroids, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col("__cluster").alias("cluster"),
    )
    probed = sorted({r["cluster"] for r in q.select("cluster").distinct().collect()})
    corpus = spark.read.parquet(f"{path}/corpus").filter(
        F.col("cluster").isin(probed)
    )
    scored = (
        corpus.join(F.broadcast(q), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding"))),
        )
        .withColumnRenamed("vec_id", "neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# product quantization (round 5): embedding compression for vector stores
# ---------------------------------------------------------------------------

def train_pq_codebooks(
    corpus: DataFrame,
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    iters: int = 8,
    sample_cap: int = 65536,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic product-quantization codebooks: split ``dim`` into
    ``m`` subspaces and k-means each subspace independently (Jégou et al.
    2011, "Product quantization for nearest neighbor search").

    Training runs driver-side numpy over a HASH-SAMPLED slice (smallest
    ``sample_cap`` md5-of-id rows — reproducible, no RNG): codebooks are
    m·k·(dim/m) floats whose quality saturates long before corpus size
    matters, so at 100 TB this is the standard sample-train/full-encode
    split; the full-corpus pass happens only in ``pq_encode``.  Seeds per
    subspace = the k hash-smallest sample rows (same discipline as
    ``train_ivf_centroids``); empty clusters re-seed to the farthest point
    so every codebook keeps k distinct entries.
    """
    import numpy as np

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m
    hashed = corpus.select(
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("__h"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    sample = hashed.orderBy("__h").limit(sample_cap).collect()
    x = np.asarray([r["__v"] for r in sample], dtype=np.float64)
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = x[:, j * d_sub : (j + 1) * d_sub]
        cent = sub[: k].copy()  # hash-order seeds (rows arrive hash-sorted)
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            code = np.argmin(d2, axis=1)
            new_cent = cent.copy()
            empties = []
            for c in range(k):
                mask = code == c
                if mask.any():
                    new_cent[c] = sub[mask].mean(axis=0)
                else:
                    empties.append(c)
            if empties:
                # Re-seed each empty cluster to a DISTINCT far point: the
                # 1st, 2nd, … farthest-from-their-centroid sample rows (one
                # shared reseed point would collapse multiple empty clusters
                # to identical entries; duplicate hash-order seed rows self-
                # heal the same way — they empty out in the next assignment
                # and land on distinct far points here).
                order = np.argsort(-d2.min(axis=1))
                for i, c in enumerate(empties):
                    new_cent[c] = sub[order[i % len(order)]]
            cent = new_cent
        books.append(cent.tolist())
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` codebook indices + one packed BIGINT
    (4 bits per code at k=16 → a 64-dim float32 vector compresses 32×,
    which is what lets a 100 TB embedding corpus live in executor memory
    for candidate scoring).

    Arrow-batched numpy kernel (same justification as ``_ivf_assign_expr``:
    the per-subspace argmin is a dense matmul that interpreted SQL lambdas
    evaluate ~100× slower); one pass, row order preserved, no shuffle.
    """
    import numpy as np

    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from cerebro_spark.operators.util import ensure_parallelism

    books = np.asarray(codebooks, dtype=np.float64)  # (m, k, d_sub)
    m, k, d_sub = books.shape
    bits = max(1, int(np.ceil(np.log2(k))))
    if m * bits > 63:
        raise ValueError(f"codes need {m * bits} bits; packing requires <= 63")
    # carry the caller's id column through verbatim — name AND type (a
    # string/uuid id must not be coerced to int64, and the output column
    # keeps the name the caller joins back on)
    id_field = df.schema[id_col]
    out_schema = StructType(
        [
            StructField(id_field.name, id_field.dataType, id_field.nullable),
            StructField("codes", ArrayType(IntegerType(), False), False),
            StructField("packed", LongType(), False),
        ]
    )

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n = x.shape[0]
            codes = np.empty((n, m), dtype=np.int64)
            for j in range(m):
                sub = x[:, j * d_sub : (j + 1) * d_sub]
                # ||s - c||² = ||s||² - 2 s·c + ||c||²; ||s||² is per-row
                # constant → argmin over (-2 s·c + ||c||²), one matmul
                dots = sub @ books[j].T
                d2 = (books[j] ** 2).sum(axis=1)[None, :] - 2.0 * dots
                codes[:, j] = np.argmin(d2, axis=1)
            packed = np.zeros(n, dtype=np.int64)
            for j in range(m):
                packed |= codes[:, j] << (j * bits)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": [c.astype("int32") for c in codes],
                    "packed": packed,
                }
            )

    return ensure_parallelism(df).mapInPandas(encode, out_schema)


def pq_decode(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    codes_col: str = "codes",
    out_col: str = "embedding",
) -> DataFrame:
    """Reconstruct approximate vectors from PQ codes: concatenate each
    subspace's codebook entry.  Pure JVM expression — ``element_at`` into
    the literal codebook arrays — so decode composes with the existing
    brute-force/LSH/IVF scoring operators without another Python stage.
    """
    parts = []
    for j, book in enumerate(codebooks):
        lit = F.array(
            *[F.array(*[F.lit(float(v)) for v in entry]) for entry in book]
        )
        parts.append(
            F.element_at(lit, F.element_at(F.col(codes_col), j + 1) + 1)
        )
    return codes_df.withColumn(out_col, F.flatten(F.array(*parts)))


def cosine_topk_pq(
    corpus_codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k over the COMPRESSED corpus: decode codes to
    reconstructions (32× smaller scan than raw vectors), score against the
    broadcast queries with the exact-ranking expression.  Recall is bounded
    by quantization error — measured in tests/test_pq.py; combine with the
    IVF partition layout for candidate pruning at scale.
    """
    decoded = pq_decode(corpus_codes, codebooks, out_col="__rv")
    rec = decoded.select(
        F.col(id_col).alias("vec_id"), F.col("__rv").alias(vec_col)
    )
    return cosine_topk_bruteforce(rec, queries, k=k, id_col="vec_id", vec_col=vec_col)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-training hard-negative mining: for each query vector, the
    ``k`` most-similar corpus vectors with a DIFFERENT label — the pairs
    that teach a contrastive/triplet objective the most (near the decision
    boundary), mined corpus-wide.

    Same plan as the brute-force top-k (broadcast queries × partitioned
    corpus, per-query window), with the label-mismatch predicate applied
    BEFORE ranking so positives and near-duplicates never crowd out the
    negatives.  At 100 TB, swap the corpus side for the IVF/PQ candidate
    set and re-rank survivors exactly — the operator shape is identical.
    """
    from cerebro_spark.operators.util import ensure_parallelism

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        F.col(label_col).alias("query_label"),
    )
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("negative_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        F.col(label_col).alias("negative_label"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("negative_label") != F.col("query_label"))
        .withColumn(
            "cosine",
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "query_label", "negative_id", "negative_label",
            "cosine", "rank",
        )
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    quantum: float = 1e-9,
) -> DataFrame:
    """Reciprocal-rank fusion of named retrieval rankings (Cormack, Clarke
    & Buettcher, SIGIR 2009): ``rrf(d) = Σ_s 1/(k + rank_s(d))`` over every
    system ``s`` that returned ``d``.  The standard way to combine a
    lexical (BM25) and a semantic (embedding cosine) ranking without score
    calibration — only RANKS enter the fusion, so the systems' score
    scales never have to be reconciled.

    ``rankings`` maps a system tag to its ranking frame ``(id_col,
    rank_col)``; returns ``(id_col, n_systems, rrf)``.

    Scale shape: each input is already a top-k ranking (systems × k rows,
    tiny next to the corpus), so this is one union + one combinable
    groupBy.  Cross-engine determinism: per-system contributions are
    collected per id (bounded by the number of systems, NOT data-sized),
    sorted by the system tag, and folded from 0.0 — float addition is not
    associative, so an unordered SUM would drift in the last ulp between
    engines — then quantized to ``quantum`` with the half-up floor trick.
    A SQL oracle expresses the same fold as ``list_reduce(list_prepend(
    0.0, list(c ORDER BY tag)), (a, b) -> a + b)``.

    Reference parity: the reference has no retrieval engine — extension
    surface next to bm25_topk / cosine_topk_* (hybrid-search serving and
    training-data selection both fuse exactly like this).
    """
    from functools import reduce

    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        rankings[tag].select(
            F.col(id_col).alias("__id"),
            F.lit(tag).alias("t"),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col))).alias("c"),
        )
        for tag in sorted(rankings)
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    q = float(quantum)
    fused = u.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_systems"),
        (
            F.floor(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("t", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                )
                / F.lit(q)
                + F.lit(0.5)
            )
            * F.lit(q)
        ).alias("rrf"),
    )
    return fused.select(F.col("__id").alias(id_col), "n_systems", "rrf")


def cosine_topk_ivf_pq(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
    rerank: int = 32,
    pq_m: int = 8,
    pq_k: int = 128,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """The full billion-scale ANN recipe (IVF-PQ, Jégou 2011 §IV): coarse
    clusters prune WHICH vectors are scored (nprobe/n_clusters of the
    corpus), PQ codes shrink WHAT is scored (32× smaller candidate scan),
    and the top-``rerank`` compressed candidates per query are re-ranked
    EXACTLY from the raw vectors — so the final `cosine` values are true
    cosines, with approximation only in candidate selection.

    Plan: assignment + encode are one Arrow pass each over the corpus; the
    probe join shuffles candidates by cluster id; the rerank join fetches
    ``rerank`` raw vectors per query by id (a semi-join-sized read at
    scale, or a parquet partition-pruned fetch against `build_ivf_index`'s
    layout).  Nothing all-pairs, no global window.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, dim, n_clusters, id_col=id_col, vec_col=vec_col
        )
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, dim, m=pq_m, k=pq_k, id_col=id_col, vec_col=vec_col
        )
    from cerebro_spark.operators.util import ensure_parallelism

    assigned = _ivf_assign_expr(
        ensure_parallelism(corpus), centroids, vec_col, nprobe=1
    )
    codes = pq_encode(assigned, codebooks, id_col=id_col, vec_col=vec_col)
    clusters = assigned.select(
        F.col(id_col).alias("vec_id"), "__cluster"
    )
    compressed = pq_decode(
        codes.join(clusters, "vec_id"), codebooks, out_col="__rv"
    ).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("__rv").alias("cv"),
        "__cluster",
    )
    q = _ivf_assign_expr(queries, centroids, vec_col, nprobe=nprobe).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        "__cluster",
    )
    approx = (
        compressed.join(F.broadcast(q), "__cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "__acos",
            _dot(F.col("qv"), F.col("cv"))
            / (_norm(F.col("qv")) * _norm(F.col("cv"))),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("__acos").desc(), F.col("neighbor_id").asc()
    )
    cands = (
        approx.withColumn("__r", F.row_number().over(wa))
        .filter(F.col("__r") <= rerank)
        .select("query_id", "qv", "neighbor_id")
    )
    raw = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("rawv"),
    )
    exact = cands.join(raw, "neighbor_id").withColumn(
        "cosine",
        _dot(F.col("qv"), F.col("rawv"))
        / (_norm(F.col("qv")) * _norm(F.col("rawv"))),
    )
    we = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(we))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


#: driver-side MMR bounds (see mmr_rerank): the shortlist state is
#: |queries|·n_candidates rows — far under these at any sane rerank
#: configuration; module-level so tests can force the distributed loop.
_MMR_DRIVER_MAX_ROWS = 200_000
_MMR_DRIVER_MAX_CELLS = 10_000_000


def _mmr_greedy_driver(
    cand: DataFrame,
    corpus: DataFrame,
    k: int,
    lam: float,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Driver-side MMR greedy over the parameter-bounded shortlist (see
    mmr_rerank): ONE bounded collect of (candidate row + vector), then
    the k picks in plain Python.  Arithmetic is IEEE-identical to the
    distributed loop: pairwise cosines accumulate dimension-by-dimension
    in array order (the ``_dot`` left-fold, vectorized across pairs via
    rank-1 updates), penalties are exact maxes, and the pick comparator
    is (λ·rel − (1−λ)·pen DESC, neighbor ASC) on binary64 — pinned
    bit-equal to the distributed loop by tests/test_round11_opt.py."""
    import numpy as np
    from pyspark.sql import types as T

    spark = cand.sparkSession
    vecs = corpus.select(
        F.col(id_col).alias("__nid"),
        F.col(vec_col).cast("array<double>").alias("__nv"),
    )
    rows = (
        cand.join(vecs, cand["neighbor_id"] == vecs["__nid"])
        .select("query_id", "neighbor_id", "cosine", "rank", "__nv")
        .collect()
    )
    byq: dict = {}
    for r in rows:
        byq.setdefault(r.query_id, []).append(r)
    out = []
    one_minus = 1.0 - lam
    for qid in sorted(byq):
        rs = sorted(byq[qid], key=lambda r: r.rank)
        ids = [r.neighbor_id for r in rs]
        cos = [r.cosine for r in rs]
        V = np.array([r["__nv"] for r in rs], dtype=np.float64)
        n, d = V.shape
        dots = np.zeros((n, n))
        nrm2 = np.zeros(n)
        for kk in range(d):  # array-order accumulation == the _dot fold
            dots += np.outer(V[:, kk], V[:, kk])
            nrm2 = nrm2 + V[:, kk] * V[:, kk]
        nr = np.sqrt(nrm2)
        sims = dots / (nr[:, None] * nr[None, :])
        chosen = [0]  # rank-1 candidate = pure-relevance pick
        out.append((qid, ids[0], 1, cos[0]))
        for step in range(2, k + 1):
            best = None
            for c in range(n):
                if c in chosen:
                    continue
                pen = max(float(sims[c][s]) for s in chosen)
                score = lam * cos[c] - one_minus * pen
                if (
                    best is None
                    or score > best[0]
                    or (score == best[0] and ids[c] < best[1])
                ):
                    best = (score, ids[c], c)
            if best is None:
                break
            chosen.append(best[2])
            out.append((qid, best[1], step, cos[best[2]]))
    fields = {f.name: f for f in cand.schema.fields}
    schema = T.StructType(
        [
            fields["query_id"],
            fields["neighbor_id"],
            T.StructField("mmr_rank", T.IntegerType(), False),
            fields["cosine"],
        ]
    )
    from cerebro_spark.operators.util import small_df

    return small_df(spark, out, schema)


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_candidates: int = 50,
    lam: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): per query, greedily select ``k`` of the top
    ``n_candidates`` results maximizing
    ``λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)`` — relevance-plus-
    diversity, the standard retrieval de-redundancy pass (and the
    diversified-sampling step of embedding-curated training mixes).

    Output: ``(query_id, neighbor_id, mmr_rank, cosine)`` — mmr_rank is
    the greedy pick order (1 = pure relevance; ties broken by neighbor
    id), cosine the relevance that got the row shortlisted.

    Scale shape: the EXPENSIVE part (corpus scan) is the candidate
    top-k, delegated to :func:`cosine_topk_bruteforce` (swap in the
    IVF/LSH variants upstream for billion-vector corpora).  Everything
    after is bounded by queries×n_candidates rows: one pairwise-sim
    self-join (n_candidates² per query) and k−1 driver iterations of
    anti-join + max-penalty + per-query argmax over that bounded frame —
    each iteration eagerly localCheckpoint'ed so the plan stays linear
    in k instead of doubling per step (selected_i feeds selected_{i+1}
    twice).  JVM-side throughout: the sequential-fold cosine matches any
    engine's list_cosine_similarity bit-for-bit, so the greedy argmax —
    including λ·rel−(1−λ)·pen — is engine-reproducible (pick λ with an
    exactly-representable 1−λ, e.g. 0.5, when an external oracle must
    agree).
    """
    cand = cosine_topk_bruteforce(
        corpus, queries, k=n_candidates, id_col=id_col, vec_col=vec_col
    ).localCheckpoint(eager=True)
    # The post-shortlist state is bounded by PARAMETERS, not data:
    # |queries|·n_candidates rows and ·n_candidates² sims.  When that
    # fits comfortably in the driver (the bt_brand_strengths bounded-
    # matrix contract), run the k greedy picks as plain Python over the
    # collected shortlist instead of k−1 rounds of anti-join + argmax +
    # eager localCheckpoint — identical IEEE arithmetic (λ·rel −
    # (1−λ)·pen on binary64, same tie order), measured 4.4 s -> 1.6 s at
    # sf0.1 with bit-equal output.  A huge query batch (cand rows >
    # 200k) keeps the distributed loop.
    n_cand_rows = cand.count()  # cand is materialized; count is free-ish
    if (
        n_cand_rows * n_candidates <= _MMR_DRIVER_MAX_CELLS
        and n_cand_rows <= _MMR_DRIVER_MAX_ROWS
    ):
        return _mmr_greedy_driver(
            cand, corpus, k, lam, id_col, vec_col
        )
    vecs = corpus.select(
        F.col(id_col).alias("__nid"),
        F.col(vec_col).cast("array<double>").alias("__nv"),
    )
    cand_v = cand.join(vecs, cand["neighbor_id"] == vecs["__nid"]).drop("__nid")
    a = cand_v.select("query_id", F.col("neighbor_id").alias("ia"),
                      F.col("__nv").alias("__va"))
    b = cand_v.select("query_id", F.col("neighbor_id").alias("ib"),
                      F.col("__nv").alias("__vb"))
    pairs = (
        a.join(b, on="query_id")
        .filter(F.col("ia") != F.col("ib"))
        .select(
            "query_id", "ia", "ib",
            (_dot(F.col("__va"), F.col("__vb"))
             / (_norm(F.col("__va")) * _norm(F.col("__vb")))).alias("sim"),
        )
        .localCheckpoint(eager=True)
    )
    selected = (
        cand.filter(F.col("rank") == 1)
        .select("query_id", "neighbor_id", F.lit(1).alias("mmr_rank"),
                "cosine")
        .localCheckpoint(eager=True)
    )
    sel_ids = lambda: selected.select("query_id", "neighbor_id")  # noqa: E731
    for i in range(2, k + 1):
        remaining = cand.join(
            sel_ids(), on=["query_id", "neighbor_id"], how="left_anti"
        )
        pen = (
            pairs.join(
                sel_ids().select(
                    "query_id", F.col("neighbor_id").alias("ib")
                ),
                on=["query_id", "ib"],
            )
            .groupBy("query_id", "ia")
            .agg(F.max("sim").alias("__pen"))
        )
        scored = remaining.join(
            pen,
            (remaining["query_id"] == pen["query_id"])
            & (remaining["neighbor_id"] == pen["ia"]),
        ).select(remaining["query_id"], "neighbor_id", "cosine", "__pen")
        w = Window.partitionBy("query_id").orderBy(
            (F.lit(lam) * F.col("cosine")
             - F.lit(1.0 - lam) * F.col("__pen")).desc(),
            F.col("neighbor_id").asc(),
        )
        pick = (
            scored.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("query_id", "neighbor_id", F.lit(i).alias("mmr_rank"),
                    "cosine")
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=True)
    return selected


def embedding_half_drift(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-label embedding drift between two deterministic halves of the
    corpus (id parity — swap in a time/batch split in production): the
    model-monitoring alarm for "did this label's representation move
    between snapshots".  Output per label: ``(label, n_even, n_odd,
    l1_drift, max_dim, max_dim_drift)`` — L1 distance between half
    centroids plus the single most-drifted dimension (the actionable bit).

    ENGINE-EXACT without rounding the centroids: per (label, dim) the
    e6-quantized element sums are exact BIGINTs, and
    ``mean_e − mean_o = (sₑ·n_o − s_o·nₑ) / (scale·nₑ·n_o)`` shares one
    exact integer numerator — so the per-dim |numerator|s add as integers
    (order-independent) and every emitted double is a single division.
    Compare ``label_centroids``, which must round to 6 dp because it sums
    raw doubles.

    Plan: one combinable groupBy over (label, dim) — 64·|labels| rows —
    then a |labels|-bounded argmax window.  NULL drift when a half is
    empty for a label (never ±Inf).
    """
    from pyspark.sql import Window

    ex = df.select(
        F.col(label_col).alias("label"),
        F.pmod(F.col(id_col), F.lit(2)).alias("__half"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("dim", "x"),
    ).withColumn("__q", F.floor(F.col("x") * scale + F.lit(0.5)).cast("long"))
    per_dim = ex.groupBy("label", "dim").agg(
        F.sum(F.when(F.col("__half") == 0, 1).otherwise(0)).alias("ce"),
        F.sum(F.when(F.col("__half") == 0, F.col("__q")).otherwise(0)).alias("se"),
        F.sum(F.when(F.col("__half") == 1, 1).otherwise(0)).alias("co"),
        F.sum(F.when(F.col("__half") == 1, F.col("__q")).otherwise(0)).alias("so"),
    )
    num = F.abs(F.col("se") * F.col("co") - F.col("so") * F.col("ce"))
    w = Window.partitionBy("label").orderBy(
        num.desc(), F.col("dim").asc()
    )
    ranked = per_dim.withColumn("__num", num).withColumn(
        "__rn", F.row_number().over(w)
    )
    denom = (
        F.lit(float(scale))
        * F.col("n_even").cast("double")
        * F.col("n_odd").cast("double")
    )
    agg = ranked.groupBy("label").agg(
        F.max("ce").alias("n_even"),
        F.max("co").alias("n_odd"),
        F.sum("__num").alias("__l1num"),
        F.max(F.when(F.col("__rn") == 1, F.col("dim"))).alias("max_dim"),
        F.max(F.when(F.col("__rn") == 1, F.col("__num"))).alias("__maxnum"),
    )
    ok = (F.col("n_even") > 0) & (F.col("n_odd") > 0)
    return agg.select(
        "label", "n_even", "n_odd",
        F.when(ok, F.col("__l1num").cast("double") / denom).alias("l1_drift"),
        "max_dim",
        F.when(ok, F.col("__maxnum").cast("double") / denom)
        .alias("max_dim_drift"),
    )


def jl_sign_matrix(in_dim: int, out_dim: int, seed: int = 0) -> "list[list[int]]":
    """Deterministic ±1 Johnson–Lindenstrauss sign matrix — entry (i, j)
    is +1 iff the md5 of ``"{seed}:{i}:{j}"`` has an even first-32-bit
    word.  Any engine (or the SQL oracle) reproduces it from the same
    hash, so the projection is a pure function of the data."""
    import hashlib

    return [
        [
            1
            if int(
                hashlib.md5(f"{seed}:{i}:{j}".encode()).hexdigest()[:8], 16
            ) % 2 == 0
            else -1
            for j in range(out_dim)
        ]
        for i in range(in_dim)
    ]


def jl_project(
    df: DataFrame,
    vec_col: str = "embedding",
    in_dim: int = 64,
    out_dim: int = 16,
    seed: int = 0,
    out_col: str = "proj",
) -> DataFrame:
    """Johnson–Lindenstrauss sign random projection (Achlioptas 2003):
    append ``out_col`` = the ``out_dim``-d projection y with
    ``y_j = (1/√k)·Σᵢ s_ij·x_i`` over the deterministic ±1 matrix from
    :func:`jl_sign_matrix`.  Norms (hence pairwise distances) are
    preserved in expectation — the cheap dimensionality-reduction front
    end for brute-force cosine / LSH when 64-d is still too wide to scan.

    Exactness: each y_j is a LEFT FOLD over the array in index order
    (``aggregate(zip_with(...))``) of float→double exact products — a
    fixed IEEE chain any engine reproduces term-for-term (the oracle
    unrolls the identical left-associated sum).  No shuffle, no Python:
    out_dim·in_dim codegen'd multiply-adds per row."""
    signs = jl_sign_matrix(in_dim, out_dim, seed)
    import math

    inv = 1.0 / math.sqrt(float(out_dim))
    comps = []
    for j in range(out_dim):
        scol = F.array(*[F.lit(float(signs[i][j])) for i in range(in_dim)])
        z = F.aggregate(
            F.zip_with(
                F.col(vec_col), scol, lambda x, s: x.cast("double") * s
            ),
            F.lit(0.0),
            lambda a, y: a + y,
        )
        comps.append(z * F.lit(inv))
    return df.withColumn(out_col, F.array(*comps))


def mutual_nn_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
) -> DataFrame:
    """Mutual-nearest-neighbor pairs within blocks — ``(id_a, id_b,
    cosine)`` for every pair where each vector is the OTHER's top-1
    cosine neighbor inside its block.  The high-precision alignment
    primitive (bitext mining, cross-dump duplicate verification,
    embedding-space entity linking): a one-directional top-1 is noisy,
    a RECIPROCAL top-1 is the classic margin-free MNN criterion, and
    blocking bounds the candidate mass exactly like semantic_dedup's
    k-means stage.

    ``block_col`` is the caller-chosen partitioner (a label, an IVF
    cell from kmeans_predict, an LSH bucket from cosine_lsh_bucket) —
    pairs are only discovered WITHIN a block, which is what makes the
    self-join linear in Σ|block|² instead of n²; pick blocks the way
    semantic_dedup does at 100 TB.  Ties break deterministically
    (cosine desc, neighbor id asc — ``id_col`` must be NUMERIC: the
    tie-break negates it inside the argmax struct).  ``id_a < id_b``
    dedups the symmetric pair.

    Determinism: the cosine chain (array-ordered dot, √ΣΣ norms, one
    division) is the cosine_topk_bruteforce expression, bit-identical
    across engines; top-1 selection is an exact (cosine, −id) argmax —
    one combinable max_by, no window.

    Scale shape: one block-keyed self-join (shuffle on the block key —
    the only data-sized exchange; hot blocks are the caller's blocking
    contract), one combinable per-vector max_by, one id-keyed
    equi-join for the reciprocity check.  No global window, no
    collect.

    Reference parity: no reference counterpart — similarity-search
    extension next to cosine_topk_bruteforce/semantic_dedup (driver
    brief).
    """
    from cerebro_spark.operators.util import ensure_parallelism

    # the scoring stage runs on the PROBE side's partitions: a sub-split
    # input (one parquet file -> one scan partition) would compute every
    # |block|² cosine in ONE task after the broadcast join — spread it
    # first (measured 6.7 s -> 1.6 s at sf0.1, identical rows; a real
    # corpus arrives with thousands of splits and passes through untouched)
    df = ensure_parallelism(df)
    a = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__qid"),
        F.col(vec_col).cast("array<double>").alias("__qv"),
    )
    b = df.select(
        F.col(block_col).alias("__blk"),
        F.col(id_col).alias("__nid"),
        F.col(vec_col).cast("array<double>").alias("__nv"),
    )
    scored = (
        a.join(b, "__blk")
        .filter(F.col("__qid") != F.col("__nid"))
        .select(
            "__qid",
            "__nid",
            (
                _dot(F.col("__qv"), F.col("__nv"))
                / (_norm(F.col("__qv")) * _norm(F.col("__nv")))
            ).alias("__cos"),
        )
    )
    # combinable argmax: top cosine, ties to the LOWEST neighbor id
    nn = scored.groupBy("__qid").agg(
        F.max_by(
            F.struct(F.col("__nid"), F.col("__cos")),
            F.struct(F.col("__cos"), -F.col("__nid")),
        ).alias("__top")
    ).select(
        "__qid",
        F.col("__top.__nid").alias("__top1"),
        F.col("__top.__cos").alias("__cos"),
    )
    # reciprocity WITHOUT a self-join (which would re-derive the whole
    # scoring stage on both sides): each direction contributes one row to
    # its unordered edge, so an edge with TWO rows is mutual by
    # construction — one groupBy on the edge key, single derivation.
    return (
        nn.select(
            F.least(F.col("__qid"), F.col("__top1")).alias("id_a"),
            F.greatest(F.col("__qid"), F.col("__top1")).alias("id_b"),
            "__cos",
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("__dirs"),
            F.max("__cos").alias("cosine"),
        )
        .filter(F.col("__dirs") == 2)
        # 6-dp output rounding (the semantic_dedup precedent): the raw
        # double is summation-chain-sensitive at the last ulp, and this
        # value is a similarity READOUT, not an input to further math —
        # rounding both here and in any mirroring oracle keeps the gate
        # comparison ulp-proof.
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


def centroid_silhouette(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Centroid-based silhouette score per cluster — ``(label,
    n_vectors, mean_silhouette)``: for each vector, a = distance to its
    OWN label centroid, b = distance to the nearest OTHER centroid,
    s = (b−a)/max(a,b) ∈ [−1, 1].  The cluster-QUALITY gate the
    blocking stack was missing: semantic_dedup / ann_cosine_ivf trust
    their k-means cells, mutual_nn_pairs trusts its blocks — a label
    with mean s ≈ 0 is a block boundary that near-dup pairs straddle.
    (Centroid form, i.e. simplified silhouette — the classic all-pairs
    form is O(n²) and is exactly what blocking exists to avoid.)

    Determinism: centroids are EXACT integer sum vectors (e6-quantized
    coordinates, one combinable per-(label, dim) aggregate — never a
    float mean, whose summation order diverges across engines); each
    squared distance is Σ(pᵢ·n − Sᵢ)² evaluated per dimension from
    exact ≤2⁵³ integers and summed IN ARRAY ORDER (both engines run
    the identical IEEE sequence); per-vector s is e6-requantized so
    the per-label mean is an exact integer sum, one final division,
    rounded 6 dp.  Singleton-exact ties (a = b = 0) score 0 by the
    standard convention.

    Scale shape: one combinable per-(label, dim) centroid aggregate,
    one BROADCAST of the k-row centroid frame onto the vectors (n·k
    distance rows, k = label count — bounded), one per-vector
    conditional reduce, one per-label reduce.  No window, no collect.

    Reference parity: no reference counterpart — cluster-evaluation
    extension next to label_centroids/semantic_dedup (driver brief).
    """
    dec = "decimal(38,0)"
    # NOTE: __pid keys the per-row reduce below.  monotonically_
    # increasing_id() is consistent WITHIN one lineage branch (every use
    # here descends from this single select), but Spark does not
    # guarantee stable ids across stage retries / speculative execution
    # when the upstream source is non-deterministic — for such sources,
    # pass data with a real row key and use it instead (r8 advice).
    pts = df.filter(
        F.col(vec_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(
        F.col(label_col).alias("__own"),
        F.monotonically_increasing_id().alias("__pid"),
        F.transform(
            F.col(vec_col).cast("array<double>"),
            lambda x: F.floor(x * F.lit(1.0e6) + F.lit(0.5)).cast("long"),
        ).alias("__p"),
    )
    ex = pts.select(
        "__own", F.posexplode("__p").alias("__dim", "__x")
    )
    cent = (
        ex.groupBy("__own", "__dim")
        .agg(F.sum("__x").cast("long").alias("__s"))
        .groupBy("__own")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__dim"), F.col("__s")))
            ).alias("__pairs")
        )
        .select(
            F.col("__own").alias("__clab"),
            F.transform(F.col("__pairs"), lambda p: p["__s"]).alias("__S"),
        )
    )
    counts = pts.groupBy("__own").agg(
        F.count(F.lit(1)).cast("long").alias("__cn")
    )
    cent = cent.join(
        counts, cent.__clab == counts.__own
    ).select("__clab", "__S", "__cn")
    # k-row centroid broadcast onto the vectors
    jd = pts.crossJoin(F.broadcast(cent))
    num = F.aggregate(
        F.zip_with(
            F.col("__p"),
            F.col("__S"),
            lambda a, b: F.pow(
                (a * F.col("__cn") - b).cast("double"), F.lit(2.0)
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    d = F.sqrt(num) / F.col("__cn").cast("double")
    per = jd.select(
        "__own",
        "__pid",
        F.when(F.col("__own") == F.col("__clab"), d).alias("__da"),
        F.when(F.col("__own") != F.col("__clab"), d).alias("__db"),
    ).groupBy("__own", "__pid").agg(
        F.max("__da").alias("__a"),
        F.min("__db").alias("__b"),
    )
    s = F.when(
        F.greatest(F.col("__a"), F.col("__b")) > 0,
        (F.col("__b") - F.col("__a"))
        / F.greatest(F.col("__a"), F.col("__b")),
    ).otherwise(F.lit(0.0))
    sq = F.floor(s * F.lit(1.0e6) + F.lit(0.5)).cast("long")
    out = per.select("__own", sq.alias("__sq")).groupBy("__own").agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.sum(F.col("__sq").cast(dec)).alias("__ssum"),
    )
    return out.select(
        F.col("__own").alias("label"),
        "n_vectors",
        F.round(
            F.col("__ssum").cast("double")
            / F.col("n_vectors").cast("double")
            / F.lit(1.0e6),
            6,
        ).alias("mean_silhouette"),
    )
