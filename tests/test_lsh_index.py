"""Persisted MinHash-LSH near-dup index: lookup finds planted clones,
agrees with the batch LSH pair scan, and probes prune by band partition."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.dedup import (
    build_lsh_index,
    minhash_lsh_pairs,
    query_lsh_index,
)


def test_lsh_index_finds_planted_clone(spark, sf_dir, tmp_path):
    docs = load_table(spark, "documents", sf_dir)
    path = str(tmp_path / "lsh")
    build_lsh_index(docs, path)

    # probe with a near-clone of doc 0 (one token appended)
    base = docs.filter(F.col("doc_id") == 0).first()["text"]
    probes = spark.createDataFrame(
        [Row(doc_id=100000, text=base + " tail"),
         Row(doc_id=100001, text="completely unrelated words nowhere close")]
    )
    got = query_lsh_index(spark, path, probes, threshold=0.5).collect()
    matches = {(r["probe_id"], r["match_id"]) for r in got}
    assert (100000, 0) in matches
    assert all(p != 100001 for p, _ in matches)


def test_lsh_index_agrees_with_batch_pairs(spark, sf_dir, tmp_path):
    """Indexing the corpus then probing with the corpus itself reproduces
    the batch minhash_lsh_pairs result (as unordered pairs)."""
    docs = load_table(spark, "documents", sf_dir).limit(200)
    path = str(tmp_path / "lsh")
    build_lsh_index(docs, path)

    online = query_lsh_index(spark, path, docs, threshold=0.5)
    online_pairs = {
        tuple(sorted((r["probe_id"], r["match_id"])))
        for r in online.collect()
    }
    batch = minhash_lsh_pairs(docs, threshold=0.5)
    batch_pairs = {
        tuple(sorted((r["id_a"], r["id_b"]))) for r in batch.collect()
    }
    assert online_pairs == batch_pairs


def test_lsh_index_rejects_mismatched_params(spark, sf_dir, tmp_path):
    import pytest

    docs = load_table(spark, "documents", sf_dir).limit(50)
    path = str(tmp_path / "lsh")
    build_lsh_index(docs, path, num_hashes=32, bands=8)
    with pytest.raises(ValueError, match="built with"):
        query_lsh_index(spark, path, docs.limit(5), bands=4)
