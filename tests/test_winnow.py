"""Winnowing fingerprints: guarantee property, edge sizes, overlap pairs,
LSH bucket-stats consistency."""

from pyspark.sql import functions as F

from cerebro_spark.operators.dedup import (
    lsh_bucket_stats,
    minhash_lsh_pairs,
    winnow_fingerprints,
    winnow_overlap_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_winnow_guarantee_shared_run(spark):
    """Any shared token run of length >= w + k - 1 (= 7 here) must produce
    at least one shared fingerprint — the winnowing guarantee."""
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    df = _docs(
        spark,
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} completely different tail tokens here"),
        ],
    )
    fps = winnow_fingerprints(df, k=4, w=4)
    a = {r["fp"] for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r["fp"] for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert a & b, "shared 7-token run yielded no shared fingerprint"


def test_winnow_disjoint_docs_share_nothing(spark):
    df = _docs(
        spark,
        [
            (1, "aa bb cc dd ee ff gg hh"),
            (2, "ii jj kk ll mm nn oo pp"),
        ],
    )
    fps = winnow_fingerprints(df, k=4, w=4)
    a = {r["fp"] for r in fps.filter(F.col("doc_id") == 1).collect()}
    b = {r["fp"] for r in fps.filter(F.col("doc_id") == 2).collect()}
    assert a and b and not (a & b)


def test_winnow_short_doc_single_window(spark):
    """Fewer grams than one window: the whole sequence is one clipped
    window -> exactly one fingerprint (the min). A doc below k tokens
    yields none."""
    df = _docs(spark, [(1, "a b c d e"), (2, "x y")])  # 2 grams / 0 grams
    got = winnow_fingerprints(df, k=4, w=4)
    assert got.filter(F.col("doc_id") == 1).count() == 1
    assert got.filter(F.col("doc_id") == 2).count() == 0


def test_winnow_subsampling_vs_all_grams(spark):
    """Winnowed set is a subset of the k-gram hash set and materially
    smaller on a long repetitive-free doc."""
    text = " ".join(f"tok{i}" for i in range(100))
    df = _docs(spark, [(1, text)])
    fps = winnow_fingerprints(df, k=4, w=4)
    n_fp = fps.count()
    n_grams = 100 - 4 + 1
    assert 0 < n_fp < n_grams
    # expected density ~ 2/(w+1) = 0.4; allow generous slack
    assert n_fp <= 0.6 * n_grams


def test_winnow_overlap_pairs_detects_plagiarism(spark):
    shared = " ".join(f"common{i}" for i in range(30))
    df = _docs(
        spark,
        [
            (1, f"{shared} unique tail one"),
            (2, f"prefix junk {shared}"),
            (3, " ".join(f"other{i}" for i in range(30))),
        ],
    )
    pairs = winnow_overlap_pairs(df, k=4, w=4, min_shared=3).collect()
    assert [(r["id_a"], r["id_b"]) for r in pairs] == [(1, 2)]
    assert pairs[0]["shared"] >= 3


def test_lsh_bucket_stats_predicts_pair_join(spark, sf_dir):
    """candidate_pairs summed over the histogram >= distinct candidate
    pairs the LSH join actually emits (dedup across bands can only
    shrink), and the doc-mass in buckets equals docs x bands."""
    from cerebro_spark.io import load_table

    docs = load_table(spark, "documents", sf_dir)
    stats = lsh_bucket_stats(docs, n=3, num_hashes=8, bands=4).collect()
    mass = sum(r["bucket_size"] * r["n_buckets"] for r in stats)
    assert mass == docs.count() * 4
    cand = sum(r["candidate_pairs"] for r in stats)
    actual = (
        minhash_lsh_pairs(docs, n=3, num_hashes=8, bands=4, threshold=0.0)
        .count()
    )
    assert cand >= actual


def test_winnow_fast_path_same_pairs(spark):
    """portable=False (xxhash token-hash grams) must detect the same overlap
    pairs as the md5 path — selection positions may differ (different hash
    ordering) but the guarantee and the join result on planted overlaps
    hold identically."""
    shared = " ".join(f"common{i}" for i in range(30))
    df = _docs(
        spark,
        [
            (1, f"{shared} unique tail one"),
            (2, f"prefix junk {shared}"),
            (3, " ".join(f"other{i}" for i in range(30))),
        ],
    )
    slow = {(r["id_a"], r["id_b"]) for r in
            winnow_overlap_pairs(df, k=4, w=4, min_shared=3).collect()}
    fast = {(r["id_a"], r["id_b"]) for r in
            winnow_overlap_pairs(df, k=4, w=4, min_shared=3,
                                 portable=False).collect()}
    assert slow == fast == {(1, 2)}


def test_oracle_gram_cap_holds_for_driver_corpus():
    """The DuckDB oracles (winnow, minhash, ngram) cap k-grams per doc at
    256 via generate_series; the Spark operators do not.  Pin the coupling:
    the driver corpus must stay comfortably under the cap at every SF the
    gate or bench touches."""
    import duckdb

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        (mx,) = duckdb.sql(
            "SELECT max(len(string_split_regex(trim(text), '\\s+')))"
            f" FROM '/root/testdata/{sf}/documents.parquet'"
        ).fetchone()
        assert mx <= 250, (sf, mx)
