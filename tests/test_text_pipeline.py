"""Edge cases for the repetition / LM-score / semantic-dedup operators
(oracle queries cover the bulk behavior at sf0.01)."""

import math

from pyspark.sql import Row
from pyspark.sql import functions as F

from cerebro_spark.operators.text import repetition_profile, unigram_nll


def test_repetition_profile_hand_computed(spark):
    rows = [
        Row(doc_id=1, text="a a a b"),       # top word a=3/4; bigram "a a"=2/3
        Row(doc_id=2, text="x y z"),         # all distinct
        Row(doc_id=3, text="solo"),          # single word: no bigram
    ]
    out = {r["doc_id"]: r for r in
           repetition_profile(spark.createDataFrame(rows)).collect()}
    r1 = out[1]
    assert r1["n_words"] == 4
    assert abs(r1["dup_word_frac"] - 0.5) < 1e-9          # 2 distinct / 4
    assert abs(r1["top_word_frac"] - 0.75) < 1e-9
    assert abs(r1["top_bigram_frac"] - 2 / 3) < 1e-6
    r2 = out[2]
    assert r2["dup_word_frac"] == 0.0
    assert abs(r2["top_word_frac"] - 1 / 3) < 1e-6
    assert abs(r2["top_bigram_frac"] - 0.5) < 1e-9        # each bigram once /2
    r3 = out[3]
    assert r3["n_words"] == 1 and r3["top_bigram_frac"] == 0.0


def test_unigram_nll_hand_computed(spark):
    # corpus: "a a b" + "b" -> counts a=2, b=2, total=4; -ln(p)=ln(2) for all
    rows = [Row(doc_id=1, text="a a b"), Row(doc_id=2, text="b")]
    out = {r["doc_id"]: r for r in
           unigram_nll(spark.createDataFrame(rows)).collect()}
    assert out[1]["n_tokens"] == 3 and out[2]["n_tokens"] == 1
    for d in (1, 2):
        assert abs(out[d]["avg_nll"] - round(math.log(2), 4)) < 1e-9
    # rare tokens score higher than common ones
    rows2 = [Row(doc_id=i, text="common word") for i in range(9)]
    rows2.append(Row(doc_id=99, text="zzzrare qqqrare"))
    out2 = {r["doc_id"]: r["avg_nll"] for r in
            unigram_nll(spark.createDataFrame(rows2)).collect()}
    assert out2[99] > out2[0]


def test_semantic_dedup_matches_bruteforce(spark, sf_dir):
    """The IVF-blocked dedup must find exactly the pairs global brute force
    finds when the only qualifying pairs are injected clones."""
    from cerebro_spark.io import load_table
    from cerebro_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    clones = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding"
    )
    n_clones = clones.count()
    out = semantic_dedup(
        emb.unionByName(clones), dim=64, threshold=0.95, n_clusters=8
    ).collect()
    assert len(out) == n_clones
    for r in out:
        assert r["drop_id"] == r["keep_id"] + 10_000   # clone vs its original
        assert r["cosine"] > 0.999999
    # deterministic: hash-seeded k-means gives identical clusters on rerun
    again = semantic_dedup(
        emb.unionByName(clones), dim=64, threshold=0.95, n_clusters=8
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
