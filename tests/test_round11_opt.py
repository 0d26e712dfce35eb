"""Round-11 optimization pins: the vectorized Arrow byte-hash kernels must
be bit-identical to the all-JVM expression formulation they replaced as the
default (the oracle gates run through the default path, so any divergence
here is a driver-gate break, not a perf detail)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cerebro_spark.operators.multimodal import byte_ahash_df, byte_dhash_df

EDGE_ROWS = [
    (1, "hello world this is a longer document body"),
    (2, "abcd" * 30),
    (3, ""),  # empty string -> fingerprint 0 on both paths
    (4, None),  # NULL content -> fingerprint 0 on both paths (JVM parity)
    (5, "héllo wörld ünïcode"),  # non-ASCII ord fallback
    (6, "x"),  # single char: no adjacent segment pair
    (7, "ab" * 500),
    (8, " \t  leading and trailing ws  "),
]


@pytest.fixture(scope="module")
def edge_df(spark):
    return spark.createDataFrame(EDGE_ROWS, "doc_id long, text string")


@pytest.mark.parametrize("shift", [0, 2])
def test_byte_dhash_arrow_matches_jvm(spark, edge_df, shift):
    jvm = {r.id: r.dhash for r in byte_dhash_df(edge_df, shift=shift, impl="jvm").collect()}
    arw = {r.id: r.dhash for r in byte_dhash_df(edge_df, shift=shift, impl="arrow").collect()}
    assert jvm == arw
    assert set(jvm) == {r[0] for r in EDGE_ROWS}


@pytest.mark.parametrize("shift", [0, 2])
def test_byte_ahash_arrow_matches_jvm(spark, edge_df, shift):
    jvm = {r.id: r.ahash for r in byte_ahash_df(edge_df, shift=shift, impl="jvm").collect()}
    arw = {r.id: r.ahash for r in byte_ahash_df(edge_df, shift=shift, impl="arrow").collect()}
    assert jvm == arw


def test_byte_dhash_arrow_matches_jvm_on_corpus(spark):
    """Whole-corpus agreement at sf0.001 including the +2-shift variant
    corpus (the shape every gated dhash query feeds the kernel)."""
    from cerebro_spark.io import load_table

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").select(
        "doc_id", "text"
    )
    sf = "".join(chr(i) for i in range(32, 122))
    st = "".join(chr(i + 2) for i in range(32, 122))
    corpus = docs.select((F.col("doc_id") * 2).alias("doc_id"), "text").unionAll(
        docs.select(
            (F.col("doc_id") * 2 + 1).alias("doc_id"),
            F.translate("text", sf, st).alias("text"),
        )
    )
    jvm = {r.id: r.dhash for r in byte_dhash_df(corpus, impl="jvm").collect()}
    arw = {r.id: r.dhash for r in byte_dhash_df(corpus, impl="arrow").collect()}
    assert jvm == arw and len(jvm) == 1000
