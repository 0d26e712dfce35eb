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


def test_dhash_stack_matches_scalar():
    import numpy as np

    from cerebro_spark.operators.multimodal import _dhash_stack, dhash_from_gray

    rng = np.random.RandomState(7)
    for h, w, rows, cols in [(2, 8, 2, 9), (6, 11, 6, 11), (5, 3, 2, 9)]:
        G = rng.randint(0, 256, size=(17, h, w)).astype(np.uint8)
        vec = _dhash_stack(G, rows, cols)
        ref = [dhash_from_gray(G[i], rows, cols) for i in range(len(G))]
        assert list(map(int, vec)) == ref


def test_avi_vectorized_encode_decode_roundtrip_bytes():
    """The vectorized movi assembly and bulk-luma decode must be
    byte/pixel-identical to the original per-frame paths."""
    import struct

    import numpy as np

    from cerebro_spark.operators.multimodal import (
        _decode_avi_frames,
        encode_avi_gray,
    )

    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 256, size=(2, 8)).astype(np.uint8) for _ in range(9)]
    payload = encode_avi_gray(frames, fps=2)
    # reference per-frame movi assembly (the pre-r11 loop)
    h, w = 2, 8
    stride = (w * 3 + 3) // 4 * 4

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    movi_ref = b""
    for g in frames:
        rows_ = np.zeros((h, stride), dtype=np.uint8)
        rows_[:, : w * 3] = np.repeat(g, 3, axis=1)
        movi_ref += chunk(b"00db", rows_[::-1].tobytes())
    assert movi_ref in payload  # vectorized assembly is byte-identical
    decoded = _decode_avi_frames(payload, every_ms=500)
    assert [ts for ts, _ in decoded] == [0, 500, 1000, 1500, 2000, 2500, 3000, 3500, 4000]
    for (_, g), ref in zip(decoded, frames):
        assert np.array_equal(g, ref)  # (v,v,v) luma round-trips exactly


def test_video_signature_arrow_matches_dataframe_composition(spark):
    """The one-pass Arrow video signature must be bit-identical to the
    exploded-frame DataFrame composition (3 shuffles) it replaces —
    including NULL payloads, corrupt payloads, and zero-frame payloads."""
    from cerebro_spark.io import load_table
    from cerebro_spark.operators.multimodal import video_signature_df
    from cerebro_spark.queries.multimodal_q import _synth_avi

    docs = load_table(spark, "documents", "/root/testdata/sf0.001").select(
        "doc_id", F.expr("substring(text, 1, (length(text) div 16) * 16)").alias("text")
    )
    avi = _synth_avi(docs)
    planted = avi.select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.lit(None).cast("binary"))
        .when(F.col("doc_id") % 11 == 5, F.lit(b"RIFFxxxxAVI corrupt").cast("binary"))
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    fast = {r.id: r.dhash for r in video_signature_df(
        planted, every_ms=500, on_error="null").collect()}
    slow = {r.id: r.dhash for r in video_signature_df(
        planted, every_ms=500, on_error="null", impl="dataframe").collect()}
    assert fast == slow and len(fast) == 500


def test_mmr_driver_greedy_matches_distributed_loop(spark):
    """The bounded driver-side MMR greedy must be bit-identical to the
    distributed anti-join/argmax loop it replaces on small shortlists."""
    from cerebro_spark.io import load_table
    from cerebro_spark.operators import similarity as sim

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    queries = emb.filter(F.col("vec_id") < 5)
    fast = sorted(
        map(tuple, sim.mmr_rerank(emb, queries, k=10, n_candidates=50,
                                  lam=0.5).collect())
    )
    saved = sim._MMR_DRIVER_MAX_ROWS
    try:
        sim._MMR_DRIVER_MAX_ROWS = 0  # force the distributed loop
        slow = sorted(
            map(tuple, sim.mmr_rerank(emb, queries, k=10, n_candidates=50,
                                      lam=0.5).collect())
        )
    finally:
        sim._MMR_DRIVER_MAX_ROWS = saved
    assert fast == slow and len(fast) == 50


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
