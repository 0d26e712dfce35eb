"""Round-9 multimodal operators: BMP codec, perceptual dHash/aHash, banded
Hamming pairs over precomputed hashes, audio PCM fingerprinting, and real
container-header sniffing.  The oracle-gated behavior lives in
cerebro_spark/queries/multimodal_q.py; these tests pin the REAL decode
paths (actual BMP/WAV bytes) that SQL cannot express."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cerebro_spark.operators.multimodal import (
    ahash_from_gray,
    audio_fingerprint,
    audio_fingerprint_df,
    audio_fingerprint_pcm,
    byte_dhash_df,
    decode_audio_pcm,
    decode_image_gray,
    dhash_from_gray,
    encode_bmp_gray,
    encode_wav_pcm16,
    hamming_hash_pairs,
    image_dhash,
    image_dhash_df,
    media_sniff,
    sniff_media_meta,
)


def _gray(h, w, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 250, size=(h, w)).astype(np.uint8)


# ---------------------------------------------------------------------------
# BMP codec
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_exact():
    g = _gray(24, 31)  # width not a multiple of 4 -> exercises row padding
    assert np.array_equal(decode_image_gray(encode_bmp_gray(g)), g)


def test_bmp_roundtrip_tiny_and_wide():
    for shape in [(1, 1), (2, 3), (5, 64)]:
        g = _gray(*shape, seed=shape[1])
        assert np.array_equal(decode_image_gray(encode_bmp_gray(g)), g)


def test_bmp_top_down_rows_decode():
    """A top-down DIB (negative biHeight) decodes to the same image."""
    g = _gray(4, 4)
    p = bytearray(encode_bmp_gray(g[::-1]))  # encoder writes bottom-up
    # flip biHeight sign: rows are now stored top-down
    struct.pack_into("<i", p, 22, -4)
    assert np.array_equal(decode_image_gray(bytes(p)), g)


def test_non_bmp_requires_pillow():
    with pytest.raises(NotImplementedError):
        decode_image_gray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 64)


# ---------------------------------------------------------------------------
# perceptual hashes
# ---------------------------------------------------------------------------

def test_dhash_brightness_invariance():
    g = _gray(40, 60)
    shifted = np.clip(g.astype(np.int64) + 5, 0, 255).astype(np.uint8)
    assert dhash_from_gray(g) == dhash_from_gray(shifted)
    # through the REAL codec too
    assert image_dhash(encode_bmp_gray(g)) == image_dhash(
        encode_bmp_gray(shifted)
    )


def test_dhash_noise_robust_but_discriminative():
    g = _gray(40, 60)
    noisy = g.copy()
    rng = np.random.RandomState(3)
    idx = rng.randint(0, g.size, 20)
    noisy.ravel()[idx] = np.clip(
        noisy.ravel()[idx].astype(np.int64) + rng.randint(-9, 10, 20), 0, 255
    ).astype(np.uint8)
    h0, hn = dhash_from_gray(g), dhash_from_gray(noisy)
    assert bin(h0 ^ hn).count("1") <= 6  # near-dup stays near
    other = _gray(40, 60, seed=99)
    assert bin(h0 ^ dhash_from_gray(other)).count("1") > 10


def test_dhash_signed_long_cap():
    g = _gray(16, 16)
    assert 0 <= dhash_from_gray(g) < 2**60
    with pytest.raises(AssertionError):
        dhash_from_gray(g, rows=8, cols=9)  # 64 bits must be refused


def test_ahash_global_mean_split():
    g = np.zeros((8, 14), dtype=np.uint8)
    g[:4] = 200  # top half bright -> exactly those cells above global mean
    h = ahash_from_gray(g)  # default 8x7 grid = 56 bits
    assert bin(h).count("1") == 28
    assert 0 <= h < 2**60
    with pytest.raises(AssertionError):
        ahash_from_gray(g, rows=8, cols=8)  # 64 bits must be refused


def test_byte_dhash_df_matches_prototype(spark):
    texts = ["hello world this is a longer document body", "abcd" * 30]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.id: r.dhash for r in byte_dhash_df(df).collect()}

    def proto(text, rows=6, cols=11):
        b = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
        n, S = len(b), rows * cols
        seg = (np.arange(n) * S) // n
        sums = np.bincount(seg, weights=b.astype(float), minlength=S).astype(np.int64)
        cnts = np.bincount(seg, minlength=S)
        gs, gc = sums.reshape(rows, cols), cnts.reshape(rows, cols)
        h = 0
        for r in range(rows):
            for c in range(cols - 1):
                if gs[r, c + 1] * gc[r, c] > gs[r, c] * gc[r, c + 1]:
                    h |= 1 << (r * (cols - 1) + c)
        return h

    assert got == {i: proto(t) for i, t in enumerate(texts)}


def test_hamming_hash_pairs_recall_and_cap(spark):
    base = 0b1011_0110_1001 << 20
    rows = [
        (1, base),
        (2, base ^ 0b101),        # distance 2 from id 1
        (3, base ^ (1 << 59)),    # distance 1 from id 1
        (4, 0),                   # far from everything
    ]
    df = spark.createDataFrame(rows, "id long, dhash long")
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in hamming_hash_pairs(df, max_hamming=3).collect()
    }
    assert got[(1, 2)] == 2 and got[(1, 3)] == 1 and got[(2, 3)] == 3
    assert not any(4 in p for p in got)
    # cap path: a bucket holding all four of one block's segments survives
    capped = hamming_hash_pairs(df, max_hamming=3, max_bucket_size=1).collect()
    assert capped == []  # every matching bucket has >= 2 members


def test_image_dhash_df_over_bmp_payloads(spark):
    g1, g2 = _gray(20, 30), _gray(20, 30, seed=11)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp_gray(g1))), (2, bytearray(encode_bmp_gray(g2)))],
        "doc_id long, payload binary",
    )
    got = {r.id: r.dhash for r in image_dhash_df(df).collect()}
    assert got == {1: dhash_from_gray(g1), 2: dhash_from_gray(g2)}


# ---------------------------------------------------------------------------
# AVI encoder (completes the dependency-free codec family)
# ---------------------------------------------------------------------------

def test_avi_roundtrip_pixel_exact():
    from cerebro_spark.operators.multimodal import (
        decode_video_frames,
        encode_avi_gray,
    )

    frames = [_gray(4, 10, seed=i) for i in range(5)]
    avi = encode_avi_gray(frames, fps=2)
    dec = decode_video_frames(avi, every_ms=500)
    assert [t for t, _ in dec] == [0, 500, 1000, 1500, 2000]
    assert all(np.array_equal(g, frames[i]) for i, (_, g) in enumerate(dec))
    # cadence: sampling at 1000 ms keeps every other frame
    assert len(decode_video_frames(avi, every_ms=1000)) == 3


def test_avi_encoder_sniffs_back():
    from cerebro_spark.operators.multimodal import encode_avi_gray

    avi = encode_avi_gray([_gray(6, 9)], fps=4)
    m = sniff_media_meta(avi)
    assert (m["media_type"], m["format"], m["width"], m["height"]) == (
        "video", "avi", 9, 6,
    )
    assert m["duration_ms"] == 250  # 1 frame at 4 fps


# ---------------------------------------------------------------------------
# audio PCM fingerprints
# ---------------------------------------------------------------------------

def test_wav_pcm16_roundtrip_exact():
    samples = np.array([-32768, -1, 0, 1, 12345, 32767], dtype=np.int64)
    decoded, sr = decode_audio_pcm(encode_wav_pcm16(samples, 44100))
    assert sr == 44100
    assert np.array_equal(decoded, samples)


def test_audio_fingerprint_gain_invariant():
    rng = np.random.RandomState(5)
    samples = rng.randint(-8000, 8000, 400)
    fp1 = audio_fingerprint(encode_wav_pcm16(samples))
    for gain in (2, 3):
        fpg = audio_fingerprint(encode_wav_pcm16(samples * gain))
        assert fpg == fp1
    # time reordering must change the signature
    assert audio_fingerprint(encode_wav_pcm16(samples[::-1])) != fp1


def test_audio_fingerprint_pcm_shapes():
    assert audio_fingerprint_pcm([]) == 0
    # fewer samples than frames: empty spans compare 0 > 0 deterministically
    assert isinstance(audio_fingerprint_pcm([5, -3, 7], frames=33), int)
    with pytest.raises(AssertionError):
        audio_fingerprint_pcm([1], frames=62)


def test_decode_audio_pcm_8bit_and_stereo():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([0, 128, 255]))
    x, _ = decode_audio_pcm(buf.getvalue())
    assert x.tolist() == [-128, 0, 127]

    buf2 = io.BytesIO()
    with wave.open(buf2, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.array([10, 20, -5, 7], dtype="<i2").tobytes())
    x2, _ = decode_audio_pcm(buf2.getvalue())
    assert x2.tolist() == [30, 2]  # channel sum keeps integers exact


def test_audio_fingerprint_df_handles_null(spark):
    wav = encode_wav_pcm16(np.arange(-100, 100) * 50)
    df = spark.createDataFrame(
        [(1, bytearray(wav)), (2, None)], "doc_id long, payload binary"
    )
    # NULL payload is a decode failure: loud under the default, NULL fp
    # (never 0 — a silent clip's hash) under on_error='null'
    with pytest.raises(Exception):
        audio_fingerprint_df(df).collect()
    got = {
        r.id: (r.fp, r.n_samples)
        for r in audio_fingerprint_df(df, on_error="null").collect()
    }
    assert got[1] == (audio_fingerprint(wav), 200)
    assert got[2] == (None, 0)


# ---------------------------------------------------------------------------
# container-header sniffing
# ---------------------------------------------------------------------------

def test_sniff_png_gif_jpeg_headers():
    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 640, 480) + b"\x08"
    m = sniff_media_meta(png)
    assert (m["format"], m["width"], m["height"]) == ("png", 640, 480)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    m = sniff_media_meta(gif)
    assert (m["format"], m["width"], m["height"]) == ("gif", 320, 200)

    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"          # APP0
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 240, 360) + b"\x03\x00\x00\x00"
    )
    m = sniff_media_meta(jpeg)
    assert (m["format"], m["width"], m["height"]) == ("jpeg", 360, 240)


def test_sniff_bmp_and_wav_from_real_encoders():
    m = sniff_media_meta(encode_bmp_gray(_gray(12, 34)))
    assert (m["media_type"], m["format"], m["width"], m["height"]) == (
        "image", "bmp", 34, 12,
    )
    wav = encode_wav_pcm16(np.zeros(16000, dtype=np.int64), 8000)
    m = sniff_media_meta(wav)
    assert (m["media_type"], m["format"], m["sample_rate"], m["duration_ms"]) == (
        "audio", "wav", 8000, 2000,
    )


def test_sniff_avi_header():
    def chunk(fourcc, body):
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    avih = chunk(b"avih", struct.pack("<IIIII", 40000, 0, 0, 0, 50))
    strf = chunk(b"strf", struct.pack("<Iii", 40, 320, 240) + b"\x00" * 28)
    body = lst(b"hdrl", avih + lst(b"strl", strf))
    avi = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    m = sniff_media_meta(avi)
    assert (m["media_type"], m["format"], m["width"], m["height"]) == (
        "video", "avi", 320, 240,
    )
    assert m["duration_ms"] == 50 * 40000 // 1000


def test_sniff_garbage_is_soft():
    for p in (b"", b"\x00" * 40, b"RIFF\x04\x00\x00\x00JUNK", None and b""):
        m = sniff_media_meta(p)
        assert m["format"] is None


def test_media_sniff_df(spark):
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp_gray(_gray(8, 16)))),
            (2, bytearray(encode_wav_pcm16(np.zeros(800, dtype=np.int64)))),
            (3, None),
        ],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in media_sniff(df).collect()}
    assert (got[1].format, got[1].width, got[1].height) == ("bmp", 16, 8)
    assert (got[2].format, got[2].sample_rate, got[2].duration_ms) == (
        "wav", 8000, 100,
    )
    assert got[3].format is None


# ---------------------------------------------------------------------------
# exact area-mean resize (the "resize" multimodal verb)
# ---------------------------------------------------------------------------

def test_resize_gray_exact_means():
    from cerebro_spark.operators.multimodal import resize_gray

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    t = resize_gray(g, 2, 2)
    # each 4x4 block's floor mean
    assert t.tolist() == [
        [int(g[:4, :4].mean()), int(g[:4, 4:].mean())],
        [int(g[4:, :4].mean()), int(g[4:, 4:].mean())],
    ]
    assert np.array_equal(resize_gray(g, 8, 8), g)  # identity at same size
    with pytest.raises(AssertionError):
        resize_gray(g, 16, 8)  # upscale refused


def test_image_thumbnail_df_both_forms(spark):
    from cerebro_spark.operators.multimodal import (
        encode_bmp_gray,
        image_thumbnail_df,
        resize_gray,
    )

    g = _gray(12, 16)
    df = spark.createDataFrame(
        [(7, bytearray(encode_bmp_gray(g)))], "doc_id long, payload binary"
    )
    want = resize_gray(g, 2, 4)
    long = image_thumbnail_df(df, out_h=2, out_w=4).collect()
    got = {(r.py, r.px): r.pixel for r in long}
    assert got == {
        (py, px): int(want[py, px]) for py in range(2) for px in range(4)
    }
    wide = image_thumbnail_df(df, out_h=2, out_w=4, as_payload=True).first()
    assert (wide.width, wide.height) == (4, 2)
    assert np.array_equal(decode_image_gray(bytes(wide.thumb)), want)


def test_media_hash_ops_fail_soft(spark):
    from cerebro_spark.operators.multimodal import encode_wav_pcm16

    corrupt = b"BM" + b"\x00" * 10  # truncated BMP header
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp_gray(_gray(4, 8)))),
            (2, bytearray(corrupt)),
            (3, None),
        ],
        "doc_id long, payload binary",
    )
    soft = {r.id: r.dhash for r in image_dhash_df(df, on_error="null").collect()}
    # NULL payload == decode failure (NULL fingerprint, NOT 0 — a missing
    # blob must never cluster with genuinely zero-hash media)
    assert soft[1] is not None and soft[2] is None and soft[3] is None
    with pytest.raises(Exception):
        image_dhash_df(df).collect()  # default stays loud

    adf = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(np.arange(50) * 100))),
            (2, bytearray(b"RIFF\x04\x00\x00\x00JUNK")),
            (3, None),
        ],
        "doc_id long, payload binary",
    )
    asoft = {r.id: r.fp for r in audio_fingerprint_df(adf, on_error="null").collect()}
    assert asoft[1] is not None and asoft[2] is None and asoft[3] is None
    with pytest.raises(Exception):
        audio_fingerprint_df(adf).collect()


def test_image_thumbnail_fail_soft(spark):
    from cerebro_spark.operators.multimodal import image_thumbnail_df

    df = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp_gray(_gray(4, 8)))),
            (2, bytearray(b"BM" + b"\x00" * 10)),   # truncated header
            (3, None),                               # missing payload
            (4, bytearray(encode_bmp_gray(_gray(1, 2)))),  # smaller than 2x4
        ],
        "doc_id long, payload binary",
    )
    rows = image_thumbnail_df(df, out_h=2, out_w=4, on_error="null").collect()
    by_id: dict = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    # decodable doc keeps its full pixel grid
    assert len(by_id[1]) == 8 and all(r.pixel is not None for r in by_id[1])
    # corrupt / NULL / too-small each collapse to ONE all-NULL marker row
    for bad in (2, 3, 4):
        assert len(by_id[bad]) == 1
        m = by_id[bad][0]
        assert m.py is None and m.px is None and m.pixel is None
    wide = {
        r.id: r.thumb
        for r in image_thumbnail_df(
            df, out_h=2, out_w=4, as_payload=True, on_error="null"
        ).collect()
    }
    assert wide[1] is not None and wide[2] is None and wide[3] is None
    with pytest.raises(Exception):
        image_thumbnail_df(df, out_h=2, out_w=4).collect()  # default loud


# ---------------------------------------------------------------------------
# persisted Hamming index (online near-dup lookup, modality-agnostic)
# ---------------------------------------------------------------------------

def test_hamming_index_build_probe(spark, tmp_path):
    from cerebro_spark.operators.multimodal import (
        build_hamming_index,
        query_hamming_index,
    )

    base = 0b1011_0110_1001 << 20
    corpus = spark.createDataFrame(
        [(1, base), (2, base ^ 0b101), (3, 1 << 50)], "id long, dhash long"
    )
    path = str(tmp_path / "hidx")
    build_hamming_index(corpus, path)
    # probe: one twin of id 1 (distance 1), one far probe
    probes = spark.createDataFrame(
        [(100, base ^ 1), (200, 0)], "id long, dhash long"
    )
    got = {
        (r.probe_id, r.match_id): r.hamming
        for r in query_hamming_index(spark, path, probes).collect()
    }
    # probe 100 = base^1: distance 1 to id 1 and distance 1 to id 2
    # (xor(base^1, base^0b101) = 0b100); probe 200 = 0: distance 1 to
    # id 3 (the single bit 50)
    assert got == {(100, 1): 1, (100, 2): 1, (200, 3): 1}
    # layout mismatch must refuse, not silently match garbage
    with pytest.raises(ValueError):
        query_hamming_index(spark, path, probes, bits=32)
    # partition pruning: the bands store is laid out by block
    import os

    assert sorted(
        d for d in os.listdir(f"{path}/bands") if d.startswith("blk=")
    ) == ["blk=0", "blk=1", "blk=2", "blk=3"]


def test_hamming_index_agrees_with_batch_pairs(spark, sf_dir, tmp_path):
    """Online probe == batch pair join (the test_lsh_index equivalence
    standard): indexing the corpus and probing it with ITSELF must find
    exactly the pairs hamming_hash_pairs finds."""
    from cerebro_spark.operators.multimodal import (
        build_hamming_index,
        query_hamming_index,
    )
    from cerebro_spark.io import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    fps = byte_dhash_df(docs)
    # max_hamming=10 with blocks=4 is PARTIAL recall (pigeonhole guarantee
    # needs max_hamming < blocks) — intentional here: both sides run the
    # identical layout, so the equivalence claim (online == batch over the
    # colliding candidate set) is exactly what this test pins.
    batch = {
        (r.id_a, r.id_b, r.hamming)
        for r in hamming_hash_pairs(
            fps, max_hamming=10, allow_partial_recall=True
        ).collect()
    }
    path = str(tmp_path / "hidx")
    build_hamming_index(fps, path)
    online = {
        (min(r.probe_id, r.match_id), max(r.probe_id, r.match_id), r.hamming)
        for r in query_hamming_index(
            spark, path, fps, max_hamming=10, allow_partial_recall=True
        ).collect()
        if r.probe_id != r.match_id
    }
    assert online == batch
    # the non-compliant layout without the opt-in must refuse loudly
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_hash_pairs(fps, max_hamming=10)
    with pytest.raises(ValueError, match="pigeonhole"):
        query_hamming_index(spark, path, fps, max_hamming=10)


# ---------------------------------------------------------------------------
# video near-dup dedup (r10): frame hashes -> temporal majority signature ->
# banded candidates -> frame-overlap verify
# ---------------------------------------------------------------------------

def _avi_from_bytes(b):
    from cerebro_spark.operators.multimodal import encode_avi_gray

    nf = len(b) // 16
    return encode_avi_gray(
        [np.asarray(b[k * 16 : (k + 1) * 16]).reshape(2, 8) for k in range(nf)],
        fps=2,
    )


def _vid_bytes(seed: int, n: int = 320):
    import hashlib

    return [
        hashlib.md5(f"{seed}:{j}".encode()).digest()[0] % 200
        for j in range(n)
    ]


def test_video_signature_invariance_and_edit_proximity(spark):
    from cerebro_spark.operators.multimodal import (
        video_frame_hash_df,
        video_signature,
    )

    base = _vid_bytes(1)
    bright = [v + 30 for v in base]          # uniform brightness shift
    edited = list(base)
    edited[:16] = [7] * 16                    # replace ONE frame (intro card)
    other = _vid_bytes(2)                     # unrelated video
    df = spark.createDataFrame(
        [
            (1, bytearray(_avi_from_bytes(base))),
            (2, bytearray(_avi_from_bytes(bright))),
            (3, bytearray(_avi_from_bytes(edited))),
            (4, bytearray(_avi_from_bytes(other))),
        ],
        "doc_id long, payload binary",
    )
    fh = video_frame_hash_df(df, every_ms=500)
    sigs = {r.id: (r.vfp, r.n_frames) for r in video_signature(fh).collect()}
    assert sigs[1][1] == 20  # 320 bytes -> 20 frames
    # brightness twin: identical signature (per-frame dHash invariance)
    assert sigs[2][0] == sigs[1][0]
    # one-frame edit: near, not equal-or-far
    d_edit = bin(sigs[3][0] ^ sigs[1][0]).count("1")
    d_other = bin(sigs[4][0] ^ sigs[1][0]).count("1")
    assert 0 <= d_edit <= 6
    assert d_other > d_edit


def test_video_frame_overlap_verify(spark):
    from cerebro_spark.operators.multimodal import (
        frame_overlap_verify,
        video_frame_hash_df,
    )

    base = _vid_bytes(1)
    edited = list(base)
    edited[:16] = [7] * 16
    df = spark.createDataFrame(
        [
            (1, bytearray(_avi_from_bytes(base))),
            (3, bytearray(_avi_from_bytes(edited))),
        ],
        "doc_id long, payload binary",
    )
    fh = video_frame_hash_df(df, every_ms=500)
    pairs = spark.createDataFrame([(1, 3, 1)], "id_a long, id_b long, hamming long")
    got = frame_overlap_verify(pairs, fh, frame_tol=0).first()
    assert (got.n_frames_a, got.n_frames_b) == (20, 20)
    # 19 of 20 frames align exactly (frame 0 was replaced)
    assert got.matching_frames == 19
    assert abs(got.frac_matching - 19 / 20) < 1e-12


def test_video_frame_hash_fail_soft(spark):
    from cerebro_spark.operators.multimodal import video_frame_hash_df

    df = spark.createDataFrame(
        [
            (1, bytearray(_avi_from_bytes(_vid_bytes(1)))),
            (2, None),
            (3, bytearray(b"RIFF\x00bogus")),
        ],
        "doc_id long, payload binary",
    )
    rows = video_frame_hash_df(df, every_ms=500, on_error="null").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r.id, []).append(r)
    assert len(by_id[1]) == 20 and all(r.fhash is not None for r in by_id[1])
    for bad in (2, 3):
        assert len(by_id[bad]) == 1 and by_id[bad][0].fhash is None
    with pytest.raises(Exception):
        video_frame_hash_df(df, every_ms=500).collect()


# ---------------------------------------------------------------------------
# two-vote precision gate (r10): ahash as the second, independent vote
# ---------------------------------------------------------------------------

def test_image_ahash_df_over_bmp_payloads(spark):
    from cerebro_spark.operators.multimodal import image_ahash_df

    g1, g2 = _gray(20, 30), _gray(20, 30, seed=11)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp_gray(g1))),
            (2, bytearray(encode_bmp_gray(g2))),
            (3, None),
        ],
        "doc_id long, payload binary",
    )
    got = {r.id: r.ahash for r in image_ahash_df(df, on_error="null").collect()}
    assert got[1] == ahash_from_gray(g1)
    assert got[2] == ahash_from_gray(g2)
    assert got[3] is None
    with pytest.raises(Exception):
        image_ahash_df(df).collect()


def test_byte_ahash_df_shift_invariant_and_matches_prototype(spark):
    from cerebro_spark.operators.multimodal import byte_ahash_df

    import hashlib

    def doc(seed, n=150):
        return "".join(
            chr(32 + hashlib.md5(f"{seed}:{j}".encode()).digest()[0] % 88)
            for j in range(n)
        )

    texts = [doc(1), doc(2)]
    shifted = ["".join(chr(ord(c) + 2) for c in texts[0])]
    df = spark.createDataFrame(
        [(0, texts[0]), (1, texts[1]), (2, shifted[0])],
        "doc_id long, text string",
    )
    got = {r.id: r.ahash for r in byte_ahash_df(df).collect()}

    def proto(text, rows=8, cols=7):
        b = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
        n, S = len(b), rows * cols
        seg = (np.arange(n) * S) // n
        sums = np.bincount(seg, weights=b.astype(float), minlength=S).astype(np.int64)
        cnts = np.bincount(seg, minlength=S)
        ts, tc = int(sums.sum()), int(cnts.sum())
        h = 0
        for k in range(S):
            if sums[k] * tc > ts * cnts[k]:
                h |= 1 << k
        return h

    assert got[0] == proto(texts[0]) and got[1] == proto(texts[1])
    # +2 uniform shift: identical ahash (the invariance that makes the
    # second vote keep every true brightness twin)
    assert got[2] == got[0]
    # and the two genuinely distinct docs disagree
    assert got[0] != got[1]
