"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Driver-mandated extension.  Decode kernels are dependency-gated: image decode
is real behind optional Pillow, audio decode is real for WAV PCM with NO
dependency (stdlib ``wave`` + numpy — tested in-container) and behind optional
soundfile for other formats; deterministic fakes remain the default
``features_fn`` so the oracle-gated queries stay reproducible.  The Spark-side
plumbing (schema, Arrow batch shape, mapInPandas signature, partition sizing)
is identical for fake and real paths.

Scale design: binary payloads ride in their own column so column pruning keeps
metadata-only queries from reading bytes at all; decode fan-out uses
``mapInPandas`` (Arrow batches) with ``maxRecordsPerBatch`` bounding executor
memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata struct carried alongside every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def attach_media_meta(
    df: DataFrame,
    payload_col: str = "payload",
    media_type: str = "image",
    fmt: str = "raw",
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct (size-derived fake
    dims — deterministic; a real ingestor parses headers here)."""
    size = F.octet_length(F.col(payload_col))
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            (size % 1920).cast("int").alias("width"),
            (size % 1080).cast("int").alias("height"),
            (size * 10).cast("long").alias("duration_ms"),
            F.lit(16000).alias("sample_rate"),
        ),
    )


def _pil_image_module():
    """Import-try for Pillow — the decode dependency is OPTIONAL.  This
    container ships without it, so the gated queries and tests pin the
    deterministic ``fake_image_features`` path; a deployment that installs
    Pillow gets real decode with no code change here."""
    try:
        from PIL import Image  # type: ignore[import-not-found]

        return Image
    except ImportError:
        return None


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to a PIL.Image when Pillow is installed;
    raises ``NotImplementedError`` with guidance otherwise (this container
    has no image library — the Spark plumbing is exercised end-to-end via
    ``fake_image_features`` instead)."""
    image_mod = _pil_image_module()
    if image_mod is None:
        raise NotImplementedError(
            "image decode requires Pillow (pip install pillow); "
            "use fake_image_features for plumbing tests"
        )
    import io

    return image_mod.open(io.BytesIO(payload))


def real_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Feature vector from a REAL decode (requires Pillow): grayscale
    luminance histogram folded to ``dim`` buckets — same output shape and
    normalization as ``fake_image_features``, so it is a drop-in
    ``features_fn`` for ``extract_features``."""
    if not payload:
        return [0.0] * dim
    img = decode_image(payload).convert("L")
    hist = img.histogram()  # 256 luminance bins
    width = 256 // dim
    buckets = [
        float(sum(hist[i * width : (i + 1) * width])) for i in range(dim)
    ]
    total = sum(buckets) or 1.0
    return [b / total for b in buckets]


def _soundfile_module():
    """Import-try for soundfile (libsndfile) — OPTIONAL, for non-WAV audio
    formats (flac/ogg/...).  WAV PCM needs no dependency at all: the
    stdlib ``wave`` module + numpy decode it, so the real-decode audio
    path is exercisable even in this container."""
    try:
        import soundfile  # type: ignore[import-not-found]

        return soundfile
    except ImportError:
        return None


def decode_audio(payload: bytes) -> "tuple[object, int]":
    """Decode an audio payload to ``(mono float64 samples in [-1, 1],
    sample_rate)``.  RIFF/WAV PCM decodes via the stdlib ``wave`` module
    (no dependency); other formats fall back to the optional ``soundfile``
    library, and raise ``NotImplementedError`` with guidance when it is
    absent — same pattern as ``decode_image``/Pillow."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload)) as w:
            sr = w.getframerate()
            ch = w.getnchannels()
            sw = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
        if dtype is None:
            raise NotImplementedError(f"unsupported WAV sample width {sw}")
        x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
        if sw == 1:  # 8-bit WAV is unsigned
            x = (x - 128.0) / 128.0
        else:
            x = x / float(2 ** (8 * sw - 1))
        if ch > 1:
            x = x.reshape(-1, ch).mean(axis=1)
        return x, sr
    except (wave.Error, EOFError):
        pass  # not a WAV container — try the optional decoder
    sf = _soundfile_module()
    if sf is None:
        raise NotImplementedError(
            "non-WAV audio decode requires soundfile (pip install "
            "soundfile); WAV PCM decodes with no dependency, and "
            "fake_audio_features covers plumbing tests"
        )
    data, sr = sf.read(io.BytesIO(payload), dtype="float64")
    if getattr(data, "ndim", 1) > 1:
        data = data.mean(axis=1)
    return data, sr


def real_audio_features(payload: bytes, dim: int = 8) -> list[float]:
    """Feature vector from a REAL audio decode: magnitude spectrum
    (``numpy.fft.rfft``) folded into ``dim`` equal-width bands,
    L1-normalized — deterministic, same output shape and normalization as
    the fakes, so it is a drop-in ``features_fn`` for
    ``extract_features``."""
    import numpy as np

    if not payload:
        return [0.0] * dim
    samples, _sr = decode_audio(payload)
    if len(samples) == 0:
        return [0.0] * dim
    mag = np.abs(np.fft.rfft(samples))
    bands = [
        float(chunk.sum()) for chunk in np.array_split(mag, dim)
    ]
    total = sum(bands) or 1.0
    return [b / total for b in bands]


def _decode_avi_frames(payload: bytes, every_ms: int) -> "list | None":
    """Stdlib decoder for UNCOMPRESSED RIFF/AVI (24-bit BI_RGB DIB frames)
    — the video twin of the dependency-free WAV path in ``decode_audio``:
    a ``struct``-walked RIFF chunk tree plus numpy, no codec library.

    Returns ``[(ts_ms, grayscale uint8 ndarray), ...]`` sampled every
    ``every_ms`` (same cadence contract as the PyAV path), or ``None``
    when the payload is not an AVI this parser can decode (not RIFF/AVI,
    compressed fourcc, non-24-bit) — the caller then falls through to the
    optional PyAV/OpenCV decoders.  Grayscale is BT.601 luma
    (0.299R + 0.587G + 0.114B, rounded to uint8), the same matrix PyAV's
    ``format="gray"`` uses.  Handles bottom-up (positive biHeight, the DIB
    default) and top-down (negative) row order and 4-byte row padding.
    """
    import struct

    import numpy as np

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    state = {"usec": 33333, "w": None, "h": None, "bits": None, "comp": None}
    raw_frames: list[bytes] = []

    # Iterative chunk walk (explicit stack): this parser runs on EVERY
    # payload before the optional decoders, so a malformed/adversarial
    # RIFF with thousands of nested LISTs must fail soft (return None →
    # caller falls through to PyAV/fake), never RecursionError a task.
    stack: list[tuple[int, int]] = [(12, len(payload))]
    try:
        while stack:
            pos, end = stack.pop()
            while pos + 8 <= end:
                fourcc = payload[pos : pos + 4]
                (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
                data = pos + 8
                if data + size > len(payload):  # truncated chunk — stop
                    break
                if fourcc == b"LIST":
                    # resume this level after the list, then descend into
                    # it (skip the 4-byte list type)
                    stack.append((data + size + (size & 1), end))
                    pos, end = data + 4, data + size
                    continue
                elif fourcc == b"avih" and size >= 4:
                    state["usec"] = (
                        struct.unpack("<I", payload[data : data + 4])[0]
                        or state["usec"]
                    )
                elif fourcc == b"strf" and size >= 20 and state["w"] is None:
                    # BITMAPINFOHEADER: biSize, biWidth, biHeight,
                    # biPlanes, biBitCount, biCompression, ...
                    _sz, w, h = struct.unpack(
                        "<Iii", payload[data : data + 12]
                    )
                    bits = struct.unpack(
                        "<H", payload[data + 14 : data + 16]
                    )[0]
                    comp = struct.unpack(
                        "<I", payload[data + 16 : data + 20]
                    )[0]
                    state.update(w=w, h=h, bits=bits, comp=comp)
                elif fourcc[:2] == b"00" and fourcc[2:4] in (b"db", b"dc"):
                    # stream 00 only — the stream whose strf we parsed
                    # above; a second stream's frames must not mix into
                    # the timeline
                    raw_frames.append(payload[data : data + size])
                pos = data + size + (size & 1)  # chunks are word-aligned
    except (struct.error, ValueError):
        return None  # parse blowup on garbage bytes — defer to PyAV/fake
    w, h, bits, comp = state["w"], state["h"], state["bits"], state["comp"]
    if w is None or not raw_frames:
        return None
    if comp != 0 or bits != 24:  # BI_RGB 24-bit only — else defer to PyAV
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    frames, next_ts = [], 0
    for i, raw in enumerate(raw_frames):
        ts_ms = i * state["usec"] // 1000
        if ts_ms < next_ts:
            continue
        if len(raw) < stride * h:
            continue  # malformed frame chunk — skip, keep the cadence
        rows = np.frombuffer(raw[: stride * h], dtype=np.uint8)
        bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            bgr = bgr[::-1]  # DIBs are bottom-up by default
        gray = np.clip(
            np.round(
                0.299 * bgr[:, :, 2].astype(np.float64)
                + 0.587 * bgr[:, :, 1]
                + 0.114 * bgr[:, :, 0]
            ),
            0,
            255,
        ).astype(np.uint8)
        frames.append((ts_ms, gray))
        next_ts += every_ms
    return frames


def _video_module():
    """Import-try for a video decoder — OPTIONAL: PyAV preferred (container
    demux + frame decode), OpenCV as fallback.  Uncompressed RIFF/AVI needs
    NEITHER (``_decode_avi_frames`` is stdlib+numpy); compressed codecs
    fall back to the fake path when both libraries are absent — the
    plumbing (payload bytes in, fixed-width vector out, frame-sample
    cadence) is identical either way."""
    try:
        import av  # type: ignore[import-not-found]

        return ("av", av)
    except ImportError:
        pass
    try:
        import cv2  # type: ignore[import-not-found]

        return ("cv2", cv2)
    except ImportError:
        return None


def decode_video_frames(payload: bytes, every_ms: int = 1000) -> "list":
    """Decode a video payload to ``[(ts_ms, grayscale ndarray), ...]``
    sampled every ``every_ms`` — the decode stage the metadata-only
    ``frame_sample_plan`` defers.  Uncompressed RIFF/AVI decodes with NO
    dependency (stdlib ``struct`` + numpy, see ``_decode_avi_frames`` —
    the pattern ``decode_audio`` uses for WAV); other containers/codecs
    need PyAV or OpenCV and raise ``NotImplementedError`` with guidance
    otherwise (the ``decode_image`` pattern)."""
    avi = _decode_avi_frames(payload, every_ms)
    if avi is not None:
        return avi
    mod = _video_module()
    if mod is None:
        raise NotImplementedError(
            "compressed-video decode requires PyAV (pip install av) or "
            "OpenCV (pip install opencv-python-headless); uncompressed "
            "RIFF/AVI decodes dependency-free, and fake_video_features "
            "covers plumbing tests"
        )
    kind, lib = mod
    import numpy as np

    frames = []
    if kind == "av":
        import io

        with lib.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            next_ts = 0
            for frame in container.decode(stream):
                ts_ms = int((frame.time or 0) * 1000)
                if ts_ms >= next_ts:
                    frames.append(
                        (ts_ms, frame.to_ndarray(format="gray"))
                    )
                    next_ts += every_ms
        return frames
    # cv2 path: needs a temp file (VideoCapture has no bytes API)
    import os
    import tempfile

    fd, path = tempfile.mkstemp(suffix=".bin")
    try:
        with os.fdopen(fd, "wb") as fh:
            fh.write(payload)
        cap = lib.VideoCapture(path)
        fps = cap.get(lib.CAP_PROP_FPS) or 30.0
        step = max(1, int(round(fps * every_ms / 1000.0)))
        i = 0
        while True:
            ok, frame = cap.read()
            if not ok:
                break
            if i % step == 0:
                gray = lib.cvtColor(frame, lib.COLOR_BGR2GRAY)
                frames.append((int(i / fps * 1000), np.asarray(gray)))
            i += 1
        cap.release()
    finally:
        os.unlink(path)
    return frames


def real_video_features(
    payload: bytes, dim: int = 8, every_ms: int = 1000
) -> list[float]:
    """Feature vector from a REAL video decode (dependency-free for
    uncompressed AVI, PyAV/OpenCV for compressed codecs): mean luminance
    histogram over the sampled frames, folded to ``dim`` buckets and
    L1-normalized — drop-in ``features_fn`` with the fakes' contract."""
    import numpy as np

    if not payload:
        return [0.0] * dim
    frames = decode_video_frames(payload, every_ms)
    if not frames:
        return [0.0] * dim
    width = 256 // dim
    acc = np.zeros(dim, dtype=np.float64)
    for _ts, gray in frames:
        hist, _ = np.histogram(gray, bins=256, range=(0, 256))
        acc += [hist[i * width : (i + 1) * width].sum() for i in range(dim)]
    total = acc.sum() or 1.0
    return [float(b / total) for b in acc]


def fake_video_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decoded-video features — byte-bucket
    histogram, same contract as the other fakes."""
    return fake_image_features(payload, dim)


def fake_audio_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for decoded-audio features — byte-bucket
    histogram, identical contract to ``fake_image_features`` (kept as a
    separate name so configs read honestly: media-type-appropriate fakes,
    one real twin each)."""
    return fake_image_features(payload, dim)


def fake_image_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-image feature vector: byte-bucket
    histogram (fraction of bytes per 256/dim-wide bucket).

    Vectorized: ``frombuffer`` + ``bincount`` count bytes in C instead of a
    per-byte Python loop (~100× on kB payloads; this is the per-row hot path
    of the Arrow stage).  Output is bit-identical to the loop — integer
    counts divided once in IEEE doubles."""
    if not payload:
        return [0.0] * dim
    import numpy as np

    width = 256 // dim
    buckets = np.minimum(
        np.frombuffer(payload, dtype=np.uint8) // width, dim - 1
    )
    counts = np.bincount(buckets, minlength=dim)
    total = len(payload)
    return [int(c) / total for c in counts[:dim]]


def extract_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 8,
    batch_limit: int = 1024,
    features_fn=None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    The batch loop is the exact shape a real decoder plugs into (payload bytes
    in, fixed-width float vector out); ``batch_limit`` mirrors the
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bound a 100 TB run sets so
    a partition of large payloads can't blow executor memory.

    ``features_fn(payload: bytes, dim: int) -> list[float]`` defaults to the
    deterministic ``fake_image_features`` (this container has no decode
    library, and the oracle-gated queries need reproducible output); pass
    ``real_image_features`` in a deployment with Pillow installed.  The
    function must be importable on executors (module-level, not a closure
    over driver state).
    """
    from cerebro_spark.operators.util import ensure_parallelism

    features_fn = features_fn or fake_image_features
    df = ensure_parallelism(df)
    schema = f"`{id_col}` long, features array<double>, n_bytes long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = [
                    features_fn(p if p is not None else b"", dim)
                    for p in chunk[payload_col]
                ]
                yield pd.DataFrame(
                    {
                        id_col: chunk[id_col].values,
                        "features": feats,
                        "n_bytes": [
                            len(p) if p is not None else 0
                            for p in chunk[payload_col]
                        ],
                    }
                )

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def frame_sample_plan(
    df: DataFrame,
    every_ms: int = 1000,
    meta_col: str = "media_meta",
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (video, frame_ts) without
    decoding — the explode is pure metadata, so the expensive decode joins
    against exactly the frames a downstream stage requests."""
    n_frames = (F.col(f"{meta_col}.duration_ms") / every_ms).cast("int")
    return df.withColumn(
        "frame_ts_ms",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: i * every_ms,
            )
        ),
    )
