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
    # cadence selection stays a cheap index loop (a malformed chunk skips
    # WITHOUT advancing the cadence, exactly as before); the pixel work —
    # previously one numpy round-trip per frame — runs ONCE over the
    # stacked selected frames (r11 optimization, pixel-identical)
    sel: "list[tuple[int, int]]" = []
    next_ts = 0
    for i, raw in enumerate(raw_frames):
        ts_ms = i * state["usec"] // 1000
        if ts_ms < next_ts:
            continue
        if len(raw) < stride * h:
            continue  # malformed frame chunk — skip, keep the cadence
        sel.append((i, ts_ms))
        next_ts += every_ms
    if not sel:
        return []
    buf = np.frombuffer(
        b"".join(raw_frames[i][: stride * h] for i, _ in sel), dtype=np.uint8
    )
    bgr = buf.reshape(len(sel), h, stride)[:, :, : w * 3].reshape(
        len(sel), h, w, 3
    )
    if not top_down:
        bgr = bgr[:, ::-1]  # DIBs are bottom-up by default
    gray = np.clip(
        np.round(
            0.299 * bgr[..., 2].astype(np.float64)
            + 0.587 * bgr[..., 1]
            + 0.114 * bgr[..., 0]
        ),
        0,
        255,
    ).astype(np.uint8)
    return [(ts, gray[j]) for j, (_, ts) in enumerate(sel)]


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


# ---------------------------------------------------------------------------
# media header sniffing (real container parsing, stdlib struct only)
# ---------------------------------------------------------------------------

#: output schema of media_sniff — typed metadata parsed from real headers.
MEDIA_SNIFF_SCHEMA = (
    "doc_id long, media_type string, format string, width int, height int, "
    "duration_ms long, sample_rate int"
)


def sniff_media_meta(payload: bytes) -> dict:
    """Parse REAL container headers from magic bytes — PNG, GIF, BMP, JPEG,
    RIFF/WAVE and RIFF/AVI — into the typed metadata dict the
    ``MEDIA_META_SCHEMA`` struct carries.  Pure stdlib ``struct`` parsing
    (no decode library), so it runs on every executor with no dependency;
    unrecognized payloads come back as ``format=None`` rather than raising
    (a corpus sweep must not die on one corrupt blob).

    Returns ``{"media_type", "format", "width", "height", "duration_ms",
    "sample_rate"}`` with ``None`` for fields the format does not carry.
    """
    import struct

    out = {
        "media_type": None,
        "format": None,
        "width": None,
        "height": None,
        "duration_ms": None,
        "sample_rate": None,
    }
    p = payload or b""
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
            w, h = struct.unpack(">II", p[16:24])
            out.update(media_type="image", format="png", width=w, height=h)
        elif p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
            w, h = struct.unpack("<HH", p[6:10])
            out.update(media_type="image", format="gif", width=w, height=h)
        elif p[:2] == b"BM" and len(p) >= 26:
            # BITMAPINFOHEADER at offset 14: biSize, biWidth, biHeight
            w, h = struct.unpack("<ii", p[18:26])
            out.update(media_type="image", format="bmp", width=w, height=abs(h))
        elif p[:2] == b"\xff\xd8":
            # JPEG: walk segments to the first SOFn for dimensions
            out.update(media_type="image", format="jpeg")
            pos = 2
            while pos + 9 <= len(p) and p[pos] == 0xFF:
                marker, seglen = p[pos + 1], struct.unpack(
                    ">H", p[pos + 2 : pos + 4]
                )[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", p[pos + 5 : pos + 9])
                    out.update(width=w, height=h)
                    break
                pos += 2 + seglen
        elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            # walk chunks for fmt (rate/channels/width) + data (duration)
            sr = ch = sw = None
            data_len = None
            pos = 12
            while pos + 8 <= len(p):
                fourcc = p[pos : pos + 4]
                (size,) = struct.unpack("<I", p[pos + 4 : pos + 8])
                if fourcc == b"fmt " and size >= 16:
                    _fmt, ch, sr = struct.unpack(
                        "<HHI", p[pos + 8 : pos + 16]
                    )
                    sw = struct.unpack("<H", p[pos + 22 : pos + 24])[0] // 8
                elif fourcc == b"data":
                    data_len = size
                pos += 8 + size + (size & 1)
            out.update(media_type="audio", format="wav", sample_rate=sr)
            if None not in (sr, ch, sw, data_len) and sr and ch and sw:
                n_frames = data_len // (ch * sw)
                out["duration_ms"] = n_frames * 1000 // sr
        elif p[:4] == b"RIFF" and p[8:12] == b"AVI ":
            out.update(media_type="video", format="avi")
            # avih usec-per-frame + total frames -> duration; strf dims
            frames = _decode_avi_header_meta(p)
            if frames:
                out.update(frames)
    except (struct.error, ValueError, IndexError):
        pass  # corrupt header — report what was sniffed so far
    return out


def _decode_avi_header_meta(p: bytes) -> "dict | None":
    """Width/height/duration from an AVI's avih + strf headers (iterative
    chunk walk, same fail-soft contract as ``_decode_avi_frames``)."""
    import struct

    usec = n_frames = w = h = None
    stack = [(12, len(p))]
    while stack:
        pos, end = stack.pop()
        while pos + 8 <= end:
            fourcc = p[pos : pos + 4]
            (size,) = struct.unpack("<I", p[pos + 4 : pos + 8])
            data = pos + 8
            if data + size > len(p):
                break
            if fourcc == b"LIST":
                stack.append((data + size + (size & 1), end))
                pos, end = data + 4, data + size
                continue
            if fourcc == b"avih" and size >= 20:
                usec, _rate, _pad, _flags, n_frames = struct.unpack(
                    "<IIIII", p[data : data + 20]
                )
            elif fourcc == b"strf" and size >= 12 and w is None:
                _sz, w, h = struct.unpack("<Iii", p[data : data + 12])
            pos = data + size + (size & 1)
    if w is None and n_frames is None:
        return None
    out: dict = {}
    if w is not None:
        out.update(width=w, height=abs(h))
    if usec and n_frames is not None:
        out["duration_ms"] = n_frames * usec // 1000
    return out


def media_sniff(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched header sniffing over a binary column: one typed
    metadata row per payload, parsed from the REAL container headers by
    ``sniff_media_meta``.  Column pruning keeps this a two-column scan;
    the parse touches only the first bytes of each payload."""
    from cerebro_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                sniff_media_meta(p if p is not None else b"")
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "media_type": [m["media_type"] for m in metas],
                    "format": [m["format"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "duration_ms": [m["duration_ms"] for m in metas],
                    "sample_rate": [m["sample_rate"] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, MEDIA_SNIFF_SCHEMA)


# ---------------------------------------------------------------------------
# dependency-free BMP codec (the image twin of the WAV/AVI stdlib paths)
# ---------------------------------------------------------------------------

def encode_bmp_gray(gray) -> bytes:
    """Encode a 2-D uint8 grayscale array as a REAL 24-bit BI_RGB BMP
    (r=g=b), bottom-up rows, 4-byte row padding — the standard DIB layout
    ``decode_image_gray`` and ``sniff_media_meta`` parse back.  Stdlib
    ``struct`` + numpy only, mirroring ``_make_wav``-style fixtures but
    shipped as a library function so pipelines can materialize synthetic
    image payloads at scale."""
    import struct

    import numpy as np

    g = np.asarray(gray, dtype=np.uint8)
    h, w = g.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = np.repeat(g, 3, axis=1)  # b=g=r = luma
    pixel_data = rows[::-1].tobytes()  # bottom-up
    header_size = 14 + 40
    file_size = header_size + len(pixel_data)
    return (
        b"BM"
        + struct.pack("<IHHI", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
        + pixel_data
    )


def encode_avi_gray(frames, fps: int = 2) -> bytes:
    """Encode a list of 2-D uint8 grayscale arrays (all the same shape) as
    a REAL uncompressed RIFF/AVI (24-bit BI_RGB DIB frames, r=g=b,
    bottom-up rows, 4-byte padding) — the encoder twin of
    ``_decode_avi_frames``, completing the dependency-free codec family
    (BMP, WAV, AVI all encode AND decode with stdlib struct + numpy).
    BT.601 luma of (v, v, v) rounds back to exactly v, so an
    encode→decode round-trip is pixel-exact."""
    import struct

    import numpy as np

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    arr = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = arr[0].shape
    stride = (w * 3 + 3) // 4 * 4
    usec = 1_000_000 // fps
    avih = chunk(
        b"avih",
        struct.pack("<IIIIIIIIIIIIII", usec, 0, 0, 0, len(arr), 0, 1, 0, w, h, 0, 0, 0, 0),
    )
    strh = chunk(
        b"strh",
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(arr), 0, 0, 0, 0),
    )
    strf = chunk(
        b"strf",
        struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0),
    )
    frame_bytes = stride * h
    if frame_bytes % 2 == 0 and arr and all(a.shape == (h, w) for a in arr):
        # vectorized movi assembly (byte-identical to the per-frame loop,
        # r11 optimization): every chunk is the same 8-byte header + an
        # even-sized DIB body (stride is 4-aligned, so no odd padding) —
        # build ONE (n_frames, 8 + frame_bytes) byte matrix and serialize
        # it in a single tobytes() instead of n_frames numpy round-trips
        stack = np.stack(arr)  # (n, h, w)
        rows = np.zeros((len(arr), h, stride), dtype=np.uint8)
        rows[:, :, : w * 3] = np.repeat(stack, 3, axis=2)
        hdr = np.frombuffer(
            b"00db" + struct.pack("<I", frame_bytes), dtype=np.uint8
        )
        big = np.empty((len(arr), 8 + frame_bytes), dtype=np.uint8)
        big[:, :8] = hdr
        big[:, 8:] = rows[:, ::-1, :].reshape(len(arr), -1)  # bottom-up DIB
        movi = big.tobytes()
    else:
        movi = b""
        for g in arr:
            rows = np.zeros((h, stride), dtype=np.uint8)
            rows[:, : w * 3] = np.repeat(g, 3, axis=1)
            movi += chunk(b"00db", rows[::-1].tobytes())  # bottom-up DIB
    body = lst(b"hdrl", avih + lst(b"strl", strh + strf)) + lst(b"movi", movi)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def decode_image_gray(payload: bytes):
    """Decode an image payload to a 2-D uint8 grayscale array.  24-bit
    BI_RGB BMP decodes with NO dependency (stdlib ``struct`` + numpy —
    BT.601 luma, bottom-up/top-down row order, 4-byte padding: the exact
    DIB logic ``_decode_avi_frames`` applies per frame); other formats
    fall back to optional Pillow and raise ``NotImplementedError`` with
    guidance when it is absent — the ``decode_audio``/WAV pattern."""
    import struct

    import numpy as np

    p = payload or b""
    if p[:2] == b"BM" and len(p) >= 54:
        data_off = struct.unpack("<I", p[10:14])[0]
        _sz, w, h, _planes, bits, comp = struct.unpack("<IiiHHI", p[14:34])
        if comp == 0 and bits == 24:
            top_down = h < 0
            h = abs(h)
            stride = (w * 3 + 3) // 4 * 4
            if len(p) >= data_off + stride * h:
                rows = np.frombuffer(
                    p[data_off : data_off + stride * h], dtype=np.uint8
                )
                bgr = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
                if not top_down:
                    bgr = bgr[::-1]
                return np.clip(
                    np.round(
                        0.299 * bgr[:, :, 2].astype(np.float64)
                        + 0.587 * bgr[:, :, 1]
                        + 0.114 * bgr[:, :, 0]
                    ),
                    0,
                    255,
                ).astype(np.uint8)
    image_mod = _pil_image_module()
    if image_mod is None:
        raise NotImplementedError(
            "non-BMP image decode requires Pillow (pip install pillow); "
            "24-bit BMP decodes with no dependency"
        )
    import io

    return np.asarray(
        image_mod.open(io.BytesIO(payload)).convert("L"), dtype=np.uint8
    )


# ---------------------------------------------------------------------------
# perceptual image hashing (dHash/aHash) + banded Hamming near-dup join
# ---------------------------------------------------------------------------

def _grid_sums(gray, rows: int, cols: int):
    """Exact integer block-reduce of a grayscale array to a (rows, cols)
    grid: per-cell pixel SUM and COUNT, bucketing pixel (i, j) to cell
    (i*rows//H, j*cols//W) — the same floor-bucket rule the byte-level
    twin and its SQL oracle use, so comparisons stay in exact integer
    arithmetic (no float resampling divergence between engines)."""
    import numpy as np

    g = np.asarray(gray, dtype=np.int64)
    h, w = g.shape
    ri = (np.arange(h) * rows) // h
    ci = (np.arange(w) * cols) // w
    cell = ri[:, None] * cols + ci[None, :]
    sums = np.bincount(cell.ravel(), weights=g.ravel().astype(np.float64),
                       minlength=rows * cols).astype(np.int64)
    cnts = np.bincount(cell.ravel(), minlength=rows * cols).astype(np.int64)
    return sums.reshape(rows, cols), cnts.reshape(rows, cols)


def resize_gray(gray, out_h: int, out_w: int):
    """Exact area-mean DOWNSCALE of a grayscale array to (out_h, out_w):
    each output pixel is the floor mean of its source block under the
    same floor-bucket partition ``_grid_sums`` uses — deterministic
    integer arithmetic (no float resampling kernels), so thumbnails are
    bit-identical across engines and an oracle can recompute them from
    raw bytes.  Downscale only (``out_h <= h and out_w <= w``): every
    output cell then has >= 1 source pixel; upscaling needs a sampling
    kernel and is out of scope for the thumbnail path."""
    import numpy as np

    g = np.asarray(gray, dtype=np.uint8)
    h, w = g.shape
    assert out_h <= h and out_w <= w, "resize_gray is downscale-only"
    sums, cnts = _grid_sums(g, out_h, out_w)
    return (sums // cnts).astype(np.uint8)


def image_thumbnail_df(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    out_h: int = 4,
    out_w: int = 4,
    as_payload: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """Arrow-batched decode -> exact area-mean resize over a binary image
    column — the brief's "resize" multimodal verb.  Default output is the
    join-friendly long form ``(id, py, px, pixel)`` (one row per thumbnail
    pixel — arrays never reach the driver gate); ``as_payload=True``
    re-encodes each thumbnail as a BMP payload ``(id, thumb, width,
    height)`` for pipelines that store thumbnails.

    ``on_error="null"`` is the same fail-soft contract as
    ``image_dhash_df``: a NULL payload, an undecodable blob, or an image
    SMALLER than (out_h, out_w) (resize_gray is downscale-only) yields one
    all-NULL marker row (long form: NULL py/px/pixel; payload form: NULL
    thumb) instead of killing a corpus sweep — the id survives so the
    corruption is countable downstream.  The default ``"raise"`` keeps
    gated/oracle runs loud."""
    from cerebro_spark.operators.util import ensure_parallelism

    assert on_error in ("raise", "null")
    df = ensure_parallelism(df)

    def thumb_or_none(p):
        if p is None:
            if on_error == "raise":
                raise ValueError("NULL payload (no image bytes to decode)")
            return None
        if on_error == "raise":
            return resize_gray(decode_image_gray(bytes(p)), out_h, out_w)
        try:
            return resize_gray(decode_image_gray(bytes(p)), out_h, out_w)
        except (NotImplementedError, ValueError, AssertionError):
            return None

    if as_payload:
        def run_p(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, thumbs = [], []
                for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                    g = thumb_or_none(p)
                    ids.append(doc_id)
                    thumbs.append(None if g is None else encode_bmp_gray(g))
                yield pd.DataFrame(
                    {
                        "id": ids,
                        "thumb": thumbs,
                        "width": [out_w] * len(ids),
                        "height": [out_h] * len(ids),
                    }
                )

        return df.select(id_col, payload_col).mapInPandas(
            run_p, "id long, thumb binary, width int, height int"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pys, pxs, vals = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                g = thumb_or_none(p)
                if g is None:
                    ids.append(doc_id)
                    pys.append(None)
                    pxs.append(None)
                    vals.append(None)
                    continue
                for py in range(out_h):
                    for px in range(out_w):
                        ids.append(doc_id)
                        pys.append(py)
                        pxs.append(px)
                        vals.append(int(g[py, px]))
            yield pd.DataFrame(
                {
                    "id": ids,
                    "py": pd.array(pys, dtype="Int32"),
                    "px": pd.array(pxs, dtype="Int32"),
                    "pixel": pd.array(vals, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, "id long, py int, px int, pixel long"
    )


def dhash_from_gray(gray, rows: int = 6, cols: int = 11) -> int:
    """Difference hash (dHash) of a grayscale array: block-reduce to a
    (rows, cols) mean grid, then one bit per horizontal gradient —
    bit ``r*(cols-1)+c`` is set iff ``mean[r][c+1] > mean[r][c]``.

    Default grid 6x11 -> 60 bits: the repo's signed-long fingerprint
    discipline (``simhash`` caps at 60 for the same reason), which keeps
    the hash oracle-SQL-expressible and the banded join shift-safe in
    both engines.  The comparison is the exact cross-product form
    ``sum_b*cnt_a > sum_a*cnt_b`` — pure integers, so a +k brightness
    shift provably never flips a bit (both sides gain ``k*cnt_a*cnt_b``).
    Empty grid cells (tiny inputs) compare 0 > 0 and contribute 0 bits —
    deterministic, mirrored by the SQL oracle."""
    assert rows * (cols - 1) <= 60, "fingerprint must fit a signed long"
    sums, cnts = _grid_sums(gray, rows, cols)
    h = 0
    for r in range(rows):
        for c in range(cols - 1):
            if sums[r, c + 1] * cnts[r, c] > sums[r, c] * cnts[r, c + 1]:
                h |= 1 << (r * (cols - 1) + c)
    return h


def _dhash_stack(G, rows: int, cols: int):
    """Vectorized :func:`dhash_from_gray` over a STACK of same-shape
    grayscale frames — (n, h, w) int array in, length-n int64 hash vector
    out.  Bit-identical: the same floor-bucket cell map, exact-integer
    grid sums (one matmul for the whole stack instead of one bincount per
    frame), and the same cross-product gradient comparison.  The per-frame
    video hash pass was numpy-call-bound at ~300k tiny frames per batch;
    this collapses it to a handful of array ops (r11 optimization)."""
    import numpy as np

    n, h, w = G.shape
    S = rows * cols
    ri = (np.arange(h) * rows) // h
    ci = (np.arange(w) * cols) // w
    cell = (ri[:, None] * cols + ci[None, :]).ravel()
    flat = G.reshape(n, -1).astype(np.int64)
    if h * w <= 65536:
        # small frames (the gated corpus: 2x16 synthetic, thumbnails): the
        # dense one-hot matmul is the fastest exact form and its (h*w, S)
        # temporary is tiny
        onehot = np.zeros((h * w, S), dtype=np.int64)
        onehot[np.arange(h * w), cell] = 1
        sums = flat @ onehot
        cnts = onehot.sum(axis=0)
    else:
        # real-resolution frames (ADVICE r11: a 1080p one-hot allocates
        # ~1 GB and does S× more FLOPs than needed): group pixels by cell
        # once (the cell map is frame-independent) and take exact int64
        # group sums with add.reduceat — no dense temporary, O(h*w) work
        order = np.argsort(cell, kind="stable")
        sorted_cells = cell[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_cells[1:] != sorted_cells[:-1]]
        )
        present = sorted_cells[starts]
        gsums = np.add.reduceat(flat[:, order], starts, axis=1)
        sums = np.zeros((n, S), dtype=np.int64)
        sums[:, present] = gsums
        cnts = np.zeros(S, dtype=np.int64)
        cnts[present] = np.diff(np.r_[starts, cell.size])
    nbits = rows * (cols - 1)
    idx_a = np.array([r * cols + c for r in range(rows) for c in range(cols - 1)])
    idx_b = idx_a + 1
    kbits = np.int64(1) << np.arange(nbits, dtype=np.int64)
    bits = sums[:, idx_b] * cnts[idx_a] > sums[:, idx_a] * cnts[idx_b]
    return bits.astype(np.int64) @ kbits


def ahash_from_gray(gray, rows: int = 8, cols: int = 7) -> int:
    """Average hash (aHash): one bit per grid cell, set iff the cell mean
    exceeds the global mean (cross-multiplied to exact integers).  Less
    gradient-robust than dHash but cheaper to reason about; same 60-bit
    signed-long cap (8x8 = 64 would not band shift-safely in SQL, so the
    default here is 8x7 = 56 bits)."""
    assert rows * cols <= 60, "fingerprint must fit a signed long"
    sums, cnts = _grid_sums(gray, rows, cols)
    total_s, total_c = int(sums.sum()), int(cnts.sum())
    h = 0
    for r in range(rows):
        for c in range(cols):
            if sums[r, c] * total_c > total_s * cnts[r, c]:
                h |= 1 << (r * cols + c)
    return h


def image_dhash(payload: bytes, rows: int = 6, cols: int = 11) -> int:
    """Perceptual dHash of a REAL image payload: decode (dependency-free
    for 24-bit BMP, Pillow otherwise) then ``dhash_from_gray``.  Two
    re-encodes of the same picture — or a brightness-shifted copy — land
    within a small Hamming distance; pair them with
    ``hamming_hash_pairs``, the image twin of MinHash/SimHash dedup."""
    return dhash_from_gray(decode_image_gray(payload), rows, cols)


def image_dhash_df(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    rows: int = 6,
    cols: int = 11,
    on_error: str = "raise",
) -> DataFrame:
    """Arrow-batched ``image_dhash`` over a binary column: (id, dhash).
    The decode is the slow stage by design — run it once, persist the
    60-bit fingerprints, and run every dedup pass against those.

    ``on_error="null"`` makes the pass FAIL-SOFT: a payload the decoder
    rejects (corrupt header, unsupported format without Pillow) yields a
    NULL dhash instead of killing the task — at corpus scale one bad blob
    must not fail a 100 TB sweep; filter ``dhash IS NOT NULL`` downstream
    and count the NULLs as the corruption diagnostic.  The default
    ``"raise"`` keeps gated/oracle runs loud."""
    from cerebro_spark.operators.util import ensure_parallelism

    assert on_error in ("raise", "null")
    df = ensure_parallelism(df)

    def one(p) -> "int | None":
        # a missing payload IS a decode failure (fail-soft contract): NULL
        # under on_error='null' so absent media counts as corruption, never
        # silently clustering with genuinely zero-hash media downstream
        if p is None:
            if on_error == "raise":
                raise ValueError("NULL payload (no image bytes to decode)")
            return None
        if on_error == "raise":
            return image_dhash(bytes(p), rows, cols)
        try:
            return image_dhash(bytes(p), rows, cols)
        except (NotImplementedError, ValueError, AssertionError):
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "dhash": pd.array(
                        [one(p) for p in pdf[payload_col]], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, "id long, dhash long")


def _arrow_byte_segments(arr, S: int, shift: int):
    """Per-row byte-span segment sums/counts for one Arrow string array,
    fully vectorized: (segsum, segcnt) as (n_rows, S) int64 matrices plus
    the null-row mask.  Segment k of a row with n chars covers positions
    ``[ceil(k*n/S), ceil((k+1)*n/S))`` — the same floor-bucket inverse the
    JVM expression path and the SQL oracles use.

    Fast path: the UTF-8 data buffer is one contiguous byte run (Arrow
    varchar layout), so ONE cumulative sum over the buffer serves every
    row's 66 segment sums as O(1) subtractions — no per-row Python.  Rows
    containing non-ASCII bytes (where UTF-8 bytes != codepoints, and the
    JVM path sums ``ascii(char)`` codepoints) are recomputed exactly via
    an ord() fallback; the gated corpora are pure ASCII so the fallback
    never runs there.
    """
    import numpy as np
    import pyarrow as pa

    n_rows = len(arr)
    if pa.types.is_large_string(arr.type):
        off_dt = np.int64
    else:
        off_dt = np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=off_dt)[
        arr.offset : arr.offset + n_rows + 1
    ].astype(np.int64)
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(0, dtype=np.uint8)
    )
    lens = offs[1:] - offs[:-1]
    cs = np.zeros(len(data) + 1, dtype=np.int64)
    np.cumsum(data, dtype=np.int64, out=cs[1:])
    k = np.arange(S + 1, dtype=np.int64)
    bounds = (lens[:, None] * k + (S - 1)) // S  # (n_rows, S+1)
    pos = offs[:-1, None] + bounds
    segsum = cs[pos[:, 1:]] - cs[pos[:, :-1]]
    segcnt = bounds[:, 1:] - bounds[:, :-1]
    # rows with any non-ASCII byte: chars != bytes there — redo via ord()
    nonascii = np.flatnonzero(data[offs[0] : offs[-1]] >= 128)
    if len(nonascii):
        bad_rows = np.unique(
            np.searchsorted(offs - offs[0], nonascii, side="right") - 1
        )
        for i in bad_rows:
            s = arr[int(i)].as_py()
            if s is None:
                continue
            v = np.fromiter(map(ord, s), dtype=np.int64, count=len(s))
            c2 = np.zeros(len(v) + 1, dtype=np.int64)
            np.cumsum(v, out=c2[1:])
            b2 = (len(v) * k + (S - 1)) // S
            segsum[i] = c2[b2[1:]] - c2[b2[:-1]]
            segcnt[i] = b2[1:] - b2[:-1]
    if shift:
        segsum = segsum + shift * segcnt
    if arr.null_count:
        nulls = np.asarray(arr.is_null())
    else:
        nulls = None
    return segsum, segcnt, nulls


def _byte_hash_map_in_arrow(
    df: DataFrame,
    content_col: str,
    id_col: str,
    out_col: str,
    fold,  # (segsum, segcnt) -> int64 vector of fingerprints
    S: int,
    shift: int,
) -> DataFrame:
    """Shared mapInArrow driver for the byte-signal hashes: ship only
    (id, content) across the boundary, return (id, <out_col>).  The JVM
    expression path computes null-content rows as fingerprint 0 (every
    gradient/mean comparison is NULL -> the ``otherwise(0)`` branch), so
    the vectorized path pins the same value.

    No ``ensure_parallelism`` here, deliberately: that guard exists for
    CPU-heavy PER-ROW kernels on under-split inputs, but this kernel is
    one vectorized pass (~GB/s/core) — a sub-split input finishes in one
    task faster than the repartition exchange costs, and a large input
    already arrives with ``size/maxPartitionBytes`` splits from the scan
    (measured: the 2->32 repartition of the 10k-doc corpus cost 0.28 s
    against a 0.44 s total)."""
    import pyarrow as pa

    src = df.select(F.col(id_col).alias("id"), F.col(content_col).alias("__c"))
    id_field = src.schema[0]
    out_schema = T.StructType(
        [id_field, T.StructField(out_col, T.LongType(), True)]
    )

    def run(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        import pyarrow as pa  # noqa: F401 — worker-side import

        for rb in batches:
            ids = rb.column(0)
            arr = rb.column(1)
            segsum, segcnt, nulls = _arrow_byte_segments(arr, S, shift)
            fp = fold(segsum, segcnt)
            if nulls is not None:
                fp[nulls] = 0  # JVM parity: NULL content hashes to 0
            yield pa.RecordBatch.from_arrays(
                [ids, pa.array(fp, type=pa.int64())], ["id", out_col]
            )

    return src.mapInArrow(run, out_schema)


def byte_dhash_df(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    rows: int = 6,
    cols: int = 11,
    shift: int = 0,
    impl: str = "arrow",
) -> DataFrame:
    """Dispatcher: the vectorized Arrow kernel (default) or the all-JVM
    expression formulation (``impl='jvm'``) — bit-identical outputs,
    pinned by tests/test_round11_opt.py.  The Arrow path computes the 66
    segment sums as O(1) subtractions on ONE cumulative sum over the
    batch's contiguous UTF-8 buffer (guide §4.2 shape: Spark distributes,
    numpy crunches whole batches) — measured ~6x faster than the 66
    interpreted ``aggregate`` folds at sf0.1; at 100 TB both are narrow
    shuffle-free maps over the scan, so the constant factor is the whole
    difference."""
    if impl == "jvm":
        return _byte_dhash_expr_df(df, content_col, id_col, rows, cols, shift)

    import numpy as np

    S = rows * cols
    nbits = rows * (cols - 1)
    assert nbits <= 60, "fingerprint must fit a signed long"
    idx_a = np.array(
        [r * cols + c for r in range(rows) for c in range(cols - 1)]
    )
    idx_b = idx_a + 1
    weights = np.int64(1) << np.arange(nbits, dtype=np.int64)

    def fold(segsum, segcnt):
        bits = (
            segsum[:, idx_b] * segcnt[:, idx_a]
            > segsum[:, idx_a] * segcnt[:, idx_b]
        )
        return bits.astype(np.int64) @ weights

    return _byte_hash_map_in_arrow(
        df, content_col, id_col, "dhash", fold, S, shift
    )


def _byte_dhash_expr_df(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    rows: int = 6,
    cols: int = 11,
    shift: int = 0,
) -> DataFrame:
    """dHash computed JVM-side over a document's BYTES as a 1-D signal:
    segment the byte sequence into ``rows*cols`` equal spans (span of
    byte ``pos`` is ``pos*S div n`` — the same floor-bucket rule as
    ``_grid_sums``), reshape row-major to the (rows, cols) grid, then the
    identical exact-integer gradient bits as ``dhash_from_gray``.

    This is the oracle-SQL-expressible twin of ``image_dhash``: the same
    hash machinery, fed by byte segments instead of decoded pixels, so
    driver-gated queries can verify the grid/gradient/packing logic
    cell-for-cell in DuckDB while ``image_dhash`` (whose decode SQL
    cannot express) rides the pytest path on real BMPs.  ``shift`` adds a
    constant to every byte — the brightness-shift knob the planted
    near-dup queries use (provably hash-invariant, see
    ``dhash_from_gray``).

    Returns (id, dhash).  Shape: SHUFFLE-FREE — the whole fingerprint is
    one per-row expression (66 ``aggregate`` folds over ``slice``s of the
    split-char array, then the 60 gradient bits), so the pass is a narrow
    map over the scan with zero exchanges; total per-row work is O(n)
    (each char is visited by exactly one slice).  Segment k covers
    positions ``[ceil(k*n/S), ceil((k+1)*n/S))`` — the exact inverse of
    the ``pos*S div n`` floor-bucket rule the SQL oracle uses (measured
    2.3x faster than the explode + two-shuffle formulation it replaced,
    and the better 100 TB shape: nothing leaves the input partitions).
    All JVM built-ins; no Python in the plan.
    """
    from cerebro_spark.operators.util import ensure_parallelism

    S = rows * cols
    nbits = rows * (cols - 1)
    assert nbits <= 60, "fingerprint must fit a signed long"
    df = ensure_parallelism(df)
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(F.col(content_col), "").alias("__a"),
        F.length(content_col).alias("n"),
    )
    segsum, segcnt = {}, {}
    for k in range(S):
        start = F.expr(f"(n * {k} + {S - 1}) div {S}")
        end = F.expr(f"(n * {k + 1} + {S - 1}) div {S}")
        ln = end - start
        segsum[k] = F.aggregate(
            F.slice(F.col("__a"), start + 1, ln),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.ascii(x) + F.lit(shift),
        )
        segcnt[k] = ln.cast("long")
    fingerprint = None
    for r in range(rows):
        for c in range(cols - 1):
            a, b = r * cols + c, r * cols + c + 1
            k = r * (cols - 1) + c
            term = F.when(
                segsum[b] * segcnt[a] > segsum[a] * segcnt[b],
                F.lit(1 << k).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
            fingerprint = term if fingerprint is None else fingerprint.bitwiseOR(term)
    return base.select("id", fingerprint.alias("dhash"))


def image_ahash_df(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    rows: int = 8,
    cols: int = 7,
    on_error: str = "raise",
) -> DataFrame:
    """Arrow-batched ``ahash_from_gray`` over a binary image column:
    (id, ahash).  The SECOND vote of the two-vote near-dup precision gate
    (``dhash`` pairs ∧ ``ahash`` agreement — real pipelines run exactly
    this composition to cut dHash's false positives on flat/gradient
    images); same fail-soft ``on_error`` contract as ``image_dhash_df``."""
    from cerebro_spark.operators.util import ensure_parallelism

    assert on_error in ("raise", "null")
    df = ensure_parallelism(df)

    def one(p) -> "int | None":
        if p is None:
            if on_error == "raise":
                raise ValueError("NULL payload (no image bytes to decode)")
            return None
        if on_error == "raise":
            return ahash_from_gray(decode_image_gray(bytes(p)), rows, cols)
        try:
            return ahash_from_gray(decode_image_gray(bytes(p)), rows, cols)
        except (NotImplementedError, ValueError, AssertionError):
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "ahash": pd.array(
                        [one(p) for p in pdf[payload_col]], dtype="Int64"
                    ),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, "id long, ahash long")


def byte_ahash_df(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    rows: int = 8,
    cols: int = 7,
    shift: int = 0,
    impl: str = "arrow",
) -> DataFrame:
    """Dispatcher twin of :func:`byte_dhash_df` for the AVERAGE hash:
    vectorized Arrow kernel by default, the all-JVM expression path under
    ``impl='jvm'`` — bit-identical (tests/test_round11_opt.py)."""
    if impl == "jvm":
        return _byte_ahash_expr_df(df, content_col, id_col, rows, cols, shift)

    import numpy as np

    S = rows * cols
    assert S <= 60, "fingerprint must fit a signed long"
    weights = np.int64(1) << np.arange(S, dtype=np.int64)

    def fold(segsum, segcnt):
        total = segsum.sum(axis=1, keepdims=True)
        n = segcnt.sum(axis=1, keepdims=True)
        bits = segsum * n > total * segcnt
        return bits.astype(np.int64) @ weights

    return _byte_hash_map_in_arrow(
        df, content_col, id_col, "ahash", fold, S, shift
    )


def _byte_ahash_expr_df(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    rows: int = 8,
    cols: int = 7,
    shift: int = 0,
) -> DataFrame:
    """aHash computed JVM-side over a document's BYTES as a 1-D signal —
    the ``byte_dhash_df`` twin for the AVERAGE hash: segment the byte
    sequence into ``rows*cols`` equal spans (same floor-bucket rule), one
    bit per span, set iff the span mean exceeds the GLOBAL mean
    (cross-multiplied exact integers: ``s_k * N > S * c_k``).  Like dHash,
    provably invariant under a uniform +k byte shift (both sides gain
    ``k * c_k * N``), so a brightness twin votes IDENTICALLY — which is
    what makes (dhash ∧ ahash) a precision gate, not a recall loss.

    Returns (id, ahash).  SHUFFLE-FREE: 56 ``aggregate`` folds over
    ``slice``s plus one whole-array fold for the global sum — a narrow
    map over the scan, zero exchanges, no Python."""
    from cerebro_spark.operators.util import ensure_parallelism

    S = rows * cols
    assert S <= 60, "fingerprint must fit a signed long"
    df = ensure_parallelism(df)
    base = df.select(
        F.col(id_col).alias("id"),
        F.split(F.col(content_col), "").alias("__a"),
        F.length(content_col).alias("n"),
    )
    total = F.aggregate(
        F.col("__a"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.ascii(x) + F.lit(shift),
    )
    fingerprint = None
    for k in range(S):
        start = F.expr(f"(n * {k} + {S - 1}) div {S}")
        end = F.expr(f"(n * {k + 1} + {S - 1}) div {S}")
        ln = (end - start).cast("long")
        segsum = F.aggregate(
            F.slice(F.col("__a"), start + 1, ln),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.ascii(x) + F.lit(shift),
        )
        term = F.when(
            segsum * F.col("n").cast("long") > total * ln,
            F.lit(1 << k).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint.bitwiseOR(term)
    return base.select("id", fingerprint.alias("ahash"))


def _hash_bands(
    df: DataFrame, hash_col: str, id_col: str, bits: int, blocks: int
) -> DataFrame:
    """(id, h, blk, seg) — each fingerprint exploded into its ``blocks``
    pigeonhole segments; shared by the pair join and the persisted index."""
    width = bits // blocks
    return df.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("h"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("blk"),
                        (
                            F.expr(f"shiftright({hash_col}, {bi * width})")
                            % F.lit(2**width).cast("long")
                        ).alias("seg"),
                    )
                    for bi in range(blocks)
                ]
            )
        ).alias("bs"),
    ).select("id", "h", F.col("bs.blk").alias("blk"), F.col("bs.seg").alias("seg"))


def build_hamming_index(
    fps: DataFrame,
    path: str,
    hash_col: str = "dhash",
    id_col: str = "id",
    bits: int = 60,
    blocks: int = 4,
) -> None:
    """Persist a pigeonhole-banded Hamming index over PRE-COMPUTED
    fingerprints — the modality-agnostic twin of ``dedup.build_lsh_index``
    (text/MinHash): feed it ``byte_dhash_df`` / ``image_dhash_df`` output
    for images or ``audio_fingerprint_df`` output for audio, and probe
    arriving media online with ``query_hamming_index`` (the ingest-time
    perceptual-dedup filter).

    Layout: ``{path}/bands`` = (id, h, seg) PARTITIONED BY blk,
    ``{path}/params`` = the (bits, blocks) the index was built with —
    probes validate against it, because a probe banded under a different
    layout would silently match garbage (the build_lsh_index lesson).
    One shuffle (the partitioned write); rebuild cadence = ingest cadence.
    """
    from cerebro_spark.operators.util import small_df

    spark = fps.sparkSession
    small_df(
        spark, [(bits, blocks)], "bits int, blocks int"
    ).write.mode("overwrite").parquet(f"{path}/params")
    (
        _hash_bands(fps, hash_col, id_col, bits, blocks)
        .repartition(blocks, "blk")
        .write.mode("overwrite")
        .partitionBy("blk")
        .parquet(f"{path}/bands")
    )


def query_hamming_index(
    spark,
    path: str,
    probes: DataFrame,
    hash_col: str = "dhash",
    id_col: str = "id",
    bits: int = 60,
    blocks: int = 4,
    max_hamming: int = 3,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Online near-dup lookup against a ``build_hamming_index`` store:
    which indexed fingerprints sit within ``max_hamming`` of each
    (broadcast-sized) probe — (probe_id, match_id, hamming).  One bucket
    equi-join with the probe side broadcast; the index side is touched
    only on colliding (blk, seg) buckets.  Probe params must equal the
    persisted build params (validated), and so must the pigeonhole recall
    precondition ``max_hamming < blocks`` — without it a pair can differ
    in every block and never collide, silently presenting partial recall
    as complete results (opt in explicitly with ``allow_partial_recall``
    when a best-effort candidate sweep is the intent).

    Generation-aware: a store compacted online
    (``sinks.compact_media_index_online``) carries a ``GENERATION``
    pointer naming the live ``g=N`` subtree; resolved ONCE per call."""
    from cerebro_spark.operators.util import resolve_index_root

    _check_pigeonhole_recall(max_hamming, blocks, allow_partial_recall)
    path = resolve_index_root(path)
    p = spark.read.parquet(f"{path}/params").first()
    if (p["bits"], p["blocks"]) != (bits, blocks):
        raise ValueError(
            f"index at {path} was built with bits={p['bits']}, "
            f"blocks={p['blocks']}; probe asked for bits={bits}, "
            f"blocks={blocks} — rebuild or match the layout"
        )
    bands = spark.read.parquet(f"{path}/bands")
    pseg = _hash_bands(probes, hash_col, id_col, bits, blocks).select(
        F.col("id").alias("probe_id"),
        F.col("h").alias("ph"),
        "blk",
        "seg",
    )
    hamming = F.bit_count(F.expr("h ^ ph"))
    width = bits // blocks
    seg_eq = [
        (
            F.expr(f"shiftright(h, {bi * width})")
            % F.lit(2**width).cast("long")
            == F.expr(f"shiftright(ph, {bi * width})")
            % F.lit(2**width).cast("long")
        )
        for bi in range(blocks)
    ]
    first_match = F.coalesce(
        *[F.when(seg_eq[bi], F.lit(bi)) for bi in range(blocks)]
    )
    return (
        bands.join(F.broadcast(pseg), ["blk", "seg"])
        .filter(hamming <= max_hamming)
        .filter(F.col("blk") == first_match)  # row-local dedup, no shuffle
        .select("probe_id", F.col("id").alias("match_id"), hamming.alias("hamming"))
    )


def _check_pigeonhole_recall(
    max_hamming: int, blocks: int, allow_partial_recall: bool
) -> None:
    """The banded join's recall guarantee is the pigeonhole argument: a
    pair within Hamming ``k`` differs in at most ``k`` blocks, so with
    ``k < blocks`` at least one block is IDENTICAL and the pair collides.
    ``k >= blocks`` voids the guarantee — refuse unless the caller
    explicitly owns the partial recall."""
    if max_hamming >= blocks and not allow_partial_recall:
        raise ValueError(
            f"max_hamming={max_hamming} >= blocks={blocks} voids the "
            "pigeonhole recall guarantee (a qualifying pair can differ in "
            "every block and never collide); raise blocks, lower "
            "max_hamming, or pass allow_partial_recall=True to accept a "
            "best-effort candidate sweep"
        )


def hamming_hash_pairs(
    df: DataFrame,
    hash_col: str = "dhash",
    id_col: str = "id",
    max_hamming: int = 3,
    bits: int = 60,
    blocks: int = 4,
    max_bucket_size: int | None = None,
    allow_partial_recall: bool = False,
) -> DataFrame:
    """Near-dup pairs with Hamming(hash) <= k over PRE-COMPUTED fingerprints
    via the pigeonhole block join — the generic twin of
    ``dedup.simhash_pairs`` (cerebro_spark/operators/dedup.py:565) for
    hashes produced elsewhere (``image_dhash_df``, ``byte_dhash_df``,
    audio fingerprints).  Same recall guarantee (``max_hamming < blocks``),
    same boilerplate-skew cap semantics, same width rule: segment width
    ``bits // blocks`` must satisfy ``2^width >> N / cap`` (see the sizing
    notes and tools/soak_simhash_skew.py measurements on simhash_pairs —
    they transfer unchanged, the join is hash-agnostic).

    Returns (id_a, id_b, hamming).  One equi-join shuffle on
    (block, segment); the quadratic candidate set is Hamming-filtered
    before any dedup shuffle, and the uncapped path dedups with the
    row-local first-matching-block trick (zero extra shuffles).
    """
    _check_pigeonhole_recall(max_hamming, blocks, allow_partial_recall)
    width = bits // blocks
    seg = _hash_bands(df, hash_col, id_col, bits, blocks)
    if max_bucket_size is not None:
        small = (
            seg.groupBy("blk", "seg")
            .agg(F.count(F.lit(1)).alias("__bs"))
            .filter(F.col("__bs") <= max_bucket_size)
            .select("blk", "seg")
        )
        seg = seg.join(small, ["blk", "seg"])
    a = seg.select("blk", "seg", F.col("id").alias("id_a"), F.col("h").alias("h_a"))
    b = seg.select("blk", "seg", F.col("id").alias("id_b"), F.col("h").alias("h_b"))
    hamming = F.bit_count(F.expr("h_a ^ h_b"))
    cand = (
        a.join(b, ["blk", "seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(hamming <= max_hamming)
    )
    if max_bucket_size is None:
        seg_eq = [
            (
                F.expr(f"shiftright(h_a, {bi * width})")
                % F.lit(2**width).cast("long")
                == F.expr(f"shiftright(h_b, {bi * width})")
                % F.lit(2**width).cast("long")
            )
            for bi in range(blocks)
        ]
        first_match = F.coalesce(
            *[F.when(seg_eq[bi], F.lit(bi)) for bi in range(blocks)]
        )
        deduped = cand.filter(F.col("blk") == first_match)
    else:
        deduped = cand.dropDuplicates(["id_a", "id_b"])
    return deduped.select("id_a", "id_b", hamming.alias("hamming"))


# ---------------------------------------------------------------------------
# audio fingerprinting (band-energy signature over real PCM decode)
# ---------------------------------------------------------------------------

def encode_wav_pcm16(samples, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples as a REAL RIFF/WAVE PCM16 mono container via
    the stdlib ``wave`` module — the encoder twin of ``decode_audio``'s
    dependency-free WAV path, so pipelines can materialize audio payloads
    (and fingerprint queries can round-trip through a genuine codec)."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_audio_pcm(payload: bytes):
    """Decode a WAV PCM payload to RAW INTEGER samples ``(mono int64
    ndarray, sample_rate)`` — unlike ``decode_audio`` (normalized floats),
    this keeps every sample exact so fingerprints computed from it are
    integer arithmetic end-to-end (multi-channel input sums channels,
    preserving integerness).  Stdlib ``wave`` + numpy, WAV-only."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload)) as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"unsupported WAV sample width {sw}")
    x = np.frombuffer(raw, dtype=dtype).astype(np.int64)
    if sw == 1:
        x = x - 128  # 8-bit WAV is unsigned
    if ch > 1:
        x = x.reshape(-1, ch).sum(axis=1)
    return x, sr


def audio_fingerprint_pcm(samples, frames: int = 33) -> int:
    """Band-energy delta fingerprint of integer PCM samples: split the
    signal into ``frames`` equal time spans (floor-bucket rule), per-span
    energy = exact integer sum of squares, then bit ``k`` is set iff
    ``energy[k+1] > energy[k]`` — the sign-of-energy-gradient signature.

    ``frames-1`` bits (default 32).  The signature is invariant under
    amplitude scaling (energies scale by g^2 uniformly — the audio twin
    of dHash's brightness invariance) and robust to codecs that preserve
    energy envelope; it is NOT invariant to time reordering, which is the
    point.  Empty spans (input shorter than ``frames``) compare 0 > 0 —
    deterministic, mirrored by the SQL oracle."""
    import numpy as np

    assert frames - 1 <= 60, "fingerprint must fit a signed long"
    x = np.asarray(samples, dtype=np.int64)
    n = len(x)
    if n == 0:
        return 0
    seg = (np.arange(n) * frames) // n
    energy = np.bincount(
        seg, weights=(x * x).astype(np.float64), minlength=frames
    ).astype(np.int64)
    fp = 0
    for k in range(frames - 1):
        if energy[k + 1] > energy[k]:
            fp |= 1 << k
    return fp


def audio_fingerprint(payload: bytes, frames: int = 33) -> int:
    """``audio_fingerprint_pcm`` over a REAL WAV decode (stdlib codec,
    exact integer samples) — match clips across gain/re-encode with
    ``hamming_hash_pairs`` or an exact fingerprint equi-join."""
    samples, _sr = decode_audio_pcm(payload)
    return audio_fingerprint_pcm(samples, frames)


def audio_fingerprint_df(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frames: int = 33,
    on_error: str = "raise",
) -> DataFrame:
    """Arrow-batched ``audio_fingerprint`` over WAV payloads:
    (id, fp, n_samples).  Decode once, join fingerprints many times.
    ``on_error="null"`` is the same fail-soft contract as
    ``image_dhash_df``: undecodable payloads yield NULL fp / 0 samples
    instead of killing the sweep."""
    import wave

    from cerebro_spark.operators.util import ensure_parallelism

    assert on_error in ("raise", "null")
    df = ensure_parallelism(df)

    def one(p) -> "tuple[int | None, int]":
        # NULL payload == decode failure (same fail-soft contract as
        # image_dhash_df): NULL fp, never the 0 a silent clip also hashes to
        if p is None:
            if on_error == "raise":
                raise ValueError("NULL payload (no audio bytes to decode)")
            return None, 0
        try:
            samples, _sr = decode_audio_pcm(bytes(p))
        except (wave.Error, EOFError, NotImplementedError, ValueError):
            if on_error == "raise":
                raise
            return None, 0
        return audio_fingerprint_pcm(samples, frames), len(samples)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = [one(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].values,
                    "fp": pd.array([f for f, _ in pairs], dtype="Int64"),
                    "n_samples": [n for _, n in pairs],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, "id long, fp long, n_samples long"
    )


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


# ---------------------------------------------------------------------------
# video near-dup dedup: per-frame dHash sequence -> majority-fold signature
# -> banded candidate join -> exact frame-overlap verify
# ---------------------------------------------------------------------------

def video_frame_hash_df(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_ms: int = 1000,
    rows: int = 2,
    cols: int = 9,
    on_error: str = "raise",
) -> DataFrame:
    """Per-frame perceptual hashes through the REAL video decode path:
    decode each payload with ``decode_video_frames`` (dependency-free for
    uncompressed RIFF/AVI), dHash every sampled frame — (id, frame_idx,
    ts_ms, fhash).  The frame-hash SEQUENCE is the video's perceptual
    identity; feed it to ``video_signature`` for a video-level fingerprint
    and to ``frame_overlap_verify`` for the exact confirmation pass.

    Default grid 2x9 -> 16 bits matches the gated corpus's tiny synthetic
    frames; real footage wants the full 6x11 -> 60-bit grid (pass
    ``rows=6, cols=11``) so the downstream banded join keeps standard
    block widths.  ``on_error='null'`` is the family's fail-soft contract:
    an undecodable payload yields ONE (id, NULL, NULL, NULL) marker row."""
    from cerebro_spark.operators.util import ensure_parallelism

    assert on_error in ("raise", "null")
    df = ensure_parallelism(df)

    def frames_or_none(p):
        if p is None:
            if on_error == "raise":
                raise ValueError("NULL payload (no video bytes to decode)")
            return None
        if on_error == "raise":
            return decode_video_frames(bytes(p), every_ms)
        try:
            return decode_video_frames(bytes(p), every_ms)
        except (NotImplementedError, ValueError, AssertionError):
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        assert rows * (cols - 1) <= 60, "fingerprint must fit a signed long"
        for pdf in batches:
            ids, idxs, tss, hs, grays = [], [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                decoded = frames_or_none(p)
                if decoded is None:
                    ids.append(doc_id)
                    idxs.append(None)
                    tss.append(None)
                    hs.append(None)
                    grays.append(None)
                    continue
                for k, (ts_ms, gray) in enumerate(decoded):
                    ids.append(doc_id)
                    idxs.append(k)
                    tss.append(ts_ms)
                    hs.append(0)
                    grays.append(gray)
            # hash all frames of one shape in ONE vectorized pass
            # (bit-identical to per-frame dhash_from_gray — see
            # _dhash_stack; frames of mixed shapes group per shape)
            byshape: dict = {}
            for j, g in enumerate(grays):
                if g is not None:
                    byshape.setdefault(g.shape, []).append(j)
            for shape, js in byshape.items():
                stack = np.stack([grays[j] for j in js])
                for j, hv in zip(js, _dhash_stack(stack, rows, cols)):
                    hs[j] = int(hv)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "frame_idx": pd.array(idxs, dtype="Int64"),
                    "ts_ms": pd.array(tss, dtype="Int64"),
                    "fhash": pd.array(hs, dtype="Int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, "id long, frame_idx long, ts_ms long, fhash long"
    )


def video_signature(
    frames: DataFrame,
    hash_col: str = "fhash",
    id_col: str = "id",
    frame_col: str = "frame_idx",
    bits: int = 16,
    temporal_bands: int = 3,
) -> DataFrame:
    """Video-level fingerprint: the frame sequence is cut into
    ``temporal_bands`` equal spans (shot-aligned sampling's floor-bucket
    rule: span of frame f is ``f*T div n``), each span gets a per-bit
    MAJORITY VOTE over its frame hashes (the SimHash fold applied to frame
    dHashes), and the span folds concatenate into a ``bits*temporal_bands``
    signature.  (id, vfp, n_frames), all-JVM, two groupBy shuffles (frame
    count, then the fold).

    Why majority-per-span, not one global fold: the fold inherits each
    frame hash's brightness invariance (a uniform-gain re-encode lands at
    Hamming 0), editing k of n frames moves only the bits those frames
    were pivotal on WITHIN THEIR SPAN — so trims/edits/intro-cards land
    NEAR the original — and the temporal axis keeps videos with similar
    global frame statistics but different sequencing APART (a single
    global fold collides heavily on short clips).  Strict majority
    (ties -> 0) keeps both engines exact.

    100 TB shape: frames never leave their partitions until the fold
    aggregate; per-group state is ``bits`` counters per span.  Pair
    candidates come from the pigeonhole join over vfp (48-bit default =
    4x12-bit blocks); the O(frames) confirmation
    (``frame_overlap_verify``) runs only on candidates."""
    assert bits * temporal_bands <= 60, "signature must fit a signed long"
    nf = frames.groupBy(F.col(id_col).alias("id")).agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    spanned = frames.select(
        F.col(id_col).alias("id"),
        F.col(frame_col).alias("__f"),
        F.col(hash_col).alias("__h"),
    ).join(nf, "id").withColumn(
        "__t", F.expr(f"(__f * {temporal_bands}) div n_frames")
    )
    cnts = [
        F.sum(
            (F.shiftright(F.col("__h"), b) % F.lit(2).cast("long"))
        ).alias(f"__b{b}")
        for b in range(bits)
    ]
    agg = spanned.groupBy("id", "__t").agg(
        F.count(F.lit(1)).alias("__nt"), *cnts
    )
    span_fold = None
    for b in range(bits):
        term = F.when(
            F.col(f"__b{b}") * 2 > F.col("__nt"),
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        span_fold = term if span_fold is None else span_fold.bitwiseOR(term)
    per_span = agg.select(
        "id", "__t", span_fold.alias("__sf0")
    ).select(
        "id",
        F.expr(f"shiftleft(__sf0, cast(__t * {bits} as int))").alias("__sf"),
    )
    folded = per_span.groupBy("id").agg(
        F.sum("__sf").alias("vfp")  # spans occupy disjoint bit ranges
    )
    return folded.join(nf, "id").select("id", "vfp", "n_frames")


def video_signature_df(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_ms: int = 1000,
    rows: int = 2,
    cols: int = 9,
    bits: int = 16,
    temporal_bands: int = 3,
    on_error: str = "raise",
    impl: str = "arrow",
) -> DataFrame:
    """The VIDEO fingerprint stage for ``media_neardup_filter_sink`` —
    ``video_signature`` reshaped to the sink's ``(id, dhash)`` contract:
    per-frame dHashes through the real decode path folded into the
    temporal-majority signature, with the signature column renamed
    ``dhash`` so the sink's pigeonhole probe/growth machinery applies
    unchanged (configure the sink with ``bits = bits * temporal_bands``).

    Fail-soft composition (``on_error='null'``): an undecodable payload
    yields ``(id, NULL)`` — the sink keeps it UNINDEXED, the family
    contract.  A payload that decodes to zero frames also yields
    ``(id, NULL)`` (no frames -> no perceptual identity to probe or
    index).

    Default ``impl='arrow'`` (r11 optimization): every payload's frames
    are LOCAL to its row, so the decode -> per-frame dHash -> per-span
    majority fold all happen in ONE Arrow pass with ZERO shuffles — the
    exploded-frame composition (``impl='dataframe'``: frame-hash frame +
    count join + two fold groupBys, three exchanges) moved every frame
    hash across the wire just to group them back by the id they started
    with.  Bit-identical (exact-integer majority votes; pinned by
    tests/test_round11_opt.py), and the better 100 TB shape outright.
    """
    if impl == "dataframe":
        fh = video_frame_hash_df(
            df, payload_col, id_col, every_ms, rows, cols, on_error
        )
        good = video_signature(
            fh.filter(F.col("fhash").isNotNull()),
            bits=bits,
            temporal_bands=temporal_bands,
        )
        # ids come from the INPUT, not the frame table: a payload that
        # decodes to ZERO frames emits no frame rows at all, so deriving
        # ids from fh silently dropped it while the arrow impl emits
        # (id, NULL) — ADVICE r11.  Ids with >=1 frame or a decode-failure
        # marker are unchanged (fh ids ⊆ input ids always).
        return (
            df.select(F.col(id_col).alias("id"))
            .distinct()
            .join(good, "id", "left")
            .select("id", F.col("vfp").alias("dhash"))
        )

    from cerebro_spark.operators.util import ensure_parallelism

    assert on_error in ("raise", "null")
    assert bits * temporal_bands <= 60, "signature must fit a signed long"
    df = ensure_parallelism(df)

    def frames_or_none(p):
        if p is None:
            if on_error == "raise":
                raise ValueError("NULL payload (no video bytes to decode)")
            return None
        if on_error == "raise":
            return decode_video_frames(bytes(p), every_ms)
        try:
            return decode_video_frames(bytes(p), every_ms)
        except (NotImplementedError, ValueError, AssertionError):
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, sigs = [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                ids.append(doc_id)
                decoded = frames_or_none(p)
                if not decoded:  # decode failure OR zero frames -> NULL
                    sigs.append(None)
                    continue
                stack = np.stack([g for _, g in decoded])
                fhash = _dhash_stack(stack, rows, cols)
                n = len(fhash)
                # span of frame f is (f*T) div n — identical to
                # video_signature's floor-bucket rule over frame_idx
                spans = (np.arange(n) * temporal_bands) // n
                vfp = 0
                for t in range(temporal_bands):
                    h = fhash[spans == t]
                    if len(h) == 0:
                        continue
                    fold = 0
                    for b in range(bits):
                        if int(((h >> b) & 1).sum()) * 2 > len(h):
                            fold |= 1 << b
                    vfp += fold << (t * bits)
                sigs.append(vfp)
            yield pd.DataFrame(
                {"id": ids, "dhash": pd.array(sigs, dtype="Int64")}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, "id long, dhash long"
    )


def frame_overlap_verify(
    pairs: DataFrame,
    frames: DataFrame,
    hash_col: str = "fhash",
    id_col: str = "id",
    frame_col: str = "frame_idx",
    frame_tol: int = 0,
) -> DataFrame:
    """Exact confirmation pass for video near-dup CANDIDATES: align the two
    frame-hash sequences by frame index and count frames whose hashes sit
    within ``frame_tol`` Hamming — (id_a, id_b, hamming, n_frames_a,
    n_frames_b, matching_frames, frac_matching).  ``frac_matching`` is
    matches / max(n_a, n_b), so a trailing trim scores < 1.0 rather than
    hiding behind the inner join.

    Bounded by construction: only candidate pairs (the banded join's
    output) are verified, and each pair costs O(min(n_a, n_b)) aligned
    rows — never a frames x frames product."""
    a = frames.select(
        F.col(id_col).alias("id_a"),
        F.col(frame_col).alias("__f"),
        F.col(hash_col).alias("__ha"),
    )
    b = frames.select(
        F.col(id_col).alias("id_b"),
        F.col(frame_col).alias("__f"),
        F.col(hash_col).alias("__hb"),
    )
    na = frames.groupBy(F.col(id_col).alias("id_a")).agg(
        F.count(F.lit(1)).alias("n_frames_a")
    )
    nb = frames.groupBy(F.col(id_col).alias("id_b")).agg(
        F.count(F.lit(1)).alias("n_frames_b")
    )
    aligned = (
        pairs.select("id_a", "id_b", "hamming")
        .join(a, "id_a")
        .join(b, ["id_b", "__f"])
        .withColumn(
            "__m",
            F.when(
                F.bit_count(F.expr("__ha ^ __hb")) <= frame_tol, 1
            ).otherwise(0),
        )
        .groupBy("id_a", "id_b", "hamming")
        .agg(F.sum("__m").alias("matching_frames"))
    )
    return (
        aligned.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            "hamming",
            "n_frames_a",
            "n_frames_b",
            F.col("matching_frames").cast("long").alias("matching_frames"),
            (
                F.col("matching_frames")
                / F.greatest("n_frames_a", "n_frames_b")
            ).alias("frac_matching"),
        )
    )
