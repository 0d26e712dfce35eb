"""Multimodal gated queries: perceptual image-hash dedup, audio
fingerprinting, real-container metadata sniffing, and the cross-modal
composition join (image near-dup x text-disjoint).

The documents table carries no binary column, so each query synthesizes
its payloads deterministically from ``text`` — through REAL codecs where
one exists in-container (stdlib WAV PCM16, 24-bit BMP), so the Spark side
round-trips genuine containers while the DuckDB oracle recomputes the
expected signature from the same source bytes.  Every comparison in the
hash/fingerprint math is exact-integer (cross-multiplied means, squared
sums), so no float canonicalization is needed anywhere in this module.

Planted perceptual variants: each doc gets a twin with every byte shifted
+2 (``translate`` over the full observed byte range) — the text analogue
of re-encoding an image with a brightness offset.  dHash is provably
invariant under the shift (see ``dhash_from_gray``), while the twin
shares ZERO vocabulary with its original, which is exactly the
"same image, rewritten caption" shape the cross-modal query hunts.

Reference parity: the reference engine has no multimodal surface; these
operators are part of the driver-mandated LLM-pipeline extension
(SURVEY.md "beyond the reference" families).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.multimodal import (
    audio_fingerprint_df,
    byte_dhash_df,
    encode_bmp_gray,
    encode_wav_pcm16,
    hamming_hash_pairs,
    media_sniff,
)

#: +2 byte-shift alphabet covering the full observed document byte range
#: (32..121); built programmatically so Spark's ``translate`` and the
#: oracle's ``ord(c) + 2`` model agree on EVERY char that can appear.
_SHIFT_FROM = "".join(chr(i) for i in range(32, 122))
_SHIFT_TO = "".join(chr(i + 2) for i in range(32, 122))


def _sql_quote(s: str) -> str:
    return s.replace("'", "''")


def _backdate_files(path: str, seconds: int = 60) -> None:
    """Set every file under ``path`` to mtime = now − ``seconds``.

    The file-source streaming gates need batch-0 files to sort strictly
    BEFORE batch-1 files (FileStreamSource orders by modification time).
    Backdating batch 0 explicitly replaces the 1.05 s sleep the gates used
    to pay for mtime separation — same ordering guarantee, zero wall time.
    """
    import os
    import time as _time

    t = _time.time() - seconds
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (t, t))


# ---------------------------------------------------------------------------
# perceptual image hashing (byte-dHash, the SQL-expressible twin)
# ---------------------------------------------------------------------------

def q_dhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit byte-dHash per document — the perceptual fingerprint pass a
    corpus runs once and persists (image payloads would ride
    ``image_dhash_df`` over the same machinery)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return byte_dhash_df(docs).select(F.col("id").alias("doc_id"), "dhash")


#: shared CTE text: (id, seg, b) cells -> per-segment sums -> gradient bits.
#: ``{corpus}`` supplies (id, seg, b) rows — seg is the 6x11-grid cell index
#: in ROW-MAJOR order, however the caller's geometry maps positions to cells
#: (1-D byte spans for byte_dhash_df, 2-D pixel blocks for image_dhash).
#: The fp CTE LEFT-joins back to ``{ids}`` so every id keeps a row even if
#: no adjacent non-empty segment pair exists (mirrors byte_dhash_df /
#: image_dhash_df, which always emit one row per id).
def _dhash_fp_cte(corpus: str, ids: str) -> str:
    return f"""
cells AS ({corpus}),
segs AS (
  SELECT id, seg, sum(b) AS s, count(*) AS c
  FROM cells GROUP BY 1, 2
),
bits AS (
  SELECT a.id,
         COALESCE(sum(CASE WHEN b.s * a.c > a.s * b.c
                  THEN (CAST(1 AS BIGINT) << ((a.seg // 11) * 10 + (a.seg % 11)))
                  ELSE CAST(0 AS BIGINT) END), 0) AS dhash
  FROM segs a JOIN segs b ON a.id = b.id AND b.seg = a.seg + 1
  WHERE a.seg % 11 <> 10
  GROUP BY a.id
),
fp AS (
  SELECT i.id, CAST(COALESCE(bits.dhash, 0) AS BIGINT) AS dhash
  FROM ({ids}) i LEFT JOIN bits ON bits.id = i.id
)"""


_DHASH_DOCS_SQL = (
    "WITH "
    + _dhash_fp_cte(
        corpus="""
  SELECT id, (pos * 66) // n AS seg, b FROM (
    SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b
    FROM (SELECT doc_id AS id, length(text) AS n, string_split(text, '') AS cs
          FROM documents)
  )
""",
        ids="SELECT doc_id AS id FROM documents",
    )
    + "\nSELECT id AS doc_id, dhash FROM fp"
)


#: variant corpus: id = 2*doc_id + v, bytes shifted +2 for v=1 — the oracle
#: models Spark's ``translate`` as plain ord arithmetic (the translate maps
#: exactly chr(i) -> chr(i+2) over the full observed byte range).
#: the +2-shift cross join happens AFTER the unnest (a separate CTE scan):
#: DuckDB 1.0's binder miscompiles unnest-in-select combined with a VALUES
#: cross join in the same SELECT.
_VARIANT_CHARS = """
  SELECT 2 * base.id + v.v AS id, (pos * 66) // n AS seg, b0 + 2 * v.v AS b
  FROM (
    SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b0
    FROM (SELECT doc_id AS id, length(text) AS n, string_split(text, '') AS cs
          FROM documents)
  ) base, (VALUES (0), (1)) AS v(v)
"""
_VARIANT_IDS = (
    "SELECT 2 * doc_id + v.v AS id FROM documents, (VALUES (0), (1)) AS v(v)"
)

_VARIANT_PAIRS_BODY = """
seg4 AS (
  SELECT id, dhash, bi, (dhash >> (bi * 15)) % 32768 AS segment
  FROM fp, generate_series(0, 3) AS gg(bi)
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
    bit_count(xor(a.dhash, b.dhash)) AS hamming
  FROM seg4 a JOIN seg4 b
    ON a.bi = b.bi AND a.segment = b.segment AND a.id < b.id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
)"""


def _variant_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    orig = docs.select((F.col("doc_id") * 2).alias("doc_id"), "text")
    shifted = docs.select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.translate("text", _SHIFT_FROM, _SHIFT_TO).alias("text"),
    )
    return orig.unionAll(shifted)


def q_dhash_variant_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup pairs over the planted brightness-shift corpus:
    every (doc, +2-shifted twin) pair lands at Hamming 0 — dHash is
    provably shift-invariant — plus any genuine byte-structure twins.
    Pigeonhole-banded join (4 x 15-bit blocks), never all-pairs."""
    h = byte_dhash_df(_variant_corpus(spark, sf_dir))
    return hamming_hash_pairs(
        h, "dhash", "id", max_hamming=3, bits=60, blocks=4
    )


_DHASH_VARIANT_PAIRS_SQL = (
    "WITH "
    + _dhash_fp_cte(_VARIANT_CHARS, _VARIANT_IDS)
    + ","
    + _VARIANT_PAIRS_BODY
    + "\nSELECT id_a, id_b, hamming FROM pairs"
)

_DHASH_DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE dpairs AS MATERIALIZED (
  SELECT id_a, id_b FROM ({_DHASH_VARIANT_PAIRS_SQL}) q
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM dpairs
  UNION
  SELECT id_b AS u, id_a AS v FROM dpairs
),
nodes AS (SELECT DISTINCT u AS id FROM edges),
reach AS (
  SELECT id AS n, id AS r FROM nodes
  UNION
  SELECT reach.n, e.v AS r FROM reach JOIN edges e ON e.u = reach.r
),
comp AS (SELECT n AS id, min(r) AS component FROM reach GROUP BY n)
SELECT c.id, c.component AS canonical_id, s.cluster_size
FROM comp c
JOIN (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
) s USING (component)
"""


def q_streaming_dhash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Online perceptual fingerprinting: the documents table replayed
    through ``byte_dhash_df`` as a STREAMING stage must emit exactly the
    batch fingerprints (the `_DHASH_DOCS_SQL` oracle).  The r9
    shuffle-free rewrite made the fingerprint a pure stateless per-row
    projection, so the same operator runs unchanged at ingest time —
    fingerprint each arriving doc, then probe a persisted Hamming index
    (the `neardup_sink` pattern) for online media dedup."""
    from cerebro_spark.queries.streaming_q import _run_available_now

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    out = _run_available_now(
        docs,
        lambda s: byte_dhash_df(s),
        output_mode="append",
        ordered_single_batch=True,
        order_col="doc_id",
    )
    return out.select(F.col("id").alias("doc_id"), "dhash")


def q_dhash_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup END-TO-END: dHash fingerprints -> banded
    Hamming pairs -> connected components -> (id, canonical_id,
    cluster_size) — the image twin of `dedup_clusters` (MinHash-LSH +
    CC), sharing the same star-contraction CC operator.  Over the
    planted corpus every doc forms a 2-cluster with its brightness twin
    (plus genuine byte-structure twin groups merging to 4)."""
    from cerebro_spark.operators.cluster import connected_components

    h = byte_dhash_df(_variant_corpus(spark, sf_dir))
    pairs = hamming_hash_pairs(h, "dhash", "id", max_hamming=3, bits=60, blocks=4)
    comp = connected_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        "id", F.col("component").alias("canonical_id"), "cluster_size"
    )


# ---------------------------------------------------------------------------
# cross-modal composition: image near-dup x text-disjoint
# ---------------------------------------------------------------------------

def q_cross_modal_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs whose 'images' are perceptual near-dups but whose texts share
    ZERO vocabulary — the "same picture, rewritten caption" shape a real
    corpus dedup pipeline must separate from whole-record dups (keep one
    image payload, keep both captions).  Composition: dHash banded pairs
    anti-joined against any shared token."""
    corpus = _variant_corpus(spark, sf_dir)
    h = byte_dhash_df(corpus)
    pairs = hamming_hash_pairs(h, "dhash", "id", max_hamming=3, bits=60, blocks=4)
    toks = corpus.select(
        F.col("doc_id").alias("tid"),
        F.explode(
            F.array_distinct(F.split(F.trim("text"), r"\s+"))
        ).alias("tok"),
    )
    common = (
        pairs.select("id_a", "id_b")
        .join(toks.select(F.col("tid").alias("id_a"), "tok"), "id_a")
        .join(toks.select(F.col("tid").alias("id_b"), "tok"), ["id_b", "tok"])
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs.join(common, ["id_a", "id_b"], "left_anti").select(
        "id_a", "id_b", "hamming"
    )


_CROSS_MODAL_SQL = (
    "WITH "
    + _dhash_fp_cte(_VARIANT_CHARS, _VARIANT_IDS)
    + ","
    + _VARIANT_PAIRS_BODY
    + f""",
toks AS (
  -- tokenize AFTER the shift (matching the Spark side, which splits the
  -- already-translated twin text): the +2 shift maps space -> '"', so a
  -- shifted twin tokenizes as ONE whole-line token, not per-word tokens
  SELECT DISTINCT 2 * doc_id + v AS id,
    unnest(string_split_regex(trim(t2), '\\s+')) AS tok
  FROM (
    SELECT doc_id, v.v AS v,
      CASE WHEN v.v = 0 THEN text
           ELSE translate(text, '{_sql_quote(_SHIFT_FROM)}', '{_sql_quote(_SHIFT_TO)}')
      END AS t2
    FROM documents, (VALUES (0), (1)) AS v(v)
  )
)
SELECT p.id_a, p.id_b, p.hamming FROM pairs p
WHERE NOT EXISTS (
  SELECT 1 FROM toks ta JOIN toks tb ON ta.tok = tb.tok
  WHERE ta.id = p.id_a AND tb.id = p.id_b
)"""
)


# ---------------------------------------------------------------------------
# audio fingerprinting through a REAL WAV round-trip
# ---------------------------------------------------------------------------

def _synth_wav(
    df: DataFrame, gain: int, boost_frame: int | None = None
) -> DataFrame:
    """Arrow stage: text -> int16 PCM samples ((byte-96)*256*gain) -> REAL
    RIFF/WAVE container via the stdlib codec.  The sample map keeps every
    value in int16 range for gain in {1, 2} over the observed byte range
    (32..121 -> -32768..12800).  ``boost_frame`` adds +1024 to every sample
    in that 33-frame span — the planted local perturbation the near-match
    query uses (flips at most the two adjacent energy-delta bits)."""

    def run(batches):
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                b = np.frombuffer(str(text).encode(), dtype=np.uint8)
                samples = (b.astype(np.int64) - 96) * 256 * gain
                if boost_frame is not None:
                    seg = (np.arange(len(b)) * 33) // len(b)
                    samples = samples + np.where(seg == boost_frame, 1024, 0)
                payloads.append(encode_wav_pcm16(samples, 8000))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    from cerebro_spark.operators.util import ensure_parallelism

    # spread a sub-split input first: the per-row Python codec is the
    # CPU-heavy stage (no-op on a multi-split scan)
    return ensure_parallelism(df.select("doc_id", "text")).mapInPandas(
        run, "doc_id long, payload binary"
    )


def q_audio_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band-energy audio fingerprints computed through a REAL codec
    round-trip: synthesize a genuine WAV PCM16 container per doc, decode
    it with the stdlib codec, fingerprint the exact integer samples.  The
    oracle recomputes the expected fingerprint from the source bytes — a
    divergence anywhere in encode/decode/energy math fails the gate."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    wav = _synth_wav(docs, gain=1)
    return audio_fingerprint_df(wav).select(
        F.col("id").alias("doc_id"), "fp", "n_samples"
    )


def _audio_en_cte(gains: str) -> str:
    """Per-(doc, gain) frame energies + fingerprints from the source bytes
    (sample = (byte-96)*256*gain; energy = exact integer sum of squares).
    The energy grid is DENSIFIED to all 33 segments (empty span -> energy
    0), mirroring audio_fingerprint_pcm's bincount(minlength=frames): for a
    doc shorter than 33 chars an empty span followed by a positive-energy
    span SETS the bit, which a sparse inner join would silently drop."""
    return f"""
chars AS (
  SELECT doc_id, n, generate_subscripts(cs, 1) - 1 AS pos,
         ord(unnest(cs)) - 96 AS a
  FROM (SELECT doc_id, length(text) AS n, string_split(text, '') AS cs
        FROM documents)
),
en_raw AS (
  SELECT doc_id, gv.g AS gain, (pos * 33) // n AS seg,
         CAST(sum(a * a * 65536 * gv.g * gv.g) AS BIGINT) AS e
  FROM chars, (VALUES {gains}) AS gv(g)
  GROUP BY 1, 2, 3
),
en AS (
  SELECT d.doc_id, gv.g AS gain, s.seg,
         CAST(COALESCE(r.e, 0) AS BIGINT) AS e
  FROM (SELECT DISTINCT doc_id FROM chars) d
  CROSS JOIN (VALUES {gains}) AS gv(g)
  CROSS JOIN generate_series(0, 32) AS s(seg)
  LEFT JOIN en_raw r
    ON r.doc_id = d.doc_id AND r.gain = gv.g AND r.seg = s.seg
),
fps AS (
  SELECT a.doc_id, a.gain,
         CAST(COALESCE(sum(CASE WHEN b.e > a.e
                      THEN (CAST(1 AS BIGINT) << a.seg)
                      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS fp
  FROM en a JOIN en b ON a.doc_id = b.doc_id AND a.gain = b.gain
                     AND b.seg = a.seg + 1
  GROUP BY 1, 2
)"""


_AUDIO_FP_SQL = (
    "WITH "
    + _audio_en_cte("(1)")
    + """
SELECT d.doc_id, f.fp, CAST(length(d.text) AS BIGINT) AS n_samples
FROM documents d JOIN fps f ON f.doc_id = d.doc_id"""
)


def q_audio_scale_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clip matching across amplitude scaling: fingerprint every doc's clip
    at gain 1 and gain 2 — both through the real codec round-trip — and
    equi-join on the fingerprint.  The signature is provably gain-invariant
    (energies scale by g^2 uniformly), so each clip finds its scaled self;
    the join is the catalog-lookup shape audio dedup runs at scale."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    f1 = audio_fingerprint_df(_synth_wav(docs, gain=1)).select(
        F.col("id").alias("id_a"), "fp"
    )
    f2 = audio_fingerprint_df(_synth_wav(docs, gain=2)).select(
        F.col("id").alias("id_b"), "fp"
    )
    return f1.join(f2, "fp").select("id_a", "id_b", "fp")


_AUDIO_SCALE_MATCH_SQL = (
    "WITH "
    + _audio_en_cte("(1), (2)")
    + """
SELECT f1.doc_id AS id_a, f2.doc_id AS id_b, f1.fp
FROM fps f1 JOIN fps f2 ON f1.gain = 1 AND f2.gain = 2 AND f1.fp = f2.fp"""
)


def q_audio_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-match audio retrieval (the Shazam shape): each clip gets a twin
    with one frame locally perturbed (+1024 per sample in frame 16 — a
    click/dropout), flipping at most the two adjacent energy-delta bits.
    The pigeonhole-banded Hamming join (32-bit fp, 4 x 8-bit blocks) must
    recover every (clip, perturbed twin) pair at hamming <= 3 — the same
    generic join as image dedup, across a different modality, with both
    sides fingerprinted through the REAL codec round-trip."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    f1 = audio_fingerprint_df(
        _synth_wav(
            docs.select((F.col("doc_id") * 2).alias("doc_id"), "text"), gain=1
        )
    ).select("id", "fp")
    f2 = audio_fingerprint_df(
        _synth_wav(
            docs.select((F.col("doc_id") * 2 + 1).alias("doc_id"), "text"),
            gain=1,
            boost_frame=16,
        )
    ).select("id", "fp")
    return hamming_hash_pairs(
        f1.unionAll(f2), "fp", "id", max_hamming=3, bits=32, blocks=4
    )


_AUDIO_NEARDUP_SQL = """
WITH sm AS (
  SELECT 2 * doc_id + v.v AS id, n, (pos * 33) // n AS seg,
         a * 256 + CASE WHEN v.v = 1 AND (pos * 33) // n = 16
                        THEN 1024 ELSE 0 END AS s
  FROM (
    SELECT doc_id, n, generate_subscripts(cs, 1) - 1 AS pos,
           ord(unnest(cs)) - 96 AS a
    FROM (SELECT doc_id, length(text) AS n, string_split(text, '') AS cs
          FROM documents)
  ), (VALUES (0), (1)) AS v(v)
),
en_raw AS (
  SELECT id, seg, CAST(sum(s * s) AS BIGINT) AS e FROM sm GROUP BY 1, 2
),
-- densified to all 33 segments (empty span -> 0), mirroring bincount's
-- minlength=frames; see _audio_en_cte
en AS (
  SELECT i.id, s.seg, CAST(COALESCE(r.e, 0) AS BIGINT) AS e
  FROM (SELECT DISTINCT id FROM sm) i
  CROSS JOIN generate_series(0, 32) AS s(seg)
  LEFT JOIN en_raw r ON r.id = i.id AND r.seg = s.seg
),
fps AS (
  SELECT a.id,
         CAST(COALESCE(sum(CASE WHEN b.e > a.e
                      THEN (CAST(1 AS BIGINT) << a.seg)
                      ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS fp
  FROM en a JOIN en b ON a.id = b.id AND b.seg = a.seg + 1
  GROUP BY 1
),
seg4 AS (
  SELECT id, fp, bi, (fp >> (bi * 8)) % 256 AS segment
  FROM fps, generate_series(0, 3) AS g(bi)
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b,
  bit_count(xor(a.fp, b.fp)) AS hamming
FROM seg4 a JOIN seg4 b
  ON a.bi = b.bi AND a.segment = b.segment AND a.id < b.id
WHERE bit_count(xor(a.fp, b.fp)) <= 3
"""


# ---------------------------------------------------------------------------
# real-container metadata sniffing
# ---------------------------------------------------------------------------

def _synth_media(df: DataFrame) -> DataFrame:
    """Arrow stage: two REAL containers per doc — a 24-bit BMP (16-wide
    grayscale image from the first 16*(n//16) bytes) and a WAV PCM16 clip
    (one sample per byte) — built by the library encoders."""

    def run(batches):
        for pdf in batches:
            ids, payloads = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(str(text).encode(), dtype=np.uint8)
                h = len(b) // 16
                gray = b[: h * 16].reshape(h, 16)
                ids.append(doc_id)
                payloads.append(encode_bmp_gray(gray))
                ids.append(doc_id)
                payloads.append(
                    encode_wav_pcm16((b.astype(np.int64) - 96) * 256, 8000)
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    from cerebro_spark.operators.util import ensure_parallelism

    # spread a sub-split input first: the per-row Python codec is the
    # CPU-heavy stage (no-op on a multi-split scan)
    return ensure_parallelism(df.select("doc_id", "text")).mapInPandas(
        run, "doc_id long, payload binary"
    )


def q_media_sniff_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata parsed from REAL container headers: synthesize a BMP
    and a WAV per doc, sniff both with the stdlib header parser, unpivot
    to long form (metric, value) — the oracle recomputes each metric from
    the doc length, so header write + parse verify each other."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    sniffed = media_sniff(_synth_media(docs))
    img = sniffed.filter(F.col("media_type") == "image").select(
        "doc_id",
        "media_type",
        "format",
        F.explode(
            F.create_map(
                F.lit("width"), F.col("width").cast("long"),
                F.lit("height"), F.col("height").cast("long"),
            )
        ).alias("metric", "value"),
    )
    aud = sniffed.filter(F.col("media_type") == "audio").select(
        "doc_id",
        "media_type",
        "format",
        F.explode(
            F.create_map(
                F.lit("duration_ms"), F.col("duration_ms"),
                F.lit("sample_rate"), F.col("sample_rate").cast("long"),
            )
        ).alias("metric", "value"),
    )
    return img.unionAll(aud)


_MEDIA_SNIFF_SQL = """
SELECT doc_id, 'image' AS media_type, 'bmp' AS format, 'width' AS metric,
       CAST(16 AS BIGINT) AS value
FROM documents
UNION ALL
SELECT doc_id, 'image', 'bmp', 'height', CAST(length(text) // 16 AS BIGINT)
FROM documents
UNION ALL
SELECT doc_id, 'audio', 'wav', 'duration_ms',
       CAST(length(text) * 1000 // 8000 AS BIGINT)
FROM documents
UNION ALL
SELECT doc_id, 'audio', 'wav', 'sample_rate', CAST(8000 AS BIGINT)
FROM documents
"""


# ---------------------------------------------------------------------------
# REAL image decode gated: BMP -> pixels -> dHash, oracle from source bytes
# ---------------------------------------------------------------------------

def _synth_bmp(df: DataFrame) -> DataFrame:
    """Arrow stage: one REAL 24-bit BMP per doc — a 16-wide grayscale image
    whose pixel (i, j) is byte ``i*16 + j`` of the text (first 16*(n//16)
    bytes), built by the library encoder."""

    def run(batches):
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                b = np.frombuffer(str(text).encode(), dtype=np.uint8)
                h = len(b) // 16
                payloads.append(encode_bmp_gray(b[: h * 16].reshape(h, 16)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    from cerebro_spark.operators.util import ensure_parallelism

    # spread a sub-split input first: the per-row Python codec is the
    # CPU-heavy stage (no-op on a multi-split scan)
    return ensure_parallelism(df.select("doc_id", "text")).mapInPandas(
        run, "doc_id long, payload binary"
    )


def q_image_dhash_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual dHash through the REAL image pipeline: synthesize a
    genuine BMP per doc, decode it with the stdlib DIB parser, block-reduce
    the ACTUAL pixels to the 6x11 grid, hash.  The oracle recomputes the
    grid from the source bytes via the 2-D pixel-block bucketing rule — a
    divergence anywhere in BMP encode, row-order/padding decode, BT.601
    luma round-trip, or the grid math fails the gate."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    from cerebro_spark.operators.multimodal import image_dhash_df

    return image_dhash_df(_synth_bmp(docs)).select(
        F.col("id").alias("doc_id"), "dhash"
    )


#: 2-D grid geometry: pixel (i, j) of the h x 16 image is byte i*16+j;
#: grid cell = ((i*6)//h) * 11 + (j*11)//16 — the _grid_sums floor-bucket
#: rule in SQL (h = n//16 varies per doc; the 11-way column split of 16
#: pixels is the same for every doc).
_IMAGE_DHASH_SQL = (
    "WITH "
    + _dhash_fp_cte(
        corpus="""
  SELECT id,
         ((((pos // 16) * 6) // (n // 16)) * 11) + (((pos % 16) * 11) // 16) AS seg,
         b
  FROM (
    SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b
    FROM (SELECT doc_id AS id, length(text) AS n, string_split(text, '') AS cs
          FROM documents)
  )
  WHERE pos < (n // 16) * 16
""",
        ids="SELECT doc_id AS id FROM documents",
    )
    + "\nSELECT id AS doc_id, dhash FROM fp"
)


def q_image_thumbnails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The brief's "resize" verb through the REAL image pipeline: decode
    each synthesized BMP and area-mean it to an exact 2x4 thumbnail
    (floor integer means — no float kernel; 2 rows because the shortest
    docs yield 2-row images and resize_gray is downscale-only),
    long-form (doc_id, py, px, pixel).  The oracle recomputes every
    thumbnail pixel from the source bytes via the same floor-bucket
    block partition."""
    from cerebro_spark.operators.multimodal import image_thumbnail_df

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return image_thumbnail_df(_synth_bmp(docs), out_h=2, out_w=4).select(
        F.col("id").alias("doc_id"), "py", "px", "pixel"
    )


#: thumbnail pixel (py, px) = floor mean of the source block: source pixel
#: (i, j) = byte i*16+j maps to (i*2 // h, j*4 // 16) with h = n//16.
_IMAGE_THUMBNAILS_SQL = """
SELECT id AS doc_id,
       CAST(((pos // 16) * 2) // (n // 16) AS INTEGER) AS py,
       CAST((pos % 16) // 4 AS INTEGER) AS px,
       CAST(sum(b) // count(*) AS BIGINT) AS pixel
FROM (
  SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b
  FROM (SELECT doc_id AS id, length(text) AS n, string_split(text, '') AS cs
        FROM documents)
)
WHERE pos < (n // 16) * 16
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# REAL video decode gated: AVI round-trip -> per-frame luma sums
# ---------------------------------------------------------------------------

def _video_luma_frames(docs: DataFrame) -> DataFrame:
    """Arrow stage shared by the video queries: each doc becomes an
    uncompressed RIFF/AVI (n//16 frames of 2x8 pixels, 16 bytes per
    frame, 2 fps) via the library encoder, decoded back by the stdlib
    DIB chunk walker, reduced to exact integer per-frame luma sums."""
    from cerebro_spark.operators.multimodal import (
        decode_video_frames,
        encode_avi_gray,
    )

    def run(batches):
        for pdf in batches:
            ids, idxs, tss, lumas = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(str(text).encode(), dtype=np.uint8)
                nf = len(b) // 16
                frames = [
                    b[k * 16 : (k + 1) * 16].reshape(2, 8) for k in range(nf)
                ]
                avi = encode_avi_gray(frames, fps=2)
                for k, (ts_ms, gray) in enumerate(
                    decode_video_frames(avi, every_ms=500)
                ):
                    ids.append(doc_id)
                    idxs.append(k)
                    tss.append(ts_ms)
                    lumas.append(int(gray.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "ts_ms": tss,
                    "luma_sum": lumas,
                }
            )

    return docs.mapInPandas(
        run, "doc_id long, frame_idx long, ts_ms long, luma_sum long"
    )


def q_video_frame_luma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-frame luminance totals through a REAL video round-trip.  The
    oracle recomputes each frame's sum from the source bytes — gating the
    AVI encode, chunk walk, frame cadence, and bottom-up row order end to
    end (the video path's first driver gate; pytest-only before r9)."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    return _video_luma_frames(docs)


def q_video_shot_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-boundary detection over the decoded frames: per doc, how many
    consecutive-frame luminance jumps exceed the cut threshold — the
    scene-cut segmentation a video curation pipeline runs after frame
    sampling.  One partitioned lag window over the bounded per-frame
    frame (n//16 rows per doc), threshold |delta| > 300 on exact integer
    sums (16 bytes/frame -> sums in [512, 1936])."""
    from pyspark.sql import Window

    frames = _video_luma_frames(
        load_table(spark, "documents", sf_dir).select("doc_id", "text")
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    deltas = frames.withColumn(
        "__d", F.abs(F.col("luma_sum") - F.lag("luma_sum").over(w))
    )
    return deltas.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.when(F.col("__d") > 300, 1).otherwise(0))
        .cast("long")
        .alias("n_cuts"),
        F.coalesce(F.max("__d"), F.lit(0)).cast("long").alias("max_delta"),
    )


_VIDEO_SHOT_CUTS_SQL = """
WITH fr AS (
  SELECT id AS doc_id, pos // 16 AS frame_idx, CAST(sum(b) AS BIGINT) AS luma
  FROM (
    SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b
    FROM (SELECT doc_id AS id, length(text) AS n, string_split(text, '') AS cs
          FROM documents)
  )
  WHERE pos < (n // 16) * 16
  GROUP BY 1, 2
),
d AS (
  SELECT a.doc_id, a.frame_idx,
         abs(a.luma - b.luma) AS delta
  FROM fr a LEFT JOIN fr b
    ON a.doc_id = b.doc_id AND b.frame_idx = a.frame_idx - 1
)
SELECT doc_id, count(*) AS n_frames,
       CAST(sum(CASE WHEN delta > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
       CAST(COALESCE(max(delta), 0) AS BIGINT) AS max_delta
FROM d GROUP BY doc_id
"""


_VIDEO_FRAME_LUMA_SQL = """
SELECT id AS doc_id, pos // 16 AS frame_idx,
       CAST((pos // 16) * 500 AS BIGINT) AS ts_ms,
       CAST(sum(b) AS BIGINT) AS luma_sum
FROM (
  SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b
  FROM (SELECT doc_id AS id, length(text) AS n, string_split(text, '') AS cs
        FROM documents)
)
WHERE pos < (n // 16) * 16
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# video near-dup dedup (r10): frame-hash sequences -> majority signature ->
# banded candidates -> exact frame-overlap verify, through the REAL AVI codec
# ---------------------------------------------------------------------------

def _synth_avi(df: DataFrame) -> DataFrame:
    """Arrow stage: each doc becomes a REAL uncompressed RIFF/AVI (n//16
    frames of 2x8 pixels, 16 bytes per frame, 2 fps) via the library
    encoder — the payload `_video_luma_frames` decodes inline, exposed so
    the frame-hash operator runs over genuine container bytes."""
    from cerebro_spark.operators.multimodal import encode_avi_gray

    def run(batches):
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                b = np.frombuffer(str(text).encode(), dtype=np.uint8)
                nf = len(b) // 16
                frames = [
                    b[k * 16 : (k + 1) * 16].reshape(2, 8) for k in range(nf)
                ]
                payloads.append(encode_avi_gray(frames, fps=2))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "payload": payloads}
            )

    from cerebro_spark.operators.util import ensure_parallelism

    # spread a sub-split input first: the per-row Python codec is the
    # CPU-heavy stage (no-op on a multi-split scan)
    return ensure_parallelism(df.select("doc_id", "text")).mapInPandas(
        run, "doc_id long, payload binary"
    )


def q_video_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup dedup END-TO-END — the one modality without a dedup
    story before r10 (text has MinHash/SimHash, images dHash, audio
    band-energy): per-frame 16-bit dHashes through the REAL AVI
    encode->decode round-trip, per-video shot-aligned majority-fold
    signature (``video_signature``: 3 temporal spans x 16 bits = 48),
    pigeonhole-banded candidate join (4x12-bit blocks), then the exact
    frame-overlap confirmation
    (``frame_overlap_verify``, frame_tol=0).  The planted +2
    brightness-shift twin of every video lands at signature Hamming 0 with
    frac_matching 1.0 (every frame dHash is shift-invariant); any genuine
    byte-structure twins score whatever the oracle — which recomputes
    frame hashes, fold, band join, and overlap from source bytes —
    says they score."""
    from cerebro_spark.operators.multimodal import (
        frame_overlap_verify,
        hamming_hash_pairs,
        video_frame_hash_df,
        video_signature,
    )

    corpus = _variant_corpus(spark, sf_dir)
    # cache: the frame-hash pass (the expensive decode) feeds BOTH the
    # signature fold and the overlap verify — decode once, reuse
    fh = video_frame_hash_df(_synth_avi(corpus), every_ms=500).cache()
    sigs = video_signature(fh, bits=16, temporal_bands=3)
    pairs = hamming_hash_pairs(
        sigs, "vfp", "id", max_hamming=3, bits=48, blocks=4
    )
    return frame_overlap_verify(pairs, fh, frame_tol=0)


#: per-frame 2x9-grid dHash from source bytes: frame f pixel (i, j) is byte
#: f*16 + i*8 + j; grid cell = i*9 + (j*9)//8 (col bucket 8 stays empty —
#: its gradient bit compares 0 > 0 and contributes nothing, both engines).
_VIDEO_NEARDUP_SQL = """
WITH vchars AS (
  SELECT 2 * base.id + v.v AS id, pos, b0 + 2 * v.v AS b, n
  FROM (
    SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b0
    FROM (SELECT doc_id AS id, length(text) AS n, string_split(text, '') AS cs
          FROM documents)
  ) base, (VALUES (0), (1)) AS v(v)
  WHERE pos < (n // 16) * 16
),
fcells AS (
  SELECT id, pos // 16 AS f,
         ((pos % 16) // 8) * 9 + (((pos % 8) * 9) // 8) AS seg, b
  FROM vchars
),
fsegs AS (
  SELECT id, f, seg, sum(b) AS s, count(*) AS c FROM fcells GROUP BY 1, 2, 3
),
fbits AS (
  SELECT a.id, a.f,
         COALESCE(sum(CASE WHEN b.s * a.c > a.s * b.c
                  THEN (CAST(1 AS BIGINT) << ((a.seg // 9) * 8 + (a.seg % 9)))
                  ELSE CAST(0 AS BIGINT) END), 0) AS fhash
  FROM fsegs a LEFT JOIN fsegs b ON a.id = b.id AND a.f = b.f AND b.seg = a.seg + 1
  WHERE a.seg % 9 <> 8
  GROUP BY 1, 2
),
nf AS (SELECT id, count(*) AS n FROM fbits GROUP BY 1),
vb AS (
  SELECT fb.id, (fb.f * 3) // nf.n AS t, g.b AS bit,
         sum((fb.fhash >> g.b) % 2) AS cnt, count(*) AS nt
  FROM fbits fb JOIN nf ON nf.id = fb.id, generate_series(0, 15) AS g(b)
  GROUP BY 1, 2, 3
),
sigs AS (
  SELECT vb.id,
         CAST(COALESCE(sum(CASE WHEN cnt * 2 > nt
                  THEN (CAST(1 AS BIGINT) << (t * 16 + bit))
                  ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS vfp,
         max(nf.n) AS n
  FROM vb JOIN nf ON nf.id = vb.id
  GROUP BY 1
),
seg4 AS (
  SELECT id, vfp, bi, (vfp >> (bi * 12)) % 4096 AS segment
  FROM sigs, generate_series(0, 3) AS gg(bi)
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
    bit_count(xor(a.vfp, b.vfp)) AS hamming
  FROM seg4 a JOIN seg4 b
    ON a.bi = b.bi AND a.segment = b.segment AND a.id < b.id
  WHERE bit_count(xor(a.vfp, b.vfp)) <= 3
),
ver AS (
  SELECT p.id_a, p.id_b, p.hamming,
         sum(CASE WHEN fa.fhash = fb.fhash THEN 1 ELSE 0 END) AS matching_frames
  FROM pairs p
  JOIN fbits fa ON fa.id = p.id_a
  JOIN fbits fb ON fb.id = p.id_b AND fb.f = fa.f
  GROUP BY 1, 2, 3
)
SELECT v.id_a, v.id_b, v.hamming,
       na.n AS n_frames_a, nb.n AS n_frames_b,
       CAST(v.matching_frames AS BIGINT) AS matching_frames,
       CAST(v.matching_frames AS DOUBLE) / greatest(na.n, nb.n) AS frac_matching
FROM ver v
JOIN sigs na ON na.id = v.id_a
JOIN sigs nb ON nb.id = v.id_b
"""


def q_video_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video dedup END-TO-END: candidate pairs (signature band join) ->
    exact frame-overlap VERIFY (integer rule: matching_frames * 10 >=
    9 * max(n_a, n_b), i.e. >= 90% aligned frames — exact arithmetic, no
    float threshold) -> connected components -> (id, canonical_id,
    cluster_size); the video twin of `dhash_dedup_clusters`, sharing the
    same star-contraction CC operator.  Over the planted corpus every
    video pairs with its brightness twin at frac 1.0."""
    from cerebro_spark.operators.cluster import connected_components
    from cerebro_spark.operators.multimodal import (
        frame_overlap_verify,
        hamming_hash_pairs,
        video_frame_hash_df,
        video_signature,
    )

    corpus = _variant_corpus(spark, sf_dir)
    fh = video_frame_hash_df(_synth_avi(corpus), every_ms=500).cache()
    sigs = video_signature(fh, bits=16, temporal_bands=3)
    cands = hamming_hash_pairs(
        sigs, "vfp", "id", max_hamming=3, bits=48, blocks=4
    )
    verified = frame_overlap_verify(cands, fh, frame_tol=0).filter(
        F.col("matching_frames") * 10
        >= F.greatest("n_frames_a", "n_frames_b") * 9
    )
    comp = connected_components(verified.select("id_a", "id_b"))
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sizes, "component").select(
        "id", F.col("component").alias("canonical_id"), "cluster_size"
    )


_VIDEO_DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE vpairs AS MATERIALIZED (
  SELECT id_a, id_b FROM ({_VIDEO_NEARDUP_SQL}) q
  WHERE matching_frames * 10 >= greatest(n_frames_a, n_frames_b) * 9
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM vpairs
  UNION
  SELECT id_b AS u, id_a AS v FROM vpairs
),
vnodes AS (SELECT DISTINCT u AS id FROM edges),
reach AS (
  SELECT id AS n, id AS r FROM vnodes
  UNION
  SELECT reach.n, e.v AS r FROM reach JOIN edges e ON e.u = reach.r
),
comp AS (SELECT n AS id, min(r) AS component FROM reach GROUP BY n)
SELECT c.id, c.component AS canonical_id, s.cluster_size
FROM comp c
JOIN (
  SELECT component, count(*) AS cluster_size FROM comp GROUP BY component
) s USING (component)
"""


# ---------------------------------------------------------------------------
# two-vote perceptual precision gate (r10): dhash candidates ∧ ahash verify
# ---------------------------------------------------------------------------

def q_dhash_ahash_vote_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-VOTE near-dup pairs: dHash banded candidates (gradient hash —
    high recall, false-positive-prone on flat/low-contrast byte runs)
    CONFIRMED by aHash agreement (global-mean hash — a different failure
    mode), the composition real image pipelines run to cut dHash's false
    positives.  Both hashes are provably +k-shift-invariant, so every
    planted brightness twin survives both votes at Hamming 0; a
    coincidental dHash collision survives only if the independent aHash
    also agrees.  The join adds NO new pair scan — the ahash columns
    equi-join onto the banded candidate set."""
    from cerebro_spark.operators.multimodal import byte_ahash_df

    corpus = _variant_corpus(spark, sf_dir).cache()
    d = byte_dhash_df(corpus)
    a = byte_ahash_df(corpus)
    pairs = hamming_hash_pairs(d, "dhash", "id", max_hamming=3, bits=60, blocks=4)
    joined = pairs.join(
        a.select(F.col("id").alias("id_a"), F.col("ahash").alias("__aa")),
        "id_a",
    ).join(
        a.select(F.col("id").alias("id_b"), F.col("ahash").alias("__ab")),
        "id_b",
    )
    ah = F.bit_count(F.expr("__aa ^ __ab"))
    return joined.filter(ah <= 3).select(
        "id_a", "id_b", "hamming", ah.alias("ahamming")
    )


#: ahash over the variant corpus: 56 byte spans, bit k iff span sum * N >
#: total sum * span count (global-mean cross-product — exact integers)
_VOTE_PAIRS_SQL = (
    "WITH "
    + _dhash_fp_cte(_VARIANT_CHARS, _VARIANT_IDS)
    + ","
    + _VARIANT_PAIRS_BODY
    + """,
acells AS (
  SELECT 2 * base.id + v.v AS id, (pos * 56) // n AS seg, b0 + 2 * v.v AS b
  FROM (
    SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b0
    FROM (SELECT doc_id AS id, length(text) AS n, string_split(text, '') AS cs
          FROM documents)
  ) base, (VALUES (0), (1)) AS v(v)
),
asegs AS (
  SELECT id, seg, sum(b) AS s, count(*) AS c FROM acells GROUP BY 1, 2
),
atot AS (
  SELECT id, sum(s) AS ts, sum(c) AS tc FROM asegs GROUP BY 1
),
afp AS (
  SELECT a.id,
         CAST(COALESCE(sum(CASE WHEN a.s * t.tc > t.ts * a.c
                  THEN (CAST(1 AS BIGINT) << a.seg)
                  ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS ahash
  FROM asegs a JOIN atot t ON t.id = a.id
  GROUP BY 1
)
SELECT p.id_a, p.id_b, p.hamming,
       bit_count(xor(aa.ahash, ab.ahash)) AS ahamming
FROM pairs p
JOIN afp aa ON aa.id = p.id_a
JOIN afp ab ON ab.id = p.id_b
WHERE bit_count(xor(aa.ahash, ab.ahash)) <= 3
"""
)


# ---------------------------------------------------------------------------
# r10: online media dedup end-to-end (sink + index probe), fail-soft gate
# ---------------------------------------------------------------------------

def q_hamming_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted Hamming index's ONLINE lookup, driver-gated (pytest-only
    in r9): build the index over the corpus fingerprints (ids 2*doc_id),
    probe it with every doc's +2-shifted twin (ids 2*doc_id+1) — each probe
    must find its original at hamming 0 (dHash shift-invariance) plus any
    genuine byte-structure near-twins at <= 3.  The oracle recomputes BOTH
    fingerprint sets from source bytes and replays the banded join —
    exact-recall-equivalent to plain hamming <= 3 by the pigeonhole
    guarantee (max_hamming 3 < blocks 4)."""
    import tempfile

    from cerebro_spark.operators.multimodal import (
        build_hamming_index,
        query_hamming_index,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    idx_fps = byte_dhash_df(
        docs.select((F.col("doc_id") * 2).alias("doc_id"), "text")
    )
    probe_fps = byte_dhash_df(
        docs.select(
            (F.col("doc_id") * 2 + 1).alias("doc_id"),
            F.translate("text", _SHIFT_FROM, _SHIFT_TO).alias("text"),
        )
    )
    path = tempfile.mkdtemp(prefix="hamming_idx_gate_")
    try:
        build_hamming_index(idx_fps, path)
        out = query_hamming_index(spark, path, probe_fps).localCheckpoint(
            eager=True
        )
    finally:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
    return out


_HAMMING_INDEX_PROBE_SQL = (
    "WITH "
    + _dhash_fp_cte(_VARIANT_CHARS, _VARIANT_IDS)
    + """,
seg4 AS (
  SELECT id, dhash, bi, (dhash >> (bi * 15)) % 32768 AS segment
  FROM fp, generate_series(0, 3) AS gg(bi)
)
SELECT DISTINCT a.id AS probe_id, b.id AS match_id,
  bit_count(xor(a.dhash, b.dhash)) AS hamming
FROM seg4 a JOIN seg4 b
  ON a.bi = b.bi AND a.segment = b.segment
WHERE a.id % 2 = 1 AND b.id % 2 = 0
  AND bit_count(xor(a.dhash, b.dhash)) <= 3
"""
)


def q_streaming_media_neardup_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The online media-dedup pipeline END-TO-END, streamed == oracle:
    batch 0 = every original doc; batch 1 = a +2-shifted perceptual twin
    for even doc_ids (must DROP — hamming 0 vs the indexed original) and a
    byte-REVERSED doc for odd doc_ids (different byte structure — survives
    unless a genuine near-collision exists, which the oracle computes
    exactly).  The two micro-batches replay through
    ``media_neardup_filter_sink`` (fingerprint -> probe persisted Hamming
    index -> append survivors + index growth) over a real file-source
    stream; the oracle recomputes the sequential fold (batch-1 survivor =
    no batch-0 survivor within hamming <= 3) from source bytes."""
    import shutil
    import tempfile

    from cerebro_spark.streaming.sinks import media_neardup_filter_sink

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    b0 = docs.select((F.col("doc_id") * 2).alias("doc_id"), "text")
    b1 = docs.select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.translate("text", _SHIFT_FROM, _SHIFT_TO),
        )
        .otherwise(F.reverse("text"))
        .alias("text"),
    )
    tmp = tempfile.mkdtemp(prefix="media_neardup_gate_")
    try:
        b0.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/in")
        _backdate_files(f"{tmp}/in")  # batch 0 sorts first — no sleep needed
        b1.coalesce(1).write.mode("append").parquet(f"{tmp}/in")
        q = (
            spark.readStream.schema(b0.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmp}/in")
            .writeStream.foreachBatch(
                media_neardup_filter_sink(f"{tmp}/idx", f"{tmp}/out")
            )
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        out = (
            spark.read.parquet(f"{tmp}/out")
            .select(
                F.col("doc_id").alias("id"),
                F.length("text").cast("long").alias("n_chars"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


#: batch-1 corpus: even doc_ids -> +2 shift (perceptual twin), odd -> reverse
_MEDIA_FOLD_CHARS = """
  SELECT id, (pos * 66) // n AS seg, b FROM (
    SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b
    FROM (
      SELECT 2 * doc_id AS id, length(text) AS n,
             string_split(text, '') AS cs
      FROM documents
      UNION ALL
      SELECT 2 * doc_id + 1, length(text),
             string_split(CASE WHEN doc_id % 2 = 0
                                THEN translate(text, '{sf}', '{st}')
                                ELSE reverse(text) END, '')
      FROM documents
    )
  )
"""
_MEDIA_FOLD_IDS = (
    "SELECT 2 * doc_id + v.v AS id FROM documents, (VALUES (0), (1)) AS v(v)"
)

_STREAMING_MEDIA_NEARDUP_SQL = (
    "WITH "
    + _dhash_fp_cte(
        _MEDIA_FOLD_CHARS.format(
            sf=_sql_quote(_SHIFT_FROM), st=_sql_quote(_SHIFT_TO)
        ),
        _MEDIA_FOLD_IDS,
    )
    + """,
b0 AS (SELECT 2 * doc_id AS id, text FROM documents),
b0kept AS (
  SELECT id, text FROM (
    SELECT id, text, row_number() OVER (PARTITION BY text ORDER BY id) AS rn
    FROM b0
  ) WHERE rn = 1
),
b1 AS (
  SELECT 2 * doc_id + 1 AS id,
         CASE WHEN doc_id % 2 = 0
              THEN translate(text, '{sf}', '{st}')
              ELSE reverse(text) END AS text
  FROM documents
),
b1d AS (
  SELECT id, text FROM (
    SELECT id, text, row_number() OVER (PARTITION BY text ORDER BY id) AS rn
    FROM b1
  ) WHERE rn = 1
),
b1kept AS (
  SELECT x.id, x.text FROM b1d x
  WHERE NOT EXISTS (
    SELECT 1 FROM fp pa, fp pb
    WHERE pa.id = x.id AND pb.id IN (SELECT id FROM b0kept)
      AND bit_count(xor(pa.dhash, pb.dhash)) <= 3
  )
)
SELECT id, CAST(length(text) AS BIGINT) AS n_chars FROM b0kept
UNION ALL
SELECT id, CAST(length(text) AS BIGINT) AS n_chars FROM b1kept
""".format(sf=_sql_quote(_SHIFT_FROM), st=_sql_quote(_SHIFT_TO))
)


def q_image_dhash_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fail-soft decode contract, driver-gated: the BMP corpus with
    PLANTED corruption — doc_id % 7 == 0 gets a NULL payload (missing
    blob), doc_id % 7 == 3 a truncated header — run under
    ``on_error='null'``.  Bad payloads must yield NULL fingerprints (never
    0, which a real all-flat image also hashes to) while every healthy doc
    still hashes exactly; the oracle recomputes good fingerprints from
    source bytes and pins the NULLs by the planting rule."""
    from cerebro_spark.operators.multimodal import image_dhash_df

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    bmps = _synth_bmp(docs)
    bad = F.col("doc_id") % 7
    planted = bmps.select(
        "doc_id",
        F.when(bad == 0, F.lit(None).cast("binary"))
        .when(bad == 3, F.lit(b"BM\x00truncated").cast("binary"))
        .otherwise(F.col("payload"))
        .alias("payload"),
    )
    return image_dhash_df(planted, on_error="null").select(
        F.col("id").alias("doc_id"), "dhash"
    )


_IMAGE_DHASH_NULLS_SQL = (
    "WITH "
    + _dhash_fp_cte(
        corpus="""
  SELECT id,
         ((((pos // 16) * 6) // (n // 16)) * 11) + (((pos % 16) * 11) // 16) AS seg,
         b
  FROM (
    SELECT id, n, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b
    FROM (SELECT doc_id AS id, length(text) AS n, string_split(text, '') AS cs
          FROM documents WHERE doc_id % 7 NOT IN (0, 3))
  )
  WHERE pos < (n // 16) * 16
""",
        ids="SELECT doc_id AS id FROM documents WHERE doc_id % 7 NOT IN (0, 3)",
    )
    + """
SELECT d.doc_id,
       CASE WHEN d.doc_id % 7 IN (0, 3) THEN NULL ELSE fp.dhash END AS dhash
FROM documents d LEFT JOIN fp ON fp.id = d.doc_id
"""
)


# ---------------------------------------------------------------------------
# streaming VIDEO near-dup sink (r11): video_signature wired into
# media_neardup_filter_sink — the last unwired modality.  Batch 0 = every
# doc's AVI; batch 1 = a +2 brightness-shift re-encode for even doc_ids
# (signature Hamming 0 -> DROP) and a temporal frame-order REVERSAL for odd
# doc_ids (same frames, different sequencing — the temporal bands keep it
# apart unless the oracle's exact fold says otherwise).
# ---------------------------------------------------------------------------

def q_streaming_video_neardup_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The online VIDEO dedup pipeline END-TO-END, streamed == oracle:
    two micro-batches of real AVI payloads replay through
    ``media_neardup_filter_sink`` with ``video_signature_df`` as the
    fingerprint stage (decode -> per-frame dHash -> temporal-majority
    48-bit signature), probing the persisted Hamming index at
    ``bits=48, blocks=4, max_hamming=3`` (pigeonhole-exact).  The oracle
    recomputes frame hashes, fold, and the sequential batch fold from
    source bytes."""
    import shutil
    import tempfile

    from cerebro_spark.operators.multimodal import video_signature_df
    from cerebro_spark.streaming.sinks import media_neardup_filter_sink

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    trunc = F.expr("substring(text, 1, (length(text) div 16) * 16)")
    base = docs.select("doc_id", trunc.alias("text"))
    b0 = base.select((F.col("doc_id") * 2).alias("doc_id"), "text")
    # even doc_ids: +2 byte shift per frame (perceptual twin, must drop);
    # odd: reverse the frame ORDER (same frames, different sequencing)
    frame_rev = F.expr(
        "array_join(transform(sequence(cast(length(text) div 16 as int) - 1,"
        " 0, -1), k -> substring(text, k * 16 + 1, 16)), '')"
    )
    b1 = base.select(
        (F.col("doc_id") * 2 + 1).alias("doc_id"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.translate("text", _SHIFT_FROM, _SHIFT_TO),
        )
        .otherwise(frame_rev)
        .alias("text"),
    )
    tmp = tempfile.mkdtemp(prefix="video_neardup_gate_")
    try:
        # repartition(1), not coalesce(1): coalesce's narrow dependency
        # would pull the Python AVI-encode stage into the single write
        # task; the shuffle keeps the encode on the parallel map side and
        # still lands exactly ONE file per micro-batch
        _synth_avi(b0).repartition(1).write.mode("overwrite").parquet(
            f"{tmp}/in"
        )
        _backdate_files(f"{tmp}/in")  # batch 0 sorts first — no sleep needed
        _synth_avi(b1).repartition(1).write.mode("append").parquet(f"{tmp}/in")
        sink = media_neardup_filter_sink(
            f"{tmp}/idx",
            f"{tmp}/out",
            fingerprint=lambda d: video_signature_df(
                d, every_ms=500, on_error="null"
            ),
            content_col="payload",
            bits=48,
            blocks=4,
            max_hamming=3,
        )
        q = (
            spark.readStream.schema("doc_id long, payload binary")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{tmp}/in")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        out = (
            spark.read.parquet(f"{tmp}/out")
            .select(F.col("doc_id").alias("id"))
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


_STREAMING_VIDEO_NEARDUP_SQL = """
WITH docs16 AS (
  SELECT doc_id, (length(text) // 16) AS nf,
         substr(text, 1, CAST((length(text) // 16) * 16 AS INT)) AS trunc
  FROM documents
),
ptxt AS (
  SELECT 2 * doc_id AS id, 0 AS batch, trunc AS pt FROM docs16
  UNION ALL
  SELECT 2 * doc_id + 1, 1,
         CASE WHEN doc_id % 2 = 0 THEN translate(trunc, '{sf}', '{st}')
              ELSE array_to_string(
                     list_transform(list_reverse(range(nf)),
                       k -> substr(trunc, CAST(k * 16 + 1 AS INT), 16)), '')
         END
  FROM docs16
),
vchars AS (
  SELECT id, generate_subscripts(cs, 1) - 1 AS pos, ord(unnest(cs)) AS b
  FROM (SELECT id, string_split(pt, '') AS cs FROM ptxt)
),
fcells AS (
  SELECT id, pos // 16 AS f,
         ((pos % 16) // 8) * 9 + (((pos % 8) * 9) // 8) AS seg, b
  FROM vchars
),
fsegs AS (
  SELECT id, f, seg, sum(b) AS s, count(*) AS c FROM fcells GROUP BY 1, 2, 3
),
fbits AS (
  SELECT a.id, a.f,
         COALESCE(sum(CASE WHEN b.s * a.c > a.s * b.c
                  THEN (CAST(1 AS BIGINT) << ((a.seg // 9) * 8 + (a.seg % 9)))
                  ELSE CAST(0 AS BIGINT) END), 0) AS fhash
  FROM fsegs a LEFT JOIN fsegs b
    ON a.id = b.id AND a.f = b.f AND b.seg = a.seg + 1
  WHERE a.seg % 9 <> 8
  GROUP BY 1, 2
),
nfr AS (SELECT id, count(*) AS n FROM fbits GROUP BY 1),
vb AS (
  SELECT fb.id, (fb.f * 3) // nfr.n AS t, g.b AS bit,
         sum((fb.fhash >> g.b) % 2) AS cnt, count(*) AS nt
  FROM fbits fb JOIN nfr ON nfr.id = fb.id, generate_series(0, 15) AS g(b)
  GROUP BY 1, 2, 3
),
sigs AS (
  SELECT vb.id,
         CAST(COALESCE(sum(CASE WHEN cnt * 2 > nt
                  THEN (CAST(1 AS BIGINT) << (t * 16 + bit))
                  ELSE CAST(0 AS BIGINT) END), 0) AS BIGINT) AS vfp
  FROM vb GROUP BY 1
),
b0kept AS (
  SELECT id FROM (
    SELECT id, row_number() OVER (PARTITION BY pt ORDER BY id) AS rn
    FROM ptxt WHERE batch = 0
  ) WHERE rn = 1
),
b1d AS (
  SELECT id FROM (
    SELECT id, row_number() OVER (PARTITION BY pt ORDER BY id) AS rn
    FROM ptxt WHERE batch = 1
  ) WHERE rn = 1
),
b1kept AS (
  SELECT x.id FROM b1d x
  WHERE NOT EXISTS (
    SELECT 1 FROM sigs pa, sigs pb
    WHERE pa.id = x.id AND pb.id IN (SELECT id FROM b0kept)
      AND bit_count(xor(pa.vfp, pb.vfp)) <= 3
  )
)
SELECT id FROM b0kept UNION ALL SELECT id FROM b1kept
""".format(sf=_sql_quote(_SHIFT_FROM), st=_sql_quote(_SHIFT_TO))


QUERIES = {
    "dhash_docs": q_dhash_docs,
    "image_dhash_bmp": q_image_dhash_bmp,
    "image_thumbnails": q_image_thumbnails,
    "video_frame_luma": q_video_frame_luma,
    "video_shot_cuts": q_video_shot_cuts,
    "dhash_variant_pairs": q_dhash_variant_pairs,
    "dhash_dedup_clusters": q_dhash_dedup_clusters,
    "streaming_dhash_check": q_streaming_dhash_check,
    "cross_modal_dups": q_cross_modal_dups,
    "audio_fingerprints": q_audio_fingerprints,
    "audio_scale_match": q_audio_scale_match,
    "audio_neardup_pairs": q_audio_neardup_pairs,
    "media_sniff_meta": q_media_sniff_meta,
    "hamming_index_probe": q_hamming_index_probe,
    "streaming_media_neardup_check": q_streaming_media_neardup_check,
    "streaming_video_neardup_check": q_streaming_video_neardup_check,
    "image_dhash_nulls": q_image_dhash_nulls,
    "video_neardup_pairs": q_video_neardup_pairs,
    "dhash_ahash_vote_pairs": q_dhash_ahash_vote_pairs,
    "video_dedup_clusters": q_video_dedup_clusters,
}

ORACLES = {
    "dhash_docs": _DHASH_DOCS_SQL,
    "image_dhash_bmp": _IMAGE_DHASH_SQL,
    "image_thumbnails": _IMAGE_THUMBNAILS_SQL,
    "video_frame_luma": _VIDEO_FRAME_LUMA_SQL,
    "video_shot_cuts": _VIDEO_SHOT_CUTS_SQL,
    "dhash_variant_pairs": _DHASH_VARIANT_PAIRS_SQL,
    "dhash_dedup_clusters": _DHASH_DEDUP_CLUSTERS_SQL,
    "streaming_dhash_check": _DHASH_DOCS_SQL,
    "cross_modal_dups": _CROSS_MODAL_SQL,
    "audio_fingerprints": _AUDIO_FP_SQL,
    "audio_scale_match": _AUDIO_SCALE_MATCH_SQL,
    "audio_neardup_pairs": _AUDIO_NEARDUP_SQL,
    "media_sniff_meta": _MEDIA_SNIFF_SQL,
    "hamming_index_probe": _HAMMING_INDEX_PROBE_SQL,
    "streaming_media_neardup_check": _STREAMING_MEDIA_NEARDUP_SQL,
    "streaming_video_neardup_check": _STREAMING_VIDEO_NEARDUP_SQL,
    "image_dhash_nulls": _IMAGE_DHASH_NULLS_SQL,
    "video_neardup_pairs": _VIDEO_NEARDUP_SQL,
    "dhash_ahash_vote_pairs": _VOTE_PAIRS_SQL,
    "video_dedup_clusters": _VIDEO_DEDUP_CLUSTERS_SQL,
}
