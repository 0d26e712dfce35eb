"""Oracle-checked queries: TF-IDF top terms, corpus top n-grams, per-label
embedding centroids."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.similarity import label_centroids
from cerebro_spark.operators.dedup import duplicated_span_profile
from cerebro_spark.operators.text import (
    build_vocab,
    dedup_chunks,
    encode_tokens,
    gopher_quality_flags,
    repetition_profile,
    tfidf_top_terms,
    top_ngrams,
    unigram_nll,
)


def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tfidf_top_terms(load_table(spark, "documents", sf_dir), k=3)


_TFIDF_SQL = """
WITH terms AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
    tf * ln(CAST(n_docs AS DOUBLE) / df) AS tfidf,
    row_number() OVER (
      PARTITION BY doc_id
      ORDER BY tf * ln(CAST(n_docs AS DOUBLE) / df) DESC, term ASC
    ) AS rank
  FROM tf JOIN dfreq USING (term), n
)
SELECT doc_id, term, tf, df, tfidf, rank FROM scored WHERE rank <= 3
"""


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_ngrams(load_table(spark, "documents", sf_dir), n=2, k=20)


_TOP_NGRAMS_SQL = """
WITH toks AS (
  SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents
),
grams AS (
  SELECT array_to_string(t[i:i+1], ' ') AS ngram
  FROM toks, generate_series(1, 256) AS g(i) WHERE i <= len(t) - 1
),
counts AS (SELECT ngram, count(*) AS n_occurrences FROM grams GROUP BY 1)
SELECT ngram, n_occurrences, rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, ngram ASC) AS rank
  FROM counts
) WHERE rank <= 20
"""


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Long form (label, dim, mean_x) for the driver gate: raw array columns
    # crash its pandas canonicalizer; mean_x rounded to 6 dp on both sides
    # because avg(double) summation order differs across engines.
    from pyspark.sql import functions as F

    cen = label_centroids(load_table(spark, "embeddings", sf_dir))
    return cen.select(
        "label",
        F.posexplode("centroid").alias("dim", "mean_x"),
        "n_vectors",
    ).withColumn("mean_x", F.round("mean_x", 6))


_CENTROIDS_SQL = """
WITH ex AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, 64) AS g(i)
)
SELECT label, CAST(dim AS INTEGER) AS dim, mean_x, n_vectors FROM (
  SELECT label, dim, round(avg(x), 6) AS mean_x, count(*) AS n_vectors
  FROM ex GROUP BY label, dim
)
"""


def q_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_profile(load_table(spark, "documents", sf_dir))


_REPETITION_SQL = """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
word_m AS (
  SELECT doc_id, len(t) AS n_words,
    round(1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
      AS dup_word_frac
  FROM base
),
grams AS (
  SELECT doc_id, 1 AS n, unnest(t) AS gram FROM base
  UNION ALL
  SELECT doc_id, 2 AS n,
    unnest(list_transform(range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2]))
      AS gram
  FROM base
),
counts AS (SELECT doc_id, n, gram, count(*) AS c FROM grams GROUP BY 1, 2, 3),
tops AS (
  SELECT doc_id,
    max(CASE WHEN n = 1 THEN c END) AS topw,
    max(CASE WHEN n = 2 THEN c END) AS topb
  FROM counts GROUP BY doc_id
)
SELECT w.doc_id, n_words, dup_word_frac,
  round(CAST(topw AS DOUBLE) / n_words, 6) AS top_word_frac,
  CASE WHEN n_words >= 2
       THEN round(CAST(topb AS DOUBLE) / (n_words - 1), 6)
       ELSE 0.0 END AS top_bigram_frac
FROM word_m w JOIN tops USING (doc_id)
"""


def q_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    return unigram_nll(load_table(spark, "documents", sf_dir))


_UNIGRAM_NLL_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
vocab AS (SELECT term, count(*) AS c FROM toks GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM vocab)
SELECT doc_id, count(*) AS n_tokens,
  round(avg(-ln(CAST(c AS DOUBLE) / t)), 4) AS avg_nll
FROM toks JOIN vocab USING (term), tot
GROUP BY doc_id
"""


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level aligned-16-token-chunk exact dedup (C4-style duplicate
    line removal); first occurrence survives, docs reassembled."""
    return dedup_chunks(load_table(spark, "documents", sf_dir), chunk_tokens=16)


_CHUNK_DEDUP_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
chunks AS (
  SELECT doc_id, i AS chunk_idx,
         array_to_string(t[(i*16+1):(i*16+16)], ' ') AS chunk_text
  FROM toks, generate_series(0, 63) AS g(i)
  WHERE i * 16 < len(t)
),
totals AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY 1),
kept AS (
  SELECT doc_id, chunk_idx, chunk_text FROM (
    SELECT *, row_number() OVER (
      PARTITION BY chunk_text ORDER BY doc_id, chunk_idx) AS rn
    FROM chunks) WHERE rn = 1
),
keptagg AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(chunk_text, ' ' ORDER BY chunk_idx) AS text_kept
  FROM kept GROUP BY 1
)
SELECT t.doc_id, t.n_chunks, coalesce(k.n_kept, 0) AS n_kept,
       coalesce(k.text_kept, '') AS text_kept
FROM totals t LEFT JOIN keptagg k USING (doc_id)
"""


def q_vocab_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize-to-ids: frequency-ranked top-256 vocabulary, documents
    encoded as space-joined id strings (OOV → 0)."""
    docs = load_table(spark, "documents", sf_dir)
    return encode_tokens(docs, build_vocab(docs, vocab_size=256))


_VOCAB_ENCODE_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
pos_tok AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS token
  FROM toks, generate_series(1, 1024) AS g(i)
  WHERE i <= len(t)
),
counts AS (SELECT token, count(*) AS n FROM pos_tok GROUP BY 1),
vocab AS (
  SELECT token, row_number() OVER (ORDER BY n DESC, token ASC) AS token_id
  FROM counts ORDER BY n DESC, token ASC LIMIT 256
)
SELECT p.doc_id, count(*) AS n_tokens,
  count(*) FILTER (WHERE v.token_id IS NULL) AS n_oov,
  string_agg(CAST(coalesce(v.token_id, 0) AS VARCHAR), ' ' ORDER BY p.pos)
    AS ids_str
FROM pos_tok p LEFT JOIN vocab v USING (token)
GROUP BY p.doc_id
"""



def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 16-token-window exact substring dedup profile (suffix-array
    recipe at fixed granularity): per-doc duplicated-token fraction."""
    return duplicated_span_profile(
        load_table(spark, "documents", sf_dir), window_tokens=16
    )


_DUP_SPANS_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
base AS (SELECT doc_id, len(t) AS n_tokens FROM toks),
wins AS (
  SELECT doc_id, i - 1 AS pos, array_to_string(t[i:i+15], ' ') AS w
  FROM toks, generate_series(1, 1024) AS g(i)
  WHERE i <= len(t) - 16 + 1
),
freq AS (SELECT w, count(*) AS f FROM wins GROUP BY 1),
dup_rows AS (
  SELECT doc_id, pos,
    lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM wins JOIN freq USING (w) WHERE f >= 2
),
cov AS (
  SELECT doc_id, count(*) AS n_dup_windows,
    sum(least(coalesce(nxt - pos, 16), 16)) AS covered
  FROM dup_rows GROUP BY 1
)
SELECT b.doc_id, b.n_tokens,
  greatest(b.n_tokens - 16 + 1, 0) AS n_windows,
  coalesce(c.n_dup_windows, 0) AS n_dup_windows,
  round(coalesce(c.covered, 0) / greatest(b.n_tokens, 1), 6) AS dup_token_frac
FROM base b LEFT JOIN cov c USING (doc_id)
"""



def q_gopher_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality rules as per-rule boolean flags + keep decision."""
    return gopher_quality_flags(load_table(spark, "documents", sf_dir))


_GOPHER_FLAGS_SQL = """
WITH toks AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS t
  FROM documents
),
base AS (
  SELECT doc_id, len(t) AS n_words,
    round(CASE WHEN len(t) > 0
      THEN CAST(len(array_to_string(t, '')) AS DOUBLE) / len(t)
      ELSE 0.0 END, 6) AS mean_word_len,
    round(CASE WHEN length(text) > 0
      THEN CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
           / length(text) ELSE 0.0 END, 6) AS symbol_ratio,
    round(CASE WHEN len(t) > 0
      THEN CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
        x -> x IN ('the','a','an','and','or','of','to','in','is','it',
                   'for','on','with','as','at','by','from','that','this')))
        AS DOUBLE) / len(t) ELSE 0.0 END, 6) AS stopword_ratio
  FROM toks
),
top AS (
  SELECT doc_id, round(max(c) / CAST(max(n_words) AS DOUBLE), 6) AS top_word_frac
  FROM (
    SELECT b.doc_id, b.n_words, u.w, count(*) AS c
    FROM toks tk
    JOIN base b USING (doc_id), unnest(tk.t) AS u(w)
    GROUP BY 1, 2, 3
  ) GROUP BY 1
)
SELECT b.doc_id, b.n_words, b.mean_word_len, b.symbol_ratio,
  b.stopword_ratio, t.top_word_frac,
  CAST(b.n_words BETWEEN 4 AND 10000 AS INT) AS ok_word_count,
  CAST(b.mean_word_len BETWEEN 2 AND 12 AS INT) AS ok_mean_word_len,
  CAST(b.symbol_ratio <= 0.1 AS INT) AS ok_symbol_ratio,
  CAST(b.stopword_ratio > 0 AS INT) AS ok_stopwords,
  CAST(t.top_word_frac < 0.35 AS INT) AS ok_top_word,
  CAST(b.n_words BETWEEN 4 AND 10000 AND b.mean_word_len BETWEEN 2 AND 12
       AND b.symbol_ratio <= 0.1 AND b.stopword_ratio > 0
       AND t.top_word_frac < 0.35 AS INT) AS keep
FROM base b JOIN top t USING (doc_id)
"""



def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprint set (k=4-gram hashes, window w=4): any
    shared token run of ≥ 7 tokens yields a shared fingerprint."""
    from cerebro_spark.operators.dedup import winnow_fingerprints

    return winnow_fingerprints(
        load_table(spark, "documents", sf_dir), k=4, w=4
    )


def _winnow_fp_cte() -> str:
    """Shared CTE text: the winnowed fingerprint set in DuckDB (k=4, w=4,
    md5-prefix 60-bit hashes mirroring ``_portable_token_hash``)."""
    from cerebro_spark.queries.extensions import _hex2long_sql

    x = _hex2long_sql("md5(s)", 15)
    return f"""
toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
kg AS (
  -- generate_series(1, 256) caps grams per doc: valid for the driver
  -- corpus (max ~100 tokens/doc, pinned by a test) and mirrors the
  -- minhash-oracle convention; the Spark side has no such cap
  SELECT doc_id, i, {x} AS h
  FROM (
    SELECT doc_id, i, array_to_string(t[i:i+3], ' ') AS s
    FROM toks, generate_series(1, 256) AS g(i) WHERE i <= len(t) - 3
  )
),
win AS (
  SELECT doc_id, i, count(*) OVER (PARTITION BY doc_id) AS n,
    min(h) OVER (PARTITION BY doc_id ORDER BY i
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM kg
),
fpset AS (
  SELECT DISTINCT doc_id, fp FROM win WHERE i <= greatest(n - 3, 1)
)"""


def _winnow_sql() -> str:
    return f"WITH {_winnow_fp_cte()}\nSELECT doc_id, fp FROM fpset"


def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs sharing ≥3 winnowing fingerprints — the substring-overlap
    detector over the winnowed sub-sample (posting-list pair generation)."""
    from cerebro_spark.operators.dedup import winnow_overlap_pairs

    return winnow_overlap_pairs(
        load_table(spark, "documents", sf_dir), k=4, w=4, min_shared=3,
        max_fp_freq=1000,
    )


def _winnow_overlap_sql() -> str:
    return f"""
WITH {_winnow_fp_cte()},
ok AS (
  SELECT fp FROM fpset GROUP BY fp HAVING count(*) <= 1000
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
FROM fpset a JOIN fpset b USING (fp) JOIN ok USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 3
"""


def q_corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: per (source, lang) doc/token volume and
    the lang share within each source — the mixture summary a training-data
    pipeline checks before sampling weights.  Partitioned window (by
    source), one shuffle; no global ordering anywhere."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    n_toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    base = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_toks).alias("total_tokens"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
    w = Window.partitionBy("source")
    return base.withColumn(
        "lang_share",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w), 6),
    )


_CORPUS_COMPOSITION_SQL = """
WITH base AS (
  SELECT source, lang, count(*) AS n_docs,
    CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
      AS total_tokens,
    round(avg(n_chars), 4) AS avg_chars
  FROM documents GROUP BY 1, 2
)
SELECT source, lang, n_docs, total_tokens, avg_chars,
  round(1.0 * n_docs / sum(n_docs) OVER (PARTITION BY source), 6) AS lang_share
FROM base
"""


def q_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-length decile profile WITHOUT a global NTILE window (a global
    ranking is a single-task sort at scale): exact decile boundaries come
    from one 1-row percentile aggregate, broadcast back, and each doc is
    bucketed by boundary comparison — two shuffles, no global sort.  Decile
    d = 1 + #(boundaries < n_chars), so ties at a boundary go DOWN into the
    lower bucket on both engines (strict <)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    bounds = docs.agg(
        F.expr(
            "percentile(n_chars, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"
        ).alias("__b")
    )
    n_toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    decile = (
        F.lit(1)
        + F.aggregate(
            F.col("__b"),
            F.lit(0),
            lambda acc, b: acc + (b < F.col("n_chars")).cast("int"),
        )
    ).alias("decile")
    return (
        docs.crossJoin(F.broadcast(bounds))
        .select(decile, F.col("n_chars"), n_toks.alias("__nt"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.round(F.avg("__nt"), 4).alias("avg_tokens"),
        )
    )


_LENGTH_DECILES_SQL = """
WITH b AS (
  SELECT quantile_cont(n_chars, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS q
  FROM documents
),
bucketed AS (
  SELECT 1 + len(list_filter(b.q, x -> x < d.n_chars)) AS decile,
         d.n_chars, len(string_split_regex(trim(d.text), '\\s+')) AS nt
  FROM documents d, b
)
SELECT decile, count(*) AS n_docs, min(n_chars) AS min_chars,
  max(n_chars) AS max_chars, round(avg(nt), 4) AS avg_tokens
FROM bucketed GROUP BY 1
"""


def q_prep_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-prep funnel report: docs surviving each pipeline stage
    (total → Gopher quality gate → target language → exact-unique) as one
    (stage, n_docs) row each — the composition showcase: every stage is a
    declared operator, the funnel is four 1-row aggregates unioned (no
    repeated corpus scans beyond the stages themselves)."""
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    kept_ids = gopher_quality_flags(docs).filter(F.col("keep") == 1).select(
        "doc_id"
    )
    kept = docs.join(kept_ids, "doc_id")
    en = kept.filter(F.col("lang") == "en")
    uniq = en.select(F.md5("text").alias("__d")).distinct()

    def stage(name, df):
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(name).alias("stage"), "n_docs"
        )

    return (
        stage("00_total", docs)
        .unionByName(stage("10_gopher_keep", kept))
        .unionByName(stage("20_lang_en", en))
        .unionByName(stage("30_exact_unique", uniq))
    )


def _prep_funnel_sql() -> str:
    return f"""
WITH g AS ({_GOPHER_FLAGS_SQL}),
kept AS (
  SELECT d.* FROM documents d JOIN g USING (doc_id) WHERE g.keep = 1
),
en AS (SELECT * FROM kept WHERE lang = 'en')
SELECT '00_total' AS stage, count(*) AS n_docs FROM documents
UNION ALL SELECT '10_gopher_keep', count(*) FROM kept
UNION ALL SELECT '20_lang_en', count(*) FROM en
UNION ALL SELECT '30_exact_unique', count(DISTINCT md5(text)) FROM en
"""


def q_embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension mean/variance of the embedding corpus (whitening /
    feature-health prep): posexplode → per-dim aggregate — the distributed
    gram-vector pattern (constant 64-row output regardless of corpus
    size)."""
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", sf_dir)
    ex = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        )
    )
    return ex.groupBy("dim").agg(
        F.round(F.avg("x"), 6).alias("mean_x"),
        F.round(F.var_pop("x"), 6).alias("var_x"),
        F.count(F.lit(1)).alias("n"),
    )


_EMB_DIM_VAR_SQL = """
SELECT CAST(i - 1 AS INT) AS dim,
  round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_x,
  round(var_pop(CAST(embedding[i] AS DOUBLE)), 6) AS var_x,
  count(*) AS n
FROM embeddings, generate_series(1, 64) AS g(i)
GROUP BY 1
"""


QUERIES = {
    "tfidf_top_terms": q_tfidf,
    "top_ngrams": q_top_ngrams,
    "label_centroids": q_label_centroids,
    "repetition_profile": q_repetition_profile,
    "unigram_nll": q_unigram_nll,
    "chunk_dedup": q_chunk_dedup,
    "vocab_encode": q_vocab_encode,
    "dup_spans": q_dup_spans,
    "gopher_flags": q_gopher_flags,
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_overlap": q_winnow_overlap,
    "corpus_composition": q_corpus_composition,
    "length_deciles": q_length_deciles,
    "prep_funnel": q_prep_funnel,
    "embedding_dim_variance": q_embedding_dim_variance,
}

ORACLES = {
    "tfidf_top_terms": _TFIDF_SQL,
    "top_ngrams": _TOP_NGRAMS_SQL,
    "label_centroids": _CENTROIDS_SQL,
    "repetition_profile": _REPETITION_SQL,
    "unigram_nll": _UNIGRAM_NLL_SQL,
    "chunk_dedup": _CHUNK_DEDUP_SQL,
    "vocab_encode": _VOCAB_ENCODE_SQL,
    "dup_spans": _DUP_SPANS_SQL,
    "gopher_flags": _GOPHER_FLAGS_SQL,
    "winnow_fingerprints": _winnow_sql(),
    "winnow_overlap": _winnow_overlap_sql(),
    "corpus_composition": _CORPUS_COMPOSITION_SQL,
    "length_deciles": _LENGTH_DECILES_SQL,
    "prep_funnel": _prep_funnel_sql(),
    "embedding_dim_variance": _EMB_DIM_VAR_SQL,
}


# ---------------------------------------------------------------------------
# round-5: collocations by PMI, quality-weighted corpus sampling
# ---------------------------------------------------------------------------

def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cerebro_spark.operators.text import bigram_pmi

    return bigram_pmi(load_table(spark, "documents", sf_dir), min_count=10)


_BIGRAM_PMI_SQL = """
WITH base AS (
  SELECT string_split_regex(trim(text), '\\s+') AS t FROM documents
),
ucnt AS (
  SELECT w, count(*) AS cw
  FROM (SELECT unnest(t) AS w FROM base) GROUP BY w
),
tot AS (SELECT CAST(sum(cw) AS DOUBLE) AS nu FROM ucnt),
btot AS (
  SELECT CAST(sum(greatest(len(t) - 1, 0)) AS DOUBLE) AS nb FROM base
),
bcnt AS (
  SELECT w1, w2, count(*) AS n_pairs
  FROM (SELECT unnest(t[:-2]) AS w1, unnest(t[2:]) AS w2 FROM base)
  GROUP BY w1, w2
  HAVING count(*) >= 10
)
SELECT b.w1, b.w2, b.n_pairs, c1.cw AS c1, c2.cw AS c2,
  round(ln((CAST(b.n_pairs AS DOUBLE) * tot.nu * tot.nu)
           / (btot.nb * CAST(c1.cw AS DOUBLE) * CAST(c2.cw AS DOUBLE))), 6) AS pmi
FROM bcnt b
JOIN ucnt c1 ON b.w1 = c1.w
JOIN ucnt c2 ON b.w2 = c2.w
CROSS JOIN tot CROSS JOIN btot
"""


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted corpus downsample: survival probability = the
    composite quality score, decided by doc_id hash (no RNG — retry-stable,
    engine-reproducible)."""
    from pyspark.sql import functions as F

    from cerebro_spark.operators.sampling import weighted_sample
    from cerebro_spark.operators.text import quality_score

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "quality", quality_score(F.col("text"))
    )
    kept = weighted_sample(docs, "quality", "doc_id")
    return kept.select(
        "doc_id", "lang", "source", F.round("quality", 6).alias("quality")
    )


def _weighted_sample_sql() -> str:
    from cerebro_spark.operators.text import EN_STOPWORDS
    from cerebro_spark.queries.extensions import _hex2long_sql

    sw = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    bucket = _hex2long_sql("md5(CAST(doc_id AS STRING))", 8) + " % 100"
    return f"""
WITH m AS (
  SELECT doc_id, lang, source,
    len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
    CASE WHEN length(text) > 0
         THEN 1.0 * (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))) / length(text)
         ELSE 0.0 END AS punct_ratio,
    CASE WHEN len(string_split_regex(trim(lower(text)), '\\s+')) > 0
         THEN 1.0 * len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                    t -> list_contains([{sw}], t)))
              / len(string_split_regex(trim(lower(text)), '\\s+'))
         ELSE 0.0 END AS stopword_ratio
  FROM documents
),
q AS (
  SELECT doc_id, lang, source,
    ((CASE WHEN n_tokens >= 5 AND n_tokens <= 5000 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN stopword_ratio >= 0.01 AND stopword_ratio <= 0.6 THEN 1.0 ELSE 0.0 END)
     + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.0 END)) / 3.0 AS quality
  FROM m
)
SELECT doc_id, lang, source, round(quality, 6) AS quality
FROM q
WHERE {bucket} < quality * 100
"""



def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 BPE first-merge candidates (character-pair counts weighted by
    word frequency) — the distributed counting step of tokenizer
    induction."""
    from cerebro_spark.operators.text import bpe_merge_candidates

    return bpe_merge_candidates(load_table(spark, "documents", sf_dir), k=50)


_BPE_SQL = """
WITH words AS (
  SELECT w, count(*) AS n FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
    FROM documents
  ) WHERE len(w) >= 2 GROUP BY 1
),
pairs AS (
  SELECT substring(w, i, 2) AS pair, CAST(sum(n) AS BIGINT) AS pair_count
  FROM words, generate_series(1, 512) AS g(i)
  WHERE i <= len(w) - 1 GROUP BY 1
)
SELECT pair, pair_count, rank FROM (
  SELECT *, row_number() OVER (ORDER BY pair_count DESC, pair ASC) AS rank
  FROM pairs
) WHERE rank <= 50
"""

#: fixed retrieval query for the BM25 gate — terms from the synthetic corpus
#: vocabulary, sorted (the operator folds contributions in term order).
_BM25_TERMS = ("merge", "spark", "window")


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 retrieval for a fixed 3-term query (the missing
    classic next to tfidf_top_terms).  Corpus-side work is one filtered
    explode + combinable groupBy; query-side stats are driver scalars."""
    from cerebro_spark.operators.text import bm25_topk

    return bm25_topk(load_table(spark, "documents", sf_dir), _BM25_TERMS, k=10)


def _bm25_ctes() -> str:
    """The BM25 scoring pipeline as a reusable CTE chain ending in
    ``scored (doc_id, score)`` — shared by the bm25_topk oracle and the
    hybrid_rrf_topk oracle's lexical branch."""
    terms = ", ".join(f"'{t}'" for t in sorted(set(_BM25_TERMS)))
    # mirror the operator's float-op order exactly: idf * (tf*(k1+1)) / B with
    # B = tf + k1*((1-b) + (b*dl)/avgdl); fold per-doc contributions in term
    # order from 0.0 (list_reduce over a prepended 0.0 = Spark's F.aggregate
    # fold); quantize with floor(x*1e6 + 0.5) — same semantics both engines.
    return f"""toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(len(toks)) AS BIGINT) AS dl_sum
  FROM toks
),
tf AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM (
    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM toks
  )
  WHERE term IN ({terms})
  GROUP BY 1, 2, 3
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
per AS (
  SELECT doc_id,
    term,
    ln(1.0 + ((n_docs - df) + 0.5) / (df + 0.5))
      * (tf * (1.2 + 1.0))
      / (tf + 1.2 * ((1.0 - 0.75) + (0.75 * dl) / (CAST(dl_sum AS DOUBLE) / n_docs)))
      AS contrib
  FROM tf JOIN dfreq USING (term), stats
),
scored AS (
  SELECT doc_id,
    floor(list_reduce(list_prepend(0.0, list(contrib ORDER BY term)),
                      (acc, c) -> acc + c) * 1e6 + 0.5) / 1e6 AS score
  FROM per GROUP BY doc_id
)"""


def _bm25_sql() -> str:
    return f"""
WITH {_bm25_ctes()}
SELECT doc_id, score,
  CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank
FROM scored
QUALIFY rank <= 10
"""


QUERIES["bm25_topk"] = q_bm25_topk
ORACLES["bm25_topk"] = _bm25_sql()


def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 top-50 for the fixed 3-term query fused with
    the embedding-cosine top-50 around query vector vec_id=0 via
    reciprocal-rank fusion (similarity.rrf_fuse, k=60 — the SIGIR'09
    constant).  documents.doc_id and embeddings.vec_id share one id space
    in the test corpus, so the two rankings fuse directly.  Only RANKS
    cross systems (both rank columns are already oracle-proven
    deterministic), and the 2-term contribution fold is tag-sorted and
    1e-9-quantized, so the fused score hash-matches without calibration."""
    from cerebro_spark.operators.similarity import (
        cosine_topk_bruteforce,
        rrf_fuse,
    )
    from cerebro_spark.operators.text import bm25_topk
    from cerebro_spark.operators.util import top_k_ranked

    docs = load_table(spark, "documents", sf_dir)
    emb = load_table(spark, "embeddings", sf_dir)
    lex = bm25_topk(docs, _BM25_TERMS, k=50).select("doc_id", "rank")
    sem = cosine_topk_bruteforce(
        emb, emb.filter(F.col("vec_id") == 0), k=50
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    fused = rrf_fuse({"lex": lex, "sem": sem}, k=60)
    return top_k_ranked(
        fused, [("rrf", "desc"), ("doc_id", "asc")], k=20
    ).select("doc_id", "n_systems", "rrf", F.col("rank").alias("pos"))


def _hybrid_rrf_sql() -> str:
    return f"""
WITH {_bm25_ctes()},
lex AS (
  SELECT doc_id,
    CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS r
  FROM scored
  QUALIFY r <= 50
),
qv AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id = 0),
sem AS (
  SELECT doc_id, r FROM (
    SELECT c.vec_id AS doc_id,
      CAST(row_number() OVER (
        ORDER BY list_cosine_similarity(qv.v, CAST(c.embedding AS DOUBLE[])) DESC,
                 c.vec_id ASC
      ) AS INT) AS r
    FROM embeddings c, qv
    WHERE c.vec_id <> 0
  )
  WHERE r <= 50
),
contrib AS (
  SELECT doc_id, 'lex' AS tag, 1.0 / (60 + r) AS c FROM lex
  UNION ALL
  SELECT doc_id, 'sem' AS tag, 1.0 / (60 + r) AS c FROM sem
),
fused AS (
  SELECT doc_id, count(*) AS n_systems,
    floor(list_reduce(list_prepend(0.0, list(c ORDER BY tag)),
                      (a, b) -> a + b) / 1e-9 + 0.5) * 1e-9 AS rrf
  FROM contrib GROUP BY 1
)
SELECT doc_id, n_systems, rrf,
  CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INT) AS pos
FROM fused
QUALIFY pos <= 20
"""


QUERIES["hybrid_rrf_topk"] = q_hybrid_rrf_topk
ORACLES["hybrid_rrf_topk"] = _hybrid_rrf_sql()


def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (text.textrank_keywords): PageRank over
    the adjacent-token co-occurrence graph (min co-occurrence 3), top 20
    words.  A composition gate — bigram pair build ⇄ bigram_pmi, ranking ⇄
    cluster.pagerank with its per-iteration 1e-9 quantization — so the
    oracle is the word-graph CTE feeding the same 3 unrolled PageRank
    iterations as the pagerank_trade oracle."""
    from cerebro_spark.operators.text import textrank_keywords
    from cerebro_spark.operators.util import top_k_ranked

    scores = textrank_keywords(
        load_table(spark, "documents", sf_dir), min_cooccur=3, iterations=3
    )
    return top_k_ranked(
        scores, [("score", "desc"), ("word", "asc")], k=20
    ).select("word", "score", F.col("rank").alias("pos"))


def _textrank_sql(iterations: int = 3, min_cooccur: int = 3) -> str:
    head = f"""
WITH base AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
bc AS (
  SELECT least(w1, w2) AS u, greatest(w1, w2) AS v
  FROM (SELECT unnest(t[:-2]) AS w1, unnest(t[2:]) AS w2 FROM base)
  WHERE w1 <> w2
  GROUP BY 1, 2
  HAVING count(*) >= {min_cooccur}
),
e AS (SELECT u, v FROM bc UNION ALL SELECT v AS u, u AS v FROM bc),
nodes AS (SELECT DISTINCT u AS node FROM e),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT u, count(*) AS outdeg FROM e GROUP BY u),
it0 AS (SELECT node, 1.0 / n AS rank FROM nodes, nn)"""
    parts = [head]
    for i in range(1, iterations + 1):
        parts.append(f""",
it{i} AS (
  SELECT nodes.node,
    floor(((1.0 - 0.85) / n + 0.85 * coalesce(c.s, 0.0)) / 1e-9 + 0.5) * 1e-9 AS rank
  FROM nodes
  LEFT JOIN (
    SELECT e.v AS node, sum(r.rank / deg.outdeg) AS s
    FROM e JOIN it{i - 1} r ON e.u = r.node JOIN deg ON e.u = deg.u
    GROUP BY e.v
  ) c USING (node), nn
)""")
    parts.append(f"""
SELECT node AS word, rank AS score,
  CAST(row_number() OVER (ORDER BY rank DESC, node ASC) AS INT) AS pos
FROM it{iterations}
QUALIFY pos <= 20
""")
    return "".join(parts)


QUERIES["textrank_keywords"] = q_textrank_keywords
ORACLES["textrank_keywords"] = _textrank_sql()

QUERIES["bigram_pmi"] = q_bigram_pmi
ORACLES["bigram_pmi"] = _BIGRAM_PMI_SQL
QUERIES["weighted_sample"] = q_weighted_sample
ORACLES["weighted_sample"] = _weighted_sample_sql()


def q_entropy_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the token distribution per document source — the
    corpus-diversity diagnostic (low entropy = templated/repetitive source).
    One explode+groupBy to (source, token) counts, per-source totals
    broadcast back, then -Σ p·ln p.  State is source × vocab, not tokens."""
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"),
    )
    cnt = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("source").agg(
        F.sum("c").alias("n_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    p = F.col("c").cast("double") / F.col("n_tokens")
    return (
        cnt.join(F.broadcast(tot), "source")
        .groupBy("source", "n_tokens", "vocab")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )


_ENTROPY_SQL = """
WITH cnt AS (
  SELECT source, w, count(*) AS c
  FROM (
    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
    FROM documents
  ) GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
         count(*) AS vocab
  FROM cnt GROUP BY 1
)
SELECT cnt.source, n_tokens, vocab,
  round(-sum((CAST(c AS DOUBLE) / n_tokens) * ln(CAST(c AS DOUBLE) / n_tokens)), 6) AS entropy
FROM cnt JOIN tot USING (source)
GROUP BY 1, 2, 3
"""


def q_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label mean embeddings — the label-space
    confusion map (near-1 pairs are candidates for merging).  Works in the
    per-dimension long form throughout: centroid frames join on the dim key
    (labels² × dims rows, constant in corpus size), no array reassembly."""
    from pyspark.sql import functions as F

    emb = load_table(spark, "embeddings", sf_dir)
    ex = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "x"
        ),
    )
    cen = ex.groupBy("label", "dim").agg(F.avg("x").alias("m"))
    a = cen.select(
        F.col("label").alias("label_a"), "dim", F.col("m").alias("ma")
    )
    b = cen.select(
        F.col("label").alias("label_b"), "dim", F.col("m").alias("mb")
    )
    j = a.join(b, "dim").filter(F.col("label_a") < F.col("label_b"))
    return (
        j.groupBy("label_a", "label_b")
        .agg(
            F.sum(F.col("ma") * F.col("mb")).alias("__dot"),
            F.sum(F.col("ma") * F.col("ma")).alias("__na"),
            F.sum(F.col("mb") * F.col("mb")).alias("__nb"),
        )
        .select(
            "label_a",
            "label_b",
            F.round(
                F.col("__dot") / F.sqrt(F.col("__na") * F.col("__nb")), 6
            ).alias("cosine"),
        )
    )


_CENTROID_SIM_SQL = """
WITH ex AS (
  SELECT label, CAST(i - 1 AS INT) AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, generate_series(1, 64) AS g(i)
),
cen AS (SELECT label, dim, avg(x) AS m FROM ex GROUP BY 1, 2)
SELECT a.label AS label_a, b.label AS label_b,
  round(sum(a.m * b.m) / sqrt(sum(a.m * a.m) * sum(b.m * b.m)), 6) AS cosine
FROM cen a JOIN cen b ON a.dim = b.dim AND a.label < b.label
GROUP BY 1, 2
"""


QUERIES["entropy_per_source"] = q_entropy_per_source
ORACLES["entropy_per_source"] = _ENTROPY_SQL
QUERIES["centroid_similarity"] = q_centroid_similarity
ORACLES["centroid_similarity"] = _CENTROID_SIM_SQL


def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization hard gate, recall-encoded like `ann_cosine_ivf`
    (k-means codebooks are iterative, not SQL-expressible): top-5 over the
    32×-compressed corpus must keep corpus-level recall ≥ 0.15 vs exact
    brute force (measured: 0.54 at sf0.01, 0.32 at sf0.1 — the synthetic
    embeddings are near-uniform, PQ's hardest case; random guessing is
    ~0.001-0.01).  Per-query bounds are deliberately NOT encoded (one
    zero-hit query observed at sf0.1).  The oracle predicts the query-id
    set, the all-true recall flag, and the 32× compression ratio; degraded
    codebooks/encoding flip the flag and fail the hash.  tests/test_pq.py
    asserts the numeric recall, packing round-trip, and reconstruction MSE.
    """
    from pyspark.sql import functions as F

    from cerebro_spark.operators.similarity import (
        cosine_topk_bruteforce,
        cosine_topk_pq,
        pq_encode,
        train_pq_codebooks,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.orderBy("vec_id").limit(20)
    k, n_q, m, kk = 5, 20, 8, 128
    books = train_pq_codebooks(emb, dim=64, m=m, k=kk)
    codes = pq_encode(emb, books)
    pq = cosine_topk_pq(codes, queries, books, k=k)
    brute = cosine_topk_bruteforce(emb, queries, k=k)
    hits = (
        pq.select("query_id", "neighbor_id")
        .join(
            brute.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    per_q = (
        queries.select(F.col("vec_id").alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("__hits"), F.lit(0)).alias("__hits"),
        )
    )
    total = per_q.agg(F.sum("__hits").alias("__total"))
    # storage form is the packed BIGINT (8 bytes holds up to 63 code bits)
    # vs 64 float32 dims raw — the ratio the gate pins
    raw_bytes = 64 * 4
    compression = raw_bytes // 8
    return per_q.crossJoin(F.broadcast(total)).select(
        "query_id",
        (F.col("__total") >= F.lit(int(0.15 * k * n_q))).alias(
            "corpus_recall_ok"
        ),
        F.lit(compression).cast("int").alias("compression_x"),
    )


_PQ_RECALL_SQL = """
SELECT vec_id AS query_id, TRUE AS corpus_recall_ok,
       CAST(32 AS INT) AS compression_x
FROM embeddings ORDER BY vec_id LIMIT 20
"""

QUERIES["pq_recall"] = q_pq_recall
ORACLES["pq_recall"] = _PQ_RECALL_SQL


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: nearest different-label neighbor
    per query vector (the boundary pairs a triplet loss learns from)."""
    from pyspark.sql import functions as F

    from cerebro_spark.operators.similarity import hard_negatives

    emb = load_table(spark, "embeddings", sf_dir)
    return hard_negatives(emb, emb.filter(F.col("vec_id") < 20), k=3)


_HARD_NEGATIVES_SQL = """
SELECT query_id, query_label, negative_id, negative_label, cosine, rank
FROM (
  SELECT q.vec_id AS query_id, q.label AS query_label,
    c.vec_id AS negative_id, c.label AS negative_label,
    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                           CAST(c.embedding AS DOUBLE[])) AS cosine,
    row_number() OVER (
      PARTITION BY q.vec_id
      ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) DESC,
               c.vec_id ASC
    ) AS rank
  FROM embeddings q JOIN embeddings c ON c.label <> q.label
  WHERE q.vec_id < 20
) WHERE rank <= 3
"""

QUERIES["hard_negatives"] = q_hard_negatives
ORACLES["hard_negatives"] = _HARD_NEGATIVES_SQL


def q_approx_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter terms via Spark 4's ``approx_top_k`` frequent-items
    sketch (the streaming-friendly, mergeable alternative to a full
    groupBy count: sketch size bounds memory at any cardinality).  Gate
    discipline: the sketch is EXACT while distinct items fit its capacity
    (vocab ≈ 1k « 10k default), and the top-100 slice is re-ranked
    deterministically (count desc, term asc) before the top-20 cut, so the
    driver hash compares against the exact SQL answer bit-for-bit —
    capacity overflow or a broken sketch changes counts and fails the
    hash."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    )
    sk = toks.agg(F.expr("approx_top_k(term, 100)").alias("tk"))
    items = sk.select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("term"), F.col("e.count").alias("n")
    )
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    # ≤100 rows reach this window — bounded input, not a scale risk
    return (
        items.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
    )


_APPROX_TOP_TERMS_SQL = """
SELECT term, n, rank FROM (
  SELECT term, count(*) AS n,
    CAST(row_number() OVER (ORDER BY count(*) DESC, term ASC) AS INT) AS rank
  FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
    FROM documents
  )
  GROUP BY term
) WHERE rank <= 20
"""

QUERIES["approx_top_terms"] = q_approx_top_terms
ORACLES["approx_top_terms"] = _APPROX_TOP_TERMS_SQL

QUERIES["bpe_merge_candidates"] = q_bpe_merge_candidates
ORACLES["bpe_merge_candidates"] = _BPE_SQL


def q_dsir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection: top-50 documents by unigram importance
    weight toward the English slice (target = lang 'en', source = whole
    corpus).  Per-word log-ratios quantize to integer micro-nats BEFORE the
    per-doc sum, so document weights are exact integer sums (no float
    summation-order hazard; operator docstring)."""
    from pyspark.sql import functions as F

    from cerebro_spark.operators.text import dsir_weights

    docs = load_table(spark, "documents", sf_dir)
    return dsir_weights(docs, F.col("lang") == "en", k=50)


_DSIR_SQL = """
WITH toks AS (
  SELECT doc_id, (lang = 'en') AS tgt,
         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
  FROM documents
),
tf AS (SELECT doc_id, tgt, w, count(*) AS tf FROM toks GROUP BY 1, 2, 3),
counts AS (
  SELECT w, CAST(sum(tf) AS BIGINT) AS c_all,
         CAST(sum(CASE WHEN tgt THEN tf ELSE 0 END) AS BIGINT) AS c_tgt
  FROM tf GROUP BY 1
),
tot AS (
  SELECT CAST(sum(c_all) AS DOUBLE) AS n_all,
         CAST(sum(c_tgt) AS DOUBLE) AS n_tgt,
         CAST(count(*) AS DOUBLE) AS vocab
  FROM counts
),
ratios AS (
  SELECT w,
    CAST(floor((ln((c_tgt + 1.0) / (n_tgt + vocab))
              - ln((c_all + 1.0) / (n_all + vocab))) * 1e6 + 0.5) AS BIGINT) AS q
  FROM counts, tot
),
weights AS (
  SELECT doc_id, CAST(sum(tf * q) AS BIGINT) AS weight
  FROM tf JOIN ratios USING (w) GROUP BY 1
)
SELECT doc_id, weight,
  CAST(row_number() OVER (ORDER BY weight DESC, doc_id ASC) AS INT) AS rank
FROM weights
QUALIFY rank <= 50
"""

QUERIES["dsir_topk"] = q_dsir_topk
ORACLES["dsir_topk"] = _DSIR_SQL


def q_inverted_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index posting-list build for the 20 highest-df terms:
    (term, df, pos, doc_id) rows — the head of each term's doc-id-sorted
    posting list (first 10 entries), the physical structure behind the
    BM25 / retrieval queries.  Plan: one (term, doc) distinct, one
    combinable df groupBy, a broadcast semi-join of the tiny top-term set
    back onto the postings, and a per-term row_number over ≤df rows —
    postings stay exploded rows end-to-end (never a collect_list array:
    hub terms would build driver-scale lists AND the gate canonicalizer
    rejects array cells).  All values are strings/exact ints."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    postings = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("term")
    ).distinct()
    df_counts = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # TakeOrdered top-k over the vocab-sized df frame, NOT a keyless
    # row_number window (the round-1 scale red flag)
    from cerebro_spark.operators.util import top_k_ranked

    top = top_k_ranked(
        df_counts, [("df", "desc"), ("term", "asc")], k=20
    ).select("term", "df")
    wpos = Window.partitionBy("term").orderBy("doc_id")
    return (
        postings.join(F.broadcast(top), "term")
        .withColumn("pos", F.row_number().over(wpos))
        .filter(F.col("pos") <= 10)
        .select("term", "df", "pos", "doc_id")
    )


_INVERTED_POSTINGS_SQL = """
WITH postings AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
    FROM documents
  )
),
dfc AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
top AS (
  SELECT term, df FROM (
    SELECT term, df,
      row_number() OVER (ORDER BY df DESC, term ASC) AS trank
    FROM dfc
  ) WHERE trank <= 20
)
SELECT term, df, pos, doc_id FROM (
  SELECT p.term, t.df,
    CAST(row_number() OVER (PARTITION BY p.term ORDER BY p.doc_id) AS INT) AS pos,
    p.doc_id
  FROM postings p JOIN top t USING (term)
) WHERE pos <= 10
"""

QUERIES["inverted_postings"] = q_inverted_postings
ORACLES["inverted_postings"] = _INVERTED_POSTINGS_SQL


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase search: find the corpus's most frequent bigram
    in-plan (1-row TakeOrdered broadcast — the 'query'), then match it
    POSITIONALLY (token at pos, token at pos+1) over the positional
    posting table and return the top-20 docs by occurrence count.  The
    positional index is (doc, pos, term) rows — the structure a phrase
    query needs beyond inverted_postings' doc-level lists; matching is
    one self-equi-join on (doc, pos+1), no Python, exact integer counts."""
    from pyspark.sql import Window
    from cerebro_spark.operators.util import top_k_ranked

    docs = load_table(spark, "documents", sf_dir)
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "w"),
    )
    # read by the bigram ranking AND both match sides; MEMORY_AND_DISK,
    # LRU-evictable, left persisted (same policy note as
    # dedup.prefix_jaccard_pairs' token cache)
    toks = toks.cache()
    bi = (
        toks.alias("a")
        .join(
            toks.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.w").alias("w1"), F.col("b.w").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = top_k_ranked(bi, [("n", "desc"), ("w1", "asc"), ("w2", "asc")], k=1).select(
        "w1", "w2"
    )
    hits = (
        toks.alias("a")
        .join(F.broadcast(top), F.col("a.w") == F.col("w1"))
        .join(
            toks.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .filter(F.col("b.w") == F.col("w2"))
        .groupBy(F.col("a.doc_id").alias("doc_id"), "w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    return top_k_ranked(hits, [("n_occ", "desc"), ("doc_id", "asc")], k=20).select(
        "doc_id", "w1", "w2", "n_occ", F.col("rank").alias("pos")
    )


_PHRASE_MATCH_SQL = """
WITH split AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS w
  FROM split, generate_series(1, 1024) AS g(i)
  WHERE i <= len(t)
),
bi AS (
  SELECT a.w AS w1, b.w AS w2, count(*) AS n
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  GROUP BY 1, 2
),
top AS (
  SELECT w1, w2 FROM bi
  ORDER BY n DESC, w1 ASC, w2 ASC LIMIT 1
),
hits AS (
  SELECT a.doc_id, top.w1, top.w2, count(*) AS n_occ
  FROM toks a
  JOIN top ON a.w = top.w1
  JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1 AND b.w = top.w2
  GROUP BY 1, 2, 3
)
SELECT doc_id, w1, w2, n_occ, pos FROM (
  SELECT doc_id, w1, w2, n_occ,
    CAST(row_number() OVER (ORDER BY n_occ DESC, doc_id ASC) AS INT) AS pos
  FROM hits
) WHERE pos <= 20
"""

QUERIES["phrase_match"] = q_phrase_match
ORACLES["phrase_match"] = _PHRASE_MATCH_SQL


def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning pass (``text.normalize_text``) over a deterministically
    dirtied twin of ``documents``: ``doc_id % 5`` picks the injected dirt
    (space inflation / tab+CRLF tail / zero-width + BEL / NBSP words /
    untouched) so the DuckDB oracle reproduces the dirty input exactly, then
    both engines run the SAME 4-rule regexp chain.  Gates the cleaned text,
    removed-char count and dirty flag per document."""
    from cerebro_spark.operators.text import clean_text

    docs = load_table(spark, "documents", sf_dir)
    variant = F.pmod(F.col("doc_id"), F.lit(5))
    dirty = (
        F.when(variant == 0,
               F.concat(F.lit("  "),
                        F.regexp_replace(F.col("text"), " ", "   "),
                        F.lit(" ")))
        .when(variant == 1,
              F.concat(F.col("text"), F.lit("\t\r\n"), F.lit("tail")))
        .when(variant == 2,
              F.concat(F.lit(chr(0x200B)), F.col("text"), F.lit(chr(7))))
        .when(variant == 3,
              F.regexp_replace(F.col("text"), " ", chr(0x00A0)))
        .otherwise(F.col("text"))
    )
    dirtied = docs.select("doc_id", "source", dirty.alias("text"))
    out = clean_text(dirtied)
    return out.select("doc_id", "source", "clean_text", "chars_removed",
                      "was_dirty")


_CLEAN_TEXT_SQL = r"""
WITH dirty AS (
  SELECT doc_id, source,
    CASE doc_id % 5
      WHEN 0 THEN '  ' || replace(text, ' ', '   ') || ' '
      WHEN 1 THEN text || chr(9) || chr(13) || chr(10) || 'tail'
      WHEN 2 THEN chr(8203) || text || chr(7)
      WHEN 3 THEN replace(text, ' ', chr(160))
      ELSE text
    END AS text
  FROM documents
),
cleaned AS (
  SELECT doc_id, source, text,
    trim(regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
          '[\x{200B}-\x{200D}\x{FEFF}]', '', 'g'),
        '[\x{00A0}\x{2000}-\x{200A}\x{202F}\x{205F}\x{3000}]', ' ', 'g'),
      '[ \t\n\r]+', ' ', 'g')) AS clean_text
  FROM dirty
)
SELECT doc_id, source, clean_text,
  CAST(length(text) - length(clean_text) AS BIGINT) AS chars_removed,
  clean_text <> text AS was_dirty
FROM cleaned
"""

QUERIES["clean_text_roundtrip"] = q_clean_text
ORACLES["clean_text_roundtrip"] = _CLEAN_TEXT_SQL


def q_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (sampling.cap_per_key): at most 40 docs per
    source survive, picked by deterministic md5 rank — the anti-dominance
    guard of crawl-corpus mixing.  One shuffle on the key; every partition
    emits ≤ k rows."""
    from cerebro_spark.operators.sampling import cap_per_key

    docs = load_table(spark, "documents", sf_dir)
    return cap_per_key(docs, "source", k=40).select(
        "doc_id", "source", "key_rank"
    )


_DOMAIN_CAP_SQL = """
SELECT doc_id, source, key_rank FROM (
  SELECT doc_id, source,
    CAST(row_number() OVER (
      PARTITION BY source
      ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
    ) AS INT) AS key_rank
  FROM documents
) WHERE key_rank <= 40
"""

QUERIES["domain_cap_sample"] = q_domain_cap_sample
ORACLES["domain_cap_sample"] = _DOMAIN_CAP_SQL


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between corpus halves
    (similarity.embedding_half_drift): exact shared-BIGINT-numerator L1
    drift + the most-drifted dimension — unrounded, unlike the 6-dp
    label_centroids gate."""
    from cerebro_spark.operators.similarity import embedding_half_drift

    return embedding_half_drift(load_table(spark, "embeddings", sf_dir))


_EMBEDDING_DRIFT_SQL = """
WITH ex AS (
  SELECT label, vec_id % 2 AS half, i - 1 AS dim,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS q
  FROM embeddings, generate_series(1, 64) AS g(i)
),
per_dim AS (
  SELECT label, dim,
    CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ce,
    CAST(sum(CASE WHEN half = 0 THEN q ELSE 0 END) AS BIGINT) AS se,
    CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS co,
    CAST(sum(CASE WHEN half = 1 THEN q ELSE 0 END) AS BIGINT) AS so
  FROM ex GROUP BY 1, 2
),
ranked AS (
  SELECT *, abs(se * co - so * ce) AS num,
    row_number() OVER (
      PARTITION BY label ORDER BY abs(se * co - so * ce) DESC, dim ASC
    ) AS rn
  FROM per_dim
),
agg AS (
  SELECT label,
    max(ce) AS n_even, max(co) AS n_odd,
    CAST(sum(num) AS BIGINT) AS l1num,
    max(CASE WHEN rn = 1 THEN dim END) AS max_dim,
    max(CASE WHEN rn = 1 THEN num END) AS maxnum
  FROM ranked GROUP BY 1
)
SELECT label, n_even, n_odd,
  CASE WHEN n_even > 0 AND n_odd > 0
       THEN CAST(l1num AS DOUBLE)
            / (1000000.0 * CAST(n_even AS DOUBLE) * CAST(n_odd AS DOUBLE))
  END AS l1_drift,
  CAST(max_dim AS INTEGER) AS max_dim,
  CASE WHEN n_even > 0 AND n_odd > 0
       THEN CAST(maxnum AS DOUBLE)
            / (1000000.0 * CAST(n_even AS DOUBLE) * CAST(n_odd AS DOUBLE))
  END AS max_dim_drift
FROM agg
"""

QUERIES["embedding_drift"] = q_embedding_drift
ORACLES["embedding_drift"] = _EMBEDDING_DRIFT_SQL


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-saturation profile (text.vocab_coverage): Good–Turing
    unseen mass n1/N and Chao1 richness from exact integer frequency-of-
    frequency counts — does more crawl still buy new vocabulary?"""
    from cerebro_spark.operators.text import vocab_coverage

    return vocab_coverage(load_table(spark, "documents", sf_dir))


_VOCAB_COVERAGE_SQL = r"""
WITH toks AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
  FROM documents
),
counts AS (
  SELECT w, count(*) AS c FROM toks WHERE w <> '' GROUP BY 1
),
agg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
    count(*) AS vocab,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM counts
)
SELECT n_tokens, vocab, n1, n2,
  CAST(n1 AS DOUBLE) / n_tokens AS p_unseen,
  CASE WHEN n2 > 0
       THEN vocab + CAST(n1 * n1 AS DOUBLE) / (2.0 * n2) END AS chao1
FROM agg
"""

QUERIES["vocab_coverage"] = q_vocab_coverage
ORACLES["vocab_coverage"] = _VOCAB_COVERAGE_SQL


def q_target_encode_oof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe K-fold target encoding (sampling.kfold_target_encode):
    event_type encoded by the out-of-fold smoothed mean of value, folds
    assigned by the portable md5 bucket of event_id — the grid a feature
    pipeline broadcast-joins back onto the fact.  One exact rational per
    cell (operator docstring); the oracle rebuilds it with HUGEINT
    arithmetic."""
    from cerebro_spark.operators.sampling import kfold_target_encode

    ev = load_table(spark, "events", sf_dir)
    return kfold_target_encode(ev, "event_type", "value", "event_id", 5, 20)


def _target_encode_sql() -> str:
    from cerebro_spark.queries.extensions import _hex2long_sql

    fold = f"({_hex2long_sql('md5(CAST(event_id AS STRING))', 8)}) % 5"
    return f"""
WITH base AS (
  SELECT event_type AS category, {fold} AS fold,
         CAST(floor(value * 1e6 + 0.5) AS BIGINT) AS q
  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
),
cell AS (
  SELECT category, fold, COUNT(*) AS nf, SUM(q) AS sf
  FROM base GROUP BY 1, 2
),
cat AS (
  SELECT category, SUM(nf) AS nc, SUM(sf) AS sc FROM cell GROUP BY 1
),
gtot AS (SELECT SUM(nf) AS ng, SUM(sf) AS sg FROM cell)
SELECT cell.category, cell.fold, nf AS n_fold,
  round(
    CAST(CAST(sc - sf AS HUGEINT) * ng + CAST(20 AS HUGEINT) * sg AS DOUBLE)
    / CAST(CAST(nc - nf + 20 AS HUGEINT) * ng AS DOUBLE) / 1e6, 6) AS enc
FROM cell JOIN cat USING (category) CROSS JOIN gtot
"""


QUERIES["target_encode_oof"] = q_target_encode_oof
ORACLES["target_encode_oof"] = _target_encode_sql()


def q_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL sign-projection distortion audit (similarity.jl_project): per
    label, how well the deterministic 64→16 projection preserves squared
    norms — n, mean/min/max of ‖y‖²/‖x‖² (e6-quantized per row so the
    aggregate is order-free).  The per-row arithmetic is a fixed
    left-fold IEEE chain; the oracle unrolls the identical
    left-associated sums term-for-term."""
    from cerebro_spark.operators.similarity import jl_project

    em = load_table(spark, "embeddings", sf_dir)
    pr = jl_project(em, "embedding", 64, 16, 0, "proj")
    pn = F.aggregate(F.col("proj"), F.lit(0.0), lambda a, x: a + x * x)
    xn = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double"),
    )
    re6 = F.floor(pn / xn * F.lit(1.0e6) + F.lit(0.5)).cast("long")
    rows = pr.select("label", xn.alias("__xn"), re6.alias("__r")).filter(
        F.col("__xn") > 0
    )
    return rows.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            F.sum("__r").cast("double") / F.count(F.lit(1)) / F.lit(1.0e6), 6
        ).alias("mean_ratio"),
        F.round(F.min("__r").cast("double") / F.lit(1.0e6), 6).alias("min_ratio"),
        F.round(F.max("__r").cast("double") / F.lit(1.0e6), 6).alias("max_ratio"),
    )


def _jl_sql(in_dim: int = 64, out_dim: int = 16, seed: int = 0) -> str:
    from cerebro_spark.operators.similarity import jl_sign_matrix

    signs = jl_sign_matrix(in_dim, out_dim, seed)
    inv = repr(1.0 / (out_dim ** 0.5))
    zcols = ", ".join(
        "("
        + " + ".join(
            f"CAST(embedding[{i + 1}] AS DOUBLE) * {float(signs[i][j])!r}"
            for i in range(in_dim)
        )
        + f") AS z{j}"
        for j in range(out_dim)
    )
    xn = " + ".join(
        f"CAST(embedding[{i + 1}] AS DOUBLE) * CAST(embedding[{i + 1}] AS DOUBLE)"
        for i in range(in_dim)
    )
    pn = " + ".join(f"(z{j} * {inv}) * (z{j} * {inv})" for j in range(out_dim))
    return f"""
WITH z AS (
  SELECT label, {zcols}, ({xn}) AS xn FROM embeddings
),
r AS (
  SELECT label, xn,
    CAST(floor(({pn}) / xn * 1e6 + 0.5) AS BIGINT) AS re6
  FROM z WHERE xn > 0
)
SELECT label, COUNT(*) AS n,
  round(CAST(SUM(re6) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_ratio,
  round(CAST(MIN(re6) AS DOUBLE) / 1e6, 6) AS min_ratio,
  round(CAST(MAX(re6) AS DOUBLE) / 1e6, 6) AS max_ratio
FROM r GROUP BY 1
"""


QUERIES["jl_distortion"] = q_jl_distortion
ORACLES["jl_distortion"] = _jl_sql()


def q_js_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon source drift (profile.js_divergence): each source's
    doc-length (n_chars/100 buckets) distribution vs the corpus — the
    symmetric bounded drift rank next to psi_drift/ks_drift.  Exact
    integer counts, e9-quantized per-bucket terms (operator
    docstring)."""
    from cerebro_spark.operators.profile import js_divergence

    docs = load_table(spark, "documents", sf_dir).withColumn(
        "len_bucket", F.floor(F.col("n_chars") / 100).cast("long")
    )
    return js_divergence(docs, "source", "len_bucket")


_JS_DRIFT_SQL = """
WITH cells AS (
  SELECT source AS g, CAST(floor(n_chars / 100) AS BIGINT) AS b, COUNT(*) AS c
  FROM documents WHERE source IS NOT NULL AND n_chars IS NOT NULL
  GROUP BY 1, 2
),
srcn AS (SELECT g, SUM(c) AS ns FROM cells GROUP BY 1),
gb AS (SELECT b, SUM(c) AS cb FROM cells GROUP BY 1),
gt AS (SELECT SUM(c) AS ng FROM cells),
x AS (
  SELECT srcn.g, srcn.ns, gb.b, gb.cb, gt.ng, COALESCE(cells.c, 0) AS csb
  FROM srcn CROSS JOIN gb CROSS JOIN gt
  LEFT JOIN cells ON cells.g = srcn.g AND cells.b = gb.b
),
t AS (
  SELECT g, ns,
    CAST(floor((
      CASE WHEN csb > 0
        THEN (CAST(csb AS DOUBLE) / CAST(ns AS DOUBLE))
             * ln(2.0 * (CAST(csb AS DOUBLE) / CAST(ns AS DOUBLE))
                  / ((CAST(csb AS DOUBLE) / CAST(ns AS DOUBLE))
                     + (CAST(cb AS DOUBLE) / CAST(ng AS DOUBLE))))
        ELSE 0.0 END
      + (CAST(cb AS DOUBLE) / CAST(ng AS DOUBLE))
        * ln(2.0 * (CAST(cb AS DOUBLE) / CAST(ng AS DOUBLE))
             / ((CAST(csb AS DOUBLE) / CAST(ns AS DOUBLE))
                + (CAST(cb AS DOUBLE) / CAST(ng AS DOUBLE))))
    ) * 1e9 + 0.5) AS BIGINT) AS te9
  FROM x
)
SELECT g AS "group", CAST(ns AS BIGINT) AS n,
  round(CAST(SUM(te9) AS DOUBLE) / 2.0 / 1e9, 6) AS js
FROM t GROUP BY 1, 2 ORDER BY js DESC, "group" ASC
"""

QUERIES["js_drift"] = q_js_drift
ORACLES["js_drift"] = _JS_DRIFT_SQL


def q_log_templates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact log-template mining (text.log_templates): messages grouped
    by (token count, first token), positions masked <*> unless every
    message agrees — deterministic Drain, top-20 shapes (operator
    docstring)."""
    from cerebro_spark.operators.text import log_templates

    docs = load_table(spark, "documents", sf_dir)
    return log_templates(docs, "text", "doc_id", top_k=20)


_LOG_TEMPLATES_SQL = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS t,
         len(string_split(text, ' ')) AS n
  FROM documents WHERE text IS NOT NULL
),
ok AS (
  SELECT doc_id, t, n, t[1] AS first FROM base WHERE n >= 1 AND n <= 200
),
pos AS (
  SELECT n, first, doc_id, s.u - 1 AS p, t[s.u] AS tok
  FROM ok, UNNEST(generate_series(1, n)) AS s(u)
),
cell AS (
  SELECT n, first, p, COUNT(DISTINCT tok) AS d, MIN(tok) AS m
  FROM pos GROUP BY 1, 2, 3
),
tpl AS (
  SELECT n, first,
    string_agg(CASE WHEN d = 1 THEN m ELSE '<*>' END, ' ' ORDER BY p)
      AS template
  FROM cell GROUP BY 1, 2
),
cnt AS (SELECT n, first, COUNT(*) AS n_messages FROM ok GROUP BY 1, 2)
SELECT template, n_messages
FROM tpl JOIN cnt USING (n, first)
ORDER BY n_messages DESC, template ASC LIMIT 20
"""

QUERIES["log_templates"] = q_log_templates
ORACLES["log_templates"] = _LOG_TEMPLATES_SQL


def q_weighted_pick_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-k weighted sampling without replacement
    (sampling.weighted_sample_exact_k, Efraimidis–Spirakis): 50 docs
    drawn proportional to n_chars via deterministic md5 uniforms — the
    fixed-size counterpart of weighted_sample (operator docstring)."""
    from cerebro_spark.operators.sampling import weighted_sample_exact_k

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    return weighted_sample_exact_k(docs, "n_chars", "doc_id", 50)


def _weighted_pick_sql() -> str:
    from cerebro_spark.queries.extensions import _hex2long_sql

    u = f"(({_hex2long_sql('md5(CAST(doc_id AS STRING))', 13)}) + 1.0) / {float(2 ** 52)!r}"
    return f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE n_chars IS NOT NULL AND n_chars > 0
ORDER BY ln({u}) / CAST(n_chars AS DOUBLE) DESC, doc_id ASC
LIMIT 50
"""


QUERIES["weighted_pick_k"] = q_weighted_pick_k
ORACLES["weighted_pick_k"] = _weighted_pick_sql()


def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rank-frequency power-law fit (text.zipf_slope): ln-ln OLS
    over the top-200 terms — one combinable term count over the fact,
    then vocab-frame-only work (bounded top-k + ≤200-row window)."""
    from cerebro_spark.operators.text import zipf_slope

    return zipf_slope(load_table(spark, "documents", sf_dir), top_n=200)


_ZIPF_SLOPE_SQL = """
WITH terms AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
counts AS (
  SELECT term, count(*) AS c FROM terms WHERE term <> '' GROUP BY 1
),
top AS (
  SELECT term, c,
         row_number() OVER (ORDER BY c DESC, term ASC) AS rank
  FROM counts ORDER BY c DESC, term ASC LIMIT 200
),
q AS (
  SELECT term, c, rank,
    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS qx,
    CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS qy
  FROM top
),
m AS (
  SELECT count(*) AS n,
    sum(CAST(qx AS HUGEINT)) AS sx, sum(CAST(qy AS HUGEINT)) AS sy,
    sum(CAST(qx AS HUGEINT) * qy) AS sxy,
    sum(CAST(qx AS HUGEINT) * qx) AS sxx,
    sum(CAST(qy AS HUGEINT) * qy) AS syy,
    arg_min(term, rank) AS top_term,
    CAST(max(c) AS BIGINT) AS top_count
  FROM q
)
SELECT CAST(n AS BIGINT) AS n_terms,
  round(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE),
        6) AS zipf_slope,
  round(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
        / (CAST(n * sxx - sx * sx AS DOUBLE)
           * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2,
  top_term, top_count
FROM m
"""

QUERIES["zipf_slope"] = q_zipf_slope
ORACLES["zipf_slope"] = _ZIPF_SLOPE_SQL


def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed dedup after canonicalization (text.canonicalize_url +
    registered_domain): synthetic crawl URLs derived deterministically
    from documents (the tables carry no URL column) exercise scheme/www/
    port/fragment/tracking-param/trailing-slash normalization; the dedup
    is one combinable groupBy on the canonical key."""
    from cerebro_spark.operators.text import canonicalize_url, registered_domain

    docs = load_table(spark, "documents", sf_dir)
    k = F.col("doc_id")
    url = F.concat(
        F.when(k % 3 == 0, F.lit("https://"))
        .when(k % 3 == 1, F.lit("http://www."))
        .otherwise(F.lit("HTTPS://WWW.")),
        F.col("source"),
        F.when(k % 4 == 0, F.lit(".example.co.uk")).otherwise(
            F.lit(".example.com")
        ),
        F.when(k % 5 == 0, F.lit(":8080")).otherwise(F.lit("")),
        F.lit("/Page/"),
        (k % 40).cast("string"),
        F.when(k % 2 == 0, F.lit("/?utm_source=feed&utm_campaign=x&id="))
        .otherwise(F.lit("?id=")),
        (k % 40).cast("string"),
        F.when(k % 7 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )
    return (
        docs.select(
            canonicalize_url(url).alias("canonical_url"), "doc_id"
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dups"),
            F.min("doc_id").alias("first_doc"),
        )
        .select(
            "canonical_url",
            registered_domain(F.col("canonical_url")).alias("domain"),
            "n_dups",
            "first_doc",
        )
    )


_URL_CANONICAL_SQL = """
WITH raw AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 3 = 0 THEN 'https://'
          WHEN doc_id % 3 = 1 THEN 'http://www.'
          ELSE 'HTTPS://WWW.' END)
    || source
    || (CASE WHEN doc_id % 4 = 0 THEN '.example.co.uk'
             ELSE '.example.com' END)
    || (CASE WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END)
    || '/Page/' || CAST(doc_id % 40 AS VARCHAR)
    || (CASE WHEN doc_id % 2 = 0
             THEN '/?utm_source=feed&utm_campaign=x&id='
             ELSE '?id=' END)
    || CAST(doc_id % 40 AS VARCHAR)
    || (CASE WHEN doc_id % 7 = 0 THEN '#frag' ELSE '' END) AS url
  FROM documents
),
s1 AS (
  SELECT doc_id, regexp_replace(regexp_replace(trim(url),
           '#.*$', '', 'g'),
           '^[a-zA-Z][a-zA-Z0-9+.-]*://', '', 'g') AS u
  FROM raw
),
s2 AS (
  SELECT doc_id,
    lower(regexp_extract(u, '^([^/?]+)', 1))
      || substr(u, length(regexp_extract(u, '^([^/?]+)', 1)) + 1) AS u
  FROM s1
),
s3 AS (
  SELECT doc_id,
    regexp_replace(regexp_replace(u,
      '^([^/?:]+)(:[0-9]+)+([/?].*)?$', '\\1\\3', 'g'),
      '^www\\.', '', 'g') AS u
  FROM s2
),
s4 AS (
  SELECT doc_id,
    regexp_replace(regexp_extract(u, '^([^?]*)', 1), '/+$', '', 'g') AS p,
    substr(u, length(regexp_extract(u, '^([^?]*)', 1)) + 1) AS q
  FROM s3
),
s5 AS (
  SELECT doc_id,
    p || regexp_replace(regexp_replace(regexp_replace(q,
      '[?&](utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|igshid|mc_eid|ref_src)=[^&]*',
      '', 'g'),
      '[?&]+$', '', 'g'),
      '^&', '?', 'g') AS canonical_url
  FROM s4
),
g AS (
  SELECT canonical_url,
    CAST(count(*) AS BIGINT) AS n_dups,
    min(doc_id) AS first_doc
  FROM s5 GROUP BY 1
)
SELECT canonical_url,
  (CASE WHEN regexp_extract(regexp_extract(canonical_url, '^([^/?:]+)', 1),
     '([a-z0-9-]+\\.(?:co|com|net|org|gov|ac|edu)\\.[a-z][a-z]|[a-z0-9-]+\\.[a-z0-9-]+)$',
     1) = ''
   THEN regexp_extract(canonical_url, '^([^/?:]+)', 1)
   ELSE regexp_extract(regexp_extract(canonical_url, '^([^/?:]+)', 1),
     '([a-z0-9-]+\\.(?:co|com|net|org|gov|ac|edu)\\.[a-z][a-z]|[a-z0-9-]+\\.[a-z0-9-]+)$',
     1) END) AS domain,
  n_dups, first_doc
FROM g
"""

QUERIES["url_canonical_dedup"] = q_url_canonical_dedup
ORACLES["url_canonical_dedup"] = _URL_CANONICAL_SQL


def q_source_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 (text.ndcg_at_k): per source, does ranking docs by length
    put the English docs first?  The retrieval-evaluation layer — exact
    integer DCG/IDCG from Python-literal position weights, one per-group
    top-k window."""
    from cerebro_spark.operators.text import ndcg_at_k

    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("lang").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            "source",
            "n_chars",
            "doc_id",
            (F.col("lang") == "en").alias("rel"),
        )
    )
    return ndcg_at_k(docs, "source", "n_chars", "rel", "doc_id", k=10)


def _source_ndcg_sql(k: int = 10) -> str:
    import math

    qw = [math.floor(1e6 / math.log2(i + 1) + 0.5) for i in range(1, k + 1)]
    cum, s = [], 0
    for w_ in qw:
        s += w_
        cum.append(s)
    qw_lit = "[" + ", ".join(str(x) for x in qw) + "]"
    cum_lit = "[" + ", ".join(str(x) for x in cum) + "]"
    return f"""
WITH base AS (
  SELECT source AS g, n_chars AS s, doc_id AS i,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS r
  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
),
ranked AS (
  SELECT g, r,
         row_number() OVER (PARTITION BY g ORDER BY s DESC, i ASC) AS rn
  FROM base
),
dcg AS (
  SELECT g, sum(CAST(r AS BIGINT) * ({qw_lit})[rn]) AS dcg2
  FROM ranked WHERE rn <= {k} GROUP BY 1
),
tot AS (
  SELECT g, count(*) AS n_docs, sum(r) AS n_rel FROM base GROUP BY 1
)
SELECT g AS source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_rel AS BIGINT) AS n_rel,
  CASE WHEN n_rel > 0 THEN
    round(CAST(COALESCE(dcg2, 0) AS DOUBLE)
          / CAST(({cum_lit})[CAST(least(n_rel, {k}) AS INT)] AS DOUBLE), 6)
  END AS ndcg_at_{k}
FROM tot LEFT JOIN dcg USING (g)
ORDER BY source ASC
"""


QUERIES["source_ndcg"] = q_source_ndcg
ORACLES["source_ndcg"] = _source_ndcg_sql()


def q_ranker_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paired ranker A/B (text.paired_ndcg_sign_test): on each source
    ('query'), does ranking docs by length (A) beat a hash-order ranking
    (B) at putting English docs in the top 10?  Win/tie verdicts are
    exact integer DCG comparisons (shared IDCG cancels); z is the sign
    test over the 20 sources."""
    from cerebro_spark.operators.text import paired_ndcg_sign_test

    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("lang").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            "source",
            F.col("n_chars").alias("score_a"),
            F.pmod(F.col("doc_id") * 37, F.lit(101)).alias("score_b"),
            "doc_id",
            (F.col("lang") == "en").alias("rel"),
        )
    )
    return paired_ndcg_sign_test(
        docs, "source", "score_a", "score_b", "rel", "doc_id", k=10
    )


def _ranker_sign_test_sql(k: int = 10) -> str:
    import math

    qw = [math.floor(1e6 / math.log2(i + 1) + 0.5) for i in range(1, k + 1)]
    qw_lit = "[" + ", ".join(str(x) for x in qw) + "]"
    return f"""
WITH base AS (
  SELECT source AS g, n_chars AS sa, (doc_id * 37) % 101 AS sb,
         doc_id AS i, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS r
  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
),
ranked AS (
  SELECT g, r,
    row_number() OVER (PARTITION BY g ORDER BY sa DESC, i ASC) AS ra,
    row_number() OVER (PARTITION BY g ORDER BY sb DESC, i ASC) AS rb
  FROM base
),
per_q AS (
  SELECT g,
    sum(CASE WHEN ra <= {k}
        THEN CAST(r AS BIGINT) * ({qw_lit})[ra] ELSE 0 END) AS da,
    sum(CASE WHEN rb <= {k}
        THEN CAST(r AS BIGINT) * ({qw_lit})[rb] ELSE 0 END) AS db,
    sum(r) AS nrel
  FROM ranked GROUP BY 1
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_queries,
    CAST(sum(CASE WHEN da > db THEN 1 ELSE 0 END) AS BIGINT) AS a_wins,
    CAST(sum(CASE WHEN da < db THEN 1 ELSE 0 END) AS BIGINT) AS b_wins,
    CAST(sum(CASE WHEN da = db THEN 1 ELSE 0 END) AS BIGINT) AS ties,
    CAST(sum(da) AS BIGINT) AS sum_dcg2_a,
    CAST(sum(db) AS BIGINT) AS sum_dcg2_b
  FROM per_q WHERE nrel > 0
)
SELECT n_queries, a_wins, b_wins, ties, sum_dcg2_a, sum_dcg2_b,
  CASE WHEN a_wins + b_wins > 0
       THEN CAST(a_wins - b_wins AS DOUBLE)
            / sqrt(CAST(a_wins + b_wins AS DOUBLE)) END AS z
FROM agg
"""


QUERIES["ranker_sign_test"] = q_ranker_sign_test
ORACLES["ranker_sign_test"] = _ranker_sign_test_sql()


def q_source_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MRR@10 (text.mrr_at_k): per source, the rank of the FIRST English
    doc when ranking by length — the known-item companion of
    source_ndcg; the rank is an exact integer from a total order, the
    reciprocal one IEEE division."""
    from cerebro_spark.operators.text import mrr_at_k

    docs = (
        load_table(spark, "documents", sf_dir)
        .filter(F.col("lang").isNotNull() & F.col("n_chars").isNotNull())
        .select(
            "source",
            "n_chars",
            "doc_id",
            (F.col("lang") == "en").alias("rel"),
        )
    )
    return mrr_at_k(docs, "source", "n_chars", "rel", "doc_id", k=10)


_SOURCE_MRR_SQL = """
WITH base AS (
  SELECT source AS g, n_chars AS s, doc_id AS i,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS r
  FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
),
ranked AS (
  SELECT g, r,
         row_number() OVER (PARTITION BY g ORDER BY s DESC, i ASC) AS rn
  FROM base
),
first AS (
  SELECT g, CAST(min(rn) AS BIGINT) AS fr
  FROM ranked WHERE r = 1 AND rn <= 10 GROUP BY 1
),
tot AS (
  SELECT g, count(*) AS n_docs, sum(r) AS n_rel FROM base GROUP BY 1
)
SELECT g AS source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_rel AS BIGINT) AS n_rel,
  CASE WHEN n_rel > 0 THEN fr END AS first_rel_rank,
  CASE WHEN n_rel > 0
       THEN COALESCE(CAST(1 AS DOUBLE) / CAST(fr AS DOUBLE), 0.0)
  END AS rr_at_10
FROM tot LEFT JOIN first USING (g)
ORDER BY source ASC
"""

QUERIES["source_mrr"] = q_source_mrr
ORACLES["source_mrr"] = _SOURCE_MRR_SQL


def q_cms_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters (profile.cms_heavy_hitters): the 20 most
    frequent corpus tokens with their 4x256 CMS estimates side by side —
    bucket ids are portable md5 hashes, counts exact integers, the
    estimate an integer MIN, so cms_n >= exact_n holds bit-for-bit on
    both engines (the one-sided CMS guarantee, measured)."""
    from cerebro_spark.operators.profile import cms_heavy_hitters
    from cerebro_spark.operators.util import ensure_parallelism

    # spread the single-file scan: tokenization + 4 md5 buckets per token
    # run on the scan's partitions (no-op on a multi-split scan)
    tok = ensure_parallelism(load_table(spark, "documents", sf_dir)).select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    return cms_heavy_hitters(tok, "w", depth=4, width=256, k=20)


def _cms_sql(depth: int = 4, width: int = 256, k: int = 20) -> str:
    from cerebro_spark.queries.extensions import _hex2long_sql

    def bucket(salt: str, key: str) -> str:
        return (
            _hex2long_sql(f"md5('{salt}|' || {key})", 8) + f" % {width}"
        )

    buck = "\n  UNION ALL ".join(
        f"SELECT {r} AS r, {bucket(str(r), 'w')} AS bucket FROM tok"
        for r in range(depth)
    )
    probe = "\n  UNION ALL ".join(
        f"SELECT key, exact_n, {r} AS r, {bucket(str(r), 'key')} AS bucket "
        "FROM exact"
        for r in range(depth)
    )
    return f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w
  FROM documents WHERE text IS NOT NULL
),
buck AS (
  {buck}
),
sketch AS (
  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c FROM buck GROUP BY 1, 2
),
exact AS (
  SELECT w AS key, CAST(count(*) AS BIGINT) AS exact_n
  FROM tok GROUP BY 1
  ORDER BY exact_n DESC, key ASC LIMIT {k}
),
probe AS (
  {probe}
),
est AS (
  SELECT key, exact_n, min(c) AS cms_n
  FROM probe JOIN sketch USING (r, bucket)
  GROUP BY 1, 2
)
SELECT key, exact_n, CAST(cms_n AS BIGINT) AS cms_n,
  CAST(cms_n - exact_n AS BIGINT) AS overcount
FROM est
ORDER BY exact_n DESC, key ASC
"""


QUERIES["cms_top_terms"] = q_cms_top_terms
ORACLES["cms_top_terms"] = _cms_sql()


def q_readability_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source (text.readability_scores): exact
    word/sentence/syllable-group regex counts summed per source, one
    fixed IEEE chain for the score.  This corpus carries no terminal
    punctuation, so every doc clamps to one sentence — the words/S term
    degrades to doc length, which is exactly what the clamp documents."""
    from cerebro_spark.operators.text import readability_scores

    docs = load_table(spark, "documents", sf_dir)
    return readability_scores(docs, "text", "source")


_READABILITY_SQL = """
WITH per AS (
  SELECT source AS g,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
    CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS s,
    CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) AS BIGINT) AS y
  FROM documents WHERE text IS NOT NULL
),
agg AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(w) AS BIGINT) AS words,
    CAST(sum(s) AS BIGINT) AS sentences,
    CAST(sum(y) AS BIGINT) AS syllable_groups
  FROM per GROUP BY 1
)
SELECT g AS source, n_docs, words, sentences, syllable_groups,
  CASE WHEN words > 0 THEN
    round(206.835
          - 1.015 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
          - 84.6 * (CAST(syllable_groups AS DOUBLE) / CAST(words AS DOUBLE)),
          6)
  END AS flesch
FROM agg
ORDER BY source ASC
"""

QUERIES["readability_by_source"] = q_readability_by_source
ORACLES["readability_by_source"] = _READABILITY_SQL


def q_lang_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility (text.tokenizer_fertility): subword tokens per
    whitespace word by language — the multilingual budgeting number
    (fertility 2x = 2x context and compute per word); exact codegen
    regex counts, one division."""
    from cerebro_spark.operators.text import tokenizer_fertility

    docs = load_table(spark, "documents", sf_dir).filter(
        F.col("lang").isNotNull()
    )
    return tokenizer_fertility(docs, "text", "lang")


_FERTILITY_SQL = """
WITH per AS (
  SELECT lang AS g,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS w,
    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
         AS BIGINT) AS s
  FROM documents WHERE lang IS NOT NULL AND text IS NOT NULL
)
SELECT g AS lang, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(w) AS BIGINT) AS ws_tokens,
  CAST(sum(s) AS BIGINT) AS subwords,
  CASE WHEN sum(w) > 0 THEN
    round(CAST(sum(s) AS DOUBLE) / CAST(sum(w) AS DOUBLE), 6)
  END AS fertility
FROM per GROUP BY 1
ORDER BY lang ASC
"""

QUERIES["lang_fertility"] = q_lang_fertility
ORACLES["lang_fertility"] = _FERTILITY_SQL


def q_ttr_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical diversity (text.type_token_profile): type-token ratio and
    hapax share per source — collapsing TTR flags boilerplate floods,
    exploding hapax flags OCR/noise; exact counts, two divisions."""
    from cerebro_spark.operators.text import type_token_profile

    docs = load_table(spark, "documents", sf_dir)
    return type_token_profile(docs, "text", "source")


_TTR_SQL = """
WITH terms AS (
  SELECT source AS g, unnest(string_split_regex(trim(lower(text)), '\\s+'))
    AS term
  FROM documents WHERE text IS NOT NULL
),
counts AS (
  SELECT g, term, CAST(count(*) AS BIGINT) AS c
  FROM terms WHERE term <> '' GROUP BY g, term
),
vocab AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_types,
    CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM counts GROUP BY g
),
docs AS (
  SELECT source AS g, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents WHERE text IS NOT NULL GROUP BY 1
)
SELECT g AS "group", n_docs, n_tokens, n_types,
  CASE WHEN n_tokens > 0 THEN
    round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
  END AS ttr,
  CASE WHEN n_types > 0 THEN
    round(CAST(hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
  END AS hapax_ratio
FROM vocab JOIN docs USING (g)
"""

QUERIES["ttr_by_source"] = q_ttr_by_source
ORACLES["ttr_by_source"] = _TTR_SQL


def q_heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth exponent (text.heaps_law_fit): ln V vs ln N OLS
    over 32 doc-id-range corpus prefixes — each type counts once at its
    first bucket, so no data-sized sort; the growth companion of
    zipf_slope."""
    from cerebro_spark.operators.text import heaps_law_fit

    return heaps_law_fit(
        load_table(spark, "documents", sf_dir), "text", "doc_id", 32
    )


_HEAPS_SQL = """
WITH base AS (
  SELECT doc_id, text FROM documents
  WHERE text IS NOT NULL AND doc_id IS NOT NULL
),
mx AS (
  SELECT max(doc_id) + 1 AS m, CAST(count(*) AS BIGINT) AS n_docs FROM base
),
docs AS (
  SELECT least(31, CAST(floor(CAST(doc_id AS DOUBLE) * 32.0
                              / CAST((SELECT m FROM mx) AS DOUBLE)) AS INT))
    AS b,
    string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM base
),
terms AS (
  SELECT b, unnest(toks) AS term FROM docs
),
terms_f AS (SELECT b, term FROM terms WHERE term <> ''),
first AS (
  SELECT term, min(b) AS b FROM terms_f GROUP BY term
),
v_per AS (SELECT b, CAST(count(*) AS BIGINT) AS v FROM first GROUP BY b),
n_per AS (SELECT b, CAST(count(*) AS BIGINT) AS t FROM terms_f GROUP BY b),
grid AS (
  SELECT n_per.b, t, COALESCE(v, 0) AS v
  FROM n_per LEFT JOIN v_per USING (b)
),
pts AS (
  SELECT
    sum(t) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS nn,
    sum(v) OVER (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS vv
  FROM grid
),
q AS (
  SELECT CAST(floor(ln(CAST(nn AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
         CAST(floor(ln(CAST(vv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y,
         nn, vv
  FROM pts WHERE nn > 0 AND vv > 0
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
    sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
    sum(CAST(x AS HUGEINT) * y) AS sxy,
    sum(CAST(x AS HUGEINT) * x) AS sxx,
    sum(CAST(y AS HUGEINT) * y) AS syy,
    CAST(max(nn) AS BIGINT) AS n_tokens, CAST(max(vv) AS BIGINT) AS n_types
  FROM q
)
SELECT (SELECT n_docs FROM mx) AS n_docs, n_tokens, n_types,
  CASE WHEN n >= 2 AND CAST(n AS HUGEINT) * sxx - sx * sx > 0 THEN
    round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
          / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE), 6)
  END AS heaps_beta,
  CASE WHEN n >= 2 AND CAST(n AS HUGEINT) * sxx - sx * sx > 0 THEN
    round((CAST(sy AS DOUBLE)
           - (CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
              / CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE))
             * CAST(sx AS DOUBLE))
          / CAST(n AS DOUBLE) / 1000000.0, 6)
  END AS heaps_lnk,
  CASE WHEN n >= 2 AND CAST(n AS HUGEINT) * sxx - sx * sx > 0
        AND CAST(n AS HUGEINT) * syy - sy * sy > 0 THEN
    round(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
          * CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)
          / (CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)
             * CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DOUBLE)), 6)
  END AS r2
FROM agg
"""

QUERIES["heaps_law_fit"] = q_heaps_law_fit
ORACLES["heaps_law_fit"] = _HEAPS_SQL


def q_good_turing_unseen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing unseen mass (text.good_turing_unseen): P(next token is
    a new type) = N1/N plus the smoothed once-seen count 2·N2/N1 — the
    "do we need another crawl?" number; exact integer counts."""
    from cerebro_spark.operators.text import good_turing_unseen

    return good_turing_unseen(load_table(spark, "documents", sf_dir), "text")


_GOOD_TURING_SQL = """
WITH terms AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE text IS NOT NULL
),
counts AS (
  SELECT term, CAST(count(*) AS BIGINT) AS c
  FROM terms WHERE term <> '' GROUP BY term
),
agg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS n_types,
    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
    CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM counts
)
SELECT n_tokens, n_types, n1 AS n_singletons, n2 AS n_doubletons,
  CASE WHEN n_tokens > 0 THEN
    round(CAST(n1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
  END AS p_unseen,
  CASE WHEN n1 > 0 THEN
    round(2.0 * CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6)
  END AS gt_r1
FROM agg
"""

QUERIES["good_turing_unseen"] = q_good_turing_unseen
ORACLES["good_turing_unseen"] = _GOOD_TURING_SQL


def q_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stylometric distance (text.burrows_delta): mean |z-difference| of
    the top-50 corpus terms' relative rates between source pairs — the
    'same words, different usage' signal js_drift can't see."""
    from cerebro_spark.operators.text import burrows_delta

    return burrows_delta(
        load_table(spark, "documents", sf_dir), "text", "source", top_n=50
    )


_BURROWS_SQL = """
WITH terms AS (
  SELECT source AS g,
    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
cells AS (
  SELECT g, term, CAST(count(*) AS BIGINT) AS c
  FROM terms WHERE term <> '' GROUP BY g, term
),
vocab AS (
  SELECT term FROM (
    SELECT term, sum(c) AS tot FROM cells GROUP BY term
    ORDER BY tot DESC, term ASC LIMIT 50
  )
),
gtot AS (
  SELECT g, sum(CAST(c AS HUGEINT)) AS gt FROM cells GROUP BY g
),
dense AS (
  SELECT gtot.g, vocab.term,
    (COALESCE(CAST(c.c AS HUGEINT), 0) * 1000000000) // gtot.gt AS f
  FROM gtot CROSS JOIN vocab
  LEFT JOIN cells c ON c.g = gtot.g AND c.term = vocab.term
),
stats AS (
  SELECT term, CAST(count(*) AS HUGEINT) AS k,
    sum(f) AS sf, sum(f * f) AS sff
  FROM dense GROUP BY term
),
z AS (
  SELECT d.g, d.term,
    CAST(floor(CAST(s.k * d.f - s.sf AS DOUBLE)
               / sqrt(CAST(s.k * s.sff - s.sf * s.sf AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS z
  FROM dense d JOIN stats s USING (term)
  WHERE s.k * s.sff - s.sf * s.sf > 0
),
pairs AS (
  SELECT a.g AS group_a, b.g AS group_b,
    CAST(count(*) AS BIGINT) AS n_terms,
    sum(CAST(abs(a.z - b.z) AS HUGEINT)) AS sd
  FROM z a JOIN z b ON a.term = b.term AND a.g < b.g
  GROUP BY 1, 2
)
SELECT group_a, group_b,
  round(CAST(sd AS DOUBLE) / CAST(n_terms AS DOUBLE) / 1000000.0, 6)
    AS delta,
  n_terms
FROM pairs
"""

QUERIES["burrows_delta"] = q_burrows_delta
ORACLES["burrows_delta"] = _BURROWS_SQL


def q_doc_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc novelty profile (text.doc_novelty_profile): mean token
    surprisal per document against the corpus unigram model, aggregated
    per source — boilerplate floors, OCR-noise ceilings."""
    from cerebro_spark.operators.text import doc_novelty_profile

    return doc_novelty_profile(
        load_table(spark, "documents", sf_dir), "text", "source"
    )


_DOC_NOVELTY_SQL = """
WITH terms AS (
  SELECT source AS g, doc_id,
    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
tf AS (SELECT g, doc_id, term FROM terms WHERE term <> ''),
vocab AS (
  SELECT term, CAST(count(*) AS BIGINT) AS ct FROM tf GROUP BY term
),
tot AS (SELECT sum(CAST(ct AS HUGEINT)) AS n FROM vocab),
voc AS (
  SELECT term,
    CAST(floor(ln(CAST((SELECT n FROM tot) AS DOUBLE) / CAST(ct AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS surp
  FROM vocab
),
per_doc AS (
  SELECT g, doc_id, sum(CAST(surp AS HUGEINT)) AS s,
    CAST(count(*) AS HUGEINT) AS nt
  FROM tf JOIN voc USING (term) GROUP BY g, doc_id
),
nov AS (
  SELECT g, s // nt AS nov FROM per_doc
)
SELECT g AS "group", CAST(count(*) AS BIGINT) AS n_docs,
  round(CAST(sum(nov) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0, 6)
    AS mean_novelty,
  round(CAST(min(nov) AS DOUBLE) / 1000000.0, 6) AS min_novelty,
  round(CAST(max(nov) AS DOUBLE) / 1000000.0, 6) AS max_novelty
FROM nov GROUP BY g
"""

QUERIES["doc_novelty"] = q_doc_novelty
ORACLES["doc_novelty"] = _DOC_NOVELTY_SQL


def q_fightin_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per source (text.fightin_words): Dirichlet-prior
    log-odds z vs the rest of the corpus, top-10 per source — names the
    words behind a burrows_delta divergence."""
    from cerebro_spark.operators.text import fightin_words

    return fightin_words(
        load_table(spark, "documents", sf_dir), "text", "source", top_k=10
    )


_FIGHTIN_SQL = """
WITH terms AS (
  SELECT source AS g,
    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
cells AS (
  SELECT g, term, CAST(count(*) AS BIGINT) AS c
  FROM terms WHERE term <> '' GROUP BY g, term
),
tterm AS (SELECT term, CAST(sum(c) AS BIGINT) AS ct FROM cells GROUP BY term),
gtot AS (SELECT g, CAST(sum(c) AS BIGINT) AS ng FROM cells GROUP BY g),
tot AS (SELECT CAST(sum(ct) AS BIGINT) AS n FROM tterm),
scored AS (
  SELECT cells.g, cells.term, cells.c,
    CAST(floor(
      (ln((CAST(c AS DOUBLE) + 200.0 * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
          / (CAST(ng AS DOUBLE) + 200.0
             - CAST(c AS DOUBLE)
             - 200.0 * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)))
       - ln((CAST(ct - c AS DOUBLE)
             + 200.0 * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
            / (CAST(n - ng AS DOUBLE) + 200.0
               - CAST(ct - c AS DOUBLE)
               - 200.0 * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))))
      / sqrt(1.0 / (CAST(c AS DOUBLE)
                    + 200.0 * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
             + 1.0 / (CAST(ct - c AS DOUBLE)
                      + 200.0 * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)))
      * 1000000.0 + 0.5) AS BIGINT) AS zq
  FROM cells JOIN tterm USING (term) JOIN gtot USING (g)
  CROSS JOIN tot
),
ranked AS (
  SELECT g, term, c, zq,
    row_number() OVER (PARTITION BY g ORDER BY zq DESC, term ASC) AS rank
  FROM scored
)
SELECT g AS "group", term, c AS count,
  round(CAST(zq AS DOUBLE) / 1000000.0, 6) AS z_logodds,
  CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
"""

QUERIES["fightin_words"] = q_fightin_words
ORACLES["fightin_words"] = _FIGHTIN_SQL


def q_hill_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill-number diversity (text.hill_diversity): richness, effective
    vocabulary exp(H), and inverse-Simpson per source — the three-point
    corpus-composition profile."""
    from cerebro_spark.operators.text import hill_diversity

    return hill_diversity(
        load_table(spark, "documents", sf_dir), "text", "source"
    )


_HILL_DIVERSITY_SQL = """
WITH terms AS (
  SELECT source AS g,
    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
cells AS (
  SELECT g, term, CAST(count(*) AS BIGINT) AS c
  FROM terms WHERE term <> '' GROUP BY g, term
),
gtot AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY g),
agg AS (
  SELECT cells.g, max(n) AS n, CAST(count(*) AS BIGINT) AS richness,
    sum(CAST(c AS HUGEINT)
        * CAST(floor(ln(CAST(n AS DOUBLE) / CAST(c AS DOUBLE))
                     * 1000000.0 + 0.5) AS BIGINT)) AS h6,
    sum(CAST(c AS HUGEINT) * c) AS cc
  FROM cells JOIN gtot USING (g) GROUP BY cells.g
)
SELECT g AS "group", CAST(n AS BIGINT) AS n_tokens, richness,
  round(exp(CAST(h6 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0)), 4)
    AS hill_q1,
  round(CAST(n AS DOUBLE) * CAST(n AS DOUBLE) / CAST(cc AS DOUBLE), 4)
    AS hill_q2
FROM agg
"""

QUERIES["hill_diversity"] = q_hill_diversity
ORACLES["hill_diversity"] = _HILL_DIVERSITY_SQL


def q_vocab_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary overlap matrix (text.vocab_jaccard_pairs): distinct-
    token Jaccard per source pair - the redundancy check for corpus
    mixing decisions."""
    from cerebro_spark.operators.text import vocab_jaccard_pairs

    return vocab_jaccard_pairs(
        load_table(spark, "documents", sf_dir), "text", "source"
    )


_VOCAB_JACCARD_SQL = """
WITH cells AS (
  SELECT DISTINCT source AS g,
    unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL
),
cf AS (SELECT g, term FROM cells WHERE term <> ''),
rich AS (SELECT g, CAST(count(*) AS BIGINT) AS v FROM cf GROUP BY g),
inter AS (
  SELECT a.g AS ga, b.g AS gb, CAST(count(*) AS BIGINT) AS n_shared
  FROM cf a JOIN cf b ON a.term = b.term AND a.g < b.g
  GROUP BY 1, 2
)
SELECT ga AS group_a, gb AS group_b,
  ra.v AS v_a, rb.v AS v_b, n_shared,
  CASE WHEN ra.v + rb.v - n_shared > 0 THEN
    round(CAST(n_shared AS DOUBLE)
          / CAST(ra.v + rb.v - n_shared AS DOUBLE), 6)
  END AS jaccard
FROM inter
JOIN rich ra ON ra.g = ga
JOIN rich rb ON rb.g = gb
"""

QUERIES["vocab_jaccard"] = q_vocab_jaccard
ORACLES["vocab_jaccard"] = _VOCAB_JACCARD_SQL


def q_langid_prf1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class P/R/F1 (text.langid_prf1) of the lang_id_heuristic vs
    recorded labels - names the language the classifier fails on."""
    from cerebro_spark.operators.text import langid_prf1
    from cerebro_spark.operators.util import ensure_parallelism

    # spread the single-file scan before the per-row regex battery
    return langid_prf1(
        ensure_parallelism(load_table(spark, "documents", sf_dir)),
        "text", "lang",
    )


def _langid_prf1_sql() -> str:
    from cerebro_spark.queries.extensions import _lang_confusion_sql

    conf = _lang_confusion_sql()
    return f"""
WITH conf AS ({conf}),
true_m AS (SELECT lang, CAST(sum(n) AS BIGINT) AS n_true FROM conf GROUP BY 1),
pred_m AS (
  SELECT lang_pred AS lang, CAST(sum(n) AS BIGINT) AS n_pred
  FROM conf GROUP BY 1
),
tp AS (
  SELECT lang, CAST(sum(n) AS BIGINT) AS tp
  FROM conf WHERE lang = lang_pred GROUP BY 1
),
classes AS (
  SELECT lang FROM true_m UNION SELECT lang FROM pred_m
)
SELECT c.lang,
  COALESCE(n_true, 0) AS n_true,
  COALESCE(n_pred, 0) AS n_pred,
  COALESCE(tp.tp, 0) AS tp,
  CASE WHEN COALESCE(n_pred, 0) > 0 THEN
    round(CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(n_pred AS DOUBLE), 6)
  END AS precision,
  CASE WHEN COALESCE(n_true, 0) > 0 THEN
    round(CAST(COALESCE(tp.tp, 0) AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
  END AS recall,
  CASE WHEN COALESCE(n_true, 0) + COALESCE(n_pred, 0) > 0 THEN
    round(2.0 * CAST(COALESCE(tp.tp, 0) AS DOUBLE)
          / CAST(COALESCE(n_true, 0) + COALESCE(n_pred, 0) AS DOUBLE), 6)
  END AS f1
FROM classes c
LEFT JOIN true_m USING (lang)
LEFT JOIN pred_m USING (lang)
LEFT JOIN tp USING (lang)
"""


QUERIES["langid_prf1"] = q_langid_prf1
ORACLES["langid_prf1"] = _langid_prf1_sql()


def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup sizing (dedup.dedup_savings): documents and bytes an exact
    dedup pass recovers, plus the max duplicate-group size (template-
    flood flag)."""
    from cerebro_spark.operators.dedup import dedup_savings

    return dedup_savings(
        load_table(spark, "documents", sf_dir), "text", "n_chars"
    )


_DEDUP_SAVINGS_SQL = """
WITH groups AS (
  SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS c,
    sum(CAST(n_chars AS HUGEINT)) AS bytes,
    CAST(min(n_chars) AS BIGINT) AS sz
  FROM documents WHERE text IS NOT NULL GROUP BY 1
)
SELECT CAST(sum(c) AS BIGINT) AS n_docs,
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(CASE WHEN c > 1 THEN c - 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
  CAST(sum(bytes) AS BIGINT) AS bytes_total,
  CAST(sum(CAST(c - 1 AS HUGEINT) * sz) AS BIGINT) AS bytes_dup,
  CASE WHEN sum(bytes) > 0 THEN
    round(CAST(sum(CAST(c - 1 AS HUGEINT) * sz) AS DOUBLE)
          / CAST(sum(bytes) AS DOUBLE), 6)
  END AS dup_ratio,
  CAST(max(c) AS BIGINT) AS max_group
FROM groups
"""

QUERIES["dedup_savings"] = q_dedup_savings
ORACLES["dedup_savings"] = _DEDUP_SAVINGS_SQL


# ---------------------------------------------------------------------------
# distributed BPE merge training (r10): the learning step, gated round for
# round, plus the trained-vocabulary fertility readout
# ---------------------------------------------------------------------------

_BPE_MERGES = 6


def _bpe_train_ctes(merges: int) -> str:
    """The unrolled k-round BPE training as DuckDB CTEs (the mmr_rerank
    unroll pattern): words -> WRAPPED symbol strings ('abc' ->
    '<31>a<31><31>b<31><31>c<31>', chr(31) = BPE_SEP — every symbol
    carries BOTH boundaries, so the single non-overlapping replace of
    '<31>l<31><31>r<31>' with '<31>lr<31>' is exactly textbook-greedy
    and can never consume the suffix of a longer preceding symbol; see
    text._bpe_symbol_string for the proof sketch) -> per round
    (adjacent-pair count via unnest+subscripts self-join, argmax with
    the Spark tie-break, one replace rewrite)."""
    parts = [
        """
words AS MATERIALIZED (
  SELECT substr(w, 1, 64) AS w, count(*) AS n FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
  ) WHERE w <> '' AND NOT contains(w, chr(31)) GROUP BY 1
),
seq0 AS MATERIALIZED (
  SELECT w,
         chr(31) || array_to_string(string_split(w, ''), chr(31) || chr(31))
                 || chr(31) AS s,
         n
  FROM words
)"""
    ]
    for r in range(1, merges + 1):
        parts.append(
            f"""
sy{r} AS (
  SELECT w, n, generate_subscripts(arr, 1) AS i, unnest(arr) AS sym
  FROM (SELECT w, n,
               list_filter(string_split(s, chr(31)), x -> x <> '') AS arr
        FROM seq{r - 1})
),
m{r} AS MATERIALIZED (
  SELECT {r} AS merge_round, a.sym AS lhs, b.sym AS rhs,
         CAST(sum(a.n) AS BIGINT) AS pair_count
  FROM sy{r} a JOIN sy{r} b ON a.w = b.w AND b.i = a.i + 1
  GROUP BY 1, 2, 3
  ORDER BY pair_count DESC, lhs ASC, rhs ASC
  LIMIT 1
),
seq{r} AS MATERIALIZED (
  SELECT w,
         replace(s, chr(31) || m.lhs || chr(31) || chr(31) || m.rhs || chr(31),
                    chr(31) || m.lhs || m.rhs || chr(31)) AS s,
         n
  FROM seq{r - 1}, m{r} m
)"""
        )
    return ",".join(parts)


def q_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge-table TRAINING (text.train_bpe), gated round
    for round: 6 rounds of weighted adjacent-pair counting + argmax merge
    over the distinct-word table, deterministic (count DESC, lhs, rhs)
    tie-break.  The oracle unrolls the 6 rounds as CTE chains and must
    reproduce the exact merge table — pair, order, and count."""
    from cerebro_spark.operators.text import train_bpe

    learned = train_bpe(
        load_table(spark, "documents", sf_dir), merges=_BPE_MERGES
    )
    from cerebro_spark.operators.util import small_df

    return small_df(
        spark, learned,
        "merge_round int, lhs string, rhs string, pair_count long",
    )


_BPE_TRAIN_SQL = (
    "WITH "
    + _bpe_train_ctes(_BPE_MERGES)
    + "\nSELECT merge_round, lhs, rhs, pair_count FROM ("
    + " UNION ALL ".join(
        f"SELECT * FROM m{r}" for r in range(1, _BPE_MERGES + 1)
    )
    + ")"
)


def q_bpe_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fertility under the TRAINED merge table (text.bpe_fertility), per
    language — the budgeting readout `lang_fertility` approximates with a
    fixed regex, now computed from the vocabulary the corpus actually
    learned: train 6 merges, replay them over every word, count surviving
    subword tokens per whitespace word per language.  The oracle re-trains
    AND re-applies the merges from scratch in SQL."""
    from cerebro_spark.operators.text import bpe_fertility, train_bpe
    from cerebro_spark.operators.util import ensure_parallelism

    # spread the single-file scan: the k-deep merge replay runs per word
    # on the scan's partitions (no-op on a multi-split scan)
    docs = ensure_parallelism(load_table(spark, "documents", sf_dir))
    learned = train_bpe(docs, merges=_BPE_MERGES)
    return bpe_fertility(docs, learned, group_col="lang")


_BPE_FERTILITY_SQL = (
    "WITH "
    + _bpe_train_ctes(_BPE_MERGES)
    + f""",
lw AS (
  SELECT lang, substr(w, 1, 64) AS w FROM (
    SELECT lang, unnest(string_split_regex(trim(text), '\\s+')) AS w
    FROM documents
  ) WHERE w <> '' AND NOT contains(w, chr(31))
),
wtok AS (
  SELECT w, len(list_filter(string_split(s, chr(31)), x -> x <> '')) AS t
  FROM seq{_BPE_MERGES}
),
nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
agg AS (
  SELECT lw.lang, count(*) AS ws_tokens, sum(wtok.t) AS bpe_tokens
  FROM lw JOIN wtok ON wtok.w = lw.w
  GROUP BY 1
)
SELECT a.lang, CAST(nd.n_docs AS BIGINT) AS n_docs,
       CAST(ws_tokens AS BIGINT) AS ws_tokens,
       CAST(bpe_tokens AS BIGINT) AS bpe_tokens,
       CASE WHEN ws_tokens > 0
            THEN round(CAST(bpe_tokens AS DOUBLE) / ws_tokens, 6)
       END AS fertility
FROM agg a JOIN nd ON nd.lang = a.lang
"""
)

QUERIES["bpe_train_merges"] = q_bpe_train_merges
ORACLES["bpe_train_merges"] = _BPE_TRAIN_SQL
QUERIES["bpe_fertility_by_lang"] = q_bpe_fertility_by_lang
ORACLES["bpe_fertility_by_lang"] = _BPE_FERTILITY_SQL


# ---------------------------------------------------------------------------
# WordPiece merge training (r10): the likelihood objective over the same
# machinery — score = count(pair) / (count(left) * count(right))
# ---------------------------------------------------------------------------

def _wp_train_ctes(merges: int) -> str:
    parts = [
        """
words AS MATERIALIZED (
  SELECT substr(w, 1, 64) AS w, count(*) AS n FROM (
    SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
  ) WHERE w <> '' AND NOT contains(w, chr(31)) GROUP BY 1
),
seq0 AS MATERIALIZED (
  SELECT w,
         chr(31) || array_to_string(string_split(w, ''), chr(31) || chr(31))
                 || chr(31) AS s,
         n
  FROM words
)"""
    ]
    for r in range(1, merges + 1):
        parts.append(
            f"""
sy{r} AS (
  SELECT w, n, generate_subscripts(arr, 1) AS i, unnest(arr) AS sym
  FROM (SELECT w, n,
               list_filter(string_split(s, chr(31)), x -> x <> '') AS arr
        FROM seq{r - 1})
),
u{r} AS (
  SELECT sym, sum(n) AS uc FROM sy{r} GROUP BY 1
),
m{r} AS MATERIALIZED (
  SELECT {r} AS merge_round, p.lhs, p.rhs,
         CAST(p.c AS BIGINT) AS pair_count,
         CAST(ul.uc AS BIGINT) AS lhs_count,
         CAST(ur.uc AS BIGINT) AS rhs_count
  FROM (
    SELECT a.sym AS lhs, b.sym AS rhs, sum(a.n) AS c
    FROM sy{r} a JOIN sy{r} b ON a.w = b.w AND b.i = a.i + 1
    GROUP BY 1, 2
  ) p
  JOIN u{r} ul ON ul.sym = p.lhs
  JOIN u{r} ur ON ur.sym = p.rhs
  -- each factor cast to DOUBLE before multiplying, mirroring Spark: a
  -- HUGEINT product here vs a wrapped 64-bit product there diverges the
  -- argmax at multi-billion-token scale; double*double is IEEE-identical
  ORDER BY CAST(p.c AS DOUBLE) / (CAST(ul.uc AS DOUBLE) * CAST(ur.uc AS DOUBLE))
           DESC, p.lhs ASC, p.rhs ASC
  LIMIT 1
),
seq{r} AS MATERIALIZED (
  SELECT w,
         replace(s, chr(31) || m.lhs || chr(31) || chr(31) || m.rhs || chr(31),
                    chr(31) || m.lhs || m.rhs || chr(31)) AS s,
         n
  FROM seq{r - 1}, m{r} m
)"""
        )
    return ",".join(parts)


def q_wordpiece_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece merge training (text.train_wordpiece), gated round for
    round: the LIKELIHOOD argmax (pair count over the product of part
    counts — one IEEE division of exactly-representable integers,
    identical in both engines) instead of BPE's raw-count argmax.  The
    output carries only integers (pair + all three counts), so the gate
    hashes exactly; the oracle re-trains the 6 rounds in SQL."""
    from cerebro_spark.operators.text import train_wordpiece

    learned = train_wordpiece(
        load_table(spark, "documents", sf_dir), merges=_BPE_MERGES
    )
    from cerebro_spark.operators.util import small_df

    return small_df(
        spark,
        learned,
        "merge_round int, lhs string, rhs string, pair_count long, "
        "lhs_count long, rhs_count long",
    )


_WP_TRAIN_SQL = (
    "WITH "
    + _wp_train_ctes(_BPE_MERGES)
    + "\nSELECT merge_round, lhs, rhs, pair_count, lhs_count, rhs_count FROM ("
    + " UNION ALL ".join(
        f"SELECT * FROM m{r}" for r in range(1, _BPE_MERGES + 1)
    )
    + ")"
)

QUERIES["wordpiece_train_merges"] = q_wordpiece_train_merges
ORACLES["wordpiece_train_merges"] = _WP_TRAIN_SQL


# ---------------------------------------------------------------------------
# BPE ENCODING (r11): text -> subword-id sequences under the trained merge
# table — the application step that turns train_bpe from a readout into a
# tokenizer.  The oracle re-trains the merges as CTEs (the bpe_train_merges
# pattern), derives the same deterministic vocabulary (chars in binary
# order, then merge products in round order, first occurrence keeps its
# id), and unrolls every document's id sequence ordered by (word position,
# symbol position).  Id sequences are comma-joined strings — the driver
# canonicalizer rejects raw array cells.
# ---------------------------------------------------------------------------

def q_bpe_encode_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text.bpe_encode end-to-end: train 6 merges, build the vocabulary,
    encode every document to its subword-id sequence.  Exactness is the
    point — the comma-joined id string pins token identity AND order, so
    any divergence in merge replay, vocab assignment, or sequence
    reassembly hash-fails."""
    from cerebro_spark.operators.text import bpe_encode, train_bpe

    docs = load_table(spark, "documents", sf_dir)
    learned = train_bpe(docs, merges=_BPE_MERGES)
    enc = bpe_encode(docs, learned)
    return enc.select(
        "doc_id",
        "n_tokens",
        F.array_join(
            F.transform("token_ids", lambda x: x.cast("string")), ","
        ).alias("ids"),
    )


_BPE_ENCODE_SQL = (
    "WITH "
    + _bpe_train_ctes(_BPE_MERGES)
    + f""",
chars AS MATERIALIZED (
  SELECT c, row_number() OVER (ORDER BY c) - 1 AS tid FROM (
    SELECT DISTINCT unnest(string_split(w, '')) AS c FROM words
  ) WHERE c <> ''
),
mt AS (
  SELECT lhs || rhs AS tok, merge_round AS r FROM (
    {" UNION ALL ".join(f"SELECT lhs, rhs, merge_round FROM m{r}" for r in range(1, _BPE_MERGES + 1))}
  )
),
-- first occurrence keeps its id: dedupe merge products on min round, then
-- number them after the chars block (binary char order == Python sorted ==
-- Spark orderBy: UTF-8 bytes preserve code-point order)
mtd AS (SELECT tok, min(r) AS r FROM mt GROUP BY tok),
mids AS (
  SELECT tok,
         (SELECT count(*) FROM chars) + row_number() OVER (ORDER BY r) - 1
           AS tid
  FROM mtd
),
vocab AS (SELECT c AS tok, tid FROM chars UNION ALL SELECT tok, tid FROM mids),
wsyms AS (
  SELECT w, generate_subscripts(arr, 1) AS spos, unnest(arr) AS sym
  FROM (SELECT w, list_filter(string_split(s, chr(31)), x -> x <> '') AS arr
        FROM seq{_BPE_MERGES})
),
wids AS MATERIALIZED (
  SELECT ws.w, ws.spos, v.tid FROM wsyms ws JOIN vocab v ON v.tok = ws.sym
),
dw AS (
  SELECT doc_id, wpos, substr(w, 1, 64) AS w FROM (
    SELECT doc_id, generate_subscripts(ws, 1) AS wpos, unnest(ws) AS w
    FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
          FROM documents)
  ) WHERE w <> '' AND NOT contains(w, chr(31))
)
SELECT dw.doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       string_agg(CAST(wi.tid AS VARCHAR), ','
                  ORDER BY dw.wpos, wi.spos) AS ids
FROM dw JOIN wids wi ON wi.w = dw.w
GROUP BY dw.doc_id
"""
)

QUERIES["bpe_encode_check"] = q_bpe_encode_check
ORACLES["bpe_encode_check"] = _BPE_ENCODE_SQL
