"""Oracle-checked queries: TF-IDF top terms, corpus top n-grams, per-label
embedding centroids."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cerebro_spark.io import load_table
from cerebro_spark.operators.similarity import label_centroids
from cerebro_spark.operators.text import tfidf_top_terms, top_ngrams


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


QUERIES = {
    "tfidf_top_terms": q_tfidf,
    "top_ngrams": q_top_ngrams,
    "label_centroids": q_label_centroids,
}

ORACLES = {
    "tfidf_top_terms": _TFIDF_SQL,
    "top_ngrams": _TOP_NGRAMS_SQL,
    "label_centroids": _CENTROIDS_SQL,
}
