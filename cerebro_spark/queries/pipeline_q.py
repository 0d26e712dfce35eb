"""Oracle-checked queries for the pipeline utilities: deterministic sampling,
train/val/test split, document chunking, PII redaction."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.sampling import (
    chunk_documents,
    deterministic_sample,
    epoch_shuffle,
    mixture_sample,
    pack_tokens,
    redact_pii,
    train_val_test_split,
)
from cerebro_spark.queries.extensions import _hex2long_sql

_BUCKET_SQL = _hex2long_sql("md5(CAST({key} AS STRING))", 8) + " % 100"


def q_deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return deterministic_sample(ev, 20, "event_id").select(
        "event_id", "ts", "event_type", "value"
    )


_SAMPLE_SQL = f"""
SELECT event_id, ts, event_type, value FROM events
WHERE {_BUCKET_SQL.format(key="event_id")} < 20
"""


def q_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    out = train_val_test_split(docs, "doc_id", val_pct=10, test_pct=10)
    return out.groupBy("split").agg(F.count(F.lit(1)).alias("n"))


_SPLIT_SQL = f"""
SELECT CASE WHEN b < 10 THEN 'test' WHEN b < 20 THEN 'val' ELSE 'train' END AS split,
       count(*) AS n
FROM (SELECT {_BUCKET_SQL.format(key="doc_id")} AS b FROM documents)
GROUP BY 1
"""


def q_domain_guarded_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-guarded split (sampling.leakage_guarded_split): synthetic
    crawl URLs (scheme/www/subdomain/tld variants per doc) are keyed by
    registered domain so every page of a site — including its subdomain
    twins — lands in ONE split.  The Spark side derives the domain
    through the full canonicalize_url ∘ registered_domain chain; the
    oracle computes it ANALYTICALLY from the construction rule, so a
    hash match proves the whole chain recovers the known ground truth.
    Output: per split, doc and distinct-domain counts."""
    from cerebro_spark.operators.sampling import leakage_guarded_split

    docs = load_table(spark, "documents", sf_dir)
    k = F.col("doc_id")
    url = F.concat(
        F.when(k % 3 == 0, F.lit("https://"))
        .when(k % 3 == 1, F.lit("http://www."))
        .otherwise(F.lit("HTTPS://WWW.")),
        F.when(k % 2 == 0, F.lit("docs.")).otherwise(F.lit("")),
        F.col("source"),
        F.when(k % 4 == 0, F.lit(".co.uk")).otherwise(F.lit(".com")),
        F.lit("/p/"),
        k.cast("string"),
    )
    out = leakage_guarded_split(
        docs.select("doc_id", url.alias("url")), "url"
    )
    return out.groupBy("split").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("domain").cast("long").alias("n_domains"),
    )


_DOMAIN_SPLIT_SQL = f"""
WITH d AS (
  SELECT doc_id,
    source || (CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END)
      AS domain
  FROM documents
),
s AS (
  SELECT doc_id, domain,
    CASE WHEN {_BUCKET_SQL.format(key="domain")} < 10 THEN 'test'
         WHEN {_BUCKET_SQL.format(key="domain")} < 20 THEN 'val'
         ELSE 'train' END AS split
  FROM d
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT domain) AS BIGINT) AS n_domains
FROM s GROUP BY 1
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(
        load_table(spark, "documents", sf_dir), chunk_tokens=32, overlap=8
    )


_CHUNK_SQL = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
spans AS (
  SELECT doc_id, t,
    greatest(CAST(ceil((len(t) - 8) / 24.0) AS INTEGER), 1) AS n_chunks
  FROM toks
)
SELECT doc_id, i AS chunk_id,
  array_to_string(t[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
FROM spans, generate_series(0, 100) AS g(i)
WHERE i < n_chunks
"""


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inject synthetic PII deterministically, then redact — the oracle
    re-derives the expected redacted text from the injection rule."""
    docs = load_table(spark, "documents", sf_dir)
    with_pii = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" call 555-123-4567")).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return redact_pii(with_pii).select("doc_id", "text")


_REDACT_SQL = """
SELECT doc_id,
  text
  || CASE WHEN doc_id % 3 = 0 THEN ' contact <EMAIL> now' ELSE '' END
  || CASE WHEN doc_id % 5 = 0 THEN ' call <PHONE>' ELSE '' END AS text
FROM documents
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Target mixture 50/30/20 over three sources (others dropped): the
    sampler keeps the largest subset matching those proportions."""
    docs = load_table(spark, "documents", sf_dir)
    out = mixture_sample(
        docs,
        {"src0": 0.5, "src1": 0.3, "src2": 0.2},
        domain_col="source",
        key_col="doc_id",
    )
    return out.select("doc_id", "source")


_MIXTURE_BUCKET = _hex2long_sql(
    "md5(concat(source, '|', CAST(doc_id AS STRING)))", 8
)

_MIXTURE_SQL = f"""
WITH w(dom, wt) AS (VALUES
  ('src0', CAST(0.5 AS DOUBLE)),
  ('src1', CAST(0.3 AS DOUBLE)),
  ('src2', CAST(0.2 AS DOUBLE))),
counts AS (SELECT source AS dom, count(*) AS n FROM documents GROUP BY 1),
j AS (SELECT dom, n, wt FROM counts JOIN w USING (dom)),
s AS (SELECT min(n / wt) AS s FROM j),
pct AS (SELECT dom, CAST(100.0 AS DOUBLE) * wt * s / n AS p FROM j, s)
SELECT doc_id, source FROM documents JOIN pct ON source = dom
WHERE {_MIXTURE_BUCKET} % 100 < p
"""


def q_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_tokens(
        load_table(spark, "documents", sf_dir),
        budget=256,
        partition_col="source",
        order_col="doc_id",
    )


_PACK_SQL = """
WITH t AS (
  SELECT doc_id, source,
    len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, source, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tb
  FROM t
)
SELECT doc_id, source, n_tokens,
  CAST(floor(tb / CAST(256 AS DOUBLE)) AS BIGINT) AS batch_id,
  tb % 256 AS batch_offset
FROM c
"""


def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-1 corpus shuffle into 8 training shards."""
    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    return epoch_shuffle(docs, epoch=1, num_shards=8)


_EPOCH_SHUFFLE_SQL = f"""
WITH hashed AS (
  SELECT doc_id,
    {_hex2long_sql("md5(CAST(doc_id AS VARCHAR) || ':1')", 14)} AS h
  FROM documents
)
SELECT doc_id, CAST(h % 8 AS INT) AS shard,
  CAST(row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1 AS BIGINT)
    AS pos
FROM hashed
"""


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-batch packing diagnostics over the ``pack_tokens`` layout:
    per source — total tokens, sequence count at budget=256, fill ratio of
    the (only-partially-filled) final sequence's stream, and how many docs
    straddle a sequence boundary.  The report a data engineer reads before
    committing a packing budget."""
    packed = pack_tokens(
        load_table(spark, "documents", sf_dir),
        budget=256,
        partition_col="source",
        order_col="doc_id",
    )
    return (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum(
                (F.col("batch_offset") + F.col("n_tokens") > 256)
                .cast("int")
            ).alias("boundary_docs"),
        )
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.ceil(F.col("total_tokens") / 256.0).alias("n_sequences"),
            F.round(
                F.col("total_tokens")
                / (F.ceil(F.col("total_tokens") / 256.0) * 256.0),
                6,
            ).alias("fill_ratio"),
            "boundary_docs",
        )
    )


_PACK_EFF_SQL = """
WITH t AS (
  SELECT doc_id, source,
    len(string_split_regex(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
c AS (
  SELECT source, n_tokens,
    CAST(coalesce(sum(n_tokens) OVER (
      PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      % 256 AS batch_offset
  FROM t
)
SELECT source,
  count(*) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(ceil(sum(n_tokens) / 256.0) AS BIGINT) AS n_sequences,
  round(sum(n_tokens) / (ceil(sum(n_tokens) / 256.0) * 256.0), 6)
    AS fill_ratio,
  CAST(sum(CASE WHEN batch_offset + n_tokens > 256 THEN 1 ELSE 0 END)
    AS BIGINT) AS boundary_docs
FROM c GROUP BY source
"""


# ---------------------------------------------------------------------------
# boundary-preserving sequence packing (r11): deterministic greedy first-fit
# by (length DESC, id) within portable hash groups — the oracle unrolls the
# SAME fold as a recursive CTE carrying the open-bin capacity list, so bin
# assignment, sequence ids, and offsets must match item for item.
# ---------------------------------------------------------------------------

_PACK_SEQ_LEN = 64
_PACK_GROUPS = 4


def q_pack_sequences_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sampling.pack_sequences end-to-end: whitespace token counts ->
    long-doc chunk split (ceil(n/L) indivisible items) -> per-group
    first-fit-decreasing -> (doc, chunk, group, sequence, offset) rows.
    Item-level output pins the exact assignment, not just fill stats."""
    from cerebro_spark.operators.sampling import pack_sequences
    from cerebro_spark.operators.text import token_count

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return pack_sequences(
        docs, seq_len=_PACK_SEQ_LEN, n_groups=_PACK_GROUPS
    )


_PACK_SEQ_SQL = f"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
  FROM documents
),
items AS (
  SELECT doc_id, CAST(unnest(range(nc)) AS INT) AS chunk_id, n, nc, grp
  FROM (
    SELECT doc_id, n,
           CAST(ceil(n / {_PACK_SEQ_LEN}.0) AS INT) AS nc,
           CAST({_hex2long_sql("md5(CAST(doc_id AS VARCHAR))", 8)}
                % {_PACK_GROUPS} AS INT) AS grp
    FROM t WHERE n > 0
  )
),
sized AS (
  SELECT doc_id, chunk_id, grp,
         CAST(CASE WHEN chunk_id < nc - 1 THEN {_PACK_SEQ_LEN}
                   ELSE n - (nc - 1) * {_PACK_SEQ_LEN} END AS BIGINT)
           AS n_tokens
  FROM items
),
ordered AS (
  SELECT *, row_number() OVER (
    PARTITION BY grp ORDER BY n_tokens DESC, doc_id ASC, chunk_id ASC
  ) AS rn
  FROM sized
),
fold AS (
  SELECT grp, 1 AS i, doc_id, chunk_id, n_tokens,
         [CAST({_PACK_SEQ_LEN} - n_tokens AS BIGINT)] AS bins,
         1 AS seq_id, CAST(0 AS BIGINT) AS off
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT it.grp, f.i + 1, it.doc_id, it.chunk_id, it.n_tokens,
         CASE WHEN p.pos IS NULL OR p.pos = 0
              THEN list_append(f.bins,
                               CAST({_PACK_SEQ_LEN} - it.n_tokens AS BIGINT))
              ELSE f.bins[1:p.pos-1] || [f.bins[p.pos] - it.n_tokens]
                   || f.bins[p.pos+1:] END,
         CASE WHEN p.pos IS NULL OR p.pos = 0 THEN len(f.bins) + 1
              ELSE p.pos END,
         CASE WHEN p.pos IS NULL OR p.pos = 0 THEN CAST(0 AS BIGINT)
              ELSE {_PACK_SEQ_LEN} - f.bins[p.pos] END
  FROM fold f
  JOIN ordered it ON it.grp = f.grp AND it.rn = f.i + 1,
  LATERAL (SELECT list_position(
             list_transform(f.bins, b -> b >= it.n_tokens), true) AS pos) p
)
SELECT doc_id, chunk_id, grp, CAST(seq_id AS INT) AS seq_id,
       off AS offset, n_tokens
FROM fold
"""


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-reweighted (alpha=0.7) domain mixture table."""
    from cerebro_spark.operators.sampling import temperature_mixture_weights

    return temperature_mixture_weights(
        load_table(spark, "documents", sf_dir), domain_col="source", alpha=0.7
    )


_TEMP_MIX_SQL = """
WITH counts AS (
  SELECT source AS domain, CAST(count(*) AS DOUBLE) AS n FROM documents
  GROUP BY 1
),
tot AS (
  SELECT sum(n) AS total, sum(pow(n, 0.7)) AS z FROM counts
)
SELECT domain,
  CAST(n AS BIGINT) AS n_docs,
  round(n / total, 6) AS share,
  round(pow(n, 0.7) / z, 6) AS temp_weight,
  round((pow(n, 0.7) / z) / (n / total), 6) AS boost
FROM counts, tot
"""



QUERIES = {
    "deterministic_sample": q_deterministic_sample,
    "train_val_test": q_train_val_test,
    "domain_guarded_split": q_domain_guarded_split,
    "chunk_documents": q_chunk_documents,
    "redact_pii": q_redact_pii,
    "mixture_sample": q_mixture_sample,
    "pack_tokens": q_pack_tokens,
    "epoch_shuffle": q_epoch_shuffle,
    "packing_efficiency": q_packing_efficiency,
    "temperature_mix": q_temperature_mix,
    "pack_sequences_check": q_pack_sequences_check,
}

ORACLES = {
    "deterministic_sample": _SAMPLE_SQL,
    "train_val_test": _SPLIT_SQL,
    "domain_guarded_split": _DOMAIN_SPLIT_SQL,
    "chunk_documents": _CHUNK_SQL,
    "redact_pii": _REDACT_SQL,
    "mixture_sample": _MIXTURE_SQL,
    "pack_tokens": _PACK_SQL,
    "epoch_shuffle": _EPOCH_SHUFFLE_SQL,
    "packing_efficiency": _PACK_EFF_SQL,
    "temperature_mix": _TEMP_MIX_SQL,
    "pack_sequences_check": _PACK_SEQ_SQL,
}
