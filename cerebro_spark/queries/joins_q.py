"""Oracle-checked queries for the time-series joins (as-of, range) — DuckDB
has native ASOF JOIN, giving an independent reference implementation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.joins import asof_join, range_join


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's most recent purchase at-or-before it
    (the quotes-to-trades shape; union-merge implementation vs DuckDB's
    native ASOF JOIN)."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(clicks, purchases, "ts", by=["user_id"])
    return out.select("event_id", "user_id", "ts", "value", "value_right")


_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts, l.value, r.value AS value_right
FROM (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of with a 1-hour staleness tolerance: matches older than the
    tolerance are nulled (InfluxDB/kdb-style bounded as-of)."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, "ts", by=["user_id"], tolerance_seconds=3600
    )
    return out.select("event_id", "user_id", "ts", "value_right")


_ASOF_TOL_SQL = """
SELECT l.event_id, l.user_id, l.ts,
  CASE WHEN r.ts IS NOT NULL
        AND CAST(floor(epoch(l.ts)) AS BIGINT) - CAST(floor(epoch(r.ts)) AS BIGINT) <= 3600
       THEN r.value END AS value_right
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases within 30 minutes after an error by the same user —
    interval containment via bucketed equi-join (no nested-loop)."""
    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 1800 SECONDS")).alias("end"),
    )
    out = range_join(
        purchases, errors, "ts", "start", "end", by=["user_id"],
        bucket_seconds=1800,
    )
    return out.select("event_id", "error_id", "user_id", "ts")


_RANGE_SQL = """
SELECT p.event_id, e.event_id AS error_id, p.user_id, p.ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL '1800 seconds'
"""


QUERIES = {
    "asof_join": q_asof_join,
    "asof_join_tolerance": q_asof_join_tolerance,
    "range_join": q_range_join,
}

ORACLES = {
    "asof_join": _ASOF_SQL,
    "asof_join_tolerance": _ASOF_TOL_SQL,
    "range_join": _RANGE_SQL,
}


def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """direction='forward': each click joined to the user's NEXT purchase
    at-or-after it (the mirrored union-merge; DuckDB expresses the same
    via ASOF JOIN with l.ts <= r.ts)."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, "ts", by=["user_id"], direction="forward"
    )
    return out.select("event_id", "user_id", "ts", "value_right")


_ASOF_FWD_SQL = """
SELECT l.event_id, l.user_id, l.ts, r.value AS value_right
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase') r
ON l.user_id = r.user_id AND l.ts <= r.ts
"""


def q_asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """direction='nearest': closest purchase either side, exact tie breaks
    backward — pandas merge_asof parity; the oracle composes DuckDB's two
    native ASOF directions with the same tie rule."""
    ev = load_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join(
        clicks, purchases, "ts", by=["user_id"], direction="nearest"
    )
    return out.select("event_id", "user_id", "ts", "value_right")


_ASOF_NEAREST_SQL = """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT l.event_id, r.ts AS bts, r.value AS bval
  FROM l ASOF LEFT JOIN p r ON l.user_id = r.user_id AND l.ts >= r.ts
),
f AS (
  SELECT l.event_id, r.ts AS fts, r.value AS fval
  FROM l ASOF LEFT JOIN p r ON l.user_id = r.user_id AND l.ts <= r.ts
)
SELECT l.event_id, l.user_id, l.ts,
  CASE WHEN fts IS NULL THEN bval
       WHEN bts IS NOT NULL
            AND abs(epoch(l.ts) - epoch(bts)) <= abs(epoch(fts) - epoch(l.ts))
       THEN bval
       ELSE fval END AS value_right
FROM l JOIN b USING (event_id) JOIN f USING (event_id)
"""


QUERIES["asof_join_forward"] = q_asof_join_forward
ORACLES["asof_join_forward"] = _ASOF_FWD_SQL
QUERIES["asof_join_nearest"] = q_asof_join_nearest
ORACLES["asof_join_nearest"] = _ASOF_NEAREST_SQL


def q_fuzzy_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage: near-identical part names (edit distance <= 2) within
    a (brand, first-word) block — the blocked fuzzy join that replaces the
    O(n*m) cross-product at scale.  Plan: shuffle equi-join on the block key
    + codegen'd levenshtein filter; candidate mass is sum of block sizes
    squared (diagnosable the same way as lsh_bucket_stats)."""
    from cerebro_spark.operators.joins import fuzzy_join_blocked
    from cerebro_spark.operators.util import ensure_parallelism

    part = load_table(spark, "part", sf_dir)
    # spread the single-file scan: the blocked join's levenshtein pass runs
    # on the probe side's partitions (measured a 2.2 s one-task stage;
    # no-op on a multi-split scan)
    base = ensure_parallelism(part.select(
        F.col("p_partkey"),
        F.col("p_name"),
        F.col("p_brand"),
        F.split(F.col("p_name"), " ")[0].alias("first_word"),
    ))
    a = base.select(
        F.col("p_partkey").alias("key_a"), F.col("p_name"), "p_brand", "first_word"
    )
    b = base.select(
        F.col("p_partkey").alias("key_b"), F.col("p_name"), "p_brand", "first_word"
    )
    return fuzzy_join_blocked(
        a,
        b,
        text_col="p_name",
        block_cols=["p_brand", "first_word"],
        max_distance=2,
        left_id="key_a",
        right_id="key_b",
        dedup_pairs=True,  # self-join: both sides are `part`
    )


_FUZZY_PAIRS_SQL = """
WITH p AS (
  SELECT p_partkey, p_name, p_brand, string_split(p_name, ' ')[1] AS first_word
  FROM part
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b, a.p_brand, a.first_word,
       CAST(levenshtein(a.p_name, b.p_name) AS INT) AS distance
FROM p a JOIN p b
  ON a.p_brand = b.p_brand AND a.first_word = b.first_word
 AND a.p_partkey < b.p_partkey
WHERE abs(len(a.p_name) - len(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 2
"""

QUERIES["fuzzy_part_pairs"] = q_fuzzy_part_pairs
ORACLES["fuzzy_part_pairs"] = _FUZZY_PAIRS_SQL


def q_fuzzy_block_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-size histogram for the fuzzy join's (brand, first-word)
    blocking — the pre-join skew diagnostic (candidate mass = Σ n·(n−1)/2
    over blocks), gated like lsh_bucket_stats / simhash_bucket_stats."""
    from cerebro_spark.operators.joins import fuzzy_block_stats

    part = load_table(spark, "part", sf_dir).select(
        "p_brand", F.split(F.col("p_name"), " ")[0].alias("first_word")
    )
    return fuzzy_block_stats(part, ["p_brand", "first_word"])


_FUZZY_BLOCK_STATS_SQL = """
WITH sizes AS (
  SELECT p_brand, string_split(p_name, ' ')[1] AS first_word,
         count(*) AS block_size
  FROM part GROUP BY 1, 2
)
SELECT block_size, count(*) AS n_blocks,
  CAST(count(*) * (block_size * (block_size - 1) / 2) AS BIGINT)
    AS candidate_pairs
FROM sizes GROUP BY 1
"""

QUERIES["fuzzy_block_stats"] = q_fuzzy_block_stats
ORACLES["fuzzy_block_stats"] = _FUZZY_BLOCK_STATS_SQL


def q_session_incident_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval×interval overlap join (joins.interval_overlap_join): user
    sessions (30-min-gap islands) × error "incident windows" (error ts
    ±10 min) — which sessions ran during an incident, and how many.  Both
    sides explode to 30-min buckets and equi-join; a pair is emitted once,
    at the bucket of max(start, start) — no inequality join, no distinct.
    Oracle: DuckDB's native inequality (IE) join over the same islands."""
    from pyspark.sql import Window

    from cerebro_spark.operators.joins import interval_overlap_join

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = (
        ev.withColumn(
            "__new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.col("ts").cast("long")).alias("s_start"),
            F.max(F.col("ts").cast("long")).alias("s_end"),
        )
    )
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        (F.col("ts").cast("long") - 600).alias("i_start"),
        (F.col("ts").cast("long") + 600).alias("i_end"),
    )
    pairs = interval_overlap_join(
        sess, incidents, "s_start", "s_end", "i_start", "i_end",
        bucket_seconds=1800,
    )
    return pairs.groupBy("user_id", "session_id").agg(
        F.min("s_start").alias("s_start"),
        F.count(F.lit(1)).alias("n_incidents"),
    )


_SESSION_INCIDENT_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
           OR CAST(floor(epoch(ts)) AS BIGINT)
              - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS session_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM flagged
),
intervals AS (
  SELECT user_id, session_id, min(t) AS s_start, max(t) AS s_end
  FROM sess GROUP BY 1, 2
),
incidents AS (
  SELECT event_id AS incident_id,
    CAST(floor(epoch(ts)) AS BIGINT) - 600 AS i_start,
    CAST(floor(epoch(ts)) AS BIGINT) + 600 AS i_end
  FROM events WHERE event_type = 'error'
)
SELECT s.user_id, s.session_id, min(s.s_start) AS s_start,
  count(*) AS n_incidents
FROM intervals s JOIN incidents i
  ON s.s_start <= i.i_end AND i.i_start <= s.s_end
GROUP BY 1, 2
"""

QUERIES["session_incident_overlap"] = q_session_incident_overlap
ORACLES["session_incident_overlap"] = _SESSION_INCIDENT_SQL


def q_interval_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew histogram for the session×incident overlap join
    (joins.interval_bucket_stats): top-20 buckets by candidate pair mass —
    run before interval_overlap_join to pick the bucket width, same
    contract as lsh_bucket_stats/fuzzy_block_stats."""
    from pyspark.sql import Window

    from cerebro_spark.operators.joins import interval_bucket_stats

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    sess = (
        ev.withColumn(
            "__new", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
        )
        .withColumn(
            "session_id",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.col("ts").cast("long")).alias("s_start"),
            F.max(F.col("ts").cast("long")).alias("s_end"),
        )
    )
    incidents = ev.filter(F.col("event_type") == "error").select(
        (F.col("ts").cast("long") - 600).alias("i_start"),
        (F.col("ts").cast("long") + 600).alias("i_end"),
    )
    return interval_bucket_stats(
        sess, incidents, "s_start", "s_end", "i_start", "i_end",
        bucket_seconds=1800, top=20,
    )


_INTERVAL_BUCKET_STATS_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w IS NULL
           OR CAST(floor(epoch(ts)) AS BIGINT)
              - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id,
    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         AS BIGINT) AS session_id,
    CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM flagged
),
intervals AS (
  SELECT min(t) AS s_start, max(t) AS s_end
  FROM sess GROUP BY user_id, session_id
),
lhs AS (
  SELECT b AS bucket, count(*) AS n_left FROM intervals,
    LATERAL unnest(generate_series(CAST(floor(s_start / 1800.0) AS BIGINT),
                                   CAST(floor(s_end / 1800.0) AS BIGINT))) AS u(b)
  GROUP BY 1
),
incidents AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) - 600 AS i_start,
    CAST(floor(epoch(ts)) AS BIGINT) + 600 AS i_end
  FROM events WHERE event_type = 'error'
),
rhs AS (
  SELECT b AS bucket, count(*) AS n_right FROM incidents,
    LATERAL unnest(generate_series(CAST(floor(i_start / 1800.0) AS BIGINT),
                                   CAST(floor(i_end / 1800.0) AS BIGINT))) AS u(b)
  GROUP BY 1
)
SELECT bucket, n_left, n_right, n_left * n_right AS pair_mass
FROM lhs JOIN rhs USING (bucket)
ORDER BY pair_mass DESC, bucket ASC
LIMIT 20
"""

QUERIES["interval_bucket_stats"] = q_interval_bucket_stats
ORACLES["interval_bucket_stats"] = _INTERVAL_BUCKET_STATS_SQL


def _hexslice_sql(hexexpr: str, offset: int) -> str:
    """DuckDB BIGINT from 8 hex chars of ``hexexpr`` starting at 1-based
    ``offset`` (the 32-bit md5 slice the Bloom operators use)."""
    terms = [
        f"CAST((strpos('0123456789abcdef', substr({hexexpr}, {offset + j}, 1)) - 1) AS BIGINT) * {16 ** (7 - j)}"
        for j in range(8)
    ]
    return "(" + " + ".join(terms) + ")"


def q_bloom_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime semi-join pruning (joins.bloom_build /
    bloom_probe): build an 8 KB filter over HIGH-VALUE purchase users
    (value > 150 — a selective build side, so the filter genuinely
    prunes), probe the
    distinct view users in a zero-shuffle projection, and emit the audit
    row — probe count, bloom-pass count, exact semi-join truth, the
    true∧pass count (== truth ⟺ no false negatives, the Bloom guarantee),
    and the false-positive count.  The oracle reconstructs the EXACT word
    values bit-for-bit (engine-portable md5 slice positions), so the hash
    gate checks the filter itself, not just the counts."""
    from cerebro_spark.operators.joins import (
        bloom_build,
        bloom_probe,
        bloom_words_literal,
    )

    ev = load_table(spark, "events", sf_dir)
    build = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("value") > 150)
    )
    probe = (
        ev.filter(F.col("event_type") == "view")
        .select("user_id")
        .filter(F.col("user_id").isNotNull())
        .distinct()
    )
    words = bloom_words_literal(bloom_build(build, "user_id"), 1024)
    truth = (
        ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 150))
        .select(F.col("user_id").alias("__bk"))
        .filter(F.col("__bk").isNotNull())
        .distinct()
    )
    annotated = bloom_probe(probe, "user_id", words).join(
        truth, probe.user_id == truth.__bk, "left"
    )
    return annotated.agg(
        F.count(F.lit(1)).alias("n_probe"),
        F.sum(F.col("bloom_pass").cast("long")).alias("n_pass"),
        F.sum(F.col("__bk").isNotNull().cast("long")).alias("n_true"),
        F.sum(
            (F.col("bloom_pass") & F.col("__bk").isNotNull()).cast("long")
        ).alias("n_true_pass"),
        F.sum(
            (F.col("bloom_pass") & F.col("__bk").isNull()).cast("long")
        ).alias("n_false_pos"),
    )


_BLOOM_MD5 = "md5(CAST(k AS VARCHAR))"
_BLOOM_SEMIJOIN_SQL = f"""
WITH bk AS (
  SELECT DISTINCT user_id AS k FROM events
  WHERE event_type = 'purchase' AND value > 150 AND user_id IS NOT NULL
),
pk AS (
  SELECT DISTINCT user_id AS k FROM events
  WHERE event_type = 'view' AND user_id IS NOT NULL
),
bpos AS (
  SELECT ({_hexslice_sql(_BLOOM_MD5, 1)}) % 63488 AS p FROM bk
  UNION ALL
  SELECT ({_hexslice_sql(_BLOOM_MD5, 9)}) % 63488 FROM bk
  UNION ALL
  SELECT ({_hexslice_sql(_BLOOM_MD5, 17)}) % 63488 FROM bk
),
words AS (
  SELECT p // 62 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(p % 62 AS INTEGER)) AS bits
  FROM bpos GROUP BY 1
),
ppos AS (
  SELECT k, ({_hexslice_sql(_BLOOM_MD5, 1)}) % 63488 AS p FROM pk
  UNION ALL
  SELECT k, ({_hexslice_sql(_BLOOM_MD5, 9)}) % 63488 FROM pk
  UNION ALL
  SELECT k, ({_hexslice_sql(_BLOOM_MD5, 17)}) % 63488 FROM pk
),
probe AS (
  SELECT ppos.k,
    count(*) FILTER (
      WHERE (coalesce(w.bits, 0)
             & (CAST(1 AS BIGINT) << CAST(p % 62 AS INTEGER))) <> 0
    ) = 3 AS pass,
    max(CASE WHEN bk.k IS NOT NULL THEN 1 ELSE 0 END) = 1 AS is_true
  FROM ppos
  LEFT JOIN words w ON (p // 62) = w.word
  LEFT JOIN bk ON ppos.k = bk.k
  GROUP BY ppos.k
)
SELECT
  CAST(count(*) AS BIGINT) AS n_probe,
  CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
  CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
  CAST(sum(CASE WHEN pass AND is_true THEN 1 ELSE 0 END) AS BIGINT)
    AS n_true_pass,
  CAST(sum(CASE WHEN pass AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT)
    AS n_false_pos
FROM probe
"""

QUERIES["bloom_semijoin"] = q_bloom_semijoin
ORACLES["bloom_semijoin"] = _BLOOM_SEMIJOIN_SQL


def q_spatial_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial radius join (joins.spatial_grid_join):
    customer/supplier sites on a synthetic 100×100 plane (coordinates
    derived deterministically from the keys — the tables carry no geo
    columns), all pairs within distance 3 — cell + 3×3-neighborhood
    equi-join, exact IEEE distance predicate (operator docstring).  The
    oracle is the brute-force cross join with the same predicate."""
    from cerebro_spark.operators.joins import spatial_grid_join

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        (((F.col("c_custkey") * 37) % 1000).cast("double") / 10.0).alias("x"),
        (((F.col("c_custkey") * 61) % 1000).cast("double") / 10.0).alias("y"),
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey",
        (((F.col("s_suppkey") * 43) % 1000).cast("double") / 10.0).alias("x"),
        (((F.col("s_suppkey") * 53) % 1000).cast("double") / 10.0).alias("y"),
    )
    return spatial_grid_join(cust, supp, "x", "y", 3.0).select(
        "c_custkey", "s_suppkey", "dist"
    )


_SPATIAL_PAIRS_SQL = """
WITH c AS (
  SELECT c_custkey,
         CAST((c_custkey * 37) % 1000 AS DOUBLE) / 10.0 AS x,
         CAST((c_custkey * 61) % 1000 AS DOUBLE) / 10.0 AS y
  FROM customer
),
s AS (
  SELECT s_suppkey,
         CAST((s_suppkey * 43) % 1000 AS DOUBLE) / 10.0 AS x,
         CAST((s_suppkey * 53) % 1000 AS DOUBLE) / 10.0 AS y
  FROM supplier
)
SELECT c_custkey, s_suppkey,
       round(sqrt((c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y)), 6)
         AS dist
FROM c CROSS JOIN s
WHERE (c.x - s.x) * (c.x - s.x) + (c.y - s.y) * (c.y - s.y) <= 9.0
"""

QUERIES["spatial_pairs"] = q_spatial_pairs
ORACLES["spatial_pairs"] = _SPATIAL_PAIRS_SQL


def q_haversine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle radius join (joins.haversine_grid_join): customer/
    supplier sites at synthetic lat/lon (derived deterministically from
    the keys — the tables carry no geo columns), all pairs within 250 km
    — lat-band + modular-lon-band equi-join with the exact haversine
    predicate; the oracle is the brute-force cross join with the same
    IEEE chain."""
    from cerebro_spark.operators.joins import haversine_grid_join

    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        (((F.col("c_custkey") * 37) % 1200).cast("double") / 10.0 - 60.0)
        .alias("lat"),
        (((F.col("c_custkey") * 61) % 3600).cast("double") / 10.0 - 180.0)
        .alias("lon"),
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey",
        (((F.col("s_suppkey") * 43) % 1200).cast("double") / 10.0 - 60.0)
        .alias("lat"),
        (((F.col("s_suppkey") * 53) % 3600).cast("double") / 10.0 - 180.0)
        .alias("lon"),
    )
    return haversine_grid_join(
        cust, supp, "lat", "lon", radius_km=250.0
    ).select("c_custkey", "s_suppkey", "dist_km")


_HAVERSINE_PAIRS_SQL = """
WITH c AS (
  SELECT c_custkey,
         CAST((c_custkey * 37) % 1200 AS DOUBLE) / 10.0 - 60.0 AS lat,
         CAST((c_custkey * 61) % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
  FROM customer
),
s AS (
  SELECT s_suppkey,
         CAST((s_suppkey * 43) % 1200 AS DOUBLE) / 10.0 - 60.0 AS lat,
         CAST((s_suppkey * 53) % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon
  FROM supplier
),
p AS (
  SELECT c_custkey, s_suppkey,
         sin(radians(s.lat - c.lat) / 2) AS sp,
         sin(radians(s.lon - c.lon) / 2) AS sl,
         cos(radians(c.lat)) AS c1,
         cos(radians(s.lat)) AS c2
  FROM c CROSS JOIN s
),
d AS (
  SELECT c_custkey, s_suppkey,
         2 * 6371.0088 * asin(least(1.0, sqrt(sp * sp + c1 * c2 * (sl * sl))))
           AS dkm
  FROM p
)
SELECT c_custkey, s_suppkey, round(dkm, 3) AS dist_km
FROM d WHERE dkm <= 250.0
"""

QUERIES["haversine_pairs"] = q_haversine_pairs
ORACLES["haversine_pairs"] = _HAVERSINE_PAIRS_SQL
