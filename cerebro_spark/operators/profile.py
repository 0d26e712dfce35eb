"""Table data-quality profile — the pipeline-health aggregate a training-data
run gates on (null explosions, range drift, cardinality collapse).

One map-side-combinable aggregation pass over the table: per-column null
counts, numeric min/max/avg, timestamp min/max, and exact distinct counts
for the requested key columns.  Flat single-row output with deterministic
``<col>_<stat>`` names, so the result diffs cleanly across runs and feeds
the oracle gate directly.

At 100 TB: everything here is a partial-aggregate shuffle of one row per
partition — except ``distinct_cols``, which shuffles the distinct keys; keep
those to genuinely-needed identifiers (or swap in approx_count_distinct at
the call site when exactness isn't required).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, TimestampType


def data_profile(
    df: DataFrame,
    distinct_cols: list[str] | None = None,
    round_digits: int = 4,
) -> DataFrame:
    """Single-row profile: ``n_rows``, ``<col>_nulls`` for every column,
    ``<col>_min/_max/_avg`` for numerics (avg rounded for cross-engine
    stability), ``<col>_min/_max`` for timestamps, ``<col>_distinct`` for
    ``distinct_cols``."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for f in df.schema.fields:
        c = F.col(f.name)
        aggs.append(F.sum(c.isNull().cast("long")).alias(f"{f.name}_nulls"))
        if isinstance(f.dataType, NumericType):
            aggs.append(F.min(c).alias(f"{f.name}_min"))
            aggs.append(F.max(c).alias(f"{f.name}_max"))
            aggs.append(F.round(F.avg(c), round_digits).alias(f"{f.name}_avg"))
        elif isinstance(f.dataType, TimestampType):
            aggs.append(F.min(c).alias(f"{f.name}_min"))
            aggs.append(F.max(c).alias(f"{f.name}_max"))
    for name in distinct_cols or []:
        aggs.append(F.count_distinct(F.col(name)).alias(f"{name}_distinct"))
    return df.agg(*aggs)


def key_skew_report(
    df: DataFrame,
    key_col: str,
    top: int = 10,
) -> DataFrame:
    """Shuffle-key skew diagnostics: the top heavy hitters of ``key_col``
    with their row share, plus global context (key count, total rows,
    median per-key count) on every row — the before-you-join check that
    tells you whether this key needs salting / AQE skew handling.

    Plan: one per-key count aggregate (map-side combine), one bounded
    top-k (TakeOrderedAndProject via ``top_k_ranked``), two 1-row global
    aggregates broadcast on.  Nothing scales with distinct-key count
    except the count shuffle itself.
    """
    from cerebro_spark.operators.util import top_k_ranked

    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    glob = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.expr("percentile(cnt, 0.5)").alias("__p50"),
    )
    hitters = top_k_ranked(counts, [("cnt", "desc"), ("key", "asc")], k=top)
    return hitters.crossJoin(F.broadcast(glob)).select(
        "rank",
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("total_rows"), 6).alias("share"),
        F.round(F.col("cnt") / F.col("__p50"), 2).alias("x_median"),
        "n_keys",
        "total_rows",
    )


def profile_drift(
    before: DataFrame,
    after: DataFrame,
    rel_threshold: float = 0.2,
) -> list[dict]:
    """Diff two ``data_profile`` rows (e.g. yesterday's vs today's ingest):
    returns one record per shared stat with the relative change and a flag
    when it moved more than ``rel_threshold`` — the cheap schema/content
    drift alarm a scheduled pipeline gates on before training.

    Driver-side by design: profiles are single rows (bounded aggregates),
    so the comparison is metadata-scale no matter how big the tables were.
    Null-count stats compare as rates against ``n_rows`` so the alarm
    doesn't fire just because today ingested more data.
    """
    b = before.first().asDict()
    a = after.first().asDict()
    out: list[dict] = []
    bn, an = b.get("n_rows") or 0, a.get("n_rows") or 0
    for key in sorted(set(b) & set(a)):
        x, y = b[key], a[key]
        if x is None or y is None:
            continue
        if not isinstance(x, (int, float)) or isinstance(x, bool):
            continue
        if key.endswith("_nulls") and bn and an:
            x, y = x / bn, y / an
        if x == y:
            rel = 0.0
        elif x == 0:
            rel = float("inf")
        else:
            rel = abs(y - x) / abs(x)
        out.append(
            {
                "stat": key,
                "before": x,
                "after": y,
                "rel_change": rel,
                "drifted": rel > rel_threshold,
            }
        )
    return out
