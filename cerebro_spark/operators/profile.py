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


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table — the dataset
    versioning primitive ("what changed between yesterday's corpus and
    today's"): returns ``(*keys, status)`` with status ∈ {'added',
    'removed', 'changed'}.  Unchanged rows — the overwhelming bulk of any
    real snapshot pair — are dropped immediately after the join, so only
    the delta flows downstream.

    ``compare_cols`` defaults to every shared non-key column.  Value
    comparison is a null-safe struct equality (``eqNullSafe`` — NULL = NULL
    counts as unchanged), which a SQL oracle expresses as an OR-chain of
    ``IS DISTINCT FROM`` per column.

    Scale shape: ONE full-outer shuffle join on the key columns — the
    irreducible cost of an exact diff.  At 100 TB, write both snapshots
    bucketed on ``keys`` (io.write_bucketed) and the exchange disappears;
    the compared values ride the shuffle as a single packed struct column
    rather than N separate ones.

    Reference parity: no reference counterpart — data-management extension
    next to data_profile / expire_partitions.
    """
    if compare_cols is None:
        shared = [f.name for f in old.schema.fields if f.name in new.columns]
        compare_cols = [c for c in shared if c not in keys]
    oc = old.select(
        *keys,
        F.struct(*[F.col(c) for c in compare_cols]).alias("__ov"),
        F.lit(1).alias("__op"),
    )
    nc = new.select(
        *keys,
        F.struct(*[F.col(c) for c in compare_cols]).alias("__nv"),
        F.lit(1).alias("__np"),
    )
    j = oc.join(nc, keys, "full_outer")
    status = (
        F.when(F.col("__op").isNull(), F.lit("added"))
        .when(F.col("__np").isNull(), F.lit("removed"))
        .when(~F.col("__ov").eqNullSafe(F.col("__nv")), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(*keys, status.alias("status"))
        .filter(F.col("status") != "unchanged")
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list,
    k: int = 5,
) -> DataFrame:
    """k-anonymity risk summary over a set of quasi-identifier columns —
    the governance check before releasing/training on user-adjacent data:
    one row with ``n_rows``, ``n_groups`` (equivalence classes),
    ``n_risky_groups`` / ``n_risky_rows`` (classes smaller than ``k``,
    whose members are re-identifiable), and ``risky_row_share``.

    ``quasi_cols`` accepts column names or Column expressions (bucket your
    continuous quasi-identifiers — raw floats make every row its own
    class, which is true but useless).

    Plan: one combinable groupBy over the quasi-identifier tuple, then one
    1-row aggregate over the class sizes — class-count-sized state, never
    row-sized.  The share is a single division of exact counts, so the
    summary is engine-exact.

    Reference parity: no reference counterpart — governance extension next
    to redact_pii.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in quasi_cols]
    classes = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("__sz"))
    return classes.agg(
        F.sum("__sz").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("__sz") < k).cast("long")).alias("n_risky_groups"),
        F.sum(F.when(F.col("__sz") < k, F.col("__sz")).otherwise(F.lit(0))).alias(
            "n_risky_rows"
        ),
    ).select(
        "n_rows",
        "n_groups",
        "n_risky_groups",
        "n_risky_rows",
        (F.lit(1.0) * F.col("n_risky_rows") / F.col("n_rows")).alias(
            "risky_row_share"
        ),
    )


def scd2_collapse(
    df: DataFrame,
    key_cols: list,
    attr_cols: list,
    ts_col: str = "ts",
    tiebreak_cols: list | None = None,
) -> DataFrame:
    """Slowly-changing-dimension TYPE-2 history build: collapse an event
    log into attribute-version intervals.

    For each key, rows are ordered by ``(ts, *tiebreak_cols)`` and
    consecutive runs with identical ``attr_cols`` collapse into one
    interval row: the key, the attributes, ``valid_from`` (run's first
    ts), ``valid_to`` (next run's valid_from; NULL on the open current
    run), ``n_events`` (run size) and ``is_current``.

    Same-timestamp rows are made deterministic by the caller-supplied
    ``tiebreak_cols`` (e.g. a unique event id) — without one, run
    boundaries at ts collisions would be partitioning-dependent.

    Plan: two windows over the SAME (key × order) sort — lag to mark run
    starts + running sum to number runs — so Catalyst plans ONE sort; then
    a combinable groupBy per run and one more lag-window over the
    run-count-sized frame for valid_to.  Everything partitions by key:
    at 100 TB this is millions of independent small partitions, no global
    window.

    Reference parity: no reference counterpart (the reference's InfluxDB
    sink keeps raw points) — warehouse-modeling extension next to
    snapshot_diff.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    # eqNullSafe never returns NULL: the first row's NULL lag struct
    # compares false, so its negation already marks a run start
    changed = ~F.struct(*attr_cols).eqNullSafe(
        F.lag(F.struct(*attr_cols)).over(w)
    )
    runs = df.select(
        *key_cols,
        *attr_cols,
        F.col(ts_col),
        F.sum(changed.cast("long")).over(w).alias("__run"),
    )
    iv = runs.groupBy(*key_cols, "__run", *attr_cols).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(*key_cols).orderBy("__run")
    return iv.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )


def chi2_independence(
    df: DataFrame,
    col_a,
    col_b,
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — returns ONE row ``(chi2, dof, n, cramers_v)``.

    ``col_a`` / ``col_b`` accept names or Column expressions (bucket
    continuous columns first).  Rows with a NULL in either column are
    EXCLUDED up front (the standard complete-case chi²): a NULL category
    would silently corrupt the statistic otherwise — the grid equi-join
    never matches NULL keys, so NULL cells' observed counts would read 0
    while their mass stayed in ``n`` and the marginals, and
    ``count_distinct`` excludes NULL so ``dof`` would disagree with the
    grid actually summed.  The statistic sums ``(o − e)² / e`` over
    the FULL |A|×|B| contingency grid — zero-observation cells contribute
    their full expected mass ``e`` (dropping them understates the
    statistic), so the grid is materialized as a crossJoin of the two
    bounded category frames and left-joined with the observed counts.

    Cross-engine determinism: every input to a term is an exact integer
    (cell count, row/col totals, grand total); ``e = ra·cb / n`` and the
    term are fixed IEEE op chains; each term is quantized to a 1e-6
    BIGINT and summed exactly; Cramér's V uses sqrt, which IEEE 754
    requires to be correctly rounded — all engine-exact.

    Scale shape: one combinable groupBy to the contingency table
    (state = |A|×|B| cells, independent of row count), two category-sized
    marginal aggregates, the bounded-grid crossJoin, one 1-row reduce.

    Reference parity: no reference counterpart — statistical-profiling
    extension next to ks_drift/psi_drift (driver brief).
    """
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    cells = (
        df.select(a.alias("__a"), b.alias("__b"))
        .filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    ra = cells.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    cb = cells.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    grid = ra.crossJoin(cb)  # bounded: |A| x |B| category combinations
    full = grid.join(cells, ["__a", "__b"], "left").select(
        "__a",
        "__b",
        "__ra",
        "__cb",
        F.coalesce("__o", F.lit(0)).alias("__o"),
    )
    tot = cells.agg(
        F.sum("__o").alias("__n"),
        F.count_distinct("__a").alias("__r"),
        F.count_distinct("__b").alias("__c"),
    )
    e = (F.col("__ra") * F.col("__cb")).cast("double") / F.col("__n")
    term = (F.col("__o") - e) * (F.col("__o") - e) / e
    scored = full.crossJoin(F.broadcast(tot)).select(
        F.floor(term * F.lit(1.0e6) + F.lit(0.5)).cast("long").alias("__t6"),
        "__n",
        "__r",
        "__c",
    )
    return scored.groupBy("__n", "__r", "__c").agg(
        (F.sum("__t6") / F.lit(1.0e6)).alias("chi2")
    ).select(
        "chi2",
        ((F.col("__r") - 1) * (F.col("__c") - 1)).cast("long").alias("dof"),
        F.col("__n").alias("n"),
        F.sqrt(
            F.col("chi2")
            / (
                F.col("__n")
                * F.least(F.col("__r") - 1, F.col("__c") - 1).cast("double")
            )
        ).alias("cramers_v"),
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    key_col: str,
    n_buckets: int = 1024,
) -> DataFrame:
    """Gini coefficient of an exact-integer value distribution — one row
    ``(gini, n, total)``.  0 = perfectly equal, →1 = one key holds all
    the mass.  The inequality/concentration summary for revenue-share,
    token-budget and corpus-composition audits.

    Uses the rank formula ``G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n`` over values
    sorted ascending.  The global rank is computed WITHOUT a global
    window: values are range-bucketed (min/max from a 1-row broadcast),
    per-bucket counts give cumulative offsets over the n_buckets-sized
    frame, and ``rank = bucket_offset + row_number within bucket`` — the
    two-level distributed-ranking pattern (same family as the keyless
    as-of join's bucketed carry).  Each bucket's window is bounded by its
    share of rows; a pathologically skewed value distribution concentrates
    one bucket (documented bound — raise ``n_buckets`` for heavy skew).

    Determinism: ``value_col`` must already be an exact integer (cents,
    token counts); ranks/sums are then exact BIGINTs and the final
    formula is a fixed chain of single IEEE ops, mirrored in the oracle.
    Overflow bound (the REAL constraint, soak-measured): ``Σ i·xᵢ ≈
    n²·mean/2`` must stay under 2^63 ≈ 9.2e18 — e.g. 10M keys support a
    mean value up to ~1.8e5 units, 1M keys up to ~1.8e7.  For bigger
    populations rescale the unit (Gini is scale-invariant: dividing
    every value by a constant before quantization leaves it unchanged
    up to the quantization error of the division).
    Ties order by ``key_col`` — any tie order gives the same Σ i·xᵢ for
    equal x, so the tiebreak is for plan stability, not the statistic.

    Reference parity: no reference counterpart — statistical-profiling
    extension (driver brief).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    vals = df.select(v.alias("__v"), F.col(key_col).alias("__k"))
    span = vals.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    b = vals.crossJoin(F.broadcast(span)).select(
        "__v",
        "__k",
        F.when(
            F.col("__hi") > F.col("__lo"),
            ((F.col("__v") - F.col("__lo")) * n_buckets)
            / (F.col("__hi") - F.col("__lo") + 1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__b"),
    )
    bcounts = b.groupBy("__b").agg(F.count(F.lit(1)).alias("__c"))
    wb = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
    # n_buckets-sized frame: the keyless window is bounded by construction
    offsets = bcounts.select(
        "__b", F.coalesce(F.sum("__c").over(wb), F.lit(0)).alias("__off")
    )
    ww = Window.partitionBy("__b").orderBy("__v", "__k")
    ranked = (
        b.join(F.broadcast(offsets), "__b")
        .select(
            "__v",
            (F.col("__off") + F.row_number().over(ww)).cast("long").alias("__i"),
        )
    )
    agg = ranked.agg(
        F.sum("__v").alias("__s0"),
        F.sum(F.col("__i") * F.col("__v")).alias("__s1"),
        F.count(F.lit(1)).alias("__n"),
    )
    return agg.select(
        (
            (F.lit(2.0) * F.col("__s1"))
            / (F.col("__s0").cast("double") * F.col("__n"))
            - (F.col("__n") + 1).cast("double") / F.col("__n")
        ).alias("gini"),
        F.col("__n").alias("n"),
        F.col("__s0").alias("total"),
    )


def moments_profile(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
) -> DataFrame:
    """Per-key distribution moments — ``(keys…, n, mean, var_pop,
    skewness, kurtosis)`` — with ENGINE-EXACT values, unlike
    ``F.skewness``/``F.kurtosis`` whose one-pass float accumulation is
    summation-order-dependent.

    Two passes: the exact 1e-6 fixed-point mean first, then per-row
    central deviations ``d = value − mean`` (a deterministic double since
    the mean is) raised to powers and quantized to BIGINTs at
    power-matched scales (d²·1e6, d³·1e3, d⁴·1e0 — coarser for higher
    powers so the per-row terms stay far from 2^63; bound: |d| ≤ ~500
    and ≤ ~1e7 rows/key at these scales, shrink the factors for wilder
    data).  Exact integer sums → every downstream op is a fixed chain of
    single IEEE ops (one sqrt, IEEE-correctly-rounded), mirrored by the
    SQL oracle.

    Plan: two combinable groupBys over the fact table with a broadcast
    keyed-mean join between them — the same two-pass shape as ks_drift's
    span join.  skewness = m3/(m2·√m2), kurtosis = m4/m2² (population
    forms, Fisher −3 NOT applied).

    Reference parity: no reference counterpart — statistical-profiling
    extension next to chi2_independence/gini (driver brief).
    """
    keys = keys or []
    v = F.col(value_col).cast("double")
    q = F.floor(v * F.lit(1.0e6) + F.lit(0.5)).cast("long")
    base = df.select(*keys, v.alias("__v"), q.alias("__q"))
    means = base.groupBy(*keys).agg(
        ((F.sum("__q").cast("double") / F.count(F.lit(1))) / F.lit(1.0e6)).alias(
            "__mean"
        )
    )
    if keys:
        d0 = base.join(F.broadcast(means), on=keys)
    else:
        d0 = base.crossJoin(F.broadcast(means))
    d = F.col("__v") - F.col("__mean")
    terms = d0.select(
        *keys,
        F.col("__mean"),
        F.floor(d * d * F.lit(1.0e6) + F.lit(0.5)).cast("long").alias("__t2"),
        F.floor(d * d * d * F.lit(1.0e3) + F.lit(0.5)).cast("long").alias("__t3"),
        F.floor(d * d * d * d + F.lit(0.5)).cast("long").alias("__t4"),
    )
    agg = terms.groupBy(*keys, "__mean").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__t2").alias("__s2"),
        F.sum("__t3").alias("__s3"),
        F.sum("__t4").alias("__s4"),
    )
    m2 = (F.col("__s2").cast("double") / F.col("n")) / F.lit(1.0e6)
    m3 = (F.col("__s3").cast("double") / F.col("n")) / F.lit(1.0e3)
    m4 = F.col("__s4").cast("double") / F.col("n")
    return agg.select(
        *keys,
        F.col("n"),
        F.col("__mean").alias("mean"),
        m2.alias("var_pop"),
        (m3 / (m2 * F.sqrt(m2))).alias("skewness"),
        (m4 / (m2 * m2)).alias("kurtosis"),
    )


#: Poisson(1) inverse-CDF thresholds on a uniform integer in [0, 1e6):
#: u < _POISSON_T[k]  ⇒  weight k (w = 8 beyond the table, cum P ≈ 1-1e-5).
#: Shared literal constants with the SQL oracle — floor(cum_pmf * 1e6).
POISSON1_THRESHOLDS = (
    367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989,
)


def poisson_bootstrap_weight(id_col: "F.Column", replicate: "F.Column") -> "F.Column":
    """Deterministic Poisson(1) bootstrap weight for (row, replicate):
    u = md5(id:replicate) mod 1e6 → inverse-CDF lookup.  The standard
    resampling trick at data-parallel scale (a true n-out-of-n resample
    needs global coordination; per-row independent Poisson(1) weights
    approximate it with ZERO coordination — Chamandy et al. 2012,
    "Estimating Uncertainty for Massive Data Streams", Google TR) — and
    hash-determinism makes every replicate retry-stable and
    engine-reproducible, like every sampler in this package."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", id_col.cast("string"),
                                  replicate.cast("string"))), 1, 8),
            16, 10,
        ).cast("long") % 1_000_000
    )
    w = F.lit(8)
    for k in range(len(POISSON1_THRESHOLDS) - 1, -1, -1):
        w = F.when(u < POISSON1_THRESHOLDS[k], k).otherwise(w)
    return w


def bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    b: int = 100,
    scale: int = 10_000,
) -> DataFrame:
    """Poisson-bootstrap confidence interval for ``mean(value_col)``:
    ``(n, b, mean, ci_lo, ci_hi)`` in one row, every value engine-exact.

    Each of the ``b`` replicates reweights every row by an independent
    hash-deterministic Poisson(1) draw; the replicate mean is an exact
    integer ratio (values fixed-point-quantized at ``scale``), and the CI
    is the percentile bootstrap with exact-rank selection (ranks
    ⌊0.025·b⌋+1 and b−⌊0.025·b⌋ of the sorted replicate means — no
    interpolation, so both engines pick the same two doubles).

    Plan: explode ``b`` replicate ids per row (map-side, no shuffle), one
    combinable ``groupBy(replicate)`` → b rows, then a b-row global sort —
    bounded by the replicate count, never by data (allowlisted like the
    other sketch-sized windows).  Overflow bound: Σ w·q per replicate must
    stay under 2^63 — w ≤ 8, so |value|·scale·n_rows ≲ 1e18 (at scale=1e4:
    ~2e10 rows of |value|≤500 per replicate; shrink ``scale`` for wilder
    data).

    CLUSTER bootstrap for free: pass the grouping key (e.g. user_id) as
    ``id_col`` — the weight is a pure function of (id, replicate), so all
    of a unit's rows share one draw per replicate, which is exactly the
    block/cluster bootstrap the within-unit correlation of event data
    demands (a row-level bootstrap understates the variance there).
    """
    from pyspark.sql import Window

    from cerebro_spark.operators.util import ensure_parallelism

    q = F.floor(F.col(value_col).cast("double") * scale + F.lit(0.5)).cast("long")
    # the b-way replicate explode + hash-weight chain + partial aggregate
    # all run on the scan's partitions — spread a sub-split input first
    # (measured 3.4 s single-task -> parallel; no-op on a multi-split scan)
    base = ensure_parallelism(
        df.filter(F.col(value_col).isNotNull()).select(
            F.col(id_col).alias("__id"), q.alias("__q")
        )
    )
    rep = base.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(b - 1))))
    w = poisson_bootstrap_weight(F.col("__id"), F.col("r"))
    reps = rep.groupBy("r").agg(
        F.sum(w.cast("long") * F.col("__q")).alias("__s"),
        F.sum(w.cast("long")).alias("__c"),
    )
    means = reps.select(
        "r",
        F.when(F.col("__c") > 0,
               F.col("__s").cast("double") / (F.lit(float(scale)) * F.col("__c"))
               ).alias("__m"),
    )
    lo_rank = b // 40 + 1          # floor(0.025 b) + 1
    hi_rank = b - b // 40
    # b rows total: the global window is replicate-count-sized, not data-sized
    ranked = means.withColumn(
        "__rk",
        F.row_number().over(
            Window.orderBy(F.col("__m").asc_nulls_last(), F.col("r").asc())
        ),
    )
    ci = ranked.agg(
        F.max(F.when(F.col("__rk") == lo_rank, F.col("__m"))).alias("ci_lo"),
        F.max(F.when(F.col("__rk") == hi_rank, F.col("__m"))).alias("ci_hi"),
    )
    point = base.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("__q").cast("double") / (F.lit(float(scale)) * F.count(F.lit(1))))
        .alias("mean"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        "n", F.lit(b).alias("b"), "mean", "ci_lo", "ci_hi"
    )


def cuped_lift(
    per_unit: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    variant_col: str = "variant",
    scale: int = 1,
) -> DataFrame:
    """CUPED variance-reduced A/B lift (Deng, Xu, Kohavi & Walker,
    WSDM'13): given one row per experiment unit with integer fixed-point
    covariate ``x`` (pre-period metric), metric ``y`` and a 0/1 variant,
    emit ``(n, n_a, n_b, theta, var_reduction, diff_raw, diff_cuped)``.

    θ = cov(X,Y)/var(X), ρ² = the variance-reduction share, and the
    adjusted lift is (Ȳ_b − θX̄_b) − (Ȳ_a − θX̄_a); X̄/Ȳ are divided by
    ``scale`` to undo the caller's fixed-point quantization.  All sums are
    exact BIGINTs; the θ/ρ² chain leaves integers for double right before
    the products (exact through 2^53, identically IEEE-rounded past it in
    any engine).  Degenerate var(X)=0 or an empty arm emits NULLs, never a
    crash.

    Plan: ONE combinable 1-row aggregate over the per-unit frame —
    uncertainty math costs nothing at 100 TB once the per-unit groupBy
    (the caller's) is paid.  Overflow bound: Σx², Σxy must stay under
    2^63 — at scale=100 that's ~1e5 units of per-unit mass ≲ 1e5 (shrink
    ``scale`` for wilder metrics).
    """
    x, y = F.col(x_col), F.col(y_col)
    v = F.col(variant_col)
    agg = per_unit.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"), F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
        F.sum(F.when(v == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(v == 0, x).otherwise(0)).alias("sx_a"),
        F.sum(F.when(v == 0, y).otherwise(0)).alias("sy_a"),
        F.sum(F.when(v == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(v == 1, x).otherwise(0)).alias("sx_b"),
        F.sum(F.when(v == 1, y).otherwise(0)).alias("sy_b"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    cov_n = d("n") * d("sxy") - d("sx") * d("sy")      # n²·cov(X,Y)
    varx_n = d("n") * d("sxx") - d("sx") * d("sx")     # n²·var(X)
    vary_n = d("n") * d("syy") - d("sy") * d("sy")     # n²·var(Y)
    theta = F.when(varx_n > 0, cov_n / varx_n)
    mean = lambda s, n: F.when(F.col(n) > 0, d(s) / (float(scale) * d(n)))  # noqa: E731
    adj = lambda s_y, s_x, n: mean(s_y, n) - theta * mean(s_x, n)  # noqa: E731
    return agg.select(
        "n", "n_a", "n_b",
        theta.alias("theta"),
        F.when((varx_n > 0) & (vary_n > 0),
               (cov_n / varx_n) * (cov_n / vary_n)).alias("var_reduction"),
        (mean("sy_b", "n_b") - mean("sy_a", "n_a")).alias("diff_raw"),
        (adj("sy_b", "sx_b", "n_b") - adj("sy_a", "sx_a", "n_a"))
        .alias("diff_cuped"),
    )


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic scorer: per equal-width
    score bin, ``(bin, n, conf, acc, gap, gap_num)`` where conf is the mean
    predicted score, acc the empirical positive rate and gap = acc − conf
    (the miscalibration the diagram plots; ECE = Σ n_b·|gap_b| / N).

    Engine-exact: scores are e6-quantized, so conf = S/(1e6·n) and
    gap share the EXACT integer numerator ``gap_num = 1e6·c − S`` — any
    engine binning and summing the same integers reproduces every double
    via one division.  ``expected_calibration_error`` folds the same
    numerators into the exact scalar ECE.

    Plan: one combinable groupBy over ≤ ``bins`` groups — calibration
    monitoring is free at any scale once the scan is paid.
    """
    s = F.col(score_col).cast("double")
    q = F.floor(s * 1_000_000 + F.lit(0.5)).cast("long")
    b = F.least(F.floor(s * bins).cast("int"), F.lit(bins - 1))
    lab = F.col(label_col).cast("int").cast("long")
    agg = df.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("__s"),
        F.sum(lab).alias("__c"),
    )
    return agg.select(
        "bin", "n",
        (F.col("__s").cast("double") / (F.lit(1e6) * F.col("n"))).alias("conf"),
        (F.col("__c").cast("double") / F.col("n")).alias("acc"),
        ((F.lit(1_000_000) * F.col("__c") - F.col("__s")).cast("double")
         / (F.lit(1e6) * F.col("n"))).alias("gap"),
        (F.lit(1_000_000) * F.col("__c") - F.col("__s")).alias("gap_num"),
    )


def expected_calibration_error(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Exact scalar ECE from :func:`calibration_bins`' integer numerators:
    ECE = Σ_b |1e6·c_b − S_b| / (1e6·N) — the absolute sum is over exact
    BIGINTs, so the result is ORDER-INDEPENDENT and engine-exact (a naive
    Σ n_b·|gap_b|/N of doubles is neither).  One row: (n, bins, ece)."""
    binned = calibration_bins(df, score_col, label_col, bins)
    return binned.agg(
        F.sum("n").alias("n"),
        F.lit(bins).alias("bins"),
        (F.sum(F.abs(F.col("gap_num"))).cast("double")
         / (F.lit(1e6) * F.sum("n"))).alias("ece"),
    )


def winsorized_mean(
    df: DataFrame,
    value_col: str,
    keys: list[str] | None = None,
    lo_num: int = 5,
    hi_num: int = 95,
    den: int = 100,
    scale: int = 100,
) -> DataFrame:
    """Per-key winsorized mean — the robust metric that survives the fat
    tails raw ``avg`` drowns in: values below the lo-quantile are clamped
    up to it, above the hi-quantile clamped down, then averaged.

    EXACT at any scale via a value-grid histogram instead of a per-key
    sort: values quantize to ``scale`` fixed-point, one combinable
    ``groupBy(keys, grid_value)``, a cumulative window over the GRID (its
    row count is bounded by value-span·scale — the data volume never
    passes through a window), exact-rank quantile picks
    (smallest grid value with cum ≥ ⌈p·n⌉, integer arithmetic — no float
    ceil, no interpolation), and an exact integer clamp-sum.  Output per
    key: ``(keys…, n, p_lo, p_hi, win_mean, raw_mean)``.

    Quantile fractions are RATIONALS (lo_num/den, hi_num/den) so the rank
    computation stays in BIGINTs — a float ``ceil(0.05·n)`` diverges
    between engines when the product lands on an exact integer.
    """
    from pyspark.sql import Window

    keys = keys or []
    v = F.col(value_col).cast("double")
    q = F.floor(v * scale + F.lit(0.5)).cast("long")
    grid = (
        df.filter(v.isNotNull())
        .groupBy(*keys, q.alias("__q"))
        .agg(F.count(F.lit(1)).alias("__c"), F.sum(q).alias("__s"))
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__q")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    grid = grid.withColumn("__cum", F.sum("__c").over(w))
    totals = grid.groupBy(*keys).agg(
        F.sum("__c").alias("__n"), F.sum("__s").alias("__raw")
    )
    g = grid.join(totals, on=keys) if keys else grid.crossJoin(
        F.broadcast(totals)
    )
    # exact-rank targets in integers: ceil(p*n) = (p_num*n + den - 1) div den
    lo_rank = F.floor((F.lit(lo_num) * F.col("__n") + (den - 1)) / den).cast("long")
    hi_rank = F.floor((F.lit(hi_num) * F.col("__n") + (den - 1)) / den).cast("long")
    bounds = g.groupBy(*keys).agg(
        F.min(F.when(F.col("__cum") >= lo_rank, F.col("__q"))).alias("__lo"),
        F.min(F.when(F.col("__cum") >= hi_rank, F.col("__q"))).alias("__hi"),
        F.first("__n").alias("n"),
        F.first("__raw").alias("__rawsum"),
    )
    gb = grid.join(bounds, on=keys) if keys else grid.crossJoin(
        F.broadcast(bounds)
    )
    clamped = F.greatest(F.least(F.col("__q"), F.col("__hi")), F.col("__lo"))
    out = gb.groupBy(*keys).agg(
        F.first("n").alias("n"),
        (F.first("__lo").cast("double") / scale).alias("p_lo"),
        (F.first("__hi").cast("double") / scale).alias("p_hi"),
        (F.sum(clamped * F.col("__c")).cast("double")
         / (F.lit(float(scale)) * F.first("n"))).alias("win_mean"),
        (F.first("__rawsum").cast("double")
         / (F.lit(float(scale)) * F.first("n"))).alias("raw_mean"),
    )
    return out


def conformal_interval(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
    calib_cap: int = 1000,
    scale: int = 10_000,
) -> DataFrame:
    """Split-conformal prediction intervals per group (Vovk; Angelopoulos &
    Bates 2023 tutorial form): a 50/25/25 hash split trains a per-group
    mean predictor, calibrates the residual quantile
    q̂ = the ⌈(n+1)(1−α)⌉-th smallest |y − ŷ| on held-out data, and
    reports empirical test coverage of ŷ ± q̂ — the distribution-free
    ≥ 1−α guarantee every model-driven filter (quality scorers, toxicity
    thresholds) should ship with.

    Engine-exact and scale-safe by construction: the predictor is an
    exact fixed-point ratio; the rank ⌈(n+1)(1−α)⌉ is computed in BIGINTs
    from the RATIONAL α = alpha_num/alpha_den (a float ceil diverges
    between engines when the product lands on an integer); and the
    calibration set is capped per group (``sampling.cap_per_key``,
    deterministic md5 rank) so the per-group residual sort is bounded by
    ``calib_cap`` — the statistically honest move (conformal validity
    needs only exchangeable calibration draws, and a few hundred rows
    already pin q̂) that also keeps the window off the data volume.

    Output per group: ``(group, n_train, n_calib, n_test, pred, qhat,
    coverage)`` — coverage is an exact count ratio.  A group missing any
    split entirely is OMITTED (inner joins — no interval can honestly be
    reported for it), mirrored by the oracle.
    """
    from pyspark.sql import Window

    from cerebro_spark.operators.sampling import cap_per_key

    g = F.col(group_col)
    v = F.col(value_col).cast("double")
    q = F.floor(v * scale + F.lit(0.5)).cast("long")
    bucket = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    base = df.filter(v.isNotNull()).select(
        g.alias("grp"), F.col(id_col).alias("__id"), v.alias("__v"),
        q.alias("__q"), bucket.alias("__b"),
    )
    train = base.filter(F.col("__b") < 50)
    calib = base.filter((F.col("__b") >= 50) & (F.col("__b") < 75))
    test = base.filter(F.col("__b") >= 75)

    pred = train.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_train"),
        (F.sum("__q").cast("double")
         / (F.lit(float(scale)) * F.count(F.lit(1)))).alias("pred"),
    )
    # (residual column named __res: cap_per_key claims __r internally)
    cal = calib.join(pred, on="grp").withColumn(
        "__res", F.abs(F.col("__v") - F.col("pred"))
    )
    cal = cap_per_key(cal, "grp", calib_cap, id_col="__id")
    n_cal = cal.groupBy("grp").agg(F.count(F.lit(1)).alias("n_calib"))
    # target rank ⌈(n+1)(1−α)⌉ in pure integer arithmetic, clamped to n
    keep_num = alpha_den - alpha_num
    target = F.least(
        F.floor(((F.col("n_calib") + 1) * keep_num + (alpha_den - 1))
                / alpha_den).cast("long"),
        F.col("n_calib"),
    )
    w = Window.partitionBy("grp").orderBy(F.col("__res").asc(),
                                          F.col("__id").asc())
    qhat = (
        cal.withColumn("__rn", F.row_number().over(w))
        .join(n_cal.select("grp", target.alias("__tgt"), "n_calib"), on="grp")
        .filter(F.col("__rn") == F.col("__tgt"))
        .select("grp", "n_calib", F.col("__res").alias("qhat"))
    )
    scored = test.join(pred, on="grp").join(qhat, on="grp")
    return (
        scored.groupBy("grp")
        .agg(
            F.first("n_train").alias("n_train"),
            F.first("n_calib").alias("n_calib"),
            F.count(F.lit(1)).alias("n_test"),
            F.first("pred").alias("pred"),
            F.first("qhat").alias("qhat"),
            (F.sum(
                (F.abs(F.col("__v") - F.col("pred")) <= F.col("qhat"))
                .cast("long")
            ).cast("double") / F.count(F.lit(1))).alias("coverage"),
        )
        .withColumnRenamed("grp", group_col)
    )


def mutual_info(
    df: DataFrame,
    col_a,
    col_b,
) -> DataFrame:
    """Mutual information (nats) between two categorical columns — returns
    ONE row ``(n, mi_nats, h_a, h_b, nmi)``.

    The information-theoretic sibling of :func:`chi2_independence`: chi²
    answers "is the dependence statistically significant", MI answers "how
    MANY bits of one column the other actually carries" — the quantity a
    feature-selection or leakage audit ranks columns by.  ``nmi`` is the
    symmetric normalization MI / sqrt(H(A)·H(B)) in [0, 1].

    Complete-case (NULL in either column excluded up front), same rationale
    as chi².  Only OBSERVED cells contribute (lim p→0 of p·ln p = 0), so no
    grid materialization is needed — unlike chi², zero cells carry no mass.

    Cross-engine determinism: every term's inputs are exact integers (cell
    count, marginals, total); the term is one fixed IEEE chain ending in
    ``ln``; each term is quantized to a 1e-6 BIGINT and summed exactly, so
    summation order cannot perturb the result.  ``ln`` is not required to
    be correctly rounded by IEEE 754, but a last-ulp difference flips a
    1e-6 floor boundary with probability ~1e-10 per term — the same
    accepted residual as ``bigram_pmi``'s 6-dp round (text.py).

    Scale shape: one combinable groupBy to the contingency cells (state =
    |A|×|B|, independent of row count), two category-sized marginal
    aggregates joined back broadcast-sized, one 1-row reduce.  No windows,
    no per-row Python.

    Reference parity: no reference counterpart — statistical-profiling
    extension next to chi2_independence/ks_drift (driver brief).
    """
    a = F.col(col_a) if isinstance(col_a, str) else col_a
    b = F.col(col_b) if isinstance(col_b, str) else col_b
    cells = (
        df.select(a.alias("__a"), b.alias("__b"))
        .filter(F.col("__a").isNotNull() & F.col("__b").isNotNull())
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__o"))
    )
    ra = cells.groupBy("__a").agg(F.sum("__o").alias("__ra"))
    cb = cells.groupBy("__b").agg(F.sum("__o").alias("__cb"))
    tot = cells.agg(F.sum("__o").alias("__n"))

    def _q6(term):
        return F.floor(term * F.lit(1.0e6) + F.lit(0.5)).cast("long")

    # MI = sum over observed cells of (o/n) * ln(o*n / (ra*cb))
    scored = (
        cells.join(F.broadcast(ra), "__a")
        .join(F.broadcast(cb), "__b")
        .crossJoin(F.broadcast(tot))
    )
    mi_term = (F.col("__o").cast("double") / F.col("__n")) * F.log(
        (F.col("__o") * F.col("__n")).cast("double")
        / (F.col("__ra") * F.col("__cb")).cast("double")
    )
    mi6 = scored.agg(F.sum(_q6(mi_term)).alias("__mi6"))

    # H(X) = -sum (m/n) ln(m/n), per marginal, same quantized-sum scheme
    def _entropy6(marg: DataFrame, cnt: str, out: str) -> DataFrame:
        t = -(F.col(cnt).cast("double") / F.col("__n")) * F.log(
            F.col(cnt).cast("double") / F.col("__n")
        )
        return marg.crossJoin(F.broadcast(tot)).agg(F.sum(_q6(t)).alias(out))

    ha6 = _entropy6(ra, "__ra", "__ha6")
    hb6 = _entropy6(cb, "__cb", "__hb6")

    out = mi6.crossJoin(ha6).crossJoin(hb6).crossJoin(F.broadcast(tot))
    mi = F.col("__mi6") / F.lit(1.0e6)
    h_a = F.col("__ha6") / F.lit(1.0e6)
    h_b = F.col("__hb6") / F.lit(1.0e6)
    return out.select(
        F.col("__n").alias("n"),
        mi.alias("mi_nats"),
        h_a.alias("h_a"),
        h_b.alias("h_b"),
        F.when((h_a > 0) & (h_b > 0), mi / F.sqrt(h_a * h_b)).alias("nmi"),
    )


def audience_overlap(
    df: DataFrame,
    key_col: str,
    cat_col: str,
) -> DataFrame:
    """Exact pairwise audience overlap between categories: for every
    co-occurring category pair (a < b), how many distinct keys appear in
    BOTH — ``(cat_a, cat_b, keys_a, keys_b, overlap, jaccard)``.

    The audience / cohort-overlap question ("how many purchase users also
    hit errors?") behind campaign-reach and feature-adoption dashboards.
    Jaccard = overlap / (keys_a + keys_b − overlap), a division of exact
    integers — engine-exact.

    Scale shape: the naive formulation self-joins the (key, cat) pairs on
    key, which shuffles the fact twice and explodes on heavy keys.  This
    operator instead distincts (key, cat) once, groupBys to a per-key
    sorted category ARRAY (bounded by |categories|, NOT by key frequency —
    the distinct collapsed that), and emits the ≤ |C|·(|C|−1)/2 ordered
    pairs per key as a projection-side flatten/transform explode feeding a
    combinable count.  One distinct shuffle + one pair-count shuffle whose
    key space is category pairs.  Intended for bounded category columns
    (event types, experiment arms, channels — up to ~10⁴ categories);
    sketch-based audience estimation at unbounded cardinality is the
    ``theta_sketch_rollup`` path (tsdb.py).

    Zero-overlap pairs are absent by construction (nothing co-occurred to
    count) — matches the self-join the oracle runs.

    Reference parity: no reference counterpart — audience-analytics
    extension next to retention_between/user_retention (driver brief).
    """
    ut = df.select(
        F.col(key_col).alias("__k"), F.col(cat_col).alias("__c")
    ).filter(F.col("__k").isNotNull() & F.col("__c").isNotNull()).distinct()
    per = ut.groupBy("__c").agg(F.count(F.lit(1)).alias("__n"))
    sets = ut.groupBy("__k").agg(
        F.array_sort(F.collect_set("__c")).alias("__arr")
    )
    pairs = sets.select(
        F.explode(
            F.expr(
                "flatten(transform(__arr, (x, i) -> "
                "transform(slice(__arr, i + 2, size(__arr)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("__p")
    ).select(F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))
    ov = pairs.groupBy("__a", "__b").agg(F.count(F.lit(1)).alias("overlap"))
    out = (
        ov.join(F.broadcast(per.withColumnRenamed("__n", "keys_a")),
                ov.__a == per.__c)
        .drop("__c")
        .join(F.broadcast(per.withColumnRenamed("__n", "keys_b")),
              ov.__b == per.__c)
        .drop("__c")
    )
    return out.select(
        F.col("__a").alias("cat_a"),
        F.col("__b").alias("cat_b"),
        "keys_a",
        "keys_b",
        "overlap",
        (
            F.col("overlap").cast("double")
            / (F.col("keys_a") + F.col("keys_b") - F.col("overlap"))
        ).alias("jaccard"),
    )


MARKOV_SCALE = 10**12  # fixed-point scale for absorption probabilities


def markov_transitions(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conv_type: str = "purchase",
) -> DataFrame:
    """First-order journey transition counts for Markov attribution —
    ``(src, dst, c)`` rows over states {start, channels..., conv, null}.

    Per user, events order by (ts, id); the journey TRUNCATES at the
    first conversion (post-conversion behavior is a different journey);
    ``start`` precedes the first event; a journey without conversion
    terminates in the absorbing ``null`` state.

    This is the DATA-SIZED half of attribution: one per-user window pass
    (partitioned by user, the standard sequence shape) plus a combinable
    pair count whose key space is (|channels|+1)·(|channels|+2) — tiny.
    """
    from pyspark.sql import Window

    ev = (
        df.filter(F.col(user_col).isNotNull() & F.col(type_col).isNotNull())
        .select(
            F.col(user_col).alias("__u"),
            F.col(ts_col).alias("__t"),
            F.col(id_col).alias("__i"),
            F.col(type_col).alias("__ty"),
        )
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("__u").orderBy(
                F.col("__t").asc(), F.col("__i").asc()
            )
        ))
    )
    wconv = Window.partitionBy("__u")
    ev = ev.withColumn(
        "__conv_rn",
        F.min(F.when(F.col("__ty") == conv_type, F.col("__rn"))).over(wconv),
    ).withColumn("__max_rn", F.max("__rn").over(wconv))
    kept = ev.filter(
        F.col("__conv_rn").isNull() | (F.col("__rn") <= F.col("__conv_rn"))
    )
    wseq = Window.partitionBy("__u").orderBy(F.col("__rn").asc())
    steps = kept.select(
        F.coalesce(F.lag("__ty").over(wseq), F.lit("start")).alias("src"),
        F.when(F.col("__ty") == conv_type, F.lit("conv"))
        .otherwise(F.col("__ty")).alias("dst"),
        "__ty", "__rn", "__conv_rn", "__max_rn",
    )
    trans = steps.select("src", "dst")
    terminal = steps.filter(
        F.col("__conv_rn").isNull() & (F.col("__rn") == F.col("__max_rn"))
    ).select(F.col("__ty").alias("src"), F.lit("null").alias("dst"))
    return (
        trans.unionByName(terminal)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _markov_absorption(
    trans: "list[tuple[str, str, int]]",
    iterations: int,
) -> "dict[str, dict[str, int]]":
    """Exact fixed-point absorption probabilities per run ('full' plus one
    run per removed channel) from collected transition counts.

    Pure-Python ARBITRARY-PRECISION integer recurrence (no floats, no
    overflow): a_{k+1}(s) = (SCALE·c(s,conv)) // tot(s)
    + Σ_ch (a_k(ch)·c(s,ch)) // tot(s), per-edge floor — the DuckDB
    oracle unrolls the identical HUGEINT recurrence, so the values match
    exactly.  The input is BOUNDED metadata (≤ (|channels|+1)·
    (|channels|+2) rows), never data-sized.
    """
    tot: dict[str, int] = {}
    for s, _, c in trans:
        tot[s] = tot.get(s, 0) + c
    states = sorted(tot)
    channels = [s for s in states if s != "start"]
    runs = ["full"] + channels
    out: dict[str, dict[str, int]] = {}
    for run in runs:
        edges = [
            (s, d, c) for s, d, c in trans
            if not (run != "full" and d == run)
        ]
        a = {s: 0 for s in states}
        for _ in range(iterations):
            nxt = {}
            for s in states:
                acc = 0
                for src, dst, c in edges:
                    if src != s:
                        continue
                    if dst == "conv":
                        acc += (MARKOV_SCALE * c) // tot[s]
                    elif dst in a:
                        acc += (a[dst] * c) // tot[s]
                nxt[s] = acc
            a = nxt
        out[run] = a
    return out


def markov_attribution(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    conv_type: str = "purchase",
    iterations: int = 25,
) -> DataFrame:
    """Markov removal-effect attribution: how much of the conversion
    probability does each channel actually CARRY?  Returns one row per
    channel — ``(channel, p_conv, p_conv_removed, removal_effect,
    attribution_share)``.

    The data-driven alternative to last-touch (``purchase_attribution``):
    model journeys as a first-order absorbing Markov chain
    (start → channels → conv/null), compute P(conv | start), then re-run
    with each channel REMOVED (its incoming transitions route to null —
    the standard removal-effect construction from the marketing-
    attribution literature); a channel's attribution share is its
    normalized drop in conversion probability.

    Scale shape: the 100 TB work is :func:`markov_transitions` (per-user
    window + combinable pair count).  The chain solve itself runs on the
    COLLECTED transition matrix — bounded metadata, ≤ a few dozen rows —
    as ``iterations`` exact fixed-point integer power iterations
    (``MARKOV_SCALE`` = 1e12; per-edge floor; arbitrary-precision Python
    ints, HUGEINT in the oracle — identical values, no float drift).
    The iteration count only bounds path LENGTH: contributions decay
    geometrically and both engines run the same K, so exactness across
    engines holds for any K.

    Reference parity: no reference counterpart — journey-analytics
    extension next to purchase_attribution/window_funnel (driver brief).
    """
    spark = df.sparkSession
    trans_rows = [
        (r["src"], r["dst"], int(r["c"]))
        for r in markov_transitions(
            df, user_col, ts_col, type_col, id_col, conv_type
        ).collect()
    ]
    runs = _markov_absorption(trans_rows, iterations)
    a_full = runs["full"].get("start", 0)
    channels = sorted(k for k in runs if k != "full")
    re = {c: max(a_full - runs[c].get("start", 0), 0) for c in channels}
    tot_re = sum(re.values())
    rows = [
        (
            c,
            float(a_full) / MARKOV_SCALE,
            float(runs[c].get("start", 0)) / MARKOV_SCALE,
            float(re[c]) / MARKOV_SCALE,
            (float(re[c]) / float(tot_re)) if tot_re > 0 else None,
        )
        for c in channels
    ]
    from cerebro_spark.operators.util import small_df

    return small_df(
        spark,
        rows,
        "channel string, p_conv double, p_conv_removed double, "
        "removal_effect double, attribution_share double",
    )


def msprt_monitor(
    df: DataFrame,
    arm_col: str,
    value_col: str = "value",
    time_col: str = "ts",
    tau2: float = 25.0,
    day_seconds: int = 86400,
    arm_a=None,
    arm_b=None,
) -> DataFrame:
    """Always-valid sequential A/B monitoring — the mixture SPRT of
    Johari, Pekelis & Walsh (2017, "Peeking at A/B tests").  Per day d,
    using everything observed SO FAR: the mean difference
    ``delta = x̄_A − x̄_B``, its estimated variance ``V = s²_A/n_A +
    s²_B/n_B``, the mixture log likelihood ratio against H0: Δ=0 with a
    N(0, τ²) prior on the true lift

        logΛ = ½·ln(V/(V+τ²)) + Δ²·τ² / (2·V·(V+τ²))

    and the ALWAYS-VALID p-value ``p_d = min_{e ≤ d} min(1, 1/Λ_e)`` —
    monotone by construction, so the experimenter may peek every day and
    stop the first day it crosses α without inflating false positives
    (the fixed-n z-test ``ab_test_ztest`` is invalid under peeking).
    Arms are ``arm_a``/``arm_b`` (pass them explicitly — the fallback
    discovers the two smallest distinct labels with an extra scan, fine
    interactively but not on a 100 TB fact).
    Returns ``(day, n_a, n_b, delta, log_lambda, p_always)`` for days
    where both arms have n ≥ 2 and positive variance (both variances
    must be > 0 so V is strictly positive).

    Exactness: values are e6-quantized; the per-day CUMULATIVE counts,
    sums and sums-of-squares are exact integers (DECIMAL(38,0)); delta,
    V and logΛ are then one fixed IEEE chain per day with logΛ rounded
    to 6 dp BEFORE exp(−·), so the p-value chain is bit-reproducible.

    Scale shape: one combinable per-day aggregate over the fact (arms
    pivot into conditional sums — no join), then every window runs over
    the DAY-count grid (≤ 10⁴ rows for a 30-year experiment) — the
    keyless running windows here are grid-sized, never data-sized.
    """
    from pyspark.sql import Window

    q = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    day = F.floor(F.col(time_col).cast("double") / day_seconds).cast("long")
    if arm_a is None or arm_b is None:
        arms = (
            df.select(F.col(arm_col).alias("__arm"))
            .filter(F.col("__arm").isNotNull())
            .distinct()
            .orderBy("__arm")
            .limit(2)
            .collect()
        )  # bounded metadata (2 rows) but costs a scan — pass arms at scale
        if len(arms) < 2:
            raise ValueError("msprt_monitor needs two arms in arm_col")
        arm_a, arm_b = arms[0][0], arms[1][0]
    dec = "decimal(38,0)"
    is_a = F.col("__arm") == F.lit(arm_a)
    is_b = F.col("__arm") == F.lit(arm_b)
    daily = (
        df.filter(F.col(value_col).isNotNull())
        .select(day.alias("day"), F.col(arm_col).alias("__arm"), q.alias("__q"))
        .groupBy("day")
        .agg(
            F.sum(F.when(is_a, 1).otherwise(0)).alias("__na"),
            F.sum(F.when(is_a, F.col("__q")).otherwise(0)).alias("__sa"),
            F.sum(
                F.when(is_a, (F.col("__q").cast(dec) * F.col("__q"))).otherwise(
                    F.lit(0).cast(dec)
                )
            ).alias("__ssa"),
            F.sum(F.when(is_b, 1).otherwise(0)).alias("__nb"),
            F.sum(F.when(is_b, F.col("__q")).otherwise(0)).alias("__sb"),
            F.sum(
                F.when(is_b, (F.col("__q").cast(dec) * F.col("__q"))).otherwise(
                    F.lit(0).cast(dec)
                )
            ).alias("__ssb"),
        )
    )
    # cumulative state over the bounded day grid (keyless by design:
    # one experiment = one timeline; rows = #days, never data-sized)
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = daily.select(
        "day",
        F.sum("__na").over(wcum).alias("na"),
        F.sum("__sa").over(wcum).alias("sa"),
        F.sum("__ssa").over(wcum).alias("ssa"),
        F.sum("__nb").over(wcum).alias("nb"),
        F.sum("__sb").over(wcum).alias("sb"),
        F.sum("__ssb").over(wcum).alias("ssb"),
    )
    na_d = F.col("na").cast("double")
    nb_d = F.col("nb").cast("double")
    sa_d = F.col("sa").cast("double")
    sb_d = F.col("sb").cast("double")
    # fixed IEEE chains over exact integers (÷1e6 de-quantizes)
    delta = (sa_d / na_d - sb_d / nb_d) / F.lit(1.0e6)
    va = (
        (F.col("ssa").cast("double") - sa_d * sa_d / na_d)
        / (na_d - F.lit(1.0))
        / F.lit(1.0e12)
    )
    vb = (
        (F.col("ssb").cast("double") - sb_d * sb_d / nb_d)
        / (nb_d - F.lit(1.0))
        / F.lit(1.0e12)
    )
    v = va / na_d + vb / nb_d
    t2 = F.lit(float(tau2))
    log_lambda = F.round(
        F.lit(0.5) * F.log(v / (v + t2))
        + delta * delta * t2 / (F.lit(2.0) * v * (v + t2)),
        6,
    )
    stat = c.filter(
        (F.col("na") >= 2) & (F.col("nb") >= 2)
    ).select(
        "day",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round(delta, 6).alias("delta"),
        log_lambda.alias("log_lambda"),
        ((va > 0) & (vb > 0)).alias("__okv"),
    ).filter(F.col("__okv")).drop("__okv")
    p_raw = F.round(F.least(F.lit(1.0), F.exp(-F.col("log_lambda"))), 6)
    wrun = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return stat.select(
        "day",
        "n_a",
        "n_b",
        "delta",
        "log_lambda",
        F.min(p_raw).over(wrun).alias("p_always"),
    )


def l_diversity(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
    worst_k: int = 20,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — the privacy
    check k-anonymity misses: a group of 50 "anonymous" rows that all
    share ONE sensitive value still discloses it.  Per quasi-identifier
    group: ``n``, ``l_distinct`` (distinct sensitive values — the basic
    l), and ``l_entropy`` = exp(H) over the group's sensitive-value
    distribution (the effective number of values an attacker must choose
    among; equals l_distinct only when uniform).  Returns the
    ``worst_k`` most disclosing groups — lowest l_distinct, then lowest
    entropy, then group key.

    Exactness: the per-(group, value) and per-group counts are exact
    integers; H sums e6-quantized ``c·ln(c/n)`` terms (one quantized ln
    per DISTINCT count pair — same contract as mutual_info), and
    ``l_entropy = round(exp(H), 6)`` is one fixed IEEE chain.

    Scale shape: one combinable (QI, sensitive) aggregate over the fact,
    one combinable QI re-aggregation on top — group count rows, never
    the fact, pass the second stage.  No windows, no self-joins.

    Reference parity: no reference counterpart — governance extension
    next to k_anonymity (driver brief).

    ``qi_cols`` accepts column names or Column objects, same contract as
    the sibling k_anonymity.
    """
    qi_cols = [F.col(c) if isinstance(c, str) else c for c in qi_cols]
    names = [f"qi_{i}" for i in range(len(qi_cols))]
    cells = (
        df.select(
            *[c.alias(n) for c, n in zip(qi_cols, names)],
            F.col(sensitive_col).alias("__s"),
        )
        .filter(F.col("__s").isNotNull())
        .groupBy(*names, "__s")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # e6-quantized c*ln(c/n) per cell needs n first: re-aggregate counts,
    # then a second pass over the cell frame (group-count rows, not fact)
    totals = cells.groupBy(*names).agg(
        F.sum("__c").alias("__n"),
        F.count(F.lit(1)).cast("long").alias("l_distinct"),
    )
    j = cells.join(totals, names)
    term = (
        F.col("__c")
        * F.floor(
            F.log(F.col("__c").cast("double") / F.col("__n").cast("double"))
            * F.lit(1.0e6)
            + F.lit(0.5)
        ).cast("long")
    )
    ent = j.groupBy(*names).agg(F.sum(term).alias("__hsum"))
    out = totals.join(ent, names).select(
        *names,
        F.col("__n").cast("long").alias("n"),
        "l_distinct",
        F.round(
            F.exp(
                -(F.col("__hsum").cast("double") / F.col("__n").cast("double"))
                / F.lit(1.0e6)
            ),
            6,
        ).alias("l_entropy"),
    )
    return out.orderBy(
        F.col("l_distinct").asc(),
        F.col("l_entropy").asc(),
        *[F.col(n).asc() for n in names],
    ).limit(worst_k)


def js_divergence(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
) -> DataFrame:
    """Jensen–Shannon divergence of each group's distribution of a
    BUCKETED feature against the whole corpus — ``(group, n, js)`` in
    nats, largest drift first.  Symmetric and bounded (≤ ln 2), so it
    ranks sources comparably where PSI (mass movement vs a reference
    window) and KS (CDF shape) answer adjacent questions; the natural
    "which source looks least like the corpus" curation signal.

    JS(p‖q) = ½Σ_b [p·ln(2p/(p+q)) + q·ln(2q/(p+q))] over the full
    observed bucket grid (buckets a group lacks still contribute the
    q·ln2 mass — materialized via the groups × buckets cross join).
    The corpus distribution q INCLUDES the group itself (the standard
    one-vs-corpus monitoring framing; at many similar-sized groups the
    self-mass dilution is uniform across groups).

    Exactness: p and q are single IEEE divisions of exact integer
    counts; each bucket's term is one fixed chain quantized to an e9
    BIGINT, so per-group totals are exact integer sums over the bounded
    grid; js divides once and rounds to 6 dp.

    Scale shape: one combinable (group, bucket) aggregate over the
    fact; everything after runs on |groups|·|buckets| grid rows (the
    cross join is bounded metadata, the chi2_event_hour contract).

    Reference parity: no reference counterpart — drift-monitor
    extension next to psi_drift/ks_drift (driver brief).
    """
    cells = (
        df.filter(F.col(group_col).isNotNull() & F.col(bucket_col).isNotNull())
        .groupBy(F.col(group_col).alias("__g"), F.col(bucket_col).alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    srcn = cells.groupBy("__g").agg(F.sum("__c").alias("__ns"))
    gb = cells.groupBy("__b").agg(F.sum("__c").alias("__cb"))
    gt = cells.agg(F.sum("__c").alias("__ng"))
    grid = (
        srcn.crossJoin(F.broadcast(gb))
        .crossJoin(F.broadcast(gt))
        .join(cells, ["__g", "__b"], "left")
        .withColumn("__csb", F.coalesce(F.col("__c"), F.lit(0)))
    )
    p = F.col("__csb").cast("double") / F.col("__ns").cast("double")
    q = F.col("__cb").cast("double") / F.col("__ng").cast("double")
    term = (
        F.when(
            F.col("__csb") > 0,
            p * F.log(F.lit(2.0) * p / (p + q)),
        ).otherwise(F.lit(0.0))
        + q * F.log(F.lit(2.0) * q / (p + q))
    )
    te9 = F.floor(term * F.lit(1.0e9) + F.lit(0.5)).cast("long")
    out = grid.select("__g", "__ns", te9.alias("__t")).groupBy(
        "__g", "__ns"
    ).agg(F.sum("__t").alias("__s"))
    return out.select(
        F.col("__g").alias("group"),
        F.col("__ns").cast("long").alias("n"),
        F.round(
            F.col("__s").cast("double") / F.lit(2.0) / F.lit(1.0e9), 6
        ).alias("js"),
    ).orderBy(F.col("js").desc(), F.col("group").asc())


def info_gain_ranking(
    df: DataFrame,
    features: "dict[str, object]",
    label_col: str,
) -> DataFrame:
    """Feature ranking by information gain: MI(label; feature) for MANY
    candidate features in ONE fact scan — ``(feature, n, mi_nats,
    h_feature, gain_ratio)`` ordered by gain.  ``gain_ratio`` is
    Quinlan's MI / H(feature) (penalizes high-cardinality features that
    memorize rather than generalize) — the feature-selection shortlist
    a training pipeline ranks candidate columns by.  ``features`` maps
    name → Column expression (values cast to string).

    How the one-scan works: each row explodes into |features| (name,
    value) structs — a projection-side melt, no self-union, so the fact
    is read once; everything after runs on contingency-cell frames
    (Σ_f |V_f|·|L| rows).  Complete-case per feature (a NULL in feature
    f drops the row for f only); NULL labels drop everywhere.

    Exactness: the mutual_info contract — every term's inputs are exact
    integer counts, each term is one fixed IEEE chain ending in ln,
    e6-quantized and summed exactly; the final ordering key is the
    INTEGER quantized MI (ties → feature name).

    Reference parity: no reference counterpart — feature-selection
    extension generalizing mutual_info (driver brief).
    """
    lab = F.col(label_col).cast("string")
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("f"),
                (expr if not isinstance(expr, str) else F.col(expr))
                .cast("string")
                .alias("v"),
            )
            for name, expr in features.items()
        ]
    )
    base = (
        df.filter(lab.isNotNull())
        .select(F.explode(arr).alias("__fv"), lab.alias("__l"))
        .select(
            F.col("__fv.f").alias("__f"), F.col("__fv.v").alias("__v"), "__l"
        )
        .filter(F.col("__v").isNotNull())
    )
    cells = base.groupBy("__f", "__v", "__l").agg(F.count(F.lit(1)).alias("__o"))
    rv = cells.groupBy("__f", "__v").agg(F.sum("__o").alias("__rv"))
    cl = cells.groupBy("__f", "__l").agg(F.sum("__o").alias("__cl"))
    nf = cells.groupBy("__f").agg(F.sum("__o").alias("__n"))

    def _q6(term):
        return F.floor(term * F.lit(1.0e6) + F.lit(0.5)).cast("long")

    scored = (
        cells.join(F.broadcast(rv), ["__f", "__v"])
        .join(F.broadcast(cl), ["__f", "__l"])
        .join(F.broadcast(nf), "__f")
    )
    mi_term = (F.col("__o").cast("double") / F.col("__n")) * F.log(
        (F.col("__o") * F.col("__n")).cast("double")
        / (F.col("__rv") * F.col("__cl")).cast("double")
    )
    mi6 = scored.groupBy("__f").agg(F.sum(_q6(mi_term)).alias("__mi6"))
    h_term = -(F.col("__rv").cast("double") / F.col("__n")) * F.log(
        F.col("__rv").cast("double") / F.col("__n")
    )
    hf6 = (
        rv.join(F.broadcast(nf), "__f")
        .groupBy("__f")
        .agg(F.sum(_q6(h_term)).alias("__hf6"))
    )
    out = mi6.join(hf6, "__f").join(F.broadcast(nf), "__f")
    return out.select(
        F.col("__f").alias("feature"),
        F.col("__n").cast("long").alias("n"),
        (F.col("__mi6") / F.lit(1.0e6)).alias("mi_nats"),
        (F.col("__hf6") / F.lit(1.0e6)).alias("h_feature"),
        F.when(
            F.col("__hf6") > 0,
            F.round(F.col("__mi6").cast("double") / F.col("__hf6").cast("double"), 6),
        ).alias("gain_ratio"),
        F.col("__mi6").alias("__k"),
    ).orderBy(F.col("__k").desc(), F.col("feature").asc()).drop("__k")


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    grid_scale: float = 100.0,
) -> DataFrame:
    """Exact quantile normalization: map each group's value distribution
    onto the CORPUS distribution — ``(group, q, n_cell, rank_target,
    mapped_value)`` where every distinct (group, grid-value) cell lands
    on the global value at the same quantile.  The cross-source feature
    alignment step (microarray heritage, Bolstad 2003): after it, every
    group's feature has the SAME marginal distribution, so downstream
    thresholds mean the same thing for every source.  Broadcast-join the
    grid back on (group, q) to rewrite a fact column.

    Exactness, end to end in integers: values quantize to the
    ``grid_scale`` grid; a cell's midrank numerator is ``2·cum − cnt + 1``
    over denominator ``2·n_g``; its target global rank is
    ``R = ⌈r·n/(2·n_g)⌉`` computed as one DECIMAL(38,0) integral
    division; the global value at rank R is found with the repo's own
    as-of join (largest interval-start ≤ R) — no floats until the final
    mapped value de-quantizes.

    Scale shape: one combinable (group, grid) aggregate over the fact;
    every window after runs over VALUE-GRID rows (winsorized_mean's
    histogram contract — grid size is value-cardinality-bounded, not
    data-bounded; the one keyless cumulative window is over the global
    grid).  The as-of join is the one-shuffle union-merge, grid-sized
    on both sides.

    Reference parity: no reference counterpart — feature-normalization
    extension next to winsorized_mean (driver brief).
    """
    from cerebro_spark.operators.joins import asof_join
    from pyspark.sql import Window

    scale = float(grid_scale)
    q = F.floor(F.col(value_col).cast("double") * F.lit(scale) + F.lit(0.5)).cast(
        "long"
    )
    cells = (
        df.filter(F.col(value_col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("group"), q.alias("q"))
        .groupBy("group", "q")
        .agg(F.count(F.lit(1)).alias("n_cell"))
    )
    wg = Window.partitionBy("group").orderBy("q").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall_g = Window.partitionBy("group")
    probe = cells.withColumn("__cum", F.sum("n_cell").over(wg)).withColumn(
        "__ng", F.sum("n_cell").over(wall_g)
    )
    # global grid: keyless windows over VALUE-GRID rows (bounded by value
    # cardinality, never by data size — the winsorized_mean contract)
    grid = cells.groupBy("q").agg(F.sum("n_cell").alias("__gc"))
    wq = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid = grid.withColumn("__gcum", F.sum("__gc").over(wq)).withColumn(
        "__n", F.sum("__gc").over(Window.partitionBy())
    )
    dec = "decimal(38,0)"
    rnum = (F.lit(2) * F.col("__cum") - F.col("n_cell") + 1).cast(dec)
    # R = ceil(rnum*n / (2*ng)), all-positive integral arithmetic
    n_total = F.broadcast(grid.select(F.max("__n").alias("__n")))
    probe = probe.crossJoin(n_total)
    probe = probe.withColumn(
        "__rk",
        F.expr(
            "CAST((CAST(2 * __cum - n_cell + 1 AS DECIMAL(38,0)) * __n"
            " + 2 * __ng - 1) AS DECIMAL(38,0)) DIV (2 * __ng)"
        ),
    ).select("group", "q", "n_cell", "__rk")
    glookup = grid.select(
        (F.col("__gcum") - F.col("__gc") + 1).alias("__rk"),
        F.col("q").alias("__gq"),
    )
    j = asof_join(
        probe, glookup, time_col="__rk", right_cols=["__gq"],
        direction="backward",
    )
    return j.select(
        "group",
        "q",
        "n_cell",
        F.col("__rk").cast("long").alias("rank_target"),
        (F.col("__gq_right").cast("double") / F.lit(scale)).alias("mapped_value"),
    )


def scd2_snapshot_at(
    intervals: DataFrame,
    at,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time reconstruction from SCD Type-2 intervals — the
    time-travel verb over :func:`scd2_collapse`'s output: the rows
    valid AT instant ``at`` (``valid_from ≤ at < valid_to``, open
    current rows qualify).  ``at`` is a Column (epoch seconds double or
    a scalar 1-row broadcast) — with half-open intervals every instant
    matches EXACTLY one version per key, so the snapshot is a plain
    scan-time filter: no join, no window, pushdown-eligible when the
    interval table is stored partitioned.

    Reference parity: no reference counterpart — the warehouse
    time-travel companion of scd2_collapse/order_snapshot_diff.
    """
    at_c = at if not isinstance(at, (int, float)) else F.lit(float(at))
    vf = F.col(valid_from).cast("double")
    vt = F.col(valid_to).cast("double")
    return intervals.filter(
        (vf <= at_c) & (F.col(valid_to).isNull() | (vt > at_c))
    )


def table_fingerprint(
    df: DataFrame,
    cols: "list",
    buckets: int = 256,
) -> DataFrame:
    """Order-independent table checksum for cheap reconciliation —
    ``(bucket, n, checksum)`` where each row hashes portably (md5 of the
    sentinel-joined column strings), lands in ``h % buckets``, and the
    bucket checksum is the exact integer SUM of the 60-bit hashes.  Two
    tables are equal iff all buckets match; a migration/backfill diff
    narrows to the few buckets that differ (then re-runs keyed diff —
    ``order_snapshot_diff`` — on just those), instead of shipping either
    table.  Commutative sums make the checksum partition-order-proof and
    combinable: one groupBy over ``buckets`` keys is the entire cost.

    ``cols`` must be STRING-STABLE expressions (strings, integers — NOT
    raw doubles: engines format floats differently; e6-quantize to
    BIGINT first).  NULLs encode as a sentinel (concat_ws drops them
    silently otherwise — that would make (NULL,'x') collide with
    ('x',NULL)).  ``checksum`` is returned as a STRING so exact integer
    equality survives any client's number type.

    Reference parity: no reference counterpart — reconciliation
    extension next to order_snapshot_diff (driver brief).
    """
    parts = [
        F.coalesce(
            (c if not isinstance(c, str) else F.col(c)).cast("string"),
            F.lit("\x00NULL"),
        )
        for c in cols
    ]
    h = F.conv(
        F.substring(F.md5(F.concat_ws("\x1f", *parts)), 1, 15), 16, 10
    ).cast("long")
    rows = df.select(
        (h % buckets).alias("bucket"), h.alias("__h")
    )
    return rows.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("__h").cast("decimal(38,0)")).cast("string").alias("checksum"),
    )


def column_profile(
    df: DataFrame,
    cols: "dict[str, object]",
) -> DataFrame:
    """One-pass data-profiling summary — per column ``(column, n_rows,
    n_nonnull, n_null, n_distinct, min_value, max_value)`` with values
    rendered as strings (pass STRING-STABLE expressions: strings /
    integers, not raw doubles — same contract as table_fingerprint).
    The Deequ-style completeness/cardinality audit every onboarding of
    a new source starts with, exact instead of approximate.

    How the one-pass works: each row explodes into |cols| (name, value)
    structs — a projection-side melt like info_gain_ranking, so the fact
    is read ONCE for any number of columns; per column the stats reduce
    in one groupBy (count_distinct keeps per-column state, min/max on
    the binary-collated string render so every engine orders them
    identically).

    Reference parity: no reference counterpart — governance extension
    next to k_anonymity/l_diversity (driver brief).
    """
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("c"),
                (e if not isinstance(e, str) else F.col(e))
                .cast("string")
                .alias("v"),
            )
            for name, e in cols.items()
        ]
    )
    melted = df.select(F.explode(arr).alias("__cv")).select(
        F.col("__cv.c").alias("column"), F.col("__cv.v").alias("__v")
    )
    return melted.groupBy("column").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("__v").cast("long").alias("n_nonnull"),
        (F.count(F.lit(1)) - F.count("__v")).cast("long").alias("n_null"),
        F.countDistinct("__v").cast("long").alias("n_distinct"),
        F.min("__v").alias("min_value"),
        F.max("__v").alias("max_value"),
    )


def change_contribution(
    df: DataFrame,
    dims: "dict[str, object]",
    value_col: str = "value",
    time_col: str = "ts",
    top_k: int = 20,
) -> DataFrame:
    """Root-cause contribution analysis: the metric moved between the
    early and late half of the window — WHICH dimension values drove
    it?  For every (dimension, value) slice: the early/late metric
    sums, the slice delta, and its share of the total change —
    ``(dimension, dim_value, early_sum, late_sum, delta, share)``, the
    ``top_k`` slices by |delta|.  Within one dimension the slice deltas
    sum EXACTLY to the total delta (a partition of the rows), so the
    readout is an honest decomposition, not a correlation.

    All ``dims`` melt through one projection-side struct explode (the
    info_gain_ranking pattern) — ONE fact scan for any number of
    candidate dimensions.  Sums are e6-quantized exact integers;
    ``share`` divides two exact integers (NULL when the total delta is
    zero); ordering is by the INTEGER |delta| (ties → dimension,
    value).  The split instant is each row's position vs the global
    (min+max)/2 midpoint — one 1-row scalar broadcast.

    Reference parity: no reference counterpart — diagnostics extension
    next to psi_drift/key_skew_report (driver brief).
    """
    t = F.col(time_col).cast("double")
    q = F.floor(F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)).cast(
        "long"
    )
    arr = F.array(
        *[
            F.struct(
                F.lit(name).alias("d"),
                (e if not isinstance(e, str) else F.col(e))
                .cast("string")
                .alias("v"),
            )
            for name, e in dims.items()
        ]
    )
    base = df.filter(F.col(value_col).isNotNull()).select(
        t.alias("__t"), q.alias("__q"), F.explode(arr).alias("__dv")
    )
    span = base.agg(
        ((F.min("__t") + F.max("__t")) / 2).alias("__mid")
    )
    cells = (
        base.crossJoin(F.broadcast(span))
        .filter(F.col("__dv.v").isNotNull())
        .groupBy(
            F.col("__dv.d").alias("dimension"),
            F.col("__dv.v").alias("dim_value"),
        )
        .agg(
            F.sum(F.when(F.col("__t") <= F.col("__mid"), F.col("__q")).otherwise(0))
            .alias("__e"),
            F.sum(F.when(F.col("__t") > F.col("__mid"), F.col("__q")).otherwise(0))
            .alias("__l"),
        )
    )
    # per-dimension total delta: dimension-count rows, broadcast back
    tot = cells.groupBy("dimension").agg(
        (F.sum("__l") - F.sum("__e")).alias("__tot")
    )
    j = cells.join(F.broadcast(tot), "dimension")
    delta_i = F.col("__l") - F.col("__e")
    return (
        j.select(
            "dimension",
            "dim_value",
            F.round(F.col("__e").cast("double") / F.lit(1.0e6), 6).alias("early_sum"),
            F.round(F.col("__l").cast("double") / F.lit(1.0e6), 6).alias("late_sum"),
            F.round(delta_i.cast("double") / F.lit(1.0e6), 6).alias("delta"),
            F.when(
                F.col("__tot") != 0,
                F.round(delta_i.cast("double") / F.col("__tot").cast("double"), 6),
            ).alias("share"),
            F.abs(delta_i).alias("__k"),
        )
        .orderBy(F.col("__k").desc(), F.col("dimension").asc(), F.col("dim_value").asc())
        .limit(top_k)
        .drop("__k")
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col,
    quant: int = 100,
) -> DataFrame:
    """Exact ROC-AUC of ``score_col`` as a ranker for boolean ``label_col``
    — ONE row ``(n_pos, n_neg, auc)`` via the rank (Mann–Whitney U)
    identity, with ties midranked.  The classifier-evaluation companion
    of calibration_bins: calibration asks "are the probabilities honest",
    AUC asks "does the score order positives above negatives at all".

    Scores are quantized to ``1/quant`` units first (ties WITHIN a
    quantum are midranked — the documented metric is "AUC at quantized
    scores", identical in any engine).  With per-quantum counts
    ``(n_s, p_s)`` and exclusive cumulative ``c_s`` over the ascending
    score grid: ``2·Σ midranks(pos) = Σ p_s·(2c_s + n_s + 1)`` is an
    EXACT integer, and ``auc = (S2 − P(P+1)) / (2PN)`` is one IEEE
    division of exact DECIMAL operands, rounded 6 dp.  Degenerate inputs
    (no positives or no negatives) yield NULL.

    Scale shape: one combinable (quantized-score) aggregate over the
    fact; the only window is the exclusive cumulative count over the
    SCORE GRID, whose size is bounded by ``(max−min)·quant + 1`` —
    quantization-bounded, never data-sized (the winsorized_mean /
    quantile_normalize value-grid contract).

    Reference parity: no reference counterpart — evaluation extension
    next to calibration_bins (driver brief).
    """
    from pyspark.sql import Window

    lab = label_col if not isinstance(label_col, str) else F.col(label_col)
    qs = F.floor(
        F.col(score_col).cast("double") * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    cells = (
        df.filter(F.col(score_col).isNotNull() & lab.isNotNull())
        .select(qs.alias("__s"), lab.cast("int").alias("__y"))
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum("__y").cast("long").alias("__p"),
        )
    )
    wc = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    # score-grid-sized keyless window: bounded by quantization, not data
    dec = "decimal(38,0)"
    g = cells.withColumn(
        "__c", F.coalesce(F.sum("__n").over(wc), F.lit(0)).cast("long")
    )
    agg = g.agg(
        F.sum(
            F.col("__p").cast(dec)
            * (F.lit(2) * F.col("__c") + F.col("__n") + 1).cast(dec)
        ).alias("__s2"),
        F.sum("__p").cast("long").alias("__pos"),
        F.sum("__n").cast("long").alias("__tot"),
    )
    pos = F.col("__pos").cast(dec)
    neg = (F.col("__tot") - F.col("__pos")).cast(dec)
    ok = (F.col("__pos") > 0) & (F.col("__tot") > F.col("__pos"))
    auc = F.when(
        ok,
        F.round(
            (F.col("__s2") - pos * (pos + 1)).cast("double")
            / (F.lit(2.0) * pos.cast("double") * neg.cast("double")),
            6,
        ),
    )
    return agg.select(
        F.col("__pos").alias("n_pos"),
        (F.col("__tot") - F.col("__pos")).alias("n_neg"),
        auc.alias("auc"),
    )


def cohens_kappa(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Cohen's kappa between two categorical labelings — ONE row
    ``(n, p_observed, p_expected, kappa)``: chance-corrected agreement,
    the annotation-QA statistic (raw agreement flatters raters who both
    spam the majority class).  Typical use: a heuristic labeler vs the
    recorded ground truth, or two annotator passes over the same corpus.

    Exactness: from the (a, b) contingency cells, ``kappa =
    (n·diag − Σ_k row_k·col_k) / (n² − Σ_k row_k·col_k)`` — BOTH operands
    exact DECIMAL integers, so kappa is ONE IEEE division, rounded 6 dp
    (p_o and p_e likewise one division each).  p_e = 1 (a single shared
    class) yields NULL kappa.  NULL labels are excluded (no agreement
    semantics for missing ratings).

    Scale shape: one combinable (a, b) aggregate over the fact; every
    later frame is class-grid-sized (|A|·|B| cells, |A|+|B| marginals).

    Reference parity: no reference counterpart — evaluation extension
    next to chi2_independence, which tests ASSOCIATION; kappa measures
    AGREEMENT (a, b must share a label space).
    """
    cells = (
        df.filter(F.col(a_col).isNotNull() & F.col(b_col).isNotNull())
        .select(F.col(a_col).alias("__a"), F.col(b_col).alias("__b"))
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    rows = cells.groupBy("__a").agg(F.sum("__c").alias("__r"))
    colsums = cells.groupBy("__b").agg(F.sum("__c").alias("__k"))
    rc = (
        rows.join(colsums, rows["__a"] == colsums["__b"], "full_outer")
        .select(
            (
                F.coalesce(F.col("__r"), F.lit(0)).cast("decimal(38,0)")
                * F.coalesce(F.col("__k"), F.lit(0)).cast("decimal(38,0)")
            ).alias("__rc")
        )
        .agg(F.sum("__rc").alias("__src"))
    )
    totals = cells.agg(
        F.sum("__c").cast("long").alias("__n"),
        F.sum(F.when(F.col("__a") == F.col("__b"), F.col("__c"))
              .otherwise(F.lit(0))).cast("long").alias("__diag"),
    )
    dec = "decimal(38,0)"
    j = totals.crossJoin(F.broadcast(rc))  # 1-row x 1-row scalar join
    n = F.col("__n").cast(dec)
    num = n * F.col("__diag").cast(dec) - F.col("__src")
    den = n * n - F.col("__src")
    return j.select(
        F.col("__n").alias("n"),
        F.round(
            F.col("__diag").cast("double") / F.col("__n").cast("double"), 6
        ).alias("p_observed"),
        F.round(
            F.col("__src").cast("double")
            / (F.col("__n").cast("double") * F.col("__n").cast("double")),
            6,
        ).alias("p_expected"),
        F.when(
            den > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("kappa"),
    )


def fleiss_kappa(
    df: DataFrame,
    subject_col: str,
    category_col: str,
    m: int,
) -> DataFrame:
    """Fleiss' kappa for MULTI-rater categorical agreement — ONE row
    ``(n_subjects, n_ratings, p_observed, p_expected, kappa)``.  Cohen's
    kappa (:func:`cohens_kappa`) compares exactly two labelings; Fleiss
    generalizes to ``m`` ratings per subject with no rater identity —
    the statistic for m-way annotation passes, LLM-judge ensembles, and
    crowdsourced label QA.  Each input row is one rating; subjects whose
    rating count differs from ``m`` are EXCLUDED (Fleiss assumes a
    constant panel size; partial panels would need the Gwet/Krippendorff
    generalizations), and the excluded count is visible as
    ``n_subjects·m`` vs the raw row count.

    Exactness: with per-(subject, category) counts n_sc, row margins
    C_c = Σ_s n_sc, A = Σ_sc n_sc² − n·m and B = Σ_c C_c²,

        kappa = (A·n·m − B·(m−1)) / (((n·m)² − B)·(m−1))

    — both operands exact DECIMAL integers (the algebraic clearing of
    P̄ = A/(nm(m−1)) and P_e = B/(nm)²), so kappa is ONE IEEE division,
    rounded 6 dp; P̄ and P_e likewise one division each.  P_e = 1
    (one shared category) yields NULL.

    Scale shape: one combinable (subject, category) count, one
    combinable per-subject aggregate (the m filter + A), one combinable
    per-category aggregate (B), then 1-row scalar joins.  No windows,
    no collect.

    Reference parity: no reference counterpart — annotation-QA
    extension next to cohens_kappa (driver brief).
    """
    if m < 2:
        raise ValueError(f"fleiss_kappa needs m >= 2 ratings; got {m}")
    dec = "decimal(38,0)"
    sc = (
        df.filter(
            F.col(subject_col).isNotNull() & F.col(category_col).isNotNull()
        )
        .select(
            F.col(subject_col).alias("__s"),
            F.col(category_col).alias("__c"),
        )
        .groupBy("__s", "__c")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    per_subj = sc.groupBy("__s").agg(
        F.sum("__n").alias("__tot"),
        F.sum(F.col("__n").cast(dec) * F.col("__n")).alias("__sq"),
    ).filter(F.col("__tot") == m)
    a_tot = per_subj.agg(
        F.count(F.lit(1)).cast("long").alias("__nsub"),
        F.sum("__sq").alias("__sumsq"),
    )
    # category margins over COMPLETE subjects only
    cc = (
        sc.join(per_subj.select("__s"), "__s")
        .groupBy("__c")
        .agg(F.sum("__n").alias("__cc"))
        .select(
            (F.col("__cc").cast(dec) * F.col("__cc").cast(dec)).alias("__b")
        )
        .agg(F.sum("__b").alias("__bb"))
    )
    j = a_tot.crossJoin(F.broadcast(cc))  # 1-row x 1-row scalar join
    n = F.col("__nsub").cast(dec)
    nm = n * F.lit(m).cast(dec)
    a = F.col("__sumsq") - nm
    b = F.col("__bb")
    num = a * nm - b * F.lit(m - 1).cast(dec)
    den = (nm * nm - b) * F.lit(m - 1).cast(dec)
    return j.select(
        F.col("__nsub").alias("n_subjects"),
        (F.col("__nsub") * m).cast("long").alias("n_ratings"),
        F.when(
            F.col("__nsub") > 0,
            F.round(
                a.cast("double")
                / (nm * F.lit(m - 1).cast(dec)).cast("double"),
                6,
            ),
        ).alias("p_observed"),
        F.when(
            F.col("__nsub") > 0,
            F.round(b.cast("double") / (nm * nm).cast("double"), 6),
        ).alias("p_expected"),
        F.when(
            den > 0,
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("kappa"),
    )


def w1_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    n_buckets: int = 50,
) -> DataFrame:
    """Wasserstein-1 (earth-mover) distance between each group's value
    distribution and the whole corpus, over a shared equal-width bucket
    grid — per group ``(n, w1_units, w1_norm)``, most drifted first.
    Completes the drift family: psi_drift weighs log mass ratios,
    ks_drift takes the MAX CDF gap, js_drift is information-theoretic;
    W1 is the INTEGRAL CDF gap — it answers "how far, in value units,
    did the distribution move", which a max or a divergence cannot.

    Exactness: with exact integer bucket counts, ``Σ_b |cum_g·N −
    cum_all·n_g|`` is an exact DECIMAL integer; ``w1_norm = that /
    (n_g·N·n_buckets)`` ∈ [0,1] and ``w1_units = w1_norm·(hi−lo+1)``
    are fixed IEEE chains, rounded 6 dp.  Buckets come from the global
    (min,max) span — the ks_drift shared-bin pattern.

    Scale shape: one combinable (group, bucket) aggregate over the fact;
    the dense groups×buckets grid (absent buckets must still carry the
    corpus CDF) is a bounded-grid crossJoin (the js_drift contract), the
    per-group cumulative windows run over bucket-grid rows, and the
    corpus cumulative is a keyless window over ≤``n_buckets`` rows.

    Reference parity: no reference counterpart — drift extension
    (driver brief).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    base = df.filter(v.isNotNull()).select(
        F.col(group_col).alias("__g"), v.alias("__v")
    )
    span = base.agg(F.min("__v").alias("__lo"), F.max("__v").alias("__hi"))
    b = base.crossJoin(F.broadcast(span)).select(
        "__g",
        F.when(
            F.col("__hi") > F.col("__lo"),
            ((F.col("__v") - F.col("__lo")) * n_buckets)
            / (F.col("__hi") - F.col("__lo") + 1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("__b"),
    )
    # the span scalar comes from the 1-row aggregate itself — joining it
    # back via the fact lineage would rescan the base for a constant
    span_row = span.select(
        (F.col("__hi") - F.col("__lo") + 1).alias("__span")
    )
    counts = b.groupBy("__g", "__b").agg(F.count(F.lit(1)).alias("__c"))
    groups = counts.select("__g").distinct()
    buckets = counts.sparkSession.range(n_buckets).select(
        F.col("id").alias("__b")
    )
    grid = groups.crossJoin(F.broadcast(buckets))  # bounded |G| x n_buckets
    dense = grid.join(counts, ["__g", "__b"], "left").select(
        "__g", "__b", F.coalesce(F.col("__c"), F.lit(0)).alias("__c")
    )
    all_counts = buckets.join(
        counts.groupBy("__b").agg(F.sum("__c").alias("__ac")), "__b", "left"
    ).select("__b", F.coalesce("__ac", F.lit(0)).alias("__ac"))
    # DENSE over all n_buckets rows: a bucket with zero corpus mass must
    # still carry the RUNNING cumulative, not zero
    wa = Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, 0)
    # keyless window over <= n_buckets corpus rows: grid-bounded
    all_cum = all_counts.select(
        "__b", F.sum("__ac").over(wa).alias("__ca")
    )
    wg = Window.partitionBy("__g").orderBy("__b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dec = "decimal(38,0)"
    terms = (
        dense.withColumn("__cg", F.sum("__c").over(wg))
        .join(F.broadcast(all_cum), "__b", "left")
        .select(
            "__g",
            F.coalesce(F.col("__ca"), F.lit(0)).alias("__ca"),
            "__cg",
        )
    )
    ng = terms.groupBy("__g").agg(
        F.max("__cg").cast("long").alias("__ng"),  # last cum = group total
        F.max(F.coalesce("__ca", F.lit(0))).cast("long").alias("__N"),
    )
    num = (
        terms.join(F.broadcast(ng), "__g")
        .select(
            "__g",
            F.abs(
                F.col("__cg").cast(dec) * F.col("__N").cast(dec)
                - F.col("__ca").cast(dec) * F.col("__ng").cast(dec)
            ).alias("__t"),
            "__ng",
            "__N",
        )
        .groupBy("__g", "__ng", "__N")
        .agg(F.sum("__t").alias("__num"))
        .crossJoin(F.broadcast(span_row))  # 1-row span scalar
    )
    denom = (
        F.col("__ng").cast("double")
        * F.col("__N").cast("double")
        * F.lit(float(n_buckets))
    )
    w1n = F.col("__num").cast("double") / denom
    return num.select(
        F.col("__g").alias(group_col),
        F.col("__ng").alias("n"),
        F.round(w1n * F.col("__span").cast("double"), 6).alias("w1_units"),
        F.round(w1n, 6).alias("w1_norm"),
    ).orderBy(F.col("w1_norm").desc(), F.col(group_col).asc())


def did_estimate(
    df: DataFrame,
    value_col: str,
    treat_col,
    post_col,
) -> DataFrame:
    """Difference-in-differences point estimate — ONE row with the four
    cell means (control/treated × pre/post), cell sizes, and
    ``did = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre)`` — the
    quasi-experimental workhorse for launches WITHOUT randomization
    (ab_test_ztest / cuped_lift assume a randomized split; DiD nets out
    a fixed group gap and a shared time trend instead).

    Exactness: values are e6-quantized, so each cell's (n, Σ) is an
    exact integer pair; every mean is ONE IEEE division, and the DiD is
    a fixed chain over the four means, rounded 6 dp.  Any empty cell
    yields NULL did (the design is undefined without all four).

    Scale shape: ONE combinable 1-row aggregate over the fact — the
    cuped_lift shape; the caller supplies treat/post as boolean columns
    (e.g. a unit-hash arm and a launch-date cutoff).

    Reference parity: no reference counterpart — experimentation
    extension next to cuped_lift (driver brief).
    """
    t = treat_col if not isinstance(treat_col, str) else F.col(treat_col)
    p = post_col if not isinstance(post_col, str) else F.col(post_col)
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    base = df.filter(
        F.col(value_col).isNotNull() & t.isNotNull() & p.isNotNull()
    ).select(t.cast("int").alias("__t"), p.cast("int").alias("__p"), qv.alias("__v"))

    def cell(ti, pi, what):
        cond = (F.col("__t") == ti) & (F.col("__p") == pi)
        if what == "n":
            return F.sum(F.when(cond, 1).otherwise(0)).cast("long")
        # cast BEFORE summing: a LONG accumulator would silently wrap past
        # 2^63 of e6-quantized cell mass (the oracle sums HUGEINT)
        return F.sum(
            F.when(cond, F.col("__v")).otherwise(F.lit(0)).cast("decimal(38,0)")
        )

    agg = base.groupBy().agg(
        cell(0, 0, "n").alias("n_c_pre"), cell(0, 0, "s").alias("__s_c_pre"),
        cell(0, 1, "n").alias("n_c_post"), cell(0, 1, "s").alias("__s_c_post"),
        cell(1, 0, "n").alias("n_t_pre"), cell(1, 0, "s").alias("__s_t_pre"),
        cell(1, 1, "n").alias("n_t_post"), cell(1, 1, "s").alias("__s_t_post"),
    )

    def mean(s, n):
        # guarded: ANSI mode errors on division by a zero count
        return F.when(
            F.col(n) > 0,
            F.col(s).cast("double")
            / (F.col(n).cast("double") * F.lit(1.0e6)),
        )

    ok = (
        (F.col("n_c_pre") > 0) & (F.col("n_c_post") > 0)
        & (F.col("n_t_pre") > 0) & (F.col("n_t_post") > 0)
    )
    m_c_pre = mean("__s_c_pre", "n_c_pre")
    m_c_post = mean("__s_c_post", "n_c_post")
    m_t_pre = mean("__s_t_pre", "n_t_pre")
    m_t_post = mean("__s_t_post", "n_t_post")
    return agg.select(
        "n_c_pre", "n_c_post", "n_t_pre", "n_t_post",
        F.round(m_c_pre, 6).alias("mean_c_pre"),
        F.round(m_c_post, 6).alias("mean_c_post"),
        F.round(m_t_pre, 6).alias("mean_t_pre"),
        F.round(m_t_post, 6).alias("mean_t_post"),
        F.when(
            ok, F.round((m_t_post - m_t_pre) - (m_c_post - m_c_pre), 6)
        ).alias("did"),
    )


#: two-sided z critical values for the mde_power defaults — Python-literal
#: constants (Φ⁻¹(0.975), Φ⁻¹(0.8)) so no engine evaluates an inverse CDF.
Z_ALPHA_025 = 1.959963984540054
Z_POWER_080 = 0.8416212335729143


def mde_power(
    df: DataFrame,
    value_col: str,
    stratum_col: str,
    z_alpha: float = Z_ALPHA_025,
    z_power: float = Z_POWER_080,
) -> DataFrame:
    """Minimum detectable effect per stratum — the experiment PLANNING
    readout (ab_test_ztest/cuped/mSPRT analyze a finished test; this says
    what a future 50/50 test on the same traffic could even see): per
    stratum ``(n, mean, sd, mde_abs, mde_rel)`` where

        mde_abs = (z_α/2 + z_power) · √(4·s²/n)

    — the classic two-sample formula with n/2 per arm, α = 5% two-sided
    and 80% power by default (the z constants are Python literals, no
    engine evaluates Φ⁻¹).  ``mde_rel`` = mde_abs/|mean| is the lift the
    test can detect; strata where it exceeds ~0.1 need pooling, CUPED,
    or more runtime — THE go/no-go number experiment review asks for.

    Exactness: n, Σv, Σv² are exact integers from e6-quantized values
    (the neyman_allocation discipline); s², mean, and the mde chain are
    a fixed sequence of IEEE ops on those integers, each rounded 6 dp at
    the OUTPUT only.  Single-row strata and zero means yield NULLs.

    Scale shape: ONE combinable per-stratum aggregate over the fact;
    everything after is strata-sized.  No window, no join, no collect.

    Reference parity: no reference counterpart — experimentation
    extension next to did_estimate/cuped (driver brief).
    """
    dec = "decimal(38,0)"
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    per = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(stratum_col).isNotNull()
        )
        .select(F.col(stratum_col).alias("__h"), qv.alias("__v"))
        .groupBy("__h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.col("__v").cast(dec)).alias("__s"),
            F.sum(F.col("__v").cast(dec) * F.col("__v")).alias("__ss"),
        )
    )
    n = F.col("__n").cast(dec)
    mean = (
        F.col("__s").cast("double")
        / F.col("__n").cast("double")
        / F.lit(1.0e6)
    )
    var_num = n * F.col("__ss") - F.col("__s") * F.col("__s")
    var_den = n * (n - 1)
    sd = F.when(
        (F.col("__n") > 1) & (var_num >= 0),
        F.sqrt(var_num.cast("double") / var_den.cast("double"))
        / F.lit(1.0e6),
    )
    mde = (
        F.lit(float(z_alpha) + float(z_power))
        * F.sqrt(
            F.lit(4.0) * sd * sd / F.col("__n").cast("double")
        )
    )
    return per.select(
        F.col("__h").alias(stratum_col),
        F.col("__n").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.round(sd, 6).alias("sd"),
        F.round(mde, 6).alias("mde_abs"),
        F.when(
            F.abs(F.col("__s").cast("double")) > 0,
            F.round(mde / F.abs(mean), 6),
        ).alias("mde_rel"),
    ).orderBy(F.col(stratum_col).asc())


#: Bradley–Terry fixed-point scales: strengths live at ~BT_SCALE, the
#: per-pair floor terms at BT_SCALE2 — exact integers end to end
#: (arbitrary-precision Python here, HUGEINT in the oracle).
BT_SCALE = 10**12
BT_SCALE2 = 10**18


def bradley_terry(
    matches: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iterations: int = 20,
) -> DataFrame:
    """Bradley–Terry strengths from pairwise preference outcomes — the
    model behind reward-model preference data, ranker A/B aggregation,
    and match-play ratings: P(i beats j) = s_i/(s_i+s_j), fit by
    Hunter's (2004) MM algorithm.  Returns one row per item:
    ``(item, n_wins, n_matches, strength, share)``, item-sorted.

    Exactness — the same fixed-point integer discipline as
    ``markov_attribution``: strengths are exact integers at
    ``BT_SCALE``; each MM round computes, in arbitrary-precision ints,

        d_i  = Σ_j ⌊ n_ij·BT_SCALE2 / (s_i + s_j) ⌋
        r_i  = ⌊ w_i·BT_SCALE2 / d_i ⌋          (0 when w_i = 0)
        s_i' = ⌊ r_i·|items|·BT_SCALE / Σ r ⌋    (re-normalization pins
                Σ s ≈ |items|·BT_SCALE, keeping every floor term > 0;
                items with ≥1 win are additionally pinned to s' ≥ 1, so
                every PAIR keeps s_i + s_j ≥ 1 — no round divides by 0)

    — the oracle unrolls the identical HUGEINT recurrence, so both
    engines agree bit-for-bit at every round; ``iterations`` bounds MM
    refinement identically on both sides (the MM map is monotone in
    likelihood; 20 rounds is ample at item counts this model is for).
    ``share`` = s_i/Σs is one IEEE division at the end.  An item with
    zero wins converges to strength 0 (its true MLE); an item with zero
    LOSSES is a divergent MLE — bounded iterations keep it finite,
    identically in both engines.

    Scale shape: the 100 TB work is ONE combinable (winner, loser)
    aggregate over the match fact; the MM solve runs on the COLLECTED
    pair-count matrix — bounded metadata, |items|² for a
    dictionary-sized item set (brands, models, arms), the
    markov_attribution contract.  Self-matches (winner == loser) are
    dropped.

    Reference parity: no reference counterpart — preference-data
    extension next to did_estimate/ab_test (driver brief).
    """
    spark = matches.sparkSession
    counts = (
        matches.filter(
            F.col(winner_col).isNotNull()
            & F.col(loser_col).isNotNull()
            & (F.col(winner_col) != F.col(loser_col))
        )
        .groupBy(
            F.col(winner_col).alias("__w"), F.col(loser_col).alias("__l")
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    # bounded metadata: |items|² pair counts (the markov contract)
    rows = [(r["__w"], r["__l"], int(r["__c"])) for r in counts.collect()]
    items = sorted({w for w, _, _ in rows} | {l for _, l, _ in rows})
    if not items:
        from cerebro_spark.operators.util import small_df

        return small_df(
            spark,
            [],
            "item string, n_wins long, n_matches long, "
            "strength double, share double",
        )
    wins = {i: 0 for i in items}
    nij: dict[tuple, int] = {}
    for w, l, c in rows:
        wins[w] += c
        key = (w, l) if w < l else (l, w)
        nij[key] = nij.get(key, 0) + c
    opp = {i: [] for i in items}
    for (a, b), c in nij.items():
        opp[a].append((b, c))
        opp[b].append((a, c))
    s = {i: BT_SCALE for i in items}
    k = len(items)
    for _ in range(iterations):
        d = {
            i: sum(c * BT_SCALE2 // (s[i] + s[j]) for j, c in opp[i])
            for i in items
        }
        r = {
            i: (wins[i] * BT_SCALE2 // d[i]) if d[i] > 0 else 0
            for i in items
        }
        t = sum(r.values())
        if t == 0:  # no wins anywhere — all strengths collapse
            s = {i: 0 for i in items}
            break
        # floor-of-1 pin for any item with a win: every pair contains a
        # winner, so s_i + s_j >= 1 and no round can divide by zero
        s = {
            i: max(r[i] * k * BT_SCALE // t, 1) if wins[i] > 0
            else r[i] * k * BT_SCALE // t
            for i in items
        }
    tot = sum(s.values())
    out = [
        (
            i,
            wins[i],
            sum(c for _, c in opp[i]),
            float(s[i]) / BT_SCALE,
            (float(s[i]) / float(tot)) if tot > 0 else None,
        )
        for i in items
    ]
    from cerebro_spark.operators.util import small_df

    return small_df(
        spark,
        out,
        "item string, n_wins long, n_matches long, "
        "strength double, share double",
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch of a key column — the ``depth × width`` counter
    table ``(row, bucket, c)``: row r's bucket is the portable md5 hash
    of ``'r|key'`` mod width, so the sketch is reproducible in any
    engine and MERGEABLE by summing cells (the serving-layer property:
    per-partition/per-day sketches add up).  Estimate a key's count by
    probing min over rows (:func:`cms_heavy_hitters` does both sides).

    Scale shape: one posexplode (×depth) + ONE combinable groupBy — the
    sketch is ``depth·width`` rows regardless of data size; at 100 TB
    you keep the 1 024-row table and drop the fact.

    Reference parity: no reference counterpart — sketch extension next
    to theta_sketch_rollup (driver brief).
    """
    from .sampling import _portable_bucket

    key = F.col(key_col)
    buckets = F.array(
        *[
            _portable_bucket(
                F.concat_ws("|", F.lit(str(r)), key), width
            ).cast("long")
            for r in range(depth)
        ]
    )
    return (
        df.filter(key.isNotNull())
        .select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    k: int = 20,
) -> DataFrame:
    """Exact top-k keys with their count-min estimates side by side —
    ``(key, exact_n, cms_n, overcount)``: the sketch-accuracy readout
    that decides whether a ``depth × width`` CMS can replace the exact
    count table in a serving layer.  ``cms_n ≥ exact_n`` ALWAYS (the CMS
    one-sided error guarantee — every probe hash collides upward, never
    down); ``overcount`` measures the collision mass at this width.

    Exactness: bucket ids are portable md5 hashes, counts exact
    integers, the estimate an exact integer MIN over ``depth`` cells —
    no IEEE op anywhere, both engines agree bit-for-bit.

    Scale shape: the sketch build is one combinable groupBy (bounded
    ``depth·width`` output); the exact top-k is one combinable groupBy +
    TakeOrdered; probing joins the k·depth probe rows against the
    BROADCAST sketch.  Ordering (exact_n desc, key asc) is total.

    Reference parity: no reference counterpart — sketch extension next
    to theta_sketch_rollup (driver brief).
    """
    from .sampling import _portable_bucket

    sketch = count_min_sketch(df, key_col, depth, width)
    key = F.col(key_col)
    exact = (
        df.filter(key.isNotNull())
        .groupBy(key.alias("key"))
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("key").asc())
        .limit(k)
    )
    probes = exact.select(
        "key",
        "exact_n",
        F.posexplode(
            F.array(
                *[
                    _portable_bucket(
                        F.concat_ws("|", F.lit(str(r)), F.col("key")), width
                    ).cast("long")
                    for r in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    est = (
        probes.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("key", "exact_n")
        .agg(F.min("c").alias("cms_n"))
    )
    return est.select(
        "key",
        "exact_n",
        "cms_n",
        (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
    ).orderBy(F.col("exact_n").desc(), F.col("key").asc())


def t_closeness(
    df: DataFrame,
    qi_cols: list,
    sensitive_col: str,
    n_buckets: int = 50,
    t: float = 0.2,
) -> DataFrame:
    """t-closeness audit (Li, Li & Venkatasubramanian, ICDE'07) — per
    quasi-identifier class, the distance between the class's SENSITIVE-
    attribute distribution and the whole table's, flagged against the
    privacy budget ``t``: ``(qi_class, n, t_distance, is_violation)``.
    Completes the governance family: k-anonymity bounds class SIZE,
    l-diversity bounds sensitive VARIETY; t-closeness bounds what the
    class reveals about the sensitive VALUE — a class of 50 users all
    earning the corpus-top decile passes both k and l yet leaks.

    The distance is the ordered-numeric EMD of the paper, computed as
    :func:`w1_drift`'s integral CDF gap over a shared equal-width grid,
    normalized to [0, 1] (``w1_norm``) — exact integer cumulative gaps,
    one IEEE division per class.  The sensitive column should be
    integer-valued (pre-floor a double on BOTH engines — Spark's
    long-cast truncates, DuckDB's rounds).

    Scale shape: inherited from w1_drift — one combinable
    (class, bucket) aggregate, bounded class×bucket grids, grid-sized
    windows only.

    Reference parity: no reference counterpart — privacy extension next
    to k_anonymity/l_diversity (driver brief).
    """
    key = F.concat_ws(
        "|", *[F.col(c).cast("string") for c in qi_cols]
    )
    base = df.withColumn("__qi", key)
    out = w1_drift(base, sensitive_col, "__qi", n_buckets)
    return out.select(
        F.col("__qi").alias("qi_class"),
        "n",
        F.col("w1_norm").alias("t_distance"),
        (F.col("w1_norm") >= t).alias("is_violation"),
    ).orderBy(F.col("t_distance").desc(), F.col("qi_class").asc())


def fk_orphan_audit(edges) -> DataFrame:
    """Referential-integrity audit over FK edges — one row per edge:
    ``(edge, child_rows, null_fk, orphan_fk, orphan_rate)`` where an
    orphan is a non-null FK with no matching parent key.  The data-
    quality gate every warehouse load should publish next to its row
    counts: silent orphan growth is how a broken upstream join ships.

    ``edges`` is a list of ``(name, child_df, fk_col, parent_df,
    pk_col)``.  Exactness: three exact integer counts per edge, one
    IEEE division for the rate (rounded 6 dp).

    Scale shape: per edge, one projection-only scan of the child joined
    LEFT onto the parent's distinct keys (AQE broadcasts dimension-sized
    parents; fact-sized parents shuffle on the key — the join IS the
    audit), then one combinable 1-row aggregate; edges union into a
    |edges|-row frame.  Run it as the maintenance job's health report.

    Reference parity: no reference counterpart — data-quality extension
    next to column_profile/table_fingerprint (driver brief).
    """
    from functools import reduce

    outs = []
    for name, child, fk, parent, pk in edges:
        pkeys = parent.select(F.col(pk).alias("__pk")).distinct()
        j = child.select(F.col(fk).alias("__fk")).join(
            pkeys, F.col("__fk") == F.col("__pk"), "left"
        )
        outs.append(
            j.agg(
                F.count(F.lit(1)).cast("long").alias("child_rows"),
                F.sum(F.col("__fk").isNull().cast("long"))
                .cast("long")
                .alias("null_fk"),
                F.sum(
                    (
                        F.col("__fk").isNotNull() & F.col("__pk").isNull()
                    ).cast("long")
                )
                .cast("long")
                .alias("orphan_fk"),
            ).select(F.lit(name).alias("edge"), "*")
        )
    u = reduce(DataFrame.unionByName, outs)
    return u.select(
        "edge",
        "child_rows",
        "null_fk",
        "orphan_fk",
        F.when(
            F.col("child_rows") > 0,
            F.round(
                F.col("orphan_fk").cast("double")
                / F.col("child_rows").cast("double"),
                6,
            ),
        ).alias("orphan_rate"),
    ).orderBy(F.col("edge").asc())


def hill_tail_index(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    k: int = 100,
) -> DataFrame:
    """Hill estimator of the heavy-tail index per group — ``(n, k_used,
    alpha)`` where ``alpha = [ (1/k) Σᵢ (ln x₍ᵢ₎ − ln x₍ₖ₊₁₎) ]⁻¹`` over
    the top k+1 order statistics (Hill 1975).  THE tail diagnostic the
    moment family can't give: winsorized_mean treats the tail as noise,
    revenue_gini measures concentration; alpha says whether the tail is
    even INTEGRABLE — alpha ≤ 1 means the mean itself diverges and every
    per-group average downstream is meaningless, alpha ≤ 2 kills the
    variance (and with it the t-test/CUPED machinery).

    Exactness: only values > 0 enter; each top-value's ln is e6-quantized
    to a BIGINT (the zipf_slope discipline), the Hill numerator
    ``Σ qᵢ − m·q_last`` is an exact integer, and alpha is ONE IEEE
    division, rounded 6 dp.  Groups with fewer than 3 positive values or
    an all-equal top (numerator 0) yield NULL.  The top-(k+1) set is
    picked under the total order (value desc, id asc) — tie membership
    at the boundary is engine-independent.

    Scale shape: one per-group top-(k+1) window (WindowGroupLimit prunes
    beyond k+1 before the sort materializes) + one combinable per-group
    aggregate; the full-group count rides the same aggregate via a
    second window-free pass.

    Reference parity: no reference counterpart — heavy-tail extension
    next to winsorized_mean/esd (driver brief).
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    base = df.filter(v.isNotNull() & (v > 0)).select(
        F.col(group_col).alias("__g"),
        v.alias("__v"),
        F.col(id_col).alias("__i"),
    )
    w = Window.partitionBy("__g").orderBy(
        F.col("__v").desc(), F.col("__i").asc()
    )
    topk = base.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k + 1
    )
    q = F.floor(F.log(F.col("__v")) * F.lit(1.0e6) + F.lit(0.5)).cast(
        "long"
    )
    per = topk.select("__g", "__rn", q.alias("__q"))
    agg = per.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("__m"),
        F.sum("__q").alias("__sq"),
        F.min("__q").alias("__qlast"),  # rank-m row has the smallest q
    )
    tot = base.groupBy("__g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    j = tot.join(agg, "__g")
    m1 = F.col("__m") - 1  # k_used
    num = F.col("__sq") - F.col("__m") * F.col("__qlast") # Σ(q_i − q_last) over all m rows (the last contributes 0)
    return j.select(
        F.col("__g").alias(group_col),
        "n",
        m1.cast("long").alias("k_used"),
        F.when(
            (F.col("__m") >= 3) & (num > 0),
            F.round(
                m1.cast("double") * F.lit(1.0e6) / num.cast("double"), 6
            ),
        ).alias("alpha"),
    ).orderBy(F.col(group_col).asc())


def dispersion_index(
    df: DataFrame,
    time_col: str,
    key_col: str,
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Index of dispersion (variance-to-mean ratio) of per-bucket event
    counts — per key ``(n_buckets, total, mean_count, vmr,
    overdispersed)``.  A Poisson arrival stream has VMR = 1; VMR ≫ 1 is
    burstiness (batched upstream flushes, incident storms), VMR ≪ 1 a
    suspiciously regular (throttled/synthetic) feed — the arrival-
    process diagnostic ``interarrival_stats`` (gap moments) and
    ``hourly_seasonality`` (profile shape) don't give.

    Buckets span the key's OBSERVED [min, max] bucket range — silent
    buckets count as zero (a bursty feed IS one with empty buckets; the
    dense grid is what makes VMR mean anything).

    Exactness: bucket counts are exact integers on a dense per-key
    grid; with m buckets, Σc and Σc², ``vmr = ((m·Σc² − S²)·1) /
    (m·(m−1)) / (S/m) = (m·Σc² − S²) / ((m−1)·S)`` — ONE division of
    exact DECIMAL integers, rounded 6 dp.  Keys with <2 buckets or
    S = 0 yield NULL.

    Scale shape: one combinable (key, bucket) count; the dense grid is
    per-key-span-sized via ``sequence`` (bounded by time range /
    bucket — calendar-bounded, never data-sized); one combinable
    per-key aggregate.

    Reference parity: no reference counterpart — arrival-process
    extension next to interarrival_stats (driver brief).
    """
    dec = "decimal(38,0)"
    b = F.floor(
        F.col(time_col).cast("double") / F.lit(float(bucket_seconds))
    ).cast("long")
    base = df.filter(
        F.col(time_col).isNotNull() & F.col(key_col).isNotNull()
    ).select(F.col(key_col).alias("__k"), b.alias("__b"))
    counts = base.groupBy("__k", "__b").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    span = counts.groupBy("__k").agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    # dense per-key bucket grid: sequence over the observed span —
    # calendar-bounded (span/bucket entries), never data-sized
    grid = span.select(
        "__k", F.explode(F.sequence("__lo", "__hi")).alias("__b")
    )
    dense = grid.join(counts, ["__k", "__b"], "left").select(
        "__k", F.coalesce(F.col("__c"), F.lit(0)).alias("__c")
    )
    agg = dense.groupBy("__k").agg(
        F.count(F.lit(1)).cast("long").alias("__m"),
        F.sum(F.col("__c").cast(dec)).alias("__s"),
        F.sum(F.col("__c").cast(dec) * F.col("__c")).alias("__ss"),
    )
    m = F.col("__m").cast(dec)
    num = m * F.col("__ss") - F.col("__s") * F.col("__s")
    den = (m - 1) * F.col("__s")
    vmr = F.when(
        (F.col("__m") > 1) & (F.col("__s") > 0),
        F.round(num.cast("double") / den.cast("double"), 6),
    )
    return agg.select(
        F.col("__k").alias(key_col),
        F.col("__m").alias("n_buckets"),
        F.col("__s").cast("long").alias("total"),
        F.round(
            F.col("__s").cast("double") / F.col("__m").cast("double"), 6
        ).alias("mean_count"),
        vmr.alias("vmr"),
        (vmr > 1.0).alias("overdispersed"),
    ).orderBy(F.col(key_col).asc())


def mcnemar_test(
    df: DataFrame,
    a_correct,
    b_correct,
) -> DataFrame:
    """McNemar's test for two PAIRED classifiers on the same examples —
    ONE row ``(n, n_both, only_a, only_b, n_neither, chi2)``: are A and B
    actually different, or do they just disagree symmetrically?  The
    model-comparison statistic accuracy deltas can't give (two models
    with identical accuracy can still be complementary — ensemble
    material — and the discordant cells are where that lives); the
    paired companion of :func:`cohens_kappa` (agreement) and the
    classifier analogue of the ranker sign test.

    ``chi2 = (only_a − only_b)² / (only_a + only_b)`` (the df=1
    statistic without continuity correction — the convention the z²
    identity needs); NULL when the classifiers never disagree.

    Exactness: four exact integer cells from one combinable 1-row
    aggregate; chi2 is one exact-integer square and ONE IEEE division,
    rounded 6 dp.

    Reference parity: no reference counterpart — evaluation extension
    next to cohens_kappa/ab_test (driver brief).
    """
    a = a_correct.cast("int")
    bc = b_correct.cast("int")
    base = df.select(a.alias("__a"), bc.alias("__b")).filter(
        F.col("__a").isNotNull() & F.col("__b").isNotNull()
    )
    agg = base.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(
            ((F.col("__a") == 1) & (F.col("__b") == 1)).cast("long")
        ).alias("n_both"),
        F.sum(
            ((F.col("__a") == 1) & (F.col("__b") == 0)).cast("long")
        ).alias("only_a"),
        F.sum(
            ((F.col("__a") == 0) & (F.col("__b") == 1)).cast("long")
        ).alias("only_b"),
        F.sum(
            ((F.col("__a") == 0) & (F.col("__b") == 0)).cast("long")
        ).alias("n_neither"),
    )
    dec = "decimal(38,0)"
    d = F.col("only_a").cast(dec) - F.col("only_b").cast(dec)
    disc = F.col("only_a") + F.col("only_b")
    return agg.select(
        "n",
        "n_both",
        "only_a",
        "only_b",
        "n_neither",
        F.when(
            disc > 0,
            F.round((d * d).cast("double") / disc.cast("double"), 6),
        ).alias("chi2"),
    )


def eb_shrunk_means(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Empirical-Bayes (James–Stein style) shrinkage of per-group means
    toward the grand mean — per group ``(n, mean, shrunk)`` with
    ``shrunk = grand + B·(mean − grand)``, ``B = τ²/(τ² + σ²/n)`` from
    the one-way random-effects method-of-moments fit.  THE serving-layer
    answer to "this user/item has 3 observations — is their mean real?":
    small-n groups shrink hard toward the prior, large-n groups keep
    their own mean.  A raw per-group average table ships noise; this
    ships the posterior.

    Exactness: values are e6-quantized, per-group (n, Σq, Σq²) exact
    DECIMAL integers.  The cross-group reductions that are normally
    order-sensitive rationals are made ORDER-FREE by per-group integer
    floor division: ``QSᵢ = ⌊sᵢ²/nᵢ⌋`` (exact DECIMAL, error < 1 per
    group, identical in both engines), so ``SSB = ΣQS − ⌊S²/N⌋`` and
    ``SSW = ΣSS − ΣQS`` are exact integers.  MSB, MSW, n₀ =
    (N − ⌊Σn²/N⌋_as-double)/(G−1), τ̂² = max(0, (MSB−MSW)/n₀) and each
    group's B are then a FIXED IEEE chain mirrored op-for-op in the
    oracle; shrunk is rounded 6 dp.  Degenerate fits (G < 2, N ≤ G →
    MSW undefined) return the raw means with NULL shrunk.

    Scale shape: ONE combinable per-group aggregate over the fact, one
    1-row reduce over the group frame, one broadcast of that scalar row
    back onto the group frame.  No window, no collect.

    Reference parity: no reference counterpart — hierarchical-stats
    extension next to target_encode_oof (which smooths the same way
    with a FIXED prior weight; EB fits the weight from the data)
    (driver brief).
    """
    dec = "decimal(38,0)"
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    per = (
        df.filter(
            F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
        )
        .select(F.col(group_col).alias("__g"), qv.alias("__v"))
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.col("__v").cast(dec)).alias("__s"),
            F.sum(F.col("__v").cast(dec) * F.col("__v")).alias("__ss"),
        )
    )

    def idiv(a, b):
        # exact integer floor division on non-negative DECIMALs (a%b is
        # exact; (a - a%b)/b divides exactly) — Python's // and
        # DuckDB's // reproduce it bit-for-bit
        return (a - F.pmod(a, b)) / b

    n = F.col("__n").cast(dec)
    per = per.withColumn("__qs", idiv(F.col("__s") * F.col("__s"), n))
    # NB: glob column names must not collide with per's even
    # case-insensitively (Spark's default resolution)
    glob = per.agg(
        F.count(F.lit(1)).cast("long").alias("__gcnt"),
        F.sum("__n").cast(dec).alias("__ntot"),
        F.sum("__s").alias("__stot"),
        F.sum("__ss").alias("__sstot"),
        F.sum("__qs").alias("__qstot"),
        F.sum(n * n).alias("__n2tot"),
    )
    gN = F.col("__ntot")
    ssb = F.col("__qstot") - idiv(F.col("__stot") * F.col("__stot"), gN)
    ssw = F.col("__sstot") - F.col("__qstot")
    glob = glob.select(
        "__gcnt", "__ntot", "__stot",
        ssb.alias("__ssb"), ssw.alias("__ssw"),
        idiv(F.col("__n2tot"), gN).alias("__n2overn"),
    )
    j = per.crossJoin(F.broadcast(glob))  # 1-row fit scalars
    G = F.col("__gcnt").cast("double")
    Nn = F.col("__ntot").cast("double")
    msb = F.col("__ssb").cast("double") / (G - F.lit(1.0))
    msw = F.col("__ssw").cast("double") / (Nn - G)
    n0 = (Nn - F.col("__n2overn").cast("double")) / (G - F.lit(1.0))
    tau2 = F.greatest((msb - msw) / n0, F.lit(0.0))
    grand = F.col("__stot").cast("double") / Nn / F.lit(1.0e6)
    mean = (
        F.col("__s").cast("double")
        / F.col("__n").cast("double")
        / F.lit(1.0e6)
    )
    bshrink = tau2 / (tau2 + msw / F.col("__n").cast("double"))
    ok = (F.col("__gcnt") > 1) & (
        F.col("__ntot").cast("long") > F.col("__gcnt")
    )
    return j.select(
        F.col("__g").alias(group_col),
        F.col("__n").alias("n"),
        F.round(mean, 6).alias("mean"),
        F.when(
            ok, F.round(grand + bshrink * (mean - grand), 6)
        ).alias("shrunk"),
    ).orderBy(F.col(group_col).asc())


def transition_entropy(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Conditional entropy of the event-sequence transitions — ONE row
    ``(n_transitions, n_states, cond_entropy_nats)`` with
    ``H(next | prev) = Σᵢⱼ (cᵢⱼ/N)·ln(rᵢ/cᵢⱼ)``: how predictable is the
    NEXT event given the current one?  0 = deterministic journeys,
    ln(k) = memoryless uniform — the sequence-predictability number
    behind markov_attribution's chain (the chain model is only worth
    running when H is meaningfully below ln(k)), and the
    journey-complexity metric funnels can't give.

    Exactness: transition counts cᵢⱼ and row margins rᵢ are exact
    integers; each cell's ``ln(rᵢ/cᵢⱼ)`` is e6-quantized to a BIGINT
    (the zipf/hill discipline — ln of a ratio of exact ints, floor+½),
    the weighted sum ``Σ cᵢⱼ·qᵢⱼ`` is an exact DECIMAL (ORDER-FREE),
    and H is ONE IEEE division by N·10⁶, rounded 6 dp.

    Scale shape: one per-user ordered window for the (prev, next) pairs
    (partitioned BY USER — never data-sized), one combinable cell count,
    one margin join on the state-grid-sized cell frame, one 1-row
    reduce.

    Reference parity: no reference counterpart — journey-analytics
    extension next to markov_attribution (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    steps = (
        df.filter(
            F.col(user_col).isNotNull() & F.col(type_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("__u"),
            F.lag(F.col(type_col)).over(w).alias("__prev"),
            F.col(type_col).alias("__next"),
        )
        .filter(F.col("__prev").isNotNull())
    )
    cells = steps.groupBy("__prev", "__next").agg(
        F.count(F.lit(1)).alias("__c")
    )
    margins = cells.groupBy("__prev").agg(F.sum("__c").alias("__r"))
    q = F.floor(
        F.log(F.col("__r").cast("double") / F.col("__c").cast("double"))
        * F.lit(1.0e6)
        + F.lit(0.5)
    ).cast("long")
    terms = cells.join(margins, "__prev").select(
        F.col("__c"),
        (F.col("__c").cast(dec) * q.cast(dec)).alias("__t"),
        F.col("__next"),
    )
    agg = terms.agg(
        F.sum(F.col("__c").cast(dec)).alias("__N"),
        F.sum("__t").alias("__T"),
        F.countDistinct("__next").cast("long").alias("n_states"),
    )
    return agg.select(
        F.col("__N").cast("long").alias("n_transitions"),
        "n_states",
        F.when(
            F.col("__N") > 0,
            F.round(
                F.col("__T").cast("double")
                / (F.col("__N").cast("double") * F.lit(1.0e6)),
                6,
            ),
        ).alias("cond_entropy_nats"),
    )


def spearman_corr(
    df: DataFrame,
    x_col: str,
    y_col: str,
    quant: int = 100,
) -> DataFrame:
    """Spearman rank correlation of two numeric columns — ONE row
    ``(n, spearman)``: the MONOTONE-association companion of the Pearson
    family (``value_corr_matrix`` measures linear association; a clean
    monotone-but-curved relation scores Pearson ≪ 1 and Spearman ≈ 1,
    and one outlier that shreds Pearson barely moves a rank).

    Both columns are quantized to ``1/quant`` units (the roc_auc
    contract — the documented metric is "Spearman at quantized values",
    identical in any engine); ties get midranks via the exclusive
    cumulative over each VALUE GRID: ``2·midrank = 2c + n + 1`` is an
    exact integer per quantum, so the five Pearson-of-ranks moments are
    exact DECIMALs and r is a fixed (two sqrts, one division) IEEE
    chain, rounded 6 dp.  NULL when either rank variance is 0.

    Overflow envelope: N·Σ(2mr)² ≈ 4N⁴ must stay inside DECIMAL(38) —
    fine to N ≈ 10⁹ rows; beyond that pre-aggregate or sample.

    Scale shape: two combinable grid aggregates, two quantization-
    bounded grid windows, two BROADCAST grid joins back onto the fact
    (the grid is (max−min)·quant+1 rows, never data-sized), one 1-row
    reduce.

    Reference parity: no reference counterpart — robust-stats extension
    next to value_corr_matrix (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"

    def q(c):
        return F.floor(
            F.col(c).cast("double") * F.lit(float(quant)) + F.lit(0.5)
        ).cast("long")

    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(q(x_col).alias("__x"), q(y_col).alias("__y"))

    def rank_map(col_name: str, out: str) -> DataFrame:
        g = base.groupBy(col_name).agg(F.count(F.lit(1)).alias("__n"))
        wc = Window.orderBy(col_name).rowsBetween(
            Window.unboundedPreceding, -1
        )
        # value-grid-sized keyless window (the roc_auc contract)
        return g.select(
            col_name,
            (
                F.lit(2) * F.coalesce(F.sum("__n").over(wc), F.lit(0))
                + F.col("__n")
                + 1
            ).alias(out),
        )

    rx = rank_map("__x", "__rx")
    ry = rank_map("__y", "__ry")
    j = base.join(F.broadcast(rx), "__x").join(F.broadcast(ry), "__y")
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("__m"),
        F.sum(F.col("__rx").cast(dec)).alias("__sx"),
        F.sum(F.col("__ry").cast(dec)).alias("__sy"),
        F.sum(F.col("__rx").cast(dec) * F.col("__rx")).alias("__sxx"),
        F.sum(F.col("__ry").cast(dec) * F.col("__ry")).alias("__syy"),
        F.sum(F.col("__rx").cast(dec) * F.col("__ry")).alias("__sxy"),
    )
    m = F.col("__m").cast(dec)
    num = m * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    dx = m * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = m * F.col("__syy") - F.col("__sy") * F.col("__sy")
    return agg.select(
        F.col("__m").alias("n"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(
                num.cast("double")
                / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double"))),
                6,
            ),
        ).alias("spearman"),
    )


def ips_uniform_value(
    df: DataFrame,
    action_col: str,
    reward_col: str,
) -> DataFrame:
    """Inverse-propensity-scored value of the UNIFORM exploration policy
    from logged bandit feedback — ONE row ``(n, k_actions, logged_mean,
    ips_uniform, ess)``: what would an agent playing every action
    equally often have earned on this log?  The off-policy-evaluation
    primitive behind bandit/RLHF data work: ``logged_mean`` is what the
    logging policy earned, ``ips_uniform = (1/k)·Σ_a mean_reward(a)``
    is the balanced counterfactual (they diverge exactly when the
    logger's action mix is skewed), and ``ess = k²/Σ_a(1/n_a)`` is the
    effective sample size — a rarely-logged action makes the estimate
    fragile long before it makes it wrong, and ESS is the number that
    says so.

    Exactness: per-action ``(n_a, Σr)`` are exact e6 integers; the
    order-sensitive cross-action rationals are e6-floor-quantized to
    integers per action (``⌊S_a·10⁶/(k·n_a)⌋``, ``⌊10¹²/n_a⌋`` — the
    eb_shrunk_means discipline) so their sums are ORDER-FREE, and each
    output is one final IEEE division, rounded 6 dp.

    Scale shape: ONE combinable per-action aggregate over the log, a
    1-row reduce over the action frame, one broadcast back.  No window,
    no collect.

    Reference parity: no reference counterpart — off-policy-evaluation
    extension next to ab_test/did (driver brief).
    """
    dec = "decimal(38,0)"
    qr = F.floor(
        F.col(reward_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    per = (
        df.filter(
            F.col(action_col).isNotNull() & F.col(reward_col).isNotNull()
        )
        .select(F.col(action_col).alias("__a"), qr.alias("__r"))
        .groupBy("__a")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.col("__r").cast(dec)).alias("__s"),
        )
    )
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("__k"),
        F.sum("__n").cast(dec).alias("__ntot"),
        F.sum("__s").alias("__stot"),
    )
    j = per.crossJoin(F.broadcast(tot))  # 1-row scalar broadcast

    def idiv(a, b):
        return (a - F.pmod(a, b)) / b

    n = F.col("__n").cast(dec)
    k = F.col("__k").cast(dec)
    terms = j.select(
        "__k",
        "__ntot",
        "__stot",
        idiv(F.col("__s") * F.lit(10**6).cast(dec), k * n).alias("__tq"),
        idiv(F.lit(10**12).cast(dec), n).alias("__eq"),
    )
    agg = terms.groupBy("__k", "__ntot", "__stot").agg(
        F.sum("__tq").alias("__ips"), F.sum("__eq").alias("__ess")
    )
    return agg.select(
        F.col("__ntot").cast("long").alias("n"),
        F.col("__k").alias("k_actions"),
        F.round(
            F.col("__stot").cast("double")
            / F.col("__ntot").cast("double")
            / F.lit(1.0e6),
            6,
        ).alias("logged_mean"),
        F.round(
            F.col("__ips").cast("double") / F.lit(1.0e12), 6
        ).alias("ips_uniform"),
        F.round(
            F.col("__k").cast("double")
            * F.col("__k").cast("double")
            * F.lit(1.0e12)
            / F.col("__ess").cast("double"),
            6,
        ).alias("ess"),
    )


def quantile_treatment_effect(
    df: DataFrame,
    value_col: str,
    treat_col,
    probs=((1, 4), (1, 2), (3, 4), (9, 10)),
    quant: int = 100,
) -> DataFrame:
    """Quantile treatment effects — per probability p, the difference of
    the two arms' p-quantiles: ``(p, n_control, n_treat, q_control,
    q_treat, qte)``.  The distributional readout a mean difference
    (ab_test/did) hides: a treatment that lifts the median while
    crushing the p90 has did > 0 and a catastrophic tail, and QTE is
    where that shows.

    Exactness: values are quantized to ``1/quant`` units (the roc_auc
    grid contract); each arm's p-quantile is the MINIMUM grid value
    whose inclusive cumulative count reaches ``⌈p·n⌉`` — an exact
    integer comparison with p carried as a RATIONAL (pnum, pden), so no
    IEEE op touches quantile selection; ``qte = (q_t − q_c)/quant`` is
    one exact integer difference scaled by a literal.

    Scale shape: one combinable (arm, quantum) aggregate, per-arm
    cumulative windows over the quantization-bounded value grid, the
    |probs|-row frame fanned over the grid (bounded crossJoin), two tiny
    aggregates.

    Reference parity: no reference counterpart — experimentation
    extension next to did_estimate (driver brief).
    """
    from pyspark.sql import Window

    treat = (
        treat_col if not isinstance(treat_col, str) else F.col(treat_col)
    )
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    base = df.filter(F.col(value_col).isNotNull()).select(
        treat.cast("int").alias("__t"), qv.alias("__v")
    ).filter(F.col("__t").isNotNull())
    cells = base.groupBy("__t", "__v").agg(
        F.count(F.lit(1)).alias("__n")
    )
    wc = Window.partitionBy("__t").orderBy("__v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # per-arm value-grid window: quantization-bounded, never data-sized
    cum = cells.withColumn("__c", F.sum("__n").over(wc))
    totals = cells.groupBy("__t").agg(F.sum("__n").cast("long").alias("__na"))
    spark = df.sparkSession
    from cerebro_spark.operators.util import small_df

    pf = small_df(
        spark,
        [(float(pn) / pd, pn, pd) for pn, pd in probs],
        "p double, __pn long, __pd long",
    )
    fan = cum.join(totals, "__t").crossJoin(F.broadcast(pf))
    thr = (
        F.col("__na") * F.col("__pn") + F.col("__pd") - 1
    ) - F.pmod(
        F.col("__na") * F.col("__pn") + F.col("__pd") - 1, F.col("__pd")
    )
    # thr/pd = ceil(p*n) as exact integers; compare c*pd >= thr instead
    # of dividing, so no IEEE op touches the selection
    hit = fan.filter(
        F.col("__c") * F.col("__pd") >= thr
    ).groupBy("p", "__t").agg(
        F.min("__v").alias("__q"), F.min("__na").alias("__narm")
    )
    out = hit.groupBy("p").agg(
        F.min(F.when(F.col("__t") == 0, F.col("__narm"))).alias("n_control"),
        F.min(F.when(F.col("__t") == 1, F.col("__narm"))).alias("n_treat"),
        F.min(F.when(F.col("__t") == 0, F.col("__q"))).alias("__qc"),
        F.min(F.when(F.col("__t") == 1, F.col("__q"))).alias("__qt"),
    )
    s = F.lit(float(quant))
    return out.select(
        "p",
        "n_control",
        "n_treat",
        F.round(F.col("__qc").cast("double") / s, 6).alias("q_control"),
        F.round(F.col("__qt").cast("double") / s, 6).alias("q_treat"),
        F.when(
            F.col("__qc").isNotNull() & F.col("__qt").isNotNull(),
            F.round(
                (F.col("__qt") - F.col("__qc")).cast("double") / s, 6
            ),
        ).alias("qte"),
    ).orderBy(F.col("p").asc())


def paired_t_prepost(
    df: DataFrame,
    value_col: str,
    unit_col: str,
    post_col,
) -> DataFrame:
    """Paired (within-unit) t-test on pre→post mean changes — ONE row
    ``(n_units, mean_pre, mean_post, mean_diff, t)``: each unit is its
    own control, so the between-unit variance that drowns ab_test_ztest
    cancels.  The third leg of the experimentation family — between-arms
    (ab_test_ztest), quasi-experimental (did_estimate), and WITHIN-unit
    (this) — for launches where every unit crosses the boundary.

    Only units observed on BOTH sides enter (a pre-only unit has no
    pair).  With per-unit e6-quantized (n, Σ) on each side, the unit's
    diff is ``d_u = Σpost/npost − Σpre/npre`` — two exact-integer
    divisions; d and d² then aggregate as DOUBLES, which is the ONE
    order-sensitive reduction here, so d_u is e6-floor-REquantized to a
    BIGINT first (the eb/ips discipline) and Σd, Σd² are exact DECIMALs.
    ``t = d̄ / √(s²_d/n)`` is a fixed IEEE chain, rounded 6 dp; NULL for
    n < 2 or zero variance.

    Scale shape: ONE combinable per-unit aggregate (pre/post sums as
    conditional aggregates — no join), one 1-row reduce.  No window, no
    collect.

    Reference parity: no reference counterpart — experimentation
    extension next to did_estimate (driver brief).
    """
    dec = "decimal(38,0)"
    post = post_col if not isinstance(post_col, str) else F.col(post_col)
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(unit_col).isNotNull()
    ).select(
        F.col(unit_col).alias("__u"),
        post.cast("int").alias("__p"),
        qv.alias("__v"),
    ).filter(F.col("__p").isNotNull())
    per = base.groupBy("__u").agg(
        F.sum(F.when(F.col("__p") == 0, 1).otherwise(0)).alias("__n0"),
        F.sum(
            F.when(F.col("__p") == 0, F.col("__v")).otherwise(0).cast(dec)
        ).alias("__s0"),
        F.sum(F.when(F.col("__p") == 1, 1).otherwise(0)).alias("__n1"),
        F.sum(
            F.when(F.col("__p") == 1, F.col("__v")).otherwise(0).cast(dec)
        ).alias("__s1"),
    ).filter((F.col("__n0") > 0) & (F.col("__n1") > 0))
    # per-unit diff in e6 units, re-quantized to a BIGINT so the
    # cross-unit sums are order-free (the eb/ips discipline)
    d = F.floor(
        F.col("__s1").cast("double") / F.col("__n1").cast("double")
        - F.col("__s0").cast("double") / F.col("__n0").cast("double")
        + F.lit(0.5)
    ).cast("long")
    per = per.withColumn("__d", d)
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum(F.col("__s0")).alias("__ts0"),
        F.sum(F.col("__n0").cast(dec)).alias("__tn0"),
        F.sum(F.col("__s1")).alias("__ts1"),
        F.sum(F.col("__n1").cast(dec)).alias("__tn1"),
        F.sum(F.col("__d").cast(dec)).alias("__sd"),
        F.sum(F.col("__d").cast(dec) * F.col("__d")).alias("__sdd"),
    )
    n = F.col("n_units").cast(dec)
    var_num = n * F.col("__sdd") - F.col("__sd") * F.col("__sd")
    var_den = n * (n - 1)
    mean_d = (
        F.col("__sd").cast("double")
        / F.col("n_units").cast("double")
        / F.lit(1.0e6)
    )
    se = (
        F.sqrt(var_num.cast("double") / var_den.cast("double"))
        / F.lit(1.0e6)
        / F.sqrt(F.col("n_units").cast("double"))
    )
    return agg.select(
        "n_units",
        F.round(
            F.col("__ts0").cast("double")
            / F.col("__tn0").cast("double")
            / F.lit(1.0e6),
            6,
        ).alias("mean_pre"),
        F.round(
            F.col("__ts1").cast("double")
            / F.col("__tn1").cast("double")
            / F.lit(1.0e6),
            6,
        ).alias("mean_post"),
        F.round(mean_d, 6).alias("mean_diff"),
        F.when(
            (F.col("n_units") > 1) & (var_num > 0),
            F.round(mean_d / se, 6),
        ).alias("t"),
    )


def kendall_tau(
    df: DataFrame,
    x_col: str,
    y_col: str,
    x_quant: int = 100,
    y_quant: int = 1,
) -> DataFrame:
    """Kendall rank correlation (tau-b, tie-corrected) of two numeric
    columns — ONE row ``(n, tau_b)``: the PAIRWISE companion of
    spearman_corr.  Spearman correlates the rank VALUES (one outlier
    rank still carries weight); tau-b counts concordant vs discordant
    PAIRS, so it is the probability-scaled "if x goes up, does y go up"
    reading analysts actually want, and its small-sample distribution is
    better behaved.

    Both columns are quantized (``1/x_quant`` / ``1/y_quant`` units —
    the documented metric is "tau-b at quantized values", identical in
    any engine).  ``y_col`` must be LOW-CARDINALITY after quantization
    (an hour-of-day, a rating, a bucket id): the dense grid is
    |x-grid| × |y-grid| rows and the concordance windows partition by
    one axis, so the frame is quantization-bounded, never data-sized.

    Exact pair counting on the contingency grid: with cells c(x,y) and
    the exclusive 2-D cumulatives F(x,y) = Σ_{x'<x} c(x',y) and
    G(x,y) = Σ_{y'<y} F(x,y'), every unordered discordant/concordant
    pair is counted exactly once through its larger-x cell:
    ``P = Σ c·G`` (concordant) and ``Q = Σ c·(T − F − G)`` (discordant,
    T(x) = Σ_y' F(x,y')).  Tie terms come from the exact marginals:
    ``n1 = Σ_x t_x(t_x−1)/2``, ``n2 = Σ_y t_y(t_y−1)/2``,
    ``n0 = n(n−1)/2``.  All sums are exact DECIMAL(38,0);
    ``tau_b = (P−Q)/√((n0−n1)(n0−n2))`` is one fixed IEEE chain,
    rounded 6 dp; NULL when either axis is constant.

    Scale shape: one combinable cell aggregate over the fact (the only
    data-sized stage), a |x-grid|×|y-grid| dense grid via a BROADCAST
    cross of the two distinct-value frames, two bounded grid windows
    (partitioned by y over the x-grid, then by x over the y-grid), one
    broadcast-joinable cell→grid equi-join, one 1-row reduce.

    Reference parity: no reference counterpart — robust-stats extension
    next to spearman_corr (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"

    def q(c, k):
        # round-half-up even at k=1 (the decile_lift/roc_auc convention —
        # a bare cast would TRUNCATE fractional inputs)
        return F.floor(
            F.col(c).cast("double") * F.lit(float(k)) + F.lit(0.5)
        ).cast("long")

    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(q(x_col, x_quant).alias("__x"), q(y_col, y_quant).alias("__y"))
    cells = base.groupBy("__x", "__y").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    xs = cells.select("__x").distinct()
    ys = cells.select("__y").distinct()
    # dense |x-grid| × |y-grid| frame (broadcast the low-cardinality axis)
    grid = (
        xs.crossJoin(F.broadcast(ys))
        .join(cells, ["__x", "__y"], "left")
        .select("__x", "__y", F.coalesce(F.col("__c"), F.lit(0)).alias("__c0"))
    )
    wq = (
        Window.partitionBy("__y")
        .orderBy("__x")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # quantization-bounded grid window: |y-grid| partitions × |x-grid| rows
    grid = grid.withColumn(
        "__F", F.coalesce(F.sum(F.col("__c0").cast(dec)).over(wq), F.lit(0).cast(dec))
    )
    wg = (
        Window.partitionBy("__x")
        .orderBy("__y")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wt = Window.partitionBy("__x")
    # bounded window: |x-grid| partitions × |y-grid| rows
    grid = grid.withColumn(
        "__G", F.coalesce(F.sum("__F").over(wg), F.lit(0).cast(dec))
    ).withColumn("__T", F.sum("__F").over(wt))
    j = cells.join(grid.select("__x", "__y", "__F", "__G", "__T"), ["__x", "__y"])
    pq = j.agg(
        F.sum(F.col("__c").cast(dec) * F.col("__G")).alias("__P"),
        F.sum(
            F.col("__c").cast(dec)
            * (F.col("__T") - F.col("__F") - F.col("__G"))
        ).alias("__Q"),
    )
    tx = (
        cells.groupBy("__x")
        .agg(F.sum("__c").cast(dec).alias("__t"))
        .agg(
            F.sum(F.col("__t") * (F.col("__t") - 1)).alias("__n1x2"),
            F.sum("__t").alias("__n"),
        )
    )
    ty = (
        cells.groupBy("__y")
        .agg(F.sum("__c").cast(dec).alias("__t"))
        .agg(F.sum(F.col("__t") * (F.col("__t") - 1)).alias("__n2x2"))
    )
    # three 1-row frames → scalar broadcast cross
    out = pq.crossJoin(F.broadcast(tx)).crossJoin(F.broadcast(ty))
    n = F.col("__n")
    n0x2 = n * (n - 1)  # 2·n0, matching the 2·n1 / 2·n2 tie terms
    dx = (n0x2 - F.col("__n1x2")).cast("double")
    dy = (n0x2 - F.col("__n2x2")).cast("double")
    diff = (F.col("__P") - F.col("__Q")).cast("double")
    return out.select(
        n.cast("long").alias("n"),
        F.when(
            (F.col("__n1x2") < n0x2) & (F.col("__n2x2") < n0x2),
            F.round(F.lit(2.0) * diff / (F.sqrt(dx) * F.sqrt(dy)), 6),
        ).alias("tau_b"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """One-way ANOVA across the groups of ``group_col`` — ONE row
    ``(n, k_groups, f_stat, eta_sq)``: does the group label explain any
    of the value's variance?  The k-group generalization of
    ab_test_ztest's two-arm compare: F is the mean-square ratio
    SSB/(k−1) ÷ SSW/(n−k), eta² = SSB/SST is the variance-explained
    effect size (the number that survives when n is huge and F is
    trivially "significant").

    Exactness: values are e6-quantized BIGINTs, so per-group (n_g, S_g)
    and the global Σv² are exact DECIMAL(38,0); the order-sensitive
    cross-group rational Σ S_g²/n_g uses exact integer FLOOR division
    per group (``(a − a mod b)/b`` ≡ DuckDB ``//`` — the documented
    metric is floor-quantized ANOVA, identical in any engine; each
    floor loses <1 e-12 unit).  SSW = Σv² − ΣS_g²/n_g is ≥ 0 by
    Cauchy–Schwarz even after flooring; SSB is clamped at 0.  F and
    eta² are fixed IEEE chains over the exact integers, rounded 6 dp;
    NULL when k < 2, n ≤ k, or SST = 0.

    Overflow envelope: S_g² ≈ (n·v̄·10⁶)² must stay inside DECIMAL(38)
    — fine to ~10¹² rows at v̄ ≈ 10³; beyond that pre-scale the quant.

    Scale shape: ONE combinable per-group aggregate over the fact, one
    k-row reduce.  No window, no join, no collect.

    Reference parity: no reference counterpart — experimentation
    extension next to ab_test_ztest (driver brief).
    """
    dec = "decimal(38,0)"
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    per = (
        df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("__g"), qv.alias("__v"))
        .groupBy("__g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.col("__v").cast(dec)).alias("__s"),
            F.sum(F.col("__v").cast(dec) * F.col("__v")).alias("__ss"),
        )
    )

    def idiv(a, b):
        return (a - F.pmod(a, b)) / b

    ng = F.col("__n").cast(dec)
    per = per.withColumn("__tq", idiv(F.col("__s") * F.col("__s"), ng))
    agg = per.agg(
        F.sum("__n").cast(dec).alias("__N"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("__s").alias("__S"),
        F.sum("__ss").alias("__SS"),
        F.sum("__tq").alias("__T"),
    )
    N = F.col("__N")
    k = F.col("k_groups").cast(dec)
    gmean_term = (F.col("__S") * F.col("__S") - F.pmod(
        F.col("__S") * F.col("__S"), N
    )) / N
    ssb = F.greatest(F.col("__T") - gmean_term, F.lit(0).cast(dec))
    sst = F.greatest(F.col("__SS") - gmean_term, F.lit(0).cast(dec))
    ssw = F.col("__SS") - F.col("__T")
    ok = (F.col("k_groups") >= 2) & (N > k) & (sst > 0) & (ssw > 0)
    f_stat = F.when(
        ok,
        F.round(
            (ssb.cast("double") / (k - 1).cast("double"))
            / (ssw.cast("double") / (N - k).cast("double")),
            6,
        ),
    )
    eta = F.when(
        F.col("k_groups") >= 1,
        F.when(sst > 0, F.round(ssb.cast("double") / sst.cast("double"), 6)),
    )
    return agg.select(
        N.cast("long").alias("n"),
        "k_groups",
        f_stat.alias("f_stat"),
        eta.alias("eta_sq"),
    )


def theil_index(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Theil T inequality index per group — ``(group, n, mean,
    theil_t)``: how concentrated is the value mass inside each group?
    T = (1/n)Σ(xᵢ/μ)ln(xᵢ/μ) is 0 at perfect equality and ln(n) at
    total concentration — the ENTROPY-family companion of
    revenue_gini's rank-family view, and unlike Gini it decomposes
    additively across sub-populations, which is why corpus-composition
    audits prefer it.  Only POSITIVE values enter (ln); ``n`` counts
    them.

    Exactness: values are e6-quantized BIGINTs grouped into a
    per-(group, distinct-value) cell frame, so the per-cell log term is
    computed ONCE per distinct value — ``L = ⌊ln(v·n/S)·10⁶ + ½⌋`` is
    the same libm double in any engine (v·n/S written as the identical
    three-term IEEE chain) — and the order-sensitive Σ x·ln(x/μ)
    becomes the exact integer Σ c·v·L (the transition_entropy
    discipline).  T = Σc·v·L / (S·10⁶) is one final IEEE division,
    rounded 6 dp.

    Scale shape: ONE combinable cell aggregate over the fact (the only
    data-sized stage), one per-group reduce of the cell frame, one
    group-keyed equi-join of cells onto the k-row totals (AQE
    broadcasts it), one per-group reduce.  No window, no collect.

    Reference parity: no reference counterpart — inequality-audit
    extension next to revenue_gini (driver brief).
    """
    dec = "decimal(38,0)"
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    cells = (
        df.filter(
            F.col(group_col).isNotNull()
            & F.col(value_col).isNotNull()
            & (F.col(value_col).cast("double") > 0)
        )
        .select(F.col(group_col).alias("group"), qv.alias("__v"))
        .filter(F.col("__v") > 0)
        .groupBy("group", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    totals = cells.groupBy("group").agg(
        F.sum(F.col("__c").cast(dec)).alias("__n"),
        F.sum(F.col("__c").cast(dec) * F.col("__v")).alias("__s"),
    )
    j = cells.join(totals, "group")
    # identical 3-term IEEE chain in the oracle: ln(v·n/S) = ln(v/μ)
    larg = (
        F.col("__v").cast("double")
        * F.col("__n").cast("double")
        / F.col("__s").cast("double")
    )
    L = F.floor(F.log(larg) * F.lit(1.0e6) + F.lit(0.5)).cast("long")
    terms = j.select(
        "group",
        "__n",
        "__s",
        (F.col("__c").cast(dec) * F.col("__v") * L).alias("__t"),
    )
    agg = terms.groupBy("group").agg(
        F.max("__n").alias("__n"),
        F.max("__s").alias("__s"),
        F.sum("__t").alias("__tt"),
    )
    return agg.select(
        "group",
        F.col("__n").cast("long").alias("n"),
        F.round(
            F.col("__s").cast("double")
            / F.col("__n").cast("double")
            / F.lit(1.0e6),
            6,
        ).alias("mean"),
        F.round(
            F.col("__tt").cast("double")
            / (F.col("__s").cast("double") * F.lit(1.0e6)),
            6,
        ).alias("theil_t"),
    )


def hhi_concentration(
    df: DataFrame,
    market_col: str,
    firm_col: str,
    value_col: str,
    quant: int = 10000,
) -> DataFrame:
    """Herfindahl–Hirschman concentration index per market —
    ``(market, n_firms, hhi, top_share)``: Σ of squared value shares,
    1/n at perfect fragmentation and 1.0 at monopoly.  The antitrust /
    supply-risk number behind dominant_suppliers' top-k view: HHI is
    scale-free, so markets of different sizes compare directly, and
    1/hhi is the "effective number of firms".

    Exactness: per-(market, firm) values are ``1/quant``-quantized
    BIGINTs, so the market totals R = Σr, Σr² and max r are exact
    DECIMAL(38,0); hhi = Σr²/R² and top_share = max r/R are single
    IEEE divisions over exact integers, rounded 6 dp.

    Overflow envelope: Σr² ≈ n_firms·(R/n)² needs R ≲ 10¹⁹ quant units
    inside DECIMAL(38) — fine to exabyte-scale revenue at e4.

    Scale shape: TWO combinable aggregates (fact → firm cells → market
    rows).  No window, no join, no collect.

    Reference parity: no reference counterpart — market-structure
    extension next to dominant_suppliers (driver brief).
    """
    dec = "decimal(38,0)"
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    firms = (
        df.filter(
            F.col(market_col).isNotNull()
            & F.col(firm_col).isNotNull()
            & F.col(value_col).isNotNull()
        )
        .select(
            F.col(market_col).alias("market"),
            F.col(firm_col).alias("__f"),
            qv.alias("__v"),
        )
        .groupBy("market", "__f")
        .agg(F.sum(F.col("__v").cast(dec)).alias("__r"))
    )
    agg = firms.groupBy("market").agg(
        F.count(F.lit(1)).cast("long").alias("n_firms"),
        F.sum("__r").alias("__R"),
        F.sum(F.col("__r") * F.col("__r")).alias("__RR"),
        F.max("__r").alias("__mx"),
    )
    R = F.col("__R").cast("double")
    return agg.select(
        "market",
        "n_firms",
        F.when(
            F.col("__R") > 0,
            F.round(F.col("__RR").cast("double") / (R * R), 6),
        ).alias("hhi"),
        F.when(
            F.col("__R") > 0,
            F.round(F.col("__mx").cast("double") / R, 6),
        ).alias("top_share"),
    )


def nelson_aalen(
    df: DataFrame,
    t_col: str,
    censored_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator over right-censored
    lifetimes — per distinct event time ``(t, n_at_risk, d_events,
    cum_hazard)``: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ.  The instantaneous-risk
    companion of the survival_km query's product-limit view: KM answers
    "what fraction survives past t", H(t)'s increments answer "how hard
    does risk bite AT t", and −ln(KM) ≈ H gives a built-in consistency
    check.  Input is one row per subject: ``t_col`` (time of event or
    censoring, small integer grid — days/weeks) and ``censored_col``
    (1 = censored at t, 0 = event at t).

    Exactness: per-time d/n becomes the exact integer floor
    ``⌊d·10¹²/n⌋`` (DuckDB ``//``), the cumulative is an exact integer
    sum over the time grid, and H is one final division by 10¹²,
    rounded 9 dp (each floor loses <10⁻¹² — invisible at 9 dp).

    Scale shape: ONE combinable per-time aggregate over the subjects
    (the only data-sized stage), then two windows over the TIME-GRID
    frame (≤ a few hundred rows for day-grid lifetimes — bounded, never
    data-sized; the survival_km contract).

    Reference parity: no reference counterpart — survival-analysis
    extension next to the survival_km gate (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    grid = (
        df.filter(F.col(t_col).isNotNull())
        .select(
            F.col(t_col).cast("long").alias("t"),
            F.col(censored_col).cast("int").alias("__c"),
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__ending"),
            F.sum(F.lit(1) - F.col("__c")).cast("long").alias("d_events"),
        )
    )
    # bounded time-grid windows (the survival_km contract)
    w_tot = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_excl = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = grid.withColumn(
        "n_at_risk",
        (
            F.sum("__ending").over(w_tot)
            - F.coalesce(F.sum("__ending").over(w_excl), F.lit(0))
        ).cast("long"),
    )
    term = (
        F.col("d_events").cast(dec) * F.lit(1000000000000).cast(dec)
    )
    n = F.col("n_at_risk").cast(dec)
    staged = staged.withColumn(
        "__h12", ((term - F.pmod(term, n)) / n).cast(dec)
    )
    return staged.select(
        "t",
        "n_at_risk",
        "d_events",
        F.round(
            F.sum("__h12").over(w_cum).cast("double") / F.lit(1.0e12), 9
        ).alias("cum_hazard"),
    )


def logrank_test(
    df: DataFrame,
    t_col: str,
    censored_col: str,
    group_col: str,
) -> DataFrame:
    """Two-sample log-rank test over right-censored lifetimes — ONE row
    ``(n1, n2, o1, e1, o2, e2, chi2)``: do the two groups share a
    survival curve?  The hypothesis-test companion of nelson_aalen /
    survival_km: at every distinct event time the observed group-1
    events are compared to the hypergeometric expectation
    ``e₁ₜ = dₜ·n₁ₜ/nₜ``, and χ² = (O₁−E₁)²/V with
    ``Vₜ = dₜ·(n₁ₜ/nₜ)·(n₂ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1)``.  Input is one row
    per subject: lifetime, censoring flag, and ``group_col`` ∈ {0, 1}
    (callers map their arms onto the binary code — it is what makes the
    conditional aggregates exact).

    Exactness: the per-time rationals are staged exact integer floor
    divisions at e6 per step (``a = ⌊dₜn₁ₜ10⁶/nₜ⌋``, ``b = ⌊a·n₂ₜ/nₜ⌋``,
    ``v = ⌊b·(nₜ−dₜ)/(nₜ−1)⌋`` — each an exact DECIMAL op, re-cast to
    scale 0 between steps so the headroom never shrinks), so ΣE₁ and ΣV
    are exact integer sums; χ² is one fixed IEEE chain, rounded 6 dp;
    NULL when V = 0.  Overflow envelope: nₜ³·10⁶ inside DECIMAL(38) —
    fine to ~10¹⁰ subjects.

    Scale shape: ONE combinable per-(group, time) aggregate over the
    subjects, a dense 2×|time-grid| frame (per-group exclusive
    cumulatives need the zero cells), per-group grid windows, one 1-row
    reduce.  The grid is time-bounded, never data-sized.

    Reference parity: no reference counterpart — survival-analysis
    extension next to survival_km (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    base = df.filter(
        F.col(t_col).isNotNull() & F.col(group_col).isin(0, 1)
    ).select(
        F.col(t_col).cast("long").alias("t"),
        F.col(censored_col).cast("int").alias("__c"),
        F.col(group_col).cast("int").alias("__g"),
    )
    cells = base.groupBy("__g", "t").agg(
        F.count(F.lit(1)).cast("long").alias("__ending"),
        F.sum(F.lit(1) - F.col("__c")).cast("long").alias("__d"),
    )
    ts = cells.select("t").distinct()
    gs = cells.select("__g").distinct()
    dense = (
        ts.crossJoin(F.broadcast(gs))
        .join(cells, ["__g", "t"], "left")
        .select(
            "__g",
            "t",
            F.coalesce(F.col("__ending"), F.lit(0)).alias("__ending"),
            F.coalesce(F.col("__d"), F.lit(0)).alias("__d"),
        )
    )
    w_tot = (
        Window.partitionBy("__g")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_excl = (
        Window.partitionBy("__g")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # per-group exclusive cumulatives over the bounded time grid
    dense = dense.withColumn(
        "__risk",
        (
            F.sum("__ending").over(w_tot)
            - F.coalesce(F.sum("__ending").over(w_excl), F.lit(0))
        ).cast("long"),
    )
    per_t = dense.groupBy("t").agg(
        F.sum(F.when(F.col("__g") == 1, F.col("__risk")).otherwise(0))
        .cast("long")
        .alias("__n1"),
        F.sum(F.when(F.col("__g") == 0, F.col("__risk")).otherwise(0))
        .cast("long")
        .alias("__n2"),
        F.sum(F.when(F.col("__g") == 1, F.col("__d")).otherwise(0))
        .cast("long")
        .alias("__d1"),
        F.sum(F.when(F.col("__g") == 0, F.col("__d")).otherwise(0))
        .cast("long")
        .alias("__d2"),
    )

    def idiv(a, b):
        return ((a - F.pmod(a, b)) / b).cast(dec)

    nt = (F.col("__n1") + F.col("__n2")).cast(dec)
    dt = (F.col("__d1") + F.col("__d2")).cast(dec)
    n1 = F.col("__n1").cast(dec)
    n2 = F.col("__n2").cast(dec)
    e6 = F.lit(1000000).cast(dec)
    staged = per_t.filter((F.col("__d1") + F.col("__d2")) > 0).withColumn(
        "__a", idiv(dt * n1 * e6, nt)
    )
    staged = staged.withColumn("__b", idiv(F.col("__a") * n2, nt))
    staged = staged.withColumn(
        "__v",
        F.when(
            nt > 1, idiv(F.col("__b") * (nt - dt), nt - 1)
        ).otherwise(F.lit(0).cast(dec)),
    )
    # subject totals from the tiny cell frame — no second fact scan
    counts = cells.groupBy().agg(
        F.sum(F.when(F.col("__g") == 1, F.col("__ending")).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("__g") == 0, F.col("__ending")).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    agg = staged.agg(
        F.sum("__d1").cast("long").alias("o1"),
        F.sum("__d2").cast("long").alias("o2"),
        F.sum("__a").alias("__E1q"),
        F.sum(dt).alias("__D"),
        F.sum("__v").alias("__Vq"),
    )
    # 1-row × 1-row scalar crossJoin
    out = agg.crossJoin(F.broadcast(counts))
    e1 = F.col("__E1q").cast("double") / F.lit(1.0e6)
    e2 = F.col("__D").cast("double") - e1
    v = F.col("__Vq").cast("double") / F.lit(1.0e6)
    diff = F.col("o1").cast("double") - e1
    return out.select(
        "n1",
        "n2",
        "o1",
        F.round(e1, 6).alias("e1"),
        "o2",
        F.round(e2, 6).alias("e2"),
        F.when(F.col("__Vq") > 0, F.round(diff * diff / v, 6)).alias(
            "chi2"
        ),
    )


def decile_lift(
    df: DataFrame,
    score_col: str,
    label_col: str,
    quant: int = 1000000,
) -> DataFrame:
    """Gains / lift table for a score against a binary outcome — per
    score decile ``(decile, n_units, n_pos, response_rate, lift,
    cum_capture)``: the campaign-targeting readout behind every
    propensity model ("mail the top 2 deciles, capture 60% of the
    buyers").  ``decile`` 10 is the HIGHEST-score bucket; ``lift`` is
    the decile's response rate over the base rate; ``cum_capture`` is
    the fraction of all positives found at this decile or above — the
    gains curve, read bottom-up.

    NO GLOBAL NTILE (a global ranking is a single-task sort at scale —
    the length_deciles discipline): scores are ``1/quant``-quantized
    BIGINTs, the 9 exact-RANK boundaries come from the score-grid
    inclusive cumulative (bₖ = min grid value with cum ≥ ⌈k·n/10⌉, the
    qte_value selection rule — exact integer comparisons), and each
    unit is bucketed by ``1 + #(bₖ < score)``, so boundary ties go DOWN
    on both engines.  Counts are exact; rate/lift/capture are single
    IEEE divisions over exact integers, rounded 6 dp.

    Scale shape: one combinable grid aggregate over the units, one
    quantization-bounded grid window + 1-row total broadcast for the
    boundaries, a 1-row boundary-array broadcast back onto the units,
    one 10-row reduce, two ≤10-row windows.  No global sort, no
    collect.

    Reference parity: no reference counterpart — model-evaluation
    extension next to roc_auc/calibration (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    qs = F.floor(
        F.col(score_col).cast("double") * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    units = df.filter(
        F.col(score_col).isNotNull() & F.col(label_col).isNotNull()
    ).select(qs.alias("__s"), F.col(label_col).cast("int").alias("__y"))
    grid = units.groupBy("__s").agg(F.count(F.lit(1)).cast("long").alias("__c"))
    w_cum = Window.orderBy("__s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # quantization-bounded grid window (the qte_value contract)
    grid = grid.withColumn("__cum", F.sum("__c").over(w_cum))
    tot = units.agg(F.count(F.lit(1)).cast("long").alias("__n"))
    g = grid.crossJoin(F.broadcast(tot))  # 1-row scalar broadcast
    ks = [
        F.min(
            F.when(
                F.col("__cum") * 10 >= F.col("__n").cast("long") * k,
                F.col("__s"),
            )
        ).alias(f"__b{k}")
        for k in range(1, 10)
    ]
    bounds = g.agg(*ks)  # one row, the 9 exact-rank boundaries
    bucketed = units.crossJoin(F.broadcast(bounds)).select(
        (
            F.lit(1)
            + sum(
                (F.col(f"__b{k}") < F.col("__s")).cast("int")
                for k in range(1, 10)
            )
        ).alias("decile"),
        "__y",
    )
    per = bucketed.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.sum("__y").cast("long").alias("n_pos"),
    )
    # ≤10-row frame: bounded windows for totals and top-down capture
    w_all = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_top = Window.orderBy(F.col("decile").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    per = per.withColumn("__N", F.sum("n_units").over(w_all)).withColumn(
        "__P", F.sum("n_pos").over(w_all)
    ).withColumn("__cp", F.sum("n_pos").over(w_top))
    rate = F.col("n_pos").cast("double") / F.col("n_units").cast("double")
    base = F.col("__P").cast("double") / F.col("__N").cast("double")
    return per.select(
        "decile",
        "n_units",
        "n_pos",
        F.round(rate, 6).alias("response_rate"),
        F.when(F.col("__P") > 0, F.round(rate / base, 6)).alias("lift"),
        F.when(
            F.col("__P") > 0,
            F.round(
                F.col("__cp").cast("double") / F.col("__P").cast("double"), 6
            ),
        ).alias("cum_capture"),
    ).orderBy("decile")


def brier_decomposition(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    quant: int = 1000,
) -> DataFrame:
    """Murphy decomposition of the Brier score — ONE row ``(n, brier,
    reliability, resolution, uncertainty)`` with the exact identity
    ``brier = reliability − resolution + uncertainty`` in quantized
    space.  The WHY behind calibration_bins' reliability diagram: a bad
    Brier score can mean miscalibration (reliability ≫ 0, fixable by
    recalibration) or no discrimination (resolution ≈ 0, a model
    problem) — this splits them, with uncertainty = ȳ(1−ȳ) as the
    irreducible floor.

    Forecast groups are the ``1/quant``-quantized probabilities
    themselves (Murphy's discrete-forecast form — the documented metric
    is the quantized decomposition, identical in any engine, and the
    identity is EXACT because f̄ₖ equals the group key).  Per-group
    (nₖ, posₖ) are exact integers; the order-sensitive rational sums
    Σ(nₖfₖ − q·posₖ)²/nₖ (reliability) and Σ(posₖ·n − P·nₖ)²/nₖ
    (resolution) use exact integer floor division per group (DuckDB
    ``//`` — each floor loses <1 unit in 10⁶·n), so the cross-group
    sums are order-free; every output is a fixed IEEE chain over exact
    integers, rounded 6 dp.

    Overflow envelope: (posₖ·n)² must stay inside DECIMAL(38) — fine to
    ~3·10⁹ rows; beyond that pre-aggregate per forecast group first.

    Scale shape: ONE combinable per-group aggregate over the fact, a
    1-row total broadcast onto the ≤(quant+1)-row group frame, one
    1-row reduce.  No window, no collect.

    Reference parity: no reference counterpart — model-evaluation
    extension next to calibration_bins/roc_auc (driver brief).
    """
    dec = "decimal(38,0)"
    qp = F.floor(
        F.col(prob_col).cast("double") * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    per = (
        df.filter(F.col(prob_col).isNotNull() & F.col(label_col).isNotNull())
        .select(qp.alias("__f"), F.col(label_col).cast("int").alias("__y"))
        .groupBy("__f")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__nk"),
            F.sum("__y").cast("long").alias("__pos"),
        )
    )
    tot = per.agg(
        F.sum("__nk").cast(dec).alias("__n"),
        F.sum("__pos").cast(dec).alias("__P"),
    )
    g = per.crossJoin(F.broadcast(tot))  # 1-row scalar broadcast

    def idiv(a, b):
        return ((a - F.pmod(a, b)) / b).cast(dec)

    nk = F.col("__nk").cast(dec)
    fk = F.col("__f").cast(dec)
    pos = F.col("__pos").cast(dec)
    n = F.col("__n")
    P = F.col("__P")
    q = F.lit(quant).cast(dec)
    # brier numerator: Σ over rows (f − q·y)² = Σₖ [posₖ(f−q)² + (nₖ−posₖ)f²]
    brier_q = (
        pos * (fk - q) * (fk - q) + (nk - pos) * fk * fk
    )
    rel_q = idiv((nk * fk - q * pos) * (nk * fk - q * pos), nk)
    res_q = idiv((pos * n - P * nk) * (pos * n - P * nk), nk)
    terms = g.select(
        "__n", "__P",
        brier_q.alias("__bq"), rel_q.alias("__rq"), res_q.alias("__sq")
    )
    agg = terms.groupBy().agg(
        F.max("__n").alias("__n"),
        F.max("__P").alias("__P"),
        F.sum("__bq").alias("__B"),
        F.sum("__rq").alias("__R"),
        F.sum("__sq").alias("__S"),
    )
    nd = F.col("__n").cast("double")
    q2 = float(quant) * float(quant)
    unc = (
        F.col("__P").cast("double")
        * (F.col("__n") - F.col("__P")).cast("double")
        / (nd * nd)
    )
    return agg.select(
        F.col("__n").cast("long").alias("n"),
        F.round(F.col("__B").cast("double") / (nd * q2), 6).alias("brier"),
        F.round(F.col("__R").cast("double") / (nd * q2), 6).alias(
            "reliability"
        ),
        F.round(F.col("__S").cast("double") / (nd * nd * nd), 6).alias(
            "resolution"
        ),
        F.round(unc, 6).alias("uncertainty"),
    )


def mann_whitney_u(
    df: DataFrame,
    group_col,
    value_col: str,
    quant: int = 100,
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between two arms — ONE
    row ``(n1, n2, u1, z, rank_biserial)``: does one arm's value
    distribution stochastically dominate the other's?  The
    NONPARAMETRIC companion of ab_test_ztest: no normality assumption,
    immune to the whale outliers that winsorized_value exists to tame,
    and ``rank_biserial = 1 − 2U₁/(n₁n₂)`` is the effect size (the
    common-language "P(arm1 > arm2)" recentred to [−1, 1]).
    ``group_col`` must be 0/1 (the logrank_test convention).

    Exactness: values are quantized to ``1/quant`` units and midranked
    over the COMBINED value grid (the spearman/auc contract:
    ``2·midrank = 2c + n + 1`` exact per grid cell), so
    ``2R₁ = Σᵥ n₁ᵥ·(2mrᵥ)`` is an exact DECIMAL; U₁, the mean n₁n₂/2
    and the tie-corrected variance
    ``σ² = (n₁n₂/12)·[(n+1) − Σ(t³−t)/(n(n−1))]`` are exact integer
    arithmetic carried ×12 (one rational), and z is one fixed IEEE
    chain, rounded 6 dp; NULL when σ² = 0 (all values tied).

    Scale shape: ONE combinable (grid-value × arm) aggregate over the
    fact, one quantization-bounded grid window, two 1-row reduces.  No
    join against the fact, no collect.

    Reference parity: no reference counterpart — experimentation
    extension next to ab_test_ztest/auc (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    g = group_col if not isinstance(group_col, str) else F.col(group_col)
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    base = df.filter(
        F.col(value_col).isNotNull() & g.isin(0, 1)
    ).select(qv.alias("__v"), g.cast("int").alias("__g"))
    grid = base.groupBy("__v").agg(
        F.count(F.lit(1)).cast("long").alias("__t"),
        F.sum("__g").cast("long").alias("__n1v"),
    )
    w_excl = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    # quantization-bounded grid window (the spearman contract)
    grid = grid.withColumn(
        "__2mr",
        F.lit(2) * F.coalesce(F.sum("__t").over(w_excl), F.lit(0))
        + F.col("__t")
        + 1,
    )
    agg = grid.agg(
        F.sum("__t").cast(dec).alias("__n"),
        F.sum("__n1v").cast(dec).alias("__n1"),
        F.sum(F.col("__n1v").cast(dec) * F.col("__2mr")).alias("__2R1"),
        F.sum(
            F.col("__t").cast(dec) * F.col("__t") * F.col("__t")
            - F.col("__t").cast(dec)
        ).alias("__ties"),
    )
    n = F.col("__n")
    n1 = F.col("__n1")
    n2 = n - n1
    # 2U1 = 2R1 - n1(n1+1)
    u1x2 = F.col("__2R1") - n1 * (n1 + 1)
    # 12·n·(n−1)·σ² = n1·n2·[(n+1)·n·(n−1) − Σ(t³−t)] — exact DECIMAL
    var12 = n1 * n2 * ((n + 1) * n * (n - 1) - F.col("__ties"))
    mean_x2 = n1 * n2  # 2·μ_U
    num = (u1x2 - mean_x2).cast("double") / F.lit(2.0)
    sd = F.sqrt(
        var12.cast("double") / (F.lit(12.0) * n.cast("double") * (n - 1).cast("double"))
    )
    return agg.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        F.round(u1x2.cast("double") / F.lit(2.0), 1).alias("u1"),
        F.when(var12 > 0, F.round(num / sd, 6)).alias("z"),
        F.when(
            (n1 > 0) & (n2 > 0),
            F.round(
                F.lit(1.0)
                - u1x2.cast("double") / (n1 * n2).cast("double"),
                6,
            ),
        ).alias("rank_biserial"),
    )


def kruskal_wallis(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quant: int = 100,
) -> DataFrame:
    """Kruskal–Wallis H test across k groups — ONE row ``(n, k_groups,
    h_stat, epsilon_sq)``: the rank-based (outlier-immune) companion of
    anova_oneway, exactly as mann_whitney_u is of ab_test_ztest.
    ``epsilon_sq = (H − k + 1)/(n − k)`` is the effect size that stays
    meaningful when n makes H trivially "significant".

    Exactness: combined-grid midranks (2mr = 2c + n + 1 exact); per
    group ``2R_g`` is an exact DECIMAL, the cross-group rational
    Σ(2R_g)²/n_g uses exact integer floor division per group (the
    anova_oneway discipline), and the tie correction
    ``1 − Σ(t³−t)/(n³−n)`` is carried as one exact rational pair — H is
    a single fixed IEEE chain over exact integers, rounded 6 dp; NULL
    when every value is tied or k < 2.

    Overflow envelope: (2R_g)² ≈ 4n⁴ inside DECIMAL(38) — fine to
    ~10⁹ rows; beyond that coarsen the quant (ranks shrink with ties).

    Scale shape: one combinable (grid-value × group) cell aggregate
    over the fact, one quantization-bounded grid window, one broadcast
    of the grid midranks onto the |grid|×|groups| cell frame, one
    k-row reduce, one 1-row reduce.  No collect.

    Reference parity: no reference counterpart — experimentation
    extension next to anova_oneway (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    cells = (
        df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("__grp"), qv.alias("__v"))
        .groupBy("__grp", "__v")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    grid = cells.groupBy("__v").agg(F.sum("__c").cast("long").alias("__t"))
    w_excl = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, -1)
    grid = grid.withColumn(
        "__2mr",
        F.lit(2) * F.coalesce(F.sum("__t").over(w_excl), F.lit(0))
        + F.col("__t")
        + 1,
    )
    j = cells.join(F.broadcast(grid.select("__v", "__2mr")), "__v")
    per = j.groupBy("__grp").agg(
        F.sum("__c").cast(dec).alias("__ng"),
        F.sum(F.col("__c").cast(dec) * F.col("__2mr")).alias("__2Rg"),
    )

    def idiv(a, b):
        return ((a - F.pmod(a, b)) / b).cast(dec)

    per = per.withColumn(
        "__q", idiv(F.col("__2Rg") * F.col("__2Rg"), F.col("__ng"))
    )
    ties = grid.agg(
        F.sum(
            F.col("__t").cast(dec) * F.col("__t") * F.col("__t")
            - F.col("__t").cast(dec)
        ).alias("__ties")
    )
    agg = per.agg(
        F.sum("__ng").alias("__n"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("__q").alias("__Q"),
    ).crossJoin(F.broadcast(ties))  # 1-row × 1-row scalar crossJoin
    n = F.col("__n")
    k = F.col("k_groups").cast(dec)
    nd = n.cast("double")
    # H_raw = 3·ΣQ/(n(n+1)) − 3(n+1)   (ΣQ carries the ×4 of (2R)²)
    h_raw = (
        F.lit(3.0) * F.col("__Q").cast("double") / (nd * (nd + 1.0))
        - 3.0 * (nd + 1.0)
    )
    tie_frac = F.col("__ties").cast("double") / (nd * nd * nd - nd)
    ok = (
        (F.col("k_groups") >= 2)
        & (n > k)
        & (F.col("__ties") < n * n * n - n)
    )
    h = F.when(ok, F.round(h_raw / (F.lit(1.0) - tie_frac), 6))
    eps = F.when(
        ok,
        F.round(
            (h_raw / (F.lit(1.0) - tie_frac) - (k - 1).cast("double"))
            / (n - k).cast("double"),
            6,
        ),
    )
    return agg.select(
        n.cast("long").alias("n"),
        "k_groups",
        h.alias("h_stat"),
        eps.alias("epsilon_sq"),
    )


def event_study(
    df: DataFrame,
    value_col: str,
    treated_col,
    period_col,
    base_period: int = -1,
) -> DataFrame:
    """Event-study coefficients around a launch — per relative period
    ``(period, n_treated, n_control, mean_treated, mean_control, gap,
    gap_vs_base)``: the treatment-control mean gap at every lead/lag,
    re-based to the last pre-period.  THE validity gate for
    did_estimate: DiD is only believable if the PRE-period gaps are flat
    (parallel trends), and this is the readout that shows it — plus the
    post-period dynamics (instant jump vs slow burn) a single DiD
    number averages away.

    ``treated_col`` is a boolean expression/column; ``period_col`` an
    integer expression (e.g. weeks relative to the launch instant —
    negative = pre).  ``base_period`` picks the reference gap
    (default −1, the standard omitted category).

    Exactness: per-(period, arm) cells are exact e6 (n, Σ) integers —
    the did_estimate discipline — so each mean and gap is one IEEE
    division/subtraction over exact integers, rounded 6 dp;
    ``gap_vs_base`` subtracts the 6-dp-ROUNDED base gap (identical in
    any engine).  Periods with a missing arm report NULL gaps.

    Scale shape: ONE combinable per-(period, arm) aggregate over the
    fact, one 1-row base-gap broadcast onto the |periods|-row frame.
    No window, no collect.

    Reference parity: no reference counterpart — experimentation
    extension next to did_estimate (driver brief).
    """
    dec = "decimal(38,0)"
    treated = (
        treated_col if not isinstance(treated_col, str) else F.col(treated_col)
    )
    period = (
        period_col if not isinstance(period_col, str) else F.col(period_col)
    )
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    cells = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            period.cast("long").alias("period"),
            treated.cast("int").alias("__t"),
            qv.alias("__v"),
        )
        .filter(F.col("period").isNotNull() & F.col("__t").isNotNull())
        .groupBy("period")
        .agg(
            F.sum(F.col("__t")).cast("long").alias("n_treated"),
            F.sum(F.lit(1) - F.col("__t")).cast("long").alias("n_control"),
            F.sum(F.when(F.col("__t") == 1, F.col("__v")).otherwise(0).cast(dec)).alias("__st"),
            F.sum(F.when(F.col("__t") == 0, F.col("__v")).otherwise(0).cast(dec)).alias("__sc"),
        )
    )
    mt = F.when(
        F.col("n_treated") > 0,
        F.col("__st").cast("double")
        / F.col("n_treated").cast("double")
        / F.lit(1.0e6),
    )
    mc = F.when(
        F.col("n_control") > 0,
        F.col("__sc").cast("double")
        / F.col("n_control").cast("double")
        / F.lit(1.0e6),
    )
    per = cells.select(
        "period",
        "n_treated",
        "n_control",
        F.round(mt, 6).alias("mean_treated"),
        F.round(mc, 6).alias("mean_control"),
        F.round(mt - mc, 6).alias("gap"),
    )
    # always ONE row even when base_period is absent (a filter would make
    # the crossJoin annihilate the whole output) — gap_vs_base goes NULL
    base = per.agg(
        F.max(
            F.when(F.col("period") == base_period, F.col("gap"))
        ).alias("__base_gap")
    )
    # 1-row scalar broadcast onto the |periods|-row frame
    return per.crossJoin(F.broadcast(base)).select(
        "period",
        "n_treated",
        "n_control",
        "mean_treated",
        "mean_control",
        "gap",
        F.round(F.col("gap") - F.col("__base_gap"), 6).alias("gap_vs_base"),
    )


def ols_two_factor(
    df,
    y_col: str,
    x1_col,
    x2_col,
):
    """Two-regressor OLS via the normal equations — ONE row ``(n, b0,
    b1, b2, r2)`` for ``y ~ b0 + b1·x1 + b2·x2``.  The multivariable
    step past ols_trend's single slope: "is the hour effect real once
    day-of-week is held fixed?" needs both regressors in ONE fit —
    two marginal slopes double-count whatever hour and weekday share.

    ``x1_col``/``x2_col`` accept names or integer Column expressions.
    All three variables are e6-quantized BIGINTs, so the ten raw
    moments (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y, Σy²) are
    exact DECIMAL(38,0); the centered 2×2 system is solved by Cramer's
    rule as one fixed IEEE chain over their exact-cast values (the
    determinant can exceed DECIMAL(38) at scale, so the chain runs in
    doubles — deterministic because every input is the same exact
    integer in any engine), rounded 6 dp.  NULL when the design is
    collinear (det ≤ 0 after the Cauchy–Schwarz bound).

    Scale shape: ONE combinable aggregate over the fact.  No window,
    no join, no collect.

    Reference parity: no reference counterpart — regression extension
    next to ols_trend (driver brief).
    """
    dec = "decimal(38,0)"
    x1 = F.col(x1_col) if isinstance(x1_col, str) else x1_col
    x2 = F.col(x2_col) if isinstance(x2_col, str) else x2_col

    def q(c):
        return F.floor(
            c.cast("double") * F.lit(1.0e6) + F.lit(0.5)
        ).cast("long")

    base = df.filter(
        F.col(y_col).isNotNull() & x1.isNotNull() & x2.isNotNull()
    ).select(
        q(F.col(y_col)).alias("__y"), q(x1).alias("__x1"), q(x2).alias("__x2")
    )
    c = lambda n: F.col(n).cast(dec)  # noqa: E731
    agg = base.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(c("__x1")).alias("__s1"),
        F.sum(c("__x2")).alias("__s2"),
        F.sum(c("__y")).alias("__sy"),
        F.sum(c("__x1") * F.col("__x1")).alias("__s11"),
        F.sum(c("__x2") * F.col("__x2")).alias("__s22"),
        F.sum(c("__x1") * F.col("__x2")).alias("__s12"),
        F.sum(c("__x1") * F.col("__y")).alias("__s1y"),
        F.sum(c("__x2") * F.col("__y")).alias("__s2y"),
        F.sum(c("__y") * F.col("__y")).alias("__syy"),
    )
    nd = F.col("n").cast("double")
    s1 = F.col("__s1").cast("double")
    s2 = F.col("__s2").cast("double")
    sy = F.col("__sy").cast("double")
    a11 = F.col("__s11").cast("double") * nd - s1 * s1
    a22 = F.col("__s22").cast("double") * nd - s2 * s2
    a12 = F.col("__s12").cast("double") * nd - s1 * s2
    c1 = F.col("__s1y").cast("double") * nd - s1 * sy
    c2 = F.col("__s2y").cast("double") * nd - s2 * sy
    syy = F.col("__syy").cast("double") * nd - sy * sy
    det = a11 * a22 - a12 * a12
    b1 = (c1 * a22 - c2 * a12) / det
    b2 = (c2 * a11 - c1 * a12) / det
    b0 = (sy - b1 * s1 - b2 * s2) / nd / F.lit(1.0e6)
    sse_c = syy - b1 * c1 - b2 * c2  # n²·SSE-ish, same scale as syy
    ok = (F.col("n") >= 3) & (det > 0)
    return agg.select(
        "n",
        F.when(ok, F.round(b0, 6)).alias("b0"),
        F.when(ok, F.round(b1, 6)).alias("b1"),
        F.when(ok, F.round(b2, 6)).alias("b2"),
        F.when(
            ok & (syy > 0), F.round(F.lit(1.0) - sse_c / syy, 6)
        ).alias("r2"),
    )


def yuen_trimmed_t(
    df,
    group_col,
    value_col: str,
    trim_num: int = 20,
    trim_den: int = 100,
    quant: int = 100,
):
    """Yuen's trimmed-mean t-test between two arms — ONE row ``(n1, n2,
    h1, h2, tmean1, tmean2, diff, t)``: compares 20%-trimmed means with
    winsorized variances (Yuen 1974).  The third robustness leg of the
    A/B family: ab_test_ztest trusts raw means (whales own it),
    mann_whitney_u abandons means entirely — Yuen keeps the "how much
    MONEY" units while bounding any single tail's influence.
    ``group_col`` must be 0/1.

    EXACT at any scale via the winsorized_mean value-grid discipline —
    no per-arm sort: per arm, trim counts ``g = ⌊trim·n⌋`` are integer
    rationals; the trimmed sum adds each grid cell's OVERLAP with the
    rank window [g+1, n−g] (exact integers from the grid cumulative);
    winsorization clamps grid values at the window's order statistics
    and the clamped Σ, Σ² are exact DECIMALs.  t is one fixed IEEE
    chain (Yuen: d_j = (n_j−1)·s²_wj/(h_j(h_j−1)), t = Δ/√(d₁+d₂)),
    rounded 6 dp; NULL when either winsorized variance is 0.

    Scale shape: one combinable (arm, grid-value) aggregate over the
    fact, two quantization-bounded per-arm grid windows, two 2-row
    reduces, one 1-row pivot.  No collect.

    Reference parity: no reference counterpart — experimentation
    extension next to winsorized_mean/mann_whitney_u (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    g = group_col if not isinstance(group_col, str) else F.col(group_col)
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    grid = (
        df.filter(F.col(value_col).isNotNull() & g.isin(0, 1))
        .select(g.cast("int").alias("__g"), qv.alias("__q"))
        .groupBy("__g", "__q")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = (
        Window.partitionBy("__g")
        .orderBy("__q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # quantization-bounded per-arm grid window
    grid = grid.withColumn("__cum", F.sum("__c").over(w))
    totals = grid.groupBy("__g").agg(F.sum("__c").cast("long").alias("__n"))
    gg = grid.join(F.broadcast(totals), "__g")
    # g = floor(trim·n) as an integer rational; window ranks [g+1, n−g]
    tcnt = F.floor(
        (F.lit(trim_num) * F.col("__n")) / F.lit(trim_den)
    ).cast("long")
    lo_rank = tcnt + 1
    hi_rank = F.col("__n") - tcnt
    bounds = gg.groupBy("__g").agg(
        F.min(F.when(F.col("__cum") >= lo_rank, F.col("__q"))).alias("__vlo"),
        F.min(F.when(F.col("__cum") >= hi_rank, F.col("__q"))).alias("__vhi"),
        F.first("__n").alias("__n"),
        F.first(lo_rank).alias("__lor"),
        F.first(hi_rank).alias("__hir"),
    )
    gb = gg.drop("__n").join(F.broadcast(bounds), "__g")
    # trimmed-window overlap of the cell's rank span [cum−c+1, cum]
    span_lo = F.col("__cum") - F.col("__c") + 1
    overlap = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("__cum"), F.col("__hir"))
        - F.greatest(span_lo, F.col("__lor"))
        + 1,
    )
    clamped = F.greatest(
        F.least(F.col("__q"), F.col("__vhi")), F.col("__vlo")
    ).cast(dec)
    per = gb.groupBy("__g").agg(
        F.first("__n").alias("n"),
        (F.first("__hir") - F.first("__lor") + 1).alias("h"),
        F.sum(overlap.cast(dec) * F.col("__q")).alias("__tsum"),
        F.sum(clamped * F.col("__c")).alias("__ws"),
        F.sum(clamped * clamped * F.col("__c")).alias("__wss"),
    )
    p = per.groupBy().pivot("__g", [0, 1]).agg(
        F.first("n").alias("n"),
        F.first("h").alias("h"),
        F.first("__tsum").alias("ts"),
        F.first("__ws").alias("ws"),
        F.first("__wss").alias("wss"),
    )

    def arm(j, c_):
        return F.col(f"{j}_{c_}")

    out_cols = []
    parts = {}
    for j in (0, 1):
        nd = arm(j, "n").cast("double")
        h = arm(j, "h").cast("double")
        tm = arm(j, "ts").cast("double") / h / F.lit(float(quant))
        ssw = (
            arm(j, "wss").cast("double")
            - arm(j, "ws").cast("double") * arm(j, "ws").cast("double") / nd
        )
        # (n−1)·s²w/(h(h−1)) algebraically — but computed DIRECTLY as
        # SSW/(h(h−1)) so the IEEE chain matches the oracle exactly
        d = ssw / (h * (h - 1)) / F.lit(float(quant * quant))
        parts[j] = (tm, d)
    diff = parts[1][0] - parts[0][0]
    dsum = parts[0][1] + parts[1][1]
    return p.select(
        arm(0, "n").alias("n1"),
        arm(1, "n").alias("n2"),
        arm(0, "h").cast("long").alias("h1"),
        arm(1, "h").cast("long").alias("h2"),
        F.round(parts[0][0], 6).alias("tmean1"),
        F.round(parts[1][0], 6).alias("tmean2"),
        F.round(diff, 6).alias("diff"),
        F.when(dsum > 0, F.round(diff / F.sqrt(dsum), 6)).alias("t"),
    )


def cochran_armitage(
    df: DataFrame,
    score_col,
    label_col,
) -> DataFrame:
    """Cochran–Armitage test for TREND in proportions across ordered
    categories — ONE row ``(n, k_levels, p_pooled, slope_sign, z)``:
    does a binary outcome's rate rise or fall MONOTONICALLY with an
    ordered score (hour of day, bucket index, dose)?  The ordered
    companion of chi2_independence: chi² asks "any association",
    this asks "a directional one", and it keeps its power when the
    association is a trend because it spends its single degree of
    freedom on exactly that.

    ``score_col`` must be an integer category score; ``label_col`` a
    0/1 outcome.  Z = Σsᵢ(rᵢ − nᵢp̄) / √(p̄(1−p̄)·[Σnᵢsᵢ² − (Σnᵢsᵢ)²/N])
    with all moments exact DECIMAL integers (the variance bracket is
    carried ×N to stay integral), one fixed IEEE chain, rounded 6 dp;
    NULL when p̄ ∈ {0, 1} or the scores are constant.

    Scale shape: ONE combinable per-level aggregate over the fact, one
    1-row reduce.  No window, no join, no collect.

    Reference parity: no reference counterpart — experimentation
    extension next to chi2_independence/ab_test_ztest (driver brief).
    """
    dec = "decimal(38,0)"
    s = score_col if not isinstance(score_col, str) else F.col(score_col)
    y = label_col if not isinstance(label_col, str) else F.col(label_col)
    per = (
        df.select(s.cast("long").alias("__s"), y.cast("int").alias("__y"))
        .filter(F.col("__s").isNotNull() & F.col("__y").isNotNull())
        .groupBy("__s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum("__y").cast("long").alias("__r"),
        )
    )
    agg = per.agg(
        F.sum("__n").cast(dec).alias("__N"),
        F.count(F.lit(1)).cast("long").alias("k_levels"),
        F.sum("__r").cast(dec).alias("__R"),
        F.sum(F.col("__s").cast(dec) * F.col("__r")).alias("__sr"),
        F.sum(F.col("__s").cast(dec) * F.col("__n")).alias("__sn"),
        F.sum(F.col("__s").cast(dec) * F.col("__s") * F.col("__n")).alias(
            "__ssn"
        ),
    )
    N = F.col("__N")
    R = F.col("__R")
    # numerator ×N:  N·Σs·r − R·Σs·n   (exact DECIMAL)
    num_xn = N * F.col("__sr") - R * F.col("__sn")
    # variance bracket ×N:  N·Σn·s² − (Σn·s)²   (exact DECIMAL)
    var_xn = N * F.col("__ssn") - F.col("__sn") * F.col("__sn")
    p = R.cast("double") / N.cast("double")
    z = num_xn.cast("double") / N.cast("double") / F.sqrt(
        p
        * (F.lit(1.0) - p)
        * (var_xn.cast("double") / N.cast("double"))
    )
    ok = (R > 0) & (R < N) & (var_xn > 0)
    return agg.select(
        N.cast("long").alias("n"),
        "k_levels",
        F.round(p, 6).alias("p_pooled"),
        F.when(num_xn > 0, F.lit(1))
        .when(num_xn < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("slope_sign"),
        F.when(ok, F.round(z, 6)).alias("z"),
    )


def ratio_metric_ztest(
    df: DataFrame,
    unit_col: str,
    num_col,
    den_col,
    group_col,
) -> DataFrame:
    """Two-arm z-test on a RATIO metric (Σnum/Σden per arm) with
    delta-method variance — ONE row ``(n1, n2, ratio1, ratio2, diff,
    z)``.  The missing member of the A/B family: CTR, revenue-per-
    session, tokens-per-request are ratios of SUMS whose denominator
    varies per unit — treating them as per-unit averages biases the
    metric, and treating units as independent rows understates the
    variance (a user's clicks correlate).  Delta method on per-UNIT
    (X, Y): Var(X̄/Ȳ) ≈ (S²_X − 2R·S_XY + R²·S²_Y)/(n·Ȳ²)
    (Deng, Knoblich & Lu 2018).  ``group_col`` must be 0/1.

    Exactness: per-unit X, Y are exact e6 integer sums, so the per-arm
    moments (n, ΣX, ΣY, ΣXX, ΣYY, ΣXY) are exact DECIMAL(38,0); R, the
    three (co)variances and z are one fixed IEEE chain over their
    exact-cast values, rounded 6 dp; NULL when either arm's variance
    term is ≤ 0 or a denominator is 0.

    Scale shape: ONE combinable per-(arm, unit) aggregate over the
    fact, one 2-row reduce, one 1-row pivot.  No window, no collect.

    Reference parity: no reference counterpart — experimentation
    extension next to ab_test_ztest/cuped (driver brief).
    """
    dec = "decimal(38,0)"
    g = group_col if not isinstance(group_col, str) else F.col(group_col)
    num = num_col if not isinstance(num_col, str) else F.col(num_col)
    den = den_col if not isinstance(den_col, str) else F.col(den_col)

    def q6(c):
        return F.floor(
            c.cast("double") * F.lit(1.0e6) + F.lit(0.5)
        ).cast("long")

    units = (
        df.filter(g.isin(0, 1) & F.col(unit_col).isNotNull())
        .select(
            g.cast("int").alias("__g"),
            F.col(unit_col).alias("__u"),
            F.coalesce(q6(num), F.lit(0)).alias("__x"),
            F.coalesce(q6(den), F.lit(0)).alias("__y"),
        )
        .groupBy("__g", "__u")
        .agg(
            F.sum(F.col("__x").cast(dec)).alias("__X"),
            F.sum(F.col("__y").cast(dec)).alias("__Y"),
        )
    )
    per = units.groupBy("__g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("__X").alias("sx"),
        F.sum("__Y").alias("sy"),
        F.sum(F.col("__X") * F.col("__X")).alias("sxx"),
        F.sum(F.col("__Y") * F.col("__Y")).alias("syy"),
        F.sum(F.col("__X") * F.col("__Y")).alias("sxy"),
    )
    p = per.groupBy().pivot("__g", [0, 1]).agg(
        F.first("n").alias("n"),
        F.first("sx").alias("sx"),
        F.first("sy").alias("sy"),
        F.first("sxx").alias("sxx"),
        F.first("syy").alias("syy"),
        F.first("sxy").alias("sxy"),
    )

    def arm(j):
        n = F.col(f"{j}_n").cast("double")
        sx = F.col(f"{j}_sx").cast("double")
        sy = F.col(f"{j}_sy").cast("double")
        r = sx / sy
        # sample (co)variances ×(n−1)·n — kept as one chain
        vx = F.col(f"{j}_sxx").cast("double") * n - sx * sx
        vy = F.col(f"{j}_syy").cast("double") * n - sy * sy
        vxy = F.col(f"{j}_sxy").cast("double") * n - sx * sy
        ybar = sy / n
        # Var(R) ≈ (S²x − 2R·Sxy + R²·S²y) / (n·Ȳ²), with S² = v/(n(n−1))
        var_r = (vx - 2.0 * r * vxy + r * r * vy) / (
            n * (n - 1.0) * n * ybar * ybar
        )
        return n, r, var_r, sy

    n0, r0, v0, sy0 = arm(0)
    n1, r1, v1, sy1 = arm(1)
    ok = (
        (F.col("0_n") > 1)
        & (F.col("1_n") > 1)
        & (F.col("0_sy") > 0)
        & (F.col("1_sy") > 0)
    )
    vsum = v0 + v1
    return p.select(
        F.col("0_n").alias("n1"),
        F.col("1_n").alias("n2"),
        F.when(F.col("0_sy") > 0, F.round(r0, 6)).alias("ratio1"),
        F.when(F.col("1_sy") > 0, F.round(r1, 6)).alias("ratio2"),
        F.when(ok, F.round(r1 - r0, 6)).alias("diff"),
        F.when(ok & (vsum > 0), F.round((r1 - r0) / F.sqrt(vsum), 6)).alias(
            "z"
        ),
    )


def levene_test(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quant: int = 100,
) -> DataFrame:
    """Brown–Forsythe (median-centred Levene) test for EQUAL VARIANCES
    across k groups — ONE row ``(n, k_groups, w_stat)``: the
    assumption gate in front of anova_oneway / the t-family.  W is the
    one-way ANOVA F computed on |x − median(group)|; centring on the
    MEDIAN (Brown–Forsythe 1974) keeps the test honest under skew,
    which is exactly when variance checks matter.

    Exactness: per-group medians are exact-rank grid picks (smallest
    grid value with cum ≥ ⌈n/2⌉ — the winsorized_mean discipline, no
    interpolation); |x − med| is an exact integer per grid cell, and
    the ANOVA moments over those integers follow anova_oneway's exact
    DECIMAL + floor-division path.  W is one fixed IEEE chain, rounded
    6 dp; NULL when k < 2 or the deviations are constant.

    Scale shape: one combinable (group, grid-value) cell aggregate over
    the fact, one quantization-bounded per-group grid window, one
    k-row median frame joined back onto the CELLS (not the fact), one
    k-row reduce, one 1-row reduce.  No second fact scan, no collect.

    Reference parity: no reference counterpart — experimentation
    extension next to anova_oneway (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(float(quant)) + F.lit(0.5)
    ).cast("long")
    cells = (
        df.filter(F.col(group_col).isNotNull() & F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("__grp"), qv.alias("__q"))
        .groupBy("__grp", "__q")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
    )
    w = (
        Window.partitionBy("__grp")
        .orderBy("__q")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cells = cells.withColumn("__cum", F.sum("__c").over(w))
    tot = cells.groupBy("__grp").agg(F.sum("__c").cast("long").alias("__n"))
    gc = cells.join(F.broadcast(tot), "__grp")
    med = gc.groupBy("__grp").agg(
        F.min(
            F.when(F.col("__cum") * 2 >= F.col("__n"), F.col("__q"))
        ).alias("__med")
    )
    dev = cells.join(F.broadcast(med), "__grp").select(
        "__grp",
        F.abs(F.col("__q") - F.col("__med")).alias("__d"),
        "__c",
    )

    def idiv(a, b):
        return ((a - F.pmod(a, b)) / b).cast(dec)

    per = dev.groupBy("__grp").agg(
        F.sum("__c").cast("long").alias("__ng"),
        F.sum(F.col("__c").cast(dec) * F.col("__d")).alias("__s"),
        F.sum(F.col("__c").cast(dec) * F.col("__d") * F.col("__d")).alias(
            "__ss"
        ),
    )
    per = per.withColumn(
        "__tq", idiv(F.col("__s") * F.col("__s"), F.col("__ng").cast(dec))
    )
    agg = per.agg(
        F.sum("__ng").cast(dec).alias("__N"),
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("__s").alias("__S"),
        F.sum("__ss").alias("__SS"),
        F.sum("__tq").alias("__T"),
    )
    N = F.col("__N")
    k = F.col("k_groups").cast(dec)
    gterm = (F.col("__S") * F.col("__S") - F.pmod(
        F.col("__S") * F.col("__S"), N
    )) / N
    ssb = F.greatest(F.col("__T") - gterm, F.lit(0).cast(dec))
    ssw = F.col("__SS") - F.col("__T")
    ok = (F.col("k_groups") >= 2) & (N > k) & (ssw > 0)
    return agg.select(
        N.cast("long").alias("n"),
        "k_groups",
        F.when(
            ok,
            F.round(
                (ssb.cast("double") / (k - 1).cast("double"))
                / (ssw.cast("double") / (N - k).cast("double")),
                6,
            ),
        ).alias("w_stat"),
    )


def concentration_at(
    df: DataFrame,
    unit_col: str,
    value_col: str,
    p_num: int = 90,
    p_den: int = 100,
) -> DataFrame:
    """Inverse-Lorenz concentration — ONE row ``(n_units, total,
    k_units, share_of_units)``: the SMALLEST number of units whose
    value sum reaches ``p_num/p_den`` of the total ("0.8% of users
    drive 90% of revenue").  The actionable reading of revenue_gini's
    abstract coefficient: Gini says "concentrated", this says how many
    accounts the retention team must call.

    EXACT at any scale via the winsorized_mean value-grid discipline —
    no per-unit sort: per-unit totals are exact e6 integers, the grid
    cumulative runs TOP-DOWN, the threshold comparison is the integer
    rational ``cum·p_den ≥ p_num·total``, and inside the boundary cell
    (all units there share one value v*) the needed count is the exact
    ceiling ``⌈(target − sum_above)/v*⌉`` — integer arithmetic end to
    end; share is one division, rounded 6 dp.  Per-unit totals must be
    NON-NEGATIVE — ENFORCED: units with a negative total are excluded
    from the grid and from ``n_units`` (they cannot carry concentration
    mass and would break cumulative monotonicity).  The output is EMPTY
    when the total is 0 (no positive mass to concentrate).

    Scale shape: one combinable per-unit aggregate, one grid aggregate,
    one quantization-bounded DESC grid cumulative, one 1-row reduce.
    No collect.

    Reference parity: no reference counterpart — inequality extension
    next to revenue_gini/theil_index (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    units = (
        df.filter(F.col(unit_col).isNotNull() & F.col(value_col).isNotNull())
        .groupBy(F.col(unit_col).alias("__u"))
        .agg(F.sum(qv.cast(dec)).alias("__v"))
    )
    # ENFORCE the documented non-negativity contract (r8 advice): a
    # negative per-unit total would break the top-down cumulative's
    # monotonicity and silently corrupt the boundary-cell selection, so
    # such units are excluded from the grid (and from n_units) outright
    # rather than poisoning the closed form.
    units = units.filter(F.col("__v") >= 0)
    grid = units.groupBy("__v").agg(
        F.count(F.lit(1)).cast("long").alias("__c")
    )
    w = Window.orderBy(F.col("__v").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # quantization-bounded DESC grid cumulative (value sums + unit counts)
    g = grid.withColumn(
        "__cumv", F.sum(F.col("__v") * F.col("__c")).over(w)
    ).withColumn("__cumc", F.sum("__c").over(w))
    tot = g.agg(
        F.max("__cumv").alias("__total"),
        F.max("__cumc").cast("long").alias("n_units"),
    )
    gt = g.crossJoin(F.broadcast(tot))  # 1-row scalar broadcast
    target_hit = (
        F.col("__cumv").cast(dec) * F.lit(p_den)
        >= F.col("__total").cast(dec) * F.lit(p_num)
    )
    # boundary cell: first (highest-value) cell where the cumulative
    # crosses the target; exact unit count inside it by integer ceiling
    boundary = gt.filter(target_hit & (F.col("__v") > 0)).agg(
        F.max("__v").alias("__bv")
    )
    sel = gt.crossJoin(F.broadcast(boundary)).filter(
        F.col("__v") == F.col("__bv")
    )
    above_v = F.col("__cumv").cast(dec) - F.col("__v").cast(dec) * F.col("__c")
    above_c = (F.col("__cumc") - F.col("__c")).cast(dec)
    # target = ceil(p·total/p_den) in e6 units (integer rational)
    tgt = F.col("__total").cast(dec) * F.lit(p_num)
    need = tgt - above_v * F.lit(p_den)
    denom = F.col("__v").cast(dec) * F.lit(p_den)
    k_in_cell = F.when(
        need <= 0, F.lit(0).cast(dec)
    ).otherwise(
        ((need + denom - 1) - F.pmod(need + denom - 1, denom)) / denom
    )
    out = sel.select(
        F.col("n_units"),
        F.col("__total"),
        (above_c + k_in_cell).cast("long").alias("k_units"),
    )
    return out.select(
        "n_units",
        F.round(
            F.col("__total").cast("double") / F.lit(1.0e6), 6
        ).alias("total"),
        "k_units",
        F.when(
            F.col("n_units") > 0,
            F.round(
                F.col("k_units").cast("double")
                / F.col("n_units").cast("double"),
                6,
            ),
        ).alias("share_of_units"),
    )


def rmst(
    df: DataFrame,
    t_col: str,
    censored_col: str,
    tau: int = 14,
) -> DataFrame:
    """Restricted mean survival time — ONE row ``(tau, n, rmst,
    km_at_tau, median_t)``: the area under the Kaplan–Meier curve up to
    ``tau``, i.e. the average time-alive-within-τ a subject actually
    gets.  The clinically-preferred summary when hazards aren't
    proportional (a log-rank χ² can be ~0 while curves cross; RMST
    differences stay interpretable), plus the median lifetime (first
    time S ≤ ½, NULL if survival never falls that far) and S(τ) itself.

    Exactness: the KM factors follow the survival_km discipline (exact
    d/n integers, e9-quantized per-step logs summed exactly, one libm
    exp); each step's survival is then e9-REquantized to a BIGINT so
    the trapezoid-free step-function area Σ S(tᵢ)·Δtᵢ is an exact
    integer sum over the day grid (S = 1 before the first event time),
    and rmst is one final division, rounded 6 dp.

    Scale shape: one combinable per-time aggregate over the subjects,
    cumulative + lead windows over the bounded DAY grid (the
    survival_km contract), one 1-row reduce.

    Reference parity: no reference counterpart — survival-analysis
    extension next to survival_km/nelson_aalen (driver brief).
    """
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    grid = (
        df.filter(F.col(t_col).isNotNull())
        .select(
            F.col(t_col).cast("long").alias("t"),
            F.col(censored_col).cast("int").alias("__c"),
        )
        .groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__ending"),
            F.sum(F.lit(1) - F.col("__c")).cast("long").alias("__d"),
        )
    )
    w_tot = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_excl = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_ord = Window.orderBy("t")
    staged = grid.withColumn(
        "__risk",
        (
            F.sum("__ending").over(w_tot)
            - F.coalesce(F.sum("__ending").over(w_excl), F.lit(0))
        ).cast("long"),
    ).withColumn("__n", F.sum("__ending").over(w_tot).cast("long"))
    l9 = F.when(
        F.col("__risk") > F.col("__d"),
        F.floor(
            F.log(
                (F.col("__risk") - F.col("__d")).cast("double")
                / F.col("__risk").cast("double")
            )
            * F.lit(1.0e9)
            + F.lit(0.5)
        ).cast("long"),
    ).otherwise(F.lit(-1000000000000))
    staged = staged.withColumn(
        "__s9",
        F.floor(
            F.exp(
                F.sum(l9).over(w_cum).cast("double") / F.lit(1.0e9)
            )
            * F.lit(1.0e9)
            + F.lit(0.5)
        ).cast("long"),
    )
    # step-function area on [0, tau]: S = 1 on [0, t_first), then S(t_i)
    # on [t_i, t_{i+1}) — every interval clipped to tau
    prev_s = F.coalesce(F.lag("__s9").over(w_ord), F.lit(1000000000))
    prev_t = F.coalesce(F.lag("t").over(w_ord), F.lit(0))
    seg_lo = F.least(prev_t, F.lit(tau))
    seg_hi = F.least(F.col("t"), F.lit(tau))
    area_term = (prev_s.cast(dec) * (seg_hi - seg_lo))
    staged = staged.withColumn("__area", area_term)
    # the tail segment [t_last, tau] at the final survival level
    agg = staged.agg(
        F.max("__n").alias("n"),
        F.sum("__area").alias("__a"),
        F.max_by(F.col("__s9"), F.col("t")).alias("__slast"),
        F.max("t").alias("__tlast"),
        # S at the largest event time ≤ tau (NULL if none → S(tau) = 1)
        F.max_by(
            F.col("__s9"), F.when(F.col("t") <= tau, F.col("t"))
        ).alias("__stau_last"),
        F.min(
            F.when(F.col("__s9") * 2 <= 1000000000, F.col("t"))
        ).alias("median_t"),
    )
    tail = F.when(
        F.col("__tlast") < tau,
        F.col("__slast").cast(dec) * (F.lit(tau) - F.col("__tlast")),
    ).otherwise(F.lit(0).cast(dec))
    km_tau = F.round(
        F.coalesce(F.col("__stau_last"), F.lit(1000000000)).cast("double")
        / F.lit(1.0e9),
        6,
    )
    return agg.select(
        F.lit(tau).alias("tau"),
        "n",
        F.round(
            (F.col("__a") + tail).cast("double") / F.lit(1.0e9), 6
        ).alias("rmst"),
        km_tau.alias("km_at_tau"),
        "median_t",
    )
