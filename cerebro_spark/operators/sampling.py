"""Deterministic sampling / splitting / chunking / redaction for
training-data pipelines (driver-mandated extension family).

Everything is hash-deterministic (portable md5-prefix hash), never RNG-based:
at 100 TB a resumable pipeline must produce the same sample on retry, across
executors, and across engines — `rand()`-based sampling gives none of that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _portable_bucket(col: Column, buckets: int = 100) -> Column:
    """Deterministic [0, buckets) assignment from the md5 of the value —
    reproducible in any engine (same construction as the minhash token
    hash)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )


def deterministic_sample(
    df: DataFrame,
    fraction_pct: int,
    key_col: str,
    buckets: int = 100,
) -> DataFrame:
    """Keep ~fraction_pct% of rows, chosen by key hash — stable under
    retries, re-ordering, and re-partitioning (unlike ``df.sample``)."""
    return df.filter(_portable_bucket(F.col(key_col), buckets) < fraction_pct)


def train_val_test_split(
    df: DataFrame,
    key_col: str,
    val_pct: int = 10,
    test_pct: int = 10,
    out_col: str = "split",
) -> DataFrame:
    """Assign train/val/test by key hash: same key always lands in the same
    split (the leakage-safe way to split grouped data — hash the group key)."""
    b = _portable_bucket(F.col(key_col), 100)
    return df.withColumn(
        out_col,
        F.when(b < test_pct, F.lit("test"))
        .when(b < test_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def leakage_guarded_split(
    df: DataFrame,
    url_col: str,
    val_pct: int = 10,
    test_pct: int = 10,
    out_col: str = "split",
    domain_col: str = "domain",
) -> DataFrame:
    """Train/val/test split keyed by the REGISTERED (pay-level) domain of
    a URL column — the leakage guard for web-corpus eval: splitting by
    doc id (or even by full host) puts ``en.wikipedia.org`` in train and
    ``de.wikipedia.org`` in test, leaking near-identical site boilerplate
    and templates across the boundary.  Hashing the registered domain
    (``text.registered_domain ∘ text.canonicalize_url``) makes host-level
    leakage structurally impossible: every page of ``*.example.co.uk``
    lands in exactly ONE split, deterministically.

    Adds ``domain_col`` (the split key, kept for audit joins) and
    ``out_col`` ('train'/'val'/'test').  Same md5 portable bucket as
    :func:`train_val_test_split`, so the assignment is reproducible in
    any engine and stable under retries/re-partitioning.

    Scale shape: pure per-row projection + filter-free map — the
    canonicalization/domain chain is whole-stage-codegen regexps, the
    bucket one md5; NO shuffle, no domain dictionary to build or
    broadcast.  At 100 TB this is a free rider on the scan.

    Reference parity: no reference counterpart — corpus-prep extension
    composing canonicalize_url/registered_domain with the split
    (driver brief).
    """
    from .text import canonicalize_url, registered_domain

    dom = registered_domain(canonicalize_url(F.col(url_col)))
    return train_val_test_split(
        df.withColumn(domain_col, dom),
        domain_col,
        val_pct=val_pct,
        test_pct=test_pct,
        out_col=out_col,
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, int],
    key_col: str,
    default_pct: int = 100,
) -> DataFrame:
    """Per-stratum deterministic sampling — rebalance a skewed corpus by
    keeping a different hash-fraction per stratum (e.g. downsample the
    dominant language, keep all of a rare one).

    The bucket hash is salted with the stratum value so the kept key set is
    independent across strata (an unsalted key hash would select the SAME
    keys in every stratum — correlated selection).  Pure filter: no shuffle,
    fully pushdown-friendly, stable under retries/reordering."""
    b = _portable_bucket(
        F.concat_ws("|", F.col(stratum_col), F.col(key_col).cast("string"))
    )
    pct = F.lit(default_pct)
    for value, keep in fractions.items():
        pct = F.when(F.col(stratum_col) == value, F.lit(keep)).otherwise(pct)
    return df.filter(b < pct)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str,
    key_col: str,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic domain-mixture sampler: draw the LARGEST sample whose
    domain composition matches ``weights`` (the DoReMi/Pile-style corpus
    reweighting step; domains not listed are dropped).

    With per-domain counts n_d, the max total hitting the exact mixture is
    S = min_d(n_d / w_d); each domain keeps fraction w_d·S/n_d via the salted
    hash bucket (stable under retries, independent across domains).  The
    counts and their min are |domains|-row aggregates joined back broadcast —
    no driver collect, no shuffle of the data itself; the final filter is a
    pure map over the scan.
    """
    w_expr = F.lit(None).cast("double")
    for value, wt in weights.items():
        w_expr = F.when(F.col("__dom") == value, F.lit(float(wt))).otherwise(
            w_expr
        )
    counts = (
        df.groupBy(F.col(domain_col).alias("__dom"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .withColumn("__w", w_expr)
        .filter(F.col("__w").isNotNull())
    )
    s = counts.agg(F.min(F.col("__n") / F.col("__w")).alias("__s"))
    keep = counts.crossJoin(F.broadcast(s)).select(
        "__dom",
        (F.lit(float(buckets)) * F.col("__w") * F.col("__s") / F.col("__n")).alias(
            "__pct"
        ),
    )
    b = _portable_bucket(
        F.concat_ws("|", F.col(domain_col), F.col(key_col).cast("string")),
        buckets,
    )
    return (
        df.join(
            F.broadcast(keep), df[domain_col] == F.col("__dom"), "inner"
        )
        .filter(b < F.col("__pct"))
        .drop("__dom", "__pct")
    )


def pack_tokens(
    df: DataFrame,
    budget: int,
    partition_col: str,
    order_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-split sequence packing (the GPT-style pretraining batcher):
    documents are concatenated in a deterministic order and cut every
    ``budget`` tokens, so ``batch_id = floor(tokens_before / budget)`` and a
    document may span a batch boundary (``batch_offset`` = its start inside
    the batch).

    The running sum is windowed per ``partition_col`` (shard/domain) — never
    a global single-partition window.  For one global stream at 100 TB:
    range-repartition by ``order_col``, pack per range, then shift each
    range's ids by the previous ranges' token totals (a tiny per-range
    aggregate) — same two-level pattern as the overlap-bucket rolling
    windows.
    """
    from pyspark.sql import Window

    from cerebro_spark.operators.text import token_count

    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n_tok = token_count(F.col(text_col))
    return df.select(
        F.col(order_col),
        F.col(partition_col),
        n_tok.alias("n_tokens"),
    ).select(
        order_col,
        partition_col,
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("__before"),
    ).select(
        order_col,
        partition_col,
        "n_tokens",
        F.floor(F.col("__before") / F.lit(float(budget))).alias("batch_id"),
        (F.col("__before") % budget).alias("batch_offset"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_groups: int = 8,
) -> DataFrame:
    """Boundary-preserving sequence packing — the LAST step of a training-
    data pipeline: pack tokenized documents into fixed-length training
    sequences by deterministic GREEDY FIRST-FIT over (length DESC, id ASC),
    never splitting a document across sequences (the ``pack_tokens``
    concat-and-split layout is the other discipline; THIS one is for
    pipelines that pad rather than straddle).  Invariants: no token lost
    (documents longer than ``seq_len`` are first split into deterministic
    ceil(n/L) chunks — full-L chunks then the remainder — each chunk an
    indivisible packable item), and no sequence exceeds ``seq_len``.

    Returns one row per item: ``(id_col, chunk_id, grp, seq_id, offset,
    n_tokens)`` — ``seq_id`` is 1-based within ``grp``, ``offset`` the
    item's start inside its sequence; ``(grp, seq_id)`` identifies a
    training sequence.

    Scale shape: packing is a sequential fold, so it runs PER GROUP —
    ``grp`` is a portable hash of the document id (uniform by
    construction, never data-skewed), and ``n_groups`` bounds the fold
    size at corpus_items / n_groups; raise it with the corpus and every
    group packs in parallel.  The fold itself is ONE Arrow stage per
    group (first-fit needs the open-bin state; SQL window functions
    cannot reset an accumulator per bin) — everything before it (token
    counts, chunk explode, grouping) is JVM.  Fill efficiency is
    first-fit-decreasing's classic 11/9·OPT bound per group; cross-group
    loss is at most one underfilled bin per group.
    """
    import pandas as pd

    assert seq_len > 0 and n_groups > 0
    n = F.col(n_tokens_col).cast("long")
    items = (
        df.filter(n > 0)
        .withColumn("__nc", F.ceil(n / F.lit(float(seq_len))).cast("int"))
        .select(
            F.col(id_col),
            n.alias("__n"),
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias(
                "chunk_id"
            ),
            "__nc",
        )
        .select(
            id_col,
            "chunk_id",
            F.when(
                F.col("chunk_id") < F.col("__nc") - 1, F.lit(seq_len)
            )
            .otherwise(
                F.col("__n") - (F.col("__nc") - 1) * F.lit(seq_len)
            )
            .cast("long")
            .alias("n_tokens"),
        )
        .withColumn(
            "grp", _portable_bucket(F.col(id_col), n_groups).cast("int")
        )
    )

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", id_col, "chunk_id"],
            ascending=[False, True, True],
        ).reset_index(drop=True)
        rem: list[int] = []  # remaining capacity per open bin
        seq_ids, offsets = [], []
        for ln in pdf["n_tokens"]:
            ln = int(ln)
            for j, r in enumerate(rem):
                if r >= ln:
                    seq_ids.append(j + 1)
                    offsets.append(seq_len - r)
                    rem[j] = r - ln
                    break
            else:
                rem.append(seq_len - ln)
                seq_ids.append(len(rem))
                offsets.append(0)
        pdf["seq_id"] = pd.Series(seq_ids, dtype="int32")
        pdf["offset"] = pd.Series(offsets, dtype="int64")
        return pdf

    out_schema = (
        f"{id_col} long, chunk_id int, n_tokens long, grp int, "
        "seq_id int, offset long"
    )
    return items.groupBy("grp").applyInPandas(_ffd, out_schema).select(
        id_col, "chunk_id", "grp", "seq_id", "offset", "n_tokens"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split documents into overlapping token-window chunks (the LLM-training
    segmentation step): stride = chunk_tokens - overlap; the final partial
    chunk is kept.  Pure explode — row fan-out, no shuffle."""
    assert 0 <= overlap < chunk_tokens
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.alias("chunk_id"),
            F.array_join(
                F.slice(toks, i * stride + 1, chunk_tokens), " "
            ).alias("chunk_text"),
        ),
    )
    return df.select(
        F.col(id_col), F.explode(chunks).alias("c")
    ).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


#: default redaction patterns (RE2/Java-compatible; applied in order).
REDACTION_PATTERNS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
)


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    patterns: tuple[tuple[str, str], ...] = REDACTION_PATTERNS,
    out_col: str | None = None,
) -> DataFrame:
    """Regex PII redaction over a text column — chained ``regexp_replace``
    (JVM, whole-stage codegen).  Pattern set is the standard email/phone/
    SSN/card starter; extend per deployment."""
    out_col = out_col or text_col
    col = F.col(text_col)
    for pat, repl in patterns:
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col, col)


def epoch_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    epoch: int = 0,
    num_shards: int = 8,
) -> DataFrame:
    """Deterministic per-epoch corpus shuffle into training shards: the
    shuffle order is the md5 hash of ``(id, epoch)`` — a new epoch value
    reshuffles every document with zero RNG state, and any worker can
    recompute the order (reproducible data loading).

    Each doc gets ``(shard, pos)``: shard = hash mod ``num_shards``; pos =
    rank of the hash within the shard.  The within-shard rank is a window
    partitioned BY SHARD — parallelism equals ``num_shards``, which at scale
    is sized like the output file count (hundreds to thousands), not a
    constant 8; one shard = one sequentially-written training file, so the
    per-shard serial rank matches the actual write pattern rather than
    fighting it.
    """
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(epoch)))),
            1,
            14,
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.withColumn("h", h)
        .withColumn("shard", F.pmod(F.col("h"), F.lit(num_shards)).cast("int"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .drop("h")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str,
    buckets: int = 100,
) -> DataFrame:
    """Keep each row with probability ≈ its weight (a [0,1] column — e.g. a
    quality score), decided by key hash instead of RNG: row survival is
    stable under retries and re-partitioning, and any engine reproduces the
    exact kept set from (key, weight) alone.

    The quality-weighted corpus downsample every training-data pipeline runs
    (keep high-quality docs, thin out low-quality ones) — one codegen'd
    filter, no shuffle, no state.
    """
    return df.filter(
        _portable_bucket(F.col(key_col), buckets)
        < F.col(weight_col).cast("double") * buckets
    )


def temperature_mixture_weights(
    df: DataFrame,
    domain_col: str = "source",
    alpha: float = 0.7,
    weight_col: str | None = None,
) -> DataFrame:
    """Temperature-reweighted domain mixture (the multilingual/multi-domain
    sampling rule of Conneau & Lample 2019 §3.1, also the CC/domain mix in
    most open pretraining recipes): sampling weight wᵢ ∝ pᵢ^α where pᵢ is
    the domain's corpus share.  α=1 keeps natural proportions; α→0 flattens
    toward uniform; 0.7 is the customary middle.

    Output per domain: ``n_docs`` (or Σ``weight_col``, e.g. token counts),
    ``share``, ``temp_weight`` (the normalized wᵢ), and ``boost`` =
    temp_weight/share — the effective over/under-sampling factor a sampler
    (``mixture_sample``/``weighted_sample``) should apply.  boost > 1 means
    the domain is repeated (epochs > 1 at a fixed token budget) — the
    low-resource upweighting the temperature exists for.

    Scale shape: one map-side-combinable groupBy to domain counts (output =
    #domains rows, a dimension table), then arithmetic over a 1-row total
    crossJoin — the same bounded-broadcast pattern as the decile/centroid
    summaries on the plan-audit allowlist.
    """
    mass = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    ).cast("double")
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        mass.alias("n_docs")
    )
    tot = counts.agg(
        F.sum("n_docs").alias("__total"),
        F.sum(F.pow(F.col("n_docs"), F.lit(alpha))).alias("__z"),
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "domain",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.round(F.col("n_docs") / F.col("__total"), 6).alias("share"),
            F.round(
                F.pow(F.col("n_docs"), F.lit(alpha)) / F.col("__z"), 6
            ).alias("temp_weight"),
            F.round(
                (F.pow(F.col("n_docs"), F.lit(alpha)) / F.col("__z"))
                / (F.col("n_docs") / F.col("__total")),
                6,
            ).alias("boost"),
        )
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep AT MOST ``k`` rows per key, chosen by deterministic hash rank —
    the "cap documents per domain/host" step of crawl-corpus mixing (a
    single over-represented host must not dominate the training mix).

    Survivors are the k smallest ``md5(id)`` values within each key: no RNG
    (retry-stable, engine-reproducible) and no bias toward input order.  The
    rank is a per-key ``row_number`` — the window partitions on the key, so
    at 100 TB it shuffles once on the key and never builds a global
    ordering; skew is bounded because every partition emits at most k rows
    after the filter.  The md5 tiebreak falls back to the id itself
    (collisions are not expected; determinism must not depend on that).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= k)
        .withColumnRenamed("__r", "key_rank")
    )


def kfold_target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    folds: int = 5,
    prior_weight: int = 20,
) -> DataFrame:
    """Leakage-safe K-fold (out-of-fold) target encoding — the grid
    ``(category, fold, n_fold, enc)`` where ``enc`` is the smoothed mean
    of ``target_col`` over every OTHER fold's rows of that category:

        enc = ((S_cat − S_cat,fold) + w·μ_global) / ((n_cat − n_cat,fold) + w)

    (Micci-Barreca 2001 smoothing; w = ``prior_weight`` pseudo-counts of
    the global mean, so rare categories shrink toward it and a category
    seen in only one fold still encodes as the prior).  Rows are assigned
    folds by the portable md5 bucket of ``id_col`` — deterministic in any
    engine, and the SAME assignment a train/val split would use, which is
    exactly what makes the encoding leakage-safe: a row's own target
    never reaches its own feature value.

    Exactness: targets are e6-quantized BIGINTs; putting the prior over
    the common denominator n_global makes the encoding ONE exact rational
    ``((S−S_f)·n_g + w·S_g) / (((n−n_f)+w)·n_g)`` — both sides exact
    DECIMAL(38,0) integers (overflow-free to ~10⁹ rows at |target| ≤ 10⁵),
    divided in ONE correctly-rounded IEEE step and rounded to 6 dp.

    Scale shape: one combinable (cat, fold) aggregate over the fact, then
    everything runs on the |cats|·folds grid (re-aggregation for the cat
    marginals, a 1-row global reduce broadcast in — bounded metadata).
    To encode a frame, broadcast-join this grid on (cat, fold).
    """
    q = F.floor(
        F.col(target_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    fold = _portable_bucket(F.col(id_col), folds)
    base = df.filter(
        F.col(target_col).isNotNull() & F.col(cat_col).isNotNull()
    ).select(F.col(cat_col).alias("category"), fold.alias("fold"), q.alias("__q"))
    cell = base.groupBy("category", "fold").agg(
        F.count(F.lit(1)).alias("__nf"), F.sum("__q").alias("__sf")
    )
    cat = cell.groupBy("category").agg(
        F.sum("__nf").alias("__nc"), F.sum("__sf").alias("__sc")
    )
    glob = cell.agg(
        F.sum("__nf").alias("__ng"), F.sum("__sf").alias("__sg")
    )
    dec = "decimal(38,0)"
    g = cell.join(F.broadcast(cat), "category").crossJoin(F.broadcast(glob))
    num = (
        (F.col("__sc") - F.col("__sf")).cast(dec) * F.col("__ng")
        + F.lit(prior_weight).cast(dec) * F.col("__sg")
    )
    den = (
        (F.col("__nc") - F.col("__nf") + F.lit(prior_weight)).cast(dec)
        * F.col("__ng")
    )
    enc = F.round(
        num.cast("double") / den.cast("double") / F.lit(1.0e6), 6
    )
    return g.select(
        "category",
        "fold",
        F.col("__nf").cast("long").alias("n_fold"),
        enc.alias("enc"),
    )


def weighted_sample_exact_k(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exactly k rows
    (Efraimidis & Spirakis 2006): each row draws the deterministic
    uniform ``u = (md5(id) 52-bit mantissa + 1) / 2^52`` and survives
    iff its key ``ln(u)/w`` ranks in the top-k (the A-Res key
    ``u^(1/w)``, compared in log space — same order, no overflow).
    ``weighted_sample`` keeps each row independently (Bernoulli —
    output SIZE varies); this returns exactly k, the "pick k docs
    proportional to quality" selection step.

    Deterministic: u comes from the portable md5 of the id (the repo's
    no-RNG contract), the key is one fixed IEEE chain, and ties are
    impossible in practice (distinct ids → distinct 52-bit u) with the
    id itself as the final tiebreak.  Non-positive/NULL weights are
    excluded (they can never be sampled).

    Scale shape: one projection + TakeOrderedAndProject(k) — no
    shuffle beyond the top-k reduction.
    """
    w = F.col(weight_col).cast("double")
    u_bits = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 13), 16, 10)
        .cast("long")
    )
    u = (u_bits + F.lit(1.0)) / F.lit(float(2 ** 52))
    key = F.log(u) / w
    return (
        df.filter(w.isNotNull() & (w > 0))
        .withColumn("__es_key", key)
        .orderBy(F.col("__es_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("__es_key")
    )


def neyman_allocation(
    df: DataFrame,
    value_col: str,
    stratum_col: str,
    k: int = 1000,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation — per stratum
    ``(n, sd, share, n_alloc)`` with ``share ∝ n_h·s_h`` (Neyman 1934:
    for a fixed budget ``k``, sampling each stratum proportionally to
    its size×spread minimizes the variance of the stratified mean).
    The planning half of stratified_sample: THIS decides the per-stratum
    fractions; stratified_sample executes them.

    Exactness: per-stratum variance comes from exact e6-quantized
    integer moments (``n·Σv² − (Σv)²`` over ``n(n−1)`` — one IEEE
    division, one sqrt); the weight ``n_h·s_h`` is e6-quantized back to
    an exact BIGINT so the cross-stratum total is ORDER-FREE, and
    ``share`` is one exact-integer division.  ``n_alloc =
    ⌊share·k + ½⌋`` (documented: Σ n_alloc can differ from k by
    rounding; largest-remainder correction is the caller's choice).
    Single-row strata (no variance) get sd NULL and weight 0.

    Scale shape: one combinable per-stratum aggregate over the fact,
    then a strata-sized frame with a 1-row total broadcast (the
    temperature_mix contract).

    Reference parity: no reference counterpart — sampling-design
    extension next to stratified_sample (driver brief).
    """
    qv = F.floor(
        F.col(value_col).cast("double") * F.lit(1.0e6) + F.lit(0.5)
    ).cast("long")
    dec = "decimal(38,0)"
    per = (
        df.filter(F.col(value_col).isNotNull() & F.col(stratum_col).isNotNull())
        .select(F.col(stratum_col).alias("__h"), qv.alias("__v"))
        .groupBy("__h")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n"),
            F.sum(F.col("__v").cast(dec)).alias("__s"),
            F.sum(F.col("__v").cast(dec) * F.col("__v")).alias("__ss"),
        )
    )
    n = F.col("__n").cast(dec)
    var_num = n * F.col("__ss") - F.col("__s") * F.col("__s")
    var_den = n * (n - 1)
    sd = F.when(
        (F.col("__n") > 1) & (var_num >= 0),
        F.sqrt(var_num.cast("double") / var_den.cast("double"))
        / F.lit(1.0e6),
    )
    per = per.withColumn("__sd", sd).withColumn(
        "__w",
        F.coalesce(
            F.floor(
                F.col("__n").cast("double") * F.col("__sd") * F.lit(1.0e6)
                + F.lit(0.5)
            ).cast("long"),
            F.lit(0),
        ),
    )
    tot = per.agg(F.sum("__w").cast("long").alias("__tw"))
    out = per.crossJoin(F.broadcast(tot))  # 1-row scalar broadcast
    share = F.when(
        F.col("__tw") > 0,
        F.col("__w").cast("double") / F.col("__tw").cast("double"),
    )
    return out.select(
        F.col("__h").alias(stratum_col),
        F.col("__n").alias("n"),
        F.round(F.col("__sd"), 6).alias("sd"),
        F.round(share, 6).alias("share"),
        F.floor(share * F.lit(float(k)) + F.lit(0.5))
        .cast("long")
        .alias("n_alloc"),
    ).orderBy(F.col(stratum_col).asc())
