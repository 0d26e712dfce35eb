"""Time-series join operators Spark lacks natively: as-of join and range
(interval-containment) join — composed from built-ins so Catalyst still owns
the physical plan (no Python in the path).

- ``asof_join``: each left row picks the most recent right row with
  ``right.time <= left.time`` (per key, optional tolerance).  Implemented as
  the union-merge trick: union both sides tagged, sort per key by time, carry
  the last right values forward with a running window — O(n log n) per key,
  ONE shuffle, no range-condition join (a naive inequality join degenerates
  to broadcast-nested-loop).
- ``range_join``: match points to intervals containing them.  Implemented by
  bucketing the time axis: intervals explode into the buckets they overlap,
  points equi-join on their bucket, exact containment filters after — turns
  an inequality join into an equi-join + filter, the standard scale pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    _keep_match_time: bool = False,
) -> DataFrame:
    """For each left row: the matching right row per ``by`` keys —
    ``direction`` selects which one (pandas ``merge_asof`` parity):

    - ``"backward"`` (default): latest right at-or-before the left time
      (``<=`` semantics, like DuckDB ``ASOF JOIN ... ON l.t >= r.t``);
    - ``"forward"``: earliest right at-or-after the left time — the
      mirrored union-merge, same one-shuffle plan with a descending sort;
    - ``"nearest"``: whichever of the two is closer in time; exact-tie
      breaks BACKWARD (deterministic).  Costs both passes (two sorts of
      the union — still no inequality join anywhere).

    ``tolerance_seconds`` bounds |right.time − left.time| in every mode.

    Ties at identical timestamps: the right row is visible to a left row
    with the same timestamp in both directions.

    ``__asof_`` is a reserved column-name prefix (nearest-mode
    intermediates); ``_keep_match_time`` is private plumbing for the
    nearest-mode inner passes — user-supplied suffix values never change
    the output shape.
    """
    by = by or []
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if direction == "nearest":
        b = asof_join(
            left, right, time_col, by, right_cols, tolerance_seconds,
            suffix="__asof_b", direction="backward", _keep_match_time=True,
        )
        f = asof_join(
            b, right, time_col, by, right_cols, tolerance_seconds,
            suffix="__asof_f", direction="forward", _keep_match_time=True,
        )
        rc = right_cols or [
            c for c in right.columns if c != time_col and c not in by
        ]
        lt = F.col(time_col).cast("double")
        # the inner passes expose their matched right timestamp as
        # __asof_rt__asof_{b,f} — the deltas that decide the winner
        rt_b, rt_f = "__asof_rt__asof_b", "__asof_rt__asof_f"
        out = f
        db = F.abs(lt - F.col(rt_b).cast("double"))
        df_ = F.abs(F.col(rt_f).cast("double") - lt)
        pick_b = F.col(rt_f).isNull() | (
            F.col(rt_b).isNotNull() & (db <= df_)
        )
        for c in rc:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(pick_b, F.col(f"{c}__asof_b")).otherwise(
                    F.col(f"{c}__asof_f")
                ),
            )
        drop = [f"{c}__asof_b" for c in rc] + [f"{c}__asof_f" for c in rc]
        drop += [rt_b, rt_f]
        return out.drop(*drop)
    right_cols = right_cols or [
        c for c in right.columns if c != time_col and c not in by
    ]
    # All right columns ride in ONE struct so every carried value comes from
    # the SAME (latest) right row — carrying each column independently with
    # last(ignorenulls) would resurrect stale values for columns that are null
    # in the matched row, diverging from DuckDB ASOF JOIN semantics.
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *by,
        time_col,
        F.struct(
            F.col(time_col).alias("__rt"),
            *[F.col(c).alias(c) for c in right_cols],
        ).alias("__rvals"),
    ).withColumn("__side", F.lit(0))
    merged = lt.unionByName(rt, allowMissingColumns=True)

    # per key, ordered by (time, side): side=0 (right) sorts before side=1
    # (left) at equal timestamps, so <=/>= visibility holds in either
    # direction.  The struct is non-null for every right row (even one whose
    # fields are all null), so last(ignorenulls) selects whole rows, never
    # mixes them.  Forward mode is the exact mirror: descending time.
    t_ord = (
        F.col(time_col).desc()
        if direction == "forward"
        else F.col(time_col).asc()
    )
    if by:
        w = (
            Window.partitionBy(*by)
            .orderBy(t_ord, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        carried = merged.withColumn(
            "__c", F.last("__rvals", ignorenulls=True).over(w)
        )
    else:
        # KEYLESS as-of: an unpartitioned running window would serialize
        # every row through one task (the round-1 scale flag).  Two-level
        # bucketed carry instead — the `_global_ffill` pattern: (1) carry
        # within time buckets in parallel; (2) one summary row per bucket
        # (the bucket's last right struct) runs through the only
        # unpartitioned window, sized by CALENDAR (#buckets), not data;
        # (3) each row coalesces its in-bucket carry with the carry-in
        # from strictly-earlier buckets.
        carried = _keyless_carry(merged, time_col, forward=(direction == "forward"))
    out = carried.filter(F.col("__side") == 1).drop("__side", "__rvals")
    matched = F.col("__c")
    if tolerance_seconds is not None:
        delta = (
            F.col("__c").getField("__rt").cast("long")
            - F.col(time_col).cast("long")
            if direction == "forward"
            else F.col(time_col).cast("long")
            - F.col("__c").getField("__rt").cast("long")
        )
        matched = F.when(delta <= tolerance_seconds, F.col("__c"))
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", matched.getField(c))
    if _keep_match_time:  # nearest-mode inner pass: keep match time
        out = out.withColumn(f"__asof_rt{suffix}", matched.getField("__rt"))
    return out.drop("__c")


def _keyless_carry(
    merged: DataFrame,
    time_col: str,
    forward: bool,
    scale_bucket_seconds: int = 86400,
) -> DataFrame:
    """Two-level last-right-struct carry for the keyless as-of merge: adds
    ``__c`` (the matched right struct) without any data-volume-sized
    single-partition window.  ``merged`` carries ``__side`` (0=right,
    1=left) and ``__rvals`` (right row struct, null on left rows)."""
    b = F.floor(F.col(time_col).cast("long") / scale_bucket_seconds)
    m = merged.withColumn("__b", b)
    t_ord = F.col(time_col).desc() if forward else F.col(time_col).asc()
    w_in = (
        Window.partitionBy("__b")
        .orderBy(t_ord, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    m = m.withColumn("__c_local", F.last("__rvals", ignorenulls=True).over(w_in))
    # bucket summaries: each bucket's LAST right struct in scan order —
    # max_by/min_by over right rows only (one row per bucket with rights)
    pick = F.min_by if forward else F.max_by
    right_summaries = (
        m.filter(F.col("__side") == 0)
        .groupBy("__b")
        .agg(
            pick(F.col("__rvals"), F.col(time_col)).alias("__s")
        )
    )
    # EVERY bucket needs a carry row (a bucket with only left rows must
    # still receive the carry from earlier right-bearing buckets)
    summaries = (
        m.select("__b").distinct().join(right_summaries, "__b", "left")
    )
    b_ord = F.col("__b").desc() if forward else F.col("__b").asc()
    w_carry = Window.orderBy(b_ord).rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry_in = summaries.select(
        "__b", F.last("__s", ignorenulls=True).over(w_carry).alias("__cin")
    )
    # carry_in is #buckets rows (calendar-sized) → broadcast join back
    return (
        m.join(F.broadcast(carry_in), "__b", "left")
        .withColumn("__c", F.coalesce(F.col("__c_local"), F.col("__cin")))
        .drop("__b", "__c_local", "__cin")
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    time_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join points to the intervals containing them
    (``start <= t <= end``), optionally also matching ``by`` keys.

    Intervals explode into every ``bucket_seconds`` bucket they overlap;
    points compute their single bucket; the join is an equi-join on
    (by…, bucket) with the exact containment predicate applied after — no
    inequality join, so no nested-loop fallback.  Long intervals cost
    length/bucket_seconds replicas: pick the bucket width near the typical
    interval length.
    """
    by = by or []
    b0 = F.floor(F.col(start_col).cast("long") / bucket_seconds)
    b1 = F.floor(F.col(end_col).cast("long") / bucket_seconds)
    iv = intervals.select(
        "*", F.explode(F.sequence(b0, b1)).alias("__bkt")
    )
    pt = points.withColumn(
        "__bkt", F.floor(F.col(time_col).cast("long") / bucket_seconds)
    )
    cond = (
        (F.col(time_col) >= F.col(start_col))
        & (F.col(time_col) <= F.col(end_col))
    )
    return pt.join(iv, on=by + ["__bkt"], how="inner").filter(cond).drop("__bkt")


def fuzzy_join_blocked(
    left: DataFrame,
    right: DataFrame,
    text_col: str,
    block_cols: list[str],
    max_distance: int = 4,
    left_id: str = "left_id",
    right_id: str = "right_id",
    dedup_pairs: bool = False,
) -> DataFrame:
    """Blocked fuzzy (edit-distance) join — record linkage at scale.

    A naive fuzzy join is an O(n·m) cross product with a per-pair dynamic
    program, which no engine survives at 100 TB.  This is the standard
    blocking formulation: pairs are only compared when they agree on the
    ``block_cols`` equi-key (cheap, deterministic attributes: a brand, a
    normalized prefix, a length band), so the plan is a shuffle equi-join on
    the block key followed by a JVM-side ``levenshtein`` filter inside
    whole-stage codegen — no Python, no nested-loop join.

    Cost model: with B blocks of size n_b the candidate mass is Σ n_b² — the
    caller picks block keys so max(n_b) is bounded (same contract as the
    LSH band join in dedup.py; see lsh_bucket_stats for the diagnostic
    pattern).  Skewed blocks are visible in the plan as straggler tasks and
    can be salted exactly like any skewed equi-join.

    Each side must carry a unique id column (``left_id`` / ``right_id``
    name the OUTPUT columns).  ``dedup_pairs=True`` applies the
    (id_l < id_r) filter — pass it ONLY for self-joins (both sides the
    same logical table under one id space), where it halves the candidate
    mass and drops self-pairs.  It must stay False for genuine two-table
    linkage: with disjoint id ranges the filter would silently discard
    every pair whose left id sorts after its right id.

    Returns (left_id, right_id, block…, distance) with 0 <= distance <=
    ``max_distance``.  Edit distance ≤ d implies length difference ≤ d, so a
    pre-filter on |len(a) − len(b)| ≤ d skips the DP for hopeless pairs.
    """
    lcols = [F.col(c).alias(f"__bl_{c}") for c in block_cols]
    rcols = [F.col(c).alias(f"__br_{c}") for c in block_cols]
    a = left.select(
        F.col(left_id), F.col(text_col).alias("__ta"), *lcols
    )
    b = right.select(
        F.col(right_id), F.col(text_col).alias("__tb"), *rcols
    )
    cond = None
    for c in block_cols:
        eq = F.col(f"__bl_{c}") == F.col(f"__br_{c}")
        cond = eq if cond is None else cond & eq
    j = a.join(b, cond, "inner")
    if dedup_pairs:
        j = j.filter(F.col(left_id) < F.col(right_id))
    j = j.filter(
        F.abs(F.length("__ta") - F.length("__tb")) <= max_distance
    ).withColumn("distance", F.levenshtein("__ta", "__tb"))
    out = j.filter(F.col("distance") <= max_distance).select(
        F.col(left_id),
        F.col(right_id),
        *[F.col(f"__bl_{c}").alias(c) for c in block_cols],
        "distance",
    )
    return out


def fuzzy_block_stats(
    df: DataFrame,
    block_cols: list[str],
) -> DataFrame:
    """Block-size histogram for ``fuzzy_join_blocked``: ``(block_size,
    n_blocks, candidate_pairs)`` — the skew diagnostic to run BEFORE the
    fuzzy join at scale, the same pattern as ``lsh_bucket_stats`` /
    ``simhash_bucket_stats``.  The join's levenshtein cost is
    Σ size·(size−1)/2 over blocks (self-join form); one hot block (a
    dominant brand, an empty-string prefix) dominates everything, and this
    histogram is how you find it and widen the block key before paying for
    the join."""
    sizes = df.groupBy(*block_cols).agg(F.count(F.lit(1)).alias("block_size"))
    return (
        sizes.groupBy("block_size")
        .agg(F.count(F.lit(1)).alias("n_blocks"))
        .select(
            "block_size",
            "n_blocks",
            (
                F.col("n_blocks")
                * (F.col("block_size") * (F.col("block_size") - 1) / 2)
            ).cast("long").alias("candidate_pairs"),
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    by: list[str] | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval×interval overlap join (closed intervals:
    ``l_start <= r_end AND r_start <= l_end``), optionally also matching
    ``by`` keys — the two-big-sides companion of :func:`range_join`
    (point-in-interval).

    Both sides explode into every ``bucket_seconds`` bucket they span and
    equi-join on (by…, bucket) — no inequality join, so no nested-loop
    fallback at any scale.  A pair overlapping several shared buckets must
    be emitted ONCE: the match is kept only in the bucket containing
    ``max(l_start, r_start)`` (the overlap's first instant), which both
    rows provably explode to — exactly-once without a distinct.

    Cost: each row is replicated span/bucket_seconds times and each bucket
    pairs its residents — pick the bucket near the TYPICAL interval length
    so replication stays O(1) and per-bucket membership stays small; very
    long intervals are the skew to watch (cap or split them upstream).
    Start/end columns are integer epochs (any engine-agnostic integer
    domain works); column names must be disjoint across the two frames.
    """
    by = by or []
    b = float(bucket_seconds)

    def burst(s: str, e: str) -> "F.Column":
        return F.explode(
            F.sequence(
                F.floor(F.col(s) / b).cast("long"),
                F.floor(F.col(e) / b).cast("long"),
            )
        )

    lhs = left.select("*", burst(l_start, l_end).alias("__bkt"))
    rhs = right.select("*", burst(r_start, r_end).alias("__bkt"))
    overlap = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    first_bucket = F.col("__bkt") == F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / b
    ).cast("long")
    return (
        lhs.join(rhs, on=by + ["__bkt"], how="inner")
        .filter(overlap & first_bucket)
        .drop("__bkt")
    )


def interval_bucket_stats(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    by: list[str] | None = None,
    bucket_seconds: int = 3600,
    top: int = 20,
) -> DataFrame:
    """Pre-join skew diagnostic for :func:`interval_overlap_join` — the
    same contract as ``lsh_bucket_stats``/``fuzzy_block_stats``: run it
    BEFORE the join to see where the candidate mass lands and pick
    ``bucket_seconds`` from data instead of folklore.  Output: the ``top``
    buckets by pair mass ``(by…, bucket, n_left, n_right, pair_mass)`` —
    pair_mass = n_left·n_right is exactly the rows that bucket's equi-join
    will materialize before the overlap filter.

    One exploded projection per side, one combinable groupBy each, a
    TakeOrdered over the bucket counts — strictly cheaper than the join it
    sizes.
    """
    by = by or []
    b = float(bucket_seconds)

    def side(df: DataFrame, s: str, e: str, out: str) -> DataFrame:
        return (
            df.select(
                *by,
                F.explode(
                    F.sequence(
                        F.floor(F.col(s) / b).cast("long"),
                        F.floor(F.col(e) / b).cast("long"),
                    )
                ).alias("bucket"),
            )
            .groupBy(*by, "bucket")
            .agg(F.count(F.lit(1)).alias(out))
        )

    lhs = side(left, l_start, l_end, "n_left")
    rhs = side(right, r_start, r_end, "n_right")
    stats = lhs.join(rhs, on=by + ["bucket"], how="inner").select(
        *by, "bucket", "n_left", "n_right",
        (F.col("n_left") * F.col("n_right")).alias("pair_mass"),
    )
    return stats.orderBy(
        F.col("pair_mass").desc(), F.col("bucket").asc()
    ).limit(top)


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning (the distributed runtime filter)
# ---------------------------------------------------------------------------

#: bits used per 64-bit word.  62, not 64: the DuckDB oracle's BIGINT
#: left-shift refuses 1<<62..63 (signed-overflow checked), and portability
#: of the EXACT word values across engines is what makes the filter
#: oracle-checkable.  3% capacity loss, zero semantic difference.
BLOOM_BITS_PER_WORD = 62


#: md5 hex is 32 chars = four disjoint 8-char (32-bit) slices.  num_hashes
#: beyond that would slice past the digest: conv('') yields NULL positions,
#: the probe's AND chain goes NULL, and filter(bloom_pass) would silently
#: DROP matching rows — a false NEGATIVE, violating the filter's core
#: guarantee.  Reject loudly instead.
_BLOOM_MAX_HASHES = 4


def _check_num_hashes(num_hashes: int) -> None:
    if not 1 <= num_hashes <= _BLOOM_MAX_HASHES:
        raise ValueError(
            f"num_hashes must be in 1..{_BLOOM_MAX_HASHES} (each hash is a "
            f"disjoint 8-hex-char slice of the 32-char md5 digest; "
            f"got {num_hashes})"
        )


def _bloom_pos(key_col, i: int, num_words: int):
    """i-th bit position for a key: 32-bit slice of md5 hex, mod capacity.

    md5 (not xxhash/crc) because both engines expose byte-identical md5 of
    the decimal string rendering of the key — the repo-wide portable-hash
    idiom (minhash/weighted_sample/conformal all pin to it).  Slices are
    8 hex chars (32 bits): the position space must COVER the filter, and
    32 bits addresses up to 4.3G bits ≈ 0.5 GB of filter — a 16-bit slice
    silently caps the filter at 65,536 bits and the false-positive rate
    explodes past ~10⁴ keys (caught by tools/soak_session5.py)."""
    return (
        F.conv(F.substring(F.md5(key_col.cast("string")), 1 + 8 * i, 8), 16, 10)
        .cast("long") % (num_words * BLOOM_BITS_PER_WORD)
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_words: int = 1024,
    num_hashes: int = 3,
) -> DataFrame:
    """Build a Bloom filter over ``df[key_col]`` as ``(word, bits)`` rows —
    the distributed runtime filter that prunes a big probe scan down to
    rows whose join key MIGHT match, before the shuffle.

    The 100 TB join-pruning story: a selective dimension/build side (say
    10⁶ surviving keys after filters) against a 100 TB probe fact.  A real
    semi-join shuffles the probe; a Bloom filter is ~``num_words``·8 bytes
    (default 8 KB) — build it with ONE combinable aggregation (explode k
    bit positions per key, ``bit_or`` per word: partial aggregation makes
    every executor contribute one ≤num_words-row fragment), broadcast it,
    and the probe prunes in a pure projection with NO shuffle and no join.
    False-positive rate ≈ (1 − e^(−k·n/m))^k with m = num_words·62 bits:
    8 KB holds 10⁴ keys at ~0.1%; size num_words ≈ 2.3·n/62 for ~1%.
    False negatives are IMPOSSIBLE by construction — the semi-join answer
    is never lost, pruning is only ever conservative.

    Spark's own runtime row-group filters do this transparently for plain
    equi-joins; this operator makes the structure a first-class value you
    can persist, ship across jobs/days, OR into an incremental filter, or
    probe in a STREAM (the broadcast-side analog of the persisted LSH
    index in dedup.py) — none of which the planner-internal filter offers.

    Engine-portable: bit positions are 32-bit md5 hex slices of the key's
    string rendering mod capacity, 62 bits per word (see
    BLOOM_BITS_PER_WORD) — the DuckDB oracle reproduces the words exactly.

    Returns ≤``num_words`` rows ``(word BIGINT, bits BIGINT)``; absent
    words are all-zero.  NULL keys are ignored (SQL semantics: NULL never
    equi-joins).
    """
    _check_num_hashes(num_hashes)
    key = F.col(key_col)
    keys = df.select(key.alias("__k")).filter(key.isNotNull()).distinct()
    pos = keys.select(
        F.explode(
            F.array(*[
                _bloom_pos(F.col("__k"), i, num_words)
                for i in range(num_hashes)
            ])
        ).alias("__p")
    )
    return (
        pos.select(
            (F.col("__p") / BLOOM_BITS_PER_WORD).cast("long").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(__p % {BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("__m"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(__m)").alias("bits"))
    )


def bloom_words_literal(bloom: DataFrame, num_words: int = 1024) -> list:
    """Collect a built filter into a dense ``num_words``-long Python list
    (index = word, value = bits) for the literal-array probe path.

    Driver-side but BOUNDED metadata: ≤num_words rows (8 KB at the
    default), the same contract as the k-means centroid / IVF coarse-
    centroid collects — never data-sized.
    """
    dense = [0] * num_words
    for r in bloom.collect():
        dense[int(r["word"])] = int(r["bits"])
    return dense


def bloom_probe(
    df: DataFrame,
    key_col: str,
    words: list,
    num_hashes: int = 3,
    keep_col: str = "bloom_pass",
) -> DataFrame:
    """Annotate ``df`` with ``keep_col``: True iff ``key_col`` MIGHT be in
    the filter (all k bits set), False = definitely absent.

    Pure projection against the literal word array — whole-stage codegen,
    zero shuffle, zero join: the probe side of the runtime-filter
    pattern.  Filter with ``.filter(F.col('bloom_pass'))`` before the real
    join; the join itself then discards the surviving false positives, so
    end-to-end results are exact.

    SIZE BOUND: the word array is inlined into the plan, so this variant
    is for SMALL filters (≤ ~4096 words / 32 KB — beyond that the
    generated code balloons and codegen falls back to interpreted mode;
    tools/soak_session5.py measured the cliff).  For big filters use
    :func:`bloom_probe_join`, which broadcast-hash-joins the word table
    instead — still shuffle-free on the probe side.

    NULL keys probe False (they cannot equi-join anyway).
    """
    _check_num_hashes(num_hashes)
    num_words = len(words)
    arr = F.lit(words)
    key = F.col(key_col)
    # materialize the k positions ONCE as columns (md5 is the probe's
    # dominant per-row cost — don't evaluate it twice per hash)
    pos_cols = {
        f"__bloom_p{i}": _bloom_pos(key, i, num_words)
        for i in range(num_hashes)
    }
    out = df.withColumns(pos_cols)
    checks = []
    for i in range(num_hashes):
        p = F.col(f"__bloom_p{i}")
        word_val = F.element_at(arr, (p / BLOOM_BITS_PER_WORD).cast("int") + 1)
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(__bloom_p{i} % {BLOOM_BITS_PER_WORD} AS INT))"
        )
        checks.append(word_val.bitwiseAND(mask) != 0)
    passed = checks[0]
    for c in checks[1:]:
        passed = passed & c
    return out.withColumn(
        keep_col, F.when(key.isNotNull(), passed).otherwise(F.lit(False))
    ).drop(*pos_cols)


def bloom_probe_join(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_words: int,
    num_hashes: int = 3,
    keep_col: str = "bloom_pass",
) -> DataFrame:
    """Big-filter probe: annotate ``df`` with ``keep_col`` by broadcast-
    hash-joining the ``(word, bits)`` table once per hash function.

    Same semantics as :func:`bloom_probe` but the filter stays a
    DataFrame: k broadcast joins on the word index — map-side lookups
    against the broadcast hash table, NO shuffle of the probe — so filter
    size is bounded by the broadcast limit (a 1M-word / 8 MB filter
    holding ~25M keys at 1% fp is routine), not by plan size.  Missing
    word rows read as all-zero via coalesce.
    """
    _check_num_hashes(num_hashes)
    key = F.col(key_col)
    out = df.withColumns({
        f"__bloom_p{i}": _bloom_pos(key, i, num_words)
        for i in range(num_hashes)
    })
    checks = []
    for i in range(num_hashes):
        w = F.broadcast(
            bloom.select(
                F.col("word").alias(f"__bw{i}"),
                F.col("bits").alias(f"__bb{i}"),
            )
        )
        out = out.join(
            w,
            (F.col(f"__bloom_p{i}") / BLOOM_BITS_PER_WORD).cast("long")
            == F.col(f"__bw{i}"),
            "left",
        )
        mask = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(__bloom_p{i} % {BLOOM_BITS_PER_WORD} AS INT))"
        )
        checks.append(
            F.coalesce(F.col(f"__bb{i}"), F.lit(0)).bitwiseAND(mask) != 0
        )
    passed = checks[0]
    for c in checks[1:]:
        passed = passed & c
    drop = [f"__bloom_p{i}" for i in range(num_hashes)]
    drop += [f"__bw{i}" for i in range(num_hashes)]
    drop += [f"__bb{i}" for i in range(num_hashes)]
    return out.withColumn(
        keep_col, F.when(key.isNotNull(), passed).otherwise(F.lit(False))
    ).drop(*drop)


def spatial_grid_join(
    left: DataFrame,
    right: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    radius: float = 1.0,
    max_cell_size: "int | None" = None,
) -> DataFrame:
    """Spatial radius join: every (left, right) pair within Euclidean
    distance ≤ ``radius`` — the grid-bucketed distributed spatial join
    (the standard cell + 3×3-neighborhood decomposition every geo engine
    uses at scale).  Column name collisions are the caller's problem —
    alias before joining; appends ``dist``.

    How: both sides key by their ``radius``-sized grid cell
    ``(⌊x/r⌋, ⌊y/r⌋)``; the RIGHT side is exploded to its cell's 3×3
    neighborhood, so any pair within r shares exactly ONE (left-cell =
    exploded-right-cell) key — an equi-join, no cross product, and no
    post-dedup because the left point lives in exactly one cell.  The
    exact distance predicate then discards corner false candidates.

    Exactness: cell ids are floor divisions and the predicate
    ``(Δx)²+(Δy)² ≤ r²`` is pure IEEE arithmetic — identical in any
    engine; ``dist`` is one correctly-rounded sqrt, 6 dp.

    Scale shape: one 9× projection-side explode of the right side, one
    equi-join shuffle on cell keys.  Candidate mass is Σ_cells
    |L_c|·|R_c3×3| — a dense hot cell is the skew risk, so
    ``max_cell_size`` (counted on the LEFT side's own cells, pre-join)
    drops cells above the cap, same contract as the LSH/fuzzy-join
    frequency caps.  Pick ``radius`` so typical cells hold O(1–100)
    points; the operator does not repartition beyond the join shuffle.

    Reference parity: no reference counterpart — geospatial extension
    (driver brief: joins a large-scale pipeline needs).
    """
    r = float(radius)
    lx, ly = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    l = left.withColumn("__cx", F.floor(lx / r).cast("long")).withColumn(
        "__cy", F.floor(ly / r).cast("long")
    )
    if max_cell_size is not None:
        heavy = (
            l.groupBy("__cx", "__cy")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_cell_size)
            .select("__cx", "__cy")
        )
        l = l.join(F.broadcast(heavy), ["__cx", "__cy"], "left_anti")
    rx, ry = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    rr = (
        right.withColumn("__rcx", F.floor(rx / r).cast("long"))
        .withColumn("__rcy", F.floor(ry / r).cast("long"))
        .withColumn("__dx", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("__dy", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("__cx", F.col("__rcx") + F.col("__dx"))
        .withColumn("__cy", F.col("__rcy") + F.col("__dy"))
        .drop("__rcx", "__rcy", "__dx", "__dy")
    )
    lq = l.alias("l")
    rq = rr.alias("r")
    dx = F.col(f"l.{x_col}").cast("double") - F.col(f"r.{x_col}").cast("double")
    dy = F.col(f"l.{y_col}").cast("double") - F.col(f"r.{y_col}").cast("double")
    d2 = dx * dx + dy * dy
    out = (
        lq.join(
            rq,
            (F.col("l.__cx") == F.col("r.__cx"))
            & (F.col("l.__cy") == F.col("r.__cy")),
            "inner",
        )
        .filter(d2 <= F.lit(r * r))
        .withColumn("dist", F.round(F.sqrt(d2), 6))
    )
    return out.drop("__cx", "__cy")


#: IAU nominal mean Earth radius, km — the constant every geo engine uses.
EARTH_RADIUS_KM = 6371.0088


def haversine_grid_join(
    left: DataFrame,
    right: DataFrame,
    lat_col: str = "lat",
    lon_col: str = "lon",
    radius_km: float = 100.0,
    max_abs_lat: float = 66.0,
    max_cell_size: "int | None" = None,
) -> DataFrame:
    """Great-circle radius join: every (left, right) pair within haversine
    distance ≤ ``radius_km`` — the lat/lon sibling of
    :func:`spatial_grid_join` for real geographic coordinates, where a
    flat Euclidean grid is wrong (longitude degrees shrink by cos(lat)
    and the grid must wrap at the antimeridian).

    How: both sides key by a (lat-band, lon-band) cell; the RIGHT side
    explodes to its 3×3 neighborhood with the lon neighbor taken MODULO
    the band count, so pairs straddling ±180° still share a key.  Cell
    sizes are chosen so the 3×3 coverage is PROVABLY sufficient inside
    ``|lat| ≤ max_abs_lat``: Δlat of any pair within r is ≤ r/R rad
    (central angle ≥ |Δφ|), and from the haversine identity
    sin(Δλ/2) ≤ sin(r/2R)/cos(φmax), so the lat band is r/R rad and the
    lon band is 2·asin(sin(r/2R)/cos(max_abs_lat)) — rounded DOWN to an
    integer number of equal bands so modular wraparound stays exact.
    Rows beyond ``max_abs_lat`` are EXCLUDED (documented contract: polar
    caps need a second pass with a higher bound or a polar sweep — at
    66° the default covers every inhabited latitude).  The exact
    haversine predicate then discards corner candidates, so results are
    exact within the band; ``dist_km`` is the haversine distance (one
    fixed IEEE chain: sin/cos/asin on doubles), rounded to 3 dp (meter
    precision — coarse enough that engine ulp noise cannot move it).

    Scale shape: identical to spatial_grid_join — one ≤9× explode of the
    right side, ONE equi-join shuffle on cell keys, no cross product;
    ``max_cell_size`` caps hot cells (megacities), counted on the LEFT
    side's own cells pre-join, with the same drop-the-cell contract as
    the LSH/fuzzy caps.  A hot RIGHT-side cell is NOT capped: it still
    explodes ≤9× and joins linearly against the (bounded) left cells —
    the quadratic case needs BOTH sides hot in one cell, and there the
    left cell drops.  Put the skew-prone side on the left.

    Reference parity: no reference counterpart — geospatial extension
    next to spatial_grid_join (driver brief).
    """
    import math

    r = float(radius_km)
    if not r > 0:
        raise ValueError(f"radius_km must be positive; got {radius_km}")
    if not 0 < max_abs_lat < 90:
        raise ValueError(f"max_abs_lat must be in (0, 90); got {max_abs_lat}")
    lat_band_deg = math.degrees(r / EARTH_RADIUS_KM)
    s = math.sin(r / (2 * EARTH_RADIUS_KM)) / math.cos(math.radians(max_abs_lat))
    if s >= 1.0:
        n_lon = 1
    else:
        n_lon = max(1, int(360.0 // math.degrees(2 * math.asin(s))))
    if n_lon <= 2:  # ±1 neighbors would alias onto the same band twice
        n_lon = 1
    lon_band_deg = 360.0 / n_lon

    def with_cells(df: DataFrame) -> DataFrame:
        lat = F.col(lat_col).cast("double")
        lon = F.col(lon_col).cast("double")
        return (
            df.filter((lat >= -max_abs_lat) & (lat <= max_abs_lat))
            .withColumn(
                "__la", F.floor(lat / F.lit(lat_band_deg)).cast("long")
            )
            .withColumn(
                "__lo",
                F.least(
                    F.floor(
                        F.pmod(lon, F.lit(360.0)) / F.lit(lon_band_deg)
                    ).cast("long"),
                    F.lit(n_lon - 1),
                ),
            )
        )

    l = with_cells(left)
    if max_cell_size is not None:
        heavy = (
            l.groupBy("__la", "__lo")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > max_cell_size)
            .select("__la", "__lo")
        )
        l = l.join(F.broadcast(heavy), ["__la", "__lo"], "left_anti")
    rr = (
        with_cells(right)
        .withColumnRenamed("__la", "__rla")
        .withColumnRenamed("__lo", "__rlo")
        .withColumn("__da", F.explode(F.sequence(F.lit(-1), F.lit(1))))
        .withColumn("__la", F.col("__rla") + F.col("__da"))
    )
    if n_lon == 1:
        rr = rr.withColumn("__lo", F.col("__rlo"))
    else:
        rr = rr.withColumn(
            "__dl", F.explode(F.sequence(F.lit(-1), F.lit(1)))
        ).withColumn(
            "__lo", F.pmod(F.col("__rlo") + F.col("__dl"), F.lit(n_lon))
        )
    rr = rr.drop("__rla", "__rlo", "__da", "__dl")
    lq, rq = l.alias("l"), rr.alias("r")
    lat1 = F.radians(F.col(f"l.{lat_col}").cast("double"))
    lat2 = F.radians(F.col(f"r.{lat_col}").cast("double"))
    sp = F.sin(
        F.radians(
            F.col(f"r.{lat_col}").cast("double")
            - F.col(f"l.{lat_col}").cast("double")
        )
        / F.lit(2.0)
    )
    sl = F.sin(
        F.radians(
            F.col(f"r.{lon_col}").cast("double")
            - F.col(f"l.{lon_col}").cast("double")
        )
        / F.lit(2.0)
    )
    h = sp * sp + F.cos(lat1) * F.cos(lat2) * (sl * sl)
    dkm = F.lit(2 * EARTH_RADIUS_KM) * F.asin(
        F.least(F.lit(1.0), F.sqrt(h))
    )
    out = (
        lq.join(
            rq,
            (F.col("l.__la") == F.col("r.__la"))
            & (F.col("l.__lo") == F.col("r.__lo")),
            "inner",
        )
        .filter(dkm <= F.lit(r))
        .withColumn("dist_km", F.round(dkm, 3))
    )
    return out.drop("__la", "__lo")
