"""Shared operator utilities — top_k_ranked edge semantics (ADVICE r2)."""

import pytest


def test_top_k_ranked_desc_nulls_sort_last(spark):
    from cerebro_spark.operators.util import top_k_ranked

    df = spark.createDataFrame(
        [("a", 5.0), ("b", None), ("c", 9.0), ("d", 1.0)], "k string, v double"
    )
    got = [
        (r["k"], r["rank"])
        for r in top_k_ranked(df, [("v", "desc"), ("k", "asc")], 4).collect()
    ]
    # orderBy(v desc) puts NULLS LAST — the null row must rank last, never 1.
    assert got == [("c", 1), ("a", 2), ("d", 3), ("b", 4)]


def test_top_k_ranked_asc_nulls_first(spark):
    from cerebro_spark.operators.util import top_k_ranked

    df = spark.createDataFrame(
        [("a", 5.0), ("b", None), ("c", 1.0)], "k string, v double"
    )
    got = [
        (r["k"], r["rank"])
        for r in top_k_ranked(df, [("v", "asc"), ("k", "asc")], 3).collect()
    ]
    # orderBy(v asc) is NULLS FIRST in Spark — rank must match.
    assert got == [("b", 1), ("c", 2), ("a", 3)]


def test_top_k_ranked_rejects_non_numeric_desc(spark):
    from cerebro_spark.operators.util import top_k_ranked

    df = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(TypeError, match="non-numeric"):
        top_k_ranked(df, [("k", "desc")], 1)


def test_top_k_ranked_nan_matches_orderby(spark):
    """orderBy(desc) sorts NaN first; the negated array-sort key must
    reproduce that (plain negation leaves NaN last)."""
    from pyspark.sql import Row

    from cerebro_spark.operators.util import top_k_ranked

    df = spark.createDataFrame(
        [Row(k="a", v=5.0), Row(k="b", v=float("nan")), Row(k="c", v=9.0)]
    )
    got = top_k_ranked(df, [("v", "desc"), ("k", "asc")], k=3).collect()
    by_rank = [r["k"] for r in sorted(got, key=lambda r: r["rank"])]
    ref = [r["k"] for r in df.orderBy(df.v.desc(), df.k.asc()).collect()]
    assert by_rank == ref == ["b", "c", "a"]


def test_parse_size_bytes_suffixes():
    """maxPartitionBytes accepts plain bytes, 'b'-suffixed, and human
    k/m/g forms — all must parse (the old rstrip('b') choked on '128m',
    silently triggering a full repartition of arbitrarily large input)."""
    from cerebro_spark.operators.util import _parse_size_bytes

    assert _parse_size_bytes("134217728") == 134217728
    assert _parse_size_bytes("134217728b") == 134217728
    assert _parse_size_bytes("128m") == 128 * 1024**2
    assert _parse_size_bytes("1g") == 1024**3
    assert _parse_size_bytes("2K") == 2048
    with pytest.raises(ValueError):
        _parse_size_bytes("oops")


def test_mad_cusum_reject_reserved_columns(spark):
    """Operators that attach med/mad/mu/sigma outputs refuse inputs that
    already carry those names instead of silently shadowing them."""
    from cerebro_spark.operators.tsdb import cusum, mad_outliers

    df = spark.createDataFrame([(1.0, 2.0)], "v double, med double")
    with pytest.raises(ValueError, match="collide"):
        mad_outliers(df, "v")
    df2 = spark.createDataFrame([(1.0, 2.0)], "v double, sigma double")
    with pytest.raises(ValueError, match="collide"):
        cusum(df2, "v", "v")


# --- window_funnel -------------------------------------------------------


def _funnel(spark, rows, window_seconds=100):
    import datetime as dt

    from pyspark.sql import functions as F

    from cerebro_spark.operators.timeops import window_funnel

    t0 = dt.datetime(2024, 1, 1)
    data = [(u, t0 + dt.timedelta(seconds=s), e) for u, s, e in rows]
    df = spark.createDataFrame(data, "user_id long, ts timestamp, event_type string")
    out = window_funnel(
        df,
        [
            F.col("event_type") == "view",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        keys=["user_id"],
        window_seconds=window_seconds,
    )
    return {r["user_id"]: r["level"] for r in out.collect()}


def test_window_funnel_full_chain_reaches_deepest_level(spark):
    # regression: the level when-chain must test the DEEPEST step
    # outermost — a 3-step completer was once misclassified as level 2
    rows = [(1, 0, "view"), (1, 10, "click"), (1, 20, "purchase")]
    assert _funnel(spark, rows) == {1: 3}


def test_window_funnel_order_and_window_enforced(spark):
    rows = [
        # u2: click BEFORE view -> that click can't count; no later click
        (2, 0, "click"), (2, 5, "view"), (2, 10, "purchase"),
        # u3: purchase outside the window of the FIRST view
        (3, 0, "view"), (3, 10, "click"), (3, 500, "purchase"),
        # u4: steps anchored at FIRST view even if a later view fits
        (4, 0, "view"), (4, 300, "view"), (4, 310, "click"),
        # u5: never viewed -> absent
        (5, 0, "click"), (5, 1, "purchase"),
    ]
    got = _funnel(spark, rows, window_seconds=100)
    assert got == {2: 1, 3: 2, 4: 1}


def test_window_funnel_strictly_after_previous_step(spark):
    # purchase at the SAME second as the click does not advance the funnel
    rows = [(1, 0, "view"), (1, 10, "click"), (1, 10, "purchase")]
    assert _funnel(spark, rows) == {1: 2}


# --- ewma ----------------------------------------------------------------


def test_ewma_matches_hand_fold(spark):
    import datetime as dt

    from cerebro_spark.operators.timeops import ewma

    t0 = dt.datetime(2024, 1, 1)
    # three daily buckets with means 1.0, 2.0, 4.0 (single rows)
    rows = [
        (t0, 1.0),
        (t0 + dt.timedelta(days=1), 2.0),
        (t0 + dt.timedelta(days=2), 4.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = ewma(df, "value", "ts", keys=[], alpha=0.3).collect()[0]
    # fold: s=1.0; s=0.3*2+0.7*1=1.3; s=0.3*4+0.7*1.3=2.11
    assert abs(out["ewma"] - (0.3 * 4.0 + 0.7 * (0.3 * 2.0 + 0.7 * 1.0))) < 1e-15
    assert out["n_buckets"] == 3


def test_ewma_single_bucket_returns_its_mean(spark):
    import datetime as dt

    from cerebro_spark.operators.timeops import ewma

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0, 10.0), (t0 + dt.timedelta(hours=1), 20.0)],
        "ts timestamp, value double",
    )
    out = ewma(df, "value", "ts", keys=[]).collect()[0]
    assert out["ewma"] == 15.0 and out["n_buckets"] == 1
