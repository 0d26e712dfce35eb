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
