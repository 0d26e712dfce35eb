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
