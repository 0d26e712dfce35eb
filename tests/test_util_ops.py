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
