"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition only when the input has fewer partitions than the cluster
    has cores — the small-file guard for CPU-heavy per-row operators
    (shingling, hashing, regex profiling).

    A large scan (100 TB → thousands of splits) passes through untouched: the
    check keeps the fix from inserting a pointless full-table shuffle where
    the scan already parallelizes.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
