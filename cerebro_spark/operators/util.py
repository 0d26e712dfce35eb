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


def salted_join(
    left: "DataFrame",
    right: "DataFrame",
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> "DataFrame":
    """Skew-resistant equi-join: salt the (skewed) left key into
    ``salt_buckets`` sub-keys and explode the right side across all salt
    values, so one hot key spreads over N reducers instead of one straggler.

    AQE's skew-join split handles most cases automatically; explicit salting
    is for the pathological keys AQE can't split (e.g. a single key larger
    than one executor's memory).  Cost: right side is replicated ×N — use for
    dimension-sized right sides.
    """
    from pyspark.sql import functions as F

    salted_l = left.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salted_r = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    out = salted_l.join(salted_r, [key, "__salt"], how)
    return out.drop("__salt")
