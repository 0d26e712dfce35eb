"""Pivot-on-write wide store: per-field column pruning at the scan."""

import datetime as dt

from pyspark.sql import functions as F

from cerebro_spark.io import read_wide_store, write_wide_store
from cerebro_spark.schema import POINT_SCHEMA


def _points(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(48):
        rows.append(
            (
                "temperature" if i % 2 == 0 else "humidity",
                {"src": "t"},
                {"value": float(i), "raw": float(i) * 10, "rms": float(i) / 2},
                None,
                None,
                base + dt.timedelta(hours=i),
                "sensors",
            )
        )
    return spark.createDataFrame(rows, POINT_SCHEMA)


def test_wide_store_roundtrip_and_pruning(spark, tmp_path):
    pts = _points(spark)
    written = write_wide_store(pts, str(tmp_path / "wide"))
    assert written == ["humidity", "temperature"]

    one = read_wide_store(
        spark, str(tmp_path / "wide"), "temperature", fields=["value"]
    )
    # values survive the pivot
    got = {r["time"]: r["value"] for r in one.collect()}
    assert len(got) == 24
    assert got[dt.datetime(2024, 1, 1)] == 0.0

    # the whole point of the layout: the parquet scan reads ONLY the
    # requested field column (plus time/date), not raw/rms
    plan = one._jdf.queryExecution().executedPlan().toString()
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs, plan
    assert "value" in rs[0] and "raw" not in rs[0] and "rms" not in rs[0]


def test_wide_store_date_partition_pruning(spark, tmp_path):
    pts = _points(spark)
    write_wide_store(pts, str(tmp_path / "wide"))
    df = read_wide_store(spark, str(tmp_path / "wide"), "humidity").filter(
        F.col("date") == "2024-01-02"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partition filter present → only the matching date directory is scanned
    assert "PartitionFilters: [isnotnull(date" in plan or "date#" in plan.split(
        "PartitionFilters:"
    )[1].split("]")[0]
    rows = df.collect()
    assert rows
    assert all(str(r["date"]) == "2024-01-02" for r in rows)


def test_store_health_flags_small_files(spark, tmp_path):
    from cerebro_spark.io import store_health

    store = str(tmp_path / "health")
    # partition p=a: 6 tiny files (streaming-sink smell); p=b: 1 file
    df_a = spark.range(600).selectExpr("id", "'a' AS p").repartition(6)
    df_b = spark.range(100).coalesce(1).selectExpr("id", "'b' AS p")
    df_a.write.partitionBy("p").parquet(store)
    df_b.write.mode("append").partitionBy("p").parquet(store)

    rows = {r["partition"]: r for r in store_health(spark, store).collect()}
    assert rows["p=a"]["n_files"] == 6 and rows["p=a"]["n_rows"] == 600
    assert bool(rows["p=a"]["small_files"]) is True
    assert rows["p=b"]["n_rows"] == 100
    assert bool(rows["p=b"]["small_files"]) is False
    # total bytes match the on-disk footprint
    import pathlib

    disk = sum(
        f.stat().st_size
        for f in pathlib.Path(store).rglob("*.parquet")
    )
    assert sum(r["bytes"] for r in rows.values()) == disk


def test_expire_partitions_retention(spark, tmp_path):
    """Retention drops only date partitions older than the cutoff, never
    newer ones or non-partition files; dry_run lists without deleting."""
    import datetime as dt

    from cerebro_spark.io import expire_partitions

    store = str(tmp_path / "store")
    rows = []
    for day in (1, 10, 20):
        rows.append(
            ("m", dt.datetime(2024, 1, day, 12), 1.0, "sensors",
             dt.date(2024, 1, day))
        )
    df = spark.createDataFrame(
        rows, "measurement string, time timestamp, v double, bucket string, date date"
    )
    df.write.partitionBy("bucket", "date").parquet(store)

    # cutoff 15 days before Jan 25 → Jan 1 expires, Jan 10/20 survive
    dry = expire_partitions(
        spark, store, older_than_days=15, now=dt.date(2024, 1, 25),
        dry_run=True,
    )
    assert len(dry) == 1 and "date=2024-01-01" in dry[0]
    assert spark.read.parquet(store).count() == 3  # dry run deleted nothing

    gone = expire_partitions(
        spark, store, older_than_days=15, now=dt.date(2024, 1, 25)
    )
    assert gone == dry
    left = spark.read.parquet(store)
    assert left.count() == 2
    assert {str(r["date"]) for r in left.select("date").collect()} == {
        "2024-01-10", "2024-01-20",
    }
    # idempotent: second run removes nothing
    assert expire_partitions(
        spark, store, older_than_days=15, now=dt.date(2024, 1, 25)
    ) == []


def test_profile_drift_flags_moved_stats(spark):
    from pyspark.sql import functions as F

    from cerebro_spark.operators.profile import data_profile, profile_drift

    base = spark.range(1000).select(
        F.col("id"), (F.col("id") % 100).cast("double").alias("v")
    )
    # after: same shape but v shifted 10× and 30% nulls
    shifted = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise((F.col("id") % 100).cast("double") * 10)
        .alias("v"),
    )
    drift = profile_drift(data_profile(base), data_profile(shifted))
    by_stat = {d["stat"]: d for d in drift}
    assert by_stat["v_avg"]["drifted"]           # 10× shift
    assert by_stat["v_nulls"]["drifted"]         # 0% → 33% null rate
    assert not by_stat["id_nulls"]["drifted"]    # rate stays 0 despite 2× rows
