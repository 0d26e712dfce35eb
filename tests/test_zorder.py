"""Z-order clustering: file-stat pruning must become selective on BOTH
clustered columns (vs a linear sort, which only helps its leading key).

Asserted from the parquet footers (min/max per file) — deterministic, no
timing: a scan with a narrow predicate can skip every file whose stat range
misses the predicate, so "files overlapping a slice" IS the I/O cost model."""

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cerebro_spark.io import load_table, write_zordered


def _overlap_fraction(path: str, col: str, lo: float, hi: float) -> float:
    files = sorted(glob.glob(f"{path}/*.parquet"))
    assert files
    hit = 0
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        fmin = min(
            md.row_group(g).column(idx).statistics.min
            for g in range(md.num_row_groups)
        )
        fmax = max(
            md.row_group(g).column(idx).statistics.max
            for g in range(md.num_row_groups)
        )
        if fmax >= lo and fmin <= hi:
            hit += 1
    return hit / len(files)


def test_zorder_prunes_on_both_dims(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    write_zordered(ev, zpath, ["user_id", "value"], target_files=16)
    # linear layout: range-sorted by user_id only (the append-order strawman)
    (
        ev.repartitionByRange(16, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    stats = ev.agg(
        F.min("value"), F.max("value"), F.min("user_id"), F.max("user_id")
    ).first()
    vmin, vmax, umin, umax = stats
    v_slice = (vmin, vmin + (vmax - vmin) * 0.05)
    u_slice = (umin, umin + (umax - umin) * 0.05)

    # value predicate: linear-by-user layout can't skip anything (~100%),
    # z-order skips most files
    z_v = _overlap_fraction(zpath, "value", *v_slice)
    l_v = _overlap_fraction(lpath, "value", *v_slice)
    assert l_v > 0.9
    assert z_v < 0.5
    assert z_v < l_v / 2

    # user predicate: z-order stays selective too (the point of interleaving
    # — no dimension monopolizes the sort)
    z_u = _overlap_fraction(zpath, "user_id", *u_slice)
    assert z_u < 0.5

    # row fidelity: clustering is a rewrite, not a transformation
    assert spark.read.parquet(zpath).count() == ev.count()
    total = (
        spark.read.parquet(zpath).agg(F.sum("event_id")).first()[0]
    )
    assert total == ev.agg(F.sum("event_id")).first()[0]


def test_zorder_scan_plan_prunes_and_pushes(spark, sf_dir, tmp_path):
    """The Spark-side half of the skipping claim (the footer test above is
    the storage-side half): a narrow read over the z-ordered table must
    (a) produce exactly ``target_files`` files — the clustering contract
    the stat ranges depend on, (b) push the slice predicate into the scan
    (PushedFilters — parquet row-group stats can only skip for pushed
    predicates), and (c) prune the read schema to the projection.  Pins
    the executed plan shape so a regression (e.g. a cast blocking
    pushdown after a schema change) fails here, not at the next soak."""
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "user_id", "value"
    )
    zpath = str(tmp_path / "z")
    write_zordered(ev, zpath, ["user_id", "value"], target_files=16)
    assert len(glob.glob(f"{zpath}/*.parquet")) == 16

    vmin, vmax = ev.agg(F.min("value"), F.max("value")).first()
    hi = vmin + (vmax - vmin) * 0.05
    q = (
        spark.read.parquet(zpath)
        .filter((F.col("value") >= vmin) & (F.col("value") <= hi))
        .select("user_id")
    )
    plan = q._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
    pushed = next(
        line for line in plan.splitlines() if "PushedFilters" in line
    )
    assert "GreaterThanOrEqual(value" in pushed
    assert "LessThanOrEqual(value" in pushed
    read_schema = next(
        line for line in plan.splitlines() if "ReadSchema" in line
    )
    assert "user_id" in read_schema and "value" in read_schema
    assert "event_id" not in read_schema  # column pruning held


def test_zorder_bloom_filter_written(spark, sf_dir, tmp_path):
    """bloom_cols materially grows the files (~64 KiB bloom per column per
    row group — the only signal this pyarrow/duckdb can read back) without
    changing the rows."""
    import os

    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    plain, bloomed = str(tmp_path / "p"), str(tmp_path / "b")
    write_zordered(ev, plain, ["user_id", "value"], target_files=2)
    write_zordered(
        ev, bloomed, ["user_id", "value"], target_files=2,
        bloom_cols=["event_id"],
    )
    size = lambda p: sum(  # noqa: E731
        os.path.getsize(f) for f in glob.glob(f"{p}/*.parquet")
    )
    assert size(bloomed) > size(plain) + 50_000  # blooms present
    assert spark.read.parquet(bloomed).count() == ev.count()


def test_zorder_degenerate_columns(spark, tmp_path):
    """Constant and single-distinct columns must not break quantization
    (their boundary list collapses; the z-value degrades gracefully to the
    informative column)."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id"),
        F.lit(7.0).alias("const"),
        (F.col("id") % 50).cast("double").alias("v"),
    )
    out = str(tmp_path / "zc")
    write_zordered(df, out, ["const", "v"], target_files=4)
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert sorted(back.columns) == ["const", "id", "v"]
