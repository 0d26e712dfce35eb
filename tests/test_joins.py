"""As-of / range join unit tests (tie semantics, tolerance, bucket edges)."""

import pytest
import datetime as dt

from cerebro_spark.operators.joins import asof_join, range_join


def _t(m):
    return dt.datetime(2024, 1, 1, 0, m, 0)


def test_asof_tie_and_ordering(spark):
    left = spark.createDataFrame(
        [(1, _t(10)), (2, _t(20)), (3, _t(5))], ["id", "ts"]
    )
    right = spark.createDataFrame(
        [(_t(10), 100.0), (_t(15), 150.0)], ["ts", "price"]
    )
    out = {r["id"]: r["price_right"] for r in asof_join(left, right, "ts").collect()}
    assert out[1] == 100.0   # equal timestamp is visible (<= semantics)
    assert out[2] == 150.0   # latest at-or-before
    assert out[3] is None    # nothing before


def test_asof_tolerance_and_keys(spark):
    left = spark.createDataFrame(
        [(1, "a", _t(30)), (2, "b", _t(30))], ["id", "k", "ts"]
    )
    right = spark.createDataFrame(
        [("a", _t(29), 1.0), ("b", _t(0), 2.0)], ["k", "ts", "v"]
    )
    out = {
        r["id"]: r["v_right"]
        for r in asof_join(
            left, right, "ts", by=["k"], tolerance_seconds=600
        ).collect()
    }
    assert out[1] == 1.0     # 1 min old: within tolerance
    assert out[2] is None    # 30 min old: expired


def test_asof_matched_row_nulls_not_resurrected(spark):
    """A null inside the MATCHED right row must come through as null — not be
    replaced by a stale value from an older right row — and all carried
    columns must come from the same right row (DuckDB ASOF JOIN semantics)."""
    left = spark.createDataFrame([(1, _t(20))], ["id", "ts"])
    right = spark.createDataFrame(
        [(_t(5), 100.0, "old"), (_t(15), None, None)],
        "ts timestamp, price double, tag string",
    )
    row = asof_join(left, right, "ts").collect()[0]
    assert row["price_right"] is None   # matched row's null, not stale 100.0
    assert row["tag_right"] is None


def test_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, _t(0)), (2, _t(30)), (3, _t(31)), (4, _t(59))], ["id", "ts"]
    )
    iv = spark.createDataFrame(
        [(10, _t(0), _t(30)), (11, _t(45), _t(59))], ["iid", "start", "end"]
    )
    # bucket width much smaller than intervals → multi-bucket explode path
    out = {
        (r["id"], r["iid"])
        for r in range_join(pts, iv, "ts", bucket_seconds=60).collect()
    }
    assert out == {(1, 10), (2, 10), (4, 11)}  # inclusive bounds, 3 matches


def test_asof_directions_matrix(spark):
    """backward / forward / nearest against a hand-checked fixture,
    including the exact-tie-breaks-backward rule and forward tolerance."""
    import datetime as dt

    from cerebro_spark.operators.joins import asof_join

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "a", T(10)), (2, "a", T(20)), (3, "a", T(30))],
        ["lid", "k", "ts"],
    )
    right = spark.createDataFrame(
        [("a", T(8), 1.0), ("a", T(19), 2.0), ("a", T(21), 3.0), ("a", T(35), 4.0)],
        ["k", "ts", "v"],
    )

    def got(**kw):
        rows = asof_join(left, right, "ts", by=["k"], **kw).collect()
        return {r["lid"]: r["v_right"] for r in rows}

    assert got(direction="backward") == {1: 1.0, 2: 2.0, 3: 3.0}
    assert got(direction="forward") == {1: 2.0, 2: 3.0, 3: 4.0}
    # lid=2 is 1 s from both 19 and 21 — tie breaks backward (2.0)
    assert got(direction="nearest") == {1: 1.0, 2: 2.0, 3: 4.0}
    assert got(direction="forward", tolerance_seconds=3) == {
        1: None, 2: 3.0, 3: None,
    }
    import pytest

    with pytest.raises(ValueError):
        got(direction="sideways")


def test_asof_user_suffix_not_sentinel(spark):
    """User-supplied suffix values '__b'/'__f' are plain suffixes, not the
    nearest-mode internal sentinel: no __rt*/__asof_* columns leak, and a
    pre-existing left column named like the OLD intermediates (<col>__b)
    survives nearest mode untouched."""
    import datetime as dt

    from cerebro_spark.operators.joins import asof_join

    T = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, "a", T(10), 99.0)], ["lid", "k", "ts", "v__b"]
    )
    right = spark.createDataFrame([("a", T(8), 1.0)], ["k", "ts", "v"])

    # suffix "__b" used as a plain user suffix on a backward join: output is
    # v__b... which collides with the left column by the user's own choice —
    # use a distinct suffix here and assert nothing internal leaks
    out = asof_join(left, right, "ts", by=["k"], suffix="__f")
    assert sorted(out.columns) == ["k", "lid", "ts", "v__b", "v__f"]
    row = out.collect()[0]
    assert row["v__b"] == 99.0 and row["v__f"] == 1.0

    # nearest mode: the old implementation built intermediates named v__b
    # (clobbering the user's column) and leaked __rt__b/__rt__f
    near = asof_join(left, right, "ts", by=["k"], direction="nearest")
    assert sorted(near.columns) == ["k", "lid", "ts", "v__b", "v_right"]
    nrow = near.collect()[0]
    assert nrow["v__b"] == 99.0 and nrow["v_right"] == 1.0


@pytest.mark.slow
def test_asof_keyless_two_level_matches_keyed(spark):
    """Keyless as-of (by=[]) must produce the same matches as running the
    keyed path with a constant key (the semantics oracle), in all three
    directions with and without tolerance — while never planning a
    data-sized single-partition window (plan assertion below)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from cerebro_spark.operators.joins import asof_join

    # spread across 4 day-buckets, including: a bucket with no right rows
    # (day 2 — carry must cross it), duplicate left timestamps, and a
    # right row after the last left row (forward-mode carry-in)
    D = lambda d, h: dt.datetime(2024, 1, 1 + d, h)  # noqa: E731
    left = spark.createDataFrame(
        [(i, D(d, h)) for i, (d, h) in enumerate(
            [(0, 1), (0, 5), (1, 3), (2, 2), (2, 2), (3, 7), (3, 23)]
        )],
        ["lid", "ts"],
    )
    right = spark.createDataFrame(
        [(D(0, 0), 1.0), (D(0, 4), 2.0), (D(1, 9), 3.0), (D(3, 9), 4.0)],
        ["ts", "v"],
    )
    with_k = (
        left.withColumn("k", F.lit(1)),
        right.withColumn("k", F.lit(1)),
    )

    for kw in (
        {"direction": "backward"},
        {"direction": "forward"},
        {"direction": "nearest"},
        {"direction": "backward", "tolerance_seconds": 7200},
        {"direction": "forward", "tolerance_seconds": 7200},
    ):
        keyless = asof_join(left, right, "ts", by=[], **kw)
        keyed = asof_join(with_k[0], with_k[1], "ts", by=["k"], **kw)
        got = {r["lid"]: r["v_right"] for r in keyless.collect()}
        want = {r["lid"]: r["v_right"] for r in keyed.collect()}
        assert got == want, f"{kw}: {got} != {want}"

    # plan shape: no unpartitioned data-sized window — every WindowExec
    # over the merged rows must partition by the bucket column
    plan = keyless._jdf.queryExecution().executedPlan().toString()
    # the merged-row window partitions by __b; the only unkeyed Window
    # runs over the per-bucket summaries (calendar-sized by construction)
    assert "__b" in plan


def test_interval_overlap_join_exactly_once(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.joins import interval_overlap_join

    # intervals engineered around bucket edges (bucket=100): long spans,
    # shared multi-bucket overlaps, touching endpoints, disjoint pairs
    left = spark.createDataFrame([
        Row(lid=1, ls=0, le=350),      # spans buckets 0..3
        Row(lid=2, ls=120, le=130),    # inside bucket 1
        Row(lid=3, ls=500, le=500),    # zero-length
    ])
    right = spark.createDataFrame([
        Row(rid=10, rs=90, re_=210),   # overlaps lid1 (buckets 0..2), lid2
        Row(rid=11, rs=350, re_=600),  # touches lid1 at 350; covers lid3
        Row(rid=12, rs=700, re_=800),  # disjoint
    ])
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re_", bucket_seconds=100
    ).select("lid", "rid").collect()
    pairs = {(r["lid"], r["rid"]) for r in got}
    # brute-force reference
    want = set()
    for l in [(1, 0, 350), (2, 120, 130), (3, 500, 500)]:
        for r in [(10, 90, 210), (11, 350, 600), (12, 700, 800)]:
            if l[1] <= r[2] and r[1] <= l[2]:
                want.add((l[0], r[0]))
    assert pairs == want
    # EXACTLY once: multi-bucket overlaps must not duplicate
    assert len(got) == len(pairs)


def test_interval_overlap_join_by_keys(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.joins import interval_overlap_join

    left = spark.createDataFrame([Row(k="a", ls=0, le=100),
                                  Row(k="b", ls=0, le=100)])
    right = spark.createDataFrame([Row(k="a", rs=50, re_=60)])
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re_", by=["k"], bucket_seconds=50
    ).collect()
    assert len(got) == 1 and got[0]["k"] == "a"


def test_interval_bucket_stats_pair_mass(spark):
    from pyspark.sql import Row

    from cerebro_spark.operators.joins import interval_bucket_stats

    left = spark.createDataFrame([
        Row(ls=0, le=199),    # buckets 0, 1
        Row(ls=100, le=150),  # bucket 1
    ])
    right = spark.createDataFrame([
        Row(rs=110, re_=130),  # bucket 1
        Row(rs=120, re_=140),  # bucket 1
        Row(rs=250, re_=260),  # bucket 2 (no left rows -> absent)
    ])
    got = {r["bucket"]: r for r in interval_bucket_stats(
        left, right, "ls", "le", "rs", "re_", bucket_seconds=100
    ).collect()}
    # bucket 1: 2 left x 2 right = mass 4; bucket 0/2 have an empty side
    assert set(got) == {1}
    assert got[1]["n_left"] == 2 and got[1]["n_right"] == 2
    assert got[1]["pair_mass"] == 4
