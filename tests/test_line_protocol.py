"""Line-protocol serialization of canonical points."""

import datetime as dt

from cerebro_spark.schema import POINT_SCHEMA
from cerebro_spark.streaming.sinks import to_line_protocol


def test_line_protocol(spark):
    t = dt.datetime(2024, 1, 1, 0, 0, 1)
    rows = [
        ("temp", {"ccd": "r1"}, {"value": 23.5}, None, None, t, None),
        ("pressure gauge", {"a b": "c,d"}, {"pz": 1e-06}, {"status": 'ok "fine"'},
         {"on": True}, t, None),
        ("no_time", {}, {"v": 1.0}, None, None, None, None),
        ("empty_fields", {}, {}, None, None, t, None),  # filtered out
    ]
    df = spark.createDataFrame(rows, POINT_SCHEMA)
    lines = sorted(r["line"] for r in to_line_protocol(df).collect())
    assert len(lines) == 3
    assert "temp,ccd=r1 value=23.5 1704067201000000" in lines
    esc = [l for l in lines if l.startswith("pressure")][0]
    assert esc.startswith("pressure\\ gauge,a\\ b=c\\,d ")
    assert 'status="ok \\"fine\\""' in esc and "on=true" in esc
    no_t = [l for l in lines if l.startswith("no_time")][0]
    assert no_t == "no_time v=1.0"


def test_line_protocol_roundtrip(spark):
    """serialize → parse returns the original points (modulo bucket, which
    line protocol doesn't carry)."""
    import datetime as dt

    from cerebro_spark.functions.parsers import parse_line_protocol

    t = dt.datetime(2024, 1, 1, 0, 0, 1, 123456)
    rows = [
        ("temp", {"ccd": "r1", "loc": "dome"}, {"value": 23.5, "alt": -1.25},
         None, None, t, "b"),
        ("pressure gauge", {"a b": "c,d"}, {"pz": 1e-06},
         {"status": 'ok "fine"', "mode": "auto"}, {"on": True, "err": False},
         t, "b"),
        ("no_time", {}, {"v": 1.0}, None, None, None, "b"),
    ]
    df = spark.createDataFrame(rows, POINT_SCHEMA)
    lines = to_line_protocol(df)
    back = parse_line_protocol(lines).collect()
    got = {r["measurement"]: r for r in back}
    assert set(got) == {"temp", "pressure gauge", "no_time"}
    r = got["temp"]
    assert r["tags"] == {"ccd": "r1", "loc": "dome"}
    assert r["fields"] == {"value": 23.5, "alt": -1.25}
    assert r["time"] == t
    r2 = got["pressure gauge"]
    assert r2["tags"] == {"a b": "c,d"}
    assert r2["fields_str"] == {"status": 'ok "fine"', "mode": "auto"}
    assert r2["fields_bool"] == {"on": True, "err": False}
    assert got["no_time"]["time"] is None
