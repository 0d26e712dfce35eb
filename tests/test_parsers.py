"""Parser tests on FIXTURES.md-shaped raw frames (F4-F8)."""

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cerebro_spark.functions.parsers import (
    flatten_json_dynamic,
    flatten_struct,
    keyword_allowlist,
    map_allowlist,
    parse_govee,
    parse_ln2,
    parse_sens4,
    parse_thermistor,
    process_keywords,
)


def test_govee(spark):
    lines = [
        "a4:c1:38:82:a2:88 23.41 41.2 87 2024-01-01T00:00:55.123",  # good
        "?",  # device not found → dropped
        "ff:ff:00:00:00:00 10.0 20.0 50 2024-01-01T00:00:50",  # addr mismatch
        "a4:c1:38:82:a2:88 24.0 42.0 87 2024-01-01T00:00:10",  # stale (>20s)
    ]
    df = spark.createDataFrame([(l,) for l in lines], ["line"])
    out = parse_govee(
        df,
        expected_address="A4:C1:38:82:A2:88",
        device="govee1",
        stale_seconds=20,
        now=F.lit("2024-01-01T00:01:00").cast("timestamp"),
    ).collect()
    assert len(out) == 2  # temperature + humidity from the one good line
    ms = {r["measurement"]: r for r in out}
    assert ms["temperature"]["fields"]["value"] == 23.41
    assert ms["humidity"]["fields"]["value"] == 41.2
    assert ms["temperature"]["tags"]["address"] == "A4:C1:38:82:A2:88"


def test_sens4(spark):
    df = spark.createDataFrame(
        [
            ("@253ACKQ1.23E-06,2.34E-06,3.45E-06,24.50,MBAR\\",),
            ("garbage",),
        ],
        ["reply"],
    )
    out = parse_sens4(df, ccd="r1").collect()
    assert len(out) == 1
    f = out[0]["fields"]
    assert f["pz"] == pytest.approx(1.23e-6)
    assert f["temp"] == pytest.approx(24.5)
    assert out[0]["tags"]["ccd"] == "r1"


def test_ln2(spark):
    df = spark.createDataFrame([("ST,GS 117.2 lb\r\n",), ("junk",)], ["reply"])
    out = parse_ln2(df).collect()
    assert len(out) == 1
    assert out[0]["fields"]["value"] == pytest.approx(117.2)
    assert out[0]["measurement"] == "ln2_weigth"


def test_thermistor(spark):
    # 0xA3F0 = 1010 0011 1111 0000b → channels 4-9, 13, 15 set
    df = spark.createDataFrame([("!01A3F0\r",), ("bad",)], ["reply"])
    out = parse_thermistor(df, mapping={"channel4": "ln2_r1"}).collect()
    assert len(out) == 16
    bits = {list(r["fields"].keys())[0]: list(r["fields"].values())[0] for r in out}
    expected = 0xA3F0
    for ch in range(16):
        assert bits[f"channel{ch}"] == float((expected >> ch) & 1)
    named = [r for r in out if "channel4" in r["fields"]][0]
    assert named["tags"]["channel_name"] == "ln2_r1"


def test_flatten_json_dynamic(spark):
    body = (
        '{"status": {"mod2": {"tempa": 21.3, "tempb": 20.9}, '
        '"controller": "sp2", "names": [1,2], "ok": true}}'
    )
    df = spark.createDataFrame([Row(sender="lvmscp", body=body)])
    out = flatten_json_dynamic(df, "body", groupers=["controller"]).collect()[0]
    assert out["fields"] == {"status.mod2.tempa": 21.3, "status.mod2.tempb": 20.9}
    assert out["fields_str"] == {"status.controller": "sp2"}
    assert out["fields_bool"] == {"status.ok": True}
    assert out["groupings"] == {"controller": "sp2"}  # list 'names' dropped


def test_flatten_roundtrip_property(spark):
    """flatten(nested) keys join path with '.', arrays dropped at any depth."""
    import json
    import random

    rng = random.Random(42)

    def gen(depth=0):
        d = {}
        for i in range(rng.randint(1, 4)):
            k = f"k{depth}{i}"
            r = rng.random()
            if depth < 3 and r < 0.4:
                d[k] = gen(depth + 1)
            elif r < 0.5:
                d[k] = [1, 2, 3]
            elif r < 0.75:
                d[k] = rng.random() * 100
            else:
                d[k] = f"s{i}"
        return d

    def expected_flat(d, parent=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, list):
                continue
            key = f"{parent}.{k}" if parent else k
            if isinstance(v, dict):
                out.update(expected_flat(v, key))
            else:
                out[key] = v
        return out

    cases = [gen() for _ in range(25)]
    df = spark.createDataFrame([(i, json.dumps(c)) for i, c in enumerate(cases)], ["i", "body"])
    rows = {r["i"]: r for r in flatten_json_dynamic(df, "body").collect()}
    for i, c in enumerate(cases):
        exp = expected_flat(c)
        got = dict(rows[i]["fields"] or {})
        got.update(rows[i]["fields_str"] or {})
        got.update(rows[i]["fields_bool"] or {})
        assert got == exp, (i, c)


def test_flatten_struct_jvm(spark):
    df = spark.createDataFrame(
        [Row(status=Row(mod2=Row(tempa=21.3), controller="sp2"), arr=[1, 2])]
    )
    out = flatten_struct(df)
    assert sorted(out.columns) == ["status.controller", "status.mod2.tempa"]


def test_allowlist(spark):
    df = spark.createDataFrame(
        [("lvmscp.status.mod2.tempa", 1.0), ("lvmscp.status.other", 2.0)],
        ["field", "value"],
    )
    out = keyword_allowlist(df, ["lvmscp.status.mod2.tempa"]).collect()
    assert len(out) == 1 and out[0]["value"] == 1.0

    df2 = spark.createDataFrame(
        [Row(fields={"a": 1.0, "b": 2.0})]
    )
    out2 = map_allowlist(df2, ["a"]).collect()[0]
    assert out2["fields"] == {"a": 1.0}


def _kw_rows():
    # FIXTURES.md F8 value struct: name, units, native_kind, native_num,
    # native_str, pvt
    def v(name=None, units=None, kind="num", num=None, s=None, pvt=None):
        return Row(
            name=name, units=units, native_kind=kind,
            native_num=num, native_str=s, pvt=pvt,
        )

    return [
        # single unnamed value → field = kw
        Row(msg_id=1, actor="tcc", keyword="airtemp", values=[v(num=12.5, units="degC")]),
        # multiple unnamed → _0, _1
        Row(msg_id=2, actor="tcc", keyword="axepos", values=[v(num=1.0), v(num=2.0)]),
        # named values → _name
        Row(msg_id=3, actor="apo", keyword="pressure", values=[v(name="dome", num=3.0)]),
        # PVT triple → _P/_V/_T
        Row(msg_id=4, actor="tcc", keyword="objsys", values=[v(kind="pvt", pvt=[1.0, 2.0, 3.0])]),
        # non-PVT array → skipped, but sibling scalar emitted with correct ii
        Row(msg_id=5, actor="tcc", keyword="mixed", values=[v(kind="array"), v(num=9.0), v(num=10.0)]),
        # keyword_tags promotion: value at index 0 becomes tag on siblings
        Row(msg_id=6, actor="scp", keyword="status", values=[v(s="r1", kind="str"), v(num=7.0)]),
    ]


def test_process_keywords(spark):
    df = spark.createDataFrame(_kw_rows())
    out = process_keywords(
        df,
        casts={"tcc.axepos_0": "int"},
        keyword_tags={"scp.status": {"index": 0, "name": "camera"}},
    )
    rows = out.collect()
    by_msg = {}
    for r in rows:
        by_msg.setdefault(r["msg_id"], []).append(r)

    assert [r["field"] for r in by_msg[1]] == ["airtemp"]
    assert by_msg[1][0]["tags"]["units"] == "degC"

    assert sorted(r["field"] for r in by_msg[2]) == ["axepos_0", "axepos_1"]

    assert [r["field"] for r in by_msg[3]] == ["pressure_dome"]

    assert sorted(r["field"] for r in by_msg[4]) == [
        "objsys_P", "objsys_T", "objsys_V"
    ]
    pvals = {r["field"]: r["value"] for r in by_msg[4]}
    assert pvals == {"objsys_P": 1.0, "objsys_V": 2.0, "objsys_T": 3.0}

    # skipped array: 2 rows, unnamed ordinals start at 0 for first emitted
    assert sorted(r["field"] for r in by_msg[5]) == ["mixed_0", "mixed_1"]

    # tag promotion onto all sibling points of msg 6
    for r in by_msg[6]:
        assert r["tags"].get("camera") == "r1"


def test_actor_reply_parser(spark):
    from cerebro_spark.functions.parsers import parse_actor_replies

    lines = [
        '5 12 i airtemp=12.5; humid=40,41; text="a, quoted"; ping',
        "5 0 i broadcast=1",  # commandId 0 → dropped by default
        "garbage line without header",
        "5 13 : done",
    ]
    df = spark.createDataFrame([(l,) for l in lines], ["line"])
    out = parse_actor_replies(df).collect()
    by_kw = {r["keyword"]: r for r in out}
    assert set(by_kw) == {"airtemp", "humid", "text", "ping", "done"}
    assert by_kw["airtemp"]["values"] == ["12.5"]
    assert by_kw["humid"]["values"] == ["40", "41"]
    # quote-aware comma split keeps the quoted value whole
    assert by_kw["text"]["values"] == ['"a, quoted"']
    assert by_kw["ping"]["values"] == []
    assert by_kw["done"]["flag"] == ":"
    # broadcasts kept when requested (tron.py:434-435)
    kept = parse_actor_replies(df, store_broadcasts=True).collect()
    assert any(r["keyword"] == "broadcast" for r in kept)
