"""Oracle-checked queries exercising the parser library (SURVEY §2.1/§2.3:
S7/S8/S12 parse paths, T1 keyword explode, T2 JSON flatten).

Raw device lines are synthesized deterministically from `events` columns, then
parsed by the engine's DataFrame parsers; the DuckDB oracle derives the
expected output independently (either by re-parsing with SQL regexes or from
the source columns directly), so a parser bug can't cancel out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cerebro_spark.functions.parsers import (
    flatten_json_dynamic,
    parse_govee,
    parse_sens4,
    parse_thermistor,
    process_keywords,
)
from cerebro_spark.io import load_table

# ---------------------------------------------------------------------------
# S8 — sens4 regex parse
# ---------------------------------------------------------------------------

_SENS4_BUILD = """
CASE WHEN event_id % 41 = 0 THEN 'ERR' ELSE
  '@253ACKQ'
  || CAST(1 + event_id % 9 AS STRING) || '.' || lpad(CAST(event_id % 100 AS STRING), 2, '0')
     || 'E-0' || CAST(1 + event_id % 8 AS STRING) || ','
  || CAST(1 + event_id % 7 AS STRING) || '.' || lpad(CAST(event_id % 89 AS STRING), 2, '0')
     || 'E-0' || CAST(1 + event_id % 6 AS STRING) || ','
  || CAST(1 + event_id % 5 AS STRING) || '.' || lpad(CAST(event_id % 83 AS STRING), 2, '0')
     || 'E-0' || CAST(1 + event_id % 4 AS STRING) || ','
  || CAST(10 + event_id % 20 AS STRING) || '.' || lpad(CAST(event_id % 97 AS STRING), 2, '0')
  || ',MBAR' || chr(92)
END
"""


def q_parse_sens4(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    raw = ev.select("event_id", F.expr(_SENS4_BUILD).alias("reply"))
    parsed = parse_sens4(raw, ccd="r1")
    return parsed.select(
        "measurement",
        F.col("tags")["ccd"].alias("ccd"),
        F.col("fields")["pz"].alias("pz"),
        F.col("fields")["pir"].alias("pir"),
        F.col("fields")["cmb"].alias("cmb"),
        F.col("fields")["temp"].alias("temp"),
    )


_SENS4_PAT = (
    "'^@[0-9]{1,3}ACKQ?"
    "([0-9]+?.[0-9]+E[+-][0-9]+),"
    "([0-9]+?.[0-9]+E[+-][0-9]+),"
    "([0-9]+?.[0-9]+E[+-][0-9]+),"
    "([0-9]+\\.[0-9]+),.+\\\\$'"
)

_PARSE_SENS4_SQL = f"""
WITH raw AS (SELECT {_SENS4_BUILD} AS reply FROM events)
SELECT 'pressure' AS measurement, 'r1' AS ccd,
  CAST(regexp_extract(reply, {_SENS4_PAT}, 1) AS DOUBLE) AS pz,
  CAST(regexp_extract(reply, {_SENS4_PAT}, 2) AS DOUBLE) AS pir,
  CAST(regexp_extract(reply, {_SENS4_PAT}, 3) AS DOUBLE) AS cmb,
  CAST(regexp_extract(reply, {_SENS4_PAT}, 4) AS DOUBLE) AS temp
FROM raw WHERE regexp_extract(reply, {_SENS4_PAT}, 1) <> ''
"""


# ---------------------------------------------------------------------------
# S7 — govee line parse (split, '?' drop, address guard, stale filter)
# ---------------------------------------------------------------------------

_GOVEE_ADDR = "A4:C1:38:82:A2:88"
_GOVEE_CUTOFF = "2024-01-15 00:00:00"


def q_parse_govee(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    addr = F.when(F.col("event_id") % 13 == 0, F.lit("FF:FF:00:00:00:00")).otherwise(
        F.lit(_GOVEE_ADDR)
    )
    line = F.when(F.col("event_id") % 17 == 0, F.lit("?")).otherwise(
        F.concat_ws(
            " ",
            addr,
            F.col("value").cast("string"),
            (F.col("value") % F.lit(100.0)).cast("string"),
            F.lit("87"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss"),
        )
    )
    raw = ev.select(line.alias("line"))
    # "now" pinned to end-of-data; stale cutoff = 16 days → drops the first
    # half of January (exercises the stale filter on a meaningful fraction).
    parsed = parse_govee(
        raw,
        expected_address=_GOVEE_ADDR,
        device="govee1",
        stale_seconds=16 * 86400,
        now=F.lit("2024-01-31 00:00:00").cast("timestamp"),
    )
    return parsed.select(
        "measurement",
        F.col("tags")["address"].alias("address"),
        F.col("fields")["value"].alias("value"),
        "time",
    )


_PARSE_GOVEE_SQL = f"""
WITH good AS (
  SELECT value, fmod(value, 100.0) AS hum, date_trunc('second', ts) AS t
  FROM events
  WHERE event_id % 17 <> 0 AND event_id % 13 <> 0
    AND CAST(floor(epoch(date_trunc('second', ts))) AS BIGINT)
        > CAST(floor(epoch(TIMESTAMP '{_GOVEE_CUTOFF}')) AS BIGINT)
)
SELECT 'temperature' AS measurement, '{_GOVEE_ADDR}' AS address, value, t AS time FROM good
UNION ALL
SELECT 'humidity' AS measurement, '{_GOVEE_ADDR}' AS address, hum AS value, t AS time FROM good
"""


# ---------------------------------------------------------------------------
# S12 — thermistor hex bitmask parse
# ---------------------------------------------------------------------------

def q_parse_thermistor(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    raw = ev.select(
        F.concat(
            F.lit("!01"),
            F.lpad(F.hex(F.col("event_id") % 65536), 4, "0"),
            F.lit("\r"),
        ).alias("reply")
    )
    parsed = parse_thermistor(raw, mapping={f"channel{i}": f"t{i}" for i in range(16)})
    return parsed.select(
        "measurement",
        F.col("tags")["channel_name"].alias("channel_name"),
        F.map_keys("fields").getItem(0).alias("field_name"),
        F.map_values("fields").getItem(0).alias("bit"),
    )


_PARSE_THERMISTOR_SQL = """
SELECT 'thermistors' AS measurement,
  't' || CAST(ch AS VARCHAR) AS channel_name,
  'channel' || CAST(ch AS VARCHAR) AS field_name,
  CAST((CAST(event_id % 65536 AS BIGINT) >> ch) % 2 AS DOUBLE) AS bit
FROM events, generate_series(0, 15) AS g(ch)
"""


# ---------------------------------------------------------------------------
# T1 — tron keyword explode (naming, PVT, casts)
# ---------------------------------------------------------------------------

_KW_VALUE_SCHEMA = (
    "array<struct<name:string,units:string,native_kind:string,"
    "native_num:double,native_str:string,pvt:array<double>>>"
)


def q_tron_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    nul = F.lit(None).cast("string")
    nulpvt = F.lit(None).cast("array<double>")
    values = F.array(
        F.struct(
            nul.alias("name"), F.lit("degC").alias("units"),
            F.lit("num").alias("native_kind"), F.col("value").alias("native_num"),
            nul.alias("native_str"), nulpvt.alias("pvt"),
        ),
        F.struct(
            F.lit("x2").alias("name"), nul.alias("units"),
            F.lit("num").alias("native_kind"),
            (F.col("value") * 2).alias("native_num"),
            nul.alias("native_str"), nulpvt.alias("pvt"),
        ),
        F.struct(
            nul.alias("name"), nul.alias("units"),
            F.lit("pvt").alias("native_kind"),
            F.lit(None).cast("double").alias("native_num"),
            nul.alias("native_str"),
            F.array(
                F.col("value") + 1, F.col("value") + 2, F.col("value") + 3
            ).alias("pvt"),
        ),
    ).cast(_KW_VALUE_SCHEMA)
    kw = ev.select(
        F.col("event_id").alias("msg_id"),
        F.concat(F.lit("actor"), (F.col("user_id") % 3)).alias("actor"),
        F.col("event_type").alias("keyword"),
        values.alias("values"),
    )
    out = process_keywords(kw, casts={"actor0.click_0": "int"})
    return out.select("msg_id", "measurement", "field", "value")


_TRON_SQL = """
WITH base AS (
  SELECT event_id AS msg_id,
    'actor' || CAST(user_id % 3 AS VARCHAR) AS measurement,
    event_type AS kw, value
  FROM events
)
SELECT msg_id, measurement, kw || '_0' AS field,
  CASE WHEN measurement = 'actor0' AND kw = 'click'
       THEN CAST(floor(value) AS DOUBLE) ELSE value END AS value
FROM base
UNION ALL
SELECT msg_id, measurement, kw || '_x2' AS field, value * 2 AS value FROM base
UNION ALL
SELECT msg_id, measurement, kw || '_2_P' AS field, value + 1 AS value FROM base
UNION ALL
SELECT msg_id, measurement, kw || '_2_V' AS field, value + 2 AS value FROM base
UNION ALL
SELECT msg_id, measurement, kw || '_2_T' AS field, value + 3 AS value FROM base
"""


# ---------------------------------------------------------------------------
# T2 — dynamic JSON flatten (Arrow-batched UDF) vs direct SQL extraction
# ---------------------------------------------------------------------------

def q_flatten_amqp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    body = F.concat(
        F.lit('{"status": '),
        F.col("props"),
        F.lit(', "meta": {"user": "u'),
        F.col("user_id").cast("string"),
        F.lit('"}, "arr": [1, 2]}'),
    )
    raw = ev.select("event_id", body.alias("body"))
    flat = flatten_json_dynamic(raw, "body", groupers=["user"])
    return flat.select(
        "event_id",
        F.col("fields")["status.k"].alias("status_k"),
        F.col("fields_str")["meta.user"].alias("meta_user"),
        F.col("groupings")["user"].alias("grouper_user"),
    )


_FLATTEN_SQL = """
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS status_k,
  'u' || CAST(user_id AS VARCHAR) AS meta_user,
  'u' || CAST(user_id AS VARCHAR) AS grouper_user
FROM events
"""


QUERIES = {
    "parse_sens4": q_parse_sens4,
    "parse_govee": q_parse_govee,
    "parse_thermistor": q_parse_thermistor,
    "tron_keywords": q_tron_keywords,
    "flatten_amqp": q_flatten_amqp,
}

ORACLES = {
    "parse_sens4": _PARSE_SENS4_SQL,
    "parse_govee": _PARSE_GOVEE_SQL,
    "parse_thermistor": _PARSE_THERMISTOR_SQL,
    "tron_keywords": _TRON_SQL,
    "flatten_amqp": _FLATTEN_SQL,
}


# ---------------------------------------------------------------------------
# line-protocol ingest parse (inverse-serializer path in the gate)
# ---------------------------------------------------------------------------

def q_parse_line_protocol(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cerebro_spark.functions.parsers import parse_line_protocol

    ev = load_table(spark, "events", sf_dir)
    line = F.concat(
        F.lit("events,src=driver value="),
        F.col("value").cast("string"),
        F.lit(",uid="),
        F.col("user_id").cast("string"),
        F.lit('i,ts="'),
        F.col("event_type"),
        F.lit('"'),
        F.lit(" "),
        F.unix_micros(F.col("ts")).cast("string"),
    )
    raw = ev.select(line.alias("line"))
    out = parse_line_protocol(raw)
    return out.select(
        "measurement",
        F.col("tags")["src"].alias("src"),
        F.col("fields")["value"].alias("value"),
        F.col("fields")["uid"].alias("uid"),
        F.col("fields_str")["ts"].alias("event_type"),
        "time",
    )


_PARSE_LP_SQL = """
SELECT 'events' AS measurement, 'driver' AS src, value,
  CAST(user_id AS DOUBLE) AS uid, event_type, ts AS time
FROM events
"""

QUERIES["parse_line_protocol"] = q_parse_line_protocol
ORACLES["parse_line_protocol"] = _PARSE_LP_SQL
