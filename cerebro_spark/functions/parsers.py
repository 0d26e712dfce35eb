"""Device/bus payload parsers (SURVEY §2.1 parse stages + §2.3 T1-T3, T12).

Each parser is a pure DataFrame→DataFrame transform producing canonical point
rows (or long field rows), built from JVM-side expressions (`regexp_extract`,
`split`, `explode`, `conv`) — no Python row loops.  The only Python-side parser
is the schemaless JSON flattener (`flatten_json_dynamic`), which is
Arrow-batched because truly dynamic nesting has no static schema for Catalyst.

Semantics cite the reference implementation they reproduce.
"""

from __future__ import annotations

from itertools import chain as _chain

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# S7 — Govee thermometer lines (reference `lvm.py:57-109`)
# ---------------------------------------------------------------------------

def parse_govee(
    df: DataFrame,
    line_col: str = "line",
    expected_address: str | None = None,
    device: str | None = None,
    stale_seconds: float | None = 20.0,
    now: Column | None = None,
) -> DataFrame:
    """Parse ``"{address} {temp} {humidity} {battery} {isot}"`` lines into two
    points per line (temperature + humidity).

    Reference behavior reproduced: ``?`` lines dropped (`lvm.py:70-72`); stale
    points (older than ``stale_seconds`` = 2×delay) dropped (`lvm.py:79-82`);
    address-mismatch lines dropped with the address upper-cased for the tag
    (`lvm.py:54,84-94`).  ``now`` defaults to current_timestamp; pass a column
    for deterministic replay.
    """
    parts = F.split(F.trim(F.col(line_col)), r"\s+")
    parsed = (
        df.filter(F.trim(F.col(line_col)) != "?")
        .withColumn("__address", F.element_at(parts, 1))
        .withColumn("__temp", F.element_at(parts, 2).cast("double"))
        .withColumn("__hum", F.element_at(parts, 3).cast("double"))
        .withColumn("__time", F.to_timestamp(F.element_at(parts, 5)))
        .filter(F.col("__temp").isNotNull() & F.col("__time").isNotNull())
    )
    if expected_address is not None:
        parsed = parsed.filter(
            F.upper(F.col("__address")) == expected_address.upper()
        )
    if stale_seconds is not None:
        now_c = now if now is not None else F.current_timestamp()
        parsed = parsed.filter(
            F.col("__time").cast("double") > now_c.cast("double") - F.lit(stale_seconds)
        )
    tag_map = F.create_map(
        F.lit("address"), F.upper(F.col("__address")),
        F.lit("device"), F.lit(device),
    )
    out = parsed.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("temperature").alias("measurement"),
                    F.col("__temp").alias("value"),
                ),
                F.struct(
                    F.lit("humidity").alias("measurement"),
                    F.col("__hum").alias("value"),
                ),
            )
        ).alias("p"),
        tag_map.alias("tags"),
        F.col("__time").alias("time"),
    )
    return out.select(
        F.col("p.measurement").alias("measurement"),
        "tags",
        F.create_map(F.lit("value"), F.col("p.value")).alias("fields"),
        "time",
    )


# ---------------------------------------------------------------------------
# S8 — Sens4 transducer replies (reference `lvm.py:139-174`)
# ---------------------------------------------------------------------------

#: the reference's reply regex (`lvm.py:152-160`), anchored.
SENS4_PATTERN = (
    r"^@[0-9]{1,3}ACKQ?"
    r"([0-9]+?.[0-9]+E[+-][0-9]+),"
    r"([0-9]+?.[0-9]+E[+-][0-9]+),"
    r"([0-9]+?.[0-9]+E[+-][0-9]+),"
    r"([0-9]+\.[0-9]+),.+\\$"
)


def parse_sens4(df: DataFrame, reply_col: str = "reply", ccd: str = "NA") -> DataFrame:
    """Parse Sens4 sci-notation replies into one ``pressure`` point with fields
    pz/pir/cmb/temp.  Unparseable replies are dropped (the reference raises and
    the read is retried — in a dataflow the row-drop is the equivalent)."""
    groups = {
        "pz": 1,
        "pir": 2,
        "cmb": 3,
        "temp": 4,
    }
    out = df
    for name, idx in groups.items():
        out = out.withColumn(
            f"__{name}", F.regexp_extract(F.col(reply_col), SENS4_PATTERN, idx)
        )
    out = out.filter(F.col("__pz") != "")
    field_map = F.create_map(
        *_chain.from_iterable(
            (F.lit(n), F.col(f"__{n}").cast("double")) for n in groups
        )
    )
    return out.select(
        F.lit("pressure").alias("measurement"),
        F.create_map(F.lit("ccd"), F.lit(ccd)).alias("tags"),
        field_map.alias("fields"),
    )


# ---------------------------------------------------------------------------
# S10 — LN2 scale replies (reference `lvm.py:218-238`)
# ---------------------------------------------------------------------------

def parse_ln2(df: DataFrame, reply_col: str = "reply") -> DataFrame:
    """Extract `` {weight} lb`` from scale replies → ``ln2_weigth`` point
    (field name keeps the reference's typo, `lvm.py:231-236`)."""
    w = F.regexp_extract(F.col(reply_col), r"\s([\-0-9.]+)\slb", 1)
    return (
        df.withColumn("__w", w)
        .filter(F.col("__w") != "")
        .select(
            F.lit("ln2_weigth").alias("measurement"),
            F.create_map(F.lit("spectrograph"), F.lit("sp1")).alias("tags"),
            F.create_map(F.lit("value"), F.col("__w").cast("double")).alias("fields"),
        )
    )


# ---------------------------------------------------------------------------
# S12/T12 — ADAM thermistor bitmask replies (reference `lvm.py:387-418`)
# ---------------------------------------------------------------------------

def parse_thermistor(
    df: DataFrame,
    reply_col: str = "reply",
    mapping: dict[str, str] | None = None,
) -> DataFrame:
    """Parse ``!01{HEX}\\r`` replies → 16 per-channel boolean points.

    Hex decode is JVM-side (``conv(hex, 16, 10)``); the 16-way fan-out is an
    ``explode(sequence(0,15))`` — row count ×16, no shuffle."""
    mapping = mapping or {}
    hexpart = F.regexp_extract(F.col(reply_col), r"^!01([0-9A-F]+)\r", 1)
    name_map = F.create_map(
        *_chain.from_iterable(
            (F.lit(f"channel{i}"), F.lit(mapping.get(f"channel{i}", "")))
            for i in range(16)
        )
    )
    out = (
        df.withColumn("__hex", hexpart)
        .filter(F.col("__hex") != "")
        .withColumn("__mask", F.conv(F.col("__hex"), 16, 10).cast("long"))
        .select(
            "*", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("channel")
        )
        .withColumn(
            "bit",
            (F.expr("shiftright(__mask, CAST(channel AS INT))") % 2).cast("int"),
        )
        .withColumn("field_name", F.concat(F.lit("channel"), F.col("channel")))
    )
    return out.select(
        F.lit("thermistors").alias("measurement"),
        F.create_map(
            F.lit("channel_name"), F.element_at(name_map, F.col("field_name"))
        ).alias("tags"),
        F.create_map(F.col("field_name"), F.col("bit").cast("double")).alias("fields"),
    )


# ---------------------------------------------------------------------------
# T2 — schemaless nested-JSON flatten (reference `AMQP.py:28-58`)
# ---------------------------------------------------------------------------

def _flatten(d: dict, parent: str = "", sep: str = ".", groupers: set | None = None):
    """Python mirror of the reference flattener: dot-joined keys, list/tuple
    values dropped, grouper subkeys collected (`AMQP.py:28-58`)."""
    items: dict = {}
    groups: dict = {}
    for k, v in d.items():
        if isinstance(v, (list, tuple)):
            continue
        key = f"{parent}{sep}{k}" if parent else k
        if isinstance(v, dict):
            sub, subg = _flatten(v, key, sep, groupers)
            items.update(sub)
            groups.update(subg)
        else:
            items[key] = v
            if groupers and k in groupers:
                groups[k] = v
    return items, groups


def flatten_json_dynamic(
    df: DataFrame,
    json_col: str = "body",
    groupers: list[str] | None = None,
    prefix_col: str | None = None,
) -> DataFrame:
    """Flatten arbitrarily-nested JSON strings into typed field maps + grouper
    tags.  Arrow-batched ``mapInPandas`` — the justified Python path: the JSON
    schema is dynamic per row, so no static struct flatten applies.  For known
    schemas use ``flatten_struct`` (JVM-side) instead.

    Output: input columns (minus ``json_col``) + ``fields`` map<string,double>,
    ``fields_str`` map<string,string>, ``fields_bool`` map<string,boolean>,
    ``groupings`` map<string,string>.
    """
    import json

    gset = set(groupers or [])
    keep = [c for c in df.columns if c != json_col]
    schema = (
        ", ".join(f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep)
        + (", " if keep else "")
        + "fields map<string,double>, fields_str map<string,string>, "
        "fields_bool map<string,boolean>, groupings map<string,string>"
    )
    prefix_idx = keep.index(prefix_col) if prefix_col else None

    def process(batches):
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                try:
                    data = json.loads(row[json_col]) if row[json_col] else {}
                except (TypeError, ValueError):
                    data = {}
                flat, groups = _flatten(data, groupers=gset)
                if prefix_idx is not None:
                    flat = {f"{row[prefix_col]}.{k}": v for k, v in flat.items()}
                nums, strs, bools = {}, {}, {}
                for k, v in flat.items():
                    if isinstance(v, bool):
                        bools[k] = v
                    elif isinstance(v, (int, float)) and v is not None:
                        nums[k] = float(v)
                    elif v is not None:
                        strs[k] = str(v)
                out = {c: row[c] for c in keep}
                out.update(
                    fields=nums,
                    fields_str=strs,
                    fields_bool=bools,
                    groupings={k: str(v) for k, v in groups.items()},
                )
                rows.append(out)
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                columns=keep + ["fields", "fields_str", "fields_bool", "groupings"]
            )

    return df.mapInPandas(process, schema)


def flatten_struct(df: DataFrame, sep: str = ".", drop_arrays: bool = True) -> DataFrame:
    """JVM-side flatten for *known* schemas: recursively expands struct columns
    into dot-joined scalar columns; array columns dropped to match the
    reference flattener's list-drop (`AMQP.py:40-41`)."""
    from pyspark.sql.types import ArrayType, StructType

    def expand(schema: StructType, parent: str) -> list[Column]:
        cols: list[Column] = []
        for f in schema.fields:
            name = f"{parent}{sep}{f.name}" if parent else f.name
            ref = F.col(name.replace(sep, ".")) if sep == "." else F.col(name)
            if isinstance(f.dataType, StructType):
                cols.extend(expand(f.dataType, name))
            elif isinstance(f.dataType, ArrayType) and drop_arrays:
                continue
            else:
                full = f"{parent}.{f.name}" if parent else f.name
                cols.append(F.col(full).alias(full.replace(".", sep) if sep != "." else full))
        return cols

    return df.select(expand(df.schema, ""))


# ---------------------------------------------------------------------------
# T3 — keyword allow-list filter (documented semantics; the reference tron
# filter is inverted vs its docstring — SURVEY §2.3 T3)
# ---------------------------------------------------------------------------

def keyword_allowlist(df: DataFrame, allow: list[str], name_col: str = "field") -> DataFrame:
    """Keep only rows whose field name is in the allow-list
    (`AMQP.py:200-201`; tron documented intent `tron.py:129-131`)."""
    return df.filter(F.col(name_col).isin(allow))


def map_allowlist(df: DataFrame, allow: list[str], map_col: str = "fields") -> DataFrame:
    """Map-column variant: prune field-map entries not in the allow-list."""
    allow_arr = F.array(*[F.lit(a) for a in allow])
    return df.withColumn(
        map_col,
        F.map_filter(F.col(map_col), lambda k, _: F.array_contains(allow_arr, k)),
    )


# ---------------------------------------------------------------------------
# T1 — tron keyword processing (reference `tron.py:30-99`)
# ---------------------------------------------------------------------------

def process_keywords(
    df: DataFrame,
    casts: dict[str, str] | None = None,
    keyword_tags: dict[str, dict] | None = None,
) -> DataFrame:
    """Explode parsed keyword batches into field rows with the reference's
    name-mangling rules (FIXTURES.md F8 input shape: ``actor``, ``keyword``,
    ``values`` array<struct<name,units,native_kind,native_num,native_str,pvt>>,
    plus a ``msg_id`` identifying the parsed message).

    Rules reproduced from `tron.py:30-99`:
    - named value → field ``{kw}_{name}``; single unnamed → ``{kw}``;
      multiple unnamed → ``{kw}_{i}`` (`tron.py:45-51`);
    - units → ``units`` tag (`tron.py:54-55`);
    - PVT arrays → three fields ``_P/_V/_T`` (`tron.py:59-64`); other arrays
      skipped (`tron.py:66-70`);
    - casts map ``{actor.kw_key: int|float|bool}`` (`tron.py:75-83`);
    - keyword_tags ``{actor.kw: {index, name}}`` promotes the value at that
      index to a tag on all sibling points (`tron.py:86-97`) — implemented as
      a windowed first-value broadcast over the message, not a loop.
    """
    from pyspark.sql import Window

    casts = casts or {}
    keyword_tags = keyword_tags or {}

    ex = df.select(
        "msg_id",
        "actor",
        "keyword",
        F.posexplode("values").alias("idx", "v"),
    )
    n_values = df.select(
        "msg_id", F.size("values").alias("__n")
    )
    ex = ex.join(F.broadcast(n_values), "msg_id")

    # unnamed-value ordinal ``ii`` — the reference counts only emitted values;
    # since skipped non-PVT arrays still increment ``ii`` *after* emit (continue
    # before ii+=1), ii equals the count of prior non-skipped values.
    w_ii = (
        Window.partitionBy("msg_id")
        .orderBy("idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_array = F.col("v.native_kind") == "array"
    is_pvt = F.col("v.native_kind") == "pvt"
    emitted = (~is_array) | is_pvt
    ex = ex.withColumn(
        "ii", F.coalesce(F.sum(emitted.cast("int")).over(w_ii), F.lit(0))
    )

    key_name = (
        F.when(
            F.col("v.name").isNotNull() & (F.col("v.name") != ""),
            F.concat(F.lit("_"), F.col("v.name")),
        )
        .when(F.col("__n") == 1, F.lit(""))
        .otherwise(F.concat(F.lit("_"), F.col("ii")))
    )
    ex = ex.withColumn("key_name", key_name).filter(emitted)

    # casts (scalar values only)
    cast_map = F.create_map(
        *_chain.from_iterable((F.lit(k), F.lit(v)) for k, v in casts.items())
    ) if casts else F.create_map()
    cast_key = F.concat(F.col("actor"), F.lit("."), F.col("keyword"), F.col("key_name"))
    cast_kind = F.element_at(cast_map, cast_key)
    value_num = (
        F.when(cast_kind == "int", F.floor(F.col("v.native_num")).cast("double"))
        .when(cast_kind == "bool", (F.col("v.native_num") != 0).cast("double"))
        .otherwise(F.col("v.native_num"))
    )

    # keyword_tags promotion: value at configured index → tag on all siblings
    tag_rows = []
    for akw, spec in keyword_tags.items():
        actor, kw = akw.split(".", 1)
        tag_rows.append((actor, kw, int(spec["index"]), spec["name"]))
    if tag_rows:
        from cerebro_spark.operators.util import small_df

        kt = small_df(
            df.sparkSession,
            tag_rows, ["__kt_actor", "__kt_kw", "__kt_idx", "__kt_name"],
        )
        ex = ex.join(
            F.broadcast(kt),
            (F.col("actor") == F.col("__kt_actor"))
            & (F.col("keyword") == F.col("__kt_kw")),
            "left",
        )
        w_msg = Window.partitionBy("msg_id")
        promoted = F.max(
            F.when(
                F.col("idx") == F.col("__kt_idx"),
                F.coalesce(
                    F.col("v.native_str"), F.col("v.native_num").cast("string")
                ),
            )
        ).over(w_msg)
        ex = ex.withColumn("__kt_value", promoted)
    else:
        ex = ex.withColumn("__kt_name", F.lit(None).cast("string")).withColumn(
            "__kt_value", F.lit(None).cast("string")
        )

    base_field = F.concat(F.col("keyword"), F.col("key_name"))
    tags = F.map_filter(
        F.create_map(
            F.lit("units"), F.col("v.units"),
            F.coalesce(F.col("__kt_name"), F.lit("__none")), F.col("__kt_value"),
        ),
        lambda k, v: (k != "__none") & v.isNotNull(),
    )

    # PVT triples expand to 3 field rows; scalars to 1.
    pvt_fields = F.array(
        F.struct(
            F.concat(base_field, F.lit("_P")).alias("field"),
            F.element_at(F.col("v.pvt"), 1).alias("value"),
            F.lit(None).cast("string").alias("value_str"),
        ),
        F.struct(
            F.concat(base_field, F.lit("_V")).alias("field"),
            F.element_at(F.col("v.pvt"), 2).alias("value"),
            F.lit(None).cast("string").alias("value_str"),
        ),
        F.struct(
            F.concat(base_field, F.lit("_T")).alias("field"),
            F.element_at(F.col("v.pvt"), 3).alias("value"),
            F.lit(None).cast("string").alias("value_str"),
        ),
    )
    scalar_fields = F.array(
        F.struct(
            base_field.alias("field"),
            value_num.alias("value"),
            F.col("v.native_str").alias("value_str"),
        )
    )
    ex = ex.withColumn("__f", F.when(is_pvt, pvt_fields).otherwise(scalar_fields))

    return ex.select(
        "msg_id",
        F.col("actor").alias("measurement"),
        tags.alias("tags"),
        F.explode("__f").alias("fv"),
        "idx",
    ).select(
        "msg_id",
        "measurement",
        "tags",
        F.col("fv.field").alias("field"),
        F.col("fv.value").alias("value"),
        F.col("fv.value_str").alias("value_str"),
        "idx",
    )


# ---------------------------------------------------------------------------
# S4 — actor reply line parser (reference `tron.py:390-454`)
# ---------------------------------------------------------------------------

#: tron reply header: "<commanderId> <commandId> <flag> <keywords>"
_ACTOR_HEADER_RE = r"^(\d+)\s+(\d+)\s+([:iwef>dI])\s*(.*)$"

#: split keyword values on commas not inside double quotes (Java regex
#: lookahead — JVM-side only; the oracle restricts itself to unquoted values)
_VALUE_SPLIT_RE = r',(?=(?:[^"]*"[^"]*")*[^"]*$)'


def parse_actor_replies(
    df: DataFrame,
    line_col: str = "line",
    store_broadcasts: bool = False,
) -> DataFrame:
    """Parse tron actor reply lines into (command_id, flag, keyword, values).

    Reference behavior (`tron.py:390-454`):
    - unparseable lines are dropped with a warning → row drop here;
    - broadcast replies (``commandId == 0``) are dropped unless
      ``store_broadcasts`` (`tron.py:434-435`);
    - each reply carries ``;``-separated keywords, each ``name=v1,v2`` (values
      optional); values are strings at this stage — typing happens in
      `process_keywords` (T1).

    Line reassembly from the TCP byte stream (the reference's ``self.buffer``
    splitlines logic) is connector-side: a Spark source hands whole lines.
    """
    parsed = df.select(
        F.regexp_extract(F.col(line_col), _ACTOR_HEADER_RE, 1)
        .alias("__commander"),
        F.regexp_extract(F.col(line_col), _ACTOR_HEADER_RE, 2).alias("__cmd"),
        F.regexp_extract(F.col(line_col), _ACTOR_HEADER_RE, 3).alias("flag"),
        F.regexp_extract(F.col(line_col), _ACTOR_HEADER_RE, 4).alias("__kws"),
    ).filter(F.col("flag") != "")
    if not store_broadcasts:
        parsed = parsed.filter(F.col("__cmd").cast("long") != 0)
    kw = parsed.select(
        F.col("__cmd").cast("long").alias("command_id"),
        "flag",
        F.explode(
            F.filter(
                F.transform(F.split(F.col("__kws"), ";"), lambda s: F.trim(s)),
                lambda s: s != "",
            )
        ).alias("__kw"),
    )
    name = F.trim(F.regexp_extract(F.col("__kw"), r"^([^=]+?)\s*(?:=|$)", 1))
    values = F.when(
        F.col("__kw").contains("="),
        F.transform(
            F.split(
                F.regexp_replace(F.col("__kw"), r"^[^=]+=\s*", ""),
                _VALUE_SPLIT_RE,
            ),
            lambda v: F.trim(v),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return kw.select(
        "command_id", "flag", name.alias("keyword"), values.alias("values")
    ).filter(F.col("keyword") != "")


# ---------------------------------------------------------------------------
# InfluxDB line-protocol parser (inverse of sinks.to_line_protocol)
# ---------------------------------------------------------------------------

def parse_line_protocol(
    df: DataFrame,
    line_col: str = "line",
    precision: str = "us",
) -> DataFrame:
    """Parse InfluxDB line-protocol text into canonical point rows.

    ``measurement[,tag=v...] field=v[,field=v...] [timestamp]`` with the
    spec's escaping (``\\,`` ``\\=`` ``\\ `` in identifiers, quoted string
    fields).  Value typing: ``"..."``→string, true/false→bool, trailing
    ``i``→int(→double field map), else double.  Malformed lines are dropped.

    Implementation: split on UNESCAPED separators via zero-width Java-regex
    lookbehind ``(?<!\\\\)`` — fully JVM-side.
    """
    unesc = lambda c: F.regexp_replace(c, r"\\([,=\s])", "$1")
    # sections: measurement+tags = up to the first UNESCAPED space (quoted
    # string values may contain spaces, so a naive space split breaks);
    # timestamp = trailing " <digits>"; fields = what remains between.
    head = F.regexp_extract(F.col(line_col), r"^((?:[^ \\]|\\.)+) ", 1)
    rest = F.regexp_replace(F.col(line_col), r"^(?:[^ \\]|\\.)+ ", "")
    ts_str = F.regexp_extract(rest, r" (\d+)$", 1)
    tspart = F.when(ts_str != "", ts_str)
    fieldpart = F.regexp_replace(rest, r" \d+$", "")

    headbits = F.split(head, r"(?<!\\),")
    measurement = unesc(F.element_at(headbits, 1))
    tag_entries = F.filter(
        F.transform(
            F.slice(headbits, 2, F.greatest(F.size(headbits) - 1, F.lit(0))),
            lambda kv: F.struct(
                unesc(F.element_at(F.split(kv, r"(?<!\\)="), 1)).alias("k"),
                unesc(F.element_at(F.split(kv, r"(?<!\\)="), 2)).alias("v"),
            ),
        ),
        lambda e: e["k"].isNotNull() & e["v"].isNotNull(),
    )
    tags = F.map_from_entries(tag_entries)

    # tokenize key=value pairs: value is a quoted string (escaped quotes
    # allowed) or an unquoted non-comma run — regex token extraction instead
    # of a comma split, so escaped/quoted commas never confuse the parser
    kv_tokens = F.regexp_extract_all(
        fieldpart,
        F.lit(r'(?:[^,=\\]|\\.)+=(?:"(?:[^"\\]|\\.)*"|[^,]*)'),
        0,
    )
    fbits = F.transform(
        kv_tokens,
        lambda kv: F.struct(
            unesc(F.regexp_extract(kv, r"^((?:[^=\\]|\\.)+)=", 1)).alias("k"),
            F.regexp_replace(kv, r"^(?:[^=\\]|\\.)+=", "").alias("raw"),
        ),
    )
    is_str = lambda r: r.startswith('"')
    is_bool = lambda r: F.lower(r).isin("true", "false", "t", "f")
    is_int = lambda r: r.rlike(r"^-?\d+i$")
    num_entries = F.filter(
        fbits,
        lambda e: ~is_str(e["raw"]) & ~is_bool(e["raw"]) & e["raw"].isNotNull(),
    )
    fields = F.map_from_entries(
        F.transform(
            num_entries,
            lambda e: F.struct(
                e["k"].alias("k"),
                F.when(
                    is_int(e["raw"]),
                    F.regexp_replace(e["raw"], "i$", "").try_cast("double"),
                ).otherwise(e["raw"].try_cast("double")).alias("v"),
            ),
        )
    )
    str_entries = F.filter(fbits, lambda e: is_str(e["raw"]))
    fields_str = F.map_from_entries(
        F.transform(
            str_entries,
            lambda e: F.struct(
                e["k"].alias("k"),
                F.regexp_replace(
                    F.regexp_replace(e["raw"], r'^"|"$', ""), r'\\"', '"'
                ).alias("v"),
            ),
        )
    )
    bool_entries = F.filter(fbits, lambda e: is_bool(e["raw"]))
    fields_bool = F.map_from_entries(
        F.transform(
            bool_entries,
            lambda e: F.struct(
                e["k"].alias("k"),
                F.lower(e["raw"]).isin("true", "t").alias("v"),
            ),
        )
    )
    assert precision in ("us", "ns")
    ts_long = tspart.cast("long")
    micros = ts_long if precision == "us" else (ts_long - ts_long % 1000) / 1000
    micros = micros.cast("long")
    out = df.select(
        measurement.alias("measurement"),
        tags.alias("tags"),
        fields.alias("fields"),
        fields_str.alias("fields_str"),
        fields_bool.alias("fields_bool"),
        F.when(ts_long.isNotNull(), F.timestamp_micros(micros)).alias("time"),
        F.lit(None).cast("string").alias("bucket"),
    )
    return out.filter(
        F.col("measurement").isNotNull()
        & (
            (F.size(F.coalesce(F.col("fields"), F.create_map())) > 0)
            | (F.size(F.coalesce(F.col("fields_str"), F.create_map())) > 0)
            | (F.size(F.coalesce(F.col("fields_bool"), F.create_map())) > 0)
        )
    )
