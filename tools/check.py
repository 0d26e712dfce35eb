"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF and compares to
``oracle_sql()`` executed by DuckDB on the same parquet.  Round-2 lesson: the
driver's canonicalizer is pandas-based and STRICTER than a 6-sig-digit value
canon — it distinguishes numeric dtypes (DuckDB HUGEINT → float64 broke
``simhash`` in round 1), hashes doubles near full precision (summation-order
noise broke ``sessionize``), and crashes outright on array columns
(``multimodal_features``).  So this gate now:

- converts BOTH sides to pandas (``toPandas`` / ``res.df()``) and compares
  dtype *kinds* per column (i/u/f/O/M/b) — a mismatch is a failure;
- canonicalizes floats at 14 significant digits (driver observed ~14-15);
- HARD-FAILS any list/ndarray cell — raw array columns must never reach the
  driver gate.

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from cerebro_spark.schema import TESTDATA_TABLES  # noqa: E402


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        v = float(v)
        if math.isnan(v):
            # Distinct sentinel: the driver canonicalizer has NOT been
            # confirmed to conflate NaN with NULL, so a Spark-NaN vs
            # DuckDB-NULL divergence must stay visible locally.
            return "NaN"
        if v == 0:
            return 0.0
        return float(f"{v:.14g}")
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.bool_):
        return bool(v)
    if isinstance(v, (pd.Timestamp,)) or hasattr(v, "isoformat"):
        if v is pd.NaT or (isinstance(v, pd.Timestamp) and pd.isna(v)):
            return None
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray, dict)):
        raise TypeError(
            f"array/map cell {type(v).__name__} — driver canonicalizer "
            "crashes on these; string-encode or explode the column"
        )
    return v


def canon_frame(pdf: pd.DataFrame):
    """(sorted col names, {col: dtype kind}, canonical sorted row tuples)."""
    cols = sorted(pdf.columns)
    kinds = {}
    for c in cols:
        k = pdf[c].dtype.kind
        if k == "O":
            # object column of all-numeric (e.g. HUGEINT via fetch path) stays O
            non_null = pdf[c].dropna()
            if len(non_null) and all(
                isinstance(x, (list, tuple, np.ndarray, dict)) for x in non_null[:5]
            ):
                raise TypeError(
                    f"column {c!r} holds arrays/maps — driver canonicalizer "
                    "crashes; string-encode or explode it"
                )
        kinds[c] = "u" if k == "u" else k
    rows = [
        tuple(canon_value(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, kinds, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from cerebro_spark.session import get_spark

    spark = get_spark("check", shuffle_partitions=16)

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
            sc, skinds, sr = canon_frame(spdf)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark/canon error: {e}")
            continue
        if name not in oracles:
            print(f"okNR {name}: rows={len(sr)} (no oracle — rows-only check)")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
            oc, okinds, orr = canon_frame(opdf)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb/canon error: {e}")
            continue
        if sc != oc:
            failures.append(name)
            print(f"FAIL {name}: schema mismatch spark={sc} duckdb={oc}")
        elif skinds != okinds:
            failures.append(name)
            diff = {
                c: (skinds[c], okinds[c]) for c in sc if skinds[c] != okinds[c]
            }
            print(f"FAIL {name}: dtype-kind mismatch (spark, duckdb): {diff}")
        elif len(sr) != len(orr):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(sr)} duckdb={len(orr)}")
        elif sr != orr:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        else:
            print(f"ok   {name}: rows={len(sr)} cols={len(sc)}")
    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("\nall green")


if __name__ == "__main__":
    main()
