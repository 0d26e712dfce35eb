"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at a given SF and compares to
``oracle_sql()`` executed by DuckDB on the same parquet: row count, sorted
column names, and an order-insensitive value hash after canonicalization
(floats → 6 significant digits, timestamps → ISO strings; FIXTURES.md rule).

Usage: python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from cerebro_spark.schema import TESTDATA_TABLES  # noqa: E402


def canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        return float(f"{v:.6g}")
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_value(x)) for k, x in v.items()))
    return v


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon_value(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return sorted(cols), out


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
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"okNR {name}: rows={len(srows)} (no oracle — rows-only check)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sc, sr = canon_rows(scols, srows)
        oc, orr = canon_rows(ocols, orows)
        if sc != oc:
            failures.append(name)
            print(f"FAIL {name}: schema mismatch spark={sc} duckdb={oc}")
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
