"""Z-order clustering soak: file-stat pruning selectivity on both clustered
dimensions vs a linear single-key sort, measured from parquet footers.

Usage: python tools/soak_zorder.py [sf_dir] [target_files]
"""

import glob
import sys
import tempfile
import time

import pyarrow.parquet as pq
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from cerebro_spark.io import load_table, write_zordered  # noqa: E402
from cerebro_spark.session import get_spark  # noqa: E402


def overlap(path, col, lo, hi):
    files = sorted(glob.glob(f"{path}/*.parquet"))
    hit = 0
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        stats = [md.row_group(g).column(idx).statistics for g in range(md.num_row_groups)]
        fmin, fmax = min(s.min for s in stats), max(s.max for s in stats)
        if fmax >= lo and fmin <= hi:
            hit += 1
    return hit, len(files)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    nfiles = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    spark = get_spark("soak-zorder")
    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    n = ev.count()
    with tempfile.TemporaryDirectory() as tmp:
        zpath, lpath = f"{tmp}/z", f"{tmp}/linear"
        t0 = time.time()
        write_zordered(ev, zpath, ["user_id", "value"], target_files=nfiles)
        tz = time.time() - t0
        t0 = time.time()
        (ev.repartitionByRange(nfiles, F.col("user_id"))
           .sortWithinPartitions("user_id").write.mode("overwrite").parquet(lpath))
        tl = time.time() - t0
        s = ev.agg(F.min("value"), F.max("value"), F.min("user_id"), F.max("user_id")).first()
        vs = (s[0], s[0] + (s[1] - s[0]) * 0.05)
        us = (s[2], s[2] + (s[3] - s[2]) * 0.05)
        print(f"rows={n} files={nfiles} zorder_write={tz:.1f}s linear_write={tl:.1f}s")
        for path, tag in ((zpath, "zorder"), (lpath, "linear_by_user")):
            hv, tot = overlap(path, "value", *vs)
            hu, _ = overlap(path, "user_id", *us)
            print(f"{tag}: value-slice files {hv}/{tot}, user-slice files {hu}/{tot}")


if __name__ == "__main__":
    main()
