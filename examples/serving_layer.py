"""Serving layer, end to end: CDC merges + maintained rollups + sketches.

    python examples/serving_layer.py [sf_dir]

The nightly/continuous loop a 100 TB deployment runs to keep dashboards
off the fact table:
1. CDC upsert       — `keyed_upsert_sink`: micro-batches merge into a
                      bucketed keyed store (latest-per-key), touched
                      buckets only, inline compaction
2. rollup           — `rollup_maintenance_sink`: per-batch refresh of the
                      daily (measurement, field) rollup, touched
                      (bucket, date) partitions only
3. query rewrite    — `CerebroClient.register_rollup`: day-aligned
                      aggregateWindow queries served from the rollup
4. distinct sketches— `distinct_sketch_rollup` + `distinct_over_range`:
                      "distinct users over any range" from per-day HLL
                      sketches, no raw scan
5. online dedup     — `neardup_filter_sink` (round 4): document batches
                      filtered against the growing LSH index; the same
                      index serves `query_lsh_index` online lookups
"""

import datetime as dt
import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cerebro_spark.io import load_table, store_health
from cerebro_spark.operators.pivot import unpivot_to_points
from cerebro_spark.operators.rollup import rollup_maintenance_sink
from cerebro_spark.operators.tsdb import (
    distinct_over_range,
    distinct_sketch_rollup,
)
from cerebro_spark.plans.client import CerebroClient
from cerebro_spark.session import get_spark
from cerebro_spark.streaming.sinks import keyed_upsert_sink

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("serving-layer-example")
    tmp = tempfile.mkdtemp(prefix="serving_")
    ev = load_table(spark, "events", SF_DIR)

    # --- 1. CDC upsert: latest value per user merged across two batches
    latest_store = f"{tmp}/latest"
    sink = keyed_upsert_sink(latest_store, key_cols=["user_id"], ts_col="ts")
    half = ev.approxQuantile("event_id", [0.5], 0.0)[0]
    sink(ev.filter(F.col("event_id") <= half), 0)
    sink(ev.filter(F.col("event_id") > half), 1)
    n_keys = spark.read.parquet(latest_store).count()
    print(f"latest-per-user store:  {n_keys} keys")

    # --- 2. rollup maintenance over the canonical point stream
    pts = unpivot_to_points(
        ev, measurement="events", time_col="ts",
        value_cols=["value"], bucket="serving",
    )
    store, roll = f"{tmp}/points", f"{tmp}/rollup"
    rsink = rollup_maintenance_sink(store, roll)
    rsink(pts, 0)
    print(f"rollup rows:            {spark.read.parquet(roll).count()}")

    # --- 3. day-aligned query served FROM the rollup (inputFiles proves it)
    client = CerebroClient(spark, {"serving": store},
                           now=dt.datetime(2024, 2, 1))
    client.register_rollup("serving", roll)
    wide = client.query(
        "serving", "events", "value",
        start="2024-01-01", end="2024-01-08",
        aggregate_window=(86400, "avg"),
    )
    src = "rollup" if all("rollup" in f for f in wide.inputFiles()) else "raw"
    print(f"daily avg (7 rows via {src}):")
    wide.orderBy("time").show(3, truncate=False)

    # --- 4. distinct users over an arbitrary range, from sketches only
    sketches = distinct_sketch_rollup(ev, "user_id")
    est = distinct_over_range(
        sketches, dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 20)
    ).collect()[0]
    print(f"distinct users Jan 5-20: ~{est['approx_distinct']:.0f} "
          f"(from {sketches.count()} daily sketches)")

    # --- 5. online near-dup filter over a growing LSH index
    from cerebro_spark.operators.dedup import query_lsh_index
    from cerebro_spark.streaming.sinks import neardup_filter_sink

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    ndx, clean = f"{tmp}/nd_index", f"{tmp}/clean_docs"
    nd = neardup_filter_sink(ndx, clean, n=3, num_hashes=8, bands=4,
                             threshold=0.5)
    half_doc = docs.approxQuantile("doc_id", [0.5], 0.0)[0]
    nd(docs.filter(F.col("doc_id") <= half_doc), 0)
    nd(docs.filter(F.col("doc_id") > half_doc), 1)   # dedups vs batch 0
    n_clean = spark.read.parquet(clean).count()
    probe = docs.limit(3)
    n_hits = query_lsh_index(spark, ndx, probe, n=3, num_hashes=8,
                             bands=4, threshold=0.5).count()
    print(f"online-dedup store:     {n_clean}/{docs.count()} docs kept; "
          f"3-probe lookup -> {n_hits} matches")

    # --- ops: is the store healthy?
    store_health(spark, store).show(3, truncate=False)


if __name__ == "__main__":
    main()
