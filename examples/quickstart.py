"""Quickstart: the full cerebro-spark loop in one script.

    python examples/quickstart.py [sf_dir]

1. batch chain: weather-shaped data → transform pipeline (rolling windows,
   dew point) → canonical points → partitioned store;
2. query layer: CerebroClient range/field/pivot + aggregateWindow;
3. extensions: dedup + text profile over the documents table.
"""

import sys
import tempfile

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from cerebro_spark.io import load_table
from cerebro_spark.operators.dedup import exact_dedup
from cerebro_spark.operators.pivot import unpivot_to_points
from cerebro_spark.operators.text import text_profile
from cerebro_spark.operators.tsdb import derivative
from cerebro_spark.plans.client import CerebroClient
from cerebro_spark.session import get_spark
from cerebro_spark.streaming.sinks import parquet_point_sink

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark("quickstart")

# -- 1. batch transform → point store ---------------------------------------
events = load_table(spark, "events", sf_dir)
with_rate = derivative(events, "value", "ts", partition_by=["user_id"])
points = unpivot_to_points(
    with_rate.select("ts", "value", "derivative"),
    measurement="events",
    time_col="ts",
    tags={"source": "quickstart"},
    bucket="telemetry",
)
store = tempfile.mkdtemp(prefix="cerebro_store_")
parquet_point_sink(points, store)
print(f"stored {spark.read.parquet(store).count()} points → {store}")

# -- 2. query layer ----------------------------------------------------------
client = CerebroClient(spark, {"telemetry": spark.read.parquet(store)})
wide = client.query(
    "telemetry", "events", field="value",
    start="2024-01-01", end="2024-02-01",
)
print("client.query →")
wide.show(5, truncate=False)

hourly = client.query(
    "telemetry", "events", field="value",
    start="2024-01-01", end="2024-02-01",
    aggregate_window=(3600, "avg"),
)
print(f"aggregateWindow(1h) → {hourly.count()} buckets")

# -- 3. extension operators --------------------------------------------------
docs = load_table(spark, "documents", sf_dir)
print(f"documents: {docs.count()} → unique: {exact_dedup(docs).count()}")
text_profile(docs).select(
    "doc_id", "n_tokens", "quality", "lang_pred"
).show(5)
