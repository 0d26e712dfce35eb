"""cerebro_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of sdss/cerebro.

The reference (`/root/reference/`) is a streaming telemetry ETL daemon built on
asyncio + RxPY with a Polars batch layer (`cerebro/tools.py`) and a Flux query
client (`cerebro/client.py`).  This package re-expresses that surface
Spark-first:

- ``cerebro_spark.schema``     — the canonical point model (SURVEY §1.4)
- ``cerebro_spark.operators``  — batch transforms (SURVEY §2.3) + driver-mandated
  extension operators (dedup / similarity / text / multimodal)
- ``cerebro_spark.functions``  — parsers and unit conversions (pure Column fns)
- ``cerebro_spark.plans``      — the query layer (CerebroClient parity, §2.4)
- ``cerebro_spark.sources``    — batch loaders + streaming replay sources (§2.1)
- ``cerebro_spark.streaming``  — canonical point stream, enrichment, sinks (§3.1)
- ``cerebro_spark.config``     — YAML profile loader (C2 parity)
"""

from cerebro_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
