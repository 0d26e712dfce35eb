from cerebro_spark.streaming.ingest import (  # noqa: F401
    enrich_points,
    replay_file_stream,
    stale_filter_stream,
    union_sources,
)
from cerebro_spark.streaming.sinks import (  # noqa: F401
    fan_out_sink,
    influxdb_writer,
    parquet_point_sink,
)
