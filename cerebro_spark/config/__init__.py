from cerebro_spark.config.loader import (  # noqa: F401
    IngestRunner,
    load_config,
    resolve_profile,
)
