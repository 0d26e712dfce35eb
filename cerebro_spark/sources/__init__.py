from cerebro_spark.sources.poll import (  # noqa: F401
    ExponentialBackoff,
    PollDataSource,
    register_poll_fn,
)
