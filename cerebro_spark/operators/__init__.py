from cerebro_spark.operators.timeops import (  # noqa: F401
    cast_ts,
    dedup_by_time,
    filter_time_range,
    relative_range,
    rolling_by_time,
    stale_filter,
)
from cerebro_spark.operators.weather import lco_weather_pipeline  # noqa: F401
from cerebro_spark.operators.pivot import pivot_fields, unpivot_to_points  # noqa: F401
