from cerebro_spark.functions.conversions import (  # noqa: F401
    dew_point,
    fahrenheit_to_celsius,
    volts_to_torr,
)
