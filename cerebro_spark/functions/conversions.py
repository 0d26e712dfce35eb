"""Unit conversions (SURVEY T13, T18) as pure Column expressions.

Everything here stays JVM-side (whole-stage codegen) — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fahrenheit_to_celsius(col: Column) -> Column:
    """T13 — °F→°C (reference `tools.py:236`: ``(temperature - 32) * 5/9``)."""
    return (col - F.lit(32.0)) * F.lit(5.0) / F.lit(9.0)


def dew_point(temp_c: Column, relative_humidity: Column) -> Column:
    """T18 — dew-point approximation (reference `tools.py:274-278`:
    ``temperature - round((100 - relative_humidity) / 5, 2)``)."""
    return temp_c - F.round((F.lit(100.0) - relative_humidity) / F.lit(5.0), 2)


def volts_to_torr(volts: Column, slope: float = 2.0, intercept: float = -10.0) -> Column:
    """T13 — ion-pump volts→Torr log-linear calibration (reference
    `lvm.py:549-560`: ``10 ** (slope * v + intercept)`` Pa → Torr via
    ``* 0.00750062``)."""
    return F.pow(F.lit(10.0), volts * F.lit(slope) + F.lit(intercept)) * F.lit(0.00750062)
