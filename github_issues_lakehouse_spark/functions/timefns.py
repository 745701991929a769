"""Time-bucketing Column helpers."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def month_str(ts: Column) -> Column:
    """'YYYY-MM' month key (reference gold.py:16-18
    ``dt.to_period('M').astype(str)``)."""
    return F.date_format(ts, "yyyy-MM")


def tumbling_window(ts: Column, duration: str = "1 hour") -> Column:
    return F.window(ts, duration)


def hour_bucket(ts: Column) -> Column:
    """Truncate to hour as a sortable string key (oracle-friendly)."""
    return F.date_format(F.date_trunc("hour", ts), "yyyy-MM-dd HH:00:00")
