"""Watermarked stream-stream joins.

The canonical correlation shape: match events from two live topics
within a bounded time window (click→purchase attribution, request→
error correlation). Both sides carry watermarks so the state store
can evict rows once no counterpart can arrive — without the time
bound, stream-stream join state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    left_time: str = "time",
    right_time: str = "time",
    how: str = "inner",
) -> DataFrame:
    """Join two streams on a key where the right event lands within
    [left_time, left_time + within]. State is bounded by the
    watermarks plus the interval — the planner derives eviction from
    the time-range predicate."""
    l = left.withWatermark(left_time, watermark).alias("l")
    r = right.withWatermark(right_time, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_time}") >= F.col(f"l.{left_time}"))
        & (F.col(f"r.{right_time}") <= F.col(f"l.{left_time}") + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop(F.col(f"r.{on}"))
