"""Live windowed rollups over a store-contract stream.

Watermarked tumbling-window aggregation — the streaming dual of
operators.timeseries.resample. Late data within the watermark is
folded into the right bucket; output mode `update` emits revisions,
`append` emits finalized windows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_replay(
    live: DataFrame,
    every: str = "1 hour",
    time_col: str = "time",
    key_col: str = "topic",
    value_col: str = "value",
) -> DataFrame:
    """Batch replay of [[windowed_rollup]] — the same function on a
    static drain (`withWatermark` is a no-op on batch input), so the
    tumbling-window grouping and decimal-accumulated mean execute the
    identical plan the stream runs. This gives the live rollup (B7)
    a full SQL oracle (the streaming_cusum_replay pattern)."""
    assert not live.isStreaming, "replay takes the static drain"
    return windowed_rollup(
        live, every, "0 seconds", time_col, key_col, value_col
    )


def windowed_rollup(
    stream: DataFrame,
    every: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "time",
    key_col: str = "topic",
    value_col: str = "value",
) -> DataFrame:
    """Counts + decimal-accumulated mean per (window, key). The state
    store holds one row per open window per key; the watermark bounds
    state size — mandatory for an unbounded stream."""
    return (
        stream.withWatermark(time_col, watermark)
        # group by the window() struct — grouping by .start severs the
        # event-time/watermark linkage and append mode throws
        # STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION; project .start
        # only after the aggregation
        .groupBy(F.window(F.col(time_col), every), key_col)
        .agg(
            F.count("*").alias("n"),
            (
                F.round(F.sum(F.col(value_col).cast("decimal(30,8)")), 4).cast("double")
                / F.count(value_col)
            ).alias("avg_value"),
        )
        .select(
            F.col("window").start.alias("bucket"), key_col, "n", "avg_value"
        )
    )
