"""Live Apdex scoring over a store-contract stream.

The streaming dual of operators.timeseries.apdex: watermarked
tumbling-window satisfied/tolerating/frustrated counts per key with
the Apdex Alliance score — the "are users happy RIGHT NOW" monitor
(batch apdex answers it for yesterday; this answers it for the
current window). Same state envelope as windowed_rollup: one row per
open window per key, bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apdex_replay(
    live: DataFrame,
    threshold: float,
    every: str = "1 hour",
    time_col: str = "time",
    key_col: str = "topic",
    value_col: str = "value",
) -> DataFrame:
    """Batch replay of [[streaming_apdex]] — the same function on a
    static drain (`withWatermark` is a no-op on batch input): the
    NULL drop, tumbling-window counts, and floor-half-up score are
    the identical plan the stream runs, giving the live Apdex monitor
    a full SQL oracle on top of its existing batch-ts_apdex parity
    (the streaming_cusum_replay pattern)."""
    assert not live.isStreaming, "replay takes the static drain"
    return streaming_apdex(
        live, threshold, every, "0 seconds", time_col, key_col, value_col
    )


def streaming_apdex(
    stream: DataFrame,
    threshold: float,
    every: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "time",
    key_col: str = "topic",
    value_col: str = "value",
) -> DataFrame:
    """Per (window, key): n / n_satisfied / n_tolerating /
    n_frustrated and the floor-half-up Apdex score — identical
    arithmetic to the batch operator so a lambda deployment's live
    and backfill numbers agree bit-for-bit. Append mode emits
    finalized windows only (group by the window() struct; project
    .start after the aggregation — the windowed_rollup rule). NULL
    latencies are dropped before counting, mirroring the batch
    operator (they are "no measurement", not frustration)."""
    v = F.col(value_col)
    agg = (
        stream.filter(v.isNotNull())
        .withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), every), key_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(v <= threshold, 1).otherwise(0))
            .cast("long")
            .alias("n_satisfied"),
            F.sum(
                F.when((v > threshold) & (v <= 4 * threshold), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_tolerating"),
        )
    )
    score = (
        F.col("n_satisfied").cast("double")
        + F.col("n_tolerating").cast("double") / F.lit(2.0)
    ) / F.col("n").cast("double")
    return agg.select(
        F.col("window").start.alias("bucket"),
        key_col,
        "n",
        "n_satisfied",
        "n_tolerating",
        (F.col("n") - F.col("n_satisfied") - F.col("n_tolerating")).alias(
            "n_frustrated"
        ),
        (
            F.floor(score * F.lit(1000000.0) + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias("apdex"),
    )
