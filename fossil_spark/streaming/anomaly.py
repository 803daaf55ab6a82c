"""Streaming anomaly alerts against a batch-computed baseline.

The classic lambda shape for live monitoring on a time-series store
(the streaming dual of operators.timeseries.anomaly_mad / zscore):
historical data fixes a per-key (mean, std) baseline BATCH-side —
exact, decimal-accumulated, auditable — and the live stream raises an
alert whenever a watermarked window's mean deviates more than
`threshold` sigmas from it. Stream state is bounded by the watermark
(one open window per key); the baseline joins broadcast, so the
stream side never shuffles beyond its windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def baseline_stats(
    df: DataFrame,
    key_col: str = "topic",
    value_col: str = "value",
) -> DataFrame:
    """Per-key (n, mean, std) from history. Decimal-accumulated sums
    (partition-order independent); population std via E[x^2] - E[x]^2
    computed from exact sums, one double sqrt at the end. Keys with a
    degenerate (zero-variance) history get std = 0 and will alert on
    ANY deviation — intentional for constant counters."""
    s1 = F.round(F.sum(F.col(value_col).cast("decimal(30,8)")), 4).cast("double")
    s2 = F.round(
        F.sum((F.col(value_col) * F.col(value_col)).cast("decimal(38,8)")), 4
    ).cast("double")
    n = F.count(value_col)
    mean = s1 / n
    var = F.greatest(s2 / n - mean * mean, F.lit(0.0))
    return df.groupBy(key_col).agg(
        n.alias("n_history"),
        mean.alias("base_mean"),
        F.sqrt(var).alias("base_std"),
    )


def anomaly_replay(
    live: DataFrame,
    baseline: DataFrame,
    threshold: float = 3.5,
    every: str = "1 hour",
    time_col: str = "time",
    key_col: str = "topic",
    value_col: str = "value",
) -> DataFrame:
    """Batch replay of [[streaming_anomaly]] — literally the same
    function run on a static DataFrame (`withWatermark` is a no-op on
    batch input, so the windowed aggregation, broadcast baseline join,
    and sigma scoring execute the identical plan the stream runs).
    Stronger than a shared kernel: there is no second code path to
    drift. This is the twin that gives the streaming monitor's
    arithmetic a full SQL oracle (the streaming_cusum_replay
    pattern). Returns one alert row per (window, key) whose mean
    deviates more than `threshold` baseline sigmas."""
    assert not live.isStreaming, "replay takes the static drain"
    return streaming_anomaly(
        live, baseline, threshold, every, "0 seconds",
        time_col, key_col, value_col,
    )


def streaming_anomaly(
    stream: DataFrame,
    baseline: DataFrame,
    threshold: float = 3.5,
    every: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "time",
    key_col: str = "topic",
    value_col: str = "value",
) -> DataFrame:
    """Alert rows (bucket, key, n, window_mean, base_mean, base_std,
    deviation_sigmas) for every finalized window whose mean sits more
    than `threshold` baseline sigmas away. Use output mode `append`
    (watermark closes windows) and write to any sink; `baseline` is a
    static DataFrame (join broadcasts it). Windows for keys with no
    baseline are dropped — an unknown key has no 'normal'."""
    agg = (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), every), key_col)
        .agg(
            F.count("*").alias("n"),
            (
                F.round(F.sum(F.col(value_col).cast("decimal(30,8)")), 4)
                .cast("double") / F.count(value_col)
            ).alias("window_mean"),
        )
        .select(
            F.col("window").start.alias("bucket"), key_col, "n", "window_mean"
        )
    )
    dev = F.when(
        F.col("base_std") > 0,
        F.abs(F.col("window_mean") - F.col("base_mean")) / F.col("base_std"),
    ).otherwise(
        F.when(F.col("window_mean") == F.col("base_mean"), F.lit(0.0)).otherwise(
            F.lit(float("inf"))
        )
    )
    return (
        agg.join(F.broadcast(baseline), key_col)
        .withColumn("deviation_sigmas", dev)
        .filter(F.col("deviation_sigmas") > threshold)
    )
