"""Live heavy-hitters (top-k keys per window) over a stream.

The streaming dual of operators.timeseries.topk: per watermarked
tumbling window, count events per key and keep the k largest — the
"what is suddenly dominating ingest" monitor (hot topic, runaway
client, spam burst).

Structured Streaming cannot run a rank window inside a streaming
aggregation, so the top-k cut happens per OUTPUT BATCH via
foreachBatch-style post-processing or, as here, by emitting the full
per-(window, key) counts — state is bounded by the watermark horizon
times the live key cardinality, the same envelope as windowed_rollup
— and cutting to k in the sink batch (a |keys|-bounded sort per
window, never a corpus sort). `topk_batch` is that cut, usable both
in foreachBatch and on any static counts table."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def windowed_key_counts(
    stream: DataFrame,
    every: str = "1 minute",
    watermark: str = "2 minutes",
    time_col: str = "time",
    key_col: str = "topic",
) -> DataFrame:
    """Watermarked per-(window, key) event counts — the streaming
    aggregation half. State: one row per open window per live key,
    bounded by the watermark."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), every), key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window").start.alias("bucket"), key_col, "n")
    )


def heavy_hitters_replay(
    live: DataFrame,
    k: int = 5,
    every: str = "1 minute",
    time_col: str = "time",
    key_col: str = "topic",
) -> DataFrame:
    """Batch replay of the streaming heavy-hitters pair — the SAME
    windowed_key_counts aggregation on static input (`withWatermark`
    is a no-op on batch) followed by the SAME topk_batch cut the
    foreachBatch sink applies. No twin kernel, no drift: the plan is
    the one the stream runs, so the full pipeline gets a SQL oracle
    (the streaming_cusum_replay pattern). Returns (bucket, key, n,
    rank) for the k largest keys per window."""
    assert not live.isStreaming, "replay takes the static drain"
    return topk_batch(
        windowed_key_counts(live, every, "0 seconds", time_col, key_col),
        k, key_col,
    )


def topk_batch(counts: DataFrame, k: int, key_col: str = "topic") -> DataFrame:
    """Rank cut for the sink side (foreachBatch) or any static counts
    table: top-k keys per bucket, ties broken on the key for
    determinism. WindowGroupLimit keeps the sort local per bucket."""
    w = Window.partitionBy("bucket").orderBy(F.col("n").desc(), key_col)
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
