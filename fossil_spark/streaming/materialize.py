"""Materialized continuous aggregates ("hypertable rollups").

Raw events stay in the EventStore; dashboards read pre-aggregated
rollup tables. Two build paths:

- build_rollup: batch (re)build, partition-parallel, idempotent
  (dynamic partition overwrite — rebuilding a day replaces exactly
  that day).
- stream_rollup_to_store: continuous upkeep via foreachBatch — each
  micro-batch's finalized windows overwrite their partitions, so the
  rollup table converges to the batch-built answer (stream-batch
  unification: same resample logic both paths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from fossil_spark.operators.timeseries import resample


def _rollup_frame(df: DataFrame, every: str) -> DataFrame:
    out = resample(df, every, "time", ["topic"], "value")
    return out.withColumn("date", F.to_date("bucket"))


def build_rollup(
    spark: SparkSession,
    store_root: str,
    rollup_root: str,
    every: str = "1 hour",
) -> int:
    """(Re)build the rollup table from the raw store. Partition
    overwrite is dynamic: only partitions present in the new result
    are replaced — safe to run for a date subrange."""
    raw = spark.read.parquet(store_root).select(
        "time", "topic", F.col("value").cast("double").alias("value")
    )
    out = _rollup_frame(raw, every)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("date", "bucket")
        .parquet(rollup_root)
    )
    return spark.read.parquet(rollup_root).count()


def stream_rollup_to_store(
    stream: DataFrame,
    rollup_root: str,
    checkpoint_dir: str,
    every: str = "1 hour",
    watermark: str = "2 hours",
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Continuously maintain the rollup table. Append-mode windowed
    aggregation emits each window once its watermark passes; the
    foreachBatch sink overwrites the affected date partitions — an
    idempotent upsert, so replays after failure cannot double-count."""
    # Group by the window() struct itself — grouping by window(...).start
    # severs the event-time column from the watermark and append mode
    # throws STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION. Project .start
    # only after the aggregation.
    agg = (
        stream.select("time", "topic", F.col("value").cast("double").alias("value"))
        .withWatermark("time", watermark)
        .groupBy(F.window("time", every), "topic")
        .agg(
            F.count("*").alias("n"),
            (
                F.round(F.sum(F.col("value").cast("decimal(30,8)")), 4).cast("double")
                / F.count("value")
            ).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .select(
            F.col("window").start.alias("bucket"),
            "topic", "n", "avg_value", "min_value", "max_value",
        )
        .withColumn("date", F.to_date("bucket"))
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        # Overwrite at (date, bucket) leaf granularity: the global
        # watermark finalizes all groups of a window in the same
        # micro-batch, so a batch always holds complete windows and the
        # dynamic overwrite replaces exactly those leaf partitions —
        # idempotent under replay, and it can never clobber sibling
        # windows of the same date materialized by earlier batches.
        if batch_df.isEmpty():
            return
        (
            batch_df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("date", "bucket")
            .parquet(rollup_root)
        )

    writer = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
