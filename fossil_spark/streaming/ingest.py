"""Streaming ingest into the EventStore.

The reference accepts datum over TCP in fire-and-forget mode
(pkg/server, proto APPEND). The Spark-native shape is a Structured
Streaming job: any supported source (file drop-box, Kafka, socket)
-> normalize to the store contract -> append to the partitioned
parquet store with exactly-once file-sink semantics (checkpointed).

At scale this is the standard landing pattern: many small source
batches, compacted by date partitioning; the checkpoint gives
at-least-once from replayable sources and exactly-once to the sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

INGEST_SCHEMA = "time timestamp, topic string, value string"


def read_json_dropbox(spark: SparkSession, source_dir: str) -> DataFrame:
    """File-source ingest: JSON lines with (time, topic, value)."""
    return spark.readStream.schema(INGEST_SCHEMA).json(source_dir)


def read_socket(spark: SparkSession, host: str, port: int) -> DataFrame:
    """TCP fire-and-forget ingest — the reference's APPEND wire mode
    (pkg/server fire-and-forget clients). Line protocol:

        <topic> <data...>\\n     (topic optional; defaults to "/")

    Arrival time is stamped server-side, like the reference's append
    path. The socket source is not replayable, so this is at-most-once
    (matching fire-and-forget semantics); use the file drop-box or a
    replayable bus for exactly-once."""
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    first = F.split(F.col("value"), " ", 2).getItem(0)
    is_topic = first.startswith("/")
    return raw.select(
        F.current_timestamp().alias("time"),
        F.when(is_topic, first).otherwise(F.lit("/")).alias("topic"),
        F.when(
            is_topic, F.expr("substring(value, length(split(value, ' ', 2)[0]) + 2)")
        )
        .otherwise(F.col("value"))
        .alias("value"),
    )


def write_to_store(
    stream: DataFrame,
    store_root: str,
    checkpoint_dir: str,
    trigger_available_now: bool = False,
) -> StreamingQuery:
    """Append a store-contract stream to the parquet event store.
    Date partitioning keeps time-predicate pruning working for data
    landed by streaming, same as batch appends."""
    out = stream.withColumn("date", F.to_date("time"))
    writer = (
        out.writeStream.format("parquet")
        .option("path", store_root)
        .option("checkpointLocation", checkpoint_dir)
        .partitionBy("date")
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
