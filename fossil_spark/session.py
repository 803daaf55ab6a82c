"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for correctness + determinism first (UTC session
timezone so results match the DuckDB oracle bit-for-bit) and for
scale second (AQE on, skew-join handling on, partial aggregation is
implicit in the DataFrame API).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "fossil_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    On a real cluster the master/memory settings come from spark-submit;
    everything set here is safe cluster-side config. Locally we default
    to ``local[$SPARK_GRAFT_CPUS]``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        # Determinism: timestamps must mean the same thing in Spark and
        # in the DuckDB oracle.
        .config("spark.sql.session.timeZone", "UTC")
        # Scale: adaptive execution re-plans shuffles at runtime,
        # coalesces small partitions and splits skewed ones.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for any pandas-UDF path (the only sanctioned Python path).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Broadcast threshold: dims under 32 MB ship to every executor
        # instead of shuffling the fact table.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # The test data's events.ts is parquet TIMESTAMP(NANOS); read as
        # long and convert explicitly (read_table) — Spark has no ns type.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Driver data has also shipped Timestamp(isAdjustedToUTC=false, us),
        # which Spark 4 infers as TIMESTAMP_NTZ — a type unix_micros()/window
        # arithmetic reject. Read it as plain TIMESTAMP (identical instant
        # under the UTC session timezone above).
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # Scan split size: with 100 TB of zstd parquet, 128 MB splits
        # keep one task's working set inside executor memory while
        # saturating the cluster; override per-workload via env.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m"),
        )
    )
    if not SparkSession.getActiveSession():
        builder = builder.master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        # local[N] runs driver + all N executor threads in ONE JVM;
        # Spark's 1g default heap starves 32 concurrent tasks (measured:
        # a broadcast build that is fine per-plan fails with "Not enough
        # memory to build and broadcast" at ~6M lineitem rows). On a
        # real cluster spark-submit owns this; locally, size the JVM
        # like a worker node. Only effective before the JVM starts.
        builder = builder.config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
        )
    return builder.getOrCreate()


def ensure_session_confs(spark: SparkSession) -> None:
    """Make a caller-provided session safe for this engine. The driver
    contract hands us an arbitrary SparkSession; these are runtime-
    settable SQL confs:
    - nanosAsLong: events.parquet has shipped as TIMESTAMP(NANOS),
      unreadable otherwise;
    - inferTimestampNTZ off: events.parquet has also shipped as
      Timestamp(isAdjustedToUTC=false, us), which would otherwise read
      as TIMESTAMP_NTZ and break unix_micros()/window arithmetic;
    - UTC session timezone: timestamps must mean the same instant in
      Spark output and the DuckDB oracle;
    - AQE on (harmless if already set)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")


def read_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one test table, normalizing whatever timestamp layout the
    driver data ships to Spark's TIMESTAMP (µs, session-TZ aware):

    - TIMESTAMP(NANOS) read as long (nanosAsLong): integer division =
      floor, the same truncation DuckDB applies TIMESTAMP_NS→TIMESTAMP;
    - TIMESTAMP_NTZ (if a caller session re-enabled inferTimestampNTZ):
      cast to timestamp — identity on the instant under UTC session TZ.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    for field in df.schema.fields:
        if isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str):
    """Read the standard test tables from a scale-factor directory and
    register them as temp views. Returns a dict of DataFrames."""
    if not names:
        names = (
            "region", "nation", "customer", "supplier", "part",
            "orders", "lineitem", "events", "documents", "embeddings",
        )
    out = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
