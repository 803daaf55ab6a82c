#!/usr/bin/env python
"""Streaming throughput probe (VERDICT r5 ask #6): measured numbers
for the two streaming paths that previously had only correctness
tests.

1. Ingest -> store: a JSON drop-box of N rows lands in the
   date-partitioned parquet store via write_to_store (availableNow,
   checkpointed). Reported as end-to-end rows/sec at two input sizes.
2. Sustained windowed rollup: the `rate` source at R rows/sec feeds
   windowed_rollup (watermarked state); the query runs ~24 s and the
   StreamingQueryProgress stream reports per-batch latency +
   processed rows/sec at two input rates.

Prints a markdown table for PERFORMANCE.md.

Usage: python scripts/streaming_probe.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def ingest_probe(spark, n_rows: int) -> tuple[float, float]:
    from fossil_spark.streaming.ingest import read_json_dropbox, write_to_store

    work = os.path.join("build", f"stream_probe_{uuid.uuid4().hex[:8]}")
    src = os.path.join(work, "dropbox")
    store = os.path.join(work, "store")
    ck = os.path.join(work, "ck")
    try:
        (
            spark.range(n_rows)
            .select(
                (F.timestamp_seconds(F.lit(1704067200) + F.col("id") % 86400))
                .alias("time"),
                F.concat(F.lit("/events/t"), F.col("id") % 50).alias("topic"),
                F.format_number(F.col("id") % 1000 / 7.0, 4).alias("value"),
            )
            .repartition(32)
            .write.json(src)
        )
        t0 = time.perf_counter()
        q = write_to_store(
            read_json_dropbox(spark, src), store, ck,
            trigger_available_now=True,
        )
        q.awaitTermination(600)
        dt = time.perf_counter() - t0
        landed = spark.read.parquet(store).count()
        assert landed == n_rows, (landed, n_rows)
        return dt, n_rows / dt
    finally:
        shutil.rmtree(work, ignore_errors=True)


def rollup_probe(spark, rate: int, seconds: float = 24.0) -> dict:
    from fossil_spark.streaming.rollup import windowed_rollup

    stream = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rate)
        .option("numPartitions", 8)
        .load()
        .select(
            F.col("timestamp").alias("time"),
            F.concat(F.lit("/t"), F.col("value") % 50).alias("topic"),
            (F.col("value") % 1000 / 7.0).alias("value"),
        )
    )
    rolled = windowed_rollup(stream, every="1 minute", watermark="2 minutes")
    name = f"rollup_{uuid.uuid4().hex[:8]}"
    q = (
        rolled.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
    )
    try:
        time.sleep(seconds)
        prog = [p for p in q.recentProgress if p["numInputRows"] > 0]
        lat = sorted(p["durationMs"]["triggerExecution"] for p in prog)
        rps = [p["processedRowsPerSecond"] for p in prog]
        return {
            "batches": len(prog),
            "p50_ms": lat[len(lat) // 2] if lat else None,
            "max_ms": lat[-1] if lat else None,
            "mean_processed_rps": sum(rps) / len(rps) if rps else 0.0,
        }
    finally:
        q.stop()


def main() -> None:
    from fossil_spark.session import get_spark

    spark = get_spark("fossil_spark-streaming-probe")
    spark.sparkContext.setLogLevel("ERROR")

    print("| probe | input | wall s | rows/sec |")
    print("|---|---|---|---|")
    for n in (200_000, 1_000_000):
        dt, rps = ingest_probe(spark, n)
        print(f"| ingest->store (json dropbox, availableNow) | {n:,} rows "
              f"| {dt:.1f} | {rps:,.0f} |")

    print()
    print("| probe | input rate | batches | p50 batch ms | max batch ms "
          "| processed rows/s |")
    print("|---|---|---|---|---|---|")
    for rate in (10_000, 100_000):
        r = rollup_probe(spark, rate)
        print(f"| windowed_rollup (1 min windows, update) | {rate:,}/s "
              f"| {r['batches']} | {r['p50_ms']} | {r['max_ms']} "
              f"| {r['mean_processed_rps']:,.0f} |")


if __name__ == "__main__":
    main()
