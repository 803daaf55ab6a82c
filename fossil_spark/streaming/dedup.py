"""Dedup-at-ingest for streaming corpora.

The batch dedup operators (operators/dedup.py) assume the corpus is
at rest; a training-data firehose wants duplicates dropped BEFORE
they land. Two tiers:

- streaming_exact_dedup: dropDuplicatesWithinWatermark on the
  md5(normalized text) hash — Spark keeps one state entry per hash
  only within the watermark horizon, so state is bounded by the
  duplicate-arrival window, not corpus size. The right default: at
  100 TB/day the unbounded variant's state store would grow without
  limit.
- streaming_exact_dedup_global: plain dropDuplicates for bounded
  backfills where the whole replay must be globally unique
  (state grows with distinct keys — document the cost, don't hide
  it).

Both emit the original columns plus the hash, so a downstream
at-rest pass can cheaply re-verify (end-to-end exactly-once dedup is
ALWAYS ingest-window dedup + periodic at-rest compaction; reference
behavior: fossil's append path accepts duplicates and relies on
queries to dedup, pkg/database/db.go:486 — we strengthen that).
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_hash(stream: DataFrame, text_col: str) -> DataFrame:
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return stream.withColumn("text_hash", F.md5(norm))


def streaming_exact_dedup(
    stream: DataFrame,
    watermark_delay: timedelta,
    time_col: str = "time",
    text_col: str = "text",
) -> DataFrame:
    """Bounded-state streaming dedup: a duplicate arriving within
    `watermark_delay` of the original is dropped; state entries
    expire with the watermark."""
    delay = f"{int(watermark_delay.total_seconds())} seconds"
    return (
        _with_hash(stream, text_col)
        .withWatermark(time_col, delay)
        .dropDuplicatesWithinWatermark(["text_hash"])
    )


def streaming_exact_dedup_global(
    stream: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Globally-unique variant for bounded replays. State = one entry
    per distinct hash for the lifetime of the query — use only when
    the input is finite."""
    return _with_hash(stream, text_col).dropDuplicates(["text_hash"])
