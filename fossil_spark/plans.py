"""Plan-shaping utilities for hostile data distributions.

AQE's skew-join splitting handles most skew automatically (enabled in
session.py); these helpers cover the cases it can't:

- salted_join: shuffle-key salting for joins where ONE side has a few
  pathological hot keys (AQE splits partitions, but a single hot KEY
  still lands in one task without salting).
- partitioned_write: bucketed layout so repeated co-located joins on
  the same key skip their shuffle entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with key salting: the big side gets a random-but-
    deterministic salt (hash of all columns mod `salt`), the small
    side is replicated `salt` ways, and the join key becomes
    (key, salt). A hot key now spreads across `salt` tasks.

    Use when one join key holds >~1/parallelism of the rows. Cost:
    the small side is duplicated `salt`×, so keep it broadcastable."""
    big_cols = big.columns
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big_cols]), F.lit(salt))
    )
    salted_small = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(salt).select(F.col("id").cast("int").alias("__salt"))
        )
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")


def partitioned_write(
    df: DataFrame,
    path: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Write hash-clustered files: rows are repartitioned by the join/
    agg key (and optionally sorted within files), so downstream
    readers get co-located keys — repeated joins/aggs on `bucket_col`
    then shuffle far less, and min/max stats make key-range row-group
    skipping effective."""
    out = df.repartition(n_buckets, F.col(bucket_col))
    if sort_col is not None:
        out = out.sortWithinPartitions(bucket_col, sort_col)
    out.write.mode("overwrite").parquet(path)
