"""Hive-style bucketed layouts for shuffle-free co-located joins.

The EventStore's date partitioning prunes on TIME; bucketing solves
the other recurring cost at 100 TB: every user/entity-keyed join or
aggregation re-shuffling the fact table. Writing both sides
`bucketBy(N, key)` pins rows to deterministic buckets ON DISK, so a
join of two tables bucketed the same way is planned WITHOUT any
Exchange — each task zips bucket i with bucket i — and a groupBy on
the bucket key skips its shuffle the same way. This is the
"repartition()/bucketing for co-located joins" leg of the scale
story: pay the shuffle once at write time, never at read time.

Bucketed tables must go through the session catalog (`saveAsTable`
with an explicit external path) because the bucket spec lives in
table metadata, not in the parquet files; `spark.read.parquet` on
the same files would NOT know the layout. Pick N buckets so one
bucket of the biggest table fits an executor core's working set
(~128-512 MB compressed); both join sides must use the SAME N and
key. Plan property asserted in tests/test_bucketing.py: no Exchange
above either scan of a bucketed-bucketed equi-join, no Exchange
under a bucket-key aggregation, and bitwise-equal results vs the
shuffled plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)*$")


def _check_table_ident(table: str) -> str:
    """Reject identifiers that would break (or inject into) catalog
    SQL; saveAsTable takes the validated name directly."""
    if not _IDENT.match(table):
        raise ValueError(
            f"invalid table identifier {table!r}: use "
            "[A-Za-z_][A-Za-z0-9_]* parts separated by dots"
        )
    return table


def save_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    key: str | list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write `df` as an external parquet table bucketed by `key` into
    `n_buckets` files per partition, registered as `table` in the
    session catalog. `sort_cols` additionally sorts within each
    bucket file (turns the co-located join's sort into a no-op and
    keeps min/max footer stats tight)."""
    _check_table_ident(table)
    keys = [key] if isinstance(key, str) else list(key)
    w = (
        df.write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *keys)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    # mode("overwrite") replaces the catalog entry atomically enough
    # for our purposes; an explicit pre-DROP left the table GONE when
    # the subsequent write failed (and interpolated the name into raw
    # SQL). Regression: test_save_bucketed_overwrite_and_identifiers.
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table THROUGH THE CATALOG (the bucket spec is
    catalog metadata; a path read would silently lose it and
    re-shuffle)."""
    return spark.table(table)
