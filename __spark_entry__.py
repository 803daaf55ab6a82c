"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check on sf0.001.
queries()      — one callable per implemented operator (SURVEY.md §2).
oracle_sql()   — DuckDB-equivalent SQL per query key.

Timestamp note: events.ts is parquet TIMESTAMP(NANOS); Spark reads it
via nanosAsLong + integer division to micros (fossil_spark.session
.read_table) — the same floor truncation DuckDB applies when casting
TIMESTAMP_NS to TIMESTAMP, so oracles cast ts accordingly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from fossil_spark.store import FIXED_NOW, events_store_view

# Deterministic ~now for FQL queries; events span Jan 2024.
NOW = FIXED_NOW

# DuckDB view of the fossil store contract over the events table.
# (ts::TIMESTAMP truncates ns -> us exactly like the Spark-side read.)
_STORE_SQL = (
    "SELECT CAST(ts AS TIMESTAMP) AS time, "
    "'/events/' || event_type AS topic, value FROM events"
)


def _fql_query(text: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from fossil_spark.fql import fql

        return fql(events_store_view(spark, sf_dir), text, now=NOW)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the canonical fossil average pipeline
    (docs/pipelines.md) over the events store at sf0.001."""
    from fossil_spark.fql import fql

    store = events_store_view(spark, "/root/testdata/sf0.001")
    return fql(
        store,
        "all in /events since ~now - @day * 31 "
        "| map x -> 1, x "
        "| reduce a, b -> a[0] + b[0], a[1] + b[1] "
        "| map count, sum -> sum / count",
        now=NOW,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- A. FQL parity -------------------------------------------------
        "fql_all": _fql_query("all"),
        "fql_topic": _fql_query("all in /events/click"),
        "fql_topic_prefix": _fql_query("all in /events/s"),
        "fql_since": _fql_query("all since ~(2024-01-15T00:00:00Z)"),
        "fql_before": _fql_query("all before ~(2024-01-10T00:00:00Z)"),
        "fql_between": _fql_query(
            "all between ~(2024-01-10T00:00:00Z), ~(2024-01-20T00:00:00Z)"
        ),
        "fql_time_arith": _fql_query("all since ~now - @day * 7 - @hour * 12"),
        "fql_sample": _fql_query("sample(@hour) in /events"),
        "fql_filter": _fql_query("all | filter x -> x > 50"),
        "fql_map": _fql_query("all | map F -> 5/9 * (F-32)"),
        "fql_map_composite": _fql_query(
            'all | map x -> "doubled": x * 2, "orig": x'
        ),
        "fql_filter_mapped_tuple": _fql_query(
            "all | map x -> x, x * 2 | filter a, b -> b > 100"
        ),
        "fql_reduce_sum": _fql_query("all | reduce a, b -> a + b"),
        "fql_reduce_count": _fql_query("all | map e -> 1 | reduce x, y -> x + y"),
        "fql_builtin_minmax": _fql_query(
            "all | reduce a, b -> max((a, b)), min((a, b))"
        ),
        "fql_mapreduce_avg": _fql_query(
            "all | map x -> 1, x | reduce a, b -> a[0] + b[0], a[1] + b[1] "
            "| map count, sum -> sum / count"
        ),
    }


def oracle_sql() -> dict[str, str]:
    s = f"({_STORE_SQL})"
    return {
        "fql_all": f"SELECT * FROM {s} t",
        "fql_topic": f"SELECT * FROM {s} t WHERE topic LIKE '/events/click%'",
        "fql_topic_prefix": f"SELECT * FROM {s} t WHERE topic LIKE '/events/s%'",
        "fql_since": (
            f"SELECT * FROM {s} t WHERE time >= TIMESTAMP '2024-01-15 00:00:00'"
            " AND time <= TIMESTAMP '2024-02-01 00:00:00'"
        ),
        "fql_before": f"SELECT * FROM {s} t WHERE time <= TIMESTAMP '2024-01-10 00:00:00'",
        "fql_between": (
            f"SELECT * FROM {s} t WHERE time >= TIMESTAMP '2024-01-10 00:00:00'"
            " AND time <= TIMESTAMP '2024-01-20 00:00:00'"
        ),
        # grammar: whence "-" time-quantity, and the quantity itself is
        # (@day*7 - @hour*12) = 6.5 days — the sign applies once
        "fql_time_arith": (
            f"SELECT * FROM {s} t WHERE time >= TIMESTAMP '2024-02-01 00:00:00'"
            " - (INTERVAL 7 DAY - INTERVAL 12 HOUR)"
            " AND time <= TIMESTAMP '2024-02-01 00:00:00'"
        ),
        "fql_sample": (
            "SELECT time, topic, value FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY floor(epoch(time)/3600.0)"
            f" ORDER BY time, topic) AS rn FROM {s} t"
            " WHERE topic LIKE '/events%') WHERE rn = 1"
        ),
        "fql_filter": f"SELECT * FROM {s} t WHERE value > 50",
        "fql_map": f"SELECT time, topic, 5.0/9.0 * (value - 32) AS value FROM {s} t",
        "fql_map_composite": (
            f"SELECT time, topic, value * 2 AS doubled, value AS orig FROM {s} t"
        ),
        "fql_filter_mapped_tuple": (
            f"SELECT time, topic, value AS v0, value * 2 AS v1 FROM {s} t"
            " WHERE value * 2 > 100"
        ),
        # FQL float sums accumulate in decimal(30,8) for order-independent
        # reproducibility (see fql/compiler.py:_make_agg); mirror that here.
        "fql_reduce_sum": (
            f"SELECT CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS value FROM {s} t"
        ),
        "fql_reduce_count": f"SELECT count(*) AS value FROM {s} t",
        "fql_builtin_minmax": f"SELECT max(value) AS v0, min(value) AS v1 FROM {s} t",
        "fql_mapreduce_avg": (
            f"SELECT CAST(sum(CAST(value AS DECIMAL(30,8))) AS DOUBLE) / count(*) AS value "
            f"FROM {s} t"
        ),
    }
