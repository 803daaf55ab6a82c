"""FQL compiler semantics vs DuckDB on the events store view."""

from datetime import datetime

import duckdb
import pytest

from fossil_spark.fql import fql
from fossil_spark.store import FIXED_NOW, events_store_view

SF = "/root/testdata/sf0.001"


def ddb(sql: str):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW store AS SELECT ts AS time, '/events/' || event_type AS topic, value "
        f"FROM read_parquet('{SF}/events.parquet')"
    )
    return con.execute(sql).fetchall()


@pytest.fixture(scope="module")
def store(spark):
    return events_store_view(spark, SF)


def test_all(store):
    got = fql(store, "all", now=FIXED_NOW).count()
    (want,) = ddb("SELECT count(*) FROM store")[0]
    assert got == want


def test_topic_prefix(store):
    got = fql(store, "all in /events/cl", now=FIXED_NOW).count()
    (want,) = ddb("SELECT count(*) FROM store WHERE topic LIKE '/events/cl%'")[0]
    assert got == want > 0


def test_since_between(store):
    got = fql(store, "all since ~(2024-01-15T00:00:00Z)", now=FIXED_NOW).count()
    (want,) = ddb("SELECT count(*) FROM store WHERE time >= '2024-01-15'")[0]
    assert got == want > 0

    got = fql(
        store, "all between ~(2024-01-10T00:00:00Z), ~(2024-01-20T00:00:00Z)", now=FIXED_NOW
    ).count()
    (want,) = ddb(
        "SELECT count(*) FROM store WHERE time >= '2024-01-10' AND time <= '2024-01-20'"
    )[0]
    assert got == want > 0


def test_now_relative(store):
    # FIXED_NOW - @week covers the tail of January 2024
    got = fql(store, "all since ~now - @week", now=FIXED_NOW).count()
    (want,) = ddb(
        "SELECT count(*) FROM store WHERE time >= TIMESTAMP '2024-02-01' - INTERVAL 7 DAY"
    )[0]
    assert got == want > 0


def test_filter(store):
    got = fql(store, "all | filter x -> x > 50", now=FIXED_NOW).count()
    (want,) = ddb("SELECT count(*) FROM store WHERE value > 50")[0]
    assert got == want > 0


def test_map_arithmetic(store):
    # fahrenheit → celsius from docs/pipelines.md
    rows = fql(store, "all | map F -> 5/9 * (F-32)", now=FIXED_NOW).collect()
    ddb_rows = ddb("SELECT time, topic, 5.0/9.0 * (value-32) AS value FROM store ORDER BY time")
    got_by_time = {r["time"]: r["value"] for r in rows}
    for t, _, v in ddb_rows:
        assert abs(got_by_time[t.replace(tzinfo=None)] - v) < 1e-9


def test_map_reduce_avg(store):
    # canonical average pipeline from docs/pipelines.md
    df = fql(
        store,
        "all | map x -> 1, x | reduce a, b -> a[0] + b[0], a[1] + b[1] "
        "| map count, sum -> sum / count",
        now=FIXED_NOW,
    )
    got = df.collect()[0]["value"]
    (want,) = ddb("SELECT sum(value)/count(*) FROM store")[0]
    assert abs(got - want) < 1e-9


def test_reduce_count(store):
    df = fql(store, "all since ~now - @day * 31 | map event -> 1 | reduce x, y -> x + y",
             now=FIXED_NOW)
    got = df.collect()[0]["value"]
    (want,) = ddb("SELECT count(*) FROM store")[0]
    assert got == want


def test_reduce_max_min(store):
    df = fql(store, "all | reduce a, b -> max((a, b)), min((a, b))", now=FIXED_NOW)
    row = df.collect()[0]
    want_max, want_min = ddb("SELECT max(value), min(value) FROM store")[0]
    assert row["v0"] == want_max and row["v1"] == want_min


def test_map_composite(store):
    df = fql(store, 'all | map x -> "doubled": x * 2, "orig": x', now=FIXED_NOW)
    assert df.columns == ["time", "topic", "doubled", "orig"]
    r = df.orderBy("time").first()
    assert abs(r["doubled"] - 2 * r["orig"]) < 1e-12


def test_sample_bucket(store):
    df = fql(store, "sample(@hour)", now=FIXED_NOW)
    got = df.count()
    (want,) = ddb(
        "SELECT count(*) FROM (SELECT *, row_number() OVER "
        "(PARTITION BY floor(epoch(time)/3600) ORDER BY time, topic) rn FROM store) WHERE rn=1"
    )[0]
    assert got == want > 0
    # at most one row per hour bucket
    assert got <= 24 * 31


def test_filter_on_mapped_tuple(store):
    df = fql(store, "all | map x -> x, x * 2 | filter a, b -> b > 100", now=FIXED_NOW)
    got = df.count()
    (want,) = ddb("SELECT count(*) FROM store WHERE value * 2 > 100")[0]
    assert got == want > 0


def test_composite_string_equality(spark):
    # parity with the reference's analysis test
    # (analysis/types_test.go: TestTypeCheckerAllowsStringEquality):
    # string equality against a composite field is well-typed
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1), "/dicts", ("id", 1)),
         (datetime(2024, 1, 2), "/dicts", ("other", 2))],
        "time timestamp, topic string, value struct<key:string, value:long>",
    )
    out = fql(df, 'all in /dicts | filter x -> x["key"] == "id"', now=FIXED_NOW)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["value"]["value"] == 1


def test_reduce_fallback_sequential(spark):
    # non-associative reduce folds left in (time, topic) order, matching
    # the reference's stream semantics
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0, i), "/t", float(i)) for i in range(1, 6)],
        "time timestamp, topic string, value double",
    )
    out = fql(df, "all | reduce a, b -> a - b", now=FIXED_NOW)
    assert out.collect()[0]["value"] == ((((1 - 2) - 3) - 4) - 5)
    out2 = fql(df, "all | map x -> x, x | reduce a, b -> a[0] - b[0], a[1] + b[1]",
               now=FIXED_NOW)
    row = out2.collect()[0]
    assert (row["v0"], row["v1"]) == (-13.0, 15.0)


def test_reduce_fallback_warns(spark, caplog):
    import logging

    df = spark.createDataFrame(
        [(datetime(2024, 1, 1), "/t", 1.0), (datetime(2024, 1, 2), "/t", 2.0)],
        "time timestamp, topic string, value double",
    )
    with caplog.at_level(logging.WARNING, logger="fossil_spark"):
        fql(df, "all | reduce a, b -> a - b", now=FIXED_NOW)
    assert any("sequential single-partition fold" in r.message
               for r in caplog.records)
    # the associative path must NOT warn
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="fossil_spark"):
        fql(df, "all | reduce a, b -> a + b", now=FIXED_NOW)
    assert not caplog.records


def test_pipeline_after_reduce(spark):
    # stages keep composing after the fold collapses to a scalar
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0, i), "/t", float(i)) for i in range(1, 5)],
        "time timestamp, topic string, value double",
    )
    out = fql(df, "all | reduce a, b -> a + b | map s -> s * 10", now=FIXED_NOW)
    assert out.collect()[0]["value"] == 100.0
    out2 = fql(df, "all | reduce a, b -> a + b | filter s -> s > 100", now=FIXED_NOW)
    assert out2.collect() == []


def test_reduce_composite_output(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1, 0, 0, i), "/t", float(i)) for i in range(1, 4)],
        "time timestamp, topic string, value double",
    )
    out = fql(df, 'all | reduce a, b -> "total": a + b', now=FIXED_NOW)
    row = out.collect()[0]
    assert out.columns == ["total"] and row["total"] == 6.0


def test_string_len_builtin(spark):
    df = spark.createDataFrame(
        [(datetime(2024, 1, 1), "/logs", "hello"), (datetime(2024, 1, 2), "/logs", "hi")],
        "time timestamp, topic string, value string",
    )
    out = fql(df, "all | map log -> len(log) | reduce a, b -> a + b", now=FIXED_NOW)
    assert out.collect()[0]["value"] == 7
