"""The driver hands entry()/queries() an arbitrary SparkSession —
the engine must self-configure (nanos parquet reads, UTC semantics)
rather than assume fossil_spark.session.get_spark built the session."""

from datetime import datetime

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _hostile_session(spark):
    s2 = spark.newSession()
    s2.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    # round-3 regression: driver parquet with isAdjustedToUTC=false
    # reads as TIMESTAMP_NTZ under this default — the engine must
    # normalize it away
    s2.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    s2.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    return s2


def test_entry_on_vanilla_session(spark):
    df = entry.entry(_hostile_session(spark))
    assert df.count() == 1


def test_queries_on_vanilla_session(spark):
    s2 = _hostile_session(spark)
    qs = entry.queries()
    # includes the store round-trip keys (parquet WRITE path) and a
    # mapInPandas key — the write/read/Arrow paths must also
    # self-configure on a hostile session
    for key in ("fql_all", "fql_since", "ts_resample", "tpch_q1", "dedup_exact",
                "store_list_topics", "store_stats", "multimodal_meta"):
        assert qs[key](s2, SF).count() > 0


def test_timestamps_are_utc_instants(spark):
    s2 = _hostile_session(spark)
    r = entry.queries()["fql_all"](s2, SF).orderBy("time").first()
    # events start 2024-01-01 00:09:58 UTC; an LA-rendered session
    # would show 2023-12-31 16:09
    assert r["time"] >= datetime(2024, 1, 1)


def test_every_query_key_has_runnable_callable(spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for unregistered query"
    # every callable is invocable at the smoke SF and yields a schema
    for key, fn in qs.items():
        df = fn(spark, SF)
        assert df.schema is not None and len(df.columns) > 0, key


def test_dau_approx_tracks_exact(spark):
    # the HLL sketch (rows-only key) must stay within its error bound
    # of the exact count — per-day relative error < 15% at rsd=0.05
    qs = entry.queries()
    sf = "/root/testdata/sf0.01"
    exact = {r["day"]: r["dau"] for r in qs["agg_dau_exact"](spark, sf).collect()}
    approx = {r["day"]: r["dau_approx"]
              for r in qs["agg_dau_approx"](spark, sf).collect()}
    assert set(exact) == set(approx)
    for day, n in exact.items():
        assert abs(approx[day] - n) <= max(2, 0.15 * n), (
            f"{day}: approx {approx[day]} vs exact {n}"
        )
