"""Bucketed co-located joins: the plan property, not just the API.

The 100 TB claim for user-keyed workloads rests on bucketing removing
the per-query fact shuffle; these tests pin that at the plan level
(no Exchange in the bucketed join / aggregation) and at the value
level (identical results to the shuffled plan).
"""

import contextlib
import io
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from fossil_spark.bucketing import read_bucketed, save_bucketed
from fossil_spark.session import read_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark):
    root = os.path.join("build", f"bucketed_{uuid.uuid4().hex[:8]}")
    ev = read_table(spark, SF, "events")
    # per-user dim built from the same stream (the shape a feature
    # join runs every day: fact x per-user aggregate)
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(30,8)")), 4)
        .cast("double")
        .alias("total_value"),
    )
    fact_t = f"ev_bucketed_{uuid.uuid4().hex[:6]}"
    dim_t = f"users_bucketed_{uuid.uuid4().hex[:6]}"
    save_bucketed(ev, fact_t, os.path.join(root, "events"), "user_id", 8,
                  sort_cols=["user_id", "ts"])
    save_bucketed(users, dim_t, os.path.join(root, "users"), "user_id", 8,
                  sort_cols=["user_id"])
    yield fact_t, dim_t, ev, users
    for t in (fact_t, dim_t):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(root, ignore_errors=True)


@contextlib.contextmanager
def _no_broadcast(spark):
    """Disable broadcast joins, restoring whatever the session had
    (a hardcoded restore value silently rewrote session config)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_exchange(spark, bucketed):
    fact_t, dim_t, _, _ = bucketed
    with _no_broadcast(spark):
        j = read_bucketed(spark, fact_t).join(
            read_bucketed(spark, dim_t), "user_id"
        )
        plan = _plan(j)
        assert "Exchange" not in plan, (
            "bucketed-bucketed equi-join must not shuffle:\n" + plan
        )


def test_bucketed_join_matches_shuffled_join(spark, bucketed):
    fact_t, dim_t, ev, users = bucketed
    cols = ["user_id", "event_id", "n_events", "total_value"]
    got = sorted(
        read_bucketed(spark, fact_t)
        .join(read_bucketed(spark, dim_t), "user_id")
        .select(*cols)
        .collect()
    )
    want = sorted(ev.join(users, "user_id").select(*cols).collect())
    assert got == want


def test_bucket_key_aggregation_skips_shuffle(spark, bucketed):
    fact_t, _, _, _ = bucketed
    agg = read_bucketed(spark, fact_t).groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert "Exchange" not in _plan(agg), "bucket-key groupBy must not shuffle"


def test_path_read_loses_bucketing_documented(spark, bucketed):
    """The failure mode the module docstring warns about: reading the
    same parquet files BY PATH drops the bucket spec and the join
    shuffles again. Pinned so the gotcha stays documented-true."""
    fact_t, dim_t, _, _ = bucketed
    path = spark.sql(f"DESCRIBE FORMATTED {fact_t}").filter(
        F.col("col_name") == "Location"
    ).first()["data_type"]
    with _no_broadcast(spark):
        by_path = spark.read.parquet(path.replace("file:", ""))
        j = by_path.join(read_bucketed(spark, dim_t), "user_id")
        assert "Exchange" in _plan(j)


def test_eventstore_save_bucketed_joins_without_exchange(spark):
    """The r9-verdict integration: EventStore.save_bucketed
    materializes the store as a topic-bucketed catalog table, and the
    everyday shape — store fact joined to a per-topic dim, plus a
    per-topic rollup — plans with ZERO read-time Exchange while
    matching the shuffled plan's values."""
    from fossil_spark.store import EventStore, events_store_view

    root = os.path.join("build", f"store_bkt_{uuid.uuid4().hex[:8]}")
    fact_t = f"store_fact_{uuid.uuid4().hex[:6]}"
    dim_t = f"topic_dim_{uuid.uuid4().hex[:6]}"
    store = EventStore(spark, os.path.join(root, "store"))
    ev = events_store_view(spark, SF).limit(4000)
    try:
        store.append(ev)
        store.save_bucketed(fact_t, os.path.join(root, "fact"),
                            key="topic", n_buckets=8)
        dim = store.stats()  # per-topic dim built once
        save_bucketed(dim, dim_t, os.path.join(root, "dim"), "topic", 8,
                      sort_cols=["topic"])
        with _no_broadcast(spark):
            fact = read_bucketed(spark, fact_t)
            j = fact.join(read_bucketed(spark, dim_t), "topic")
            assert "Exchange" not in _plan(j), _plan(j)
            agg = fact.groupBy("topic").agg(F.count(F.lit(1)).alias("n"))
            assert "Exchange" not in _plan(agg), _plan(agg)
            got = sorted(
                j.select("topic", "time", "value", "n").collect()
            )
        want = sorted(
            store.read().join(store.stats(), "topic")
            .select("topic", "time", "value", "n").collect()
        )
        assert got == want
    finally:
        for t in (fact_t, dim_t):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(root, ignore_errors=True)


def test_save_bucketed_overwrite_and_identifiers(spark):
    """mode('overwrite') replaces an existing bucketed table WITHOUT
    the old pre-DROP (which left the catalog entry gone if the write
    then failed), and malformed / injection-shaped table names are
    rejected up front."""
    root = os.path.join("build", f"bucketed_ow_{uuid.uuid4().hex[:8]}")
    t = f"ow_tbl_{uuid.uuid4().hex[:6]}"
    df1 = spark.range(10).withColumnRenamed("id", "user_id")
    df2 = spark.range(5).withColumnRenamed("id", "user_id")
    try:
        save_bucketed(df1, t, os.path.join(root, "a"), "user_id", 4)
        assert spark.table(t).count() == 10
        save_bucketed(df2, t, os.path.join(root, "b"), "user_id", 4)
        assert spark.table(t).count() == 5
        for bad in ("x; DROP TABLE y", "a-b", "`quoted`", "a..b", ""):
            with pytest.raises(ValueError):
                save_bucketed(df1, bad, os.path.join(root, "c"),
                              "user_id", 4)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(root, ignore_errors=True)


def test_registry_bucketed_key_plans_without_exchange(spark):
    """agg_user_features_bucketed (r11 verdict #5): the DRIVER-visible
    registry path must itself produce the zero-Exchange plan — window
    sessionization + the feature groupBy both satisfied by the
    on-disk bucket distribution — and match the shuffled twin row for
    row."""
    import __spark_entry__ as entrymod
    from fossil_spark.queries.analytics import ensure_bucketed_events

    qs = entrymod.queries()
    df = qs["agg_user_features_bucketed"](spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, qs["agg_user_features"](spark, SF).collect()))
    assert got == want
    # idempotent: a second call in the same session reuses the table
    t1 = ensure_bucketed_events(spark, SF)
    t2 = ensure_bucketed_events(spark, SF)
    assert t1 == t2
    # and the oracle twin is literally the shuffled key's SQL
    osql = entrymod.oracle_sql()
    assert osql["agg_user_features_bucketed"] == osql["agg_user_features"]
