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


def test_bucketed_join_has_no_exchange(spark, bucketed):
    fact_t, dim_t, _, _ = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, fact_t).join(
            read_bucketed(spark, dim_t), "user_id"
        )
        plan = _plan(j)
        assert "Exchange" not in plan, (
            "bucketed-bucketed equi-join must not shuffle:\n" + plan
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
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
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        by_path = spark.read.parquet(path.replace("file:", ""))
        j = by_path.join(read_bucketed(spark, dim_t), "user_id")
        assert "Exchange" in _plan(j)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024)
        )
