"""Every time-taking operator must accept TIMESTAMP_NTZ input.

The driver's parquet has shipped two hostile timestamp layouts so far
(round 1: TIMESTAMP(NANOS); round 3: Timestamp(isAdjustedToUTC=false)
which Spark 4 infers as TIMESTAMP_NTZ — the type unix_micros() and
timestamp-vs-literal comparisons reject). session.read_table normalizes
at the source; these tests prove the operators ALSO stand alone when a
caller hands them raw NTZ data (defense in depth, VERDICT r3 item 4).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def ntz_events(spark):
    """A small events-shaped frame whose ts is genuinely TIMESTAMP_NTZ."""
    rows = [
        (i, datetime(2024, 1, 1) + timedelta(minutes=7 * i), i % 3, f"t{i % 2}", float(i))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    return df


def test_sessionize_ntz(ntz_events):
    from fossil_spark.operators.timeseries import sessionize

    out = sessionize(
        ntz_events, timedelta(minutes=10), time_col="ts", by=["user_id"],
        order_tiebreak=["event_id"],
    )
    assert out.count() > 0


def test_rate_ntz(ntz_events):
    from fossil_spark.operators.timeseries import rate

    out = rate(ntz_events, time_col="ts", by=["event_type"], order_tiebreak=["event_id"])
    assert out.count() == 40


def test_resample_sliding_firstlast_ohlc_ntz(ntz_events):
    from fossil_spark.operators.timeseries import (
        first_last_by_bucket, ohlc, resample, sliding_stats,
    )

    assert resample(ntz_events, "1 hour", time_col="ts").count() > 0
    assert sliding_stats(ntz_events, 3, time_col="ts", by=["user_id"],
                         order_tiebreak=["event_id"]).count() == 40
    assert first_last_by_bucket(ntz_events, "1 hour", time_col="ts").count() > 0
    assert ohlc(ntz_events, "1 hour", time_col="ts").count() > 0


def test_gapfill_ntz(ntz_events):
    from fossil_spark.operators.timeseries import gapfill_linear, gapfill_locf

    assert gapfill_locf(ntz_events, "15 minutes", time_col="ts").count() > 0
    assert gapfill_linear(ntz_events, "15 minutes", time_col="ts").count() > 0


def test_asof_and_range_join_ntz(spark, ntz_events):
    from fossil_spark.operators.timeseries import asof_join, range_join

    quotes = spark.createDataFrame(
        [(u, datetime(2024, 1, 1) + timedelta(minutes=30 * k), float(u * 10 + k))
         for u in range(3) for k in range(5)],
        "user_id long, qts timestamp_ntz, quote double",
    )
    out = asof_join(ntz_events, quotes, on="user_id", left_time="ts",
                    right_time="qts", right_values=["quote"])
    assert out.count() == 40

    intervals = spark.createDataFrame(
        [(n, datetime(2024, 1, 1) + timedelta(hours=n),
          datetime(2024, 1, 1) + timedelta(hours=n + 1)) for n in range(4)],
        "iv_id long, lo timestamp_ntz, hi timestamp_ntz",
    )
    joined = range_join(ntz_events.select(F.col("ts"), "event_id"), intervals,
                        point_time="ts", bucket="1 hour")
    assert joined.count() > 0


def test_ewma_greedy_sample_ntz(ntz_events):
    from fossil_spark.operators.timeseries import ewma, greedy_sample

    assert ewma(ntz_events, 0.5, time_col="ts", by=["user_id"],
                order_tiebreak=["event_id"]).count() == 40
    assert greedy_sample(ntz_events, timedelta(minutes=20), time_col="ts").count() > 0


def test_fql_sample_ntz(ntz_events):
    """compile_query's sample(Δ) bucketing and since/before literals
    must work on an NTZ time column."""
    from fossil_spark.fql import fql

    src = ntz_events.select(
        F.col("ts").alias("time"),
        F.concat(F.lit("/events/"), F.col("event_type")).alias("topic"),
        F.col("value"),
    )
    now = datetime(2024, 2, 1, tzinfo=timezone.utc)
    out = fql(src, "sample(@hour) in /events since ~now - @day * 40", now=now)
    assert 0 < out.count() <= 40


def test_acf_changepoint_seasonal_ntz(ntz_events):
    from fossil_spark.operators.timeseries import (
        acf,
        changepoint_cusum,
        seasonal_profile,
    )

    assert acf(
        ntz_events, lags=2, time_col="ts", by=["event_type"],
        order_tiebreak=["event_id"],
    ).count() == 2
    assert changepoint_cusum(
        ntz_events, time_col="ts", by=["event_type"],
        order_tiebreak=["event_id"],
    ).count() > 0
    assert seasonal_profile(
        ntz_events, time_col="ts", by=["event_type"]
    ).count() > 0


def test_forecast_lttb_ntz(ntz_events):
    from fossil_spark.operators.timeseries import holt_forecast, lttb

    assert holt_forecast(
        ntz_events, horizon=2, time_col="ts", by=["event_type"],
        order_tiebreak=["event_id"],
    ).count() == 4
    assert lttb(
        ntz_events, n_out=10, time_col="ts", by=["event_type"],
        order_tiebreak=["event_id"],
    ).count() == 20


def test_interval_coverage_overlap_join_holt_winters_ntz(ntz_events):
    from datetime import timedelta as td

    from fossil_spark.operators import timeseries as ts

    cov = ts.interval_coverage(
        ntz_events, time_col="ts", duration_col="value", by=["user_id"],
        order_tiebreak=["event_id"],
    ).collect()
    assert len(cov) == 3 and all(r["covered_us"] >= 0 for r in cov)

    left = ntz_events.select(
        "user_id", F.col("event_id").alias("l_id"),
        F.col("ts").alias("l_lo"),
        (F.col("ts").cast("timestamp") + F.expr("INTERVAL 30 MINUTE")).alias("l_hi"),
    )
    right = ntz_events.select(
        "user_id", F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_lo"),
        (F.col("ts").cast("timestamp") + F.expr("INTERVAL 30 MINUTE")).alias("r_hi"),
    ).filter("r_id % 2 = 0")
    ov = ts.overlap_join(
        left, right, on=["user_id"],
        left_lo="l_lo", left_hi="l_hi", right_lo="r_lo", right_hi="r_hi",
        bucket=td(minutes=30),
    ).collect()
    assert len(ov) > 0 and all(r["overlap_us"] > 0 for r in ov)

    hw = ts.holt_winters_forecast(
        ntz_events, period=4, horizon=2, time_col="ts", by=["event_type"],
        order_tiebreak=["event_id"],
    ).collect()
    assert len(hw) == 4  # 2 event types x 2 steps


def test_decompose_ntz(ntz_events):
    from fossil_spark.operators import timeseries as ts

    out = ts.decompose_classical(
        ntz_events, period=5, time_col="ts", by=["event_type"],
        order_tiebreak=["event_id"],
    ).collect()
    assert len(out) == 40
    assert any(r["trend"] is not None for r in out)
