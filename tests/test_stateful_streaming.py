"""Custom stateful streaming: session windows via applyInPandasWithState."""

import json
import os
import shutil
import uuid
from datetime import timedelta

import pytest

from fossil_spark.streaming.ingest import read_json_dropbox
from fossil_spark.streaming.stateful import streaming_sessionize


@pytest.fixture()
def workdir():
    d = os.path.join("build", f"stateful_test_{uuid.uuid4().hex[:8]}")
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_sessionize(spark, workdir):
    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    rows = [
        # topic /a: two sessions separated by a 2-hour gap
        {"time": "2024-01-01T00:00:00", "topic": "/a", "value": "1"},
        {"time": "2024-01-01T00:10:00", "topic": "/a", "value": "2"},
        {"time": "2024-01-01T02:30:00", "topic": "/a", "value": "3"},
        # topic /b: one session
        {"time": "2024-01-01T01:00:00", "topic": "/b", "value": "4"},
    ]
    with open(os.path.join(src, "batch.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    stream = read_json_dropbox(spark, src)
    sessions = streaming_sessionize(stream, timedelta(minutes=30))

    name = f"sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["topic"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    # within one availableNow run, only sessions CLOSED by a later event
    # are emitted; /a's first session closed when event 3 arrived
    assert ("/a", "2024-01-01 00:00:00", "2024-01-01 00:10:00", 2) in got


def test_streaming_cusum_carries_state_across_batches(spark, workdir):
    from pyspark.sql import functions as F

    from fossil_spark.streaming.cusum import streaming_cusum

    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    ck = os.path.join(workdir, "ck")
    baseline = spark.createDataFrame(
        [("/m", 10.0, 1.0)], "topic string, base_mean double, base_std double"
    )

    def run_once():
        stream = read_json_dropbox(spark, src).withColumn(
            "value", F.col("value").cast("double")
        )
        out = streaming_cusum(stream, baseline, 0.5, 5.0)
        got = []

        def sink(batch_df, _bid):
            got.extend(batch_df.collect())

        # foreachBatch (not memory sink): supports checkpoint RECOVERY,
        # which is the property under test
        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["topic"]: r for r in got}

    # batch 1: on-baseline values — no drift, no alarm
    with open(os.path.join(src, "b1.json"), "w") as f:
        for i in range(5):
            f.write(json.dumps({
                "time": f"2024-01-01T00:0{i}:00", "topic": "/m",
                "value": str(10.0 + (1.0 if i % 2 else -1.0)),
            }) + "\n")
    r1 = run_once()["/m"]
    assert r1["n_seen"] == 5 and not r1["alarm"]

    # batch 2 (same checkpoint): sustained +2-sigma shift — the fold
    # must CONTINUE from batch-1 state (n_seen = 12) and alarm
    with open(os.path.join(src, "b2.json"), "w") as f:
        for i in range(7):
            f.write(json.dumps({
                "time": f"2024-01-01T01:0{i}:00", "topic": "/m",
                "value": "15.0",
            }) + "\n")
    r2 = run_once()["/m"]
    assert r2["n_seen"] == 12
    assert r2["cusum_pos"] > 5.0 and r2["alarm"]

    # parity: the batch replay (cusum_replay — the oracle-bearing
    # twin, shared _fold_cusum kernel) over the SAME 12 rows and
    # baseline must land on the streaming query's final state exactly
    from fossil_spark.streaming.cusum import cusum_replay

    static_rows = [
        ("2024-01-01T00:0%d:00" % i, "/m", 10.0 + (1.0 if i % 2 else -1.0))
        for i in range(5)
    ] + [("2024-01-01T01:0%d:00" % i, "/m", 15.0) for i in range(7)]
    static = spark.createDataFrame(
        static_rows, "time string, topic string, value double"
    ).withColumn("time", F.col("time").cast("timestamp"))
    rb = cusum_replay(static, baseline, 0.5, 5.0).collect()[0]
    assert rb["n_seen"] == r2["n_seen"]
    assert rb["cusum_pos"] == r2["cusum_pos"]
    assert rb["cusum_neg"] == r2["cusum_neg"]
    assert rb["alarm"] == r2["alarm"]
