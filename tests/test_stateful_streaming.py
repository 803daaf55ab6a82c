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


def test_streaming_sessionize_batch_parity(spark, workdir):
    """Lambda parity for session windows: every session the streaming
    fold CLOSES must be byte-identical to the batch sessionize rollup
    of the same drain (the two implementations are independent — the
    state fold in streaming/stateful.py vs the lag-window flag sum in
    operators/timeseries.py — so this is the assertion that keeps a
    live deployment's sessions equal to its backfill's)."""
    from datetime import timedelta

    from pyspark.sql import functions as F

    from fossil_spark.operators.timeseries import sessionize

    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    rows = [
        ("2024-01-01T00:00:00", "/a"), ("2024-01-01T00:05:00", "/a"),
        ("2024-01-01T01:00:00", "/a"),  # closes session 1 (gap 30m)
        ("2024-01-01T01:10:00", "/a"),
        ("2024-01-01T03:00:00", "/a"),  # closes session 2
        ("2024-01-01T00:20:00", "/b"),
        ("2024-01-01T02:00:00", "/b"),  # closes /b session 1
    ]
    with open(os.path.join(src, "b1.json"), "w") as f:
        for t, topic in rows:
            f.write(json.dumps({"time": t, "topic": topic, "value": "1"}) + "\n")
    stream = read_json_dropbox(spark, src)
    got = {
        (r["topic"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"])
        for r in _drain_append(
            streaming_sessionize(stream, timedelta(minutes=30)),
            f"sess_{uuid.uuid4().hex[:8]}",
        )
    }
    assert len(got) >= 3  # both /a closures and the /b closure
    static = spark.createDataFrame(
        rows, "time string, topic string"
    ).withColumn("time", F.col("time").cast("timestamp"))
    batch = {
        (r["topic"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"])
        for r in sessionize(
            static, timedelta(minutes=30), by=["topic"]
        ).collect()
    }
    assert got <= batch  # closed streaming sessions ⊆ batch sessions


class _FakeGroupState:
    """Minimal GroupState double for driving the literal update fold
    outside a streaming query (the subset of the API the fold uses)."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def test_sessionize_state_fold_equals_batch_exactly(spark):
    """r9 verdict #6: sessionize was the one stream op with neither
    oracle nor replay twin because its OUTPUT depends on arrival order
    — but arrival order is controlled here. Drive the LITERAL
    streaming state fold (_session_update_fn) over a single-partition,
    timestamp-ordered static drain of real sf0.001 events, fire the
    timeout path to flush the open session per key, and assert the
    full emitted set EQUALS the batch sessionizer's rollup — not just
    a subset."""
    import pandas as pd
    from datetime import timedelta

    from pyspark.sql import functions as F

    from fossil_spark.operators.timeseries import sessionize
    from fossil_spark.store import events_store_view
    from fossil_spark.streaming.stateful import _session_update_fn

    ev = (
        events_store_view(spark, "/root/testdata/sf0.001")
        .select("time", "topic")
        .limit(3000)
    )
    pdf = ev.toPandas().sort_values(["topic", "time"])
    gap = timedelta(minutes=30)
    update = _session_update_fn(int(gap.total_seconds() * 1e6),
                                int(gap.total_seconds() * 1e3), "time")
    emitted = []
    for topic, part in pdf.groupby("topic"):
        state = _FakeGroupState()
        emitted.extend(update((topic,), [part], state))
        if state.exists:  # flush the open session via the timeout path
            state.hasTimedOut = True
            emitted.extend(update((topic,), iter(()), state))
        assert not state.exists
    got = {
        (r["topic"], str(r["session_start"]), str(r["session_end"]),
         int(r["n_events"]))
        for out in emitted for _, r in out.iterrows()
    }
    batch = {
        (r["topic"], str(r["session_start"]), str(r["session_end"]),
         r["n_events"])
        for r in sessionize(ev, gap, by=["topic"]).collect()
    }
    assert got == batch
    assert len(got) > len(pdf["topic"].unique())  # multiple sessions/key


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


def _drain_append(out, name):
    """Run an append-mode streaming query to a memory sink and return
    the collected rows' Row objects."""
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return out.sparkSession.sql(f"SELECT * FROM {name}").collect()


def _monitor_fixture(spark, src):
    """Two topics, minute-windowed: /hot spikes far above baseline in
    its second minute; /calm stays on baseline; minutes 2-4 keep the
    clock moving so the watermark closes windows 0-1. All rows are
    on-time — the replay contract covers the ARITHMETIC of closed
    windows on one drain (late-vs-dropped delivery divergence is the
    stream's domain; cross-batch state is covered by the cusum
    checkpoint-recovery test). Returns the same rows as a static
    DataFrame for the replay side."""
    rows = []
    for i in range(6):  # minute 0: both on baseline
        rows.append(("2024-01-01T00:00:%02d" % (i * 9), "/hot", 10.0 + i % 2))
        rows.append(("2024-01-01T00:00:%02d" % (i * 9 + 4), "/calm", 10.0))
    for i in range(6):  # minute 1: /hot spikes
        rows.append(("2024-01-01T00:01:%02d" % (i * 9), "/hot", 30.0 + i))
        rows.append(("2024-01-01T00:01:%02d" % (i * 9 + 4), "/calm", 10.0))
    # minutes 2-4: keep the clock moving so the watermark closes 0-1
    for m in (2, 3, 4):
        rows.append(("2024-01-01T00:0%d:00" % m, "/hot", 10.0))
        rows.append(("2024-01-01T00:0%d:30" % m, "/calm", 10.0))
    with open(os.path.join(src, "b1.json"), "w") as f:
        for t, topic, v in rows:
            f.write(json.dumps({"time": t, "topic": topic, "value": str(v)}) + "\n")
    from pyspark.sql import functions as F

    static = spark.createDataFrame(
        rows, "time string, topic string, value double"
    ).withColumn("time", F.col("time").cast("timestamp"))
    return static


def test_streaming_anomaly_replay_parity(spark, workdir):
    """The batch replay IS streaming_anomaly on static input
    (withWatermark no-ops on batch), so for every window the
    watermark closed, the streaming drain and the replay must agree
    bit-for-bit — the property that lets the replay's SQL oracle
    vouch for the live monitor's arithmetic."""
    from pyspark.sql import functions as F

    from fossil_spark.streaming.anomaly import anomaly_replay, streaming_anomaly

    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    static = _monitor_fixture(spark, src)
    baseline = spark.createDataFrame(
        [("/hot", 10.0, 1.0), ("/calm", 10.0, 1.0)],
        "topic string, base_mean double, base_std double",
    )
    stream = read_json_dropbox(spark, src).withColumn(
        "value", F.col("value").cast("double")
    )
    live = _drain_append(
        streaming_anomaly(stream, baseline, 3.0, "1 minute", "2 minutes"),
        f"anom_{uuid.uuid4().hex[:8]}",
    )
    assert live, "the /hot spike window must alert"
    key = lambda r: (str(r["bucket"]), r["topic"])
    replay = {
        key(r): r
        for r in anomaly_replay(static, baseline, 3.0, "1 minute").collect()
    }
    for r in live:  # append mode emits only closed windows — a subset
        rb = replay[key(r)]
        assert rb["n"] == r["n"]
        assert rb["window_mean"] == r["window_mean"]
        assert rb["deviation_sigmas"] == r["deviation_sigmas"]


def test_streaming_hh_replay_parity(spark, workdir):
    """Streaming windowed counts + the foreachBatch top-k cut vs the
    batch replay of the same pair: identical (bucket, key, n, rank)
    rows for every closed window."""
    from pyspark.sql import functions as F

    from fossil_spark.streaming.heavy_hitters import (
        heavy_hitters_replay, topk_batch, windowed_key_counts,
    )

    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    static = _monitor_fixture(spark, src)
    stream = read_json_dropbox(spark, src).withColumn(
        "value", F.col("value").cast("double")
    )
    got = []
    counts = windowed_key_counts(stream, "1 minute", "2 minutes")
    q = (
        counts.writeStream.foreachBatch(
            lambda b, _i: got.extend(topk_batch(b, 1).collect())
        )
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert got, "closed windows must emit counts"
    replay = {
        (str(r["bucket"]), r["topic"]): r
        for r in heavy_hitters_replay(static, 1, "1 minute").collect()
    }
    for r in got:
        rb = replay[(str(r["bucket"]), r["topic"])]
        assert (rb["n"], rb["rank"]) == (r["n"], r["rank"])


def test_streaming_rollup_replay_parity(spark, workdir):
    """Live windowed rollup vs its batch replay on the same drain:
    identical (bucket, key, n, avg_value) for every closed window —
    the decimal-accumulated mean cannot drift between lambda legs."""
    from pyspark.sql import functions as F

    from fossil_spark.streaming.rollup import rollup_replay, windowed_rollup

    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    static = _monitor_fixture(spark, src)
    stream = read_json_dropbox(spark, src).withColumn(
        "value", F.col("value").cast("double")
    )
    live = _drain_append(
        windowed_rollup(stream, "1 minute", "2 minutes"),
        f"roll_{uuid.uuid4().hex[:8]}",
    )
    assert live, "closed windows must emit rollup rows"
    replay = {
        (str(r["bucket"]), r["topic"]): r
        for r in rollup_replay(static, "1 minute").collect()
    }
    for r in live:
        rb = replay[(str(r["bucket"]), r["topic"])]
        assert rb["n"] == r["n"]
        assert rb["avg_value"] == r["avg_value"]


def test_streaming_apdex_replay_parity(spark, workdir):
    """Live Apdex vs its batch replay on the same drain: identical
    band counts and floor-half-up score per closed window."""
    from pyspark.sql import functions as F

    from fossil_spark.streaming.apdex import apdex_replay, streaming_apdex

    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    static = _monitor_fixture(spark, src)
    stream = read_json_dropbox(spark, src).withColumn(
        "value", F.col("value").cast("double")
    )
    live = _drain_append(
        streaming_apdex(stream, 10.0, "1 minute", "2 minutes"),
        f"apdex_{uuid.uuid4().hex[:8]}",
    )
    assert live, "closed windows must emit apdex rows"
    replay = {
        (str(r["bucket"]), r["topic"]): r
        for r in apdex_replay(static, 10.0, "1 minute").collect()
    }
    for r in live:
        rb = replay[(str(r["bucket"]), r["topic"])]
        assert (rb["n"], rb["n_satisfied"], rb["n_tolerating"],
                rb["n_frustrated"]) == (
            r["n"], r["n_satisfied"], r["n_tolerating"], r["n_frustrated"]
        )
        assert rb["apdex"] == r["apdex"]


def test_psi_drops_null_values(spark):
    """NULL values must not reach any bin OR the window count n —
    they would otherwise dilute every bin fraction (counted in
    count(*) but binned nowhere). Pinned on the replay twin, which
    runs the identical plan."""
    from pyspark.sql import functions as F

    from fossil_spark.streaming.drift import psi_replay, reference_profile

    history = spark.createDataFrame(
        [("/m", float(i)) for i in range(1, 9)],
        "topic string, value double",
    )
    profile = reference_profile(history, n_bins=4)
    live = spark.createDataFrame(
        [("2024-01-01T00:00:10", "/m", 2.0),
         ("2024-01-01T00:00:20", "/m", 6.0),
         ("2024-01-01T00:00:30", "/m", None)],
        "time string, topic string, value double",
    ).withColumn("time", F.col("time").cast("timestamp"))
    (row,) = psi_replay(live, profile, "1 minute", n_bins=4).collect()
    assert row["n"] == 2  # the NULL row is dropped, not diluted


def test_streaming_psi_replay_parity(spark, workdir):
    """Streaming PSI vs its batch replay on the same drain: the bin
    fold, windowed counts, and term-chain sum are the same plan, so
    every closed window's psi must match bitwise."""
    from pyspark.sql import functions as F

    from fossil_spark.streaming.drift import (
        psi_replay, reference_profile, streaming_psi,
    )

    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    static = _monitor_fixture(spark, src)
    history = spark.createDataFrame(
        [("/hot", 8.0 + 0.5 * i) for i in range(9)]
        + [("/calm", 9.0 + 0.25 * i) for i in range(9)],
        "topic string, value double",
    )
    profile = reference_profile(history, n_bins=4)
    stream = read_json_dropbox(spark, src).withColumn(
        "value", F.col("value").cast("double")
    )
    live = _drain_append(
        streaming_psi(stream, profile, "1 minute", "2 minutes", n_bins=4),
        f"psi_{uuid.uuid4().hex[:8]}",
    )
    assert live, "closed windows must emit PSI rows"
    replay = {
        (str(r["bucket"]), r["topic"]): r
        for r in psi_replay(static, profile, "1 minute", n_bins=4).collect()
    }
    for r in live:
        rb = replay[(str(r["bucket"]), r["topic"])]
        assert rb["n"] == r["n"]
        assert rb["psi"] == r["psi"]
        assert rb["drifted"] == r["drifted"]
