"""Materialized rollups: batch build + streaming upkeep converge."""

import json
import os
import shutil
import uuid
from datetime import datetime

import pytest

from fossil_spark.store import EventStore
from fossil_spark.streaming.ingest import read_json_dropbox
from fossil_spark.streaming.materialize import build_rollup, stream_rollup_to_store


@pytest.fixture()
def workdir():
    d = os.path.join("build", f"mat_{uuid.uuid4().hex[:8]}")
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


ROWS = [
    ("2024-01-01T00:10:00", "/m", "1"),
    ("2024-01-01T00:50:00", "/m", "3"),
    ("2024-01-01T01:10:00", "/m", "5"),
    ("2024-01-02T09:00:00", "/n", "7"),
]


def test_batch_rollup_build(spark, workdir):
    store_root = os.path.join(workdir, "store")
    st = EventStore(spark, store_root)
    st.append_rows([
        (datetime.fromisoformat(t), topic, v) for t, topic, v in ROWS
    ])
    rollup_root = os.path.join(workdir, "rollup")
    n = build_rollup(spark, store_root, rollup_root, "1 hour")
    assert n == 3
    got = {
        (str(r["bucket"]), r["topic"]): (r["n"], r["avg_value"])
        for r in spark.read.parquet(rollup_root).collect()
    }
    assert got[("2024-01-01 00:00:00", "/m")] == (2, 2.0)
    assert got[("2024-01-01 01:00:00", "/m")] == (1, 5.0)
    assert got[("2024-01-02 09:00:00", "/n")] == (1, 7.0)
    # idempotent: rebuilding changes nothing
    assert build_rollup(spark, store_root, rollup_root, "1 hour") == 3
    # partitioned by date
    assert os.path.isdir(os.path.join(rollup_root, "date=2024-01-01"))


def test_stream_rollup_converges_to_batch(spark, workdir):
    src = os.path.join(workdir, "incoming")
    os.makedirs(src)
    with open(os.path.join(src, "b.json"), "w") as f:
        for t, topic, v in ROWS:
            f.write(json.dumps({"time": t, "topic": topic, "value": v}) + "\n")
        # late closing event far in the future so every window's
        # watermark passes within the availableNow run
        f.write(json.dumps(
            {"time": "2024-01-03T00:00:00", "topic": "/close", "value": "0"}
        ) + "\n")

    rollup_root = os.path.join(workdir, "rollup")
    q = stream_rollup_to_store(
        read_json_dropbox(spark, src),
        rollup_root,
        os.path.join(workdir, "ckpt"),
        every="1 hour",
        watermark="1 minute",
        trigger_available_now=True,
    )
    q.awaitTermination(180)
    got = {
        (str(r["bucket"]), r["topic"]): (r["n"], r["avg_value"])
        for r in spark.read.parquet(rollup_root).collect()
    }
    assert got[("2024-01-01 00:00:00", "/m")] == (2, 2.0)
    assert got[("2024-01-01 01:00:00", "/m")] == (1, 5.0)
    assert got[("2024-01-02 09:00:00", "/n")] == (1, 7.0)
