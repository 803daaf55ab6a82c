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
