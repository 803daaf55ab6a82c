"""FQL over Structured Streams."""

import json
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from fossil_spark.streaming.fql_stream import fql_stream
from fossil_spark.streaming.ingest import read_json_dropbox


@pytest.fixture()
def src_dir():
    d = os.path.join("build", f"fqlstream_{uuid.uuid4().hex[:8]}")
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _feed(src: str, rows):
    with open(os.path.join(src, "batch.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run(spark, df, mode="append"):
    name = f"q_{uuid.uuid4().hex[:8]}"
    q = (df.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_filter_map(spark, src_dir):
    _feed(src_dir, [
        {"time": "2024-01-01T00:00:00", "topic": "/m/a", "value": "10"},
        {"time": "2024-01-01T00:01:00", "topic": "/m/b", "value": "99"},
        {"time": "2024-01-01T00:02:00", "topic": "/other", "value": "50"},
    ])
    stream = read_json_dropbox(spark, src_dir)
    out = fql_stream(stream, "all in /m | filter x -> x > 50 | map x -> x * 2")
    rows = _run(spark, out)
    assert [(r["topic"], r["value"]) for r in rows] == [("/m/b", 198.0)]


def test_stream_windowed_reduce(spark, src_dir):
    _feed(src_dir, [
        {"time": "2024-01-01T00:10:00", "topic": "/m", "value": "1"},
        {"time": "2024-01-01T00:40:00", "topic": "/m", "value": "3"},
        {"time": "2024-01-01T01:10:00", "topic": "/m", "value": "5"},
    ])
    stream = read_json_dropbox(spark, src_dir).withColumn(
        "value", F.col("value").cast("double")
    )
    out = fql_stream(
        stream,
        "all | map x -> 1, x | reduce a, b -> a[0] + b[0], a[1] + b[1]",
        window="1 hour",
    )
    rows = {str(r["bucket"]): (r["v0"], r["v1"]) for r in _run(spark, out, "complete")}
    assert rows["2024-01-01 00:00:00"] == (2, 4.0)
    assert rows["2024-01-01 01:00:00"] == (1, 5.0)


def test_stream_rejects_history_and_nonassoc(spark, src_dir):
    stream = read_json_dropbox(spark, src_dir)
    with pytest.raises(Exception, match="future-only|history"):
        fql_stream(stream, "all since ~now - @day")
    with pytest.raises(Exception, match="associative"):
        fql_stream(stream, "all | reduce a, b -> a - b")
