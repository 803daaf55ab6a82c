"""Stream-stream interval join with watermark-bounded state."""

import json
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from fossil_spark.streaming.ingest import read_json_dropbox
from fossil_spark.streaming.joins import interval_join


@pytest.fixture()
def workdir():
    d = os.path.join("build", f"sjoin_{uuid.uuid4().hex[:8]}")
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _feed(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_interval_join_click_purchase(spark, workdir):
    clicks_dir = os.path.join(workdir, "clicks")
    buys_dir = os.path.join(workdir, "buys")
    _feed(clicks_dir, "c.json", [
        {"time": "2024-01-01T10:00:00", "topic": "/u/1", "value": "click-a"},
        {"time": "2024-01-01T10:05:00", "topic": "/u/2", "value": "click-b"},
    ])
    _feed(buys_dir, "b.json", [
        # within 1h of u/1's click -> matches
        {"time": "2024-01-01T10:30:00", "topic": "/u/1", "value": "buy-1"},
        # 3h after u/2's click -> outside the interval, no match
        {"time": "2024-01-01T13:05:00", "topic": "/u/2", "value": "buy-2"},
    ])
    clicks = read_json_dropbox(spark, clicks_dir)
    buys = (
        read_json_dropbox(spark, buys_dir)
        .select(F.col("time").alias("buy_time"), "topic",
                F.col("value").alias("purchase"))
    )
    joined = interval_join(
        clicks, buys, on="topic", within="1 hour", right_time="buy_time"
    ).select("topic", "value", "purchase")

    name = f"attr_{uuid.uuid4().hex[:8]}"
    q = (joined.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    assert [(r["topic"], r["value"], r["purchase"]) for r in rows] == [
        ("/u/1", "click-a", "buy-1")
    ]
