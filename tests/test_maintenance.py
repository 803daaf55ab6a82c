"""Compaction / retention / migration + socket ingest."""

import os
import shutil
import socket
import threading
import time
import uuid
from datetime import date, datetime

import pytest
from pyspark.sql import functions as F

from fossil_spark import maintenance
from fossil_spark.store import EventStore


@pytest.fixture()
def workdir():
    d = os.path.join("build", f"maint_test_{uuid.uuid4().hex[:8]}")
    os.makedirs(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _populate_fragmented(spark, root: str, n_appends: int = 4) -> EventStore:
    store = EventStore(spark, root)
    for i in range(n_appends):
        store.append_rows([
            (datetime(2024, 1, 1, i), "/a", f"v{i}"),
            (datetime(2024, 1, 2, i), "/b", f"w{i}"),
        ])
    return store


def test_compact_preserves_data(spark, workdir):
    root = os.path.join(workdir, "store")
    store = _populate_fragmented(spark, root)
    before = sorted(map(tuple, store.read().collect()))
    report = maintenance.small_file_report(spark, root)
    assert all(n_files >= 4 for _, n_files, _ in report)

    compacted = maintenance.compact(spark, root, target_file_bytes=1 << 30)
    assert set(compacted) == {"date=2024-01-01", "date=2024-01-02"}

    report_after = maintenance.small_file_report(spark, root)
    assert all(n_files == 1 for _, n_files, _ in report_after)
    assert sorted(map(tuple, store.read().collect())) == before


def test_expire_drops_old_partitions(spark, workdir):
    root = os.path.join(workdir, "store")
    store = _populate_fragmented(spark, root)
    dropped = maintenance.expire(root, older_than=date(2024, 1, 2))
    assert dropped == ["date=2024-01-01"]
    remaining = store.read().select("topic").distinct().collect()
    assert {r["topic"] for r in remaining} == {"/b"}


def test_migrate_with_transform(spark, workdir):
    src = os.path.join(workdir, "src")
    dst = os.path.join(workdir, "dst")
    _populate_fragmented(spark, src)
    n = maintenance.migrate(
        spark, src, dst,
        transform=lambda df: df.withColumn(
            "topic", F.concat(F.lit("/migrated"), F.col("topic"))
        ),
    )
    assert n == 8
    topics = {r["topic"] for r in EventStore(spark, dst).topics().collect()}
    assert topics == {"/migrated/a", "/migrated/b"}


def test_socket_ingest(spark, workdir):
    from fossil_spark.streaming.ingest import read_socket

    # ephemeral TCP server that pushes two appends then holds briefly
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    port = srv.getsockname()[1]
    srv.listen(1)

    def serve():
        conn, _ = srv.accept()
        conn.sendall(b"/logs something happened\n")
        conn.sendall(b"bare data no topic\n")
        time.sleep(3)
        conn.close()

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    name = f"sock_{uuid.uuid4().hex[:8]}"
    q = (
        read_socket(spark, "127.0.0.1", port)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql(f"SELECT topic, value FROM {name}").collect()
            if len(rows) >= 2:
                break
            time.sleep(0.5)
        got = {(r["topic"], r["value"]) for r in rows}
        assert ("/logs", "something happened") in got
        assert ("/", "bare data no topic") in got
    finally:
        q.stop()
        srv.close()
