"""Compaction / retention / migration + socket ingest."""

import os
import shutil
import socket
import threading
import time
import uuid
from datetime import date, datetime, timedelta, timezone

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


def test_compact_clusters_topics_for_file_skipping(spark, tmp_path):
    """Compacted files must be (topic, time)-clustered: each output
    file's parquet stats cover a narrow topic slice, so topic scans
    skip files. Round-robin compaction would put every topic in every
    file and silently forfeit the pruning."""
    import pyarrow.parquet as pq

    from fossil_spark.maintenance import compact
    from fossil_spark.store import EventStore

    root = str(tmp_path / "store")
    store = EventStore(spark, root)
    base = datetime(2024, 7, 1, tzinfo=timezone.utc)
    topics = [f"/t{i}" for i in range(4)]
    # many small appends -> fragmented partition
    for j in range(6):
        store.append_rows([
            (base + timedelta(minutes=60 * j + i), t, str(i))
            for i in range(10) for t in topics
        ])
    part = os.path.join(root, "date=2024-07-01")
    n_before = len([f for f in os.listdir(part) if f.endswith(".parquet")])
    assert n_before >= 6
    done = compact(spark, root, target_file_bytes=6_000, min_files=2)
    assert done == ["date=2024-07-01"]
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    if len(files) > 1:  # single merged file would be trivially fine
        spans = []
        for f in files:
            md = pq.ParquetFile(os.path.join(part, f)).metadata
            tmin = tmax = None
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(ci)
                    for ci in range(md.row_group(rg).num_columns)
                    if md.row_group(rg).column(ci).path_in_schema == "topic"
                )
                st = col.statistics
                tmin = st.min if tmin is None else min(tmin, st.min)
                tmax = st.max if tmax is None else max(tmax, st.max)
            spans.append((tmin, tmax))
        # at least one file covers a strict subset of topics
        def _s(x):
            return x.decode() if isinstance(x, bytes) else x

        n_topics = len(topics)
        widths = [
            len([t for t in topics if _s(lo) <= t <= _s(hi)])
            for lo, hi in spans
        ]
        assert min(widths) < n_topics, f"no file is topic-clustered: {spans}"
    # content survives the rewrite
    got = spark.read.parquet(root).count()
    assert got == 6 * 10 * 4
