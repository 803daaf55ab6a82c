"""gob decoder/encoder + reference-database importer.

The gob wire rules are pinned against the example encodings published
in the Go standard library's encoding/gob package documentation
(uint/int/float examples, the struct field example, and the complete
two-message stream for `Point{X:22, Y:33}`), then exercised by
round-trips over the reference's actual on-disk shapes (Segment /
Datum / time.Time) and an end-to-end directory import into the
EventStore — segments, WAL lines, topics, and schemas."""

from __future__ import annotations

import base64
import json
import os
import shutil
import struct
import uuid
import zlib
from datetime import datetime, timedelta, timezone

import pytest

from fossil_spark.gob import (
    BYTES, INT, STRING, Decoder, Encoder, Reader, encode_go_time, go_time,
)


def enc_uint(v: int) -> bytes:
    from fossil_spark.gob import _w_uint

    out = bytearray()
    _w_uint(out, v)
    return bytes(out)


def enc_int(v: int) -> bytes:
    from fossil_spark.gob import _w_int

    out = bytearray()
    _w_int(out, v)
    return bytes(out)


def test_documented_integer_vectors():
    # package docs: 7 -> 07; 256 -> FE 01 00
    assert enc_uint(7) == bytes([0x07])
    assert enc_uint(256) == bytes([0xFE, 0x01, 0x00])
    assert Reader(bytes([0x07])).read_uint() == 7
    assert Reader(bytes([0xFE, 0x01, 0x00])).read_uint() == 256
    # package docs: -257 -> FE 02 01
    assert enc_int(-257) == bytes([0xFE, 0x02, 0x01])
    assert Reader(bytes([0xFE, 0x02, 0x01])).read_int() == -257
    assert Reader(enc_int(0)).read_int() == 0
    assert Reader(enc_int(1 << 40)).read_int() == 1 << 40


def test_documented_float_vector():
    # package docs: 17.0's reversed float64 bits -> FE 31 40
    from fossil_spark.gob import _w_float

    out = bytearray()
    _w_float(out, 17.0)
    assert bytes(out) == bytes([0xFE, 0x31, 0x40])
    assert Reader(bytes([0xFE, 0x31, 0x40])).read_float() == 17.0


def test_documented_point_stream():
    """The package docs' complete worked example: `type Point struct
    { X, Y int }` with value Point{22, 33} produces a type-definition
    message and a value message with these exact bytes."""
    typedef = bytes([
        0x1F, 0xFF, 0x81, 0x03, 0x01, 0x01, 0x05, 0x50, 0x6F, 0x69,
        0x6E, 0x74, 0x01, 0xFF, 0x82, 0x00, 0x01, 0x02, 0x01, 0x01,
        0x58, 0x01, 0x04, 0x00, 0x01, 0x01, 0x59, 0x01, 0x04, 0x00,
        0x00, 0x00,
    ])
    value = bytes([0x07, 0xFF, 0x82, 0x01, 0x2C, 0x01, 0x42, 0x00])

    # our encoder reproduces both messages byte-for-byte
    e = Encoder()
    tid = e.define_struct("Point", [("X", INT), ("Y", INT)])
    schema = ("struct", [("X", INT, INT), ("Y", INT, INT)])
    e.encode_value(tid, {"X": 22, "Y": 33}, schema)
    assert bytes(e.out) == typedef + value

    # and our decoder reads the documented stream
    assert Decoder(typedef + value).decode() == {"X": 22, "Y": 33}


def test_struct_skips_zero_fields():
    # docs: {7, 0, 8} for struct{X, Y, Z int} -> 01 0E 02 10 00
    e = Encoder()
    tid = e.define_struct("T", [("X", INT), ("Y", INT), ("Z", INT)])
    schema = ("struct", [("X", INT, INT), ("Y", INT, INT), ("Z", INT, INT)])
    e.encode_value(tid, {"X": 7, "Y": 0, "Z": 8}, schema)
    value_msg = bytes(e.out).split(b"\x00\x00")[-1]
    assert value_msg.endswith(bytes([0x01, 0x0E, 0x02, 0x10, 0x00]))
    assert Decoder(bytes(e.out)).decode() == {"X": 7, "Y": 0, "Z": 8}


def test_go_time_roundtrip():
    t = datetime(2024, 3, 5, 12, 34, 56, 789000, tzinfo=timezone.utc)
    assert go_time(encode_go_time(t)) == t
    # version byte + 8s + 4ns + 2 zone = 15 bytes, zone -1 = UTC
    payload = encode_go_time(t)
    assert payload[0] == 1 and len(payload) == 15
    assert payload[-2:] == b"\xff\xff"


def _segment_encoder() -> tuple[Encoder, int, object]:
    """Type graph for the reference Segment (db.go serializeInternal):
    time.Time is a GobEncoder type, Series a fixed [10000]Datum."""
    e = Encoder()
    t_time = e.define_gobencoder("time.Time")
    t_datum = e.define_struct(
        "Datum", [("Delta", INT), ("TopicID", INT), ("Data", BYTES)]
    )
    t_series = e.define_array("[10000]database.Datum", t_datum, 10000)
    t_seg = e.define_struct(
        "Segment", [("HeadTime", t_time), ("Series", t_series), ("Size", INT)]
    )
    datum_schema = ("struct", [
        ("Delta", INT, INT), ("TopicID", INT, INT), ("Data", BYTES, BYTES),
    ])
    seg_schema = ("struct", [
        ("HeadTime", t_time, ("gobenc",)),
        ("Series", t_series, ("array", t_datum, datum_schema)),
        ("Size", INT, INT),
    ])
    return e, t_seg, seg_schema


def make_segment_bytes(head: datetime, datums: list[tuple[int, int, bytes]]) -> bytes:
    e, t_seg, seg_schema = _segment_encoder()
    series = [
        {"Delta": d, "TopicID": t, "Data": b} for d, t, b in datums
    ] + [{"Delta": 0, "TopicID": 0, "Data": b""}] * (10000 - len(datums))
    e.encode_value(t_seg, {
        "HeadTime": encode_go_time(head),
        "Series": series,
        "Size": len(datums),
    }, seg_schema)
    return bytes(e.out)


def test_segment_gob_roundtrip():
    head = datetime(2024, 1, 2, tzinfo=timezone.utc)
    raw = make_segment_bytes(head, [
        (0, 1, b"10.5"), (1_500_000_000, 2, b"hello"),
    ])
    seg = Decoder(raw).decode()
    assert go_time(seg["HeadTime"]) == head
    assert seg["Size"] == 2
    assert len(seg["Series"]) == 10000
    assert seg["Series"][0] == {"Delta": 0, "TopicID": 1, "Data": b"10.5"}
    assert seg["Series"][1]["Delta"] == 1_500_000_000
    # the 9998 zero datums decode to zero values
    assert seg["Series"][2] == {"Delta": 0, "TopicID": 0, "Data": b""}


def _write_reference_db(root: str) -> None:
    """A synthetic reference database directory: 2 serialized
    segments, topics/schemas sidecars, and a WAL with an extra
    segment + unflushed events + a late topic."""
    os.makedirs(os.path.join(root, "segments"))
    topics = ["/", "/metrics/cpu", "/logs"]
    schemas = ["string", "string", "string"]

    h1 = datetime(2024, 1, 1, 0, 0, 0, tzinfo=timezone.utc)
    h2 = datetime(2024, 1, 1, 1, 0, 0, tzinfo=timezone.utc)
    with open(os.path.join(root, "segments", "0"), "wb") as f:
        f.write(make_segment_bytes(h1, [
            (0, 1, b"1.5"), (60 * 10**9, 2, b"boot ok"),
        ]))
    with open(os.path.join(root, "segments", "1"), "wb") as f:
        f.write(make_segment_bytes(h2, [(0, 1, b"2.5")]))

    with open(os.path.join(root, "metadata"), "wb") as f:
        f.write(struct.pack("<III", 2, 2, 1))
        f.write(b"2024-01-01T02:00:00Z")
    for name, data in (("topics", topics), ("schemas", schemas)):
        with open(os.path.join(root, name), "wb") as f:
            f.write(zlib.compress(json.dumps(data).encode()))

    # WAL: new segment at 02:00, one event in it, a late typed topic
    # and an event for it (log.go line format: action;base64(gob))
    lines = []
    e = Encoder()
    t_time = e.define_gobencoder("time.Time")
    e.encode_value(
        t_time, encode_go_time(datetime(2024, 1, 1, 2, tzinfo=timezone.utc)),
        ("gobenc",),
    )
    lines.append(b"2;" + base64.b64encode(bytes(e.out)))

    e = Encoder()
    t_datum = e.define_struct(
        "Datum", [("Delta", INT), ("TopicID", INT), ("Data", BYTES)]
    )
    ds = ("struct", [
        ("Delta", INT, INT), ("TopicID", INT, INT), ("Data", BYTES, BYTES),
    ])
    e.encode_value(t_datum, {"Delta": 30 * 10**9, "TopicID": 2,
                             "Data": b"wal entry"}, ds)
    lines.append(b"1;" + base64.b64encode(bytes(e.out)))

    e = Encoder()
    e.encode_value(STRING, "/sensors/temp:float64", STRING)
    lines.append(b"4;" + base64.b64encode(bytes(e.out)))

    e = Encoder()
    e.define_struct("Datum", [("Delta", INT), ("TopicID", INT), ("Data", BYTES)])
    e.encode_value(e.defined["Datum"], {
        "Delta": 45 * 10**9, "TopicID": 3,
        "Data": struct.pack("<d", 21.5),
    }, ds)
    lines.append(b"1;" + base64.b64encode(bytes(e.out)))

    with open(os.path.join(root, "wal.log"), "wb") as f:
        f.write(b"\n".join(lines) + b"\n")


def _datum_schema():
    return ("struct", [
        ("Delta", INT, INT), ("TopicID", INT, INT), ("Data", BYTES, BYTES),
    ])


def make_v1_database_bytes(
    name: str, topics: list[str], segments: list[tuple[datetime, list]]
) -> bytes:
    """One gob-encoded databaseV1 struct (migration.go:48): Segments
    inline as a []Segment slice, TopicLookup []string, no schemas."""
    e = Encoder()
    t_time = e.define_gobencoder("time.Time")
    t_datum = e.define_struct(
        "Datum", [("Delta", INT), ("TopicID", INT), ("Data", BYTES)]
    )
    t_series = e.define_array("[10000]database.Datum", t_datum, 10000)
    t_seg = e.define_struct(
        "Segment", [("HeadTime", t_time), ("Series", t_series), ("Size", INT)]
    )
    t_segs = e.define_slice("[]database.Segment", t_seg)
    t_strs = e.define_slice("[]string", STRING)
    t_db = e.define_struct("databaseV1", [
        ("Version", INT), ("Name", STRING), ("Path", STRING),
        ("Segments", t_segs), ("Current", INT),
        ("TopicLookup", t_strs), ("TopicCount", INT),
    ])
    ds = _datum_schema()
    seg_schema = ("struct", [
        ("HeadTime", t_time, ("gobenc",)),
        ("Series", t_series, ("array", t_datum, ds)),
        ("Size", INT, INT),
    ])
    db_schema = ("struct", [
        ("Version", INT, INT), ("Name", STRING, STRING),
        ("Path", STRING, STRING),
        ("Segments", t_segs, ("slice", t_seg, seg_schema)),
        ("Current", INT, INT),
        ("TopicLookup", t_strs, ("slice", STRING, STRING)),
        ("TopicCount", INT, INT),
    ])
    seg_values = []
    for head, datums in segments:
        series = [
            {"Delta": d, "TopicID": t, "Data": b} for d, t, b in datums
        ] + [{"Delta": 0, "TopicID": 0, "Data": b""}] * (10000 - len(datums))
        seg_values.append({
            "HeadTime": encode_go_time(head),
            "Series": series,
            "Size": len(datums),
        })
    e.encode_value(t_db, {
        "Version": 1, "Name": name, "Path": "/stale/do/not/trust",
        "Segments": seg_values, "Current": max(len(seg_values) - 1, 0),
        "TopicLookup": topics, "TopicCount": len(topics),
    }, db_schema)
    return bytes(e.out)


def _wal_line_add_topic(spec: str) -> bytes:
    e = Encoder()
    e.encode_value(STRING, spec, STRING)
    return b"4;" + base64.b64encode(bytes(e.out))


def _wal_line_add_segment(head: datetime) -> bytes:
    e = Encoder()
    t_time = e.define_gobencoder("time.Time")
    e.encode_value(t_time, encode_go_time(head), ("gobenc",))
    return b"2;" + base64.b64encode(bytes(e.out))


def _wal_line_add_event(delta_ns: int, topic_id: int, data: bytes) -> bytes:
    e = Encoder()
    t_datum = e.define_struct(
        "Datum", [("Delta", INT), ("TopicID", INT), ("Data", BYTES)]
    )
    e.encode_value(
        t_datum,
        {"Delta": delta_ns, "TopicID": topic_id, "Data": data},
        _datum_schema(),
    )
    return b"1;" + base64.b64encode(bytes(e.out))


def test_detect_version_all_generations():
    from fossil_spark.importer import detect_version

    root = os.path.join("build", f"refver_{uuid.uuid4().hex[:8]}")
    try:
        # v2: full fixture
        _write_reference_db(root)
        assert detect_version(root) == 2
        # v1: database file, no metadata
        os.remove(os.path.join(root, "metadata"))
        with open(os.path.join(root, "database"), "wb") as f:
            f.write(b"gob")
        assert detect_version(root) == 1
        # version-less: only wal.log
        os.remove(os.path.join(root, "database"))
        assert detect_version(root) == 0
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_import_versionless_wal_only_db(spark):
    """A reference database that never spilled to disk has ONLY
    wal.log (migration.go:121 detectVersion == 0; db.go NewDatabase
    replays the WAL alone) — the youngest, most likely switcher."""
    root = os.path.join("build", f"refv0_{uuid.uuid4().hex[:8]}")
    dst = os.path.join("build", f"refv0_store_{uuid.uuid4().hex[:8]}")
    try:
        os.makedirs(root)
        h = datetime(2024, 3, 1, tzinfo=timezone.utc)
        lines = [
            _wal_line_add_topic("/"),                 # new-DB bootstrap
            _wal_line_add_segment(h),
            _wal_line_add_topic("/metrics/cpu:float64"),
            _wal_line_add_event(0, 1, struct.pack("<d", 0.25)),
            _wal_line_add_event(60 * 10**9, 1, struct.pack("<d", 0.5)),
            _wal_line_add_topic("/logs"),
            _wal_line_add_event(90 * 10**9, 2, b"hello wal"),
        ]
        with open(os.path.join(root, "wal.log"), "wb") as f:
            f.write(b"\n".join(lines) + b"\n")

        from fossil_spark.importer import (
            import_reference_db, load_reference_db,
        )
        from fossil_spark.store import EventStore

        db = load_reference_db(root)
        assert db["topics"] == ["/", "/metrics/cpu", "/logs"]
        assert db["schemas"][1] == "float64"
        assert len(db["entries"]) == 3

        # distributed=True must fall back to the driver path (no
        # segments directory exists to fan out over)
        n = import_reference_db(spark, root, dst, distributed=True)
        assert n == 3
        store = EventStore(spark, dst)
        rows = sorted(
            (str(r["time"]), r["topic"], r["value"])
            for r in store.read().collect()
        )
        assert rows == [
            ("2024-03-01 00:00:00", "/metrics/cpu", "0.25"),
            ("2024-03-01 00:01:00", "/metrics/cpu", "0.5"),
            ("2024-03-01 00:01:30", "/logs", "hello wal"),
        ]
        assert store.schema_for_topic("/metrics/cpu").text == "float64"
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


def test_import_v1_database(spark):
    """v1 layout (migration.go:59 deserializeV1): one gob `database`
    file, topics default to the "string" schema on migration
    (migration.go:95), WAL applied on top like any other load."""
    root = os.path.join("build", f"refv1_{uuid.uuid4().hex[:8]}")
    dst = os.path.join("build", f"refv1_store_{uuid.uuid4().hex[:8]}")
    try:
        os.makedirs(root)
        h1 = datetime(2023, 6, 1, tzinfo=timezone.utc)
        h2 = datetime(2023, 6, 1, 1, tzinfo=timezone.utc)
        blob = make_v1_database_bytes(
            "legacy", ["/", "/metrics/cpu", "/logs"],
            [
                (h1, [(0, 1, b"7.5"), (30 * 10**9, 2, b"first boot")]),
                (h2, [(0, 1, b"8.5")]),
            ],
        )
        with open(os.path.join(root, "database"), "wb") as f:
            f.write(blob)
        # unflushed tail on top of the v1 segments
        with open(os.path.join(root, "wal.log"), "wb") as f:
            f.write(_wal_line_add_event(45 * 10**9, 2, b"wal tail") + b"\n")

        from fossil_spark.importer import (
            import_reference_db, load_reference_db,
        )
        from fossil_spark.store import EventStore

        db = load_reference_db(root)
        assert db["topics"] == ["/", "/metrics/cpu", "/logs"]
        assert db["schemas"] == ["string"] * 3
        assert [
            (t.isoformat(), topic, data) for t, topic, data in db["entries"]
        ] == [
            ("2023-06-01T00:00:00", "/metrics/cpu", b"7.5"),
            ("2023-06-01T00:00:30", "/logs", b"first boot"),
            ("2023-06-01T01:00:00", "/metrics/cpu", b"8.5"),
            ("2023-06-01T01:00:45", "/logs", b"wal tail"),
        ]

        n = import_reference_db(spark, root, dst)
        assert n == 4
        store = EventStore(spark, dst)
        assert sorted(
            r["value"] for r in store.read().collect()
        ) == ["7.5", "8.5", "first boot", "wal tail"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


def test_load_reference_db(tmp_path=None):
    root = os.path.join("build", f"refdb_{uuid.uuid4().hex[:8]}")
    try:
        _write_reference_db(root)
        from fossil_spark.importer import load_reference_db

        db = load_reference_db(root)
        assert db["topics"] == ["/", "/metrics/cpu", "/logs", "/sensors/temp"]
        assert db["schemas"][3] == "float64"
        ts = [(t.isoformat(), topic, data) for t, topic, data in db["entries"]]
        assert ts == [
            ("2024-01-01T00:00:00", "/metrics/cpu", b"1.5"),
            ("2024-01-01T00:01:00", "/logs", b"boot ok"),
            ("2024-01-01T01:00:00", "/metrics/cpu", b"2.5"),
            ("2024-01-01T02:00:30", "/logs", b"wal entry"),
            ("2024-01-01T02:00:45", "/sensors/temp", struct.pack("<d", 21.5)),
        ]
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_import_reference_db_into_store(spark):
    root = os.path.join("build", f"refimp_{uuid.uuid4().hex[:8]}")
    dst = os.path.join("build", f"refimp_store_{uuid.uuid4().hex[:8]}")
    try:
        _write_reference_db(root)
        from fossil_spark.importer import import_reference_db
        from fossil_spark.store import EventStore

        n = import_reference_db(spark, root, dst)
        assert n == 5
        store = EventStore(spark, dst)
        rows = sorted(
            ((r["time"], r["topic"], r["value"])
             for r in store.read().collect()),
        )
        assert [r[1] for r in rows] == [
            "/metrics/cpu", "/logs", "/metrics/cpu", "/logs", "/sensors/temp"
        ]
        # the typed WAL datum decoded through its declared schema
        assert rows[4][2] == "21.5"
        assert store.schema_for_topic("/sensors/temp").text == "float64"
        # and the imported store is queryable through FQL
        from fossil_spark.fql import fql

        out = fql(
            store.read(), "all in /metrics",
            now=datetime(2024, 1, 2),
        ).collect()
        # entry dumps are unordered DataFrames (display layers sort)
        assert sorted(r["value"] for r in out) == ["1.5", "2.5"]
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


def test_import_reference_db_distributed(spark):
    """The scale path: segment files decode executor-side through the
    binaryFile source + one Arrow pass; results identical to the
    driver-side loader (WAL tail included)."""
    root = os.path.join("build", f"refimpd_{uuid.uuid4().hex[:8]}")
    dst = os.path.join("build", f"refimpd_store_{uuid.uuid4().hex[:8]}")
    try:
        _write_reference_db(root)
        from fossil_spark.importer import import_reference_db
        from fossil_spark.store import EventStore

        n = import_reference_db(spark, root, dst, distributed=True)
        assert n == 5
        store = EventStore(spark, dst)
        rows = sorted(
            (r["time"], r["topic"], r["value"]) for r in store.read().collect()
        )
        assert [(str(t), topic, v) for t, topic, v in rows] == [
            ("2024-01-01 00:00:00", "/metrics/cpu", "1.5"),
            ("2024-01-01 00:01:00", "/logs", "boot ok"),
            ("2024-01-01 01:00:00", "/metrics/cpu", "2.5"),
            ("2024-01-01 02:00:30", "/logs", "wal entry"),
            ("2024-01-01 02:00:45", "/sensors/temp", "21.5"),
        ]
        assert store.schema_for_topic("/sensors/temp").text == "float64"
    finally:
        shutil.rmtree(root, ignore_errors=True)
        shutil.rmtree(dst, ignore_errors=True)


def test_gob_truncated_and_corrupt_streams_error_cleanly():
    with pytest.raises(ValueError):
        Decoder(b"").decode()
    with pytest.raises(ValueError):
        Decoder(bytes([0x07, 0xFF])).decode()       # truncated message
    # a corrupt WAL line is skipped, not fatal (log.go ApplyToDB)
    from fossil_spark.importer import _replay_wal
    import os as _os

    p = os.path.join("build", f"wal_{uuid.uuid4().hex[:8]}.log")
    try:
        with open(p, "wb") as f:
            f.write(b"1;!!!notbase64\n")
            f.write(b"nonsense line\n")
            f.write(b"1;" + base64.b64encode(b"\x07\xff") + b"\n")
        topics, schemas, segs = ["/"], ["string"], []
        _replay_wal(p, topics, schemas, segs)
        assert segs == [] and topics == ["/"]
    finally:
        _os.remove(p)


from hypothesis import given, settings, strategies as st


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.integers(min_value=0, max_value=2**20),
            st.binary(max_size=64),
        ),
        max_size=20,
    ),
    st.datetimes(
        min_value=datetime(1970, 1, 2),
        max_value=datetime(2200, 1, 1),
    ),
)
def test_gob_segment_property_roundtrip(datums, head):
    """Random Datum payloads (negative deltas, zero values that the
    wire omits, binary data) survive the encode->decode round-trip,
    and the documented time layout is exact to the microsecond."""
    head = head.replace(tzinfo=timezone.utc, microsecond=0)
    e, t_seg, seg_schema = _segment_encoder()
    series = [
        {"Delta": d, "TopicID": t, "Data": b} for d, t, b in datums
    ] + [{"Delta": 0, "TopicID": 0, "Data": b""}] * (10000 - len(datums))
    e.encode_value(t_seg, {
        "HeadTime": encode_go_time(head),
        "Series": series,
        "Size": len(datums),
    }, seg_schema)
    seg = Decoder(bytes(e.out)).decode()
    assert go_time(seg["HeadTime"]) == head
    assert seg["Size"] == len(datums)
    got = [
        (d["Delta"], d["TopicID"], d["Data"])
        for d in seg["Series"][:len(datums)]
    ]
    assert got == datums
