"""Minimal decoder/encoder for Go's `gob` stream format.

Implemented from the PUBLIC wire-format specification in the Go
standard library's `encoding/gob` package documentation (the
"Encoding details" / grammar section) — no Go code consulted or
vendored. Scope: exactly what the reference database's on-disk files
need (pkg/database/db.go serializeInternal / log.go WriteAheadLog):

  - unsigned/signed ints, floats, strings/byte slices
  - structs (delta-encoded field numbers, zero fields omitted)
  - slices and fixed arrays
  - GobEncoder types transmitted as opaque byte payloads
    (time.Time via its documented MarshalBinary layout)
  - type-definition messages (wireType and its meta structs)

Validation: the documented example vectors from the package docs are
pinned in tests (uint 7 / 256, int -257, float 17.0, the struct
`{7,0,8}` field encoding, and the full two-message `Point{22,33}`
stream), plus encoder/decoder round-trips over randomized Segment
shapes — the same prove-it strategy as the in-repo image codecs.

The encoder exists for tests and fixture construction; the importer
(fossil_spark/importer.py) only needs the decoder.
"""

from __future__ import annotations

import struct as _struct
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

# seconds from Jan 1 year 1 (Go's absolute epoch) to Jan 1 1970
_UNIX_TO_ABS = 62135596800

# predefined type ids (package docs: "predefined" section)
BOOL, INT, UINT, FLOAT, BYTES, STRING, COMPLEX, INTERFACE = range(1, 9)


# --- primitive layer --------------------------------------------------------

class Reader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def eof(self) -> bool:
        return self.pos >= len(self.data)

    def byte(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("gob: truncated stream")
        b = self.data[self.pos]
        self.pos += 1
        return b

    def take(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("gob: truncated stream")
        out = self.data[self.pos:self.pos + n]
        self.pos += n
        return out

    def read_uint(self) -> int:
        """<128 → one byte; else (256 - n) then n big-endian bytes."""
        b = self.byte()
        if b < 0x80:
            return b
        n = 256 - b
        if n < 1 or n > 8:
            raise ValueError(f"gob: bad uint byte count {n}")
        return int.from_bytes(self.take(n), "big")

    def read_int(self) -> int:
        """Bit 0 is the sign flag (1 = complement the rest)."""
        u = self.read_uint()
        if u & 1:
            return ~(u >> 1)
        return u >> 1

    def read_float(self) -> float:
        """float64 bits byte-reversed, sent as an unsigned int."""
        u = self.read_uint()
        rev = u.to_bytes(8, "big")
        return _struct.unpack(">d", rev[::-1])[0]

    def read_bytes(self) -> bytes:
        return self.take(self.read_uint())


def _w_uint(out: bytearray, v: int) -> None:
    if v < 0x80:
        out.append(v)
        return
    raw = v.to_bytes((v.bit_length() + 7) // 8, "big")
    out.append(256 - len(raw))
    out.extend(raw)


def _w_int(out: bytearray, v: int) -> None:
    _w_uint(out, (~v << 1) | 1 if v < 0 else v << 1)


def _w_float(out: bytearray, v: float) -> None:
    rev = _struct.pack(">d", v)[::-1]
    _w_uint(out, int.from_bytes(rev, "big"))


def _w_bytes(out: bytearray, v: bytes) -> None:
    _w_uint(out, len(v))
    out.extend(v)


# --- type model -------------------------------------------------------------

@dataclass
class WireType:
    """A user type definition (one of the wireType union arms)."""
    kind: str                      # array | slice | struct | map | gobenc
    name: str = ""
    elem: int = 0
    key: int = 0
    length: int = 0
    fields: list = field(default_factory=list)  # [(name, typeid)]


# meta-struct layouts from the documented grammar: field index -> decoder
def _decode_common(r: Reader) -> tuple[str, int]:
    name, tid = "", 0
    prev = -1
    while True:
        delta = r.read_uint()
        if delta == 0:
            return name, tid
        prev += delta
        if prev == 0:
            name = r.read_bytes().decode()
        elif prev == 1:
            tid = r.read_int()
        else:
            raise ValueError("gob: unexpected CommonType field")


def _decode_fieldtype(r: Reader) -> tuple[str, int]:
    name, tid = "", 0
    prev = -1
    while True:
        delta = r.read_uint()
        if delta == 0:
            return name, tid
        prev += delta
        if prev == 0:
            name = r.read_bytes().decode()
        elif prev == 1:
            tid = r.read_int()
        else:
            raise ValueError("gob: unexpected fieldType field")


def _decode_wiretype(r: Reader) -> WireType:
    prev = -1
    wt = WireType(kind="")
    while True:
        delta = r.read_uint()
        if delta == 0:
            if not wt.kind:
                raise ValueError("gob: empty wireType")
            return wt
        prev += delta
        if prev == 0:          # ArrayT
            wt.kind = "array"
            p = -1
            while True:
                d = r.read_uint()
                if d == 0:
                    break
                p += d
                if p == 0:
                    wt.name, _ = _decode_common(r)
                elif p == 1:
                    wt.elem = r.read_int()
                elif p == 2:
                    wt.length = r.read_int()
        elif prev == 1:        # SliceT
            wt.kind = "slice"
            p = -1
            while True:
                d = r.read_uint()
                if d == 0:
                    break
                p += d
                if p == 0:
                    wt.name, _ = _decode_common(r)
                elif p == 1:
                    wt.elem = r.read_int()
        elif prev == 2:        # StructT
            wt.kind = "struct"
            p = -1
            while True:
                d = r.read_uint()
                if d == 0:
                    break
                p += d
                if p == 0:
                    wt.name, _ = _decode_common(r)
                elif p == 1:
                    n = r.read_uint()
                    wt.fields = [_decode_fieldtype(r) for _ in range(n)]
        elif prev == 3:        # MapT
            wt.kind = "map"
            p = -1
            while True:
                d = r.read_uint()
                if d == 0:
                    break
                p += d
                if p == 0:
                    wt.name, _ = _decode_common(r)
                elif p == 1:
                    wt.key = r.read_int()
                elif p == 2:
                    wt.elem = r.read_int()
        elif prev in (4, 5, 6):  # GobEncoderT / BinaryMarshalerT / TextMarshalerT
            wt.kind = "gobenc"
            p = -1
            while True:
                d = r.read_uint()
                if d == 0:
                    break
                p += d
                if p == 0:
                    wt.name, _ = _decode_common(r)
        else:
            raise ValueError(f"gob: unexpected wireType field {prev}")


# --- value decoding ---------------------------------------------------------

class Decoder:
    """Decodes a gob stream into Python values: structs → dicts keyed
    by field name, slices/arrays → lists, GobEncoder types → raw
    payload bytes (interpret per the concrete type, e.g. go_time)."""

    def __init__(self, data: bytes):
        self.r = Reader(data)
        self.types: dict[int, WireType] = {}

    def decode_all(self) -> list:
        out = []
        while not self.r.eof():
            out.append(self._message())
        return [v for v in out if v is not _TYPEDEF]

    def decode(self):
        """Decode the next VALUE in the stream (skipping type defs)."""
        while True:
            if self.r.eof():
                raise ValueError("gob: stream ended before a value")
            v = self._message()
            if v is not _TYPEDEF:
                return v

    def _message(self):
        length = self.r.read_uint()
        end = self.r.pos + length
        tid = self.r.read_int()
        if tid < 0:
            self.types[-tid] = _decode_wiretype(self.r)
            if self.r.pos != end:
                raise ValueError("gob: trailing bytes in type definition")
            return _TYPEDEF
        wt = self.types.get(tid)
        if wt is not None and wt.kind == "struct":
            v = self._value(tid)
        else:
            if self.r.read_uint() != 0:
                raise ValueError("gob: non-zero delta for singleton value")
            v = self._value(tid)
        if self.r.pos != end:
            raise ValueError("gob: trailing bytes in value message")
        return v

    def _value(self, tid: int):
        if tid == BOOL:
            return self.r.read_uint() != 0
        if tid == INT:
            return self.r.read_int()
        if tid == UINT:
            return self.r.read_uint()
        if tid == FLOAT:
            return self.r.read_float()
        if tid == BYTES:
            return self.r.read_bytes()
        if tid == STRING:
            return self.r.read_bytes().decode()
        wt = self.types.get(tid)
        if wt is None:
            raise ValueError(f"gob: unknown type id {tid}")
        if wt.kind == "gobenc":
            return self.r.read_bytes()
        if wt.kind in ("slice", "array"):
            n = self.r.read_uint()
            if wt.kind == "array" and wt.length and n != wt.length:
                raise ValueError("gob: array length mismatch")
            return [self._value(wt.elem) for _ in range(n)]
        if wt.kind == "map":
            n = self.r.read_uint()
            return {
                self._value(wt.key): self._value(wt.elem) for _ in range(n)
            }
        if wt.kind == "struct":
            out = {name: _zero_for(self, fid) for name, fid in wt.fields}
            prev = -1
            while True:
                delta = self.r.read_uint()
                if delta == 0:
                    return out
                prev += delta
                if prev >= len(wt.fields):
                    raise ValueError("gob: field number out of range")
                name, fid = wt.fields[prev]
                out[name] = self._value(fid)
        raise ValueError(f"gob: unhandled kind {wt.kind}")


_TYPEDEF = object()


def _zero_for(dec: Decoder, tid: int):
    if tid == BOOL:
        return False
    if tid in (INT, UINT):
        return 0
    if tid == FLOAT:
        return 0.0
    if tid == BYTES:
        return b""
    if tid == STRING:
        return ""
    wt = dec.types.get(tid)
    if wt is None:
        return None
    if wt.kind == "array":
        # a fixed array's zero value is `length` zero elements (the
        # wire omits the field, but the Go value is full-length)
        return [_zero_for(dec, wt.elem) for _ in range(wt.length)]
    if wt.kind == "slice":
        return []
    if wt.kind == "map":
        return {}
    if wt.kind == "struct":
        return {name: _zero_for(dec, fid) for name, fid in wt.fields}
    return b""  # gobenc


def go_time(payload: bytes) -> datetime:
    """Decode time.Time's documented MarshalBinary layout: version
    byte (1 or 2), 8-byte big-endian seconds since Jan 1 year 1,
    4-byte big-endian nanoseconds, 2-byte big-endian zone offset in
    minutes (-1 = UTC); version 2 appends one byte of offset seconds.
    The (sec, nsec) pair is the absolute instant — zone only affects
    display — so the UTC datetime ignores the offset fields."""
    if not payload or payload[0] not in (1, 2):
        raise ValueError("go_time: unsupported version byte")
    if len(payload) < 15:
        raise ValueError("go_time: truncated payload")
    sec = int.from_bytes(payload[1:9], "big", signed=True)
    nsec = int.from_bytes(payload[9:13], "big", signed=True)
    unix = sec - _UNIX_TO_ABS
    return datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(
        seconds=unix, microseconds=nsec // 1000
    )


# --- encoder (tests / fixtures) --------------------------------------------

class Encoder:
    """Produces streams the Decoder (and, per the pinned documented
    vectors, Go's gob) can read. Type graphs are described explicitly;
    ids are assigned from 65 like the real encoder."""

    def __init__(self):
        self.out = bytearray()
        self.next_id = 65
        self.defined: dict[str, int] = {}

    def _message(self, payload: bytes) -> None:
        head = bytearray()
        _w_uint(head, len(payload))
        self.out.extend(head)
        self.out.extend(payload)

    def define_struct(self, name: str, fields: list[tuple[str, int]]) -> int:
        tid = self.next_id
        self.next_id += 1
        self.defined[name] = tid
        body = bytearray()
        _w_int(body, -tid)
        _w_uint(body, 3)              # wireType field 2: StructT
        _w_uint(body, 1)              # structType field 0: CommonType
        _w_uint(body, 1)              # CommonType field 0: Name
        _w_bytes(body, name.encode())
        _w_uint(body, 1)              # CommonType field 1: Id
        _w_int(body, tid)
        body.append(0)                # end CommonType
        _w_uint(body, 1)              # structType field 1: Field
        _w_uint(body, len(fields))
        for fname, ftid in fields:
            _w_uint(body, 1)
            _w_bytes(body, fname.encode())
            _w_uint(body, 1)
            _w_int(body, ftid)
            body.append(0)
        body.append(0)                # end structType
        body.append(0)                # end wireType
        self._message(bytes(body))
        return tid

    def define_array(self, name: str, elem: int, length: int) -> int:
        tid = self.next_id
        self.next_id += 1
        self.defined[name] = tid
        body = bytearray()
        _w_int(body, -tid)
        _w_uint(body, 1)              # wireType field 0: ArrayT
        _w_uint(body, 1)              # arrayType field 0: CommonType
        _w_uint(body, 1)
        _w_bytes(body, name.encode())
        _w_uint(body, 1)
        _w_int(body, tid)
        body.append(0)
        _w_uint(body, 1)              # Elem
        _w_int(body, elem)
        _w_uint(body, 1)              # Len
        _w_int(body, length)
        body.append(0)
        body.append(0)
        self._message(bytes(body))
        return tid

    def define_slice(self, name: str, elem: int) -> int:
        tid = self.next_id
        self.next_id += 1
        self.defined[name] = tid
        body = bytearray()
        _w_int(body, -tid)
        _w_uint(body, 2)              # wireType field 1: SliceT
        _w_uint(body, 1)              # sliceType field 0: CommonType
        _w_uint(body, 1)
        _w_bytes(body, name.encode())
        _w_uint(body, 1)
        _w_int(body, tid)
        body.append(0)
        _w_uint(body, 1)              # Elem
        _w_int(body, elem)
        body.append(0)
        body.append(0)
        self._message(bytes(body))
        return tid

    def define_gobencoder(self, name: str) -> int:
        tid = self.next_id
        self.next_id += 1
        self.defined[name] = tid
        body = bytearray()
        _w_int(body, -tid)
        _w_uint(body, 5)              # wireType field 4: GobEncoderT
        _w_uint(body, 1)              # gobEncoderType field 0: CommonType
        _w_uint(body, 1)
        _w_bytes(body, name.encode())
        _w_uint(body, 1)
        _w_int(body, tid)
        body.append(0)
        body.append(0)
        body.append(0)
        self._message(bytes(body))
        return tid

    def encode_value(self, tid: int, value, schema) -> None:
        """schema mirrors the type graph: int ids for builtins, or
        ('struct', [(name, tid, subschema)]), ('array'|'slice', elem
        tid, subschema), ('gobenc',) for opaque byte payloads."""
        body = bytearray()
        _w_int(body, tid)
        if isinstance(schema, tuple) and schema[0] == "struct":
            self._enc(body, value, schema)
        else:
            _w_uint(body, 0)          # singleton delta
            self._enc(body, value, schema)
        self._message(bytes(body))

    def _enc(self, out: bytearray, value, schema) -> None:
        if schema == BOOL:
            _w_uint(out, 1 if value else 0)
        elif schema in (INT, UINT):
            (_w_uint if schema == UINT else _w_int)(out, value)
        elif schema == FLOAT:
            _w_float(out, value)
        elif schema == BYTES:
            _w_bytes(out, value)
        elif schema == STRING:
            _w_bytes(out, value.encode())
        elif schema[0] == "gobenc":
            _w_bytes(out, value)
        elif schema[0] in ("array", "slice"):
            _w_uint(out, len(value))
            for v in value:
                self._enc(out, v, schema[2])
        elif schema[0] == "struct":
            prev = -1
            for i, (fname, ftid, fschema) in enumerate(schema[1]):
                v = value.get(fname)
                if _is_zero(v, fschema):
                    continue
                _w_uint(out, i - prev)
                prev = i
                self._enc(out, v, fschema)
            out.append(0)
        else:
            raise ValueError(f"gob encode: bad schema {schema}")


def _is_zero(v, schema) -> bool:
    if v is None:
        return True
    if schema == BOOL:
        return v is False
    if schema in (INT, UINT):
        return v == 0
    if schema == FLOAT:
        return v == 0.0
    if schema in (BYTES, STRING):
        return len(v) == 0
    if isinstance(schema, tuple):
        if schema[0] == "gobenc":
            return len(v) == 0
        if schema[0] in ("array", "slice"):
            return len(v) == 0 or all(_is_zero(x, schema[2]) for x in v)
        if schema[0] == "struct":
            return all(
                _is_zero(v.get(f), s) for f, _t, s in schema[1]
            )
    return False


def encode_go_time(dt: datetime) -> bytes:
    """time.Time MarshalBinary version-1 payload for a UTC instant."""
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    delta = dt - datetime(1970, 1, 1, tzinfo=timezone.utc)
    sec = delta.days * 86400 + delta.seconds
    nsec = delta.microseconds * 1000
    out = bytearray([1])
    out.extend((sec + _UNIX_TO_ABS).to_bytes(8, "big", signed=True))
    out.extend(nsec.to_bytes(4, "big", signed=True))
    out.extend((-1 & 0xFFFF).to_bytes(2, "big"))  # -1 minutes = UTC
    return bytes(out)
