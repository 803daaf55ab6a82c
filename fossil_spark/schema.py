"""Fossil schema syntax → Spark types, plus topic-level schema registry.

Grammar parity with /root/reference/docs/schema.md:

    schema     = type / array / composite
    type       = "string" / "binary" / fixed-type
    fixed-type = "boolean" / "int8|16|32|64" / "uint8|16|32|64" /
                 "float32" / "float64"
    array      = "[" digits "]" fixed-type
    composite  = "{" '"key"': value, ... "}"

Mapping notes:
- uintN maps to the next wider signed Spark type (Spark has no
  unsigned integers); uint64 maps to decimal(20,0).
- fossil arrays are fixed-length; Spark arrays are variable — the
  declared length is enforced by validate(), not by the type.
- composites become StructType (values may be anything but another
  composite, as in the reference).

The registry mirrors the reference's topic hierarchy rule
(docs/schema.md, db.go:88 parentSchema): a topic inherits the nearest
ancestor schema, and conflicting sub-topic schemas are rejected.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaError(ValueError):
    pass


_SCALARS: dict[str, T.DataType] = {
    "string": T.StringType(),
    "binary": T.BinaryType(),
    "boolean": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "uint8": T.ShortType(),
    "uint16": T.IntegerType(),
    "uint32": T.LongType(),
    "uint64": T.DecimalType(20, 0),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    # the reference CLI also accepts bare "float" (docs/schema.md table)
    "float": T.DoubleType(),
}

_FIXED = {k for k in _SCALARS if k not in ("string", "binary", "float")}

_ARRAY_RE = re.compile(r"^\[(\d+)\]\s*(\w+)$")


@dataclass
class FossilSchema:
    """A parsed fossil schema: Spark type + array-length constraint."""
    text: str
    spark_type: T.DataType
    array_len: int | None = None
    entries: dict[str, "FossilSchema"] = field(default_factory=dict)


def parse_schema(text: str) -> FossilSchema:
    s = text.strip()
    if not s:
        raise SchemaError("empty schema")
    if s.startswith("{"):
        return _parse_composite(s)
    m = _ARRAY_RE.match(s)
    if m:
        n, elem = int(m.group(1)), m.group(2)
        if elem not in _FIXED:
            raise SchemaError(
                f"array element must be a fixed type, got {elem!r} "
                "(string/binary/composite are variable-length)"
            )
        return FossilSchema(s, T.ArrayType(_SCALARS[elem]), array_len=n)
    if s in _SCALARS:
        return FossilSchema(s, _SCALARS[s])
    raise SchemaError(f"unknown schema type {s!r}")


def _parse_composite(s: str) -> FossilSchema:
    body = s.strip()
    if not body.startswith("{") or not body.endswith("}"):
        raise SchemaError("composite must be wrapped in { }")
    inner = body[1:-1].strip()
    entries: dict[str, FossilSchema] = {}
    # entries are '"key": value' separated by commas; array values
    # contain no commas and keys are quoted, so a regex split is safe
    for part in filter(None, (p.strip() for p in inner.split(","))):
        m = re.match(r'^"([\w\-]+)"\s*:\s*(.+)$', part)
        if not m:
            raise SchemaError(f"bad composite entry {part!r}")
        key, val = m.group(1), m.group(2).strip()
        if val.startswith("{"):
            raise SchemaError("composite values cannot be composites")
        entries[key] = parse_schema(val)
    if not entries:
        raise SchemaError("empty composite")
    struct = T.StructType(
        [T.StructField(k, v.spark_type) for k, v in entries.items()]
    )
    return FossilSchema(s, struct, entries=entries)


def validate(df: DataFrame, schema: FossilSchema, value_col: str = "value") -> DataFrame:
    """Split a raw (string-typed) value column into conforming/
    rejected, mirroring the reference's append-time validation
    (db.go:486: datum not matching the topic schema are rejected).

    Returns the input with two extra columns: `parsed` (typed value or
    null) and `valid` (boolean). Cast-based: stays in codegen."""
    c = F.col(value_col)
    st = schema.spark_type
    if isinstance(st, T.StructType):
        parsed = F.from_json(c, st)
        # from_json is PERMISSIVE: garbage yields an all-null struct, so
        # conformance means every declared field parsed non-null
        valid = parsed.isNotNull()
        for f_ in st.fields:
            valid = valid & parsed.getField(f_.name).isNotNull()
    elif isinstance(st, T.ArrayType):
        parsed = F.from_json(c, st)
        valid = parsed.isNotNull()
        if schema.array_len is not None:
            valid = valid & (F.size(parsed) == schema.array_len)
    elif isinstance(st, (T.StringType, T.BinaryType)):
        parsed = c.cast(st)
        valid = c.isNotNull()
    elif isinstance(st, T.BooleanType):
        parsed = F.when(F.lower(c).isin("true", "false"), F.lower(c) == "true")
        valid = parsed.isNotNull()
    else:
        # try_cast: null on non-conforming input (ANSI-safe)
        parsed = c.try_cast(st)
        valid = parsed.isNotNull()
        if schema.text.startswith("uint"):
            # uintN maps to the next wider signed Spark type, so the
            # cast alone misses both bounds — enforce the fossil range
            lo, hi = _INT_RANGES[schema.text]
            hi_lit = (
                F.expr(f"CAST('{hi}' AS DECIMAL(20,0))")
                if schema.text == "uint64" else F.lit(hi)
            )
            valid = valid & (parsed >= lo) & (parsed <= hi_lit)
    return df.withColumn("parsed", parsed).withColumn("valid", valid)


_INT_RANGES = {
    "int8": (-(1 << 7), (1 << 7) - 1),
    "int16": (-(1 << 15), (1 << 15) - 1),
    "int32": (-(1 << 31), (1 << 31) - 1),
    "int64": (-(1 << 63), (1 << 63) - 1),
    "uint8": (0, (1 << 8) - 1),
    "uint16": (0, (1 << 16) - 1),
    "uint32": (0, (1 << 32) - 1),
    "uint64": (0, (1 << 64) - 1),
}


def conforms(value: str, schema: FossilSchema) -> bool:
    """Driver-side single-datum conformance check, mirroring
    validate()'s cast semantics — used on the server's APPEND hot path
    where spinning a Spark job per datum would be absurd. The
    distributed validate() remains the batch path; both reject exactly
    the datum db.go:486 would."""
    import json

    def scalar_ok(raw, sub: FossilSchema) -> bool:
        st = sub.spark_type
        if isinstance(st, (T.StringType, T.BinaryType)):
            return raw is not None
        if isinstance(st, T.BooleanType):
            return (isinstance(raw, bool)
                    or (isinstance(raw, str) and raw.lower() in ("true", "false")))
        s = str(raw)
        if sub.text in _INT_RANGES or sub.text == "uint64":
            try:
                n = int(s)
            except ValueError:
                return False
            lo, hi = _INT_RANGES[sub.text]
            return lo <= n <= hi
        try:  # float32/float64/float
            float(s)
            return True
        except ValueError:
            return False

    st = schema.spark_type
    if isinstance(st, T.StructType):
        try:
            obj = json.loads(value)
        except (ValueError, TypeError):
            return False
        if not isinstance(obj, dict):
            return False
        return all(
            k in obj and obj[k] is not None and scalar_ok(obj[k], sub)
            for k, sub in schema.entries.items()
        )
    if isinstance(st, T.ArrayType):
        try:
            arr = json.loads(value)
        except (ValueError, TypeError):
            return False
        if not isinstance(arr, list):
            return False
        if schema.array_len is not None and len(arr) != schema.array_len:
            return False
        elem = FossilSchema(schema.text, st.elementType)
        # recover the element's fossil name for range checks
        m = _ARRAY_RE.match(schema.text)
        elem.text = m.group(2) if m else "float64"
        return all(x is not None and scalar_ok(x, elem) for x in arr)
    return scalar_ok(value, schema)


class TopicRegistry:
    """Topic → schema map with hierarchical inheritance and conflict
    rejection (reference: docs/schema.md 'Schemas in the topic
    hierarchy', db.go parentSchema)."""

    DEFAULT = "string"

    def __init__(self) -> None:
        self._schemas: dict[str, FossilSchema] = {}

    def set(self, topic: str, schema_text: str) -> FossilSchema:
        schema = parse_schema(schema_text)
        parent = self._nearest_ancestor(topic)
        if parent is not None and parent.text != schema.text:
            raise SchemaError(
                f"topic {topic!r} inherits schema {parent.text!r} from an "
                "ancestor; conflicting sub-topic schemas are not allowed"
            )
        self._schemas[self._norm(topic)] = schema
        return schema

    def get(self, topic: str) -> FossilSchema:
        found = self._nearest_ancestor(topic, include_self=True)
        return found if found is not None else parse_schema(self.DEFAULT)

    def items(self) -> list[tuple[str, str]]:
        """Declared (topic, schema_text) pairs (LIST schemas parity)."""
        return sorted((t, s.text) for t, s in self._schemas.items())

    def _norm(self, topic: str) -> str:
        t = topic.rstrip("/")
        return t if t.startswith("/") else "/" + t

    def _nearest_ancestor(self, topic: str, include_self: bool = False) -> FossilSchema | None:
        t = self._norm(topic)
        parts = t.split("/")
        # range down to 0 so the root "/" is the final ancestor — a
        # schema declared on "/" governs every topic (db.go parentSchema
        # walks to root)
        candidates = ["/".join(parts[:i]) or "/" for i in range(len(parts), 0, -1)]
        if not include_self:
            candidates = candidates[1:]
        for cand in candidates:
            if cand in self._schemas:
                return self._schemas[cand]
        return None
