"""Schema grammar, validation, and topic-hierarchy rules (mirrors the
reference's docs/schema.md semantics)."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from fossil_spark.schema import (
    SchemaError, TopicRegistry, parse_schema, validate,
)


def test_scalar_types():
    assert parse_schema("string").spark_type == T.StringType()
    assert parse_schema("binary").spark_type == T.BinaryType()
    assert parse_schema("boolean").spark_type == T.BooleanType()
    assert parse_schema("int8").spark_type == T.ByteType()
    assert parse_schema("int64").spark_type == T.LongType()
    assert parse_schema("uint16").spark_type == T.IntegerType()
    assert parse_schema("uint64").spark_type == T.DecimalType(20, 0)
    assert parse_schema("float32").spark_type == T.FloatType()
    assert parse_schema("float64").spark_type == T.DoubleType()


def test_array_types():
    s = parse_schema("[4]int32")
    assert s.spark_type == T.ArrayType(T.IntegerType())
    assert s.array_len == 4


def test_array_rejects_variable_length_elements():
    with pytest.raises(SchemaError):
        parse_schema("[4]string")
    with pytest.raises(SchemaError):
        parse_schema("[2]binary")


def test_composite():
    s = parse_schema('{"coordinates": [2]int32, "action": string}')
    assert isinstance(s.spark_type, T.StructType)
    assert s.spark_type.fieldNames() == ["coordinates", "action"]
    assert s.entries["coordinates"].array_len == 2


def test_composite_rejects_nested_composite():
    with pytest.raises(SchemaError):
        parse_schema('{"a": {"b": int8}}')


def test_unknown_type():
    with pytest.raises(SchemaError):
        parse_schema("quux")


@given(st.sampled_from(["int8", "int16", "int32", "int64"]),
       st.integers(min_value=1, max_value=64))
def test_array_roundtrip_property(elem, n):
    s = parse_schema(f"[{n}]{elem}")
    assert s.array_len == n


def test_validate_int(spark):
    df = spark.createDataFrame(
        [("1",), ("notanint",), ("-5",)], "value string"
    )
    out = validate(df, parse_schema("int32")).collect()
    by_val = {r["value"]: r["valid"] for r in out}
    assert by_val == {"1": True, "notanint": False, "-5": True}


def test_validate_uint_rejects_negative(spark):
    df = spark.createDataFrame([("5",), ("-5",)], "value string")
    out = {r["value"]: r["valid"] for r in validate(df, parse_schema("uint8")).collect()}
    assert out == {"5": True, "-5": False}


def test_validate_array_length(spark):
    df = spark.createDataFrame([("[1,2]",), ("[1,2,3]",)], "value string")
    out = {r["value"]: r["valid"] for r in
           validate(df, parse_schema("[2]int32")).collect()}
    assert out == {"[1,2]": True, "[1,2,3]": False}


def test_validate_composite(spark):
    df = spark.createDataFrame(
        [('{"coordinates": [1, 2], "action": "move"}',), ("junk",)], "value string"
    )
    schema = parse_schema('{"coordinates": [2]int32, "action": string}')
    out = {r["value"]: r["valid"] for r in validate(df, schema).collect()}
    assert out['{"coordinates": [1, 2], "action": "move"}'] is True
    assert out["junk"] is False


def test_store_schema_enforcement(spark, tmp_path_factory):
    import os
    import shutil
    import uuid
    from datetime import datetime

    import pytest as _pytest

    from fossil_spark.store import EventStore

    root = os.path.join("build", f"schema_store_{uuid.uuid4().hex[:8]}")
    try:
        st = EventStore(spark, root)
        st.set_schema("/sensors/temp", "float64")
        # conforming appends land
        st.append_rows([(datetime(2024, 1, 1), "/sensors/temp", "71.5")])
        # non-conforming appends are rejected (reference db.go:486)
        with _pytest.raises(SchemaError):
            st.append_rows([(datetime(2024, 1, 2), "/sensors/temp", "notafloat")])
        # sub-topic schema conflicts are rejected
        with _pytest.raises(SchemaError):
            st.set_schema("/sensors/temp/garage", "int32")
        # typed query: arithmetic on the declared float64, no coercion
        st.append_rows([(datetime(2024, 1, 3), "/sensors/temp", "86.0")])
        out = st.query_typed("all | map F -> 5/9 * (F-32)", "/sensors/temp")
        vals = sorted(round(r["value"], 6) for r in out.collect())
        assert vals == [round(5 / 9 * (71.5 - 32), 6), 30.0]
        assert st.schema_for_topic("/sensors/temp/attic").text == "float64"
        assert st.schema_for_topic("/logs").text == "string"
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_topic_registry_inheritance():
    reg = TopicRegistry()
    reg.set("/sensors/temp", "float64")
    # sub-topics inherit
    assert reg.get("/sensors/temp/garage").text == "float64"
    # same schema on sub-topic is fine
    reg.set("/sensors/temp/garage", "float64")
    # conflicting sub-topic schema is rejected (docs/schema.md)
    with pytest.raises(SchemaError):
        reg.set("/sensors/temp/attic", "int32")
    # unrelated topics default to string
    assert reg.get("/logs").text == "string"


def test_root_schema_governs_all_topics():
    # a schema declared on "/" is the ancestor of every topic
    # (db.go parentSchema walks to root)
    from fossil_spark.schema import TopicRegistry

    reg = TopicRegistry()
    reg.set("/", "float64")
    assert reg.get("/any/deeply/nested/topic").text == "float64"
    with pytest.raises(SchemaError):
        reg.set("/sub", "int32")  # conflicts with the root schema


def test_conforms_mirrors_validate_semantics():
    from fossil_spark.schema import conforms, parse_schema

    f64 = parse_schema("float64")
    assert conforms("1.5", f64) and not conforms("nope", f64)
    i8 = parse_schema("int8")
    assert conforms("127", i8) and not conforms("128", i8)
    assert not conforms("3.5", i8)
    u32 = parse_schema("uint32")
    assert conforms("0", u32) and not conforms("-1", u32)
    b = parse_schema("boolean")
    assert conforms("True", b) and not conforms("1", b)
    arr = parse_schema("[3]int32")
    assert conforms("[1, 2, 3]", arr)
    assert not conforms("[1, 2]", arr) and not conforms('["a","b","c"]', arr)
    comp = parse_schema('{"k": int32, "s": string}')
    assert conforms('{"k": 5, "s": "x"}', comp)
    assert not conforms('{"k": "bad", "s": "x"}', comp)
    assert not conforms('{"s": "x"}', comp)


@settings(deadline=None, max_examples=25)
@given(
    st.sampled_from(["int8", "int16", "int32", "int64", "uint8", "uint16",
                     "uint32", "float64", "boolean", "string"]),
    st.lists(
        st.one_of(
            st.integers(-300, 300).map(str),
            st.floats(-1e6, 1e6, allow_nan=False).map(str),
            st.sampled_from(["true", "False", "nope", "", "3.5", "-1", "128",
                             "255", "65536", "hello world"]),
        ),
        min_size=1, max_size=8,
    ),
)
def test_conforms_agrees_with_distributed_validate(schema_name, values):
    # the server's per-datum gate (conforms) and the batch gate
    # (validate) must accept/reject identically, or the wire path
    # admits datum the store would reject
    from fossil_spark.schema import conforms, parse_schema, validate

    schema = parse_schema(schema_name)
    got = [conforms(v, schema) for v in values]

    from fossil_spark.session import get_spark

    spark = get_spark("fossil_spark-tests", shuffle_partitions=8)
    df = spark.createDataFrame([(v,) for v in values], "value string")
    want = [r["valid"] for r in validate(df, schema).collect()]
    assert got == want, f"{schema_name}: conforms={got} validate={want} on {values}"
