"""Scanner/parser golden tests, modeled on the reference's
scanner_test.go / parser_test.go cases."""

from datetime import datetime, timedelta, timezone

import pytest

from fossil_spark.fql import ast
from fossil_spark.fql import scanner as sc
from fossil_spark.fql.parser import parse, parse_vague_datetime


def test_scan_simple_query():
    toks = sc.scan("all in /visits since ~now - @day")
    types = [t.type for t in toks]
    assert types == [sc.KEYWORD, sc.KEYWORD, sc.TOPIC, sc.KEYWORD, sc.WHENCE,
                     sc.OP, sc.TIMESPAN, sc.EOF]


def test_scan_pipeline_tokens():
    toks = sc.scan('all | map x -> 1, x | reduce a, b -> a[0] + b[0]')
    lexemes = [t.lexeme for t in toks if t.type == sc.OP]
    assert "->" in lexemes and "|" in lexemes and "[" in lexemes


def test_scan_operators():
    toks = sc.scan("x >= 1 != 2 <= 3 == 4 < 5 > 6")
    ops = [t.lexeme for t in toks if t.type == sc.OP]
    assert ops == [">=", "!=", "<=", "==", "<", ">"]


def test_scan_string_literals():
    toks = sc.scan("\"hello\" 'world'")
    assert [t.lexeme for t in toks[:2]] == ["hello", "world"]


def test_parse_all():
    q = parse("all")
    assert q.quantifier.kind == "all"
    assert q.topic is None and q.time_predicate is None and q.pipeline == []


def test_parse_topic():
    q = parse("all in /foo/bar")
    assert q.topic == "/foo/bar"


def test_parse_sample():
    q = parse("sample(@minute) in /cpu-usage since ~now - @week")
    assert q.quantifier.kind == "sample"
    assert q.quantifier.quantity == timedelta(minutes=1)
    assert q.time_predicate.kind == "since"
    assert q.time_predicate.begin.delta == -timedelta(weeks=1)


def test_parse_time_arithmetic():
    # grammar: whence "-" time-quantity — the sign applies to the WHOLE
    # quantity (7d + 1h), matching the reference's TimeExpressionNode
    q = parse("all since ~now - @day * 7 + @hour")
    assert q.time_predicate.begin.delta == -(timedelta(days=7) + timedelta(hours=1))


def test_parse_absolute_time():
    q = parse("all between ~(2024-01-01T00:00:00Z), ~(2024-01-15T12:00:00Z)")
    tp = q.time_predicate
    assert tp.kind == "between"
    assert tp.begin.resolve(datetime.now(timezone.utc)) == datetime(2024, 1, 1, tzinfo=timezone.utc)
    assert tp.end.resolve(datetime.now(timezone.utc)) == datetime(2024, 1, 15, 12, tzinfo=timezone.utc)


def test_parse_filter_pipeline():
    q = parse("all in /latency | filter x -> x > 50")
    assert len(q.pipeline) == 1
    st = q.pipeline[0]
    assert st.kind == "filter" and st.args == ["x"]
    assert isinstance(st.expr, ast.Binary) and st.expr.op == ">"


def test_parse_map_tuple():
    q = parse("all | map x -> 1, x")
    st = q.pipeline[0]
    assert isinstance(st.expr, ast.Tuple) and len(st.expr.elements) == 2


def test_parse_map_composite():
    q = parse('all | map x -> "count": 1, "val": x')
    st = q.pipeline[0]
    assert isinstance(st.expr, ast.Composite)
    assert [k for k, _ in st.expr.entries] == ["count", "val"]


def test_parse_full_avg_pipeline():
    q = parse(
        "all in /latency | map x -> 1, x | reduce a, b -> a[0] + b[0], a[1] + b[1] "
        "| map count, sum -> sum / count"
    )
    assert [s.kind for s in q.pipeline] == ["map", "reduce", "map"]
    red = q.pipeline[1]
    assert red.args == ["a", "b"]
    assert isinstance(red.expr, ast.Tuple)


def test_parse_builtin_call():
    q = parse("all | reduce a, b -> max((a, b))")
    e = q.pipeline[0].expr
    assert isinstance(e, ast.Call) and e.name == "max"


def test_parse_subscript_string():
    q = parse('all | map x -> x["temp"]')
    e = q.pipeline[0].expr
    assert isinstance(e, ast.Subscript) and e.key == "temp"


def test_parse_precedence():
    # 5/9 * (F-32): '/' and '*' bind tighter than '-' inside parens
    q = parse("all | map F -> 5/9 * (F-32)")
    e = q.pipeline[0].expr
    assert isinstance(e, ast.Binary) and e.op == "*"
    assert isinstance(e.left, ast.Binary) and e.left.op == "/"


def test_vague_datetime_formats():
    assert parse_vague_datetime("2024-01-02T03:04:05Z").hour == 3
    assert parse_vague_datetime("2024/01/02").year == 2024
    assert parse_vague_datetime("Jan 02, 2024").day == 2


def test_parse_errors():
    with pytest.raises(Exception):
        parse("bogus in /topic")
    with pytest.raises(Exception):
        parse("all | frobnicate x -> 1")
