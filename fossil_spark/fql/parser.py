"""Recursive-descent parser for FQL.

Follows the ABNF in /root/reference/docs/grammar.md; operator
precedence mirrors the reference parser
(/root/reference/pkg/query/parser/parser.go): equality < comparison <
additive < multiplicative < unary < primary. Time literals accept the
"vague" formats of parser/times.go.
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from fossil_spark.fql import scanner as sc
from fossil_spark.fql.ast import (
    Binary, Call, Composite, Expr, Ident, Num, Quantifier, Query, Stage,
    Str, Subscript, TimeExpr, TimePredicate, Tuple, Unary,
)

# nanosecond-free timedeltas for each timespan atom; values match the
# reference's TimespanNode.DerivedValue (ast.go:213): month = 30 days,
# year = 365 days.
TIMESPAN_DELTAS = {
    "@second": timedelta(seconds=1),
    "@minute": timedelta(minutes=1),
    "@hour": timedelta(hours=1),
    "@day": timedelta(days=1),
    "@week": timedelta(weeks=1),
    "@month": timedelta(days=30),
    "@year": timedelta(days=365),
}

_DT_FORMATS = [
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%f%z",
    "%Y-%m-%d %H:%M:%S",
    "%Y-%m-%d",
    "%Y/%m/%d",
    "%d/%m/%Y",
    "%b %d, %Y",
]


class ParseError(ValueError):
    pass


def parse_vague_datetime(s: str) -> datetime:
    s = s.strip()
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
    except ValueError:
        dt = None
    if dt is None:
        for fmt in _DT_FORMATS:
            try:
                dt = datetime.strptime(s, fmt)
                break
            except ValueError:
                continue
    if dt is None:
        raise ParseError(f"time {s!r} did not match a known timestamp format")
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc)


class _Parser:
    def __init__(self, tokens: list[sc.Token]):
        self.toks = tokens
        self.pos = 0

    # -- token helpers ---------------------------------------------------
    def peek(self) -> sc.Token:
        return self.toks[self.pos]

    def next(self) -> sc.Token:
        t = self.toks[self.pos]
        self.pos += 1
        return t

    def expect(self, type_: str, lexeme: str | None = None) -> sc.Token:
        t = self.next()
        if t.type != type_ or (lexeme is not None and t.lexeme != lexeme):
            want = lexeme or type_
            raise ParseError(f"expected {want}, got {t.lexeme!r} at {t.pos}")
        return t

    def accept(self, type_: str, lexeme: str | None = None) -> sc.Token | None:
        t = self.peek()
        if t.type == type_ and (lexeme is None or t.lexeme == lexeme):
            return self.next()
        return None

    # -- grammar ----------------------------------------------------------
    def query(self) -> Query:
        q = self.quantifier()
        topic = None
        if self.accept(sc.KEYWORD, "in"):
            topic = self.expect(sc.TOPIC).lexeme
        tp = None
        t = self.peek()
        if t.type == sc.KEYWORD and t.lexeme in ("since", "before", "between"):
            tp = self.time_predicate()
        pipeline = []
        while self.accept(sc.OP, "|"):
            pipeline.append(self.data_function())
        self.expect(sc.EOF)
        return Query(q, topic, tp, pipeline)

    def quantifier(self) -> Quantifier:
        t = self.next()
        if t.type != sc.KEYWORD or t.lexeme not in ("all", "sample"):
            raise ParseError(f"expected quantifier (all, sample), got {t.lexeme!r}")
        if t.lexeme == "all":
            return Quantifier("all")
        self.expect(sc.OP, "(")
        qty = self.time_quantity()
        self.expect(sc.OP, ")")
        return Quantifier("sample", qty)

    def time_predicate(self) -> TimePredicate:
        kind = self.next().lexeme
        begin = self.time_expression()
        if kind == "between":
            self.expect(sc.OP, ",")
            end = self.time_expression()
            return TimePredicate("between", begin, end)
        return TimePredicate(kind, begin)

    def time_expression(self) -> TimeExpr:
        t = self.expect(sc.WHENCE)
        if t.lexeme == "~now":
            whence: str | datetime = "now"
        else:
            whence = parse_vague_datetime(t.lexeme[2:-1])
        delta = timedelta()
        op = self.accept(sc.OP, "-") or self.accept(sc.OP, "+")
        if op:
            qty = self.time_quantity()
            delta = -qty if op.lexeme == "-" else qty
        return TimeExpr(whence, delta)

    def time_quantity(self) -> timedelta:
        total = self.time_term()
        while True:
            op = self.accept(sc.OP, "+") or self.accept(sc.OP, "-")
            if not op:
                return total
            term = self.time_term()
            total = total + term if op.lexeme == "+" else total - term

    def time_term(self) -> timedelta:
        # product of atoms; at most one timespan per product, ints scale it
        scale = 1
        delta: timedelta | None = None
        while True:
            t = self.peek()
            if t.type == sc.TIMESPAN:
                self.next()
                if delta is not None:
                    raise ParseError("cannot multiply two timespans")
                delta = TIMESPAN_DELTAS[t.lexeme]
            elif t.type == sc.INTEGER:
                self.next()
                scale *= int(t.lexeme)
            else:
                raise ParseError(f"expected time atom, got {t.lexeme!r}")
            if not self.accept(sc.OP, "*"):
                break
        return (delta if delta is not None else timedelta(seconds=1)) * scale

    def data_function(self) -> Stage:
        t = self.next()
        if t.type != sc.KEYWORD or t.lexeme not in ("filter", "map", "reduce"):
            raise ParseError(f"expected filter/map/reduce, got {t.lexeme!r}")
        kind = t.lexeme
        args = [self.expect(sc.IDENT).lexeme]
        while self.accept(sc.OP, ","):
            args.append(self.expect(sc.IDENT).lexeme)
        self.expect(sc.OP, "->")
        expr = self.stage_body()
        return Stage(kind, args, expr)

    def stage_body(self) -> Expr:
        # composite: key ":" expr, ... — keys may be quoted strings or
        # bare identifiers (reference: MakeStringNodeFromID sugar)
        if (
            self.peek().type in (sc.STRING, sc.IDENT)
            and self.toks[self.pos + 1].lexeme == ":"
        ):
            entries = []
            while True:
                key = self.next()
                if key.type not in (sc.STRING, sc.IDENT):
                    raise ParseError(f"composite key must be a string, got {key.lexeme!r}")
                self.expect(sc.OP, ":")
                entries.append((key.lexeme, self.expression()))
                if not self.accept(sc.OP, ","):
                    break
            return Composite(entries)
        first = self.expression()
        if self.peek().type == sc.OP and self.peek().lexeme == ",":
            elements = [first]
            while self.accept(sc.OP, ","):
                elements.append(self.expression())
            return Tuple(elements)
        return first

    # -- expressions (precedence: == != < <= > >= < + - < * / < unary) ----
    def expression(self) -> Expr:
        left = self.comparison()
        while True:
            op = self.accept(sc.OP, "==") or self.accept(sc.OP, "!=")
            if not op:
                return left
            left = Binary(left, op.lexeme, self.comparison())

    def comparison(self) -> Expr:
        left = self.additive()
        while True:
            op = None
            for lx in (">=", "<=", ">", "<"):
                op = self.accept(sc.OP, lx)
                if op:
                    break
            if not op:
                return left
            left = Binary(left, op.lexeme, self.additive())

    def additive(self) -> Expr:
        left = self.multiplicative()
        while True:
            op = self.accept(sc.OP, "+") or self.accept(sc.OP, "-")
            if not op:
                return left
            left = Binary(left, op.lexeme, self.multiplicative())

    def multiplicative(self) -> Expr:
        left = self.unary()
        while True:
            op = self.accept(sc.OP, "*") or self.accept(sc.OP, "/")
            if not op:
                return left
            left = Binary(left, op.lexeme, self.unary())

    def unary(self) -> Expr:
        op = self.accept(sc.OP, "-") or self.accept(sc.OP, "+")
        if op:
            return Unary(op.lexeme, self.unary())
        return self.primary()

    def primary(self) -> Expr:
        t = self.peek()
        if t.type == sc.INTEGER:
            self.next()
            return Num(int(t.lexeme))
        if t.type == sc.FLOAT:
            self.next()
            return Num(float(t.lexeme))
        if t.type == sc.STRING:
            self.next()
            return Str(t.lexeme)
        if t.type == sc.OP and t.lexeme == "(":
            self.next()
            e = self.expression()
            if self.peek().lexeme == ",":  # parenthesized tuple, e.g. max((a, b))
                elements = [e]
                while self.accept(sc.OP, ","):
                    elements.append(self.expression())
                e = Tuple(elements)
            self.expect(sc.OP, ")")
            return e
        if t.type == sc.IDENT:
            self.next()
            nxt = self.peek()
            if nxt.type == sc.OP and nxt.lexeme == "(":
                self.next()
                arg = self.stage_body()  # builtins accept tuple args: max((a, b))
                self.expect(sc.OP, ")")
                return Call(t.lexeme, arg)
            if nxt.type == sc.OP and nxt.lexeme == "[":
                self.next()
                sub = self.next()
                if sub.type == sc.INTEGER:
                    key: int | str = int(sub.lexeme)
                elif sub.type in (sc.STRING, sc.IDENT):
                    # bare identifiers act as string keys (reference:
                    # MakeStringNodeFromID sugar, e.g. a[key])
                    key = sub.lexeme
                else:
                    raise ParseError(f"subscript must be integer or string, got {sub.lexeme!r}")
                self.expect(sc.OP, "]")
                return Subscript(Ident(t.lexeme), key)
            return Ident(t.lexeme)
        raise ParseError(f"unexpected token {t.lexeme!r} at {t.pos}")


def parse(text: str) -> Query:
    return _Parser(sc.scan(text)).query()
