"""AST node definitions for FQL.

Mirrors the shapes in the reference's AST
(/root/reference/pkg/query/ast/ast.go) without copying its
implementation: plain dataclasses, no visitor machinery — the compiler
pattern-matches on node types directly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta


# --- expressions ---------------------------------------------------------

class Expr:
    pass


@dataclass
class Num(Expr):
    value: int | float


@dataclass
class Str(Expr):
    value: str


@dataclass
class Ident(Expr):
    name: str


@dataclass
class Unary(Expr):
    op: str  # '-' or '+'
    operand: Expr


@dataclass
class Binary(Expr):
    left: Expr
    op: str  # + - * / > >= < <= == !=
    right: Expr


@dataclass
class Subscript(Expr):
    base: Ident
    key: int | str


@dataclass
class Call(Expr):
    name: str  # builtin: max / min / len
    arg: Expr


@dataclass
class Tuple(Expr):
    elements: list[Expr]


@dataclass
class Composite(Expr):
    entries: list[tuple[str, Expr]]


# --- time ----------------------------------------------------------------

@dataclass
class TimeExpr:
    """whence ± quantity. whence is 'now' or an absolute datetime;
    quantity is a signed duration resolved at parse time
    (timespan atoms carry the reference's derived values:
    @month = 30 days, @year = 365 days — ast.go:213)."""
    whence: str | datetime  # 'now' or datetime
    delta: timedelta = field(default_factory=timedelta)

    def resolve(self, now: datetime) -> datetime:
        base = now if self.whence == "now" else self.whence
        return base + self.delta


# --- query structure -----------------------------------------------------

@dataclass
class Quantifier:
    kind: str  # 'all' | 'sample'
    quantity: timedelta | None = None  # for sample


@dataclass
class TimePredicate:
    kind: str  # 'since' | 'before' | 'between'
    begin: TimeExpr
    end: TimeExpr | None = None


@dataclass
class Stage:
    kind: str  # 'filter' | 'map' | 'reduce'
    args: list[str]
    expr: Expr  # expression / Tuple / Composite


@dataclass
class Query:
    quantifier: Quantifier
    topic: str | None
    time_predicate: TimePredicate | None
    pipeline: list[Stage]
