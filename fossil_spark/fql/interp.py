"""Tiny Python interpreter for FQL expressions — the slow-path engine
behind reduce expressions that don't match an associative aggregate
shape (fql/compiler.py compiles those to real Spark aggregations).

Value semantics mirror the reference (types/value.go): int op int
stays int except '/', which yields float (value.go:426); max/min
upcast; strings support '+' (concat) and comparisons.
"""

from __future__ import annotations

from fossil_spark.fql import ast


class EvalError(ValueError):
    pass


def eval_expr(e: ast.Expr, env: dict[str, object]) -> object:
    if isinstance(e, ast.Num):
        return e.value
    if isinstance(e, ast.Str):
        return e.value
    if isinstance(e, ast.Ident):
        if e.name not in env:
            raise EvalError(f"unbound identifier {e.name!r}")
        return env[e.name]
    if isinstance(e, ast.Subscript):
        base = env.get(e.base.name)
        if base is None:
            raise EvalError(f"unbound identifier {e.base.name!r}")
        if isinstance(e.key, int):
            return base[e.key]
        return base[e.key]  # composite dict
    if isinstance(e, ast.Unary):
        v = eval_expr(e.operand, env)
        return -v if e.op == "-" else v
    if isinstance(e, ast.Binary):
        l, r = eval_expr(e.left, env), eval_expr(e.right, env)
        op = e.op
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            return l / r  # int/int -> float, like the reference
        if op == ">":
            return l > r
        if op == ">=":
            return l >= r
        if op == "<":
            return l < r
        if op == "<=":
            return l <= r
        if op == "==":
            return l == r
        if op == "!=":
            return l != r
        raise EvalError(f"unknown operator {op!r}")
    if isinstance(e, ast.Call):
        arg = eval_expr(e.arg, env) if not isinstance(e.arg, ast.Tuple) else tuple(
            eval_expr(x, env) for x in e.arg.elements
        )
        if e.name == "max":
            return max(arg)
        if e.name == "min":
            return min(arg)
        if e.name == "len":
            return len(arg)
        raise EvalError(f"unknown builtin {e.name!r}")
    if isinstance(e, ast.Tuple):
        return tuple(eval_expr(x, env) for x in e.elements)
    if isinstance(e, ast.Composite):
        return {k: eval_expr(v, env) for k, v in e.entries}
    raise EvalError(f"cannot evaluate {type(e).__name__}")
