"""Property-based tests for the FQL front end (hypothesis)."""

from datetime import timedelta

from hypothesis import given, settings, strategies as st

from fossil_spark.fql.parser import TIMESPAN_DELTAS, ParseError, parse
from fossil_spark.fql.scanner import ScanError

SPANS = list(TIMESPAN_DELTAS)


@given(
    st.lists(
        st.tuples(st.sampled_from(SPANS), st.integers(min_value=1, max_value=999),
                  st.sampled_from(["+", "-"])),
        min_size=1, max_size=4,
    )
)
def test_time_quantity_arithmetic(terms):
    """since ~now - (S1*n1 ± S2*n2 ...) resolves to the sum the
    grammar prescribes (sign applies to the whole quantity)."""
    expr = " ".join(
        (op if i else "") + f" {span} * {n} "
        for i, (span, n, op) in enumerate(terms)
    )
    q = parse(f"all since ~now - {expr}")
    want = timedelta()
    for i, (span, n, op) in enumerate(terms):
        delta = TIMESPAN_DELTAS[span] * n
        want += delta if (i == 0 or op == "+") else -delta
    assert q.time_predicate.begin.delta == -want


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_parser_never_hangs_or_crashes_unexpectedly(s):
    """Arbitrary input either parses or raises a clean engine error —
    never a Python-level exception like IndexError/RecursionError."""
    try:
        parse(s)
    except (ParseError, ScanError):
        pass


@given(st.integers(min_value=1, max_value=10**6))
def test_sample_quantity_roundtrip(n):
    q = parse(f"sample(@second * {n})")
    assert q.quantifier.quantity == timedelta(seconds=n)


@given(st.sampled_from(SPANS), st.sampled_from(SPANS))
def test_two_span_products_rejected(a, b):
    try:
        parse(f"all since ~now - {a} * {b}")
    except (ParseError, ScanError):
        return
    raise AssertionError("multiplying two timespans must be rejected")
