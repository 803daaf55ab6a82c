"""Property-based tests (hypothesis) for the session-3 operators:
each property checks the distributed implementation against an
independent brute-force Python computation on randomized inputs.
Example counts are kept small — every example is a real Spark job."""

from __future__ import annotations

import hashlib
import math
from datetime import datetime, timedelta

from hypothesis import given, settings, strategies as st


INTERVALS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=500),   # start seconds
        st.integers(min_value=1, max_value=120),   # duration seconds
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None)
@given(INTERVALS)
def test_interval_coverage_matches_bruteforce(spark, ivs):
    from fossil_spark.operators.timeseries import interval_coverage

    base = datetime(2024, 1, 1)
    rows = [
        (i, 1, base + timedelta(seconds=s), float(d))
        for i, (s, d) in enumerate(ivs)
    ]
    d = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    [r] = interval_coverage(
        d, time_col="ts", duration_col="value", by=["user_id"],
        order_tiebreak=["event_id"],
    ).collect()

    # brute force: merge sorted [s, s+d) pairs
    spans = sorted((s, s + dur) for s, dur in ivs)
    merged: list[list[int]] = []
    for s, e in spans:
        if merged and s <= merged[-1][1]:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    covered = sum(e - s for s, e in merged)
    assert r["n_intervals"] == len(ivs)
    assert r["n_islands"] == len(merged)
    assert r["covered_us"] == covered * 1_000_000


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 9999)),
        min_size=1, max_size=30, unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=8),
)
def test_weighted_sample_matches_bruteforce(spark, rows, k):
    from fossil_spark.operators.text import weighted_sample

    d = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [r["doc_id"] for r in
           weighted_sample(d, k=k, weight_col="n_chars").collect()]

    def key(doc_id, w):
        h = hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()
        u = (int(h[:13], 16) + 1.0) / float(1 << 52)
        return -math.log(u) / w

    want = [i for i, _ in
            sorted(rows, key=lambda t: (key(t[0], t[1]), t[0]))[:k]]
    assert got == want


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=10, max_size=25),
        min_size=2, max_size=6,
    )
)
def test_substring_dedup_matches_bruteforce(spark, docs_tokens):
    from fossil_spark.operators.dedup import substring_dedup_stats

    W = 10
    texts = [" ".join(t) for t in docs_tokens]
    d = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           substring_dedup_stats(d, window_tokens=W).collect()}

    # brute force over actual token windows (binary alphabet makes
    # duplicates frequent)
    from collections import Counter

    win_count: Counter = Counter()
    per_doc_windows = []
    for toks in docs_tokens:
        wins = [tuple(toks[i:i + W]) for i in range(len(toks) - W + 1)]
        per_doc_windows.append(wins)
        win_count.update(wins)
    for doc_id, (toks, wins) in enumerate(zip(docs_tokens, per_doc_windows)):
        dup_positions = set()
        dup_windows = 0
        for pos, wtuple in enumerate(wins):
            if win_count[wtuple] >= 2:
                dup_windows += 1
                dup_positions.update(range(pos, pos + W))
        r = out[doc_id]
        assert r["n_windows"] == len(wins)
        assert r["dup_windows"] == dup_windows
        assert r["dup_tokens"] == len(dup_positions)


@settings(max_examples=5, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-100, max_value=100, allow_nan=False,
                  allow_infinity=False),
        min_size=2, max_size=40,
    )
)
def test_holt_winters_matches_python_recurrence(spark, xs):
    from fossil_spark.operators.timeseries import holt_winters_forecast

    m, alpha, beta, gamma, H = 4, 0.5, 0.3, 0.4, 3
    base = datetime(2024, 1, 1)
    rows = [(i, base + timedelta(hours=i), float(x)) for i, x in enumerate(xs)]
    d = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = sorted(
        holt_winters_forecast(
            d, period=m, horizon=H, alpha=alpha, beta=beta, gamma=gamma,
            time_col="ts", order_tiebreak=["event_id"],
        ).collect(),
        key=lambda r: r["step"],
    )

    lvl, trd = xs[0], 0.0
    s = [0.0] * m
    for t in range(1, len(xs)):
        s_used = s[t % m]
        prev = lvl
        lvl = alpha * (xs[t] - s_used) + (1 - alpha) * (lvl + trd)
        trd = beta * (lvl - prev) + (1 - beta) * trd
        s[t % m] = gamma * (xs[t] - lvl) + (1 - gamma) * s_used
    last_t = len(xs) - 1
    for r in out:
        h = r["step"]
        assert r["forecast"] == lvl + h * trd + s[(last_t + h) % m]
        assert r["level"] == lvl and r["trend"] == trd


SERIES = st.lists(
    st.floats(min_value=-1000, max_value=1000, allow_nan=False,
              allow_infinity=False, width=32),
    min_size=2,
    max_size=400,
)


@settings(max_examples=6, deadline=None)
@given(SERIES, st.integers(min_value=3, max_value=20))
def test_lttb_matches_python_reference(spark, xs, n_out):
    """The Spark LTTB selection equals an independent pure-Python
    implementation of the quantized recurrence on random series —
    guards the integer-exact arithmetic the SQL oracle replays."""
    from fossil_spark.operators.timeseries import lttb

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=17 * i + (i % 5)), float(v))
        for i, v in enumerate(xs)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    got = sorted(
        r["event_id"]
        for r in lttb(
            df, n_out=n_out, time_col="ts", order_tiebreak=["event_id"]
        ).collect()
    )

    # independent reference: plain Python ints/floats, no numpy
    n = len(rows)
    if n <= n_out:
        assert got == list(range(n))
        return
    x = [int((base + timedelta(seconds=17 * i + (i % 5))
              - base).total_seconds() * 1_000_000) for i in range(n)]
    xs0 = [xi - x[0] for xi in x]
    yq = [math.floor(v * 1e6 + 0.5) for v in xs]
    step = (n - 2) / (n_out - 2)
    bounds = [int(k * step + 1) for k in range(n_out - 1)]
    bounds[-1] = n - 1
    keep, a = [0], 0
    for i in range(n_out - 2):
        lo, hi = bounds[i], bounds[i + 1]
        nlo, nhi = (bounds[i + 1], n) if i == n_out - 3 else (
            bounds[i + 1], bounds[i + 2])
        cnt = nhi - nlo
        cx = float(sum(xs0[nlo:nhi])) / cnt
        cy = float(sum(int(q) for q in yq[nlo:nhi])) / cnt
        xa, ya = float(xs0[a]), float(yq[a])
        best, best_j = -1.0, lo
        for j in range(lo, hi):
            area = abs((xa - cx) * (yq[j] - ya) - (xa - xs0[j]) * (cy - ya))
            if area > best:
                best, best_j = area, j
        a = best_j
        keep.append(a)
    keep.append(n - 1)
    assert got == sorted(keep)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 11), st.integers(0, 11)),
        min_size=1, max_size=30,
    )
)
def test_triangles_match_bruteforce(spark, raw_edges):
    """Degree-ordered node-iterator vs O(n^3) adjacency brute force
    on random graphs (self-loops dropped, duplicate edges collapse)."""
    from itertools import combinations

    from fossil_spark.operators import graph

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw_edges if a != b})
    if not edges:
        return
    d = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {r["doc_id"]: (r["degree"], r["n_triangles"])
           for r in graph.triangles(d).collect()}

    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri_count = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                tri_count[n] += 1
    assert got == {n: (len(adj[n]), tri_count[n]) for n in adj}


@settings(max_examples=8, deadline=None)
@given(st.text(alphabet="abcdef \n.", min_size=1, max_size=120))
def test_char_entropy_matches_bruteforce(spark, s):
    """JVM decimal-term entropy vs a pure-Python Counter computation
    (tolerance covers the @8 per-term + @4 sum quantization)."""
    from collections import Counter

    from fossil_spark.operators import text

    d = spark.createDataFrame([(1, s)], "doc_id long, text string")
    [r] = text.char_entropy(d).collect()
    c = Counter(s)
    n = sum(c.values())
    want = -sum((v / n) * math.log2(v / n) for v in c.values())
    assert r["n_chars"] == n and r["n_distinct"] == len(c)
    assert abs(r["entropy"] - want) < 5e-4
    if len(c) > 1:
        assert abs(r["entropy_norm"] - want / math.log2(len(c))) < 5e-3
