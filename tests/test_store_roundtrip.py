"""Property-based store round-trip: arbitrary (time, topic, value)
batches survive append -> read -> FQL intact."""

import os
import shutil
import uuid
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings, strategies as st

from fossil_spark.store import EventStore

TOPICS = ["/a", "/a/b", "/a/b/c", "/logs", "/metrics/cpu"]

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=10_000_000),  # seconds offset
        st.sampled_from(TOPICS),
        st.text(
            alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=0x2FF),
            min_size=0, max_size=40,
        ),
    ),
    min_size=1,
    max_size=25,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows_strategy)
def test_append_read_roundtrip(spark, raw):
    base = datetime(2024, 1, 1)
    rows = [(base + timedelta(seconds=s), t, v) for s, t, v in raw]
    root = os.path.join("build", f"rt_{uuid.uuid4().hex[:8]}")
    try:
        store = EventStore(spark, root)
        store.append_rows(rows)
        got = sorted(
            (r["time"], r["topic"], r["value"]) for r in store.read().collect()
        )
        assert got == sorted(rows)
        # topic subtree selection agrees with a Python-side filter
        got_a = store.query("all in /a").count()
        want_a = sum(1 for _, t, _ in rows if t.startswith("/a"))
        assert got_a == want_a
    finally:
        shutil.rmtree(root, ignore_errors=True)
