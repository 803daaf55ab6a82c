"""Round-11 batch 6: KPSS, Markov entropy rate, token coverage,
Bloom sizing audit."""

import hashlib
import math
import re
from datetime import datetime, timedelta

from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# KPSS
# --------------------------------------------------------------------------

def test_kpss_alternating_closed_form(spark):
    """Alternating -1/+1 over 40 hourly buckets: mean 0 exactly, so
    e = v; partial sums alternate -1,0; gamma_l = (-1)^l (40-l)/40.
    Everything is exact through the quantizers, so the statistic
    matches the closed form and flags level-stationary."""
    from fossil_spark.operators.timeseries import kpss

    t0 = datetime(2024, 1, 1)
    n = 40
    df = spark.createDataFrame(
        [(t0 + timedelta(hours=i), "/m", float(-1 if i % 2 == 0 else 1))
         for i in range(n)],
        "time timestamp, topic string, value double",
    )
    row = kpss(df, by=["topic"]).collect()[0]
    num = 20.0 / (n * n)  # twenty S_t = -1 rows
    lrv = 1.0
    for l in range(1, 9):
        w = 1.0 - l / 9.0
        g = ((-1) ** l) * (n - l) / n
        lrv += 2.0 * w * g
    assert row["n_buckets"] == n
    assert abs(row["lrv"] - lrv) < 1e-5
    assert abs(row["kpss_stat"] - num / lrv) < 1e-4
    assert row["level_stationary_5pct"] is True


def test_kpss_trend_rejects(spark):
    """A deterministic trend accumulates huge partial sums: the
    statistic blows past 0.463 and stationarity is rejected."""
    from fossil_spark.operators.timeseries import kpss

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0 + timedelta(hours=i), "/t", float(i)) for i in range(60)],
        "time timestamp, topic string, value double",
    )
    row = kpss(df, by=["topic"]).collect()[0]
    assert row["kpss_stat"] > 0.463
    assert row["level_stationary_5pct"] is False
    # too-short keys drop (need > bandwidth + 1 buckets)
    tiny = spark.createDataFrame(
        [(t0 + timedelta(hours=i), "/s", float(i % 2)) for i in range(9)],
        "time timestamp, topic string, value double",
    )
    assert kpss(tiny, by=["topic"]).count() == 0


# --------------------------------------------------------------------------
# Markov entropy rate
# --------------------------------------------------------------------------

def test_markov_entropy_matches_python(spark):
    """Transition counts, per-row Shannon entropy and the
    occupancy-weighted rate recomputed independently in pandas."""
    from fossil_spark.queries.analytics import markov_entropy
    from fossil_spark.session import read_table

    got = {r["state"]: r for r in markov_entropy(spark, SF_DIR).collect()}
    ev = (
        read_table(spark, SF_DIR, "events")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    counts = {}
    for _, g in ev.groupby("user_id"):
        types = g["event_type"].tolist()
        for a, b in zip(types, types[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    rows = {}
    for (a, b), n in counts.items():
        rows.setdefault(a, {})[b] = n
    tot_all = sum(counts.values())
    rate = 0.0
    for a, out in rows.items():
        tot = sum(out.values())
        h = -sum(
            (n / tot) * math.log2(n / tot) for n in out.values()
        )
        occ = tot / tot_all
        r = got[a]
        assert r["n_transitions"] == tot, a
        assert abs(r["row_entropy_bits"] - h) < 1e-4, a
        assert abs(r["occupancy"] - occ) < 1e-5, a
        rate += occ * h
    for r in got.values():
        assert abs(r["entropy_rate_bits"] - rate) < 1e-4
        # a k-state chain's rate is bounded by log2(k)
        assert 0.0 <= r["entropy_rate_bits"] <= math.log2(len(got))


# --------------------------------------------------------------------------
# token coverage
# --------------------------------------------------------------------------

def test_token_coverage_known_answer(spark):
    """Vocab a*5 b*3 c*2 d*1 e*1: top-1 covers 5/12 of the mass,
    top-3 covers 10/12."""
    from fossil_spark.operators.text import token_coverage

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a a b c d e")],
        "doc_id long, text string",
    )
    got = {r["vocab_cut"]: r
           for r in token_coverage(docs, cuts=[1, 3]).collect()}
    assert got[1]["n_types_total"] == 5
    assert got[1]["n_types_used"] == 1
    assert got[1]["covered_occurrences"] == 5
    assert got[1]["total_occurrences"] == 12
    assert abs(got[1]["mass_share"] - 5 / 12) < 1e-6
    assert got[3]["n_types_used"] == 3
    assert got[3]["covered_occurrences"] == 10
    assert abs(got[3]["mass_share"] - 10 / 12) < 1e-6


# --------------------------------------------------------------------------
# Bloom audit
# --------------------------------------------------------------------------

def test_bloom_audit_matches_python(spark):
    """Bit positions, fill ratio and the measured false-positive rate
    recomputed independently with hashlib at 2^4 bits (dense, many
    collisions) and 2^30 (sparse, fp ~ 0)."""
    from fossil_spark.operators.dedup import bloom_audit

    texts = [f"document number {i} body" for i in range(20)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    got = {r["m_bits_log2"]: r
           for r in bloom_audit(docs, m_bits_log2=[4, 30]).collect()}

    def norm(t):
        return re.sub(r"\s+", " ", t.strip().lower())

    members = {hashlib.md5(norm(t).encode()).hexdigest() for t in texts}

    def bit(prefix, key, m):
        return int(
            hashlib.md5(f"{prefix}:{key}".encode()).hexdigest()[:13], 16
        ) % (2 ** m)

    for m in (4, 30):
        bits = {bit(f"bf{j}", k, m) for k in members for j in (1, 2, 3)}
        nfp = 0
        for i in range(20):
            pb = [bit(f"bloomprobe{j}", str(i), m) for j in (1, 2, 3)]
            if all(b in bits for b in pb):
                nfp += 1
        r = got[m]
        assert r["n_members"] == len(members), m
        assert r["bits_set"] == len(bits), m
        assert abs(r["fill_ratio"] - len(bits) / 2 ** m) < 1e-6, m
        assert abs(r["fp_measured"] - nfp / 20) < 1e-6, m
    assert got[4]["fp_measured"] >= 0.5  # dense filter lies a lot
    assert got[30]["fp_measured"] == 0.0
    assert got[30]["fp_theoretical"] < 1e-6
