"""Round-11 batch 3: A/B KS, quantile treatment effects, EB
shrinkage, intermittency classification, PPS audit, NDCG@k."""

import hashlib
import math
from datetime import datetime, timedelta

from tests.conftest import SF_DIR


def _variant(user) -> int:
    return int(hashlib.md5(f"ab:{user}".encode()).hexdigest()[:8], 16) % 2


# --------------------------------------------------------------------------
# A/B KS
# --------------------------------------------------------------------------

def test_ks_ab_matches_python(spark):
    """Exact ECDF max-gap recomputed independently in Python over
    per-user totals and hashlib variants."""
    from fossil_spark.queries.analytics import ks_ab
    from fossil_spark.session import read_table

    row = ks_ab(spark, SF_DIR).collect()[0]
    pu = (
        read_table(spark, SF_DIR, "events")
        .toPandas().groupby("user_id")["value"].sum()
    )
    a = sorted(m for u, m in pu.items() if _variant(u) == 0)
    b = sorted(m for u, m in pu.items() if _variant(u) == 1)
    na, nb = len(a), len(b)
    d = max(
        abs(sum(1 for x in a if x <= v) / na
            - sum(1 for x in b if x <= v) / nb)
        for v in a + b
    )
    crit = 1.358 * math.sqrt((na + nb) / (na * nb))
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert abs(row["ks_d"] - d) < 1e-6
    assert abs(row["ks_crit"] - crit) < 1e-6
    assert row["significant_95"] == (d > crit)


# --------------------------------------------------------------------------
# QTE
# --------------------------------------------------------------------------

def test_qte_matches_numpy(spark):
    """Deciles per arm vs numpy's linear-interpolation percentile
    (the same definition as Spark percentile / DuckDB
    quantile_cont)."""
    import numpy as np

    from fossil_spark.queries.analytics import quantile_treatment_effect
    from fossil_spark.session import read_table

    rows = {r["quantile"]: r
            for r in quantile_treatment_effect(spark, SF_DIR).collect()}
    assert len(rows) == 9
    pu = (
        read_table(spark, SF_DIR, "events")
        .toPandas().groupby("user_id")["value"].sum()
    )
    a = np.array([m for u, m in pu.items() if _variant(u) == 0])
    b = np.array([m for u, m in pu.items() if _variant(u) == 1])
    for i in range(1, 10):
        p = i / 10.0
        qa = float(np.percentile(a, p * 100.0))
        qb = float(np.percentile(b, p * 100.0))
        r = rows[p]
        assert abs(r["q_a"] - qa) < 1e-4, p
        assert abs(r["q_b"] - qb) < 1e-4, p
        assert abs(r["qte"] - (qb - qa)) < 1e-4, p


# --------------------------------------------------------------------------
# EB shrinkage
# --------------------------------------------------------------------------

def test_eb_shrinkage_matches_python(spark):
    """MoM beta prior + posterior means recomputed independently;
    plus the structural guarantees: every shrunk rate lies between
    the raw rate and the prior mean, and shrinkage magnitude falls
    with n."""
    from fossil_spark.queries.analytics import eb_shrinkage
    from fossil_spark.session import read_table

    got = {r["user_id"]: r for r in eb_shrinkage(spark, SF_DIR).collect()}
    ev = read_table(spark, SF_DIR, "events").toPandas()
    g = ev.groupby("user_id").agg(
        n=("event_id", "size"),
        x=("event_type", lambda s: int((s == "purchase").sum())),
    )
    rates = (g["x"] / g["n"]).tolist()
    k = len(rates)
    m = sum(rates) / k
    v = sum((r - m) ** 2 for r in rates) / (k - 1)
    ab = m * (1 - m) / v - 1.0
    assert ab > 0  # real data is overdispersed vs binomial-at-fixed-p
    alpha = m * ab
    for uid, row_ in g.iterrows():
        n, x = int(row_["n"]), int(row_["x"])
        raw = x / n
        shrunk = (alpha + x) / (ab + n)
        r = got[uid]
        assert (r["n_events"], r["n_conversions"]) == (n, x)
        assert abs(r["rate_raw"] - raw) < 1e-6
        assert abs(r["rate_shrunk"] - shrunk) < 1e-5
        lo, hi = sorted((raw, m))
        assert lo - 1e-6 <= r["rate_shrunk"] <= hi + 1e-6


# --------------------------------------------------------------------------
# intermittency
# --------------------------------------------------------------------------

def test_intermittency_known_answer(spark):
    """Demands 1@h0, 3@h3, 5@h6: span = 7 buckets, 3 demand buckets,
    ADI = 7/3, cv2 = 4/9 -> 'intermittent' (ADI >= 1.32,
    cv2 < 0.49)."""
    from fossil_spark.operators.timeseries import intermittency

    t0 = datetime(2024, 1, 1)
    rows = []
    for h, c in [(0, 1), (3, 3), (6, 5)]:
        for i in range(c):
            rows.append((t0 + timedelta(hours=h, minutes=i), "/m", 1.0))
    df = spark.createDataFrame(
        rows, "time timestamp, topic string, value double"
    )
    r = intermittency(df, by=["topic"]).collect()[0]
    assert (r["n_buckets_span"], r["n_demand_buckets"]) == (7, 3)
    assert abs(r["adi"] - 7.0 / 3.0) < 1e-6
    assert abs(r["cv2"] - 4.0 / 9.0) < 1e-6
    assert r["pattern"] == "intermittent"


def test_intermittency_quadrants(spark):
    """Dense equal demands -> smooth; dense spiky demands ->
    erratic."""
    from fossil_spark.operators.timeseries import intermittency

    t0 = datetime(2024, 1, 1)
    smooth = [(t0 + timedelta(hours=h), "/s", 1.0) for h in range(6)]
    # erratic: every hour has demand, sizes 1,9 alternating
    erratic = []
    for h in range(6):
        for i in range(1 if h % 2 == 0 else 9):
            erratic.append(
                (t0 + timedelta(hours=h, minutes=i), "/e", 1.0)
            )
    df = spark.createDataFrame(
        smooth + erratic, "time timestamp, topic string, value double"
    )
    r = {row["topic"]: row
         for row in intermittency(df, by=["topic"]).collect()}
    assert r["/s"]["pattern"] == "smooth" and r["/s"]["adi"] == 1.0
    assert r["/e"]["pattern"] == "erratic" and r["/e"]["adi"] == 1.0
    assert r["/e"]["cv2"] >= 0.49


# --------------------------------------------------------------------------
# PPS audit
# --------------------------------------------------------------------------

def test_pps_audit_matches_python(spark):
    """Inclusion probabilities, md5 draws, and HT weights recomputed
    independently on a crafted corpus."""
    from fossil_spark.operators.text import pps_sample_audit

    docs = [("s1", i, 100 * (i + 1)) for i in range(10)] + [
        ("s2", 100 + i, 5000) for i in range(4)
    ]
    df = spark.createDataFrame(
        docs, "source string, doc_id long, n_chars long"
    )
    k = 5
    got = {r["source"]: r
           for r in pps_sample_audit(df, k=k).collect()}
    tot = float(sum(d[2] for d in docs))
    exp, sel, ht, szsel = {}, {}, {}, {}
    for src, did, sz in docs:
        pi = min(1.0, k * sz / tot)
        u = int(
            hashlib.md5(f"pps:{did}".encode()).hexdigest()[:13], 16
        ) / 4503599627370496.0
        s = u < pi
        exp[src] = exp.get(src, 0.0) + pi
        sel[src] = sel.get(src, 0) + int(s)
        ht[src] = ht.get(src, 0.0) + (1.0 / pi if s else 0.0)
        szsel[src] = szsel.get(src, 0.0) + (sz if s else 0.0)
    for src in ("s1", "s2"):
        r = got[src]
        assert abs(r["expected_draws"] - exp[src]) < 1e-6, src
        assert r["n_selected"] == sel[src], src
        assert abs(r["ht_n_hat"] - ht[src]) < 1e-4, src
    # determinism: identical on a second run
    again = {r["source"]: r for r in pps_sample_audit(df, k=k).collect()}
    assert {s: r["n_selected"] for s, r in got.items()} == \
        {s: r["n_selected"] for s, r in again.items()}


# --------------------------------------------------------------------------
# NDCG
# --------------------------------------------------------------------------

def _rank_df(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, rank int"
    )


def test_ndcg_perfect_reversed_missed(spark):
    """A candidate list identical to the truth scores 1.0; the same
    set reversed scores the hand-computed reversed-DCG ratio; a
    disjoint set scores 0."""
    from fossil_spark.operators.ann import ndcg_eval

    truth = _rank_df(spark, [(1, v, r) for r, v in
                             enumerate([10, 20, 30, 40, 50], 1)])
    perfect = _rank_df(spark, [(1, v, r) for r, v in
                               enumerate([10, 20, 30, 40, 50], 1)])
    rev = _rank_df(spark, [(1, v, r) for r, v in
                           enumerate([50, 40, 30, 20, 10], 1)])
    miss = _rank_df(spark, [(1, v + 100, r) for r, v in
                            enumerate([10, 20, 30, 40, 50], 1)])
    out = {
        r["method"]: r
        for r in ndcg_eval(
            truth, {"perfect": perfect, "rev": rev, "miss": miss}, k=5
        ).collect()
    }
    disc = [1.0 / math.log2(i + 1) for i in range(1, 6)]
    idcg = sum((5 - i) * disc[i] for i in range(5))
    rev_dcg = sum((i + 1) * disc[i] for i in range(5))
    assert out["perfect"]["mean_ndcg"] == 1.0
    assert abs(out["rev"]["mean_ndcg"] - rev_dcg / idcg) < 1e-6
    assert out["miss"]["mean_ndcg"] == 0.0
    assert out["rev"]["mean_ndcg"] < 1.0
    assert out["perfect"]["n_queries"] == 1


def test_ndcg_missing_query_scores_zero(spark):
    """A query the index returned nothing for drags the mean via an
    explicit 0, not a silent drop."""
    from fossil_spark.operators.ann import ndcg_eval

    truth = _rank_df(
        spark,
        [(1, v, r) for r, v in enumerate([10, 20, 30, 40, 50], 1)]
        + [(2, v, r) for r, v in enumerate([60, 70, 80, 90, 95], 1)],
    )
    only_q1 = _rank_df(spark, [(1, v, r) for r, v in
                               enumerate([10, 20, 30, 40, 50], 1)])
    out = ndcg_eval(truth, {"half": only_q1}, k=5).collect()[0]
    assert out["n_queries"] == 2
    assert abs(out["mean_ndcg"] - 0.5) < 1e-6
    assert out["min_ndcg"] == 0.0
