"""Round-12 batch 2: seasonal MK, Western Electric rules, 1-bit
minhash, word burstiness, Theil decomposition. Hand-computed or
independently recomputed answers throughout (SURVEY §5)."""

import math
from datetime import datetime, timedelta

from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# timeseries.seasonal_mk
# --------------------------------------------------------------------------

def test_seasonal_mk_pure_trend(spark):
    """4 days x 2 fixed hours, strictly rising day over day within
    each season: each season has n=4 ascending values -> S_s = 6,
    var18_s = 4*3*13 = 156. Two seasons: S = 12, var18 = 312,
    z = (12-1)/sqrt(312/18)."""
    from fossil_spark.operators.timeseries import seasonal_mk

    t0 = datetime(2024, 1, 1)
    rows = []
    for d in range(4):
        for h in (3, 15):
            rows.append(
                (t0 + timedelta(days=d, hours=h), "m", float(d + 1))
            )
    df = spark.createDataFrame(
        rows, "time timestamp, topic string, value double"
    )
    r = seasonal_mk(df, by=["topic"]).collect()[0]
    assert r["n_buckets"] == 8
    assert r["s_total"] == 12
    assert r["var18"] == 312
    assert r["z"] == round(11 / math.sqrt(312 / 18), 6)
    assert r["trending_95"] is True


def test_seasonal_mk_ties_and_flat(spark):
    """A flat series: every pair ties -> S = 0 and the tie correction
    cancels var18 exactly (one tie group of size n per season) ->
    var18 = 0 -> z NULL (try_divide), trending NULL."""
    from fossil_spark.operators.timeseries import seasonal_mk

    t0 = datetime(2024, 1, 1)
    rows = [
        (t0 + timedelta(days=d, hours=6), "m", 7.0) for d in range(5)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, topic string, value double"
    )
    r = seasonal_mk(df, by=["topic"]).collect()[0]
    assert r["s_total"] == 0 and r["var18"] == 0
    assert r["z"] is None and r["trending_95"] is None


def test_seasonal_mk_diurnal_cycle_is_not_trend(spark):
    """A pure daily cycle (hour h always reads h) repeated 4 days:
    within every season the values tie completely -> S = 0 — the
    exact case where the PLAIN MK over the interleaved series would
    see spurious structure."""
    from fossil_spark.operators.timeseries import seasonal_mk

    t0 = datetime(2024, 1, 1)
    rows = [
        (t0 + timedelta(days=d, hours=h), "m", float(h))
        for d in range(4) for h in (2, 9, 16)
    ]
    df = spark.createDataFrame(
        rows, "time timestamp, topic string, value double"
    )
    r = seasonal_mk(df, by=["topic"]).collect()[0]
    assert r["s_total"] == 0
    assert r["var18"] == 0  # all-tied seasons cancel entirely


# --------------------------------------------------------------------------
# timeseries.spc_rules
# --------------------------------------------------------------------------

def test_spc_rules_planted_patterns(spark):
    """A 40-bucket series built so each rule has a known trigger
    count, verified by an independent python replay of the same
    z-scores and frames."""
    from fossil_spark.operators.timeseries import spc_rules

    t0 = datetime(2024, 1, 1)
    # base alternation keeps sigma healthy; inject one 4-sigma spike
    # and a late 10-bucket high plateau for rules 2-4
    vals = []
    for i in range(40):
        v = 10.0 if i % 2 == 0 else 12.0
        vals.append(v)
    vals[5] = 30.0                      # rule-1 spike
    for i in range(28, 38):             # sustained shift
        vals[i] = 14.0
    df = spark.createDataFrame(
        [(t0 + timedelta(hours=i), "m", vals[i]) for i in range(40)],
        "time timestamp, topic string, value double",
    )
    r = spc_rules(df, by=["topic"]).collect()[0]

    # independent replay
    n = len(vals)
    mu = round(sum(vals), 4) / n  # decimal path is exact for these
    sg = math.sqrt(
        sum(round((v - mu) * (v - mu), 6) for v in vals) / n
    )
    z = [(v - mu) / sg for v in vals]
    r1 = sum(1 for x in z if abs(x) > 3)

    def cnt(i, k, pred):
        lo = i - k + 1
        if lo < 0:
            return None
        return sum(1 for x in z[lo:i + 1] if pred(x))

    r2 = sum(
        1 for i in range(n)
        if cnt(i, 3, lambda x: x > 2) is not None
        and (cnt(i, 3, lambda x: x > 2) >= 2
             or cnt(i, 3, lambda x: x < -2) >= 2)
    )
    r3 = sum(
        1 for i in range(n)
        if cnt(i, 5, lambda x: x > 1) is not None
        and (cnt(i, 5, lambda x: x > 1) >= 4
             or cnt(i, 5, lambda x: x < -1) >= 4)
    )
    r4 = sum(
        1 for i in range(n)
        if cnt(i, 8, lambda x: x > 0) is not None
        and (cnt(i, 8, lambda x: x > 0) == 8
             or cnt(i, 8, lambda x: x < 0) == 8)
    )
    assert r["n_buckets"] == 40
    assert r["r1_beyond_3s"] == r1 and r1 >= 1
    assert r["r2_2of3_beyond_2s"] == r2
    assert r["r3_4of5_beyond_1s"] == r3
    assert r["r4_8_same_side"] == r4 and r4 >= 1


def test_spc_rules_flatline_excluded(spark):
    """sigma = 0 keys are excluded (the cusum contract), not
    divided by zero."""
    from fossil_spark.operators.timeseries import spc_rules

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0 + timedelta(hours=i), "m", 5.0) for i in range(6)],
        "time timestamp, topic string, value double",
    )
    assert spc_rules(df, by=["topic"]).count() == 0


# --------------------------------------------------------------------------
# dedup.bbit_minhash_estimate
# --------------------------------------------------------------------------

def test_bbit_minhash_matches_hashlib_replay(spark):
    """Exact twins agree on every signature AND every bit: both
    estimates 1.0, gap 0. The estimator identity J_b1 = 2r - 1 is
    checked against a hashlib replay of the bit matches for a
    partial-overlap pair."""
    import hashlib

    from fossil_spark.operators.dedup import bbit_minhash_estimate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "the quick brown fox jumps over a sleepy dog today"),
        ],
        "doc_id long, text string",
    )
    out = {(r["doc_a"], r["doc_b"]): r
           for r in bbit_minhash_estimate(docs).collect()}
    twin = out[(1, 2)]
    assert twin["n_match"] == 8 and twin["jaccard_est"] == 1.0
    assert twin["n_bit_match"] == 8 and twin["jaccard_b1"] == 1.0
    assert twin["est_gap"] == 0.0

    # hashlib replay for any near pair present
    def shingles(text, n=3):
        w = text.split()
        if len(w) < n:
            return {" ".join(w)}
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    def sig(text):
        return [
            min(hashlib.md5(f"{s}|{sh}".encode()).hexdigest()
                for sh in shingles(text))
            for s in range(8)
        ]

    texts = {1: docs.collect()}
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    for (a, b), r in out.items():
        sa, sb = sig(rows[a]), sig(rows[b])
        nm = sum(x == y for x, y in zip(sa, sb))
        nb = sum(
            int(x[31], 16) % 2 == int(y[31], 16) % 2
            for x, y in zip(sa, sb)
        )
        assert r["n_match"] == nm
        assert r["n_bit_match"] == nb
        assert r["jaccard_b1"] == round(2.0 * nb / 8.0 - 1.0, 6)
        assert r["est_gap"] == round(
            (2.0 * nb / 8.0 - 1.0) - nm / 8.0, 6
        )


# --------------------------------------------------------------------------
# text.word_burstiness
# --------------------------------------------------------------------------

def test_word_burstiness_bursty_vs_spray(spark):
    """'whale' occurs 6 times but only in 2 of 6 docs (bursty,
    cf/df = 3); 'the' once per doc (spray, cf/df = 1, df equals the
    Poisson expectation direction). Expected-df formula checked
    directly."""
    from fossil_spark.operators.text import word_burstiness

    rows = [
        (1, "the whale whale whale swims"),
        (2, "the whale whale whale dives"),
        (3, "the fish swims"),
        (4, "the fish dives"),
        (5, "the crab walks"),
        (6, "the crab hides"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["tok"]: r for r in word_burstiness(docs, top_k=50).collect()}
    n = 6.0
    whale = out["whale"]
    assert (whale["cf"], whale["df"]) == (6, 2)
    assert whale["burstiness"] == 3.0
    exp_df = n * (1.0 - ((n - 1.0) / n) ** 6)
    assert whale["poisson_df"] == round(exp_df, 6)
    assert whale["df_ratio"] == round(2 / exp_df, 6)
    the = out["the"]
    assert (the["cf"], the["df"]) == (6, 6)
    assert the["burstiness"] == 1.0
    # ranks are dense over (cf desc, tok)
    assert out["the"]["rank"] in (1, 2) and out["whale"]["rank"] in (1, 2)


# --------------------------------------------------------------------------
# analytics.theil_index
# --------------------------------------------------------------------------

def test_theil_index_decomposition_identity(spark, tmp_path):
    """Two segments with known revenues; every output column checked
    against plain python, and the decomposition identity
    T_total = sum w_g T_g + sum between_g verified."""
    from fossil_spark.queries.analytics import theil_index

    orders = []
    # customers 1..4 in AUTO (revenues 100, 100, 100, 500),
    # customers 5..6 in BUILDING (200, 200)
    rev = {1: 100.0, 2: 100.0, 3: 100.0, 4: 500.0, 5: 200.0, 6: 200.0}
    for i, (ck, y) in enumerate(rev.items()):
        orders.append((i, ck, y, "O", "1996-01-02", "x"))
    sf = str(tmp_path / "sf")
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_totalprice double,"
        " o_orderstatus string, o_orderdate string, o_comment string",
    ).withColumn("o_orderdate", F.to_date("o_orderdate")).write.parquet(
        sf + "/orders.parquet"
    )
    spark.createDataFrame(
        [(k, "AUTOMOBILE" if k <= 4 else "BUILDING")
         for k in rev],
        "c_custkey long, c_mktsegment string",
    ).write.parquet(sf + "/customer.parquet")

    got = {r["segment"]: r for r in theil_index(spark, sf).collect()}

    import collections

    groups = collections.defaultdict(list)
    for k, y in rev.items():
        groups["AUTOMOBILE" if k <= 4 else "BUILDING"].append(y)
    mu = sum(rev.values()) / len(rev)
    t_total_check = 0.0
    for gname, ys in groups.items():
        mg = sum(ys) / len(ys)
        tg = sum((y / mg) * math.log(y / mg) for y in ys) / len(ys)
        w = (len(ys) / len(rev)) * (mg / mu)
        bt = w * math.log(mg / mu)
        r = got[gname]
        assert r["n_customers"] == len(ys)
        assert r["mean_revenue"] == round(mg, 6)
        assert abs(r["theil_within"] - tg) < 2e-6
        assert r["weight"] == round(w, 6)
        assert abs(r["between_term"] - bt) < 2e-6
        t_total_check += w * tg + bt
    t_direct = sum(
        (y / mu) * math.log(y / mu) for y in rev.values()
    ) / len(rev)
    assert abs(t_total_check - t_direct) < 1e-12
