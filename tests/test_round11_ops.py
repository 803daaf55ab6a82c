"""Round-11 operators: turning points, Engle-Granger cointegration,
degree assortativity, Spearman, delta-method ratio, BH-FDR, Poisson
bootstrap. Hand-computed known answers where the algebra is small
enough to do on paper; independent pure-Python/pandas recomputation
where the operator is bound to the events table."""

import hashlib
import math
from datetime import datetime, timedelta

from tests.conftest import SF_DIR


def _variant(user) -> int:
    return int(hashlib.md5(f"ab:{user}".encode()).hexdigest()[:8], 16) % 2


# --------------------------------------------------------------------------
# turning points
# --------------------------------------------------------------------------

def test_turning_points_known_answer(spark):
    """1,3,2,4,3: interior points 3 (peak), 2 (trough), 4 (peak) ->
    T=3; n=5, E = 2*3/3 = 2.0, Var = (80-29)/90 = 51/90,
    z = 1/sqrt(51/90) = 1.328422."""
    from fossil_spark.operators.timeseries import turning_points

    t0 = datetime(2024, 1, 1)
    vals = [1.0, 3.0, 2.0, 4.0, 3.0]
    df = spark.createDataFrame(
        [(t0 + timedelta(hours=i), "/m", v) for i, v in enumerate(vals)],
        "time timestamp, topic string, value double",
    )
    r = turning_points(df, by=["topic"]).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["n_buckets"], row["n_turning"]) == (5, 3)
    assert row["expected_turning"] == 2.0
    assert abs(row["z_stat"] - 1.328422) < 1e-6
    assert row["iid_consistent_95"] is True


def test_turning_points_plateau_not_turn(spark):
    """1,2,2,1: neither interior 2 is a STRICT peak (ties don't
    count, the textbook treatment) -> T=0, n=4, E=4/3,
    z = -(4/3)/sqrt(35/90) = -2.138090 -> not iid-consistent."""
    from fossil_spark.operators.timeseries import turning_points

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0 + timedelta(hours=i), "/m", v)
         for i, v in enumerate([1.0, 2.0, 2.0, 1.0])],
        "time timestamp, topic string, value double",
    )
    row = turning_points(df, by=["topic"]).collect()[0]
    assert row["n_turning"] == 0
    assert abs(row["z_stat"] + 2.13809) < 1e-5
    assert row["iid_consistent_95"] is False
    # < 3 buckets: no interior point, key drops
    tiny = spark.createDataFrame(
        [(t0, "/t", 1.0), (t0 + timedelta(hours=1), "/t", 2.0)],
        "time timestamp, topic string, value double",
    )
    assert turning_points(tiny, by=["topic"]).count() == 0


# --------------------------------------------------------------------------
# cointegration
# --------------------------------------------------------------------------

def test_cointegration_exact_fit_null_stat(spark):
    """y = 2x + 1 exactly: beta=2, alpha=1, residual identically 0,
    so the DF regression degenerates (slg=0) -> df_stat NULL,
    cointegrated NULL (not a fake verdict)."""
    from fossil_spark.operators.timeseries import cointegration

    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(12):
        rows.append((t0 + timedelta(hours=i), "a", float(i)))
        rows.append((t0 + timedelta(hours=i), "b", float(2 * i + 1)))
    df = spark.createDataFrame(
        rows, "time timestamp, key string, value double"
    )
    r = cointegration(df, key_col="key").collect()
    assert len(r) == 1
    row = r[0]
    assert (row["key_x"], row["key_y"], row["n_buckets"]) == ("a", "b", 12)
    assert row["beta"] == 2.0 and row["alpha"] == 1.0
    assert row["df_stat"] is None and row["cointegrated_5pct"] is None


def test_cointegration_known_answer(spark):
    """x alternates 0/1; y = x + r with r = +1,+1,-1,-1 (period 4,
    orthogonal to x over 12 points): OLS gives beta=1, alpha=0,
    residual e == r. DF on e: slg=11, sld=-10, sdd=20 ->
    stat = -10/sqrt(12) = -2.886751 (> -3.34, so not cointegrated
    at 5%)."""
    from fossil_spark.operators.timeseries import cointegration

    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(12):
        x = float(i % 2)
        r_ = 1.0 if (i % 4) in (0, 1) else -1.0
        rows.append((t0 + timedelta(hours=i), "a", x))
        rows.append((t0 + timedelta(hours=i), "b", x + r_))
    df = spark.createDataFrame(
        rows, "time timestamp, key string, value double"
    )
    row = cointegration(df, key_col="key").collect()[0]
    assert row["beta"] == 1.0 and row["alpha"] == 0.0
    assert abs(row["df_stat"] - (-10.0 / math.sqrt(12.0))) < 1e-6
    assert row["cointegrated_5pct"] is False


def test_cointegration_min_buckets_and_flat_x(spark):
    """Pairs below min_buckets drop; a flat x series (sxx = 0) has
    no regression and drops too."""
    from fossil_spark.operators.timeseries import cointegration

    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(12):
        rows.append((t0 + timedelta(hours=i), "a", 5.0))  # flat
        rows.append((t0 + timedelta(hours=i), "b", float(i)))
    df = spark.createDataFrame(
        rows, "time timestamp, key string, value double"
    )
    assert cointegration(df, key_col="key").count() == 0
    assert cointegration(df, key_col="key", min_buckets=13).count() == 0


# --------------------------------------------------------------------------
# assortativity
# --------------------------------------------------------------------------

def test_assortativity_path_graph(spark):
    """Path a-b-c: degrees (1,2,1); the four directed edges pair
    degree 1 with degree 2 every time -> r = -1 (perfectly
    disassortative)."""
    from fossil_spark.operators.graph import assortativity

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "doc_a string, doc_b string"
    )
    row = assortativity(pairs).collect()[0]
    assert (row["n_nodes"], row["n_edges_directed"]) == (3, 4)
    assert row["assortativity"] == -1.0


def test_assortativity_regular_graph_null(spark):
    """A perfect matching (a-b, c-d) is degree-regular: zero degree
    variance -> correlation undefined -> NULL, not 0 or a crash."""
    from fossil_spark.operators.graph import assortativity

    pairs = spark.createDataFrame(
        [("a", "b"), ("c", "d")], "doc_a string, doc_b string"
    )
    row = assortativity(pairs).collect()[0]
    assert (row["n_nodes"], row["n_edges_directed"]) == (4, 4)
    assert row["assortativity"] is None


def test_assortativity_star_vs_clique(spark):
    """A star is disassortative (hub meets leaves only); a triangle
    is regular -> NULL; star+extra shows r < 0."""
    from fossil_spark.operators.graph import assortativity

    star = spark.createDataFrame(
        [("h", "l1"), ("h", "l2"), ("h", "l3")],
        "doc_a string, doc_b string",
    )
    row = assortativity(star).collect()[0]
    assert row["assortativity"] == -1.0
    tri = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("a", "c")],
        "doc_a string, doc_b string",
    )
    assert assortativity(tri).collect()[0]["assortativity"] is None


# --------------------------------------------------------------------------
# spearman (independent pandas-rank recomputation)
# --------------------------------------------------------------------------

def test_spearman_matches_pandas_ranks(spark):
    """spearman_activity vs an independent pandas average-rank +
    Pearson-on-ranks recomputation of the same hourly bucket table."""
    import pandas as pd

    from fossil_spark.queries.analytics import spearman_activity
    from fossil_spark.session import read_table
    from pyspark.sql import functions as F

    got = {
        r["event_type"]: r
        for r in spearman_activity(spark, SF_DIR).collect()
    }
    b = (
        read_table(spark, SF_DIR, "events")
        .filter(F.col("value").isNotNull())
        .groupBy("event_type", F.window("ts", "1 hour").start.alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.sum(F.col("value").cast("decimal(30,8)")), 4)
             .cast("double") / F.count("value")).alias("v"),
        )
        .toPandas()
    )
    for et, g in b.groupby("event_type"):
        rx = g["n"].rank(method="average")
        ry = g["v"].rank(method="average")
        rho = rx.corr(ry)
        n = len(g)
        t = rho * math.sqrt((n - 2) / (1 - rho * rho))
        assert abs(got[et]["spearman_rho"] - rho) < 1e-6, et
        assert abs(got[et]["t_stat"] - t) < 1e-4, et
        assert got[et]["n_buckets"] == n


def test_spearman_perfect_monotone(spark):
    """Sanity on the rank algebra: if count and value are perfectly
    monotone the doubled-midrank moments must give exactly rho=1 —
    check by feeding a crafted frame through the same rank formula
    in SQL terms via a tiny local job."""
    import pandas as pd
    from pyspark.sql import Window, functions as F

    df = spark.createDataFrame(
        [("k", i, float(i * i)) for i in range(1, 8)],
        "event_type string, n long, v double",
    )
    wx = Window.partitionBy("event_type").orderBy("n")
    wy = Window.partitionBy("event_type").orderBy("v")
    cx = Window.partitionBy("event_type", "n")
    cy = Window.partitionBy("event_type", "v")
    r = df.select(
        (F.lit(2) * F.rank().over(wx) + F.count(F.lit(1)).over(cx)
         - F.lit(2)).alias("rx"),
        (F.lit(2) * F.rank().over(wy) + F.count(F.lit(1)).over(cy)
         - F.lit(2)).alias("ry"),
    ).toPandas()
    assert (r["rx"] == r["ry"]).all()


# --------------------------------------------------------------------------
# delta-method ratio (independent recomputation)
# --------------------------------------------------------------------------

def test_delta_ratio_matches_python(spark):
    """Full independent recomputation: per-user (s, n) in pandas,
    md5 variant in hashlib, linearized variance
    U/(U-1) sum(s - R n)^2 / N^2."""
    from fossil_spark.queries.analytics import delta_ratio
    from fossil_spark.session import read_table

    row = delta_ratio(spark, SF_DIR).collect()[0]
    pu = (
        read_table(spark, SF_DIR, "events")
        .toPandas()
        .groupby("user_id")["value"]
        .agg(["sum", "count"])
        .reset_index()
    )
    pu["v"] = pu["user_id"].map(_variant)
    stats = {}
    for v, g in pu.groupby("v"):
        U, S, N = len(g), g["sum"].sum(), int(g["count"].sum())
        R = S / N
        sd2 = ((g["sum"] - R * g["count"]) ** 2).sum()
        se2 = U / (U - 1) * sd2 / (N * N)
        stats[v] = (U, R, se2)
    (ua, ra, va), (ub, rb, vb) = stats[0], stats[1]
    z = (rb - ra) / math.sqrt(va + vb)
    assert (row["n_users_a"], row["n_users_b"]) == (ua, ub)
    assert abs(row["ratio_a"] - ra) < 1e-4
    assert abs(row["ratio_b"] - rb) < 1e-4
    assert abs(row["z_score"] - z) < 1e-4
    assert row["significant_95"] == (abs(z) >= 1.959964)


# --------------------------------------------------------------------------
# BH-FDR
# --------------------------------------------------------------------------

def test_bh_fdr_step_up_invariants(spark):
    """p_adj is the running suffix-min of p*m/rank clamped to 1:
    recompute BH from the reported p-values in pure Python and
    compare exactly; check the structural invariants."""
    from fossil_spark.queries.analytics import bh_fdr

    rows = sorted(
        bh_fdr(spark, SF_DIR).collect(), key=lambda r: r["bh_rank"]
    )
    m = len(rows)
    assert [r["bh_rank"] for r in rows] == list(range(1, m + 1))
    ps = [r["p_value"] for r in rows]
    assert ps == sorted(ps)
    # BH from scratch (on the @6-rounded p, so compare with slack)
    adj, run = [None] * m, float("inf")
    for i in range(m - 1, -1, -1):
        run = min(run, ps[i] * m / (i + 1))
        adj[i] = min(run, 1.0)
    for r, a in zip(rows, adj):
        assert abs(r["p_adj"] - a) < 1e-4
        assert r["p_adj"] >= r["p_value"] - 1e-4
        assert r["rejected_fdr05"] == (r["p_adj"] <= 0.05)
    # the rank-m metric's p_adj is its own p (suffix-min of itself)
    assert abs(rows[-1]["p_adj"] - rows[-1]["p_value"]) < 1e-4


def test_bh_fdr_normal_p_approx(spark):
    """The A-S 26.2.17 polynomial p must agree with erfc to ~7.5e-8:
    spot-check every reported (t, p) pair against
    p = erfc(|t|/sqrt(2))."""
    from fossil_spark.queries.analytics import bh_fdr

    for r in bh_fdr(spark, SF_DIR).collect():
        exact = math.erfc(abs(r["t_stat"]) / math.sqrt(2.0))
        assert abs(r["p_value"] - exact) < 1e-5, r


# --------------------------------------------------------------------------
# Poisson bootstrap
# --------------------------------------------------------------------------

def _pois_w(user, b) -> int:
    u = int(
        hashlib.md5(f"pb:{user}:{b}".encode()).hexdigest()[:13], 16
    ) / 4503599627370496.0
    cdf = [0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
           0.9810118431238463, 0.9963401531726563, 0.9994058151824183]
    for k, c in enumerate(cdf):
        if u < c:
            return k
    return 6


def test_poisson_bootstrap_matches_python(spark):
    """Full independent recomputation with hashlib-derived Poisson
    weights: replicate means, se over the 40 means, order-stat CI."""
    from fossil_spark.queries.analytics import poisson_bootstrap
    from fossil_spark.session import read_table

    row = poisson_bootstrap(spark, SF_DIR).collect()[0]
    pu = (
        read_table(spark, SF_DIR, "events")
        .toPandas()
        .groupby("user_id")["value"]
        .sum()
    )
    means = []
    for b in range(1, 41):
        num = den = 0.0
        for user, x in pu.items():
            w = _pois_w(user, b)
            num += x * w
            den += w
        means.append(num / den)
    means.sort()
    mu = sum(means) / 40.0
    se = math.sqrt(sum((m - mu) ** 2 for m in means) / 39.0)
    assert row["n_users"] == len(pu) and row["n_boot"] == 40
    assert abs(row["point_mean"] - pu.sum() / len(pu)) < 1e-4
    assert abs(row["boot_se"] - se) < 1e-4
    assert abs(row["ci_lo"] - means[1]) < 1e-4
    assert abs(row["ci_hi"] - means[38]) < 1e-4
    assert row["ci_lo"] <= row["ci_hi"]


def test_poisson_weights_distribution():
    """The deterministic weights must look Poisson(1): over 4000
    draws the mean is ~1 and weight 0 frequency ~ 1/e."""
    ws = [_pois_w(u, b) for u in range(100) for b in range(1, 41)]
    mean = sum(ws) / len(ws)
    p0 = ws.count(0) / len(ws)
    assert abs(mean - 1.0) < 0.06
    assert abs(p0 - 0.3679) < 0.03
