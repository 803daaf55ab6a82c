"""Round-11 batch 2: HHI, Pareto/ABC, mSPRT, variogram, EVT/POT,
Neyman allocation, linear-kernel MMD. Hand-computed closed forms for
the operators that take a DataFrame; independent pandas
recomputation for the table-bound query shapes."""

import math
from datetime import datetime, timedelta

from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# variogram
# --------------------------------------------------------------------------

def test_variogram_known_answer(spark):
    """0,1,0,1 hourly: lag-1 diffs are +-1 (gamma = 3/(2*3) = 0.5),
    lag-2 diffs are 0 (gamma = 0)."""
    from fossil_spark.operators.timeseries import variogram

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0 + timedelta(hours=i), "/m", float(i % 2)) for i in range(4)],
        "time timestamp, topic string, value double",
    )
    r = {
        row["lag_buckets"]: row
        for row in variogram(df, lags=[1, 2], by=["topic"]).collect()
    }
    assert r[1]["n_pairs"] == 3 and r[1]["gamma"] == 0.5
    assert r[2]["n_pairs"] == 2 and r[2]["gamma"] == 0.0


def test_variogram_gap_robust(spark):
    """Remove the t2 bucket: lag-1 keeps only the (t0,t1) pair —
    missing buckets shrink the pair count, they never bias gamma."""
    from fossil_spark.operators.timeseries import variogram

    t0 = datetime(2024, 1, 1)
    rows = [(t0 + timedelta(hours=i), "/m", float(i % 2))
            for i in [0, 1, 3]]
    df = spark.createDataFrame(
        rows, "time timestamp, topic string, value double"
    )
    r = {
        row["lag_buckets"]: row
        for row in variogram(df, lags=[1, 2], by=["topic"]).collect()
    }
    assert r[1]["n_pairs"] == 1 and r[1]["gamma"] == 0.5
    assert r[2]["n_pairs"] == 1 and r[2]["gamma"] == 0.0


# --------------------------------------------------------------------------
# EVT / POT
# --------------------------------------------------------------------------

def test_evt_pot_known_answer(spark):
    """Values 1..200: u = p95 = 190.05, the 10 excesses are
    0.95..9.95 (step 1), so m = 5.45, s2 = 82.5/9, and the MoM
    xi/sigma/var_p follow in closed form."""
    from fossil_spark.operators.timeseries import evt_pot

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0 + timedelta(minutes=i), "/m", float(i + 1))
         for i in range(200)],
        "time timestamp, topic string, value double",
    )
    row = evt_pot(df, by=["topic"]).collect()[0]
    assert row["threshold_u"] == 190.05
    assert (row["n_obs"], row["n_exceed"]) == (200, 10)
    m, s2 = 5.45, 82.5 / 9.0
    xi = 0.5 * (1.0 - m * m / s2)
    sigma = m * (1.0 - xi)
    ratio = (1.0 - 0.999) / (10.0 / 200.0)
    var_p = 190.05 + sigma / xi * (math.pow(ratio, -xi) - 1.0)
    assert abs(row["gpd_xi"] - xi) < 1e-6
    assert abs(row["gpd_sigma"] - sigma) < 1e-6
    assert abs(row["var_p"] - var_p) < 1e-4
    # xi < 0 here: a bounded tail, and the return level must sit
    # below the implied upper endpoint u + sigma/|xi|
    assert row["gpd_xi"] < 0
    assert row["var_p"] < 190.05 + sigma / abs(xi)


def test_evt_pot_min_exceed_drops(spark):
    """Fewer than min_exceed exceedances -> no GPD fit row."""
    from fossil_spark.operators.timeseries import evt_pot

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0 + timedelta(minutes=i), "/m", float(i + 1))
         for i in range(100)],
        "time timestamp, topic string, value double",
    )
    assert evt_pot(df, by=["topic"], min_exceed=10).count() == 0


# --------------------------------------------------------------------------
# Neyman allocation
# --------------------------------------------------------------------------

def test_neyman_allocation_known_answer(spark):
    """Stratum A sizes {0,10} (sd = sqrt(50)), stratum B {5,5}
    (sd = 0): Neyman puts the WHOLE budget on A while proportional
    splits 50/50 — the textbook contrast."""
    from fossil_spark.operators.text import neyman_allocation

    df = spark.createDataFrame(
        [("A", 0), ("A", 10), ("B", 5), ("B", 5)],
        "source string, n_chars long",
    )
    r = {row["source"]: row
         for row in neyman_allocation(df, budget=1000).collect()}
    assert abs(r["A"]["sd_size"] - math.sqrt(50.0)) < 1e-6
    assert r["B"]["sd_size"] == 0.0
    assert r["A"]["neyman_share"] == 1.0 and r["B"]["neyman_share"] == 0.0
    assert r["A"]["n_alloc"] == 1000 and r["B"]["n_alloc"] == 0
    assert r["A"]["prop_share"] == 0.5 and r["B"]["prop_share"] == 0.5
    assert r["A"]["mean_size"] == 5.0 and r["B"]["mean_size"] == 5.0


# --------------------------------------------------------------------------
# linear-kernel MMD
# --------------------------------------------------------------------------

def test_mmd_disjoint_unit_vectors(spark):
    """Two copies of e1 vs two copies of e2: within-group mean dot
    is 1, cross is 0 -> unbiased MMD^2 = 2."""
    from fossil_spark.operators.ann import mmd_linear

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [1.0, 0.0]),
         (1, [0.0, 1.0]), (1, [0.0, 1.0])],
        "label int, embedding array<double>",
    )
    row = mmd_linear(df).collect()[0]
    assert (row["n_a"], row["n_b"]) == (2, 2)
    assert row["mmd2"] == 2.0


def test_mmd_identical_groups_unbiased_negative(spark):
    """Both groups are {e1, e2}: within-group i!=j dot is 0, cross
    mean is 0.5 -> the UNBIASED estimator goes negative (-1), which
    is exactly what distinguishes it from the biased V-statistic."""
    from fossil_spark.operators.ann import mmd_linear

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.0, 1.0]),
         (1, [1.0, 0.0]), (1, [0.0, 1.0])],
        "label int, embedding array<double>",
    )
    row = mmd_linear(df).collect()[0]
    assert row["mmd2"] == -1.0


def test_mmd_pairs_cover_all_labels(spark):
    """On the test corpus: k labels -> k(k-1)/2 unordered pairs, and
    mmd2 is finite everywhere."""
    from fossil_spark.operators.ann import mmd_linear
    from fossil_spark.session import read_table

    rows = mmd_linear(read_table(spark, SF_DIR, "embeddings")).collect()
    labels = {r["label_a"] for r in rows} | {r["label_b"] for r in rows}
    k = len(labels)
    assert len(rows) == k * (k - 1) // 2
    assert all(r["mmd2"] is not None for r in rows)


# --------------------------------------------------------------------------
# HHI (independent pandas recomputation)
# --------------------------------------------------------------------------

def test_hhi_matches_pandas(spark):
    """Per-nation HHI recomputed independently in pandas."""
    from fossil_spark.queries.analytics import hhi_concentration
    from fossil_spark.session import read_table

    got = {r["n_name"]: r
           for r in hhi_concentration(spark, SF_DIR).collect()}
    o = read_table(spark, SF_DIR, "orders").toPandas()
    c = read_table(spark, SF_DIR, "customer").toPandas()
    n = read_table(spark, SF_DIR, "nation").toPandas()
    rev = o.groupby("o_custkey")["o_totalprice"].sum().reset_index()
    cn = c.merge(n, left_on="c_nationkey", right_on="n_nationkey")
    rev = rev.merge(cn, left_on="o_custkey", right_on="c_custkey")
    for name, g in rev.groupby("n_name"):
        tot = g["o_totalprice"].sum()
        hhi = ((g["o_totalprice"] / tot) ** 2).sum()
        row = got[name]
        assert row["n_customers"] == len(g)
        assert abs(row["hhi"] - hhi) < 1e-6, name
        assert abs(row["effective_n"] - 1.0 / hhi) < 1e-4, name
        k = len(g)
        if k > 1:
            norm = (hhi - 1.0 / k) / (1.0 - 1.0 / k)
            assert abs(row["hhi_normalized"] - norm) < 1e-6, name


# --------------------------------------------------------------------------
# Pareto / ABC (independent pandas recomputation)
# --------------------------------------------------------------------------

def test_pareto_abc_matches_pandas(spark):
    from fossil_spark.queries.analytics import pareto_abc
    from fossil_spark.session import read_table

    got = {r["abc_class"]: r for r in pareto_abc(spark, SF_DIR).collect()}
    li = read_table(spark, SF_DIR, "lineitem").toPandas()
    li["rev"] = li["l_extendedprice"] * (1.0 - li["l_discount"])
    pp = li.groupby("l_partkey")["rev"].sum().round(2).reset_index()
    pp = pp.sort_values(["rev", "l_partkey"],
                        ascending=[False, True]).reset_index(drop=True)
    tot = pp["rev"].sum()
    cum = pp["rev"].cumsum() / tot
    pp["cls"] = ["A" if c <= 0.80 else ("B" if c <= 0.95 else "C")
                 for c in cum]
    for cls, g in pp.groupby("cls"):
        row = got[cls]
        assert row["n_parts"] == len(g), cls
        assert abs(row["revenue"] - g["rev"].sum()) < 0.05, cls
    assert abs(sum(r["revenue_share"] for r in got.values()) - 1.0) < 1e-5
    assert set(got) == {"A", "B", "C"}


# --------------------------------------------------------------------------
# mSPRT
# --------------------------------------------------------------------------

def test_msprt_invariants_and_final_theta(spark):
    """The always-valid p is nonincreasing in time and in (0, 1];
    the final day's cumulative theta matches an independent pandas
    recomputation of the two arms' means."""
    import hashlib

    from fossil_spark.queries.analytics import msprt_monitor
    from fossil_spark.session import read_table

    rows = sorted(msprt_monitor(spark, SF_DIR).collect(),
                  key=lambda r: r["day"])
    assert len(rows) >= 2
    ps = [r["p_always_valid"] for r in rows]
    assert all(0.0 < p <= 1.0 for p in ps)
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    for r in rows:
        assert r["n_a"] >= 2 and r["n_b"] >= 2
        assert r["significant_05"] == (r["p_always_valid"] <= 0.05)
    ev = read_table(spark, SF_DIR, "events").toPandas()
    ev = ev[ev["value"].notna()].copy()
    ev["v"] = ev["user_id"].map(
        lambda u: int(
            hashlib.md5(f"ab:{u}".encode()).hexdigest()[:8], 16
        ) % 2
    )
    ma = ev.loc[ev["v"] == 0, "value"].mean()
    mb = ev.loc[ev["v"] == 1, "value"].mean()
    last = rows[-1]
    assert last["n_a"] == int((ev["v"] == 0).sum())
    assert last["n_b"] == int((ev["v"] == 1).sum())
    assert abs(last["theta_hat"] - (mb - ma)) < 1e-4
