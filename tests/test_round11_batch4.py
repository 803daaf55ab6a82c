"""Round-11 batch 4: diff-in-diff, graph modularity, integrated
autocorrelation time, feature-hash collision audit."""

import hashlib
import math

from tests.conftest import SF_DIR


# --------------------------------------------------------------------------
# diff-in-diff
# --------------------------------------------------------------------------

def test_did_matches_python(spark):
    """Full independent recomputation: midpoint split, per-user
    pre/post totals, hashlib variants, welch on the deltas."""
    from fossil_spark.queries.analytics import diff_in_diff
    from fossil_spark.session import read_table

    row = diff_in_diff(spark, SF_DIR).collect()[0]
    ev = read_table(spark, SF_DIR, "events").toPandas()
    us = ev["ts"].astype("int64") // 1000  # ns -> us
    mid = (int(us.min()) + int(us.max())) // 2
    ev = ev.assign(us=us)
    pre = ev[ev["us"] < mid].groupby("user_id")["value"].sum()
    post = ev[ev["us"] >= mid].groupby("user_id")["value"].sum()
    cells = {0: [], 1: []}
    for u in ev["user_id"].unique():
        v = int(hashlib.md5(f"ab:{u}".encode()).hexdigest()[:8], 16) % 2
        cells[v].append((float(pre.get(u, 0.0)), float(post.get(u, 0.0))))
    stats = {}
    for v, xy in cells.items():
        d = [y - x for x, y in xy]
        n = len(d)
        mean = sum(d) / n
        var = sum((t - mean) ** 2 for t in d) / (n - 1)
        stats[v] = (n, mean, var,
                    sum(x for x, _ in xy) / n, sum(y for _, y in xy) / n)
    (na, da, va, pa, qa), (nb, db, vb, pb, qb) = stats[0], stats[1]
    did = db - da
    z = did / math.sqrt(va / na + vb / nb)
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert abs(row["pre_a"] - pa) < 1e-4
    assert abs(row["post_b"] - qb) < 1e-4
    assert abs(row["did"] - did) < 1e-4
    assert abs(row["z_score"] - z) < 1e-4
    assert row["significant_95"] == (abs(z) >= 1.959964)


# --------------------------------------------------------------------------
# modularity
# --------------------------------------------------------------------------

def _two_triangles(spark):
    pairs = spark.createDataFrame(
        [("a1", "a2"), ("a2", "a3"), ("a1", "a3"),
         ("b1", "b2"), ("b2", "b3"), ("b1", "b3"),
         ("a1", "b1")],
        "doc_a string, doc_b string",
    )
    return pairs


def test_modularity_two_triangles(spark):
    """Two triangles + one bridge, labeled by triangle: per community
    Q_c = 6/14 - (7/14)^2 = 0.178571, total Q = 0.357143 — the
    textbook two-community value."""
    from fossil_spark.operators.graph import modularity

    pairs = _two_triangles(spark)
    labels = spark.createDataFrame(
        [(n, "A") for n in ["a1", "a2", "a3"]]
        + [(n, "B") for n in ["b1", "b2", "b3"]],
        "doc_id string, label string",
    )
    rows = {r["label"]: r for r in modularity(pairs, labels).collect()}
    for lab in ("A", "B"):
        r = rows[lab]
        assert r["n_nodes"] == 3
        assert r["in_edges_directed"] == 6
        assert r["degree_sum"] == 7
        assert abs(r["q_contrib"] - (6 / 14 - (7 / 14) ** 2)) < 1e-8
        assert abs(r["modularity"] - 0.357143) < 1e-6


def test_modularity_random_partition_near_zero(spark):
    """Labeling across the triangles (one node of each in each
    community) must score well below the aligned partition."""
    from fossil_spark.operators.graph import modularity

    pairs = _two_triangles(spark)
    bad = spark.createDataFrame(
        [("a1", "A"), ("a2", "B"), ("a3", "A"),
         ("b1", "B"), ("b2", "A"), ("b3", "B")],
        "doc_id string, label string",
    )
    rows = modularity(pairs, bad).collect()
    assert rows[0]["modularity"] < 0.1


def test_modularity_unlabeled_nodes_excluded(spark):
    """Unlabeled nodes keep their edges in m but earn no community
    credit: labeling only triangle A gives exactly Q_A."""
    from fossil_spark.operators.graph import modularity

    pairs = _two_triangles(spark)
    labels = spark.createDataFrame(
        [(n, "A") for n in ["a1", "a2", "a3"]]
        + [(n, None) for n in ["b1", "b2", "b3"]],
        "doc_id string, label string",
    )
    rows = modularity(pairs, labels).collect()
    assert len(rows) == 1
    assert abs(rows[0]["modularity"]
               - round(6 / 14 - (7 / 14) ** 2, 8)) < 1e-6


# --------------------------------------------------------------------------
# integrated autocorrelation time
# --------------------------------------------------------------------------

def test_iact_alternating_series(spark):
    """A perfect +-1 alternation has rho_k = (-1)^k exactly, so the
    K=10 window sums to zero: tau = 1, ESS = n."""
    from datetime import datetime, timedelta

    from fossil_spark.operators.timeseries import iact

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0 + timedelta(hours=i), "/m", float(1 if i % 2 else -1))
         for i in range(30)],
        "time timestamp, topic string, value double",
    )
    row = iact(df, by=["topic"]).collect()[0]
    assert row["n_obs"] == 30
    assert row["tau"] == 1.0
    assert row["ess"] == 30.0
    assert row["ess_ratio"] == 1.0


def test_iact_persistent_series_shrinks_ess(spark):
    """A slow square wave is strongly positively autocorrelated at
    short lags: tau > 1 and ESS well below n. A constant series has
    undefined correlations -> NULL tau."""
    from datetime import datetime, timedelta

    from fossil_spark.operators.timeseries import iact

    t0 = datetime(2024, 1, 1)
    rows = [
        (t0 + timedelta(hours=i), "/p", float(1 if (i // 15) % 2 else 0))
        for i in range(60)
    ] + [(t0 + timedelta(hours=i), "/c", 5.0) for i in range(30)]
    df = spark.createDataFrame(
        rows, "time timestamp, topic string, value double"
    )
    r = {row["topic"]: row for row in iact(df, by=["topic"]).collect()}
    assert r["/p"]["tau"] > 1.0
    assert r["/p"]["ess"] < 60.0
    assert r["/c"]["tau"] is None and r["/c"]["ess"] is None


# --------------------------------------------------------------------------
# feature-hash collision audit
# --------------------------------------------------------------------------

def test_feature_hash_audit_matches_python(spark):
    """Buckets, collided types and collided mass recomputed with
    hashlib at 1 bit (pigeonhole collisions guaranteed) and 30 bits
    (none expected for 4 types)."""
    from fossil_spark.operators.text import feature_hash_audit

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta beta delta")],
        "doc_id long, text string",
    )
    got = {r["k_bits"]: r
           for r in feature_hash_audit(docs, bits=[1, 30]).collect()}
    occ = {"alpha": 2, "beta": 3, "gamma": 1, "delta": 1}
    for k in (1, 30):
        buckets = {}
        for tok, n in occ.items():
            b = int(
                hashlib.md5(f"fh:{tok}".encode()).hexdigest()[:13], 16
            ) % (2 ** k)
            buckets.setdefault(b, []).append(n)
        ctypes = sum(len(v) for v in buckets.values() if len(v) >= 2)
        cmass = sum(sum(v) for v in buckets.values() if len(v) >= 2)
        tmass = sum(occ.values())
        r = got[k]
        assert r["n_types"] == 4, k
        assert r["n_buckets_used"] == len(buckets), k
        assert r["collided_types"] == ctypes, k
        assert abs(r["type_collision_rate"] - ctypes / 4.0) < 1e-6, k
        assert abs(r["mass_collision_rate"] - cmass / tmass) < 1e-6, k
    assert got[1]["n_buckets_used"] <= 2
    assert got[30]["collided_types"] == 0


# --------------------------------------------------------------------------
# price index (batch 5)
# --------------------------------------------------------------------------

def test_price_index_matches_pandas(spark):
    """Matched-model L/P/F recomputed independently in pandas at the
    same shipdate midpoint."""
    from fossil_spark.queries.analytics import price_index
    from fossil_spark.session import read_table

    row = price_index(spark, SF_DIR).collect()[0]
    li = read_table(spark, SF_DIR, "lineitem").toPandas()
    us = li["l_shipdate"].astype("int64") // 1000
    mid = (int(us.min()) + int(us.max())) // 2
    li = li.assign(p=(us >= mid).astype(int))
    g = li.groupby(["l_partkey", "p"]).agg(
        rev=("l_extendedprice", "sum"), qty=("l_quantity", "sum")
    ).reset_index()
    g["price"] = g["rev"] / g["qty"]
    b = g[g["p"] == 0].set_index("l_partkey")
    c = g[g["p"] == 1].set_index("l_partkey")
    common = b.index.intersection(c.index)
    p0, q0 = b.loc[common, "price"], b.loc[common, "qty"]
    p1, q1 = c.loc[common, "price"], c.loc[common, "qty"]
    lasp = float((p1 * q0).sum() / (p0 * q0).sum())
    paas = float((p1 * q1).sum() / (p0 * q1).sum())
    assert row["n_parts_common"] == len(common)
    assert abs(row["laspeyres"] - lasp) < 1e-4
    assert abs(row["paasche"] - paas) < 1e-4
    assert abs(row["fisher"] - math.sqrt(lasp * paas)) < 1e-4


# --------------------------------------------------------------------------
# power-law fit (batch 5)
# --------------------------------------------------------------------------

def test_powerlaw_star_known_answer(spark):
    """A 3-leaf star has degrees (3,1,1,1): CSN MLE gives
    alpha = 1 + 4/(ln 6 + 3 ln 2)."""
    from fossil_spark.operators.graph import powerlaw_fit

    pairs = spark.createDataFrame(
        [("h", "l1"), ("h", "l2"), ("h", "l3")],
        "doc_a string, doc_b string",
    )
    row = powerlaw_fit(pairs).collect()[0]
    sln = math.log(3 / 0.5) + 3 * math.log(1 / 0.5)
    alpha = 1.0 + 4.0 / sln
    assert (row["n_nodes"], row["d_min"], row["max_degree"]) == (4, 1, 3)
    assert row["mean_degree"] == 1.5
    assert abs(row["alpha"] - alpha) < 1e-5
    assert abs(row["alpha_se"] - (alpha - 1.0) / 2.0) < 1e-5
