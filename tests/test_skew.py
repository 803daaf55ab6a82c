"""Skew kill-tests (SURVEY §4): one key owning ~50% of rows driven
through sessionize / funnel / asof_join / minhash LSH, asserting both
correctness and a wall-clock budget, plus proof that AQE's skew-join
split actually engages on a skewed sort-merge join. The budget is
generous (CI noise) but fails on quadratic blowups — the whale key's
partition must be processed in linear time by every operator."""

import time
from datetime import timedelta

import pytest
from pyspark.sql import functions as F

BUDGET_S = 120.0
N = 200_000
BASE_US = 1_700_000_000_000_000  # fixed epoch µs


@pytest.fixture(scope="module")
def skewed(spark):
    """~50% of rows on one 'whale' user, the rest across 997 keys.
    Deterministic times: row i at BASE + i ms."""
    df = (
        spark.range(N)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("whale"))
            .otherwise(F.concat(F.lit("u"), (F.col("id") % 997).cast("string")))
            .alias("user_id"),
            F.timestamp_micros(F.lit(BASE_US) + F.col("id") * 1000)
            .alias("time"),
            (F.col("id") % 5).cast("double").alias("value"),
            F.element_at(
                F.array(F.lit("view"), F.lit("cart"), F.lit("buy")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("event_type"),
        )
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def _timed(df):
    t0 = time.monotonic()
    rows = df.collect()
    return rows, time.monotonic() - t0


def test_sessionize_whale_key(skewed):
    from fossil_spark.operators.timeseries import sessionize

    # whale events every 2 ms; 1 s gap -> exactly one session
    rows, dt = _timed(
        sessionize(skewed, timedelta(seconds=1), by=["user_id"])
    )
    assert dt < BUDGET_S, f"sessionize took {dt:.1f}s on skewed input"
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user["whale"]) == 1
    assert by_user["whale"][0].n_events == N // 2


def test_funnel_whale_key(skewed):
    from fossil_spark.operators.timeseries import funnel

    rows, dt = _timed(
        funnel(skewed, ["view", "cart", "buy"], by="user_id")
    )
    assert dt < BUDGET_S, f"funnel took {dt:.1f}s on skewed input"
    ns = [r.n_converted for r in sorted(rows, key=lambda r: r.step_index)]
    assert ns[0] >= ns[1] >= ns[2]
    # every key (whale included) emits view->cart->buy cycles, so all
    # 998 distinct keys convert through the full funnel
    assert ns[2] == 998


def test_asof_join_whale_key(skewed, spark):
    from fossil_spark.operators.timeseries import asof_join

    # sparse right side: one quote per key every ~20 s
    quotes = (
        spark.range(100)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("whale"))
            .otherwise(F.concat(F.lit("u"), (F.col("id") % 997).cast("string")))
            .alias("user_id"),
            F.timestamp_micros(F.lit(BASE_US) + F.col("id") * 2_000_000)
            .alias("qtime"),
            F.col("id").cast("double").alias("quote"),
        )
    )
    out = asof_join(
        skewed, quotes, on="user_id", left_time="time",
        right_time="qtime", right_values=["quote"],
    )
    rows, dt = _timed(out.agg(F.count("*")))
    assert dt < BUDGET_S, f"asof_join took {dt:.1f}s on skewed input"
    assert rows[0][0] == N  # left rows preserved exactly


def test_minhash_hot_bucket_streams_pairs(spark):
    from fossil_spark.operators.dedup import minhash_lsh_pairs

    # 300 identical docs -> one degenerate bucket of 300 ids in every
    # band; pairs must stream out (two chained explodes), never an
    # n^2/2 array in a single value
    k, distinct = 300, 200
    docs = spark.range(k + distinct).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < k, F.lit("the same boilerplate text repeated")
        ).otherwise(
            F.concat(F.lit("unique document number "), F.col("id"))
        ).alias("text"),
    )
    t0 = time.monotonic()
    n_pairs = minhash_lsh_pairs(docs).count()
    dt = time.monotonic() - t0
    assert dt < BUDGET_S, f"minhash took {dt:.1f}s on hot bucket"
    assert n_pairs >= k * (k - 1) // 2


def test_aqe_splits_skewed_join(spark, skewed):
    """AQE skew-join handling must actually engage: with thresholds
    scaled to test data, a skewed sort-merge join's executed plan
    carries the skew=true marker on its sort-merge join node."""
    conf = spark.conf
    saved = {
        k: conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            # the thresholds below are scaled to 8-way shuffles; any
            # earlier test that touches fossil_spark.cli/server calls
            # get_spark() whose getOrCreate re-applies the env default
            # (32) to the SHARED session, and at 32 partitions the
            # split no longer engages — pin what the assert depends on
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        conf.set("spark.sql.shuffle.partitions", "8")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # force a sort-merge join (no broadcast escape hatch)
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        dim = spark.range(1200).select(
            F.when(F.col("id") == 0, F.lit("whale"))
            .otherwise(F.concat(F.lit("u"), ((F.col("id") - 1) % 997).cast("string")))
            .alias("user_id"),
            F.col("id").cast("double").alias("weight"),
        ).distinct()
        joined = skewed.join(dim, "user_id").agg(
            F.sum(F.col("value") * F.col("weight"))
        )
        t0 = time.monotonic()
        joined.collect()
        dt = time.monotonic() - t0
        assert dt < BUDGET_S
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, (
            "AQE skew-join split did not engage:\n" + plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_paragraph_dedup_whale_unit(spark):
    """A boilerplate block repeated in ~half the corpus: the unit-hash
    aggregation must partial-reduce map-side (min(struct)) rather than
    sort a whale group through one partition."""
    import time as _t

    from fossil_spark.operators.dedup import paragraph_dedup

    whale = " ".join(f"b{i}" for i in range(10))  # one full block
    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit(whale + " "), F.lit("tail "), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.lit("unique text "), F.col("id").cast("string")))
        .alias("text"),
    )
    t0 = _t.monotonic()
    out = paragraph_dedup(docs).collect()
    dt = _t.monotonic() - t0
    assert dt < BUDGET_S, f"paragraph_dedup took {dt:.1f}s on whale unit"
    assert len(out) == 20_000
    # doc 0 keeps the whale block; every other even doc loses it
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_cut"] == 0
    assert by_id[2]["n_cut"] == 1
    assert by_id[2]["cleaned_text"].startswith("tail")
    assert by_id[1]["n_cut"] == 0


def test_unigram_nll_whale_token(spark):
    """Zipfian reality: one token in ~half of all positions. The
    token-keyed re-join must survive the hot key (partial-agg counts
    + AQE skew-split), never funnel it through one partition's sort."""
    import time as _t

    from fossil_spark.operators.text import unigram_nll

    docs = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the the the the the "),  # whale token, every doc
            F.lit("w"), (F.col("id") % 5000).cast("string"),
            F.lit(" x"), F.col("id").cast("string"),
        ).alias("text"),
    )
    t0 = _t.monotonic()
    out = unigram_nll(docs).collect()
    dt = _t.monotonic() - t0
    assert dt < BUDGET_S, f"unigram_nll took {dt:.1f}s on whale token"
    assert len(out) == 20_000
    assert all(r["n_tokens"] == 7 for r in out)


def test_interval_coverage_whale_key(skewed):
    from fossil_spark.operators.timeseries import interval_coverage

    # every row is a 1-second interval; whale rows arrive every 2 ms,
    # so the whale's intervals all chain into ONE island
    rows, dt = _timed(
        interval_coverage(
            skewed.withColumn("dur", F.lit(1.0)),
            time_col="time", duration_col="dur", by=["user_id"],
        )
    )
    assert dt < BUDGET_S, f"interval_coverage took {dt:.1f}s on skewed input"
    by_user = {r["user_id"]: r for r in rows}
    whale = by_user["whale"]
    assert whale["n_intervals"] == N // 2
    assert whale["n_islands"] == 1
    # chain of 1 s intervals every 2 ms over 100k rows: last start at
    # (N-2) ms, covered = (N-2) ms + 1 s exactly
    assert whale["covered_us"] == (N - 2) * 1000 + 1_000_000


def test_substring_dedup_whale_window(spark):
    from fossil_spark.operators.dedup import substring_dedup_stats

    # one 10-token block shared by HALF the corpus (classic license
    # boilerplate): the hot window hash must reduce map-side, not
    # funnel through one partition
    import time as _t

    docs = []
    boiler = " ".join(f"b{i}" for i in range(10))
    for i in range(20_000):
        if i % 2 == 0:
            docs.append((i, boiler + f" unique tail {i} with extra tokens {i}"))
        else:
            docs.append((i, f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(12))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t0 = _t.monotonic()
    out = substring_dedup_stats(df, window_tokens=10).collect()
    dt = _t.monotonic() - t0
    assert dt < BUDGET_S, f"substring_dedup took {dt:.1f}s on whale window"
    by_id = {r["doc_id"]: r for r in out}
    # every even doc's first window is the boilerplate block -> dup
    assert by_id[0]["dup_windows"] >= 1 and by_id[0]["dup_tokens"] >= 10
    # odd docs are unique -> zero dup coverage
    assert by_id[1]["dup_tokens"] == 0


def test_bigram_nll_whale_token(spark):
    from fossil_spark.operators.text import bigram_nll

    # 'the' precedes half of all tokens: the unigram/bigram join keys
    # are maximally Zipfian — AQE skew-split territory; must finish in
    # budget and score the repetitive doc lowest
    import time as _t

    docs = []
    for i in range(5_000):
        if i % 2 == 0:
            docs.append((i, "the end " * 20))
        else:
            docs.append((i, " ".join(f"w{i}_{j}" for j in range(40))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    t0 = _t.monotonic()
    out = {r["doc_id"]: r for r in bigram_nll(df).collect()}
    dt = _t.monotonic() - t0
    assert dt < BUDGET_S, f"bigram_nll took {dt:.1f}s on whale token"
    assert len(out) == 5_000
    assert out[0]["avg_nll"] < out[1]["avg_nll"]
