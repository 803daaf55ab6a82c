"""Round-14 regression tests: memo size-cap admission, the chunked /
vector-hygiene Arrow cosine grid, LSH membership equivalence, and the
join-free jaccard-estimate restructure."""

import os

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# memo size-aware admission (r13 verdict #3): entries whose plan reads
# more than SPARK_GRAFT_MEMO_MAX_BYTES of leaf input are not pinned
# --------------------------------------------------------------------------

def _write_docs(spark, path: str, n: int = 40) -> None:
    rows = [
        (i, f"alpha beta gamma delta {i % 7} common tail words here")
        for i in range(n)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def test_memo_size_cap_rejects_large_inputs(spark, tmp_path, monkeypatch):
    from fossil_spark.operators import ann

    path = str(tmp_path / "docs.parquet")
    _write_docs(spark, path)
    df = spark.read.parquet(path).select("doc_id", F.length("text").alias("n"))

    ann.ann_memo_invalidate()
    monkeypatch.setenv("SPARK_GRAFT_MEMO_MAX_BYTES", "1")
    out = ann.memo(df, tag="cap-test")
    # rejected: no cache entry, result not persisted, rows still right
    assert len(ann._MEMO_CACHE) == 0
    assert out.storageLevel.useMemory is False
    assert out.count() == 40

    monkeypatch.setenv("SPARK_GRAFT_MEMO_MAX_BYTES", str(8 * 1024**3))
    out2 = ann.memo(df, tag="cap-test")
    assert len(ann._MEMO_CACHE) == 1
    assert out2.count() == 40
    ann.ann_memo_invalidate()


def test_memo_cap_unknown_size_admits(spark):
    """In-memory plans (no file leaves) have unknown size and must
    keep memoizing — the cap stops KNOWN-huge tables only."""
    from fossil_spark.operators import ann, plan_input_bytes

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    assert plan_input_bytes(df) is None
    ann.ann_memo_invalidate()
    ann.memo(df, tag="mem-test")
    assert len(ann._MEMO_CACHE) == 1
    ann.ann_memo_invalidate()


# --------------------------------------------------------------------------
# Arrow cosine grid: corpus-axis chunking is bit-identical (r13 verdict
# #6) and null/ragged vectors are dropped instead of crashing the
# worker (r13 ADVICE)
# --------------------------------------------------------------------------

def _emb(spark, n: int = 40, dim: int = 8):
    return spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11) + 0.25 * j for j in range(dim)])
            for i in range(n)
        ],
        "vec_id long, embedding array<double>",
    )


def test_cosine_topk_arrow_chunked_bit_identical(spark, monkeypatch):
    from fossil_spark.operators import ann

    emb = _emb(spark)
    q = emb.filter("vec_id < 6")

    def rows(df):
        return sorted(
            (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
            for r in df.collect()
        )

    hof = rows(ann.cosine_topk(emb, q, k=5, dim=8, engine="hof"))
    big = rows(ann.cosine_topk(emb, q, k=5, dim=8, engine="arrow"))
    # force many tiny corpus chunks inside every cogroup
    monkeypatch.setenv("SPARK_GRAFT_ARROW_PAIR_CELLS", "7")
    small = rows(ann.cosine_topk(emb, q, k=5, dim=8, engine="arrow"))
    assert big == hof
    assert small == big


def test_cosine_topk_arrow_drops_null_and_ragged(spark):
    """Null and wrong-width vectors: the arrow engine must not crash
    and must rank the clean rows exactly like a clean-only corpus.
    (The HOF path yields null scores for the malformed rows, which
    the rank window sorts last — on clean data the engines agree;
    this pins the arrow engine's documented drop semantics.)"""
    from fossil_spark.operators import ann

    clean = _emb(spark, n=20, dim=4)
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(100, None), (101, [1.0, 2.0])],
            "vec_id long, embedding array<double>",
        )
    )
    q = clean.filter("vec_id < 3")

    def rows(df):
        return sorted(
            (r["query_id"], r["vec_id"], r["cos_sim"], r["rank"])
            for r in df.collect()
        )

    want = rows(ann.cosine_topk(clean, q, k=4, dim=4, engine="arrow"))
    got = rows(ann.cosine_topk(dirty, q, k=4, dim=4, engine="arrow"))
    assert got == want


# --------------------------------------------------------------------------
# lsh_membership == the id set of minhash_lsh_pairs (the source_health
# substrate: membership without pair explosion or component labeling)
# --------------------------------------------------------------------------

def test_lsh_membership_matches_pair_ids(spark, tmp_path):
    from fossil_spark.operators import ann, dedup

    path = str(tmp_path / "docs.parquet")
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(6)]
    rows += [(10 + i, f"unique document number {i} with its own words {i*13}")
             for i in range(20)]
    rows += [(50 + i, "lorem ipsum dolor sit amet consectetur") for i in range(4)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    ann.ann_memo_invalidate()
    pairs = dedup.minhash_lsh_pairs(docs)
    want = sorted(
        set(r["doc_a"] for r in pairs.collect())
        | set(r["doc_b"] for r in pairs.collect())
    )
    got = sorted(r["doc_id"] for r in dedup.lsh_membership(docs).collect())
    assert got == want
    assert len(got) >= 10  # the two planted dup families are members
    ann.ann_memo_invalidate()


# --------------------------------------------------------------------------
# minhash_jaccard_estimate: the signatures-ride-along shape must equal
# the old joined shape (pair set + per-pair agreement count)
# --------------------------------------------------------------------------

def test_jaccard_estimate_matches_joined_reference(spark, tmp_path):
    from fossil_spark.operators import ann, dedup

    path = str(tmp_path / "docs.parquet")
    rows = [(i, "shared boilerplate text block repeated verbatim") for i in range(5)]
    rows += [(20 + i, f"distinct content {i} nothing alike {i*31}") for i in range(10)]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)
    docs = spark.read.parquet(path)

    ann.ann_memo_invalidate()
    est = dedup.minhash_jaccard_estimate(docs).collect()
    got = sorted((r["doc_a"], r["doc_b"], r["n_match"], r["jaccard_est"]) for r in est)

    # reference: pairs + two signature joins (the pre-r14 shape)
    sigs = dedup._signature_matrix(docs, "text", "doc_id", 8, 3)
    pairs = dedup._pairs_from_sigs(sigs, "doc_id", 8, 2)
    sa = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"__mh{s}").alias(f"__a{s}") for s in range(8)],
    )
    sb = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"__mh{s}").alias(f"__b{s}") for s in range(8)],
    )
    n_match = sum(
        (F.col(f"__a{s}") == F.col(f"__b{s}")).cast("long") for s in range(8)
    )
    ref = (
        pairs.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", n_match.alias("n_match"),
            F.round(n_match.cast("double") / F.lit(8.0), 6).alias("jaccard_est"),
        )
        .collect()
    )
    want = sorted((r["doc_a"], r["doc_b"], r["n_match"], r["jaccard_est"]) for r in ref)
    assert got == want
    assert len(got) > 0
    ann.ann_memo_invalidate()


# --------------------------------------------------------------------------
# rolling rank-median Arrow engine (hampel / rolling_median): the numpy
# path must be bit-identical to the JVM window shape, full frames only
# --------------------------------------------------------------------------

def _spiky_events(spark):
    from datetime import datetime, timedelta

    rows = []
    base = datetime(2030, 1, 1)
    for key in ("a", "b"):
        for i in range(60):
            # deterministic wiggle + planted spikes; exact float ties
            # included (i%5 repeats values) to bait ordering bugs
            v = float((i * 7) % 5) + (50.0 if i in (20, 41) else 0.0)
            rows.append((key, base + timedelta(minutes=i), v, i))
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )


def test_hampel_engines_bit_identical(spark):
    from fossil_spark.operators import timeseries as ts

    ev = _spiky_events(spark)

    def rows(df):
        return sorted(
            tuple(str(r[c]) for c in (
                "event_type", "ts", "value", "local_median",
                "local_mad", "score",
            ))
            for r in df.collect()
        )

    kw = dict(window_rows=11, k=2.0, time_col="ts", by=["event_type"],
              value_col="value", order_tiebreak=["event_id"])
    hof = rows(ts.hampel(ev, engine="hof", **kw))
    arr = rows(ts.hampel(ev, engine="arrow", **kw))
    auto = rows(ts.hampel(ev, **kw))
    assert arr == hof
    assert auto == hof
    assert len(hof) >= 2  # the planted spikes flag


def test_rolling_median_engines_bit_identical(spark):
    from fossil_spark.operators import timeseries as ts

    ev = _spiky_events(spark)

    def rows(df):
        return sorted(
            tuple(str(r[c]) for c in (
                "event_type", "ts", "value", "rolling_median", "deviation",
            ))
            for r in df.collect()
        )

    kw = dict(window_rows=11, time_col="ts", by=["event_type"],
              value_col="value", order_tiebreak=["event_id"])
    hof = rows(ts.rolling_median(ev, engine="hof", **kw))
    arr = rows(ts.rolling_median(ev, engine="arrow", **kw))
    assert arr == hof
    # 60 rows per key, full frames only: 50 rows per key
    assert len(hof) == 100


def test_rank_window_auto_falls_back_without_keys_or_doubles(spark):
    from fossil_spark.operators import timeseries as ts

    ev = _spiky_events(spark)
    # no by-keys -> hof (single global group would serialize in arrow)
    assert ts._rank_window_engine(ev, "auto", [], "value") == "hof"
    # int values -> hof (the numpy float64 window would change types)
    ev_int = ev.withColumn("value", ev["value"].cast("long"))
    assert ts._rank_window_engine(ev_int, "auto", ["event_type"], "value") == "hof"
    assert ts._rank_window_engine(ev, "auto", ["event_type"], "value") == "arrow"
