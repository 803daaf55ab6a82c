#!/usr/bin/env python
"""Scale-factor headroom probe: does each operator's runtime curve
stay ~linear when the data grows 10x?

Builds a synthetic ~10x layout from $SPARK_GRAFT_SF_DIR (default
sf0.1) under build/headroom_<N>x/ by unioning N shifted copies of the
big tables — keys are offset per copy so join fan-out, window
partition count, and dedup-cluster structure scale the way a real 10x
corpus would (10x the users / orders / docs, NOT 10x rows per key):

  - lineitem/orders: l_orderkey/o_orderkey += i * (max+1); customers
    are not duplicated, so orders-per-customer grows (realistic).
  - events: user_id += i * (max+1) — 10x users, same sessions/user,
    so window partitions multiply instead of deepening.
  - documents: doc_id offset and a per-copy salt token appended to
    text, so near-dup cluster sizes stay constant instead of every
    doc gaining 9 exact twins (which would quadratically inflate
    pair-generation by construction, not by operator).
  - embeddings: vec_id offset and a deterministic per-copy jitter on
    the vector, so LSH/IVF bucket densities scale linearly.

Runs a representative operator set at 1x and Nx on the same session
(noop sink, min of 2 runs) and reports t(Nx)/t(1x). A ratio well
above N flags a super-linear operator. Writes a markdown table to
stdout for PERFORMANCE.md.

Usage: python scripts/headroom_probe.py [copies] [key ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

PROBE_KEYS = [
    "tpch_q1",            # scan + hash agg
    "tpch_q18",           # pre-agg + fact-fact join
    "ts_session",         # window over user partitions
    "ts_funnel",          # chained conditional-min windows
    "ts_retention",       # windowed min + distinct agg
    "fql_filter",         # pushed-filter scan
    "dedup_exact",        # map-side-partial groupBy
    "dedup_minhash",      # signature + banded bucket join
    "ann_lsh",            # multi-table bucket equi-join
    "text_quality",       # pure column expressions
    "pipeline_curate",    # fused single-scan curation
    "pipeline_semantic_dedup",  # LSH -> connected components (iterative)
]


def build_layout(spark, sf_dir: str, copies: int) -> str:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(repo_root, "build", f"headroom_{copies}x")
    marker = os.path.join(out_dir, "_PREPPED")
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == sf_dir:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)

    def shifted_union(df, n, shift_fn):
        parts = [shift_fn(df, i) for i in range(n)]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    specs = {}
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    max_ok = li.agg(F.max("l_orderkey")).first()[0] + 1
    specs["lineitem"] = (li, lambda d, i: d.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.lit(i * max_ok)))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    specs["orders"] = (od, lambda d, i: d.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(i * max_ok)))
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    max_uid = ev.agg(F.max("user_id")).first()[0] + 1
    max_eid = ev.agg(F.max("event_id")).first()[0] + 1
    specs["events"] = (ev, lambda d, i: d.withColumn(
        "user_id", F.col("user_id") + F.lit(i * max_uid)
    ).withColumn("event_id", F.col("event_id") + F.lit(i * max_eid)))
    dc = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    max_did = dc.agg(F.max("doc_id")).first()[0] + 1
    specs["documents"] = (dc, lambda d, i: d.withColumn(
        "doc_id", F.col("doc_id") + F.lit(i * max_did)
    ).withColumn(
        "text",
        F.col("text") if i == 0 else F.concat(F.col("text"), F.lit(f" cp{i}")),
    ))
    em = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    max_vid = em.agg(F.max("vec_id")).first()[0] + 1
    specs["embeddings"] = (em, lambda d, i: d.withColumn(
        "vec_id", F.col("vec_id") + F.lit(i * max_vid)
    ).withColumn(
        "embedding",
        F.col("embedding") if i == 0 else F.transform(
            "embedding",
            lambda x, j: (x + (F.xxhash64(F.col("vec_id"), j, F.lit(i)) % 1000)
                          .cast("float") / F.lit(1e6)).cast("float"),
        ),
    ))

    for table, (df, fn) in specs.items():
        shifted_union(df, copies, fn).repartition(32).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"{table}.parquet"))
    # small dims: pass through unchanged
    for table in ("region", "nation", "customer", "supplier", "part"):
        src = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.exists(src):
            spark.read.parquet(src).write.mode("overwrite").parquet(
                os.path.join(out_dir, f"{table}.parquet"))
    with open(marker, "w") as f:
        f.write(sf_dir)
    return out_dir


def timeit(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    keys = sys.argv[2:] or PROBE_KEYS
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from fossil_spark.session import get_spark

    spark = get_spark("fossil_spark-headroom")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    big_dir = build_layout(spark, sf_dir, copies)

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm
    force(qs["tpch_q1"](spark, sf_dir))

    print(f"| key | t(1x) s | t({copies}x) s | ratio | verdict |")
    print("|---|---|---|---|---|")
    for key in keys:
        if key not in qs:
            continue
        try:
            t1 = timeit(lambda: force(qs[key](spark, sf_dir)))
            tn = timeit(lambda: force(qs[key](spark, big_dir)))
        except Exception as ex:  # isolate: one broken key, one row
            msg = f"{type(ex).__name__}: {ex}".replace("|", "/")[:120]
            print(f"| {key} | - | - | - | FAILED: {msg} |")
            continue
        ratio = tn / t1 if t1 > 0 else float("inf")
        verdict = "linear-ok" if ratio <= copies * 1.5 else "SUPER-LINEAR"
        print(f"| {key} | {t1:.2f} | {tn:.2f} | {ratio:.1f}x | {verdict} |")


if __name__ == "__main__":
    main()
