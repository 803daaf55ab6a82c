#!/usr/bin/env python
"""Benchmark headline queries; prints ONE JSON line for the driver.

Runs each headline query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; execution is forced with the noop sink (full
computation, no driver collect). Reported value = total seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    import __spark_entry__ as entrymod
    from fossil_spark.session import get_spark

    spark = get_spark("fossil_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q10", "tpch_q18",
        "fql_filter", "fql_mapreduce_avg", "fql_sample",
        "ts_resample", "ts_asof_join", "ts_session", "ts_sliding",
        "dedup_exact", "dedup_minhash", "ann_bruteforce",
        "text_quality", "sample_hash_split",
    ]
    qs = entrymod.queries()
    available = [k for k in headline if k in qs]

    # warm the JVM + file listing once so per-query numbers measure the
    # queries, not session startup
    force(qs[available[0]](spark, sf_dir))

    timings: dict[str, float] = {}
    for key in available:
        t0 = time.perf_counter()
        force(qs[key](spark, sf_dir))
        timings[key] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
