#!/usr/bin/env python
"""Regenerate docs/plans.md: captured physical plans for the queries
whose shapes the PERFORMANCE.md scale claims rest on."""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SECTIONS = {
    "tpch_q5": (
        "Six-table join: every dimension broadcasts; the only shuffle is "
        "the fact-fact orderkey join and the final aggregation."
    ),
    "dedup_minhash": (
        "MinHash LSH: one explode+groupBy builds all 8 signature columns, "
        "one groupBy on (band, band_hash) emits in-bucket pairs. No self-join."
    ),
    "ann_ivf": (
        "IVF assignment: BroadcastNestedLoopJoin against the single-row "
        "centroid table, then a broadcast list-id join. No exchange before "
        "the join."
    ),
    "fql_since": (
        "FQL time predicate: filter reaches the scan as PushedFilters "
        "(and PartitionFilters on an EventStore layout)."
    ),
    "ts_asof_join": (
        "As-of join: union-tag + one window pass keyed by the join column."
    ),
    "ts_gapfill": (
        "Gap fill (round 4 rewrite): join-free segment generation — one "
        "bucket aggregate, lead() on the same partitioning, sequence() "
        "explode. 1 scan, 0 joins (was 2 scans, 1 join)."
    ),
    "text_unigram_nll": (
        "Corpus-fit unigram NLL: one token groupBy, a 1-row broadcast "
        "total, the token-keyed re-join (Zipfian key: AQE skew case), "
        "one doc groupBy with decimal accumulation."
    ),
    "dedup_paragraph": (
        "First-occurrence block dedup: min(struct(doc,pos)) groupBy on "
        "the unit hash (map-side partial min = whale-unit skew-safe), "
        "join back, rebuild in order."
    ),
    "text_keywords": (
        "TF-IDF keywords: tf scan + term-window document frequency "
        "(no rejoin), 1-row broadcast N, per-doc top-k window."
    ),
    "ts_changepoint": (
        "CUSUM changepoint: all window frames and the row_number "
        "filter share ONE key partitioning — one shuffle, no joins."
    ),
    "ts_m4": (
        "M4 downsampling: struct-ordered min/max in ONE map-side-combined "
        "groupBy — 4 points per bucket with a single shuffle."
    ),
}

HEADER = """# Plan audit (captured)

Physical plans captured from `explain(\"formatted\")` at sf0.001
(regenerate with `python scripts/capture_plans.py`). These are the
shapes the scale claims in PERFORMANCE.md rest on; expression ids are
stripped for readability.

"""


def main() -> None:
    import __spark_entry__ as entry
    from fossil_spark.session import get_spark

    spark = get_spark("plandoc")
    spark.sparkContext.setLogLevel("ERROR")
    sf = "/root/testdata/sf0.001"
    qs = entry.queries()

    def plan(key: str) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            qs[key](spark, sf).explain("formatted")
        tree = buf.getvalue().split("\n\n")[0]
        return re.sub(r"#\d+L?", "", tree)

    with open(os.path.join(REPO, "docs", "plans.md"), "w") as f:
        f.write(HEADER)
        for key, blurb in SECTIONS.items():
            f.write(f"## {key}\n\n{blurb}\n\n```\n{plan(key)}\n```\n\n")
    print("docs/plans.md written")


if __name__ == "__main__":
    main()
