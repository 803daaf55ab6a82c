"""Streaming PSI drift monitor against a batch-computed reference.

The streaming dual of operators.timeseries.psi_drift, in the same
lambda shape as streaming/anomaly.py: history fixes a per-key decile
profile BATCH-side (exact interpolated percentile edges + the
reference's own bin fractions — not the nominal 1/n_bins, so ties and
discrete values are handled honestly); the live stream bins each value
with the same JVM fold psi_drift uses, aggregates per watermarked
window, and emits one PSI score per (window, key). Stream state is
bounded by the watermark; both reference joins broadcast (edges before
the aggregation to compute the bin, fractions after it to score), so
the stream never shuffles beyond its windowed aggregation — the
append-mode-legal "stream-static join after a watermarked aggregation"
shape the anomaly monitor uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_profile(
    df: DataFrame,
    key_col: str = "topic",
    value_col: str = "value",
    n_bins: int = 10,
) -> DataFrame:
    """Per-key drift reference from history: decile edges (exact
    interpolated percentiles, rounded @6 — the psi_drift boundary
    convention) plus the reference sample's OWN per-bin fractions.
    Returns (key, edges array<double>[n_bins-1], ref_fracs
    array<double>[n_bins], n_reference)."""
    qs = [i / n_bins for i in range(1, n_bins)]
    edges = df.groupBy(key_col).agg(
        F.transform(
            F.expr(
                f"percentile({value_col}, array("
                + ", ".join(map(str, qs))
                + "))"
            ),
            lambda e: F.round(e, 6),
        ).alias("edges"),
        F.count(value_col).alias("n_reference"),
    )
    # one-string SQL per-bin expressions (the psi_replay build-cost
    # rule below — same trees, a fraction of the py4j round-trips)
    binned = df.join(F.broadcast(edges), key_col).select(
        key_col,
        "n_reference",
        F.expr(
            "aggregate(edges, 0, (acc, e) -> acc"
            f" + CAST((`{value_col}` > e) AS INT))"
        ).alias("__bin"),
    )
    counts = binned.groupBy(key_col, "n_reference").agg(
        *[
            F.expr(f"sum(CAST((__bin = {b}) AS BIGINT))").alias(f"__c{b}")
            for b in range(n_bins)
        ]
    )
    fracs = F.expr(
        "array("
        + ", ".join(
            f"CAST(__c{b} AS DOUBLE) / n_reference" for b in range(n_bins)
        )
        + ")"
    )
    return counts.join(edges.select(key_col, "edges"), key_col).select(
        key_col, "edges", fracs.alias("ref_fracs"), "n_reference"
    )


def _bin_idx(x):
    """Bin = count of edges strictly below x (the psi_drift fold)."""
    return F.aggregate(
        F.col("edges"),
        F.lit(0),
        lambda acc, e: acc + (x > e).cast("int"),
    )


def psi_replay(
    live: DataFrame,
    profile: DataFrame,
    every: str = "1 hour",
    time_col: str = "time",
    key_col: str = "topic",
    value_col: str = "value",
    n_bins: int = 10,
    eps: float = 1e-6,
    threshold: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """Batch replay of [[streaming_psi]] — the same function on a
    static drain (`withWatermark` is a no-op on batch input), so the
    broadcast edge join, JVM bin fold, windowed bin counts, and the
    fixed-order PSI term sum execute the identical plan the stream
    runs. This gives the live drift monitor's arithmetic a full SQL
    oracle (the streaming_cusum_replay pattern). Returns (bucket,
    key, n, psi, drifted) per finalized window."""
    assert not live.isStreaming, "replay takes the static drain"
    return streaming_psi(
        live, profile, every, "0 seconds", time_col, key_col,
        value_col, n_bins, eps, threshold, round_to,
    )


def streaming_psi(
    stream: DataFrame,
    profile: DataFrame,
    every: str = "1 hour",
    watermark: str = "2 hours",
    time_col: str = "time",
    key_col: str = "topic",
    value_col: str = "value",
    n_bins: int = 10,
    eps: float = 1e-6,
    threshold: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """One PSI row per finalized (window, key): how far the window's
    value distribution drifted from the reference profile. Output mode
    `append` (the watermark closes windows); `profile` comes from
    reference_profile() and both its uses broadcast. Keys absent from
    the profile are dropped — no reference, no drift score. Returns
    (bucket, key, n, psi, drifted). NULL values are dropped before
    binning (the streaming_apdex rule: "no measurement" is not a
    distribution sample — otherwise they would count in n but in no
    bin and silently dilute every fraction)."""
    # one-string SQL expressions throughout (r13, the ANN build-cost
    # rule): the per-bin Column loops cost ~3.5k py4j round-trips
    # (~1.5 s of driver time per build); the strings below emit the
    # SAME expression trees in a handful of calls
    binned = (
        stream.filter(F.col(value_col).isNotNull())
        .withWatermark(time_col, watermark)
        .join(F.broadcast(profile.select(key_col, "edges")), key_col)
        .select(
            time_col,
            key_col,
            F.expr(
                "aggregate(edges, 0, (acc, e) -> acc"
                f" + CAST((`{value_col}` > e) AS INT))"
            ).alias("__bin"),
        )
    )
    agg = (
        binned.groupBy(F.window(F.col(time_col), every), key_col)
        .agg(
            F.count("*").alias("n"),
            *[
                F.expr(f"sum(CAST((__bin = {b}) AS BIGINT))")
                .alias(f"__c{b}")
                for b in range(n_bins)
            ],
        )
        .select(
            F.col("window").start.alias("bucket"),
            key_col,
            "n",
            *[f"__c{b}" for b in range(n_bins)],
        )
    )
    scored = agg.join(
        F.broadcast(profile.select(key_col, "ref_fracs")), key_col
    )
    e = f"DOUBLE('{float(eps)!r}')"

    def term(b: int) -> str:
        p = f"GREATEST(element_at(ref_fracs, {b + 1}), {e})"
        q = f"GREATEST(CAST(__c{b} AS DOUBLE) / n, {e})"
        return f"(({q}) - ({p})) * LN(({q}) / ({p}))"

    psi_sql = term(0)
    for b in range(1, n_bins):
        psi_sql = f"({psi_sql}) + ({term(b)})"
    psi = F.expr(psi_sql)
    return scored.select(
        "bucket",
        key_col,
        "n",
        F.round(psi, round_to).alias("psi"),
        (psi > F.lit(threshold)).alias("drifted"),
    )
