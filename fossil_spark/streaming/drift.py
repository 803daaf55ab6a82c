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
    binned = df.join(F.broadcast(edges), key_col).select(
        key_col,
        "n_reference",
        _bin_idx(F.col(value_col)).alias("__bin"),
    )
    counts = binned.groupBy(key_col, "n_reference").agg(
        *[
            F.sum((F.col("__bin") == b).cast("long")).alias(f"__c{b}")
            for b in range(n_bins)
        ]
    )
    fracs = F.array(
        *[
            F.col(f"__c{b}").cast("double") / F.col("n_reference")
            for b in range(n_bins)
        ]
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
    binned = (
        stream.filter(F.col(value_col).isNotNull())
        .withWatermark(time_col, watermark)
        .join(F.broadcast(profile.select(key_col, "edges")), key_col)
        .select(
            time_col, key_col, _bin_idx(F.col(value_col)).alias("__bin")
        )
    )
    agg = (
        binned.groupBy(F.window(F.col(time_col), every), key_col)
        .agg(
            F.count("*").alias("n"),
            *[
                F.sum((F.col("__bin") == b).cast("long")).alias(f"__c{b}")
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
    terms = []
    for b in range(n_bins):
        p = F.greatest(
            F.element_at("ref_fracs", b + 1), F.lit(eps)
        )
        q = F.greatest(
            F.col(f"__c{b}").cast("double") / F.col("n"), F.lit(eps)
        )
        terms.append((q - p) * F.log(q / p))
    psi = terms[0]
    for t in terms[1:]:
        psi = psi + t
    return scored.select(
        "bucket",
        key_col,
        "n",
        F.round(psi, round_to).alias("psi"),
        (psi > threshold).alias("drifted"),
    )
