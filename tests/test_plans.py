"""Plan-quality lint over every registered driver query.

These are the scale guarantees the engine promises (SURVEY.md §4):
no row-at-a-time Python in any hot path, filters reaching the scan,
broadcast joins for dimension tables.
"""

import io
import contextlib
import re

import pytest

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"

# Python is sanctioned only in these (documented) places:
#   - greedy sample: sequential reference parity (applyInPandas)
#   - multimodal: Arrow-batched decode plumbing (mapInPandas)
#   - ewma: sequential recurrence per key (applyInPandas)
#   - text_pack: greedy bin packing per bucket (applyInPandas)
# sanctioned Arrow-batched Python sites: decode/codec work that is
# Python by nature (image/video bytes, stateful reference parity)
PYTHON_OK = {
    "fql_sample_greedy", "multimodal_meta", "multimodal_frames",
    # WAV synth + FFT feature extraction (Arrow-batched by nature)
    "multimodal_audio",
    # zlib compression ratio (Python by nature, Arrow-batched)
    "text_compression",
    "ts_ewma", "text_pack",
    # PQ's ADC scan is SIMD-shaped (codebook argmin + table gathers);
    # one Arrow-batched mapInPandas pass, measured 75x the interpreted
    # higher-order-function expression of the same math
    "ann_pq",
    # sequential per-key recurrence, one Arrow batch per key (like ts_ewma)
    "ts_forecast",
    "ts_forecast_eval",  # backtest harness riding the same recurrence
    "ts_holt_winters",
    "ts_theta_forecast",  # SES fold over the theta=2 line (same boundary)
    "ts_kalman",  # sequential Kalman recurrence per key (same boundary)
    # LTTB bucket selection is sequential per key (same boundary)
    "ts_lttb",
    # DTW DP grid is sequential by nature; grid bounded by calendar
    "ts_dtw",
    # PNG synth + decode + dHash (codec work is Python by nature,
    # Arrow-batched like every decode path)
    "multimodal_phash",
    "multimodal_phash_pairs",
    # PNG synth + decode + histogram entropy (codec work, Arrow-batched)
    "multimodal_image_entropy",
    # CUSUM fold is sequential per key over bucket means (the ts_ewma
    # boundary: parallel across keys, one Arrow batch within)
    "ts_cusum",
    # Croston's twin SES recurrences are sequential per key over the
    # bucketed demand series (the ts_ewma boundary; batch length is
    # calendar-bounded)
    "ts_croston",
    # PNG synth + decode + dHash + CC over the pair graph (codec work,
    # Arrow-batched like the parent multimodal_phash_pairs)
    "multimodal_phash_groups",
    # PNG synth + pool-resize + re-encode + re-decode (codec work)
    "multimodal_resize",
    # the ewma fold is sequential per key (ts_ewma boundary)
    "ts_ewma_control",
    # batch replay of the streaming CUSUM state fold — same
    # sequential-per-key Arrow boundary as ts_cusum
    "streaming_cusum_replay",
    # r13: engine="auto" resolves to the Arrow grid at every size —
    # measured 7.27 s hof vs 1.87 s arrow at sf0.1 (nsub=349),
    # bit-identical rows (engine-identity test); one
    # FlatMapGroupsInPandas per key, parallel across keys
    "ts_matrix_profile",
    # r13: the 500-probe brute-force pair grid scores in numpy behind
    # one cogrouped Arrow boundary (ann._cosine_pairs_arrow) — 8.4 s
    # cold / 3.3 s warm hof -> ~1.3 s, bit-identical rows
    # (engine-identity test); the 8-query retrieval audits keep the
    # HOF path
    "embedding_knn_classify",
    # r14: rolling exact rank medians/MADs in numpy behind one
    # FlatMapGroupsInPandas per key (timeseries._rolling_rank_arrow)
    # — A/B at sf0.1: hampel 3.11 -> 0.85 s, rolling_median 1.79 ->
    # 0.78 s, rows identical (rank selection, no interpolation);
    # engine-identity test pins parity. anomaly_summary composes
    # hampel, so it inherits the boundary.
    "ts_hampel",
    "ts_rolling_median",
    "pipeline_anomaly_summary",
}


def _plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("extended")
    return buf.getvalue()


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for key, fn in entry.queries().items():
        out[key] = _plan_of(fn(spark, SF))
    return out


def test_no_row_python_udfs(plans):
    for key, plan in plans.items():
        if key in PYTHON_OK:
            continue
        assert "BatchEvalPython" not in plan, f"{key} uses a row-at-a-time Python UDF"
        assert (
            "MapInPandas" not in plan
            and "FlatMapGroupsInPandas" not in plan
            and "FlatMapCoGroupsInPandas" not in plan
        ), f"{key} unexpectedly routes through Python"


def test_sanctioned_python_is_arrow_batched(plans):
    assert "MapInPandas" in plans["multimodal_meta"]
    assert "FlatMapGroupsInPandas" in plans["fql_sample_greedy"]
    for key in PYTHON_OK:
        assert "BatchEvalPython" not in plans[key]


# Operators allowed a Window.orderBy WITHOUT partitionBy (WindowExec on
# a single partition). Each site sits above an aggregation (or an
# explicit limit) that bounds the window's input to a calendar-, key-,
# or |users|-cardinality table — enforced by test_global_windows_are_
# bounded below, not by convention. Any new global window must be added
# here AND carry a bounded input, or the suite fails.
GLOBAL_WINDOW_OK = {
    "agg_conversion_lag",       # rank over per-user lag aggregate
    "agg_gini",                 # cum-share over per-user revenue agg
    "agg_lorenz",               # decile rank over per-user revenue agg
    "agg_mann_whitney",         # cum-count over DISTINCT-metric agg
    "agg_purchase_cadence",     # cum-rank over DISTINCT-gap aggregate
    "agg_rfm",                  # R/F/M quintile ranks over per-user agg
    "agg_skew_audit",           # rank over per-key cardinality agg
    "agg_survival_km",          # risk set over DISTINCT-lifetime agg
    "agg_user_outliers",        # rank over per-user feature agg
    "pipeline_anomaly_summary", # severity rank over per-(key,day) agg
    "pipeline_dsir_select",     # threshold cumsum over DISTINCT-weight agg
    "text_heaps_law",           # cumulative types over per-prefix agg
    "text_quality_deciles",     # offset cumsum over |partitions|-row agg
    "text_zipf",                # global rank over vocabulary agg
    "ts_availability",          # longest-run scan over calendar buckets
    "ts_concurrency",           # sweep-line over bounded event deltas
    "ts_error_episodes",        # episode stitch over calendar buckets
    "ts_mttr",                  # episode stitch over calendar buckets
    "ts_slo_burn",              # burn-rate scan over calendar buckets
    "ts_top_movers",            # rank over per-key delta agg
    "ts_granger",               # lag windows over calendar-bucket agg
    "ts_xcorr",                 # lag join over calendar-bucket agg
    "agg_bh_fdr",               # BH rank/cummin over per-metric agg
    "agg_poisson_boot",         # order stats over the 40-replicate agg
    "agg_pareto_abc",           # global cum-share over per-part agg
    "agg_msprt",                # day-cumulative over per-(day,arm) agg
    "agg_ks_ab",                # ECDF sweep over per-user agg
    "text_token_coverage",      # global rank over the vocabulary agg
    "agg_stratified_effect",    # ntile(10) over the per-user agg
    "text_word_burstiness",     # global cf rank over the vocab agg
    "agg_raking",               # ntile(4) over the per-user agg +
                                # margin windows over the cell agg
}


def _window_bracket_groups(line: str) -> list:
    """Top-level [...] groups following 'Window ' in a plan line: 3
    groups = partitioned+ordered, 2 with ASC/DESC in the last = a
    GLOBAL ordered window (the thing we lint)."""
    i = line.index("Window ") + len("Window ")
    groups, depth, cur = [], 0, []
    for ch in line[i:]:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def _tree_depth(line: str) -> int:
    """Character column where the operator name starts (tree-art
    prefix is spaces plus +- :- | chars)."""
    for i, ch in enumerate(line):
        if ch not in " +-:|":
            return i
    return len(line)


def test_global_windows_are_bounded(plans):
    """Every Window.orderBy-without-partitionBy in the registry must
    (a) be whitelisted in GLOBAL_WINDOW_OK and (b) have an Aggregate /
    GlobalLimit / Deduplicate in its own subtree — i.e. the single
    partition the window runs on is bounded by construction, asserted
    instead of by convention (VERDICT r8 #4)."""
    bounded = re.compile(
        r"\b(Aggregate|GlobalLimit|TakeOrdered|Deduplicate|Distinct)\b"
    )
    violations = []
    for key, plan in plans.items():
        m = re.search(
            r"== Optimized Logical Plan ==\n(.*?)\n== Physical Plan ==",
            plan, re.S,
        )
        assert m, f"{key}: no optimized plan section"
        lines = m.group(1).splitlines()
        for idx, line in enumerate(lines):
            if "Window [" not in line:
                continue
            groups = _window_bracket_groups(line)
            if len(groups) >= 3:
                continue  # partitioned window — fine anywhere
            if not groups or not re.search(r"\b(ASC|DESC)\b", groups[-1]):
                continue  # partition-only spec, no global sort
            if key not in GLOBAL_WINDOW_OK:
                violations.append(f"{key}: unwhitelisted global window")
                continue
            depth = _tree_depth(line)
            subtree = []
            for nxt in lines[idx + 1:]:
                if _tree_depth(nxt) <= depth:
                    break
                subtree.append(nxt)
            if not bounded.search("\n".join(subtree)):
                violations.append(
                    f"{key}: global window input not visibly bounded"
                )
    assert not violations, "\n".join(violations)


def test_tpch_filters_reach_scan(plans):
    # lineitem date range must be in the scan's pushed filters
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plans["tpch_q6"].replace("\n", " ")
    for key in ("tpch_q1", "tpch_q3", "tpch_q6"):
        assert "PushedFilters" in plans[key]


def test_tpch_dims_broadcast(plans):
    for key in ("tpch_q3", "tpch_q5", "tpch_q10"):
        assert "broadcast" in plans[key].lower(), f"{key} lost its broadcast hint"


def test_store_time_predicate_prunes_partitions(spark):
    # a `since` on an EventStore must reach the scan as a partition
    # filter on `date`, not just a row filter on `time`
    import os
    import shutil
    import uuid

    from pyspark.sql import functions as F

    from fossil_spark.store import EventStore, FIXED_NOW, events_store_view

    import re

    root = os.path.join("build", f"prune_{uuid.uuid4().hex[:8]}")
    try:
        st = EventStore(spark, root)
        st.append(events_store_view(spark, SF))

        def partition_filters(df):
            m = re.search(r"PartitionFilters: \[([^\]]*)\]", _plan_of(df))
            assert m is not None, "no PartitionFilters in scan"
            return m.group(1)

        # the FQL path itself must prune: since/before/between compile
        # to a redundant `date` bound (store._read_pruned)
        for text in (
            "all since ~(2024-01-15T00:00:00Z)",
            "all before ~(2024-01-10T00:00:00Z)",
            "all between ~(2024-01-10T00:00:00Z), ~(2024-01-20T00:00:00Z)",
        ):
            q = st.query(text, now=FIXED_NOW)
            pf = partition_filters(q)
            assert "date" in pf, f"{text!r}: date not in partition filters: {pf!r}"

        # an unbounded query has no partition filter (and must not error)
        assert "date" not in partition_filters(st.query("all", now=FIXED_NOW))

        # topic-prefix selection pushes into the parquet scan as a
        # StringStartsWith filter (row-group dictionary/stats skip)
        topic_plan = _plan_of(st.query("all in /events/click", now=FIXED_NOW))
        assert "StartsWith(topic,/events/click)" in topic_plan.replace(
            "'", ""
        ), "topic prefix not pushed to scan"

        # pruning changes which files are read, not the answer
        since = st.query("all since ~(2024-01-15T00:00:00Z)", now=FIXED_NOW)
        unpruned = st.read().filter(
            (F.col("time") >= F.lit("2024-01-15").cast("timestamp"))
            & (F.col("time") <= F.lit(FIXED_NOW.replace(tzinfo=None)))
        )
        assert since.count() == unpruned.count() > 0
        assert since.count() < st.read().count()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def test_store_scan_prunes_columns(spark):
    # a 2-column FQL projection must not read all event columns
    from fossil_spark.fql import fql
    from fossil_spark.store import FIXED_NOW, events_store_view

    df = fql(events_store_view(spark, SF), "all | map x -> x * 2", now=FIXED_NOW)
    plan = _plan_of(df)
    assert "event_id" not in plan.split("== Physical Plan ==")[-1], (
        "scan reads columns the query never uses"
    )


# Re-execution lint (round 4): a branch over a shared subtree gets no
# ReusedExchange under AQE, so every extra FileScan of the same table
# is usually the WHOLE upstream pipeline running again (bit minhash
# LSH and both gapfills this round). Budgets are the number of scans
# the operator's shape genuinely needs.
_SCAN_BUDGET = {
    # r13 additions: croston/lomb are one bucketing/binning pass;
    # raking's profile is one window pass (the join-of-two-derivations
    # version re-aliased into TWO scans — caught here); stupid_backoff
    # deliberately re-scans the pruned text column for each count
    # table + join branch (checkpointing the exploded grams would
    # cost more than the re-scans at any scale)
    "ts_croston": 1, "ts_lomb_scargle": 1, "agg_raking": 1,
    "text_stupid_backoff": 7,
    # single-input operators: one scan, period
    "dedup_minhash": 1, "dedup_exact": 1, "dedup_simhash": 1,
    "ts_gapfill": 1, "ts_gapfill_linear": 1,
    "ts_resample": 1, "ts_sliding": 1, "ts_session": 1, "ts_rate": 1,
    "ts_sliding_time": 1, "ts_zscore": 1, "ts_histogram": 1, "ts_m4": 1,
    "ts_funnel": 1, "ts_retention": 1,
    "text_quality_bins_approx": 1,
    "ts_topk": 1, "ts_first_last": 1, "ts_ohlc": 1, "ts_ewma": 1,
    "text_tokens": 1, "text_quality": 1, "text_langid": 1,
    "text_fingerprint": 1, "text_chunk": 1, "text_scrub_pii": 1,
    "text_repetition": 1, "text_token_freq": 1, "sample_hash_split": 1,
    "sample_stratified": 1, "sample_group_split": 1, "text_quality_deciles": 1,
    "multimodal_meta": 1, "schema_validate": 1,
    # genuine two-input / self-join shapes
    "ts_asof_join": 2,      # events as points + aggregated quotes
    "ts_range_join": 2,     # points + session intervals
    "dedup_embedding": 2,   # LSH bucket self-join
    "dedup_components": 2,  # pairs + initial labels
    "ann_bruteforce": 2,    # base + sampled queries
    "ann_lsh": 2,
    "ann_ivf": 2,
    # candidates (minhash) + the two shingle join sides
    "dedup_ngram": 3,
    # round-5 additions
    "ts_anomaly_mad": 1,    # two windows share one exchange
    "cluster_kmeans": 1,    # final assignment: broadcast centroids, map-side
    "text_contamination": 2,  # train grams + bench grams (same file)
    "text_boilerplate": 2,  # units + corpus-wide frequency side
    "text_bm25": 2,         # per-doc tf + one-row corpus stats
    "dedup_cross": 2,       # train side + held-out hash set
    # round-5 session-2 additions
    "text_gopher": 1,       # folds into the scan, zero shuffles
    "sample_hash_topk": 1,  # TakeOrderedAndProject over one scan
    "ts_acf": 1,            # lag windows + corr over one sort
    "ts_changepoint": 1,    # all windows share the key partitioning
    "ts_seasonal": 1,       # one (key,hour) groupBy + tiny window
    "dedup_paragraph": 2,   # units + first-occurrence side
    "text_unigram_nll": 3,  # tokens + tf side + 1-row total
    "text_domain_mix": 2,   # per-source tallies + 1-row total
    # round-5 session-3 additions
    "sample_weighted": 1,         # TakeOrderedAndProject over one scan
    "text_quality_classifier": 1,  # folds into the scan, zero shuffles
    "ts_interval_coverage": 1,    # window + agg share one exchange
    "dedup_substring": 2,         # windows + corpus-count side
    "ts_overlap_join": 2,         # two filtered interval sides (same file)
    "graph_degree": 1,            # exploded endpoints, single pair subtree
    "ts_decompose": 1,            # two windows, no joins, one scan
    "ts_xcorr": 1,                # one conditional bucket agg, no pivot join
    "text_bigram_nll": 5,         # grams + bigram tf + uni tf x2 + 1-row total
    "sample_group_topk": 1,       # WindowGroupLimit over one scan
    "ts_counter_rate": 1,         # one lag window, one scan
    # candidates + the two signature sides (like dedup_ngram)
    "dedup_minhash_estimate": 3,
    "ts_sax": 1,                  # two windows + groupBy on one key sort
    "sample_temperature": 1,      # one tally scan; normalizers are windows
    "agg_user_features": 1,       # lag window + groupBy share one exchange
    "agg_cohort_ltv": 1,          # first-seen window + rollup, one scan
    "embedding_outliers": 1,      # JVM norm fold + two global windows
    "ts_bursts": 1,               # bucket groupBy + trailing frame, one scan
    "text_lexical_diversity": 1,  # sorted-run fold, zero shuffles
    "agg_markov": 1,              # lag window + pair counts, one scan
    "embedding_coherence": 2,     # vectors + centroid cells (same file)
    "ts_heatmap": 1,              # one map-side-combined groupBy
    "dedup_cluster_sizes": 2,     # pairs + label side (components shape)
    "text_code_detector": 1,      # pure column expressions, zero shuffles
    "ts_anomaly_decomposed": 1,   # decompose windows + medians, one scan
    "embedding_pca_moments": 1,   # moment cells one scan; mu is a literal
    "cluster_kmeans_fixed": 1,    # final assignment: one scan x one-row bcast
    "dedup_containment": 3,       # candidates + two shingle sides (ngram shape)
    "embedding_sq8": 1,           # one scan; min/max stats are literals
    "ts_trend_robust": 3,         # buckets + the two pair sides (bounded)
    "ts_ks_drift": 1,             # one sort per key, two windows share it
    "ts_psi_drift": 2,            # rows + the bounded reference-edges side
    "ts_benford": 1,              # one counts pipeline, grid off the agg
    "embedding_dim_stats": 1,     # posexplode + one map-side-combined agg
    "graph_triangles": 1,         # checkpointed edges; one scan at matz.
    "text_entropy": 1,            # char counts + doc window, one scan
    "pipeline_quality_report": 1,  # fully fused: one scan, one groupBy
    # round-6 session-6 additions
    "ts_twa": 1,                  # lag window + groupBy, one key exchange
    "ts_threshold_episodes": 1,   # two row_numbers share one sort
    "ts_rolling_median": 1,       # bounded collect_list frame, one sort
    "ts_period_detect": 1,        # bucket agg -> grid explode off the agg
    "agg_new_returning": 1,       # user-week groupBy + window + week agg
    "ann_range_search": 2,        # corpus + broadcast probe side
    "embedding_centroid_drift": 2,  # centroid cells + snapshot counts
    "pipeline_mixture_apply": 2,  # doc side + the |sources|-row plan side
    "ts_pacf": 1,                 # the acf pass; recursion is projections
    "ts_session_stats": 1,        # sessionize windows + rank, one exchange
    "ts_top_movers": 1,           # bucket agg + lag + global rank (tiny)
    "agg_stickiness": 2,          # dau branch + 7-day cover branch
    "ts_seasonal_strength": 1,    # decompose windows + SS, one key sort
    "ts_corr_matrix": 2,          # bucket-table self-join, two branches
    "ts_winsorized": 1,           # rank + clip windows share one sort
    "ts_apdex": 1,                # one map-side-combined groupBy
    "ts_profile_drift": 2,        # rows + the 1-row bounds broadcast
    "ts_completeness": 1,         # bucket agg + lag + groupBy, one key sort
    "agg_user_outliers": 1,       # count agg; ranks over the |users| table
    "agg_attribution": 1,         # one user window + tiny label groupBy
    "dedup_quality_rep": 3,       # component pipeline (2) + quality side
    "embedding_dup_audit": 1,     # one hash groupBy + one aggregate
    "ts_hampel": 1,               # bounded frame list, one sort per key
    "ts_flatline": 1,             # lag + running sum + groupBy, one sort
    "text_encoding_audit": 1,     # pure regex columns, zero shuffles
    "agg_purchase_cadence": 1,    # purchase filter + lag + pooled ranks
    "ts_percentile_bands": 1,     # rank + count windows share one sort
    "ts_error_episodes": 1,       # bucket agg -> islands on the tiny grid
    "agg_conversion_lag": 2,      # user-window side + signup-total side
    "ts_mttr": 2,                 # incident pipeline + 1-row grid bounds
    "agg_nrr": 1,                 # cohort-LTV agg + one tiny window
    "dedup_prefix": 2,            # prefix keys + the broadcast group side
    "agg_growth_accounting": 1,   # user-week distinct + window + 2 tiny aggs
    "ts_exp_histogram": 1,        # chained-CASE groupBy + tiny window
    "ts_capacity_eta": 4,         # trend_robust pair sides + 1-row bounds
    "ts_burstiness": 1,           # lag + groupBy on one key sort
    "text_heaps_law": 2,          # token positions + first-occurrence side
    "dedup_suffix": 2,            # suffix keys + the broadcast group side
    "text_jsd_sources": 1,        # tf checkpointed once; branches reuse it
    "embedding_intrinsic_dim": 2,  # corpus + broadcast probe side
    "ts_value_entropy": 1,        # bin groupBy + window + groupBy
    "ts_peak_to_mean": 1,         # bucket agg + struct-max pick
    "text_structure_stats": 1,    # pure split/filter columns, no shuffle
    "ts_wow_compare": 2,          # bucket table + its shifted self
    "agg_retention_halflife": 1,  # retention windows + pooled regression
    "dedup_method_compare": 7,    # four independent method pipelines
    "ann_recall_curve": 2,        # truth checkpointed once; LSH side
    "pipeline_anomaly_summary": 4,  # four independent detector pipelines
    "multimodal_image_entropy": 1,  # one synth + decode Arrow pass
    "dedup_rate_by_source": 3,    # component pipeline (2) + doc side
    "ts_slot_anomaly": 1,         # slot windows on one key partitioning
    "ts_ljung_box": 2,            # decompose+acf side + the count side
    "ts_fano": 1,                 # bucket agg + one groupBy
    "ts_staleness": 3,            # cadence side + last side + 1-row anchor
    "ann_index_agreement": 0,     # both cuts checkpointed once
    "ts_peak_hour": 1,            # two tiny groupBys + one argmax
    "ts_cusum": 1,                # bucket agg + key windows + Arrow fold
    "text_pii": 1,                # regexp counts fold into the scan
    "sample_dedup_aware": 3,      # component pipeline (2, or cached) + doc side
    "ts_gapfill_eval": 1,         # one bucket agg + two key windows
    "sample_class_balanced": 3,   # counts + 1-row min + rule-fold scan
    "ann_filtered": 2,            # corpus scan + broadcast query side
    "ts_concurrency": 1,          # session windows + tiny bucket-table window
    "ts_late_arrivals": 1,        # one running-max window, same key shuffle
    "ts_histogram_quantile": 1,   # histogram windows + per-(key,q) argmin
    "embedding_trunc_recall": 6,  # truth checkpointed once; 3 sliced variants x (corpus + query) scans
    "embedding_bq_recall": 5,     # means + bits (corpus/query) + truth pair
    "pipeline_source_health": 4,  # fused flags scan + quality side + catalog (2, or cached)
    "dedup_lsh_diagnosis": 3,     # estimate pipeline (sigs + pairs) + tiny groupBy
    "agg_rolling_active": 1,      # distinct (user,day) + contribute explode
    "ts_quantile_sketch_audit": 2,  # windows+sketch scan + rank-of-approx pass
    "embedding_cluster_purity": 2,  # assignment scan + label-join scan
    "pipeline_split_leakage": 1,  # one pair pipeline; splits are expressions
    "multimodal_resize": 1,       # one synth+resize+measure Arrow chain
    "agg_skew_audit": 1,          # one count groupBy (checkpointed) + TakeOrdered
    "text_context_budget": 1,     # rank window + groupBy on one key shuffle
    "text_lang_confidence": 1,    # ratio expressions fold into the scan
    "ts_range_audit": 1,          # one map-side-combined groupBy
    "pipeline_curation_waterfall": 2,  # fused flags scan x2 branches (hash groupBy + join-back)
    "text_top_phrases": 1,        # one explode + groupBy + group rank
    "ts_ewma_control": 1,         # bucket agg + Arrow fold + key windows
    "dedup_winnowing": 1,         # fingerprints fold into the scan; bucket pairs
    "ts_availability": 1,         # bucket agg checkpointed; grid/totals/runs reuse it
    "sample_soft_dedup": 3,       # component pipeline (2, or cached) + doc side
    "text_common_word_ratio": 2,  # token explode feeds top-n + membership branches
    "agg_lorenz": 1,              # |users| agg + rank + 10-row windows
    "agg_chi2": 1,                # 35-row contingency table + windows
    # round-12 keys
    "agg_user_features_bucketed": 1,  # the bucketed catalog scan, zero Exchange
    "text_ngram_novelty": 1,      # one explode + shingle window + rollup
    "text_source_overlap": 1,     # one explode+distinct (checkpointed), both branches
    "graph_two_hop": 2,           # pair pipeline (checkpointed) + docs side
    "agg_stratified_effect": 1,   # per-user agg + ntile + rollup + 10-row total window
    "agg_iv_wald": 1,             # one per-user agg + 1-row moments
    "ts_capability": 1,           # bucket agg + key windows + rollup
    "ts_seasonal_mk": 1,          # bucket agg (checkpointed) feeds pairs+ties
    "ts_spc_rules": 1,            # bucket agg + key windows + rule frames
    "dedup_bbit_minhash": 1,      # signature matrix checkpointed once
    "text_word_burstiness": 2,    # vocab explode scan + 1-row doc count
    "agg_theil": 2,               # orders agg + broadcast customer dim
}


def _live_scans(phys: str) -> list[str]:
    """FileScan signatures that would EXECUTE as file scans: the raw
    occurrences minus any subtree printed under an InMemoryRelation
    (extended explain DOES print the cached tree — observed on the
    ann session-memo keys, where an EXECUTED cache entry even prints
    its AQE Final AND Initial plans — two echoes of every scan — but
    at runtime that subtree is served by InMemoryTableScan, not
    re-scanned). Subtree membership tracked by the tree-printer's
    indentation: children sit strictly deeper than their parent.
    Depth = the leading run of tree-drawing characters, so
    marker-less lines inside the subtree (ResultQueryStage,
    '== Final Plan ==', …) don't reset the tracking."""
    import re

    out: list[str] = []
    imr_depth = None
    for line in phys.splitlines():
        depth = len(line) - len(line.lstrip(" :+|-*"))
        if imr_depth is not None and depth > imr_depth:
            continue  # inside a cached relation
        imr_depth = None
        if "InMemoryRelation" in line:
            imr_depth = depth
            continue
        out.extend(re.findall(r"FileScan parquet \[[^\]]*\]", line))
    return out


def test_scan_budgets(plans):
    for key, budget in _SCAN_BUDGET.items():
        phys = plans[key].split("== Physical Plan ==")[-1]
        # count UNIQUE scan signatures (output columns + expr ids): a
        # genuinely re-executed subtree usually re-analyzes with fresh
        # expr ids and counts separately.
        scans = _live_scans(phys)
        n = len(set(scans))
        assert n <= budget, (
            f"{key}: {n} unique FileScans (budget {budget}) — a shared "
            "subtree is probably re-executing; restructure or "
            "checkpoint it"
        )
        # secondary bound on the RAW live count (r12 ADVICE): two
        # branches reusing the same analyzed un-checkpointed subtree
        # print IDENTICAL expr ids, collapse to one unique signature,
        # and a real double-scan would slip past the unique count.
        # Cache echoes are excluded structurally by _live_scans (the
        # one legitimate duplicate-print source in unexecuted plans —
        # no AQE final/initial double print before execution), so
        # every remaining raw occurrence is a scan that would run.
        assert len(scans) <= budget, (
            f"{key}: {len(scans)} live FileScans vs {n} unique (budget "
            f"{budget}) — same-expr-id subtree duplicated across "
            "branches: a real double-scan the unique count can't see, "
            "or a new explain echo mode; checkpoint the shared subtree"
        )
