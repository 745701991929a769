"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT JSON line as the LAST stdout line (the driver's
tail capture is ~2.2 KB; the r3 full per-query map overflowed it and
the driver recorded no headline number):
  {"metric": ..., "value": N, "unit": "sec", "sf": ..., "n_queries": N,
   "queries": {<the 22 r1-baseline queries only>}}
The FULL per-query map is written to BENCH_QUERIES.json next to this
file.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STDERR_LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_STDERR.log")


# End-of-capture marker finish() writes into the pipe. EOF can NEVER
# arrive at the pump (ADVICE r8): the py4j JVM child inherits fd 2 —
# i.e. the pipe write end — at launch and survives spark.stop(), so
# restoring python's fd 2 does not close the last writer. The pump
# therefore terminates on this sentinel instead of EOF.
_TEE_SENTINEL = b"\x00__SGL_TEE_DONE__\x00"


def _tee_stderr(path: str):
    """OS-level tee of fd 2 (VERDICT r7 task 5): the JVM writes Spark
    logs straight to fd 2, bypassing sys.stderr, and the driver's
    ~2.2 KB output-tail capture truncates any stack trace that lands
    there (the r7 anonymous DAGScheduler fragment). Route fd 2
    through a pipe pumped to BOTH the real stderr and ``path`` so
    the console behavior is unchanged while the FULL untruncated log
    survives for naming. Returns a ``finish()`` that signals the pump
    with an in-band sentinel (pipe EOF cannot happen: the JVM child
    holds an inherited copy of the write end — ADVICE r8) and JOINS
    it, so the log is drained up to the sentinel before it is read;
    on a join timeout the capture fds are deliberately leaked instead
    of closed, because closing them under a pump still blocked in
    ``os.read`` would race a late JVM write into reused fd numbers
    (the artifact-corruption scenario ADVICE r8 describes)."""
    real = os.dup(2)
    logfd = os.open(path, os.O_CREAT | os.O_WRONLY | os.O_TRUNC, 0o644)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)

    hold = len(_TEE_SENTINEL) - 1

    def _emit(data: bytes) -> None:
        if data:
            os.write(real, data)
            os.write(logfd, data)

    def pump() -> None:
        # ``pend`` holds back the last len(sentinel)-1 bytes of each
        # chunk so a sentinel split across two reads is still found.
        pend = b""
        while True:
            try:
                chunk = os.read(r, 65536)
            except OSError:
                return
            if not chunk:  # all write ends closed (JVM already gone)
                _emit(pend)
                return
            buf = pend + chunk
            idx = buf.find(_TEE_SENTINEL)
            if idx != -1:
                _emit(buf[:idx])
                return
            _emit(buf[:-hold] if len(buf) > hold else b"")
            pend = buf[-hold:] if len(buf) > hold else buf

    t = threading.Thread(target=pump, daemon=True)
    t.start()

    def finish() -> None:
        try:
            os.write(2, _TEE_SENTINEL)  # fd 2 is still the pipe here
        except OSError:
            pass
        os.dup2(real, 2)
        t.join(timeout=30)
        if t.is_alive():
            # pump still blocked in os.read(r): leak r/logfd AND real
            # (the process exits right after the artifact write) —
            # closing real here would let a file opened next reuse its
            # fd number and receive a late _emit() write (ADVICE r9)
            return
        os.close(logfd)
        os.close(r)
        os.close(real)

    return finish


def _exception_blocks(text: str) -> list[dict]:
    """Group JVM stack frames ('  at ...' runs) into named blocks:
    [{'head': <line preceding the first frame>, 'frames': N}]."""
    lines = text.splitlines()
    blocks: list[dict] = []
    i = 0

    def is_frame(s: str) -> bool:
        t = s.lstrip()
        return t.startswith("at ") or t.startswith("Caused by") or t.startswith("... ")

    while i < len(lines):
        if is_frame(lines[i]) and (i == 0 or not is_frame(lines[i - 1])):
            j = i
            while j < len(lines) and is_frame(lines[j]):
                j += 1
            # a frame run at line 0 means the log starts mid-trace
            # (truncated capture) — report it with a placeholder head
            # rather than dropping the whole block
            head = lines[i - 1][-300:] if i > 0 else "(log starts mid-trace)"
            blocks.append({"head": head, "frames": j - i})
            i = j
        else:
            i += 1
    return _dedupe_blocks(blocks)


def _dedupe_blocks(blocks: list[dict]) -> list[dict]:
    """Aggregate blocks whose heads differ only by embedded numbers
    (accumulator/stage/task ids): one benign class can fire dozens of
    times per run (77 'non-existent accumulator NNN' blocks observed)
    and would bloat the side artifact without adding information.
    Output per CLASS: the digit-normalized head, occurrence count,
    and the frame count of the first instance."""
    import re

    agg: dict[str, dict] = {}
    for b in blocks:
        key = re.sub(r"\d+", "N", b["head"])
        if key in agg:
            agg[key]["count"] += 1
        else:
            agg[key] = {"head": key, "count": 1, "frames": b["frames"]}
    return list(agg.values())

# The r1 driver-measured baseline set (BASELINE.md pins 28.493 s at
# sf0.1 to EXACTLY these 22 queries). A named frozen list (ADVICE r4):
# the stdout contract line's baseline22_total must never drift when
# HEADLINE gains or reorders entries — append new queries to HEADLINE,
# never to this list.
BASELINE_22 = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "nation_pair_volume",
    "gold_kpi_component_tier",
    "gold_kpi_global",
    "topk_per_group",
    "running_customer_totals",
    "asof_join_orders_events",
    "sessionize_events",
    "windowed_agg_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "neardup_embedding_cosine",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    "training_corpus_filter",
]

HEADLINE = [
    *BASELINE_22,
    # added in r2 (see BASELINE.md): the mart's approx scale path and
    # two window-heavy time-series queries
    "gold_kpi_component_tier_approx",
    "cohort_retention",
    "daily_gapfill_events",
    # added in r2, second batch: new LLM-pipeline ops + the widest
    # new TPC-H join shape
    "repetition_filter",
    "paragraph_dedup",
    "pii_redact",
    "vocab_stats",
    "decontaminate_bloom",
    "dsir_importance_weights",
    "semdedup",
    "national_market_share",
    # added in r2, third batch: interval analytics, DQ expectations,
    # corpus-analysis additions
    "concurrent_sessions",
    "trailing_window_user_value",
    "dq_violations",
    "ttr_stats",
    "weighted_sample",
    # added in r2, fourth batch: LM scoring, shard planning, passage
    # overlap, Pareto + path analytics
    "bigram_perplexity",
    "plan_token_shards",
    "winnow_overlap_pairs",
    "revenue_concentration",
    "event_path_match",
    # added in r3: the remaining heavy C-tail composites (VERDICT r2
    # task 8) so their regressions are catchable
    "neardup_keep_best",
    "cross_source_overlap",
    "label_separability",
    # r3 operator wave: corpus diagnostics, sketches, graph, rules
    "gopher_quality_rules",
    "doc_entropy",
    "zipf_slope",
    "term_source_association",
    "embedding_covariance",
    "event_dedup_windowed",
    "kmv_distinct_terms",
    "cms_term_counts",
    "pagerank_trade_graph",
    "label_association_rules",
    "daily_anomaly_events",
    "mixture_resample",
    "redact_contaminated_spans",
    "event_order_inversions",
    "weighted_median_price",
    "weighted_quantiles_price",
    "length_bucketed_batches",
    "source_interleave_plan",
    "yoy_revenue",
    # r3 third batch: graph analytics, optimizer stats, attribution,
    # EWMA, co-occurrence PMI, feature hashing, PCA
    "supplier_cosupply_triangles",
    "part_copurchase_lift",
    "equi_depth_histogram",
    "table_stats_mart",
    "attribution_touchpoints",
    "ewma_user_value",
    "term_cooccurrence_pmi",
    "feature_hash_counts",
    "pca_top_component",
    "bpe_merge_learning",
    # r3 fifth batch: search/ranking, time-series, diagnostics
    "bm25_topk",
    "rrf_hybrid_topk",
    "seasonal_decompose_daily",
    "cusum_changepoint",
    "corr_matrix_lineitem",
    "join_key_skew",
    # r3 sixth batch
    "bpe_tokenize_stats",
    "ab_test_conversion",
    "supplier_neighbor_jaccard",
    # r3 seventh batch (audit layer)
    "pca_projection_outliers",
    "classifier_pr_curve",
    "lsh_recall_vs_exact",
    # r3 eighth batch
    "dau_wau_stickiness",
    "event_trigram_patterns",
    "join_size_estimate",
    # r3 ninth batch
    "lang_id_confusion",
    "user_churn_flags",
    # r3 tenth batch (BI heat grids)
    "price_quantity_heatmap",
    "weekday_hour_heatmap",
    # r4: reference-README SLA mart + the three r3 hash-FAIL queries
    # rewritten with exact integer arithmetic (watch for perf drift)
    "gold_sla_stability",
    "customer_rfm",
    "order_seasonality",
    "unpivot_lineitem_metrics",
    # r4 second wave
    "embedding_decontaminate",
    "dedup_exact_substrings",
    "token_dedup_savings",
    # r5: SLA MoM reporting mart (composes the A9 subtree — watch for
    # a replanned double mart scan), the sampled stride-1 phase audit,
    # and the packing/cluster/filter-bias accounting marts
    "gold_sla_mom",
    "substring_phase_audit",
    "pack_efficiency",
    "dedup_cluster_size_profile",
    "quality_length_bias",
    "minhash_calibration",
    "media_dedup_stats",
    "user_growth_accounting",
    # r5 second wave: sketches + incremental/cluster-aware dedup marts
    # (dedup_aware_holdout re-runs the LSH + components subtree — the
    # heaviest new line by design; budget-watch it like neardup_keep_best)
    "hll_distinct_terms",
    "quantile_sketch_price",
    "dedup_aware_holdout",
    "dedup_against_index",
    "neardup_against_index",
    "token_budget_apportionment",
    "curriculum_plan",
    "span_corruption_plan",
    "normalization_impact",
    "holt_linear_daily",
    "rendezvous_shard_plan",
    "benford_first_digit",
    "gini_revenue",
    "ks_promo_price",
    "autocorr_daily",
    "boilerplate_prefix_stats",
    "bloom_fpr_audit",
    "event_entropy_rate",
    "markov_stationary_events",
    "vocab_growth_curve",
    "simpson_diversity_by_source",
    "contingency_dependence",
    "lorenz_deciles",
    "fano_daily_dispersion",
    "stopword_mass_by_source",
    "theil_hoover_indices",
    "referential_integrity_audit",
    "k_anonymity_audit",
    "forecast_backtest_holt",
    "source_vocab_overlap",
    "anova_price_by_returnflag",
    "embedding_sim_histogram",
    "minhash_band_tuning",
    "fulfillment_latency_percentiles",
    "user_survival_curve",
    "quality_temporal_drift",
    "pareto_frontier_parts",
    "market_concentration_hhi",
    "aov_mix_shift_bridge",
    "ivf_nprobe_recall_curve",
    "jaccard_threshold_sweep",
    "time_to_conversion",
    # added in r5, fourth wave: diversified retrieval + the quality
    # detector agreement mart
    "mmr_diverse_topk",
    "detector_kappa",
    "hll_union_overlap",
    "theil_sen_trend",
    # r5 fifth wave: ANN ranking-quality audit + rank statistics
    "ann_ndcg_at_k",
    "mann_whitney_price",
    "spearman_daily_trend",
    "classifier_calibration",
    "trimmed_winsorized_price",
    "containment_pairs",
    "epoch_shuffle_plan",
    "markov_attribution",
    "bot_regularity_flags",
    "rake_keyphrases",
    "shapley_attribution",
    "incremental_mart_rebuild",
    "functional_dependency_audit",
    "pq_codebook_stats",
    "pq_adc_recall",
    "quality_rank_normalize",
    "order_total_reconciliation",
    "idf_jaccard_pairs",
    "table_checksum_manifest",
    "embedding_dup_clusters",
    "embedding_dup_clusters_banded",
    "banded_neardup_recall",
    "embedding_band_skew_audit",
    "term_burst_detection",
    # r6 additions
    "mad_anomaly_events",
    "mad_anomaly_from_counts_daily",
    "hits_hub_authority",
    "shard_local_dedup_loss",
    "lsh_bucket_skew_audit",
    "tail_head_overlap_pairs",
    "memorization_risk_ngrams",
    "quality_decile_lift",
    "ann_mrr_at_k",
    "event_freshness_mart",
    "ngram_kneser_ney_counts",
    "source_pair_dup_matrix",
    "stitch_against_index",
    "watermark_lateness_audit",
    "ab_srm_check",
    "cluster_chaining_audit",
    "pii_rate_by_source",
    # r8 addition: the streaming tier's driver surface (D12 drain + D33 readout)
    "stream_daily_anomaly_readout",
    "stream_freshness_readout",
    "stream_reconciliation_readout",
    "stream_dedup_index_readout",
    # r9 additions: the keyed-state streaming class (D2 drain == B11),
    # the native watermark-emission class (D8 drain == B11), and the
    # IVFADC combined index tier
    "stream_sessionize_readout",
    "stream_session_window_readout",
    "ann_ivf_pq_topk",
    # r10 additions: the streaming serving-ANN index (D37 drain ==
    # C149 batch on the ingested corpus) and the curriculum loader
    # plan (C106 phases x mixture policy)
    "stream_ann_index_readout",
    "curriculum_mixture_plan",
    # r10 addition #3: the streaming source-mixture readout (D38
    # drain == C28 batch over the ingested corpus)
    "stream_mixture_readout",
    # r10 additions #4-5: filtered vector search (pre-filter pushed
    # into IVF probing) and greedy facility-location selection
    "ann_filtered_topk",
    "facility_location_selection",
    # r10 additions #6-7: their quality/pricing audit twins
    "filtered_ann_recall_at_k",
    "selection_coverage_audit",
    # r10 addition #8: bounded-round k-core peel of the trade graph
    "kcore_trade_graph",
    # r10 addition #9: the int8 rung of the quantization-audit ladder
    "sq_int8_recall",
    # r10 addition #10: lead/lag cross-correlation between series
    "xcorr_daily_events",
    # r10 addition #11: post-stratification weights for eval splits
    "holdout_stratum_weights",
    # r10 addition #12: trailing-window exact percentile baselines
    "rolling_percentiles_daily",
]


# Self-adjudicating contention annotations (VERDICT r9 task 2): a
# pinned CONTROL query is interleaved every CONTROL_EVERY headline
# lines; each measurement is stamped with the ratio of its NEAREST
# control sample to the control's floor, so a flag raised on a
# contended host window carries its own evidence (r5-r9 each paid
# judge/builder adjudication time to host noise the artifact could
# not prove). The control is the cheapest stable headline scan-agg:
# a fixed plan, no python, sub-second at sf0.1.
CONTROL_QUERY = "q1_pricing_summary"
CONTROL_EVERY = 10
CONTENTION_RATIO = 1.5


def _control_floor(samples: list[dict], sf_val=0.1) -> float:
    """The control's reference: the MEDIAN of the run's own samples —
    robust to one outlier-fast sample (a single 0.213s control in an
    otherwise-0.33s quiet run once flagged 160 quiet lines against a
    min() floor), and sub-second single-shot jitter (~±0.1s) stays
    well inside the 1.5x cap around the median. To keep a FULLY
    contended run from self-normalizing (its median is itself
    inflated), the reference is clamped to 1.5x the quiet-window
    baseline stamp when one exists — the stamp is an sf0.1
    measurement, so it is only consulted at sf0.1 (at any other SF it
    would mis-scale every ratio: the r10 smoke at sf0.001 read 6.6x
    on quiet windows against the 0.23s stamp)."""
    secs = sorted(s["sec"] for s in samples)
    if not secs:
        return 0.0
    ref = secs[len(secs) // 2]
    if sf_val != 0.1:
        return ref
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_QUERIES.json")
        ) as f:
            base = json.load(f)[CONTROL_QUERY]["sec"]
        ref = min(ref, 1.5 * base)
    except (OSError, KeyError, ValueError):
        pass
    return ref


def _annotate_contention(
    names: list[str], samples: list[dict], floor: float, ratio_cap: float = CONTENTION_RATIO
) -> tuple[dict[str, float], list[str]]:
    """Map each measured query to its nearest control sample's ratio
    vs the floor (pos p means the sample ran just BEFORE headline
    index p, so query i sits between controls at pos<=i and pos>i).
    Returns ({query: ratio}, [queries whose window was contended])."""
    if not samples or floor <= 0:
        return {}, []
    ratios: dict[str, float] = {}
    contended: list[str] = []
    for i, name in enumerate(names):
        nearest = min(samples, key=lambda s: abs(s["pos"] - (i + 0.5)))
        r = round(nearest["sec"] / floor, 2)
        ratios[name] = r
        if r > ratio_cap:
            contended.append(name)
    return ratios, contended


def _extra_queries() -> dict:
    """Bench-only callables not in the oracle registry (approx
    percentiles have no DuckDB twin)."""
    from github_issues_lakehouse_spark.operators.gold import kpi_monthly_component_tier
    from github_issues_lakehouse_spark.operators.silver import silver_issues

    return {
        "gold_kpi_component_tier_approx": lambda spark, sf_dir: kpi_monthly_component_tier(
            silver_issues(spark, sf_dir), approx=True
        )
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    _finish_tee = _tee_stderr(STDERR_LOG)

    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="bench")
    qs = {**Q.queries(), **_extra_queries()}

    # JVM/session warmup on a trivial scan so q1 doesn't pay startup
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Whole-stage-codegen warmup: run every headline query once at the
    # smallest SF so the timed pass measures steady-state throughput,
    # not Janino compile time (~1-2s per distinct plan, paid once per
    # JVM in any long-lived deployment). Disable with BENCH_WARMUP=0.
    if os.environ.get("BENCH_WARMUP", "1") != "0":
        warm_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warm_dir):
            t0 = time.time()
            for name in HEADLINE:
                qs[name](spark, warm_dir).count()
            print(f"# warmup pass ({warm_dir}): {time.time() - t0:.1f}s", file=sys.stderr)

    # Best-of-N per query (default 2): the VM host shows multi-second
    # noise spikes (idle load >2 on 32 cpus — CPU steal), and a single
    # sample can triple a query's number. Cache is cleared between
    # repeats so operator-internal persist() can't turn repeat 2 into
    # a cache read — every sample measures the full computation.
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "3")))
    timings: dict[str, float] = {}
    control_samples: list[dict] = []

    def _sample_control(pos: int) -> None:
        spark.catalog.clearCache()
        t0 = time.time()
        qs[CONTROL_QUERY](spark, sf_dir).count()
        control_samples.append({"pos": pos, "sec": round(time.time() - t0, 3)})

    # control samples are single-shot (unlike the best-of-N headline
    # lines), so the first one must not pay codegen compile: one
    # untimed run at the bench SF warms its plan even when
    # BENCH_WARMUP=0 skipped the sf0.001 warmup pass
    qs[CONTROL_QUERY](spark, sf_dir).count()

    total = 0.0
    for i, name in enumerate(HEADLINE):
        if i % CONTROL_EVERY == 0:
            _sample_control(i)
        best, n = float("inf"), 0
        for _ in range(repeats):
            spark.catalog.clearCache()
            t0 = time.time()
            n = qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.2f}s ({n} rows)", file=sys.stderr)
    _sample_control(len(HEADLINE))
    spark.catalog.clearCache()

    # VERDICT r10 task 2: make the scaling contract self-proving —
    # record the EFFECTIVE parallelism and master the run actually got
    # (read before spark.stop(); annotation only, never the timing loop)
    parallelism = spark.sparkContext.defaultParallelism
    master = spark.sparkContext.master

    floor = _control_floor(control_samples, sf_val)
    contention, contended = _annotate_contention(HEADLINE, control_samples, floor)
    if contended:
        print(
            f"# contended windows (control >{CONTENTION_RATIO}x its {floor:.2f}s floor): "
            f"{len(contended)} queries: {' '.join(contended[:12])}"
            + (" ..." if len(contended) > 12 else ""),
            file=sys.stderr,
        )

    # quiesce the JVM before reading the stderr log so the capture
    # holds every stack frame the run produced (task 5: every block
    # is NAMED in the side file — no anonymous truncated fragments
    # in the driver tail; the full text stays in BENCH_STDERR.log)
    spark.stop()
    _finish_tee()  # sentinel-stop the pump: log drained up to here
    try:
        with open(STDERR_LOG) as f:
            blocks = _exception_blocks(f.read())
    except OSError:
        blocks = []

    # full per-query map -> side file (the driver records the stdout
    # tail only; keep the final line comfortably under ~1 KB)
    side = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_QUERIES.json")
    with open(side, "w") as f:
        json.dump(
            {
                "metric": "headline_queries_wall_total",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf_val,
                "parallelism": parallelism,
                "master": master,
                "queries": timings,
                "control": {
                    "query": CONTROL_QUERY,
                    "every": CONTROL_EVERY,
                    "floor_sec": round(floor, 3),
                    "ratio_cap": CONTENTION_RATIO,
                    "samples": control_samples,
                },
                "contention": contention,
                "contended": contended,
                "stderr_log": STDERR_LOG,
                "stderr_exception_blocks": blocks,
            },
            f,
            indent=1,
        )
    # "queries" stays in the contract line but holds ONLY the 22
    # r1-baseline queries (~600 bytes) so the line parses inside the
    # tail budget; the full 90+ map lives in the side file.
    baseline22 = {k: timings[k] for k in BASELINE_22 if k in timings}
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_total",
                "value": round(total, 3),
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "parallelism": parallelism,
                "master": master,
                "baseline22_total": round(sum(baseline22.values()), 3),
                "contended_n": len(contended),
                "queries": baseline22,
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
