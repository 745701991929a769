"""Query registry: every §2 operator as (spark, sf_dir) -> DataFrame,
plus the DuckDB oracle SQL twin used by the driver's correctness
gate. Column names and rounding are aligned on both sides
(sums -> 2dp, averages/ratios -> 6dp, timestamps -> second strings).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.labels import LakehouseRules
from .operators import (
    chunking,
    clustering,
    dedup,
    dimensional,
    gold,
    graph,
    graph2,
    markov,
    multimodal,
    relational as R,
    relational2 as R2,
    relational3 as R3,
    relational4 as R4,
    relational5 as R5,
    relational6 as R6,
    relational7 as R7,
    quality_checks as QC,
    scale,
    search,
    silver,
    similarity,
    sketches,
    statistics as ST,
    text,
    text2,
    text3,
    text4,
    text5,
    text6,
    timeseries,
    vectors2 as V2,
)

BUCKETS = LakehouseRules().time_buckets_hours


def fmt_ts(c, alias):
    return F.date_format(c, "yyyy-MM-dd HH:mm:ss").alias(alias)


# ---------------------------------------------------------------- A. lakehouse


def q_bronze_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: the typed bronze issues table (pre-enrichment) — ids,
    state, timestamps, raw label array (joined for hashing)."""
    b = silver.synth_issues(spark, sf_dir)
    return b.select(
        "issue_id",
        "state",
        fmt_ts(F.col("created_at"), "created_ts"),
        fmt_ts(F.col("closed_at"), "closed_ts"),
        F.array_join("labels", "|").alias("labels_str"),
        F.array_size("labels").cast("long").alias("n_labels"),
    )


def q_silver_merge_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: cross-run merge dedup — two synthetic ingest runs of the
    events table (run 2 re-delivers every third event with updated
    values), keep-latest per event_id."""
    e = load_events_for_merge(spark, sf_dir)
    merged = silver.merge_keep_latest(e, key="event_id", order_col="run_id")
    return merged.select(
        "event_id",
        "event_type",
        F.round("value", 2).alias("value"),
        F.col("run_id").cast("long").alias("run_id"),
    )


def load_events_for_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.registry import load_table

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    run1 = e.withColumn("run_id", F.lit(1))
    run2 = (
        e.filter(F.col("event_id") % 3 == 0)
        .withColumn("value", F.col("value") + 100)
        .withColumn("run_id", F.lit(2))
    )
    return run1.unionByName(run2)


def q_silver_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = silver.silver_issues(spark, sf_dir)
    return s.select(
        "issue_id",
        "issue_number",
        "title",
        "body",
        "state",
        fmt_ts(F.col("created_at"), "created_ts"),
        fmt_ts(F.col("updated_at"), "updated_ts"),
        fmt_ts(F.col("closed_at"), "closed_ts"),
        "ticket_kind",
        "priority_tier",
        "component",
        F.round("resolution_hours", 6).alias("resolution_hours"),
    )


def q_label_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    return silver.label_catalog(silver.synth_issues(spark, sf_dir))


def q_gold_component_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    kpi = gold.kpi_monthly_component_tier(silver.silver_issues(spark, sf_dir))
    cols = [
        "month",
        "component",
        "priority_tier",
        "created_count",
        "closed_count",
        F.round("avg_resolution_hours", 6).alias("avg_resolution_hours"),
        F.round("median_resolution_hours", 6).alias("median_resolution_hours"),
        F.round("p90_resolution_hours", 6).alias("p90_resolution_hours"),
    ]
    cols += [
        F.round(f"share_closed_within_{b}h", 6).alias(f"share_closed_within_{b}h")
        for b in BUCKETS
    ]
    cols += [F.col("backlog_end").cast("long").alias("backlog_end")]
    return kpi.select(*cols)


def q_gold_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    kpi = gold.kpi_monthly_component_tier(silver.silver_issues(spark, sf_dir))
    g = gold.kpi_monthly_global(kpi)
    # weighted metrics are sums of (group-stat x weight) products whose
    # order differs across engines -> 4dp keeps rounding deterministic
    cols = [
        "month",
        F.col("created_count").cast("long").alias("created_count"),
        F.col("closed_count").cast("long").alias("closed_count"),
        F.col("backlog_end").cast("long").alias("backlog_end"),
        F.round("avg_resolution_hours", 4).alias("avg_resolution_hours"),
        F.round("median_resolution_hours", 4).alias("median_resolution_hours"),
        F.round("p90_resolution_hours", 4).alias("p90_resolution_hours"),
    ]
    cols += [
        F.round(f"share_closed_within_{b}h", 6).alias(f"share_closed_within_{b}h")
        for b in BUCKETS
    ]
    return g.select(*cols)


# SQL building blocks shared by the lakehouse oracles --------------------------

_SILVER_SQL = """
WITH last_ship AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY 1
), silver AS (
  SELECT
    o.o_orderkey AS issue_id,
    o.o_orderkey AS issue_number,
    'Issue ' || CAST(o.o_orderkey AS VARCHAR) || ': ' || o.o_orderpriority AS title,
    'Reported by ' || coalesce(c.c_name, 'anonymous') AS body,
    CASE WHEN o.o_orderstatus = 'F' THEN 'closed' ELSE 'open' END AS state,
    o.o_orderdate AS created_at,
    coalesce(CASE WHEN o.o_orderstatus = 'F' THEN ls.last_ship END, o.o_orderdate)
      AS updated_at,
    CASE WHEN o.o_orderstatus = 'F' THEN ls.last_ship END AS closed_at,
    CASE WHEN o.o_orderkey % 2 = 0 THEN 'defect'
         WHEN o.o_orderkey % 3 = 0 THEN 'docs'
         WHEN o.o_orderkey % 5 = 0 THEN 'enhancement'
         WHEN o.o_orderkey % 7 = 0 THEN 'question'
         ELSE 'other' END AS ticket_kind,
    CASE WHEN o.o_orderpriority LIKE '1%' THEN 'P0'
         WHEN o.o_orderpriority LIKE '2%' THEN 'P1'
         WHEN o.o_orderkey % 2 = 0 THEN 'P2'
         ELSE 'NA' END AS priority_tier,
    CASE WHEN o.o_orderkey % 13 <> 0 THEN c.c_mktsegment
         WHEN o.o_orderkey % 17 = 0 THEN 'Performance'
         ELSE 'other' END AS component,
    CASE WHEN o.o_orderstatus = 'F' AND ls.last_ship IS NOT NULL
         THEN (epoch(ls.last_ship) - epoch(o.o_orderdate)) / 3600.0 END AS resolution_hours
  FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  LEFT JOIN last_ship ls ON o.o_orderkey = ls.l_orderkey
)
"""

_share_cols_sql = ",\n    ".join(
    f"avg(CASE WHEN resolution_hours <= {b} THEN 1.0 ELSE 0.0 END) AS share_closed_within_{b}h"
    for b in BUCKETS
)
_share_round_sql = ",\n  ".join(
    f"round(share_closed_within_{b}h, 6) AS share_closed_within_{b}h" for b in BUCKETS
)

_KPI_SQL = (
    _SILVER_SQL
    + f"""
, defects AS (SELECT * FROM silver WHERE ticket_kind = 'defect')
, created_kpi AS (
  SELECT strftime(created_at, '%Y-%m') AS month, component, priority_tier,
         count(*) AS created_count
  FROM defects WHERE created_at IS NOT NULL GROUP BY 1, 2, 3
), closed_kpi AS (
  SELECT strftime(closed_at, '%Y-%m') AS month, component, priority_tier,
    count(*) AS closed_count,
    (CAST(sum(epoch_us(closed_at) - epoch_us(created_at)) AS DOUBLE) / count(*))
      / 3600000000.0 AS avg_resolution_hours,
    quantile_cont(resolution_hours, 0.5) AS median_resolution_hours,
    quantile_cont(resolution_hours, 0.9) AS p90_resolution_hours,
    {_share_cols_sql}
  FROM defects WHERE closed_at IS NOT NULL AND created_at IS NOT NULL
  GROUP BY 1, 2, 3
), merged AS (
  SELECT
    coalesce(c.month, z.month) AS month,
    coalesce(c.component, z.component) AS component,
    coalesce(c.priority_tier, z.priority_tier) AS priority_tier,
    coalesce(c.created_count, 0) AS created_count,
    coalesce(z.closed_count, 0) AS closed_count,
    z.avg_resolution_hours, z.median_resolution_hours, z.p90_resolution_hours,
    {", ".join(f"z.share_closed_within_{b}h" for b in BUCKETS)}
  FROM created_kpi c
  FULL OUTER JOIN closed_kpi z
    ON c.month = z.month AND c.component = z.component AND c.priority_tier = z.priority_tier
), kpi AS (
  SELECT *,
    sum(created_count - closed_count) OVER (
      PARTITION BY component, priority_tier ORDER BY month
      ROWS UNBOUNDED PRECEDING) AS backlog_end
  FROM merged
)
"""
)

ORACLE_SILVER = (
    _SILVER_SQL
    + """
SELECT issue_id, issue_number, title, body, state,
  strftime(created_at, '%Y-%m-%d %H:%M:%S') AS created_ts,
  strftime(updated_at, '%Y-%m-%d %H:%M:%S') AS updated_ts,
  strftime(closed_at, '%Y-%m-%d %H:%M:%S') AS closed_ts,
  ticket_kind, priority_tier, component,
  round(resolution_hours, 6) AS resolution_hours
FROM silver
"""
)

ORACLE_LABEL_CATALOG = """
WITH last_ship AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY 1
), lab AS (
  SELECT o.o_orderkey AS k, c.c_mktsegment AS seg, o.o_orderpriority AS prio
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
), exploded AS (
  SELECT CASE WHEN prio LIKE '1%' THEN 'Blocker'
              WHEN prio LIKE '2%' THEN 'Regression' END AS label FROM lab
  UNION ALL
  SELECT CASE WHEN k % 2 = 0 THEN 'Bug' WHEN k % 3 = 0 THEN 'Docs'
              WHEN k % 5 = 0 THEN 'Enhancement' WHEN k % 7 = 0 THEN 'Usage Question' END FROM lab
  UNION ALL
  SELECT CASE WHEN k % 13 <> 0 THEN 'component: ' || seg END FROM lab
  UNION ALL
  SELECT CASE WHEN k % 17 = 0 THEN 'Performance' END FROM lab
  UNION ALL
  SELECT CASE WHEN k % 11 = 0 THEN 'Needs Triage' END FROM lab
)
SELECT label, count(*) AS count, '' AS description
FROM exploded WHERE label IS NOT NULL GROUP BY 1
"""

ORACLE_GOLD_COMPONENT = (
    _KPI_SQL
    + f"""
SELECT month, component, priority_tier, created_count, closed_count,
  round(avg_resolution_hours, 6) AS avg_resolution_hours,
  round(median_resolution_hours, 6) AS median_resolution_hours,
  round(p90_resolution_hours, 6) AS p90_resolution_hours,
  {_share_round_sql},
  CAST(backlog_end AS BIGINT) AS backlog_end
FROM kpi
"""
)

ORACLE_GOLD_GLOBAL = (
    _KPI_SQL
    + f"""
, sums AS (
  SELECT month, sum(created_count) AS created_count, sum(closed_count) AS closed_count,
         sum(backlog_end) AS backlog_end
  FROM kpi GROUP BY 1
), weighted AS (
  SELECT month,
    sum(avg_resolution_hours * closed_count) / sum(closed_count) AS avg_resolution_hours,
    sum(median_resolution_hours * closed_count) / sum(closed_count) AS median_resolution_hours,
    sum(p90_resolution_hours * closed_count) / sum(closed_count) AS p90_resolution_hours,
    {", ".join(f"sum(share_closed_within_{b}h * closed_count) / sum(closed_count) AS share_closed_within_{b}h" for b in BUCKETS)}
  FROM kpi WHERE closed_count > 0 GROUP BY 1
)
SELECT s.month,
  CAST(s.created_count AS BIGINT) AS created_count,
  CAST(s.closed_count AS BIGINT) AS closed_count,
  CAST(s.backlog_end AS BIGINT) AS backlog_end,
  round(w.avg_resolution_hours, 4) AS avg_resolution_hours,
  round(w.median_resolution_hours, 4) AS median_resolution_hours,
  round(w.p90_resolution_hours, 4) AS p90_resolution_hours,
  {", ".join(f"round(w.share_closed_within_{b}h, 6) AS share_closed_within_{b}h" for b in BUCKETS)}
FROM sums s LEFT JOIN weighted w ON s.month = w.month
"""
)


def q_gold_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: the reference-README SLA/stability mart (README.md
    "Critical issue rule"/"SLA rule"/"Monthly KPIs", config.yml
    ``hours_in_month``) — monthly critical-issue exposure hours,
    stability index, SLA breach rate, backlog. See
    operators/gold.py:sla_stability_mart."""
    return gold.sla_stability_mart(silver.silver_issues(spark, sf_dir))


_SLA_US = 168 * 3_600_000_000
_MONTH_US = 720 * 3_600_000_000

ORACLE_GOLD_SLA = (
    _SILVER_SQL
    + f"""
, crit AS (SELECT * FROM silver WHERE priority_tier IN ('P0', 'P1'))
, created_k AS (
  SELECT strftime(created_at, '%Y-%m') AS month, component,
    count(*) AS created_critical
  FROM crit WHERE created_at IS NOT NULL GROUP BY 1, 2
), closed_k AS (
  SELECT strftime(closed_at, '%Y-%m') AS month, component,
    count(*) AS closed_critical,
    sum(CASE WHEN epoch_us(CAST(closed_at AS TIMESTAMP))
             - epoch_us(CAST(created_at AS TIMESTAMP)) > {_SLA_US}
        THEN 1 ELSE 0 END) AS sla_breaches
  FROM crit WHERE closed_at IS NOT NULL AND created_at IS NOT NULL
  GROUP BY 1, 2
), spans AS (
  SELECT component,
    epoch_us(CAST(created_at AS TIMESTAMP)) AS c_us,
    epoch_us(CAST(closed_at AS TIMESTAMP)) AS z_us,
    unnest(generate_series(date_trunc('month', CAST(created_at AS TIMESTAMP)),
                           date_trunc('month', CAST(closed_at AS TIMESTAMP)),
                           INTERVAL 1 MONTH)) AS mth
  FROM crit WHERE closed_at IS NOT NULL AND created_at IS NOT NULL
    AND closed_at >= created_at
), hours AS (
  SELECT strftime(mth, '%Y-%m') AS month, component, sum(open_us) AS open_us
  FROM (
    SELECT component, mth,
      least(z_us, epoch_us(mth + INTERVAL 1 MONTH))
        - greatest(c_us, epoch_us(mth)) AS open_us
    FROM spans
  ) WHERE open_us > 0 GROUP BY 1, 2
), cz AS (
  SELECT coalesce(c.month, z.month) AS month,
    coalesce(c.component, z.component) AS component,
    coalesce(c.created_critical, 0) AS created_critical,
    coalesce(z.closed_critical, 0) AS closed_critical,
    z.sla_breaches
  FROM created_k c FULL OUTER JOIN closed_k z
    ON c.month = z.month AND c.component = z.component
), merged AS (
  SELECT coalesce(a.month, h.month) AS month,
    coalesce(a.component, h.component) AS component,
    coalesce(a.created_critical, 0) AS created_critical,
    coalesce(a.closed_critical, 0) AS closed_critical,
    a.sla_breaches,
    coalesce(h.open_us, 0) AS open_us
  FROM cz a FULL OUTER JOIN hours h
    ON a.month = h.month AND a.component = h.component
), final AS (
  SELECT *,
    sum(created_critical - closed_critical) OVER (
      PARTITION BY component ORDER BY month
      ROWS UNBOUNDED PRECEDING) AS backlog_critical_end
  FROM merged
)
SELECT month, component,
  CAST(created_critical AS BIGINT) AS created_critical,
  CAST(closed_critical AS BIGINT) AS closed_critical,
  CAST(backlog_critical_end AS BIGINT) AS backlog_critical_end,
  CAST(open_us // 3600 AS BIGINT) AS total_critical_hours_e6,
  CAST(1000000 - ({{PPM_OPEN}}) AS BIGINT) AS stability_index_ppm,
  CAST(CASE WHEN closed_critical > 0 THEN {{PPM_BREACH}} END AS BIGINT) AS sla_breach_ppm
FROM final
"""
)

from .functions.exact import ppm_sql as _ppm_sql  # noqa: E402

ORACLE_GOLD_SLA = ORACLE_GOLD_SLA.replace(
    "{PPM_OPEN}", _ppm_sql("open_us", str(_MONTH_US))
).replace("{PPM_BREACH}", _ppm_sql("sla_breaches", "closed_critical"))


def q_gold_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month KPI deltas on the global mart — the reporting
    layer a dashboard reads on top of gold: lag/delta/%-change per
    month. The window is global but calendar-bounded (one row per
    month), the same bounded-carry argument as the prefix-sum
    operators; all pct inputs are exact BIGINTs so the divides are
    engine-identical."""
    from pyspark.sql import Window

    g = q_gold_global(spark, sf_dir).select(
        "month", "created_count", "closed_count", "backlog_end"
    )
    w = Window.orderBy("month")
    prev_created = F.lag("created_count").over(w)
    prev_closed = F.lag("closed_count").over(w)
    pct = lambda cur, prev: F.round(  # noqa: E731
        F.when(prev > 0, (cur - prev).cast("double") / prev.cast("double")), 6
    )
    return g.select(
        "month",
        "created_count",
        pct(F.col("created_count"), prev_created).alias("created_mom_pct"),
        "closed_count",
        pct(F.col("closed_count"), prev_closed).alias("closed_mom_pct"),
        "backlog_end",
        (F.col("backlog_end") - F.lag("backlog_end").over(w)).cast("long").alias("backlog_delta"),
    )


def q_gold_sla_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 (r5, VERDICT r4 task 5): month-over-month SLA deltas — the
    A8 MoM reporting window composed over the A9 SLA/stability mart:
    per (component, month), the breach-ppm / stability-ppm / backlog
    deltas vs the component's previous ACTIVE month. The window input
    is the (months x components)-sized mart, never issue history, and
    every delta is BIGINT ppm-minus-ppm — no division, no floats, so
    the output is engine-exact by construction. Breach delta is NULL
    when either month has no closures (ppm undefined).
    """
    from pyspark.sql import Window

    m = q_gold_sla(spark, sf_dir).select(
        "month",
        "component",
        "sla_breach_ppm",
        "stability_index_ppm",
        "backlog_critical_end",
    )
    w = Window.partitionBy("component").orderBy("month")
    return m.select(
        "month",
        "component",
        "sla_breach_ppm",
        (F.col("sla_breach_ppm") - F.lag("sla_breach_ppm").over(w))
        .cast("long")
        .alias("breach_mom_ppm_delta"),
        "stability_index_ppm",
        (F.col("stability_index_ppm") - F.lag("stability_index_ppm").over(w))
        .cast("long")
        .alias("stability_mom_ppm_delta"),
        (F.col("backlog_critical_end") - F.lag("backlog_critical_end").over(w))
        .cast("long")
        .alias("backlog_mom_delta"),
    )


# nested WITH: the SLA oracle is itself a WITH query; DuckDB allows it
# inside a CTE body, so the MoM twin wraps it verbatim — one source of
# truth for the mart's semantics.
ORACLE_GOLD_SLA_MOM = (
    "WITH sla AS (\n"
    + ORACLE_GOLD_SLA
    + """)
SELECT month, component, sla_breach_ppm,
  CAST(sla_breach_ppm - lag(sla_breach_ppm) OVER w AS BIGINT) AS breach_mom_ppm_delta,
  stability_index_ppm,
  CAST(stability_index_ppm - lag(stability_index_ppm) OVER w AS BIGINT) AS stability_mom_ppm_delta,
  CAST(backlog_critical_end - lag(backlog_critical_end) OVER w AS BIGINT) AS backlog_mom_delta
FROM sla WINDOW w AS (PARTITION BY component ORDER BY month)
"""
)


# ------------------------------------------------------------- registry

# Registry ORDER matters: the external driver checks entries in dict
# order under a ~50-entry budget cap (r3-r10 each checked exactly 50).
# Round 11 ordering (optimization round): positions 1-12 are the 12
# keys that have NEVER been driver-checked (the r10 additions — no
# CORRECTNESS_r* file ever sampled them; facility_location_selection /
# selection_coverage_audit / kcore_trade_graph were ALSO rewritten for
# performance this round, so their first driver row lands on the
# optimized code); 13-21 are the remaining keys whose IMPLEMENTING
# FUNCTION changed in r11 after their latest driver row (pq_adc_recall
# / pagerank / pca pair / rrf: r10 rows; theil_sen / minhash_band /
# jaccard_sweep: r6; hits: r7 — the driver must re-hash every
# optimizer-touched path, the r11 gate test_registry_reconciliation
# enforces mechanically); 22-27 retire the 6 remaining r4-stale keys
# (promised "first in line for r11" at r10 close); 28-50 refresh the
# oldest surviving evidence (r5-vintage rows, registry order within
# the round). No new operators this round (optimization only).
_DRIVER_PRIORITY_R11 = [
    "stream_ann_index_readout",
    "curriculum_mixture_plan",
    "stream_mixture_readout",
    "ann_filtered_topk",
    "facility_location_selection",
    "filtered_ann_recall_at_k",
    "selection_coverage_audit",
    "kcore_trade_graph",
    "sq_int8_recall",
    "xcorr_daily_events",
    "holdout_stratum_weights",
    "rolling_percentiles_daily",
    "pq_adc_recall",
    "pagerank_trade_graph",
    "pca_top_component",
    "pca_projection_outliers",
    "rrf_hybrid_topk",
    "theil_sen_trend",
    "minhash_band_tuning",
    "jaccard_threshold_sweep",
    "hits_hub_authority",
    "unpivot_lineitem_metrics",
    "corr_matrix_lineitem",
    "equi_depth_histogram",
    "table_stats_mart",
    "gopher_quality_rules",
    "join_key_skew",
    "gold_sla_mom",
    "dedup_cluster_size_profile",
    "minhash_calibration",
    "quality_length_bias",
    "pack_efficiency",
    "media_dedup_stats",
    "substring_phase_audit",
    "char_class_stats",
    "kfold_assignment",
    "filtered_agg_orders",
    "order_seasonality",
    "customer_rfm",
    "revenue_concentration",
    "mmr_diverse_topk",
    "ann_ndcg_at_k",
    "mann_whitney_price",
    "spearman_daily_trend",
    "classifier_calibration",
    "trimmed_winsorized_price",
    "containment_pairs",
    "epoch_shuffle_plan",
    "markov_attribution",
    "bot_regularity_flags",
]


def _stream_daily_anomaly_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy import wrapper: keep the streaming module out of the
    batch-registry import path until the key actually runs."""
    from .streaming.ops import stream_daily_anomaly_readout

    return stream_daily_anomaly_readout(spark, sf_dir)


def _stream_freshness_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.ops import stream_freshness_readout

    return stream_freshness_readout(spark, sf_dir)


def _stream_reconciliation_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.ops import stream_reconciliation_readout

    return stream_reconciliation_readout(spark, sf_dir)


def _stream_dedup_index_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.ops import stream_dedup_index_readout

    return stream_dedup_index_readout(spark, sf_dir)


def _stream_sessionize_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.ops import stream_sessionize_readout

    return stream_sessionize_readout(spark, sf_dir)


def _stream_session_window_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.ops import stream_session_window_readout

    return stream_session_window_readout(spark, sf_dir)


def _stream_ann_index_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.ops import stream_ann_index_readout

    return stream_ann_index_readout(spark, sf_dir)


def _stream_mixture_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .streaming.ops import stream_mixture_readout

    return stream_mixture_readout(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        # A. lakehouse parity (r1: pass, cheap — keep up front as smoke)
        "bronze_issues": q_bronze_issues,
        "silver_issues": q_silver_issues,
        "silver_merge_dedup": q_silver_merge_dedup,
        "label_catalog": q_label_catalog,
        "gold_kpi_component_tier": q_gold_component_tier,
        "gold_kpi_global": q_gold_global,
        "gold_kpi_mom": q_gold_mom,
        "gold_sla_stability": q_gold_sla,
        "gold_sla_mom": q_gold_sla_mom,
        "snapshot_diff": scale.snapshot_diff,
        # C. LLM-data pipeline (no driver evidence in r1 — check first)
        "dedup_exact": dedup.dedup_exact,
        "duplication_profile": dedup.duplication_profile,
        "dedup_keep_best": dedup.dedup_keep_best,
        "dedup_minhash_lsh": dedup.dedup_minhash_lsh,
        "dedup_clusters": dedup.dedup_clusters,
        "dedup_cluster_size_profile": dedup.dedup_cluster_size_profile,
        "minhash_calibration": dedup.minhash_calibration,
        "dedup_simhash": dedup.dedup_simhash,
        "dedup_ngram_jaccard": dedup.dedup_ngram_jaccard,
        "neardup_embedding_cosine": similarity.neardup_embedding_cosine,
        "ann_bruteforce_topk": similarity.ann_bruteforce_topk,
        "ann_lsh_topk": similarity.ann_lsh_topk,
        "ann_ivf_topk": similarity.ann_ivf_topk,
        "lang_id": text.lang_id,
        "quality_score": text.quality_score,
        "token_count": text.token_count,
        "doc_fingerprint": text.doc_fingerprint,
        "corpus_stats": text.corpus_stats,
        "embedding_centroids": V2.embedding_centroids,
        "tfidf_top_terms": V2.tfidf_top_terms,
        "quantize_embeddings": V2.quantize_embeddings,
        "sample_stratified": scale.sample_stratified,
        "training_corpus_filter": scale.training_corpus_filter,
        "quality_length_bias": scale.quality_length_bias,
        "chunk_documents": chunking.chunk_documents,
        "pack_sequences": chunking.pack_sequences,
        "pack_efficiency": chunking.pack_efficiency,
        "decontaminate_ngram": chunking.decontaminate_ngram,
        "decontaminate_bloom": chunking.decontaminate_bloom,
        "dsir_importance_weights": text2.dsir_importance_weights,
        "unigram_perplexity": text2.unigram_perplexity,
        "multimodal_meta": multimodal.multimodal_meta,
        "media_dedup_stats": multimodal.media_dedup_stats,
        "frame_sample": multimodal.frame_sample,
        # C-suite additions (r2): PII scrubbing, ANN quality, vocab /
        # mixture / dedup-rate marts
        "audio_features": multimodal.audio_features,
        "pii_redact": text2.pii_redact,
        "ann_recall_at_k": similarity.ann_recall_at_k,
        "embedding_decontaminate": similarity.embedding_decontaminate,
        "dedup_exact_substrings": dedup.dedup_exact_substrings,
        "token_dedup_savings": dedup.token_dedup_savings,
        "substring_phase_audit": dedup.substring_phase_audit,
        "ann_ivf_recall_at_k": similarity.ann_ivf_recall_at_k,
        "hard_negative_mining": similarity.hard_negative_mining,
        "knn_label_purity": similarity.knn_label_purity,
        "vocab_stats": text2.vocab_stats,
        "source_mixing_weights": text2.source_mixing_weights,
        "dedup_rate_mart": text2.dedup_rate_mart,
        # C-suite additions (r2, second wave): repetition gate,
        # paragraph-window dedup, distributed k-means, SCD2 history
        "repetition_filter": text3.repetition_filter,
        "paragraph_dedup": text3.paragraph_dedup,
        "kmeans_embeddings": clustering.kmeans_embeddings,
        "semdedup": clustering.semdedup,
        "scd2_priority_history": dimensional.scd2_priority_history,
        # C-suite additions (r2, third wave): tokenizer induction,
        # cross-source contamination, classifier-style quality gate
        "bpe_pair_counts": text3.bpe_pair_counts,
        "cross_source_overlap": text3.cross_source_overlap,
        "quality_classifier": text3.quality_classifier,
        # C-suite additions (r2, fourth wave): vocabulary richness,
        # robust length outliers, integer-exact weighted sampling
        "ttr_stats": text4.ttr_stats,
        "length_outliers": text4.length_outliers,
        "weighted_sample": text4.weighted_sample,
        "embedding_norm_outliers": V2.embedding_norm_outliers,
        "label_separability": V2.label_separability,
        "plan_token_shards": chunking.plan_token_shards,
        "holdout_split": scale.holdout_split,
        "token_histogram": text4.token_histogram,
        "winnow_overlap_pairs": text4.winnow_overlap_pairs,
        "source_drift_kl": text4.source_drift_kl,
        "tokenizer_fertility": text4.tokenizer_fertility,
        "cross_split_leakage": text4.cross_split_leakage,
        "vocab_coverage": text4.vocab_coverage,
        "modality_qa_join": text4.modality_qa_join,
        "char_class_stats": text4.char_class_stats,
        "kfold_assignment": scale.kfold_assignment,
        # TPC-H Q6 (completes the 22-query access-pattern set)
        "q6_forecast_revenue": R5.forecast_revenue,
        # interval analytics (new in r2, third batch): distributed
        # prefix-sum concurrency + time-RANGE window frames
        "concurrent_sessions": R6.concurrent_sessions,
        "trailing_window_user_value": R6.trailing_window_user_value,
        "session_window_batch": R6.session_window_batch,
        "variant_events": R6.variant_events,
        "unpivot_lineitem_metrics": R6.unpivot_lineitem_metrics,
        "time_weighted_value": R6.time_weighted_value,
        "activity_streaks": R6.activity_streaks,
        "filtered_agg_orders": R6.filtered_agg_orders,
        "contingency_orders": R6.contingency_orders,
        "order_seasonality": R6.order_seasonality,
        "customer_rfm": R6.customer_rfm,
        "revenue_concentration": R6.revenue_concentration,
        "event_path_match": R6.event_path_match,
        # data-quality expectations mart (Delta-constraint / dbt-test
        # analogue): shared-scan rule counters + FK orphan joins
        "dq_violations": QC.dq_violations,
        # C-suite additions (r3): Gopher filter rules, information-
        # theoretic corpus diagnostics, PMI feature selection,
        # embedding covariance, batch twin of streaming dedup
        "gopher_quality_rules": text5.gopher_quality_rules,
        "doc_entropy": text5.doc_entropy,
        "zipf_slope": text5.zipf_slope,
        "term_source_association": text5.term_source_association,
        "embedding_covariance": V2.embedding_covariance,
        "event_dedup_windowed": R6.event_dedup_windowed,
        "kmv_distinct_terms": sketches.kmv_distinct_terms,
        "cms_term_counts": sketches.cms_term_counts,
        "hll_distinct_terms": sketches.hll_distinct_terms,
        "hll_union_overlap": sketches.hll_union_overlap,
        "quantile_sketch_price": sketches.quantile_sketch_price,
        "dedup_aware_holdout": dedup.dedup_aware_holdout,
        "dedup_against_index": dedup.dedup_against_index,
        "neardup_against_index": dedup.neardup_against_index,
        "normalization_impact": dedup.normalization_impact,
        "curriculum_plan": chunking.curriculum_plan,
        "span_corruption_plan": chunking.span_corruption_plan,
        "holt_linear_daily": timeseries.holt_linear_daily,
        "theil_sen_trend": timeseries.theil_sen_trend,
        "rendezvous_shard_plan": scale.rendezvous_shard_plan,
        "benford_first_digit": ST.benford_first_digit,
        "gini_revenue": ST.gini_revenue,
        "ks_promo_price": ST.ks_promo_price,
        "autocorr_daily": timeseries.autocorr_daily,
        "boilerplate_prefix_stats": text6.boilerplate_prefix_stats,
        "bloom_fpr_audit": chunking.bloom_fpr_audit,
        "event_entropy_rate": markov.event_entropy_rate,
        "markov_stationary_events": markov.markov_stationary_events,
        "vocab_growth_curve": text6.vocab_growth_curve,
        "simpson_diversity_by_source": text6.simpson_diversity_by_source,
        "contingency_dependence": ST.contingency_dependence,
        "lorenz_deciles": ST.lorenz_deciles,
        "fano_daily_dispersion": timeseries.fano_daily_dispersion,
        "stopword_mass_by_source": text6.stopword_mass_by_source,
        "theil_hoover_indices": ST.theil_hoover_indices,
        "referential_integrity_audit": QC.referential_integrity_audit,
        "k_anonymity_audit": QC.k_anonymity_audit,
        "forecast_backtest_holt": timeseries.forecast_backtest_holt,
        "source_vocab_overlap": text6.source_vocab_overlap,
        "anova_price_by_returnflag": ST.anova_price_by_returnflag,
        "embedding_sim_histogram": similarity.embedding_sim_histogram,
        "minhash_band_tuning": dedup.minhash_band_tuning,
        "fulfillment_latency_percentiles": R7.fulfillment_latency_percentiles,
        "user_survival_curve": timeseries.user_survival_curve,
        "quality_temporal_drift": QC.quality_temporal_drift,
        "pareto_frontier_parts": R7.pareto_frontier_parts,
        "market_concentration_hhi": ST.market_concentration_hhi,
        "aov_mix_shift_bridge": R7.aov_mix_shift_bridge,
        "ivf_nprobe_recall_curve": similarity.ivf_nprobe_recall_curve,
        "mmr_diverse_topk": similarity.mmr_diverse_topk,
        "ann_ndcg_at_k": similarity.ann_ndcg_at_k,
        "mann_whitney_price": ST.mann_whitney_price,
        "spearman_daily_trend": timeseries.spearman_daily_trend,
        "classifier_calibration": QC.classifier_calibration,
        "trimmed_winsorized_price": ST.trimmed_winsorized_price,
        "containment_pairs": dedup.containment_pairs,
        "epoch_shuffle_plan": chunking.epoch_shuffle_plan,
        "markov_attribution": markov.markov_attribution,
        "bot_regularity_flags": timeseries.bot_regularity_flags,
        "rake_keyphrases": text6.rake_keyphrases,
        "shapley_attribution": markov.shapley_attribution,
        "incremental_mart_rebuild": scale.incremental_mart_rebuild,
        "functional_dependency_audit": QC.functional_dependency_audit,
        "pq_codebook_stats": V2.pq_codebook_stats,
        "pq_adc_recall": V2.pq_adc_recall,
        "quality_rank_normalize": QC.quality_rank_normalize,
        "order_total_reconciliation": QC.order_total_reconciliation,
        "idf_jaccard_pairs": dedup.idf_jaccard_pairs,
        "table_checksum_manifest": QC.table_checksum_manifest,
        "embedding_dup_clusters": similarity.embedding_dup_clusters,
        "embedding_dup_clusters_banded": similarity.embedding_dup_clusters_banded,
        "banded_neardup_recall": similarity.banded_neardup_recall,
        "embedding_band_skew_audit": similarity.embedding_band_skew_audit,
        "term_burst_detection": text6.term_burst_detection,
        "jaccard_threshold_sweep": dedup.jaccard_threshold_sweep,
        "time_to_conversion": timeseries.time_to_conversion,
        "token_budget_apportionment": chunking.token_budget_apportionment,
        "pagerank_trade_graph": graph.pagerank_trade_graph,
        "label_association_rules": R6.label_association_rules,
        "daily_anomaly_events": R6.daily_anomaly_events,
        "mixture_resample": text2.mixture_resample,
        "redact_contaminated_spans": chunking.redact_contaminated_spans,
        "event_order_inversions": R6.event_order_inversions,
        "weighted_median_price": R6.weighted_median_price,
        "weighted_quantiles_price": R6.weighted_quantiles_price,
        "length_bucketed_batches": chunking.length_bucketed_batches,
        "source_interleave_plan": chunking.source_interleave_plan,
        "yoy_revenue": R6.yoy_revenue,
        # r3 third batch: one-shot graph analytics, basket association,
        # optimizer statistics, attribution, EWMA, co-occurrence PMI,
        # hashing-trick features, power-iteration PCA
        "supplier_cosupply_triangles": graph2.supplier_cosupply_triangles,
        "part_copurchase_lift": graph2.part_copurchase_lift,
        "equi_depth_histogram": R7.equi_depth_histogram,
        "table_stats_mart": R7.table_stats_mart,
        "attribution_touchpoints": R7.attribution_touchpoints,
        "ewma_user_value": R7.ewma_user_value,
        "term_cooccurrence_pmi": text6.term_cooccurrence_pmi,
        "feature_hash_counts": text6.feature_hash_counts,
        "pca_top_component": V2.pca_top_component,
        "bpe_merge_learning": text6.bpe_merge_learning,
        # r3 fifth batch: search/ranking, time-series decomposition,
        # changepoint, correlation matrix, join-skew diagnostics
        "bm25_topk": search.bm25_topk,
        "rrf_hybrid_topk": search.rrf_hybrid_topk,
        "seasonal_decompose_daily": timeseries.seasonal_decompose_daily,
        "cusum_changepoint": timeseries.cusum_changepoint,
        "corr_matrix_lineitem": R7.corr_matrix_lineitem,
        "join_key_skew": R7.join_key_skew,
        # r3 sixth batch: tokenizer application, experimentation,
        # graph node similarity
        "bpe_tokenize_stats": text6.bpe_tokenize_stats,
        "ab_test_conversion": R7.ab_test_conversion,
        "supplier_neighbor_jaccard": graph2.supplier_neighbor_jaccard,
        # r3 seventh batch: learned-transform application + index /
        # classifier audits
        "pca_projection_outliers": V2.pca_projection_outliers,
        "classifier_pr_curve": QC.classifier_pr_curve,
        "detector_kappa": QC.detector_kappa,
        "lsh_recall_vs_exact": dedup.lsh_recall_vs_exact,
        # r3 eighth batch: product analytics, CBO validation, sequence
        # mining
        "dau_wau_stickiness": timeseries.dau_wau_stickiness,
        "event_trigram_patterns": timeseries.event_trigram_patterns,
        "join_size_estimate": R7.join_size_estimate,
        # r3 ninth batch: detector eval, retention snapshot
        "lang_id_confusion": text6.lang_id_confusion,
        "user_churn_flags": timeseries.user_churn_flags,
        "user_growth_accounting": timeseries.user_growth_accounting,
        "price_quantity_heatmap": R7.price_quantity_heatmap,
        "weekday_hour_heatmap": R7.weekday_hour_heatmap,
        # B entries fixed in r2 or lacking r1 driver evidence
        "label_array_funcs": R3.label_array_funcs,
        "null_semantics_orders": R3.null_semantics_orders,
        "profile_orders": R3.profile_orders,
        "histogram_prices": R3.histogram_prices,
        # TPC-H tail shapes (new in r2): Q2/Q11/Q15/Q21/Q22 equivalents
        "min_cost_supplier": R4.min_cost_supplier,
        "important_parts_share": R4.important_parts_share,
        "top_supplier_revenue": R4.top_supplier_revenue,
        "returns_blame_suppliers": R4.returns_blame_suppliers,
        "idle_rich_customers": R4.idle_rich_customers,
        # TPC-H tail, second wave (new in r2): Q4/Q8/Q9/Q10/Q12/Q14/
        # Q16/Q20 equivalents
        "order_priority_checking": R5.order_priority_checking,
        "national_market_share": R5.national_market_share,
        "product_profit": R5.product_profit,
        "returned_items_top_customers": R5.returned_items_top_customers,
        "late_shipment_priority": R5.late_shipment_priority,
        "promo_revenue_share": R5.promo_revenue_share,
        "parts_supplier_count": R5.parts_supplier_count,
        "excess_supply_suppliers": R5.excess_supply_suppliers,
        # Heavy composites LAST within the unevidenced block: if the
        # driver's check budget cuts off here, it spent its time on
        # breadth first (each of these re-runs the minhash or model
        # subtree and costs 10-20s at check SF).
        "cluster_mixing_weights": clustering.cluster_mixing_weights,
        "detector_agreement": dedup.detector_agreement,
        "edit_distance_pairs": dedup.edit_distance_pairs,
        "bigram_perplexity": text2.bigram_perplexity,
        "contamination_attribution": chunking.contamination_attribution,
        "neardup_keep_best": dedup.neardup_keep_best,
        # B. relational core (r1: all pass — re-checked as budget allows)
        "q1_pricing_summary": R.q1_pricing_summary,
        "q3_shipping_priority": R.q3_shipping_priority,
        "q5_region_revenue": R.q5_region_revenue,
        "market_segment_share": R.market_segment_share,
        "topk_per_group": R.topk_per_group,
        "rollup_orders": R.rollup_orders,
        "cube_events": R.cube_events,
        "pivot_events": R.pivot_events,
        "asof_join_orders_events": R.asof_join_orders_events,
        "range_join_events": R.range_join_events,
        "sessionize_events": R.sessionize_events,
        "funnel_events": R.funnel_events,
        "windowed_agg_events": R.windowed_agg_events,
        "semi_anti_join": R.semi_anti_join,
        "json_extract_events": R.json_extract_events,
        "distinct_agg_orders": R2.distinct_agg_orders,
        "having_active_customers": R2.having_active_customers,
        "exists_urgent_customers": R2.exists_urgent_customers,
        "scalar_subquery_above_avg": R2.scalar_subquery_above_avg,
        "set_ops_customers": R2.set_ops_customers,
        "string_funcs_parts": R2.string_funcs_parts,
        "date_arith_orders": R2.date_arith_orders,
        "count_distribution": R2.count_distribution,
        "nation_pair_volume": R2.nation_pair_volume,
        "part_revenue_rank": R2.part_revenue_rank,
        "running_customer_totals": R3.running_customer_totals,
        "order_gap_days": R3.order_gap_days,
        "moving_avg_user_value": R3.moving_avg_user_value,
        "stats_summary_lineitem": R3.stats_summary_lineitem,
        "grouping_sets_revenue": R3.grouping_sets_revenue,
        "daily_gapfill_events": R3.daily_gapfill_events,
        "percentile_suite_lineitem": R3.percentile_suite_lineitem,
        "props_map_stats": R3.props_map_stats,
        "window_rank_suite": R3.window_rank_suite,
        "event_transitions": R3.event_transitions,
        "cohort_retention": R3.cohort_retention,
        "q17_small_quantity_revenue": R3.q17_small_quantity_revenue,
        "q18_large_volume_orders": R3.q18_large_volume_orders,
        "q19_disjunctive_revenue": R3.q19_disjunctive_revenue,
        # r6 additions — LAST on purpose (VERDICT r5 task 1: new keys
        # ride BELOW the never-driver-checked backlog so they cannot
        # displace it from the ~50-row driver budget)
        "mad_anomaly_events": timeseries.mad_anomaly_events,
        "mad_anomaly_from_counts_daily": timeseries.mad_anomaly_from_counts_daily,
        "hits_hub_authority": graph.hits_hub_authority,
        "shard_local_dedup_loss": dedup.shard_local_dedup_loss,
        "lsh_bucket_skew_audit": dedup.lsh_bucket_skew_audit,
        "tail_head_overlap_pairs": dedup.tail_head_overlap_pairs,
        "memorization_risk_ngrams": text6.memorization_risk_ngrams,
        "quality_decile_lift": QC.quality_decile_lift,
        "ann_mrr_at_k": similarity.ann_mrr_at_k,
        "event_freshness_mart": timeseries.event_freshness_mart,
        "ngram_kneser_ney_counts": text6.ngram_kneser_ney_counts,
        "source_pair_dup_matrix": dedup.source_pair_dup_matrix,
        "stitch_against_index": dedup.stitch_against_index,
        "watermark_lateness_audit": timeseries.watermark_lateness_audit,
        "ab_srm_check": R7.ab_srm_check,
        "cluster_chaining_audit": dedup.cluster_chaining_audit,
        "pii_rate_by_source": text2.pii_rate_by_source,
        # r8 addition — below the refresh queue per the r5-r7
        # discipline: the streaming tier's first driver-checked
        # surface (D12 mart drain -> D33 MAD readout == B130 batch)
        "stream_daily_anomaly_readout": _stream_daily_anomaly_readout,
        "stream_freshness_readout": _stream_freshness_readout,
        "stream_reconciliation_readout": _stream_reconciliation_readout,
        "stream_dedup_index_readout": _stream_dedup_index_readout,
        # r9 additions — below the refresh queue per the r5-r8
        # discipline: the keyed-state class (D2 applyInPandasWithState
        # drain == batch B11) and the watermark-emission class (D8
        # native session_window drain == the same oracle)
        "stream_sessionize_readout": _stream_sessionize_readout,
        "stream_session_window_readout": _stream_session_window_readout,
        # r9 batch addition: IVF + PQ combined — the production ANN
        # index shape (coarse lists bound WHICH vectors a query
        # scores, ADC bounds WHAT is read per candidate)
        "ann_ivf_pq_topk": similarity.ann_ivf_pq_topk,
        # r10 addition — below the refresh queue per the r5-r10
        # discipline: D37's streaming serving-ANN index as a
        # driver-checked surface (frozen quantizers, append-only
        # quantized index rows, probe-from-committed-state == C149)
        "stream_ann_index_readout": _stream_ann_index_readout,
        # r10 addition #2 (VERDICT r9 task 8): the curriculum loader
        # plan — C106's quality phases crossed with the exact-integer
        # source-mixture policy, the (phase, source) schedule a
        # curriculum trainer streams
        "curriculum_mixture_plan": chunking.curriculum_mixture_plan,
        # r10 addition #3: D38's streaming source-mixture maintenance
        # as a driver-checked surface (additive per-source counts
        # behind the exactly-once guard; mixture policy derived from
        # committed state == batch C28)
        "stream_mixture_readout": _stream_mixture_readout,
        # r10 addition #4: filtered vector search — the metadata
        # predicate pushed into IVF candidate generation (pre-filter;
        # survivors alone fetch vectors for exact scoring)
        "ann_filtered_topk": similarity.ann_filtered_topk,
        # r10 addition #5: greedy facility-location data selection —
        # submodular coverage coreset (e6-integer coverage folds,
        # k unrolled greedy rounds, oracle = the C33 pattern)
        "facility_location_selection": clustering.facility_location_selection,
        # r10 additions #6-7: the quality/pricing audits of #4-5 —
        # recall of the filtered tier vs exact filtered truth, and
        # the greedy's coverage lift vs the id-ordered prefix
        "filtered_ann_recall_at_k": similarity.filtered_ann_recall_at_k,
        "selection_coverage_audit": clustering.selection_coverage_audit,
        # r10 addition #8: k-core peel of the trade graph — the
        # fourth iterative-family member (bounded rounds, unrolled
        # oracle, convergence proven by test at every gate SF)
        "kcore_trade_graph": graph.kcore_trade_graph,
        # r10 addition #9: int8 scalar-quantization recall audit —
        # prices C24 the way pq_adc_recall prices PQ (BIGINT integer
        # dot vs 6dp double-dot truth, MIPS mode)
        "sq_int8_recall": V2.sq_int8_recall,
        # r10 addition #10: lead/lag cross-correlation between
        # event-type daily series (which signals LEAD which — the
        # companion B102's self-correlation can't give)
        "xcorr_daily_events": timeseries.xcorr_daily_events,
        # r10 addition #11: post-stratification weights for the eval
        # splits (survey-sampling correction over C49's hash split,
        # exact floor-ppm)
        "holdout_stratum_weights": scale.holdout_stratum_weights,
        # r10 addition #12: trailing-window exact percentiles of
        # daily volume (adaptive SLO baseline; integer-indexed
        # sorted arrays — percentile_approx is unusable under a
        # hash gate)
        "rolling_percentiles_daily": timeseries.rolling_percentiles_daily,
    }
    ordered = {k: reg[k] for k in _DRIVER_PRIORITY_R11 if k in reg}
    ordered.update({k: v for k, v in reg.items() if k not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    out = {
        "silver_issues": ORACLE_SILVER,
        "label_catalog": ORACLE_LABEL_CATALOG,
        "gold_kpi_component_tier": ORACLE_GOLD_COMPONENT,
        "gold_kpi_global": ORACLE_GOLD_GLOBAL,
        "gold_sla_stability": ORACLE_GOLD_SLA,
        "gold_sla_mom": ORACLE_GOLD_SLA_MOM,
        "gold_kpi_mom": f"""
WITH g AS ({ORACLE_GOLD_GLOBAL})
SELECT month, created_count,
  round(CASE WHEN lag(created_count) OVER w > 0
        THEN CAST(created_count - lag(created_count) OVER w AS DOUBLE)
             / CAST(lag(created_count) OVER w AS DOUBLE) END, 6) AS created_mom_pct,
  closed_count,
  round(CASE WHEN lag(closed_count) OVER w > 0
        THEN CAST(closed_count - lag(closed_count) OVER w AS DOUBLE)
             / CAST(lag(closed_count) OVER w AS DOUBLE) END, 6) AS closed_mom_pct,
  backlog_end,
  CAST(backlog_end - lag(backlog_end) OVER w AS BIGINT) AS backlog_delta
FROM g WINDOW w AS (ORDER BY month ASC)
""",
        "bronze_issues": """
WITH last_ship AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY 1
), b AS (
  SELECT o.o_orderkey AS issue_id,
    CASE WHEN o.o_orderstatus = 'F' THEN 'closed' ELSE 'open' END AS state,
    o.o_orderdate AS created_at,
    CASE WHEN o.o_orderstatus = 'F' THEN ls.last_ship END AS closed_at,
    list_filter([
      CASE WHEN o.o_orderpriority LIKE '1%' THEN 'Blocker'
           WHEN o.o_orderpriority LIKE '2%' THEN 'Regression' END,
      CASE WHEN o.o_orderkey % 2 = 0 THEN 'Bug'
           WHEN o.o_orderkey % 3 = 0 THEN 'Docs'
           WHEN o.o_orderkey % 5 = 0 THEN 'Enhancement'
           WHEN o.o_orderkey % 7 = 0 THEN 'Usage Question' END,
      CASE WHEN o.o_orderkey % 13 <> 0 THEN 'component: ' || c.c_mktsegment END,
      CASE WHEN o.o_orderkey % 17 = 0 THEN 'Performance' END,
      CASE WHEN o.o_orderkey % 11 = 0 THEN 'Needs Triage' END
    ], x -> x IS NOT NULL) AS labels
  FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  LEFT JOIN last_ship ls ON o.o_orderkey = ls.l_orderkey
)
SELECT issue_id, state,
  strftime(created_at, '%Y-%m-%d %H:%M:%S') AS created_ts,
  strftime(closed_at, '%Y-%m-%d %H:%M:%S') AS closed_ts,
  coalesce(array_to_string(labels, '|'), '') AS labels_str,
  len(labels) AS n_labels
FROM b
""",
        "silver_merge_dedup": """
WITH runs AS (
  SELECT event_id, event_type, value, 1 AS run_id FROM events
  UNION ALL
  SELECT event_id, event_type, value + 100, 2 FROM events WHERE event_id % 3 = 0
), r AS (
  SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY run_id DESC) AS rn
  FROM runs
)
SELECT event_id, event_type, round(value, 2) AS value, CAST(run_id AS BIGINT) AS run_id
FROM r WHERE rn = 1
""",
        "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS sum_base_price,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS sum_disc_price,
  round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(8,2)) + CAST(l_tax AS DECIMAL(8,2)))) AS DOUBLE), 2) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
""",
        "q3_shipping_priority": """
SELECT l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       o.o_orderpriority,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l.l_orderkey ASC
LIMIT 10
""",
        "q5_region_revenue": """
SELECT n.n_name AS nation,
       round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
""",
        "market_segment_share": """
SELECT c.c_mktsegment AS segment,
  count(*) AS order_count,
  round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_revenue,
  round(CAST(sum(CASE WHEN o.o_orderpriority LIKE '1%' THEN CAST(o.o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE), 2) AS urgent_revenue,
  round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*), 6) AS avg_order_value
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
        "topk_per_group": """
WITH ranked AS (
  SELECT o_orderpriority,
    row_number() OVER (PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank,
    o_orderkey, o_totalprice
  FROM orders
)
SELECT o_orderpriority, CAST(rank AS INT) AS rank, o_orderkey,
       round(o_totalprice, 6) AS o_totalprice
FROM ranked WHERE rank <= 3
""",
        "rollup_orders": """
SELECT o_orderstatus, o_orderpriority, count(*) AS order_count,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
        "cube_events": """
SELECT event_type, user_id % 10 AS user_bucket, count(*) AS event_count,
       round(sum(value), 2) AS total_value
FROM events GROUP BY CUBE (event_type, user_bucket)
""",
        "pivot_events": """
SELECT user_id,
  round(coalesce(sum(CASE WHEN event_type = 'click' THEN value END), 0), 6) AS click_value,
  round(coalesce(sum(CASE WHEN event_type = 'view' THEN value END), 0), 6) AS view_value,
  round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 6) AS purchase_value,
  round(coalesce(sum(CASE WHEN event_type = 'signup' THEN value END), 0), 6) AS signup_value,
  round(coalesce(sum(CASE WHEN event_type = 'error' THEN value END), 0), 6) AS error_value
FROM events GROUP BY 1
""",
        "asof_join_orders_events": """
SELECT o.o_orderkey,
  o.o_custkey % 20 AS user_id,
  e.event_id AS last_event_id,
  e.event_type AS last_event_type,
  round(e.value, 6) AS last_event_value
FROM orders o
ASOF LEFT JOIN events e
  ON o.o_custkey % 20 = e.user_id AND e.ts <= o.o_orderdate
""",
        "range_join_events": """
SELECT p.event_id AS purchase_event_id, p.user_id,
       count(e.ts) AS errors_after
FROM events p
LEFT JOIN events e
  ON e.user_id = p.user_id AND e.event_type = 'error'
 AND e.ts > p.ts AND e.ts <= p.ts + INTERVAL 300 SECONDS
WHERE p.event_type = 'purchase'
GROUP BY 1, 2
""",
        "sessionize_events": """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL THEN 1
         WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
         ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
  count(*) AS n_events,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
  round(sum(value), 6) AS session_value
FROM sess GROUP BY 1, 2
""",
        "concurrent_sessions": """
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL THEN 1
         WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
         ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess0 AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
), sess AS (
  SELECT user_id, session_seq, min(ts) AS session_start, max(ts) AS session_end
  FROM sess0 GROUP BY 1, 2
), deltas AS (
  SELECT session_start AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT session_end AS t, -1 AS delta FROM sess
), runs AS (
  SELECT t, delta,
    sum(delta) OVER (ORDER BY t ASC, delta DESC ROWS UNBOUNDED PRECEDING) AS run
  FROM deltas
)
SELECT strftime(CAST(t AS DATE), '%Y-%m-%d') AS day,
  CAST(max(run) AS BIGINT) AS peak_concurrency,
  CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS sessions_started
FROM runs GROUP BY 1
""",
        "activity_streaks": """
WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
islands AS (
  SELECT user_id, day,
    datediff('day', DATE '1970-01-01', day)
      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days
), streaks AS (
  SELECT user_id, grp, count(*) AS len, min(day) AS start, max(day) AS "end"
  FROM islands GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY len DESC, start ASC) AS rn
  FROM streaks
)
SELECT user_id, CAST(len AS BIGINT) AS longest_streak_days,
  strftime(start, '%Y-%m-%d') AS streak_start,
  strftime("end", '%Y-%m-%d') AS streak_end
FROM ranked WHERE rn = 1
""",
        # percentile_disc scoring, expressed through the exact
        # integer identity  x >= t_k  <=>  5*cum(x) >= k*N  (see
        # operators/relational6.py:customer_rfm) — every comparison
        # is BIGINT/DECIMAL, no interpolated thresholds anywhere.
        "customer_rfm": """
WITH per_cust AS (
  SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
    count(*) AS frequency,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS monetary
  FROM orders GROUP BY 1
), r AS (
  SELECT *, CAST(datediff('day', last_order,
      (SELECT max(last_order) FROM per_cust)) AS BIGINT) AS recency_days
  FROM per_cust
), c AS (
  SELECT *,
    count(*) OVER (ORDER BY recency_days RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_r,
    count(*) OVER (ORDER BY frequency RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_f,
    count(*) OVER (ORDER BY monetary RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_m,
    count(*) OVER () AS n
  FROM r
)
SELECT custkey, recency_days, CAST(frequency AS BIGINT) AS frequency,
  CAST(monetary * 100 AS BIGINT) AS monetary_cents,
  CAST(6 - (1 + least(4, (5 * cum_r) // n)) AS BIGINT) AS r_score,
  CAST(1 + least(4, (5 * cum_f) // n) AS BIGINT) AS f_score,
  CAST(1 + least(4, (5 * cum_m) // n) AS BIGINT) AS m_score
FROM c
""",
        # shares as BIGINT parts-per-million via the two-level
        # integer remainder split — no float quotient can flip a
        # round() boundary between engines.
        "order_seasonality": """
WITH per_month AS (
  SELECT month(o_orderdate) AS month_of_year, count(*) AS n_orders,
    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS revenue
  FROM orders GROUP BY 1
), t AS (
  SELECT *,
    sum(n_orders) OVER () AS tot_orders,
    CAST(sum(revenue) OVER () * 100 AS BIGINT) AS tot_cents,
    CAST(revenue * 100 AS BIGINT) AS cents
  FROM per_month
)
SELECT CAST(month_of_year AS BIGINT) AS month_of_year,
  CAST(n_orders AS BIGINT) AS n_orders, cents AS revenue_cents,
  CAST(((n_orders * 1000) // tot_orders) * 1000
       + (((n_orders * 1000) % tot_orders) * 1000) // tot_orders AS BIGINT) AS order_share_ppm,
  CAST(((cents * 1000) // tot_cents) * 1000
       + (((cents * 1000) % tot_cents) * 1000) // tot_cents AS BIGINT) AS revenue_share_ppm
FROM t
""",
        "contingency_orders": """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS observed
  FROM orders GROUP BY 1, 2
), tot AS (
  SELECT o_orderpriority, o_orderstatus, observed,
    sum(observed) OVER (PARTITION BY o_orderpriority) AS row_total,
    sum(observed) OVER (PARTITION BY o_orderstatus) AS col_total,
    sum(observed) OVER () AS grand_total
  FROM cells
)
SELECT o_orderpriority, o_orderstatus,
  CAST(observed AS BIGINT) AS observed,
  round(CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE)
        / CAST(grand_total AS DOUBLE), 6) AS expected,
  round((CAST(observed AS DOUBLE) - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(grand_total AS DOUBLE))
        * (CAST(observed AS DOUBLE) - CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(grand_total AS DOUBLE))
        / (CAST(row_total AS DOUBLE) * CAST(col_total AS DOUBLE) / CAST(grand_total AS DOUBLE)), 6) AS chi2_contribution
FROM tot
""",
        "filtered_agg_orders": """
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_large,
  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
       FILTER (WHERE o_orderstatus = 'F') * 100 AS BIGINT) AS finished_revenue_cents
FROM orders
GROUP BY o_orderpriority
""",
        "time_weighted_value": """
WITH terms AS (
  SELECT user_id,
    lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dur_us,
    CAST(round(value * 100) AS BIGINT)
      * (lead(epoch_us(ts)) OVER w - epoch_us(ts)) AS weighted
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_intervals,
  CAST(sum(dur_us) AS BIGINT) AS total_us,
  round(CAST(sum(weighted) AS DOUBLE) / CAST(sum(dur_us) AS DOUBLE) / 100.0, 6)
    AS time_weighted_value
FROM terms WHERE dur_us IS NOT NULL
GROUP BY 1
""",
        # value columns pinned to BIGINT e4 units BEFORE the melt so
        # the UNPIVOT common-type coercion has nothing to decide —
        # the r3 driver-hash failure was an engine-version decimal
        # rendering of the unpivoted value column.
        "unpivot_lineitem_metrics": """
WITH wide AS (
  SELECT l_returnflag, l_linestatus,
    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 10000 AS BIGINT) AS quantity,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 10000 AS BIGINT) AS extendedprice,
    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) * 10000 AS BIGINT) AS discounted,
    CAST(sum(CAST(l_tax AS DECIMAL(18,2))) * 10000 AS BIGINT) AS tax
  FROM lineitem GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus, metric, total_e4
FROM wide
UNPIVOT (total_e4 FOR metric IN (quantity, extendedprice, discounted, tax))
""",
        "variant_events": """
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
  CAST(sum(CASE WHEN json_valid(props) THEN 1 ELSE 0 END) AS BIGINT) AS n_valid_json,
  CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  round(avg(CAST(json_extract(props, '$.k') AS BIGINT)), 6) AS avg_k
FROM events GROUP BY 1
""",
        "session_window_batch": """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL THEN 1
         WHEN epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1
         ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sess AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                   ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
  count(*) AS n_events,
  round(sum(value), 6) AS session_value
FROM sess GROUP BY user_id, session_seq
""",
        "revenue_concentration": """
WITH o AS (SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
t AS (
  SELECT quantile_cont(CAST(p AS DOUBLE), 0.90) AS t90,
         quantile_cont(CAST(p AS DOUBLE), 0.95) AS t95,
         quantile_cont(CAST(p AS DOUBLE), 0.99) AS t99
  FROM o
)
SELECT CAST(count(*) AS BIGINT) AS n_orders,
  CAST(CAST(sum(p) AS DECIMAL(28,2)) * 100 AS BIGINT) AS total_revenue_cents,
  round(t.t90, 6) AS p90_threshold,
  round(t.t95, 6) AS p95_threshold,
  round(t.t99, 6) AS p99_threshold,
  round(CAST(sum(CASE WHEN CAST(p AS DOUBLE) >= t.t90 THEN p ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(sum(p) AS DOUBLE), 6) AS share_top10,
  round(CAST(sum(CASE WHEN CAST(p AS DOUBLE) >= t.t95 THEN p ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(sum(p) AS DOUBLE), 6) AS share_top5,
  round(CAST(sum(CASE WHEN CAST(p AS DOUBLE) >= t.t99 THEN p ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(sum(p) AS DOUBLE), 6) AS share_top1
FROM o, t GROUP BY t.t90, t.t95, t.t99
""",
        "event_path_match": """
WITH p AS (
  SELECT user_id, count(*) AS n_events,
    string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS path
  FROM events GROUP BY 1
)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
  md5(path) AS path_hash,
  regexp_matches(path, 'signup.*purchase') AS converted,
  regexp_matches(path, 'error>purchase') AS recovered_immediately,
  regexp_matches(path, '^view(>view)*$') AS browse_only
FROM p
""",
        "dq_violations": """
WITH o AS (
  SELECT count(*) AS n,
    sum(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0 THEN 1 ELSE 0 END) AS v_price,
    sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS v_date,
    count(*) - count(DISTINCT o_orderkey) AS v_uniq
  FROM orders
), li AS (
  SELECT count(*) AS n,
    sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS v_qty,
    sum(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS v_disc
  FROM lineitem
), d AS (
  SELECT count(*) AS n,
    sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS v_text
  FROM documents
), fkc AS (
  SELECT count(*) AS n,
    sum(CASE WHEN o2.o_custkey IS NOT NULL AND c.c_custkey IS NULL THEN 1 ELSE 0 END) AS v
  FROM orders o2 LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
    ON o2.o_custkey = c.c_custkey
), fko AS (
  SELECT count(*) AS n,
    sum(CASE WHEN l.l_orderkey IS NOT NULL AND ok.o_orderkey IS NULL THEN 1 ELSE 0 END) AS v
  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) ok
    ON l.l_orderkey = ok.o_orderkey
)
SELECT table_name, rule, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_violations AS BIGINT) AS n_violations, n_violations = 0 AS passed
FROM (
  SELECT 'orders' AS table_name, 'o_totalprice_positive' AS rule, n AS n_checked, v_price AS n_violations FROM o
  UNION ALL SELECT 'orders', 'o_orderdate_not_null', n, v_date FROM o
  UNION ALL SELECT 'orders', 'o_orderkey_unique', n, v_uniq FROM o
  UNION ALL SELECT 'lineitem', 'l_quantity_range_1_50', n, v_qty FROM li
  UNION ALL SELECT 'lineitem', 'l_discount_unit_interval', n, v_disc FROM li
  UNION ALL SELECT 'documents', 'text_nonempty', n, v_text FROM d
  UNION ALL SELECT 'orders', 'o_custkey_fk_customer', n, v FROM fkc
  UNION ALL SELECT 'lineitem', 'l_orderkey_fk_orders', n, v FROM fko
)
""",
        "trailing_window_user_value": """
SELECT event_id, user_id,
  CAST(count(*) OVER w AS BIGINT) AS n_trailing,
  round(sum(value) OVER w, 6) AS value_trailing
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
        "funnel_events": """
WITH per_user AS (
  SELECT user_id,
    min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
    min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
    min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY 1
)
SELECT user_id,
  CAST(t_signup IS NOT NULL AS INT) AS reached_signup,
  CAST(t_signup IS NOT NULL AND t_click IS NOT NULL AND t_click > t_signup AS INT) AS reached_click,
  CAST(t_signup IS NOT NULL AND t_click IS NOT NULL AND t_click > t_signup
       AND t_purchase IS NOT NULL AND t_purchase > t_click AS INT) AS reached_purchase
FROM per_user
""",
        "windowed_agg_events": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS event_count, round(sum(value), 6) AS total_value
FROM events GROUP BY 1, 2
""",
        "semi_anti_join": """
WITH w AS (
  SELECT c_nationkey, count(*) AS customers_with_orders FROM customer
  WHERE c_custkey IN (SELECT o_custkey FROM orders) GROUP BY 1
), wo AS (
  SELECT c_nationkey, count(*) AS customers_without_orders FROM customer
  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders) GROUP BY 1
)
SELECT coalesce(w.c_nationkey, wo.c_nationkey) AS nationkey,
  coalesce(customers_with_orders, 0) AS customers_with_orders,
  coalesce(customers_without_orders, 0) AS customers_without_orders
FROM w FULL OUTER JOIN wo ON w.c_nationkey = wo.c_nationkey
""",
        "json_extract_events": """
SELECT event_type, count(*) AS n,
  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
FROM events GROUP BY 1
""",

        "distinct_agg_orders": """
SELECT o_orderpriority, count(DISTINCT o_custkey) AS distinct_customers,
       count(*) AS order_count, round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY 1
""",
        "having_active_customers": """
SELECT o_custkey AS custkey, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_spend
FROM orders GROUP BY 1 HAVING count(*) > 12
""",
        "exists_urgent_customers": """
SELECT c_custkey AS custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority LIKE '1%')
  AND NOT EXISTS (SELECT 1 FROM events e
                  WHERE e.event_type = 'error' AND e.value > 90 AND e.user_id = c.c_custkey % 20)
""",
        "scalar_subquery_above_avg": """
SELECT o_orderkey, round(o_totalprice, 6) AS o_totalprice,
       round(ga, 6) AS global_avg
FROM orders, (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS ga FROM orders)
WHERE o_totalprice > ga * 1.5
""",
        "set_ops_customers": """
WITH buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
erring AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
SELECT user_id, 'both' AS cohort FROM buyers WHERE user_id IN (SELECT user_id FROM erring)
UNION ALL
SELECT user_id, 'buy_only' FROM buyers WHERE user_id NOT IN (SELECT user_id FROM erring)
UNION ALL
SELECT user_id, 'error_only' FROM erring WHERE user_id NOT IN (SELECT user_id FROM buyers)
""",
        "string_funcs_parts": """
SELECT p_partkey, upper(p_brand) AS brand_upper,
       substr(p_name, 1, 5) AS name_prefix,
       length(p_name) AS name_len,
       p_brand || '/' || p_type AS brand_type,
       length(p_name) - length(replace(p_name, 'a', '')) AS n_a
FROM part WHERE p_name LIKE '%a%'
""",
        "date_arith_orders": """
SELECT year(o.o_orderdate) AS yr, quarter(o.o_orderdate) AS qtr,
  count(*) AS n_lineitems,
  round(avg((epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 86400.0), 6) AS avg_ship_delay_days,
  round(max((epoch(l.l_shipdate) - epoch(o.o_orderdate)) / 86400.0), 6) AS max_ship_delay_days
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2
""",
        "count_distribution": """
WITH per_cust AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT n_orders, count(*) AS n_customers FROM per_cust GROUP BY 1
""",
        "nation_pair_volume": """
SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS revenue,
  count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
WHERE n1.n_name <> n2.n_name
GROUP BY 1, 2
""",
        "part_revenue_rank": """
WITH rev AS (
  SELECT p.p_brand, p.p_partkey,
         round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS revenue
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY p_brand
            ORDER BY revenue DESC, p_partkey ASC) AS rank
  FROM rev
)
SELECT p_brand, CAST(rank AS INT) AS rank, p_partkey, revenue
FROM ranked WHERE rank <= 5
""",
        "running_customer_totals": """
SELECT o_custkey AS custkey, o_orderkey,
  CAST(row_number() OVER w AS BIGINT) AS order_seq,
  round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 2) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
        "order_gap_days": """
SELECT o_custkey AS custkey, o_orderkey,
  date_diff('day',
            CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS DATE),
            CAST(o_orderdate AS DATE)) AS gap_days
FROM orders
""",
        "moving_avg_user_value": """
SELECT user_id, event_id,
  round(CAST(avg(CAST(value AS DECIMAL(12,2))) OVER (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS moving_avg_value
FROM events
""",
        "stats_summary_lineitem": """
SELECT l_returnflag, count(*) AS n,
  round(stddev_samp(l_quantity), 6) AS stddev_qty,
  round(var_samp(l_quantity), 4) AS var_qty,
  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
  round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
FROM lineitem GROUP BY 1
""",
        "grouping_sets_revenue": """
SELECT coalesce(CAST(year(o.o_orderdate) AS VARCHAR), 'ALL') AS yr,
       coalesce(c.c_mktsegment, 'ALL') AS segment,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
         AS total_revenue
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY GROUPING SETS ((year(o.o_orderdate), c.c_mktsegment),
                        (year(o.o_orderdate)), (c.c_mktsegment), ())
""",
        "daily_gapfill_events": """
WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
days AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                                            INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n,
         sum(CAST(value AS DECIMAL(12,2))) AS tv
  FROM events GROUP BY 1, 2
)
SELECT strftime(g.day, '%Y-%m-%d') AS day, g.event_type,
  coalesce(d.n, 0) AS n_events,
  round(coalesce(CAST(d.tv AS DOUBLE), 0.0), 2) AS total_value
FROM (SELECT day, event_type FROM days, types) g
LEFT JOIN daily d ON g.day = d.day AND g.event_type = d.event_type
""",
        "dedup_clusters": _clusters_oracle(),
        "props_map_stats": """
WITH kv AS (
  SELECT event_type, unnest(json_keys(props)) AS key, props FROM events
), kvv AS (
  SELECT event_type, key, json_extract_string(props, '$.' || key) AS val FROM kv
)
SELECT event_type, key, count(*) AS n,
  count(DISTINCT val) AS n_distinct_vals,
  round(avg(TRY_CAST(val AS DOUBLE)), 6) AS avg_numeric_val
FROM kvv GROUP BY 1, 2
""",
        "event_transitions": """
WITH pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
         event_type AS to_type
  FROM events
), f AS (SELECT * FROM pairs WHERE from_type IS NOT NULL),
c AS (SELECT from_type, to_type, count(*) AS n FROM f GROUP BY 1, 2)
SELECT from_type, to_type, n,
  round(n / sum(n) OVER (PARTITION BY from_type), 6) AS share
FROM c
""",
        "cohort_retention": """
WITH fs AS (
  SELECT user_id, min(date_trunc('week', ts)) AS cohort_week FROM events GROUP BY 1
), j AS (
  SELECT e.user_id, date_trunc('week', e.ts) AS wk, f.cohort_week
  FROM events e JOIN fs f ON e.user_id = f.user_id
)
SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
  CAST(floor((epoch(wk) - epoch(cohort_week)) / 604800) AS BIGINT) AS week_offset,
  count(DISTINCT user_id) AS active_users
FROM j GROUP BY 1, 2
""",
        "window_rank_suite": """
WITH s AS (SELECT * FROM orders WHERE o_orderkey % 50 = 0)
SELECT o_orderpriority, o_orderkey,
  CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rnk,
  CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS drnk,
  CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS quartile,
  round(percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC), 6) AS pct_rank,
  round(cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC), 6) AS cume,
  first_value(o_orderkey) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS top_orderkey
FROM s
""",
        "label_array_funcs": """
WITH b AS (
  SELECT o.o_orderkey AS issue_id,
    list_filter([
      CASE WHEN o.o_orderpriority LIKE '1%' THEN 'Blocker'
           WHEN o.o_orderpriority LIKE '2%' THEN 'Regression' END,
      CASE WHEN o.o_orderkey % 2 = 0 THEN 'Bug'
           WHEN o.o_orderkey % 3 = 0 THEN 'Docs'
           WHEN o.o_orderkey % 5 = 0 THEN 'Enhancement'
           WHEN o.o_orderkey % 7 = 0 THEN 'Usage Question' END,
      CASE WHEN o.o_orderkey % 13 <> 0 THEN 'component: ' || c.c_mktsegment END,
      CASE WHEN o.o_orderkey % 17 = 0 THEN 'Performance' END,
      CASE WHEN o.o_orderkey % 11 = 0 THEN 'Needs Triage' END
    ], x -> x IS NOT NULL) AS labels
  FROM orders o
  LEFT JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT issue_id,
  -- explicit empty-array semantics: '' (Spark array_join), never NULL
  -- (DuckDB array_to_string returns NULL on an empty list)
  coalesce(array_to_string(list_sort(labels), ','), '') AS sorted_labels,
  list_contains(labels, 'Bug') AS has_bug,
  CAST(coalesce(list_position(labels, 'Blocker'), 0) AS BIGINT) AS blocker_pos,
  CAST(len(list_distinct(labels)) AS BIGINT) AS n_distinct,
  coalesce(array_to_string(list_filter(labels, x -> starts_with(x, 'component')), '|'), '')
    AS component_labels
FROM b
""",
        "percentile_suite_lineitem": """
SELECT l_returnflag,
  round(quantile_cont(l_quantity, 0.25), 4) AS qty_p25,
  round(quantile_cont(l_quantity, 0.5), 4) AS qty_p50,
  round(quantile_cont(l_quantity, 0.75), 4) AS qty_p75,
  round(quantile_cont(l_quantity, 0.95), 4) AS qty_p95,
  round(quantile_cont(l_extendedprice, 0.5), 4) AS price_p50,
  round(quantile_cont(l_extendedprice, 0.95), 4) AS price_p95
FROM lineitem GROUP BY 1
""",
        "null_semantics_orders": """
WITH last_ship AS (
  SELECT l_orderkey, max(l_shipdate) AS last_ship FROM lineitem GROUP BY 1
), b AS (
  SELECT o.o_orderkey,
    CASE WHEN o.o_orderstatus = 'F' THEN 'closed' ELSE 'open' END AS state,
    o.o_orderdate AS created_at,
    CASE WHEN o.o_orderstatus = 'F' THEN ls.last_ship END AS closed_at
  FROM orders o
  LEFT JOIN last_ship ls ON o.o_orderkey = ls.l_orderkey
)
SELECT state,
  count(*) AS n_rows,
  count(closed_at) AS n_closed_non_null,
  -- CAST: un-cast DuckDB sum() is HUGEINT, which renders as float64 /
  -- decimal128 at the driver's fetch layer while Spark returns bigint
  CAST(sum(CASE WHEN closed_at IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_closed_null,
  count(nullif(state, 'open')) AS n_nullif_open,
  strftime(CAST(min(coalesce(closed_at, created_at)) AS DATE), '%Y-%m-%d') AS min_effective_date,
  CAST(sum(CASE WHEN closed_at IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_nullsafe_eq_null
FROM b GROUP BY 1
""",
        "embedding_centroids": """
WITH c AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT label, count(*) AS n,
  round(avg(sqrt(list_dot_product(v, v))), 6) AS avg_norm,
  round(avg(v[1]), 6) AS mean_d0,
  round(avg(v[2]), 6) AS mean_d1,
  round(avg(v[3]), 6) AS mean_d2,
  round(avg(v[4]), 6) AS mean_d3
FROM c GROUP BY 1
""",
        "tfidf_top_terms": _tfidf_oracle(),
        "sample_stratified": """
WITH h AS (
  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR) || ':' || source) AS h
  FROM documents
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC) AS rk
  FROM h
)
SELECT source, rk, doc_id, h FROM ranked WHERE rk <= 10
""",
        "training_corpus_filter": _corpus_filter_oracle(),
        "q17_small_quantity_revenue": """
WITH p AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#4'),
avg_q AS (
  SELECT l_partkey, avg(l_quantity) * 0.2 AS qty_threshold
  FROM lineitem JOIN p ON l_partkey = p_partkey
  GROUP BY 1
)
SELECT count(*) AS n_lineitems,
  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0, 2)
    AS avg_yearly_revenue
FROM lineitem l JOIN avg_q a
  ON l.l_partkey = a.l_partkey AND l.l_quantity < a.qty_threshold
""",
        "q18_large_volume_orders": """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300.0
)
SELECT c.c_name, c.c_custkey AS custkey, o.o_orderkey,
  strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
  round(o.o_totalprice, 2) AS o_totalprice,
  round(b.sum_qty, 2) AS sum_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
""",
        "q19_disjunctive_revenue": """
SELECT count(*) AS n_items,
  round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE), 2) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 5 AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
        "profile_orders": """
SELECT col_name, n, n_nulls, n_distinct, min_s, max_s FROM (
  -- every integer sum CAST to BIGINT (DuckDB sum() is HUGEINT, which
  -- the driver's fetch layer renders differently from Spark's bigint);
  -- doubles rendered via printf so no engine-native to-string remains
  SELECT 'o_orderkey' AS col_name, count(*) AS n,
    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
    count(DISTINCT o_orderkey) AS n_distinct,
    CAST(min(o_orderkey) AS VARCHAR) AS min_s, CAST(max(o_orderkey) AS VARCHAR) AS max_s
  FROM orders
  UNION ALL
  SELECT 'o_custkey', count(*),
    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
    count(DISTINCT o_custkey), CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus', count(*),
    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
    count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
  FROM orders
  UNION ALL
  SELECT 'o_totalprice', count(*),
    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
    count(DISTINCT o_totalprice), printf('%.2f', min(o_totalprice)), printf('%.2f', max(o_totalprice))
  FROM orders
  UNION ALL
  SELECT 'o_orderpriority', count(*),
    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
    count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority)
  FROM orders
)
""",
        "quantize_embeddings": """
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT vec_id, v,
    greatest(list_max(list_transform(v, x -> abs(x))), 1e-12) / 127.0 AS scale
  FROM c
), q AS (
  SELECT vec_id, scale,
    list_transform(v, x -> CAST(floor(x / scale + 0.5) AS BIGINT)) AS qv
  FROM s
)
SELECT vec_id, round(scale, 6) AS scale,
  CAST(list_sum(qv) AS BIGINT) AS q_sum,
  CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
  list_max(qv) AS q_max,
  list_min(qv) AS q_min
FROM q
""",
        "chunk_documents": _chunk_oracle(),
        "pack_sequences": _pack_oracle(),
        "pack_efficiency": _pack_efficiency_oracle(),
        "dedup_cluster_size_profile": _cluster_size_profile_oracle(),
        "quality_length_bias": _quality_length_bias_oracle(),
        "minhash_calibration": _minhash_calibration_oracle(),
        "decontaminate_ngram": _decontaminate_oracle(),
        "decontaminate_bloom": _decontaminate_bloom_oracle(),
        "contamination_attribution": _contamination_attribution_oracle(),
        "dsir_importance_weights": _dsir_oracle(),
        "unigram_perplexity": _perplexity_oracle(),
        "bigram_perplexity": _bigram_perplexity_oracle(),
        "snapshot_diff": """
WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice + 10.0, 2)
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 11 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000, o_totalprice FROM orders WHERE o_orderkey % 13 = 0
),
j AS (
  SELECT v1.o_orderkey AS k, v2.o_orderkey AS k2,
         v1.o_totalprice AS old_price, v2.o_totalprice AS new_price
  FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
)
SELECT coalesce(k, k2) AS o_orderkey,
  CASE WHEN k IS NULL THEN 'inserted'
       WHEN k2 IS NULL THEN 'deleted'
       WHEN old_price <> new_price THEN 'updated'
       ELSE 'unchanged' END AS change_type,
  round(old_price, 6) AS old_price,
  round(new_price, 6) AS new_price
FROM j
WHERE (CASE WHEN k IS NULL THEN 'inserted'
       WHEN k2 IS NULL THEN 'deleted'
       WHEN old_price <> new_price THEN 'updated'
       ELSE 'unchanged' END) <> 'unchanged'
""",
        "duplication_profile": f"""
WITH doc_h AS (
  SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h FROM documents
), docs AS (SELECT doc_id, {_norm_toks_sql()} AS toks FROM documents),
starts AS (
  SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks), 1), 16)) AS i
  FROM docs
), block_h AS (
  SELECT md5(array_to_string(toks[i:i+15], ' ')) AS h FROM starts
), dc AS (SELECT h, count(*) AS dup_count FROM doc_h GROUP BY 1),
bc AS (SELECT h, count(*) AS dup_count FROM block_h GROUP BY 1)
SELECT 'document' AS unit, CAST(dup_count AS BIGINT) AS dup_count,
  CAST(count(*) AS BIGINT) AS n_clusters,
  CAST(dup_count * count(*) AS BIGINT) AS n_units
FROM dc GROUP BY dup_count
UNION ALL
SELECT 'block', CAST(dup_count AS BIGINT), CAST(count(*) AS BIGINT),
  CAST(dup_count * count(*) AS BIGINT)
FROM bc GROUP BY dup_count
""",
        "dedup_exact": """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
       min(doc_id) AS keep_doc_id, count(*) AS dup_count
FROM documents GROUP BY 1
""",
        "dedup_keep_best": _keep_best_oracle(),
        "histogram_prices": """
SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
  count(*) AS n_orders,
  round(min(o_totalprice), 2) AS min_price,
  round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY 1
""",
        "dedup_minhash_lsh": _minhash_oracle(),
        "dedup_simhash": _simhash_oracle(),
        "dedup_ngram_jaccard": _ngram_jaccard_oracle(),
        "ann_lsh_topk": _ann_lsh_oracle(),
        "ann_ivf_topk": _ann_ivf_oracle(),
        "multimodal_meta": _multimodal_oracle(),
        "media_dedup_stats": _media_dedup_oracle(),
        "frame_sample": """
WITH m AS (
  SELECT doc_id AS media_id, text, md5(text) AS fh
  FROM documents WHERE doc_id % 3 = 2
), f AS (
  SELECT media_id, text, ('0x' || substr(fh, 5, 2))::BIGINT % 600 AS d10 FROM m
), idx AS (
  SELECT media_id, text, unnest(generate_series(0, CAST(d10 // 100 AS INT))) AS i FROM f
)
SELECT media_id, CAST(i AS INT) AS frame_idx,
       CAST(i * 10.0 AS DOUBLE) AS t_offset_s,
       md5(text || ':' || CAST(i AS VARCHAR)) AS frame_hash
FROM idx
""",
        "audio_features": """
WITH m AS (
  SELECT doc_id AS media_id, text, md5(text) AS fh
  FROM documents WHERE doc_id % 3 = 1
), f AS (
  SELECT media_id, text,
    ('0x' || substr(fh, 5, 2))::BIGINT % 600 AS d10,
    CASE ('0x' || substr(fh, 7, 2))::BIGINT % 4
      WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050 ELSE 44100 END AS rate
  FROM m
), idx AS (
  SELECT media_id, text, rate, d10,
    unnest(generate_series(0, CAST(d10 // 300 AS INT))) AS i
  FROM f
), wh AS (
  SELECT media_id, rate, d10, i, md5(text || ':w:' || CAST(i AS VARCHAR)) AS window_hash
  FROM idx
)
SELECT media_id, CAST(rate AS INT) AS sample_rate,
  round(d10 / 10.0, 1) AS duration_s,
  CAST(i AS INT) AS window_idx,
  CAST(i * 30.0 AS DOUBLE) AS t_start_s,
  window_hash,
  round(('0x' || substr(window_hash, 1, 8))::BIGINT / 4294967295.0, 6) AS rms_proxy
FROM wh
""",
        "neardup_embedding_cosine": """
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos_sim
FROM c a JOIN c b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.4
""",
        "ann_bruteforce_topk": _ann_bf_oracle(),
        "embedding_decontaminate": _emb_decontam_oracle(),
        "dedup_exact_substrings": _substring_dedup_oracle(),
        "token_dedup_savings": _token_savings_oracle(),
        "substring_phase_audit": _phase_audit_oracle(),
        "ann_recall_at_k": _ann_recall_oracle(),
        "ann_ivf_recall_at_k": _ann_ivf_recall_oracle(),
        "hard_negative_mining": _hard_negative_oracle(),
        "knn_label_purity": _knn_purity_oracle(),
        "pii_redact": _pii_redact_oracle(),
        "vocab_stats": _vocab_stats_oracle(),
        "repetition_filter": _repetition_filter_oracle(),
        "paragraph_dedup": _paragraph_dedup_oracle(),
        "kmeans_embeddings": _kmeans_oracle(),
        "cluster_mixing_weights": _cluster_mixing_oracle(),
        "semdedup": _semdedup_oracle(),
        "scd2_priority_history": _scd2_oracle(),
        "bpe_pair_counts": """
WITH words AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
), pairs AS (
  SELECT unnest(list_transform(range(1, length(w)), i -> substring(w, CAST(i AS INTEGER), 2))) AS pair
  FROM words WHERE length(w) >= 2
), counts AS (
  SELECT pair, count(*) AS pair_count FROM pairs GROUP BY pair
), top AS (
  SELECT pair, pair_count FROM counts ORDER BY pair_count DESC, pair LIMIT 50
)
SELECT CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS BIGINT) AS rank,
  pair, pair_count
FROM top
""",
        "cross_source_overlap": _cross_source_overlap_oracle(),
        "quality_classifier": _quality_classifier_oracle(),
        "ttr_stats": _ttr_oracle(),
        "gopher_quality_rules": _gopher_oracle(),
        "doc_entropy": _doc_entropy_oracle(),
        "zipf_slope": _zipf_oracle(),
        "term_source_association": _term_source_assoc_oracle(),
        "embedding_covariance": _embedding_cov_oracle(),
        "event_dedup_windowed": _event_dedup_oracle(),
        "kmv_distinct_terms": _kmv_oracle(),
        "cms_term_counts": _cms_oracle(),
        "hll_distinct_terms": _hll_oracle(),
        "hll_union_overlap": _hll_union_oracle(),
        "quantile_sketch_price": _quantile_sketch_oracle(),
        "dedup_aware_holdout": _dedup_aware_holdout_oracle(),
        "dedup_against_index": _dedup_against_index_oracle(),
        "neardup_against_index": _neardup_against_index_oracle(),
        "normalization_impact": _normalization_impact_oracle(),
        "curriculum_plan": _curriculum_oracle(),
        "span_corruption_plan": _span_corruption_oracle(),
        "holt_linear_daily": _holt_oracle(),
        "theil_sen_trend": _theil_sen_oracle(),
        "rendezvous_shard_plan": _rendezvous_oracle(),
        "benford_first_digit": _benford_oracle(),
        "gini_revenue": _gini_oracle(),
        "ks_promo_price": _ks_oracle(),
        "autocorr_daily": _autocorr_oracle(),
        "boilerplate_prefix_stats": _boilerplate_oracle(),
        "bloom_fpr_audit": _bloom_fpr_oracle(),
        "event_entropy_rate": _entropy_rate_oracle(),
        "markov_stationary_events": _markov_stationary_oracle(),
        "vocab_growth_curve": _vocab_growth_oracle(),
        "simpson_diversity_by_source": _simpson_oracle(),
        "contingency_dependence": _contingency_dependence_oracle(),
        "lorenz_deciles": _lorenz_oracle(),
        "fano_daily_dispersion": _fano_oracle(),
        "stopword_mass_by_source": _stopword_mass_oracle(),
        "theil_hoover_indices": _theil_hoover_oracle(),
        "referential_integrity_audit": _referential_integrity_oracle(),
        "k_anonymity_audit": _k_anonymity_oracle(),
        "forecast_backtest_holt": _forecast_backtest_oracle(),
        "source_vocab_overlap": _source_vocab_overlap_oracle(),
        "anova_price_by_returnflag": _anova_oracle(),
        "embedding_sim_histogram": _sim_histogram_oracle(),
        "minhash_band_tuning": _band_tuning_oracle(),
        "fulfillment_latency_percentiles": _fulfillment_latency_oracle(),
        "user_survival_curve": _survival_oracle(),
        "quality_temporal_drift": _quality_drift_oracle(),
        "pareto_frontier_parts": _pareto_frontier_oracle(),
        "market_concentration_hhi": _hhi_oracle(),
        "aov_mix_shift_bridge": _aov_bridge_oracle(),
        "ivf_nprobe_recall_curve": _ivf_curve_oracle(),
        "mmr_diverse_topk": _mmr_oracle(),
        "ann_ndcg_at_k": _ann_ndcg_oracle(),
        "mann_whitney_price": _mann_whitney_oracle(),
        "spearman_daily_trend": _spearman_oracle(),
        "classifier_calibration": _calibration_oracle(),
        "trimmed_winsorized_price": _trimmed_winsor_oracle(),
        "containment_pairs": _containment_oracle(),
        "epoch_shuffle_plan": _epoch_shuffle_oracle(),
        "markov_attribution": _markov_attr_oracle(),
        "bot_regularity_flags": _bot_regularity_oracle(),
        "rake_keyphrases": _rake_oracle(),
        "shapley_attribution": _shapley_oracle(),
        "incremental_mart_rebuild": _incremental_mart_oracle(),
        "functional_dependency_audit": _fd_audit_oracle(),
        "pq_codebook_stats": _pq_oracle(),
        "pq_adc_recall": _pq_adc_oracle(),
        "quality_rank_normalize": _rank_normalize_oracle(),
        "order_total_reconciliation": _order_reconciliation_oracle(),
        "idf_jaccard_pairs": _idf_jaccard_oracle(),
        "table_checksum_manifest": _checksum_manifest_oracle(),
        "embedding_dup_clusters": _embedding_clusters_oracle(),
        "embedding_dup_clusters_banded": _banded_clusters_oracle(),
        "banded_neardup_recall": _banded_recall_oracle(),
        "embedding_band_skew_audit": _emb_skew_oracle(),
        "term_burst_detection": _term_burst_oracle(),
        "jaccard_threshold_sweep": _jaccard_sweep_oracle(),
        "time_to_conversion": _time_to_conversion_oracle(),
        "token_budget_apportionment": _token_budget_oracle(),
        "pagerank_trade_graph": _pagerank_oracle(),
        "label_association_rules": _label_assoc_oracle(),
        "daily_anomaly_events": _daily_anomaly_oracle(),
        "mixture_resample": _mixture_resample_oracle(),
        "redact_contaminated_spans": _redact_spans_oracle(),
        "event_order_inversions": _event_inversions_oracle(),
        "weighted_median_price": _weighted_median_oracle(),
        "weighted_quantiles_price": _weighted_quantiles_oracle(),
        "length_bucketed_batches": _length_batches_oracle(),
        "source_interleave_plan": _interleave_oracle(),
        "yoy_revenue": _yoy_oracle(),
        "supplier_cosupply_triangles": _triangles_oracle(),
        "part_copurchase_lift": _copurchase_oracle(),
        "equi_depth_histogram": _equi_depth_oracle(),
        "table_stats_mart": _table_stats_oracle(),
        "attribution_touchpoints": _attribution_oracle(),
        "ewma_user_value": _ewma_oracle(),
        "term_cooccurrence_pmi": _cooccurrence_pmi_oracle(),
        "feature_hash_counts": _feature_hash_oracle(),
        "pca_top_component": _pca_oracle(),
        "bpe_merge_learning": _bpe_merges_oracle(),
        "bm25_topk": _bm25_oracle(),
        "rrf_hybrid_topk": _rrf_oracle(),
        "seasonal_decompose_daily": _seasonal_oracle(),
        "cusum_changepoint": _cusum_oracle(),
        "corr_matrix_lineitem": _corr_matrix_oracle(),
        "join_key_skew": _join_key_skew_oracle(),
        "bpe_tokenize_stats": _bpe_tokenize_oracle(),
        "ab_test_conversion": _ab_test_oracle(),
        "supplier_neighbor_jaccard": _neighbor_jaccard_oracle(),
        "pca_projection_outliers": _pca_projection_oracle(),
        "classifier_pr_curve": _pr_curve_oracle(),
        "detector_kappa": _kappa_oracle(),
        "lsh_recall_vs_exact": _lsh_recall_oracle(),
        "dau_wau_stickiness": _dau_wau_oracle(),
        "event_trigram_patterns": _trigram_oracle(),
        "join_size_estimate": _join_estimate_oracle(),
        "lang_id_confusion": _lang_confusion_oracle(),
        "user_churn_flags": _churn_oracle(),
        "user_growth_accounting": _growth_accounting_oracle(),
        "price_quantity_heatmap": _pq_heatmap_oracle(),
        "weekday_hour_heatmap": _wh_heatmap_oracle(),
        "length_outliers": _length_outliers_oracle(),
        "winnow_overlap_pairs": _winnow_overlap_oracle(),
        "cross_split_leakage": _cross_split_leakage_oracle(),
        "modality_qa_join": _modality_qa_oracle(),
        "char_class_stats": """
WITH per_doc AS (
  SELECT source, length(text) AS n_chars,
    length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_alpha,
    length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit,
    length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS n_space
  FROM documents
)
SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars,
  round(CAST(sum(n_alpha) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 6) AS alpha_share,
  round(CAST(sum(n_digit) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 6) AS digit_share,
  round(CAST(sum(n_space) AS DOUBLE) / CAST(sum(n_chars) AS DOUBLE), 6) AS space_share,
  round(CAST(sum(n_chars) - sum(n_alpha) - sum(n_digit) - sum(n_space) AS DOUBLE)
        / CAST(sum(n_chars) AS DOUBLE), 6) AS other_share
FROM per_doc GROUP BY 1
""",
        "kfold_assignment": """
SELECT doc_id, source,
  CAST(CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#fold')), 1, 15)) AS BIGINT)
       % 5 AS BIGINT) AS fold
FROM documents
""",
        "vocab_coverage": f"""
WITH counts AS (
  SELECT tok, count(*) AS cnt FROM (
    SELECT unnest({_norm_toks_sql()}) AS tok FROM documents
  ) GROUP BY 1
), tot AS (SELECT sum(cnt) AS total_mass FROM counts),
floors AS (SELECT unnest([1, 2, 5, 10, 50]) AS f)
SELECT CAST(f AS BIGINT) AS frequency_floor,
  CAST(sum(CASE WHEN cnt >= f THEN 1 ELSE 0 END) AS BIGINT) AS n_types,
  CAST(sum(CASE WHEN cnt >= f THEN cnt ELSE 0 END) AS BIGINT) AS mass,
  round(CAST(sum(CASE WHEN cnt >= f THEN cnt ELSE 0 END) AS DOUBLE)
        / CAST(min(tot.total_mass) AS DOUBLE), 6) AS mass_share
FROM counts CROSS JOIN floors CROSS JOIN tot
GROUP BY f
""",
        "source_drift_kl": _source_drift_oracle(),
        "tokenizer_fertility": f"""
WITH d AS (
  SELECT source,
    len({_norm_toks_sql()}) AS n_words,
    len(list_filter(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'),
                    x -> x <> '')) AS n_subwords
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_words) AS BIGINT) AS n_words,
  CAST(sum(n_subwords) AS BIGINT) AS n_subwords,
  round(CAST(sum(n_subwords) AS DOUBLE) / CAST(sum(n_words) AS DOUBLE), 6) AS fertility
FROM d GROUP BY 1
""",
        "weighted_sample": _weighted_sample_oracle(),
        "neardup_keep_best": _neardup_keep_best_oracle(),
        "detector_agreement": _detector_agreement_oracle(),
        "edit_distance_pairs": _edit_distance_oracle(),
        "embedding_norm_outliers": _norm_outliers_oracle(),
        "label_separability": _label_separability_oracle(),
        "plan_token_shards": f"""
WITH d AS (
  SELECT doc_id, len({_norm_toks_sql()}) AS n_tokens FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM d
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(before // 512 AS BIGINT) AS shard_id
FROM c
""",
        "token_histogram": """
WITH d AS (
  SELECT len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS n
  FROM documents
), b AS (
  SELECT n, CAST(floor(log2(CAST(n AS DOUBLE))) AS BIGINT) AS bucket
  FROM d WHERE n >= 1
)
SELECT bucket, CAST(2 ** bucket AS BIGINT) AS bucket_lo,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n) AS BIGINT) AS n_tokens,
  CAST(min(n) AS BIGINT) AS min_len,
  CAST(max(n) AS BIGINT) AS max_len
FROM b GROUP BY 1
""",
        "holdout_split": """
WITH b AS (
  SELECT doc_id, source,
    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#split')), 1, 15)) AS BIGINT)
      % 1000 AS bucket
  FROM documents
)
SELECT doc_id, source, CAST(bucket AS BIGINT) AS bucket,
  CASE WHEN bucket < 10 THEN 'test'
       WHEN bucket < 20 THEN 'val'
       ELSE 'train' END AS split
FROM b
""",
        "q6_forecast_revenue": """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE), 2)
  AS promo_forecast_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.039 AND l_discount <= 0.061
  AND l_quantity < 24
""",
        "source_mixing_weights": """
WITH per_source AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS DOUBLE) AS total, count(*) AS n_sources FROM per_source)
SELECT source, n_docs,
  round(n_docs / total, 6) AS share,
  round((total / n_sources) / n_docs, 6) AS weight,
  round(least(1.0, (total / n_sources) / n_docs), 6) AS sample_prob
FROM per_source, tot
""",
        "dedup_rate_mart": """
WITH d AS (
  SELECT source, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
  FROM documents
)
SELECT source, count(*) AS n_docs, count(DISTINCT h) AS n_unique,
  round(1.0 - count(DISTINCT h) / CAST(count(*) AS DOUBLE), 6) AS dup_rate
FROM d GROUP BY 1
""",
        "min_cost_supplier": """
WITH p AS (SELECT p_partkey FROM part WHERE p_size <= 15),
offer AS (
  SELECT l.l_partkey AS p_partkey, l.l_suppkey,
         round(avg(l.l_extendedprice), 6) AS avg_price
  FROM lineitem l JOIN p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
best AS (
  SELECT * FROM (
    SELECT *, min(avg_price) OVER (PARTITION BY p_partkey) AS min_price FROM offer
  ) WHERE avg_price = min_price
)
SELECT b.p_partkey, b.l_suppkey AS suppkey, s.s_name,
       round(b.avg_price, 6) AS avg_price, round(s.s_acctbal, 2) AS s_acctbal
FROM best b JOIN supplier s ON b.l_suppkey = s.s_suppkey
""",
        "important_parts_share": """
WITH per_part AS (
  SELECT l_partkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS part_rev
  FROM lineitem GROUP BY 1
),
tot AS (SELECT sum(part_rev) AS total_rev FROM per_part)
SELECT l_partkey, round(CAST(part_rev AS DOUBLE), 2) AS part_rev,
       round(CAST(part_rev / total_rev AS DOUBLE), 6) AS rev_share
FROM per_part, tot WHERE part_rev > total_rev * 0.0005
""",
        "top_supplier_revenue": """
WITH rev AS (
  SELECT l_suppkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= '1996-01-01' AND l_shipdate < '1996-04-01'
  GROUP BY 1
),
mx AS (SELECT max(total_rev) AS max_rev FROM rev)
SELECT r.l_suppkey AS suppkey, s.s_name, round(CAST(r.total_rev AS DOUBLE), 2) AS total_rev
FROM rev r, mx JOIN supplier s ON r.l_suppkey = s.s_suppkey
WHERE r.total_rev = mx.max_rev
""",
        "returns_blame_suppliers": """
WITH per_order AS (
  SELECT l_orderkey,
    count(DISTINCT l_suppkey) AS n_suppliers,
    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_suppliers
  FROM lineitem GROUP BY 1
),
blamed AS (
  SELECT DISTINCT l.l_orderkey, l.l_suppkey
  FROM lineitem l
  JOIN per_order o ON l.l_orderkey = o.l_orderkey
  WHERE l.l_returnflag = 'R' AND o.n_suppliers > 1 AND o.n_ret_suppliers = 1
)
SELECT b.l_suppkey AS suppkey, s.s_name, count(*) AS numwait
FROM blamed b JOIN supplier s ON b.l_suppkey = s.s_suppkey
GROUP BY 1, 2
""",
        "idle_rich_customers": """
WITH c AS (
  SELECT * FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
),
avg_bal AS (SELECT avg(c_acctbal) AS avg_bal FROM c WHERE c_acctbal > 0.0),
idle AS (
  SELECT c.* FROM c, avg_bal
  WHERE c.c_acctbal > avg_bal.avg_bal
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority LIKE '1%')
)
SELECT c_mktsegment, count(*) AS n_customers,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_bal
FROM idle GROUP BY 1
""",
        "order_priority_checking": """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
""",
        "national_market_share": """
WITH cust_region AS (
  SELECT c_custkey FROM customer c
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'ASIA'
),
supp_nation AS (
  SELECT s_suppkey, n_name AS supp_nation FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
),
j AS (
  SELECT year(o.o_orderdate) AS yr, sn.supp_nation,
    CAST(l.l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN cust_region cr ON o.o_custkey = cr.c_custkey
  JOIN supp_nation sn ON l.l_suppkey = sn.s_suppkey
)
SELECT yr, round(CAST(sum(rev) AS DOUBLE), 2) AS total_rev,
  round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN rev
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(sum(rev) AS DOUBLE), 6) AS mkt_share
FROM j GROUP BY 1
""",
        "product_profit": """
WITH supp_nation AS (
  SELECT s_suppkey, n_name AS nation FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
)
SELECT sn.nation, year(o.o_orderdate) AS yr,
  round(CAST(
    sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))))
    - sum(CAST(0.6 AS DECIMAL(3,2)) * CAST(p.p_retailprice AS DECIMAL(18,2))
          * CAST(l.l_quantity AS DECIMAL(18,2)))
  AS DOUBLE), 2) AS profit,
  count(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%widget%'
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supp_nation sn ON l.l_suppkey = sn.s_suppkey
GROUP BY 1, 2
""",
        "returned_items_top_customers": """
WITH per_cust AS (
  SELECT o.o_custkey,
    sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
        * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))) AS rev_exact
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= '1996-01-01' AND o.o_orderdate < '1996-07-01'
  GROUP BY 1
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rev_exact DESC, o_custkey ASC) AS rn
  FROM per_cust
)
SELECT r.o_custkey AS custkey, c.c_name, n.n_name AS nation,
       round(CAST(r.rev_exact AS DOUBLE), 2) AS returned_rev,
       CAST(r.rn AS INTEGER) AS rank
FROM ranked r
JOIN customer c ON r.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE r.rn <= 20
""",
        "late_shipment_priority": """
SELECT l.l_linestatus,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
    AS high_priority_count,
  CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
    AS low_priority_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
GROUP BY 1
""",
        "promo_revenue_share": """
WITH j AS (
  SELECT month(l.l_shipdate) AS mo, p.p_type,
    CAST(l.l_extendedprice AS DECIMAL(18,2))
      * (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2))) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE year(l.l_shipdate) = 1996
)
SELECT mo,
  round(100.0
    * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
    / CAST(sum(rev) AS DOUBLE), 6) AS promo_share_pct,
  round(CAST(sum(rev) AS DOUBLE), 2) AS total_rev
FROM j GROUP BY 1
""",
        "parts_supplier_count": """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p.p_brand, p.p_type, CAST(floor(p.p_size / 10) AS BIGINT) AS size_bucket,
       count(DISTINCT pr.l_suppkey) AS supplier_cnt
FROM pairs pr
JOIN part p ON pr.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND pr.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
""",
        "excess_supply_suppliers": """
WITH per_ps AS (
  SELECT l.l_partkey AS p_partkey, l.l_suppkey,
         sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_name LIKE 'small%'
  GROUP BY 1, 2
),
dominant AS (
  SELECT * FROM (
    SELECT *, sum(qty) OVER (PARTITION BY p_partkey) AS part_total,
              count(*) OVER (PARTITION BY p_partkey) AS n_supp
    FROM per_ps
  ) WHERE CAST(qty AS DOUBLE) > 2.0 * CAST(part_total AS DOUBLE) / n_supp
)
SELECT d.l_suppkey AS suppkey, s.s_name, count(*) AS n_parts,
       round(s.s_acctbal, 2) AS s_acctbal
FROM dominant d JOIN supplier s ON d.l_suppkey = s.s_suppkey
GROUP BY 1, 2, 4
""",
        "lang_id": _lang_id_oracle(),
        "quality_score": _quality_oracle(),
        "token_count": """
SELECT doc_id,
  len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS ws_tokens,
  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens,
  length(text) AS n_chars
FROM documents
""",
        "doc_fingerprint": _fingerprint_oracle(),
        "corpus_stats": """
WITH d AS (
  SELECT source,
    len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS n_tok,
    length(text) AS n_chars
  FROM documents
)
SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
       round(avg(n_tok), 6) AS avg_tokens, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM d GROUP BY 1
""",
    }
    out.update(
        {
            # r6 additions (registered BELOW the driver-priority
            # backlog — VERDICT r5 task 1)
            "mad_anomaly_events": _mad_anomaly_oracle(),
            "mad_anomaly_from_counts_daily": _mad_anomaly_daily_oracle(),
            "hits_hub_authority": _hits_oracle(),
            "shard_local_dedup_loss": _shard_dedup_loss_oracle(),
            "lsh_bucket_skew_audit": _lsh_skew_oracle(),
            "tail_head_overlap_pairs": _tail_head_oracle(),
            "memorization_risk_ngrams": _memorization_oracle(),
            "quality_decile_lift": _decile_lift_oracle(),
            "ann_mrr_at_k": _ann_mrr_oracle(),
            "event_freshness_mart": _freshness_oracle(),
            "ngram_kneser_ney_counts": _kn_counts_oracle(),
            "source_pair_dup_matrix": _source_pair_dup_oracle(),
            "stitch_against_index": _stitch_index_oracle(),
            "watermark_lateness_audit": _lateness_oracle(),
            "ab_srm_check": _srm_oracle(),
            "cluster_chaining_audit": _chaining_oracle(),
            "pii_rate_by_source": _pii_rate_oracle(),
            # r8 addition: the streaming readout drains the D12 mart
            # then runs B130's MAD algebra over it — drain == batch,
            # so the oracle IS B130's oracle verbatim
            "stream_daily_anomaly_readout": _mad_anomaly_oracle(),
            # drain == batch, so these reuse B132's and B128's
            # oracles verbatim too
            "stream_freshness_readout": _freshness_oracle(),
            "stream_reconciliation_readout": _order_reconciliation_oracle(),
            "stream_dedup_index_readout": _dedup_against_index_oracle(),
        }
    )
    # r9 addition: the keyed-state sessionization readout drains D2's
    # applyInPandasWithState fold then ranks/format-matches batch B11
    # — drain == batch, so the oracle IS B11's oracle verbatim
    out["stream_sessionize_readout"] = out["sessionize_events"]
    # ... and the native session_window drain closes the SAME
    # sessions by watermark instead of a gap-proving event, so both
    # readouts share B11's oracle — cross-implementation equality
    out["stream_session_window_readout"] = out["sessionize_events"]
    out["ann_ivf_pq_topk"] = _ivf_pq_oracle()
    # r10: the D37 streaming serving-index readout drains quantized
    # index rows then probes the committed state — drain == batch, so
    # the oracle IS C149's oracle verbatim
    out["stream_ann_index_readout"] = out["ann_ivf_pq_topk"]
    out["curriculum_mixture_plan"] = _curriculum_mixture_oracle()
    # r10: the D38 streaming mixture readout drains additive
    # per-source counts then applies C28's finalize over the
    # committed state — drain == batch, so the oracle IS C28's
    # oracle verbatim
    out["stream_mixture_readout"] = out["source_mixing_weights"]
    # r10: filtered vector search — C9's probing algebra with the
    # label predicate at candidate (metadata) grain
    out["ann_filtered_topk"] = _ann_filtered_oracle()
    # r10: greedy facility-location selection — k unrolled rounds,
    # integer coverage algebra (the C33 unrolled-iteration pattern)
    out["facility_location_selection"] = _facility_location_oracle()
    # r10: the quality/pricing audits of the two keys above —
    # filtered recall vs exact filtered truth, greedy coverage lift
    # vs the id-ordered baseline prefix
    out["filtered_ann_recall_at_k"] = _filtered_ann_recall_oracle()
    out["selection_coverage_audit"] = _selection_coverage_oracle()
    # r10: bounded-round k-core peel, unrolled
    out["kcore_trade_graph"] = _kcore_oracle()
    # r10: int8 SQ recall audit
    out["sq_int8_recall"] = _sq_recall_oracle()
    # r10: lead/lag cross-correlation (B102 template, two series)
    out["xcorr_daily_events"] = _xcorr_oracle()
    # r10: post-stratification weights over the C49 split
    out["holdout_stratum_weights"] = _holdout_stratum_oracle()
    # r10: trailing-window exact percentiles
    out["rolling_percentiles_daily"] = _rolling_pct_oracle()
    return out


def _ann_bf_oracle(n_queries: int = 8, k: int = 5) -> str:
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS q_vec FROM c WHERE vec_id < {n_queries}),
scored AS (
  SELECT q_id, vec_id,
    round(list_dot_product(q_vec, v) /
          (sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
  FROM q, c WHERE vec_id <> q_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, cos_sim
FROM ranked WHERE rank <= {k}
"""


def _knn_purity_oracle(n_queries: int = 8, k: int = 5) -> str:
    return f"""
WITH bf AS ({_ann_bf_oracle(n_queries, k)}),
lab AS (SELECT vec_id, label FROM embeddings)
SELECT bf.q_id, ql.label AS q_label,
  CAST(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS BIGINT) AS n_same_label,
  round(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) / {float(k)}, 6) AS purity
FROM bf
JOIN lab ql ON bf.q_id = ql.vec_id
JOIN lab nl ON bf.neighbor_id = nl.vec_id
GROUP BY 1, 2
"""


def _hard_negative_oracle(n_queries: int = 8, k: int = 5) -> str:
    return f"""
WITH c AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT vec_id AS q_id, label AS q_label, v AS q_vec FROM c WHERE vec_id < {n_queries}),
scored AS (
  SELECT q_id, q_label, vec_id, label,
    round(list_dot_product(q_vec, v) /
          (sqrt(list_dot_product(q_vec, q_vec)) * sqrt(list_dot_product(v, v))), 6) AS cos_sim
  FROM q, c WHERE vec_id <> q_id AND label <> q_label
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, q_label, CAST(rank AS INT) AS rank, vec_id AS negative_id,
  label AS negative_label, cos_sim
FROM ranked WHERE rank <= {k}
"""


def _ann_ivf_recall_oracle(n_queries: int = 8, k: int = 5) -> str:
    """IVF recall twin: brute-force and IVF oracles as subqueries."""
    return f"""
WITH bf AS ({_ann_bf_oracle(n_queries, k)}),
ivf AS ({_ann_ivf_oracle(n_queries, k)})
SELECT bf.q_id,
  CAST(count(ivf.neighbor_id) AS BIGINT) AS n_hits,
  round(count(ivf.neighbor_id) / {float(k)}, 6) AS recall
FROM bf LEFT JOIN ivf
  ON bf.q_id = ivf.q_id AND bf.neighbor_id = ivf.neighbor_id
GROUP BY 1
"""


def _ann_recall_oracle(n_queries: int = 8, k: int = 5) -> str:
    """recall@k twin: the brute-force and LSH oracles run as
    subqueries; recall = |truth ∩ approx| / k per query."""
    return f"""
WITH bf AS ({_ann_bf_oracle(n_queries, k)}),
lsh AS ({_ann_lsh_oracle(n_queries, k)})
SELECT bf.q_id,
  CAST(count(lsh.neighbor_id) AS BIGINT) AS n_hits,
  round(count(lsh.neighbor_id) / {float(k)}, 6) AS recall
FROM bf LEFT JOIN lsh
  ON bf.q_id = lsh.q_id AND bf.neighbor_id = lsh.neighbor_id
GROUP BY 1
"""


def _pii_redact_oracle() -> str:
    from .operators.text2 import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
WITH withpii AS (
  SELECT doc_id,
    text ||
    CASE WHEN doc_id % 3 = 0
         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END ||
    CASE WHEN doc_id % 7 = 0
         THEN ' host 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END AS text
  FROM documents
)
SELECT doc_id,
  CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
  CAST(len(regexp_extract_all(text, '{PHONE_RE}')) AS BIGINT) AS n_phones,
  CAST(len(regexp_extract_all(text, '{IPV4_RE}')) AS BIGINT) AS n_ips,
  md5(regexp_replace(regexp_replace(regexp_replace(text,
      '{EMAIL_RE}', '<EMAIL>', 'g'),
      '{PHONE_RE}', '<PHONE>', 'g'),
      '{IPV4_RE}', '<IP>', 'g')) AS redacted_hash
FROM withpii
"""


def _vocab_stats_oracle(top_k: int = 20) -> str:
    return f"""
WITH d AS (SELECT doc_id, {_norm_toks_sql()} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS token FROM d),
counts AS (
  SELECT token, count(*) AS n_occurrences, count(DISTINCT doc_id) AS doc_freq
  FROM tok GROUP BY 1
), ranked AS (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, token ASC) AS rank
  FROM counts
)
SELECT CAST(rank AS BIGINT) AS rank, token, n_occurrences, doc_freq
FROM ranked WHERE rank <= {top_k}
"""


def _tfidf_oracle(k: int = 3) -> str:
    return f"""
WITH d AS (SELECT source, {_norm_toks_sql()} AS toks FROM documents),
tok AS (SELECT source, unnest(toks) AS token FROM d),
tf AS (SELECT source, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
ns AS (SELECT count(DISTINCT source) AS n FROM d),
scored AS (
  SELECT tf.source, tf.token, round(tf.tf * ln(ns.n / dfq.df), 6) AS tfidf
  FROM tf JOIN dfq ON tf.token = dfq.token CROSS JOIN ns
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
            ORDER BY tfidf DESC, token ASC) AS rank
  FROM scored
)
SELECT source, CAST(rank AS INT) AS rank, token, tfidf
FROM ranked WHERE rank <= {k}
"""


def _norm_toks_sql() -> str:
    return "string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')"


def _gopher_oracle(
    min_words: int = 10,
    max_words: int = 10_000,
    min_mwl: float = 3.0,
    max_mwl: float = 10.0,
    max_sym: float = 0.1,
    min_stop: float = 0.02,
) -> str:
    return f"""
WITH base AS (
  SELECT doc_id, source, text, {_norm_toks_sql()} AS toks FROM documents
), feat AS (
  SELECT doc_id, source,
    len(toks) AS n_words,
    list_sum(list_transform(toks, t -> length(t))) / greatest(len(toks), 1) AS mean_wl,
    length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g'))
      / greatest(length(text), 1) AS sym_ratio,
    len(list_intersect(list_distinct(toks),
        ['the','a','of','to','and','in','is'])) / 7.0 AS stop_frac
  FROM base
)
SELECT doc_id, source, CAST(n_words AS BIGINT) AS n_words,
  round(mean_wl, 6) AS mean_word_len,
  round(sym_ratio, 6) AS symbol_ratio,
  round(stop_frac, 6) AS stopword_presence,
  n_words BETWEEN {min_words} AND {max_words} AS pass_word_count,
  mean_wl BETWEEN {min_mwl} AND {max_mwl} AS pass_word_length,
  sym_ratio <= {max_sym} AS pass_symbol_ratio,
  stop_frac >= {min_stop} AS pass_stopwords,
  (n_words BETWEEN {min_words} AND {max_words})
    AND (mean_wl BETWEEN {min_mwl} AND {max_mwl})
    AND sym_ratio <= {max_sym} AND stop_frac >= {min_stop} AS keep
FROM feat
"""


def _doc_entropy_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, source, unnest({_norm_toks_sql()}) AS term FROM documents
), tf AS (
  SELECT doc_id, source, term, count(*) AS tf FROM toks GROUP BY 1, 2, 3
), per AS (
  SELECT doc_id, source, sum(tf) AS n_tokens,
    sum(tf * log2(tf)) AS sum_flogf, count(*) AS n_distinct
  FROM tf GROUP BY 1, 2
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_distinct AS BIGINT) AS n_distinct,
  round(log2(n_tokens) - sum_flogf / n_tokens, 6) AS entropy_bits,
  round((log2(n_tokens) - sum_flogf / n_tokens)
        / log2(greatest(n_distinct, 2)), 6) AS entropy_norm
FROM per
"""


def _zipf_oracle() -> str:
    return f"""
WITH tf AS (
  SELECT source, term, count(*) AS freq FROM (
    SELECT source, unnest({_norm_toks_sql()}) AS term FROM documents
  ) GROUP BY 1, 2
), ranked AS (
  SELECT source, log2(CAST(row_number() OVER
      (PARTITION BY source ORDER BY freq DESC, term ASC) AS DOUBLE)) AS x,
    log2(CAST(freq AS DOUBLE)) AS y
  FROM tf
), agg AS (
  SELECT source, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
    sum(x*y) AS sxy, sum(x*x) AS sxx
  FROM ranked GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_terms,
  round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS zipf_slope,
  round((sy - (n*sxy - sx*sy) / (n*sxx - sx*sx) * sx) / n, 6) AS zipf_intercept
FROM agg ORDER BY source
"""


def _term_source_assoc_oracle(top_k: int = 3, min_df: int = 5) -> str:
    return f"""
WITH dt AS (
  SELECT DISTINCT doc_id, source, term FROM (
    SELECT doc_id, source, unnest(list_distinct({_norm_toks_sql()})) AS term
    FROM documents
  )
), st AS (
  SELECT source, term, count(*) AS df_st FROM dt GROUP BY 1, 2
), t AS (
  SELECT term, count(*) AS df_t FROM dt GROUP BY 1
), s AS (
  SELECT source, count(*) AS n_docs_s FROM documents GROUP BY 1
), nd AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT st.source, st.term, df_st, df_t,
    round(log2((CAST(df_st AS DOUBLE) / n_docs_s)
               / (CAST(df_t AS DOUBLE) / n_docs)), 6) AS pmi
  FROM st JOIN t USING (term) JOIN s USING (source) CROSS JOIN nd
  WHERE df_t >= {min_df}
), rk AS (
  SELECT *, row_number() OVER
    (PARTITION BY source ORDER BY pmi DESC, term ASC) AS rk
  FROM scored
)
SELECT source, CAST(rk AS INT) AS rank, term,
  CAST(df_st AS BIGINT) AS df_in_source, CAST(df_t AS BIGINT) AS df_total, pmi
FROM rk WHERE rk <= {top_k}
"""


def _embedding_cov_oracle(dim: int = 8) -> str:
    moments = ",\n    ".join(
        f"avg(CAST(embedding[{i+1}] AS DOUBLE) * CAST(embedding[{j+1}] AS DOUBLE)) AS p{i}_{j}"
        for i in range(dim)
        for j in range(i, dim)
    )
    means = ",\n    ".join(
        f"avg(CAST(embedding[{i+1}] AS DOUBLE)) AS m{i}" for i in range(dim)
    )
    rows = "\n  UNION ALL ".join(
        f"SELECT {i} AS dim_i, {j} AS dim_j, round(p{i}_{j} - m{i} * m{j}, 6) AS cov FROM mom"
        for i in range(dim)
        for j in range(i, dim)
    )
    return f"""
WITH mom AS (
  SELECT {means},
    {moments}
  FROM embeddings
)
{rows}
"""


def _kmv_oracle(k: int = 64) -> str:
    span = float(1 << 60)
    return f"""
WITH terms AS (
  SELECT DISTINCT source, term FROM (
    SELECT source, unnest({_norm_toks_sql()}) AS term FROM documents
  )
), hashed AS (
  SELECT source, term,
    CAST(concat('0x', substr(md5(term || '#kmv'), 1, 15)) AS BIGINT) / {span} AS h
  FROM terms
), ranked AS (
  SELECT source, term, h,
    row_number() OVER (PARTITION BY source ORDER BY h ASC, term ASC) AS rk
  FROM hashed
), per AS (
  SELECT source, count(*) AS n_exact,
    max(CASE WHEN rk = {k} THEN h END) AS u_k
  FROM ranked GROUP BY 1
), est AS (
  SELECT source, n_exact,
    CASE WHEN u_k IS NOT NULL THEN floor({k - 1}.0 / u_k) ELSE n_exact END AS e
  FROM per
)
SELECT source, CAST(n_exact AS BIGINT) AS n_exact,
  CAST(e AS BIGINT) AS n_estimated,
  round(abs(e - n_exact) / n_exact, 6) AS rel_error
FROM est ORDER BY source
"""


def _cms_oracle(width: int = 256, depth: int = 3, top_n: int = 10) -> str:
    rows_values = ", ".join(f"({r})" for r in range(depth))
    b_expr = (
        "CAST(concat('0x', substr(md5(term || '#cms' || CAST(r.row AS VARCHAR)), 1, 15)) "
        f"AS BIGINT) % {width}"
    )
    return f"""
WITH toks AS (
  SELECT unnest({_norm_toks_sql()}) AS term FROM documents
), cells AS (
  SELECT row, b, count(*) AS cell_count FROM (
    SELECT r.row AS row, {b_expr} AS b
    FROM toks CROSS JOIN (VALUES {rows_values}) r(row)
  ) GROUP BY 1, 2
), exact AS (
  SELECT term, count(*) AS n_exact FROM toks GROUP BY 1
), topn AS (
  SELECT term, n_exact,
    row_number() OVER (ORDER BY n_exact DESC, term ASC) AS rank
  FROM exact QUALIFY rank <= {top_n}
), probes AS (
  SELECT term, n_exact, rank, r.row AS row, {b_expr} AS b
  FROM topn CROSS JOIN (VALUES {rows_values}) r(row)
)
SELECT rank AS rank, probes.term AS term,
  CAST(probes.n_exact AS BIGINT) AS n_exact,
  CAST(min(cell_count) AS BIGINT) AS n_cms,
  CAST(min(cell_count) - probes.n_exact AS BIGINT) AS overcount
FROM probes JOIN cells USING (row, b)
GROUP BY probes.rank, probes.term, probes.n_exact ORDER BY rank
"""


def _length_batches_oracle(band_width: int = 32, batch_size: int = 8) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, len({_norm_toks_sql()}) AS n_tokens FROM documents
), banded AS (
  SELECT doc_id, n_tokens, n_tokens // {band_width} AS band FROM d
), batched AS (
  SELECT band, n_tokens,
    (row_number() OVER (PARTITION BY band ORDER BY doc_id) - 1) // {batch_size}
      AS batch_in_band
  FROM banded
)
SELECT CAST(band AS BIGINT) AS band,
  CAST(batch_in_band AS BIGINT) AS batch_in_band,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(max(n_tokens) AS BIGINT) AS max_tokens,
  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
  CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS padding_waste
FROM batched GROUP BY 1, 2
"""


def _interleave_oracle() -> str:
    return """
WITH counts AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
ranked AS (
  SELECT doc_id, source,
    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS src_rank
  FROM documents
)
SELECT doc_id, ranked.source, CAST(src_rank AS BIGINT) AS src_rank,
  round((src_rank - 0.5) / n_src, 6) AS interleave_key
FROM ranked JOIN counts ON ranked.source = counts.source
"""


def _yoy_oracle() -> str:
    return """
WITH monthly AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS month,
    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
  FROM orders GROUP BY 1
)
SELECT month,
  CAST(CAST(revenue AS DECIMAL(28,2)) * 100 AS BIGINT) AS revenue_cents,
  CAST(CAST(lag(revenue, 12) OVER w AS DECIMAL(28,2)) * 100 AS BIGINT) AS revenue_prev_year_cents,
  CASE WHEN lag(revenue, 12) OVER w IS NOT NULL AND lag(revenue, 12) OVER w <> 0
       THEN round((CAST(revenue AS DOUBLE) - CAST(lag(revenue, 12) OVER w AS DOUBLE))
                  / CAST(lag(revenue, 12) OVER w AS DOUBLE), 6) END AS yoy_pct
FROM monthly WINDOW w AS (ORDER BY month)
"""


def _weighted_median_oracle() -> str:
    # full-sort reference implementation (DuckDB affords the per-group
    # sort at oracle SF); same decimal weights, same division-free
    # half-point comparison as the bucketed two-pass Spark plan
    return """
WITH pp AS (
  SELECT l_returnflag AS grp, l_extendedprice AS price,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS w
  FROM lineitem GROUP BY 1, 2
), t AS (
  SELECT grp, sum(w) AS total FROM pp GROUP BY 1
), c AS (
  SELECT grp, price,
    sum(w) OVER (PARTITION BY grp ORDER BY price
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM pp
)
SELECT c.grp,
  CAST(CAST(min(price) AS DECIMAL(18,2)) * 100 AS BIGINT) AS weighted_median_cents,
  CAST(CAST(t.total AS DECIMAL(28,2)) * 100 AS BIGINT) AS total_weight_e2
FROM c JOIN t ON c.grp = t.grp
WHERE cum * 2 >= total
GROUP BY c.grp, t.total
"""


def _weighted_quantiles_oracle(q_pcts: tuple = (25, 50, 75, 90)) -> str:
    qlist = ", ".join(str(int(q)) for q in q_pcts)
    return f"""
WITH pp AS (
  SELECT l_returnflag AS grp, l_extendedprice AS price,
    sum(CAST(l_quantity AS DECIMAL(18,2))) AS w
  FROM lineitem GROUP BY 1, 2
), t AS (
  SELECT grp, sum(w) AS total FROM pp GROUP BY 1
), c AS (
  SELECT grp, price,
    sum(w) OVER (PARTITION BY grp ORDER BY price
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM pp
), ql AS (SELECT unnest([{qlist}]) AS q_pct)
SELECT c.grp, CAST(q_pct AS INT) AS q_pct,
  CAST(CAST(min(price) AS DECIMAL(18,2)) * 100 AS BIGINT) AS quantile_value_cents,
  CAST(CAST(t.total AS DECIMAL(28,2)) * 100 AS BIGINT) AS total_weight_e2
FROM c CROSS JOIN ql JOIN t ON c.grp = t.grp
WHERE cum * 100 >= q_pct * total
GROUP BY c.grp, q_pct, t.total
"""


def _event_inversions_oracle() -> str:
    return """
WITH flagged AS (
  SELECT user_id,
    CASE WHEN epoch_us(lag(ts) OVER w) - epoch_us(ts) > 0 THEN 1 ELSE 0 END AS inv,
    CASE WHEN epoch_us(lag(ts) OVER w) - epoch_us(ts) > 0
         THEN epoch_us(lag(ts) OVER w) - epoch_us(ts) END AS back_us
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(inv) AS BIGINT) AS n_inversions,
  round(sum(inv) / count(*), 6) AS inversion_rate,
  round(max(back_us) / 1e6, 6) AS max_disorder_s
FROM flagged GROUP BY 1
"""


def _mixture_resample_oracle() -> str:
    return """
WITH per AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
tot AS (SELECT sum(n_docs) AS total, count(*) AS ns FROM per),
wts AS (
  SELECT source,
    round(least(1.0, (CAST(total AS DOUBLE) / ns) / n_docs), 6) AS sample_prob
  FROM per CROSS JOIN tot
), verdict AS (
  SELECT doc_id, d.source,
    CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 15))
         AS BIGINT) % 1000000 AS u_micro,
    CAST(round(sample_prob * 1000000) AS BIGINT) AS p_micro
  FROM documents d JOIN wts USING (source)
)
SELECT doc_id, source, CAST(u_micro AS BIGINT) AS u_micro, p_micro,
  u_micro < p_micro AS keep
FROM verdict
"""


def _redact_spans_oracle(n: int = 3, benchmark_mod: int = 100) -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, source, {_norm_toks_sql()} AS toks FROM documents
), bench AS (
  SELECT DISTINCT array_to_string(toks[i:i+{n - 1}], ' ') AS gram
  FROM (
    SELECT toks, unnest(generate_series(1, greatest(len(toks) - {n - 1}, 1))) AS i
    FROM docs WHERE doc_id % {benchmark_mod} = 0
  )
), train AS (
  SELECT * FROM docs WHERE doc_id % {benchmark_mod} <> 0
), starts AS (
  SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - {n - 1}, 1))) AS i
  FROM train
), bad AS (
  SELECT s.doc_id, s.i FROM starts s
  JOIN bench b ON array_to_string(s.toks[s.i:s.i+{n - 1}], ' ') = b.gram
), toks_pos AS (
  SELECT doc_id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS p FROM train
), kept AS (
  SELECT tp.doc_id, tp.tok, tp.p FROM toks_pos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM bad
    WHERE bad.doc_id = tp.doc_id AND tp.p BETWEEN bad.i AND bad.i + {n - 1}
  )
)
SELECT t.doc_id, t.source, CAST(len(t.toks) AS BIGINT) AS n_tokens,
  CAST(len(t.toks) - count(k.p) AS BIGINT) AS n_removed,
  coalesce(string_agg(k.tok, ' ' ORDER BY k.p), '') AS clean_text
FROM train t LEFT JOIN kept k ON t.doc_id = k.doc_id
GROUP BY t.doc_id, t.source, len(t.toks)
"""


_LABELS_CTE = """
lbl AS (
  SELECT o.o_orderkey AS issue_id,
    list_filter([
      CASE WHEN o.o_orderpriority LIKE '1%' THEN 'Blocker'
           WHEN o.o_orderpriority LIKE '2%' THEN 'Regression' END,
      CASE WHEN o.o_orderkey % 2 = 0 THEN 'Bug'
           WHEN o.o_orderkey % 3 = 0 THEN 'Docs'
           WHEN o.o_orderkey % 5 = 0 THEN 'Enhancement'
           WHEN o.o_orderkey % 7 = 0 THEN 'Usage Question' END,
      CASE WHEN o.o_orderkey % 13 <> 0 THEN 'component: ' || c.c_mktsegment END,
      CASE WHEN o.o_orderkey % 17 = 0 THEN 'Performance' END,
      CASE WHEN o.o_orderkey % 11 = 0 THEN 'Needs Triage' END
    ], x -> x IS NOT NULL) AS labels
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
)"""


def _label_assoc_oracle(min_pair_count: int = 20) -> str:
    return f"""
WITH {_LABELS_CTE},
nn AS (SELECT count(*) AS n FROM lbl),
il AS (
  SELECT issue_id, unnest(list_distinct(labels)) AS label FROM lbl
),
supp AS (SELECT label, count(*) AS n_label FROM il GROUP BY 1),
pair AS (
  SELECT a.label AS label_a, b.label AS label_b, count(*) AS n_both
  FROM il a JOIN il b ON a.issue_id = b.issue_id AND a.label <> b.label
  GROUP BY 1, 2 HAVING count(*) >= {min_pair_count}
)
SELECT label_a, label_b, CAST(n_both AS BIGINT) AS n_both,
  CAST({_ppm_sql('n_both', '(SELECT n FROM nn)')} AS BIGINT) AS support_ppm,
  CAST({_ppm_sql('n_both', 'sa.n_label')} AS BIGINT) AS confidence_ppm,
  CAST({_ppm_sql('(n_both * (SELECT n FROM nn))', '(sa.n_label * sb.n_label)')} AS BIGINT) AS lift_e6
FROM pair
JOIN supp sa ON pair.label_a = sa.label
JOIN supp sb ON pair.label_b = sb.label
"""


def _daily_anomaly_oracle(trailing_days: int = 7, z: float = 2.0) -> str:
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2
), win AS (
  SELECT event_type, day, n_events,
    avg(n_events) OVER w AS mu,
    stddev_samp(n_events) OVER w AS sd,
    count(n_events) OVER w AS nt
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN {trailing_days} PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
  CASE WHEN nt >= 2 THEN round(mu, 6) END AS trailing_avg,
  CASE WHEN nt >= 2 AND sd > 0 THEN round((n_events - mu) / sd, 6) END AS z_score,
  CASE WHEN nt >= 2 AND sd > 0 THEN abs((n_events - mu) / sd) > {z}
       ELSE FALSE END AS is_anomaly
FROM win
"""


def _pagerank_oracle(n_iter: int = 3, d: float = 0.85) -> str:
    sql = f"""
WITH trade AS (
  SELECT o_custkey AS ck, l_suppkey AS sk, count(*) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2
), edges AS (
  SELECT 'c:' || ck AS src, 's:' || sk AS dst, w FROM trade
  UNION ALL SELECT 's:' || sk, 'c:' || ck, w FROM trade
), nodes AS (
  SELECT DISTINCT node FROM (
    SELECT 'c:' || c_custkey AS node FROM customer
    UNION ALL SELECT 's:' || s_suppkey FROM supplier
  )
), nn AS (SELECT count(*) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
shares AS (
  SELECT e.src, e.dst, e.w / o.ow AS share FROM edges e JOIN outw o ON e.src = o.src
),
r0 AS (SELECT node, round(1.0 / (SELECT n FROM nn), 6) AS rank FROM nodes)"""
    prev = "r0"
    for i in range(1, n_iter + 1):
        sql += f""",
c{i} AS (
  SELECT s.dst AS node, sum(p.rank * s.share) AS inflow
  FROM shares s JOIN {prev} p ON s.src = p.node GROUP BY 1
),
d{i} AS (
  SELECT coalesce(sum(rank), 0) AS dang FROM {prev}
  WHERE node NOT IN (SELECT src FROM outw)
),
r{i} AS (
  SELECT n.node,
    round((1 - {d}) / (SELECT n FROM nn)
      + {d} * (coalesce(c.inflow, 0) + (SELECT dang FROM d{i}) / (SELECT n FROM nn)),
      6) AS rank
  FROM nodes n LEFT JOIN c{i} c ON n.node = c.node
)"""
        prev = f"r{i}"
    return sql + f"\nSELECT node, rank FROM {prev} ORDER BY node"


def _event_dedup_oracle(window_minutes: int = 30) -> str:
    return f"""
WITH flagged AS (
  SELECT event_id, user_id, event_type,
    CASE WHEN lag(ts) OVER w IS NULL
         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {window_minutes} * 60 * 1000000
         THEN 1 ELSE 0 END AS nb,
    ts
  FROM events
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
)
SELECT event_id, user_id, event_type,
  CAST(sum(nb) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS burst_id,
  nb = 1 AS is_kept
FROM flagged
"""


def _shingle_cte(n: int = 3, source: str = "documents") -> str:
    """CTE producing (doc_id, s) word n-gram shingle rows."""
    return f"""
docs AS (SELECT doc_id, {_norm_toks_sql()} AS toks FROM {source}),
starts AS (
  SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - {n - 1}, 1))) AS i
  FROM docs
),
shing AS (
  SELECT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS s FROM starts
)"""


def _lsh_bands_ctes(
    num_hashes: int = 12,
    bands: int = 4,
    source: str = "documents",
) -> str:
    """CTE chain up through the UNCAPPED band postings (shingles ->
    signatures -> ``bands``), shared by the candidate stage and the
    bucket-skew audit so the banding spelling cannot drift."""
    rows = num_hashes // bands
    return f"""{_shingle_cte(3, source=source)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
seeds AS (SELECT unnest(generate_series(0, {num_hashes - 1})) AS j),
sig AS (
  SELECT doc_id, j, min(md5(s || '#' || CAST(j AS VARCHAR))) AS mh
  FROM sd, seeds GROUP BY doc_id, j
),
bands AS (
  SELECT doc_id, j // {rows} AS band_id,
         string_agg(mh, '|' ORDER BY j) AS band_key
  FROM sig GROUP BY doc_id, j // {rows}
)"""


def _minhash_cand_ctes(
    num_hashes: int = 12,
    bands: int = 4,
    bucket_cap: int = 200,
    source: str = "documents",
) -> str:
    """Shared CTE prefix of the MinHash family oracles (shingles ->
    signatures -> capped banding -> candidate pairs + shingle-set
    sizes + intersections) — one source of truth for the candidate
    stage, used by both the dedup oracle and the calibration audit.
    bucket_cap mirrors the Spark operator's skew guard exactly: band
    buckets larger than the cap generate no candidates (same bucket
    => same count, so constraining side a suffices)."""
    return f"""{_lsh_bands_ctes(num_hashes, bands, source=source)},
overb AS (
  SELECT band_id, band_key FROM bands GROUP BY 1, 2 HAVING count(*) > {bucket_cap}
),
bc AS (
  SELECT * FROM bands x
  WHERE NOT EXISTS (
    SELECT 1 FROM overb o WHERE o.band_id = x.band_id AND o.band_key = x.band_key
  )
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bc a JOIN bc b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sd GROUP BY 1),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN sd sa ON sa.doc_id = c.doc_a
  JOIN sd sb ON sb.doc_id = c.doc_b AND sa.s = sb.s
  GROUP BY 1, 2
)"""


def _minhash_oracle(
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    bucket_cap: int = 200,
    source: str = "documents",
) -> str:
    return f"""
WITH {_minhash_cand_ctes(num_hashes, bands, bucket_cap, source)}
SELECT c.doc_a, c.doc_b,
  round(coalesce(i.n_inter, 0) / (za.sz + zb.sz - coalesce(i.n_inter, 0)), 6) AS jaccard
FROM cand c
LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
JOIN sizes za ON za.doc_id = c.doc_a
JOIN sizes zb ON zb.doc_id = c.doc_b
WHERE round(coalesce(i.n_inter, 0) / (za.sz + zb.sz - coalesce(i.n_inter, 0)), 6) >= {threshold}
"""


def _minhash_calibration_oracle(
    num_hashes: int = 12, bands: int = 4, bucket_cap: int = 200
) -> str:
    return f"""
WITH {_minhash_cand_ctes(num_hashes, bands, bucket_cap)},
agree AS (
  SELECT c.doc_a, c.doc_b,
    sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END) AS m
  FROM cand c
  JOIN sig x ON x.doc_id = c.doc_a
  JOIN sig y ON y.doc_id = c.doc_b AND y.j = x.j
  GROUP BY 1, 2
),
pairs AS (
  SELECT
    CAST({_ppm_sql('coalesce(i.n_inter, 0)', '(za.sz + zb.sz - coalesce(i.n_inter, 0))')} AS BIGINT) AS exact_ppm,
    CAST({_ppm_sql('a.m', str(num_hashes))} AS BIGINT) AS est_ppm
  FROM cand c
  LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
  JOIN sizes za ON za.doc_id = c.doc_a
  JOIN sizes zb ON zb.doc_id = c.doc_b
  JOIN agree a ON a.doc_a = c.doc_a AND a.doc_b = c.doc_b
)
SELECT CAST(least(exact_ppm // 100000, 9) AS BIGINT) AS exact_decile,
  CAST(count(*) AS BIGINT) AS n_pairs,
  CAST(sum(abs(est_ppm - exact_ppm)) // count(*) AS BIGINT) AS mean_abs_err_ppm,
  CAST(sum(est_ppm) // count(*) AS BIGINT) AS mean_est_ppm,
  CAST(sum(exact_ppm) // count(*) AS BIGINT) AS mean_exact_ppm
FROM pairs GROUP BY 1
"""


def _chunk_oracle(chunk_tokens: int = 32, overlap: int = 8) -> str:
    stride = chunk_tokens - overlap
    return f"""
WITH d AS (SELECT doc_id, {_norm_toks_sql()} AS toks FROM documents),
st AS (
  SELECT doc_id, toks,
    unnest(generate_series(1, greatest(len(toks) - {overlap}, 1), {stride})) AS start_tok
  FROM d
), pieces AS (
  SELECT doc_id, (start_tok - 1) // {stride} AS chunk_idx, start_tok,
         toks[start_tok:start_tok + {chunk_tokens - 1}] AS piece
  FROM st
)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
  CAST(start_tok AS BIGINT) AS start_tok,
  CAST(len(piece) AS BIGINT) AS n_tok,
  md5(array_to_string(piece, ' ')) AS chunk_hash
FROM pieces
"""


def _decontaminate_oracle(n: int = 3, benchmark_mod: int = 100) -> str:
    return f"""
WITH {_shingle_cte(n)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
bench AS (SELECT DISTINCT s FROM sd WHERE doc_id % {benchmark_mod} = 0),
train AS (SELECT doc_id, s FROM sd WHERE doc_id % {benchmark_mod} <> 0)
SELECT t.doc_id, count(DISTINCT t.s) AS n_shared_ngrams
FROM train t JOIN bench b ON t.s = b.s
GROUP BY 1
"""


def _contamination_attribution_oracle(
    n: int = 3, benchmark_mod: int = 100, df_cap: int = 200
) -> str:
    return f"""
WITH {_shingle_cte(n)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
bench AS (SELECT doc_id AS bench_doc_id, s FROM sd WHERE doc_id % {benchmark_mod} = 0),
bdf AS (SELECT s FROM bench GROUP BY s HAVING count(*) <= {df_cap}),
bc AS (SELECT b.bench_doc_id, b.s FROM bench b JOIN bdf ON b.s = bdf.s),
train AS (SELECT doc_id, s FROM sd WHERE doc_id % {benchmark_mod} <> 0),
pc AS (
  SELECT t.doc_id, bc.bench_doc_id, count(*) AS n_shared
  FROM train t JOIN bc ON t.s = bc.s GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY n_shared DESC, bench_doc_id ASC) AS rn
  FROM pc
)
SELECT doc_id, bench_doc_id AS top_bench_doc_id,
  CAST(n_shared AS BIGINT) AS n_shared_ngrams
FROM r WHERE rn = 1
"""


def _decontaminate_bloom_oracle(
    n: int = 3, benchmark_mod: int = 100, m_bits: int = 1 << 18, k_hashes: int = 4
) -> str:
    """Bloom twin: identical md5-derived positions, membership checked
    against the exact position set — reproduces the Spark bitset's
    false positives bit-for-bit (a gram is flagged iff ALL of its k
    positions collide with some benchmark gram's positions)."""

    def pos(col: str, i: int) -> str:
        return f"CAST(concat('0x', substr(md5({col} || '#{i}'), 1, 8)) AS BIGINT) % {m_bits}"

    poslist = ", ".join(pos("s", i) for i in range(k_hashes))
    checks = " AND ".join(f"({pos('t.s', i)}) IN (SELECT p FROM bloom)" for i in range(k_hashes))
    return f"""
WITH {_shingle_cte(n)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
bench AS (SELECT DISTINCT s FROM sd WHERE doc_id % {benchmark_mod} = 0),
bloom AS (SELECT DISTINCT unnest([{poslist}]) AS p FROM bench),
train AS (SELECT doc_id, s FROM sd WHERE doc_id % {benchmark_mod} <> 0)
SELECT t.doc_id, count(DISTINCT t.s) AS n_flagged_ngrams
FROM train t WHERE {checks}
GROUP BY 1
"""


def _dsir_oracle(n_buckets: int = 4096, target_lang: str = "en") -> str:
    """DSIR twin: identical md5 bucket hashing, identical Laplace
    log-ratio frozen to integer micro-units, exact BIGINT per-doc
    sums — float summation order cannot diverge."""
    return f"""
WITH occ AS (
  SELECT doc_id, lang,
    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {n_buckets} AS bucket
  FROM (
    SELECT doc_id, lang,
      unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
    FROM documents
  )
),
stats AS (
  SELECT bucket, count(*) AS raw_cnt,
    sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END) AS target_cnt
  FROM occ GROUP BY 1
),
totals AS (SELECT sum(raw_cnt) AS raw_tot, sum(target_cnt) AS target_tot FROM stats),
weights AS (
  SELECT bucket,
    CAST(round(1e6 * (
      ln(CAST(target_cnt + 1 AS DOUBLE) / CAST(target_tot + {n_buckets} AS DOUBLE))
      - ln(CAST(raw_cnt + 1 AS DOUBLE) / CAST(raw_tot + {n_buckets} AS DOUBLE))
    )) AS BIGINT) AS w_micro
  FROM stats, totals
)
SELECT o.doc_id, o.lang, count(*) AS n_toks,
  CAST(sum(w.w_micro) AS BIGINT) AS score_micro,
  round(CAST(sum(w.w_micro) AS BIGINT) / 1e6, 6) AS dsir_score
FROM occ o JOIN weights w ON o.bucket = w.bucket
GROUP BY 1, 2
"""


def _bigram_perplexity_oracle(n_buckets: int = 4096) -> str:
    """Bigram twin: identical md5 pair-bucket hashing, Laplace NLL
    frozen to integer micro-nats, exact BIGINT per-doc sums."""
    return f"""
WITH toks AS (
  SELECT doc_id, {_norm_toks_sql()} AS t FROM documents
), big AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(t[i]), 1, 8)) AS BIGINT) % {n_buckets} AS pb,
    CAST(concat('0x', substr(md5(t[i+1]), 1, 8)) AS BIGINT) % {n_buckets} AS cb
  FROM (
    SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
    FROM toks WHERE len(t) >= 2
  )
), pc AS (
  SELECT pb, cb, count(*) AS c2 FROM big GROUP BY 1, 2
), ctx AS (
  SELECT pb, sum(c2) AS c1 FROM pc GROUP BY 1
), model AS (
  SELECT pc.pb, pc.cb,
    CAST(round(-1000000 * ln((pc.c2 + 1) / CAST(ctx.c1 + {n_buckets} AS DOUBLE))) AS BIGINT) AS nll
  FROM pc JOIN ctx ON pc.pb = ctx.pb
)
SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_trans,
  CAST(sum(m.nll) AS BIGINT) AS nll_micro_sum,
  round(exp(sum(m.nll) / 1e6 / count(*)), 4) AS perplexity
FROM big b JOIN model m ON b.pb = m.pb AND b.cb = m.cb
GROUP BY 1
"""


def _perplexity_oracle(n_buckets: int = 4096) -> str:
    """Perplexity twin: identical bucket hashing, NLL frozen to
    integer micro-nats, exact BIGINT sums; the final exp() evaluates
    on identical exact inputs in both engines."""
    return f"""
WITH occ AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {n_buckets} AS bucket
  FROM (
    SELECT doc_id,
      unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
    FROM documents
  )
),
counts AS (SELECT bucket, count(*) AS cnt FROM occ GROUP BY 1),
total AS (SELECT sum(cnt) AS tot FROM counts),
model AS (
  SELECT bucket,
    CAST(round(-1e6 * ln(CAST(cnt + 1 AS DOUBLE) / CAST(tot + {n_buckets} AS DOUBLE))) AS BIGINT)
      AS nll_micro
  FROM counts, total
)
SELECT o.doc_id, count(*) AS n_toks,
  CAST(sum(m.nll_micro) AS BIGINT) AS nll_micro_sum,
  round(exp(CAST(sum(m.nll_micro) AS BIGINT) / 1e6 / count(*)), 4) AS perplexity
FROM occ o JOIN model m ON o.bucket = m.bucket
GROUP BY 1
"""


def _keep_best_oracle() -> str:
    """Quality-argmax dedup twin: same quality formula as the quality
    oracle, rounded to 6dp BEFORE the ordering so the argmax is
    engine-invariant."""
    return f"""
WITH q AS (
  SELECT doc_id, quality_score AS q FROM ({_quality_oracle()})
), d AS (
  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash
  FROM documents
), dq AS (
  SELECT d.doc_id, d.content_hash, q.q,
    row_number() OVER (PARTITION BY d.content_hash ORDER BY q.q DESC, d.doc_id ASC) AS rn,
    count(*) OVER (PARTITION BY d.content_hash) AS dup_count
  FROM d JOIN q ON d.doc_id = q.doc_id
)
SELECT content_hash, doc_id AS keep_doc_id, q AS keep_quality,
       CAST(dup_count AS BIGINT) AS dup_count
FROM dq WHERE rn = 1
"""


def _corpus_filter_oracle(min_quality: float = 0.8) -> str:
    """Composite gate: exact-dedup keeper AND english AND quality —
    built by nesting the standalone oracles, the same way the Spark
    operator composes the standalone operators."""
    return f"""
SELECT q.doc_id, l.pred_lang, q.n_tokens, q.quality_score
FROM ({_quality_oracle()}) q
JOIN ({_lang_id_oracle()}) l ON q.doc_id = l.doc_id
WHERE q.doc_id IN (
  SELECT min(doc_id) FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
)
AND l.pred_lang = 'en' AND q.quality_score >= {min_quality}
"""


def _simhash_oracle(max_hamming: int = 3, bucket_cap: int = 200) -> str:
    """60-bit SimHash twin: DuckDB parses '0x'||hex to BIGINT, so the
    md5-derived token hash, per-bit votes, block bucketing and
    hamming verification replicate bit-for-bit."""
    from .operators.dedup import SIMHASH_BITS

    votes = ", ".join(
        f"sum(CASE WHEN ((h >> {j}) & 1) = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(SIMHASH_BITS)
    )
    sig = " + ".join(f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS))
    blocks = ", ".join(f"(sig >> {15 * i}) & 32767 AS b{i}" for i in range(4))
    postings = "\n  UNION ALL ".join(
        f"SELECT doc_id, sig, {i} AS bid, b{i} AS bval FROM blocks" for i in range(4)
    )
    # posting form (not OR-of-blocks) so the per-(bid, bval) bucket cap
    # mirrors the Spark operator's skew guard exactly
    return f"""
WITH d AS (SELECT doc_id, list_distinct({_norm_toks_sql()}) AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS t FROM d),
th AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h FROM tok),
votes AS (SELECT doc_id, {votes} FROM th GROUP BY 1),
sigs AS (SELECT doc_id, CAST({sig} AS BIGINT) AS sig FROM votes),
blocks AS (SELECT doc_id, sig, {blocks} FROM sigs),
post AS (
  {postings}
),
overp AS (SELECT bid, bval FROM post GROUP BY 1, 2 HAVING count(*) > {bucket_cap}),
cp AS (
  SELECT * FROM post x
  WHERE NOT EXISTS (SELECT 1 FROM overp o WHERE o.bid = x.bid AND o.bval = x.bval)
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM cp a JOIN cp b
    ON a.bid = b.bid AND a.bval = b.bval AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS BIGINT) AS hamming
FROM pairs WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
"""


def _media_dedup_oracle() -> str:
    return f"""
WITH m AS (
  SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    md5(text) AS h, strlen(text) AS nb
  FROM documents
),
per AS (SELECT kind, h, count(*) AS c, min(nb) AS nb FROM m GROUP BY 1, 2)
SELECT kind, CAST(sum(c) AS BIGINT) AS n_media,
  CAST(count(*) AS BIGINT) AS n_unique,
  CAST(sum(c - 1) AS BIGINT) AS n_dup,
  CAST(sum(c * nb) AS BIGINT) AS bytes_total,
  CAST(sum((c - 1) * nb) AS BIGINT) AS bytes_dup,
  CAST({_ppm_sql('sum((c - 1) * nb)', 'sum(c * nb)')} AS BIGINT) AS savings_ppm
FROM per GROUP BY 1
"""


def _multimodal_oracle() -> str:
    """The decode stub derives all measurements from md5(payload) with
    payload = utf-8 text bytes, so the whole mapInPandas feature pass
    has an exact SQL twin."""
    return """
WITH m AS (
  SELECT doc_id AS media_id,
    CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
    md5(text) AS fh,
    strlen(text) AS n_bytes
  FROM documents
)
SELECT media_id, kind, 'application/x-fake-' || kind AS mime, n_bytes,
  16 + ('0x' || substr(fh, 1, 2))::BIGINT % 240 AS width,
  16 + ('0x' || substr(fh, 3, 2))::BIGINT % 240 AS height,
  CASE WHEN kind IN ('audio', 'video')
       THEN round((('0x' || substr(fh, 5, 2))::BIGINT % 600) / 10.0, 1)
       ELSE 0.0 END AS duration_s,
  fh AS feature_hash
FROM m
"""


def _ann_lsh_oracle(n_queries: int = 8, k: int = 5, n_planes: int = 8, dim: int = 64) -> str:
    """Hyperplane-LSH twin: the planes are md5-derived constants and
    the projection is a left-associated sum (same fold order as the
    Spark aggregate()), so bucket assignment matches exactly; cosine
    is rounded to 6dp on both sides."""
    from .operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, n_planes)
    projs = []
    for p_idx, plane in enumerate(planes):
        terms = " + ".join(f"v[{d + 1}] * ({coef!r})" for d, coef in enumerate(plane))
        projs.append(f"CASE WHEN ({terms}) >= 0 THEN {1 << p_idx} ELSE 0 END")
    bucket = " + ".join(projs)
    probe_buckets = ", ".join(
        ["q_bucket"] + [f"xor(q_bucket, {1 << i})" for i in range(n_planes)]
    )
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sigd AS (SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM c),
q AS (SELECT vec_id AS q_id, v AS q_vec, bucket AS q_bucket FROM sigd WHERE vec_id < {n_queries}),
probes AS (SELECT q_id, q_vec, unnest([{probe_buckets}]) AS bucket FROM q),
cand AS (
  SELECT DISTINCT p.q_id, s.vec_id
  FROM probes p JOIN sigd s ON p.bucket = s.bucket
  WHERE s.vec_id <> p.q_id
),
scored AS (
  SELECT cand.q_id, cand.vec_id,
    round(list_dot_product(q.q_vec, s.v) /
          (sqrt(list_dot_product(q.q_vec, q.q_vec)) * sqrt(list_dot_product(s.v, s.v))), 6)
      AS cos_sim
  FROM cand
  JOIN q ON cand.q_id = q.q_id
  JOIN sigd s ON cand.vec_id = s.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, cos_sim
FROM ranked WHERE rank <= {k}
"""


def _substring_dedup_oracle(block_tokens: int = 10) -> str:
    """Block-level exact-substring dedup twin: identical fixed
    k-token grid, md5 block hashes, first-occurrence = min
    (doc_id, pos) (row_number spelling — same total order as the
    Spark min-struct aggregate), order-pinned cleaned-text
    reconstruction + md5 fingerprint."""
    k = block_tokens
    return f"""
WITH base AS (
  SELECT doc_id, source, {_norm_toks_sql()} AS t FROM documents
),
withn AS (
  SELECT doc_id, source, t, len(t) AS n_toks,
    CAST(floor(len(t) / {k}) AS BIGINT) AS nb
  FROM base
),
blocks AS (
  SELECT doc_id, pos, array_to_string(t[pos*{k}+1 : pos*{k}+{k}], ' ') AS bt
  FROM (
    SELECT doc_id, t, unnest(generate_series(0, CAST(nb AS INT) - 1)) AS pos
    FROM withn WHERE nb > 0
  )
),
flagged AS (
  SELECT doc_id, pos, bt,
    row_number() OVER (PARTITION BY md5(bt) ORDER BY doc_id, pos) > 1 AS is_dup
  FROM blocks
),
per_doc AS (
  SELECT doc_id, count(*) AS n_blocks,
    sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup_blocks,
    coalesce(string_agg(CASE WHEN NOT is_dup THEN bt END, ' ' ORDER BY pos), '')
      AS kept_text
  FROM flagged GROUP BY doc_id
)
SELECT w.doc_id, w.source,
  CAST(coalesce(p.n_blocks, 0) AS BIGINT) AS n_blocks,
  CAST(coalesce(p.n_dup_blocks, 0) AS BIGINT) AS n_dup_blocks,
  CAST(coalesce(p.n_dup_blocks, 0) * {k} AS BIGINT) AS tokens_removed,
  CAST(w.n_toks AS BIGINT) AS n_tokens,
  md5(trim(concat(coalesce(p.kept_text, ''), ' ',
      array_to_string(w.t[w.nb*{k}+1 : w.n_toks], ' ')))) AS cleaned_fingerprint
FROM withn w LEFT JOIN per_doc p USING (doc_id)
"""


def _pack_oracle(budget: int = 256) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source,
         len(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS n_tokens
  FROM documents
), c AS (
  SELECT *, coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM d
)
SELECT source, CAST(floor(before / {budget}) AS BIGINT) AS bin,
  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  min(doc_id) AS first_doc_id, max(doc_id) AS last_doc_id
FROM c GROUP BY 1, 2
"""


def _pack_efficiency_oracle(budget: int = 256) -> str:
    return f"""
WITH bins AS ({_pack_oracle(budget)})
SELECT source, CAST(count(*) AS BIGINT) AS n_bins,
  CAST(sum(n_docs) AS BIGINT) AS n_docs,
  CAST(sum(total_tokens) AS BIGINT) AS total_tokens,
  CAST(sum(CASE WHEN total_tokens > {budget} THEN 1 ELSE 0 END) AS BIGINT) AS n_overfull_bins,
  CAST(sum(CASE WHEN total_tokens < {budget} THEN 1 ELSE 0 END) AS BIGINT) AS n_underfull_bins,
  CAST(max(total_tokens) AS BIGINT) AS max_bin_tokens,
  CAST({_ppm_sql('sum(total_tokens)', f'(count(*) * {budget})')} AS BIGINT) AS fill_ppm
FROM bins GROUP BY 1
"""


def _cluster_size_profile_oracle() -> str:
    return f"""
WITH sizes AS (
  SELECT cluster_id, count(*) AS s
  FROM ({_clusters_oracle()}) labels GROUP BY 1
),
tot AS (SELECT sum(s) AS n_clustered FROM sizes),
prof AS (SELECT s, count(*) AS n_clusters FROM sizes GROUP BY 1)
SELECT CAST(s AS BIGINT) AS cluster_size,
  CAST(n_clusters AS BIGINT) AS n_clusters,
  CAST(s * n_clusters AS BIGINT) AS n_docs,
  CAST({_ppm_sql('(s * n_clusters)', 'n_clustered')} AS BIGINT) AS docs_share_ppm
FROM prof CROSS JOIN tot
"""


def _quality_length_bias_oracle(bucket_tokens: int = 8, min_quality: float = 0.8) -> str:
    return f"""
WITH q AS (
  SELECT doc_id, n_tokens,
    CAST(round(quality_score * 1000000) AS BIGINT) AS q_e6
  FROM ({_quality_oracle()}) qq
),
kept AS (SELECT doc_id, 1 AS kept FROM ({_corpus_filter_oracle(min_quality)}) cf),
agg AS (
  SELECT CAST(floor(q.n_tokens / {bucket_tokens}) AS BIGINT) AS len_bucket,
    count(*) AS n_docs, coalesce(sum(kept), 0) AS n_kept, sum(q_e6) AS q_sum
  FROM q LEFT JOIN kept USING (doc_id) GROUP BY 1
)
SELECT len_bucket, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_kept AS BIGINT) AS n_kept,
  CAST({_ppm_sql('n_kept', 'n_docs')} AS BIGINT) AS keep_ppm,
  CAST(q_sum // n_docs AS BIGINT) AS mean_quality_e6
FROM agg
"""


def _phase_audit_oracle(k: int = 10, sample_pct: int = 40) -> str:
    """Stride-1 window twin of operators/dedup.py:substring_phase_audit
    — same md5 doc sample, every k-token window hashed; per phase,
    the phase-free vs same-phase duplicated-window mass and the
    exact-ppm grid-miss share."""
    src = (
        "(SELECT * FROM documents WHERE"
        " CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#phaseaudit')), 1, 15)) AS BIGINT)"
        f" % 100 < {sample_pct})"
    )
    return f"""
WITH base AS (SELECT doc_id, {_norm_toks_sql()} AS t FROM {src} d),
pos AS (
  SELECT t, unnest(generate_series(0, len(t) - {k})) AS j
  FROM base WHERE len(t) >= {k}
),
per_hp AS (
  SELECT md5(array_to_string(t[j+1 : j+{k}], ' ')) AS h,
    CAST(j % {k} AS BIGINT) AS phase,
    count(*) AS cp
  FROM pos GROUP BY 1, 2
),
per_h AS (SELECT h, sum(cp) AS c FROM per_hp GROUP BY 1),
agg AS (
  SELECT phase, sum(cp) AS nw,
    sum(CASE WHEN c > 1 THEN cp ELSE 0 END) AS nda,
    sum(CASE WHEN cp > 1 THEN cp ELSE 0 END) AS nds
  FROM per_hp JOIN per_h USING (h) GROUP BY 1
)
SELECT phase, CAST(nw AS BIGINT) AS n_windows,
  CAST(nda AS BIGINT) AS n_dup_any,
  CAST(nds AS BIGINT) AS n_dup_same_phase,
  CAST(CASE WHEN nda > 0 THEN {_ppm_sql('(nda - nds)', 'nda')} END AS BIGINT)
    AS grid_miss_ppm
FROM agg
"""


def _token_savings_oracle(block_tokens: int = 10) -> str:
    return f"""
WITH stats AS ({_substring_dedup_oracle(block_tokens)})
SELECT source,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
  CAST(sum(tokens_removed) AS BIGINT) AS tokens_removed,
  CAST({_ppm_sql('sum(tokens_removed)', 'sum(n_tokens)')} AS BIGINT) AS savings_ppm
FROM stats GROUP BY 1
"""


def _emb_decontam_oracle(
    threshold: float = 0.3, n_planes: int = 48, bands: int = 12, dim: int = 64
) -> str:
    """Semantic-decontamination twin: identical md5 hyperplanes,
    left-associated projection fold, md5 split buckets, the same
    BANDED OR-construction (bands x sign-bits band keys), and
    6dp-rounded-cosine thresholding."""
    from .operators.similarity import _hyperplanes

    bits_per_band = n_planes // bands
    planes = _hyperplanes(dim, n_planes)

    def band_val(b: int) -> str:
        bits = []
        for i in range(bits_per_band):
            plane = planes[b * bits_per_band + i]
            terms = " + ".join(
                f"v[{d + 1}] * ({coef!r})" for d, coef in enumerate(plane)
            )
            bits.append(f"CASE WHEN ({terms}) >= 0 THEN {1 << i} ELSE 0 END")
        return " + ".join(bits)

    band_structs = ", ".join(
        f"{{'band_id': {b}, 'band_val': CAST({band_val(b)} AS BIGINT)}}"
        for b in range(bands)
    )
    cos = (
        "round(list_dot_product(tr.v, te.t_vec) /"
        " (sqrt(list_dot_product(tr.v, tr.v)) *"
        " sqrt(list_dot_product(te.t_vec, te.t_vec))), 6)"
    )
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (
  SELECT vec_id, v, [{band_structs}] AS bk,
    CAST(concat('0x', substr(md5(concat(CAST(vec_id AS VARCHAR), '#split')), 1, 15)) AS BIGINT)
      % 1000 AS sb
  FROM c
),
test AS (SELECT vec_id AS t_id, v AS t_vec, unnest(bk, recursive := true) FROM s WHERE sb < 100),
train AS (SELECT vec_id, v, unnest(bk, recursive := true) FROM s WHERE sb >= 100),
cand AS (
  SELECT DISTINCT tr.vec_id, te.t_id
  FROM train tr JOIN test te
    ON tr.band_id = te.band_id AND tr.band_val = te.band_val
),
scored AS (
  SELECT cand.vec_id, cand.t_id, {cos} AS cos_sim
  FROM cand
  JOIN (SELECT DISTINCT vec_id, v FROM train) tr ON cand.vec_id = tr.vec_id
  JOIN (SELECT DISTINCT t_id, t_vec FROM test) te ON cand.t_id = te.t_id
)
SELECT vec_id AS train_vec_id,
  CAST(count(*) AS BIGINT) AS n_test_matches,
  max(cos_sim) AS max_cos
FROM scored WHERE cos_sim >= {threshold}
GROUP BY 1
"""


def _ann_ivf_oracle(n_queries: int = 8, k: int = 5, n_centroids: int = 16, n_probe: int = 2) -> str:
    """IVF twin: centroid assignment by rounded cosine argmax (ties on
    centroid id), query probes its n_probe nearest cells."""
    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS c_id, v AS c_vec FROM c WHERE vec_id < {n_centroids}),
assign AS (
  SELECT vec_id, c_id, {cos.format(a="v", b="c_vec")} AS c_sim
  FROM c, cents
),
cells AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id ASC) AS rn
    FROM assign) WHERE rn = 1
),
q AS (SELECT vec_id AS q_id, v AS q_vec FROM c WHERE vec_id < {n_queries}),
qassign AS (
  SELECT q_id, c_id, {cos.format(a="q_vec", b="c_vec")} AS c_sim
  FROM q, cents
),
probes AS (
  SELECT q_id, c_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY c_sim DESC, c_id ASC) AS rn
    FROM qassign) WHERE rn <= {n_probe}
),
cand AS (
  SELECT DISTINCT p.q_id, cc.vec_id
  FROM probes p JOIN cells cc ON p.cell = cc.cell
  WHERE cc.vec_id <> p.q_id
),
scored AS (
  SELECT cand.q_id, cand.vec_id,
         {cos.format(a="q.q_vec", b="cv.v")} AS cos_sim
  FROM cand JOIN q ON cand.q_id = q.q_id JOIN c cv ON cand.vec_id = cv.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, cos_sim
FROM ranked WHERE rank <= {k}
"""


def _ann_filtered_oracle(
    n_queries: int = 8, k: int = 5, n_centroids: int = 16, n_probe: int = 3
) -> str:
    """Filtered-search twin (C151): C9's cell/probe CTEs with the
    label predicate applied at candidate grain (metadata rows only —
    the pre-filter strategy), exact scoring of the survivors."""
    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
cents AS (SELECT vec_id AS c_id, v AS c_vec FROM c WHERE vec_id < {n_centroids}),
assign AS (
  SELECT vec_id, c_id, {cos.format(a="v", b="c_vec")} AS c_sim
  FROM c, cents
),
cells AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id ASC) AS rn
    FROM assign) WHERE rn = 1
),
q AS (SELECT vec_id AS q_id, v AS q_vec, label AS q_label FROM c WHERE vec_id < {n_queries}),
qassign AS (
  SELECT q_id, c_id, {cos.format(a="q_vec", b="c_vec")} AS c_sim
  FROM q, cents
),
probes AS (
  SELECT q_id, c_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY c_sim DESC, c_id ASC) AS rn
    FROM qassign) WHERE rn <= {n_probe}
),
survivors AS (
  SELECT p.q_id, cc.vec_id, cv.label
  FROM probes p JOIN cells cc ON p.cell = cc.cell
  JOIN c cv ON cc.vec_id = cv.vec_id
  JOIN q ON p.q_id = q.q_id
  WHERE cc.vec_id <> p.q_id AND cv.label = q.q_label
),
scored AS (
  SELECT s.q_id, s.vec_id, {cos.format(a="q.q_vec", b="cv.v")} AS cos_sim, s.label
  FROM survivors s JOIN q ON s.q_id = q.q_id JOIN c cv ON s.vec_id = cv.vec_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, cos_sim, label
FROM ranked WHERE rank <= {k}
"""


def _rolling_pct_oracle(window_days: int = 7) -> str:
    """Rolling-percentile twin (B145): identical day-arithmetic
    trailing join, identical sorted-array integer indexing
    (percentile_disc's rule, 1-based, pure integer index math)."""
    return f"""
WITH {_DAILY_GRID_SQL},
offs AS (SELECT unnest(generate_series(0, {window_days - 1})) AS off),
tr AS (
  SELECT a.event_type, a.day, CAST(b.n AS BIGINT) AS x
  FROM grid a CROSS JOIN offs
  JOIN grid b ON b.event_type = a.event_type
             AND b.day = a.day - CAST(offs.off AS INT)
),
agg AS (
  SELECT event_type, day, count(*) AS n_days, list_sort(list(x)) AS xs
  FROM tr GROUP BY 1, 2
)
SELECT event_type, day, CAST(n_days AS BIGINT) AS n_days,
  CAST(xs[CAST((n_days + 1) // 2 AS INT)] AS BIGINT) AS p50,
  CAST(xs[CAST((9 * n_days + 9) // 10 AS INT)] AS BIGINT) AS p90
FROM agg ORDER BY event_type, day
"""


def _holdout_stratum_oracle(val_permille: int = 10, test_permille: int = 10) -> str:
    """Post-stratification twin (C156): C49's bucket expression
    verbatim, shares/weights in exact floor-ppm (ppm_sql)."""
    from .functions.exact import ppm_sql

    split_share = ppm_sql("per.n_docs", "st.split_total")
    corpus_share = ppm_sql("sr.src_total", "ct.corpus_total")
    return f"""
WITH b AS (
  SELECT doc_id, source,
    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#split')), 1, 15)) AS BIGINT)
      % 1000 AS bucket
  FROM documents
),
assigned AS (
  SELECT source,
    CASE WHEN bucket < {test_permille} THEN 'test'
         WHEN bucket < {test_permille + val_permille} THEN 'val'
         ELSE 'train' END AS split
  FROM b
),
per AS (SELECT split, source, count(*) AS n_docs FROM assigned GROUP BY 1, 2),
st AS (SELECT split, sum(n_docs) AS split_total FROM per GROUP BY 1),
sr AS (SELECT source, sum(n_docs) AS src_total FROM per GROUP BY 1),
ct AS (SELECT sum(n_docs) AS corpus_total FROM per)
SELECT per.split, per.source, CAST(per.n_docs AS BIGINT) AS n_docs,
  CAST({split_share} AS BIGINT) AS split_share_ppm,
  CAST({corpus_share} AS BIGINT) AS corpus_share_ppm,
  CAST({ppm_sql(f'({corpus_share})', f'({split_share})')} AS BIGINT) AS weight_ppm
FROM per
JOIN st ON per.split = st.split
JOIN sr ON per.source = sr.source
CROSS JOIN ct
ORDER BY per.split, per.source
"""


def _xcorr_oracle(max_lag: int = 3) -> str:
    """Cross-correlation twin (B144): the complete grid makes the
    lagged pairing a day-arithmetic join; unordered type pairs,
    moments as exact BIGINTs, identical final double tree, NULL on
    zero variance (the B102 template with two series)."""
    return f"""
WITH {_DAILY_GRID_SQL},
ks AS (SELECT unnest(generate_series(-{max_lag}, {max_lag})) AS lag),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, ks.lag,
    CAST(a.n AS BIGINT) AS x, CAST(b.n AS BIGINT) AS y
  FROM grid a CROSS JOIN ks
  JOIN grid b ON a.event_type < b.event_type
             AND b.day = a.day - CAST(ks.lag AS INT)
),
mom AS (
  SELECT type_a, type_b, lag, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2, 3
)
SELECT type_a, type_b, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
    round(CAST(n * sxy - sx * sy AS DOUBLE)
          / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
  END AS xcorr
FROM mom ORDER BY type_a, type_b, lag
"""


def _sq_recall_oracle(n_queries: int = 8, k: int = 5, dim: int = 64) -> str:
    """int8-SQ recall twin (C155): C24's quantization expression
    verbatim, BIGINT integer dot for the approximate ranking, 6dp
    double dot for the truth; recall per query."""
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q8 AS MATERIALIZED (
  SELECT vec_id,
    list_transform(v, x -> CAST(floor(
      x / (greatest(list_max(list_transform(v, y -> abs(y))), 1e-12) / 127.0)
      + 0.5) AS BIGINT)) AS qv
  FROM c
),
tq AS (SELECT vec_id AS q_id, v AS q_vec FROM c WHERE vec_id < {n_queries}),
tscored AS (
  SELECT q_id, vec_id, round(list_dot_product(q_vec, v), 6) AS s
  FROM tq, c WHERE vec_id <> q_id
),
truth AS (
  SELECT q_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY s DESC, vec_id ASC) AS rn
    FROM tscored
  ) WHERE rn <= {k}
),
aq AS (SELECT vec_id AS q_id, qv AS q_qv FROM q8 WHERE vec_id < {n_queries}),
ascored AS (
  SELECT q_id, q8.vec_id,
    CAST(list_sum(list_transform(range(1, {dim} + 1), i -> q_qv[i] * qv[i])) AS BIGINT) AS s
  FROM aq, q8 WHERE q8.vec_id <> q_id
),
approx AS (
  SELECT q_id, vec_id FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY s DESC, vec_id ASC) AS rn
    FROM ascored
  ) WHERE rn <= {k}
)
SELECT truth.q_id,
  CAST(count(approx.vec_id) AS BIGINT) AS n_hits,
  round(count(approx.vec_id) / {float(k)}, 6) AS recall
FROM truth LEFT JOIN approx
  ON truth.q_id = approx.q_id AND truth.vec_id = approx.vec_id
GROUP BY 1
"""


def _kcore_oracle(k: int = 6, n_rounds: int = 4) -> str:
    """k-core twin (B143): the peel rounds unrolled — each round a
    degree CTE, a keep CTE, and the edge set filtered to kept
    endpoints. Every e{r} is MATERIALIZED — each is referenced twice
    (by its round's degree CTE and the next edge filter), so an
    unmaterialized chain recomputes the prefix 2^rounds times
    (measured 362s -> ~25s at sf0.1)."""
    ctes = [
        """trade AS (
  SELECT DISTINCT 'c:' || o.o_custkey AS src, 's:' || l.l_suppkey AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
)""",
        "e0 AS MATERIALIZED (SELECT src, dst FROM trade UNION ALL SELECT dst, src FROM trade)",
    ]
    for r in range(1, n_rounds + 1):
        ctes.append(
            f"d{r} AS (SELECT src, count(*) AS c FROM e{r - 1} GROUP BY 1)"
        )
        ctes.append(f"k{r} AS (SELECT src FROM d{r} WHERE c >= {k})")
        ctes.append(
            f"""e{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{r - 1} e
  JOIN k{r} a ON e.src = a.src JOIN k{r} b ON e.dst = b.src
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT src AS node, CAST(count(*) AS BIGINT) AS core_degree FROM e{n_rounds} GROUP BY 1\n"
    )


def _facility_location_oracle(k: int = 8, pool: int = 64) -> str:
    """Facility-location twin (C152): the k greedy rounds unrolled as
    CTE chains (the C33 pattern) — identical e6-frozen integer
    coverage algebra, (gain DESC, c_id ASC) argmax per round, each
    round's pick and coverage MATERIALIZED so the planner never
    inlines the recurrence."""
    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    sim = cos.format(a="v.vec", b="c.c_vec")
    ctes = [
        "corpus AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings)",
        f"cand AS (SELECT vec_id AS c_id, vec AS c_vec FROM corpus WHERE vec_id < {pool})",
        f"""sims AS MATERIALIZED (
  SELECT v.vec_id, c.c_id,
    greatest(CAST(round({sim} * 1000000) AS BIGINT), CAST(0 AS BIGINT)) AS sim_e6
  FROM corpus v CROSS JOIN cand c
)""",
    ]
    for s in range(1, k + 1):
        if s == 1:
            ctes.append(
                "g1 AS (SELECT c_id, CAST(sum(sim_e6) AS BIGINT) AS gain FROM sims GROUP BY 1)"
            )
        else:
            ctes.append(
                f"""g{s} AS (
  SELECT s.c_id,
    CAST(sum(greatest(s.sim_e6 - coalesce(c.cov_e6, 0), 0)) AS BIGINT) AS gain
  FROM sims s LEFT JOIN cov{s - 1} c USING (vec_id)
  WHERE s.c_id NOT IN (SELECT c_id FROM sel{s - 1})
  GROUP BY 1
)"""
            )
        ctes.append(
            f"p{s} AS MATERIALIZED (SELECT c_id, gain FROM g{s} ORDER BY gain DESC, c_id ASC LIMIT 1)"
        )
        if s == 1:
            ctes.append("sel1 AS (SELECT c_id FROM p1)")
        else:
            ctes.append(
                f"sel{s} AS (SELECT c_id FROM sel{s - 1} UNION ALL SELECT c_id FROM p{s})"
            )
        if s < k:
            ctes.append(
                f"""cov{s} AS MATERIALIZED (
  SELECT vec_id, max(sim_e6) AS cov_e6 FROM sims
  WHERE c_id IN (SELECT c_id FROM sel{s}) GROUP BY 1
)"""
            )
    steps = "\nUNION ALL ".join(
        f"SELECT {s} AS step, c_id, gain FROM p{s}" for s in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
steps AS ({steps})
SELECT CAST(step AS INT) AS step, c_id AS vec_id, gain AS gain_e6,
  CAST(sum(gain) OVER (ORDER BY step) AS BIGINT) AS coverage_e6
FROM steps ORDER BY step
"""
    )


def _filtered_ann_recall_oracle(
    n_queries: int = 8, k: int = 5, n_probe: int = 3
) -> str:
    """Filtered-recall twin (C153): exact filtered brute force and
    C151's pre-filter oracle as subqueries; recall = |truth ∩
    approx| / k per query. Both outer CTEs stay unmaterialized —
    their nested WITHs share names (the DuckDB shadowed-CTE trap)."""
    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""
WITH bf AS (
  WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
  q AS (SELECT vec_id AS q_id, v AS q_vec, label AS q_label FROM c WHERE vec_id < {n_queries}),
  scored AS (
    SELECT q.q_id, c.vec_id, {cos.format(a="q.q_vec", b="c.v")} AS cos_sim
    FROM q JOIN c ON c.label = q.q_label AND c.vec_id <> q.q_id
  ),
  ranked AS (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
    FROM scored
  )
  SELECT q_id, vec_id AS neighbor_id FROM ranked WHERE rank <= {k}
),
fa AS ({_ann_filtered_oracle(n_queries, k, 16, n_probe)})
SELECT bf.q_id,
  CAST(count(fa.neighbor_id) AS BIGINT) AS n_hits,
  round(count(fa.neighbor_id) / {float(k)}, 6) AS recall
FROM bf LEFT JOIN fa
  ON bf.q_id = fa.q_id AND bf.neighbor_id = fa.neighbor_id
GROUP BY 1
"""


def _selection_coverage_oracle(k: int = 8, pool: int = 64) -> str:
    """Coverage-audit twin (C154): C152's unrolled greedy as a
    subquery beside the id-ordered baseline prefix (running max per
    vector over the candidate prefix, summed per prefix length);
    lift in exact floor-ppm. Outer CTE names are disjoint from the
    greedy subquery's nested names (the shadowed-CTE trap)."""
    from .functions.exact import ppm_sql

    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    sim = cos.format(a="v.vec", b="p.c_vec")
    return f"""
WITH greedy AS ({_facility_location_oracle(k, pool)}),
bcorpus AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
bprefix AS (
  SELECT c_id, c_vec, crank FROM (
    SELECT vec_id AS c_id, vec AS c_vec,
      row_number() OVER (ORDER BY vec_id ASC) AS crank
    FROM bcorpus WHERE vec_id < {pool}
  ) WHERE crank <= {k}
),
bsims AS (
  SELECT v.vec_id, p.crank,
    greatest(CAST(round({sim} * 1000000) AS BIGINT), CAST(0 AS BIGINT)) AS sim_e6
  FROM bcorpus v CROSS JOIN bprefix p
),
brun AS (
  SELECT vec_id, crank,
    max(sim_e6) OVER (PARTITION BY vec_id ORDER BY crank ROWS UNBOUNDED PRECEDING) AS cov_e6
  FROM bsims
),
baseline AS (
  SELECT CAST(crank AS INT) AS step, CAST(sum(cov_e6) AS BIGINT) AS baseline_coverage_e6
  FROM brun GROUP BY 1
)
SELECT g.step, g.coverage_e6 AS greedy_coverage_e6, b.baseline_coverage_e6,
  CAST({ppm_sql("g.coverage_e6", "b.baseline_coverage_e6")} AS BIGINT) AS lift_ppm
FROM greedy g JOIN baseline b USING (step) ORDER BY step
"""


def _clusters_oracle() -> str:
    """Connected components over the minhash near-dup pairs: min
    reachable node id per node via a recursive CTE (the SQL twin of
    the Spark-side iterative min-label propagation)."""
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({_minhash_oracle()}) mh),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT id AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY 1
"""


def _ngram_jaccard_oracle(n: int = 3, threshold: float = 0.3, df_cap: int = 1000) -> str:
    # mirrors the Spark operator's capped-feature-set semantics:
    # shingles with df > df_cap leave the feature universe entirely
    # (stopword-style pruning) — sizes AND intersections both use the
    # capped sets, so jaccard is an exact set similarity over
    # informative shingles
    return f"""
WITH {_shingle_cte(n)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
over AS (SELECT s FROM sd GROUP BY s HAVING count(*) > {df_cap}),
sdc AS (
  SELECT doc_id, s FROM sd
  WHERE NOT EXISTS (SELECT 1 FROM over WHERE over.s = sd.s)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sdc GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sdc a JOIN sdc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
  round(i.n_inter / (za.sz + zb.sz - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE round(i.n_inter / (za.sz + zb.sz - i.n_inter), 6) >= {threshold}
"""


def _lang_id_oracle() -> str:
    from .functions.textfns import LANG_MARKERS

    score_exprs = []
    for lang in sorted(LANG_MARKERS):
        lst = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        score_exprs.append(
            f"len(list_filter(toks, t -> list_contains([{lst}], t))) AS s_{lang}"
        )
    langs = sorted(LANG_MARKERS)
    m = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = f"CASE WHEN {m} = 0 THEN 'und' "
    for l in langs:
        case += f"WHEN s_{l} = {m} THEN '{l}' "
    case += "END"
    return f"""
WITH d AS (SELECT doc_id, {_norm_toks_sql()} AS toks FROM documents),
scored AS (SELECT doc_id, {", ".join(score_exprs)} FROM d)
SELECT doc_id, {case} AS pred_lang FROM scored
"""


def _quality_oracle() -> str:
    from .functions.textfns import STOPWORDS_EN

    stop = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
WITH d AS (
  SELECT doc_id, text, {_norm_toks_sql()} AS toks FROM documents
), feat AS (
  SELECT doc_id,
    len(toks) AS n_tokens,
    length(regexp_replace(text, '[^\\.\\,\\;\\:\\!\\?]', '', 'g'))
      / greatest(length(text), 1) AS punct_ratio,
    len(list_filter(toks, t -> list_contains([{stop}], t)))
      / greatest(len(toks), 1) AS stopword_ratio,
    1.0 - len(list_distinct(toks)) / greatest(len(toks), 1) AS repetition_ratio
  FROM d
)
SELECT doc_id, n_tokens,
  round(punct_ratio, 6) AS punct_ratio,
  round(stopword_ratio, 6) AS stopword_ratio,
  round(repetition_ratio, 6) AS repetition_ratio,
  round(
    (CASE WHEN n_tokens >= 10 AND n_tokens <= 10000 THEN 1.0 ELSE 0.3 END) * 0.3
    + (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.5 END) * 0.2
    + (1.0 - repetition_ratio) * 0.3
    + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.6 END) * 0.2, 6) AS quality_score
FROM feat
"""


def _ttr_oracle() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, source, unnest({_norm_toks_sql()}) AS tok FROM documents
), tc AS (
  SELECT source, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
), per AS (
  SELECT source, sum(cnt) AS n_tokens, count(*) AS n_types,
    sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS n_hapax
  FROM tc GROUP BY 1
), nd AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
SELECT per.source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_tokens AS BIGINT) AS n_tokens, CAST(n_types AS BIGINT) AS n_types,
  round(n_types / n_tokens, 6) AS ttr,
  CAST(n_hapax AS BIGINT) AS n_hapax,
  round(n_hapax / n_types, 6) AS hapax_share
FROM per JOIN nd ON per.source = nd.source
"""


def _length_outliers_oracle(k: float = 3.0) -> str:
    return f"""
WITH d AS (
  SELECT doc_id, source, len({_norm_toks_sql()}) AS n_toks FROM documents
), med AS (
  SELECT source, quantile_cont(n_toks, 0.5) AS src_median FROM d GROUP BY 1
), dm AS (
  SELECT d.doc_id, d.source, d.n_toks, med.src_median
  FROM d JOIN med ON d.source = med.source
), mad AS (
  SELECT source, quantile_cont(abs(n_toks - src_median), 0.5) AS src_mad
  FROM dm GROUP BY 1
)
SELECT dm.doc_id, dm.source, CAST(dm.n_toks AS BIGINT) AS n_toks,
  round(dm.src_median, 6) AS src_median, round(mad.src_mad, 6) AS src_mad
FROM dm JOIN mad ON dm.source = mad.source
WHERE abs(dm.n_toks - dm.src_median) > {k} * mad.src_mad
"""


def _weighted_sample_oracle() -> str:
    return f"""
WITH q AS (SELECT doc_id, quality_score FROM ({_quality_oracle()})),
s AS (
  SELECT d.doc_id, d.source, q.quality_score AS quality,
    CAST(concat('0x', substr(md5(concat(CAST(d.doc_id AS VARCHAR), '#ws')), 1, 15)) AS BIGINT)
      % 1000000 AS sample_u,
    CAST(round(q.quality_score * 1000000, 0) AS BIGINT) AS q_micro
  FROM documents d JOIN q ON d.doc_id = q.doc_id
)
SELECT doc_id, source, quality, CAST(sample_u AS BIGINT) AS sample_u
FROM s WHERE 2 * sample_u < q_micro
"""


def _detector_agreement_oracle() -> str:
    return f"""
WITH mh AS (SELECT doc_a, doc_b FROM ({_minhash_oracle()})),
sh AS (SELECT doc_a, doc_b FROM ({_simhash_oracle()})),
j AS (
  SELECT mh.doc_a IS NOT NULL AS in_mh, sh.doc_a IS NOT NULL AS in_sh
  FROM mh FULL OUTER JOIN sh
    ON mh.doc_a = sh.doc_a AND mh.doc_b = sh.doc_b
)
SELECT CASE WHEN in_mh AND in_sh THEN 'both'
            WHEN in_mh THEN 'minhash_only'
            ELSE 'simhash_only' END AS detector,
  CAST(count(*) AS BIGINT) AS n_pairs
FROM j GROUP BY 1
"""


def _neardup_keep_best_oracle() -> str:
    """End-to-end pipeline twin: clusters (recursive CTE over the
    minhash pairs) joined to quality, keep = per-cluster argmax of
    the 6dp-rounded score (ties -> min doc_id)."""
    return f"""
WITH cl AS ({_clusters_oracle()}),
q AS ({_quality_oracle()})
SELECT cl.doc_id, cl.cluster_id, q.quality_score,
  row_number() OVER (PARTITION BY cl.cluster_id
                     ORDER BY q.quality_score DESC, cl.doc_id ASC) = 1 AS keep
FROM cl JOIN q ON cl.doc_id = q.doc_id
"""


def _edit_distance_oracle() -> str:
    """Levenshtein verification twin over the minhash candidate
    pairs; DuckDB's levenshtein uses the same unit-cost edit model
    as Spark's."""
    return f"""
WITH pairs AS ({_minhash_oracle()})
SELECT p.doc_a, p.doc_b, p.jaccard,
  CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev_dist,
  round(1.0 - levenshtein(da.text, db.text)
              / greatest(length(da.text), length(db.text)), 6) AS lev_sim
FROM pairs p
JOIN documents da ON da.doc_id = p.doc_a
JOIN documents db ON db.doc_id = p.doc_b
"""


def _modality_qa_oracle(k: float = 3.0) -> str:
    return f"""
WITH q AS (SELECT doc_id, quality_score FROM ({_quality_oracle()})),
sp AS (SELECT vec_id FROM ({_norm_outliers_oracle(k)}))
SELECT d.doc_id, d.source, round(q.quality_score, 6) AS quality,
  (sp.vec_id IS NOT NULL) AS vector_outlier,
  q.quality_score < 0.8 AS text_low_quality
FROM documents d
JOIN q ON d.doc_id = q.doc_id
LEFT JOIN sp ON d.doc_id = sp.vec_id
WHERE sp.vec_id IS NOT NULL OR q.quality_score < 0.8
"""


def _label_separability_oracle(dim: int = 64) -> str:
    return f"""
WITH c AS (
  SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), dims AS (SELECT unnest(generate_series(1, {dim})) AS i),
m AS (
  SELECT label, i, round(avg(v[i]), 6) AS m
  FROM c CROSS JOIN dims GROUP BY 1, 2
)
SELECT a.label AS label_a, b.label AS label_b,
  round(sqrt(sum((a.m - b.m) * (a.m - b.m))), 6) AS centroid_dist
FROM m a JOIN m b ON a.i = b.i AND a.label < b.label
GROUP BY 1, 2
"""


def _norm_outliers_oracle(k: float = 3.0) -> str:
    return """
WITH e AS (
  SELECT vec_id, label,
    round(sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                CAST(embedding AS DOUBLE[]))), 6) AS l2_norm,
    round(list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                  x -> abs(x))), 6) AS spike
  FROM embeddings
), med AS (
  SELECT label, quantile_cont(spike, 0.5) AS label_median FROM e GROUP BY 1
), em AS (
  SELECT e.vec_id, e.label, e.l2_norm, e.spike, med.label_median
  FROM e JOIN med ON e.label = med.label
), mad AS (
  SELECT label, quantile_cont(abs(spike - label_median), 0.5) AS label_mad
  FROM em GROUP BY 1
)
SELECT em.vec_id, em.label, em.l2_norm, em.spike,
  round(em.label_median, 6) AS label_median, round(mad.label_mad, 6) AS label_mad
FROM em JOIN mad ON em.label = mad.label
WHERE abs(em.spike - em.label_median) > {k} * mad.label_mad
""".replace("{k}", str(k))


def _source_drift_oracle(n_buckets: int = 4096) -> str:
    return f"""
WITH occ AS (
  SELECT source,
    CAST(concat('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {n_buckets} AS bucket
  FROM (
    SELECT source, unnest({_norm_toks_sql()}) AS tok FROM documents
  )
), csb AS (
  SELECT source, bucket, count(*) AS cnt FROM occ GROUP BY 1, 2
), tot_s AS (SELECT source, sum(cnt) AS tot_s FROM csb GROUP BY 1),
cb AS (SELECT bucket, sum(cnt) AS cnt_c FROM csb GROUP BY 1),
tot_c AS (SELECT sum(cnt_c) AS tot_c FROM cb),
j AS (
  SELECT csb.source, tot_s.tot_s,
    CAST(round(1e9 * ((csb.cnt + 1) / CAST(tot_s.tot_s + {n_buckets} AS DOUBLE))
         * ln(((csb.cnt + 1) / CAST(tot_s.tot_s + {n_buckets} AS DOUBLE))
              / ((cb.cnt_c + 1) / CAST(tot_c.tot_c + {n_buckets} AS DOUBLE)))) AS BIGINT) AS c_nano
  FROM csb JOIN tot_s ON csb.source = tot_s.source
  JOIN cb ON csb.bucket = cb.bucket
  CROSS JOIN tot_c
)
SELECT source, CAST(min(tot_s) AS BIGINT) AS n_tokens,
  CAST(count(*) AS BIGINT) AS n_buckets_used,
  CAST(sum(c_nano) AS BIGINT) AS kl_nano,
  round(sum(c_nano) / 1e9, 6) AS kl
FROM j GROUP BY 1
"""


def _cross_split_leakage_oracle(window: int = 6) -> str:
    return f"""
WITH docs AS (SELECT doc_id, {_norm_toks_sql()} AS toks FROM documents),
starts AS (
  SELECT doc_id, toks,
    unnest(generate_series(1, greatest(len(toks), 1), {window})) AS i
  FROM docs
),
blocks AS (
  SELECT doc_id, md5(array_to_string(toks[i:i+{window - 1}], ' ')) AS h FROM starts
),
split AS (
  SELECT doc_id,
    CASE WHEN CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#split')), 1, 15)) AS BIGINT) % 1000 < 10 THEN 'test'
         WHEN CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#split')), 1, 15)) AS BIGINT) % 1000 < 20 THEN 'val'
         ELSE 'train' END AS split
  FROM documents
),
tagged AS (SELECT b.doc_id, s.split, b.h FROM blocks b JOIN split s ON b.doc_id = s.doc_id),
train_hashes AS (SELECT DISTINCT h FROM tagged WHERE split = 'train')
SELECT t.doc_id, t.split, CAST(count(*) AS BIGINT) AS n_leaked_windows
FROM tagged t JOIN train_hashes th ON t.h = th.h
WHERE t.split <> 'train'
GROUP BY 1, 2
"""


def _winnow_overlap_oracle(
    window: int = 8, keep_every: int = 4, min_shared: int = 2, df_cap: int = 200
) -> str:
    return f"""
WITH d AS (SELECT doc_id, {_norm_toks_sql()} AS toks FROM documents),
starts AS (
  SELECT doc_id, toks,
    unnest(list_filter(generate_series(1, greatest(len(toks) - {window - 1}, 1)),
                       i -> (i - 1) % {keep_every} = 0)) AS i
  FROM d
), fps AS (
  SELECT DISTINCT doc_id, md5(array_to_string(toks[i:i+{window - 1}], ' ')) AS fp
  FROM starts
), capped AS (
  SELECT doc_id, fp FROM fps
  WHERE fp IN (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {df_cap})
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(count(*) AS BIGINT) AS n_shared_fps
FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= {min_shared}
"""


def _fingerprint_oracle(window: int = 8, keep_every: int = 4) -> str:
    return f"""
WITH d AS (
  SELECT doc_id,
    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint,
    {_norm_toks_sql()} AS toks
  FROM documents
),
starts AS (
  SELECT doc_id, fingerprint, toks,
    unnest(list_filter(generate_series(1, greatest(len(toks) - {window - 1}, 1)),
                       i -> (i - 1) % {keep_every} = 0)) AS i
  FROM d
), fps AS (
  SELECT doc_id, fingerprint, i, md5(array_to_string(toks[i:i+{window - 1}], ' ')) AS fp
  FROM starts
)
SELECT doc_id, fingerprint, count(*) AS n_rolling_fps,
       min_by(fp, i) AS first_rolling_fp
FROM fps GROUP BY 1, 2
"""


def _repetition_filter_oracle(top_bigram_cap: float = 0.18, dup_trigram_cap: float = 0.30) -> str:
    return f"""
WITH docs AS (SELECT doc_id, {_norm_toks_sql()} AS toks FROM documents),
bi AS (
  SELECT doc_id, 2 AS n, array_to_string(toks[i:i+1], ' ') AS gram
  FROM (SELECT doc_id, toks,
        unnest(generate_series(1, greatest(len(toks) - 1, 1))) AS i FROM docs)
),
tri AS (
  SELECT doc_id, 3 AS n, array_to_string(toks[i:i+2], ' ') AS gram
  FROM (SELECT doc_id, toks,
        unnest(generate_series(1, greatest(len(toks) - 2, 1))) AS i FROM docs)
),
posting AS (SELECT * FROM bi UNION ALL SELECT * FROM tri),
counts AS (SELECT doc_id, n, gram, count(*) AS cnt FROM posting GROUP BY 1, 2, 3),
per_doc AS (
  SELECT doc_id,
    sum(CASE WHEN n = 2 THEN cnt ELSE 0 END) AS n_bigrams,
    max(CASE WHEN n = 2 THEN cnt ELSE 0 END) AS top_bigram_cnt,
    sum(CASE WHEN n = 3 THEN cnt ELSE 0 END) AS n_trigrams,
    sum(CASE WHEN n = 3 THEN 1 ELSE 0 END) AS n_tri_distinct
  FROM counts GROUP BY 1
)
SELECT doc_id,
  round(top_bigram_cnt / CAST(n_bigrams AS DOUBLE), 6) AS top_bigram_share,
  round((n_trigrams - n_tri_distinct) / CAST(n_trigrams AS DOUBLE), 6) AS dup_trigram_frac,
  (round(top_bigram_cnt / CAST(n_bigrams AS DOUBLE), 6) <= {top_bigram_cap}
   AND round((n_trigrams - n_tri_distinct) / CAST(n_trigrams AS DOUBLE), 6) <= {dup_trigram_cap}
  ) AS keep
FROM per_doc
"""


def _paragraph_dedup_oracle(window: int = 16) -> str:
    return f"""
WITH docs AS (SELECT doc_id, {_norm_toks_sql()} AS toks FROM documents),
starts AS (
  SELECT doc_id, toks,
    unnest(generate_series(1, greatest(len(toks), 1), {window})) AS i
  FROM docs
),
blocks AS (
  SELECT doc_id, i, md5(array_to_string(toks[i:i+{window - 1}], ' ')) AS h FROM starts
),
flagged AS (
  SELECT doc_id,
    (row_number() OVER (PARTITION BY h ORDER BY doc_id ASC, i ASC) = 1) AS keep
  FROM blocks
)
SELECT doc_id, count(*) AS n_windows,
  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  round(sum(CASE WHEN keep THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS kept_frac
FROM flagged GROUP BY 1
"""


def _cross_source_overlap_oracle(window: int = 16) -> str:
    return f"""
WITH docs AS (SELECT source, {_norm_toks_sql()} AS toks FROM documents),
starts AS (
  SELECT source, toks,
    unnest(generate_series(1, greatest(len(toks), 1), {window})) AS i
  FROM docs
),
blocks AS (
  SELECT DISTINCT source, md5(array_to_string(toks[i:i+{window - 1}], ' ')) AS h FROM starts
),
totals AS (SELECT source, count(*) AS n_windows FROM blocks GROUP BY 1),
shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS shared_windows
  FROM blocks a JOIN blocks b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, shared_windows,
  ta.n_windows AS n_windows_a, tb.n_windows AS n_windows_b,
  round(shared_windows / CAST(least(ta.n_windows, tb.n_windows) AS DOUBLE), 6) AS overlap_coef
FROM shared
JOIN totals ta ON ta.source = shared.source_a
JOIN totals tb ON tb.source = shared.source_b
"""


def _quality_classifier_oracle(threshold: float = 0.5) -> str:
    from .functions.textfns import STOPWORDS_EN

    stop = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
WITH d AS (
  SELECT doc_id, text, {_norm_toks_sql()} AS toks FROM documents
), feat AS (
  SELECT doc_id,
    least(CAST(len(toks) AS DOUBLE), 2000.0) / 2000.0 AS len_feat,
    len(list_filter(toks, t -> list_contains([{stop}], t)))
      / greatest(len(toks), 1) AS stopword_ratio,
    length(regexp_replace(text, '[^\\.\\,\\;\\:\\!\\?]', '', 'g'))
      / greatest(length(text), 1) AS punct_ratio,
    1.0 - len(list_distinct(toks)) / greatest(len(toks), 1) AS repetition_ratio
  FROM d
), scored AS (
  SELECT doc_id,
    least(1.0, greatest(0.0,
      ((((0.15 + 0.9 * len_feat) + 1.5 * stopword_ratio) - 2.0 * punct_ratio)
        - 1.2 * repetition_ratio))) AS p
  FROM feat
)
SELECT doc_id, round(p, 6) AS quality_prob, p >= {threshold} AS keep FROM scored
"""


def _cluster_mixing_oracle(k: int = 8, n_iter: int = 2) -> str:
    """Mixing-weight twin over the kmeans assignment CTEs."""
    return f"""
WITH {_kmeans_ctes(k, n_iter)},
pc AS (SELECT cluster, count(*) AS n_vecs FROM a{n_iter} GROUP BY 1),
tot AS (SELECT sum(n_vecs) AS total, count(*) AS n_clusters FROM pc)
SELECT pc.cluster, CAST(pc.n_vecs AS BIGINT) AS n_vecs,
  round(pc.n_vecs / tot.total, 6) AS share,
  round((tot.total / tot.n_clusters) / pc.n_vecs, 6) AS weight,
  round(least(1.0, (tot.total / tot.n_clusters) / pc.n_vecs), 6) AS sample_prob
FROM pc, tot
"""


def _kmeans_ctes(k: int = 8, n_iter: int = 2, dim: int = 64) -> str:
    """Unrolled Lloyd iterations mirroring clustering.kmeans_embeddings:
    same deterministic init (first k vectors), 6dp-rounded distances
    (ties on centroid id) and 6dp-rounded recomputed centroids, so
    both engines walk the identical centroid sequence. Returns the
    CTE chain (no WITH keyword); the final assignment lives in
    ``a{n_iter}`` with columns (vec_id, vec, cluster, d2)."""
    d2 = (
        "round(list_dot_product(vec, vec) - 2 * list_dot_product(vec, c_vec)"
        " + list_dot_product(c_vec, c_vec), 6)"
    )
    ctes = [
        f"corpus AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings)",
        f"dims AS (SELECT unnest(generate_series(1, {dim})) AS i)",
        f"c0 AS (SELECT vec_id AS c_id, vec AS c_vec FROM corpus WHERE vec_id < {k})",
    ]
    for it in range(1, n_iter + 1):
        ctes.append(
            f"""s{it} AS (
  SELECT vec_id, vec, c_id, {d2} AS d2 FROM corpus CROSS JOIN c{it - 1}
)"""
        )
        ctes.append(
            f"""a{it} AS (
  SELECT vec_id, vec, c_id AS cluster, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_id ASC) AS rn
    FROM s{it}
  ) WHERE rn = 1
)"""
        )
        if it < n_iter:
            ctes.append(
                f"""m{it} AS (
  SELECT cluster AS c_id, i, round(avg(vec[i]), 6) AS m
  FROM a{it} CROSS JOIN dims GROUP BY 1, 2
)"""
            )
            ctes.append(f"c{it} AS (SELECT c_id, list(m ORDER BY i) AS c_vec FROM m{it} GROUP BY 1)")
    return ",\n".join(ctes)


def _kmeans_oracle(k: int = 8, n_iter: int = 2, dim: int = 64) -> str:
    return (
        "WITH "
        + _kmeans_ctes(k, n_iter, dim)
        + f"\nSELECT vec_id, CAST(cluster AS BIGINT) AS cluster, d2 FROM a{n_iter}\n"
    )


def _semdedup_oracle(k: int = 8, n_iter: int = 2, threshold: float = 0.35) -> str:
    """SemDeDup twin: identical unrolled k-means assignment, then
    within-cluster cosine pairs at 6dp — keep iff no close neighbor
    with a smaller vec_id."""
    return f"""
WITH {_kmeans_ctes(k, n_iter)},
members AS (SELECT vec_id, cluster, vec FROM a{n_iter}),
close AS (
  SELECT x.vec_id, y.vec_id AS nb
  FROM members x JOIN members y
    ON x.cluster = y.cluster AND x.vec_id <> y.vec_id
  WHERE round(list_cosine_similarity(x.vec, y.vec), 6) >= {threshold}
)
SELECT m.vec_id, CAST(m.cluster AS BIGINT) AS cluster,
  CAST(count(c.nb) AS BIGINT) AS n_close,
  (min(CASE WHEN c.nb < m.vec_id THEN c.nb END) IS NULL) AS keep
FROM members m LEFT JOIN close c ON m.vec_id = c.vec_id
GROUP BY 1, 2
"""


def _scd2_oracle() -> str:
    return """
WITH seq AS (
  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
    lag(o_orderpriority) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev
  FROM orders
),
changed AS (
  SELECT * FROM seq WHERE prev IS NULL OR prev <> o_orderpriority
),
iv AS (
  SELECT o_custkey, o_orderpriority, o_orderdate,
    lead(o_orderdate) OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate ASC, o_orderkey ASC) AS nxt
  FROM changed
)
SELECT o_custkey AS custkey, o_orderpriority AS priority,
  strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
  strftime(nxt - INTERVAL 1 DAY, '%Y-%m-%d') AS valid_to,
  (nxt IS NULL) AS is_current
FROM iv
"""


def _triangles_oracle() -> str:
    return """
WITH os AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
edges AS (
  SELECT DISTINCT a.l_suppkey AS u, b.l_suppkey AS v
  FROM os a JOIN os b ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
),
tri AS (
  SELECT e1.u AS tu, e1.v AS tv, e2.v AS tw
  FROM edges e1
  JOIN edges e2 ON e1.v = e2.u
  JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
),
pn AS (
  SELECT node, count(*) AS triangles FROM (
    SELECT tu AS node FROM tri
    UNION ALL SELECT tv FROM tri
    UNION ALL SELECT tw FROM tri
  ) GROUP BY 1
),
deg AS (
  SELECT node, count(*) AS degree FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
  ) GROUP BY 1
)
SELECT s.s_suppkey,
  CAST(coalesce(d.degree, 0) AS BIGINT) AS degree,
  CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
  round(CASE WHEN coalesce(d.degree, 0) >= 2
        THEN 2.0 * coalesce(p.triangles, 0) / (d.degree * (d.degree - 1))
        ELSE 0.0 END, 6) AS clustering
FROM supplier s
LEFT JOIN deg d ON s.s_suppkey = d.node
LEFT JOIN pn p ON s.s_suppkey = p.node
"""


def _copurchase_oracle(min_pairs: int = 3) -> str:
    return f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey, p.p_brand AS brand
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
singles AS (SELECT brand, count(*) AS n_single FROM baskets GROUP BY 1),
no AS (SELECT count(*) AS n_orders FROM orders),
pairs AS (
  SELECT a.brand AS brand_a, b.brand AS brand_b, count(*) AS n_pair
  FROM baskets a
  JOIN baskets b ON a.l_orderkey = b.l_orderkey AND a.brand < b.brand
  GROUP BY 1, 2
  HAVING count(*) >= {min_pairs}
)
SELECT pr.brand_a, pr.brand_b, CAST(pr.n_pair AS BIGINT) AS n_pair,
  CAST({_ppm_sql('pr.n_pair', 'no.n_orders')} AS BIGINT) AS support_ppm,
  CAST({_ppm_sql('pr.n_pair', 'sa.n_single')} AS BIGINT) AS confidence_ppm,
  CAST({_ppm_sql('(pr.n_pair * no.n_orders)', '(sa.n_single * sb.n_single)')} AS BIGINT) AS lift_e6
FROM pairs pr
JOIN singles sa ON pr.brand_a = sa.brand
JOIN singles sb ON pr.brand_b = sb.brand
CROSS JOIN no
"""


def _equi_depth_oracle(buckets: int = 20) -> str:
    return f"""
WITH r AS (
  SELECT l_extendedprice AS price,
    row_number() OVER (ORDER BY l_extendedprice, l_orderkey * 8 + l_linenumber) AS rnk,
    count(*) OVER () AS n
  FROM lineitem
)
SELECT CAST(((rnk - 1) * {buckets}) // n AS INT) AS bucket,
  CAST(count(*) AS BIGINT) AS n_rows,
  round(min(price), 2) AS price_lo,
  round(max(price), 2) AS price_hi,
  round(avg(price), 6) AS avg_price
FROM r GROUP BY 1
"""


def _table_stats_oracle() -> str:
    from .operators.relational7 import _PROFILE_TABLES

    parts = []
    for tname, cols in _PROFILE_TABLES.items():
        aggs = ["count(*) AS _n"]
        sels = []
        for c, kind in cols:
            aggs.append(f"count({c}) AS c_{c}")
            aggs.append(f"count(DISTINCT {c}) AS d_{c}")
            if kind == "num":
                aggs.append(f"round(CAST(min({c}) AS DOUBLE), 6) AS mn_{c}")
                aggs.append(f"round(CAST(max({c}) AS DOUBLE), 6) AS mx_{c}")
                mn, mx = f"mn_{c}", f"mx_{c}"
            elif kind == "ts":
                aggs.append(f"round(CAST(floor(epoch(min({c}))) AS DOUBLE), 6) AS mn_{c}")
                aggs.append(f"round(CAST(floor(epoch(max({c}))) AS DOUBLE), 6) AS mx_{c}")
                mn, mx = f"mn_{c}", f"mx_{c}"
            else:
                mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            sels.append(
                f"SELECT '{tname}' AS table_name, '{c}' AS column_name, "
                f"CAST(_n AS BIGINT) AS n_rows, CAST(_n - c_{c} AS BIGINT) AS n_nulls, "
                f"CAST(d_{c} AS BIGINT) AS n_distinct, {mn} AS min_num, {mx} AS max_num "
                f"FROM agg_{tname}"
            )
        parts.append((tname, ",\n    ".join(aggs), sels))
    ctes = ",\n".join(
        f"agg_{t} AS (SELECT {a} FROM {t})" for t, a, _ in parts
    )
    unions = "\nUNION ALL ".join(s for _, _, sels in parts for s in sels)
    return f"WITH {ctes}\n{unions}"


def _attribution_oracle(lookback_days: int = 7) -> str:
    return f"""
WITH p AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id AS t_user, event_id AS t_id, ts AS t_ts, event_type AS t_type
  FROM events WHERE event_type IN ('click', 'view')
),
j AS (
  SELECT p.p_id, t.t_ts, t.t_id, t.t_type,
    row_number() OVER (PARTITION BY p.p_id ORDER BY t.t_ts ASC, t.t_id ASC) AS rn_a,
    row_number() OVER (PARTITION BY p.p_id ORDER BY t.t_ts DESC, t.t_id DESC) AS rn_d
  FROM p JOIN t ON p.p_user = t.t_user
    AND t.t_ts < p.p_ts
    AND t.t_ts >= p.p_ts - INTERVAL {lookback_days} DAY
),
a AS (
  SELECT p_id, count(*) AS n_touches,
    max(CASE WHEN rn_a = 1 THEN t_type END) AS first_touch_type,
    max(CASE WHEN rn_d = 1 THEN t_type END) AS last_touch_type,
    max(CASE WHEN rn_a = 1 THEN t_ts END) AS first_touch_ts
  FROM j GROUP BY 1
)
SELECT p.p_id AS purchase_event_id, p.p_user AS user_id, p.p_ts AS purchase_ts,
  round(p.p_value, 2) AS purchase_value,
  CAST(coalesce(a.n_touches, 0) AS BIGINT) AS n_touches,
  a.first_touch_type, a.last_touch_type,
  CAST(floor(epoch(p.p_ts)) - floor(epoch(a.first_touch_ts)) AS BIGINT)
    AS secs_to_convert
FROM p LEFT JOIN a ON p.p_id = a.p_id
"""


def _ewma_oracle(alpha: float = 0.3, k: int = 16) -> str:
    # fixed-point integer-cent recursion — see ewma_user_value: a
    # float fold drifts by engine FMA differences at scale
    a10 = int(round(alpha * 10))
    return f"""
WITH framed AS (
  SELECT event_id, user_id, ts, value,
    list(CAST(round(value * 100) AS BIGINT)) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN {k - 1} PRECEDING AND CURRENT ROW) AS frame
  FROM events
)
SELECT event_id, user_id, ts, round(value, 2) AS value,
  round(CAST(list_reduce(frame,
      (acc, x) -> CAST(floor((acc * {10 - a10} + x * {a10} + 5) / 10) AS BIGINT)
    ) AS DOUBLE) / 100.0, 6) AS ewma_{k}
FROM framed
"""


def _cooccurrence_pmi_oracle(window: int = 2, min_pairs: int = 5) -> str:
    shifts = "\n  UNION ALL ".join(
        f"SELECT unnest(t[1:len(t)-{d}]) AS term_a, unnest(t[{d + 1}:len(t)]) AS term_b FROM toks"
        for d in range(1, window + 1)
    )
    return f"""
WITH toks AS (SELECT {_norm_toks_sql()} AS t FROM documents),
pairs AS (
  {shifts}
),
pc AS (
  SELECT term_a, term_b, count(*) AS n_pair FROM pairs GROUP BY 1, 2
  HAVING count(*) >= {min_pairs}
),
tp AS (SELECT count(*) AS tp FROM pairs),
uni AS (
  SELECT term, count(*) AS n_term
  FROM (SELECT unnest(t) AS term FROM toks) GROUP BY 1
),
tt AS (SELECT sum(n_term) AS tt FROM uni)
SELECT pc.term_a, pc.term_b, CAST(pc.n_pair AS BIGINT) AS n_pair,
  round(log2((pc.n_pair / tp.tp)
             / ((ua.n_term / tt.tt) * (ub.n_term / tt.tt))), 6) AS pmi
FROM pc
JOIN uni ua ON pc.term_a = ua.term
JOIN uni ub ON pc.term_b = ub.term
CROSS JOIN tp CROSS JOIN tt
"""


def _feature_hash_oracle(n_buckets: int = 64) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_norm_toks_sql()}) AS term FROM documents
),
h AS (
  SELECT doc_id, term,
    CAST(concat('0x', substr(md5(term), 1, 15)) AS BIGINT) % {n_buckets} AS bucket
  FROM tok
)
SELECT doc_id, CAST(bucket AS INT) AS bucket,
  CAST(count(*) AS BIGINT) AS tf,
  CAST(count(DISTINCT term) AS BIGINT) AS n_terms
FROM h GROUP BY 1, 2
"""


def _pca_ctes(dim: int, n_iter: int) -> tuple[str, str]:
    """Shared power-iteration CTE chain (mom/cov/v0..vN); returns
    (cte_sql, final_vector_name)."""
    moments = ",\n    ".join(
        f"avg(CAST(embedding[{i+1}] AS DOUBLE) * CAST(embedding[{j+1}] AS DOUBLE)) AS p{i}_{j}"
        for i in range(dim)
        for j in range(i, dim)
    )
    means = ",\n    ".join(
        f"avg(CAST(embedding[{i+1}] AS DOUBLE)) AS m{i}" for i in range(dim)
    )
    cov_rows = "\n  UNION ALL ".join(
        f"SELECT {i} AS i, {j} AS j, round(p{min(i,j)}_{max(i,j)} - m{min(i,j)} * m{max(i,j)}, 6) AS c FROM mom"
        for i in range(dim)
        for j in range(dim)
    )
    v0 = round(1.0 / dim**0.5, 6)
    v_rows = "\n  UNION ALL ".join(f"SELECT {j} AS j, {v0} AS x" for j in range(dim))
    iters = []
    prev = "v0"
    for t in range(1, n_iter + 1):
        iters.append(
            f"w{t} AS (SELECT cov.i, round(sum(cov.c * {prev}.x), 6) AS wx "
            f"FROM cov JOIN {prev} ON cov.j = {prev}.j GROUP BY 1),\n"
            f"n{t} AS (SELECT sqrt(sum(wx * wx)) AS nn FROM w{t}),\n"
            f"v{t} AS (SELECT w{t}.i AS j, round(w{t}.wx / n{t}.nn, 6) AS x "
            f"FROM w{t} CROSS JOIN n{t})"
        )
        prev = f"v{t}"
    iter_sql = ",\n".join(iters)
    # MATERIALIZED: DuckDB inlines CTEs by default, which would re-run
    # the corpus moment aggregate once per cov row (dim^2 scans)
    ctes = f"""mom AS MATERIALIZED (
  SELECT {means},
    {moments}
  FROM embeddings
),
cov AS MATERIALIZED (
  {cov_rows}
),
v0 AS (
  {v_rows}
),
{iter_sql}"""
    return ctes, prev


def _pca_oracle(dim: int = 8, n_iter: int = 4) -> str:
    ctes, prev = _pca_ctes(dim, n_iter)
    return f"""
WITH {ctes},
cv AS (
  SELECT cov.i, round(sum(cov.c * {prev}.x), 6) AS cv
  FROM cov JOIN {prev} ON cov.j = {prev}.j GROUP BY 1
),
lam AS (
  SELECT round(sum(cv.cv * v.x), 6) AS eigenvalue
  FROM cv JOIN {prev} v ON cv.i = v.j
)
SELECT CAST(v.j AS INT) AS dim_i, v.x AS loading, lam.eigenvalue
FROM {prev} v CROSS JOIN lam
"""


def _bpe_iter_ctes(n_merges: int):
    """Shared unrolled BPE iteration CTEs (p{t}/t{t}/v{t}); returns
    (iter_sql, final_vocab_name, final_selects)."""
    iters = []
    finals = []
    prev = "v0"
    for t in range(1, n_merges + 1):
        iters.append(
            f"""p{t} AS (
  SELECT a, b, sum(freq) AS pair_freq FROM (
    SELECT freq,
      unnest(sl[1:len(sl)-1]) AS a,
      unnest(sl[2:len(sl)]) AS b
    FROM (SELECT freq, string_split(trim(sym), '  ') AS sl FROM {prev})
  ) GROUP BY 1, 2
),
t{t} AS MATERIALIZED (
  SELECT a AS pair_left, b AS pair_right, pair_freq
  FROM p{t} ORDER BY pair_freq DESC, a ASC, b ASC LIMIT 1
),
v{t} AS MATERIALIZED (
  SELECT word, freq,
    replace(sym,
            concat(' ', t{t}.pair_left, '  ', t{t}.pair_right, ' '),
            concat(' ', t{t}.pair_left, t{t}.pair_right, ' ')) AS sym
  FROM {prev} CROSS JOIN t{t}
)"""
        )
        finals.append(
            f"SELECT {t} AS merge_rank, pair_left, pair_right, "
            f"concat(pair_left, pair_right) AS merged, "
            f"CAST(pair_freq AS BIGINT) AS pair_freq FROM t{t}"
        )
        prev = f"v{t}"
    return ",\n".join(iters), prev, finals


def _bpe_merges_oracle(n_merges: int = 5) -> str:
    iter_sql, _last, finals = _bpe_iter_ctes(n_merges)
    final_sql = "\nUNION ALL ".join(finals)
    return f"""
WITH words AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest({_norm_toks_sql()}) AS word FROM documents
  ) WHERE word <> '' GROUP BY 1
),
v0 AS MATERIALIZED (
  SELECT word, freq,
    concat(' ', array_to_string(string_split(word, ''), '  '), ' ') AS sym
  FROM words
),
{iter_sql}
{final_sql}
"""


def _bm25_oracle(
    query_terms: tuple = ("fast", "join", "stream"),
    k1: float = 1.2,
    b: float = 0.75,
    topn: int = 20,
) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, {_norm_toks_sql()} AS t FROM documents
),
lens AS (SELECT doc_id, len(t) AS dl FROM toks),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM lens),
postings AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(t) AS term FROM toks
  ) WHERE term IN ({terms}) GROUP BY 1, 2
),
dft AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
scored AS (
  SELECT p.doc_id,
    round(sum(
      ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
      * (p.tf * ({k1} + 1.0)
         / (p.tf + {k1} * (1.0 - {b} + {b} * l.dl / s.avgdl)))
    ), 6) AS score,
    count(*) AS n_matched_terms
  FROM postings p
  JOIN lens l USING (doc_id)
  JOIN dft d USING (term)
  CROSS JOIN stats s
  GROUP BY 1
)
SELECT doc_id, score, CAST(n_matched_terms AS BIGINT) AS n_matched_terms
FROM scored ORDER BY score DESC, doc_id ASC LIMIT {topn}
"""


def _rrf_oracle(k: int = 5, c: int = 60) -> str:
    return f"""
WITH lsh AS MATERIALIZED ({_ann_lsh_oracle()}),
ivf AS MATERIALIZED ({_ann_ivf_oracle()}),
both_lists AS (
  SELECT coalesce(l.q_id, i.q_id) AS q_id,
    coalesce(l.neighbor_id, i.neighbor_id) AS neighbor_id,
    l.rank AS lsh_rank, i.rank AS ivf_rank
  FROM lsh l FULL OUTER JOIN ivf i
    ON l.q_id = i.q_id AND l.neighbor_id = i.neighbor_id
),
scored AS (
  SELECT q_id, neighbor_id, lsh_rank, ivf_rank,
    round(coalesce(1.0 / ({c} + lsh_rank), 0.0)
        + coalesce(1.0 / ({c} + ivf_rank), 0.0), 6) AS rrf_score
  FROM both_lists
),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY q_id ORDER BY rrf_score DESC, neighbor_id ASC
  ) AS fused_rank
  FROM scored
)
SELECT q_id, CAST(fused_rank AS INT) AS fused_rank, neighbor_id,
  rrf_score, lsh_rank, ivf_rank
FROM ranked WHERE fused_rank <= {k}
"""


_DAILY_GRID_SQL = """
bounds AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
days AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                                            INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n FROM events GROUP BY 1, 2
),
grid AS (
  SELECT g.day, g.event_type, coalesce(d.n, 0) AS n
  FROM (SELECT day, event_type FROM days, types) g
  LEFT JOIN daily d ON g.day = d.day AND g.event_type = d.event_type
)"""


def _seasonal_oracle() -> str:
    return f"""
WITH {_DAILY_GRID_SQL},
base AS (
  SELECT day, event_type, n,
    CAST((day - DATE '1970-01-05') % 7 AS INT) AS weekday,
    count(*) OVER w7 AS w_n,
    round(avg(n) OVER w7, 6) AS trend_raw
  FROM grid
  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
                ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
b2 AS (
  SELECT day, event_type, n, weekday,
    CASE WHEN w_n = 7 THEN trend_raw END AS trend
  FROM base
),
seas AS (
  SELECT event_type, weekday, round(avg(n - trend), 6) AS seasonal
  FROM b2 WHERE trend IS NOT NULL GROUP BY 1, 2
)
SELECT strftime(b2.day, '%Y-%m-%d') AS day, b2.event_type,
  CAST(b2.n AS BIGINT) AS n, b2.weekday, b2.trend, s.seasonal,
  round(b2.n - b2.trend - s.seasonal, 6) AS residual
FROM b2 LEFT JOIN seas s
  ON b2.event_type = s.event_type AND b2.weekday = s.weekday
"""


def _cusum_oracle() -> str:
    return f"""
WITH {_DAILY_GRID_SQL},
stats AS (SELECT event_type, avg(n) AS mu FROM grid GROUP BY 1),
d AS (
  SELECT g.day, g.event_type, g.n,
    round(sum(g.n - s.mu) OVER (PARTITION BY g.event_type ORDER BY g.day
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) + 0.0 AS cusum
  FROM grid g JOIN stats s ON g.event_type = s.event_type
),
p AS (
  SELECT *, max(abs(cusum)) OVER (PARTITION BY event_type) AS peak FROM d
),
f AS (
  SELECT *, sum(CASE WHEN abs(cusum) = peak THEN 1 ELSE 0 END) OVER (
    PARTITION BY event_type ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_peaks_so_far
  FROM p
)
SELECT strftime(day, '%Y-%m-%d') AS day, event_type,
  CAST(n AS BIGINT) AS n, cusum,
  (abs(cusum) = peak AND n_peaks_so_far = 1) AS is_changepoint
FROM f
"""


def _corr_matrix_oracle() -> str:
    from .operators.relational7 import _CORR_COLS as cols

    aggs = []
    for i, c in enumerate(cols):
        aggs.append(f"avg(CAST({c} AS DOUBLE)) AS m{i}")
        for j in range(i, len(cols)):
            aggs.append(
                f"avg(CAST({c} AS DOUBLE) * CAST({cols[j]} AS DOUBLE)) AS p{i}_{j}"
            )
    rows = []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            rows.append(
                f"SELECT '{cols[i]}' AS col_a, '{cols[j]}' AS col_b, "
                f"round((p{i}_{j} - m{i} * m{j}) / "
                f"(sqrt(p{i}_{i} - m{i} * m{i}) * sqrt(p{j}_{j} - m{j} * m{j})), 6) "
                f"AS corr FROM mom"
            )
    agg_sql = ",\n    ".join(aggs)
    rows_sql = "\n  UNION ALL ".join(rows)
    return f"""
WITH mom AS MATERIALIZED (
  SELECT {agg_sql}
  FROM lineitem
)
{rows_sql}
"""


def _join_key_skew_oracle(key: str = "l_partkey", topn: int = 10) -> str:
    return f"""
WITH per_key AS (SELECT {key} AS key, count(*) AS n_rows FROM lineitem GROUP BY 1),
stats AS (
  SELECT count(*) AS n_keys, sum(n_rows) AS n_total, avg(n_rows) AS mean_rows
  FROM per_key
),
top AS (SELECT key, n_rows FROM per_key ORDER BY n_rows DESC, key ASC LIMIT {topn})
SELECT CAST(row_number() OVER (ORDER BY n_rows DESC, key ASC) AS INT) AS rank,
  key, CAST(n_rows AS BIGINT) AS n_rows,
  round(n_rows / s.n_total, 6) AS row_share,
  round(n_rows / s.mean_rows, 6) AS skew_ratio,
  CAST(s.n_keys AS BIGINT) AS n_keys_total
FROM top CROSS JOIN stats s
"""


def _bpe_tokenize_oracle(n_merges: int = 5) -> str:
    iter_sql, last, _finals = _bpe_iter_ctes(n_merges)
    return f"""
WITH words_src AS MATERIALIZED (
  SELECT source, word, count(*) AS freq FROM (
    SELECT source, unnest({_norm_toks_sql()}) AS word FROM documents
  ) WHERE word <> '' GROUP BY 1, 2
),
words AS MATERIALIZED (
  SELECT word, sum(freq) AS freq FROM words_src GROUP BY 1
),
v0 AS MATERIALIZED (
  SELECT word, freq,
    concat(' ', array_to_string(string_split(word, ''), '  '), ' ') AS sym
  FROM words
),
{iter_sql}
SELECT ws.source,
  CAST(sum(ws.freq) AS BIGINT) AS n_words,
  CAST(sum(ws.freq * len(string_split(trim(v.sym), '  '))) AS BIGINT) AS n_bpe_tokens,
  round(sum(ws.freq * len(string_split(trim(v.sym), '  '))) / sum(ws.freq), 6)
    AS fertility
FROM words_src ws JOIN {last} v USING (word)
GROUP BY 1
"""


def _ab_test_oracle() -> str:
    return """
WITH per_user AS (
  SELECT user_id,
    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchases
  FROM events GROUP BY 1
),
avg_p AS (SELECT avg(n_purchases) AS avg_p FROM per_user),
users AS (
  SELECT user_id,
    CAST(n_purchases > a.avg_p AS INT) AS converted
  FROM per_user CROSS JOIN avg_p a
),
armed AS (
  SELECT CASE WHEN CAST(concat('0x',
      substr(md5(CAST(user_id AS VARCHAR) || '#ab'), 1, 15)) AS BIGINT) % 2 = 0
    THEN 'A' ELSE 'B' END AS arm, converted
  FROM users
),
arms AS (
  SELECT arm, count(*) AS n_users, sum(converted) AS n_converted
  FROM armed GROUP BY 1
),
wide AS (
  SELECT
    max(CASE WHEN arm = 'A' THEN n_users END) AS a_n,
    max(CASE WHEN arm = 'A' THEN n_converted END) AS a_c,
    max(CASE WHEN arm = 'B' THEN n_users END) AS b_n,
    max(CASE WHEN arm = 'B' THEN n_converted END) AS b_c
  FROM arms
),
z AS (
  SELECT round(CASE WHEN
    sqrt(((a_c + b_c) / (a_n + b_n)) * (1.0 - (a_c + b_c) / (a_n + b_n))
         * (1.0 / a_n + 1.0 / b_n)) > 0.0
    THEN ((a_c / a_n) - (b_c / b_n))
         / sqrt(((a_c + b_c) / (a_n + b_n)) * (1.0 - (a_c + b_c) / (a_n + b_n))
                * (1.0 / a_n + 1.0 / b_n)) END, 6) AS z_stat
  FROM wide
)
SELECT arm, CAST(n_users AS BIGINT) AS n_users,
  CAST(n_converted AS BIGINT) AS n_converted,
  CAST({{PPM_CONV}} AS BIGINT) AS conv_rate_ppm, z.z_stat
FROM arms CROSS JOIN z
""".replace("{{PPM_CONV}}", _ppm_sql("n_converted", "n_users"))


def _neighbor_jaccard_oracle(min_common: int = 2, basket_cap: int = 1000) -> str:
    # basket_cap mirrors the Spark operator's super-customer guard:
    # hub customers above the cap leave the graph entirely
    return f"""
WITH sc0 AS (
  SELECT DISTINCT l.l_suppkey AS s, o.o_custkey AS c
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
keepc AS (SELECT c FROM sc0 GROUP BY c HAVING count(*) <= {basket_cap}),
sc AS MATERIALIZED (SELECT sc0.s, sc0.c FROM sc0 JOIN keepc USING (c)),
common AS (
  SELECT a.s AS supp_a, b.s AS supp_b, count(*) AS n_common
  FROM sc a JOIN sc b ON a.c = b.c AND a.s < b.s
  GROUP BY 1, 2
  HAVING count(*) >= {min_common}
),
sizes AS (SELECT s, count(*) AS n_cust FROM sc GROUP BY 1)
SELECT cm.supp_a, cm.supp_b, CAST(cm.n_common AS BIGINT) AS n_common,
  CAST({_ppm_sql('cm.n_common', '(sa.n_cust + sb.n_cust - cm.n_common)')} AS BIGINT)
    AS jaccard_ppm
FROM common cm
JOIN sizes sa ON cm.supp_a = sa.s
JOIN sizes sb ON cm.supp_b = sb.s
"""


def _pca_projection_oracle(
    dim: int = 8, n_iter: int = 4, z_cap: float = 3.0
) -> str:
    ctes, prev = _pca_ctes(dim, n_iter)
    wide_cols = ",\n    ".join(
        f"max(CASE WHEN j = {j} THEN x END) AS x{j}" for j in range(dim)
    )
    dot = " + ".join(
        f"w.x{j} * CAST(e.embedding[{j + 1}] AS DOUBLE)" for j in range(dim)
    )
    return f"""
WITH {ctes},
wide AS (
  SELECT {wide_cols}
  FROM {prev}
),
projected AS MATERIALIZED (
  SELECT e.vec_id, e.label, round({dot}, 6) AS proj
  FROM embeddings e CROSS JOIN wide w
),
stats AS (SELECT avg(proj) AS mu, stddev_pop(proj) AS sd FROM projected)
SELECT p.vec_id, p.label, p.proj,
  round(CASE WHEN s.sd > 0 THEN (p.proj - s.mu) / s.sd END, 6) AS z_score,
  (abs(round(CASE WHEN s.sd > 0 THEN (p.proj - s.mu) / s.sd END, 6)) > {z_cap}) AS is_outlier
FROM projected p CROSS JOIN stats s
"""


def _lsh_recall_oracle(threshold: float = 0.5, sample_pct: int = 40) -> str:
    # same deterministic md5 doc sample as the Spark operator: BOTH
    # the LSH index side and the exact ground-truth side run on the
    # sampled corpus (unbiased recall; bounded all-pairs cost)
    src = (
        "(SELECT * FROM documents WHERE"
        " CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#lshrecall')), 1, 15)) AS BIGINT)"
        f" % 100 < {sample_pct})"
    )
    return f"""
WITH lshp AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({_minhash_oracle(threshold=threshold, source=src)})
),
{_shingle_cte(3, source=src)},
sd AS MATERIALIZED (SELECT DISTINCT doc_id, s FROM shing),
sizes AS (SELECT doc_id, count(*) AS n FROM sd GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM sd a JOIN sd b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
exact AS (
  SELECT inter.doc_a, inter.doc_b FROM inter
  JOIN sizes sa ON inter.doc_a = sa.doc_id
  JOIN sizes sb ON inter.doc_b = sb.doc_id
  WHERE inter.i / (sa.n + sb.n - inter.i) >= {threshold}
),
j AS (
  SELECT e.doc_a, e.doc_b,
    CASE WHEN l.doc_a IS NOT NULL THEN 1 END AS hit
  FROM exact e LEFT JOIN lshp l ON e.doc_a = l.doc_a AND e.doc_b = l.doc_b
),
cnt AS (
  SELECT count(*) AS n_exact, coalesce(sum(hit), 0) AS n_caught FROM j
),
nl AS (SELECT count(*) AS n_lsh FROM lshp)
SELECT CAST(cnt.n_exact AS BIGINT) AS n_exact_pairs,
  CAST(nl.n_lsh AS BIGINT) AS n_lsh_pairs,
  CAST(cnt.n_caught AS BIGINT) AS n_caught,
  CASE WHEN cnt.n_exact > 0
       THEN CAST({_ppm_sql('cnt.n_caught', 'cnt.n_exact')} AS BIGINT) END AS recall_ppm
FROM cnt CROSS JOIN nl
"""


def _pr_curve_oracle() -> str:
    thresholds = ", ".join(f"CAST(0.{t} AS DOUBLE)" for t in range(1, 10))
    return f"""
WITH scored AS (
  SELECT doc_id, quality_prob FROM ({_quality_classifier_oracle()})
),
gold AS (
  SELECT doc_id FROM ({_corpus_filter_oracle()})
),
base AS (
  SELECT s.quality_prob,
    CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END AS gold
  FROM scored s LEFT JOIN gold g ON s.doc_id = g.doc_id
),
grid AS (SELECT unnest([{thresholds}]) AS threshold),
g AS (SELECT b.quality_prob, b.gold, grid.threshold FROM base b CROSS JOIN grid),
agg AS (
  SELECT threshold,
    sum(CASE WHEN quality_prob >= threshold THEN gold ELSE 0 END) AS tp,
    sum(CASE WHEN quality_prob >= threshold THEN 1 - gold ELSE 0 END) AS fp,
    sum(CASE WHEN quality_prob < threshold THEN gold ELSE 0 END) AS fn
  FROM g GROUP BY 1
)
SELECT round(threshold, 1) AS threshold,
  CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
  CASE WHEN tp + fp > 0
       THEN CAST({_ppm_sql('tp', '(tp + fp)')} AS BIGINT) END AS precision_ppm,
  CASE WHEN tp + fn > 0
       THEN CAST({_ppm_sql('tp', '(tp + fn)')} AS BIGINT) END AS recall_ppm,
  CASE WHEN 2 * tp + fp + fn > 0
       THEN CAST({_ppm_sql('(2 * tp)', '(2 * tp + fp + fn)')} AS BIGINT) END AS f1_ppm
FROM agg
"""


def _dau_wau_oracle() -> str:
    return f"""
WITH au AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
bounds AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
dau AS (SELECT day, count(*) AS dau FROM au GROUP BY 1),
cover AS (
  SELECT DISTINCT
    CAST(unnest(generate_series(CAST(au.day AS TIMESTAMP),
      CAST(least(au.day + 6, b.d1) AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day,
    au.user_id
  FROM au CROSS JOIN bounds b
),
wau AS (SELECT day, count(*) AS wau FROM cover GROUP BY 1),
grid AS (
  SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT strftime(g.day, '%Y-%m-%d') AS day,
  CAST(coalesce(d.dau, 0) AS BIGINT) AS dau,
  CAST(coalesce(w.wau, 0) AS BIGINT) AS wau,
  CASE WHEN coalesce(w.wau, 0) > 0
       THEN CAST({_ppm_sql('coalesce(d.dau, 0)', 'w.wau')} AS BIGINT)
  END AS stickiness_ppm
FROM grid g
LEFT JOIN dau d ON g.day = d.day
LEFT JOIN wau w ON g.day = w.day
"""


def _trigram_oracle(min_count: int = 5) -> str:
    return f"""
WITH seq AS (
  SELECT lag(event_type, 2) OVER w AS e1,
         lag(event_type, 1) OVER w AS e2,
         event_type AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
f AS (SELECT * FROM seq WHERE e1 IS NOT NULL),
total AS (SELECT count(*) AS n_total FROM f)
SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n,
  CAST({_ppm_sql('count(*)', 't.n_total')} AS BIGINT) AS support_ppm
FROM f CROSS JOIN total t
GROUP BY e1, e2, e3, t.n_total
HAVING count(*) >= {min_count}
"""


def _join_estimate_oracle() -> str:
    from .operators.relational7 import _JOIN_ESTIMATES

    parts = []
    for name, lt, lk, rt, rk in _JOIN_ESTIMATES:
        parts.append(f"""SELECT '{name}' AS join_name,
  CAST(ls.n_left AS BIGINT) AS n_left, CAST(rs.n_right AS BIGINT) AS n_right,
  CAST(ls.ndv_left AS BIGINT) AS ndv_left, CAST(rs.ndv_right AS BIGINT) AS ndv_right,
  round(ls.n_left * rs.n_right / greatest(ls.ndv_left, rs.ndv_right), 6) AS est_rows,
  CAST(a.actual_rows AS BIGINT) AS actual_rows,
  CASE WHEN a.actual_rows > 0 THEN
    round(abs(ls.n_left * rs.n_right / greatest(ls.ndv_left, rs.ndv_right)
              - a.actual_rows) / a.actual_rows, 6) END AS rel_error
FROM (SELECT count(*) AS n_left, count(DISTINCT {lk}) AS ndv_left FROM {lt}) ls
CROSS JOIN (SELECT count(*) AS n_right, count(DISTINCT {rk}) AS ndv_right FROM {rt}) rs
CROSS JOIN (SELECT count(*) AS actual_rows
            FROM {lt} l JOIN {rt} r ON l.{lk} = r.{rk}) a""")
    return "\nUNION ALL ".join(parts)


def _lang_confusion_oracle() -> str:
    return f"""
WITH pred AS ({_lang_id_oracle()}),
cells AS (
  SELECT d.lang, p.pred_lang, count(*) AS n
  FROM documents d JOIN pred p ON d.doc_id = p.doc_id
  GROUP BY 1, 2
),
gt AS (SELECT lang, sum(n) AS n_gold FROM cells GROUP BY 1)
SELECT c.lang, c.pred_lang, CAST(c.n AS BIGINT) AS n,
  CAST({_ppm_sql('c.n', 'g.n_gold')} AS BIGINT) AS share_of_gold_ppm,
  (c.lang = c.pred_lang) AS is_correct
FROM cells c JOIN gt g ON c.lang = g.lang
"""


def _churn_oracle(churn_days: int = 7) -> str:
    return f"""
WITH per_user AS (
  SELECT user_id, max(ts) AS last_ts, count(*) AS n_events,
    round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS total_value
  FROM events GROUP BY 1
),
h AS (SELECT max(ts) AS h_ts FROM events)
SELECT user_id, last_ts, CAST(n_events AS BIGINT) AS n_events, total_value,
  CAST(floor(epoch(h.h_ts)) - floor(epoch(last_ts)) AS BIGINT) AS idle_secs,
  (floor(epoch(h.h_ts)) - floor(epoch(last_ts)) > {churn_days} * 86400) AS is_churned
FROM per_user CROSS JOIN h
"""


def _growth_accounting_oracle() -> str:
    return """
WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
hz AS (SELECT max(d) AS last_d FROM act),
flagged AS (
  SELECT user_id, d,
    lag(d) OVER w AS prev_d, lead(d) OVER w AS next_d
  FROM act WINDOW w AS (PARTITION BY user_id ORDER BY d)
),
per_day AS (
  SELECT d, count(*) AS n_active,
    sum(CASE WHEN prev_d IS NULL THEN 1 ELSE 0 END) AS n_new,
    sum(CASE WHEN prev_d = d - 1 THEN 1 ELSE 0 END) AS n_retained,
    sum(CASE WHEN prev_d IS NOT NULL AND prev_d < d - 1 THEN 1 ELSE 0 END) AS n_resurrected
  FROM flagged GROUP BY 1
),
churn AS (
  SELECT d + 1 AS d, count(*) AS n_churned
  FROM flagged CROSS JOIN hz
  WHERE d < last_d AND (next_d IS NULL OR next_d > d + 1)
  GROUP BY 1
)
SELECT strftime(coalesce(p.d, c.d), '%Y-%m-%d') AS day,
  CAST(coalesce(n_active, 0) AS BIGINT) AS n_active,
  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
  CAST(coalesce(n_retained, 0) AS BIGINT) AS n_retained,
  CAST(coalesce(n_resurrected, 0) AS BIGINT) AS n_resurrected,
  CAST(coalesce(n_churned, 0) AS BIGINT) AS n_churned
FROM per_day p FULL OUTER JOIN churn c ON p.d = c.d
"""


def _pq_heatmap_oracle(price_step: int = 10000, qty_step: int = 10) -> str:
    return f"""
WITH cells AS (
  SELECT CAST(floor(l_extendedprice / {price_step}) AS INT) AS price_band,
    CAST(floor(l_quantity / {qty_step}) AS INT) AS qty_band,
    count(*) AS n_rows,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue
  FROM lineitem GROUP BY 1, 2
),
total AS (SELECT sum(revenue) AS total_rev FROM cells)
SELECT price_band, qty_band, CAST(n_rows AS BIGINT) AS n_rows,
  CAST(CAST(revenue AS DECIMAL(28,2)) * 100 AS BIGINT) AS revenue_cents,
  round(CAST(revenue AS DOUBLE) / CAST(t.total_rev AS DOUBLE), 6) AS revenue_share
FROM cells CROSS JOIN total t
"""


def _wh_heatmap_oracle() -> str:
    return """
WITH cells AS (
  SELECT CAST((CAST(ts AS DATE) - DATE '1970-01-05') % 7 AS INT) AS weekday,
    CAST(extract(hour FROM ts) AS INT) AS hour,
    count(*) AS n_events
  FROM events GROUP BY 1, 2
),
total AS (SELECT sum(n_events) AS n_total FROM cells)
SELECT weekday, hour, CAST(n_events AS BIGINT) AS n_events,
  round(n_events / t.n_total, 6) AS share
FROM cells CROSS JOIN total t
"""


def _hll_oracle(m: int = 64, rmax: int = 24) -> str:
    """HyperLogLog twin: identical md5 hash stream, register/rho bit
    arithmetic on the unpadded binary-string rendering (DuckDB
    ``bin`` == Spark ``conv(_, 10, 2)``), the same pinned alpha_e6
    and linear-counting literals from sketches.HLL_LC_TABLE — every
    value BIGINT end-to-end."""
    from .operators.sketches import HLL_ALPHA64_E6, hll_lc_case_sql

    num = HLL_ALPHA64_E6 * m * m * (1 << rmax)
    return f"""
WITH terms AS (
  SELECT DISTINCT source, term FROM (
    SELECT source, unnest({_norm_toks_sql()}) AS term FROM documents
  )
), hashed AS (
  SELECT source,
    CAST(concat('0x', substr(md5(term || '#hll'), 1, 15)) AS BIGINT) AS h
  FROM terms
), regs AS (
  SELECT source, h % {m} AS register,
    CASE WHEN h // {m} = 0 THEN {rmax}
         ELSE least({rmax}, 1 + length(bin(h // {m}))
                    - length(regexp_replace(bin(h // {m}), '0+$', ''))) END AS rho
  FROM hashed
), regmax AS (
  SELECT source, register, max(rho) AS rho FROM regs GROUP BY 1, 2
), per AS (
  SELECT source, count(*) AS n_hit,
    CAST(sum(CAST(1 AS BIGINT) << ({rmax} - rho)) AS BIGINT) AS s_hit
  FROM regmax GROUP BY 1
), est AS (
  SELECT source, CAST({m} - n_hit AS BIGINT) AS n_registers_zero,
    CAST(s_hit + ({m} - n_hit) * CAST({1 << rmax} AS BIGINT) AS BIGINT) AS harmonic_sum
  FROM per
), raw AS (
  SELECT source, n_registers_zero, harmonic_sum,
    CAST({num} // (harmonic_sum * 1000000) AS BIGINT) AS n_hll
  FROM est
), corr AS (
  SELECT source, n_registers_zero, harmonic_sum, n_hll,
    CAST(CASE WHEN n_registers_zero > 0 AND n_hll <= {(5 * m) // 2}
         THEN {hll_lc_case_sql('n_registers_zero')} ELSE n_hll END AS BIGINT)
      AS n_estimated
  FROM raw
), exact AS (
  SELECT source, count(*) AS n_exact FROM terms GROUP BY 1
)
SELECT e.source, CAST(e.n_exact AS BIGINT) AS n_exact,
  c.n_registers_zero, c.harmonic_sum, c.n_hll, c.n_estimated,
  CAST({_ppm_sql('abs(c.n_estimated - e.n_exact)', 'e.n_exact')} AS BIGINT) AS abs_err_ppm
FROM exact e JOIN corr c USING (source) ORDER BY source
"""


def _quantile_sketch_oracle(bin_cents: int = 10_000, qs: tuple = (50, 90, 99)) -> str:
    """Quantile-sketch twin: the bin selection reproduces the exact
    BIGINT cumulative rule; the exact value column cross-checks the
    Spark drill-in against DuckDB's NATIVE quantile_disc (verified
    tie-identical: both return the smallest value with
    cum * 100 >= q * N)."""
    exact_union = " UNION ALL ".join(
        f"SELECT {q} AS q, CAST(quantile_disc(cents, {q / 100}) AS BIGINT)"
        " AS exact_disc_cents FROM base"
        for q in qs
    )
    q_values = ", ".join(f"({q})" for q in qs)
    return f"""
WITH base AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
), tot AS (SELECT count(*) AS n_total FROM base),
bins AS (SELECT cents // {bin_cents} AS bin, count(*) AS n FROM base GROUP BY 1),
cum AS (SELECT bin, n, sum(n) OVER (ORDER BY bin) AS cum FROM bins),
qv(q) AS (VALUES {q_values}),
chosen AS (
  SELECT q, min(bin) AS bin
  FROM cum CROSS JOIN tot JOIN qv ON cum.cum * 100 >= qv.q * tot.n_total
  GROUP BY 1
), exact AS ({exact_union})
SELECT CAST(c.q AS BIGINT) AS q,
  CAST(c.bin * {bin_cents} AS BIGINT) AS bin_lo_cents,
  CAST((c.bin + 1) * {bin_cents} AS BIGINT) AS bin_hi_cents,
  e.exact_disc_cents,
  CAST(t.n_total AS BIGINT) AS n_total
FROM chosen c JOIN exact e ON c.q = e.q CROSS JOIN tot t
ORDER BY q
"""


def _dedup_aware_holdout_oracle(test_permille: int = 200) -> str:
    """Cluster-aware holdout twin: the clusters come from the same
    recursive-CTE components over the minhash pairs; the split is the
    identical seeded md5 permille bucket on doc_id vs cluster root."""

    def bucket(col: str) -> str:
        return (
            f"CAST(concat('0x', substr(md5(concat(CAST({col} AS VARCHAR),"
            f" '#casplit')), 1, 15)) AS BIGINT) % 1000 < {test_permille}"
        )

    return f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({_minhash_oracle()}) mh),
comp AS (SELECT doc_id, cluster_id FROM ({_clusters_oracle()}) c),
rooted AS (
  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS root
  FROM documents d LEFT JOIN comp c USING (doc_id)
),
splits AS (
  SELECT doc_id, {bucket('doc_id')} AS t_doc, {bucket('root')} AS t_cluster
  FROM rooted
),
xp AS (
  SELECT
    sum(CASE WHEN a.t_doc <> b.t_doc THEN 1 ELSE 0 END) AS cross_doc,
    sum(CASE WHEN a.t_cluster <> b.t_cluster THEN 1 ELSE 0 END) AS cross_cluster
  FROM pairs p
  JOIN splits a ON p.doc_a = a.doc_id
  JOIN splits b ON p.doc_b = b.doc_id
),
sz AS (
  SELECT
    sum(CASE WHEN t_doc THEN 0 ELSE 1 END) AS train_doc,
    sum(CASE WHEN t_doc THEN 1 ELSE 0 END) AS test_doc,
    sum(CASE WHEN t_cluster THEN 0 ELSE 1 END) AS train_cluster,
    sum(CASE WHEN t_cluster THEN 1 ELSE 0 END) AS test_cluster
  FROM splits
)
SELECT 'cluster_key' AS strategy, CAST(train_cluster AS BIGINT) AS n_train,
  CAST(test_cluster AS BIGINT) AS n_test,
  CAST(coalesce(cross_cluster, 0) AS BIGINT) AS cross_pairs
FROM sz CROSS JOIN xp
UNION ALL
SELECT 'doc_key', CAST(train_doc AS BIGINT), CAST(test_doc AS BIGINT),
  CAST(coalesce(cross_doc, 0) AS BIGINT)
FROM sz CROSS JOIN xp
ORDER BY strategy
"""


def _dedup_against_index_oracle(
    k: int = 10, old_permille: int = 800, dup_threshold_ppm: int = 500_000
) -> str:
    """Incremental-ingest dedup twin: same md5 permille old/new
    split, same fixed k-token grid and block hashes as the substring
    dedup oracle, index = distinct old-side hashes."""
    return f"""
WITH d AS (
  SELECT doc_id, source, {_norm_toks_sql()} AS t,
    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#ingest')), 1, 15))
      AS BIGINT) % 1000 AS bucket
  FROM documents
),
withn AS (
  SELECT doc_id, source, t, bucket,
    CAST(floor(len(t) / {k}) AS BIGINT) AS nb
  FROM d
),
blocks AS (
  SELECT doc_id, bucket, md5(array_to_string(t[pos*{k}+1 : pos*{k}+{k}], ' ')) AS h
  FROM (
    SELECT doc_id, bucket, t, unnest(generate_series(0, CAST(nb AS INT) - 1)) AS pos
    FROM withn WHERE nb > 0
  )
),
idx AS (SELECT DISTINCT h FROM blocks WHERE bucket < {old_permille}),
hits AS (
  SELECT nb.doc_id, count(*) AS n_blocks, count(i.h) AS n_hit_blocks
  FROM (SELECT doc_id, h FROM blocks WHERE bucket >= {old_permille}) nb
  LEFT JOIN idx i ON nb.h = i.h
  GROUP BY 1
)
SELECT w.doc_id, w.source,
  CAST(coalesce(h.n_blocks, 0) AS BIGINT) AS n_blocks,
  CAST(coalesce(h.n_hit_blocks, 0) AS BIGINT) AS n_hit_blocks,
  CAST(CASE WHEN coalesce(h.n_blocks, 0) = 0 THEN 0
       ELSE {_ppm_sql('coalesce(h.n_hit_blocks, 0)', 'coalesce(h.n_blocks, 1)')}
       END AS BIGINT) AS hit_ppm,
  CAST(CASE WHEN coalesce(h.n_blocks, 0) = 0 THEN 0
       ELSE {_ppm_sql('coalesce(h.n_hit_blocks, 0)', 'coalesce(h.n_blocks, 1)')}
       END >= {dup_threshold_ppm} AS BOOLEAN) AS is_dup
FROM withn w LEFT JOIN hits h USING (doc_id)
WHERE w.bucket >= {old_permille}
ORDER BY w.doc_id
"""


def _token_budget_oracle(budget_tokens: int = 500_000) -> str:
    """Hamilton-apportionment twin: same BIGINT base/remainder split
    and (remainder desc, source asc) largest-remainder rank."""
    b = budget_tokens
    return f"""
WITH avail AS (
  SELECT source, CAST(sum(len({_norm_toks_sql()})) AS BIGINT) AS tokens_available
  FROM documents GROUP BY 1
),
tot AS (SELECT CAST(sum(tokens_available) AS BIGINT) AS total_tokens FROM avail),
based AS (
  SELECT source, tokens_available,
    CAST(({b} * tokens_available) // total_tokens AS BIGINT) AS base_quota,
    CAST(({b} * tokens_available) % total_tokens AS BIGINT) AS remainder
  FROM avail CROSS JOIN tot
),
lr AS (
  SELECT source, tokens_available, base_quota,
    row_number() OVER (ORDER BY remainder DESC, source ASC) AS rk,
    {b} - sum(base_quota) OVER () AS leftover
  FROM based
)
SELECT source, tokens_available,
  CAST(base_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS quota_tokens,
  CAST({_ppm_sql('base_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END', str(b))} AS BIGINT)
    AS budget_share_ppm
FROM lr ORDER BY source
"""


def _neardup_against_index_oracle(
    num_hashes: int = 12,
    bands: int = 4,
    bucket_cap: int = 200,
    old_permille: int = 800,
    threshold_ppm: int = 500_000,
) -> str:
    """Incremental near-dup screening twin: the shared MinHash
    candidate CTEs restricted to cross-split pairs, exact-ppm shingle
    Jaccard, best old-side match per new doc (ties to min doc_id)."""
    j_ppm = _ppm_sql(
        "coalesce(i.n_inter, 0)", "(za.sz + zb.sz - coalesce(i.n_inter, 0))"
    )
    return f"""
WITH {_minhash_cand_ctes(num_hashes, bands, bucket_cap)},
buck AS (
  SELECT doc_id, source,
    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#ingest')), 1, 15))
      AS BIGINT) % 1000 >= {old_permille} AS is_new
  FROM documents
),
vp AS (
  SELECT CASE WHEN ba.is_new THEN c.doc_a ELSE c.doc_b END AS new_doc,
         CASE WHEN ba.is_new THEN c.doc_b ELSE c.doc_a END AS old_doc,
         CAST({j_ppm} AS BIGINT) AS j_ppm
  FROM cand c
  JOIN buck ba ON ba.doc_id = c.doc_a
  JOIN buck bb ON bb.doc_id = c.doc_b
  LEFT JOIN inter i ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
  JOIN sizes za ON za.doc_id = c.doc_a
  JOIN sizes zb ON zb.doc_id = c.doc_b
  WHERE ba.is_new <> bb.is_new
),
best AS (SELECT new_doc, max(j_ppm) AS best_jaccard_ppm FROM vp GROUP BY 1),
bestdoc AS (
  SELECT v.new_doc, b.best_jaccard_ppm, min(v.old_doc) AS matched_doc_id
  FROM vp v JOIN best b ON v.new_doc = b.new_doc AND v.j_ppm = b.best_jaccard_ppm
  GROUP BY 1, 2
)
SELECT d.doc_id, d.source,
  CAST(bd.matched_doc_id AS BIGINT) AS matched_doc_id,
  CAST(bd.best_jaccard_ppm AS BIGINT) AS best_jaccard_ppm,
  coalesce(bd.best_jaccard_ppm >= {threshold_ppm}, FALSE) AS is_neardup
FROM buck d LEFT JOIN bestdoc bd ON bd.new_doc = d.doc_id
WHERE d.is_new ORDER BY d.doc_id
"""


def _curriculum_oracle() -> str:
    """Curriculum-phase twin: the RANGE-cumulative count identity
    (1 + least(4, 5*cum // N)) — proven equal to the Spark threshold
    banding on customer_rfm — applied to the shared quality oracle."""
    return f"""
WITH q AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(round(quality_score * 1000000) AS BIGINT) AS q_e6
  FROM ({_quality_oracle()}) qq
),
c AS (
  SELECT *, count(*) OVER (ORDER BY q_e6 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    count(*) OVER () AS n
  FROM q
),
ph AS (SELECT n_tokens, q_e6, 1 + least(4, (5 * cum) // n) AS phase FROM c),
tot AS (SELECT count(*) AS n_all, sum(n_tokens) AS tok_all FROM q),
agg AS (
  SELECT phase, count(*) AS n_docs, sum(n_tokens) AS n_tokens, sum(q_e6) AS q_sum
  FROM ph GROUP BY 1
)
SELECT CAST(phase AS BIGINT) AS phase, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(q_sum // n_docs AS BIGINT) AS mean_quality_e6,
  CAST({_ppm_sql('n_docs', 'n_all')} AS BIGINT) AS doc_share_ppm,
  CAST({_ppm_sql('n_tokens', 'tok_all')} AS BIGINT) AS token_share_ppm
FROM agg CROSS JOIN tot ORDER BY phase
"""


def _curriculum_mixture_oracle() -> str:
    """C150 twin: the curriculum oracle's RANGE-cumulative phase
    identity (proven == the Spark threshold banding) joined back to
    each doc's source, crossed with the exact-integer mixture policy
    (sample_prob_ppm = min(1e6, floor-ppm of total over
    n_sources*src_docs) — pure BIGINT, the r6-double mart's exact
    twin)."""
    prob = _ppm_sql("total", "n_sources * src_docs")
    return f"""
WITH q0 AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
    CAST(round(quality_score * 1000000) AS BIGINT) AS q_e6
  FROM ({_quality_oracle()}) qq
),
q AS (
  SELECT q0.doc_id, dd.source, q0.n_tokens, q0.q_e6
  FROM q0 JOIN documents dd USING (doc_id)
),
c AS (
  SELECT *, count(*) OVER (ORDER BY q_e6 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
    count(*) OVER () AS n
  FROM q
),
ph AS (SELECT source, n_tokens, 1 + least(4, (5 * cum) // n) AS phase FROM c),
cells AS (
  SELECT phase, source, count(*) AS n_docs, sum(n_tokens) AS n_tokens
  FROM ph GROUP BY 1, 2
),
ptot AS (SELECT phase, sum(n_docs) AS phase_docs FROM cells GROUP BY 1),
src0 AS (SELECT source, count(*) AS src_docs FROM documents GROUP BY 1),
srct AS (SELECT sum(src_docs) AS total, count(*) AS n_sources FROM src0),
src AS (
  SELECT source,
    least(CAST(1000000 AS BIGINT), CAST({prob} AS BIGINT)) AS sample_prob_ppm
  FROM src0, srct
)
SELECT CAST(c.phase AS BIGINT) AS phase, c.source,
  CAST(c.n_docs AS BIGINT) AS n_docs,
  CAST(c.n_tokens AS BIGINT) AS n_tokens,
  CAST({_ppm_sql('c.n_docs', 'p.phase_docs')} AS BIGINT) AS phase_doc_share_ppm,
  s.sample_prob_ppm,
  CAST(c.n_docs * s.sample_prob_ppm AS BIGINT) AS exp_docs_ppm,
  CAST(c.n_tokens * s.sample_prob_ppm AS BIGINT) AS exp_tokens_ppm
FROM cells c JOIN ptot p USING (phase) JOIN src s USING (source)
ORDER BY phase, source
"""


def _span_corruption_oracle(
    stride: int = 8, span_len: int = 3, noise_permille: int = 150
) -> str:
    return f"""
WITH d AS (SELECT doc_id, CAST(len({_norm_toks_sql()}) AS BIGINT) AS n_tokens FROM documents),
wc AS (
  SELECT doc_id, n_tokens,
    CAST((n_tokens - {span_len}) // {stride} AS BIGINT) + 1 AS n_cells
  FROM d
),
cells AS (
  SELECT doc_id, unnest(generate_series(0, CAST(n_cells AS INT) - 1)) AS cell
  FROM wc WHERE n_cells > 0
),
picked AS (
  SELECT doc_id,
    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#span',
      CAST(cell AS VARCHAR))), 1, 15)) AS BIGINT) % 1000 < {noise_permille} AS sel
  FROM cells
),
per AS (SELECT doc_id, sum(CASE WHEN sel THEN 1 ELSE 0 END) AS n_spans FROM picked GROUP BY 1)
SELECT d.doc_id, d.n_tokens,
  CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
  CAST(coalesce(p.n_spans, 0) * {span_len} AS BIGINT) AS masked_tokens,
  CAST(CASE WHEN d.n_tokens = 0 THEN 0
       ELSE {_ppm_sql(f'coalesce(p.n_spans, 0) * {span_len}', 'd.n_tokens')} END AS BIGINT)
    AS mask_ratio_ppm
FROM d LEFT JOIN per p USING (doc_id) ORDER BY d.doc_id
"""


def _normalization_impact_oracle() -> str:
    ws = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
    return f"""
WITH lv AS (
  SELECT '1_raw' AS level, md5(text) AS h FROM documents
  UNION ALL SELECT '2_lower', md5(lower(text)) FROM documents
  UNION ALL SELECT '3_lower_ws', md5({ws}) FROM documents
  UNION ALL SELECT '4_lower_ws_alnum',
    md5(regexp_replace({ws}, '[^a-z0-9 ]', '', 'g')) FROM documents
)
SELECT level, CAST(count(*) AS BIGINT) AS n_docs,
  CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
  CAST({_ppm_sql('count(*) - count(DISTINCT h)', 'count(*)')} AS BIGINT) AS dup_ppm
FROM lv GROUP BY 1 ORDER BY 1
"""


def holt_fold_sql_parts(a: int, b: int) -> tuple[str, str]:
    """The DuckDB spellings of the Holt step's new-level / new-trend
    expressions over accumulator ``acc`` and element ``e`` — shared by
    the oracle twin and the adversarial fold-parity test so the two
    cannot drift. Mirrors the Spark fold exactly: sign-safe pmod
    unpack, exact-multiple level divide, greatest(nl, 0) clamp."""
    S, OFF, K = 1 << 24, 1 << 23, 1 << 24

    def d10(num: str) -> str:
        return f"(({num} + {K * 10}) // 10 - {K})"

    r = f"(((acc % {S}) + {S}) % {S})"
    lvl, trd = f"((acc - {r}) // {S})", f"({r} - {OFF})"
    nl = f"greatest({d10(f'{a} * e + {10 - a} * ({lvl} + {trd}) + 5')}, 0)"
    nt = d10(f"{b} * ({nl} - {lvl}) + {10 - b} * {trd} + 5")
    return nl, nt


def _holt_oracle(alpha10: int = 3, beta10: int = 2) -> str:
    """Holt linear-trend twin: the identical fixed-point recursion
    folded by list_reduce over per-row prefix lists, with the state
    PACKED into one BIGINT (level * 2^24 + trend + 2^23) exactly like
    the Spark fold — a two-field struct accumulator hits a DuckDB 1.0
    bug where a later struct-literal field referencing the
    accumulator sees the already-updated first field. The rounding
    divide is shifted (+2^22*10, -2^22) so ``//`` always truncates a
    non-negative number (== floor, matching Spark). Unpack mirrors
    the Spark side's sign-safe pmod spelling (((acc % S) + S) % S)
    and exact-multiple division, and the level carries the same
    greatest(nl, 0) clamp (ADVICE r5: daily counts are >= 0, so the
    smoothed level never goes negative)."""
    a, b = alpha10, beta10
    S, OFF = 1 << 24, 1 << 23
    nl, nt = holt_fold_sql_parts(a, b)
    return f"""
WITH {_DAILY_GRID_SQL},
pfx AS (
  SELECT event_type, day, n,
    list(CAST(n AS BIGINT) * 100) OVER (PARTITION BY event_type ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
  FROM grid
),
st AS (
  SELECT event_type, day, n,
    list_reduce(
      list_transform(pfx, (x, i) -> CASE WHEN i = 1 THEN x * {S} + {OFF} ELSE x END),
      (acc, e) -> {nl} * {S} + ({nt} + {OFF})
    ) AS s
  FROM pfx
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
  CAST(n AS BIGINT) AS n_events,
  CAST((s - (((s % {S}) + {S}) % {S})) // {S} AS BIGINT) AS level_e2,
  CAST((((s % {S}) + {S}) % {S}) - {OFF} AS BIGINT) AS trend_e2,
  CAST((s - (((s % {S}) + {S}) % {S})) // {S}
       + (((s % {S}) + {S}) % {S}) - {OFF} AS BIGINT) AS forecast_next_e2
FROM st ORDER BY event_type, day
"""


def _rendezvous_oracle(n_shards: int = 8) -> str:
    return f"""
WITH d AS (SELECT doc_id FROM documents),
w AS (
  SELECT doc_id, s.shard,
    md5(concat(CAST(doc_id AS VARCHAR), '#hrw', CAST(s.shard AS VARCHAR))) AS h
  FROM d CROSS JOIN (SELECT unnest(generate_series(0, {n_shards})) AS shard) s
),
asg AS (
  SELECT doc_id,
    (max(CASE WHEN shard < {n_shards} THEN {{'h': h, 's': shard}} END)).s AS shard_n,
    (max({{'h': h, 's': shard}})).s AS shard_n1
  FROM w GROUP BY 1
),
tot AS (SELECT count(*) AS n_total FROM d),
before AS (SELECT shard_n AS shard, count(*) AS n_docs_before FROM asg GROUP BY 1),
after AS (SELECT shard_n1 AS shard, count(*) AS n_docs_after FROM asg GROUP BY 1),
moved AS (
  SELECT shard_n AS shard, count(*) AS n_moved_out
  FROM asg WHERE shard_n <> shard_n1 GROUP BY 1
),
shards AS (SELECT unnest(generate_series(0, {n_shards})) AS shard)
SELECT CAST(s.shard AS BIGINT) AS shard,
  CAST(coalesce(b.n_docs_before, 0) AS BIGINT) AS n_docs_before,
  CAST(coalesce(a.n_docs_after, 0) AS BIGINT) AS n_docs_after,
  CAST(coalesce(m.n_moved_out, 0) AS BIGINT) AS n_moved_out,
  CAST({_ppm_sql('coalesce(m.n_moved_out, 0)', '(SELECT n_total FROM tot)')} AS BIGINT)
    AS moved_share_ppm
FROM shards s
LEFT JOIN before b ON s.shard = b.shard
LEFT JOIN after a ON s.shard = a.shard
LEFT JOIN moved m ON s.shard = m.shard
ORDER BY s.shard
"""


def _benford_oracle() -> str:
    """Benford twin: identical frozen expected-ppm literals (imported
    from the operator so the two tables cannot drift), digit from the
    cents-integer string, chi-square in integer e6 via ``//``."""
    from .operators.statistics import BENFORD_PPM

    exp_cases = " ".join(
        f"WHEN {d} THEN {BENFORD_PPM[d]}" for d in range(1, 10)
    )
    return f"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
),
per AS (SELECT digit, count(*) AS n FROM d GROUP BY 1),
tot AS (SELECT count(*) AS n_total FROM d),
grid AS (SELECT unnest(generate_series(1, 9)) AS digit)
SELECT CAST(g.digit AS INT) AS digit,
  CAST(coalesce(p.n, 0) AS BIGINT) AS n_orders,
  CAST({_ppm_sql('coalesce(p.n, 0)', '(SELECT n_total FROM tot)')} AS BIGINT) AS obs_ppm,
  CAST(CASE g.digit {exp_cases} END AS BIGINT) AS benford_ppm,
  CAST(
    ({_ppm_sql('coalesce(p.n, 0)', '(SELECT n_total FROM tot)')} - CASE g.digit {exp_cases} END)
    * ({_ppm_sql('coalesce(p.n, 0)', '(SELECT n_total FROM tot)')} - CASE g.digit {exp_cases} END)
    // (CASE g.digit {exp_cases} END) AS BIGINT) AS chi2_contrib_e6
FROM grid g LEFT JOIN per p ON g.digit = p.digit
ORDER BY g.digit
"""


def _gini_oracle() -> str:
    """Gini twin: identical value-grain rank-sum identity; exact
    HUGEINT sums mirror Spark's DECIMAL(38,0), and the final ratio is
    the IDENTICAL double expression tree (int->double conversions are
    correctly rounded on both engines, so equal integers give equal
    doubles)."""
    return """
WITH pc AS (
  SELECT o_custkey,
    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
vals AS (SELECT v, count(*) AS c FROM pc GROUP BY 1),
cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum_c FROM vals),
agg AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
    sum(CAST(v AS HUGEINT) * CAST(c AS HUGEINT)) AS t_sum,
    sum(CAST(v AS HUGEINT) * (2 * CAST(cum_c - c AS HUGEINT) * CAST(c AS HUGEINT)
        + CAST(c AS HUGEINT) * (CAST(c AS HUGEINT) + 1))) AS s2_sum
  FROM cum
)
SELECT CAST(n AS BIGINT) AS n_customers,
  CAST(t_sum AS BIGINT) AS total_cents,
  round((CAST(s2_sum AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0) * CAST(t_sum AS DOUBLE))
        / (CAST(n AS DOUBLE) * CAST(t_sum AS DOUBLE)), 6) AS gini
FROM agg
"""


def _ks_oracle() -> str:
    """KS twin: identical value-grain integer-ppm ECDFs, max gap +
    deterministic smallest attaining price."""
    ppm_a = _ppm_sql("cum_ca", "(SELECT na FROM tot)")
    ppm_b = _ppm_sql("cum_cb", "(SELECT nb FROM tot)")
    return f"""
WITH p0 AS (
  SELECT CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
    (p_type LIKE 'PROMO%') AS g
  FROM part
),
vals AS (
  SELECT v, sum(CASE WHEN g THEN 1 ELSE 0 END) AS ca,
    sum(CASE WHEN g THEN 0 ELSE 1 END) AS cb
  FROM p0 GROUP BY 1
),
tot AS (SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb FROM vals),
cum AS (
  SELECT v, sum(ca) OVER (ORDER BY v) AS cum_ca, sum(cb) OVER (ORDER BY v) AS cum_cb
  FROM vals
),
gaps AS (SELECT v, abs(({ppm_a}) - ({ppm_b})) AS gap FROM cum)
SELECT
  CAST((SELECT na FROM tot) AS BIGINT) AS n_promo,
  CAST((SELECT nb FROM tot) AS BIGINT) AS n_other,
  CAST(max(gap) AS BIGINT) AS ks_ppm,
  CAST((SELECT min(v) FROM gaps WHERE gap = (SELECT max(gap) FROM gaps)) AS BIGINT)
    AS at_price_cents
FROM gaps
"""


def _autocorr_oracle(max_lag: int = 7) -> str:
    """Autocorrelation twin: the complete grid makes a day-arithmetic
    self-join equivalent to LAG; moments as exact BIGINTs, the final
    correlation the IDENTICAL double expression tree, NULL on zero
    variance."""
    return f"""
WITH {_DAILY_GRID_SQL},
ks AS (SELECT unnest(generate_series(1, {max_lag})) AS lag),
pairs AS (
  SELECT a.event_type, ks.lag, CAST(a.n AS BIGINT) AS x, CAST(b.n AS BIGINT) AS y
  FROM grid a CROSS JOIN ks
  JOIN grid b ON b.event_type = a.event_type AND b.day = a.day - CAST(ks.lag AS INT)
),
mom AS (
  SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
    CAST(sum(x * y) AS BIGINT) AS sxy,
    CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs,
  CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
    round(CAST(n * sxy - sx * sy AS DOUBLE)
          / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
  END AS autocorr
FROM mom ORDER BY event_type, lag
"""


def _boilerplate_oracle(prefix_chars: int = 40, top_n: int = 10) -> str:
    return f"""
WITH fam AS (
  SELECT substr(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, {prefix_chars}) AS prefix,
    count(*) AS n_docs, count(DISTINCT source) AS n_sources
  FROM documents GROUP BY 1
),
tot AS (SELECT count(*) AS n_total FROM documents),
top AS (
  SELECT prefix, n_docs, n_sources,
    row_number() OVER (ORDER BY n_docs DESC, prefix ASC) AS rank
  FROM fam
)
SELECT CAST(rank AS INT) AS rank, prefix,
  CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_sources AS BIGINT) AS n_sources,
  CAST({_ppm_sql('n_docs', '(SELECT n_total FROM tot)')} AS BIGINT) AS share_ppm
FROM top WHERE rank <= {top_n} ORDER BY rank
"""


def _bloom_fpr_oracle(
    n: int = 3, benchmark_mod: int = 100, m_bits: int = 1 << 18, k_hashes: int = 4
) -> str:
    """Bloom FPR twin: identical md5 positions; bits_set is the
    distinct position count (== the packed-word popcount); the
    theoretical FPR is the identical fill-ratio power expression."""

    def pos(col: str, i: int) -> str:
        return f"CAST(concat('0x', substr(md5({col} || '#{i}'), 1, 8)) AS BIGINT) % {m_bits}"

    poslist = ", ".join(pos("s", i) for i in range(k_hashes))
    checks = " AND ".join(
        f"({pos('t.s', i)}) IN (SELECT p FROM bloom)" for i in range(k_hashes)
    )
    ratio = f"(CAST((SELECT bits_set FROM bs) AS DOUBLE) / CAST({m_bits} AS DOUBLE))"
    theo = " * ".join([ratio] * k_hashes)
    return f"""
WITH {_shingle_cte(n)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
bench AS (SELECT DISTINCT s FROM sd WHERE doc_id % {benchmark_mod} = 0),
bloom AS (SELECT DISTINCT unnest([{poslist}]) AS p FROM bench),
bs AS (SELECT count(*) AS bits_set FROM bloom),
nb AS (SELECT count(*) AS n_bench FROM bench),
clean AS (
  SELECT DISTINCT s FROM sd
  WHERE doc_id % {benchmark_mod} <> 0 AND s NOT IN (SELECT s FROM bench)
),
probe AS (SELECT CASE WHEN {checks} THEN 1 ELSE 0 END AS fp FROM clean t)
SELECT CAST({m_bits} AS BIGINT) AS m_bits,
  CAST({k_hashes} AS BIGINT) AS k_hashes,
  CAST((SELECT n_bench FROM nb) AS BIGINT) AS n_bench_grams,
  CAST((SELECT bits_set FROM bs) AS BIGINT) AS n_bits_set,
  CAST(count(*) AS BIGINT) AS n_clean_probes,
  CAST(sum(fp) AS BIGINT) AS n_false_pos,
  CAST({_ppm_sql('sum(fp)', 'count(*)')} AS BIGINT) AS measured_fpr_ppm,
  CAST(floor({theo} * 1000000) AS BIGINT) AS theoretical_fpr_ppm
FROM probe
"""


_TRANSITION_CTES = """
pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS from_type,
    event_type AS to_type
  FROM events
),
counts AS (
  SELECT from_type, to_type, count(*) AS n FROM pairs
  WHERE from_type IS NOT NULL GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS c_x FROM counts GROUP BY 1)"""


def _entropy_rate_oracle() -> str:
    """Entropy-rate twin: identical micro-nat freezing per distinct
    transition (one round of an identical double expression), exact
    BIGINT weighted sums, integer `//` == Spark DIV on non-negative."""
    return f"""
WITH {_TRANSITION_CTES},
wm AS (
  SELECT c.from_type, t.c_x, c.n,
    CAST(round(-1000000.0 * ln(CAST(c.n AS DOUBLE) / CAST(t.c_x AS DOUBLE))) AS BIGINT) AS w
  FROM counts c JOIN tot t ON c.from_type = t.from_type
)
SELECT from_type,
  CAST(c_x AS BIGINT) AS n_transitions,
  CAST(count(*) AS BIGINT) AS n_successors,
  CAST(sum(n * w) // c_x AS BIGINT) AS entropy_micro_nats
FROM wm GROUP BY from_type, c_x ORDER BY from_type
"""


def _markov_stationary_oracle(n_iter: int = 20) -> str:
    """Stationary twin: the identical BIGINT fixed-point power
    iteration unrolled as chained CTEs (the pagerank oracle shape) —
    every step is integer arithmetic, so 20 iterations match without
    tolerance."""
    sql = f"""
WITH {_TRANSITION_CTES},
types AS MATERIALIZED (SELECT DISTINCT event_type AS t FROM events),
kk AS (SELECT count(*) AS k FROM types),
tr0 AS (
  SELECT c.from_type, c.to_type,
    CAST({_ppm_sql('c.n', 't.c_x')} AS BIGINT) AS p_ppm
  FROM counts c JOIN tot t ON c.from_type = t.from_type
),
dang AS (
  SELECT t AS from_type, t AS to_type, CAST(1000000 AS BIGINT) AS p_ppm
  FROM types WHERE t NOT IN (SELECT DISTINCT from_type FROM tr0)
),
-- MATERIALIZED: 20 unrolled iterations reference tr; inlined, DuckDB
-- re-runs the corpus-scale LAG per iteration (measured 49 s -> <1 s)
tr AS MATERIALIZED (SELECT * FROM tr0 UNION ALL SELECT * FROM dang),
r0 AS (
  SELECT t AS event_type,
    CAST(1000000 // (SELECT k FROM kk) AS BIGINT) AS r_e6
  FROM types
)"""
    prev = "r0"
    for i in range(1, n_iter + 1):
        sql += f""",
c{i} AS (
  SELECT tr.to_type AS t, CAST(sum(p.r_e6 * tr.p_ppm) // 1000000 AS BIGINT) AS r_e6
  FROM tr JOIN {prev} p ON tr.from_type = p.event_type GROUP BY 1
),
r{i} AS MATERIALIZED (
  SELECT ty.t AS event_type, CAST(coalesce(c.r_e6, 0) AS BIGINT) AS r_e6
  FROM types ty LEFT JOIN c{i} c ON ty.t = c.t
)"""
        prev = f"r{i}"
    return sql + f"""
SELECT event_type, CAST(r_e6 AS BIGINT) AS stationary_e6,
  CAST({n_iter} AS INT) AS n_iter
FROM {prev} ORDER BY event_type
"""


def _vocab_growth_oracle(bucket_width: int = 50) -> str:
    return f"""
WITH toksrc AS (
  SELECT doc_id // {bucket_width} AS bucket, unnest({_norm_toks_sql()}) AS term
  FROM documents
),
per_bucket AS (
  SELECT bucket, count(*) AS n_tokens, count(DISTINCT term) AS n_bucket_terms
  FROM toksrc GROUP BY 1
),
first_seen AS (
  SELECT min_bucket AS bucket, count(*) AS n_new
  FROM (SELECT term, min(bucket) AS min_bucket FROM toksrc GROUP BY 1)
  GROUP BY 1
),
docs_per AS (
  SELECT doc_id // {bucket_width} AS bucket, count(*) AS n_docs FROM documents GROUP BY 1
)
SELECT CAST(b.bucket AS BIGINT) AS bucket,
  CAST(d.n_docs AS BIGINT) AS n_docs,
  CAST(b.n_tokens AS BIGINT) AS n_tokens,
  CAST(b.n_bucket_terms AS BIGINT) AS n_bucket_terms,
  CAST(coalesce(f.n_new, 0) AS BIGINT) AS n_new_terms,
  CAST(sum(coalesce(f.n_new, 0)) OVER (ORDER BY b.bucket) AS BIGINT) AS cum_vocab,
  CAST({_ppm_sql('coalesce(f.n_new, 0)', 'b.n_bucket_terms')} AS BIGINT) AS new_share_ppm
FROM per_bucket b
JOIN docs_per d ON b.bucket = d.bucket
LEFT JOIN first_seen f ON b.bucket = f.bucket
ORDER BY b.bucket
"""


def _simpson_oracle() -> str:
    return """
WITH toks AS (
  SELECT source, unnest(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS term
  FROM documents
),
per AS (SELECT source, term, count(*) AS c FROM toks GROUP BY 1, 2),
agg AS (
  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
    CAST(count(*) AS BIGINT) AS n_terms,
    CAST(sum(c * (c - 1)) AS BIGINT) AS coll
  FROM per GROUP BY 1
)
SELECT source, n_tokens, n_terms,
  round(CAST(coll AS DOUBLE)
        / (CAST(n_tokens AS DOUBLE) * (CAST(n_tokens AS DOUBLE) - 1.0)), 6)
    AS simpson_lambda
FROM agg ORDER BY source
"""


def _contingency_dependence_oracle() -> str:
    """Dependence twin: per-cell chi2/MI frozen to rounded integers
    from identical double trees, exact BIGINT sums, Cramer's V as one
    identical double expression from the frozen chi2."""
    return """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n_xy FROM orders GROUP BY 1, 2
),
t AS (
  SELECT o_orderpriority, o_orderstatus, n_xy,
    sum(n_xy) OVER (PARTITION BY o_orderpriority) AS n_x,
    sum(n_xy) OVER (PARTITION BY o_orderstatus) AS n_y,
    sum(n_xy) OVER () AS n
  FROM cells
),
frozen AS (
  SELECT o_orderpriority AS rx, o_orderstatus AS ry, n,
    CAST(round(1000000.0
      * (CAST(n_xy AS DOUBLE) - CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
      * (CAST(n_xy AS DOUBLE) - CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))
      / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE) / CAST(n AS DOUBLE))) AS BIGINT) AS chi_e6,
    CAST(round(1000000.0
      * (CAST(n_xy AS DOUBLE) / CAST(n AS DOUBLE))
      * ln(CAST(n_xy AS DOUBLE) * CAST(n AS DOUBLE)
           / (CAST(n_x AS DOUBLE) * CAST(n_y AS DOUBLE)))) AS BIGINT) AS mi_micro
  FROM t
),
agg AS (
  SELECT n, CAST(sum(chi_e6) AS BIGINT) AS chi2_e6,
    CAST(sum(mi_micro) AS BIGINT) AS mi_micro_nats,
    count(DISTINCT rx) AS r, count(DISTINCT ry) AS c
  FROM frozen GROUP BY 1
)
SELECT CAST(n AS BIGINT) AS n_orders,
  chi2_e6,
  CAST((r - 1) * (c - 1) AS BIGINT) AS dof,
  round(sqrt(CAST(chi2_e6 AS DOUBLE) / 1000000.0
             / (CAST(n AS DOUBLE) * CAST(least(r - 1, c - 1) AS DOUBLE))), 6) AS cramer_v,
  mi_micro_nats
FROM agg
"""


def _lorenz_oracle() -> str:
    """Lorenz twin: identical value-grain rank-interval overlap —
    integer arithmetic end to end, HUGEINT mirrors DECIMAL(38,0)."""
    ppm_rev = _ppm_sql("rev", "(SELECT t_rev FROM tot)")
    ppm_cum = _ppm_sql("cum_rev", "(SELECT t_rev FROM tot)")
    return f"""
WITH pc AS (
  SELECT o_custkey,
    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
vals AS (SELECT v, count(*) AS c FROM pc GROUP BY 1),
cum AS (SELECT v, c, sum(c) OVER (ORDER BY v) AS cum_c FROM vals),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
    CAST(sum(CAST(v AS HUGEINT) * c) AS BIGINT) AS t_rev
  FROM vals
),
spans AS (
  SELECT v, c, cum_c - c AS cb, cum_c, d.decile,
    (d.decile - 1) * (SELECT n FROM tot) // 10 AS lo,
    d.decile * (SELECT n FROM tot) // 10 AS hi
  FROM cum CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS decile) d
),
ov AS (
  SELECT decile, v,
    greatest(0, least(hi, cum_c) - greatest(lo, cb)) AS overlap
  FROM spans
),
per AS (
  SELECT decile, CAST(sum(overlap) AS BIGINT) AS n_customers,
    CAST(sum(CAST(v AS HUGEINT) * overlap) AS BIGINT) AS rev
  FROM ov WHERE overlap > 0 GROUP BY 1
),
wc AS (
  SELECT decile, n_customers, rev,
    CAST(sum(rev) OVER (ORDER BY decile) AS BIGINT) AS cum_rev
  FROM per
)
SELECT CAST(decile AS INT) AS decile,
  n_customers,
  rev AS revenue_cents,
  CAST({ppm_rev} AS BIGINT) AS revenue_share_ppm,
  CAST({ppm_cum} AS BIGINT) AS cum_share_ppm
FROM wc ORDER BY decile
"""


def _fano_oracle() -> str:
    return f"""
WITH {_DAILY_GRID_SQL},
mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS nd,
    CAST(sum(n) AS BIGINT) AS sx, CAST(sum(n * n) AS BIGINT) AS sxx
  FROM grid GROUP BY 1
)
SELECT event_type,
  nd AS n_days,
  sx AS n_events,
  round(CAST(sx AS DOUBLE) / CAST(nd AS DOUBLE), 6) AS mean_daily,
  CASE WHEN sx > 0 THEN
    round(CAST(nd * sxx - sx * sx AS DOUBLE) / CAST(nd * sx AS DOUBLE), 6)
  END AS fano_factor
FROM mom ORDER BY event_type
"""


def _stopword_mass_oracle(top_k: int = 20) -> str:
    return f"""
WITH toks AS (
  SELECT source, unnest({_norm_toks_sql()}) AS term FROM documents
),
top AS (
  SELECT term FROM (
    SELECT term, count(*) AS n FROM toks GROUP BY 1
    ORDER BY n DESC, term ASC LIMIT {top_k}
  )
),
per AS (
  SELECT source, count(*) AS n_tokens,
    sum(CASE WHEN term IN (SELECT term FROM top) THEN 1 ELSE 0 END) AS n_stop_tokens,
    count(DISTINCT CASE WHEN term IN (SELECT term FROM top) THEN term END)
      AS n_stop_terms_present
  FROM toks GROUP BY 1
)
SELECT source,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(n_stop_tokens AS BIGINT) AS n_stop_tokens,
  CAST({_ppm_sql('n_stop_tokens', 'n_tokens')} AS BIGINT) AS stopword_mass_ppm,
  CAST(n_stop_terms_present AS BIGINT) AS n_stop_terms_present
FROM per ORDER BY source
"""


def _theil_hoover_oracle() -> str:
    """Theil/Hoover twin: identical per-value micro-nat freeze,
    HUGEINT exact weighted sums, identical final double trees."""
    return """
WITH pc AS (
  SELECT o_custkey,
    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1
),
vals AS (SELECT v, count(*) AS c FROM pc GROUP BY 1),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
    CAST(sum(CAST(v AS HUGEINT) * c) AS HUGEINT) AS t
  FROM vals
),
terms AS (
  SELECT (SELECT n FROM tot) AS n, (SELECT t FROM tot) AS t,
    CAST(c AS HUGEINT) * CAST(v AS HUGEINT)
      * CAST(round(1000000.0 * ln(CAST(v AS DOUBLE) * CAST((SELECT n FROM tot) AS DOUBLE)
                                   / CAST((SELECT t FROM tot) AS DOUBLE))) AS BIGINT)
      AS theil_term,
    CAST(c AS HUGEINT)
      * abs(CAST(v AS HUGEINT) * CAST((SELECT n FROM tot) AS HUGEINT) - (SELECT t FROM tot))
      AS hoover_term
  FROM vals
),
agg AS (
  SELECT n, t, sum(theil_term) AS s_theil, sum(hoover_term) AS s_hoover
  FROM terms GROUP BY 1, 2
)
SELECT CAST(n AS BIGINT) AS n_customers,
  CAST(t AS BIGINT) AS total_cents,
  round(CAST(s_theil AS DOUBLE) / CAST(t AS DOUBLE) / 1000000.0, 6) AS theil,
  round(CAST(s_hoover AS DOUBLE)
        / (2.0 * CAST(t AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS hoover
FROM agg
"""


def _referential_integrity_oracle() -> str:
    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    parts = []
    for child, ck, parent, pk in edges:
        parts.append(f"""
SELECT '{child}.{ck} -> {parent}.{pk}' AS fk_edge,
  CAST(count(*) AS BIGINT) AS n_child_rows,
  CAST(count(DISTINCT {ck}) AS BIGINT) AS n_child_keys,
  CAST(sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_rows,
  CAST(count(DISTINCT CASE WHEN p.k IS NULL THEN {ck} END) AS BIGINT) AS n_orphan_keys,
  CAST({_ppm_sql('sum(CASE WHEN p.k IS NULL THEN 1 ELSE 0 END)', 'count(*)')} AS BIGINT)
    AS orphan_ppm
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} AS k FROM {parent}) p ON c.{ck} = p.k""")
    return " UNION ALL ".join(parts) + " ORDER BY fk_edge"


def _k_anonymity_oracle(k: int = 5) -> str:
    return f"""
WITH classes AS (
  SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
    count(*) AS class_size,
    count(DISTINCT CASE WHEN c_acctbal < 0 THEN 'neg'
                        WHEN c_acctbal < 5000 THEN 'low'
                        ELSE 'high' END) AS l_diversity
  FROM customer GROUP BY 1, 2
),
tot AS (SELECT sum(class_size) AS n_total FROM classes)
SELECT CAST(nationkey AS BIGINT) AS nationkey, mktsegment,
  CAST(class_size AS BIGINT) AS class_size,
  CAST(CASE WHEN class_size < {k} THEN 1 ELSE 0 END AS BIGINT) AS below_k,
  CAST(l_diversity AS BIGINT) AS l_diversity,
  CAST({_ppm_sql('class_size', '(SELECT n_total FROM tot)')} AS BIGINT) AS class_share_ppm
FROM classes ORDER BY class_size, nationkey, mktsegment
"""


def _forecast_backtest_oracle() -> str:
    """Backtest twin: LEAD over the holt twin's output (a derived
    table, so the fold runs once), exact BIGINT error sums."""
    return f"""
WITH h AS ({_holt_oracle()}),
paired AS (
  SELECT event_type, forecast_next_e2,
    lead(n_events) OVER (PARTITION BY event_type ORDER BY day) * 100 AS next_e2
  FROM h
),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_forecasts,
    CAST(sum(abs(forecast_next_e2 - next_e2)) AS BIGINT) AS abs_err_e2,
    CAST(sum(next_e2) AS BIGINT) AS actual_e2
  FROM paired WHERE next_e2 IS NOT NULL GROUP BY 1
)
SELECT event_type, n_forecasts,
  CAST(abs_err_e2 // n_forecasts AS BIGINT) AS mae_e2,
  CAST({_ppm_sql('abs_err_e2', 'actual_e2')} AS BIGINT) AS wape_ppm
FROM agg ORDER BY event_type
"""


def _source_vocab_overlap_oracle() -> str:
    return f"""
WITH st AS (
  SELECT DISTINCT source, unnest({_norm_toks_sql()}) AS term FROM documents
),
sizes AS (SELECT source, count(*) AS n_terms FROM st GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.src_a, i.src_b,
  CAST(sa.n_terms AS BIGINT) AS n_terms_a,
  CAST(sb.n_terms AS BIGINT) AS n_terms_b,
  CAST(i.n_common AS BIGINT) AS n_common,
  CAST({_ppm_sql('i.n_common', '(sa.n_terms + sb.n_terms - i.n_common)')} AS BIGINT)
    AS jaccard_ppm,
  CAST({_ppm_sql('i.n_common', 'least(sa.n_terms, sb.n_terms)')} AS BIGINT)
    AS overlap_ppm
FROM inter i
JOIN sizes sa ON i.src_a = sa.source
JOIN sizes sb ON i.src_b = sb.source
ORDER BY i.src_a, i.src_b
"""


def _anova_oracle() -> str:
    """ANOVA twin: per-group between-terms frozen to rounded integers
    in 1e12-cent^2 units (identical double trees), exact sums, final
    eta2/F as identical double expressions. Grand totals use distinct
    names (n_all/s_all/ss_all) — both engines resolve identifiers
    case-insensitively, so N/S/SS would collide with n/s/ss."""
    st2 = ("CAST(round(CAST(s_all AS DOUBLE) * CAST(s_all AS DOUBLE)"
           " / CAST(n_all AS DOUBLE) / 1.0e12) AS BIGINT)")
    ss_total = f"(CAST(ss_all AS DOUBLE) / 1.0e12 - CAST({st2} AS DOUBLE))"
    ss_between = f"(CAST(sum_bt_t AS DOUBLE) - CAST({st2} AS DOUBLE))"
    return f"""
WITH g AS (
  SELECT l_returnflag AS returnflag, count(*) AS n,
    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS HUGEINT) AS s,
    CAST(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS HUGEINT)
             * CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS HUGEINT) AS ss
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT returnflag, n, s,
    sum(n) OVER () AS n_all, sum(s) OVER () AS s_all, sum(ss) OVER () AS ss_all,
    count(*) OVER () AS n_groups,
    CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 1.0e12)
         AS BIGINT) AS bt_t,
    CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_d
  FROM g
),
agg AS (
  SELECT n_all, s_all, ss_all, n_groups, CAST(sum(bt_t) AS BIGINT) AS sum_bt_t
  FROM tot GROUP BY 1, 2, 3, 4
),
summary AS (
  SELECT
    round({ss_between} / {ss_total}, 6) AS eta_squared,
    round(({ss_between} / (CAST(n_groups AS DOUBLE) - 1.0))
          / (({ss_total} - {ss_between})
             / (CAST(n_all AS DOUBLE) - CAST(n_groups AS DOUBLE))), 6) AS f_stat
  FROM agg
)
SELECT t.returnflag,
  CAST(t.n AS BIGINT) AS n_items,
  round(t.mean_d / 100.0, 6) AS mean_price,
  s.eta_squared, s.f_stat
FROM tot t CROSS JOIN summary s
ORDER BY t.returnflag
"""


def _sim_histogram_oracle(sample_pct: int = 20) -> str:
    """Histogram twin: identical e6 component freeze makes every dot
    product a sum of integer-valued float64 terms << 2^53 — exact on
    both engines regardless of summation order — then one identical
    floor((dot/(sqrt*sqrt))*10) band tree."""
    return f"""
WITH c AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000000.0)) AS q
  FROM embeddings
  WHERE CAST(concat('0x', substr(md5(CAST(vec_id AS VARCHAR) || '#simhist'), 1, 8))
             AS BIGINT) % 100 < {sample_pct}
),
pairs AS (
  SELECT greatest(least(CAST(floor(list_dot_product(a.q, b.q)
             / (sqrt(list_dot_product(a.q, a.q)) * sqrt(list_dot_product(b.q, b.q)))
             * 10.0) AS INT), 9), -10) AS band
  FROM c a JOIN c b ON a.vec_id < b.vec_id
),
counts AS (SELECT band, count(*) AS n_pairs FROM pairs GROUP BY 1),
tot AS (SELECT sum(n_pairs) AS n_total FROM counts)
SELECT CAST(band AS INT) AS band,
  CAST(n_pairs AS BIGINT) AS n_pairs,
  CAST({_ppm_sql('n_pairs', '(SELECT n_total FROM tot)')} AS BIGINT) AS share_ppm
FROM counts ORDER BY band
"""


def _band_tuning_oracle(num_hashes: int = 12, bucket_cap: int = 200) -> str:
    """Band-tuning twin: ONE materialized signature CTE re-banded per
    configuration (mirroring the Spark localCheckpoint pin), frozen
    S-curve literals from the shared helper."""
    from .operators.dedup import BAND_CONFIGS, lsh_scurve_thresh_e6

    head = f"""
WITH {_shingle_cte(3)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
seeds AS (SELECT unnest(generate_series(0, {num_hashes - 1})) AS j),
sig AS MATERIALIZED (
  SELECT doc_id, j, min(md5(s || '#' || CAST(j AS VARCHAR))) AS mh
  FROM sd, seeds GROUP BY doc_id, j
)"""
    parts = []
    for b in BAND_CONFIGS:
        r = num_hashes // b
        head += f""",
bands_{b} AS MATERIALIZED (
  SELECT doc_id, j // {r} AS band_id, string_agg(mh, '|' ORDER BY j) AS band_key
  FROM sig GROUP BY doc_id, j // {r}
),
buckets_{b} AS MATERIALIZED (
  SELECT band_id, band_key, count(*) AS cnt FROM bands_{b} GROUP BY 1, 2
),
pairs_{b} AS (
  SELECT count(*) AS n_candidate_pairs FROM (
    SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
    FROM bands_{b} a
    JOIN buckets_{b} ka ON ka.band_id = a.band_id AND ka.band_key = a.band_key
      AND ka.cnt <= {bucket_cap}
    JOIN bands_{b} b ON a.band_id = b.band_id AND a.band_key = b.band_key
      AND a.doc_id < b.doc_id
  )
)"""
        parts.append(f"""
SELECT CAST({b} AS INT) AS bands, CAST({r} AS INT) AS rows_per_band,
  CAST({lsh_scurve_thresh_e6(b, r)} AS BIGINT) AS thresh_e6,
  CAST((SELECT count(*) FROM buckets_{b}) AS BIGINT) AS n_buckets,
  CAST((SELECT count(*) FROM buckets_{b} WHERE cnt > {bucket_cap}) AS BIGINT)
    AS n_buckets_capped,
  CAST((SELECT n_candidate_pairs FROM pairs_{b}) AS BIGINT) AS n_candidate_pairs""")
    return head + " UNION ALL ".join(parts) + " ORDER BY bands"


def _fulfillment_latency_oracle() -> str:
    return """
WITH j AS (
  SELECT o_orderpriority AS priority,
    CAST(date_diff('day', o_orderdate, l_shipdate) AS BIGINT) AS days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
vals AS (SELECT priority, days, count(*) AS c FROM j GROUP BY 1, 2),
tot AS (
  SELECT priority, sum(c) AS n, sum(days * c) AS sum_days FROM vals GROUP BY 1
),
cum AS (
  SELECT v.priority, v.days, t.n, t.sum_days,
    sum(v.c) OVER (PARTITION BY v.priority ORDER BY v.days) AS cum
  FROM vals v JOIN tot t ON v.priority = t.priority
)
SELECT priority,
  CAST(n AS BIGINT) AS n_items,
  CAST(sum_days * 100 // n AS BIGINT) AS mean_days_e2,
  CAST(min(CASE WHEN cum * 100 >= 50 * n THEN days END) AS BIGINT) AS p50_days,
  CAST(min(CASE WHEN cum * 100 >= 90 * n THEN days END) AS BIGINT) AS p90_days
FROM cum GROUP BY priority, n, sum_days
ORDER BY priority
"""


def _quality_drift_oracle() -> str:
    """Drift twin: identical unrounded quality expression frozen to
    e6 integers, per-source midpoint split, exact integer-ppm ECDF
    KS per source."""
    from .functions.textfns import STOPWORDS_EN

    stop = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
WITH d AS (
  SELECT source, doc_id, text, {_norm_toks_sql()} AS toks FROM documents
), feat AS (
  SELECT source, doc_id,
    len(toks) AS n_tokens,
    length(regexp_replace(text, '[^\\.\\,\\;\\:\\!\\?]', '', 'g'))
      / greatest(length(text), 1) AS punct_ratio,
    len(list_filter(toks, t -> list_contains([{stop}], t)))
      / greatest(len(toks), 1) AS stopword_ratio,
    1.0 - len(list_distinct(toks)) / greatest(len(toks), 1) AS repetition_ratio
  FROM d
), q AS (
  SELECT source, doc_id,
    CAST(round((
      (CASE WHEN n_tokens >= 10 AND n_tokens <= 10000 THEN 1.0 ELSE 0.3 END) * 0.3
      + (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.5 END) * 0.2
      + (1.0 - repetition_ratio) * 0.3
      + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.6 END) * 0.2
    ) * 1000000) AS BIGINT) AS q_e6
  FROM feat
),
mid AS (
  SELECT source, CAST((min(doc_id) + max(doc_id)) // 2 AS BIGINT) AS mid
  FROM q GROUP BY 1
),
halves AS (
  SELECT q.source, q.q_e6, q.doc_id <= m.mid AS is_early
  FROM q JOIN mid m ON q.source = m.source
),
vals AS (
  SELECT source, q_e6,
    sum(CASE WHEN is_early THEN 1 ELSE 0 END) AS ca,
    sum(CASE WHEN is_early THEN 0 ELSE 1 END) AS cb
  FROM halves GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM vals GROUP BY 1
),
cum AS (
  SELECT v.source, t.na, t.nb,
    sum(v.ca) OVER (PARTITION BY v.source ORDER BY v.q_e6) AS cum_ca,
    sum(v.cb) OVER (PARTITION BY v.source ORDER BY v.q_e6) AS cum_cb
  FROM vals v JOIN tot t ON v.source = t.source
),
gaps AS (
  SELECT source, na, nb,
    abs(({_ppm_sql('cum_ca', 'na')}) - ({_ppm_sql('cum_cb', 'nb')})) AS gap
  FROM cum
)
SELECT source, na AS n_early, nb AS n_late,
  CAST(max(gap) AS BIGINT) AS ks_ppm
FROM gaps GROUP BY source, na, nb ORDER BY source
"""


def _survival_oracle(max_weeks: int = 12) -> str:
    return f"""
WITH per_user AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1
  FROM events GROUP BY 1
),
lt AS (
  SELECT CAST(date_diff('day', d0, d1) // 7 AS BIGINT) AS weeks FROM per_user
),
per_week AS (SELECT weeks, count(*) AS c FROM lt GROUP BY 1),
tot AS (SELECT count(*) AS n_users FROM lt),
grid AS (SELECT CAST(unnest(generate_series(0, {max_weeks})) AS BIGINT) AS week),
surv AS (
  SELECT g.week, CAST(coalesce(sum(p.c), 0) AS BIGINT) AS n_survivors
  FROM grid g LEFT JOIN per_week p ON g.week <= p.weeks
  GROUP BY 1
)
SELECT week, n_survivors,
  CAST({_ppm_sql('n_survivors', '(SELECT n_users FROM tot)')} AS BIGINT) AS survival_ppm
FROM surv ORDER BY week
"""


def _pareto_frontier_oracle() -> str:
    """Skyline twin via explicit NOT-EXISTS dominance — semantically
    identical to the running-min formulation (cross-checked by the
    dominance test), kept independent so the two spellings verify
    each other."""
    return """
WITH pts AS (
  SELECT CAST(p_size AS BIGINT) AS size,
    CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price
  FROM part
),
pairs AS (SELECT size, price, count(*) AS n_parts FROM pts GROUP BY 1, 2),
frontier AS (
  SELECT size, price, n_parts FROM pairs a
  WHERE NOT EXISTS (
    SELECT 1 FROM pairs b
    WHERE b.size >= a.size AND b.price <= a.price
      AND (b.size > a.size OR b.price < a.price)
  )
)
SELECT size, CAST(price AS BIGINT) AS price_cents, CAST(n_parts AS BIGINT) AS n_parts
FROM frontier ORDER BY size DESC
"""


def _hhi_oracle() -> str:
    return f"""
WITH j AS (
  SELECT c_mktsegment AS segment, c_nationkey AS nation,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
cells AS (SELECT segment, nation, CAST(sum(cents) AS BIGINT) AS rev FROM j GROUP BY 1, 2),
seg AS (
  SELECT segment, CAST(sum(rev) AS BIGINT) AS seg_rev, count(*) AS n_nations
  FROM cells GROUP BY 1
),
shares AS (
  SELECT c.segment, s.n_nations, s.seg_rev,
    CAST({_ppm_sql('c.rev', 's.seg_rev')} AS BIGINT) AS share_ppm
  FROM cells c JOIN seg s ON c.segment = s.segment
)
SELECT segment,
  CAST(n_nations AS BIGINT) AS n_nations,
  CAST(seg_rev AS BIGINT) AS revenue_cents,
  CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT) AS hhi_e6,
  CAST(max(share_ppm) AS BIGINT) AS top_share_ppm,
  CAST(100000000 // (sum(share_ppm * share_ppm) // 1000000) AS BIGINT) AS n_effective_e2
FROM shares GROUP BY segment, n_nations, seg_rev ORDER BY segment
"""


def _aov_bridge_oracle() -> str:
    """Bridge twin: identical integer fixed-point decomposition; both
    engines' integer division truncates toward zero (verified), so
    the single post-sum DIV is exact parity."""
    return f"""
WITH o AS (
  SELECT date_trunc('month', o_orderdate) AS month, o_custkey,
    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
cells AS (
  SELECT o.month, c.c_mktsegment AS segment, count(*) AS n,
    CAST(sum(o.cents) AS BIGINT) AS rev
  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
months AS (
  SELECT month, CAST(sum(n) AS BIGINT) AS n_m, CAST(sum(rev) AS BIGINT) AS rev_m
  FROM cells GROUP BY 1
),
enriched AS (
  SELECT c.month, c.segment,
    CAST(c.rev * 100 // c.n AS BIGINT) AS aov_e2,
    CAST({_ppm_sql('c.n', 'm.n_m')} AS BIGINT) AS share_ppm
  FROM cells c JOIN months m ON c.month = m.month
),
pairs AS (
  SELECT cur.month AS month, cur.n_m AS n_cur,
    CAST(cur.rev_m * 100 // cur.n_m AS BIGINT) AS aov_cur_e2,
    CAST(prv.rev_m * 100 // prv.n_m AS BIGINT) AS aov_prev_e2,
    prv.month AS prev_month
  FROM months cur JOIN months prv ON prv.month = cur.month - INTERVAL 1 MONTH
),
terms AS (
  SELECT coalesce(l.month, r.prev_month + INTERVAL 1 MONTH) AS month,
    coalesce(l.aov_cur_s, 0) AS ac, coalesce(l.w_cur, 0) AS wc,
    coalesce(r.aov_prev_s, 0) AS ap, coalesce(r.w_prev, 0) AS wp
  FROM (
    SELECT p.month, p.prev_month, e.segment,
      e.aov_e2 AS aov_cur_s, e.share_ppm AS w_cur
    FROM pairs p LEFT JOIN enriched e ON e.month = p.month
  ) l
  FULL JOIN (
    SELECT month AS prev_month, segment, aov_e2 AS aov_prev_s, share_ppm AS w_prev
    FROM enriched
  ) r ON l.prev_month = r.prev_month AND l.segment = r.segment
),
bridge AS (
  SELECT month,
    CAST(sum(wp * (ac - ap)) // 1000000 AS BIGINT) AS within_e2,
    CAST(sum((wc - wp) * ac) // 1000000 AS BIGINT) AS mix_e2
  FROM terms GROUP BY 1
)
SELECT strftime(p.month, '%Y-%m') AS month,
  CAST(p.n_cur AS BIGINT) AS n_orders,
  p.aov_cur_e2 AS aov_e2,
  CAST(p.aov_cur_e2 - p.aov_prev_e2 AS BIGINT) AS delta_aov_e2,
  b.within_e2, b.mix_e2,
  CAST(p.aov_cur_e2 - p.aov_prev_e2 - b.within_e2 - b.mix_e2 AS BIGINT) AS residual_e2
FROM pairs p JOIN bridge b ON p.month = b.month
ORDER BY month
"""


def _ivf_curve_oracle(
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    probes: tuple = (1, 2, 4, 8),
    train_iters: int = 2,
) -> str:
    """IVF curve twin (trained-vs-baseline, VERDICT r9 task 3): one
    IVF subquery per (geometry, probe) pair over shared CTEs — the
    'first_k' geometry uses the first n_centroids vectors, 'trained'
    the unrolled-kmeans centroids (``_kmeans_ctes`` + one final
    re-estimate, exactly ``ivf_trained_centroids``); identical probe
    plans and the identical probed-cell-size candidate accounting."""
    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    head = f"""
WITH {_kmeans_ctes(n_centroids, train_iters)},
mT AS (
  SELECT cluster AS c_id, i, round(avg(vec[i]), 6) AS m
  FROM a{train_iters} CROSS JOIN dims GROUP BY 1, 2
),
cT AS MATERIALIZED (SELECT c_id, list(m ORDER BY i) AS c_vec FROM mT GROUP BY 1),
-- NOT materialized: bf nests its own WITH c; materializing the outer
-- c alongside that shadowed name trips a DuckDB internal error
-- ("Recursive CTE scan found without recursive CTE node")
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cF AS (SELECT vec_id AS c_id, v AS c_vec FROM c WHERE vec_id < {n_centroids}),
q AS (SELECT vec_id AS q_id, v AS q_vec FROM c WHERE vec_id < {n_queries}),
bf AS ({_ann_bf_oracle(n_queries, k)})"""
    parts = []
    for suf, cents in (("f", "cF"), ("t", "cT")):
        label = "first_k" if suf == "f" else "trained"
        qc = cos.format(a="x.v", b="ct.c_vec")
        head += f""",
asg_{suf} AS MATERIALIZED (
  SELECT x.vec_id, ct.c_id,
    row_number() OVER (PARTITION BY x.vec_id
      ORDER BY {qc} DESC, ct.c_id ASC) AS rn
  FROM c x CROSS JOIN {cents} ct
),
cells_{suf} AS (SELECT vec_id, c_id AS cell FROM asg_{suf} WHERE rn = 1),
sizes_{suf} AS (SELECT cell, count(*) AS sz FROM cells_{suf} GROUP BY 1),
qasg_{suf} AS (
  SELECT vec_id AS q_id, c_id AS cell, rn FROM asg_{suf} WHERE vec_id < {n_queries}
)"""
        for np_ in probes:
            head += f""",
ivf_{suf}_{np_} AS (
  SELECT q_id, vec_id FROM (
    SELECT ca.q_id, ca.vec_id,
      row_number() OVER (PARTITION BY ca.q_id
        ORDER BY {cos.format(a="qq.q_vec", b="cv.v")} DESC, ca.vec_id ASC) AS rank
    FROM (SELECT DISTINCT p.q_id, cc.vec_id
          FROM qasg_{suf} p JOIN cells_{suf} cc ON p.cell = cc.cell
          WHERE p.rn <= {np_} AND cc.vec_id <> p.q_id) ca
    JOIN q qq ON ca.q_id = qq.q_id
    JOIN c cv ON ca.vec_id = cv.vec_id
  ) WHERE rank <= {k}
),
hits_{suf}_{np_} AS (
  SELECT count(*) AS n_hits FROM bf
  WHERE EXISTS (SELECT 1 FROM ivf_{suf}_{np_} i
                WHERE i.q_id = bf.q_id AND i.vec_id = bf.neighbor_id)
),
cand_{suf}_{np_} AS (
  SELECT CAST(sum(s.sz) - {n_queries} AS BIGINT) AS n_candidates
  FROM qasg_{suf} p JOIN sizes_{suf} s ON p.cell = s.cell WHERE p.rn <= {np_}
)"""
            parts.append(f"""
SELECT '{label}' AS centroids, CAST({np_} AS INT) AS n_probe,
  (SELECT n_candidates FROM cand_{suf}_{np_}) AS n_candidates,
  CAST((SELECT n_hits FROM hits_{suf}_{np_}) AS BIGINT) AS n_hits,
  CAST({_ppm_sql(f'(SELECT n_hits FROM hits_{suf}_{np_})', str(n_queries * k))} AS BIGINT)
    AS recall_ppm""")
    return head + " UNION ALL ".join(parts) + " ORDER BY centroids, n_probe"


def _jaccard_sweep_oracle(
    thresholds_ppm: tuple = (300_000, 500_000, 700_000, 900_000),
    num_hashes: int = 12,
    bands: int = 4,
    bucket_cap: int = 200,
) -> str:
    """Sweep twin: the shared capped-candidate CTEs verified by exact
    integer-ppm Jaccard, then one summary row per threshold."""
    head = f"""
WITH {_minhash_cand_ctes(num_hashes, bands, bucket_cap)},
jacc AS MATERIALIZED (
  SELECT c.doc_a, c.doc_b,
    CAST({_ppm_sql('coalesce(i.n_inter, 0)', '(za.sz + zb.sz - coalesce(i.n_inter, 0))')}
      AS BIGINT) AS jacc_ppm
  FROM cand c
  JOIN sizes za ON za.doc_id = c.doc_a
  JOIN sizes zb ON zb.doc_id = c.doc_b
  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
),
toks AS MATERIALIZED (
  SELECT doc_id, len({_norm_toks_sql()}) AS n_tok FROM documents
)"""
    parts = []
    for t in thresholds_ppm:
        parts.append(f"""
SELECT CAST({t} AS BIGINT) AS threshold_ppm,
  CAST((SELECT count(*) FROM jacc WHERE jacc_ppm >= {t}) AS BIGINT) AS n_pairs,
  CAST((SELECT count(*) FROM
        (SELECT DISTINCT doc_b FROM jacc WHERE jacc_ppm >= {t})) AS BIGINT)
    AS n_docs_flagged,
  CAST((SELECT coalesce(sum(n_tok), 0) FROM toks
        WHERE doc_id IN (SELECT DISTINCT doc_b FROM jacc WHERE jacc_ppm >= {t}))
    AS BIGINT) AS tokens_saved""")
    return head + " UNION ALL ".join(parts) + " ORDER BY threshold_ppm"


def _time_to_conversion_oracle() -> str:
    return f"""
WITH fv AS (
  SELECT user_id, min(ts) AS v_ts FROM events WHERE event_type = 'view' GROUP BY 1
),
fc AS (
  SELECT e.user_id, min(e.ts) AS p_ts
  FROM events e JOIN fv ON e.user_id = fv.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= fv.v_ts
  GROUP BY 1
),
lat AS (
  SELECT CASE WHEN fc.p_ts IS NOT NULL
              THEN CAST(date_diff('day', CAST(fv.v_ts AS DATE), CAST(fc.p_ts AS DATE)) AS BIGINT)
              ELSE -1 END AS days
  FROM fv LEFT JOIN fc ON fv.user_id = fc.user_id
),
per_day AS (SELECT days, count(*) AS n_users FROM lat GROUP BY 1),
tot AS (SELECT count(*) AS n_viewers FROM lat)
SELECT CAST(days AS BIGINT) AS days_to_convert,
  CAST(n_users AS BIGINT) AS n_users,
  CAST({_ppm_sql('n_users', '(SELECT n_viewers FROM tot)')} AS BIGINT) AS share_ppm
FROM per_day ORDER BY days_to_convert
"""


def _mmr_oracle(n_queries: int = 8, pool: int = 16, k: int = 3) -> str:
    """MMR twin: identical e6 component freeze (the sim-histogram
    discipline) makes rel/sim exact-input cosines; the greedy argmax
    unrolls into k explicit stages (no recursion — portable), each
    `(7.0*rel - 3.0*max_sim)/10.0` with the same literal spelling and
    op tree as the Spark side so the SELECTION (not just the emitted
    rounded score) is bit-identical. NOT EXISTS anti-joins keep the
    already-picked rows out of each stage."""
    stages = []
    picked_union = "SELECT q_id, c_id FROM s1"
    stages.append(
        """s1 AS (
  SELECT q_id, c_id, rel, (7.0 * rel - 3.0 * 0.0) / 10.0 AS mmr FROM (
    SELECT q_id, c_id, rel,
      row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, c_id ASC) AS prk
    FROM pool
  ) WHERE prk = 1
)"""
    )
    for step in range(2, k + 1):
        stages.append(
            f"""p{step - 1} AS ({picked_union}),
m{step} AS (
  SELECT s.q_id, s.a_id AS c_id, max(s.sim) AS max_sim
  FROM sims s JOIN p{step - 1} p ON s.q_id = p.q_id AND s.b_id = p.c_id
  GROUP BY 1, 2
),
s{step} AS (
  SELECT q_id, c_id, rel, mmr FROM (
    SELECT c.q_id, c.c_id, c.rel,
      (7.0 * c.rel - 3.0 * m.max_sim) / 10.0 AS mmr,
      row_number() OVER (
        PARTITION BY c.q_id
        ORDER BY (7.0 * c.rel - 3.0 * m.max_sim) / 10.0 DESC, c.c_id ASC
      ) AS prk
    FROM pool c
    JOIN m{step} m ON c.q_id = m.q_id AND c.c_id = m.c_id
    WHERE NOT EXISTS (
      SELECT 1 FROM p{step - 1} p WHERE p.q_id = c.q_id AND p.c_id = c.c_id
    )
  ) WHERE prk = 1
)"""
        )
        picked_union += f" UNION ALL SELECT q_id, c_id FROM s{step}"
    finals = " UNION ALL ".join(
        f"SELECT q_id, {s} AS rank, c_id, rel, mmr FROM s{s}" for s in range(1, k + 1)
    )
    return f"""
WITH c AS (
  SELECT vec_id,
    list_transform(CAST(embedding AS DOUBLE[]), x -> round(x * 1000000.0)) AS v
  FROM embeddings
),
n AS (SELECT vec_id, v, list_dot_product(v, v) AS n2 FROM c),
q AS (SELECT vec_id AS q_id, v AS q_vec, n2 AS q_n2 FROM n WHERE vec_id < {n_queries}),
scored AS (
  SELECT q_id, vec_id AS c_id,
    list_dot_product(q_vec, v) / (sqrt(q_n2) * sqrt(n2)) AS rel, v, n2
  FROM q, n WHERE vec_id <> q_id
),
pool AS (
  SELECT q_id, c_id, rel, v, n2 FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY rel DESC, c_id ASC) AS prk
    FROM scored
  ) WHERE prk <= {pool}
),
sims AS (
  SELECT a.q_id, a.c_id AS a_id, b.c_id AS b_id,
    list_dot_product(a.v, b.v) / (sqrt(a.n2) * sqrt(b.n2)) AS sim
  FROM pool a JOIN pool b ON a.q_id = b.q_id AND a.c_id <> b.c_id
),
{", ".join(stages)}
SELECT q_id, CAST(rank AS INT) AS rank, c_id AS selected_id,
  round(rel, 6) AS rel, round(mmr, 6) AS mmr
FROM ({finals}) ORDER BY q_id, rank
"""


def _kappa_oracle() -> str:
    """Kappa twin: composes the two detector oracles verbatim, then
    the same all-BIGINT contingency algebra; kappa_e6 spelled
    sign(num) * ppm(|num|, den) so truncation direction matches."""
    num = (
        "(CAST(n_docs AS BIGINT) * (n11 + n00) - "
        "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))"
    )
    den = (
        "(CAST(n_docs AS BIGINT) * n_docs - "
        "((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))"
    )
    return f"""
WITH g AS (SELECT doc_id, source, keep AS keep_g FROM ({_gopher_oracle()})),
q AS (SELECT doc_id, keep AS keep_q FROM ({_quality_classifier_oracle()})),
cells AS (
  SELECT g.source,
    count(*) AS n_docs,
    CAST(sum(CASE WHEN keep_g AND keep_q THEN 1 ELSE 0 END) AS BIGINT) AS n11,
    CAST(sum(CASE WHEN keep_g AND NOT keep_q THEN 1 ELSE 0 END) AS BIGINT) AS n10,
    CAST(sum(CASE WHEN NOT keep_g AND keep_q THEN 1 ELSE 0 END) AS BIGINT) AS n01,
    CAST(sum(CASE WHEN NOT keep_g AND NOT keep_q THEN 1 ELSE 0 END) AS BIGINT) AS n00
  FROM g JOIN q ON g.doc_id = q.doc_id
  GROUP BY 1
)
SELECT source,
  CAST(n_docs AS BIGINT) AS n_docs,
  n11 AS n_both_keep,
  n10 AS n_gopher_only,
  n01 AS n_classifier_only,
  n00 AS n_both_drop,
  CAST({_ppm_sql('(n11 + n00)', 'n_docs')} AS BIGINT) AS agree_ppm,
  CAST(CASE WHEN {num} >= 0 THEN 1 ELSE -1 END
       * CAST({_ppm_sql(f'abs({num})', den)} AS BIGINT) AS BIGINT) AS kappa_e6
FROM cells ORDER BY source
"""


def _hll_union_oracle(m: int = 64, rmax: int = 24) -> str:
    """Pair-union HLL twin: same hash stream / register algebra as
    `_hll_oracle`, register-wise MAX across each source pair, the
    same pinned alpha / linear-counting literals keyed on the pair,
    inclusion-exclusion on the corrected estimates, exact overlap by
    a term self-join."""
    from .operators.sketches import HLL_ALPHA64_E6, hll_lc_case_sql

    num = HLL_ALPHA64_E6 * m * m * (1 << rmax)
    return f"""
WITH terms AS (
  SELECT DISTINCT source, term FROM (
    SELECT source, unnest({_norm_toks_sql()}) AS term FROM documents
  )
), hashed AS (
  SELECT source,
    CAST(concat('0x', substr(md5(term || '#hll'), 1, 15)) AS BIGINT) AS h
  FROM terms
), regs AS (
  SELECT source, h % {m} AS register,
    CASE WHEN h // {m} = 0 THEN {rmax}
         ELSE least({rmax}, 1 + length(bin(h // {m}))
                    - length(regexp_replace(bin(h // {m}), '0+$', ''))) END AS rho
  FROM hashed
), regmax AS (
  SELECT source, register, max(rho) AS rho FROM regs GROUP BY 1, 2
), per AS (
  SELECT source, count(*) AS n_hit,
    CAST(sum(CAST(1 AS BIGINT) << ({rmax} - rho)) AS BIGINT) AS s_hit
  FROM regmax GROUP BY 1
), est1 AS (
  SELECT source, CAST({m} - n_hit AS BIGINT) AS nz,
    CAST({num} // ((s_hit + ({m} - n_hit) * CAST({1 << rmax} AS BIGINT)) * 1000000)
         AS BIGINT) AS n_hll
  FROM per
), srcest AS (
  SELECT source,
    CAST(CASE WHEN nz > 0 AND n_hll <= {(5 * m) // 2}
         THEN {hll_lc_case_sql('nz')} ELSE n_hll END AS BIGINT) AS n_est
  FROM est1
), srcs AS (SELECT DISTINCT source FROM regmax),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM srcs a JOIN srcs b ON a.source < b.source
), uregs AS (
  SELECT p.source_a, p.source_b, r.register, max(r.rho) AS rho
  FROM pairs p JOIN regmax r ON r.source = p.source_a OR r.source = p.source_b
  GROUP BY 1, 2, 3
), uper AS (
  SELECT source_a, source_b, count(*) AS n_hit,
    CAST(sum(CAST(1 AS BIGINT) << ({rmax} - rho)) AS BIGINT) AS s_hit
  FROM uregs GROUP BY 1, 2
), uest1 AS (
  SELECT source_a, source_b, CAST({m} - n_hit AS BIGINT) AS nz,
    CAST({num} // ((s_hit + ({m} - n_hit) * CAST({1 << rmax} AS BIGINT)) * 1000000)
         AS BIGINT) AS n_hll
  FROM uper
), unionest AS (
  SELECT source_a, source_b,
    CAST(CASE WHEN nz > 0 AND n_hll <= {(5 * m) // 2}
         THEN {hll_lc_case_sql('nz')} ELSE n_hll END AS BIGINT) AS n_union_est
  FROM uest1
), exact AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_overlap_exact
  FROM terms a JOIN terms b ON a.term = b.term AND a.source < b.source
  GROUP BY 1, 2
)
SELECT u.source_a, u.source_b,
  CAST(ea.n_est AS BIGINT) AS n_a_est,
  CAST(eb.n_est AS BIGINT) AS n_b_est,
  CAST(u.n_union_est AS BIGINT) AS n_union_est,
  CAST(greatest(ea.n_est + eb.n_est - u.n_union_est, 0) AS BIGINT) AS n_overlap_est,
  CAST(coalesce(x.n_overlap_exact, 0) AS BIGINT) AS n_overlap_exact,
  CAST({_ppm_sql("abs(greatest(ea.n_est + eb.n_est - u.n_union_est, 0) - coalesce(x.n_overlap_exact, 0))", "greatest(coalesce(x.n_overlap_exact, 0), 1)")} AS BIGINT) AS abs_err_ppm
FROM unionest u
JOIN srcest ea ON ea.source = u.source_a
JOIN srcest eb ON eb.source = u.source_b
LEFT JOIN exact x ON x.source_a = u.source_a AND x.source_b = u.source_b
ORDER BY u.source_a, u.source_b
"""


def _theil_sen_oracle() -> str:
    """Theil-Sen twin: identical signed e6 slope spelling, DISC
    median rn == (n+1) // 2 over integer slopes, residual-median
    intercept."""
    dc = "(CAST(b.cents AS BIGINT) - CAST(a.cents AS BIGINT))"
    dd = "(b.x - a.x)"
    slope = (
        f"CAST(CASE WHEN {dc} >= 0 THEN 1 ELSE -1 END"
        f" * CAST({_ppm_sql(f'abs({dc})', dd)} AS BIGINT) AS BIGINT)"
    )
    return f"""
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
), dx AS (
  SELECT priority, cents,
    date_diff('day', DATE '1992-01-01', day) AS x
  FROM daily
), slopes AS (
  SELECT a.priority, {slope} AS slope_e6
  FROM dx a JOIN dx b ON a.priority = b.priority AND a.x < b.x
), med AS (
  SELECT priority, n_pairs, slope_e6 FROM (
    SELECT priority, slope_e6,
      row_number() OVER (PARTITION BY priority ORDER BY slope_e6) AS rn,
      count(*) OVER (PARTITION BY priority) AS n_pairs
    FROM slopes
  ) WHERE rn = (n_pairs + 1) // 2
), resid AS (
  SELECT d.priority,
    CAST(d.cents AS BIGINT) * 1000000 - m.slope_e6 * CAST(d.x AS BIGINT) AS r_e6
  FROM dx d JOIN med m ON d.priority = m.priority
), icept AS (
  SELECT priority, n_days, r_e6 AS intercept_cents_e6 FROM (
    SELECT priority, r_e6,
      row_number() OVER (PARTITION BY priority ORDER BY r_e6) AS rn,
      count(*) OVER (PARTITION BY priority) AS n_days
    FROM resid
  ) WHERE rn = (n_days + 1) // 2
)
SELECT m.priority,
  CAST(i.n_days AS BIGINT) AS n_days,
  CAST(m.n_pairs AS BIGINT) AS n_pairs,
  m.slope_e6 AS slope_cents_per_day_e6,
  i.intercept_cents_e6
FROM med m JOIN icept i ON m.priority = i.priority
ORDER BY m.priority
"""


def _ann_ndcg_oracle(n_queries: int = 8, k: int = 5) -> str:
    """nDCG twin: the three top-k oracles as subqueries, the same
    pinned discount literals (`ndcg_discounts_e6`) and integer
    gain/DCG algebra, union over the two approximate tiers."""
    from .operators.similarity import ndcg_discounts_e6

    disc = ndcg_discounts_e6(k)
    idcg_e6 = sum((k - i) * disc[i] for i in range(k))
    disc_case = "CASE a.rank " + " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(disc)
    ) + " ELSE 0 END"

    def tier(method: str, sub: str) -> str:
        return f"""
SELECT '{method}' AS method, b.q_id,
  CAST(coalesce(s.n_hits, 0) AS BIGINT) AS n_hits,
  CAST(coalesce(s.dcg_e6, 0) AS BIGINT) AS dcg_e6,
  CAST({_ppm_sql('coalesce(s.dcg_e6, 0)', str(idcg_e6))} AS BIGINT) AS ndcg_ppm
FROM (SELECT DISTINCT q_id FROM bf) b
LEFT JOIN (
  SELECT a.q_id,
    sum(CASE WHEN t.truth_rank IS NOT NULL THEN 1 ELSE 0 END) AS n_hits,
    CAST(sum(CAST(coalesce({k} + 1 - t.truth_rank, 0) AS BIGINT)
             * ({disc_case})) AS BIGINT) AS dcg_e6
  FROM {sub} a
  LEFT JOIN (SELECT q_id, neighbor_id, rank AS truth_rank FROM bf) t
    ON a.q_id = t.q_id AND a.neighbor_id = t.neighbor_id
  GROUP BY 1
) s ON b.q_id = s.q_id"""

    return f"""
WITH bf AS ({_ann_bf_oracle(n_queries, k)}),
ivf AS ({_ann_ivf_oracle(n_queries, k)}),
lsh AS ({_ann_lsh_oracle(n_queries, k)})
{tier("ivf", "ivf")}
UNION ALL
{tier("lsh", "lsh")}
ORDER BY method, q_id
"""


def _mann_whitney_oracle() -> str:
    """Mann-Whitney twin: identical value-grain tie-aware 2*U sum
    (HUGEINT-exact then BIGINT), identical sign * ppm(|num|, na*nb)
    rank-biserial assembly. DuckDB needs no overflow guard twin for
    checked_mul_expr: it errors loudly on BIGINT overflow itself."""
    num = "(u2 - na * nb)"
    rb = _ppm_sql(f"abs({num})", "na * nb")
    return f"""
WITH p0 AS (
  SELECT CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v,
    (p_type LIKE 'PROMO%') AS g
  FROM part
),
vals AS (
  SELECT v, sum(CASE WHEN g THEN 1 ELSE 0 END) AS ca,
    sum(CASE WHEN g THEN 0 ELSE 1 END) AS cb
  FROM p0 GROUP BY 1
),
cum AS (
  SELECT v, ca, cb, sum(cb) OVER (ORDER BY v) AS cum_cb FROM vals
),
agg AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
    CAST(sum(CAST(ca AS HUGEINT) * (2 * (cum_cb - cb) + cb)) AS BIGINT) AS u2
  FROM cum
)
SELECT na AS n_promo, nb AS n_other, u2 AS u2_promo,
  CAST(CASE WHEN {num} < 0 THEN -1 ELSE 1 END * ({rb}) AS BIGINT)
    AS rank_biserial_ppm
FROM agg
"""


def _spearman_oracle() -> str:
    """Spearman twin: identical e1 midrank construction (window at
    day/value grain), exact BIGINT moments, identical double rho
    expression tree."""
    return """
WITH daily AS (
  SELECT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day,
    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
xr AS (
  SELECT priority, day, cents,
    CAST(2 * rank() OVER (PARTITION BY priority ORDER BY day) AS BIGINT) AS x2
  FROM daily
),
vals AS (
  SELECT priority, cents, count(*) AS c FROM daily GROUP BY 1, 2
),
mid AS (
  SELECT priority, cents,
    CAST(2 * coalesce(sum(c) OVER (PARTITION BY priority ORDER BY cents
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS BIGINT) AS y2
  FROM vals
),
ranked AS (
  SELECT xr.priority, xr.x2, mid.y2
  FROM xr JOIN mid ON xr.priority = mid.priority AND xr.cents = mid.cents
),
mom AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(x2) AS BIGINT) AS sx, CAST(sum(y2) AS BIGINT) AS sy,
    CAST(sum(x2 * x2) AS BIGINT) AS sxx, CAST(sum(y2 * y2) AS BIGINT) AS syy,
    CAST(sum(x2 * y2) AS BIGINT) AS sxy
  FROM ranked GROUP BY 1
)
SELECT priority, n AS n_days,
  CAST(n * sxy - sx * sy AS BIGINT) AS sxy_e2,
  round(CAST(n * sxy - sx * sy AS DOUBLE)
    / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
    * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho
FROM mom ORDER BY priority
"""


def _calibration_oracle() -> str:
    """Calibration twin: same e6 score freeze, same clamped
    equal-width bins, same exact integer conf/acc/gap/ECE-term
    algebra."""
    acc = _ppm_sql("n_gold", "n_docs")
    return f"""
WITH scored AS (
  SELECT doc_id, CAST(round(quality_prob * 1000000) AS BIGINT) AS p_e6
  FROM ({_quality_classifier_oracle()})
),
gold AS (SELECT doc_id FROM ({_corpus_filter_oracle()})),
base AS (
  SELECT s.p_e6, CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END AS gold
  FROM scored s LEFT JOIN gold g ON s.doc_id = g.doc_id
),
bins AS (
  SELECT least(p_e6 // 100000, 9) AS bin,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(p_e6) AS BIGINT) AS sum_p_e6,
    CAST(sum(gold) AS BIGINT) AS n_gold
  FROM base GROUP BY 1
)
SELECT CAST(bin AS BIGINT) AS bin, n_docs,
  CAST(sum_p_e6 // n_docs AS BIGINT) AS conf_e6,
  CAST({acc} AS BIGINT) AS acc_ppm,
  CAST(abs(sum_p_e6 // n_docs - ({acc})) AS BIGINT) AS gap_e6,
  CAST(n_docs * abs(sum_p_e6 // n_docs - ({acc})) AS BIGINT) AS ece_term
FROM bins ORDER BY bin
"""


def _trimmed_winsor_oracle(trim_pct: int = 5) -> str:
    """Trimmed/winsorized twin: identical value-grain tail-clamp
    algebra, DECIMAL(38,0)-exact sums, floor-DIV means."""
    return f"""
WITH li0 AS (
  SELECT l_returnflag AS flag,
    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM lineitem
),
vals AS (SELECT flag, v, CAST(count(*) AS BIGINT) AS c FROM li0 GROUP BY 1, 2),
cum AS (
  SELECT flag, v, c,
    CAST(sum(c) OVER (PARTITION BY flag ORDER BY v) AS BIGINT) AS cum_c
  FROM vals
),
tot AS (
  SELECT flag, CAST(sum(c) AS BIGINT) AS n,
    CAST(sum(CAST(v AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS s,
    CAST(sum(c) * {trim_pct} // 100 AS BIGINT) AS k
  FROM vals GROUP BY 1
),
per_flag AS (
  SELECT cum.flag, t.n, t.k, max(t.s) AS s,
    CAST(sum(CAST(v AS DECIMAL(38,0)) * CAST(greatest(CAST(0 AS BIGINT),
      least(c, t.k - (cum_c - c))) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS lo_sum,
    CAST(sum(CAST(v AS DECIMAL(38,0)) * CAST(greatest(CAST(0 AS BIGINT),
      least(c, cum_c - (t.n - t.k))) AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS hi_sum,
    min(CASE WHEN cum_c >= t.k + 1 THEN v END) AS lo_cut,
    min(CASE WHEN cum_c >= t.n - t.k THEN v END) AS hi_cut
  FROM cum JOIN tot t ON cum.flag = t.flag
  GROUP BY 1, 2, 3
)
SELECT flag, n, k AS k_trim,
  -- HUGEINT division: DuckDB's // on DECIMAL operands ROUNDS the
  -- decimal quotient to scale instead of flooring; HUGEINT // is a
  -- true integer floor-div matching Spark's decimal DIV truncation
  CAST(CAST(s AS HUGEINT) // CAST(n AS HUGEINT) AS BIGINT) AS mean_cents,
  CAST(CAST(s - lo_sum - hi_sum AS HUGEINT) // CAST(n - 2 * k AS HUGEINT)
    AS BIGINT) AS trimmed_mean_cents,
  CAST(CAST(s - lo_sum - hi_sum + CAST(k AS DECIMAL(38,0)) * (CAST(lo_cut AS
    DECIMAL(38,0)) + CAST(hi_cut AS DECIMAL(38,0))) AS HUGEINT)
    // CAST(n AS HUGEINT) AS BIGINT) AS winsor_mean_cents,
  CAST(lo_cut AS BIGINT) AS lo_cut_cents,
  CAST(hi_cut AS BIGINT) AS hi_cut_cents
FROM per_flag ORDER BY flag
"""


def _containment_oracle(
    n: int = 3, threshold_ppm: int = 500_000, df_cap: int = 1000
) -> str:
    """Containment twin: identical capped shingle universe and
    inverted-index intersection, exact integer ppm scores."""
    cont = _ppm_sql("i.n_inter", "least(za.sz, zb.sz)")
    jac = _ppm_sql("i.n_inter", "(za.sz + zb.sz - i.n_inter)")
    return f"""
WITH {_shingle_cte(n)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
over_cap AS (SELECT s FROM sd GROUP BY s HAVING count(*) > {df_cap}),
sdc AS (
  SELECT doc_id, s FROM sd
  WHERE NOT EXISTS (SELECT 1 FROM over_cap WHERE over_cap.s = sd.s)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sdc GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
  FROM sdc a JOIN sdc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, CAST(i.n_inter AS BIGINT) AS inter,
  CAST(za.sz AS BIGINT) AS sz_a, CAST(zb.sz AS BIGINT) AS sz_b,
  CAST({cont} AS BIGINT) AS containment_ppm,
  CAST({jac} AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST({cont} AS BIGINT) >= {threshold_ppm}
ORDER BY i.doc_a, i.doc_b
"""


def _epoch_shuffle_oracle(n_epochs: int = 3, shard_tokens: int = 512) -> str:
    """Epoch-shuffle twin: same shard plan subquery, same
    md5(epoch:shard) ordering and per-epoch cumulative tokens."""
    return f"""
WITH d AS (
  SELECT doc_id, len({_norm_toks_sql()}) AS n_tokens FROM documents
), c AS (
  SELECT doc_id, n_tokens,
    coalesce(sum(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM d
), shards AS (
  SELECT CAST(before // {shard_tokens} AS BIGINT) AS shard_id,
    CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS tokens
  FROM c GROUP BY 1
), e AS (SELECT unnest(generate_series(1, {n_epochs})) AS epoch),
fan AS (
  SELECT CAST(e.epoch AS BIGINT) AS epoch, s.shard_id, s.n_docs, s.tokens,
    md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(s.shard_id AS VARCHAR)) AS h
  FROM shards s CROSS JOIN e
)
SELECT epoch,
  CAST(row_number() OVER (PARTITION BY epoch ORDER BY h, shard_id) AS BIGINT) AS pos,
  shard_id, n_docs, tokens,
  CAST(sum(tokens) OVER (PARTITION BY epoch ORDER BY h, shard_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
FROM fan ORDER BY epoch, pos
"""


def _markov_attr_oracle(n_iter: int = 15) -> str:
    """Removal-effect attribution twin: identical journey transition
    extraction, then the identical BIGINT absorption fold unrolled as
    chained CTEs — one chain for the base and one per removed
    channel (the _markov_stationary_oracle shape). Channel list is
    the testdata event-type vocabulary minus 'purchase'; the Spark
    side derives the same set from the observed transitions."""
    channels = ["click", "error", "signup", "view"]
    froms = ", ".join(f"'{s}'" for s in ["START", *channels])
    sql = f"""
WITH seq AS (
  SELECT event_type AS t,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_t
  FROM events
),
edges AS (
  SELECT 'START' AS from_state,
    CASE WHEN t = 'purchase' THEN 'CONV' ELSE t END AS to_state
  FROM seq WHERE prev_t IS NULL OR prev_t = 'purchase'
  UNION ALL
  SELECT t AS from_state,
    CASE WHEN next_t IS NULL THEN 'NULL'
         WHEN next_t = 'purchase' THEN 'CONV'
         ELSE next_t END AS to_state
  FROM seq WHERE t <> 'purchase'
),
counts AS (SELECT from_state, to_state, count(*) AS n FROM edges GROUP BY 1, 2),
tot AS (SELECT from_state, sum(n) AS c_x FROM counts GROUP BY 1),
tr AS MATERIALIZED (
  SELECT c.from_state, c.to_state,
    CAST({_ppm_sql('c.n', 't.c_x')} AS BIGINT) AS p_ppm
  FROM counts c JOIN tot t ON c.from_state = t.from_state
),
froms AS (SELECT unnest([{froms}]) AS s),
v_base_0 AS (SELECT s, CAST(0 AS BIGINT) AS v FROM froms)"""
    variants = [("base", None)] + [(c, c) for c in channels]
    for tag, removed in variants:
        if tag != "base":
            sql += f""",
v_{tag}_0 AS (SELECT s, CAST(0 AS BIGINT) AS v FROM froms)"""
        guard = "" if removed is None else f" AND tr.to_state <> '{removed}'"
        for i in range(1, n_iter + 1):
            # MATERIALIZED per iteration (the stationary-oracle
            # lesson): inlined, DuckDB's optimizer walks a ~300-join
            # inlined plan and planning time explodes (>120 s)
            sql += f""",
v_{tag}_{i} AS MATERIALIZED (
  SELECT f.s,
    CAST((coalesce(cv.p_ppm, 0) * 1000000 + coalesce(agg.acc, 0)) // 1000000
      AS BIGINT) AS v
  FROM froms f
  LEFT JOIN tr cv ON cv.from_state = f.s AND cv.to_state = 'CONV'
  LEFT JOIN (
    SELECT tr.from_state, sum(tr.p_ppm * pv.v) AS acc
    FROM tr JOIN v_{tag}_{i - 1} pv ON tr.to_state = pv.s
    WHERE tr.to_state NOT IN ('CONV', 'NULL'){guard}
    GROUP BY 1
  ) agg ON agg.from_state = f.s
)"""
    unions = "\n  UNION ALL\n".join(
        f"  SELECT '{c}' AS channel,"
        f" (SELECT v FROM v_{c}_{n_iter} WHERE s = 'START') AS conv_without"
        for c in channels
    )
    share = _ppm_sql("effect", "(SELECT te FROM tot_eff)")
    return sql + f""",
base_v AS (SELECT v FROM v_base_{n_iter} WHERE s = 'START'),
variants AS (
{unions}
),
eff AS (
  SELECT channel, (SELECT v FROM base_v) AS base_conv, conv_without,
    (SELECT v FROM base_v) - conv_without AS effect
  FROM variants
),
tot_eff AS (SELECT sum(effect) AS te FROM eff)
SELECT channel, CAST(base_conv AS BIGINT) AS base_conv_ppm,
  CAST(conv_without AS BIGINT) AS conv_without_ppm,
  CAST(effect AS BIGINT) AS removal_effect_ppm,
  CASE WHEN (SELECT te FROM tot_eff) > 0
       THEN CAST({share} AS BIGINT) END AS attribution_ppm
FROM eff ORDER BY channel
"""


def _bot_regularity_oracle(max_cv2_e6: int = 100_000, min_gaps: int = 5) -> str:
    """Bot-regularity twin: identical whole-second gaps, DECIMAL
    moments, HUGEINT floor division for cv^2 (DuckDB DECIMAL `//`
    rounds — the trimmed_winsorized trap)."""
    return f"""
WITH g AS (
  SELECT user_id,
    CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
      ORDER BY ts, event_id)) AS BIGINT) AS gap_us
  FROM events
),
mom AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
    CAST(sum(CAST(gap_us AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s1,
    CAST(sum(CAST(gap_us AS DECIMAL(38,0)) * CAST(gap_us AS DECIMAL(38,0)))
      AS DECIMAL(38,0)) AS s2
  FROM g WHERE gap_us IS NOT NULL GROUP BY 1
),
scored AS (
  SELECT user_id, n AS n_gaps,
    CAST(CAST(s1 AS HUGEINT) // (CAST(n AS HUGEINT) * 1000000) AS BIGINT)
      AS mean_gap_s,
    CAST(CAST((CAST(n AS DECIMAL(38,0)) * s2 - s1 * s1) * 1000000 AS HUGEINT)
      // CAST(s1 * s1 AS HUGEINT) AS BIGINT) AS cv2_e6
  FROM mom WHERE n >= {min_gaps} AND s1 > 0
),
ranked AS (
  SELECT row_number() OVER (ORDER BY cv2_e6, user_id) AS rk, *
  FROM scored
)
SELECT CAST(rk AS BIGINT) AS rk, user_id, n_gaps, mean_gap_s, cv2_e6,
  (cv2_e6 < {max_cv2_e6}) AS flagged
FROM ranked WHERE rk <= 25 ORDER BY rk
"""


def _rake_oracle(max_phrase_len: int = 3, top_k: int = 10) -> str:
    """RAKE twin: identical stopword-run phrase split (positional
    unnest via generate_subscripts), corpus-level deg/freq word
    stats, ppm word scores summed per phrase."""
    from .functions.textfns import STOPWORDS_EN

    stop = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    score = _ppm_sql("s.deg", "s.freq")
    return f"""
WITH toks AS (
  SELECT source, doc_id, unnest(arr) AS tok, generate_subscripts(arr, 1) AS pos
  FROM (SELECT source, doc_id, {_norm_toks_sql()} AS arr FROM documents)
),
marked AS (
  SELECT source, doc_id, tok, pos,
    sum(CASE WHEN list_contains([{stop}], tok) THEN 1 ELSE 0 END)
      OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
  FROM toks
),
words AS (
  SELECT * FROM marked WHERE NOT list_contains([{stop}], tok) AND tok <> ''
),
phr AS (
  SELECT source, doc_id, phrase_id,
    string_agg(tok, ' ' ORDER BY pos) AS phrase, count(*) AS n_words
  FROM words GROUP BY 1, 2, 3
  HAVING count(*) <= {max_phrase_len}
),
members AS (
  SELECT w.source, w.doc_id, w.phrase_id, p.phrase, p.n_words, w.tok AS w
  FROM words w
  JOIN phr p ON w.source = p.source AND w.doc_id = p.doc_id
    AND w.phrase_id = p.phrase_id
),
wstats AS (
  SELECT w, CAST(count(*) AS BIGINT) AS freq, CAST(sum(n_words) AS BIGINT) AS deg
  FROM members GROUP BY 1
),
occ AS (
  SELECT m.source, m.doc_id, m.phrase_id, m.phrase,
    CAST(sum({score}) AS BIGINT) AS score_e6
  FROM members m JOIN wstats s ON m.w = s.w
  GROUP BY 1, 2, 3, 4
),
agg AS (
  SELECT source, phrase, CAST(count(*) AS BIGINT) AS n_occ,
    CAST(max(score_e6) AS BIGINT) AS score_e6
  FROM occ GROUP BY 1, 2
),
ranked AS (
  SELECT source, phrase, n_occ, score_e6,
    row_number() OVER (PARTITION BY source
      ORDER BY score_e6 DESC, phrase ASC) AS rk
  FROM agg
)
SELECT source, CAST(rk AS BIGINT) AS rk, phrase, n_occ, score_e6
FROM ranked WHERE rk <= {top_k} ORDER BY source, rk
"""


def _shapley_oracle(n_iter: int = 15) -> str:
    """Shapley twin: the identical journey matrix and truncating
    absorption fold unrolled per coalition (2^k MATERIALIZED chains),
    then the exact factorial-weighted marginal sum assembled from the
    16 scalar coalition values. k! division is one floor DIV."""
    from itertools import combinations
    from math import factorial

    channels = ["click", "error", "signup", "view"]
    k = len(channels)
    kfact = factorial(k)
    froms = ", ".join(f"'{s}'" for s in ["START", *channels])
    sql = f"""
WITH seq AS (
  SELECT event_type AS t,
    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_t,
    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_t
  FROM events
),
edges AS (
  SELECT 'START' AS from_state,
    CASE WHEN t = 'purchase' THEN 'CONV' ELSE t END AS to_state
  FROM seq WHERE prev_t IS NULL OR prev_t = 'purchase'
  UNION ALL
  SELECT t AS from_state,
    CASE WHEN next_t IS NULL THEN 'NULL'
         WHEN next_t = 'purchase' THEN 'CONV'
         ELSE next_t END AS to_state
  FROM seq WHERE t <> 'purchase'
),
counts AS (SELECT from_state, to_state, count(*) AS n FROM edges GROUP BY 1, 2),
tot AS (SELECT from_state, sum(n) AS c_x FROM counts GROUP BY 1),
tr AS MATERIALIZED (
  SELECT c.from_state, c.to_state,
    CAST({_ppm_sql('c.n', 't.c_x')} AS BIGINT) AS p_ppm
  FROM counts c JOIN tot t ON c.from_state = t.from_state
),
froms AS (SELECT unnest([{froms}]) AS s)"""

    def tag(S):
        return "v" + "".join("1" if c in S else "0" for c in channels)

    subsets = [
        frozenset(S)
        for r in range(k + 1)
        for S in combinations(channels, r)
    ]
    for S in subsets:
        t = tag(S)
        gone = [c for c in channels if c not in S]
        guard = (
            ""
            if not gone
            else " AND tr.to_state NOT IN ("
            + ", ".join(f"'{c}'" for c in gone)
            + ")"
        )
        sql += f""",
{t}_0 AS (SELECT s, CAST(0 AS BIGINT) AS v FROM froms)"""
        for i in range(1, n_iter + 1):
            sql += f""",
{t}_{i} AS MATERIALIZED (
  SELECT f.s,
    CAST((coalesce(cv.p_ppm, 0) * 1000000 + coalesce(agg.acc, 0)) // 1000000
      AS BIGINT) AS v
  FROM froms f
  LEFT JOIN tr cv ON cv.from_state = f.s AND cv.to_state = 'CONV'
  LEFT JOIN (
    SELECT tr.from_state, sum(tr.p_ppm * pv.v) AS acc
    FROM tr JOIN {t}_{i - 1} pv ON tr.to_state = pv.s
    WHERE tr.to_state NOT IN ('CONV', 'NULL'){guard}
    GROUP BY 1
  ) agg ON agg.from_state = f.s
)"""
    sql += ",\nvals AS (\n" + "\n  UNION ALL\n".join(
        f"  SELECT '{tag(S)}' AS coal,"
        f" (SELECT v FROM {tag(S)}_{n_iter} WHERE s = 'START') AS v"
        for S in subsets
    ) + "\n)"
    selects = []
    full = tag(frozenset(channels))
    for c in channels:
        terms = []
        others = [x for x in channels if x != c]
        for r in range(k):
            w = factorial(r) * factorial(k - 1 - r)
            for S in combinations(others, r):
                fs = frozenset(S)
                terms.append(
                    f"{w} * ((SELECT v FROM vals WHERE coal = '{tag(fs | {c})}')"
                    f" - (SELECT v FROM vals WHERE coal = '{tag(fs)}'))"
                )
        alone = tag(frozenset({c}))
        selects.append(
            f"SELECT '{c}' AS channel,\n"
            f"  CAST((SELECT v FROM vals WHERE coal = '{alone}') AS BIGINT)"
            f" AS alone_conv_ppm,\n"
            f"  CAST(({' + '.join(terms)}) // {kfact} AS BIGINT) AS shapley_e6,\n"
            f"  CAST((SELECT v FROM vals WHERE coal = '{full}') AS BIGINT)"
            f" AS full_conv_ppm,\n"
            f"  CAST((((SELECT v FROM vals WHERE coal = '{full}')"
            f" - (SELECT v FROM vals WHERE coal = '{tag(frozenset())}'))"
            f" * {kfact}) // {kfact} AS BIGINT) AS grand_e6"
        )
    return sql + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY channel\n"


def _incremental_mart_oracle() -> str:
    """Incremental-maintenance twin BY FULL REBUILD: reconstruct the
    deterministic second snapshot (the A7 rules) and aggregate it
    directly — hash equality against Spark's v1-mart + CDC-delta
    apply IS the incremental == recompute proof."""
    return """
WITH v2 AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 7 = 0 THEN round(o_totalprice + 10.0, 2)
         ELSE o_totalprice END AS price
  FROM orders WHERE o_orderkey % 11 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS o_orderkey, o_totalprice AS price
  FROM orders WHERE o_orderkey % 13 = 0
)
SELECT CAST(o_orderkey % 16 AS BIGINT) AS bucket,
  CAST(count(*) AS BIGINT) AS n_orders,
  CAST(sum(CAST(CAST(price AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM v2 GROUP BY 1 HAVING count(*) > 0 ORDER BY bucket
"""


def _fd_audit_oracle() -> str:
    """FD-audit twin: identical per-rule (lhs, rhs) counting, majority
    via max, row-level violation mass, exact ppm."""

    def audit(table: str, rule: str, lhs: str, rhs: str) -> str:
        ppm = _ppm_sql("bad_rows", "n_rows")
        return f"""
SELECT '{rule}' AS rule,
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(CASE WHEN n_rhs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_groups,
  CAST(sum(rows) AS BIGINT) AS n_rows,
  CAST(sum(rows - majority) AS BIGINT) AS bad_rows,
  CAST({ppm.replace('bad_rows', 'sum(rows - majority)').replace('n_rows', 'sum(rows)')} AS BIGINT) AS violation_ppm
FROM (
  SELECT l, sum(n) AS rows, max(n) AS majority, count(*) AS n_rhs
  FROM (SELECT {lhs} AS l, {rhs} AS r, count(*) AS n FROM {table} GROUP BY 1, 2)
  GROUP BY 1
)"""

    parts = [
        audit("customer", "c_nationkey->c_mktsegment", "c_nationkey", "c_mktsegment"),
        audit("orders", "o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"),
        audit("lineitem", "l_partkey->l_suppkey", "l_partkey", "l_suppkey"),
        audit("lineitem", "l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"),
    ]
    return "\nUNION ALL\n".join(parts) + "\nORDER BY rule\n"


def _pq_oracle(n_sub: int = 4, codes_per_sub: int = 16) -> str:
    """PQ twin: identical e6 freeze, md5 bottom-k codebooks per
    subspace, exact BIGINT squared distances, argmin with code-id
    tiebreak."""
    dim_per = 64 // n_sub
    subs = ", ".join(str(s) for s in range(n_sub))
    return f"""
WITH base AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
tall AS (
  SELECT vec_id, s.sub,
    list_slice(v, s.sub * {dim_per} + 1, (s.sub + 1) * {dim_per}) AS sv
  FROM base, (SELECT unnest([{subs}]) AS sub) s
),
cb AS (
  SELECT sub AS c_sub, CAST(rk - 1 AS BIGINT) AS code, sv AS cv
  FROM (
    SELECT sub, sv, row_number() OVER (PARTITION BY sub
      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':' || CAST(sub AS VARCHAR)),
               vec_id) AS rk
    FROM tall
  ) WHERE rk <= {codes_per_sub}
),
assigned AS (
  SELECT t.vec_id, t.sub, cb.code,
    CAST(list_sum(list_transform(range(1, {dim_per} + 1),
      i -> (t.sv[i] - cb.cv[i]) * (t.sv[i] - cb.cv[i]))) AS BIGINT) AS d2
  FROM tall t JOIN cb ON t.sub = cb.c_sub
),
best AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      ORDER BY d2 ASC, code ASC) AS rn
    FROM assigned
  ) WHERE rn = 1
),
per_code AS (
  SELECT sub, code, CAST(count(*) AS BIGINT) AS n_assigned,
    CAST(sum(CAST(d2 AS DECIMAL(38,0))) AS BIGINT) AS distortion
  FROM best GROUP BY 1, 2
),
per_sub AS (
  SELECT sub, CAST(sum(n_assigned) AS BIGINT) AS sub_n,
    CAST(sum(CAST(distortion AS DECIMAL(38,0))) AS BIGINT) AS sub_distortion
  FROM per_code GROUP BY 1
)
SELECT CAST(c.sub AS BIGINT) AS sub, c.code, c.n_assigned, c.distortion,
  s.sub_n, s.sub_distortion
FROM per_code c JOIN per_sub s ON c.sub = s.sub
ORDER BY sub, code
"""


def _pq_base_ctes(n_sub: int, codes_per_sub: int) -> str:
    """Shared PQ CTE prefix: e6-frozen ``base`` vectors, the
    (vec x subspace) ``tall`` frame, and the md5 bottom-k baseline
    codebook ``cb``. MATERIALIZED: every consumer re-reads them."""
    dim_per = 64 // n_sub
    subs = ", ".join(str(s) for s in range(n_sub))
    return f"""base AS MATERIALIZED (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
tall AS MATERIALIZED (
  SELECT vec_id, s.sub,
    list_slice(v, s.sub * {dim_per} + 1, (s.sub + 1) * {dim_per}) AS sv
  FROM base, (SELECT unnest([{subs}]) AS sub) s
),
cb AS MATERIALIZED (
  SELECT sub AS c_sub, CAST(rk - 1 AS BIGINT) AS code, sv AS cv
  FROM (
    SELECT sub, sv, row_number() OVER (PARTITION BY sub
      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':' || CAST(sub AS VARCHAR)),
               vec_id) AS rk
    FROM tall
  ) WHERE rk <= {codes_per_sub}
)"""


def _pq_trained_cb_ctes(n_iter: int, dim_per: int) -> str:
    """Unrolled Lloyd subspace k-means mirroring vectors2's
    ``_pq_trained_cb`` (VERDICT r9 task 3, the C33 kmeans oracle
    pattern): cbt0 = the md5 baseline ``cb``; each round assigns
    every ``tall`` sub-vector to its nearest codeword (exact BIGINT
    d2, (d2, code) tiebreak) then re-estimates each codeword as the
    integer-rounded per-dimension mean of its members. avg() over e6
    ints stays exact in double below 2^53 and round() ties break
    away from zero in both engines, so the trained codebook
    ``cbt{n_iter}`` is byte-identical across engines."""
    ctes = [
        f"pdims AS (SELECT unnest(generate_series(1, {dim_per})) AS i)",
        "cbt0 AS (SELECT c_sub, code, cv FROM cb)",
    ]
    for it in range(1, n_iter + 1):
        ctes.append(
            f"""tasg{it} AS (
  SELECT vec_id, sub, code FROM (
    SELECT t.vec_id, t.sub, b.code,
      row_number() OVER (PARTITION BY t.vec_id, t.sub ORDER BY
        list_sum(list_transform(range(1, {dim_per} + 1),
          i -> (t.sv[i] - b.cv[i]) * (t.sv[i] - b.cv[i]))) ASC, b.code ASC) AS rn
    FROM tall t JOIN cbt{it - 1} b ON t.sub = b.c_sub
  ) WHERE rn = 1
)"""
        )
        ctes.append(
            f"""cbt{it} AS MATERIALIZED (
  SELECT c_sub, code, list(mv ORDER BY i) AS cv FROM (
    SELECT a.sub AS c_sub, a.code, d.i AS i,
      CAST(round(avg(t.sv[d.i])) AS BIGINT) AS mv
    FROM tasg{it} a JOIN tall t ON a.vec_id = t.vec_id AND a.sub = t.sub
    CROSS JOIN pdims d
    GROUP BY 1, 2, 3
  ) GROUP BY 1, 2
)"""
        )
    return ",\n".join(ctes)


def _pq_adc_oracle(
    n_queries: int = 8,
    k: int = 5,
    n_sub: int = 4,
    codes_per_sub: int = 16,
    train_iters: int = 2,
) -> str:
    """ADC twin: identical codebooks/codes as _pq_oracle, the
    query-to-codeword LUT, the codes-join ADC sum, exact-integer L2
    truth, and the same (distance, vec_id) top-k tiebreaks — emitted
    once per codebook label ('baseline' md5 bottom-k vs 'trained'
    Lloyd-refined, VERDICT r9 task 3) against ONE shared truth."""
    dim_per = 64 // n_sub
    rec = _ppm_sql("coalesce(h.n_hits, 0)", str(k))
    head = f"""
WITH {_pq_base_ctes(n_sub, codes_per_sub)},
{_pq_trained_cb_ctes(train_iters, dim_per)},
ex AS (
  SELECT q.vec_id AS q_id, f.vec_id,
    CAST(list_sum(list_transform(range(1, 65),
      i -> (f.v[i] - q.v[i]) * (f.v[i] - q.v[i]))) AS BIGINT) AS true_d2
  FROM base f JOIN base q ON f.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
),
exk AS MATERIALIZED (
  SELECT q_id, vec_id, true_d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY true_d2 ASC, vec_id ASC) AS rk FROM ex
  ) WHERE rk <= {k}
),
tm AS (SELECT q_id, CAST(sum(true_d2) AS BIGINT) AS true_d2_sum FROM exk GROUP BY 1)"""
    parts = []
    for label, cbn in (("baseline", "cb"), ("trained", f"cbt{train_iters}")):
        head += f""",
codes_{label} AS (
  SELECT vec_id, sub, code FROM (
    SELECT t.vec_id, t.sub, b.code,
      row_number() OVER (PARTITION BY t.vec_id, t.sub ORDER BY
        list_sum(list_transform(range(1, {dim_per} + 1),
          i -> (t.sv[i] - b.cv[i]) * (t.sv[i] - b.cv[i]))) ASC, b.code ASC) AS rn
    FROM tall t JOIN {cbn} b ON t.sub = b.c_sub
  ) WHERE rn = 1
),
lut_{label} AS (
  SELECT q.vec_id AS q_id, q.sub, b.code,
    CAST(list_sum(list_transform(range(1, {dim_per} + 1),
      i -> (q.sv[i] - b.cv[i]) * (q.sv[i] - b.cv[i]))) AS BIGINT) AS lut_d2
  FROM tall q JOIN {cbn} b ON q.sub = b.c_sub
  WHERE q.vec_id < {n_queries}
),
adc_{label} AS (
  SELECT l.q_id, c.vec_id, CAST(sum(l.lut_d2) AS BIGINT) AS adc_d2
  FROM codes_{label} c JOIN lut_{label} l ON c.sub = l.sub AND c.code = l.code
  WHERE c.vec_id <> l.q_id GROUP BY 1, 2
),
adck_{label} AS MATERIALIZED (
  SELECT q_id, vec_id, adc_d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id
      ORDER BY adc_d2 ASC, vec_id ASC) AS rk FROM adc_{label}
  ) WHERE rk <= {k}
),
h_{label} AS (
  SELECT a.q_id, CAST(count(*) AS BIGINT) AS n_hits
  FROM adck_{label} a JOIN exk e ON a.q_id = e.q_id AND a.vec_id = e.vec_id
  GROUP BY 1
),
am_{label} AS (
  SELECT q_id, CAST(sum(adc_d2) AS BIGINT) AS adc_d2_sum
  FROM adck_{label} GROUP BY 1
)"""
        parts.append(
            f"""
SELECT '{label}' AS codebook, tm.q_id,
  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
  CAST({rec} AS BIGINT) AS recall_ppm, am.adc_d2_sum, tm.true_d2_sum
FROM tm JOIN am_{label} am ON tm.q_id = am.q_id
LEFT JOIN h_{label} h ON tm.q_id = h.q_id"""
        )
    return head + " UNION ALL ".join(parts) + " ORDER BY codebook, q_id"


def _ivf_pq_oracle(
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_sub: int = 4,
    codes_per_sub: int = 16,
) -> str:
    """IVFADC twin: C9's cell/probe CTEs bound the candidate set,
    C130's codebook/codes/LUT CTEs score it — exact BIGINT ADC
    distances, (adc_d2, vec_id) top-k tiebreak."""
    dim_per = 64 // n_sub
    subs = ", ".join(str(s) for s in range(n_sub))
    cos = (
        "round(list_dot_product({a}, {b}) / "
        "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cents AS (SELECT vec_id AS c_id, v AS c_vec FROM c WHERE vec_id < {n_centroids}),
assign AS (
  SELECT vec_id, c_id, {cos.format(a="v", b="c_vec")} AS c_sim
  FROM c, cents
),
cells AS (
  SELECT vec_id, c_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY c_sim DESC, c_id ASC) AS rn
    FROM assign) WHERE rn = 1
),
q AS (SELECT vec_id AS q_id, v AS q_vec FROM c WHERE vec_id < {n_queries}),
qassign AS (
  SELECT q_id, c_id, {cos.format(a="q_vec", b="c_vec")} AS c_sim
  FROM q, cents
),
probes AS (
  SELECT q_id, c_id AS cell FROM (
    SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY c_sim DESC, c_id ASC) AS rn
    FROM qassign) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.q_id, cc.vec_id
  FROM probes p JOIN cells cc ON p.cell = cc.cell
  WHERE cc.vec_id <> p.q_id
),
base AS (
  SELECT vec_id,
    list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS v
  FROM embeddings
),
tall AS (
  SELECT vec_id, s.sub,
    list_slice(v, s.sub * {dim_per} + 1, (s.sub + 1) * {dim_per}) AS sv
  FROM base, (SELECT unnest([{subs}]) AS sub) s
),
cb AS (
  SELECT sub AS c_sub, CAST(rk - 1 AS BIGINT) AS code, sv AS cv
  FROM (
    SELECT sub, sv, row_number() OVER (PARTITION BY sub
      ORDER BY md5(CAST(vec_id AS VARCHAR) || ':' || CAST(sub AS VARCHAR)),
               vec_id) AS rk
    FROM tall
  ) WHERE rk <= {codes_per_sub}
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT t.vec_id, t.sub, cb.code,
      row_number() OVER (PARTITION BY t.vec_id, t.sub ORDER BY
        list_sum(list_transform(range(1, {dim_per} + 1),
          i -> (t.sv[i] - cb.cv[i]) * (t.sv[i] - cb.cv[i]))) ASC, cb.code ASC) AS rn
    FROM tall t JOIN cb ON t.sub = cb.c_sub
  ) WHERE rn = 1
),
lut AS (
  SELECT q.vec_id AS q_id, q.sub, cb.code,
    CAST(list_sum(list_transform(range(1, {dim_per} + 1),
      i -> (q.sv[i] - cb.cv[i]) * (q.sv[i] - cb.cv[i]))) AS BIGINT) AS lut_d2
  FROM tall q JOIN cb ON q.sub = cb.c_sub
  WHERE q.vec_id < {n_queries}
),
adc AS (
  SELECT ca.q_id, ca.vec_id, CAST(sum(l.lut_d2) AS BIGINT) AS adc_d2
  FROM cand ca JOIN codes co ON ca.vec_id = co.vec_id
  JOIN lut l ON l.q_id = ca.q_id AND l.sub = co.sub AND l.code = co.code
  GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY adc_d2 ASC, vec_id ASC) AS rank
  FROM adc
)
SELECT q_id, CAST(rank AS INT) AS rank, vec_id AS neighbor_id, adc_d2
FROM ranked WHERE rank <= {k}
"""


def _rank_normalize_oracle() -> str:
    """Quantile-transform twin: identical e6 quality freeze (the
    drift-oracle expression), value-grain cum-before deciles (tied
    blocks land in one decile via their first row), exact BIGINT
    bounds and mean."""
    from .functions.textfns import STOPWORDS_EN

    stop = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    return f"""
WITH d AS (
  SELECT source, doc_id, text, {_norm_toks_sql()} AS toks FROM documents
), feat AS (
  SELECT source, doc_id,
    len(toks) AS n_tokens,
    length(regexp_replace(text, '[^\\.\\,\\;\\:\\!\\?]', '', 'g'))
      / greatest(length(text), 1) AS punct_ratio,
    len(list_filter(toks, t -> list_contains([{stop}], t)))
      / greatest(len(toks), 1) AS stopword_ratio,
    1.0 - len(list_distinct(toks)) / greatest(len(toks), 1) AS repetition_ratio
  FROM d
), q AS (
  SELECT source, doc_id,
    CAST(round((
      (CASE WHEN n_tokens >= 10 AND n_tokens <= 10000 THEN 1.0 ELSE 0.3 END) * 0.3
      + (CASE WHEN stopword_ratio >= 0.05 THEN 1.0 ELSE 0.5 END) * 0.2
      + (1.0 - repetition_ratio) * 0.3
      + (CASE WHEN punct_ratio <= 0.2 THEN 1.0 ELSE 0.6 END) * 0.2
    ) * 1000000) AS BIGINT) AS q_e6
  FROM feat
),
vals AS (SELECT source, q_e6, count(*) AS c FROM q GROUP BY 1, 2),
cum AS (
  SELECT source, q_e6, c,
    coalesce(sum(c) OVER (PARTITION BY source ORDER BY q_e6
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM vals
),
tot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_src FROM vals GROUP BY 1),
dec AS (
  SELECT cum.source, q_e6, c,
    least(CAST(10 * cb // n_src AS BIGINT), 9) AS decile
  FROM cum JOIN tot ON cum.source = tot.source
)
SELECT source, CAST(decile AS BIGINT) AS decile,
  CAST(sum(c) AS BIGINT) AS n_docs,
  CAST(min(q_e6) AS BIGINT) AS q_lo_e6,
  CAST(max(q_e6) AS BIGINT) AS q_hi_e6,
  CAST(CAST(sum(CAST(q_e6 AS DECIMAL(38,0)) * c) AS HUGEINT)
    // CAST(sum(c) AS HUGEINT) AS BIGINT) AS mean_q_e6
FROM dec GROUP BY 1, 2 ORDER BY source, decile
"""


def _order_reconciliation_oracle() -> str:
    """Reconciliation twin: identical rounding-free cents-e4 integer
    algebra (disc/tax are exact 2dp multiples), HUGEINT divisions."""
    ppm = _ppm_sql("n_within_1pct", "n_orders")
    return f"""
WITH per_order AS (
  SELECT l_orderkey,
    CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
      * (100 - CAST(round(l_discount * 100) AS BIGINT))
      * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT) AS recompute_e4
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderpriority AS priority,
    CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS header_cents,
    coalesce(p.recompute_e4, 0) AS recompute_e4
  FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
),
scored AS (
  SELECT priority,
    abs(header_cents * 10000 - recompute_e4) AS abs_gap_e4,
    CASE WHEN header_cents * 10000 = recompute_e4 THEN 1 ELSE 0 END AS exact_m,
    CASE WHEN abs(header_cents * 10000 - recompute_e4) * 100
              <= header_cents * 10000 THEN 1 ELSE 0 END AS within_1pct
  FROM j
),
agg AS (
  SELECT priority, CAST(count(*) AS BIGINT) AS n_orders,
    CAST(sum(exact_m) AS BIGINT) AS n_exact,
    CAST(sum(within_1pct) AS BIGINT) AS n_within_1pct,
    CAST(CAST(sum(CAST(abs_gap_e4 AS DECIMAL(38,0))) AS HUGEINT)
      // (CAST(count(*) AS HUGEINT) * 10000) AS BIGINT) AS mean_abs_gap_cents,
    CAST(max(abs_gap_e4) // 10000 AS BIGINT) AS max_abs_gap_cents
  FROM scored GROUP BY 1
)
SELECT priority, n_orders, n_exact, n_within_1pct,
  CAST({ppm} AS BIGINT) AS within_1pct_ppm,
  mean_abs_gap_cents, max_abs_gap_cents
FROM agg ORDER BY priority
"""


def _idf_jaccard_oracle(
    n: int = 3, threshold_ppm: int = 250_000, df_cap: int = 1000
) -> str:
    """Weighted-Jaccard twin: identical 1e6//df integer rarity
    weights over the capped shingle universe, exact ppm ratios."""
    wj = _ppm_sql("i.w_inter", "(za.wsz + zb.wsz - i.w_inter)")
    uj = _ppm_sql("i.n_inter", "(za.sz + zb.sz - i.n_inter)")
    return f"""
WITH {_shingle_cte(n)},
sd AS (SELECT DISTINCT doc_id, s FROM shing),
dfs AS (SELECT s, count(*) AS df FROM sd GROUP BY 1),
sdc AS (
  SELECT sd.doc_id, sd.s, CAST(1000000 // dfs.df AS BIGINT) AS w
  FROM sd JOIN dfs ON sd.s = dfs.s WHERE dfs.df <= {df_cap}
),
sizes AS (
  SELECT doc_id, count(*) AS sz, CAST(sum(w) AS BIGINT) AS wsz
  FROM sdc GROUP BY 1
),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter,
    CAST(sum(a.w) AS BIGINT) AS w_inter
  FROM sdc a JOIN sdc b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.w_inter,
  za.wsz AS w_a, zb.wsz AS w_b,
  CAST({wj} AS BIGINT) AS wjaccard_ppm,
  CAST({uj} AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE CAST({wj} AS BIGINT) >= {threshold_ppm}
ORDER BY i.doc_a, i.doc_b
"""


def _checksum_manifest_oracle() -> str:
    """Manifest twin: identical canonical row strings, identical
    60-bit md5-prefix signatures ('0x'||hex cast), bit_xor."""

    def sig(prefix: str, cols: str) -> str:
        s = f"concat_ws('|', '{prefix}', {cols})"
        return f"CAST(('0x' || substring(md5({s}), 1, 15)) AS BIGINT)"

    o = sig(
        "o",
        "CAST(o_orderkey AS VARCHAR),"
        " CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR),"
        " CAST(CAST(o_orderdate AS DATE) AS VARCHAR)",
    )
    li = sig(
        "l",
        "CAST(l_orderkey AS VARCHAR), CAST(l_linenumber AS VARCHAR),"
        " CAST(l_partkey AS VARCHAR),"
        " CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR)",
    )
    c = sig(
        "c",
        "CAST(c_custkey AS VARCHAR), CAST(c_nationkey AS VARCHAR), c_mktsegment",
    )
    d = sig("d", "CAST(doc_id AS VARCHAR), md5(text)")
    return f"""
SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
  CAST(bit_xor({c}) AS BIGINT) AS xor_checksum FROM customer
UNION ALL
SELECT 'documents', CAST(count(*) AS BIGINT), CAST(bit_xor({d}) AS BIGINT) FROM documents
UNION ALL
SELECT 'lineitem', CAST(count(*) AS BIGINT), CAST(bit_xor({li}) AS BIGINT) FROM lineitem
UNION ALL
SELECT 'orders', CAST(count(*) AS BIGINT), CAST(bit_xor({o}) AS BIGINT) FROM orders
ORDER BY table_name
"""


def _embedding_clusters_oracle(threshold: float = 0.4) -> str:
    """Embedding-components twin: the C6 cosine pair SQL feeding the
    same recursive min-reachable-id CTE as _clusters_oracle."""
    return f"""
WITH RECURSIVE
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
pairs AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
  FROM c a JOIN c b ON a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
        >= {threshold}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT CAST(id AS BIGINT) AS vec_id, CAST(min(comp) AS BIGINT) AS cluster_id
FROM reach GROUP BY 1 ORDER BY 1
"""


def _emb_posting_ctes(n_planes: int = 48, bands: int = 8, dim: int = 64) -> str:
    """Shared posting-stage CTEs for the embedding band family
    (operators/similarity.py embedding_band_postings): identical md5
    hyperplanes and banded sign-bit keys. Ends with
    ``posts(vec_id, band_id, band_val)`` (a ``c(vec_id, v)`` CTE
    rides along for downstream verify joins)."""
    from .operators.similarity import _hyperplanes

    bits_per_band = n_planes // bands
    planes = _hyperplanes(dim, n_planes)

    def band_val(b: int) -> str:
        bits = []
        for i in range(bits_per_band):
            plane = planes[b * bits_per_band + i]
            terms = " + ".join(
                f"v[{d + 1}] * ({coef!r})" for d, coef in enumerate(plane)
            )
            bits.append(f"CASE WHEN ({terms}) >= 0 THEN {1 << i} ELSE 0 END")
        return " + ".join(bits)

    band_structs = ", ".join(
        f"{{'band_id': {b}, 'band_val': CAST({band_val(b)} AS BIGINT)}}"
        for b in range(bands)
    )
    return f"""
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
s AS (SELECT vec_id, [{band_structs}] AS bk FROM c),
posts AS (
  SELECT vec_id, band_id, band_val
  FROM (SELECT vec_id, unnest(bk, recursive := true) FROM s)
)"""


def _banded_pairs_sql(
    threshold: float = 0.4,
    n_planes: int = 48,
    bands: int = 8,
    dim: int = 64,
    bucket_cap: int = 2000,
) -> str:
    """Shared CTE chain for the banded within-corpus pair stage
    (operators/similarity.py banded_corpus_pairs): the shared posting
    CTEs + bucket_cap window guard, bare-id candidate distinct,
    6dp-rounded exact-cosine verify. Ends with a CTE named
    ``bpairs(id_a, id_b, cos_sim)``."""
    cos = (
        "round(list_dot_product(x.v, y.v) /"
        " (sqrt(list_dot_product(x.v, x.v)) *"
        " sqrt(list_dot_product(y.v, y.v))), 6)"
    )
    # cos is evaluated ONCE in an inner projection then filtered —
    # the SELECT+WHERE double evaluation was ~2x the oracle's work
    # and the biggest DuckDB memory spike in the full-sweep gate
    return f"""
{_emb_posting_ctes(n_planes, bands, dim)},
capped AS (
  SELECT vec_id, band_id, band_val FROM (
    SELECT *, count(*) OVER (PARTITION BY band_id, band_val) AS _n FROM posts
  ) WHERE _n <= {bucket_cap}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM capped a JOIN capped b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.vec_id < b.vec_id
),
bpairs AS (
  SELECT id_a, id_b, cos_sim FROM (
    SELECT id_a, id_b, {cos} AS cos_sim
    FROM cand JOIN c x ON cand.id_a = x.vec_id JOIN c y ON cand.id_b = y.vec_id
  ) WHERE cos_sim >= {threshold}
)"""


def _emb_skew_oracle(
    n_planes: int = 48, bands: int = 8, dim: int = 64, bucket_cap: int = 2000
) -> str:
    """Embedding band-bucket skew twin (operators/similarity.py
    embedding_band_skew_audit) over the shared posting CTEs — the
    C136 pricing algebra on hyperplane buckets."""
    return f"""
WITH {_emb_posting_ctes(n_planes, bands, dim)},
bk AS (SELECT band_id, band_val, count(*) AS c FROM posts GROUP BY 1, 2)
SELECT CAST(band_id AS BIGINT) AS band_id,
  CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(sum(c) AS BIGINT) AS n_postings,
  CAST(max(c) AS BIGINT) AS max_bucket,
  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton,
  CAST(sum(CASE WHEN c > {bucket_cap} THEN 1 ELSE 0 END) AS BIGINT) AS n_over_cap,
  CAST(sum(CASE WHEN c > {bucket_cap} THEN c ELSE 0 END) AS BIGINT) AS postings_dropped,
  CAST(sum(c * (c - 1) // 2) AS BIGINT) AS pairs_uncapped,
  CAST(sum(CASE WHEN c <= {bucket_cap} THEN c * (c - 1) // 2 ELSE 0 END) AS BIGINT)
    AS pairs_after_cap
FROM bk GROUP BY 1 ORDER BY 1
"""


def _banded_clusters_oracle(threshold: float = 0.4) -> str:
    """Banded-components twin (operators/similarity.py
    embedding_dup_clusters_banded): the banded pair chain feeding the
    same recursive min-reachable-id CTE as _embedding_clusters_oracle."""
    return f"""
WITH RECURSIVE
{_banded_pairs_sql(threshold)},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM bpairs
  UNION ALL
  SELECT id_b, id_a FROM bpairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT CAST(id AS BIGINT) AS vec_id, CAST(min(comp) AS BIGINT) AS cluster_id
FROM reach GROUP BY 1 ORDER BY 1
"""


def _banded_recall_oracle(threshold: float = 0.4) -> str:
    """Banded-recall twin (operators/similarity.py
    banded_neardup_recall): banded pairs vs the C133 exact pair SQL,
    recall in exact ppm, NULL on an empty exact side."""
    return f"""
WITH
{_banded_pairs_sql(threshold)},
exact AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM c a JOIN c b ON a.vec_id < b.vec_id
  WHERE round(list_dot_product(a.v, b.v) /
        (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6)
        >= {threshold}
),
counts AS (
  SELECT
    (SELECT count(*) FROM exact) AS n_exact,
    (SELECT count(*) FROM bpairs) AS n_banded,
    (SELECT count(*) FROM exact JOIN bpairs USING (id_a, id_b)) AS n_caught
)
SELECT CAST(n_exact AS BIGINT) AS n_exact_pairs,
  CAST(n_banded AS BIGINT) AS n_banded_pairs,
  CAST(n_caught AS BIGINT) AS n_caught,
  CASE WHEN n_exact > 0
       THEN CAST({_ppm_sql('n_caught', 'n_exact')} AS BIGINT) END AS recall_ppm
FROM counts
"""


def _term_burst_oracle(
    top_m: int = 50,
    bucket_width: int = 50,
    factor_e6: int = 2_000_000,
    min_prior: int = 3,
) -> str:
    """Burst twin: identical top-m gate, trailing cum counts, and the
    division-free BIGINT cross-multiplication burst rule."""
    ratio = _ppm_sql("(c * n_prior)", "cum_before")
    return f"""
WITH toks AS (
  SELECT doc_id // {bucket_width} AS bucket,
    unnest({_norm_toks_sql()}) AS term
  FROM documents
),
tk AS (SELECT * FROM toks WHERE term <> ''),
top AS (
  SELECT term FROM (
    SELECT term, count(*) AS total,
      row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rk
    FROM tk GROUP BY 1
  ) WHERE rk <= {top_m}
),
counts AS (
  SELECT tk.term, tk.bucket, CAST(count(*) AS BIGINT) AS c
  FROM tk JOIN top ON tk.term = top.term GROUP BY 1, 2
),
scored AS (
  SELECT term, bucket, c,
    CAST(coalesce(sum(c) OVER (PARTITION BY term ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before,
    CAST(coalesce(count(c) OVER (PARTITION BY term ORDER BY bucket
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_prior
  FROM counts
),
eligible AS (
  SELECT term, CAST(bucket AS BIGINT) AS bucket, c AS n_count, n_prior,
    cum_before, CAST({ratio} AS BIGINT) AS burst_ppm,
    (c * n_prior * 1000000 > CAST({factor_e6} AS BIGINT) * cum_before)
      AS bursting
  FROM scored WHERE n_prior >= {min_prior}
),
ranked AS (
  SELECT row_number() OVER (ORDER BY burst_ppm DESC, term ASC, bucket ASC)
    AS rk, *
  FROM eligible
)
SELECT CAST(rk AS BIGINT) AS rk, term, bucket, n_count, n_prior, cum_before,
  burst_ppm, bursting
FROM ranked WHERE rk <= 20 ORDER BY rk
"""


# ----------------------------------------------------------- r6 oracles


def _mad_anomaly_oracle(
    trailing_days: int = 14, min_trailing: int = 7, thresh_e3: int = 3000
) -> str:
    """Median/MAD anomaly twin (operators/timeseries.py
    mad_anomaly_events): trailing list window, exact doubled order
    statistics (med2/mad4), pure-BIGINT cross-multiplied flag."""
    return f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2
), win AS (
  SELECT event_type, day, n_events,
    list(n_events) OVER (PARTITION BY event_type ORDER BY day
      ROWS BETWEEN {trailing_days} PRECEDING AND 1 PRECEDING) AS wl
  FROM daily
), m1 AS (
  SELECT event_type, day, n_events, len(wl) AS m, list_sort(wl) AS ws, wl
  FROM win
), m2 AS (
  SELECT *, ws[(m + 1) // 2] + ws[m // 2 + 1] AS med2
  FROM m1 WHERE m >= {min_trailing}
), m3 AS (
  SELECT *, list_sort(list_transform(wl, v -> abs(2 * v - med2))) AS ds FROM m2
), m4 AS (
  SELECT *, ds[(m + 1) // 2] + ds[m // 2 + 1] AS mad4 FROM m3
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
  CAST(m AS BIGINT) AS n_trailing,
  CAST(med2 AS BIGINT) AS med2, CAST(mad4 AS BIGINT) AS mad4,
  CASE WHEN mad4 > 0
       THEN round(2.0 * CAST(2 * n_events - med2 AS DOUBLE)
                  / CAST(mad4 AS DOUBLE), 6) END AS robust_z,
  (2000 * abs(2 * n_events - med2) > {thresh_e3} * mad4) AS is_anomaly
FROM m4 ORDER BY event_type, day
"""


def _mad_anomaly_daily_oracle(
    trailing_days: int = 14, min_trailing: int = 7, thresh_e3: int = 3000
) -> str:
    """Gap-filled MAD twin (operators/timeseries.py
    mad_anomaly_from_counts_daily): B130's exact doubled order
    statistics over the B31 zero-filled days x types grid."""
    return f"""
WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS d0, max(CAST(ts AS DATE)) AS d1 FROM events),
days AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP),
                                            INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
types AS (SELECT DISTINCT event_type FROM events),
obs AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1, 2
), daily AS (
  SELECT g.event_type, g.day, CAST(coalesce(o.n_events, 0) AS BIGINT) AS n_events
  FROM (SELECT day, event_type FROM days, types) g
  LEFT JOIN obs o ON g.day = o.day AND g.event_type = o.event_type
), win AS (
  SELECT event_type, day, n_events,
    list(n_events) OVER (PARTITION BY event_type ORDER BY day
      ROWS BETWEEN {trailing_days} PRECEDING AND 1 PRECEDING) AS wl
  FROM daily
), m1 AS (
  SELECT event_type, day, n_events, len(wl) AS m, list_sort(wl) AS ws, wl
  FROM win
), m2 AS (
  SELECT *, ws[(m + 1) // 2] + ws[m // 2 + 1] AS med2
  FROM m1 WHERE m >= {min_trailing}
), m3 AS (
  SELECT *, list_sort(list_transform(wl, v -> abs(2 * v - med2))) AS ds FROM m2
), m4 AS (
  SELECT *, ds[(m + 1) // 2] + ds[m // 2 + 1] AS mad4 FROM m3
)
SELECT event_type, day, CAST(n_events AS BIGINT) AS n_events,
  CAST(m AS BIGINT) AS n_trailing,
  CAST(med2 AS BIGINT) AS med2, CAST(mad4 AS BIGINT) AS mad4,
  CASE WHEN mad4 > 0
       THEN round(2.0 * CAST(2 * n_events - med2 AS DOUBLE)
                  / CAST(mad4 AS DOUBLE), 6) END AS robust_z,
  (2000 * abs(2 * n_events - med2) > {thresh_e3} * mad4) AS is_anomaly
FROM m4 ORDER BY event_type, day
"""


def _hits_oracle(n_iter: int = 2) -> str:
    """HITS twin (operators/graph.py hits_hub_authority): unrolled
    half-iterations in exact e6 BIGINTs; the only float op per step
    is the one normalize divide, an identical tree on both engines.
    MATERIALIZED iterates keep DuckDB's planner off the inlined join
    tree (the unrolled-CTE discipline)."""
    # zero/NULL-total guard mirrors the engine's _normalize CASE
    # (ADVICE r7: the engine emits 0 scores on a zero-weight graph;
    # an unguarded divide here would render NULL/inf instead and
    # leave that branch untwinned)
    norm = (
        "CASE WHEN coalesce((SELECT sum(raw) FROM {src}), 0) > 0"
        " THEN CAST(round(CAST(raw AS DOUBLE)"
        " / CAST((SELECT sum(raw) FROM {src}) AS DOUBLE)"
        " * 1000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    ctes = [
        """trade AS MATERIALIZED (
  SELECT o_custkey AS ck, l_suppkey AS sk, count(*) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey GROUP BY 1, 2
)""",
        "h0 AS (SELECT c_custkey AS ck, CAST(1000000 AS BIGINT) AS s FROM customer)",
    ]
    for it in range(1, n_iter + 1):
        prev_h = f"h{it - 1}"
        ctes.append(
            f"""a{it}r AS MATERIALIZED (
  SELECT sk, sum(w * s) AS raw FROM trade JOIN {prev_h} USING (ck) GROUP BY 1
)"""
        )
        ctes.append(
            f"a{it} AS MATERIALIZED (SELECT sk, {norm.format(src=f'a{it}r')} AS s FROM a{it}r)"
        )
        ctes.append(
            f"""h{it}r AS MATERIALIZED (
  SELECT ck, sum(w * s) AS raw FROM trade JOIN a{it} USING (sk) GROUP BY 1
)"""
        )
        ctes.append(
            f"h{it} AS MATERIALIZED (SELECT ck, {norm.format(src=f'h{it}r')} AS s FROM h{it}r)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT 'c:' || c_custkey AS node, 'hub' AS role,
  CAST(coalesce(h{n_iter}.s, 0) AS BIGINT) AS score_e6
FROM customer LEFT JOIN h{n_iter} ON h{n_iter}.ck = c_custkey
UNION ALL
SELECT 's:' || s_suppkey, 'authority', CAST(coalesce(a{n_iter}.s, 0) AS BIGINT)
FROM supplier LEFT JOIN a{n_iter} ON a{n_iter}.sk = s_suppkey
ORDER BY node
"""
    )


def _shard_dedup_loss_oracle(n_shards: int = 8) -> str:
    """Shard-local dedup loss twin (operators/dedup.py
    shard_local_dedup_loss): same seeded-md5 shard, same group-level
    keeper-identity test."""
    return f"""
WITH d AS (
  SELECT doc_id,
    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h,
    CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#shard')), 1, 15))
         AS BIGINT) % {n_shards} AS shard
  FROM documents
),
per AS (SELECT h, shard, min(doc_id) AS local_keep, count(*) AS c FROM d GROUP BY 1, 2),
gk AS (SELECT h, min(local_keep) AS global_keep FROM per GROUP BY 1),
agg AS (
  SELECT shard,
    sum(c) AS n_docs,
    sum(c - 1) AS n_local_removable,
    sum(c - CASE WHEN local_keep = global_keep THEN 1 ELSE 0 END) AS n_global_removable,
    sum(CASE WHEN local_keep = global_keep THEN 0 ELSE 1 END) AS n_missed
  FROM per JOIN gk USING (h) GROUP BY 1
)
SELECT CAST(shard AS BIGINT) AS shard, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(n_local_removable AS BIGINT) AS n_local_removable,
  CAST(n_global_removable AS BIGINT) AS n_global_removable,
  CAST(n_missed AS BIGINT) AS n_missed,
  CAST({_ppm_sql('n_missed', 'n_docs')} AS BIGINT) AS missed_ppm
FROM agg ORDER BY shard
"""


def _lsh_skew_oracle(
    num_hashes: int = 12, bands: int = 4, bucket_cap: int = 200
) -> str:
    """Band-bucket skew twin (operators/dedup.py
    lsh_bucket_skew_audit) over the shared uncapped bands CTEs."""
    return f"""
WITH {_lsh_bands_ctes(num_hashes, bands)},
bk AS (SELECT band_id, band_key, count(*) AS c FROM bands GROUP BY 1, 2)
SELECT CAST(band_id AS BIGINT) AS band_id,
  CAST(count(*) AS BIGINT) AS n_buckets,
  CAST(sum(c) AS BIGINT) AS n_postings,
  CAST(max(c) AS BIGINT) AS max_bucket,
  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_singleton,
  CAST(sum(CASE WHEN c > {bucket_cap} THEN 1 ELSE 0 END) AS BIGINT) AS n_over_cap,
  CAST(sum(CASE WHEN c > {bucket_cap} THEN c ELSE 0 END) AS BIGINT) AS postings_dropped,
  CAST(sum(c * (c - 1) // 2) AS BIGINT) AS pairs_uncapped,
  CAST(sum(CASE WHEN c <= {bucket_cap} THEN c * (c - 1) // 2 ELSE 0 END) AS BIGINT)
    AS pairs_after_cap
FROM bk GROUP BY 1 ORDER BY 1
"""


def _tail_head_oracle(k: int = 2, group_cap: int = 200) -> str:
    """Chunk-stitch twin (operators/dedup.py tail_head_overlap_pairs):
    same normalized head/tail k-gram md5s, same two-sided group cap."""
    return f"""
WITH d AS (SELECT doc_id, {_norm_toks_sql()} AS t FROM documents),
f AS (
  SELECT doc_id,
    md5(array_to_string(t[1:{k}], ' ')) AS head_h,
    md5(array_to_string(t[-{k}:], ' ')) AS tail_h
  FROM d WHERE len(t) >= {2 * k}
),
hc AS (SELECT head_h, count(*) AS nh FROM f GROUP BY 1),
tc AS (SELECT tail_h, count(*) AS nt FROM f GROUP BY 1),
capped AS (
  SELECT f.* FROM f
  JOIN hc USING (head_h) JOIN tc USING (tail_h)
  WHERE nh <= {group_cap} AND nt <= {group_cap}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.tail_h AS overlap_h
FROM capped a JOIN capped b
  ON a.tail_h = b.head_h AND a.doc_id <> b.doc_id
ORDER BY doc_a, doc_b
"""


def _memorization_oracle(k: int = 8) -> str:
    """Memorization-risk twin (operators/text6.py
    memorization_risk_ngrams): k-gram windows via the standing
    shingle spelling, corpus-wide counts at gram grain."""
    return f"""
WITH d AS (SELECT doc_id, source, {_norm_toks_sql()} AS t FROM documents),
st AS (
  SELECT source, t,
    unnest(generate_series(1, greatest(len(t) - {k - 1}, 1))) AS i
  FROM d
),
g AS (SELECT source, md5(array_to_string(t[i:i+{k - 1}], ' ')) AS gh FROM st),
sg AS (SELECT source, gh, count(*) AS c FROM g GROUP BY 1, 2),
gc AS (SELECT gh, sum(c) AS gc FROM sg GROUP BY 1),
agg AS (
  SELECT source,
    sum(c) AS n_windows,
    sum(CASE WHEN gc >= 2 THEN c ELSE 0 END) AS n_repeated_windows,
    count(*) AS n_distinct_grams,
    sum(CASE WHEN gc = 1 THEN 1 ELSE 0 END) AS n_unique_grams
  FROM sg JOIN gc USING (gh) GROUP BY 1
)
SELECT source, CAST(n_windows AS BIGINT) AS n_windows,
  CAST(n_repeated_windows AS BIGINT) AS n_repeated_windows,
  CAST(n_distinct_grams AS BIGINT) AS n_distinct_grams,
  CAST(n_unique_grams AS BIGINT) AS n_unique_grams,
  CAST({_ppm_sql('n_repeated_windows', 'n_windows')} AS BIGINT) AS repeated_ppm
FROM agg ORDER BY source
"""


def _ann_mrr_oracle(n_queries: int = 8, k: int = 5) -> str:
    """MRR twin (operators/similarity.py ann_mrr_at_k): same three
    top-k subqueries as the nDCG twin, reciprocal rank quantized as
    1e6 // first_hit_rank."""

    def tier(method: str, sub: str) -> str:
        return f"""
SELECT '{method}' AS method, b.q_id,
  CAST(coalesce(s.fr, 0) AS BIGINT) AS first_hit_rank,
  CAST(CASE WHEN s.fr IS NOT NULL THEN 1000000 // s.fr ELSE 0 END AS BIGINT) AS rr_e6
FROM (SELECT DISTINCT q_id FROM bf) b
LEFT JOIN (
  SELECT a.q_id, min(a.rank) AS fr
  FROM {sub} a
  JOIN bf t ON a.q_id = t.q_id AND a.neighbor_id = t.neighbor_id
  GROUP BY 1
) s ON b.q_id = s.q_id"""

    return f"""
WITH bf AS ({_ann_bf_oracle(n_queries, k)}),
ivf AS ({_ann_ivf_oracle(n_queries, k)}),
lsh AS ({_ann_lsh_oracle(n_queries, k)})
{tier("ivf", "ivf")}
UNION ALL
{tier("lsh", "lsh")}
ORDER BY method, q_id
"""


def _decile_lift_oracle() -> str:
    """Decile lift twin (operators/quality_checks.py
    quality_decile_lift): same e6 freeze of the heuristic quality
    score, value-grain cumulative-before deciles, quantized ppm/e6
    lift algebra."""
    rate = _ppm_sql("n_gold", "n_docs")
    overall = _ppm_sql("total_gold", "total_docs")
    return f"""
WITH scored AS (
  SELECT doc_id, CAST(round(quality_score * 1000000.0) AS BIGINT) AS score_e6
  FROM ({_quality_oracle()})
),
gold AS (SELECT doc_id FROM ({_corpus_filter_oracle()})),
base AS (
  SELECT s.score_e6, CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END AS gold
  FROM scored s LEFT JOIN gold g ON s.doc_id = g.doc_id
),
vg AS (SELECT score_e6, count(*) AS n, sum(gold) AS g FROM base GROUP BY 1),
tot AS (SELECT count(*) AS total_docs, sum(gold) AS total_gold FROM base),
cum AS (
  SELECT score_e6, n, g,
    coalesce(sum(n) OVER (ORDER BY score_e6 DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM vg
),
dec AS (
  SELECT least(cb * 10 // total_docs, 9) + 1 AS decile, n, g, total_docs, total_gold
  FROM cum, tot
),
per AS (
  SELECT decile, total_docs, total_gold, sum(n) AS n_docs, sum(g) AS n_gold
  FROM dec GROUP BY 1, 2, 3
),
cumg AS (
  SELECT *, sum(n_gold) OVER (ORDER BY decile
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_gold
  FROM per
)
SELECT CAST(decile AS BIGINT) AS decile,
  CAST(n_docs AS BIGINT) AS n_docs, CAST(n_gold AS BIGINT) AS n_gold,
  CAST({rate} AS BIGINT) AS gold_rate_ppm,
  CAST(({rate}) * 1000000 // ({overall}) AS BIGINT) AS lift_e6,
  CAST(cum_gold AS BIGINT) AS cum_gold,
  CAST({_ppm_sql('cum_gold', 'total_gold')} AS BIGINT) AS capture_ppm
FROM cumg ORDER BY decile
"""


def _freshness_oracle(stale_days: int = 7) -> str:
    """Freshness twin (operators/timeseries.py event_freshness_mart):
    exact-microsecond staleness via epoch_us, inclusive-day e2 rate."""
    stale_us = stale_days * 86_400_000_000
    return f"""
WITH per AS (
  SELECT event_type, count(*) AS n_events,
    min(CAST(ts AS DATE)) AS first_day, max(CAST(ts AS DATE)) AS last_day,
    max(epoch_us(ts)) AS last_us
  FROM events GROUP BY 1
), corpus AS (SELECT max(epoch_us(ts)) AS cmax FROM events)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events, first_day, last_day,
  CAST(cmax - last_us AS BIGINT) AS staleness_us,
  CAST(n_events * 100 // (date_diff('day', first_day, last_day) + 1) AS BIGINT)
    AS events_per_day_e2,
  (cmax - last_us) > {stale_us} AS is_stale
FROM per, corpus ORDER BY event_type
"""


def _kn_counts_oracle(top_k: int = 30) -> str:
    """Kneser-Ney ingredient twin (operators/text6.py
    ngram_kneser_ney_counts): in-row bigrams, bigram-grain context
    rollups, exact ppm/e6 readouts."""
    return f"""
WITH d AS (SELECT {_norm_toks_sql()} AS t FROM documents),
bi AS (
  SELECT t[i] AS a, t[i + 1] AS b
  FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM d WHERE len(t) >= 2)
  WHERE t[i] <> '' AND t[i + 1] <> ''
),
bc AS (SELECT a, b, count(*) AS c FROM bi GROUP BY 1, 2),
lft AS (SELECT b AS word, count(*) AS n_left_ctx FROM bc GROUP BY 1),
rgt AS (SELECT a AS word, count(*) AS n_right_ctx FROM bc GROUP BY 1),
gl AS (
  SELECT count(*) AS n_bigrams,
    sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS n1,
    sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS n2
  FROM bc
),
uni AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest(t) AS word FROM d) WHERE word <> '' GROUP BY 1
),
top AS (SELECT * FROM uni ORDER BY freq DESC, word ASC LIMIT {top_k})
SELECT top.word, CAST(top.freq AS BIGINT) AS freq,
  CAST(coalesce(lft.n_left_ctx, 0) AS BIGINT) AS n_left_ctx,
  CAST(coalesce(rgt.n_right_ctx, 0) AS BIGINT) AS n_right_ctx,
  CAST({_ppm_sql('coalesce(lft.n_left_ctx, 0)', 'gl.n_bigrams')} AS BIGINT)
    AS cont_prob_ppm,
  CASE WHEN gl.n1 + 2 * gl.n2 > 0
       THEN CAST(gl.n1 * 1000000 // (gl.n1 + 2 * gl.n2) AS BIGINT) END AS discount_e6
FROM top
LEFT JOIN lft ON top.word = lft.word
LEFT JOIN rgt ON top.word = rgt.word
CROSS JOIN gl
ORDER BY top.freq DESC, top.word ASC
"""


def _source_pair_dup_oracle(k: int = 16) -> str:
    """Source-pair shared-content twin (operators/dedup.py
    source_pair_dup_matrix): sliding k-token window hashes at
    (hash, source) grain, bounded self-join on the hash key,
    within-source diagonal."""
    return f"""
WITH d AS (SELECT source, {_norm_toks_sql()} AS t FROM documents),
st AS (
  SELECT source, t,
    unnest(generate_series(1, greatest(len(t) - {k - 1}, 1))) AS i
  FROM d
),
per AS (
  SELECT md5(array_to_string(t[i:i+{k - 1}], ' ')) AS h, source, count(*) AS c
  FROM st GROUP BY 1, 2
),
cross_p AS (
  SELECT a.source AS source_a, b.source AS source_b,
    count(*) AS n_shared_windows
  FROM per a JOIN per b ON a.h = b.h AND a.source < b.source
  GROUP BY 1, 2
),
diag AS (
  SELECT source AS source_a, source AS source_b, count(*) AS n_shared_windows
  FROM per WHERE c >= 2 GROUP BY 1, 2
)
SELECT source_a, source_b, CAST(n_shared_windows AS BIGINT) AS n_shared_windows
FROM (SELECT * FROM cross_p UNION ALL SELECT * FROM diag)
ORDER BY source_a, source_b
"""


def _stitch_index_oracle(
    k: int = 2, old_permille: int = 800, group_cap: int = 200
) -> str:
    """Incremental stitch-screen twin (operators/dedup.py
    stitch_against_index): same '#ingest' permille split, same capped
    head/tail fingerprint index, same two probe joins."""
    bucket = (
        "CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '#ingest')), 1, 15))"
        " AS BIGINT) % 1000"
    )
    return f"""
WITH d AS (SELECT doc_id, source, {_norm_toks_sql()} AS t,
                  {bucket} AS bkt
           FROM documents),
f AS (
  SELECT doc_id, source, bkt,
    md5(array_to_string(t[1:{k}], ' ')) AS head_h,
    md5(array_to_string(t[-{k}:], ' ')) AS tail_h
  FROM d WHERE len(t) >= {2 * k}
),
old AS (SELECT * FROM f WHERE bkt < {old_permille}),
hc AS (SELECT head_h, count(*) AS nh FROM old GROUP BY 1),
tc AS (SELECT tail_h, count(*) AS nt FROM old GROUP BY 1),
idx AS (
  SELECT old.* FROM old
  JOIN hc USING (head_h) JOIN tc USING (tail_h)
  WHERE nh <= {group_cap} AND nt <= {group_cap}
),
probe AS (SELECT * FROM f WHERE bkt >= {old_permille}),
hh AS (
  SELECT p.doc_id, count(*) AS n_ext
  FROM probe p JOIN idx i ON p.head_h = i.tail_h GROUP BY 1
),
th AS (
  SELECT p.doc_id, count(*) AS n_cont
  FROM probe p JOIN idx i ON p.tail_h = i.head_h GROUP BY 1
),
newdocs AS (SELECT doc_id, source FROM d WHERE bkt >= {old_permille})
SELECT n.doc_id, n.source,
  CAST(coalesce(hh.n_ext, 0) AS BIGINT) AS n_extends_ingested,
  CAST(coalesce(th.n_cont, 0) AS BIGINT) AS n_continued_by_ingested,
  (coalesce(hh.n_ext, 0) + coalesce(th.n_cont, 0) > 0) AS is_stitch_candidate
FROM newdocs n
LEFT JOIN hh ON n.doc_id = hh.doc_id
LEFT JOIN th ON n.doc_id = th.doc_id
ORDER BY n.doc_id
"""


def _lateness_oracle(watermark_s: int = 600) -> str:
    """Watermark-lateness twin (operators/timeseries.py
    watermark_lateness_audit): one running prefix-max window in
    arrival (event_id) order — equal by construction to the Spark
    side's band/carry two-level max decomposition."""
    wm_us = watermark_s * 1_000_000
    neg_inf = -(1 << 62)
    return f"""
WITH e AS (SELECT event_type, event_id, epoch_us(ts) AS us FROM events),
lm AS (
  SELECT event_type, us,
    max(us) OVER (PARTITION BY event_type ORDER BY event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
  FROM e
),
sc AS (
  SELECT event_type, us,
    greatest(coalesce(prev_max, {neg_inf}) - us, 0) AS lateness_us
  FROM lm
),
agg AS (
  SELECT event_type, count(*) AS n_events,
    sum(CASE WHEN lateness_us > 0 THEN 1 ELSE 0 END) AS n_late,
    sum(CASE WHEN lateness_us > {wm_us} THEN 1 ELSE 0 END) AS n_dropped,
    max(lateness_us) AS max_lateness_us,
    sum(lateness_us) AS sum_late
  FROM sc GROUP BY 1
)
SELECT event_type, CAST(n_events AS BIGINT) AS n_events,
  CAST(n_late AS BIGINT) AS n_late,
  CAST({_ppm_sql('n_late', 'n_events')} AS BIGINT) AS late_share_ppm,
  CAST(n_dropped AS BIGINT) AS n_dropped_by_watermark,
  CAST({_ppm_sql('n_dropped', 'n_events')} AS BIGINT) AS dropped_share_ppm,
  CAST(max_lateness_us AS BIGINT) AS max_lateness_us,
  CAST(sum_late // n_events AS BIGINT) AS avg_lateness_us
FROM agg ORDER BY event_type
"""


def _srm_oracle(target_a_permille: int = 500) -> str:
    """SRM twin (operators/relational7.py ab_srm_check): same md5
    arm split as the B88 oracle; count-based Pearson chi-square
    (ADVICE r6 high) in exact thousandth-user integers, HUGEINT
    intermediates for the square."""
    return f"""
WITH u AS (SELECT DISTINCT user_id FROM events),
arms AS (
  SELECT CASE WHEN CAST(concat('0x',
      substr(md5(concat(CAST(user_id AS VARCHAR), '#ab')), 1, 15)) AS BIGINT)
      % 2 = 0 THEN 'A' ELSE 'B' END AS arm
  FROM u
),
per AS (SELECT arm, count(*) AS n_users FROM arms GROUP BY 1),
tot AS (SELECT sum(n_users) AS total FROM per),
sc AS (
  SELECT arm, n_users, total,
    CAST({_ppm_sql('n_users', 'total')} AS BIGINT) AS obs_ppm,
    CAST(CASE WHEN arm = 'A' THEN {target_a_permille}
         ELSE {1000 - target_a_permille} END AS BIGINT) AS exp_permille
  FROM per, tot
),
sc2 AS (
  SELECT *, exp_permille * 1000 AS expected_ppm,
    CAST((1000000::HUGEINT
          * (1000::HUGEINT * n_users - total::HUGEINT * exp_permille)
          * (1000::HUGEINT * n_users - total::HUGEINT * exp_permille))
         // (1000::HUGEINT * total * exp_permille) AS BIGINT)
      AS chi2_contrib_e6
  FROM sc
),
t2 AS (SELECT sum(chi2_contrib_e6) AS chi2_e6 FROM sc2)
SELECT arm, CAST(n_users AS BIGINT) AS n_users, obs_ppm, expected_ppm,
  CAST(chi2_contrib_e6 AS BIGINT) AS chi2_contrib_e6,
  CAST(t2.chi2_e6 AS BIGINT) AS chi2_e6,
  t2.chi2_e6 > 3841459 AS srm_detected
FROM sc2, t2 ORDER BY arm
"""


def _chaining_oracle() -> str:
    """Cluster-chaining twin (operators/dedup.py
    cluster_chaining_audit): the C2 verified-pairs oracle + the C5
    recursive min-reachable components, edge rollup at cluster
    grain."""
    return f"""
WITH RECURSIVE
mh AS (SELECT * FROM ({_minhash_oracle()}) m),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM mh
  UNION ALL
  SELECT doc_b, doc_a FROM mh
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, comp) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, r.comp FROM edges e JOIN reach r ON e.dst = r.id
),
cl AS (SELECT id AS doc_id, min(comp) AS cluster_id FROM reach GROUP BY 1),
sz AS (
  SELECT cluster_id, count(*) AS n_members FROM cl GROUP BY 1
  HAVING count(*) >= 2
),
ed AS (
  SELECT c.cluster_id, count(*) AS n_edges,
    round(min(mh.jaccard), 6) AS min_edge_jaccard
  FROM mh JOIN cl c ON mh.doc_a = c.doc_id GROUP BY 1
)
SELECT s.cluster_id, CAST(s.n_members AS BIGINT) AS n_members,
  CAST(ed.n_edges AS BIGINT) AS n_edges,
  CAST(s.n_members * (s.n_members - 1) // 2 AS BIGINT) AS possible_edges,
  CAST({_ppm_sql('ed.n_edges', '(s.n_members * (s.n_members - 1) // 2)')} AS BIGINT)
    AS edge_density_ppm,
  ed.min_edge_jaccard,
  ({_ppm_sql('ed.n_edges', '(s.n_members * (s.n_members - 1) // 2)')}) < 1000000
    AS is_chained
FROM sz s JOIN ed ON s.cluster_id = ed.cluster_id
ORDER BY s.cluster_id
"""


def _pii_rate_oracle() -> str:
    """Per-source PII twin (operators/text2.py pii_rate_by_source):
    identical synthetic injection and patterns as the C25 oracle."""
    from .operators.text2 import EMAIL_RE, IPV4_RE, PHONE_RE

    return f"""
WITH withpii AS (
  SELECT source,
    text ||
    CASE WHEN doc_id % 3 = 0
         THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END ||
    CASE WHEN doc_id % 5 = 0 THEN ' call 555-123-4567' ELSE '' END ||
    CASE WHEN doc_id % 7 = 0
         THEN ' host 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END AS text
  FROM documents
),
per AS (
  SELECT source,
    len(regexp_extract_all(text, '{EMAIL_RE}')) AS ne,
    len(regexp_extract_all(text, '{PHONE_RE}')) AS np,
    len(regexp_extract_all(text, '{IPV4_RE}')) AS ni
  FROM withpii
),
agg AS (
  SELECT source, count(*) AS n_docs,
    sum(CASE WHEN ne > 0 THEN 1 ELSE 0 END) AS docs_with_email,
    sum(CASE WHEN np > 0 THEN 1 ELSE 0 END) AS docs_with_phone,
    sum(CASE WHEN ni > 0 THEN 1 ELSE 0 END) AS docs_with_ip,
    sum(CASE WHEN ne + np + ni > 0 THEN 1 ELSE 0 END) AS docs_with_any_pii,
    sum(ne) AS n_emails, sum(np) AS n_phones, sum(ni) AS n_ips
  FROM per GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
  CAST(docs_with_email AS BIGINT) AS docs_with_email,
  CAST(docs_with_phone AS BIGINT) AS docs_with_phone,
  CAST(docs_with_ip AS BIGINT) AS docs_with_ip,
  CAST(docs_with_any_pii AS BIGINT) AS docs_with_any_pii,
  CAST(n_emails AS BIGINT) AS n_emails,
  CAST(n_phones AS BIGINT) AS n_phones,
  CAST(n_ips AS BIGINT) AS n_ips,
  CAST({_ppm_sql('docs_with_any_pii', 'n_docs')} AS BIGINT) AS pii_doc_share_ppm
FROM agg ORDER BY source
"""
