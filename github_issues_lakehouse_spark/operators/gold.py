"""Gold layer: monthly KPI marts (reference ``gold.py:21-166``).

Spark-first shape:
- one groupBy per flow (created / closed) with map-side partial agg;
- buckets are conditional aggregates inside the SAME groupBy (the
  reference does one merge per bucket — gold.py:97-107 — which at
  scale would be 4 extra shuffles; here it's zero extra);
- backlog cumsum is a window over the merged monthly grid, one
  shuffle on (component, priority_tier);
- the global mart reuses the component mart (no rescan of silver).

Exact percentiles (median/p90) match the pandas/DuckDB definition
(linear interpolation). For the 100 TB path every operator takes
``approx=True`` to switch to ``percentile_approx`` which aggregates
partially and never materializes a per-group sorted list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.labels import LakehouseRules
from ..functions.timefns import month_str

KPI_KEYS = ["month", "component", "priority_tier"]


def _resolution_metrics(buckets: list[int], approx: bool) -> list:
    res = F.col("resolution_hours")
    if approx:
        median = F.percentile_approx(res, 0.5, 10000)
        p90 = F.percentile_approx(res, 0.9, 10000)
    else:
        median = F.percentile(res, 0.5)
        p90 = F.percentile(res, 0.9)
    # avg from EXACT integer microsecond sums: float summation order
    # (engine, partitioning) would otherwise wobble the last ulp and
    # break deterministic rounding. unix_micros on the LTZ cast —
    # any tz shift cancels in the difference.
    res_us = F.unix_micros(F.col("closed_at").cast("timestamp")) - F.unix_micros(
        F.col("created_at").cast("timestamp")
    )
    cnt = F.count("issue_id")
    aggs = [
        cnt.alias("closed_count"),
        ((F.sum(res_us).cast("double") / cnt) / 3600000000.0).alias("avg_resolution_hours"),
        median.alias("median_resolution_hours"),
        p90.alias("p90_resolution_hours"),
    ]
    for b in buckets:
        aggs.append(
            F.avg(F.when(res <= float(b), 1.0).otherwise(0.0)).alias(
                f"share_closed_within_{int(b)}h"
            )
        )
    return aggs


def kpi_monthly_component_tier(
    silver: DataFrame,
    rules: LakehouseRules | None = None,
    approx: bool = False,
) -> DataFrame:
    """Monthly KPI per (month, component, priority_tier), defects only.

    Reference gold.py:53-123: created flow, closed flow with
    resolution stats + share-closed-within buckets, outer-merged,
    counts zero-filled, backlog_end = running cumsum(created-closed)
    per (component, tier) ordered by month.
    """
    rules = rules or LakehouseRules()
    buckets = rules.time_buckets_hours
    defects = silver.filter(F.col("ticket_kind") == "defect")

    created = (
        defects.filter(F.col("created_at").isNotNull())
        .withColumn("month", month_str(F.col("created_at")))
        .groupBy(*KPI_KEYS)
        .agg(F.count("issue_id").alias("created_count"))
    )

    closed = (
        defects.filter(F.col("closed_at").isNotNull() & F.col("created_at").isNotNull())
        .withColumn("month", month_str(F.col("closed_at")))
        .groupBy(*KPI_KEYS)
        .agg(*_resolution_metrics(buckets, approx))
    )

    kpi = created.join(closed, on=KPI_KEYS, how="full_outer")
    kpi = kpi.withColumn("created_count", F.coalesce("created_count", F.lit(0)).cast("long"))
    kpi = kpi.withColumn("closed_count", F.coalesce("closed_count", F.lit(0)).cast("long"))

    w = (
        Window.partitionBy("component", "priority_tier")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kpi = kpi.withColumn(
        "backlog_end", F.sum(F.col("created_count") - F.col("closed_count")).over(w)
    )
    return kpi


def daily_event_mart(events: DataFrame) -> DataFrame:
    """Additive daily mart over events: (day, event_type) -> count +
    value sum. Every measure is associative, which is what makes the
    mart incrementally maintainable (see merge_mart_increment)."""
    return (
        events.groupBy(
            F.to_date("ts").alias("day"), "event_type"
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("total_value"),
        )
    )


def merge_mart_increment(existing: DataFrame | None, batch_events: DataFrame) -> DataFrame:
    """Incremental mart maintenance: fold a new micro-batch into an
    existing additive mart WITHOUT rescanning history — aggregate the
    batch alone, union with the stored mart, re-aggregate by key
    (merging two small aggregates, not the raw fact history). The
    incremental fold is exactly equal to a full recompute because
    every measure is associative; at 100 TB this is the difference
    between touching one day of data and touching three years of it.
    """
    delta = daily_event_mart(batch_events)
    if existing is None:
        return delta
    return (
        existing.unionByName(delta)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
    )


def kpi_monthly_global(
    kpi_component: DataFrame,
    rules: LakehouseRules | None = None,
) -> DataFrame:
    """Global monthly mart (reference gold.py:125-151): per-month sums
    plus closed-count-weighted averages of the resolution metrics.

    The reference computes weighted averages in a pandas
    ``groupby().apply`` (driver-side); here each weighted average is
    ``sum(metric*w)/sum(w)`` — associative, map-side combinable.
    """
    rules = rules or LakehouseRules()
    buckets = rules.time_buckets_hours

    sums = kpi_component.groupBy("month").agg(
        F.sum("created_count").alias("created_count"),
        F.sum("closed_count").alias("closed_count"),
        F.sum("backlog_end").alias("backlog_end"),
    )

    metric_cols = [
        "avg_resolution_hours",
        "median_resolution_hours",
        "p90_resolution_hours",
    ] + [f"share_closed_within_{int(b)}h" for b in buckets]

    # weighted over rows that have closed activity (closed_kpi rows in
    # the reference exist only where closed_count > 0; after the outer
    # merge those are exactly the rows with closed_count > 0)
    ck = kpi_component.filter(F.col("closed_count") > 0)
    w = F.col("closed_count").cast("double")
    # reference weighted_avg (gold.py:137-140): numerator skips NaN
    # rows (pandas sum), denominator is the FULL weight sum.
    weighted = ck.groupBy("month").agg(
        *[(F.sum(F.col(c) * w) / F.sum(w)).alias(c) for c in metric_cols]
    )
    return sums.join(weighted, on="month", how="left")


def sla_stability_mart(
    silver_df: DataFrame,
    sla_hours: int = 168,
    rules: LakehouseRules | None = None,
    critical_tiers: tuple = ("P0", "P1"),
) -> DataFrame:
    """Monthly SLA / stability KPIs for CRITICAL issues — the mart the
    reference README describes (README.md "Critical issue rule" /
    "SLA rule" / "Monthly KPIs": total_critical_hours,
    stability_index, sla_breach_rate, created/closed_critical,
    backlog_critical_end; config.yml ``rules.hours_in_month``) but
    whose gold.py never ships. Critical = priority tier P0/P1 (the
    Blocker/Regression label tiers — the closest live analogue of the
    README's never-defined ``rules.critical_labels``).

    Semantics per (month, component):
    - ``total_critical_hours_e6``: micro-hours critical issues spent
      OPEN during the month — each closed issue's [created, closed)
      interval is split across the calendar months it overlaps
      (``sequence()`` month explode, the daily_gapfill idiom; the
      fan-out is bounded by months-spanned, not data size).
    - ``stability_index_ppm``: 1e6 * (1 - total_hours/hours_in_month)
      — the README formula in integer ppm.
    - ``sla_breach_ppm``: share of critical closures that month with
      resolution > ``sla_hours`` (NULL when nothing closed).
    - ``created_critical`` / ``closed_critical`` /
      ``backlog_critical_end``: counts + per-component cumulative
      backlog.

    Exactness: intervals freeze to integer MICROSECONDS; micro-hours
    are ``us DIV 3600``; both ppm outputs use the two-level BIGINT
    remainder split (functions/exact.py) — no float division
    anywhere, so the mart is engine/version-proof. Shuffles: three
    (month, component) aggregates + one full-outer merge + one
    bounded per-component backlog window.

    Structure: ``sla_core`` (per-(month, component) ADDITIVE
    measures — the part a streaming maintainer can fold batch by
    batch) composed with ``sla_finalize`` (backlog window + derived
    ppm indices). ``stream_sla_maintenance`` (streaming/ops.py)
    reuses both for the incremental exactly-once twin.
    """
    return sla_finalize(
        sla_core(silver_df, sla_hours=sla_hours, critical_tiers=critical_tiers),
        rules=rules,
    )


def sla_core(
    silver_df: DataFrame,
    sla_hours: int = 168,
    critical_tiers: tuple = ("P0", "P1"),
) -> DataFrame:
    """The ADDITIVE core of the SLA mart: per (month, component) —
    created_critical, closed_critical, sla_breaches, open_us. Every
    measure is a sum over issues, so the core of a union of disjoint
    issue batches equals the sum-merge of the per-batch cores (the
    property the streaming maintainer relies on)."""
    from ..functions.timefns import month_str

    sla_us = int(sla_hours) * 3_600_000_000

    crit = silver_df.filter(F.col("priority_tier").isin(*critical_tiers))
    cts = F.col("created_at").cast("timestamp")
    zts = F.col("closed_at").cast("timestamp")

    created = (
        crit.filter(F.col("created_at").isNotNull())
        .groupBy(month_str(cts).alias("month"), "component")
        .agg(F.count(F.lit(1)).alias("created_critical"))
    )

    closed_base = crit.filter(F.col("closed_at").isNotNull() & F.col("created_at").isNotNull())
    res_us = F.unix_micros(zts) - F.unix_micros(cts)
    closed = closed_base.groupBy(month_str(zts).alias("month"), "component").agg(
        F.count(F.lit(1)).alias("closed_critical"),
        F.sum((res_us > sla_us).cast("long")).alias("sla_breaches"),
    )

    # a raw feed can deliver closed_at < created_at (the synthetic
    # silver does); such rows hold zero open-time, so they are
    # excluded from the exposure split (sequence() would reject the
    # inverted month range)
    spans = closed_base.filter(zts >= cts).select(
        "component",
        F.unix_micros(cts).alias("c_us"),
        F.unix_micros(zts).alias("z_us"),
        F.explode(
            F.sequence(
                F.date_trunc("month", cts),
                F.date_trunc("month", zts),
                F.expr("interval 1 month"),
            )
        ).alias("mth"),
    )
    m_start = F.unix_micros(F.col("mth"))
    m_end = F.unix_micros(F.add_months(F.col("mth").cast("date"), 1).cast("timestamp"))
    hours = (
        spans.select(
            month_str(F.col("mth")).alias("month"),
            "component",
            (F.least(F.col("z_us"), m_end) - F.greatest(F.col("c_us"), m_start)).alias(
                "open_us"
            ),
        )
        .filter(F.col("open_us") > 0)
        .groupBy("month", "component")
        .agg(F.sum("open_us").alias("open_us"))
    )

    keys = ["month", "component"]
    return (
        created.join(closed, keys, "full_outer")
        .join(hours, keys, "full_outer")
        .select(
            *keys,
            F.coalesce("created_critical", F.lit(0)).cast("long").alias("created_critical"),
            F.coalesce("closed_critical", F.lit(0)).cast("long").alias("closed_critical"),
            F.coalesce("sla_breaches", F.lit(0)).cast("long").alias("sla_breaches"),
            F.coalesce("open_us", F.lit(0)).cast("long").alias("open_us"),
        )
    )


def sla_merge_core(existing: DataFrame | None, delta: DataFrame) -> DataFrame:
    """Fold a new batch's additive core into the stored core: union +
    sum per (month, component) — merging two small aggregates, never
    rescanning issue history (the ``merge_mart_increment``
    discipline)."""
    if existing is None:
        return delta
    agg = [
        F.sum(c).cast("long").alias(c)
        for c in ("created_critical", "closed_critical", "sla_breaches", "open_us")
    ]
    return existing.unionByName(delta).groupBy("month", "component").agg(*agg)


def sla_finalize(core: DataFrame, rules: LakehouseRules | None = None) -> DataFrame:
    """Derive the serving mart from the additive core: per-component
    cumulative backlog (calendar-bounded window), micro-hours, and
    the two exact-integer ppm indices."""
    from ..functions.exact import ppm_expr

    rules = rules or LakehouseRules()
    month_us = int(rules.hours_in_month) * 3_600_000_000
    w = (
        Window.partitionBy("component")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        core.withColumn(
            "backlog_critical_end",
            F.sum(F.col("created_critical") - F.col("closed_critical")).over(w).cast("long"),
        )
        .withColumn("total_critical_hours_e6", F.expr("open_us DIV 3600"))
        .withColumn(
            "stability_index_ppm",
            F.expr(f"1000000 - ({ppm_expr('open_us', str(month_us))})"),
        )
        .withColumn(
            "sla_breach_ppm",
            F.when(
                F.col("closed_critical") > 0,
                F.expr(ppm_expr("sla_breaches", "closed_critical")),
            ).cast("long"),
        )
        .select(
            "month",
            "component",
            "created_critical",
            "closed_critical",
            "backlog_critical_end",
            "total_critical_hours_e6",
            "stability_index_ppm",
            "sla_breach_ppm",
        )
    )
