"""Relational core, batch 3: window-function suite (running totals,
lag deltas, moving averages), statistical aggregates, GROUPING SETS,
and time-series gap-fill — rounding out the warehouse surface.

Scale notes: every window here partitions on a natural high-cardinality
key (customer, user) — one shuffle, then per-partition sort; no global
ordering anywhere. The gap-fill grid is (days x event_types), tiny
relative to the fact table, built with a broadcast cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import money, r2, r6


def running_customer_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order count and cumulative spend over
    time. Frame = ROWS UNBOUNDED PRECEDING with a total order
    (o_orderdate, o_orderkey) so the running sum is deterministic;
    decimal accumulation keeps it exact in every engine."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.row_number()
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("order_seq"),
        r2(F.sum(money(F.col("o_totalprice"))).over(w).cast("double")).alias("running_spend"),
    )


def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG: days since the customer's previous order (NULL for the
    first). One shuffle on customer, per-partition sort."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate")).over(w)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date"))
        .cast("long")
        .alias("gap_days"),
    )


def moving_avg_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event value per user (frame-ordered, so
    the float accumulation order is pinned by the frame)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        r6(F.avg(F.col("value").cast("decimal(12,2)")).over(w).cast("double")).alias(
            "moving_avg_value"
        ),
    )


def stats_summary_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates per return flag: sample stddev/variance,
    correlation and covariance between quantity and price. Single-pass
    moment aggregates — map-side combinable at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.stddev_samp(q), 6).alias("stddev_qty"),
        F.round(F.var_samp(q), 4).alias("var_qty"),
        F.round(F.corr(q, p), 6).alias("corr_qty_price"),
        F.round(F.covar_samp(q, p), 2).alias("covar_qty_price"),
    )


def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((year, segment), (year), (segment), ())
    — the general form behind ROLLUP/CUBE, via the SQL API. Subtotal
    keys are rendered as 'ALL' so no grouping_id is needed for a
    portable result."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    # DataFrame references passed straight into spark.sql — no shared
    # temp-view names to collide across concurrent callers
    return spark.sql(
        """
        SELECT coalesce(CAST(year(o.o_orderdate) AS STRING), 'ALL') AS yr,
               coalesce(c.c_mktsegment, 'ALL') AS segment,
               count(*) AS n_orders,
               round(CAST(sum(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE), 2)
                 AS total_revenue
        FROM {orders} o JOIN {customer} c ON o.o_custkey = c.c_custkey
        GROUP BY GROUPING SETS ((year(o.o_orderdate), c.c_mktsegment),
                                (year(o.o_orderdate)), (c.c_mktsegment), ())
        """,
        orders=o,
        customer=c,
    )


def percentile_suite_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (p25/p50/p75/p95) of quantity and price per
    return flag — linear-interpolation definition on both engines.
    The 100 TB path swaps percentile() for percentile_approx() (one
    pass, mergeable sketches); exact is kept here because the oracle
    pins exact semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    p = F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(F.percentile(q, pc), 4).alias(f"qty_p{int(pc * 100)}")
            for pc in (0.25, 0.5, 0.75, 0.95)
        ],
        *[
            F.round(F.percentile(p, pc), 4).alias(f"price_p{int(pc * 100)}")
            for pc in (0.5, 0.95)
        ],
    )


def null_semantics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling suite over the (closed_at-nullable) issues shape:
    null-safe equality, coalesce, nullif, count(col) vs count(*),
    conditional counting of nulls."""
    from .silver import synth_issues

    b = synth_issues(spark, sf_dir)
    return b.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("closed_at").alias("n_closed_non_null"),
        F.sum(F.when(F.col("closed_at").isNull(), 1).otherwise(0)).alias("n_closed_null"),
        F.count(F.nullif(F.col("state"), F.lit("open"))).alias("n_nullif_open"),
        F.date_format(
            F.min(F.coalesce(F.col("closed_at"), F.col("created_at"))).cast("date"), "yyyy-MM-dd"
        ).alias("min_effective_date"),
        F.sum(
            F.when(F.col("closed_at").eqNullSafe(F.lit(None).cast("timestamp_ntz")), 1).otherwise(0)
        ).alias("n_nullsafe_eq_null"),
    )


def q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str, brand: str = "Brand#4"
) -> DataFrame:
    """TPC-H Q17 shape — correlated aggregate subquery: revenue from
    lineitems whose quantity is below 20% of the part's own average
    quantity, for one brand. The correlation decorrelates into a
    per-part aggregate joined back on partkey (never a re-aggregation
    per probe row)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == brand)
    avg_q = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg((F.avg("l_quantity") * 0.2).alias("qty_threshold"))
    )
    filtered = li.join(
        avg_q, (li.l_partkey == avg_q.l_partkey) & (li.l_quantity < F.col("qty_threshold"))
    )
    return filtered.agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        # exact decimal sum, then a single double division: decimal
        # division scale rules differ between engines, double doesn't
        r2(F.sum(money(F.col("l_extendedprice"))).cast("double") / 7.0).alias(
            "avg_yearly_revenue"
        ),
    )


def q18_large_volume_orders(
    spark: SparkSession, sf_dir: str, min_qty: float = 300.0
) -> DataFrame:
    """TPC-H Q18 shape — HAVING over a fact aggregate, joined back to
    the order and customer: large-volume orders above ``min_qty``
    total quantity. The heavy aggregate runs once over lineitem; the
    tiny survivor set then drives broadcast joins."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        o.join(F.broadcast(big), o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            F.col("c_custkey").alias("custkey"),
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            r2(F.col("o_totalprice")).alias("o_totalprice"),
            r2(F.col("sum_qty")).alias("sum_qty"),
        )
    )


Q19_BANDS = [
    ("Brand#4", 1, 5, 1.0, 11.0),
    ("Brand#2", 1, 10, 10.0, 20.0),
    ("Brand#19", 1, 15, 20.0, 30.0),
]


def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — OR of conjunctive predicate bands across the
    join: revenue from lineitems matching any (brand, size-range,
    qty-range) band. Exercises disjunctive predicate pushdown; the
    common `p_partkey = l_partkey` join key keeps it a single hash
    join with the OR evaluated post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = F.lit(False)
    for brand, s_lo, s_hi, q_lo, q_hi in Q19_BANDS:
        cond = cond | (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )
    from .relational import decimal_revenue

    return j.filter(cond).agg(
        F.count(F.lit(1)).alias("n_items"),
        r2(decimal_revenue(F.col("l_extendedprice"), F.col("l_discount")).cast("double")).alias(
            "revenue"
        ),
    )


PROFILE_COLUMNS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling mart: one row per column with null rate,
    distinct count, and min/max (rendered to strings). All columns
    profile in ONE scan — the per-column aggregates live in a single
    groupBy-less agg, then unpivot via stack."""
    o = load_table(spark, sf_dir, "orders")
    double_cols = {f.name for f in o.schema.fields if f.dataType.simpleString() == "double"}
    aggs = []
    for c in PROFILE_COLUMNS:
        if c in double_cols:
            # doubles through an explicit printf-style format so both
            # engines produce the identical string (no engine-native
            # double→string rendering path remains)
            mn = F.format_string("%.2f", F.min(F.col(c)))
            mx = F.format_string("%.2f", F.max(F.col(c)))
        else:
            mn = F.min(F.col(c)).cast("string")
            mx = F.max(F.col(c)).cast("string")
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            mn.alias(f"{c}__min"),
            mx.alias(f"{c}__max"),
        ]
    wide = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in PROFILE_COLUMNS
    )
    return wide.selectExpr(
        f"stack({len(PROFILE_COLUMNS)}, {stack_args}) AS "
        "(col_name, n, n_nulls, n_distinct, min_s, max_s)"
    )


def props_map_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured map handling: parse the JSON props column into
    map<string,string>, then aggregate over map entries — key counts
    and per-key value statistics. from_json + map functions keep the
    whole pass JVM-side (no string re-parsing per access)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,string>")
    entry = F.explode(m)
    return (
        e.select("event_type", entry.alias("key", "val"))
        .groupBy("event_type", "key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("val").alias("n_distinct_vals"),
            r6(F.avg(F.col("val").try_cast("double"))).alias("avg_numeric_val"),
        )
    )


def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function suite over one window: rank, dense_rank,
    ntile, percent_rank, cume_dist, first/last value per priority
    ordered by price (tiebreak on key for determinism)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        o.filter(F.col("o_orderkey") % 50 == 0)  # thin deterministic sample
        .select(
            "o_orderpriority",
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            r6(F.percent_rank().over(w)).alias("pct_rank"),
            r6(F.cume_dist().over(w)).alias("cume"),
            F.first("o_orderkey").over(wf).alias("top_orderkey"),
        )
    )


def label_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function suite over the labels column: sort, contains,
    position, distinct size, filtered subset, joined rendering."""
    from .silver import synth_issues

    b = synth_issues(spark, sf_dir)
    return b.select(
        "issue_id",
        F.array_join(F.array_sort("labels"), ",").alias("sorted_labels"),
        F.array_contains("labels", "Bug").alias("has_bug"),
        F.array_position(F.col("labels"), "Blocker").cast("long").alias("blocker_pos"),
        F.array_size(F.array_distinct("labels")).cast("long").alias("n_distinct"),
        F.array_join(
            F.filter(F.col("labels"), lambda x: x.startswith("component")), "|"
        ).alias("component_labels"),
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts over per-user event sequences:
    (from_type -> to_type) frequencies with the share of each
    from-state's outgoing transitions. One shuffle on user for the
    LAG, one aggregation."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        r6(F.col("n") / F.sum("n").over(tot)).alias("share"),
    )


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    in each subsequent week they return. Two aggregations (first-seen
    per user, then cohort x offset distinct users) — the standard
    product-analytics triangle."""
    e = load_table(spark, sf_dir, "events")
    day0 = F.date_trunc("week", F.col("ts"))
    first_seen = e.groupBy("user_id").agg(F.min(day0).alias("cohort_week"))
    j = e.join(first_seen, "user_id")
    week_offset = F.floor(
        (F.unix_timestamp(F.date_trunc("week", F.col("ts"))) - F.unix_timestamp("cohort_week"))
        / (7 * 86400)
    )
    return (
        j.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            week_offset.cast("long").alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


def histogram_prices(spark: SparkSession, sf_dir: str, bin_width: float = 25000.0) -> DataFrame:
    """Fixed-width histogram of order prices: floor-division binning
    (portable across engines, unlike width_bucket variants), one
    map-side-combinable aggregation."""
    o = load_table(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / bin_width).cast("long")
    return o.groupBy(b.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        r2(F.min("o_totalprice")).alias("min_price"),
        r2(F.max("o_totalprice")).alias("max_price"),
    )


def daily_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample with gap fill: daily event counts per
    type, zero-filled for (day, type) combinations with no events.
    The grid (days x types) is tiny relative to the fact table and is
    built driver-free: sequence() over the min/max day, broadcast
    cross join against the distinct types, left join the aggregate."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    types = e.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    daily = (
        e.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).alias("total_value"),
        )
    )
    return (
        grid.join(daily, ["day", "event_type"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            r2(F.coalesce(F.col("total_value").cast("double"), F.lit(0.0))).alias(
                "total_value"
            ),
        )
    )
