"""Relational core: the query shapes a user of the reference's data
marts needs from a general engine — joins, multi-aggregates, window
ranks, grouping sets, pivot, as-of / range joins, sessionization,
funnels, JSON extraction.

Everything is declarative DataFrame API: Catalyst chooses broadcast
vs shuffle joins (small dims are explicitly ``broadcast()``), filters
sit ahead of joins so they push into the parquet scans, and every
aggregate is associative (map-side combinable) unless the semantics
require otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table


def r6(c):
    """Round a double to 6dp — applied identically in the DuckDB
    oracles so float hash comparisons are stable."""
    return F.round(c, 6)


def r2(c):
    """Round large-magnitude sums to 2dp: summation order differs
    across engines/partitionings, so 6dp would sit inside the
    floating-point noise for billion-scale totals."""
    return F.round(c, 2)


def money(c):
    """Exact DECIMAL(12,2) view of a price/discount column.

    Revenue expressions multiply two 2-decimal values -> 4-decimal
    products whose sums land EXACTLY on .005 rounding boundaries;
    float summation order (partitioning, engine) then decides the
    rounding direction. Decimal arithmetic keeps the sum exact in
    every engine, so the final round is deterministic."""
    return c.cast("decimal(12,2)")


def decimal_revenue(price_col, discount_col):
    """sum(price * (1 - discount)) with exact decimal arithmetic."""
    return F.sum(money(price_col) * (F.lit(1).cast("decimal(12,2)") - money(discount_col)))


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + groupBy multi-aggregate.

    Filter precedes the aggregate so it pushes into the parquet scan
    (PushedFilters on l_shipdate); all aggregates are partial-agg
    friendly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(12,2)")
    disc_price = money(F.col("l_extendedprice")) * (one - money(F.col("l_discount")))
    # re-narrow before the second multiply: 26+13 digits would blow the
    # 38-digit decimal cap (Spark silently rescales, DuckDB errors)
    charge = disc_price.cast("decimal(18,4)") * (
        F.lit(1).cast("decimal(8,2)") + F.col("l_tax").cast("decimal(8,2)")
    )
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            r2(F.sum(money(F.col("l_quantity"))).cast("double")).alias("sum_qty"),
            r2(F.sum(money(F.col("l_extendedprice"))).cast("double")).alias("sum_base_price"),
            r2(F.sum(disc_price).cast("double")).alias("sum_disc_price"),
            r2(F.sum(charge).cast("double")).alias("sum_charge"),
            r6(F.sum(money(F.col("l_quantity"))).cast("double") / cnt).alias("avg_qty"),
            r6(F.sum(money(F.col("l_extendedprice"))).cast("double") / cnt).alias("avg_price"),
            r6(F.sum(money(F.col("l_discount"))).cast("double") / cnt).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str, segment: str = "BUILDING") -> DataFrame:
    """TPC-H Q3 shape: selective 3-way join + agg + deterministic top-10."""
    cutoff = F.lit("1995-03-15").cast("timestamp_ntz")
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = decimal_revenue(F.col("l_extendedprice"), F.col("l_discount")).cast("double")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r2(revenue).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str, region: str = "ASIA") -> DataFrame:
    """TPC-H Q5 shape: 6-way join; region/nation/supplier broadcast."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == region)
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = decimal_revenue(F.col("l_extendedprice"), F.col("l_discount")).cast("double")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .filter(c.c_nationkey == s.s_nationkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(r2(revenue).alias("revenue"))
    )


def market_segment_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratios per market segment."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = o.join(c, o.o_custkey == c.c_custkey)
    urgent = F.when(F.col("o_orderpriority").startswith("1"), money(F.col("o_totalprice")))
    return j.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("order_count"),
        r2(F.sum(money(F.col("o_totalprice"))).cast("double")).alias("total_revenue"),
        r2(F.sum(urgent).cast("double")).alias("urgent_revenue"),
        r6(F.sum(money(F.col("o_totalprice"))).cast("double") / F.count(F.lit(1))).alias(
            "avg_order_value"
        ),
    )


def topk_per_group(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k orders by totalprice per priority — window rank with a
    deterministic o_orderkey tiebreak. One shuffle on the group key."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("o_orderpriority", "rank", "o_orderkey", r6(F.col("o_totalprice")).alias("o_totalprice"))
    )


def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP (o_orderstatus, o_orderpriority) grouping sets."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count"),
        r2(F.sum("o_totalprice")).alias("total_price"),
    )


def cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE (event_type, user bucket) grouping sets over events."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("user_bucket", (F.col("user_id") % 10).cast("long"))
        .cube("event_type", "user_bucket")
        .agg(F.count(F.lit(1)).alias("event_count"), r2(F.sum("value")).alias("total_value"))
    )


def pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into columns of summed value per user.

    Pivot values are enumerated explicitly — at scale this avoids the
    extra distinct-collect pass over 100 TB of events.
    """
    e = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    p = (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.sum("value"))
    )
    cols = [F.col("user_id")] + [r6(F.coalesce(F.col(t), F.lit(0.0))).alias(f"{t}_value") for t in types]
    return p.select(*cols)


def asof_join_orders_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: for each order, the latest event of the
    matching user strictly before the order date.

    Spark lacks a native as-of join; the scalable pattern is
    union-and-window: tag both sides, union on (key, time), one
    shuffle-sort per key, ``last(event, ignorenulls)`` over the
    ordered stream, then keep the right-side rows. O(n log n) within
    partitions, a single shuffle on user — no range cross-join blowup.
    """
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    uid_o = (F.col("o_custkey") % 20).cast("long")

    left = e.select(
        F.col("user_id").cast("long").alias("uid"),
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),
        F.col("event_id"),
        F.col("event_type"),
        F.col("value"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    right = o.select(
        uid_o.alias("uid"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        "o_orderkey",
        "o_orderdate",
    )
    # events sort before orders at identical timestamps (side 0 < 1),
    # giving "strictly before or equal"; we use side ordering to make
    # equal-timestamp behavior explicit and deterministic.
    w = (
        Window.partitionBy("uid")
        .orderBy(F.col("t").asc(), F.col("side").asc(), F.col("event_id").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    unioned = left.unionByName(right)
    joined = unioned.select(
        "*",
        F.last("event_id", ignorenulls=True).over(w).alias("last_event_id"),
        F.last("event_type", ignorenulls=True).over(w).alias("last_event_type"),
        F.last("value", ignorenulls=True).over(w).alias("last_event_value"),
    )
    return joined.filter(F.col("side") == 1).select(
        "o_orderkey",
        F.col("uid").alias("user_id"),
        "last_event_id",
        "last_event_type",
        r6(F.col("last_event_value")).alias("last_event_value"),
    )


def range_join_events(spark: SparkSession, sf_dir: str, minutes: int = 5) -> DataFrame:
    """Time-band range join: count error events within N minutes after
    each purchase event, per user.

    Expressed as equi-join on (user, time-bucket) over bucketed time
    plus a residual band predicate — the bucket equi-key keeps this a
    hash join (no BroadcastNestedLoop / cartesian) at any scale.
    """
    e = load_table(spark, sf_dir, "events")
    band = minutes * 60
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    # each purchase probes its own bucket and the next one
    p_b = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                (F.unix_timestamp("p_ts") / band).cast("long"),
                (F.unix_timestamp("p_ts") / band).cast("long") + 1,
            )
        ),
    )
    e_b = errors.withColumn("bucket", (F.unix_timestamp("e_ts") / band).cast("long"))
    j = p_b.alias("p").join(
        e_b.alias("er"),
        (F.col("p.p_user") == F.col("er.e_user"))
        & (F.col("p.bucket") == F.col("er.bucket"))
        & (F.col("er.e_ts") > F.col("p.p_ts"))
        & (F.col("er.e_ts") <= F.col("p.p_ts") + F.expr(f"INTERVAL {band} SECONDS")),
        "left",
    )
    return (
        j.groupBy("p_event_id", "p_user")
        .agg(F.count(F.col("e_ts")).alias("errors_after"))
        .select(
            F.col("p_event_id").alias("purchase_event_id"),
            F.col("p_user").alias("user_id"),
            "errors_after",
        )
    )


def sessionize_events(spark: SparkSession, sf_dir: str, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user's
    inter-event gap exceeds ``gap_minutes``. lag + conditional cumsum
    inside one window partition per user — single shuffle.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # exact integer microseconds (ADVICE r9): the streaming twins
    # (B139 keyed-state, B140 native session_window) compare gaps as
    # int64 µs — a double epoch compare can flip the strict > at a
    # gap of exactly gap_minutes and split a session the streaming
    # surfaces merge. unix_micros keeps all three surfaces (and the
    # DuckDB oracle, epoch_us) on ONE tie rule.
    gap_us = gap_minutes * 60 * 1_000_000
    with_flag = e.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w) > gap_us, 1
        ).otherwise(F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)),
    )
    with_sess = with_flag.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return (
        with_sess.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            r6(F.sum("value")).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_seq").cast("long").alias("session_seq"),
            "n_events",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "session_value",
        )
    )


def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup -> click -> purchase per user: did the
    user reach each stage in order? min-timestamp comparison per
    stage — one groupBy on user, associative aggregates only."""
    e = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = e.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_signup"))
    s3 = s2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    return per_user.select(
        "user_id",
        s1.cast("int").alias("reached_signup"),
        s2.cast("int").alias("reached_click"),
        s3.cast("int").alias("reached_purchase"),
    )


def windowed_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event_type (batch twin of the
    streaming windowed aggregation in streaming/)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour").alias("w"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("event_count"), r6(F.sum("value")).alias("total_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "event_count",
            "total_value",
        )
    )


def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi + left-anti: per nation, customers with vs without
    orders."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi")
    without_orders = c.join(o, c.c_custkey == o.o_custkey, "left_anti")
    a = with_orders.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("customers_with_orders"))
    b = without_orders.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("customers_without_orders")
    )
    return (
        a.join(b, on="c_nationkey", how="full_outer")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.coalesce("customers_with_orders", F.lit(0)).alias("customers_with_orders"),
            F.coalesce("customers_without_orders", F.lit(0)).alias("customers_without_orders"),
        )
    )


def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the ``props`` payload column
    (get_json_object stays JVM-side; no Python json.loads loop)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            r6(F.avg("k")).alias("avg_k"),
        )
    )
