"""Relational core, batch 2: distinct aggregates, HAVING, subquery
shapes (EXISTS / scalar), set operations, string and date functions,
count distributions — the remaining query shapes a warehouse user
expects from a complete engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import decimal_revenue, money, r2, r6


def distinct_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) + plain aggregates in one pass per priority."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("distinct_customers"),
        F.count(F.lit(1)).alias("order_count"),
        r2(F.sum("o_totalprice")).alias("total_price"),
    )


def having_active_customers(spark: SparkSession, sf_dir: str, min_orders: int = 12) -> DataFrame:
    """GROUP BY + HAVING: customers with more than ``min_orders``
    orders, with their total spend."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"), r2(F.sum("o_totalprice")).alias("total_spend"))
        .filter(F.col("n_orders") > min_orders)
        .select(F.col("o_custkey").alias("custkey"), "n_orders", "total_spend")
    )


def exists_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS-subquery shape: customers having at least one urgent
    order AND no error event under their uid — semi + anti join
    composition (both hash joins, no subquery re-scan per row)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    urgent = o.filter(F.col("o_orderpriority").startswith("1"))
    errors = (
        e.filter((F.col("event_type") == "error") & (F.col("value") > 90))
        .select(F.col("user_id").alias("err_uid"))
    )
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .join(errors, (F.col("c_custkey") % 20) == errors.err_uid, "left_anti")
        .select(F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment")
    )


def scalar_subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery shape: orders priced above the global average —
    the scalar is computed once and broadcast (cross-join of a 1-row
    aggregate), never a per-row re-aggregation."""
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg(
        (F.sum(money(F.col("o_totalprice"))).cast("double") / F.count(F.lit(1))).alias(
            "global_avg"
        )
    )
    return (
        o.crossJoin(F.broadcast(avg_price))
        .filter(F.col("o_totalprice") > F.col("global_avg") * 1.5)
        .select(
            "o_orderkey",
            r6(F.col("o_totalprice")).alias("o_totalprice"),
            r6(F.col("global_avg")).alias("global_avg"),
        )
    )


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT composition: classify customer uids by
    purchase-vs-error activity in events."""
    e = load_table(spark, sf_dir, "events")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    erring = e.filter(F.col("event_type") == "error").select("user_id").distinct()
    both = buyers.intersect(erring).withColumn("cohort", F.lit("both"))
    only_buy = buyers.exceptAll(erring).withColumn("cohort", F.lit("buy_only"))
    only_err = erring.exceptAll(buyers).withColumn("cohort", F.lit("error_only"))
    return both.unionByName(only_buy).unionByName(only_err).select("user_id", "cohort")


def string_funcs_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function suite over part names: LIKE filter, substring,
    case folding, length, concat — all JVM string expressions."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").like("%a%"))
        .select(
            "p_partkey",
            F.upper(F.col("p_brand")).alias("brand_upper"),
            F.substring(F.col("p_name"), 1, 5).alias("name_prefix"),
            F.length(F.col("p_name")).cast("long").alias("name_len"),
            F.concat_ws("/", F.col("p_brand"), F.col("p_type")).alias("brand_type"),
            F.regexp_count(F.col("p_name"), F.lit("a")).cast("long").alias("n_a"),
        )
    )


def date_arith_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: quarterly order stats with ship-delay averages
    (join to lineitem; delay = days from order to ship)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    delay_days = (
        F.col("l_shipdate").cast("timestamp").cast("double")
        - F.col("o_orderdate").cast("timestamp").cast("double")
    ) / 86400.0
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            r6(F.avg(delay_days)).alias("avg_ship_delay_days"),
            r6(F.max(delay_days)).alias("max_ship_delay_days"),
        )
    )


def count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count
    (two-level aggregation, includes zero-order customers)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: revenue between (customer nation, supplier
    nation) pairs — two broadcast dim joins + one fact join."""
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            r2(decimal_revenue(F.col("l_extendedprice"), F.col("l_discount")).cast("double")).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def part_revenue_rank(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Join fact->dim + per-group window rank: top-k parts by revenue
    within each brand."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(r2(decimal_revenue(F.col("l_extendedprice"), F.col("l_discount")).cast("double")).alias("revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(F.col("revenue").desc(), F.col("p_partkey").asc())
    return (
        rev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("p_brand", "rank", "p_partkey", "revenue")
    )
