"""TPC-H tail shapes (Q2/Q11/Q15/Q21/Q22 equivalents) adapted to the
driver schema (no partsupp/receiptdate columns — lineitem serves as
the part↔supplier link). These close out the classic decorrelation /
global-scalar / multi-anti-join patterns in the relational core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import r2, r6


def min_cost_supplier(spark: SparkSession, sf_dir: str, size_max: int = 15) -> DataFrame:
    """TPC-H Q2 shape — correlated MIN subquery, decorrelated: for
    each small part, the supplier offering its minimum average price
    (lineitem is the part↔supplier link). The per-(part, supplier)
    aggregate runs once; the correlated `= min(...)` becomes a window
    min over the part — never a re-aggregation per probe row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= size_max)
    s = load_table(spark, sf_dir, "supplier")
    offer = (
        li.join(F.broadcast(p.select("p_partkey", "p_size")), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.round(F.avg("l_extendedprice"), 6).alias("avg_price"))
    )
    w = Window.partitionBy("p_partkey")
    best = (
        offer.withColumn("min_price", F.min("avg_price").over(w))
        .filter(F.col("avg_price") == F.col("min_price"))
        .drop("min_price")
    )
    return (
        best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
        .select(
            "p_partkey",
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            r6(F.col("avg_price")).alias("avg_price"),
            r2(F.col("s_acctbal")).alias("s_acctbal"),
        )
    )


def important_parts_share(
    spark: SparkSession, sf_dir: str, fraction: float = 0.0005
) -> DataFrame:
    """TPC-H Q11 shape — HAVING against a global scalar: parts whose
    revenue exceeds ``fraction`` of total corpus revenue. The global
    total is a 1-row aggregate broadcast into the filter (no
    recomputation per group, no second scan of the aggregate)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.sum(
        (F.col("l_extendedprice").cast("decimal(18,2)")
         * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")))
    )
    per_part = li.groupBy("l_partkey").agg(rev.alias("part_rev"))
    total = per_part.agg(F.sum("part_rev").alias("total_rev"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_rev") > F.col("total_rev") * fraction)
        .select(
            "l_partkey",
            r2(F.col("part_rev").cast("double")).alias("part_rev"),
            r6((F.col("part_rev") / F.col("total_rev")).cast("double")).alias("rev_share"),
        )
    )


def top_supplier_revenue(
    spark: SparkSession, sf_dir: str, ship_from: str = "1996-01-01", ship_to: str = "1996-04-01"
) -> DataFrame:
    """TPC-H Q15 shape — aggregate view + scalar MAX join-back: the
    supplier(s) with maximum revenue in a shipdate quarter. The
    revenue aggregate is computed once; the max is a 1-row broadcast
    joined back on equality (ties all surface, as in Q15)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ship_from) & (F.col("l_shipdate") < ship_to)
    )
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("total_rev")
        )
    )
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            r2(F.col("total_rev").cast("double")).alias("total_rev"),
        )
    )


def returns_blame_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — EXISTS + NOT EXISTS over the same fact:
    suppliers with returned lines (l_returnflag = 'R') on
    multi-supplier orders where NO other supplier on the order had a
    return. Both quantifiers decorrelate into order-level aggregates
    computed in ONE pass over lineitem, then a semi-style join —
    never a per-row correlated rescan."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_suppliers"),
    )
    blamed = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter(
                (F.col("n_suppliers") > 1) & (F.col("n_ret_suppliers") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
    )
    return (
        blamed.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(F.col("l_suppkey").alias("suppkey"), "s_name", "numwait")
    )


def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — scalar AVG subquery + anti join: customers in
    selected segments whose balance beats the positive-balance
    average and who have no URGENT orders (this corpus gives every
    customer *some* order, so Q22's no-orders-at-all predicate would
    be vacuously empty). The average is a broadcast 1-row aggregate;
    the NOT EXISTS is a left anti join carrying only custkeys, with
    the priority filter pushed to the orders scan."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").startswith("1"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("avg_bal"))
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        r2(F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")).alias("total_bal"),
    )
