"""TPC-H tail shapes, second wave (Q4/Q8/Q9/Q10/Q12/Q14/Q16/Q20
equivalents) adapted to the driver schema (no partsupp / shipmode /
commitdate columns — lineitem serves as the part↔supplier link and
ship-vs-order-date lag stands in for commit-vs-receipt lag). With
these, every classic TPC-H access pattern the schema can express has
a registry entry.

Scale notes: every dimension join below is an explicit broadcast
(region/nation/supplier/part are tiny at any SF); the only fact-fact
shuffles are groupBys on narrow keys. Global scalars (Q14's monthly
total, Q20's per-part total) are window/conditional aggregates over
the SAME shuffle as the main groupBy — no second scan, no crossJoin
of a 1-row aggregate where a window frame does it in-pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import r2, r6

DEC = "decimal(18,2)"


def _rev():
    """Exact decimal revenue term (matches q1/q5's proven pattern)."""
    return F.col("l_extendedprice").cast(DEC) * (
        F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC)
    )


def order_priority_checking(
    spark: SparkSession, sf_dir: str, date_from: str = "1996-01-01", date_to: str = "1996-04-01"
) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelated to a left-semi join with a
    cross-side predicate: orders placed in one quarter that had at
    least one LATE line (shipped > 60 days after the order date),
    counted per priority. The priority/date filters are pushed to the
    orders scan; the semi join carries only (orderkey, two dates)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def national_market_share(
    spark: SparkSession, sf_dir: str, region: str = "ASIA", nation: str = "NATION_7"
) -> DataFrame:
    """TPC-H Q8 shape — market-share ratio: of all revenue billed to
    customers in ``region``, the share supplied by ``nation``, per
    order year. One fact-fact join (lineitem↔orders); customer,
    supplier and both nation sides are broadcast; the share is a
    conditional sum over the same aggregate — never two scans."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    cust_region = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == region)), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    return (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(cust_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            r2(F.sum(_rev()).cast("double")).alias("total_rev"),
            # divide as doubles: decimal/decimal result scale differs
            # across engines; the SUMS stay exact, the cast of each is
            # deterministic, and IEEE double division matches anywhere
            r6(
                F.sum(F.when(F.col("supp_nation") == nation, _rev()).otherwise(F.lit(0).cast(DEC)))
                .cast("double")
                / F.sum(_rev()).cast("double")
            ).alias("mkt_share"),
        )
    )


def product_profit(spark: SparkSession, sf_dir: str, name_like: str = "%widget%") -> DataFrame:
    """TPC-H Q9 shape — multi-dim profit rollup: for parts matching
    ``name_like``, profit = revenue − 0.6·retailprice·quantity (the
    supply-cost proxy this schema affords), by supplier nation × order
    year. Part filter is pushed and broadcast; the two decimal sums
    stay exact until the final double rounding."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like(name_like))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    supp_nation = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    cost = (
        F.lit(0.6).cast("decimal(3,2)")
        * F.col("p_retailprice").cast(DEC)
        * F.col("l_quantity").cast(DEC)
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")), li.l_partkey == F.col("p_partkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .groupBy("nation", F.year("o_orderdate").alias("yr"))
        .agg(
            r2((F.sum(_rev()) - F.sum(cost)).cast("double")).alias("profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def returned_items_top_customers(
    spark: SparkSession, sf_dir: str, date_from: str = "1996-01-01", date_to: str = "1996-07-01", k: int = 20
) -> DataFrame:
    """TPC-H Q10 shape — returned-revenue top-k: customers ranked by
    revenue on returned lines (l_returnflag = 'R') for orders in a
    half-year window. Deterministic top-k via row_number on the EXACT
    decimal revenue (ties break on custkey) — ordering floats rounded
    per-engine would not be stable across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= date_from) & (F.col("o_orderdate") < date_to)
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("rev_exact"))
    )
    # TakeOrdered top-k (per-partition partial + driver merge), never a
    # single-task rank over every customer; the k survivors get ranks
    # from a k-row window
    top = per_cust.orderBy(F.col("rev_exact").desc(), F.col("o_custkey").asc()).limit(k)
    w = Window.orderBy(F.col("rev_exact").desc(), F.col("o_custkey").asc())
    return (
        top.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("o_custkey").alias("custkey"),
            "c_name",
            F.col("n_name").alias("nation"),
            r2(F.col("rev_exact").cast("double")).alias("returned_rev"),
            F.col("rn").alias("rank"),
        )
    )


def late_shipment_priority(spark: SparkSession, sf_dir: str, late_days: int = 60) -> DataFrame:
    """TPC-H Q12 shape — CASE-sum priority split over a lag predicate:
    per line status, how many lines shipped more than ``late_days``
    after the order date came from high- vs low-priority orders. One
    fact-fact join on orderkey, one narrow groupBy."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority_count"),
        )
    )


def promo_revenue_share(spark: SparkSession, sf_dir: str, yr: int = 1996) -> DataFrame:
    """TPC-H Q14 shape — promo revenue percentage per ship month of
    one year: 100·sum(rev where p_type = 'PROMO')/sum(rev). The part
    side is broadcast; numerator and denominator come out of ONE
    groupBy (conditional sum), not two aggregate branches."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.year("l_shipdate") == yr)
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev()).otherwise(F.lit(0).cast(DEC))
    return (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .groupBy(F.month("l_shipdate").alias("mo"))
        .agg(
            # double division for cross-engine determinism (see Q8 note)
            r6(F.lit(100.0) * F.sum(promo).cast("double") / F.sum(_rev()).cast("double")).alias(
                "promo_share_pct"
            ),
            r2(F.sum(_rev()).cast("double")).alias("total_rev"),
        )
    )


def parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — supplier-count per part class with a NOT-IN
    exclusion: distinct suppliers (from the lineitem link) per
    (brand, type, size bucket), excluding one brand, the PROMO type,
    and suppliers in deficit (s_acctbal < 0 — the 'complaints'
    stand-in). The exclusion list is a broadcast anti join on
    suppkey; pairs are distinct-ed BEFORE the count so the big fact
    shuffle carries (partkey, suppkey) pairs only."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_type") != "PROMO")
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", F.floor(F.col("p_size") / 10).alias("size_bucket"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def excess_supply_suppliers(
    spark: SparkSession, sf_dir: str, name_like: str = "small%", factor: float = 2.0
) -> DataFrame:
    """TPC-H Q20 shape — nested IN decorrelated to a window share: for
    parts matching ``name_like``, suppliers whose shipped quantity of
    a part exceeds ``factor``× that part's per-supplier average (the
    availqty>½ dominance predicate this schema affords — an absolute
    share threshold would go vacuous as supplier count grows with
    SF). Per-part total AND supplier count are window aggregates over
    the SAME (partkey) shuffle as the per-(part,supplier) aggregate —
    no join-back. The comparison is pure double math (exact decimal
    sums cast once) so both engines agree bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like(name_like))
    s = load_table(spark, sf_dir, "supplier")
    per_ps = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
    )
    w = Window.partitionBy("p_partkey")
    dominant = (
        per_ps.withColumn("part_total", F.sum("qty").over(w))
        .withColumn("n_supp", F.count(F.lit(1)).over(w))
        .filter(
            F.col("qty").cast("double")
            > F.lit(factor) * F.col("part_total").cast("double") / F.col("n_supp")
        )
    )
    return (
        dominant.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "s_name",
            "n_parts",
            r2(F.col("s_acctbal")).alias("s_acctbal"),
        )
    )


def forecast_revenue(
    spark: SparkSession,
    sf_dir: str,
    yr: int = 1996,
    disc_lo: float = 0.039,
    disc_hi: float = 0.061,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6 shape — the pure predicate-pushdown aggregate: one
    lineitem scan with three scan-level filters (ship-year band,
    discount band, quantity cap) folding to a single exact-decimal
    sum. Completes the classic 22-query TPC-H access-pattern set.

    Scale: no joins and no groupBy keys — the only exchange is the
    final 1-row partial-aggregate combine, so at 100 TB the cost is
    the (filter-pruned) parquet scan itself; ``PushedFilters`` carries
    all three predicates. The discount bounds sit strictly between the
    data's 0.01 value grid so double representation cannot flip row
    membership in either engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast(DEC) * F.col("l_discount").cast("decimal(4,2)")
    return li.filter(
        (F.col("l_shipdate") >= F.lit(f"{yr}-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(f"{yr + 1}-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= disc_lo)
        & (F.col("l_discount") <= disc_hi)
        & (F.col("l_quantity") < max_qty)
    ).agg(r2(F.sum(rev).cast("double")).alias("promo_forecast_revenue"))
