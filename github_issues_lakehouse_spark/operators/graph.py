"""Iterative graph analytics as DataFrame plans.

``pagerank_trade_graph`` is the third iterative-algorithm family in
the engine (alongside k-means in clustering.py and connected
components in dedup.py): weighted PageRank over the bipartite
customer<->supplier trade graph, with full dangling-mass
redistribution.

Determinism contract (same idiom as k-means): edge weights are exact
counts, ranks are rounded to 6dp after every iteration, so both
engines walk identical rank sequences and the DuckDB oracle unrolls
the same iterations as plain CTEs.

Scale shape: the rank table is node-count-sized and each iteration does
one shuffle (contribution groupBy on dst) plus a broadcast of the
1-row dangling aggregate; ranks are localCheckpointed per iteration
so plan depth stays constant in n_iter — the exact recipe Lloyd's
loop uses. Edge construction is the only corpus-scale stage (one
orders⋈lineitem aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import r6


def pagerank_trade_graph(
    spark: SparkSession, sf_dir: str, n_iter: int = 3, damping: float = 0.85
) -> DataFrame:
    """Weighted PageRank over the customer<->supplier trade graph.

    Nodes: every customer ('c:<key>') and supplier ('s:<key>').
    Edges: both directions of each (customer, supplier) trade pair,
    weighted by lineitem count — rank flows proportional to trade
    volume. Nodes with no trades are dangling; their rank mass is
    redistributed uniformly each iteration (standard PageRank
    correction, so total rank is conserved at 1).
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")

    trade = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    c_node = F.concat(F.lit("c:"), F.col("o_custkey"))
    s_node = F.concat(F.lit("s:"), F.col("l_suppkey"))
    edges = trade.select(c_node.alias("src"), s_node.alias("dst"), "w").unionByName(
        trade.select(s_node.alias("src"), c_node.alias("dst"), "w")
    )
    nodes = (
        customer.select(F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"))
        .unionByName(
            supplier.select(F.concat(F.lit("s:"), F.col("s_suppkey")).alias("node"))
        )
        .distinct()
    )
    # Loop-invariant tables are materialized ONCE (localCheckpoint):
    # without this every iteration re-runs the orders⋈lineitem edge
    # aggregate — n_iter corpus scans instead of one.
    nodes = nodes.localCheckpoint(eager=True)
    n_nodes = nodes.count()  # graph dimension (scalar for the teleport term)

    out_w = edges.groupBy("src").agg(F.sum("w").alias("ow")).localCheckpoint(eager=True)
    # r11 (guide §2.4 "two operations keyed the same way share one
    # exchange"): the pair-grain share table is hash-partitioned by
    # dst ONCE — localCheckpoint preserves the partitioning, so every
    # iteration's contribution groupBy("dst") needs NO Exchange when
    # the rank join broadcasts (auto: the rank table is node-grain,
    # far smaller than the pair-grain shares, and checkpoint stats are
    # exact — no hint, so a cluster-scale node table that outgrows the
    # threshold degrades to SMJ instead of OOMing the driver).
    # Per-round checkpoints are
    # LAZY: no driver-side convergence read exists (fixed n_iter), so
    # the whole walk materializes under ONE action instead of one
    # eager-checkpoint job per iteration.
    weighted = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("ow")).alias("share"))
        .repartition("dst")
        .localCheckpoint(eager=True)
    )

    # the same double on both engines: identical literal, one division
    teleport = F.lit(1.0 - damping) / F.lit(float(n_nodes))
    ranks = nodes.select("node", r6(F.lit(1.0) / F.lit(float(n_nodes))).alias("rank"))
    for _ in range(n_iter):
        contrib = (
            weighted.join(ranks, weighted.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("share")).alias("inflow"))
        )
        dangling = (
            ranks.join(out_w, ranks.node == out_w.src, "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang"))
        )
        ranks = (
            nodes.join(contrib, nodes.node == contrib.dst, "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                r6(
                    teleport
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.col("dang") / F.lit(float(n_nodes))
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.orderBy("node")


def hits_hub_authority(spark: SparkSession, sf_dir: str, n_iter: int = 2) -> DataFrame:
    """B131 (r6): HITS (hubs & authorities) over the same bipartite
    customer<->supplier trade graph as ``pagerank_trade_graph`` —
    customers are hubs (good buyers spread volume across strong
    suppliers), suppliers are authorities (strong suppliers attract
    volume from good buyers). The mutually-recursive centrality pair
    PageRank's single score can't express on a bipartite graph.

    Determinism contract — one step STRICTER than pagerank's 6dp
    doubles: scores live in exact e6 BIGINTs. Each half-iteration is
        raw(s) = sum_c w(c,s) * hub_e6(c)      (exact BIGINT fold,
                                                order-independent)
        auth_e6 = round(raw / sum(raw) * 1e6)  (one double division
                                                of two exact BIGINTs,
                                                identical tree on
                                                both engines)
    so the iterate sequence is bit-identical across engines with no
    float-summation-order exposure at all. L1 normalization (not the
    textbook L2) avoids sqrt while preserving the ranking; init is
    the uniform hub vector 1e6.

    Magnitude bound: hub/auth <= 1e6 after every normalization, so
    the fold stays < 2^53-exact up to ~9e9 total lineitems — past
    that, both engines still agree (identical BIGINT->double casts),
    only absolute rounding granularity degrades.

    Plan/scale: edge construction (one orders JOIN lineitem
    aggregate) is the only corpus-scale stage and is localCheckpointed
    once; each half-iteration is one shuffle at pair grain plus a
    broadcast 1-row total. Constant plan depth via localCheckpoint
    per iterate (the pagerank/k-means recipe).
    """
    if n_iter < 1:
        raise ValueError(
            f"hits_hub_authority needs n_iter >= 1 (got {n_iter}): with zero "
            "iterations there is no authority vector to report"
        )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")

    # r11 (guide §2.4 + VERDICT r10 task 4): TWO partitioned copies of
    # the pair-grain trade frame — one hashed by sk (feeds the
    # authority groupBy), one by ck (feeds the hub groupBy) — so when
    # the node-grain score join broadcasts (auto), neither
    # half-iteration shuffles the pair-grain side: 2 up-front shuffles
    # replace 2 per iteration. Normalize checkpoints are LAZY — no
    # driver-side read exists in the loop (fixed n_iter), so the whole
    # walk materializes under ONE action instead of 2 eager-checkpoint
    # jobs per iteration.
    trade = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(F.col("o_custkey").alias("ck"), F.col("l_suppkey").alias("sk"))
        .agg(F.count(F.lit(1)).cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    trade_by_sk = trade.repartition("sk").localCheckpoint(eager=False)
    trade_by_ck = trade.repartition("ck").localCheckpoint(eager=False)

    def _normalize(raw_df: DataFrame, key: str) -> DataFrame:
        # empty/zero-weight graph: sum(raw) is NULL or 0 — emit 0
        # scores instead of a null-propagating divide (ADVICE r6)
        tot = raw_df.agg(F.sum("raw").alias("tot"))
        return (
            raw_df.crossJoin(F.broadcast(tot))
            .select(
                key,
                F.when(
                    F.coalesce(F.col("tot"), F.lit(0)) > 0,
                    F.round(
                        F.col("raw").cast("double")
                        / F.col("tot").cast("double")
                        * F.lit(1000000.0)
                    ).cast("long"),
                )
                .otherwise(F.lit(0).cast("long"))
                .alias("score_e6"),
            )
            .localCheckpoint(eager=False)
        )

    hub = customer.select(
        F.col("c_custkey").alias("ck"), F.lit(1_000_000).cast("long").alias("score_e6")
    )
    auth = None
    for _ in range(n_iter):
        araw = (
            trade_by_sk.join(hub.withColumnRenamed("score_e6", "h"), "ck")
            .groupBy("sk")
            .agg(F.sum(F.col("w") * F.col("h")).alias("raw"))
        )
        auth = _normalize(araw, "sk")
        hraw = (
            trade_by_ck.join(auth.withColumnRenamed("score_e6", "a"), "sk")
            .groupBy("ck")
            .agg(F.sum(F.col("w") * F.col("a")).alias("raw"))
        )
        hub = _normalize(hraw, "ck")

    hubs = customer.join(hub, customer.c_custkey == hub.ck, "left").select(
        F.concat(F.lit("c:"), F.col("c_custkey")).alias("node"),
        F.lit("hub").alias("role"),
        F.coalesce("score_e6", F.lit(0)).cast("long").alias("score_e6"),
    )
    auths = supplier.join(auth, supplier.s_suppkey == auth.sk, "left").select(
        F.concat(F.lit("s:"), F.col("s_suppkey")).alias("node"),
        F.lit("authority").alias("role"),
        F.coalesce("score_e6", F.lit(0)).cast("long").alias("score_e6"),
    )
    return hubs.unionByName(auths).orderBy("node")


def kcore_trade_graph(
    spark: SparkSession, sf_dir: str, k: int = 6, n_rounds: int = 4
) -> DataFrame:
    """B143 (r10): k-core decomposition of the bipartite
    customer<->supplier trade graph — the standard graph-robustness
    peel (Seidman 1983): repeatedly delete nodes with fewer than
    ``k`` distinct trade partners; what survives is the densely
    interconnected trading core (the subgraph where every member
    keeps >= k partners AMONG THE SURVIVORS — the anti-fragility /
    engagement-tier readout degree alone cannot give, since a
    high-degree node whose partners all peel away peels too).

    Fourth member of the iterative family (k-means / components /
    PageRank): ``n_rounds`` peel rounds with the edge set
    localCheckpointed per round — bounded rounds keep the DuckDB twin
    an unrolled CTE chain (the C33 discipline); the wave test proves
    the peel has CONVERGED at every gate SF (an extra round changes
    nothing), so the bound is evidence-backed, not hoped.

    Plan/scale: edge construction is the only corpus-scale stage (one
    orders⋈lineitem distinct-pair aggregate); each round is one
    degree aggregate + two semi-joins at edge grain, all on node
    keys. Output: surviving nodes with their within-core degree.
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    trade = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    # r11 (guide §2.4 + VERDICT r10 task 4): the symmetric edge list is
    # hash-partitioned by src ONCE — localCheckpoint preserves the
    # partitioning and the keep-filter semi-joins broadcast (node-grain
    # survivor set vs edge-grain list), so every round's degree
    # groupBy("src") and the final core-degree aggregate run with NO
    # Exchange: 1 up-front shuffle replaces n_rounds+1 per-round ones.
    # Round checkpoints are LAZY — no driver-side convergence read
    # exists (fixed rounds), so the whole peel materializes under ONE
    # action instead of one eager-checkpoint job per round.
    edges = trade.unionByName(
        trade.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).repartition("src").localCheckpoint(eager=True)
    for _ in range(n_rounds):
        deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("c"))
        keep = deg.filter(F.col("c") >= k).select("src")
        edges = (
            edges.join(keep, "src", "left_semi")
            .join(keep.select(F.col("src").alias("dst")), "dst", "left_semi")
            .localCheckpoint(eager=False)
        )
    return edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).cast("long").alias("core_degree")
    )
