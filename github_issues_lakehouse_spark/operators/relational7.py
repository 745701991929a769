"""Relational wave 7 (r3, third batch): equi-depth histogram via
distributed order statistics, a column-profile stats mart, marketing
touch attribution, and exact trailing EWMA.

Scale idioms carried over from earlier waves: no whole-table window
(the histogram ranks inside value bands and carries across a
band-count-sized summary), per-group state bounded by a constant
frame (EWMA), 1-row aggregates broadcast instead of collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import ppm_expr as _ppm
from ..sources.registry import load_table
from .relational import r6


def equi_depth_histogram(
    spark: SparkSession, sf_dir: str, buckets: int = 20, n_bands: int = 1024
) -> DataFrame:
    """Equi-depth (equal-frequency) histogram of l_extendedprice —
    the optimizer-statistics twin of the equal-width
    ``histogram_prices``: bucket b holds rows with global rank in
    [b*N/B, (b+1)*N/B), so every bucket has (near-)equal row count
    and the bucket bounds trace the quantile curve.

    The global rank never materializes a whole-table window: rows are
    ranked inside ~``n_bands`` value bands (band width from the 1-row
    min/max aggregate, broadcast), and a cumulative carry over the
    band summary (n_bands rows, not N) lifts local ranks to global —
    the same two-level prefix-sum as distributed_rank/plan_token_shards,
    keyed by VALUE ranges so the rank order follows the price order.
    Bucket assignment is integer arithmetic ((rank-1)*B div N) so
    boundaries are exact on both engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    uid = (F.col("l_orderkey") * 8 + F.col("l_linenumber")).alias("uid")
    rows = li.select(F.col("l_extendedprice").alias("price"), uid)
    stats = rows.agg(
        F.min("price").alias("lo"),
        F.max("price").alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    banded = rows.crossJoin(F.broadcast(stats)).withColumn(
        "band",
        F.least(
            F.floor(
                (F.col("price") - F.col("lo"))
                * n_bands
                / (F.col("hi") - F.col("lo") + F.lit(1e-9))
            ),
            F.lit(n_bands - 1),
        ),
    )
    w_local = Window.partitionBy("band").orderBy("price", "uid")
    local = banded.withColumn("lr", F.row_number().over(w_local))
    per_band = local.groupBy("band").agg(F.max("lr").alias("bn"))
    w_carry = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    carry = per_band.select(
        "band", F.coalesce(F.sum("bn").over(w_carry), F.lit(0)).alias("carry")
    )
    ranked = local.join(F.broadcast(carry), "band").withColumn(
        "bucket", F.expr(f"(((carry + lr) - 1) * {buckets}) div n")
    )
    return (
        ranked.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("price").alias("lo"),
            F.max("price").alias("hi"),
            F.avg("price").alias("avg_price"),
        )
        .select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round("lo", 2).alias("price_lo"),
            F.round("hi", 2).alias("price_hi"),
            r6(F.col("avg_price")).alias("avg_price"),
        )
    )


# column -> kind ('num' castable to double, 'ts' -> epoch, 'str' -> no range)
_PROFILE_TABLES = {
    "orders": [
        ("o_orderkey", "num"),
        ("o_custkey", "num"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "num"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ],
    "lineitem": [
        ("l_orderkey", "num"),
        ("l_partkey", "num"),
        ("l_suppkey", "num"),
        ("l_linenumber", "num"),
        ("l_quantity", "num"),
        ("l_extendedprice", "num"),
        ("l_discount", "num"),
        ("l_tax", "num"),
        ("l_returnflag", "str"),
        ("l_linestatus", "str"),
        ("l_shipdate", "ts"),
    ],
}


def table_stats_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column statistics mart over orders and
    lineitem: row count, null count, exact distinct count, and the
    numeric min/max (timestamps as epoch seconds; strings have no
    numeric range) — the inputs a cost-based optimizer or a data
    catalog publishes per column.

    One aggregate pass per table computes EVERY column's stats in the
    same job (Catalyst plans multi-distinct via a single expand — one
    shuffle per table, not one per column), then the wide 1-row
    result unpivots to the long (table, column) mart shape.
    """
    out: DataFrame | None = None
    for tname, cols in _PROFILE_TABLES.items():
        t = load_table(spark, sf_dir, tname)
        aggs = [F.count(F.lit(1)).alias("_n")]
        for c, kind in cols:
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
            aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
            if kind != "str":
                num = (
                    F.unix_timestamp(c).cast("double")
                    if kind == "ts"
                    else F.col(c).cast("double")
                )
                aggs.append(F.min(num).alias(f"mn_{c}"))
                aggs.append(F.max(num).alias(f"mx_{c}"))
        wide = t.agg(*aggs)
        rows = [
            F.struct(
                F.lit(tname).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.col("_n").cast("long").alias("n_rows"),
                F.col(f"nn_{c}").cast("long").alias("n_nulls"),
                F.col(f"nd_{c}").cast("long").alias("n_distinct"),
                (
                    r6(F.col(f"mn_{c}")) if kind != "str" else F.lit(None).cast("double")
                ).alias("min_num"),
                (
                    r6(F.col(f"mx_{c}")) if kind != "str" else F.lit(None).cast("double")
                ).alias("max_num"),
            )
            for c, kind in cols
        ]
        long = wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
        out = long if out is None else out.unionByName(long)
    return out


def attribution_touchpoints(
    spark: SparkSession, sf_dir: str, lookback_days: int = 7
) -> DataFrame:
    """Marketing attribution: for every purchase event, the click /
    view touches by the same user in the preceding ``lookback_days``
    window — touch count, first- and last-touch event type (the two
    classic attribution models), and days from first touch to
    conversion.

    The touch match is an equi-join on user_id with a time-band
    predicate (the as-of/range-join family); first/last touch are
    resolved with one window row_number per direction over the joined
    touches (ties broken by event_id), then a conditional aggregate —
    no argmin over structs, so both engines use identical semantics.
    Purchases with no touches survive via the left join with
    n_touches = 0.
    """
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    touches = e.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_id").alias("t_id"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("t_type"),
    )
    joined = purchases.join(
        touches,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback_days} DAYS")),
    )
    w_asc = Window.partitionBy("p_id").orderBy("t_ts", "t_id")
    w_desc = Window.partitionBy("p_id").orderBy(F.desc("t_ts"), F.desc("t_id"))
    attributed = (
        joined.withColumn("rn_a", F.row_number().over(w_asc))
        .withColumn("rn_d", F.row_number().over(w_desc))
        .groupBy("p_id")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.max(F.when(F.col("rn_a") == 1, F.col("t_type"))).alias(
                "first_touch_type"
            ),
            F.max(F.when(F.col("rn_d") == 1, F.col("t_type"))).alias(
                "last_touch_type"
            ),
            F.max(
                F.when(F.col("rn_a") == 1, F.col("t_ts"))
            ).alias("first_touch_ts"),
        )
    )
    return (
        purchases.join(attributed, "p_id", "left")
        .select(
            F.col("p_id").alias("purchase_event_id"),
            F.col("p_user").alias("user_id"),
            F.col("p_ts").alias("purchase_ts"),
            F.round("p_value", 2).alias("purchase_value"),
            F.coalesce(F.col("n_touches"), F.lit(0)).cast("long").alias("n_touches"),
            "first_touch_type",
            "last_touch_type",
            # exact integer seconds (a fractional-days division can
            # straddle a 6dp rounding boundary differently per engine)
            (
                F.unix_timestamp("p_ts") - F.unix_timestamp("first_touch_ts")
            ).cast("long").alias("secs_to_convert"),
        )
    )


def ewma_user_value(
    spark: SparkSession, sf_dir: str, alpha: float = 0.3, k: int = 16
) -> DataFrame:
    """Exact exponentially-weighted moving average of event value per
    user over the trailing ``k`` events (pandas ewm(adjust=False)
    recursion seeded at the frame's oldest row): the smoothing
    primitive behind rate monitors and anomaly scores.

    The frame is a constant ``k`` rows, so per-row state is bounded
    regardless of user history length (an unbounded EWMA window would
    be O(history) per row). The recursion runs in FIXED-POINT integer
    cents — acc' = (acc*(10-a10) + x*a10 + 5) div 10 with a10 =
    10*alpha — because a float fold is NOT bit-stable across engines:
    at sf0.1 the two engines' float kernels (FMA contraction) drift
    by 1 ulp on ~6 of 100k rows, enough to flip a 6dp rounding.
    Integer arithmetic is exactly portable; the result is the
    cent-quantized EWMA (alpha quantized to tenths).
    """
    a10 = int(round(alpha * 10))
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(k - 1), 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    arr = F.collect_list(cents).over(w)
    d = e.select("event_id", "user_id", "ts", "value", arr.alias("frame"))
    ewma_cents = F.aggregate(
        F.slice(F.col("frame"), 2, k),
        F.element_at(F.col("frame"), 1),
        lambda acc, x: F.floor((acc * (10 - a10) + x * a10 + 5) / 10).cast("long"),
    )
    return d.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 2).alias("value"),
        r6(ewma_cents / 100.0).alias(f"ewma_{k}"),
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix of the lineitem numeric
    measures (upper triangle incl. diagonal) — the EDA/feature-
    selection companion of stats_summary_lineitem, computed like
    embedding_covariance: EVERY moment (means, squares, cross
    products) in ONE map-side-combinable aggregate, correlations
    assembled on the 1-row result. Adding a column adds accumulators,
    never a pass.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cols = _CORR_COLS
    aggs = []
    for i, c in enumerate(cols):
        x = F.col(c).cast("double")
        aggs.append(F.avg(x).alias(f"m{i}"))
        for j in range(i, len(cols)):
            y = F.col(cols[j]).cast("double")
            aggs.append(F.avg(x * y).alias(f"p{i}_{j}"))
    mom = li.agg(*aggs)
    rows = []
    for i in range(len(cols)):
        for j in range(i, len(cols)):
            cov = F.col(f"p{i}_{j}") - F.col(f"m{i}") * F.col(f"m{j}")
            sd_i = F.sqrt(F.col(f"p{i}_{i}") - F.col(f"m{i}") * F.col(f"m{i}"))
            sd_j = F.sqrt(F.col(f"p{j}_{j}") - F.col(f"m{j}") * F.col(f"m{j}"))
            rows.append(
                F.struct(
                    F.lit(cols[i]).alias("col_a"),
                    F.lit(cols[j]).alias("col_b"),
                    F.round(cov / (sd_i * sd_j), 6).alias("corr"),
                )
            )
    return mom.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.col_a", "r.col_b", "r.corr"
    )


def join_key_skew(
    spark: SparkSession, sf_dir: str, key: str = "l_partkey", topn: int = 10
) -> DataFrame:
    """Join-key skew report for a fact-table key — the diagnostic run
    BEFORE sizing a big join (the engine's salting and AQE-skew
    machinery needs to know which keys are hot): the ``topn``
    heaviest keys with their row share and skew ratio (key rows /
    mean rows per key).

    One count aggregate on the key, a bounded top-n cut (rank by
    (count desc, key) — global TakeOrdered, no full sort), and the
    per-key mean from a broadcast 1-row aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_rows").alias("n_total"),
        F.avg("n_rows").alias("mean_rows"),
    )
    top = per_key.orderBy(F.desc("n_rows"), "key").limit(topn)
    w = Window.orderBy(F.desc("n_rows"), "key")
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "key",
            F.col("n_rows").cast("long").alias("n_rows"),
            r6(F.col("n_rows") / F.col("n_total")).alias("row_share"),
            r6(F.col("n_rows") / F.col("mean_rows")).alias("skew_ratio"),
            F.col("n_keys").cast("long").alias("n_keys_total"),
        )
    )


def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are split into two arms by the
    engine's md5 idiom (deterministic, engine-portable), conversion =
    user made >= 1 purchase, and the two-proportion z statistic
    quantifies the arm difference — the standing experimentation mart.

    One distinct-user pass with a conditional conversion aggregate;
    the z statistic assembles on the 2-row arm summary (broadcast),
    attached to both rows so the output is a single flat table.
    Conversion = above-average purchase count (a has-any-purchase
    definition is degenerate on this data — every user purchases —
    which collapses the pooled variance to zero); the z statistic is
    NULL when the pooled variance is zero anyway (all or none
    converted), mirrored in the oracle.
    """
    e = load_table(spark, sf_dir, "events")
    # user-count-sized and consumed by two branches (threshold + arm
    # assignment) — materialize once instead of re-scanning events
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.sum((F.col("event_type") == "purchase").cast("int")).alias("n_purchases")
        )
        .localCheckpoint(eager=True)
    )
    avg_p = per_user.agg(F.avg("n_purchases").alias("avg_p"))
    users = per_user.crossJoin(F.broadcast(avg_p)).select(
        "user_id",
        (F.col("n_purchases") > F.col("avg_p")).cast("int").alias("converted"),
    )
    arm = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.col("user_id").cast("string"), F.lit("#ab"))), 1, 15),
            16,
            10,
        )
        .cast("decimal(20,0)")
        .cast("long")
        % 2
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    arms = (
        users.withColumn("arm", arm)
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("converted").alias("n_converted"),
        )
        .localCheckpoint(eager=True)  # 2 rows, consumed twice
    )
    # z over the 2-row summary: pivot to one row, compute, re-attach
    wide = arms.groupBy().pivot("arm", ["A", "B"]).agg(
        F.first("n_users").alias("n"), F.first("n_converted").alias("c")
    )
    p_pool = (F.col("A_c") + F.col("B_c")) / (F.col("A_n") + F.col("B_n"))
    se = F.sqrt(
        p_pool * (1.0 - p_pool) * (1.0 / F.col("A_n") + 1.0 / F.col("B_n"))
    )
    z = F.when(
        se > 0.0,
        ((F.col("A_c") / F.col("A_n")) - (F.col("B_c") / F.col("B_n"))) / se,
    )
    ztab = wide.select(r6(z).alias("z_stat"))
    return (
        arms.crossJoin(F.broadcast(ztab))
        .select(
            "arm",
            F.col("n_users").cast("long").alias("n_users"),
            F.col("n_converted").cast("long").alias("n_converted"),
            # ppm rate (VERDICT r3 task 7); the z statistic keeps its
            # double form — sqrt of a pooled variance has no integer
            # representation, and a single 6dp-rounded value is far
            # below the per-row flip-risk of a whole ratio column
            F.expr(_ppm("n_converted", "n_users")).cast("long").alias("conv_rate_ppm"),
            "z_stat",
        )
    )


_JOIN_ESTIMATES = [
    ("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part_lineitem", "part", "p_partkey", "lineitem", "l_partkey"),
    ("supplier_lineitem", "supplier", "s_suppkey", "lineitem", "l_suppkey"),
]


def join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Textbook CBO join-cardinality estimation validated against
    ground truth: est = |L| * |R| / max(ndv_L, ndv_R) for the three
    fact joins, next to the ACTUAL join row count and the relative
    error — the mart that tells you whether statistics-based planning
    can be trusted on this data.

    Per join: one count+distinct aggregate per side (1-row each,
    broadcast) and the real join counted once. Estimates assemble on
    broadcast scalars; nothing wider than the actual joins runs.
    """
    out: DataFrame | None = None
    for name, lt, lk, rt, rk in _JOIN_ESTIMATES:
        left = load_table(spark, sf_dir, lt)
        right = load_table(spark, sf_dir, rt)
        ls = left.agg(
            F.count(F.lit(1)).alias("n_left"), F.countDistinct(lk).alias("ndv_left")
        )
        rs = right.agg(
            F.count(F.lit(1)).alias("n_right"), F.countDistinct(rk).alias("ndv_right")
        )
        actual = (
            left.join(right, left[lk] == right[rk])
            .agg(F.count(F.lit(1)).alias("actual_rows"))
        )
        est = F.col("n_left") * F.col("n_right") / F.greatest(
            F.col("ndv_left"), F.col("ndv_right")
        )
        row = (
            ls.crossJoin(F.broadcast(rs))
            .crossJoin(F.broadcast(actual))
            .select(
                F.lit(name).alias("join_name"),
                F.col("n_left").cast("long").alias("n_left"),
                F.col("n_right").cast("long").alias("n_right"),
                F.col("ndv_left").cast("long").alias("ndv_left"),
                F.col("ndv_right").cast("long").alias("ndv_right"),
                F.round(est, 6).alias("est_rows"),
                F.col("actual_rows").cast("long").alias("actual_rows"),
                F.when(
                    F.col("actual_rows") > 0,
                    F.round(
                        F.abs(est - F.col("actual_rows")) / F.col("actual_rows"), 6
                    ),
                ).alias("rel_error"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def price_quantity_heatmap(
    spark: SparkSession, sf_dir: str, price_step: int = 10000, qty_step: int = 10
) -> DataFrame:
    """2-D histogram of lineitem (price band x quantity band) with
    counts and revenue share — the heat-grid mart behind a pricing
    dashboard. Integer floor-division banding (portable, exact) and
    one map-side-combinable aggregate; grid size is bounded by the
    value ranges, not the data.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pb = F.floor(F.col("l_extendedprice") / price_step).cast("int")
    qb = F.floor(F.col("l_quantity") / qty_step).cast("int")
    DEC = "decimal(18,2)"
    cells = li.groupBy(pb.alias("price_band"), qb.alias("qty_band")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("revenue"),
    )
    total = cells.agg(F.sum("revenue").alias("total_rev"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "price_band",
            "qty_band",
            F.col("n_rows").cast("long").alias("n_rows"),
            # BIGINT cents, never raw DECIMAL (r4 driver canon renders
            # trailing-zero decimals float-style and flips the hash)
            (F.col("revenue").cast("decimal(28,2)") * 100).cast("long").alias("revenue_cents"),
            r6(
                F.col("revenue").cast("double") / F.col("total_rev").cast("double")
            ).alias("revenue_share"),
        )
    )


def weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-activity heat grid (weekday x hour): counts and share of
    all events per cell — the when-are-users-active mart. Portable
    Monday=0 weekday via the epoch-day floor-mod (engine DOW
    conventions differ); one aggregate, bounded 7x24 output.
    """
    e = load_table(spark, sf_dir, "events")
    wd = F.pmod(F.datediff(F.to_date("ts"), F.lit("1970-01-05")), F.lit(7))
    cells = e.groupBy(
        wd.cast("int").alias("weekday"), F.hour("ts").cast("int").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    total = cells.agg(F.sum("n_events").alias("n_total"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "weekday",
            "hour",
            F.col("n_events").cast("long").alias("n_events"),
            r6(F.col("n_events") / F.col("n_total")).alias("share"),
        )
    )


def fulfillment_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B113 (r5): order-to-ship latency distribution per order
    priority — the operational SLA readout (are urgent orders
    actually shipped faster?): per priority, item count, mean latency
    in exact e2 days, and EXACT discrete p50/p90 day values.

    percentile_disc at DAY grain: latencies are small integers, so
    the per-priority cumulative runs over (priority, days) value
    rows — bounded by the latency range (dozens of distinct values),
    never by fact size; the threshold rule is the engine-invariant
    BIGINT identity (smallest v with 100*cum >= q*N), the
    customer_rfm discipline, never an interpolated double.

    Plan/scale: one fact join (orders side dim-like per orderkey —
    shuffle hash join, AQE decides), one (priority, days) aggregate;
    everything after is value-grain.
    """
    from ..functions.exact import ppm_expr as _ppm  # noqa: F401

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("o_orderpriority").alias("priority"),
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("days"),
    )
    vals = j.groupBy("priority", "days").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("priority")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = vals.groupBy("priority").agg(
        F.sum("c").alias("n"), F.sum(F.col("days") * F.col("c")).alias("sum_days")
    )
    cum = vals.withColumn("cum", F.sum("c").over(w)).join(tot, "priority")

    def disc(q: int):
        return F.min(
            F.when(F.col("cum") * 100 >= F.lit(q) * F.col("n"), F.col("days"))
        )

    return (
        cum.groupBy("priority", "n", "sum_days")
        .agg(disc(50).alias("p50_days"), disc(90).alias("p90_days"))
        .selectExpr(
            "priority",
            "CAST(n AS BIGINT) AS n_items",
            "CAST(sum_days * 100 DIV n AS BIGINT) AS mean_days_e2",
            "CAST(p50_days AS BIGINT) AS p50_days",
            "CAST(p90_days AS BIGINT) AS p90_days",
        )
        .orderBy("priority")
    )


def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B115 (r5): skyline / Pareto frontier of parts on (cheap price,
    large size) — the classic multi-criteria "best tradeoffs" query
    (no other part is both at-least-as-large and at-least-as-cheap
    with one strict). One row per frontier (size, price) point with
    the count of parts sitting on it.

    Scale shape: the naive skyline is an O(n^2) self-anti-join; here
    the 2D structure collapses it to VALUE grain — one aggregate to
    distinct (size, min-price-at-size), then a running min over
    sizes DESCENDING (exclusive) gives the cheapest strictly-larger
    competitor, and a (size, price) point is on the frontier iff its
    price beats that. The window runs over |distinct sizes| rows
    (~50), never over parts. Dominance ties handled exactly: equal
    (size, price) points share the frontier.
    """
    p = load_table(spark, sf_dir, "part")
    cents = (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
    pts = p.select(F.col("p_size").cast("long").alias("size"), cents.alias("price"))
    by_pair = pts.groupBy("size", "price").agg(F.count(F.lit(1)).alias("n_parts"))
    at_size = by_pair.groupBy("size").agg(
        F.min("price").alias("min_price"),
    )
    w = (
        Window.orderBy(F.col("size").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_gt = at_size.withColumn("mp_gt", F.min("min_price").over(w))
    frontier = with_gt.filter(
        F.col("mp_gt").isNull() | (F.col("min_price") < F.col("mp_gt"))
    ).select("size", F.col("min_price").alias("price"))
    return (
        frontier.join(by_pair, ["size", "price"])
        .selectExpr(
            "CAST(size AS BIGINT) AS size",
            "CAST(price AS BIGINT) AS price_cents",
            "CAST(n_parts AS BIGINT) AS n_parts",
        )
        .orderBy(F.col("size").desc())
    )


def aov_mix_shift_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B117 (r5): month-over-month average-order-value BRIDGE — the
    classic metric decomposition every analytics team eventually
    builds: did AOV move because segments changed their behavior
    (WITHIN effect) or because the customer MIX shifted toward
    cheaper/richer segments (MIX effect)?

        delta = sum_s w_prev[s]*(aov_cur[s]-aov_prev[s])   (within)
              + sum_s (w_cur[s]-w_prev[s])*aov_cur[s]      (mix)

    Everything is exact integer fixed point: per-(month, segment)
    AOV in e2 cents (rev*100 DIV n), order-count shares in exact
    ppm, per-segment bridge terms as exact BIGINT products summed
    BEFORE one final DIV 1e6 (both engines truncate toward zero —
    verified). The floor slack between the decomposition and the
    month-grain delta is emitted as an explicit residual_e2 column
    (bounded by segment count + ppm rounding), never hidden.

    Plan/scale: one fact join (orders x customer), one month x
    segment aggregate; the bridge runs at month-pair x segment grain
    (bounded). Months pair via add_months self-join, so a calendar
    gap simply produces no bridge row (documented).
    """
    from ..functions.exact import ppm_expr as _ppm

    o = load_table(spark, sf_dir, "orders").select(
        F.trunc("o_orderdate", "MM").alias("month"),
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("month", F.col("c_mktsegment").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("rev"))
    )
    months = cells.groupBy("month").agg(
        F.sum("n").alias("n_m"), F.sum("rev").alias("rev_m")
    )
    enriched = cells.join(months, "month").select(
        "month",
        "segment",
        F.expr("rev * 100 DIV n").cast("long").alias("aov_e2"),
        F.expr(_ppm("n", "n_m")).cast("long").alias("share_ppm"),
    )
    pairs = months.alias("cur").join(
        months.alias("prv"),
        F.col("prv.month") == F.add_months(F.col("cur.month"), -1),
    ).select(
        F.col("cur.month").alias("month"),
        F.col("cur.n_m").alias("n_cur"),
        F.expr("cur.rev_m * 100 DIV cur.n_m").cast("long").alias("aov_cur_e2"),
        F.expr("prv.rev_m * 100 DIV prv.n_m").cast("long").alias("aov_prev_e2"),
        F.col("prv.month").alias("prev_month"),
    )
    cur_cells = enriched.select(
        F.col("month"), "segment",
        F.col("aov_e2").alias("aov_cur_s"), F.col("share_ppm").alias("w_cur"),
    )
    prv_cells = enriched.select(
        F.col("month").alias("prev_month"), "segment",
        F.col("aov_e2").alias("aov_prev_s"), F.col("share_ppm").alias("w_prev"),
    )
    terms = (
        pairs.join(cur_cells, "month", "left")
        .join(prv_cells, ["prev_month", "segment"], "full")
        .filter(F.col("month").isNotNull() | F.col("prev_month").isNotNull())
    )
    # full-outer may leave month null for segments present only in the
    # previous month: recover it from prev_month + 1
    terms = terms.withColumn(
        "month", F.coalesce(F.col("month"), F.add_months(F.col("prev_month"), 1))
    ).select(
        "month",
        F.coalesce("aov_cur_s", F.lit(0)).alias("ac"),
        F.coalesce("w_cur", F.lit(0)).alias("wc"),
        F.coalesce("aov_prev_s", F.lit(0)).alias("ap"),
        F.coalesce("w_prev", F.lit(0)).alias("wp"),
    )
    bridge = terms.groupBy("month").agg(
        F.expr("CAST(sum(wp * (ac - ap)) DIV 1000000 AS BIGINT)").alias("within_e2"),
        F.expr("CAST(sum((wc - wp) * ac) DIV 1000000 AS BIGINT)").alias("mix_e2"),
    )
    return (
        pairs.join(bridge, "month")
        .selectExpr(
            "date_format(month, 'yyyy-MM') AS month",
            "CAST(n_cur AS BIGINT) AS n_orders",
            "CAST(aov_cur_e2 AS BIGINT) AS aov_e2",
            "CAST(aov_cur_e2 - aov_prev_e2 AS BIGINT) AS delta_aov_e2",
            "within_e2",
            "mix_e2",
            "CAST(aov_cur_e2 - aov_prev_e2 - within_e2 - mix_e2 AS BIGINT) AS residual_e2",
        )
        .orderBy("month")
    )


def ab_srm_check(
    spark: SparkSession, sf_dir: str, target_a_permille: int = 500
) -> DataFrame:
    """B134 (r6): sample-ratio-mismatch (SRM) guardrail for the A/B
    machinery — the FIRST check every experimentation platform runs
    before reading any metric (Kohavi et al.): does the realized arm
    split match the configured ratio? A mismatched split means broken
    assignment/logging and invalidates the experiment regardless of
    what ab_test_conversion (B88) says. Uses the same deterministic
    md5 user-arm assignment as B88 (seed '#ab'), so this audits the
    exact split the conversion mart reads.

    Pearson chi-square on COUNTS (not shares — ADVICE r6 high: a
    share-based statistic omits N, capping chi2 at 1.0 and making the
    flag unreachable): per arm, with n_exp = total * exp_permille /
    1000 kept exact in thousandths (d_milli = 1000*n_obs -
    total*exp_permille),
    chi2_contrib_e6 = 1e6 * d_milli^2 DIV (1000 * total *
    exp_permille) — algebraically 1e6*(n_obs-n_exp)^2/n_exp with zero
    float; DECIMAL(38,0) intermediates (the square can pass 2^63 at
    cluster N), final cast BIGINT. The 2-row total rides along and
    the flag tests it against the df=1 5% critical value (3.841459
    e6, pinned literal — no runtime chi-square inverse). Now
    N-sensitive: 50.5/49.5 on 1M users → chi2_e6 = 100,000,000
    (chi2=100), detected; the same shares on 1k users → chi2=0.1,
    passed — exactly Kohavi's guardrail semantics.

    Plan/scale: one distinct-user pass (the only corpus-scale stage),
    then 2-row arithmetic.
    """
    from ..functions.exact import ppm_expr as _ppm

    e = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("user_id").cast("string"), F.lit("#ab"))), 1, 15
            ),
            16,
            10,
        )
        .cast("decimal(20,0)")
        .cast("long")
        % 2
        == 0,
        F.lit("A"),
    ).otherwise(F.lit("B"))
    users = e.select("user_id").distinct().withColumn("arm", arm)
    per = users.groupBy("arm").agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    exp_permille = F.when(
        F.col("arm") == "A", F.lit(target_a_permille)
    ).otherwise(F.lit(1000 - target_a_permille))
    w_all = Window.partitionBy()  # 2 bounded rows
    scored = (
        per.withColumn("total", F.sum("n_users").over(w_all))
        .withColumn("obs_ppm", F.expr(_ppm("n_users", "total")).cast("long"))
        .withColumn("exp_permille", exp_permille.cast("long"))
        .withColumn("expected_ppm", (F.col("exp_permille") * 1000).cast("long"))
        # d_milli = 1000*(n_obs - n_exp): exact in thousandth-users
        .withColumn(
            "d_milli",
            (
                F.lit(1000) * F.col("n_users")
                - F.col("total") * F.col("exp_permille")
            ).cast("long"),
        )
        .withColumn(
            "chi2_contrib_e6",
            F.expr(
                "CAST(CAST(1000000 AS DECIMAL(38,0))"
                " * CAST(d_milli AS DECIMAL(38,0))"
                " * CAST(d_milli AS DECIMAL(38,0))"
                " DIV (CAST(1000 AS DECIMAL(38,0))"
                " * CAST(total AS DECIMAL(38,0))"
                " * CAST(exp_permille AS DECIMAL(38,0))) AS BIGINT)"
            ),
        )
        .withColumn("chi2_e6", F.sum("chi2_contrib_e6").over(w_all).cast("long"))
    )
    return scored.select(
        "arm",
        "n_users",
        "obs_ppm",
        "expected_ppm",
        "chi2_contrib_e6",
        "chi2_e6",
        (F.col("chi2_e6") > 3_841_459).alias("srm_detected"),
    ).orderBy("arm")
