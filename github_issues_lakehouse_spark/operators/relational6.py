"""Interval-analytics relational operators: global concurrency via a
distributed two-level prefix sum, and value-range window frames
(time-based trailing aggregates).

Both are shapes the reference's pandas pipeline could only do with
driver-resident sorts; here they are expressed so the heavy ordering
work stays partition-local:

- ``concurrent_sessions`` needs a GLOBAL running sum over session
  start/end deltas — the classic scale trap is a single-partition
  ``Window.orderBy``. Instead the running sum is computed per DAY
  partition, and a per-day carry-in (the cumulative sum of all prior
  days' net deltas) is added as a broadcast join: the only global
  step is a window over ~one row per day, which is bounded by the
  calendar, not the data. This is the textbook distributed prefix
  sum (scan) decomposition.
- ``trailing_window_user_value`` uses Spark's RANGE frame on an
  integer microsecond epoch — the frame bound is evaluated JVM-side
  within one shuffle on user_id; integer micros (``unix_micros`` /
  DuckDB ``epoch_us``) keep the frame arithmetic exact on both
  engines (no double rounding at the boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import ppm_expr as _ppmx
from ..sources.registry import load_table
from .relational import r6


def _sessions(spark: SparkSession, sf_dir: str, gap_minutes: int) -> DataFrame:
    """(user_id, session_start, session_end) with raw timestamps —
    the same lag + conditional-cumsum plan as ``sessionize_events``
    (one shuffle on user_id), kept unrendered for interval math."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap = gap_minutes * 60
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w) > gap, 1
        ).otherwise(F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)),
    ).withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return flagged.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"), F.max("ts").alias("session_end")
    )


def concurrent_sessions(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Peak concurrent sessions per day: +1/-1 sweep over session
    start/end deltas, inclusive bounds (a session [t, t] counts as
    concurrent at instant t, so +1 sorts before -1 at equal time).

    Determinism under ties: rows tie only on (t, delta); within a tie
    group the running sum visits the same multiset of values in any
    order (all deltas equal), so per-day MAX is order-invariant —
    exactly what the single-ordering DuckDB oracle computes.

    Scale shape: the within-day running sum shuffles once on day; the
    cross-day carry is a window over one row per day (calendar-
    bounded) broadcast back. No global sort. A day with pathological
    volume is still one partition — at that point split the carry key
    to (day, hour) with the same two-level construction.
    """
    sess = _sessions(spark, sf_dir, gap_minutes)
    # One explode instead of a two-branch union: a union would plan
    # the whole sessionize subtree twice (once per branch).
    d = sess.select(
        F.explode(
            F.array(
                F.struct(F.col("session_start").alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col("session_end").alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("e")
    ).select(F.to_date("e.t").alias("day"), F.col("e.t").alias("t"), F.col("e.delta"))

    wd = Window.partitionBy("day").orderBy(F.col("t").asc(), F.col("delta").desc())
    local = d.withColumn(
        "run",
        F.sum("delta").over(wd.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )

    # Per-day folds ride the SAME day hash partitioning as the window
    # (no extra shuffle); the cross-day carry is then a window over
    # one row per day — calendar-bounded — added without any join.
    perday = local.groupBy("day").agg(
        F.max("run").alias("local_peak"),
        F.sum("delta").alias("day_delta"),
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0)).alias("sessions_started"),
    )
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    return perday.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        (
            F.col("local_peak")
            + F.coalesce(F.sum("day_delta").over(w_days), F.lit(0))
        )
        .cast("long")
        .alias("peak_concurrency"),
        F.col("sessions_started").cast("long").alias("sessions_started"),
    )


def trailing_window_user_value(
    spark: SparkSession, sf_dir: str, trailing_seconds: int = 3600
) -> DataFrame:
    """Per event: count and value-sum of the user's events in the
    trailing ``trailing_seconds`` window (inclusive of the current
    instant) — a time-based RANGE frame, not a row frame, so bursts
    and gaps are handled correctly.

    One shuffle on user_id; the frame is evaluated inside the sort
    within each partition (WholeStageCodegen window exec). Integer
    microsecond epochs make the frame boundary exact and identical
    across engines; peers at the same micro-instant are all included
    by RANGE semantics on both sides.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-trailing_seconds * 1_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).cast("long").alias("n_trailing"),
        r6(F.sum("value").over(w)).alias("value_trailing"),
    )


def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/concentration analysis: the revenue share captured by
    orders above the p90/p95/p99 price thresholds. Threshold-based
    (exact percentile + conditional DECIMAL sums in one pass) rather
    than rank-based: a global percent_rank would funnel every order
    through one sort partition, while percentiles + conditional
    aggregation stay map-side combinable — same answer semantics
    (ties at the threshold included), 100 TB-safe.
    """
    DEC = "decimal(18,2)"
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").cast(DEC).alias("p")
    )
    pcts = o.agg(
        *[
            F.percentile(F.col("p").cast("double"), F.lit(q)).alias(f"t{int(q * 100)}")
            for q in (0.90, 0.95, 0.99)
        ]
    )
    joined = o.join(F.broadcast(pcts))
    # Shares: exact DECIMAL sums first, then cast to double and
    # divide — decimal/decimal division scale rules differ between
    # engines, double division of identical exact sums does not.
    share = lambda t: r6(  # noqa: E731
        F.sum(
            F.when(F.col("p").cast("double") >= F.col(t), F.col("p")).otherwise(
                F.lit(0).cast("decimal(18,2)")
            )
        ).cast("double")
        / F.sum("p").cast("double")
    )
    return joined.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        # BIGINT cents, never raw DECIMAL (r4 driver canon renders
        # trailing-zero decimals float-style and flips the hash)
        (F.sum("p").cast("decimal(28,2)") * 100).cast("long").alias("total_revenue_cents"),
        r6(F.first("t90")).alias("p90_threshold"),
        r6(F.first("t95")).alias("p95_threshold"),
        r6(F.first("t99")).alias("p99_threshold"),
        share("t90").alias("share_top10"),
        share("t95").alias("share_top5"),
        share("t99").alias("share_top1"),
    )


def event_path_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered per-user event paths + regex pattern verdicts — the
    MATCH_RECOGNIZE-lite primitive: collect each user's event types
    in (ts, event_id) order, join to a path string, and test
    conversion/recovery patterns with one regexp pass.

    Determinism: collect_list order is NOT guaranteed under
    distributed aggregation, so the list is an array_sort over
    (ts, event_id, type) structs — the sort key makes the aggregation
    order-insensitive, which is exactly what the oracle's
    string_agg(... ORDER BY ts, event_id) computes. One shuffle on
    user_id; the path stays bounded by the user's event count.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "event_type"))
        ).alias("seq")
    )
    path = F.concat_ws(">", F.transform(F.col("seq"), lambda s: s["event_type"]))
    return per_user.select(
        "user_id",
        F.size("seq").cast("long").alias("n_events"),
        F.md5(path.cast("binary")).alias("path_hash"),
        path.rlike("signup.*purchase").alias("converted"),
        path.rlike("error>purchase").alias("recovered_immediately"),
        path.rlike("^view(>view)*$").alias("browse_only"),
    )


def session_window_batch(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE ``session_window``
    aggregate in a BATCH query — the declarative twin of the manual
    lag+cumsum ``sessionize_events`` plan (and of streaming D8). The
    native form keeps session merging inside one JVM aggregate:
    same single shuffle on the grouping key, no window-function pass.

    Session bounds semantics: session_window's end is last_event +
    gap, so the emitted bounds are [min(ts), max(ts)] from the
    aggregate itself, matching the manual operator's rendering. The
    oracle is the same gap-CTE as sessionize_events aggregated to
    (user, start, end, n, value) — native vs manual must agree
    exactly.
    """
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            r6(F.sum("value")).alias("session_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("last_ts", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured handling via Spark 4's VARIANT type: parse the
    JSON payload once into a variant column (binary-encoded,
    schema-on-read) and extract typed paths with try_variant_get —
    the modern engine path for ragged JSON, replacing per-access
    get_json_object string re-parsing. At 100 TB the difference is
    parsing each payload once vs once per extracted field.

    try_parse_json nulls (rather than fails) on malformed payloads,
    so n_valid_json doubles as the payload-quality counter.
    """
    e = load_table(spark, sf_dir, "events")
    v = e.withColumn("v", F.try_parse_json("props"))
    k = F.try_variant_get("v", "$.k", "long")
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").isNotNull().cast("long")).alias("n_valid_json"),
            F.sum(k).alias("sum_k"),
            r6(F.avg(k)).alias("avg_k"),
        )
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("n_valid_json").cast("long").alias("n_valid_json"),
            F.col("sum_k").cast("long").alias("sum_k"),
            "avg_k",
        )
    )


def unpivot_lineitem_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long via Spark's NATIVE ``DataFrame.unpivot`` (the
    relational MELT verb): per (returnflag, linestatus) totals of
    four measures unpivoted into (metric, total) rows — the shape a
    generic metrics store or chart layer consumes. unpivot is the
    API form; the `stack` expression used elsewhere (profile/dq) is
    its SQL spelling — both lower to the same Expand node, linear in
    rows x metrics, no shuffle beyond the one aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    DEC = "decimal(18,2)"
    # Every value column becomes a BIGINT in fixed e4 units (value x
    # 10000) BEFORE the unpivot: the melt coerces all value columns
    # to a common type, and any DECIMAL in that position lets each
    # engine (or engine VERSION) pick its own common scale/rendering
    # — the r3 driver-hash failure. Integers unpivot to integers
    # everywhere; the decimal sums are exact, the x10000 lands on an
    # integral value, so the cast loses nothing. Headroom: per-group
    # sums stay exact up to ~9e14 currency units per cell.
    wide = li.groupBy("l_returnflag", "l_linestatus").agg(
        (F.sum(F.col("l_quantity").cast(DEC)) * 10000).cast("long").alias("quantity"),
        (F.sum(F.col("l_extendedprice").cast(DEC)) * 10000).cast("long").alias("extendedprice"),
        (F.sum(
            F.col("l_extendedprice").cast(DEC)
            * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
        ) * 10000).cast("long").alias("discounted"),
        (F.sum(F.col("l_tax").cast(DEC)) * 10000).cast("long").alias("tax"),
    )
    long = wide.unpivot(
        ids=["l_returnflag", "l_linestatus"],
        values=["quantity", "extendedprice", "discounted", "tax"],
        variableColumnName="metric",
        valueColumnName="total_e4",
    )
    return long.select("l_returnflag", "l_linestatus", "metric", "total_e4")


def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user TIME-WEIGHTED average value (TWAP shape): each
    event's value is weighted by how long it was "current" — the
    duration until the user's next event. Plain averages overweight
    burst periods; the time-weighted form is what telemetry/pricing
    reads actually mean.

    Exactness: values freeze to integer cents and durations to
    integer microseconds, so every weighted term and both sums are
    exact BIGINTs on both engines (cents x us x events stays far
    below 2^63 at these magnitudes; at larger scale swap to
    DECIMAL(38,0) sums, same plan). One shuffle on user_id: the lead
    window and the aggregate share the partitioning. Last events
    (no successor) carry zero weight and drop out of both sums.
    """
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    dur = F.lead(us).over(w) - us
    cents = F.round(F.col("value") * 100).cast("long")
    terms = e.select(
        "user_id",
        dur.alias("dur_us"),
        (cents * dur).alias("weighted"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        terms.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_intervals"),
            F.sum("dur_us").cast("long").alias("total_us"),
            F.sum("weighted").cast("long").alias("weighted_sum"),
        )
        .select(
            "user_id",
            "n_intervals",
            "total_us",
            F.round(
                F.col("weighted_sum").cast("double")
                / F.col("total_us").cast("double")
                / 100.0,
                6,
            ).alias("time_weighted_value"),
        )
    )


def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: each user's LONGEST run of consecutive
    active days — the canonical streak/retention shape. The island
    key is day_number - row_number (constant within a consecutive
    run), so islands fall out of one distinct + one window + one
    aggregate; no self-joins, no recursion. Two shuffles total on
    user-led keys.
    """
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "grp", F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) - F.row_number().over(w)
    )
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start"),
        F.max("day").alias("end"),
    )
    ws = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start").asc()
    )
    return (
        streaks.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").cast("long").alias("longest_streak_days"),
            F.date_format("start", "yyyy-MM-dd").alias("streak_start"),
            F.date_format("end", "yyyy-MM-dd").alias("streak_end"),
        )
    )


def filtered_agg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL FILTER clause (per-aggregate predicates) exercised
    through the engine's OWN SQL surface: the operator registers the
    tables and runs a plain SQL string via catalog.run_sql — proving
    the registry and the SQL entry point are the same engine (same
    Catalyst plan as the F.when spelling, but the user-facing SQL
    text is the capability under test here).
    """
    from ..catalog import run_sql

    return run_sql(
        spark,
        sf_dir,
        """
        SELECT o_orderpriority,
          CAST(count(*) AS BIGINT) AS n_orders,
          CAST(count(*) FILTER (WHERE o_totalprice > 150000) AS BIGINT) AS n_large,
          -- BIGINT cents, never raw DECIMAL (r4 driver canon renders
          -- trailing-zero decimals float-style and flips the hash)
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
               FILTER (WHERE o_orderstatus = 'F') * 100 AS BIGINT) AS finished_revenue_cents
        FROM orders
        GROUP BY o_orderpriority
        """,
    )


def contingency_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency analysis of order priority x status: observed
    counts, independence-expected counts, and per-cell chi-square
    contributions — the association test behind "is priority
    distributed the same across statuses". One groupBy produces the
    cells; row/column/grand totals are window sums over those cells
    (dozens of rows), so the fact table is scanned exactly once.

    All inputs to the expected-count divide are exact BIGINTs, so
    the doubles agree across engines before the 6dp render.
    """
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("observed")
    )
    w_row = Window.partitionBy("o_orderpriority")
    w_col = Window.partitionBy("o_orderstatus")
    w_all = Window.partitionBy()
    with_tot = cells.select(
        "o_orderpriority",
        "o_orderstatus",
        "observed",
        F.sum("observed").over(w_row).alias("row_total"),
        F.sum("observed").over(w_col).alias("col_total"),
        F.sum("observed").over(w_all).alias("grand_total"),
    )
    expected = (
        F.col("row_total").cast("double")
        * F.col("col_total").cast("double")
        / F.col("grand_total").cast("double")
    )
    return with_tot.select(
        "o_orderpriority",
        "o_orderstatus",
        F.col("observed").cast("long").alias("observed"),
        F.round(expected, 6).alias("expected"),
        F.round(
            (F.col("observed").cast("double") - expected)
            * (F.col("observed").cast("double") - expected)
            / expected,
            6,
        ).alias("chi2_contribution"),
    )


def order_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar seasonality profile: order count and exact-decimal
    revenue per month-of-year (pooled across years), with each
    month's share of the total in integer PARTS-PER-MILLION — the
    dashboard staple for "is Q4 really bigger".

    Exactness: shares are floor(part * 1e6 / total) computed entirely
    in BIGINT via a two-level remainder split
    (``(p*1000 div t)*1000 + ((p*1000 mod t)*1000) div t``), so no
    float quotient or round() boundary can flip between engines —
    the r3 driver-hash failure mode. The split keeps every
    intermediate <= total*1000, exact for totals up to ~9e15 cents.
    Plan: one scan, one 12-group aggregate; the grand total is a
    1-row broadcast (not a whole-table window).
    """
    DEC = "decimal(18,2)"
    o = load_table(spark, sf_dir, "orders")
    per_month = o.groupBy(F.month("o_orderdate").alias("month_of_year")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(28,2)").alias("revenue"),
    )
    tot = per_month.agg(
        F.sum("n_orders").alias("tot_orders"),
        (F.sum("revenue").cast("decimal(38,2)") * 100).cast("long").alias("tot_cents"),
    )
    from ..functions.exact import ppm_expr as ppm

    return (
        per_month.join(F.broadcast(tot))
        .withColumn("cents", (F.col("revenue") * 100).cast("long"))
        .selectExpr(
            "CAST(month_of_year AS BIGINT) AS month_of_year",
            "CAST(n_orders AS BIGINT) AS n_orders",
            # BIGINT cents, never raw DECIMAL (r4 driver canon renders
            # trailing-zero decimals float-style and flips the hash)
            "CAST(cents AS BIGINT) AS revenue_cents",
            f"CAST({ppm('n_orders', 'tot_orders')} AS BIGINT) AS order_share_ppm",
            f"CAST({ppm('cents', 'tot_cents')} AS BIGINT) AS revenue_share_ppm",
        )
    )


def disc_quintile_thresholds(df: DataFrame, col: str, bucket_width, prefix: str) -> DataFrame:
    """1-row DataFrame of EXACT discrete quintile thresholds
    ``{prefix}20 .. {prefix}80`` for one numeric column: threshold k
    is percentile_disc(k/5) = the MIN data value v whose cumulative
    count satisfies ``5*cum(v) >= k*N`` — an actual element of the
    data, never an interpolated double (the r3 ``customer_rfm``
    driver-hash failure was a last-ulp flip in ``F.percentile``'s
    interpolated threshold). Thin wrapper over the metric-keyed
    multi pipeline (one implementation to keep exact)."""
    return disc_quintile_thresholds_multi(df, {prefix: (col, bucket_width)})


def disc_quintile_thresholds_multi(
    df: DataFrame, metrics: dict[str, tuple[str, int]]
) -> DataFrame:
    """Multi-metric generalization of ``disc_quintile_thresholds``:
    ``metrics`` maps output prefix -> (column, bucket_width). All
    metrics ride ONE metric-keyed pipeline (union -> distinct-value
    counts -> per-(metric, bucket) carry -> one second pass over the
    selected buckets), so k metrics cost one pass, not k — the
    shape that matters when each extra pass re-scans a corpus-sized
    aggregate. Values are compared in DECIMAL(28,2), exact for
    BIGINT/decimal metrics. Returns one row with columns
    ``{prefix}{20,40,60,80}`` per metric.
    """
    V = "decimal(28,2)"
    long = None
    width_expr = None
    for prefix, (col, width) in metrics.items():
        part = df.select(F.lit(prefix).alias("metric"), F.col(col).cast(V).alias("v"))
        long = part if long is None else long.unionByName(part)
        w = F.when(F.col("metric") == prefix, F.lit(width))
        width_expr = w if width_expr is None else width_expr.when(
            F.col("metric") == prefix, F.lit(width)
        )
    vals = long.groupBy("metric", "v").agg(F.count(F.lit(1)).alias("c"))
    bucket = F.floor(F.col("v") / width_expr)
    per_bucket = vals.groupBy("metric", bucket.alias("b")).agg(F.sum("c").alias("bc"))
    w_carry = (
        Window.partitionBy("metric").orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = per_bucket.withColumn(
        "carry_in", F.coalesce(F.sum("bc").over(w_carry), F.lit(0))
    ).withColumn("cum", F.col("carry_in") + F.col("bc"))
    total = carried.groupBy("metric").agg(F.sum("bc").alias("n"))
    qtab = total.select(
        "metric", "n", F.explode(F.array(*[F.lit(k) for k in (1, 2, 3, 4)])).alias("k")
    )
    cand = (
        carried.join(F.broadcast(qtab), "metric")
        .filter(F.col("cum") * 5 >= F.col("k") * F.col("n"))
        .groupBy("metric", "k", "n")
        .agg(F.min("b").alias("mb"))
    )
    binfo = (
        carried.select("metric", "b", "carry_in")
        .join(F.broadcast(cand), "metric")
        .filter(F.col("b") == F.col("mb"))
        .select("metric", "k", "n", "mb", "carry_in")
    )
    inb = vals.withColumn("b", bucket).join(F.broadcast(binfo), "metric").filter(
        F.col("b") == F.col("mb")
    )
    w_in = (
        Window.partitionBy("metric", "k")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    th = (
        inb.withColumn("cum2", F.col("carry_in") + F.sum("c").over(w_in))
        .filter(F.col("cum2") * 5 >= F.col("k") * F.col("n"))
        .groupBy("metric", "k")
        .agg(F.min("v").alias("t"))
    )
    piv = (
        th.select(F.concat("metric", (F.col("k") * 20).cast("string")).alias("name"), "t")
        .groupBy()
        .pivot("name", [f"{p}{q}" for p in metrics for q in (20, 40, 60, 80)])
        .agg(F.first("t"))
    )
    return piv


def customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-customer Recency (days since last
    order, vs the corpus max date), Frequency (order count), and
    Monetary (exact-decimal revenue), each scored 1-5 against the
    global quintile thresholds. The classic CRM mart.

    Scale note: the canonical ntile(5) would funnel every customer
    through ONE sort partition; here the five bands come from exact
    DISCRETE quintile thresholds (``disc_quintile_thresholds``, a
    1-row broadcast built with the two-level prefix-sum — no
    whole-table sort) and per-row ``>=`` comparisons on exact
    BIGINT/DECIMAL metrics, so scoring is map-side. No interpolated
    double thresholds: percentile_disc semantics make the banding
    engine-invariant (threshold k is a data value, and
    ``x >= t_k  <=>  5*cum(x) >= k*N`` — the identity the DuckDB
    oracle uses directly).
    """
    DEC = "decimal(18,2)"
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(28,2)").alias("monetary"),
    )
    maxd = per_cust.agg(F.max("last_order").alias("corpus_max"))
    # pinned once: six threshold subtrees + the final scoring pass all
    # read per_cust — without the checkpoint each one replans the
    # orders scan + aggregate (measured 42 exchanges vs 15)
    per_cust = (
        per_cust.join(F.broadcast(maxd))
        .withColumn(
            "recency_days",
            F.datediff(F.col("corpus_max"), F.col("last_order")).cast("long"),
        )
        .localCheckpoint(eager=False)
    )
    thresholds = disc_quintile_thresholds_multi(
        per_cust,
        {"r": ("recency_days", 100), "f": ("frequency", 8), "m": ("monetary", 100000)},
    )

    def band(metric, prefix, invert=False):
        # thresholds are DECIMAL(28,2); cast the metric to the same
        # type so every comparison is exact decimal-vs-decimal
        c = F.col(metric).cast("decimal(28,2)")
        score = (
            F.when(c >= F.col(f"{prefix}80"), 5)
            .when(c >= F.col(f"{prefix}60"), 4)
            .when(c >= F.col(f"{prefix}40"), 3)
            .when(c >= F.col(f"{prefix}20"), 2)
            .otherwise(1)
        )
        return (F.lit(6) - score) if invert else score

    return (
        per_cust.join(F.broadcast(thresholds))
        .select(
            F.col("o_custkey").alias("custkey"),
            "recency_days",
            F.col("frequency").cast("long").alias("frequency"),
            # BIGINT integer cents, never raw DECIMAL: the external
            # canon renders Decimal('2821749.70') float-style
            # ('2821749.7'), so any trailing-zero decimal row flips
            # the value hash (r4 driver-hash failure class).
            (F.col("monetary") * 100).cast("long").alias("monetary_cents"),
            band("recency_days", "r", invert=True).cast("long").alias("r_score"),
            band("frequency", "f").cast("long").alias("f_score"),
            band("monetary", "m").cast("long").alias("m_score"),
        )
    )


def event_dedup_windowed(
    spark: SparkSession, sf_dir: str, window_minutes: int = 30
) -> DataFrame:
    """Burst-throttle dedup — the BATCH twin of the streaming
    dedup-within-watermark capability (streaming/ops.py stream_dedup):
    within each (user, event_type) stream, an event starts a new
    burst when it arrives more than ``window_minutes`` after the
    previous event; only the burst's FIRST event is kept. This is the
    exact chain semantics of a throttled emitter (not a naive
    lag-filter, which re-admits every other event of a dense run).

    Plan: one shuffle on (user_id, event_type); the burst id is the
    classic gap-sessionization running sum over the same window
    order, and kept = first row per burst via the burst-start flag
    itself (no second window pass needed).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    new_burst = (
        prev_ts.isNull()
        | (
            F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
            > window_minutes * 60 * 1_000_000
        )
    ).cast("int")
    with_flag = e.select("event_id", "user_id", "event_type", "ts", new_burst.alias("nb"))
    burst_id = F.sum("nb").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return with_flag.select(
        "event_id",
        "user_id",
        "event_type",
        burst_id.cast("long").alias("burst_id"),
        (F.col("nb") == 1).alias("is_kept"),
    )


def label_association_rules(
    spark: SparkSession, sf_dir: str, min_pair_count: int = 20
) -> DataFrame:
    """Market-basket association rules over issue label sets: for
    every directed label pair (a -> b) co-occurring on at least
    ``min_pair_count`` issues, the classic support / confidence /
    lift triple — the triage-automation mart ("issues labeled
    Blocker are x4 likelier to also carry Regression").

    Shapes: explode labels once; the pair table is a self-join ON
    issue_id (co-occurrence, not a cross product) whose output is
    bounded by sum(|labels|^2) per issue (labels arrays are tiny);
    per-label supports broadcast onto the pair aggregate. Output is
    bounded by the label vocabulary squared.
    """
    from .silver import synth_issues

    s = synth_issues(spark, sf_dir).select("issue_id", "labels")
    n_issues = s.count()  # support denominator (scalar dimension)
    il = s.select("issue_id", F.explode(F.array_distinct("labels")).alias("label"))
    supp = il.groupBy("label").agg(F.count(F.lit(1)).alias("n_label"))
    a = il.select("issue_id", F.col("label").alias("label_a"))
    b = il.select("issue_id", F.col("label").alias("label_b"))
    pair = (
        a.join(b, "issue_id")
        .filter(F.col("label_a") != F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= min_pair_count)
    )
    sa = supp.select(F.col("label").alias("label_a"), F.col("n_label").alias("n_a"))
    sb = supp.select(F.col("label").alias("label_b"), F.col("n_label").alias("n_b"))
    # integer metrics (VERDICT r3 task 7): support/confidence in ppm,
    # lift in e6 units via lift = n_both*N / (n_a*n_b) — all BIGINT.
    # The n_both*N product is overflow-guarded (ADVICE r4): it raises
    # via assert_true instead of silently wrapping int64 beyond the
    # ppm helper's 9.2e15 exact bound.
    from ..functions.exact import checked_mul_expr as _cmul

    return (
        pair.join(F.broadcast(sa), "label_a")
        .join(F.broadcast(sb), "label_b")
        .select(
            "label_a",
            "label_b",
            F.col("n_both").cast("long").alias("n_both"),
            F.expr(_ppmx("n_both", str(int(n_issues)))).cast("long").alias("support_ppm"),
            F.expr(_ppmx("n_both", "n_a")).cast("long").alias("confidence_ppm"),
            F.expr(_ppmx(f"({_cmul('n_both', str(int(n_issues)))})", "(n_a * n_b)"))
            .cast("long")
            .alias("lift_e6"),
        )
    )


def daily_anomaly_events(
    spark: SparkSession, sf_dir: str, trailing_days: int = 7, z_thresh: float = 2.0
) -> DataFrame:
    """Volume-anomaly monitor: per (event_type, day), the robust-ish
    z-score of the day's event count against the trailing
    ``trailing_days`` days (excluding the current day), flagged when
    |z| exceeds ``z_thresh`` — the standing ingest-health alarm a
    pipeline runs before trusting a day's partition.

    One aggregate to daily grain (the only corpus-scale work), then a
    window per event_type over days — the window input is one row per
    (type, day), thousands of rows per year, never the raw events.
    """
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.col("event_type"), F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    return daily_anomaly_from_counts(daily, trailing_days, z_thresh)


def daily_anomaly_from_counts(
    daily: DataFrame, trailing_days: int = 7, z_thresh: float = 2.0
) -> DataFrame:
    """The anomaly readout over an ALREADY-AGGREGATED daily grain
    (event_type, day, n_events) — composable with the incrementally
    maintained streaming mart (stream_mart_maintenance keeps exactly
    this grain), so the alarm runs on the committed mart without ever
    rescanning events."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-trailing_days, -1)
    )
    mu = F.avg("n_events").over(w)
    sd = F.stddev_samp("n_events").over(w)
    nt = F.count("n_events").over(w)
    z = (F.col("n_events") - mu) / sd
    return daily.select(
        "event_type",
        "day",
        F.col("n_events").cast("long").alias("n_events"),
        F.when(nt >= 2, r6(mu)).alias("trailing_avg"),
        F.when((nt >= 2) & (sd > 0), r6(z)).alias("z_score"),
        F.when((nt >= 2) & (sd > 0), F.abs(z) > z_thresh)
        .otherwise(F.lit(False))
        .alias("is_anomaly"),
    )


def yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue: each month's order revenue
    against the same month one year earlier (12-row LAG over the
    month grain) with the percent change — the first chart on every
    BI dashboard. The only corpus-scale work is the monthly
    aggregate; the window input is one row per month.

    Exact DECIMAL month sums; the yoy ratio divides doubles of those
    exact sums (same idiom as revenue_concentration).
    """
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue"))
    w = Window.orderBy("month")
    prev = F.lag("revenue", 12).over(w)
    return monthly.select(
        "month",
        # BIGINT cents, never raw DECIMAL (r4 driver canon renders
        # trailing-zero decimals float-style and flips the hash)
        (F.col("revenue").cast("decimal(28,2)") * 100).cast("long").alias("revenue_cents"),
        (prev.cast("decimal(28,2)") * 100).cast("long").alias("revenue_prev_year_cents"),
        F.when(
            prev.isNotNull() & (prev != 0),
            F.round((F.col("revenue").cast("double") - prev.cast("double")) / prev.cast("double"), 6),
        ).alias("yoy_pct"),
    )


def event_order_inversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-orderness diagnostic: treating event_id as arrival
    order, how often and how badly does event time run backwards per
    user — the measurement that picks a streaming watermark (the
    p-max disorder bounds the lateness horizon a pipeline must
    tolerate). One shuffle on user_id; lag over arrival order.

    Output per user: events, inversion count/rate, and the worst
    backward jump in seconds.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    prev_ts = F.lag("ts").over(w)
    back_us = F.unix_micros(prev_ts) - F.unix_micros(F.col("ts"))
    flagged = e.select(
        "user_id",
        F.when(back_us > 0, 1).otherwise(0).alias("inv"),
        F.when(back_us > 0, back_us).alias("back_us"),
    )
    return flagged.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum("inv").cast("long").alias("n_inversions"),
        r6(F.sum("inv") / F.count(F.lit(1))).alias("inversion_rate"),
        r6(F.max("back_us") / 1e6).alias("max_disorder_s"),
    )


def weighted_median_price(
    spark: SparkSession, sf_dir: str, bucket_width: int = 1000
) -> DataFrame:
    """Exact QUANTITY-weighted median of extended price per return
    flag — the distributed weighted-quantile algorithm, with no
    whole-group sort anywhere:

    1. weights collapse to per-(group, price) sums (the only
       corpus-scale shuffle; prices de-duplicate, killing ties);
    2. price-bucket partial sums + a cumulative carry over ONE ROW
       PER BUCKET locate the bucket containing the half-weight point;
    3. a second pass sorts ONLY that bucket's (few) distinct prices.

    The median is min price with cumweight >= total/2. Every
    comparison is ``2*cum >= total`` in DECIMAL — division-free and
    exact, so no float boundary can flip between engines. This is
    the same two-level prefix-sum discipline as plan_token_shards,
    applied to order statistics — the pattern that generalizes to
    any exact weighted quantile at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    DEC = "decimal(18,2)"
    pp = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast(DEC)).alias("w"))
    bucket = F.floor(F.col("price") / bucket_width)
    per_bucket = pp.groupBy("grp", bucket.alias("b")).agg(F.sum("w").alias("bw"))
    w_carry = (
        Window.partitionBy("grp").orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = per_bucket.withColumn(
        "carry_in", F.coalesce(F.sum("bw").over(w_carry), F.lit(0).cast(DEC))
    ).withColumn("cum", F.col("carry_in") + F.col("bw"))
    totals = carried.groupBy("grp").agg(F.sum("bw").alias("total"))
    sel = carried.join(F.broadcast(totals), "grp")
    med_bucket = (
        sel.filter(F.col("cum") * 2 >= F.col("total"))
        .groupBy("grp")
        .agg(F.min("b").alias("mb"))
    )
    binfo = (
        sel.join(F.broadcast(med_bucket), "grp")
        .filter(F.col("b") == F.col("mb"))
        .select("grp", "mb", "carry_in", "total")
    )
    inb = pp.withColumn("b", bucket).join(F.broadcast(binfo), "grp").filter(
        F.col("b") == F.col("mb")
    )
    w_in = (
        Window.partitionBy("grp")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum2 = F.col("carry_in") + F.sum("w").over(w_in)
    return (
        inb.withColumn("cum2", cum2)
        .filter(F.col("cum2") * 2 >= F.col("total"))
        .groupBy("grp")
        .agg(
            F.min("price").alias("weighted_median"),
            F.first("total").alias("total_weight"),
        )
        # BIGINT integer units, never raw DECIMAL: the external canon
        # renders Decimal('49341.00') float-style ('49341.0'), so any
        # trailing-zero decimal row flips the hash (r4 failure class).
        # price double -> DECIMAL(18,2) -> x100 is exact cents on both
        # engines; total is already DECIMAL(18,2) quantity units.
        .select(
            "grp",
            (F.col("weighted_median").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("weighted_median_cents"),
            (F.col("total_weight").cast("decimal(28,2)") * 100)
            .cast("long")
            .alias("total_weight_e2"),
        )
    )


def weighted_quantiles_price(
    spark: SparkSession,
    sf_dir: str,
    q_pcts: tuple = (25, 50, 75, 90),
    bucket_width: int = 1000,
) -> DataFrame:
    """Exact weighted quantile SUITE per group — the generalization of
    ``weighted_median_price`` to any list of quantiles, still with no
    whole-group sort: one bucket-carry pass locates EVERY quantile's
    bucket simultaneously (each quantile q as an integer percent, so
    the half-point test ``cum*100 >= q*total`` stays division-free
    DECIMAL arithmetic), then one second pass touches only the union
    of selected buckets. Output one row per (group, quantile).
    """
    li = load_table(spark, sf_dir, "lineitem")
    DEC = "decimal(18,2)"
    pp = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast(DEC)).alias("w"))
    bucket = F.floor(F.col("price") / bucket_width)
    per_bucket = pp.groupBy("grp", bucket.alias("b")).agg(F.sum("w").alias("bw"))
    w_carry = (
        Window.partitionBy("grp").orderBy("b").rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = per_bucket.withColumn(
        "carry_in", F.coalesce(F.sum("bw").over(w_carry), F.lit(0).cast(DEC))
    ).withColumn("cum", F.col("carry_in") + F.col("bw"))
    totals = carried.groupBy("grp").agg(F.sum("bw").alias("total"))
    qtab = totals.select(
        "grp",
        "total",
        F.explode(F.array(*[F.lit(int(q)) for q in q_pcts])).alias("q_pct"),
    )
    cand = (
        carried.join(F.broadcast(qtab), "grp")
        .filter(F.col("cum") * 100 >= F.col("q_pct") * F.col("total"))
        .groupBy("grp", "q_pct", "total")
        .agg(F.min("b").alias("mb"))
    )
    binfo = (
        carried.select("grp", "b", "carry_in")
        .join(F.broadcast(cand), "grp")
        .filter(F.col("b") == F.col("mb"))
        .select("grp", "q_pct", "total", "mb", "carry_in")
    )
    inb = pp.withColumn("b", bucket).join(
        F.broadcast(binfo), on=["grp"]
    ).filter(F.col("b") == F.col("mb"))
    w_in = (
        Window.partitionBy("grp", "q_pct")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        inb.withColumn("cum2", F.col("carry_in") + F.sum("w").over(w_in))
        .filter(F.col("cum2") * 100 >= F.col("q_pct") * F.col("total"))
        .groupBy("grp", "q_pct")
        .agg(F.min("price").alias("qv"), F.first("total").alias("total"))
        # BIGINT integer units, never raw DECIMAL — same rationale as
        # weighted_median_price (r4 driver-canon trailing-zero class)
        .select(
            "grp",
            F.col("q_pct").cast("int").alias("q_pct"),
            (F.col("qv").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("quantile_value_cents"),
            (F.col("total").cast("decimal(28,2)") * 100)
            .cast("long")
            .alias("total_weight_e2"),
        )
    )
