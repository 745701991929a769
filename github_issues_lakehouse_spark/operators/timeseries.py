"""Time-series decomposition and changepoint analytics over the
daily event grid — the monitoring layer a lakehouse runs on its own
ingest volumes.

Both operators work on the (days x types) gap-filled grid, which is
calendar-bounded (tiny relative to the fact table): the only
corpus-scale stage is the initial daily aggregate; every window after
that partitions by event_type over day-grain rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import ppm_expr as _ppm
from ..sources.registry import load_table
from .relational import r6


def _daily_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled daily counts per event_type (same grid discipline
    as daily_gapfill_events, counts only)."""
    e = load_table(spark, sf_dir, "events")
    days = (
        e.agg(F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1"))
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    types = e.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    daily = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    return grid.join(daily, ["day", "event_type"], "left").select(
        "day", "event_type", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )


def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily event volume per
    type: trend = centered 7-day moving average (full windows only),
    seasonal = per-weekday mean of the detrended series, residual =
    observed - trend - seasonal. The classic STL-lite a monitoring
    pipeline runs to separate weekly rhythm from drift before
    alarming on residuals.

    Day-grain only after the first aggregate; weekday keying uses an
    explicit Monday=0 formula (floor-mod on the epoch day) so both
    engines agree regardless of their DOW conventions.
    """
    g = _daily_grid(spark, sf_dir)
    # Monday=0 ... Sunday=6, portable: 1970-01-01 was a Thursday (3)
    wd = F.pmod(F.datediff(F.col("day"), F.lit("1970-01-05")), F.lit(7))
    w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    d = (
        g.withColumn("weekday", wd.cast("int"))
        .withColumn("w_n", F.count(F.lit(1)).over(w7))
        .withColumn(
            "trend",
            F.when(F.col("w_n") == 7, r6(F.avg(F.col("n")).over(w7))),
        )
        .drop("w_n")
    )
    seasonal = (
        d.filter(F.col("trend").isNotNull())
        .groupBy("event_type", "weekday")
        .agg(r6(F.avg(F.col("n") - F.col("trend"))).alias("seasonal"))
    )
    return (
        d.join(F.broadcast(seasonal), ["event_type", "weekday"], "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "event_type",
            "n",
            "weekday",
            "trend",
            "seasonal",
            r6(F.col("n") - F.col("trend") - F.col("seasonal")).alias("residual"),
        )
    )


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint location per event_type: S_t = cumulative
    sum of (x_i - global mean); the day maximizing |S_t| is the
    classic single-changepoint estimate (the level shift splits the
    series where the cumulative deviation peaks).

    One day-grain running-sum window per type plus a per-type max
    carried by a second tiny window — no recursion, no whole-series
    state beyond the calendar-bounded grid. Output one row per day
    with the cusum path and an is_changepoint flag on the argmax day
    (earliest day on ties).
    """
    g = _daily_grid(spark, sf_dir)
    stats = g.groupBy("event_type").agg(F.avg("n").alias("mu"))
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    d = (
        g.join(F.broadcast(stats), "event_type")
        # + 0.0 normalizes IEEE -0.0 (the full-series sum cancels to
        # zero with either sign depending on fold order)
        .withColumn("cusum", r6(F.sum(F.col("n") - F.col("mu")).over(w_run)) + 0.0)
    )
    w_all = Window.partitionBy("event_type")
    d = d.withColumn("peak", F.max(F.abs(F.col("cusum"))).over(w_all))
    w_first = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # flag only the EARLIEST day attaining the peak
    at_peak = (F.abs(F.col("cusum")) == F.col("peak")).cast("int")
    d = d.withColumn("n_peaks_so_far", F.sum(at_peak).over(w_first))
    return d.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "event_type",
        "n",
        "cusum",
        (
            (F.abs(F.col("cusum")) == F.col("peak")) & (F.col("n_peaks_so_far") == 1)
        ).alias("is_changepoint"),
    )


def dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / stickiness per day — the product-analytics staple:
    daily active users, trailing-7-day active users (EXACT distinct,
    not a sum of dailies), and their ratio.

    A naive per-day distinct over a sliding window rescans history;
    instead each (user, active-day) row is exploded to the <= 7
    window END days it contributes to (a bounded 7x expansion), and
    one distinct-count per end day finishes the job — two aggregates
    over a 7x-bounded intermediate, no window over raw events, the
    standard scale-out for sliding distinct counts.
    """
    e = load_table(spark, sf_dir, "events")
    au = e.select(F.to_date("ts").alias("day"), "user_id").distinct()
    bounds = e.agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    dau = au.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    cover = (
        au.crossJoin(F.broadcast(bounds))
        .select(
            F.explode(
                F.sequence(
                    F.col("day"), F.least(F.date_add(F.col("day"), 6), F.col("d1"))
                )
            ).alias("day"),
            "user_id",
        )
        .distinct()
    )
    wau = cover.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    grid = bounds.select(F.explode(F.sequence("d0", "d1")).alias("day"))
    return (
        grid.join(dau, "day", "left")
        .join(wau, "day", "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce("dau", F.lit(0)).cast("long").alias("dau"),
            F.coalesce("wau", F.lit(0)).cast("long").alias("wau"),
            # integer ppm: a round(double/double, 6) here is the
            # engine-version hash-flip class VERDICT r3 task 7 sweeps
            F.when(
                F.coalesce("wau", F.lit(0)) > 0,
                F.expr(_ppm("coalesce(dau, 0)", "wau")),
            )
            .cast("long")
            .alias("stickiness_ppm"),
        )
    )


def event_trigram_patterns(
    spark: SparkSession, sf_dir: str, min_count: int = 5
) -> DataFrame:
    """Frequent 3-event sequences per user stream (PrefixSpan-lite,
    contiguous form): the (prev2, prev1, current) pattern counts and
    their share of all eligible positions — the sequence-mining
    extension of the Markov event_transitions mart.

    Two LAG columns in ONE window pass (same (user, time) sort the
    sessionizers use), then a bounded aggregate: the output space is
    |event types|^3 regardless of corpus size.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.lag("event_type", 2).over(w).alias("e1"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.col("event_type").alias("e3"),
    ).filter(F.col("e1").isNotNull())
    total = seq.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_count)
        .crossJoin(F.broadcast(total))
        .select(
            "e1",
            "e2",
            "e3",
            F.col("n").cast("long").alias("n"),
            F.expr(_ppm("n", "n_total")).cast("long").alias("support_ppm"),
        )
    )


def user_churn_flags(
    spark: SparkSession, sf_dir: str, churn_days: int = 7
) -> DataFrame:
    """Per-user churn snapshot at the corpus horizon: last activity,
    exact integer days idle, and the churned flag (idle >
    ``churn_days``) plus each user's lifetime event count and value —
    the retention mart fed to win-back campaigns.

    One per-user aggregate; the corpus horizon (max ts) is a 1-row
    broadcast. Integer-seconds idle arithmetic (no fractional-day
    rounding divergence — same lesson as attribution_touchpoints).
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double"), 2
        ).alias("total_value"),
    )
    horizon = e.agg(F.max("ts").alias("h_ts"))
    idle_secs = F.unix_timestamp("h_ts") - F.unix_timestamp("last_ts")
    return (
        per_user.crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            "last_ts",
            F.col("n_events").cast("long").alias("n_events"),
            "total_value",
            idle_secs.cast("long").alias("idle_secs"),
            (idle_secs > churn_days * 86400).alias("is_churned"),
        )
    )


def user_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B96 (r5): daily growth accounting — the canonical product
    decomposition of the active-user curve: per day, how many active
    users are NEW (first day ever), RETAINED (active the previous
    day), or RESURRECTED (active before, but not yesterday), plus
    how many CHURNED into the day (active yesterday, absent today).
    By construction n_active = n_new + n_retained + n_resurrected,
    and consecutive days obey n_active(d) = n_active(d-1)
    - n_churned(d) + n_new(d) + n_resurrected(d) — the identities
    the tests pin.

    One distinct per (user, day), ONE user-partitioned lag/lead
    window (pinned — both the status and the churn branch read it,
    and unpinned each consumer replans the distinct+window subtree:
    the customer_rfm lesson), then the status rows and the
    day-shifted churn contributions UNION into a single day-grain
    conditional aggregate — no day-to-day join at all. The corpus is
    touched once; everything after the distinct is user- or
    day-grain. Churn on the corpus' final active day is undefined
    (no next day observed) and not emitted.
    """
    e = load_table(spark, sf_dir, "events")
    act = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    horizon = act.agg(F.max("d").alias("last_d"))
    w = Window.partitionBy("user_id").orderBy("d")
    flagged = act.select(
        "user_id",
        "d",
        F.lag("d").over(w).alias("prev_d"),
        F.lead("d").over(w).alias("next_d"),
    ).localCheckpoint(eager=False)
    status = F.when(F.col("prev_d").isNull(), "new").when(
        F.datediff("d", "prev_d") == 1, "retained"
    ).otherwise("resurrected")
    actives = flagged.select(
        F.col("d"),
        F.lit(1).alias("active"),
        (status == "new").cast("long").alias("is_new"),
        (status == "retained").cast("long").alias("is_ret"),
        (status == "resurrected").cast("long").alias("is_res"),
        F.lit(0).alias("is_churn"),
    )
    churns = (
        flagged.crossJoin(F.broadcast(horizon))
        .filter(
            (F.col("d") < F.col("last_d"))
            & (F.col("next_d").isNull() | (F.datediff("next_d", "d") > 1))
        )
        .select(
            F.date_add("d", 1).alias("d"),
            F.lit(0).alias("active"),
            F.lit(0).cast("long").alias("is_new"),
            F.lit(0).cast("long").alias("is_ret"),
            F.lit(0).cast("long").alias("is_res"),
            F.lit(1).alias("is_churn"),
        )
    )
    return (
        actives.unionByName(churns)
        .groupBy(F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.sum("active").cast("long").alias("n_active"),
            F.sum("is_new").cast("long").alias("n_new"),
            F.sum("is_ret").cast("long").alias("n_retained"),
            F.sum("is_res").cast("long").alias("n_resurrected"),
            F.sum("is_churn").cast("long").alias("n_churned"),
        )
    )


HOLT_S, HOLT_OFF, _HOLT_K = 1 << 24, 1 << 23, 1 << 24


def holt_packed_fold(pfx, a10: int, b10: int):
    """The packed Holt fold over a prefix-list column (seed = first
    element as level, trend 0): returns the packed BIGINT state
    level * 2^24 + (trend + 2^23) after consuming the whole list.
    Factored out of ``holt_linear_daily`` so tests can drive the
    exact production fold over adversarial synthetic series (the
    ADVICE r5 decaying-to-zero case) without a parquet detour."""
    S, OFF, K = HOLT_S, HOLT_OFF, _HOLT_K

    def d10(num):
        return (F.floor((num + K * 10) / 10) - K).cast("long")

    init = F.element_at(pfx, 1) * S + OFF

    def step(acc, x):
        r = ((acc % S) + S) % S
        lvl = F.floor((acc - r) / S).cast("long")
        trd = r - OFF
        nl = F.greatest(
            d10(a10 * x + (10 - a10) * (lvl + trd) + 5), F.lit(0).cast("long")
        )
        nt = d10(b10 * (nl - lvl) + (10 - b10) * trd + 5)
        return (nl * S + (nt + OFF)).cast("long")

    return F.aggregate(F.slice(pfx, 2, 100000), init.cast("long"), step)


def holt_unpack(state):
    """Sign-safe (level, trend) unpack of the packed Holt state:
    r = pmod(state, S) spelled ((state % S) + S) % S, then the level
    divide runs on the exact multiple (state - r)."""
    S, OFF = HOLT_S, HOLT_OFF
    r = ((state % S) + S) % S
    lvl = F.floor((state - r) / S).cast("long")
    trd = (r - OFF).cast("long")
    return lvl, trd


def holt_python_reference(xs: list[int], a10: int, b10: int) -> list[tuple[int, int]]:
    """Plain-Python reference recursion (no packing): the semantics
    both engine folds must reproduce. Levels clamp at 0 — daily
    counts are >= 0, so a negative smoothed level is never
    meaningful (ADVICE r5)."""
    l, t = xs[0], 0
    states = [(l, t)]
    for x in xs[1:]:
        nl = max(0, (a10 * x + (10 - a10) * (l + t) + 5) // 10)
        nt = (b10 * (nl - l) + (10 - b10) * t + 5) // 10
        l, t = nl, nt
        states.append((l, t))
    return states


def holt_linear_daily(
    spark: SparkSession, sf_dir: str, alpha10: int = 3, beta10: int = 2
) -> DataFrame:
    """B98 (r5): Holt's linear-trend double exponential smoothing of
    daily event volume per type — the forecasting primitive one step
    up from the EWMA (level only) family: a LEVEL and a TREND state,
    so the one-step forecast follows sustained growth instead of
    lagging it.

    Recursion (adjust=False, seeded level = first day's count, trend
    = 0), entirely in FIXED-POINT e2 integers with the tenths-
    quantized gains a10/b10 — the ewma_user_value discipline: float
    folds drift by 1 ulp between engines; integer folds are exactly
    portable, and every +5 div 10 rounding sits >= 0.1 from a floor
    boundary so the float-division spelling cannot flip:

        nl = (a10 * x_e2 + (10 - a10) * (l + t) + 5) div 10
        nt = (b10 * (nl - l) + (10 - b10) * t + 5) div 10

    Output per (event_type, day): observed count, smoothed level and
    trend (e2), and the one-step-ahead forecast made FROM that day.

    Plan/scale: one corpus-scale daily aggregate; the recursion runs
    on the calendar-bounded gap-filled grid (days x types) via a
    prefix collect + integer fold per row — O(days^2) per type on
    day-grain rows, microscopic next to the fact scan, and the same
    fold is the DuckDB twin's list_reduce so parity is bit-exact.
    """
    grid = _daily_grid(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    x_e2 = (F.col("n") * 100).cast("long")
    with_prefix = grid.select(
        "event_type", "day", "n", F.collect_list(x_e2).over(w).alias("pfx")
    )
    a10, b10 = alpha10, beta10
    # State PACKED into one BIGINT: acc = level * 2^24 + (trend + 2^23).
    # A two-field struct accumulator is the natural spelling, but
    # DuckDB 1.0's list_reduce evaluates struct-literal fields
    # SEQUENTIALLY and a later field referencing acc sees the
    # already-updated first field (verified: {'v': a.v*10+b.v,
    # 'z': a.v} folds z to the NEW v) — the packed single value
    # sidesteps the engine bug entirely. Bounds by construction:
    # level < 2^38 e2-counts, |trend| < 2^23 e2 per step — far above
    # any daily-grid magnitude; the rounding divide is SHIFTED
    # (+2^24*10 before, -2^24 after) so both engines divide a
    # non-negative number and floor == truncate (DuckDB's ``//``
    # truncates toward zero on negatives, Spark's floor() floors).
    #
    # Unpack is SIGN-SAFE (ADVICE r5): r = pmod(acc, S) spelled
    # ((acc % S) + S) % S identically on both engines (each engine's
    # bare % carries the dividend sign, so a negative acc would
    # unpack the trend ~S too low), then lvl = (acc - r)/S — an exact
    # multiple of S with <= 39 significant bits, so the double
    # division is exact far past the 2^53 bound bare acc/S would hit.
    # The level is additionally CLAMPED at 0: daily counts are >= 0,
    # so a negative smoothed level is never meaningful (it arises
    # when a type stops firing and l+t overshoots below zero on the
    # gap-filled trailing zeros), and the clamp keeps acc >= 0 by
    # construction.
    state = holt_packed_fold(F.col("pfx"), a10, b10)
    lvl, trd = holt_unpack(state)
    return with_prefix.select(
        "event_type",
        "day",
        F.col("n").cast("long").alias("n_events"),
        lvl.alias("level_e2"),
        trd.alias("trend_e2"),
        (lvl + trd).cast("long").alias("forecast_next_e2"),
    ).orderBy("event_type", "day")


def mad_anomaly_events(
    spark: SparkSession,
    sf_dir: str,
    trailing_days: int = 14,
    min_trailing: int = 7,
    thresh_e3: int = 3000,
) -> DataFrame:
    """B130 (r6): robust daily volume anomalies via median/MAD — the
    heavy-tail-safe twin of ``daily_anomaly_events`` (B73): a single
    spike day inflates a trailing MEAN and STDDEV enough to mask the
    next spike (masking), while the median/MAD pair ignores it. The
    alarm a pipeline runs on bursty event streams where z-scores
    self-blind.

    Exact integer rule: over the trailing ``trailing_days`` observed
    days (excluding today, >= ``min_trailing`` present), med2 = the
    doubled exact median (sum of the two middle order statistics —
    integer for any parity) and mad4 = the doubled median of the
    doubled absolute deviations |2x - med2| (4x raw units). The flag
    is the pure-BIGINT cross-multiplication
        2000 * |2*n - med2| > thresh_e3 * mad4
    (i.e. |n - med| > thresh * MAD with thresh = thresh_e3/1e3) — no
    division, no float, no tie ambiguity; a zero MAD flags any
    nonzero deviation (the degenerate-window convention). robust_z
    is the 6dp readout assembled once from the exact integers.

    Plan/scale: one corpus-scale daily aggregate; the trailing sort
    runs per row over <= ``trailing_days`` BIGINTs inside a
    day-grain window (same bounded-window discipline as B73 — the
    array never exceeds 14 elements regardless of corpus size).
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    return mad_anomaly_from_counts(daily, trailing_days, min_trailing, thresh_e3)


def mad_anomaly_from_counts(
    daily: DataFrame,
    trailing_days: int = 14,
    min_trailing: int = 7,
    thresh_e3: int = 3000,
) -> DataFrame:
    """The MAD-anomaly readout over an ALREADY-AGGREGATED daily grain
    (event_type, day, n_events) — composable with the incrementally
    maintained streaming mart (stream_mart_maintenance keeps exactly
    this grain), the daily_anomaly_from_counts convention: the robust
    alarm runs on the committed mart without rescanning events."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-trailing_days, -1)
    )
    win = daily.select(
        "event_type",
        "day",
        "n_events",
        F.collect_list("n_events").over(w).alias("wl"),
    )
    return (
        win.withColumn("m", F.array_size("wl").cast("long"))
        .filter(F.col("m") >= min_trailing)
        .withColumn("ws", F.array_sort("wl"))
        .withColumn(
            "med2",
            F.expr(
                "element_at(ws, CAST((m + 1) DIV 2 AS INT))"
                " + element_at(ws, CAST(m DIV 2 + 1 AS INT))"
            ).cast("long"),
        )
        .withColumn(
            "ds", F.expr("array_sort(transform(wl, v -> abs(2 * v - med2)))")
        )
        .withColumn(
            "mad4",
            F.expr(
                "element_at(ds, CAST((m + 1) DIV 2 AS INT))"
                " + element_at(ds, CAST(m DIV 2 + 1 AS INT))"
            ).cast("long"),
        )
        .select(
            "event_type",
            "day",
            "n_events",
            F.col("m").alias("n_trailing"),
            "med2",
            "mad4",
            F.when(
                F.col("mad4") > 0,
                r6(
                    F.lit(2.0)
                    * (2 * F.col("n_events") - F.col("med2")).cast("double")
                    / F.col("mad4").cast("double")
                ),
            ).alias("robust_z"),
            (
                2000 * F.abs(2 * F.col("n_events") - F.col("med2"))
                > F.lit(thresh_e3) * F.col("mad4")
            ).alias("is_anomaly"),
        )
        .orderBy("event_type", "day")
    )


def mad_anomaly_from_counts_daily(
    spark: SparkSession,
    sf_dir: str,
    trailing_days: int = 14,
    min_trailing: int = 7,
    thresh_e3: int = 3000,
) -> DataFrame:
    """B132b (r7, VERDICT r6 task 3): ``mad_anomaly_from_counts`` as
    a first-class registered query — B130's exact median/MAD algebra
    over the GAP-FILLED daily grid (B31's sequence x types zero-fill
    convention) instead of observed days only. This is exactly the
    shape of the maintained-mart alarm (D12 keeps the complete daily
    grain; D33 proves drain==batch over it): zero days ENTER the
    trailing window, so a type that goes silent pulls its median down
    and the first burst after a quiet stretch alarms — semantics the
    observed-days-only B130 cannot express (its window silently skips
    the gap).

    Plan/scale: the grid is days x types — calendar-bounded at ANY
    corpus scale; one corpus-scale daily aggregate feeds the
    broadcast-joined grid; the readout is the shared bounded-window
    helper (<= ``trailing_days`` BIGINTs per row).
    """
    e = load_table(spark, sf_dir, "events")
    days = (
        e.agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )
        .select(F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    types = e.select("event_type").distinct()
    grid = days.crossJoin(F.broadcast(types))
    daily = e.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    filled = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type",
        "day",
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
    )
    return mad_anomaly_from_counts(filled, trailing_days, min_trailing, thresh_e3)


def autocorr_daily(spark: SparkSession, sf_dir: str, max_lag: int = 7) -> DataFrame:
    """B102 (r5): lag-1..``max_lag`` autocorrelation of daily event
    volume per type over the gap-filled grid — the seasonality
    detector that tells a monitoring pipeline WHICH period its volume
    repeats on (a weekly-cadence series spikes at lag 7) before
    fitting anything heavier; the diagnostics companion of
    seasonal_decompose_daily's fixed weekly assumption.

    Pearson correlation of (x_t, x_{t-k}) pairs, but every moment
    (n, sum x, sum y, sum xy, sum x^2, sum y^2) is an exact BIGINT
    aggregate of the integer daily counts; the correlation is
    assembled from those exact integers in ONE final double
    expression with an identical tree on both engines (the
    corr_matrix_lineitem discipline), rounded to 6dp. Zero-variance
    sides yield NULL (sd==0 guard, ADVICE r4).

    Plan/scale: the corpus-scale stage is the daily aggregate the
    grid shares with every operator in this module; lags are
    max_lag LAG windows over day-grain rows per type, exploded to
    (lag, x, y) pairs, one group-aggregate. Counts are day-grain
    BIGINTs, so moments stay exact far past any real daily volume
    (sum x^2 overflows only past ~3e7 days at 1e9 events/day).
    """
    grid = _daily_grid(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = grid.select(
        "event_type",
        F.col("n").alias("x"),
        *[F.lag("n", k).over(w).alias(f"y{k}") for k in range(1, max_lag + 1)],
    )
    pairs = lagged.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).cast("int").alias("lag"),
                        F.col("x").alias("x"),
                        F.col(f"y{k}").alias("y"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("p"),
    ).select("event_type", "p.lag", "p.x", "p.y").filter(F.col("y").isNotNull())
    mom = pairs.groupBy("event_type", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (d1 > 0) & (d2 > 0),
        r6(num.cast("double") / F.sqrt(d1.cast("double") * d2.cast("double"))),
    )
    return mom.select(
        "event_type",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        corr.alias("autocorr"),
    ).orderBy("event_type", "lag")


def fano_daily_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B107 (r5): Fano factor (index of dispersion, variance/mean) of
    daily event volume per type on the gap-filled grid — the
    burstiness classifier monitoring uses before picking an alarm
    model: ~1 = Poisson-like arrivals (count thresholds work), >>1 =
    bursty/overdispersed (use the anomaly z-score path), <1 =
    regular/underdispersed.

    Moments are exact BIGINT sums of the integer daily counts; the
    factor is ONE identical-tree double, population variance over
    mean: (n*sxx - sx*sx) / (n*sx), rounded 6dp; NULL when the type
    never fires (sx == 0).

    Plan/scale: the shared daily aggregate, then type-grain math.
    """
    grid = _daily_grid(spark, sf_dir)
    mom = grid.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n").alias("sx"),
        F.sum(F.col("n") * F.col("n")).alias("sxx"),
    )
    fano = F.when(
        F.col("sx") > 0,
        r6(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
            / (F.col("n") * F.col("sx")).cast("double")
        ),
    )
    mean = r6(F.col("sx").cast("double") / F.col("n").cast("double"))
    return mom.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("sx").cast("long").alias("n_events"),
        mean.alias("mean_daily"),
        fano.alias("fano_factor"),
    ).orderBy("event_type")


def forecast_backtest_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B110 (r5): walk-forward backtest of the Holt one-step-ahead
    forecast (B98) against the next day's actual volume — the
    evaluation mart that turns "we have a forecaster" into "we know
    its error": per event type, forecast count, MAE in e2 count
    units, and WAPE (weighted absolute percentage error,
    sum|err|/sum actual) in exact ppm. WAPE over MAPE because
    gap-filled days can be zero (MAPE divides by zero; WAPE is the
    production norm for intermittent series).

    Pure composition over the B98 output: one LEAD window at
    day-grain pairs each day's forecast with the next actual; exact
    BIGINT error sums; integer DIV/ppm readout. Every arithmetic
    step is the fixed-point discipline — no floats anywhere.
    """
    h = holt_linear_daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("day")
    paired = h.select(
        "event_type",
        "forecast_next_e2",
        (F.lead("n_events").over(w) * 100).cast("long").alias("next_e2"),
    ).filter(F.col("next_e2").isNotNull())
    err = F.abs(F.col("forecast_next_e2") - F.col("next_e2"))
    agg = paired.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        F.sum(err).alias("abs_err_e2"),
        F.sum("next_e2").alias("actual_e2"),
    )
    return agg.selectExpr(
        "event_type",
        "CAST(n_forecasts AS BIGINT) AS n_forecasts",
        "CAST(abs_err_e2 DIV n_forecasts AS BIGINT) AS mae_e2",
        f"CAST({_ppm('abs_err_e2', 'actual_e2')} AS BIGINT) AS wape_ppm",
    ).orderBy("event_type")


def user_survival_curve(spark: SparkSession, sf_dir: str, max_weeks: int = 12) -> DataFrame:
    """B114 (r5): user survival curve — for each tenure week k, the
    share of users still active at least k weeks after their first
    event (observed lifetime = last activity - first activity). The
    retention summary one level up from cohort_retention's per-cohort
    matrix: one curve for the whole population, the number a
    subscription/engagement model quotes ("survival at week 4").

    Censoring note (documented contract): lifetimes are OBSERVED
    spans; users whose first event is near the corpus end have
    truncated lifetimes, so the tail underestimates true survival —
    the Kaplan-Meier correction needs per-user censoring windows and
    is out of scope for this mart (the standard first-look curve).

    Integer exact: lifetimes in whole weeks (days DIV 7), survival as
    exact ppm of the user base. Plan: one per-user min/max aggregate
    (the only fact-scale stage), one week-grain rollup, cumulative
    sums at curve grain (max_weeks rows).
    """
    from ..functions.exact import ppm_expr as _ppm

    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
    )
    lifetimes = per_user.select(
        F.expr("datediff(d1, d0) DIV 7").cast("long").alias("weeks")
    )
    per_week = lifetimes.groupBy("weeks").agg(F.count(F.lit(1)).alias("c"))
    total = lifetimes.agg(F.count(F.lit(1)).alias("n_users"))
    grid = spark.range(0, max_weeks + 1).select(F.col("id").cast("long").alias("week"))
    # survivors at week k = users with lifetime >= k
    surv = (
        grid.join(per_week, grid["week"] <= per_week["weeks"], "left")
        .groupBy("week")
        .agg(F.sum(F.coalesce("c", F.lit(0))).alias("n_survivors"))
    )
    return (
        surv.join(F.broadcast(total))
        .selectExpr(
            "CAST(week AS BIGINT) AS week",
            "CAST(n_survivors AS BIGINT) AS n_survivors",
            f"CAST({_ppm('n_survivors', 'n_users')} AS BIGINT) AS survival_ppm",
        )
        .orderBy("week")
    )


def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B118 (r5): time-to-conversion distribution — per user, the lag
    from FIRST 'view' to FIRST SUBSEQUENT 'purchase'; reported as a
    day-grain histogram row per latency day with exact ppm share of
    converting users, plus never-converted accounting on the day=-1
    row. The activation readout growth teams watch (how long does the
    funnel actually take?), complementing funnel_events' step counts
    with the TIME dimension.

    Exact semantics: first view per user (min ts), first purchase AT
    OR AFTER that view (min ts among qualifying purchases — purchases
    before any view don't count as view-driven conversions); latency
    in whole days (datediff). Integer end to end.

    Plan/scale: two conditional min aggregates in ONE per-user pass
    (min ts over views; then one more pass for the conditional
    purchase min via a broadcast-free self aggregate — spelled as a
    join of two per-user aggregates, each map-side combinable),
    day-grain rollup after.
    """
    from ..functions.exact import ppm_expr as _ppm

    e = load_table(spark, sf_dir, "events")
    first_view = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    first_conv = (
        purchases.join(first_view, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    lat = (
        first_view.join(first_conv, "user_id", "left")
        .select(
            F.when(
                F.col("p_ts").isNotNull(),
                F.datediff(F.to_date("p_ts"), F.to_date("v_ts")),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("days")
        )
    )
    per_day = lat.groupBy("days").agg(F.count(F.lit(1)).alias("n_users"))
    total = lat.agg(F.count(F.lit(1)).alias("n_viewers"))
    return (
        per_day.join(F.broadcast(total))
        .selectExpr(
            "CAST(days AS BIGINT) AS days_to_convert",
            "CAST(n_users AS BIGINT) AS n_users",
            f"CAST({_ppm('n_users', 'n_viewers')} AS BIGINT) AS share_ppm",
        )
        .orderBy("days_to_convert")
    )


def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B119 (r5): Theil-Sen robust trend of daily revenue per order
    priority — the median of all pairwise day-to-day slopes (Sen
    1968, public). Where the Holt/OLS family chases every outlier
    day, the pairwise-slope median has a ~29% breakdown point: one
    flash-sale day moves O(n) of the n(n-1)/2 slopes, not the
    estimate. The robust complement to `holt_linear_daily` /
    `forecast_backtest_holt`.

    Exact integers end to end: slopes are signed e6 fixed point
    (sign(dc) * ppm(|dc|, dd) — truncation toward zero, same
    direction both engines), the median is the DISC rule
    rn == (n + 1) DIV 2 over integer slopes, and the intercept is
    the disc-median of the residual levels (cents_i * 1e6 -
    slope_e6 * x_i). Exactness contract: |dc| <= ~9.2e12 cents (the
    ppm part bound) — day-grain revenue deltas sit far below it at
    any scale; residuals stay inside int64 for daily revenue up to
    ~9e12 cents.

    Plan/scale (r11 rewrite, guide §4.2 + VERDICT r10 task 3): ONE
    corpus-scale aggregate (priority x day) — the only stage that
    grows with data — then the calendar-bounded day-grain series
    (~2.4k days -> ~2.9M slopes per priority, NEVER corpus-sized) is
    folded per priority by a vectorized numpy kernel inside
    ``applyInPandas``: np.triu_indices generates the n(n-1)/2 pairs,
    the two-level remainder split runs as int64 array arithmetic
    (floor-div == SQL DIV for the non-negative operands here), and
    both DISC medians are one np.sort + index. The r10 form built the
    pairwise frame TWICE via per-priority sort-merge self-joins (one
    pass for bucket counts, one for the median-bucket slice) plus a
    carry window — ~20 stages and 2 shuffles of ~14M slope rows; an
    intermediate r11 attempt as flatten/transform array expressions
    was 4x SLOWER than r10 (higher-order-function lambdas are
    interpreted per element, not codegen'd — measured 43s vs 10.3s at
    sf0.1), which is exactly the guide §4.2 case for handing the
    bounded batch to native vectorized code. Exactness contract
    unchanged (|dc| <= ~9.2e12, residuals < 2^63): int64 numpy == SQL
    BIGINT on this domain, so the oracle hash is identical.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .alias("cents")
    ).withColumn("x", F.datediff("day", F.lit("1992-01-01").cast("date")))

    def _sen_fold(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("x")
        x = pdf["x"].to_numpy().astype(np.int64)
        c = pdf["cents"].to_numpy().astype(np.int64)
        n = len(x)
        cols = [
            "priority",
            "n_days",
            "n_pairs",
            "slope_cents_per_day_e6",
            "intercept_cents_e6",
        ]
        if n < 2:
            # single-day priorities have no pairs: the median join of
            # the pre-r11 forms dropped them — keep that contract
            return pd.DataFrame({k: [] for k in cols})
        iu, ju = np.triu_indices(n, 1)
        dc = c[ju] - c[iu]
        dd = x[ju] - x[iu]  # > 0: x strictly increasing after the sort
        p1000 = np.abs(dc) * 1000
        # two-level remainder split == ppm_expr: exact for |dc| <= ~9.2e12
        q = (p1000 // dd) * 1000 + ((p1000 % dd) * 1000) // dd
        slopes = np.where(dc >= 0, q, -q)
        slopes.sort()
        n_pairs = int(slopes.size)
        med = int(slopes[(n_pairs + 1) // 2 - 1])  # DISC rn == (n+1) DIV 2
        resid = c * 1_000_000 - med * x
        resid.sort()
        intercept = int(resid[(n + 1) // 2 - 1])
        return pd.DataFrame(
            {
                "priority": [pdf["priority"].iloc[0]],
                "n_days": [n],
                "n_pairs": [n_pairs],
                "slope_cents_per_day_e6": [med],
                "intercept_cents_e6": [intercept],
            }
        )

    return (
        daily.groupBy("priority")
        .applyInPandas(
            _sen_fold,
            schema=(
                "priority string, n_days bigint, n_pairs bigint, "
                "slope_cents_per_day_e6 bigint, intercept_cents_e6 bigint"
            ),
        )
        .orderBy("priority")
    )


def spearman_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B121 (r5): tie-aware Spearman rank correlation between
    calendar day and daily revenue per order priority — the
    NONPARAMETRIC monotone-trend test that pairs with
    `theil_sen_trend` (Sen's slope says how steep; Spearman's rho
    says how consistently monotone, outlier-robust where
    `corr_matrix_lineitem`'s Pearson is not).

    Tie-exact via Pearson-on-midranks (the classic 1 - 6*sum(d^2)
    shortcut is wrong under ties): day ranks are 1..n doubled to e1
    integers (2,4,..), revenue midranks come from the VALUE-grain
    identity 2*midrank = 2*count_before + count + 1 (one window over
    the per-priority daily aggregate — calendar-bounded rows). All
    five moments (n, sums, squares, cross) are exact BIGINTs —
    bounded by ~4*n_days^3 so they stay exact at ANY corpus scale
    (days, not rows, drive the magnitude) — and rho is assembled
    from them in ONE identical double expression tree on both
    engines (the corr_matrix discipline), rounded to 6dp.

    Output per priority: n_days, sxy_e2 (the exact rank-covariance
    numerator n*Sxy - Sx*Sy in e1*e1 units), rho.

    Plan/scale: ONE corpus-scale aggregate (priority x day); every
    window after that runs on ~2.4k-row-per-priority day-grain data.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .alias("cents")
    )
    # e1 day ranks: days are distinct within a priority -> 2*rank
    wx = Window.partitionBy("priority").orderBy("day")
    # e1 revenue midranks at value grain: 2*mid = 2*cb + c + 1
    vals = daily.groupBy("priority", "cents").agg(F.count(F.lit(1)).alias("c"))
    wv = (
        Window.partitionBy("priority")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mid = vals.select(
        "priority",
        "cents",
        (
            F.lit(2) * F.coalesce(F.sum("c").over(wv), F.lit(0))
            + F.col("c")
            + F.lit(1)
        ).cast("long").alias("y2"),
    )
    ranked = (
        daily.withColumn("x2", (F.rank().over(wx) * 2).cast("long"))
        .join(mid, ["priority", "cents"])
    )
    mom = ranked.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x2").cast("long").alias("sx"),
        F.sum("y2").cast("long").alias("sy"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("sxx"),
        F.sum(F.col("y2") * F.col("y2")).cast("long").alias("syy"),
        F.sum(F.col("x2") * F.col("y2")).cast("long").alias("sxy"),
    )
    return mom.selectExpr(
        "priority",
        "CAST(n AS BIGINT) AS n_days",
        "CAST(n * sxy - sx * sy AS BIGINT) AS sxy_e2",
        "round(CAST(n * sxy - sx * sy AS DOUBLE)"
        " / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
        " * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho",
    ).orderBy("priority")


def bot_regularity_flags(
    spark: SparkSession,
    sf_dir: str,
    max_cv2_e6: int = 100_000,
    min_gaps: int = 5,
    top_k: int = 25,
) -> DataFrame:
    """B124 (r5): machine-traffic detector on inter-event timing —
    humans are bursty (gap CV >~ 1), schedulers and scripted crawlers
    are metronomic (CV -> 0), so a user whose squared coefficient of
    gap variation falls below ``max_cv2_e6`` with at least
    ``min_gaps`` observed gaps gets flagged. The timing-based
    complement of volume rules: a slow-but-perfectly-regular bot
    passes every rate limit and fails exactly this test.

    Exact integer end to end: gaps in integer MICROSECONDS
    (``unix_micros`` / ``epoch_us``, the relational6 idiom — whole
    seconds silently diverge between engines on sub-second
    timestamps), per-user moments as DECIMAL(38,0) sums, and the
    scale-free identity cv^2 = var/mean^2 = (n*S2 - S1^2)/S1^2
    (unit-invariant: micros vs seconds cancels) evaluated as one
    truncating fixed-point division (num * 1e6 DIV den) in
    DECIMAL(38,0) on Spark and HUGEINT on DuckDB (both floor — the
    trimmed_winsorized lesson: DuckDB's DECIMAL `//` rounds).

    Output: the ``top_k`` most metronomic users (cv2 asc, user_id
    asc — the triage queue an abuse analyst reads top-down) with a
    ``flagged`` column against the threshold, so the mart is
    non-empty and auditable even on clean traffic.

    Plan/scale: one LAG window over the fact (the event_transitions
    shuffle shape), one per-user aggregate — both corpus-scale passes
    are partial-agg/window standard; the top-k is a map-side
    `partial_topk` prune then one bounded rank window. No collect,
    no value-dependent blowup.
    """
    from .scale import partial_topk
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    D38 = "decimal(38,0)"
    mom = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("gap_us").cast(D38)).cast(D38).alias("s1"),
        F.sum(F.col("gap_us").cast(D38) * F.col("gap_us").cast(D38))
        .cast(D38)
        .alias("s2"),
    )
    scored = mom.filter((F.col("n") >= min_gaps) & (F.col("s1") > 0)).selectExpr(
        "user_id",
        "CAST(n AS BIGINT) AS n_gaps",
        "CAST(CAST(s1 AS decimal(38,0)) DIV (CAST(n AS decimal(38,0)) * 1000000)"
        " AS BIGINT) AS mean_gap_s",
        "CAST(((CAST(n AS decimal(38,0)) * s2 - s1 * s1) * 1000000)"
        " DIV (s1 * s1) AS BIGINT) AS cv2_e6",
    )
    pruned = partial_topk(
        scored.withColumn("_g", F.lit(1)),
        ["_g"],
        "cv2_e6",
        "user_id",
        top_k,
        ascending=True,
    ).drop("_g")
    wr = Window.orderBy(F.col("cv2_e6").asc(), F.col("user_id").asc())
    return (
        pruned.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= top_k)
        .select(
            F.col("rk").cast("long").alias("rk"),
            "user_id",
            "n_gaps",
            "mean_gap_s",
            "cv2_e6",
            (F.col("cv2_e6") < max_cv2_e6).alias("flagged"),
        )
        .orderBy("rk")
    )


def event_freshness_mart(
    spark: SparkSession, sf_dir: str, stale_days: int = 7
) -> DataFrame:
    """B132 (r6): per-type data-freshness mart — the ingest-health
    readout an operations dashboard keeps beside the volume-anomaly
    alarms (B73/B130): for each event type, its span, its daily rate,
    and how stale it is against the corpus's newest event. A type
    whose staleness crosses ``stale_days`` stopped flowing — either
    upstream died or the product retired it; both need a human.

    Exact integers throughout: staleness in exact microseconds
    (``unix_micros``, the relational6 idiom — whole-second extraction
    diverges across engines), rate as events-per-day in e2 integer
    DIV (span measured in calendar days, inclusive).

    Plan/scale: ONE aggregate over events to type grain (map-side
    combinable min/max/count); the corpus max rides in as a 1-row
    broadcast. Nothing else touches the corpus.
    """
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
        F.max(F.unix_micros("ts")).cast("long").alias("last_us"),
    )
    corpus = e.agg(F.max(F.unix_micros("ts")).cast("long").alias("corpus_max_us"))
    stale_us = F.lit(stale_days) * F.lit(86_400_000_000)
    return (
        per.crossJoin(F.broadcast(corpus))
        .select(
            "event_type",
            "n_events",
            "first_day",
            "last_day",
            (F.col("corpus_max_us") - F.col("last_us")).cast("long").alias("staleness_us"),
            F.expr(
                "CAST(n_events * 100 DIV (datediff(last_day, first_day) + 1) AS BIGINT)"
            ).alias("events_per_day_e2"),
            ((F.col("corpus_max_us") - F.col("last_us")) > stale_us).alias("is_stale"),
        )
        .orderBy("event_type")
    )


def watermark_lateness_audit(
    spark: SparkSession,
    sf_dir: str,
    watermark_s: int = 600,
    band_width: int = 4096,
) -> DataFrame:
    """B133 (r6): out-of-orderness audit — the measurement that SIZES
    a streaming watermark before anyone picks one: per event type,
    how late events arrive relative to the maximum event time already
    seen at their arrival position (arrival order = event_id, the
    ingest-sequence proxy this corpus carries; swap in a kafka offset
    behind the same contract). An event is LATE when some
    earlier-arriving event has a newer timestamp; events later than
    ``watermark_s`` would be DROPPED by a watermark of that delay —
    the exact trade this table prices (D-family ops take the delay as
    a parameter; this is where its value comes from).

    Exact integers: lateness in microseconds (``unix_micros``),
    ppm shares, avg via integer DIV.

    Plan/scale: the running prefix-max uses the band/carry two-level
    decomposition GENERALIZED TO MAX (prefix-max is associative, so
    the same trick applies: within-band running max over <=
    ``band_width`` arrival ids + a carry of per-band maxima) — no
    task ever sorts a whole type's stream, the exact failure the
    advisor's single-partition-window rule exists to catch at type
    grain.
    """
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros("ts").cast("long").alias("us"),
    )
    neg_inf = -(1 << 62)
    banded = e.withColumn("_band", F.expr(f"event_id DIV {band_width}"))
    w_in = (
        Window.partitionBy("event_type", "_band")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    banded = banded.withColumn("_in_max", F.max("us").over(w_in))
    band_max = banded.groupBy("event_type", "_band").agg(
        F.max("us").alias("_bm")
    )
    w_carry = (
        Window.partitionBy("event_type")
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = band_max.select(
        "event_type",
        "_band",
        F.coalesce(F.max("_bm").over(w_carry), F.lit(neg_inf)).alias("_carry_max"),
    )
    late = (
        banded.join(carry, ["event_type", "_band"])
        .withColumn(
            "prev_max",
            F.greatest(F.coalesce("_in_max", F.lit(neg_inf)), F.col("_carry_max")),
        )
        .withColumn(
            "lateness_us",
            F.greatest(F.col("prev_max") - F.col("us"), F.lit(0)).cast("long"),
        )
    )
    wm_us = watermark_s * 1_000_000
    from ..functions.exact import ppm_expr as _ppm_e

    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum((F.col("lateness_us") > 0).cast("long")).cast("long").alias("n_late"),
            F.sum((F.col("lateness_us") > wm_us).cast("long"))
            .cast("long")
            .alias("n_dropped_by_watermark"),
            F.max("lateness_us").cast("long").alias("max_lateness_us"),
            F.sum("lateness_us").cast("long").alias("_sum_late"),
        )
        .selectExpr(
            "event_type",
            "n_events",
            "n_late",
            f"CAST({_ppm_e('n_late', 'n_events')} AS BIGINT) AS late_share_ppm",
            "n_dropped_by_watermark",
            f"CAST({_ppm_e('n_dropped_by_watermark', 'n_events')} AS BIGINT)"
            " AS dropped_share_ppm",
            "max_lateness_us",
            "CAST(_sum_late DIV n_events AS BIGINT) AS avg_lateness_us",
        )
        .orderBy("event_type")
    )


def xcorr_daily_events(
    spark: SparkSession, sf_dir: str, max_lag: int = 3
) -> DataFrame:
    """B144 (r10): lead/lag CROSS-correlation between the daily
    volume series of every event-type pair on the gap-filled grid —
    the companion `autocorr_daily` (B102) can't give: which signals
    LEAD which (does a 'view' surge foreshadow a 'purchase' surge k
    days later?), the causal-ordering diagnostic a monitoring/
    attribution pipeline checks before trusting any same-day
    correlation. Lag k pairs (x_t, y_{t-k}) for k in -max_lag..
    +max_lag; positive k means type_b LEADS type_a by k days.
    Unordered pairs only (type_a < type_b) — corr(a,b,k) ==
    corr(b,a,-k), so ordered pairs would be pure duplication.

    Exactness (B102's discipline verbatim): every moment is an exact
    BIGINT aggregate of integer daily counts; one final double
    expression with an identical tree on both engines, 6dp, NULL on
    zero variance.

    Plan/scale: the corpus-scale stage is the shared daily
    aggregate; everything after is day-grain x types^2 x lags —
    calendar-bounded at any corpus size (the theil_sen argument).
    """
    grid = _daily_grid(spark, sf_dir)
    lags = spark.range(-max_lag, max_lag + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = grid.select(
        F.col("event_type").alias("type_a"), "day", F.col("n").alias("x")
    )
    b = grid.select(
        F.col("event_type").alias("type_b"),
        F.col("day").alias("b_day"),
        F.col("n").alias("y"),
    )
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b_day") == F.date_sub(F.col("day"), F.col("lag")))
            & (F.col("type_a") < F.col("type_b")),
        )
        .select("type_a", "type_b", "lag", "x", "y")
    )
    mom = pairs.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    d1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    d2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    corr = F.when(
        (d1 > 0) & (d2 > 0),
        r6(num.cast("double") / F.sqrt(d1.cast("double") * d2.cast("double"))),
    )
    return mom.select(
        "type_a",
        "type_b",
        F.col("lag").cast("int").alias("lag"),
        F.col("n").cast("long").alias("n_pairs"),
        corr.alias("xcorr"),
    ).orderBy("type_a", "type_b", "lag")


def rolling_percentiles_daily(
    spark: SparkSession, sf_dir: str, window_days: int = 7
) -> DataFrame:
    """B145 (r10): trailing-window EXACT percentiles of daily event
    volume per type on the gap-filled grid — the adaptive-baseline
    mart an SLO monitor reads (today's volume vs the trailing week's
    p50/p90: 'normal for this signal', not a fixed threshold; the
    robust sibling of the MAD alarm family, in the original count
    units).

    Exactness: Spark's percentile_approx is APPROXIMATE — unusable
    under a hash gate — so both engines index the SAME sorted
    trailing array with percentile_disc's rule spelled in pure
    integers: p50 at ceil(n/2) = (n+1) DIV 2, p90 at ceil(9n/10) =
    (9n+9) DIV 10 (1-based). Counts are BIGINTs; no float touches
    anything.

    Plan/scale: the trailing set is a day-arithmetic self-join of
    the grid (the B102/B144 idiom — day-grain x window_days rows),
    grouped once; per-group state is window_days integers. Short
    leading windows emit with their true n_days rather than NULL —
    the consumer sees exactly how much history backs each row.
    """
    grid = _daily_grid(spark, sf_dir)
    offs = spark.range(window_days).select(F.col("id").cast("int").alias("off"))
    a = grid.select("event_type", "day")
    b = grid.select(
        F.col("event_type").alias("b_type"),
        F.col("day").alias("b_day"),
        F.col("n").alias("x"),
    )
    trailing = (
        a.crossJoin(F.broadcast(offs))
        .join(
            b,
            (F.col("b_type") == F.col("event_type"))
            & (F.col("b_day") == F.date_sub(F.col("day"), F.col("off"))),
        )
        .select("event_type", "day", "x")
    )
    agg = trailing.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sort_array(F.collect_list("x")).alias("xs"),
    )
    idx50 = F.expr("(n_days + 1) DIV 2").cast("int")
    idx90 = F.expr("(9 * n_days + 9) DIV 10").cast("int")
    return agg.select(
        "event_type",
        "day",
        F.col("n_days").cast("long").alias("n_days"),
        F.element_at("xs", idx50).cast("long").alias("p50"),
        F.element_at("xs", idx90).cast("long").alias("p90"),
    ).orderBy("event_type", "day")
