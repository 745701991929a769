"""Distribution-level statistical audits over the fact tables —
Benford digit conformance, the Gini inequality coefficient, and the
exact two-sample Kolmogorov-Smirnov statistic.

Reference parity: the reference (pandas lakehouse, src/gold.py) ships
mart-level aggregates only; these generalize its "one pass, exact
arithmetic" mart discipline to the distribution-shape audits a data
platform runs on its own revenue/price columns (fraud screening,
cohort drift, inequality tracking).

All three follow the repo's engine-parity rules:
- integer/fixed-point arithmetic end-to-end (ppm shares via
  ``ppm_expr``); doubles appear only as a FINAL assembly step from
  exact integer sums, with identical expression trees on both
  engines (the corr_matrix_lineitem discipline);
- no whole-table sort: rank/ECDF machinery uses the value-band
  two-level prefix-sum decomposition (the equi_depth_histogram
  discipline) — windows run at value grain inside bounded bands,
  plus one carry window over one-row-per-band.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import ppm_expr as _ppm
from ..sources.registry import load_table
from .relational import r6

# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's law expected
# first-digit shares in exact ppm. Baked as literals so BOTH engines
# compare against the identical integers (no log10 at query time).
BENFORD_PPM = {d: math.floor(math.log10(1.0 + 1.0 / d) * 1_000_000) for d in range(1, 10)}


def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B99 (r5): Benford's-law conformance audit of order totals —
    the classic large-scale fraud/data-quality screen: naturally
    occurring multi-magnitude amounts follow P(d) = log10(1 + 1/d);
    fabricated or truncated feeds don't.

    Per first significant digit 1-9: order count, observed share in
    exact ppm, the Benford expectation in ppm (frozen literals), and
    the chi-square contribution ((obs-exp)^2 / exp, e6 fixed-point) —
    all BIGINT, no floats anywhere.

    The digit comes from the CENTS integer rendered as a string
    (totalprice >= 1.00 always, so the first cents digit IS the first
    significant digit) — never from decimal formatting, which differs
    between engines.

    Plan/scale: one map-side digit extraction + one 9-group
    aggregate; a broadcast 1-row total. Nothing shuffles but 9 rows.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    digits = o.select(
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
    )
    per_digit = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    total = digits.agg(F.count(F.lit(1)).alias("n_total"))
    grid = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    exp_ppm = F.element_at(
        F.array(*[F.lit(BENFORD_PPM[d]) for d in range(1, 10)]), F.col("digit")
    ).cast("long")
    return (
        grid.join(per_digit, "digit", "left")
        .join(F.broadcast(total))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_orders"),
            F.expr(_ppm("coalesce(n, 0)", "n_total")).cast("long").alias("obs_ppm"),
            exp_ppm.alias("benford_ppm"),
        )
        .withColumn(
            "chi2_contrib_e6",
            # integer DIV (not /, which is double division in Spark):
            # (obs-exp)^2 <= 1e12 so the product is BIGINT-safe
            F.expr(
                "(obs_ppm - benford_ppm) * (obs_ppm - benford_ppm) DIV benford_ppm"
            ).cast("long"),
        )
        .orderBy("digit")
    )


def _banded_cum(df: DataFrame, value: str, measures: list[str], band_div: int) -> DataFrame:
    """Two-level prefix sums at VALUE grain: within-band running sums
    over ``value`` order plus a carry window over one-row-per-band —
    the equi_depth_histogram decomposition, generalized to multiple
    measures. Adds ``cum_<m>`` (inclusive cumulative) per measure.
    No window ever sees more rows than one band's distinct values."""
    banded = df.withColumn("_band", F.expr(f"{value} DIV {band_div}"))
    w_in = (
        Window.partitionBy("_band")
        .orderBy(value)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for m in measures:
        banded = banded.withColumn(f"_in_{m}", F.sum(m).over(w_in))
    band_tot = banded.groupBy("_band").agg(
        *[F.sum(m).alias(f"_bt_{m}") for m in measures]
    )
    w_carry = Window.orderBy("_band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = band_tot.select(
        "_band",
        *[
            F.coalesce(F.sum(f"_bt_{m}").over(w_carry), F.lit(0)).alias(f"_carry_{m}")
            for m in measures
        ],
    )
    out = banded.join(carry, "_band")
    for m in measures:
        out = out.withColumn(f"cum_{m}", (F.col(f"_carry_{m}") + F.col(f"_in_{m}")).cast("long"))
    return out.drop("_band", *[f"_in_{m}" for m in measures], *[f"_carry_{m}" for m in measures])


def gini_revenue(spark: SparkSession, sf_dir: str, band_cents: int = 10_000_000) -> DataFrame:
    """B100 (r5): exact Gini coefficient of per-customer revenue —
    the standard inequality summary (0 = all customers spend equally,
    ->1 = one whale). Uses the sorted-rank identity

        G = (2 * sum_i i*x_i) / (n * sum_i x_i) - (n + 1) / n

    but NEVER materializes per-row ranks: grouping to distinct
    revenue VALUES v (count c, cumulative count-before cb via the
    two-level band/carry prefix sum) turns the rank sum into

        2 * sum_i i*x_i = sum_v v * (2*cb*c + c*(c+1))

    — tie-exact, and every window runs at value grain inside bounded
    price bands. Sums are exact DECIMAL(38,0); the final ratio is
    assembled in doubles from those exact integers with an identical
    expression tree on both engines (corr_matrix discipline), rounded
    to 6dp.

    Output one row: n_customers, total revenue in BIGINT cents, gini.

    Scale: the per-customer aggregate is the only fact-scale shuffle;
    the value-grain layer is bounded by distinct revenue amounts per
    band. Intermediates stay exact at any scale via DECIMAL(38,0).
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    vals = per_cust.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cum = _banded_cum(vals, "v", ["c"], band_cents)
    D38 = "decimal(38,0)"
    terms = cum.select(
        "v",
        "c",
        (F.col("cum_c") - F.col("c")).alias("cb"),
    ).select(
        F.col("c").cast("long").alias("c"),
        (F.col("v").cast(D38) * F.col("c").cast(D38)).alias("t"),
        (
            F.col("v").cast(D38)
            * (
                F.lit(2).cast(D38) * F.col("cb").cast(D38) * F.col("c").cast(D38)
                + F.col("c").cast(D38) * (F.col("c").cast(D38) + F.lit(1).cast(D38))
            )
        ).alias("s2"),
    )
    agg = terms.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum("t").cast(D38).alias("t_sum"),
        F.sum("s2").cast(D38).alias("s2_sum"),
    )
    n_d = F.col("n").cast("double")
    t_d = F.col("t_sum").cast("double")
    s2_d = F.col("s2_sum").cast("double")
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("t_sum").cast("long").alias("total_cents"),
        r6((s2_d - (n_d + F.lit(1.0)) * t_d) / (n_d * t_d)).alias("gini"),
    )


def ks_promo_price(spark: SparkSession, sf_dir: str, band_cents: int = 100_000) -> DataFrame:
    """B101 (r5): exact two-sample Kolmogorov-Smirnov statistic
    between the retail-price distributions of PROMO parts and all
    other parts — the distribution-drift test a pipeline runs when a
    segment (new source, new period, A/B arm) must be shown to match
    or differ from the base population.

    KS = max over values of |ECDF_a - ECDF_b|, computed EXACTLY at
    value grain: per distinct price, cumulative counts for both
    groups via ONE shared two-level band/carry prefix pass (both
    measures ride the same windows), ECDFs in exact integer ppm
    (``ppm_expr``), and the max gap + the smallest price attaining it
    (deterministic argmax via struct max). Integer end-to-end.

    Output one row: group sizes, ks_ppm, and the attaining price.

    Scale: one scan of part, value-grain windows bounded per band —
    the same shape as equi_depth_histogram; no global sort.
    """
    p = load_table(spark, sf_dir, "part")
    cents = (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
    is_promo = F.col("p_type").startswith("PROMO")
    vals = (
        p.select(cents.alias("v"), is_promo.alias("g"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("g"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("g"), 0).otherwise(1)).alias("cb"),
        )
    )
    cum = _banded_cum(vals, "v", ["ca", "cb"], band_cents)
    totals = vals.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    gaps = cum.join(F.broadcast(totals)).select(
        "v",
        "na",
        "nb",
        F.abs(
            F.expr(_ppm("cum_ca", "na")) - F.expr(_ppm("cum_cb", "nb"))
        ).alias("gap_ppm"),
    )
    # deterministic argmax: max (gap, -v) struct -> largest gap, then
    # smallest attaining value
    best = gaps.agg(
        F.max(F.struct(F.col("gap_ppm"), (-F.col("v")).alias("nv"))).alias("m"),
        F.first("na").alias("n_promo"),
        F.first("nb").alias("n_other"),
    )
    return best.select(
        F.col("n_promo").cast("long").alias("n_promo"),
        F.col("n_other").cast("long").alias("n_other"),
        F.col("m.gap_ppm").cast("long").alias("ks_ppm"),
        (-F.col("m.nv")).cast("long").alias("at_price_cents"),
    )


def contingency_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B105 (r5): dependence summary of the priority x status
    contingency table — the one-row verdict on top of
    contingency_orders' per-cell view: total chi-square, degrees of
    freedom, Cramer's V (effect size), and mutual information.

    Parity discipline: chi-square and MI are SUMS of per-cell doubles
    — float summation order would diverge between engines — so each
    cell's contribution is FROZEN to one rounded integer (chi2 in e6
    units, MI in micro-nats: round(1e6 * n_xy/N * ln(n_xy*N /
    (n_x*n_y)))) and the sums are exact BIGINTs (the dsir/perplexity
    freeze). Cramer's V is then ONE identical-tree double from the
    frozen chi2 integer.

    Plan/scale: one fact aggregate to the cell grid; windows run over
    the dozens of cells. Nothing else touches the corpus.
    """
    o = load_table(spark, sf_dir, "orders")
    cells = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_xy")
    )
    w_row = Window.partitionBy("o_orderpriority")
    w_col = Window.partitionBy("o_orderstatus")
    w_all = Window.partitionBy()
    t = cells.select(
        "o_orderpriority",
        "o_orderstatus",
        "n_xy",
        F.sum("n_xy").over(w_row).alias("n_x"),
        F.sum("n_xy").over(w_col).alias("n_y"),
        F.sum("n_xy").over(w_all).alias("n"),
    )
    e = F.col("n_x").cast("double") * F.col("n_y").cast("double") / F.col("n").cast("double")
    o_d = F.col("n_xy").cast("double")
    chi_e6 = F.round(F.lit(1_000_000.0) * (o_d - e) * (o_d - e) / e).cast("long")
    mi_micro = F.round(
        F.lit(1_000_000.0)
        * (o_d / F.col("n").cast("double"))
        * F.log(
            o_d
            * F.col("n").cast("double")
            / (F.col("n_x").cast("double") * F.col("n_y").cast("double"))
        )
    ).cast("long")
    frozen = t.select(
        "n_xy",
        "n",
        chi_e6.alias("chi_e6"),
        mi_micro.alias("mi_micro"),
        F.col("o_orderpriority").alias("rx"),
        F.col("o_orderstatus").alias("ry"),
    )
    agg = frozen.groupBy("n").agg(
        F.sum("chi_e6").alias("chi2_e6"),
        F.sum("mi_micro").alias("mi_micro_nats"),
        F.count_distinct("rx").alias("r"),
        F.count_distinct("ry").alias("c"),
    )
    v = F.sqrt(
        F.col("chi2_e6").cast("double")
        / F.lit(1_000_000.0)
        / (F.col("n").cast("double") * F.least(F.col("r") - 1, F.col("c") - 1).cast("double"))
    )
    return agg.select(
        F.col("n").cast("long").alias("n_orders"),
        F.col("chi2_e6").cast("long").alias("chi2_e6"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        r6(v).alias("cramer_v"),
        F.col("mi_micro_nats").cast("long").alias("mi_micro_nats"),
    )


def lorenz_deciles(spark: SparkSession, sf_dir: str, band_cents: int = 10_000_000) -> DataFrame:
    """B106 (r5): the Lorenz curve behind ``gini_revenue`` at decile
    grain — per revenue decile (poorest 10% of customers first), the
    customer count, exact revenue, revenue share, and cumulative
    share in exact ppm. The inequality readout dashboards plot.

    NO per-customer rank and NO tie-breaking: each distinct revenue
    VALUE group occupies a contiguous rank interval [cb+1, cb+c]
    (value-grain band/carry prefix sums, the gini machinery), decile
    d owns ranks (d-1)*n DIV 10 + 1 .. d*n DIV 10, and the group's
    contribution to d is the INTERVAL OVERLAP — exact integer
    arithmetic, well-defined under ties because equal-revenue
    customers are interchangeable. Groups explode into <= 10 decile
    rows (almost always 1).

    Plan/scale: the per-customer aggregate is the only fact-scale
    shuffle; everything after runs at value grain inside bounded
    bands. Revenue sums ride DECIMAL(38,0), output BIGINT cents.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    vals = per_cust.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cum = _banded_cum(vals, "v", ["c"], band_cents)
    totals = vals.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("t_rev"),
    )
    D = F.explode(F.array(*[F.lit(d) for d in range(1, 11)])).alias("decile")
    spans = (
        cum.join(F.broadcast(totals))
        .select(
            "v",
            "c",
            (F.col("cum_c") - F.col("c")).alias("cb"),
            "cum_c",
            "n",
            "t_rev",
            D,
        )
        .withColumn("lo", F.expr("(decile - 1) * n DIV 10"))
        .withColumn("hi", F.expr("decile * n DIV 10"))
        .withColumn(
            "overlap",
            F.greatest(
                F.lit(0).cast("long"),
                F.least(F.col("hi"), F.col("cum_c")) - F.greatest(F.col("lo"), F.col("cb")),
            ),
        )
        .filter(F.col("overlap") > 0)
    )
    per_decile = spans.groupBy("decile", "n", "t_rev").agg(
        F.sum("overlap").cast("long").alias("n_customers"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("overlap").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("rev"),
    )
    w_cum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_decile.withColumn("cum_rev", F.sum("rev").over(w_cum).cast("decimal(38,0)"))
        .selectExpr(
            "CAST(decile AS INT) AS decile",
            "CAST(n_customers AS BIGINT) AS n_customers",
            "CAST(rev AS BIGINT) AS revenue_cents",
            f"CAST({_ppm('rev', 't_rev')} AS BIGINT) AS revenue_share_ppm",
            f"CAST({_ppm('cum_rev', 't_rev')} AS BIGINT) AS cum_share_ppm",
        )
        .orderBy("decile")
    )


def theil_hoover_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B108 (r5): Theil index and Hoover (Robin Hood) index of
    per-customer revenue — the two inequality measures that complete
    the gini/Lorenz family: Theil is additively DECOMPOSABLE across
    subgroups (the property economists pick it for), Hoover is the
    share of total revenue that would have to move to equalize
    everyone ("how much to redistribute").

        Theil  = sum_i (x_i/T) * ln(n * x_i / T)
        Hoover = sum_i |x_i*n - T| / (2*T*n)

    Value-grain like gini (distinct revenue v, count c — ties exact,
    no per-row pass): the ln term is FROZEN per distinct value to one
    rounded integer micro-nat (dsir freeze; the per-value double tree
    is identical on both engines), weighted sums ride DECIMAL(38,0)
    exactly, and each index is ONE final identical-tree double,
    rounded 6dp. Zero-revenue customers cannot occur (every customer
    row aggregated from >= 1 order with positive total), so ln is
    total.

    Plan/scale: the per-customer aggregate is the only fact-scale
    shuffle; the value layer is a 1-row broadcast join + map-side
    math + one aggregate.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
        .cast("long")
        .alias("v")
    )
    vals = per_cust.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    totals = vals.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("c").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("t"),
    )
    D38 = "decimal(38,0)"
    j = vals.join(F.broadcast(totals))
    w_micro = F.round(
        F.lit(1_000_000.0)
        * F.log(
            F.col("v").cast("double") * F.col("n").cast("double") / F.col("t").cast("double")
        )
    ).cast("long")
    terms = j.select(
        "n",
        "t",
        (
            F.col("c").cast(D38) * F.col("v").cast(D38) * w_micro.cast(D38)
        ).alias("theil_term"),
        (
            F.col("c").cast(D38)
            * F.abs(F.col("v").cast(D38) * F.col("n").cast(D38) - F.col("t"))
        ).alias("hoover_term"),
    )
    agg = terms.groupBy("n", "t").agg(
        F.sum("theil_term").cast(D38).alias("s_theil"),
        F.sum("hoover_term").cast(D38).alias("s_hoover"),
    )
    theil = r6(
        F.col("s_theil").cast("double") / F.col("t").cast("double") / F.lit(1_000_000.0)
    )
    hoover = r6(
        F.col("s_hoover").cast("double")
        / (F.lit(2.0) * F.col("t").cast("double") * F.col("n").cast("double"))
    )
    return agg.select(
        F.col("n").cast("long").alias("n_customers"),
        F.col("t").cast("long").alias("total_cents"),
        theil.alias("theil"),
        hoover.alias("hoover"),
    )


def anova_price_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B112 (r5): one-way ANOVA of lineitem extended price across
    return flags — does the grouping explain price variance? Per group:
    n and mean; one summary row folded in: eta-squared (variance
    explained, SS_between/SS_total) and the F statistic.

    Everything derives from THREE exact integer aggregates per group
    (n, sum cents, sum cents^2 — the corr_matrix moment discipline;
    squares ride DECIMAL(38,0)); eta2 and F are identical-tree final
    doubles at 6dp. Emitted per group so the output is a mart, the
    summary columns repeat (constant over groups) — the standard
    denormalized readout.

    Plan/scale: ONE map-side-combinable aggregate over the fact;
    group grain (3 return flags) after.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    D38 = "decimal(38,0)"
    g = li.select(F.col("l_returnflag").alias("returnflag"), cents.alias("x")).groupBy(
        "returnflag"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast(D38).alias("s"),
        F.sum(F.col("x").cast(D38) * F.col("x").cast(D38)).cast(D38).alias("ss"),
    )
    w = Window.partitionBy()
    # grand totals get distinct names: Spark resolution is
    # case-insensitive, so N/S/SS would collide with n/s/ss
    tot = g.select(
        "returnflag",
        "n",
        "s",
        F.sum("n").over(w).alias("n_all"),
        F.sum("s").over(w).alias("s_all"),
        F.sum("ss").over(w).alias("ss_all"),
        F.count(F.lit(1)).over(w).alias("n_groups"),
        # per-group between-term s^2/n FROZEN to a rounded integer in
        # 1e12-cent^2 units (the micro-nat freeze, scaled: s^2/n can
        # reach ~1e25, far past BIGINT, and Spark's DIV on decimals
        # silently overflows LONG — verified; the 1e12 quantum is
        # ~1e-13 relative, invisible at 6dp). NEVER a double sum
        # across groups — float summation order diverges.
        F.round(
            F.col("s").cast("double")
            * F.col("s").cast("double")
            / F.col("n").cast("double")
            / F.lit(1.0e12)
        )
        .cast("long")
        .alias("bt_t"),
        (F.col("s").cast("double") / F.col("n").cast("double")).alias("mean_d"),
    )
    agg = tot.groupBy("n_all", "s_all", "ss_all", "n_groups").agg(
        F.sum("bt_t").cast("long").alias("sum_bt_t")
    )
    # grand-mean term S^2/N, same frozen-units treatment
    st2 = F.round(
        F.col("s_all").cast("double")
        * F.col("s_all").cast("double")
        / F.col("n_all").cast("double")
        / F.lit(1.0e12)
    ).cast("long")
    ss_total = F.col("ss_all").cast("double") / F.lit(1.0e12) - st2.cast("double")
    ss_between = F.col("sum_bt_t").cast("double") - st2.cast("double")
    eta2 = ss_between / ss_total
    f_stat = (ss_between / (F.col("n_groups").cast("double") - 1.0)) / (
        (ss_total - ss_between)
        / (F.col("n_all").cast("double") - F.col("n_groups").cast("double"))
    )
    summary = agg.select(
        r6(eta2).alias("eta_squared"), r6(f_stat).alias("f_stat")
    )
    return (
        tot.select(
            "returnflag",
            F.col("n").cast("long").alias("n_items"),
            r6(F.col("mean_d") / F.lit(100.0)).alias("mean_price"),
        )
        .join(F.broadcast(summary))
        .orderBy("returnflag")
    )


def market_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B116 (r5): Herfindahl-Hirschman concentration of revenue
    across customer nations, per market segment — the regulator's
    concentration number (HHI < 0.15 unconcentrated, > 0.25 highly
    concentrated) and the group-level complement of the gini family:
    gini ranks customers, HHI measures how few MARKETS the money
    flows through.

    Exact integers end to end: nation shares of segment revenue in
    ppm (``ppm_expr`` over exact cent sums), HHI = sum(share_ppm^2)
    DIV 1e6 — e6 fixed point (1e6 = monopoly), plus the top nation's
    share and the e2 effective-competitor count 1e8 DIV hhi_e6
    (= 1/HHI, the numbers-equivalent).

    Plan/scale: one fact join (orders x customer on custkey), one
    (segment, nation) aggregate; everything after runs at the
    bounded segment x nation grain.
    """
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("cents"),
    )
    cells = j.groupBy("segment", "nation").agg(F.sum("cents").alias("rev"))
    seg = cells.groupBy("segment").agg(
        F.sum("rev").alias("seg_rev"), F.count(F.lit(1)).alias("n_nations")
    )
    shares = cells.join(seg, "segment").select(
        "segment",
        "n_nations",
        "seg_rev",
        F.expr(_ppm("rev", "seg_rev")).cast("long").alias("share_ppm"),
    )
    return (
        shares.groupBy("segment", "n_nations", "seg_rev")
        .agg(
            F.expr("CAST(sum(share_ppm * share_ppm) DIV 1000000 AS BIGINT)").alias(
                "hhi_e6"
            ),
            F.max("share_ppm").alias("top_share_ppm"),
        )
        .selectExpr(
            "segment",
            "CAST(n_nations AS BIGINT) AS n_nations",
            "CAST(seg_rev AS BIGINT) AS revenue_cents",
            "hhi_e6",
            "CAST(top_share_ppm AS BIGINT) AS top_share_ppm",
            "CAST(100000000 DIV hhi_e6 AS BIGINT) AS n_effective_e2",
        )
        .orderBy("segment")
    )


def mann_whitney_price(spark: SparkSession, sf_dir: str, band_cents: int = 100_000) -> DataFrame:
    """B120 (r5): exact tie-aware Mann-Whitney U between PROMO and
    non-PROMO retail prices — the LOCATION-shift complement of
    `ks_promo_price` (KS detects any distribution difference; U asks
    specifically "does one group stochastically dominate?", the
    question behind every is-the-new-source-more-expensive /
    is-arm-B-slower readout).

    Tie-exact at VALUE grain: per distinct price, group counts ride
    the shared band/carry prefix pass; each promo item at value v
    beats the cb_before(v) cheaper others and half-ties the cb(v)
    equal ones, so

        2*U_promo = sum_v ca_v * (2*cb_before_v + cb_v)

    stays in integers (no halves). Effect size is the rank-biserial
    correlation r = (2U - na*nb)/(na*nb), emitted as signed exact ppm
    (sign * ppm(|num|, den) so truncation direction matches across
    engines). The na*nb denominator goes through ``checked_mul_expr``
    — loud failure, never silent wraparound, if a 100 TB run exceeds
    the exact-ppm bound (na*nb <= ~9.2e15, i.e. ~1e8 rows per side).

    Output one row: n_promo, n_other, u2_promo (= 2*U_promo, BIGINT),
    rank_biserial_ppm (signed; >0 means promo prices run higher).

    Scale: one scan of part, value-grain windows bounded per band —
    the ks_promo_price shape exactly; the U sum accumulates in
    DECIMAL(38,0) so intermediates are exact at any scale.
    """
    from ..functions.exact import checked_mul_expr

    p = load_table(spark, sf_dir, "part")
    cents = (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
    is_promo = F.col("p_type").startswith("PROMO")
    vals = (
        p.select(cents.alias("v"), is_promo.alias("g"))
        .groupBy("v")
        .agg(
            F.sum(F.when(F.col("g"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("g"), 0).otherwise(1)).alias("cb"),
        )
    )
    cum = _banded_cum(vals, "v", ["cb"], band_cents)
    D38 = "decimal(38,0)"
    terms = cum.select(
        F.col("ca").cast("long").alias("ca"),
        F.col("cb").cast("long").alias("cb"),
        (
            F.col("ca").cast(D38)
            * (
                F.lit(2).cast(D38) * (F.col("cum_cb") - F.col("cb")).cast(D38)
                + F.col("cb").cast(D38)
            )
        ).alias("u2_term"),
    )
    agg = terms.agg(
        F.sum("ca").cast("long").alias("na"),
        F.sum("cb").cast("long").alias("nb"),
        F.sum("u2_term").cast(D38).cast("long").alias("u2"),
    )
    prod = checked_mul_expr("na", "nb")
    num = f"(u2 - ({prod}))"
    return agg.selectExpr(
        "CAST(na AS BIGINT) AS n_promo",
        "CAST(nb AS BIGINT) AS n_other",
        "CAST(u2 AS BIGINT) AS u2_promo",
        f"CAST(CASE WHEN {num} < 0 THEN -1 ELSE 1 END"
        f" * ({_ppm(f'abs({num})', prod)}) AS BIGINT) AS rank_biserial_ppm",
    )


def trimmed_winsorized_price(
    spark: SparkSession, sf_dir: str, trim_pct: int = 5, band_cents: int = 100_000
) -> DataFrame:
    """B122 (r5): exact trimmed and winsorized means of extended
    price per return flag — the robust-location pair every metrics
    platform keeps beside the plain mean (trimming DROPS the tails a
    fat-fingered price or a whale order pollutes; winsorizing CLAMPS
    them to the cut values, keeping n constant for variance-style
    downstream use). k = n * trim_pct DIV 100 rows are cut per tail
    — a COUNT contract, not a value contract, so it is tie-exact and
    engine-invariant.

    All integer, no per-row rank: at VALUE grain (per distinct cents
    price: count c, count-before cb via the shared band/carry prefix
    pass), the bottom-tail sum is sum_v v * clamp(k - cb, 0, c) and
    the top tail mirrors it with count-after; the cut values are the
    min v with cum >= k+1 / n-k (deterministic argmin via struct
    min). Means are exact floor DIVs of DECIMAL(38,0)-exact sums.

    Output per flag: n, k_trim, mean/trimmed/winsorized means in
    cents (BIGINT), lo/hi cut prices in cents.

    Plan/scale: one lineitem scan to value grain; every window after
    runs at value grain inside bounded bands — the gini shape.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    vals = (
        li.select(F.col("l_returnflag").alias("flag"), cents.alias("v"))
        .groupBy("flag", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # per-flag banded cum (the _banded_cum shape, partitioned by flag)
    banded = vals.withColumn("_band", F.expr(f"v DIV {band_cents}"))
    w_in = (
        Window.partitionBy("flag", "_band")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    banded = banded.withColumn("_in_c", F.sum("c").over(w_in))
    band_tot = banded.groupBy("flag", "_band").agg(F.sum("c").alias("_bt"))
    w_carry = (
        Window.partitionBy("flag")
        .orderBy("_band")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = band_tot.select(
        "flag",
        "_band",
        F.coalesce(F.sum("_bt").over(w_carry), F.lit(0)).alias("_carry"),
    )
    cum = (
        banded.join(carry, ["flag", "_band"])
        .withColumn("cum_c", (F.col("_carry") + F.col("_in_c")).cast("long"))
        .select("flag", "v", "c", "cum_c")
    )
    D38 = "decimal(38,0)"
    tot = vals.groupBy("flag").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.col("v").cast(D38) * F.col("c").cast(D38)).cast(D38).alias("s"),
    ).withColumn("k", F.expr(f"CAST(n * {trim_pct} DIV 100 AS BIGINT)"))
    j = cum.join(F.broadcast(tot), "flag")
    per_flag = j.groupBy("flag", "n", "k").agg(
        F.max("s").alias("s"),
        F.sum(
            F.expr(
                "CAST(v AS decimal(38,0)) * CAST(greatest(CAST(0 AS BIGINT),"
                " least(c, k - (cum_c - c))) AS decimal(38,0))"
            )
        ).cast(D38).alias("lo_sum"),
        F.sum(
            F.expr(
                "CAST(v AS decimal(38,0)) * CAST(greatest(CAST(0 AS BIGINT),"
                " least(c, cum_c - (n - k))) AS decimal(38,0))"
            )
        ).cast(D38).alias("hi_sum"),
        F.min(F.when(F.col("cum_c") >= F.col("k") + 1, F.col("v"))).alias("lo_cut"),
        F.min(F.when(F.col("cum_c") >= F.col("n") - F.col("k"), F.col("v"))).alias(
            "hi_cut"
        ),
    )
    return per_flag.selectExpr(
        "flag",
        "CAST(n AS BIGINT) AS n",
        "CAST(k AS BIGINT) AS k_trim",
        "CAST(CAST(s AS decimal(38,0)) DIV CAST(n AS decimal(38,0)) AS BIGINT)"
        " AS mean_cents",
        "CAST((s - lo_sum - hi_sum) DIV CAST(n - 2 * k AS decimal(38,0)) AS BIGINT)"
        " AS trimmed_mean_cents",
        "CAST((s - lo_sum - hi_sum + CAST(k AS decimal(38,0)) * (CAST(lo_cut AS"
        " decimal(38,0)) + CAST(hi_cut AS decimal(38,0)))) DIV CAST(n AS"
        " decimal(38,0)) AS BIGINT) AS winsor_mean_cents",
        "CAST(lo_cut AS BIGINT) AS lo_cut_cents",
        "CAST(hi_cut AS BIGINT) AS hi_cut_cents",
    ).orderBy("flag")
