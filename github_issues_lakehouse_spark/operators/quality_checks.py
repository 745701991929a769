"""Declarative data-quality expectations over the lakehouse tables —
the engine-side analogue of Delta constraints / dbt tests: each rule
is evaluated distributed and lands in one violations mart
(table_name, rule, n_checked, n_violations, passed).

Shapes (all bounded-output):
- Column-predicate rules for one table share ONE scan: conditional
  sums inside a single aggregate, unpivoted with ``stack`` — adding a
  rule adds a counter, not a pass.
- Uniqueness is count(*) vs count(distinct key) in the same
  aggregate (partial-agg friendly; the distinct resolves in the same
  shuffle as a groupBy on the key would).
- Referential integrity is a LEFT ANTI join counted — the orphan
  side shuffles on the key; the parent side broadcasts when small.

The reference pipeline trusts its inputs implicitly (pandas NaN
propagation); at 100 TB a silent FK break or dup key corrupts every
downstream mart, so expectations are a first-class operator here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table


def _viol(c) -> F.Column:
    return F.sum(F.when(c, 1).otherwise(0))


def dq_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violations mart for the engine's standing expectations."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")
    documents = load_table(spark, sf_dir, "documents")

    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        _viol(F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)).alias(
            "o_totalprice_positive"
        ),
        _viol(F.col("o_orderdate").isNull()).alias("o_orderdate_not_null"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey"))).alias(
            "o_orderkey_unique"
        ),
    ).selectExpr(
        "stack(3, 'o_totalprice_positive', o_totalprice_positive, "
        "'o_orderdate_not_null', o_orderdate_not_null, "
        "'o_orderkey_unique', o_orderkey_unique) AS (rule, n_violations)",
        "n AS n_checked",
    ).select(F.lit("orders").alias("table_name"), "rule", "n_checked", "n_violations")

    li = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        _viol(
            F.col("l_quantity").isNull()
            | (F.col("l_quantity") < 1)
            | (F.col("l_quantity") > 50)
        ).alias("l_quantity_range_1_50"),
        _viol(F.col("l_discount").isNull() | (F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "l_discount_unit_interval"
        ),
    ).selectExpr(
        "stack(2, 'l_quantity_range_1_50', l_quantity_range_1_50, "
        "'l_discount_unit_interval', l_discount_unit_interval) AS (rule, n_violations)",
        "n AS n_checked",
    ).select(F.lit("lineitem").alias("table_name"), "rule", "n_checked", "n_violations")

    docs = documents.agg(
        F.count(F.lit(1)).alias("n"),
        _viol(F.col("text").isNull() | (F.trim(F.col("text")) == "")).alias(
            "text_nonempty"
        ),
    ).selectExpr(
        "stack(1, 'text_nonempty', text_nonempty) AS (rule, n_violations)",
        "n AS n_checked",
    ).select(F.lit("documents").alias("table_name"), "rule", "n_checked", "n_violations")

    # Referential integrity: LEFT OUTER join + orphan-count in one
    # aggregate — checked and orphan counts from the same pass, no
    # eager driver action. The parent side is deduplicated to its key
    # so the join can't fan out, and joins on a unique key keep
    # n_checked == child row count. Standard FK semantics (SQL MATCH
    # SIMPLE / dbt relationship tests): a NULL child key vacuously
    # passes — only `child IS NOT NULL AND parent IS NULL` is an
    # orphan; nullability is its own *_not_null rule if needed.
    fk_cust = (
        orders.join(
            customer.select("c_custkey").distinct(),
            orders.o_custkey == F.col("c_custkey"),
            "left_outer",
        )
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            _viol(
                F.col("o_custkey").isNotNull() & F.col("c_custkey").isNull()
            ).alias("n_violations"),
        )
        .select(
            F.lit("orders").alias("table_name"),
            F.lit("o_custkey_fk_customer").alias("rule"),
            "n_checked",
            "n_violations",
        )
    )
    fk_ord = (
        lineitem.join(
            orders.select("o_orderkey").distinct(),
            lineitem.l_orderkey == F.col("o_orderkey"),
            "left_outer",
        )
        .agg(
            F.count(F.lit(1)).alias("n_checked"),
            _viol(
                F.col("l_orderkey").isNotNull() & F.col("o_orderkey").isNull()
            ).alias("n_violations"),
        )
        .select(
            F.lit("lineitem").alias("table_name"),
            F.lit("l_orderkey_fk_orders").alias("rule"),
            "n_checked",
            "n_violations",
        )
    )

    out = o.unionByName(li).unionByName(docs).unionByName(fk_cust).unionByName(fk_ord)
    return out.select(
        "table_name",
        "rule",
        F.col("n_checked").cast("long").alias("n_checked"),
        F.col("n_violations").cast("long").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def classifier_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 curve for the quality classifier against
    the end-to-end corpus gate (training_corpus_filter) as the gold
    keep label — the calibration mart that decides the production
    threshold before a filter ships.

    One scored table (classifier prob + gold flag per doc), exploded
    against a broadcast 9-point threshold grid, one conditional
    aggregate per threshold — the corpus is scanned once regardless
    of grid size. Zero-denominator cells (no predicted / no gold
    positives) yield NULL, mirrored in the oracle.
    """
    from .scale import training_corpus_filter
    from .text3 import quality_classifier

    scored = quality_classifier(spark, sf_dir).select("doc_id", "quality_prob")
    gold = training_corpus_filter(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("gold")
    )
    base = scored.join(gold, "doc_id", "left").select(
        "doc_id", "quality_prob", F.coalesce("gold", F.lit(0)).alias("gold")
    )
    grid = F.explode(F.array(*[F.lit(round(t / 10.0, 1)) for t in range(1, 10)]))
    g = base.select("quality_prob", "gold", grid.alias("threshold"))
    pred = (F.col("quality_prob") >= F.col("threshold")).cast("int")
    agg = g.groupBy("threshold").agg(
        F.sum(pred * F.col("gold")).alias("tp"),
        F.sum(pred * (1 - F.col("gold"))).alias("fp"),
        F.sum((1 - pred) * F.col("gold")).alias("fn"),
    )
    # integer ppm metrics (VERDICT r3 task 7): precision/recall/F1
    # are ratios of small counts — the rounded-double hash-flip class
    from ..functions.exact import ppm_expr as _ppm

    precision = F.when(
        F.col("tp") + F.col("fp") > 0, F.expr(_ppm("tp", "(tp + fp)"))
    )
    recall = F.when(
        F.col("tp") + F.col("fn") > 0, F.expr(_ppm("tp", "(tp + fn)"))
    )
    f1 = F.when(
        (2 * F.col("tp") + F.col("fp") + F.col("fn")) > 0,
        F.expr(_ppm("(2 * tp)", "(2 * tp + fp + fn)")),
    )
    return agg.select(
        F.round("threshold", 1).alias("threshold"),
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        precision.cast("long").alias("precision_ppm"),
        recall.cast("long").alias("recall_ppm"),
        f1.cast("long").alias("f1_ppm"),
    )


def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B109 (r5): referential-integrity audit of every foreign-key
    relationship in the star schema — the DQ gate a warehouse runs
    after each load, one row per FK edge: child rows, distinct child
    keys, orphaned rows (no parent), orphan share in exact ppm.

    Orphans via LEFT ANTI join per edge — semi-join shaped, so at
    100 TB each check is one broadcast (dim parents) or shuffle
    hash anti-join with NO row expansion; counts are map-side
    combinable. All edges computed in one pass per child table scan
    (conditional aggregates over a parent-existence flag would need
    the join anyway, so the anti-join IS the minimal plan).

    Reference parity: generalizes the reference's implicit
    silver-layer FK trust (issues -> labels/components never checked
    there) into an explicit mart.
    """
    from ..functions.exact import ppm_expr as _ppm

    edges = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for child, ck, parent, pk in edges:
        c = load_table(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = load_table(spark, sf_dir, parent).select(F.col(pk).alias("k")).distinct()
        stats = c.agg(
            F.count(F.lit(1)).alias("n_child_rows"),
            F.count_distinct("k").alias("n_child_keys"),
        )
        orphans = c.join(p, "k", "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphan_rows"),
            F.count_distinct("k").alias("n_orphan_keys"),
        )
        row = (
            stats.join(F.broadcast(orphans))
            .selectExpr(
                f"'{child}.{ck} -> {parent}.{pk}' AS fk_edge",
                "CAST(n_child_rows AS BIGINT) AS n_child_rows",
                "CAST(n_child_keys AS BIGINT) AS n_child_keys",
                "CAST(n_orphan_rows AS BIGINT) AS n_orphan_rows",
                "CAST(n_orphan_keys AS BIGINT) AS n_orphan_keys",
                f"CAST({_ppm('n_orphan_rows', 'n_child_rows')} AS BIGINT) AS orphan_ppm",
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("fk_edge")


def k_anonymity_audit(
    spark: SparkSession, sf_dir: str, k: int = 5
) -> DataFrame:
    """B111 (r5): k-anonymity + l-diversity audit of the customer
    table under the quasi-identifier (nation, market segment) — the
    privacy pre-flight before sharing or training on user-adjacent
    data: a row is re-identifiable when its QI equivalence class has
    fewer than k members, and a class is attribute-disclosing when
    the sensitive value (here: account-balance sign band, the
    proxy for a sensitive categorical) shows no diversity.

    One row per QI class: size, below-k flag, distinct sensitive
    values (l), plus class share in exact ppm — the table a privacy
    reviewer reads top-to-bottom (smallest classes first: rank by
    (size, class) is deterministic).

    Plan/scale: one groupBy on the QI columns with a count-distinct
    on the sensitive band; class grain is |nations| x |segments| —
    bounded. The fact scan happens exactly once.
    """
    from ..functions.exact import ppm_expr as _ppm

    c = load_table(spark, sf_dir, "customer")
    sens = (
        F.when(F.col("c_acctbal") < 0, F.lit("neg"))
        .when(F.col("c_acctbal") < 5000, F.lit("low"))
        .otherwise(F.lit("high"))
    )
    classes = (
        c.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            sens.alias("sens"),
        )
        .groupBy("nationkey", "mktsegment")
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct("sens").alias("l_diversity"),
        )
    )
    total = classes.agg(F.sum("class_size").alias("n_total"))
    return (
        classes.join(F.broadcast(total))
        .selectExpr(
            "CAST(nationkey AS BIGINT) AS nationkey",
            "mktsegment",
            "CAST(class_size AS BIGINT) AS class_size",
            f"CAST(CASE WHEN class_size < {k} THEN 1 ELSE 0 END AS BIGINT) AS below_k",
            "CAST(l_diversity AS BIGINT) AS l_diversity",
            f"CAST({_ppm('class_size', 'n_total')} AS BIGINT) AS class_share_ppm",
        )
        .orderBy("class_size", "nationkey", "mktsegment")
    )


def quality_temporal_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C118 (r5): per-source quality drift over ingest order — the
    exact two-sample KS statistic between the quality-score
    distributions of each source's EARLY half and LATE half (split at
    the source's doc_id midpoint, the standing ingest-order proxy).
    The monitoring question behind it: did this feed's quality shift
    since we started pulling it? A large KS on a source is the
    earliest actionable crawl-rot / template-change signal.

    Quality scores are FROZEN to integer e6 units (one round of the
    shared quality_score expression — the same determinism class the
    C11 oracle already proves), then the ECDFs are exact integer ppm
    at (source, value) grain; KS is the max gap per source. Value
    grain is bounded by the score formula's resolution.

    Plan/scale: one scan computes scores + the per-source id midpoint
    (broadcast back), one value-grain aggregate, per-source windows
    over value rows.
    """
    from pyspark.sql import Window

    from ..functions.exact import ppm_expr as _ppm
    from ..functions.textfns import quality_score

    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.round(quality_score(F.col("text")) * 1_000_000).cast("long").alias("q_e6")
    )
    mid = d.groupBy("source").agg(
        F.expr("CAST((min(doc_id) + max(doc_id)) DIV 2 AS BIGINT)").alias("mid")
    )
    halves = d.join(F.broadcast(mid), "source").select(
        "source", "q_e6", (F.col("doc_id") <= F.col("mid")).alias("is_early")
    )
    vals = halves.groupBy("source", "q_e6").agg(
        F.sum(F.when(F.col("is_early"), 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("is_early"), 0).otherwise(1)).alias("cb"),
    )
    tot = vals.groupBy("source").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("q_e6")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        vals.withColumn("cum_ca", F.sum("ca").over(w))
        .withColumn("cum_cb", F.sum("cb").over(w))
        .join(tot, "source")
    )
    gaps = cum.select(
        "source",
        "na",
        "nb",
        F.abs(F.expr(_ppm("cum_ca", "na")) - F.expr(_ppm("cum_cb", "nb"))).alias("gap"),
    )
    return (
        gaps.groupBy("source", "na", "nb")
        .agg(F.max("gap").alias("ks_ppm"))
        .selectExpr(
            "source",
            "CAST(na AS BIGINT) AS n_early",
            "CAST(nb AS BIGINT) AS n_late",
            "CAST(ks_ppm AS BIGINT) AS ks_ppm",
        )
        .orderBy("source")
    )


def detector_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C122 (r5): Cohen's kappa between the two independent quality
    detectors (the Gopher rule conjunction and the linear
    classifier), per source — the CHANCE-CORRECTED agreement number
    that says whether the cheap gate can stand in for the expensive
    one. `detector_agreement` answers this for the near-dup pair
    finders by raw overlap; raw agreement is misleading for quality
    gates because both pass most documents — kappa subtracts the
    agreement two independent coins with the same marginals would
    get.

    Exact integers end to end: with the 2x2 contingency counts
    (n11/n10/n01/n00, n = their sum) kappa = (n*agree - A) /
    (n^2 - A) where agree = n11 + n00 and A = (n11+n10)(n11+n01) +
    (n01+n00)(n10+n00) — all BIGINT; kappa_e6 renders as
    sign(num) * ppm(|num|, den) so both engines truncate toward zero
    identically. Exactness contract: |num| <= n^2 must stay under
    ppm's ~9.2e12 part bound, i.e. n <= ~3e6 docs per source — add a
    source-hash split above that.

    Plan/scale: both detectors are single-scan Column pipelines; the
    join is doc_id-keyed on their narrow (doc_id, keep) outputs, and
    everything after the (source, flags) aggregate runs at the
    source grain.
    """
    from ..functions.exact import ppm_expr as _ppm
    from .text3 import quality_classifier
    from .text5 import gopher_quality_rules

    g = gopher_quality_rules(spark, sf_dir).select(
        "doc_id", "source", F.col("keep").alias("keep_g")
    )
    q = quality_classifier(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep_q")
    )
    cells = (
        g.join(q, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("keep_g") & F.col("keep_q"), 1).otherwise(0)).alias("n11"),
            F.sum(F.when(F.col("keep_g") & ~F.col("keep_q"), 1).otherwise(0)).alias("n10"),
            F.sum(F.when(~F.col("keep_g") & F.col("keep_q"), 1).otherwise(0)).alias("n01"),
            F.sum(F.when(~F.col("keep_g") & ~F.col("keep_q"), 1).otherwise(0)).alias("n00"),
        )
    )
    num = "(CAST(n_docs AS BIGINT) * (n11 + n00) - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))"
    den = "(CAST(n_docs AS BIGINT) * n_docs - ((n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)))"
    return cells.selectExpr(
        "source",
        "CAST(n_docs AS BIGINT) AS n_docs",
        "CAST(n11 AS BIGINT) AS n_both_keep",
        "CAST(n10 AS BIGINT) AS n_gopher_only",
        "CAST(n01 AS BIGINT) AS n_classifier_only",
        "CAST(n00 AS BIGINT) AS n_both_drop",
        f"CAST({_ppm('(n11 + n00)', 'n_docs')} AS BIGINT) AS agree_ppm",
        f"CAST(CASE WHEN {num} >= 0 THEN 1 ELSE -1 END"
        f" * CAST({_ppm(f'abs({num})', den)} AS BIGINT) AS BIGINT) AS kappa_e6",
    ).orderBy("source")


def classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C125 (r5): reliability diagram + Expected-Calibration-Error
    terms for the quality classifier against the end-to-end corpus
    gate — the calibration mart that tells you whether quality_prob
    MEANS anything as a probability (a classifier can have a great
    PR curve and still be badly calibrated; threshold transfer and
    mixture weighting both assume calibrated scores).

    Scores are FROZEN to e6 integers (the quality_temporal_drift
    discipline), binned into 10 equal-width probability bins
    (p_e6 DIV 1e5, clamped so p == 1.0 lands in bin 9). Per bin:
    n docs, mean CONFIDENCE (sum_p_e6 DIV n — exact floor), actual
    gold-keep rate in exact ppm, the |confidence − accuracy| gap, and
    the ECE numerator term n * gap (BIGINT) so ECE = sum(terms) /
    (N * 1e6) is reader-assembled from exact integers.

    Plan/scale: both inputs are single-scan Column pipelines over
    documents; one hash aggregate on the 10-value bin key — bounded
    output, partial-agg friendly, no window.
    """
    from ..functions.exact import ppm_expr as _ppm_e

    from .scale import training_corpus_filter
    from .text3 import quality_classifier

    scored = quality_classifier(spark, sf_dir).select(
        "doc_id",
        F.round(F.col("quality_prob") * 1_000_000).cast("long").alias("p_e6"),
    )
    gold = training_corpus_filter(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("gold")
    )
    base = scored.join(gold, "doc_id", "left").select(
        "p_e6", F.coalesce("gold", F.lit(0)).alias("gold")
    )
    bins = base.groupBy(
        F.least(F.expr("p_e6 DIV 100000"), F.lit(9)).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("p_e6").cast("long").alias("sum_p_e6"),
        F.sum("gold").cast("long").alias("n_gold"),
    )
    return bins.selectExpr(
        "bin",
        "n_docs",
        "CAST(sum_p_e6 DIV n_docs AS BIGINT) AS conf_e6",
        f"CAST({_ppm_e('n_gold', 'n_docs')} AS BIGINT) AS acc_ppm",
        f"CAST(abs(sum_p_e6 DIV n_docs - ({_ppm_e('n_gold', 'n_docs')})) AS BIGINT)"
        " AS gap_e6",
        f"CAST(n_docs * abs(sum_p_e6 DIV n_docs - ({_ppm_e('n_gold', 'n_docs')}))"
        " AS BIGINT) AS ece_term",
    ).orderBy("bin")


def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B127 (r5): approximate-functional-dependency profiling
    (Metanome/TANE-style, public) — for each CANDIDATE rule lhs ->
    rhs, how close the data comes to satisfying it: a lhs group
    violates when it sees more than one rhs value, and the row-level
    violation mass is group_size - majority_rhs_count (the minimum
    number of rows you'd have to fix). The discovery half of the
    dq_violations story: B60 checks rules you declared; this measures
    rules you SUSPECT (schema-design, normalization, and
    silent-corruption review).

    Candidates audited (fixed, schema-derived): customer nation ->
    market segment (expected to fail hard — a control), orders
    custkey -> priority (does a customer always use one priority),
    lineitem partkey -> supplier, lineitem orderkey -> returnflag.

    Exact integers: per rule one (lhs, rhs) count aggregate, majority
    via max-count per lhs, violation ppm over rows. Each rule is one
    partial-agg-friendly pass over its table; outputs are 4 rows.
    """
    from ..functions.exact import ppm_expr as _ppm

    def audit(df: DataFrame, rule: str, lhs: str, rhs: str) -> DataFrame:
        pairs = df.groupBy(
            F.col(lhs).alias("l"), F.col(rhs).alias("r")
        ).agg(F.count(F.lit(1)).alias("n"))
        per_lhs = pairs.groupBy("l").agg(
            F.sum("n").alias("rows"),
            F.max("n").alias("majority"),
            F.count(F.lit(1)).alias("n_rhs"),
        )
        return per_lhs.agg(
            F.lit(rule).alias("rule"),
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("n_rhs") > 1, 1).otherwise(0))
            .cast("long")
            .alias("violating_groups"),
            F.sum("rows").cast("long").alias("n_rows"),
            F.sum(F.col("rows") - F.col("majority")).cast("long").alias("bad_rows"),
        ).selectExpr(
            "rule",
            "n_groups",
            "violating_groups",
            "n_rows",
            "bad_rows",
            f"CAST({_ppm('bad_rows', 'n_rows')} AS BIGINT) AS violation_ppm",
        )

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    out = audit(c, "c_nationkey->c_mktsegment", "c_nationkey", "c_mktsegment")
    for df, rule, lhs, rhs in (
        (o, "o_custkey->o_orderpriority", "o_custkey", "o_orderpriority"),
        (li, "l_partkey->l_suppkey", "l_partkey", "l_suppkey"),
        (li, "l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"),
    ):
        out = out.unionByName(audit(df, rule, lhs, rhs))
    return out.orderBy("rule")


def quality_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C131 (r5): per-source quantile-transform table for the quality
    score — raw quality scores are NOT comparable across sources (a
    0.8 from a clean feed and a 0.8 from a noisy crawl mean different
    things; C118 measures the drift, C125 the calibration), so
    cross-source selection should threshold on the WITHIN-SOURCE rank
    instead. This emits the decile map you broadcast to do that:
    per (source, decile): doc count, the decile's raw-score
    boundaries, and its mean raw score — i.e. the lookup that sends a
    raw score to its source-relative quantile.

    Exact: scores e6-frozen (the C118 discipline), decile =
    min(midrank-free floor rank, 9) via value-grain cumulative counts
    (2*cb + c midranks are unnecessary — the decile of a tied value
    block is decided by its FIRST row, cum-before, so ties land in
    one decile deterministically), bounds and means in exact BIGINT.

    Plan/scale: one corpus scan to (source, q_e6) value grain, one
    per-source window at value grain, 10 rows per source out.
    """
    from ..functions.textfns import quality_score

    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.round(quality_score(F.col("text")) * 1_000_000).cast("long").alias("q_e6"),
    )
    vals = d.groupBy("source", "q_e6").agg(F.count(F.lit(1)).alias("c"))
    wv = (
        Window.partitionBy("source")
        .orderBy("q_e6")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tot = vals.groupBy("source").agg(F.sum("c").alias("n_src"))
    cum = vals.withColumn(
        "cb", F.coalesce(F.sum("c").over(wv), F.lit(0))
    ).join(tot, "source")
    # decile of the value block = decile of its first row (ties stay
    # together); exact integer: floor(10 * cb / n) clamped to 9
    dec = cum.withColumn(
        "decile",
        F.least(F.expr("CAST(10 * cb DIV n_src AS BIGINT)"), F.lit(9)).cast("long"),
    )
    D38 = "decimal(38,0)"
    return (
        dec.groupBy("source", "decile")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.min("q_e6").alias("q_lo_e6"),
            F.max("q_e6").alias("q_hi_e6"),
            F.expr(
                "CAST(CAST(sum(CAST(q_e6 AS decimal(38,0)) * CAST(c AS decimal(38,0)))"
                " AS decimal(38,0)) DIV CAST(sum(c) AS decimal(38,0)) AS BIGINT)"
            ).alias("mean_q_e6"),
        )
        .orderBy("source", "decile")
    )


def order_line_recompute(li: DataFrame) -> DataFrame:
    """Per-order invoice recompute state (l_orderkey, recompute_e4)
    in rounding-free cents-e4 integers. ADDITIVE over line subsets —
    merging two states is a sum on the key — which makes it the D30
    streaming fold: lines can arrive across micro-batches and the
    state converges to the full-corpus recompute."""
    line_e4 = (
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        * (F.lit(100) + F.round(F.col("l_tax") * 100).cast("long"))
    )
    D38 = "decimal(38,0)"
    return li.groupBy("l_orderkey").agg(
        F.sum(line_e4.cast(D38)).cast(D38).cast("long").alias("recompute_e4")
    )


def reconciliation_finalize(spark, orders: DataFrame, state: DataFrame) -> DataFrame:
    """Assemble the B128 mart from the (additive) per-order recompute
    state and the orders header table — the read-time half of D30."""
    from ..functions.exact import ppm_expr as _ppm

    o = orders.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("priority"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias(
            "header_cents"
        ),
    )
    j = o.join(state, o.o_orderkey == state.l_orderkey, "left").select(
        "priority",
        "header_cents",
        F.coalesce("recompute_e4", F.lit(0)).alias("recompute_e4"),
    )
    gap = F.col("header_cents") * 10000 - F.col("recompute_e4")
    scored = j.select(
        "priority",
        F.abs(gap).alias("abs_gap_e4"),
        (gap == 0).cast("int").alias("exact"),
        (F.abs(gap) * 100 <= F.col("header_cents") * 10000)
        .cast("int")
        .alias("within_1pct"),
    )
    return scored.groupBy("priority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("exact").cast("long").alias("n_exact"),
        F.sum("within_1pct").cast("long").alias("n_within_1pct"),
        F.expr(
            "CAST(CAST(sum(CAST(abs_gap_e4 AS decimal(38,0))) AS decimal(38,0))"
            " DIV (CAST(count(*) AS decimal(38,0)) * 10000) AS BIGINT)"
        ).alias("mean_abs_gap_cents"),
        F.expr("CAST(max(abs_gap_e4) DIV 10000 AS BIGINT)").alias(
            "max_abs_gap_cents"
        ),
    ).selectExpr(
        "priority",
        "n_orders",
        "n_exact",
        "n_within_1pct",
        f"CAST({_ppm('n_within_1pct', 'n_orders')} AS BIGINT) AS within_1pct_ppm",
        "mean_abs_gap_cents",
        "max_abs_gap_cents",
    ).orderBy("priority")


def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B128 (r5): cross-table NUMERIC reconciliation audit — does the
    order header total equal the invoice math over its lines
    (sum of extendedprice x (1 - discount) x (1 + tax))? The
    fact-to-fact consistency check every finance-adjacent warehouse
    runs (B60 checks per-row predicates, referential_integrity_audit
    checks keys; this checks MONEY), and on this synthetic corpus it
    correctly reports that the generator does NOT enforce the
    invariant — which is exactly what the audit is for.

    All-integer, rounding-free algebra: discounts/taxes are exact 2dp
    multiples, so each line contributes ext_cents*(100-disc_e2)*
    (100+tax_e2) in cents-e4 units (exact BIGINT, ~1e13 per line,
    DECIMAL(38,0) order sums) against header_cents*1e4 — no float
    product or per-line rounding anywhere, hence engine-invariant
    without tolerance.

    Output per order priority: order count, exactly-matched count,
    count within 1% of the header total, mean and max absolute gap
    in whole cents.

    Plan/scale: one lineitem aggregate on l_orderkey (the natural
    join key — co-partitioned with the orders join), one bounded
    per-priority rollup. Partial-agg friendly throughout.
    """
    return reconciliation_finalize(
        spark,
        load_table(spark, sf_dir, "orders"),
        order_line_recompute(load_table(spark, sf_dir, "lineitem")),
    )


def _row_sig(prefix: str, *cols: F.Column) -> F.Column:
    """60-bit row signature: conv(md5 prefix) of the canonical
    pipe-joined row string — the per-row term of the XOR checksum."""
    s = F.concat_ws("|", F.lit(prefix), *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def table_checksum_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B129 (r5): content-checksum manifest across the core tables —
    one (n_rows, XOR-of-row-signatures) line per table, the
    cross-environment equality check a migration / replication /
    backup-restore signs off against (the operational cousin of what
    Iceberg manifests give you): two environments whose manifests
    match row-count AND checksum hold the same row SET without either
    side shipping data to the other.

    XOR of 60-bit md5 row signatures: order-insensitive, associative,
    self-inverse (so it never overflows and merges trivially — the
    D31 streaming fold), and collision-bounded by the 60-bit space.
    Canonical row strings pin the checked content explicitly: keys
    plus the business-critical value columns (money in cents, dates
    as ISO strings), so a silent price restatement flips the
    checksum while a cosmetic column addition does not.

    Plan/scale: one scan + one partial-agg-friendly XOR aggregate per
    table; 4-row output.
    """
    o = load_table(spark, sf_dir, "orders").select(
        _row_sig(
            "o",
            F.col("o_orderkey"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
            F.to_date("o_orderdate"),
        ).alias("sig")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        _row_sig(
            "l",
            F.col("l_orderkey"),
            F.col("l_linenumber"),
            F.col("l_partkey"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"),
        ).alias("sig")
    )
    c = load_table(spark, sf_dir, "customer").select(
        _row_sig(
            "c", F.col("c_custkey"), F.col("c_nationkey"), F.col("c_mktsegment")
        ).alias("sig")
    )
    d = load_table(spark, sf_dir, "documents").select(
        _row_sig("d", F.col("doc_id"), F.md5(F.col("text"))).alias("sig")
    )
    out = None
    for name, t in (("orders", o), ("lineitem", li), ("customer", c), ("documents", d)):
        row = t.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("bit_xor(sig)").cast("long").alias("xor_checksum"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


def quality_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C139 (r6): decile lift/gains table for the heuristic quality
    score (C11) against the end-to-end corpus gate as gold — the
    third standard scorer readout beside the PR curve (C89) and
    calibration (C125): rank docs by score, cut into population
    deciles, and ask how concentrated the gold-keep mass is in the
    top deciles. Decile 1 at lift 3 means "the top 10% by score holds
    3x its share of keepable docs" — the number that justifies
    score-ranked data selection budgets. (The linear classifier's
    probability saturates at 0 on 92% of this corpus — a one-decile
    degenerate table — so the lift table scores the CONTINUOUS
    heuristic; swap any scorer in behind the same contract.)

    Determinism: scores freeze to e6 BIGINTs; deciles cut at VALUE
    grain via cumulative-docs-before (a tie block lands wholly in its
    first row's decile — the quality_rank_normalize convention, no
    row_number tie lottery). Lift is quantized integer algebra:
    rate_ppm = ppm(gold_d, n_d), lift_e6 = rate_ppm * 1e6 DIV
    overall_ppm — operands <= 1e12 at ANY corpus size. The gains
    column is the cumulative gold capture by decile in exact ppm.

    Plan/scale: score/gold build on the existing operators; the
    cumulative-before runs through the two-level band/carry prefix
    sum over the score-value grain, which is bounded by construction
    (score_e6 has <= 1e6+1 distinct values; band_div 16384 caps any
    single window at 16384 rows and the carry at ~62). Decile-grain
    work is 10 rows.
    """
    from ..functions.exact import ppm_expr as _ppm
    from .scale import training_corpus_filter
    from .statistics import _banded_cum
    from .text import quality_score

    scored = quality_score(spark, sf_dir).select(
        "doc_id", F.round(F.col("quality_score") * 1e6).cast("long").alias("score_e6")
    )
    gold = training_corpus_filter(spark, sf_dir).select(
        "doc_id", F.lit(1).alias("gold")
    )
    base = scored.join(gold, "doc_id", "left").select(
        "score_e6", F.coalesce("gold", F.lit(0)).alias("gold")
    )
    # collapse to value grain ONCE and pin it (localCheckpoint): the
    # scorer+gate subtree is the only corpus-scale work, and without
    # the pin every downstream aggregate (cum, band totals, corpus
    # totals) would re-run it — measured 24s -> ~8s at sf0.1
    vg = (
        base.groupBy("score_e6")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("gold").cast("long").alias("g"),
        )
        .withColumn("neg_score", -F.col("score_e6"))
        .localCheckpoint(eager=True)
    )
    cum = _banded_cum(vg, "neg_score", ["n"], band_div=16384)
    # corpus totals from the pinned value grain — sum over groups ==
    # sum over rows, no second corpus scan
    tot = vg.agg(
        F.sum("n").cast("long").alias("total_docs"),
        F.sum("g").cast("long").alias("total_gold"),
    )
    with_dec = cum.crossJoin(F.broadcast(tot)).selectExpr(
        "score_e6",
        "n",
        "g",
        "least((cum_n - n) * 10 DIV total_docs, 9) + 1 AS decile",
        "total_docs",
        "total_gold",
    )
    per = with_dec.groupBy("decile", "total_docs", "total_gold").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.sum("g").cast("long").alias("n_gold"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.withColumn("cum_gold", F.sum("n_gold").over(w).cast("long"))
        .selectExpr(
            "CAST(decile AS BIGINT) AS decile",
            "n_docs",
            "n_gold",
            f"CAST({_ppm('n_gold', 'n_docs')} AS BIGINT) AS gold_rate_ppm",
            f"CAST(({_ppm('n_gold', 'n_docs')}) * 1000000"
            f" DIV ({_ppm('total_gold', 'total_docs')}) AS BIGINT) AS lift_e6",
            "cum_gold",
            f"CAST({_ppm('cum_gold', 'total_gold')} AS BIGINT) AS capture_ppm",
        )
        .orderBy("decile")
    )
