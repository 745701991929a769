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

from pyspark.sql import DataFrame, SparkSession
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
