"""SQL surface: register the lakehouse tables (and derived marts) as
temp views so users run plain ``spark.sql`` against the engine — the
same entry point the reference's users get from a notebook, but
backed by distributed scans instead of a pandas frame.

Views are lazy: registering them costs nothing; Catalyst plans each
SQL query against the parquet scans directly (pushdown/pruning apply
exactly as in the DataFrame API — same plans, same scale behavior).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.registry import TABLES, load_table


def register_views(spark: SparkSession, sf_dir: str, *, marts: bool = False) -> list[str]:
    """Register every base table as a temp view; with ``marts=True``
    also the derived silver/gold marts (still lazy plans — computed
    only when queried). Returns the registered view names."""
    names = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    if marts:
        from .operators.gold import kpi_monthly_component_tier, kpi_monthly_global
        from .operators.silver import silver_issues

        s = silver_issues(spark, sf_dir)
        s.createOrReplaceTempView("silver_issues")
        comp = kpi_monthly_component_tier(s)
        comp.createOrReplaceTempView("kpi_monthly_component_tier")
        kpi_monthly_global(comp).createOrReplaceTempView("kpi_monthly_global")
        names += ["silver_issues", "kpi_monthly_component_tier", "kpi_monthly_global"]
    return names


def run_sql(spark: SparkSession, sf_dir: str, sql: str, *, marts: bool = False) -> DataFrame:
    """One-call SQL entry point: register views, return the lazy
    DataFrame for ``sql``."""
    register_views(spark, sf_dir, marts=marts)
    return spark.sql(sql)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Expose the engine's core text functions as Spark SQL scalar
    functions (Spark 4 `CREATE TEMPORARY FUNCTION ... RETURN` SQL
    UDFs): pure SQL macros, inlined by Catalyst into the calling
    plan — no Python boundary, full codegen, identical semantics to
    the Column implementations in functions/textfns.py (tested
    equal). With ``register_views`` this makes the text pipeline
    fully drivable from SQL alone.
    """
    from .functions.textfns import STOPWORDS_EN

    stop = ", ".join(f"'{s}'" for s in STOPWORDS_EN)
    defs = {
        "norm_text": "(t STRING) RETURNS STRING RETURN "
        "trim(regexp_replace(lower(t), '\\\\s+', ' '))",
        "ws_tokens": "(t STRING) RETURNS ARRAY<STRING> RETURN "
        "split(norm_text(t), ' ')",
        "ws_token_count": "(t STRING) RETURNS INT RETURN size(ws_tokens(t))",
        "punct_ratio_f": "(t STRING) RETURNS DOUBLE RETURN "
        "length(regexp_replace(t, '[^\\\\.\\\\,\\\;\\\\:\\\\!\\\\?]', ''))"
        " / greatest(length(t), 1)",
        "stopword_ratio_f": f"(t STRING) RETURNS DOUBLE RETURN "
        f"size(filter(ws_tokens(t), x -> array_contains(array({stop}), x)))"
        f" / greatest(size(ws_tokens(t)), 1)",
        "repetition_ratio_f": "(t STRING) RETURNS DOUBLE RETURN "
        "1.0 - size(array_distinct(ws_tokens(t))) / greatest(size(ws_tokens(t)), 1)",
        "doc_quality_score": "(t STRING) RETURNS DOUBLE RETURN "
        "(CASE WHEN ws_token_count(t) BETWEEN 10 AND 10000 THEN 1.0 ELSE 0.3 END) * 0.3"
        " + (CASE WHEN stopword_ratio_f(t) >= 0.05 THEN 1.0 ELSE 0.5 END) * 0.2"
        " + (1.0 - repetition_ratio_f(t)) * 0.3"
        " + (CASE WHEN punct_ratio_f(t) <= 0.2 THEN 1.0 ELSE 0.6 END) * 0.2",
    }
    for name, body in defs.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{body}")
    return list(defs)
