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
