"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``github_issues_lakehouse_spark.queries`` — the query
registry holds one entry per operator in SURVEY.md §2 plus the DuckDB
oracle SQL twins used by the driver's correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from github_issues_lakehouse_spark import queries as Q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the reference's end-product — the global
    monthly KPI mart — computed on sf0.001."""
    return Q.q_gold_global(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql()
