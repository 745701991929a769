"""Unit tests for the Silver label rules against hand-built fixtures
replicating the reference's semantics (silver.py:41-98)."""

from pyspark.sql import functions as F

from github_issues_lakehouse_spark.functions import labels as L


def _apply(spark, label_lists, col_fn):
    df = spark.createDataFrame([(ls,) for ls in label_lists], "labels array<string>")
    return [r[0] for r in df.select(col_fn(F.col("labels"))).collect()]


def test_ticket_kind_first_match_order(spark):
    cases = [
        (["Bug", "Docs"], "defect"),          # bug wins over docs
        (["Docs", "Enhancement"], "docs"),
        (["Enhancement"], "enhancement"),
        (["Usage Question"], "question"),
        (["Needs Triage"], "other"),
        ([], "other"),
    ]
    got = _apply(spark, [c[0] for c in cases], L.ticket_kind)
    assert got == [c[1] for c in cases]


def test_priority_tier_rules(spark):
    rules = L.LakehouseRules()
    rows = [
        (["Bug", "Blocker"], "defect"),
        (["Bug", "Regression"], "defect"),
        (["Bug"], "defect"),
        (["Docs", "Segfault"], "docs"),      # explicit P0 without defect
        (["Docs", "Regression"], "docs"),
        (["Docs"], "docs"),
    ]
    df = spark.createDataFrame(rows, "labels array<string>, kind string")
    got = [
        r[0]
        for r in df.select(
            L.priority_tier(F.col("labels"), F.col("kind"), rules)
        ).collect()
    ]
    assert got == ["P0", "P1", "P2", "P0", "P1", "NA"]


def test_component_resolution_stages(spark):
    cases = [
        (["component: Groupby"], "Groupby"),          # prefix rule
        (["module:IO CSV"], "IO CSV"),                # prefix, no space
        (["AREA: Window"], "Window"),                 # case-insensitive prefix
        (["Performance"], "Performance"),             # allowlist
        (["Bug", "SomethingElse"], "SomethingElse"),  # first non-meta
        (["Bug", "Needs Triage"], "other"),           # all meta
        ([], "other"),
    ]
    got = _apply(spark, [c[0] for c in cases], L.component)
    assert got == [c[1] for c in cases]


def test_resolution_hours(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "2024-01-02 12:00:00"), ("2024-01-01 00:00:00", None)],
        "created string, closed string",
    ).select(
        F.to_timestamp("created").alias("created_at"),
        F.to_timestamp("closed").alias("closed_at"),
    )
    got = [
        r[0]
        for r in df.select(
            L.resolution_hours(F.col("created_at"), F.col("closed_at"))
        ).collect()
    ]
    assert got[0] == 36.0
    assert got[1] is None
