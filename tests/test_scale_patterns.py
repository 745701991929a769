"""Scale-pattern behaviors: salted joins match plain joins, bucketed
tables join without exchanges (SURVEY.md §6)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from github_issues_lakehouse_spark.operators.scale import salted_join
from github_issues_lakehouse_spark.plans.introspect import _plan_str
from github_issues_lakehouse_spark.sinks import write_bucketed
from github_issues_lakehouse_spark.sources.registry import load_table

from .conftest import SF_DIR


def test_salted_join_matches_plain_join(spark):
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    c = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    plain = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_mktsegment")
    salted = salted_join(o, c, "o_custkey", "c_custkey", n_salts=4).select(
        "o_orderkey", "c_mktsegment"
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_outer_preserves_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (99, "z")], "k int, v string")
    b = spark.createDataFrame([(1, 10), (2, 20)], "k2 int, w int")
    out = salted_join(a, b, "k", "k2", n_salts=4, how="left")
    rows = {(r.k, r.w) for r in out.collect()}
    assert rows == {(1, 10), (2, 20), (99, None)}


@pytest.fixture()
def warehouse(spark):
    d = tempfile.mkdtemp(prefix="bucket_test_")
    yield d
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes_partitions(spark):
    """A date-partitioned layout + a date filter must show up as
    PartitionFilters on the scan (only matching directories read) —
    the access pattern that makes month-range queries at 100 TB read
    1/36th of the table instead of all of it."""
    import tempfile

    from github_issues_lakehouse_spark.plans.introspect import _plan_str
    from github_issues_lakehouse_spark.sinks import write_partitioned

    d = tempfile.mkdtemp(prefix="part_prune_")
    try:
        e = load_table(spark, SF_DIR, "events").withColumn(
            "day", F.to_date("ts")
        )
        write_partitioned(e, f"{d}/events", partition_by=["day"])
        back = spark.read.parquet(f"{d}/events")
        one_day = back.select("day").distinct().orderBy("day").first().day
        q = back.filter(F.col("day") == F.lit(one_day)).groupBy("event_type").count()
        plan = _plan_str(q)
        assert "PartitionFilters: [" in plan and "isnotnull(day" in plan, plan
        n = q.count()
        assert n > 0
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_csv_reader_roundtrip(spark):
    import tempfile

    from github_issues_lakehouse_spark.sources.readers import read_csv

    d = tempfile.mkdtemp(prefix="csv_test_")
    try:
        src = load_table(spark, SF_DIR, "nation")
        src.coalesce(1).write.mode("overwrite").option("header", "true").csv(f"{d}/nation")
        back = read_csv(spark, f"{d}/nation")
        assert back.count() == src.count()
        assert set(back.columns) == set(src.columns)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse):
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(o, "b_orders", ["o_orderkey"], num_buckets=8, path=f"{warehouse}/o")
    write_bucketed(li, "b_lineitem", ["l_orderkey"], num_buckets=8, path=f"{warehouse}/l")

    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy("o_orderkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    # force the sort-merge path so the assertion targets the shuffle
    # (with broadcast on, the small side would broadcast instead)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan_str(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, "bucketed co-located join must not shuffle:\n" + plan

    # same rows as the plain-parquet join
    plain = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    assert joined.exceptAll(plain).count() == 0
    assert plain.exceptAll(joined).count() == 0


def test_run_sql_surface(spark):
    """catalog.run_sql: plain SQL against registered views equals the
    DataFrame operator (same Catalyst plans underneath)."""
    from github_issues_lakehouse_spark.catalog import run_sql
    from github_issues_lakehouse_spark.operators.relational import q1_pricing_summary

    got = run_sql(
        spark,
        SF_DIR,
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n
        FROM lineitem WHERE l_shipdate <= timestamp'1998-09-02 00:00:00'
        GROUP BY 1, 2
        """,
    ).collect()
    expect = {
        (r.l_returnflag, r.l_linestatus): r.count_order
        for r in q1_pricing_summary(spark, SF_DIR).collect()
    }
    assert len(got) == len(expect)
    for r in got:
        assert expect[(r.l_returnflag, r.l_linestatus)] == r.n


def test_run_sql_marts(spark):
    """Mart views are queryable lazily and match the operator path."""
    from github_issues_lakehouse_spark.catalog import run_sql
    from github_issues_lakehouse_spark.queries import q_gold_global

    got = run_sql(
        spark, SF_DIR, "SELECT count(*) AS n FROM kpi_monthly_global", marts=True
    ).collect()[0].n
    assert got == q_gold_global(spark, SF_DIR).count()
