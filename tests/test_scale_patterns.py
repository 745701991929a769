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


def test_plan_token_shards_invariants(spark):
    """Shard assignment is a contiguous prefix partition: shard ids
    are monotone in doc_id, every shard's token total is < budget +
    its largest doc (contiguous fill), and totals conserve."""
    from github_issues_lakehouse_spark.operators.chunking import plan_token_shards

    rows = plan_token_shards(spark, SF_DIR, shard_tokens=512).orderBy("doc_id").collect()
    assert rows
    last_shard = 0
    totals = {}
    for r in rows:
        assert r.shard_id >= last_shard
        last_shard = r.shard_id
        totals[r.shard_id] = totals.get(r.shard_id, 0) + r.n_tokens
    max_doc = max(r.n_tokens for r in rows)
    for sid, tot in totals.items():
        if sid != last_shard:
            assert tot < 512 + max_doc
    assert sum(totals.values()) == sum(r.n_tokens for r in rows)


def test_concurrent_sessions_conservation(spark):
    """Total sessions started across days equals the sessionize
    session count, and every peak is within [1, sessions that day]."""
    from github_issues_lakehouse_spark.operators.relational import sessionize_events
    from github_issues_lakehouse_spark.operators.relational6 import concurrent_sessions

    days = concurrent_sessions(spark, SF_DIR).collect()
    n_sessions = sessionize_events(spark, SF_DIR).count()
    assert sum(r.sessions_started for r in days) == n_sessions
    for r in days:
        assert 1 <= r.peak_concurrency


def test_holdout_split_partition(spark):
    """Splits partition the corpus and are deterministic."""
    from github_issues_lakehouse_spark.operators.scale import holdout_split
    from github_issues_lakehouse_spark.sources.registry import load_table

    a = holdout_split(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(a) == n_docs
    by = {}
    for r in a:
        by[r.split] = by.get(r.split, 0) + 1
    assert set(by) <= {"train", "val", "test"}
    assert by["train"] > by.get("val", 0) and by["train"] > by.get("test", 0)
    b = {(r.doc_id, r.split) for r in holdout_split(spark, SF_DIR).collect()}
    assert b == {(r.doc_id, r.split) for r in a}


def test_weighted_sample_subset_and_monotone(spark):
    """The kept set is a subset of the corpus; raising the quality of
    the acceptance bound can only shrink it (2u < q_micro is monotone
    in q)."""
    from github_issues_lakehouse_spark.operators.text4 import weighted_sample
    from github_issues_lakehouse_spark.sources.registry import load_table

    kept = weighted_sample(spark, SF_DIR).collect()
    all_ids = {r.doc_id for r in load_table(spark, SF_DIR, "documents").select("doc_id").collect()}
    assert {r.doc_id for r in kept} <= all_ids
    assert 0 < len(kept) < len(all_ids)


def test_sql_functions_match_column_impl(spark):
    """SQL scalar functions (Spark 4 SQL UDFs) equal the Column
    implementations across the whole corpus."""
    from github_issues_lakehouse_spark.catalog import (
        register_sql_functions,
        register_views,
    )
    from github_issues_lakehouse_spark.functions.textfns import (
        quality_score,
        whitespace_token_count,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    register_views(spark, SF_DIR)
    register_sql_functions(spark)
    got = {
        r.doc_id: (r.n, round(r.q, 6))
        for r in spark.sql(
            "SELECT doc_id, ws_token_count(text) AS n, doc_quality_score(text) AS q"
            " FROM documents"
        ).collect()
    }
    expect = {
        r.doc_id: (r.n, round(r.q, 6))
        for r in load_table(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            whitespace_token_count(F.col("text")).alias("n"),
            quality_score(F.col("text")).alias("q"),
        )
        .collect()
    }
    assert got == expect


def test_plan_advisor(spark):
    """advise() stays quiet on a clean pushed-down query, flags a
    cartesian product, and flags a row-at-a-time Python UDF."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from github_issues_lakehouse_spark.plans import advise
    from github_issues_lakehouse_spark.sources.registry import load_table

    clean = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_totalprice") > 100
    ).select("o_orderkey")
    assert advise(clean) == []

    a = load_table(spark, SF_DIR, "region")
    b = load_table(spark, SF_DIR, "nation")
    cart = a.crossJoin(b)
    assert any("CartesianProduct" in w for w in advise(cart))

    bad_udf = F.udf(lambda x: x + 1, T.LongType())
    with_udf = load_table(spark, SF_DIR, "orders").select(bad_udf("o_orderkey"))
    assert any("Python UDF" in w for w in advise(with_udf))


def test_partial_topk_bounded_and_lossless(spark):
    """The brute-force scorer's map-side partial top-k (a) returns at
    most k rows per (query, input-partition) — the per-task bound that
    replaces the all-scores-in-one-task window — and (b) the final
    top-k over the pruned set equals the top-k over the raw scores,
    ties included."""
    from pyspark.sql import Window

    from github_issues_lakehouse_spark.operators.similarity import (
        _partial_topk,
        ann_bruteforce_topk,
    )

    k, nq = 5, 8
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id")
    scored = (
        emb.repartition(7)
        .crossJoin(
            emb.filter(F.col("vec_id") < nq).select(F.col("vec_id").alias("q_id"))
        )
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", (F.pmod(F.col("vec_id") * 37, F.lit(100)) / 100.0).alias("cos_sim"))
    )
    n_parts = scored.rdd.getNumPartitions()
    pruned = _partial_topk(scored, ["q_id"], "cos_sim", "vec_id", k)
    # bound: k rows per query per input partition, total <= k * nq * n_parts
    assert pruned.count() <= k * nq * n_parts

    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())

    def topk(df):
        return (
            df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", "rank", "vec_id", "cos_sim")
        )

    exact = topk(scored)
    via_partial = topk(pruned)
    assert exact.exceptAll(via_partial).count() == 0
    assert via_partial.exceptAll(exact).count() == 0

    # end-to-end: the operator itself still yields exactly k per query
    out = ann_bruteforce_topk(spark, SF_DIR, n_queries=nq, k=k)
    per_q = {r.q_id: r.n for r in out.groupBy("q_id").agg(F.count("*").alias("n")).collect()}
    assert all(v == k for v in per_q.values())


def test_fk_rules_exclude_null_child_keys(spark, tmp_path):
    """SQL MATCH SIMPLE / dbt relationship semantics: a NULL foreign
    key vacuously passes; only a non-null key with no parent is an
    orphan."""
    from github_issues_lakehouse_spark.operators.quality_checks import dq_violations

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, 100.0, "1995-01-01", 10), (2, 100.0, "1995-01-01", None), (3, 100.0, "1995-01-01", 99)],
        "o_orderkey long, o_totalprice double, o_orderdate string, o_custkey long",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(1, 5.0, 0.1), (None, 5.0, 0.1), (77, 5.0, 0.1)],
        "l_orderkey long, l_quantity double, l_discount double",
    ).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame([(10,)], "c_custkey long").write.parquet(
        f"{d}/customer.parquet"
    )
    spark.createDataFrame([(1, "hello world")], "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    rows = {
        r.rule: (r.n_checked, r.n_violations)
        for r in dq_violations(spark, d).collect()
    }
    # 3 orders checked: NULL key passes, custkey 99 is the only orphan
    assert rows["o_custkey_fk_customer"] == (3, 1)
    # 3 lineitems checked: NULL key passes, orderkey 77 is the only orphan
    assert rows["l_orderkey_fk_orders"] == (3, 1)


def test_register_views_guard(spark):
    """run_sql never silently clobbers a user's temp view: re-calls
    for the same sf_dir are no-ops, a clashing user view raises, and
    force=True overrides."""
    import pytest

    from github_issues_lakehouse_spark.catalog import register_views, run_sql

    assert run_sql(spark, SF_DIR, "SELECT count(*) AS n FROM orders").collect()[0].n > 0
    # same sf_dir again: fine (idempotent)
    register_views(spark, SF_DIR)

    # a user view with a clashing name must survive
    spark.sql("SELECT 42 AS answer").createOrReplaceTempView("user_orders_view")
    spark.catalog.dropTempView("orders")
    from github_issues_lakehouse_spark.catalog import _ENGINE_VIEWS

    _ENGINE_VIEWS.get(id(spark), {}).pop("orders", None)
    spark.sql("SELECT 1 AS mine").createOrReplaceTempView("orders")
    with pytest.raises(ValueError, match="orders"):
        register_views(spark, SF_DIR)
    assert spark.sql("SELECT mine FROM orders").collect()[0].mine == 1
    # force re-points it to the engine table
    register_views(spark, SF_DIR, force=True)
    assert "o_orderkey" in spark.table("orders").columns


def test_register_query_views_sql_composition(spark):
    """Registry operators exposed as q_* views compose in plain SQL:
    join two marts, aggregate; results match the DataFrame twin."""
    from github_issues_lakehouse_spark.catalog import (
        LAZY_QUERY_VIEWS,
        register_query_views,
    )
    from github_issues_lakehouse_spark.operators.text import lang_id, quality_score

    names = register_query_views(spark, SF_DIR)
    assert names == [f"q_{n}" for n in LAZY_QUERY_VIEWS]
    got = {
        (r.pred_lang, r.avg_q)
        for r in spark.sql(
            "SELECT l.pred_lang, round(avg(q.quality_score), 4) AS avg_q "
            "FROM q_lang_id l JOIN q_quality_score q USING (doc_id) GROUP BY 1"
        ).collect()
    }
    want_df = (
        lang_id(spark, SF_DIR)
        .join(quality_score(spark, SF_DIR), "doc_id")
        .groupBy("pred_lang")
        .agg(F.round(F.avg("quality_score"), 4).alias("avg_q"))
    )
    want = {(r.pred_lang, r.avg_q) for r in want_df.collect()}
    assert got == want

    import pytest as _pytest

    with _pytest.raises(KeyError):
        register_query_views(spark, SF_DIR, names=["no_such_query"])


def test_distributed_rank_matches_window(spark):
    """Two-level rank equals a plain per-partition row_number, with
    each local window task bounded by bucket_width rows."""
    from pyspark.sql import Window

    from github_issues_lakehouse_spark.operators.scale import distributed_rank

    d = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
    got = distributed_rank(d, ["source"], "doc_id", bucket_width=16)
    w = Window.partitionBy("source").orderBy("doc_id")
    want = d.withColumn("rank", F.row_number().over(w).cast("long"))
    assert got.select("doc_id", "source", "rank").exceptAll(
        want.select("doc_id", "source", "rank")
    ).count() == 0
    assert want.exceptAll(got.select("doc_id", "source", "rank")).count() == 0


def test_udtf_lateral_join_matches_column_shingles(spark):
    """Registered table functions work in LATERAL SQL and agree with
    the JVM-side shingles_from Column implementation."""
    from github_issues_lakehouse_spark.catalog import (
        register_query_views,
        register_udtfs,
        register_views,
    )
    from github_issues_lakehouse_spark.operators.dedup import shingles_from
    from github_issues_lakehouse_spark.functions.textfns import norm_tokens

    assert register_udtfs(spark) == ["ngrams", "sliding_chunks"]
    register_views(spark, SF_DIR)
    got = {
        (r.doc_id, r.gram)
        for r in spark.sql(
            "SELECT d.doc_id, g.gram FROM documents d, "
            "LATERAL ngrams(d.text, 3) g WHERE d.doc_id < 5"
        ).collect()
    }
    d = load_table(spark, SF_DIR, "documents").filter(F.col("doc_id") < 5)
    want = {
        (r.doc_id, r.s)
        for r in d.select(
            "doc_id",
            F.explode(shingles_from(norm_tokens(F.col("text")), 3)).alias("s"),
        ).collect()
        # shingles_from emits one partial shingle for docs < n tokens;
        # the UDTF emits none — restrict to full shingles
        if len(r.s.split()) == 3
    }
    assert got == want

    chunks = spark.sql(
        "SELECT * FROM sliding_chunks('a b c d e f', 4, 2)"
    ).collect()
    assert [(r.chunk_idx, r.start_tok, r.chunk) for r in chunks] == [
        (0, 0, "a b c d"), (1, 2, "c d e f"),
    ]
