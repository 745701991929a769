"""Round-4 wave: exact-integer rewrites of the r3 driver-hash FAILs,
the reference-README SLA/stability mart, the bounded LSH recall
audit, and the shared ppm fixed-point helpers."""

from __future__ import annotations

import pytest  # noqa: F401
from pyspark.sql import functions as F

from github_issues_lakehouse_spark import queries as Q
from tests.conftest import SF_DIR


# ------------------------------------------------------- exact helpers


def test_ppm_expr_matches_python_floor(spark):
    """ppm_expr == floor(p * 1e6 / t) exactly, including totals far
    beyond the naive p*1e6 overflow bound (~9.2e12)."""
    from github_issues_lakehouse_spark.functions.exact import ppm_expr

    cases = [
        (0, 1),
        (1, 3),
        (2, 3),
        (999_999, 1_000_000),
        (123_456_789, 987_654_321),
        (7, 9_000_000_000_000_000),  # t near the 9.2e15 design bound
        (4_500_000_000_000_000, 9_000_000_000_000_000),
        (8_999_999_999_999_999, 9_000_000_000_000_000),
    ]
    df = spark.createDataFrame(cases, "p long, t long").selectExpr(
        "p", "t", f"CAST({ppm_expr('p', 't')} AS BIGINT) AS ppm"
    )
    for r in df.collect():
        assert r.ppm == (r.p * 1_000_000) // r.t, (r.p, r.t)


def test_ppm_sql_matches_spark_spelling(spark, duck):
    """The DuckDB spelling and the Spark spelling are the same
    function — the oracle-parity contract of functions/exact.py."""
    from github_issues_lakehouse_spark.functions.exact import ppm_expr, ppm_sql

    cases = [(1, 7), (5, 7), (123, 999_999_999_999), (10**15 - 1, 9 * 10**15)]
    for p, t in cases:
        s = (
            spark.range(1)
            .selectExpr(f"CAST({ppm_expr(str(p), str(t))} AS BIGINT) AS v")
            .collect()[0]
            .v
        )
        d = duck.execute(
            f"SELECT CAST({ppm_sql(str(p), str(t))} AS BIGINT)"
        ).fetchone()[0]
        assert s == d == (p * 1_000_000) // t


# ------------------------------------------- exact discrete quantiles


def test_disc_quintile_thresholds_match_bruteforce(spark):
    """Two-level percentile_disc == brute-force 'min v with
    5*cum(v) >= k*N' on a small exact dataset, for several bucket
    widths (bucketing must not change the answer)."""
    from github_issues_lakehouse_spark.operators.relational6 import (
        disc_quintile_thresholds,
    )

    vals = [1, 1, 2, 2, 3, 5, 8, 13, 21, 34, 55, 55, 55, 89, 144]
    df = spark.createDataFrame([(v,) for v in vals], "m long")
    n = len(vals)
    svals = sorted(vals)

    def brute(k):
        cum = 0
        seen = {}
        for v in svals:
            cum += 1
            seen[v] = cum  # ties: cum at LAST occurrence = #{<= v}
        return min(v for v in seen if 5 * seen[v] >= k * n)

    expected = {k: brute(k) for k in (1, 2, 3, 4)}
    for width in (1, 7, 1000):
        row = disc_quintile_thresholds(df, "m", width, "t").collect()[0]
        got = {1: row.t20, 2: row.t40, 3: row.t60, 4: row.t80}
        assert got == expected, f"width={width}: {got} != {expected}"


def test_customer_rfm_scores_match_cume_identity(spark):
    """Threshold-based scoring equals the direct 5*cum//N identity the
    oracle uses — on the real table, via an independent window
    recomputation."""
    from pyspark.sql import Window

    from github_issues_lakehouse_spark.operators.relational6 import customer_rfm

    out = customer_rfm(spark, SF_DIR)
    w = Window.orderBy("frequency").rangeBetween(Window.unboundedPreceding, 0)
    chk = out.withColumn("cum_f", F.count(F.lit(1)).over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    bad = chk.filter(
        F.col("f_score")
        != F.lit(1) + F.least(F.lit(4), F.expr("(5 * cum_f) DIV n")).cast("long")
    )
    assert bad.count() == 0


# ------------------------------------------------------- SLA mart


def test_sla_mart_invariants(spark):
    from github_issues_lakehouse_spark.operators.gold import sla_stability_mart
    from github_issues_lakehouse_spark.operators.silver import silver_issues

    s = silver_issues(spark, SF_DIR)
    mart = sla_stability_mart(s)
    rows = mart.collect()
    assert rows, "mart must not be empty"
    # only critical tiers contribute: created totals match the P0/P1 subset
    n_crit = s.filter(
        F.col("priority_tier").isin("P0", "P1") & F.col("created_at").isNotNull()
    ).count()
    assert sum(r.created_critical for r in rows) == n_crit
    for r in rows:
        # stability identity: ppm index is exactly 1e6 - floor(us/month_us * 1e6)
        month_us = 720 * 3_600_000_000
        open_us = r.total_critical_hours_e6 * 3600  # e6 hours -> us (floored)
        assert r.stability_index_ppm <= 1_000_000
        # breach rate only defined where something closed
        if r.closed_critical == 0:
            assert r.sla_breach_ppm is None
        else:
            assert 0 <= r.sla_breach_ppm <= 1_000_000
        assert open_us >= 0
    # backlog telescopes: per-component sum of (created-closed) == last backlog
    import collections

    by_comp = collections.defaultdict(list)
    for r in rows:
        by_comp[r.component].append(r)
    for comp, rs in by_comp.items():
        rs.sort(key=lambda r: r.month)
        assert rs[-1].backlog_critical_end == sum(
            r.created_critical - r.closed_critical for r in rs
        )


def test_sla_mart_exposure_splits_across_months(spark):
    """An issue spanning k months contributes its full interval,
    split across exactly the overlapped months."""
    import datetime

    from github_issues_lakehouse_spark.operators.gold import sla_stability_mart

    rows = [
        # open 2021-01-15 .. 2021-03-10: overlaps Jan, Feb, Mar
        (1, "P0", "X", datetime.datetime(2021, 1, 15), datetime.datetime(2021, 3, 10)),
        # non-critical: must not appear
        (2, "P2", "X", datetime.datetime(2021, 1, 1), datetime.datetime(2021, 1, 2)),
    ]
    df = spark.createDataFrame(
        rows, "issue_id long, priority_tier string, component string,"
        " created_at timestamp, closed_at timestamp"
    )
    out = {r.month: r for r in sla_stability_mart(df).collect()}
    assert set(out) == {"2021-01", "2021-02", "2021-03"}
    total_e6 = sum(r.total_critical_hours_e6 for r in out.values())
    span_us = int(
        (datetime.datetime(2021, 3, 10) - datetime.datetime(2021, 1, 15)).total_seconds()
        * 1_000_000
    )
    # per-month floors can each lose <1 micro-hour vs the exact span
    assert 0 <= span_us // 3600 - total_e6 <= 3
    # February is fully covered: 28 days open the whole month
    feb_e6 = out["2021-02"].total_critical_hours_e6
    assert feb_e6 == 28 * 24 * 1_000_000


# ------------------------------------------------- LSH recall bounding


def test_lsh_recall_sample_is_deterministic_and_bounded(spark):
    from github_issues_lakehouse_spark.operators.dedup import lsh_recall_vs_exact

    a = lsh_recall_vs_exact(spark, SF_DIR).collect()[0]
    b = lsh_recall_vs_exact(spark, SF_DIR).collect()[0]
    assert a == b, "md5 sampling must be deterministic"
    full = lsh_recall_vs_exact(spark, SF_DIR, sample_pct=100).collect()[0]
    # exact-side pairs are a strict subset under sampling (no cap on
    # that side); the LSH side is NOT monotone — shrinking a corpus
    # can pull a hot band bucket back under bucket_cap and ADD pairs
    assert a.n_exact_pairs <= full.n_exact_pairs
    if a.n_exact_pairs:
        assert 0 <= a.recall_ppm <= 1_000_000


def test_lsh_recall_plan_filters_docs_before_shingles(spark):
    """The sample predicate must land BELOW the shingle explode, on
    the documents scan (a Filter over doc_id md5 feeding the
    FileScan) — the plan-level proof that the exact all-pairs stage
    is bounded by the sample, not merely post-hoc. Mere substring
    presence of '#lshrecall' would also pass with the filter pushed
    ABOVE the explode (ADVICE r4), so this asserts the ORDERING:
    every shingle Generate in the physical plan is followed, deeper
    in its input chain, by an #lshrecall Filter sitting directly on
    a FileScan."""
    import re

    from github_issues_lakehouse_spark.operators.dedup import lsh_recall_vs_exact

    plan = lsh_recall_vs_exact(spark, SF_DIR)._jdf.queryExecution().toString()
    physical = plan.split("== Physical Plan ==")[1]
    assert "#lshrecall" in physical
    # Generate explode(array_distinct(   <- shingle explode
    #   ... (projection lines)
    #   Filter (... #lshrecall ...)      <- sample predicate BELOW it
    #     FileScan parquet               <- directly on the scan
    shingle_gens = len(re.findall(r"Generate explode\(array_distinct", physical))
    assert shingle_gens >= 1
    below_scan = re.findall(
        r"Generate explode\(array_distinct[^\n]*\n(?:[^\n]*\n){0,6}?"
        r"[^\n]*Filter [^\n]*#lshrecall[^\n]*\n[^\n]*FileScan parquet",
        physical,
    )
    assert len(below_scan) == shingle_gens, (
        f"{shingle_gens} shingle explodes but only {len(below_scan)} have "
        "the #lshrecall sample Filter below them on the scan"
    )


# ------------------------------------------- rewritten B-suite queries


def test_unpivot_total_e4_is_long(spark):
    from github_issues_lakehouse_spark.operators.relational6 import (
        unpivot_lineitem_metrics,
    )

    df = unpivot_lineitem_metrics(spark, SF_DIR)
    assert dict(df.dtypes)["total_e4"] == "bigint"
    rows = df.collect()
    assert len(rows) % 4 == 0 and rows


def test_order_seasonality_shares_sum_to_a_million(spark):
    from github_issues_lakehouse_spark.operators.relational6 import order_seasonality

    rows = order_seasonality(spark, SF_DIR).collect()
    assert len(rows) == 12
    # floor-ppm shares undershoot 1e6 by at most n_rows
    for col in ("order_share_ppm", "revenue_share_ppm"):
        s = sum(getattr(r, col) for r in rows)
        assert 1_000_000 - len(rows) <= s <= 1_000_000


# ------------------------------------------------------- plan budgets


def test_r4_shuffle_budgets(spark):
    """Pinned exchange budgets for the round-4 queries — regression
    guard against replanned subtrees (the unfused customer_rfm
    measured 42 exchanges; the fused multi-metric pass holds at 12)."""
    import re

    from github_issues_lakehouse_spark.plans.introspect import _plan_str

    def shuffles(df):
        return len(re.findall(r"\(\d+\) Exchange\b", _plan_str(df)))

    # cached subtrees from earlier tests would change exchange counts
    spark.catalog.clearCache()
    qs = Q.queries()
    assert shuffles(qs["customer_rfm"](spark, SF_DIR)) <= 14
    assert shuffles(qs["order_seasonality"](spark, SF_DIR)) <= 3
    assert shuffles(qs["unpivot_lineitem_metrics"](spark, SF_DIR)) <= 1
    assert shuffles(qs["gold_sla_stability"](spark, SF_DIR)) <= 9


def test_r4_no_cartesian(spark):
    from github_issues_lakehouse_spark.plans import assert_no_cartesian

    qs = Q.queries()
    for k in ("customer_rfm", "gold_sla_stability", "lsh_recall_vs_exact"):
        assert_no_cartesian(qs[k](spark, SF_DIR))


# ------------------------------------------ semantic decontamination


def test_embedding_decontaminate_flags_are_cross_split(spark):
    """Flagged ids are train-split only; every flag is confirmed by an
    exact brute-force cross-split cosine >= tau; and the LSH candidate
    recall is sane (multiprobe must catch the overwhelming majority
    of true matches on this corpus)."""
    from github_issues_lakehouse_spark.functions.vectors import cosine, to_double
    from github_issues_lakehouse_spark.operators.similarity import (
        embedding_decontaminate,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    tau = 0.3
    out = {r.train_vec_id: r for r in embedding_decontaminate(spark, SF_DIR, threshold=tau).collect()}
    e = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", to_double(F.col("embedding")).alias("vec")
    )
    sb = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("#split"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 1000
    )
    tagged = e.withColumn("sb", sb)
    test = tagged.filter(F.col("sb") < 100).select(
        F.col("vec_id").alias("t_id"), F.col("vec").alias("t_vec")
    )
    train = tagged.filter(F.col("sb") >= 100)
    exact = (
        train.crossJoin(test)
        .select(
            "vec_id",
            F.round(cosine(F.col("vec"), F.col("t_vec")), 6).alias("c"),
        )
        .filter(F.col("c") >= tau)
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("c").alias("mx"))
    )
    truth = {r.vec_id: r for r in exact.collect()}
    train_ids = {r.vec_id for r in train.select("vec_id").collect()}
    assert set(out) <= train_ids
    # no false positives: every flagged match exists in ground truth
    for vid, r in out.items():
        assert vid in truth
        assert r.n_test_matches <= truth[vid].n
        assert r.max_cos <= truth[vid].mx + 1e-9
    # multiprobe recall on this corpus: at least half the true
    # contaminated ids surface (LSH is approximate by contract)
    if truth:
        assert len(out) >= len(truth) / 2


# ----------------------------------------- exact substring block dedup


def test_dedup_exact_substrings_matches_bruteforce(spark):
    """Tiny synthetic corpus with planted shared boilerplate: block
    counts, removal counts, and the cleaned-text fingerprint all match
    an independent pure-Python reimplementation."""
    import hashlib

    from github_issues_lakehouse_spark.operators.dedup import dedup_exact_substrings
    from github_issues_lakehouse_spark.sources.registry import load_table

    k = 10
    out = {r.doc_id: r for r in dedup_exact_substrings(spark, SF_DIR, block_tokens=k).collect()}
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }

    # pure-Python reference
    import re as _re

    toks = {
        d: _re.sub(r"\s+", " ", t.lower()).strip().split(" ") for d, t in docs.items()
    }
    first: dict = {}
    for d in sorted(toks):
        t = toks[d]
        for pos in range(len(t) // k):
            bt = " ".join(t[pos * k : pos * k + k])
            first.setdefault(bt, (d, pos))
    for d in sorted(toks):
        t = toks[d]
        nb = len(t) // k
        kept = []
        n_dup = 0
        for pos in range(nb):
            bt = " ".join(t[pos * k : pos * k + k])
            if first[bt] == (d, pos):
                kept.append(bt)
            else:
                n_dup += 1
        tail = " ".join(t[nb * k :])
        cleaned = (" ".join(kept) + " " + tail).strip()
        fp = hashlib.md5(cleaned.encode()).hexdigest()
        r = out[d]
        assert r.n_blocks == nb, d
        assert r.n_dup_blocks == n_dup, d
        assert r.tokens_removed == n_dup * k, d
        assert r.n_tokens == len(t), d
        assert r.cleaned_fingerprint == fp, d


def test_token_dedup_savings_consistency(spark):
    from github_issues_lakehouse_spark.operators.dedup import (
        dedup_exact_substrings,
        token_dedup_savings,
    )

    sav = token_dedup_savings(spark, SF_DIR).collect()
    stats = dedup_exact_substrings(spark, SF_DIR).groupBy("source").agg(
        F.sum("tokens_removed").alias("rm"), F.sum("n_tokens").alias("tot")
    )
    by_src = {r.source: r for r in stats.collect()}
    for r in sav:
        assert r.tokens_removed == by_src[r.source].rm
        assert r.total_tokens == by_src[r.source].tot
        assert r.savings_ppm == r.tokens_removed * 1_000_000 // r.total_tokens
