"""Physical-plan assertions (SURVEY.md §5.3): filters push into
parquet scans, small dims broadcast, no cartesian products anywhere
in the §2 inventory. These are the properties that keep the same
plans viable at 100 TB."""

import pytest

from github_issues_lakehouse_spark import queries as Q
from github_issues_lakehouse_spark.operators import relational as R
from github_issues_lakehouse_spark.plans import (
    assert_no_cartesian,
    broadcast_join_count,
    has_pushed_filters,
)

from .conftest import SF_DIR


def test_q1_filter_pushdown(spark):
    df = R.q1_pricing_summary(spark, SF_DIR)
    assert has_pushed_filters(df), "l_shipdate filter must reach the parquet scan"


def test_q3_broadcasts_customer_dim(spark):
    df = R.q3_shipping_priority(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1


def test_q5_broadcasts_dims(spark):
    df = R.q5_region_revenue(spark, SF_DIR)
    assert broadcast_join_count(df) >= 2, "nation/region/supplier should broadcast"


@pytest.mark.parametrize("name", sorted(Q.queries()))
def test_no_cartesian_product(name, spark):
    df = Q.queries()[name](spark, SF_DIR)
    assert_no_cartesian(df)


def _shuffle_count(df):
    import re

    from github_issues_lakehouse_spark.plans.introspect import _plan_str

    return len(re.findall(r"\(\d+\) Exchange\b", _plan_str(df)))


def test_q1_single_shuffle(spark):
    """Partial agg -> one exchange -> final agg; anything more would
    re-shuffle 100 TB of lineitem."""
    assert _shuffle_count(R.q1_pricing_summary(spark, SF_DIR)) == 1


def test_asof_join_single_shuffle(spark):
    """The union-and-window as-of join must shuffle exactly once (on
    the user key) — a per-row range join would show extra exchanges."""
    assert _shuffle_count(R.asof_join_orders_events(spark, SF_DIR)) == 1


def test_pinned_shuffle_budgets(spark):
    """Exact/ceiling exchange counts for the shuffle-sensitive
    operators — each count is the number of data-motion passes the
    docstring promises; a regression here multiplies directly at
    100 TB. Measured values; ceilings where AQE may merge stages."""
    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.operators import relational4 as R4

    qs = Q.queries()
    assert _shuffle_count(qs["sessionize_events"](spark, SF_DIR)) == 1
    assert _shuffle_count(qs["running_customer_totals"](spark, SF_DIR)) == 1
    # lag window + pair aggregation + outgoing-share window
    assert _shuffle_count(qs["event_transitions"](spark, SF_DIR)) <= 3
    assert _shuffle_count(qs["cohort_retention"](spark, SF_DIR)) <= 3
    # created agg + closed agg + grid join + backlog window
    assert _shuffle_count(qs["gold_kpi_component_tier"](spark, SF_DIR)) <= 4
    # per-(part,supplier) agg + per-part window (reuses partitioning)
    assert _shuffle_count(R4.min_cost_supplier(spark, SF_DIR)) <= 2
    assert _shuffle_count(R4.top_supplier_revenue(spark, SF_DIR)) <= 3
    assert _shuffle_count(R4.returns_blame_suppliers(spark, SF_DIR)) <= 4


def test_nation_pair_broadcasts_dims(spark):
    from github_issues_lakehouse_spark.operators import relational2 as R2

    df = R2.nation_pair_volume(spark, SF_DIR)
    assert broadcast_join_count(df) >= 3, "supplier + both nation copies broadcast"
    assert _shuffle_count(df) <= 2, "facts shuffle at most on join key + agg"


def test_tpch_second_wave_plans(spark):
    """The r2 second-wave TPC-H shapes keep their promised shapes:
    dims broadcast, window aggregates reuse the groupBy partitioning,
    and the only fact-fact shuffle is the orderkey join."""
    from github_issues_lakehouse_spark.operators import relational5 as R5

    # per-(part,supplier) agg + per-part window (reuses partitioning)
    assert _shuffle_count(R5.excess_supply_suppliers(spark, SF_DIR)) <= 3
    # semi join on orderkey + priority agg
    assert _shuffle_count(R5.order_priority_checking(spark, SF_DIR)) <= 3
    ms = R5.national_market_share(spark, SF_DIR)
    assert broadcast_join_count(ms) >= 2, "customer-region + supplier-nation broadcast"
    # li<->orders join + year agg; AQE may add a post-join coalesce
    assert _shuffle_count(ms) <= 4
    pp = R5.product_profit(spark, SF_DIR)
    assert broadcast_join_count(pp) >= 2, "part filter + supplier nation broadcast"
    assert broadcast_join_count(R5.parts_supplier_count(spark, SF_DIR)) >= 2
    assert _shuffle_count(R5.promo_revenue_share(spark, SF_DIR)) <= 2


def test_third_wave_plans(spark):
    """r2 third-wave additions keep their promised shapes: Q6 is one
    pushed-down scan folding to a single 1-row combine; BPE top-k is
    a distributed partial top-k (never a global sort of the corpus);
    the overlap matrix broadcasts its per-source totals; the quality
    classifier is shuffle-free."""
    from github_issues_lakehouse_spark.operators import relational5 as R5
    from github_issues_lakehouse_spark.operators import text3 as T3
    from github_issues_lakehouse_spark.plans.introspect import _plan_str

    q6 = R5.forecast_revenue(spark, SF_DIR)
    assert has_pushed_filters(q6), "shipdate/discount/quantity filters reach the scan"
    assert _shuffle_count(q6) == 1, "only the final 1-row partial-agg combine"

    bpe = T3.bpe_pair_counts(spark, SF_DIR)
    assert "TakeOrderedAndProject" in _plan_str(bpe), "top-k must not global-sort"
    assert _shuffle_count(bpe) <= 2, "pair-count agg + top-k gather"

    ov = T3.cross_source_overlap(spark, SF_DIR)
    assert broadcast_join_count(ov) >= 2, "both per-source total sides broadcast"
    assert_no_cartesian(ov)

    qc = T3.quality_classifier(spark, SF_DIR)
    assert _shuffle_count(qc) == 0, "pure per-row scoring must not move data"


def test_fourth_wave_plans(spark):
    """This session's additions keep their promised shapes:
    weighted_sample is a map-only pass (zero exchanges); the
    trailing RANGE frame shuffles once on user_id; the concurrency
    sweep shuffles the deltas once on day (plus the one-row-per-day
    carry window); ttr's doc-count join broadcasts; dq is
    cartesian-free (checked globally) with both FK joins real joins."""
    from github_issues_lakehouse_spark.operators import quality_checks as QC
    from github_issues_lakehouse_spark.operators import relational6 as R6
    from github_issues_lakehouse_spark.operators import text4 as T4

    assert _shuffle_count(T4.weighted_sample(spark, SF_DIR)) == 0
    assert _shuffle_count(R6.trailing_window_user_value(spark, SF_DIR)) == 1
    # sessionize user shuffle + day shuffle + one-row-per-day carry
    assert _shuffle_count(R6.concurrent_sessions(spark, SF_DIR)) <= 4
    assert broadcast_join_count(T4.ttr_stats(spark, SF_DIR)) >= 1
    # per-source median + MAD joins broadcast back to the doc frame
    assert broadcast_join_count(T4.length_outliers(spark, SF_DIR)) >= 2
    assert_no_cartesian(QC.dq_violations(spark, SF_DIR))


def test_plan_token_shards_single_scan(spark):
    """The shard planner's carry branch must REUSE the bucket
    exchange (one tokenize scan total) — the isnotnull(bucket) filter
    alignment makes both consumers' subtrees identical for AQE."""
    from github_issues_lakehouse_spark.operators.chunking import plan_token_shards

    df = plan_token_shards(spark, SF_DIR)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert final.count("ReusedExchange") >= 1
    import re

    assert len(re.findall(r"FileScan parquet", final)) == 1


def test_r3_wave_shuffle_budgets(spark):
    """Round-3 operators: pinned data-motion passes.
    gopher = map-only (0 exchanges beyond the final agg-free scan);
    doc_entropy = 1 (both aggregates share the doc_id grouping);
    event_dedup = 1 (both windows share the (user, type) sort);
    embedding_covariance = 1 (single global partial+final aggregate);
    zipf = 2 (per-source-term agg, then source window rides a
    re-partition) plus the final 1-row fold."""
    from github_issues_lakehouse_spark import queries as Q

    qs = Q.queries()
    assert _shuffle_count(qs["gopher_quality_rules"](spark, SF_DIR)) == 0
    assert _shuffle_count(qs["doc_entropy"](spark, SF_DIR)) <= 2
    assert _shuffle_count(qs["event_dedup_windowed"](spark, SF_DIR)) == 1
    assert _shuffle_count(qs["embedding_covariance"](spark, SF_DIR)) == 1
    assert _shuffle_count(qs["zipf_slope"](spark, SF_DIR)) <= 3
    assert _shuffle_count(qs["term_source_association"](spark, SF_DIR)) <= 4


def test_r3_second_wave_shuffle_budgets(spark):
    """Second r3 wave: association rules <= 4 (explode agg, pair agg,
    two broadcast support joins ride free); anomaly = 2 (daily agg +
    per-type window on daily grain); mixture = 1 (weights agg,
    broadcast back onto the scan); redact <= 3 (bench-gram agg +
    bad-start fold + rebuild join)."""
    from github_issues_lakehouse_spark import queries as Q

    qs = Q.queries()
    assert _shuffle_count(qs["label_association_rules"](spark, SF_DIR)) <= 4
    assert _shuffle_count(qs["daily_anomaly_events"](spark, SF_DIR)) == 2
    assert _shuffle_count(qs["mixture_resample"](spark, SF_DIR)) <= 2
    assert _shuffle_count(qs["redact_contaminated_spans"](spark, SF_DIR)) <= 4


def test_lineage_report_prunes_and_pushes(spark):
    """The lineage audit reads the optimized plan: q1 touches ONLY
    lineitem, reads exactly the 7 needed columns (pruning), and shows
    the shipdate predicate pushed into the scan."""
    from github_issues_lakehouse_spark.plans import lineage_report

    rep = lineage_report(R.q1_pricing_summary(spark, SF_DIR))
    assert [r["table"] for r in rep] == ["lineitem"]
    cols = set(rep[0]["columns"])
    assert cols == {
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate",
    }
    assert "l_shipdate" in rep[0]["pushed_filters"]

    # a multi-table mart reports every scan
    rep5 = lineage_report(R.q5_region_revenue(spark, SF_DIR))
    tables = {r["table"] for r in rep5}
    assert {"customer", "orders", "lineitem", "supplier", "nation", "region"} <= tables


def test_r3_third_wave_shuffle_budgets(spark):
    """Third r3 wave: triangles <= 8 (edges checkpointed once, then
    wedge/closing joins + two explode-aggs + supplier join); lift <= 4
    (baskets checkpointed, pair agg + two broadcast support joins);
    equi-depth <= 6 (two lineitem passes: stats + band window/carry/
    final agg); stats mart = 2 per table (multi-distinct expand);
    attribution = 2 (touch join + purchase window); ewma = 1 (the
    bounded-frame window); PMI <= 5 (pair agg + unigram agg + three
    broadcast totals); feature hashing = 2 (doc-bucket agg incl.
    distinct); PCA = 2 (one corpus moment aggregate — iterations run
    on checkpointed dim-sized tables, invisible here)."""
    from github_issues_lakehouse_spark import queries as Q

    qs = Q.queries()
    assert _shuffle_count(qs["supplier_cosupply_triangles"](spark, SF_DIR)) <= 8
    assert _shuffle_count(qs["part_copurchase_lift"](spark, SF_DIR)) <= 4
    assert _shuffle_count(qs["equi_depth_histogram"](spark, SF_DIR)) <= 6
    assert _shuffle_count(qs["table_stats_mart"](spark, SF_DIR)) <= 4
    assert _shuffle_count(qs["attribution_touchpoints"](spark, SF_DIR)) <= 2
    assert _shuffle_count(qs["ewma_user_value"](spark, SF_DIR)) == 1
    assert _shuffle_count(qs["term_cooccurrence_pmi"](spark, SF_DIR)) <= 5
    assert _shuffle_count(qs["feature_hash_counts"](spark, SF_DIR)) <= 2
    assert _shuffle_count(qs["pca_top_component"](spark, SF_DIR)) <= 2


def test_r3_fifth_wave_shuffle_budgets(spark):
    """Fifth r3 wave: bm25 <= 5 (postings agg + df agg + score join,
    term filter beside the generator); rrf <= 8 (two bounded ANN
    subtrees + one fusion window); seasonal/cusum <= 6 (grid build is
    3 aggregates, then day-grain windows only); corr matrix == 1 (the
    single moment aggregate); skew report <= 3 (key agg + bounded
    top-n + broadcast stats)."""
    from github_issues_lakehouse_spark import queries as Q

    qs = Q.queries()
    assert _shuffle_count(qs["bm25_topk"](spark, SF_DIR)) <= 5
    assert _shuffle_count(qs["rrf_hybrid_topk"](spark, SF_DIR)) <= 8
    assert _shuffle_count(qs["seasonal_decompose_daily"](spark, SF_DIR)) <= 6
    assert _shuffle_count(qs["cusum_changepoint"](spark, SF_DIR)) <= 6
    assert _shuffle_count(qs["corr_matrix_lineitem"](spark, SF_DIR)) == 1
    assert _shuffle_count(qs["join_key_skew"](spark, SF_DIR)) <= 3


def test_r3_sixth_wave_shuffle_budgets(spark):
    """Sixth r3 wave: bpe apply <= 3 (two word-count aggregates; the
    learned vocabulary is checkpointed, broadcast back); ab test <= 2
    (the per-user aggregate, checkpointed for its two consumers);
    neighbor jaccard <= 6 (checkpointed bipartite supplier-customer
    set + customer-keyed wedge agg + broadcast set sizes)."""
    from github_issues_lakehouse_spark import queries as Q

    qs = Q.queries()
    assert _shuffle_count(qs["bpe_tokenize_stats"](spark, SF_DIR)) <= 3
    assert _shuffle_count(qs["ab_test_conversion"](spark, SF_DIR)) <= 2
    assert _shuffle_count(qs["supplier_neighbor_jaccard"](spark, SF_DIR)) <= 6


def test_r3_seventh_wave_shuffle_budgets(spark):
    """Seventh r3 wave: pca projection <= 5 (moment agg + pivot of
    the dim-row vector + projection stats, corpus touched twice);
    pr curve <= 3 (classifier scan + gate join + one threshold-grid
    aggregate); lsh recall <= 12 (heavy composite by contract: the
    full LSH subtree + the uncapped exact inverted-index join it
    audits). Cold cache: a minhash subtree persisted by an earlier
    test gets CacheManager-substituted into this plan and shifts the
    exchange count — the budget is about the cold plan shape."""
    from github_issues_lakehouse_spark import queries as Q

    spark.catalog.clearCache()
    qs = Q.queries()
    assert _shuffle_count(qs["pca_projection_outliers"](spark, SF_DIR)) <= 5
    assert _shuffle_count(qs["classifier_pr_curve"](spark, SF_DIR)) <= 3
    assert _shuffle_count(qs["lsh_recall_vs_exact"](spark, SF_DIR)) <= 12


def test_r3_eighth_wave_shuffle_budgets(spark):
    """Eighth r3 wave: dau/wau <= 7 (two distincts + two aggregates
    over the 7x-bounded cover expansion, grid joins broadcast);
    trigrams <= 4 (one user window + bounded aggregate + 1-row
    total); join size estimate <= 15 (three REAL validation joins +
    six 1-row stat aggregates by design — the estimate itself is
    broadcast scalars)."""
    from github_issues_lakehouse_spark import queries as Q

    qs = Q.queries()
    assert _shuffle_count(qs["dau_wau_stickiness"](spark, SF_DIR)) <= 7
    assert _shuffle_count(qs["event_trigram_patterns"](spark, SF_DIR)) <= 4
    assert _shuffle_count(qs["join_size_estimate"](spark, SF_DIR)) <= 15


def test_r3_ninth_wave_shuffle_budgets(spark):
    """Ninth r3 wave: confusion matrix <= 3 (doc join + cell
    aggregate + broadcast gold totals); churn flags <= 2 (one
    per-user aggregate + broadcast horizon)."""
    from github_issues_lakehouse_spark import queries as Q

    qs = Q.queries()
    assert _shuffle_count(qs["lang_id_confusion"](spark, SF_DIR)) <= 3
    assert _shuffle_count(qs["user_churn_flags"](spark, SF_DIR)) <= 2


def test_single_partition_window_rule(spark):
    """The r6 advisor rule (VERDICT r5 task 3): an unpartitioned
    running-sum window over unbounded input fires; the repo's
    orderBy().limit top-k idiom (TakeOrderedAndProject feeding the
    rank window) does not; the fixed term_burst_detection and
    vocab_stats plans are clean."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.plans.introspect import (
        _plan_str,
        _single_partition_window,
    )

    df = spark.range(1000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("v")
    )
    # unbounded global cumsum — the scale-killer class
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    bad = df.withColumn("cum", F.sum("v").over(w))
    assert _single_partition_window(_plan_str(bad))

    # the blessed idiom: distributed partial top-k, then rank the
    # bounded survivors
    top = df.orderBy(F.col("v").desc()).limit(5)
    good = top.withColumn("rk", F.row_number().over(Window.orderBy(F.col("v").desc())))
    assert not _single_partition_window(_plan_str(good))

    qs = Q.queries()
    assert not _single_partition_window(
        _plan_str(qs["term_burst_detection"](spark, SF_DIR))
    )
    assert not _single_partition_window(_plan_str(qs["vocab_stats"](spark, SF_DIR)))
