"""Semantic tests for the r2 second-wave operators: repetition gate,
paragraph-window dedup, distributed k-means, SCD2 history."""

from pyspark.sql import functions as F

from github_issues_lakehouse_spark.operators import clustering, dimensional, text3

from .conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_filter_flags_boilerplate(spark):
    clean = " ".join(f"w{i}" for i in range(60))
    spam = "buy now " * 30  # one bigram dominates
    out = {
        r.doc_id: r
        for r in text3.repetition_filter(
            spark, SF_DIR, docs=_docs(spark, [(1, clean), (2, spam.strip())])
        ).collect()
    }
    assert out[1].keep and out[1].top_bigram_share < 0.1
    assert not out[2].keep and out[2].top_bigram_share > 0.4
    assert out[2].dup_trigram_frac > 0.9


def test_repetition_filter_short_doc_no_crash(spark):
    """A sub-n-gram doc yields one partial gram (share 1.0), not a
    crash or an empty row."""
    out = text3.repetition_filter(spark, SF_DIR, docs=_docs(spark, [(1, "one")])).collect()
    assert len(out) == 1
    assert out[0].top_bigram_share == 1.0 and out[0].dup_trigram_frac == 0.0


def test_paragraph_dedup_keep_first_occurrence(spark):
    body = " ".join(f"tok{i}" for i in range(32))  # exactly 2 windows of 16
    out = {
        r.doc_id: r
        for r in text3.paragraph_dedup(
            spark, SF_DIR, docs=_docs(spark, [(1, body), (2, body), (3, "fresh text here")])
        ).collect()
    }
    assert out[1].n_windows == 2 and out[1].n_kept == 2  # first occurrence wins
    assert out[2].n_windows == 2 and out[2].n_kept == 0 and out[2].kept_frac == 0.0
    assert out[3].n_kept == 1


def test_paragraph_dedup_corpus_totals(spark):
    """Kept windows == distinct window hashes (each hash kept once)."""
    res = text3.paragraph_dedup(spark, SF_DIR)
    agg = res.agg(
        F.sum("n_kept").alias("kept"), F.sum("n_windows").alias("total")
    ).collect()[0]
    assert 0 < agg.kept <= agg.total


def test_kmeans_total_coverage_and_cluster_range(spark):
    res = clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=2)
    rows = res.collect()
    n_corpus = len(set(r.vec_id for r in rows))
    assert len(rows) == n_corpus  # each vector assigned exactly once
    assert all(0 <= r.cluster < 8 for r in rows)
    assert all(r.d2 >= 0 for r in rows)


def test_kmeans_iterations_reduce_distortion(spark):
    """Lloyd's monotonicity: mean squared distance never increases
    with more iterations (on the recomputed-centroid assignments)."""
    d1 = clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=1)
    d3 = clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=3)
    m1 = d1.agg(F.avg("d2")).collect()[0][0]
    m3 = d3.agg(F.avg("d2")).collect()[0][0]
    assert m3 <= m1 + 1e-9


def test_kmeans_cluster_profile_consistency(spark):
    prof = clustering.kmeans_cluster_profile(spark, SF_DIR, k=8, n_iter=2).collect()
    assigned = clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=2)
    assert sum(r.n_members for r in prof) == assigned.count()
    assert all(r.avg_d2 >= 0 for r in prof)


def test_ivf_trained_centroids_index(spark):
    """ann_ivf_topk accepts a trained centroid table and produces a
    complete top-k per query with sane recall. (On this uniform
    synthetic corpus trained ≈ first-k-vectors recall — the trained
    path matters when real data has cluster structure; the plan is
    identical either way.)"""
    from github_issues_lakehouse_spark.operators import similarity

    cents = clustering.ivf_trained_centroids(spark, SF_DIR, k=16, n_iter=2)
    assert cents.count() == 16
    approx = similarity.ann_ivf_topk(spark, SF_DIR, centroids=cents)
    per_q = approx.groupBy("q_id").count().collect()
    assert all(r["count"] == 5 for r in per_q) and len(per_q) == 8
    truth = similarity.ann_bruteforce_topk(spark, SF_DIR)
    hits = truth.join(approx, ["q_id", "neighbor_id"], "left_semi").count()
    assert hits / truth.count() >= 0.6


def test_scd2_intervals_well_formed(spark):
    hist = dimensional.scd2_priority_history(spark, SF_DIR)
    per_cust = hist.groupBy("custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_current"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    bad = per_cust.filter(F.col("n_current") != 1).count()
    assert bad == 0  # exactly one open interval per customer
    # change-collapse: no adjacent intervals with the same value.
    # Restricted to customers whose valid_from dates are all distinct —
    # with same-day changes the test window can't recover the operator's
    # orderkey tiebreak, so adjacency there is not observable.
    from pyspark.sql import Window

    clean = per_cust.join(
        hist.groupBy("custkey")
        .agg((F.count(F.lit(1)) == F.count_distinct("valid_from")).alias("uniq"))
        .filter("uniq"),
        "custkey",
        "left_semi",
    )
    w = Window.partitionBy("custkey").orderBy("valid_from")
    adj = (
        hist.join(clean, "custkey", "left_semi")
        .withColumn("nxtp", F.lead("priority").over(w))
        .filter(F.col("nxtp").isNotNull() & (F.col("nxtp") == F.col("priority")))
        .count()
    )
    assert adj == 0


def test_kmeans_flat_plan_depth(spark):
    """Per-iteration localCheckpoint keeps plan size CONSTANT in
    n_iter — n_iter=8 must not produce a (much) bigger plan than
    n_iter=2, or 20-iteration runs blow up analysis/retry cost."""
    p2 = clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=2)._jdf.queryExecution().analyzed().toString()
    p8 = clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=8)._jdf.queryExecution().analyzed().toString()
    assert len(p8) < 2 * len(p2), (len(p2), len(p8))


def test_kmeans_parallel_init(spark):
    """k-means|| seeding: k distinct centroid ids, full corpus
    coverage, and distortion no worse than 3x the first-k init (it is
    usually better; the bound just guards against a broken sampler)."""
    from pyspark.sql import functions as F

    res = clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=2, init="kmeans||")
    n_corpus = res.count()
    assert n_corpus == clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=2).count()
    assert res.select("cluster").distinct().count() == 8
    # deterministic: same call twice gives identical assignments
    again = clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=2, init="kmeans||")
    assert res.exceptAll(again).count() == 0

    d_pp = res.agg(F.sum("d2")).collect()[0][0]
    d_fk = (
        clustering.kmeans_embeddings(spark, SF_DIR, k=8, n_iter=2)
        .agg(F.sum("d2"))
        .collect()[0][0]
    )
    assert d_pp <= 3 * d_fk, (d_pp, d_fk)
