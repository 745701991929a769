"""Structural invariants for the round-3 continuation operators —
properties the oracle hash can't express (the oracle proves engine
parity; these prove the MATH is right on any data).
"""

from pyspark.sql import functions as F

from github_issues_lakehouse_spark.operators import graph2, relational7 as R7
from github_issues_lakehouse_spark.operators.text6 import bpe_tokenize_stats
from github_issues_lakehouse_spark.sources.registry import load_table

from .conftest import SF_DIR


def test_ewma_bounded_by_frame(spark):
    """EWMA is a convex combination: every smoothed value lies within
    the user's running [min, max] of the trailing frame — and the
    first event's EWMA equals its value."""
    out = R7.ewma_user_value(spark, SF_DIR, k=16)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-15, 0)
    )
    checked = out.select(
        "ewma_16",
        F.round(F.min("value").over(w), 6).alias("lo"),
        F.round(F.max("value").over(w), 6).alias("hi"),
    )
    bad = checked.filter(
        (F.col("ewma_16") < F.col("lo") - 1e-6)
        | (F.col("ewma_16") > F.col("hi") + 1e-6)
    )
    assert bad.count() == 0
    n_events = load_table(spark, SF_DIR, "events").count()
    assert out.count() == n_events


def test_bpe_merges_reduce_tokens_monotonically(spark):
    """Each learned merge can only shrink the corpus tokenization:
    total BPE tokens at 5 merges <= at 1 merge <= character count."""
    t1 = bpe_tokenize_stats(spark, SF_DIR, n_merges=1)
    t5 = bpe_tokenize_stats(spark, SF_DIR, n_merges=5)
    n1 = t1.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    n5 = t5.agg(F.sum("n_bpe_tokens")).collect()[0][0]
    assert 0 < n5 < n1
    # fertility >= 1: a word is never fewer than one token
    assert t5.filter(F.col("fertility") < 1.0).count() == 0


def test_equi_depth_buckets_conserve_and_balance(spark):
    """Bucket sizes sum to the table row count and differ by at most
    one row (the defining property of an equi-depth histogram with
    the (rank-1)*B div N assignment)."""
    h = R7.equi_depth_histogram(spark, SF_DIR, buckets=20)
    rows = h.collect()
    n_li = load_table(spark, SF_DIR, "lineitem").count()
    assert sum(r.n_rows for r in rows) == n_li
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # bucket bounds are non-decreasing in bucket order
    ordered = sorted(rows, key=lambda r: r.bucket)
    for a, b in zip(ordered, ordered[1:]):
        assert a.price_hi <= b.price_lo + 1e-9


def test_triangle_count_divisible_by_three(spark):
    """Every triangle credits exactly its three corners, so the
    per-node counts sum to 3T; clustering stays within [0, 1]."""
    t = graph2.supplier_cosupply_triangles(spark, SF_DIR)
    rows = t.collect()
    assert sum(r.triangles for r in rows) % 3 == 0
    assert all(0.0 <= r.clustering <= 1.0 for r in rows)


def test_ab_arms_partition_users(spark):
    """The md5 arm split partitions the user set; conversion counts
    never exceed arm sizes."""
    out = R7.ab_test_conversion(spark, SF_DIR).collect()
    n_users = (
        load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    )
    assert sum(r.n_users for r in out) == n_users
    assert all(0 <= r.n_converted <= r.n_users for r in out)
    assert {r.arm for r in out} <= {"A", "B"}


def test_pca_loadings_unit_norm(spark):
    """The power-iteration output is a unit vector (up to 6dp
    rounding) and the eigenvalue is positive for a covariance
    matrix."""
    from github_issues_lakehouse_spark.operators.vectors2 import pca_top_component

    rows = pca_top_component(spark, SF_DIR).collect()
    norm2 = sum(r.loading**2 for r in rows)
    assert abs(norm2 - 1.0) < 1e-3
    assert rows[0].eigenvalue > 0
