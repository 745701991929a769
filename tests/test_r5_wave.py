"""Round-5 operator invariants: the SLA MoM mart and the
packing/cluster/filter-bias accounting marts (their value parity is
pinned by the DuckDB twins in test_oracle.py; these tests pin the
SEMANTIC identities a hash can't explain)."""

from pyspark.sql import functions as F

from github_issues_lakehouse_spark import queries as Q

from .conftest import SF_DIR


def test_gold_sla_mom_deltas_telescope(spark):
    """Per component: the backlog MoM deltas telescope to last-first
    backlog, and each delta row matches the mart's own lag — the
    window is over the component's ACTIVE months only (sparse grid,
    no gap-fill)."""
    mart = {
        (r.month, r.component): r
        for r in Q.q_gold_sla(spark, SF_DIR).collect()
    }
    mom = Q.q_gold_sla_mom(spark, SF_DIR).collect()
    assert len(mom) == len(mart)
    by_comp = {}
    for r in sorted(mom, key=lambda r: r.month):
        by_comp.setdefault(r.component, []).append(r)
    for comp, rows in by_comp.items():
        assert rows[0].backlog_mom_delta is None  # no prior active month
        tele = sum(r.backlog_mom_delta or 0 for r in rows)
        first = mart[(rows[0].month, comp)].backlog_critical_end
        last = mart[(rows[-1].month, comp)].backlog_critical_end
        assert tele == last - first, comp
        for prev, cur in zip(rows, rows[1:]):
            m_prev = mart[(prev.month, comp)]
            m_cur = mart[(cur.month, comp)]
            assert cur.stability_mom_ppm_delta == (
                m_cur.stability_index_ppm - m_prev.stability_index_ppm
            )
            if m_prev.sla_breach_ppm is None or m_cur.sla_breach_ppm is None:
                assert cur.breach_mom_ppm_delta is None
            else:
                assert cur.breach_mom_ppm_delta == (
                    m_cur.sla_breach_ppm - m_prev.sla_breach_ppm
                )


def test_pack_efficiency_conserves_docs_and_tokens(spark):
    from github_issues_lakehouse_spark.operators.chunking import (
        pack_efficiency,
        pack_sequences,
    )

    eff = pack_efficiency(spark, SF_DIR).collect()
    bins = pack_sequences(spark, SF_DIR).collect()
    want_docs = sum(r.n_docs for r in bins)
    want_tokens = sum(r.total_tokens for r in bins)
    assert sum(r.n_docs for r in eff) == want_docs
    assert sum(r.total_tokens for r in eff) == want_tokens
    for r in eff:
        assert r.n_overfull_bins + r.n_underfull_bins <= r.n_bins
        assert r.max_bin_tokens >= r.total_tokens // max(r.n_bins, 1)
        assert r.fill_ppm > 0


def test_cluster_size_profile_conserves_clustered_docs(spark):
    from github_issues_lakehouse_spark.operators.dedup import (
        dedup_cluster_size_profile,
        dedup_clusters,
    )

    prof = dedup_cluster_size_profile(spark, SF_DIR).collect()
    n_clustered = dedup_clusters(spark, SF_DIR).count()
    assert sum(r.n_docs for r in prof) == n_clustered
    # clusters come from pairs: no singletons can appear
    assert all(r.cluster_size >= 2 for r in prof)
    # floor-ppm shares undershoot 1e6 by at most the row count
    s = sum(r.docs_share_ppm for r in prof)
    assert 1_000_000 - len(prof) <= s <= 1_000_000


def test_quality_length_bias_partitions_the_corpus(spark):
    from github_issues_lakehouse_spark.operators.scale import (
        quality_length_bias,
        training_corpus_filter,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    rows = quality_length_bias(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    n_kept = training_corpus_filter(spark, SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_kept for r in rows) == n_kept
    for r in rows:
        assert 0 <= r.n_kept <= r.n_docs
        assert 0 <= r.keep_ppm <= 1_000_000
        assert 0 <= r.mean_quality_e6 <= 1_000_000


def test_minhash_calibration_invariants(spark):
    from github_issues_lakehouse_spark.operators.dedup import minhash_calibration

    rows = minhash_calibration(spark, SF_DIR).collect()
    assert rows and all(0 <= r.exact_decile <= 9 for r in rows)
    for r in rows:
        assert r.n_pairs > 0
        assert 0 <= r.mean_est_ppm <= 1_000_000
        assert 0 <= r.mean_exact_ppm <= 1_000_000
        # floor-mean triangle inequality (±1 for the two independent floors)
        assert abs(r.mean_est_ppm - r.mean_exact_ppm) <= r.mean_abs_err_ppm + 1
        # decile consistency: the mean exact jaccard sits in its decile
        lo = r.exact_decile * 100_000
        hi = 1_000_000 if r.exact_decile == 9 else lo + 100_000
        assert lo <= r.mean_exact_ppm <= hi


def test_minhash_calibration_identical_docs_are_exact(spark, tmp_path):
    """A pair of identical documents must land in decile 9 with both
    estimator and exact at 1e6 and zero error — the estimator is
    exact at Jaccard 1 by construction (identical shingle sets give
    identical signatures)."""
    d = str(tmp_path / "sf")
    text = "the quick brown fox jumps over the lazy dog again and again today"
    spark.createDataFrame(
        [(1, text, "en", "s0", 1), (2, text, "en", "s0", 1),
         (3, "totally different content about query engines and shuffles", "en", "s0", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    from github_issues_lakehouse_spark.operators.dedup import minhash_calibration

    rows = {r.exact_decile: r for r in minhash_calibration(spark, d).collect()}
    assert set(rows) == {9}
    assert rows[9].n_pairs == 1
    assert rows[9].mean_est_ppm == 1_000_000
    assert rows[9].mean_exact_ppm == 1_000_000
    assert rows[9].mean_abs_err_ppm == 0


def test_growth_accounting_identities(spark):
    """n_active = new + retained + resurrected on every day; the
    first day is all-new; and consecutive days conserve:
    active(d) = active(d-1) - churned(d) + new(d) + resurrected(d)."""
    import datetime

    from github_issues_lakehouse_spark.operators.timeseries import (
        user_growth_accounting,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    rows = sorted(
        user_growth_accounting(spark, SF_DIR).collect(), key=lambda r: r.day
    )
    assert rows
    by_day = {r.day: r for r in rows}
    first = rows[0]
    assert first.n_active == first.n_new and first.n_retained == 0
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert sum(r.n_new for r in rows) == n_users
    for r in rows:
        assert r.n_active == r.n_new + r.n_retained + r.n_resurrected
    for prev, cur in zip(rows, rows[1:]):
        d_prev = datetime.date.fromisoformat(prev.day)
        d_cur = datetime.date.fromisoformat(cur.day)
        if (d_cur - d_prev).days == 1:
            assert cur.n_active == (
                prev.n_active - cur.n_churned + cur.n_new + cur.n_resurrected
            ), cur.day
