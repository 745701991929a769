"""Round-3 operator wave: Gopher rules, entropy, Zipf, PMI
association, embedding covariance, burst-throttle event dedup."""

import datetime

import pytest
from pyspark.sql import functions as F

from github_issues_lakehouse_spark.operators import text5
from github_issues_lakehouse_spark.operators.relational6 import event_dedup_windowed
from github_issues_lakehouse_spark.operators.vectors2 import embedding_covariance

from .conftest import SF_DIR


def test_gopher_rules_verdict_is_conjunction(spark):
    rows = text5.gopher_quality_rules(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.keep == (
            r.pass_word_count and r.pass_word_length
            and r.pass_symbol_ratio and r.pass_stopwords
        )
    # the synthetic corpus is clean lowercase words: symbol rule all-pass
    assert all(r.pass_symbol_ratio for r in rows)


def test_doc_entropy_bounds(spark):
    rows = text5.doc_entropy(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # 0 <= H <= log2(n_distinct); normalized in [0, 1]
        assert -1e-9 <= r.entropy_bits
        assert r.entropy_norm <= 1.0 + 1e-9
        assert r.n_distinct <= r.n_tokens


def test_doc_entropy_extremes(spark, tmp_path):
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "aaa aaa aaa aaa", "en", "s", 15),
         (2, "a b c d", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    rows = {r.doc_id: r for r in text5.doc_entropy(spark, d).collect()}
    assert rows[1].entropy_bits == 0.0          # one repeated token
    assert rows[2].entropy_bits == 2.0          # 4 equiprobable tokens
    assert rows[2].entropy_norm == 1.0


def test_zipf_slope_negative(spark):
    rows = text5.zipf_slope(spark, SF_DIR).collect()
    assert len(rows) > 1
    # frequency decreases with rank by construction -> slope < 0
    assert all(r.zipf_slope < 0 for r in rows)


def test_term_source_association_topk(spark):
    rows = text5.term_source_association(spark, SF_DIR, top_k=3).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    for src, rs in per_src.items():
        assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))
        assert all(x.df_in_source <= x.df_total for x in rs)


def test_embedding_covariance_psd_diagonal(spark):
    rows = embedding_covariance(spark, SF_DIR, dim=4).collect()
    assert len(rows) == 10  # 4*5/2 upper triangle
    diag = {r.dim_i: r.cov for r in rows if r.dim_i == r.dim_j}
    assert all(v >= 0 for v in diag.values())  # variances non-negative
    for r in rows:  # |cov(i,j)| <= sqrt(var_i * var_j) (Cauchy-Schwarz)
        bound = (diag[r.dim_i] * diag[r.dim_j]) ** 0.5
        assert abs(r.cov) <= bound + 1e-6


def test_event_dedup_burst_chain_semantics(spark, tmp_path):
    """Throttle-chain: events at t=0,20,40,75 min with a 30-min window
    form bursts {0,20,40} and {75} — a naive lag-filter would wrongly
    re-admit t=40 (40-20=20<30 keeps it out, good) BUT would also
    drop t=75 relative to nothing; the chain case that separates the
    two is t=0,20,40: lag-filter drops 20 AND 40; burst logic drops
    both but keeps them in burst 1 with only t=0 kept."""
    d = str(tmp_path / "sf")
    base = datetime.datetime(2020, 1, 1)

    def ev(i, minutes, typ="click"):
        return (i, base + datetime.timedelta(minutes=minutes), 7, typ, 1.0, "{}")

    spark.createDataFrame(
        [ev(1, 0), ev(2, 20), ev(3, 40), ev(4, 75), ev(5, 0, "view")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    rows = {r.event_id: r for r in event_dedup_windowed(spark, d, 30).collect()}
    assert [rows[i].burst_id for i in (1, 2, 3, 4)] == [1, 1, 1, 2]
    assert [rows[i].is_kept for i in (1, 2, 3, 4)] == [True, False, False, True]
    assert rows[5].is_kept  # independent (user, type) stream


def test_kmv_sketch_estimate_quality(spark):
    from github_issues_lakehouse_spark.operators.sketches import kmv_distinct_terms

    rows = kmv_distinct_terms(spark, SF_DIR, k=64).collect()
    assert rows
    for r in rows:
        assert r.n_estimated > 0
        # KMV with k=64 has ~1/sqrt(62) ≈ 13% std error; 50% is the
        # sanity rail, not the expected error
        assert r.rel_error < 0.5, (r.source, r.n_exact, r.n_estimated)


def test_kmv_small_group_exact(spark, tmp_path):
    """Groups with fewer than k distinct terms fall back to the exact
    count (u_k undefined) — zero error."""
    from github_issues_lakehouse_spark.operators.sketches import kmv_distinct_terms

    d = str(tmp_path / "sf")
    spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "tiny", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    r = kmv_distinct_terms(spark, d, k=64).collect()[0]
    assert (r.n_exact, r.n_estimated, r.rel_error) == (3, 3, 0.0)


def test_cms_never_undercounts(spark):
    from github_issues_lakehouse_spark.operators.sketches import cms_term_counts

    rows = cms_term_counts(spark, SF_DIR).collect()
    assert len(rows) == 10
    assert all(r.overcount >= 0 for r in rows)  # CMS structural invariant
    assert all(r.n_cms >= r.n_exact for r in rows)
    assert [r.rank for r in rows] == list(range(1, 11))


def test_pagerank_mass_conserved_and_ordered(spark):
    from github_issues_lakehouse_spark.operators.graph import pagerank_trade_graph

    rows = pagerank_trade_graph(spark, SF_DIR, n_iter=2).collect()
    total = sum(r.rank for r in rows)
    # teleport + damping + dangling redistribution conserve rank mass
    assert abs(total - 1.0) < 1e-3, total
    ranks = {r.node: r.rank for r in rows}
    # suppliers aggregate many customers' trade -> every supplier should
    # outrank the median customer
    supp = [v for k, v in ranks.items() if k.startswith("s:")]
    cust = sorted(v for k, v in ranks.items() if k.startswith("c:"))
    median_cust = cust[len(cust) // 2]
    assert min(supp) > median_cust


def test_label_association_rules_invariants(spark):
    from github_issues_lakehouse_spark.operators.relational6 import (
        label_association_rules,
    )

    rows = label_association_rules(spark, SF_DIR, min_pair_count=5).collect()
    assert rows
    seen = set()
    for r in rows:
        assert 0 < r.support_ppm <= r.confidence_ppm <= 1_000_000
        assert r.lift_e6 > 0
        seen.add((r.label_a, r.label_b))
    # symmetric pair existence: a->b implies b->a (same n_both)
    for a, b in seen:
        assert (b, a) in seen
    # every Blocker is a priority label on '1-URGENT' orders whose kind
    # label depends only on the key mod — lift of (Blocker -> Bug)
    # should be close to independence (~1e6 in e6 units), not degenerate
    by_pair = {(r.label_a, r.label_b): r for r in rows}
    if ("Blocker", "Bug") in by_pair:
        assert 500_000 < by_pair[("Blocker", "Bug")].lift_e6 < 2_000_000


def test_daily_anomaly_flags_spike(spark, tmp_path):
    """A synthetic 10x volume spike after a flat week must be
    flagged; flat days must not be."""
    import datetime

    from github_issues_lakehouse_spark.operators.relational6 import (
        daily_anomaly_events,
    )

    d = str(tmp_path / "sf")
    rows = []
    eid = 0
    base = datetime.datetime(2020, 3, 1)
    for day in range(10):
        # days 0-8: ~20 events/day with mild jitter, day 9: 200
        n = 200 if day == 9 else 20 + (day % 3)
        for i in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=day, seconds=i), 1, "click", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    res = {r.day.isoformat(): r for r in daily_anomaly_events(spark, d).collect()}
    assert res["2020-03-10"].is_anomaly
    assert res["2020-03-10"].z_score > 50
    # flat days with a settled trailing sample (>=5 days) stay quiet;
    # the 2-3 sample warmup days can legitimately trip a 2-sigma bar
    for k in ("2020-03-06", "2020-03-07", "2020-03-08", "2020-03-09"):
        assert not res[k].is_anomaly, k


def test_mixture_resample_thins_overrepresented_sources(spark, tmp_path):
    from github_issues_lakehouse_spark.operators.text2 import mixture_resample

    d = str(tmp_path / "sf")
    rows = [(i, f"doc {i} words here", "en", "big" if i < 900 else "small", 10)
            for i in range(1000)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    res = mixture_resample(spark, d)
    kept = res.filter("keep").groupBy("source").count().collect()
    by_src = {r.source: r["count"] for r in kept}
    # target = 500/source: 'small' (100 docs) keeps all, 'big' (900)
    # thins toward 500 (binomial, wide tolerance)
    assert by_src["small"] == 100
    assert 400 < by_src["big"] < 600, by_src
    # determinism
    again = mixture_resample(spark, d)
    assert res.exceptAll(again).count() == 0


def test_redact_spans_removes_only_contaminated_tokens(spark, tmp_path):
    from github_issues_lakehouse_spark.operators.chunking import (
        redact_contaminated_spans,
    )

    d = str(tmp_path / "sf")
    # doc 0 (doc_id % 100 == 0) is the benchmark; docs 1-3 train
    rows = [
        (0, "alpha beta gamma", "en", "bench", 16),
        (1, "x y alpha beta gamma z w", "en", "train", 24),  # one leaked 3-gram
        (2, "p q r s t", "en", "train", 9),                   # clean
        (3, "alpha beta gamma alpha beta gamma", "en", "train", 33),  # all leaked
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    res = {r.doc_id: r for r in redact_contaminated_spans(spark, d, n=3).collect()}
    assert set(res) == {1, 2, 3}
    assert res[1].clean_text == "x y z w" and res[1].n_removed == 3
    assert res[2].clean_text == "p q r s t" and res[2].n_removed == 0
    assert res[3].clean_text == "" and res[3].n_removed == 6


def test_length_bucketed_batches_waste_bound(spark):
    from github_issues_lakehouse_spark.operators.chunking import (
        length_bucketed_batches,
    )

    band_width, batch_size = 32, 8
    rows = length_bucketed_batches(spark, SF_DIR, band_width, batch_size).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_docs <= batch_size
        # within-band spread < band_width per doc -> bounded waste
        assert r.padding_waste <= (band_width - 1) * (r.n_docs - 1)
        assert r.max_tokens // band_width == r.band


def test_source_interleave_spreads_sources(spark):
    from github_issues_lakehouse_spark.operators.chunking import (
        source_interleave_plan,
    )

    rows = source_interleave_plan(spark, SF_DIR).collect()
    assert all(0.0 < r.interleave_key < 1.0 for r in rows)
    # sorting by key interleaves: in any prefix of the global order,
    # every source's share of the prefix is close to its corpus share
    ordered = sorted(rows, key=lambda r: (r.interleave_key, r.doc_id))
    n = len(ordered)
    prefix = ordered[: n // 4]
    from collections import Counter

    full = Counter(r.source for r in ordered)
    part = Counter(r.source for r in prefix)
    for src, total in full.items():
        expect = total / 4
        assert abs(part.get(src, 0) - expect) <= max(2, 0.5 * expect), src


def test_yoy_revenue_window(spark):
    from github_issues_lakehouse_spark.operators.relational6 import yoy_revenue

    rows = {r.month: r for r in yoy_revenue(spark, SF_DIR).collect()}
    months = sorted(rows)
    assert len(months) > 24
    # first 12 months have no prior-year reference
    for m in months[:12]:
        assert rows[m].revenue_prev_year_cents is None and rows[m].yoy_pct is None
    # spot-check the lag: month 13's prev_year equals month 1's revenue
    assert rows[months[12]].revenue_prev_year_cents == rows[months[0]].revenue_cents


def test_event_order_inversions_detects_disorder(spark, tmp_path):
    import datetime

    from github_issues_lakehouse_spark.operators.relational6 import (
        event_order_inversions,
    )

    d = str(tmp_path / "sf")
    base = datetime.datetime(2020, 1, 1)

    def ev(i, seconds, uid):
        return (i, base + datetime.timedelta(seconds=seconds), uid, "click", 1.0, "{}")

    # user 1: perfectly ordered; user 2: one 90s backward jump
    spark.createDataFrame(
        [ev(1, 0, 1), ev(2, 10, 1), ev(3, 20, 1),
         ev(4, 0, 2), ev(5, 100, 2), ev(6, 10, 2)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    rows = {r.user_id: r for r in event_order_inversions(spark, d).collect()}
    assert rows[1].n_inversions == 0 and rows[1].max_disorder_s is None
    assert rows[2].n_inversions == 1
    assert rows[2].max_disorder_s == 90.0


def test_weighted_median_known_answer(spark, tmp_path):
    """Hand-computable case: prices 10 (w=1), 20 (w=2), 30 (w=1);
    total 4, half 2 -> min price with cum*2 >= 4 is 20. Also check a
    bucket boundary: bucket_width smaller than price spread."""
    d = str(tmp_path / "sf")
    rows = [
        (1, 10.0, 1.0, "A"), (2, 20.0, 2.0, "A"), (3, 30.0, 1.0, "A"),
        # group B: all weight on one price
        (4, 99.0, 5.0, "B"),
    ]
    spark.createDataFrame(
        [(i, 1, p, q, f) for i, p, q, f in rows],
        "l_orderkey long, l_linenumber long, l_extendedprice double, l_quantity double, l_returnflag string",
    ).write.parquet(f"{d}/lineitem.parquet")
    from github_issues_lakehouse_spark.operators.relational6 import (
        weighted_median_price,
    )

    for width in (5, 1000):
        got = {r.grp: r for r in weighted_median_price(spark, d, bucket_width=width).collect()}
        assert got["A"].weighted_median_cents == 2000, width
        assert got["B"].weighted_median_cents == 9900
        assert got["A"].total_weight_e2 == 400


def test_weighted_median_matches_numpy(spark):
    """Bucketed two-pass result equals a brute-force driver-side
    weighted median on the real table."""
    from github_issues_lakehouse_spark.operators.relational6 import (
        weighted_median_price,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    got = {r.grp: r.weighted_median_cents
           for r in weighted_median_price(spark, SF_DIR, bucket_width=500).collect()}
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    from collections import defaultdict

    acc = defaultdict(lambda: defaultdict(float))
    for r in li:
        acc[r.l_returnflag][r.l_extendedprice] += r.l_quantity
    for grp, wmap in acc.items():
        total = sum(wmap.values())
        cum = 0.0
        for price in sorted(wmap):
            cum += wmap[price]
            if cum * 2 >= total:
                assert got[grp] == round(price * 100), grp
                break


def test_weighted_quantiles_consistent_with_median(spark):
    """The q=50 row of the quantile suite equals weighted_median_price
    and quantile values are monotone in q."""
    from github_issues_lakehouse_spark.operators.relational6 import (
        weighted_median_price,
        weighted_quantiles_price,
    )

    suite = weighted_quantiles_price(spark, SF_DIR).collect()
    med = {r.grp: r.weighted_median_cents
           for r in weighted_median_price(spark, SF_DIR).collect()}
    by_grp = {}
    for r in suite:
        by_grp.setdefault(r.grp, {})[r.q_pct] = r.quantile_value_cents
    for grp, qs in by_grp.items():
        assert set(qs) == {25, 50, 75, 90}
        assert qs[50] == med[grp]
        assert qs[25] <= qs[50] <= qs[75] <= qs[90]
