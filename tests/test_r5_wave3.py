"""Round-5 third-wave invariants: distribution audits (Benford, Gini,
KS, autocorrelation), boilerplate prefix families, and the Bloom FPR
calibration. Value parity vs DuckDB is pinned by test_oracle.py; these
tests pin the statistical identities a hash can't explain —
independent Python recomputation, structural bounds, and the
never-undercount/never-miss contracts."""

import math

from pyspark.sql import functions as F

from github_issues_lakehouse_spark.operators import statistics as ST
from github_issues_lakehouse_spark.operators.chunking import bloom_fpr_audit
from github_issues_lakehouse_spark.operators.text6 import boilerplate_prefix_stats
from github_issues_lakehouse_spark.operators.timeseries import autocorr_daily, _daily_grid
from github_issues_lakehouse_spark.sources.registry import load_table

from .conftest import SF_DIR


def test_benford_shares_sum_to_one(spark):
    """Observed shares cover the whole table (sum within integer-div
    slack of 1e6 ppm), expected shares are the frozen Benford table,
    and every digit row is present."""
    rows = {r.digit: r for r in ST.benford_first_digit(spark, SF_DIR).collect()}
    assert set(rows) == set(range(1, 10))
    obs_total = sum(r.obs_ppm for r in rows.values())
    assert 1_000_000 - 9 <= obs_total <= 1_000_000
    for d, r in rows.items():
        assert r.benford_ppm == math.floor(math.log10(1 + 1 / d) * 1e6)
        # chi2 contribution recomputed independently
        assert r.chi2_contrib_e6 == (r.obs_ppm - r.benford_ppm) ** 2 // r.benford_ppm
    n_total = sum(r.n_orders for r in rows.values())
    n_orders = load_table(spark, SF_DIR, "orders").count()
    assert n_total == n_orders


def test_gini_matches_python_sorted_rank_formula(spark):
    """The band/carry value-grain identity equals the textbook sorted
    per-row rank formula computed in Python."""
    o = load_table(spark, SF_DIR, "orders")
    per = sorted(
        r.v
        for r in o.groupBy("o_custkey")
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).alias(
                "v"
            )
        )
        .collect()
    )
    n, t = len(per), sum(per)
    want = (2 * sum((i + 1) * x for i, x in enumerate(per))) / (n * t) - (n + 1) / n
    got = ST.gini_revenue(spark, SF_DIR).collect()[0]
    assert got.n_customers == n and got.total_cents == t
    assert abs(got.gini - want) < 1e-6
    assert 0.0 <= got.gini < 1.0


def test_ks_matches_python_ecdf_scan(spark):
    """ks_ppm equals the max integer-ppm ECDF gap recomputed in
    Python, and the attaining price is the smallest maximizer."""
    p = load_table(spark, SF_DIR, "part").select(
        (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long").alias("v"),
        F.col("p_type").startswith("PROMO").alias("g"),
    )
    rows = p.collect()
    a = sorted(r.v for r in rows if r.g)
    b = sorted(r.v for r in rows if not r.g)
    vals = sorted(set(a) | set(b))

    def ppm(part, total):
        return (part * 1000 // total) * 1000 + (part * 1000 % total) * 1000 // total

    import bisect

    best, at = -1, None
    for v in vals:
        ca, cb = bisect.bisect_right(a, v), bisect.bisect_right(b, v)
        gap = abs(ppm(ca, len(a)) - ppm(cb, len(b)))
        if gap > best:
            best, at = gap, v
    got = ST.ks_promo_price(spark, SF_DIR).collect()[0]
    assert (got.n_promo, got.n_other) == (len(a), len(b))
    assert got.ks_ppm == best and got.at_price_cents == at


def test_autocorr_matches_python_pearson(spark):
    """Every (type, lag) autocorrelation equals numpy-free Python
    Pearson on the lagged grid series; lag-0 would be 1 by identity
    (not emitted), and n_pairs shrinks by one per lag step."""
    grid = sorted(
        _daily_grid(spark, SF_DIR).collect(), key=lambda r: (r.event_type, r.day)
    )
    series = {}
    for r in grid:
        series.setdefault(r.event_type, []).append(r.n)
    got = {
        (r.event_type, r.lag): r
        for r in autocorr_daily(spark, SF_DIR).collect()
    }
    for et, xs in series.items():
        for k in range(1, 8):
            pairs = [(xs[i], xs[i - k]) for i in range(k, len(xs))]
            r = got[(et, k)]
            assert r.n_pairs == len(pairs)
            n = len(pairs)
            sx = sum(x for x, _ in pairs)
            sy = sum(y for _, y in pairs)
            sxy = sum(x * y for x, y in pairs)
            sxx = sum(x * x for x, _ in pairs)
            syy = sum(y * y for _, y in pairs)
            d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
            if d1 > 0 and d2 > 0:
                want = (n * sxy - sx * sy) / math.sqrt(d1 * d2)
                assert abs(r.autocorr - want) < 1e-6
            else:
                assert r.autocorr is None


def test_boilerplate_prefix_counts_cover_corpus(spark):
    """Top families are ranked by size, counts never exceed the
    corpus, and every family's share is consistent with its count."""
    rows = boilerplate_prefix_stats(spark, SF_DIR).collect()
    n_total = load_table(spark, SF_DIR, "documents").count()
    sizes = [r.n_docs for r in rows]
    assert sizes == sorted(sizes, reverse=True)
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert 1 <= r.n_docs <= n_total
        assert 1 <= r.n_sources
        assert len(r.prefix) <= 40
        want_ppm = (r.n_docs * 1000 // n_total) * 1000 + (
            r.n_docs * 1000 % n_total
        ) * 1000 // n_total
        assert r.share_ppm == want_ppm


def test_bloom_fpr_audit_invariants(spark):
    """Bloom contracts: no false negatives by construction (so the
    probe set is all TRUE negatives), measured FPR consistent with
    counts, theoretical FPR is the fill-ratio power, and the filter
    is non-trivially loaded."""
    r = bloom_fpr_audit(spark, SF_DIR).collect()[0]
    assert r.n_bench_grams > 0 and r.n_clean_probes > 0
    assert 0 < r.n_bits_set <= min(r.m_bits, r.n_bench_grams * r.k_hashes)
    assert 0 <= r.n_false_pos <= r.n_clean_probes
    ratio = r.n_bits_set / r.m_bits
    # chained multiplication, matching the engine expression exactly
    # (pow() could differ by an ulp at a floor boundary)
    assert r.theoretical_fpr_ppm == math.floor(ratio * ratio * ratio * ratio * 1e6)
    want_ppm = (r.n_false_pos * 1000 // r.n_clean_probes) * 1000 + (
        r.n_false_pos * 1000 % r.n_clean_probes
    ) * 1000 // r.n_clean_probes
    assert r.measured_fpr_ppm == want_ppm


def test_entropy_rate_bounds_and_python_recompute(spark):
    """0 <= H(next|x) <= ln(n_successors), and the micro-nat fold
    equals an independent Python recomputation from transition
    counts."""
    from github_issues_lakehouse_spark.operators.markov import (
        _transition_counts,
        event_entropy_rate,
    )

    counts = {}
    for r in _transition_counts(spark, SF_DIR).collect():
        counts.setdefault(r.from_type, {})[r.to_type] = r.n
    got = {r.from_type: r for r in event_entropy_rate(spark, SF_DIR).collect()}
    assert set(got) == set(counts)
    for f, succ in counts.items():
        c_x = sum(succ.values())
        want = (
            sum(
                n * round(-1_000_000.0 * math.log(n / c_x))
                for n in succ.values()
            )
            // c_x
        )
        r = got[f]
        assert r.n_transitions == c_x and r.n_successors == len(succ)
        assert r.entropy_micro_nats == want
        assert 0 <= r.entropy_micro_nats <= math.log(len(succ)) * 1e6 + 1


def test_markov_stationary_is_fixed_point_and_conserves_mass(spark):
    """After 20 integer iterations the distribution is (a) close to a
    fixed point of one more iteration, (b) sums to ~1e6 minus bounded
    flooring leak, (c) strictly positive for every recurrent type."""
    from github_issues_lakehouse_spark.operators.markov import (
        markov_stationary_events,
    )

    r20 = {r.event_type: r.stationary_e6 for r in markov_stationary_events(spark, SF_DIR).collect()}
    r21 = {
        r.event_type: r.stationary_e6
        for r in markov_stationary_events(spark, SF_DIR, n_iter=21).collect()
    }
    k = len(r20)
    total = sum(r20.values())
    # each iteration floors away < k e6-units; 20 iterations from 1e6
    assert 1_000_000 - 21 * k <= total <= 1_000_000
    for t in r20:
        assert abs(r20[t] - r21[t]) <= 100  # converged to ~1e-4
        assert r20[t] > 0


def test_vocab_growth_monotone_and_conserves_vocab(spark):
    """cum_vocab is nondecreasing and ends at the corpus vocabulary;
    bucket 0's terms are all new by construction."""
    from github_issues_lakehouse_spark.operators.text6 import vocab_growth_curve
    from github_issues_lakehouse_spark.functions.textfns import norm_tokens

    rows = vocab_growth_curve(spark, SF_DIR).collect()
    assert rows[0].n_new_terms == rows[0].n_bucket_terms
    cums = [r.cum_vocab for r in rows]
    assert cums == sorted(cums)
    assert sum(r.n_new_terms for r in rows) == cums[-1]
    vocab = (
        load_table(spark, SF_DIR, "documents")
        .select(F.explode(norm_tokens(F.col("text"))).alias("t"))
        .agg(F.count_distinct("t"))
        .collect()[0][0]
    )
    assert cums[-1] == vocab
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_simpson_matches_python_collision_probability(spark):
    """simpson_lambda equals the Python collision probability per
    source, and sits in [0, 1]."""
    from collections import Counter

    from github_issues_lakehouse_spark.operators.text6 import (
        simpson_diversity_by_source,
    )

    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    by_src = {}
    for r in docs:
        toks = " ".join(r.text.lower().split()).split(" ")
        by_src.setdefault(r.source, Counter()).update(toks)
    got = {r.source: r for r in simpson_diversity_by_source(spark, SF_DIR).collect()}
    assert set(got) == set(by_src)
    for s, cnt in by_src.items():
        n = sum(cnt.values())
        coll = sum(c * (c - 1) for c in cnt.values())
        r = got[s]
        assert r.n_tokens == n and r.n_terms == len(cnt)
        assert abs(r.simpson_lambda - coll / (n * (n - 1))) < 1e-6
        assert 0.0 <= r.simpson_lambda <= 1.0


def test_contingency_dependence_python_recompute(spark):
    """chi2/MI equal an independent Python recomputation from the raw
    contingency cells; Cramer's V in [0,1]; MI >= 0 within freeze
    slack."""
    from github_issues_lakehouse_spark.operators.statistics import (
        contingency_dependence,
    )

    o = load_table(spark, SF_DIR, "orders").select("o_orderpriority", "o_orderstatus")
    cells = {}
    for r in o.collect():
        cells[(r.o_orderpriority, r.o_orderstatus)] = (
            cells.get((r.o_orderpriority, r.o_orderstatus), 0) + 1
        )
    n = sum(cells.values())
    rows = {x for x, _ in cells}
    colz = {y for _, y in cells}
    n_x = {x: sum(v for (a, _), v in cells.items() if a == x) for x in rows}
    n_y = {y: sum(v for (_, b), v in cells.items() if b == y) for y in colz}
    chi = mi = 0
    for (x, y), o_ in cells.items():
        e = n_x[x] * n_y[y] / n
        chi += round(1_000_000.0 * (o_ - e) * (o_ - e) / e)
        mi += round(1_000_000.0 * (o_ / n) * math.log(o_ * n / (n_x[x] * n_y[y])))
    got = contingency_dependence(spark, SF_DIR).collect()[0]
    assert got.n_orders == n
    assert got.chi2_e6 == chi and got.mi_micro_nats == mi
    assert got.dof == (len(rows) - 1) * (len(colz) - 1)
    assert 0.0 <= got.cramer_v <= 1.0
    assert got.mi_micro_nats >= -len(cells)  # freeze slack only


def test_lorenz_deciles_consistency_with_gini(spark):
    """Deciles partition customers and revenue exactly; shares are
    monotone nondecreasing (poorest decile first); the curve is
    consistent with gini_revenue's inequality verdict (below the
    diagonal whenever gini > 0)."""
    from github_issues_lakehouse_spark.operators.statistics import (
        gini_revenue,
        lorenz_deciles,
    )

    rows = lorenz_deciles(spark, SF_DIR).collect()
    g = gini_revenue(spark, SF_DIR).collect()[0]
    assert [r.decile for r in rows] == list(range(1, 11))
    assert sum(r.n_customers for r in rows) == g.n_customers
    assert sum(r.revenue_cents for r in rows) == g.total_cents
    shares = [r.revenue_share_ppm for r in rows]
    assert shares == sorted(shares)
    assert rows[-1].cum_share_ppm >= 999_990  # integer-div slack
    if g.gini > 0.001:
        # poorest 10% hold less than 10% of revenue
        assert rows[0].cum_share_ppm < 100_000
    # decile sizes differ by at most 1 from n/10
    for r in rows:
        assert abs(r.n_customers - g.n_customers / 10) <= 1


def test_fano_matches_python_and_flags_overdispersion(spark):
    """Fano factor equals Python variance/mean on the grid series."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        fano_daily_dispersion,
    )

    grid = sorted(
        _daily_grid(spark, SF_DIR).collect(), key=lambda r: (r.event_type, r.day)
    )
    series = {}
    for r in grid:
        series.setdefault(r.event_type, []).append(r.n)
    got = {r.event_type: r for r in fano_daily_dispersion(spark, SF_DIR).collect()}
    for et, xs in series.items():
        n, sx = len(xs), sum(xs)
        var = sum(x * x for x in xs) / n - (sx / n) ** 2
        r = got[et]
        assert r.n_days == n and r.n_events == sx
        if sx:
            assert abs(r.fano_factor - var / (sx / n)) < 1e-5


def test_stopword_mass_python_recompute(spark):
    """Stopword masses equal a Python recomputation with the same
    data-driven top-20 set."""
    from collections import Counter

    from github_issues_lakehouse_spark.operators.text6 import stopword_mass_by_source

    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    global_cnt = Counter()
    per_src = {}
    for r in docs:
        toks = " ".join(r.text.lower().split()).split(" ")
        global_cnt.update(toks)
        per_src.setdefault(r.source, []).extend(toks)
    top = {t for t, _ in sorted(global_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]}
    got = {r.source: r for r in stopword_mass_by_source(spark, SF_DIR).collect()}
    assert set(got) == set(per_src)
    for s, toks in per_src.items():
        n_stop = sum(1 for t in toks if t in top)
        r = got[s]
        assert r.n_tokens == len(toks) and r.n_stop_tokens == n_stop
        assert r.n_stop_terms_present == len(top & set(toks))


def test_theil_hoover_python_recompute(spark):
    """Theil and Hoover equal independent Python recomputation with
    the identical micro-nat freeze; both nonnegative; Hoover <= Gini
    (standard inequality-ordering fact)."""
    from github_issues_lakehouse_spark.operators.statistics import (
        gini_revenue,
        theil_hoover_indices,
    )

    o = load_table(spark, SF_DIR, "orders")
    per = [
        r.v
        for r in o.groupBy("o_custkey")
        .agg(
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")).alias("v")
        )
        .collect()
    ]
    n, t = len(per), sum(per)
    from collections import Counter

    vals = Counter(per)
    s_theil = sum(
        c * v * round(1_000_000.0 * math.log(v * n / t)) for v, c in vals.items()
    )
    s_hoover = sum(c * abs(v * n - t) for v, c in vals.items())
    got = theil_hoover_indices(spark, SF_DIR).collect()[0]
    assert got.n_customers == n and got.total_cents == t
    assert abs(got.theil - s_theil / t / 1e6) < 1e-6
    assert abs(got.hoover - s_hoover / (2 * t * n)) < 1e-6
    assert got.theil >= 0 and got.hoover >= 0
    g = gini_revenue(spark, SF_DIR).collect()[0]
    assert got.hoover <= g.gini + 1e-6


def test_referential_integrity_clean_on_generated_data(spark):
    """The generated star schema is referentially clean (0 orphans on
    every edge) and the audit's counts match the raw tables."""
    from github_issues_lakehouse_spark.operators.quality_checks import (
        referential_integrity_audit,
    )

    rows = {r.fk_edge: r for r in referential_integrity_audit(spark, SF_DIR).collect()}
    assert len(rows) == 7
    for r in rows.values():
        assert r.n_orphan_rows == 0 and r.n_orphan_keys == 0 and r.orphan_ppm == 0
    li = load_table(spark, SF_DIR, "lineitem").count()
    assert rows["lineitem.l_orderkey -> orders.o_orderkey"].n_child_rows == li


def test_referential_integrity_detects_planted_orphans(spark, tmp_path):
    """Planting orphan rows flips exactly the right edge — the audit
    is not vacuously green."""
    import os
    import shutil

    from github_issues_lakehouse_spark.operators.quality_checks import (
        referential_integrity_audit,
    )

    dst = str(tmp_path / "sf_orphan")
    shutil.copytree(SF_DIR, dst)
    li = spark.read.parquet(f"{dst}/lineitem.parquet")
    bad = li.limit(3).withColumn("l_orderkey", F.lit(999_999_999))
    li.unionByName(bad).write.mode("overwrite").parquet(f"{dst}/lineitem2.parquet")
    os.remove(f"{dst}/lineitem.parquet")  # driver testdata is a single file
    shutil.move(f"{dst}/lineitem2.parquet", f"{dst}/lineitem.parquet")
    rows = {r.fk_edge: r for r in referential_integrity_audit(spark, dst).collect()}
    assert rows["lineitem.l_orderkey -> orders.o_orderkey"].n_orphan_rows == 3
    assert rows["lineitem.l_orderkey -> orders.o_orderkey"].n_orphan_keys == 1
    assert rows["lineitem.l_partkey -> part.p_partkey"].n_orphan_rows == 0


def test_k_anonymity_partitions_customers(spark):
    """Classes partition the customer table; below_k is consistent
    with class_size; l_diversity within [1, 3]."""
    from github_issues_lakehouse_spark.operators.quality_checks import k_anonymity_audit

    rows = k_anonymity_audit(spark, SF_DIR).collect()
    n = load_table(spark, SF_DIR, "customer").count()
    assert sum(r.class_size for r in rows) == n
    for r in rows:
        assert r.below_k == (1 if r.class_size < 5 else 0)
        assert 1 <= r.l_diversity <= 3
    sizes = [r.class_size for r in rows]
    assert sizes == sorted(sizes)


def test_forecast_backtest_matches_manual_pairing(spark):
    """MAE/WAPE equal a manual pairing of holt forecasts with next
    actuals."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        forecast_backtest_holt,
        holt_linear_daily,
    )

    h = sorted(
        holt_linear_daily(spark, SF_DIR).collect(), key=lambda r: (r.event_type, r.day)
    )
    series = {}
    for r in h:
        series.setdefault(r.event_type, []).append(r)
    got = {r.event_type: r for r in forecast_backtest_holt(spark, SF_DIR).collect()}
    for et, rows in series.items():
        errs = [
            abs(rows[i].forecast_next_e2 - rows[i + 1].n_events * 100)
            for i in range(len(rows) - 1)
        ]
        actual = sum(rows[i + 1].n_events * 100 for i in range(len(rows) - 1))
        r = got[et]
        assert r.n_forecasts == len(errs)
        assert r.mae_e2 == sum(errs) // len(errs)
        ppm = (sum(errs) * 1000 // actual) * 1000 + (sum(errs) * 1000 % actual) * 1000 // actual
        assert r.wape_ppm == ppm


def test_source_vocab_overlap_python_recompute(spark):
    """Jaccard/overlap ppm equal a Python set recomputation for every
    source pair; all 190 pairs present; symmetric-by-construction
    (src_a < src_b)."""
    from github_issues_lakehouse_spark.operators.text6 import source_vocab_overlap

    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    vocab = {}
    for r in docs:
        toks = " ".join(r.text.lower().split()).split(" ")
        vocab.setdefault(r.source, set()).update(toks)
    got = {(r.src_a, r.src_b): r for r in source_vocab_overlap(spark, SF_DIR).collect()}
    srcs = sorted(vocab)
    expected_pairs = [(a, b) for i, a in enumerate(srcs) for b in srcs[i + 1:]]
    # pairs with zero overlap are absent by inner-join construction
    for a, b in expected_pairs:
        inter = len(vocab[a] & vocab[b])
        if inter == 0:
            assert (a, b) not in got
            continue
        r = got[(a, b)]
        assert r.n_terms_a == len(vocab[a]) and r.n_terms_b == len(vocab[b])
        assert r.n_common == inter

        def ppm(p, t):
            return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

        assert r.jaccard_ppm == ppm(inter, len(vocab[a]) + len(vocab[b]) - inter)
        assert r.overlap_ppm == ppm(inter, min(len(vocab[a]), len(vocab[b])))


def test_anova_python_recompute(spark):
    """eta2/F equal a Python recomputation with the identical frozen
    1e12-unit between-terms; group means and sizes exact."""
    from collections import defaultdict

    from github_issues_lakehouse_spark.operators.statistics import (
        anova_price_by_returnflag,
    )

    li = load_table(spark, SF_DIR, "lineitem").select("l_returnflag", "l_extendedprice")
    groups = defaultdict(list)
    for r in li.collect():
        groups[r.l_returnflag].append(int(round(float(r.l_extendedprice) * 100)))
    N = sum(len(v) for v in groups.values())
    S = sum(sum(v) for v in groups.values())
    SS = sum(x * x for v in groups.values() for x in v)
    k = len(groups)
    sum_bt_t = sum(round(sum(v) * sum(v) / len(v) / 1.0e12) for v in groups.values())
    st2 = round(S * S / N / 1.0e12)
    ss_total = SS / 1.0e12 - st2
    ss_between = sum_bt_t - st2
    eta2 = ss_between / ss_total
    f = (ss_between / (k - 1)) / ((ss_total - ss_between) / (N - k))
    rows = anova_price_by_returnflag(spark, SF_DIR).collect()
    assert len(rows) == k
    for r in rows:
        assert abs(r.eta_squared - eta2) < 1e-6
        assert abs(r.f_stat - f) < 1e-3
        assert r.n_items == len(groups[r.returnflag])
        assert abs(r.mean_price - sum(groups[r.returnflag]) / r.n_items / 100) < 1e-4
    assert 0.0 <= rows[0].eta_squared <= 1.0


def test_sim_histogram_covers_all_sample_pairs(spark):
    """Band counts sum to exactly C(sample, 2) (triangle block cover
    is complete and non-overlapping), bands are within [-10, 9], and
    shares sum to ~1e6 ppm."""
    from github_issues_lakehouse_spark.operators.similarity import (
        embedding_sim_histogram,
    )

    rows = embedding_sim_histogram(spark, SF_DIR).collect()
    import hashlib

    n_sample = 0
    for r in load_table(spark, SF_DIR, "embeddings").select("vec_id").collect():
        h = int(hashlib.md5(f"{r.vec_id}#simhist".encode()).hexdigest()[:8], 16)
        if h % 100 < 20:
            n_sample += 1
    total = sum(r.n_pairs for r in rows)
    assert total == n_sample * (n_sample - 1) // 2
    for r in rows:
        assert -10 <= r.band <= 9
    assert 1_000_000 - len(rows) <= sum(r.share_ppm for r in rows) <= 1_000_000


def test_band_tuning_monotone_in_bands(spark):
    """More bands => lower S-curve threshold and (weakly) more
    candidate pairs; the 1-band config is the strictest (candidates
    need ALL 12 hashes equal) and must be a subset count of every
    other config's pairs."""
    from github_issues_lakehouse_spark.operators.dedup import (
        lsh_scurve_thresh_e6,
        minhash_band_tuning,
    )

    rows = minhash_band_tuning(spark, SF_DIR).collect()
    assert [r.bands for r in rows] == [1, 2, 3, 4, 6, 12]
    for r in rows:
        assert r.bands * r.rows_per_band == 12
        assert r.thresh_e6 == lsh_scurve_thresh_e6(r.bands, r.rows_per_band)
    th = [r.thresh_e6 for r in rows]
    assert th == sorted(th, reverse=True)
    pairs = [r.n_candidate_pairs for r in rows]
    assert pairs == sorted(pairs)  # monotone nondecreasing with bands
    assert rows[0].thresh_e6 == 1_000_000  # (1/1)^(1/12) = 1


def test_fulfillment_latency_percentile_identity(spark):
    """p50/p90 equal the Python percentile_disc rule on the raw
    latency lists; p50 <= p90; counts partition the fact join."""
    from github_issues_lakehouse_spark.operators.relational7 import (
        fulfillment_latency_percentiles,
    )

    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority", F.datediff("l_shipdate", "o_orderdate").alias("d")
    )
    per = {}
    for r in j.collect():
        per.setdefault(r.o_orderpriority, []).append(r.d)
    got = {r.priority: r for r in fulfillment_latency_percentiles(spark, SF_DIR).collect()}
    assert set(got) == set(per)
    for p, ds in per.items():
        ds.sort()
        n = len(ds)

        def disc(q):
            import math

            return ds[math.ceil(q * n / 100) - 1]

        r = got[p]
        assert r.n_items == n
        assert r.p50_days == disc(50) and r.p90_days == disc(90)
        assert r.p50_days <= r.p90_days
        assert r.mean_days_e2 == sum(ds) * 100 // n


def test_survival_curve_monotone_and_anchored(spark):
    """Survival is nonincreasing, week 0 covers everyone, and counts
    equal a Python lifetime recomputation."""
    from github_issues_lakehouse_spark.operators.timeseries import user_survival_curve

    e = load_table(spark, SF_DIR, "events").select("user_id", F.to_date("ts").alias("d"))
    per = {}
    for r in e.collect():
        lo, hi = per.get(r.user_id, (r.d, r.d))
        per[r.user_id] = (min(lo, r.d), max(hi, r.d))
    lifetimes = [((hi - lo).days) // 7 for lo, hi in per.values()]
    rows = user_survival_curve(spark, SF_DIR).collect()
    assert rows[0].week == 0 and rows[0].n_survivors == len(lifetimes)
    assert rows[0].survival_ppm >= 999_999
    surv = [r.n_survivors for r in rows]
    assert surv == sorted(surv, reverse=True)
    for r in rows:
        assert r.n_survivors == sum(1 for w in lifetimes if w >= r.week)


def test_quality_drift_bounds_and_split(spark):
    """Per source: halves partition the docs, KS in [0, 1e6]; a
    shuffled synthetic with identical halves scores low drift
    implicitly via the generated corpus (no assertion on magnitude —
    the split is id-based and the corpus is homogeneous, so KS must
    be far from 1e6)."""
    from github_issues_lakehouse_spark.operators.quality_checks import (
        quality_temporal_drift,
    )

    rows = quality_temporal_drift(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_early + r.n_late for r in rows) == n_docs
    for r in rows:
        assert r.n_early > 0 and r.n_late > 0
        assert 0 <= r.ks_ppm <= 1_000_000
        assert r.ks_ppm < 900_000  # homogeneous synthetic corpus


def test_pareto_frontier_dominance(spark):
    """No frontier point dominates another, and every non-frontier
    (size, price) pair is dominated by some frontier point — the two
    defining skyline properties, checked against the raw pairs."""
    from github_issues_lakehouse_spark.operators.relational7 import (
        pareto_frontier_parts,
    )

    p = load_table(spark, SF_DIR, "part").select(
        F.col("p_size").alias("s"),
        (F.col("p_retailprice").cast("decimal(18,2)") * 100).cast("long").alias("p"),
    )
    pairs = {(r.s, r.p) for r in p.distinct().collect()}
    frontier = {(r.size, r.price_cents) for r in pareto_frontier_parts(spark, SF_DIR).collect()}
    assert frontier <= pairs

    def dominates(a, b):
        return a[0] >= b[0] and a[1] <= b[1] and a != b

    for f in frontier:
        assert not any(dominates(o, f) for o in pairs)
    for o in pairs - frontier:
        assert any(dominates(f, o) for f in frontier)


def test_hhi_python_recompute_and_bounds(spark):
    """HHI equals Python recomputation from exact integer shares;
    bounds: max(share)^2 <= HHI <= 1e6; effective competitors
    consistent."""
    from collections import defaultdict

    from github_issues_lakehouse_spark.operators.statistics import (
        market_concentration_hhi,
    )

    o = load_table(spark, SF_DIR, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, SF_DIR, "customer").select(
        "c_custkey", "c_mktsegment", "c_nationkey"
    )
    j = o.join(c, o.o_custkey == c.c_custkey).collect()
    cells = defaultdict(int)
    for r in j:
        cells[(r.c_mktsegment, r.c_nationkey)] += int(
            round(float(r.o_totalprice) * 100)
        )
    seg_rev = defaultdict(int)
    for (s, n), v in cells.items():
        seg_rev[s] += v

    def ppm(p, t):
        return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

    got = {r.segment: r for r in market_concentration_hhi(spark, SF_DIR).collect()}
    for s, total in seg_rev.items():
        shares = [ppm(v, total) for (s2, _), v in cells.items() if s2 == s]
        hhi = sum(x * x for x in shares) // 1_000_000
        r = got[s]
        assert r.hhi_e6 == hhi and r.revenue_cents == total
        assert r.top_share_ppm == max(shares)
        assert max(shares) ** 2 // 1_000_000 <= r.hhi_e6 <= 1_000_000
        assert r.n_effective_e2 == 100_000_000 // hhi


def test_aov_bridge_decomposition_identity(spark):
    """within + mix + residual == delta exactly (residual is the
    emitted floor slack and must be small: bounded by segment count
    + ppm rounding, here < 50 e2-cents), and month AOVs match the
    month-grain recomputation."""
    from github_issues_lakehouse_spark.operators.relational7 import (
        aov_mix_shift_bridge,
    )

    rows = aov_mix_shift_bridge(spark, SF_DIR).collect()
    assert len(rows) > 10
    for r in rows:
        assert r.within_e2 + r.mix_e2 + r.residual_e2 == r.delta_aov_e2
        # slack source: each segment's share carries <= 1 ppm rounding
        # on BOTH bridge terms, worth ~aov_e2/1e6 each, plus the two
        # term floors — proportional to AOV, tiny relative to delta
        assert abs(r.residual_e2) <= 20 * r.aov_e2 // 1_000_000 + 10
    o = load_table(spark, SF_DIR, "orders").select(
        F.date_format(F.trunc("o_orderdate", "MM"), "yyyy-MM").alias("m"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").alias("c"),
    )
    per_m = {
        r.m: (r.n, r.s)
        for r in o.groupBy("m").agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("s")).collect()
    }
    for r in rows:
        n, s_ = per_m[r.month]
        assert r.n_orders == n and r.aov_e2 == s_ * 100 // n


def test_ivf_curve_monotone_recall_and_cost(spark):
    """More probes never lower recall or candidate count, the max
    probe setting dominates, and every recall is consistent with its
    hit count."""
    from github_issues_lakehouse_spark.operators.similarity import (
        ivf_nprobe_recall_curve,
    )

    # r10: the curve carries a trained-vs-first_k geometry label;
    # the original invariants hold within the baseline geometry
    rows = [
        r
        for r in ivf_nprobe_recall_curve(spark, SF_DIR).collect()
        if r.centroids == "first_k"
    ]
    assert [r.n_probe for r in rows] == [1, 2, 4, 8]
    recalls = [r.recall_ppm for r in rows]
    cands = [r.n_candidates for r in rows]
    assert recalls == sorted(recalls)
    assert cands == sorted(cands)
    for r in rows:
        assert 0 <= r.n_hits <= 40  # n_queries * k
        want = (r.n_hits * 1000 // 40) * 1000 + (r.n_hits * 1000 % 40) * 1000 // 40
        assert r.recall_ppm == want
        assert r.n_candidates > 0


def test_jaccard_sweep_monotone_costs(spark):
    """Raising the threshold never keeps more pairs, flags more docs,
    or saves more tokens — the policy curve is monotone by
    construction; flagged docs never exceed kept pairs."""
    from github_issues_lakehouse_spark.operators.dedup import jaccard_threshold_sweep

    rows = jaccard_threshold_sweep(spark, SF_DIR).collect()
    assert [r.threshold_ppm for r in rows] == [300_000, 500_000, 700_000, 900_000]
    for a, b in zip(rows, rows[1:]):
        assert a.n_pairs >= b.n_pairs
        assert a.n_docs_flagged >= b.n_docs_flagged
        assert a.tokens_saved >= b.tokens_saved
    for r in rows:
        assert r.n_docs_flagged <= r.n_pairs or r.n_pairs == 0


def test_time_to_conversion_python_recompute(spark):
    """Latency histogram equals a Python recomputation of first-view
    -> first-subsequent-purchase; shares cover all viewers."""
    from github_issues_lakehouse_spark.operators.timeseries import time_to_conversion

    e = load_table(spark, SF_DIR, "events").select("user_id", "event_type", "ts").collect()
    fv, fp = {}, {}
    for r in e:
        if r.event_type == "view":
            if r.user_id not in fv or r.ts < fv[r.user_id]:
                fv[r.user_id] = r.ts
    for r in e:
        if r.event_type == "purchase" and r.user_id in fv and r.ts >= fv[r.user_id]:
            if r.user_id not in fp or r.ts < fp[r.user_id]:
                fp[r.user_id] = r.ts
    from collections import Counter

    want = Counter()
    for u, v in fv.items():
        if u in fp:
            want[(fp[u].date() - v.date()).days] += 1
        else:
            want[-1] += 1
    got = {r.days_to_convert: r.n_users for r in time_to_conversion(spark, SF_DIR).collect()}
    assert got == dict(want)
    assert sum(got.values()) == len(fv)
