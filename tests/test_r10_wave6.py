"""Round-10 wave 6: C151 `ann_filtered_topk` — filtered vector
search with the predicate pushed into IVF candidate generation
(pre-filter), and the dominance property over post-filtering."""

from __future__ import annotations

from collections import defaultdict

SF_DIR = "/root/testdata/sf0.001"

N_PROBE = 3
K = 5


def test_filtered_topk_respects_the_predicate(spark):
    """Every returned neighbor shares the query's label, never the
    query itself; ranks are contiguous from 1 per query."""
    from github_issues_lakehouse_spark.operators.similarity import (
        _corpus,
        ann_filtered_topk,
    )

    labels = {
        r["vec_id"]: r["label"]
        for r in _corpus(spark, SF_DIR).select("vec_id", "label").collect()
    }
    rows = ann_filtered_topk(spark, SF_DIR, k=K, n_probe=N_PROBE).collect()
    per_q = defaultdict(list)
    for r in rows:
        assert r["neighbor_id"] != r["q_id"]
        assert r["label"] == labels[r["q_id"]]
        assert r["label"] == labels[r["neighbor_id"]]
        per_q[r["q_id"]].append(r["rank"])
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_prefilter_dominates_postfilter(spark):
    """The production argument for pre-filtering, pinned: take the
    UNFILTERED IVF top-k over the same probed cells, then drop rows
    that violate the predicate (post-filtering). Every surviving row
    scores a within-label candidate the pre-filter search also
    scored, so it must appear in the pre-filter top-k — and the
    pre-filter result is never smaller (its k slots are spent only
    on eligible candidates)."""
    from github_issues_lakehouse_spark.operators.similarity import (
        _corpus,
        ann_filtered_topk,
        ann_ivf_topk,
    )

    labels = {
        r["vec_id"]: r["label"]
        for r in _corpus(spark, SF_DIR).select("vec_id", "label").collect()
    }
    pre = defaultdict(set)
    for r in ann_filtered_topk(spark, SF_DIR, k=K, n_probe=N_PROBE).collect():
        pre[r["q_id"]].add(r["neighbor_id"])
    post = defaultdict(set)
    for r in ann_ivf_topk(spark, SF_DIR, k=K, n_probe=N_PROBE).collect():
        if labels[r["neighbor_id"]] == labels[r["q_id"]]:
            post[r["q_id"]].add(r["neighbor_id"])
    assert pre, "no pre-filter results at all"
    for q, post_set in post.items():
        assert post_set <= pre[q], f"post-filter found a neighbor pre missed (q={q})"
        assert len(pre[q]) >= len(post_set)
    # the dominance must be strict somewhere on this corpus, or the
    # filter is vacuous and the test proves nothing
    assert any(len(pre[q]) > len(post.get(q, set())) for q in pre)


def test_facility_location_greedy_properties(spark):
    """Submodularity in action: marginal gains are monotonically
    non-increasing, coverage is the running sum of gains, picks are
    distinct pool members, and step 1 is the argmax of total clamped
    similarity (python recompute)."""
    import numpy as np

    from github_issues_lakehouse_spark.operators.clustering import (
        facility_location_selection,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    rows = facility_location_selection(spark, SF_DIR, k=8, pool=64).collect()
    assert [r["step"] for r in rows] == list(range(1, 9))
    gains = [r["gain_e6"] for r in rows]
    assert gains == sorted(gains, reverse=True), "gains must be non-increasing"
    cov = 0
    for r in rows:
        cov += r["gain_e6"]
        assert r["coverage_e6"] == cov
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == len(ids)
    assert all(v < 64 for v in ids)

    # python recompute of the full greedy walk on the exact algebra
    e = load_table(spark, SF_DIR, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in e}
    def sim_e6(a, b):
        c = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
        return max(int(round(round(c, 6) * 1e6)), 0)
    pool_ids = sorted(v for v in vecs if v < 64)
    sims = {
        c: np.array([sim_e6(vecs[v], vecs[c]) for v in sorted(vecs)], dtype=np.int64)
        for c in pool_ids
    }
    covv = np.zeros(len(vecs), dtype=np.int64)
    picked = []
    for step in range(8):
        best = None
        for c in pool_ids:
            if c in picked:
                continue
            g = int(np.maximum(sims[c] - covv, 0).sum())
            if best is None or g > best[1] or (g == best[1] and c < best[0]):
                best = (c, g)
        picked.append(best[0])
        covv = np.maximum(covv, sims[best[0]])
        r = rows[step]
        assert (r["vec_id"], r["gain_e6"]) == best, f"step {step + 1} diverges"


def test_filtered_recall_monotone_in_probes(spark):
    """More probes can only widen the candidate set, so filtered
    recall@k is monotone in n_probe; recall stays in [0, 1]."""
    from github_issues_lakehouse_spark.operators.similarity import (
        filtered_ann_recall_at_k,
    )

    def total(n_probe):
        rows = filtered_ann_recall_at_k(spark, SF_DIR, k=K, n_probe=n_probe).collect()
        assert all(0 <= r["n_hits"] <= K for r in rows)
        assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
        return sum(r["n_hits"] for r in rows)

    assert total(1) <= total(3) <= total(8)


def test_selection_coverage_audit_structure(spark):
    """Greedy's first pick is provably at least the baseline's first
    pick (argmax beats any single candidate); both coverage columns
    are monotone; lift is exact floor-ppm of the two BIGINTs."""
    from github_issues_lakehouse_spark.operators.clustering import (
        selection_coverage_audit,
    )

    rows = selection_coverage_audit(spark, SF_DIR, k=8, pool=64).collect()
    assert [r["step"] for r in rows] == list(range(1, 9))
    assert rows[0]["greedy_coverage_e6"] >= rows[0]["baseline_coverage_e6"]
    for a, b in zip(rows, rows[1:]):
        assert b["greedy_coverage_e6"] >= a["greedy_coverage_e6"]
        assert b["baseline_coverage_e6"] >= a["baseline_coverage_e6"]
    for r in rows:
        g, b = r["greedy_coverage_e6"], r["baseline_coverage_e6"]
        assert r["lift_ppm"] == g * 10**6 // b


def test_kcore_converged_within_round_bound(spark):
    """The bounded-round contract is evidence, not hope: one extra
    peel round changes nothing at the gate SF, every survivor keeps
    >= k partners among survivors, and the graph stays bipartite."""
    from github_issues_lakehouse_spark.operators.graph import kcore_trade_graph

    K_CORE, R = 6, 4
    got = sorted(map(tuple, kcore_trade_graph(spark, SF_DIR, K_CORE, R).collect()))
    extra = sorted(map(tuple, kcore_trade_graph(spark, SF_DIR, K_CORE, R + 1).collect()))
    assert got == extra, "peel had not converged within the round bound"
    assert got, "core is empty — k is miscalibrated for the gate SF"
    assert all(deg >= K_CORE for _, deg in got)
    assert {n[:2] for n, _ in got} <= {"c:", "s:"}


def test_sq_int8_recall_bounds_and_information(spark):
    """int8 recall is a real measurement: bounded, and the int8
    ranking is informative (mean recall well above the ~k/n random
    floor) — 8 bits per dim at 64 dims should retain most of the
    inner-product ordering."""
    from github_issues_lakehouse_spark.operators.vectors2 import sq_int8_recall

    rows = sq_int8_recall(spark, SF_DIR).collect()
    assert len(rows) == 8
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    mean = sum(r["recall"] for r in rows) / len(rows)
    assert mean >= 0.5, f"int8 MIPS recall suspiciously low: {mean}"


def test_xcorr_symmetry_and_lag_zero(spark):
    """corr(a,b,0) is symmetric Pearson of the aligned series (equals
    a direct recompute), and the (a,b,k) grain is the unordered-pair
    half of the full matrix: every pair appears with all 2*L+1 lags
    exactly once."""
    import math
    from collections import defaultdict

    from github_issues_lakehouse_spark.operators.timeseries import (
        _daily_grid,
        xcorr_daily_events,
    )

    L = 3
    rows = xcorr_daily_events(spark, SF_DIR, max_lag=L).collect()
    per_pair = defaultdict(set)
    for r in rows:
        assert r["type_a"] < r["type_b"]
        per_pair[(r["type_a"], r["type_b"])].add(r["lag"])
    assert all(lags == set(range(-L, L + 1)) for lags in per_pair.values())

    series = defaultdict(dict)
    for g in _daily_grid(spark, SF_DIR).collect():
        series[g["event_type"]][g["day"]] = g["n"]
    for r in rows:
        if r["lag"] != 0 or r["xcorr"] is None:
            continue
        days = sorted(set(series[r["type_a"]]) & set(series[r["type_b"]]))
        xs = [series[r["type_a"]][d] for d in days]
        ys = [series[r["type_b"]][d] for d in days]
        n = len(days)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
        want = round((n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)), 6)
        assert abs(r["xcorr"] - want) < 1e-9
        assert r["n_pairs"] == n


def test_holdout_stratum_weights_identities(spark):
    """Post-stratification identities: per-split shares sum to ~1e6
    (floor-ppm undershoot < n_strata), weight_ppm is the exact floor
    quotient of the two shares, and applying the weights to the
    split counts recovers corpus-share mass (weighted share within
    rounding of corpus share)."""
    from collections import defaultdict

    from github_issues_lakehouse_spark.operators.scale import holdout_stratum_weights

    rows = holdout_stratum_weights(spark, SF_DIR).collect()
    by_split = defaultdict(list)
    for r in rows:
        by_split[r["split"]].append(r)
        assert r["weight_ppm"] == r["corpus_share_ppm"] * 10**6 // r["split_share_ppm"]
    assert set(by_split) <= {"train", "val", "test"}
    for split, rs in by_split.items():
        tot = sum(r["split_share_ppm"] for r in rs)
        assert 10**6 - len(rs) < tot <= 10**6, (split, tot)
        for r in rs:
            # weighted split share ~= corpus share (floor-ppm error)
            w_share = r["split_share_ppm"] * r["weight_ppm"] // 10**6
            assert abs(w_share - r["corpus_share_ppm"]) <= 2


def test_rolling_percentiles_python_recompute(spark):
    """Exact trailing-window percentiles: full python recompute of
    the percentile_disc indexing over the gap-filled grid."""
    from collections import defaultdict

    from github_issues_lakehouse_spark.operators.timeseries import (
        _daily_grid,
        rolling_percentiles_daily,
    )

    W = 7
    series = defaultdict(dict)
    for g in _daily_grid(spark, SF_DIR).collect():
        series[g["event_type"]][g["day"]] = g["n"]
    rows = rolling_percentiles_daily(spark, SF_DIR, window_days=W).collect()
    assert rows
    import datetime

    for r in rows:
        days = [r["day"] - datetime.timedelta(days=o) for o in range(W)]
        xs = sorted(
            series[r["event_type"]][d] for d in days if d in series[r["event_type"]]
        )
        n = len(xs)
        assert r["n_days"] == n
        assert r["p50"] == xs[(n + 1) // 2 - 1]
        assert r["p90"] == xs[(9 * n + 9) // 10 - 1]
