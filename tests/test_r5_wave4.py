"""Round-5 fourth-wave invariants: MMR diversified retrieval and the
detector-kappa agreement mart. Value parity vs DuckDB is pinned by
test_oracle.py; these tests pin what a hash can't explain — the
greedy selection recomputed independently in numpy, and the kappa
algebra recomputed from the emitted contingency counts."""

import numpy as np
import pyarrow.parquet as pq

from github_issues_lakehouse_spark.operators.quality_checks import detector_kappa
from github_issues_lakehouse_spark.operators.similarity import mmr_diverse_topk

from .conftest import SF_DIR


def _numpy_mmr(n_queries=8, pool=16, k=3):
    """Independent greedy MMR on the e6-frozen vectors."""
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    vecs = np.round(np.array(t["embedding"], dtype=np.float64) * 1_000_000.0)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    out = {}
    for q in range(n_queries):
        qi = int(np.where(ids == q)[0][0])
        rel = (vecs @ vecs[qi]) / (norms * norms[qi])
        cand = [i for i in range(len(ids)) if ids[i] != q]
        # pool: top by (rel desc, id asc)
        cand.sort(key=lambda i: (-rel[i], ids[i]))
        cand = cand[:pool]
        picked = []
        for _ in range(k):
            best = None
            for i in cand:
                if i in picked:
                    continue
                if picked:
                    ms = max(
                        float(vecs[i] @ vecs[j] / (norms[i] * norms[j]))
                        for j in picked
                    )
                else:
                    ms = 0.0
                score = (7.0 * float(rel[i]) - 3.0 * ms) / 10.0
                key = (-score, ids[i])
                if best is None or key < best[0]:
                    best = (key, i, score)
            picked.append(best[1])
            out.setdefault(q, []).append((int(ids[best[1]]), best[2]))
    return out


def test_mmr_matches_independent_numpy_greedy(spark):
    """The full greedy SELECTION (ids, order, and scores to 6dp)
    equals an independent numpy implementation — the end-to-end proof
    that the e6 freeze + identical-op-tree design really pins the
    argmax chain, not just the rounded output."""
    got = mmr_diverse_topk(spark, SF_DIR).collect()
    want = _numpy_mmr()
    assert len(got) == 8 * 3
    for r in got:
        wid, wscore = want[r.q_id][r.rank - 1]
        assert r.selected_id == wid, (r.q_id, r.rank)
        assert abs(r.mmr - round(wscore, 6)) < 1e-12


def test_mmr_diversifies_vs_pure_topk(spark):
    """MMR must not degenerate to plain top-k: rank 1 IS the argmax
    of rel, but at least one later pick deviates from the pure
    relevance order somewhere in the query set (the similarity
    penalty did something)."""
    rows = mmr_diverse_topk(spark, SF_DIR).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r)
    deviated = False
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        rels = [r.rel for r in rs]
        assert rels[0] == max(rels)  # rank 1 = argmax rel always
        if any(rels[i] < rels[i + 1] for i in range(len(rels) - 1)):
            deviated = True  # a later pick out-ranks an earlier one on rel
    assert deviated


def test_mmr_plan_pins_pool_no_cartesian(spark):
    """The greedy tail must reuse the PINNED pool/sims checkpoints
    (Scan ExistingRDD — the scoring stage runs once, not once per
    step) and contain no CartesianProduct anywhere."""
    plan = mmr_diverse_topk(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert plan.count("Scan ExistingRDD") >= 2  # pooled + sims pins


def test_detector_kappa_contingency_algebra(spark):
    """Counts partition n_docs; kappa_e6 recomputes exactly from the
    emitted counts; bounds hold."""
    rows = detector_kappa(spark, SF_DIR).collect()
    assert rows, "documents table has sources"
    for r in rows:
        n11, n10 = r.n_both_keep, r.n_gopher_only
        n01, n00 = r.n_classifier_only, r.n_both_drop
        n = r.n_docs
        assert n11 + n10 + n01 + n00 == n
        a = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
        num = n * (n11 + n00) - a
        den = n * n - a
        if den == 0:  # degenerate: one detector constant
            continue
        sign = 1 if num >= 0 else -1
        p = abs(num)
        want = sign * ((p * 1000 // den) * 1000 + (p * 1000 % den) * 1000 // den)
        assert r.kappa_e6 == want
        assert -1_000_000 <= r.kappa_e6 <= 1_000_000
        assert r.agree_ppm == (
            ((n11 + n00) * 1000 // n) * 1000 + ((n11 + n00) * 1000 % n) * 1000 // n
        )


def _py_norm_tokens(text):
    import re

    return re.sub(r"\s+", " ", text.lower()).strip().split(" ")


def test_hll_union_algebra_matches_python_for_one_pair(spark):
    """Recompute the full pair-union HLL algebra (register maxes,
    harmonic sum, alpha/linear-counting correction, inclusion-
    exclusion) in pure Python hashlib for the first source pair and
    compare every emitted column — the end-to-end proof the register
    MAX really is the union sketch."""
    import hashlib

    from github_issues_lakehouse_spark.operators.sketches import (
        HLL_ALPHA64_E6,
        HLL_LC_TABLE,
        HLL_M,
        HLL_RMAX,
        hll_union_overlap,
    )

    rows = hll_union_overlap(spark, SF_DIR).collect()
    first = rows[0]
    t = pq.read_table(f"{SF_DIR}/documents.parquet").to_pydict()
    terms = {}
    for src, text in zip(t["source"], t["text"]):
        if src in (first.source_a, first.source_b):
            terms.setdefault(src, set()).update(_py_norm_tokens(text))

    def regs(vocab):
        r = {}
        for term in vocab:
            h = int(hashlib.md5((term + "#hll").encode()).hexdigest()[:15], 16)
            j, w = h % HLL_M, h // HLL_M
            if w == 0:
                rho = HLL_RMAX
            else:
                b = bin(w)[2:]
                rho = min(HLL_RMAX, 1 + len(b) - len(b.rstrip("0")))
            r[j] = max(r.get(j, 0), rho)
        return r

    def est(r):
        s = sum(1 << (HLL_RMAX - rho) for rho in r.values())
        s += (HLL_M - len(r)) * (1 << HLL_RMAX)
        nz = HLL_M - len(r)
        raw = (HLL_ALPHA64_E6 * HLL_M * HLL_M * (1 << HLL_RMAX)) // (s * 1_000_000)
        if nz > 0 and raw <= (5 * HLL_M) // 2:
            return HLL_LC_TABLE[nz]
        return raw

    ra, rb = regs(terms[first.source_a]), regs(terms[first.source_b])
    ru = {j: max(ra.get(j, 0), rb.get(j, 0)) for j in set(ra) | set(rb)}
    na, nb, nu = est(ra), est(rb), est(ru)
    assert first.n_a_est == na
    assert first.n_b_est == nb
    assert first.n_union_est == nu
    assert first.n_overlap_est == max(na + nb - nu, 0)
    assert first.n_overlap_exact == len(
        terms[first.source_a] & terms[first.source_b]
    )


def test_theil_sen_matches_numpy_for_one_priority(spark):
    """Slope median, pair count, and residual-median intercept all
    equal a direct numpy recomputation (disc rule, exact integers)
    for one priority at sf0.001."""
    from github_issues_lakehouse_spark.operators.timeseries import theil_sen_trend

    rows = {r.priority: r for r in theil_sen_trend(spark, SF_DIR).collect()}
    t = pq.read_table(f"{SF_DIR}/orders.parquet").to_pydict()
    import collections
    import datetime

    daily = collections.defaultdict(int)
    for prio, ts, price in zip(
        t["o_orderpriority"], t["o_orderdate"], t["o_totalprice"]
    ):
        if prio != "1-URGENT":
            continue
        day = ts.date() if hasattr(ts, "date") else ts
        cents = int(round(float(price) * 100))
        daily[day] += cents
    days = sorted(daily)
    epoch = datetime.date(1992, 1, 1)
    pts = [((d - epoch).days, daily[d]) for d in days]

    def ppm(p, tot):
        return (p * 1000 // tot) * 1000 + (p * 1000 % tot) * 1000 // tot

    slopes = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dc = pts[j][1] - pts[i][1]
            dd = pts[j][0] - pts[i][0]
            s = (1 if dc >= 0 else -1) * ppm(abs(dc), dd)
            slopes.append(s)
    slopes.sort()
    n = len(slopes)
    med = slopes[(n + 1) // 2 - 1]
    r = rows["1-URGENT"]
    assert r.n_pairs == n
    assert r.n_days == len(pts)
    assert r.slope_cents_per_day_e6 == med
    resid = sorted(c * 1_000_000 - med * x for x, c in pts)
    assert r.intercept_cents_e6 == resid[(len(resid) + 1) // 2 - 1]
