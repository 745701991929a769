"""Round-5 fifth-wave invariants: ANN ranking quality (nDCG@k).
Value parity vs DuckDB is pinned by test_oracle.py; these tests pin
what a hash can't explain — the DCG algebra recomputed independently
in Python from the three top-k operators' own outputs, plus the
bound/identity structure of nDCG."""

from github_issues_lakehouse_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    ann_ndcg_at_k,
    ndcg_discounts_e6,
)

from .conftest import SF_DIR

K = 5
N_Q = 8


def test_ndcg_discount_table_pinned():
    # floor(1e6/log2(i+1)); rank 1 has discount exactly 1e6 and the
    # table is strictly decreasing (it is the operator contract).
    disc = ndcg_discounts_e6(K)
    assert disc[0] == 1_000_000
    assert all(a > b for a, b in zip(disc, disc[1:]))
    assert disc == [1000000, 630929, 500000, 430676, 386852]


def test_ndcg_bounds_and_schema(spark):
    rows = ann_ndcg_at_k(spark, SF_DIR, N_Q, K).collect()
    assert len(rows) == 2 * N_Q  # every query present per method
    disc = ndcg_discounts_e6(K)
    idcg = sum((K - i) * disc[i] for i in range(K))
    for r in rows:
        assert r.method in ("ivf", "lsh")
        assert 0 <= r.n_hits <= K
        assert 0 <= r.dcg_e6 <= idcg
        assert 0 <= r.ndcg_ppm <= 1_000_000
        # perfect ranking iff full DCG
        assert (r.ndcg_ppm == 1_000_000) == (r.dcg_e6 == idcg)


def test_ndcg_recomputed_from_topk_outputs(spark):
    """Independent recompute: join each approximate tier's own top-k
    rows against brute-force truth ranks in plain Python and rebuild
    DCG/nDCG with the pinned discount table."""
    truth = {
        (r.q_id, r.neighbor_id): r.rank
        for r in ann_bruteforce_topk(spark, SF_DIR, N_Q, K).collect()
    }
    disc = ndcg_discounts_e6(K)
    idcg = sum((K - i) * disc[i] for i in range(K))
    got = {
        (r.method, r.q_id): r
        for r in ann_ndcg_at_k(spark, SF_DIR, N_Q, K).collect()
    }
    for method, fn in (("ivf", ann_ivf_topk), ("lsh", ann_lsh_topk)):
        per_q = {}
        for r in fn(spark, SF_DIR, N_Q, K).collect():
            tr = truth.get((r.q_id, r.neighbor_id))
            gain = (K + 1 - tr) if tr is not None else 0
            hits, dcg = per_q.get(r.q_id, (0, 0))
            per_q[r.q_id] = (
                hits + (1 if gain > 0 else 0),
                dcg + gain * disc[r.rank - 1],
            )
        for q in {q for q, _ in truth}:
            hits, dcg = per_q.get(q, (0, 0))
            row = got[(method, q)]
            assert row.n_hits == hits
            assert row.dcg_e6 == dcg
            ppm = (dcg * 1000 // idcg) * 1000 + (dcg * 1000 % idcg) * 1000 // idcg
            assert row.ndcg_ppm == ppm


def test_ndcg_truth_pinned_once(spark):
    # The brute-force subtree is localCheckpoint-pinned so both tiers
    # score against the same materialized truth (not two recomputes).
    plan = (
        ann_ndcg_at_k(spark, SF_DIR, N_Q, K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan


def test_mann_whitney_recompute(spark):
    """Independent O(n log n) recompute of the tie-aware 2*U and the
    rank-biserial ppm from the raw parquet."""
    import bisect

    import pyarrow.parquet as pq

    from github_issues_lakehouse_spark.operators.statistics import mann_whitney_price

    t = pq.read_table(f"{SF_DIR}/part.parquet").to_pydict()
    promo, other = [], []
    for price, typ in zip(t["p_retailprice"], t["p_type"]):
        cents = int(round(float(price) * 100))
        (promo if typ.startswith("PROMO") else other).append(cents)
    other.sort()
    u2 = 0
    for v in promo:
        lo = bisect.bisect_left(other, v)
        hi = bisect.bisect_right(other, v)
        u2 += 2 * lo + (hi - lo)
    na, nb = len(promo), len(other)

    def ppm(p, tot):
        return (p * 1000 // tot) * 1000 + (p * 1000 % tot) * 1000 // tot

    num = u2 - na * nb
    expect_rb = (1 if num >= 0 else -1) * ppm(abs(num), na * nb)
    row = mann_whitney_price(spark, SF_DIR).collect()[0]
    assert (row.n_promo, row.n_other, row.u2_promo) == (na, nb, u2)
    assert row.rank_biserial_ppm == expect_rb
    assert -1_000_000 <= row.rank_biserial_ppm <= 1_000_000


def test_spearman_recompute(spark):
    """Independent recompute: scipy-free tie-aware Spearman (Pearson
    on midranks) from the raw parquet, for one priority."""
    import collections

    import pyarrow.parquet as pq

    from github_issues_lakehouse_spark.operators.timeseries import (
        spearman_daily_trend,
    )

    t = pq.read_table(f"{SF_DIR}/orders.parquet").to_pydict()
    daily = collections.defaultdict(int)
    for prio, ts, price in zip(
        t["o_orderpriority"], t["o_orderdate"], t["o_totalprice"]
    ):
        if prio != "3-MEDIUM":
            continue
        day = ts.date() if hasattr(ts, "date") else ts
        daily[day] += int(round(float(price) * 100))
    days = sorted(daily)
    cents = [daily[d] for d in days]
    n = len(days)
    x2 = [2 * (i + 1) for i in range(n)]
    # midranks of cents (e1): 2*mid = 2*count_before + count + 1
    sorted_c = sorted(cents)
    first = {}
    cnt = collections.Counter(sorted_c)
    run = 0
    for v in sorted_c:
        if v not in first:
            first[v] = run
        run += 1
    y2 = [2 * first[v] + cnt[v] + 1 for v in cents]
    sx, sy = sum(x2), sum(y2)
    sxx = sum(a * a for a in x2)
    syy = sum(b * b for b in y2)
    sxy = sum(a * b for a, b in zip(x2, y2))
    num = n * sxy - sx * sy
    rho = num / ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    rows = {r.priority: r for r in spearman_daily_trend(spark, SF_DIR).collect()}
    r = rows["3-MEDIUM"]
    assert r.n_days == n
    assert r.sxy_e2 == num
    assert abs(r.rho - rho) < 1e-6
    for row in rows.values():
        assert -1.0 <= row.rho <= 1.0


def test_calibration_identities(spark):
    """Structural invariants + recompute of the ECE assembly from the
    emitted exact integers, and consistency with the operator's own
    inputs (bin populations partition the corpus)."""
    from github_issues_lakehouse_spark.operators.quality_checks import (
        classifier_calibration,
    )
    from github_issues_lakehouse_spark.operators.scale import training_corpus_filter
    from github_issues_lakehouse_spark.operators.text3 import quality_classifier

    rows = classifier_calibration(spark, SF_DIR).collect()
    n_total = quality_classifier(spark, SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_total

    # independent per-bin recompute from the operator's own inputs
    probs = {
        r.doc_id: round(r.quality_prob * 1_000_000)
        for r in quality_classifier(spark, SF_DIR).collect()
    }
    gold_ids = {
        r.doc_id for r in training_corpus_filter(spark, SF_DIR).collect()
    }
    import collections

    n_b = collections.Counter()
    sum_b = collections.Counter()
    gold_b = collections.Counter()
    for doc_id, p in probs.items():
        b = min(p // 100_000, 9)
        n_b[b] += 1
        sum_b[b] += p
        gold_b[b] += 1 if doc_id in gold_ids else 0

    def ppm(p, tot):
        return (p * 1000 // tot) * 1000 + (p * 1000 % tot) * 1000 // tot

    assert {r.bin for r in rows} == set(n_b)
    for r in rows:
        assert r.n_docs == n_b[r.bin]
        assert r.conf_e6 == sum_b[r.bin] // n_b[r.bin]
        assert r.acc_ppm == ppm(gold_b[r.bin], n_b[r.bin])
        assert r.gap_e6 == abs(r.conf_e6 - r.acc_ppm)
        assert r.ece_term == r.n_docs * r.gap_e6
        assert r.bin * 100_000 <= r.conf_e6 <= (r.bin + 1) * 100_000
        assert 0 <= r.acc_ppm <= 1_000_000


def test_trimmed_winsorized_recompute(spark):
    """Independent recompute: sort the raw cents per flag in Python,
    trim/winsorize by count, compare every emitted column."""
    import collections

    import pyarrow.parquet as pq

    from github_issues_lakehouse_spark.operators.statistics import (
        trimmed_winsorized_price,
    )

    t = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_returnflag", "l_extendedprice"]
    ).to_pydict()
    by_flag = collections.defaultdict(list)
    for flag, price in zip(t["l_returnflag"], t["l_extendedprice"]):
        by_flag[flag].append(int(round(float(price) * 100)))
    rows = {r.flag: r for r in trimmed_winsorized_price(spark, SF_DIR).collect()}
    assert set(rows) == set(by_flag)
    for flag, xs in by_flag.items():
        xs.sort()
        n = len(xs)
        k = n * 5 // 100
        kept = xs[k : n - k]
        lo_cut, hi_cut = kept[0], kept[-1]
        r = rows[flag]
        assert r.n == n and r.k_trim == k
        assert r.mean_cents == sum(xs) // n
        assert r.trimmed_mean_cents == sum(kept) // len(kept)
        assert r.winsor_mean_cents == (sum(kept) + k * (lo_cut + hi_cut)) // n
        assert (r.lo_cut_cents, r.hi_cut_cents) == (lo_cut, hi_cut)
        # robustness direction: the trimmed mean sits inside the cuts
        assert lo_cut <= r.trimmed_mean_cents <= hi_cut


def test_containment_catches_subset_dupe_jaccard_misses(spark, tmp_path):
    """A document quoted whole inside a 10x wrapper: containment_ppm
    ~1e6 while jaccard_ppm is low — the pair class this operator
    exists for."""
    from github_issues_lakehouse_spark.operators.dedup import containment_pairs

    core = " ".join(f"tok{i}" for i in range(30))
    wrapper = " ".join(f"pad{i}" for i in range(300))
    rows = [
        (0, "a", core, len(core)),
        (1, "a", wrapper + " " + core, len(wrapper) + len(core) + 1),
        (2, "b", "utterly unrelated words only here", 33),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string, n_chars long")
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = containment_pairs(spark, sf).collect()
    assert len(got) == 1
    p = got[0]
    assert (p.doc_a, p.doc_b) == (0, 1)
    assert p.containment_ppm == 1_000_000  # fully contained
    assert p.jaccard_ppm < 150_000  # resemblance misses it
    assert p.inter == p.sz_a == min(p.sz_a, p.sz_b)


def test_containment_identities_on_corpus(spark):
    from github_issues_lakehouse_spark.operators.dedup import containment_pairs

    for p in containment_pairs(spark, SF_DIR).collect():
        assert p.doc_a < p.doc_b
        assert 0 < p.inter <= min(p.sz_a, p.sz_b)
        assert p.jaccard_ppm <= p.containment_ppm <= 1_000_000
        assert p.containment_ppm >= 500_000


def test_epoch_shuffle_plan_properties(spark):
    """Each epoch is a permutation of the same shard set with the
    same total tokens, epochs differ from each other, and the order
    is reproducible run to run."""
    from github_issues_lakehouse_spark.operators.chunking import epoch_shuffle_plan

    rows = epoch_shuffle_plan(spark, SF_DIR).collect()
    by_epoch = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == {1, 2, 3}
    orders = {}
    for epoch, es in by_epoch.items():
        es.sort(key=lambda r: r.pos)
        assert [r.pos for r in es] == list(range(1, len(es) + 1))
        cum = 0
        for r in es:
            cum += r.tokens
            assert r.cum_tokens == cum
        orders[epoch] = [r.shard_id for r in es]
    # same shard set per epoch; different visit order across epochs
    assert set(orders[1]) == set(orders[2]) == set(orders[3])
    assert orders[1] != orders[2] and orders[2] != orders[3]
    # reproducible
    again = epoch_shuffle_plan(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_markov_attribution_invariants(spark):
    """Removal can only reduce conversion (monotone under the
    identical truncating fold), shares normalize, and the absorption
    fold recomputed independently in Python from the operator's own
    transition table matches."""
    from github_issues_lakehouse_spark.operators.markov import (
        _absorption_ppm,
        _journey_transition_counts,
        markov_attribution,
    )

    rows = markov_attribution(spark, SF_DIR).collect()
    assert len(rows) >= 2
    base = rows[0].base_conv_ppm
    tot = 0
    for r in rows:
        assert r.base_conv_ppm == base
        assert 0 <= r.conv_without_ppm <= base <= 1_000_000
        assert r.removal_effect_ppm == base - r.conv_without_ppm
        tot += r.attribution_ppm
    # floor-ppm shares: sum within len(rows) ulps of 1e6
    assert 1_000_000 - 3 * len(rows) <= tot <= 1_000_000

    counts = {
        (r.from_state, r.to_state): r.n
        for r in _journey_transition_counts(spark, SF_DIR).collect()
    }
    totals = {}
    for (f, _), n in counts.items():
        totals[f] = totals.get(f, 0) + n

    def ppm(p, t):
        return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

    p = {k: ppm(n, totals[k[0]]) for k, n in counts.items()}
    channels = sorted({f for f, _ in p if f != "START"})
    froms = ["START", *channels]
    assert _absorption_ppm(p, froms, channels, None, 15)["START"] == base
    for r in rows:
        v = _absorption_ppm(p, froms, channels, r.channel, 15)["START"]
        assert v == r.conv_without_ppm


def test_markov_journey_semantics(spark, tmp_path):
    """Planted journeys: u1 view->purchase then click (new journey to
    NULL); u2 view->view no purchase. Exact transition counts."""
    import datetime

    from github_issues_lakehouse_spark.operators.markov import (
        _journey_transition_counts,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, 100, t0, "view", 1.0, "{}"),
        (2, 100, t0 + datetime.timedelta(minutes=1), "purchase", 5.0, "{}"),
        (3, 100, t0 + datetime.timedelta(minutes=2), "click", 1.0, "{}"),
        (4, 200, t0, "view", 1.0, "{}"),
        (5, 200, t0 + datetime.timedelta(minutes=1), "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = {
        (r.from_state, r.to_state): r.n
        for r in _journey_transition_counts(spark, sf).collect()
    }
    assert got == {
        ("START", "view"): 2,  # u1 j1, u2
        ("view", "CONV"): 1,  # u1 converts
        ("START", "click"): 1,  # u1 journey 2 starts after purchase
        ("click", "NULL"): 1,  # and dies
        ("view", "view"): 1,  # u2
        ("view", "NULL"): 1,  # u2 last event
    }


def test_bot_regularity_planted_bot(spark, tmp_path):
    """A planted metronomic user (exact 60 s gaps) ranks first with
    cv2 == 0 and flagged; a bursty human is not flagged."""
    import datetime

    from github_issues_lakehouse_spark.operators.timeseries import (
        bot_regularity_flags,
    )

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for i in range(10):  # bot: exactly 60s apart
        rows.append((eid, 1, t0 + datetime.timedelta(seconds=60 * i), "view", 1.0, "{}"))
        eid += 1
    human_offsets = [0, 7, 9, 300, 305, 2000, 2004, 9000, 9100, 20000]
    for off in human_offsets:
        rows.append((eid, 2, t0 + datetime.timedelta(seconds=off), "view", 1.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = bot_regularity_flags(spark, sf).collect()
    assert got[0].user_id == 1
    assert got[0].cv2_e6 == 0
    assert got[0].flagged is True
    assert got[0].mean_gap_s == 60
    human = [r for r in got if r.user_id == 2][0]
    assert human.flagged is False
    assert human.cv2_e6 > 1_000_000  # burstier than exponential


def test_bot_regularity_recompute(spark):
    """Moment algebra recomputed from raw micros for the top row."""
    import collections

    import pyarrow.parquet as pq

    from github_issues_lakehouse_spark.operators.timeseries import (
        bot_regularity_flags,
    )

    top = bot_regularity_flags(spark, SF_DIR).collect()
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "event_id"]).to_pydict()
    ev = collections.defaultdict(list)
    for u, ts, eid in zip(t["user_id"], t["ts"], t["event_id"]):
        us = int(ts.timestamp() * 1_000_000) if hasattr(ts, "timestamp") else int(ts)
        ev[u].append((us, eid))
    for row in top[:3]:
        xs = sorted(ev[row.user_id])
        gaps = [b[0] - a[0] for a, b in zip(xs, xs[1:])]
        n, s1 = len(gaps), sum(gaps)
        s2 = sum(g * g for g in gaps)
        assert row.n_gaps == n
        assert row.mean_gap_s == s1 // (n * 1_000_000)
        assert row.cv2_e6 == (n * s2 - s1 * s1) * 1_000_000 // (s1 * s1)


def test_rake_planted_keyphrase(spark, tmp_path):
    """A multiword phrase of co-occurring rare words outranks a
    lone frequent word (the RAKE deg/freq point), and stopwords
    never appear inside emitted phrases."""
    from github_issues_lakehouse_spark.functions.textfns import STOPWORDS_EN
    from github_issues_lakehouse_spark.operators.text6 import rake_keyphrases

    docs = []
    for i in range(6):
        docs.append(
            (i, "s1", "deep neural network is the best and banana", 40)
        )
    docs.append((6, "s1", "banana banana banana", 20))
    df = spark.createDataFrame(
        docs, "doc_id long, source string, text string, n_chars long"
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = rake_keyphrases(spark, sf).collect()
    assert rows[0].phrase == "deep neural network"
    assert rows[0].n_occ == 6
    # 3 words, each deg/freq = 3 -> 9e6 exactly
    assert rows[0].score_e6 == 9_000_000
    for r in rows:
        for t in r.phrase.split(" "):
            assert t not in STOPWORDS_EN
        assert 1 <= len(r.phrase.split(" ")) <= 3


def test_rake_corpus_invariants(spark):
    from github_issues_lakehouse_spark.operators.text6 import rake_keyphrases

    rows = rake_keyphrases(spark, SF_DIR).collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, []).append(r)
    for src, rs in per_src.items():
        rs.sort(key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_e6 for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(r.score_e6 >= 1_000_000 for r in rs)  # deg >= freq


def test_shapley_axioms(spark):
    """Efficiency (sum phi == grand coalition lift, within the one
    floor-DIV each), dominance vs alone-value bounds, and agreement
    with a direct from-scratch Shapley recompute over the operator's
    own coalition values."""
    from itertools import combinations
    from math import factorial

    from github_issues_lakehouse_spark.operators.markov import (
        _absorption_ppm,
        _journey_transition_counts,
        shapley_attribution,
    )

    rows = shapley_attribution(spark, SF_DIR).collect()
    channels = [r.channel for r in rows]
    k = len(channels)
    grand = rows[0].grand_e6
    tot_phi = sum(r.shapley_e6 for r in rows)
    # each phi floors once by k!: total within k ulps of the grand lift
    assert grand - k <= tot_phi <= grand

    counts = {
        (r.from_state, r.to_state): r.n
        for r in _journey_transition_counts(spark, SF_DIR).collect()
    }
    totals = {}
    for (f, _), n in counts.items():
        totals[f] = totals.get(f, 0) + n

    def ppm(p, t):
        return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

    p = {kk: ppm(n, totals[kk[0]]) for kk, n in counts.items()}
    froms = ["START", *channels]
    v = {}
    for r in range(k + 1):
        for S in combinations(channels, r):
            gone = set(channels) - set(S)
            v[frozenset(S)] = _absorption_ppm(p, froms, channels, gone, 15)["START"]
    for row in rows:
        assert row.alone_conv_ppm == v[frozenset({row.channel})]
        assert row.full_conv_ppm == v[frozenset(channels)]
        acc = 0
        others = [x for x in channels if x != row.channel]
        for r in range(k):
            w = factorial(r) * factorial(k - 1 - r)
            for S in combinations(others, r):
                fs = frozenset(S)
                acc += w * (v[fs | {row.channel}] - v[fs])
        assert row.shapley_e6 == acc // factorial(k)
        assert row.shapley_e6 >= 0


def test_incremental_mart_equals_full_rebuild(spark):
    """The operator applies only the CDC delta; this recomputes the
    v2 mart from scratch in Spark (independent of the DuckDB oracle)
    and checks exact equality."""
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.operators.scale import (
        incremental_mart_rebuild,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    got = {
        r.bucket: (r.n_orders, r.revenue_cents)
        for r in incremental_mart_rebuild(spark, SF_DIR).collect()
    }
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    surv = o.filter(F.col("o_orderkey") % 11 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") + 10.0, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    ins = o.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"), "o_totalprice"
    )
    v2 = surv.unionByName(ins)
    want = {
        r.bucket: (r.n, r.cents)
        for r in v2.groupBy((F.col("o_orderkey") % 16).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("cents"),
        )
        .collect()
    }
    assert got == want


def test_fd_audit_recompute_and_planted(spark, tmp_path):
    """Python recompute for one corpus rule, plus planted data where
    the FD holds exactly (violation 0) and where it is maximally
    broken."""
    import collections

    import pyarrow.parquet as pq

    from github_issues_lakehouse_spark.operators.quality_checks import (
        functional_dependency_audit,
    )

    rows = {r.rule: r for r in functional_dependency_audit(spark, SF_DIR).collect()}
    assert len(rows) == 4
    t = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).to_pydict()
    per = collections.defaultdict(collections.Counter)
    for c, p in zip(t["o_custkey"], t["o_orderpriority"]):
        per[c][p] += 1
    n_groups = len(per)
    viol_groups = sum(1 for c in per.values() if len(c) > 1)
    n_rows = sum(sum(c.values()) for c in per.values())
    bad = sum(sum(c.values()) - max(c.values()) for c in per.values())

    def ppm(p, t_):
        return (p * 1000 // t_) * 1000 + (p * 1000 % t_) * 1000 // t_

    r = rows["o_custkey->o_orderpriority"]
    assert (r.n_groups, r.violating_groups, r.n_rows, r.bad_rows) == (
        n_groups,
        viol_groups,
        n_rows,
        bad,
    )
    assert r.violation_ppm == ppm(bad, n_rows)
    for r in rows.values():
        assert 0 <= r.bad_rows <= r.n_rows
        assert r.violating_groups <= r.n_groups
        assert (r.bad_rows == 0) == (r.violating_groups == 0)


def test_pq_recompute_numpy(spark):
    """Full PQ recompute in numpy from the raw embeddings: same md5
    codebooks, nearest-code assignment with (d2, code) tiebreak,
    exact distortion sums."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from github_issues_lakehouse_spark.operators.vectors2 import pq_codebook_stats

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    vecs = np.round(
        np.array(t["embedding"], dtype=np.float64) * 1_000_000.0
    ).astype(np.int64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    n_sub, dim_per, k = 4, 16, 16
    got = {
        (r.sub, r.code): r
        for r in pq_codebook_stats(spark, SF_DIR).collect()
    }
    for sub in range(n_sub):
        sv = vecs[:, sub * dim_per : (sub + 1) * dim_per]
        hs = [
            (hashlib.md5(f"{int(i)}:{sub}".encode()).hexdigest(), int(i))
            for i in ids
        ]
        cb_ids = [i for _, i in sorted(hs)[:k]]
        cb = np.stack([sv[np.where(ids == i)[0][0]] for i in cb_ids])
        stats = {}
        for row, i in zip(sv, ids):
            d2s = ((cb - row) ** 2).sum(axis=1)
            code = int(np.lexsort((np.arange(k), d2s))[0])
            n, d = stats.get(code, (0, 0))
            stats[code] = (n + 1, d + int(d2s[code]))
        sub_n = sum(n for n, _ in stats.values())
        sub_d = sum(d for _, d in stats.values())
        assert {c for s, c in got if s == sub} == set(stats)
        for code, (n, d) in stats.items():
            r = got[(sub, code)]
            assert (r.n_assigned, r.distortion) == (n, d)
            assert (r.sub_n, r.sub_distortion) == (sub_n, sub_d)


def test_pq_adc_invariants(spark):
    """ADC recall bounds, the adc>=true mass direction per pick, and
    a numpy recompute of the full ADC pipeline (codes from the C129
    recompute, LUT sums, top-k with tiebreak, recall vs exact L2)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from github_issues_lakehouse_spark.operators.vectors2 import pq_adc_recall

    K = 5
    # r10: the mart carries a trained-vs-baseline codebook label; the
    # python recompute below mirrors the md5 BASELINE codebook
    rows = [
        r for r in pq_adc_recall(spark, SF_DIR).collect() if r.codebook == "baseline"
    ]
    assert len(rows) == 8
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pydict()
    ids = np.array(t["vec_id"])
    vecs = np.round(np.array(t["embedding"], dtype=np.float64) * 1e6).astype(np.int64)
    order = np.argsort(ids)
    ids, vecs = ids[order], vecs[order]
    n_sub, dim_per, nc = 4, 16, 16
    cbs, codes = [], np.zeros((len(ids), n_sub), dtype=int)
    for sub in range(n_sub):
        sv = vecs[:, sub * dim_per : (sub + 1) * dim_per]
        hs = sorted(
            (hashlib.md5(f"{int(i)}:{sub}".encode()).hexdigest(), int(i)) for i in ids
        )
        cb = np.stack([sv[np.where(ids == i)[0][0]] for _, i in hs[:nc]])
        cbs.append(cb)
        for r_i, row in enumerate(sv):
            d2s = ((cb - row) ** 2).sum(axis=1)
            codes[r_i, sub] = int(np.lexsort((np.arange(nc), d2s))[0])
    got = {r.q_id: r for r in rows}
    for q in range(8):
        qi = int(np.where(ids == q)[0][0])
        lut = np.stack(
            [((cbs[s] - vecs[qi, s * dim_per : (s + 1) * dim_per]) ** 2).sum(axis=1)
             for s in range(n_sub)]
        )
        adc = np.array(
            [sum(int(lut[s, codes[j, s]]) for s in range(n_sub)) for j in range(len(ids))]
        )
        mask = ids != q
        cand = sorted(
            (int(adc[j]), int(ids[j])) for j in range(len(ids)) if mask[j]
        )[:K]
        true_d2 = ((vecs - vecs[qi]) ** 2).sum(axis=1)
        truth = sorted(
            (int(true_d2[j]), int(ids[j])) for j in range(len(ids)) if mask[j]
        )[:K]
        hits = len({v for _, v in cand} & {v for _, v in truth})
        r = got[q]
        assert r.n_hits == hits
        assert r.adc_d2_sum == sum(d for d, _ in cand)
        assert r.true_d2_sum == sum(d for d, _ in truth)
        assert 0 <= r.recall_ppm <= 1_000_000


def test_rank_normalize_properties(spark):
    """Decile populations partition each source ~uniformly (within
    tie-block slack), boundaries are monotone non-overlapping, and
    the decile map recomputed from the operator's own score input
    matches."""
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.functions.textfns import quality_score
    from github_issues_lakehouse_spark.operators.quality_checks import (
        quality_rank_normalize,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    rows = quality_rank_normalize(spark, SF_DIR).collect()
    scores = (
        load_table(spark, SF_DIR, "documents")
        .select(
            "source",
            F.round(quality_score(F.col("text")) * 1_000_000)
            .cast("long")
            .alias("q"),
        )
        .collect()
    )
    import collections

    per_src = collections.defaultdict(list)
    for r in scores:
        per_src[r.source].append(r.q)
    by_src = collections.defaultdict(list)
    for r in rows:
        by_src[r.source].append(r)
    assert set(by_src) == set(per_src)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.decile)
        xs = sorted(per_src[src])
        n = len(xs)
        assert sum(r.n_docs for r in rs) == n
        # recompute decile of each tied value block
        want = collections.defaultdict(list)
        i = 0
        while i < n:
            j = i
            while j < n and xs[j] == xs[i]:
                j += 1
            want[min(10 * i // n, 9)].extend(xs[i:j])
            i = j
        assert {r.decile for r in rs} == set(want)
        for r in rs:
            blk = want[r.decile]
            assert r.n_docs == len(blk)
            assert (r.q_lo_e6, r.q_hi_e6) == (min(blk), max(blk))
            assert r.mean_q_e6 == sum(blk) // len(blk)
        # non-overlapping, monotone boundaries
        for a, b in zip(rs, rs[1:]):
            assert a.q_hi_e6 < b.q_lo_e6


def test_reconciliation_planted_exact(spark, tmp_path):
    """A planted order whose header equals the exact invoice math
    reconciles (n_exact counts it); a mismatched one lands in the
    gap stats with the exact cent gap."""
    import datetime

    from github_issues_lakehouse_spark.operators.quality_checks import (
        order_total_reconciliation,
    )

    day = datetime.date(2024, 1, 1)
    # order 1: one line 100.00 * (1-0.10) * (1+0.05) = 94.50 exact
    # order 2: header overstates by 3.00
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 94.50, day, "1-URGENT", "c", 0, "x"),
            (2, 11, "O", 97.50, day, "1-URGENT", "c", 0, "x"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string,"
        " o_clerk string, o_shippriority int, o_comment string",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 1, 1, 1.0, 100.00, 0.10, 0.05, "N", "O", day),
            (2, 1, 1, 1, 1.0, 100.00, 0.10, 0.05, "N", "O", day),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate date",
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    orders.write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    li.write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    rows = order_total_reconciliation(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_orders, r.n_exact) == (2, 1)
    assert r.n_within_1pct == 1  # 3.00 on 97.50 is > 1%
    assert r.max_abs_gap_cents == 300
    assert r.mean_abs_gap_cents == 150


def test_reconciliation_corpus_identities(spark):
    from github_issues_lakehouse_spark.operators.quality_checks import (
        order_total_reconciliation,
    )

    for r in order_total_reconciliation(spark, SF_DIR).collect():
        assert 0 <= r.n_exact <= r.n_within_1pct <= r.n_orders
        assert 0 <= r.within_1pct_ppm <= 1_000_000
        assert r.mean_abs_gap_cents <= r.max_abs_gap_cents


def test_idf_jaccard_discounts_boilerplate(spark, tmp_path):
    """Two docs sharing ONLY a corpus-wide boilerplate block: raw
    Jaccard is high, rarity-weighted Jaccard collapses; two docs
    sharing RARE content keep a high weighted score."""
    from github_issues_lakehouse_spark.operators.dedup import idf_jaccard_pairs

    boiler = " ".join(f"b{i}" for i in range(20))
    docs = []
    # every doc carries the boilerplate
    for i in range(10):
        unique = " ".join(f"u{i}x{j}" for j in range(20))
        docs.append((i, "s", boiler + " " + unique, 100))
    # docs 20/21 share rare content (plus the boilerplate)
    rare = " ".join(f"rare{j}" for j in range(20))
    docs.append((20, "s", boiler + " " + rare, 100))
    docs.append((21, "s", boiler + " " + rare + " tailword", 100))
    df = spark.createDataFrame(
        docs, "doc_id long, source string, text string, n_chars long"
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    got = {(r.doc_a, r.doc_b): r for r in idf_jaccard_pairs(spark, sf, threshold_ppm=0).collect()}
    rare_pair = got[(20, 21)]
    assert rare_pair.wjaccard_ppm > 600_000
    # boilerplate-only pairs: unweighted similarity is substantial,
    # weighted collapses by ~the df ratio
    bp = got[(0, 1)]
    assert bp.jaccard_ppm > 250_000
    assert bp.wjaccard_ppm < bp.jaccard_ppm // 3
    assert bp.wjaccard_ppm < 100_000


def test_embedding_clusters_consistent_with_pairs(spark):
    """Every emitted pair's endpoints share a cluster; cluster_id is
    the min member id; transitivity holds (recomputed with a Python
    union-find over the operator's own pair list)."""
    from github_issues_lakehouse_spark.operators.similarity import (
        embedding_dup_clusters,
        neardup_embedding_cosine,
    )

    pairs = [
        (r.id_a, r.id_b)
        for r in neardup_embedding_cosine(spark, SF_DIR).collect()
    ]
    comp = {
        r.vec_id: r.cluster_id
        for r in embedding_dup_clusters(spark, SF_DIR).collect()
    }
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for x in parent:
        want[x] = find(x)
    assert comp == want
    for a, b in pairs:
        assert comp[a] == comp[b]
    for node, c in comp.items():
        assert c <= node


def test_term_burst_planted_spike(spark, tmp_path):
    """A term that appears once per bucket then 50x in the last
    bucket fires the burst flag with the exact cross-multiplied
    ratio; stationary terms do not fire."""
    from github_issues_lakehouse_spark.operators.text6 import term_burst_detection

    docs = []
    did = 0
    # 6 buckets of 50 docs; every doc carries 'steady'; bucket 5 docs
    # additionally carry 'viral' many times
    for b in range(6):
        for i in range(50):
            text = "steady filler words here"
            if b == 5:
                text += " " + " ".join(["viral"] * 3)
            elif i == 0:
                text += " viral"  # sparse background presence
            docs.append((did, "s", text, len(text)))
            did += 1
    df = spark.createDataFrame(
        docs, "doc_id long, source string, text string, n_chars long"
    )
    sf = str(tmp_path / "sf")
    import os

    os.makedirs(sf, exist_ok=True)
    df.write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = term_burst_detection(spark, sf).collect()
    top = rows[0]
    assert top.term == "viral"
    assert top.bucket == 5
    assert top.bursting is True
    # exact rule: c=150, prior buckets=5, cum_before=5 -> ratio 150x
    assert (top.n_count, top.n_prior, top.cum_before) == (150, 5, 5)
    assert top.burst_ppm == 150 * 1_000_000
    steady = [r for r in rows if r.term == "steady"]
    assert all(not r.bursting for r in steady)


def test_new_ops_broadcast_claims(spark):
    """Plan-level scale claims for the closing-wave operators: the PQ
    tiers join against BROADCAST codeword/LUT tables (never shuffling
    the corpus on them), and the burst detector's top-m gate is a
    broadcast semi-join."""
    from github_issues_lakehouse_spark.operators.text6 import term_burst_detection
    from github_issues_lakehouse_spark.operators.vectors2 import (
        pq_adc_recall,
        pq_codebook_stats,
    )
    from github_issues_lakehouse_spark.plans import broadcast_join_count

    assert broadcast_join_count(pq_codebook_stats(spark, SF_DIR)) >= 1
    assert broadcast_join_count(pq_adc_recall(spark, SF_DIR)) >= 2
    assert broadcast_join_count(term_burst_detection(spark, SF_DIR)) >= 1


def test_mann_whitney_group_symmetry(spark):
    """U_promo + U_other == na*nb (the complement identity): derive
    U_other from the emitted exact integers and check the identity —
    a wrong tie term breaks it immediately."""
    from github_issues_lakehouse_spark.operators.statistics import mann_whitney_price

    r = mann_whitney_price(spark, SF_DIR).collect()[0]
    # u2_promo = 2*U_promo; identity: U_promo + U_other = na*nb
    u2_other = 2 * r.n_promo * r.n_other - r.u2_promo
    assert u2_other >= 0
    # rank-biserial antisymmetry: swapping groups flips the sign
    num = r.u2_promo - r.n_promo * r.n_other
    assert (u2_other - r.n_promo * r.n_other) == -num
