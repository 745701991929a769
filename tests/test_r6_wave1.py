"""Round-6 wave 1: robust MAD anomalies, HITS, shard-local dedup
loss, LSH bucket-skew pricing, chunk-stitch pairs, memorization risk.

Each test recomputes the operator's claim from first principles (a
plain-Python reference over collected base data, or an internal
consistency identity the math guarantees) — the oracle gate already
proves Spark == DuckDB; these prove both equal the intended
semantics.
"""

from collections import Counter, defaultdict

from pyspark.sql import functions as F

from github_issues_lakehouse_spark.sources.registry import load_table

from .conftest import SF_DIR


def test_mad_anomaly_matches_python_reference(spark):
    """med2/mad4/flag equal a plain-Python recompute over the same
    trailing windows, and the flag is exactly the integer
    cross-multiplication of the documented rule."""
    from github_issues_lakehouse_spark.operators.timeseries import mad_anomaly_events

    daily = (
        load_table(spark, SF_DIR, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    series = defaultdict(list)
    for r in sorted(daily, key=lambda r: (r.event_type, r.day)):
        series[r.event_type].append((r.day, r.n))

    want = {}
    for et, rows in series.items():
        ns = [n for _, n in rows]
        for i, (day, n) in enumerate(rows):
            wl = ns[max(0, i - 14) : i]
            m = len(wl)
            if m < 7:
                continue
            ws = sorted(wl)
            med2 = ws[(m + 1) // 2 - 1] + ws[m // 2]
            ds = sorted(abs(2 * v - med2) for v in wl)
            mad4 = ds[(m + 1) // 2 - 1] + ds[m // 2]
            want[(et, day)] = (n, m, med2, mad4, 2000 * abs(2 * n - med2) > 3000 * mad4)

    got = mad_anomaly_events(spark, SF_DIR).collect()
    assert len(got) == len(want) > 0
    for r in got:
        n, m, med2, mad4, flag = want[(r.event_type, r.day)]
        assert (r.n_events, r.n_trailing, r.med2, r.mad4, r.is_anomaly) == (
            n,
            m,
            med2,
            mad4,
            flag,
        )
        if mad4 > 0:
            assert r.robust_z == round(2.0 * (2 * n - med2) / mad4, 6)
        else:
            assert r.robust_z is None


def test_mad_anomaly_resists_masking_where_zscore_blinds(spark):
    """The reason B130 exists: a trailing window already containing a
    huge spike inflates mean+std enough that a second spike hides
    (z < 2), while median/MAD still flags it. Construct the case and
    check both operators' primitives disagree exactly as documented."""
    import statistics

    wl = [10, 11, 9, 10, 12, 10, 1000]  # one prior spike in the window
    x = 500  # second spike
    mu = statistics.mean(wl)
    sd = statistics.stdev(wl)
    assert abs((x - mu) / sd) < 2.0, "classic z-score must mask the spike"
    m = len(wl)
    ws = sorted(wl)
    med2 = ws[(m + 1) // 2 - 1] + ws[m // 2]
    ds = sorted(abs(2 * v - med2) for v in wl)
    mad4 = ds[(m + 1) // 2 - 1] + ds[m // 2]
    assert 2000 * abs(2 * x - med2) > 3000 * mad4, "MAD rule must flag it"


def test_hits_matches_python_reference_and_conserves_mass(spark):
    """The e6-integer HITS iterates equal a plain-Python recompute
    (exact folds + the one rounded normalize per half-step), every
    role's scores sum to ~1e6 (L1 normalization, rounding drift
    bounded by node count), and roles partition the node prefixes."""
    from github_issues_lakehouse_spark.operators.graph import hits_hub_authority

    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    trade = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_custkey", "l_suppkey")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    custs = [r.c_custkey for r in load_table(spark, SF_DIR, "customer").collect()]
    supps = [r.s_suppkey for r in load_table(spark, SF_DIR, "supplier").collect()]

    hub = {c: 1_000_000 for c in custs}
    auth = {}
    for _ in range(2):
        raw = defaultdict(int)
        for r in trade:
            if r.o_custkey in hub:
                raw[r.l_suppkey] += r.w * hub[r.o_custkey]
        tot = sum(raw.values())
        auth = {s: round(v / tot * 1_000_000) for s, v in raw.items()}
        raw = defaultdict(int)
        for r in trade:
            if r.l_suppkey in auth:
                raw[r.o_custkey] += r.w * auth[r.l_suppkey]
        tot = sum(raw.values())
        hub = {c: round(v / tot * 1_000_000) for c, v in raw.items()}

    got = {r.node: (r.role, r.score_e6) for r in hits_hub_authority(spark, SF_DIR).collect()}
    assert len(got) == len(custs) + len(supps)
    for c in custs:
        role, s = got[f"c:{c}"]
        assert role == "hub" and s == hub.get(c, 0)
    for sp in supps:
        role, s = got[f"s:{sp}"]
        assert role == "authority" and s == auth.get(sp, 0)
    hub_sum = sum(s for r, s in got.values() if r == "hub")
    auth_sum = sum(s for r, s in got.values() if r == "authority")
    assert abs(hub_sum - 1_000_000) <= len(custs)
    assert abs(auth_sum - 1_000_000) <= len(supps)


def test_hits_rejects_zero_iterations(spark):
    """n_iter=0 has no authority vector — a clear ValueError, not an
    AttributeError on a None join (ADVICE r6)."""
    import pytest as _pytest

    from github_issues_lakehouse_spark.operators.graph import hits_hub_authority

    with _pytest.raises(ValueError, match="n_iter >= 1"):
        hits_hub_authority(spark, SF_DIR, n_iter=0)


def test_shard_dedup_loss_identities(spark):
    """Per shard missed == global - local removable; totals reconcile
    against dedup_exact's corpus-wide duplicate count; docs
    partition across shards."""
    from github_issues_lakehouse_spark.operators.dedup import (
        dedup_exact,
        shard_local_dedup_loss,
    )

    rows = shard_local_dedup_loss(spark, SF_DIR).collect()
    assert {r.shard for r in rows} <= set(range(8))
    for r in rows:
        assert r.n_missed == r.n_global_removable - r.n_local_removable
        assert 0 <= r.n_local_removable <= r.n_global_removable <= r.n_docs
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    global_dupes = sum(
        r.dup_count - 1 for r in dedup_exact(spark, SF_DIR).collect()
    )
    assert sum(r.n_global_removable for r in rows) == global_dupes


def test_lsh_skew_audit_prices_the_candidate_join(spark):
    """Every doc posts exactly once per band; pair counts recompute
    from the raw postings; the capped pair count is what the capped
    candidate join actually produces (>= distinct candidate pairs —
    the same pair can land in several bands)."""
    from github_issues_lakehouse_spark.operators.dedup import (
        lsh_bucket_skew_audit,
        lsh_postings,
        minhash_candidates,
    )

    docs = load_table(spark, SF_DIR, "documents")
    n_docs = docs.count()
    got = {r.band_id: r for r in lsh_bucket_skew_audit(spark, SF_DIR).collect()}
    assert set(got) == {0, 1, 2, 3}

    posts = lsh_postings(docs).collect()
    sizes = Counter((p.band_id, p.band_key) for p in posts)
    for b, r in got.items():
        cs = [c for (bid, _), c in sizes.items() if bid == b]
        assert r.n_postings == n_docs == sum(cs)
        assert r.n_buckets == len(cs)
        assert r.max_bucket == max(cs)
        assert r.n_singleton == sum(1 for c in cs if c == 1)
        assert r.pairs_uncapped == sum(c * (c - 1) // 2 for c in cs)
        assert r.pairs_after_cap == sum(c * (c - 1) // 2 for c in cs if c <= 200)

    _, cand = minhash_candidates(spark, SF_DIR)
    assert sum(r.pairs_after_cap for r in got.values()) >= cand.count()


def test_tail_head_pairs_really_overlap(spark):
    """Every reported pair's tail tokens equal the partner's head
    tokens after the standing normalization, pairs are non-reflexive,
    and a planted stitched pair is found."""
    import re

    from github_issues_lakehouse_spark.operators.dedup import tail_head_overlap_pairs

    k = 2
    docs = {
        r.doc_id: r.text for r in load_table(spark, SF_DIR, "documents").collect()
    }

    def toks(t):
        return re.sub(r"\s+", " ", t.lower()).strip().split(" ")

    pairs = tail_head_overlap_pairs(spark, SF_DIR).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.doc_a != r.doc_b
        ta, tb = toks(docs[r.doc_a]), toks(docs[r.doc_b])
        assert len(ta) >= 2 * k and len(tb) >= 2 * k
        assert ta[-k:] == tb[:k], (r.doc_a, r.doc_b)

    # planted stitched chunks: b starts with a's last 2 tokens
    plant = spark.createDataFrame(
        [
            (900001, "alpha beta gamma delta OVERLAP MARKER", "s"),
            (900002, "overlap marker epsilon zeta eta theta", "s"),
        ],
        "doc_id long, text string, source string",
    )
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text", "source")
    import github_issues_lakehouse_spark.operators.dedup as D

    orig = D.load_table
    try:
        D.load_table = lambda s, d, t: base.unionByName(plant) if t == "documents" else orig(s, d, t)
        planted = tail_head_overlap_pairs(spark, SF_DIR).collect()
    finally:
        D.load_table = orig
    assert any(r.doc_a == 900001 and r.doc_b == 900002 for r in planted)


def test_memorization_risk_matches_python_reference(spark):
    """Per-source window counts equal a plain-Python k-gram recompute
    (k=8, same normalization and partial-shingle convention), and the
    planted duplicate documents make repeated_ppm nonzero."""
    import re

    from github_issues_lakehouse_spark.operators.text6 import memorization_risk_ngrams

    k = 8
    docs = load_table(spark, SF_DIR, "documents").select("source", "text").collect()
    grams = []
    for r in docs:
        t = re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
        n = max(len(t) - (k - 1), 1)
        for i in range(n):
            grams.append((r.source, " ".join(t[i : i + k])))
    gc = Counter(g for _, g in grams)
    want = defaultdict(lambda: [0, 0, set(), 0])
    for s, g in grams:
        w = want[s]
        w[0] += 1
        if gc[g] >= 2:
            w[1] += 1
        w[2].add(g)
    for s, w in want.items():
        w[3] = sum(1 for g in w[2] if gc[g] == 1)

    got = memorization_risk_ngrams(spark, SF_DIR).collect()
    assert {r.source for r in got} == set(want)
    any_repeated = False
    for r in got:
        w = want[r.source]
        assert (r.n_windows, r.n_repeated_windows, r.n_distinct_grams, r.n_unique_grams) == (
            w[0],
            w[1],
            len(w[2]),
            w[3],
        )
        assert r.repeated_ppm == (r.n_repeated_windows * 1000) // r.n_windows * 1000 + (
            (r.n_repeated_windows * 1000) % r.n_windows
        ) * 1000 // r.n_windows
        any_repeated = any_repeated or r.n_repeated_windows > 0
    assert any_repeated, "planted duplicates must register as repeated windows"


def test_quality_decile_lift_identities(spark):
    """Deciles partition the corpus; rates/lift/capture recompute
    from the emitted counts; the gains curve is monotone and ends at
    full capture; decile 1 (top scores) must not lift below the
    corpus average by construction of the heuristic's correlation
    with the gate."""
    from github_issues_lakehouse_spark.operators.quality_checks import (
        quality_decile_lift,
    )
    from github_issues_lakehouse_spark.operators.scale import training_corpus_filter

    rows = sorted(quality_decile_lift(spark, SF_DIR).collect(), key=lambda r: r.decile)
    n_docs = load_table(spark, SF_DIR, "documents").count()
    n_gold = training_corpus_filter(spark, SF_DIR).count()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_gold for r in rows) == n_gold
    assert rows[-1].cum_gold == n_gold and rows[-1].capture_ppm == 1_000_000

    def ppm(p, t):
        return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

    overall = ppm(n_gold, n_docs)
    cum = 0
    for r in rows:
        assert r.gold_rate_ppm == ppm(r.n_gold, r.n_docs)
        assert r.lift_e6 == ppm(r.n_gold, r.n_docs) * 1_000_000 // overall
        cum += r.n_gold
        assert r.cum_gold == cum
        assert r.capture_ppm == ppm(cum, n_gold)
        # value-grain deciles: each holds ~10% of docs modulo tie blocks
        assert r.n_docs > 0


def test_ann_mrr_consistent_with_recall_machinery(spark):
    """rr_e6 is exactly 1e6 DIV the rank of the first true neighbor,
    recomputed from the tiers' own outputs; a tier with zero hits for
    a query reports 0; MRR never exceeds 1e6."""
    from github_issues_lakehouse_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_ivf_topk,
        ann_lsh_topk,
        ann_mrr_at_k,
    )

    truth = {
        (r.q_id, r.neighbor_id) for r in ann_bruteforce_topk(spark, SF_DIR).collect()
    }
    approx = {
        "ivf": ann_ivf_topk(spark, SF_DIR).collect(),
        "lsh": ann_lsh_topk(spark, SF_DIR).collect(),
    }
    want = {}
    for method, rows in approx.items():
        first = {}
        for r in rows:
            if (r.q_id, r.neighbor_id) in truth:
                first[r.q_id] = min(first.get(r.q_id, 10**9), r.rank)
        want[method] = first

    got = ann_mrr_at_k(spark, SF_DIR).collect()
    q_ids = {r.q_id for r in got}
    assert len(got) == 2 * len(q_ids)
    for r in got:
        fr = want[r.method].get(r.q_id)
        if fr is None:
            assert (r.first_hit_rank, r.rr_e6) == (0, 0)
        else:
            assert r.first_hit_rank == fr
            assert r.rr_e6 == 1_000_000 // fr
        assert 0 <= r.rr_e6 <= 1_000_000


def test_event_freshness_mart_recomputes(spark):
    """Staleness, rate, and flags recompute exactly from the raw
    events; the freshest type has staleness 0."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        event_freshness_mart,
    )

    ev = (
        load_table(spark, SF_DIR, "events")
        .select("event_type", F.to_date("ts").alias("day"), F.unix_micros("ts").alias("us"))
        .collect()
    )
    per = defaultdict(lambda: [0, None, None, 0])
    cmax = max(r.us for r in ev)
    for r in ev:
        p = per[r.event_type]
        p[0] += 1
        p[1] = r.day if p[1] is None else min(p[1], r.day)
        p[2] = r.day if p[2] is None else max(p[2], r.day)
        p[3] = max(p[3], r.us)

    got = event_freshness_mart(spark, SF_DIR).collect()
    assert {r.event_type for r in got} == set(per)
    assert min(r.staleness_us for r in got) == 0
    for r in got:
        n, d0, d1, last = per[r.event_type]
        assert r.n_events == n and r.first_day == d0 and r.last_day == d1
        assert r.staleness_us == cmax - last
        assert r.events_per_day_e2 == n * 100 // ((d1 - d0).days + 1)
        assert r.is_stale == (cmax - last > 7 * 86_400_000_000)


def test_kneser_ney_counts_match_python_reference(spark):
    """Continuation/fanout counts, continuation ppm, and the
    absolute-discount estimate all equal a plain-Python bigram
    recompute; 'san francisco'-style words (high freq, few left
    contexts) get cont_prob far below their frequency share."""
    import re

    from github_issues_lakehouse_spark.operators.text6 import (
        ngram_kneser_ney_counts,
    )

    docs = load_table(spark, SF_DIR, "documents").select("text").collect()
    uni = Counter()
    bc = Counter()
    for r in docs:
        t = [w for w in re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")]
        uni.update(w for w in t if w != "")
        for a, b in zip(t, t[1:]):
            if a != "" and b != "":
                bc[(a, b)] += 1
    left = Counter(b for _, b in bc)
    right = Counter(a for a, _ in bc)
    B = len(bc)
    n1 = sum(1 for c in bc.values() if c == 1)
    n2 = sum(1 for c in bc.values() if c == 2)

    def ppm(p, t):
        return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

    got = ngram_kneser_ney_counts(spark, SF_DIR).collect()
    assert len(got) == 30
    want_top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert [(r.word, r.freq) for r in got] == want_top
    for r in got:
        assert r.n_left_ctx == left[r.word]
        assert r.n_right_ctx == right[r.word]
        assert r.cont_prob_ppm == ppm(left[r.word], B)
        assert r.discount_e6 == n1 * 1_000_000 // (n1 + 2 * n2)


def test_source_pair_dup_matrix_recomputes(spark):
    """Every cell equals a plain-Python recompute over sliding
    16-token window hashes; the matrix is symmetric by construction
    (only source_a <= source_b emitted) and nonzero on this corpus's
    templated text."""
    import re

    from github_issues_lakehouse_spark.operators.dedup import source_pair_dup_matrix

    k = 16
    per = defaultdict(Counter)  # gram -> source -> count
    for r in load_table(spark, SF_DIR, "documents").select("source", "text").collect():
        t = re.sub(r"\s+", " ", r.text.lower()).strip().split(" ")
        n = max(len(t) - (k - 1), 1)
        for i in range(n):
            per[" ".join(t[i : i + k])][r.source] += 1
    want = Counter()
    for srcs in per.values():
        ss = sorted(srcs)
        for i, sa in enumerate(ss):
            if srcs[sa] >= 2:
                want[(sa, sa)] += 1
            for sb in ss[i + 1 :]:
                want[(sa, sb)] += 1

    got = {(r.source_a, r.source_b): r.n_shared_windows
           for r in source_pair_dup_matrix(spark, SF_DIR).collect()}
    assert got == dict(want)
    assert any(a != b for a, b in got), "templated corpus must share cross-source"
    assert all(a <= b for a, b in got)


def test_stitch_against_index_matches_python_reference(spark):
    """The incremental stitch screen equals a plain-Python recompute:
    same '#ingest' md5 permille split, same capped index, same two
    probe directions; and the probe finds a planted boundary pair
    split across old/new."""
    import hashlib
    import re

    from github_issues_lakehouse_spark.operators.dedup import stitch_against_index

    k = 2

    def bucket(doc_id):
        return int(hashlib.md5(f"{doc_id}#ingest".encode()).hexdigest()[:15], 16) % 1000

    def fp(text):
        t = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        if len(t) < 2 * k:
            return None
        return (
            hashlib.md5(" ".join(t[:k]).encode()).hexdigest(),
            hashlib.md5(" ".join(t[-k:]).encode()).hexdigest(),
        )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "source", "text").collect()
    old = [(r.doc_id, fp(r.text)) for r in docs if bucket(r.doc_id) < 800]
    newd = [(r.doc_id, r.source, fp(r.text)) for r in docs if bucket(r.doc_id) >= 800]
    old = [(d, f) for d, f in old if f]
    hc = Counter(f[0] for _, f in old)
    tc = Counter(f[1] for _, f in old)
    idx = [(d, f) for d, f in old if hc[f[0]] <= 200 and tc[f[1]] <= 200]
    tails = Counter(f[1] for _, f in idx)
    heads = Counter(f[0] for _, f in idx)
    want = {}
    for d, src, f in newd:
        ext = tails[f[0]] if f else 0
        cont = heads[f[1]] if f else 0
        want[d] = (src, ext, cont, ext + cont > 0)

    got = stitch_against_index(spark, SF_DIR).collect()
    assert {r.doc_id for r in got} == set(want)
    for r in got:
        assert (
            r.source,
            r.n_extends_ingested,
            r.n_continued_by_ingested,
            r.is_stitch_candidate,
        ) == want[r.doc_id]


def test_stream_stitch_index_equals_batch_and_replay_idempotent(
    spark, tmp_path
):
    """D34: the drained index equals the batch fingerprints over all
    docs; re-merging the full corpus (redelivery past the guard) is a
    NO-OP — the keyed rows are idempotent state."""
    import shutil
    import tempfile

    from github_issues_lakehouse_spark.operators.dedup import head_tail_fingerprints
    from github_issues_lakehouse_spark.streaming import read_mart
    from github_issues_lakehouse_spark.streaming.ops import (
        stream_stitch_index_maintenance,
    )

    batch = load_table(spark, SF_DIR, "documents")
    d = tempfile.mkdtemp(prefix="stitch_docs_")
    try:
        batch.write.mode("overwrite").parquet(d)
        stream = (
            spark.readStream.schema(batch.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        path = str(tmp_path / "stitch_idx")
        q = stream_stitch_index_maintenance(stream, path, str(tmp_path / "ckpt"))
        q.awaitTermination(180)

        got = {
            r.doc_id: (r.head_h, r.tail_h) for r in read_mart(spark, path).collect()
        }
        want = {
            r.doc_id: (r.head_h, r.tail_h)
            for r in head_tail_fingerprints(batch).collect()
        }
        assert got == want and len(got) > 0

        # redelivery past the guard: keyed dedup absorbs a full refold
        refolded = (
            read_mart(spark, path)
            .unionByName(head_tail_fingerprints(batch))
            .groupBy("doc_id")
            .agg(F.min("head_h").alias("head_h"), F.min("tail_h").alias("tail_h"))
        )
        after = {r.doc_id: (r.head_h, r.tail_h) for r in refolded.collect()}
        assert after == want
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_watermark_lateness_matches_python_reference(spark):
    """Banded prefix-max == a plain running max in arrival order:
    every per-type aggregate recomputes exactly; and a fully ordered
    planted stream reports zero lateness while one late arrival is
    counted and dropped at the right threshold."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        watermark_lateness_audit,
    )

    ev = sorted(
        load_table(spark, SF_DIR, "events")
        .select("event_type", "event_id", F.unix_micros("ts").alias("us"))
        .collect(),
        key=lambda r: (r.event_type, r.event_id),
    )
    per = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, late, dropped, max, sum
    run = {}
    wm = 600 * 1_000_000
    for r in ev:
        prev = run.get(r.event_type)
        late = max(prev - r.us, 0) if prev is not None else 0
        p = per[r.event_type]
        p[0] += 1
        p[1] += late > 0
        p[2] += late > wm
        p[3] = max(p[3], late)
        p[4] += late
        run[r.event_type] = max(prev or -(1 << 62), r.us)

    def ppm(p, t):
        return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

    got = watermark_lateness_audit(spark, SF_DIR).collect()
    assert {r.event_type for r in got} == set(per)
    for r in got:
        n, late, dropped, mx, sm = per[r.event_type]
        assert (r.n_events, r.n_late, r.n_dropped_by_watermark) == (n, late, dropped)
        assert r.late_share_ppm == ppm(late, n)
        assert r.dropped_share_ppm == ppm(dropped, n)
        assert r.max_lateness_us == mx
        assert r.avg_lateness_us == sm // n

    # planted: ordered stream -> zero lateness; one 2h-late arrival
    # (well past the 10-minute watermark) -> counted AND dropped
    rows = [(i, f"2024-01-01 10:{i:02d}:00", 1, "t", 1.0, "{}") for i in range(10)]
    rows.append((10, "2024-01-01 08:00:00", 1, "t", 1.0, "{}"))  # arrives last, 2h late
    plant = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    import github_issues_lakehouse_spark.operators.timeseries as T

    orig = T.load_table
    try:
        T.load_table = lambda s, d, t: plant if t == "events" else orig(s, d, t)
        out = {r.event_type: r for r in watermark_lateness_audit(spark, SF_DIR, watermark_s=600).collect()}
    finally:
        T.load_table = orig
    r = out["t"]
    assert r.n_events == 11 and r.n_late == 1 and r.n_dropped_by_watermark == 1
    assert r.max_lateness_us == 7740 * 1_000_000  # 10:09 running max vs 08:00


def _srm_reference(counts: dict[str, int]) -> tuple[dict[str, int], int]:
    """Count-based Pearson chi-square in the operator's exact integer
    spelling: contrib_e6 = 1e6 * (1000*n - total*exp_permille)^2 //
    (1000 * total * exp_permille), exp 50/50. Equals
    floor(1e6 * (n-total/2)^2/(total/2)) — scipy chisquare * 1e6."""
    total = sum(counts.values())
    contrib = {}
    for arm, n in counts.items():
        d_milli = 1000 * n - total * 500
        contrib[arm] = (1_000_000 * d_milli * d_milli) // (1000 * total * 500)
    return contrib, sum(contrib.values())


def test_ab_srm_check_matches_python_reference(spark):
    """Arm counts, ppm shares, and the COUNT-based integer chi-square
    (ADVICE r6 high: share-based stats omit N and can never fire)
    recompute exactly from a hashlib split; the balanced md5 split on
    this data must not trip the 5% critical value."""
    import hashlib

    from github_issues_lakehouse_spark.operators.relational7 import ab_srm_check

    users = {
        r.user_id
        for r in load_table(spark, SF_DIR, "events").select("user_id").distinct().collect()
    }
    n_a = sum(
        1
        for u in users
        if int(hashlib.md5(f"{u}#ab".encode()).hexdigest()[:15], 16) % 2 == 0
    )
    counts = {"A": n_a, "B": len(users) - n_a}

    def ppm(p, t):
        return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

    total = len(users)
    contrib, chi2 = _srm_reference(counts)

    got = {r.arm: r for r in ab_srm_check(spark, SF_DIR).collect()}
    assert set(got) == {"A", "B"}
    for arm, r in got.items():
        assert r.n_users == counts[arm]
        assert r.obs_ppm == ppm(counts[arm], total)
        assert r.expected_ppm == 500_000
        assert r.chi2_contrib_e6 == contrib[arm]
        assert r.chi2_e6 == chi2
        assert r.srm_detected == (chi2 > 3_841_459)
    assert not got["A"].srm_detected, "balanced md5 split must pass SRM"


def test_ab_srm_check_detects_true_mismatch(spark, tmp_path):
    """The guardrail must FIRE on a genuinely broken split: mine user
    ids so the md5 arm assignment lands 400 A / 100 B (true chi2 =
    180 >> 3.84), write them as a synthetic events table, and assert
    srm_detected. Known-value check: chi2 for (400,100) vs 50/50 is
    exactly (150^2/250)*2 = 180.0 -> chi2_e6 == 180_000_000."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from github_issues_lakehouse_spark.operators.relational7 import ab_srm_check

    a_ids, b_ids, u = [], [], 0
    while len(a_ids) < 400 or len(b_ids) < 100:
        u += 1
        arm_a = int(hashlib.md5(f"{u}#ab".encode()).hexdigest()[:15], 16) % 2 == 0
        if arm_a and len(a_ids) < 400:
            a_ids.append(u)
        elif not arm_a and len(b_ids) < 100:
            b_ids.append(u)
    ids = a_ids + b_ids
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ids)), pa.int64()),
            "ts": pa.array([1_700_000_000_000_000_000 + i for i in range(len(ids))],
                           pa.timestamp("ns")),
            "user_id": pa.array(ids, pa.int64()),
            "event_type": pa.array(["view"] * len(ids)),
            "value": pa.array([1.0] * len(ids)),
            "props": pa.array(["{}"] * len(ids)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = {r.arm: r for r in ab_srm_check(spark, str(tmp_path)).collect()}
    contrib, chi2 = _srm_reference({"A": 400, "B": 100})
    assert chi2 == 180_000_000  # scipy chisquare([400,100]) == 180.0
    assert got["A"].n_users == 400 and got["B"].n_users == 100
    for arm in ("A", "B"):
        assert got[arm].chi2_contrib_e6 == contrib[arm]
        assert got[arm].chi2_e6 == chi2
        assert got[arm].srm_detected is True


def test_cluster_chaining_audit_identities(spark):
    """Edges/density/weakest-link recompute from the operator's own
    pairs + clusters; every pair's endpoints share a cluster; density
    == 1e6 exactly when the cluster is a verified clique, and
    is_chained flags precisely the rest."""
    from github_issues_lakehouse_spark.operators.dedup import (
        cluster_chaining_audit,
        components_from_pairs,
        dedup_minhash_lsh,
    )

    pairs = dedup_minhash_lsh(spark, SF_DIR).collect()
    comp = {
        r.doc_id: r.cluster_id
        for r in components_from_pairs(
            dedup_minhash_lsh(spark, SF_DIR).select("doc_a", "doc_b")
        ).collect()
    }
    edges = defaultdict(list)
    for p in pairs:
        assert comp[p.doc_a] == comp[p.doc_b]
        edges[comp[p.doc_a]].append(p.jaccard)
    members = Counter(comp.values())

    def ppm(p, t):
        return (p * 1000 // t) * 1000 + (p * 1000 % t) * 1000 // t

    got = {r.cluster_id: r for r in cluster_chaining_audit(spark, SF_DIR).collect()}
    assert set(got) == {c for c, n in members.items() if n >= 2}
    for c, r in got.items():
        n = members[c]
        poss = n * (n - 1) // 2
        assert r.n_members == n
        assert r.n_edges == len(edges[c])
        assert r.possible_edges == poss
        assert r.edge_density_ppm == ppm(len(edges[c]), poss)
        assert r.min_edge_jaccard == round(min(edges[c]), 6)
        assert r.is_chained == (ppm(len(edges[c]), poss) < 1_000_000)


def test_pii_rate_by_source_reconciles_with_per_doc_scrub(spark):
    """The per-source rollup equals an aggregation of the per-doc C25
    counts joined back to sources — the two marts cannot disagree."""
    from github_issues_lakehouse_spark.operators.text2 import (
        pii_rate_by_source,
        pii_redact,
    )

    src = {
        r.doc_id: r.source
        for r in load_table(spark, SF_DIR, "documents").select("doc_id", "source").collect()
    }
    per = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0, 0])
    for r in pii_redact(spark, SF_DIR).collect():
        p = per[src[r.doc_id]]
        p[0] += 1
        p[1] += r.n_emails > 0
        p[2] += r.n_phones > 0
        p[3] += r.n_ips > 0
        p[4] += (r.n_emails + r.n_phones + r.n_ips) > 0
        p[5] += r.n_emails
        p[6] += r.n_phones
        p[7] += r.n_ips

    got = pii_rate_by_source(spark, SF_DIR).collect()
    assert {r.source for r in got} == set(per)
    any_pii = False
    for r in got:
        p = per[r.source]
        assert (
            r.n_docs, r.docs_with_email, r.docs_with_phone, r.docs_with_ip,
            r.docs_with_any_pii, r.n_emails, r.n_phones, r.n_ips,
        ) == tuple(p)
        any_pii = any_pii or r.docs_with_any_pii > 0
    assert any_pii, "the synthetic injection must register"
