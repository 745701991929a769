"""Round-5 second-wave invariants: HLL sketch, mergeable quantile
sketch, cluster-aware holdout, incremental index dedup, and Hamilton
token-budget apportionment. Value parity vs DuckDB is pinned by
test_oracle.py; these tests pin the semantic identities a hash can't
explain — estimator math recomputed independently in Python,
mergeability, conservation, and the leak-free-split invariant."""

import hashlib

from pyspark.sql import functions as F

from github_issues_lakehouse_spark.operators import chunking, dedup, sketches
from github_issues_lakehouse_spark.sources.registry import load_table

from .conftest import SF_DIR


def _py_hll(terms, m=64, rmax=24):
    """Independent Python recomputation of the register table."""
    regs = {}
    for t in terms:
        h = int(hashlib.md5(f"{t}#hll".encode()).hexdigest()[:15], 16)
        j, w = h % m, h // m
        if w == 0:
            rho = rmax
        else:
            rho = min(rmax, (w & -w).bit_length())
        regs[j] = max(regs.get(j, 0), rho)
    return regs


def test_hll_matches_python_recomputation(spark):
    """The whole estimator chain — registers, harmonic sum, raw
    estimate, linear-counting switch — agrees with a from-scratch
    Python implementation over the collected distinct terms."""
    m, rmax = sketches.HLL_M, sketches.HLL_RMAX
    docs = load_table(spark, SF_DIR, "documents")
    by_source = {}
    for r in docs.select(
        "source", F.explode(F.split(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")), " ")).alias("t")
    ).distinct().collect():
        by_source.setdefault(r.source, set()).add(r.t)

    got = {r.source: r for r in sketches.hll_distinct_terms(spark, SF_DIR).collect()}
    assert set(got) == set(by_source)
    for source, terms in by_source.items():
        regs = _py_hll(terms, m, rmax)
        s = sum(1 << (rmax - rho) for rho in regs.values()) + (m - len(regs)) * (1 << rmax)
        raw = (sketches.HLL_ALPHA64_E6 * m * m * (1 << rmax)) // (s * 1_000_000)
        v = m - len(regs)
        if v > 0 and raw <= (5 * m) // 2:
            est = sketches.HLL_LC_TABLE[v]
        else:
            est = raw
        row = got[source]
        assert row.n_exact == len(terms)
        assert row.n_registers_zero == v
        assert row.harmonic_sum == s
        assert row.n_hll == raw
        assert row.n_estimated == est


def test_hll_registers_bounded_and_mergeable(spark):
    """State is bounded (<= m rows per source, rho in [1, rmax]) and
    the max-merge of two half-corpus register tables equals the
    whole-corpus table — the idempotent fold D22 relies on."""
    m, rmax = sketches.HLL_M, sketches.HLL_RMAX
    docs = load_table(spark, SF_DIR, "documents")
    whole = sketches.hll_registers(docs)
    per_source = whole.groupBy("source").count().collect()
    assert all(r["count"] <= m for r in per_source)
    rng = whole.agg(F.min("rho"), F.max("rho")).first()
    assert rng[0] >= 1 and rng[1] <= rmax

    lo = docs.filter(F.col("doc_id") % 2 == 0)
    hi = docs.filter(F.col("doc_id") % 2 == 1)
    merged = (
        sketches.hll_registers(lo)
        .unionByName(sketches.hll_registers(hi))
        .groupBy("source", "register")
        .agg(F.max("rho").alias("rho"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_quantile_sketch_exact_value_inside_sketch_bin(spark):
    """The drill-in value is the true percentile_disc (recomputed in
    Python from the sorted cents) and always lands inside the bin the
    sketch selected."""
    rows = sketches.quantile_sketch_price(spark, SF_DIR).collect()
    li = load_table(spark, SF_DIR, "lineitem")
    cents = sorted(
        r.c
        for r in li.select(
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").alias("c")
        ).collect()
    )
    n = len(cents)
    assert {r.q for r in rows} == {50, 90, 99}
    for r in rows:
        assert r.n_total == n
        # smallest value with cum*100 >= q*n == element at index
        # ceil(q*n/100) - 1 of the sorted list
        idx = -(-r.q * n // 100) - 1
        assert r.exact_disc_cents == cents[idx]
        assert r.bin_lo_cents <= r.exact_disc_cents < r.bin_hi_cents


def test_dedup_aware_holdout_cluster_split_never_leaks(spark):
    """The headline invariant: zero near-dup pairs straddle the
    cluster-keyed split (every pair is within one component, and the
    component shares one root bucket); sizes partition the corpus."""
    n_docs = load_table(spark, SF_DIR, "documents").count()
    rows = {r.strategy: r for r in dedup.dedup_aware_holdout(spark, SF_DIR).collect()}
    assert set(rows) == {"doc_key", "cluster_key"}
    for r in rows.values():
        assert r.n_train + r.n_test == n_docs
    assert rows["cluster_key"].cross_pairs == 0
    # the corpus has planted near-dups; a doc-keyed split leaks some
    assert rows["doc_key"].cross_pairs > 0


def test_dedup_against_index_matches_bruteforce(spark):
    """Per-doc hit counts equal a from-scratch Python recomputation
    of the grid + old/new split, and the old/new partition is the
    documented md5 permille bucket."""
    k, old_permille = 10, 800
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text").collect()

    def bucket(i):
        return int(hashlib.md5(f"{i}#ingest".encode()).hexdigest()[:15], 16) % 1000

    def grid(text):
        toks = " ".join(text.lower().split()).split(" ")
        nb = len(toks) // k
        return [" ".join(toks[p * k : p * k + k]) for p in range(nb)]

    index = set()
    new_docs = {}
    for r in docs:
        blocks = [hashlib.md5(b.encode()).hexdigest() for b in grid(r.text)]
        if bucket(r.doc_id) < old_permille:
            index.update(blocks)
        else:
            new_docs[r.doc_id] = blocks
    got = {r.doc_id: r for r in dedup.dedup_against_index(spark, SF_DIR).collect()}
    assert set(got) == set(new_docs)
    for doc_id, blocks in new_docs.items():
        r = got[doc_id]
        assert r.n_blocks == len(blocks)
        assert r.n_hit_blocks == sum(1 for b in blocks if b in index)
        if r.n_blocks == 0:
            assert r.hit_ppm == 0 and not r.is_dup


def test_token_budget_apportionment_sums_exactly(spark):
    """Hamilton identities: quotas sum to EXACTLY the budget, every
    quota is base or base+1, and shares are the exact ppm of the
    budget."""
    budget = 500_000
    rows = chunking.token_budget_apportionment(spark, SF_DIR, budget_tokens=budget).collect()
    assert sum(r.quota_tokens for r in rows) == budget
    total = sum(r.tokens_available for r in rows)
    for r in rows:
        base = budget * r.tokens_available // total
        assert r.quota_tokens in (base, base + 1)
        assert r.budget_share_ppm == r.quota_tokens * 1_000_000 // budget


def test_neardup_against_index_cross_split_and_bounds(spark):
    """Every match really crosses the md5 ingest split, the match is
    a genuine banding candidate (same signature band), and the ppm
    sits in [0, 1e6]; no-candidate docs carry NULLs and admit."""
    rows = dedup.neardup_against_index(spark, SF_DIR).collect()

    def bucket(i):
        return int(hashlib.md5(f"{i}#ingest".encode()).hexdigest()[:15], 16) % 1000

    assert rows, "new-doc side empty"
    assert all(bucket(r.doc_id) >= 800 for r in rows)
    matched = [r for r in rows if r.matched_doc_id is not None]
    assert matched, "planted near-dups should produce matches"
    for r in matched:
        assert bucket(r.matched_doc_id) < 800  # historical side
        assert 0 <= r.best_jaccard_ppm <= 1_000_000
        assert r.is_neardup == (r.best_jaccard_ppm >= 500_000)
    for r in rows:
        if r.matched_doc_id is None:
            assert r.best_jaccard_ppm is None and not r.is_neardup


def test_lsh_postings_match_candidate_stage_banding(spark):
    """The streaming delta helper emits the same (doc, band, key)
    rows as the batch candidate stage's banding (pre-cap) — the
    bit-parity contract that lets D24's index feed the prober."""
    from github_issues_lakehouse_spark.operators.dedup import (
        band_postings,
        lsh_postings,
        minhash_candidates,
    )

    docs = load_table(spark, SF_DIR, "documents")
    with_sig, _ = minhash_candidates(spark, SF_DIR)
    via_sig = sorted(map(tuple, band_postings(with_sig).collect()))
    via_docs = sorted(map(tuple, lsh_postings(docs).collect()))
    assert via_sig == via_docs


def test_curriculum_plan_partitions_corpus_with_ordered_quality(spark):
    """Phases partition the corpus, each phase holds ~a fifth (exact
    quintile banding on a discrete score allows tie-driven imbalance,
    never emptiness on this corpus), and mean quality is strictly
    non-decreasing with phase — the property a curriculum consumer
    relies on."""
    rows = sorted(
        chunking.curriculum_plan(spark, SF_DIR).collect(), key=lambda r: r.phase
    )
    d = load_table(spark, SF_DIR, "documents")
    assert sum(r.n_docs for r in rows) == d.count()
    assert [r.phase for r in rows] == list(range(1, len(rows) + 1))
    means = [r.mean_quality_e6 for r in rows]
    assert means == sorted(means)
    assert sum(r.doc_share_ppm for r in rows) <= 1_000_000
    assert all(r.n_docs > 0 for r in rows)


def test_span_corruption_plan_is_deterministic_python_twin(spark):
    """Span selection equals the md5 recomputation; spans never
    overlap (span_len <= stride) so masked_tokens is exactly
    n_spans * span_len and bounded by n_tokens."""
    stride, span_len, noise = 8, 3, 150
    rows = chunking.span_corruption_plan(spark, SF_DIR).collect()
    docs = {r.doc_id: r.text for r in load_table(spark, SF_DIR, "documents").collect()}
    assert set(docs) == {r.doc_id for r in rows}
    for r in rows:
        toks = " ".join(docs[r.doc_id].lower().split()).split(" ")
        assert r.n_tokens == len(toks)
        n_cells = (len(toks) - span_len) // stride + 1 if len(toks) >= span_len else 0
        want = sum(
            1
            for c in range(max(n_cells, 0))
            if int(hashlib.md5(f"{r.doc_id}#span{c}".encode()).hexdigest()[:15], 16) % 1000
            < noise
        )
        assert r.n_spans == want
        assert r.masked_tokens == want * span_len
        assert r.masked_tokens <= max(r.n_tokens, span_len)


def test_normalization_impact_monotone_distinct(spark):
    """Levels are cumulative normalizations, so n_distinct never
    increases down the ladder and dup_ppm never decreases."""
    rows = sorted(
        dedup.normalization_impact(spark, SF_DIR).collect(), key=lambda r: r.level
    )
    assert [r.level for r in rows] == [
        "1_raw",
        "2_lower",
        "3_lower_ws",
        "4_lower_ws_alnum",
    ]
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert all(r.n_docs == n_docs for r in rows)
    distinct = [r.n_distinct for r in rows]
    assert distinct == sorted(distinct, reverse=True)
    dup = [r.dup_ppm for r in rows]
    assert dup == sorted(dup)


def test_holt_linear_matches_python_recursion(spark):
    """The packed fixed-point fold equals a plain Python recursion
    over the gap-filled daily grid — levels track counts, and the
    forecast is exactly level + trend."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        _daily_grid,
        holt_linear_daily,
        holt_python_reference,
    )

    grid = sorted(
        _daily_grid(spark, SF_DIR).collect(), key=lambda r: (r.event_type, r.day)
    )
    series = {}
    for r in grid:
        series.setdefault(r.event_type, []).append(r.n * 100)
    want = {et: holt_python_reference(xs, 3, 2) for et, xs in series.items()}
    got = sorted(
        holt_linear_daily(spark, SF_DIR).collect(), key=lambda r: (r.event_type, r.day)
    )
    by_type = {}
    for r in got:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rows in by_type.items():
        assert [(r.level_e2, r.trend_e2) for r in rows] == want[et]
        assert all(r.forecast_next_e2 == r.level_e2 + r.trend_e2 for r in rows)


def test_holt_packed_fold_survives_decay_to_zero(spark):
    """ADVICE r5: a high-volume series that stops firing feeds the
    fold gap-filled trailing zeros; pre-fix, l+t overshot below 0,
    the sign-carrying % unpacked the trend ~2^24 too low, and the
    state exploded. Prove the production Spark fold, the DuckDB
    oracle fold, and the plain-Python reference agree on every
    prefix of such a series (and that the level really decays to 0
    instead of exploding)."""
    import duckdb
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.operators.timeseries import (
        holt_packed_fold,
        holt_python_reference,
        holt_unpack,
    )
    from github_issues_lakehouse_spark.queries import holt_fold_sql_parts

    a10, b10 = 3, 2
    # spike then silence (e2 units): trend goes negative, l+t
    # undershoots 0 within a few zero days
    xs = [50_000, 60_000, 55_000] + [0] * 50
    want = holt_python_reference(xs, a10, b10)
    # under floor rounding the zero-level trend fixed points are -1
    # and -2 (at t=-2: (8*-2 + 5) // 10 = -2), not 0; approaching
    # from a deep negative trend the fold settles at -2
    assert want[-1][0] == 0 and -2 <= want[-1][1] <= 0, (
        "series must decay to the zero-level fixed point"
    )
    assert any(
        (a10 * x + (10 - a10) * (l + t) + 5) // 10 < 0
        for (l, t), x in zip(want[:-1], xs[1:])
    ), "series must actually drive the pre-clamp level negative"

    prefixes = [(k, xs[:k]) for k in range(1, len(xs) + 1)]
    pdf = spark.createDataFrame(
        [(k, v) for k, v in prefixes], "k int, pfx array<bigint>"
    )
    state = holt_packed_fold(F.col("pfx"), a10, b10)
    lvl, trd = holt_unpack(state)
    got_spark = {
        r.k: (r.l, r.t)
        for r in pdf.select("k", lvl.alias("l"), trd.alias("t")).collect()
    }
    S, OFF = 1 << 24, 1 << 23
    nl, nt = holt_fold_sql_parts(a10, b10)
    con = duckdb.connect()
    got_duck = {}
    for k, pfx in prefixes:
        lst = "[" + ", ".join(str(v) for v in pfx) + "]"
        (s,) = con.execute(
            f"""SELECT list_reduce(
                  list_transform({lst}::BIGINT[],
                    (x, i) -> CASE WHEN i = 1 THEN x * {S} + {OFF} ELSE x END),
                  (acc, e) -> {nl} * {S} + ({nt} + {OFF}))"""
        ).fetchone()
        r = ((s % S) + S) % S
        got_duck[k] = ((s - r) // S, r - OFF)
    for k in range(1, len(xs) + 1):
        assert got_spark[k] == want[k - 1], f"spark diverges at prefix {k}"
        assert got_duck[k] == want[k - 1], f"duckdb diverges at prefix {k}"


def test_rendezvous_only_moves_to_the_new_shard(spark):
    """THE HRW property: growing N -> N+1 moves docs only INTO the
    new shard — every old shard's loss equals its moved_out, the new
    shard's gain equals total moved, and no old shard gains."""
    from github_issues_lakehouse_spark.operators.scale import rendezvous_shard_plan

    n = 8
    rows = {r.shard: r for r in rendezvous_shard_plan(spark, SF_DIR, n_shards=n).collect()}
    assert set(rows) == set(range(n + 1))
    total_moved = sum(r.n_moved_out for r in rows.values())
    new = rows[n]
    assert new.n_docs_before == 0 and new.n_moved_out == 0
    assert new.n_docs_after == total_moved
    for s in range(n):
        r = rows[s]
        assert r.n_docs_after == r.n_docs_before - r.n_moved_out
    n_docs = sum(r.n_docs_before for r in rows.values())
    # expected moved share ~ 1/(N+1); allow generous slack on 500 docs
    assert 0.03 * n_docs < total_moved < 0.25 * n_docs
