"""Property tests (SURVEY.md §5.5): dedup idempotence, KPI backlog
conservation, MinHash determinism."""

from pyspark.sql import functions as F

from github_issues_lakehouse_spark.operators import dedup, gold, silver
from github_issues_lakehouse_spark.operators.silver import merge_keep_latest

from .conftest import SF_DIR


def test_exact_dedup_idempotent(spark):
    d1 = dedup.dedup_exact(spark, SF_DIR)
    # dedup of the already-unique keep set changes nothing
    kept = d1.select(F.col("keep_doc_id").alias("doc_id")).distinct()
    assert kept.count() == d1.count()


def test_merge_keep_latest_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 2), (2, "c", 1)], "k int, v string, ver int"
    )
    once = merge_keep_latest(df, "k", "ver")
    twice = merge_keep_latest(once, "k", "ver")
    assert sorted([tuple(r) for r in once.collect()]) == sorted(
        [tuple(r) for r in twice.collect()]
    )
    assert once.count() == 2
    assert {(r.k, r.v) for r in once.collect()} == {(1, "b"), (2, "c")}


def test_backlog_conservation(spark):
    """Sum(created) - sum(closed) == final backlog summed over groups
    (the reference's backlog is a running difference — gold.py:120-123)."""
    s = silver.silver_issues(spark, SF_DIR)
    kpi = gold.kpi_monthly_component_tier(s)
    from pyspark.sql import Window

    w = Window.partitionBy("component", "priority_tier").orderBy(F.col("month").desc())
    final = kpi.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    total_created = kpi.agg(F.sum("created_count")).first()[0]
    total_closed = kpi.agg(F.sum("closed_count")).first()[0]
    final_backlog = final.agg(F.sum("backlog_end")).first()[0]
    assert total_created - total_closed == final_backlog


def test_minhash_deterministic(spark):
    a = dedup.dedup_minhash_lsh(spark, SF_DIR).collect()
    b = dedup.dedup_minhash_lsh(spark, SF_DIR).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_chunking_covers_every_token(spark):
    """Chunk windows tile each document: with stride = chunk-overlap,
    consecutive chunk starts differ by the stride and the final chunk
    reaches the last token."""
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.functions.textfns import norm_tokens
    from github_issues_lakehouse_spark.operators.chunking import chunk_documents
    from github_issues_lakehouse_spark.sources.registry import load_table

    chunks = chunk_documents(spark, SF_DIR, chunk_tokens=32, overlap=8)
    per_doc = chunks.groupBy("doc_id").agg(
        F.max(F.col("start_tok") + F.col("n_tok") - 1).alias("covered_to"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("start_tok").alias("max_start"),
    )
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.array_size(norm_tokens(F.col("text"))).alias("n_toks")
    )
    j = per_doc.join(docs, "doc_id")
    assert j.filter(F.col("covered_to") != F.col("n_toks")).count() == 0
    # starts form an arithmetic sequence with the stride
    assert j.filter(
        F.col("max_start") != (F.col("n_chunks") - 1) * 24 + 1
    ).count() == 0


def test_packing_conserves_tokens(spark):
    """Per-source bin totals sum to the source's total token count
    (no document lost or duplicated by packing)."""
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.functions.textfns import norm_tokens
    from github_issues_lakehouse_spark.operators.chunking import pack_sequences
    from github_issues_lakehouse_spark.sources.registry import load_table

    packed = pack_sequences(spark, SF_DIR).groupBy("source").agg(
        F.sum("total_tokens").alias("packed_tokens"), F.sum("n_docs").alias("packed_docs")
    )
    truth = (
        load_table(spark, SF_DIR, "documents")
        .select("source", F.array_size(norm_tokens(F.col("text"))).alias("n"))
        .groupBy("source")
        .agg(F.sum("n").alias("tokens"), F.count(F.lit(1)).alias("docs"))
    )
    j = packed.join(truth, "source")
    assert j.filter(
        (F.col("packed_tokens") != F.col("tokens")) | (F.col("packed_docs") != F.col("docs"))
    ).count() == 0


def test_incremental_mart_equals_full_recompute(spark):
    """Folding batches one at a time into the mart produces exactly
    the full-recompute mart (associativity of the measures)."""
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.operators.gold import (
        daily_event_mart,
        merge_mart_increment,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    e = load_table(spark, SF_DIR, "events")
    full = daily_event_mart(e)
    b1 = e.filter(F.col("event_id") % 3 == 0)
    b2 = e.filter(F.col("event_id") % 3 == 1)
    b3 = e.filter(F.col("event_id") % 3 == 2)
    mart = None
    for b in (b1, b2, b3):
        mart = merge_mart_increment(mart, b)
    assert mart.exceptAll(full).count() == 0
    assert full.exceptAll(mart).count() == 0


def _pairs(df):
    return sorted(map(tuple, df.collect()))


def test_skew_caps_only_reduce_candidates(spark):
    """minhash/simhash caps are candidate-generation guards
    (verification is untouched): capped results are a subset of
    uncapped, and a tiny cap that actually triggers only shrinks the
    output further."""
    uncapped = _pairs(dedup.dedup_minhash_lsh(spark, SF_DIR, bucket_cap=0))
    default = _pairs(dedup.dedup_minhash_lsh(spark, SF_DIR))
    tiny = _pairs(dedup.dedup_minhash_lsh(spark, SF_DIR, bucket_cap=2))
    assert set(default) <= set(uncapped)
    assert set(tiny) <= set(default)

    unc_s = _pairs(dedup.dedup_simhash(spark, SF_DIR, bucket_cap=0))
    def_s = _pairs(dedup.dedup_simhash(spark, SF_DIR))
    tiny_s = _pairs(dedup.dedup_simhash(spark, SF_DIR, bucket_cap=2))
    assert set(def_s) <= set(unc_s)
    assert set(tiny_s) <= set(def_s)


def test_caps_bound_boilerplate_explosion(spark):
    """The scale scenario the guards exist for: a corpus where 300
    documents are identical boilerplate. Uncapped, the boilerplate
    cluster alone emits 300*299/2 = 44850 pairs (O(cluster²) — the
    thing that kills a 100 TB run); with the cap the degenerate
    bucket is dropped and only the informative corpus survives."""
    boiler = [(i, "the standard license header text repeated verbatim in every file")
              for i in range(300)]
    unique = [(1000 + i, f"document number {i} with its own distinctive content about topic {i}")
              for i in range(20)]
    docs = spark.createDataFrame(boiler + unique, "doc_id long, text string")

    uncapped = dedup.dedup_minhash_lsh(spark, SF_DIR, bucket_cap=0, docs=docs)
    assert uncapped.count() >= 300 * 299 // 2
    capped = dedup.dedup_minhash_lsh(spark, SF_DIR, bucket_cap=50, docs=docs)
    assert capped.count() == 0  # every boilerplate band bucket > cap

    # the templated "unique" docs legitimately land within hamming<=3
    # of each other; the guard only has to remove the boilerplate
    # cluster's pairs (ids < 1000)
    capped_sim = dedup.dedup_simhash(spark, SF_DIR, bucket_cap=50, docs=docs)
    assert capped_sim.filter("doc_a < 1000 OR doc_b < 1000").count() == 0

    # ngram: boilerplate shingles exceed the df cap (df=300) and leave
    # the feature universe, so no boilerplate pair can form; the
    # templated docs' shared shingles (df=20) legitimately stay
    capped_ng = dedup.dedup_ngram_jaccard(spark, SF_DIR, df_cap=50, docs=docs)
    assert capped_ng.filter("doc_a < 1000 OR doc_b < 1000").count() == 0
    assert capped_ng.count() > 0


def test_ngram_df_cap_prunes_feature_universe(spark):
    """The ngram df cap removes corpus-common shingles from the
    feature set itself (stopword-style pruning): at a cap no shingle
    reaches, results equal uncapped exactly; a triggering cap yields
    a valid exact jaccard over the capped universe (values stay in
    (0, 1], deterministic)."""
    unc = _pairs(dedup.dedup_ngram_jaccard(spark, SF_DIR, df_cap=0))
    default = _pairs(dedup.dedup_ngram_jaccard(spark, SF_DIR))
    assert default == unc  # df_cap=1000 never triggers at test SF

    tiny = _pairs(dedup.dedup_ngram_jaccard(spark, SF_DIR, df_cap=3))
    tiny2 = _pairs(dedup.dedup_ngram_jaccard(spark, SF_DIR, df_cap=3))
    assert tiny == tiny2
    assert all(0.0 < j <= 1.0 for _, _, j in tiny)


def test_skew_caps_ride_the_join_exchange(spark):
    """The caps are window counts partitioned by the SAME key the
    candidate self-join shuffles on, so the bucket-size pass rides the
    exchange the join needs anyway. Pins: (a) no cartesian expansion;
    (b) every Window in the plan partitions on the posting/join key —
    a Window keyed on anything else would add a foreign sort pass of
    the posting stream. (A separate aggregate+anti-join guard was
    measured 2-2.5x slower at sf0.1: each AQE query stage of the
    second branch re-ran the whole signature/shingle computation.)"""
    import re

    from github_issues_lakehouse_spark.plans import assert_no_cartesian
    from github_issues_lakehouse_spark.plans.introspect import _plan_str

    for df, key_cols in (
        (dedup.dedup_minhash_lsh(spark, SF_DIR), ("band_id", "band_key")),
        (dedup.dedup_ngram_jaccard(spark, SF_DIR), ("shingle",)),
        (dedup.dedup_simhash(spark, SF_DIR), ("bid", "bval")),
    ):
        assert_no_cartesian(df)
        plan = _plan_str(df)
        # formatted plans list each Window's partition spec in its
        # "Arguments:" line; every one must mention the join key
        win_args = re.findall(r"\(\d+\) Window\n(?:.*\n)*?Arguments: (.*)", plan)
        assert win_args, "cap window missing from plan"
        for args in win_args:
            assert all(k in args for k in key_cols), args


def test_neardup_block_count_invariant(spark):
    """The triangle block-pair decomposition is exact: every vector
    pair lands in exactly one block-pair group, so the result is
    independent of n_blocks."""
    from github_issues_lakehouse_spark.operators import similarity

    r3 = _pairs(similarity.neardup_embedding_cosine(spark, SF_DIR, n_blocks=3))
    r8 = _pairs(similarity.neardup_embedding_cosine(spark, SF_DIR, n_blocks=8))
    assert r3 == r8
    assert len(r3) > 0


def test_simhash_near_identical_docs_collide(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and once"),
            (3, "completely different words about spark query engines at scale"),
        ],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.sig for r in dedup.simhash_signatures(docs).collect()}
    ham12 = bin(sigs[1] ^ sigs[2]).count("1")
    ham13 = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham12 < ham13


def test_exact_substrings_planted_boilerplate(spark, tmp_path):
    """Planted giant-duplicate-block corpus (VERDICT r4 task 6): a
    50-token boilerplate PREPENDED (phase-aligned with the k=10 grid)
    to 30% of docs. Every planted doc except the globally-first one
    must lose exactly the 5 boilerplate blocks; unplanted docs and
    the first planted doc lose nothing (doc bodies are unique)."""
    import uuid

    k = 10
    boiler = " ".join(f"bp{i}" for i in range(5 * k))
    rows = []
    for i in range(60):
        body = " ".join(uuid.uuid4().hex for _ in range(37))
        text = (boiler + " " + body) if i % 10 < 3 else body
        rows.append((i, text, "en", "s0", len(text)))
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    out = {r.doc_id: r for r in dedup.dedup_exact_substrings(spark, d, block_tokens=k).collect()}
    planted = sorted(i for i in range(60) if i % 10 < 3)
    first = planted[0]
    for i in range(60):
        if i in planted and i != first:
            assert out[i].n_dup_blocks == 5, i
            assert out[i].tokens_removed == 5 * k, i
        else:
            assert out[i].n_dup_blocks == 0, i

    # savings mart agrees: removed = 5k tokens per non-first planted doc
    sav = dedup.token_dedup_savings(spark, d, block_tokens=k).collect()
    assert sum(r.tokens_removed for r in sav) == (len(planted) - 1) * 5 * k


def test_phase_audit_sees_cross_phase_duplication_grid_misses(spark, tmp_path):
    """C95 vs C93: the same 30-token boilerplate planted at token
    offset 0 in one doc and offset 3 in another. The fixed grid sees
    NO duplication — the runs are phase-misaligned, at any anchor —
    while the stride-1 audit's phase-free column must count every
    shared window: 2 docs x (30-k+1) = 42 duplicated-window
    occurrences, all invisible to same-phase matching
    (grid_miss_ppm = 1e6 wherever duplication exists)."""
    import uuid

    k = 10
    boiler = " ".join(f"bp{i}" for i in range(30))
    pad = " ".join(uuid.uuid4().hex for _ in range(20))
    rows = [
        (1, boiler + " " + pad, "en", "s0", 1),
        # offset 3: three filler tokens shift every window's phase
        (2, "x1 x2 x3 " + boiler + " " + pad[::-1], "en", "s0", 1),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    grid = dedup.dedup_exact_substrings(spark, d, block_tokens=k).collect()
    assert sum(r.n_dup_blocks for r in grid) == 0  # grid is phase-blind here

    audit = dedup.substring_phase_audit(spark, d, k=k, sample_pct=100).collect()
    assert len(audit) == k
    assert sum(r.n_dup_any for r in audit) == 42
    assert sum(r.n_dup_same_phase for r in audit) == 0
    for r in audit:
        assert r.n_dup_same_phase <= r.n_dup_any <= r.n_windows
        assert r.grid_miss_ppm is None or 0 <= r.grid_miss_ppm <= 1_000_000
        if r.n_dup_any:
            assert r.grid_miss_ppm == 1_000_000  # all misses here


def test_phase_audit_same_offset_duplication_is_grid_visible(spark, tmp_path):
    """Counter-case: the boilerplate at the SAME offset in both docs
    — every shared window recurs at its own phase, so same-phase
    mass equals phase-free mass and grid_miss_ppm is 0."""
    import uuid

    k = 10
    boiler = " ".join(f"bp{i}" for i in range(30))
    rows = [
        (1, boiler + " " + " ".join(uuid.uuid4().hex for _ in range(15)), "en", "s0", 1),
        (2, boiler + " " + " ".join(uuid.uuid4().hex for _ in range(15)), "en", "s0", 1),
    ]
    d = str(tmp_path / "sf")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    audit = dedup.substring_phase_audit(spark, d, k=k, sample_pct=100).collect()
    assert sum(r.n_dup_any for r in audit) == 42
    assert sum(r.n_dup_same_phase for r in audit) == 42
    assert all((r.grid_miss_ppm or 0) == 0 for r in audit)
    # and the fixed grid does remove the aligned boilerplate blocks
    grid = dedup.dedup_exact_substrings(spark, d, block_tokens=k).collect()
    assert sum(r.n_dup_blocks for r in grid) == 3  # 30 tokens / k per dup doc
