"""Pretraining corpus preparation: document chunking, sequence
packing, and benchmark decontamination — the stages between "clean
corpus" and "token batches" in an LLM data pipeline.

Scale notes:
- chunking is a pure per-row explode (no shuffle at all);
- packing is per-source contiguous fill — one shuffle on the stratum
  key, then a running-sum window; exact global bin packing is
  inherently sequential, per-stratum fill is the parallel form every
  large pipeline uses;
- decontamination broadcasts the (small) benchmark n-gram set and
  semi-joins the corpus against it — one pass over the training side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import norm_tokens
from ..sources.registry import load_table


def chunk_documents(
    spark: SparkSession, sf_dir: str, chunk_tokens: int = 32, overlap: int = 8
) -> DataFrame:
    """Split each document into overlapping token windows (stride =
    chunk_tokens - overlap). Emits (doc_id, chunk_idx, start_tok,
    n_tok, chunk_hash) — the hash stands in for chunk text so the
    row stays narrow; a tokenizer-ready variant would carry the
    slice itself."""
    stride = chunk_tokens - overlap
    d = load_table(spark, sf_dir, "documents").withColumn("_toks", norm_tokens(F.col("text")))
    n = F.array_size("_toks")
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(stride))
    chunks = d.select(
        "doc_id",
        F.col("_toks"),
        F.posexplode(starts).alias("chunk_idx", "start_tok"),
    )
    piece = F.slice(F.col("_toks"), F.col("start_tok"), chunk_tokens)
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.array_size(piece).cast("long").alias("n_tok"),
        F.md5(F.array_join(piece, " ").cast("binary")).alias("chunk_hash"),
    )


def pack_sequences(spark: SparkSession, sf_dir: str, budget: int = 256) -> DataFrame:
    """Contiguous-fill sequence packing: within each source (the
    parallelism stratum), documents in doc_id order are packed into
    bins of ~``budget`` tokens; a document lands in the bin its
    preceding cumulative token count falls into. Returns per-bin
    occupancy — the batch manifest a loader consumes."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.array_size(norm_tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    binned = d.withColumn("bin", F.floor(before / budget))
    return binned.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.min("doc_id").alias("first_doc_id"),
        F.max("doc_id").alias("last_doc_id"),
    )


def pack_efficiency(spark: SparkSession, sf_dir: str, budget: int = 256) -> DataFrame:
    """C96 (r5): packing-efficiency accounting over ``pack_sequences``
    — per source: bin count, capacity fill in exact ppm, and the
    overfull/underfull bin split plus the worst bin. The number a
    training-loader owner reads before changing the token budget:
    fill_ppm near 1e6 with few overfull bins means the contiguous
    fill is tight; a heavy overfull tail means long documents
    straddle bins and the budget (or a length-bucketed packer,
    C79 length_bucketed_batches) needs revisiting. One extra
    per-source aggregate over the bin manifest — the corpus-scale
    work is pack_sequences' own single window pass.
    """
    from ..functions.exact import ppm_expr as _ppm

    bins = pack_sequences(spark, sf_dir, budget=budget)
    return (
        bins.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("total_tokens").alias("total_tokens"),
            F.sum((F.col("total_tokens") > budget).cast("long")).alias("n_overfull_bins"),
            F.sum((F.col("total_tokens") < budget).cast("long")).alias("n_underfull_bins"),
            F.max("total_tokens").alias("max_bin_tokens"),
        )
        .selectExpr(
            "source",
            "CAST(n_bins AS BIGINT) AS n_bins",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(total_tokens AS BIGINT) AS total_tokens",
            "CAST(n_overfull_bins AS BIGINT) AS n_overfull_bins",
            "CAST(n_underfull_bins AS BIGINT) AS n_underfull_bins",
            "CAST(max_bin_tokens AS BIGINT) AS max_bin_tokens",
            # fill vs nominal capacity; may exceed 1e6 (overfull bins
            # hold the spill by design) — still exact BIGINT
            f"CAST({_ppm('total_tokens', f'(n_bins * {budget})')} AS BIGINT) AS fill_ppm",
        )
    )


def decontaminate_ngram(
    spark: SparkSession, sf_dir: str, n: int = 3, benchmark_mod: int = 100
) -> DataFrame:
    """Benchmark decontamination: training documents that share any
    word ``n``-gram with the held-out benchmark set (here: every
    ``benchmark_mod``-th doc, standing in for an eval suite). Returns
    contaminated doc_ids with the count of distinct shared n-grams —
    the removal list a pretraining pipeline applies before packing.

    The benchmark n-gram set is tiny relative to the corpus and is
    broadcast; the training side streams through one inverted-index
    pass (no self-join)."""
    from .dedup import shingles_from

    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", norm_tokens(F.col("text")))
        .select("doc_id", F.array_distinct(shingles_from(F.col("_toks"), n)).alias("sh"))
    )
    bench_grams = (
        d.filter(F.col("doc_id") % benchmark_mod == 0)
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    train = d.filter(F.col("doc_id") % benchmark_mod != 0).select(
        "doc_id", F.explode("sh").alias("gram")
    )
    return (
        train.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_shared_ngrams"))
    )


def decontaminate_bloom(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    benchmark_mod: int = 100,
    m_bits: int = 1 << 18,
    k_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the constant-memory
    scale path of ``decontaminate_ngram``: the benchmark n-gram set is
    compressed into an ``m_bits``-bit Bloom filter instead of being
    broadcast verbatim, so the structure shipped to every task is
    O(m_bits) REGARDLESS of eval-suite size (a 100-benchmark suite and
    a 10M-ngram one cost the same map-side memory). Price: false
    positives (over-removal), never false negatives — the safe
    direction for decontamination.

    Fully deterministic and engine-reproducible: position i of a gram
    is the first 8 md5 hex digits of ``gram || '#i'`` read as an
    integer mod ``m_bits`` — the oracle computes identical positions
    and checks membership against the identical position set, so even
    the false positives match bit-for-bit.

    Scale shape: the bitset is BUILT distributively (positions →
    distinct → bit_or per 62-bit word) and only the packed words — a
    fixed ceil(m_bits/62)-row table, ~34 KB at the default — are
    collected and re-shipped as an array literal; the training side
    then streams map-side with ZERO join or shuffle for the membership
    test (one groupBy on doc_id for the counts). 62 bits per word
    keeps every mask below 2^62 — no sign-bit edge cases in either
    engine.
    """
    from .dedup import shingles_from

    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", norm_tokens(F.col("text")))
        .select("doc_id", F.array_distinct(shingles_from(F.col("_toks"), n)).alias("sh"))
    )

    def pos(gram_col, i: int):
        return (
            F.conv(F.substring(F.md5(F.concat(gram_col, F.lit(f"#{i}"))), 1, 8), 16, 10)
            .cast("long")
            % m_bits
        )

    bench = d.filter(F.col("doc_id") % benchmark_mod == 0).select(F.explode("sh").alias("gram"))
    positions = bench.select(
        F.explode(F.array(*[pos(F.col("gram"), i) for i in range(k_hashes)])).alias("p")
    ).distinct()
    words = (
        positions.groupBy((F.col("p") / 62).cast("int").alias("w"))
        .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 62) AS INT))")).alias("bits"))
        .collect()
    )
    # sum == bit_or here: positions are distinct, so each mask appears
    # once per word. Dense bounded array (~4231 longs at defaults),
    # shipped as a ONE-ROW broadcast joined to every task — an inline
    # F.lit(list) would be a 4231-child CreateArray re-evaluated per
    # row (measured 30x slower); the broadcast row materializes the
    # arrays once per task.
    n_words = (m_bits + 61) // 62
    dense = [0] * n_words
    for r in words:
        dense[r["w"]] = r["bits"]
    bits_df = spark.createDataFrame(
        [(dense, [1 << j for j in range(62)])], "_bloom array<long>, _pow2 array<long>"
    )

    def might_contain(gram_col):
        checks = []
        for i in range(k_hashes):
            p = pos(gram_col, i)
            word = F.element_at(F.col("_bloom"), (p / 62).cast("int") + 1)
            mask = F.element_at(F.col("_pow2"), (p % 62).cast("int") + 1)
            checks.append(word.bitwiseAND(mask) != 0)
        out = checks[0]
        for c in checks[1:]:
            out = out & c
        return out

    train = d.filter(F.col("doc_id") % benchmark_mod != 0).select(
        "doc_id", F.explode("sh").alias("gram")
    )
    return (
        train.crossJoin(F.broadcast(bits_df))
        .filter(might_contain(F.col("gram")))
        .groupBy("doc_id")
        .agg(F.count_distinct("gram").alias("n_flagged_ngrams"))
    )


def plan_token_shards(
    spark: SparkSession,
    sf_dir: str,
    shard_tokens: int = 512,
    bucket_width: int = 1000,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Global shard planning: assign every document (in doc_id order,
    across ALL sources) to the output shard its preceding cumulative
    token count lands in — the write-planning step that turns a
    filtered corpus into ~equal-token training shards.

    The global running sum uses the same two-level prefix-sum
    decomposition as concurrent_sessions, but keyed by doc_id range
    buckets instead of days: within-bucket window cumsum (shuffle on
    bucket id), then a carry window over ONE ROW PER BUCKET. With
    bucket_width 1000, the carry layer is 0.1% of the corpus; at
    extreme scale the same decomposition applies recursively to the
    carry layer itself (three levels cover 1e12 docs with bounded
    partitions). No global sort of the corpus ever happens.

    Integer `div` everywhere — shard ids are exact on both engines.
    """
    # The explicit isnotnull(bucket) is vacuous (div of a non-null
    # key) but makes BOTH consumers' scan subtrees identical: the
    # join branch infers it from the join key and pushes it into its
    # scan; without it here the carry branch's exchange differs by
    # that one filter and AQE cannot reuse the shuffle.
    base = docs if docs is not None else load_table(spark, sf_dir, "documents")
    d = (
        base.select(
            "doc_id",
            F.array_size(norm_tokens(F.col("text"))).alias("n_tokens"),
            F.expr(f"doc_id div {bucket_width}").alias("bucket"),
        )
        .filter(F.col("bucket").isNotNull())
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = d.withColumn(
        "before_local", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    # Bucket totals come from the WINDOW OUTPUT (last row's exclusive
    # prefix + its own tokens), not a fresh sum over the raw frame: a
    # plain sum(n_tokens) would let Catalyst prune the window and push
    # a partial aggregate below the exchange, planning a second
    # tokenize scan; consuming before_local pins this branch to the
    # same Exchange(bucket)+Window subtree, so AQE reuses the exchange
    # and the corpus is tokenized once.
    per_bucket = local.groupBy("bucket").agg(
        F.max(F.col("before_local") + F.col("n_tokens")).alias("bucket_tokens")
    )
    w_buckets = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    carry = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("bucket_tokens").over(w_buckets), F.lit(0)).alias("carry"),
    )
    return (
        local.join(F.broadcast(carry), "bucket")
        .withColumn("before", F.col("before_local") + F.col("carry"))
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr(f"(before_local + carry) div {shard_tokens}").alias("shard_id"),
        )
    )


def contamination_attribution(
    spark: SparkSession, sf_dir: str, n: int = 3, benchmark_mod: int = 100, df_cap: int = 200
) -> DataFrame:
    """Contamination ATTRIBUTION: for every contaminated training
    document, which benchmark document it leaks — the report an eval
    owner needs to decide whether a hit is a real leak (shared
    passage from one eval item) or idiom noise (one common phrase
    across many items).

    Scale shape: the (train x bench) pairing goes through the shared
    n-gram as an inverted index; benchmark grams with document
    frequency > ``df_cap`` on the BENCHMARK side (boilerplate idioms)
    leave the index before the join — the same stopword-style skew
    guard as dedup_ngram_jaccard, preventing one ubiquitous phrase
    from fanning out train_df x bench_df pairs. The verdict argmax
    is a window over the pair counts (ties -> min bench doc).
    """
    from .dedup import shingles_from

    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", norm_tokens(F.col("text")))
        .select("doc_id", F.array_distinct(shingles_from(F.col("_toks"), n)).alias("sh"))
    )
    bench = d.filter(F.col("doc_id") % benchmark_mod == 0).select(
        F.col("doc_id").alias("bench_doc_id"), F.explode("sh").alias("gram")
    )
    gram_df = bench.groupBy("gram").agg(F.count(F.lit(1)).alias("bdf"))
    bench_capped = bench.join(
        F.broadcast(gram_df.filter(F.col("bdf") <= df_cap).select("gram")), "gram"
    )
    train = d.filter(F.col("doc_id") % benchmark_mod != 0).select(
        "doc_id", F.explode("sh").alias("gram")
    )
    pair_counts = (
        train.join(F.broadcast(bench_capped), "gram")
        .groupBy("doc_id", "bench_doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_shared").desc(), F.col("bench_doc_id").asc()
    )
    return (
        pair_counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("bench_doc_id").alias("top_bench_doc_id"),
            F.col("n_shared").cast("long").alias("n_shared_ngrams"),
        )
    )


def redact_contaminated_spans(
    spark: SparkSession, sf_dir: str, n: int = 3, benchmark_mod: int = 100
) -> DataFrame:
    """Surgical decontamination: instead of DROPPING documents that
    share an n-gram with the benchmark set (``decontaminate_ngram``),
    remove only the contaminated token spans and keep the rest — the
    higher-yield variant a pretraining pipeline prefers when whole
    documents are too valuable to discard over one leaked span.

    A contaminated shingle start s covers tokens s..s+n-1 (1-based);
    a token survives iff no contaminated span covers it. Output per
    training doc: token counts before/removed and the rebuilt text.

    Shapes: the benchmark grams broadcast (as in decontaminate_ngram);
    the train side explodes shingle starts once and joins — the
    match output is only the contaminated (doc, start) pairs, folded
    to a per-doc start array; the rebuild is a higher-order
    ``filter`` with a nested ``exists`` over that (tiny) array — no
    second pass over the corpus, no UDF.
    """
    from .dedup import shingles_from

    base = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", norm_tokens(F.col("text")))
    )
    bench_grams = (
        base.filter(F.col("doc_id") % benchmark_mod == 0)
        .select(F.explode(F.array_distinct(shingles_from(F.col("_toks"), n))).alias("gram"))
        .distinct()
    )
    train = base.filter(F.col("doc_id") % benchmark_mod != 0)
    starts = F.sequence(
        F.lit(1), F.greatest(F.array_size(F.col("_toks")) - (n - 1), F.lit(1))
    )
    grams = train.select(
        "doc_id", F.col("_toks").alias("_t"), F.explode(starts).alias("i")
    ).select(
        "doc_id", "i", F.array_join(F.slice(F.col("_t"), F.col("i"), n), " ").alias("gram")
    )
    bad = (
        grams.join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.collect_set("i").alias("bad_starts"))
    )
    joined = train.join(bad, "doc_id", "left")
    covered = lambda idx: F.exists(  # noqa: E731
        F.col("bad_starts"), lambda s: (idx + 1 >= s) & (idx + 1 <= s + (n - 1))
    )
    kept = F.when(F.col("bad_starts").isNull(), F.col("_toks")).otherwise(
        F.filter(F.col("_toks"), lambda x, idx: ~covered(idx))
    )
    return joined.select(
        "doc_id",
        "source",
        F.array_size("_toks").cast("long").alias("n_tokens"),
        (F.array_size("_toks") - F.array_size(kept)).cast("long").alias("n_removed"),
        F.array_join(kept, " ").alias("clean_text"),
    )


def length_bucketed_batches(
    spark: SparkSession, sf_dir: str, band_width: int = 32, batch_size: int = 8
) -> DataFrame:
    """Length-bucketed batching plan: documents are banded by token
    count (``band_width``-token bands), batched within their band in
    doc_id order, and each batch reports its padding waste — the
    tokens a fixed-shape collator would burn padding every member up
    to the batch max. The mart that justifies length bucketing: waste
    within a narrow band is bounded by band_width * batch_size.

    Scale: banding is a map-only expression; the per-band window
    parallelizes across bands (shuffle on band). Output is one row
    per batch — corpus/batch_size rows.
    """
    from .scale import distributed_rank

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_size(norm_tokens(F.col("text"))).alias("n_tokens")
    )
    banded = d.withColumn("band", F.floor(F.col("n_tokens") / band_width))
    # two-level rank: a plain per-band window would hold a whole
    # band's documents in one task (bands are few; corpus/band is
    # huge at scale)
    ranked = distributed_rank(banded, ["band"], "doc_id", rank_col="_rk")
    batched = ranked.withColumn(
        "batch_in_band", F.floor((F.col("_rk") - 1) / batch_size)
    )
    return (
        batched.groupBy("band", "batch_in_band")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            F.col("band").cast("long").alias("band"),
            F.col("batch_in_band").cast("long").alias("batch_in_band"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("max_tokens").cast("long").alias("max_tokens"),
            F.col("sum_tokens").cast("long").alias("sum_tokens"),
            (F.col("n_docs") * F.col("max_tokens") - F.col("sum_tokens"))
            .cast("long")
            .alias("padding_waste"),
        )
    )


def source_interleave_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic proportional source interleaving: every document
    gets a normalized position key ``(rank_in_source - 0.5) /
    n_docs_in_source`` — sorting the corpus by that key interleaves
    sources evenly regardless of their sizes (each source's docs are
    spread uniformly over [0, 1)), which is the training-order
    property a data loader wants instead of source-contiguous blocks.

    Deliberately NO global row_number: a global rank would funnel the
    corpus through one sort partition. The key itself is the product
    — the writer range-partitions + sortWithinPartitions on it, so
    the global order materializes at write time without a single-task
    sort. The per-source rank itself uses the two-level
    ``distributed_rank`` decomposition (bucket windows + a one-row-
    per-bucket carry), so no task ever holds a whole source either.
    """
    from .scale import distributed_rank

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_src"))
    ranked = distributed_rank(d, ["source"], "doc_id", rank_col="src_rank")
    return ranked.join(F.broadcast(counts), "source").select(
        "doc_id",
        "source",
        F.col("src_rank").cast("long").alias("src_rank"),
        F.round((F.col("src_rank") - 0.5) / F.col("n_src"), 6).alias("interleave_key"),
    )


def token_budget_apportionment(
    spark: SparkSession, sf_dir: str, budget_tokens: int = 500_000
) -> DataFrame:
    """C103 (r5): largest-remainder (Hamilton) apportionment of a
    global training-token budget across sources, proportional to each
    source's available tokens — the exact-integer answer to "we can
    afford B tokens this run; how many come from each source?".
    Proportional floats drift and never sum to B; the Hamilton rule
    is pure BIGINT: base_i = floor(B * avail_i / total), then the
    B - sum(base) leftover units go one each to the largest
    remainders (ties broken by source name) — so sum(quota) == B is
    a structural identity (tested), not a rounding hope.

    Plan/scale: one map-side-combinable token-count aggregate over
    documents (the only corpus-scale pass), then all apportionment
    math happens on one row per SOURCE — window rank over dozens of
    rows. ``checked_mul_expr`` guards the B * avail_i product against
    silent BIGINT wraparound at extreme corpus sizes (ADVICE r4).
    """
    from ..functions.exact import checked_mul_expr

    d = load_table(spark, sf_dir, "documents")
    avail = d.groupBy("source").agg(
        F.sum(F.array_size(norm_tokens(F.col("text")))).cast("long").alias("tokens_available")
    )
    tot = avail.agg(F.sum("tokens_available").cast("long").alias("total_tokens"))
    prod = checked_mul_expr(str(budget_tokens), "tokens_available")
    based = avail.join(F.broadcast(tot)).selectExpr(
        "source",
        "tokens_available",
        "total_tokens",
        f"CAST({prod} DIV total_tokens AS BIGINT) AS base_quota",
        f"CAST({prod} % total_tokens AS BIGINT) AS remainder",
    )
    w_rem = Window.orderBy(F.col("remainder").desc(), F.col("source").asc())
    w_all = Window.partitionBy()
    from ..functions.exact import ppm_expr

    return (
        based.withColumn("leftover", F.lit(budget_tokens) - F.sum("base_quota").over(w_all))
        .withColumn("rk", F.row_number().over(w_rem))
        .selectExpr(
            "source",
            "tokens_available",
            "CAST(base_quota + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)"
            " AS quota_tokens",
        )
        .selectExpr(
            "source",
            "tokens_available",
            "quota_tokens",
            f"CAST({ppm_expr('quota_tokens', str(budget_tokens))} AS BIGINT) AS budget_share_ppm",
        )
        .orderBy("source")
    )


def curriculum_plan(
    spark: SparkSession, sf_dir: str, bucket_width_e6: int = 10_000
) -> DataFrame:
    """C106 (r5): quality-curriculum phase plan — the corpus banded
    into 5 quality quintiles (phase 1 = lowest-quality fifth, phase 5
    = highest), with per-phase doc/token mass and mean quality. The
    schedule a curriculum-training loader consumes: stream phases in
    the order the training recipe asks for, with exact counts known
    up front.

    Banding is the exact percentile_disc identity proven on
    customer_rfm (r4): thresholds t_k = the smallest quality value
    whose cumulative count satisfies 5*cum >= k*N, so phase =
    1 + #{k: q >= t_k} — a data value, never an interpolated double,
    identical in both engines. Thresholds come from the two-level
    prefix-sum machinery (no whole-table sort; a 1-row broadcast),
    scoring and the phase rollup are map-side.
    """
    from ..functions import textfns as X
    from ..functions.exact import ppm_expr
    from .relational import r6
    from .relational6 import disc_quintile_thresholds

    t = F.col("text")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.array_size(norm_tokens(t)).cast("long").alias("n_tokens"),
        F.round(r6(X.quality_score(t)) * 1_000_000).cast("long").alias("q_e6"),
    ).localCheckpoint(eager=False)
    th = disc_quintile_thresholds(d, "q_e6", bucket_width_e6, "q")
    q = F.col("q_e6").cast("decimal(28,2)")
    phase = (
        F.when(q >= F.col("q80"), 5)
        .when(q >= F.col("q60"), 4)
        .when(q >= F.col("q40"), 3)
        .when(q >= F.col("q20"), 2)
        .otherwise(1)
    )
    tot = d.agg(F.count(F.lit(1)).alias("n_all"), F.sum("n_tokens").alias("tok_all"))
    return (
        d.join(F.broadcast(th))
        .groupBy(phase.cast("long").alias("phase"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("q_e6").alias("q_sum"),
        )
        .join(F.broadcast(tot))
        .selectExpr(
            "phase",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            "CAST(q_sum DIV n_docs AS BIGINT) AS mean_quality_e6",
            f"CAST({ppm_expr('n_docs', 'n_all')} AS BIGINT) AS doc_share_ppm",
            f"CAST({ppm_expr('n_tokens', 'tok_all')} AS BIGINT) AS token_share_ppm",
        )
        .orderBy("phase")
    )


def curriculum_mixture_plan(
    spark: SparkSession, sf_dir: str, bucket_width_e6: int = 10_000
) -> DataFrame:
    """C150 (r10, VERDICT r9 task 8): the LOADER PLAN a curriculum
    trainer actually consumes — C106's quality-quintile phases
    CROSSED with C-tier's source-mixture policy, one row per
    (phase, source) cell: exact doc/token mass, the cell's doc share
    within its phase, the source's mixture-equalizing sampling
    probability, and the expected post-sampling mass. A training run
    streams phase 1..5 in recipe order, sampling each source at
    `sample_prob` to flatten the domain mix; this table prices that
    schedule up front (which phases are dominated by which sources,
    and what survives the mixture correction).

    Exactness: phase banding is C106's percentile_disc threshold
    identity (a data value, never an interpolated double);
    `sample_prob_ppm` = min(1e6, floor-ppm of target/src_docs) is
    computed as ppm(total, n_sources*src_docs) in pure BIGINT (the
    r6-double `source_mixing_weights.sample_prob` is the human mart;
    this is its exact-integer twin so the composition hashes
    engine-identically), and expected masses are plain BIGINT
    products in doc/token-ppm units — no float anywhere.

    Scale shape: per-doc scoring is map-side; thresholds come from
    the bucketed two-level prefix sums (no whole-table sort, 1-row
    broadcast); the cells table is 5 x sources rows; the mixture is
    one tiny aggregate broadcast back. Raw text never shuffles.
    """
    from ..functions import textfns as X
    from ..functions.exact import ppm_expr
    from .relational import r6
    from .relational6 import disc_quintile_thresholds

    t = F.col("text")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.array_size(norm_tokens(t)).cast("long").alias("n_tokens"),
        F.round(r6(X.quality_score(t)) * 1_000_000).cast("long").alias("q_e6"),
    ).localCheckpoint(eager=False)
    th = disc_quintile_thresholds(d, "q_e6", bucket_width_e6, "q")
    q = F.col("q_e6").cast("decimal(28,2)")
    phase = (
        F.when(q >= F.col("q80"), 5)
        .when(q >= F.col("q60"), 4)
        .when(q >= F.col("q40"), 3)
        .when(q >= F.col("q20"), 2)
        .otherwise(1)
    )
    cells = (
        d.join(F.broadcast(th))
        .groupBy(phase.cast("long").alias("phase"), "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
    )
    phase_tot = cells.groupBy("phase").agg(F.sum("n_docs").alias("phase_docs"))
    src = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("src_docs"))
        .select(
            "source",
            "src_docs",
            F.sum("src_docs").over(Window.partitionBy()).alias("total"),
            F.count(F.lit(1)).over(Window.partitionBy()).alias("n_sources"),
        )
        .selectExpr(
            "source",
            "least(CAST(1000000 AS BIGINT), CAST("
            + ppm_expr("total", "n_sources * src_docs")
            + " AS BIGINT)) AS sample_prob_ppm",
        )
    )
    return (
        cells.join(phase_tot, "phase")
        .join(F.broadcast(src), "source")
        .selectExpr(
            "phase",
            "source",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            f"CAST({ppm_expr('n_docs', 'phase_docs')} AS BIGINT) AS phase_doc_share_ppm",
            "sample_prob_ppm",
            "CAST(n_docs * sample_prob_ppm AS BIGINT) AS exp_docs_ppm",
            "CAST(n_tokens * sample_prob_ppm AS BIGINT) AS exp_tokens_ppm",
        )
        .orderBy("phase", "source")
    )


def span_corruption_plan(
    spark: SparkSession,
    sf_dir: str,
    stride: int = 8,
    span_len: int = 3,
    noise_permille: int = 150,
) -> DataFrame:
    """C107 (r5): T5-style span-corruption PLAN — for every document,
    the deterministic set of masked spans a denoising-pretraining
    pipeline will corrupt, summarized per doc. Spans anchor on a
    fixed token grid (one candidate start every ``stride`` tokens); a
    candidate is selected when md5(doc_id # cell) lands under
    ``noise_permille``, and covers ``span_len`` tokens (complete
    spans only — a tail cell whose span would overrun contributes
    nothing). With span_len <= stride spans can never overlap, so
    masked_tokens = n_spans * span_len exactly.

    The point of a PLAN (vs corrupting in place): the selection is a
    pure function of (doc_id, grid cell), so the loader, a later
    engine, or a replay can re-derive the identical corruption
    without shipping the mask — the same md5-seeded determinism the
    split/fold family uses. One explode pass over grid cells
    (O(tokens/stride) rows), map-side aggregate, no joins.
    """
    from ..functions.exact import ppm_expr

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_size(norm_tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    n_cells = (F.floor((F.col("n_tokens") - span_len) / stride) + 1).cast("long")
    # Spark sequence(0, -1) DESCENDS rather than returning empty —
    # short docs (no room for one complete span) must be filtered
    # before the explode, and rejoin with n_spans = 0 via the left join
    cells = (
        d.withColumn("n_cells", n_cells)
        .filter(F.col("n_cells") > 0)
        .select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(0), (F.col("n_cells") - 1).cast("int"))).alias("cell"),
        )
    )
    picked = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit("#span"), F.col("cell").cast("string")
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 1000
        < noise_permille
    )
    per_doc = cells.groupBy("doc_id", "n_tokens").agg(
        F.sum(picked.cast("long")).alias("n_spans")
    )
    return (
        d.join(per_doc.select("doc_id", "n_spans"), "doc_id", "left")
        .selectExpr(
            "doc_id",
            "n_tokens",
            "CAST(coalesce(n_spans, 0) AS BIGINT) AS n_spans",
            f"CAST(coalesce(n_spans, 0) * {span_len} AS BIGINT) AS masked_tokens",
        )
        .selectExpr(
            "doc_id",
            "n_tokens",
            "n_spans",
            "masked_tokens",
            f"CAST(CASE WHEN n_tokens = 0 THEN 0 ELSE {ppm_expr('masked_tokens', 'n_tokens')} END AS BIGINT)"
            " AS mask_ratio_ppm",
        )
        .orderBy("doc_id")
    )


def bloom_fpr_audit(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    benchmark_mod: int = 100,
    m_bits: int = 1 << 18,
    k_hashes: int = 4,
) -> DataFrame:
    """C111 (r5): measured vs theoretical false-positive rate of the
    Bloom decontaminator — the calibration audit that tells you what
    ``decontaminate_bloom``'s over-removal actually COSTS before you
    size m_bits for a 100 TB run (too small a filter silently deletes
    good training data; the sibling of minhash_calibration for the
    membership sketch).

    Ground truth: training n-grams that provably do NOT occur in the
    benchmark set (exact anti-join). Measured FPR = share of those
    clean grams the filter still flags, in exact ppm. Theoretical
    FPR = (bits_set / m)^k — the standard approximation, assembled
    as an identical double expression on both engines from the exact
    bits_set integer and floored to ppm.

    Plan/scale: the same distributed bitset build as
    decontaminate_bloom (positions -> distinct -> packed words, one
    ~34 KB collect re-shipped as a one-row broadcast); the probe side
    streams map-side through the broadcast words — no join, no
    shuffle beyond the distinct-gram aggregates. bits_set is the
    popcount of the packed words (== the distinct position count).
    """
    from ..functions.exact import ppm_expr as _ppm
    from .dedup import shingles_from

    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", norm_tokens(F.col("text")))
        .select("doc_id", F.array_distinct(shingles_from(F.col("_toks"), n)).alias("sh"))
    )

    def pos(gram_col, i: int):
        return (
            F.conv(F.substring(F.md5(F.concat(gram_col, F.lit(f"#{i}"))), 1, 8), 16, 10)
            .cast("long")
            % m_bits
        )

    bench = (
        d.filter(F.col("doc_id") % benchmark_mod == 0)
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    positions = bench.select(
        F.explode(F.array(*[pos(F.col("gram"), i) for i in range(k_hashes)])).alias("p")
    ).distinct()
    words = (
        positions.groupBy((F.col("p") / 62).cast("int").alias("w"))
        .agg(F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 62) AS INT))")).alias("bits"))
        .collect()
    )
    n_words = (m_bits + 61) // 62
    dense = [0] * n_words
    for r in words:
        dense[r["w"]] = r["bits"]
    bits_set = sum(bin(b).count("1") for b in dense)
    bits_df = spark.createDataFrame(
        [(dense, [1 << j for j in range(62)])], "_bloom array<long>, _pow2 array<long>"
    )

    def might_contain(gram_col):
        checks = []
        for i in range(k_hashes):
            p = pos(gram_col, i)
            word = F.element_at(F.col("_bloom"), (p / 62).cast("int") + 1)
            mask = F.element_at(F.col("_pow2"), (p % 62).cast("int") + 1)
            checks.append(word.bitwiseAND(mask) != 0)
        out = checks[0]
        for c in checks[1:]:
            out = out & c
        return out

    clean = (
        d.filter(F.col("doc_id") % benchmark_mod != 0)
        .select(F.explode("sh").alias("gram"))
        .distinct()
        .join(bench, "gram", "left_anti")
    )
    n_bench = bench.agg(F.count(F.lit(1)).alias("n_bench_grams"))
    probe = clean.crossJoin(F.broadcast(bits_df)).select(
        F.when(might_contain(F.col("gram")), 1).otherwise(0).alias("fp")
    )
    # fill ratio and its k-th power as ONE double expression from the
    # exact bits_set integer — identical tree in the oracle
    ratio = f"(CAST({bits_set} AS DOUBLE) / CAST({m_bits} AS DOUBLE))"
    theo = " * ".join([ratio] * k_hashes)
    return (
        probe.agg(
            F.count(F.lit(1)).alias("n_clean_probes"),
            F.sum("fp").alias("n_false_pos"),
        )
        .join(F.broadcast(n_bench))
        .selectExpr(
            f"CAST({m_bits} AS BIGINT) AS m_bits",
            f"CAST({k_hashes} AS BIGINT) AS k_hashes",
            "CAST(n_bench_grams AS BIGINT) AS n_bench_grams",
            f"CAST({bits_set} AS BIGINT) AS n_bits_set",
            "CAST(n_clean_probes AS BIGINT) AS n_clean_probes",
            "CAST(n_false_pos AS BIGINT) AS n_false_pos",
            f"CAST({_ppm('n_false_pos', 'n_clean_probes')} AS BIGINT) AS measured_fpr_ppm",
            f"CAST(floor({theo} * 1000000) AS BIGINT) AS theoretical_fpr_ppm",
        )
    )


def epoch_shuffle_plan(
    spark: SparkSession,
    sf_dir: str,
    n_epochs: int = 3,
    shard_tokens: int = 512,
) -> DataFrame:
    """C127 (r5): deterministic per-epoch shard shuffle plan — the
    order a trainer visits the `plan_token_shards` shards in each
    epoch. Epoch order must differ per epoch (repeat order turns
    multi-epoch training into memorization-friendly curriculum) yet
    be fully reproducible for resume/audit, so position = rank of
    md5(epoch:shard) per epoch — the same engine-invariant no-RNG
    discipline as holdout_split. Cumulative tokens ride along so a
    resume-from-step maps straight to (epoch, position).

    Plan/scale: the corpus-scale work is plan_token_shards (one
    tokenize scan, two-level prefix sums); everything here runs at
    SHARD x EPOCH grain — shards are corpus_tokens/shard_tokens rows,
    the epoch fanout is a bounded explode, and the per-epoch rank
    window partitions on epoch over shard-grain rows.
    """
    shards = (
        plan_token_shards(spark, sf_dir, shard_tokens=shard_tokens)
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tokens"),
        )
    )
    epochs = shards.crossJoin(
        spark.range(1, n_epochs + 1).select(F.col("id").alias("epoch"))
    )
    h = F.md5(
        F.concat(
            F.col("epoch").cast("string"), F.lit(":"), F.col("shard_id").cast("string")
        )
    )
    w = Window.partitionBy("epoch").orderBy("h", "shard_id")
    wc = (
        Window.partitionBy("epoch")
        .orderBy("h", "shard_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        epochs.withColumn("h", h)
        .select(
            F.col("epoch").cast("long").alias("epoch"),
            F.row_number().over(w).cast("long").alias("pos"),
            F.col("shard_id").cast("long").alias("shard_id"),
            "n_docs",
            "tokens",
            F.sum("tokens").over(wc).cast("long").alias("cum_tokens"),
        )
        .orderBy("epoch", "pos")
    )
