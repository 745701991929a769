"""Corpus-analysis operators, sixth wave: token-window co-occurrence
PMI (the word2vec/GloVe co-occurrence statistic) and hashing-trick
feature vectors.

Both stay JVM-side: co-occurrence pairs come from array-shift zips
(no positional self-join, no window shuffle — the pairs of a document
never leave its row until the final count aggregate), and feature
hashing reuses the engine's md5 determinism idiom so the DuckDB
oracle reproduces bucket ids bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import norm_tokens
from ..functions.exact import ppm_expr as _ppm
from ..sources.registry import load_table
from .relational import r6


def term_cooccurrence_pmi(
    spark: SparkSession, sf_dir: str, window: int = 2, min_pairs: int = 5
) -> DataFrame:
    """Directional term co-occurrence PMI within a ``window``-token
    forward window — the association statistic co-occurrence-matrix
    embeddings (GloVe) and collocation detectors start from.

    Pair events (a at i, b at i+d), d in 1..window, are built by
    zipping the token array with its own d-shifted slices — an O(doc
    length * window) per-row array expression, so pair extraction
    adds NO shuffle; the only exchanges are the two count aggregates
    (pairs, unigrams). PMI = log2(p(a,b) / (p(a) p(b))) with unigram
    marginals over all tokens.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(norm_tokens(F.col("text")).alias("t"))
    n = F.array_size(F.col("t"))
    shifted = [
        F.arrays_zip(
            F.slice(F.col("t"), 1, F.greatest(n - dd, F.lit(0))).alias("a"),
            F.slice(F.col("t"), 1 + dd, F.greatest(n - dd, F.lit(0))).alias("b"),
        )
        for dd in range(1, window + 1)
    ]
    pairs = (
        toks.select(F.explode(F.flatten(F.array(*shifted))).alias("p"))
        .select(F.col("p.a").alias("term_a"), F.col("p.b").alias("term_b"))
    )
    pair_counts = (
        pairs.groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_pairs)
    )
    # totals from array sizes — no second explode pass: the d-shift
    # produces exactly max(n-d, 0) pairs per doc by construction
    n = F.array_size(F.col("t"))
    total_pairs = toks.agg(
        F.sum(
            sum(F.greatest(n - dd, F.lit(0)) for dd in range(1, window + 1))
        ).alias("tp")
    )
    uni = (
        toks.select(F.explode(F.col("t")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_term"))
    )
    total_toks = toks.agg(F.sum(n).alias("tt"))
    ua = uni.select(F.col("term").alias("term_a"), F.col("n_term").alias("n_a"))
    ub = uni.select(F.col("term").alias("term_b"), F.col("n_term").alias("n_b"))
    # no broadcast hint on the unigram sides: vocabulary cardinality
    # is unbounded at corpus scale (an 8 GB broadcast ceiling away
    # from failure), and a plain shuffled equi-join on the term key
    # is safe at any size — AQE still broadcasts small vocabularies
    # at runtime via the 64 MB threshold (ADVICE r3)
    return (
        pair_counts.join(ua, "term_a")
        .join(ub, "term_b")
        .crossJoin(F.broadcast(total_pairs))
        .crossJoin(F.broadcast(total_toks))
        .select(
            "term_a",
            "term_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            r6(
                F.log2(
                    (F.col("n_pair") / F.col("tp"))
                    / (
                        (F.col("n_a") / F.col("tt"))
                        * (F.col("n_b") / F.col("tt"))
                    )
                )
            ).alias("pmi"),
        )
    )


def feature_hash_counts(
    spark: SparkSession, sf_dir: str, n_buckets: int = 64
) -> DataFrame:
    """Hashing-trick document features: every token maps to bucket
    md5(term) mod ``n_buckets`` and the per-(doc, bucket) term counts
    are the sparse feature vector — the fixed-width, vocabulary-free
    featurization linear text classifiers train on at corpus scale.

    One explode + one count aggregate; the hash is the engine's md5
    determinism idiom (15 hex chars -> BIGINT), so bucket assignment
    is identical on both engines and across any partitioning. Output
    also carries each bucket's distinct-term count — the collision
    diagnostic that tells you when n_buckets is too small.
    """
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(norm_tokens(F.col("text"))).alias("term")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("term")), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
        % n_buckets
    )
    hashed = tok.withColumn("bucket", bucket)
    feats = hashed.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct("term").alias("n_terms"),
    )
    return feats.select(
        "doc_id",
        F.col("bucket").cast("int").alias("bucket"),
        F.col("tf").cast("long").alias("tf"),
        F.col("n_terms").cast("long").alias("n_terms"),
    )


def bpe_merge_learning(
    spark: SparkSession, sf_dir: str, n_merges: int = 5
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from the corpus —
    classic byte-pair-encoding tokenizer induction (Sennrich et al.
    2016, public paper): repeatedly pick the most frequent adjacent
    symbol pair (weighted by word frequency) and fuse it everywhere.

    The working set is the DISTINCT-word vocabulary with counts, not
    the corpus — after the one corpus-scale word count, every
    iteration is vocabulary-bounded (pair explode + one aggregate +
    a 1-row broadcast argmax), localCheckpointed per round like the
    other iterative families.

    Merge application is declarative and engine-portable: symbol
    strings are double-space joined (' h  e  l  l  o ') so the plain
    left-to-right non-overlapping replace(' a  b ', ' ab ') consumes
    one boundary space per side and leaves the neighbor's boundary
    intact — exactly greedy BPE application, identical in Spark and
    DuckDB. Ties on pair count break (pair_left, pair_right) asc, so
    the learned merge sequence is fully deterministic.
    """
    merges, _vocab = _bpe_learn(spark, sf_dir, n_merges)
    return merges


def _bpe_learn(
    spark: SparkSession, sf_dir: str, n_merges: int
) -> tuple[DataFrame, DataFrame]:
    """Shared BPE learner: returns (merge table, final symbolized
    vocabulary). See bpe_merge_learning for the algorithm contract;
    bpe_tokenize_stats reuses the final vocabulary to APPLY the
    learned tokenizer."""
    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(norm_tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = words.select(
        "word",
        "freq",
        F.concat(
            F.lit(" "), F.array_join(F.split(F.col("word"), ""), "  "), F.lit(" ")
        ).alias("sym"),
    ).localCheckpoint(eager=True)

    out: DataFrame | None = None
    for rank in range(1, n_merges + 1):
        syms = F.split(F.trim(F.col("sym")), "  ")
        n = F.array_size(syms)
        zipped = F.arrays_zip(
            F.slice(syms, 1, F.greatest(n - 1, F.lit(0))).alias("a"),
            F.slice(syms, 2, F.greatest(n - 1, F.lit(0))).alias("b"),
        )
        top = (
            vocab.select("freq", F.explode(zipped).alias("p"))
            .groupBy(F.col("p.a").alias("pair_left"), F.col("p.b").alias("pair_right"))
            .agg(F.sum("freq").alias("pair_freq"))
            .orderBy(F.desc("pair_freq"), "pair_left", "pair_right")
            .limit(1)
            .localCheckpoint(eager=True)
        )
        vocab = (
            vocab.crossJoin(F.broadcast(top))
            .select(
                "word",
                "freq",
                F.replace(
                    F.col("sym"),
                    F.concat(
                        F.lit(" "),
                        F.col("pair_left"),
                        F.lit("  "),
                        F.col("pair_right"),
                        F.lit(" "),
                    ),
                    F.concat(
                        F.lit(" "),
                        F.col("pair_left"),
                        F.col("pair_right"),
                        F.lit(" "),
                    ),
                ).alias("sym"),
            )
            .localCheckpoint(eager=True)
        )
        step = top.select(
            F.lit(rank).cast("int").alias("merge_rank"),
            "pair_left",
            "pair_right",
            F.concat(F.col("pair_left"), F.col("pair_right")).alias("merged"),
            F.col("pair_freq").cast("long").alias("pair_freq"),
        )
        out = step if out is None else out.unionByName(step)
    return out, vocab


def bpe_tokenize_stats(
    spark: SparkSession, sf_dir: str, n_merges: int = 5
) -> DataFrame:
    """APPLY the learned BPE tokenizer (closing the learn->apply->
    measure loop): symbolize every word with the final merge state
    and report per-source token economics — BPE tokens, whitespace
    words, and fertility (BPE tokens per word), the number a
    tokenizer team watches per domain.

    The application is a broadcast-sized join: per-(source, word)
    counts (vocabulary-bounded) join the final symbolized vocabulary;
    token counts per word come from the symbol-string split — the
    corpus is never re-scanned after the two word-count aggregates.
    """
    _merges, vocab = _bpe_learn(spark, sf_dir, n_merges)
    d = load_table(spark, sf_dir, "documents")
    words_src = (
        d.select("source", F.explode(norm_tokens(F.col("text"))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    toks_per_word = F.array_size(F.split(F.trim(F.col("sym")), "  "))
    # shuffled join on the word key — the symbolized vocabulary is
    # corpus-dependent and unbounded, so no explicit broadcast hint
    # (AQE upgrades to broadcast at runtime when it fits; ADVICE r3)
    return (
        words_src.join(vocab.select("word", "sym"), "word")
        .groupBy("source")
        .agg(
            F.sum("freq").cast("long").alias("n_words"),
            F.sum(F.col("freq") * toks_per_word).cast("long").alias("n_bpe_tokens"),
        )
        .select(
            "source",
            "n_words",
            "n_bpe_tokens",
            r6(F.col("n_bpe_tokens") / F.col("n_words")).alias("fertility"),
        )
    )


def lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the n-gram language detector against the
    corpus's gold ``lang`` labels, with per-cell share of the gold
    row — the detector-eval mart that decides whether the heuristic
    is safe to gate on per language.

    One join of two single-scan operators and one bounded aggregate
    (|langs| x |predictions| cells); the per-gold-row share rides a
    broadcast of the gold counts.
    """
    from .text import lang_id

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    pred = lang_id(spark, sf_dir)
    cells = (
        d.join(pred, "doc_id")
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    gold_totals = cells.groupBy("lang").agg(F.sum("n").alias("n_gold"))
    return (
        cells.join(F.broadcast(gold_totals), "lang")
        .select(
            "lang",
            "pred_lang",
            F.col("n").cast("long").alias("n"),
            # integer ppm (VERDICT r3 task 7 — rounded small-int
            # ratios are the engine-version hash-flip class)
            F.expr(_ppm("n", "n_gold")).cast("long").alias("share_of_gold_ppm"),
            (F.col("lang") == F.col("pred_lang")).alias("is_correct"),
        )
    )


def boilerplate_prefix_stats(
    spark: SparkSession, sf_dir: str, prefix_chars: int = 40, top_n: int = 10
) -> DataFrame:
    """C110 (r5): shared-prefix boilerplate detector — web-scale
    corpora are full of documents that START identically (scraper
    banners, license headers, template greetings) without being
    full-document duplicates, which is why suffix/prefix screens run
    alongside MinHash in production dedup stacks. Groups documents by
    the first ``prefix_chars`` characters of the whitespace-collapsed
    lowercased text (the normalization ladder's level-2 form) and
    reports the ``top_n`` largest prefix families.

    Per family: the prefix, documents sharing it, distinct sources it
    spans (cross-source boilerplate is the strongest template
    signal), and the family's corpus share in exact ppm.

    Plan/scale: one map-side substring + one aggregate at prefix
    grain; orderBy+limit plans as TakeOrderedAndProject (per-partition
    partial top-n) so the full prefix table is never sorted. The
    1-row corpus total is broadcast.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    fams = (
        d.select(F.substring(norm, 1, prefix_chars).alias("prefix"), "source")
        .groupBy("prefix")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("source").alias("n_sources"),
        )
    )
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    top = fams.orderBy(F.desc("n_docs"), F.asc("prefix")).limit(top_n)
    w = Window.orderBy(F.desc("n_docs"), F.asc("prefix"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .join(F.broadcast(total))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "prefix",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_sources").cast("long").alias("n_sources"),
            F.expr(_ppm("n_docs", "n_total")).cast("long").alias("share_ppm"),
        )
        .orderBy("rank")
    )


def vocab_growth_curve(
    spark: SparkSession, sf_dir: str, bucket_width: int = 50
) -> DataFrame:
    """C112 (r5): vocabulary growth (Heaps'-law) curve over ingest
    order — how fast the corpus stops contributing NEW vocabulary,
    the saturation readout that tells a data-acquisition pipeline
    when more of the same source stops buying coverage (and the
    curriculum planner how novelty decays).

    Documents are banded into ingest buckets (doc_id DIV width — the
    repo's standing ingest-order proxy); each distinct term is
    attributed to the bucket where it FIRST occurs (min bucket per
    term — one map-side-combinable aggregate, the
    dedup_exact_substrings first-occurrence discipline). Per bucket:
    docs, token occurrences, distinct terms present, terms first seen
    there, the cumulative vocabulary, and the new-term share of the
    bucket's distinct terms in exact ppm.

    Plan/scale: two aggregates at term grain (min-bucket, per-bucket
    distinct) off one explode scan; the cumulative vocabulary uses the
    two-level band/carry prefix-sum (``statistics._banded_cum``) so no
    single task ever sees more than one band of buckets — the bucket
    grain is corpus/bucket_width rows, which is NOT bounded when
    bucket_width stays fixed while the corpus grows 100×. Nothing
    quadratic, nothing collected.
    """
    from .statistics import _banded_cum

    d = load_table(spark, sf_dir, "documents").select(
        F.expr(f"doc_id DIV {bucket_width}").alias("bucket"),
        F.explode(norm_tokens(F.col("text"))).alias("term"),
    )
    per_bucket = d.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct("term").alias("n_bucket_terms"),
    )
    first_seen = (
        d.groupBy("term")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new_terms"))
    )
    docs_per = (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.expr(f"doc_id DIV {bucket_width}").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    joined = (
        per_bucket.join(first_seen, "bucket", "left")
        .join(docs_per, "bucket")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_bucket_terms").cast("long").alias("n_bucket_terms"),
            F.coalesce("n_new_terms", F.lit(0)).cast("long").alias("n_new_terms"),
        )
    )
    return (
        _banded_cum(joined, "bucket", ["n_new_terms"], band_div=64)
        .withColumn("cum_vocab", F.col("cum_n_new_terms"))
        .drop("cum_n_new_terms")
        .withColumn(
            "new_share_ppm",
            F.expr(_ppm("n_new_terms", "n_bucket_terms")).cast("long"),
        )
        .orderBy("bucket")
    )


def simpson_diversity_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C113 (r5): Simpson diversity of the term distribution per
    source — the collision probability lambda = sum c(c-1) / N(N-1)
    (the chance two random tokens are the same type): near 0 = rich
    diverse text, near 1 = degenerate repetition. The corpus-level
    twin of the per-document repetition_filter, and the diversity
    number source-mixing decisions quote.

    Both sums are exact BIGINTs (c(c-1) per term, then one map-side-
    combinable per-source sum — safe to ~3e9 tokens per source, the
    documented BIGINT bound; beyond that the same shape runs on
    DECIMAL(38,0)); lambda is assembled as ONE identical-tree double
    ratio from the exact integers, rounded to 6dp (corr_matrix
    discipline).

    Plan/scale: one explode scan, term-grain then source-grain
    aggregates. The vocabulary, never the corpus, crosses the second
    shuffle.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(norm_tokens(F.col("text"))).alias("term")
    )
    per_term = d.groupBy("source", "term").agg(F.count(F.lit(1)).alias("c"))
    agg = per_term.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_terms"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("coll"),
    )
    lam = F.col("coll").cast("double") / (
        F.col("n_tokens").cast("double") * (F.col("n_tokens").cast("double") - 1.0)
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_terms").cast("long").alias("n_terms"),
        r6(lam).alias("simpson_lambda"),
    ).orderBy("source")


def stopword_mass_by_source(
    spark: SparkSession, sf_dir: str, top_k: int = 20
) -> DataFrame:
    """C114 (r5): share of each source's token mass spent on the
    corpus-global top-``top_k`` terms (the data-driven stopword set)
    — the quality signal that separates natural prose (high stopword
    mass) from keyword-stuffed/templated/code-like text (low), used
    exactly this way in Gopher-style quality rules but computed from
    the corpus itself instead of a frozen English list.

    Per source: token count, tokens hitting the stopword set, the
    mass in exact ppm, and how many of the top-k terms occur in the
    source at all.

    Plan/scale: one explode scan feeds the global term counts (top-k
    via TakeOrdered — no full vocabulary sort) and the per-source
    counts; the k-row set broadcasts into a map-side membership join.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(norm_tokens(F.col("text"))).alias("term")
    )
    top = (
        d.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(top_k)
        .select("term")
    )
    per_source = d.join(F.broadcast(top).withColumn("is_stop", F.lit(1)), "term", "left")
    return (
        per_source.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("is_stop", F.lit(0))).alias("n_stop_tokens"),
            F.count_distinct(F.when(F.col("is_stop") == 1, F.col("term"))).alias(
                "n_stop_terms_present"
            ),
        )
        .selectExpr(
            "source",
            "CAST(n_tokens AS BIGINT) AS n_tokens",
            "CAST(n_stop_tokens AS BIGINT) AS n_stop_tokens",
            f"CAST({_ppm('n_stop_tokens', 'n_tokens')} AS BIGINT) AS stopword_mass_ppm",
            "CAST(n_stop_terms_present AS BIGINT) AS n_stop_terms_present",
        )
        .orderBy("source")
    )


def source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C115 (r5): vocabulary overlap between every source pair —
    Jaccard and overlap coefficient of the distinct-term sets, the
    redundancy map that tells a mixing planner which sources are
    rewordings of the same material (high overlap) vs genuinely
    complementary. The vocabulary-level companion of the document-
    level cross_source_overlap.

    Inverted-index shaped: one distinct (source, term) pass, then a
    term-keyed self-join whose per-term fanout is C(sources_with_
    term, 2) — bounded by the SOURCE count (dozens), never by data
    size, the same reason the supplier wedge join scales. Integer
    ppm end to end.
    """
    from pyspark.sql import functions as _F

    st = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(norm_tokens(F.col("text"))).alias("term"))
        .distinct()
    )
    sizes = st.groupBy("source").agg(F.count(F.lit(1)).alias("n_terms"))
    a = st.select(F.col("source").alias("src_a"), "term")
    b = st.select(F.col("source").alias("src_b"), "term")
    inter = (
        a.join(b, "term")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        inter.join(F.broadcast(sizes.withColumnRenamed("source", "src_a").withColumnRenamed("n_terms", "n_a")), "src_a")
        .join(F.broadcast(sizes.withColumnRenamed("source", "src_b").withColumnRenamed("n_terms", "n_b")), "src_b")
        .selectExpr(
            "src_a",
            "src_b",
            "CAST(n_a AS BIGINT) AS n_terms_a",
            "CAST(n_b AS BIGINT) AS n_terms_b",
            "CAST(n_common AS BIGINT) AS n_common",
            f"CAST({_ppm('n_common', '(n_a + n_b - n_common)')} AS BIGINT) AS jaccard_ppm",
            f"CAST({_ppm('n_common', 'least(n_a, n_b)')} AS BIGINT) AS overlap_ppm",
        )
        .orderBy("src_a", "src_b")
    )


def rake_keyphrases(
    spark: SparkSession,
    sf_dir: str,
    max_phrase_len: int = 3,
    top_k: int = 10,
) -> DataFrame:
    """C128 (r5): RAKE keyphrase extraction (Rose et al. 2010,
    public) per source — candidate phrases are maximal stopword-free
    token runs (capped at ``max_phrase_len``), each scored by the
    corpus-level RAKE word metric sum(deg(w)/freq(w)): deg counts a
    word's co-occurrence mass inside candidate phrases, freq its
    occurrences, so words that live in LONG informative phrases
    outscore words that appear alone. The unsupervised what-is-this-
    feed-about summary a corpus triage dashboard shows per source.

    Exact integers: word scores are ppm(deg, freq) (deg >= freq so
    >= 1e6), a phrase's score is the BIGINT sum over its words —
    identical across occurrences of the same phrase by construction.
    Top-k per source by (score desc, phrase asc) behind a map-side
    `partial_topk` prune.

    Plan/scale: one tokenize scan; the stopword-run split is a
    per-doc window cumsum (the sessionize shape); phrase assembly is
    a bounded collect_list (<= max_phrase_len after the filter);
    word stats are a vocabulary-grain aggregate joined back onto
    phrase members (AQE broadcasts the small side). No all-pairs, no
    driver loop.
    """
    from ..functions.exact import ppm_expr as _ppm_e
    from ..functions.textfns import STOPWORDS_EN, norm_tokens
    from .scale import partial_topk

    d = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.posexplode(norm_tokens(F.col("text"))).alias("pos", "tok")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = d.withColumn(
        "phrase_id",
        F.sum(F.when(F.col("tok").isin(STOPWORDS_EN), 1).otherwise(0)).over(w),
    ).filter(~F.col("tok").isin(STOPWORDS_EN) & (F.col("tok") != ""))
    phrases = (
        marked.groupBy("source", "doc_id", "phrase_id")
        .agg(
            F.sort_array(F.collect_list(F.struct("pos", "tok"))).alias("arr"),
            F.count(F.lit(1)).alias("n_words"),
        )
        .filter(F.col("n_words") <= max_phrase_len)
        .withColumn(
            "phrase", F.array_join(F.expr("transform(arr, x -> x.tok)"), " ")
        )
    )
    members = phrases.select(
        "source",
        "doc_id",
        "phrase_id",
        "phrase",
        "n_words",
        F.explode(F.expr("transform(arr, x -> x.tok)")).alias("w"),
    )
    wstats = members.groupBy("w").agg(
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum("n_words").cast("long").alias("deg"),
    )
    occ = (
        members.join(wstats, "w")
        .groupBy("source", "doc_id", "phrase_id", "phrase")
        .agg(
            F.sum(F.expr(_ppm_e("deg", "freq"))).cast("long").alias("score_e6")
        )
    )
    agg = occ.groupBy("source", "phrase").agg(
        F.count(F.lit(1)).cast("long").alias("n_occ"),
        F.max("score_e6").alias("score_e6"),
    )
    pruned = partial_topk(agg, ["source"], "score_e6", "phrase", top_k)
    wr = Window.partitionBy("source").orderBy(
        F.col("score_e6").desc(), F.col("phrase").asc()
    )
    return (
        pruned.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= top_k)
        .select(
            "source",
            F.col("rk").cast("long").alias("rk"),
            "phrase",
            "n_occ",
            "score_e6",
        )
        .orderBy("source", "rk")
    )


def term_burst_detection(
    spark: SparkSession,
    sf_dir: str,
    top_m: int = 50,
    bucket_width: int = 50,
    factor_e6: int = 2_000_000,
    min_prior: int = 3,
) -> DataFrame:
    """C134 (r5): term burst detection (Kleinberg-burst-lite) — for
    the corpus's ``top_m`` terms, flag ingest-order buckets where the
    term's count jumps past ``factor_e6``/1e6 times its trailing
    mean: the trending-topics / event-detection readout a feed
    monitor runs (doc_id buckets stand in for arrival time, the
    quality_temporal_drift convention — swap in a date column behind
    the same contract when the corpus has one).

    Exact integer rule: with cum counts per (term, bucket), the
    trailing mean over the b prior buckets is (cum_before / b), and
    the burst test  count * b * 1e6 > factor_e6 * cum_before  is
    pure BIGINT cross-multiplication — no division, no float, no
    tie ambiguity. Buckets with fewer than ``min_prior`` prior
    occurrences can't fire (cold-start guard).

    Output: the 20 most-bursty (term, bucket) rows (ratio desc — the
    monitoring triage queue, non-empty and auditable even on a
    stationary corpus) with a ``bursting`` flag against the
    threshold and the exact integers the rule fires on.

    Plan/scale: one tokenize scan to (term, bucket) grain; the top-m
    gate is a broadcast semi-join (m rows); the trailing window runs
    per term over ~n_buckets rows. Vocabulary never explodes: only
    top-m terms pass the gate.
    """
    from ..functions.exact import ppm_expr as _ppm
    from ..functions.textfns import norm_tokens

    d = load_table(spark, sf_dir, "documents").select(
        F.expr(f"doc_id div {bucket_width}").alias("bucket"),
        F.explode(norm_tokens(F.col("text"))).alias("term"),
    ).filter(F.col("term") != "")
    totals = d.groupBy("term").agg(F.count(F.lit(1)).alias("total"))
    # orderBy+limit plans as TakeOrderedAndProject — a distributed
    # partial top-m per partition (the vocab_stats idiom), never a
    # single-partition rank window over the full vocabulary
    top = (
        totals.orderBy(F.col("total").desc(), F.col("term").asc())
        .limit(top_m)
        .select("term")
    )
    counts = (
        d.join(F.broadcast(top), "term")
        .groupBy("term", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wprev = (
        Window.partitionBy("term")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = counts.select(
        "term",
        "bucket",
        F.col("c").cast("long").alias("c"),
        F.coalesce(F.sum("c").over(wprev), F.lit(0)).cast("long").alias("cum_before"),
        F.coalesce(F.count("c").over(wprev), F.lit(0)).cast("long").alias("n_prior"),
    )
    eligible = scored.filter(F.col("n_prior") >= min_prior).selectExpr(
        "term",
        "CAST(bucket AS BIGINT) AS bucket",
        "c AS n_count",
        "n_prior",
        "cum_before",
        f"CAST({_ppm('c * n_prior', 'cum_before')} AS BIGINT) AS burst_ppm",
        f"(c * n_prior * 1000000 > CAST({factor_e6} AS BIGINT) * cum_before)"
        " AS bursting",
    )
    wr = Window.orderBy(
        F.col("burst_ppm").desc(), F.col("term").asc(), F.col("bucket").asc()
    )
    # same TakeOrdered discipline for the triage top-20: limit first
    # (distributed partial top-k), rank only the 20 survivors
    return (
        eligible.orderBy(
            F.col("burst_ppm").desc(), F.col("term").asc(), F.col("bucket").asc()
        )
        .limit(20)
        .withColumn("rk", F.row_number().over(wr))
        .select(
            F.col("rk").cast("long").alias("rk"),
            "term",
            "bucket",
            "n_count",
            "n_prior",
            "cum_before",
            "burst_ppm",
            "bursting",
        )
        .orderBy("rk")
    )


def memorization_risk_ngrams(
    spark: SparkSession, sf_dir: str, k: int = 8
) -> DataFrame:
    """C138 (r6): memorization-risk audit — per source, how much of
    its text consists of ``k``-token windows that appear MORE THAN
    ONCE in the corpus. Repetition is the single strongest predictor
    of verbatim memorization in a trained model (the reason exact-
    substring dedup exists), so this is the per-source risk readout a
    training-data review quotes: a source whose windows are 30%
    repeated is feeding the model the same strings over and over,
    whether or not whole documents ever matched a dedup detector.

    Per source: total k-token windows, windows whose k-gram occurs
    >= 2 times corpus-wide (counted with multiplicity — every copy
    contributes risk), distinct k-grams, k-grams unique to one
    occurrence, and the repeated share in exact ppm.

    Plan/scale: windows become md5 fingerprints inside the row
    (shingles_from slice discipline — tokens materialize once), so
    the two shuffles move 32-hex hashes at window then gram grain,
    never text. The corpus-wide count joins back to the (source,
    gram) grain — vocabulary-sized, not corpus-sized — and the
    repeated-set membership is a group-level comparison, no doc
    join.
    """
    from .dedup import shingles_from, tokens as _dtokens

    d = load_table(spark, sf_dir, "documents")
    grams = (
        d.withColumn("_t", _dtokens())
        .select(
            "source",
            F.explode(
                F.transform(
                    shingles_from(F.col("_t"), k),
                    lambda s: F.md5(s.cast("binary")),
                )
            ).alias("gh"),
        )
    )
    per_sg = grams.groupBy("source", "gh").agg(F.count(F.lit(1)).alias("c"))
    global_c = per_sg.groupBy("gh").agg(F.sum("c").alias("gc"))
    joined = per_sg.join(global_c, "gh")
    return (
        joined.groupBy("source")
        .agg(
            F.sum("c").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("gc") >= 2, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_repeated_windows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_grams"),
            F.sum(F.when(F.col("gc") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique_grams"),
        )
        .selectExpr(
            "source",
            "n_windows",
            "n_repeated_windows",
            "n_distinct_grams",
            "n_unique_grams",
            f"CAST({_ppm('n_repeated_windows', 'n_windows')} AS BIGINT)"
            " AS repeated_ppm",
        )
        .orderBy("source")
    )


def ngram_kneser_ney_counts(
    spark: SparkSession, sf_dir: str, top_k: int = 30
) -> DataFrame:
    """C141 (r6): Kneser-Ney smoothing ingredients from the corpus —
    the counts the best classical n-gram language model (Kneser & Ney
    1995; Chen & Goodman 1999, public papers) is built from, and the
    reason a plain unigram backoff misreads words like "francisco"
    (frequent, but only ever after "san"): per word, the CONTINUATION
    count N1+(.w) = distinct left contexts, the fanout N1+(w.) =
    distinct right contexts, and the continuation probability
    N1+(.w) / |distinct bigrams| in exact ppm. The absolute-discount
    estimate D = n1/(n1 + 2*n2) (bigrams seen once/twice) rides along
    in exact e6 — the full KN recipe's parameters, measured in one
    pass. NULL discount when no bigram occurs fewer than three times
    (n1 = n2 = 0 — true of this corpus at sf0.1, where the templated
    text repeats everything).

    Plan/scale: bigrams come from the in-row array-shift zip (the
    term_cooccurrence_pmi discipline — no positional self-join), so
    the shuffles are the bigram-grain count and two vocabulary-grain
    distinct-context rollups; the top-k gate is orderBy().limit
    (TakeOrderedAndProject), never a full-vocabulary window.
    """
    d = load_table(spark, sf_dir, "documents").select(
        norm_tokens(F.col("text")).alias("t")
    )
    n = F.array_size("t")
    bi = (
        d.select(
            F.explode(
                F.arrays_zip(
                    F.slice("t", 1, F.greatest(n - 1, F.lit(0))).alias("a"),
                    F.slice("t", 2, F.greatest(n - 1, F.lit(0))).alias("b"),
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter((F.col("a") != "") & (F.col("b") != ""))
    )
    bc = bi.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c"))
    # bigram-grain rollups: distinct contexts = row counts at bigram
    # grain (each (a,b) appears once in bc)
    left = bc.groupBy(F.col("b").alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("n_left_ctx")
    )
    right = bc.groupBy(F.col("a").alias("word")).agg(
        F.count(F.lit(1)).cast("long").alias("n_right_ctx")
    )
    glob = bc.agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n1"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0)).cast("long").alias("n2"),
    )
    uni = (
        d.select(F.explode("t").alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    top = uni.orderBy(F.col("freq").desc(), F.col("word").asc()).limit(top_k)
    from ..functions.exact import ppm_expr as _ppm_e

    return (
        top.join(left, "word", "left")
        .join(right, "word", "left")
        .crossJoin(F.broadcast(glob))
        .selectExpr(
            "word",
            "freq",
            "CAST(coalesce(n_left_ctx, 0) AS BIGINT) AS n_left_ctx",
            "CAST(coalesce(n_right_ctx, 0) AS BIGINT) AS n_right_ctx",
            f"CAST({_ppm_e('coalesce(n_left_ctx, 0)', 'n_bigrams')} AS BIGINT)"
            " AS cont_prob_ppm",
            "CASE WHEN n1 + 2 * n2 > 0 THEN CAST(n1 * 1000000 DIV (n1 + 2 * n2) AS BIGINT)"
            " END AS discount_e6",
        )
        .orderBy(F.col("freq").desc(), F.col("word").asc())
    )
