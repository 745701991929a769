"""Fourth batch of corpus-analysis operators over ``documents``:
vocabulary richness (type-token), robust length outliers, and
integer-exact weighted sampling.

All three are pure Column/aggregate plans — no Python in the hot
path; the sampling decision and the outlier thresholds are built
from integer or exactly-representable arithmetic so both engines
make bit-identical keep/flag decisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import norm_tokens, quality_score, whitespace_token_count
from ..sources.registry import load_table
from .relational import r6


def ttr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary richness: type-token ratio and hapax
    share. A falling TTR on a growing corpus slice is the classic
    signal of templated/duplicated ingestion; hapax share tracks
    long-tail vocabulary (Heaps-law regime).

    Shape: explode tokens -> (source, token) counts (map-side
    combinable; the heavy shuffle key is the token, naturally
    high-cardinality so no skew) -> per-source fold. Per-source doc
    counts join in from a 2-column scan, broadcast (source count is
    tiny by construction).
    """
    d = load_table(spark, sf_dir, "documents")
    tok_counts = (
        d.select("source", F.explode(norm_tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    per_source = tok_counts.groupBy("source").agg(
        F.sum("cnt").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    n_docs = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return per_source.join(F.broadcast(n_docs), "source").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        r6(F.col("n_types") / F.col("n_tokens")).alias("ttr"),
        F.col("n_hapax").cast("long").alias("n_hapax"),
        r6(F.col("n_hapax") / F.col("n_types")).alias("hapax_share"),
    )


def length_outliers(
    spark: SparkSession, sf_dir: str, k: float = 3.0, approx: bool = False
) -> DataFrame:
    """Per-source robust length outliers: |n_tokens - median| >
    k * MAD (median absolute deviation). Median/MAD instead of
    mean/stddev so a few megadocs can't mask each other — the robust
    estimator is the whole point for corpus QA.

    Token counts are integers, so median and MAD land on exact .0/.5
    doubles — the flag decision is engine-invariant without rounding
    tricks. ``approx=True`` switches both percentile passes to
    ``percentile_approx`` for the 100 TB path (exact per-group
    percentiles funnel each source's values through one reducer);
    the exact path is what the oracle matches at test SF.

    Shape: two aggregates on source (tiny group count) with broadcast
    joins back; one documents scan feeds both via the projected
    (doc_id, source, n_toks) frame.
    """
    pct = (
        (lambda c: F.percentile_approx(c, 0.5))
        if approx
        else (lambda c: F.percentile(c, F.lit(0.5)))
    )
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", whitespace_token_count(F.col("text")).alias("n_toks")
    )
    med = d.groupBy("source").agg(pct(F.col("n_toks")).alias("src_median"))
    with_med = d.join(F.broadcast(med), "source")
    mad = with_med.groupBy("source").agg(
        pct(F.abs(F.col("n_toks") - F.col("src_median"))).alias("src_mad")
    )
    return (
        with_med.join(F.broadcast(mad), "source")
        .filter(F.abs(F.col("n_toks") - F.col("src_median")) > k * F.col("src_mad"))
        .select(
            "doc_id",
            "source",
            F.col("n_toks").cast("long").alias("n_toks"),
            r6(F.col("src_median")).alias("src_median"),
            r6(F.col("src_mad")).alias("src_mad"),
        )
    )


def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted Bernoulli thinning: keep each document with
    probability quality_score / 2 — higher-quality documents survive
    downsampling proportionally (the standard corpus-mixing move:
    thin low-quality sources without a hard cutoff).

    Determinism: the uniform draw is the md5 of the doc id (seeded
    stream '#ws'), reduced mod 1e6; the threshold is the 6dp-rounded
    quality score frozen to integer micro-units. The keep decision
    ``2*u < q_micro`` is pure BIGINT comparison — no float boundary
    can flip between engines. One scan, no shuffle (the decision is
    per-row); at 100 TB this is a map-only pass.
    """
    d = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#ws"))), 1, 15), 16, 10)
        .cast("long")
        % 1_000_000
    )
    q6 = F.round(quality_score(F.col("text")), 6)
    q_micro = F.round(q6 * 1_000_000, 0).cast("long")
    return (
        d.select(
            "doc_id",
            "source",
            q6.alias("quality"),
            u.alias("sample_u"),
            q_micro.alias("q_micro"),
        )
        .filter(F.lit(2) * F.col("sample_u") < F.col("q_micro"))
        .select("doc_id", "source", "quality", F.col("sample_u").cast("long").alias("sample_u"))
    )


def token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution for packing/chunking diagnostics:
    log2-width buckets (1-2, 2-4, ... tokens) with counts and token
    mass per bucket — the histogram that decides chunk size and pack
    budget before a training run. floor(log2) via bit length keeps
    the bucketing integer-exact (no float log at the boundary:
    2^k lands in bucket k on both engines by construction).

    One narrow aggregate; map-side combinable; output is O(log max).
    """
    d = load_table(spark, sf_dir, "documents").select(
        whitespace_token_count(F.col("text")).alias("n")
    )
    # log2 of an exact power of two is exact in IEEE double, so
    # floor(log2(n)) cannot straddle a bucket boundary — the integer
    # bucketing is deterministic on both engines.
    bucket = F.floor(F.log2(F.col("n").cast("double"))).cast("long")
    h = (
        d.filter(F.col("n") >= 1)
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n").alias("n_tokens"),
            F.min("n").alias("min_len"),
            F.max("n").alias("max_len"),
        )
    )
    return h.select(
        "bucket",
        (F.lit(2).cast("long") ** F.col("bucket")).cast("long").alias("bucket_lo"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("min_len").cast("long").alias("min_len"),
        F.col("max_len").cast("long").alias("max_len"),
    )


def winnow_overlap_pairs(
    spark: SparkSession, sf_dir: str, min_shared: int = 2, df_cap: int = 200
) -> DataFrame:
    """Local-overlap pairs via winnowing fingerprints — the
    plagiarism-detector primitive: two documents sharing >=
    ``min_shared`` selected 8-token shingle fingerprints contain a
    copied PASSAGE, even when the rest of the text differs (shingle
    Jaccard would dilute a one-paragraph copy below any global
    threshold).

    Scale story vs the n-gram inverted index: winnowing keeps every
    4th shingle position, so the posting list is ~25% the size of
    the full shingle index for the same detection window, and the
    same df-cap skew guard drops boilerplate fingerprints before the
    self-join. Distinct fingerprints per doc (array_distinct) keep
    the pair counter a set-intersection size.
    """
    from ..functions.textfns import rolling_hash_fingerprints

    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(rolling_hash_fingerprints(F.col("text")))
            ).alias("fp"),
        )
    )
    from pyspark.sql import Window

    wfp = Window.partitionBy("fp")
    capped = (
        d.withColumn("_df", F.count(F.lit(1)).over(wfp))
        .filter(F.col("_df") <= df_cap)
        .drop("_df")
    )
    pairs = (
        capped.alias("a")
        .join(capped.alias("b"), "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= min_shared)
    )
    return pairs


def source_drift_kl(spark: SparkSession, sf_dir: str, n_buckets: int = 4096) -> DataFrame:
    """Distribution-drift monitor: per-source KL divergence of the
    hashed-unigram distribution against the whole corpus — the alarm
    a data-ops pipeline watches when a crawler or upstream feed
    starts emitting different text than it used to (truncated to the
    source's observed buckets, Laplace-smoothed on both sides).

    Exactness: each bucket's contribution p_s·ln(p_s/p_c) is frozen
    to an integer NANO-nat (both engines compute it from identical
    exact count ratios), so the per-source sum is an exact BIGINT —
    distributed float-summation order cannot move the result.

    Shape: one (source,bucket) count shuffle; the corpus bucket
    table (<= n_buckets rows) and per-source totals broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    occ = d.select(
        "source", F.explode(norm_tokens(F.col("text"))).alias("tok")
    ).select(
        "source",
        (F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long") % n_buckets).alias(
            "bucket"
        ),
    )
    csb = occ.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    tot_s = csb.groupBy("source").agg(F.sum("cnt").alias("tot_s"))
    cb = csb.groupBy("bucket").agg(F.sum("cnt").alias("cnt_c"))
    tot_c = cb.agg(F.sum("cnt_c").alias("tot_c"))

    j = (
        csb.join(F.broadcast(tot_s), "source")
        .join(F.broadcast(cb), "bucket")
        .join(F.broadcast(tot_c))
    )
    p_s = (F.col("cnt") + 1).cast("double") / (F.col("tot_s") + n_buckets).cast("double")
    p_c = (F.col("cnt_c") + 1).cast("double") / (F.col("tot_c") + n_buckets).cast("double")
    contrib = F.round(F.lit(1e9) * p_s * F.log(p_s / p_c)).cast("long")
    return (
        j.select("source", "tot_s", contrib.alias("c_nano"))
        .groupBy("source")
        .agg(
            F.first("tot_s").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_buckets_used"),
            F.sum("c_nano").cast("long").alias("kl_nano"),
        )
        .withColumn("kl", F.round(F.col("kl_nano") / F.lit(1e9), 6))
    )


def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-efficiency mart: BPE-ish subword tokens per
    whitespace word, per source — the fertility number that decides
    how much compute a corpus slice really costs (fertility 2.0 means
    a nominal 1T-token budget is 500B words of text). Integer token
    counts sum exactly; the single divide per source runs on
    identical BIGINTs in both engines.

    One scan, two regex token counters per row, one tiny aggregate.
    """
    from ..functions.textfns import bpe_ish_token_count

    d = load_table(spark, sf_dir, "documents").select(
        "source",
        whitespace_token_count(F.col("text")).alias("n_words"),
        bpe_ish_token_count(F.col("text")).alias("n_subwords"),
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("n_words"),
        F.sum("n_subwords").cast("long").alias("n_subwords"),
        r6(F.sum("n_subwords").cast("double") / F.sum("n_words").cast("double")).alias(
            "fertility"
        ),
    )


def cross_split_leakage(
    spark: SparkSession, sf_dir: str, window: int = 6
) -> DataFrame:
    """Eval-hygiene check: paragraph-window hashes shared between the
    train split and each holdout split — if a val/test document's
    block also appears in train, the eval leaks and its metric is
    inflated. Composes the deterministic holdout split with the
    paragraph-hash scheme; the verdict is per holdout doc: how many
    of its blocks exist in train. (Default window 6 tokens: the
    synthetic corpus averages ~50-token docs, so production-size
    16-token paragraphs never collide — scale the window with real
    document length.)

    Scale shape: (hash, split) postings shuffle 32-hex keys; train
    block hashes semi-join the holdout postings on the hash (no text
    moves, no self-join). Report rows are only the leaking docs.
    """
    from ..operators.dedup import tokens
    from ..operators.scale import holdout_split

    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", tokens())
    )
    starts = F.sequence(F.lit(1), F.greatest(F.array_size("_toks"), F.lit(1)), F.lit(window))
    blocks = d.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.md5(F.array_join(F.slice("_toks", i, window), " ").cast("binary")),
            )
        ).alias("h"),
    )
    split = holdout_split(spark, sf_dir).select("doc_id", "split")
    tagged = blocks.join(split, "doc_id")
    train_hashes = tagged.filter(F.col("split") == "train").select("h").distinct()
    holdout = tagged.filter(F.col("split") != "train")
    return (
        holdout.join(train_hashes, "h", "left_semi")
        .groupBy("doc_id", "split")
        .agg(F.count(F.lit(1)).cast("long").alias("n_leaked_windows"))
    )


def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf coverage mart: for each frequency floor t, how many token
    TYPES have count >= t and what share of total token MASS they
    cover — the table that decides a vocabulary cutoff ("types with
    count >= 5 are 4% of the vocabulary but 87% of the corpus").

    No global sort: the floors are fixed, so coverage is a handful of
    conditional sums over the (token, count) aggregate — map-side
    combinable end to end, unlike a rank-based coverage curve which
    would need a total order over the vocabulary.
    """
    floors = (1, 2, 5, 10, 50)
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(norm_tokens(F.col("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = counts.agg(
        F.sum("cnt").alias("total_mass"),
        *[
            F.sum(F.when(F.col("cnt") >= t, 1).otherwise(0)).alias(f"types_{t}")
            for t in floors
        ],
        *[
            F.sum(F.when(F.col("cnt") >= t, F.col("cnt")).otherwise(0)).alias(f"mass_{t}")
            for t in floors
        ],
    )
    stack = ", ".join(f"'{t}', types_{t}, mass_{t}" for t in floors)
    return agg.selectExpr(
        f"stack({len(floors)}, {stack}) AS (floor, n_types, mass)", "total_mass"
    ).select(
        F.col("floor").cast("long").alias("frequency_floor"),
        F.col("n_types").cast("long").alias("n_types"),
        F.col("mass").cast("long").alias("mass"),
        F.round(F.col("mass").cast("double") / F.col("total_mass").cast("double"), 6).alias(
            "mass_share"
        ),
    )


def modality_qa_join(spark: SparkSession, sf_dir: str, k: float = 3.0) -> DataFrame:
    """Cross-modality QA: join the text-quality gate with the
    embedding spike check on the shared id (vec_id == doc_id in this
    store) and flag documents where EITHER modality looks wrong —
    low-quality text with a healthy vector usually means a scoring
    gap; clean text with a degenerate vector means an embedding-job
    bug. The disagreement set is the actionable part.

    One narrow join on the id; both inputs are the standalone
    operators' projections, so the composite adds no new scan logic.
    """
    from ..functions.textfns import quality_score
    from .vectors2 import embedding_norm_outliers

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.round(quality_score(F.col("text")), 6).alias("quality")
    )
    spikes = embedding_norm_outliers(spark, sf_dir, k=k).select(
        F.col("vec_id").alias("doc_id"), F.lit(True).alias("vector_outlier")
    )
    joined = docs.join(spikes, "doc_id", "left")
    return (
        joined.select(
            "doc_id",
            "source",
            "quality",
            F.coalesce("vector_outlier", F.lit(False)).alias("vector_outlier"),
            (F.col("quality") < 0.8).alias("text_low_quality"),
        )
        .filter(F.col("vector_outlier") | F.col("text_low_quality"))
    )


def char_class_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class distribution per source: alpha / digit /
    whitespace / punctuation shares of all text bytes — the cheapest
    encoding-health check there is (mojibake, binary spill, and
    markup-heavy sources all show up as class-share anomalies before
    any tokenizer runs).

    One scan, four regexp_replace-length counters per row, exact
    integer sums, one divide per share at the end.
    """
    d = load_table(spark, sf_dir, "documents")

    def n_class(pattern):
        return F.length(F.regexp_replace(F.col("text"), pattern, ""))

    total = F.length("text")
    per_doc = d.select(
        "source",
        total.alias("n_chars"),
        (total - n_class(r"[A-Za-z]")).alias("n_alpha"),
        (total - n_class(r"[0-9]")).alias("n_digit"),
        (total - n_class(r"\s")).alias("n_space"),
    )
    agg = per_doc.groupBy("source").agg(
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.sum("n_alpha").cast("long").alias("n_alpha"),
        F.sum("n_digit").cast("long").alias("n_digit"),
        F.sum("n_space").cast("long").alias("n_space"),
    )
    share = lambda c: F.round(  # noqa: E731
        F.col(c).cast("double") / F.col("n_chars").cast("double"), 6
    )
    return agg.select(
        "source",
        "n_chars",
        share("n_alpha").alias("alpha_share"),
        share("n_digit").alias("digit_share"),
        share("n_space").alias("space_share"),
        F.round(
            (F.col("n_chars") - F.col("n_alpha") - F.col("n_digit") - F.col("n_space"))
            .cast("double")
            / F.col("n_chars").cast("double"),
            6,
        ).alias("other_share"),
    )
