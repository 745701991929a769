"""Second batch of LLM-training-data operators over ``documents``:
PII scrubbing, vocabulary statistics, source mixture weighting, and
the corpus dedup-rate mart. All pure Column expressions — JVM-side,
whole-stage codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import norm_tokens
from ..sources.registry import load_table
from .relational import r6

# PII patterns shared verbatim with the DuckDB oracle — both engines
# (Java regex / RE2) treat these identically: ASCII classes, \b word
# boundaries, no lookaround.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def with_synthetic_pii(d: DataFrame) -> DataFrame:
    """Deterministically inject PII fragments into the synthetic
    corpus (it contains none of its own) so the scrubber has real
    work; the oracle injects the identical fragments."""
    k = F.col("doc_id")
    email = F.when(
        k % 3 == 0, F.concat(F.lit(" contact user"), k.cast("string"), F.lit("@example.com"))
    ).otherwise(F.lit(""))
    phone = F.when(k % 5 == 0, F.lit(" call 555-123-4567")).otherwise(F.lit(""))
    ip = F.when(
        k % 7 == 0,
        F.concat(F.lit(" host 192.168."), (k % 256).cast("string"), F.lit(".1")),
    ).otherwise(F.lit(""))
    return d.withColumn("text", F.concat(F.col("text"), email, phone, ip))


def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction pass: count and mask emails, phone
    numbers, and IPv4 addresses in one projection (three regex
    evaluations per row, single scan — the standard pre-training
    scrub). Returns counts plus an md5 of the redacted text so the
    full redaction is verified without shipping the corpus."""
    d = with_synthetic_pii(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IPV4_RE,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.md5(redacted.cast("binary")).alias("redacted_hash"),
    )


def vocab_stats(spark: SparkSession, sf_dir: str, top_k: int = 20) -> DataFrame:
    """Global vocabulary mart: top-k tokens by corpus frequency with
    document frequency. Explode + one map-side-combinable groupBy +
    a top-k window over the (tiny) distinct-token aggregate — the
    fact scan never sorts."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(norm_tokens(F.col("text"))).alias("token"))
    counts = tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct("doc_id").alias("doc_freq"),
    )
    # orderBy+limit plans as TakeOrderedAndProject — a distributed
    # partial top-k per partition, never a single-partition sort of
    # the full vocabulary (which at 100 TB is itself huge); only the
    # k survivors see the rank window
    top = counts.orderBy(F.col("n_occurrences").desc(), F.col("token").asc()).limit(top_k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "token",
        "n_occurrences",
        "doc_freq",
    )


def source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture weighting: per-source document share and the
    up/down-sampling weight that would equalize the mixture (the
    knob a training-data pipeline turns to hit a target domain mix).
    One groupBy; the per-source aggregate is tiny so the total rides
    along in a single-partition window."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy()
    total = F.sum("n_docs").over(w)
    n_sources = F.count(F.lit(1)).over(w)
    target = total / n_sources
    return per_source.select(
        "source",
        "n_docs",
        r6(F.col("n_docs") / total).alias("share"),
        r6(target / F.col("n_docs")).alias("weight"),
        r6(F.least(F.lit(1.0), target / F.col("n_docs"))).alias("sample_prob"),
    )


def dedup_rate_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus dedup-rate mart: per source, how much of the corpus is
    exact-duplicate content (normalized-text hash). The groupBy
    shuffles 32-hex hashes, never documents."""
    from .dedup import normalized_text

    d = load_table(spark, sf_dir, "documents").select(
        "source", F.md5(normalized_text().cast("binary")).alias("h")
    )
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("h").alias("n_unique"),
        r6(F.lit(1.0) - F.count_distinct("h") / F.count(F.lit(1))).alias("dup_rate"),
    )


def dsir_importance_weights(
    spark: SparkSession, sf_dir: str, n_buckets: int = 4096, target_lang: str = "en"
) -> DataFrame:
    """DSIR-style data-selection scores (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    each document by the log-likelihood ratio of its hashed-unigram
    features under the target distribution (here: the ``target_lang``
    slice) vs the raw corpus distribution. High scores = looks like
    target data; downstream pipelines sample ∝ exp(score) — here we
    emit the score mart itself.

    Determinism across engines: per-bucket weights are computed once
    (B rows), scaled to MICRO-units and rounded to integers, and the
    per-document score is an exact BIGINT sum of those integers — no
    float summation order can perturb it. The only float ops are B
    single ln() calls, identical input → identical libm-rounded
    output on both engines.

    Scale shape: token→bucket hashing is one md5 per occurrence
    (JVM-side); the bucket stats are ONE count aggregate (B=4096
    rows); the weight table is broadcast back onto the occurrence
    stream; per-doc sums ride a single doc_id shuffle of (doc_id,
    micro) pairs. Raw text never shuffles.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    occ = d.select(
        "doc_id",
        "lang",
        F.explode(norm_tokens(F.col("text"))).alias("tok"),
    ).withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long") % n_buckets,
    )
    stats = occ.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_cnt"),
        F.sum(F.when(F.col("lang") == target_lang, 1).otherwise(0)).alias("target_cnt"),
    )
    totals = stats.agg(
        F.sum("raw_cnt").alias("raw_tot"), F.sum("target_cnt").alias("target_tot")
    )
    # Laplace-smoothed log ratio, frozen to integer micro-units
    weights = (
        stats.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                F.lit(1e6)
                * (
                    F.log((F.col("target_cnt") + 1).cast("double") / (F.col("target_tot") + n_buckets).cast("double"))
                    - F.log((F.col("raw_cnt") + 1).cast("double") / (F.col("raw_tot") + n_buckets).cast("double"))
                )
            )
            .cast("long")
            .alias("w_micro"),
        )
    )
    return (
        occ.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum("w_micro").alias("score_micro"),
        )
        .withColumn("dsir_score", F.round(F.col("score_micro") / F.lit(1e6), 6))
    )


def unigram_perplexity(spark: SparkSession, sf_dir: str, n_buckets: int = 4096) -> DataFrame:
    """Hashed-unigram LM perplexity — the CCNet-style quality signal:
    train a Laplace-smoothed unigram model over hashed token buckets
    on the corpus itself, then score each document by per-token
    negative log-likelihood and perplexity (low = looks like the
    corpus; high = outlier/noise — the tails are what a pretraining
    pipeline trims).

    Same exactness contract as ``dsir_importance_weights``: per-bucket
    NLL contributions are frozen to integer micro-nats, per-doc sums
    are exact BIGINTs, and the only per-doc float ops (one divide,
    one exp) evaluate on identical inputs in both engines.

    Scale shape: one md5 per token occurrence, one B-row count
    aggregate, the model broadcast back onto the occurrence stream,
    one doc_id shuffle for the sums. Raw text never shuffles.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    occ = d.select("doc_id", F.explode(norm_tokens(F.col("text"))).alias("tok")).withColumn(
        "bucket",
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long") % n_buckets,
    )
    counts = occ.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("tot"))
    model = counts.crossJoin(F.broadcast(total)).select(
        "bucket",
        # -ln p(bucket), Laplace-smoothed, in integer micro-nats
        F.round(
            F.lit(-1e6)
            * F.log((F.col("cnt") + 1).cast("double") / (F.col("tot") + n_buckets).cast("double"))
        )
        .cast("long")
        .alias("nll_micro"),
    )
    return (
        occ.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_toks"), F.sum("nll_micro").alias("nll_micro_sum"))
        .select(
            "doc_id",
            "n_toks",
            "nll_micro_sum",
            F.round(
                F.exp(F.col("nll_micro_sum") / F.lit(1e6) / F.col("n_toks")), 4
            ).alias("perplexity"),
        )
    )


def bigram_perplexity(spark: SparkSession, sf_dir: str, n_buckets: int = 4096) -> DataFrame:
    """Hashed-BIGRAM LM perplexity — one order up from
    ``unigram_perplexity``: p(w_i | w_{i-1}) with Laplace smoothing
    over hashed bucket pairs, scored on every token transition. A
    bigram LM separates fluent text from bag-of-frequent-words noise
    that a unigram model scores as normal (the KenLM-filter regime at
    the cheapest useful order).

    Exactness contract (same as unigram/dsir): per-PAIR negative
    log-likelihoods freeze to integer micro-nats, per-doc sums are
    exact BIGINTs, the final divide+exp runs on identical inputs in
    both engines.

    Scale shape: the pair model C(prev,cur) can be up to B² rows so
    it joins the transition stream by SHUFFLE on (prev,cur) — never
    broadcast; the context totals C(prev) are <= B rows (bounded by
    the bucket count, not the corpus) and broadcast onto the pair
    counts. Docs with < 2 tokens have no transitions and drop out,
    matching the oracle. Raw text never shuffles.
    """
    d = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    toks = d.select("doc_id", norm_tokens(F.col("text")).alias("t")).filter(
        F.array_size("t") >= 2
    )

    def bucket(c):
        return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % n_buckets

    trans = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.array_size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("w1"),
                    F.element_at(F.col("t"), i + 1).alias("w2"),
                ),
            )
        ).alias("p"),
    ).select("doc_id", bucket(F.col("p.w1")).alias("pb"), bucket(F.col("p.w2")).alias("cb"))

    pair_counts = trans.groupBy("pb", "cb").agg(F.count(F.lit(1)).alias("c2"))
    ctx = pair_counts.groupBy("pb").agg(F.sum("c2").alias("c1"))
    model = pair_counts.join(F.broadcast(ctx), "pb").select(
        "pb",
        "cb",
        F.round(
            F.lit(-1e6)
            * F.log(
                (F.col("c2") + 1).cast("double") / (F.col("c1") + n_buckets).cast("double")
            )
        )
        .cast("long")
        .alias("nll_micro"),
    )
    return (
        trans.join(model, ["pb", "cb"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_trans"), F.sum("nll_micro").alias("nll_micro_sum"))
        .select(
            "doc_id",
            F.col("n_trans").cast("long").alias("n_trans"),
            F.col("nll_micro_sum").cast("long").alias("nll_micro_sum"),
            F.round(
                F.exp(F.col("nll_micro_sum") / F.lit(1e6) / F.col("n_trans")), 4
            ).alias("perplexity"),
        )
    )


def mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the ``source_mixing_weights`` equalization: every document
    gets a deterministic keep verdict with probability
    ``sample_prob(source)`` — over-represented sources thin toward the
    uniform mixture, under-represented ones keep everything. The
    composition step between the mixture mart and the corpus writer.

    Integer-exact decision (same idiom as ``weighted_sample``): the
    uniform draw is md5(doc_id || '#mix') mod 1e6 compared against the
    6dp sample_prob frozen to micro-units — pure BIGINT comparison,
    no float boundary can flip between engines. One broadcast join of
    the (tiny) weights mart onto a single corpus scan.
    """
    d = load_table(spark, sf_dir, "documents")
    wts = source_mixing_weights(spark, sf_dir).select("source", "sample_prob")
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#mix"))), 1, 15),
            16,
            10,
        )
        .cast("decimal(20,0)")
        .cast("long")
        % 1_000_000
    )
    p_micro = F.round(F.col("sample_prob") * 1_000_000).cast("long")
    return d.join(F.broadcast(wts), "source").select(
        "doc_id",
        "source",
        u.alias("u_micro"),
        p_micro.alias("p_micro"),
        (u < p_micro).alias("keep"),
    )


def pii_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C145 (r6): per-source PII prevalence — the compliance readout
    one level up from the per-doc scrub (C25): which SOURCES leak
    emails/phones/IPs and at what rate, the table that decides
    whether a source needs scrubbing, quarantine, or exclusion before
    its docs enter a training mix (and the before/after evidence a
    privacy review asks for). Same deterministic synthetic-PII
    injection and regex patterns as C25, so the two marts reconcile
    exactly.

    Exact integers: per source, docs scanned, docs with >= 1 hit of
    each kind, total hits of each kind, and the any-PII document
    share in exact ppm.

    Plan/scale: one scan, three regex counts per row (the C25
    projection), one map-side-combinable rollup to source grain.
    """
    from ..functions.exact import ppm_expr as _ppm_e

    d = with_synthetic_pii(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    per_doc = d.select(
        "source",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("ne"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("np"),
        F.regexp_count(t, F.lit(IPV4_RE)).cast("long").alias("ni"),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum((F.col("ne") > 0).cast("long")).cast("long").alias("docs_with_email"),
            F.sum((F.col("np") > 0).cast("long")).cast("long").alias("docs_with_phone"),
            F.sum((F.col("ni") > 0).cast("long")).cast("long").alias("docs_with_ip"),
            F.sum(
                ((F.col("ne") + F.col("np") + F.col("ni")) > 0).cast("long")
            ).cast("long").alias("docs_with_any_pii"),
            F.sum("ne").cast("long").alias("n_emails"),
            F.sum("np").cast("long").alias("n_phones"),
            F.sum("ni").cast("long").alias("n_ips"),
        )
        .selectExpr(
            "source",
            "n_docs",
            "docs_with_email",
            "docs_with_phone",
            "docs_with_ip",
            "docs_with_any_pii",
            "n_emails",
            "n_phones",
            "n_ips",
            f"CAST({_ppm_e('docs_with_any_pii', 'n_docs')} AS BIGINT)"
            " AS pii_doc_share_ppm",
        )
        .orderBy("source")
    )
