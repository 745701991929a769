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
