"""Scale patterns: skew-salted joins, deterministic stratified
sampling, and the composite training-corpus filter.

These are the operators that make the difference between "runs at
sf0.1" and "runs on 100 TB with a hot key": salting splits a skewed
build key across ``n_salts`` sub-keys at the cost of replicating the
(small) other side; hash-order sampling gives reproducible samples
with no RNG state to coordinate across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .relational import r6


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys split across
    ``n_salts`` salts; the right side is replicated once per salt.

    Use when the LEFT side is large with skewed join keys and the
    RIGHT side is too big to broadcast but far smaller than the
    left (the classic fact-to-midsize-dim skew case AQE's skew-join
    handles only for sort-merge plans). The salt is derived from the
    left row's key hash — deterministic, no RNG state.
    """
    salt = F.pmod(F.xxhash64(F.col(left_key), F.lit(17)), F.lit(n_salts))
    lsalted = left.withColumn("_salt", salt)
    rsalted = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = lsalted.join(
        rsalted,
        (F.col(left_key) == F.col(right_key)) & (lsalted["_salt"] == rsalted["_salt"]),
        how,
    )
    return out.drop("_salt")


def sample_stratified(spark: SparkSession, sf_dir: str, per_stratum: int = 10) -> DataFrame:
    """Deterministic stratified downsample: the ``per_stratum``
    documents per source with the smallest md5(doc_id) — reproducible
    across engines, runs, and partitionings (no RNG), one shuffle on
    the stratum key."""
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source")))
    w = Window.partitionBy("source").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", "n_chars", h.alias("h"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_stratum)
        .select("source", F.col("rk").cast("long").alias("rk"), "doc_id", "h")
    )


def training_corpus_filter(
    spark: SparkSession, sf_dir: str, min_quality: float = 0.8
) -> DataFrame:
    """The end-to-end pre-training corpus gate: keep documents that
    (a) survive exact dedup (min doc_id per normalized-content hash),
    (b) classify as English, and (c) clear the quality threshold.

    Composition of the C-suite operators — each stage is the same
    distributed pass it is standalone; the dedup keeper set joins
    back as a semi-join on doc_id (narrow key, no text shuffled).
    """
    from . import dedup as DD, text as TX

    lang = TX.lang_id(spark, sf_dir)
    qual = TX.quality_score(spark, sf_dir)
    keepers = DD.dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    return (
        qual.join(lang, "doc_id")
        .join(keepers, "doc_id", "left_semi")
        .filter((F.col("pred_lang") == "en") & (F.col("quality_score") >= min_quality))
        .select("doc_id", "pred_lang", "n_tokens", "quality_score")
    )
