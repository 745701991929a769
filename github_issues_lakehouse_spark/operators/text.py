"""Text-analysis operators over the ``documents`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import textfns as X
from ..sources.registry import load_table
from .relational import r6


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", X.lang_id(F.col("text")).alias("pred_lang"))


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        X.whitespace_token_count(t).cast("long").alias("n_tokens"),
        r6(X.punct_ratio(t)).alias("punct_ratio"),
        r6(X.stopword_ratio(t)).alias("stopword_ratio"),
        r6(X.repetition_ratio(t)).alias("repetition_ratio"),
        r6(X.quality_score(t)).alias("quality_score"),
    )


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        X.whitespace_token_count(t).cast("long").alias("ws_tokens"),
        X.bpe_ish_token_count(t).cast("long").alias("bpe_ish_tokens"),
        F.length(t).cast("long").alias("n_chars"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        X.fingerprint_md5(t).alias("fingerprint"),
        F.array_size(X.rolling_hash_fingerprints(t)).cast("long").alias("n_rolling_fps"),
        F.try_element_at(X.rolling_hash_fingerprints(t), F.lit(1)).alias("first_rolling_fp"),
    )


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus statistics mart (the documents-side analogue
    of the reference's monthly KPI rollup)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    return (
        d.select(
            "source",
            X.whitespace_token_count(t).alias("n_tok"),
            F.length(t).alias("n_chars"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
            r6(F.avg("n_tok")).alias("avg_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
