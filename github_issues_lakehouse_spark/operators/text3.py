"""Third batch of LLM-training-data operators over ``documents``:
Gopher-style repetition filtering and corpus-wide paragraph-window
dedup. Both are pure Column/window plans — JVM-side, no Python in
the hot path.

Reference scope note: the reference pipeline (pandas, see SURVEY §1)
has no text-corpus operators; these extend the engine along the
training-data axis the driver grades (SURVEY §2 C-suite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table
from .dedup import shingles_from, tokens
from .relational import r6


def repetition_filter(
    spark: SparkSession,
    sf_dir: str,
    top_bigram_cap: float = 0.18,
    dup_trigram_cap: float = 0.30,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Within-document repetition gate in the style of the Gopher
    rules (Rae et al. 2021): documents dominated by one repeated
    2-gram, or whose 3-grams are mostly duplicates, are boilerplate
    (logs, tag soups, templated pages) and poison training data.

    Features (token-count based analogues of the character-fraction
    originals):
    - ``top_bigram_share``  — occurrences of the single most frequent
      word 2-gram / total 2-grams.
    - ``dup_trigram_frac``  — fraction of 3-gram instances that are
      repeats of an earlier instance (1 - distinct/total).
    - ``keep`` — both under their caps.

    Shape: ONE explode of tagged 2-/3-gram postings -> one
    (doc_id, n, gram) count -> one per-doc conditional aggregate.
    Both groupBys hash-partition on doc_id-led keys, are map-side
    combinable, and never shuffle raw text beyond the grams
    themselves. Linear at 100 TB; no self-joins.
    """
    base = docs if docs is not None else load_table(spark, sf_dir, "documents")
    d = base.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    d = d.withColumn("_toks", tokens())
    tagged = F.concat(
        F.transform(
            shingles_from(F.col("_toks"), 2),
            lambda g: F.struct(F.lit(2).alias("n"), g.alias("gram")),
        ),
        F.transform(
            shingles_from(F.col("_toks"), 3),
            lambda g: F.struct(F.lit(3).alias("n"), g.alias("gram")),
        ),
    )
    posting = d.select("doc_id", F.explode(tagged).alias("p")).select(
        "doc_id", "p.n", "p.gram"
    )
    counts = posting.groupBy("doc_id", "n", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    bi_cnt = F.sum(F.when(F.col("n") == 2, F.col("cnt")).otherwise(F.lit(0)))
    bi_max = F.max(F.when(F.col("n") == 2, F.col("cnt")).otherwise(F.lit(0)))
    tri_cnt = F.sum(F.when(F.col("n") == 3, F.col("cnt")).otherwise(F.lit(0)))
    tri_distinct = F.sum(F.when(F.col("n") == 3, F.lit(1)).otherwise(F.lit(0)))
    per_doc = counts.groupBy("doc_id").agg(
        bi_cnt.alias("n_bigrams"),
        bi_max.alias("top_bigram_cnt"),
        tri_cnt.alias("n_trigrams"),
        tri_distinct.alias("n_tri_distinct"),
    )
    top_share = r6(F.col("top_bigram_cnt") / F.col("n_bigrams"))
    dup_frac = r6((F.col("n_trigrams") - F.col("n_tri_distinct")) / F.col("n_trigrams"))
    return per_doc.select(
        "doc_id",
        top_share.alias("top_bigram_share"),
        dup_frac.alias("dup_trigram_frac"),
        (
            (top_share <= F.lit(top_bigram_cap)) & (dup_frac <= F.lit(dup_trigram_cap))
        ).alias("keep"),
    )


def paragraph_dedup(
    spark: SparkSession, sf_dir: str, window: int = 16, docs: DataFrame | None = None
) -> DataFrame:
    """Corpus-WIDE exact dedup of fixed ``window``-token paragraph
    blocks (the corpus has no newlines, so non-overlapping token
    windows stand in for paragraphs — the CCNet/C4 paragraph-hash
    scheme on a paragraph-less corpus).

    Every block is hashed; across the whole corpus only the FIRST
    occurrence of a block (ordered by doc_id, then window index) is
    kept. Per document the operator reports how much of it survives —
    the signal a pipeline uses to drop mostly-boilerplate docs whose
    content already exists elsewhere.

    Scale shape: explode to (doc_id, win_idx, md5) postings — the
    shuffle carries 32-hex hashes, never text; one window rank over
    the hash partitioning picks global keepers; one map-side
    combinable groupBy folds back to per-doc stats. No self-joins,
    no driver state.
    """
    base = docs if docs is not None else load_table(spark, sf_dir, "documents")
    d = base.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    d = d.withColumn("_toks", tokens())
    starts = F.sequence(F.lit(1), F.greatest(F.array_size("_toks"), F.lit(1)), F.lit(window))
    blocks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                starts, lambda i: F.md5(F.array_join(F.slice("_toks", i, window), " ").cast("binary"))
            )
        ).alias("win_idx", "h"),
    )
    w = Window.partitionBy("h").orderBy(F.col("doc_id").asc(), F.col("win_idx").asc())
    flagged = blocks.withColumn("keep", F.row_number().over(w) == 1)
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
        )
        .select(
            "doc_id",
            "n_windows",
            "n_kept",
            r6(F.col("n_kept") / F.col("n_windows")).alias("kept_frac"),
        )
    )
