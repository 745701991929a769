"""Keyword and hybrid search operators over ``documents``: BM25
scoring (the classic inverted-index ranking function) and
reciprocal-rank fusion of the two ANN index paths (the standard
hybrid-retrieval combiner).

Scale shape: BM25 never materializes the full term-document matrix —
the explode is filtered to the query's terms before any aggregation
(predicate on the exploded term, so candidate postings are the only
rows shuffled), doc lengths come from array_size without an explode,
and every statistic (df, avgdl, N) is a broadcast-sized aggregate.
RRF is a union of two already-bounded top-k lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textfns import norm_tokens
from ..sources.registry import load_table
from .relational import r6

DEFAULT_QUERY = ("fast", "join", "stream")


def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    query_terms: tuple = DEFAULT_QUERY,
    k1: float = 1.2,
    b: float = 0.75,
    topn: int = 20,
) -> DataFrame:
    """BM25 document ranking for a keyword query (Robertson et al.,
    public IR literature): score(d) = sum over query terms of
    idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)) with
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)).

    Postings for only the query's terms are built (filter directly on
    the exploded term — Catalyst keeps it beside the generator), so
    the shuffled volume is candidate-postings-sized, not
    corpus-vocabulary-sized. Ranking is on the 6dp-ROUNDED score with
    a doc_id tiebreak so the top-n cut is identical on both engines.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", norm_tokens(F.col("text")).alias("t"))
    lens = toks.select("doc_id", F.array_size("t").alias("dl"))
    stats = lens.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    terms = [t.lower() for t in query_terms]
    postings = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    score_t = idf * (
        F.col("tf")
        * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        )
    )
    scored = (
        postings.join(lens, "doc_id")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            r6(F.sum(score_t)).alias("score"),
            F.count(F.lit(1)).alias("n_matched_terms"),
        )
    )
    return (
        scored.orderBy(F.desc("score"), "doc_id")
        .limit(topn)
        .select(
            "doc_id",
            "score",
            F.col("n_matched_terms").cast("long").alias("n_matched_terms"),
        )
    )


def rrf_hybrid_topk(
    spark: SparkSession, sf_dir: str, k: int = 5, c: int = 60
) -> DataFrame:
    """Reciprocal-rank fusion of the LSH and IVF ANN lists (Cormack &
    Clarke 2009, public IR literature): fused(q, d) = sum over lists
    of 1 / (c + rank_list(q, d)) — the standard way hybrid retrieval
    combines heterogeneous rankers without score calibration.

    Both input lists are already bounded (k rows per query), so the
    fusion is a union + one small aggregate + a per-query window over
    at most 2k rows — nothing corpus-scale is touched beyond what the
    two index paths already did. Output keeps each source rank so the
    fusion is auditable.
    """
    from pyspark.sql import Window

    from .similarity import ann_ivf_topk, ann_lsh_topk

    lsh = ann_lsh_topk(spark, sf_dir).select(
        "q_id",
        "neighbor_id",
        F.col("rank").alias("lsh_rank"),
        F.lit(None).cast("int").alias("ivf_rank"),
    )
    ivf = ann_ivf_topk(spark, sf_dir).select(
        "q_id",
        "neighbor_id",
        F.lit(None).cast("int").alias("lsh_rank"),
        F.col("rank").alias("ivf_rank"),
    )
    # r11 (guide §2.4): the full-outer join of the two bounded lists
    # cost 2 exchanges (both sides hashed on (q_id, neighbor_id)) plus
    # a 3rd for the q_id fusion window. A (q, d) pair appears at most
    # once per list, so union + max-aggregate is the same pairing; one
    # repartition("q_id") satisfies BOTH the (q_id, neighbor_id)
    # aggregate's clustering (subset key) and the window's — 3
    # exchanges -> 1, and the inherited shuffle-budget test (<= 8,
    # was 9) is green again.
    both = (
        lsh.unionByName(ivf)
        .repartition("q_id")
        .groupBy("q_id", "neighbor_id")
        .agg(
            F.max("lsh_rank").alias("lsh_rank"),
            F.max("ivf_rank").alias("ivf_rank"),
        )
    )
    rrf = (
        F.coalesce(1.0 / (c + F.col("lsh_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (c + F.col("ivf_rank")), F.lit(0.0))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("rrf_score"), F.col("neighbor_id").asc()
    )
    return (
        both.select("q_id", "neighbor_id", "lsh_rank", "ivf_rank", r6(rrf).alias("rrf_score"))
        .withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select("q_id", "fused_rank", "neighbor_id", "rrf_score", "lsh_rank", "ivf_rank")
    )
