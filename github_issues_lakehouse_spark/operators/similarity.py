"""Similarity search over the ``embeddings`` table.

- ``ann_bruteforce_topk``: exact cosine top-k of a small query set
  against the corpus. The query set is broadcast; the corpus streams
  through in one pass (no shuffle of the corpus), then a per-query
  top-k window. At 100 TB this is the classic brute-force scoring
  pass: map-side join + partial top-k via window over (query, score).
- ``neardup_embedding_cosine``: all corpus pairs with cosine >= tau,
  blocked to avoid the full cross product at scale.
- ``ann_lsh_topk``: random-hyperplane LSH bucketing (deterministic,
  md5-seeded) — candidates only probe matching buckets; the scale
  path when the query set is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine, to_double
from ..sources.registry import load_table
from .relational import r6


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", to_double(F.col("embedding")).alias("vec"), "label")


def ann_bruteforce_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries``
    vectors (excluding self-matches). Deterministic tiebreak on
    vec_id."""
    from pyspark.sql import Window

    corpus = _corpus(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    scored = corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "vec_id",
        r6(cosine(F.col("q_vec"), F.col("vec"))).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )


def neardup_embedding_cosine(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4
) -> DataFrame:
    """All pairs with cosine >= threshold, as an Arrow-batched blocked
    matrix multiply.

    The row-expression form (self-join + per-pair 64-term fold) is
    O(n^2 * dim) *interpreted* work — 40s at sf0.1; numpy does the
    same arithmetic vectorized in ~1s. One side streams through
    ``mapInPandas`` partition-parallel; the other side rides along as
    a broadcast (id, matrix, norms) triple. At 100 TB the broadcast
    side becomes a loop over corpus blocks (outer blocked matmul) —
    the kernel and schema below are unchanged, only the driver adds
    the block loop.
    """
    import numpy as np

    corpus = _corpus(spark, sf_dir).select("vec_id", "vec")
    side = corpus.toPandas()
    ids_b = side["vec_id"].to_numpy()
    M = np.stack(side["vec"].to_numpy()).astype(np.float64)
    nb = np.sqrt((M * M).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids_b, M, nb))

    def block_cosine(batches):
        import pandas as pd

        ids_r, Mr, nr = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids_a = pdf["vec_id"].to_numpy()
            A = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            na = np.sqrt((A * A).sum(axis=1))
            S = np.round((A @ Mr.T) / na[:, None] / nr[None, :], 6)
            ai, bj = np.nonzero((S >= threshold) & (ids_a[:, None] < ids_r[None, :]))
            yield pd.DataFrame(
                {"id_a": ids_a[ai], "id_b": ids_r[bj], "cos_sim": S[ai, bj]}
            )

    return corpus.mapInPandas(
        block_cosine, schema="id_a long, id_b long, cos_sim double"
    )


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is partitioned into
    inverted lists by nearest centroid; each query scores only the
    lists of its ``n_probe`` nearest centroids.

    Centroids are the first ``n_centroids`` corpus vectors — a
    deterministic stand-in for a k-means pass (at scale: run k-means||
    once offline, broadcast the centroid table; the assignment and
    probe plan below is unchanged). Assignment scores are rounded to
    6dp before the argmax so the cell choice is reproducible across
    engines; ties break on centroid id.
    """
    from pyspark.sql import Window

    corpus = _corpus(spark, sf_dir)
    cents = corpus.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")
    )

    def assign(df, id_col, vec_col, keep_rank):
        scored = df.crossJoin(F.broadcast(cents)).select(
            id_col,
            "c_id",
            r6(cosine(F.col(vec_col), F.col("c_vec"))).alias("c_sim"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("c_sim").desc(), F.col("c_id").asc())
        return (
            scored.withColumn("crank", F.row_number().over(w))
            .filter(F.col("crank") <= keep_rank)
            .select(id_col, F.col("c_id").alias("cell"))
        )

    cells = assign(corpus, "vec_id", "vec", 1)
    corpus_cells = corpus.join(cells, "vec_id")
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    probes = assign(
        queries.select(F.col("q_id"), F.col("q_vec")), "q_id", "q_vec", n_probe
    )
    cand = (
        corpus_cells.join(F.broadcast(probes), "cell")
        .join(F.broadcast(queries), "q_id")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", r6(cosine(F.col("q_vec"), F.col("vec"))).alias("cos_sim")
        )
        .dropDuplicates(["q_id", "vec_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes derived from md5 — no
    RNG state, reproducible across engines and runs."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            # map first 8 hex chars to [-1, 1)
            row.append(int(h[:8], 16) / float(1 << 31) - 1.0)
        planes.append(row)
    return planes


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH signature buckets;
    queries only score candidates in their own bucket (plus hamming-1
    probes for recall). Approximate by construction -> rows-only
    correctness check.
    """
    from pyspark.sql import Window

    planes = _hyperplanes(dim, n_planes)
    corpus = _corpus(spark, sf_dir)

    def signature(vec_col):
        bits = []
        for p_idx, plane in enumerate(planes):
            proj = F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(v) for v in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits.append(F.when(proj >= 0, F.lit(1 << p_idx)).otherwise(F.lit(0)))
        sig = F.lit(0)
        for b in bits:
            sig = sig + b
        return sig.cast("long")

    sigd = corpus.withColumn("bucket", signature(F.col("vec")))
    queries = sigd.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("bucket").alias("q_bucket"),
    )
    # multi-probe: own bucket + hamming-1 neighbors
    probes = queries.select(
        "q_id",
        "q_vec",
        F.explode(
            F.array(
                F.col("q_bucket"),
                *[F.col("q_bucket").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
            )
        ).alias("bucket"),
    )
    cand = sigd.join(F.broadcast(probes), on="bucket").filter(F.col("vec_id") != F.col("q_id"))
    scored = cand.select(
        "q_id", "vec_id", r6(cosine(F.col("q_vec"), F.col("vec"))).alias("cos_sim")
    ).dropDuplicates(["q_id", "vec_id"])
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )
