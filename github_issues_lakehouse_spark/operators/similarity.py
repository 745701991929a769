"""Similarity search over the ``embeddings`` table.

- ``ann_bruteforce_topk``: exact cosine top-k of a small query set
  against the corpus. The query set is broadcast; the corpus streams
  through in one pass (no shuffle of the corpus), a narrow map-side
  partial top-k (``_partial_topk``) cuts each input partition to k
  rows per query, then the exact per-query window merges the
  survivors — no task ever holds all corpus scores for one query.
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


def _packed_cell_assign(df, id_col: str, vec_col: str, cents, keep_rank: int):
    """Top-``keep_rank`` IVF cells per row as a NARROW expression
    (r10, guide §2.4): the centroid table is packed into ONE broadcast
    row of (c_id, c_vec) structs; per input row the cells are scored
    with the family's verbatim r6-cosine, sorted by a comparator that
    reproduces the previous window's (c_sim DESC, c_id ASC) ordering
    under Spark's total order (NaN largest, -0.0 == 0.0), and the
    first ``keep_rank`` are posexploded with crank = position + 1.
    Replaces a crossJoin row explosion (rows x n_centroids) plus a
    full row_number Exchange+Sort per assignment call — the
    assignment stage no longer shuffles at all. Rows are identical:
    same scores, same ordering, same rank filter.

    Returns (id_col, cell, crank)."""
    cents_row = cents.agg(
        F.sort_array(F.collect_list(F.struct("c_id", "c_vec"))).alias("_cents")
    )
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            r6(cosine(F.col(vec_col), c["c_vec"])).alias("c_sim"),
            c["c_id"].alias("c_id"),
        ),
    )
    cmp = lambda l, r: (  # noqa: E731 — (c_sim desc, c_id asc), Spark total order
        F.when(l["c_sim"] > r["c_sim"], F.lit(-1))
        .when(l["c_sim"] < r["c_sim"], F.lit(1))
        .when(l["c_id"] < r["c_id"], F.lit(-1))
        .when(l["c_id"] > r["c_id"], F.lit(1))
        .otherwise(F.lit(0))
    )
    top = F.slice(F.array_sort(scored, cmp), 1, keep_rank)
    return (
        df.crossJoin(F.broadcast(cents_row))
        .filter(F.size("_cents") > 0)  # empty centroid set: no rows (window parity)
        .select(id_col, F.posexplode(top).alias("_pos", "_cell"))
        .select(
            id_col,
            F.col("_cell")["c_id"].alias("cell"),
            (F.col("_pos") + 1).alias("crank"),
        )
    )


def _partial_topk(
    scored: DataFrame, group_cols: list[str], score_col: str, tie_col: str, k: int
) -> DataFrame:
    """Per-input-partition partial top-k — the map-side combine for the
    brute-force scorer family.

    Without this, ``Window.partitionBy(q_id)`` over the raw scores puts
    ALL n corpus scores for one query in one task: correct, but a
    single-task memory ceiling at 100 TB. This pass runs INSIDE the
    scoring stage (mapInPandas is narrow — no shuffle) and keeps only
    the k best rows per group per input partition, so the downstream
    exact window sees at most k × n_partitions rows per group.

    Losslessness: rows are totally ordered by (score desc, tie asc)
    with a unique tie column. Any row cut locally is dominated by k
    rows from its own partition, which also dominate it globally —
    so the global top-k over the survivors equals the global top-k
    over everything, ties included. Output schema == input schema;
    downstream plans and oracle hashes are unchanged.

    (Canonical implementation: ``operators.scale.partial_topk`` —
    shared with the hash-sampling shapes, which keep the k smallest.)
    """
    from .scale import partial_topk

    return partial_topk(scored, group_cols, score_col, tie_col, k, ascending=False)


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
    # map-side partial top-k bounds the final window's per-task input to
    # k × n_partitions rows per query instead of the whole corpus
    pruned = _partial_topk(scored, ["q_id"], "cos_sim", "vec_id", k)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "rank", F.col("vec_id").alias("neighbor_id"), "cos_sim")
    )


def neardup_embedding_cosine(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4, n_blocks: int = 8
) -> DataFrame:
    """All pairs with cosine >= threshold, as a fully distributed
    triangle block-pair join — NO driver-side collect or broadcast.

    The corpus is hashed into ``n_blocks`` disjoint blocks on vec_id;
    each row is replicated to every unordered block pair it belongs to
    (``n_blocks`` copies), shuffled once on (bi, bj), and each of the
    B(B+1)/2 groups scores one block×block tile via ``applyInPandas``.
    Coverage is exact: every vector pair {u, v} falls in exactly one
    group (min(blk_u, blk_v), max(blk_u, blk_v)).

    Cosine spelling (ADVICE r7 unification): the tile kernel is the
    vectorized SEQUENTIAL fold — per-dimension outer-product
    accumulation in ascending d, norms folded in the same pass, one
    dot/(na*nb) divide — bit-identical to the Catalyst
    ``dot()/(norm()*norm())`` spelling ``banded_corpus_pairs`` uses
    to verify candidates and to DuckDB's sequential
    ``list_dot_product`` oracle. That makes the banded family's
    subset-of-exact contract (C146/C147 precision-1 identity) an IEEE
    guarantee, not an empirical one. Never a BLAS matmul here:
    pairwise summation re-orders adds and can flip 6dp-boundary
    cosines across the three sites. (~64 vectorized passes per tile
    instead of one GEMM — this operator is the documented exact
    AUDIT; the production path is C146.)

    Scale: the row-expression form (self-join + per-pair 64-term fold)
    is O(n² · dim) *interpreted* work; the previous broadcast form
    collected the whole corpus to the driver. Here driver memory is
    O(1), each task holds 2n/B vectors, and total shuffle is n·B rows
    — pick B ≈ n·dim·8 / target_task_bytes at 100 TB. The n² pair
    *scoring* work is inherent to exact all-pairs; for the sub-n²
    path use LSH/IVF candidates (``ann_lsh_topk`` / ``ann_ivf_topk``).
    """
    corpus = _corpus(spark, sf_dir).select("vec_id", "vec")
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks))
    pair_keys = F.array(
        *[
            F.struct(
                F.least(blk, F.lit(j)).alias("bi"), F.greatest(blk, F.lit(j)).alias("bj")
            )
            for j in range(n_blocks)
        ]
    )
    exploded = (
        corpus.withColumn("blk", blk)
        .withColumn("pk", F.explode(pair_keys))
        .select(F.col("pk.bi").alias("bi"), F.col("pk.bj").alias("bj"), "blk", "vec_id", "vec")
    )

    def block_pair_cosine(key, pdf):
        # self-contained closure: workers may not be able to import this
        # package (foreign-cwd driver), so only stdlib/numpy/pandas here
        import numpy as np
        import pandas as pd

        bi, bj = key
        a_side = pdf[pdf["blk"] == bi]
        b_side = pdf[pdf["blk"] == bj]
        empty = pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cos_sim": pd.Series(dtype="float64"),
            }
        )
        if len(a_side) == 0 or len(b_side) == 0:
            return empty
        ids_a = a_side["vec_id"].to_numpy()
        ids_b = b_side["vec_id"].to_numpy()
        Ma = np.stack(a_side["vec"].to_numpy()).astype(np.float64)
        Mb = np.stack(b_side["vec"].to_numpy()).astype(np.float64)
        # ONE cosine spelling across the family (ADVICE r7): a
        # sequential per-dimension fold (d ascending, acc starts 0.0)
        # with a single dot/(na*nb) divide — element-for-element the
        # IEEE sequence of the Catalyst dot()/norm() folds that
        # banded_corpus_pairs verifies with and of DuckDB's
        # list_dot_product, so banded pairs are a bit-for-bit SUBSET
        # of these pairs and the oracle parity holds term-for-term.
        # A BLAS matmul (pairwise summation) re-orders the adds and
        # can flip a 6dp-boundary cosine against both of those.
        acc = np.zeros((len(ids_a), len(ids_b)))
        na2 = np.zeros(len(ids_a))
        nb2 = np.zeros(len(ids_b))
        for d in range(Ma.shape[1]):
            ca, cb = Ma[:, d], Mb[:, d]
            acc = acc + ca[:, None] * cb[None, :]
            na2 = na2 + ca * ca
            nb2 = nb2 + cb * cb
        S = np.round(acc / (np.sqrt(na2)[:, None] * np.sqrt(nb2)[None, :]), 6)
        if bi == bj:
            # same block on both sides: strict id order dedups and
            # drops self-pairs in one mask
            ai, bx = np.nonzero((S >= threshold) & (ids_a[:, None] < ids_b[None, :]))
            id_lo, id_hi = ids_a[ai], ids_b[bx]
        else:
            # disjoint blocks: every hit is a distinct pair; canonicalize
            # orientation so id_a < id_b regardless of block order
            ai, bx = np.nonzero(S >= threshold)
            u, v = ids_a[ai], ids_b[bx]
            id_lo, id_hi = np.minimum(u, v), np.maximum(u, v)
        if len(ai) == 0:
            return empty
        return pd.DataFrame({"id_a": id_lo, "id_b": id_hi, "cos_sim": S[ai, bx]})

    return exploded.groupBy("bi", "bj").applyInPandas(
        block_pair_cosine, schema="id_a long, id_b long, cos_sim double"
    )


def ann_ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: the corpus is partitioned into
    inverted lists by nearest centroid; each query scores only the
    lists of its ``n_probe`` nearest centroids.

    Default centroids are the first ``n_centroids`` corpus vectors —
    a deterministic stand-in that keeps the DuckDB oracle exact. Pass
    ``centroids`` (c_id, c_vec) — e.g. the trained table from
    ``clustering.kmeans_embeddings`` via ``ivf_trained_centroids`` —
    for a real k-means index with the identical assignment/probe
    plan. Assignment scores are rounded to 6dp before the argmax so
    the cell choice is reproducible across engines; ties break on
    centroid id.
    """
    from pyspark.sql import Window

    corpus = _corpus(spark, sf_dir)
    cents = (
        centroids
        if centroids is not None
        else corpus.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")
        )
    )

    def assign(df, id_col, vec_col, keep_rank):
        # narrow packed-centroid assignment (see _packed_cell_assign)
        return _packed_cell_assign(df, id_col, vec_col, cents, keep_rank).select(
            id_col, "cell"
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


def ann_recall_at_k(
    spark: SparkSession, sf_dir: str, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """ANN quality measurement: recall@k of the LSH index against the
    exact brute-force ground truth, per query. The operator a vector
    pipeline runs after (re)building an index to decide whether its
    probe settings are good enough. Both sides are the existing
    operators — the join is on tiny top-k sets."""
    truth = ann_bruteforce_topk(spark, sf_dir, n_queries, k)
    approx = ann_lsh_topk(spark, sf_dir, n_queries, k)
    hits = truth.join(approx, ["q_id", "neighbor_id"], "left_semi")
    per_q = hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hits"))
    base = truth.select("q_id").distinct()
    return base.join(per_q, "q_id", "left").select(
        "q_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        r6(F.coalesce("n_hits", F.lit(0)) / float(k)).alias("recall"),
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


def _lsh_signature(vec_col, planes):
    """Random-hyperplane LSH signature Column: bit p set iff the
    left-associated dot product with plane p is >= 0 (the fold order
    the DuckDB oracle reproduces term-for-term)."""
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

    sigd = corpus.withColumn("bucket", _lsh_signature(F.col("vec"), planes))
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


def ann_ivf_recall_at_k(
    spark: SparkSession, sf_dir: str, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """recall@k of the IVF index (trained-centroid cells + n_probe
    probing) against the brute-force ground truth — the quality gate
    for the second ANN family, so probe-count tuning has the same
    measured feedback the LSH path already gets."""
    truth = ann_bruteforce_topk(spark, sf_dir, n_queries, k)
    approx = ann_ivf_topk(spark, sf_dir, n_queries, k)
    hits = truth.join(approx, ["q_id", "neighbor_id"], "left_semi")
    per_q = hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hits"))
    base = truth.select("q_id").distinct()
    return base.join(per_q, "q_id", "left").select(
        "q_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        r6(F.coalesce("n_hits", F.lit(0)) / float(k)).alias("recall"),
    )


def hard_negative_mining(
    spark: SparkSession, sf_dir: str, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Contrastive-training prep: for each query vector, the top-k
    most-similar vectors with a DIFFERENT label — the "hard
    negatives" that make a retrieval/embedding model actually learn
    boundaries (easy random negatives carry no gradient signal).

    Same scale shape as brute-force ANN: the query set broadcasts,
    one corpus pass scores, a per-query window takes top-k — the
    label-mismatch predicate rides the join condition so same-label
    pairs never reach the scorer.
    """
    from pyspark.sql import Window

    c = _corpus(spark, sf_dir)  # (vec_id, vec, label)
    queries = c.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    cand = c.select("vec_id", F.col("label").alias("neg_label"), "vec")
    scored = cand.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("q_id")) & (F.col("neg_label") != F.col("q_label")),
    ).select(
        "q_id",
        "q_label",
        "vec_id",
        "neg_label",
        r6(cosine(F.col("q_vec"), F.col("vec"))).alias("cos_sim"),
    )
    pruned = _partial_topk(scored, ["q_id"], "cos_sim", "vec_id", k)
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return (
        pruned.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            "q_label",
            "rank",
            F.col("vec_id").alias("negative_id"),
            F.col("neg_label").alias("negative_label"),
            "cos_sim",
        )
    )


def knn_label_purity(
    spark: SparkSession, sf_dir: str, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Embedding-quality sanity via kNN label purity: for each query
    vector, what fraction of its k exact nearest neighbors share its
    label. Low purity across the board means the embedding does not
    encode the label structure — the go/no-go check before using the
    space for retrieval or weak labeling.

    Same broadcast-query brute-force shape as the ANN ground truth;
    the purity fold is one tiny aggregate over the top-k rows.
    """
    truth = ann_bruteforce_topk(spark, sf_dir, n_queries, k)
    labels = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    q_labels = labels.select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("q_label")
    )
    n_labels = labels.select(
        F.col("vec_id").alias("neighbor_id"), F.col("label").alias("n_label")
    )
    joined = truth.join(F.broadcast(q_labels), "q_id").join(
        F.broadcast(n_labels), "neighbor_id"
    )
    return (
        joined.groupBy("q_id", "q_label")
        .agg(
            F.sum((F.col("n_label") == F.col("q_label")).cast("long")).alias("n_same_label")
        )
        .select(
            "q_id",
            "q_label",
            F.col("n_same_label").cast("long").alias("n_same_label"),
            r6(F.col("n_same_label") / float(k)).alias("purity"),
        )
    )


def _band_keys(vec_col, planes, bands: int, bits_per_band: int):
    """Array of per-band struct(band_id, band_val) hyperplane-sign
    keys — the banded OR-construction shared by the semantic
    decontaminator (C92) and the banded within-corpus pair stage
    (C146/C147): ``bands`` bands of ``bits_per_band`` sign bits each;
    a pair is a candidate iff some band matches exactly. Projections
    are the left-associated fold the DuckDB oracles reproduce
    term-for-term. (A flat v[0]*c0 + v[1]*c1 + ... spelling is
    FP-identical but plans a 3072-node expression tree whose codegen
    compile dominates every query — measured 2x WORSE than the
    interpreted fold; don't "optimize" it back.)

    As of r8 no operator calls this directly — every production site
    (C92/C146/C147/C148, D35) rides the Arrow ``_signature_frame``
    pass. This stays as the executable Catalyst REFERENCE spelling of
    the banding contract: tests/test_r8_wave1.py re-proves
    _signature_frame bit-identical to it per config, which is what
    licenses the oracles' flat SQL chains to stand in for the Arrow
    pass."""
    keys = []
    for b in range(bands):
        val = F.lit(0)
        for i in range(bits_per_band):
            plane = planes[b * bits_per_band + i]
            proj = F.aggregate(
                F.zip_with(
                    vec_col,
                    F.array(*[F.lit(v) for v in plane]),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            val = val + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        keys.append(
            F.struct(F.lit(b).alias("band_id"), val.cast("long").alias("band_val"))
        )
    return F.array(*keys)


def _signature_frame(
    vec_df: DataFrame, n_planes: int = 48, bands: int = 8, dim: int = 64
) -> DataFrame:
    """(vec_id, vec, nrm, bvals) for a (vec_id, vec) frame — the
    Arrow-vectorized signature stage shared by the banded embedding
    family (C146/C147/C148, D35): per input batch ONE numpy pass
    computes all ``n_planes`` hyperplane projections, the norm, and
    the per-band sign-bit values.

    Parity contract (the reason this is safe to vectorize): the
    accumulation is an EXPLICIT per-dimension sequential loop
    (acc += v[d]*plane[d], d ascending), element-for-element the same
    IEEE sequence as the Catalyst zip_with/aggregate left fold in
    ``_band_keys`` and as the DuckDB oracles' flat ``v[1]*c1 + ...``
    chains — verified bit-identical on every sf0.1 vector (0/2000
    signature or norm mismatches) before the family switched to it.
    Never np.dot/einsum here: pairwise summation re-orders the adds
    and flips signs on near-boundary projections (the C92 lesson).

    Why not Catalyst: 48 interpreted higher-order folds per row cost
    ~3s per operator call at sf0.1 (measured); the flat-expression
    spelling is WORSE (3072-node codegen compile per query). The
    closure is self-contained (numpy/pandas only) so foreign-cwd
    drivers' workers never import this package.
    """
    assert n_planes % bands == 0
    bits_per_band = n_planes // bands
    planes_data = _hyperplanes(dim, n_planes)

    def gen(it):
        import numpy as np
        import pandas as pd

        P = np.asarray(planes_data, dtype=np.float64)  # (n_planes, dim)
        weights = (np.int64(1) << np.arange(bits_per_band, dtype=np.int64))
        n_bands, bpb = P.shape[0] // bits_per_band, bits_per_band
        for pdf in it:
            if len(pdf) == 0:
                continue
            # np.stack on NULL/ragged input raises an opaque shape
            # error (ADVICE r7): name the offending vec_id instead —
            # the banded family and the D35 index require non-null
            # fixed-dim vectors, same as the _corpus contract.
            vecs = pdf["vec"]
            null_mask = vecs.isna()
            if null_mask.any():
                bad = pdf.loc[null_mask, "vec_id"].iloc[0]
                raise ValueError(
                    f"embedding signature: NULL embedding for vec_id={bad}; "
                    "drop or impute upstream of the banded family"
                )
            lens = vecs.map(len)
            if (lens != P.shape[1]).any():
                row = pdf.loc[lens != P.shape[1]].iloc[0]
                raise ValueError(
                    f"embedding signature: vec_id={row['vec_id']} has dim "
                    f"{len(row['vec'])}, expected {P.shape[1]}"
                )
            M = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, dim)
            acc = np.zeros((len(pdf), P.shape[0]))
            n2 = np.zeros(len(pdf))
            for d in range(M.shape[1]):
                col = M[:, d]
                acc = acc + col[:, None] * P[:, d][None, :]
                n2 = n2 + col * col
            bits = (acc >= 0).astype(np.int64)
            bv = np.zeros((len(pdf), n_bands), dtype=np.int64)
            for b in range(n_bands):
                bv[:, b] = bits[:, b * bpb : (b + 1) * bpb] @ weights
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "vec": list(pdf["vec"]),
                    "nrm": np.sqrt(n2),
                    "bvals": list(bv),
                }
            )

    return vec_df.mapInPandas(
        gen, schema="vec_id long, vec array<double>, nrm double, bvals array<bigint>"
    )


def embedding_band_postings(
    df: DataFrame, n_planes: int = 48, bands: int = 8, dim: int = 64
) -> DataFrame:
    """(vec_id, band_id, band_val) hyperplane band postings for an
    embeddings-schema frame — the row grain the D35 streaming index
    maintains and the incremental embedding probe joins on. Rides the
    SAME md5 hyperplanes and fold order as ``banded_corpus_pairs``
    (shared ``_signature_frame``, bit-identical to the ``_band_keys``
    Catalyst fold — see its parity contract), so streamed index rows
    are bit-identical to the batch candidate stage's keys (the D24
    ``lsh_postings`` discipline, dedup.py). A posting row is pure
    idempotent state: union + distinct folds survive at-least-once
    redelivery with no dedup bookkeeping. bucket_cap stays a
    QUERY-time policy — the prober derives bucket counts from the
    index, so one maintained index serves any cap."""
    from ..functions.vectors import to_double

    sig = _signature_frame(
        df.select("vec_id", to_double(F.col("embedding")).alias("vec")),
        n_planes,
        bands,
        dim,
    )
    return sig.select(
        "vec_id", F.posexplode("bvals").alias("band_id", "band_val")
    )


def banded_corpus_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    n_planes: int = 48,
    bands: int = 8,
    dim: int = 64,
    bucket_cap: int = 2000,
) -> DataFrame:
    """Shared banded candidate + exact-verify stage for the
    within-corpus semantic near-dup SCALE path (C146/C147, VERDICT r6
    task 4): every vector posts ``bands`` band keys (``n_planes /
    bands`` hyperplane sign bits each), candidates are the distinct
    same-band-key pairs after a ``bucket_cap`` degenerate-bucket
    guard (the minhash_candidates idiom), and every candidate is
    verified with the same 6dp-rounded exact cosine C6 uses — the
    Catalyst dot/(na*nb) sequential fold, which C6's tile kernel
    replicates IEEE-op-for-op since the ADVICE r7 unification — so
    emitted pairs are a bit-for-bit SUBSET of C6's exact pairs
    (precision 1 guaranteed, not just observed; the quantity that
    degrades is recall, and C147 measures it).

    Banding math (why the default is 8 bands x 6 bits): a pair at
    cosine c matches one sign bit with p = 1 - acos(c)/pi, a band
    with p^6, some band with 1-(1-p^6)^8. At production near-dup
    thresholds this is high recall with strong pruning, and as of r8
    the numbers are MEASURED on planted pairs, not just computed
    (``tools/stress.py planted-embeddings``, 2000 pairs/point;
    tests/test_r8_planted.py asserts the match): c=0.8 => 90.3%
    predicted / 90.3% measured; c=0.9 => 98.2% / 98.0%; c=0.95 =>
    99.75% / 99.85%. (r7 docs quoted "98% at 0.8" — that was a
    mis-evaluation of this same formula; 98% belongs to c=0.9.)
    Random orthogonal pairs pass some band at ~1-(1-2^-6)^8 = 11.8%
    of postings mass. This corpus's only organic pair grain is the
    adversarially-low c~0.4 (random synthetic vectors, no planted
    dups), where the same config holds ~45% recall on ~1/8th of the
    pairs — the honest worst case, priced by C147 rather than
    hidden. Raise ``bands`` (more, shorter bands) to buy recall with
    candidate mass at low thresholds.

    Sizing at scale (measured, tools/stress.py banded): with a FIXED
    band config, bucket occupancy grows ~n/2^bits, so BOTH knobs must
    scale with the corpus — ``bits_per_band`` so buckets stay sparse
    (the candidate join is sum-of-occupancy², and recall at
    production thresholds survives longer bands), and ``bucket_cap``
    which guards DEGENERATE buckets, not typical mass: at 10x this
    corpus the default cap starts dropping ordinary buckets and C147
    reports the recall hit — set cap to a few × the expected
    n/(bands·2^bits) occupancy and let the skew audit (C136's
    counterpart maths) justify it.

    Plan/scale: O(n) signatures, one equi-join on (band_id,
    band_val) bounded per bucket by ``bucket_cap``, verification
    sized by the CANDIDATE set — never an all-pairs stage (C133's
    exact-audit contract is the n² twin this replaces at scale).
    """
    from pyspark.sql import Window

    from ..functions.vectors import dot

    # pin the signature table ONCE: it feeds both sides of the
    # candidate self-join and both vector rejoins — without the pin
    # the Arrow signature pass re-runs per branch
    sig = _signature_frame(
        _corpus(spark, sf_dir).select("vec_id", "vec"), n_planes, bands, dim
    ).localCheckpoint(eager=False)
    posts = sig.select("vec_id", F.posexplode("bvals").alias("band_id", "band_val"))
    if bucket_cap > 0:
        wb = Window.partitionBy("band_id", "band_val")
        posts = (
            posts.withColumn("_n", F.count(F.lit(1)).over(wb))
            .filter(F.col("_n") <= bucket_cap)
            .drop("_n")
        )
    a, b = posts.alias("a"), posts.alias("b")
    # candidate dedup on BARE IDS; vectors rejoin after the distinct
    # (the C92 shuffle-bytes lesson)
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = sig.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na")
    )
    vb = sig.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            r6(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_dup_clusters_banded(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    n_planes: int = 48,
    bands: int = 8,
    dim: int = 64,
    bucket_cap: int = 2000,
    max_iter: int = 20,
) -> DataFrame:
    """C146 (r7, VERDICT r6 task 4): the 100-TB path for C133 —
    connected components over BANDED hyperplane-LSH candidate pairs
    (threshold-verified, cap-guarded; see ``banded_corpus_pairs``)
    instead of C6's all-pairs cosine output. The mirror of the
    ``dedup_ngram_jaccard`` (exact, df-capped) <->
    ``dedup_minhash_lsh`` (banded) pairing on the embedding side:
    C133 stays the exact audit, this is the production operator whose
    candidate stage never scores n² pairs; the pair-level loss is
    measured, not asserted (``banded_neardup_recall``, C147).

    Reuses the shared ``components_from_pairs`` min-label propagation
    (diameter-bounded, localCheckpoint per round). Because banding
    drops pairs, banded clusters can SPLIT relative to C133's exact
    clusters — never merge ones exact clustering keeps apart (banded
    pairs are a subset), an ordering the cluster-count test asserts.
    """
    from .dedup import components_from_pairs

    pairs = banded_corpus_pairs(
        spark, sf_dir, threshold, n_planes, bands, dim, bucket_cap
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    return (
        components_from_pairs(pairs, max_iter=max_iter)
        .select(
            F.col("doc_id").cast("long").alias("vec_id"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
        )
        .orderBy("vec_id")
    )


def embedding_band_skew_audit(
    spark: SparkSession,
    sf_dir: str,
    n_planes: int = 48,
    bands: int = 8,
    dim: int = 64,
    bucket_cap: int = 2000,
) -> DataFrame:
    """C148 (r7): embedding band-bucket skew audit — C136's pricing
    mart mirrored onto the hyperplane bands: the candidate equi-join
    of `embedding_dup_clusters_banded` costs sum over buckets of
    c*(c-1)/2, and a sign-space hot spot (embeddings are NOT uniform
    on the sphere — clustered corpora concentrate in few orthants)
    can make one bucket quadratic. This mart prices the join BEFORE
    running it: per band, bucket-count/size extremes, the exact pair
    count the uncapped join would produce, the pair count surviving
    ``bucket_cap``, and the postings the cap would drop — the sizing
    table the C146 docstring's cap/bits-per-band guidance reads (the
    r7 10x stress decomposition was exactly this computation done by
    hand; now it's a mart).

    Exact BIGINTs over bucket-grain counts (c*(c-1) is even — DIV 2
    exact). Reuses the shared ``embedding_band_postings`` stage
    verbatim, so the audit measures the exact postings the candidate
    join (and the D35-maintained index) would see.

    Plan/scale: signatures are O(n); aggregation at (band_id,
    band_val) grain then band grain — buckets, never vectors, cross
    the second shuffle.
    """
    posts = embedding_band_postings(
        load_table(spark, sf_dir, "embeddings"), n_planes, bands, dim
    )
    buckets = posts.groupBy("band_id", "band_val").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        buckets.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("c").cast("long").alias("n_postings"),
            F.max("c").cast("long").alias("max_bucket"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_singleton"),
            F.sum(F.when(F.col("c") > bucket_cap, 1).otherwise(0))
            .cast("long")
            .alias("n_over_cap"),
            F.sum(F.when(F.col("c") > bucket_cap, F.col("c")).otherwise(0))
            .cast("long")
            .alias("postings_dropped"),
            F.sum(F.expr("c * (c - 1) DIV 2")).cast("long").alias("pairs_uncapped"),
            F.sum(
                F.when(
                    F.col("c") <= bucket_cap, F.expr("c * (c - 1) DIV 2")
                ).otherwise(0)
            )
            .cast("long")
            .alias("pairs_after_cap"),
        )
        .orderBy("band_id")
    )


def banded_neardup_recall(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.4,
    n_planes: int = 48,
    bands: int = 8,
    dim: int = 64,
    bucket_cap: int = 2000,
) -> DataFrame:
    """C147 (r7, VERDICT r6 task 4): recall-vs-exact audit for the
    banded embedding pair stage — the embedding-side twin of
    ``lsh_recall_vs_exact`` (C90): compare ``banded_corpus_pairs``
    against C6's exact all-pairs ground truth at the same threshold.
    Banded pairs are verified with the SAME cosine spelling C6's tile
    kernel computes (sequential fold, dot/(na*nb), 6dp — unified per
    ADVICE r7), so they are a bit-for-bit subset of the exact pairs
    (precision 1 — the in-operator left join doubles as the subset
    proof since n_caught == n_banded_pairs exactly, now an IEEE
    identity rather than an empirical one); the number that silently degrades
    with band configuration and bucket caps is RECALL, reported in
    exact ppm. The exact side is the audit's documented cost (C6's n²
    contract) — run it at audit cadence, not per batch.
    """
    from ..functions.exact import ppm_expr as _ppm

    banded = banded_corpus_pairs(
        spark, sf_dir, threshold, n_planes, bands, dim, bucket_cap
    ).select("id_a", "id_b")
    exact = neardup_embedding_cosine(spark, sf_dir, threshold).select("id_a", "id_b")
    hit = banded.withColumn("hit", F.lit(1))
    joined = exact.join(hit, ["id_a", "id_b"], "left")
    n_banded = banded.agg(F.count(F.lit(1)).alias("n_banded"))
    return (
        joined.agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_caught"),
        )
        .crossJoin(F.broadcast(n_banded))
        .select(
            F.col("n_exact").cast("long").alias("n_exact_pairs"),
            F.col("n_banded").cast("long").alias("n_banded_pairs"),
            F.col("n_caught").cast("long").alias("n_caught"),
            F.when(
                F.col("n_exact") > 0, F.expr(_ppm("n_caught", "n_exact"))
            )
            .otherwise(F.lit(None))
            .cast("long")
            .alias("recall_ppm"),
        )
    )


def embedding_decontaminate(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.3,
    n_planes: int = 48,
    bands: int = 12,
    dim: int = 64,
) -> DataFrame:
    """SEMANTIC decontamination — the embedding-space member of the
    decontaminate family (ngram -> bloom -> span -> semantic): flag
    every TRAIN-split vector whose cosine to ANY TEST-split vector
    reaches ``threshold``, the cross-split twin of semdedup that
    catches paraphrased benchmark leakage exact n-gram matching
    misses.

    Split assignment is the deterministic ``holdout_split`` md5
    idiom on vec_id (bucket < 100 of 1000 => 10% test). Candidates
    come from BANDED random-hyperplane signatures — ``bands`` bands
    of ``n_planes/bands`` sign bits each (the OR-construction of
    ``dedup_minhash_lsh``, here over hyperplane bits): a pair is a
    candidate iff some band matches exactly. With the 12x4 default,
    a pair at cosine 0.3 collides with probability ~0.81 and at the
    realistic paraphrase range (>= 0.8) with ~1 - 1e-4, while
    random orthogonal pairs only pass a band at 2^-4 — raise the
    per-band bit count to prune harder at high thresholds. Never an
    all-pairs join; cosines are rounded to 6dp BEFORE the threshold
    compare on both engines (the neardup_embedding_cosine
    discipline). Approximate by construction (banding recall < 1) —
    the oracle implements the identical banding, so the parity
    check is still exact.

    Output: one row per contaminated train vector —
    (train_vec_id, n_test_matches, max_cos).
    """
    assert n_planes % bands == 0
    corpus = _corpus(spark, sf_dir)
    split_bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("#split"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )

    from ..functions.vectors import dot

    # signature stage is the shared Arrow pass (VERDICT r7 task 2:
    # this was the family's LAST interpreted Catalyst _band_keys/norm
    # fold, ~half the operator's cost at sf0.1). _signature_frame is
    # proven bit-identical to that fold — norms folded once per
    # vector, banding and oracle parity unchanged. Pinned ONCE: it
    # feeds the posting join and both vector rejoins, and without
    # the pin the Arrow pass re-runs per branch (the
    # banded_corpus_pairs discipline).
    sigd = (
        _signature_frame(corpus.select("vec_id", "vec"), n_planes, bands, dim)
        .withColumn("sb", split_bucket)
        .localCheckpoint(eager=False)
    )
    posts = sigd.select(
        "vec_id", "sb", F.posexplode("bvals").alias("band_id", "band_val")
    )
    # candidate pairs dedup on BARE IDS — dragging the two 64-double
    # payload arrays through the distinct shuffle multiplied shuffle
    # bytes ~60x (measured: the payload-carrying form dominated the
    # operator); vectors rejoin AFTER the distinct, keyed by id
    cand = (
        posts.filter(F.col("sb") >= 100)
        .select("vec_id", "band_id", "band_val")
        .join(
            posts.filter(F.col("sb") < 100).select(
                F.col("vec_id").alias("t_id"), "band_id", "band_val"
            ),
            ["band_id", "band_val"],
        )
        .select("vec_id", "t_id")
        .dropDuplicates(["vec_id", "t_id"])
    )
    tr_vec = sigd.filter(F.col("sb") >= 100).select("vec_id", "vec", "nrm")
    te_vec = sigd.filter(F.col("sb") < 100).select(
        F.col("vec_id").alias("t_id"),
        F.col("vec").alias("t_vec"),
        F.col("nrm").alias("t_nrm"),
    )
    # scoring stays a Catalyst LEFT-FOLD dot product: numpy einsum's
    # pairwise summation diverges from DuckDB's sequential
    # list_dot_product at the ulp level in most 64-dim dots (measured
    # ~83%), reintroducing the round(x,6) engine-flip class this
    # round eliminates; the fold order matches list_dot_product
    # term-for-term (the whole r6(cosine()) family's parity proof).
    # No broadcast hint on the test side — it is 10% of the CORPUS,
    # unbounded at scale (AQE upgrades small cases at runtime).
    scored = (
        cand.join(tr_vec, "vec_id")
        .join(te_vec, "t_id")
        .select(
            "vec_id",
            "t_id",
            r6(
                dot(F.col("vec"), F.col("t_vec")) / (F.col("nrm") * F.col("t_nrm"))
            ).alias("cos_sim"),
        )
    )
    return (
        scored.filter(F.col("cos_sim") >= threshold)
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test_matches"),
            F.max("cos_sim").alias("max_cos"),
        )
        .select(F.col("vec_id").alias("train_vec_id"), "n_test_matches", "max_cos")
    )


def embedding_sim_histogram(
    spark: SparkSession, sf_dir: str, sample_pct: int = 20, n_blocks: int = 4
) -> DataFrame:
    """C116 (r5): histogram of pairwise cosine similarities over an
    md5-deterministic sample of the embedding store — the THRESHOLD-
    PICKING readout the semdedup / neardup / decontamination family
    needs before anyone chooses 0.4 vs 0.8: where does the corpus's
    similarity mass actually sit? One row per 0.1-wide band.

    Parity design — the reason this histogram can be hash-checked at
    all: vectors are first FROZEN to integer e6 components (round(x *
    1e6)), so every dot product and norm is a sum of integer-valued
    float64 terms <= 6.4e13 << 2^53 — EXACT in both engines
    regardless of summation order (the ulp-drift class that forces
    neardup's 6dp rounding cannot occur). The band index is then one
    identical floor((dot/(sqrt(na)*sqrt(nb)))*10) tree, clipped to
    [-10, 9].

    Scale: sample is the cost contract (pairs = (pct*n/100)^2 / 2 —
    the lsh_recall_vs_exact discipline); the triangle block-pair
    applyInPandas from neardup_embedding_cosine distributes the
    matmul with O(1) driver memory, and each task RETURNS only band
    counts, never pairs.
    """
    corpus = _corpus(spark, sf_dir).select("vec_id", "vec")
    keep = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("#simhist"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
        < sample_pct
    )
    q = F.transform(F.col("vec"), lambda x: F.round(x * 1_000_000.0))
    sampled = corpus.filter(keep).select("vec_id", q.alias("vec"))
    blk = F.pmod(F.col("vec_id"), F.lit(n_blocks))
    pair_keys = F.array(
        *[
            F.struct(
                F.least(blk, F.lit(j)).alias("bi"), F.greatest(blk, F.lit(j)).alias("bj")
            )
            for j in range(n_blocks)
        ]
    )
    exploded = (
        sampled.withColumn("blk", blk)
        .withColumn("pk", F.explode(pair_keys))
        .select(F.col("pk.bi").alias("bi"), F.col("pk.bj").alias("bj"), "blk", "vec_id", "vec")
    )

    def block_pair_bands(key, pdf):
        # self-contained closure (foreign-cwd driver safe)
        import numpy as np
        import pandas as pd

        bi, bj = key
        a_side = pdf[pdf["blk"] == bi]
        b_side = pdf[pdf["blk"] == bj]
        empty = pd.DataFrame(
            {"band": pd.Series(dtype="int32"), "n": pd.Series(dtype="int64")}
        )
        if len(a_side) == 0 or len(b_side) == 0:
            return empty
        ids_a = a_side["vec_id"].to_numpy()
        ids_b = b_side["vec_id"].to_numpy()
        Ma = np.stack(a_side["vec"].to_numpy()).astype(np.float64)
        Mb = np.stack(b_side["vec"].to_numpy()).astype(np.float64)
        # integer-valued float64 everywhere: sums are exact, order-free
        na = np.sqrt((Ma * Ma).sum(axis=1))
        nb = np.sqrt((Mb * Mb).sum(axis=1))
        S = (Ma @ Mb.T) / (na[:, None] * nb[None, :])
        B = np.clip(np.floor(S * 10.0), -10, 9).astype(np.int32)
        if bi == bj:
            mask = ids_a[:, None] < ids_b[None, :]
        else:
            mask = np.ones_like(B, dtype=bool)
        bands, counts = np.unique(B[mask], return_counts=True)
        return pd.DataFrame({"band": bands, "n": counts.astype("int64")})

    counts = (
        exploded.groupBy("bi", "bj")
        .applyInPandas(block_pair_bands, schema="band int, n long")
        .groupBy("band")
        .agg(F.sum("n").alias("n_pairs"))
    )
    total = counts.agg(F.sum("n_pairs").alias("n_total"))
    from ..functions.exact import ppm_expr as _ppm

    return (
        counts.join(F.broadcast(total))
        .selectExpr(
            "CAST(band AS INT) AS band",
            "CAST(n_pairs AS BIGINT) AS n_pairs",
            f"CAST({_ppm('n_pairs', 'n_total')} AS BIGINT) AS share_ppm",
        )
        .orderBy("band")
    )


def ivf_nprobe_recall_curve(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    probes: tuple = (1, 2, 4, 8),
    train_iters: int = 2,
) -> DataFrame:
    """C119 (r5): the IVF recall-vs-cost CURVE — recall@k and
    candidates-scored for each n_probe setting, the table that picks
    the probe count for a 100 TB ANN serving tier (more probes = more
    lists scanned = higher recall at linear extra cost). Completes
    the index-tuning family: minhash_band_tuning maps the LSH config
    space, this maps the IVF one.

    One brute-force ground truth (the expensive side, computed ONCE),
    one corpus cell assignment per geometry; each probe setting
    re-probes the same cells and counts exact hits. The cost column
    is the exact candidate count: sum of probed-cell sizes minus the
    query itself (a query's rank-1 probe is always its own cell —
    true under ANY centroid set, since query and corpus share the
    assignment rule). Recall in exact ppm of n_queries*k.

    Trained-vs-baseline comparison (VERDICT r9 task 3 + stretch 8):
    the ``centroids`` label distinguishes 'first_k' rows (the
    untrained first-k-vectors geometry) from 'trained' rows (the
    deterministic ``ivf_trained_centroids`` k-means geometry,
    ``train_iters`` Lloyd rounds — C33's unrolled-iteration oracle
    pattern keeps it SQL-reproducible). Same truth, same probe
    counts, so each (n_probe, recall, candidates) pair prices what
    training the coarse quantizer buys the serving tier.
    """
    from ..functions.exact import ppm_expr as _ppm
    from .clustering import ivf_trained_centroids

    truth = ann_bruteforce_topk(spark, sf_dir, n_queries, k).localCheckpoint(
        eager=False
    )
    corpus = _corpus(spark, sf_dir)
    first_k = corpus.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")
    )
    trained = ivf_trained_centroids(
        spark, sf_dir, k=n_centroids, n_iter=train_iters
    ).localCheckpoint(eager=False)
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )

    out = None
    for label, cents in (("first_k", first_k), ("trained", trained)):

        def assign(df, id_col, vec_col, keep_rank, cents=cents):
            # narrow packed-centroid assignment (see _packed_cell_assign)
            return _packed_cell_assign(df, id_col, vec_col, cents, keep_rank)

        cells = assign(corpus, "vec_id", "vec", 1).localCheckpoint(eager=False)
        cell_sizes = (
            cells.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("sz"))
            .localCheckpoint(eager=False)
        )
        q_probes = assign(queries, "q_id", "q_vec", max(probes)).localCheckpoint(
            eager=False
        )
        # score candidates ONCE at the max probe setting, tagged with
        # the probe rank of their cell; every n_probe's top-k then
        # comes from ONE probe-exploded window over the same scored
        # frame (r10 second pass: the per-probe python loop built 8
        # separate window+semi-join+agg branches per geometry — 128
        # Exchanges across the union; exploding n_probe as a COLUMN
        # collapses them to one window, one hits join and one
        # candidate-count aggregate per geometry). Scoring is
        # ann_ivf_topk's verbatim algebra (r6 cosine, (cos DESC,
        # vec_id ASC) top-k) and rank is computed per (q_id, n_probe)
        # partition, so the per-probe rows are unchanged.
        from pyspark.sql import Window

        cand_all = (
            corpus.join(cells.select("vec_id", "cell"), "vec_id")
            .join(F.broadcast(q_probes), "cell")
            .join(F.broadcast(queries), "q_id")
            .filter(F.col("vec_id") != F.col("q_id"))
            .select(
                "q_id",
                "vec_id",
                "crank",
                r6(cosine(F.col("q_vec"), F.col("vec"))).alias("cos_sim"),
            )
            .localCheckpoint(eager=False)
        )
        probe_col = F.explode(
            F.array(*[F.lit(int(p)).cast("int") for p in probes])
        ).alias("n_probe")
        wk = Window.partitionBy("q_id", "n_probe").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id").asc()
        )
        approx_k = (
            cand_all.select("q_id", "vec_id", "crank", "cos_sim", probe_col)
            .filter(F.col("crank") <= F.col("n_probe"))
            .withColumn("rank", F.row_number().over(wk))
            .filter(F.col("rank") <= k)
            .select("n_probe", "q_id", F.col("vec_id").alias("neighbor_id"))
        )
        hits = (
            truth.join(approx_k, ["q_id", "neighbor_id"])
            .groupBy("n_probe")
            .agg(F.count(F.lit(1)).alias("n_hits"))
        )
        cand = (
            q_probes.select("cell", "crank", probe_col)
            .filter(F.col("crank") <= F.col("n_probe"))
            .join(cell_sizes, "cell")
            .groupBy("n_probe")
            .agg((F.sum("sz") - F.lit(n_queries)).alias("n_candidates"))
        )
        rows = (
            cand.join(hits, "n_probe", "left")
            .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
            .selectExpr(
                f"'{label}' AS centroids",
                "CAST(n_probe AS INT) AS n_probe",
                "CAST(n_candidates AS BIGINT) AS n_candidates",
                "CAST(n_hits AS BIGINT) AS n_hits",
                f"CAST({_ppm('n_hits', str(n_queries * k))} AS BIGINT) AS recall_ppm",
            )
        )
        out = rows if out is None else out.unionByName(rows)
    return out.orderBy("centroids", "n_probe")


def mmr_diverse_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 8,
    pool: int = 16,
    k: int = 3,
) -> DataFrame:
    """C121 (r5): Maximal-Marginal-Relevance diversified top-k
    (Carbonell & Goldstein 1998, public) — the retrieval re-ranker a
    training-data pipeline uses to pick DIVERSE exemplars (eval-set
    seeding, dedup-aware few-shot selection) instead of k near-copies
    of the best hit: greedily select k candidates maximizing
    ``0.7 * rel(q, c) - 0.3 * max_sim(c, selected)``.

    Parity design: vectors are FROZEN to integer e6 components first
    (the `embedding_sim_histogram` discipline), so every dot product
    and squared norm is an exact integer-valued float64 on both
    engines; cosine and the MMR score then go through one identical
    operation tree (`(7.0*rel - 3.0*max_sim) / 10.0` — correctly
    rounded IEEE ops on identical inputs are bit-identical), and every
    argmax tie-breaks on candidate id. That makes a greedy SELECTION
    hash-checkable — rounding output floats could never fix a flipped
    pick.

    Plan/scale: the candidate pool is the brute-force scorer with the
    map-side `_partial_topk` bound (per-task survivors <= pool x
    n_partitions per query, never the corpus); the greedy stage is k-1
    unrolled join+aggregate+window steps over the bounded pool
    (pool^2 pairwise sims per query, a constant), all per-query
    parallel — no driver loop over data, no UDF. At 100 TB swap the
    pool stage for the LSH/IVF candidate path; the greedy tail is
    grain-bounded either way.
    """
    from pyspark.sql import Window

    from ..functions.vectors import dot

    corpus = _corpus(spark, sf_dir).select(
        "vec_id",
        F.transform("vec", lambda x: F.round(x * 1_000_000.0)).alias("v"),
    )
    nrm = dot(F.col("v"), F.col("v"))
    frozen = corpus.select("vec_id", "v", nrm.alias("n2"))
    queries = frozen.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_vec"),
        F.col("n2").alias("q_n2"),
    )
    rel = dot(F.col("q_vec"), F.col("v")) / (F.sqrt("q_n2") * F.sqrt("n2"))
    scored = frozen.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id")).select(
        "q_id", F.col("vec_id").alias("c_id"), rel.alias("rel"), "v", "n2"
    )
    pooled = _partial_topk(scored, ["q_id"], "rel", "c_id", pool)
    w_pool = Window.partitionBy("q_id").orderBy(F.col("rel").desc(), F.col("c_id").asc())
    pooled = (
        pooled.withColumn("prank", F.row_number().over(w_pool))
        .filter(F.col("prank") <= pool)
        .drop("prank")
        .localCheckpoint(eager=False)  # pin: reused by k-1 greedy steps + sims
    )
    a, b = pooled.alias("a"), pooled.alias("b")
    sim = dot(F.col("a.v"), F.col("b.v")) / (F.sqrt("a.n2") * F.sqrt("b.n2"))
    sims = (
        a.join(
            b,
            (F.col("a.q_id") == F.col("b.q_id")) & (F.col("a.c_id") != F.col("b.c_id")),
        )
        .select(
            F.col("a.q_id").alias("q_id"),
            F.col("a.c_id").alias("a_id"),
            F.col("b.c_id").alias("b_id"),
            sim.alias("sim"),
        )
        .localCheckpoint(eager=False)
    )
    cands = pooled.select("q_id", "c_id", "rel")
    w_pick = Window.partitionBy("q_id").orderBy(F.col("mmr").desc(), F.col("c_id").asc())
    picked = (
        cands.withColumn("mmr", F.expr("(7.0 * rel - 3.0 * 0.0) / 10.0"))
        .withColumn("prk", F.row_number().over(w_pick))
        .filter(F.col("prk") == 1)
        .select("q_id", "c_id", "rel", "mmr", F.lit(1).alias("rank"))
    )
    for step in range(2, k + 1):
        sel = picked.select("q_id", F.col("c_id").alias("b_id"))
        max_sim = (
            sims.join(sel, ["q_id", "b_id"])
            .groupBy("q_id", F.col("a_id").alias("c_id"))
            .agg(F.max("sim").alias("max_sim"))
        )
        nxt = (
            cands.join(picked.select("q_id", "c_id"), ["q_id", "c_id"], "left_anti")
            .join(max_sim, ["q_id", "c_id"])
            .withColumn("mmr", F.expr("(7.0 * rel - 3.0 * max_sim) / 10.0"))
            .withColumn("prk", F.row_number().over(w_pick))
            .filter(F.col("prk") == 1)
            .select("q_id", "c_id", "rel", "mmr", F.lit(step).alias("rank"))
        )
        picked = picked.unionByName(nxt)
    return picked.select(
        "q_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("c_id").alias("selected_id"),
        r6(F.col("rel")).alias("rel"),
        r6(F.col("mmr")).alias("mmr"),
    ).orderBy("q_id", "rank")


def ndcg_discounts_e6(k: int) -> list[int]:
    """Pinned e6 DCG discount literals floor(1e6 / log2(i + 1)) for
    ranks 1..k — precomputed once in Python (the HLL_LC_TABLE
    discipline) so neither engine evaluates a transcendental at
    runtime; the table is part of the operator contract."""
    import math

    return [int(1_000_000 / math.log2(i + 1)) for i in range(1, k + 1)]


def ann_ndcg_at_k(
    spark: SparkSession, sf_dir: str, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """C124 (r5): nDCG@k of BOTH approximate ANN tiers (LSH, IVF)
    against the brute-force ground truth — the position-weighted
    complement of the recall family: recall@k says how many true
    neighbors an index returns; nDCG says whether it returns the
    BEST ones FIRST (graded gain k+1-truth_rank, rank-discounted),
    which is what an ANN serving tier is actually judged on.

    Exact integers end to end: gains are integers, discounts are the
    pinned `ndcg_discounts_e6` literals, DCG_e6 = sum(gain * disc)
    BIGINT, the ideal DCG is a compile-time constant, ndcg in exact
    ppm. No runtime log2 on either engine.

    Plan/scale: all three result sets are the existing top-k
    operators (each already map-side-bounded); the scoring joins are
    on k-row-per-query sets — grain-bounded regardless of corpus
    size.
    """
    from ..functions.exact import ppm_expr

    disc = ndcg_discounts_e6(k)
    idcg_e6 = sum((k - i) * disc[i] for i in range(k))
    disc_case = "CASE rank " + " ".join(
        f"WHEN {i + 1} THEN {d}" for i, d in enumerate(disc)
    ) + " ELSE 0 END"
    truth = ann_bruteforce_topk(spark, sf_dir, n_queries, k).select(
        "q_id", "neighbor_id", F.col("rank").alias("truth_rank")
    ).localCheckpoint(eager=False)  # pin: scored against both tiers
    base = truth.select("q_id").distinct()
    out = None
    for method, approx in (
        ("ivf", ann_ivf_topk(spark, sf_dir, n_queries, k)),
        ("lsh", ann_lsh_topk(spark, sf_dir, n_queries, k)),
    ):
        scored = (
            approx.join(truth, ["q_id", "neighbor_id"], "left")
            .selectExpr(
                "q_id",
                f"coalesce({k} + 1 - truth_rank, 0) AS gain",
                f"{disc_case} AS disc_e6",
            )
            .groupBy("q_id")
            .agg(
                F.sum(F.when(F.col("gain") > 0, 1).otherwise(0)).alias("n_hits"),
                F.sum(F.expr("CAST(gain AS BIGINT) * disc_e6")).alias("dcg_e6"),
            )
        )
        row = base.join(scored, "q_id", "left").selectExpr(
            f"'{method}' AS method",
            "q_id",
            "CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits",
            "CAST(coalesce(dcg_e6, 0) AS BIGINT) AS dcg_e6",
            f"CAST({ppm_expr('coalesce(dcg_e6, 0)', str(idcg_e6))} AS BIGINT)"
            " AS ndcg_ppm",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("method", "q_id")


def embedding_dup_clusters(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4, max_iter: int = 20
) -> DataFrame:
    """C133 (r5): connected components over the embedding-cosine
    near-dup pairs — the SEMANTIC twin of `dedup_clusters` (C5): C6
    lists pairs, this rolls them into "which vectors are the same
    content" clusters (cluster_id = min reachable vec_id), the form a
    keep-one policy or a cluster-aware holdout consumes. Closes the
    pairs -> clusters gap on the embedding side that the shingle side
    already had.

    Reuses the shared `components_from_pairs` min-label propagation
    (bounded by cluster diameter, localCheckpoint per round) over the
    C6 triangle block-pair join — no driver collect anywhere; the
    pair stage's n-squared scoring is C6's documented exact-audit
    contract, the scale path being LSH-bucketed candidates.
    """
    from .dedup import components_from_pairs

    pairs = neardup_embedding_cosine(spark, sf_dir, threshold).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    return (
        components_from_pairs(pairs, max_iter=max_iter)
        .select(
            F.col("doc_id").cast("long").alias("vec_id"),
            F.col("cluster_id").cast("long").alias("cluster_id"),
        )
        .orderBy("vec_id")
    )


def ann_mrr_at_k(
    spark: SparkSession, sf_dir: str, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """C140 (r6): MRR@k of both approximate ANN tiers (LSH, IVF)
    against brute-force truth — the third standard retrieval metric
    beside recall@k (C26/C58, "how many true neighbors") and nDCG@k
    (C124, "are the best ones first"): reciprocal rank of the FIRST
    true neighbor, the single-answer latency-to-relevance number a
    retrieval-augmented pipeline quotes (if the first hit is at rank
    3, the user/LLM reads two wrong neighbors first).

    Exact integers: rr_e6 = 1e6 DIV first_hit_rank (0 when the tier
    returns no true neighbor in its top k) — quantized reciprocal,
    no float division, hash-exact. first_hit_rank rides along so the
    quantization is auditable.

    Plan/scale: truth computed ONCE (localCheckpoint pin) and scored
    against both tiers (the C124 discipline); all joins are on
    k-rows-per-query sets — grain-bounded regardless of corpus size.
    """
    truth = (
        ann_bruteforce_topk(spark, sf_dir, n_queries, k)
        .select("q_id", "neighbor_id")
        .localCheckpoint(eager=False)
    )
    base = truth.select("q_id").distinct()
    out = None
    for method, approx in (
        ("ivf", ann_ivf_topk(spark, sf_dir, n_queries, k)),
        ("lsh", ann_lsh_topk(spark, sf_dir, n_queries, k)),
    ):
        first = (
            approx.join(truth, ["q_id", "neighbor_id"])
            .groupBy("q_id")
            .agg(F.min("rank").cast("long").alias("first_hit_rank"))
        )
        row = base.join(first, "q_id", "left").selectExpr(
            f"'{method}' AS method",
            "q_id",
            "CAST(coalesce(first_hit_rank, 0) AS BIGINT) AS first_hit_rank",
            "CAST(CASE WHEN first_hit_rank IS NOT NULL"
            " THEN 1000000 DIV first_hit_rank ELSE 0 END AS BIGINT) AS rr_e6",
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("method", "q_id")


def ann_ivf_pq_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_sub: int = 4,
    codes_per_sub: int = 16,
    centroids: DataFrame | None = None,
    pq_codebook: DataFrame | None = None,
    train_pq: int = 0,
) -> DataFrame:
    """C149 (r9): IVF + PQ combined — the production ANN index shape
    (Jegou et al.'s IVFADC): coarse inverted lists bound WHICH vectors
    a query scores (C9's cell/probe assignment, verbatim semantics),
    and product-quantization ADC bounds WHAT is read per candidate
    (C130's LUT algebra: the query stays full precision, a database
    vector is its ``n_sub`` small codes, distance = sum of
    precomputed query-to-codeword integer distances). Neither tier
    alone is the 100-TB design: IVF without PQ still reads full
    vectors for every candidate; PQ without IVF still scans every
    code row per query. Together the per-query cost is
    O(|probed cells| x n_sub) LUT lookups over integer codes.

    Determinism/oracle: cell assignment uses the proven 6dp-rounded
    cosine argmax with centroid-id ties (C9); everything PQ-side is
    e6-frozen BIGINT (md5 bottom-k codebooks, exact squared
    distances, (d2, code) / (adc_d2, vec_id) tiebreaks — C129/C130),
    so the output is hash-exact across engines. Assignment code is
    deliberately self-contained rather than shared with C9: C9 is
    driver-green and the edited-key CI gate makes churning it cost a
    budget slot.

    Trained hooks (VERDICT r9 task 3): pass ``centroids`` (c_id,
    c_vec — e.g. ``clustering.ivf_trained_centroids``) to swap the
    coarse geometry, ``pq_codebook`` (c_sub, code, cv) to swap the
    fine codebook, or ``train_pq=N`` to refine the md5 baseline
    codebook with N Lloyd subspace iterations in place
    (``_pq_trained_cb``). Defaults keep the registry behavior:
    first-k cells, md5 bottom-k codes.

    Output per (q_id, rank): neighbor_id and its BIGINT ADC distance.
    """
    from pyspark.sql import Window

    from .scale import partial_topk
    from .vectors2 import _pq_codes, _pq_d2, _pq_frames, _pq_trained_cb

    corpus = _corpus(spark, sf_dir)
    cents = (
        centroids
        if centroids is not None
        else corpus.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")
        )
    )

    def assign(df, id_col, vec_col, keep_rank):
        # narrow packed-centroid assignment (see _packed_cell_assign)
        return _packed_cell_assign(df, id_col, vec_col, cents, keep_rank).select(
            id_col, "cell"
        )

    cells = assign(corpus, "vec_id", "vec", 1)
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    probes = assign(queries, "q_id", "q_vec", n_probe)
    # a vector lives in exactly one cell and a query's probe cells are
    # distinct, so (q_id, vec_id) is unique without a dropDuplicates
    cand = (
        cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )

    tall, codebook = _pq_frames(spark, sf_dir, n_sub, codes_per_sub)
    if pq_codebook is not None:
        codebook = pq_codebook
    elif train_pq > 0:
        codebook = _pq_trained_cb(tall, codebook, n_iter=train_pq, dim_per=64 // n_sub)
    codes = _pq_codes(tall, codebook).select("vec_id", "sub", "code")
    q_tall = tall.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("sub").alias("q_sub"),
        F.col("sv").alias("qv"),
    )
    lut = q_tall.join(
        F.broadcast(codebook), F.col("q_sub") == F.col("c_sub")
    ).select(
        "q_id",
        F.col("q_sub").alias("sub"),
        "code",
        _pq_d2("qv", "cv").alias("lut_d2"),
    )
    adc = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["q_id", "sub", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("lut_d2").cast("long").alias("adc_d2"))
    )
    adc_top = partial_topk(adc, ["q_id"], "adc_d2", "vec_id", k, ascending=True)
    w = Window.partitionBy("q_id").orderBy(
        F.col("adc_d2").asc(), F.col("vec_id").asc()
    )
    return (
        adc_top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
            "adc_d2",
        )
    )


def ann_filtered_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 3,
) -> DataFrame:
    """C151 (r10): FILTERED vector search — top-k under a metadata
    predicate (neighbors must share the query's ``label``), the
    production problem every serving ANN index eventually hits
    (multi-tenant isolation, language/split/freshness constraints).

    Strategy is PRE-filtering: the predicate is evaluated against the
    index's METADATA rows (vec_id, label, cell) during candidate
    generation, BEFORE any full vector is read or any distance is
    computed — the survivors alone fetch vectors for exact scoring.
    The alternative (POST-filtering: take the unfiltered top-k, then
    drop non-matching rows) silently returns fewer than k — or zero —
    results whenever the filter is selective, because the k slots are
    spent on vectors the predicate then discards; the wave test pins
    the dominance (post-filter survivors are always a subset of this
    operator's result set on the same probed cells). ``n_probe``
    defaults one cell higher than C9's unfiltered default — probing
    wider is the standard compensation for filter selectivity
    shrinking each cell's eligible population.

    At 100 TB the metadata join is the index's own columns (label
    rides in the posting list / is a partition column), so the
    filter prunes postings before the vector fetch — never a scan of
    the vector payload. Cosines are 6dp-rounded before ranking (the
    proven C9 discipline), ties break on vec_id: hash-exact across
    engines.

    Output per (q_id, rank): neighbor_id, cos_sim, and the shared
    label for audit.
    """
    from pyspark.sql import Window

    from .scale import partial_topk

    corpus = _corpus(spark, sf_dir)
    cents = corpus.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")
    )

    def assign(df, id_col, vec_col, keep_rank):
        # narrow packed-centroid assignment (see _packed_cell_assign)
        return _packed_cell_assign(df, id_col, vec_col, cents, keep_rank).select(
            id_col, "cell"
        )

    # the index's metadata rows: (vec_id, label, cell) — no vectors
    meta = corpus.select("vec_id", "label").join(
        assign(corpus, "vec_id", "vec", 1), "vec_id"
    )
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    probes = assign(queries, "q_id", "q_vec", n_probe)
    # predicate pushed into candidate generation: probes x metadata
    # only — a vector lives in exactly one cell and probe cells are
    # distinct, so (q_id, vec_id) is unique without a dropDuplicates
    survivors = (
        meta.join(F.broadcast(probes), "cell")
        .join(
            F.broadcast(queries.select("q_id", "q_label")), "q_id"
        )
        .filter(
            (F.col("vec_id") != F.col("q_id"))
            & (F.col("label") == F.col("q_label"))
        )
        .select("q_id", "vec_id", "label")
    )
    # only survivors fetch vectors for exact scoring
    scored = (
        survivors.join(corpus.select("vec_id", "vec"), "vec_id")
        .join(F.broadcast(queries.select("q_id", "q_vec")), "q_id")
        .select(
            "q_id",
            "vec_id",
            r6(cosine(F.col("q_vec"), F.col("vec"))).alias("cos_sim"),
            "label",
        )
    )
    top = partial_topk(scored, ["q_id"], "cos_sim", "vec_id", k, ascending=False)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
            "cos_sim",
            "label",
        )
    )


def filtered_ann_recall_at_k(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_probe: int = 3,
) -> DataFrame:
    """C153 (r10): recall@k of the FILTERED search tier (C151's
    pre-filter IVF) against the exact FILTERED brute force — the
    quality loop the unfiltered tiers already have (C26/C58),
    extended to the constrained case, where recall is structurally
    harder: the true within-label top-k may live in cells the probe
    never visits, and post-filter designs can't even see the loss
    because they under-return instead. Both sides share C151's
    eligibility rule (same label, never self), so the measurement
    isolates PROBING loss, not predicate differences.

    Truth is one broadcast-queries pass over the corpus with the
    predicate applied before scoring (map-side ``partial_topk``
    bounds per-task memory, the C7 discipline); the join is on tiny
    top-k sets.
    """
    from pyspark.sql import Window

    from .scale import partial_topk

    corpus = _corpus(spark, sf_dir)
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("vec").alias("q_vec"),
        F.col("label").alias("q_label"),
    )
    scored = (
        corpus.join(
            F.broadcast(queries),
            (F.col("label") == F.col("q_label"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            "vec_id",
            r6(cosine(F.col("q_vec"), F.col("vec"))).alias("cos_sim"),
        )
    )
    top = partial_topk(scored, ["q_id"], "cos_sim", "vec_id", k, ascending=False)
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    truth = (
        top.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("neighbor_id"))
    )
    approx = ann_filtered_topk(spark, sf_dir, n_queries, k, n_probe=n_probe)
    hits = truth.join(approx, ["q_id", "neighbor_id"], "left_semi")
    per_q = hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hits"))
    base = truth.select("q_id").distinct()
    return base.join(per_q, "q_id", "left").select(
        "q_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        r6(F.coalesce("n_hits", F.lit(0)) / float(k)).alias("recall"),
    )
