"""Deduplication operators over the ``documents`` table.

Scale notes (100 TB corpus):
- exact: one shuffle on a 128-bit content hash — never on raw text.
- MinHash-LSH: O(n) signature computation (all JVM-side md5 — no
  Python), band-bucket equi-join produces candidates, exact Jaccard
  verification only on candidates. No O(n^2) stage.
- SimHash: 64-bit signatures, hamming-ball bucketing by block
  permutation.
- All determinstic (md5-based hashing) so the DuckDB oracle can
  reproduce results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import ppm_expr as _ppm
from ..sources.registry import load_table
from .relational import r6


def normalized_text(col=None):
    """Lowercase, collapse whitespace — shared normalization."""
    c = F.col("text") if col is None else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col=None):
    return F.split(normalized_text(col), " ")


def shingles(n: int = 3, col=None):
    """Word n-gram shingles as an array of strings (space-joined).

    NOTE: inlines the tokenizer into the transform lambda, so the
    regexp+split re-evaluates per array element (higher-order-function
    lambdas are interpreted — no codegen CSE). Use
    ``shingles_from(materialized_tokens_col, n)`` in any hot path.
    """
    return shingles_from(tokens(col), n)


def shingles_from(toks, n: int = 3):
    """Word n-gram shingles over an ALREADY-MATERIALIZED token-array
    column. slice+array_join per start offset touches only n tokens
    per element; with ``toks`` a plain column reference the tokenizer
    runs once per row instead of once per array element (~5x on the
    shingle pass). Short docs (< n tokens) yield one partial shingle,
    matching the try_element_at/concat_ws null-skipping semantics."""
    starts = F.sequence(F.lit(1), F.greatest(F.array_size(toks) - (n - 1), F.lit(1)))
    return F.transform(starts, lambda i: F.array_join(F.slice(toks, i, n), " "))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: keep min doc_id per content
    hash. Shuffles 32-hex-char hashes, not documents."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.withColumn("content_hash", F.md5(normalized_text().cast("binary")))
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Policy dedup: per normalized-content hash keep the HIGHEST
    quality document (ties on doc_id) instead of the min id — the
    keep-one policy real pipelines use once a quality score exists.
    One shuffle on the hash; the argmax is a window row_number, never
    a self-join back."""
    from pyspark.sql import Window

    from ..functions.textfns import quality_score
    from .relational import r6

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(normalized_text().cast("binary")).alias("content_hash"),
        r6(quality_score(F.col("text"))).alias("q"),
    )
    w = Window.partitionBy("content_hash").orderBy(F.col("q").desc(), F.col("doc_id").asc())
    return (
        d.withColumn("rn", F.row_number().over(w))
        .withColumn("dup_count", F.count(F.lit(1)).over(Window.partitionBy("content_hash")))
        .filter(F.col("rn") == 1)
        .select(
            "content_hash",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("q").alias("keep_quality"),
            F.col("dup_count").cast("long").alias("dup_count"),
        )
    )


def minhash_signature_from(sh: "F.Column", num_hashes: int):
    """MinHash signature over an ALREADY-MATERIALIZED shingle column,
    with ``num_hashes`` independent hash functions
    h_i(s) = md5(s || '#' || i).

    md5 gives uniformly distributed hex strings; taking the lexical
    MIN per seed is the classic MinHash estimator. Deterministic and
    reproducible in any engine with md5 — which is exactly what the
    correctness oracle needs. Taking a Column (not recomputing the
    shingles inline) matters: inlining would re-evaluate the whole
    tokenize+shingle expression tree once per hash function.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s: F.md5(F.concat(s, F.lit(f"#{i}")).cast("binary")))
            )
            for i in range(num_hashes)
        ]
    )


def band_postings(sig_df: DataFrame, num_hashes: int = 12, bands: int = 4) -> DataFrame:
    """(doc_id, band_id, band_key) LSH postings from a (doc_id, sig)
    table — the banding stage extracted so the batch candidate join
    and the streaming postings index (D24) emit bit-identical rows.
    The posting row is idempotent state: re-banding the same doc
    yields the same rows, so a union+dedup merge absorbs replay."""
    rows = num_hashes // bands
    return sig_df.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "|", *[F.element_at(F.col("sig"), b * rows + r + 1) for r in range(rows)]
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_key")


def lsh_postings(docs_df: DataFrame, num_hashes: int = 12, bands: int = 4) -> DataFrame:
    """Banded LSH postings straight from raw documents (tokenize ->
    shingle -> signature -> band) — the per-batch delta the streaming
    index maintainer (D24) folds; pre-cap by design (the bucket_cap
    skew guard is a QUERY-time policy applied by the prober, so one
    maintained index serves any cap setting)."""
    sigs = (
        docs_df.withColumn("_toks", tokens())
        .withColumn("sh", shingles_from(F.col("_toks"), 3))
        .select("doc_id", minhash_signature_from(F.col("sh"), num_hashes).alias("sig"))
    )
    return band_postings(sigs, num_hashes=num_hashes, bands=bands)


def minhash_candidates(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 12,
    bands: int = 4,
    bucket_cap: int = 200,
    docs: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Shared candidate stage of the MinHash-LSH family (extracted
    verbatim from ``dedup_minhash_lsh`` for reuse by the calibration
    audit): returns ``(with_sig, cand)`` — the persisted per-doc
    (doc_id, distinct shingles, signature) table and the distinct
    banded candidate pairs after the ``bucket_cap`` skew guard. See
    ``dedup_minhash_lsh`` for the stagewise scale argument.
    """
    from pyspark.sql import Window

    rows = num_hashes // bands
    base = docs if docs is not None else load_table(spark, sf_dir, "documents")
    docs = (
        base.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", tokens())
        .withColumn("sh", shingles_from(F.col("_toks"), 3))
    )
    with_sig = docs.select(
        "doc_id",
        F.array_distinct("sh").alias("shd"),
        minhash_signature_from(F.col("sh"), num_hashes).alias("sig"),
    ).persist()

    banded = band_postings(with_sig, num_hashes=num_hashes, bands=bands)
    if bucket_cap > 0:
        wb = Window.partitionBy("band_id", "band_key")
        banded = (
            banded.withColumn("_n", F.count(F.lit(1)).over(wb))
            .filter(F.col("_n") <= bucket_cap)
            .drop("_n")
        )

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    return with_sig, cand


def dedup_minhash_lsh(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 12,
    bands: int = 4,
    threshold: float = 0.5,
    bucket_cap: int = 200,
    docs: DataFrame | None = None,
) -> DataFrame:
    """MinHash + banded LSH near-duplicate pairs, verified by exact
    shingle Jaccard >= threshold. ``docs`` overrides the documents
    table (tests inject skewed corpora).

    Pipeline (each stage linear, no O(n^2)):
    1. one pass materializes shingles + signature per doc
       (repartitioned first: a single small parquet file would
       otherwise put the whole hash pass on one core — and at 100 TB
       the same repartition spreads skewed file splits);
    2. explode bands -> self-equi-join on (band_id, band_key)
       carrying ONLY doc ids (narrow shuffle rows — shingle arrays
       would multiply shuffle bytes by the band count);
    3. distinct candidate pairs join the shingle sets back for exact
       Jaccard verification on candidates only.

    Skew guard: a band bucket holding more than ``bucket_cap`` docs
    (degenerate boilerplate collapsing to one band key) would emit
    O(bucket²) candidate pairs; those buckets are DROPPED before the
    self-join. The bucket size is a window count partitioned by the
    SAME key the self-join shuffles on, so the cap rides the exchange
    the join needs anyway — one linear plan, no second aggregate
    branch (a groupBy+anti-join guard re-ran the whole signature pass
    per AQE query stage and doubled wall time, measured at sf0.1).
    The cap only reduces candidate recall — verification stays exact
    — and the oracle applies the identical cap, so results match at
    any setting. bucket_cap <= 0 disables the guard.
    """
    with_sig, cand = minhash_candidates(
        spark, sf_dir, num_hashes=num_hashes, bands=bands,
        bucket_cap=bucket_cap, docs=docs,
    )
    sets = with_sig.select("doc_id", "shd")
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    inter = F.array_size(F.array_intersect(F.col("sa.shd"), F.col("sb.shd")))
    uni = F.array_size(F.array_union(F.col("sa.shd"), F.col("sb.shd")))
    return (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn("jaccard", r6(inter / uni))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_ngram_jaccard(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.3,
    df_cap: int = 1000,
    docs: DataFrame | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs (>= threshold), blocked by
    shared shingle to avoid the full cross product: pairs are only
    generated for documents sharing at least one shingle (inverted
    index join), then exact Jaccard from distinct-shingle counts.

    Skew guard: a corpus-common shingle with document frequency df
    emits df² join rows, so shingles with df > ``df_cap`` are removed
    from the FEATURE SET itself — the same semantics as stopword /
    boilerplate pruning in production dedup pipelines: sizes and
    intersections are computed over the capped shingle universe, so
    jaccard stays an exact set similarity (of informative shingles)
    and no per-pair work depends on the dropped keys. The df count is
    a window count partitioned by shingle — the same key the
    inverted-index self-join shuffles on, so the cap rides that
    exchange instead of adding an aggregate branch (which re-ran the
    shingle pass per AQE query stage). The oracle applies the
    identical cap, so results match at any setting. df_cap <= 0
    disables the guard.

    The per-pair intersection count aggregates the join output
    directly (count per pair) — at 1M+ candidate join rows this is
    ~4x cheaper than re-joining shingle arrays back for
    array_intersect verification (measured at sf0.1). Set sizes are
    attached to the (far smaller) PAIR table afterwards, not widened
    onto every posting before the self-join.
    """
    from pyspark.sql import Window

    base = docs if docs is not None else load_table(spark, sf_dir, "documents")
    d = (
        base.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", tokens())
        .select("doc_id", F.array_distinct(shingles_from(F.col("_toks"), n)).alias("sh"))
    )
    inv = d.select("doc_id", F.explode("sh").alias("shingle"))
    if df_cap > 0:
        wdf = Window.partitionBy("shingle")
        inv = (
            inv.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("_df") <= df_cap)
            .drop("_df")
        )
    # |capped set| per doc; joined onto candidate PAIRS below (one row
    # per pair), never onto postings (one row per doc-shingle)
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = inv.alias("a")
    b = inv.alias("b")
    pair_inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        pair_inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .withColumn(
            "jaccard", r6(F.col("inter") / (F.col("sa.sz") + F.col("sb.sz") - F.col("inter")))
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str, max_iter: int = 20) -> DataFrame:
    """Connected components over the verified MinHash near-dup pairs:
    every document in a near-dup pair gets a cluster_id = the minimum
    doc_id reachable through the similarity graph (the canonical
    "which docs are the same document" grouping a dedup pipeline
    feeds to its keep-one policy).

    Iterative min-label propagation: each round joins labels across
    edges and keeps the per-node minimum; converges in <= diameter
    rounds (near-dup clusters are shallow — a handful of rounds).
    localCheckpoint truncates lineage so plans don't grow across
    iterations; each round is one shuffle join + one aggregation,
    all distributed — the driver only checks the convergence count.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b")
    return components_from_pairs(pairs, max_iter=max_iter)


def components_from_pairs(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Min-label propagation over an undirected pair list — the
    connected-components core shared by ``dedup_clusters`` and the
    cluster-aware holdout. Returns (doc_id, cluster_id = min
    reachable id) — the unique fixpoint the recursive-CTE oracle
    computes, so HOW fast the walk reaches it is a pure performance
    degree of freedom.

    r11 optimization (guide §1.2 "the distributed algorithm"; VERDICT
    r10 task 9): the two regimes are now split WITHOUT touching any
    session conf (the r10 version flipped spark.sql.adaptive.enabled /
    shuffle.partitions on the shared session — process-global state a
    concurrently planned query would see).

    - Small graphs (edge count below ``SPARK_GRAFT_CC_SMALL_EDGES``,
      default 2,000,000): a near-dup graph is typically a tiny
      fraction of the corpus, and even the r10 one-action-per-round
      walk paid ~4 jobs x several AQE replans for data one task
      handles. The component fold now runs as a SINGLE-TASK union-find
      (path-halving, union-by-min-id, so each tree's root is the
      component minimum == the oracle's min-reachable-id fixpoint)
      over the cached edge list via ``mapInPandas`` — one action, zero
      shuffles, zero rounds. The closure is self-contained (no
      package-level references), so it survives the driver's
      plain-session / foreign-cwd pickling.
    - Large graphs: the r10 distributed walk, unchanged — one action
      per round (convergence flag folded into the lazily
      localCheckpointed round frame) plus the pointer-jump term
      (comp[cand], the pointer-doubling half of two-phase CC, so label
      distance to the component minimum contracts ~2x per round).
      comp always holds the id of a node in the same component, values
      only decrease, and the early-exit fires only at a full
      plain-propagation fixpoint, so the result is the same unique
      fixpoint (min reachable id) the recursive-CTE oracle computes.
      AQE (including skew-join handling) stays ON in this regime.
    """
    import os

    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    # one cheap job: materializes the persisted edge set (paid lazily
    # by round 1 before) and picks the regime
    n_edges = edges.count()
    small_cap = int(os.environ.get("SPARK_GRAFT_CC_SMALL_EDGES", "2000000"))
    if n_edges < small_cap:
        id_type = dict(pairs.dtypes)["doc_a"]

        def _unionfind(batches):
            import pandas as pd

            parent: dict = {}

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]  # path halving
                    x = parent[x]
                return x

            for b in batches:
                for u, v in zip(b["doc_a"].tolist(), b["doc_b"].tolist()):
                    if u not in parent:
                        parent[u] = u
                    if v not in parent:
                        parent[v] = v
                    ru, rv = find(u), find(v)
                    if ru != rv:
                        if rv < ru:
                            ru, rv = rv, ru
                        parent[rv] = ru  # min id stays root
            ids = list(parent.keys())
            yield pd.DataFrame(
                {"doc_id": ids, "cluster_id": [find(i) for i in ids]}
            )

        labels = (
            edges.coalesce(1)
            .mapInPandas(_unionfind, schema=f"doc_id {id_type}, cluster_id {id_type}")
            # eager: materialize the node-grain result BEFORE the edge
            # cache is dropped (the consumer's action may run later)
            .localCheckpoint(eager=True)
        )
        edges.unpersist()
        return labels

    labels = (
        edges.select(F.col("doc_a").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.doc_b == labels.id)
            .groupBy(F.col("doc_a").alias("id"))
            .agg(F.min("comp").alias("nbr_min"))
        )
        cand = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("comp").alias("prev"),
            F.least(F.col("comp"), F.coalesce("nbr_min", F.col("comp"))).alias(
                "cand"
            ),
        )
        # pointer jump: comp[cand] — cand is a node in this
        # component, so its label is too; the jump join sees the
        # small label table and halves long-chain convergence
        jump = labels.select(F.col("id").alias("jid"), F.col("comp").alias("jcomp"))
        nxt = (
            cand.join(jump, cand.cand == jump.jid, "left")
            .select(
                "id",
                F.least(F.col("cand"), F.coalesce("jcomp", F.col("cand"))).alias(
                    "comp"
                ),
                (
                    F.least(F.col("cand"), F.coalesce("jcomp", F.col("cand")))
                    != F.col("prev")
                )
                .cast("int")
                .alias("changed"),
            )
            .localCheckpoint(eager=False)
        )
        # ONE action: materializes the checkpointed round and reads
        # the convergence count off it (no second labels⋈labels pass)
        changed = nxt.agg(F.sum("changed")).first()[0] or 0
        labels = nxt.drop("changed")
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(F.col("id").alias("doc_id"), F.col("comp").alias("cluster_id"))


def minhash_calibration(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 12,
    bands: int = 4,
    bucket_cap: int = 200,
) -> DataFrame:
    """C99 (r5): MinHash estimator calibration over the LSH candidate
    pairs — per exact-Jaccard decile, how far the signature-agreement
    estimate (matches/num_hashes) sits from the exact shingle Jaccard.
    The audit that justifies a signature budget: widening error bands
    in the decile you band at means num_hashes is too small for the
    threshold, BEFORE recall quietly sags (lsh_recall_vs_exact then
    measures the sag itself — this mart explains it).

    Cost rides the SAME candidate stage as dedup_minhash_lsh (shared
    ``minhash_candidates``, bucket_cap guard included), so the audit
    is exactly as scalable as the dedup it audits — the only
    additions are a zip_with signature compare and the per-pair exact
    Jaccard the verify stage computes anyway. All outputs are exact
    BIGINT (ppm via the two-level split; DIV means), so no float
    aggregation order can flip the hash.
    """
    with_sig, cand = minhash_candidates(
        spark, sf_dir, num_hashes=num_hashes, bands=bands, bucket_cap=bucket_cap
    )
    sa = with_sig.alias("sa")
    sb = with_sig.alias("sb")
    inter = F.array_size(F.array_intersect(F.col("sa.shd"), F.col("sb.shd")))
    uni = F.array_size(F.array_union(F.col("sa.shd"), F.col("sb.shd")))
    matches = F.array_size(
        F.filter(
            F.zip_with(F.col("sa.sig"), F.col("sb.sig"), lambda x, y: x == y),
            lambda eq: eq,
        )
    )
    pairs = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            inter.alias("i"),
            uni.alias("u"),
            matches.cast("long").alias("m"),
        )
        .selectExpr(
            f"CAST({_ppm('i', 'u')} AS BIGINT) AS exact_ppm",
            f"CAST({_ppm('m', str(num_hashes))} AS BIGINT) AS est_ppm",
        )
    )
    return (
        pairs.groupBy(
            F.least(F.floor(F.col("exact_ppm") / 100_000), F.lit(9))
            .cast("long")
            .alias("exact_decile")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.abs(F.col("est_ppm") - F.col("exact_ppm"))).alias("err_sum"),
            F.sum("est_ppm").alias("est_sum"),
            F.sum("exact_ppm").alias("exact_sum"),
        )
        .selectExpr(
            "exact_decile",
            "CAST(n_pairs AS BIGINT) AS n_pairs",
            "CAST(err_sum DIV n_pairs AS BIGINT) AS mean_abs_err_ppm",
            "CAST(est_sum DIV n_pairs AS BIGINT) AS mean_est_ppm",
            "CAST(exact_sum DIV n_pairs AS BIGINT) AS mean_exact_ppm",
        )
    )


def dedup_cluster_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C97 (r5): near-dup cluster SIZE distribution over the
    connected components (``dedup_clusters``): per cluster size s,
    how many clusters and how many documents sit in size-s clusters,
    with each size's share of all clustered docs in exact ppm. The
    shape a dedup-policy owner reads first — a fat tail of giant
    clusters means boilerplate families the keep-one policy will
    collapse hard; all-pairs sizes means near-misses. Output is
    bounded by the number of DISTINCT sizes (<= sqrt(2 * clustered
    docs)); the corpus-scale work is the clustering itself, this
    adds two map-side-combinable aggregates.
    """
    labels = dedup_clusters(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("s"))
    tot = sizes.agg(F.sum("s").alias("n_clustered"))
    return (
        sizes.groupBy("s")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .join(F.broadcast(tot))
        .selectExpr(
            "CAST(s AS BIGINT) AS cluster_size",
            "CAST(n_clusters AS BIGINT) AS n_clusters",
            "CAST(s * n_clusters AS BIGINT) AS n_docs",
            f"CAST({_ppm('(s * n_clusters)', 'n_clustered')} AS BIGINT) AS docs_share_ppm",
        )
    )


def neardup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end near-dup dedup decision: MinHash candidate pairs ->
    connected components -> keep the highest-quality document per
    cluster. This is the full pipeline a training-corpus build runs
    (the individual stages are exposed separately as
    dedup_minhash_lsh / dedup_clusters / quality_score); the output
    is the per-document verdict the corpus filter consumes.

    The keep policy argmaxes the 6dp-rounded quality score (ties ->
    min doc_id), so the verdict is engine-invariant. Clusters are a
    small fraction of the corpus (only docs in >= 1 near-dup pair),
    so the quality join and the per-cluster window are cheap relative
    to the LSH stage; the window shuffles once on cluster_id.
    """
    from pyspark.sql import Window

    from .text import quality_score as q_op

    clusters = dedup_clusters(spark, sf_dir)
    q = q_op(spark, sf_dir).select("doc_id", "quality_score")
    joined = clusters.join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return joined.select(
        "doc_id",
        "cluster_id",
        "quality_score",
        (F.row_number().over(w) == 1).alias("keep"),
    )


SIMHASH_BITS = 60


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """60-bit SimHash signature per document.

    Token hash = first 15 hex chars of md5 via conv() -> bigint
    (deterministic in any engine, unlike xxhash64); signature bit j =
    sign of the vote sum over distinct tokens. Implemented as explode
    + one groupBy with 60 conditional-sum aggregates — a single
    distributed pass, map-side combinable, linear at 100 TB.
    """
    tok = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism, id_col
    ).select(id_col, F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"))
    h = F.conv(F.substring(F.md5(F.col("t").cast("binary")), 1, 15), 16, 10).cast(
        "decimal(20,0)"
    ).cast("long")
    tok = tok.withColumn("h", h)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{j}")
        for j in range(SIMHASH_BITS)
    ]
    per_doc = tok.groupBy(id_col).agg(*votes)
    sig = F.lit(0).cast("long")
    for j in range(SIMHASH_BITS):
        sig = sig + F.when(F.col(f"v{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return per_doc.select(id_col, sig.alias("sig"))


def dedup_simhash(
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = 3,
    bucket_cap: int = 200,
    docs: DataFrame | None = None,
) -> DataFrame:
    """SimHash near-dup pairs: bucket by 4 x 15-bit blocks and verify
    hamming distance on candidates. By pigeonhole, any pair within
    hamming distance 3 of the 60-bit signature agrees exactly on at
    least one of the 4 blocks, so the default is lossless (full
    recall); raising max_hamming above 3 trades recall for reach.

    Skew guard: a (block_id, block_value) bucket larger than
    ``bucket_cap`` (near-identical boilerplate signatures) would emit
    O(bucket²) raw candidates; those buckets are dropped before the
    self-join — candidates lost there can still surface through the
    doc's 3 other blocks, and the oracle applies the identical cap so
    results match at any setting. The bucket size is a window count
    over the (bid, bval) partitioning the self-join shuffles on
    anyway, keeping the signature aggregation below ONE shared
    exchange (a separate aggregate+anti-join branch re-ran the
    60-vote signature pass per AQE query stage — 2.5x wall time at
    sf0.1). bucket_cap <= 0 disables the guard.
    """
    from pyspark.sql import Window

    d = simhash_signatures(
        docs if docs is not None else load_table(spark, sf_dir, "documents")
    )
    # one banded equi-join (like MinHash LSH) instead of one self-join
    # per block: explode each doc into (block_id, block_value) postings
    # and join on both — a single shuffle on the posting key
    posting = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("bid"),
                    F.shiftright(F.col("sig"), 15 * i)
                    .bitwiseAND(F.lit((1 << 15) - 1))
                    .alias("bval"),
                )
                for i in range(4)
            ]
        )
    )
    db = d.select("doc_id", "sig", posting.alias("p")).select(
        "doc_id", "sig", "p.bid", "p.bval"
    )
    if bucket_cap > 0:
        wb = Window.partitionBy("bid", "bval")
        db = (
            db.withColumn("_n", F.count(F.lit(1)).over(wb))
            .filter(F.col("_n") <= bucket_cap)
            .drop("_n")
        )
    a = db.alias("a")
    b = db.alias("b")
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    # verify hamming BEFORE deduplicating: the filter drops ~90% of
    # raw candidates (cheap bit arithmetic in the join stage), so the
    # distinct shuffles a tenth of the rows
    return (
        a.join(
            b,
            (F.col("a.bid") == F.col("b.bid"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", F.col("hamming").cast("long").alias("hamming"))
    )


def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level verification of the MinHash near-dup
    candidates: exact Levenshtein distance + normalized similarity
    per pair. Shingle Jaccard can be fooled by token reordering;
    edit distance is the stricter second-stage verdict a dedup
    pipeline applies before destructive drops.

    Scale shape: Levenshtein is O(len_a * len_b) per pair, so it must
    NEVER run all-pairs — here it runs only on the LSH-gated
    candidates (bounded by the band collision rate and the bucket
    cap). Texts join in by id (two narrow hash joins); the quadratic
    kernel is JVM-side ``levenshtein`` over the candidate rows only.
    """
    pairs = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b", "jaccard")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = docs.select(F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a"))
    b = docs.select(F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b"))
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "jaccard",
            F.levenshtein("text_a", "text_b").cast("long").alias("lev_dist"),
            r6(
                F.lit(1.0)
                - F.levenshtein("text_a", "text_b")
                / F.greatest(F.length("text_a"), F.length("text_b"))
            ).alias("lev_sim"),
        )
    )


def duplication_profile(
    spark: SparkSession, sf_dir: str, block_tokens: int = 16
) -> DataFrame:
    """Duplicate-multiplicity histogram at TWO granularities: whole
    documents (byte-identical content) and fixed token blocks
    (copied paragraphs inside otherwise-distinct documents). The
    first numbers a corpus report quotes — "x% of the crawl is
    byte-identical, y% of paragraphs are copies" — and the sanity
    check on any dedup run (post-dedup both profiles collapse to
    multiplicity 1).

    Per unit: two map-side-combinable aggregates over 32-hex hashes;
    output is O(max multiplicity) rows per unit.
    """

    def profile(hashes, unit: str):
        clusters = hashes.groupBy("h").agg(F.count(F.lit(1)).alias("dup_count"))
        return (
            clusters.groupBy("dup_count")
            .agg(F.count(F.lit(1)).alias("n_clusters"))
            .select(
                F.lit(unit).alias("unit"),
                F.col("dup_count").cast("long").alias("dup_count"),
                F.col("n_clusters").cast("long").alias("n_clusters"),
                (F.col("dup_count") * F.col("n_clusters")).cast("long").alias("n_units"),
            )
        )

    d = load_table(spark, sf_dir, "documents")
    doc_hashes = d.select(F.md5(normalized_text().cast("binary")).alias("h"))
    toks = d.withColumn("_toks", tokens())
    starts = F.sequence(
        F.lit(1), F.greatest(F.array_size("_toks"), F.lit(1)), F.lit(block_tokens)
    )
    block_hashes = toks.select(
        F.explode(
            F.transform(
                starts,
                lambda i: F.md5(
                    F.array_join(F.slice("_toks", i, block_tokens), " ").cast("binary")
                ),
            )
        ).alias("h")
    )
    return profile(doc_hashes, "document").unionByName(profile(block_hashes, "block"))


def detector_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-evaluation of the two near-dup detectors: how many
    candidate pairs MinHash-Jaccard and SimHash agree on, and how
    many each finds alone — the calibration readout that says
    whether the cheap detector can replace the expensive one on this
    corpus (high agreement) or they see different duplicate classes
    (low agreement: run both).

    One full-outer join on the (doc_a, doc_b) pair key — pair sets,
    never documents — folded to a 3-row summary.
    """
    mh = dedup_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b", F.lit(1).alias("in_mh"))
    sh = dedup_simhash(spark, sf_dir).select(
        F.col("doc_a").alias("doc_a"), F.col("doc_b").alias("doc_b"), F.lit(1).alias("in_sh")
    )
    joined = mh.join(sh, ["doc_a", "doc_b"], "full_outer")
    return (
        joined.select(
            F.when(F.col("in_mh").isNotNull() & F.col("in_sh").isNotNull(), "both")
            .when(F.col("in_mh").isNotNull(), "minhash_only")
            .otherwise("simhash_only")
            .alias("detector")
        )
        .groupBy("detector")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def lsh_recall_vs_exact(
    spark: SparkSession, sf_dir: str, threshold: float = 0.5, sample_pct: int = 40
) -> DataFrame:
    """Index-quality audit for the MinHash-LSH banding (the text-dedup
    twin of ann_recall_at_k): compare the LSH pair list against the
    EXACT all-pairs shingle-Jaccard ground truth at the same
    threshold and report candidate recall. Because LSH candidates are
    verified with the same exact Jaccard, precision is 1 by
    construction — the number that can silently degrade (band count,
    bucket caps) is recall, and this mart measures it.

    The exact side is the diagnostic's cost: an inverted-index join
    on shingles WITHOUT df capping (ground truth must not prune) —
    quadratic in any hot shingle's doc-frequency. The scale contract
    is therefore ENFORCED, not advisory (VERDICT r3 #5):
    ``sample_pct`` keeps a deterministic md5 doc sample (default 40%
    of docs => ~16% of pairs) and BOTH sides — index and ground
    truth — run on the same sample, so the recall estimate stays
    unbiased. ``sample_pct=100`` is the explicit opt-in for the full
    audit. Recall is emitted as integer ppm (exact BIGINT split —
    no float rounding boundary between engines).
    """
    base = load_table(spark, sf_dir, "documents")
    if sample_pct < 100:
        bucket = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#lshrecall"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 100
        )
        base = base.filter(bucket < sample_pct)
    lsh = dedup_minhash_lsh(spark, sf_dir, threshold=threshold, docs=base).select(
        "doc_a", "doc_b"
    )
    docs = base.withColumn("_toks", tokens()).withColumn(
        "sh", shingles_from(F.col("_toks"), 3)
    )
    sd = docs.select(
        "doc_id", F.explode(F.array_distinct("sh")).alias("s")
    )
    sizes = sd.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sd.alias("a")
    b = sd.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    exact = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("i") / (F.col("na") + F.col("nb") - F.col("i")) >= threshold)
        .select("doc_a", "doc_b")
    )
    hit = lsh.withColumn("hit", F.lit(1))
    joined = exact.join(hit, ["doc_a", "doc_b"], "left")
    n_lsh = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    return (
        joined.agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_caught"),
        )
        .crossJoin(F.broadcast(n_lsh))
        .select(
            F.col("n_exact").cast("long").alias("n_exact_pairs"),
            F.col("n_lsh").cast("long").alias("n_lsh_pairs"),
            F.col("n_caught").cast("long").alias("n_caught"),
            F.when(
                F.col("n_exact") > 0,
                F.expr(_ppm("n_caught", "n_exact")),
            )
            .cast("long")
            .alias("recall_ppm"),
        )
    )


def _doc_token_grid(docs_df: DataFrame, k: int) -> DataFrame:
    """(doc_id, source, t, n_toks, nb): token array + fixed-grid block
    count per document — shared by the batch substring dedup and the
    streaming block-index maintainer."""
    from ..functions.textfns import norm_tokens

    base = docs_df.select("doc_id", "source", norm_tokens(F.col("text")).alias("t"))
    n = F.array_size("t")
    return base.select(
        "doc_id", "source", "t", n.alias("n_toks"), F.floor(n / k).cast("long").alias("nb")
    )


def block_hashes(docs_df: DataFrame, k: int = 10) -> DataFrame:
    """(doc_id, pos, bt, h): every k-token grid block of every doc
    with its md5 — the hash stage of ``dedup_exact_substrings``,
    exposed so the streaming index maintainer folds the same rows."""
    withn = _doc_token_grid(docs_df, k)
    return (
        withn.filter(F.col("nb") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("nb") - 1)).alias("pos"),
            "t",
        )
        .select(
            "doc_id",
            "pos",
            F.array_join(
                F.slice("t", (F.col("pos") * k + 1).cast("int"), k), " "
            ).alias("bt"),
        )
        .withColumn("h", F.md5("bt"))
    )


def block_first_index(docs_df: DataFrame, k: int = 10) -> DataFrame:
    """The block-dedup INDEX: per block hash, the globally FIRST
    occurrence (min (doc_id, pos)) and the occurrence count. Both
    measures are mergeable (min and sum), which is what makes the
    index maintainable incrementally (streaming/ops.py D19)."""
    return (
        block_hashes(docs_df, k)
        .groupBy("h")
        .agg(
            F.min(F.struct("doc_id", "pos")).alias("keep"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .select(
            "h",
            F.col("keep.doc_id").alias("first_doc_id"),
            F.col("keep.pos").alias("first_pos"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
        )
    )


def dedup_exact_substrings(
    spark: SparkSession, sf_dir: str, block_tokens: int = 10
) -> DataFrame:
    """EXACT-substring (block-level) dedup — the declarative form of
    suffix-array training-data dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", public paper):
    repeated ``block_tokens``-token runs are removed from every
    occurrence except the globally FIRST one, catching boilerplate
    shared across otherwise-distinct documents that document-level
    near-dup misses.

    Tractable fixed-grid variant: documents split into consecutive
    non-overlapping k-token blocks (O(n/k) rows — a full
    stride-1/suffix-array pass is O(n) suffixes with a corpus sort;
    the grid catches any duplicated run >= 2k-1 tokens and most of
    the >= k mass at 1/k of the cost). First occurrence = the
    min (doc_id, position) struct per block hash — a map-side
    combinable aggregate, NOT a per-hash row_number window, so a hot
    boilerplate block (millions of copies) costs one partial-agg
    cell per task instead of a single skewed sort partition.

    Output per doc: block/duplicate counts, tokens removed, and the
    md5 fingerprint of the CLEANED text (kept blocks + the sub-k
    tail, in order) — the rewrite is reconstructed distributively
    with an order-pinned fold, and the fingerprint keeps the parity
    hash small. Plan: one explode pass, one hash aggregate + an
    equi-join back, one per-doc aggregate.
    """
    k = block_tokens
    d = load_table(spark, sf_dir, "documents")
    withn = _doc_token_grid(d, k)
    # pinned once: the block table feeds BOTH the first-occurrence
    # aggregate and the flag-join probe side — unpinned, the
    # tokenize+explode subtree replans per consumer (3 corpus passes
    # for a "one explode pass" operator; the customer_rfm lesson)
    hashed = block_hashes(d, k).localCheckpoint(eager=False)
    first = hashed.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("keep")
    )
    flagged = hashed.join(first, "h").withColumn(
        "is_dup",
        (F.col("doc_id") != F.col("keep.doc_id")) | (F.col("pos") != F.col("keep.pos")),
    )
    per_doc = flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum(F.col("is_dup").cast("long")).alias("n_dup_blocks"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("is_dup"), F.struct("pos", "bt"))
                    )
                ),
                lambda s: s["bt"],
            ),
            " ",
        ).alias("kept_text"),
    )
    tail = F.array_join(
        F.slice(
            "t",
            (F.col("nb") * k + 1).cast("int"),
            (F.col("n_toks") - F.col("nb") * k).cast("int"),
        ),
        " ",
    )
    return (
        withn.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_blocks", F.lit(0)).cast("long").alias("n_blocks"),
            F.coalesce("n_dup_blocks", F.lit(0)).cast("long").alias("n_dup_blocks"),
            (F.coalesce("n_dup_blocks", F.lit(0)) * k).cast("long").alias("tokens_removed"),
            F.col("n_toks").cast("long").alias("n_tokens"),
            F.md5(
                F.trim(F.concat(F.coalesce("kept_text", F.lit("")), F.lit(" "), tail))
            ).alias("cleaned_fingerprint"),
        )
    )


def substring_phase_audit(
    spark: SparkSession, sf_dir: str, k: int = 10, sample_pct: int = 40
) -> DataFrame:
    """C95 (r5): PHASE-coverage audit for the fixed-grid substring
    dedup. The C93 grid only collides SAME-PHASE duplicated runs (the
    documented 1/k-cost approximation of a suffix-array pass): a
    boilerplate run starting at token offset 0 in one doc and offset
    3 in another never produces equal grid blocks — at ANY anchor.
    This mart measures what that costs ON THE ACTUAL CORPUS: over a
    deterministic md5 doc sample it hashes EVERY k-token window
    (stride 1, the window-granular view a suffix-array pass would
    see) and reports, per phase p = start_pos mod k:

    - ``n_windows``: windows starting at that phase;
    - ``n_dup_any``: windows whose text recurs ANYWHERE (any doc,
      any offset) — the phase-free duplication mass;
    - ``n_dup_same_phase``: windows whose text recurs at the SAME
      phase — the only duplication a fixed grid can ever collide
      (phase 0 is the grid C93 actually runs, at window granularity);
    - ``grid_miss_ppm``: exact-ppm share of duplicated mass invisible
      to same-phase matching — the measured price of the 1/k grid
      approximation (near 0 => the grid's savings number is honest).

    Scale contract: the stride-1 explode is k times the C93 block
    count, so it runs on the ``sample_pct`` md5 sample by default
    (the lsh_recall_vs_exact discipline — the audit is a bounded
    diagnostic, never the corpus-scale dedup path; sample_pct=100 is
    the explicit opt-in). Plan: one explode, a (hash, phase)
    aggregate, a hash-level rollup joined back on the hash — all
    map-side-combinable aggregates plus one equi-join between two
    aggregates (the C93 flag-join class), no windows.
    """
    from ..functions.textfns import norm_tokens

    base = load_table(spark, sf_dir, "documents")
    if sample_pct < 100:
        bucket = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.col("doc_id").cast("string"), F.lit("#phaseaudit"))
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % 100
        )
        base = base.filter(bucket < sample_pct)
    toks = base.select(norm_tokens(F.col("text")).alias("t"))
    n = F.array_size("t")
    windows = (
        toks.filter(n >= k)
        .select(F.explode(F.sequence(F.lit(0), n - k)).alias("j"), "t")
        .select(
            (F.col("j") % k).cast("long").alias("phase"),
            F.md5(
                F.array_join(F.slice("t", (F.col("j") + 1).cast("int"), k), " ")
            ).alias("h"),
        )
    )
    per_hp = windows.groupBy("h", "phase").agg(F.count(F.lit(1)).alias("cp"))
    per_h = per_hp.groupBy("h").agg(F.sum("cp").alias("c"))
    return (
        per_hp.join(per_h, "h")
        .groupBy("phase")
        .agg(
            F.sum("cp").alias("nw"),
            F.sum(F.when(F.col("c") > 1, F.col("cp")).otherwise(0)).alias("nda"),
            F.sum(F.when(F.col("cp") > 1, F.col("cp")).otherwise(0)).alias("nds"),
        )
        .selectExpr(
            "phase",
            "CAST(nw AS BIGINT) AS n_windows",
            "CAST(nda AS BIGINT) AS n_dup_any",
            "CAST(nds AS BIGINT) AS n_dup_same_phase",
            f"CAST(CASE WHEN nda > 0 THEN {_ppm('(nda - nds)', 'nda')} END AS BIGINT)"
            " AS grid_miss_ppm",
        )
    )


def token_dedup_savings(
    spark: SparkSession, sf_dir: str, block_tokens: int = 10
) -> DataFrame:
    """Pipeline-accounting mart over ``dedup_exact_substrings``: per
    source, total tokens vs tokens removed by block dedup and the
    savings rate in exact ppm — the "how much did dedup save"
    number every corpus build reports. One extra aggregate over the
    dedup output."""
    stats = dedup_exact_substrings(spark, sf_dir, block_tokens=block_tokens)
    return (
        stats.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("tokens_removed").alias("tokens_removed"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.col("tokens_removed").cast("long").alias("tokens_removed"),
            F.expr(_ppm("tokens_removed", "total_tokens")).cast("long").alias("savings_ppm"),
        )
    )


def _split_bucket(id_col, seed: str):
    """Deterministic md5 permille bucket of an id — the holdout_split
    construction with an operator-local seed stream."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(seed))), 1, 15),
            16,
            10,
        ).cast("long")
        % 1000
    )


def dedup_aware_holdout(
    spark: SparkSession, sf_dir: str, test_permille: int = 200
) -> DataFrame:
    """C102 (r5): near-dup-aware train/test split audit. A doc-keyed
    random split lets near-duplicate pairs straddle the boundary —
    the classic silent eval leak (your test set contains paraphrases
    of training docs). The cluster-keyed split buckets every document
    by its near-dup CLUSTER root instead, so a whole duplicate family
    lands on one side. One row per strategy: split sizes and the
    number of verified near-dup pairs crossing the boundary —
    structurally ZERO for the cluster strategy (tested invariant),
    and whatever the corpus's duplication level makes it for the
    naive one (the number this mart exists to surface).

    Plan/scale: the pair list and components are the SAME capped-LSH
    machinery as dedup_clusters (pairs computed once, pinned, reused
    for components AND the straddle check); splits are map-side md5
    buckets; the straddle count is two broadcast-joins of the pair
    list against the per-doc split table. Nothing here adds a new
    corpus-scale shuffle beyond what dedup_clusters already does.
    """
    pairs = (
        dedup_minhash_lsh(spark, sf_dir)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=False)
    )
    comp = components_from_pairs(pairs)
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    rooted = (
        d.join(comp, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("root"))
    )
    is_test_doc = (_split_bucket(F.col("doc_id"), "#casplit") < test_permille)
    is_test_root = (_split_bucket(F.col("root"), "#casplit") < test_permille)
    splits = rooted.select(
        "doc_id",
        is_test_doc.alias("t_doc"),
        is_test_root.alias("t_cluster"),
    ).localCheckpoint(eager=False)

    def strategy(flag: str, name: str) -> DataFrame:
        sizes = splits.agg(
            F.sum(F.col(flag).cast("long")).alias("n_test"),
            F.sum((~F.col(flag)).cast("long")).alias("n_train"),
        )
        a = splits.select(F.col("doc_id").alias("doc_a"), F.col(flag).alias("fa"))
        b = splits.select(F.col("doc_id").alias("doc_b"), F.col(flag).alias("fb"))
        cross = (
            pairs.join(a, "doc_a")
            .join(b, "doc_b")
            .agg(
                F.coalesce(
                    F.sum((F.col("fa") != F.col("fb")).cast("long")), F.lit(0)
                ).alias("cross_pairs")
            )
        )
        return sizes.join(cross).select(
            F.lit(name).alias("strategy"),
            F.col("n_train").cast("long").alias("n_train"),
            F.col("n_test").cast("long").alias("n_test"),
            F.col("cross_pairs").cast("long").alias("cross_pairs"),
        )

    return (
        strategy("t_doc", "doc_key")
        .unionByName(strategy("t_cluster", "cluster_key"))
        .orderBy("strategy")
    )


def dedup_against_index(
    spark: SparkSession,
    sf_dir: str,
    block_tokens: int = 10,
    old_permille: int = 800,
    dup_threshold_ppm: int = 500_000,
) -> DataFrame:
    """C104 (r5): INCREMENTAL ingest dedup — screen a "new" batch of
    documents against the block index built from the corpus already
    ingested, without rescanning history. This is the batch twin of
    the D19 streaming index maintenance: the historical state is
    ``block_first_index`` (one bounded row per distinct k-token block
    hash), and a new document is flagged when at least
    ``dup_threshold_ppm`` of its grid blocks already exist in the
    index. Corpus split old/new by a deterministic md5 permille
    bucket so the oracle reproduces the exact same partition.

    Output per new doc: grid block count, how many hit the index, the
    hit share in exact ppm, and the admit/reject flag — the decision
    record an ingest pipeline writes for every candidate document.

    Plan/scale: the index is an equi-join target keyed on the block
    hash (at 100 TB it lives bucketed on ``h``, maintained by D19 —
    never rebuilt); the new batch explodes to O(tokens/k) rows and
    semi-joins the index, so per-batch cost is proportional to the
    BATCH, not the corpus. Sub-k-token docs have zero grid blocks and
    are admitted (n_blocks = 0 -> hit_ppm = 0), matching the grid
    contract documented on dedup_exact_substrings.
    """
    k = block_tokens
    d = load_table(spark, sf_dir, "documents")
    bucket = _split_bucket(F.col("doc_id"), "#ingest")
    old_docs = d.filter(bucket < old_permille)
    new_docs = d.filter(bucket >= old_permille)
    index = block_first_index(old_docs, k).select("h")
    return block_index_probe(new_docs, index, k, dup_threshold_ppm)


def block_index_probe(
    new_docs: DataFrame,
    index: DataFrame,
    block_tokens: int = 10,
    dup_threshold_ppm: int = 500_000,
) -> DataFrame:
    """The probe stage of C104, factored out (r8) so the streaming
    readout B138 can run the IDENTICAL decision algebra against a
    D19-maintained committed index instead of a batch-built one.
    ``index`` needs only the distinct block-hash column ``h``; any
    extra columns (D19 keeps first-occurrence and counts) are pruned
    here, so one maintained index serves both the admit/reject screen
    and the rewrite path."""
    from ..functions.exact import ppm_expr

    k = block_tokens
    index = index.select("h")
    new_blocks = block_hashes(new_docs, k).select("doc_id", "h")
    hits = (
        new_blocks.join(index.withColumn("hit", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit_blocks"),
        )
    )
    return (
        new_docs.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "source",
            "CAST(coalesce(n_blocks, 0) AS BIGINT) AS n_blocks",
            "CAST(coalesce(n_hit_blocks, 0) AS BIGINT) AS n_hit_blocks",
            f"CAST(CASE WHEN coalesce(n_blocks, 0) = 0 THEN 0 ELSE "
            f"{ppm_expr('coalesce(n_hit_blocks, 0)', 'coalesce(n_blocks, 1)')} END AS BIGINT)"
            " AS hit_ppm",
        )
        .selectExpr(
            "doc_id",
            "source",
            "n_blocks",
            "n_hit_blocks",
            "hit_ppm",
            f"CAST(hit_ppm >= {dup_threshold_ppm} AS BOOLEAN) AS is_dup",
        )
        .orderBy("doc_id")
    )


def neardup_against_index(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 12,
    bands: int = 4,
    bucket_cap: int = 200,
    old_permille: int = 800,
    threshold_ppm: int = 500_000,
) -> DataFrame:
    """C105 (r5): incremental NEAR-dup screening at ingest — the
    MinHash companion of ``dedup_against_index`` (which only catches
    byte/block-identical text). New documents (same md5 permille
    split as C104, one coherent ingest story) probe the LSH band
    postings of the already-ingested corpus; candidate pairs are
    verified with EXACT shingle Jaccard, and each new doc reports its
    best old-side match in exact ppm plus the admit/reject flag.

    Output per new doc: the best-matching historical doc (ties to the
    smallest doc_id), best exact Jaccard in ppm (NULL when no
    candidate), and is_neardup = best >= threshold_ppm.

    Plan/scale: signatures + banding ride the SAME capped candidate
    stage as dedup_minhash_lsh (shared ``minhash_candidates``; the
    cap bounds any hot bucket), restricted to cross-split pairs
    BEFORE the verification join, so exact Jaccard runs only on
    new x old candidates. At 100 TB the old side's postings are the
    D24-maintained index (union+dedup fold — never recomputed); the
    probe cost is proportional to the new batch, and verification
    re-reads only the matched historical docs' shingle sets. The
    small-SF form recomputes both sides from the table because the
    oracle needs the whole computation in one SQL statement.
    """
    from ..functions.exact import ppm_expr

    with_sig, cand = minhash_candidates(
        spark, sf_dir, num_hashes=num_hashes, bands=bands, bucket_cap=bucket_cap
    )
    d = load_table(spark, sf_dir, "documents")
    flags = d.select(
        "doc_id",
        "source",
        (_split_bucket(F.col("doc_id"), "#ingest") >= old_permille).alias("is_new"),
    ).localCheckpoint(eager=False)
    pairs = (
        cand.join(
            flags.select(F.col("doc_id").alias("doc_a"), F.col("is_new").alias("na")),
            "doc_a",
        )
        .join(
            flags.select(F.col("doc_id").alias("doc_b"), F.col("is_new").alias("nb")),
            "doc_b",
        )
        .filter(F.col("na") != F.col("nb"))
        .select(
            F.when(F.col("na"), F.col("doc_a")).otherwise(F.col("doc_b")).alias("new_doc"),
            F.when(F.col("na"), F.col("doc_b")).otherwise(F.col("doc_a")).alias("old_doc"),
        )
    )
    sets = with_sig.select("doc_id", "shd")
    sa = sets.alias("sa")
    sb = sets.alias("sb")
    inter = F.array_size(F.array_intersect(F.col("sa.shd"), F.col("sb.shd")))
    uni = F.array_size(F.array_union(F.col("sa.shd"), F.col("sb.shd")))
    scored = (
        pairs.join(sa, F.col("new_doc") == F.col("sa.doc_id"))
        .join(sb, F.col("old_doc") == F.col("sb.doc_id"))
        .select(
            "new_doc",
            "old_doc",
            inter.alias("n_inter"),
            uni.alias("n_union"),
        )
        .selectExpr(
            "new_doc",
            "old_doc",
            f"CAST({ppm_expr('n_inter', 'n_union')} AS BIGINT) AS j_ppm",
        )
    )
    best = scored.groupBy("new_doc").agg(F.max("j_ppm").alias("best_jaccard_ppm"))
    bestdoc = (
        scored.join(best, "new_doc")
        .filter(F.col("j_ppm") == F.col("best_jaccard_ppm"))
        .groupBy("new_doc", "best_jaccard_ppm")
        .agg(F.min("old_doc").alias("matched_doc_id"))
    )
    return (
        flags.filter(F.col("is_new"))
        .join(bestdoc, flags.doc_id == bestdoc.new_doc, "left")
        .select(
            "doc_id",
            "source",
            F.col("matched_doc_id").cast("long").alias("matched_doc_id"),
            F.col("best_jaccard_ppm").cast("long").alias("best_jaccard_ppm"),
            F.coalesce(
                F.col("best_jaccard_ppm") >= threshold_ppm, F.lit(False)
            ).alias("is_neardup"),
        )
        .orderBy("doc_id")
    )


def normalization_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C108 (r5): how much each text-normalization level matters for
    exact dedup — per level (raw -> lowercase -> +whitespace-collapse
    -> +alnum-only), the distinct-content count and the duplicate
    share in exact ppm. The pre-flight read before choosing the
    pipeline's canonical form: a big raw->lower jump means the corpus
    differs mostly by casing; a big ws->alnum jump means punctuation
    variants dominate, and an aggressive level risks merging
    genuinely different docs.

    Level transforms are CUMULATIVE by construction (each adds one
    normalization), so n_distinct is monotonically non-increasing
    down the level order — a tested invariant. One corpus scan: each
    doc explodes into 4 (level, content-hash) rows; the aggregate
    shuffles 32-char hashes, never text.
    """
    from ..functions.exact import ppm_expr

    t = F.col("text")
    lower = F.lower(t)
    ws = F.trim(F.regexp_replace(lower, r"\s+", " "))
    alnum = F.regexp_replace(ws, "[^a-z0-9 ]", "")
    levels = [
        ("1_raw", t),
        ("2_lower", lower),
        ("3_lower_ws", ws),
        ("4_lower_ws_alnum", alnum),
    ]
    d = load_table(spark, sf_dir, "documents")
    pairs = d.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(name).alias("level"), F.md5(c.cast("binary")).alias("h"))
                    for name, c in levels
                ]
            )
        ).alias("x")
    ).select("x.level", "x.h")
    return (
        pairs.groupBy("level")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("h")).alias("n_distinct"),
        )
        .selectExpr(
            "level",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(n_distinct AS BIGINT) AS n_distinct",
            f"CAST({_ppm('n_docs - n_distinct', 'n_docs')} AS BIGINT) AS dup_ppm",
        )
        .orderBy("level")
    )


BAND_CONFIGS = (1, 2, 3, 4, 6, 12)


def lsh_scurve_thresh_e6(bands: int, rows: int) -> int:
    """floor(1e6 * (1/bands)^(1/rows)) — the classic LSH S-curve
    midpoint (the Jaccard similarity at which a pair's candidate
    probability crosses ~1/2). Frozen to an integer in ONE place so
    the Spark operator and the DuckDB oracle bake identical
    literals."""
    import math

    return math.floor(1_000_000 * (1.0 / bands) ** (1.0 / rows))


def minhash_band_tuning(
    spark: SparkSession, sf_dir: str, num_hashes: int = 12, bucket_cap: int = 200
) -> DataFrame:
    """C117 (r5): LSH banding TUNING mart — for every (bands, rows)
    factorization of the signature (1x12 .. 12x1), the theoretical
    S-curve threshold (1/b)^(1/r) beside the MEASURED consequences on
    this corpus: bucket count, buckets dropped by the skew cap, and
    distinct candidate pairs. This is the table an operator reads
    before picking the band count for a 100 TB dedup run: more bands
    = lower threshold = more candidates (cost) and more recall —
    measured, not guessed. Completes the calibration family
    (minhash_calibration C103 audits the estimator, lsh_recall C90
    audits recall for ONE config; this one maps the config space).

    The expensive stage — tokenize -> shingle -> 12-hash signatures —
    runs ONCE (localCheckpoint pin) and every configuration re-bands
    the same signature table (banding is a cheap projection: that's
    the whole point of the banded-signature design). Candidate pairs
    per config are counted under the SAME bucket_cap skew guard as
    the production candidate stage, so the numbers predict the real
    pipeline's cost.

    r11 (guide §2.4 + VERDICT r10 task 5, the probe-fold pattern):
    the config grid is EXPLODED AS A COLUMN — one posting frame
    carrying a ``bands`` key holds every configuration's postings
    (sum(b) = 28 rows/doc vs 12/doc x 6 sequential configs), so the
    whole tuning mart is ONE bucket groupBy, ONE capped self-join and
    ONE distinct-pair aggregate instead of 6 plan branches x (groupBy
    + self-join + two 1-row joins) — the r10 plan had 12 cartesian
    1-row joins and ~1900 plan lines. Per-config literals
    (rows_per_band, thresh_e6) ride a CASE over the bands key.
    Identical rows: banding, cap semantics and the distinct-pair
    count are per-config unchanged — the bands key just labels them
    in one frame.
    """
    d = (
        load_table(spark, sf_dir, "documents")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", tokens())
        .withColumn("sh", shingles_from(F.col("_toks"), 3))
        .select("doc_id", minhash_signature_from(F.col("sh"), num_hashes).alias("sig"))
    )
    # every config's postings in one bounded explode: (bands, band_id,
    # band_key) per doc — band_key spelling identical to band_postings
    structs = []
    for b in BAND_CONFIGS:
        r = num_hashes // b
        for band in range(b):
            structs.append(
                F.struct(
                    F.lit(b).alias("bands"),
                    F.lit(band).alias("band_id"),
                    F.concat_ws(
                        "|",
                        *[
                            F.element_at(F.col("sig"), band * r + i + 1)
                            for i in range(r)
                        ],
                    ).alias("band_key"),
                )
            )
    posts = (
        d.select("doc_id", F.explode(F.array(*structs)).alias("p"))
        .select("doc_id", "p.bands", "p.band_id", "p.band_key")
        .localCheckpoint(eager=False)
    )
    buckets = posts.groupBy("bands", "band_id", "band_key").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    bstats = buckets.groupBy("bands").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(F.col("cnt") > bucket_cap, 1).otherwise(0)).alias(
            "n_buckets_capped"
        ),
    )
    ok = buckets.filter(F.col("cnt") <= bucket_cap).select(
        "bands", "band_id", "band_key"
    )
    kept = posts.join(ok, ["bands", "band_id", "band_key"])
    pair_counts = (
        kept.alias("a")
        .join(
            kept.alias("b"),
            (F.col("a.bands") == F.col("b.bands"))
            & (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.bands").alias("bands"),
            F.col("a.doc_id").alias("da"),
            F.col("b.doc_id").alias("db"),
        )
        .distinct()
        .groupBy("bands")
        .agg(F.count(F.lit(1)).alias("n_candidate_pairs"))
    )
    rpb = F.lit(None).cast("int")
    thr = F.lit(None).cast("long")
    for b in BAND_CONFIGS:
        r = num_hashes // b
        rpb = F.when(F.col("bands") == b, F.lit(r).cast("int")).otherwise(rpb)
        thr = F.when(
            F.col("bands") == b, F.lit(lsh_scurve_thresh_e6(b, r)).cast("long")
        ).otherwise(thr)
    return (
        bstats.join(pair_counts, "bands", "left")
        .select(
            F.col("bands").cast("int").alias("bands"),
            rpb.alias("rows_per_band"),
            thr.alias("thresh_e6"),
            F.col("n_buckets").cast("long").alias("n_buckets"),
            F.col("n_buckets_capped").cast("long").alias("n_buckets_capped"),
            F.coalesce(F.col("n_candidate_pairs"), F.lit(0))
            .cast("long")
            .alias("n_candidate_pairs"),
        )
        .orderBy("bands")
    )


def jaccard_threshold_sweep(
    spark: SparkSession,
    sf_dir: str,
    thresholds_ppm: tuple = (300_000, 500_000, 700_000, 900_000),
) -> DataFrame:
    """C120 (r5): dedup-policy cost curve — for each Jaccard
    threshold, the pairs retained, documents flagged for removal, and
    TOKENS saved, from ONE candidate+verify pass. This is the table
    that turns "pick a dedup threshold" from folklore into a costed
    decision: lower thresholds delete more training tokens (cost)
    for more aggressive dedup (benefit), and the knee of this curve
    is the policy.

    Removal policy is the greedy keep-oldest pair rule (flag the
    HIGHER doc_id of each verified pair — deterministic, the
    dedup_exact keep-min convention); full transitive clustering per
    threshold is the dedup_clusters path, priced separately.

    Exact integers: verified Jaccard in ppm from distinct-shingle
    intersection counts; token savings from the shared whitespace
    tokenizer. The expensive stages (signatures, capped-LSH
    candidates, exact intersections) run ONCE; each threshold row is
    a filter + two bounded aggregates over the same verified pairs.
    """
    from ..functions.exact import ppm_expr as _ppm
    from ..functions.textfns import whitespace_token_count

    with_sig, cand = minhash_candidates(spark, sf_dir)
    sa = with_sig.select(
        F.col("doc_id").alias("doc_a"), F.col("shd").alias("sh_a")
    )
    sb = with_sig.select(
        F.col("doc_id").alias("doc_b"), F.col("shd").alias("sh_b")
    )
    pairs = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.array_size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            (F.array_size("sh_a") + F.array_size("sh_b")).alias("szsum"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr(_ppm("inter", "(szsum - inter)")).cast("long").alias("jacc_ppm"),
        )
        .localCheckpoint(eager=False)
    )
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", whitespace_token_count(F.col("text")).alias("n_tok")
    )
    # r11 (guide §2.4 + VERDICT r10 task 5, the probe-fold pattern):
    # a doc is flagged at threshold t iff max(jacc over its pairs as
    # doc_b) >= t, so ONE per-doc max + token join serves every
    # threshold; the per-threshold counts/sums are conditional
    # aggregates in TWO 1-row scans (pairs, doc-max) instead of 4 plan
    # branches x (filter+count, distinct+join+agg) — the r10 plan had
    # 8 cartesian 1-row joins. Values are identical: count(jacc >= t)
    # == the filtered count, and sum(n_tok | max >= t) == the
    # distinct-flagged-doc token sum (doc_b is unique in the doc-max
    # frame by construction).
    pstats = pairs.agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("jacc_ppm") >= t, F.lit(1))), F.lit(0)
            ).alias(f"p{t}")
            for t in thresholds_ppm
        ]
    )
    docmax = (
        pairs.groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.max("jacc_ppm").alias("mx"))
        .join(toks, "doc_id")
    )
    dstats = docmax.agg(
        *(
            [
                F.coalesce(
                    F.sum(F.when(F.col("mx") >= t, F.lit(1))), F.lit(0)
                ).alias(f"d{t}")
                for t in thresholds_ppm
            ]
            + [
                F.coalesce(
                    F.sum(F.when(F.col("mx") >= t, F.col("n_tok"))), F.lit(0)
                ).alias(f"s{t}")
                for t in thresholds_ppm
            ]
        )
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).cast("long").alias("threshold_ppm"),
                F.col(f"p{t}").cast("long").alias("n_pairs"),
                F.col(f"d{t}").cast("long").alias("n_docs_flagged"),
                F.col(f"s{t}").cast("long").alias("tokens_saved"),
            )
            for t in thresholds_ppm
        ]
    )
    return (
        pstats.join(F.broadcast(dstats))
        .select(F.explode(rows).alias("r"))
        .select("r.*")
        .orderBy("threshold_ppm")
    )


def containment_pairs(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    threshold_ppm: int = 500_000,
    df_cap: int = 1000,
) -> DataFrame:
    """C126 (r5): asymmetric CONTAINMENT similar pairs — |A∩B| /
    min(|A|,|B|) over the capped n-gram shingle universe. The
    subset-duplicate detector Jaccard structurally misses: a document
    quoted whole inside a 10x-larger one has containment ~1.0 but
    Jaccard ~0.1 (Broder's original resemblance/containment split) —
    exactly the boilerplate-envelope / quote-expansion dupes a
    training-corpus dedup must catch to avoid training on the same
    text twice at different wrapper lengths.

    Same inverted-index blocking + df_cap stopword-pruning semantics
    (and scale contract) as `dedup_ngram_jaccard`: pairs only for
    docs sharing an informative shingle, intersection aggregated
    straight off the index self-join, sizes joined onto the PAIR
    table. Scores in exact integer ppm on both engines; jaccard_ppm
    rides along so the two-metric gap (the wrapper signature:
    containment high, jaccard low) is one subtraction for the reader.
    """
    from pyspark.sql import Window

    from ..functions.exact import ppm_expr as _ppm_e

    base = load_table(spark, sf_dir, "documents")
    d = (
        base.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", tokens())
        .select(
            "doc_id", F.array_distinct(shingles_from(F.col("_toks"), n)).alias("sh")
        )
    )
    inv = d.select("doc_id", F.explode("sh").alias("shingle"))
    if df_cap > 0:
        wdf = Window.partitionBy("shingle")
        inv = (
            inv.withColumn("_df", F.count(F.lit(1)).over(wdf))
            .filter(F.col("_df") <= df_cap)
            .drop("_df")
        )
    sizes = inv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = inv.alias("a")
    b = inv.alias("b")
    pair_inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    scored = (
        pair_inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(inter AS BIGINT) AS inter",
            "CAST(sa.sz AS BIGINT) AS sz_a",
            "CAST(sb.sz AS BIGINT) AS sz_b",
            f"CAST({_ppm_e('inter', 'least(sa.sz, sb.sz)')} AS BIGINT)"
            " AS containment_ppm",
            f"CAST({_ppm_e('inter', '(sa.sz + sb.sz - inter)')} AS BIGINT)"
            " AS jaccard_ppm",
        )
    )
    return scored.filter(F.col("containment_ppm") >= threshold_ppm).orderBy(
        "doc_a", "doc_b"
    )


def idf_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    n: int = 3,
    threshold_ppm: int = 250_000,
    df_cap: int = 1000,
) -> DataFrame:
    """C132 (r5): rarity-WEIGHTED Jaccard similar pairs — each
    shingle carries weight 1e6 DIV df (pure-integer idf surrogate:
    a shingle shared by every doc is worth ~nothing, a unique one is
    worth 1e6), so two documents that only share boilerplate score
    near zero while documents sharing RARE content score high — the
    standard fix for the unweighted-Jaccard failure mode where
    template mass drowns the signal (weighted MinHash literature;
    Ioffe 2010 is the sketch version, this is the exact form).

    Same inverted-index blocking + df_cap join-cost guard as the
    unweighted family; the guard is now belt-and-braces (a df>cap
    shingle would carry weight <= 1e6/cap anyway — the weighting
    itself de-fangs boilerplate, the cap bounds join fanout).
    Weighted Jaccard = sum_w(intersection) / sum_w(union) in exact
    ppm; per-doc weight totals ride the same index.

    Output: doc_a, doc_b, w_inter, w_a, w_b, wjaccard_ppm, plus the
    UNWEIGHTED jaccard_ppm so the boilerplate discount (unweighted
    high, weighted low) reads off one row.
    """
    from pyspark.sql import Window

    from ..functions.exact import ppm_expr as _ppm_e

    base = load_table(spark, sf_dir, "documents")
    d = (
        base.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .withColumn("_toks", tokens())
        .select(
            "doc_id", F.array_distinct(shingles_from(F.col("_toks"), n)).alias("sh")
        )
    )
    inv = d.select("doc_id", F.explode("sh").alias("shingle"))
    wdf = Window.partitionBy("shingle")
    inv = inv.withColumn("_df", F.count(F.lit(1)).over(wdf))
    if df_cap > 0:
        inv = inv.filter(F.col("_df") <= df_cap)
    inv = inv.withColumn("w", F.expr("CAST(1000000 DIV _df AS BIGINT)")).drop("_df")
    sizes = inv.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("sz"), F.sum("w").cast("long").alias("wsz")
    )
    a = inv.alias("a")
    b = inv.alias("b")
    pair_inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.sum("a.w").cast("long").alias("w_inter"),
        )
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    scored = (
        pair_inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .selectExpr(
            "doc_a",
            "doc_b",
            "CAST(w_inter AS BIGINT) AS w_inter",
            "CAST(sa.wsz AS BIGINT) AS w_a",
            "CAST(sb.wsz AS BIGINT) AS w_b",
            f"CAST({_ppm_e('w_inter', '(sa.wsz + sb.wsz - w_inter)')} AS BIGINT)"
            " AS wjaccard_ppm",
            f"CAST({_ppm_e('inter', '(sa.sz + sb.sz - inter)')} AS BIGINT)"
            " AS jaccard_ppm",
        )
    )
    return scored.filter(F.col("wjaccard_ppm") >= threshold_ppm).orderBy(
        "doc_a", "doc_b"
    )


def shard_local_dedup_loss(
    spark: SparkSession, sf_dir: str, n_shards: int = 8
) -> DataFrame:
    """C135 (r6): shard-local vs global exact-dedup audit — the cost
    model for THE 100-TB dedup architecture decision. Global exact
    dedup shuffles every content hash once; shard-local dedup (each
    ingest shard dedups independently, no cross-shard shuffle) is
    embarrassingly parallel but silently keeps every duplicate whose
    copies land in different shards. This mart measures exactly what
    that shortcut costs, per shard, before anyone takes it.

    Shards are the deterministic seeded-md5 bucket of doc_id
    (holdout_split idiom, seed '#shard'), the engine-portable stand-in
    for an ingest partition. Per shard: docs, duplicates removable by
    a shard-local pass (keep min doc_id per (hash, shard)), duplicates
    global dedup would remove (doc_id != global keeper), the MISSED
    docs (locally kept, globally removable — by construction one per
    (hash, shard) group whose local keeper isn't the global keeper),
    and the miss rate in exact ppm of shard docs.

    Plan/scale: one scan to (hash, shard) grain — the only
    corpus-scale shuffle and it moves 32-hex hashes, never text; the
    global roll-up aggregates the (hash, shard) grain (distinct
    hashes x shards rows), and the keeper identity
    ``min_local == min_global  <=>  global keeper is in this shard``
    turns the doc-grain membership test into a pure group-level
    comparison — no join back to documents.
    """
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#shard"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    base = d.select(
        F.md5(normalized_text().cast("binary")).alias("h"), shard.alias("shard")
    , F.col("doc_id"))
    per = base.groupBy("h", "shard").agg(
        F.min("doc_id").alias("local_keep"), F.count(F.lit(1)).alias("c")
    )
    glob = per.groupBy("h").agg(F.min("local_keep").alias("global_keep"))
    joined = per.join(glob, "h").withColumn(
        "contains_keeper", (F.col("local_keep") == F.col("global_keep")).cast("long")
    )
    return (
        joined.groupBy("shard")
        .agg(
            F.sum("c").cast("long").alias("n_docs"),
            F.sum(F.col("c") - 1).cast("long").alias("n_local_removable"),
            F.sum(F.col("c") - F.col("contains_keeper"))
            .cast("long")
            .alias("n_global_removable"),
            F.sum(1 - F.col("contains_keeper")).cast("long").alias("n_missed"),
        )
        .selectExpr(
            "shard",
            "n_docs",
            "n_local_removable",
            "n_global_removable",
            "n_missed",
            f"CAST({_ppm('n_missed', 'n_docs')} AS BIGINT) AS missed_ppm",
        )
        .orderBy("shard")
    )


def lsh_bucket_skew_audit(
    spark: SparkSession,
    sf_dir: str,
    num_hashes: int = 12,
    bands: int = 4,
    bucket_cap: int = 200,
) -> DataFrame:
    """C136 (r6): LSH band-bucket skew audit — prices the candidate
    self-join BEFORE running it. The band-bucket equi-join's cost is
    sum over buckets of c*(c-1)/2; one boilerplate-heavy bucket of a
    million docs is half a trillion candidate pairs, which is why the
    family carries the ``bucket_cap`` guard. This mart is the
    evidence for setting that cap: per band, bucket-count/size
    extremes, the exact pair count the uncapped join would produce,
    the pair count surviving the cap, and how many postings the cap
    drops (the recall the guard trades for survival).

    Everything is an exact BIGINT over bucket-grain counts (c*(c-1)
    is always even, so DIV 2 is exact). Reuses the family's shared
    ``lsh_postings`` stage verbatim — the audit measures the exact
    postings the dedup join would see.

    Plan/scale: signatures are O(n) JVM-side md5; the audit
    aggregates at (band, band_key) grain then band grain — buckets,
    never documents, cross the second shuffle.
    """
    posts = lsh_postings(
        load_table(spark, sf_dir, "documents"), num_hashes=num_hashes, bands=bands
    )
    buckets = posts.groupBy("band_id", "band_key").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    return (
        buckets.groupBy("band_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("c").cast("long").alias("n_postings"),
            F.max("c").cast("long").alias("max_bucket"),
            F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long").alias("n_singleton"),
            F.sum(F.when(F.col("c") > bucket_cap, 1).otherwise(0))
            .cast("long")
            .alias("n_over_cap"),
            F.sum(F.when(F.col("c") > bucket_cap, F.col("c")).otherwise(0))
            .cast("long")
            .alias("postings_dropped"),
            F.sum(F.expr("c * (c - 1) DIV 2")).cast("long").alias("pairs_uncapped"),
            F.sum(
                F.when(F.col("c") <= bucket_cap, F.expr("c * (c - 1) DIV 2")).otherwise(0)
            )
            .cast("long")
            .alias("pairs_after_cap"),
        )
        .orderBy("band_id")
    )


def head_tail_fingerprints(docs: DataFrame, k: int = 2) -> DataFrame:
    """(doc_id, head_h, tail_h) fingerprint rows for the chunk-stitch
    family: md5 of the first/last ``k`` normalized tokens, computed
    off ONE materialized token array (shingles_from discipline); docs
    shorter than 2k tokens are excluded (their head and tail overlap,
    which self-matches trivially). Idempotent keyed rows — the same
    doc always yields the same single row, so the D34 streaming index
    absorbs replay with a keyed dedup."""
    base = (
        docs.withColumn("_t", tokens())
        .filter(F.array_size("_t") >= 2 * k)
        .select(
            "doc_id",
            F.md5(F.array_join(F.slice(F.col("_t"), 1, k), " ").cast("binary")).alias(
                "head_h"
            ),
            F.md5(
                F.array_join(F.expr(f"slice(_t, -{k}, {k})"), " ").cast("binary")
            ).alias("tail_h"),
        )
    )
    return base


def tail_head_overlap_pairs(
    spark: SparkSession, sf_dir: str, k: int = 2, group_cap: int = 200
) -> DataFrame:
    """C137 (r6): chunk-stitching detector — ordered pairs (a, b)
    where document a's LAST ``k`` normalized tokens equal document
    b's FIRST ``k`` tokens: the signature of one source document
    split into overlapping crawl/chunk windows, which exact and
    near-dup detectors both miss (the chunks are neither identical
    nor high-Jaccard, but concatenating them reconstructs — and
    trains on — the original twice). k=2 suits this corpus's short
    docs; a production crawl runs k~30-50.

    Plan/scale: one scan computes two md5 fingerprints per doc (head
    k-gram, tail k-gram) — the join runs hash = hash, never text,
    and the ``group_cap`` guard drops degenerate boilerplate
    openers/closers (a cap-sized head group against a cap-sized tail
    group is cap^2 pairs; capping both sides bounds any key's output,
    the bucket_cap discipline). Docs shorter than 2k tokens are
    excluded — their head and tail overlap, which self-matches
    trivially.
    """
    from pyspark.sql import Window

    base = head_tail_fingerprints(load_table(spark, sf_dir, "documents"), k)
    wh = Window.partitionBy("head_h")
    wt = Window.partitionBy("tail_h")
    capped = (
        base.withColumn("_nh", F.count(F.lit(1)).over(wh))
        .withColumn("_nt", F.count(F.lit(1)).over(wt))
        .filter((F.col("_nh") <= group_cap) & (F.col("_nt") <= group_cap))
        .drop("_nh", "_nt")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    return (
        a.join(
            b,
            (F.col("a.tail_h") == F.col("b.head_h"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.tail_h").alias("overlap_h"),
        )
        .orderBy("doc_a", "doc_b")
    )


def source_pair_dup_matrix(
    spark: SparkSession, sf_dir: str, k: int = 16
) -> DataFrame:
    """C142 (r6): source-pair shared-content matrix — which SOURCES
    share verbatim text: for each unordered source pair, the number
    of distinct sliding ``k``-token windows present in both
    (cross-source duplication = crawl provenance / mirror detection,
    the readout that decides which source to drop wholesale before
    any per-doc dedup runs); the diagonal counts windows repeated
    WITHIN a source. Window grain, not whole-document hashes, because
    real mirrors share spans long before they share byte-identical
    documents (this corpus has zero full-doc duplicates but thousands
    of cross-source shared windows). The source-grain companion of
    the per-doc dedup family (C1/C29) and the exact-window complement
    of the token-set cross_source_overlap (C40).

    Plan/scale: windows become md5s inside the row (shingles_from
    discipline) and collapse to (hash, source) grain — the only
    corpus-scale shuffle, moving md5s; the pair stage self-joins the
    (hash, source) table on the hash key, whose fanout is bounded by
    sources-per-hash (<= |sources|, a catalog-sized constant, never a
    document count). Output is |sources|^2-bounded.
    """
    d = load_table(spark, sf_dir, "documents")
    per = (
        d.withColumn("_t", tokens())
        .select(
            "source",
            F.explode(
                F.transform(
                    shingles_from(F.col("_t"), k),
                    lambda x: F.md5(x.cast("binary")),
                )
            ).alias("h"),
        )
        .groupBy("h", "source")
        .agg(F.count(F.lit(1)).alias("c"))
    ).persist()
    hs = per.select("h", "source")
    a, b = hs.alias("a"), hs.alias("b")
    cross = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_windows"))
    )
    diag = (
        per.filter(F.col("c") >= 2)
        .groupBy(F.col("source").alias("source_a"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_windows"))
        .select(
            "source_a", F.col("source_a").alias("source_b"), "n_shared_windows"
        )
    )
    return cross.unionByName(diag).orderBy("source_a", "source_b")


def stitch_against_index(
    spark: SparkSession,
    sf_dir: str,
    k: int = 2,
    old_permille: int = 800,
    group_cap: int = 200,
) -> DataFrame:
    """C143 (r6): INCREMENTAL chunk-stitch screening — probe a "new"
    batch of documents against the head/tail fingerprint index of the
    corpus already ingested (the C104/C105 incremental-screening
    pattern applied to C137's overlap class): per new doc, does its
    HEAD continue an already-ingested chunk's tail (it EXTENDS known
    content), and does its TAIL match an ingested head (known content
    continues it)? Either way the "new" doc is part of an
    already-seen span stream, and the ingest gate should route it to
    the stitch resolver instead of admitting it as fresh.

    Corpus split old/new by the deterministic md5 permille bucket
    (seed '#ingest', the C104 convention) so the oracle reproduces
    the partition. Oversized fingerprint groups on the INDEX side are
    capped (boilerplate openers/closers, the C137 guard) before the
    probe joins.

    Plan/scale: the index is one bounded row per ingested doc, keyed
    on two md5s (at 100 TB it lives bucketed, maintained by D34 —
    never rebuilt); the probe is two hash equi-joins sized by the
    BATCH, not the corpus.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    bucket = _split_bucket(F.col("doc_id"), "#ingest")
    old_docs = d.filter(bucket < old_permille)
    new_docs = d.filter(bucket >= old_permille)
    index = head_tail_fingerprints(old_docs, k)
    wh = Window.partitionBy("head_h")
    wt = Window.partitionBy("tail_h")
    index = (
        index.withColumn("_nh", F.count(F.lit(1)).over(wh))
        .withColumn("_nt", F.count(F.lit(1)).over(wt))
        .filter((F.col("_nh") <= group_cap) & (F.col("_nt") <= group_cap))
        .drop("_nh", "_nt")
        .persist()
    )
    probe = head_tail_fingerprints(new_docs, k)
    head_hits = (
        probe.join(
            index.select(F.col("tail_h").alias("head_h"), F.lit(1).alias("x")),
            "head_h",
        )
        .groupBy("doc_id")
        .agg(F.sum("x").cast("long").alias("n_extends_ingested"))
    )
    tail_hits = (
        probe.join(
            index.select(F.col("head_h").alias("tail_h"), F.lit(1).alias("x")),
            "tail_h",
        )
        .groupBy("doc_id")
        .agg(F.sum("x").cast("long").alias("n_continued_by_ingested"))
    )
    return (
        new_docs.select("doc_id", "source")
        .join(head_hits, "doc_id", "left")
        .join(tail_hits, "doc_id", "left")
        .selectExpr(
            "doc_id",
            "source",
            "CAST(coalesce(n_extends_ingested, 0) AS BIGINT) AS n_extends_ingested",
            "CAST(coalesce(n_continued_by_ingested, 0) AS BIGINT)"
            " AS n_continued_by_ingested",
            "(coalesce(n_extends_ingested, 0) + coalesce(n_continued_by_ingested, 0)"
            " > 0) AS is_stitch_candidate",
        )
        .orderBy("doc_id")
    )


def cluster_chaining_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C144 (r6): transitive-chaining audit of the near-dup clusters —
    the quality check on C5's connected components: transitive
    closure over LSH pairs can CHAIN documents that were never
    verified similar to each other (A~B, B~C puts A and C in one
    cluster with no A~C evidence; at 100 TB a single boilerplate
    bridge can weld thousands of unrelated docs into one mega-cluster
    that a keep-one policy then decimates). Per multi-member cluster:
    members, verified edges, the edge density against the complete
    graph in exact ppm, the weakest verified link, and a chained flag
    when any member pair lacks direct evidence (density < 1e6).

    Plan/scale: reuses the C2 verified pairs and the shared min-label
    propagation verbatim; the audit itself aggregates edges at
    cluster grain — pairs, never documents, cross its shuffles. The
    density denominator n(n-1)/2 is BIGINT-exact (and itself the
    mega-cluster detector: a cluster too big to audit is the
    finding).
    """
    from ..functions.exact import ppm_expr as _ppm_e

    pairs = dedup_minhash_lsh(spark, sf_dir).persist()
    clusters = components_from_pairs(pairs.select("doc_a", "doc_b"))
    sizes = (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    edges = (
        pairs.join(
            clusters.withColumnRenamed("doc_id", "doc_a"), "doc_a"
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.min("jaccard").alias("min_edge_jaccard"),
        )
    )
    return (
        sizes.join(edges, "cluster_id")
        .selectExpr(
            "cluster_id",
            "n_members",
            "n_edges",
            "CAST(n_members * (n_members - 1) DIV 2 AS BIGINT) AS possible_edges",
            f"CAST({_ppm_e('n_edges', '(n_members * (n_members - 1) DIV 2)')}"
            " AS BIGINT) AS edge_density_ppm",
            "min_edge_jaccard",
            f"({_ppm_e('n_edges', '(n_members * (n_members - 1) DIV 2)')})"
            " < 1000000 AS is_chained",
        )
        .orderBy("cluster_id")
    )
