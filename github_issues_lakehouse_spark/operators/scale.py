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


def bottomk_sample_state(docs: DataFrame, per_stratum: int) -> DataFrame:
    """Bounded uniform-sample state: the ``per_stratum`` (source,
    doc_id, h) rows per source with the smallest md5(doc_id:source).
    Merging two states = union -> dedup on (source, doc_id) ->
    re-take k smallest (associative, order-insensitive, and
    IDEMPOTENT — redelivering a doc cannot move the sample) — the
    streaming fold behind D29 (the dedup lives in the merge, where
    overlap is possible; batch doc_ids are unique). A map-side
    partial bottom-k prunes each input partition before the exact
    window."""
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("source")))
    hashed = docs.select("doc_id", "source", h.alias("h"))
    pruned = partial_topk(hashed, ["source"], "h", "doc_id", per_stratum, ascending=True)
    w = Window.partitionBy("source").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        pruned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= per_stratum)
        .select("source", F.col("rk").cast("long").alias("rk"), "doc_id", "h")
    )


def sample_stratified(spark: SparkSession, sf_dir: str, per_stratum: int = 10) -> DataFrame:
    """Deterministic stratified downsample: the ``per_stratum``
    documents per source with the smallest md5(doc_id) — reproducible
    across engines, runs, and partitionings (no RNG). A map-side
    partial bottom-k prunes each input partition to ``per_stratum``
    rows per source before the exact window, so no task ever holds a
    whole stratum; one shuffle on the stratum key over the survivors.
    The state/merge form (``bottomk_sample_state``) is the streaming
    twin's fold (D29)."""
    d = load_table(spark, sf_dir, "documents")
    return bottomk_sample_state(d, per_stratum)


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two table snapshots: classify every key as
    inserted / deleted / updated / unchanged with old and new values.
    One full-outer join on the key — the plain-parquet equivalent of
    a Delta/Iceberg table-history diff, and the primitive an
    incremental gold rebuild consumes.

    The second snapshot is derived deterministically from the first
    (every 11th key deleted, every 7th price bumped, every 13th
    cloned under a shifted key) so both engines diff identical
    inputs.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    v1 = o
    surviving = o.filter(F.col("o_orderkey") % 11 != 0)
    updated = surviving.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 7 == 0, F.round(F.col("o_totalprice") + 10.0, 2)
        ).otherwise(F.col("o_totalprice")),
    )
    inserts = o.filter(F.col("o_orderkey") % 13 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"), "o_totalprice"
    )
    v2 = updated.unionByName(inserts)

    a = v1.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("old_price"))
    b = v2.select(F.col("o_orderkey").alias("k2"), F.col("o_totalprice").alias("new_price"))
    j = a.join(b, a.k == b.k2, "full_outer")
    change = (
        F.when(F.col("k").isNull(), F.lit("inserted"))
        .when(F.col("k2").isNull(), F.lit("deleted"))
        .when(F.col("old_price") != F.col("new_price"), F.lit("updated"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.coalesce(F.col("k"), F.col("k2")).alias("o_orderkey"),
        change.alias("change_type"),
        r6(F.col("old_price")).alias("old_price"),
        r6(F.col("new_price")).alias("new_price"),
    ).filter(F.col("change_type") != "unchanged")


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
    from ..functions import textfns as X
    from . import dedup as DD

    # single feature pass: language + quality come from the same
    # tokenization, so compute them in ONE projection over ONE scan
    # (the operator-composition form re-scanned and re-tokenized the
    # corpus once per feature family, then joined)
    t = F.col("text")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        X.lang_id(t).alias("pred_lang"),
        X.whitespace_token_count(t).cast("long").alias("n_tokens"),
        r6(X.quality_score(t)).alias("quality_score"),
    )
    keepers = DD.dedup_exact(spark, sf_dir).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    return (
        d.join(keepers, "doc_id", "left_semi")
        .filter((F.col("pred_lang") == "en") & (F.col("quality_score") >= min_quality))
        .select("doc_id", "pred_lang", "n_tokens", "quality_score")
    )


def quality_length_bias(
    spark: SparkSession, sf_dir: str, bucket_tokens: int = 8, min_quality: float = 0.8
) -> DataFrame:
    """C98 (r5): selection-bias audit for the training-corpus gate —
    per token-length bucket: document count, how many survive
    ``training_corpus_filter``, the keep rate in exact ppm, and the
    bucket's mean quality score in e6 integer units. The standard
    "is the filter quietly deleting all long documents" check run
    before shipping a filtered corpus: keep_ppm collapsing past some
    bucket is length bias, not quality signal.

    Exactness: quality_score is 6dp-rounded on both engines, so
    ``round(score * 1e6)`` is an exact integer per doc; bucket sums
    and the DIV mean are then pure BIGINT — no float aggregation
    order can flip the hash. One feature pass over documents + the
    gate's own composition; the bucket rollup is map-side.
    """
    from ..functions import textfns as X

    t = F.col("text")
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        X.whitespace_token_count(t).cast("long").alias("n_tokens"),
        F.round(r6(X.quality_score(t)) * 1_000_000).cast("long").alias("q_e6"),
    )
    kept = training_corpus_filter(spark, sf_dir, min_quality=min_quality).select(
        "doc_id", F.lit(1).alias("kept")
    )
    from ..functions.exact import ppm_expr as _ppm

    return (
        d.join(kept, "doc_id", "left")
        .groupBy(F.floor(F.col("n_tokens") / bucket_tokens).alias("len_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("kept"), F.lit(0)).alias("n_kept"),
            F.sum("q_e6").alias("q_sum"),
        )
        .selectExpr(
            "CAST(len_bucket AS BIGINT) AS len_bucket",
            "CAST(n_docs AS BIGINT) AS n_docs",
            "CAST(n_kept AS BIGINT) AS n_kept",
            f"CAST({_ppm('n_kept', 'n_docs')} AS BIGINT) AS keep_ppm",
            "CAST(q_sum DIV n_docs AS BIGINT) AS mean_quality_e6",
        )
    )


def holdout_split(
    spark: SparkSession, sf_dir: str, val_permille: int = 10, test_permille: int = 10
) -> DataFrame:
    """Deterministic train/val/test assignment: the md5 of the doc id
    (seeded stream '#split') mod 1000 buckets each document; the
    split is stable across runs, machines, and engines — the property
    an eval protocol actually needs (re-sampling on every run leaks
    eval docs into training).

    Map-only pass, no shuffle; the same idiom extends to k-fold
    (bucket div fold_width) and time-based splits (bucket on a date
    column instead of the hash).
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#split"))), 1, 15),
            16,
            10,
        ).cast("long")
        % 1000
    )
    return d.select(
        "doc_id",
        "source",
        bucket.alias("bucket"),
        F.when(F.col("bucket") < test_permille, "test")
        .when(F.col("bucket") < test_permille + val_permille, "val")
        .otherwise("train")
        .alias("split"),
    ).select("doc_id", "source", F.col("bucket").cast("long").alias("bucket"), "split")


def kfold_assignment(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Deterministic k-fold assignment: the same seeded md5-bucket
    construction as holdout_split, folded mod k — every document
    lands in exactly one fold, stable across runs and engines, so
    cross-validation over the corpus is reproducible. Map-only.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#fold"))), 1, 15),
            16,
            10,
        ).cast("long")
        % k
    )
    return d.select(
        "doc_id", "source", bucket.cast("long").alias("fold")
    )


def distributed_rank(
    df: DataFrame,
    part_cols: list[str],
    id_col: str,
    bucket_width: int = 1000,
    rank_col: str = "rank",
) -> DataFrame:
    """row_number() over (PARTITION BY part_cols ORDER BY id_col),
    computed WITHOUT putting a whole partition's rows in one task:
    the same two-level prefix-sum decomposition as plan_token_shards,
    keyed by id ranges. Within-bucket ranks come from a window on
    (part, bucket) — each task holds at most ``bucket_width`` rows —
    and the cross-bucket carry is a window over ONE ROW PER BUCKET.
    ``id_col`` must be numeric and unique within a partition. At
    extreme scale the carry layer recurses with the same
    decomposition; at bucket_width=1000 it is 0.1% of the input.
    """
    bucket = F.expr(f"{id_col} div {bucket_width}")
    d = df.withColumn("_drb", bucket)
    w_local = Window.partitionBy(*part_cols, "_drb").orderBy(id_col)
    local = d.withColumn("_lr", F.row_number().over(w_local))
    # bucket sizes from the WINDOW OUTPUT (max local rank) so this
    # branch reuses the window's exchange instead of planning a
    # second scan-side aggregate
    per_bucket = local.groupBy(*part_cols, "_drb").agg(F.max("_lr").alias("_bn"))
    w_carry = (
        Window.partitionBy(*part_cols)
        .orderBy("_drb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_bucket.select(
        *part_cols,
        "_drb",
        F.coalesce(F.sum("_bn").over(w_carry), F.lit(0)).alias("_carry"),
    )
    return (
        local.join(carry, [*part_cols, "_drb"])
        .withColumn(rank_col, (F.col("_carry") + F.col("_lr")).cast("long"))
        .drop("_drb", "_lr", "_carry")
    )


def partial_topk(
    scored: DataFrame,
    group_cols: list[str],
    score_col: str,
    tie_col: str,
    k: int,
    ascending: bool = False,
) -> DataFrame:
    """Map-side partial top-k per group — the narrow (no-shuffle)
    pruning pass that bounds any downstream exact per-group window to
    k rows per input partition instead of the whole group. Rows are
    totally ordered by (score, tie) with a unique tie column, so the
    pruning is lossless: the global top-k over survivors equals the
    global top-k over everything, ties included. Output schema ==
    input schema. ``ascending=True`` keeps the k SMALLEST scores
    (hash-sampling shapes); default keeps the largest.
    """
    schema = scored.schema
    sort_cols = [*group_cols, score_col, tie_col]
    asc = [True] * len(group_cols) + [ascending, True]

    def local_topk(batches):
        # self-contained closure: workers may not be able to import
        # this package (foreign-cwd driver), so only pandas here
        import pandas as pd

        best = None
        for pdf in batches:
            cand = pdf if best is None else pd.concat((best, pdf), ignore_index=True)
            cand = cand.sort_values(sort_cols, ascending=asc, kind="mergesort")
            best = cand.groupby(group_cols, sort=False).head(k)
        if best is not None:
            yield best

    return scored.mapInPandas(local_topk, schema=schema)


def rendezvous_shard_plan(
    spark: SparkSession, sf_dir: str, n_shards: int = 8
) -> DataFrame:
    """C109 (r5): rendezvous (highest-random-weight) shard assignment
    with a reshard-stability audit. Mod-hashing doc_id % N reassigns
    ~everything when N changes; HRW assigns each doc to the shard
    with the highest md5(doc, shard) weight, so growing N -> N+1
    moves ONLY the docs won by the new shard (expected share
    1/(N+1)) and NEVER shuffles a doc between two old shards — the
    invariant that makes incremental shard-fleet growth cheap, and a
    tested structural property here.

    Output per shard (0..N): doc count under N shards, under N+1,
    docs moved out, and the moved share in exact ppm — the migration
    bill for adding one shard, known before any data moves.

    Plan/scale: one explode into (doc x shard) weight rows (N+1 per
    doc, map-side), one argmax aggregate per doc, one shard rollup.
    No joins, no skew (md5 weights are uniform by construction).
    """
    from ..functions.exact import ppm_expr

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    weights = d.select(
        "doc_id",
        F.explode(F.array(*[F.lit(s) for s in range(n_shards + 1)])).alias("shard"),
    ).select(
        "doc_id",
        "shard",
        F.md5(
            F.concat(
                F.col("doc_id").cast("string"), F.lit("#hrw"), F.col("shard").cast("string")
            )
        ).alias("h"),
    )
    # argmax by (weight, shard) struct max — deterministic ties
    assigned = weights.groupBy("doc_id").agg(
        F.max(
            F.when(F.col("shard") < n_shards, F.struct("h", "shard"))
        )["shard"].alias("shard_n"),
        F.max(F.struct("h", "shard"))["shard"].alias("shard_n1"),
    )
    per_shard_n = assigned.groupBy(F.col("shard_n").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs_before")
    )
    per_shard_n1 = assigned.groupBy(F.col("shard_n1").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs_after")
    )
    moved = assigned.filter(F.col("shard_n") != F.col("shard_n1")).groupBy(
        F.col("shard_n").alias("shard")
    ).agg(F.count(F.lit(1)).alias("n_moved_out"))
    total = d.agg(F.count(F.lit(1)).alias("n_total"))
    shards = spark.range(n_shards + 1).select(F.col("id").cast("int").alias("shard"))
    return (
        shards.join(per_shard_n, "shard", "left")
        .join(per_shard_n1, "shard", "left")
        .join(moved, "shard", "left")
        .join(F.broadcast(total))
        .selectExpr(
            "CAST(shard AS BIGINT) AS shard",
            "CAST(coalesce(n_docs_before, 0) AS BIGINT) AS n_docs_before",
            "CAST(coalesce(n_docs_after, 0) AS BIGINT) AS n_docs_after",
            "CAST(coalesce(n_moved_out, 0) AS BIGINT) AS n_moved_out",
            f"CAST({ppm_expr('coalesce(n_moved_out, 0)', 'n_total')} AS BIGINT) AS moved_share_ppm",
        )
        .orderBy("shard")
    )


def incremental_mart_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B126 (r5): incremental materialized-view maintenance from CDC
    — the batch core of the lakehouse promise: given the v1 mart and
    ONLY the `snapshot_diff` delta (A7), produce the v2 mart without
    rescanning v2. Effects are derivable from the delta alone because
    the mart key (o_orderkey % 16) is a function of the row key:
    inserted adds (+1, +new), deleted adds (-1, -old), updated adds
    (0, new-old); merged = v1 mart FULL OUTER delta with coalesced
    sums.

    The ORACLE deliberately computes the v2 mart by FULL REBUILD from
    the reconstructed second snapshot — so the cross-engine hash
    equality IS the incremental-maintenance correctness proof
    (incremental apply == recompute), checked by the driver at every
    round, not just by a unit test.

    Integer cents (decimal cast of the r6 prices) so the additive
    algebra is exact. Output per bucket: n_orders, revenue_cents.

    Plan/scale: the v1 mart is one aggregate over the fact; the delta
    is key-grain (the changed rows only — the whole point); the merge
    is a bounded 16-row full-outer join. At 100 TB the v1 mart is the
    stored state and only the delta is computed per batch — exactly
    the stream_mart_maintenance fold, expressed as a batch operator.
    """
    cents = lambda c: (F.col(c).cast("decimal(18,2)") * 100).cast("long")  # noqa: E731
    o = load_table(spark, sf_dir, "orders")
    v1_mart = o.groupBy((F.col("o_orderkey") % 16).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(cents("o_totalprice")).cast("long").alias("cents"),
    )
    d = snapshot_diff(spark, sf_dir)
    delta = d.groupBy((F.col("o_orderkey") % 16).alias("bucket")).agg(
        F.sum(
            F.when(F.col("change_type") == "inserted", 1)
            .when(F.col("change_type") == "deleted", -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("dn"),
        F.sum(
            F.when(F.col("change_type") == "inserted", cents("new_price"))
            .when(F.col("change_type") == "deleted", -cents("old_price"))
            .otherwise(cents("new_price") - cents("old_price"))
        )
        .cast("long")
        .alias("dcents"),
    )
    merged = v1_mart.join(delta, "bucket", "full_outer").select(
        F.col("bucket").cast("long").alias("bucket"),
        (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0)))
        .cast("long")
        .alias("n_orders"),
        (F.coalesce("cents", F.lit(0)) + F.coalesce("dcents", F.lit(0)))
        .cast("long")
        .alias("revenue_cents"),
    )
    return merged.filter(F.col("n_orders") > 0).orderBy("bucket")


def holdout_stratum_weights(
    spark: SparkSession, sf_dir: str, val_permille: int = 10, test_permille: int = 10
) -> DataFrame:
    """C156 (r10): post-stratification weights for the eval splits —
    the survey-sampling correction an eval harness applies on top of
    `holdout_split` (C49): the hash split is uniform in expectation
    but any FINITE split leaves stratum imbalance (a source slightly
    over/under-represented in val/test vs the corpus), and metrics
    averaged over the raw split estimate the SPLIT mixture, not the
    corpus. Per (split, source): document count, the source's share
    WITHIN the split, its share in the corpus, and
    weight_ppm = floor(corpus_share_ppm * 1e6 / split_share_ppm) —
    multiply each doc's metric contribution by weight_ppm/1e6 and
    the split-level average becomes corpus-representative.

    All shares/weights are exact floor-ppm BIGINTs (the ppm_expr
    two-level remainder split — engine-bit-identical); grain is
    3 x sources rows off one groupBy of the split assignment.
    """
    from ..functions.exact import ppm_expr

    s = holdout_split(spark, sf_dir, val_permille, test_permille)
    per = s.groupBy("split", "source").agg(F.count(F.lit(1)).alias("n_docs"))
    split_tot = per.groupBy("split").agg(F.sum("n_docs").alias("split_total"))
    src_tot = per.groupBy("source").agg(F.sum("n_docs").alias("src_total"))
    w = Window.partitionBy()
    corpus_total = F.sum("n_docs").over(w)
    base = (
        per.join(split_tot, "split")
        .join(src_tot, "source")
        .withColumn("corpus_total", corpus_total)
    )
    return base.select(
        "split",
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.expr(ppm_expr("n_docs", "split_total")).cast("long").alias("split_share_ppm"),
        F.expr(ppm_expr("src_total", "corpus_total")).cast("long").alias("corpus_share_ppm"),
        F.expr(
            ppm_expr(
                f"({ppm_expr('src_total', 'corpus_total')})",
                f"({ppm_expr('n_docs', 'split_total')})",
            )
        )
        .cast("long")
        .alias("weight_ppm"),
    ).orderBy("split", "source")
