"""Deterministic sketch operators — the mergeable-summary family a
100 TB engine runs when exact answers are too expensive to keep
per-partition: KMV (k-minimum-values) distinct-count sketches and
Count-Min frequency sketches, each with a same-pass exact readout so
the sketch error is MEASURED, not assumed.

Both sketches are md5-keyed, so they are deterministic across
engines, runs, and partitionings — the DuckDB oracle reproduces every
estimate bit-for-bit (unlike HLL/approx_count_distinct, whose
registers are engine-internal). Scale notes per operator; the common
property is that the sketch state is O(k) / O(width*depth) per group
and merges associatively (min-of-mins / cell-wise sums), so a
map-side combine carries a bounded accumulator regardless of input
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import norm_tokens
from ..sources.registry import load_table
from .relational import r6

# md5 prefix -> uniform in [0, 1): 15 hex chars = 60 bits, exact in a
# BIGINT and far beyond the 6dp rounding downstream.
_HASH_SPAN = float(1 << 60)


def _u01(col):
    return (
        F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("decimal(20,0)").cast("long")
        / F.lit(_HASH_SPAN)
    )


def kmv_term_hashes(docs: DataFrame) -> DataFrame:
    """(source, term, h) for every distinct term per source — the raw
    material of the KMV sketch. Mergeable: the union of two hash sets
    deduped on (source, term) is the hash set of the union corpus."""
    return (
        docs.select("source", F.explode(norm_tokens(F.col("text"))).alias("term"))
        .distinct()
        .withColumn("h", _u01(F.concat(F.col("term"), F.lit("#kmv"))))
    )


def kmv_state(docs: DataFrame, k: int = 64) -> DataFrame:
    """Bounded KMV state: the k smallest (source, term, h) rows per
    source. Merging two states = union -> dedup -> re-take k smallest
    (associative, order-insensitive) — the streaming fold. A map-side
    partial bottom-k prunes each input partition before the exact
    window, so the per-source task never holds the whole vocabulary."""
    from .scale import partial_topk

    pruned = partial_topk(
        kmv_term_hashes(docs).select("source", "term", "h"),
        ["source"],
        "h",
        "term",
        k,
        ascending=True,
    )
    w = Window.partitionBy("source").orderBy(F.col("h").asc(), F.col("term").asc())
    return (
        pruned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("source", "term", "h")
    )


def kmv_distinct_terms(
    spark: SparkSession, sf_dir: str, k: int = 64
) -> DataFrame:
    """KMV distinct-count sketch per source (Bar-Yossef et al. 2002):
    hash every distinct term to [0,1); the k-th smallest hash U_k
    yields the estimate (k-1)/U_k. One row per source with the
    estimate, the exact distinct count, and the relative error.

    Plan: one explode scan -> distinct (source, term) -> per-source
    window takes the k smallest hashes (the same shuffle also feeds
    the exact count — shared exchange). At 100 TB the sketch is the
    point: the k-hash state is mergeable bottom-up (keep k smallest
    of a union), so a map-side combine holds k values per source per
    task while the EXACT count would need the full distinct shuffle;
    the exact column here is the calibration readout the small-SF
    gate checks the estimator against.
    """
    d = load_table(spark, sf_dir, "documents")
    terms = kmv_term_hashes(d)
    # the exact count is a map-side-combinable aggregate; U_k comes
    # from the bounded k-row state — NO full-vocabulary window
    n_exact = terms.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    state_agg = (
        kmv_state(d, k=k)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_k"), F.max("h").alias("u_k_raw"))
    )
    per_source = n_exact.join(F.broadcast(state_agg), "source").select(
        "source",
        "n_exact",
        F.when(F.col("n_k") == k, F.col("u_k_raw")).alias("u_k"),
    )
    est = F.when(
        F.col("u_k").isNotNull(), F.floor(F.lit(float(k - 1)) / F.col("u_k"))
    ).otherwise(F.col("n_exact"))
    return per_source.select(
        "source",
        F.col("n_exact").cast("long").alias("n_exact"),
        est.cast("long").alias("n_estimated"),
        r6(F.abs(est - F.col("n_exact")) / F.col("n_exact")).alias("rel_error"),
    ).orderBy("source")


def _cms_bucket(row: int, width: int):
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("term"), F.lit(f"#cms{row}"))), 1, 15),
        16,
        10,
    ).cast("decimal(20,0)").cast("long")
    return F.pmod(h, F.lit(width))


def cms_cells(docs: DataFrame, width: int = 256, depth: int = 3) -> DataFrame:
    """The Count-Min cell table (row, b, cell_count) over a document
    set — depth*width rows, built in one map-side-combinable pass.
    Purely ADDITIVE: merging two corpora's sketches is a cell-wise
    sum, which is what makes CMS the streaming-fold frequency
    structure."""
    toks = docs.select(F.explode(norm_tokens(F.col("text"))).alias("term"))
    return (
        toks.select(
            "term",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).cast("int").alias("row"),
                            _cms_bucket(r, width).cast("long").alias("b"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("cell"),
        )
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def cms_term_counts(
    spark: SparkSession,
    sf_dir: str,
    width: int = 256,
    depth: int = 3,
    top_n: int = 10,
) -> DataFrame:
    """Count-Min sketch readout (Cormode & Muthukrishnan 2005): build
    a depth x width CMS of global term frequencies, then read the
    exact top-``top_n`` terms back out of it. Output per term: exact
    count, CMS estimate (min over the depth rows), overcount. CMS
    never undercounts, so ``overcount >= 0`` is a structural
    invariant the test asserts.

    Plan: ONE explode scan feeds both sides — the depth*width cell
    table (explode each token into its ``depth`` (row, bucket) cells,
    one groupBy; cells are map-side combinable and the whole sketch
    is depth*width longs) and the exact per-term counts whose top-n
    is the probe set. The probe join is broadcast (top_n rows x depth
    cells). At 100 TB the cell aggregate is the only full-data pass
    and its output is a constant-size table — the sketch one keeps,
    shipping per batch, instead of a billion-row term table.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(norm_tokens(F.col("text"))).alias("term"))

    def bucket(row: int):
        return _cms_bucket(row, width)

    cells = cms_cells(d, width=width, depth=depth)
    exact = toks.groupBy("term").agg(F.count(F.lit(1)).alias("n_exact"))
    # orderBy+limit plans as TakeOrderedAndProject (per-partition
    # partial top-n, driver merge) — a rank window here would sort the
    # ENTIRE vocabulary in one task; only the n survivors see the
    # rank window
    top = exact.orderBy(F.col("n_exact").desc(), F.col("term").asc()).limit(top_n)
    w = Window.orderBy(F.col("n_exact").desc(), F.col("term").asc())
    probes = (
        top.withColumn("rk", F.row_number().over(w))
        .select(
            "term",
            "n_exact",
            F.col("rk").cast("int").alias("rank"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).cast("int").alias("row"),
                            bucket(r).cast("long").alias("b"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("cell"),
        )
        .select("term", "n_exact", "rank", F.col("cell.row").alias("row"), F.col("cell.b").alias("b"))
    )
    est = (
        F.broadcast(probes)
        .join(cells, ["row", "b"])
        .groupBy("term", "n_exact", "rank")
        .agg(F.min("cell_count").alias("n_cms"))
    )
    return est.select(
        "rank",
        "term",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.col("n_cms").cast("long").alias("n_cms"),
        (F.col("n_cms") - F.col("n_exact")).cast("long").alias("overcount"),
    ).orderBy("rank")


def source_term_counts(docs: DataFrame) -> DataFrame:
    """Exact per-(source, term) token counts — the raw delta the
    heavy-hitter summary folds (one explode + one map-side-combinable
    aggregate; the vocabulary, not the corpus, crosses the shuffle)."""
    return (
        docs.select("source", F.explode(norm_tokens(F.col("text"))).alias("term"))
        .groupBy("source", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def heavy_hitters_merge(
    existing: DataFrame | None, batch_df: DataFrame, m: int = 256
) -> DataFrame:
    """Mergeable SpaceSaving-style heavy-hitter summary (Agarwal et
    al. 2012, "Mergeable Summaries", public paper): per source, at
    most ``m`` (term, cnt) rows plus a per-source error ``floor_cnt``
    (replicated on every row). Merge rule:

    - a term absent from the stored summary inherits ``floor_cnt``
      (the count it COULD have held before being evicted — the
      SpaceSaving overestimate), then adds the batch's exact count;
    - keep the top ``m`` per source by (cnt desc, term asc);
    - the new floor is max(old floor, the largest dropped cnt).

    Invariants (both tested): ``cnt >= true count`` (eviction never
    loses mass — re-entry inherits at least what was dropped) and
    ``cnt <= true count + floor_cnt``. With per-source vocabulary
    <= m the floor stays 0 and counts are EXACT. The merge is one
    full-outer join of two vocabulary-sized aggregates + one
    bounded window — never a corpus rescan.
    """
    from pyspark.sql import Window

    delta = source_term_counts(batch_df)
    if existing is None:
        merged = delta.withColumn("old_floor", F.lit(0).cast("long"))
    else:
        ex = existing.select(
            F.col("source").alias("s_a"),
            F.col("term").alias("t_a"),
            F.col("cnt").alias("cnt_a"),
            F.col("floor_cnt").alias("floor_a"),
        )
        floors = existing.groupBy(F.col("source").alias("s_f")).agg(
            F.max("floor_cnt").alias("floor_src")
        )
        merged = (
            delta.join(
                ex,
                (F.col("source") == F.col("s_a")) & (F.col("term") == F.col("t_a")),
                "full_outer",
            )
            .select(
                F.coalesce("source", "s_a").alias("source"),
                F.coalesce("term", "t_a").alias("term"),
                F.coalesce("cnt", F.lit(0)).alias("cnt_b"),
                F.col("cnt_a"),
            )
            .join(floors, F.col("source") == F.col("s_f"), "left")
            .select(
                "source",
                "term",
                (
                    F.coalesce(
                        "cnt_a", F.coalesce("floor_src", F.lit(0))
                    )
                    + F.col("cnt_b")
                ).cast("long").alias("cnt"),
                F.coalesce("floor_src", F.lit(0)).alias("old_floor"),
            )
        )
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), F.col("term").asc())
    ranked = merged.withColumn("rk", F.row_number().over(w))
    dropped = (
        ranked.filter(F.col("rk") > m)
        .groupBy("source")
        .agg(F.max("cnt").alias("max_dropped"))
    )
    return (
        ranked.filter(F.col("rk") <= m)
        .join(dropped, "source", "left")
        .select(
            "source",
            "term",
            "cnt",
            F.greatest(F.col("old_floor"), F.coalesce("max_dropped", F.lit(0)))
            .cast("long")
            .alias("floor_cnt"),
        )
    )
