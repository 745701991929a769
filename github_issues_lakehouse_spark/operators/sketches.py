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


# ---------------------------------------------------------------------------
# HyperLogLog (Flajolet et al. 2007, public paper) — register-max sketch.
# Pinned fixed-point alpha_64 = 0.7213 / (1 + 1.079/64) in e6 units: the
# SAME literal feeds Spark and the DuckDB oracle, so the estimate is exact
# integer arithmetic end-to-end (no transcendental evaluated at runtime).
HLL_M = 64
HLL_RMAX = 24
HLL_ALPHA64_E6 = 709340

# Linear-counting table for the small-range regime (V = zero registers
# > 0 and raw estimate <= 2.5m): E_lc = m * ln(m / V), PRECOMPUTED as
# pinned integer literals so no engine evaluates a transcendental at
# runtime — the table is part of the operator contract, identical in
# the Spark plan and the DuckDB oracle.
import math as _math

HLL_LC_TABLE = {v: int(HLL_M * _math.log(HLL_M / v)) for v in range(1, HLL_M + 1)}


def hll_lc_case_sql(col: str) -> str:
    """Dialect-neutral CASE expression mapping a zero-register count
    to its pinned linear-counting estimate (floor(m ln(m/V)))."""
    whens = " ".join(f"WHEN {v} THEN {e}" for v, e in HLL_LC_TABLE.items())
    return f"CASE {col} {whens} ELSE 0 END"


def hll_registers(docs: DataFrame, m: int = HLL_M, rmax: int = HLL_RMAX) -> DataFrame:
    """(source, register, rho) — the HLL register table over the
    distinct terms of each source. Register j = h % m; rho = 1 +
    trailing zeros of the remaining hash bits (capped at ``rmax``),
    computed on the binary-string rendering (``conv(w, 10, 2)`` ==
    DuckDB ``bin(w)``, both unpadded) so the two engines share the
    exact same bit arithmetic. The register value is max(rho) — an
    associative, commutative, IDEMPOTENT merge, which is why HLL is
    the one sketch that stays correct under at-least-once replay
    (D22) with no dedup at all.
    """
    terms = (
        docs.select("source", F.explode(norm_tokens(F.col("text"))).alias("term"))
        .distinct()
    )
    h = (
        F.conv(F.substring(F.md5(F.concat(F.col("term"), F.lit("#hll"))), 1, 15), 16, 10)
        .cast("decimal(20,0)")
        .cast("long")
    )
    hashed = terms.select("source", h.alias("h"))
    w = F.expr(f"h DIV {m}")
    b = F.conv(w.cast("string"), 10, 2)
    tz = F.length(b) - F.length(F.regexp_replace(b, "0+$", ""))
    rho = F.when(w == 0, F.lit(rmax)).otherwise(F.least(F.lit(rmax), tz + 1))
    return (
        hashed.select(
            "source",
            F.pmod(F.col("h"), F.lit(m)).cast("int").alias("register"),
            rho.cast("int").alias("rho"),
        )
        .groupBy("source", "register")
        .agg(F.max("rho").cast("int").alias("rho"))
    )


def hll_estimate(
    registers: DataFrame,
    m: int = HLL_M,
    rmax: int = HLL_RMAX,
    key_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Fold a register table into one row per key: zero-register
    count, the exact-integer harmonic sum S = sum_j 2^(rmax - rho_j)
    (absent registers carry rho=0, i.e. 2^rmax each), and the raw HLL
    estimate floor(alpha_e6 * m^2 * 2^rmax / (S * 1e6)) — all BIGINT,
    bit-identical across engines. Numerator ~4.9e16 and denominator
    <= m * 2^rmax * 1e6 ~ 1.1e15 both fit int64 by construction.
    ``key_cols`` generalizes the fold beyond the per-source sketch
    (the pair-union overlap keys on (source_a, source_b))."""
    num = HLL_ALPHA64_E6 * m * m * (1 << rmax)
    keys = list(key_cols)
    per = registers.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_hit"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {rmax} - rho)")).alias("s_hit"),
    )
    return per.selectExpr(
        *keys,
        f"CAST({m} - n_hit AS BIGINT) AS n_registers_zero",
        f"CAST(s_hit + ({m} - n_hit) * CAST({1 << rmax} AS BIGINT) AS BIGINT) AS harmonic_sum",
    ).selectExpr(
        *keys,
        "n_registers_zero",
        "harmonic_sum",
        f"CAST({num} DIV (harmonic_sum * 1000000) AS BIGINT) AS n_hll",
    ).selectExpr(
        *keys,
        "n_registers_zero",
        "harmonic_sum",
        "n_hll",
        # the standard small-range switch: raw estimate below 2.5m with
        # empty registers present -> linear counting (pinned table)
        f"CAST(CASE WHEN n_registers_zero > 0 AND n_hll <= {(5 * m) // 2} "
        f"THEN {hll_lc_case_sql('n_registers_zero')} ELSE n_hll END AS BIGINT)"
        " AS n_estimated",
    )


def hll_distinct_terms(
    spark: SparkSession, sf_dir: str, m: int = HLL_M, rmax: int = HLL_RMAX
) -> DataFrame:
    """HLL distinct-term count per source with a same-pass exact
    readout: one row per source — zero registers, harmonic sum, the
    estimate, the exact distinct count, and |error| in exact ppm.

    Plan: one explode -> distinct (source, term) shuffle feeds BOTH
    the m-register max aggregate (bounded state: m rows per source)
    and the exact count. At 100 TB the register table IS the point:
    64 ints per source, mergeable by max — a map-side combine holds
    the whole sketch per task, and the streaming twin (D22) folds
    the same rows with no history rescan. The exact column is the
    small-SF calibration readout, same contract as KMV/CMS above.
    """
    from ..functions.exact import ppm_expr

    d = load_table(spark, sf_dir, "documents")
    regs = hll_registers(d, m=m, rmax=rmax)
    est = hll_estimate(regs, m=m, rmax=rmax)
    exact = (
        d.select("source", F.explode(norm_tokens(F.col("text"))).alias("term"))
        .distinct()
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    return (
        exact.join(F.broadcast(est), "source")
        .selectExpr(
            "source",
            "CAST(n_exact AS BIGINT) AS n_exact",
            "n_registers_zero",
            "harmonic_sum",
            "n_hll",
            "n_estimated",
            f"CAST({ppm_expr('abs(n_estimated - n_exact)', 'n_exact')} AS BIGINT)"
            " AS abs_err_ppm",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Mergeable equi-width quantile sketch (the "bin counts + drill-in" pattern:
# the sketch is a bounded additive histogram a stream can fold; the exact
# percentile_disc drill-in only ever touches the one bin the sketch selects).


def price_bin_counts(li: DataFrame, bin_cents: int = 10_000) -> DataFrame:
    """(bin, n) — equi-width histogram of l_extendedprice in exact
    integer cents. Purely ADDITIVE (merge = cell-wise sum), the
    mergeable state the streaming twin (D23) folds per micro-batch."""
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    return (
        li.select(cents.alias("cents"))
        .select(F.expr(f"cents DIV {bin_cents}").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def quantile_bins_finalize(
    bins: DataFrame, qs: tuple = (50, 90, 99), bin_cents: int = 10_000
) -> DataFrame:
    """Read per-q bin bounds out of a bin-count state: for each q the
    chosen bin is the SMALLEST bin whose cumulative count satisfies
    ``cum * 100 >= q * N`` (percentile_disc's defining rule, in
    BIGINT). Output: q, chosen bin, inclusive lo / exclusive hi in
    cents, carry_in (count strictly below the bin) and N — everything
    a drill-in or an SLA dashboard needs, computed from the bounded
    state alone (never the corpus)."""
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin", "n", F.sum("n").over(w_cum).alias("cum")
    )
    total = bins.agg(F.sum("n").cast("long").alias("n_total"))
    qdf = total.select(
        F.explode(F.array(*[F.lit(int(q)) for q in qs])).alias("q"), "n_total"
    )
    chosen = (
        cum.join(F.broadcast(qdf))
        .filter(F.col("cum") * 100 >= F.col("q") * F.col("n_total"))
        .groupBy("q", "n_total")
        .agg(F.min("bin").alias("bin"))
    )
    return (
        chosen.join(cum, "bin")
        .selectExpr(
            "CAST(q AS BIGINT) AS q",
            "CAST(bin AS BIGINT) AS bin",
            f"CAST(bin * {bin_cents} AS BIGINT) AS bin_lo_cents",
            f"CAST((bin + 1) * {bin_cents} AS BIGINT) AS bin_hi_cents",
            "CAST(cum - n AS BIGINT) AS carry_in",
            "CAST(n_total AS BIGINT) AS n_total",
        )
    )


def quantile_sketch_price(
    spark: SparkSession,
    sf_dir: str,
    bin_cents: int = 10_000,
    qs: tuple = (50, 90, 99),
) -> DataFrame:
    """Equi-width quantile sketch over lineitem extended price with an
    exact drill-in: the additive bin histogram selects each target
    quantile's bin; the exact percentile_disc VALUE is then resolved
    by a second pass restricted to the chosen bins (value-level
    cumulative counts seeded with the sketch's carry_in). One row per
    q: bin bounds from the sketch, the exact disc value, and the
    in-bin rank evidence.

    Plan/scale: pass 1 is a map-side-combinable histogram whose state
    is ~price_range/bin_cents longs — the thing a 100 TB stream keeps
    (D23 folds exactly these rows). Pass 2 re-scans the data but
    broadcast-joins each row's bin against the <= len(qs) chosen bins
    (dropping everything else before any shuffle) and aggregates
    value-level counts only inside those bins, so the expensive exact
    ordering never sees more than a bin's worth of distinct values —
    the window sort is bounded by bin width, not data size. (The bin
    predicate arrives via the join, not scan pushdown: a static range
    filter can't be known before pass 1 finishes.) percentile_disc semantics (smallest value with
    cum*100 >= q*N) are engine-invariant BIGINT comparisons — no
    interpolated doubles (the r3 customer_rfm lesson); the DuckDB
    oracle cross-checks with its NATIVE percentile_disc.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    base = li.select(cents.alias("cents")).select(
        "cents", F.expr(f"cents DIV {bin_cents}").alias("bin")
    )
    # pinned: the bin histogram (bounded: price_range/bin_cents rows)
    # feeds the finalize twice (cum + total) and the drill-in probe —
    # unpinned, each consumer replans the corpus histogram scan
    # (measured 14 scans vs 2; the customer_rfm lesson)
    bins = price_bin_counts(li, bin_cents=bin_cents).localCheckpoint(eager=False)
    sel = quantile_bins_finalize(bins, qs=qs, bin_cents=bin_cents).localCheckpoint(
        eager=False
    )
    # drill-in: value-level counts inside the <= len(qs) chosen bins
    vals = (
        base.join(F.broadcast(sel.select("q", "bin", "carry_in", "n_total")), "bin")
        .groupBy("q", "bin", "carry_in", "n_total", "cents")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_in = (
        Window.partitionBy("q")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    exact = (
        vals.withColumn("cum", F.col("carry_in") + F.sum("c").over(w_in))
        .filter(F.col("cum") * 100 >= F.col("q") * F.col("n_total"))
        .groupBy("q")
        .agg(F.min("cents").alias("exact_disc_cents"))
    )
    return (
        sel.join(exact, "q")
        .selectExpr(
            "q",
            "bin_lo_cents",
            "bin_hi_cents",
            "CAST(exact_disc_cents AS BIGINT) AS exact_disc_cents",
            "n_total",
        )
        .orderBy("q")
    )


def hll_union_overlap(
    spark: SparkSession, sf_dir: str, m: int = HLL_M, rmax: int = HLL_RMAX
) -> DataFrame:
    """C123 (r5): HLL SET ALGEBRA between every source pair — union
    estimate from the register-wise MAX of the two sketches,
    intersection by inclusion-exclusion (n_a + n_b - n_union, clamped
    at 0), beside the exact overlap and its error in ppm. This is the
    100 TB path for `source_vocab_overlap`: the exact pair table costs
    a term-keyed self-join over the full vocabulary; the sketch path
    answers the same planner question from 64 ints per source — and
    this mart is the calibration readout that says when the cheap
    answer is good enough (the kmv/cms/hll same-pass-exact contract).

    All BIGINT end to end: register maxes, harmonic sums, the pinned
    alpha/linear-counting literals from the per-source sketch, and
    inclusion-exclusion on the corrected estimates.

    Plan/scale: sketches are built ONCE ((source, register, rho),
    m rows per source); pairs form at the SOURCE grain (dozens), each
    pair's union fold touches 2m rows — the whole pair stage is
    register-grain work, never vocabulary-grain. The exact column is
    the small-SF calibration; at production scale drop it and keep
    the sketch algebra (same contract as hll_distinct_terms).
    """
    from ..functions.exact import ppm_expr

    d = load_table(spark, sf_dir, "documents")
    regs = hll_registers(d, m=m, rmax=rmax).localCheckpoint(eager=False)
    est = hll_estimate(regs, m=m, rmax=rmax).select(
        "source", F.col("n_estimated").alias("n_est")
    )
    srcs = regs.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("source_a"))
        .crossJoin(srcs.select(F.col("source").alias("source_b")))
        .filter(F.col("source_a") < F.col("source_b"))
    )
    ra = pairs.join(regs, pairs.source_a == regs.source).select(
        "source_a", "source_b", "register", "rho"
    )
    rb = pairs.join(regs, pairs.source_b == regs.source).select(
        "source_a", "source_b", "register", "rho"
    )
    union_regs = (
        ra.unionByName(rb)
        .groupBy("source_a", "source_b", "register")
        .agg(F.max("rho").cast("int").alias("rho"))
    )
    union_est = hll_estimate(
        union_regs, m=m, rmax=rmax, key_cols=("source_a", "source_b")
    ).select("source_a", "source_b", F.col("n_estimated").alias("n_union_est"))
    ea = est.select(F.col("source").alias("source_a"), F.col("n_est").alias("n_a_est"))
    eb = est.select(F.col("source").alias("source_b"), F.col("n_est").alias("n_b_est"))
    st = (
        d.select("source", F.explode(norm_tokens(F.col("text"))).alias("term"))
        .distinct()
    )
    sa, sb = st.alias("sa"), st.alias("sb")
    exact = (
        sa.join(sb, F.col("sa.term") == F.col("sb.term"))
        .filter(F.col("sa.source") < F.col("sb.source"))
        .groupBy(
            F.col("sa.source").alias("source_a"), F.col("sb.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("n_overlap_exact"))
    )
    return (
        union_est.join(F.broadcast(ea), "source_a")
        .join(F.broadcast(eb), "source_b")
        .join(F.broadcast(exact), ["source_a", "source_b"], "left")
        .selectExpr(
            "source_a",
            "source_b",
            "CAST(n_a_est AS BIGINT) AS n_a_est",
            "CAST(n_b_est AS BIGINT) AS n_b_est",
            "CAST(n_union_est AS BIGINT) AS n_union_est",
            "CAST(greatest(n_a_est + n_b_est - n_union_est, 0) AS BIGINT)"
            " AS n_overlap_est",
            "CAST(coalesce(n_overlap_exact, 0) AS BIGINT) AS n_overlap_exact",
            "CAST("
            + ppm_expr(
                "abs(greatest(n_a_est + n_b_est - n_union_est, 0)"
                " - coalesce(n_overlap_exact, 0))",
                "greatest(coalesce(n_overlap_exact, 0), 1)",
            )
            + " AS BIGINT) AS abs_err_ppm",
        )
        .orderBy("source_a", "source_b")
    )
