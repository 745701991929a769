"""Vector aggregation operators over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import norm, to_double
from ..sources.registry import load_table
from .relational import r6


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding statistics: count, mean L2 norm, and the
    per-dimension mean of the first 4 dimensions.

    Element-wise means via posexplode + groupBy would shuffle
    n_rows x dim rows; for fixed probe dimensions the projection
    stays columnar (element_at) and the aggregate is map-side
    combinable. A full-centroid variant at scale uses
    ``F.aggregate`` over a summed array accumulator instead.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = to_double(F.col("embedding"))
    return (
        e.select("label", norm(v).alias("nrm"), *[
            F.element_at(v, i + 1).alias(f"d{i}") for i in range(4)
        ])
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            r6(F.avg("nrm")).alias("avg_norm"),
            *[r6(F.avg(f"d{i}")).alias(f"mean_d{i}") for i in range(4)],
        )
    )


def quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector — the feature-store /
    ANN-index prep step: scale = max|v|/127, q_i = floor(v_i/scale +
    0.5). Emits the scale and integer checksums rather than the int8
    array itself so the verification row stays narrow; all arithmetic
    is Catalyst fold/transform (no UDF), deterministic across
    engines (floor(x+0.5) instead of engine-specific round-half
    rules)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = to_double(F.col("embedding"))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.greatest(maxabs, F.lit(1e-12)) / 127.0
    q = F.transform(v, lambda x: F.floor(x / scale + 0.5).cast("long"))
    return e.select(
        "vec_id",
        r6(scale).alias("scale"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q_sum"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)).alias("q_l1"),
        F.array_max(q).alias("q_max"),
        F.array_min(q).alias("q_min"),
    )


def tfidf_top_terms(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k tokens per source by TF-IDF (ln(n_sources/df) idf,
    term-frequency within source). Explode -> two aggregations ->
    window top-k; every stage map-side combinable, one shuffle per
    aggregation. Deterministic tiebreak on token."""
    from pyspark.sql import Window

    from ..functions.textfns import norm_tokens

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(norm_tokens(F.col("text"))).alias("token"))
    tf = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    n_sources = d.select("source").distinct().count()
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    # rank on the ROUNDED score: ln() differs in the last ulp across
    # engines, and distinct (tf, df) pairs can be mathematically equal
    # (2*ln4 == 4*ln2) — rounding makes the ordering engine-invariant,
    # the token tiebreak makes it total
    scored = tf.join(F.broadcast(df_), on="token").withColumn(
        "tfidf", r6(F.col("tf") * F.log(F.lit(float(n_sources)) / F.col("df")))
    )
    w = Window.partitionBy("source").orderBy(
        F.col("tfidf").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("source", "rank", "token", "tfidf")
    )


def embedding_norm_outliers(
    spark: SparkSession, sf_dir: str, k: float = 3.0, approx: bool = False
) -> DataFrame:
    """Vector QA: per-label robust SPIKE outliers — a vector whose
    largest |component| sits k MADs from its label's median is
    concentrated in few dimensions (dead-feature collapse, wrong
    model, corrupt row). The L2 norm is reported alongside but is
    NOT the flag statistic: this corpus (like most production
    embedding stores) is unit-normalized, so norms are constant and
    spikiness is the informative per-vector scalar.

    Median/MAD are order statistics, not running float sums, so both
    engines interpolate the same doubles and the flag decision is
    engine-invariant; the spike is 6dp-rounded AT THE PROJECTION so
    every downstream stat derives from bit-identical doubles.
    ``approx=True`` switches to percentile_approx for the 100 TB
    path (exact per-label percentiles funnel each label through one
    reducer); the exact path is oracle-matched at test SF.

    Shape mirrors length_outliers: one narrow projection feeds two
    tiny per-label aggregates joined back broadcast.
    """
    pct = (
        (lambda c: F.percentile_approx(c, 0.5))
        if approx
        else (lambda c: F.percentile(c, F.lit(0.5)))
    )
    v = to_double(F.col("embedding"))
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        r6(norm(v)).alias("l2_norm"),
        r6(F.array_max(F.transform(v, F.abs))).alias("spike"),
    )
    med = e.groupBy("label").agg(pct(F.col("spike")).alias("label_median"))
    with_med = e.join(F.broadcast(med), "label")
    mad = with_med.groupBy("label").agg(
        pct(F.abs(F.col("spike") - F.col("label_median"))).alias("label_mad")
    )
    return (
        with_med.join(F.broadcast(mad), "label")
        .filter(F.abs(F.col("spike") - F.col("label_median")) > k * F.col("label_mad"))
        .select(
            "vec_id",
            "label",
            "l2_norm",
            "spike",
            r6(F.col("label_median")).alias("label_median"),
            r6(F.col("label_mad")).alias("label_mad"),
        )
    )


def label_separability(spark: SparkSession, sf_dir: str, dim: int = 64) -> DataFrame:
    """Class-separability QA: pairwise Euclidean distance between
    per-label embedding centroids — near-zero inter-centroid distance
    means two labels are not separable in this embedding space (the
    check that catches a collapsed projection head or mislabeled
    slices before training on the labels).

    Centroids are per-dim averages ROUNDED AT 6dp (identical doubles
    on both engines, same idiom as the k-means oracle); the pairwise
    stage is a self-join over one row per label — broadcast-tiny
    regardless of corpus size. The only corpus-scale work is the one
    centroid aggregate.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = to_double(F.col("embedding"))
    cents = e.groupBy("label").agg(
        *[F.round(F.avg(F.element_at(v, i + 1)), 6).alias(f"m{i}") for i in range(dim)]
    )
    a = cents.select(F.col("label").alias("label_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(dim)])
    b = cents.select(F.col("label").alias("label_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(dim)])
    d2 = None
    for i in range(dim):
        t = (F.col(f"a{i}") - F.col(f"b{i}")) * (F.col(f"a{i}") - F.col(f"b{i}"))
        d2 = t if d2 is None else d2 + t
    return (
        a.join(F.broadcast(b), F.col("label_a") < F.col("label_b"))
        .select("label_a", "label_b", F.round(F.sqrt(d2), 6).alias("centroid_dist"))
    )


def embedding_covariance(
    spark: SparkSession, sf_dir: str, dim: int = 8
) -> DataFrame:
    """Covariance matrix of the first ``dim`` embedding dimensions
    (upper triangle incl. diagonal — dim*(dim+1)/2 rows): the
    redundancy/anisotropy diagnostic an embedding pipeline checks
    before PCA-whitening or dimension pruning (near-zero variance
    dims and highly correlated pairs are wasted index bytes).

    One corpus pass: every E[xi*xj] moment is a conditional avg in
    the SAME aggregate (map-side combinable, k(k+1)/2 + k running
    sums per task), then covariances assemble on the 1-row result —
    no per-pair scans, no shuffle beyond the single global aggregate.
    At full 100 TB width (dim=64 -> 2080 moments) the same plan
    holds; memory per task stays a few KB of accumulators.
    """
    e = load_table(spark, sf_dir, "embeddings")
    v = to_double(F.col("embedding"))
    x = [F.element_at(v, i + 1) for i in range(dim)]
    aggs = [F.avg(x[i]).alias(f"m{i}") for i in range(dim)]
    aggs += [
        F.avg(x[i] * x[j]).alias(f"p{i}_{j}")
        for i in range(dim)
        for j in range(i, dim)
    ]
    moments = e.agg(*aggs)
    rows = [
        F.struct(
            F.lit(i).cast("int").alias("dim_i"),
            F.lit(j).cast("int").alias("dim_j"),
            F.round(F.col(f"p{i}_{j}") - F.col(f"m{i}") * F.col(f"m{j}"), 6).alias("cov"),
        )
        for i in range(dim)
        for j in range(i, dim)
    ]
    return (
        moments.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.dim_i", "r.dim_j", "r.cov")
    )


def pca_top_component(
    spark: SparkSession, sf_dir: str, dim: int = 8, n_iter: int = 4
) -> DataFrame:
    """Top principal component of the first ``dim`` embedding
    dimensions by deterministic power iteration on the covariance
    matrix — the dominant-direction diagnostic (anisotropy, rogue
    dimension detection) run before whitening or dimension pruning.

    The corpus is touched ONCE: the same single-pass moment aggregate
    as embedding_covariance. Everything after operates on the
    dim x dim covariance values — bounded by embedding width, never
    by data — as a driver-side float fold (r11; the documented
    bounded driver-fold class). Determinism contract: v0 = 1/sqrt(dim), each
    iterate is normalized then rounded to 6dp, so both engines walk
    identical vector sequences and the DuckDB oracle unrolls the same
    iterations as CTEs. Output: one row per dimension with the
    loading, plus the Rayleigh-quotient eigenvalue estimate.
    """
    cov, vec = _pca_power(spark, sf_dir, dim, n_iter)
    # Rayleigh quotient lambda = v' C v (v is unit up to rounding) —
    # dim^2 driver floats, same left-to-right fold as the matvec
    cv = [_r6d(sum(cov[i][j] * vec[j] for j in range(dim))) for i in range(dim)]
    lam = _r6d(sum(cv[i] * vec[i] for i in range(dim)))
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("dim_i", T.IntegerType()),
            T.StructField("loading", T.DoubleType()),
            T.StructField("eigenvalue", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(
        [(j, vec[j], lam) for j in range(dim)], schema
    )


def _r6d(val: float) -> float:
    """Driver-side twin of the r6 Column helper: Spark's
    ``round(double, 6)`` goes through ``BigDecimal.valueOf`` (the
    shortest round-trip decimal string of the double) and HALF_UP at
    scale 6 — ``Decimal(repr(x))`` is the identical shortest string,
    quantized the identical way, so the folded double is the one the
    JVM expression would have produced."""
    from decimal import ROUND_HALF_UP, Decimal

    if val != val or val in (float("inf"), float("-inf")):
        return val
    return float(Decimal(repr(val)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def _pca_power(
    spark: SparkSession, sf_dir: str, dim: int, n_iter: int
) -> tuple[list[list[float]], list[float]]:
    """Shared power-iteration core: returns (cov matrix, unit
    eigenvector) as plain dim-sized python floats.

    r11 (guide §1.2 + the documented bounded driver-fold class): the
    corpus is touched ONCE — the same single-pass moment aggregate —
    collected as one row (dim + dim*(dim+1)/2 doubles, bounded by
    embedding width, never by data). The power iteration itself is
    dim x dim arithmetic; the r10 form ran it as n_iter tiny
    DataFrame joins with an EAGER localCheckpoint per iterate (plus
    one for the cov rows), which cost ~30 Spark jobs / ~3s of pure
    orchestration per pca_* key at sf0.1 for 8x8 floats. Algebra is
    verbatim: cov c_ij = r6(p_ij - m_i * m_j) on the exact moment
    doubles, each matvec component r6-rounded, normalized by
    sqrt(sum wx^2), v0 = round(1/sqrt(dim), 6) — the same 6dp-rounded
    iterate sequence both engines walk (the DuckDB oracle unrolls the
    identical CTEs; the per-sum float order differs across engines by
    construction and the 6dp rounding is the documented shield)."""
    e = load_table(spark, sf_dir, "embeddings")
    v = to_double(F.col("embedding"))
    x = [F.element_at(v, i + 1) for i in range(dim)]
    aggs = [F.avg(x[i]).alias(f"m{i}") for i in range(dim)]
    aggs += [
        F.avg(x[i] * x[j]).alias(f"p{i}_{j}")
        for i in range(dim)
        for j in range(i, dim)
    ]
    mo = e.agg(*aggs).first()  # ONE corpus job, one bounded row
    cov = [
        [
            _r6d(
                mo[f"p{min(i, j)}_{max(i, j)}"]
                - mo[f"m{min(i, j)}"] * mo[f"m{max(i, j)}"]
            )
            for j in range(dim)
        ]
        for i in range(dim)
    ]
    v0 = round(1.0 / dim**0.5, 6)
    vec = [v0] * dim
    import math

    for _ in range(n_iter):
        w = [_r6d(sum(cov[i][j] * vec[j] for j in range(dim))) for i in range(dim)]
        nn = math.sqrt(sum(wx * wx for wx in w))
        vec = [_r6d(wx / nn) for wx in w]
    return cov, vec


def pca_projection_outliers(
    spark: SparkSession, sf_dir: str, dim: int = 8, n_iter: int = 4, z_cap: float = 3.0
) -> DataFrame:
    """APPLY the learned top principal component (the transform twin
    of pca_top_component, same learn->apply discipline as the BPE
    pair): project every embedding onto the dominant direction and
    flag |z| > ``z_cap`` projection outliers — the rogue-vector QA
    pass an embedding pipeline runs after indexing.

    The eigenvector is dim driver floats (r11 driver fold); the
    projection is a fixed left-to-right dot-product expression over
    literal loadings (same association order in the oracle, so
    doubles match bit-for-bit before rounding); mean/std of the
    projection come from one 1-row aggregate, broadcast back — two
    corpus passes total, no shuffle wider than the global aggregate.
    """
    _cov, vec = _pca_power(spark, sf_dir, dim, n_iter)
    e = load_table(spark, sf_dir, "embeddings")
    v = to_double(F.col("embedding"))
    # loadings are dim driver floats (r11): literal coefficients in the
    # projection expression — same doubles, same left-to-right
    # association — instead of a pivot + crossJoin of a 1-row frame
    proj_expr = None
    for j in range(dim):
        term = F.lit(vec[j]) * F.element_at(v, j + 1)
        proj_expr = term if proj_expr is None else proj_expr + term
    projected = e.select("vec_id", "label", r6(proj_expr).alias("proj"))
    stats = projected.agg(
        F.avg("proj").alias("mu"), F.stddev_pop("proj").alias("sd")
    )
    # sd == 0 guard (degenerate all-equal projections): Spark's
    # divide-by-zero yields NULL while DuckDB's IEEE division yields
    # inf/nan — pin both engines to NULL via an explicit predicate
    # (ADVICE r3; same null-on-degenerate pattern as
    # classifier_pr_curve)
    z = F.when(F.col("sd") > 0, (F.col("proj") - F.col("mu")) / F.col("sd"))
    return (
        projected.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            "label",
            "proj",
            r6(z).alias("z_score"),
            (F.abs(r6(z)) > z_cap).alias("is_outlier"),
        )
    )


def _pq_sq_e6() -> F.Column:
    """e6-frozen BIGINT component array of the embedding column."""
    return F.transform(
        to_double(F.col("embedding")), lambda x: F.round(x * 1_000_000.0).cast("long")
    )


def _pq_d2c(a: F.Column, b: F.Column) -> F.Column:
    """Exact BIGINT squared L2 between two frozen component arrays
    (column form — usable inside higher-order-function lambdas)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _pq_d2(a: str, b: str) -> F.Column:
    """Exact BIGINT squared L2 between two frozen component arrays."""
    return _pq_d2c(F.col(a), F.col(b))


def _pq_tall(e: DataFrame, n_sub: int) -> DataFrame:
    """(vec_id, sub, sv) e6-frozen sub-vector frame of any frame with
    (vec_id, embedding) columns — shared by the batch PQ family and
    the streaming ANN index fold (which quantizes ARRIVING batches
    with frozen codebooks, so it needs the tall build off a batch
    frame, not a table path)."""
    v = _pq_sq_e6()
    dim_per = 64 // n_sub
    return e.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("sub"),
                    F.slice(v, s * dim_per + 1, dim_per).alias("sv"),
                )
                for s in range(n_sub)
            ])
        ).alias("x"),
    ).select("vec_id", F.col("x.sub").alias("sub"), F.col("x.sv").alias("sv"))


def _pq_frames(spark, sf_dir, n_sub: int, codes_per_sub: int):
    """(tall sub-vector frame, md5-bottom-k codebook) shared by the
    C129 distortion audit and the C130 ADC search tier."""
    e = load_table(spark, sf_dir, "embeddings")
    tall = _pq_tall(e, n_sub)
    h = F.md5(F.concat(F.col("vec_id").cast("string"), F.lit(":"), F.col("sub").cast("string")))
    wcb = Window.partitionBy("sub").orderBy("h", "vec_id")
    codebook = (
        tall.withColumn("h", h)
        .withColumn("rk", F.row_number().over(wcb))
        .filter(F.col("rk") <= codes_per_sub)
        .select(
            F.col("sub").alias("c_sub"),
            (F.col("rk") - 1).cast("long").alias("code"),
            F.col("sv").alias("cv"),
        )
    )
    return tall, codebook


def _pq_trained_cb(
    tall: DataFrame, codebook: DataFrame, n_iter: int = 2, dim_per: int = 16
) -> DataFrame:
    """Trained PQ codebook (VERDICT r9 task 3): Lloyd k-means run
    INSIDE each subspace on the e6-frozen integer sub-vectors,
    initialised from the md5 bottom-k ``codebook`` (the documented
    no-RNG baseline a trained codebook must beat — training starts
    FROM the baseline, so the comparison is an ablation of the Lloyd
    iterations alone). Per iteration: exact-BIGINT nearest-code
    assignment ((d2, code) tiebreak — ``_pq_codes``), then codeword =
    per-dimension mean of its members ROUNDED BACK to an integer
    (``round(avg)``), keeping every distance in the exact-BIGINT e6
    domain, so the whole training walk is engine-reproducible and the
    DuckDB twin unrolls the identical iterations (the C33 kmeans
    oracle pattern). Codes no member chooses drop out (same as the
    batch kmeans contract).

    Scale: each iteration is one broadcast assignment pass over the
    (vec x subspace) tall frame + a (n_sub x codes_per_sub x dim_per)
    mean shuffle; the codebook is localCheckpointed per round so plan
    depth stays constant in n_iter. avg() over e6 ints is exact in
    double below 2^53 — corpus sums reach ~2e11 at sf0.1."""
    cb = codebook
    for _ in range(n_iter):
        # r11: keep_sv carries the member sub-vector through the
        # packed assignment — no (vec_id, sub) re-join with tall —
        # and the per-iteration checkpoint is lazy (no driver read
        # exists in the loop)
        members = _pq_codes(tall, cb, keep_sv=True)
        means = members.groupBy(
            F.col("sub").alias("c_sub"), F.col("code")
        ).agg(
            *[
                F.round(F.avg(F.col("sv")[i])).cast("long").alias(f"m{i}")
                for i in range(dim_per)
            ]
        )
        cb = means.select(
            "c_sub",
            "code",
            F.array(*[F.col(f"m{i}") for i in range(dim_per)]).alias("cv"),
        ).localCheckpoint(eager=False)
    return cb


def _pq_codes(tall: DataFrame, codebook: DataFrame, keep_sv: bool = False) -> DataFrame:
    """Nearest-code assignment (vec_id, sub, code, d2) — exact BIGINT
    distances, (d2, code) tiebreak.

    r11 (guide §4.2 + VERDICT r10 task 6): the codebook is a BOUNDED
    table (n_sub x codes_per_sub codewords — knobs, never data-sized),
    so it is collected once (the documented bounded driver-fold class)
    and the assignment runs as ONE vectorized numpy pass over the tall
    frame — no join, no window Exchange+Sort, and no interpreted
    higher-order-function distance lambdas (a packed-broadcast
    array_min form was tried first and measured 15-30% SLOWER than the
    r10 broadcast-join it replaced: HOF lambdas are interpreted and
    the packed row's candidate arrays were copied per row). All
    arithmetic is int64 (e6-frozen components, exact squared L2), so
    the numpy fold is bit-identical to the JVM expressions; argmin
    over code-ascending candidates IS the (d2 asc, code asc) tiebreak
    (np.argmin returns the first minimum). Rows whose sub has no
    codebook entries are dropped — the old inner-join parity.
    ``keep_sv=True`` carries the sub-vector through, so the training
    loop's members frame needs no (vec_id, sub) re-join with tall."""
    import numpy as np

    by_sub: dict[int, list[tuple[int, list[int]]]] = {}
    for r in codebook.select("c_sub", "code", "cv").collect():
        by_sub.setdefault(int(r["c_sub"]), []).append((int(r["code"]), list(r["cv"])))
    cb = {
        s: (
            np.array([c for c, _ in sorted(entries)], dtype=np.int64),
            np.array([v for _, v in sorted(entries)], dtype=np.int64),
        )
        for s, entries in by_sub.items()
    }

    def assign(batches):
        import numpy as np
        import pandas as pd

        for b in batches:
            if not len(b):
                continue
            sub = b["sub"].to_numpy()
            sv = np.stack(b["sv"].to_numpy()).astype(np.int64, copy=False)
            n = len(b)
            keep = np.zeros(n, dtype=bool)
            code_o = np.zeros(n, dtype=np.int64)
            d2_o = np.zeros(n, dtype=np.int64)
            for s, (codes_arr, mat) in cb.items():
                m = sub == s
                if not m.any():
                    continue
                diff = sv[m][:, None, :] - mat[None, :, :]
                d2 = (diff * diff).sum(axis=2)
                idx = d2.argmin(axis=1)
                code_o[m] = codes_arr[idx]
                d2_o[m] = d2[np.arange(len(idx)), idx]
                keep[m] = True
            out = {
                "vec_id": b["vec_id"].to_numpy()[keep],
                "sub": sub[keep],
                "code": code_o[keep],
                "d2": d2_o[keep],
            }
            if keep_sv:
                out["sv"] = b["sv"].to_numpy()[keep]
            yield pd.DataFrame(out)

    schema = "vec_id long, sub int, code long, d2 long" + (
        ", sv array<long>" if keep_sv else ""
    )
    return tall.mapInPandas(assign, schema)


def pq_codebook_stats(
    spark: SparkSession,
    sf_dir: str,
    n_sub: int = 4,
    codes_per_sub: int = 16,
) -> DataFrame:
    """C129 (r5): product-quantization codebook build + assignment
    audit (Jegou et al., PAMI 2011) — the third classic vector-index
    compression beside scalar int8 (`quantize_embeddings`) and IVF
    partitioning (`ann_ivf_topk`): split the 64-dim embedding into
    ``n_sub`` 16-dim subspaces, give each subspace a
    ``codes_per_sub``-entry codebook, assign every sub-vector to its
    nearest codeword, and report the distortion a PQ index would pay.

    Codebooks are md5-sampled corpus sub-vectors (bottom-k hash — the
    reproducible no-RNG sampling discipline; a trained k-means
    codebook drops in behind the same contract, this is the unbiased
    baseline the training would have to beat). Components are frozen
    to e6 integers, so every squared distance is an exact BIGINT
    (bounded by 16 * (2e6)^2 ~ 6.4e13) and assignment ties break on
    code id — the whole mart is hash-exact across engines.

    Output per (subspace, code): vectors assigned, exact total
    distortion (DECIMAL(38,0)-summed, BIGINT-emitted), and the
    subspace totals repeated per row for one-subtraction reading.

    Plan/scale: the tall (vec x subspace) frame is built by one
    bounded explode (n_sub literals); codebooks are k rows per
    subspace (window over md5 order); assignment is a broadcast join
    against n_sub * codes_per_sub codewords + one argmin window — the
    IVF assignment shape. No all-pairs, no driver fold.
    """
    tall, codebook = _pq_frames(spark, sf_dir, n_sub, codes_per_sub)
    best = _pq_codes(tall, codebook)
    D38 = "decimal(38,0)"
    per_code = best.groupBy("sub", "code").agg(
        F.count(F.lit(1)).cast("long").alias("n_assigned"),
        F.sum(F.col("d2").cast(D38)).cast(D38).cast("long").alias("distortion"),
    )
    per_sub = per_code.groupBy("sub").agg(
        F.sum("n_assigned").cast("long").alias("sub_n"),
        F.sum(F.col("distortion").cast(D38)).cast(D38).cast("long").alias("sub_distortion"),
    )
    return (
        per_code.join(per_sub, "sub")
        .select(
            F.col("sub").cast("long").alias("sub"),
            "code",
            "n_assigned",
            "distortion",
            "sub_n",
            "sub_distortion",
        )
        .orderBy("sub", "code")
    )


def pq_adc_recall(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_sub: int = 4,
    codes_per_sub: int = 16,
    train_iters: int = 2,
) -> DataFrame:
    """C130 (r5): PQ asymmetric-distance (ADC) top-k search + recall
    audit — turns the C129 codebooks into an actual index tier
    (Jegou et al.'s ADC: the QUERY stays full precision, the database
    is its 4 codes, distance = sum over subspaces of a precomputed
    query-to-codeword lookup). Recall is audited against the EXACT
    integer L2 top-k computed in the same frame, so the number
    measures pure quantization loss — no float, no cross-metric
    noise; everything is BIGINT-exact and hash-checkable.

    Plan/scale — the reason PQ exists: per query the database cost is
    a LUT join on (sub, code) over the CODES table (4 small ints per
    vector, not 64 floats) + one sum; the LUT itself is n_queries x
    n_sub x codes_per_sub rows (bounded, broadcast). The exact-truth
    side is the brute-force audit (query-broadcast like C7) — at
    scale you'd sample it; here the query set is the bound.

    Output per query: n_hits, recall_ppm, adc_d2_sum (ADC distance
    mass of its picks), true_d2_sum (exact mass of the true top-k).
    ADC distances are an APPROXIMATION, not a bound — a codeword can
    sit closer to the query than the original sub-vector, so adc_d2
    can under- or over-estimate the true distance per pair; the
    invariant that does hold is that the picks' EXACT distance mass
    is >= the true top-k's mass (the true top-k minimizes it), which
    is what recall_ppm measures against (ADVICE r5 docstring fix).

    Trained-vs-baseline comparison (VERDICT r9 task 3): the output
    carries a ``codebook`` label — 'baseline' rows use the md5
    bottom-k codebook, 'trained' rows the same codebook refined by
    ``train_iters`` Lloyd iterations per subspace
    (``_pq_trained_cb``); both score against the ONE exact truth,
    so the recall delta is pure codebook quality.
    """
    from ..functions.exact import ppm_expr as _ppm_e
    from .scale import partial_topk

    tall, codebook = _pq_frames(spark, sf_dir, n_sub, codes_per_sub)
    q_tall = tall.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("sub").alias("q_sub"), F.col("sv").alias("qv")
    )

    def adc_k_for(cb: DataFrame) -> DataFrame:
        # ADC = codes join the broadcast (query, sub, code) -> lut_d2
        # table, summed per (q_id, vec_id): one broadcast hash join +
        # one map-side-combinable groupBy at (codes x queries) grain.
        # r11 note: a packed one-row-LUT variant (explode + aggregate
        # + map/array lookups per row) was tried and measured SLOWER —
        # interpreted HOF lambdas against a codegen'd join+aggregate.
        codes = _pq_codes(tall, cb).select("vec_id", "sub", "code")
        lut = q_tall.join(
            F.broadcast(cb), F.col("q_sub") == F.col("c_sub")
        ).select(
            "q_id",
            F.col("q_sub").alias("sub"),
            "code",
            _pq_d2("qv", "cv").alias("lut_d2"),
        )
        adc = (
            codes.join(F.broadcast(lut), ["sub", "code"])
            .filter(F.col("vec_id") != F.col("q_id"))
            .groupBy("q_id", "vec_id")
            .agg(F.sum("lut_d2").cast("long").alias("adc_d2"))
        )
        adc_top = partial_topk(adc, ["q_id"], "adc_d2", "vec_id", k, ascending=True)
        wa = Window.partitionBy("q_id").orderBy(
            F.col("adc_d2").asc(), F.col("vec_id").asc()
        )
        return (
            adc_top.withColumn("rk", F.row_number().over(wa))
            .filter(F.col("rk") <= k)
            .select("q_id", "vec_id", "adc_d2")
        )

    # exact integer truth on the full frozen vectors
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", _pq_sq_e6().alias("fv"))
    q_full = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("fv").alias("qfv")
    )
    exact = e.join(F.broadcast(q_full), F.col("vec_id") != F.col("q_id")).select(
        "q_id", "vec_id", _pq_d2("fv", "qfv").alias("true_d2")
    )
    exact_top = partial_topk(exact, ["q_id"], "true_d2", "vec_id", k, ascending=True)
    we = Window.partitionBy("q_id").orderBy(F.col("true_d2").asc(), F.col("vec_id").asc())
    truth_k = (
        exact_top.withColumn("rk", F.row_number().over(we))
        .filter(F.col("rk") <= k)
        .select("q_id", "vec_id", "true_d2")
    )
    truth_ids = truth_k.select("q_id", "vec_id")
    true_mass = truth_k.groupBy("q_id").agg(
        F.sum("true_d2").cast("long").alias("true_d2_sum")
    )
    trained = _pq_trained_cb(tall, codebook, n_iter=train_iters, dim_per=64 // n_sub)
    out = None
    for label, cb in (("baseline", codebook), ("trained", trained)):
        adc_k = adc_k_for(cb)
        hits = adc_k.join(truth_ids, ["q_id", "vec_id"], "left_semi")
        per_q_hits = hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hits"))
        adc_mass = adc_k.groupBy("q_id").agg(
            F.sum("adc_d2").cast("long").alias("adc_d2_sum")
        )
        rows = (
            true_mass.join(adc_mass, "q_id")
            .join(per_q_hits, "q_id", "left")
            .selectExpr(
                f"'{label}' AS codebook",
                "q_id",
                "CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits",
                f"CAST({_ppm_e('coalesce(n_hits, 0)', str(k))} AS BIGINT) AS recall_ppm",
                "adc_d2_sum",
                "true_d2_sum",
            )
        )
        out = rows if out is None else out.unionByName(rows)
    return out.orderBy("codebook", "q_id")


def sq_int8_recall(
    spark: SparkSession, sf_dir: str, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """C155 (r10): recall@k of int8 scalar-quantized max-inner-product
    search against the exact dot-product truth — the audit that
    prices C24's symmetric int8 quantization the way `pq_adc_recall`
    prices PQ: both sides rank by INNER PRODUCT (MIPS, the embedding-
    serving mode where norms carry signal), so the measurement
    isolates QUANTIZATION loss alone, not a normalization change.

    Exactness: codes are C24's floor(x/scale + 0.5) BIGINTs verbatim
    (scale = max|v|/127 per vector); the approximate score is a pure
    BIGINT integer dot of two code arrays — no float accumulates —
    and truth uses the 6dp-rounded double dot with vec_id ties, the
    proven C7 discipline.

    Plan/scale: queries broadcast both ways; the corpus streams once
    per side with map-side ``partial_topk`` (C7's shape); the recall
    join is on tiny top-k sets. int8 at 64 dims means the quantized
    scorer reads 64 small ints per candidate — the memory-bandwidth
    win that makes SQ the first rung of the quantization ladder
    (int8 -> PQ -> IVFADC, all priced by their own audit keys).
    """
    from pyspark.sql import Window

    from ..functions.vectors import dot, to_double
    from .relational import r6
    from .scale import partial_topk

    e = load_table(spark, sf_dir, "embeddings")
    v = to_double(F.col("embedding"))
    corpus = e.select("vec_id", v.alias("vec"))
    scale = F.greatest(
        F.array_max(F.transform(F.col("vec"), lambda x: F.abs(x))), F.lit(1e-12)
    ) / 127.0
    codes = corpus.select(
        "vec_id",
        F.transform(
            F.col("vec"), lambda x: F.floor(x / scale + 0.5).cast("long")
        ).alias("qv"),
    )

    def topk(frame, id_col, vec_col, score):
        queries = frame.filter(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_v")
        )
        scored = frame.join(
            F.broadcast(queries), F.col(id_col) != F.col("q_id")
        ).select(
            "q_id", F.col(id_col).alias("vec_id"), score(F.col("q_v"), F.col(vec_col)).alias("s")
        )
        pruned = partial_topk(scored, ["q_id"], "s", "vec_id", k, ascending=False)
        w = Window.partitionBy("q_id").orderBy(F.col("s").desc(), F.col("vec_id").asc())
        return (
            pruned.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("q_id", F.col("vec_id").alias("neighbor_id"))
        )

    truth = topk(corpus, "vec_id", "vec", lambda a, b: r6(dot(a, b)))
    approx = topk(
        codes,
        "vec_id",
        "qv",
        lambda a, b: F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    # both sides are k-rows-per-query sets — broadcast the approx
    # list so the recall join never sort-merges two tiny frames
    hits = truth.join(F.broadcast(approx), ["q_id", "neighbor_id"], "left_semi")
    per_q = hits.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_hits"))
    base = truth.select("q_id").distinct()
    return base.join(F.broadcast(per_q), "q_id", "left").select(
        "q_id",
        F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        r6(F.coalesce("n_hits", F.lit(0)) / float(k)).alias("recall"),
    )
