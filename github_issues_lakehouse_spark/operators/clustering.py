"""Distributed k-means over the ``embeddings`` table.

Lloyd's algorithm expressed as pure DataFrame plans: each iteration
is one broadcast-join assignment pass over the corpus plus one
map-side-combinable per-dimension average. No driver-side collect —
the centroid table stays a k-row DataFrame end to end.

Determinism (and hence a DuckDB oracle twin, unrolled to the same
iteration count): init centroids are the first k corpus vectors,
distances are rounded to 6dp before the argmin (ties break on
centroid id), and recomputed centroid components are rounded to 6dp
— so both engines walk identical centroid sequences.

Scale: the corpus is scanned once per iteration (inherent to Lloyd);
the assignment is a broadcast nested-loop over k centroids (k rows —
always broadcastable), the re-estimation shuffles k×dim partial sums
only. At 100 TB with large k, swap the init for k-means|| sampling
and keep the identical iteration plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot, norm, to_double
from ..sources.registry import load_table
from .relational import r6

DIM = 64  # embeddings table vector width (TESTDATA.md)


def _assign(corpus: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: argmin of squared L2, 6dp-rounded,
    ties on centroid id.

    r10 optimization (guide §2.4 "remove shuffles outright"): the
    centroid table is packed into ONE broadcast row of (c_id, c_vec)
    structs and the argmin is a pure array expression —
    array_min(transform(cents, c -> struct(d2, c_id))) — so the
    assignment is a NARROW map over the corpus. The r9 form exploded
    corpus x k rows through a crossJoin and ran a row_number window
    (one full Exchange + Sort of the exploded frame) per assignment
    call. Struct ordering is lexicographic (d2 asc, then c_id asc) —
    exactly the window's (d2 asc, c_id asc) rank-1 row, so every
    assignment (and every downstream centroid walk) is unchanged."""
    dist = lambda cv: r6(  # noqa: E731 — verbatim assignment algebra
        dot(F.col("vec"), F.col("vec"))
        - 2 * dot(F.col("vec"), cv)
        + dot(cv, cv)
    )
    cents_row = cents.agg(
        F.sort_array(F.collect_list(F.struct("c_id", "c_vec"))).alias("_cents")
    )
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(dist(c["c_vec"]).alias("d2"), c["c_id"].alias("c_id")),
        )
    )
    return (
        corpus.crossJoin(F.broadcast(cents_row))
        .filter(F.size("_cents") > 0)  # empty-centroid set: no rows (r9 parity)
        .select(
            "vec_id",
            "vec",
            best["c_id"].alias("cluster"),
            best["d2"].alias("d2"),
        )
    )


def _recompute(assigned: DataFrame, dim: int = DIM) -> DataFrame:
    """New centroid = per-dimension mean of members, 6dp-rounded.
    One groupBy with dim avg aggregates — partial aggregation on the
    map side ships k×dim sums per task, never vectors."""
    aggs = [r6(F.avg(F.col("vec")[i])).alias(f"m{i}") for i in range(dim)]
    means = assigned.groupBy(F.col("cluster").alias("c_id")).agg(*aggs)
    return means.select(
        "c_id", F.array(*[F.col(f"m{i}") for i in range(dim)]).alias("c_vec")
    )


def _kmeans_parallel_init(
    corpus: DataFrame, k: int, rounds: int = 2, oversample: int | None = None
) -> DataFrame:
    """Deterministic k-means|| (Bahmani et al., VLDB 2012) seeding:
    start from the min-id vector, then ``rounds`` passes each sampling
    ~``oversample`` candidates with probability proportional to d² to
    the nearest existing candidate, finally keeping the k heaviest
    candidates (by count of corpus points nearest to them).

    All randomness is an md5 hash of (vec_id, round) — reproducible
    across engines/runs. Every step is a broadcast of the (small)
    candidate set + one corpus pass; the candidate set is
    localCheckpointed per round so the plan stays flat. This is the
    scale-correct init for large k: first-k init needs k densely
    distinct leading vectors; k-means|| spreads seeds by geometry in
    O(rounds) scans.
    """
    ell = oversample or 2 * k

    def d2_to(cands: DataFrame) -> DataFrame:
        dist = r6(
            dot(F.col("vec"), F.col("vec"))
            - 2 * dot(F.col("vec"), F.col("c_vec"))
            + dot(F.col("c_vec"), F.col("c_vec"))
        )
        return (
            corpus.crossJoin(F.broadcast(cands.select(F.col("vec").alias("c_vec"))))
            .select("vec_id", "vec", dist.alias("d2"))
            .groupBy("vec_id", "vec")
            .agg(F.min("d2").alias("d2"))
        )

    cand = corpus.orderBy("vec_id").limit(1).localCheckpoint(eager=True)
    for r in range(rounds):
        with_d2 = d2_to(cand)
        total = with_d2.agg(F.sum("d2").alias("_sum_d2"))
        u = (
            F.conv(
                F.substring(F.md5(F.concat_ws(":", F.col("vec_id"), F.lit(r))), 1, 8),
                16,
                10,
            ).cast("long")
            / F.lit(float(1 << 32))
        )
        sampled = (
            with_d2.crossJoin(F.broadcast(total))
            .filter(
                (F.col("_sum_d2") > 0)
                & (u < F.lit(float(ell)) * F.col("d2") / F.col("_sum_d2"))
            )
            .select("vec_id", "vec")
        )
        cand = (
            cand.select("vec_id", "vec")
            .unionByName(sampled)
            .dropDuplicates(["vec_id"])
            .localCheckpoint(eager=True)
        )
    # weight candidates by how much of the corpus they claim, keep top-k
    cvote = (
        corpus.crossJoin(
            F.broadcast(
                cand.select(F.col("vec_id").alias("cand_id"), F.col("vec").alias("c_vec"))
            )
        )
        .select(
            "vec_id",
            "cand_id",
            r6(
                dot(F.col("vec"), F.col("vec"))
                - 2 * dot(F.col("vec"), F.col("c_vec"))
                + dot(F.col("c_vec"), F.col("c_vec"))
            ).alias("d2"),
        )
    )
    w_near = Window.partitionBy("vec_id").orderBy(F.col("d2").asc(), F.col("cand_id").asc())
    weights = (
        cvote.withColumn("rn", F.row_number().over(w_near))
        .filter(F.col("rn") == 1)
        .groupBy("cand_id")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    w_rank = Window.orderBy(F.col("weight").desc(), F.col("cand_id").asc())
    topk = (
        weights.withColumn("rk", F.row_number().over(w_rank))
        .filter(F.col("rk") <= k)
        .select("cand_id", (F.col("rk") - 1).alias("c_id"))
    )
    return (
        cand.join(topk, cand.vec_id == topk.cand_id)
        .select(F.col("c_id").cast("long").alias("c_id"), F.col("vec").alias("c_vec"))
        .localCheckpoint(eager=True)
    )


def kmeans_embeddings(
    spark: SparkSession,
    sf_dir: str,
    k: int = 8,
    n_iter: int = 2,
    init: str = "first_k",
) -> DataFrame:
    """Distributed Lloyd k-means: ``n_iter`` assign/re-estimate rounds
    returning the final per-vector assignment (vec_id, cluster, d2).

    ``init='first_k'`` (default) seeds from the first k corpus vectors
    — deterministic and exactly mirrored by the DuckDB oracle twin.
    ``init='kmeans||'`` seeds via deterministic k-means|| sampling —
    the scale path for large k (better spread, fewer empty clusters).

    Centroids are localCheckpointed each iteration (k rows — trivial
    to materialize) so plan depth stays CONSTANT in n_iter: without
    truncation the lineage grows by one join+aggregate layer per
    round and n_iter=20 plans/retries blow up analysis time.

    This also upgrades ``ann_ivf_topk``'s centroid stand-in: feed
    ``_recompute`` output in as the IVF cell table for a trained
    index with the same probe plan.
    """
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", to_double(F.col("embedding")).alias("vec"))
    if init == "kmeans||":
        cents = _kmeans_parallel_init(corpus, k)
    else:
        cents = corpus.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")
        )
    assigned = _assign(corpus, cents)
    for _ in range(n_iter - 1):
        cents = _recompute(assigned).localCheckpoint(eager=True)
        assigned = _assign(corpus, cents)
    return assigned.select("vec_id", F.col("cluster").cast("long").alias("cluster"), "d2")


def ivf_trained_centroids(
    spark: SparkSession, sf_dir: str, k: int = 16, n_iter: int = 2
) -> DataFrame:
    """Trained centroid table (c_id, c_vec) for ``ann_ivf_topk``'s
    ``centroids=`` input: run k-means and re-estimate means from the
    final assignment. The IVF probe plan is unchanged — this only
    swaps the cell geometry from 'first k vectors' to trained
    centers, which tightens cells and raises recall at the same
    n_probe."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", to_double(F.col("embedding")).alias("vec"))
    assigned = kmeans_embeddings(spark, sf_dir, k, n_iter).join(corpus, "vec_id")
    return _recompute(assigned)


def kmeans_cluster_profile(
    spark: SparkSession, sf_dir: str, k: int = 8, n_iter: int = 2
) -> DataFrame:
    """Per-cluster mart over the final k-means state: member count,
    mean within-cluster distance, and a centroid checksum (sum of the
    6dp components) — the compact evidence a pipeline logs per
    training run. k rows out."""
    assigned = kmeans_embeddings(spark, sf_dir, k, n_iter)
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", to_double(F.col("embedding")).alias("vec"))
    cents = _recompute(assigned.join(corpus, "vec_id"))
    sizes = assigned.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        r6(F.avg("d2")).alias("avg_d2"),
    )
    checksum = r6(F.aggregate(F.col("c_vec"), F.lit(0.0), lambda a, x: a + x))
    return (
        sizes.join(cents, sizes.cluster == cents.c_id)
        .select("cluster", "n_members", "avg_d2", checksum.alias("centroid_checksum"))
    )


def semdedup(
    spark: SparkSession, sf_dir: str, k: int = 8, n_iter: int = 2, threshold: float = 0.35
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic dedup via clustering —
    k-means partitions the embedding space, then near-duplicate pairs
    are scored ONLY within clusters, turning the O(n²) all-pairs
    problem into k independent O((n/k)²) blocks. A vector is kept iff
    no same-cluster neighbor with cosine ≥ ``threshold`` has a
    smaller vec_id (deterministic representative choice).

    Scale shape: assignment rides the k-means broadcast plan; the
    pair scoring is one ``applyInPandas`` per cluster — each task
    holds one cluster's matrix (bound cluster size via larger k at
    scale; skewed clusters are the known SemDeDup failure mode and k
    is the knob). Output is per-VECTOR (id, cluster, n_close, keep),
    never the pair list, so result size is O(n) not O(close pairs).

    Cosine rounded to 6dp before the threshold so the numpy kernel
    and the oracle's list_cosine_similarity agree.
    """
    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select("vec_id", to_double(F.col("embedding")).alias("vec"))
    members = (
        kmeans_embeddings(spark, sf_dir, k, n_iter)
        .select("vec_id", "cluster")
        .join(corpus, "vec_id")
    )

    def cluster_dedup(pdf):
        # self-contained closure: stdlib/numpy/pandas only (workers
        # may not be able to import this package)
        import numpy as np
        import pandas as pd

        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        M = np.array(pdf["vec"].to_list(), dtype=np.float64)[order]
        norms = np.linalg.norm(M, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        S = np.round((M / norms) @ (M / norms).T, 6)
        np.fill_diagonal(S, -2.0)
        close = S >= pdf["_thr"].iloc[0]
        n_close = close.sum(axis=1)
        # ids ascending => a smaller-id close neighbor is any close
        # column strictly below the diagonal
        has_smaller = np.array(
            [bool(close[i, :i].any()) for i in range(len(ids))], dtype=bool
        )
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"].iloc[0],
                "n_close": n_close.astype("int64"),
                "keep": ~has_smaller,
            }
        )

    return (
        members.withColumn("_thr", F.lit(float(threshold)))
        .groupBy("cluster")
        .applyInPandas(cluster_dedup, "vec_id long, cluster long, n_close long, keep boolean")
    )


def cluster_mixing_weights(
    spark: SparkSession, sf_dir: str, k: int = 8, n_iter: int = 2
) -> DataFrame:
    """Topic-balance weighting over LEARNED clusters: run k-means,
    then compute each cluster's share and the up/down-sampling weight
    that equalizes the mixture — ``source_mixing_weights`` with the
    strata discovered from the data instead of taken from metadata
    (the SemDeDup/DoReMi-style move: balance what the corpus IS, not
    what its labels say).

    The per-cluster aggregate is k rows; the totals ride a
    single-partition window over those k rows — the only non-k-row
    work is the k-means assignment itself.
    """
    assigned = kmeans_embeddings(spark, sf_dir, k=k, n_iter=n_iter)
    per_cluster = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_vecs"))
    w = Window.partitionBy()
    total = F.sum("n_vecs").over(w)
    n_clusters = F.count(F.lit(1)).over(w)
    target = total / n_clusters
    return per_cluster.select(
        "cluster",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        r6(F.col("n_vecs") / total).alias("share"),
        r6(target / F.col("n_vecs")).alias("weight"),
        r6(F.least(F.lit(1.0), target / F.col("n_vecs"))).alias("sample_prob"),
    )


def facility_location_selection(
    spark: SparkSession, sf_dir: str, k: int = 8, pool: int = 64
) -> DataFrame:
    """C152 (r10): greedy facility-location data selection — the
    submodular-coverage coreset picker (Mirzasoleiman et al.'s
    CRAIG / coreset line): from a bounded candidate ``pool``, pick
    ``k`` vectors one at a time, each maximizing the MARGINAL
    coverage gain sum_v max(cov(v), sim(v,c)) - sum_v cov(v), where
    cov(v) is how well corpus vector v is already represented by the
    selected set. The classic diverse-representatives selection a
    training pipeline runs to seed curricula, pick prototype docs,
    or budget an annotation round — diminishing returns are the
    contract (gains are monotonically non-increasing, pinned by the
    wave test).

    Determinism/oracle: similarities are frozen to BIGINT
    sim_e6 = greatest(round(r6(cosine) * 1e6), 0) before ANY sum —
    coverage totals are integer folds, immune to float summation
    order (the EWMA/FMA lesson); negative cosines clamp to zero so
    "covered not at all" is the floor. Argmax tiebreaks on
    candidate id; the DuckDB twin unrolls the identical k greedy
    rounds (the C33 pattern).

    Plan/scale: the (pool x corpus) sim frame is ONE broadcast
    nested-loop pass, localCheckpointed and re-aggregated per round
    — k linear passes total, coverage joined at vec_id grain; the
    per-round argmax is a bounded ONE-ROW collect (the
    markov/k-means documented driver-fold class: the greedy
    recurrence is inherently sequential in k, and k is a knob, not
    data-sized). Coverage-after-pick is prev + gain (the marginal
    identity), so no extra pass. At 100x corpus the sim frame and
    every aggregate stay linear; pool and k do not grow with data.

    Output per step: (step, vec_id, gain_e6, coverage_e6).

    r10 optimization (guide §2.3/§2.4 + §1.2): the (corpus x pool) sim
    frame is ARRAY-PACKED — one row per corpus vector holding the
    pool-length sim_e6 array in candidate-id order — instead of a
    pool-times-exploded row set. Each greedy round is then ONE
    map-side-combinable aggregate (pool sum expressions over the
    checkpointed frame; coverage-so-far is a pure expression
    greatest(s[p1..pr]) over the picked indices, never a maintained
    state frame), so the whole walk is k single-stage jobs with ZERO
    shuffles — the r9 form paid per round a groupBy exchange, a
    cov-join exchange and an eager checkpoint job (58 jobs -> ~11 at
    sf0.1). Per-element algebra (r6 cosine -> round e6 -> clamp 0,
    BIGINT sums, (gain desc, c_id asc) argmax) is verbatim, so every
    pick and every output row is unchanged.
    """
    picked, _sims, _ids, _base = _facility_greedy_walk(spark, sf_dir, k, pool)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("step", T.IntegerType()),
            T.StructField("vec_id", T.LongType()),
            T.StructField("gain_e6", T.LongType()),
            T.StructField("coverage_e6", T.LongType()),
        ]
    )
    return spark.createDataFrame(picked, schema)


def _facility_greedy_walk(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    pool: int,
    baseline_steps: int = 0,
):
    """Shared core of C152/C154: the array-packed sim frame, the
    candidate-id order, and the k-round greedy walk. Returns
    (picked rows, sims frame (vec_id, s: array<long> in candidate-id
    order), candidate ids, baseline prefix sums). The per-round argmax
    is a bounded ONE-ROW collect of pool partial sums (the
    markov/k-means documented driver-fold class: the greedy recurrence
    is inherently sequential in k, and pool is a knob, not data-sized).

    r11 (VERDICT r10 tasks 8+9): no session-conf mutation — instead of
    flipping spark.sql.adaptive.enabled off for the walk, the sim
    frame is checkpointed as a SINGLE partition when the corpus is
    small (below ``SPARK_GRAFT_FACILITY_SMALL`` rows, default 2M; the
    sim computation itself stays parallel — only the checkpointed
    result is repartition(1)'d). In that single-partition regime the
    ENTIRE k-round greedy walk (plus the audit's baseline prefix-max
    sums) runs as ONE vectorized numpy job over the checkpointed
    integer sim arrays (guide §1.2/§4.2): the r10 form planned k
    separate pool-wide aggregates, and measured cost was dominated by
    DRIVER-side work — pool x k expression construction over py4j plus
    per-round analysis/codegen — not by execution (~6.5s of a 10.3s
    warm walk at sf0.1). All walk arithmetic is int64 (sim_e6 sums and
    maxes), so the numpy fold is bit-identical to the JVM aggregates —
    no float order risk. Above the cap the frame keeps its scan
    partitioning and the distributed per-round aggregate loop (AQE on,
    untouched; the audit's baseline sums fused into round 1). Guards
    (ADVICE r10): k clamps to the candidate count; an empty pool
    raises instead of TypeError-ing. Plan width in the large regime
    grows linearly with ``pool`` — pool is a knob, keep it O(100);
    the small regime holds corpus x pool int64 in one task (~0.5 KB a
    row at pool=64), which SPARK_GRAFT_FACILITY_SMALL bounds at ~1 GB."""
    import os

    e = load_table(spark, sf_dir, "embeddings")
    corpus = e.select(
        "vec_id",
        to_double(F.col("embedding")).alias("vec"),
    )
    cand = corpus.filter(F.col("vec_id") < pool).select(
        F.col("vec_id").alias("c_id"),
        F.col("vec").alias("c_vec"),
        # candidate norm hoisted out of the per-row transform (r11):
        # the r10 form recomputed norm(c_vec) AND norm(vec) once per
        # (row, candidate) inside cosine — 3x the interpreted-HOF work
        # of the dot product itself. Same expression on the same
        # values, so the double (and the e6 freeze) is bit-identical.
        norm(F.col("c_vec")).alias("c_nrm"),
    )
    # bounded driver fold: the pool candidate ids (id order == array
    # index order below)
    ids = [int(r["c_id"]) for r in cand.select("c_id").orderBy("c_id").collect()]
    n_cand = len(ids)
    if n_cand == 0:
        raise ValueError(
            f"facility pool is empty (no vec_id < {pool} in {sf_dir!r} embeddings): "
            "greedy selection needs at least one candidate"
        )
    k = min(k, n_cand)
    baseline_steps = min(baseline_steps, n_cand)
    # ONE row holding every candidate in id order; the cross join
    # broadcasts it so the packed sim frame is a single corpus pass
    cands_row = cand.agg(
        F.sort_array(F.collect_list(F.struct("c_id", "c_vec", "c_nrm"))).alias("cands")
    )
    nv = norm(F.col("vec"))
    sim_e6 = lambda c: F.greatest(  # noqa: E731 — verbatim C152 algebra
        F.round(
            r6(dot(F.col("vec"), c["c_vec"]) / (F.col("_nv") * c["c_nrm"])) * 1e6, 0
        ).cast("long"),
        F.lit(0).cast("long"),
    )
    sims = (
        corpus.withColumn("_nv", nv)
        .crossJoin(F.broadcast(cands_row))
        .select(
            "vec_id",
            F.transform(F.col("cands"), sim_e6).alias("s"),
        )
    )
    small_cap = int(os.environ.get("SPARK_GRAFT_FACILITY_SMALL", "2000000"))
    # metadata-only parquet count: sizes the round-frame layout
    small = e.count() < small_cap
    if small:
        sims = sims.repartition(1)
    sims = sims.localCheckpoint(eager=True)

    if small:
        picked, base_vals = _facility_numpy_fold(sims, n_cand, k, baseline_steps, ids)
        return picked, sims, ids, base_vals

    def _prefix_max(n: int):
        return (
            F.greatest(*[F.col("s")[i] for i in range(n)])
            if n > 1
            else F.col("s")[0]
        )

    picked: list[tuple[int, int, int, int]] = []
    picked_idx: list[int] = []
    base_vals: list[int] = []
    coverage = 0
    for step in range(1, k + 1):
        cov = (
            F.greatest(*[F.col("s")[i] for i in picked_idx])
            if len(picked_idx) > 1
            else (
                F.col("s")[picked_idx[0]] if picked_idx else F.lit(0).cast("long")
            )
        )
        aggs = [
            F.sum(F.greatest(F.col("s")[i] - cov, F.lit(0).cast("long")))
            .cast("long")
            .alias(f"g{i}")
            for i in range(n_cand)
        ]
        if step == 1 and baseline_steps:
            # audit baseline fused into the first round's scan
            aggs += [
                F.sum(_prefix_max(n)).cast("long").alias(f"b{n}")
                for n in range(1, baseline_steps + 1)
            ]
        gains_row = sims.agg(*aggs).first()
        if step == 1 and baseline_steps:
            base_vals = [int(gains_row[f"b{n}"]) for n in range(1, baseline_steps + 1)]
        best_i, best_gain = -1, None
        for i in range(n_cand):
            if i in picked_idx:
                continue
            g = int(gains_row[f"g{i}"])
            if best_gain is None or g > best_gain:
                best_i, best_gain = i, g
        coverage += best_gain
        picked.append((step, ids[best_i], best_gain, coverage))
        picked_idx.append(best_i)
    return picked, sims, ids, base_vals


def _facility_numpy_fold(sims: DataFrame, n_cand: int, k: int, baseline_steps: int, ids):
    """Single-partition regime of the greedy walk (r11): the whole
    k-round argmax recurrence and the audit's baseline prefix-max sums
    in ONE ``mapInPandas`` job over the checkpointed (vec_id, s) frame
    — int64 end to end, so every gain/coverage/baseline value is
    bit-identical to the JVM per-round aggregates it replaces.
    Tiebreak parity: ``np.argmax`` returns the FIRST max index, which
    is exactly the old loop's "strictly greater wins, lowest candidate
    index on ties" scan. Emits (t, step, idx, gain) rows: t=0 greedy
    picks, t=1 baseline prefix sums — a bounded k + baseline_steps
    rows, the documented driver-fold class."""

    def _greedy(batches):
        import numpy as np
        import pandas as pd

        mats = []
        for b in batches:
            if len(b):
                mats.append(np.stack(b["s"].to_numpy()))
        if not mats:
            return
        S = np.vstack(mats).astype(np.int64, copy=False)  # (n_rows, n_cand)
        t_o, step_o, idx_o, gain_o = [], [], [], []
        if baseline_steps:
            run = np.maximum.accumulate(S[:, :baseline_steps], axis=1)
            for n in range(1, baseline_steps + 1):
                t_o.append(1)
                step_o.append(n)
                idx_o.append(-1)
                gain_o.append(int(run[:, n - 1].sum()))
        cov = np.zeros(S.shape[0], dtype=np.int64)
        taken = np.zeros(S.shape[1], dtype=bool)
        for step in range(1, k + 1):
            gains = np.maximum(S - cov[:, None], 0).sum(axis=0)
            gains[taken] = -1  # real gains are >= 0, so never re-picked
            best = int(gains.argmax())
            t_o.append(0)
            step_o.append(step)
            idx_o.append(best)
            gain_o.append(int(gains[best]))
            taken[best] = True
            cov = np.maximum(cov, S[:, best])
        yield pd.DataFrame({"t": t_o, "step": step_o, "idx": idx_o, "gain": gain_o})

    rows = sims.mapInPandas(_greedy, "t int, step int, idx int, gain long").collect()
    base_vals = [
        int(r["gain"])
        for r in sorted((r for r in rows if r["t"] == 1), key=lambda r: r["step"])
    ]
    picked: list[tuple[int, int, int, int]] = []
    coverage = 0
    for r in sorted((r for r in rows if r["t"] == 0), key=lambda r: r["step"]):
        coverage += int(r["gain"])
        picked.append((int(r["step"]), ids[int(r["idx"])], int(r["gain"]), coverage))
    return picked, base_vals


def selection_coverage_audit(
    spark: SparkSession, sf_dir: str, k: int = 8, pool: int = 64
) -> DataFrame:
    """C154 (r10): prices C152's greedy — facility-location coverage
    at every step vs the no-optimization baseline (taking the first
    ``step`` pool candidates in id order, the same no-RNG stand-in
    the IVF/PQ tiers use as their untrained geometry). The audit that
    justifies paying k sequential rounds instead of a blind prefix:
    lift_ppm = floor(greedy_coverage * 1e6 / baseline_coverage) per
    step, exact BIGINT via the two-level remainder split (safe while
    coverage < ~9.2e15, i.e. corpora to ~9e9 vectors at e6 scale —
    the ``ppm_expr`` contract).

    Baseline coverage per step is ONE pass: running max of sim_e6
    per corpus vector over the id-ordered candidate prefix, summed
    per prefix length. Greedy coverage comes from C152's own walk
    (its marginal-gain identity, not recomputed).

    r10 optimization: rides C152's array-packed sim frame (ONE
    corpus x pool pass shared by the walk and the baseline — the r9
    form re-scored a second corpus x k sim frame and ran a per-vector
    running-max window over it); the baseline's step sums are k
    prefix-max sum expressions in the same single map-side aggregate
    shape as the greedy rounds. Values are unchanged: prefix-max over
    the id-ordered candidate array IS the running max the window
    computed, summed per prefix length.
    """
    from ..functions.exact import ppm_expr

    # baseline prefix = first k candidates in id order = array
    # positions 0..k-1 of the packed sim frame; r11: the k prefix-max
    # sums ride round 1's aggregate instead of a separate scan
    picked, sims, ids, base_vals = _facility_greedy_walk(
        spark, sf_dir, k, pool, baseline_steps=k
    )

    rows = [
        (step, gain_cov[3], base_vals[step - 1])
        for step, gain_cov in zip(range(1, len(picked) + 1), picked)
    ]
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("step", T.IntegerType()),
            T.StructField("greedy_coverage_e6", T.LongType()),
            T.StructField("baseline_coverage_e6", T.LongType()),
        ]
    )
    return (
        spark.createDataFrame(rows, schema)
        .withColumn(
            "lift_ppm",
            F.expr(ppm_expr("greedy_coverage_e6", "baseline_coverage_e6")).cast(
                "long"
            ),
        )
        .orderBy("step")
    )
