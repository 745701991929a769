"""10x scale stress: replicate the sf0.1 testdata (shifted ids,
per-replica text perturbation so replicas are near- but not exact
duplicates) into /tmp/stress and run the shuffle-heavy operators.

Validates the scaling claims in SURVEY.md §6 empirically: each
operator's wall time should grow ~linearly with input size (the
near-dup PAIR listings are quadratic in duplicate-cluster size by
definition — the cluster output form, dedup_clusters, is the scale
path there).

    python tools/stress.py [mult]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

HEAVY = [
    "sessionize_events",
    "asof_join_orders_events",
    "windowed_agg_events",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "lang_id",
    "training_corpus_filter",
    "silver_merge_dedup",
    "moving_avg_user_value",
    # round-3 additions over the replicated documents/events
    "gopher_quality_rules",
    "doc_entropy",
    "zipf_slope",
    "term_source_association",
    "kmv_distinct_terms",
    "cms_term_counts",
    "event_dedup_windowed",
    "daily_anomaly_events",
    # r3 third batch — orders/lineitem now replicate too (shifted
    # order keys, FIXED dims: 10x transactions over the same
    # suppliers/parts/users, so the co-occurrence graphs densify the
    # way a real 10x month would)
    "supplier_cosupply_triangles",
    "part_copurchase_lift",
    "equi_depth_histogram",
    "table_stats_mart",
    "attribution_touchpoints",
    "ewma_user_value",
    "term_cooccurrence_pmi",
    "feature_hash_counts",
    "bpe_merge_learning",
    # r3 fifth batch (bm25 over replicated documents; seasonal/cusum
    # over replicated events; corr/skew over replicated lineitem)
    "bm25_topk",
    "seasonal_decompose_daily",
    "cusum_changepoint",
    "corr_matrix_lineitem",
    "join_key_skew",
    # r3 sixth batch
    "bpe_tokenize_stats",
    "ab_test_conversion",
    "supplier_neighbor_jaccard",
    # r3 seventh batch (lsh_recall is the uncapped exact audit —
    # quadratic on replicated boilerplate by contract, like
    # dedup_ngram_jaccard)
    "pca_projection_outliers",
    "classifier_pr_curve",
    # r3 eighth batch
    "dau_wau_stickiness",
    "event_trigram_patterns",
    "join_size_estimate",
    # r3 ninth batch
    "lang_id_confusion",
    "user_churn_flags",
    # r4: SLA exposure mart (month-interval explode over replicated
    # orders), exact-integer rewrites (rank-quintile RFM, ppm
    # seasonality), and the now-SAMPLED lsh recall audit — its exact
    # side must scale with sample^2, not corpus^2
    "gold_sla_stability",
    "customer_rfm",
    "order_seasonality",
    "unpivot_lineitem_metrics",
    "lsh_recall_vs_exact",
    "dedup_exact_substrings",
    # r5 second/third waves: sketches (bounded state must stay
    # bounded), incremental index screens (replicas are cross-split
    # near-dups — the probe and verify stages densify), the
    # normalization ladder, and the threshold-machinery curriculum
    "hll_distinct_terms",
    "quantile_sketch_price",
    "dedup_against_index",
    "neardup_against_index",
    "normalization_impact",
    "curriculum_plan",
    # r5 fourth-sixth waves: distribution audits (value-grain
    # band/carry machinery must stay value-bounded under 10x rows),
    # the Bloom probe side (grams densify 10x), Markov transitions,
    # vocabulary growth (first-occurrence aggregate), term-grain
    # diversity, and HRW shard planning (pure explode+argmax)
    "benford_first_digit",
    "gini_revenue",
    "lorenz_deciles",
    "theil_hoover_indices",
    # (ks_promo_price runs on part, a FIXED dim here — no signal)
    "bloom_fpr_audit",
    "event_entropy_rate",
    "autocorr_daily",
    "fano_daily_dispersion",
    "vocab_growth_curve",
    "simpson_diversity_by_source",
    "stopword_mass_by_source",
    "boilerplate_prefix_stats",
    "rendezvous_shard_plan",
    "holt_linear_daily",
    # r5 closing waves (joins/term-grain shapes worth watching at 10x;
    # not yet in the BASELINE tables — first numbers land in r6)
    "source_vocab_overlap",
    "anova_price_by_returnflag",
    "embedding_sim_histogram",
    "minhash_band_tuning",
    "fulfillment_latency_percentiles",
    "user_survival_curve",
    "quality_temporal_drift",
    "market_concentration_hhi",
    "aov_mix_shift_bridge",
    # r5 final wave: rank statistics + robust means (value-grain
    # band/carry under 10x rows), containment (the inverted-index
    # join DENSIFIES on near-dup replicas — the adversarial case),
    # journey-chain attribution + timing detector (LAG pass), RAKE
    # (per-doc window + vocabulary join), CDC incremental apply, FD
    # profiling, calibration, epoch shuffle (prefix-sum shard plan)
    # (mann_whitney/trimmed run on part/lineitem — part is FIXED, so
    # only the lineitem one carries 10x signal)
    "spearman_daily_trend",
    "trimmed_winsorized_price",
    "classifier_calibration",
    "containment_pairs",
    "epoch_shuffle_plan",
    "markov_attribution",
    "bot_regularity_flags",
    "rake_keyphrases",
    "incremental_mart_rebuild",
    "functional_dependency_audit",
    # r5 last batch: money reconciliation (order-key aggregate),
    # weighted-Jaccard index join (densifies on near-dup replicas),
    # checksum manifests (pure map+xor), burst detection (top-m gate)
    "order_total_reconciliation",
    "idf_jaccard_pairs",
    "table_checksum_manifest",
    "term_burst_detection",
    # r10 continuation: the trade graph DENSIFIES under replication
    # (same customers/suppliers, 10x orders -> distinct-pair edges
    # grow toward the complete bipartite graph — the adversarial
    # direction for a peel), daily grids carry 10x counts on the
    # same calendar (moments must stay day-grain), and the D38
    # mixture drain stages/folds a 10x corpus (state stays
    # O(sources)); the embedding-side r10 keys get no signal here —
    # embeddings is a FIXED dim in this harness
    "kcore_trade_graph",
    "xcorr_daily_events",
    "stream_mixture_readout",
]


def planted_main() -> None:
    """VERDICT r4 task 6: adversarial giant-duplicate-block corpus for
    the exact-substring dedup family (C93 dedup_exact_substrings, C94
    token_dedup_savings; streaming twin D19 folds the same rows).

    Two planted hazards, layered over the replicated sf0.1 documents:
    - MEGA: one shared 10,000-token boilerplate PREPENDED to 30% of
      docs — 1,000 k=10 grid blocks, each duplicated in 0.3*N docs
      (the docs-heavy license-header / template scenario);
    - HOT: one single 10-token sentence PREPENDED to 90% of docs —
      ONE block hash carrying 0.9*N occurrences, the worst single-key
      skew the first-occurrence aggregate and the flag-join can see.
      (Prepended, like the mega block, so it is PHASE-ALIGNED with
      the fixed k-token grid: the grid variant only collides
      same-phase runs — the documented 1/k-cost approximation of the
      suffix-array pass — and an appended tail would land at an
      arbitrary phase per doc and never collide.)

    Run ``python tools/stress.py planted [mult]`` at mult=1 then
    mult=10; the ratio is the skew verdict. Expected scale-safe
    because (a) the first-occurrence aggregate is a map-side
    combinable min-struct (a hot hash costs one partial cell per
    task, never a skewed sort), and (b) the flag-join's build side is
    1 row/hash so AQE splits the fat probe partition.
    """
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = "/root/testdata/sf0.1"
    dst = f"/tmp/stress_planted_{mult}"

    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="stress-planted")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    mega = " ".join(f"bp{i}" for i in range(10_000))
    # exactly 10 tokens -> exactly one phase-0 grid block at k=10
    hot = "common header sentence shared by almost every document in here"

    d = spark.read.parquet(f"{src}/documents.parquet")
    (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.concat(
                F.when(F.col("doc_id") % 10 < 3, F.lit(mega + " ")).otherwise(F.lit("")),
                F.when(F.col("doc_id") % 10 < 9, F.lit(hot + " ")).otherwise(F.lit("")),
                F.col("text"),
                F.when(F.col("rep") == 0, F.lit("")).otherwise(
                    F.concat(F.lit(" rep"), F.col("rep"))
                ),
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{dst}/documents.parquet")
    )

    qs = Q.queries()
    for name in ("dedup_exact_substrings", "token_dedup_savings"):
        t0 = time.time()
        n = qs[name](spark, dst).count()
        print(f"planted x{mult} {name}: {n} rows {time.time() - t0:.2f}s")


def plant_neardup_embeddings(
    path: str, n_pairs: int, cos: float, dim: int = 64, seed: int = 8
) -> None:
    """Write an embeddings.parquet whose ONLY high-cosine pairs are
    planted: ``n_pairs`` base vectors u_i (uniform on the sphere)
    each paired with v_i = cos*u_i + sqrt(1-cos^2)*w_i (w_i a random
    unit vector orthogonal to u_i), so cos(u_i, v_i) == cos up to fp.
    Unrelated 64-dim random pairs concentrate at |cos| <~ 0.7 even
    over millions of pairs (std 1/8), so at thresholds near ``cos``
    the exact pair set IS the planted set — the fixture that turns
    the banded family's S-curve recall claim into a measurement
    (VERDICT r7 task 3). Pair i is (vec_id=i, vec_id=i+n_pairs);
    float32 storage matches the real table's schema.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    u = rng.standard_normal((n_pairs, dim))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    w = rng.standard_normal((n_pairs, dim))
    w -= (w * u).sum(axis=1, keepdims=True) * u
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    v = cos * u + np.sqrt(1.0 - cos * cos) * w
    vecs = np.concatenate([u, v]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(2 * n_pairs), pa.int64()),
            "embedding": pa.array([list(r) for r in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * (2 * n_pairs), pa.int32()),
        }
    )
    import os

    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, f"{path}/embeddings.parquet")


def planted_embeddings_main() -> None:
    """VERDICT r7 task 3: measure banded recall at PRODUCTION
    near-dup cosines with planted pairs instead of quoting the
    S-curve. For each c in {0.8, 0.9, 0.95}: plant 2000 pairs at
    cosine c, run banded_corpus_pairs at threshold c-0.01 (only
    planted pairs clear it), and print measured recall beside the
    1-(1-p^6)^8 prediction (p = 1 - acos(c)/pi).

        python tools/stress.py planted-embeddings [n_pairs]
    """
    import math

    from github_issues_lakehouse_spark.operators.similarity import (
        banded_corpus_pairs,
    )
    from github_issues_lakehouse_spark.session import get_spark

    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    spark = get_spark(app_name="stress-planted-embeddings")
    for c in (0.8, 0.9, 0.95):
        dst = f"/tmp/stress_planted_emb_{int(c * 100)}"
        plant_neardup_embeddings(dst, n_pairs, c)
        t0 = time.time()
        got = banded_corpus_pairs(spark, dst, threshold=c - 0.01)
        caught = got.filter(got.id_b - got.id_a == n_pairs).count()
        p = 1 - math.acos(c) / math.pi
        pred = 1 - (1 - p**6) ** 8
        print(
            f"planted-emb c={c}: measured recall {caught}/{n_pairs} = "
            f"{caught / n_pairs:.4f}  predicted {pred:.4f}  "
            f"({time.time() - t0:.1f}s)"
        )


def banded_main() -> None:
    """r7: banded embedding-pair scaling. Replicate embeddings with
    shifted vec_ids and a tiny per-replica deterministic perturbation
    of coordinate 0 (replicas are NEAR- but not exact duplicates, so
    every replica family becomes a genuine high-cosine near-dup
    cluster — the adversarial case for a pair lister).

    Expected shape, stated up front: with a FIXED band config (8
    bands x 6 bits = 64 buckets/band) bucket occupancy grows ~n, so
    the candidate join and the verified PAIR LISTING grow
    ~quadratically — the same documented contract as the shingle-LSH
    pair listing (see module docstring); the knob that restores ~n
    candidates at real scale is bits-per-band (bucket count must grow
    with n), and the cluster OUTPUT form (C146) stays the scale path.
    This mode measures that statement instead of asserting it:

        python tools/stress.py banded 1
        python tools/stress.py banded 10
    """
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    src = "/root/testdata/sf0.1"
    dst = f"/tmp/stress_banded_{mult}"

    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.operators.similarity import (
        banded_corpus_pairs,
        embedding_dup_clusters_banded,
    )
    from github_issues_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="stress-banded")
    reps = spark.range(mult).select(F.col("id").alias("rep"))
    e = spark.read.parquet(f"{src}/embeddings.parquet")
    emb = F.col("embedding").cast("array<double>")
    (
        e.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            F.concat(
                F.array(emb[0] + F.col("rep").cast("double") * 0.001),
                F.slice(emb, 2, 10_000),
            ).alias("embedding"),
            "label",
        )
        .write.mode("overwrite")
        .parquet(f"{dst}/embeddings.parquet")
    )
    for name, fn in (
        ("pairs", banded_corpus_pairs),
        ("clusters", embedding_dup_clusters_banded),
    ):
        t0 = time.time()
        n = fn(spark, dst).count()
        print(f"banded x{mult} {name}: {n} rows {time.time() - t0:.2f}s")


def readout_main() -> None:
    """r8: streaming-fold history-independence. The four readout keys
    (B135-B138) claim per-micro-batch cost is sized by the BATCH, not
    by how much history has already been folded (mart_fold_batch
    merges the batch aggregate into O(state), never rescanning
    facts). This mode measures that statement: replicate events
    ``mult``x, stage into ``n_files`` equal micro-batches, drain
    through the D12 maintenance, and print each batch's wall duration
    and input rows from the StreamingQuery progress log. A fold that
    rescanned history would show linearly GROWING batch durations;
    the protocol predicts a flat profile (equal batches, constant
    state size).

        python tools/stress.py readout 10 16
    """
    import json as _json
    import os
    import shutil
    import tempfile

    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_files = int(sys.argv[3]) if len(sys.argv) > 3 else 16

    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.session import get_spark
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming.ops import (
        read_mart,
        stream_mart_maintenance,
    )

    spark = get_spark(app_name=f"stress-readout-{mult}x")
    ev = load_table(spark, "/root/testdata/sf0.1", "events").select(
        "ts", "event_type", "value"
    )
    reps = [ev.withColumn("_r", F.lit(i)).drop("_r") for i in range(mult)]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)

    base = os.path.join(tempfile.gettempdir(), f"stress_readout_{mult}_{os.getpid()}")
    shutil.rmtree(base, ignore_errors=True)
    staging = os.path.join(base, "staging")
    big.repartition(n_files).write.mode("overwrite").parquet(staging)
    stream = (
        spark.readStream.schema(big.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    q = stream_mart_maintenance(
        stream, os.path.join(base, "mart"), os.path.join(base, "ckpt")
    )
    if not q.awaitTermination(1200):
        q.stop()
        raise RuntimeError("drain timed out")
    prog = [
        _json.loads(p) if isinstance(p, str) else p for p in q.recentProgress
    ]
    durs = [
        (p["numInputRows"], p["batchDuration"])
        for p in prog
        if p.get("numInputRows", 0) > 0
    ]
    for i, (rows, ms) in enumerate(durs):
        print(f"readout x{mult} batch {i:2d}: {rows} rows  {ms} ms")
    half = len(durs) // 2
    first = sum(ms for _, ms in durs[:half]) / max(1, half)
    second = sum(ms for _, ms in durs[half:]) / max(1, len(durs) - half)
    n_mart = read_mart(spark, os.path.join(base, "mart")).count()
    # the ratio needs >=2 samples and a nonzero first half (an all-0ms
    # first half is possible on sub-ms batches) — don't lose the run's
    # output to a ZeroDivisionError after the drain completed
    ratio = f"{second / first:.2f}" if len(durs) >= 2 and first > 0 else "n/a"
    print(
        f"readout x{mult}: {len(durs)} batches, mart {n_mart} rows, "
        f"mean batch ms first-half {first:.0f} vs second-half {second:.0f} "
        f"(ratio {ratio}; history rescan would trend ~2x+)"
    )
    shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "planted":
        planted_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "planted-embeddings":
        planted_embeddings_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "banded":
        banded_main()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "readout":
        readout_main()
        return
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = "/root/testdata/sf0.1"
    dst = "/tmp/stress"

    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark import queries as Q
    from github_issues_lakehouse_spark.session import get_spark
    from github_issues_lakehouse_spark.sources.registry import load_table

    spark = get_spark(app_name="stress")
    reps = spark.range(mult).select(F.col("id").alias("rep"))

    d = spark.read.parquet(f"{src}/documents.parquet")
    (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("rep")))
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .write.mode("overwrite")
        .parquet(f"{dst}/documents.parquet")
    )
    e = load_table(spark, src, "events")
    (
        e.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
            "ts",
            (F.col("user_id") + F.col("rep") * 1000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .write.mode("overwrite")
        .parquet(f"{dst}/events.parquet")
    )
    o = load_table(spark, src, "orders")
    (
        o.crossJoin(reps)
        .select(
            (F.col("o_orderkey") + F.col("rep") * 100_000_000).alias("o_orderkey"),
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            "o_orderdate",
            "o_orderpriority",
        )
        .write.mode("overwrite")
        .parquet(f"{dst}/orders.parquet")
    )
    li = load_table(spark, src, "lineitem")
    (
        li.crossJoin(reps)
        .select(
            (F.col("l_orderkey") + F.col("rep") * 100_000_000).alias("l_orderkey"),
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
            "l_returnflag",
            "l_linestatus",
            "l_shipdate",
        )
        .write.mode("overwrite")
        .parquet(f"{dst}/lineitem.parquet")
    )
    for t in ("region", "nation", "customer", "supplier", "part", "embeddings"):
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{dst}/{t}.parquet"
        )

    qs = Q.queries()
    for name in HEAVY:
        t0 = time.time()
        n = qs[name](spark, dst).count()
        print(f"{name}: {n} rows {time.time() - t0:.2f}s")


if __name__ == "__main__":
    main()
