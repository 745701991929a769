"""Round-11 optimization-round focused tests.

Each test here pins the SEMANTICS of an operator whose internals were
rewritten for performance in r11 (the round's contract: a rewrite must
be provably output-identical, so every rewrite ships with a parity test
against either the old algorithm or an independent recompute).
"""

import os

import pytest

from .conftest import SF_DIR


def test_components_regime_parity(spark, monkeypatch):
    """components_from_pairs r11: the single-task union-find fold
    (small-graph regime) and the distributed pointer-jump propagation
    loop (large-graph regime, forced via SPARK_GRAFT_CC_SMALL_EDGES=0)
    must produce the identical min-reachable-id fixpoint on a graph
    with a long chain (exercises the pointer jump), a cycle, a
    self-loop, and singleton-free stars."""
    from github_issues_lakehouse_spark.operators.dedup import components_from_pairs

    edges = (
        # 60-node chain, ids descending so min-label needs real rounds
        [(i + 1, i) for i in range(100, 160)]
        # cycle
        + [(201, 202), (202, 203), (203, 201)]
        # star
        + [(300, j) for j in (301, 302, 303)]
        # self-loop
        + [(400, 400)]
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")

    monkeypatch.setenv("SPARK_GRAFT_CC_SMALL_EDGES", "1000000")
    small = {(r.doc_id, r.cluster_id) for r in components_from_pairs(pairs).collect()}
    monkeypatch.setenv("SPARK_GRAFT_CC_SMALL_EDGES", "0")
    loop = {(r.doc_id, r.cluster_id) for r in components_from_pairs(pairs).collect()}

    assert small == loop
    # independent recompute of the fixpoint on the chain component
    assert {(i, 100) for i in range(100, 161)} <= small
    assert (202, 201) in small and (303, 300) in small and (400, 400) in small


def test_pca_driver_fold_matches_dataframe_power_iteration(spark):
    """pca r11: the driver-side float fold must reproduce the r10
    DataFrame power iteration (tiny joins + per-iterate eager
    checkpoints) EXACTLY — same cov entries, same 6dp-rounded iterate
    sequence, same Rayleigh eigenvalue. The old algebra is inlined
    here verbatim as the independent recompute."""
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.functions.vectors import to_double
    from github_issues_lakehouse_spark.operators.vectors2 import (
        pca_top_component,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table

    dim, n_iter = 8, 4
    # --- r10 implementation, verbatim ---
    e = load_table(spark, SF_DIR, "embeddings")
    v = to_double(F.col("embedding"))
    x = [F.element_at(v, i + 1) for i in range(dim)]
    aggs = [F.avg(x[i]).alias(f"m{i}") for i in range(dim)]
    aggs += [
        F.avg(x[i] * x[j]).alias(f"p{i}_{j}")
        for i in range(dim)
        for j in range(i, dim)
    ]
    moments = e.agg(*aggs)
    rows = []
    for i in range(dim):
        for j in range(dim):
            lo, hi = min(i, j), max(i, j)
            rows.append(
                F.struct(
                    F.lit(i).alias("i"),
                    F.lit(j).alias("j"),
                    F.round(
                        F.col(f"p{lo}_{hi}") - F.col(f"m{lo}") * F.col(f"m{hi}"), 6
                    ).alias("c"),
                )
            )
    cov = (
        moments.select(F.explode(F.array(*rows)).alias("r"))
        .select("r.i", "r.j", "r.c")
        .localCheckpoint(eager=True)
    )
    v0 = round(1.0 / dim**0.5, 6)
    vec = spark.range(dim).select(
        F.col("id").cast("int").alias("j"), F.lit(v0).alias("x")
    )
    for _ in range(n_iter):
        w = (
            cov.join(F.broadcast(vec), "j")
            .groupBy("i")
            .agg(F.round(F.sum(F.col("c") * F.col("x")), 6).alias("wx"))
        )
        nrm = w.agg(F.sqrt(F.sum(F.col("wx") * F.col("wx"))).alias("n"))
        vec = (
            w.crossJoin(F.broadcast(nrm))
            .select(
                F.col("i").alias("j"),
                F.round(F.col("wx") / F.col("n"), 6).alias("x"),
            )
            .localCheckpoint(eager=True)
        )
    cv = (
        cov.join(F.broadcast(vec), "j")
        .groupBy("i")
        .agg(F.round(F.sum(F.col("c") * F.col("x")), 6).alias("cv"))
    )
    lam_old = (
        cv.join(F.broadcast(vec.select(F.col("j").alias("i"), "x")), "i")
        .agg(F.round(F.sum(F.col("cv") * F.col("x")), 6).alias("eigenvalue"))
    ).first()["eigenvalue"]
    old = {r["j"]: r["x"] for r in vec.collect()}

    # --- r11 driver fold ---
    got = pca_top_component(spark, SF_DIR, dim=dim, n_iter=n_iter).collect()
    assert {r["dim_i"]: r["loading"] for r in got} == old
    assert all(r["eigenvalue"] == lam_old for r in got)


def test_facility_small_and_large_regimes_agree(spark, monkeypatch):
    """facility r11: the single-partition numpy fold and the
    distributed per-round aggregate loop must walk identical picks
    with identical gains/coverage, and the audit's baseline prefix
    sums must match between regimes."""
    from github_issues_lakehouse_spark.operators.clustering import (
        _facility_greedy_walk,
    )

    monkeypatch.setenv("SPARK_GRAFT_FACILITY_SMALL", "1000000000")
    picked_small, _s, ids_small, base_small = _facility_greedy_walk(
        spark, SF_DIR, 6, 32, baseline_steps=6
    )
    monkeypatch.setenv("SPARK_GRAFT_FACILITY_SMALL", "0")
    picked_large, _s, ids_large, base_large = _facility_greedy_walk(
        spark, SF_DIR, 6, 32, baseline_steps=6
    )
    assert picked_small == picked_large
    assert base_small == base_large
    assert ids_small == ids_large
