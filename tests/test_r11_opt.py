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
