"""Planted-pair recall for the banded embedding family (VERDICT r7
task 3): the 100-TB recall claim at production near-dup thresholds
is a measured number, not docstring math.

The fixture plants pairs at an exact target cosine (v = c*u +
sqrt(1-c^2)*w, w orthogonal to u) so the exact pair set at threshold
c-0.01 is precisely the planted set — unrelated random 64-dim pairs
concentrate at |cos| <= ~0.7. Measured recall must sit within
binomial noise of the 8-band x 6-bit S-curve 1-(1-p^6)^8,
p = 1 - acos(c)/pi.
"""

from __future__ import annotations

import math

import pytest

from tools.stress import plant_neardup_embeddings

N_PAIRS = 500


def _predicted(c: float, bands: int = 8, bits: int = 6) -> float:
    p = 1 - math.acos(c) / math.pi
    return 1 - (1 - p**bits) ** bands


@pytest.mark.parametrize("c,tol", [(0.8, 0.055), (0.9, 0.03)])
def test_banded_recall_matches_s_curve_on_planted_pairs(spark, tmp_path, c, tol):
    """banded_corpus_pairs catches the predicted share of planted
    pairs (tol ~= 4 binomial sigmas at n=500)."""
    from github_issues_lakehouse_spark.operators.similarity import (
        banded_corpus_pairs,
    )

    d = str(tmp_path / f"emb{int(c * 100)}")
    plant_neardup_embeddings(d, N_PAIRS, c)
    got = banded_corpus_pairs(spark, d, threshold=c - 0.01)
    caught = got.filter(got.id_b - got.id_a == N_PAIRS).count()
    measured = caught / N_PAIRS
    assert abs(measured - _predicted(c)) < tol, (
        f"c={c}: measured {measured:.4f} vs predicted {_predicted(c):.4f}"
    )


def test_c147_audit_reports_planted_recall(spark, tmp_path):
    """The registered recall audit itself (banded_neardup_recall,
    C147) reports the planted-pair ground truth: n_exact equals the
    planted count and recall_ppm equals n_caught/n_exact in ppm,
    inside the S-curve band."""
    from github_issues_lakehouse_spark.operators.similarity import (
        banded_neardup_recall,
    )

    c = 0.9
    d = str(tmp_path / "emb90audit")
    plant_neardup_embeddings(d, N_PAIRS, c)
    row = banded_neardup_recall(spark, d, threshold=c - 0.01).collect()[0]
    assert row.n_exact_pairs == N_PAIRS
    assert row.n_caught == row.n_banded_pairs  # bit-for-bit subset
    # ppm_expr is an exact BIGINT floor of part*1e6/total
    assert row.recall_ppm == row.n_caught * 1_000_000 // row.n_exact_pairs
    assert abs(row.recall_ppm / 1e6 - _predicted(c)) < 0.03
