"""Round-10 wave 4: C150 `curriculum_mixture_plan` — composition
invariants against its two parents (C106 curriculum phases, the
source-mixture policy)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_cells_roll_up_to_the_curriculum_plan(spark):
    """Summing the (phase, source) cells over sources reproduces
    C106's per-phase doc/token mass exactly — same thresholds, same
    scoring, just one extra grouping key."""
    from github_issues_lakehouse_spark.operators.chunking import (
        curriculum_mixture_plan,
        curriculum_plan,
    )

    cells = (
        curriculum_mixture_plan(spark, SF_DIR)
        .groupBy("phase")
        .agg(F.sum("n_docs").alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
        .collect()
    )
    plan = curriculum_plan(spark, SF_DIR).collect()
    got = {r["phase"]: (r["n_docs"], r["n_tokens"]) for r in cells}
    want = {r["phase"]: (r["n_docs"], r["n_tokens"]) for r in plan}
    assert got == want


def test_sample_prob_ppm_matches_the_mixture_mart(spark):
    """The exact-integer sample_prob_ppm is the floor-ppm twin of
    source_mixing_weights' r6-double sample_prob: they agree within
    one ppm-rounding ulp for every source, and the cap at 1e6 binds
    exactly when the mart's prob is 1.0."""
    from github_issues_lakehouse_spark.operators.chunking import (
        curriculum_mixture_plan,
    )
    from github_issues_lakehouse_spark.operators.text2 import source_mixing_weights

    probs = {
        r["source"]: r["sample_prob_ppm"]
        for r in curriculum_mixture_plan(spark, SF_DIR)
        .select("source", "sample_prob_ppm")
        .distinct()
        .collect()
    }
    mart = {r["source"]: r["sample_prob"] for r in source_mixing_weights(spark, SF_DIR).collect()}
    assert set(probs) == set(mart)
    for src, ppm in probs.items():
        assert 0 < ppm <= 1_000_000
        assert abs(ppm - mart[src] * 1_000_000) <= 1.0, (src, ppm, mart[src])
        if mart[src] >= 1.0:
            assert ppm == 1_000_000


def test_expected_mass_identities(spark):
    """exp_* columns are exact BIGINT products; per-phase doc shares
    sum to ~1e6 (floor-ppm: within n_sources ulps below)."""
    from github_issues_lakehouse_spark.operators.chunking import (
        curriculum_mixture_plan,
    )

    rows = curriculum_mixture_plan(spark, SF_DIR).collect()
    for r in rows:
        assert r["exp_docs_ppm"] == r["n_docs"] * r["sample_prob_ppm"]
        assert r["exp_tokens_ppm"] == r["n_tokens"] * r["sample_prob_ppm"]
    by_phase: dict = {}
    for r in rows:
        by_phase.setdefault(r["phase"], []).append(r["phase_doc_share_ppm"])
    for phase, shares in by_phase.items():
        s = sum(shares)
        assert 1_000_000 - len(shares) <= s <= 1_000_000, (phase, s)


def test_cli_exports_curriculum_mixture_csv(spark, tmp_path):
    """The corpus CLI publishes the loader plan beside the other
    serving marts."""
    import csv
    import os

    from github_issues_lakehouse_spark import cli

    out = tmp_path / "corpus"
    cli.main(
        [
            "corpus",
            "--sf-dir",
            SF_DIR,
            "--out",
            str(out),
            "--min-quality",
            "0.5",
        ]
    )
    path = out / "curriculum_mixture.csv"
    assert os.path.isfile(path)
    rows = list(csv.DictReader(open(path)))
    assert len(rows) >= 5  # at least one source per phase
    assert {"phase", "source", "n_docs", "sample_prob_ppm"} <= set(rows[0])
