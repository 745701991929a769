"""Round-10 wave 1: self-adjudicating bench contention annotations
(VERDICT r9 task 2) + the ADVICE r9 hardening fixes that have no
Spark dependency (fast, no session)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_annotate_contention_nearest_sample():
    from bench import _annotate_contention

    names = [f"q{i}" for i in range(25)]
    # controls before q0, q10, q20 and after q24; the q10 window ran
    # 3x slow — queries 5..14 are nearest to it (by |pos - (i+0.5)|:
    # q5 at 5.5 is 4.5 from pos 10 vs 5.5 from pos 0)
    samples = [
        {"pos": 0, "sec": 0.5},
        {"pos": 10, "sec": 1.5},
        {"pos": 20, "sec": 0.5},
        {"pos": 25, "sec": 0.5},
    ]
    ratios, contended = _annotate_contention(names, samples, floor=0.5, ratio_cap=1.5)
    assert ratios["q0"] == 1.0 and ratios["q24"] == 1.0
    assert ratios["q10"] == 3.0
    assert contended == [f"q{i}" for i in range(5, 15)]
    # boundary: q4 (pos 4.5) is closer to the quiet control at pos 0
    assert ratios["q4"] == 1.0


def test_annotate_contention_degenerate_inputs():
    from bench import _annotate_contention

    assert _annotate_contention(["a"], [], 0.5) == ({}, [])
    assert _annotate_contention(["a"], [{"pos": 0, "sec": 1.0}], 0.0) == ({}, [])


def test_control_reference_is_median_clamped_by_stamp(tmp_path, monkeypatch):
    import bench

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    (tmp_path / "BASELINE_QUERIES.json").write_text(
        json.dumps({bench.CONTROL_QUERY: {"sec": 0.4, "round": "r1"}})
    )
    # one outlier-fast sample must NOT become the reference (the r10
    # 0.213s-floor incident: 160 quiet lines mis-flagged); the median
    # of a quiet run is
    quiet = [{"pos": p, "sec": s} for p, s in ((0, 0.21), (10, 0.33), (20, 0.34))]
    assert bench._control_floor(quiet) == 0.33
    # a fully-contended run cannot self-normalize: median 1.2 clamps
    # to 1.5x the 0.4s quiet stamp
    hot = [{"pos": p, "sec": s} for p, s in ((0, 1.1), (10, 1.2), (20, 1.3))]
    assert bench._control_floor(hot) == pytest.approx(0.6)
    # no baseline file: the plain median
    (tmp_path / "BASELINE_QUERIES.json").unlink()
    assert bench._control_floor(hot) == 1.2
    # non-sf0.1 never consults the stamp
    assert bench._control_floor(quiet, sf_val=0.001) == 0.33


def test_regress_bench_quotes_contended_flags(tmp_path):
    """A replay of the r9 false-flag class: a line 2x over baseline
    whose window the control proves 2.6x slow auto-classifies as
    host-contended in the printout; a flag in a quiet window stays a
    plain REGRESSION."""
    (tmp_path / "BASELINE_QUERIES.json").write_text(
        json.dumps(
            {
                "alpha": {"sec": 1.0, "round": "r1"},
                "beta": {"sec": 1.0, "round": "r1"},
                "gamma": {"sec": 1.0, "round": "r1"},
            }
        )
    )
    artifact = {
        "metric": "headline_queries_wall_total",
        "value": 5.1,
        "unit": "sec",
        "sf": 0.1,
        "queries": {"alpha": 2.0, "beta": 2.1, "gamma": 1.0},
        "control": {"query": "ctl", "every": 10, "floor_sec": 0.5, "ratio_cap": 1.5},
        "contention": {"alpha": 2.6, "beta": 1.0, "gamma": 1.1},
        "contended": ["alpha"],
    }
    (tmp_path / "BENCH_QUERIES.json").write_text(json.dumps(artifact))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "regress_bench.py"), "BENCH_QUERIES.json"],
        cwd=tmp_path,
        capture_output=True,
        text=True,
        timeout=60,
    )
    assert out.returncode == 1  # flags still exit 1 (confirm decides)
    lines = out.stdout.splitlines()
    alpha = next(ln for ln in lines if ln.startswith("alpha"))
    beta = next(ln for ln in lines if ln.startswith("beta"))
    gamma = next(ln for ln in lines if ln.startswith("gamma"))
    assert "host-contended window: control 2.60x" in alpha
    assert "REGRESSION" in beta and "host-contended" not in beta
    assert "REGRESSION" not in gamma


def test_pid_alive_rejects_out_of_range_pids():
    from github_issues_lakehouse_spark.streaming.ops import _pid_alive

    assert _pid_alive(os.getpid()) is True
    assert _pid_alive(2**62) is False  # OverflowError path (ADVICE r9)
    assert _pid_alive(999999999999) is False


def test_bench_artifact_contract_fields():
    """bench.py's side-file writer must keep the contention fields the
    regress tool reads; pin the module-level contract constants."""
    import bench

    assert bench.CONTROL_QUERY in bench.HEADLINE
    assert bench.CONTROL_QUERY in bench.BASELINE_22
    assert bench.CONTROL_EVERY >= 1
    assert bench.CONTENTION_RATIO > 1.0
