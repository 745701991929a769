"""Bookkeeping gates the external review script-checks every round —
pinned in CI so drift is caught at commit time instead (r8):

- SURVEY.md §2 batch table lines == queries() keys == oracle_sql()
  keys, zero in either direction (the r6 B132b defect class: a §2
  line with no registered key, or a key with no coverage line).
- Every bench HEADLINE query has a BASELINE_QUERIES.json entry with
  round provenance (a key benched without a baseline silently skips
  the regression gate — the rebase step these tests make mandatory).
- The driver-priority prefix stays what the round's evidence plan
  says it is (never-checked keys first), so a registry edit cannot
  silently demote the queue.
"""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_keys() -> list[str]:
    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E

    return list(E.queries()), E.oracle_sql()


def test_survey_table_matches_registry_exactly():
    queries, oracles = _registry_keys()
    md = open(os.path.join(REPO, "SURVEY.md")).read()
    rows = re.findall(r"^\| [ABC][0-9]+[a-z]?\b[^|]* \| `([a-z0-9_]+)`", md, re.M)
    assert len(rows) == len(set(rows)), "duplicate §2 table lines"
    table, reg = set(rows), set(queries)
    assert table == reg, (
        f"§2 drift — table-not-registry: {sorted(table - reg)}, "
        f"registry-not-table: {sorted(reg - table)}"
    )
    assert set(oracles) == reg, (
        f"oracle drift — {sorted(set(oracles) ^ reg)}"
    )


def test_every_headline_query_has_a_baseline():
    import sys

    sys.path.insert(0, REPO)
    from bench import HEADLINE

    with open(os.path.join(REPO, "BASELINE_QUERIES.json")) as f:
        base = json.load(f)
    missing = [q for q in HEADLINE if q not in base]
    assert missing == [], (
        f"benched without a baseline (run regress_bench --rebase): {missing}"
    )
    bad = [q for q, v in base.items() if "sec" not in v or "round" not in v]
    assert bad == []


def test_driver_priority_prefix_is_the_evidence_queue():
    queries, _ = _registry_keys()
    # r11 plan (optimization round): 1-12 = the 12 never-driver-checked
    # keys (r10 additions; three of them — facility/selection/kcore —
    # were also rewritten this round, so their first driver row lands
    # on the optimized code), 13-21 = the remaining r11-edited keys
    # (the driver must re-hash every optimizer-touched path), 22-27 =
    # the 6 r4-stale keys promised "first in line for r11" at the r10
    # close, 28-50 = the oldest surviving (r5-vintage) evidence.
    assert queries[:27] == [
        "stream_ann_index_readout",
        "curriculum_mixture_plan",
        "stream_mixture_readout",
        "ann_filtered_topk",
        "facility_location_selection",
        "filtered_ann_recall_at_k",
        "selection_coverage_audit",
        "kcore_trade_graph",
        "sq_int8_recall",
        "xcorr_daily_events",
        "holdout_stratum_weights",
        "rolling_percentiles_daily",
        "pq_adc_recall",
        "pagerank_trade_graph",
        "pca_top_component",
        "pca_projection_outliers",
        "rrf_hybrid_topk",
        "theil_sen_trend",
        "minhash_band_tuning",
        "jaccard_threshold_sweep",
        "hits_hub_authority",
        "unpivot_lineitem_metrics",
        "corr_matrix_lineitem",
        "equi_depth_histogram",
        "table_stats_mart",
        "gopher_quality_rules",
        "join_key_skew",
    ]
    # 28-50: oldest surviving evidence (every key's last driver row is
    # r5-vintage — enforced by class, not by a second pinned list).
    assert queries[27:50][:3] == [
        "gold_sla_mom",
        "dedup_cluster_size_profile",
        "minhash_calibration",
    ]


def _last_round_close() -> str | None:
    """The driver closes each round with a commit titled
    'round N: verdict/advice/...'; the latest one is the evidence
    horizon — driver rows predate it, code after it is unhashed."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "log", "--grep", r"^round [0-9]\+:", "-1", "--format=%H"],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        )
    except (OSError, subprocess.TimeoutExpired):
        return None
    sha = out.stdout.strip()
    return sha or None


def _base_function_source(sha: str, relpath: str, name: str) -> str | None:
    """Source segment of top-level function ``name`` in ``relpath``
    at commit ``sha``; None if the file or function is absent."""
    import ast
    import subprocess

    out = subprocess.run(
        ["git", "show", f"{sha}:{relpath}"],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=30,
    )
    if out.returncode != 0:
        return None
    try:
        tree = ast.parse(out.stdout)
    except SyntaxError:
        return None
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and node.name == name:
            return ast.get_source_segment(out.stdout, node)
    return None


def test_edited_keys_are_in_the_driver_budget_prefix():
    """VERDICT r8 task 2 (the C92/C104 lesson, made mechanical): a
    registry key whose IMPLEMENTING FUNCTION source differs from the
    last round-close commit carries driver evidence that predates its
    code — it must sit inside the next driver-budget prefix (the
    first 50 queries() positions) so the driver re-hashes the new
    path, or be a new key (absent at the round close), which the
    queue-discipline test above already pins below the refresh queue.

    Granularity is the top-level function the registry maps to (lazy
    ``_stream_*`` wrappers resolve to their streaming.ops target); a
    helper-only refactor that leaves every registry function's source
    byte-identical is out of scope by design — the r8 cases both
    edited the registry function body itself."""
    import inspect

    import pytest

    sha = _last_round_close()
    if sha is None:
        pytest.skip("no git history / round-close commit available")

    import sys

    sys.path.insert(0, REPO)
    import __spark_entry__ as E
    from github_issues_lakehouse_spark import queries as Q

    reg = Q.queries()
    order = list(reg)
    budget = set(order[:50])
    new_region = set(order[56:])  # below the committed refresh queue

    offenders = []
    for key, fn in reg.items():
        if fn.__module__ == Q.__name__ and fn.__name__.startswith("_stream_"):
            from github_issues_lakehouse_spark.streaming import ops

            fn = getattr(ops, fn.__name__.lstrip("_"))
        relpath = os.path.relpath(inspect.getsourcefile(fn), REPO)
        current = inspect.getsource(fn)
        base = _base_function_source(sha, relpath, fn.__name__)
        if base is None:
            # new or moved since the round close: must not sit in the
            # stale-refresh middle where it displaces nothing and the
            # driver may never reach it
            if key not in budget and key not in new_region:
                offenders.append((key, "new/moved but parked mid-queue"))
            continue
        if base.strip() != current.strip() and key not in budget:
            offenders.append((key, f"{relpath}:{fn.__name__} edited since {sha[:9]}"))
    assert offenders == [], (
        "keys edited after their last possible driver evidence must "
        f"lead the next driver budget: {offenders}"
    )
