#!/usr/bin/env python
"""Regenerate the docs/data serving-layer sample CSVs.

Synthesizes a GitHub-shaped bronze JSONL batch from the sf0.001
testdata (with the closed_at >= created_at clamp — see
operators/silver.py synth_bronze_jsonl), runs the full CLI pipeline
(ingest -> silver -> gold) in a temp dir, and copies the serving CSVs
into docs/data/.

Usage: python tools/make_demo_data.py [sf_dir] [docs_data_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIG = """\
source:
  repos:
    - {owner: demo, repo: issues}
"""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    docs_data = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "docs", "data")

    from github_issues_lakehouse_spark.cli import run_gold, run_ingest, run_silver
    from github_issues_lakehouse_spark.operators.silver import synth_bronze_jsonl
    from github_issues_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="make_demo_data")
    work = tempfile.mkdtemp(prefix="demo_data_")
    try:
        cfg = os.path.join(work, "config.yml")
        with open(cfg, "w") as f:
            f.write(CONFIG)
        jsonl = os.path.join(work, "issues.jsonl")
        n = synth_bronze_jsonl(spark, sf_dir, jsonl)
        print(f"[demo-data] synthesized {n} issues -> {jsonl}")
        data_dir = os.path.join(work, "data")
        run_ingest(cfg, data_dir, jsonl, run_id="demo")
        run_silver(cfg, data_dir)
        run_gold(cfg, data_dir)
        slug = "demo__issues"
        os.makedirs(docs_data, exist_ok=True)
        for name, src in (
            ("kpi_monthly_global.csv", os.path.join(data_dir, "gold", slug, "kpi_monthly_global.csv")),
            ("label_catalog.csv", os.path.join(data_dir, "silver", slug, "label_catalog.csv")),
            ("sla_stability.csv", os.path.join(data_dir, "gold", slug, "sla_stability.csv")),
        ):
            shutil.copyfile(src, os.path.join(docs_data, name))
            print(f"[demo-data] refreshed {os.path.join(docs_data, name)}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
