"""End-to-end medallion pipeline: config-driven rules (reference
config.yml), ingest -> silver (cross-run merge dedup) -> gold ->
demo, serving CSV exports, label-catalog descriptions."""

import json
import os

import pytest

from github_issues_lakehouse_spark.functions.labels import LakehouseRules

# The reference's config.yml rule data verbatim (rule DATA is the
# parity contract; the loader must reproduce the hardcoded defaults
# from it exactly).
REFERENCE_CONFIG = """
source:
  repos:
    - owner: testowner
      repo: testrepo
  created_from: "2016-01-01"

rules:
  kind_labels:
    bug: ["Bug"]
    enhancement: ["Enhancement"]
    docs: ["Docs"]
    question: ["Usage Question"]
  process_labels:
    - "Needs Triage"
    - "Needs Discussion"
    - "Needs Info"
    - "Closing Candidate"
    - "good first issue"
    - "Needs Tests"
    - "Duplicate Report"
    - "Upstream issue"
  priority_tiers:
    P0: ["Blocker", "Blocker for rc", "Segfault"]
    P1: ["Regression"]
    P2_fallback_if_bug: true
  component:
    prefixes: ["component:", "module:", "area:"]
    allowlist:
      - "Indexing"
      - "Groupby"
      - "Arrow"
      - "Datetime"
      - "Reshaping"
      - "Missing-data"
      - "Dtype Conversions"
      - "Performance"
      - "IO CSV"
      - "Strings"
      - "Error Reporting"
      - "Deprecate"
      - "MultiIndex"
      - "Apply"
      - "Build"
      - "API Design"
      - "Numeric Operations"
      - "IO Excel"
      - "ExtensionArray"
      - "Visualization"
      - "Categorical"
      - "Index"
      - "API - Consistency"
      - "Window"
      - "Reduction Operations"
      - "IO SQL"
      - "IO JSON"
      - "NA - MaskedArrays"
      - "IO Data"
      - "Frequency"
  time_buckets_hours: [24, 72, 168, 336]
  hours_in_month: 720
"""


@pytest.fixture()
def config_path(tmp_path):
    p = tmp_path / "config.yml"
    p.write_text(REFERENCE_CONFIG, encoding="utf-8")
    return str(p)


def _issue(i, state="open", title="t", created="2020-01-01T00:00:00Z",
           updated="2020-01-02T00:00:00Z", closed=None, labels=(), pr=False):
    d = {
        "id": i,
        "number": i,
        "state": state,
        "title": title,
        "body": f"body {i}",
        "created_at": created,
        "updated_at": updated,
        "closed_at": closed,
        "labels": [{"name": l} for l in labels],
    }
    if pr:
        d["pull_request"] = {"url": "http://example.invalid/pr"}
    return d


def test_from_yaml_reproduces_default_rules(config_path, spark):
    """Rules parsed from a copy of the reference config produce
    IDENTICAL silver output to the hardcoded defaults (VERDICT r1
    item 6's done criterion)."""
    from github_issues_lakehouse_spark.operators.silver import enrich_issues, synth_issues

    from .conftest import SF_DIR

    loaded = LakehouseRules.from_yaml(config_path)
    assert loaded == LakehouseRules()

    base = synth_issues(spark, SF_DIR)
    a = enrich_issues(base, LakehouseRules()).orderBy("issue_id").collect()
    b = enrich_issues(base, loaded).orderBy("issue_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_from_yaml_overrides_apply(tmp_path, spark):
    """A user editing label rules (the reference's customization
    point) flows through to silver output."""
    cfg = tmp_path / "custom.yml"
    cfg.write_text(
        """
rules:
  kind_labels:
    bug: ["Defect-Label"]
  priority_tiers:
    P0: ["Showstopper"]
    P2_fallback_if_bug: false
""",
        encoding="utf-8",
    )
    r = LakehouseRules.from_yaml(str(cfg))
    assert r.kind_labels["bug"] == ["Defect-Label"]
    assert r.priority_tiers["P0"] == ["Showstopper"]
    assert r.p2_fallback_if_bug is False
    # untouched keys keep defaults
    assert r.time_buckets_hours == [24, 72, 168, 336]

    from github_issues_lakehouse_spark.operators.silver import enrich_issues

    import datetime

    df = spark.createDataFrame(
        [(1, datetime.datetime(2020, 1, 1), None, ["Defect-Label"])],
        "issue_id long, created_at timestamp, closed_at timestamp, labels array<string>",
    )
    row = enrich_issues(df, r).first()
    assert row.ticket_kind == "defect"
    assert row.priority_tier == "NA"  # P2 fallback disabled


def test_pipeline_end_to_end_with_cross_run_dedup(config_path, tmp_path, spark, capsys):
    from github_issues_lakehouse_spark.cli import run_demo, run_gold, run_ingest, run_silver

    data_dir = str(tmp_path / "data")

    # batch 1: three issues (one closed defect), plus a PR that must
    # be excluded and a pre-created_from issue that must be filtered
    b1 = tmp_path / "batch1.jsonl"
    b1.write_text(
        "\n".join(
            json.dumps(x)
            for x in [
                _issue(1, "closed", "bug one", "2020-01-10T00:00:00Z",
                       "2020-01-11T00:00:00Z", "2020-01-12T00:00:00Z", ["Bug", "Blocker"]),
                _issue(2, "open", "question", labels=["Usage Question"]),
                _issue(3, "open", "enhance", labels=["Enhancement", "component: IO"]),
                _issue(90, "open", "a pr", labels=["Bug"], pr=True),
                _issue(91, "open", "ancient", created="2015-06-01T00:00:00Z", labels=["Bug"]),
            ]
        ),
        encoding="utf-8",
    )
    # batch 2: re-delivers issue 2 with a NEWER update (now closed)
    # and adds issue 4
    b2 = tmp_path / "batch2.jsonl"
    b2.write_text(
        "\n".join(
            json.dumps(x)
            for x in [
                _issue(2, "closed", "question v2", "2020-01-01T00:00:00Z",
                       "2020-02-05T00:00:00Z", "2020-02-04T00:00:00Z", ["Usage Question"]),
                _issue(4, "open", "another bug", "2020-02-01T00:00:00Z",
                       "2020-02-02T00:00:00Z", None, ["Bug", "Regression"]),
            ]
        ),
        encoding="utf-8",
    )
    # label descriptions dump (GitHub labels endpoint shape)
    labels_dir = tmp_path / "data" / "labels" / "testowner__testrepo"
    labels_dir.mkdir(parents=True)
    (labels_dir / "labels.jsonl").write_text(
        json.dumps({"name": "Bug", "description": "Something broken"})
        + "\n"
        + json.dumps({"name": "Enhancement", "description": None}),
        encoding="utf-8",
    )

    run_ingest(config_path, data_dir, str(b1), run_id="r1")
    run_silver(config_path, data_dir)
    run_ingest(config_path, data_dir, str(b2), run_id="r2")
    run_silver(config_path, data_dir)

    silver = spark.read.parquet(
        os.path.join(data_dir, "silver", "testowner__testrepo", "issues_silver.parquet")
    )
    rows = {r.issue_id: r for r in silver.collect()}
    # PR and pre-created_from issues excluded; issue 2 deduped to v2
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2].title == "question v2"
    assert rows[2].state == "closed"
    assert rows[1].ticket_kind == "defect" and rows[1].priority_tier == "P0"
    assert rows[4].priority_tier == "P1"
    assert rows[3].component == "IO"
    # silver carries the reference's passthrough columns
    for col in ("issue_number", "title", "body", "updated_at"):
        assert col in silver.columns

    cat = spark.read.parquet(
        os.path.join(data_dir, "silver", "testowner__testrepo", "label_catalog.parquet")
    )
    cat_rows = {r.label: r for r in cat.collect()}
    assert cat_rows["Bug"].description == "Something broken"
    assert cat_rows["Usage Question"].description == ""

    run_gold(config_path, data_dir)
    gold_csv = os.path.join(
        data_dir, "gold", "testowner__testrepo", "kpi_monthly_global.csv"
    )
    assert os.path.isfile(gold_csv)
    g = spark.read.option("header", "true").csv(gold_csv)
    months = {r.month for r in g.collect()}
    assert "2020-01" in months  # defect #1 created+closed in Jan
    assert "2020-02" in months  # defect #4 created in Feb

    run_demo(config_path, data_dir)
    out = capsys.readouterr().out
    assert "last 5 months" in out and "2020-01" in out


def test_corpus_build_end_to_end(spark, tmp_path):
    """`corpus` composes gate -> near-dup removal -> split -> shard
    plan -> partitioned write; invariants: kept set is a subset of the
    corpus with no exact-dup pairs both kept, every kept doc has a
    split, every train doc a shard, summary conserves counts."""
    from github_issues_lakehouse_spark.cli import run_corpus
    from github_issues_lakehouse_spark.sources.registry import load_table

    out = str(tmp_path / "corpus")
    rows = run_corpus("/root/testdata/sf0.001", out, min_quality=0.5)
    docs = spark.read.parquet(f"{out}/documents.parquet")
    manifest = spark.read.parquet(f"{out}/manifest.parquet")
    n_all = load_table(spark, "/root/testdata/sf0.001", "documents").count()
    n_kept = docs.count()
    assert 0 < n_kept < n_all
    assert manifest.count() == n_kept
    assert set(r.split for r in manifest.select("split").distinct().collect()) <= {
        "train", "val", "test"
    }
    train = manifest.filter(manifest.split == "train")
    assert train.filter(train.shard_id < 0).count() == 0
    assert sum(nd for nd, _, _ in rows.values()) == n_kept
    # n_tokens is real for EVERY split (not train-only), summary sums it
    assert manifest.filter(manifest.n_tokens.isNull()).count() == 0
    for sp, (nd, nt, ns) in rows.items():
        assert nt > 0, f"{sp} reports zero tokens"
        assert ns == 0 if sp != "train" else ns > 0
    # keep-best is gate-aware: every near-dup cluster with >=1 gated
    # member contributes exactly one doc
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.operators.dedup import dedup_clusters
    from github_issues_lakehouse_spark.operators.scale import training_corpus_filter

    gated = training_corpus_filter(spark, "/root/testdata/sf0.001", min_quality=0.5)
    clus = dedup_clusters(spark, "/root/testdata/sf0.001").select("doc_id", "cluster_id")
    gated_clusters = gated.join(clus, "doc_id").select("cluster_id").distinct()
    kept_per_cluster = (
        docs.select("doc_id")
        .join(clus, "doc_id")
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    survived = gated_clusters.join(kept_per_cluster, "cluster_id", "left").select(
        F.coalesce("n", F.lit(0)).alias("n")
    )
    assert survived.filter(F.col("n") != 1).count() == 0


def test_demo_bronze_clamps_resolution_hours(tmp_path, spark):
    """The demo bronze synthesizer enforces closed_at >= created_at,
    so every gold resolution-hour metric is non-negative (the shipped
    docs/data CSVs are produced by this exact path)."""
    import csv
    import json

    from github_issues_lakehouse_spark.cli import run_gold, run_ingest, run_silver
    from github_issues_lakehouse_spark.operators.silver import synth_bronze_jsonl

    # no created_from: the sf0.001-derived issues are 1990s-dated
    cfg = tmp_path / "config.yml"
    cfg.write_text(
        "source:\n  repos:\n    - {owner: demo, repo: issues}\n", encoding="utf-8"
    )
    config_path = str(cfg)
    jsonl = str(tmp_path / "issues.jsonl")
    n = synth_bronze_jsonl(spark, "/root/testdata/sf0.001", jsonl)
    assert n > 0
    for line in open(jsonl):
        it = json.loads(line)
        if it["closed_at"] is not None:
            assert it["closed_at"] >= it["created_at"]
        assert it["updated_at"] >= it["created_at"]

    data_dir = str(tmp_path / "data")
    run_ingest(config_path, data_dir, jsonl, run_id="demo")
    run_silver(config_path, data_dir)
    run_gold(config_path, data_dir)
    csv_path = f"{data_dir}/gold/demo__issues/kpi_monthly_global.csv"
    rows = list(csv.DictReader(open(csv_path)))
    assert rows
    cols = ("avg_resolution_hours", "median_resolution_hours", "p90_resolution_hours")
    bad = [r for r in rows if any(r[c] and float(r[c]) < 0 for c in cols)]
    assert bad == []


def test_mart_cli_incremental_fold(tmp_path, spark):
    """`mart` folds event batches incrementally with replay safety:
    two batches equal the batch mart over both; re-running the last
    batch id is a no-op."""
    from github_issues_lakehouse_spark.cli import run_mart
    from github_issues_lakehouse_spark.operators.gold import daily_event_mart
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import read_mart

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    b0 = events.filter(events.event_id % 2 == 0)
    b1 = events.filter(events.event_id % 2 == 1)
    p0, p1 = str(tmp_path / "b0.parquet"), str(tmp_path / "b1.parquet")
    b0.write.parquet(p0)
    b1.write.parquet(p1)
    mart = str(tmp_path / "mart")

    assert run_mart(p0, mart) == (0, True)
    assert run_mart(p1, mart) == (1, True)
    # replay of batch 1: skipped
    assert run_mart(p1, mart, batch_id=1) == (1, False)

    got = {
        (r.day, r.event_type): (r.n_events, float(r.total_value))
        for r in read_mart(spark, mart).collect()
    }
    want = {
        (r.day, r.event_type): (r.n_events, float(r.total_value))
        for r in daily_event_mart(events).collect()
    }
    assert got == want


def test_export_publishes_serving_csvs(tmp_path):
    """`export` (reference scripts/export_pages_data.py parity)
    copies the gold CSV + label catalog into the dashboard data dir;
    missing gold raises."""
    import pytest as _pytest

    from github_issues_lakehouse_spark.cli import run_export

    cfg = tmp_path / "config.yml"
    cfg.write_text("source:\n  repos:\n    - {owner: acme, repo: widgets}\n")
    data = tmp_path / "data"
    docs = tmp_path / "docs_data"

    with _pytest.raises(FileNotFoundError):
        run_export(str(cfg), str(data), str(docs))

    gold = data / "gold" / "acme__widgets"
    gold.mkdir(parents=True)
    (gold / "kpi_monthly_global.csv").write_text("month,created_count\n2020-01,5\n")
    silver = data / "silver" / "acme__widgets"
    silver.mkdir(parents=True)
    (silver / "label_catalog.csv").write_text("label,count\nBug,3\n")

    copied = run_export(str(cfg), str(data), str(docs))
    assert sorted(p.rsplit("/", 1)[-1] for p in copied) == [
        "kpi_monthly_global.csv", "label_catalog.csv",
    ]
    assert (docs / "kpi_monthly_global.csv").read_text().startswith("month,")


def test_corpus_exports_dashboard_marts(spark, tmp_path):
    """`corpus` publishes the dashboard mart CSVs (source mix, dedup
    rate, quality histogram) and `export --corpus-dir` copies them to
    the docs data dir; histogram counts conserve the corpus total and
    the kept column matches the kept document count."""
    import csv

    from github_issues_lakehouse_spark.cli import run_corpus, run_export
    from github_issues_lakehouse_spark.sources.registry import load_table

    out = str(tmp_path / "corpus")
    run_corpus("/root/testdata/sf0.001", out, min_quality=0.5)
    for name in ("source_mix.csv", "dedup_rate.csv", "quality_hist.csv"):
        assert (tmp_path / "corpus" / name).exists(), name

    with open(tmp_path / "corpus" / "quality_hist.csv") as f:
        hist = list(csv.DictReader(f))
    n_all = load_table(spark, "/root/testdata/sf0.001", "documents").count()
    n_kept = spark.read.parquet(f"{out}/documents.parquet").count()
    assert sum(int(r["n_docs"]) for r in hist) == n_all
    assert sum(int(r["n_kept"]) for r in hist) == n_kept
    for r in hist:
        assert 0 <= int(r["n_kept"]) <= int(r["n_docs"])

    with open(tmp_path / "corpus" / "source_mix.csv") as f:
        mix = list(csv.DictReader(f))
    assert abs(sum(float(r["share"]) for r in mix) - 1.0) < 1e-3

    # export publishes them under docs_data/corpus (no gold needed:
    # write a minimal gold layout first)
    cfg = tmp_path / "config.yml"
    cfg.write_text("source:\n  repos:\n    - {owner: acme, repo: widgets}\n")
    docs_data = tmp_path / "docs_data"
    gold = tmp_path / "data" / "gold" / "acme__widgets"
    gold.mkdir(parents=True)
    (gold / "kpi_monthly_global.csv").write_text("month,created_count\n2024-01,1\n")
    copied = run_export(
        str(cfg), str(tmp_path / "data"), str(docs_data), corpus_dir=out
    )
    for name in ("summary.csv", "source_mix.csv", "dedup_rate.csv", "quality_hist.csv"):
        assert (docs_data / "corpus" / name).exists(), name
    assert len(copied) >= 5
