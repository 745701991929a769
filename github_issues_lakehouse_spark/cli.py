"""End-to-end medallion pipeline CLI (reference cli.py:1-29,
__main__.py): ``python -m github_issues_lakehouse_spark
ingest|silver|gold|demo``.

Layout mirrors the reference's DATA_DIR contract:

    <data-dir>/bronze/<owner>__<repo>/issues_<run_id>.jsonl/   (Spark JSONL dir)
    <data-dir>/silver/<owner>__<repo>/issues_silver.parquet
    <data-dir>/silver/<owner>__<repo>/label_catalog.parquet + .csv
    <data-dir>/gold/<owner>__<repo>/kpi_monthly_component_tier.parquet + .csv
    <data-dir>/gold/<owner>__<repo>/kpi_monthly_global.parquet + .csv

Differences from the reference, by design:
- ``ingest`` normalizes a LOCAL issues JSONL file into the bronze
  layout (this environment has no network; the reference's GitHub
  API pagination — ingest.py:85-126 — is replaced by a --input path
  carrying the same payload shape).
- ``silver`` merge-upserts each new bronze run into the silver table
  (keep-latest per issue_id by updated_at), so re-ingesting
  overlapping windows never duplicates issues — the reference
  re-derives silver from only the latest bronze file instead.
- every step is a distributed Spark job; marts are written as
  parquet AND the reference's single-file serving CSVs.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time
from pathlib import Path

from .functions.labels import LakehouseRules


def _load_cfg(config_path: str) -> dict:
    import yaml

    with open(config_path, encoding="utf-8") as f:
        return yaml.safe_load(f) or {}


def _repos(cfg: dict) -> list[tuple[str, str]]:
    repos = (cfg.get("source") or {}).get("repos") or [{"owner": "local", "repo": "issues"}]
    return [(r["owner"], r["repo"]) for r in repos]


def _spark(app_name: str):
    from .session import get_spark

    return get_spark(app_name=app_name)


def run_ingest(
    config: str,
    data_dir: str,
    input_path: str | None = None,
    run_id: str | None = None,
    source: str = "local",
    session=None,
) -> list[str]:
    """Bronze ingestion, two sources:

    - ``local`` (default): normalize a local issues JSONL file into
      the bronze layout (PR exclusion + created_from filter applied
      on read, like reference ingest.py:112-119);
    - ``api``: page the live GitHub issues endpoint (reference
      ingest.py:45-126: Link-header cursor, bearer token from
      $GITHUB_TOKEN or config, server-side ``since``, client-side
      ``created_from``, 422 clean-stop, PR exclusion) into the same
      bronze JSONL contract. ``session`` injects the HTTP client for
      tests; default is a real requests.Session.
    """
    from .sources.readers import read_jsonl_issues

    cfg = _load_cfg(config)
    src_cfg = cfg.get("source") or {}
    ing_cfg = cfg.get("ingestion") or {}
    created_from = src_cfg.get("created_from")
    run_id = run_id or time.strftime("%Y%m%dT%H%M%S")
    spark = _spark("ingest")
    out_paths = []
    for owner, repo in _repos(cfg):
        out = os.path.join(data_dir, "bronze", f"{owner}__{repo}", f"issues_{run_id}.jsonl")
        if source == "api":
            from .sources import api_ingest

            sess = session if session is not None else api_ingest.default_session()
            n_raw = api_ingest.fetch_issues_jsonl(
                sess,
                owner,
                repo,
                out,
                token=os.getenv("GITHUB_TOKEN") or src_cfg.get("token"),
                per_page=int(ing_cfg.get("per_page", 100)),
                since=ing_cfg.get("full_since"),
                created_from=created_from,
            )
            print(f"[ingest] {owner}/{repo}: API wrote {out} ({n_raw} issues, PRs excluded)")
        else:
            if not input_path:
                raise ValueError("local ingest requires --input <issues.jsonl>")
            raw = spark.read.text(input_path)
            # bronze stays RAW lines (reference appends the API pages
            # verbatim); validation happens on read in the silver step
            raw.write.mode("overwrite").text(out)
        n = read_jsonl_issues(spark, out, created_from=created_from).count()
        print(f"[ingest] {owner}/{repo}: wrote {out} ({n} issues after filters)")
        out_paths.append(out)
    return out_paths


def run_silver(config: str, data_dir: str) -> None:
    """All bronze runs -> merged silver table + label catalog
    (reference silver.py:101-197, plus cross-run merge dedup)."""
    from . import sinks
    from .operators.silver import enrich_issues, label_catalog
    from .sources.readers import read_jsonl_issues, read_jsonl_labels

    cfg = _load_cfg(config)
    created_from = (cfg.get("source") or {}).get("created_from")
    rules = LakehouseRules.from_yaml(config)
    spark = _spark("silver")
    for owner, repo in _repos(cfg):
        slug = f"{owner}__{repo}"
        bronze_glob = os.path.join(data_dir, "bronze", slug, "issues_*.jsonl")
        runs = sorted(glob.glob(bronze_glob))
        if not runs:
            raise FileNotFoundError(f"No bronze runs match {bronze_glob}")
        silver_dir = Path(data_dir) / "silver" / slug
        silver_dir.mkdir(parents=True, exist_ok=True)
        silver_path = str(silver_dir / "issues_silver.parquet")

        issues = read_jsonl_issues(spark, runs, created_from=created_from)
        enriched = enrich_issues(issues, rules)
        sinks.merge_upsert(spark, enriched, silver_path, key="issue_id", order_col="updated_at")
        merged = spark.read.parquet(silver_path)

        desc_path = os.path.join(data_dir, "labels", slug, "labels.jsonl")
        descriptions = read_jsonl_labels(spark, desc_path) if os.path.exists(desc_path) else None
        catalog = label_catalog(merged, descriptions)
        sinks.write_partitioned(catalog, str(silver_dir / "label_catalog.parquet"))
        sinks.export_csv_single(
            catalog, str(silver_dir / "label_catalog.csv"), sort_by=["count", "label"]
        )
        n_open = merged.filter(merged.state == "open").count()
        n_closed = merged.filter(merged.state == "closed").count()
        print(f"[silver] {slug}: saved -> {silver_path} (open={n_open} closed={n_closed})")


def run_gold(config: str, data_dir: str, approx: bool = False) -> None:
    """Silver -> monthly KPI marts, parquet + serving CSV (reference
    gold.py:21-166). ``--approx`` switches exact percentiles to
    percentile_approx — the 100 TB path."""
    from . import sinks
    from .operators.gold import (
        kpi_monthly_component_tier,
        kpi_monthly_global,
        sla_stability_mart,
    )

    cfg = _load_cfg(config)
    rules = LakehouseRules.from_yaml(config)
    spark = _spark("gold")
    for owner, repo in _repos(cfg):
        slug = f"{owner}__{repo}"
        silver_path = os.path.join(data_dir, "silver", slug, "issues_silver.parquet")
        if not os.path.exists(silver_path):
            raise FileNotFoundError(f"No silver table at {silver_path}; run silver first")
        gold_dir = Path(data_dir) / "gold" / slug
        gold_dir.mkdir(parents=True, exist_ok=True)

        silver = spark.read.parquet(silver_path)
        kpi = kpi_monthly_component_tier(silver, rules, approx=approx)
        glob_kpi = kpi_monthly_global(kpi, rules)
        sinks.write_partitioned(kpi, str(gold_dir / "kpi_monthly_component_tier.parquet"))
        sinks.export_csv_single(
            kpi,
            str(gold_dir / "kpi_monthly_component_tier.csv"),
            sort_by=["component", "priority_tier", "month"],
        )
        sinks.write_partitioned(glob_kpi, str(gold_dir / "kpi_monthly_global.parquet"))
        sinks.export_csv_single(
            glob_kpi, str(gold_dir / "kpi_monthly_global.csv"), sort_by=["month"]
        )
        # reference-README SLA/stability KPIs (README "SLA rule" /
        # "Monthly KPIs"; the reference describes them but never
        # ships them)
        sla = sla_stability_mart(silver, rules=rules)
        sinks.write_partitioned(sla, str(gold_dir / "sla_stability.parquet"))
        sinks.export_csv_single(
            sla, str(gold_dir / "sla_stability.csv"), sort_by=["component", "month"]
        )
        n_months = glob_kpi.count()
        print(f"[gold] {slug}: saved -> {gold_dir} ({n_months} months)")


def run_demo(config: str, data_dir: str, n: int = 5) -> None:
    """Print the tail of the global KPI mart (reference demo.py:7-17)."""
    cfg = _load_cfg(config)
    spark = _spark("demo")
    for owner, repo in _repos(cfg):
        slug = f"{owner}__{repo}"
        path = os.path.join(data_dir, "gold", slug, "kpi_monthly_global.csv")
        if not os.path.exists(path):
            raise FileNotFoundError(f"Gold output not found at {path}. Run: gold")
        df = spark.read.option("header", "true").csv(path)
        print(f"[demo] {slug}: last {n} months:")
        rows = df.orderBy("month").tail(n)
        cols = df.columns
        print(" | ".join(cols))
        for r in rows:
            print(" | ".join("" if v is None else str(v) for v in r))


def run_corpus(
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.8,
    shard_tokens: int = 512,
) -> dict:
    """One-command training-corpus build — the C-suite composed the
    way a pretraining data job runs it:

    1. gate: exact-dedup keeper AND english AND quality >= threshold
       (training_corpus_filter — one feature scan);
    2. near-dup removal: connected components over MinHash pairs,
       then keep the highest-quality GATE-PASSING doc per cluster —
       re-picked among gated members, not the global keep-best
       verdict, so a cluster whose global best fails the gate still
       contributes its best surviving duplicate;
    3. split: deterministic md5-permille train/val/test buckets;
    4. shard plan: equal-token shards over the kept train split
       (two-level prefix sum, exchange-reuse single scan); n_tokens
       is computed for every kept doc (all splits) with the same
       tokenizer, shard_id stays train-only (-1 elsewhere);
    5. write: documents parquet partitioned by split + a per-doc
       manifest (split, shard_id, n_tokens, quality) + a summary CSV.

    Every stage is the registry operator itself — the CLI adds only
    composition and persistence. Returns the summary as a dict.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from . import sinks
    from .functions.textfns import norm_tokens
    from .operators.chunking import plan_token_shards
    from .operators.dedup import dedup_clusters
    from .operators.scale import holdout_split, training_corpus_filter
    from .sources.registry import load_table

    spark = _spark("corpus")
    docs = load_table(spark, sf_dir, "documents")

    gated = training_corpus_filter(spark, sf_dir, min_quality=min_quality).select(
        "doc_id", "quality_score"
    )
    # Near-dup keep-best restricted to gated docs: clustered gated docs
    # compete only against gated cluster-mates (argmax quality, ties ->
    # min doc_id); unclustered gated docs pass through via anti-join —
    # no all-NULL window partition, no giant single task.
    clusters = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    in_cluster = gated.join(clusters, "doc_id")
    w_best = Window.partitionBy("cluster_id").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    cluster_best = (
        in_cluster.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", "quality_score")
    )
    unclustered = gated.join(clusters, "doc_id", "left_anti")
    kept = unclustered.unionByName(cluster_best)

    split = holdout_split(spark, sf_dir).select("doc_id", "split")
    kept_docs = docs.join(kept, "doc_id").join(split, "doc_id")

    train_docs = kept_docs.filter(F.col("split") == "train")
    shards = plan_token_shards(spark, sf_dir, shard_tokens=shard_tokens, docs=train_docs)

    manifest = (
        kept_docs.select(
            "doc_id",
            "source",
            "split",
            "quality_score",
            # same tokenizer as plan_token_shards, for EVERY kept doc —
            # val/test report real token counts in the summary
            F.array_size(norm_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .join(shards.select("doc_id", "shard_id"), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "split",
            "quality_score",
            "n_tokens",
            F.coalesce("shard_id", F.lit(-1)).cast("long").alias("shard_id"),
        )
    )

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    sinks.write_partitioned(
        kept_docs.select("doc_id", "source", "split", "text"),
        str(out / "documents.parquet"),
        partition_by=["split"],
    )
    sinks.write_partitioned(manifest, str(out / "manifest.parquet"))
    summary = (
        manifest.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("n_tokens", F.lit(0))).cast("long").alias("n_tokens"),
            F.count_distinct(F.when(F.col("shard_id") >= 0, F.col("shard_id"))).alias(
                "n_shards"
            ),
        )
        .orderBy("split")
    )
    sinks.export_csv_single(summary, str(out / "summary.csv"), sort_by=["split"])

    # Serving CSVs for the corpus dashboard (docs/corpus.html): the
    # registry marts themselves, exported single-file like the gold
    # KPIs. All are source- or bucket-grained (serving-sized).
    from .operators.text import quality_score
    from .operators.text2 import dedup_rate_mart, source_mixing_weights

    sinks.export_csv_single(
        source_mixing_weights(spark, sf_dir), str(out / "source_mix.csv"),
        sort_by=["source"],
    )
    sinks.export_csv_single(
        dedup_rate_mart(spark, sf_dir), str(out / "dedup_rate.csv"),
        sort_by=["source"],
    )
    from .operators.chunking import curriculum_mixture_plan

    sinks.export_csv_single(
        curriculum_mixture_plan(spark, sf_dir),
        str(out / "curriculum_mixture.csv"),
        sort_by=["phase", "source"],
    )
    q = quality_score(spark, sf_dir).select(
        "doc_id",
        F.least(F.floor(F.col("quality_score") * 20), F.lit(19))
        .cast("int")
        .alias("bucket"),
    )
    hist = (
        q.join(kept.select("doc_id", F.lit(1).alias("is_kept")), "doc_id", "left")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("is_kept", F.lit(0))).cast("long").alias("n_kept"),
        )
        .select(
            "bucket",
            F.round(F.col("bucket") / 20.0, 2).alias("q_lo"),
            F.round((F.col("bucket") + 1) / 20.0, 2).alias("q_hi"),
            "n_docs",
            "n_kept",
        )
    )
    sinks.export_csv_single(hist, str(out / "quality_hist.csv"), sort_by=["bucket"])

    rows = {r["split"]: (r["n_docs"], r["n_tokens"], r["n_shards"]) for r in summary.collect()}
    for sp, (nd, nt, ns) in rows.items():
        print(f"[corpus] {sp}: {nd} docs, {nt} tokens, {ns} shards")
    return rows


def run_export(
    config: str,
    data_dir: str,
    docs_data: str = "docs/data",
    corpus_dir: str | None = None,
) -> list[str]:
    """Publish the serving CSVs to the dashboard data dir (reference
    scripts/export_pages_data.py behavior): copy each repo's gold
    kpi_monthly_global.csv (and the silver label catalog) into
    ``docs_data`` for the static dashboard / GitHub Pages. With
    ``corpus_dir`` (a `corpus` command output dir), also publish the
    corpus marts under ``docs_data``/corpus for docs/corpus.html."""
    import shutil

    cfg = _load_cfg(config)
    out = Path(docs_data)
    out.mkdir(parents=True, exist_ok=True)
    copied = []
    for owner, repo in _repos(cfg):
        slug = f"{owner}__{repo}"
        src = os.path.join(data_dir, "gold", slug, "kpi_monthly_global.csv")
        if not os.path.exists(src):
            raise FileNotFoundError(f"Missing {src} (run gold first)")
        shutil.copy2(src, out / "kpi_monthly_global.csv")
        copied.append(str(out / "kpi_monthly_global.csv"))
        cat = os.path.join(data_dir, "silver", slug, "label_catalog.csv")
        if os.path.exists(cat):
            shutil.copy2(cat, out / "label_catalog.csv")
            copied.append(str(out / "label_catalog.csv"))
        sla = os.path.join(data_dir, "gold", slug, "sla_stability.csv")
        if os.path.exists(sla):
            shutil.copy2(sla, out / "sla_stability.csv")
            copied.append(str(out / "sla_stability.csv"))
        print(f"[export] {slug}: published {len(copied)} file(s) -> {out}")
    if corpus_dir is not None:
        cdir = out / "corpus"
        cdir.mkdir(parents=True, exist_ok=True)
        for name in (
            "summary.csv",
            "source_mix.csv",
            "dedup_rate.csv",
            "quality_hist.csv",
            "curriculum_mixture.csv",
        ):
            src = os.path.join(corpus_dir, name)
            if not os.path.exists(src):
                raise FileNotFoundError(f"Missing {src} (run corpus first)")
            shutil.copy2(src, cdir / name)
            copied.append(str(cdir / name))
        print(f"[export] corpus marts published -> {cdir}")
    return copied


def run_mart(
    events_path: str, mart_dir: str, batch_id: int | None = None
) -> tuple[int, bool]:
    """Incremental daily-mart maintenance, batch form: fold one events
    parquet batch into the versioned mart at ``mart_dir`` under the
    same exactly-once protocol the streaming path uses (idempotent on
    batch_id, atomic pointer commit) — the scheduled-job twin of
    ``stream_mart_maintenance`` for shops that land hourly files
    instead of running a stream. Returns (batch_id, applied)."""
    from .streaming.ops import _read_mart_meta, mart_fold_batch, read_mart

    spark = _spark("mart")
    events = spark.read.parquet(events_path)
    if batch_id is None:
        meta = _read_mart_meta(mart_dir)
        batch_id = (meta["batch_id"] + 1) if meta else 0
    applied = mart_fold_batch(events, batch_id, mart_dir)
    state = "applied" if applied else "skipped (replay)"
    n = read_mart(spark, mart_dir).count()
    print(f"[mart] batch {batch_id} {state}; mart now {n} rows -> {mart_dir}")
    return batch_id, applied


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(prog="github_issues_lakehouse_spark")
    parser.add_argument(
        "command",
        choices=["ingest", "silver", "gold", "demo", "corpus", "mart", "export"],
    )
    parser.add_argument("--config", default="config.yml")
    parser.add_argument("--data-dir", default=os.getenv("DATA_DIR", "./data"))
    parser.add_argument("--input", help="ingest: local issues JSONL path")
    parser.add_argument(
        "--source",
        choices=["local", "api"],
        default="local",
        help="ingest: 'local' JSONL file or live GitHub 'api'",
    )
    parser.add_argument("--run-id", help="ingest: bronze run id (default: timestamp)")
    parser.add_argument("--approx", action="store_true", help="gold: approximate percentiles")
    parser.add_argument("--sf-dir", default=os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    parser.add_argument("--out", help="corpus/mart: output directory")
    parser.add_argument("--min-quality", type=float, default=0.8)
    parser.add_argument("--shard-tokens", type=int, default=512)
    parser.add_argument("--batch-id", type=int, help="mart: explicit batch id")
    parser.add_argument(
        "--corpus-dir", help="export: corpus output dir to publish as corpus marts"
    )
    args = parser.parse_args(argv)

    if args.command == "ingest":
        if args.source == "local" and not args.input:
            parser.error("ingest --source local requires --input <issues.jsonl>")
        run_ingest(args.config, args.data_dir, args.input, args.run_id, source=args.source)
    elif args.command == "silver":
        run_silver(args.config, args.data_dir)
    elif args.command == "gold":
        run_gold(args.config, args.data_dir, approx=args.approx)
    elif args.command == "corpus":
        if not args.out:
            parser.error("corpus requires --out <dir>")
        run_corpus(args.sf_dir, args.out, args.min_quality, args.shard_tokens)
    elif args.command == "mart":
        if not (args.input and args.out):
            parser.error("mart requires --input <events.parquet> --out <mart_dir>")
        run_mart(args.input, args.out, args.batch_id)
    elif args.command == "export":
        run_export(
            args.config,
            args.data_dir,
            args.out or "docs/data",
            corpus_dir=args.corpus_dir,
        )
    else:
        run_demo(args.config, args.data_dir)
    print(f"Command selected: {args.command}")


if __name__ == "__main__":
    main(sys.argv[1:])
