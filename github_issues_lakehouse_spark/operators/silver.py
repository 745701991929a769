"""Silver layer: raw issues -> enriched, typed issue table.

Reference parity: ``silver.py:101-197`` (run_silver). The reference
iterates JSONL rows in a Python loop on one machine; here the whole
enrichment is a single declarative projection over any issues-shaped
DataFrame — Catalyst prunes unused columns and the label rules run
inside whole-stage codegen, so the same code scales to a 100 TB
bronze layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import labels as L
from ..sources.registry import load_table


def enrich_issues(df: DataFrame, rules: L.LakehouseRules | None = None) -> DataFrame:
    """Add ticket_kind / priority_tier / component / resolution_hours.

    Input contract: columns ``labels array<string>``, ``created_at``
    and ``closed_at`` timestamps (as produced by
    ``sources.readers.read_jsonl_issues`` or ``synth_issues``).
    """
    rules = rules or L.LakehouseRules()
    kind = L.ticket_kind(F.col("labels"), rules)
    df = df.withColumn("ticket_kind", kind)
    df = df.withColumn(
        "priority_tier", L.priority_tier(F.col("labels"), F.col("ticket_kind"), rules)
    )
    df = df.withColumn("component", L.component(F.col("labels"), rules))
    df = df.withColumn(
        "resolution_hours", L.resolution_hours(F.col("created_at"), F.col("closed_at"))
    )
    return df


def label_catalog(df: DataFrame, descriptions: DataFrame | None = None) -> DataFrame:
    """Label -> (count, description) catalog (reference
    silver.py:150-152, 191-196).

    Distributed explode + groupBy (map-side partial aggregation) in
    place of the reference's driver-side ``Counter``. The reference
    fetches per-label descriptions from the GitHub labels endpoint
    (silver.py:20-38) and maps them onto the catalog
    (silver.py:192-194, missing -> ''); here ``descriptions`` is an
    optional (label, description) DataFrame — e.g. from
    ``sources.readers.read_jsonl_labels`` over an endpoint dump —
    broadcast-joined onto the catalog (the label universe is tiny).
    """
    cat = (
        df.select(F.explode("labels").alias("label"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if descriptions is None:
        return cat.withColumn("description", F.lit(""))
    d = descriptions.select("label", "description")
    return cat.join(F.broadcast(d), on="label", how="left").withColumn(
        "description", F.coalesce("description", F.lit(""))
    )


def merge_keep_latest(df: DataFrame, key: str, order_col: str) -> DataFrame:
    """Cross-run dedup: keep the latest record per key (reference
    README: "Deduplication to avoid duplicates across runs").

    One shuffle on ``key``; at scale this is the standard
    merge-into-silver pattern (row_number over updated_at).
    """
    w = Window.partitionBy(key).orderBy(F.col(order_col).desc_nulls_last())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def synth_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic issues-shaped table synthesized from the driver
    testdata (orders x customer x lineitem) so the DuckDB oracle can
    compute the identical ground truth.

    Mapping (designed to exercise every silver rule branch):
      issue_id   = o_orderkey
      created_at = o_orderdate
      state      = 'closed' iff o_orderstatus = 'F'
      closed_at  = max(l_shipdate) of the order's lineitems (closed only)
      labels     = [ 'Blocker'   if o_orderpriority like '1%'
                     'Regression' if like '2%',
                     'Bug'/'Docs'/'Enhancement'/'Usage Question'
                        by orderkey mod 2/3/5/7 (first match),
                     'component: <c_mktsegment>' unless orderkey%13=0,
                     'Performance' if orderkey%17=0,
                     'Needs Triage' if orderkey%11=0 ]
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")

    last_ship = lineitem.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("last_ship"))

    k = F.col("o_orderkey")
    prio_label = (
        F.when(F.col("o_orderpriority").startswith("1"), F.lit("Blocker"))
        .when(F.col("o_orderpriority").startswith("2"), F.lit("Regression"))
    )
    kind_label = (
        F.when(k % 2 == 0, F.lit("Bug"))
        .when(k % 3 == 0, F.lit("Docs"))
        .when(k % 5 == 0, F.lit("Enhancement"))
        .when(k % 7 == 0, F.lit("Usage Question"))
    )
    comp_label = F.when(k % 13 != 0, F.concat(F.lit("component: "), F.col("c_mktsegment")))
    allow_label = F.when(k % 17 == 0, F.lit("Performance"))
    process_label = F.when(k % 11 == 0, F.lit("Needs Triage"))

    closed_at = F.when(F.col("o_orderstatus") == "F", F.col("last_ship"))
    df = (
        orders.join(customer, orders.o_custkey == customer.c_custkey, "left")
        .join(last_ship, orders.o_orderkey == last_ship.l_orderkey, "left")
        .select(
            F.col("o_orderkey").alias("issue_id"),
            # the reference's silver passthrough columns
            # (reference silver.py:158-171), synthesized so the oracle
            # covers them: number, title, body, updated_at
            F.col("o_orderkey").alias("issue_number"),
            F.concat(
                F.lit("Issue "), k.cast("string"), F.lit(": "), F.col("o_orderpriority")
            ).alias("title"),
            F.concat(
                F.lit("Reported by "), F.coalesce(F.col("c_name"), F.lit("anonymous"))
            ).alias("body"),
            F.when(F.col("o_orderstatus") == "F", F.lit("closed"))
            .otherwise(F.lit("open"))
            .alias("state"),
            F.col("o_orderdate").alias("created_at"),
            F.coalesce(closed_at, F.col("o_orderdate")).alias("updated_at"),
            closed_at.alias("closed_at"),
            F.filter(
                F.array(prio_label, kind_label, comp_label, allow_label, process_label),
                lambda x: x.isNotNull(),
            ).alias("labels"),
        )
    )
    return df


def silver_issues(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full silver table over the synthesized issues."""
    return enrich_issues(synth_issues(spark, sf_dir))


def synth_bronze_jsonl(spark: SparkSession, sf_dir: str, out_path: str) -> int:
    """Write a GitHub-API-shaped bronze JSONL batch synthesized from
    the testdata — the demo/sample input for the CLI pipeline.

    Unlike the raw ``synth_issues`` mapping (whose timestamps come
    from independent TPC-H-ish columns and may be inconsistent), the
    demo payload enforces the real-world invariant a GitHub issue
    always satisfies: ``closed_at >= created_at`` (and ``updated_at``
    likewise) — clamped via ``greatest`` BEFORE serialization, so
    downstream marts never show negative resolution hours. Returns
    rows written. Demo-scale: collects to the driver (sf0.001-sized
    input by design)."""
    import json

    clamped = synth_issues(spark, sf_dir).select(
        "issue_id",
        "issue_number",
        "title",
        "body",
        "state",
        "created_at",
        F.greatest("updated_at", "created_at").alias("updated_at"),
        F.when(
            F.col("closed_at").isNotNull(),
            F.greatest("closed_at", "created_at"),
        ).alias("closed_at"),
        "labels",
    )

    def iso(d):
        return None if d is None else f"{d.strftime('%Y-%m-%d')}T00:00:00Z"

    n = 0
    with open(out_path, "w", encoding="utf-8") as f:
        for r in clamped.toLocalIterator():
            item = {
                "id": r.issue_id,
                "number": r.issue_number,
                "state": r.state,
                "title": r.title,
                "body": r.body,
                "created_at": iso(r.created_at),
                "updated_at": iso(r.updated_at),
                "closed_at": iso(r.closed_at),
                "labels": [{"name": x} for x in (r.labels or [])],
            }
            f.write(json.dumps(item, ensure_ascii=False) + "\n")
            n += 1
    return n
