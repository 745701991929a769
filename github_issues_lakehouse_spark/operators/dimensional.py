"""Dimensional-modeling operators: SCD Type-2 history building.

The reference pipeline keeps only latest-state rows (its silver
merge is keep-latest per key — reference README "Deduplication to
avoid duplicates across runs"); a warehouse additionally needs the
HISTORY of each key's attribute as validity intervals. This operator
builds that standard SCD2 table from an ordered change stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.registry import load_table


def scd2_priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 build: per customer, the history of their order
    priority as [valid_from, valid_to] intervals with an is_current
    flag — consecutive orders with the SAME priority collapse into
    one interval (change-detection via lag), interval ends come from
    the NEXT change (lead), the last interval is open/current.

    Scale shape: both windows share one (o_custkey) partitioning and
    one (date, key) sort — a single shuffle of the orders fact, no
    joins, no state on the driver. This is the standard way to derive
    SCD2 from an event stream declaratively; MERGE-based SCD2 upkeep
    on an existing dimension table is the incremental twin
    (sinks.merge_upsert covers the keep-latest case).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    wseq = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    changed = (
        o.withColumn("prev", F.lag("o_orderpriority").over(wseq))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
        .drop("prev")
    )
    # second window runs on the change rows only; same partitioning
    # and ordering, so no new exchange — just the post-filter sort
    wchg = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    nxt = F.lead("o_orderdate").over(wchg)
    # dates rendered as explicit strings on BOTH engines — engine-native
    # date-to-string paths diverged at the driver's hasher in r1
    return changed.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(F.date_sub(nxt, 1), "yyyy-MM-dd").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )
