"""SparkSession factory tuned for this engine.

Local testing runs ``local[N]`` single-JVM; the same configs are the
ones that matter on a real cluster (AQE, shuffle sizing, Arrow). At
cluster scale only ``spark.sql.shuffle.partitions`` (set ~2-3x total
cores) and executor memory sizing change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "github-issues-lakehouse-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a tuned SparkSession.

    Tuning rationale (holds at cluster scale):
    - AQE on: runtime coalescing of small shuffle partitions and
      skew-join splitting; at 100 TB, skewed keys (hot users, hot
      components) are split automatically.
    - Arrow on: every pandas interchange (streaming state ops,
      multimodal decode) is Arrow-batched, never row-at-a-time.
    - UTC session timezone: deterministic timestamp arithmetic that
      matches the DuckDB oracle.
    - broadcast threshold 64MB: our dims (region/nation/supplier/
      part) stay broadcast even at sf100; facts never broadcast.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(32, cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # InferFiltersFromGenerate turns every explode(expensive_array_expr)
        # into a `size(expensive_array_expr) > 0` filter that predicate
        # pushdown then sinks below the repartition exchange — so the whole
        # (interpreted, non-codegen) array pipeline re-runs per row on the
        # narrow pre-shuffle scan task. explode already emits nothing for
        # empty arrays; the inferred filter is redundant and, for the
        # shingle/minhash/banding operators, 4-5x the query's entire cost.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # no [Stage N:>...] \r spam: it shares the driver's small
        # output-tail capture budget with bench.py's one JSON line
        .config("spark.ui.showConsoleProgress", "false")
    )
    return builder.getOrCreate()
