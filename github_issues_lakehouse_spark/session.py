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
    spark = builder.getOrCreate()
    _silence_reviewed_window_warnings(spark)
    return spark


def _silence_reviewed_window_warnings(spark: SparkSession) -> None:
    """Raise the WindowExec logger to ERROR (VERDICT r6 task 5).

    Every unpartitioned window in this engine sits on a frame bounded
    by construction (a post-aggregate grain, a top-k survivor set, a
    band/carry summary) and is individually recorded as a
    ``single-partition-window`` entry in
    tests/data/plan_advice_snapshot.json — tests/test_plan_advice_drift
    FAILS on any new or moved site, so the CI-enforced advisor gate,
    not log eyeballing, is the detector for a NOVEL unbounded window
    (it also catches the class this runtime warning misses: a
    partitionless Sort feeding a limit, an Exchange SinglePartition
    under an aggregate). With the gate in place, the per-run WARN spam
    from the ~27 reviewed sites is pure noise a fresh warning could
    hide in — suppressing the logger makes bench/verify logs clean
    while keeping novel-site detection strictly stronger than the log
    ever was. A constant partition key cannot do this structurally:
    ``partitionBy(lit(0))`` is constant-folded back to an empty spec
    before WindowExec sees it (measured).

    Scope (ADVICE r7): the suppression is JVM-wide by necessity
    (log4j config is per-logger, not per-query), so a co-resident
    application sharing this factory's JVM would lose the warning
    too. Opt out with ``SPARK_GRAFT_KEEP_WINDOW_WARNINGS=1`` — ad-hoc
    user sessions that want the runtime warning back keep it; this
    repo's bench/verify entry points (where every site is gated by
    the plan-advice snapshot) leave it unset.
    """
    if os.environ.get("SPARK_GRAFT_KEEP_WINDOW_WARNINGS", "") == "1":
        return
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR,
        )
    except Exception:
        # a foreign JVM without log4j2 (or a connect session) just
        # keeps the warnings — cosmetic, never correctness
        pass
