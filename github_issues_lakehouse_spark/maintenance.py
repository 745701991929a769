"""Table-maintenance utilities — the metadata layer a parquet
lakehouse needs once tables outlive single jobs: file-level
data-skipping indexes, small-file compaction planning, and schema
drift detection.

These are deliberately table-format-agnostic (plain parquet dirs):
Delta/Iceberg ship these as table services; this module provides the
same capabilities for the engine's parquet sinks, each as a
distributed computation over file-grain metadata (file counts are
metadata-scale — millions of rows at 100 TB, never corpus-scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def file_skipping_index(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max/null-count index over ``cols`` — the
    data-skipping statistics Delta keeps in its transaction log and
    parquet keeps per row group, lifted to FILE grain so a planner
    can prune whole files before opening any footer.

    One distributed scan grouped by ``input_file_name()``; output is
    one row per (file, column). Rebuild after appends, or merge
    incrementally (stats of new files only — min/max are
    associative).
    """
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"),
        ]
    per_file = df.groupBy(
        F.input_file_name().alias("file")
    ).agg(F.count(F.lit(1)).alias("n_rows"), *aggs)
    entries = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
            F.col(f"_nulls_{c}").alias("null_count"),
        )
        for c in cols
    ]
    return per_file.select(
        "file", "n_rows", F.explode(F.array(*entries)).alias("e")
    ).select(
        "file",
        "n_rows",
        "e.column",
        "e.min_value",
        "e.max_value",
        "e.null_count",
    )


def files_for_predicate(
    index: DataFrame, column: str, lo: str | None = None, hi: str | None = None
) -> DataFrame:
    """Prune with the index: files whose [min, max] range for
    ``column`` intersects [lo, hi] (string-comparable domains: dates,
    zero-padded keys, ISO timestamps). A file is skippable iff its
    max < lo or its min > hi — the standard interval test. Returns
    (file, n_rows) of the files a scan must read."""
    e = index.filter(F.col("column") == column)
    keep = F.lit(True)
    if lo is not None:
        keep = keep & (F.col("max_value") >= lo)
    if hi is not None:
        keep = keep & (F.col("min_value") <= hi)
    return e.filter(keep).select("file", "n_rows")


def compaction_plan(
    spark: SparkSession, path: str, target_mb: int = 128
) -> DataFrame:
    """Small-file compaction plan: greedy first-fit over the table's
    data files in name order, packing consecutive files into groups
    of ~``target_mb``. Output (group, file, size_bytes, group_bytes)
    — the rewrite manifest an OPTIMIZE job executes (read each
    group, write one file). Files already >= target stay alone.

    File listing is driver-side metadata (Hadoop FS — the same
    listing every scan performs); the plan itself is a few thousand
    rows even for very large tables.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    files = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isFile() and name.endswith(".parquet") and not name.startswith("_"):
            files.append((st.getPath().toString(), st.getLen()))
    files.sort()
    target = target_mb * 1024 * 1024
    rows, group, acc = [], 0, 0
    for f, size in files:
        if acc > 0 and acc + size > target:
            group, acc = group + 1, 0
        rows.append((group, f, size))
        acc += size
        if acc >= target:
            group, acc = group + 1, 0
    out = spark.createDataFrame(rows, "group long, file string, size_bytes long")
    totals = out.groupBy("group").agg(F.sum("size_bytes").alias("group_bytes"))
    return out.join(totals, "group").select("group", "file", "size_bytes", "group_bytes")


def schema_drift(spark: SparkSession, path_a: str, path_b: str) -> DataFrame:
    """Schema drift between two table snapshots: added / removed /
    type-changed columns — the check a pipeline runs before merging a
    new ingest batch whose producer may have evolved. Pure metadata
    (two footer reads); output is one row per drifted column."""
    a = {f.name: f.dataType.simpleString() for f in spark.read.parquet(path_a).schema}
    b = {f.name: f.dataType.simpleString() for f in spark.read.parquet(path_b).schema}
    rows = []
    for name in sorted(set(a) | set(b)):
        ta, tb = a.get(name), b.get(name)
        if ta is None:
            rows.append((name, "added", None, tb))
        elif tb is None:
            rows.append((name, "removed", ta, None))
        elif ta != tb:
            rows.append((name, "type_changed", ta, tb))
    return spark.createDataFrame(
        rows, "column string, change string, type_a string, type_b string"
    )


def read_pruned(
    spark: SparkSession,
    path: str,
    index: DataFrame,
    column: str,
    lo: str | None = None,
    hi: str | None = None,
) -> DataFrame:
    """Index-pruned read: open ONLY the files ``files_for_predicate``
    keeps, then apply the exact predicate to the survivors (the index
    prunes at file grain; the residual filter handles rows inside
    kept files outside the range). Semantically identical to reading
    the whole table with the filter — the index just avoids opening
    provably-irrelevant files, which at 100 TB is the difference
    between touching one day's files and listing three years of them.
    """
    kept = [r.file for r in files_for_predicate(index, column, lo, hi).collect()]
    if not kept:
        df = spark.read.parquet(path).limit(0)
    else:
        df = spark.read.parquet(*kept)
    if lo is not None:
        df = df.filter(F.col(column) >= lo)
    if hi is not None:
        df = df.filter(F.col(column) <= hi)
    return df
