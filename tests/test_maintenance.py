"""Table-maintenance layer: file-skipping index prunes correctly,
compaction plan packs to target, schema drift detects evolution."""

from pyspark.sql import functions as F

from github_issues_lakehouse_spark.maintenance import (
    compaction_plan,
    file_skipping_index,
    files_for_predicate,
    schema_drift,
)
from github_issues_lakehouse_spark.sources.registry import load_table

from .conftest import SF_DIR


def test_file_skipping_index_prunes_disjoint_ranges(spark, tmp_path):
    """Orders written sorted into 4 files => date ranges are mostly
    disjoint; a narrow predicate must skip most files and the kept
    files must contain ALL matching rows."""
    path = str(tmp_path / "orders_sorted")
    o = load_table(spark, SF_DIR, "orders")
    o.repartitionByRange(4, "o_orderdate").sortWithinPartitions(
        "o_orderdate"
    ).write.parquet(path)

    idx = file_skipping_index(spark, path, ["o_orderdate", "o_totalprice"])
    assert idx.filter(F.col("column") == "o_orderdate").count() == 4

    lo, hi = "1995-06-01", "1995-08-31"
    kept = files_for_predicate(
        idx, "o_orderdate", lo, hi
    ).collect()
    assert 1 <= len(kept) < 4  # pruning actually happened
    # correctness: rows in kept files == all matching rows
    kept_files = {r.file for r in kept}
    matching = (
        spark.read.parquet(path)
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi))
    )
    n_match = matching.count()
    in_kept = (
        spark.read.parquet(path)
        .withColumn("f", F.input_file_name())
        .filter(F.col("f").isin(list(kept_files)))
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi))
        .count()
    )
    assert n_match == in_kept > 0


def test_compaction_plan_packs_to_target(spark, tmp_path):
    path = str(tmp_path / "small_files")
    load_table(spark, SF_DIR, "orders").repartition(16).write.parquet(path)
    plan = compaction_plan(spark, path, target_mb=1).collect()
    assert len(plan) == 16  # every data file is in the plan exactly once
    groups = {}
    for r in plan:
        groups.setdefault(r.group, []).append(r)
    # each group's total respects ~target (1 MB) unless it is a single file
    for g, rows in groups.items():
        total = sum(r.size_bytes for r in rows)
        assert total == rows[0].group_bytes
        if len(rows) > 1:
            assert total <= 2 * 1024 * 1024
    # small files got packed: fewer groups than files
    assert len(groups) < 16


def test_schema_drift_detects_changes(spark, tmp_path):
    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    spark.createDataFrame(
        [(1, "x", 1.0)], "id long, name string, score double"
    ).write.parquet(a)
    spark.createDataFrame(
        [(1, 2, "new")], "id long, score int, extra string"
    ).write.parquet(b)
    drift = {r.column: r for r in schema_drift(spark, a, b).collect()}
    assert drift["name"].change == "removed"
    assert drift["extra"].change == "added"
    assert drift["score"].change == "type_changed"
    assert (drift["score"].type_a, drift["score"].type_b) == ("double", "int")
    assert "id" not in drift


def test_read_pruned_equals_full_filter(spark, tmp_path):
    path = str(tmp_path / "orders_rp")
    load_table(spark, SF_DIR, "orders").repartitionByRange(
        4, "o_orderdate"
    ).sortWithinPartitions("o_orderdate").write.parquet(path)
    from github_issues_lakehouse_spark.maintenance import read_pruned

    idx = file_skipping_index(spark, path, ["o_orderdate"])
    lo, hi = "1996-01-01", "1996-12-31"
    pruned = read_pruned(spark, path, idx, "o_orderdate", lo, hi)
    full = spark.read.parquet(path).filter(
        (F.col("o_orderdate") >= lo) & (F.col("o_orderdate") <= hi)
    )
    assert pruned.count() == full.count() > 0
    assert pruned.select("o_orderkey").exceptAll(full.select("o_orderkey")).count() == 0
    # empty range: no files kept, schema preserved
    none = read_pruned(spark, path, idx, "o_orderdate", "2099-01-01", "2099-12-31")
    assert none.count() == 0 and "o_orderkey" in none.columns
