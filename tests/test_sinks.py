import shutil
import tempfile

import pytest

from github_issues_lakehouse_spark.sinks import merge_upsert, write_partitioned


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="sink_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_write_partitioned_roundtrip(spark, tmpdir):
    df = spark.createDataFrame(
        [(1, "2024-01", 1.0), (2, "2024-02", 2.0)], "id int, month string, v double"
    )
    path = f"{tmpdir}/t"
    write_partitioned(df, path, partition_by=["month"])
    back = spark.read.parquet(path)
    assert back.count() == 2
    assert set(back.columns) == {"id", "month", "v"}


def test_merge_upsert_keeps_latest(spark, tmpdir):
    path = f"{tmpdir}/t"
    b1 = spark.createDataFrame([(1, "old", 1), (2, "keep", 1)], "k int, v string, ver int")
    merge_upsert(spark, b1, path, key="k", order_col="ver")
    b2 = spark.createDataFrame([(1, "new", 2), (3, "add", 1)], "k int, v string, ver int")
    merge_upsert(spark, b2, path, key="k", order_col="ver")
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "new"), (2, "keep"), (3, "add")}
