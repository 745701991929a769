"""Table registry over the driver's parquet layout.

``load_table(spark, sf_dir, name)`` is the single entry point every
operator uses; it keeps scans declarative (plain
``spark.read.parquet``) so Catalyst applies column pruning and
predicate pushdown from the final plan — readers never pre-collect
or cache.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale
# factor (region=5, nation=25 rows always; supplier/part grow ~linear
# but stay << fact tables).
BROADCAST_DIMS = ("region", "nation", "supplier", "part")


def sf_dir_default() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which the Spark
    parquet reader rejects. Read nanos as long (legacy conf, runtime
    settable) and truncate to microseconds — integer `div` so the
    1.7e18-magnitude nanos never round-trip through a double.
    DuckDB's reader truncates ns->us the same way, so both engines
    see identical timestamps.

    ``timestamp_micros`` produces an LTZ timestamp, so the session
    timezone is pinned to UTC here: the events contract (and the
    naive-timestamp oracle) defines ts as UTC wall-clock, and a
    foreign session in another zone would otherwise shift every
    window boundary and date rendering. Runtime-settable, applied on
    the caller's session exactly because the caller's session is the
    one that will evaluate the plan.
    """
    from pyspark.sql import functions as F

    path = f"{sf_dir}/events.parquet"
    try:
        df = spark.read.parquet(path)
    except Exception:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Parquet timestamp without isAdjustedToUTC infers as NTZ on
        # Spark 4. The events contract defines ts as UTC wall-clock,
        # and downstream operators use LTZ-only ops (cast-to-double
        # epoch arithmetic, unix_timestamp, F.window) — so pin UTC and
        # cast NTZ -> LTZ (identical wall-clock under UTC).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
