"""File-format readers.

``read_jsonl_issues`` is the Spark-native bronze layer of the
reference pipeline (reference ``ingest.py:85-126`` writes raw GitHub
issue JSON lines; reference ``silver.py:143-171`` re-parses them in a
Python loop). Here bronze JSONL is read distributed by Spark's JSON
datasource with an explicit schema — at 100 TB of JSONL this is a
parallel scan with column pruning, not a driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Subset of the GitHub issue payload the reference consumes
# (silver.py:158-171): identity, state, title/body, timestamps,
# labels[].name, and the pull_request marker used for exclusion
# (ingest.py:112).
ISSUE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("number", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("body", T.StringType()),
        T.StructField("created_at", T.StringType()),
        T.StructField("updated_at", T.StringType()),
        T.StructField("closed_at", T.StringType()),
        T.StructField(
            "labels",
            T.ArrayType(T.StructType([T.StructField("name", T.StringType())])),
        ),
        T.StructField(
            "pull_request",
            T.StructType([T.StructField("url", T.StringType())]),
        ),
    ]
)


def read_jsonl_issues(
    spark: SparkSession,
    path: str,
    created_from: str | None = None,
    exclude_pull_requests: bool = True,
) -> DataFrame:
    """Bronze JSONL -> typed issues DataFrame.

    Mirrors reference ingest semantics: drop items carrying a
    ``pull_request`` field (ingest.py:112), optional local filter on
    created time (ingest.py:115-119). Timestamps parsed to UTC
    (silver.py:175-176 pd.to_datetime(utc=True)).
    """
    df = spark.read.schema(ISSUE_SCHEMA).json(path)
    if exclude_pull_requests:
        df = df.filter(F.col("pull_request").isNull())
    df = df.select(
        F.col("id").alias("issue_id"),
        F.col("number").alias("issue_number"),
        "state",
        "title",
        "body",
        F.to_timestamp("created_at").alias("created_at"),
        F.to_timestamp("updated_at").alias("updated_at"),
        F.to_timestamp("closed_at").alias("closed_at"),
        F.transform("labels", lambda x: x["name"]).alias("labels"),
    )
    if created_from:
        df = df.filter(F.col("created_at") >= F.to_timestamp(F.lit(created_from)))
    return df


def read_jsonl_labels(spark: SparkSession, path: str) -> DataFrame:
    """Label-descriptions JSONL (a dump of the GitHub labels endpoint
    the reference queries in silver.py:20-38: objects with ``name`` /
    ``description``) -> (label, description) DataFrame for
    ``operators.silver.label_catalog``."""
    schema = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("description", T.StringType()),
        ]
    )
    df = spark.read.schema(schema).json(path)
    return df.filter(F.col("name").isNotNull()).select(
        F.col("name").alias("label"),
        F.coalesce(F.col("description"), F.lit("")).alias("description"),
    )


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
