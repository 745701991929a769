"""Structured Streaming tests (SURVEY.md §5.4): file-source
micro-batches into a memory sink; windowed counts equal their batch
twin; streaming dedup drops in-horizon duplicates."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from github_issues_lakehouse_spark.sources.registry import load_table
from github_issues_lakehouse_spark.streaming import (
    sessionize_stream,
    stream_dedup,
    windowed_event_counts,
)

from .conftest import SF_DIR


@pytest.fixture()
def events_dir(spark):
    """Events written as a plain-timestamp parquet dir usable as a
    file streaming source."""
    d = tempfile.mkdtemp(prefix="stream_events_")
    load_table(spark, SF_DIR, "events").write.mode("overwrite").parquet(d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _run_stream(spark, df, name, timeout=120):
    q = df.writeStream.format("memory").queryName(name).outputMode("append").trigger(
        availableNow=True
    ).start()
    q.awaitTermination(timeout)
    return spark.sql(f"select * from {name}")


def test_windowed_counts_match_batch(spark, events_dir):
    batch = load_table(spark, SF_DIR, "events")
    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_counts(stream, window="1 hour", watermark="10 seconds")
    # complete-history comparison needs append-mode finalized windows;
    # availableNow + watermark finalizes all but the trailing window(s)
    got = _run_stream(spark, agg, "win_counts").collect()
    batch_counts = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(F.col("w.start").alias("window_start"), "event_type", "event_count")
        .collect()
    )
    batch_map = {(r.window_start, r.event_type): r.event_count for r in batch_counts}
    assert len(got) > 0
    for r in got:
        assert batch_map[(r.window_start, r.event_type)] == r.event_count


def test_stream_dedup_drops_duplicates(spark, events_dir):
    schema = load_table(spark, SF_DIR, "events").schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    # duplicate every event by unioning the stream with itself
    doubled = stream.unionByName(stream)
    deduped = stream_dedup(doubled, watermark="1 hour")
    got = _run_stream(spark, deduped, "dedup_stream")
    n_unique = load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    assert got.count() == n_unique


def test_sessionize_stream_emits_sessions(spark, events_dir):
    schema = load_table(spark, SF_DIR, "events").schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    sess = sessionize_stream(stream, gap_minutes=30)
    got = _run_stream(spark, sess, "sessions_stream")
    # availableNow: one batch -> all but each user's final (still-open)
    # session are emitted; batch twin says how many total sessions exist
    from github_issues_lakehouse_spark.operators.relational import sessionize_events

    total = sessionize_events(spark, SF_DIR, gap_minutes=30).count()
    n_users = load_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    emitted = got.count()
    assert emitted == total - n_users, (
        f"expected all-but-open sessions: {total} total, {n_users} open"
    )
