"""Structured Streaming tests (SURVEY.md §5.4): file-source
micro-batches into a memory sink; windowed counts equal their batch
twin; streaming dedup drops in-horizon duplicates."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from github_issues_lakehouse_spark.sources.registry import load_table
from github_issues_lakehouse_spark.streaming import (
    enrich_stream_with_dim,
    purchase_error_stream_join,
    session_window_agg,
    sessionize_stream,
    stream_dedup,
    stream_merge_to_parquet,
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


def test_session_window_agg_matches_batch(spark, events_dir):
    """D8: native session_window streaming aggregation — finalized
    sessions equal the identical batch session_window aggregation."""
    batch = load_table(spark, SF_DIR, "events")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    got = _run_stream(
        spark, session_window_agg(stream, gap="30 minutes", watermark="10 seconds"),
        "native_sessions",
    ).collect()
    batch_sessions = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
        .collect()
    )
    batch_map = {(r.user_id, r.session_start): r.n_events for r in batch_sessions}
    assert len(got) > 0
    for r in got:
        assert batch_map[(r.user_id, r.session_start)] == r.n_events


def test_stream_dedup_drops_duplicates(spark, events_dir):
    schema = load_table(spark, SF_DIR, "events").schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    # duplicate every event by unioning the stream with itself
    doubled = stream.unionByName(stream)
    deduped = stream_dedup(doubled, watermark="1 hour")
    got = _run_stream(spark, deduped, "dedup_stream")
    n_unique = load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
    assert got.count() == n_unique


def test_stream_static_dim_enrichment(spark, events_dir):
    """Stream-static broadcast join matches its batch twin."""
    schema = load_table(spark, SF_DIR, "events").schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    dim = load_table(spark, SF_DIR, "customer")
    got = _run_stream(spark, enrich_stream_with_dim(stream, dim), "enriched")
    batch = enrich_stream_with_dim(load_table(spark, SF_DIR, "events"), dim)
    assert got.count() == batch.count()
    g = {(r.event_id, r.c_mktsegment) for r in got.collect()}
    b = {(r.event_id, r.c_mktsegment) for r in batch.collect()}
    assert g == b


def test_stream_stream_interval_join_matches_batch(spark, events_dir):
    """Stream-stream inner interval join equals its batch twin."""
    schema = load_table(spark, SF_DIR, "events").schema
    stream = spark.readStream.schema(schema).parquet(events_dir)
    got = _run_stream(spark, purchase_error_stream_join(stream), "ss_join")
    batch = purchase_error_stream_join(load_table(spark, SF_DIR, "events"))
    assert got.count() == batch.count()
    g = {(r.p_event_id, r.e_event_id) for r in got.collect()}
    b = {(r.p_event_id, r.e_event_id) for r in batch.collect()}
    assert g == b


def test_stream_merge_to_parquet_keeps_latest(spark, events_dir):
    """foreachBatch merge-upsert lands a keyed table with unique
    event_ids (the streaming->silver bridge)."""
    d = tempfile.mkdtemp(prefix="stream_merge_")
    try:
        schema = load_table(spark, SF_DIR, "events").schema
        stream = spark.readStream.schema(schema).parquet(events_dir)
        doubled = stream.unionByName(stream)  # duplicate delivery
        q = stream_merge_to_parquet(doubled, f"{d}/tbl", f"{d}/ckpt")
        q.awaitTermination(120)
        out = spark.read.parquet(f"{d}/tbl")
        n_unique = load_table(spark, SF_DIR, "events").select("event_id").distinct().count()
        assert out.count() == n_unique
        assert out.select("event_id").distinct().count() == n_unique
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_watermark_drops_late_rows(spark):
    """A row arriving after its window's state was finalized+evicted
    (window.end < watermark at a prior batch boundary) is dropped: the
    window is emitted exactly once, without the late row.

    Note the guarantee's shape: eviction in batch N uses the watermark
    computed from batch N-1's data, so the late row must arrive two
    batches after the event that advanced the watermark — a late row
    in the very next batch may still merge into the un-evicted state
    (allowed by Spark's "may aggregate late data" semantics).
    """
    import time as _time

    d = tempfile.mkdtemp(prefix="late_events_")
    sch = "event_id long, ts string, user_id long, event_type string, value double"
    try:
        batches = [
            # b1 advances max event time to 13:00 -> wm 12:50 next batch
            [(1, "2024-01-01 10:05:00", 1, "click", 1.0),
             (2, "2024-01-01 13:00:00", 1, "click", 1.0)],
            # b2: end of this batch evicts+emits the 10:00 window (count 1)
            [(3, "2024-01-01 13:05:00", 1, "click", 1.0)],
            # b3: ~3h late vs a 10-minute watermark -> must be dropped
            [(4, "2024-01-01 10:10:00", 1, "click", 1.0)],
        ]
        for i, rows in enumerate(batches, 1):
            pdf = spark.createDataFrame(rows, sch).withColumn("ts", F.to_timestamp("ts"))
            pdf.coalesce(1).write.mode("overwrite").parquet(f"{d}/b{i}")
            _time.sleep(1.1)  # distinct mtimes => deterministic batch order
        stream = (
            spark.readStream.schema(
                spark.read.parquet(f"{d}/b1").schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{d}/b*/*.parquet")
        )
        agg = windowed_event_counts(stream, window="1 hour", watermark="10 minutes")
        got = _run_stream(spark, agg, "late_win").collect()
        win10 = [r for r in got if r.window_start.hour == 10]
        assert len(win10) == 1, f"window must be emitted exactly once: {got}"
        assert win10[0].event_count == 1, "late row must not re-open the window"
    finally:
        shutil.rmtree(d, ignore_errors=True)


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


def test_transform_with_state_running_totals(spark, events_dir):
    """D9: transformWithStateInPandas running totals — the final
    update per user equals the batch groupBy totals.

    transformWithState's worker protocol needs the google.protobuf
    wheel (pyspark[sql] extra); skip where it isn't installed — the
    container this repo is built in lacks it, so the operator is
    environment-gated the same way as Delta (see tws_available).
    """
    from github_issues_lakehouse_spark.streaming import (
        running_user_totals_stream,
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf not installed; transformWithState unavailable")

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        batch = load_table(spark, SF_DIR, "events")
        stream = spark.readStream.schema(batch.schema).parquet(events_dir)
        out = running_user_totals_stream(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_totals")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql(
            "select user_id, max_by(n_events, n_events) as n_events,"
            " max_by(total_value, n_events) as total_value"
            " from tws_totals group by user_id"
        ).collect()
        expect = {
            r.user_id: (r.n, float(r.total))
            for r in batch.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        assert len(got) == len(expect)
        for r in got:
            n, total = expect[r.user_id]
            assert r.n_events == n
            assert abs(r.total_value - total) < 1e-6
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_sliding_window_counts_match_batch(spark, events_dir):
    """D10: sliding (overlapping) windows — each event lands in
    window_size/slide windows; finalized streaming counts equal the
    batch twin."""
    batch = load_table(spark, SF_DIR, "events")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(F.col("w.start").alias("window_start"), "event_type", "event_count")
    )
    got = _run_stream(spark, agg, "slide_counts").collect()
    batch_counts = (
        batch.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(F.col("w.start").alias("window_start"), "event_type", "event_count")
        .collect()
    )
    batch_map = {(r.window_start, r.event_type): r.event_count for r in batch_counts}
    assert len(got) > 0
    for r in got:
        assert batch_map[(r.window_start, r.event_type)] == r.event_count


def test_quality_gate_stream_matches_batch(spark):
    """D11: stateless streaming quality gate — kept set equals the
    batch filter."""
    import shutil
    import tempfile

    from github_issues_lakehouse_spark.streaming import quality_gate_stream

    d = tempfile.mkdtemp(prefix="stream_docs_")
    try:
        batch = load_table(spark, SF_DIR, "documents")
        batch.write.mode("overwrite").parquet(d)
        stream = spark.readStream.schema(batch.schema).parquet(d)
        got = _run_stream(spark, quality_gate_stream(stream), "q_gate").collect()
        expect = {r.doc_id for r in quality_gate_stream(batch).collect()}
        assert {r.doc_id for r in got} == expect
        assert 0 < len(expect) < batch.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_stream_mart_maintenance_equals_batch(spark, events_dir, tmp_path):
    """D12: after draining the stream, the incrementally-maintained
    daily mart on disk equals the batch mart over all events."""
    from github_issues_lakehouse_spark.operators.gold import daily_event_mart
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_mart_maintenance,
    )

    batch = load_table(spark, SF_DIR, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    mart_path = str(tmp_path / "daily_mart.parquet")
    q = stream_mart_maintenance(stream, mart_path, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    got = {
        (r.day, r.event_type): (r.n_events, float(r.total_value))
        for r in read_mart(spark, mart_path).collect()
    }
    expect = {
        (r.day, r.event_type): (r.n_events, float(r.total_value))
        for r in daily_event_mart(batch).collect()
    }
    assert got == expect


def test_mart_fold_replay_and_crash_recovery(spark, tmp_path):
    """foreachBatch is at-least-once: a replayed batch_id must be a
    no-op, and a crash mid-write must leave the last committed version
    readable. Exercises mart_fold_batch directly."""
    import json
    import os

    from github_issues_lakehouse_spark.operators.gold import daily_event_mart
    from github_issues_lakehouse_spark.streaming import mart_fold_batch, read_mart

    events = load_table(spark, SF_DIR, "events")
    b0 = events.filter(F.col("user_id") % 2 == 0)
    b1 = events.filter(F.col("user_id") % 2 == 1)
    path = str(tmp_path / "mart")

    def snapshot():
        return {
            (r.day, r.event_type): (r.n_events, float(r.total_value))
            for r in read_mart(spark, path).collect()
        }

    assert mart_fold_batch(b0, 0, path) is True
    after_b0 = snapshot()

    # replay of batch 0 (post-crash re-delivery): skipped, mart unchanged
    assert mart_fold_batch(b0, 0, path) is False
    assert snapshot() == after_b0

    # crash mid-write: a partial uncommitted version dir must be ignored
    # by readers and harmlessly overwritten when the batch is replayed
    junk = os.path.join(path, "v_1")
    os.makedirs(junk, exist_ok=True)
    with open(os.path.join(junk, "part-junk.parquet"), "w") as f:
        f.write("not parquet")
    assert snapshot() == after_b0
    assert json.load(open(os.path.join(path, "_CURRENT")))["batch_id"] == 0

    assert mart_fold_batch(b1, 1, path) is True
    expect = {
        (r.day, r.event_type): (r.n_events, float(r.total_value))
        for r in daily_event_mart(events).collect()
    }
    assert snapshot() == expect
    # superseded versions are GC'd; only the committed version remains
    vdirs = [d for d in os.listdir(path) if d.startswith("v_")]
    assert vdirs == ["v_1"]


def test_stream_sketch_maintenance_equals_batch(spark, tmp_path):
    """D13/D14: after draining a document stream, the committed CMS
    cell table and KMV state equal their batch twins over the whole
    corpus — mergeable-sketch folds under the exactly-once commit
    protocol."""
    from github_issues_lakehouse_spark.operators.sketches import cms_cells, kmv_state
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_cms_maintenance,
        stream_kmv_maintenance,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)

    def docs_stream():
        return (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    cms_path = str(tmp_path / "cms_state")
    q1 = stream_cms_maintenance(docs_stream(), cms_path, str(tmp_path / "ck1"), width=64)
    q1.awaitTermination(180)
    got_cms = {
        (r.row, r.b): r.cell_count for r in read_mart(spark, cms_path).collect()
    }
    want_cms = {
        (r.row, r.b): r.cell_count for r in cms_cells(docs, width=64).collect()
    }
    assert got_cms == want_cms

    kmv_path = str(tmp_path / "kmv_state")
    q2 = stream_kmv_maintenance(docs_stream(), kmv_path, str(tmp_path / "ck2"), k=16)
    q2.awaitTermination(180)
    got_kmv = {
        (r.source, r.term) for r in read_mart(spark, kmv_path).collect()
    }
    want_kmv = {(r.source, r.term) for r in kmv_state(docs, k=16).collect()}
    assert got_kmv == want_kmv


def test_mart_fold_any_replay_pattern_converges(spark, tmp_path):
    """Exactly-once property: ANY delivery sequence that is a
    supersequence of the batch ids in order (arbitrary replays of
    already-applied ids interleaved anywhere) produces the identical
    committed mart. Covers the at-least-once space foreachBatch can
    generate, beyond the single-replay case."""
    from github_issues_lakehouse_spark.operators.gold import daily_event_mart
    from github_issues_lakehouse_spark.streaming import mart_fold_batch, read_mart

    events = load_table(spark, SF_DIR, "events")
    batches = [events.filter(F.col("event_id") % 3 == k) for k in range(3)]

    def run(pattern, path):
        for bid in pattern:
            mart_fold_batch(batches[bid], bid, path)
        return {
            (r.day, r.event_type): (r.n_events, float(r.total_value))
            for r in read_mart(spark, path).collect()
        }

    want = {
        (r.day, r.event_type): (r.n_events, float(r.total_value))
        for r in daily_event_mart(events).collect()
    }
    patterns = [
        [0, 1, 2],                     # clean
        [0, 0, 1, 1, 2, 2],            # every batch replayed once
        [0, 1, 0, 2, 1, 0],            # stale replays interleaved late
        [0, 1, 2, 0, 1, 2, 2],         # full redelivery after completion
    ]
    for i, pat in enumerate(patterns):
        got = run(pat, str(tmp_path / f"mart{i}"))
        assert got == want, pat


def test_streaming_mart_feeds_anomaly_readout(spark, events_dir, tmp_path):
    """D15 composition: the incrementally maintained daily mart is
    exactly the grain the anomaly readout consumes — alarm over the
    committed mart equals the batch daily_anomaly_events over all
    events, with zero event rescans."""
    from github_issues_lakehouse_spark.operators.relational6 import (
        daily_anomaly_events,
        daily_anomaly_from_counts,
    )
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_mart_maintenance,
    )

    batch = load_table(spark, SF_DIR, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    mart_path = str(tmp_path / "daily")
    q = stream_mart_maintenance(stream, mart_path, str(tmp_path / "ck"))
    q.awaitTermination(180)

    mart = read_mart(spark, mart_path).select("event_type", "day", "n_events")
    got = {
        (r.event_type, r.day): (r.z_score, r.is_anomaly)
        for r in daily_anomaly_from_counts(mart).collect()
    }
    want = {
        (r.event_type, r.day): (r.z_score, r.is_anomaly)
        for r in daily_anomaly_events(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 100


def test_stream_ewma_matches_batch(spark, events_dir):
    """D16: drained streaming EWMA equals the batch trailing-EWMA
    with a frame wider than any user's history (the unbounded
    recursion both reduce to)."""
    from github_issues_lakehouse_spark.operators.relational7 import ewma_user_value
    from github_issues_lakehouse_spark.streaming import stream_ewma

    batch = load_table(spark, SF_DIR, "events")
    stream = spark.readStream.schema(batch.schema).parquet(events_dir)
    got = _run_stream(spark, stream_ewma(stream), "ewma_stream").collect()
    # k wider than the longest per-user history -> exact recursion
    expect = ewma_user_value(spark, SF_DIR, k=100_000).collect()
    exp_map = {r.event_id: r for r in expect}
    assert len(got) == len(expect) > 0
    for r in got:
        e = exp_map[r.event_id]
        assert abs(round(r.ewma, 6) - e.ewma_100000) < 1e-9, r.event_id
        assert r.user_id == e.user_id


def test_stream_stats_maintenance_equals_batch(spark, events_dir, tmp_path):
    """D17: after draining, the incrementally-folded column-stats
    mart equals batch_column_stats over all events (count/null adds
    and min/max merges are exactly mergeable)."""
    from github_issues_lakehouse_spark.streaming import (
        batch_column_stats,
        read_mart,
        stream_stats_maintenance,
    )

    batch = load_table(spark, SF_DIR, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = stream_stats_maintenance(
        stream, str(tmp_path / "stats_mart"), str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)
    got = {r.column_name: r for r in read_mart(spark, str(tmp_path / "stats_mart")).collect()}
    want = {r.column_name: r for r in batch_column_stats(batch).collect()}
    assert set(got) == set(want)
    for c, w in want.items():
        g = got[c]
        assert (g.n_rows, g.n_nulls) == (w.n_rows, w.n_nulls), c
        assert g.min_num == w.min_num and g.max_num == w.max_num, c


def test_stream_sla_maintenance_equals_batch(spark, tmp_path):
    """D18: after draining, sla_finalize over the incrementally
    maintained additive core equals the batch SLA mart over all
    issues — including the order-sensitive backlog window and the
    derived ppm indices, which are computed by the reader, never
    stored."""
    from github_issues_lakehouse_spark.operators.gold import (
        sla_finalize,
        sla_stability_mart,
    )
    from github_issues_lakehouse_spark.operators.silver import silver_issues
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_sla_maintenance,
    )

    issues = silver_issues(spark, SF_DIR).select(
        "issue_id", "priority_tier", "component", "created_at", "closed_at"
    )
    src = str(tmp_path / "issues_src")
    # several files -> several micro-batches; each issue in exactly one
    issues.repartition(5).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    mart_path = str(tmp_path / "sla_core.parquet")
    q = stream_sla_maintenance(stream, mart_path, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    key = lambda r: (r.month, r.component)  # noqa: E731
    got = {key(r): r for r in sla_finalize(read_mart(spark, mart_path)).collect()}
    expect = {key(r): r for r in sla_stability_mart(issues).collect()}
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], (k, got[k], expect[k])


def test_stream_sla_keyed_tolerates_redelivery(spark, tmp_path):
    """D20 (ADVICE r4): an issue delivered while OPEN and redelivered
    after closing must not double-count. The keyed maintainer's
    drained mart equals the batch mart over FINAL issue states even
    when every closed issue was first delivered open — the exact feed
    that silently corrupts the additive D18 core (asserted too, so
    the difference stays documented by a test)."""
    from github_issues_lakehouse_spark.operators.gold import (
        sla_core,
        sla_finalize,
        sla_stability_mart,
    )
    from github_issues_lakehouse_spark.operators.silver import silver_issues
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_sla_keyed_maintenance,
        stream_sla_maintenance,
    )

    issues = silver_issues(spark, SF_DIR).select(
        "issue_id", "priority_tier", "component", "created_at", "closed_at"
    )
    src = str(tmp_path / "issues_src")
    # delivery 1: every issue in its OPEN state (closed_at nulled);
    # delivery 2: final states. One file each -> two micro-batches.
    issues.withColumn("closed_at", F.lit(None).cast(issues.schema["closed_at"].dataType)) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    issues.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    keyed_path = str(tmp_path / "sla_keyed.parquet")
    q = stream_sla_keyed_maintenance(stream, keyed_path, str(tmp_path / "ckpt_k"))
    q.awaitTermination(180)

    key = lambda r: (r.month, r.component)  # noqa: E731
    got = {
        key(r): r
        for r in sla_finalize(sla_core(read_mart(spark, keyed_path))).collect()
    }
    expect = {key(r): r for r in sla_stability_mart(issues).collect()}
    assert set(got) == set(expect)
    for k in expect:
        assert got[k] == expect[k], (k, got[k], expect[k])

    # the additive D18 maintainer double-counts the same feed —
    # created_critical sums both deliveries (documented failure mode)
    stream2 = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    add_path = str(tmp_path / "sla_additive.parquet")
    q2 = stream_sla_maintenance(stream2, add_path, str(tmp_path / "ckpt_a"))
    q2.awaitTermination(180)
    add_created = sum(
        r.created_critical for r in read_mart(spark, add_path).collect()
    )
    want_created = sum(r.created_critical for r in expect.values())
    assert add_created == 2 * want_created


def test_stream_block_index_equals_batch_any_order(spark, tmp_path):
    """D19: the drained streaming block-dedup index equals the batch
    index over all documents — including the first-occurrence
    (doc_id, pos) winners, which must be arrival-order-independent
    because the merge is a struct MIN."""
    from github_issues_lakehouse_spark.operators.dedup import block_first_index
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_block_index_maintenance,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    # reverse-ish file split: high doc_ids land in earlier files, so a
    # later batch must WIN first-occurrence for low ids via the min-merge
    docs.withColumn("_b", F.pmod(-F.col("doc_id"), F.lit(4))).repartition(
        4, "_b"
    ).drop("_b").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    mart_path = str(tmp_path / "block_index.parquet")
    q = stream_block_index_maintenance(stream, mart_path, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {
        r.h: (r.first_doc_id, r.first_pos, r.n_occurrences)
        for r in read_mart(spark, mart_path).collect()
    }
    expect = {
        r.h: (r.first_doc_id, r.first_pos, r.n_occurrences)
        for r in block_first_index(docs).collect()
    }
    assert got == expect


def test_stream_topk_terms_exact_when_vocab_fits(spark, tmp_path):
    """D21: with m larger than any per-source vocabulary the floor
    stays 0 and the drained summary is EXACTLY the batch term
    counts, regardless of batch boundaries."""
    from github_issues_lakehouse_spark.operators.sketches import source_term_counts
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_topk_terms_maintenance,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    docs.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    path = str(tmp_path / "hh.parquet")
    q = stream_topk_terms_maintenance(stream, path, str(tmp_path / "ck"), m=100_000)
    q.awaitTermination(180)

    got = {(r.source, r.term): r for r in read_mart(spark, path).collect()}
    want = {(r.source, r.term): r.cnt for r in source_term_counts(docs).collect()}
    assert set(got) == set(want)
    assert all(r.floor_cnt == 0 for r in got.values())
    for k, cnt in want.items():
        assert got[k].cnt == cnt, k


def test_stream_topk_terms_spacesaving_bounds(spark, tmp_path):
    """D21 under pressure: a tiny m forces evictions across batches;
    the mergeable-summaries guarantee must hold for every retained
    term — true <= cnt <= true + floor_cnt — and the floor must be
    positive (something was dropped)."""
    from github_issues_lakehouse_spark.operators.sketches import source_term_counts
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_topk_terms_maintenance,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    docs.repartition(5).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    path = str(tmp_path / "hh.parquet")
    q = stream_topk_terms_maintenance(stream, path, str(tmp_path / "ck"), m=20)
    q.awaitTermination(180)

    state = read_mart(spark, path).collect()
    truth = {(r.source, r.term): r.cnt for r in source_term_counts(docs).collect()}
    assert state
    by_src = {}
    for r in state:
        by_src.setdefault(r.source, []).append(r)
    assert any(r.floor_cnt > 0 for r in state)
    for source, rows in by_src.items():
        assert len(rows) <= 20
        for r in rows:
            true = truth.get((source, r.term), 0)
            assert true <= r.cnt <= true + r.floor_cnt, (source, r.term)


def test_stream_hll_registers_idempotent_under_redelivery(spark, tmp_path):
    """D22: the drained streaming HLL state equals the batch register
    table even when the SAME documents arrive twice (two identical
    files -> two micro-batches folding identical deltas): register
    max is idempotent, so redelivery cannot move the sketch."""
    from github_issues_lakehouse_spark.operators.sketches import hll_registers
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_hll_maintenance,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    # duplicate the corpus file: the stream delivers everything TWICE
    import glob
    import shutil

    f = glob.glob(f"{src}/part-*.parquet")[0]
    shutil.copy(f, f.replace("part-", "copy-"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    path = str(tmp_path / "hll.parquet")
    q = stream_hll_maintenance(stream, path, str(tmp_path / "ck"))
    q.awaitTermination(180)

    got = sorted(map(tuple, read_mart(spark, path).collect()))
    want = sorted(map(tuple, hll_registers(docs).collect()))
    assert got == want


def test_stream_quantile_sketch_equals_batch_and_finalizes(spark, tmp_path):
    """D23: drained bin counts equal the batch histogram regardless
    of batch boundaries, and the finalize over the DRAINED state
    returns the same per-quantile bins as over the batch state."""
    from github_issues_lakehouse_spark.operators.sketches import (
        price_bin_counts,
        quantile_bins_finalize,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_quantile_sketch_maintenance,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    src = str(tmp_path / "li_src")
    li.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    path = str(tmp_path / "qsk.parquet")
    q = stream_quantile_sketch_maintenance(stream, path, str(tmp_path / "ck"))
    q.awaitTermination(180)

    drained = read_mart(spark, path)
    got = sorted(map(tuple, drained.collect()))
    want = sorted(map(tuple, price_bin_counts(li).collect()))
    assert got == want
    fin_stream = sorted(map(tuple, quantile_bins_finalize(drained).collect()))
    fin_batch = sorted(map(tuple, quantile_bins_finalize(price_bin_counts(li)).collect()))
    assert fin_stream == fin_batch


def test_stream_lsh_postings_idempotent_and_order_free(spark, tmp_path):
    """D24: the drained LSH postings index equals the batch banding
    over all documents even with the corpus delivered twice across
    out-of-order batches — a posting row is idempotent state under
    union+dedup."""
    from github_issues_lakehouse_spark.operators.dedup import lsh_postings
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_lsh_postings_maintenance,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    docs.withColumn("_b", F.pmod(-F.col("doc_id"), F.lit(3))).repartition(
        3, "_b"
    ).drop("_b").write.mode("overwrite").parquet(src)
    import glob
    import shutil

    f = sorted(glob.glob(f"{src}/part-*.parquet"))[0]
    shutil.copy(f, f.replace("part-", "copy-"))  # redeliver one batch
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    path = str(tmp_path / "lshidx.parquet")
    q = stream_lsh_postings_maintenance(stream, path, str(tmp_path / "ck"))
    q.awaitTermination(240)

    got = sorted(map(tuple, read_mart(spark, path).collect()))
    want = sorted(map(tuple, lsh_postings(docs).collect()))
    assert got == want


def test_stream_benford_and_vocab_first_seen_equal_batch(spark, tmp_path):
    """D25/D26: after draining, the committed Benford digit counts
    equal the batch digit histogram, and the first-seen vocabulary
    state reproduces vocab_growth_curve's new-term counts — the
    additive and min-fold mergeable-mart properties."""
    from github_issues_lakehouse_spark.operators.statistics import benford_first_digit
    from github_issues_lakehouse_spark.operators.text6 import vocab_growth_curve
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_benford_maintenance,
        stream_vocab_first_seen_maintenance,
    )

    orders = load_table(spark, SF_DIR, "orders")
    src_o = str(tmp_path / "orders_stream")
    orders.repartition(4).write.parquet(src_o)
    q1 = stream_benford_maintenance(
        spark.readStream.schema(orders.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_o),
        str(tmp_path / "benford_state"),
        str(tmp_path / "ck_b"),
    )
    q1.awaitTermination(180)
    got = {
        r.digit: r.n for r in read_mart(spark, str(tmp_path / "benford_state")).collect()
    }
    want = {
        r.digit: r.n_orders
        for r in benford_first_digit(spark, SF_DIR).collect()
        if r.n_orders > 0
    }
    assert got == want

    docs = load_table(spark, SF_DIR, "documents")
    src_d = str(tmp_path / "docs_stream2")
    docs.repartition(4).write.parquet(src_d)
    q2 = stream_vocab_first_seen_maintenance(
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_d),
        str(tmp_path / "vocab_state"),
        str(tmp_path / "ck_v"),
    )
    q2.awaitTermination(180)
    state = read_mart(spark, str(tmp_path / "vocab_state"))
    per_bucket = {
        r.bucket: r.n
        for r in state.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want_curve = {
        r.bucket: r.n_new_terms
        for r in vocab_growth_curve(spark, SF_DIR).collect()
        if r.n_new_terms > 0
    }
    assert per_bucket == want_curve


def test_stream_user_span_equals_batch_and_survives_redelivery(spark, tmp_path):
    """D27: drained per-user spans equal the batch min/max aggregate,
    and refolding the ENTIRE corpus a second time (worst-case
    redelivery) leaves the state bit-identical — min/max idempotence."""
    from github_issues_lakehouse_spark.streaming import (
        mart_fold_batch,
        read_mart,
        stream_user_span_maintenance,
    )

    events = load_table(spark, SF_DIR, "events")
    src = str(tmp_path / "events_stream_span")
    events.repartition(3).write.parquet(src)
    path = str(tmp_path / "span_state")
    q = stream_user_span_maintenance(
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        path,
        str(tmp_path / "ck_span"),
    )
    q.awaitTermination(180)
    got = {(r.user_id, r.d0, r.d1) for r in read_mart(spark, path).collect()}
    want = {
        (r.user_id, r.d0, r.d1)
        for r in events.groupBy("user_id")
        .agg(F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1"))
        .collect()
    }
    assert got == want
    # full redelivery: fold the whole corpus again as a later batch id
    def merge(existing, batch_df):
        delta = batch_df.groupBy("user_id").agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("user_id")
            .agg(F.min("d0").alias("d0"), F.max("d1").alias("d1"))
        )

    mart_fold_batch(events, 10_000, path, merge=merge)
    again = {(r.user_id, r.d0, r.d1) for r in read_mart(spark, path).collect()}
    assert again == want


def test_stream_transitions_equal_batch_and_replay_safe(spark, tmp_path):
    """D28: folding three TIME-ORDERED event slices through
    transition_merge reproduces the batch event_transitions mart
    exactly (boundary transitions included — proven by comparing
    against the intra-slice-only sum, which must undercount), and a
    replayed batch_id is skipped by the commit protocol."""
    from github_issues_lakehouse_spark.operators.relational3 import event_transitions
    from github_issues_lakehouse_spark.streaming import (
        mart_fold_batch,
        read_mart,
        transition_finalize,
        transition_merge,
    )

    events = load_table(spark, SF_DIR, "events")
    # three contiguous time slices (per-user in-order arrival contract)
    lo, hi = events.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    t1, t2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    us = F.unix_micros("ts")
    slices = [
        events.filter(us <= t1),
        events.filter((us > t1) & (us <= t2)),
        events.filter(us > t2),
    ]
    path = str(tmp_path / "trans_state")
    for i, sl in enumerate(slices):
        assert mart_fold_batch(sl, i, path, merge=transition_merge)
    # replay of the last batch_id must be skipped
    assert not mart_fold_batch(slices[-1], 2, path, merge=transition_merge)

    got = {
        (r.from_type, r.to_type): (r.n, r.share)
        for r in transition_finalize(read_mart(spark, path)).collect()
    }
    want = {
        (r.from_type, r.to_type): (r.n, r.share)
        for r in event_transitions(spark, SF_DIR).collect()
    }
    assert got == want

    # the cross-batch boundary really contributes: summing the three
    # slices' INTRA transition counts alone must undercount
    intra_total = 0
    for sl in slices:
        from pyspark.sql import Window

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        intra_total += (
            sl.select(F.lag("event_type").over(w).alias("p"))
            .filter(F.col("p").isNotNull())
            .count()
        )
    assert intra_total < sum(n for n, _ in want.values())


def test_stream_sample_equals_batch_and_idempotent(spark, tmp_path):
    """D29: the drained streaming bottom-k sample equals the batch
    sample_stratified even when documents are delivered TWICE (the
    doc_id dedup makes the min-k fold idempotent), regardless of
    micro-batch boundaries."""
    from github_issues_lakehouse_spark.operators.scale import sample_stratified
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_sample_maintenance,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    import glob
    import shutil

    f = glob.glob(f"{src}/part-*.parquet")[0]
    shutil.copy(f, f.replace("part-", "copy-"))
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    path = str(tmp_path / "sample.parquet")
    q = stream_sample_maintenance(stream, path, str(tmp_path / "ck"))
    q.awaitTermination(180)

    got = sorted(map(tuple, read_mart(spark, path).collect()))
    want = sorted(map(tuple, sample_stratified(spark, SF_DIR).collect()))
    assert got == want
    per_src = {}
    for source, rk, doc_id, h in got:
        per_src.setdefault(source, []).append(rk)
    for rks in per_src.values():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= 10


def test_stream_reconciliation_equals_batch(spark, tmp_path):
    """D30: lines of the SAME order split across micro-batches still
    converge to the batch recompute (the fold is additive on the
    order key), and the read-time finalize over the drained state
    equals the batch B128 mart exactly."""
    from github_issues_lakehouse_spark.operators.quality_checks import (
        order_total_reconciliation,
        reconciliation_finalize,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_reconciliation_maintenance,
    )

    li = load_table(spark, SF_DIR, "lineitem")
    src = str(tmp_path / "li_src")
    # repartition NOT on the order key: an order's lines land in
    # different files -> different micro-batches
    li.repartition(4).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    path = str(tmp_path / "recon.parquet")
    q = stream_reconciliation_maintenance(stream, path, str(tmp_path / "ck"))
    q.awaitTermination(180)

    state = read_mart(spark, path)
    got = sorted(
        map(
            tuple,
            reconciliation_finalize(
                spark, load_table(spark, SF_DIR, "orders"), state
            ).collect(),
        )
    )
    want = sorted(map(tuple, order_total_reconciliation(spark, SF_DIR).collect()))
    assert got == want


def test_stream_checksum_equals_batch_and_detects_change(spark, tmp_path):
    """D31: drained (n_rows, xor) equals the batch manifest row for
    documents regardless of batch boundaries, and restating ONE
    document's text flips the checksum (sensitivity)."""
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.operators.quality_checks import (
        table_checksum_manifest,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_checksum_maintenance,
    )

    docs = load_table(spark, SF_DIR, "documents")
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    path = str(tmp_path / "cksum.parquet")
    q = stream_checksum_maintenance(stream, path, str(tmp_path / "ck"))
    q.awaitTermination(180)

    got = read_mart(spark, path).collect()[0]
    want = {
        r.table_name: r for r in table_checksum_manifest(spark, SF_DIR).collect()
    }["documents"]
    assert (got.n_rows, got.xor_checksum) == (want.n_rows, want.xor_checksum)

    # sensitivity: restate one doc -> checksum flips, count unchanged
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 0, F.concat(F.col("text"), F.lit(" X")))
        .otherwise(F.col("text")),
    )
    sf2 = str(tmp_path / "sf2")
    import os

    os.makedirs(sf2, exist_ok=True)
    mutated.write.mode("overwrite").parquet(f"{sf2}/documents.parquet")
    for t in ("orders", "lineitem", "customer"):
        load_table(spark, SF_DIR, t).write.mode("overwrite").parquet(
            f"{sf2}/{t}.parquet"
        )
    after = {
        r.table_name: r for r in table_checksum_manifest(spark, sf2).collect()
    }["documents"]
    assert after.n_rows == want.n_rows
    assert after.xor_checksum != want.xor_checksum


def test_stream_freshness_equals_batch_and_minmax_replay_safe(
    spark, events_dir, tmp_path
):
    """D32: after draining, the freshness readout over the maintained
    per-type state equals the batch event_freshness_mart; re-folding a
    batch under a FRESH batch_id (simulated redelivery past the guard)
    cannot move the min/max span fields — only the additive count
    needs the exactly-once guard, and the guard provides it."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        event_freshness_mart,
    )
    from github_issues_lakehouse_spark.streaming import (
        freshness_from_state,
        read_mart,
        stream_freshness_maintenance,
    )

    batch = load_table(spark, SF_DIR, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    path = str(tmp_path / "fresh_state")
    q = stream_freshness_maintenance(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    got = {
        r.event_type: (r.n_events, r.first_day, r.last_day, r.staleness_us,
                       r.events_per_day_e2, r.is_stale)
        for r in freshness_from_state(read_mart(spark, path)).collect()
    }
    want = {
        r.event_type: (r.n_events, r.first_day, r.last_day, r.staleness_us,
                       r.events_per_day_e2, r.is_stale)
        for r in event_freshness_mart(spark, SF_DIR).collect()
    }
    assert got == want

    # (a) redelivery CAUGHT by the guard: a second drain of the same
    # source restarts batch_ids at 0, which mart_fold_batch has
    # already committed — the whole refold must be a no-op
    before = {r.event_type: r for r in read_mart(spark, path).collect()}
    stream2 = spark.readStream.schema(batch.schema).parquet(events_dir)
    q2 = stream_freshness_maintenance(stream2, path, str(tmp_path / "ckpt2"))
    q2.awaitTermination(180)
    after = {r.event_type: r for r in read_mart(spark, path).collect()}
    for et, b in before.items():
        a = after[et]
        assert (a.n_events, a.first_day, a.last_day, a.last_us) == (
            b.n_events,
            b.first_day,
            b.last_day,
            b.last_us,
        ), "replayed batch_ids must be absorbed by the exactly-once guard"

    # (b) redelivery PAST the guard (merge driven directly): the
    # additive count doubles — that is exactly why the guard exists —
    # but every min/max span field is idempotent and stays put
    from github_issues_lakehouse_spark.streaming.ops import freshness_merge

    refolded = {
        r.event_type: r
        for r in freshness_merge(read_mart(spark, path), batch).collect()
    }
    for et, b in before.items():
        a = refolded[et]
        assert a.n_events == 2 * b.n_events
        assert (a.first_day, a.last_day, a.last_us) == (
            b.first_day,
            b.last_day,
            b.last_us,
        ), "min/max span fields must be idempotent under refold"


def test_stream_mad_anomaly_over_maintained_mart(spark, events_dir, tmp_path):
    """D33: the robust MAD anomaly readout (mad_anomaly_from_counts)
    over the D12-maintained daily mart equals the batch
    mad_anomaly_events — the alarm runs on committed O(days x types)
    state, never rescanning events."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        mad_anomaly_events,
        mad_anomaly_from_counts,
    )
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_mart_maintenance,
    )

    batch = load_table(spark, SF_DIR, "events")
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(events_dir)
    )
    path = str(tmp_path / "daily_mart_mad")
    q = stream_mart_maintenance(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(180)

    mart = read_mart(spark, path).select(
        "event_type", F.to_date("day").alias("day"), "n_events"
    )
    got = {
        (r.event_type, str(r.day)): (r.n_events, r.n_trailing, r.med2, r.mad4,
                                     r.robust_z, r.is_anomaly)
        for r in mad_anomaly_from_counts(mart).collect()
    }
    want = {
        (r.event_type, str(r.day)): (r.n_events, r.n_trailing, r.med2, r.mad4,
                                     r.robust_z, r.is_anomaly)
        for r in mad_anomaly_events(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0


def test_stream_embedding_bands_index_and_probe(spark, tmp_path):
    """D35: (a) the drained embedding band-postings index equals the
    batch banding over all vectors even with one batch redelivered —
    a posting row is idempotent state under union+dedup; (b) probe
    equivalence: candidates from joining a "new" batch's postings
    against the index restricted to "old" vectors, verified with the
    same 6dp exact cosine, equal banded_corpus_pairs' verified pairs
    restricted to new x old — the C104/C105 incremental contract on
    the embedding side."""
    import glob
    import shutil

    from github_issues_lakehouse_spark.operators.similarity import (
        banded_corpus_pairs,
        embedding_band_postings,
    )
    from github_issues_lakehouse_spark.streaming import (
        read_mart,
        stream_embedding_bands_maintenance,
    )

    vecs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    src = str(tmp_path / "vec_src")
    vecs.withColumn("_b", F.pmod(-F.col("vec_id"), F.lit(3))).repartition(
        3, "_b"
    ).drop("_b").write.mode("overwrite").parquet(src)
    f = sorted(glob.glob(f"{src}/part-*.parquet"))[0]
    shutil.copy(f, f.replace("part-", "copy-"))  # redeliver one batch
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    path = str(tmp_path / "bandidx.parquet")
    q = stream_embedding_bands_maintenance(stream, path, str(tmp_path / "ck"))
    q.awaitTermination(240)

    idx = read_mart(spark, path)
    got = sorted(map(tuple, idx.collect()))
    want = sorted(map(tuple, embedding_band_postings(vecs).collect()))
    assert got == want and len(got) > 0

    # probe equivalence: old = vec_id < 400, new = the rest
    old_idx = idx.filter(F.col("vec_id") < 400)
    new_posts = embedding_band_postings(vecs.filter(F.col("vec_id") >= 400))
    cand = (
        new_posts.join(
            old_idx.select(
                F.col("vec_id").alias("old_id"), "band_id", "band_val"
            ),
            ["band_id", "band_val"],
        )
        .select(
            F.least("old_id", "vec_id").alias("id_a"),
            F.greatest("old_id", "vec_id").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cand_pairs = {(r.id_a, r.id_b) for r in cand.collect()}
    cross = {
        (r.id_a, r.id_b)
        for r in banded_corpus_pairs(spark, SF_DIR).collect()
        if (r.id_a < 400) != (r.id_b < 400)
    }
    # every verified cross pair's candidate must come out of the index
    assert cross <= cand_pairs and len(cross) > 0


def test_stream_mart_retention_bounded_state_any_order(spark, tmp_path):
    """D36: the retention fold's drained state equals the batch twin
    (full mart -> apply_mart_retention) under adversarial arrival
    order, keeps exact lifetime totals in the archive row, and stays
    bounded at O(types x retention + types) rows."""
    from github_issues_lakehouse_spark.operators.gold import daily_event_mart
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        apply_mart_retention,
        read_mart,
        stream_mart_retention_maintenance,
    )

    retention = 7
    events = load_table(spark, SF_DIR, "events").select("ts", "event_type", "value")
    src = str(tmp_path / "ev_src")
    # reverse-ish split: the NEWEST days land in the FIRST files, so
    # early folds set a high horizon and archive aggressively; later
    # batches deliver old days straight into re-collapse — the late-
    # data-for-archived-day path
    events.withColumn(
        "_b", F.pmod(-F.unix_micros("ts"), F.lit(4))
    ).repartition(4, "_b").drop("_b").write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    mart_path = str(tmp_path / "retention_mart")
    q = stream_mart_retention_maintenance(
        stream, mart_path, str(tmp_path / "ckpt"), retention_days=retention
    )
    assert q.awaitTermination(300)

    def key(r):
        return (r.event_type, None if r.day is None else str(r.day))

    got = {key(r): (r.n_events, float(r.total_value)) for r in read_mart(spark, mart_path).collect()}
    full = daily_event_mart(spark.read.parquet(src))
    want = {
        key(r): (r.n_events, float(r.total_value))
        for r in apply_mart_retention(full, retention).collect()
    }
    assert got == want and len(got) > 0
    # the archive actually fired and lifetime totals are conserved
    assert any(day is None for (_, day) in got)
    tot_state = sum(n for n, _ in got.values())
    tot_full = full.agg(F.sum("n_events")).collect()[0][0]
    assert tot_state == tot_full
    # bounded: per type, at most retention+1 day-grain rows + 1 archive
    from collections import Counter

    per_type = Counter(t for (t, _) in got)
    assert max(per_type.values()) <= retention + 2


def test_retention_fold_replay_patterns_converge(spark, tmp_path):
    """D36: the retention merge composes with the batch_id guard
    exactly like the plain mart fold — additive counts are NOT
    idempotent, so replay absorption is the guard's job; any replay
    pattern must converge to apply_mart_retention over the full
    corpus, archive row included."""
    from functools import partial

    from github_issues_lakehouse_spark.operators.gold import (
        daily_event_mart,
        merge_mart_increment,
    )
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming import (
        apply_mart_retention,
        mart_fold_batch,
        read_mart,
    )

    retention = 7
    events = load_table(spark, SF_DIR, "events").select("ts", "event_type", "value")
    batches = [events.filter(F.col("event_id") % 3 == k) for k in range(3)]

    def merge(existing, batch_df):
        return apply_mart_retention(
            merge_mart_increment(existing, batch_df), retention
        )

    def run(pattern, path):
        for bid in pattern:
            mart_fold_batch(batches[bid], bid, path, merge=merge)
        return {
            (r.event_type, None if r.day is None else str(r.day)): (
                r.n_events,
                float(r.total_value),
            )
            for r in read_mart(spark, path).collect()
        }

    want = {
        (r.event_type, None if r.day is None else str(r.day)): (
            r.n_events,
            float(r.total_value),
        )
        for r in apply_mart_retention(daily_event_mart(events), retention).collect()
    }
    for i, pat in enumerate([[0, 1, 2], [0, 0, 1, 1, 2, 2], [0, 1, 2, 0, 1, 2, 2]]):
        got = run(pat, str(tmp_path / f"rmart{i}"))
        assert got == want, pat
    assert any(day is None for (_, day) in want)
