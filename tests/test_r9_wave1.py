"""Round-9 wave 1: the keyed-state streaming readout (B139) and the
r9 infrastructure fixes.

- B139 `stream_sessionize_readout` drains events through the real
  applyInPandasWithState gap sessionization (D2's class) under the
  versioned-commit protocol and must equal batch B11 exactly.
- The readout staging cache (VERDICT r8 task 3) writes the corpus
  once per (process, stage key); repeats and same-frame keys reuse it.
- bench.py's stderr tee terminates on an in-band sentinel because the
  py4j JVM child holds an inherited copy of the pipe write end and
  EOF can never arrive (ADVICE r8 medium).
"""

from __future__ import annotations

import os

SF_DIR = "/root/testdata/sf0.001"


def test_stream_sessionize_readout_equals_batch(spark):
    """B139: staged time-ordered drain through the keyed-state
    sessionizer + sentinel flush + union-append mart + read-time rank
    equals batch sessionize_events row-for-row (including the
    formatted timestamps and 6dp value) — the drain==batch identity
    on the driver-facing surface itself."""
    from github_issues_lakehouse_spark.operators.relational import sessionize_events
    from github_issues_lakehouse_spark.streaming import stream_sessionize_readout

    got = sorted(map(tuple, stream_sessionize_readout(spark, SF_DIR).collect()))
    want = sorted(map(tuple, sessionize_events(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0
    # multi-session users exist, so the gap split + seq rank are
    # genuinely exercised (not a one-session-per-user degenerate run)
    assert max(r[1] for r in got) > 1


def test_stream_session_window_readout_equals_batch_and_b139(spark):
    """B140: the native session_window drain (JVM state, watermark
    emission) equals batch B11 — and therefore B139 — row-for-row.
    The two streaming readouts close sessions by entirely different
    mechanisms (user-code gap proof vs engine watermark), so this
    equality is a cross-implementation check of the session
    semantics, not a re-run of the same code path."""
    from github_issues_lakehouse_spark.operators.relational import sessionize_events
    from github_issues_lakehouse_spark.streaming import (
        stream_session_window_readout,
    )

    got = sorted(map(tuple, stream_session_window_readout(spark, SF_DIR).collect()))
    want = sorted(map(tuple, sessionize_events(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0


def test_session_window_gap_boundary_matches_batch_rule(spark):
    """The batch rule splits on gap STRICTLY greater than 30 min
    (epoch diff > 1800s); Spark's native session_window must agree at
    the exact boundary or B140 would diverge from B11 on planted
    ties: two events exactly one gap apart merge (one session), one
    microsecond over splits (two sessions)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, 0), (1, 1_800_000_000), (2, 0), (2, 1_800_000_001)],
        "user_id long, ts_us long",
    ).withColumn("ts", F.timestamp_micros(F.col("ts_us") + 1_700_000_000_000_000))
    out = (
        df.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("sessions"), F.sum("n").alias("events"))
        .orderBy("user_id")
        .collect()
    )
    assert [(r.user_id, r.sessions, r.events) for r in out] == [(1, 1, 2), (2, 2, 2)]


def test_sessionize_mart_replay_absorbed(spark, tmp_path):
    """The union-append session mart inherits the exactly-once
    batch_id guard: replaying a batch (same batch_id) is a no-op, so
    at-least-once foreachBatch delivery cannot duplicate a session."""
    from github_issues_lakehouse_spark.streaming.ops import (
        mart_fold_batch,
        read_mart,
    )

    path = str(tmp_path / "sessions")
    union = lambda existing, b: b if existing is None else existing.unionByName(b)
    batch = spark.createDataFrame(
        [(7, 1000, 2000, 3, 1.5)],
        "user_id long, start_us long, end_us long, n_events long, session_value double",
    )
    assert mart_fold_batch(batch, 0, path, merge=union) is True
    assert mart_fold_batch(batch, 0, path, merge=union) is False  # replay
    assert read_mart(spark, path).count() == 1


def test_staging_cache_reuses_on_disk_copy(spark, tmp_path):
    """VERDICT r8 task 3: two _stage_and_drain calls with the same
    stage_key in one process write the staging parquet ONCE — the
    second call must reuse the first's files (same paths, same
    mtimes), while each call still runs a fresh drain."""
    import glob

    from github_issues_lakehouse_spark.streaming.ops import (
        _STAGING_CACHE,
        _stage_and_drain,
        stream_freshness_maintenance,
    )

    df = spark.range(64).selectExpr(
        "timestamp_micros(1700000000000000 + id * 60000000) as ts",
        "concat('t', cast(id % 3 as string)) as event_type",
    )
    skey = f"test-cache:{tmp_path}"
    _stage_and_drain(
        spark, df, f"run1:{tmp_path}", stream_freshness_maintenance,
        n_files=2, stage_key=skey,
    )
    staging, _fp = _STAGING_CACHE[skey]
    before = {p: os.path.getmtime(p) for p in glob.glob(f"{staging}/part-*")}
    assert len(before) >= 1
    _stage_and_drain(
        spark, df, f"run2:{tmp_path}", stream_freshness_maintenance,
        n_files=2, stage_key=skey,
    )
    after = {p: os.path.getmtime(p) for p in glob.glob(f"{staging}/part-*")}
    assert after == before  # bitwise same staging files, no rewrite

    # ADVICE r9: reusing the key with a DIFFERENT layout (here: a
    # different n_files) must fail loudly, not silently drain run1's
    # staged files
    import pytest

    with pytest.raises(ValueError, match="different layout"):
        _stage_and_drain(
            spark, df, f"run3:{tmp_path}", stream_freshness_maintenance,
            n_files=3, stage_key=skey,
        )
    _STAGING_CACHE.pop(skey, None)


def test_ordered_staging_files_are_time_ranges(spark):
    """The B139 staging contract: part files are range-partitioned on
    ts_us with mtimes bumped in range order, so the file source's
    oldest-first pickup IS event-time order (keyed sessionization's
    cross-batch arrival requirement)."""
    import duckdb

    from github_issues_lakehouse_spark.streaming.ops import _STAGING_CACHE

    # the equals-batch test above has already staged this key
    skey = f"events_us30:{os.path.abspath(SF_DIR)}"
    cached = _STAGING_CACHE.get(skey)
    if cached is None:  # test ran standalone: stage via the readout
        from github_issues_lakehouse_spark.streaming import (
            stream_sessionize_readout,
        )

        stream_sessionize_readout(spark, SF_DIR).count()
        cached = _STAGING_CACHE[skey]
    staging, _fp = cached
    parts = sorted(
        p for p in os.listdir(staging)
        if p.startswith("part-") and p.endswith(".parquet")
    )
    assert len(parts) >= 2
    con = duckdb.connect()
    spans = [
        con.execute(
            f"select min(ts_us), max(ts_us) from read_parquet('{staging}/{p}')"
        ).fetchone()
        for p in parts
    ]
    mtimes = [os.path.getmtime(os.path.join(staging, p)) for p in parts]
    # name order == mtime order == disjoint ascending time ranges
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == len(mtimes)
    for (lo_a, hi_a), (lo_b, hi_b) in zip(spans, spans[1:]):
        assert hi_a <= lo_b


def test_sessionize_drain_crash_resume(spark, tmp_path, monkeypatch):
    """The B139 exactly-once story is two-layered: the state store
    rolls a failed micro-batch back (same sessions re-emitted on
    replay) and the mart's batch_id guard absorbs duplicate folds.
    Drive it: crash the fold once mid-drain (after some batches have
    committed), restart the SAME query from its checkpoint, and the
    final committed sessions must equal the batch sessionization of
    the full input — no lost and no duplicated session."""
    import glob
    import time as _time

    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.streaming import ops

    # synthetic corpus: 3 users x 30 events, 10-minute steps with a
    # >gap jump every 7 events; plus one sentinel per user
    gap_min = 30
    base_us = 1_700_000_000_000_000
    rows = []
    for u in range(3):
        t = base_us + u * 17_000_000
        for i in range(30):
            t += (45 if i % 7 == 6 else 10) * 60_000_000  # 45min jump splits
            rows.append((u, t, float(u + i)))
    max_us = max(t for _, t, _ in rows)
    sent_us = max_us + (gap_min * 60 + 3600) * 1_000_000
    rows += [(u, sent_us, 0.0) for u in range(3)]
    df = spark.createDataFrame(rows, "user_id long, ts_us long, value double")

    staging = str(tmp_path / "staging")
    (
        df.repartitionByRange(4, F.col("ts_us"))
        .sortWithinPartitions("ts_us")
        .write.parquet(staging)
    )
    now = _time.time()
    for i, p in enumerate(sorted(glob.glob(f"{staging}/part-*"))):
        os.utime(p, (now + 2 * i, now + 2 * i))

    mart = str(tmp_path / "mart")
    ckpt = str(tmp_path / "ckpt")

    real_fold = ops.mart_fold_batch
    crashed = {"done": False}

    def crashing_fold(batch_df, batch_id, path, merge=None, **kw):
        # **kw passes through new fold options (append_only, r11) so the
        # crash-resume proof covers the production fold path verbatim
        if batch_id == 2 and not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash before batch 2 commits")
        return real_fold(batch_df, batch_id, path, merge=merge, **kw)

    monkeypatch.setattr(ops, "mart_fold_batch", crashing_fold)

    def start():
        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staging)
        )
        return ops.stream_sessionize_keyed_maintenance(
            stream, mart, ckpt, gap_minutes=gap_min
        )

    q = start()
    try:
        q.awaitTermination(300)
        raised = q.exception() is not None
    except Exception:
        raised = True
    assert raised and crashed["done"], "the injected crash must surface"

    # restart from the same checkpoint: batch 2 replays (state store
    # rolled back), later batches continue; guard absorbs any replays
    q2 = start()
    assert q2.awaitTermination(300)

    got = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events, round(r.session_value, 6))
        for r in ops.read_mart(spark, mart).collect()
    )

    # batch truth: python recompute with the same strict > gap rule,
    # dropping each user's final (sentinel) open session
    want = []
    gap_us = gap_min * 60 * 1_000_000
    by_user: dict[int, list[tuple[int, float]]] = {}
    for u, t, v in rows:
        by_user.setdefault(u, []).append((t, v))
    for u, evs in by_user.items():
        evs.sort()
        sess = []
        for t, v in evs:
            if not sess or t - sess[-1][1] > gap_us:
                sess.append([t, t, 1, v])
            else:
                s = sess[-1]
                s[1], s[2], s[3] = t, s[2] + 1, s[3] + v
        for s in sess[:-1]:  # last = sentinel's open session, never emitted
            want.append((u, s[0], s[1], s[2], round(s[3], 6)))
    assert got == sorted(want) and len(got) > 6


def test_ivf_pq_topk_respects_cell_restriction(spark):
    """C149: every returned neighbor must live in one of its query's
    probed IVF cells (the index may NOT silently fall back to a full
    scan), the output is exactly n_queries x k rows, and a second
    build returns bit-identical rows (no RNG anywhere in the index)."""
    from pyspark.sql import functions as F

    from github_issues_lakehouse_spark.operators.similarity import (
        _corpus,
        ann_ivf_pq_topk,
    )
    from github_issues_lakehouse_spark.functions.vectors import cosine
    from github_issues_lakehouse_spark.operators.relational import r6
    from pyspark.sql import Window

    n_queries, k, n_centroids, n_probe = 8, 5, 16, 2
    out = ann_ivf_pq_topk(spark, SF_DIR, n_queries, k, n_centroids, n_probe)
    rows = sorted(map(tuple, out.collect()))
    assert len(rows) == n_queries * k
    assert rows == sorted(map(tuple, ann_ivf_pq_topk(spark, SF_DIR).collect()))

    # recompute cells/probes independently with the same public algebra
    corpus = _corpus(spark, SF_DIR)
    cents = corpus.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")
    )

    def assign(df, id_col, vec_col, keep):
        scored = df.crossJoin(F.broadcast(cents)).select(
            id_col, "c_id", r6(cosine(F.col(vec_col), F.col("c_vec"))).alias("s")
        )
        w = Window.partitionBy(id_col).orderBy(F.col("s").desc(), F.col("c_id").asc())
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= keep)
            .select(id_col, "c_id")
        )

    cells = {(r[0], r[1]) for r in assign(corpus, "vec_id", "vec", 1).collect()}
    probes: dict[int, set] = {}
    q = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("qv")
    )
    for r in assign(q, "q_id", "qv", n_probe).collect():
        probes.setdefault(r[0], set()).add(r[1])
    cell_of = dict(cells)
    for q_id, _rank, neighbor, _d2 in rows:
        assert cell_of[neighbor] in probes[q_id], (
            f"neighbor {neighbor} of query {q_id} outside its probed cells"
        )


def test_tee_sentinel_terminates_pump_with_live_writer():
    """ADVICE r8 medium: finish() must return promptly even though a
    'JVM' still holds an inherited copy of the pipe write end (EOF
    never arrives), and a sentinel split across two reads must not
    leak partial bytes or swallow following output."""
    import time

    import bench

    finish = bench._tee_stderr("/tmp/sgl_tee_test.log")
    jvm_fd = os.dup(2)  # stand-in for the JVM's inherited fd 2
    try:
        os.write(2, b"python line\n")
        os.write(jvm_fd, b"jvm line\n")
        os.write(2, b"partial" + bench._TEE_SENTINEL[:5])
        time.sleep(0.1)
        os.write(2, b"X\n")  # disproves the sentinel prefix
        time.sleep(0.1)
        t0 = time.time()
        finish()
        took = time.time() - t0
    finally:
        os.close(jvm_fd)
    data = open("/tmp/sgl_tee_test.log", "rb").read()
    assert took < 5, "finish() hit the join timeout despite the sentinel"
    assert b"python line" in data and b"jvm line" in data
    assert b"partial" in data and b"X\n" in data
    assert bench._TEE_SENTINEL not in data
