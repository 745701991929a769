"""Structured Streaming operators — streaming twins of the batch
event operators. The reference pipeline is batch-only; a lakehouse
ingesting GitHub events continuously needs these three primitives:

- windowed counts with watermark (late-data-tolerant KPI feed),
- stateful gap sessionization (``applyInPandasWithState``),
- streaming dedup within a watermark horizon (the streaming form of
  the silver cross-run dedup).

All take any streaming DataFrame with the ``events`` schema
(event_id, ts, user_id, event_type, value) so tests can feed them
from file sources and production from Kafka — source-agnostic.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window counts per event_type with a watermark; late
    rows beyond the watermark are dropped, state is bounded."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "event_count", "total_value")
    )


SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours") -> DataFrame:
    """Stateful gap-based sessionization: emits a session when the
    user's event gap exceeds ``gap_minutes`` (or state times out).

    Keyed state per user via ``applyInPandasWithState`` — Arrow
    batches, bounded state with processing-time timeout.
    """
    gap_ms = gap_minutes * 60 * 1000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            if state.exists:
                start_ms, end_ms, n, val = state.get
                state.remove()
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start": [pd.Timestamp(start_ms, unit="ms")],
                        "session_end": [pd.Timestamp(end_ms, unit="ms")],
                        "n_events": [n],
                        "session_value": [val],
                    }
                )
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        out = []
        if state.exists:
            start_ms, end_ms, n, val = state.get
        else:
            start_ms = end_ms = None  # type: ignore[assignment]
            n, val = 0, 0.0
        for _, r in rows.iterrows():
            t_ms = int(r["ts"].value // 1_000_000)
            if start_ms is None:
                start_ms, end_ms, n, val = t_ms, t_ms, 1, float(r["value"])
            elif t_ms - end_ms > gap_ms:
                out.append((start_ms, end_ms, n, val))
                start_ms, end_ms, n, val = t_ms, t_ms, 1, float(r["value"])
            else:
                end_ms = t_ms
                n += 1
                val += float(r["value"])
        state.update((start_ms, end_ms, n, val))
        state.setTimeoutDuration(gap_ms)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out),
                    "session_start": [pd.Timestamp(s, unit="ms") for s, *_ in out],
                    "session_end": [pd.Timestamp(e, unit="ms") for _, e, *_ in out],
                    "n_events": [n_ for *_, n_, _v in out],
                    "session_value": [v for *_, v in out],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap sessionization via Spark's NATIVE ``session_window``
    aggregation — the declarative twin of ``sessionize_stream``.
    State lives in the streaming aggregation operator (merged and
    evicted by watermark, JVM-side); use this when the session
    payload is expressible as aggregates and the Pandas-state version
    only when per-event custom logic is genuinely needed."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon
    (streaming twin of silver ``merge_keep_latest``)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def purchase_error_stream_join(
    events: DataFrame, within_minutes: int = 5, watermark: str = "1 hour"
) -> DataFrame:
    """Stream-stream interval join: for each purchase, error events by
    the same user within ``within_minutes`` after it. Both sides carry
    watermarks and the join condition bounds event time on both ends,
    so each side's buffered state is finite and evicted as the
    watermark advances — the two requirements Spark imposes on
    stream-stream inner joins."""
    from pyspark.sql import functions as F

    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    e = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("e_event_id"),
            F.col("user_id").alias("e_user"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts"))
        & (F.col("e_ts") <= F.col("p_ts") + F.expr(f"INTERVAL {within_minutes} MINUTES"))
    )
    return p.join(e, cond).select("p_event_id", "e_event_id", "p_user", "p_ts", "e_ts")


def enrich_stream_with_dim(events: DataFrame, dim: DataFrame, on_mod: int = 20) -> DataFrame:
    """Stream-static join: enrich the event stream with a customer
    dimension (user_id maps onto custkey space via mod, matching the
    batch as-of/semi-join conventions). The static side is broadcast
    per micro-batch — no stream-side state, re-read on dim refresh."""
    from pyspark.sql import functions as F

    d = dim.select(
        (F.col("c_custkey") % on_mod).alias("join_uid"), "c_mktsegment"
    ).dropDuplicates(["join_uid"])
    return events.join(F.broadcast(d), events.user_id == d.join_uid, "left").select(
        "event_id", "ts", "user_id", "event_type", "value", "c_mktsegment"
    )


def stream_merge_to_parquet(
    events: DataFrame, path: str, checkpoint: str, key: str = "event_id", order_col: str = "ts"
):
    """The streaming -> lakehouse bridge: each micro-batch is
    merge-upserted (keep-latest per key) into a parquet table via
    ``foreachBatch``. On Delta/Iceberg the body becomes MERGE INTO;
    the stream wiring is identical. Returns the started query."""
    from ..sinks import merge_upsert

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert(batch_df.sparkSession, batch_df, path, key=key, order_col=order_col)

    return (
        events.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


RUNNING_TOTALS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """D9: per-user lifetime running totals via Spark 4's
    ``transformWithStateInPandas`` — the modern arbitrary-state API
    (typed value/list/map state handles, timers, TTL) that supersedes
    ``applyInPandasWithState``. Each micro-batch updates a ValueState
    per user and emits the user's new running (n_events, total_value)
    — the streaming twin of the batch running_customer_totals shape.

    Requires the RocksDB state store provider (transformWithState's
    backing store); the caller's session must set
    spark.sql.streaming.stateStore.providerClass accordingly.

    The processor class is defined inside this function so cloudpickle
    serializes it BY VALUE — workers never need to import this package
    (driver sessions run from arbitrary cwds).
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    state_schema = T.StructType(
        [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = 0, 0.0
            if self._state.exists():
                n, total = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=RUNNING_TOTALS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run: its
    state-server protocol is protobuf-based and needs the
    google.protobuf wheel at worker startup (pyspark doesn't declare
    it as a hard dependency; absent it the streaming runner crashes
    with ImportError at query start)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def quality_gate_stream(docs: DataFrame, min_quality: float = 0.8) -> DataFrame:
    """D11: streaming corpus quality gate — the batch quality_score
    Column expressions applied to a document STREAM (stateless
    map-only streaming: no watermark, no state store; each micro-
    batch filters independently). The exact streaming twin of the
    batch training_corpus_filter quality leg, so an ingest pipeline
    can gate documents before they ever land in bronze.
    """
    from ..functions.textfns import quality_score, whitespace_token_count

    q = F.round(quality_score(F.col("text")), 6)
    return docs.select(
        "doc_id",
        "source",
        whitespace_token_count(F.col("text")).alias("n_tokens"),
        q.alias("quality_score"),
    ).filter(F.col("quality_score") >= min_quality)


def _read_mart_meta(path: str) -> dict | None:
    import json
    import os

    ptr = os.path.join(path, "_CURRENT")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return json.load(f)


def read_mart(spark, path: str) -> DataFrame | None:
    """Resolve the current committed version of a mart maintained by
    ``stream_mart_maintenance`` (versioned subdirs + ``_CURRENT``
    pointer file). Returns None if no version has committed yet."""
    import os

    meta = _read_mart_meta(path)
    if meta is None:
        return None
    return spark.read.parquet(os.path.join(path, meta["version"]))


def mart_fold_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    merge=None,
    append_only: bool = False,
) -> bool:
    """Fold one micro-batch into the stored mart, exactly once.

    foreachBatch is at-least-once: after a crash the last batch is
    replayed with the SAME batch_id, so the fold must be idempotent
    and the commit atomic or a replay double-counts / a crash strands
    a half-written mart. Protocol:

    1. skip if ``batch_id <= last committed batch_id`` (replay);
    2. write the merged mart to a fresh versioned subdir
       ``v_{batch_id}`` (a crashed partial write is simply
       re-overwritten on replay — never referenced until committed);
    3. commit by atomically renaming a temp pointer file onto
       ``_CURRENT`` (POSIX/HDFS rename; on S3 use a conditional-put
       pointer object instead);
    4. best-effort GC of superseded version dirs after the swap.

    A crash at any point leaves ``_CURRENT`` referencing a complete
    version whose batch_id tells the replay where to resume. Returns
    True if the batch was applied, False if skipped as a replay.

    ``merge(existing_or_None, batch_df) -> DataFrame`` customizes the
    fold (default: the additive daily event mart); any associative
    merge — additive counters, cell-wise sketch sums, k-min unions —
    inherits the same exactly-once protocol.

    ``append_only=True`` (r11, guide §6 + VERDICT r10 task 7) is the
    fast path for marts whose merge is a plain union of append-only
    facts (emitted sessions): the new version holds ONLY the batch's
    increment as freshly written parquet, and the prior committed
    version's data files are HARDLINKED in (copy fallback), so a
    drain writes O(total) rows instead of re-reading and re-writing
    the whole mart every batch (O(batches x total)). The protocol is
    unchanged — versioned dir, atomic pointer swap, batch_id replay
    guard, GC (links keep inodes alive) — and a replayed batch
    re-overwrites its own version dir before re-linking, so the
    result is byte-identical to the union merge.
    """
    import json
    import os
    import shutil

    from ..operators.gold import merge_mart_increment

    spark = batch_df.sparkSession
    os.makedirs(path, exist_ok=True)
    meta = _read_mart_meta(path)
    if meta is not None and batch_id <= meta["batch_id"]:
        return False
    vdir = f"v_{batch_id}"
    if append_only:
        full = os.path.join(path, vdir)
        batch_df.write.mode("overwrite").parquet(full)
        if meta is not None:
            prev_dir = os.path.join(path, meta["version"])
            for fname in os.listdir(prev_dir):
                if not fname.endswith(".parquet"):
                    continue  # _SUCCESS / metadata: the new write has its own
                src = os.path.join(prev_dir, fname)
                dst = os.path.join(full, f"p{batch_id}_{fname}")
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
    else:
        merge = merge or merge_mart_increment
        existing = (
            spark.read.parquet(os.path.join(path, meta["version"])) if meta else None
        )
        merged = merge(existing, batch_df)
        merged.write.mode("overwrite").parquet(os.path.join(path, vdir))
    ptr = os.path.join(path, "_CURRENT")
    tmp_ptr = f"{ptr}.tmp"
    try:
        with open(tmp_ptr, "w") as f:
            json.dump({"version": vdir, "batch_id": batch_id}, f)
        os.replace(tmp_ptr, ptr)
    finally:
        if os.path.exists(tmp_ptr):
            os.remove(tmp_ptr)
    for d in os.listdir(path):
        if d.startswith("v_") and d != vdir:
            shutil.rmtree(os.path.join(path, d), ignore_errors=True)
    return True


def stream_mart_maintenance(events: DataFrame, path: str, checkpoint: str):
    """D12: streaming MATERIALIZED VIEW — each micro-batch folds into
    the stored additive daily mart via ``merge_mart_increment``
    (aggregate the batch alone, merge two small aggregates, commit a
    new mart version). The committed mart always equals the batch
    mart over every batch folded so far, survives crash/replay
    (``mart_fold_batch`` is idempotent on batch_id with an atomic
    pointer-swap commit), and no micro-batch ever rescans history.
    Read the result with ``read_mart``. Returns the started query."""

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path)

    return (
        events.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_cms_maintenance(
    docs: DataFrame, path: str, checkpoint: str, width: int = 256, depth: int = 3
):
    """D13: streaming Count-Min sketch maintenance — each micro-batch
    of documents folds into the stored depth x width cell table by
    CELL-WISE SUM (CMS is additive, the textbook mergeable-sketch
    property), under the same exactly-once versioned-commit protocol
    as the daily mart. After draining, the committed state equals the
    batch CMS over every document ingested — the constant-size
    frequency summary a 100 TB ingest keeps per stream without ever
    re-scanning history. Read with read_mart. Returns the query."""
    from pyspark.sql import functions as F

    from ..operators.sketches import cms_cells

    def merge(existing, batch_df):
        delta = cms_cells(batch_df, width=width, depth=depth)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("row", "b")
            .agg(F.sum("cell_count").cast("long").alias("cell_count"))
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_kmv_maintenance(docs: DataFrame, path: str, checkpoint: str, k: int = 64):
    """D14: streaming KMV distinct-count sketch — each micro-batch's
    per-source k-minimum term hashes union into the stored state and
    the k smallest survive (min-union is associative and
    order-insensitive, so replay order cannot change the state).
    Same exactly-once commit protocol; after draining, the state
    equals the batch kmv_state over all documents, so the distinct
    estimate (k-1)/U_k is available at any time without a distinct
    over history. Read with read_mart. Returns the query."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.sketches import kmv_state

    def merge(existing, batch_df):
        delta = kmv_state(batch_df, k=k)
        if existing is None:
            return delta
        w = Window.partitionBy("source").orderBy(F.col("h").asc(), F.col("term").asc())
        return (
            existing.unionByName(delta)
            .dropDuplicates(["source", "term"])
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("source", "term", "h")
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_topk_terms_maintenance(
    docs: DataFrame, path: str, checkpoint: str, m: int = 256
):
    """D21 (r5): streaming heavy-hitter (top-m terms per source)
    maintenance — each micro-batch's exact vocabulary counts fold
    into the stored SpaceSaving-style summary
    (``sketches.heavy_hitters_merge``: absent stored terms inherit
    the per-source error floor, top-m survive, the floor ratchets to
    the largest dropped count), under the same exactly-once
    versioned-commit protocol as the daily mart. The drained state
    satisfies the mergeable-summaries guarantee
    ``true <= cnt <= true + floor_cnt`` per retained term, and is
    EXACT (floor 0) whenever the per-source vocabulary fits in m —
    the bounded frequent-terms state a 100 TB ingest keeps per
    stream without ever rescanning history. Read with read_mart.
    Returns the started query."""
    from ..operators.sketches import heavy_hitters_merge

    def merge(existing, batch_df):
        return heavy_hitters_merge(existing, batch_df, m=m)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


EWMA_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

EWMA_STATE_SCHEMA = T.StructType(
    [
        # fixed-point cents (same recursion as the batch twin — a
        # float fold is not bit-stable across engines/restarts)
        T.StructField("last_cents", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)


def stream_ewma(events: DataFrame, alpha: float = 0.3) -> DataFrame:
    """D16: stateful per-user EWMA over the event stream — the
    streaming twin of the batch ``ewma_user_value`` recursion
    (pandas ewm(adjust=False), seeded at the user's first event).
    Emits one row per event carrying the smoothed value; keyed state
    is TWO numbers per user (last ewma + count), so state size is
    O(users) regardless of stream length.

    Within a micro-batch rows are folded in (ts, event_id) order;
    across batches the fold continues from state, so a drained
    availableNow stream reproduces the batch EWMA fold over each
    user's FULL history. Note the batch twin ``ewma_user_value``
    truncates to a trailing k-event frame (default k=16): the two
    agree exactly only when k >= every user's event count (the
    equivalence test uses k=100000 for this reason); at the default
    k they differ for longer histories (ADVICE r3). Events
    arriving out of order across batches fold in arrival order — the
    same caveat as sessionize_stream; feed from a source that
    preserves per-key time order (or pre-sort per trigger) when exact
    time order matters.
    """

    def fn(key, pdfs, state) -> "Iterator[pd.DataFrame]":
        # self-contained closure: workers may not be able to import
        # this package (foreign-cwd driver), so only pandas here
        import pandas as pd  # noqa: F811

        (user_id,) = key
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        rows = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        if rows.empty:
            return
        if state.exists:
            last, n = state.get
        else:
            last, n = 0, 0
        a10 = int(round(alpha * 10))
        out = []
        for _, r in rows.iterrows():
            x = float(r["value"])
            cents = int(round(x * 100))
            last = cents if n == 0 else (last * (10 - a10) + cents * a10 + 5) // 10
            n += 1
            out.append((int(r["event_id"]), r["ts"], x, last / 100.0))
        state.update((int(last), int(n)))
        yield pd.DataFrame(
            {
                "event_id": [o[0] for o in out],
                "user_id": [user_id] * len(out),
                "ts": [o[1] for o in out],
                "value": [o[2] for o in out],
                "ewma": [o[3] for o in out],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_column_stats(events: DataFrame) -> DataFrame:
    """Mergeable per-column statistics of an events batch: count,
    nulls, numeric min/max (timestamps as epoch seconds; strings have
    no numeric range) — the streaming-foldable subset of
    table_stats_mart (exact NDV is NOT mergeable; the KMV sketch
    fold D14 is the streaming answer for distincts)."""
    cols = [
        ("event_id", "num"),
        ("ts", "ts"),
        ("user_id", "num"),
        ("event_type", "str"),
        ("value", "num"),
    ]
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c, kind in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        if kind != "str":
            num = (
                F.unix_timestamp(c).cast("double")
                if kind == "ts"
                else F.col(c).cast("double")
            )
            aggs.append(F.min(num).alias(f"mn_{c}"))
            aggs.append(F.max(num).alias(f"mx_{c}"))
    wide = events.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("column_name"),
            F.col("_n").cast("long").alias("n_rows"),
            F.col(f"nn_{c}").cast("long").alias("n_nulls"),
            (
                F.col(f"mn_{c}") if kind != "str" else F.lit(None).cast("double")
            ).alias("min_num"),
            (
                F.col(f"mx_{c}") if kind != "str" else F.lit(None).cast("double")
            ).alias("max_num"),
        )
        for c, kind in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def stream_stats_maintenance(events: DataFrame, path: str, checkpoint: str):
    """D17: streaming table-statistics maintenance — the ANALYZE mart
    kept fresh per micro-batch under the same exactly-once fold as
    D12-D14 (idempotent on batch_id, atomic versioned commit).
    Count/null adds and min/max merges are associative and
    order-insensitive, so replayed or reordered batches cannot drift
    the state; after draining, the stored mart equals
    batch_column_stats over everything ingested. Read with read_mart.
    """

    def merge(existing, batch_df):
        delta = batch_column_stats(batch_df)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("column_name")
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.sum("n_nulls").cast("long").alias("n_nulls"),
                F.min("min_num").alias("min_num"),
                F.max("max_num").alias("max_num"),
            )
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_sla_maintenance(
    issues: DataFrame,
    path: str,
    checkpoint: str,
    sla_hours: int = 168,
    critical_tiers: tuple = ("P0", "P1"),
):
    """D18: streaming maintenance of the reference-README SLA mart
    (gold.sla_stability_mart) — each micro-batch of silver issues
    folds its ADDITIVE core (``gold.sla_core``: per-(month,
    component) created/closed counts, SLA breaches, open-exposure
    microseconds) into the stored core by per-key sum
    (``gold.sla_merge_core``) under the same exactly-once
    versioned-commit protocol as the daily mart (D12). The derived
    columns (backlog window, ppm stability/breach indices) are NOT
    stored — they are order-sensitive, so the reader computes them
    with ``gold.sla_finalize`` over the (months x components)-sized
    core, never over issue history.

    Contract: each issue row arrives in exactly ONE batch and in
    FINAL state (the silver merge-dedup upstream guarantees this);
    then the drained stream's finalized mart EQUALS the batch mart
    over the union of all batches — additivity of the core is the
    whole proof. The additive core has no issue_id, so a violated
    contract (an issue delivered open and REDELIVERED closed)
    double-counts silently — feed this maintainer only from an
    exactly-once, settled upstream. For at-least-once upstreams use
    ``stream_sla_keyed_maintenance`` (D20), which keys state on
    issue_id and tolerates arbitrary redelivery (ADVICE r4). Read
    with ``sla_finalize(read_mart(spark, path))``. Returns the
    started query.
    """
    from ..operators.gold import sla_core, sla_merge_core

    def merge(existing, batch_df):
        delta = sla_core(
            batch_df, sla_hours=sla_hours, critical_tiers=critical_tiers
        )
        return sla_merge_core(existing, delta)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        issues.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def sla_issue_snapshot_merge(existing, batch_df):
    """Merge rule for the keyed SLA maintainer (D20): state is the
    LATEST-KNOWN silver snapshot per issue_id; union old state with
    the batch and keep, per issue, the most SETTLED row — closed
    beats open, later closed_at beats earlier, later created_at
    breaks remaining ties. The rule is associative, commutative and
    idempotent over redeliveries (a stale open row replayed after
    the closed row always loses), so the drained state is
    independent of batch boundaries and delivery order.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    cols = ["issue_id", "created_at", "closed_at", "priority_tier", "component"]
    batch = batch_df.select(*cols)
    merged = batch if existing is None else existing.select(*cols).unionByName(batch)
    w = Window.partitionBy("issue_id").orderBy(
        F.col("closed_at").isNotNull().desc(),
        F.col("closed_at").desc_nulls_last(),
        F.col("created_at").desc_nulls_last(),
    )
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_sla_keyed_maintenance(
    issues: DataFrame, path: str, checkpoint: str
):
    """D20: redelivery-tolerant SLA maintenance (ADVICE r4) — the
    at-least-once twin of D18. D18 folds an ADDITIVE core with no
    issue_id, so an issue delivered open and redelivered closed
    double-counts and nothing can detect it. Here the stored state
    is instead the latest-known PER-ISSUE silver snapshot (retract-
    and-replace keyed on issue_id via
    ``sla_issue_snapshot_merge``), under the same exactly-once
    versioned-commit protocol; the serving mart is derived at read
    time with ``sla_finalize(sla_core(read_mart(...)))``.

    The trade against D18 is explicit: state and read-time
    aggregation are O(issues) instead of O(months x components) —
    the price of tolerating an upstream that redelivers. At scale,
    compact by freezing settled months: fold rows older than the
    redelivery horizon into a frozen additive core and keep only
    the live tail keyed. Returns the started query.
    """

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=sla_issue_snapshot_merge)

    return (
        issues.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_block_index_maintenance(
    docs: DataFrame, path: str, checkpoint: str, block_tokens: int = 10
):
    """D19: streaming maintenance of the exact-substring dedup INDEX
    (``operators.dedup.block_first_index``: block hash -> globally
    first (doc_id, pos) + occurrence count). Both measures merge
    associatively — first-occurrence is a MIN over (doc_id, pos)
    structs, counts are sums — so each micro-batch's index folds
    into the stored one under the exactly-once versioned-commit
    protocol and the drained state equals the batch index over every
    document ingested, regardless of arrival order or replays. This
    is the state a streaming corpus ingest keeps to dedup incoming
    documents against EVERYTHING already ingested without rescanning
    history; the per-document rewrite (cleaned text) stays a batch
    read over the index. Read with read_mart. Returns the query.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import block_first_index

    def merge(existing, batch_df):
        delta = block_first_index(batch_df, k=block_tokens)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("h")
            .agg(
                F.min(F.struct("first_doc_id", "first_pos")).alias("keep"),
                F.sum("n_occurrences").cast("long").alias("n_occurrences"),
            )
            .select(
                "h",
                F.col("keep.first_doc_id").alias("first_doc_id"),
                F.col("keep.first_pos").alias("first_pos"),
                "n_occurrences",
            )
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_hll_maintenance(docs: DataFrame, path: str, checkpoint: str):
    """D22 (r5): streaming HyperLogLog register maintenance — each
    micro-batch's per-source register table (``sketches.
    hll_registers``) folds into the stored state by per-register MAX.
    Max is associative, commutative, AND idempotent, which makes this
    the one sketch in the family that stays exactly correct even
    under at-least-once redelivery: refolding the same batch cannot
    move a register (the property D18/D20 document for the SLA mart
    is bought here for free). Exactly-once versioned-commit protocol
    as elsewhere; after draining, the state equals the batch
    ``hll_registers`` over every ingested document and the distinct
    estimate reads out via ``sketches.hll_estimate`` with no history
    rescan. Returns the started query."""
    from pyspark.sql import functions as F

    from ..operators.sketches import hll_registers

    def merge(existing, batch_df):
        delta = hll_registers(batch_df)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("source", "register")
            .agg(F.max("rho").cast("int").alias("rho"))
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_quantile_sketch_maintenance(
    lineitem: DataFrame, path: str, checkpoint: str, bin_cents: int = 10_000
):
    """D23 (r5): streaming equi-width quantile-sketch maintenance —
    each micro-batch's price bin counts (``sketches.
    price_bin_counts``) fold into the stored histogram by cell-wise
    SUM (purely additive, like the CMS), under the exactly-once
    versioned-commit protocol. After draining, the state equals the
    batch histogram over all rows, and any quantile's bin bounds read
    out of the BOUNDED state via ``sketches.quantile_bins_finalize``
    — the p50/p90/p99 a latency/price dashboard keeps per stream
    without sorting history. The batch twin's exact drill-in is the
    offline audit; the stream serves from the sketch alone. Returns
    the started query."""
    from pyspark.sql import functions as F

    from ..operators.sketches import price_bin_counts

    def merge(existing, batch_df):
        delta = price_bin_counts(batch_df, bin_cents=bin_cents)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("bin")
            .agg(F.sum("n").cast("long").alias("n"))
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        lineitem.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_lsh_postings_maintenance(
    docs: DataFrame, path: str, checkpoint: str, num_hashes: int = 12, bands: int = 4
):
    """D24 (r5): streaming MinHash-LSH postings INDEX maintenance —
    each micro-batch's banded postings (``dedup.lsh_postings``:
    (doc_id, band_id, band_key), bit-identical to the batch candidate
    stage's banding) fold into the stored index by union + distinct.
    A posting row is pure idempotent state, so like D22 the fold
    survives at-least-once redelivery with no dedup bookkeeping.
    This is the historical side ``neardup_against_index`` probes: new
    documents join the index on (band_id, band_key) and only
    candidate pairs get exact-Jaccard verification — per-batch probe
    cost, never a corpus re-signature. The ``bucket_cap`` skew guard
    stays a QUERY-time policy (the prober derives bucket counts from
    the index), so one maintained index serves any cap. Drained ==
    batch ``lsh_postings`` over all documents (tested, redelivery
    included). Returns the started query."""

    def merge(existing, batch_df):
        delta = lsh_postings_delta(batch_df, num_hashes=num_hashes, bands=bands)
        if existing is None:
            return delta.dropDuplicates(["doc_id", "band_id", "band_key"])
        return existing.unionByName(delta).dropDuplicates(
            ["doc_id", "band_id", "band_key"]
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def lsh_postings_delta(batch_df: DataFrame, num_hashes: int = 12, bands: int = 4):
    from ..operators.dedup import lsh_postings

    return lsh_postings(batch_df, num_hashes=num_hashes, bands=bands)


def stream_benford_maintenance(orders: DataFrame, path: str, checkpoint: str):
    """D25 (r5): streaming Benford digit-count maintenance — each
    micro-batch's first-significant-digit counts over order totals
    fold into the stored 9-row table by ADDITIVE SUM, under the
    exactly-once versioned-commit protocol. The drained state equals
    the batch digit histogram over every order ingested, and the
    Benford conformance verdict (``operators.statistics.
    benford_first_digit``'s obs-vs-expected chi-square) reads out of
    the 9-row state at any time — the fraud/data-quality screen a
    100 TB feed keeps per stream without rescanning history. Digits
    come from the cents-integer string exactly like the batch twin.
    Returns the started query."""
    from pyspark.sql import functions as F

    def digit_counts(batch_df: DataFrame) -> DataFrame:
        cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        return (
            batch_df.select(
                F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit")
            )
            .groupBy("digit")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    def merge(existing, batch_df):
        delta = digit_counts(batch_df)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("digit")
            .agg(F.sum("n").cast("long").alias("n"))
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        orders.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_vocab_first_seen_maintenance(
    docs: DataFrame, path: str, checkpoint: str, bucket_width: int = 50
):
    """D26 (r5): streaming vocabulary first-occurrence maintenance —
    each micro-batch's (term, min ingest bucket) pairs fold into the
    stored table by per-term MIN. Min is associative, commutative,
    AND idempotent (like the HLL registers), so the state is exactly
    correct even under at-least-once redelivery. The drained state
    equals the batch first-occurrence map, and the Heaps'-law growth
    curve (``operators.text6.vocab_growth_curve``'s new-term counts
    and cumulative vocabulary) reads out of the vocabulary-sized
    state at any time — the saturation readout a live acquisition
    pipeline watches to decide when a source stops paying for itself.
    Returns the started query."""
    from pyspark.sql import functions as F

    from ..functions.textfns import norm_tokens

    def first_seen(batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(
                F.expr(f"doc_id DIV {bucket_width}").alias("bucket"),
                F.explode(norm_tokens(F.col("text"))).alias("term"),
            )
            .groupBy("term")
            .agg(F.min("bucket").cast("long").alias("bucket"))
        )

    def merge(existing, batch_df):
        delta = first_seen(batch_df)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("term")
            .agg(F.min("bucket").cast("long").alias("bucket"))
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_user_span_maintenance(events: DataFrame, path: str, checkpoint: str):
    """D27 (r5): streaming per-user activity-span maintenance — each
    micro-batch folds (user_id, first day, last day) into the stored
    state by per-user MIN/MAX. Both folds are associative,
    commutative AND idempotent, so the state survives at-least-once
    redelivery exactly (the HLL-register property). The drained state
    is the per-user lifetime table the survival curve (B114
    ``user_survival_curve``) and growth accounting read — a 100 TB
    event stream keeps O(users) rows and answers "survival at week
    k" at any time with zero event rescans. Read with read_mart.
    Returns the started query."""
    from pyspark.sql import functions as F

    def spans(batch_df: DataFrame) -> DataFrame:
        return batch_df.groupBy("user_id").agg(
            F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1")
        )

    def merge(existing, batch_df):
        delta = spans(batch_df)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("user_id")
            .agg(F.min("d0").alias("d0"), F.max("d1").alias("d1"))
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def transition_merge(existing: DataFrame | None, batch_df: DataFrame) -> DataFrame:
    """D28 (r5) merge: fold one micro-batch of events into the
    combined Markov-transition state — transition counts PLUS the
    per-user cursor that makes counting exact ACROSS batches.

    State encoding (one mart, one atomic commit — the cursor and the
    counts must never diverge): rows with ``kind = 'u'`` carry the
    per-user cursor (last event's ts, event_id, type under the batch
    twin's (ts, event_id) order); rows with ``kind = 't'`` carry
    (from_type, to_type, n).

    Fold: intra-batch transitions come from the same LAG window as
    the batch op (`relational3.event_transitions`); each user's FIRST
    batch event pairs with the stored cursor for the cross-batch
    boundary transition; the new cursor is the later of (stored,
    batch-last) by (ts, event_id). Counts fold additively.

    Contract: exact equality with the batch op requires per-user
    EVENT-TIME-ORDERED arrival (a batch may not contain events older
    than a user's cursor) — the same in-order contract as D18's
    additive core, documented rather than enforced; with out-of-order
    feeds, counts follow ARRIVAL order. Replay safety comes from the
    exactly-once commit protocol, not the fold (additive counts are
    not idempotent), exactly like D25.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lagged = batch_df.select(
        "user_id",
        "ts",
        "event_id",
        F.col("event_type"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.row_number().over(w).alias("rn_asc"),
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_desc"),
    )
    intra = (
        lagged.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    batch_last = lagged.filter(F.col("rn_desc") == 1).select(
        "user_id",
        F.col("ts").alias("last_ts"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_type"),
    )

    def as_state(users: DataFrame, trans: DataFrame) -> DataFrame:
        u = users.select(
            F.lit("u").alias("kind"),
            "user_id",
            "last_ts",
            "last_event_id",
            "last_type",
            F.lit(None).cast("string").alias("from_type"),
            F.lit(None).cast("string").alias("to_type"),
            F.lit(None).cast("long").alias("n"),
        )
        t = trans.select(
            F.lit("t").alias("kind"),
            F.lit(None).cast("long").alias("user_id"),
            F.lit(None).cast("timestamp").alias("last_ts"),
            F.lit(None).cast("long").alias("last_event_id"),
            F.lit(None).cast("string").alias("last_type"),
            "from_type",
            "to_type",
            "n",
        )
        return u.unionByName(t)

    if existing is None:
        return as_state(batch_last, intra)

    ex_users = existing.filter(F.col("kind") == "u").select(
        "user_id", "last_ts", "last_event_id", "last_type"
    )
    ex_trans = existing.filter(F.col("kind") == "t").select(
        "from_type", "to_type", "n"
    )
    boundary = (
        lagged.filter(F.col("rn_asc") == 1)
        .join(ex_users, "user_id")
        .groupBy(
            F.col("last_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    new_trans = (
        ex_trans.unionByName(intra)
        .unionByName(boundary)
        .groupBy("from_type", "to_type")
        .agg(F.sum("n").cast("long").alias("n"))
    )
    # cursor: later of stored vs batch-last by (ts, event_id)
    merged_users = (
        ex_users.unionByName(batch_last)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("last_ts"), F.desc("last_event_id")
                )
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return as_state(merged_users, new_trans)


def transition_finalize(state: DataFrame) -> DataFrame:
    """Serve the Markov transition mart from D28 state: counts plus
    the per-from-state outgoing share — the batch
    `event_transitions` output, read from bounded state with no
    event rescan."""
    from pyspark.sql import Window

    from ..operators.relational import r6

    counts = state.filter(F.col("kind") == "t").select("from_type", "to_type", "n")
    tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        r6(F.col("n") / F.sum("n").over(tot)).alias("share"),
    )


def stream_transition_maintenance(events: DataFrame, path: str, checkpoint: str):
    """D28 (r5): streaming Markov transition-count maintenance — the
    live feed for the event-sequence analytics family
    (`event_transitions`, `event_entropy_rate`,
    `markov_stationary_events`): per micro-batch, fold intra-batch
    transitions, the cross-batch boundary transition via the per-user
    cursor, and the updated cursors, in ONE atomic exactly-once
    commit (`transition_merge`). State is O(users + event_types^2) —
    never a history rescan. Returns the started query."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=transition_merge)

    return (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_sample_maintenance(
    docs: DataFrame, path: str, checkpoint: str, per_stratum: int = 10
):
    """D29: streaming uniform-sample maintenance — each micro-batch's
    per-source bottom-k md5 sample (``bottomk_sample_state``, the
    exact fold form of the batch ``sample_stratified``) merges into
    the stored state by union -> dedup on (source, doc_id) -> re-take
    k smallest. Min-k union is associative and order-insensitive, and
    the doc_id dedup makes the fold IDEMPOTENT, so the state is
    exactly correct even under at-least-once redelivery with no
    batch-id guard needed (the exactly-once commit protocol still
    wraps it). After draining, the state equals the batch
    ``sample_stratified`` over every ingested document — a live,
    bias-free inspection sample a 100 TB ingest keeps per stream at
    O(k x sources) state with zero history rescans. Read with
    ``read_mart``. Returns the started query."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ..operators.scale import bottomk_sample_state

    def merge(existing, batch_df):
        delta = bottomk_sample_state(batch_df, per_stratum)
        if existing is None:
            return delta
        w = Window.partitionBy("source").orderBy(
            F.col("h").asc(), F.col("doc_id").asc()
        )
        return (
            existing.unionByName(delta)
            .dropDuplicates(["source", "doc_id"])
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= per_stratum)
            .select("source", F.col("rk").cast("long").alias("rk"), "doc_id", "h")
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_reconciliation_maintenance(
    lineitems: DataFrame, path: str, checkpoint: str
):
    """D30: streaming order-total reconciliation maintenance — each
    micro-batch of LINE ITEMS folds into the stored per-order invoice
    recompute state by keyed SUM (`order_line_recompute` is additive
    over line subsets: an order's lines may arrive across any number
    of batches and the state still converges to the full recompute;
    exactly-once per batch via the commit protocol — the additive
    core is NOT idempotent under redelivery, same contract class as
    the D13 CMS counters). The serving mart (B128's per-priority
    gap/match table) is derived at read time by
    ``quality_checks.reconciliation_finalize`` against the orders
    header table — headers are never part of the fold, so late or
    restated headers are picked up on the next read with zero state
    surgery. State is O(orders) key-grain, read with ``read_mart``.
    Returns the started query."""
    from pyspark.sql import functions as F

    from ..operators.quality_checks import order_line_recompute

    def merge(existing, batch_df):
        delta = order_line_recompute(batch_df)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("l_orderkey")
            .agg(F.sum("recompute_e4").cast("long").alias("recompute_e4"))
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        lineitems.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_checksum_maintenance(docs: DataFrame, path: str, checkpoint: str):
    """D31: streaming content-checksum maintenance — each micro-batch
    of documents folds its (row count, XOR of 60-bit row signatures)
    into the stored manifest line (the `table_checksum_manifest`
    'documents' signature exactly). XOR is associative, commutative
    and self-inverse, so the merge is one BIGINT op and never
    overflows; exactly-once per batch via the commit protocol (XOR is
    not idempotent — a replayed row would cancel itself — which is
    precisely what the batch_id guard exists for, the D13 contract
    class). After draining, the state equals the batch manifest row,
    so a replica/restore can be signed off against the live ingest
    without rescanning history. Read with ``read_mart``."""
    from pyspark.sql import functions as F

    from ..operators.quality_checks import _row_sig

    def manifest(batch_df):
        return batch_df.select(
            _row_sig("d", F.col("doc_id"), F.md5(F.col("text"))).alias("sig")
        ).agg(
            F.lit("documents").alias("table_name"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.expr("coalesce(bit_xor(sig), 0)").cast("long").alias("xor_checksum"),
        )

    def merge(existing, batch_df):
        delta = manifest(batch_df)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("table_name")
            .agg(
                F.sum("n_rows").cast("long").alias("n_rows"),
                F.expr("coalesce(bit_xor(xor_checksum), 0)").cast("long").alias("xor_checksum"),
            )
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def freshness_merge(existing, batch_df):
    """D32 merge: count by SUM (additive), span fields by MIN/MAX
    (idempotent) — module-level so the replay tests can drive it
    directly past the batch_id guard."""
    from pyspark.sql import functions as F

    delta = batch_df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.min(F.to_date("ts")).alias("first_day"),
        F.max(F.to_date("ts")).alias("last_day"),
        F.max(F.unix_micros("ts")).cast("long").alias("last_us"),
    )
    if existing is None:
        return delta
    return (
        existing.unionByName(delta)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.min("first_day").alias("first_day"),
            F.max("last_day").alias("last_day"),
            F.max("last_us").cast("long").alias("last_us"),
        )
    )


def stream_freshness_maintenance(events: DataFrame, path: str, checkpoint: str):
    """D32 (r6): streaming data-freshness maintenance — each
    micro-batch folds into a per-type (n_events, first_day, last_day,
    last_us) state table: the count merges by SUM (additive — the
    exactly-once batch_id guard's job), the span fields by MIN/MAX
    (idempotent: re-folding the same batch cannot move a min or max,
    so the staleness readout survives at-least-once redelivery even
    without the guard). After draining, ``freshness_from_state`` over
    the committed state equals the batch ``event_freshness_mart`` —
    the ingest-health alarm runs on O(types) state with zero history
    rescans. Returns the started query."""
    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=freshness_merge)

    return (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def freshness_from_state(state: DataFrame, stale_days: int = 7) -> DataFrame:
    """Freshness readout over the D32 state table: identical algebra
    to the batch ``event_freshness_mart`` (exact-microsecond staleness
    vs the state's own max, inclusive-day e2 rate, stale flag) — the
    two must agree after a drain, which the D32 test asserts."""
    from pyspark.sql import functions as F

    corpus = state.agg(F.max("last_us").cast("long").alias("corpus_max_us"))
    stale_us = F.lit(stale_days) * F.lit(86_400_000_000)
    return (
        state.crossJoin(F.broadcast(corpus))
        .select(
            "event_type",
            "n_events",
            "first_day",
            "last_day",
            (F.col("corpus_max_us") - F.col("last_us")).cast("long").alias("staleness_us"),
            F.expr(
                "CAST(n_events * 100 DIV (datediff(last_day, first_day) + 1) AS BIGINT)"
            ).alias("events_per_day_e2"),
            ((F.col("corpus_max_us") - F.col("last_us")) > stale_us).alias("is_stale"),
        )
        .orderBy("event_type")
    )


def stream_embedding_bands_maintenance(
    vecs: DataFrame,
    path: str,
    checkpoint: str,
    n_planes: int = 48,
    bands: int = 8,
    dim: int = 64,
):
    """D35 (r7): streaming maintenance of the EMBEDDING band-postings
    INDEX — each micro-batch's (vec_id, band_id, band_val) hyperplane
    postings (``similarity.embedding_band_postings``, bit-identical
    to the C146 batch candidate stage's keys) fold into the stored
    index by union + distinct. A posting row is pure idempotent
    state, so the fold survives at-least-once redelivery with no
    dedup bookkeeping (the D24 class, mirrored from the shingle side
    onto the embedding side). This is the historical side an
    incremental embedding probe joins: new vectors' postings
    equi-join the index on (band_id, band_val), and only the
    candidate pairs get exact-cosine verification against the stored
    embeddings table — per-batch probe cost, never a corpus
    re-banding (the C104/C105 incremental contract; see the
    drain==batch + probe-equivalence test). ``bucket_cap`` stays a
    QUERY-time policy, derived from index bucket counts. Read with
    read_mart. Returns the started query."""

    def merge(existing, batch_df):
        delta = embedding_bands_delta(batch_df, n_planes, bands, dim)
        if existing is None:
            return delta.dropDuplicates(["vec_id", "band_id", "band_val"])
        return existing.unionByName(delta).dropDuplicates(
            ["vec_id", "band_id", "band_val"]
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        vecs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def embedding_bands_delta(
    batch_df: DataFrame, n_planes: int = 48, bands: int = 8, dim: int = 64
):
    from ..operators.similarity import embedding_band_postings

    return embedding_band_postings(batch_df, n_planes, bands, dim)


def stream_stitch_index_maintenance(
    docs: DataFrame, path: str, checkpoint: str, k: int = 2
):
    """D34 (r6): streaming maintenance of the chunk-stitch INDEX —
    one (doc_id, head_h, tail_h) fingerprint row per ingested doc
    (``operators.dedup.head_tail_fingerprints``). Rows are IDEMPOTENT
    keyed state: re-fingerprinting the same doc yields the same
    single row, so the merge is union + keyed dedup and the index is
    exact under at-least-once redelivery even without the batch_id
    guard (the D24/D26 idempotent-state class). The drained state
    equals the batch fingerprints over every doc ingested; an ingest
    gate probes incoming batches against it (``stitch_against_index``
    semantics) with cost proportional to the BATCH, never the corpus.
    Read with read_mart. Returns the query."""
    from pyspark.sql import functions as F

    from ..operators.dedup import head_tail_fingerprints

    def merge(existing, batch_df):
        delta = head_tail_fingerprints(batch_df, k)
        if existing is None:
            return delta.dropDuplicates(["doc_id"])
        return (
            existing.unionByName(delta)
            .groupBy("doc_id")
            .agg(
                F.min("head_h").alias("head_h"),
                F.min("tail_h").alias("tail_h"),
            )
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# Staging parquet dirs already written by THIS process, keyed by the
# caller's stage_key: bench/driver passes invoke each readout several
# times (warmup + best-of-N) and B135/B136 share one events staging —
# the corpus-scale write is input prep, not part of the protocol under
# measurement, so paying it once per (process, key) is honest
# (VERDICT r8 task 3). Pid-scoped dirs keep concurrent sessions apart.
_STAGING_CACHE: dict = {}


def _pid_alive(pid: int) -> bool:
    """Portable liveness probe (ADVICE r8): /proc only exists on
    Linux — probing it elsewhere calls every other session's dir dead
    and rmtree's it mid-run. EPERM means the pid exists but belongs
    to another user: alive. A numeric suffix above pid_t max (e.g. a
    legacy all-digit hash suffix) is not a pid at all — os.kill would
    raise OverflowError and crash the sweep (ADVICE r9); treat it as
    dead so the foreign dir is reclaimed instead."""
    import os

    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except (OverflowError, ValueError):
        return False
    return True


def _sweep_dead_dirs() -> None:
    """Reclaim corpus-scale tmp dirs left by DEAD processes (a fresh
    pid never matches an old dir, so without this every finished
    bench/test/driver process would leak its staging copy in /tmp).
    Covers the pid-suffixed readout/staging layouts, stress-run dirs
    (tools/stress.py uses the same <name>_<mult>_<pid> shape), and —
    one-time upgrade path (ADVICE r8) — pre-r8 ``sgl_readout_<hash>``
    dirs whose suffix is not a digit pid."""
    import glob
    import os
    import shutil
    import tempfile

    tmp = tempfile.gettempdir()
    for pattern in ("sgl_readout_*", "sgl_stage_*", "stress_readout_*"):
        for stale in glob.glob(os.path.join(tmp, pattern)):
            suffix = stale.rsplit("_", 1)[-1]
            if suffix.isdigit():
                if not _pid_alive(int(suffix)):
                    shutil.rmtree(stale, ignore_errors=True)
            elif pattern == "sgl_readout_*":
                # old fixed-name layout (no pid): no owner to probe,
                # reclaim unconditionally
                shutil.rmtree(stale, ignore_errors=True)


def _stage_and_drain(
    spark,
    df,
    tag: str,
    maintain,
    n_files: int = 8,
    timeout: int = 600,
    stage_key: str | None = None,
    ordered_on: str | None = None,
    drain_partitions: int = 8,
):
    """Shared readout plumbing (r8): stage a batch table as a file
    stream (``n_files`` part files -> that many micro-batches via
    maxFilesPerTrigger=1), drain it through ``maintain(stream, path,
    checkpoint)`` into a CLEAN run dir (md5-keyed by ``tag`` PLUS the
    pid, so two concurrent sessions running the same key — e.g. the
    test suite beside a bench — can never race each other's
    rmtree/write), and return the committed state table. Every B13x
    streaming readout key rides this, so the driver gate exercises
    the real D-op fold protocol + a committed-state read per call.

    The staging WRITE is cached per (process, ``stage_key``): repeat
    invocations — and keys that consume the same frame, like
    B135/B136 over events — reuse one on-disk copy instead of
    re-writing the corpus per call (r8 paid 4 independent staging
    writes per bench pass; 3 were redundant). The DRAIN always runs
    fresh: the mart/checkpoint dirs are wiped per call, so every
    invocation still pays the full micro-batch fold protocol."""
    import hashlib
    import os
    import shutil
    import tempfile

    _sweep_dead_dirs()

    pid = os.getpid()
    skey = stage_key or tag
    # the cached path is only valid for the exact staged layout: a
    # future caller reusing a stage_key with a different frame shape,
    # file count, or ordering would silently drain the FIRST caller's
    # files (ADVICE r9) — fingerprint the layout and fail loudly on a
    # mismatched reuse instead
    fprint = (df.schema.simpleString(), n_files, ordered_on)
    cached = _STAGING_CACHE.get(skey)
    staging = None
    if cached is not None:
        staging, cached_fp = cached
        if cached_fp != fprint:
            raise ValueError(
                f"_stage_and_drain: stage_key {skey!r} reused with a "
                f"different layout (cached {cached_fp}, got {fprint}) — "
                "use a distinct stage_key per staged frame shape"
            )
    if staging is None or not os.path.isdir(staging):
        staging = os.path.join(
            tempfile.gettempdir(),
            "sgl_stage_" + hashlib.md5(skey.encode()).hexdigest()[:12] + f"_{pid}",
        )
        shutil.rmtree(staging, ignore_errors=True)
        if ordered_on is not None:
            # time-range staging: file k holds the k-th time range,
            # sorted within, and mtimes are bumped in range order so
            # the file source's (mtime, path) pickup order IS event-
            # time order — the arrival contract keyed-state ops like
            # gap sessionization assume (a later batch must not carry
            # earlier events, or the open-session state would be
            # extended backwards). Additive/idempotent folds don't
            # care; order-sensitive ones require ordered_on.
            import glob
            import time

            (
                df.repartitionByRange(n_files, F.col(ordered_on))
                .sortWithinPartitions(ordered_on)
                .write.mode("overwrite")
                .parquet(staging)
            )
            now = time.time()
            for i, part in enumerate(
                sorted(glob.glob(os.path.join(staging, "part-*")))
            ):
                os.utime(part, (now + 2 * i, now + 2 * i))
        else:
            df.repartition(n_files).write.mode("overwrite").parquet(staging)
        _STAGING_CACHE[skey] = (staging, fprint)

    base = os.path.join(
        tempfile.gettempdir(),
        "sgl_readout_" + hashlib.md5(tag.encode()).hexdigest()[:12] + f"_{pid}",
    )
    shutil.rmtree(base, ignore_errors=True)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staging)
    )
    mart_path = os.path.join(base, "mart")
    # Pin the drain's shuffle/state partitioning to the readout's
    # actual key cardinality class (O(types)/O(users)/O(orders) keyed
    # state, never millions of keys) instead of the session default:
    # each stateful micro-batch pays task + state-store-commit
    # overhead PER PARTITION PER BATCH, so a plain driver session's
    # 200 partitions x 8 batches is ~1600 near-empty state commits
    # for a 150-key state. Partition count is fixed at the query's
    # first checkpoint; the checkpoint here is fresh per call, and
    # the conf is restored before any batch query runs. At real
    # scale this is the same sizing rule, just with a bigger number:
    # state partitions track key cardinality / executor count, not
    # the global shuffle default.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(drain_partitions))
    try:
        q = maintain(stream, mart_path, os.path.join(base, "ckpt"))
        if not q.awaitTermination(timeout):
            q.stop()
            raise RuntimeError(f"{tag}: streaming drain timed out")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    state = read_mart(spark, mart_path)
    if state is None:
        raise RuntimeError(f"{tag}: no committed mart version")
    return state


def stream_daily_anomaly_readout(
    spark,
    sf_dir: str,
    trailing_days: int = 14,
    min_trailing: int = 7,
    thresh_e3: int = 3000,
) -> DataFrame:
    """B135 — D33 as a driver-checkable batch surface (VERDICT r7
    task 8): run the incrementally maintained daily mart END-TO-END —
    stage the events table as a file stream, fold it micro-batch by
    micro-batch through ``stream_mart_maintenance`` (D12's
    exactly-once versioned-commit protocol), then compute the robust
    MAD alarm (``mad_anomaly_from_counts``, B130's algebra) over the
    COMMITTED mart. Equals batch ``mad_anomaly_events`` exactly — the
    drain-equals-batch identity tests/test_streaming.py proves, here
    registered with the same DuckDB oracle so the driver's hash gate
    covers the streaming tier.

    Determinism: the mart is additive at (event_type, day) grain, so
    micro-batch boundaries and partition order cannot move a count.

    Plan/scale: one corpus-scale staging write + one aggregate per
    micro-batch sized by THAT batch (never a history rescan —
    merge_mart_increment merges two day-grain aggregates); the alarm
    reads O(days x types) committed state.
    """
    import os

    from ..operators.timeseries import mad_anomaly_from_counts
    from ..sources.registry import load_table

    # stage only the columns the D12 fold reads (ts/event_type/value)
    # — the corpus-scale staging write is the readout's dominant cost
    # and the pruned schema cannot change the drained mart; the
    # staging is SHARED with B136 (same frame, one on-disk copy per
    # process — VERDICT r8 task 3)
    events = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    mart = _stage_and_drain(
        spark,
        events,
        f"d33:{os.path.abspath(sf_dir)}",
        stream_mart_maintenance,
        stage_key=f"events3:{os.path.abspath(sf_dir)}",
    )
    daily = mart.select("event_type", F.to_date("day").alias("day"), "n_events")
    return mad_anomaly_from_counts(daily, trailing_days, min_trailing, thresh_e3)


def stream_freshness_readout(spark, sf_dir: str, stale_days: int = 7) -> DataFrame:
    """B136 (r8) — D32 as a driver-checkable surface: drain the events
    stream through ``stream_freshness_maintenance`` (count by SUM
    behind the exactly-once guard; span fields by idempotent MIN/MAX)
    and assemble the staleness readout from the committed O(types)
    state. Equals batch ``event_freshness_mart`` exactly (the D32
    drain==batch test), so it registers with B132's oracle verbatim.
    """
    import os

    from ..sources.registry import load_table

    # staged frame is deliberately B135's (ts/event_type/value) so the
    # two readouts share ONE staging copy per process; the D32 fold
    # aggregates by event_type and never reads the extra value column,
    # so the drained state is unchanged (VERDICT r8 task 3)
    events = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    state = _stage_and_drain(
        spark,
        events,
        f"d32:{os.path.abspath(sf_dir)}",
        stream_freshness_maintenance,
        stage_key=f"events3:{os.path.abspath(sf_dir)}",
    )
    return freshness_from_state(state, stale_days)


def stream_reconciliation_readout(spark, sf_dir: str) -> DataFrame:
    """B137 (r8) — D30 as a driver-checkable surface: fold LINE ITEMS
    through ``stream_reconciliation_maintenance`` (per-order invoice
    recompute state, additive over line subsets — an order's lines
    may arrive across any number of micro-batches) and derive B128's
    per-priority gap/match mart at read time against the orders
    header table (headers never enter the fold; late/restated headers
    are picked up on the next read with zero state surgery). Equals
    batch ``order_total_reconciliation`` exactly (the D30 test), so
    it registers with B128's oracle verbatim.
    """
    import os

    from ..operators.quality_checks import reconciliation_finalize
    from ..sources.registry import load_table

    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    )
    state = _stage_and_drain(
        spark,
        lineitem,
        f"d30:{os.path.abspath(sf_dir)}",
        stream_reconciliation_maintenance,
        stage_key=f"lineitem4:{os.path.abspath(sf_dir)}",
    )
    orders = load_table(spark, sf_dir, "orders")
    return reconciliation_finalize(spark, orders, state)


def stream_dedup_index_readout(
    spark,
    sf_dir: str,
    block_tokens: int = 10,
    old_permille: int = 800,
    dup_threshold_ppm: int = 500_000,
) -> DataFrame:
    """B138 (r8) — D19 as a driver-checkable surface, closing the
    loop on the INDEX side of the incremental-dedup contract: the
    already-ingested corpus (C104's md5 permille old split) is drained
    micro-batch by micro-batch through ``stream_block_index_maintenance``
    (block-hash index folds by MIN-first-occurrence + SUM-count under
    the exactly-once versioned-commit protocol), and the new batch is
    screened against the COMMITTED index with ``block_index_probe`` —
    the exact decision algebra ``dedup_against_index`` runs against
    its batch-built index. Drained index == batch index over the old
    split (the D19 drain==batch test), and the probe reads only the
    distinct hash column, so the readout equals batch C104 exactly
    and registers with its DuckDB oracle verbatim.

    This is the production shape at 100 TB: the index is maintained
    state, never rebuilt; each arriving batch pays one probe join
    sized by the BATCH. The other three readouts (B135-B137) cover
    the additive-mart folds; this one covers the idempotent-index
    class that the dedup tier rides (D19, and by the same protocol
    D24/D34/D35).
    """
    import os

    from functools import partial

    from ..operators.dedup import _split_bucket, block_index_probe
    from ..sources.registry import load_table

    d = load_table(spark, sf_dir, "documents")
    bucket = _split_bucket(F.col("doc_id"), "#ingest")
    old_docs = d.filter(bucket < old_permille).select("doc_id", "source", "text")
    new_docs = d.filter(bucket >= old_permille)
    index = _stage_and_drain(
        spark,
        old_docs,
        f"d19:{os.path.abspath(sf_dir)}",
        partial(stream_block_index_maintenance, block_tokens=block_tokens),
        stage_key=f"docs_old{old_permille}:{os.path.abspath(sf_dir)}",
    )
    return block_index_probe(new_docs, index, block_tokens, dup_threshold_ppm)


SESSION_US_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)

SESSION_US_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_value", T.DoubleType()),
    ]
)


def sessionize_flush_stream(events_us: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Keyed-state gap sessionization at MICROSECOND precision — the
    driver-readout twin of D2's ``sessionize_stream`` (which keeps
    the original ms-grain tested contract). Differences, both forced
    by the batch-equality requirement (since ADVICE r9 batch
    ``sessionize_events`` compares gaps as ``unix_micros`` int64 and
    the DuckDB oracle as ``epoch_us`` — the same exact-µs strict->
    tie rule as this fold and the native session_window drain):

    - input is ``(user_id, ts_us, value)`` with ts_us = unix_micros
      computed JVM-side, so no pandas-timestamp timezone conversion
      can shift a boundary (the driver builds a PLAIN SparkSession —
      session tz is not ours to assume);
    - NoTimeout: a completed session is emitted only when a LATER
      event proves the gap (processing-time timeouts would split
      sessions nondeterministically mid-drain). The caller flushes
      the final open session per user with a sentinel event strictly
      more than one gap after the corpus max ts; the sentinel's own
      1-event session stays in state, never emitted.

    Requires per-user time-ordered arrival ACROSS micro-batches
    (``_stage_and_drain(ordered_on=...)``'s contract): a batch is
    vector-sessionized with numpy (no per-row python), the first
    segment merges into the open state, every segment a gap closed
    is emitted, and the trailing segment becomes the new state.
    """
    import numpy as np

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs))
        if not len(rows):
            return
        rows = rows.sort_values("ts_us")
        ts = rows["ts_us"].to_numpy(dtype="int64")
        # null values must not poison the numpy fold: SQL SUM (batch
        # F.sum and the DuckDB oracle) SKIPS nulls, while a NaN in a
        # reduceat propagates (ADVICE r9) — fillna(0.0) matches SUM
        # for any session with >=1 non-null value (the testdata
        # contract; an all-null session would be 0.0 here vs SQL NULL)
        vals = rows["value"].fillna(0.0).to_numpy(dtype="float64")

        prev = np.empty_like(ts)
        prev[1:] = ts[:-1]
        if state.exists:
            s_start, s_end, s_n, s_val = state.get
            prev[0] = s_end
        else:
            prev[0] = ts[0]  # overwritten below: row 0 opens a session
        starts = (ts - prev) > gap_us
        if not state.exists:
            starts[0] = True
        seg_idx = np.flatnonzero(starts)

        # ordered session segments: the open state session (extended
        # by any prefix rows that continue it) first, then each new
        # segment; all but the last are gap-closed -> emit, the last
        # becomes the new open state
        sessions = []
        if state.exists:
            ext = int(seg_idx[0]) if len(seg_idx) else len(ts)
            if ext:
                s_end = int(ts[ext - 1])
                s_n += ext
                s_val += float(vals[:ext].sum())
            sessions.append((s_start, s_end, s_n, s_val))
        if len(seg_idx):
            sums = np.add.reduceat(vals, seg_idx)
            bounds = np.append(seg_idx, len(ts))
            for k in range(len(seg_idx)):
                a, b = int(bounds[k]), int(bounds[k + 1])
                sessions.append(
                    (int(ts[a]), int(ts[b - 1]), b - a, float(sums[k]))
                )

        *done, keep = sessions
        state.update((int(keep[0]), int(keep[1]), int(keep[2]), float(keep[3])))
        if done:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(done),
                    "start_us": [s for s, *_ in done],
                    "end_us": [e for _, e, *_ in done],
                    "n_events": [n for *_, n, _v in done],
                    "session_value": [v for *_, v in done],
                }
            )

    return events_us.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_US_OUTPUT_SCHEMA,
        stateStructType=SESSION_US_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_sessionize_keyed_maintenance(
    events_us: DataFrame, path: str, checkpoint: str, gap_minutes: int = 30
):
    """D2's keyed-state class under the versioned-commit protocol:
    completed sessions emitted by ``sessionize_flush_stream`` are
    APPEND-ONLY facts (a session is emitted exactly once — when the
    event proving its closing gap arrives), so the mart merge is a
    plain union. Replay safety is two-layered, matching the class:
    the state store rolls a re-executed micro-batch back to its
    pre-batch state (same sessions re-emitted), and the batch_id
    guard in ``mart_fold_batch`` drops the duplicate fold. Read with
    ``read_mart``. Returns the started query."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # emitted sessions are append-only facts: increment-only
        # version write + hardlinked prior files (r11) replaces the
        # read-union-rewrite of the whole mart every batch
        mart_fold_batch(batch_df, batch_id, path, append_only=True)

    return (
        sessionize_flush_stream(events_us, gap_minutes)
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _sessionize_staged_frame(spark, sf_dir: str, gap_minutes: int):
    """Shared B139/B140 staging input: (user_id, ts_us, value) plus
    ONE sentinel event per user strictly more than a gap after the
    corpus max ts. The sentinel provably closes every user's final
    real session during a drain; its own session stays open (keyed
    state) / its window never passes the watermark (native
    session_window), so it is never emitted. ts_us is unix_micros
    computed JVM-side so no pandas/session-tz conversion can move a
    boundary."""
    from ..sources.registry import load_table

    gap_us = gap_minutes * 60 * 1_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    max_us = e.agg(F.max("ts_us")).first()[0]  # O(1) driver scalar
    sentinels = (
        e.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.lit(max_us + gap_us + 3_600_000_000).alias("ts_us"),
            F.lit(0.0).alias("value"),
        )
    )
    return e.unionByName(sentinels)


def _ranked_session_readout(sessions: DataFrame) -> DataFrame:
    """Shared B139/B140 read: assign session_seq by start-time rank
    (a user's sessions are disjoint in time, so the rank is
    unambiguous) and format exactly like batch ``sessionize_events``
    (operators/relational.py — the B11 twin both keys register
    against)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("start_us")
    return sessions.select(
        "user_id",
        F.row_number().over(w).cast("long").alias("session_seq"),
        F.col("n_events").cast("long").alias("n_events"),
        F.date_format(F.timestamp_micros("start_us"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        F.date_format(F.timestamp_micros("end_us"), "yyyy-MM-dd HH:mm:ss").alias(
            "session_end"
        ),
        F.round("session_value", 6).alias("session_value"),
    )


def stream_sessionize_readout(
    spark, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """B139 (r9) — the keyed-state streaming class as a driver-checked
    surface (VERDICT r8 task 6): B135-B138 prove the additive-fold and
    idempotent-index contract classes; this drains events through the
    REAL ``applyInPandasWithState`` gap sessionization (D2's class)
    under the same exactly-once versioned-commit protocol and submits
    the committed sessions to batch B11's DuckDB oracle verbatim.

    Protocol: stage (user_id, unix_micros(ts), value) time-range-
    ordered (``ordered_on`` — keyed sessionization's arrival
    contract), append one sentinel event per user strictly more than
    one gap after the corpus max ts so every user's final real
    session is provably closed and emitted during the drain (the
    sentinel's own session stays in state, never emitted), fold
    emitted sessions into the union-append mart, then assign
    ``session_seq`` by start-time rank at read (sessions of one user
    are disjoint in time, so the rank is unambiguous) and format
    exactly like batch ``sessionize_events`` (operators/relational.py
    sessionize_events — the B11 twin).

    Plan/scale: state is O(users) 4-field structs; each micro-batch
    pays one Arrow-batched numpy sessionization sized by the BATCH
    (no history rescan, no per-row python); the read is O(sessions)
    with one window rank. At 100 TB the same fold runs against Kafka
    with watermark-based flush instead of a sentinel; the sentinel is
    the deterministic batch-equality form of the same close rule.
    """
    import os

    from functools import partial

    staged = _sessionize_staged_frame(spark, sf_dir, gap_minutes)
    sessions = _stage_and_drain(
        spark,
        staged,
        f"d2:{os.path.abspath(sf_dir)}:{gap_minutes}",
        partial(stream_sessionize_keyed_maintenance, gap_minutes=gap_minutes),
        stage_key=f"events_us{gap_minutes}:{os.path.abspath(sf_dir)}",
        ordered_on="ts_us",
    )
    return _ranked_session_readout(sessions)


def stream_session_window_maintenance(
    events_us: DataFrame, path: str, checkpoint: str, gap_minutes: int = 30
):
    """D8's NATIVE ``session_window`` aggregation under the
    versioned-commit protocol — the JVM-state, watermark-driven twin
    of ``stream_sessionize_keyed_maintenance``. Sessions live in the
    streaming aggregation operator's state store (merged and evicted
    JVM-side); append mode emits a session only when the watermark
    passes its window end, so emitted rows are final by the engine's
    own late-data contract rather than a gap-proving event in user
    code. Watermark delay is 0: the staged input is time-ordered by
    construction (``ordered_on``), so there is no late data to
    tolerate and every real window closes as soon as the sentinel
    advances event time past it.

    Emitted rows are append-only facts (a window passes the
    watermark exactly once), so the mart merge is the same union +
    batch_id-guard shape as the keyed-state fold. The output maps
    ``session_window``'s [first_ts, last_ts + gap) frame back to B11
    grain: start_us = window.start, end_us = window.end - gap (the
    last event's ts, exactly)."""
    gap = f"{gap_minutes} minutes"
    e = events_us.withColumn("ts", F.timestamp_micros("ts_us"))
    agg = (
        e.withWatermark("ts", "0 seconds")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.unix_micros("w.start").alias("start_us"),
            (
                F.unix_micros("w.end") - F.lit(gap_minutes * 60 * 1_000_000)
            ).alias("end_us"),
            "n_events",
            "session_value",
        )
    )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        # watermark-emitted windows are append-only facts: same
        # increment-only version write as the keyed-state twin (r11)
        mart_fold_batch(batch_df, batch_id, path, append_only=True)

    return (
        agg.writeStream.foreachBatch(fold)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def stream_session_window_readout(
    spark, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """B140 (r9) — the WATERMARK-emission streaming class as a
    driver-checked surface: B135-B138 cover additive/idempotent
    foreachBatch folds and B139 the python keyed-state class; none of
    them exercise Spark's own event-time watermark contract. This
    drains the SAME staged corpus as B139 through the native
    ``session_window`` aggregation (D8) — JVM-side session state,
    append-mode emission gated by the watermark, the sentinel
    advancing event time so every real window finalizes during the
    drain (the sentinel's own window never passes the watermark and
    is never emitted) — and submits the committed sessions to batch
    B11's DuckDB oracle verbatim, identical read/rank/format to B139.

    The two readouts differ ONLY in which engine closes a session
    (user-code gap proof vs watermark), so driver-hash equality on
    both is a cross-implementation proof of the session semantics.

    Plan/scale: state is the engine's merged session store (O(open
    sessions)); per-batch cost is sized by the batch; the staging
    copy is shared with B139 per (process, sf_dir)."""
    import os

    from functools import partial

    staged = _sessionize_staged_frame(spark, sf_dir, gap_minutes)
    sessions = _stage_and_drain(
        spark,
        staged,
        f"d8:{os.path.abspath(sf_dir)}:{gap_minutes}",
        partial(stream_session_window_maintenance, gap_minutes=gap_minutes),
        stage_key=f"events_us{gap_minutes}:{os.path.abspath(sf_dir)}",
        ordered_on="ts_us",
    )
    return _ranked_session_readout(sessions)


def apply_mart_retention(mart: DataFrame, retention_days: int) -> DataFrame:
    """Collapse day-grain mart rows older than ``max(day) -
    retention_days`` into ONE archive row per event_type (day = NULL,
    measures summed); rows inside the horizon keep their day grain.
    Sum-preserving by construction, and the horizon is DATA-DRIVEN
    (the mart's own max day, watermark-style), never wall-clock — so
    the result is a pure function of the mart and the drain==batch
    identity below is deterministic."""
    from pyspark.sql import functions as F

    horizon = mart.agg(
        F.date_sub(F.max("day"), retention_days).alias("h")
    )
    tagged = mart.crossJoin(F.broadcast(horizon))
    return (
        tagged.select(
            "event_type",
            F.when(F.col("day") >= F.col("h"), F.col("day")).alias("day"),
            "n_events",
            "total_value",
        )
        .groupBy("event_type", "day")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("total_value").alias("total_value"),
        )
    )


def stream_mart_retention_maintenance(
    events: DataFrame, path: str, checkpoint: str, retention_days: int = 14
):
    """D36 (r8): BOUNDED-STATE streaming mart — the D12 additive daily
    fold plus a retention policy applied inside every fold: day-grain
    rows older than ``max(day) - retention_days`` collapse into one
    archive row per event_type (day = NULL, measures summed), so the
    committed state stays O(types x retention_days + types) FOREVER
    while the archive row preserves exact lifetime totals. This is
    the capability every other mart-family D-op defers (their state
    grows with distinct keys or days without bound at 100 TB); here
    eviction is part of the merge, not a side process.

    Correctness argument (tested, any arrival order): the horizon is
    the state's own MAX day minus the retention window. Max over a
    subset of batches <= max over all batches, so any day an early
    fold archives would ALSO be archived by the final horizon —
    progressive collapse can never archive a day the batch-twin
    (`apply_mart_retention` over the full mart) would keep — and both
    measures are additive, so collapsed mass is preserved exactly.
    Late data for an already-archived day lands at day grain in its
    batch and is re-collapsed by the same fold (no state surgery).
    Additive counts -> exactly-once per batch via the batch_id guard
    (the D13 contract class). Read with read_mart. Returns the query.
    """
    from ..operators.gold import merge_mart_increment

    def merge(existing, batch_df):
        # pin the merged mart ONCE: apply_mart_retention reads it in
        # two branches (the horizon aggregate and the collapse probe)
        # and Spark re-evaluates common subtrees per branch — without
        # this every micro-batch would pay the state read + batch
        # aggregate twice; the pinned frame is O(state) rows
        merged = merge_mart_increment(existing, batch_df).localCheckpoint(eager=True)
        return apply_mart_retention(merged, retention_days)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        events.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ann_index_delta(batch_df: DataFrame, cents: DataFrame, codebook: DataFrame, n_sub: int = 4) -> DataFrame:
    """Quantize one ARRIVING batch of vectors against FROZEN
    quantizers into serving-index rows (vec_id, sub, code, cell) —
    the per-batch delta of the D37 streaming ANN index. Cell = C9's
    6dp-rounded cosine argmax over the coarse centroids (ties on
    c_id); codes = C129's exact-BIGINT nearest-codeword assignment
    ((d2, code) tiebreak). Both quantizers are inputs, never derived
    from the batch: production trains them on a corpus snapshot and
    the index ingests vectors incrementally against that frozen
    geometry — a row is a pure function of (vector, quantizers), so
    index rows are immutable facts and the mart merge is a plain
    append (the D19/D24 idempotent-index class).

    Plan/scale: one broadcast of the (small) centroid table + one of
    the (n_sub x codes_per_sub) codebook per batch; cost is sized by
    the BATCH, state by the corpus."""
    from ..functions.vectors import cosine, to_double
    from ..operators.relational import r6
    from ..operators.vectors2 import _pq_codes, _pq_tall
    from pyspark.sql import Window

    vecs = batch_df.select("vec_id", to_double(F.col("embedding")).alias("vec"))
    scored = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id", "c_id", r6(cosine(F.col("vec"), F.col("c_vec"))).alias("c_sim")
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("c_sim").desc(), F.col("c_id").asc())
    cells = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("c_id").alias("cell"))
    )
    codes = _pq_codes(_pq_tall(batch_df, n_sub), codebook).select(
        "vec_id", "sub", "code"
    )
    return codes.join(cells, "vec_id").select("vec_id", "sub", "code", "cell")


def stream_ann_index_maintenance(
    vectors: DataFrame,
    path: str,
    checkpoint: str,
    cents: DataFrame,
    codebook: DataFrame,
    n_sub: int = 4,
):
    """D37: maintain the IVFADC serving index as committed state —
    each micro-batch of arriving vectors is quantized against the
    frozen coarse/fine quantizers (``ann_index_delta``) and appended
    under the versioned-commit protocol. Rows are immutable facts
    (exactly one per (vec_id, sub), emitted in the batch the vector
    arrives), so merge = union and a redelivered batch_id is a no-op
    via the mart guard — retrieval gets the same incremental-ingest
    story the dedup tier has (D19/C104-C105): the index is never
    rebuilt, each batch pays one quantization pass sized by itself.
    """

    def merge(existing, batch_df):
        if existing is None:
            return batch_df
        return existing.unionByName(batch_df)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(
            ann_index_delta(batch_df, cents, codebook, n_sub), batch_id, path, merge=merge
        )

    return (
        vectors.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ann_index_probe(
    queries: DataFrame,
    q_tall: DataFrame,
    index: DataFrame,
    cents: DataFrame,
    codebook: DataFrame,
    k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """Serve top-k from the COMMITTED D37 index: probe the query's
    ``n_probe`` nearest cells (same 6dp argmax as ingest), gather
    candidate vec_ids from the index's cell column, score them with
    C130's ADC LUT algebra over the index's code rows, rank with the
    (adc_d2, vec_id) tiebreak — byte-identical output contract to
    batch ``ann_ivf_pq_topk``. The full vectors are NEVER read at
    serve time: everything after the probe is LUT lookups on the
    index's small integer codes — the IVFADC point."""
    from ..functions.vectors import cosine
    from ..operators.relational import r6
    from ..operators.scale import partial_topk
    from ..operators.vectors2 import _pq_d2
    from pyspark.sql import Window

    scored = queries.crossJoin(F.broadcast(cents)).select(
        "q_id", "c_id", r6(cosine(F.col("q_vec"), F.col("c_vec"))).alias("c_sim")
    )
    w = Window.partitionBy("q_id").orderBy(F.col("c_sim").desc(), F.col("c_id").asc())
    probes = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_probe)
        .select("q_id", F.col("c_id").alias("cell"))
    )
    idx_cells = index.select("vec_id", "cell").distinct()
    cand = (
        idx_cells.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id")
    )
    lut = q_tall.join(
        F.broadcast(codebook), F.col("q_sub") == F.col("c_sub")
    ).select(
        "q_id", F.col("q_sub").alias("sub"), "code", _pq_d2("qv", "cv").alias("lut_d2")
    )
    adc = (
        cand.join(index.select("vec_id", "sub", "code"), "vec_id")
        .join(F.broadcast(lut), ["q_id", "sub", "code"])
        .groupBy("q_id", "vec_id")
        .agg(F.sum("lut_d2").cast("long").alias("adc_d2"))
    )
    adc_top = partial_topk(adc, ["q_id"], "adc_d2", "vec_id", k, ascending=True)
    wr = Window.partitionBy("q_id").orderBy(F.col("adc_d2").asc(), F.col("vec_id").asc())
    return (
        adc_top.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= k)
        .select(
            "q_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("vec_id").alias("neighbor_id"),
            "adc_d2",
        )
    )


def stream_ann_index_readout(
    spark,
    sf_dir: str,
    n_queries: int = 8,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    n_sub: int = 4,
    codes_per_sub: int = 16,
) -> DataFrame:
    """B141 (r10, VERDICT r9 task 4) — D37 as a driver-checkable
    surface: freeze C149's quantizers from the training snapshot (the
    embeddings table: first-k coarse centroids, md5 bottom-k
    codebooks — exactly what batch ``ann_ivf_pq_topk`` derives), then
    drain the corpus micro-batch by micro-batch through
    ``stream_ann_index_maintenance`` (append-only quantized index
    rows under the exactly-once versioned-commit protocol) and serve
    the query set from the COMMITTED index with ``ann_index_probe``.
    Every candidate's (cell, codes) row was written by whichever
    micro-batch ingested that vector; the probe reads ONLY the index.
    Equals batch C149 on the same frame, so it registers with its
    DuckDB oracle verbatim (reference: the pandas lakehouse has no
    streaming or ANN tier — capability parity target only).

    This closes retrieval's incremental-ingest loop: B138 proved the
    dedup index class (D19), this proves the serving ANN index (D37)
    — at 100 TB the index is maintained state, never rebuilt; a new
    shard of vectors pays one quantization pass and the serving path
    is unchanged."""
    import os

    from functools import partial

    from ..operators.similarity import _corpus
    from ..operators.vectors2 import _pq_frames
    from ..sources.registry import load_table

    corpus = _corpus(spark, sf_dir)
    cents = (
        corpus.filter(F.col("vec_id") < n_centroids)
        .select(F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec"))
        .localCheckpoint(eager=True)
    )
    tall, codebook = _pq_frames(spark, sf_dir, n_sub, codes_per_sub)
    codebook = codebook.localCheckpoint(eager=True)

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    index = _stage_and_drain(
        spark,
        e,
        f"d37:{os.path.abspath(sf_dir)}",
        partial(
            stream_ann_index_maintenance, cents=cents, codebook=codebook, n_sub=n_sub
        ),
        stage_key=f"embeddings:{os.path.abspath(sf_dir)}",
    )
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    q_tall = tall.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("sub").alias("q_sub"), F.col("sv").alias("qv")
    )
    return ann_index_probe(queries, q_tall, index, cents, codebook, k, n_probe)


def mixture_delta(batch_df: DataFrame) -> DataFrame:
    """Per-source document counts of ONE micro-batch — the additive
    delta ``stream_mixture_maintenance`` folds. Counts are the only
    state the mixture policy needs; shares/weights are derived at
    read time (they are ratios of the folded totals, not foldable
    themselves)."""
    return batch_df.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )


def stream_mixture_maintenance(docs: DataFrame, path: str, checkpoint: str):
    """D38: streaming source-mixture maintenance — each micro-batch
    of arriving documents folds its per-source counts into the stored
    O(sources) state by ADDITIVE SUM under the exactly-once
    versioned-commit protocol (the D12/D13 mergeable class: counts
    over a disjoint batch partition sum to counts over the whole, so
    micro-batch boundaries and arrival order cannot move the state,
    and the batch_id guard makes an at-least-once redelivery a
    no-op). After draining, the committed state equals the batch
    per-source counts over every document ingested — the corpus-scale
    input to the mixture policy maintained at per-batch cost, never a
    history rescan. Read with ``read_mart``. Returns the query."""

    def merge(existing, batch_df):
        delta = mixture_delta(batch_df)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("source")
            .agg(F.sum("n_docs").cast("long").alias("n_docs"))
        )

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        mart_fold_batch(batch_df, batch_id, path, merge=merge)

    return (
        docs.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def mixture_from_counts(per_source: DataFrame) -> DataFrame:
    """C28's mixture policy over a committed per-source count state:
    share of the corpus, the up/down-sampling weight that equalizes
    the mixture, and the capped sampling probability. Mirrors
    ``operators.text2.source_mixing_weights``'s finalize verbatim
    (kept separate so the batch registry function stays
    byte-identical to its driver-hashed form); the state is
    O(sources), so the single-partition window is a few rows."""
    from pyspark.sql import Window

    from ..operators.relational import r6

    w = Window.partitionBy()
    total = F.sum("n_docs").over(w)
    n_sources = F.count(F.lit(1)).over(w)
    target = total / n_sources
    return per_source.select(
        "source",
        "n_docs",
        r6(F.col("n_docs") / total).alias("share"),
        r6(target / F.col("n_docs")).alias("weight"),
        r6(F.least(F.lit(1.0), target / F.col("n_docs"))).alias("sample_prob"),
    )


def stream_mixture_readout(spark, sf_dir: str) -> DataFrame:
    """B142 (r10) — D38 as a driver-checkable surface: drain the
    documents stream through ``stream_mixture_maintenance`` (additive
    per-source counts behind the exactly-once guard) and derive the
    mixture policy from the COMMITTED O(sources) state. Equals batch
    ``source_mixing_weights`` exactly (counts over disjoint batches
    sum to corpus counts; the finalize is the same ratio algebra), so
    it registers with C28's oracle verbatim — the mixture knob a
    continuously-ingesting training-data pipeline reads without ever
    rescanning the corpus (reference: the pandas lakehouse is
    batch-only; capability parity target)."""
    import os

    from ..sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("source")
    state = _stage_and_drain(
        spark,
        docs,
        f"d38:{os.path.abspath(sf_dir)}",
        stream_mixture_maintenance,
        stage_key=f"docs_source:{os.path.abspath(sf_dir)}",
    )
    return mixture_from_counts(state)
