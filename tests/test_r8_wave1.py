"""Round-8 wave 1: the ADVICE r7 fixes.

- One cosine spelling across the exact/banded family: C6's tile
  kernel now replicates the Catalyst sequential fold IEEE-op-for-op,
  so the banded subset identity is a guarantee, not an observation.
- _signature_frame names the offending vec_id on NULL/ragged vectors
  instead of an opaque np.stack shape error.
- _hits_oracle carries the engine's zero-weight-graph guard.
- The WindowExec log suppression honors an opt-out env flag.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_c6_kernel_matches_catalyst_fold_exactly(spark):
    """The numpy tile kernel (sequential per-dimension fold,
    dot/(na*nb)) must reproduce the Catalyst r6(dot/(norm*norm))
    spelling EXACTLY on every emitted pair — the ADVICE r7
    unification that makes banded-verify a bit-for-bit subset."""
    from github_issues_lakehouse_spark.functions.vectors import dot, norm
    from github_issues_lakehouse_spark.operators.relational import r6
    from github_issues_lakehouse_spark.operators.similarity import (
        _corpus,
        neardup_embedding_cosine,
    )

    pairs = neardup_embedding_cosine(spark, SF_DIR, threshold=0.4)
    c = _corpus(spark, SF_DIR).select("vec_id", "vec", norm(F.col("vec")).alias("nrm"))
    a = c.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("va"), F.col("nrm").alias("na")
    )
    b = c.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vb"), F.col("nrm").alias("nb")
    )
    catalyst = pairs.join(a, "id_a").join(b, "id_b").select(
        "id_a",
        "id_b",
        "cos_sim",
        r6(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("ref"),
    )
    rows = catalyst.collect()
    assert len(rows) > 0
    mismatches = [r for r in rows if r.cos_sim != r.ref]
    assert mismatches == []


def test_banded_pairs_bitwise_subset_of_exact(spark):
    """Every banded pair row (ids AND 6dp cosine) appears verbatim in
    C6's exact output — the precision-1 identity at value grain, not
    just count grain (count grain is test_r7_wave1)."""
    from github_issues_lakehouse_spark.operators.similarity import (
        banded_corpus_pairs,
        neardup_embedding_cosine,
    )

    banded = banded_corpus_pairs(spark, SF_DIR, threshold=0.4)
    exact = neardup_embedding_cosine(spark, SF_DIR, threshold=0.4)
    n_banded = banded.count()
    assert n_banded > 0
    matched = banded.join(exact, ["id_a", "id_b", "cos_sim"], "inner").count()
    assert matched == n_banded


def test_signature_frame_names_null_vector(spark):
    from github_issues_lakehouse_spark.operators.similarity import _signature_frame

    df = spark.createDataFrame(
        [(1, [0.5] * 64), (7, None), (3, [0.25] * 64)],
        "vec_id long, vec array<double>",
    )
    with pytest.raises(Exception, match="NULL embedding for vec_id=7"):
        _signature_frame(df.repartition(1)).collect()


def test_signature_frame_names_ragged_vector(spark):
    from github_issues_lakehouse_spark.operators.similarity import _signature_frame

    df = spark.createDataFrame(
        [(1, [0.5] * 64), (9, [0.5] * 63)],
        "vec_id long, vec array<double>",
    )
    with pytest.raises(Exception, match="vec_id=9 has dim 63, expected 64"):
        _signature_frame(df.repartition(1)).collect()


def test_hits_oracle_zero_weight_graph_emits_zero_scores():
    """On a graph with no trade edges the engine emits score_e6 = 0
    for every node (the _normalize CASE); the oracle must land on the
    same branch instead of NULL/inf from an unguarded divide."""
    import duckdb

    from github_issues_lakehouse_spark.queries import _hits_oracle

    con = duckdb.connect()
    con.execute("CREATE TABLE customer AS SELECT * FROM (VALUES (1), (2)) t(c_custkey)")
    con.execute("CREATE TABLE supplier AS SELECT * FROM (VALUES (10), (11)) t(s_suppkey)")
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT)"
    )
    con.execute(
        "CREATE TABLE lineitem (l_orderkey BIGINT, l_suppkey BIGINT)"
    )
    rows = con.execute(_hits_oracle()).fetchall()
    assert len(rows) == 4
    assert all(score == 0 for _, _, score in rows)


def test_signature_frame_matches_band_keys_fold_12x4(spark):
    """The Arrow signature pass must stay bit-identical to the
    Catalyst _band_keys fold in the 12x4 config too (C92's banding —
    the r7 proof covered only the 8x6 banded-family config) before
    embedding_decontaminate rides it."""
    from github_issues_lakehouse_spark.operators.similarity import (
        _band_keys,
        _corpus,
        _hyperplanes,
        _signature_frame,
    )
    from github_issues_lakehouse_spark.functions.vectors import norm

    n_planes, bands, dim = 48, 12, 64
    corpus = _corpus(spark, SF_DIR).select("vec_id", "vec")
    arrow = {
        r.vec_id: (r.nrm, tuple(r.bvals))
        for r in _signature_frame(corpus, n_planes, bands, dim).collect()
    }
    planes = _hyperplanes(dim, n_planes)
    fold = {
        r.vec_id: (r.nrm, tuple(k.band_val for k in r.bk))
        for r in corpus.select(
            "vec_id",
            norm(F.col("vec")).alias("nrm"),
            _band_keys(F.col("vec"), planes, bands, n_planes // bands).alias("bk"),
        ).collect()
    }
    assert set(arrow) == set(fold)
    diff = {k for k in arrow if arrow[k] != fold[k]}
    assert diff == set()


def test_embedding_decontaminate_output_unchanged_by_arrow_switch(spark, duck):
    """C92's Arrow signature switch must not move a single output row
    — recompute the mart via the oracle SQL and compare value-exact."""
    from github_issues_lakehouse_spark.queries import oracle_sql

    from github_issues_lakehouse_spark.operators.similarity import (
        embedding_decontaminate,
    )

    got = {
        (r.train_vec_id, r.n_test_matches, float(r.max_cos))
        for r in embedding_decontaminate(spark, SF_DIR).collect()
    }
    want = {
        (a, b, float(c))
        for a, b, c in duck.execute(oracle_sql()["embedding_decontaminate"]).fetchall()
    }
    assert got == want
    assert len(got) > 0


def test_stream_daily_anomaly_readout_equals_batch(spark):
    """B135: the registered streaming readout (stage -> D12 drain ->
    D33 MAD readout over the committed mart) equals batch
    mad_anomaly_events row-for-row — the drain==batch identity on the
    driver-facing surface itself."""
    from github_issues_lakehouse_spark.operators.timeseries import mad_anomaly_events
    from github_issues_lakehouse_spark.streaming import stream_daily_anomaly_readout

    got = {
        (r.event_type, str(r.day)): (
            r.n_events, r.n_trailing, r.med2, r.mad4, r.robust_z, r.is_anomaly
        )
        for r in stream_daily_anomaly_readout(spark, SF_DIR).collect()
    }
    want = {
        (r.event_type, str(r.day)): (
            r.n_events, r.n_trailing, r.med2, r.mad4, r.robust_z, r.is_anomaly
        )
        for r in mad_anomaly_events(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 0


def test_stream_freshness_readout_equals_batch(spark):
    """B136: drained D32 state + freshness_from_state equals batch
    event_freshness_mart row-for-row on the driver-facing surface."""
    from github_issues_lakehouse_spark.operators.timeseries import (
        event_freshness_mart,
    )
    from github_issues_lakehouse_spark.streaming import stream_freshness_readout

    key = lambda r: (r.event_type, r.n_events, str(r.first_day), str(r.last_day),
                     r.staleness_us, r.events_per_day_e2, r.is_stale)
    got = sorted(key(r) for r in stream_freshness_readout(spark, SF_DIR).collect())
    want = sorted(key(r) for r in event_freshness_mart(spark, SF_DIR).collect())
    assert got == want and len(got) > 0


def test_stream_reconciliation_readout_equals_batch(spark):
    """B137: drained D30 state + header finalize equals batch
    order_total_reconciliation row-for-row."""
    from github_issues_lakehouse_spark.operators.quality_checks import (
        order_total_reconciliation,
    )
    from github_issues_lakehouse_spark.streaming import (
        stream_reconciliation_readout,
    )

    got = sorted(
        map(tuple, stream_reconciliation_readout(spark, SF_DIR).collect())
    )
    want = sorted(
        map(tuple, order_total_reconciliation(spark, SF_DIR).collect())
    )
    assert got == want and len(got) > 0


def test_stream_dedup_index_readout_equals_batch(spark):
    """B138: drained D19 index + block_index_probe equals batch
    dedup_against_index row-for-row — the idempotent-index class of
    the streaming tier on the driver-facing surface, with flagged
    dups present so the decision branch is exercised."""
    from github_issues_lakehouse_spark.operators.dedup import dedup_against_index
    from github_issues_lakehouse_spark.streaming import stream_dedup_index_readout

    got = sorted(map(tuple, stream_dedup_index_readout(spark, SF_DIR).collect()))
    want = sorted(map(tuple, dedup_against_index(spark, SF_DIR).collect()))
    assert got == want and len(got) > 0
    assert any(r[-1] for r in got)  # at least one admit/reject fires


def test_bench_exception_block_parser():
    """bench.py's stderr capture groups JVM stack-frame runs into
    NAMED blocks (head line + frame count) — 'Caused by' and '...'
    continuation frames merge into their parent block."""
    from bench import _exception_blocks

    sample = (
        "26/08/15 WARN DAGScheduler: accumulator update failed\n"
        "\tat org.apache.spark.scheduler.DAGScheduler.updateAccumulators"
        "(DAGScheduler.scala:1787)\n"
        "\tat org.apache.spark.scheduler.DAGScheduler.handleTaskCompletion"
        "(DAGScheduler.scala:2000)\n"
        "Caused by: java.lang.IllegalStateException: gone\n"
        "\tat foo.Bar(z.java:1)\n"
        "\t... 12 more\n"
        "ordinary log line\n"
        "26/08/15 ERROR TaskSetManager: Task 0 failed\n"
        "\tat a.b(c.scala:3)\n"
    )
    blocks = _exception_blocks(sample)
    assert [b["frames"] for b in blocks] == [5, 1]
    assert "DAGScheduler: accumulator update failed" in blocks[0]["head"]
    assert "TaskSetManager" in blocks[1]["head"]
    assert _exception_blocks("clean\nlines\nonly\n") == []
    # a log that STARTS mid-trace (truncated capture) still reports
    # the leading block, with a placeholder head
    lead = _exception_blocks("\tat a.b(c.scala:3)\n\tat d.e(f.scala:4)\nok\n")
    assert lead == [{"head": "(log starts mid-trace)", "count": 1, "frames": 2}]
    # blocks differing only by embedded ids collapse to one CLASS row
    sample = (
        "ERROR x: accumulator 101 gone\n\tat a.b(c.scala:1)\n"
        "ok\nERROR x: accumulator 202 gone\n\tat a.b(c.scala:1)\n"
    )
    agg = _exception_blocks(sample)
    assert len(agg) == 1 and agg[0]["count"] == 2
    assert agg[0]["head"] == "ERROR x: accumulator N gone"


def test_window_warning_suppression_opt_out(monkeypatch):
    """SPARK_GRAFT_KEEP_WINDOW_WARNINGS=1 must return before touching
    the JVM (ADVICE r7: ad-hoc co-resident sessions keep the runtime
    warning)."""
    from github_issues_lakehouse_spark.session import (
        _silence_reviewed_window_warnings,
    )

    class _Boom:
        @property
        def sparkContext(self):
            raise AssertionError("JVM touched despite opt-out")

    monkeypatch.setenv("SPARK_GRAFT_KEEP_WINDOW_WARNINGS", "1")
    _silence_reviewed_window_warnings(_Boom())
