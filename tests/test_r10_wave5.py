"""Round-10 wave 5: D38 — streaming source-mixture maintenance and
its driver surface B142 `stream_mixture_readout`. Drain == batch,
redelivery no-op, delta purity, and readout == batch C28."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    from github_issues_lakehouse_spark.sources.registry import load_table

    return load_table(spark, SF_DIR, "documents").select("source")


def test_mixture_delta_is_additive_over_batches(spark):
    """Per-source counts over disjoint batch subsets sum to the
    counts over the whole — the mergeable property the fold relies
    on (micro-batch boundaries cannot move the state)."""
    from github_issues_lakehouse_spark.streaming.ops import mixture_delta

    d = _docs(spark)
    whole = {r["source"]: r["n_docs"] for r in mixture_delta(d).collect()}
    lo = mixture_delta(d.filter(F.crc32("source") % 2 == 0))
    hi = mixture_delta(d.filter(F.crc32("source") % 2 == 1))
    halves: dict[str, int] = {}
    for r in lo.unionByName(hi).collect():
        halves[r["source"]] = halves.get(r["source"], 0) + r["n_docs"]
    assert whole == halves


def test_drained_mixture_state_equals_batch_counts(spark, tmp_path):
    """D38 drain==batch: folding the documents stream micro-batch by
    micro-batch commits exactly the per-source counts a single batch
    aggregation produces."""
    from github_issues_lakehouse_spark.streaming.ops import (
        mixture_delta,
        read_mart,
        stream_mixture_maintenance,
    )

    d = _docs(spark)
    staging = str(tmp_path / "staging")
    d.repartition(4).write.parquet(staging)
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    path = str(tmp_path / "mart")
    q = stream_mixture_maintenance(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    got = sorted(map(tuple, read_mart(spark, path).collect()))
    want = sorted(map(tuple, mixture_delta(d).collect()))
    assert got == want


def test_redelivered_mixture_batch_is_a_noop(spark, tmp_path):
    """At-least-once redelivery: re-folding the same batch_id must
    not double-count (the exactly-once batch_id guard)."""
    from github_issues_lakehouse_spark.streaming.ops import (
        mart_fold_batch,
        mixture_delta,
        read_mart,
    )

    d = _docs(spark)

    def merge(existing, batch_df):
        delta = mixture_delta(batch_df)
        if existing is None:
            return delta
        return (
            existing.unionByName(delta)
            .groupBy("source")
            .agg(F.sum("n_docs").cast("long").alias("n_docs"))
        )

    path = str(tmp_path / "mart")
    assert mart_fold_batch(d, 0, path, merge=merge) is True
    assert mart_fold_batch(d, 0, path, merge=merge) is False  # replay
    got = sorted(map(tuple, read_mart(spark, path).collect()))
    want = sorted(map(tuple, mixture_delta(d).collect()))
    assert got == want


def test_mixture_readout_equals_batch_c28(spark):
    """B142's contract: the readout over committed D38 state is
    row-identical to batch `source_mixing_weights` — the identity
    that lets it register with C28's DuckDB oracle verbatim."""
    from github_issues_lakehouse_spark.operators.text2 import source_mixing_weights
    from github_issues_lakehouse_spark.streaming.ops import stream_mixture_readout

    got = sorted(map(tuple, stream_mixture_readout(spark, SF_DIR).collect()))
    want = sorted(map(tuple, source_mixing_weights(spark, SF_DIR).collect()))
    assert got == want
