"""Round-10 wave 3: D37 — the streaming serving-ANN index
(VERDICT r9 task 4). Drain == batch, redelivery no-op, frozen
quantizers, and the B141 readout contract."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _quantizers(spark):
    from github_issues_lakehouse_spark.operators.similarity import _corpus
    from github_issues_lakehouse_spark.operators.vectors2 import _pq_frames

    corpus = _corpus(spark, SF_DIR)
    cents = corpus.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("c_id"), F.col("vec").alias("c_vec")
    ).localCheckpoint(eager=True)
    tall, cb = _pq_frames(spark, SF_DIR, 4, 16)
    return cents, cb.localCheckpoint(eager=True)


def test_ann_index_delta_is_pure_in_the_batch(spark):
    """A vector's index row depends only on (vector, frozen
    quantizers): quantizing the corpus in one batch or as two halves
    yields the identical row set — the property that makes the fold
    order-free and the index append-only."""
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming.ops import ann_index_delta

    cents, cb = _quantizers(spark)
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    whole = sorted(map(tuple, ann_index_delta(e, cents, cb).collect()))
    lo = ann_index_delta(e.filter(F.col("vec_id") % 2 == 0), cents, cb)
    hi = ann_index_delta(e.filter(F.col("vec_id") % 2 == 1), cents, cb)
    halves = sorted(map(tuple, lo.unionByName(hi).collect()))
    assert whole == halves
    # exactly one row per (vec_id, sub)
    n = e.count()
    assert len(whole) == 4 * n


def test_drained_index_equals_batch_delta(spark, tmp_path):
    """D37 drain==batch: folding the corpus through the maintenance
    micro-batch by micro-batch commits exactly the rows a single
    batch quantization produces."""
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming.ops import (
        ann_index_delta,
        read_mart,
        stream_ann_index_maintenance,
    )

    cents, cb = _quantizers(spark)
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    staging = str(tmp_path / "staging")
    e.repartition(4).write.parquet(staging)
    stream = (
        spark.readStream.schema(e.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staging)
    )
    path = str(tmp_path / "index")
    q = stream_ann_index_maintenance(
        stream, path, str(tmp_path / "ckpt"), cents=cents, codebook=cb
    )
    q.awaitTermination(300)
    got = sorted(map(tuple, read_mart(spark, path).collect()))
    want = sorted(map(tuple, ann_index_delta(e, cents, cb).collect()))
    assert got == want


def test_redelivered_batch_is_a_noop(spark, tmp_path):
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming.ops import (
        ann_index_delta,
        mart_fold_batch,
        read_mart,
    )

    cents, cb = _quantizers(spark)
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    rows = ann_index_delta(e.filter(F.col("vec_id") < 64), cents, cb)
    path = str(tmp_path / "index")
    union = lambda ex, b: b if ex is None else ex.unionByName(b)  # noqa: E731
    assert mart_fold_batch(rows, 0, path, merge=union) is True
    n0 = read_mart(spark, path).count()
    assert mart_fold_batch(rows, 0, path, merge=union) is False  # replay
    assert read_mart(spark, path).count() == n0 == 64 * 4


def test_readout_equals_batch_c149(spark):
    """B141's oracle claim: the committed-index probe returns byte-
    identical rows to batch ann_ivf_pq_topk on the same frame."""
    from github_issues_lakehouse_spark.operators.similarity import ann_ivf_pq_topk
    from github_issues_lakehouse_spark.streaming import stream_ann_index_readout

    got = sorted(map(tuple, stream_ann_index_readout(spark, SF_DIR).collect()))
    want = sorted(map(tuple, ann_ivf_pq_topk(spark, SF_DIR).collect()))
    assert got == want and len(got) == 40


def test_probe_reads_only_the_index(spark):
    """The serve path never touches the embeddings table: probing a
    hand-built index frame (no parquet lineage) works end to end —
    proof the candidate gather + ADC scoring is a pure function of
    (index, quantizers, queries)."""
    from github_issues_lakehouse_spark.operators.similarity import _corpus
    from github_issues_lakehouse_spark.operators.vectors2 import _pq_frames, _pq_tall
    from github_issues_lakehouse_spark.sources.registry import load_table
    from github_issues_lakehouse_spark.streaming.ops import (
        ann_index_delta,
        ann_index_probe,
    )

    cents, cb = _quantizers(spark)
    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    # materialize the index to plain rows, rebuild a frame from them
    rows = ann_index_delta(e, cents, cb).collect()
    index = spark.createDataFrame(rows, "vec_id long, sub long, code long, cell long")
    corpus = _corpus(spark, SF_DIR)
    queries = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("vec").alias("q_vec")
    )
    tall, _ = _pq_frames(spark, SF_DIR, 4, 16)
    q_tall = tall.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("sub").alias("q_sub"), F.col("sv").alias("qv")
    )
    out = ann_index_probe(queries, q_tall, index, cents, cb)
    got = sorted(map(tuple, out.collect()))
    from github_issues_lakehouse_spark.operators.similarity import ann_ivf_pq_topk

    want = sorted(map(tuple, ann_ivf_pq_topk(spark, SF_DIR).collect()))
    assert got == want
