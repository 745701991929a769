"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded via Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the decode kernel is
a STUB (deterministic fake measurements keyed on payload bytes) —
but the Spark-side contract is real: schema, batch iteration, column
pruning, partition sizing. Swapping the stub for PIL/ffmpeg is a
one-function change that does not touch the plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.registry import load_table

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("payload", T.BinaryType()),      # opaque encoded bytes
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("feature_hash", T.StringType()),
    ]
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from documents: payload
    = utf-8 bytes of the text (stands in for encoded media)."""
    d = load_table(spark, sf_dir, "documents")
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.length(F.col("text").cast("binary")).cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes, kind: str) -> tuple[int, int, float]:
    """STUB decode: deterministic pseudo-measurements from content.

    Real deployment: PIL.Image.open / soundfile / pyav frame probe.
    Raising NotImplementedError here would be honest too; a
    deterministic fake lets the batch plumbing be tested end-to-end.
    """
    import hashlib

    h = hashlib.md5(payload or b"").digest()
    width = 16 + h[0] % 240
    height = 16 + h[1] % 240
    duration = round((h[2] % 600) / 10.0, 1) if kind in ("audio", "video") else 0.0
    return width, height, duration


def extract_features(media: DataFrame, batch_limit: int = 10_000) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams record batches; payload bytes never
    round-trip through Python row objects. Upstream column pruning
    still applies (we select only the needed columns first).
    """
    pruned = media.select("media_id", "kind", "payload")
    out_cols = [f.name for f in FEATURE_SCHEMA.fields]

    # NOTE: the closure must be fully self-contained (no references to
    # this package's module-level symbols): the driver harness imports
    # the entry module by path, so Python workers cannot re-import
    # `github_issues_lakehouse_spark` — cloudpickle must serialize the
    # whole kernel by value.
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        def decode_stub(payload, kind):
            h = hashlib.md5(payload or b"").digest()
            width = 16 + h[0] % 240
            height = 16 + h[1] % 240
            duration = round((h[2] % 600) / 10.0, 1) if kind in ("audio", "video") else 0.0
            return width, height, duration

        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                w, h, dur = decode_stub(payload, kind)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "kind": kind,
                        "width": w,
                        "height": h,
                        "duration_s": dur,
                        "feature_hash": hashlib.md5(payload or b"").hexdigest(),
                    }
                )
            yield _pd.DataFrame(rows, columns=out_cols)

    return pruned.mapInPandas(decode_batches, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_offset_s", T.DoubleType()),
        T.StructField("frame_hash", T.StringType()),
    ]
)


def frame_sample(spark: SparkSession, sf_dir: str, every_s: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame (every
    ``every_s`` seconds of stub-decoded duration) — the 1-to-N Arrow
    expansion every video pipeline needs (decode batch in, frame
    batch out; a real deployment swaps the hash for pyav frame
    bytes + a feature extractor, same schema contract).

    The kernel is self-contained (no package-level references) so
    foreign-cwd drivers can run it; all outputs derive from
    md5(payload) so the SQL oracle reproduces them exactly.
    """
    media = synth_media(spark, sf_dir).filter(F.col("kind") == "video")
    pruned = media.select("media_id", "payload")

    def sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "t_offset_s": [], "frame_hash": []}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                h = hashlib.md5(payload).digest()
                n_frames = (h[2] % 600) // (10 * every_s) + 1
                for i in range(n_frames):
                    out["media_id"].append(int(media_id))
                    out["frame_idx"].append(i)
                    out["t_offset_s"].append(float(i * every_s))
                    out["frame_hash"].append(
                        hashlib.md5(payload + f":{i}".encode()).hexdigest()
                    )
            yield _pd.DataFrame(out)

    return pruned.mapInPandas(sample_batches, schema=FRAME_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("t_start_s", T.DoubleType()),
        T.StructField("window_hash", T.StringType()),
        T.StructField("rms_proxy", T.DoubleType()),
    ]
)


def audio_features(spark: SparkSession, sf_dir: str, window_s: int = 30) -> DataFrame:
    """Audio decode + windowed feature extraction plumbing: per audio
    payload, stub-decode (sample_rate, duration), then expand into
    ``window_s``-second analysis windows with a per-window feature
    (rms proxy) — the 1-to-N Arrow shape an ASR/audio-tagging
    pipeline feeds its models. A real deployment swaps the md5 stub
    for soundfile/librosa frames; schema and batching are unchanged.

    Kernel is self-contained (foreign-cwd drivers can run it); every
    output derives from md5(payload) so the SQL oracle reproduces it.
    """
    media = synth_media(spark, sf_dir).filter(F.col("kind") == "audio")
    pruned = media.select("media_id", "payload")

    def window_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        rates = [8000, 16000, 22050, 44100]
        cols = ["media_id", "sample_rate", "duration_s", "window_idx",
                "t_start_s", "window_hash", "rms_proxy"]
        for pdf in batches:
            out = {c: [] for c in cols}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                h = hashlib.md5(payload).digest()
                rate = rates[h[3] % 4]
                d10 = h[2] % 600
                duration = round(d10 / 10.0, 1)
                n_windows = d10 // (10 * window_s) + 1
                for i in range(n_windows):
                    wh = hashlib.md5(payload + f":w:{i}".encode()).hexdigest()
                    out["media_id"].append(int(media_id))
                    out["sample_rate"].append(rate)
                    out["duration_s"].append(duration)
                    out["window_idx"].append(i)
                    out["t_start_s"].append(float(i * window_s))
                    out["window_hash"].append(wh)
                    out["rms_proxy"].append(round(int(wh[:8], 16) / 4294967295.0, 6))
            yield _pd.DataFrame(out)

    return pruned.mapInPandas(window_batches, schema=AUDIO_SCHEMA)


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata + extracted-feature mart over the synthetic media
    table (rows-only correctness: stub decode is engine-specific)."""
    media = synth_media(spark, sf_dir)
    feats = extract_features(media)
    meta = media.select("media_id", "mime", "n_bytes")
    return (
        feats.join(meta, on="media_id")
        .select("media_id", "kind", "mime", "n_bytes", "width", "height", "duration_s", "feature_hash")
    )
