"""Multimodal column plumbing: opaque ``binary`` payloads with typed
metadata, decoded via Arrow-batched ``mapInPandas``.

Decode is tiered per payload, inside the same kernel/plan:

1. REAL, stdlib-only: PNG/GIF/JPEG dimensions parsed from the
   container headers; WAV sample rate/duration/PCM16 RMS via the
   ``wave`` module. No third-party dependency.
2. REAL, optional libs: payloads the header parsers don't recognize
   fall through to PIL / soundfile when importable (gated with
   import-try — this sandbox has neither).
3. STUB fallback: anything undecodable gets deterministic fake
   measurements keyed on md5(payload) — which is also what the
   synthetic test corpus (text bytes, no media magic) exercises, so
   the DuckDB oracle twin stays exact.

The Spark-side contract — schema, Arrow batching, column pruning,
1-to-N expansion — is identical across tiers; feeding real media
bytes upgrades the output without touching the plan.
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
        import io
        import struct

        import pandas as _pd

        def image_dims(payload):
            """Real container-header decode: PNG / GIF / JPEG via
            stdlib; any other format via PIL when importable."""
            if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
                return struct.unpack(">II", payload[16:24])
            if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
                return struct.unpack("<HH", payload[6:10])
            if payload[:2] == b"\xff\xd8":
                i = 2
                while i + 9 < len(payload) and payload[i] == 0xFF:
                    marker = payload[i + 1]
                    if marker == 0x01 or 0xD0 <= marker <= 0xD9:
                        i += 2
                        continue
                    seglen = int.from_bytes(payload[i + 2 : i + 4], "big")
                    if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                        h = int.from_bytes(payload[i + 5 : i + 7], "big")
                        w = int.from_bytes(payload[i + 7 : i + 9], "big")
                        return w, h
                    i += 2 + seglen
                return None
            try:
                from PIL import Image

                with Image.open(io.BytesIO(payload)) as im:
                    return im.size
            except Exception:
                return None

        def audio_duration(payload):
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                try:
                    import wave

                    with wave.open(io.BytesIO(payload)) as w:
                        return round(w.getnframes() / float(w.getframerate()), 1)
                except Exception:
                    return None
            try:
                import soundfile as sf

                return round(float(sf.info(io.BytesIO(payload)).duration), 1)
            except Exception:
                return None

        def decode_stub(payload, kind):
            h = hashlib.md5(payload or b"").digest()
            width = 16 + h[0] % 240
            height = 16 + h[1] % 240
            duration = round((h[2] % 600) / 10.0, 1) if kind in ("audio", "video") else 0.0
            return width, height, duration

        def decode(payload, kind):
            payload = bytes(payload or b"")
            if kind == "image":
                dims = image_dims(payload)
                if dims is not None:
                    return int(dims[0]), int(dims[1]), 0.0
            elif kind in ("audio", "video"):
                dur = audio_duration(payload)
                if dur is not None:
                    return 0, 0, dur
            return decode_stub(payload, kind)

        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                w, h, dur = decode(payload, kind)
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


def audio_features(
    spark: SparkSession,
    sf_dir: str,
    window_s: int = 30,
    media: DataFrame | None = None,
) -> DataFrame:
    """Audio decode + windowed feature extraction plumbing: per audio
    payload, stub-decode (sample_rate, duration), then expand into
    ``window_s``-second analysis windows with a per-window feature
    (rms proxy) — the 1-to-N Arrow shape an ASR/audio-tagging
    pipeline feeds its models. A real deployment swaps the md5 stub
    for soundfile/librosa frames; schema and batching are unchanged.

    Kernel is self-contained (foreign-cwd drivers can run it); on the
    synthetic corpus every output derives from md5(payload) so the SQL
    oracle reproduces it; real RIFF/WAVE payloads (pass ``media``) get
    true rate/duration and per-window PCM16 RMS via stdlib ``wave``.
    """
    if media is None:
        media = synth_media(spark, sf_dir).filter(F.col("kind") == "audio")
    pruned = media.select("media_id", "payload")

    def window_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        import pandas as _pd

        def wav_windows(payload):
            """Real decode for RIFF/WAVE payloads: (rate, duration,
            per-window PCM16 RMS list) via the stdlib wave module —
            None for anything else (falls to soundfile, then stub)."""
            if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                return None
            try:
                import array
                import math
                import wave

                with wave.open(io.BytesIO(payload)) as w:
                    rate, n, width = w.getframerate(), w.getnframes(), w.getsampwidth()
                    nch = w.getnchannels()
                    duration = round(n / float(rate), 1)
                    rms = None
                    if width == 2:
                        samples = array.array("h")
                        samples.frombytes(w.readframes(n))
                        per_win = rate * window_s * nch
                        rms = []
                        for s in range(0, len(samples), per_win):
                            chunk = samples[s : s + per_win]
                            if chunk:
                                acc = 0
                                for v in chunk:
                                    acc += v * v
                                rms.append(
                                    round(math.sqrt(acc / len(chunk)) / 32768.0, 6)
                                )
                    return rate, duration, rms
            except Exception:
                return None

        def sf_info(payload):
            try:
                import soundfile as sf

                info = sf.info(io.BytesIO(payload))
                return int(info.samplerate), round(float(info.duration), 1), None
            except Exception:
                return None

        rates = [8000, 16000, 22050, 44100]
        cols = ["media_id", "sample_rate", "duration_s", "window_idx",
                "t_start_s", "window_hash", "rms_proxy"]
        for pdf in batches:
            out = {c: [] for c in cols}
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                real = wav_windows(payload) or sf_info(payload)
                if real is not None:
                    rate, duration, rms = real
                    n_windows = max(1, -(-int(duration * 10) // (10 * window_s)))
                else:
                    h = hashlib.md5(payload).digest()
                    rate = rates[h[3] % 4]
                    d10 = h[2] % 600
                    duration = round(d10 / 10.0, 1)
                    n_windows = d10 // (10 * window_s) + 1
                    rms = None
                for i in range(n_windows):
                    wh = hashlib.md5(payload + f":w:{i}".encode()).hexdigest()
                    out["media_id"].append(int(media_id))
                    out["sample_rate"].append(rate)
                    out["duration_s"].append(duration)
                    out["window_idx"].append(i)
                    out["t_start_s"].append(float(i * window_s))
                    out["window_hash"].append(wh)
                    out["rms_proxy"].append(
                        rms[i]
                        if rms is not None and i < len(rms)
                        else round(int(wh[:8], 16) / 4294967295.0, 6)
                    )
            yield _pd.DataFrame(out)

    return pruned.mapInPandas(window_batches, schema=AUDIO_SCHEMA)


def media_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C100 (r5): exact payload-level media dedup accounting — per
    kind, how many media rows share a byte-identical payload
    (md5 over the opaque binary column) and the storage the dedup
    would reclaim, in exact ppm. The first number a multimodal
    corpus build reports: encoded media duplicates at the BYTE level
    long before any decoder runs (mirrored uploads, re-crawls), and
    hashing the payload column needs no decode at all — so this
    pass runs at full corpus scale even where decode is gated.
    Plan: one map-side md5 projection, two combinable aggregates;
    payload bytes never leave the executor (only the 32-char hash
    shuffles).
    """
    from ..functions.exact import ppm_expr as _ppm

    m = synth_media(spark, sf_dir)
    per = m.groupBy("kind", F.md5("payload").alias("h")).agg(
        F.count(F.lit(1)).alias("c"),
        # byte-identical payloads have identical sizes; min() keeps
        # the aggregate deterministic
        F.min("n_bytes").alias("nb"),
    )
    return (
        per.groupBy("kind")
        .agg(
            F.sum("c").alias("n_media"),
            F.count(F.lit(1)).alias("n_unique"),
            F.sum(F.col("c") - 1).alias("n_dup"),
            F.sum(F.col("c") * F.col("nb")).alias("bytes_total"),
            F.sum((F.col("c") - 1) * F.col("nb")).alias("bytes_dup"),
        )
        .selectExpr(
            "kind",
            "CAST(n_media AS BIGINT) AS n_media",
            "CAST(n_unique AS BIGINT) AS n_unique",
            "CAST(n_dup AS BIGINT) AS n_dup",
            "CAST(bytes_total AS BIGINT) AS bytes_total",
            "CAST(bytes_dup AS BIGINT) AS bytes_dup",
            f"CAST({_ppm('bytes_dup', 'bytes_total')} AS BIGINT) AS savings_ppm",
        )
    )


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
