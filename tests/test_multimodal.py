"""Multimodal decode tiers: REAL stdlib decodes (PNG/GIF/JPEG headers,
WAV via the wave module) for recognizable payloads, md5 stub for
opaque ones — same kernel, same schema, same plan."""

import io
import struct
import wave
import zlib

from pyspark.sql import types as T

from github_issues_lakehouse_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    extract_features,
)


def make_png(width, height):
    """Minimal valid RGB PNG, stdlib-only."""
    def chunk(tag, data):
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * width for _ in range(height))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_gif(width, height):
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00" * 8


def make_wav(rate, seconds, amplitude=8192):
    """PCM16 mono square wave -> known RMS = amplitude/32768."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        n = rate * seconds
        frames = struct.pack(f"<{n}h", *([amplitude, -amplitude] * (n // 2)))
        w.writeframes(frames)
    return buf.getvalue()


def _media_df(spark, rows):
    data = [
        (i, kind, payload, f"m/{kind}", len(payload))
        for i, (kind, payload) in enumerate(rows)
    ]
    return spark.createDataFrame(data, MEDIA_SCHEMA)


def test_real_image_header_decode(spark):
    media = _media_df(
        spark,
        [
            ("image", make_png(640, 480)),
            ("image", make_gif(320, 200)),
            ("image", b"not an image at all"),
        ],
    )
    rows = {r.media_id: r for r in extract_features(media).collect()}
    assert (rows[0].width, rows[0].height) == (640, 480)
    assert (rows[1].width, rows[1].height) == (320, 200)
    # undecodable payload: deterministic stub in the 16..255 range
    assert 16 <= rows[2].width <= 255 and 16 <= rows[2].height <= 255


def test_real_wav_decode_duration_and_rms(spark):
    payload = make_wav(16000, 60, amplitude=8192)
    media = _media_df(spark, [("audio", payload)])
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert feats[0].duration_s == 60.0

    wins = sorted(
        audio_features(spark, "unused", window_s=30, media=media).collect(),
        key=lambda r: r.window_idx,
    )
    assert [r.window_idx for r in wins] == [0, 1]
    assert all(r.sample_rate == 16000 and r.duration_s == 60.0 for r in wins)
    # square wave at amplitude A has RMS exactly A/32768
    expect = round(8192 / 32768.0, 6)
    assert all(abs(r.rms_proxy - expect) < 1e-6 for r in wins)


def test_stub_path_unchanged_for_opaque_payloads(spark):
    """Text-byte payloads (the synthetic oracle corpus) must keep the
    exact md5-derived stub values — the oracle contract."""
    import hashlib

    payload = "hello multimodal world".encode()
    media = _media_df(spark, [("image", payload), ("audio", payload)])
    rows = {r.media_id: r for r in extract_features(media).collect()}
    h = hashlib.md5(payload).digest()
    assert rows[0].width == 16 + h[0] % 240
    assert rows[0].height == 16 + h[1] % 240
    assert rows[1].duration_s == round((h[2] % 600) / 10.0, 1)
    assert rows[0].feature_hash == hashlib.md5(payload).hexdigest()
