"""Breach join + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from breakchecker_spark.operators import breach, multimodal


def test_breach_join_semantics(spark):
    contacts = spark.createDataFrame(
        [
            ("email", "a@x.com", "https://x.com", 0),
            ("email", "b@x.com", "https://x.com/p", 1),
            ("phone", "2101234567", "https://x.com", 0),
        ],
        "kind string, identifier string, source_url string, depth int",
    )
    db = spark.createDataFrame(
        [
            ("a@x.com", "BreachTwo"),
            ("a@x.com", "BreachOne"),
            ("a@x.com", "BreachOne"),  # duplicate pair must collapse
            ("ghost@x.com", "Never"),  # never extracted → must not appear
        ],
        "identifier string, breach string",
    )
    out = {r["identifier"]: r for r in breach.match_breaches(contacts, db).collect()}
    assert out["a@x.com"]["breaches"] == ["BreachOne", "BreachTwo"]  # sorted, deduped
    assert out["b@x.com"]["breaches"] == []  # not found → empty list
    assert out["2101234567"]["breaches"] == []
    assert "ghost@x.com" not in out  # join must not invent rows


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNGfake", "image/png", {"w": "64", "h": "64"}),
        (2, "audio", b"RIFFfake", "audio/wav", {"sr": "16000"}),
        (3, "video", b"\x00MP4fake", "video/mp4", {"n_frames": "25"}),
        (4, "image", None, "image/png", {}),
    ]
    return spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)


def test_binary_metadata(spark, media):
    meta = {r["media_id"]: r for r in multimodal.binary_metadata(media).collect()}
    assert meta[1]["n_bytes"] == 8
    assert len(meta[1]["sha1"]) == 40
    assert meta[4]["n_bytes"] is None  # null payload stays null


def test_extract_features_deterministic(spark, media):
    feats = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert len(feats[1]["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in feats[1]["feature"])
    # deterministic: same payload → same feature
    again = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert feats[1]["feature"] == again[1]["feature"]
    assert feats[1]["sha1"] != feats[2]["sha1"]


def test_real_decode_unknown_mime_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"xx", "image", real=True, mime="image/png")


def test_bmp_roundtrip_and_padding():
    import numpy as np

    # 3×2 → row stride 9 → padded to 12: exercises the 4-byte padding
    px = np.arange(3 * 2 * 3, dtype=np.uint8).reshape(2, 3, 3) * 7
    blob = multimodal.encode_bmp(px)
    out = multimodal.decode_bmp(blob)
    assert out.shape == (2, 3, 3)
    assert (out == px).all()
    # header honesty: offset parsed, not assumed contiguous
    assert blob[:2] == b"BM"
    with pytest.raises(ValueError):
        multimodal.decode_bmp(b"JUNK")


def test_wav_roundtrip():
    import numpy as np

    s = (np.arange(40, dtype=np.int64).reshape(20, 2) * 1201 - 12000).astype(
        "int16"
    )
    blob = multimodal.encode_wav(s)
    out = multimodal.decode_wav(blob)
    assert out.shape == (20, 2)
    assert (out == s).all()


def test_extract_features_real_bmp_wav(spark):
    import numpy as np

    px = np.full((4, 4, 3), 100, dtype=np.uint8)
    wav = multimodal.encode_wav(np.full((16, 1), 1000, dtype=np.int16))
    rows = [
        (1, "image", multimodal.encode_bmp(px), "image/bmp", {}),
        (2, "audio", wav, "audio/wav", {}),
    ]
    media = spark.createDataFrame(rows, schema=multimodal.MEDIA_SCHEMA)
    feats = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(media, real=True).collect()
    }
    # BMP: mean/std/min/max of constant 100 → 100/255, 0, ...
    assert abs(feats[1][0] - 100 / 255) < 1e-6
    assert feats[1][1] == 0.0
    assert feats[1][4:] == [48.0, 4.0, 4.0, 3.0]
    # WAV: constant 1000 int16 → mean 1000/32768
    assert abs(feats[2][0] - 1000 / 32768) < 1e-6
    assert feats[2][4:] == [16.0, 16.0, 1.0, 1.0]


def test_extract_features_32bit_wav_in_range(spark):
    """4-byte PCM decodes to int32; features must scale by 2**31, not
    the 16-bit divisor (ADVICE r3 — values came out ~65536× outside
    the documented [-1, 1] band)."""
    import io
    import wave

    import numpy as np

    val = 1_000_000_000  # ~0.4656 of full-scale int32
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(4)
        w.setframerate(8000)
        w.writeframes(np.full(16, val, dtype="<i4").tobytes())
    media = spark.createDataFrame(
        [(3, "audio", buf.getvalue(), "audio/wav", {})],
        schema=multimodal.MEDIA_SCHEMA,
    )
    feats = {
        r["media_id"]: r["feature"]
        for r in multimodal.extract_features(media, real=True).collect()
    }
    assert abs(feats[3][0] - val / 2**31) < 1e-9
    assert all(-1.0 <= v <= 1.0 for v in feats[3][:4])
    assert feats[3][4:] == [16.0, 16.0, 1.0, 1.0]


def test_frame_sample_plan(spark, media):
    frames = multimodal.frame_sample_plan(media, every_n=10).collect()
    idx = sorted(r["frame_idx"] for r in frames)
    assert idx == [0, 10, 20]
