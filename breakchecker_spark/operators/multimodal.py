"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as ``binary`` columns with a typed metadata
struct. The Spark-side machinery — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partition sizing — is real and tested; the
actual codec calls are STUBBED (this container ships no image/audio
libraries): ``decode_stub`` raises ``NotImplementedError`` when asked
for a real decode and the deterministic fake path derives pseudo
features from the payload bytes so downstream plumbing is testable
end-to-end.

At 100 TB: binary columns dominate scan size, so every operator here
projects metadata first and touches payload bytes only inside the
narrow mapInPandas stage; repartition by size-bucket keeps Arrow
batches under ``target_batch_bytes``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha1", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Pure-numpy decoder for uncompressed 24-bit BI_RGB BMP.

    Parses the BITMAPFILEHEADER/BITMAPINFOHEADER, honours the pixel
    data offset, 4-byte row padding, bottom-up row order, and BGR
    channel order. Returns (h, w, 3) uint8 RGB. Formats beyond
    24-bit/BI_RGB raise NotImplementedError (that is the documented
    codec boundary — plug PIL there in production).
    """
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = int.from_bytes(payload[10:14], "little")
    width = int.from_bytes(payload[18:22], "little", signed=True)
    height = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP variant bpp={bpp} comp={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) // 4 * 4
    px = np.frombuffer(
        payload, dtype=np.uint8, offset=data_off, count=row_bytes * height
    )
    rows = px.reshape(height, row_bytes)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[..., ::-1].copy()  # BGR → RGB


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Inverse of :func:`decode_bmp` for fixtures: (h, w, 3) RGB uint8
    → bottom-up 24-bit BI_RGB BMP bytes."""
    h, w, _ = pixels.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = pixels[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
    data = body.tobytes()
    off = 54
    header = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + data


def decode_wav(payload: bytes) -> np.ndarray:
    """Stdlib ``wave`` decoder: PCM WAV → (n_frames, n_channels) array
    (uint8 for 8-bit, int16/int32 otherwise)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(sw)
    if dtype is None:
        raise NotImplementedError(f"WAV sample width {sw}")
    return np.frombuffer(raw, dtype=dtype).reshape(-1, nch)


def encode_wav(samples: np.ndarray, framerate: int = 8000) -> bytes:
    """Inverse of :func:`decode_wav` for fixtures: (n, ch) int16 → PCM
    WAV bytes."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_stub(
    payload: bytes, kind: str, real: bool = False, mime: str | None = None
) -> np.ndarray:
    """Codec boundary.

    ``real=True`` dispatches by mime to the in-sandbox decoders —
    ``image/bmp`` (pure numpy) and ``audio/wav`` (stdlib wave) are
    REAL end-to-end; any other format raises NotImplementedError
    (plug PIL/librosa/ffmpeg there in production). The deterministic
    fake (default) derives an 8-dim feature from the payload's sha1
    so tests exercise identical plumbing with stable values.
    """
    if real:
        if mime == "image/bmp":
            return decode_bmp(payload)
        if mime in ("audio/wav", "audio/x-wav"):
            return decode_wav(payload)
        raise NotImplementedError(
            f"real {kind} decode for mime={mime} requires codec libraries "
            "not present in this container"
        )
    digest = hashlib.sha1(payload or b"").digest()
    return (
        np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float32) / 255.0
    )


def extract_features(
    media: DataFrame, batch_rows: int = 256, real: bool = False
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The iterator form keeps peak memory at one Arrow batch of payloads;
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch_rows
    in production.

    ``real=True`` decodes the payload for real (BMP/WAV in-sandbox;
    see decode_stub) and emits an 8-dim summary feature:
    [mean, std, min, max, n_elements, dim0, dim1, n_channels] of the
    decoded sample/pixel array, values scaled to [0, 1] where bounded.
    """

    def _feature(p: bytes, kind: str, mime: str | None) -> list[float]:
        arr = decode_stub(p, kind, real=real, mime=mime)
        if not real:
            return arr.tolist()
        a = arr.astype(np.float64)
        # scale by the dtype's full range, not a fixed 16-bit divisor:
        # decode_wav returns int32 for 4-byte PCM, which a 2**15 scale
        # would leave ~65536× outside the documented [-1, 1] band
        scale = {
            np.dtype(np.uint8): 255.0,
            np.dtype(np.int16): 32768.0,
            np.dtype(np.int32): 2147483648.0,
        }.get(arr.dtype, 32768.0)
        return [
            float(a.mean() / scale),
            float(a.std() / scale),
            float(a.min() / scale),
            float(a.max() / scale),
            float(a.size),
            float(arr.shape[0]),
            float(arr.shape[1] if arr.ndim > 1 else 1),
            float(arr.shape[2] if arr.ndim > 2 else 1),
        ]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _feature(p, k, m)
                for p, k, m in zip(pdf["payload"], pdf["kind"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "sha1": [
                        hashlib.sha1(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    cols = ["media_id", "kind", "payload"]
    src = media
    if "mime" not in media.columns:
        src = media.withColumn("mime", F.lit(None).cast("string"))
    return src.select(*cols, "mime").mapInPandas(_extract, schema=FEATURE_SCHEMA)


def binary_metadata(media: DataFrame) -> DataFrame:
    """Payload metadata without decoding — pure Catalyst expressions."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").cast("long").alias("n_bytes"),
        F.sha1("payload").alias("sha1"),
        F.substring(F.base64("payload"), 1, 8).alias("head_b64"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per sampled frame index.

    Decode is stubbed; what is real is the explode shape a frame
    sampler produces (media_id, frame_idx) — duration comes from the
    metadata map, never the payload.
    """
    duration = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(duration - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
