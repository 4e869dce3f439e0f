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


def decode_stub(payload: bytes, kind: str, real: bool = False) -> np.ndarray:
    """Codec boundary. Real decode is NOT available in this container.

    ``real=True`` raises NotImplementedError (plug PIL/librosa/ffmpeg
    here in production). The deterministic fake derives an 8-dim
    feature from the payload's sha1 so tests exercise identical
    plumbing with stable values.
    """
    if real:
        raise NotImplementedError(
            f"real {kind} decode requires codec libraries not present in this container"
        )
    digest = hashlib.sha1(payload or b"").digest()
    return (
        np.frombuffer(digest[:8], dtype=np.uint8).astype(np.float32) / 255.0
    )


def extract_features(media: DataFrame, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    The iterator form keeps peak memory at one Arrow batch of payloads;
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch_rows
    in production.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
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

    return media.select("media_id", "kind", "payload").mapInPandas(
        _extract, schema=FEATURE_SCHEMA
    )


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
