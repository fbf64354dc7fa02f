"""Multimodal column operators: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas`` (beyond-reference training-data surface; SURVEY
§7 phase 7).

Design for 100 TB:

* A media row is ``(media_id, modality, payload binary, meta struct)``.
  Payloads never pass through Python row-at-a-time paths — they move
  in Arrow record batches into the pandas UDF (10-100x cheaper than
  per-row UDFs), and the batch size is bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory
  stays flat regardless of file count.
* Feature extraction is a narrow map — no shuffle; partition count
  follows the scan, so 1000 executors stream 1000 partitions of
  payloads independently.
* The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this
  environment, so ``decode`` is STUBBED: by default it raises
  ``NotImplementedError`` per modality; tests inject the deterministic
  fake (``fake_decoder``) which derives pixel/sample arrays from the
  payload bytes — the Spark-side plumbing (schema, batching, UDF
  signatures, partitioning) is fully real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)

Decoder = Callable[[bytes, str], np.ndarray]


def default_decoder(payload: bytes, modality: str) -> np.ndarray:
    """Real codecs are not available in this environment — decode is a
    clearly-marked stub (per the build brief). Inject ``fake_decoder``
    or a real PIL/ffmpeg-backed decoder in production."""
    raise NotImplementedError(
        f"no codec for modality={modality!r}: install a decoder and pass "
        "it to extract_features(decoder=...)"
    )


def fake_decoder(payload: bytes, modality: str) -> np.ndarray:
    """Deterministic decode fake: interprets payload bytes as uint8
    samples. Keeps every downstream number reproducible in tests."""
    return np.frombuffer(payload or b"\x00", dtype=np.uint8).astype(np.float64)


def extract_features(
    media: DataFrame,
    decoder: Decoder = default_decoder,
    n_bins: int = 8,
) -> DataFrame:
    """Decode payloads and emit fixed-width feature vectors (an
    ``n_bins``-bin normalized histogram) via ``mapInPandas``.

    The iterator-of-batches signature keeps peak memory at one Arrow
    batch of payloads per task regardless of partition size.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                samples = decoder(bytes(payload) if payload is not None else b"", modality)
                hist, _ = np.histogram(samples, bins=n_bins, range=(0, 255))
                total = hist.sum() or 1
                feats.append((hist / total).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    decoder: Decoder = default_decoder,
) -> DataFrame:
    """Image resize plumbing: decode -> (stub) resample -> re-encode as
    raw bytes, with updated metadata. The resample itself is
    nearest-neighbor over the fake sample array — a real build swaps
    the decoder and the interpolation, nothing else changes."""

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            payloads = []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                samples = decoder(bytes(payload) if payload is not None else b"", modality)
                idx = np.linspace(0, max(len(samples) - 1, 0), target).astype(int)
                payloads.append(samples[idx].astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("modality") == "image").mapInPandas(run, out_schema)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
    decoder: Decoder = default_decoder,
) -> DataFrame:
    """Video frame sampling: one output row per kept frame — the row
    explosion happens inside the pandas UDF so no Spark-side explode of
    huge binary arrays is materialized."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                n_frames = (meta or {}).get("n_frames") or 0
                samples = decoder(bytes(payload) if payload is not None else b"", "video")
                if n_frames <= 0:
                    continue
                frame_len = max(len(samples) // n_frames, 1)
                for i in range(0, n_frames, every_n):
                    chunk = samples[i * frame_len : (i + 1) * frame_len]
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(chunk.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.filter(F.col("modality") == "video").mapInPandas(run, out_schema)
