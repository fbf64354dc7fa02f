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
* Decoders: image (PPM P5/P6), audio (WAV PCM 8/16-bit), and video
  (Y4M / YUV4MPEG2 uncompressed, mono/444/420 chroma) are REAL
  pure-numpy parsers of the public formats — no external codec
  library needed. Compressed video codecs (H.264 etc.) would need
  ffmpeg, which this container lacks; a real deployment swaps the
  decoder callable, nothing else changes.
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


def decode_ppm(payload: bytes) -> np.ndarray:
    """Real netpbm decoder (binary P5 grayscale / P6 RGB, maxval<=255):
    parse the ASCII header tokens (magic, width, height, maxval —
    ``#`` comments allowed), then read width*height*channels raw bytes
    starting after the single whitespace that terminates the header.
    Pure numpy; returns the pixel values as float64."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < 4:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(payload[i:j])
        i = j
    magic, width, height, maxval = toks[0], int(toks[1]), int(toks[2]), int(toks[3])
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PGM/PPM: magic={magic!r}")
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if magic == b"P6" else 1
    n = width * height * channels
    return np.frombuffer(payload, dtype=np.uint8, count=n, offset=i + 1).astype(
        np.float64
    )


def decode_wav(payload: bytes) -> np.ndarray:
    """Real RIFF/WAVE decoder for PCM 8-bit (unsigned) and 16-bit
    (signed LE) audio: walk the chunk list, read ``fmt `` then
    ``data``. Pure numpy/struct; returns samples as float64."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, fmt = 12, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            if fmt is None:
                raise ValueError("data chunk before fmt chunk")
            bits = fmt[5]
            if bits == 8:
                return np.frombuffer(body, dtype=np.uint8).astype(np.float64)
            if bits == 16:
                return np.frombuffer(body, dtype="<i2").astype(np.float64)
            raise ValueError(f"unsupported PCM width: {bits}")
        i += 8 + size + (size & 1)  # chunks are 2-byte aligned
    raise ValueError("no data chunk")


def decode_y4m(payload: bytes) -> np.ndarray:
    """Real YUV4MPEG2 (.y4m) decoder for uncompressed video: parse the
    stream header (``YUV4MPEG2 W<w> H<h> ... [C<chroma>]``), then read
    each ``FRAME``-delimited raw plane block. Supported chroma:
    ``mono`` (w*h luma bytes/frame), ``444`` (3*w*h), and ``420`` /
    ``420jpeg`` / ``420mpeg2`` / ``420paldv`` (w*h * 3/2, even dims).
    Pure numpy; returns all sample bytes as float64 in stream order."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError(f"not a YUV4MPEG2 stream: {payload[:16]!r}")
    header = payload[:nl].split(b" ")
    params = {t[:1]: t[1:] for t in header[1:] if t}
    if b"W" not in params or b"H" not in params:
        raise ValueError("Y4M header missing W/H")
    w, h = int(params[b"W"]), int(params[b"H"])
    chroma = params.get(b"C", b"420")
    if chroma == b"mono":
        frame_size = w * h
    elif chroma == b"444":
        frame_size = 3 * w * h
    elif chroma.startswith(b"420"):
        if w % 2 or h % 2:
            raise ValueError(f"C420 needs even dimensions, got {w}x{h}")
        frame_size = w * h * 3 // 2
    else:
        raise ValueError(f"unsupported Y4M chroma: {chroma!r}")
    frames: list[np.ndarray] = []
    i = nl + 1
    while i < len(payload):
        j = payload.index(b"\n", i)
        if payload[i:j].split(b" ")[0] != b"FRAME":
            raise ValueError(f"expected FRAME marker at offset {i}")
        i = j + 1
        if i + frame_size > len(payload):
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(payload, np.uint8, frame_size, i))
        i += frame_size
    if not frames:
        return np.empty(0, dtype=np.float64)
    return np.concatenate(frames).astype(np.float64)


def default_decoder(payload: bytes, modality: str) -> np.ndarray:
    """Dispatch to the real pure-numpy decoders: PPM/PGM for images,
    WAV PCM for audio, Y4M for (uncompressed) video. Compressed codecs
    need a real backend — inject it via
    ``extract_features(decoder=...)``."""
    if modality == "image":
        return decode_ppm(payload)
    if modality == "audio":
        return decode_wav(payload)
    if modality == "video":
        return decode_y4m(payload)
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

    The function reads only (media_id, modality, payload), so the
    input is projected to exactly those before the Python boundary:
    ``mapInPandas`` is opaque to Catalyst — without the explicit
    select, every other input column (e.g. the ``meta`` struct of a
    MEDIA_SCHEMA row) is read from storage and Arrow-serialized into
    the Python worker just to be dropped (guide §4.1).
    """
    media = media.select("media_id", "modality", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                samples = decoder(bytes(payload) if payload is not None else b"", modality)
                # range (0,256): bin edges are exact multiples of
                # 256/n_bins, so for byte-valued samples bin(x) is the
                # integer x // (256//n_bins) — SQL-mirrorable exactly
                hist, _ = np.histogram(samples, bins=n_bins, range=(0, 256))
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
