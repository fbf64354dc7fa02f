"""Multimodal catalog entry: drive the binary-column feature pipeline
(`operators/multimodal.py`) from the driver-provided `documents`
table so the mapInPandas plumbing is exercised by the correctness
gate, not only by pytest.

The media table is derived deterministically — payload = UTF-8 bytes
of the document text, modality cycles by doc_id — so every number
downstream is reproducible. No SQL oracle: an Arrow-batched pandas
UDF histogram over binary payloads is not SQL-expressible, so the
driver records the rows-only check (per the build contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_features, fake_decoder
from .catalog import load, widen

MODALITIES = ("image", "audio", "video")


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(media_id, modality, payload, meta) rows derived from documents:
    the opaque-binary + typed-metadata shape of a real media lake."""
    d = widen(load(spark, sf_dir, "documents"))
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % len(MODALITIES) + 1).cast("int"),
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 32 + 1).cast("int").alias("n_frames"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


def q42_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → 8-bin histogram feature per media row via the
    Arrow-batched mapInPandas operator (deterministic fake decoder —
    real codecs are stubbed per the environment contract). Narrow map,
    no shuffle: at 100 TB each scan partition streams its payloads
    through Python once, bounded by the Arrow batch size."""
    media = media_from_documents(spark, sf_dir)
    feats = extract_features(media, decoder=fake_decoder)
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        # ASCII payloads land in bins 1-3 (codes 32..127); report the
        # two populated ones so the check has signal
        F.round(F.element_at("feature", 3), 9).alias("bin2"),
        F.round(F.element_at("feature", 4), 9).alias("bin3"),
    )


MEDIA_QUERIES = {
    "q42_multimodal_features": (q42_multimodal_features, None),
}
