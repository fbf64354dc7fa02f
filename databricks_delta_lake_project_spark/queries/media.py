"""Multimodal catalog entry: drive the binary-column feature pipeline
(`operators/multimodal.py`) from the driver-provided `documents`
table so the mapInPandas plumbing is exercised by the correctness
gate, not only by pytest.

The media table is derived deterministically and the payloads are REAL
format-conformant binaries built JVM-side from the document text:

* image rows carry a binary P6 PPM (ASCII header + raw RGB bytes);
* audio rows carry a RIFF/WAVE PCM-8 file (44-byte header assembled
  from little-endian hex + sample bytes);
* video rows carry a YUV4MPEG2 (.y4m) mono-chroma stream (stream
  header + FRAME-delimited raw luma planes from the text bytes).

q42 decodes the image/audio payloads and q49 the video payloads with
the REAL pure-numpy PPM/WAV/Y4M parsers and emits byte-histogram
features. Because the document text
is ASCII, decoded sample values equal character code points — so the
whole decode → histogram pipeline has an exact DuckDB oracle
(Q42_SQL) despite running through an Arrow-batched pandas UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import default_decoder, extract_features
from .catalog import load, widen

MODALITIES = ("image", "audio", "video")

WAV_SAMPLE_RATE = 16000


def _le_hex(n: Column | int, nbytes: int) -> Column:
    """Little-endian fixed-width hex rendering of an integer column —
    the building block for assembling binary RIFF headers with pure
    JVM expressions (unhex of the concatenated hex string)."""
    col = F.lit(n) if isinstance(n, int) else n
    h = F.lpad(F.hex(col.cast("long")), 2 * nbytes, "0")
    return F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in range(nbytes - 1, -1, -1)]
    )


def ppm_payload(text: Column) -> Column:
    """Binary P6 PPM built from ASCII text: width = len//3 pixels in
    one row, raw RGB = the first 3*width text bytes. Pure JVM concat
    of encoded strings — no Python in the construction path."""
    width = F.floor(F.length(text) / 3).cast("int")
    header = F.concat(
        F.lit("P6\n"), width.cast("string"), F.lit(" 1\n255\n")
    )
    body = text.substr(F.lit(1), width * 3)
    return F.concat(F.encode(header, "UTF-8"), F.encode(body, "UTF-8"))


def wav_payload(text: Column, sample_rate: int = WAV_SAMPLE_RATE) -> Column:
    """RIFF/WAVE PCM 8-bit mono file from ASCII text bytes: the
    canonical 44-byte header assembled as a hex string (little-endian
    size fields) and unhex'd, then the text bytes as unsigned samples.
    """
    n = F.length(text)
    header_hex = F.concat(
        F.lit("52494646"),  # "RIFF"
        _le_hex(n + 36, 4),
        F.lit("57415645666D7420"),  # "WAVEfmt "
        _le_hex(16, 4),  # fmt chunk size
        _le_hex(1, 2),  # PCM
        _le_hex(1, 2),  # mono
        _le_hex(sample_rate, 4),
        _le_hex(sample_rate, 4),  # byte rate = rate * 1 ch * 1 byte
        _le_hex(1, 2),  # block align
        _le_hex(8, 2),  # bits per sample
        F.lit("64617461"),  # "data"
        _le_hex(n, 4),
    )
    return F.concat(F.unhex(header_hex), F.encode(text, "UTF-8"))


Y4M_WIDTH = 4
Y4M_HEADER = f"YUV4MPEG2 W{Y4M_WIDTH} H1 F25:1 Cmono\n"


def y4m_payload(text: Column) -> Column:
    """Uncompressed YUV4MPEG2 (mono chroma) stream from ASCII text:
    the stream header, then one 4x1 luma frame per 4 text characters
    (``FRAME\\n`` marker + raw bytes). Pure JVM expression — the frame
    chunks come from ``substr`` over a generated index sequence."""
    n_frames = F.floor(F.length(text) / Y4M_WIDTH).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.concat(
            F.lit("FRAME\n"),
            text.substr(i * Y4M_WIDTH + 1, F.lit(Y4M_WIDTH)),
        ),
    )
    body = F.when(n_frames > 0, F.concat_ws("", frames)).otherwise(F.lit(""))
    return F.encode(F.concat(F.lit(Y4M_HEADER), body), "UTF-8")


def media_from_documents(
    spark: SparkSession, sf_dir: str, docs_predicate: Column | None = None
) -> DataFrame:
    """(media_id, modality, payload, meta) rows derived from documents:
    the opaque-binary + typed-metadata shape of a real media lake.
    Image, audio, and video payloads are real PPM/WAV/Y4M binaries.
    ``docs_predicate`` filters the source documents before payload
    construction (oracle guards)."""
    d = widen(load(spark, sf_dir, "documents"))
    if docs_predicate is not None:
        d = d.filter(docs_predicate)
    modality = F.element_at(
        F.array(*[F.lit(m) for m in MODALITIES]),
        (F.col("doc_id") % len(MODALITIES) + 1).cast("int"),
    )
    text = F.col("text")
    payload = (
        F.when(modality == "image", ppm_payload(text))
        .when(modality == "audio", wav_payload(text))
        .otherwise(y4m_payload(text))
    )
    return d.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        payload.alias("payload"),
        F.struct(
            F.floor(F.length(text) / 3).cast("int").alias("width"),
            F.lit(1).alias("height"),
            F.lit(WAV_SAMPLE_RATE).alias("sample_rate"),
            (F.col("n_chars") % 32 + 1).cast("int").alias("n_frames"),
            F.lit("raw").alias("format"),
        ).alias("meta"),
    )


def q42_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode → 8-bin byte histogram per media row via the
    Arrow-batched mapInPandas operator: PPM images and WAV audio are
    parsed by the pure-numpy decoders (video has its own oracle
    query, q49). Narrow map, no shuffle: at 100 TB each scan
    partition streams its payloads through Python once, bounded by the
    Arrow batch size.

    ASCII text ⇒ decoded byte values equal character code points, so
    DuckDB reproduces every histogram fraction exactly (Q42_SQL). The
    identity needs two guards, applied identically in both engines:

    * length: an image doc with len(text) < 3 would build a 0-pixel
      PPM — Spark would emit zero fractions while the oracle's hist
      join sees no characters; empty audio likewise. Both sides filter
      to length(text) >= 3, so every surviving payload decodes to >= 1
      sample under either modality.
    * ASCII-only: a multi-byte UTF-8 character desyncs Spark's byte
      histogram from the oracle's per-codepoint one, so non-ASCII docs
      are excluded on both sides (rlike / regexp_matches on the same
      [\\x00-\\x7F]* pattern).
    """
    guards = (F.length("text") >= 3) & F.col("text").rlike(
        "^[\\x00-\\x7F]*$"
    )
    media = media_from_documents(spark, sf_dir, docs_predicate=guards).filter(
        F.col("modality") != "video"
    )
    feats = extract_features(media, decoder=default_decoder)
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        # ASCII payload bytes land in bins 1-3 (codes 32..127); emit
        # the raw double fractions — identical IEEE division on both
        # engines, no rounding
        F.element_at("feature", 2).alias("bin1"),
        F.element_at("feature", 3).alias("bin2"),
        F.element_at("feature", 4).alias("bin3"),
    )


# DuckDB mirror: per-character code points of the decoded sample bytes
# (image = first 3*(len//3) chars, audio = all chars), 32-wide bins.
# n_bytes counts the whole binary payload: PPM header is
# 'P6\n' (3) + digits(width) + ' 1\n255\n' (7) + 3*width raw bytes;
# WAV is the 44-byte canonical header + len samples.
Q42_SQL = """
WITH base AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'image' ELSE 'audio' END AS modality,
    CASE WHEN doc_id % 3 = 0
         THEN substring(text, 1, 3 * (length(text) // 3))
         ELSE text END AS s,
    length(text) AS len
  FROM documents
  WHERE doc_id % 3 IN (0, 1)
    AND length(text) >= 3
    AND regexp_matches(text, '^[\\x00-\\x7F]*$')
), chars AS (
  SELECT doc_id, unicode(c) // 32 AS bin
  FROM (SELECT doc_id, unnest(string_split(s, '')) AS c FROM base)
), hist AS (
  SELECT doc_id, COUNT(*) AS n,
    SUM(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS b1,
    SUM(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS b2,
    SUM(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS b3
  FROM chars GROUP BY 1
)
SELECT b.doc_id AS media_id, b.modality,
  CASE WHEN b.modality = 'image'
       THEN 10 + length(CAST(b.len // 3 AS VARCHAR)) + 3 * (b.len // 3)
       ELSE 44 + b.len END AS n_bytes,
  CAST(h.b1 AS DOUBLE) / CAST(h.n AS DOUBLE) AS bin1,
  CAST(h.b2 AS DOUBLE) / CAST(h.n AS DOUBLE) AS bin2,
  CAST(h.b3 AS DOUBLE) / CAST(h.n AS DOUBLE) AS bin3
FROM base b JOIN hist h ON h.doc_id = b.doc_id
"""


def q49_video_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video flavor of q42: decode the Y4M payloads with the REAL
    pure-numpy YUV4MPEG2 parser through the same Arrow-batched
    mapInPandas operator and emit byte-histogram features — all three
    modalities now decode real containers (q42: PPM/WAV, q49: Y4M).

    Guards mirror q42's: length(text) >= frame width (so at least one
    frame exists) and ASCII-only (byte histogram == codepoint
    histogram), applied identically in Q49_SQL. Only the first
    ``4*(len//4)`` characters land in frames — the oracle truncates
    the same way.
    """
    guards = (F.length("text") >= Y4M_WIDTH) & F.col("text").rlike(
        "^[\\x00-\\x7F]*$"
    )
    media = media_from_documents(spark, sf_dir, docs_predicate=guards).filter(
        F.col("modality") == "video"
    )
    feats = extract_features(media, decoder=default_decoder)
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        F.element_at("feature", 2).alias("bin1"),
        F.element_at("feature", 3).alias("bin2"),
        F.element_at("feature", 4).alias("bin3"),
    )


# n_bytes = 28-byte stream header + per-frame ("FRAME\n" + width) bytes
Q49_SQL = f"""
WITH base AS (
  SELECT doc_id,
    substring(text, 1, {Y4M_WIDTH} * (length(text) // {Y4M_WIDTH})) AS s,
    length(text) // {Y4M_WIDTH} AS n_frames
  FROM documents
  WHERE doc_id % 3 = 2
    AND length(text) >= {Y4M_WIDTH}
    AND regexp_matches(text, '^[\\x00-\\x7F]*$')
), chars AS (
  SELECT doc_id, unicode(c) // 32 AS bin
  FROM (SELECT doc_id, unnest(string_split(s, '')) AS c FROM base)
), hist AS (
  SELECT doc_id, COUNT(*) AS n,
    SUM(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS b1,
    SUM(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS b2,
    SUM(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS b3
  FROM chars GROUP BY 1
)
SELECT b.doc_id AS media_id, 'video' AS modality,
  {len(Y4M_HEADER)} + b.n_frames * (6 + {Y4M_WIDTH}) AS n_bytes,
  CAST(h.b1 AS DOUBLE) / CAST(h.n AS DOUBLE) AS bin1,
  CAST(h.b2 AS DOUBLE) / CAST(h.n AS DOUBLE) AS bin2,
  CAST(h.b3 AS DOUBLE) / CAST(h.n AS DOUBLE) AS bin3
FROM base b JOIN hist h ON h.doc_id = b.doc_id
"""


MEDIA_QUERIES = {
    "q42_multimodal_features": (q42_multimodal_features, Q42_SQL),
    "q49_video_features": (q49_video_features, Q49_SQL),
}
