"""Cleaning/masking/scoring expression library + multimodal pandas-UDF
operators. Golden values mirror the reference's notebook assertions
(``tests/test_silver_transforms.py:60-183``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_delta_lake_project_spark.functions import (
    age_bucket,
    clean_email,
    clean_phone,
    engagement_score,
    full_name,
    health_score,
    is_group_member,
    mask_email,
    mask_phone,
    secured_view,
    validate_domain,
)
from databricks_delta_lake_project_spark.functions.masking import GROUPS_CONF_KEY
from databricks_delta_lake_project_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_decoder,
    resize_images,
    sample_frames,
)


def test_cleaning_golden_values(spark):
    df = spark.createDataFrame(
        [
            ("  John@EXAMPLE.com  ", " john ", " doe ", "+1 (555) 123-4567", "GOLD"),
            (None, None, "x", None, "bad-tier"),
        ],
        "email string, first string, last string, phone string, tier string",
    )
    out = df.select(
        clean_email(F.col("email")).alias("email"),
        full_name(F.col("first"), F.col("last")).alias("name"),
        clean_phone(F.col("phone")).alias("phone"),
        validate_domain(
            F.col("tier"), ["bronze", "silver", "gold", "platinum"]
        ).alias("tier"),
    ).collect()
    assert out[0]["email"] == "john@example.com"
    assert out[0]["name"] == "John Doe"
    assert out[0]["phone"] == "+15551234567"
    assert out[0]["tier"] == "gold"
    assert out[1]["email"] is None  # nulls preserved
    assert out[1]["tier"] == "unknown"  # invalid -> fallback


def test_scoring_golden_values(spark):
    df = spark.createDataFrame(
        [(22, 10, 2, 0, 10, 6, 0), (70, 0, 0, 30, 200, 0, 1)],
        "age int, sessions int, purchases int, tickets int, "
        "recency int, orders int, open_tickets int",
    )
    out = df.select(
        age_bucket(F.col("age")).alias("bucket"),
        engagement_score(
            F.col("sessions"), F.col("purchases"), F.col("tickets")
        ).alias("score"),
        health_score(F.col("recency"), F.col("orders"), F.col("open_tickets")).alias(
            "health"
        ),
    ).collect()
    assert out[0]["bucket"] == "18-24"
    assert out[0]["score"] == 40  # 10*2 + 2*10 - 0, under cap
    assert out[0]["health"] == "excellent"
    assert out[1]["bucket"] == "65+"
    assert out[1]["score"] == 0  # floor at 0
    assert out[1]["health"] == "churned"


def test_masking_and_secured_view(spark):
    df = spark.createDataFrame(
        [(1, "alice@example.com", "5551234567", "US"),
         (2, None, None, "DE")],
        "id long, email string, phone string, country string",
    )
    masks = {
        "email": mask_email(F.col("email")),
        "phone": mask_phone(F.col("phone")),
    }
    # unprivileged session: masked + row-filtered
    spark.conf.set(GROUPS_CONF_KEY, "analysts")
    assert not is_group_member(spark, "pii_readers")
    v = secured_view(
        spark, df, "v_masked", masks, row_filter=F.col("country") == "US"
    )
    rows = v.collect()
    assert len(rows) == 1
    assert rows[0]["email"] == "al***@example.com"
    assert rows[0]["phone"] == "***-***-4567"
    assert spark.sql("SELECT email FROM v_masked").first()["email"].startswith("al***")

    # privileged session: untouched
    spark.conf.set(GROUPS_CONF_KEY, "analysts,pii_readers")
    v2 = secured_view(spark, df, "v_clear", masks)
    assert {r["email"] for r in v2.collect()} == {"alice@example.com", None}
    spark.conf.unset(GROUPS_CONF_KEY)


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", bytes(range(200)), (10, 20, None, None, "raw")),
        (2, "audio", bytes([100] * 64), (None, None, 16000, None, "pcm")),
        (3, "video", bytes(range(120)), (4, 5, None, 6, "rawv")),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_video_rejects_non_y4m(media):
    # all three modalities decode for real now; a non-Y4M video payload
    # fails loudly in the parser instead of producing fake features
    with pytest.raises(Exception, match="YUV4MPEG2"):
        extract_features(media.filter(F.col("modality") == "video")).collect()


def test_real_y4m_decoder_roundtrip():
    from databricks_delta_lake_project_spark.operators.multimodal import (
        decode_y4m,
    )

    # mono: 2 frames of 4x1 luma
    mono = (
        b"YUV4MPEG2 W4 H1 F25:1 Cmono\n"
        b"FRAME\n\x01\x02\x03\x04"
        b"FRAME\n\x05\x06\x07\x08"
    )
    assert decode_y4m(mono).tolist() == [1, 2, 3, 4, 5, 6, 7, 8]
    # 444: one 1x1 frame carries 3 plane bytes; FRAME params allowed
    c444 = b"YUV4MPEG2 W1 H1 F30:1 C444\nFRAME Xsome\n\x09\x0a\x0b"
    assert decode_y4m(c444).tolist() == [9, 10, 11]
    # 420: 2x2 frame = 4 luma + 1 Cb + 1 Cr
    c420 = b"YUV4MPEG2 W2 H2 F25:1\nFRAME\n\x01\x02\x03\x04\x05\x06"
    assert decode_y4m(c420).tolist() == [1, 2, 3, 4, 5, 6]
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"RIFFxxxx")
    with pytest.raises(ValueError, match="even dimensions"):
        decode_y4m(b"YUV4MPEG2 W3 H1 F25:1 C420\nFRAME\n\x00")
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(b"YUV4MPEG2 W4 H1 F25:1 Cmono\nFRAME\n\x01\x02")


def test_media_video_payloads_are_real_y4m(spark):
    from databricks_delta_lake_project_spark.operators.multimodal import (
        decode_y4m,
    )
    from databricks_delta_lake_project_spark.queries.media import (
        media_from_documents,
    )

    from conftest import SF_SMALL

    rows = (
        media_from_documents(spark, SF_SMALL)
        .filter(F.col("modality") == "video")
        .limit(10)
        .collect()
    )
    assert rows
    for r in rows:
        decoded = decode_y4m(bytes(r["payload"]))
        assert len(decoded) % 4 == 0 and len(decoded) > 0
        assert decoded.max() <= 127  # ASCII text bytes


def test_real_ppm_wav_decoders_roundtrip():
    import numpy as np

    from databricks_delta_lake_project_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
    )

    rgb = bytes(range(30))  # 10 RGB pixels
    ppm = b"P6\n# a comment\n10 1\n255\n" + rgb
    assert decode_ppm(ppm).tolist() == list(rgb)
    pgm = b"P5\n4 2\n255\n" + bytes([7, 8, 9, 10, 11, 12, 13, 14])
    assert decode_ppm(pgm).tolist() == [7, 8, 9, 10, 11, 12, 13, 14]
    with pytest.raises(ValueError, match="magic"):
        decode_ppm(b"P3\n1 1\n255\n abc")

    import struct

    samples = bytes([0, 100, 200, 255])
    wav = (
        b"RIFF" + struct.pack("<I", 36 + len(samples)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 16000, 1, 8)
        + b"data" + struct.pack("<I", len(samples)) + samples
    )
    assert decode_wav(wav).tolist() == [0.0, 100.0, 200.0, 255.0]
    s16 = struct.pack("<4h", -32768, -1, 1, 32767)
    wav16 = (
        b"RIFF" + struct.pack("<I", 36 + len(s16)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(s16)) + s16
    )
    assert decode_wav(wav16).tolist() == [-32768.0, -1.0, 1.0, 32767.0]
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")


def test_media_payloads_are_real_formats(spark):
    # the JVM-assembled PPM/WAV payloads parse with the real decoders
    # and decode back to exactly the document text bytes
    from databricks_delta_lake_project_spark.operators.multimodal import (
        decode_ppm,
        decode_wav,
    )
    from databricks_delta_lake_project_spark.queries.media import (
        media_from_documents,
    )

    from conftest import SF_SMALL

    rows = (
        media_from_documents(spark, SF_SMALL)
        .filter(F.col("modality") != "video")
        .limit(20)
        .collect()
    )
    assert rows
    for r in rows:
        payload = bytes(r["payload"])
        if r["modality"] == "image":
            assert payload[:3] == b"P6\n"
            decoded = decode_ppm(payload)
        else:
            assert payload[:4] == b"RIFF"
            decoded = decode_wav(payload)
        assert len(decoded) > 0
        assert decoded.max() <= 255 and decoded.min() >= 0


def test_extract_features_fake_decoder(media):
    out = {r["media_id"]: r for r in extract_features(media, decoder=fake_decoder).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["n_bytes"] == 200
    f1 = out[1]["feature"]
    assert len(f1) == 8 and abs(sum(f1) - 1.0) < 1e-9
    # audio payload is constant 100 -> all mass in one bin
    f2 = out[2]["feature"]
    assert max(f2) == 1.0 and sum(1 for x in f2 if x > 0) == 1


def test_extract_features_prunes_unused_input_columns(media):
    """mapInPandas is opaque to Catalyst, so extract_features must
    project its input to exactly (media_id, modality, payload) before
    the Python boundary — otherwise every other column (the meta
    struct here) is read and Arrow-serialized just to be dropped
    (guide §4.1). Pinned on the physical plan: no `meta` reference
    survives optimization."""
    out = extract_features(media, decoder=fake_decoder)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the Project feeding the Python boundary carries exactly the three
    # consumed columns (the in-memory RDD scan itself cannot prune, so
    # assert on the MapInPandas/Project lines, not the whole plan)
    boundary = [
        ln for ln in plan.splitlines()
        if "MapInPandas" in ln or "Project" in ln
    ]
    assert boundary and all("meta" not in ln for ln in boundary), plan
    # and the results are unchanged by the projection
    rows = {r["media_id"]: r["n_bytes"] for r in out.collect()}
    assert rows == {1: 200, 2: 64, 3: 120}


def test_resize_images(media):
    out = resize_images(media, width=4, height=3, decoder=fake_decoder).collect()
    assert len(out) == 1  # only the image row
    r = out[0]
    assert r["width"] == 4 and r["height"] == 3
    assert len(r["payload"]) == 12  # 4*3 resampled bytes
    assert r["payload"][0] == 0 and r["payload"][-1] == 199  # endpoints kept


def test_sample_frames(media):
    out = sample_frames(media, every_n=2, decoder=fake_decoder).collect()
    # video: 6 frames, every 2nd -> frames 0, 2, 4
    assert [(r["media_id"], r["frame_idx"]) for r in out] == [
        (3, 0), (3, 2), (3, 4)
    ]
    assert all(len(r["frame"]) == 20 for r in out)  # 120 bytes / 6 frames
