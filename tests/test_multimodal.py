"""Multimodal operator contract: real stdlib codecs and Arrow plumbing."""

from __future__ import annotations

import pytest

from lyft_presto_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    decode_media,
    documents_as_media,
    encode_bmp,
    encode_ppm,
    encode_wav_pcm16,
    extract_features,
)
from lyft_presto_spark.session import load_table


def test_compressed_codecs_raise():
    # Formats needing external libraries stay explicit errors.
    with pytest.raises(ValueError):
        decode_media(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0jpeg", codec="real")


def test_wav_roundtrip():
    samples = [(i * 37) % 1000 - 500 for i in range(4000)]
    meta = decode_media(encode_wav_pcm16(samples, sample_rate=16000))
    assert meta["container"] == "wav"
    assert meta["sample_rate"] == 16000
    assert meta["n_samples"] == 4000
    assert meta["duration_s"] == pytest.approx(0.25)
    assert meta["mean_value"] == pytest.approx(sum(samples) / 4000)


def test_ppm_bmp_roundtrip():
    p = decode_media(encode_ppm(17, 5, 200))
    assert (p["container"], p["width"], p["height"], p["n_samples"]) == ("ppm", 17, 5, 85)
    assert p["mean_value"] == 200.0
    # Odd width exercises BMP 4-byte row-stride padding.
    b = decode_media(encode_bmp(33, 8, 9))
    assert (b["container"], b["width"], b["height"], b["n_samples"]) == ("bmp", 33, 8, 264)
    assert b["mean_value"] == 9.0


def test_y4m_roundtrip_and_frame_sampling():
    from lyft_presto_spark.operators.multimodal import decode_y4m, encode_y4m

    blob = encode_y4m(8, 4, [10 + f for f in range(9)], fps=25)
    full = decode_y4m(blob, frame_stride=1)
    assert (full["container"], full["width"], full["height"]) == ("y4m", 8, 4)
    assert full["n_frames"] == 9 and full["n_sampled"] == 9
    assert full["duration_s"] == pytest.approx(9 / 25)
    assert full["sampled_mean"] == pytest.approx(14.0)  # mean of 10..18
    sampled = decode_y4m(blob, frame_stride=4)
    assert sampled["n_sampled"] == 3  # frames 0, 4, 8
    assert sampled["sampled_mean"] == pytest.approx((10 + 14 + 18) / 3)
    with pytest.raises(ValueError):
        decode_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420\n")  # subsampled layout unsupported


def test_real_codec_through_feature_path():
    f = decode_audio(encode_wav_pcm16([100] * 800), codec="real")
    assert f["byte_mean"] == 100.0
    assert f["header_hex"].startswith("52494646")  # 'RIFF'


def test_fake_codec_deterministic():
    a = decode_image(b"hello world", codec="fake")
    b = decode_image(b"hello world", codec="fake")
    assert a == b
    assert a["n_bytes"] == 11
    assert a["header_hex"] == b"hello wo".hex()


def test_media_schema_is_binary(spark, sf_dir):
    media = documents_as_media(load_table(spark, sf_dir, "documents"))
    assert dict(media.dtypes)["blob"] == "binary"
    feats = extract_features(media.limit(50), codec="fake")
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r["n_bytes"] > 0 for r in rows)
    assert set(r["kind"] for r in rows) <= {"image", "audio", "video"}
