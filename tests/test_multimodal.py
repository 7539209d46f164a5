"""Multimodal operator contract: stub behavior and Arrow plumbing."""

from __future__ import annotations

import pytest

from lyft_presto_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    documents_as_media,
    extract_features,
)
from lyft_presto_spark.session import load_table


def test_real_codecs_are_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", codec="real")
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF", codec="real")


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
