"""Tests for multimodal binary-column plumbing (operators.multimodal)."""

from __future__ import annotations

import hashlib

import pytest

from hadoop_multiple_streaming_spark.operators.multimodal import (
    decode_content,
    extract_features,
    fake_decode_meta,
    sample_frame_offsets,
    synthesize_media,
)


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_content(b"bytes", "image")


def test_extract_features_batch_shape(spark):
    media = synthesize_media(spark, n=20)
    feats = extract_features(media, decoder=fake_decode_meta)
    rows = feats.collect()
    assert len(rows) == 20
    by_id = {r.id: r for r in rows}
    # fingerprint is sha256 over the payload's lowercase-hex rendering
    # (bijective with the bytes; replicable by string-only SQL hashers)
    payload0 = hashlib.md5(b"media-0").digest() * 4
    assert (
        by_id[0].content_sha
        == hashlib.sha256(payload0.hex().encode()).hexdigest()
    )
    assert by_id[0].n_bytes == len(payload0)
    # fake decoder is deterministic: same payload -> same dims
    meta0 = fake_decode_meta(payload0, "video")
    assert (by_id[0].width, by_id[0].height, by_id[0].channels) == (
        meta0["width"],
        meta0["height"],
        meta0["channels"],
    )


def test_sample_frame_offsets_no_decode(spark):
    media = synthesize_media(spark, n=9)
    frames = sample_frame_offsets(media, every_n_seconds=1.0).collect()
    # only video rows (id % 3 == 0) produce frames: 4s at 1/s -> 4 samples
    vids = {r.id for r in frames}
    assert vids == {0, 3, 6}
    f0 = sorted((r for r in frames if r.id == 0), key=lambda r: r.sample_idx)
    assert [r.frame_idx for r in f0] == [0, 30, 60, 90]  # 30 fps
    assert [r.byte_offset for r in f0] == [0, 30 * 1024, 60 * 1024, 90 * 1024]
