"""Unit tests for the hand-built AVI/MJPEG container
(operators/avi.py): structure roundtrip, idx1 offset convention,
word-alignment padding, loud seams for non-MJPG streams."""

from __future__ import annotations

import struct

import pytest

from spark_hive_spark.operators.avi import (
    avi_frame_image,
    encode_avi_mjpeg,
    encode_jpeg,
    parse_avi,
)


def _fixture(d=3, n=5):
    frames = [encode_jpeg(avi_frame_image(d, f)) for f in range(n)]
    h, w, _ = avi_frame_image(d, 0).shape
    return frames, encode_avi_mjpeg(frames, w, h)


def test_structure_and_index_agree():
    frames, blob = _fixture()
    info = parse_avi(blob)
    assert info["n_frames"] == len(frames)
    assert info["frame_spans"] == info["movi_spans"]
    for f, (s, sz) in enumerate(info["frame_spans"]):
        assert blob[s : s + sz] == frames[f]
        assert blob[s : s + 2] == b"\xff\xd8"  # SOI right at the span


def test_odd_payload_padding():
    """An odd-length frame payload forces the word-align pad byte;
    spans and subsequent chunks must stay correct."""
    frames = [b"\xff\xd8" + b"x" * 31, b"\xff\xd8" + b"y" * 32]
    blob = encode_avi_mjpeg(frames, 8, 8)
    info = parse_avi(blob)
    assert [sz for _, sz in info["frame_spans"]] == [33, 34]
    for f, (s, sz) in enumerate(info["frame_spans"]):
        assert blob[s : s + sz] == frames[f]


def test_loud_seams():
    _, blob = _fixture(n=2)
    bad = bytearray(blob)
    i = blob.index(b"vids")
    bad[i + 4 : i + 8] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPG"):
        parse_avi(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"nope" + blob[4:])


def test_header_fields():
    frames, blob = _fixture(d=7, n=8)
    info = parse_avi(blob)
    h, w, _ = avi_frame_image(7, 0).shape
    assert (info["width"], info["height"]) == (w, h)
    assert info["us_per_frame"] == 40_000
