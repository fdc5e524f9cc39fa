"""Unit tests for the hand-built IMA ADPCM decoder
(operators/adpcm.py): spec landmarks (clamps at both rails, index
clamps at 0/88, low-nibble-first order), container validation, and
the fact-count consistency seam."""

from __future__ import annotations

import struct

import pytest

from spark_hive_spark.operators.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    decode_ima_wav,
    encode_ima_wav,
    ima_decode_block,
    samples_per_block,
)


def test_step_tables_are_the_published_ones():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert INDEX_TABLE == [-1, -1, -1, -1, 2, 4, 6, 8] * 2


def test_low_nibble_first_and_first_steps():
    # byte 0x80: low nibble 0 (+step/8), high nibble 8 (-step'/8)
    # from index 0: step 7 -> +0 (7>>3), index stays clamped at 0
    out = ima_decode_block(100, 0, bytes([0x80]))
    assert out[0] == 100          # header predictor is sample 0
    assert out[1] == 100 + (7 >> 3)   # nibble 0 first (low)
    assert out[2] == out[1] - (7 >> 3)  # then nibble 8


def test_positive_clamp_and_index_rail():
    # max-magnitude nibble 7 repeatedly from the top step: predictor
    # must pin at 32767 and index at 88, never overflow
    out = ima_decode_block(32000, 88, bytes([0x77] * 8))
    assert max(out) == 32767 and out[-1] == 32767
    out = ima_decode_block(-32000, 88, bytes([0xFF] * 8))
    assert min(out) == -32768 and out[-1] == -32768


def test_index_lower_rail():
    # nibble 0 decrements the index; from 0 it must clamp, not -1
    out = ima_decode_block(0, 0, bytes([0x00] * 50))
    assert len(out) == 101  # no crash == no negative index


def test_container_roundtrip_and_fact_seam():
    blob = encode_ima_wav(11)
    rate, n, samples = decode_ima_wav(blob)
    assert rate == 8000 and n == len(samples) == 2 * samples_per_block()
    # corrupt the fact count -> loud
    bad = bytearray(blob)
    i = blob.index(b"fact") + 8
    bad[i:i + 4] = struct.pack("<I", n + 1)
    with pytest.raises(ValueError, match="fact"):
        decode_ima_wav(bytes(bad))
    # non-IMA format tag -> loud
    bad = bytearray(blob)
    i = blob.index(b"fmt ") + 8
    bad[i:i + 2] = struct.pack("<H", 1)
    with pytest.raises(NotImplementedError):
        decode_ima_wav(bytes(bad))
