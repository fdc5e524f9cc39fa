"""Unit tests for the hand-built Delta deletion-vector stack
(sources/delta_dv.py): Z85 against the ZeroMQ spec vector, the
roaring portable format across all three container types (+ a
hypothesis roundtrip), and the DV file framing's loud seams."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spark_hive_spark.sources.delta_dv import (
    _COOKIE_NO_RUN,
    _COOKIE_RUN,
    rba_deserialize,
    rba_serialize,
    read_dv_descriptor,
    roaring32_deserialize,
    roaring32_serialize,
    write_dv_file,
    z85_decode,
    z85_encode,
)


def test_z85_spec_vector():
    # the ZeroMQ spec 32 reference vector
    data = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(data) == "HelloWorld"
    assert z85_decode("HelloWorld") == data
    with pytest.raises(ValueError):
        z85_encode(b"abc")  # not 4-aligned


def test_roaring_container_types():
    # array (sparse), run (contiguous), bitmap (>4096 in one chunk)
    sparse = [3, 9, 100, 65535, 65536, 131072]
    contiguous = list(range(1000, 1500))
    dense = list(range(0, 20000, 2))  # 10000 > 4096 in chunk 0
    for vals in (sparse, contiguous, dense, []):
        got, _ = roaring32_deserialize(roaring32_serialize(vals))
        assert got == sorted(set(vals))
    # container choice is visible in the cookie
    (c_run,) = struct.unpack_from("<I", roaring32_serialize(contiguous))
    assert (c_run & 0xFFFF) == _COOKIE_RUN
    (c_arr,) = struct.unpack_from("<I", roaring32_serialize(sparse))
    assert c_arr == _COOKIE_NO_RUN


def test_rba_64bit_split():
    vals = [5, (1 << 32) + 7, (3 << 32) + 123]  # bitmaps 0..3, 2 empty
    data = rba_serialize(vals)
    magic, n = struct.unpack_from("<IQ", data)
    assert n == 4
    assert rba_deserialize(data) == sorted(vals)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 33) - 1), max_size=400
    )
)
def test_rba_roundtrip_property(vals):
    assert rba_deserialize(rba_serialize(vals)) == sorted(set(vals))


def test_dv_file_framing_and_loud_seams(tmp_path):
    dv = rba_serialize([1, 2, 3, 97])
    path = str(tmp_path / "dv.bin")
    (off,) = write_dv_file(path, [dv])
    desc = {
        "storageType": "p", "pathOrInlineDv": path,
        "offset": off, "sizeInBytes": len(dv), "cardinality": 4,
    }
    assert read_dv_descriptor(str(tmp_path), desc) == [1, 2, 3, 97]
    # checksum mismatch is loud
    raw = bytearray(open(path, "rb").read())
    raw[off + 6] ^= 0xFF
    open(path, "wb").write(raw)
    with pytest.raises(ValueError, match="checksum"):
        read_dv_descriptor(str(tmp_path), desc)
    # restore; cardinality mismatch is loud
    (off,) = write_dv_file(path, [dv])
    with pytest.raises(ValueError, match="cardinality"):
        read_dv_descriptor(
            str(tmp_path), {**desc, "cardinality": 5}
        )
    with pytest.raises(ValueError, match="sizeInBytes"):
        read_dv_descriptor(
            str(tmp_path), {**desc, "sizeInBytes": len(dv) - 1}
        )
    with pytest.raises(NotImplementedError):
        read_dv_descriptor(str(tmp_path), {**desc, "storageType": "x"})


def test_inline_descriptor_with_padding(tmp_path):
    dv = rba_serialize(list(range(7)))
    enc = z85_encode(dv + b"\0" * (-len(dv) % 4))
    desc = {
        "storageType": "i", "pathOrInlineDv": enc,
        "offset": 0, "sizeInBytes": len(dv), "cardinality": 7,
    }
    assert read_dv_descriptor(str(tmp_path), desc) == list(range(7))


def test_crc_is_over_data_bytes(tmp_path):
    dv = rba_serialize([42])
    path = str(tmp_path / "dv.bin")
    (off,) = write_dv_file(path, [dv])
    raw = open(path, "rb").read()
    assert raw[0] == 1  # version byte
    (size,) = struct.unpack_from(">i", raw, off)
    data = raw[off + 4 : off + 4 + size]
    (crc,) = struct.unpack_from(">I", raw, off + 4 + size)
    assert crc == zlib.crc32(data) and data == dv
