"""Puffin + Iceberg v3 deletion-vector layer (sources/puffin.py) and
the narrowed iceberg_format_gate (sources/evolution.py)."""

from __future__ import annotations

import struct
import zlib

import pytest

from spark_hive_spark.sources.delta_dv import (
    roaring64_portable_deserialize,
    roaring64_portable_serialize,
)
from spark_hive_spark.sources.evolution import iceberg_format_gate
from spark_hive_spark.sources.puffin import (
    dv_blob_decode,
    dv_blob_encode,
    puffin_read,
    puffin_write,
)


def test_roaring64_portable_sparse_keys_roundtrip():
    vals = [0, 5, 65536, (1 << 32) + 7, (5 << 32) + 123456, (5 << 32)]
    data = roaring64_portable_serialize(vals)
    # sparse: exactly 3 buckets (keys 0, 1, 5), keyed not contiguous
    (n,) = struct.unpack_from("<Q", data, 0)
    assert n == 3
    assert roaring64_portable_deserialize(data) == sorted(vals)


def test_roaring64_differs_from_delta_rba():
    """The Iceberg vector is NOT Delta's RoaringBitmapArray: no magic,
    sparse keyed buckets."""
    from spark_hive_spark.sources.delta_dv import rba_serialize

    vals = [(5 << 32) + 1]
    a = roaring64_portable_serialize(vals)
    b = rba_serialize(vals)
    assert a != b
    (n,) = struct.unpack_from("<Q", a, 0)
    assert n == 1  # one sparse bucket ...
    _, n_rba = struct.unpack_from("<IQ", b, 0)
    assert n_rba == 6  # ... vs six contiguous ones (0..5)


def test_dv_blob_roundtrip_and_framing():
    pos = [1, 2, 3, 100, 10_000_000, (1 << 32) + 9]
    blob = dv_blob_encode(pos)
    assert dv_blob_decode(blob) == sorted(pos)
    # framing: BE length prefix covers magic+vector
    (ln,) = struct.unpack_from(">I", blob, 0)
    assert 4 + ln + 4 == len(blob)
    assert blob[4:8] == bytes([0xD1, 0xD3, 0x39, 0x64])


def test_dv_blob_integrity_rejections():
    blob = bytearray(dv_blob_encode([1, 2, 3]))
    bad_crc = bytes(blob[:-1]) + bytes([blob[-1] ^ 0xFF])
    with pytest.raises(ValueError, match="CRC"):
        dv_blob_decode(bad_crc)
    bad_magic = bytes(blob[:4]) + b"XXXX" + bytes(blob[8:])
    with pytest.raises(ValueError, match="magic"):
        dv_blob_decode(bad_magic)
    with pytest.raises(ValueError, match="length prefix"):
        dv_blob_decode(bytes(blob) + b"\x00")
    with pytest.raises(ValueError, match="framing"):
        dv_blob_decode(b"\x00\x01")


def test_puffin_roundtrip_and_rejections(tmp_path):
    p = str(tmp_path / "x.puffin")
    metas = puffin_write(p, [
        (b"payload-one", {"type": "deletion-vector-v1",
                          "properties": {"referenced-data-file": "a"}}),
        (b"payload-two-longer", {"type": "deletion-vector-v1"}),
    ])
    raw, blobs = puffin_read(p)
    assert blobs == metas
    assert raw[blobs[0]["offset"]:][:blobs[0]["length"]] == b"payload-one"
    assert (
        raw[blobs[1]["offset"]:][: blobs[1]["length"]]
        == b"payload-two-longer"
    )
    # corrupt trailing magic
    bad = str(tmp_path / "bad.puffin")
    with open(bad, "wb") as fh:
        fh.write(raw[:-4] + b"NOPE")
    with pytest.raises(ValueError, match="magic"):
        puffin_read(bad)
    # LYING about the compressed-footer flag is loud (round 15: the
    # flag is now supported, so a flagged-but-uncompressed payload
    # trips the LZ4 frame magic check instead of a blanket seam)
    flagged = str(tmp_path / "flag.puffin")
    with open(flagged, "wb") as fh:
        fh.write(raw[:-8] + b"\x01\x00\x00\x00" + raw[-4:])
    with pytest.raises(ValueError, match="LZ4 frame"):
        puffin_read(flagged)
    # any OTHER flag bit stays loud
    flagged2 = str(tmp_path / "flag2.puffin")
    with open(flagged2, "wb") as fh:
        fh.write(raw[:-8] + b"\x02\x00\x00\x00" + raw[-4:])
    with pytest.raises(NotImplementedError, match="flags"):
        puffin_read(flagged2)


def test_puffin_lz4_compressed_footer_roundtrip(tmp_path):
    """Round 15: flags bit 0 + LZ4-framed FooterPayload round-trips
    byte-identically through the hand-built frame codec."""
    p = str(tmp_path / "c.puffin")
    metas = puffin_write(p, [
        (b"payload-one", {"type": "deletion-vector-v1",
                          "properties": {"referenced-data-file": "a"}}),
        (b"payload-two-longer", {"type": "deletion-vector-v1"}),
    ], compress_footer=True)
    with open(p, "rb") as fh:
        raw = fh.read()
    assert raw[-8] & 1  # the flag really is set on disk
    _, blobs = puffin_read(p)
    assert blobs == metas


def test_iceberg_format_gate_named_features():
    iceberg_format_gate({"format-version": 2})
    iceberg_format_gate({"format-version": 1})
    # v3 with no v3 features used passes
    iceberg_format_gate({"format-version": 3})
    with pytest.raises(NotImplementedError, match="format-version 4"):
        iceberg_format_gate({"format-version": 4})
    with pytest.raises(NotImplementedError, match="row lineage"):
        iceberg_format_gate({"format-version": 3, "row-lineage": True})
    with pytest.raises(NotImplementedError, match="row lineage"):
        iceberg_format_gate({"format-version": 3, "next-row-id": 10})
    with pytest.raises(NotImplementedError, match="default value"):
        iceberg_format_gate({
            "format-version": 3,
            "schema": {"fields": [
                {"name": "x", "initial-default": 0}
            ]},
        })
    # declaring support unlocks exactly that feature
    iceberg_format_gate(
        {"format-version": 3, "row-lineage": True},
        supported=frozenset({"row-lineage"}),
    )


def test_dv_crc_is_over_magic_plus_vector():
    """Spec: the CRC-32 covers the magic AND the vector, not the
    vector alone — a reader checking vector-only CRCs would accept
    a corrupted magic."""
    pos = [7, 8, 9]
    blob = dv_blob_encode(pos)
    (ln,) = struct.unpack_from(">I", blob, 0)
    body = blob[4 : 4 + ln]
    (crc,) = struct.unpack_from(">I", blob, 4 + ln)
    assert crc == zlib.crc32(body)
    assert crc != zlib.crc32(body[4:])


# ---- apache-datasketches-theta-v1 (round 18) ------------------------

from spark_hive_spark.sources.puffin import (  # noqa: E402
    _THETA_MAX,
    _theta_seed_hash,
    murmur3_x64_128,
    theta_estimate,
    theta_hash_long,
    theta_sketch_deserialize,
    theta_sketch_serialize,
)


def test_theta_sketch_roundtrip_exact_and_estimation():
    hs = sorted(theta_hash_long(v) for v in range(100))
    exact = theta_sketch_serialize(hs)
    assert theta_sketch_deserialize(exact) == (hs, _THETA_MAX)
    assert theta_estimate(hs, _THETA_MAX) == 100.0
    big = sorted(theta_hash_long(v) for v in range(50_000))
    est_img = theta_sketch_serialize(big[:256], big[256])
    rh, rt = theta_sketch_deserialize(est_img)
    assert (rh, rt) == (big[:256], big[256])
    # KMV estimator lands within ~4 RSE of truth on this fixed set
    assert abs(theta_estimate(rh, rt) / 50_000 - 1) < 0.25
    # re-serialization is byte-stable
    assert theta_sketch_serialize(rh, rt) == est_img


def test_theta_sketch_empty_image():
    img = theta_sketch_serialize([])
    assert len(img) == 8 and img[0] == 1 and img[5] & 0x04
    assert theta_sketch_deserialize(img) == ([], _THETA_MAX)
    assert theta_estimate([], _THETA_MAX) == 0.0


def test_theta_sketch_bad_images_are_loud():
    hs = sorted(theta_hash_long(v) for v in range(10))
    img = theta_sketch_serialize(hs)
    with pytest.raises(NotImplementedError, match="serial version"):
        theta_sketch_deserialize(bytes([img[0], 2]) + img[2:])
    with pytest.raises(NotImplementedError, match="family"):
        theta_sketch_deserialize(img[:2] + b"\x07" + img[3:])
    with pytest.raises(ValueError, match="seed hash"):
        theta_sketch_deserialize(img[:6] + b"\xff\xff" + img[8:])
    with pytest.raises(ValueError, match="length"):
        theta_sketch_deserialize(img + b"\x00" * 8)
    with pytest.raises(ValueError, match="ascending"):
        # swap two retained hashes: ordering must be validated
        theta_sketch_deserialize(
            img[:16] + img[24:32] + img[16:24] + img[32:]
        )
    with pytest.raises(ValueError, match="outside"):
        theta_sketch_serialize([5, 10], theta=7)


def test_theta_matches_jvm_datasketches(spark):
    """Ground truth: datasketches-java 6.2 (bundled with Spark 4 for
    the hll/theta SQL functions). Pins (a) MurmurHash3 x64_128 both
    lanes + the >>>1 theta hash, (b) computeSeedHash, (c) exact-mode
    compact images byte-identical to CompactSketch.toByteArray,
    (d) the JVM wraps and agrees with this module's estimation-mode
    KMV images."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    MH = jvm.org.apache.datasketches.hash.MurmurHash3
    for v in (0, 1, 42, -7, 123456789, (1 << 62) + 3):
        arr = gw.new_array(gw.jvm.long, 1)
        arr[0] = v
        jres = MH.hash(arr, 9001)
        p0, p1 = murmur3_x64_128(
            (v % (1 << 64)).to_bytes(8, "little"), 9001
        )
        assert (jres[0] % (1 << 64), jres[1] % (1 << 64)) == (p0, p1)
        assert (jres[0] % (1 << 64)) >> 1 == theta_hash_long(v)
    Util = jvm.org.apache.datasketches.thetacommon.ThetaUtil
    assert Util.computeSeedHash(9001) % (1 << 16) \
        == _theta_seed_hash(9001)
    sk = jvm.org.apache.datasketches.theta.UpdateSketch.builder() \
        .setNominalEntries(256).build()
    for i in range(100):
        sk.update(i)
    jimg = bytes(sk.compact().toByteArray())
    hs = sorted(theta_hash_long(i) for i in range(100))
    assert theta_sketch_serialize(hs) == jimg
    big = sorted(theta_hash_long(i) for i in range(20_000))
    mine = theta_sketch_serialize(big[:256], big[256])
    Mem = jvm.org.apache.datasketches.memory.Memory
    wrapped = jvm.org.apache.datasketches.theta.Sketches \
        .wrapCompactSketch(Mem.wrap(mine))
    assert wrapped.getRetainedEntries(True) == 256
    assert abs(
        wrapped.getEstimate()
        - theta_estimate(*theta_sketch_deserialize(mine))
    ) < 1e-6


def test_theta_hash_vectorized_matches_scalar():
    import numpy as np

    from spark_hive_spark.sources.puffin import theta_hash_longs_np

    vals = np.array(
        [0, 1, -1, 42, -7, 123456789, (1 << 62) + 3, -(1 << 62)],
        dtype=np.int64,
    )
    got = theta_hash_longs_np(vals)
    want = [theta_hash_long(int(v)) for v in vals]
    assert [int(x) for x in got] == want


def test_theta_union_equals_monolithic():
    """The mergeability property the union query pins: per-group KMV
    sketches union (min-theta + re-trim) to EXACTLY the monolithic
    sketch over the concatenated values — for any split."""
    import random

    from spark_hive_spark.sources.puffin import theta_union

    rng = random.Random(7)
    vals = [rng.randrange(10**12) for _ in range(5000)]
    K = 64

    def _kmv(vs):
        hs = sorted({theta_hash_long(v) for v in vs})
        if len(hs) <= K:
            return hs, _THETA_MAX
        return hs[:K], hs[K]

    mono = _kmv(vals)
    for n_parts in (2, 3, 7):
        parts = [_kmv(vals[i::n_parts]) for i in range(n_parts)]
        assert theta_union(parts, k=K) == mono
        # serialized images byte-identical too
        assert theta_sketch_serialize(*theta_union(parts, k=K)) \
            == theta_sketch_serialize(*mono)
    # all-exact inputs under k stay exact
    small = [_kmv(vals[:10]), _kmv(vals[10:20])]
    hs, th = theta_union(small, k=K)
    assert th == _THETA_MAX and len(hs) == len(
        {theta_hash_long(v) for v in vals[:20]}
    )


def test_theta_union_image_readable_by_jvm(spark):
    from spark_hive_spark.sources.puffin import theta_union

    K = 128
    a = sorted(theta_hash_long(v) for v in range(3000))
    b = sorted(theta_hash_long(v) for v in range(1500, 4500))
    parts = [(a[:K], a[K]), (b[:K], b[K])]
    hs, th = theta_union(parts, k=K)
    img = theta_sketch_serialize(hs, th)
    jvm = spark._jvm
    wrapped = jvm.org.apache.datasketches.theta.Sketches \
        .wrapCompactSketch(
            jvm.org.apache.datasketches.memory.Memory.wrap(img)
        )
    est = theta_estimate(hs, th)
    assert abs(wrapped.getEstimate() - est) < 1e-6
    assert abs(est / 4500 - 1) < 0.25


def test_theta_string_hash_matches_jvm(spark):
    """update(String) hashes the UTF-8 bytes (Iceberg single-value
    serialization) and IGNORES empty strings — both pinned against
    datasketches-java."""
    from spark_hive_spark.sources.puffin import theta_hash_bytes

    jvm = spark._jvm
    sk = jvm.org.apache.datasketches.theta.UpdateSketch.builder() \
        .setNominalEntries(256).build()
    words = ["Brand#13", "PROMO BURNISHED", "naïve-ütf8-ありがとう", ""]
    for w in words:
        sk.update(w)
    jimg = bytes(sk.compact().toByteArray())
    hs = sorted(
        theta_hash_bytes(w.encode("utf-8")) for w in words if w
    )
    assert theta_sketch_serialize(hs) == jimg
