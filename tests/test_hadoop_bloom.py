"""Hadoop BloomFilter writable codec (sources/hadoop_bloom.py),
pinned against the bundled org.apache.hadoop classes via py4j — the
bloom bytes inside Hudi's bloom index / metadata bloom_filters
partition."""

from __future__ import annotations

import pytest

from spark_hive_spark.sources.hadoop_bloom import (
    HadoopBloomFilter,
    hudi_bloom_sizing,
    murmur2_32,
)


def test_murmur2_matches_jvm(spark):
    """60 random (data, seed) vectors incl. the nonstandard signed
    reversed tail — and the specific tail shapes (1/2/3 leftover
    bytes, high-bit bytes) that expose it."""
    import random

    jvm = spark._jvm
    mh = jvm.org.apache.hadoop.util.hash.MurmurHash.getInstance()
    rng = random.Random(3)
    cases = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(0, 20)))
        for _ in range(60)
    ] + [b"\xff", b"\x80\x81", b"\xfe\xff\x80", b"abc", b"ab", b"a"]
    for data in cases:
        seed = rng.randrange(-(2**31), 2**31)
        assert mh.hash(data, len(data), seed) == murmur2_32(data, seed)


def test_bloom_writable_matches_jvm(spark):
    jvm = spark._jvm
    jbf = jvm.org.apache.hadoop.util.bloom.BloomFilter(9586, 7, 1)
    pbf = HadoopBloomFilter(9586, 7)
    K = jvm.org.apache.hadoop.util.bloom.Key
    keys = [str(i).encode() for i in range(0, 4000, 4)]
    for k in keys:
        jbf.add(K(k))
        pbf.add(k)
    baos = jvm.java.io.ByteArrayOutputStream()
    jbf.write(jvm.java.io.DataOutputStream(baos))
    jraw = bytes(baos.toByteArray())
    assert jraw == pbf.serialize()
    absent = [str(i).encode() for i in range(100000, 100300)]
    for k in keys + absent:
        assert jbf.membershipTest(K(k)) == pbf.test(k)
    rb = HadoopBloomFilter.deserialize(jraw)
    assert all(rb.test(k) for k in keys)
    assert rb.serialize() == jraw


def test_bloom_codec_guards():
    bf = HadoopBloomFilter(128, 3)
    bf.add(b"k1")
    with pytest.raises(ValueError, match="empty"):
        bf.test(b"")
    with pytest.raises(NotImplementedError, match="hash type"):
        HadoopBloomFilter(128, 3, hash_type=0)  # Jenkins stays loud
    raw = bf.serialize()
    with pytest.raises(NotImplementedError, match="version"):
        HadoopBloomFilter.deserialize(b"\x00\x00\x00\x02" + raw[4:])
    with pytest.raises(ValueError, match="bytes"):
        HadoopBloomFilter.deserialize(raw + b"\x00")
    m, k = hudi_bloom_sizing(1000, 0.01)
    assert 9000 < m < 10100 and k == 7


def test_vectorized_bloom_matches_scalar():
    """The numpy murmur2 / bloom-index path (bloom_bit_indexes, used
    by the metadata-table bloom build) is bit-identical to the scalar
    HadoopBloomFilter.add path — arbitrary byte keys (signed-tail
    smearing), every tail length, chained nbHash seeds."""
    import random

    import numpy as np

    from spark_hive_spark.sources.hadoop_bloom import (
        _murmur2_32_vec,
        bloom_bit_indexes,
        murmur2_32,
    )

    random.seed(11)
    keys = [
        bytes(random.randrange(1, 256) for _ in range(random.randrange(1, 13)))
        for _ in range(400)
    ] + [str(i).encode() for i in range(0, 9000, 17)]
    m, k = hudi_bloom_sizing(len(keys), 0.01)
    bf = HadoopBloomFilter(m, k)
    for key in keys:
        bf.add(key)
    idx = bloom_bit_indexes(np.asarray(keys, dtype=np.bytes_), m, k)
    assert set(idx.tolist()) == bf.bits
    # chained-seed hash parity on raw murmur values
    for key in keys[:40]:
        mat = np.frombuffer(key, dtype=np.uint8).reshape(1, -1)
        seed = 0
        for _ in range(3):
            expected = murmur2_32(key, seed)
            got = int(
                _murmur2_32_vec(
                    mat, np.array([seed & 0xFFFFFFFF], dtype=np.uint32)
                )[0]
            )
            got = got - (1 << 32) if got & (1 << 31) else got
            assert got == expected
            seed = expected
    with pytest.raises(ValueError, match="empty"):
        bloom_bit_indexes(np.asarray([b"a", b""], dtype=np.bytes_), m, k)


def test_trailing_nul_key_is_loud():
    """numpy S-dtype cannot represent a trailing NUL byte — a key
    like b'42\\x00' would silently hash as b'42' and diverge from the
    scalar add path. The vectorized entry points reject it instead
    (ADVICE r19); in-repo callers only pass ASCII-decimal keys."""
    from spark_hive_spark.sources.hadoop_bloom import bloom_bit_indexes
    from spark_hive_spark.sources.hudi_mor import (
        hudi_rli_file_group_index_vec,
    )

    with pytest.raises(ValueError, match="NUL"):
        bloom_bit_indexes([b"42", b"42\x00"], 1024, 3)
    with pytest.raises(ValueError, match="NUL"):
        hudi_rli_file_group_index_vec([b"7\x00"], 4)
    # interior NULs are representable and fine
    assert len(bloom_bit_indexes([b"4\x002"], 1024, 3)) == 3
