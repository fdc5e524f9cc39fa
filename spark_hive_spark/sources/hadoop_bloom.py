"""Hadoop `org.apache.hadoop.util.bloom.BloomFilter` writable codec +
hadoop MurmurHash (murmur2, 32-bit) — the serialization inside Hudi's
bloom index: every Hudi base file carries a SimpleBloomFilter over its
record keys (parquet footer key ``org.apache.hudi.bloomfilter``), and
the metadata table's `bloom_filters` partition stores the same bytes
per file so key-existence checks become metadata reads. All from the
public Hadoop source layout (round 18); every piece is pinned against
the bundled hadoop classes via py4j in tests/test_hadoop_bloom.py:

- **Writable framing** (Filter.write + BloomFilter.write): VERSION
  i32 = -1 | nbHash i32 | hashType u8 (0 Jenkins, 1 Murmur) |
  vectorSize i32 | ceil(vectorSize/8) bit bytes, bit i at byte i//8
  mask ``1 << (i % 8)`` (LSB-first within each byte — pinned
  against the JVM writable bytes).
- **Hash schedule** (HashFunction.hash): nbHash CHAINED murmur2
  rounds — ``initval = murmur2(key, seed=initval)``, index =
  ``abs(initval % vectorSize)`` with Java int semantics (truncated
  %, two's-complement abs).
- **Sizing** (Hudi BloomFilterUtils): m = ceil(-n·ln p / ln2²),
  k = round(ln2 · m / n).

Reference parity: the reference has no bloom surface
(CollegeScorecard.scala:35-157); north-star extension per
SURVEY.md §2B.
"""

from __future__ import annotations

import math
import struct

_MASK32 = 0xFFFFFFFF
MURMUR_HASH = 1  # org.apache.hadoop.util.hash.Hash.MURMUR_HASH


def murmur2_32(data: bytes, seed: int = 0) -> int:
    """Hadoop's MurmurHash.hash (murmur2): little-endian 4-byte
    blocks through (k*m, k^=k>>>24, k*m; h*m, h^=k), then the
    NONSTANDARD hadoop tail — the last 1-3 bytes XOR'd as
    ``data[length-3]<<16 ^ data[length-2]<<8 ^ data[length-1]``
    with Java SIGNED bytes (sign extension reaches the high bits),
    which both reverses the reference murmur2's tail byte order and
    smears negative bytes — then h*m and the 13/15 finalizer.
    Returns a SIGNED Java int; every quirk pinned against the
    bundled org.apache.hadoop.util.hash.MurmurHash via py4j."""
    m, r = 0x5BD1E995, 24
    h = (seed ^ len(data)) & _MASK32
    n4 = len(data) >> 2
    for i in range(n4):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * m) & _MASK32
        k ^= k >> r
        k = (k * m) & _MASK32
        h = (h * m) & _MASK32
        h ^= k
    left = len(data) & 3
    if left:
        def _sb(b: int) -> int:  # Java byte: signed
            return b - 256 if b > 127 else b

        n = len(data)
        if left >= 3:
            h ^= (_sb(data[n - 3]) << 16) & _MASK32
        if left >= 2:
            h ^= (_sb(data[n - 2]) << 8) & _MASK32
        h ^= _sb(data[n - 1]) & _MASK32
        h = (h * m) & _MASK32
    h ^= h >> 13
    h = (h * m) & _MASK32
    h ^= h >> 15
    return h - (1 << 32) if h & (1 << 31) else h


def _java_mod_abs(v: int, m: int) -> int:
    # Java: Math.abs(v % m) — truncated division means the result's
    # sign follows v, and abs folds it positive
    return abs(v) % m


class HadoopBloomFilter:
    """The add/test/serialize subset of hadoop's BloomFilter that
    Hudi's SimpleBloomFilter wraps."""

    def __init__(self, vector_size: int, nb_hash: int,
                 hash_type: int = MURMUR_HASH,
                 bits: set[int] | None = None) -> None:
        if hash_type != MURMUR_HASH:
            raise NotImplementedError(
                f"hadoop bloom hash type {hash_type} (only MURMUR)"
            )
        self.vector_size = vector_size
        self.nb_hash = nb_hash
        self.hash_type = hash_type
        self.bits: set[int] = set() if bits is None else bits

    def _indexes(self, key: bytes) -> list[int]:
        if not key:
            raise ValueError("empty bloom key")
        out = []
        initval = 0
        for _ in range(self.nb_hash):
            initval = murmur2_32(key, initval)
            out.append(_java_mod_abs(initval, self.vector_size))
        return out

    def add(self, key: bytes) -> None:
        self.bits.update(self._indexes(key))

    def test(self, key: bytes) -> bool:
        return all(i in self.bits for i in self._indexes(key))

    def serialize(self) -> bytes:
        out = bytearray(struct.pack(">iiBi", -1, self.nb_hash,
                                    self.hash_type, self.vector_size))
        byts = bytearray((self.vector_size + 7) // 8)
        for i in self.bits:
            byts[i // 8] |= 1 << (i % 8)
        out += byts
        return bytes(out)

    @classmethod
    def deserialize(cls, raw: bytes) -> "HadoopBloomFilter":
        version, nb_hash, hash_type, vector_size = struct.unpack_from(
            ">iiBi", raw, 0
        )
        if version != -1:
            raise NotImplementedError(
                f"hadoop bloom writable version {version}"
            )
        n_bytes = (vector_size + 7) // 8
        if len(raw) != 13 + n_bytes:
            raise ValueError(
                f"bloom writable is {len(raw)} bytes, expected "
                f"{13 + n_bytes}"
            )
        bits = {
            i for i in range(vector_size)
            if raw[13 + i // 8] & (1 << (i % 8))
        }
        return cls(vector_size, nb_hash, hash_type, bits)


def _murmur2_32_vec(mat, seeds):
    """Vectorized murmur2_32 over an (n, L) uint8 key matrix (all
    keys the same length L) with per-key uint32 seeds. Bit-exact
    numpy twin of `murmur2_32` (same block math, same nonstandard
    signed reversed tail); returns uint32 hashes (the signed Java
    int's two's-complement bits). Pinned against the scalar form in
    tests/test_hadoop_bloom.py."""
    import numpy as np

    m = np.uint32(0x5BD1E995)
    L = mat.shape[1]
    h = seeds.astype(np.uint32) ^ np.uint32(L)
    with np.errstate(over="ignore"):
        for i in range(L >> 2):
            k = (
                mat[:, 4 * i].astype(np.uint32)
                | (mat[:, 4 * i + 1].astype(np.uint32) << np.uint32(8))
                | (mat[:, 4 * i + 2].astype(np.uint32) << np.uint32(16))
                | (mat[:, 4 * i + 3].astype(np.uint32) << np.uint32(24))
            )
            k *= m
            k ^= k >> np.uint32(24)
            k *= m
            h *= m
            h ^= k
        left = L & 3
        if left:
            # Java signed bytes, sign extension smearing the high bits;
            # XOR of the sign-extended int32 terms is representation-
            # identical to the scalar form's three masked XORs
            tail = mat[:, L - 1].astype(np.int8).astype(np.int32)
            if left >= 2:
                tail ^= mat[:, L - 2].astype(np.int8).astype(np.int32) << 8
            if left >= 3:
                tail ^= mat[:, L - 3].astype(np.int8).astype(np.int32) << 16
            h ^= tail.view(np.uint32)
            h *= m
        h ^= h >> np.uint32(13)
        h *= m
        h ^= h >> np.uint32(15)
    return h


def ascii_keys_array(keys):
    """Convert a batch of byte keys to a numpy S-dtype array for the
    vectorized hashers, guarding the representation gap: S-dtype
    storage cannot carry a TRAILING NUL byte (it is indistinguishable
    from padding), so a key like b"42\\x00" would silently hash as
    b"42" and diverge from the scalar implementations. All in-repo
    callers pass ASCII-decimal record keys, which can never end in
    NUL; this guard keeps the contract loud for any future caller.
    Input that is already S-dtype is trusted (its conversion already
    happened under the caller's own guard or contract)."""
    import numpy as np

    if isinstance(keys, np.ndarray) and keys.dtype.kind == "S":
        return keys
    arr = np.asarray(keys, dtype=object)
    for k in arr.ravel():
        if isinstance(k, (bytes, bytearray)) and k[-1:] == b"\x00":
            raise ValueError(
                "byte key ends with NUL: numpy S-dtype cannot "
                "represent a trailing \\x00 (vectorized hash would "
                "silently diverge from the scalar form)"
            )
    return arr.astype(np.bytes_)


def bloom_bit_indexes(keys, vector_size: int, nb_hash: int):
    """All bloom bit indexes for a batch of byte keys — the
    vectorized twin of `HadoopBloomFilter._indexes` over many keys
    (chained murmur rounds, Java abs-mod), returned as a unique
    int64 numpy array. Keys group by length so each group hashes as
    one fixed-width matrix; builds that previously looped
    `bf.add(key)` per row call this once per Arrow batch. Keys must
    not end in a NUL byte (see `ascii_keys_array`)."""
    import numpy as np

    keys = ascii_keys_array(keys)
    if keys.size and keys.dtype.itemsize == 0:
        raise ValueError("empty bloom key")
    lens = np.char.str_len(keys)
    if keys.size and int(lens.min()) == 0:
        raise ValueError("empty bloom key")
    out = []
    for L in np.unique(lens):
        sub = keys[lens == L]
        mat = sub.astype(f"S{int(L)}").view(np.uint8).reshape(
            -1, int(L)
        )
        h = np.zeros(len(sub), dtype=np.uint32)
        for _ in range(nb_hash):
            h = _murmur2_32_vec(mat, h)
            signed = h.astype(np.int64)
            signed[signed >= 1 << 31] -= 1 << 32
            out.append(np.abs(signed) % vector_size)
    if not out:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(out))


def hudi_bloom_sizing(num_entries: int, error_rate: float) -> tuple[int, int]:
    """Hudi BloomFilterUtils: (vectorSize, nbHash) for a target
    entry count and false-positive rate."""
    m = math.ceil(-num_entries * math.log(error_rate) / (math.log(2) ** 2))
    k = max(1, round(math.log(2) * m / num_entries))
    return m, k
