"""Parquet split-block Bloom filters (SBBF), read WITHOUT the parquet
library — the point-lookup data-skipping layer min/max stats cannot
provide (SURVEY.md §2B source surface, round 11).

Row-group min/max prunes RANGE predicates
(`source_parquet_rowgroup_skipping`); an equality probe against a
high-cardinality key (the 100 TB "did order X land in this file?"
lookup) needs the other footer-adjacent structure the format
specifies: per-column-chunk Bloom filters. This module hand-builds
that layer from the two public specs:

- **parquet-format BloomFilter.md**: `BloomFilterHeader` thrift
  struct (1: numBytes, 2: algorithm=BLOCK, 3: hash=XXHASH,
  4: compression=UNCOMPRESSED — unions of empty structs) at
  `ColumnMetaData.bloom_filter_offset` (field 14, with field 15 the
  total length), followed immediately by the raw bitset; the hash is
  XXH64 (seed 0) of the value's PLAIN encoding — for INT64 the
  8-byte little-endian form — computed here by the repo's own
  hand-built `operators.zstd.xxh64` (already differentially verified
  against Spark's JVM XxHash64).
- **Split-block Bloom filter** (Apache Impala's cache-line design,
  adopted verbatim by the spec): the bitset is a vector of 32-byte
  blocks (8 little-endian u32 words); `block = ((h >> 32) *
  nblocks) >> 32` (the Lemire fast-range reduction), and within the
  block each word i gets exactly one bit set at position
  `((key * SALT[i]) & 0xFFFFFFFF) >> 27` where `key = h & 0xFFFFFFFF`
  — membership is the AND over the 8 words.

The decoder is exercised against filters written by SPARK ITSELF
(`parquet.bloom.filter.enabled#col`), so compatibility is proven the
strong way: every present key must hit (a single salt/rotation/
reduction slip makes present-key hits ~random and the query's exact
aggregate flips), while absent keys reject at the configured false-
positive rate (pytest pins < 5% where ~1% is expected).

Scale posture: bloom probing happens at scan PLANNING time and is
O(#files × header+bitset bytes) driver-side — the same contract as
real readers (Spark's ParquetFileFormat row-group filter); data of a
rejected file is never fetched, which at 100 TB turns a needle
lookup from a full shuffle-free scan into reading only the files
whose filters claim the key (≈1 + fp_rate × files). Candidate files
are then read as independent splits, one task each.

Reference parity: the reference reads its inputs whole
(CollegeScorecard.scala:35-157); north-star surface per SURVEY §2B.
"""

from __future__ import annotations

import glob
import os
import shutil
import struct
import tempfile
import uuid
from typing import Any, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.operators.zstd import xxh64
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.sources.parquet_meta import _read_struct, decode_footer
from spark_hive_spark.tables import t

# BloomFilter.md block structure: 8 words x 32 bits = 32-byte blocks
_SALT = (
    0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
    0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
)

_N_FILES = 7  # fixture: orders split by o_orderkey % 7, one file each
_N_PRESENT = 10  # probes taken from the table (10 smallest keys)
_N_ABSENT = 10  # probes guaranteed past the table's max key


def read_bloom_filter(data: bytes, cmd: dict[int, Any]) -> bytes:
    """One column chunk's SBBF bitset from its hand-decoded
    ColumnMetaData (14: bloom_filter_offset, 15: bloom_filter_length).
    Validates the BloomFilterHeader: BLOCK algorithm, XXHASH,
    UNCOMPRESSED — anything else is a loud seam (the spec reserves
    the unions for future variants)."""
    if 14 not in cmd:
        raise ValueError("column chunk carries no bloom filter")
    off = cmd[14]
    hdr, bitset_start = _read_struct(data, off)
    n_bytes = hdr[1]
    for fid, name in ((2, "algorithm"), (3, "hash"), (4, "compression")):
        union = hdr.get(fid, {})
        if 1 not in union:  # first member = the only defined variant
            raise NotImplementedError(f"bloom {name} variant {union}")
    if n_bytes % 32 or n_bytes <= 0:
        raise ValueError(f"SBBF bitset not block-aligned: {n_bytes}")
    if 15 in cmd and bitset_start - off + n_bytes > cmd[15]:
        raise ValueError("bloom bitset overruns declared length")
    bitset = data[bitset_start : bitset_start + n_bytes]
    if len(bitset) != n_bytes:
        raise ValueError("bloom bitset truncated")
    return bitset


def sbbf_contains_hash(bitset: bytes, h: int) -> bool:
    """Split-block membership for a 64-bit hash per BloomFilter.md:
    top 32 bits pick the block (fast-range), low 32 bits are the key
    whose salted products pick one bit per word."""
    nblocks = len(bitset) // 32
    block = ((h >> 32) * nblocks) >> 32
    key = h & 0xFFFFFFFF
    base = block * 32
    for i, salt in enumerate(_SALT):
        bit = ((key * salt) & 0xFFFFFFFF) >> 27
        word = struct.unpack_from("<I", bitset, base + 4 * i)[0]
        if not (word >> bit) & 1:
            return False
    return True


def sbbf_contains_int64(bitset: bytes, value: int) -> bool:
    """INT64 probe: XXH64(seed 0) over the PLAIN little-endian
    encoding, per the spec's hash-input rule."""
    return sbbf_contains_hash(bitset, xxh64(struct.pack("<q", value)))


def sbbf_contains_binary(bitset: bytes, value: bytes) -> bool:
    """BYTE_ARRAY probe: the PLAIN encoding hashed is the raw bytes
    WITHOUT the length prefix (BloomFilter.md hash-input rule)."""
    return sbbf_contains_hash(bitset, xxh64(value))


def _write_bloom_fixture(
    spark: SparkSession, sf_dir: str, root: str
) -> list[str]:
    """orders split into _N_FILES single-row-group files by
    o_orderkey % _N_FILES, each with a Spark-written bloom filter on
    o_orderkey -> ordered file paths (index == residue class)."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    # one partitioned write job: 7 residue-class directories, each a
    # single file (repartition on the bucket column), every file
    # carrying its own bloom — the bloom option is per-column and
    # rides through dynamic partitioning
    (
        orders.withColumn(
            "bucket", (F.col("o_orderkey") % _N_FILES).cast("int")
        )
        .repartition(_N_FILES, "bucket")
        .write.partitionBy("bucket")
        .option("parquet.bloom.filter.enabled#o_orderkey", "true")
        .option("parquet.bloom.filter.expected.ndv#o_orderkey", "300000")
        .parquet(root + "/t")
    )
    paths: list[str] = []
    for k in range(_N_FILES):
        (f,) = glob.glob(os.path.join(root, "t", f"bucket={k}", "*.parquet"))
        paths.append(f)
    return paths


@register(
    "source_parquet_bloom_skipping",
    oracle=f"""
        WITH probes AS (
            SELECT o_orderkey AS k FROM orders
            ORDER BY o_orderkey LIMIT {_N_PRESENT}
        )
        SELECT CAST({_N_FILES} AS INT) AS files_total,
               CAST({_N_FILES} AS INT) AS blooms_decoded,
               CAST({_N_PRESENT + _N_ABSENT} AS INT) AS n_probes,
               CAST({_N_PRESENT} AS INT) AS present_hits,
               TRUE AS fp_hits_bounded,
               CAST(count(*) AS BIGINT) AS n_found,
               {sql_dsum('o_totalprice')} AS revenue_found
        FROM orders WHERE o_orderkey IN (SELECT k FROM probes)
    """,
    tags=("source", "parquet", "bloom", "metadata", "data-skipping"),
)
def source_parquet_bloom_skipping(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-lookup file skipping via hand-decoded parquet Bloom
    filters (round 11): orders lands in 7 files keyed by
    o_orderkey % 7, each carrying a SPARK-written SBBF on
    o_orderkey; 20 probe keys (the table's 10 smallest + 10 past its
    max) are tested against every file's filter by the hand-built
    header/bitset/XXH64 pipeline above, and ONLY files whose filter
    claims a probe are read (one task per candidate file), with the
    residual IN-filter exact.

    The oracle recomputes n_found/revenue_found from the raw table —
    a bloom FALSE NEGATIVE (decoder slip anywhere in the salt/block
    math) drops that key's home file from the plan and flips the
    hash; `present_hits` pins that each present key's home filter
    answered yes, and `fp_hits_bounded` pins engine-side that absent
    keys drew ≤ 20 of the 70 possible false-positive file hits
    (expected ~0.7 at the 1% default fpp — the same bounded-boolean
    style as `pages_consistent`).

    Scale posture: probing is planning-time, O(files × bitset);
    candidate data files are read as independent splits; nothing
    driver-side grows with row count."""
    root = os.path.join(
        scratch_root(), f"shs_bloom_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    paths = _write_bloom_fixture(spark, sf_dir, root)

    blooms: list[bytes] = []
    file_maxes: list[int] = []
    for p in paths:
        with open(p, "rb") as fh:
            data = fh.read()
        fmd = decode_footer(data)
        if len(fmd[4]) != 1:
            raise ValueError("fixture file must hold one row group")
        # o_orderkey is leaf 0 (select order above)
        cmd = fmd[4][0][1][0][3]
        blooms.append(read_bloom_filter(data, cmd))
        st = cmd.get(12, {})
        file_maxes.append(
            struct.unpack("<q", st.get(5, st.get(1)))[0]
        )

    present = [
        r[0]
        for r in t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(_N_PRESENT)
        .collect()
    ]
    # guaranteed-absent probes come from the footers the planner
    # already decoded: past the max footer stat = past the table max
    absent = [max(file_maxes) + 1 + j for j in range(_N_ABSENT)]

    present_hits = sum(
        1
        for k in present
        if sbbf_contains_int64(blooms[k % _N_FILES], k)
    )
    fp_hits = sum(
        1
        for k in absent
        for b in blooms
        if sbbf_contains_int64(b, k)
    )
    candidates = sorted(
        {
            i
            for k in present + absent
            for i, b in enumerate(blooms)
            if sbbf_contains_int64(b, k)
        }
    )

    plan = spark.createDataFrame(
        [(paths[i],) for i in candidates], "path string"
    ).repartition(max(len(candidates), 1))

    def _read_files(batches) -> Iterator:
        import pyarrow.parquet as pq

        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                yield pq.read_table(
                    rec.path, columns=["o_orderkey", "o_totalprice"]
                ).to_pandas()

    probe_set = present + absent
    found = plan.mapInPandas(
        _read_files, "o_orderkey bigint, o_totalprice double"
    ).filter(F.col("o_orderkey").isin(probe_set))
    out = found.agg(
        F.lit(_N_FILES).cast("int").alias("files_total"),
        F.lit(len(blooms)).cast("int").alias("blooms_decoded"),
        F.lit(_N_PRESENT + _N_ABSENT).cast("int").alias("n_probes"),
        F.lit(present_hits).cast("int").alias("present_hits"),
        F.lit(fp_hits <= 20).alias("fp_hits_bounded"),
        F.count("*").alias("n_found"),
        dsum("o_totalprice").alias("revenue_found"),
    ).localCheckpoint(eager=True)  # 1-row; frees the fixture root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_parquet_bloom_skipping_string",
    oracle=f"""
        WITH probes AS (
            SELECT o_orderkey AS k FROM orders
            ORDER BY o_orderkey LIMIT {_N_PRESENT}
        )
        SELECT CAST({_N_FILES} AS INT) AS files_total,
               CAST({_N_FILES} AS INT) AS blooms_decoded,
               CAST({_N_PRESENT + _N_ABSENT} AS INT) AS n_probes,
               CAST({_N_PRESENT} AS INT) AS present_hits,
               TRUE AS fp_hits_bounded,
               CAST(count(*) AS BIGINT) AS n_found,
               CAST(sum(o_orderkey) AS BIGINT) AS found_key_sum,
               {sql_dsum('o_totalprice')} AS revenue_found
        FROM orders WHERE o_orderkey IN (SELECT k FROM probes)
    """,
    tags=("source", "parquet", "bloom", "metadata", "data-skipping",
          "string"),
)
def source_parquet_bloom_skipping_string(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Parquet Bloom-filter file skipping on a BYTE_ARRAY (string)
    column (round 17) — the string half of
    `source_parquet_bloom_skipping`, and a different hash-input
    rule than ORC's string blooms: parquet hashes XXH64(seed 0)
    over the value's PLAIN encoding, which for BYTE_ARRAY is the
    RAW BYTES WITHOUT the 4-byte length prefix (BloomFilter.md) —
    a probe that includes the prefix, or hashes a UTF-16ish form,
    misses every present key. (ORC's string blooms use Murmur3
    hash64 instead — `orc_bloom_utf8_hash`; same engine, two hash
    families, both pinned.)

    The fixture derives a 13-byte key 'ORD-%09d' from o_orderkey so
    the DuckDB oracle recomputes the found set exactly, splits
    orders into 7 single-row-group files by key residue, each with
    a Spark-written SBBF on the STRING column, and probes 20 keys
    (10 smallest + 10 past the max) against every file's filter via
    `sbbf_contains_binary`; only claiming files are read, with the
    residual IN-filter exact. `present_hits` pins that each present
    key's home filter answered yes; `fp_hits_bounded` pins absent
    keys drew <= 20 of the 70 possible false-positive file hits.

    Scale posture: identical to the long sibling — planning-time
    probing over footer-adjacent KB, candidate files read as
    independent splits."""
    root = os.path.join(
        scratch_root(), f"shs_bloomstr_{uuid.uuid4().hex}"
    )
    os.makedirs(root)
    orders = t(spark, sf_dir, "orders").select(
        F.concat(
            F.lit("ORD-"),
            F.lpad(F.col("o_orderkey").cast("string"), 9, "0"),
        ).alias("s"),
        "o_orderkey",
        "o_totalprice",
    )
    (
        orders.withColumn(
            "bucket", (F.col("o_orderkey") % _N_FILES).cast("int")
        )
        .repartition(_N_FILES, "bucket")
        .write.partitionBy("bucket")
        .option("parquet.bloom.filter.enabled#s", "true")
        .option("parquet.bloom.filter.expected.ndv#s", "300000")
        .parquet(root + "/t")
    )
    paths: list[str] = []
    for kk in range(_N_FILES):
        (f,) = glob.glob(
            os.path.join(root, "t", f"bucket={kk}", "*.parquet")
        )
        paths.append(f)

    blooms: list[bytes] = []
    file_maxes: list[int] = []
    for p in paths:
        with open(p, "rb") as fh:
            data = fh.read()
        fmd = decode_footer(data)
        if len(fmd[4]) != 1:
            raise ValueError("fixture file must hold one row group")
        cols = fmd[4][0][1]
        # leaf 0 = s (select order above), leaf 1 = o_orderkey
        blooms.append(read_bloom_filter(data, cols[0][3]))
        st = cols[1][3].get(12, {})
        file_maxes.append(
            struct.unpack("<q", st.get(5, st.get(1)))[0]
        )

    present = [
        r[0]
        for r in t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(_N_PRESENT)
        .collect()
    ]
    absent = [max(file_maxes) + 1 + j for j in range(_N_ABSENT)]

    def _s(k: int) -> bytes:
        return f"ORD-{k:09d}".encode()

    present_hits = sum(
        1
        for k in present
        if sbbf_contains_binary(blooms[k % _N_FILES], _s(k))
    )
    fp_hits = sum(
        1
        for k in absent
        for b in blooms
        if sbbf_contains_binary(b, _s(k))
    )
    candidates = sorted(
        {
            i
            for k in present + absent
            for i, b in enumerate(blooms)
            if sbbf_contains_binary(b, _s(k))
        }
    )

    plan = spark.createDataFrame(
        [(paths[i],) for i in candidates], "path string"
    ).repartition(max(len(candidates), 1))

    def _read_files(batches) -> Iterator:
        import pyarrow.parquet as pq

        for pdf in batches:
            for rec in pdf.itertuples(index=False):
                yield pq.read_table(
                    rec.path,
                    columns=["s", "o_orderkey", "o_totalprice"],
                ).to_pandas()

    probe_set = [f"ORD-{k:09d}" for k in present + absent]
    found = plan.mapInPandas(
        _read_files,
        "s string, o_orderkey bigint, o_totalprice double",
    ).filter(F.col("s").isin(probe_set))
    out = found.agg(
        F.lit(_N_FILES).cast("int").alias("files_total"),
        F.lit(len(blooms)).cast("int").alias("blooms_decoded"),
        F.lit(_N_PRESENT + _N_ABSENT).cast("int").alias("n_probes"),
        F.lit(present_hits).cast("int").alias("present_hits"),
        F.lit(fp_hits <= 20).alias("fp_hits_bounded"),
        F.count("*").alias("n_found"),
        # keys recovered from the DECODED string column, so a bloom
        # or filter slip on the string path flips this, not just
        # the long column riding along
        F.sum(F.substring("s", 5, 9).cast("long")).cast("bigint")
        .alias("found_key_sum"),
        dsum("o_totalprice").alias("revenue_found"),
    ).localCheckpoint(eager=True)  # 1-row; frees the fixture root
    shutil.rmtree(root, ignore_errors=True)
    return out
