"""Differential tests for the hand-built parquet footer decoder
(sources/parquet_meta.py): every decoded field must match pyarrow's
own metadata API byte-for-byte — the same reference-implementation
discipline as the zstd CLI differential (test_zstd_real_file_
differential)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from spark_hive_spark.sources.parquet_meta import (
    decode_footer,
    footer_summary,
)


def _fixture_table(n: int = 5000) -> pa.Table:
    """Mixed physical types incl. nulls and strings (deterministic)."""
    keys = list(range(1, n + 1))
    return pa.table(
        {
            "k64": pa.array(keys, pa.int64()),
            "k32": pa.array([(k * 7) % 10007 for k in keys], pa.int32()),
            "price": pa.array([k * 0.25 for k in keys], pa.float64()),
            "name": pa.array(
                [None if k % 97 == 0 else f"cust#{k:07d}" for k in keys],
                pa.string(),
            ),
            "ts": pa.array(
                [
                    dt.datetime(1995, 1, 1) + dt.timedelta(minutes=k * 13)
                    for k in keys
                ],
                pa.timestamp("us"),
            ),
        }
    )


@pytest.fixture(scope="module")
def written(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pqm") / "fixture.parquet")
    pq.write_table(_fixture_table(), path, row_group_size=777)
    with open(path, "rb") as fh:
        data = fh.read()
    return path, data


def test_footer_matches_pyarrow_everywhere(written):
    path, data = written
    summ = footer_summary(data)
    pf = pq.ParquetFile(path)
    md = pf.metadata
    assert summ["num_rows"] == md.num_rows
    assert len(summ["row_groups"]) == md.num_row_groups
    assert summ["created_by"] == md.created_by
    assert summ["columns"] == [
        md.schema.column(i).name for i in range(md.num_columns)
    ]
    for i, rg in enumerate(summ["row_groups"]):
        ref_rg = md.row_group(i)
        assert rg["num_rows"] == ref_rg.num_rows
        for j in range(ref_rg.num_columns):
            ref_col = ref_rg.column(j)
            got = rg["stats"][ref_col.path_in_schema]
            s = ref_col.statistics
            assert got["null_count"] == s.null_count
            assert got["num_values"] == ref_col.num_values
            want_min, want_max = s.min, s.max
            if isinstance(want_min, dt.datetime):  # stats are raw micros
                epoch = dt.datetime(1970, 1, 1)
                want_min = int((want_min - epoch).total_seconds() * 10**6)
                want_max = int((want_max - epoch).total_seconds() * 10**6)
            assert got["min"] == want_min, (i, ref_col.path_in_schema)
            assert got["max"] == want_max, (i, ref_col.path_in_schema)


def test_struct_walk_exposes_spec_field_ids(written):
    _, data = written
    fmd = decode_footer(data)
    # parquet.thrift FileMetaData: 1 version, 2 schema, 3 num_rows,
    # 4 row_groups, 6 created_by
    assert set(fmd) >= {1, 2, 3, 4}
    assert isinstance(fmd[1], int) and isinstance(fmd[3], int)
    root = fmd[2][0]
    assert root[5] == 5  # root SchemaElement.num_children
    rg0 = fmd[4][0]
    cmd = rg0[1][0][3]  # first ColumnChunk.meta_data
    assert cmd[3] == [b"k64"]  # path_in_schema
    assert 12 in cmd  # statistics present


def test_rejects_non_parquet_and_truncation(written):
    _, data = written
    with pytest.raises(ValueError, match="PAR1"):
        decode_footer(b"NOPE" + data[4:])
    with pytest.raises(ValueError):
        # footer length pointing past the start of the file
        decode_footer(data[:4] + data[-8:])


def test_page_decode_matches_pyarrow_values(tmp_path):
    """The hand-built data-page walk (PageHeader thrift + RLE/bit-
    packed def levels + PLAIN int64) must reproduce pyarrow's own
    read of the same file, nulls included, across several pages and
    row groups."""
    from spark_hive_spark.sources.parquet_meta import (
        decode_footer,
        read_int64_column_pages,
    )

    n = 7000
    vals = [None if k % 13 == 0 else k * 3 for k in range(n)]
    path = str(tmp_path / "pages.parquet")
    pq.write_table(
        pa.table({"v": pa.array(vals, pa.int64())}),
        path,
        row_group_size=2000,
        use_dictionary=False,
        compression="NONE",
        data_page_size=2048,
    )
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    got: list = []
    total_pages = 0
    for rg in fmd[4]:
        vs, n_pages = read_int64_column_pages(data, rg[1][0][3])
        got.extend(vs)
        total_pages += n_pages
    assert got == pq.read_table(path)["v"].to_pylist() == vals
    assert total_pages > len(fmd[4])  # multiple pages per group


@pytest.mark.parametrize(
    "opts",
    [
        dict(use_dictionary=False, compression="NONE",
             data_page_version="2.0"),
        dict(use_dictionary=False, compression="NONE",
             data_page_version="2.0",
             column_encoding={"v": "DELTA_BINARY_PACKED"}),
        dict(use_dictionary=False, compression="ZSTD",
             data_page_version="2.0",
             column_encoding={"v": "DELTA_BINARY_PACKED"}),
        dict(compression="SNAPPY", data_page_version="2.0"),
    ],
    ids=["v2-plain", "v2-delta", "v2-delta-zstd", "v2-dict-snappy"],
)
def test_v2_pages_and_delta_binary_packed(tmp_path, opts):
    """DataPageHeaderV2 (levels uncompressed before the data blob,
    is_compressed flag) and DELTA_BINARY_PACKED (block/miniblock
    zigzag deltas, zero-padded last miniblock, never-started trailing
    miniblocks) must reproduce pyarrow's read across sorted/random/
    constant/nullable distributions."""
    import random

    from spark_hive_spark.sources.parquet_meta import (
        decode_footer,
        read_int64_column_pages,
    )

    random.seed(11)
    cases = {
        "sorted_nulls": [
            None if i % 13 == 0 else i * 7 - 5000 for i in range(6000)
        ],
        "random": [random.randint(-(2**40), 2**40) for _ in range(5000)],
        "constant": [99] * 4000,
        "no_nulls_sorted": list(range(7000)),
    }
    for name, vals in cases.items():
        path = str(tmp_path / f"{name}.parquet")
        pq.write_table(
            pa.table({"v": pa.array(vals, pa.int64())}),
            path, row_group_size=2500, data_page_size=2048, **opts,
        )
        with open(path, "rb") as fh:
            data = fh.read()
        got: list = []
        for rg in decode_footer(data)[4]:
            vs, _ = read_int64_column_pages(data, rg[1][0][3])
            got.extend(vs)
        assert got == pq.read_table(path)["v"].to_pylist() == vals, name


@pytest.mark.parametrize(
    "opts",
    [
        dict(compression="SNAPPY"),
        dict(use_dictionary=False, compression="NONE"),
        dict(use_dictionary=False, compression="ZSTD",
             data_page_version="2.0",
             column_encoding={"s": "DELTA_LENGTH_BYTE_ARRAY"}),
        dict(use_dictionary=False, compression="NONE",
             data_page_version="2.0",
             column_encoding={"s": "DELTA_BYTE_ARRAY"}),
        dict(use_dictionary=False, compression="ZSTD",
             data_page_version="2.0",
             column_encoding={"s": "DELTA_BYTE_ARRAY"}),
    ],
    ids=["v1-dict-snappy", "v1-plain", "v2-dlba-zstd", "v2-dba",
         "v2-dba-zstd"],
)
def test_byte_array_pages_differential(tmp_path, opts):
    """`read_byte_array_column_pages` must reproduce pyarrow's read of
    string columns across every encoding a real writer emits — PLAIN,
    dictionary, DELTA_LENGTH_BYTE_ARRAY, and the front-coded
    DELTA_BYTE_ARRAY — over low-cardinality, shared-prefix (the
    DELTA_BYTE_ARRAY sweet spot), unicode+nulls, empty-heavy, and
    random corpora."""
    import random

    from spark_hive_spark.sources.parquet_meta import (
        decode_footer,
        read_byte_array_column_pages,
    )

    random.seed(5)
    cases = {
        "low_card": [f"cat{i % 7}" for i in range(3000)],
        "shared_prefix": [
            f"s3://bucket/part/{i:08d}/file.bin" for i in range(3000)
        ],
        "unicode_nulls": [
            None if i % 9 == 0 else f"naïve—{i}🌍" for i in range(2500)
        ],
        "empty_mix": [
            "" if i % 5 == 0 else "x" * (i % 33) for i in range(2000)
        ],
        "random": [
            "".join(
                chr(97 + random.randint(0, 25))
                for _ in range(random.randint(0, 20))
            )
            for _ in range(2000)
        ],
    }
    for name, vals in cases.items():
        path = str(tmp_path / f"{name}.parquet")
        pq.write_table(
            pa.table({"s": pa.array(vals, pa.string())}),
            path, row_group_size=1200, data_page_size=2048, **opts,
        )
        with open(path, "rb") as fh:
            data = fh.read()
        got: list = []
        for rg in decode_footer(data)[4]:
            vs, _ = read_byte_array_column_pages(data, rg[1][0][3])
            got.extend(vs)
        assert got == pq.read_table(path)["s"].to_pylist() == vals, name


@pytest.mark.parametrize(
    "opts",
    [
        dict(compression="SNAPPY"),
        dict(use_dictionary=False, compression="ZSTD",
             data_page_version="2.0"),
    ],
    ids=["v1-dict-snappy", "v2-plain-zstd"],
)
def test_fixed_width_types_page_differential(tmp_path, opts):
    """The fixed-width page reader covers INT32/FLOAT/DOUBLE alongside
    INT64 — dictionary and plain, v1 and v2, compressed — matching
    pyarrow's read with nulls."""
    from spark_hive_spark.sources.parquet_meta import (
        decode_footer,
        read_int64_column_pages,
    )

    cases = {
        "i32": (
            [None if i % 11 == 0 else (i * 37) % 100000 - 50000
             for i in range(5000)],
            pa.int32(),
        ),
        "f64": (
            [None if i % 11 == 0 else i * 0.25 for i in range(5000)],
            pa.float64(),
        ),
        "f32": (
            [None if i % 11 == 0 else float(i % 1000)
             for i in range(5000)],
            pa.float32(),
        ),
    }
    for name, (vals, typ) in cases.items():
        path = str(tmp_path / f"{name}.parquet")
        pq.write_table(
            pa.table({"v": pa.array(vals, typ)}),
            path, row_group_size=2000, data_page_size=2048, **opts,
        )
        with open(path, "rb") as fh:
            data = fh.read()
        got: list = []
        for rg in decode_footer(data)[4]:
            vs, _ = read_int64_column_pages(data, rg[1][0][3])
            got.extend(vs)
        assert got == pq.read_table(path)["v"].to_pylist(), name


def test_rle_hybrid_both_run_kinds():
    """decode_rle_hybrid handles RLE runs, bit-packed groups, and
    mixed streams (hand-assembled per the parquet encoding spec)."""
    import struct as _struct

    from spark_hive_spark.sources.parquet_meta import decode_rle_hybrid

    # RLE run: header (5<<1)=10, value byte 1
    body = bytes([10, 1])
    buf = _struct.pack("<I", len(body)) + body
    assert decode_rle_hybrid(buf, 1, 5) == ([1] * 5, 4 + len(body))
    # bit-packed: header (1<<1)|1=3, one byte 0b01010101 -> 8 values
    body = bytes([3, 0b01010101])
    buf = _struct.pack("<I", len(body)) + body
    assert decode_rle_hybrid(buf, 1, 8)[0] == [1, 0] * 4
    # mixed: 3 RLE zeros then a bit-packed byte
    body = bytes([6, 0, 3, 0b00001111])
    buf = _struct.pack("<I", len(body)) + body
    assert decode_rle_hybrid(buf, 1, 11)[0] == [0] * 3 + [1] * 4 + [0] * 4
    with pytest.raises(ValueError):
        decode_rle_hybrid(b"\x01", 1, 1)  # truncated prefix
    with pytest.raises(ValueError):  # body underruns the level count
        decode_rle_hybrid(_struct.pack("<I", 2) + bytes([2, 1]), 1, 99)


def test_footer_differential_across_types(tmp_path):
    """Footer decode vs pyarrow across a broader type matrix than the
    main fixture: decimal128 (FLBA big-endian unscaled stats), bool,
    float32, date32 — every leaf's stats must match pyarrow's."""
    import decimal

    n = 3000
    tbl = pa.table(
        {
            "dec": pa.array(
                [decimal.Decimal(k).scaleb(-2) for k in range(n)],
                pa.decimal128(12, 2),
            ),
            "flag": pa.array([k % 3 == 0 for k in range(n)], pa.bool_()),
            "f32": pa.array([k * 0.5 for k in range(n)], pa.float32()),
            "d32": pa.array(
                [dt.date(2000, 1, 1) + dt.timedelta(days=k % 900)
                 for k in range(n)],
                pa.date32(),
            ),
        }
    )
    path = str(tmp_path / "types.parquet")
    pq.write_table(tbl, path, row_group_size=1000)
    with open(path, "rb") as fh:
        summ = footer_summary(fh.read())
    md = pq.ParquetFile(path).metadata
    for i, rg in enumerate(summ["row_groups"]):
        ref_rg = md.row_group(i)
        for j in range(ref_rg.num_columns):
            col = ref_rg.column(j)
            got = rg["stats"][col.path_in_schema]
            s = col.statistics
            want_min, want_max = s.min, s.max
            if col.path_in_schema == "d32":  # raw int32 days
                epoch = dt.date(1970, 1, 1)
                want_min = (want_min - epoch).days
                want_max = (want_max - epoch).days
            assert got["min"] == want_min, col.path_in_schema
            assert got["max"] == want_max, col.path_in_schema
            assert got["null_count"] == s.null_count


def test_g711_wav_tolerates_extra_chunks():
    """Real-world non-PCM WAVs carry a 'fact' chunk (and often LIST
    metadata); the chunk walker must skip unknown chunks and decode
    the same samples."""
    import struct as _struct

    import numpy as np

    from spark_hive_spark.operators.multimodal import (
        decode_g711_wav,
        encode_g711_wav,
    )

    codes = bytes(range(64))
    blob = encode_g711_wav(codes, 7)
    # splice a fact chunk (sample count) + an odd-sized LIST chunk
    # (exercising word-aligned skip) between fmt and data
    fact = b"fact" + _struct.pack("<I", 4) + _struct.pack("<I", len(codes))
    lst = b"LIST" + _struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
    fmt_end = 12 + 8 + 16
    spliced = blob[:fmt_end] + fact + lst + blob[fmt_end:]
    spliced = spliced[:4] + _struct.pack(
        "<I", len(spliced) - 8
    ) + spliced[8:]
    law, rate, pcm = decode_g711_wav(spliced)
    _, _, ref = decode_g711_wav(blob)
    assert (law, rate) == ("ulaw", 8000)
    assert np.array_equal(pcm, ref)


def test_spark_native_file_decodes_by_hand(spark, tmp_path):
    """A file written by Spark itself (parquet-mr defaults: zstd
    pages + dictionary encoding) must decode through the hand-built
    stack — thrift footer, dictionary page, PLAIN_DICTIONARY index
    streams, zstd page decompression — to exactly what pyarrow reads
    from the same file."""
    import glob

    from spark_hive_spark.sources.parquet_meta import (
        decode_footer,
        read_int64_column_pages,
    )

    out = str(tmp_path / "native")
    spark.range(1, 5001).selectExpr(
        "nullif(id % 300, 7) AS v"
    ).coalesce(1).write.parquet(out)
    path = glob.glob(out + "/*.parquet")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    got: list = []
    for rg in fmd[4]:
        cmd = rg[1][0][3]
        assert cmd[4] != 0, "expected a compressed Spark-native file"
        assert 11 in cmd, "expected a dictionary page"
        vs, _ = read_int64_column_pages(data, cmd)
        got.extend(vs)
    assert got == pq.read_table(path)["v"].to_pylist()
    assert got.count(None) > 0  # real def-level nulls exercised


def test_single_row_group_boundary():
    tbl = _fixture_table(10)
    import io

    buf = io.BytesIO()
    pq.write_table(tbl, buf, row_group_size=1_000_000)
    summ = footer_summary(buf.getvalue())
    assert len(summ["row_groups"]) == 1
    assert summ["row_groups"][0]["num_rows"] == 10
    st = summ["row_groups"][0]["stats"]["k64"]
    assert (st["min"], st["max"]) == (1, 10)
    # BYTE_ARRAY stats decode as UTF-8
    names = summ["row_groups"][0]["stats"]["name"]
    assert names["min"] == "cust#0000001"


def test_nested_decimal_stats_decode(tmp_path):
    """ADVICE r10: a DECIMAL leaf nested inside a group must still
    decode its FLBA stats as Decimal — the scale map is keyed by the
    full dotted path (what ColumnMetaData.path_in_schema joins to),
    not the bare leaf name."""
    import decimal
    import io

    tbl = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "m": pa.array(
                [
                    {"amt": decimal.Decimal("12.34"), "n": 1},
                    {"amt": decimal.Decimal("-5.00"), "n": 2},
                    {"amt": decimal.Decimal("99.99"), "n": 3},
                ],
                pa.struct(
                    [("amt", pa.decimal128(20, 2)), ("n", pa.int32())]
                ),
            ),
        }
    )
    buf = io.BytesIO()
    pq.write_table(tbl, buf)
    summ = footer_summary(buf.getvalue())
    assert "m.amt" in summ["columns"]
    st = summ["row_groups"][0]["stats"]["m.amt"]
    assert st["min"] == decimal.Decimal("-5.00")
    assert st["max"] == decimal.Decimal("99.99")
    # the sibling int leaf resolves through the same dotted path
    assert summ["row_groups"][0]["stats"]["m.n"]["min"] == 1


def test_required_column_pages_decode(tmp_path):
    """ADVICE r10: a REQUIRED column's v1 data pages carry NO
    definition-levels stream — parsing one would misread the first
    data bytes as an RLE length prefix. max_def_level=0 must decode
    the page body as values from byte 0."""
    from spark_hive_spark.sources.parquet_meta import (
        read_byte_array_column_pages,
        read_int64_column_pages,
    )

    import io

    n = 3000
    tbl = pa.table(
        {
            "req": pa.array(range(1, n + 1), pa.int64()),
            "s": pa.array([f"w{i:05d}" for i in range(n)], pa.string()),
        },
        schema=pa.schema(
            [
                pa.field("req", pa.int64(), nullable=False),
                pa.field("s", pa.string(), nullable=False),
            ]
        ),
    )
    buf = io.BytesIO()
    pq.write_table(
        tbl, buf, row_group_size=1111, use_dictionary=False,
        compression="none", data_page_version="1.0",
    )
    data = buf.getvalue()
    fmd = decode_footer(data)
    # SchemaElement field 3 = repetition_type; 0 = REQUIRED
    assert fmd[2][1][3] == 0 and fmd[2][2][3] == 0
    got_i: list = []
    got_s: list = []
    for rg in fmd[4]:
        got_i.extend(
            read_int64_column_pages(data, rg[1][0][3], max_def_level=0)[0]
        )
        got_s.extend(
            read_byte_array_column_pages(
                data, rg[1][1][3], max_def_level=0
            )[0]
        )
    assert got_i == list(range(1, n + 1))
    assert got_s == [f"w{i:05d}" for i in range(n)]
    # (max_def_level > 1 is no longer a seam — struct-leaf decode is
    # covered by test_struct_leaf_levels_differential)


def test_bloom_filter_matches_spark_writer(spark, tmp_path):
    """The hand-built SBBF pipeline (BloomFilterHeader thrift -> raw
    bitset -> XXH64 -> salted block probe) against a filter written
    by SPARK ITSELF: every present key must hit (any slip in the
    salt/rotation/fast-range math makes present-key hits ~random),
    and absent keys must reject near the configured ~1% fpp."""
    import glob

    from spark_hive_spark.sources.parquet_bloom import (
        read_bloom_filter,
        sbbf_contains_int64,
    )
    from spark_hive_spark.sources.parquet_meta import decode_footer

    out = str(tmp_path / "bloomed")
    keys = [k * 7 + 3 for k in range(5000)]
    spark.createDataFrame(
        [(k,) for k in keys], "k bigint"
    ).coalesce(1).write.option(
        "parquet.bloom.filter.enabled#k", "true"
    ).option(
        "parquet.bloom.filter.expected.ndv#k", "5000"
    ).parquet(out)
    path = glob.glob(out + "/*.parquet")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    cmd = fmd[4][0][1][0][3]
    bitset = read_bloom_filter(data, cmd)
    assert len(bitset) % 32 == 0 and len(bitset) > 0
    assert all(sbbf_contains_int64(bitset, k) for k in keys)
    absent = [k * 7 + 4 for k in range(5000)]  # disjoint residue
    fp = sum(sbbf_contains_int64(bitset, k) for k in absent)
    assert fp / len(absent) < 0.05, f"fp rate {fp/5000:.3f}"


def test_bloom_filter_loud_seams(tmp_path):
    from spark_hive_spark.sources.parquet_bloom import (
        read_bloom_filter,
        sbbf_contains_hash,
    )

    with pytest.raises(ValueError):
        read_bloom_filter(b"", {1: 2})  # no field 14
    # a filter of one block: hand-set every salted bit for h=0
    import struct as _s

    salts = (
        0x47B6137B, 0x44974D91, 0x8824AD5B, 0xA2B7289D,
        0x705495C7, 0x2DF1424B, 0x9EFC4947, 0x5C6BFB31,
    )
    words = [1 << (((0 * s) & 0xFFFFFFFF) >> 27) for s in salts]
    block = b"".join(_s.pack("<I", w) for w in words)
    assert sbbf_contains_hash(block, 0)
    assert not sbbf_contains_hash(block, (1 << 32) | 1)


def test_page_index_readers_consistent(tmp_path):
    """ColumnIndex/OffsetIndex hand-decode (round 11) against a
    pyarrow-written page index: per-page min/max must equal the
    true extrema of each page's decoded values, first_row_index must
    be the running row count, and selective page reads must
    reproduce the sequential walk exactly."""
    import io

    from spark_hive_spark.sources.parquet_meta import (
        read_column_index,
        read_fixed_pages_at,
        read_int64_column_pages,
        read_offset_index,
    )

    n = 5000
    tbl = pa.table({"k": pa.array(range(1, n + 1), pa.int64())})
    buf = io.BytesIO()
    pq.write_table(
        tbl, buf, write_page_index=True, data_page_size=1024,
        use_dictionary=False, compression="none",
    )
    data = buf.getvalue()
    fmd = decode_footer(data)
    cc = fmd[4][0][1][0]
    ci = read_column_index(data, cc)
    oi = read_offset_index(data, cc)
    assert len(ci["mins"]) == len(oi) > 3
    assert ci["boundary_order"] == 1  # sorted data -> ASCENDING
    assert not any(ci["null_pages"])
    seq, n_pages = read_int64_column_pages(data, cc[3])
    assert n_pages == len(oi)
    pages = read_fixed_pages_at(data, cc[3], [off for off, _, _ in oi])
    flat = [v for pg in pages for v in pg]
    assert flat == seq == list(range(1, n + 1))
    row = 0
    import struct as _s

    for i, pg in enumerate(pages):
        assert oi[i][2] == row
        assert _s.unpack("<q", ci["mins"][i])[0] == min(pg)
        assert _s.unpack("<q", ci["maxs"][i])[0] == max(pg)
        row += len(pg)


def test_page_index_missing_is_loud():
    import io

    from spark_hive_spark.sources.parquet_meta import (
        read_column_index,
        read_offset_index,
    )

    buf = io.BytesIO()
    pq.write_table(
        pa.table({"k": pa.array([1, 2, 3], pa.int64())}), buf,
        write_page_index=False,
    )
    fmd = decode_footer(buf.getvalue())
    cc = fmd[4][0][1][0]
    with pytest.raises(ValueError, match="column index"):
        read_column_index(buf.getvalue(), cc)
    with pytest.raises(ValueError, match="offset index"):
        read_offset_index(buf.getvalue(), cc)


def _nested_rows(n: int = 2500) -> list:
    """All four Dremel shapes: null lists, empty lists, null
    elements, values — lengths 0-4."""
    rows = []
    for k in range(1, n + 1):
        if k % 11 == 0:
            rows.append(None)
        else:
            rows.append(
                [None if (k + i) % 7 == 0 else k * 10 + i
                 for i in range(1, k % 5 + 1)]
            )
    return rows


@pytest.mark.parametrize(
    "opts",
    [
        dict(use_dictionary=False, compression="NONE",
             data_page_size=1024),
        dict(use_dictionary=True, compression="NONE",
             data_page_size=1024),
        dict(use_dictionary=False, compression="SNAPPY",
             data_page_size=2048, data_page_version="2.0"),
        dict(use_dictionary=True, compression="ZSTD",
             data_page_size=2048, data_page_version="2.0"),
    ],
    ids=["v1-plain", "v1-dict", "v2-snappy", "v2-zstd-dict"],
)
def test_nested_list_pages_differential(tmp_path, opts):
    """Hand-decoded list<int64> == pyarrow's own read-back, across
    page versions, dictionary on/off, and hand-built codecs, with
    row groups small enough that lists cross page boundaries."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        max_levels,
        read_list_fixed_column_pages,
    )

    rows = _nested_rows()
    tbl = pa.table({"vals": pa.array(rows, pa.list_(pa.int64()))})
    path = str(tmp_path / "nested.parquet")
    pq.write_table(tbl, path, row_group_size=700, **opts)
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    (leaf_path, chain), = reps.items()
    assert leaf_path.startswith("vals.list.")
    assert max_levels(chain) == (3, 1)
    got: list = []
    n_pages = 0
    for rg in fmd[4]:
        vs, np_ = read_list_fixed_column_pages(data, rg[1][0][3], chain)
        got.extend(vs)
        n_pages += np_
    assert n_pages > len(fmd[4])  # several pages per group
    assert got == pq.read_table(path)["vals"].to_pylist() == rows


def test_nested_required_element_and_loud_seams(tmp_path):
    """containsNull=false lists (max_def 2) decode; deeper nesting
    and non-fixed-width elements stay loud."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        max_levels,
        read_list_fixed_column_pages,
    )

    rows = [[] if k % 5 == 0 else [k * 10 + i for i in range(k % 4 + 1)]
            for k in range(1, 800)]
    tbl = pa.table(
        {"vals": pa.array(rows, pa.list_(pa.field("e", pa.int64(),
                                                  nullable=False)))}
    )
    path = str(tmp_path / "req.parquet")
    pq.write_table(tbl, path, row_group_size=300,
                   use_dictionary=False, compression="NONE",
                   data_page_size=512)
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    (_, chain), = _leaf_repetitions(fmd[2]).items()
    assert max_levels(chain) == (2, 1)
    got = []
    for rg in fmd[4]:
        got.extend(read_list_fixed_column_pages(data, rg[1][0][3],
                                                chain)[0])
    assert got == rows

    # list<list<int>> (max_rep 2) must be rejected loudly
    deep = pa.table({"v": pa.array([[[1, 2]], [[3]]],
                                   pa.list_(pa.list_(pa.int64())))})
    dpath = str(tmp_path / "deep.parquet")
    pq.write_table(deep, dpath)
    with open(dpath, "rb") as fh:
        ddata = fh.read()
    dfmd = decode_footer(ddata)
    (_, dchain), = _leaf_repetitions(dfmd[2]).items()
    with pytest.raises(NotImplementedError, match="nested shape"):
        read_list_fixed_column_pages(ddata, dfmd[4][0][1][0][3], dchain)

    # list<boolean> elements are neither fixed-width nor BYTE_ARRAY
    stbl = pa.table({"v": pa.array([[True], [False, True]],
                                   pa.list_(pa.bool_()))})
    spath = str(tmp_path / "bool.parquet")
    pq.write_table(stbl, spath)
    with open(spath, "rb") as fh:
        sdata = fh.read()
    sfmd = decode_footer(sdata)
    (_, schain), = _leaf_repetitions(sfmd[2]).items()
    with pytest.raises(NotImplementedError, match="BYTE_ARRAY"):
        read_list_fixed_column_pages(sdata, sfmd[4][0][1][0][3], schain)


def test_spark_native_nested_file_decodes_by_hand(spark, tmp_path):
    """End-to-end on Spark's own writer: parquet-mr 3-level list
    naming (col.list.element), snappy pages, dictionary fallback."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        read_list_fixed_column_pages,
    )

    df = spark.range(1, 3000).selectExpr(
        """
        CASE WHEN id % 11 = 0 THEN CAST(NULL AS array<bigint>)
             ELSE transform(slice(array(1,2,3,4), 1, CAST(id % 5 AS INT)),
                  i -> CASE WHEN (id + i) % 7 = 0 THEN CAST(NULL AS BIGINT)
                       ELSE id * 10 + i END)
        END AS vals
        """
    )
    root = str(tmp_path / "spark_nested")
    df.coalesce(1).write.option("parquet.page.size", 2048).parquet(root)
    import glob

    path = glob.glob(root + "/*.parquet")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    assert list(reps) == ["vals.list.element"]
    got = []
    for rg in fmd[4]:
        got.extend(read_list_fixed_column_pages(data, rg[1][0][3],
                                                reps["vals.list.element"])[0])
    assert got == [r.vals for r in df.collect()]


@pytest.mark.parametrize(
    "opts",
    [
        dict(use_dictionary=False, compression="NONE",
             data_page_size=1024),
        dict(use_dictionary=True, compression="SNAPPY",
             data_page_size=1024),
        dict(use_dictionary=False, compression="ZSTD",
             data_page_size=2048, data_page_version="2.0"),
    ],
    ids=["v1-plain", "v1-dict-snappy", "v2-zstd"],
)
def test_nested_list_strings_differential(tmp_path, opts):
    """Hand-decoded list<string> == pyarrow's read-back: the Dremel
    level streams routed through the BYTE_ARRAY page decoder."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        read_list_column_pages,
    )

    rows = []
    for k in range(1, 1500):
        if k % 11 == 0:
            rows.append(None)
        else:
            rows.append(
                [None if (k + i) % 7 == 0 else f"w{k}_{i}"
                 for i in range(1, k % 5 + 1)]
            )
    tbl = pa.table({"vals": pa.array(rows, pa.list_(pa.string()))})
    path = str(tmp_path / "ls.parquet")
    pq.write_table(tbl, path, row_group_size=500, **opts)
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    (_, chain), = _leaf_repetitions(fmd[2]).items()
    got = []
    for rg in fmd[4]:
        got.extend(read_list_column_pages(data, rg[1][0][3], chain)[0])
    assert got == pq.read_table(path)["vals"].to_pylist() == rows


def test_struct_leaf_levels_differential(tmp_path):
    """struct<k int64, tag string>: leaf values match pyarrow, and
    the raw definition levels disambiguate struct-null (def 0) from
    field-null (def 1) — the two leaves must agree on def-0 rows."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        max_levels,
        read_leaf_pages_with_levels,
    )

    srows = [
        None if k % 13 == 0 else {
            "k": None if k % 17 == 0 else k,
            "tag": None if k % 5 == 0 else f"t{k % 7}",
        }
        for k in range(1, 1200)
    ]
    tbl = pa.table({
        "s": pa.array(srows, pa.struct([("k", pa.int64()),
                                        ("tag", pa.string())]))
    })
    path = str(tmp_path / "st.parquet")
    pq.write_table(tbl, path, row_group_size=400,
                   use_dictionary=True, compression="SNAPPY",
                   data_page_size=1024)
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    assert {p: max_levels(c) for p, c in reps.items()} == {
        "s.k": (2, 0), "s.tag": (2, 0),
    }
    k_vals, k_defs, t_vals, t_defs = [], [], [], []
    for rg in fmd[4]:
        kv, kd, _ = read_leaf_pages_with_levels(data, rg[1][0][3], 2)
        tv, td, _ = read_leaf_pages_with_levels(data, rg[1][1][3], 2)
        k_vals += kv; k_defs += kd; t_vals += tv; t_defs += td
    assert k_vals == [None if r is None else r["k"] for r in srows]
    assert t_vals == [None if r is None else r["tag"] for r in srows]
    null_struct = [i for i, r in enumerate(srows) if r is None]
    assert [i for i, d in enumerate(k_defs) if d == 0] == null_struct
    assert [i for i, d in enumerate(t_defs) if d == 0] == null_struct
    # field-null (struct present) is def 1, on BOTH leaf kinds
    assert [i for i, d in enumerate(k_defs) if d == 1] == [
        i for i, r in enumerate(srows) if r is not None and r["k"] is None
    ]


def test_flba_decimal_and_boolean_differential(spark, tmp_path):
    """FIXED_LEN_BYTE_ARRAY decimals (big-endian two's-complement
    unscaled) and bit-packed PLAIN booleans against Spark's own
    writer — including the REQUIRED/no-levels path (spark.range ids
    are non-nullable) and negative unscaled values."""
    from decimal import Decimal

    import glob

    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        max_levels,
        read_boolean_column_pages,
        read_flba_column_pages,
    )

    df = spark.range(1, 9000).selectExpr(
        "CAST((id - 4500) * 1.07 AS decimal(25,2)) AS dec",  # REQUIRED
        "id % 3 = 0 AS flag",
        """CASE WHEN id % 50 = 0 THEN CAST(NULL AS BOOLEAN)
                ELSE id % 7 < 3 END AS flag_n""",
        """CAST(CASE WHEN id % 50 = 0 THEN NULL ELSE id * 0.31 END
                AS decimal(25,2)) AS dec_n""",
    )
    root = str(tmp_path / "decbool")
    df.coalesce(1).write.option("parquet.page.size", 2048).parquet(root)
    path = glob.glob(root + "/*.parquet")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    ses = {se[4].decode(): se for se in fmd[2][1:]}
    levels = {k: max_levels(v)[0]
              for k, v in _leaf_repetitions(fmd[2]).items()}
    assert ses["dec"].get(3, 0) == 0 and levels["dec"] == 0  # REQUIRED
    assert ses["dec"][2] == 11 and ses["dec"][7] == 2
    cols = {".".join(s.decode() for s in cc[3][3]): i
            for i, cc in enumerate(fmd[4][0][1])}
    exp = df.collect()
    for name in ("dec", "dec_n"):
        got = []
        for rg in fmd[4]:
            got.extend(read_flba_column_pages(
                data, rg[1][cols[name]][3], ses[name][2], levels[name]
            )[0])
        want = [getattr(r, name) for r in exp]
        scaled = [None if v is None else Decimal(v).scaleb(-2)
                  for v in got]
        assert scaled == want, name
        if name == "dec":
            assert any(v < 0 for v in got)  # negatives really occur
    for name in ("flag", "flag_n"):
        got = []
        for rg in fmd[4]:
            got.extend(read_boolean_column_pages(
                data, rg[1][cols[name]][3], levels[name]
            )[0])
        assert got == [getattr(r, name) for r in exp], name


def test_int96_timestamp_differential(spark, tmp_path):
    """INT96 (Spark's default parquet timestamp layout): hand-decoded
    epoch micros == Spark's own read-back, dictionary + PLAIN pages,
    nulls included."""
    import datetime as dtm
    import glob

    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        max_levels,
        read_int96_column_pages,
    )

    assert spark.conf.get(
        "spark.sql.parquet.outputTimestampType"
    ) == "INT96"  # the premise: this is what Spark writes by default
    df = spark.range(1, 9000).selectExpr(
        "CASE WHEN id % 97 = 0 THEN CAST(NULL AS TIMESTAMP) "
        "ELSE timestamp_seconds(788918400 + id * 3607) END AS ts"
    )
    root = str(tmp_path / "i96")
    df.coalesce(1).write.option("parquet.page.size", 2048).parquet(root)
    path = glob.glob(root + "/*.parquet")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    (_, chain), = _leaf_repetitions(fmd[2]).items()
    got = []
    for rg in fmd[4]:
        got.extend(read_int96_column_pages(
            data, rg[1][0][3], max_levels(chain)[0]
        )[0])
    epoch = dtm.datetime(1970, 1, 1)
    want = [
        None if r.ts is None
        else int((r.ts - epoch).total_seconds()) * 1_000_000
        for r in df.collect()
    ]
    assert got == want
    assert 11 in fmd[4][0][1][0][3]  # dictionary-encoded, as Spark does


def _cmds_by_path(rg):
    return {".".join(x.decode() for x in c[3][3]): c[3] for c in rg[1]}


@pytest.mark.parametrize(
    "opts",
    [
        dict(use_dictionary=False, compression="NONE",
             data_page_size=512),
        dict(use_dictionary=True, compression="SNAPPY",
             data_page_size=1024),
        dict(use_dictionary=False, compression="ZSTD",
             data_page_size=1024, data_page_version="2.0"),
    ],
    ids=["v1-plain", "v1-dict-snappy", "v2-zstd"],
)
def test_map_pages_differential(tmp_path, opts):
    """Hand-decoded map<string,int64> == pyarrow's read-back across
    page versions, dictionary on/off, and hand-built codecs, with
    row groups small enough that maps cross page boundaries."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        read_map_column_pages,
    )

    rows = []
    for k in range(1, 1200):
        if k % 11 == 0:
            rows.append(None)
        elif k % 7 == 0:
            rows.append({})
        else:
            rows.append({f"k{j}": (None if (k + j) % 5 == 0
                                   else k * 10 + j)
                         for j in range(k % 4 + 1)})
    tbl = pa.table({"m": pa.array(rows, pa.map_(pa.string(),
                                                pa.int64()))})
    path = str(tmp_path / "m.parquet")
    pq.write_table(tbl, path, row_group_size=400, **opts)
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    kp = next(p for p in reps if p.endswith(".key"))
    vp = next(p for p in reps if p.endswith(".value"))
    assert reps[kp] == [1, 2, 0] and reps[vp] == [1, 2, 1]
    got = []
    for rg in fmd[4]:
        c = _cmds_by_path(rg)
        got.extend(read_map_column_pages(data, c[kp], c[vp],
                                         reps[kp], reps[vp])[0])
    ref = [None if r is None else dict(r)
           for r in pq.read_table(path)["m"].to_pylist()]
    assert got == ref == rows


@pytest.mark.parametrize(
    "opts",
    [
        dict(use_dictionary=False, compression="NONE",
             data_page_size=512),
        dict(use_dictionary=True, compression="SNAPPY",
             data_page_size=1024),
    ],
    ids=["v1-plain", "v1-dict-snappy"],
)
def test_list_struct_pages_differential(tmp_path, opts):
    """Hand-decoded list<struct<a int64, s string>> == pyarrow's
    read-back: two independent leaf page streams slot-zipped, with
    struct-null (def 2) vs field-null (def 3) disambiguation."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        read_list_struct_column_pages,
    )

    rows = []
    for k in range(1, 1000):
        if k % 13 == 0:
            rows.append(None)
        elif k % 9 == 0:
            rows.append([])
        else:
            rows.append([
                None if (k + j) % 6 == 0
                else {"a": None if (k + j) % 5 == 0 else k * 10 + j,
                      "s": None if (k + j) % 4 == 0 else f"s{k}_{j}"}
                for j in range(k % 4 + 1)
            ])
    typ = pa.list_(pa.struct([("a", pa.int64()), ("s", pa.string())]))
    tbl = pa.table({"ls": pa.array(rows, typ)})
    path = str(tmp_path / "ls.parquet")
    pq.write_table(tbl, path, row_group_size=300, **opts)
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    ap = next(p for p in reps if p.endswith(".a"))
    sp = next(p for p in reps if p.endswith(".s"))
    got = []
    for rg in fmd[4]:
        c = _cmds_by_path(rg)
        got.extend(read_list_struct_column_pages(
            data, [("a", c[ap], reps[ap]), ("s", c[sp], reps[sp])]
        )[0])
    assert got == pq.read_table(path)["ls"].to_pylist() == rows


@pytest.mark.parametrize(
    "opts",
    [
        dict(use_dictionary=False, compression="NONE",
             data_page_size=512),
        dict(use_dictionary=True, compression="SNAPPY",
             data_page_size=1024),
        dict(use_dictionary=False, compression="ZSTD",
             data_page_size=1024, data_page_version="2.0"),
    ],
    ids=["v1-plain", "v1-dict-snappy", "v2-zstd"],
)
def test_nested_list_of_lists_differential(tmp_path, opts):
    """Hand-decoded list<list<int64>> (TWO repetition levels, the
    general Dremel assembler) == pyarrow's read-back, including the
    five degenerate shapes that pin each definition level."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        max_levels,
        read_nested_list_column_pages,
    )

    rows = []
    for k in range(1, 900):
        m = k % 17
        if m == 0:
            rows.append(None)
        elif m == 1:
            rows.append([])
        elif m == 2:
            rows.append([None])
        elif m == 3:
            rows.append([[]])
        elif m == 4:
            rows.append([[None]])
        else:
            rows.append([
                None if (k + i) % 7 == 0
                else ([] if (k + i) % 5 == 0
                      else [None if (k + i + j) % 6 == 0
                            else k * 100 + i * 10 + j
                            for j in range(k % 3 + 1)])
                for i in range(k % 4 + 1)
            ])
    tbl = pa.table({"ll": pa.array(rows,
                                   pa.list_(pa.list_(pa.int64())))})
    path = str(tmp_path / "ll.parquet")
    pq.write_table(tbl, path, row_group_size=250, **opts)
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    (_, chain), = _leaf_repetitions(fmd[2]).items()
    assert max_levels(chain) == (5, 2)
    got = []
    for rg in fmd[4]:
        got.extend(read_nested_list_column_pages(data, rg[1][0][3],
                                                 chain)[0])
    assert got == pq.read_table(path)["ll"].to_pylist() == rows


def test_spark_written_map_and_struct_nested_map(spark, tmp_path):
    """End-to-end on Spark's writer: a top-level map AND a map nested
    inside an optional struct (the Delta checkpoint partitionValues
    shape, A=2 — two optional ancestors above the repeated node)."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        read_map_column_pages,
    )

    df = spark.range(1, 2500).selectExpr(
        """
        CASE WHEN id % 11 = 0 THEN CAST(NULL AS map<string,bigint>)
             WHEN id % 7 = 0 THEN CAST(map() AS map<string,bigint>)
             ELSE map_from_arrays(
               transform(slice(array(0,1,2,3),1,CAST(id % 4 AS INT)+1),
                         j -> concat('k', j)),
               transform(slice(array(0,1,2,3),1,CAST(id % 4 AS INT)+1),
                         j -> CASE WHEN (id+j) % 5 = 0
                                   THEN CAST(NULL AS BIGINT)
                                   ELSE id*10+j END))
        END AS m
        """,
        """
        CASE WHEN id % 13 = 0
             THEN CAST(NULL AS struct<pv: map<string,string>, sz: bigint>)
             ELSE named_struct('pv',
               CASE WHEN id % 9 = 0 THEN CAST(NULL AS map<string,string>)
                    WHEN id % 8 = 0 THEN CAST(map() AS map<string,string>)
                    ELSE map('region', concat('r', id % 3),
                             'day', concat('d', id % 30)) END,
               'sz', id * 7)
        END AS add_like
        """,
    )
    root = str(tmp_path / "spark_maps")
    df.coalesce(1).write.option("parquet.page.size", 2048).parquet(root)
    import glob

    path = glob.glob(root + "/*.parquet")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])

    kp = "m.key_value.key"
    vp = "m.key_value.value"
    assert reps[kp] == [1, 2, 0] and reps[vp] == [1, 2, 1]
    got = []
    for rg in fmd[4]:
        c = _cmds_by_path(rg)
        got.extend(read_map_column_pages(data, c[kp], c[vp],
                                         reps[kp], reps[vp])[0])
    exp = [None if r.m is None else dict(r.m)
           for r in df.select("m").collect()]
    assert got == exp

    kp2 = "add_like.pv.key_value.key"
    vp2 = "add_like.pv.key_value.value"
    assert reps[kp2] == [1, 1, 2, 0] and reps[vp2] == [1, 1, 2, 1]
    got2 = []
    for rg in fmd[4]:
        c = _cmds_by_path(rg)
        got2.extend(read_map_column_pages(data, c[kp2], c[vp2],
                                          reps[kp2], reps[vp2])[0])
    exp2 = []
    for r in df.select("add_like").collect():
        a = r.add_like
        # struct-null and map-null both surface as None per-leaf
        exp2.append(None if a is None or a.pv is None else dict(a.pv))
    assert got2 == exp2


def test_spark_written_list_struct_decodes_by_hand(spark, tmp_path):
    """End-to-end list<struct> on Spark's writer (parquet-mr
    col.list.element.field naming, snappy, dictionary fallback)."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        read_list_struct_column_pages,
    )

    df = spark.range(1, 2000).selectExpr(
        """
        CASE WHEN id % 13 = 0
             THEN CAST(NULL AS array<struct<a: bigint, s: string>>)
             ELSE transform(slice(array(0,1,2,3),1,CAST(id % 4 AS INT)),
               j -> CASE WHEN (id+j) % 6 = 0
                         THEN CAST(NULL AS struct<a: bigint, s: string>)
                    ELSE named_struct(
                      'a', CASE WHEN (id+j)%5=0 THEN CAST(NULL AS BIGINT)
                                ELSE id*10+j END,
                      's', CASE WHEN (id+j)%4=0 THEN CAST(NULL AS STRING)
                                ELSE concat('s', id, '_', j) END) END)
        END AS ls
        """
    )
    root = str(tmp_path / "spark_ls")
    df.coalesce(1).write.option("parquet.page.size", 2048).parquet(root)
    import glob

    path = glob.glob(root + "/*.parquet")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    ap = "ls.list.element.a"
    sp = "ls.list.element.s"
    assert reps[ap] == [1, 2, 1, 1] == reps[sp]
    got = []
    for rg in fmd[4]:
        c = _cmds_by_path(rg)
        got.extend(read_list_struct_column_pages(
            data, [("a", c[ap], reps[ap]), ("s", c[sp], reps[sp])]
        )[0])
    exp = []
    for r in df.select("ls").collect():
        if r.ls is None:
            exp.append(None)
        else:
            exp.append([None if e is None else {"a": e.a, "s": e.s}
                        for e in r.ls])
    assert got == exp


def test_map_reader_rejects_structural_mismatch(tmp_path):
    """The map zipper's structural validation is real: feeding it two
    leaves with different entry structure raises instead of silently
    mispairing keys and values."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        read_map_column_pages,
    )

    a = pa.table({"m": pa.array(
        [{"x": 1}, {"y": 2, "z": 3}], pa.map_(pa.string(), pa.int64())
    )})
    path = str(tmp_path / "mm.parquet")
    pq.write_table(a, path, use_dictionary=False, compression="NONE")
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    kp = next(p for p in reps if p.endswith(".key"))
    vp = next(p for p in reps if p.endswith(".value"))
    c = _cmds_by_path(fmd[4][0])
    # swapped chains: key leaf read with the value chain claims an
    # OPTIONAL leaf where the stream says REQUIRED -> loud
    with pytest.raises((ValueError, NotImplementedError)):
        read_map_column_pages(data, c[kp], c[vp], reps[vp], reps[vp])


@pytest.mark.parametrize(
    "opts",
    [
        dict(compression="NONE", data_page_size=2048),
        dict(compression="ZSTD", data_page_size=4096),
        dict(compression="ZSTD", data_page_size=4096,
             data_page_version="2.0"),
    ],
    ids=["v1-plain", "v1-zstd", "v2-zstd"],
)
def test_byte_stream_split_differential(tmp_path, opts):
    """BYTE_STREAM_SPLIT (enc 9) double + float pages == pyarrow's
    read-back, v1 and v2 pages, with nulls (the def-level count sizes
    the n x K transposed blob)."""
    from spark_hive_spark.sources.parquet_meta import (
        read_leaf_pages_with_levels,
    )

    rows_d = [None if i % 53 == 0 else i * 1.25 for i in range(6000)]
    rows_f = [None if i % 37 == 0 else float(i % 997) * 0.5
              for i in range(6000)]
    tbl = pa.table({"d": pa.array(rows_d, pa.float64()),
                    "f": pa.array(rows_f, pa.float32())})
    path = str(tmp_path / "bss.parquet")
    pq.write_table(tbl, path, use_dictionary=False,
                   use_byte_stream_split=["d", "f"],
                   row_group_size=1700, **opts)
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    got_d, got_f = [], []
    for rg in fmd[4]:
        c = _cmds_by_path(rg)
        assert 9 in c["d"][2] and 9 in c["f"][2]
        got_d.extend(read_leaf_pages_with_levels(data, c["d"], 1)[0])
        got_f.extend(read_leaf_pages_with_levels(data, c["f"], 1)[0])
    ref = pq.read_table(path)
    assert got_d == ref["d"].to_pylist() == rows_d
    assert got_f == ref["f"].to_pylist() == rows_f


def test_map_with_int_keys(tmp_path):
    """The map reader is key-type generic: map<int64,string> (the
    required key rides the fixed-width leaf path, values the
    byte-array path) == pyarrow's read-back."""
    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        read_map_column_pages,
    )

    rows = [
        None if k % 9 == 0
        else {k * 10 + j: (None if (k + j) % 4 == 0 else f"v{k}_{j}")
              for j in range(k % 3 + 1)}
        for k in range(1, 500)
    ]
    tbl = pa.table({"m": pa.array(
        [None if r is None else list(r.items()) for r in rows],
        pa.map_(pa.int64(), pa.string()),
    )})
    path = str(tmp_path / "mi.parquet")
    pq.write_table(tbl, path, row_group_size=200,
                   use_dictionary=False, compression="NONE")
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    kp = next(p for p in reps if p.endswith(".key"))
    vp = next(p for p in reps if p.endswith(".value"))
    got = []
    for rg in fmd[4]:
        c = _cmds_by_path(rg)
        got.extend(read_map_column_pages(data, c[kp], c[vp],
                                         reps[kp], reps[vp])[0])
    assert got == [None if r is None else dict(r) for r in rows]


def test_byte_stream_split_integer_columns(tmp_path):
    """Parquet 2.11 extends BYTE_STREAM_SPLIT beyond floats to
    INT32/INT64 — the decoder's transpose is width-generic, pinned
    here against pyarrow on both integer widths with nulls."""
    from spark_hive_spark.sources.parquet_meta import (
        read_leaf_pages_with_levels,
    )

    rows = [None if i % 31 == 0 else i * 7 - 1000 for i in range(4000)]
    tbl = pa.table({
        "x": pa.array(rows, pa.int64()),
        "y": pa.array([i * 3 for i in range(4000)], pa.int32()),
    })
    path = str(tmp_path / "bss_int.parquet")
    pq.write_table(tbl, path, use_dictionary=False, compression="NONE",
                   use_byte_stream_split=["x", "y"],
                   data_page_size=2048, row_group_size=1300)
    with open(path, "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    gx, gy = [], []
    for rg in fmd[4]:
        c = _cmds_by_path(rg)
        assert 9 in c["x"][2] and 9 in c["y"][2]
        gx.extend(read_leaf_pages_with_levels(data, c["x"], 1)[0])
        gy.extend(read_leaf_pages_with_levels(data, c["y"], 1)[0])
    assert gx == rows
    assert gy == [i * 3 for i in range(4000)]


def test_struct_wrapped_list_single_rep(spark, tmp_path):
    """struct<l: array<bigint>, z> — a LIST nested inside an optional
    struct (chain [1,1,2,1], A=2): the generalized single-rep Dremel
    path must place the extra ancestor def level correctly (row None
    for struct-null OR list-null, [] only at d==A)."""
    import glob

    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        read_list_column_pages,
    )

    df = spark.range(1, 800).selectExpr(
        """
        CASE WHEN id % 9 = 0
             THEN CAST(NULL AS struct<l: array<bigint>, z: bigint>)
             ELSE named_struct('l',
               CASE WHEN id % 7 = 0 THEN CAST(NULL AS array<bigint>)
                    ELSE transform(slice(array(1,2,3),1,CAST(id%4 AS INT)),
                         i -> CASE WHEN (id+i)%5=0
                                   THEN CAST(NULL AS BIGINT)
                                   ELSE id*10+i END) END,
               'z', id) END AS s
        """
    )
    root = str(tmp_path / "sl")
    df.coalesce(1).write.option("parquet.page.size", 1024).parquet(root)
    with open(glob.glob(root + "/*.parquet")[0], "rb") as fh:
        data = fh.read()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    lp = next(p for p in reps if ".l." in p)
    assert reps[lp] == [1, 1, 2, 1]
    got = []
    for rg in fmd[4]:
        c = _cmds_by_path(rg)
        got.extend(read_list_column_pages(data, c[lp], reps[lp])[0])
    exp = []
    for r in df.collect():
        # per-leaf view: struct-null and list-null both surface None
        if r.s is None or r.s.l is None:
            exp.append(None)
        else:
            exp.append(list(r.s.l))
    assert got == exp
