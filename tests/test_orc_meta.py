"""Differential tests for the hand-built ORC tail reader
(sources/orc_meta.py): decoded stripe layout and statistics must
match pyarrow's ORC reader and the source data across every
compression codec the chunk layer supports (NONE / ZLIB / SNAPPY /
ZSTD — the last two through this repo's hand-built codecs)."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.orc as po
import pytest

from spark_hive_spark.sources.orc_meta import (
    decode_message,
    read_orc_tail,
)

N = 20000


def _fixture_table() -> pa.Table:
    keys = list(range(1, N + 1))
    return pa.table(
        {
            "k": pa.array(keys, pa.int64()),
            "d": pa.array(
                [
                    dt.date(1992, 1, 1) + dt.timedelta(days=(j * 37) % 2500)
                    for j in keys
                ],
                pa.date32(),
            ),
            "x": pa.array([j * 0.5 for j in keys], pa.float64()),
        }
    ).sort_by([("d", "ascending"), ("k", "ascending")])


@pytest.mark.parametrize(
    "compression", ["uncompressed", "zlib", "snappy", "zstd", "lz4"]
)
def test_orc_tail_matches_pyarrow_and_data(tmp_path, compression):
    path = str(tmp_path / f"t_{compression}.orc")
    po.write_table(
        _fixture_table(), path,
        stripe_size=32 * 1024, compression=compression,
    )
    with open(path, "rb") as fh:
        tail = read_orc_tail(fh.read())
    ref = po.ORCFile(path)
    assert tail["num_rows"] == ref.nrows == N
    assert len(tail["stripes"]) == ref.nstripes
    assert sum(s["num_rows"] for s in tail["stripes"]) == N
    # file-level integer stats equal true aggregates (zigzag decode)
    ints = tail["file_stats"][1]["int"]
    assert (ints["min"], ints["max"]) == (1, N)
    assert ints["sum"] == N * (N + 1) // 2
    dates = tail["file_stats"][2]["date"]
    epoch = dt.date(1970, 1, 1)
    # (j*37)%2500 hits 0 at j=2500, so the true min is the base date
    assert epoch + dt.timedelta(days=dates["min"]) == dt.date(1992, 1, 1)
    # per-stripe stats partition the file stats
    if tail["stripe_stats"]:
        assert len(tail["stripe_stats"]) == ref.nstripes
        assert sum(
            sc[1]["int"]["sum"] for sc in tail["stripe_stats"]
        ) == ints["sum"]
        assert min(
            sc[2]["date"]["min"] for sc in tail["stripe_stats"]
        ) == dates["min"]
    # multi-stripe layouts occur at this size for these codecs (zstd
    # compresses the buffer under the flush threshold and stays one
    # stripe — stripe split is the writer's call, not the reader's),
    # so the per-stripe decode path really runs
    if compression in ("uncompressed", "zlib", "snappy"):
        assert ref.nstripes >= 2


def test_lz4_block_differential_vs_reference():
    """The hand-built LZ4 block codec must interoperate with
    pyarrow's bundled reference codec in BOTH directions, across
    compressible, random, overlap-heavy, and long-run corpora — the
    same differential discipline as the zstd CLI tests."""
    import os
    import random

    from spark_hive_spark.operators.lz4 import (
        lz4_block_compress,
        lz4_block_decompress,
    )

    ref = pa.Codec("lz4_raw")
    random.seed(7)
    corpora = [
        b"a",
        b"abc" * 1000,
        bytes(range(256)) * 50,
        b"the quick brown fox jumps over the lazy dog " * 200,
        os.urandom(10000),
        bytes(random.choice(b"ab") for _ in range(5000)),
        b"A" * 100000,  # 15-saturated lengths + maximal overlap
    ]
    for data in corpora:
        assert lz4_block_decompress(
            ref.compress(data, asbytes=True), len(data)
        ) == data
        ours = lz4_block_compress(data)
        assert bytes(ref.decompress(ours, len(data))) == data
        assert lz4_block_decompress(ours, len(data)) == data
    # malformed inputs fail loudly
    with pytest.raises(ValueError):
        lz4_block_decompress(b"")
    with pytest.raises(ValueError):  # offset 0
        lz4_block_decompress(b"\x14AAAA\x00\x00")
    with pytest.raises(ValueError):  # declared-length mismatch
        lz4_block_decompress(lz4_block_compress(b"xyz"), 99)


@pytest.mark.parametrize(
    "compression", ["uncompressed", "zlib", "snappy", "zstd", "lz4"]
)
def test_orc_int64_data_read_differential(tmp_path, compression):
    """`read_orc_int64_column` (protobuf tail + PRESENT bitmap +
    RLEv2 with all four sub-encodings) must reproduce pyarrow's read
    across value distributions chosen to force each sub-encoding:
    constants (SHORT_REPEAT / fixed DELTA), monotone runs (DELTA),
    bounded noise (DIRECT), and huge outliers over small bodies
    (PATCHED_BASE, both signs), plus nullable rows — under every
    chunk codec."""
    import random

    from spark_hive_spark.sources.orc_meta import read_orc_int64_column

    random.seed(3)
    cases = {
        "sorted": list(range(1, 5001)),
        "constant": [42] * 3000,
        "tiny_const": [7] * 5,
        "direct": [random.randint(-1000, 1000) for _ in range(4000)],
        "patched": [
            random.randint(0, 50) if i % 97 else 10**12
            for i in range(4000)
        ],
        "patched_neg": [
            random.randint(-50, -1) if i % 89 else -(10**13)
            for i in range(3000)
        ],
        "big_jumps": [
            random.randint(-(2**50), 2**50) for _ in range(2000)
        ],
        "nullable": [None if i % 7 == 0 else i * 3 for i in range(6000)],
    }
    for name, vals in cases.items():
        path = str(tmp_path / f"{name}.orc")
        po.write_table(
            pa.table({"v": pa.array(vals, pa.int64())}),
            path, compression=compression,
        )
        with open(path, "rb") as fh:
            got, _ = read_orc_int64_column(fh.read())
        assert got == po.ORCFile(path).read()["v"].to_pylist() == vals, (
            compression, name,
        )


@pytest.mark.parametrize(
    "compression", ["uncompressed", "zlib", "snappy", "zstd", "lz4"]
)
def test_orc_string_column_read_differential(tmp_path, compression):
    """`read_orc_string_column` (DIRECT_V2: unsigned-RLEv2 LENGTH
    stream + concatenated UTF-8 DATA) must reproduce pyarrow's read —
    low/high cardinality, multi-byte UTF-8, empties, and nulls."""
    from spark_hive_spark.sources.orc_meta import read_orc_string_column

    cases = {
        "low_card": [f"cat{i % 7}" for i in range(3000)],
        "unique": [f"unique-{i:06d}" for i in range(3000)],
        "unicode": [f"naïve—{i}🌍" for i in range(500)],
        "empty_mix": [
            "" if i % 5 == 0 else "x" * (i % 40) for i in range(2000)
        ],
        "nullable": [None if i % 7 == 0 else f"v{i}" for i in range(4000)],
    }
    for name, vals in cases.items():
        path = str(tmp_path / f"{name}.orc")
        po.write_table(
            pa.table({"s": pa.array(vals, pa.string())}),
            path, compression=compression,
        )
        with open(path, "rb") as fh:
            got, _ = read_orc_string_column(fh.read())
        assert got == po.ORCFile(path).read()["s"].to_pylist() == vals, (
            compression, name,
        )


def test_spark_written_orc_decodes_by_hand(spark, tmp_path):
    """An ORC file written by SPARK's JVM writer (zstd chunks,
    DICTIONARY_V2 strings — the encoding pyarrow never emits) must
    decode through the hand-built stack: int64 DIRECT_V2, nullable
    int64 with PRESENT, and dictionary-indexed strings."""
    import glob

    from spark_hive_spark.sources.orc_meta import (
        read_orc_int64_column,
        read_orc_string_column,
    )

    out = str(tmp_path / "sorc")
    spark.range(0, 8000).selectExpr(
        "id AS k",
        "concat('cat', id % 7) AS s",
        "nullif(id % 500, 13) AS nv",
    ).coalesce(1).write.orc(out)
    path = glob.glob(out + "/*.orc")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    ks, _ = read_orc_int64_column(data, column=1)
    strs, _ = read_orc_string_column(data, column=2)
    nvs, _ = read_orc_int64_column(data, column=3)
    assert ks == list(range(8000))
    assert strs == [f"cat{i % 7}" for i in range(8000)]
    assert nvs == [
        None if (i % 500) == 13 else i % 500 for i in range(8000)
    ]


def test_orc_rlev2_and_byte_rle_rejections():
    from spark_hive_spark.sources.orc_meta import (
        decode_byte_rle,
        decode_present,
        decode_rlev2,
    )

    with pytest.raises(ValueError):
        decode_rlev2(b"\x0a")  # SHORT_REPEAT missing value bytes
    with pytest.raises(ValueError):
        decode_rlev2(b"\x5f\xff")  # DIRECT run overruns the stream
    with pytest.raises(ValueError):
        decode_byte_rle(b"\x05")  # run missing its repeated byte
    with pytest.raises(ValueError):
        decode_present(b"\x80", 9)  # bitmap shorter than row count


def test_rlev2_resumable_corruption_vs_truncation():
    """ADVICE r17: resumable mode resumes ONLY on buffer-end
    truncation (TruncatedRun); in-buffer corruption — here a
    PATCHED_BASE patch gap past the run length on a COMPLETE buffer
    — raises straight through instead of being mistaken for 'needs
    more chunks'."""
    from spark_hive_spark.sources.orc_meta import (
        TruncatedRun,
        decode_rlev2,
    )

    # PATCHED_BASE: 2 one-bit values, base 0, pll=2 patch entries at
    # 1-bit gap + 1-bit patch; both entries (gap=1, patch=1) walk the
    # cursor to idx 2 >= length 2 — corrupt on a complete buffer
    corrupt = bytes([0x80, 0x01, 0x00, 0x02, 0x00, 0xC0, 0xF0])
    with pytest.raises(ValueError, match="patch gap overruns"):
        decode_rlev2(corrupt, resumable=True)

    # the same run cut before its patch bytes IS truncation:
    # resumable returns cleanly at the run start, non-resumable is
    # loud with the truncation class
    truncated = corrupt[:-1]
    out, consumed = decode_rlev2(truncated, resumable=True)
    assert (out, consumed) == ([], 0)
    with pytest.raises(TruncatedRun):
        decode_rlev2(truncated)


def test_orc_tail_rejections(tmp_path):
    path = str(tmp_path / "t.orc")
    po.write_table(_fixture_table(), path, compression="snappy")
    data = open(path, "rb").read()
    with pytest.raises(ValueError, match="magic"):
        read_orc_tail(b"XXX" + data[3:])
    with pytest.raises(ValueError):
        # truncated varint
        decode_message(b"\x08\xff")
    with pytest.raises(ValueError):
        # wiretype 3 (groups) unsupported
        decode_message(b"\x0b")


def test_protobuf_walker_wiretypes():
    # field 1 varint 150; field 2 bytes "abc"; field 3 fixed64 -1;
    # field 4 fixed32 7 (hand-assembled per the encoding guide)
    buf = (
        b"\x08\x96\x01"
        + b"\x12\x03abc"
        + b"\x19" + (2**64 - 1).to_bytes(8, "little")
        + b"\x25" + (7).to_bytes(4, "little")
    )
    msg = decode_message(buf)
    assert msg[1] == [150]
    assert msg[2] == [b"abc"]
    assert msg[3] == [-1]
    assert msg[4] == [7]


def test_stripe_ranges_without_metadata_section():
    """ADVICE r10: a multi-stripe tail WITHOUT StripeStatistics (the
    Metadata section is optional per the spec) must plan EVERY
    stripe — file-level stats can't split them, so nothing is
    prunable; collapsing to one pseudo-stripe would silently drop
    stripes 1..n-1."""
    from spark_hive_spark.sources.orc_meta import stripe_date_ranges

    file_range = {"min": 9000, "max": 9600}
    tail = {
        "stripes": [{"num_rows": 100}] * 3,
        "stripe_stats": [],
        "file_stats": {2: {"date": file_range}},
        "num_rows": 300,
    }
    ranges = stripe_date_ranges(tail, date_col=2)
    assert ranges == [file_range] * 3
    # every stripe intersects any window the file intersects
    selected = [
        i for i, d in enumerate(ranges)
        if not (d["max"] < 9100 or d["min"] > 9200)
    ]
    assert selected == [0, 1, 2]


def test_stripe_ranges_with_metadata_section_prune():
    from spark_hive_spark.sources.orc_meta import stripe_date_ranges

    tail = {
        "stripes": [{"num_rows": 100}] * 3,
        "stripe_stats": [
            {2: {"date": {"min": 0, "max": 10}}},
            {2: {"date": {"min": 11, "max": 20}}},
            {2: {"date": {"min": 21, "max": 30}}},
        ],
        "file_stats": {2: {"date": {"min": 0, "max": 30}}},
        "num_rows": 300,
    }
    ranges = stripe_date_ranges(tail, date_col=2)
    selected = [
        i for i, d in enumerate(ranges)
        if not (d["max"] < 12 or d["min"] > 18)
    ]
    assert selected == [1]


def test_orc_timestamp_double_differential(spark, tmp_path):
    """TIMESTAMP (2015-epoch signed seconds + trailing-zeros nanos)
    and DOUBLE (IEEE LE + PRESENT) against Spark's own ORC writer,
    mixing ms-, us-, and whole-second fractions plus nulls."""
    import datetime as dtm
    import glob

    from spark_hive_spark.sources.orc_meta import (
        read_orc_double_column,
        read_orc_timestamp_column,
    )

    df = spark.range(1, 6000).selectExpr(
        "CASE WHEN id % 89 = 0 THEN CAST(NULL AS TIMESTAMP) ELSE "
        "timestamp_micros(CAST(788918400000000 + id * 3607000000"
        " + (id % 1000) * 1000 + id % 97 AS BIGINT)) END AS ts",
        "CASE WHEN id % 53 = 0 THEN CAST(NULL AS DOUBLE)"
        " ELSE CAST(id AS DOUBLE) * 1.25 END AS d",
    )
    root = str(tmp_path / "tsd")
    df.coalesce(1).write.orc(root)
    path = glob.glob(root + "/*.orc")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    ts, _ = read_orc_timestamp_column(data, 1)
    dd, _ = read_orc_double_column(data, 2)
    epoch = dtm.datetime(1970, 1, 1)
    exp = df.collect()
    assert ts == [
        None if r.ts is None
        else int((r.ts - epoch) / dtm.timedelta(microseconds=1))
        for r in exp
    ]
    assert dd == [r.d for r in exp]


def test_orc_timestamp_multi_stripe_pyarrow(tmp_path):
    """Multi-stripe timestamp decode against pyarrow's ORC writer
    (small stripes force >1), snappy chunks."""
    import datetime as dtm

    import pyarrow as pa
    from pyarrow import orc as po

    from spark_hive_spark.sources.orc_meta import (
        read_orc_tail,
        read_orc_timestamp_column,
    )

    base = dtm.datetime(1995, 6, 1)
    n = 40000
    ts = [
        None if i % 37 == 0
        else base + dtm.timedelta(seconds=i * 61,
                                  microseconds=(i % 1000) * 500)
        for i in range(n)
    ]
    # an incompressible companion column forces real stripe flushes
    # (timestamps alone RLE so well the writer never hits 64 KiB)
    noise = [((i * 2654435761) % 2**31) * 1e-7 for i in range(n)]
    path = str(tmp_path / "multi.orc")
    po.write_table(
        pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                  "x": pa.array(noise, pa.float64())}),
        path, stripe_size=64 * 1024, compression="snappy",
    )
    with open(path, "rb") as fh:
        data = fh.read()
    tail = read_orc_tail(data)
    assert len(tail["stripes"]) > 1
    got, n_stripes = read_orc_timestamp_column(data, 1)
    assert n_stripes == len(tail["stripes"])
    epoch = dtm.datetime(1970, 1, 1)
    assert got == [
        None if t is None
        else int((t - epoch) / dtm.timedelta(microseconds=1))
        for t in ts
    ]


def test_orc_date_column_differential(spark, tmp_path):
    """DATE columns (signed RLEv2 days since epoch + PRESENT)
    against Spark's ORC writer."""
    import datetime as dtm
    import glob

    from spark_hive_spark.sources.orc_meta import read_orc_date_column

    df = spark.range(1, 4000).selectExpr(
        "CASE WHEN id % 61 = 0 THEN CAST(NULL AS DATE) "
        "ELSE date_add(DATE '1992-01-01', CAST(id % 2500 AS INT)) "
        "END AS d"
    )
    root = str(tmp_path / "dates")
    df.coalesce(1).write.orc(root)
    path = glob.glob(root + "/*.orc")[0]
    with open(path, "rb") as fh:
        data = fh.read()
    got, _ = read_orc_date_column(data, 1)
    epoch = dtm.date(1970, 1, 1)
    assert got == [
        None if r.d is None else (r.d - epoch).days for r in df.collect()
    ]


def test_orc_timestamp_pre1970_fractional(spark, tmp_path):
    """Pre-1970 fractional timestamps: the ORC writer truncates
    millis/1000 toward zero, so without the negative-seconds
    adjustment every pre-epoch value with nonzero nanos decodes one
    second late (r13 ADVICE). Ground truth is Spark's own reader."""
    import datetime as dtm
    import glob

    from spark_hive_spark.sources.orc_meta import (
        read_orc_timestamp_column,
    )

    df = spark.createDataFrame(
        [
            (1, dtm.datetime(1969, 12, 31, 23, 59, 58, 123456)),
            (2, dtm.datetime(1950, 6, 1, 12, 0, 0, 250000)),
            (3, dtm.datetime(1969, 12, 31, 23, 59, 59, 0)),
            (4, dtm.datetime(1899, 3, 4, 5, 6, 7, 890123)),
            (5, dtm.datetime(1970, 1, 1, 0, 0, 0, 750000)),
            (6, None),
        ],
        "id int, ts timestamp",
    )
    root = str(tmp_path / "pre1970")
    df.coalesce(1).write.orc(root)
    with open(glob.glob(root + "/*.orc")[0], "rb") as fh:
        data = fh.read()
    got, _ = read_orc_timestamp_column(data, 2)
    epoch = dtm.datetime(1970, 1, 1)
    # truth = what Spark itself reads back (the writer's [-1,0)s
    # truncation is not recoverable; we must agree with the reader)
    exp = [
        None if r.ts is None
        else int((r.ts - epoch) / dtm.timedelta(microseconds=1))
        for r in spark.read.orc(root).orderBy("id").collect()
    ]
    assert got == exp
    assert exp[0] == -1_876_544  # genuinely negative + fractional
    assert exp[1] == -618_062_399_750_000


def test_orc_ts_base_writer_timezone():
    """The 2015-01-01 base must be computed in the stripe's writer
    timezone (empirically: a file written under a New-York JVM shifts
    every decoded value by the zone offset otherwise); unknown zone
    names stay a loud seam."""
    import pytest as _pytest

    from spark_hive_spark.sources.orc_meta import (
        _ORC_TS_BASE,
        _orc_ts_base,
    )

    for name in (None, "UTC", "GMT", "Etc/UTC", "Zulu"):
        assert _orc_ts_base(name) == _ORC_TS_BASE
    # 2015-01-01 00:00 EST = 05:00 UTC
    assert _orc_ts_base("America/New_York") == _ORC_TS_BASE + 5 * 3600
    # 2015-01-01 00:00 JST = 2014-12-31 15:00 UTC
    assert _orc_ts_base("Asia/Tokyo") == _ORC_TS_BASE - 9 * 3600
    with _pytest.raises(NotImplementedError):
        _orc_ts_base("Not/A_Zone")


def test_orc_nested_differential_spark(spark, tmp_path):
    """ORC list/map/struct hand decode == Spark's own read-back
    across all four supported chunk codecs: LENGTH-stream lists with
    signed-RLEv2 and DICTIONARY_V2 string elements, maps with
    non-null keys + nullable values, struct child-count semantics."""
    from spark_hive_spark.sources.orc_meta import (
        _orc_file_tail,
        orc_type_tree,
        read_orc_list_column,
        read_orc_map_column,
        read_orc_struct_column,
    )

    df = spark.range(1, 2000).selectExpr(
        "CASE WHEN id % 11 = 0 THEN CAST(NULL AS array<bigint>)"
        " ELSE transform(slice(array(1,2,3,4),1,CAST(id % 5 AS INT)),"
        " i -> CASE WHEN (id+i)%7=0 THEN CAST(NULL AS BIGINT)"
        " ELSE id*10+i END) END AS vals",
        "CASE WHEN id % 9 = 0 THEN CAST(NULL AS array<string>)"
        " ELSE transform(slice(array(1,2,3),1,CAST(id % 4 AS INT)),"
        " i -> CASE WHEN (id+i)%6=0 THEN CAST(NULL AS STRING)"
        " ELSE concat('w', (id+i) % 13) END) END AS tags",
        "CASE WHEN id % 13 = 0 THEN CAST(NULL AS map<string,bigint>)"
        " WHEN id % 7 = 0 THEN CAST(map() AS map<string,bigint>)"
        " ELSE map_from_arrays("
        " transform(slice(array(0,1,2),1,CAST(id % 3 AS INT)+1),"
        " j -> concat('k', j)),"
        " transform(slice(array(0,1,2),1,CAST(id % 3 AS INT)+1),"
        " j -> CASE WHEN (id+j)%5=0 THEN CAST(NULL AS BIGINT)"
        " ELSE id*10+j END)) END AS m",
        "CASE WHEN id % 8 = 0"
        " THEN CAST(NULL AS struct<k: bigint, s: string>)"
        " ELSE named_struct("
        " 'k', CASE WHEN id%5=0 THEN CAST(NULL AS BIGINT) ELSE id END,"
        " 's', CASE WHEN id%4=0 THEN CAST(NULL AS STRING)"
        " ELSE concat('x', id % 3) END) END AS st",
    )
    rows = df.collect()
    import glob

    for comp in ("zstd", "snappy", "zlib", "none"):
        out = str(tmp_path / f"nested_{comp}")
        df.coalesce(1).write.option("compression", comp).orc(out)
        with open(glob.glob(out + "/*.orc")[0], "rb") as fh:
            data = fh.read()
        footer, _ = _orc_file_tail(data)
        tree = orc_type_tree(footer)
        lists = [i for i, t_ in enumerate(tree) if t_["kind"] == "list"]
        vcol = next(c for c in lists
                    if tree[tree[c]["subtypes"][0]]["kind"] == "long")
        tcol = next(c for c in lists
                    if tree[tree[c]["subtypes"][0]]["kind"] == "string")
        mcol = next(i for i, t_ in enumerate(tree)
                    if t_["kind"] == "map")
        scol = next(i for i, t_ in enumerate(tree)
                    if t_["kind"] == "struct" and i > 0)
        assert read_orc_list_column(data, vcol)[0] == [
            None if r.vals is None else list(r.vals) for r in rows
        ]
        assert read_orc_list_column(data, tcol)[0] == [
            None if r.tags is None else list(r.tags) for r in rows
        ]
        assert read_orc_map_column(data, mcol)[0] == [
            None if r.m is None else dict(r.m) for r in rows
        ]
        assert read_orc_struct_column(data, scol)[0] == [
            None if r.st is None else {"k": r.st.k, "s": r.st.s}
            for r in rows
        ]


def test_orc_nested_multi_stripe_pyarrow(tmp_path):
    """Multi-stripe nested decode against pyarrow's ORC writer
    (DIRECT_V2 strings — the other element encoding — and stripe
    boundaries inside list runs)."""
    import pyarrow as pa
    from pyarrow import orc as po

    from spark_hive_spark.sources.orc_meta import (
        _orc_file_tail,
        orc_type_tree,
        read_orc_list_column,
        read_orc_tail,
    )

    n = 30000
    rows = [
        None if i % 37 == 0
        else [None if (i + j) % 5 == 0 else f"v{i}_{j}"
              for j in range(i % 4)]
        for i in range(n)
    ]
    noise = [((i * 2654435761) % 2**31) * 1e-7 for i in range(n)]
    path = str(tmp_path / "ml.orc")
    po.write_table(
        pa.table({"ls": pa.array(rows, pa.list_(pa.string())),
                  "x": pa.array(noise, pa.float64())}),
        path, stripe_size=64 * 1024, compression="snappy",
    )
    with open(path, "rb") as fh:
        data = fh.read()
    assert len(read_orc_tail(data)["stripes"]) > 1
    footer, _ = _orc_file_tail(data)
    tree = orc_type_tree(footer)
    lcol = next(i for i, t_ in enumerate(tree) if t_["kind"] == "list")
    got, n_stripes = read_orc_list_column(data, lcol)
    assert n_stripes > 1
    assert got == po.ORCFile(path).read()["ls"].to_pylist() == rows


def test_rlev2_patched_base_nonaligned_patch_width():
    """Regression (round 13, found by sf1 data): the PATCHED_BASE
    patch list packs at closestFixedBits(patchGapWidth + patchWidth)
    — 10 bits stays 10 bits — NOT the byte-aligned width family.
    Hand-crafted run: w=4, base=0, values [1,2,3,1] with a (gap=3,
    patch=1) entry in a pgw=8+pw=2 (10-bit) patch list restoring the
    fourth value to 17. The pre-fix 16-bit read turned the entry into
    gap 208 and crashed past the run length."""
    from spark_hive_spark.sources.orc_meta import decode_rlev2

    run = bytes([
        0x86, 0x03,        # PATCHED_BASE, w=4 (code 3), length 4
        0x01,              # bw=1, patch width code 1 (pw=2)
        0xE1,              # pgw=8, patch list length 1
        0x00,              # base = 0
        0x12, 0x31,        # 4 values @ 4 bits: 1,2,3,1
        0x03, 0x40,        # one 10-bit entry: gap 3, patch 1
    ])
    assert decode_rlev2(run, signed=False) == [1, 2, 3, 17]


def test_rlev2_patched_base_differential_vs_spark(spark, tmp_path):
    """The exact data shape that exposed the bug: large-magnitude
    int64 runs with a few outliers make Spark's writer emit
    PATCHED_BASE with 10-bit patch lists; hand decode must equal
    Spark's read-back."""
    import glob

    from spark_hive_spark.sources.orc_meta import read_orc_int64_column

    df = spark.range(1, 60000).selectExpr(
        # mostly a dense band, occasional huge outliers -> patches
        "CASE WHEN id % 509 = 0 THEN id * 100000 + 300000000"
        " ELSE 40000000 + id END AS v"
    )
    root = str(tmp_path / "pb")
    df.coalesce(1).write.option("compression", "zstd").orc(root)
    with open(glob.glob(root + "/*.orc")[0], "rb") as fh:
        data = fh.read()
    got, _ = read_orc_int64_column(data, 1)
    assert got == [r.v for r in df.collect()]


def test_orc_decimal_boolean_float_differential(spark, tmp_path):
    """Decimal (zigzag unbounded varints + RLEv2 scales, incl. a
    >64-bit-unscaled DECIMAL(28,4)), boolean (byte-RLE bitpacked
    DATA), and float32 hand decodes == Spark's own read-back."""
    import glob
    from decimal import Decimal

    from spark_hive_spark.sources.orc_meta import (
        _orc_file_tail,
        orc_type_tree,
        read_orc_boolean_column,
        read_orc_decimal_column,
        read_orc_float_column,
    )

    df = spark.range(1, 3000).selectExpr(
        "CASE WHEN id % 7 = 0 THEN CAST(NULL AS DECIMAL(12,2))"
        " ELSE CAST(id * 1.25 - 20 AS DECIMAL(12,2)) END AS dec",
        # > 64-bit unscaled territory
        "CAST(id AS DECIMAL(30,4)) * CAST(123456789012345.6789"
        " AS DECIMAL(30,4)) AS bigdec",
        "CASE WHEN id % 5 = 0 THEN CAST(NULL AS BOOLEAN)"
        " ELSE id % 3 = 0 END AS b",
        "CASE WHEN id % 9 = 0 THEN CAST(NULL AS FLOAT)"
        " ELSE CAST(id * 0.5 AS FLOAT) END AS f",
    )
    rows = df.collect()
    root = str(tmp_path / "decf")
    df.coalesce(1).write.option("compression", "zstd").orc(root)
    with open(glob.glob(root + "/*.orc")[0], "rb") as fh:
        data = fh.read()
    footer, _ = _orc_file_tail(data)
    tree = orc_type_tree(footer)
    decs = [i for i, t_ in enumerate(tree) if t_["kind"] == "decimal"]
    bcol = next(i for i, t_ in enumerate(tree)
                if t_["kind"] == "boolean")
    fcol = next(i for i, t_ in enumerate(tree) if t_["kind"] == "float")

    got, _n, scale = read_orc_decimal_column(data, decs[0])
    assert scale == 2
    assert got == [
        None if r.dec is None else int(r.dec.scaleb(2)) for r in rows
    ]
    got_big, _n, scale_big = read_orc_decimal_column(data, decs[1])
    exp_big = [int((r.bigdec).scaleb(scale_big)) for r in rows]
    assert got_big == exp_big
    assert max(got_big) > 2 ** 64  # decimal128 territory for real

    got_b, _n = read_orc_boolean_column(data, bcol)
    assert got_b == [r.b for r in rows]
    got_f, _n = read_orc_float_column(data, fcol)
    assert got_f == [r.f for r in rows]


def test_orc_writer_timezone_fixture():
    """A COMMITTED ORC file written under an America/New_York JVM
    (tests/data/orc_ny_writer_tz.orc — Spark can't switch JVM zones
    mid-session, so the fixture is pre-generated): the stripe footer
    records the writer zone and the reader must compute the 2015 base
    IN IT, or every wall-clock value shifts by the zone offset. The
    expected micros are the wall-clock-as-UTC images of the written
    timestamps (ORC TIMESTAMP semantics), pre-1970 fractional
    included."""
    import os

    from spark_hive_spark.sources.orc_meta import (
        _orc_file_tail,
        _stripe_streams,
        read_orc_timestamp_column,
    )

    path = os.path.join(os.path.dirname(__file__), "data",
                        "orc_ny_writer_tz.orc")
    with open(path, "rb") as fh:
        data = fh.read()
    footer, codec = _orc_file_tail(data)
    _s, _n, _e, wtz = _stripe_streams(data, codec, footer[3][0], 2)
    assert wtz == "America/New_York"
    got, _ = read_orc_timestamp_column(data, 2)
    assert got == [
        -1_876_544,              # 1969-12-31 23:59:58.123456
        981_173_106_789_012,     # 2001-02-03 04:05:06.789012
        -618_062_399_750_000,    # 1950-06-01 12:00:00.25
        1_786_786_200_000_000,   # 2026-08-15 09:30:00
        None,
    ]


def test_orc_timestamp_pre1970_cpp_writer(tmp_path):
    """The C++ ORC writer (pyarrow, Impala) encodes pre-epoch
    fractional timestamps differently from Java: the trunc-toward-
    zero NEGATIVE remainder is trailing-zero-encoded as a SIGNED
    value and stored two's-complement-wrapped in the nominally
    unsigned SECONDARY stream (-0.5s = secs 0 + (-5<<3)|7 = -33 =
    2^64-33 on the wire). Found by the round-13 code review; the
    reader must handle BOTH conventions."""
    import datetime as dtm
    import io

    import pyarrow as pa
    from pyarrow import orc as po

    from spark_hive_spark.sources.orc_meta import (
        read_orc_timestamp_column,
    )

    ts = [
        dtm.datetime(1969, 12, 31, 23, 59, 59, 500000),
        dtm.datetime(1969, 12, 31, 23, 59, 58, 123456),
        dtm.datetime(1950, 6, 1, 12, 0, 0, 250000),
        dtm.datetime(1969, 12, 31, 23, 59, 59, 0),
        dtm.datetime(2001, 2, 3, 4, 5, 6, 789012),
        None,
        dtm.datetime(1899, 3, 4, 5, 6, 7, 890123),
    ]
    epoch = dtm.datetime(1970, 1, 1)
    exp = [
        None if t is None
        else int((t - epoch) / dtm.timedelta(microseconds=1))
        for t in ts
    ]
    for comp in ("uncompressed", "snappy", "zlib"):
        buf = io.BytesIO()
        po.write_table(
            pa.table({"t": pa.array(ts, pa.timestamp("us"))}),
            buf, compression=comp,
        )
        got, _ = read_orc_timestamp_column(buf.getvalue(), 1)
        assert got == exp


def test_orc_deep_nested_differential(spark, tmp_path):
    """list<struct>, list<list<bigint>>, and map<string,struct>
    through the recursive ORC child decoder == Spark's read-back —
    the composition property (PRESENT relative to parent entries,
    LENGTH per present entry) holding at depth 2."""
    import glob

    from spark_hive_spark.sources.orc_meta import (
        _orc_file_tail,
        orc_type_tree,
        read_orc_list_column,
        read_orc_map_column,
    )

    df = spark.range(1, 1500).selectExpr(
        "CASE WHEN id % 13 = 0"
        " THEN CAST(NULL AS array<struct<a: bigint, s: string>>)"
        " ELSE transform(slice(array(0,1,2),1,CAST(id % 4 AS INT)),"
        " j -> CASE WHEN (id+j) % 6 = 0"
        " THEN CAST(NULL AS struct<a: bigint, s: string>)"
        " ELSE named_struct("
        " 'a', CASE WHEN (id+j)%5=0 THEN CAST(NULL AS BIGINT)"
        " ELSE id*10+j END,"
        " 's', CASE WHEN (id+j)%4=0 THEN CAST(NULL AS STRING)"
        " ELSE concat('s', (id+j)%9) END) END) END AS ls",
        "CASE WHEN id % 17 = 0 THEN CAST(NULL AS array<array<bigint>>)"
        " WHEN id % 17 = 1 THEN CAST(array() AS array<array<bigint>>)"
        " WHEN id % 17 = 2 THEN array(CAST(NULL AS array<bigint>))"
        " WHEN id % 17 = 3 THEN array(CAST(array() AS array<bigint>))"
        " ELSE transform(slice(array(0,1,2),1,CAST(id % 3 AS INT)+1),"
        " i -> CASE WHEN (id+i)%7=0 THEN CAST(NULL AS array<bigint>)"
        " ELSE transform(slice(array(0,1),1,CAST(id % 2 AS INT)+1),"
        " j -> CASE WHEN (id+i+j)%6=0 THEN CAST(NULL AS BIGINT)"
        " ELSE id*100+i*10+j END) END) END AS ll",
        "CASE WHEN id % 11 = 0"
        " THEN CAST(NULL AS map<string,struct<x: bigint>>)"
        " ELSE map('k', named_struct('x',"
        " CASE WHEN id%5=0 THEN CAST(NULL AS BIGINT) ELSE id END))"
        " END AS ms",
    )
    rows = df.collect()
    root = str(tmp_path / "deep")
    df.coalesce(1).write.option("compression", "zstd").orc(root)
    with open(glob.glob(root + "/*.orc")[0], "rb") as fh:
        data = fh.read()
    footer, _ = _orc_file_tail(data)
    tree = orc_type_tree(footer)
    ls_col, ll_col, ms_col = tree[0]["subtypes"]

    assert read_orc_list_column(data, ls_col)[0] == [
        None if r.ls is None
        else [None if e is None else {"a": e.a, "s": e.s}
              for e in r.ls]
        for r in rows
    ]
    assert read_orc_list_column(data, ll_col)[0] == [
        None if r.ll is None
        else [None if e is None else list(e) for e in r.ll]
        for r in rows
    ]
    assert read_orc_map_column(data, ms_col)[0] == [
        None if r.ms is None
        else {k: {"x": v.x} for k, v in r.ms.items()}
        for r in rows
    ]


def test_rlev1_unit_hand_built_bytes():
    """Hand-built RLEv1 byte sequences, both header cases and both
    signednesses, per the ORC spec's own examples."""
    from spark_hive_spark.sources.orc_meta import decode_rlev1

    # spec example: 100 copies of 7 (unsigned) = 0x61 0x00 0x07
    assert decode_rlev1(bytes([0x61, 0x00, 0x07]), signed=False) \
        == [7] * 100
    # spec example: literals 2,3,6,7,11 unsigned
    assert decode_rlev1(
        bytes([0xFB, 0x02, 0x03, 0x06, 0x07, 0x0B]), signed=False
    ) == [2, 3, 6, 7, 11]
    # run with negative delta, signed zigzag base 10 -> 0x14
    assert decode_rlev1(bytes([0x00, 0xFF, 0x14]), signed=True) \
        == [10, 9, 8]
    # signed literal -1 -> zigzag 1
    assert decode_rlev1(bytes([0xFF, 0x01]), signed=True) == [-1]
    # truncated run stays loud
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_rlev1(bytes([0x00]), signed=True)


def test_orc_rlev1_differential_vs_spark_011_writer(spark, tmp_path):
    """Spark's JVM writer pinned to orc.write.format=0.11 is the
    independent RLEv1 writer; every decoded column must match what
    Spark itself reads back, and the stripe footers must really
    carry the v1 encodings (0/1) so the test cannot silently attest
    the v2 path."""
    import os as _os

    from spark_hive_spark.sources.orc_meta import (
        _orc_file_tail,
        _stripe_streams,
        read_orc_int64_column,
        read_orc_string_column,
    )

    df = spark.range(0, 9000).selectExpr(
        "CASE WHEN id % 83 = 0 THEN NULL ELSE id END AS val",
        "4500 - id AS neg",
        "concat('p', id % 5) AS prio",
        "CASE WHEN id % 71 = 0 THEN NULL"
        " ELSE concat('tag-', id) END AS tag",
    )
    out = str(tmp_path / "v1")
    (
        df.coalesce(1)
        .write.option("orc.write.format", "0.11")
        .option("compression", "zlib")
        .orc(out)
    )
    path = next(
        _os.path.join(out, f)
        for f in _os.listdir(out) if f.endswith(".orc")
    )
    with open(path, "rb") as fh:
        data = fh.read()
    footer, codec = _orc_file_tail(data)
    encs: set[int] = set()
    for sraw in footer.get(3, []):
        _, _, enc_msgs, _ = _stripe_streams(data, codec, sraw, 1)
        encs.update(m.get(1, [0])[0] for m in enc_msgs[1:])
    assert encs <= {0, 1} and encs, f"not a v1 file: encodings {encs}"

    expect = [r.asDict() for r in spark.read.orc(path).collect()]
    vals, _ = read_orc_int64_column(data, column=1)
    negs, _ = read_orc_int64_column(data, column=2)
    prios, _ = read_orc_string_column(data, column=3)
    tags, _ = read_orc_string_column(data, column=4)
    assert vals == [r["val"] for r in expect]
    assert negs == [r["neg"] for r in expect]
    assert prios == [r["prio"] for r in expect]
    assert tags == [r["tag"] for r in expect]


def test_orc_index_positions_arity_gate():
    """ADVICE r15: nullable columns carry PRESENT-stream positions in
    their ROW_INDEX entries — the unpack must raise the NAMED seam,
    not a bare tuple-unpack ValueError."""
    import pytest

    from spark_hive_spark.sources.orc_meta import orc_index_positions

    assert orc_index_positions([40, 3], compressed=False) == (40, 3)
    assert orc_index_positions([100, 12, 3], compressed=True) \
        == (100, 12, 3)
    with pytest.raises(NotImplementedError, match="PRESENT"):
        orc_index_positions([0, 0, 40, 3], compressed=False)
    with pytest.raises(NotImplementedError, match="PRESENT"):
        orc_index_positions([0, 0, 0, 100, 12, 3], compressed=True)
    with pytest.raises(NotImplementedError, match="PRESENT"):
        orc_index_positions([40, 3], compressed=True)


def _zz(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _chunked(dec: bytes, size: int, codec: int) -> bytes:
    """Hand-chunk a decompressed stream the ORC way: 3-byte LE
    headers (len<<1)|isOriginal, raw-deflate bodies for codec 1."""
    import zlib

    out = bytearray()
    for i in range(0, len(dec), size):
        blk = dec[i : i + size]
        if codec == 1:
            co = zlib.compressobj(wbits=-15)
            body = co.compress(blk) + co.flush()
            if len(body) < len(blk):
                h = (len(body) << 1) | 0
            else:
                body, h = blk, (len(blk) << 1) | 1
        else:
            body, h = blk, (len(blk) << 1) | 1
        out += bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF])
        out += body
    return bytes(out)


def test_orc_seek_decode_compressed_unit():
    """Hand-built chunked RLEv2 stream: 30 SHORT_REPEAT runs (run i =
    10 copies of i), 2 bytes each, chunked at 15 bytes so chunk
    boundaries fall MID-RUN — exercises chunk indirection, the
    decompressed-offset drop, the mid-run-truncation retry, and the
    never-decompress-skipped-chunks attestation."""
    from spark_hive_spark.sources.orc_meta import (
        orc_seek_decode_compressed,
        orc_stream_chunk_offsets,
    )

    dec = b"".join(
        bytes([0x07, _zz(i)]) for i in range(30)
    )  # SHORT_REPEAT w=1 rep=10, zigzag value
    assert len(dec) == 60
    for codec in (0x7F_00, 1):  # original-only chunks, then deflate
        stream = _chunked(dec, 15, 1 if codec == 1 else 99)
        offs = orc_stream_chunk_offsets(stream)
        assert len(offs) == 4 and offs[0] == 0

        # seek into chunk 1 (header at offs[1]), byte 26 of the
        # decompressed stream = run 13; skip 5 values, take 30
        touched: set[int] = set()
        vals = orc_seek_decode_compressed(
            stream, 1, offs[1], 26 - 15, 5, 30, touched
        )
        assert vals == [13] * 5 + [14] * 10 + [15] * 10 + [16] * 5
        assert touched == {offs[1], offs[2]}  # chunks 0,3 untouched

        # from the top: chunk 0 ends mid-run-7 -> truncation retry
        touched = set()
        vals = orc_seek_decode_compressed(
            stream, 1, 0, 0, 0, 80, touched
        )
        assert vals == [i for i in range(8) for _ in range(10)]
        assert touched == {offs[0], offs[1]}

    # running off the end of the stream is loud
    import pytest

    stream = _chunked(dec, 15, 99)
    with pytest.raises(ValueError, match="ran out"):
        orc_seek_decode_compressed(
            stream, 1, orc_stream_chunk_offsets(stream)[3], 0, 0, 500
        )


def test_orc_byte_rle_and_present_seek_units():
    """Round 16: byte-RLE seek skips run-spanning bytes and never
    walks the tail; present-seek honors the bit offset; the nullable
    position splitter is loud on the untested combinations."""
    import pytest

    from spark_hive_spark.sources.orc_meta import (
        orc_byte_rle_seek,
        orc_index_positions_nullable,
        orc_present_seek,
    )

    # run of 10 x 0xAB (control 7), then literals b"XYZ" (control 253)
    stream = bytes([7, 0xAB, 253]) + b"XYZ"
    assert orc_byte_rle_seek(stream, 0, 0, 10) == b"\xab" * 10
    assert orc_byte_rle_seek(stream, 0, 8, 4) == b"\xab\xabXY"
    assert orc_byte_rle_seek(stream, 2, 1, 2) == b"YZ"  # mid-stream
    with pytest.raises(ValueError, match="ran out"):
        orc_byte_rle_seek(stream, 0, 0, 20)

    # bitmap 0b10110100 0b11110000 as a 2-byte literal run
    bstream = bytes([254, 0b10110100, 0b11110000])
    assert orc_present_seek(bstream, (0, 0, 0), 8) \
        == [1, 0, 1, 1, 0, 1, 0, 0]
    assert orc_present_seek(bstream, (0, 0, 3), 7) \
        == [1, 0, 1, 0, 0, 1, 1]  # bit offset crosses the byte edge
    assert orc_present_seek(bstream, (0, 1, 4), 4) == [0, 0, 0, 0]

    p, d = orc_index_positions_nullable([1, 2, 3, 4, 5],
                                        compressed=False)
    assert p == (1, 2, 3) and d == (4, 5)
    p, d = orc_index_positions_nullable([1, 2, 3, 4, 5, 6, 7],
                                        compressed=True)
    assert p == (1, 2, 3, 4) and d == (5, 6, 7)
    with pytest.raises(NotImplementedError, match="expected 7"):
        orc_index_positions_nullable([0] * 5, compressed=True)
    with pytest.raises(NotImplementedError, match="expected 5"):
        orc_index_positions_nullable([1, 2], compressed=False)


def test_orc_byte_rle_seek_compressed_unit():
    """Chunk-indirected byte-RLE seek: lazy decompression pulls one
    more chunk on a run-spanning truncation; skipped chunks stay
    untouched."""
    import pytest

    from spark_hive_spark.sources.orc_meta import (
        orc_byte_rle_seek_compressed,
        orc_present_seek_compressed,
        orc_stream_chunk_offsets,
    )

    # decompressed stream: run 10x0xAB | literals XYZ | run 5x0xCD
    dec = bytes([7, 0xAB, 253]) + b"XYZ" + bytes([2, 0xCD])
    # chunk at 4 bytes so boundaries fall mid-run ("original" chunks)
    stream = bytearray()
    for i in range(0, len(dec), 4):
        blk = dec[i : i + 4]
        h = (len(blk) << 1) | 1
        stream += bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF])
        stream += blk
    stream = bytes(stream)
    offs = orc_stream_chunk_offsets(stream)
    assert len(offs) == 2

    touched: set[int] = set()
    out = orc_byte_rle_seek_compressed(
        stream, 1, 0, 0, 8, 3, touched
    )
    assert out == b"\xab\xabX"
    assert touched == {offs[0], offs[1]}  # literal spans the boundary
    # seek straight into chunk 1 (dec offset 1 inside it => 'Y')
    touched = set()
    # chunk1 decompressed = b"YZ\x02\xcd"; byte-RLE from 'Y'? literals
    # need their control byte — so seek into chunk 0 at the control
    out = orc_byte_rle_seek_compressed(stream, 1, offs[0], 2, 0, 3,
                                       touched)
    assert out == b"XYZ"
    with pytest.raises(ValueError, match="ran out"):
        orc_byte_rle_seek_compressed(stream, 1, offs[1], 0, 0, 500)

    # present over compressed: bitmap literal run of 2 bytes
    pdec = bytes([254, 0b10110100, 0b11110000])
    h = (len(pdec) << 1) | 1
    pstream = bytes([h & 0xFF, (h >> 8) & 0xFF, (h >> 16) & 0xFF]) \
        + pdec
    assert orc_present_seek_compressed(
        pstream, 1, (0, 0, 0, 3), 7
    ) == [1, 0, 1, 0, 0, 1, 1]


def test_resumable_decoders_match_full_decode_at_any_split():
    """Property: decoding a stream through resumable mode with an
    arbitrary buffer split must reproduce the unsplit decode, and
    `consumed` always lands on a run boundary."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spark_hive_spark.sources.orc_meta import (
        _byte_rle_resumable,
        decode_byte_rle,
        decode_rlev2,
    )

    def zz(v):
        return (v << 1) ^ (v >> 63)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 255), st.integers(3, 10)),
            min_size=1, max_size=12,
        ),
        st.data(),
    )
    def rlev2_case(runs, data):
        # stream of SHORT_REPEAT runs: (value byte, repeat 3-10)
        stream = b"".join(
            bytes([((rep - 3) & 7), zz(v) & 0xFF]) for v, rep in runs
        )
        full = decode_rlev2(stream, signed=True)
        split = data.draw(st.integers(0, len(stream)))
        out, consumed = decode_rlev2(
            stream[:split], signed=True, resumable=True
        )
        rest = decode_rlev2(
            stream[:split][consumed:] + stream[split:], signed=True
        )
        assert out + rest == full
        assert consumed <= split

    rlev2_case()

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.binary(min_size=1, max_size=6),
                 min_size=1, max_size=8),
        st.data(),
    )
    def byte_rle_case(literals, data):
        # literal-run byte-RLE stream
        stream = b"".join(
            bytes([256 - len(b)]) + b for b in literals
        )
        full = decode_byte_rle(stream)
        split = data.draw(st.integers(0, len(stream)))
        out, consumed = _byte_rle_resumable(stream[:split], 10**9)
        out2, consumed2 = _byte_rle_resumable(
            stream[:split][consumed:] + stream[split:], 10**9
        )
        assert out + out2 == full
        # the cap stops early without corrupting the prefix
        capped, _ = _byte_rle_resumable(stream, 3)
        assert full.startswith(capped) and len(capped) >= min(3, len(full))

    byte_rle_case()


def test_orc_bloom_long_hash_signed_shift_semantics():
    """The round-16 finding: ORC's getLongHash uses ARITHMETIC right
    shifts (bytecode `lshr`), so hash(0) == 0 — a `>>>` port (Wang's
    published form) diverges exactly on zero/negative-intermediate
    keys and silently false-negatives them. Vectors extracted from
    JVM-written filters (positions at numHash=7, nbits=95872)."""
    from spark_hive_spark.sources.orc_meta import (
        orc_bloom_long_hash,
        orc_bloom_maybe,
    )

    assert orc_bloom_long_hash(0) == 0

    def positions(h64, nbits=95872, k=7):
        def to_i32(v):
            v &= 0xFFFFFFFF
            return v - (1 << 32) if v >= (1 << 31) else v
        h1, h2 = to_i32(h64), to_i32(h64 >> 32)
        out = set()
        for i in range(1, k + 1):
            c = to_i32(h1 + i * h2)
            if c < 0:
                c = to_i32(~c & 0xFFFFFFFF)
            out.add(c % nbits)
        return sorted(out)

    vectors = {
        0: [0],
        1: [16951, 21792, 33906, 49851, 50861, 54692, 66806],
        -1: [10135, 14580, 17563, 22008, 68448, 88719, 93164],
        7: [23172, 29068, 34964, 56743, 62639, 68535, 74431],
        255: [17632, 26406, 53379, 58741, 64103, 81169, 86531],
        12345: [19556, 19828, 21180, 21452, 73067, 73339, 74963],
    }
    for v, expect in vectors.items():
        assert positions(orc_bloom_long_hash(v)) == expect, v

    # membership over a hand-set bitset: little-endian long layout
    bits = bytearray(95872 // 8)
    for p in vectors[7]:
        bits[p >> 3] |= 1 << (p & 7)
    assert orc_bloom_maybe(7, bytes(bits), orc_bloom_long_hash(7))
    assert not orc_bloom_maybe(7, bytes(bits), orc_bloom_long_hash(8))


def test_orc_murmur3_hash64_jvm_vectors():
    """orc_murmur3_hash64 vs org.apache.orc.util.Murmur3.hash64
    (py4j-extracted vectors, round 17): empty / short tail / exact
    8-byte block / block+tail / multi-byte UTF-8 — plus the
    composed BloomFilterUtf8.addString bit positions for 'abc' at
    the ndv=1000/fpp=0.01 geometry (numHash 7, 9600 bits). The seed
    is the class-private 104729; seed 0 or 42 fails every vector."""
    from spark_hive_spark.sources.orc_meta import (
        orc_bloom_maybe,
        orc_bloom_utf8_hash,
        orc_murmur3_hash64,
    )

    vectors = {
        b"": 8404154273843829576,
        b"a": 15986002618429608327,
        b"abc": 14370731444029792462,
        b"hello world": 13288150786092020396,
        b"ORD-000000001": 12539460462473475082,
        bytes(range(16)): 11863403409461022568,
        "你好".encode(): 2306560066233773995,
        b"0123456": 4286122142857051625,
    }
    for data, expect in vectors.items():
        assert orc_murmur3_hash64(data) == expect, data
    assert orc_bloom_utf8_hash("你好") == vectors["你好".encode()]

    # BloomFilterUtf8(1000, 0.01).addString('abc') set exactly these
    # bits (little-endian long-array layout, getBitSet() extracted)
    expect_pos = [186, 2858, 3231, 4374, 4747, 5903, 6276]
    h64 = orc_bloom_utf8_hash("abc")

    def to_i32(v):
        v &= 0xFFFFFFFF
        return v - (1 << 32) if v >= (1 << 31) else v

    h1, h2 = to_i32(h64), to_i32(h64 >> 32)
    got = set()
    for i in range(1, 8):
        c = to_i32(h1 + i * h2)
        if c < 0:
            c = to_i32(~c & 0xFFFFFFFF)
        got.add(c % 9600)
    assert sorted(got) == expect_pos

    bits = bytearray(9600 // 8)
    for p in expect_pos:
        bits[p >> 3] |= 1 << (p & 7)
    assert orc_bloom_maybe(7, bytes(bits), orc_bloom_utf8_hash("abc"))
    assert not orc_bloom_maybe(
        7, bytes(bits), orc_bloom_utf8_hash("abd")
    )


def test_orc_bloom_index_kind7_is_loud():
    """The deprecated fixed64/default-charset BLOOM_FILTER form must
    raise by name, never decode as if it were utf8."""
    import pytest

    from spark_hive_spark.sources.orc_meta import orc_bloom_index

    # hand-build BloomFilterIndex{bloomFilter{numHash=7, bitset=[0]}}
    # protobuf: field1 len-delim { field1 varint 7, field2 fixed64 0 }
    bf = bytes([0x08, 0x07, 0x11]) + b"\x00" * 8
    bfi = bytes([0x0A, len(bf)]) + bf
    with pytest.raises(NotImplementedError, match="BLOOM_FILTER_UTF8"):
        orc_bloom_index(bfi, 0)

    # the utf8 form decodes: field1 varint 7, field3 len-delim bytes
    bf = bytes([0x08, 0x07, 0x1A, 0x04]) + b"\xff\x00\x00\x00"
    bfi = bytes([0x0A, len(bf)]) + bf
    out = orc_bloom_index(bfi, 0)
    assert out == [(7, b"\xff\x00\x00\x00")]


def test_orc_seek_varints_compressed_boundary_carry():
    """Varints split across compression-chunk boundaries must decode
    via the TruncatedRun tail-carry (every byte decompressed once,
    partial varint carried); seeks from a later chunk skip earlier
    chunks entirely; running past the data is loud."""
    import zlib

    from spark_hive_spark.sources.orc_meta import (
        orc_seek_varints_compressed,
    )

    def zz(v):
        return (v << 1) ^ (v >> 63) if v >= 0 else ((-v) << 1) - 1

    vals = [0, -1, 7, 300, -70000, 2**40 + 3, -(2**55), 5] * 40
    raw = b"".join(
        bytes(
            ([(zz(v) >> (7 * i)) & 0x7F | 0x80
              for i in range(((zz(v).bit_length() or 1) + 6) // 7)][:-1])
            + [(zz(v) >> (7 * ((
                (zz(v).bit_length() or 1) + 6) // 7 - 1))) & 0x7F]
        )
        for v in vals
    )
    # 13-byte decompressed chunks: multi-byte varints straddle
    stream = b""
    offs = []
    for i in range(0, len(raw), 13):
        piece = raw[i : i + 13]
        comp = zlib.compress(piece)[2:-4]  # raw deflate
        if len(comp) < len(piece):
            hdr = len(comp) << 1
            body = comp
        else:  # stored: ORC original-chunk form, low bit set
            hdr = (len(piece) << 1) | 1
            body = piece
        offs.append(len(stream))
        stream += bytes(
            [hdr & 0xFF, (hdr >> 8) & 0xFF, (hdr >> 16) & 0xFF]
        ) + body

    touched: set = set()
    got = orc_seek_varints_compressed(
        stream, 1, 0, 0, len(vals), touched=touched
    )
    assert got == vals
    assert touched == set(offs)  # full read touches every chunk

    # seek: start mid-stream (chunk 3, 5 bytes in == a varint
    # boundary we can compute: decode from 0 and find one)
    import io
    # find a value index whose byte offset lands inside chunk 3
    byte_off = 0
    for idx, v in enumerate(vals):
        if byte_off >= 13 * 3 + 2:
            break
        byte_off += ((zz(v).bit_length() or 1) + 6) // 7
    chunk_i = byte_off // 13
    touched2: set = set()
    got2 = orc_seek_varints_compressed(
        stream, 1, offs[chunk_i], byte_off - 13 * chunk_i,
        len(vals) - idx, touched=touched2,
    )
    assert got2 == vals[idx:]
    assert offs[0] not in touched2  # earlier chunks never pulled

    import pytest
    with pytest.raises(ValueError, match="ran out of compression"):
        orc_seek_varints_compressed(stream, 1, 0, 0, len(vals) + 1)
