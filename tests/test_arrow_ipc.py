"""Differential tests for the hand-built Arrow IPC reader
(sources/arrow_ipc.py) against pyarrow's own writer/reader: every
batch, every column, values + nulls identical — compressed (zstd
through the repo's hand decoder) and uncompressed."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.ipc as pipc
import pytest

from spark_hive_spark.sources.arrow_ipc import parse_ipc_file


def _fixture_table(n=3000):
    return pa.table({
        "k": pa.array(
            [None if i % 53 == 0 else i * 7 for i in range(n)],
            pa.int64(),
        ),
        "v": pa.array([i * 0.25 for i in range(n)], pa.float64()),
        "s": pa.array(
            [None if i % 97 == 0 else f"row#{i:05d}" for i in range(n)],
            pa.string(),
        ),
    })


@pytest.mark.parametrize("compression", [None, "zstd"])
def test_file_roundtrip_matches_pyarrow(tmp_path, compression):
    tbl = _fixture_table()
    path = str(tmp_path / f"t_{compression}.arrow")
    opts = pipc.IpcWriteOptions(compression=compression)
    with pipc.new_file(path, tbl.schema, options=opts) as w:
        for i in range(5):
            w.write_table(tbl.slice(i * 600, 600))
    with open(path, "rb") as fh:
        data = fh.read()
    fields, batches = parse_ipc_file(data)
    assert [f["name"] for f in fields] == ["k", "v", "s"]
    assert len(batches) == 5
    got = {
        c: [v for b in batches for v in b[c]] for c in ("k", "v", "s")
    }
    ref = pipc.open_file(path).read_all()
    for c in ("k", "v", "s"):
        assert got[c] == ref[c].to_pylist()


def test_loud_seams(tmp_path):
    # unsupported type (int32) -> loud
    ipath = str(tmp_path / "i32.arrow")
    itbl = pa.table({"i": pa.array([1, 2, 3], pa.int32())})
    with pipc.new_file(ipath, itbl.schema) as w:
        w.write_table(itbl)
    with pytest.raises(NotImplementedError, match="Int32"):
        parse_ipc_file(open(ipath, "rb").read())
    with pytest.raises(ValueError, match="ARROW1"):
        parse_ipc_file(b"not an arrow file....." * 3)


def _dict_fixture(n=600):
    words = ["alpha", "beta", "gamma", "delta", None, "epsilon"]
    return pa.table({
        "d": pa.array([words[i % 6] for i in range(n)]).dictionary_encode(),
        "di": pa.DictionaryArray.from_arrays(
            pa.array([i % 3 for i in range(n)], pa.int8()),
            pa.array([100, 200, 300], pa.int64()),
        ),
        "k": pa.array(
            [None if i % 9 == 0 else i for i in range(n)], pa.int64()
        ),
    })


@pytest.mark.parametrize("compression", [None, "zstd", "lz4"])
def test_dictionary_columns_roundtrip(tmp_path, compression):
    """Dictionary-encoded utf8 + int64 columns (int32 and int8 index
    types) across all three body codecs — values resolved through the
    hand-decoded DictionaryBatch blocks match pyarrow's reader."""
    tbl = _dict_fixture()
    path = str(tmp_path / f"dict_{compression}.arrow")
    opts = pipc.IpcWriteOptions(compression=compression)
    with pipc.new_file(path, tbl.schema, options=opts) as w:
        w.write_table(tbl, max_chunksize=150)
    with open(path, "rb") as fh:
        data = fh.read()
    fields, batches = parse_ipc_file(data)
    by_name = {f["name"]: f for f in fields}
    assert "dict_id" in by_name["d"] and "dict_id" in by_name["di"]
    assert by_name["di"]["index_width"] == 1  # int8 indices
    assert len(batches) == 4
    ref = pipc.open_file(path).read_all()
    for c in ("d", "di", "k"):
        got = [v for b in batches for v in b[c]]
        assert got == ref[c].to_pylist()


def test_lz4_frame_differential():
    """The hand-built LZ4 frame decoder against pyarrow's reference
    codec, plus the xxHash32 spec vectors it validates checksums
    with."""
    from spark_hive_spark.operators.lz4 import (
        lz4_frame_decompress,
        xxh32,
    )

    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"a") == 0x550D7456
    assert xxh32(b"abc") == 0x32D153FF
    c = pa.Codec("lz4")  # frame format
    for payload in (
        b"",
        b"x",
        b"hello world " * 1000,
        bytes(range(256)) * 37,
    ):
        assert lz4_frame_decompress(
            c.compress(payload, asbytes=True)
        ) == payload
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00\x00\x00\x00garbage")
    # corrupt the header-checksum byte -> loud
    comp = bytearray(c.compress(b"hello world " * 100, asbytes=True))
    hc_pos = 14 if comp[4] & 0x08 else 6  # after optional content size
    comp[hc_pos] ^= 0xFF
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bytes(comp))


def test_timestamp_us_column(tmp_path):
    import datetime as dt

    ts = [dt.datetime(1995, 1, 1) + dt.timedelta(minutes=i) for i in range(50)]
    tbl = pa.table({"t": pa.array(ts, pa.timestamp("us"))})
    path = str(tmp_path / "ts.arrow")
    with pipc.new_file(path, tbl.schema) as w:
        w.write_table(tbl)
    fields, batches = parse_ipc_file(open(path, "rb").read())
    assert fields[0]["kind"] == "timestamp_us"
    epoch = dt.datetime(1970, 1, 1)
    assert batches[0]["t"] == [
        int((x - epoch).total_seconds() * 1_000_000) for x in ts
    ]


@pytest.mark.parametrize("compression", [None, "zstd", "lz4"])
def test_stream_layout_roundtrip(tmp_path, compression):
    """The footer-less STREAMING layout: schema first, inline
    dictionary batches, end-of-stream marker — against pyarrow's
    stream reader across all codecs."""
    from spark_hive_spark.sources.arrow_ipc import parse_ipc_stream

    tbl = _dict_fixture(400)
    path = str(tmp_path / f"s_{compression}.arrows")
    opts = pipc.IpcWriteOptions(compression=compression)
    with pipc.new_stream(path, tbl.schema, options=opts) as w:
        w.write_table(tbl, max_chunksize=100)
    with open(path, "rb") as fh:
        data = fh.read()
    fields, batches, saw_eos = parse_ipc_stream(data)
    assert saw_eos and len(batches) == 4
    ref = pipc.open_stream(path).read_all()
    for c in ("d", "di", "k"):
        assert [v for b in batches for v in b[c]] == ref[c].to_pylist()
    # truncated stream (no EOS) parses but reports it
    _, _, eos2 = parse_ipc_stream(data[:-8])
    assert not eos2
    # a stream that opens with garbage is loud
    with pytest.raises(ValueError, match="continuation"):
        parse_ipc_stream(b"\x12\x34\x56\x78" + data)


def test_lz4_linked_block_truncation_is_loud():
    """_lz4_block_with_prefix (linked-mode frames) must reject
    truncated/corrupt payloads instead of silently emitting short
    output (r13 ADVICE): every read is bounds-checked."""
    import pytest as _pytest

    from spark_hive_spark.operators.lz4 import _lz4_block_with_prefix

    pre = b"0123456789abcdef"
    # a valid literals-only block decodes
    assert _lz4_block_with_prefix(b"\x30abc", pre) == b"abc"
    cases = [
        b"\xf0\xff",          # literal-length extension runs off the end
        b"\x50abc",           # declares 5 literals, payload has 3
        b"\x30abc\x05",       # match offset truncated to one byte
        b"\x30abc\x00\x00",   # offset 0
        b"\x30abc\xff\xff",   # offset beyond prefix+output window
        b"\x3fabc\x04\x00\xff",  # match-length extension truncated
    ]
    for payload in cases:
        with _pytest.raises(ValueError):
            _lz4_block_with_prefix(payload, pre)


def test_delta_dictionary_stream_differential():
    """Delta dictionary batches (isDelta=true) append to the
    accumulated dictionary: prefix-extension dictionaries make
    pyarrow emit TRUE deltas (pinned via the parser's stats), and
    the hand decoder's values must match pyarrow's read-back,
    including indices that reach across delta regions."""
    import io

    import pyarrow.ipc as pipc

    from spark_hive_spark.sources.arrow_ipc import parse_ipc_stream

    schema = pa.schema([("c", pa.dictionary(pa.int32(), pa.string())),
                        ("v", pa.int64())])
    vocab = [f"t{i}" for i in range(9)]

    def mk(upto, idxs):
        arr = pa.DictionaryArray.from_arrays(
            pa.array(idxs, pa.int32()), pa.array(vocab[:upto])
        )
        return pa.record_batch(
            [arr, pa.array(list(range(len(idxs))), pa.int64())],
            schema=schema,
        )

    sink = io.BytesIO()
    opts = pipc.IpcWriteOptions(emit_dictionary_deltas=True)
    with pipc.new_stream(sink, schema, options=opts) as w:
        w.write_batch(mk(3, [0, 2, 1, None]))
        w.write_batch(mk(6, [3, 5, 0]))      # +t3..t5, reuses t0
        w.write_batch(mk(9, [8, 1, 4, 6]))   # +t6..t8, spans regions
        w.write_batch(mk(9, [7, 0]))         # nothing new: no message
    data = sink.getvalue()

    stats: dict = {}
    fields, bats, eos = parse_ipc_stream(data, stats)
    assert eos and len(bats) == 4
    assert stats["n_dict_messages"] == 3
    assert stats["n_delta_messages"] == 2
    assert stats["dict_sizes"] == {0: 9}
    got = [v for b in bats for v in b["c"]]
    ref = pa.ipc.open_stream(data).read_all()["c"].to_pylist()
    assert got == ref
    assert got[:4] == ["t0", "t2", "t1", None]
    assert got[4:7] == ["t3", "t5", "t0"]


def test_replacement_dictionary_stream():
    """Non-prefix dictionaries make pyarrow fall back to REPLACEMENT
    batches (isDelta absent) — the reader must swap, not append, and
    report zero delta messages."""
    import io

    import pyarrow.ipc as pipc

    from spark_hive_spark.sources.arrow_ipc import parse_ipc_stream

    schema = pa.schema([("c", pa.dictionary(pa.int32(), pa.string()))])

    def mk(vals):
        return pa.record_batch(
            [pa.array(vals).dictionary_encode()
             .cast(pa.dictionary(pa.int32(), pa.string()))],
            schema=schema,
        )

    sink = io.BytesIO()
    opts = pipc.IpcWriteOptions(emit_dictionary_deltas=True)
    with pipc.new_stream(sink, schema, options=opts) as w:
        w.write_batch(mk(["a", "b"]))
        w.write_batch(mk(["a", "c", "d"]))  # not a prefix extension
    data = sink.getvalue()
    stats: dict = {}
    _f, bats, eos = parse_ipc_stream(data, stats)
    assert eos and stats["n_dict_messages"] == 2
    assert stats.get("n_delta_messages", 0) == 0
    got = [v for b in bats for v in b["c"]]
    assert got == pa.ipc.open_stream(data).read_all()["c"].to_pylist()


def test_delta_dictionary_before_base_is_loud():
    """A delta batch whose id has no base dictionary is corrupt input
    and must raise, not silently seed an empty dictionary."""
    import io

    import pyarrow.ipc as pipc

    from spark_hive_spark.sources.arrow_ipc import parse_ipc_stream

    schema = pa.schema([("c", pa.dictionary(pa.int32(), pa.string()))])
    vocab = ["x", "y", "z"]

    def mk(upto, idxs):
        arr = pa.DictionaryArray.from_arrays(
            pa.array(idxs, pa.int32()), pa.array(vocab[:upto])
        )
        return pa.record_batch([arr], schema=schema)

    sink = io.BytesIO()
    opts = pipc.IpcWriteOptions(emit_dictionary_deltas=True)
    with pipc.new_stream(sink, schema, options=opts) as w:
        w.write_batch(mk(2, [0, 1]))
        w.write_batch(mk(3, [2]))  # emits a delta message
    data = sink.getvalue()
    # excise the BASE dictionary message (messages are framed, so a
    # byte splice is clean): the real delta message then arrives
    # with no base to extend — corrupt input, must be loud
    import struct as _struct

    from spark_hive_spark.sources.arrow_ipc import fb_root

    pos = 0
    spliced = None
    cut_start = None
    while pos < len(data):
        (cont,) = _struct.unpack_from("<I", data, pos)
        if cont == 0:
            break
        (mlen,) = _struct.unpack_from("<i", data, pos + 4)
        if mlen == 0:
            break
        msg = fb_root(data[pos + 8 : pos + 8 + mlen])
        end = pos + 8 + mlen + msg.scalar(3, "<q")
        if msg.scalar(1, "<B") == 2 and cut_start is None:
            cut_start = pos  # base dictionary: start of the excision
        elif msg.scalar(1, "<B") == 3 and cut_start is not None:
            # ...through the first record batch, so the DELTA message
            # is the first dictionary the reader ever sees
            spliced = data[:cut_start] + data[end:]
            break
        pos = end
    assert spliced is not None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="before its base"):
        parse_ipc_stream(spliced)
