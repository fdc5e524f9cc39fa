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
    tbl = _fixture_table(100)
    # dictionary-encoded column -> loud
    dpath = str(tmp_path / "dict.arrow")
    dtbl = pa.table({
        "d": pa.array(["a", "b", "a"] * 10).dictionary_encode()
    })
    with pipc.new_file(dpath, dtbl.schema) as w:
        w.write_table(dtbl)
    with pytest.raises(NotImplementedError, match="dictionary"):
        parse_ipc_file(open(dpath, "rb").read())
    # unsupported type (int32) -> loud
    ipath = str(tmp_path / "i32.arrow")
    itbl = pa.table({"i": pa.array([1, 2, 3], pa.int32())})
    with pipc.new_file(ipath, itbl.schema) as w:
        w.write_table(itbl)
    with pytest.raises(NotImplementedError, match="Int32"):
        parse_ipc_file(open(ipath, "rb").read())
    # lz4 body compression -> loud
    lpath = str(tmp_path / "lz4.arrow")
    with pipc.new_file(
        lpath, tbl.schema, options=pipc.IpcWriteOptions(compression="lz4")
    ) as w:
        w.write_table(tbl)
    with pytest.raises(NotImplementedError, match="compression"):
        parse_ipc_file(open(lpath, "rb").read())
    with pytest.raises(ValueError, match="ARROW1"):
        parse_ipc_file(b"not an arrow file....." * 3)


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
