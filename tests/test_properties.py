"""Property-based tests (hypothesis) for the custom operators whose
correctness doesn't reduce to a SQL oracle: the generic as-of join,
shingle Jaccard, and the decimal-exact summation policy. Generated
inputs run through REAL Spark plans (small row counts, fixed deadline
off for JVM latency)."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

_base = dt.datetime(2024, 1, 1)


def _events(keys=(1, 2), max_n=12):
    return st.lists(
        st.tuples(
            st.sampled_from(keys),
            st.integers(min_value=0, max_value=10_000),  # seconds offset
        ),
        min_size=0,
        max_size=max_n,
    )


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=_events(), right=_events())
def test_asof_join_matches_pandas_merge_asof(spark, left, right):
    """asof_join (union-sort-backfill) must agree with
    pd.merge_asof(direction='backward') on arbitrary inputs, incl.
    duplicates, empty sides, and exact-timestamp matches."""
    from spark_hive_spark.operators.temporal import asof_join

    ldf = spark.createDataFrame(
        [
            (k, _base + dt.timedelta(seconds=s), i)
            for i, (k, s) in enumerate(left)
        ],
        "k int, lts timestamp, lid int",
    )
    rdf = spark.createDataFrame(
        [
            (k, _base + dt.timedelta(seconds=s), 100 + i)
            for i, (k, s) in enumerate(right)
        ],
        "k int, rts timestamp, rid int",
    )
    got = {
        (r.lid, r.rts)
        for r in asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts", how="inner"
        ).collect()
    }

    lp = pd.DataFrame(
        [(k, _base + dt.timedelta(seconds=s), i) for i, (k, s) in enumerate(left)],
        columns=["k", "lts", "lid"],
    ).sort_values(["lts", "lid"])
    rp = pd.DataFrame(
        [
            (k, _base + dt.timedelta(seconds=s), 100 + i)
            for i, (k, s) in enumerate(right)
        ],
        columns=["k", "rts", "rid"],
    ).sort_values(["rts", "rid"])
    if len(lp) and len(rp):
        # pandas keeps the LAST right row per ts; dedupe to match the
        # 'latest right at-or-before' contract deterministically
        rp = (
            rp.groupby(["k", "rts"], as_index=False)
            .last()
            .sort_values("rts", kind="stable")
        )
        m = pd.merge_asof(
            lp, rp, left_on="lts", right_on="rts", by="k", direction="backward"
        )
        expected = {
            (int(r.lid), r.rts.to_pydatetime())
            for r in m.itertuples()
            if pd.notna(r.rts)
        }
    else:
        expected = set()
    assert got == expected


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["aa", "bb", "cc", "dd", "ee"]),
            min_size=0,
            max_size=10,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_shingle_jaccard_matches_python(spark, docs, tmp_path_factory):
    """The inverted-index Jaccard pipeline (hashing included) must
    equal a direct python set computation on arbitrary tiny corpora."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # same plan as operators/dedup._doc_shingles, inline on this df
    toks = df.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    sh = (
        toks.select(
            "doc_id",
            F.xxhash64(
                F.concat_ws(
                    " ", "tok", F.lead("tok", 1).over(w), F.lead("tok", 2).over(w)
                )
            ).alias("s"),
            F.lead("tok", 2).over(w).alias("t2"),
        )
        .filter(F.col("t2").isNotNull())
        .select("doc_id", "s")
        .distinct()
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("c"))
    )
    got = {
        (r.da, r.db): r.c
        / (
            next(x.n for x in sz.collect() if x.doc_id == r.da)
            + next(x.n for x in sz.collect() if x.doc_id == r.db)
            - r.c
        )
        for r in common.collect()
    }

    def pyshingles(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    sets = {i: pyshingles(t) for i, t in enumerate(docs)}
    expected = {}
    for i in sets:
        for j in sets:
            if i < j and sets[i] and sets[j]:
                inter = len(sets[i] & sets[j])
                if inter:
                    expected[(i, j)] = inter / len(sets[i] | sets[j])
    assert {k: round(v, 9) for k, v in got.items()} == {
        k: round(v, 9) for k, v in expected.items()
    }


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        st.decimals(
            min_value="-99999.99",
            max_value="99999.99",
            places=2,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=40,
    ),
    parts=st.integers(min_value=1, max_value=8),
)
def test_decimal_sum_partition_invariant(spark, vals, parts):
    """The engine's money-sum policy must give bit-identical results
    under ANY partitioning (the property double sums lack)."""
    from spark_hive_spark.functions.numeric import dsum

    rows = [(float(v),) for v in vals]
    a = spark.createDataFrame(rows, "v double").coalesce(1)
    b = spark.createDataFrame(rows, "v double").repartition(parts)
    ra = a.agg(dsum("v").alias("s")).collect()[0].s
    rb = b.agg(dsum("v").alias("s")).collect()[0].s
    assert ra == rb
    assert abs(ra - float(sum(vals))) < 1e-6


def test_udtf_chunks_cover_documents_exactly(spark):
    """Chunk geometry invariants: chunk 0 starts at 0, consecutive
    chunks stride by exactly 400, every chunk's length is
    min(500, len - start) (stride < size means several trailing
    chunks can run short, not just the last), and the final chunk
    ends exactly at the document length."""
    from spark_hive_spark.plans.registry import all_queries
    from tests.conftest import SF_SMOKE

    chunks = all_queries()["udtf_document_chunks"].fn(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.n
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .selectExpr("doc_id", "length(text) AS n")
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d for d, n in docs.items() if n > 0}
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        assert all(r.chunk_start == i * 400 for i, r in enumerate(rows))
        n = docs[doc_id]
        assert all(r.chunk_len == min(500, n - r.chunk_start) for r in rows)
        last = rows[-1]
        assert last.chunk_start + last.chunk_len == n


def test_cdc_upsert_preserves_untouched_rows(spark):
    """Merge accounting: merged row count = base + inserts; update
    keys keep their key but change status; untouched rows unchanged.
    (The registered query returns the per-status summary; this test
    checks the row-routing arithmetic behind it.)"""
    from pyspark.sql import functions as F
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE

    base = t(spark, SF_SMOKE, "orders")
    n_base = base.count()
    n_updates = base.filter(F.col("o_orderkey") % 97 == 0).count()
    n_inserts = base.filter(F.col("o_orderkey") % 101 == 0).count()
    out = {
        r.o_orderstatus: r.n_orders
        for r in all_queries()["cdc_upsert_orders"].fn(spark, SF_SMOKE).collect()
    }
    assert sum(out.values()) == n_base + n_inserts
    assert out.get("N", 0) == n_inserts
    assert out.get("X", 0) == n_updates


def test_gapfill_spine_is_dense_and_locf_holds(spark):
    """Per type: hours form a dense sequence; LOCF equals the most
    recent observed value; gap rows have n_events == 0."""
    from spark_hive_spark.plans.registry import all_queries
    from tests.conftest import SF_SMOKE

    rows = all_queries()["timeseries_gapfill_locf"].fn(spark, SF_SMOKE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for typ, rs in by_type.items():
        rs.sort(key=lambda r: r.hour)
        hours = [r.hour for r in rs]
        assert all(
            (b - a).total_seconds() == 3600 for a, b in zip(hours, hours[1:])
        ), f"{typ}: spine not dense"
        last = None
        for r in rs:
            if r.is_gap:
                assert r.n_events == 0
                assert r.value_locf == last
            else:
                assert r.n_events > 0
                last = r.value_locf
        assert not rs[0].is_gap  # spine starts at first observation


# ---- container framing round-trips (pure Python, no Spark) ----------

_member_name = st.text(
    alphabet=st.sampled_from("abcdefgh0123456789_-"), min_size=1, max_size=20
).map(lambda s: s + ".bin")


@settings(max_examples=60, deadline=None)
@given(
    members=st.lists(
        st.tuples(
            _member_name,
            st.one_of(
                st.binary(min_size=0, max_size=40),
                # block-boundary sizes: 0, 512, 513, 514 exercise the
                # padding arithmetic
                st.integers(min_value=0, max_value=3).map(
                    lambda k: bytes(range(256)) * 2 + b"x" * (k - 1)
                    if k else b""
                ),
            ),
        ),
        min_size=1,
        max_size=6,
        unique_by=lambda m: m[0],
    )
)
def test_tar_roundtrip_property(members):
    """encode_tar -> parse_tar is identity for arbitrary member
    names/payloads, including 0-byte and block-boundary sizes."""
    from spark_hive_spark.operators.webdataset import encode_tar, parse_tar

    blob = encode_tar(members)
    assert parse_tar(blob) == members
    assert len(blob) % 512 == 0


@settings(max_examples=60, deadline=None)
@given(
    recs=st.lists(
        st.tuples(
            st.sampled_from(["response", "metadata", "conversion"]),
            # payloads may contain CRLFCRLF — framing must trust
            # Content-Length, never scan the body
            st.binary(min_size=0, max_size=60).map(
                lambda b: b + b"\r\n\r\n trailing bytes"
            ),
        ),
        min_size=1,
        max_size=5,
    ),
    gz=st.booleans(),
)
def test_warc_roundtrip_property(recs, gz):
    """encode_warc -> parse_warc preserves record count, types and
    body lengths even when payloads embed CRLFCRLF (Content-Length
    framing, not delimiter scanning), in both layouts."""
    from spark_hive_spark.operators.warc import encode_warc, parse_warc

    records = [
        {"type": ty, "payload": body}
        for ty, body in [
            (t, b) for t, b in recs if t != "response"
        ]
        or [("metadata", b"x")]
    ]
    out = parse_warc(encode_warc(records, gzip_per_record=gz))
    assert [r["type"] for r in out] == [r["type"] for r in records]
    assert [r["body_len"] for r in out] == [
        len(r["payload"]) for r in records
    ]


_avro_name = st.text(
    alphabet=st.sampled_from("abcdefghij xyz_0123456789é中"),
    min_size=0,
    max_size=25,
)


@settings(max_examples=40, deadline=None)
@given(
    recs=st.lists(
        st.tuples(
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            _avro_name,
            st.integers(min_value=-(10**6), max_value=10**6).map(
                lambda q: q * 0.25  # exactly-representable doubles
            ),
        ),
        min_size=0,
        max_size=12,
    ),
    per_block=st.integers(min_value=1, max_value=5),
    codec=st.sampled_from(
        ["null", "deflate", "snappy", "bzip2", "xz", "zstandard"]
    ),
)
def test_avro_ocf_roundtrip_property(recs, per_block, codec):
    """encode_avro_ocf -> parse_avro_ocf is identity for arbitrary
    records (full-range longs, unicode strings, exact quarter-step
    doubles), any block size, under every implemented codec."""
    from spark_hive_spark.operators.avro import (
        encode_avro_ocf,
        parse_avro_ocf,
    )

    schema = {
        "type": "record",
        "name": "P",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
            {"name": "c", "type": "double"},
        ],
    }
    records = [{"a": a, "b": b, "c": c} for a, b, c in recs]
    blob = encode_avro_ocf(
        records, schema, records_per_block=per_block, codec=codec
    )
    got_schema, got = parse_avro_ocf(blob)
    assert got == records
    assert got_schema["name"] == "P"


@settings(max_examples=80, deadline=None)
@given(
    data=st.one_of(
        st.binary(min_size=0, max_size=400),
        # repetitive shapes exercise the copy emitter + overlap decode
        st.tuples(
            st.binary(min_size=1, max_size=12),
            st.integers(min_value=1, max_value=120),
        ).map(lambda t: t[0] * t[1]),
    )
)
def test_snappy_roundtrip_property(data):
    """snappy_compress -> snappy_decompress is identity for random
    and repetitive payloads (the latter drive the copy/overlap
    paths)."""
    from spark_hive_spark.operators.snappy import (
        snappy_compress,
        snappy_decompress,
    )

    assert snappy_decompress(snappy_compress(data)) == data


@settings(max_examples=80, deadline=None)
@given(
    data=st.one_of(
        st.binary(min_size=0, max_size=400),
        # repetitive shapes exercise the match emitter + overlap decode
        st.tuples(
            st.binary(min_size=1, max_size=12),
            st.integers(min_value=1, max_value=120),
        ).map(lambda t: t[0] * t[1]),
    )
)
def test_lz4_roundtrip_property(data):
    """lz4_block_compress -> lz4_block_decompress is identity, and
    pyarrow's reference codec accepts our blocks (cross-decode) —
    both for random and repetitive payloads."""
    import pyarrow as pa

    from spark_hive_spark.operators.lz4 import (
        lz4_block_compress,
        lz4_block_decompress,
    )

    blob = lz4_block_compress(data)
    if data:
        assert lz4_block_decompress(blob, len(data)) == data
        assert bytes(pa.Codec("lz4_raw").decompress(blob, len(data))) == data


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(
            st.integers(min_value=-(2**62), max_value=2**62),
            max_size=12,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_avro_array_field_roundtrip(arrays):
    """Avro array fields (block-count framing, 0 terminator) added in
    round 11 for Iceberg's equality_ids — roundtrip identity,
    including empty arrays (bare 0 terminator)."""
    from spark_hive_spark.operators.avro import (
        encode_avro_ocf,
        parse_avro_ocf,
    )

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "i", "type": "long"},
            {"name": "ids",
             "type": {"type": "array", "items": "long"}},
        ],
    }
    recs = [{"i": i, "ids": a} for i, a in enumerate(arrays)]
    _, got = parse_avro_ocf(encode_avro_ocf(recs, schema))
    assert got == recs


def test_avro_array_negative_block_count():
    """Spec: a negative block count means |count| items preceded by a
    byte-size varint — readers must accept it (writers here never
    emit it, but real Avro writers do for skippability)."""
    from spark_hive_spark.operators.avro import (
        _dec_field,
        _enc_field,
        encode_varint,
    )

    typ = {"type": "array", "items": "long"}
    items = [7, -3, 500]
    body = b"".join(_enc_field(v, "long") for v in items)
    blob = (
        encode_varint(-len(items))
        + encode_varint(len(body))
        + body
        + encode_varint(0)
    )
    got, pos = _dec_field(blob, 0, typ)
    assert got == items and pos == len(blob)


_NESTED_ELEM = st.one_of(st.none(), st.integers(-2**40, 2**40))
_INNER_LIST = st.one_of(
    st.none(), st.lists(_NESTED_ELEM, max_size=4)
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.one_of(st.none(), st.lists(_INNER_LIST, max_size=4)),
        min_size=1, max_size=120,
    ),
    page_size=st.sampled_from([256, 512, 2048]),
    rg_size=st.sampled_from([17, 40, 1000]),
)
def test_nested_list_assembly_property(rows, page_size, rg_size):
    """Property: the general Dremel assembler reproduces ANY
    list<list<int64>> structure pyarrow writes — every null/empty
    combination at both repetition levels, across page and row-group
    boundaries chosen adversarially small."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        decode_footer,
        read_nested_list_column_pages,
    )

    tbl = pa.table({"v": pa.array(rows, pa.list_(pa.list_(pa.int64())))})
    import io

    buf = io.BytesIO()
    pq.write_table(tbl, buf, use_dictionary=False, compression="NONE",
                   data_page_size=page_size, row_group_size=rg_size)
    data = buf.getvalue()
    fmd = decode_footer(data)
    (_, chain), = _leaf_repetitions(fmd[2]).items()
    got = []
    for rg in fmd[4]:
        got.extend(
            read_nested_list_column_pages(data, rg[1][0][3], chain)[0]
        )
    assert got == tbl["v"].to_pylist()


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    rows=st.lists(
        st.one_of(
            st.none(),
            st.dictionaries(
                st.text(min_size=1, max_size=5),
                st.one_of(st.none(), st.integers(-2**40, 2**40)),
                max_size=4,
            ),
        ),
        min_size=1, max_size=120,
    ),
    page_size=st.sampled_from([256, 1024]),
    rg_size=st.sampled_from([23, 1000]),
)
def test_map_assembly_property(rows, page_size, rg_size):
    """Property: the map zipper reproduces ANY map<string,int64>
    pyarrow writes — null maps, empty maps, null values, keys and
    values crossing page/row-group boundaries independently."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_hive_spark.sources.parquet_meta import (
        _leaf_repetitions,
        decode_footer,
        read_map_column_pages,
    )

    tbl = pa.table({"m": pa.array(
        [None if r is None else list(r.items()) for r in rows],
        pa.map_(pa.string(), pa.int64()),
    )})
    buf = io.BytesIO()
    pq.write_table(tbl, buf, use_dictionary=False, compression="NONE",
                   data_page_size=page_size, row_group_size=rg_size)
    data = buf.getvalue()
    fmd = decode_footer(data)
    reps = _leaf_repetitions(fmd[2])
    kp = next(p for p in reps if p.endswith(".key"))
    vp = next(p for p in reps if p.endswith(".value"))
    got = []
    for rg in fmd[4]:
        c = {".".join(x.decode() for x in cc[3][3]): cc[3]
             for cc in rg[1]}
        got.extend(read_map_column_pages(data, c[kp], c[vp],
                                         reps[kp], reps[vp])[0])
    assert got == [None if r is None else dict(r) for r in rows]


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    vals=st.lists(st.integers(-2**62, 2**62), min_size=1,
                  max_size=3000),
)
def test_rlev2_patched_base_roundtrip_property(vals):
    """Property: decode_rlev2 reproduces whatever pyarrow's ORC
    writer encodes for arbitrary int64 data — the PATCHED_BASE
    sub-encoding (incl. the non-aligned patch widths that bit the
    round-13 fix) appears whenever outliers ride a dense base."""
    import io

    import pyarrow as pa
    from pyarrow import orc as po

    from spark_hive_spark.sources.orc_meta import (
        read_orc_int64_column,
    )

    buf = io.BytesIO()
    po.write_table(
        pa.table({"v": pa.array(vals, pa.int64())}), buf,
        compression="uncompressed",
    )
    got, _ = read_orc_int64_column(buf.getvalue(), 1)
    assert got == vals


_AVRO_CPLX = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "status",
         "type": {"type": "enum", "name": "S",
                  "symbols": ["A", "B", "C", "D"]}},
        {"name": "sig",
         "type": {"type": "fixed", "name": "G", "size": 8}},
        {"name": "tags",
         "type": {"type": "map", "values": ["null", "long"]}},
        {"name": "inner",
         "type": {"type": "record", "name": "I", "fields": [
             {"name": "a", "type": "long"},
             {"name": "xs", "type": {"type": "array",
                                     "items": "string"}},
         ]}},
    ],
}

_cplx_record = st.fixed_dictionaries({
    "status": st.sampled_from(["A", "B", "C", "D"]),
    "sig": st.binary(min_size=8, max_size=8),
    "tags": st.dictionaries(
        st.text(min_size=0, max_size=8),
        st.one_of(st.none(), st.integers(-(2**62), 2**62)),
        max_size=5,
    ),
    "inner": st.fixed_dictionaries({
        "a": st.integers(-(2**62), 2**62),
        "xs": st.lists(st.text(max_size=6), max_size=4),
    }),
})


@settings(deadline=None, max_examples=60,
          suppress_health_check=[HealthCheck.too_slow])
@given(recs=st.lists(_cplx_record, max_size=12),
       codec=st.sampled_from(["null", "deflate", "snappy"]))
def test_avro_complex_types_roundtrip_property(recs, codec):
    """Property (round 15): arbitrary enum/fixed/map/union/nested
    record data round-trips byte-exact through the hand-built Avro
    codec under every spec codec."""
    from spark_hive_spark.operators.avro import (
        encode_avro_ocf,
        parse_avro_ocf,
    )

    _, back = parse_avro_ocf(
        encode_avro_ocf(recs, _AVRO_CPLX, codec=codec)
    )
    assert back == recs


@settings(deadline=None, max_examples=80)
@given(data=st.binary(max_size=4096))
def test_lz4_frame_roundtrip_property(data):
    """Property (round 15): the LZ4 frame writer (Puffin footer
    codec) round-trips arbitrary bytes through the frame decoder,
    checksums and all."""
    from spark_hive_spark.operators.lz4 import (
        lz4_frame_compress,
        lz4_frame_decompress,
    )

    assert lz4_frame_decompress(lz4_frame_compress(data)) == data


@settings(deadline=None, max_examples=80)
@given(
    a=st.tuples(st.integers(0, 2**29), st.integers(0, 2**32 - 1)),
    b=st.tuples(st.integers(0, 2**29), st.integers(0, 2**32 - 1)),
)
def test_replay_ord_is_order_isomorphic(a, b):
    """Property (round 15, ADVICE r14): the bit-packed replay ord
    preserves (version, line) lexicographic order exactly — no
    cross-version collisions at any commit size."""
    from spark_hive_spark.sources.evolution import _replay_ord

    assert (_replay_ord(*a) < _replay_ord(*b)) == (a < b)
    assert (_replay_ord(*a) == _replay_ord(*b)) == (a == b)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    cents=st.lists(st.integers(-10**15, 10**15), min_size=1,
                   max_size=2000),
)
def test_orc_decimal_varint_differential(cents):
    """Property: the decimal DATA (unbounded zigzag varints) +
    SECONDARY (scale) decode reproduces whatever pyarrow's ORC
    writer encodes for arbitrary decimal(18,2) data — negatives
    (zigzag sign), large magnitudes (multi-byte varints), and
    whatever per-value scale policy the writer applies (the Java
    writer normalizes trailing zeros; the decode must honor the
    scale STREAM either way, never the declared scale)."""
    import decimal
    import io

    import pyarrow as pa
    from pyarrow import orc as po

    from spark_hive_spark.sources.orc_meta import (
        _orc_file_tail,
        _unchunk,
        _unzigzag,
        _uvarint,
        decode_message,
        decode_rlev2,
    )

    vals = [decimal.Decimal(c).scaleb(-2) for c in cents]
    buf = io.BytesIO()
    po.write_table(
        pa.table({"d": pa.array(vals, pa.decimal128(18, 2))}), buf,
        compression="uncompressed",
    )
    data = buf.getvalue()
    footer, codec = _orc_file_tail(data)
    assert codec == 0
    got: list[int] = []
    for sraw in footer.get(3, []):
        stp = decode_message(sraw)
        off, ilen, dlen, flen = (
            stp[1][0], stp[2][0], stp[3][0], stp[4][0]
        )
        sfoot = decode_message(
            _unchunk(data[off + ilen + dlen
                          : off + ilen + dlen + flen], codec)
        )
        pos = off
        streams = {}
        for s in sfoot[1]:
            m = decode_message(s)
            streams[(m.get(2, [0])[0], m.get(1, [0])[0])] = \
                data[pos : pos + m[3][0]]
            pos += m[3][0]
        n = stp[5][0]
        d_data = streams[(1, 1)]
        p = 0
        unscaled = []
        for _ in range(n):
            u, p = _uvarint(d_data, p)
            unscaled.append(_unzigzag(u))
        scales = decode_rlev2(
            streams[(1, 5)], signed=True, max_values=n
        )[:n]
        assert all(s <= 2 for s in scales)
        got += [u * 10 ** (2 - s) for u, s in zip(unscaled, scales)]
    assert got == cents


# ---- round-18 codecs: HFile and theta sketches ----------------------

@settings(max_examples=40, deadline=None)
@given(
    cells=st.dictionaries(
        st.binary(min_size=1, max_size=40),
        st.binary(min_size=0, max_size=120),
        min_size=1,
        max_size=80,
    ),
    block_size=st.sampled_from([1, 64, 4096]),
    max_root=st.sampled_from([4, 128]),
    compression=st.sampled_from(["none", "gz"]),
)
def test_hfile_roundtrip_property(cells, block_size, max_root, compression):
    """Arbitrary binary cells survive the full HFile pipeline —
    every block size cut, one- and two-level indexes, both codecs —
    and point gets agree with the dict on hits AND misses."""
    from spark_hive_spark.sources.hfile import HFileReader, hfile_encode

    img = hfile_encode(
        cells, block_size=block_size, max_root_entries=max_root,
        compression=compression,
    )
    r = HFileReader(img)
    assert dict(r.scan()) == cells
    rows = sorted(cells)
    probe = rows[len(rows) // 2]
    assert r.get(probe) == cells[probe]
    assert r.get(probe + b"\x00~miss") is None
    lo, hi = rows[0], rows[-1]
    got = r.scan_range(lo, hi)  # stop is exclusive
    assert dict(got) == {k: cells[k] for k in rows[:-1]}


@settings(max_examples=40, deadline=None)
@given(
    values=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=0, max_size=400, unique=True,
    ),
    k=st.sampled_from([16, 64]),
    n_parts=st.integers(min_value=1, max_value=5),
)
def test_theta_union_equals_monolithic_property(values, k, n_parts):
    """For ANY value set and ANY split, the KMV theta union equals
    the monolithic sketch — serialization byte-identical — and the
    exact-mode estimate equals the true NDV."""
    from spark_hive_spark.sources.puffin import (
        _THETA_MAX,
        theta_estimate,
        theta_hash_long,
        theta_sketch_deserialize,
        theta_sketch_serialize,
        theta_union,
    )

    def _kmv(vs):
        hs = sorted({theta_hash_long(v) for v in vs})
        if len(hs) <= k:
            return hs, _THETA_MAX
        return hs[:k], hs[k]

    mono = _kmv(values)
    parts = [_kmv(values[i::n_parts]) for i in range(n_parts)]
    assert theta_union(parts, k=k) == mono
    img = theta_sketch_serialize(*mono)
    assert theta_sketch_deserialize(img) == mono
    if mono[1] == _THETA_MAX:
        assert theta_estimate(*mono) == len(set(values))


@settings(max_examples=60, deadline=None)
@given(n=st.integers(min_value=0, max_value=2**31 - 1))
def test_hadoop_vint_roundtrip_property(n):
    from spark_hive_spark.sources.hfile import (
        hadoop_vint,
        hadoop_vint_read,
    )

    enc = hadoop_vint(n)
    assert hadoop_vint_read(enc + b"\xff", 0) == (n, len(enc))
