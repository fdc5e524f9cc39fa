"""Iceberg v3 default values + row lineage (sources/iceberg_v3.py,
round 15): the default-fill select resolves by FIELD ID, fills
initial-default (never write-default) for absent fields, nulls
fields with no default, and stays loud on required-without-default
and complex types."""

from __future__ import annotations

import pytest

from spark_hive_spark.sources.iceberg_v3 import (
    iceberg_default_fill_select,
)

FIELDS = [
    {"id": 1, "name": "k", "required": True, "type": "long"},
    {"id": 3, "name": "region", "required": False, "type": "string",
     "initial-default": "UNASSIGNED", "write-default": "R0"},
    {"id": 4, "name": "note", "required": False, "type": "string"},
]


def test_fill_expressions_build_one_per_field(spark):
    exprs = iceberg_default_fill_select(FIELDS, {"phys-k": 1})
    assert len(exprs) == len(FIELDS)


def test_required_missing_without_default_is_loud():
    with pytest.raises(ValueError, match="required field 'k'"):
        iceberg_default_fill_select(FIELDS, {"other": 9})


def test_complex_type_is_loud():
    nested = [{"id": 1, "name": "s", "required": False,
               "type": {"type": "struct", "fields": []}}]
    with pytest.raises(NotImplementedError, match="default-value"):
        iceberg_default_fill_select(nested, {})


def test_fill_values_end_to_end(spark):
    """Over a real scan: id-resolved rename, initial-default fill for
    an absent field (NOT the write-default), null for a defaultless
    absent field."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    import os
    import tempfile
    import uuid

    path = os.path.join(
        tempfile.gettempdir(), f"shs_icev3t_{uuid.uuid4().hex}.parquet"
    )
    tbl = pa.table(
        {"phys-k": pa.array([7, 8], pa.int64())},
        schema=pa.schema([pa.field(
            "phys-k", pa.int64(),
            metadata={b"PARQUET:field_id": b"1"},
        )]),
    )
    pq.write_table(tbl, path)
    try:
        exprs = iceberg_default_fill_select(FIELDS, {"phys-k": 1})
        rows = (
            spark.read.parquet(path).select(*exprs)
            .orderBy("k").collect()
        )
        assert [r["k"] for r in rows] == [7, 8]
        assert {r["region"] for r in rows} == {"UNASSIGNED"}
        assert {r["note"] for r in rows} == {None}
    finally:
        os.remove(path)


def test_format_gate_accepts_declared_features():
    from spark_hive_spark.sources.evolution import iceberg_format_gate

    md = {
        "format-version": 3,
        "row-lineage": True,
        "next-row-id": 10,
        "schemas": [{"schema-id": 1, "fields": [
            {"id": 3, "name": "r", "type": "string",
             "initial-default": "x"},
        ]}],
    }
    with pytest.raises(NotImplementedError, match="row lineage"):
        iceberg_format_gate(md, supported=frozenset({"default-values"}))
    with pytest.raises(NotImplementedError, match="default value"):
        iceberg_format_gate(md, supported=frozenset({"row-lineage"}))
    iceberg_format_gate(
        md, supported=frozenset({"row-lineage", "default-values"})
    )


def test_format_gate_finds_nested_defaults():
    """ADVICE r15: initial-default/write-default on a field NESTED
    inside a struct / list element / map value must trip the gate,
    not silently pass it."""
    from spark_hive_spark.sources.evolution import iceberg_format_gate

    def md_for(type_node):
        return {"format-version": 3,
                "schemas": [{"schema-id": 1, "fields": [
                    {"id": 1, "name": "outer", "type": type_node},
                ]}]}

    deep_field = {"id": 9, "name": "nested", "type": "string",
                  "write-default": "x"}
    cases = [
        {"type": "struct", "fields": [deep_field]},
        {"type": "list", "element-id": 5,
         "element": {"type": "struct", "fields": [deep_field]}},
        {"type": "map", "key-id": 6, "key": "string", "value-id": 7,
         "value": {"type": "struct", "fields": [deep_field]}},
    ]
    for type_node in cases:
        with pytest.raises(NotImplementedError, match="default value"):
            iceberg_format_gate(md_for(type_node))
        iceberg_format_gate(
            md_for(type_node), supported=frozenset({"default-values"})
        )
    # no-default nested schema still passes with nothing declared
    iceberg_format_gate(md_for({"type": "struct", "fields": [
        {"id": 9, "name": "nested", "type": "string"}]}))


def test_name_mapping_gate_and_resolver(spark):
    """Name mapping (round 16): ids take precedence (gate is loud),
    aliases resolve in order, required-missing is loud, unmapped
    physical columns are counted as ignored."""
    from pyspark.sql import functions as F

    from spark_hive_spark.sources.evolution import (
        iceberg_name_mapping_gate,
        iceberg_name_mapping_select,
    )

    iceberg_name_mapping_gate({"a": None, "b": None})
    with pytest.raises(NotImplementedError, match="ids take precedence"):
        iceberg_name_mapping_gate({"a": 1, "b": None})

    df = spark.createDataFrame(
        [(1, 2.0, "x")], "col_a long, col_b double, junk string"
    )
    fields = [
        {"id": 1, "name": "col_b", "required": True, "type": "long"},
        {"id": 2, "name": "col_a", "required": True, "type": "double"},
        {"id": 6, "name": "bonus", "required": False, "type": "double"},
    ]
    mapping = [
        {"field-id": 1, "names": ["col_a", "k2"]},
        {"field-id": 2, "names": ["col_b", "p2"]},
        {"field-id": 6, "names": ["missing_col"]},
    ]
    exprs, nulls, ignored = iceberg_name_mapping_select(
        mapping, fields, df.schema
    )
    row = df.select(*exprs).collect()[0]
    # crosswise rename: physical col_a (the long) is schema col_b
    assert row["col_b"] == 1 and row["col_a"] == 2.0
    assert row["bonus"] is None and nulls == 1 and ignored == 1

    req = [{"id": 9, "name": "must", "required": True, "type": "long"}]
    with pytest.raises(ValueError, match="required field 'must'"):
        iceberg_name_mapping_select(
            [{"field-id": 9, "names": ["nope"]}], req, df.schema
        )
    with pytest.raises(NotImplementedError, match="primitive 'uuid'"):
        iceberg_name_mapping_select(
            [{"field-id": 9, "names": ["col_a"]}],
            [{"id": 9, "name": "u", "required": False, "type": "uuid"}],
            df.schema,
        )


def test_iceberg_appends_between_rules():
    """Incremental append planning: parent-chain walk (not list
    order), replace skipped, overwrite/delete loud, non-ancestor
    bounds loud."""
    from spark_hive_spark.sources.evolution import (
        iceberg_appends_between,
    )

    def snap(sid, parent=None, op="append"):
        s = {"snapshot-id": sid, "summary": {"operation": op}}
        if parent is not None:
            s["parent-snapshot-id"] = parent
        return s

    md = {"snapshots": [
        snap(1), snap(2, 1), snap(3, 2, "replace"), snap(4, 3),
        snap(5, 4, "overwrite"), snap(9, 1),  # 9: abandoned branch
    ]}
    assert iceberg_appends_between(md, 1, 4) == ([2, 4], 1)
    assert iceberg_appends_between(md, 2, 4) == ([4], 1)
    assert iceberg_appends_between(md, 3, 4) == ([4], 0)
    with pytest.raises(NotImplementedError, match="'overwrite'"):
        iceberg_appends_between(md, 1, 5)
    with pytest.raises(ValueError, match="not an ancestor"):
        iceberg_appends_between(md, 9, 4)  # other branch
    with pytest.raises(ValueError, match="not in the snapshot"):
        iceberg_appends_between(md, 7, 4)


def test_iceberg_changelog_between_rules():
    """Changelog planning (round 17): survives delete/overwrite
    (emitting them as change events), replace contributes nothing
    AND consumes no ordinal, unknown operations and non-ancestor
    bounds stay loud."""
    from spark_hive_spark.sources.evolution import (
        iceberg_changelog_between,
    )

    def snap(sid, parent=None, op="append"):
        s = {"snapshot-id": sid, "summary": {"operation": op}}
        if parent is not None:
            s["parent-snapshot-id"] = parent
        return s

    md = {"snapshots": [
        snap(1), snap(2, 1), snap(3, 2, "replace"),
        snap(4, 3, "delete"), snap(5, 4, "overwrite"),
        snap(9, 1),  # abandoned branch
    ]}
    # ordinals stay dense across the skipped replace
    assert iceberg_changelog_between(md, 1, 5) == (
        [(0, 2, "append"), (1, 4, "delete"), (2, 5, "overwrite")], 1
    )
    assert iceberg_changelog_between(md, 2, 4) == (
        [(0, 4, "delete")], 1
    )
    assert iceberg_changelog_between(md, 3, 3) == ([], 0)
    with pytest.raises(NotImplementedError, match="'expire'"):
        iceberg_changelog_between(
            {"snapshots": [snap(1), snap(2, 1, "expire")]}, 1, 2
        )
    with pytest.raises(ValueError, match="not an ancestor"):
        iceberg_changelog_between(md, 9, 4)
    with pytest.raises(ValueError, match="not in the snapshot"):
        iceberg_changelog_between(md, 7, 4)


def test_file_bounds_prune_rules():
    """Bounds decode little-endian (not memcmp); all-null prunes via
    counts; unknown stats must scan."""
    from spark_hive_spark.sources.evolution import (
        iceberg_file_bounds_prune,
    )

    def e(lo=None, hi=None, nulls=None, count=100):
        ent = {"record_count": count, "lower_bounds": {},
               "upper_bounds": {}, "null_value_counts": {}}
        if lo is not None:
            ent["lower_bounds"]["1"] = lo.to_bytes(8, "little",
                                                   signed=True)
            ent["upper_bounds"]["1"] = hi.to_bytes(8, "little",
                                                   signed=True)
        if nulls is not None:
            ent["null_value_counts"]["1"] = nulls
        return ent

    # numeric overlap decides, not byte order: file [200, 300] vs
    # predicate [256, 280] — LE bytes of 200 sort ABOVE those of 256
    assert not iceberg_file_bounds_prune(e(200, 300), "1", 256, 280)
    assert iceberg_file_bounds_prune(e(200, 255), "1", 256, 280)
    assert iceberg_file_bounds_prune(e(281, 500), "1", 256, 280)
    assert not iceberg_file_bounds_prune(e(-50, 500), "1", 0, 1)
    # negative bounds decode signed
    assert iceberg_file_bounds_prune(e(-500, -100), "1", 0, 10)
    # all-null: prunable only when counts prove it
    assert iceberg_file_bounds_prune(e(nulls=100, count=100), "1", 0, 9)
    assert not iceberg_file_bounds_prune(e(nulls=99, count=100),
                                         "1", 0, 9)
    assert not iceberg_file_bounds_prune(e(), "1", 0, 9)  # unknown


def test_string_bounds_truncation_rules():
    """truncate(16): lower may be a plain prefix; upper must
    increment its last code point (with carry); all-maximal uppers
    are loud; the byte comparison prunes conservatively."""
    from spark_hive_spark.sources.evolution import (
        iceberg_string_bounds_prune,
        iceberg_truncate_bounds,
    )

    lo, up = iceberg_truncate_bounds("abc", "xyz")
    assert (lo, up) == (b"abc", b"xyz")  # short: exact
    lo, up = iceberg_truncate_bounds("a" * 20, "Z" * 20)
    assert lo == b"a" * 16  # prefix <= min
    assert up == b"Z" * 15 + b"["  # incremented, >= every Z* value
    # carry: last char at the max code point increments the previous
    lo, up = iceberg_truncate_bounds("a", "ab" + chr(0x10FFFF) * 20)
    assert up == "ab".encode()[:1] + b"c" or up == b"ac"
    import pytest

    with pytest.raises(NotImplementedError, match="all-maximal"):
        iceberg_truncate_bounds("a", chr(0x10FFFF) * 20)

    # surrogate skip: U+D7FF + 1 would be the lone surrogate U+D800
    # (not encodable — a naive increment crashes in .encode()); the
    # spec-faithful increment jumps to U+E000, still >= every valid
    # string under the prefix
    _, up = iceberg_truncate_bounds(
        "a", "b" * 15 + chr(0xD7FF) + "zz"
    )
    assert up == ("b" * 15 + chr(0xE000)).encode()

    def e(mn, mx):
        lo_b, up_b = iceberg_truncate_bounds(mn, mx)
        return {"lower_bounds": {"2": lo_b},
                "upper_bounds": {"2": up_b}}

    # the data-loss trap: file of Z*16-prefixed strings vs a
    # predicate above Z*16 — correct bounds keep it
    zf = e("Z" * 16 + "-000", "Z" * 16 + "-999")
    assert not iceberg_string_bounds_prune(
        zf, "2", "Z" * 16 + "-100", "Z" * 16 + "-200")
    # naive truncation (upper = Z*16, no increment) would prune it
    naive = dict(zf)
    naive["upper_bounds"] = {"2": b"Z" * 16}
    assert iceberg_string_bounds_prune(
        naive, "2", "Z" * 16 + "-100", "Z" * 16 + "-200")
    # disjoint file prunes; unknown stats must scan
    assert iceberg_string_bounds_prune(
        e("A-0", "A-9"), "2", "B", "C")
    assert not iceberg_string_bounds_prune({}, "2", "B", "C")


def test_inherit_first_row_ids_rules():
    """Spec §Row Lineage inheritance (round 19): null entries take
    manifest.first_row_id plus PRIOR null record counts; explicit
    values pass through without advancing the cursor; a null entry
    under a null manifest first-row-id is loud."""
    from spark_hive_spark.sources.iceberg_v3 import (
        inherit_first_row_ids,
    )

    ents = [
        {"first_row_id": None, "record_count": 10},
        {"first_row_id": 500, "record_count": 7},  # carried forward
        {"first_row_id": None, "record_count": 5},
    ]
    out, inherited = inherit_first_row_ids(100, ents)
    assert [e["first_row_id"] for e in out] == [100, 500, 110]
    assert inherited == 2
    # explicit-only manifests tolerate a null manifest first-row-id
    out, inherited = inherit_first_row_ids(
        None, [{"first_row_id": 3, "record_count": 4}]
    )
    assert inherited == 0 and out[0]["first_row_id"] == 3
    with pytest.raises(ValueError, match="no first-row-id"):
        inherit_first_row_ids(
            None, [{"first_row_id": None, "record_count": 1}]
        )
    # inputs are never mutated (entries are shared manifest rows)
    assert ents[0]["first_row_id"] is None


def test_partition_stats_evolution_arrow_off(spark):
    """The evolved-spec stats writer must not depend on the session's
    Arrow conversion: part_year/part_month are int-or-None, and a
    pandas round-trip coerces them to float64, which the non-Arrow
    createDataFrame path rejects against bigint (round-19 driver
    failure). Pin the query green with Arrow conversion disabled."""
    from spark_hive_spark.sources.iceberg_v3 import (
        source_iceberg_partition_stats_evolution,
    )
    from tests.conftest import SF_SMOKE

    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        rows = source_iceberg_partition_stats_evolution(
            spark, SF_SMOKE
        ).collect()
    finally:
        spark.conf.set(key, prev)
    assert rows
    assert all(
        r["counts_ok"] and r["unified_tuple_ok"] and r["registry_ok"]
        for r in rows
    )
    # both specs present, each row null in exactly the other field
    specs = {r["spec_id"] for r in rows}
    assert specs == {0, 1}
