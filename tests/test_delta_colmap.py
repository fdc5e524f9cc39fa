"""Unit tests for Delta column-mapping resolution
(sources/evolution.py delta_column_mapping): name mode resolves,
id mode / nested mapped fields / missing physicalName are loud."""

from __future__ import annotations

import json

import pytest

from spark_hive_spark.sources.evolution import (
    delta_column_mapping,
    delta_column_mapping_by_id,
)


def _meta(mode: str | None, fields: list[dict]) -> dict:
    conf = {} if mode is None else {"delta.columnMapping.mode": mode}
    return {
        "configuration": conf,
        "schemaString": json.dumps({"type": "struct", "fields": fields}),
    }


def _field(name: str, phys: str | None, ty="long") -> dict:
    md = {} if phys is None else {
        "delta.columnMapping.id": 1,
        "delta.columnMapping.physicalName": phys,
    }
    return {"name": name, "type": ty, "nullable": True, "metadata": md}


def test_name_mode_resolves():
    m = delta_column_mapping(_meta("name", [
        _field("a", "col-x"), _field("b", "col-y", "string"),
    ]))
    assert m == {"col-x": "a", "col-y": "b"}


def test_no_mapping_returns_none():
    assert delta_column_mapping(_meta(None, [_field("a", None)])) is None
    assert delta_column_mapping(_meta("none", [_field("a", None)])) is None


def test_id_mode_routes_through_unified_entry():
    """Round 18 (r17 verdict item 6): the unified entry dispatches
    id-mode tables to the field-id resolver instead of raising —
    the key type (int vs str) tells the caller the regime."""
    fields = [
        {"name": "a", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "col-x"}},
        {"name": "b", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-y"}},
    ]
    m = delta_column_mapping(_meta("id", fields))
    assert m == {1: "a", 2: "b"}
    assert m == delta_column_mapping_by_id(_meta("id", fields))


def test_unknown_mode_is_loud():
    with pytest.raises(NotImplementedError, match="mode 'zorp'"):
        delta_column_mapping(_meta("zorp", [_field("a", "col-x")]))


def test_missing_physical_name_is_loud():
    with pytest.raises(ValueError, match="physicalName"):
        delta_column_mapping(_meta("name", [_field("a", None)]))


def test_duplicate_physical_name_is_loud():
    with pytest.raises(ValueError, match="duplicate"):
        delta_column_mapping(_meta("name", [
            _field("a", "col-x"), _field("b", "col-x"),
        ]))


def _nested(name: str, phys: str, children: list[dict],
            fid: int = 9) -> dict:
    return {
        "name": name,
        "type": {"type": "struct", "fields": children},
        "nullable": True,
        "metadata": {"delta.columnMapping.id": fid,
                     "delta.columnMapping.physicalName": phys},
    }


def test_struct_nested_name_mode_resolves_recursively():
    """Round 14: struct-nested mapped fields resolve at every level,
    keyed by dotted physical path."""
    child = _field("price", "col-p", "double")
    m = delta_column_mapping(_meta("name", [
        _field("a", "col-x"),
        _nested("detail", "col-d", [child]),
    ]))
    assert m == {"col-x": "a", "col-d": "detail",
                 "col-d.col-p": "detail.price"}


def test_struct_nested_id_mode_resolves_dotted_paths():
    from spark_hive_spark.sources.evolution import (
        delta_column_mapping_by_id,
    )

    child = dict(_field("price", "col-p", "double"))
    child["metadata"] = {"delta.columnMapping.id": 3,
                         "delta.columnMapping.physicalName": "col-p"}
    top = dict(_field("a", "col-x"))
    top["metadata"] = {"delta.columnMapping.id": 1,
                       "delta.columnMapping.physicalName": "col-x"}
    m = delta_column_mapping_by_id(
        _meta("id", [top, _nested("detail", "col-d", [child], fid=2)])
    )
    # LEAF ids only (round 15, ADVICE r14): the struct node's id 2
    # never appears in parquet leaf_field_ids, so including it made
    # the reader's coverage check fire spuriously on nested tables
    assert m == {1: "a", 3: "detail.price"}


def test_duplicate_id_across_node_and_leaf_is_loud():
    from spark_hive_spark.sources.evolution import (
        delta_column_mapping_by_id,
    )

    child = dict(_field("price", "col-p", "double"))
    child["metadata"] = {"delta.columnMapping.id": 2,
                         "delta.columnMapping.physicalName": "col-p"}
    with pytest.raises(ValueError, match="duplicate"):
        delta_column_mapping_by_id(
            _meta("id", [_nested("detail", "col-d", [child], fid=2)])
        )


def _arr(name: str, phys: str, element, fid: int = 5) -> dict:
    return {
        "name": name,
        "type": {"type": "array", "elementType": element,
                 "containsNull": True},
        "nullable": True,
        "metadata": {"delta.columnMapping.id": fid,
                     "delta.columnMapping.physicalName": phys},
    }


def test_array_nested_name_mode_resolves_through_element():
    """Round 15: struct fields inside array elements resolve through
    the synthetic `.element.` segment; primitive arrays map only the
    top-level field."""
    child = _field("qty", "col-q", "double")
    m = delta_column_mapping(_meta("name", [
        _arr("xs", "col-xs", "long"),
        _arr("lines", "col-l",
             {"type": "struct", "fields": [child]}, fid=6),
    ]))
    assert m == {"col-xs": "xs", "col-l": "lines",
                 "col-l.element.col-q": "lines.element.qty"}


def test_map_nested_name_mode_resolves_through_value():
    child = _field("score", "col-s", "long")
    mp = {
        "name": "props",
        "type": {"type": "map", "keyType": "string",
                 "valueType": {"type": "struct", "fields": [child]},
                 "valueContainsNull": True},
        "nullable": True,
        "metadata": {"delta.columnMapping.id": 7,
                     "delta.columnMapping.physicalName": "col-m"},
    }
    m = delta_column_mapping(_meta("name", [mp]))
    assert m == {"col-m": "props",
                 "col-m.value.col-s": "props.value.score"}


def test_struct_typed_map_key_resolves_through_key():
    """Round 16 (r15 verdict #8): key-struct fields map through the
    synthetic `.key` segment, symmetric with `.value`."""
    child = _field("bucket", "col-b", "long")
    mp = {
        "name": "props",
        "type": {"type": "map",
                 "keyType": {"type": "struct", "fields": [child]},
                 "valueType": "long", "valueContainsNull": True},
        "nullable": True,
        "metadata": {"delta.columnMapping.id": 7,
                     "delta.columnMapping.physicalName": "col-m"},
    }
    m = delta_column_mapping(_meta("name", [mp]))
    assert m == {"col-m": "props",
                 "col-m.key.col-b": "props.key.bucket"}


def test_array_nested_id_mode_resolves_leaves_only():
    """Round 15: id mode resolves struct fields inside array elements
    through the synthetic segments; container ids and primitive
    elements (no Delta ids of their own) stay out of the leaf map."""
    from spark_hive_spark.sources.evolution import (
        delta_column_mapping_by_id,
    )

    child = dict(_field("qty", "col-q", "double"))
    child["metadata"] = {"delta.columnMapping.id": 6,
                         "delta.columnMapping.physicalName": "col-q"}
    prim = _arr("xs", "col-xs", "long")
    prim["metadata"] = {"delta.columnMapping.id": 5,
                        "delta.columnMapping.physicalName": "col-xs"}
    lines = _arr("lines", "col-l",
                 {"type": "struct", "fields": [child]}, fid=7)
    m = delta_column_mapping_by_id(_meta("id", [prim, lines]))
    assert m == {6: "lines.element.qty"}


def test_map_struct_key_id_mode_resolves_through_key():
    from spark_hive_spark.sources.evolution import (
        delta_column_mapping_by_id,
    )

    child = dict(_field("bucket", "col-b", "long"))
    child["metadata"] = {"delta.columnMapping.id": 8,
                         "delta.columnMapping.physicalName": "col-b"}
    mp = {
        "name": "props",
        "type": {"type": "map",
                 "keyType": {"type": "struct", "fields": [child]},
                 "valueType": "long", "valueContainsNull": True},
        "nullable": True,
        "metadata": {"delta.columnMapping.id": 7,
                     "delta.columnMapping.physicalName": "col-m"},
    }
    assert delta_column_mapping_by_id(_meta("id", [mp])) \
        == {8: "props.key.bucket"}


def test_nested_child_missing_physical_name_is_loud():
    bad_child = _field("price", None, "double")
    with pytest.raises(ValueError, match="physicalName"):
        delta_column_mapping(_meta("name", [
            _nested("detail", "col-d", [bad_child]),
        ]))


def test_delta_mapped_select_rebuilds_struct(spark, tmp_path):
    """The rebuild expressions restore the logical tree over a
    physically-named scan, including the name-collision trap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_hive_spark.sources.evolution import delta_mapped_select

    detail = pa.StructArray.from_arrays(
        [pa.array([1.5, 2.5]), pa.array(["hi", "lo"])],
        fields=[pa.field("o_orderkey", pa.float64()),
                pa.field("p-9", pa.string())],
    )
    tbl = pa.table({"k-1": pa.array([10, 11], pa.int64()),
                    "o_totalprice": detail})
    path = str(tmp_path / "phys.parquet")
    pq.write_table(tbl, path)

    child_p = dict(_field("price", "o_orderkey", "double"))
    child_q = dict(_field("prio", "p-9", "string"))
    meta = _meta("name", [
        _field("o_orderkey", "k-1"),
        _nested("detail", "o_totalprice", [child_p, child_q]),
    ])
    df = spark.read.parquet(path).select(*delta_mapped_select(meta))
    rows = {r["o_orderkey"]: r for r in df.collect()}
    assert rows[10]["detail"]["price"] == 1.5
    assert rows[11]["detail"]["prio"] == "lo"


def test_v2_checkpoint_top_row_classification():
    """Round 15: inline add/remove rows are recognized kinds (the
    readers keep them spark-side); only unknown/all-null rows stay
    loud."""
    import pytest as _pytest

    from spark_hive_spark.sources.evolution import _v2_classify_top_row

    assert _v2_classify_top_row(
        {"checkpointMetadata": {"version": 2}, "sidecar": None}
    ) == ("checkpointMetadata", {"version": 2})
    assert _v2_classify_top_row(
        {"checkpointMetadata": None, "sidecar": {"path": "s.parquet"}}
    ) == ("sidecar", {"path": "s.parquet"})
    assert _v2_classify_top_row(
        {"checkpointMetadata": None, "add": {"path": "part-x.parquet"}}
    ) == ("add", {"path": "part-x.parquet"})
    assert _v2_classify_top_row(
        {"remove": {"path": "part-x.parquet"}}
    ) == ("remove", {"path": "part-x.parquet"})
    with _pytest.raises(NotImplementedError, match="all-null"):
        _v2_classify_top_row({"checkpointMetadata": None, "add": None})
    with _pytest.raises(NotImplementedError, match="txn"):
        _v2_classify_top_row({"txn": {"appId": "x"}})


def test_id_mode_resolves_by_field_id():
    from spark_hive_spark.sources.evolution import (
        delta_column_mapping_by_id,
    )

    def _f(name, fid, ty="long"):
        return {"name": name, "type": ty, "nullable": True,
                "metadata": {"delta.columnMapping.id": fid,
                             "delta.columnMapping.physicalName":
                                 f"col-{fid}"}}

    m = delta_column_mapping_by_id(_meta("id", [
        _f("a", 1), _f("b", 7, "string"),
    ]))
    assert m == {1: "a", 7: "b"}

    with pytest.raises(ValueError, match="not an id-mode"):
        delta_column_mapping_by_id(_meta("name", [_f("a", 1)]))
    with pytest.raises(ValueError, match="duplicate column mapping id"):
        delta_column_mapping_by_id(_meta("id", [_f("a", 1), _f("b", 1)]))
    with pytest.raises(ValueError, match="missing columnMapping.id"):
        delta_column_mapping_by_id(_meta("id", [
            {"name": "a", "type": "long", "nullable": True,
             "metadata": {}}]))
    # round 15: map nesting resolves too (primitive values carry no
    # Delta ids — the container id only enters the dup check); an
    # UNKNOWN nested shape stays loud
    nested = {"name": "s",
              "type": {"type": "map", "keyType": "string",
                       "valueType": "long",
                       "valueContainsNull": True},
              "nullable": True,
              "metadata": {"delta.columnMapping.id": 2}}
    assert delta_column_mapping_by_id(
        _meta("id", [_f("a", 1), nested])
    ) == {1: "a"}
    weird = {"name": "u",
             "type": {"type": "udt", "pyClass": "x"},
             "nullable": True,
             "metadata": {"delta.columnMapping.id": 3}}
    with pytest.raises(NotImplementedError, match="unsupported type"):
        delta_column_mapping_by_id(_meta("id", [weird]))


def test_leaf_field_ids_walker(tmp_path):
    """leaf_field_ids reads SchemaElement field 9 (and None when the
    writer recorded no ids)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_hive_spark.sources.parquet_meta import (
        decode_footer,
        leaf_field_ids,
    )

    tbl = pa.table(
        {"p": pa.array([1, 2], pa.int64()),
         "q": pa.array(["x", "y"])},
        schema=pa.schema([
            pa.field("p", pa.int64(),
                     metadata={b"PARQUET:field_id": b"4"}),
            pa.field("q", pa.string(),
                     metadata={b"PARQUET:field_id": b"9"}),
        ]),
    )
    path = str(tmp_path / "fid.parquet")
    pq.write_table(tbl, path)
    with open(path, "rb") as fh:
        foot = decode_footer(fh.read())
    assert leaf_field_ids(foot[2]) == {"p": 4, "q": 9}

    plain = pa.table({"x": pa.array([1], pa.int64())})
    path2 = str(tmp_path / "plain.parquet")
    pq.write_table(plain, path2)
    with open(path2, "rb") as fh:
        foot2 = decode_footer(fh.read())
    assert leaf_field_ids(foot2[2]) == {"x": None}


def test_iceberg_entry_content_gate():
    """ADVICE r14: data-only Iceberg readers must reject delete
    manifest entries by NAME (DV = content 1 + PUFFIN/referenced
    file), not die later inside a parquet scan of a Puffin blob."""
    import pytest

    from spark_hive_spark.sources.evolution import (
        iceberg_entry_content_gate,
    )

    # v1 manifests carry no content field: data by definition
    iceberg_entry_content_gate({"status": 1, "file_path": "a.parquet"})
    iceberg_entry_content_gate({"content": 0, "file_path": "a.parquet"})
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        iceberg_entry_content_gate(
            {"content": 1, "file_format": "PUFFIN",
             "file_path": "dv.puffin"}
        )
    with pytest.raises(NotImplementedError, match="deletion vectors"):
        iceberg_entry_content_gate(
            {"content": 1, "referenced_data_file": "a.parquet",
             "file_path": "dv.puffin"}
        )
    with pytest.raises(NotImplementedError, match="content=1"):
        iceberg_entry_content_gate(
            {"content": 1, "file_format": "PARQUET",
             "file_path": "pos-del.parquet"}
        )


def test_mapped_select_by_id_error_paths():
    from spark_hive_spark.sources.evolution import (
        delta_mapped_select_by_id,
    )

    top = dict(_field("a", "col-x"))
    top["metadata"] = {"delta.columnMapping.id": 1,
                       "delta.columnMapping.physicalName": "col-x"}
    meta = _meta("id", [top])
    # file lacking the mapped id is loud
    with pytest.raises(ValueError, match="missing mapped field id 1"):
        delta_mapped_select_by_id(meta, {"col-y": 2})
    # a file carrying the same id twice is loud
    with pytest.raises(ValueError, match="duplicate field id"):
        delta_mapped_select_by_id(meta, {"col-x": 1, "col-y": 1})
    # happy path builds one expression per top-level logical field
    assert len(delta_mapped_select_by_id(meta, {"col-x": 1})) == 1


def test_mapped_select_rebuilds_struct_map_keys(spark):
    """Round 16 end-to-end (both modes): a map with struct-typed keys
    rebuilds key-struct field names; values and pairing survive."""
    import json

    from pyspark.sql import functions as F

    from spark_hive_spark.sources.evolution import (
        delta_mapped_select,
        delta_mapped_select_by_id,
    )

    df = spark.createDataFrame(
        [(1, {(10, "x"): 2.5})],
        "`k-1` long, `col-m` map<struct<`col-b`:long,`col-t`:string>,"
        " double>",
    )
    child_b = {"name": "bucket", "type": "long", "nullable": True,
               "metadata": {"delta.columnMapping.id": 3,
                            "delta.columnMapping.physicalName": "col-b"}}
    child_t = {"name": "label", "type": "string", "nullable": True,
               "metadata": {"delta.columnMapping.id": 4,
                            "delta.columnMapping.physicalName": "col-t"}}
    fields = [
        {"name": "o_orderkey", "type": "long", "nullable": True,
         "metadata": {"delta.columnMapping.id": 1,
                      "delta.columnMapping.physicalName": "k-1"}},
        {"name": "props", "nullable": True,
         "metadata": {"delta.columnMapping.id": 2,
                      "delta.columnMapping.physicalName": "col-m"},
         "type": {"type": "map",
                  "keyType": {"type": "struct",
                              "fields": [child_b, child_t]},
                  "valueType": "double", "valueContainsNull": True}},
    ]
    meta = {
        "configuration": {"delta.columnMapping.mode": "name"},
        "schemaString": json.dumps(
            {"type": "struct", "fields": fields}
        ),
    }
    for exprs in (
        delta_mapped_select(meta),
        delta_mapped_select_by_id(
            {**meta, "configuration":
             {"delta.columnMapping.mode": "id"}},
            {"k-1": 1, "col-m": 2,
             "col-m.key_value.key.col-b": 3,
             "col-m.key_value.key.col-t": 4},
        ),
    ):
        row = (
            df.select(*exprs)
            .select(F.explode("props").alias("key", "val"))
            .collect()[0]
        )
        assert row["key"]["bucket"] == 10
        assert row["key"]["label"] == "x"
        assert row["val"] == 2.5


def test_name_mode_only_wrapper_is_loud_on_id_mode():
    """r18 advice: the four name-mode readers consume the mapping as a
    {str physical: str logical} rename map — an id-mode table reaching
    them must stay a loud seam, not silently rename nothing."""
    from spark_hive_spark.sources.evolution import (
        delta_column_mapping_names,
    )

    fields = [_field("a", "col-1")]
    m = delta_column_mapping_names(_meta("name", fields))
    assert set(m) and all(isinstance(k, str) for k in m)
    assert delta_column_mapping_names(_meta(None, fields)) is None
    with pytest.raises(NotImplementedError, match="id-mode"):
        delta_column_mapping_names(_meta("id", fields))
