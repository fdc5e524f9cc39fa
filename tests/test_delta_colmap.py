"""Unit tests for Delta column-mapping resolution
(sources/evolution.py delta_column_mapping): name mode resolves,
id mode / nested mapped fields / missing physicalName are loud."""

from __future__ import annotations

import json

import pytest

from spark_hive_spark.sources.evolution import delta_column_mapping


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


def test_id_mode_is_loud():
    with pytest.raises(NotImplementedError, match="mode 'id'"):
        delta_column_mapping(_meta("id", [_field("a", "col-x")]))


def test_missing_physical_name_is_loud():
    with pytest.raises(ValueError, match="physicalName"):
        delta_column_mapping(_meta("name", [_field("a", None)]))


def test_duplicate_physical_name_is_loud():
    with pytest.raises(ValueError, match="duplicate"):
        delta_column_mapping(_meta("name", [
            _field("a", "col-x"), _field("b", "col-x"),
        ]))


def test_nested_mapped_field_is_loud():
    nested = {
        "name": "s",
        "type": {"type": "struct", "fields": []},
        "nullable": True,
        "metadata": {"delta.columnMapping.physicalName": "col-s"},
    }
    with pytest.raises(NotImplementedError, match="nested"):
        delta_column_mapping(_meta("name", [nested]))


def test_v2_checkpoint_inline_actions_are_loud():
    """Top-level v2-checkpoint rows carrying inline add/remove file
    actions (a layout the protocol permits) must raise instead of
    silently dropping live-file state (r13 ADVICE)."""
    import pytest as _pytest

    from spark_hive_spark.sources.evolution import _v2_classify_top_row

    assert _v2_classify_top_row(
        {"checkpointMetadata": {"version": 2}, "sidecar": None}
    ) == ("checkpointMetadata", {"version": 2})
    assert _v2_classify_top_row(
        {"checkpointMetadata": None, "sidecar": {"path": "s.parquet"}}
    ) == ("sidecar", {"path": "s.parquet"})
    with _pytest.raises(NotImplementedError, match="add"):
        _v2_classify_top_row(
            {"checkpointMetadata": None,
             "add": {"path": "part-x.parquet"}}
        )
    with _pytest.raises(NotImplementedError):
        _v2_classify_top_row({"checkpointMetadata": None, "add": None})


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
    nested = {"name": "s", "type": {"type": "struct", "fields": []},
              "nullable": True,
              "metadata": {"delta.columnMapping.id": 2}}
    with pytest.raises(NotImplementedError, match="nested"):
        delta_column_mapping_by_id(_meta("id", [nested]))


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
