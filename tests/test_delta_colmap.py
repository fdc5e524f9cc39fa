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
