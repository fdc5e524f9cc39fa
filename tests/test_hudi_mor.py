"""HoodieLogFormat block codec unit tests (no Spark session needed).

The end-to-end MOR snapshot semantics (timeline filtering, last-writer
merge, tombstones) are covered by the registry parity test
(`test_oracle_parity` runs `source_hudi_mor_snapshot` against its
DuckDB oracle at sf0.001); these tests pin the byte-level framing the
reader trusts.
"""

from __future__ import annotations

import struct

import pytest

from spark_hive_spark.sources.hudi_mor import (
    _AVRO_BLOCK,
    _DELETE_BLOCK,
    _H_INSTANT,
    _H_SCHEMA,
    _LOG_SCHEMA,
    _dec_avro_content,
    _dec_delete_content,
    _enc_avro_content,
    _enc_delete_content,
    encode_log_block,
    walk_log_blocks,
)

RECS = [
    {"o_orderkey": 6, "o_totalprice": 123.45},
    {"o_orderkey": 16, "o_totalprice": 99999.99},
    {"o_orderkey": 26, "o_totalprice": 0.01},
]


def test_block_roundtrip_multi_block_file():
    import json

    blk1 = encode_log_block(
        _AVRO_BLOCK,
        {_H_INSTANT: "002", _H_SCHEMA: json.dumps(_LOG_SCHEMA)},
        _enc_avro_content(RECS),
    )
    blk2 = encode_log_block(
        _DELETE_BLOCK, {_H_INSTANT: "003"}, _enc_delete_content(["3", "13"])
    )
    blocks = walk_log_blocks(blk1 + blk2)
    assert [b["type"] for b in blocks] == [_AVRO_BLOCK, _DELETE_BLOCK]
    assert blocks[0]["header"][_H_INSTANT] == "002"
    assert _dec_avro_content(blocks[0]["content"], _LOG_SCHEMA) == RECS
    assert _dec_delete_content(blocks[1]["content"]) == ["3", "13"]


def test_trailing_total_length_enables_reverse_seek():
    blk = encode_log_block(_DELETE_BLOCK, {_H_INSTANT: "001"},
                           _enc_delete_content(["1"]))
    (total,) = struct.unpack_from(">q", blk, len(blk) - 8)
    assert total == len(blk)


def test_bad_magic_rejected():
    blk = encode_log_block(_DELETE_BLOCK, {_H_INSTANT: "001"},
                           _enc_delete_content(["1"]))
    with pytest.raises(ValueError, match="magic"):
        walk_log_blocks(b"#XUDI#" + blk[6:])


def test_corrupted_back_pointer_rejected():
    blk = bytearray(
        encode_log_block(_DELETE_BLOCK, {_H_INSTANT: "001"},
                         _enc_delete_content(["1"]))
    )
    blk[-1] ^= 0xFF
    with pytest.raises(ValueError, match="back-pointer"):
        walk_log_blocks(bytes(blk))


def test_unknown_format_version_is_loud():
    blk = bytearray(
        encode_log_block(_DELETE_BLOCK, {_H_INSTANT: "001"},
                         _enc_delete_content(["1"]))
    )
    struct.pack_into(">i", blk, 14, 9)  # version field after magic+len
    with pytest.raises(NotImplementedError, match="version 9"):
        walk_log_blocks(bytes(blk))


def test_parse_log_name_versions():
    from spark_hive_spark.sources.hudi_mor import parse_log_name

    assert parse_log_name(".fg-A_001.log.1_0-1-0") == ("fg-A", "001", 1)
    assert parse_log_name(".fg-A_001.log.12_0-7-3") == ("fg-A", "001", 12)
    with pytest.raises(ValueError, match="log file name"):
        parse_log_name("fg-A_001.parquet")


def test_command_block_rolls_back_target_instant():
    import json

    from spark_hive_spark.sources.hudi_mor import (
        _CMD_BLOCK,
        _H_COMMAND,
        _H_TARGET_INSTANT,
        apply_command_blocks,
    )

    blk = lambda inst: {  # noqa: E731
        "type": _AVRO_BLOCK,
        "header": {_H_INSTANT: inst, _H_SCHEMA: json.dumps(_LOG_SCHEMA)},
        "content": _enc_avro_content(RECS),
    }
    cmd = {
        "type": _CMD_BLOCK,
        "header": {_H_INSTANT: "007", _H_TARGET_INSTANT: "006",
                   _H_COMMAND: "0"},
        "content": b"",
    }
    out, rolled = apply_command_blocks([blk("002"), blk("006"), cmd,
                                        blk("008")])
    assert rolled == 1
    assert [b["header"][_H_INSTANT] for b in out] == ["002", "008"]
    # rollback only reaches EARLIER blocks: a later 006 block survives
    out2, rolled2 = apply_command_blocks([cmd, blk("006")])
    assert rolled2 == 0
    assert len(out2) == 1
    # non-rollback command types are loud
    bad = dict(cmd, header={_H_INSTANT: "007", _H_TARGET_INSTANT: "006",
                            _H_COMMAND: "9"})
    with pytest.raises(NotImplementedError, match="command block"):
        apply_command_blocks([bad])


def test_mor_compaction_contract(spark):
    """source_hudi_mor_compaction at the smoke SF: the compacted-base
    read must equal pre-compaction replay (compaction_consistent),
    slice resolution must ignore exactly one stale base and one
    superseded log file, and the merged numbers must match the
    uncompacted MOR semantics (keys≡3 deleted; +100/+50/+25 applied)."""
    from spark_hive_spark.plans.registry import all_queries

    rows = all_queries()["source_hudi_mor_compaction"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 9  # key_mod 3 fully tombstoned
    assert all(r["compaction_consistent"] for r in rows)
    assert all(r["compactions_completed"] == 1 for r in rows)
    assert all(r["stale_bases_ignored"] == 1 for r in rows)
    assert all(r["superseded_logs"] == 1 for r in rows)
    assert not any(r["key_mod"] == 3 for r in rows)


def test_clean_replay_contract(spark):
    """source_hudi_clean_replay: clean instants are recognized
    non-data actions, the cleaned stale base is gone and unserved
    (safety contract), the inflight clean stays pending, and latest
    slices serve unchanged."""
    from spark_hive_spark.plans.registry import all_queries

    rows = all_queries()["source_hudi_clean_replay"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 10
    assert all(r["clean_safety_ok"] for r in rows)
    assert all(r["cleans_completed"] == 1 for r in rows)
    assert all(r["cleans_pending"] == 1 for r in rows)
    assert all(r["files_cleaned"] == 1 for r in rows)


def test_mor_incremental_merges_and_scopes(spark):
    """The incremental pull must collapse same-key double updates,
    drop in-range-deleted keys, exclude the rolled-back and
    past-end blocks, and price changed rows at their LATEST
    in-range value."""
    import pyspark.sql.functions as F

    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.tables import t

    sf = "/root/testdata/sf0.001"
    got = (
        all_queries()["source_hudi_mor_incremental"]
        .fn(spark, sf).collect()[0].asDict()
    )
    orders = t(spark, sf, "orders")
    m = F.col("o_orderkey") % 10
    exp = orders.agg(
        F.sum(m.isin(5, 6, 8).cast("long")).alias("n_changed"),
        F.sum((m == 3).cast("long")).alias("n_deleted"),
    ).collect()[0]
    assert got["commits_in_range"] == 2
    assert got["blocks_applied"] == 4
    assert got["blocks_rolled_back"] == 1
    assert got["blocks_out_of_range"] == 1
    # double-count trap: naive per-block emission would add the
    # keys ≡ 6 twice — n_changed must equal the DISTINCT key count
    assert got["n_changed"] == exp["n_changed"]
    assert got["n_deleted"] == exp["n_deleted"]


def test_cdc_block_codec_roundtrip():
    """RFC-51 CDC records (op/ts_ms + nullable before/after row
    images through the Avro union codec) roundtrip through the data
    block framing; a delete's after image stays None and version
    drift is loud."""
    import pytest

    from spark_hive_spark.sources.hudi_mor import (
        _dec_avro_content_cdc,
        _enc_cdc_content,
    )

    recs = [
        {"op": "u", "ts_ms": 2000,
         "before": {"o_orderkey": 5, "o_totalprice": 10.5},
         "after": {"o_orderkey": 5, "o_totalprice": 110.5}},
        {"op": "d", "ts_ms": 2001,
         "before": {"o_orderkey": 7, "o_totalprice": 3.25},
         "after": None},
        {"op": "i", "ts_ms": 2002,
         "before": None,
         "after": {"o_orderkey": 9, "o_totalprice": 0.0}},
    ]
    content = _enc_cdc_content(recs)
    assert _dec_avro_content_cdc(content) == recs
    with pytest.raises(NotImplementedError, match="version"):
        _dec_avro_content_cdc(b"\x00\x00\x00\x02" + content[4:])
    with pytest.raises(ValueError, match="trailing"):
        _dec_avro_content_cdc(content + b"\x00")


def test_hudi_apply_restores_rules():
    """Shared restore application (round 19): instant order, target
    must be a savepoint, rolled-back instants strictly newer, drop
    called once per rolled-back instant."""
    from spark_hive_spark.sources.evolution import hudi_apply_restores

    dropped = []
    rolled, ok = hudi_apply_restores(
        {"005": {"savepointToRestoreTimestamp": "002",
                 "instantsToRollback": ["003", "004"]}},
        {"002"}, dropped.append,
    )
    assert ok and rolled == {"003", "004"} and dropped == ["003", "004"]
    # target not savepointed -> verdict False, rollback still applied
    rolled, ok = hudi_apply_restores(
        {"005": {"savepointToRestoreTimestamp": "002",
                 "instantsToRollback": ["003"]}},
        set(), lambda _x: None,
    )
    assert not ok and rolled == {"003"}
    # rolling back an instant AT or BEFORE the savepoint is invalid
    rolled, ok = hudi_apply_restores(
        {"005": {"savepointToRestoreTimestamp": "002",
                 "instantsToRollback": ["002"]}},
        {"002"}, lambda _x: None,
    )
    assert not ok
    # multiple restores apply in instant order
    seen = []
    hudi_apply_restores(
        {"009": {"savepointToRestoreTimestamp": "006",
                 "instantsToRollback": ["007"]},
         "005": {"savepointToRestoreTimestamp": "002",
                 "instantsToRollback": ["003"]}},
        {"002", "006"}, seen.append,
    )
    assert seen == ["003", "007"]
