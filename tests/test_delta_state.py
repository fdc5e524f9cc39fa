"""delta_state_reconstruction (sources/evolution.py, round 14): the
distributed checkpoint+replay resolve must be last-writer-wins per
path with checkpoint state at ord 0, and no checkpoint action may
ever be materialized on the driver by the helper itself."""

from __future__ import annotations

from spark_hive_spark.sources.evolution import delta_state_reconstruction


def _resolve(spark, ckpt, replay):
    ckpt_df = spark.createDataFrame(ckpt, "path string, kind string")
    rep_df = spark.createDataFrame(
        replay, "path string, kind string, ord bigint"
    )
    out = delta_state_reconstruction(ckpt_df, rep_df)
    return {r["path"]: (r["kind"], r["is_ckpt"]) for r in out.collect()}


def test_last_writer_wins_per_path(spark):
    got = _resolve(
        spark,
        [("a", "add"), ("b", "add"), ("t", "remove")],
        [
            ("a", "remove", 1_000_001),   # checkpoint add later removed
            ("c", "add", 1_000_002),      # new file
            ("t", "add", 2_000_000),      # tombstone re-added
            ("c", "remove", 2_000_001),   # added then removed
            ("c", "add", 2_000_002),      # ... then re-added same commit
        ],
    )
    assert got == {
        "a": ("remove", False),
        "b": ("add", True),
        "c": ("add", False),
        "t": ("add", False),
    }


def test_checkpoint_only_paths_keep_is_ckpt(spark):
    got = _resolve(spark, [("x", "add")], [])
    assert got == {"x": ("add", True)}


def test_within_commit_line_order_breaks_ties(spark):
    # remove at line 0, add at line 1 of the same version: add wins
    got = _resolve(
        spark, [("p", "add")],
        [("p", "remove", 1_000_000), ("p", "add", 1_000_001)],
    )
    assert got["p"] == ("add", False)


def test_replay_ord_no_cross_version_collision():
    """ADVICE r14: (v+1)*1e6+ln collided once a commit hit 1e6 lines;
    the bit-packed ord must keep every line of version v below every
    line of version v+1."""
    from spark_hive_spark.sources.evolution import _replay_ord

    assert _replay_ord(0, 0) > 0  # above the checkpoint's ord 0
    assert _replay_ord(1, 1_000_000) < _replay_ord(2, 0)
    assert _replay_ord(1, (1 << 32) - 1) < _replay_ord(2, 0)
    assert _replay_ord(5, 3) < _replay_ord(5, 4)  # line order within v


def test_replay_ord_guards_are_loud():
    import pytest

    from spark_hive_spark.sources.evolution import _replay_ord

    with pytest.raises(ValueError, match="line number"):
        _replay_ord(1, 1 << 32)
    with pytest.raises(ValueError, match="version"):
        _replay_ord(1 << 30, 0)


def test_delta_checkpoint_files_resolution(tmp_path):
    """Round 15: multi-part classic checkpoints resolve from the
    `parts` field with every declared part validated present."""
    import pytest

    from spark_hive_spark.sources.evolution import (
        delta_checkpoint_files,
    )

    ldir = str(tmp_path)
    single = f"{7:020d}.checkpoint.parquet"
    open(f"{ldir}/{single}", "wb").close()
    assert delta_checkpoint_files(ldir, {"version": 7}) == [
        f"{ldir}/{single}"
    ]
    p1 = f"{9:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
    p2 = f"{9:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
    open(f"{ldir}/{p1}", "wb").close()
    with pytest.raises(ValueError, match="missing 1 of 2 parts"):
        delta_checkpoint_files(ldir, {"version": 9, "parts": 2})
    open(f"{ldir}/{p2}", "wb").close()
    assert delta_checkpoint_files(ldir, {"version": 9, "parts": 2}) \
        == [f"{ldir}/{p1}", f"{ldir}/{p2}"]
    with pytest.raises(ValueError, match="invalid"):
        delta_checkpoint_files(ldir, {"version": 9, "parts": 0})


def test_delta_live_at_time_travel_and_guards(tmp_path):
    """Round 15: VERSION AS OF primitive — replay stops at the
    target; gaps and out-of-range targets are loud."""
    import json

    import pytest

    from spark_hive_spark.sources.evolution import delta_live_at

    ldir = str(tmp_path)

    def _commit(v, actions):
        with open(f"{ldir}/{v:020d}.json", "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")

    _commit(0, [{"add": {"path": "a"}}, {"add": {"path": "b"}}])
    _commit(1, [{"remove": {"path": "a"}}, {"add": {"path": "c"}}])
    assert delta_live_at(ldir, 0) == ({"a", "b"}, 0, 0)
    assert delta_live_at(ldir, 1) == ({"b", "c"}, 1, 1)
    assert delta_live_at(ldir) == ({"b", "c"}, 1, 1)  # latest
    with pytest.raises(ValueError, match="cannot time-travel"):
        delta_live_at(ldir, 9)
    _commit(3, [{"add": {"path": "d"}}])  # version gap: 2 missing
    with pytest.raises(ValueError, match="gaps"):
        delta_live_at(ldir)


def test_v2_inline_actions_add_only_checkpoint(spark, tmp_path):
    """ADVICE r15: a fresh v2 checkpoint commonly carries only an
    `add` column (no tombstones yet) — _v2_inline_actions must not
    die on the missing `remove` column."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_hive_spark.sources.evolution import (
        _v2_inline_actions,
        _v2_read_top_metadata,
    )

    top = pa.table({
        "checkpointMetadata": pa.array(
            [{"version": 4}, None, None],
            pa.struct([("version", pa.int64())])),
        "add": pa.array(
            [None,
             {"path": "f1.parquet", "size": 10,
              "modificationTime": 0, "dataChange": True},
             {"path": "f2.parquet", "size": 20,
              "modificationTime": 0, "dataChange": True}],
            pa.struct([("path", pa.string()), ("size", pa.int64()),
                       ("modificationTime", pa.int64()),
                       ("dataChange", pa.bool_())])),
    })
    path = str(tmp_path / "00000000000000000004.checkpoint.x.parquet")
    pq.write_table(top, path)

    acts = {(r["path"], r["kind"])
            for r in _v2_inline_actions(spark, path).collect()}
    assert acts == {("f1.parquet", "add"), ("f2.parquet", "add")}
    sidecars, n_inline = _v2_read_top_metadata(spark, path, 4)
    assert sidecars == [] and n_inline == 2


def test_delta_version_at_timestamp_rules(tmp_path):
    """TIMESTAMP AS OF resolution: latest commit <= ts; mtime
    monotonic adjustment; inCommitTimestamp precedence + strictness;
    loud out-of-range both ends."""
    import json
    import os

    import pytest

    from spark_hive_spark.sources.evolution import (
        delta_version_at_timestamp,
    )

    ldir = str(tmp_path)
    t0 = 1_700_000_000_000

    def commit(v, actions, mtime_ms):
        p = os.path.join(ldir, f"{v:020d}.json")
        with open(p, "w") as fh:
            fh.write("\n".join(json.dumps(a) for a in actions) + "\n")
        os.utime(p, ns=(mtime_ms * 10**6,) * 2)

    commit(0, [{"add": {"path": "a"}}], t0)
    commit(1, [{"add": {"path": "b"}}], t0 - 5_000)  # skewed back
    commit(2, [{"commitInfo": {"inCommitTimestamp": t0 + 100}},
               {"add": {"path": "c"}}], t0 + 999_999)  # bogus mtime

    assert delta_version_at_timestamp(ldir, t0) == 0  # v1 adjusted
    assert delta_version_at_timestamp(ldir, t0 + 1) == 1
    assert delta_version_at_timestamp(ldir, t0 + 99) == 1
    assert delta_version_at_timestamp(ldir, t0 + 100) == 2  # ICT, ==
    with pytest.raises(ValueError, match="predates the first"):
        delta_version_at_timestamp(ldir, t0 - 1)
    with pytest.raises(ValueError, match="after the latest"):
        delta_version_at_timestamp(ldir, t0 + 101)

    # non-increasing inCommitTimestamp is a broken table: loud
    commit(3, [{"commitInfo": {"inCommitTimestamp": t0 + 100}},
               {"add": {"path": "d"}}], t0 + 200)
    with pytest.raises(ValueError, match="not .*increasing"):
        delta_version_at_timestamp(ldir, t0 + 100)


def test_domain_metadata_replay_rules():
    """Latest writer wins per domain; removed tombstones; malformed
    actions loud; v2 classifier admits domainMetadata rows."""
    import pytest

    from spark_hive_spark.sources.evolution import (
        _v2_classify_top_row,
        delta_domain_metadata_replay,
    )

    live, removed = delta_domain_metadata_replay([
        {"domainMetadata": {"domain": "a", "configuration": "1"}},
        {"add": {"path": "x"}},  # interleaved non-domain actions
        {"domainMetadata": {"domain": "a", "configuration": "2"}},
        {"domainMetadata": {"domain": "b", "configuration": "9"}},
        {"domainMetadata": {"domain": "b", "removed": True}},
    ])
    assert live == {"a": "2"} and removed == 1
    # re-adding a removed domain revives it
    live, removed = delta_domain_metadata_replay([
        {"domainMetadata": {"domain": "b", "removed": True}},
        {"domainMetadata": {"domain": "b", "configuration": "3"}},
    ])
    assert live == {"b": "3"} and removed == 0
    with pytest.raises(ValueError, match="without a domain"):
        delta_domain_metadata_replay([{"domainMetadata": {}}])

    kind, payload = _v2_classify_top_row({
        "checkpointMetadata": None, "protocol": None,
        "domainMetadata": {"domain": "a", "configuration": "1"},
    })
    assert kind == "domainMetadata" and payload["domain"] == "a"


def test_delta_stats_prune_rules():
    """stats is a double-encoded JSON string; min/max prune ranges;
    all-null prunes via counts; absent/uncovered stats must scan."""
    import json

    from spark_hive_spark.sources.evolution import delta_stats_prune

    def add(**stats):
        return {"path": "f", "stats": json.dumps(stats)}

    s = add(numRecords=10, minValues={"k": 100}, maxValues={"k": 200},
            nullCount={"k": 0})
    assert not delta_stats_prune(s, "k", 150, 160)
    assert delta_stats_prune(s, "k", 201, 300)
    assert delta_stats_prune(s, "k", 0, 99)
    assert not delta_stats_prune(s, "k", 200, 200)  # inclusive
    # all-null column prunes via counts alone
    assert delta_stats_prune(
        add(numRecords=10, minValues={}, maxValues={},
            nullCount={"k": 10}), "k", 0, 9)
    # absent stats / uncovered column: must scan
    assert not delta_stats_prune({"path": "f"}, "k", 0, 9)
    assert not delta_stats_prune(
        add(numRecords=10, minValues={"other": 1},
            maxValues={"other": 2}, nullCount={}), "k", 0, 9)
    # already-decoded stats objects are accepted too
    assert delta_stats_prune(
        {"stats": {"numRecords": 5, "minValues": {"k": 9},
                   "maxValues": {"k": 9}, "nullCount": {"k": 0}}},
        "k", 0, 8)
