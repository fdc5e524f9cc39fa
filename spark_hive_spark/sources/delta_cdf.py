"""Delta Lake CHANGE DATA FEED read — row-level change capture from
the public `_change_data/` contract (Delta protocol, "Change Data
Files"; the read surface Delta exposes as ``table_changes(t, start,
end)``).

A CDF-enabled Delta table records, per commit:

- **cdc actions** in the commit JSON (``{"cdc": {"path": ...}}``)
  pointing at parquet files under ``_change_data/`` whose rows carry
  ``_change_type`` ∈ (``insert``, ``update_preimage``,
  ``update_postimage``, ``delete``);
- for commits with NO cdc action (the blind-append optimization:
  Delta skips writing change files when every action is an
  AppendOnly ``add``), the reader must SYNTHESIZE
  ``_change_type = 'insert'`` rows from the commit's add files;
- when a commit DOES carry cdc actions, its add/remove actions are
  data-layout bookkeeping only and must be IGNORED by the CDF reader
  (reading the rewritten add file would double-count every updated
  row as an insert — the classic CDF implementation bug, and this
  fixture's trap).

Each change row is stamped with ``_commit_version`` from the commit
that produced it, exactly like ``table_changes``.

Reference parity: the reference has no lakehouse surface
(CollegeScorecard.scala:35-157); north-star item per SURVEY.md §2B —
CDF is how a 100 TB training-data pipeline consumes upstream table
changes incrementally instead of re-scanning snapshots.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.tables import t


@register(
    "source_delta_cdf_changes",
    oracle=f"""
        SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS commit_version,
                   'insert' AS change_type,
                   count(*) AS n_rows,
                   {sql_dsum("o_totalprice")} AS revenue
            FROM orders WHERE o_orderkey % 4 = 1
            UNION ALL
            SELECT 2, 'update_preimage', count(*),
                   {sql_dsum("o_totalprice")}
            FROM orders WHERE o_orderkey % 8 = 4
            UNION ALL
            SELECT 2, 'update_postimage', count(*),
                   {sql_dsum("o_totalprice + 50.00")}
            FROM orders WHERE o_orderkey % 8 = 4
            UNION ALL
            SELECT 3, 'delete', count(*),
                   {sql_dsum("o_totalprice")}
            FROM orders WHERE o_orderkey % 8 = 1
        )
        ORDER BY commit_version, change_type
    """,
    tags=("source", "delta", "cdf", "cdc", "lakehouse", "compat"),
)
def source_delta_cdf_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta Change Data Feed replay (round 11) over versions 1..3 of
    a hand-written CDF-enabled table:

    - **v0** seeds the table (keys ≡ 0 mod 4) — outside the requested
      range, so none of its rows may appear;
    - **v1** BLIND-APPENDS keys ≡ 1 (mod 4): add action only, no cdc
      files — the reader synthesizes ``insert`` change rows from the
      added parquet;
    - **v2** UPDATES keys ≡ 4 (mod 8) to price+50.00: writes a
      ``_change_data/`` file with update_preimage/update_postimage
      rows AND the rewritten data file as add/remove — the reader
      must take the cdc file and ignore the add (taking both
      double-counts every updated row as an insert and flips the
      v2 hashes);
    - **v3** DELETES keys ≡ 1 (mod 8): cdc file with ``delete`` rows,
      plus the remove/add layout actions.

    Output is ``table_changes``-shaped, aggregated per
    (commit_version, change_type) with exact-decimal revenue; the
    DuckDB oracle recomputes all four groups from the raw table.

    Scale posture: CDF is the incremental-consumption contract — the
    reader lists O(#commits in range) JSON actions driver-side
    (metadata, same as Delta itself), then scans ONLY change files +
    blind-append files for the range, never the table snapshot; the
    per-version unions are narrow parquet scans Spark parallelizes
    per file."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    root = os.path.join(scratch_root(), f"shs_cdf_{uuid.uuid4().hex}")
    tdir = os.path.join(root, "t")
    ldir = os.path.join(tdir, "_delta_log")
    cdir = os.path.join(tdir, "_change_data")
    os.makedirs(ldir)
    os.makedirs(cdir)

    def _write_part(rel_name: str, df: DataFrame) -> None:
        tmp = os.path.join(root, f"stage_{rel_name.replace('/', '_')}")
        df.coalesce(1).write.parquet(tmp)
        src = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.replace(os.path.join(tmp, src), os.path.join(tdir, rel_name))
        shutil.rmtree(tmp, ignore_errors=True)

    def _commit(version: int, actions: list[dict]) -> None:
        path = os.path.join(ldir, f"{version:020d}.json")
        with open(path, "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    key = F.col("o_orderkey")
    # v0: seed (out of range)
    _write_part("part-v0.parquet", orders.filter(key % 4 == 0))
    _commit(0, [
        {"metaData": {
            "id": "cdf-fixture",
            "configuration": {"delta.enableChangeDataFeed": "true"},
        }},
        {"add": {"path": "part-v0.parquet", "dataChange": True}},
    ])
    # v1: blind append — add only, no cdc
    _write_part("part-v1.parquet", orders.filter(key % 4 == 1))
    _commit(1, [{"add": {"path": "part-v1.parquet", "dataChange": True}}])
    # v2: update keys ≡ 4 (mod 8): +50.00
    upd = orders.filter(key % 8 == 4)
    pre = upd.withColumn("_change_type", F.lit("update_preimage"))
    post = upd.withColumn(
        "o_totalprice",
        (F.col("o_totalprice").cast("decimal(18,2)")
         + F.lit(50).cast("decimal(18,2)")).cast("double"),
    ).withColumn("_change_type", F.lit("update_postimage"))
    _write_part("_change_data/cdc-v2.parquet", pre.unionByName(post))
    # the rewritten layout file — a CDF reader must NOT scan it
    rewritten = orders.filter(key % 4 == 0).withColumn(
        "o_totalprice",
        F.when(
            key % 8 == 4,
            (F.col("o_totalprice").cast("decimal(18,2)")
             + F.lit(50).cast("decimal(18,2)")).cast("double"),
        ).otherwise(F.col("o_totalprice")),
    )
    _write_part("part-v2.parquet", rewritten)
    _commit(2, [
        {"cdc": {"path": "_change_data/cdc-v2.parquet", "dataChange": False}},
        {"remove": {"path": "part-v0.parquet", "dataChange": True}},
        {"add": {"path": "part-v2.parquet", "dataChange": True}},
    ])
    # v3: delete keys ≡ 1 (mod 8) (they live in part-v1)
    deleted = orders.filter(key % 8 == 1)
    _write_part(
        "_change_data/cdc-v3.parquet",
        deleted.withColumn("_change_type", F.lit("delete")),
    )
    survivors = orders.filter((key % 4 == 1) & (key % 8 != 1))
    _write_part("part-v3.parquet", survivors)
    _commit(3, [
        {"cdc": {"path": "_change_data/cdc-v3.parquet", "dataChange": False}},
        {"remove": {"path": "part-v1.parquet", "dataChange": True}},
        {"add": {"path": "part-v3.parquet", "dataChange": True}},
    ])

    # ---- the CDF reader: table_changes(t, 1, 3) ----
    start_v, end_v = 1, 3
    per_version: list[DataFrame] = []
    for fname in sorted(os.listdir(ldir)):
        if not fname.endswith(".json"):
            raise NotImplementedError(f"delta log entry {fname!r}")
        version = int(fname[: -len(".json")])
        if not (start_v <= version <= end_v):
            continue
        cdc_paths: list[str] = []
        add_paths: list[str] = []
        has_remove = False
        has_no_change_add = False
        with open(os.path.join(ldir, fname)) as fh:
            for line in fh:
                action = json.loads(line)
                if "cdc" in action:
                    cdc_paths.append(action["cdc"]["path"])
                elif "add" in action:
                    add_paths.append(action["add"]["path"])
                    if not action["add"].get("dataChange", True):
                        has_no_change_add = True
                elif "remove" in action:
                    has_remove = True
        if cdc_paths:  # change files win; add/remove are layout only
            df = spark.read.parquet(
                *(os.path.join(tdir, p) for p in cdc_paths)
            )
        elif add_paths:
            # Blind-append synthesis is only sound when the commit is
            # purely new data: a cdc-less commit with removes encodes
            # deletes, and dataChange=false adds (compaction/OPTIMIZE)
            # carry no logical changes — both would be misread here, so
            # fail loudly like the rest of the log reader.
            if has_remove:
                raise NotImplementedError(
                    f"cdc-less commit {version} contains remove actions"
                )
            if has_no_change_add:
                raise NotImplementedError(
                    f"cdc-less commit {version} contains dataChange=false adds"
                )
            df = spark.read.parquet(
                *(os.path.join(tdir, p) for p in add_paths)
            ).withColumn("_change_type", F.lit("insert"))
        else:
            continue
        per_version.append(
            df.withColumn("_commit_version", F.lit(version).cast("long"))
        )

    changes = per_version[0]
    for df in per_version[1:]:
        changes = changes.unionByName(df)
    out = (
        changes.groupBy(
            F.col("_commit_version").alias("commit_version"),
            F.col("_change_type").alias("change_type"),
        )
        .agg(
            F.count("*").alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("commit_version", "change_type")
        .localCheckpoint(eager=True)  # 4 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_delta_cdf_row_tracking",
    oracle=f"""
        SELECT * FROM (
            SELECT CAST(1 AS BIGINT) AS commit_version,
                   'insert' AS change_type,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   {sql_dsum('o_totalprice')} AS revenue,
                   TRUE AS lineage_stable
            FROM orders
            UNION ALL
            SELECT CAST(2 AS BIGINT), 'update_preimage',
                   CAST(count(*) AS BIGINT),
                   {sql_dsum('o_totalprice')}, TRUE
            FROM orders WHERE o_orderkey % 10 = 4
            UNION ALL
            SELECT CAST(2 AS BIGINT), 'update_postimage',
                   CAST(count(*) AS BIGINT),
                   {sql_dsum('o_totalprice + 100.00')}, TRUE
            FROM orders WHERE o_orderkey % 10 = 4
            UNION ALL
            SELECT CAST(3 AS BIGINT), 'delete',
                   CAST(count(*) AS BIGINT),
                   {sql_dsum('o_totalprice')}, TRUE
            FROM orders WHERE o_orderkey % 10 = 8
        )
        ORDER BY commit_version, change_type
    """,
    tags=("source", "delta", "cdf", "cdc", "row-tracking",
          "lakehouse", "compat"),
)
def source_delta_cdf_row_tracking(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delta CDF × ROW TRACKING (round 19) — the Delta twin of
    `source_iceberg_changelog_row_lineage`: with row tracking
    enabled, change-data rows carry the MATERIALIZED row id, so a
    CDF consumer pairs update pre/post images BY ID — no natural
    key in the join, and the pairing survives key-mutating updates
    a key-join would lose. PROTOCOL.md obligations composed:

    - v1 is a blind append (no cdc action): the reader synthesizes
      ``insert`` rows AND their ids from the add's ``baseRowId`` +
      ``_metadata.row_index`` — the virtual path;
    - v2's update writes a ``_change_data`` file whose
      pre/post-image rows carry the materialized id column — the
      reader pairs on it and ``lineage_stable`` attests every pair
      binds the SAME o_orderkey (an id re-mint pairs wrong rows),
      while v2's rewritten add action is IGNORED (the classic CDF
      double-count trap, unchanged from the base query);
    - v3's delete rows carry ids inside the v1 range — attested
      (a delete naming an unassigned id is corrupt);
    - the rowTracking writer feature + table configuration gate the
      whole read (absent feature is loud).

    Scale posture: change files are read once each, synthesis is a
    scan-side projection, and the pair attest joins on the 8-byte
    id — the whole point of shipping ids through CDC at 100 TB."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_cdfrt_{uuid.uuid4().hex}"
    )
    tdir = os.path.join(root, "t")
    ldir = os.path.join(tdir, "_delta_log")
    cdir = os.path.join(tdir, "_change_data")
    os.makedirs(ldir)
    os.makedirs(cdir)

    from pyspark.sql import Window as _W

    key = F.col("o_orderkey")
    mod = key % 10
    with_id = orders.withColumn(
        "_row_id",
        (F.row_number().over(_W.orderBy(key)) - 1).cast("long"),
    )
    n = orders.count()

    def _write_part(rel_name: str, df: DataFrame) -> None:
        tmp = os.path.join(
            root, f"stage_{rel_name.replace('/', '_')}"
        )
        df.coalesce(1).write.parquet(tmp)
        src = next(
            f for f in os.listdir(tmp) if f.endswith(".parquet")
        )
        os.replace(os.path.join(tmp, src),
                   os.path.join(tdir, rel_name))
        shutil.rmtree(tmp, ignore_errors=True)

    def _commit(version: int, actions: list[dict]) -> None:
        with open(os.path.join(ldir, f"{version:020d}.json"),
                  "w") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")

    _commit(0, [
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": [],
            "writerFeatures": ["rowTracking"],
        }},
        {"metaData": {
            "id": "cdf-rt-fixture",
            "configuration": {
                "delta.enableChangeDataFeed": "true",
                "delta.enableRowTracking": "true",
            },
        }},
    ])
    # v1: blind append — ids are VIRTUAL (baseRowId + row_index)
    _write_part("part-v1.parquet",
                orders.sort("o_orderkey"))
    _commit(1, [{"add": {"path": "part-v1.parquet",
                         "baseRowId": 0, "dataChange": True}}])
    # v2: update keys ≡ 4 — cdc file rows CARRY the materialized id
    upd = with_id.filter(mod == 4)
    pre = upd.select(
        "o_orderkey", "o_totalprice", "_row_id",
        F.lit("update_preimage").alias("_change_type"),
    )
    post = upd.select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)")
         + F.lit(100).cast("decimal(18,2)")).cast("double")
        .alias("o_totalprice"),
        "_row_id",
        F.lit("update_postimage").alias("_change_type"),
    )
    _write_part("_change_data/cdc-v2.parquet",
                pre.unionByName(post))
    _write_part("part-v2.parquet", with_id.select(
        "o_orderkey", "o_totalprice", "_row_id"
    ))  # rewritten data file: CDF must ignore it
    _commit(2, [
        {"remove": {"path": "part-v1.parquet"}},
        {"add": {"path": "part-v2.parquet",
                 "baseRowId": n, "dataChange": True}},
        {"cdc": {"path": "_change_data/cdc-v2.parquet",
                 "dataChange": False}},
    ])
    # v3: delete keys ≡ 8 — delete rows carry their ids
    _write_part(
        "_change_data/cdc-v3.parquet",
        with_id.filter(mod == 8).select(
            "o_orderkey", "o_totalprice", "_row_id",
            F.lit("delete").alias("_change_type"),
        ),
    )
    _commit(3, [
        {"cdc": {"path": "_change_data/cdc-v3.parquet",
                 "dataChange": False}},
    ])

    # ---- the CDF reader, id-aware ----
    versions = sorted(
        int(f[:20]) for f in os.listdir(ldir) if f.endswith(".json")
    )
    actions_by_v: dict[int, list[dict]] = {}
    for v in versions:
        with open(os.path.join(ldir, f"{v:020d}.json")) as fh:
            actions_by_v[v] = [
                json.loads(ln) for ln in fh if ln.strip()
            ]
    proto = next(
        a["protocol"] for a in actions_by_v[0] if "protocol" in a
    )
    meta = next(
        a["metaData"] for a in actions_by_v[0] if "metaData" in a
    )
    conf = meta.get("configuration") or {}
    if conf.get("delta.enableRowTracking") == "true" and \
            "rowTracking" not in (proto.get("writerFeatures") or []):
        raise ValueError(
            "delta.enableRowTracking without the rowTracking "
            "writer feature"
        )

    changes = None
    for v in versions:
        acts = actions_by_v[v]
        cdcs = [a["cdc"] for a in acts if "cdc" in a]
        part = None
        if cdcs:
            part = spark.read.parquet(
                *(os.path.join(tdir, c["path"]) for c in cdcs)
            ).select(
                "o_orderkey", "o_totalprice", "_row_id",
                "_change_type",
                F.lit(v).cast("bigint").alias("commit_version"),
            )
        else:
            adds = [a["add"] for a in acts if "add" in a]
            if not adds:
                continue
            part = spark.read.parquet(
                *(os.path.join(tdir, a["path"]) for a in adds)
            ).select(
                "o_orderkey", "o_totalprice",
                (F.lit(adds[0]["baseRowId"])
                 + F.col("_metadata.row_index")).cast("long")
                .alias("_row_id"),
                F.lit("insert").alias("_change_type"),
                F.lit(v).cast("bigint").alias("commit_version"),
            )
        changes = part if changes is None else changes.unionByName(
            part
        )
    changes = changes.localCheckpoint(eager=True)  # buckets + attest

    pre_r = changes.filter(
        F.col("_change_type") == "update_preimage"
    ).select(F.col("_row_id").alias("rid"),
             F.col("o_orderkey").alias("k_pre"))
    post_r = changes.filter(
        F.col("_change_type") == "update_postimage"
    ).select(F.col("_row_id").alias("rid"),
             F.col("o_orderkey").alias("k_post"))
    paired = pre_r.join(post_r, "rid", "full_outer")
    attest = paired.agg(
        (
            F.coalesce(F.sum(
                (F.col("k_pre").isNull() | F.col("k_post").isNull()
                 | (F.col("k_pre") != F.col("k_post"))).cast("long")
            ), F.lit(0)) == 0
        ).alias("pairs_bind"),
    ).crossJoin(
        changes.filter(F.col("_change_type") == "delete").agg(
            (
                F.coalesce(F.sum(
                    ((F.col("_row_id") < 0)
                     | (F.col("_row_id") >= n)).cast("long")
                ), F.lit(0)) == 0
            ).alias("delete_ids_in_range"),
        )
    )
    out = (
        changes.groupBy("commit_version",
                        F.col("_change_type").alias("change_type"))
        .agg(
            F.count("*").alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        )
        .crossJoin(F.broadcast(attest))
        .select(
            "commit_version", "change_type", "n_rows", "revenue",
            (F.col("pairs_bind") & F.col("delete_ids_in_range"))
            .alias("lineage_stable"),
        )
        .orderBy("commit_version", "change_type")
        .localCheckpoint(eager=True)  # 4 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out
