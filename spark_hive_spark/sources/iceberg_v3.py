"""Iceberg FORMAT-VERSION 3: schema DEFAULT VALUES and ROW LINEAGE
(round 15, the r14 verdict's tasks 3+4) — the two remaining named v3
feature gates in `iceberg_format_gate` (sources/evolution.py), now
implemented from the public v3 spec (iceberg.apache.org/spec):

- **Default values** (spec §Default values): a schema field may carry
  ``initial-default`` — the value readers MUST produce for rows in
  data files written before the field existed — and
  ``write-default`` (writer-side only; readers ignore it). Because
  Iceberg resolves columns by FIELD ID, "the field doesn't exist in
  this file" is a per-file footer fact (`leaf_field_ids`), not a
  name comparison; physical names are free to differ per file.
- **Row lineage** (spec §Row Lineage): v3 tables track
  ``_row_id = first_row_id + position`` per row, where
  ``first_row_id`` is assigned to each data file at commit from the
  table's ``next-row-id`` counter, and
  ``_last_updated_sequence_number`` is the data sequence number of
  the commit that last wrote the row. Both are VIRTUAL columns
  materialized at scan time — Spark's ``_metadata.row_index`` gives
  the in-file position executor-side, so materialization is a
  narrow projection, never a shuffle or a driver loop.

Scale posture: default fill is a literal projection folded into the
scan (constant-folded by Catalyst, no data movement); row-id
materialization is ``lit(first_row_id) + _metadata.row_index`` per
partition. Both are exactly how a 100 TB reader wants them: pure
planning metadata + codegen projections.

Reference parity: the reference reads static inputs
(CollegeScorecard.scala:35-157); lakehouse compat is north-star
surface per SURVEY.md §2B.
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

_ICEBERG_TO_SPARK = {
    "long": "bigint",
    "int": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
}


def iceberg_default_fill_select(
    schema_fields: list[dict], file_leaf_fids: dict[str, int | None]
) -> list:
    """Current-schema fields + ONE data file's parquet footer field
    ids -> the select expressions that read that file under the
    current schema: present fields resolve by FIELD ID (the file's
    physical name is whatever the footer says it is), absent fields
    fill ``initial-default`` when the schema declares one, else null
    — the v3 read contract. Nested/complex types stay loud."""
    by_fid = {fid: path for path, fid in file_leaf_fids.items()
              if fid is not None}
    exprs = []
    for f in schema_fields:
        ftype = f.get("type")
        if not isinstance(ftype, str) or ftype not in _ICEBERG_TO_SPARK:
            raise NotImplementedError(
                f"Iceberg v3 default-value read of type {ftype!r}"
            )
        spark_t = _ICEBERG_TO_SPARK[ftype]
        fid = f["id"]
        if fid in by_fid:
            ppath = ".".join(
                f"`{seg}`" for seg in by_fid[fid].split(".")
            )
            exprs.append(F.col(ppath).cast(spark_t).alias(f["name"]))
        elif "initial-default" in f:
            exprs.append(
                F.lit(f["initial-default"]).cast(spark_t)
                .alias(f["name"])
            )
        elif f.get("required"):
            raise ValueError(
                f"required field {f['name']!r} (id {fid}) missing "
                "from data file and has no initial-default"
            )
        else:
            exprs.append(F.lit(None).cast(spark_t).alias(f["name"]))
    return exprs


@register(
    "source_iceberg_v3_default_values",
    oracle=f"""
        SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'UNASSIGNED'
                    ELSE 'R' || CAST(o_orderkey % 3 AS VARCHAR)
               END AS region,
               CAST(count(*) AS BIGINT) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue,
               {sql_dsum('0.05')} AS discount_total,
               CAST(2 AS INT) AS data_files,
               TRUE AS id_resolution_ok
        FROM orders
        GROUP BY region
        ORDER BY region
    """,
    tags=("source", "iceberg", "lakehouse", "v3", "default-values",
          "schema-evolution"),
)
def source_iceberg_v3_default_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg v3 SCHEMA DEFAULT VALUES: columns added after data was
    written read back as ``initial-default`` over the old files —
    not null, which is what v1/v2 add-column gives and what a naive
    reader produces.

    The fixture's current schema has four fields; the OLD data file
    (even keys) carries only ids 1-2, the NEW file (odd keys) also
    carries id 3 (``region``) — under the physical name ``r-x``, so
    only FIELD-ID resolution finds it — and id 4 (``discount``,
    initial-default 0.05) exists in NO file, proving the fill is a
    pure metadata projection. ``region``'s initial-default
    'UNASSIGNED' must surface for every old-file row; its
    write-default ('R0') must be IGNORED by the read path — filling
    it instead changes the group keys and flips the hash. The oracle
    recomputes the per-file visibility split from the raw table.
    `iceberg_format_gate` passes v3 here with ``default-values``
    declared supported; row lineage stays loud.

    Scale posture: the default fill is a constant-folded literal in
    the per-file projection; the scan stays a plain parquet read
    with column pruning intact (absent columns never touch I/O).

    Reference: extends the repo's Iceberg surface (SURVEY.md §2B);
    the reference engine has no lakehouse layer."""
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from spark_hive_spark.operators.avro import (
        encode_avro_ocf,
        parse_avro_ocf,
    )
    from spark_hive_spark.sources.evolution import (
        iceberg_entry_content_gate,
        iceberg_format_gate,
    )
    from spark_hive_spark.sources.parquet_meta import (
        decode_footer,
        leaf_field_ids,
    )

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_icev3def_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    def _fid_field(name: str, typ, fid: int) -> "_pa.Field":
        return _pa.field(
            name, typ, metadata={b"PARQUET:field_id": str(fid).encode()}
        )

    # OLD file: written before `region`/`discount` existed (ids 1-2)
    old = orders.filter(F.col("o_orderkey") % 2 == 0).toArrow()
    _pq.write_table(
        _pa.table(
            {"o_orderkey": old["o_orderkey"],
             "o_totalprice": old["o_totalprice"]},
            schema=_pa.schema([
                _fid_field("o_orderkey", _pa.int64(), 1),
                _fid_field("o_totalprice", _pa.float64(), 2),
            ]),
        ),
        os.path.join(ddir, "old.parquet"),
    )
    # NEW file: carries `region` (id 3) under physical name 'r-x' —
    # name-based resolution cannot find it
    new_df = (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .withColumn(
            "region",
            F.concat(F.lit("R"),
                     (F.col("o_orderkey") % 3).cast("string")),
        )
    )
    new = new_df.toArrow()
    _pq.write_table(
        _pa.table(
            {"o_orderkey": new["o_orderkey"],
             "o_totalprice": new["o_totalprice"],
             "r-x": new["region"]},
            schema=_pa.schema([
                _fid_field("o_orderkey", _pa.int64(), 1),
                _fid_field("o_totalprice", _pa.float64(), 2),
                _fid_field("r-x", _pa.string(), 3),
            ]),
        ),
        os.path.join(ddir, "new.parquet"),
    )

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "long"},
            {"name": "file_path", "type": "string"},
            {"name": "content", "type": "long"},
        ],
    }
    mlist_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "content", "type": "long"},
            {"name": "added_snapshot_id", "type": "long"},
        ],
    }
    m1 = os.path.join(mdir, "m1.avro")
    with open(m1, "wb") as fh:
        fh.write(encode_avro_ocf([
            {"status": 1, "file_path": "old.parquet", "content": 0},
            {"status": 1, "file_path": "new.parquet", "content": 0},
        ], entry_schema, codec="deflate"))
    ml1 = os.path.join(mdir, "snap-1.avro")
    with open(ml1, "wb") as fh:
        fh.write(encode_avro_ocf([
            {"manifest_path": m1, "content": 0, "added_snapshot_id": 1},
        ], mlist_schema, codec="snappy"))
    with open(os.path.join(mdir, "v3.metadata.json"), "w") as fh:
        json.dump({
            "format-version": 3,
            "current-snapshot-id": 1,
            "current-schema-id": 1,
            "schemas": [{
                "schema-id": 1,
                "type": "struct",
                "fields": [
                    {"id": 1, "name": "o_orderkey", "required": True,
                     "type": "long"},
                    {"id": 2, "name": "o_totalprice",
                     "required": False, "type": "double"},
                    {"id": 3, "name": "region", "required": False,
                     "type": "string",
                     "initial-default": "UNASSIGNED",
                     "write-default": "R0"},
                    {"id": 4, "name": "discount", "required": False,
                     "type": "double", "initial-default": 0.05},
                ],
            }],
            "snapshots": [
                {"snapshot-id": 1, "manifest-list": ml1},
            ],
        }, fh)

    # ---- the reader ----
    with open(os.path.join(mdir, "v3.metadata.json")) as fh:
        md = json.load(fh)
    iceberg_format_gate(md, supported=frozenset({"default-values"}))
    schema = next(
        s for s in md["schemas"]
        if s["schema-id"] == md["current-schema-id"]
    )
    current = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    with open(current["manifest-list"], "rb") as fh:
        _, manifest_rows = parse_avro_ocf(fh.read())
    data_files: list[str] = []
    for mrow in manifest_rows:
        with open(mrow["manifest_path"], "rb") as fh:
            _, entries = parse_avro_ocf(fh.read())
        for e in entries:
            iceberg_entry_content_gate(e)
            if e["status"] != 1:
                raise ValueError(f"unexpected status {e['status']}")
            data_files.append(e["file_path"])

    parts = []
    saw_id_only_region = False
    for p in sorted(data_files):
        with open(os.path.join(ddir, p), "rb") as fh:
            foot = decode_footer(fh.read())
        fids = leaf_field_ids(foot[2])
        # the fixture's point: `region` is findable by id 3 but not
        # by its logical name anywhere in the physical schema
        if 3 in set(fids.values()) and "region" not in fids:
            saw_id_only_region = True
        parts.append(
            spark.read.parquet(os.path.join(ddir, p)).select(
                *iceberg_default_fill_select(schema["fields"], fids)
            )
        )
    scan = parts[0]
    for df in parts[1:]:
        scan = scan.unionByName(df)
    out = (
        scan.groupBy("region")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
            dsum("discount").alias("discount_total"),
            F.lit(len(data_files)).cast("int").alias("data_files"),
            F.lit(bool(saw_id_only_region)).alias("id_resolution_ok"),
        )
        .orderBy("region")
        .localCheckpoint(eager=True)  # 4 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


def inherit_first_row_ids(
    manifest_first_row_id: int | None, entries: list[dict]
) -> tuple[list[dict], int]:
    """Spec §Row Lineage first-row-id INHERITANCE over one
    manifest's data-file entries: a null ``first_row_id`` entry is
    assigned the manifest's ``first_row_id`` plus the record counts
    of the PRIOR null entries (the shape every fresh commit writes);
    explicit values pass through untouched and do NOT advance the
    assignment cursor. Returns the resolved entries and how many
    inherited — O(#entries) planning arithmetic, no data touched."""
    out: list[dict] = []
    inherited = 0
    next_assign = manifest_first_row_id
    for e in entries:
        if e.get("first_row_id") is None:
            if next_assign is None:
                raise ValueError(
                    "null first_row_id but the manifest carries "
                    "no first-row-id to inherit from"
                )
            e = {**e, "first_row_id": next_assign}
            next_assign += e["record_count"]
            inherited += 1
        out.append(e)
    return out, inherited



@register(
    "source_iceberg_v3_row_lineage",
    oracle=f"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(1 AS INT) AS inherited_files,
               CAST(count(*) AS BIGINT) AS distinct_row_ids,
               CAST(0 AS BIGINT) AS min_row_id,
               CAST(count(*) - 1 AS BIGINT) AS max_row_id,
               CAST((count(*) * (count(*) - 1)) // 2 AS BIGINT)
                   AS sum_row_id,
               CAST(sum(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0
                        END) AS BIGINT) AS rows_seq1,
               CAST(sum(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0
                        END) AS BIGINT) AS rows_seq2,
               TRUE AS lineage_ok,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders
    """,
    tags=("source", "iceberg", "lakehouse", "v3", "row-lineage"),
)
def source_iceberg_v3_row_lineage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg v3 ROW LINEAGE: materialize the virtual ``_row_id``
    and ``_last_updated_sequence_number`` columns. Per the v3 spec,
    each data file is assigned ``first_row_id`` at commit from the
    table's monotonically increasing ``next-row-id``; a row's
    ``_row_id`` is ``first_row_id + position in file`` and its
    ``_last_updated_sequence_number`` is the file's data sequence
    number. Lineage survives rewrites by carrying these through.
    Round-15 addendum: the spec's INHERITANCE rule is implemented —
    a manifest entry with null ``first_row_id`` is assigned
    ``manifest.first_row_id`` plus the record counts of the PRIOR
    null-first_row_id entries in that manifest (the shape every
    fresh commit writes); explicit values (rewritten manifests
    carrying existing files forward) pass through untouched.

    File A (even keys) carries an EXPLICIT first_row_id 0 at
    sequence 1 (the carried-forward shape); file B (odd keys) has
    first_row_id NULL and inherits rows(A) from the manifest's
    first-row-id (the fresh-commit shape); ``next-row-id`` must
    cover the assigned span — the reader validates the invariants
    (non-overlapping [first_row_id, first_row_id + record_count)
    ranges, counter coverage) and pins them in ``lineage_ok``
    together with the inherited-file count. The aggregate pins
    exactness: N distinct row ids, min 0, max N-1, arithmetic-series
    sum, and per-sequence row counts — any positional slip (0/1-based, per-file reset,
    wrong span) breaks the sum or distinct count against the oracle.

    Scale posture: ``_row_id`` is ``lit(first_row_id) +
    _metadata.row_index`` — generated scan-side per partition,
    whole-stage codegen, no shuffle, no driver materialization; the
    validation is O(#files) planning arithmetic.

    Reference: extends the repo's Iceberg surface (SURVEY.md §2B);
    the reference engine has no lakehouse layer."""
    from spark_hive_spark.operators.avro import (
        encode_avro_ocf,
        parse_avro_ocf,
    )
    from spark_hive_spark.sources.evolution import iceberg_format_gate
    from spark_hive_spark.sources.staging import stage_single_parquet

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_icev3rl_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    from spark_hive_spark.scratch import run_parallel

    k = F.col("o_orderkey") % 2
    run_parallel(
        lambda: stage_single_parquet(
            orders.filter(k == 0), root, ddir, "A.parquet"
        ),
        lambda: stage_single_parquet(
            orders.filter(k == 1), root, ddir, "B.parquet"
        ),
    )
    # record counts from the staged files' own footers (no Spark jobs)
    import pyarrow.parquet as _pq

    n_a = _pq.read_metadata(os.path.join(ddir, "A.parquet")).num_rows
    n_b = _pq.read_metadata(os.path.join(ddir, "B.parquet")).num_rows

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "long"},
            {"name": "file_path", "type": "string"},
            {"name": "content", "type": "long"},
            {"name": "record_count", "type": "long"},
            {"name": "first_row_id", "type": ["null", "long"]},
            {"name": "sequence_number", "type": "long"},
        ],
    }
    mlist_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "content", "type": "long"},
            {"name": "added_snapshot_id", "type": "long"},
            {"name": "first_row_id", "type": ["null", "long"]},
        ],
    }
    m1 = os.path.join(mdir, "m1.avro")
    with open(m1, "wb") as fh:
        fh.write(encode_avro_ocf([
            {"status": 1, "file_path": "A.parquet", "content": 0,
             "record_count": n_a, "first_row_id": 0,
             "sequence_number": 1},
            # fresh-commit shape: null first_row_id, inherited from
            # the manifest's first-row-id at read time
            {"status": 1, "file_path": "B.parquet", "content": 0,
             "record_count": n_b, "first_row_id": None,
             "sequence_number": 2},
        ], entry_schema, codec="deflate"))
    ml = os.path.join(mdir, "snap-2.avro")
    with open(ml, "wb") as fh:
        fh.write(encode_avro_ocf([
            {"manifest_path": m1, "content": 0,
             "added_snapshot_id": 2, "first_row_id": n_a},
        ], mlist_schema, codec="snappy"))
    with open(os.path.join(mdir, "v3.metadata.json"), "w") as fh:
        json.dump({
            "format-version": 3,
            "row-lineage": True,
            "next-row-id": n_a + n_b,
            "current-snapshot-id": 2,
            "snapshots": [
                {"snapshot-id": 2, "manifest-list": ml},
            ],
        }, fh)

    # ---- the reader ----
    with open(os.path.join(mdir, "v3.metadata.json")) as fh:
        md = json.load(fh)
    iceberg_format_gate(md, supported=frozenset({"row-lineage"}))
    current = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    with open(current["manifest-list"], "rb") as fh:
        _, manifest_rows = parse_avro_ocf(fh.read())
    files: list[dict] = []
    inherited = 0
    for mrow in manifest_rows:
        with open(mrow["manifest_path"], "rb") as fh:
            _, entries = parse_avro_ocf(fh.read())
        for e in entries:
            if e["status"] != 1 or e["content"] != 0:
                raise ValueError("unexpected manifest entry")
        resolved, n_inh = inherit_first_row_ids(
            mrow.get("first_row_id"), entries
        )
        files += resolved
        inherited += n_inh

    # validate the lineage invariants: disjoint id ranges covered by
    # the table's next-row-id counter
    spans = sorted(
        (e["first_row_id"], e["first_row_id"] + e["record_count"])
        for e in files
    )
    disjoint = all(
        spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)
    )
    lineage_ok = bool(
        disjoint and md["next-row-id"] >= spans[-1][1]
    )

    parts = [
        spark.read.parquet(os.path.join(ddir, e["file_path"])).select(
            "o_orderkey",
            "o_totalprice",
            (F.lit(e["first_row_id"])
             + F.col("_metadata.row_index")).alias("_row_id"),
            F.lit(e["sequence_number"]).cast("bigint")
            .alias("_last_updated_sequence_number"),
        )
        for e in files
    ]
    scan = parts[0]
    for df in parts[1:]:
        scan = scan.unionByName(df)
    out = scan.agg(
        F.count("*").alias("n_rows"),
        F.lit(inherited).cast("int").alias("inherited_files"),
        F.countDistinct("_row_id").alias("distinct_row_ids"),
        F.min("_row_id").cast("bigint").alias("min_row_id"),
        F.max("_row_id").cast("bigint").alias("max_row_id"),
        F.sum("_row_id").cast("bigint").alias("sum_row_id"),
        F.sum(
            (F.col("_last_updated_sequence_number") == 1).cast("long")
        ).cast("bigint").alias("rows_seq1"),
        F.sum(
            (F.col("_last_updated_sequence_number") == 2).cast("long")
        ).cast("bigint").alias("rows_seq2"),
        F.lit(lineage_ok).alias("lineage_ok"),
        dsum("o_totalprice").alias("revenue"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_iceberg_v3_row_lineage_rewrite",
    oracle=f"""
        WITH na AS (
            SELECT count(*) AS v FROM orders WHERE o_orderkey % 2 = 0
        ),
        n AS (SELECT count(*) AS v FROM orders),
        u AS (
            SELECT o_orderkey, o_totalprice,
                   CASE WHEN o_orderkey % 2 = 0
                        THEN o_orderkey // 2
                        ELSE (SELECT v FROM na)
                             + (o_orderkey - 1) // 2
                   END AS rid,
                   1 AS seq
            FROM orders
            UNION ALL
            SELECT o_orderkey, o_totalprice,
                   2 * (SELECT v FROM n) + o_orderkey AS rid,
                   3 AS seq
            FROM orders WHERE o_orderkey < 100
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(2 AS INT) AS inherited_entries,
               CAST(count(DISTINCT rid) AS BIGINT)
                   AS distinct_row_ids,
               CAST(max(CASE WHEN seq = 1 THEN rid END) AS BIGINT)
                   AS compacted_max_id,
               CAST(min(CASE WHEN seq = 3 THEN rid END) AS BIGINT)
                   AS fresh_min_id,
               CAST(max(CASE WHEN seq = 3 THEN rid END) AS BIGINT)
                   AS fresh_max_id,
               CAST(sum(rid) AS BIGINT) AS sum_row_id,
               CAST(sum(rid * (o_orderkey % 97)) AS BIGINT)
                   AS binding,
               CAST(sum(CASE WHEN seq = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS rows_seq1,
               CAST(sum(CASE WHEN seq = 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS rows_seq3,
               TRUE AS watermark_ok,
               TRUE AS lineage_ok,
               {sql_dsum('o_totalprice')} AS revenue
        FROM u
    """,
    tags=("source", "iceberg", "lakehouse", "v3", "row-lineage"),
)
def source_iceberg_v3_row_lineage_rewrite(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg v3 row lineage SURVIVING A COMPACTION REWRITE (round
    19, r18 verdict #1) — the full three-commit lifecycle the
    scan-side query (`source_iceberg_v3_row_lineage`) leaves open,
    mirroring the Delta twin `source_delta_row_tracking` (r17):

    - **commit 1** (seq 1): fresh files A (even keys) and B (odd
      keys), both sorted by key, null ``first_row_id`` in the
      manifest — inheritance assigns A ``[0, n_a)`` and B
      ``[n_a, n)`` from the manifest's first-row-id 0;
    - **commit 2** (seq 2): COMPACTION rewrites A+B into C. Per
      spec §Row Lineage, the rewrite writer MATERIALIZES ``_row_id``
      and ``_last_updated_sequence_number`` into C's data (original
      ids, seq stays 1 — compaction is not an update); C's manifest
      entry still inherits a fresh assigned range ``[n, 2n)`` which
      no row uses — the counter advances for every added file
      regardless (the spec's wasted-range rule);
    - **commit 3** (seq 3): fresh append D (keys < 100, sorted)
      with ALL-NULL materialized columns — the reader's per-row
      ``coalesce(materialized, first_row_id + _metadata.row_index)``
      must fall through to the virtual path, deriving ids from
      ``[2n, 2n + n_d)`` — ``fresh_min_id = 2n`` attests D's
      assignment accounts for C's wasted range.

    The per-row BINDING aggregate (sum of row_id × key-residue mod
    97) pins that each row kept ITS id through the rewrite, not
    merely the id set; ``watermark_ok`` attests the table's
    ``next-row-id`` equals the top assigned span end and snapshot
    ``first-row-id``s are strictly monotone; ``lineage_ok`` attests
    the live assigned ranges are disjoint and counter-covered.

    Scale posture: id materialization is ``coalesce`` over a scan
    column and per-partition arithmetic — whole-stage codegen, no
    shuffle, no driver row traffic; inheritance is O(#entries)
    planning arithmetic, exactly how a 100 TB reader wants it."""
    from spark_hive_spark.operators.avro import (
        encode_avro_ocf,
        parse_avro_ocf,
    )
    from spark_hive_spark.sources.evolution import iceberg_format_gate
    from spark_hive_spark.sources.staging import stage_single_parquet

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_icev3rlr_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    from spark_hive_spark.scratch import run_parallel

    k = F.col("o_orderkey") % 2
    n_a, n = run_parallel(
        lambda: orders.filter(k == 0).count(),
        lambda: orders.count(),
    )

    # commit 2: the compaction writer materializes the ORIGINAL ids
    # (position within the sorted original file: even k -> k/2, odd
    # k -> n_a + (k-1)/2 — dense keys) and the original seq number
    okey = F.col("o_orderkey")
    # original id = position within the sorted original file, via a
    # per-parity rank (== k/2 and n_a+(k-1)/2 on the dense testdata
    # keys the oracle assumes, but also correct on gapped-key scale
    # fixtures — fixture-writer cost, not reader cost)
    from pyspark.sql import Window as _W

    pos = F.row_number().over(
        _W.partitionBy(k).orderBy(okey)
    ) - 1
    orig_id = F.when(k == 0, pos) \
        .otherwise(F.lit(n_a) + pos).cast("long")
    fresh = orders.filter(okey < 100).sort("o_orderkey")

    # the four data-file stages are independent (commit 1's A/B exist
    # so the fixture is honest about what the compaction replaced —
    # the reader never scans them; commit 2's C materializes original
    # ids; commit 3's D is the fresh all-null append) — overlapped
    def _stage_d() -> int:
        n_d = fresh.count()
        stage_single_parquet(
            fresh.select(
                "o_orderkey", "o_totalprice",
                F.lit(None).cast("long").alias("_row_id"),
                F.lit(None).cast("long")
                .alias("_last_updated_sequence_number"),
            ),
            root, ddir, "D.parquet",
        )
        return n_d

    _, _, _, n_d = run_parallel(
        lambda: stage_single_parquet(
            orders.filter(k == 0).sort("o_orderkey"), root, ddir,
            "A.parquet",
        ),
        lambda: stage_single_parquet(
            orders.filter(k == 1).sort("o_orderkey"), root, ddir,
            "B.parquet",
        ),
        lambda: stage_single_parquet(
            orders.sort("o_orderkey").select(
                "o_orderkey", "o_totalprice",
                orig_id.alias("_row_id"),
                F.lit(1).cast("long")
                .alias("_last_updated_sequence_number"),
            ),
            root, ddir, "C.parquet",
        ),
        _stage_d,
    )

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "long"},
            {"name": "file_path", "type": "string"},
            {"name": "content", "type": "long"},
            {"name": "record_count", "type": "long"},
            {"name": "first_row_id", "type": ["null", "long"]},
            {"name": "sequence_number", "type": "long"},
        ],
    }
    mlist_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "content", "type": "long"},
            {"name": "added_snapshot_id", "type": "long"},
            {"name": "first_row_id", "type": ["null", "long"]},
        ],
    }

    def _manifest(name: str, entries: list[dict]) -> str:
        path = os.path.join(mdir, name)
        with open(path, "wb") as fh:
            fh.write(encode_avro_ocf(
                entries, entry_schema, codec="deflate"
            ))
        return path

    def _mlist(name: str, rows: list[dict]) -> str:
        path = os.path.join(mdir, name)
        with open(path, "wb") as fh:
            fh.write(encode_avro_ocf(
                rows, mlist_schema, codec="snappy"
            ))
        return path

    m2 = _manifest("m2.avro", [
        {"status": 1, "file_path": "C.parquet", "content": 0,
         "record_count": n, "first_row_id": None,
         "sequence_number": 2},
    ])
    m3 = _manifest("m3.avro", [
        {"status": 1, "file_path": "D.parquet", "content": 0,
         "record_count": n_d, "first_row_id": None,
         "sequence_number": 3},
    ])
    ml3 = _mlist("snap-3.avro", [
        {"manifest_path": m2, "content": 0,
         "added_snapshot_id": 2, "first_row_id": n},
        {"manifest_path": m3, "content": 0,
         "added_snapshot_id": 3, "first_row_id": 2 * n},
    ])
    with open(os.path.join(mdir, "v3.metadata.json"), "w") as fh:
        json.dump({
            "format-version": 3,
            "row-lineage": True,
            "next-row-id": 2 * n + n_d,
            "current-snapshot-id": 3,
            "snapshots": [
                {"snapshot-id": 1, "first-row-id": 0,
                 "manifest-list": "gone-1.avro"},
                {"snapshot-id": 2, "first-row-id": n,
                 "manifest-list": "gone-2.avro"},
                {"snapshot-id": 3, "first-row-id": 2 * n,
                 "manifest-list": ml3},
            ],
        }, fh)

    # ---- the reader ----
    with open(os.path.join(mdir, "v3.metadata.json")) as fh:
        md = json.load(fh)
    iceberg_format_gate(md, supported=frozenset({"row-lineage"}))
    current = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    with open(current["manifest-list"], "rb") as fh:
        _, manifest_rows = parse_avro_ocf(fh.read())
    files: list[dict] = []
    inherited = 0
    for mrow in manifest_rows:
        with open(mrow["manifest_path"], "rb") as fh:
            _, entries = parse_avro_ocf(fh.read())
        for e in entries:
            if e["status"] != 1 or e["content"] != 0:
                raise ValueError("unexpected manifest entry")
        resolved, n_inh = inherit_first_row_ids(
            mrow.get("first_row_id"), entries
        )
        files += resolved
        inherited += n_inh

    spans = sorted(
        (e["first_row_id"], e["first_row_id"] + e["record_count"])
        for e in files
    )
    disjoint = all(
        spans[i][1] <= spans[i + 1][0] for i in range(len(spans) - 1)
    )
    lineage_ok = bool(
        disjoint and md["next-row-id"] >= spans[-1][1]
    )
    frids = [
        s.get("first-row-id")
        for s in sorted(md["snapshots"], key=lambda s: s["snapshot-id"])
    ]
    watermark_ok = bool(
        md["next-row-id"] == spans[-1][1]
        and all(frids[i] < frids[i + 1] for i in range(len(frids) - 1))
    )

    parts = []
    for e in files:
        df = spark.read.parquet(os.path.join(ddir, e["file_path"]))
        base = (
            F.lit(e["first_row_id"]) + F.col("_metadata.row_index")
        ).cast("long")
        seq_dflt = F.lit(e["sequence_number"]).cast("long")
        if "_row_id" in df.columns:  # rewritten: materialized wins
            rid = F.coalesce(F.col("_row_id").cast("long"), base)
            seq = F.coalesce(
                F.col("_last_updated_sequence_number").cast("long"),
                seq_dflt,
            )
        else:
            rid, seq = base, seq_dflt
        parts.append(df.select(
            "o_orderkey", "o_totalprice",
            rid.alias("rid"), seq.alias("seq"),
        ))
    scan = parts[0]
    for df in parts[1:]:
        scan = scan.unionByName(df)
    seq1 = F.col("seq") == 1
    seq3 = F.col("seq") == 3
    out = scan.agg(
        F.count("*").alias("n_rows"),
        F.lit(inherited).cast("int").alias("inherited_entries"),
        F.countDistinct("rid").alias("distinct_row_ids"),
        F.max(F.when(seq1, F.col("rid"))).cast("bigint")
        .alias("compacted_max_id"),
        F.min(F.when(seq3, F.col("rid"))).cast("bigint")
        .alias("fresh_min_id"),
        F.max(F.when(seq3, F.col("rid"))).cast("bigint")
        .alias("fresh_max_id"),
        F.sum("rid").cast("bigint").alias("sum_row_id"),
        F.sum(F.col("rid") * (F.col("o_orderkey") % 97))
        .cast("bigint").alias("binding"),
        F.sum(seq1.cast("long")).cast("bigint").alias("rows_seq1"),
        F.sum(seq3.cast("long")).cast("bigint").alias("rows_seq3"),
        F.lit(watermark_ok).alias("watermark_ok"),
        F.lit(lineage_ok).alias("lineage_ok"),
        dsum("o_totalprice").alias("revenue"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_iceberg_v3_row_lineage_dv",
    oracle=f"""
        WITH na AS (
            SELECT count(*) AS v FROM orders WHERE o_orderkey % 2 = 0
        ),
        s AS (
            SELECT o_orderkey, o_totalprice,
                   CASE WHEN o_orderkey % 2 = 0
                        THEN o_orderkey // 2
                        ELSE (SELECT v FROM na)
                             + (o_orderkey - 1) // 2
                   END AS rid
            FROM orders WHERE o_orderkey % 10 <> 7
        )
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST((SELECT count(*) FROM orders
                     WHERE o_orderkey % 10 = 7) AS BIGINT)
                   AS deleted_rows,
               CAST(count(DISTINCT rid) AS BIGINT)
                   AS distinct_row_ids,
               CAST(min(rid) AS BIGINT) AS min_row_id,
               CAST(max(rid) AS BIGINT) AS max_row_id,
               CAST(sum(rid) AS BIGINT) AS sum_row_id,
               CAST(sum(rid * (o_orderkey % 97)) AS BIGINT)
                   AS binding,
               TRUE AS integrity_ok,
               {sql_dsum('o_totalprice')} AS revenue
        FROM s
    """,
    tags=("source", "iceberg", "lakehouse", "v3", "row-lineage",
          "deletion-vectors", "puffin"),
)
def source_iceberg_v3_row_lineage_dv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg v3 ROW LINEAGE × DELETION VECTORS (round 19, the r18
    verdict #1 stretch half): both v3 features active on ONE table —
    a compacted file C carrying MATERIALIZED ``_row_id``s (original
    commit-1 ids, so file position ≠ row id: position of key k is k,
    its id is k/2 or n_a+(k-1)/2) plus a Puffin deletion-vector blob
    deleting every position whose row has ``o_orderkey % 10 = 7``.

    The compose traps the two addressing regimes against each other:
    the DV addresses file POSITIONS (``_metadata.row_index``) while
    lineage ids are the materialized column — a reader that
    anti-joins on ``_row_id`` instead of position deletes the WRONG
    rows (flipping binding and revenue), and one that re-mints ids
    from first_row_id + position after the delete breaks
    ``sum_row_id`` (survivor ids are a gappy subset of the original
    range, never renumbered). ``integrity_ok`` carries the Puffin
    footer cross-checks (manifest offset/size vs footer directory,
    cardinality property vs decoded bitmap).

    Scale posture: DV positions broadcast into a left-anti join
    against scan-side metadata columns (no shuffle of the fact
    side); id resolution is a per-partition ``coalesce`` —
    whole-stage codegen end to end.

    Spec: iceberg.apache.org/spec §Row Lineage + §Deletion Vectors;
    the reference engine has no lakehouse layer (SURVEY.md §2B)."""
    from spark_hive_spark.operators.avro import (
        encode_avro_ocf,
        parse_avro_ocf,
    )
    from spark_hive_spark.sources.evolution import iceberg_format_gate
    from spark_hive_spark.sources.puffin import (
        dv_blob_decode,
        dv_blob_encode,
        puffin_read,
        puffin_write,
    )
    from spark_hive_spark.sources.staging import stage_single_parquet

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_icev3rldv_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    from spark_hive_spark.scratch import run_parallel

    okey = F.col("o_orderkey")
    k = okey % 2
    n_a, n = run_parallel(
        lambda: orders.filter(k == 0).count(),
        lambda: orders.count(),
    )
    from pyspark.sql import Window as _W

    # per-parity rank == the dense-key closed form at oracle SFs,
    # correct on gapped-key scale fixtures too
    pos = F.row_number().over(
        _W.partitionBy(k).orderBy(okey)
    ) - 1
    orig_id = F.when(k == 0, pos) \
        .otherwise(F.lit(n_a) + pos).cast("long")
    stage_single_parquet(
        orders.sort("o_orderkey").select(
            "o_orderkey", "o_totalprice",
            orig_id.alias("_row_id"),
            F.lit(1).cast("long")
            .alias("_last_updated_sequence_number"),
        ),
        root, ddir, "C.parquet",
    )

    # the DV writer reads positions from the file itself — never
    # assumes the dense-key coincidence the reader must not rely on
    pos = sorted(
        r["pos"]
        for r in spark.read.parquet(os.path.join(ddir, "C.parquet"))
        .select(F.col("_metadata.row_index").alias("pos"))
        .filter(okey % 10 == 7)
        .collect()
    )
    puffin_path = os.path.join(ddir, "deletes.puffin")
    blob_meta = puffin_write(puffin_path, blobs=[
        (dv_blob_encode(pos), {
            "type": "deletion-vector-v1", "fields": [2147483546],
            "snapshot-id": 3, "sequence-number": 3,
            "properties": {"referenced-data-file": "C.parquet",
                           "cardinality": str(len(pos))},
        }),
    ])[0]

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "long"},
            {"name": "file_path", "type": "string"},
            {"name": "content", "type": "long"},
            {"name": "file_format", "type": "string"},
            {"name": "record_count", "type": "long"},
            {"name": "first_row_id", "type": ["null", "long"]},
            {"name": "sequence_number", "type": "long"},
            {"name": "referenced_data_file",
             "type": ["null", "string"]},
            {"name": "content_offset", "type": ["null", "long"]},
            {"name": "content_size_in_bytes",
             "type": ["null", "long"]},
        ],
    }
    mlist_schema = {
        "type": "record",
        "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string"},
            {"name": "content", "type": "long"},
            {"name": "added_snapshot_id", "type": "long"},
            {"name": "first_row_id", "type": ["null", "long"]},
        ],
    }

    def _manifest(name: str, entries: list[dict]) -> str:
        path = os.path.join(mdir, name)
        defaults = {"referenced_data_file": None,
                    "content_offset": None,
                    "content_size_in_bytes": None}
        with open(path, "wb") as fh:
            fh.write(encode_avro_ocf(
                [{**defaults, **e} for e in entries],
                entry_schema, codec="deflate",
            ))
        return path

    m_data = _manifest("m-data.avro", [
        {"status": 1, "file_path": "C.parquet", "content": 0,
         "file_format": "PARQUET", "record_count": n,
         "first_row_id": None, "sequence_number": 2},
    ])
    m_del = _manifest("m-del.avro", [
        {"status": 1, "file_path": "deletes.puffin", "content": 1,
         "file_format": "PUFFIN", "record_count": len(pos),
         "first_row_id": None, "sequence_number": 3,
         "referenced_data_file": "C.parquet",
         "content_offset": blob_meta["offset"],
         "content_size_in_bytes": blob_meta["length"]},
    ])
    ml = os.path.join(mdir, "snap-3.avro")
    with open(ml, "wb") as fh:
        fh.write(encode_avro_ocf([
            {"manifest_path": m_data, "content": 0,
             "added_snapshot_id": 2, "first_row_id": n},
            {"manifest_path": m_del, "content": 1,
             "added_snapshot_id": 3, "first_row_id": None},
        ], mlist_schema, codec="snappy"))
    with open(os.path.join(mdir, "v3.metadata.json"), "w") as fh:
        json.dump({
            "format-version": 3,
            "row-lineage": True,
            "next-row-id": 2 * n,
            "current-snapshot-id": 3,
            "snapshots": [{"snapshot-id": 3, "manifest-list": ml}],
        }, fh)

    # ---- the reader ----
    with open(os.path.join(mdir, "v3.metadata.json")) as fh:
        md = json.load(fh)
    iceberg_format_gate(
        md, supported=frozenset({"row-lineage", "deletion-vectors"})
    )
    current = next(
        s for s in md["snapshots"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    with open(current["manifest-list"], "rb") as fh:
        _, manifest_rows = parse_avro_ocf(fh.read())
    data_entries: list[dict] = []
    dv_entries: list[dict] = []
    for mrow in manifest_rows:
        with open(mrow["manifest_path"], "rb") as fh:
            _, entries = parse_avro_ocf(fh.read())
        for e in entries:
            if e["status"] != 1:
                raise ValueError("unexpected manifest entry status")
        if mrow["content"] == 0:
            resolved, _ = inherit_first_row_ids(
                mrow.get("first_row_id"), entries
            )
            data_entries += resolved
        else:
            for e in entries:
                if e["file_format"] != "PUFFIN":
                    raise NotImplementedError(
                        f"v3 delete file format {e['file_format']}"
                    )
                dv_entries.append(e)

    deletes: list[tuple[str, int]] = []
    integrity_ok = True
    for e in dv_entries:
        raw, blobs = puffin_read(os.path.join(ddir, e["file_path"]))
        bm = next(
            (b for b in blobs if b["offset"] == e["content_offset"]),
            None,
        )
        if bm is None or bm["type"] != "deletion-vector-v1":
            raise ValueError("manifest DV entry unmatched in footer")
        integrity_ok &= (
            bm["length"] == e["content_size_in_bytes"]
            and bm["properties"]["referenced-data-file"]
                == e["referenced_data_file"]
        )
        positions = dv_blob_decode(
            raw[bm["offset"] : bm["offset"] + bm["length"]]
        )
        integrity_ok &= (
            int(bm["properties"]["cardinality"]) == len(positions)
        )
        deletes += [
            (e["referenced_data_file"], p) for p in positions
        ]

    parts = []
    for e in data_entries:
        df = spark.read.parquet(os.path.join(ddir, e["file_path"]))
        base = (
            F.lit(e["first_row_id"]) + F.col("_metadata.row_index")
        ).cast("long")
        rid = (
            F.coalesce(F.col("_row_id").cast("long"), base)
            if "_row_id" in df.columns else base
        )
        parts.append(df.select(
            "o_orderkey", "o_totalprice", rid.alias("rid"),
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("fname"),
            F.col("_metadata.row_index").alias("pos"),
        ))
    scan = parts[0]
    for df in parts[1:]:
        scan = scan.unionByName(df)
    dels = spark.createDataFrame(
        deletes, "file_path string, dpos bigint"
    )
    survivors = scan.join(
        F.broadcast(dels),
        (scan["fname"] == dels["file_path"])
        & (scan["pos"] == dels["dpos"]),
        "left_anti",
    )
    out = survivors.agg(
        F.count("*").alias("n_rows"),
        F.lit(len(deletes)).cast("bigint").alias("deleted_rows"),
        F.countDistinct("rid").alias("distinct_row_ids"),
        F.min("rid").cast("bigint").alias("min_row_id"),
        F.max("rid").cast("bigint").alias("max_row_id"),
        F.sum("rid").cast("bigint").alias("sum_row_id"),
        F.sum(F.col("rid") * (F.col("o_orderkey") % 97))
        .cast("bigint").alias("binding"),
        F.lit(bool(integrity_ok)).alias("integrity_ok"),
        dsum("o_totalprice").alias("revenue"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_iceberg_partition_stats",
    oracle=f"""
        SELECT o_orderpriority AS part_value,
               CAST(0 AS INT) AS spec_id,
               CAST(count(*) AS BIGINT) AS data_record_count,
               CAST(2 AS BIGINT) AS data_file_count,
               CAST(CASE WHEN o_orderpriority = '1-URGENT'
                    THEN (SELECT count(*) FROM orders
                          WHERE o_orderkey % 50 = 0
                            AND o_orderpriority = '1-URGENT')
                    ELSE 0 END AS BIGINT)
                   AS position_delete_record_count,
               CAST(CASE WHEN o_orderpriority = '1-URGENT'
                    THEN 1 ELSE 0 END AS BIGINT)
                   AS position_delete_file_count,
               CAST(1 AS BIGINT) AS last_updated_snapshot_id,
               TRUE AS counts_ok,
               TRUE AS size_ok,
               TRUE AS registry_ok
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("source", "iceberg", "lakehouse", "stats", "partition"),
)
def source_iceberg_partition_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg PARTITION STATISTICS files (round 19, r18 verdict #2
    — zero prior code). Spec §Partition Statistics: table metadata's
    ``partition-statistics`` list registers one stats file per
    snapshot (``snapshot-id`` / ``statistics-path`` /
    ``file-size-in-bytes``); the file itself is a data-format file
    (Parquet here) with one row per partition of the UNIFIED
    partition type: ``partition`` tuple, ``spec_id``,
    ``data_record_count``, ``data_file_count``,
    ``total_data_file_size_in_bytes``, the four
    position/equality-delete counters, and the last-updated lineage
    pair. Planning reads THIS file for partition-level decisions
    instead of walking every manifest.

    The fixture partitions orders by ``o_orderpriority`` (identity
    spec, 2 data files per partition — even/odd keys) and commits a
    position-delete file against the ``1-URGENT`` partition; the
    WRITER derives the stats rows purely from MANIFEST metadata
    (record counts, file sizes — never scanning data, exactly how a
    real writer amortizes it), registers the file in metadata.json,
    and the READER re-reads it and cross-checks every row against
    EXACT per-partition aggregates recomputed from the data files
    themselves (count, distinct-file count, on-disk byte sum via
    ``_metadata.file_size``) — ``counts_ok`` / ``size_ok`` /
    ``registry_ok`` pin the file-vs-reality agreement and the
    metadata registration (path + byte size).

    Scale posture: stats derivation is O(#manifest entries) planning
    arithmetic; the verification scan is one pass over the data
    grouped by partition (map-side combine, 5-row shuffle); the
    stats file read is a 5-row parquet scan. At 100 TB the stats
    file REPLACES the manifest walk for partition pruning decisions
    — that is the feature."""
    from spark_hive_spark.operators.avro import (
        encode_avro_ocf,
        parse_avro_ocf,
    )
    from spark_hive_spark.sources.evolution import iceberg_format_gate
    from spark_hive_spark.sources.staging import stage_single_parquet

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = os.path.join(
        scratch_root(), f"shs_icepstats_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    okey = F.col("o_orderkey")
    # ONE write job for all 10 data files: repartition by the
    # (partition, parity) pair so each directory gets exactly one
    # file; partitionBy strips the dir columns, so the partition
    # value stays as a duplicated DATA column too (identity spec)
    (
        orders
        .withColumn("pdir", F.col("o_orderpriority"))
        .withColumn("parity", (okey % 2).cast("int"))
        .repartition(F.col("pdir"), F.col("parity"))
        .write.partitionBy("pdir", "parity")
        .parquet(ddir, mode="overwrite")
    )
    # manifest entries from the written files' own footers + dirents —
    # record counts and sizes are metadata a real writer already has
    # (was: a full scan + groupBy(_metadata.file_path) Spark job)
    from urllib.parse import unquote

    import pyarrow.parquet as _pq

    entries: list[dict] = []
    for base, _dirs, names in sorted(os.walk(ddir)):
        for nm in sorted(names):
            if not nm.endswith(".parquet"):
                continue
            local = os.path.join(base, nm)
            rel = os.path.relpath(local, ddir)
            # dir names carry Hive-style %-escapes for special chars.
            # ASCII-safe assumption (ADVICE r19): unquote() also undoes
            # Hive escapes the old _metadata.file_path route kept
            # escaped; identical for these fixtures' partition values
            # (letters/digits/dash/space only) — if values could ever
            # carry %-escapable characters, pin which representation
            # the manifest stores before relying on either.
            part = unquote(rel.split("/")[0].split("=", 1)[1])
            entries.append({
                "status": 1, "content": 0, "file_path": rel,
                "partition": part,
                "record_count": _pq.read_metadata(local).num_rows,
                "file_size_in_bytes": os.path.getsize(local),
            })
    # position-delete file against the 1-URGENT partition
    del_part = "1-URGENT"
    del_rows = [
        (r["fname"], r["pos"])
        for r in spark.read.parquet(
            os.path.join(ddir, f"pdir={del_part}")
        )
        .select(
            F.col("_metadata.file_path").alias("fname"),
            F.col("_metadata.row_index").alias("pos"),
        )
        .filter(okey % 50 == 0)
        .collect()
    ]
    import pandas as _pd

    dpath = os.path.join(ddir, "deletes-urgent.parquet")
    stage_single_parquet(
        # pandas-backed createDataFrame: the Arrow path writes these
        # driver-side rows ~10x faster than the Python-RDD list path
        spark.createDataFrame(
            _pd.DataFrame(del_rows, columns=["file_path", "pos"]),
            "file_path string, pos bigint",
        ),
        root, ddir, "deletes-urgent.parquet",
    )
    entries.append({
        "status": 1, "content": 1,
        "file_path": "deletes-urgent.parquet",
        "partition": del_part,
        "record_count": len(del_rows),
        "file_size_in_bytes": os.path.getsize(dpath),
    })

    entry_schema = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "long"},
            {"name": "content", "type": "long"},
            {"name": "file_path", "type": "string"},
            {"name": "partition", "type": "string"},
            {"name": "record_count", "type": "long"},
            {"name": "file_size_in_bytes", "type": "long"},
        ],
    }
    m1 = os.path.join(mdir, "m1.avro")
    with open(m1, "wb") as fh:
        fh.write(encode_avro_ocf(entries, entry_schema,
                                 codec="deflate"))

    # ---- the partition-stats WRITER: manifest metadata only ----
    with open(m1, "rb") as fh:
        _, m_entries = parse_avro_ocf(fh.read())
    stats: dict[str, dict] = {}
    for e in m_entries:
        row = stats.setdefault(e["partition"], {
            "part_value": e["partition"], "spec_id": 0,
            "data_record_count": 0, "data_file_count": 0,
            "total_data_file_size_in_bytes": 0,
            "position_delete_record_count": 0,
            "position_delete_file_count": 0,
            "equality_delete_record_count": 0,
            "equality_delete_file_count": 0,
            "last_updated_snapshot_id": 1,
        })
        if e["content"] == 0:
            row["data_record_count"] += e["record_count"]
            row["data_file_count"] += 1
            row["total_data_file_size_in_bytes"] += \
                e["file_size_in_bytes"]
        elif e["content"] == 1:
            row["position_delete_record_count"] += e["record_count"]
            row["position_delete_file_count"] += 1
        else:
            row["equality_delete_record_count"] += e["record_count"]
            row["equality_delete_file_count"] += 1
    spath = os.path.join(mdir, "partition-stats-1.parquet")
    stage_single_parquet(
        spark.createDataFrame(
            _pd.DataFrame(
                sorted(stats.values(), key=lambda r: r["part_value"])
            ),
            "part_value string, spec_id int, "
            "data_record_count bigint, data_file_count bigint, "
            "total_data_file_size_in_bytes bigint, "
            "position_delete_record_count bigint, "
            "position_delete_file_count bigint, "
            "equality_delete_record_count bigint, "
            "equality_delete_file_count bigint, "
            "last_updated_snapshot_id bigint",
        ),
        root, mdir, "partition-stats-1.parquet",
    )
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump({
            "format-version": 2,
            "current-snapshot-id": 1,
            "snapshots": [{"snapshot-id": 1, "manifest-list": m1}],
            "partition-statistics": [{
                "snapshot-id": 1,
                "statistics-path": spath,
                "file-size-in-bytes": os.path.getsize(spath),
            }],
        }, fh)

    # ---- the READER + exact cross-check ----
    with open(os.path.join(mdir, "v2.metadata.json")) as fh:
        md = json.load(fh)
    iceberg_format_gate(md)
    reg = next(
        s for s in md["partition-statistics"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    registry_ok = bool(
        os.path.getsize(reg["statistics-path"])
        == reg["file-size-in-bytes"]
    )
    stats_df = spark.read.parquet(reg["statistics-path"])

    data_files = sorted(
        os.path.join(ddir, e["file_path"])
        for e in m_entries if e["content"] == 0
    )
    per_file = (
        spark.read.parquet(*data_files)
        .select(
            "o_orderpriority",
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.file_size").alias("fs"),
        )
        .groupBy("o_orderpriority", "fp", "fs")
        .agg(F.count("*").alias("cnt"))
    )
    exact = per_file.groupBy("o_orderpriority").agg(
        F.sum("cnt").alias("x_records"),
        F.count("*").alias("x_files"),
        F.sum("fs").alias("x_bytes"),
    )
    del_exact = (
        spark.read.parquet(dpath)
        .withColumn(
            "part",
            F.url_decode(
                F.regexp_extract("file_path", r"pdir=([^/]+)/", 1)
            ),
        )
        .groupBy("part")
        .agg(F.count("*").alias("x_del_records"))
    )
    joined = (
        stats_df
        .join(F.broadcast(exact),
              stats_df["part_value"] == exact["o_orderpriority"],
              "left")
        .join(F.broadcast(del_exact),
              stats_df["part_value"] == del_exact["part"], "left")
    )
    out = joined.select(
        "part_value",
        "spec_id",
        "data_record_count",
        "data_file_count",
        "position_delete_record_count",
        "position_delete_file_count",
        "last_updated_snapshot_id",
        (
            (F.col("data_record_count") == F.col("x_records"))
            & (F.col("data_file_count") == F.col("x_files"))
            & (F.col("position_delete_record_count")
               == F.coalesce(F.col("x_del_records"), F.lit(0)))
        ).alias("counts_ok"),
        (F.col("total_data_file_size_in_bytes") == F.col("x_bytes"))
        .alias("size_ok"),
        F.lit(registry_ok).alias("registry_ok"),
    ).orderBy("part_value").localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_iceberg_changelog_row_lineage",
    oracle=f"""
        SELECT 'DELETE' AS change_type,
               CAST(count(*) AS BIGINT) AS n_rows,
               {sql_dsum('o_totalprice')} AS revenue,
               TRUE AS lineage_stable
        FROM orders WHERE o_orderkey % 10 = 8
        UNION ALL
        SELECT 'INSERT', CAST(count(*) AS BIGINT),
               {sql_dsum('o_totalprice')}, TRUE
        FROM orders WHERE o_orderkey % 10 = 1
        UNION ALL
        SELECT 'UPDATE_AFTER', CAST(count(*) AS BIGINT),
               {sql_dsum('o_totalprice + 100.00')}, TRUE
        FROM orders WHERE o_orderkey % 10 = 4
        UNION ALL
        SELECT 'UPDATE_BEFORE', CAST(count(*) AS BIGINT),
               {sql_dsum('o_totalprice')}, TRUE
        FROM orders WHERE o_orderkey % 10 = 4
        ORDER BY change_type
    """,
    tags=("source", "iceberg", "lakehouse", "v3", "row-lineage",
          "cdc", "changelog"),
)
def source_iceberg_changelog_row_lineage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CDC pairing keyed by ``_row_id`` (round 19 compose) — the
    consumer pattern v3 row lineage exists FOR: the spec motivates
    lineage with CDC that works WITHOUT identifier columns, where
    `source_iceberg_changelog_update_pairs` needed the table's
    natural key. An overwrite commit rewrites the single base file:
    keys ≡ 4 (mod 10) updated (+100.00, `_last_updated_sequence_
    number` bumped to 2), keys ≡ 8 dropped, everything else carried
    byte-identical (ids AND seq 1 materialized — spec: a copy
    preserves both, an update preserves the id only), plus fresh
    rows (synthetic keys = key + ceiling for keys ≡ 1) with NULL
    materialized columns inheriting ids past the v1 range.

    The diff joins state@1 to state@2 ON THE ROW ID — no natural
    key touches the join — and classifies: both+changed → UPDATE
    pair, both+equal → carried (structurally cancelled), left-only
    → DELETE, right-only → INSERT. ``lineage_stable`` pins the
    semantics end to end: every UPDATE pair binds the SAME
    o_orderkey on both sides (the id held through the rewrite),
    updated rows carry seq 2 and carried rows seq 1, and every
    INSERT id sits at/past the v1 ceiling (fresh ids never collide
    with preserved ones). A rewriter that re-mints ids turns every
    carried row into DELETE+INSERT churn and floods all four
    buckets; one that pairs by position pairs wrong rows and flips
    the binding — each flips the hash.

    Scale posture: one scan per state, ids materialized scan-side,
    one shuffle on the 8-byte id for the full-outer diff — snapshot
    -diff cost with no natural-key width in the join; the attest
    aggregates ride the same joined frame (checkpointed once)."""
    from spark_hive_spark.sources.staging import stage_single_parquet

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_icev3clrl_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    os.makedirs(ddir)

    okey = F.col("o_orderkey")
    n = orders.count()
    ceil_key = n  # dense keys 0..n-1 (TESTDATA.md)
    # state@1: fresh base file, ids derive from first_row_id 0 +
    # position; sorted by key so id == o_orderkey (dense keys)
    stage_single_parquet(
        orders.sort("o_orderkey"), root, ddir, "A.parquet"
    )
    mod = okey % 10
    # the preserved id = the row's position in A (== o_orderkey on
    # the dense testdata keys; rank keeps gapped-key scale fixtures
    # correct). Single-partition window: fixture-writer cost only.
    from pyspark.sql import Window as _W

    with_id = orders.withColumn(
        "a_pos",
        (F.row_number().over(_W.orderBy(okey)) - 1).cast("long"),
    )
    survivors = with_id.filter(mod != 8).select(
        "o_orderkey",
        F.when(
            mod == 4,
            (F.col("o_totalprice").cast("decimal(18,2)")
             + F.lit(100).cast("decimal(18,2)")).cast("double"),
        ).otherwise(F.col("o_totalprice")).alias("o_totalprice"),
        F.col("a_pos").alias("_row_id"),  # preserved through CoW
        F.when(mod == 4, F.lit(2)).otherwise(F.lit(1)).cast("long")
        .alias("_last_updated_sequence_number"),
    )
    fresh = orders.filter(mod == 1).select(
        (okey + ceil_key).alias("o_orderkey"),
        "o_totalprice",
        F.lit(None).cast("long").alias("_row_id"),
        F.lit(None).cast("long")
        .alias("_last_updated_sequence_number"),
    )
    stage_single_parquet(
        survivors.sort("o_orderkey").unionByName(
            fresh.sort("o_orderkey")
        ),
        root, ddir, "B.parquet",
    )

    # ---- the reader: two states, ids resolved, diff BY ID ----
    s1 = spark.read.parquet(os.path.join(ddir, "A.parquet")).select(
        F.col("o_orderkey").alias("key1"),
        F.col("o_totalprice").alias("price1"),
        F.col("_metadata.row_index").cast("long").alias("rid"),
    )
    b = spark.read.parquet(os.path.join(ddir, "B.parquet"))
    s2 = b.select(
        F.col("o_orderkey").alias("key2"),
        F.col("o_totalprice").alias("price2"),
        F.coalesce(
            F.col("_row_id"),
            F.lit(n) + F.col("_metadata.row_index"),
        ).cast("long").alias("rid"),
        F.coalesce(
            F.col("_last_updated_sequence_number"), F.lit(2)
        ).cast("long").alias("lusn"),
    )
    diff = s1.join(s2, "rid", "full_outer").localCheckpoint(
        eager=True
    )  # feeds the change buckets AND the lineage attests

    in1 = F.col("key1").isNotNull()
    in2 = F.col("key2").isNotNull()
    changed = in1 & in2 & (F.col("price1") != F.col("price2"))
    carried = in1 & in2 & (F.col("price1") == F.col("price2"))
    attest = diff.agg(
        (
            F.coalesce(F.sum(
                ((in1 & in2)
                 & (F.col("key1") != F.col("key2"))).cast("long")
            ), F.lit(0)) == 0
        ).alias("pairs_bind"),
        (
            F.coalesce(F.sum(
                (changed & (F.col("lusn") != 2)).cast("long")
            ), F.lit(0)) == 0
        ).alias("updates_seq2"),
        (
            F.coalesce(F.sum(
                (carried & (F.col("lusn") != 1)).cast("long")
            ), F.lit(0)) == 0
        ).alias("carried_seq1"),
        (
            F.coalesce(F.min(
                F.when(~in1 & in2, F.col("rid"))
            ), F.lit(n)) >= n
        ).alias("fresh_past_ceiling"),
    )

    changes = (
        diff.filter(~in2).select(
            F.lit("DELETE").alias("change_type"),
            F.col("price1").alias("o_totalprice"),
        )
        .unionByName(diff.filter(~in1).select(
            F.lit("INSERT").alias("change_type"),
            F.col("price2").alias("o_totalprice"),
        ))
        .unionByName(diff.filter(changed).select(
            F.lit("UPDATE_BEFORE").alias("change_type"),
            F.col("price1").alias("o_totalprice"),
        ))
        .unionByName(diff.filter(changed).select(
            F.lit("UPDATE_AFTER").alias("change_type"),
            F.col("price2").alias("o_totalprice"),
        ))
    )
    out = (
        changes.groupBy("change_type")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("o_totalprice").alias("revenue"),
        )
        .crossJoin(F.broadcast(attest))
        .select(
            "change_type", "n_rows", "revenue",
            (F.col("pairs_bind") & F.col("updates_seq2")
             & F.col("carried_seq1") & F.col("fresh_past_ceiling"))
            .alias("lineage_stable"),
        )
        .orderBy("change_type")
        .localCheckpoint(eager=True)  # 4 rows; frees the temp root
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_iceberg_partition_stats_incremental",
    oracle="""
        SELECT o_orderpriority AS part_value,
               CAST(count(*) + CASE WHEN o_orderpriority IN
                        ('1-URGENT', '3-MEDIUM')
                    THEN sum(CASE WHEN o_orderkey % 5 = 0
                             THEN 1 ELSE 0 END)
                    ELSE 0 END AS BIGINT) AS data_record_count,
               CAST(CASE WHEN o_orderpriority IN
                        ('1-URGENT', '3-MEDIUM')
                    THEN 2 ELSE 1 END AS BIGINT) AS data_file_count,
               CAST(CASE WHEN o_orderpriority IN
                        ('1-URGENT', '3-MEDIUM')
                    THEN 2 ELSE 1 END AS BIGINT)
                   AS last_updated_snapshot_id,
               CAST(2 AS INT) AS snapshots_with_stats,
               TRUE AS counts_ok,
               TRUE AS passthrough_ok,
               TRUE AS registry_ok
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("source", "iceberg", "lakehouse", "stats", "partition",
          "incremental"),
)
def source_iceberg_partition_stats_incremental(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL partition-statistics maintenance (round 19
    compose) — the update path `source_iceberg_partition_stats`
    leaves open: per spec each snapshot registers its own stats
    file, and a writer that recomputes from every manifest pays
    O(table) per commit. The incremental writer here reads stats
    file v1 plus ONLY the new snapshot's manifest (the delta),
    merges per-partition (counts/files/sizes add; ``last_updated_
    snapshot_id`` bumps only where the delta touched), writes stats
    v2, and registers BOTH files in ``partition-statistics``.

    Fixture: snapshot 1 = one file per o_orderpriority partition;
    snapshot 2 appends a delta file to '1-URGENT' and '3-MEDIUM'
    only (synthetic keys = key + ceiling for keys ≡ 0 mod 5).
    Attested: ``passthrough_ok`` pins that every UNTOUCHED
    partition's v2 stats row equals its v1 row field-for-field (the
    incremental writer copied, never recomputed — and the touched
    rows differ); ``counts_ok`` cross-checks v2 against exact
    per-partition aggregates recomputed from ALL live data files;
    ``registry_ok`` pins both registry entries (path + byte size);
    ``last_updated_snapshot_id`` itself is in the output, so a
    writer that stamps every row with the new snapshot flips the
    hash.

    Scale posture: the incremental update is O(v1 rows + delta
    manifest entries) — at 10^5 partitions and a 100-file commit
    that is the difference between rewriting a 10-row delta and
    re-walking 10^7 manifest entries; the verification scan exists
    only as the audit's ground truth."""
    import pandas as _pd

    from spark_hive_spark.sources.evolution import iceberg_format_gate
    from spark_hive_spark.sources.staging import stage_single_parquet

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    root = os.path.join(
        scratch_root(), f"shs_icepsinc_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    okey = F.col("o_orderkey")
    ceil_key = orders.count()
    touched = ("1-URGENT", "3-MEDIUM")
    # snapshot 1: one file per partition, one write job
    (
        orders.withColumn("pdir", F.col("o_orderpriority"))
        .repartition(F.col("pdir"))
        .write.partitionBy("pdir")
        .parquet(os.path.join(ddir, "s1"), mode="overwrite")
    )
    # snapshot 2: delta files for the touched partitions only
    (
        orders.filter(
            F.col("o_orderpriority").isin(*touched) & (okey % 5 == 0)
        )
        .select(
            (okey + ceil_key).alias("o_orderkey"),
            "o_totalprice", "o_orderpriority",
        )
        .withColumn("pdir", F.col("o_orderpriority"))
        .repartition(F.col("pdir"))
        .write.partitionBy("pdir")
        .parquet(os.path.join(ddir, "s2"), mode="overwrite")
    )

    from urllib.parse import unquote

    def _manifest(snap_dir: str) -> list[dict]:
        rows = (
            spark.read.parquet(os.path.join(ddir, snap_dir))
            .groupBy(
                "o_orderpriority",
                F.col("_metadata.file_path").alias("fp"),
            )
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        out = []
        for r in rows:
            local = unquote(
                r["fp"][len("file:"):]
                if r["fp"].startswith("file:") else r["fp"]
            )
            out.append({
                "partition": r["o_orderpriority"],
                "file_path": os.path.relpath(local, ddir),
                "record_count": r["cnt"],
                "file_size_in_bytes": os.path.getsize(local),
            })
        return out

    m1, m2 = _manifest("s1"), _manifest("s2")

    _STATS_SCHEMA = (
        "part_value string, spec_id int, data_record_count bigint, "
        "data_file_count bigint, total_data_file_size_in_bytes "
        "bigint, last_updated_snapshot_id bigint"
    )

    def _rows_from(entries: list[dict], snap: int) -> dict[str, dict]:
        acc: dict[str, dict] = {}
        for e in entries:
            row = acc.setdefault(e["partition"], {
                "part_value": e["partition"], "spec_id": 0,
                "data_record_count": 0, "data_file_count": 0,
                "total_data_file_size_in_bytes": 0,
                "last_updated_snapshot_id": snap,
            })
            row["data_record_count"] += e["record_count"]
            row["data_file_count"] += 1
            row["total_data_file_size_in_bytes"] += \
                e["file_size_in_bytes"]
        return acc

    def _write_stats(rows: list[dict], name: str) -> str:
        path = os.path.join(mdir, name)
        stage_single_parquet(
            spark.createDataFrame(
                _pd.DataFrame(
                    sorted(rows, key=lambda r: r["part_value"])
                ),
                _STATS_SCHEMA,
            ),
            root, mdir, name,
        )
        return path

    spath1 = _write_stats(list(_rows_from(m1, 1).values()),
                          "partition-stats-1.parquet")

    # ---- the INCREMENTAL writer: v1 stats + delta manifest ONLY ----
    v1_rows = {
        r["part_value"]: r.asDict()
        for r in spark.read.parquet(spath1).collect()
    }
    delta = _rows_from(m2, 2)
    v2_rows: dict[str, dict] = {}
    for part, row in v1_rows.items():
        if part in delta:
            d = delta[part]
            v2_rows[part] = {
                **row,
                "data_record_count":
                    row["data_record_count"]
                    + d["data_record_count"],
                "data_file_count":
                    row["data_file_count"] + d["data_file_count"],
                "total_data_file_size_in_bytes":
                    row["total_data_file_size_in_bytes"]
                    + d["total_data_file_size_in_bytes"],
                "last_updated_snapshot_id": 2,
            }
        else:
            v2_rows[part] = dict(row)  # pure passthrough
    for part, d in delta.items():
        v2_rows.setdefault(part, d)  # partitions born in the delta
    spath2 = _write_stats(list(v2_rows.values()),
                          "partition-stats-2.parquet")

    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump({
            "format-version": 2,
            "current-snapshot-id": 2,
            "snapshots": [
                {"snapshot-id": 1, "manifest-list": "ml-1"},
                {"snapshot-id": 2, "manifest-list": "ml-2"},
            ],
            "partition-statistics": [
                {"snapshot-id": 1, "statistics-path": spath1,
                 "file-size-in-bytes": os.path.getsize(spath1)},
                {"snapshot-id": 2, "statistics-path": spath2,
                 "file-size-in-bytes": os.path.getsize(spath2)},
            ],
        }, fh)

    # ---- the reader + cross-checks ----
    with open(os.path.join(mdir, "v2.metadata.json")) as fh:
        md = json.load(fh)
    iceberg_format_gate(md)
    regs = {s["snapshot-id"]: s for s in md["partition-statistics"]}
    registry_ok = len(regs) == 2 and all(
        os.path.getsize(s["statistics-path"])
        == s["file-size-in-bytes"] for s in regs.values()
    )
    v2_df = spark.read.parquet(
        regs[md["current-snapshot-id"]]["statistics-path"]
    )
    v1_df = spark.read.parquet(regs[1]["statistics-path"])

    # passthrough: untouched v2 rows equal their v1 rows exactly;
    # touched rows must DIFFER (an accidental full recompute that
    # happened to match would still pass — the count check below
    # covers correctness, this one covers provenance)
    j = v2_df.alias("v2").join(
        F.broadcast(v1_df.alias("v1")),
        F.col("v2.part_value") == F.col("v1.part_value"), "left",
    )
    same = (
        (F.col("v2.data_record_count")
         == F.col("v1.data_record_count"))
        & (F.col("v2.data_file_count") == F.col("v1.data_file_count"))
        & (F.col("v2.total_data_file_size_in_bytes")
           == F.col("v1.total_data_file_size_in_bytes"))
        & (F.col("v2.last_updated_snapshot_id")
           == F.col("v1.last_updated_snapshot_id"))
    )
    is_touched = F.col("v2.part_value").isin(*touched)
    pass_ok = j.agg(
        (F.coalesce(F.sum(
            (~is_touched & ~same).cast("long")), F.lit(0)) == 0)
        .alias("untouched_same"),
        (F.coalesce(F.sum(
            (is_touched & same).cast("long")), F.lit(0)) == 0)
        .alias("touched_differ"),
    )

    exact = (
        # two partitioned roots: union the reads (a multi-root read
        # trips partition discovery's conflicting-structure check)
        spark.read.parquet(os.path.join(ddir, "s1"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority",
                "_metadata.file_path", "_metadata.file_size")
        .unionByName(
            spark.read.parquet(os.path.join(ddir, "s2"))
            .select("o_orderkey", "o_totalprice", "o_orderpriority",
                    "_metadata.file_path", "_metadata.file_size")
        )
        .groupBy("o_orderpriority", F.col("file_path"))
        .agg(
            F.count("*").alias("cnt"),
            F.first("file_size").alias("fs"),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.sum("cnt").alias("x_records"),
            F.count("*").alias("x_files"),
            F.sum("fs").alias("x_bytes"),
        )
    )
    out = (
        v2_df.join(F.broadcast(exact),
                   v2_df["part_value"] == exact["o_orderpriority"],
                   "left")
        .crossJoin(F.broadcast(pass_ok))
        .select(
            "part_value",
            "data_record_count",
            "data_file_count",
            "last_updated_snapshot_id",
            F.lit(len(regs)).cast("int").alias("snapshots_with_stats"),
            (
                (F.col("data_record_count") == F.col("x_records"))
                & (F.col("data_file_count") == F.col("x_files"))
                & (F.col("total_data_file_size_in_bytes")
                   == F.col("x_bytes"))
            ).alias("counts_ok"),
            (F.col("untouched_same") & F.col("touched_differ"))
            .alias("passthrough_ok"),
            F.lit(bool(registry_ok)).alias("registry_ok"),
        )
        .orderBy("part_value")
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(root, ignore_errors=True)
    return out


@register(
    "source_iceberg_partition_stats_evolution",
    oracle="""
        SELECT * FROM (
            SELECT CAST(0 AS INT) AS spec_id,
                   CAST(year(o_orderdate) - 1970 AS BIGINT)
                       AS part_year,
                   CAST(NULL AS BIGINT) AS part_month,
                   CAST(count(*) AS BIGINT) AS data_record_count,
                   CAST(1 AS BIGINT) AS data_file_count,
                   TRUE AS counts_ok,
                   TRUE AS unified_tuple_ok,
                   TRUE AS registry_ok
            FROM orders WHERE o_orderkey % 2 = 0
            GROUP BY year(o_orderdate)
            UNION ALL
            SELECT CAST(1 AS INT),
                   CAST(NULL AS BIGINT),
                   CAST((year(o_orderdate) - 1970) * 12
                        + month(o_orderdate) - 1 AS BIGINT),
                   CAST(count(*) AS BIGINT),
                   CAST(1 AS BIGINT),
                   TRUE, TRUE, TRUE
            FROM orders
            WHERE o_orderkey % 2 = 1 AND year(o_orderdate) = 1995
            GROUP BY year(o_orderdate), month(o_orderdate)
        )
        ORDER BY spec_id, coalesce(part_year, part_month)
    """,
    tags=("source", "iceberg", "lakehouse", "stats", "partition",
          "partition-evolution"),
)
def source_iceberg_partition_stats_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition statistics over an EVOLVED partition spec (round 19
    compose) — the part of the spec `source_iceberg_partition_stats`
    didn't need: the stats file's ``partition`` field is the
    UNIFIED partition type — the struct of every field across ALL
    specs by field id — so after the spec's canonical year → month
    evolution, rows for old-spec files carry (year, null) and
    new-spec rows carry (null, month); ``spec_id`` travels per row.
    A writer that keys rows by a single spec's tuple collides
    partitions across specs or drops the old files' stats.

    Fixture: even keys committed under spec 0 = year(o_orderdate)
    (7 files, the 1995-2001 testdata span; transform value = years
    since 1970); odd keys from 1995 committed under spec 1 =
    month(o_orderdate) (12 files; months since 1970-01). The stats
    writer derives rows purely from manifest entries; the reader
    re-reads the file and cross-checks every row against exact
    per-partition aggregates recomputed from the data files
    (``counts_ok``), pins the null pattern — each row null in
    exactly the OTHER spec's field (``unified_tuple_ok``) — and the
    registry entry (``registry_ok``).

    Scale posture: identical to the siblings — stats derivation is
    O(manifest entries), the unified-tuple widening is planning
    schema only (no data rewritten on evolution, ever), and the
    verification scan exists as the audit's ground truth."""
    from spark_hive_spark.sources.evolution import iceberg_format_gate
    from spark_hive_spark.sources.staging import stage_single_parquet

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    root = os.path.join(
        scratch_root(), f"shs_icepsev_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    okey = F.col("o_orderkey")
    yr = F.year("o_orderdate")
    mo = (yr - 1970) * 12 + F.month("o_orderdate") - 1
    # spec-0 files (even keys, one per year) and spec-1 files (odd
    # keys from 1995, one per epoch-month) in two partitionBy jobs
    (
        orders.filter(okey % 2 == 0)
        .withColumn("py", (yr - 1970).cast("long"))
        .repartition(F.col("py"))
        .write.partitionBy("py").parquet(os.path.join(ddir, "s0"))
    )
    (
        orders.filter((okey % 2 == 1) & (yr == 1995))
        .withColumn("pm", mo.cast("long"))
        .repartition(F.col("pm"))
        .write.partitionBy("pm").parquet(os.path.join(ddir, "s1"))
    )

    from urllib.parse import unquote

    def _manifest(sub: str, field: str) -> list[dict]:
        rows = (
            spark.read.parquet(os.path.join(ddir, sub))
            .groupBy(
                F.col(field),
                F.col("_metadata.file_path").alias("fp"),
            )
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        out = []
        for r in rows:
            local = unquote(
                r["fp"][len("file:"):]
                if r["fp"].startswith("file:") else r["fp"]
            )
            out.append({
                "part_value": r[field], "record_count": r["cnt"],
                "file_size_in_bytes": os.path.getsize(local),
            })
        return out

    m0 = _manifest("s0", "py")
    m1 = _manifest("s1", "pm")

    # ---- the stats WRITER: unified tuple, one row per
    # (spec_id, partition) ----
    stats_rows = [
        {"spec_id": 0, "part_year": e["part_value"],
         "part_month": None,
         "data_record_count": e["record_count"],
         "data_file_count": 1,
         "total_data_file_size_in_bytes": e["file_size_in_bytes"]}
        for e in m0
    ] + [
        {"spec_id": 1, "part_year": None,
         "part_month": e["part_value"],
         "data_record_count": e["record_count"],
         "data_file_count": 1,
         "total_data_file_size_in_bytes": e["file_size_in_bytes"]}
        for e in m1
    ]
    spath = os.path.join(mdir, "partition-stats-2.parquet")
    # part_year/part_month are int-or-None: routing them through
    # pandas coerces to float64 (None -> NaN), which the non-Arrow
    # createDataFrame path rejects against bigint. A plain list of
    # dicts verifies cleanly regardless of the session's Arrow
    # setting; the frame is O(partitions), so the row path is free.
    stage_single_parquet(
        spark.createDataFrame(
            stats_rows,
            "spec_id int, part_year bigint, part_month bigint, "
            "data_record_count bigint, data_file_count bigint, "
            "total_data_file_size_in_bytes bigint",
        ),
        root, mdir, "partition-stats-2.parquet",
    )
    with open(os.path.join(mdir, "v2.metadata.json"), "w") as fh:
        json.dump({
            "format-version": 2,
            "current-snapshot-id": 2,
            "partition-specs": [
                {"spec-id": 0, "fields": [
                    {"name": "order_year", "transform": "year",
                     "source-id": 3, "field-id": 1000}]},
                {"spec-id": 1, "fields": [
                    {"name": "order_month", "transform": "month",
                     "source-id": 3, "field-id": 1001}]},
            ],
            "snapshots": [{"snapshot-id": 2, "manifest-list": "ml"}],
            "partition-statistics": [{
                "snapshot-id": 2, "statistics-path": spath,
                "file-size-in-bytes": os.path.getsize(spath),
            }],
        }, fh)

    # ---- the READER + exact cross-check ----
    with open(os.path.join(mdir, "v2.metadata.json")) as fh:
        md = json.load(fh)
    iceberg_format_gate(md)
    reg = next(
        s for s in md["partition-statistics"]
        if s["snapshot-id"] == md["current-snapshot-id"]
    )
    registry_ok = bool(
        os.path.getsize(reg["statistics-path"])
        == reg["file-size-in-bytes"]
        and len(md["partition-specs"]) == 2
    )
    stats_df = spark.read.parquet(reg["statistics-path"])

    x0 = (
        spark.read.parquet(os.path.join(ddir, "s0"))
        .groupBy(F.col("py").cast("bigint").alias("xk"))
        .agg(F.count("*").alias("x_records"))
        .withColumn("x_spec", F.lit(0))
    )
    x1 = (
        spark.read.parquet(os.path.join(ddir, "s1"))
        .groupBy(F.col("pm").cast("bigint").alias("xk"))
        .agg(F.count("*").alias("x_records"))
        .withColumn("x_spec", F.lit(1))
    )
    exact = x0.unionByName(x1)
    joined = stats_df.join(
        F.broadcast(exact),
        (F.coalesce("part_year", "part_month") == exact["xk"])
        & (stats_df["spec_id"] == exact["x_spec"]),
        "left",
    )
    out = joined.select(
        "spec_id", "part_year", "part_month",
        "data_record_count", "data_file_count",
        (F.col("data_record_count") == F.col("x_records"))
        .alias("counts_ok"),
        # exactly the OTHER spec's field is null
        F.when(F.col("spec_id") == 0,
               F.col("part_year").isNotNull()
               & F.col("part_month").isNull())
        .otherwise(F.col("part_month").isNotNull()
                   & F.col("part_year").isNull())
        .alias("unified_tuple_ok"),
        F.lit(bool(registry_ok)).alias("registry_ok"),
    ).orderBy(
        "spec_id", F.coalesce("part_year", "part_month")
    ).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return out
