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
        tempfile.gettempdir(), f"shs_icev3def_{uuid.uuid4().hex}"
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
        tempfile.gettempdir(), f"shs_icev3rl_{uuid.uuid4().hex}"
    )
    ddir = os.path.join(root, "data")
    mdir = os.path.join(root, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)

    k = F.col("o_orderkey") % 2
    stage_single_parquet(orders.filter(k == 0), root, ddir, "A.parquet")
    stage_single_parquet(orders.filter(k == 1), root, ddir, "B.parquet")
    n_a = spark.read.parquet(os.path.join(ddir, "A.parquet")).count()
    n_b = spark.read.parquet(os.path.join(ddir, "B.parquet")).count()

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
        # spec inheritance: null first_row_id entries are assigned
        # manifest.first_row_id + record counts of PRIOR null entries
        next_assign = mrow.get("first_row_id")
        for e in entries:
            if e["status"] != 1 or e["content"] != 0:
                raise ValueError("unexpected manifest entry")
            if e["first_row_id"] is None:
                if next_assign is None:
                    raise ValueError(
                        "null first_row_id but the manifest carries "
                        "no first-row-id to inherit from"
                    )
                e = {**e, "first_row_id": next_assign}
                next_assign += e["record_count"]
                inherited += 1
            files.append(e)

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
