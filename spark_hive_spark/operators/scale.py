"""Scale patterns as first-class operators: skew salting, two-phase
aggregation, bucketed (shuffle-free) joins, and partitioned writes.

These encode the 100 TB playbook (SURVEY.md §7 step 6) as reusable,
TESTED code rather than advice:

- `salted_agg`: two-phase aggregation — partial aggregate on
  (key, salt) spreads a hot key over `salt_buckets` reducers, then a
  tiny final aggregate on key merges. For decimal/count/min/max
  aggregates the result is bit-identical to the direct groupBy.
- `salted_join`: replicate the small side per salt bucket so a skewed
  join key fans out over many reducers. (AQE's skew-join handles most
  cases at runtime; explicit salting covers the planner-blind ones,
  e.g. a single mega-key.)
- `write_bucketed` + co-bucketed join: pre-shuffle ONCE at write
  time; every later equi-join/aggregate on the bucket key runs with
  zero Exchange (verified by plan test).
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import tempfile
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.scratch import scratch_root
from spark_hive_spark.tables import t


def salt_col(cols: list[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets): hash of stable row columns
    (NOT rand(), which changes on task retry and breaks exactly-once
    semantics)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(buckets)).cast(
        "int"
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: list[Column],
    merge_aggs: list[Column],
    *,
    salt_from: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(key, salt) -> groupBy(key).
    `aggs` compute partials per (key, salt); `merge_aggs` combine the
    partials (e.g. sum of partial sums, sum of partial counts)."""
    salted = df.withColumn("_salt", salt_col(salt_from, buckets))
    partial = salted.groupBy(key, "_salt").agg(*aggs)
    return partial.groupBy(key).agg(*merge_aggs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    *,
    salt_from: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: left rows get a deterministic salt; the
    (smaller) right side is replicated once per bucket; the join runs
    on (key, salt) so one hot key spreads over `buckets` reducers."""
    l_salted = left.withColumn("_salt", salt_col(salt_from, buckets))
    r_replicated = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    out = l_salted.join(
        r_replicated,
        (F.col(left_key) == F.col(right_key)) & (l_salted._salt == r_replicated._salt),
    )
    return out.drop("_salt")


@register(
    "skew_salted_user_totals",
    oracle=f"""
        SELECT user_id,
               count(*) AS n_events,
               {sql_dsum('value')} AS total_value,
               max(value) AS max_value
        FROM events
        GROUP BY user_id
        ORDER BY user_id
    """,
    tags=("scale", "skew", "aggregate"),
)
def skew_salted_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over events, result-identical to
    the direct groupBy (which is exactly what the oracle runs): counts
    and maxes merge losslessly, sums are decimal-exact so the split
    into partials cannot change the value."""
    ev = t(spark, sf_dir, "events")
    partial_aggs = [
        F.count("*").alias("_n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("_sum"),
        F.max("value").alias("_max"),
    ]
    merge_aggs = [
        F.sum("_n").alias("n_events"),
        F.sum("_sum").cast("double").alias("total_value"),
        F.max("_max").alias("max_value"),
    ]
    return salted_agg(
        ev, "user_id", partial_aggs, merge_aggs,
        salt_from=["event_id"], buckets=16,
    ).orderBy("user_id")


@register(
    "skew_salted_join_order_revenue",
    oracle=f"""
        SELECT o_orderpriority,
               count(*) AS n_lines,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("scale", "skew", "join"),
)
def skew_salted_join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-to-dim join (lineitem salted on its line identity,
    orders replicated 8×), then aggregate — result-identical to the
    plain join the oracle runs. The pattern for a single white-hot
    order key that AQE's quantile-based skew split can't catch."""
    from spark_hive_spark.functions.numeric import revenue_dec

    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    joined = salted_join(
        li, orders, "l_orderkey", "o_orderkey",
        salt_from=["l_orderkey", "l_linenumber"], buckets=8,
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(revenue_dec()).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


def write_bucketed(
    df: DataFrame, table: str, key: str, buckets: int = 8, *, sort: bool = True
) -> None:
    """Bucketed managed table: pre-shuffles on `key` at write time so
    later joins/aggregations on `key` are exchange-free."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_order_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-bucketed join demo: both fact tables bucketed by order key,
    then joined — the plan must contain NO Exchange (asserted in
    tests/test_scale.py). At 100 TB this is THE lever for repeated
    fact-fact joins: one shuffle at ingest, zero per query."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey")
    bl = spark.table("b_lineitem")
    bo = spark.table("b_orders")
    # merge hint: force SMJ so the bucket layout (not a broadcast of
    # the locally-tiny side) carries the join — at 100 TB neither side
    # broadcasts and this IS the plan
    joined = bl.join(bo.hint("merge"), bl.l_orderkey == bo.o_orderkey)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"), dsum("l_quantity").alias("qty")
    )


ZORDER_BUCKETS = 8
# Morton spread-bits constants (interleave a 16-bit value into the
# even bit positions of a 32-bit word) — the classic magic-mask
# sequence, identical int64 arithmetic in Spark SQL and DuckDB.
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread_bits(col: Column) -> Column:
    """Interleave col's low 16 bits with zeros (Morton/Z-order)."""
    x = col.cast("bigint")
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def _sql_spread(expr: str) -> str:
    """The identical spread-bits arithmetic in DuckDB SQL."""
    x = f"CAST({expr} AS BIGINT)"
    for shift, mask in _SPREAD_STEPS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


@register(
    "zorder_layout_audit",
    oracle=f"""
        WITH g AS (
            SELECT p_partkey,
                   p_size AS gx,
                   CAST(floor(p_retailprice / 100) AS BIGINT) AS gy
            FROM part
        ),
        z AS (
            SELECT p_partkey, gx, gy,
                   ({_sql_spread('gx')}
                    | ({_sql_spread('gy')} << 1)) AS zval
            FROM g
        ),
        b AS (
            SELECT gx, gy,
                   ntile({ZORDER_BUCKETS})
                       OVER (ORDER BY zval, p_partkey) AS zbucket
            FROM z
        )
        SELECT zbucket, count(*) AS n_parts,
               CAST(min(gx) AS BIGINT) AS min_size,
               CAST(max(gx) AS BIGINT) AS max_size,
               min(gy) AS min_price_bucket,
               max(gy) AS max_price_bucket,
               CAST((max(gx) - min(gx) + 1) * (max(gy) - min(gy) + 1)
                    AS BIGINT) AS bbox_cells
        FROM b
        GROUP BY zbucket
        ORDER BY zbucket
    """,
    tags=("scale", "zorder", "layout", "pruning"),
)
def zorder_layout_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout audit — the multi-dimensional
    clustering trick behind Delta OPTIMIZE ZORDER / Iceberg sort
    orders: interleave the bits of two grid coordinates (p_size,
    price/100 bucket) so that sorting by the single z-value keeps BOTH
    dimensions locally bounded, then split into {ZORDER_BUCKETS}
    equal files ("buckets") and report each bucket's per-dimension
    min/max envelope and bounding-box area. Small per-bucket
    bbox_cells is the property that lets min/max file statistics
    prune scans on EITHER predicate column at 100 TB — a lexicographic
    sort would bound only the leading column.

    The bit math is int64 shift/mask arithmetic (codegen'd, identical
    in DuckDB); the only shuffle is the global z-sort that a real
    OPTIMIZE job performs by definition."""
    from pyspark.sql import Window as W

    g = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("bigint").alias("gx"),
        F.floor(F.col("p_retailprice") / 100).cast("bigint").alias("gy"),
    )
    z = g.withColumn(
        "zval",
        _spread_bits(F.col("gx")).bitwiseOR(
            F.shiftleft(_spread_bits(F.col("gy")), 1)
        ),
    )
    b = z.withColumn(
        "zbucket",
        F.ntile(ZORDER_BUCKETS).over(W.orderBy("zval", "p_partkey")),
    )
    return (
        b.groupBy("zbucket")
        .agg(
            F.count("*").alias("n_parts"),
            F.min("gx").alias("min_size"),
            F.max("gx").alias("max_size"),
            F.min("gy").alias("min_price_bucket"),
            F.max("gy").alias("max_price_bucket"),
            (
                (F.max("gx") - F.min("gx") + 1)
                * (F.max("gy") - F.min("gy") + 1)
            ).alias("bbox_cells"),
        )
        .orderBy("zbucket")
    )


# Join-key columns a skew audit watches before sizing shuffles. Each
# entry: (report label, table, key column).
_SKEW_KEYS = (
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
)


@register(
    "skew_diagnostic_report",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{label}' AS key_column,
               CAST(sum(cnt) AS BIGINT) AS total_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(cnt) AS BIGINT) AS max_key_rows,
               CAST(max(cnt) AS DOUBLE) * count(*) / sum(cnt)
                   AS skew_ratio
        FROM (SELECT {col}, count(*) AS cnt FROM {tbl} GROUP BY {col})
        """
        for label, tbl, col in _SKEW_KEYS
    )
    + "\nORDER BY key_column",
    tags=("scale", "skew", "diagnostics"),
)
def skew_diagnostic_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-shuffle skew audit over the join keys the engine actually
    shuffles on: per key column, total rows, distinct keys, the
    heaviest key's row count, and the skew ratio (max/mean rows per
    key — 1.0 is perfectly uniform; AQE's skew-join threshold and the
    salting fan-out in `skew_salted_*` are sized from exactly this
    number). The ratio is one division of exact integer aggregates,
    so the report is hash-stable cross-engine.

    Scale: each key audit is a single map-side-combining hash
    aggregate followed by a 1-row reduce — the cheapest possible scan
    shape, and the four audits are independent jobs Spark runs
    concurrently. This is the profile-first step the 100 TB runbook
    (SCALE.md) prescribes before choosing salting or AQE skew
    handling."""
    parts = []
    for label, tbl, col in _SKEW_KEYS:
        per_key = (
            t(spark, sf_dir, tbl)
            .groupBy(col)
            .agg(F.count("*").alias("cnt"))
        )
        parts.append(
            per_key.agg(
                F.lit(label).alias("key_column"),
                F.sum("cnt").alias("total_rows"),
                F.count("*").alias("n_keys"),
                F.max("cnt").alias("max_key_rows"),
                (
                    F.max("cnt").cast("double")
                    * F.count("*")
                    / F.sum("cnt")
                ).alias("skew_ratio"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key_column")


@register(
    "storage_bucketed_join_exchange_free",
    oracle=f"""
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               {sql_dsum('l.l_quantity')} AS qty,
               -- the audit facts the Spark side reads off its own
               -- physical plan: bucketing must leave ZERO join-side
               -- exchanges and carry the join as a sort-merge
               CAST(0 AS INT) AS join_side_exchanges,
               CAST(1 AS INT) AS sort_merge_join
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
    """,
    tags=("storage", "bucketing", "join", "scale"),
)
def storage_bucketed_join_exchange_free(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bucketed-table co-located join (round 10) — THE shuffle
    eliminator for repeated fact-fact joins at 100 TB: both tables
    are written ``bucketBy(8, order key)`` + ``sortBy`` (one shuffle
    at ingest), after which every join or aggregation on that key is
    exchange-free forever. The query performs the bucketed write,
    re-reads the managed tables, sort-merge-joins them (merge hint:
    at 100 TB neither side broadcasts, so SMJ IS the plan), and
    aggregates — then reads its own pre-AQE physical plan and emits
    the audit facts as columns: join-side Exchange count (must be 0)
    and SMJ presence (must be 1).

    The oracle recomputes the aggregate from the raw parquet with a
    plain shuffled join — bucketing must change the PLAN, never the
    answer — and pins the two audit constants; a bucket-layout,
    bucket-pruning, or sorted-read bug that reintroduces a shuffle
    flips join_side_exchanges, while any data corruption in the
    bucketed write path flips the aggregate hash.

    Scale posture: the write is the one-time O(N) shuffle real
    ingest pipelines pay; every downstream consumer then joins with
    zero exchanges (the unit gate in tests/test_scale.py asserts the
    same property on the unregistered demo)."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "bj_lineitem", "l_orderkey")
    write_bucketed(orders, "bj_orders", "o_orderkey")
    bl, bo = spark.table("bj_lineitem"), spark.table("bj_orders")
    agg = (
        bl.join(bo.hint("merge"), bl.l_orderkey == bo.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("qty"))
    )
    # audit the pre-AQE physical plan (sparkPlan: AQE re-plans at
    # runtime but bucketing must already be exchange-free statically)
    plan = agg._jdf.queryExecution().sparkPlan().toString()
    join_side_exchanges = sum(
        plan.count(f"Exchange hashpartitioning({k}") for k in
        ("l_orderkey", "o_orderkey")
    )
    return (
        agg.withColumn(
            "join_side_exchanges",
            F.lit(join_side_exchanges).cast("int"),
        )
        .withColumn(
            "sort_merge_join",
            F.lit(1 if "SortMergeJoin" in plan else 0).cast("int"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Z-order clustering (round 11)
# ---------------------------------------------------------------------------

_Z_FILES = 16
_Z_BITS = 16


def _sql_zvalue(x: str, y: str) -> str:
    """The 2-D Morton (Z-order) interleave as plain integer SQL —
    bit b of x lands at position 2b, bit b of y at 2b+1."""
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({x} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "(" + " + ".join(terms) + ")"


def _col_zvalue(x, y):
    """The same interleave as a Spark Column expression (pure
    bit arithmetic — whole-stage codegen, no UDF)."""
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for b in range(_Z_BITS):
        z = z + F.shiftleft(
            F.shiftright(x, b).bitwiseAND(F.lit(1)), 2 * b
        ).cast("long")
        z = z + F.shiftleft(
            F.shiftright(y, b).bitwiseAND(F.lit(1)), 2 * b + 1
        ).cast("long")
    return z


# the realistic shape: ingest is time-ordered (the linear layout),
# the query is a CUSTOMER slice across all time — the case where a
# single-dim sort cannot prune at all and Z-ordering exists
_ZBOX = "x BETWEEN 100 AND 300"


@register(
    "storage_zorder_clustering_audit",
    oracle=f"""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(o_custkey % 65536 AS BIGINT) AS x,
                   CAST(datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS BIGINT)
                       AS y,
                   o_totalprice
            FROM orders
        ),
        z AS (SELECT *, {_sql_zvalue('x', 'y')} AS zv FROM base),
        lin AS (
            SELECT *, CAST((row_number() OVER (ORDER BY y, x, o_orderkey)
                            - 1)
                      // ((count(*) OVER () + {_Z_FILES - 1})
                          // {_Z_FILES}) AS INT) AS f
            FROM z
        ),
        zo AS (
            SELECT *, CAST((row_number() OVER (ORDER BY zv, o_orderkey)
                            - 1)
                      // ((count(*) OVER () + {_Z_FILES - 1})
                          // {_Z_FILES}) AS INT) AS f
            FROM z
        ),
        lin_stats AS (
            SELECT f, min(x) x1, max(x) x2, min(y) y1, max(y) y2
            FROM lin GROUP BY f
        ),
        zo_stats AS (
            SELECT f, min(x) x1, max(x) x2, min(y) y1, max(y) y2
            FROM zo GROUP BY f
        ),
        box AS (
            SELECT CAST(100 AS BIGINT) bx1, CAST(300 AS BIGINT) bx2,
                   (SELECT min(y) FROM base) by1,
                   (SELECT max(y) FROM base) by2
        )
        SELECT CAST({_Z_FILES} AS INT) AS files_total,
               (SELECT CAST(count(*) AS INT) FROM lin_stats, box
                WHERE NOT (x2 < bx1 OR x1 > bx2 OR y2 < by1 OR y1 > by2))
                   AS files_linear,
               (SELECT CAST(count(*) AS INT) FROM zo_stats, box
                WHERE NOT (x2 < bx1 OR x1 > bx2 OR y2 < by1 OR y1 > by2))
                   AS files_zorder,
               TRUE AS stats_consistent,
               CAST(count(*) AS BIGINT) AS n_in_box,
               {sql_dsum('o_totalprice')} AS revenue_in_box
        FROM base WHERE {_ZBOX}
    """,
    tags=("storage", "zorder", "clustering", "data-skipping"),
)
def storage_zorder_clustering_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Z-ORDER clustering (round 11) — the Delta `OPTIMIZE ZORDER` /
    Iceberg sort-order question answered by measurement instead of
    folklore: the SAME orders data is laid out twice into {16}
    ceil-divide files — linear (date, custkey) sort, i.e. time-ordered ingest,
    vs Morton-curve (bit-interleaved) sort — and a CUSTOMER-slice
    predicate across all time is planned against each layout's
    per-file min/max envelopes, which the engine reads back through
    the HAND-BUILT parquet footer decoder. This is the shape
    clustering exists for: the time-sorted layout cannot prune a
    customer predicate AT ALL (every file spans the full custkey
    range -> files_linear = 16/16), while the Z layout bounds both
    dimensions (files_zorder ≈ 9/16 at sf0.01).

    Both layouts, the file split, the per-file envelopes, and both
    planned-file counts are exactly oracle-computable (row_number
    arithmetic + the same 32-term interleave in SQL), so the skipping
    advantage of Z-ordering is VALUE-HASHED, not asserted: linear
    sort gives tight date envelopes but full-range custkey envelopes
    (every file intersects the box's x-range), while the Z layout
    bounds both dimensions — the measured files_zorder <
    files_linear gap is the entire reason OPTIMIZE ZORDER exists.

    The interleave is pure bit arithmetic on both sides (whole-stage
    codegen Column expression in Spark, integer SQL in DuckDB — no
    UDF anywhere); `stats_consistent` pins engine-side that the
    hand-decoded footer envelopes equal the planner's recomputation
    from the sorted data.

    Scale posture: this is a WRITE-TIME layout decision — the
    clustering cost is one sort at ingest, after which every 2-D
    predicate scans fewer files forever; planning stays O(#files)
    footer arithmetic."""
    import glob as _glob
    import json as _json

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("long").alias("x"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit(dt.date(1970, 1, 1))
        ).cast("long").alias("y"),
        "o_totalprice",
    ).withColumn("zv", _col_zvalue(F.col("x"), F.col("y")))

    root = os.path.join(
        scratch_root(), f"shs_zord_{uuid.uuid4().hex}"
    )
    os.makedirs(root)

    import pyarrow.parquet as pq

    def _write_layout(name: str, sort_cols: list[str]) -> list[str]:
        tbl = orders.sort(*sort_cols).toArrow()
        n = tbl.num_rows
        g = (n + _Z_FILES - 1) // _Z_FILES
        paths = []
        for i in range(_Z_FILES):
            part = tbl.slice(i * g, g)
            if part.num_rows == 0:
                break
            p = os.path.join(root, f"{name}-{i:02d}.parquet")
            pq.write_table(part, p)
            paths.append(p)
        return paths

    lin_paths = _write_layout("lin", ["y", "x", "o_orderkey"])
    zo_paths = _write_layout("zo", ["zv", "o_orderkey"])

    from spark_hive_spark.sources.parquet_meta import footer_summary

    bx1, bx2 = 100, 300
    yr = orders.agg(F.min("y"), F.max("y")).collect()[0]
    by1, by2 = int(yr[0]), int(yr[1])

    def _plan(paths: list[str]) -> tuple[int, list[str], bool]:
        picked, consistent = [], True
        for p in paths:
            with open(p, "rb") as fh:
                summ = footer_summary(fh.read())
            sx = summ["row_groups"][0]["stats"]["x"]
            sy = summ["row_groups"][0]["stats"]["y"]
            # single row group per file -> footer stats ARE the file
            # envelope; cross-check against a pyarrow recompute
            import pyarrow.compute as pc

            tb = pq.read_table(p, columns=["x", "y"])
            consistent = consistent and (
                sx["min"] == pc.min(tb["x"]).as_py()
                and sx["max"] == pc.max(tb["x"]).as_py()
                and sy["min"] == pc.min(tb["y"]).as_py()
                and sy["max"] == pc.max(tb["y"]).as_py()
            )
            if not (
                sx["max"] < bx1 or sx["min"] > bx2
                or sy["max"] < by1 or sy["min"] > by2
            ):
                picked.append(p)
        return len(picked), picked, consistent

    n_lin, _, c1 = _plan(lin_paths)
    n_zo, zo_picked, c2 = _plan(zo_paths)

    # answer the box from the Z layout's picked files, residual exact
    scan = spark.read.parquet(*zo_picked).filter(
        F.col("x").between(bx1, bx2)
    )
    out = scan.agg(
        F.lit(_Z_FILES).cast("int").alias("files_total"),
        F.lit(n_lin).cast("int").alias("files_linear"),
        F.lit(n_zo).cast("int").alias("files_zorder"),
        F.lit(bool(c1 and c2)).alias("stats_consistent"),
        F.count("*").alias("n_in_box"),
        dsum("o_totalprice").alias("revenue_in_box"),
    ).localCheckpoint(eager=True)  # 1 row; frees the temp root
    shutil.rmtree(root, ignore_errors=True)
    return out
