"""Utility analytics, batch 4: calendar densification (gap filling),
deterministic mode, null-preserving explode, column profiling, and
ANSI-safe (try_*) arithmetic — the operational toolkit around the
core operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from spark_hive_spark import api
from spark_hive_spark.functions.numeric import dsum, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@register(
    "calendar_densified_daily_orders",
    oracle=f"""
        WITH bounds AS (
            SELECT CAST(date_trunc('day', min(o_orderdate)) AS DATE) AS lo,
                   CAST(date_trunc('day', max(o_orderdate)) AS DATE) AS hi
            FROM orders
        ),
        days AS (
            SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                       AS day
            FROM bounds
        ),
        actual AS (
            SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
                   count(*) AS n_orders,
                   {sql_dsum('o_totalprice')} AS revenue
            FROM orders
            WHERE o_orderstatus = 'P'
            GROUP BY 1
        )
        SELECT days.day,
               coalesce(n_orders, 0) AS n_orders,
               coalesce(revenue, 0.0) AS revenue
        FROM days LEFT JOIN actual USING (day)
        ORDER BY day
    """,
    tags=("temporal", "densify"),
)
def calendar_densified_daily_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled DAILY series: days with zero pending orders
    still appear (sequence+explode spine LEFT JOIN actuals — the
    standard densification; a time-series engine's 'fill missing
    buckets'). The spine derives from a 1-row bounds aggregate, so it
    broadcasts; the actuals aggregate before joining."""
    orders = t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("day", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("day", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    days = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))
        ).alias("day")
    )
    actual = (
        orders.filter(F.col("o_orderstatus") == "P")
        .groupBy(
            F.date_trunc("day", "o_orderdate").cast("date").alias("day")
        )
        .agg(
            F.count("*").alias("n_orders_raw"),
            dsum("o_totalprice").alias("revenue_raw"),
        )
    )
    return (
        days.join(actual, "day", "left")
        .select(
            "day",
            F.coalesce("n_orders_raw", F.lit(0).cast("long")).alias("n_orders"),
            F.coalesce("revenue_raw", F.lit(0.0)).alias("revenue"),
        )
        .orderBy("day")
    )


@register(
    "mode_priority_per_nation",
    oracle="""
        WITH counts AS (
            SELECT c_nationkey, o_orderpriority, count(*) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_nationkey, o_orderpriority
        ),
        ranked AS (
            SELECT c_nationkey, o_orderpriority, n,
                   row_number() OVER (
                       PARTITION BY c_nationkey
                       ORDER BY n DESC, o_orderpriority ASC
                   ) AS rn
            FROM counts
        )
        SELECT c_nationkey, o_orderpriority AS modal_priority, n
        FROM ranked WHERE rn = 1
        ORDER BY c_nationkey
    """,
    tags=("aggregate", "mode"),
)
def mode_priority_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DETERMINISTIC mode (most frequent order priority per nation):
    count + window argmax with a lexicographic tie-break. The built-in
    `mode()` aggregate is tie-nondeterministic in both engines — this
    spelling is the hash-stable (and cluster-stable) one."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    counts = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("n").desc(), F.col("o_orderpriority").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_nationkey",
            F.col("o_orderpriority").alias("modal_priority"),
            "n",
        )
        .orderBy("c_nationkey")
    )


@register(
    "explode_outer_token_rows",
    oracle="""
        WITH docs AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN NULL
                        ELSE string_split(text, ' ')[1:3] END AS toks
            FROM documents WHERE doc_id < 30
        )
        SELECT doc_id, unnest(
            CASE WHEN toks IS NULL THEN [NULL] ELSE toks END) AS tok
        FROM docs
        ORDER BY doc_id, tok NULLS FIRST
    """,
    tags=("array", "explode", "nulls"),
)
def explode_outer_token_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with a NULL array survive as (id, NULL) —
    the join-safe explode (plain explode silently drops them; at
    pipeline scale that's dropped documents, not an edge case)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    toks = F.when(
        F.col("doc_id") % 7 == 0, F.lit(None).cast("array<string>")
    ).otherwise(F.slice(F.split("text", " "), 1, 3))
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", F.explode_outer("toks").alias("tok"))
        .orderBy("doc_id", F.col("tok").asc_nulls_first())
    )


@register(
    "profile_orders_columns",
    oracle="""
        SELECT 'o_orderkey' AS col, count(*) AS n_rows,
               count(o_orderkey) AS n_nonnull,
               count(DISTINCT o_orderkey) AS n_distinct,
               CAST(min(o_orderkey) AS VARCHAR) AS min_val,
               CAST(max(o_orderkey) AS VARCHAR) AS max_val
        FROM orders
        UNION ALL
        SELECT 'o_orderstatus', count(*), count(o_orderstatus),
               count(DISTINCT o_orderstatus),
               CAST(min(o_orderstatus) AS VARCHAR),
               CAST(max(o_orderstatus) AS VARCHAR)
        FROM orders
        UNION ALL
        SELECT 'o_totalprice', count(*), count(o_totalprice),
               count(DISTINCT o_totalprice),
               CAST(min(o_totalprice) AS VARCHAR),
               CAST(max(o_totalprice) AS VARCHAR)
        FROM orders
        ORDER BY col
    """,
    tags=("profiling", "aggregate"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (rows / non-null / distinct / min / max per
    column as a long table) — the data-quality primitive; one
    aggregate job per column batched into a single union (all share
    one scan via Catalyst's common-subexpression reuse at the source
    level)."""
    orders = t(spark, sf_dir, "orders")

    def prof(col: str) -> DataFrame:
        return orders.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.countDistinct(col).alias("n_distinct"),
            F.min(col).cast("string").alias("min_val"),
            F.max(col).cast("string").alias("max_val"),
        )

    out = prof("o_orderkey")
    for c in ["o_orderstatus", "o_totalprice"]:
        out = out.unionAll(prof(c))
    return out.orderBy("col")


@register(
    "safe_arithmetic_orders",
    oracle="""
        SELECT o_orderkey,
               TRY_CAST(o_orderpriority AS INT) AS priority_as_int,
               TRY_CAST(split_part(o_orderpriority, '-', 1) AS INT)
                   AS priority_num,
               o_totalprice / nullif(o_orderkey % 5, 0) AS risky_ratio
        FROM orders
        WHERE o_orderkey < 200
        ORDER BY o_orderkey
    """,
    tags=("scalar", "ansi", "try"),
)
def safe_arithmetic_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe arithmetic: try_cast (malformed → NULL instead of
    error — Spark 4 runs ANSI mode by default, so un-guarded casts
    of '1-URGENT' would THROW) and nullif-guarded division."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.col("o_orderpriority").try_cast("int").alias("priority_as_int"),
        F.split_part(F.col("o_orderpriority"), F.lit("-"), F.lit(1))
        .try_cast("int")
        .alias("priority_num"),
        (
            F.col("o_totalprice")
            / F.nullif((F.col("o_orderkey") % 5).cast("double"), F.lit(0.0))
        ).alias("risky_ratio"),
    ).orderBy("o_orderkey")


@register(
    "null_semantics_orders",
    oracle="""
        WITH derived AS (
            SELECT o_orderkey,
                   nullif(o_orderstatus, 'P') AS status_nn,
                   CASE WHEN o_orderkey % 3 = 0 THEN NULL
                        ELSE o_totalprice END AS price_nn
            FROM orders
        )
        SELECT count(*) AS n_rows,
               count(status_nn) AS n_status_nonnull,
               count(DISTINCT status_nn) AS n_status_distinct,
               CAST(sum(CASE WHEN status_nn IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_status_null,
               CAST(sum(CAST(price_nn AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price_skipnull,
               CAST(sum(CASE WHEN status_nn IS NOT DISTINCT FROM NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_eq_null,
               count(coalesce(status_nn, 'MISSING')) AS n_coalesced
        FROM derived
    """,
    tags=("nulls", "aggregate"),
)
def null_semantics_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL null semantics, pinned: count(*) vs count(col), DISTINCT
    over nulls, null-skipping sums, null-safe equality (<=> ≡ IS NOT
    DISTINCT FROM), coalesce. The fixtures are null-free, so nullable
    columns are derived with nullif/CASE — the load-bearing behaviors
    the reference depends on (`CollegeScorecard.scala:40,105,145`)
    exercised on this schema."""
    orders = t(spark, sf_dir, "orders")
    status_nn = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    price_nn = F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    derived = orders.select(
        status_nn.alias("status_nn"), price_nn.alias("price_nn")
    )
    return derived.agg(
        F.count("*").alias("n_rows"),
        F.count("status_nn").alias("n_status_nonnull"),
        F.countDistinct("status_nn").alias("n_status_distinct"),
        F.sum(F.when(F.col("status_nn").isNull(), 1).otherwise(0)).alias(
            "n_status_null"
        ),
        F.sum(F.col("price_nn").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price_skipnull"),
        F.sum(
            F.when(F.col("status_nn").eqNullSafe(F.lit(None)), 1).otherwise(0)
        ).alias("n_nullsafe_eq_null"),
        F.count(F.coalesce("status_nn", F.lit("MISSING"))).alias("n_coalesced"),
    )


@register(
    "observe_ingest_gate",
    oracle="""
        SELECT count(*) AS n_docs,
               CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_empty,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents
    """,
    tags=("observe", "quality-gate", "operational"),
)
def observe_ingest_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-time data-quality gate via ``df.observe`` — the metrics
    piggyback on a pass the pipeline already makes (here the ingest
    count), so the audit costs ZERO extra scans: at 100 TB a separate
    profiling query would re-read the corpus, while observed metrics
    ride the task results. The one action below IS the gated pipeline
    stage, not a driver-side loop; a production job would branch on
    `obs.get` (e.g. abort when n_empty/n_docs exceeds a threshold).
    Deterministic integer metrics, so the gate itself is
    oracle-checkable."""
    from pyspark.sql import Observation

    obs = Observation("ingest_gate")
    docs = t(spark, sf_dir, "documents").observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_chars") <= 0).cast("bigint")).alias("n_empty"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )
    docs.count()  # the gated stage's action; fills the observation
    m = obs.get
    return spark.createDataFrame(
        [(m["n_docs"], m["n_empty"], m["min_chars"], m["max_chars"])],
        "n_docs bigint, n_empty bigint, min_chars bigint, max_chars bigint",
    )


# Per-table canonical row serializations for the migration checksum.
# Every expression must be byte-identical in Spark SQL and DuckDB:
# integers and strings verbatim, doubles as exact cents/millis
# (round(x*100) — fixture money columns carry 2 decimals, events.value
# carries 2), timestamps as epoch microseconds. The row fingerprint is
# the top 60 bits of md5 taken mod 1e9+7 so a BIGINT sum over any row
# count stays overflow-free under ANSI arithmetic.
_CHECKSUM_ROWS: dict[str, str] = {
    "region": "r_regionkey, '|', r_name",
    "nation": "n_nationkey, '|', n_name, '|', n_regionkey",
    "customer": (
        "c_custkey, '|', c_name, '|', c_nationkey, '|', "
        "CAST(round(c_acctbal * 100) AS BIGINT), '|', c_mktsegment"
    ),
    "supplier": (
        "s_suppkey, '|', s_name, '|', s_nationkey, '|', "
        "CAST(round(s_acctbal * 100) AS BIGINT)"
    ),
    "part": (
        "p_partkey, '|', p_name, '|', p_brand, '|', p_type, '|', "
        "p_size, '|', CAST(round(p_retailprice * 100) AS BIGINT)"
    ),
    "orders": (
        "o_orderkey, '|', o_custkey, '|', o_orderstatus, '|', "
        "CAST(round(o_totalprice * 100) AS BIGINT), '|', "
        "unix_micros(CAST(o_orderdate AS TIMESTAMP)), '|', o_orderpriority"
    ),
    "lineitem": (
        "l_orderkey, '|', l_partkey, '|', l_suppkey, '|', "
        "l_linenumber, '|', CAST(round(l_quantity) AS BIGINT), '|', "
        "CAST(round(l_extendedprice * 100) AS BIGINT), '|', "
        "CAST(round(l_discount * 100) AS BIGINT), '|', "
        "CAST(round(l_tax * 100) AS BIGINT), '|', l_returnflag, '|', "
        "l_linestatus, '|', unix_micros(CAST(l_shipdate AS TIMESTAMP))"
    ),
    "events": (
        "event_id, '|', unix_micros(CAST(ts AS TIMESTAMP)), '|', user_id, '|', "
        "event_type, '|', CAST(round(value * 100) AS BIGINT), '|', "
        "md5(props)"
    ),
    "documents": (
        "doc_id, '|', md5(text), '|', lang, '|', source, '|', n_chars"
    ),
}

def _duck_unix_micros(expr: str) -> str:
    """DuckDB spellings of the two Spark-only helpers in the row
    serializations (everything else is verbatim shared SQL)."""
    out = expr.replace("unix_micros(", "epoch_us(")
    return out


@register(
    "table_checksum_validation",
    oracle="\nUNION ALL\n".join(
        f"""
        SELECT '{name}' AS table_name, count(*) AS n_rows,
               CAST(sum(CAST(('0x' || substring(md5(concat({_duck_unix_micros(row)})), 1, 15))
                             AS BIGINT) % 1000000007) AS BIGINT) AS row_checksum
        FROM {name}
        """
        for name, row in _CHECKSUM_ROWS.items()
    )
    + "\nORDER BY table_name",
    tags=("checksum", "validation", "profiling"),
)
def table_checksum_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent per-table content fingerprints — the
    cross-engine validation a 100 TB migration actually runs: every
    row is serialized canonically (ints/strings verbatim, money as
    exact cents, timestamps as epoch micros), md5-fingerprinted, and
    summed mod 1e9+7. Any dropped/duplicated/damaged row flips the
    sum, and the DuckDB oracle recomputes the identical arithmetic
    from the same parquet, so the hash equality IS a full-fidelity
    data comparison at one row per table of output.

    Scale: one embarrassingly-parallel scan per table with a map-side
    partial sum — no shuffle beyond the single-row final aggregate;
    the 9-table union is 9 independent jobs Spark schedules
    concurrently. Floats are excluded by canonicalization policy
    (exact-cents), not skipped: embeddings is the one table omitted
    (float32 arrays have no engine-portable text form)."""
    parts = [
        api.canonical_checksum(t(spark, sf_dir, name), row, label=name)
        for name, row in _CHECKSUM_ROWS.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name")


@register(
    "impute_missing_acctbal",
    oracle="""
        WITH holed AS (
            SELECT c_custkey, c_nationkey,
                   CASE WHEN c_custkey % 11 = 0 THEN NULL
                        ELSE c_acctbal END AS bal
            FROM customer
        ),
        stats AS (
            SELECT c_nationkey,
                   CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE)
                       AS obs_total,
                   CAST(sum(CAST(bal AS DECIMAL(18,2))) AS DOUBLE)
                       / count(bal) AS grp_mean,
                   count(*) AS n_customers,
                   count(*) - count(bal) AS n_imputed
            FROM holed GROUP BY c_nationkey
        )
        SELECT c_nationkey,
               CAST(n_customers AS BIGINT) AS n_customers,
               CAST(n_imputed AS BIGINT) AS n_imputed,
               round(obs_total + n_imputed * grp_mean, 2) AS imputed_total,
               round(grp_mean, 6) AS grp_mean
        FROM stats
        ORDER BY c_nationkey
    """,
    tags=("data-prep", "imputation", "nulls"),
)
def impute_missing_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-mean imputation — the standard ML data-prep null
    strategy, feature-complete on the plan side: deterministic holes
    (every 11th customer's balance) are filled with the per-nation
    mean of the OBSERVED values, computed as a decimal-exact sum over
    one division (so the imputed value is a deterministic double both
    engines agree on). The audit aggregates per nation: how many rows
    were imputed and the post-imputation total — which moves by
    n_imputed·mean, making any fill-value or join error visible in
    the hash.

    Scale: ONE hash aggregate — the closed form needs no join-back
    at all for the audit; materializing imputed ROWS would add the
    classic broadcast stats join, with the stats table still orders
    of magnitude smaller than the data."""
    cust = t(spark, sf_dir, "customer")
    holed = cust.select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_custkey") % 11 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    # The post-imputation total is CLOSED FORM — exact observed sum +
    # n_imputed · mean (one multiply, one add, both deterministic) —
    # never a re-sum of rows carrying the repeated mean: double
    # addition order put such a sum exactly on a half-cent boundary
    # at sf0.001 and the engines rounded it apart.
    stats = holed.groupBy("c_nationkey").agg(
        F.sum(F.col("bal").cast("decimal(18,2)"))
        .cast("double")
        .alias("obs_total"),
        F.count("*").alias("n_customers"),
        (F.count("*") - F.count("bal")).alias("n_imputed"),
        F.count("bal").alias("n_obs"),
    )
    return stats.select(
        "c_nationkey",
        "n_customers",
        "n_imputed",
        F.round(
            F.col("obs_total")
            + F.col("n_imputed") * (F.col("obs_total") / F.col("n_obs")),
            2,
        ).alias("imputed_total"),
        F.round(F.col("obs_total") / F.col("n_obs"), 6).alias("grp_mean"),
    ).orderBy("c_nationkey")


@register(
    "partition_checksum_diff",
    oracle="""
        WITH base AS (
            SELECT year(o_orderdate) AS o_year, o_orderkey,
                   o_totalprice AS price
            FROM orders
        ),
        modified AS (
            SELECT o_year, o_orderkey,
                   CASE WHEN o_year = 1997 AND o_orderkey % 13 = 0
                        THEN price * 2 ELSE price END AS price
            FROM base
        ),
        cks AS (
            SELECT 'base' AS side, o_year,
                   CAST(sum(CAST(('0x' || substring(md5(
                       concat(o_orderkey, '|',
                              CAST(round(price * 100) AS BIGINT))), 1, 15))
                       AS BIGINT) % 1000000007) AS BIGINT) AS cksum
            FROM base GROUP BY o_year
            UNION ALL
            SELECT 'mod', o_year,
                   CAST(sum(CAST(('0x' || substring(md5(
                       concat(o_orderkey, '|',
                              CAST(round(price * 100) AS BIGINT))), 1, 15))
                       AS BIGINT) % 1000000007) AS BIGINT)
            FROM modified GROUP BY o_year
        )
        SELECT o_year,
               max(CASE WHEN side = 'base' THEN cksum END)
                   <> max(CASE WHEN side = 'mod' THEN cksum END) AS changed
        FROM cks
        GROUP BY o_year
        ORDER BY o_year
    """,
    tags=("checksum", "incremental-sync", "partitions"),
)
def partition_checksum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-grained change detection — the incremental-sync
    primitive: per-year content checksums of two table states (the
    source, and a derived state where some 1997 prices changed)
    compare as single integers, so "which partitions need re-sync"
    costs one scan per side and transfers one row per partition —
    never a row-level diff. Exactly one year flips `changed`; every
    other year's checksum must match bit-for-bit, which also
    regression-tests the checksum's order-independence (the two
    sides aggregate in different plan shapes).

    Scale: this is how a 100 TB replica validates against its source
    nightly — per-partition sums are map-side-combining aggregates,
    and only flagged partitions pay a data transfer."""
    orders = t(spark, sf_dir, "orders")
    base = orders.select(
        F.year("o_orderdate").alias("o_year"),
        "o_orderkey",
        F.col("o_totalprice").alias("price"),
    )
    modified = base.withColumn(
        "price",
        F.when(
            (F.col("o_year") == 1997) & (F.col("o_orderkey") % 13 == 0),
            F.col("price") * 2,
        ).otherwise(F.col("price")),
    )
    fp = (
        "CAST(conv(substring(md5(concat(o_orderkey, '|', "
        "CAST(round(price * 100) AS BIGINT))), 1, 15), 16, 10) AS BIGINT)"
        " % 1000000007"
    )

    def cks(df, side):
        return (
            df.select("o_year", F.expr(fp).alias("f"))
            .groupBy("o_year")
            .agg(F.sum("f").alias(f"cksum_{side}"))
        )

    return (
        cks(base, "base")
        .join(cks(modified, "mod"), "o_year")
        .select(
            "o_year",
            (F.col("cksum_base") != F.col("cksum_mod")).alias("changed"),
        )
        .orderBy("o_year")
    )


# The fixture star schema's FK graph (child table, child key, parent
# table, parent key) — the edges every warehouse integrity sweep walks.
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


@register(
    "integrity_fk_orphan_audit",
    oracle=f"""
        {' UNION ALL '.join(
            f'''SELECT '{c}->{p}' AS fk_edge,
                   CAST(count(*) AS BIGINT) AS n_child_rows,
                   CAST(count(CASE WHEN par.{pk} IS NULL THEN 1 END)
                       AS BIGINT) AS n_orphan_rows,
                   CAST(count(DISTINCT CASE WHEN par.{pk} IS NULL
                                            THEN ch.{ck} END)
                       AS BIGINT) AS n_orphan_keys
            FROM {c} ch LEFT JOIN {p} par ON ch.{ck} = par.{pk}'''
            for c, ck, p, pk in _FK_EDGES
        )}
        ORDER BY fk_edge
    """,
    tags=("data-quality", "integrity", "referential", "audit"),
)
def integrity_fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity sweep over the star schema's seven FK
    edges: per edge, total child rows, orphan rows (FK value with no
    parent), and distinct orphan keys. On the clean fixture both
    orphan columns pin 0 — the audit is the load-bearing artifact a
    warehouse runs after every ingest, and a single damaged key
    flips the hash.

    Scale: each edge is ONE left join + aggregate. Dimension parents
    (nation, region, customer at ratio'd scale) broadcast; the
    fact-to-fact edges hash-partition on the join key — there is no
    per-row driver logic, and the seven edges are independent jobs
    Catalyst can share scans across (lineitem is scanned once per
    edge but column-pruned to the single key)."""
    dfs = {}
    rows = []
    for c, ck, p, pk in _FK_EDGES:
        child = dfs.setdefault(c, t(spark, sf_dir, c))
        parent = dfs.setdefault(p, t(spark, sf_dir, p))
        par = parent.select(F.col(pk).alias("_pk")).distinct()
        small_parent = p in ("nation", "region")
        if small_parent:
            par = F.broadcast(par)
        joined = child.select(F.col(ck).alias("_ck")).join(
            par, F.col("_ck") == F.col("_pk"), "left"
        )
        orphan = F.when(F.col("_pk").isNull(), 1)
        orphan_key = F.when(F.col("_pk").isNull(), F.col("_ck"))
        rows.append(
            joined.agg(
                F.lit(f"{c}->{p}").alias("fk_edge"),
                F.count("*").cast("bigint").alias("n_child_rows"),
                F.count(orphan).cast("bigint").alias("n_orphan_rows"),
                F.count_distinct(orphan_key)
                .cast("bigint")
                .alias("n_orphan_keys"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("fk_edge")


@register(
    "expectations_validation_suite",
    oracle="""
        WITH agg AS (
            SELECT count(*) AS n,
                   count(CASE WHEN o_totalprice IS NULL
                               OR o_totalprice <= 0 THEN 1 END) AS f_price,
                   count(CASE WHEN o_orderdate IS NULL
                               OR o_orderdate < DATE '1992-01-01'
                               OR o_orderdate > DATE '1998-12-31'
                         THEN 1 END) AS f_date,
                   count(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                         THEN 1 END) AS f_status,
                   count(CASE WHEN NOT regexp_matches(o_orderpriority,
                                                      '^[1-5]-')
                         THEN 1 END) AS f_priority,
                   count(*) - count(DISTINCT o_orderkey) AS f_unique
            FROM orders
        )
        SELECT rule, CAST(n AS BIGINT) AS n_rows,
               CAST(viol AS BIGINT) AS n_violations,
               CAST(CASE WHEN viol = 0 THEN 1 ELSE 0 END AS INT) AS passed
        FROM agg, LATERAL (VALUES
            ('price_positive_not_null', f_price),
            ('orderdate_in_range', f_date),
            ('status_in_domain', f_status),
            ('priority_format', f_priority),
            ('orderkey_unique', f_unique)
        ) AS v(rule, viol)
        ORDER BY rule
    """,
    tags=("data-quality", "expectations", "validation", "audit"),
)
def expectations_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A data-expectations suite (the Great-Expectations/dbt-test
    shape) evaluated in ONE pass over the fact table: null/positivity
    of money, date-range containment, categorical domain membership,
    format regex, and key uniqueness — five rules, one row each with
    violation counts and a pass flag. This is the ingest gate a
    warehouse runs before publishing a partition; the oracle pins
    every count so a silently weakened rule flips the hash.

    Scale: a single conditional aggregate (plus the count-distinct
    Expand for uniqueness) — no joins, no second scan; the rule->row
    pivot happens on the 1-row aggregate via stack()."""
    orders = t(spark, sf_dir, "orders")
    agg = orders.agg(
        F.count("*").alias("n"),
        F.count(
            F.when(
                F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0),
                1,
            )
        ).alias("f_price"),
        F.count(
            F.when(
                F.col("o_orderdate").isNull()
                | (F.col("o_orderdate") < F.lit("1992-01-01").cast("date"))
                | (F.col("o_orderdate") > F.lit("1998-12-31").cast("date")),
                1,
            )
        ).alias("f_date"),
        F.count(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
        ).alias("f_status"),
        F.count(
            F.when(
                ~F.col("o_orderpriority").rlike("^[1-5]-"), 1
            )
        ).alias("f_priority"),
        (F.count("*") - F.count_distinct("o_orderkey")).alias("f_unique"),
    )
    rules = agg.select(
        "n",
        F.expr(
            """stack(5,
               'price_positive_not_null', f_price,
               'orderdate_in_range', f_date,
               'status_in_domain', f_status,
               'priority_format', f_priority,
               'orderkey_unique', f_unique) AS (rule, viol)"""
        ),
    )
    return rules.select(
        "rule",
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("viol").cast("bigint").alias("n_violations"),
        F.when(F.col("viol") == 0, 1).otherwise(0).cast("int").alias("passed"),
    ).orderBy("rule")


@register(
    "join_cardinality_estimation_audit",
    oracle="""
        WITH lh AS (
            SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1
        ),
        oh AS (
            SELECT o_orderkey AS k, count(*) AS n FROM orders GROUP BY 1
        ),
        prediction AS (
            SELECT sum(lh.n * oh.n) AS predicted
            FROM lh JOIN oh ON lh.k = oh.k
        ),
        actual AS (
            SELECT count(*) AS actual
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        ),
        naive AS (
            SELECT CAST((SELECT count(*) FROM lineitem) AS DOUBLE)
                   * (SELECT count(*) FROM orders)
                   / greatest(
                         (SELECT count(DISTINCT l_orderkey) FROM lineitem),
                         (SELECT count(DISTINCT o_orderkey) FROM orders))
                       AS uniform_estimate
        )
        SELECT CAST(predicted AS BIGINT) AS histogram_prediction,
               CAST(actual AS BIGINT) AS actual_rows,
               CAST(CASE WHEN predicted = actual THEN 1 ELSE 0 END AS INT)
                   AS histogram_exact,
               round(uniform_estimate, 2) AS uniform_estimate,
               round(uniform_estimate / actual, 6) AS uniform_error_ratio
        FROM prediction, actual, naive
    """,
    tags=("data-quality", "cbo", "cardinality", "audit"),
)
def join_cardinality_estimation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-output cardinality estimation — the number every
    cost-based optimizer bets its plan on: with full per-key
    frequency histograms the predicted size Σ n_L(k)·n_R(k) is EXACT
    (pinned by histogram_exact = 1 against the real join), while the
    textbook uniform-frequency formula |L|·|R|/max(d_L, d_R) — what
    an optimizer uses when it only has distinct counts — is also
    reported with its error ratio. The gap between the two columns
    IS the case for column-level histogram statistics.

    Scale: two per-key count aggregates and a join of the (much
    smaller) key-histogram tables — the estimator never materializes
    the join it predicts; the actual join runs here only as the
    audit's ground truth."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    lh = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count("*").alias("nl")
    )
    oh = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count("*").alias("no")
    )
    predicted = lh.join(oh, "k").agg(
        F.sum(F.col("nl") * F.col("no")).alias("predicted")
    )
    actual = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.count("*").alias("actual"))
    )
    counts = li.agg(
        F.count("*").alias("nl_tot"),
        F.count_distinct("l_orderkey").alias("dl"),
    ).crossJoin(
        orders.agg(
            F.count("*").alias("no_tot"),
            F.count_distinct("o_orderkey").alias("do_"),
        )
    )
    uniform = (
        F.col("nl_tot").cast("double")
        * F.col("no_tot")
        / F.greatest("dl", "do_")
    )
    return (
        predicted.crossJoin(F.broadcast(actual))
        .crossJoin(F.broadcast(counts))
        .select(
            F.col("predicted").cast("bigint").alias("histogram_prediction"),
            F.col("actual").cast("bigint").alias("actual_rows"),
            F.when(F.col("predicted") == F.col("actual"), 1)
            .otherwise(0)
            .cast("int")
            .alias("histogram_exact"),
            F.round(uniform, 2).alias("uniform_estimate"),
            F.round(uniform / F.col("actual"), 6).alias(
                "uniform_error_ratio"
            ),
        )
    )
