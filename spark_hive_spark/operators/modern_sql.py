"""Spark-4 SQL/API surfaces the registry didn't cover yet: Python
UDTFs (table functions with LATERAL correlation), SQL-language UDFs
(CREATE FUNCTION ... RETURN expr), `mapInArrow` (RecordBatch-level
transforms), and the SQL pipe syntax (`|>`).

No reference counterpart (the reference's surface stops at
DataFrame/SQL basics — SURVEY.md §2A); these extend §2B the same way
the UDF/variant/XML groups did: each surface gets one deterministic,
oracle-checked query over the fixture tables.

The UDTF here is also a first-class LLM-pipeline operator: fixed-size
overlapping document chunking, the standard pre-embedding split for
RAG / training-window packing. Chunking is embarrassingly parallel
(per-document), so the UDTF scales linearly — no shuffle until the
caller aggregates.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t

# Chunking geometry: 500-char windows every 400 chars (100-char
# overlap, the common RAG default shape). The UDTF reads these through
# class attributes — captured in the class dict at definition time, so
# they survive by-value pickling to workers — and the oracle
# interpolates the same constants: one definition feeds both.
CHUNK_SIZE = 500
CHUNK_STRIDE = 400


@udtf(
    returnType="doc_id bigint, chunk_id int, chunk_start int,"
    " chunk_len int, chunk_md5 string"
)
class _DocChunks:
    """Overlapping character-window chunker. Emits (chunk ordinal,
    0-based start offset, actual length, md5 of the chunk text) per
    window; md5 keeps the output row narrow while still hashing every
    byte of every chunk, so the oracle comparison covers the full
    text content."""

    SIZE = CHUNK_SIZE
    STRIDE = CHUNK_STRIDE

    def eval(self, doc_id, text):  # noqa: ANN001 - UDTF protocol
        import hashlib

        if not text:
            return
        n = len(text)
        start, i = 0, 0
        while start < n:
            piece = text[start : start + self.SIZE]
            yield (
                doc_id,
                i,
                start,
                len(piece),
                hashlib.md5(piece.encode("utf-8")).hexdigest(),
            )
            i += 1
            start += self.STRIDE


@register(
    "udtf_document_chunks",
    oracle=f"""
        WITH idx AS (
            SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(length(text) / {CHUNK_STRIDE}.0)
                                       AS BIGINT))) AS i
            FROM documents
            WHERE length(text) > 0
        )
        SELECT doc_id,
               CAST(i AS INT) AS chunk_id,
               CAST(i * {CHUNK_STRIDE} AS INT) AS chunk_start,
               length(substring(text, CAST(i * {CHUNK_STRIDE} + 1 AS INT),
                                {CHUNK_SIZE})) AS chunk_len,
               md5(substring(text, CAST(i * {CHUNK_STRIDE} + 1 AS INT),
                             {CHUNK_SIZE})) AS chunk_md5
        FROM idx
        ORDER BY doc_id, chunk_id
    """,
    tags=("udtf", "lateral", "chunking", "llm-pipeline"),
)
def udtf_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document chunking as a Python UDTF invoked through SQL's
    LATERAL table-function syntax — one input row fans out to
    ceil(len/stride) chunk rows, correlated on the outer row's
    columns.

    Scale shape: per-row fan-out with no shuffle; the UDTF runs in
    the existing Python workers partition-by-partition, and chunk
    count scales with corpus bytes, not document count, so partition
    sizing by input bytes keeps tasks even."""
    spark.udtf.register("shs_doc_chunks", _DocChunks)
    docs = t(spark, sf_dir, "documents")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_id, c.chunk_start, c.chunk_len,
               c.chunk_md5
        FROM {documents} AS d,
             LATERAL shs_doc_chunks(d.doc_id, d.text) AS c
        ORDER BY c.doc_id, c.chunk_id
        """,
        documents=docs,
    )


@register(
    "sqlfn_discounted_revenue",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * (1 - CAST(l_discount AS DECIMAL(18,2))))
                    AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    tags=("sql-udf", "create-function", "aggregate"),
)
def sqlfn_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language UDF (CREATE TEMPORARY FUNCTION ... RETURN expr,
    new in Spark 4.0) used inside an aggregate. The function body is
    the repo's exact-decimal revenue idiom (functions/numeric.py), so
    the optimizer inlines it into codegen — a SQL UDF costs nothing
    at runtime, unlike a Python UDF; it is the right vehicle for
    shared business expressions at 100 TB."""
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION shs_disc_rev(
            price DOUBLE, disc DOUBLE)
        RETURNS DECIMAL(38,4)
        RETURN CAST(price AS DECIMAL(18,2))
               * (1 - CAST(disc AS DECIMAL(18,2)))
        """
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(shs_disc_rev(l_extendedprice, l_discount))
                    AS DOUBLE) AS revenue,
               count(*) AS n_lines
        FROM {lineitem}
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """,
        lineitem=li,
    )


@register(
    "arrow_doc_char_stats",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(length(text)) AS BIGINT) AS total_chars,
               CAST(sum(length(text)
                        - length(replace(text, ' ', ''))) AS BIGINT)
                   AS total_spaces,
               CAST(sum(length(regexp_replace(text, '[^0-9]', '', 'g')))
                    AS BIGINT) AS total_digits
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("arrow", "mapInArrow", "text", "llm-pipeline"),
)
def arrow_doc_char_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class stats via `mapInArrow`: the transform sees raw
    Arrow RecordBatches and runs entirely in pyarrow.compute's C++
    kernels — no pandas materialization, no per-row Python. This is
    the lowest-overhead Python escape hatch Spark has; the follow-up
    groupBy is a plain JVM aggregate over the narrow stats columns
    (map-side combine, bytes shuffled ~ |langs| per partition)."""
    docs = t(spark, sf_dir, "documents").select("lang", "text")

    def stats(batches):
        for b in batches:
            text = b.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("lang"),
                    pc.utf8_length(text).cast(pa.int64()),
                    pc.count_substring(text, " ").cast(pa.int64()),
                    pc.count_substring_regex(text, "[0-9]").cast(pa.int64()),
                ],
                ["lang", "n_chars", "n_spaces", "n_digits"],
            )

    mapped = docs.mapInArrow(
        stats, "lang string, n_chars long, n_spaces long, n_digits long"
    )
    return (
        mapped.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_spaces").alias("total_spaces"),
            F.sum("n_digits").alias("total_digits"),
        )
        .orderBy("lang")
    )


@register(
    "pipe_syntax_brand_stats",
    oracle="""
        SELECT p_brand,
               count(*) AS n_parts,
               CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price,
               CAST(max(p_size) AS INT) AS max_size
        FROM part
        WHERE p_size >= 20
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    tags=("sql-api", "pipe-syntax"),
)
def pipe_syntax_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (`|>`, new in Spark 4.0): the same
    filter→aggregate→sort pipeline expressed as sequential stages.
    Semantically identical to the nested form — Catalyst sees the
    same logical plan, so pushdown/pruning work unchanged; attested
    against a plain-SQL DuckDB oracle."""
    part = t(spark, sf_dir, "part")
    return spark.sql(
        """
        FROM {part}
        |> WHERE p_size >= 20
        |> AGGREGATE count(*) AS n_parts,
                     CAST(sum(CAST(p_retailprice AS DECIMAL(18,2)))
                          AS DOUBLE) AS total_price,
                     CAST(max(p_size) AS INT) AS max_size
           GROUP BY p_brand
        |> ORDER BY p_brand
        """,
        part=part,
    )


@register(
    "arrow_group_doc_quantiles",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(min(length(text)) AS BIGINT) AS min_chars,
               CAST(median(length(text)) AS DOUBLE) AS median_chars,
               CAST(max(length(text)) AS BIGINT) AS max_chars
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
    tags=("arrow", "applyInArrow", "grouped", "statistics"),
)
def arrow_group_doc_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group order statistics via `applyInArrow` (Spark 4.0's
    Arrow-native cousin of applyInPandas): each language group
    arrives as a pyarrow Table and is reduced with numpy — no pandas
    conversion. The length computation stays JVM-side (F.length), so
    only (lang, n_chars) crosses into Python — bytes shuffled scale
    with row count, not corpus bytes. Median of an even group is the
    midpoint average in both numpy and DuckDB, so the oracle agrees
    exactly."""
    import numpy as np

    docs = t(spark, sf_dir, "documents").select(
        "lang", F.length("text").alias("n_chars")
    )

    def quantiles(tbl: pa.Table) -> pa.Table:
        n = tbl.column("n_chars").to_numpy()
        return pa.table(
            {
                "lang": [tbl.column("lang")[0].as_py()],
                "n_docs": [len(n)],
                "min_chars": [int(n.min())],
                "median_chars": [float(np.median(n))],
                "max_chars": [int(n.max())],
            }
        )

    return (
        docs.groupBy("lang")
        .applyInArrow(
            quantiles,
            "lang string, n_docs long, min_chars long,"
            " median_chars double, max_chars long",
        )
        .orderBy("lang")
    )


@register(
    "cdc_upsert_orders",
    oracle="""
        WITH updates AS (
            SELECT o_orderkey,
                   'X' AS o_orderstatus,
                   CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 1.10
                        AS DOUBLE) AS o_totalprice
            FROM orders WHERE o_orderkey % 97 = 0
        ),
        inserts AS (
            SELECT o_orderkey + 10000000 AS o_orderkey,
                   'N' AS o_orderstatus,
                   o_totalprice
            FROM orders WHERE o_orderkey % 101 = 0
        ),
        merged AS (
            SELECT b.o_orderkey,
                   coalesce(u.o_orderstatus, b.o_orderstatus)
                       AS o_orderstatus,
                   coalesce(u.o_totalprice, b.o_totalprice)
                       AS o_totalprice
            FROM orders b LEFT JOIN updates u USING (o_orderkey)
            UNION ALL
            SELECT * FROM inserts
        )
        SELECT o_orderstatus,
               count(*) AS n_orders,
               -- 4dp, not 2: updated prices are exact 3dp values
               -- (2dp * 1.1); re-rounding them to 2dp would land on
               -- .xx5 half-boundaries where the engines' rounding
               -- modes differ
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                   AS total_price
        FROM merged
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus
    """,
    tags=("cdc", "merge", "upsert", "warehouse"),
)
def cdc_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert semantics as a DataFrame composition — the CDC
    apply step of a warehouse pipeline on a format without native
    MERGE: a deterministic change batch (keys % 97 -> UPDATE with
    status 'X' and +10% price; keys % 101 -> INSERT under shifted
    keys) merges into the base via left join + coalesce, inserts
    append via union. The output aggregates the merged table per
    status so the oracle attests the full merge (row routing AND
    value rewrites) in a few rows.

    Scale shape: a CDC batch is orders of magnitude smaller than the
    base, so the update join BROADCASTS the batch — the base table
    never shuffles; the insert union is shuffle-free; the final
    summary is one map-side-combinable aggregate. Price arithmetic
    stays in exact decimal end to end."""
    base = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    price_dec = F.col("o_totalprice").cast("decimal(18,2)")
    updates = base.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.lit("X").alias("u_status"),
        (price_dec * F.lit("1.10").cast("decimal(3,2)"))
        .cast("double")
        .alias("u_price"),
    )
    inserts = base.filter(F.col("o_orderkey") % 101 == 0).select(
        (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    merged = (
        base.join(F.broadcast(updates), "o_orderkey", "left")
        .select(
            "o_orderkey",
            F.coalesce("u_status", "o_orderstatus").alias("o_orderstatus"),
            F.coalesce("u_price", "o_totalprice").alias("o_totalprice"),
        )
        .unionByName(inserts)
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            # decimal(18,4): see the oracle's half-boundary comment
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "recursive_cte_custkey_tree",
    oracle="""
        WITH RECURSIVE tree(c_custkey, depth) AS (
            SELECT c_custkey, 1 AS depth FROM customer WHERE c_custkey = 1
            UNION ALL
            SELECT c.c_custkey, t.depth + 1
            FROM customer c JOIN tree t
              ON CAST(FLOOR(c.c_custkey / 2) AS BIGINT) = t.c_custkey
            WHERE c.c_custkey > 1
        )
        SELECT depth,
               count(*) AS n_nodes,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_acctbal
        FROM tree JOIN customer c USING (c_custkey)
        GROUP BY depth
        ORDER BY depth
    """,
    tags=("recursive-cte", "hierarchy", "spark4"),
)
def recursive_cte_custkey_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (WITH RECURSIVE, new in Spark 4.0): BFS depth
    assignment over an implicit binary tree on the customer table
    (parent(k) = floor(k/2), root k=1), then per-depth node counts
    and exact-decimal balance sums.

    The recursion is the textbook hierarchy traversal (org charts,
    BOM explosions, referral chains) that previously forced a
    driver-side loop; Catalyst now plans each step as an incremental
    self-join, so the shape scales to any table that fits a shuffle
    join per level — depth is log2(n) for this tree, ~18 levels at
    100 TB scale. No reference counterpart (SURVEY §2B extension)."""
    cust = t(spark, sf_dir, "customer")
    return spark.sql(
        """
        WITH RECURSIVE tree(c_custkey, depth) AS (
            SELECT c_custkey, 1 AS depth FROM {customer} WHERE c_custkey = 1
            UNION ALL
            SELECT c.c_custkey, t.depth + 1
            FROM {customer} c JOIN tree t
              ON CAST(FLOOR(c.c_custkey / 2) AS BIGINT) = t.c_custkey
            WHERE c.c_custkey > 1
        )
        SELECT depth,
               count(*) AS n_nodes,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_acctbal
        FROM tree JOIN {customer} c USING (c_custkey)
        GROUP BY depth
        ORDER BY depth
        """,
        customer=cust,
    )


@register(
    "collation_ci_part_names",
    oracle="""
        WITH mixed AS (
            SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_name)
                        ELSE lower(p_name) END AS display_name,
                   p_retailprice
            FROM part
        )
        SELECT min(display_name) AS variant_min,
               count(*) AS n_parts,
               count(DISTINCT display_name) AS n_case_variants,
               CAST(sum(CAST(p_retailprice AS DECIMAL(18,2)))
                    AS DOUBLE) AS sum_price
        FROM mixed
        GROUP BY lower(display_name)
        ORDER BY variant_min
    """,
    tags=("collation", "unicode-ci", "spark4"),
)
def collation_ci_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via the UNICODE_CI collation (new in
    Spark 4.0): part names are given a deterministic mixed-case skin
    (upper for even keys, lower for odd), then grouped under
    `collate(..., 'UNICODE_CI')` — the collation-aware hash groups
    'LARGE RING' with 'large ring' without rewriting the data, the
    way a `lower()` wrapper would. The observable output (min
    variant, counts, exact-decimal price sum) is collation-neutral,
    so the DuckDB oracle uses the `lower()` rewrite and must agree.

    At scale, collation beats `lower()` because the collation key is
    part of the column type: every downstream group/join/sort reuses
    it with no per-row expression, and the scan can still prune."""
    part = t(spark, sf_dir, "part")
    mixed = part.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_name"))
        .otherwise(F.lower("p_name"))
        .alias("display_name"),
        "p_retailprice",
    )
    return (
        mixed.groupBy(F.expr("collate(display_name, 'UNICODE_CI')").alias("ci"))
        .agg(
            F.min("display_name").alias("variant_min"),
            F.count("*").alias("n_parts"),
            F.count_distinct("display_name").alias("n_case_variants"),
            F.sum(F.col("p_retailprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .drop("ci")
        .orderBy("variant_min")
    )


@register(
    "sqlvar_acctbal_gate",
    oracle="""
        WITH thr AS (SELECT avg(c_acctbal) AS v FROM customer)
        SELECT n.n_name,
               count(*) AS n_rich,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)))
                    AS DOUBLE) AS rich_balance
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > (SELECT v FROM thr)
        GROUP BY n.n_name
        ORDER BY n.n_name
    """,
    tags=("session-variables", "sql", "spark4"),
)
def sqlvar_acctbal_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL session variables (DECLARE / SET VARIABLE, new in Spark
    4.0): the mean account balance is computed once into a session
    variable via `SET VAR = (scalar subquery)` — evaluated engine-side,
    no driver collect — and the variable then parameterizes the main
    query exactly like a constant, so Catalyst folds it and the scan
    keeps its pushed filter. The pattern replaces string-formatted SQL
    for run-time thresholds (dashboards, backfills) without the
    re-parse or injection hazards. Oracle inlines the same scalar."""
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    spark.sql("DECLARE OR REPLACE VARIABLE shs_bal_threshold DOUBLE")
    spark.sql(
        "SET VARIABLE shs_bal_threshold = "
        "(SELECT avg(c_acctbal) FROM {customer})",
        customer=cust,
    )
    return spark.sql(
        """
        SELECT n.n_name,
               count(*) AS n_rich,
               CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2)))
                    AS DOUBLE) AS rich_balance
        FROM {customer} c
        JOIN {nation} n ON c.c_nationkey = n.n_nationkey
        WHERE c.c_acctbal > shs_bal_threshold
        GROUP BY n.n_name
        ORDER BY n.n_name
        """,
        customer=cust,
        nation=nat,
    )


_GROUPBY_ALL_SQL = """
    SELECT year(o_orderdate) AS o_year,
           o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price
    FROM {orders}
    GROUP BY ALL
    ORDER BY ALL
"""


@register(
    "groupby_all_year_priority",
    oracle=_GROUPBY_ALL_SQL.format(orders="orders"),
    tags=("sql", "group-by-all", "order-by-all", "spark4"),
)
def groupby_all_year_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL + ORDER BY ALL (Spark 3.4/4.0 SQL conveniences,
    shared with DuckDB): the grouping keys are inferred as every
    non-aggregate select item and the ordering as the full select
    list — the exact SQL runs verbatim in both engines, so the oracle
    is the same string. Beyond convenience, ALL removes a real drift
    class: adding a projected column cannot silently diverge from the
    GROUP BY list. Plan is a plain hash aggregate + sort; ALL is
    resolved at analysis time and costs nothing."""
    orders = t(spark, sf_dir, "orders")
    return spark.sql(_GROUPBY_ALL_SQL, orders=orders)


@register(
    "udtf_polymorphic_kv_extract",
    oracle="""
        SELECT p_brand AS brand,
               count(*) AS n_parts,
               count(DISTINCT p_size) AS n_sizes
        FROM part
        GROUP BY p_brand
        ORDER BY brand
    """,
    tags=("udtf", "polymorphic", "analyze", "spark4"),
)
def udtf_polymorphic_kv_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF — the schema comes from `analyze()` at
    plan time, not a static returnType: `parse_kv(kv, 'brand,size')`
    inspects the constant key list and emits one STRING column per
    requested key, so the same function parses any key set without
    re-registration (the table-function twin of schema-on-read).
    The fixture side serializes part attributes to 'k=v;k=v' strings,
    the UDTF re-extracts them through a LATERAL join, and the
    aggregate over the EXTRACTED columns must reproduce the source
    aggregate — a lost or misaligned key flips counts.

    Scale: per-row fan-out inside existing Python workers like the
    chunking UDTF; analyze() runs once on the driver at plan time."""
    from pyspark.sql.functions import udtf as _udtf_fn
    from pyspark.sql.types import StringType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class _ParseKV:
        @staticmethod
        def analyze(kv: AnalyzeArgument, keys: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for k in keys.value.split(","):
                st = st.add(k.strip(), StringType())
            return AnalyzeResult(schema=st)

        def eval(self, kv: str, keys: str):
            d = {}
            for pair in (kv or "").split(";"):
                if "=" in pair:
                    k, v = pair.split("=", 1)
                    d[k] = v
            yield tuple(d.get(k.strip()) for k in keys.split(","))

    spark.udtf.register("shs_parse_kv", _udtf_fn(_ParseKV))
    part = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.concat(
            F.lit("brand="), F.col("p_brand"),
            F.lit(";type="), F.col("p_type"),
            F.lit(";size="), F.col("p_size"),
        ).alias("kv"),
    )
    return spark.sql(
        """
        SELECT f.brand,
               count(*) AS n_parts,
               count(DISTINCT f.size) AS n_sizes
        FROM {part} p, LATERAL shs_parse_kv(p.kv, 'brand,size') f
        GROUP BY f.brand
        ORDER BY brand
        """,
        part=part,
    )


@register(
    "mv_incremental_refresh",
    oracle="""
        WITH base AS (
            SELECT * FROM orders WHERE o_orderdate < DATE '1997-01-01'
        ),
        delta AS (
            SELECT * FROM orders WHERE o_orderdate >= DATE '1997-01-01'
        ),
        mv0 AS (
            SELECT o_custkey, count(*) AS n,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
            FROM base GROUP BY o_custkey
        ),
        dagg AS (
            SELECT o_custkey, count(*) AS n,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
            FROM delta GROUP BY o_custkey
        ),
        merged AS (
            SELECT coalesce(m.o_custkey, d.o_custkey) AS o_custkey,
                   coalesce(m.n, 0) + coalesce(d.n, 0) AS n,
                   coalesce(m.s, 0) + coalesce(d.s, 0) AS s
            FROM mv0 m FULL OUTER JOIN dagg d ON m.o_custkey = d.o_custkey
        ),
        full_ AS (
            SELECT o_custkey, count(*) AS n,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
            FROM orders GROUP BY o_custkey
        )
        SELECT CAST(count(m.o_custkey) AS BIGINT) AS n_groups_merged,
               CAST(count(f.o_custkey) AS BIGINT) AS n_groups_full,
               CAST(count(CASE WHEN m.n IS DISTINCT FROM f.n THEN 1 END)
                   AS BIGINT) AS count_mismatches,
               CAST(count(CASE WHEN m.s IS DISTINCT FROM f.s THEN 1 END)
                   AS BIGINT) AS sum_mismatches,
               CAST(sum(m.n) AS BIGINT) AS total_orders,
               CAST(sum(m.s) AS DOUBLE) AS total_revenue
        FROM merged m FULL OUTER JOIN full_ f ON m.o_custkey = f.o_custkey
    """,
    tags=("warehouse", "materialized-view", "incremental", "merge"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a per-customer
    (count, revenue) MV built from the pre-1997 base is refreshed by
    MERGING a delta aggregate (1997+) — full-outer join on the key,
    counts add, decimal sums add exactly — and the audit proves the
    merged MV is cell-for-cell identical to a from-scratch recompute
    (both mismatch counters pin 0; sums compare as EXACT decimals, so
    the equality is algebraic, not approximate).

    Scale: this is the pattern that keeps a 100 TB rollup fresh —
    only the DELTA shuffles by key (a day's data, not the history),
    and the stored MV merges via a key-partitioned outer join
    (bucketed MV storage makes it shuffle-free on the MV side). The
    recompute branch exists here only as the audit's ground truth;
    production never runs it."""
    orders = t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cutoff = F.lit("1997-01-01").cast("date")
    price = F.col("o_totalprice").cast("decimal(18,2)")

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias("n"), F.sum(price).alias("s")
        )

    mv0 = agg(orders.filter(F.col("o_orderdate") < cutoff))
    dagg = agg(orders.filter(F.col("o_orderdate") >= cutoff))
    m, d = mv0.alias("m"), dagg.alias("d")
    merged = m.join(d, F.col("m.o_custkey") == F.col("d.o_custkey"), "full").select(
        F.coalesce("m.o_custkey", "d.o_custkey").alias("o_custkey"),
        (
            F.coalesce("m.n", F.lit(0)) + F.coalesce("d.n", F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("m.s"), F.lit(0).cast("decimal(18,2)"))
            + F.coalesce(F.col("d.s"), F.lit(0).cast("decimal(18,2)"))
        ).alias("s"),
    )
    full = agg(orders)
    mm, ff = merged.alias("mm"), full.alias("ff")
    joined = mm.join(
        ff, F.col("mm.o_custkey") == F.col("ff.o_custkey"), "full"
    )
    return joined.agg(
        F.count("mm.o_custkey").cast("bigint").alias("n_groups_merged"),
        F.count("ff.o_custkey").cast("bigint").alias("n_groups_full"),
        F.count(
            F.when(~F.col("mm.n").eqNullSafe(F.col("ff.n")), 1)
        ).cast("bigint").alias("count_mismatches"),
        F.count(
            F.when(~F.col("mm.s").eqNullSafe(F.col("ff.s")), 1)
        ).cast("bigint").alias("sum_mismatches"),
        F.sum("mm.n").cast("bigint").alias("total_orders"),
        F.sum("mm.s").cast("double").alias("total_revenue"),
    )


@register(
    "mv_incremental_delete_refresh",
    oracle="""
        WITH deleted AS (
            SELECT * FROM orders WHERE o_orderkey % 97 = 0
        ),
        mv0 AS (
            SELECT o_custkey, count(*) AS n,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
            FROM orders GROUP BY o_custkey
        ),
        dagg AS (
            SELECT o_custkey, count(*) AS dn,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS ds
            FROM deleted GROUP BY o_custkey
        ),
        merged AS (
            SELECT m.o_custkey,
                   m.n - coalesce(d.dn, 0) AS n,
                   m.s - coalesce(d.ds, 0) AS s
            FROM mv0 m LEFT JOIN dagg d ON m.o_custkey = d.o_custkey
        ),
        alive AS (SELECT * FROM merged WHERE n > 0),
        full_ AS (
            SELECT o_custkey, count(*) AS n,
                   sum(CAST(o_totalprice AS DECIMAL(18,2))) AS s
            FROM orders WHERE o_orderkey % 97 <> 0
            GROUP BY o_custkey
        )
        SELECT CAST((SELECT count(*) FROM alive) AS BIGINT)
                   AS n_groups_after,
               CAST((SELECT count(*) FROM merged WHERE n = 0) AS BIGINT)
                   AS n_groups_retired,
               CAST(count(CASE WHEN a.n IS DISTINCT FROM f.n THEN 1 END)
                   AS BIGINT) AS count_mismatches,
               CAST(count(CASE WHEN a.s IS DISTINCT FROM f.s THEN 1 END)
                   AS BIGINT) AS sum_mismatches,
               CAST(sum(a.n) AS BIGINT) AS total_orders_after,
               CAST(sum(a.s) AS DOUBLE) AS total_revenue_after
        FROM alive a FULL OUTER JOIN full_ f ON a.o_custkey = f.o_custkey
    """,
    tags=("warehouse", "materialized-view", "incremental", "delete"),
)
def mv_incremental_delete_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DELETE half of incremental materialized-view maintenance —
    the part `mv_incremental_refresh` (insert-only) doesn't cover:
    a deterministic delete batch (keys % 97) aggregates to NEGATIVE
    deltas, the per-customer MV subtracts them through a left join
    (counts and exact-decimal sums are self-inverse, which is what
    makes count/sum — unlike min/max — delete-maintainable without
    recompute), and groups whose count reaches zero RETIRE from the
    view. The audit proves the maintained MV is cell-for-cell equal
    to recomputing over the surviving rows, and separately counts the
    retired groups.

    Scale: only the delete batch shuffles by key; the stored MV
    merges through a key-partitioned join (shuffle-free when the MV
    is bucketed). min/max would need a per-group recompute on delete
    — the reason production MVs restrict themselves to self-inverse
    aggregates or keep per-group value heaps."""
    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    price = F.col("o_totalprice").cast("decimal(18,2)")

    mv0 = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n"), F.sum(price).alias("s")
    )
    dagg = (
        orders.filter(F.col("o_orderkey") % 97 == 0)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("dn"), F.sum(price).alias("ds"))
    )
    m, d = mv0.alias("m"), dagg.alias("d")
    merged = m.join(
        d, F.col("m.o_custkey") == F.col("d.o_custkey"), "left"
    ).select(
        F.col("m.o_custkey").alias("o_custkey"),
        (F.col("m.n") - F.coalesce("d.dn", F.lit(0))).alias("n"),
        (
            F.col("m.s")
            - F.coalesce(F.col("d.ds"), F.lit(0).cast("decimal(18,2)"))
        ).alias("s"),
    )
    merged = merged.localCheckpoint(eager=False)  # feeds alive + retired
    alive = merged.filter(F.col("n") > 0)
    retired = merged.filter(F.col("n") == 0).agg(
        F.count("*").cast("bigint").alias("n_groups_retired")
    )
    full = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"), F.sum(price).alias("s"))
    )
    a, f_ = alive.alias("a"), full.alias("f")
    audit = a.join(
        f_, F.col("a.o_custkey") == F.col("f.o_custkey"), "full"
    ).agg(
        F.count("a.o_custkey").cast("bigint").alias("n_groups_after"),
        F.count(
            F.when(~F.col("a.n").eqNullSafe(F.col("f.n")), 1)
        ).cast("bigint").alias("count_mismatches"),
        F.count(
            F.when(~F.col("a.s").eqNullSafe(F.col("f.s")), 1)
        ).cast("bigint").alias("sum_mismatches"),
        F.sum("a.n").cast("bigint").alias("total_orders_after"),
        F.sum("a.s").cast("double").alias("total_revenue_after"),
    )
    return audit.crossJoin(F.broadcast(retired)).select(
        "n_groups_after",
        "n_groups_retired",
        "count_mismatches",
        "sum_mismatches",
        "total_orders_after",
        "total_revenue_after",
    )
