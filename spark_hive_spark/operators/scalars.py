"""Scalar-function surface: string, date/time, JSON, conditional, and
math expressions (SURVEY.md §2B tier 1; the reference's only scalar is
`round`, X1 at `DataTest.scala:115`).

All expressions are built-in `pyspark.sql.functions` — JVM-side,
inside WholeStageCodegen, no Python in the hot path. Each query's
oracle uses the ANSI/DuckDB spelling of the same expression; functions
whose cross-engine determinism is shaky (libm last-ulp: ln/sqrt/pow)
are rounded to 6dp on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@register(
    "string_part_catalog",
    oracle=r"""
        SELECT p_partkey,
               lower(p_type)                  AS type_lower,
               upper(p_name)                  AS name_upper,
               length(p_name)                 AS name_len,
               substring(p_name, 1, 4)        AS name_prefix,
               CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
               split_part(p_name, ' ', 1)     AS first_word,
               concat(p_brand, ':', p_type)   AS brand_type,
               replace(p_name, ' ', '_')      AS name_snake,
               CASE WHEN p_name LIKE '%gear%' THEN 1 ELSE 0 END AS is_gear
        FROM part
        WHERE p_size >= 1 AND p_name IS NOT NULL
        ORDER BY p_partkey
    """,
    tags=("scalar", "string"),
)
def string_part_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function sweep: lower/upper/length/substring/
    regexp_extract/split/concat/replace/LIKE — all codegen'd, all
    pushed through a single projection."""
    part = t(spark, sf_dir, "part")
    return (
        part.filter((F.col("p_size") >= 1) & F.col("p_name").isNotNull())
        .select(
            "p_partkey",
            F.lower("p_type").alias("type_lower"),
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_name", 1, 4).alias("name_prefix"),
            F.regexp_extract("p_brand", r"Brand#(\d+)", 1)
            .cast("int")
            .alias("brand_num"),
            F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("first_word"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.when(F.col("p_name").like("%gear%"), 1).otherwise(0).alias("is_gear"),
        )
        .orderBy("p_partkey")
    )


@register(
    "date_monthly_order_stats",
    oracle=f"""
        SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS order_month,
               year(o_orderdate)  AS order_year,
               month(o_orderdate) AS order_month_num,
               quarter(o_orderdate) AS order_quarter,
               count(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS month_revenue
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY 1, 2, 3, 4
        ORDER BY order_month
    """,
    tags=("scalar", "datetime", "aggregate"),
)
def date_monthly_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar bucketing: date_trunc/year/month/quarter + per-month
    rollup. With the session pinned to UTC, truncation is identical to
    the oracle's."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month_num"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("month_revenue"),
        )
        .orderBy("order_month")
    )


@register(
    "datediff_shipping_delay",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS n_items,
               CAST(sum(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE)
                   / count(*) AS avg_delay_days,
               max(date_diff('day', o_orderdate, l_shipdate)) AS max_delay_days,
               min(date_diff('day', o_orderdate, l_shipdate)) AS min_delay_days
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
    tags=("scalar", "datetime", "join"),
)
def datediff_shipping_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp arithmetic across a join: order→ship delay in whole
    days. Day counts are integers, so avg is the exact integer sum
    over ONE IEEE double division — bit-identical in both engines with
    no rounding (round-6 over a rational .xxxxxx5 quotient would
    hash-split between Spark's HALF_UP and DuckDB's binary rounding)."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    delay = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(delay.cast("bigint")).cast("double") / F.count("*")).alias(
                "avg_delay_days"
            ),
            F.max(delay).alias("max_delay_days"),
            F.min(delay).alias("min_delay_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "json_event_props",
    oracle=f"""
        SELECT event_type,
               count(*) AS n_events,
               {sql_davg("CAST(json_extract_string(props, '$.k') AS INT)", 0)}
                   AS avg_k,
               max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
               min(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("scalar", "json", "aggregate"),
)
def json_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the `events.props` string column
    (get_json_object ≡ json_extract_string), typed and aggregated.
    For full-schema parse see `json_event_schema` (from_json)."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(k.cast("decimal(18,0)")).cast("double") / F.count(k)).alias(
                "avg_k"
            ),
            F.max(k).alias("max_k"),
            F.min(k).alias("min_k"),
        )
        .orderBy("event_type")
    )


@register(
    "json_event_schema",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k
        FROM events
        WHERE user_id < 10
        ORDER BY event_id
    """,
    tags=("scalar", "json"),
)
def json_event_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-full JSON parse via from_json into a typed struct, then
    field access — the scale path for JSON columns (parse once,
    project fields; Jackson inside codegen, no Python)."""
    ev = t(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    parsed = ev.withColumn(
        "props_struct", F.from_json("props", "struct<k:int>")
    )
    return parsed.select(
        "event_id", F.col("props_struct.k").alias("k")
    ).orderBy("event_id")


@register(
    "case_price_buckets",
    oracle=f"""
        SELECT CASE
                 WHEN o_totalprice < 100000 THEN 'low'
                 WHEN o_totalprice < 300000 THEN 'mid'
                 ELSE 'high'
               END AS price_bucket,
               count(*) AS n_orders,
               {sql_davg('o_totalprice')} AS avg_price
        FROM orders
        GROUP BY 1
        ORDER BY price_bucket
    """,
    tags=("scalar", "conditional", "aggregate"),
)
def case_price_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + aggregate over the bucket expression."""
    orders = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
        .alias("price_bucket")
    )
    return (
        orders.groupBy(bucket)
        .agg(
            F.count("*").alias("n_orders"),
            davg("o_totalprice").alias("avg_price"),
        )
        .orderBy("price_bucket")
    )


@register(
    "math_supplier_balances",
    oracle="""
        SELECT s_suppkey,
               round(abs(s_acctbal), 6)            AS bal_abs,
               CAST(ceil(s_acctbal) AS BIGINT)     AS bal_ceil,
               CAST(floor(s_acctbal) AS BIGINT)    AS bal_floor,
               round(sqrt(abs(s_acctbal)), 6)      AS bal_sqrt,
               round(ln(abs(s_acctbal) + 1), 6)    AS bal_ln,
               round(power(s_acctbal / 1000, 2), 6) AS bal_k_sq,
               CAST(sign(s_acctbal) AS DOUBLE)     AS bal_sign
        FROM supplier
        ORDER BY s_suppkey
    """,
    tags=("scalar", "math"),
)
def math_supplier_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function sweep: abs/ceil/floor/sqrt/ln/pow/sign. ln & pow
    go through libm whose last ulp may differ between JVM and DuckDB —
    rounded to 6dp on both sides."""
    s = t(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.round(F.abs(bal), 6).alias("bal_abs"),
        F.ceil(bal).alias("bal_ceil"),
        F.floor(bal).alias("bal_floor"),
        F.round(F.sqrt(F.abs(bal)), 6).alias("bal_sqrt"),
        F.round(F.log(F.abs(bal) + 1), 6).alias("bal_ln"),
        F.round(F.pow(bal / 1000, 2), 6).alias("bal_k_sq"),
        F.signum(bal).alias("bal_sign"),
    ).orderBy("s_suppkey")


@register(
    "json_variant_props",
    oracle="""
        SELECT event_type,
               count(*) AS n_events,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               count(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
                   AS n_distinct_k,
               count(json_extract_string(props, '$.missing')) AS n_missing
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    tags=("scalar", "json", "variant"),
)
def json_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion via Spark 4's VARIANT type:
    parse_json once into a variant column, then typed path extraction
    with variant_get / try_variant_get — the open-schema path that
    (unlike from_json) needs no declared struct and keeps unknown keys
    queryable. Absent paths surface as NULL (try_variant_get), counted
    here to prove the null contract; sums stay integer-exact.

    Scale posture: VARIANT stores a parsed binary encoding, so each
    path access is a field lookup, not a re-parse of the JSON text —
    the right trade when many queries touch the same ingested blob.
    Parse and extraction are row-local (no shuffle before the final
    small aggregate)."""
    ev = t(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json("props").alias("props_v")
    ).select(
        "event_type",
        F.variant_get("props_v", "$.k", "bigint").alias("k"),
        F.try_variant_get("props_v", "$.missing", "string").alias("missing"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.count_distinct(F.col("k")).alias("n_distinct_k"),
            F.count("missing").alias("n_missing"),
        )
        .orderBy("event_type")
    )


@register(
    "sql_parameterized_brand_counts",
    oracle="""
        SELECT p_brand, count(*) AS n_parts,
               CAST(sum(p_size) AS BIGINT) AS total_size
        FROM part
        WHERE p_size >= 25
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    tags=("sql-api", "parameterized", "group-by-all"),
)
def sql_parameterized_brand_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The modern SQL-API surface in one query: named parameter
    binding (`:min_size` — injection-safe, plan-cache-friendly),
    DataFrame-as-table-argument (`{part}` — no temp-view side
    effects), and `GROUP BY ALL` / `ORDER BY ALL` resolution. The
    query itself is a plain pushdown-filtered aggregate; what's
    attested is that the parameterized path plans identically to the
    literal one."""
    part = t(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT p_brand, count(*) AS n_parts,
               sum(p_size) AS total_size
        FROM {part}
        WHERE p_size >= :min_size
        GROUP BY ALL
        ORDER BY ALL
        """,
        args={"min_size": 25},
        part=part,
    )


@register(
    "xml_part_roundtrip",
    oracle="""
        SELECT p_brand,
               count(*) AS n_parts,
               CAST(sum(p_retailprice_cents) AS BIGINT) AS sum_cents
        FROM (
            SELECT p_brand,
                   CAST(round(p_retailprice * 100) AS BIGINT)
                       AS p_retailprice_cents
            FROM part
        )
        GROUP BY p_brand
        ORDER BY p_brand
    """,
    tags=("scalar", "xml", "roundtrip"),
)
def xml_part_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion fidelity (`from_xml`, Spark 4's built-in XML
    surface): serialize each part row to an XML fragment, parse it
    back with a declared schema, and aggregate the PARSED fields. The
    oracle aggregates the source columns directly — the hashes match
    only if the XML round-trip is lossless, which is the property
    under test. Money crosses the text boundary as integer cents so
    no float ever renders through a string.

    Scale posture: serialize + parse are row-local (one projection,
    no shuffle); the plan below the aggregate is scan → project —
    exactly what an XML feed ingest looks like at scale."""
    part = t(spark, sf_dir, "part").select(
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("bigint").alias("cents"),
    )
    xml = part.select(
        F.concat(
            F.lit("<part><brand>"), F.col("p_brand"),
            F.lit("</brand><cents>"), F.col("cents").cast("string"),
            F.lit("</cents></part>"),
        ).alias("doc")
    )
    parsed = xml.select(
        F.from_xml("doc", "brand STRING, cents BIGINT").alias("p")
    ).select(F.col("p.brand").alias("p_brand"), F.col("p.cents").alias("cents"))
    return (
        parsed.groupBy("p_brand")
        .agg(
            F.count("*").alias("n_parts"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("p_brand")
    )


EARTH_R_KM = 6371.0

_HAVERSINE_ORACLE = f"""
    WITH geo AS (
        SELECT n_nationkey, n_name,
               CAST((n_nationkey * 37) % 181 - 90 AS DOUBLE) AS lat,
               CAST((n_nationkey * 73) % 361 - 180 AS DOUBLE) AS lon
        FROM nation
    ),
    pairs AS (
        SELECT a.n_name AS nation, b.n_name AS neighbor,
               round(2 * {EARTH_R_KM} * asin(sqrt(
                   pow(sin(radians(b.lat - a.lat) / 2), 2)
                   + cos(radians(a.lat)) * cos(radians(b.lat))
                     * pow(sin(radians(b.lon - a.lon) / 2), 2)
               )), 1) AS dist_km
        FROM geo a JOIN geo b ON a.n_nationkey <> b.n_nationkey
    ),
    ranked AS (
        SELECT nation, neighbor, dist_km,
               row_number() OVER (PARTITION BY nation
                                  ORDER BY dist_km, neighbor) AS rk
        FROM pairs
    )
    SELECT nation, neighbor, dist_km
    FROM ranked WHERE rk = 1
    ORDER BY nation
"""


@register(
    "geo_haversine_nearest_nation",
    oracle=_HAVERSINE_ORACLE,
    tags=("geo", "haversine", "nearest-neighbor"),
)
def geo_haversine_nearest_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOSPATIAL NEAREST NEIGHBOR — great-circle (haversine)
    distance between nations on deterministic synthetic coordinates
    (integer-degree lat/lon derived from the nation key, so the
    geometry is reproducible without a geo fixture), each nation
    mapped to its closest peer. Ranking is on the ROUNDED distance
    with a name tie-break — the trig pipeline (radians → sin/cos →
    asin) computes identical doubles from identical integer inputs
    in both engines, and 1 dp rounding sits far above any libm ULP
    divergence.

    Scale: the pair join is dimension×dimension (25×25) — a
    broadcast nested loop by construction; on a real point table
    this becomes the geohash-bucketed band join (the engine's range-
    join pattern) rather than all-pairs."""
    from pyspark.sql import Window as W

    geo = t(spark, sf_dir, "nation").select(
        "n_nationkey",
        "n_name",
        ((F.col("n_nationkey") * 37) % 181 - 90).cast("double").alias("lat"),
        ((F.col("n_nationkey") * 73) % 361 - 180).cast("double").alias("lon"),
    )
    a = geo.select(
        F.col("n_nationkey").alias("ka"),
        F.col("n_name").alias("nation"),
        F.col("lat").alias("lat1"),
        F.col("lon").alias("lon1"),
    )
    b = geo.select(
        F.col("n_nationkey").alias("kb"),
        F.col("n_name").alias("neighbor"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    dist = F.round(
        2
        * EARTH_R_KM
        * F.asin(
            F.sqrt(
                F.pow(F.sin(F.radians(F.col("lat2") - F.col("lat1")) / 2), 2)
                + F.cos(F.radians("lat1"))
                * F.cos(F.radians("lat2"))
                * F.pow(
                    F.sin(F.radians(F.col("lon2") - F.col("lon1")) / 2), 2
                )
            )
        ),
        1,
    )
    pairs = (
        a.join(F.broadcast(b), F.col("ka") != F.col("kb"))
        .select("nation", "neighbor", dist.alias("dist_km"))
    )
    w = W.partitionBy("nation").orderBy("dist_km", "neighbor")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("nation", "neighbor", "dist_km")
        .orderBy("nation")
    )
