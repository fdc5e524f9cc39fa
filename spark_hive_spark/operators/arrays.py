"""Array / map / struct operators (SURVEY.md §2B: "array/map/json
functions" — absent from the reference, required for the nested data
a training pipeline carries).

collect_list is order-nondeterministic under parallelism — every
aggregation here wraps it in sort_array (or collects pre-sorted
structs) so results are identical on any cluster. Maps/structs are
built and consumed JVM-side; oracles reconstruct the same scalar
results with DuckDB list/struct functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import register
from spark_hive_spark.tables import t


@register(
    "arr_order_line_parts",
    oracle="""
        SELECT l_orderkey,
               array_to_string(
                   list(l_partkey ORDER BY l_linenumber, l_partkey), ','
               ) AS parts,
               array_to_string(
                   list_sort(list_distinct(list(l_returnflag))), ','
               ) AS flags,
               count(*) AS n_lines
        FROM lineitem
        WHERE l_orderkey < 200
        GROUP BY l_orderkey
        ORDER BY l_orderkey
    """,
    tags=("array", "collect"),
)
def arr_order_line_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list with a total order (sorted by line number via
    struct sort) + deduplicated sorted collect_set — the deterministic
    spellings of list aggregation.

    Output arrays are serialized with ``array_join`` (and
    ``array_to_string`` in the oracle): the grading driver
    canonicalizes results through a pandas sort, which cannot hash
    list cells — every registered query must return scalar columns
    (enforced by tests/test_canonicalizable.py)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("l_linenumber", "l_partkey"))
                    ),
                    lambda s: s.l_partkey.cast("string"),
                ),
                ",",
            ).alias("parts"),
            F.array_join(F.sort_array(F.collect_set("l_returnflag")), ",").alias(
                "flags"
            ),
            F.count("*").alias("n_lines"),
        )
        .orderBy("l_orderkey")
    )


@register(
    "arr_token_positions",
    oracle="""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS tk
            FROM documents WHERE doc_id < 5
        )
        SELECT doc_id,
               unnest(range(1, len(tk) + 1)) - 1 AS pos,
               unnest(tk) AS tok
        FROM toks
        ORDER BY doc_id, pos
    """,
    tags=("array", "explode"),
)
def arr_token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: tokens with their positions (zip-unnest in the
    oracle — DuckDB unnests parallel lists elementwise)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    return (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
        )
        .orderBy("doc_id", "pos")
    )


@register(
    "arr_name_token_features",
    oracle="""
        WITH tk AS (
            SELECT p_partkey, string_split(p_name, ' ') AS toks
            FROM part
        )
        SELECT p_partkey,
               len(toks) AS n_tokens,
               toks[1] AS first_tok,
               toks[len(toks)] AS last_tok,
               list_contains(toks, 'gear') AS has_gear,
               array_to_string(list_sort(toks), ',') AS sorted_toks,
               array_to_string(list_reverse(toks), '-') AS reversed_joined
        FROM tk
        ORDER BY p_partkey
    """,
    tags=("array", "functions"),
)
def arr_name_token_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-function sweep: size / element_at (head & tail) /
    array_contains / sort / reverse / join."""
    part = t(spark, sf_dir, "part")
    toks = F.split(F.col("p_name"), " ")
    return part.select(
        "p_partkey",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, -1).alias("last_tok"),
        F.array_contains(toks, "gear").alias("has_gear"),
        F.array_join(F.sort_array(toks), ",").alias("sorted_toks"),
        F.array_join(F.reverse(toks), "-").alias("reversed_joined"),
    ).orderBy("p_partkey")


@register(
    "map_struct_roundtrip",
    oracle="""
        SELECT p_partkey,
               length(split_part(p_name, ' ', 1)) AS first_word_len,
               upper(p_brand) AS brand_upper,
               p_size * 2 AS double_size
        FROM part
        WHERE p_size BETWEEN 2 AND 40
        ORDER BY p_partkey
    """,
    tags=("map", "struct"),
)
def map_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map (token -> length) and a struct, then extract
    scalars back out — exercises map_from_arrays / element_at /
    named_struct / field access. The oracle reproduces the same
    scalars directly (what's checked is the VALUES surviving the
    map/struct round trip, which is exactly what a nested-data
    pipeline needs to preserve)."""
    part = t(spark, sf_dir, "part").filter(F.col("p_size").between(2, 40))
    toks = F.split(F.col("p_name"), " ")
    tok_len_map = F.map_from_arrays(toks, F.transform(toks, F.length))
    meta = F.named_struct(
        F.lit("brand"), F.upper("p_brand"), F.lit("size2"), F.col("p_size") * 2
    )
    return (
        part.select(
            "p_partkey",
            F.element_at(tok_len_map, F.element_at(toks, 1)).alias(
                "first_word_len"
            ),
            meta.alias("meta"),
        )
        .select(
            "p_partkey",
            "first_word_len",
            F.col("meta.brand").alias("brand_upper"),
            F.col("meta.size2").alias("double_size"),
        )
        .orderBy("p_partkey")
    )


@register(
    "map_hof_event_profile",
    oracle="""
        WITH counts AS (
            SELECT user_id, event_type, count(*) AS n
            FROM events GROUP BY user_id, event_type
        ),
        tot AS (
            SELECT user_id, sum(n) AS total FROM counts GROUP BY user_id
        )
        SELECT c.user_id, c.event_type,
               CAST(c.n AS BIGINT) AS n,
               CAST(c.n AS DOUBLE) / t.total AS share
        FROM counts c JOIN tot t USING (user_id)
        WHERE c.n * 5 > t.total
        ORDER BY c.user_id, c.event_type
    """,
    tags=("map", "higher-order", "profile"),
)
def map_hof_event_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions as a per-entity profile pipeline:
    per user, event-type counts fold into a MAP column
    (map_from_entries), `transform_values` derives each type's share
    of the user's activity, `map_filter` keeps the dominant types
    (share > 20 %, decided on exact integers: n·5 > total), and
    `explode` returns to rows. The map stays inside one JVM-side
    expression chain — no Python, no extra shuffle beyond the one
    groupBy — which is the point: per-entity profiles as first-class
    column values that downstream operators can filter/join without
    re-aggregating.

    The oracle computes the same rows relationally; the share is one
    exact-integer division, and the filter never touches a float."""
    ev = t(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n")
    )
    profile = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("event_type", "n"))
        ).alias("m"),
        F.sum("n").alias("total"),
    )
    dominant = profile.select(
        "user_id",
        "total",
        F.map_filter(
            F.transform_values(
                F.col("m"),
                lambda _k, v: F.struct(
                    v.alias("n"),
                    (v.cast("double") / F.col("total")).alias("share"),
                ),
            ),
            lambda _k, v: v["n"] * 5 > F.col("total"),
        ).alias("dom"),
    )
    return (
        dominant.select(
            "user_id", F.explode("dom").alias("event_type", "v")
        )
        .select(
            "user_id",
            "event_type",
            F.col("v.n").alias("n"),
            F.col("v.share").alias("share"),
        )
        .orderBy("user_id", "event_type")
    )
