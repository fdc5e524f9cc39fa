"""Query registry — the single source of truth for the engine's surface.

Every operator/query the engine claims (SURVEY.md §2) registers here as
a named callable ``(spark, sf_dir) -> DataFrame`` plus, when the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string. The
driver contract (``__spark_entry__.py``) is a thin view over this
registry.

Determinism rules every registered query follows (so the driver's
order-insensitive value-hash comparison is stable):
- every computed column is aliased identically in Spark and oracle SQL;
- float aggregates are rounded (money: 2dp, ratios/stats: 4-6dp) in
  BOTH engines, so sub-ULP summation-order differences can't flip the
  hash;
- every ORDER BY ... LIMIT has a total order (unique tie-break key),
  and orders by the *rounded* value so both engines pick the same rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver does rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, Query] = {}

# The grading driver sweeps the FIRST 50 registry entries per round, so
# ordering is an attestation budget. Round-16 rotation (VERDICT r15
# tasks 4 and 7, executed): the 4 reference jobs stay pinned, then the
# 16 NEW round-16 queries (the r15 verdict's items — compressed /
# nullable / both / string / dictionary / timestamp row-index seeking
# + bloom-filter row-group skipping, Hudi MOR incremental, Iceberg
# name mapping + incremental append + column-bounds +
# string-truncation pruning, Delta TIMESTAMP AS OF, struct-keyed-map
# column mapping, domain metadata, stats skipping),
# then the ANN rows-only pair WITH
# its hash-green exactness bracket ``ann_recall_audit`` pinned adjacent
# (VERDICT r15 item 4: the graded CORRECTNESS file is self-contained —
# the audit travels with the pair in every window), then the oldest
# attested backlog, oldest-first: the 17 r3-attested queries displaced
# by the r15 format-family re-attests, then the r5-attested tail
# (5 r5 slots ceded to the round's later additions).
# Backlog spill for r17 (next oldest, in order):
# distinct_supplier_part_counts, funnel_view_click_purchase, groupingsets_customer,
# json_event_props, json_event_schema, map_struct_roundtrip,
# math_supplier_balances, percentiles_extendedprice,
# pivot_revenue_by_linestatus,
# q1_pricing_summary, range_join_clicks_before_purchase,
# retention_signup_cohorts, rollup_lineitem_flags, sessionize_events,
# sketch_hll_mergeable_rollup, skew_salted_join_order_revenue, then
# the rest of the r5 tail.
# tests/test_registry_window.py asserts the window stays exactly this.
SWEEP_PRIORITY: tuple[str, ...] = (
    # pinned reference jobs (driver-green every round)
    "ref_top5_nations_by_avg_acctbal",
    "ref_top5_finished_orders_by_price",
    "ref_building_acctbal_stats_by_nation",
    "ref_orc_roundtrip",
    # round-16 NEW queries: driver rows on first appearance
    "source_orc_row_index_skipping_compressed",
    "source_orc_row_index_skipping_nullable",
    "source_orc_row_index_skipping_nullable_compressed",
    "source_hudi_mor_incremental",
    "source_iceberg_name_mapping",
    "source_iceberg_incremental_append",
    "source_delta_time_travel_timestamp",
    "source_delta_column_mapping_map_key",
    "source_delta_domain_metadata",
    "source_iceberg_column_bounds_pruning",
    "source_iceberg_string_bounds_truncation",
    "source_delta_stats_skipping",
    "source_orc_row_index_skipping_string",
    "source_orc_row_index_skipping_dictionary",
    "source_orc_row_index_skipping_timestamp",
    "source_orc_bloom_skipping",
    # ANN rows-only pair + its exactness bracket, always adjacent
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "ann_recall_audit",
    # oldest r3-attested backlog, oldest-first
    "neardup_embeddings_lsh",
    "q13_customer_order_distribution",
    "q14_promo_revenue_share",
    "q18_large_volume_orders",
    "q2_min_cost_supplier",
    "scd2_customer_spend_versions",
    "subq_correlated_exists_recent_order",
    "subq_in_parts_shipped_by_small_suppliers",
    "subq_not_in_null_aware",
    "subq_scalar_above_avg_orders",
    "text_fingerprints",
    "text_langid_confusion",
    "text_quality_scores",
    "text_tfidf_top_terms",
    "text_token_stats",
    "text_top_bigrams_per_lang",
    "text_unigram_logprob",
    # r5-attested tail, oldest-first
    "approx_distinct_parts",
    "arr_name_token_features",
    "arr_order_line_parts",
    "arr_token_positions",
    "asof_purchase_last_click",
    "case_price_buckets",
    "cube_orders_status_priority",
    "curation_stratified_sample",
    "date_monthly_order_stats",
    "datediff_shipping_delay",
)


def register(
    name: str, *, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent).

    Module order here no longer controls the driver sweep window —
    ``all_queries`` reorders by ``SWEEP_PRIORITY`` — so this list only
    needs to be complete.
    """
    import importlib

    for mod in (
        "spark_hive_spark.jobs.scorecard",
        "spark_hive_spark.jobs.orc_roundtrip",
        "spark_hive_spark.operators.similarity",
        "spark_hive_spark.operators.curation",
        "spark_hive_spark.operators.textstats",
        "spark_hive_spark.operators.dedup",
        "spark_hive_spark.operators.sketches",
        "spark_hive_spark.operators.temporal",
        "spark_hive_spark.operators.analytics",
        "spark_hive_spark.sources.pydatasource",
        "spark_hive_spark.sources.jdbc",
        "spark_hive_spark.sources.puffin",
        "spark_hive_spark.operators.subqueries",
        "spark_hive_spark.streaming.windows",
        "spark_hive_spark.operators.multimodal",
        "spark_hive_spark.operators.webp",
        "spark_hive_spark.operators.udfs",
        "spark_hive_spark.operators.arrays",
        "spark_hive_spark.operators.windows",
        "spark_hive_spark.operators.grouping",
        "spark_hive_spark.operators.scalars",
        "spark_hive_spark.operators.statistics",
        "spark_hive_spark.operators.profiling",
        "spark_hive_spark.operators.reshape",
        "spark_hive_spark.operators.pipeline",
        "spark_hive_spark.operators.privacy",
        "spark_hive_spark.operators.scale",
        "spark_hive_spark.operators.relational",
        "spark_hive_spark.operators.relational2",
        "spark_hive_spark.operators.relational3",
        "spark_hive_spark.operators.modern_sql",
        "spark_hive_spark.operators.gif",
        "spark_hive_spark.operators.tiff",
        "spark_hive_spark.operators.flac",
        "spark_hive_spark.operators.media_containers",
        "spark_hive_spark.operators.avi",
        "spark_hive_spark.operators.adpcm",
        "spark_hive_spark.operators.warc",
        "spark_hive_spark.operators.webdataset",
        "spark_hive_spark.operators.avro",
        "spark_hive_spark.operators.zstd",
        "spark_hive_spark.operators.graph",
        "spark_hive_spark.operators.timeseries",
        "spark_hive_spark.operators.finance",
        "spark_hive_spark.operators.setsim",
        "spark_hive_spark.operators.mining",
        "spark_hive_spark.operators.search",
        "spark_hive_spark.operators.clustering",
        "spark_hive_spark.operators.spatial",
        "spark_hive_spark.sources.evolution",
        "spark_hive_spark.sources.parquet_meta",
        "spark_hive_spark.sources.orc_meta",
        "spark_hive_spark.sources.parquet_bloom",
        "spark_hive_spark.sources.delta_dv",
        "spark_hive_spark.sources.arrow_ipc",
        "spark_hive_spark.sources.sqlite_src",
        "spark_hive_spark.sources.hudi_mor",
        "spark_hive_spark.sources.delta_cdf",
        "spark_hive_spark.sources.iceberg_v3",
    ):
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            # module not built yet (incremental rounds) — skip
            continue


def all_queries() -> dict[str, Query]:
    """All registered queries, SWEEP_PRIORITY names first (in that
    order), then everything else in registration order."""
    _load_all()
    ordered: dict[str, Query] = {}
    for name in SWEEP_PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        ordered.setdefault(name, q)
    return ordered
