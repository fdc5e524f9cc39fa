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
# ordering is an attestation budget. Round-18 rotation (r17 verdict
# item 7, executed): the 4 reference jobs stay pinned, then the 12 NEW
# round-18 queries (the r17 verdict's items — the Iceberg changelog
# composed over EQUALITY deletes, Puffin theta-sketch NDV stats
# feeding the CBO audit, the Hudi metadata-table files partition over
# HFile base + HFILE log blocks, and incremental dedup against a
# frozen MinHash index, plus the theta UNION mergeability attest and
# the metadata-table column_stats skipping sibling, the changelog
# UPDATE-pairing mode, the dedup-index append maintenance cycle,
# the string-column theta sketches, and the metadata-table
# bloom_filters / record_index partitions + compaction), then the ANN
# rows-only pair WITH its
# hash-green exactness bracket ``ann_recall_audit`` pinned adjacent
# (the graded CORRECTNESS file stays self-contained — the audit
# travels with the pair in every window), then the oldest attested
# backlog by CORRECTNESS_r*.json max-round, name order: the seven
# r5-attested udf_p*/w*/window* names the r17 comment promised, then
# the r6-attested tail through source_python_datasource (the
# rows-only rfm_user_scores_approx travels with its hash-green
# bracket rfm_approx_audit, adjacent by name order).
# Backlog spill for r19 (next oldest, in order):
# ratio_to_report_customer_revenue, repeat_orders_within_week
# (displaced so the rfm rows-only pair kept its bracket adjacent
# in-window), rfm_user_scores, q9_nation_year_profit, and
# q7_nation_trade_volume (same displacement),
# semdedup_embedding_clusters, then
# sketch_hll_builtin_rollup,
# source_python_datasource,
# source_python_datasource_stream, sql_parameterized_brand_counts,
# sqlfn_discounted_revenue, stats_corr_regression,
# stream_foreachbatch_parquet_sink, stream_multibatch_tumbling,
# stream_static_enrich_segments, timeseries_gapfill_locf,
# udtf_document_chunks, w_rolling_hour_user_value,
# xml_part_roundtrip, then the r7-attested tail. Recompute with the
# CORRECTNESS_r*.json max-round scan (the
# test_r10_window_completes_attestation recipe) rather than trusting
# this comment.
# tests/test_registry_window.py asserts the window stays exactly this.
SWEEP_PRIORITY: tuple[str, ...] = (
    # pinned reference jobs (driver-green every round)
    "ref_top5_nations_by_avg_acctbal",
    "ref_top5_finished_orders_by_price",
    "ref_building_acctbal_stats_by_nation",
    "ref_orc_roundtrip",
    # round-18 NEW queries: driver rows on first appearance
    "source_iceberg_changelog_equality",
    "source_puffin_theta_ndv",
    "source_hudi_metadata_table_files",
    "dedup_incremental_against_index",
    "source_puffin_theta_union_ndv",
    "source_hudi_metadata_table_colstats",
    "source_iceberg_changelog_update_pairs",
    "dedup_incremental_index_update",
    "source_puffin_theta_ndv_strings",
    "source_hudi_metadata_table_bloom_filters",
    "source_hudi_metadata_table_compaction",
    "source_hudi_metadata_table_record_index",
    # ANN rows-only pair + its exactness bracket, always adjacent
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "ann_recall_audit",
    # oldest attested backlog (r5 tail, then r6), name order
    "udf_pandas_scalar_risk_score",
    "udf_python_row_clean_names",
    "w_customer_rank_in_nation",
    "w_event_lag_lead_gaps",
    "w_running_revenue_by_supplier",
    "window_sliding_events",
    "window_tumbling_events",
    "approx_topk_tokens",
    "arrow_doc_char_stats",
    "arrow_group_doc_quantiles",
    "bitmap_distinct_rollup",
    "calendar_densified_daily_orders",
    "cdc_upsert_orders",
    "events_hourly_anomaly",
    "events_type_transitions",
    "explode_outer_token_rows",
    "funnel_windowed_7d",
    "json_variant_props",
    "listagg_top_suppliers_per_nation",
    "mode_priority_per_nation",
    "multimodal_resize_plan",
    "pipe_syntax_brand_stats",
    "q10_returned_item_losses",
    "q12_priority_by_ship_year",
    "q19_disjunctive_revenue",
    "q22_idle_rich_customers",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "rfm_approx_audit",
    "rfm_user_scores_approx",
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
