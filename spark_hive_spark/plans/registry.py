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
# ordering is an attestation budget. Round-19 rotation (r18 verdict
# item 7, executed): the 4 reference jobs stay pinned, then the 21 NEW
# round-19 queries (the r18 verdict's items — Iceberg v3 row lineage
# through a compaction rewrite and composed with deletion vectors,
# partition statistics + their incremental maintenance, Hudi
# savepoint/restore + the incremental pull across a restore,
# incremental ANN index maintenance, the theta-driven join-ordering
# audit — plus the row-id-keyed changelog and the sharded record
# index composes), then the oldest attested backlog by
# CORRECTNESS_r*.json max-round, name order: the r6-attested tail
# (q7/q9/ratio/repeat/rfm_user_scores displaced from r18's spill list
# now land, through xml_part_roundtrip), then the r7-attested head
# through collation_ci_part_names. No rows-only query is in this
# window, so no bracket pairing applies (the knn/ann and rfm pairs
# attested r18 travel together whenever they re-enter).
# Backlog spill for r20 (next oldest, in order):
# curation_temperature_mixture,
# dedup_span_coverage, ewma_user_event_values,
# fuzzy_levenshtein_part_pairs, graph_triangle_clustering,
# groupby_all_year_priority, impute_missing_acctbal,
# journey_top_paths, kanonymity_audit, maintenance_compaction_audit,
# map_hof_event_profile,
# multimodal_decode_resize, multimodal_wav_features,
# pagerank_nation_trade, pii_redaction_stats, psi_price_drift,
# quality_hashed_linear_classifier, recursive_cte_custkey_tree,
# reservoir_per_key_sample, running_distinct_users,
# sink_dynamic_partition_overwrite, skew_diagnostic_report,
# skyline_price_size_parts, then the rest of the r7 tail. Recompute
# with the CORRECTNESS_r*.json max-round scan (the
# test_r10_window_completes_attestation recipe) rather than trusting
# this comment.
# tests/test_registry_window.py asserts the window stays exactly this.
SWEEP_PRIORITY: tuple[str, ...] = (
    # pinned reference jobs (driver-green every round)
    "ref_top5_nations_by_avg_acctbal",
    "ref_top5_finished_orders_by_price",
    "ref_building_acctbal_stats_by_nation",
    "ref_orc_roundtrip",
    # round-19 NEW queries: driver rows on first appearance
    "source_iceberg_v3_row_lineage_rewrite",
    "source_iceberg_v3_row_lineage_dv",
    "source_iceberg_changelog_row_lineage",
    "source_iceberg_partition_stats",
    "source_iceberg_partition_stats_incremental",
    "source_iceberg_partition_stats_evolution",
    "source_iceberg_table_statistics_lineage",
    "source_hudi_restore",
    "source_hudi_restore_mor",
    "source_hudi_incremental_across_restore",
    "source_hudi_metadata_record_index_sharded",
    "stream_hudi_timeline_microbatch",
    "ann_incremental_index_audit",
    "ann_index_delete_audit",
    "dedup_index_compaction_audit",
    "source_puffin_theta_join_order",
    "source_hudi_clean_savepoint_guard",
    "source_iceberg_rewrite_manifests",
    "source_delta_cdf_row_tracking",
    "source_hudi_record_index_update",
    "source_iceberg_expire_statistics",
    # oldest attested backlog (r6 tail, then r7 head), name order
    "q7_nation_trade_volume",
    "q9_nation_year_profit",
    "ratio_to_report_customer_revenue",
    "repeat_orders_within_week",
    "rfm_user_scores",
    "semdedup_embedding_clusters",
    "sketch_hll_builtin_rollup",
    "source_python_datasource",
    "source_python_datasource_stream",
    "sql_parameterized_brand_counts",
    "sqlfn_discounted_revenue",
    "stats_corr_regression",
    "stream_foreachbatch_parquet_sink",
    "stream_multibatch_tumbling",
    "stream_static_enrich_segments",
    "timeseries_gapfill_locf",
    "udtf_document_chunks",
    "w_rolling_hour_user_value",
    "xml_part_roundtrip",
    "approx_percentile_audit",
    "basket_part_pairs",
    "benford_price_digits",
    "chisq_segment_priority",
    "cogroup_click_purchase_latency",
    "collation_ci_part_names",
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
