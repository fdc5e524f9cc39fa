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
# ordering is an attestation budget. Round-17 rotation (VERDICT r16
# item 8, executed): the 4 reference jobs stay pinned, then the 15 NEW
# round-17 queries (the r16 verdict's items — ORC bloom skipping on
# STRING keys + the dictionary-encoded composition, Iceberg
# changelog/CDC scan + its MOR position-delete half + the
# net-changes mode, Delta row
# tracking (JSON replay + checkpoint bootstrap + the deletion-
# vector compose), Hudi MOR
# as-of-instant + clustering replacecommit + parquet log blocks +
# CDC blocks,
# ORC decimal+date
# row-index seeking incl. the compressed chunked-varint form,
# parquet string blooms), then the ANN rows-only pair WITH its hash-green exactness
# bracket ``ann_recall_audit`` pinned adjacent (the graded
# CORRECTNESS file stays self-contained — the audit travels with the
# pair in every window), then the oldest attested backlog,
# oldest-first: 28 of the 35 oldest (r5-attested) queries in name
# order (exactly the spill the r16 comment promised plus the rest of
# the r5 tail; the last seven udf_p*/w*/window* names no longer
# fit).
# Backlog spill for r18 (next oldest, in order):
# udf_pandas_scalar_risk_score,
# udf_python_row_clean_names, w_customer_rank_in_nation,
# w_event_lag_lead_gaps, w_running_revenue_by_supplier,
# window_sliding_events, window_tumbling_events, then the
# r6-attested tail —
# approx_topk_tokens, arrow_doc_char_stats, arrow_group_doc_quantiles,
# bitmap_distinct_rollup, cdc_upsert_orders, ... . Recompute with the
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
    # round-17 NEW queries: driver rows on first appearance
    "source_orc_bloom_skipping_string",
    "source_iceberg_changelog_scan",
    "source_delta_row_tracking",
    "source_hudi_mor_time_travel",
    "source_orc_row_index_skipping_decimal",
    "source_parquet_bloom_skipping_string",
    "source_orc_bloom_skipping_dictionary",
    "source_iceberg_changelog_mor",
    "source_delta_row_tracking_checkpoint",
    "source_hudi_clustering_replacecommit",
    "source_iceberg_changelog_net_changes",
    "source_hudi_mor_parquet_log_blocks",
    "source_orc_row_index_skipping_decimal_compressed",
    "source_delta_row_tracking_dv",
    "source_hudi_cdc_incremental",
    # ANN rows-only pair + its exactness bracket, always adjacent
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "ann_recall_audit",
    # oldest (r5-attested) backlog, oldest-first, name order
    "distinct_supplier_part_counts",
    "funnel_view_click_purchase",
    "groupingsets_customer",
    "json_event_props",
    "json_event_schema",
    "map_struct_roundtrip",
    "math_supplier_balances",
    "multimodal_frame_samples",
    "multimodal_media_features",
    "percentiles_extendedprice",
    "pivot_revenue_by_linestatus",
    "q1_pricing_summary",
    "range_join_clicks_before_purchase",
    "retention_signup_cohorts",
    "rollup_lineitem_flags",
    "sessionize_events",
    "sketch_hll_mergeable_rollup",
    "skew_salted_join_order_revenue",
    "skew_salted_user_totals",
    "stream_dedup_within_watermark",
    "stream_session_windows",
    "stream_stateful_user_totals",
    "stream_stream_interval_join",
    "stream_tumbling_counts",
    "stream_watermarked_windows",
    "string_part_catalog",
    "text_repetition_filter",
    "udf_grouped_agg_weighted_mean",
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
