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
# ordering is an attestation budget. Round-12 rotation (the VERDICT r11
# task-2 backlog, executed): the 4 reference jobs stay pinned, then the
# 11 NEW round-12 queries (driver rows on first appearance — cumulative
# attestation stays complete), then re-attestations of everything whose
# implementation changed this round (the parquet page-decode family
# rides the nested-levels refactor; arrow_ipc gained dictionary
# resolution + LZ4_FRAME; delta_cdf gained the no-cdc guards; hudi_mor
# was rewritten around rollback blocks / multi-log slices / per-group
# tasks), then the judge-enumerated attestation backlog (the displaced
# r10 tail and the longest-stale dedup/window/stats families), then the
# oldest r2-attested relational families oldest-first. Backlog spill
# for r13: rollup_grouping_flags, safe_arithmetic_orders,
# setops_bag_semantics, setops_segment_overlap,
# string_edit_distance_pairs, unpivot_lineitem_measures,
# w_value_functions, plus the r3-attested curation/text/tpch tail
# (all have r2/r6 rows; nothing unattested remains).
# tests/test_registry_window.py asserts the window stays exactly this.
SWEEP_PRIORITY: tuple[str, ...] = (
    # pinned reference jobs (driver-green every round)
    "ref_top5_nations_by_avg_acctbal",
    "ref_top5_finished_orders_by_price",
    "ref_building_acctbal_stats_by_nation",
    "ref_orc_roundtrip",
    # round-12 NEW queries: driver rows on first appearance
    "source_parquet_nested_decode",
    "source_parquet_struct_decode",
    "source_parquet_list_strings_decode",
    "source_parquet_decimal_bool_decode",
    "source_parquet_int96_timestamp_decode",
    "source_orc_timestamp_double_decode",
    "source_arrow_ipc_dictionary",
    "source_arrow_ipc_stream",
    "source_delta_column_mapping",
    "source_delta_v2_checkpoint_replay",
    "curation_dsir_importance_select",
    # round-12 implementation changes: re-attest under the new code
    "source_parquet_page_decode",
    "source_parquet_spark_native_decode",
    "source_parquet_page_skipping",
    "source_parquet_rowgroup_skipping",
    "source_arrow_ipc_records",
    "source_delta_cdf_changes",
    "source_hudi_mor_snapshot",
    # judge-enumerated backlog: the displaced r10 tail...
    "ks_test_segments",
    "cvm_test_segments",
    "multimodal_zstd_real_frame_decode",
    "multimodal_g711_audio_decode",
    "multimodal_jpeg_422_decode",
    # ...and the longest-stale dedup/window/stats families
    "dedup_exact_normalized",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "w_top3_parts_per_brand",
    "stats_variance_family",
    # oldest r2-attested relational families, oldest-first
    "cross_join_region_priority_matrix",
    "date_arithmetic_orders",
    "histogram_order_prices",
    "join_anti_customers_without_pending",
    "join_outer_nation_order_volume",
    "join_semi_active_customers",
    "null_semantics_orders",
    "observe_ingest_gate",
    "profile_orders_columns",
    "q11_important_part_values",
    "q15_top_revenue_suppliers",
    "q16_supplier_part_counts",
    "q17_below_avg_quantity_revenue",
    "q20_majority_share_suppliers",
    "q21_waiting_suppliers",
    "q4_order_priority_checking",
    "q8_nation_market_share",
    "recursive_consecutive_activity",
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
