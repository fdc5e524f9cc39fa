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
# ordering is an attestation budget. Round-13 rotation (VERDICT r12
# task 2, executed): the 4 reference jobs stay pinned, then the 17 NEW
# round-13 queries (driver rows on first appearance — cumulative
# attestation stays complete), then re-attestations of everything whose
# implementation changed this round (the ORC timestamp reader gained
# writer-timezone + pre-1970 handling; the v2-checkpoint reader gained
# the inline-action loud seam; the arrow_ipc family rides the delta-
# dictionary + LZ4 bounds changes; delta_column_mapping gained the
# id-mode dispatch; the list-decode parquet family rides the
# single-rep-level Dremel generalization; DSIR rides the
# _dsir_doc_weights refactor; hudi_mor rides its module's compaction
# additions), then the r12-enumerated backlog spill (the seven
# r2-attested queries) and the oldest r3-attested curation/dedup/
# embedding/text/tpch tail, oldest-first. Backlog spill for r14:
# scd2_customer_spend_versions, subq_correlated_exists_recent_order,
# subq_in_parts_shipped_by_small_suppliers, subq_not_in_null_aware,
# subq_scalar_above_avg_orders, text_fingerprints,
# text_langid_confusion, text_quality_scores, text_tfidf_top_terms,
# text_token_stats, text_top_bigrams_per_lang, text_unigram_logprob,
# then knn_cosine_bruteforce, embedding_norm_stats,
# embedding_quantize_audit,
# knn_cosine_ivf, knn_cosine_lsh,
# lateral_top2_orders_per_customer,
# neardup_embeddings,
# neardup_embeddings_lsh,
# q13_customer_order_distribution,
# q14_promo_revenue_share, q18_large_volume_orders,
# q2_min_cost_supplier (displaced by the ORC-nested/RLEv2 additions)
# and the r5-attested tail (approx_distinct_parts, arr_* ...).
# tests/test_registry_window.py asserts the window stays exactly this.
SWEEP_PRIORITY: tuple[str, ...] = (
    # pinned reference jobs (driver-green every round)
    "ref_top5_nations_by_avg_acctbal",
    "ref_top5_finished_orders_by_price",
    "ref_building_acctbal_stats_by_nation",
    "ref_orc_roundtrip",
    # round-13 NEW queries: driver rows on first appearance
    "curation_dsir_importance_select_approx",
    "dsir_approx_audit",
    "source_parquet_map_decode",
    "source_parquet_list_struct_decode",
    "source_parquet_nested_list_decode",
    "source_delta_checkpoint_partition_values",
    "source_arrow_ipc_delta_dictionary",
    "source_delta_column_mapping_id",
    "source_hudi_mor_compaction",
    "source_hudi_clean_replay",
    "source_orc_list_decode",
    "source_orc_map_struct_decode",
    "source_parquet_byte_stream_split_decode",
    "source_orc_decimal_boolean_decode",
    "source_iceberg_branch_tag_read",
    "source_avro_logical_types",
    "source_orc_deep_nested_decode",
    # round-13 implementation changes: re-attest under the new code
    # (the RLEv2 PATCHED_BASE patch-width fix rides every ORC reader)
    "source_orc_timestamp_double_decode",
    "source_delta_v2_checkpoint_replay",
    "source_arrow_ipc_dictionary",
    "source_arrow_ipc_stream",
    "source_arrow_ipc_records",
    "source_delta_column_mapping",
    "source_parquet_nested_decode",
    "source_parquet_list_strings_decode",
    "curation_dsir_importance_select",
    "source_hudi_mor_snapshot",
    "source_orc_rlev2_decode",
    "source_orc_stripe_skipping",
    "source_avro_records",
    "source_avro_schema_evolution",
    # r12-enumerated backlog spill: the seven r2-attested queries
    "rollup_grouping_flags",
    "safe_arithmetic_orders",
    "setops_bag_semantics",
    "setops_segment_overlap",
    "string_edit_distance_pairs",
    "unpivot_lineitem_measures",
    "w_value_functions",
    # oldest r3-attested tail, oldest-first
    "curation_hash_sample",
    "curation_pack_sequences",
    "curation_source_mixture",
    "curation_split_contamination",
    "curation_stopword_scrub",
    "curation_train_test_split",
    "dedup_duplicate_clusters",
    "dedup_simhash",
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
