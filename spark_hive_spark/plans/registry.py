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
# ordering is an attestation budget. Round-11 rotation: the 4 reference
# jobs stay pinned, then the 11 NEW round-11 queries (driver rows on
# first appearance — cumulative attestation stays complete), then
# re-attestations of everything whose implementation changed this round
# (the four ADVICE fixes touch the parquet/ORC metadata layer and the
# CAS primitive; the avro codec gained arrays; the page walkers were
# refactored), then the single-round-old r10 additions as rotation
# filler. Backlog for r12 re-attestation: the r10 tail displaced here
# (ks/cvm tests, zstd real-frame, g711, jpeg_422) and the long-stale
# r01-attested relational/dedup families (dedup_*, w_top3, stats_*).
# tests/test_registry_window.py asserts the window stays exactly this.
SWEEP_PRIORITY: tuple[str, ...] = (
    # pinned reference jobs (driver-green every round)
    "ref_top5_nations_by_avg_acctbal",
    "ref_top5_finished_orders_by_price",
    "ref_building_acctbal_stats_by_nation",
    "ref_orc_roundtrip",
    # round-11 NEW queries: driver rows on first appearance
    "source_parquet_bloom_skipping",
    "source_delta_deletion_vectors",
    "source_iceberg_equality_deletes",
    "multimodal_avi_frame_sampling",
    "multimodal_adpcm_audio_decode",
    "source_parquet_page_skipping",
    "source_hudi_timeline_replay",
    "source_iceberg_hidden_partitioning",
    "storage_zorder_clustering_audit",
    "source_arrow_ipc_records",
    "source_sqlite_table_scan",
    "source_hudi_mor_snapshot",
    "source_delta_cdf_changes",
    # round-11 implementation changes (ADVICE fixes + page-walk
    # refactor + avro array support): re-attest under the new code
    "source_parquet_footer_stats",
    "source_parquet_rowgroup_skipping",
    "source_parquet_page_decode",
    "source_parquet_spark_native_decode",
    "source_orc_stripe_skipping",
    "source_orc_rlev2_decode",
    "snapshot_concurrent_commit_audit",
    "snapshot_semantic_conflict_audit",
    "snapshot_time_travel_read",
    "snapshot_expire_audit",
    "source_avro_records",
    "source_avro_schema_evolution",
    "source_iceberg_snapshot_replay",
    "source_iceberg_position_deletes",
    "source_delta_log_replay",
    "source_delta_checkpoint_replay",
    # rotation: r10 additions whose driver row is a single round old
    # stay sweepable behind the new/changed set
    "multimodal_jpeg_partial_mcu_decode",
    "multimodal_webp_predictor_decode",
    "multimodal_jpeg_multiscan_restart_decode",
    "multimodal_webp_full_profile_decode",
    "multimodal_webp_alpha_decode",
    "multimodal_png_variants_decode",
    "multimodal_gif_decode",
    "multimodal_tiff_decode",
    "multimodal_flac_decode",
    "pipeline_mixed_media_features",
    "multimodal_container_metadata",
    "multimodal_jpeg12_decode",
    "multimodal_pnm_decode",
    "source_warc_records",
    "source_webdataset_tar",
    "text_bpe_tokenize",
    "crawl_url_canonical_dedup",
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
