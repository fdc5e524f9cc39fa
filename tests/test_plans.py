"""Physical-plan quality gates (SURVEY.md §4 / the 100 TB posture):
these tests fail if a future change silently regresses pushdown,
broadcast selection, top-k fusion, or partial aggregation — the plan
properties that decide whether a query survives a 100× scale-up."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_hive_spark.plans.registry import all_queries
from spark_hive_spark.tables import t
from tests.conftest import SF_SMOKE

_Q = all_queries()


def _plan(spark, name: str) -> str:
    df = _Q[name].fn(spark, SF_SMOKE)
    df.collect()  # materialize THIS plan so AQE finalizes it
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_scan_prunes_and_pushes(spark):
    """Q1 must push the shipdate filter into the parquet scan and read
    only the 7 needed columns of 11."""
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    read = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_orderkey" not in read  # pruned
    assert "l_quantity" in read
    assert "l_comment" not in read


def test_q1_uses_whole_stage_codegen_and_partial_agg(spark):
    import contextlib
    import io

    df = _Q["q1_pricing_summary"].fn(spark, SF_SMOKE)
    df.collect()
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    formatted = buf.getvalue()
    # codegen'd operators carry the `*` marker / codegen id in
    # formatted explain (Spark 4 spells WholeStageCodegen this way)
    assert "[codegen id :" in formatted or "* HashAggregate" in formatted
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial (map-side) + final aggregate = two HashAggregate levels
    assert plan.count("HashAggregate") >= 2


def test_q3_broadcasts_filtered_customer(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert "BroadcastHashJoin" in plan


def test_q5_broadcasts_all_dims(spark):
    """supplier, nation, region must all go broadcast — the fact-side
    join tree should contain no shuffle for the dims."""
    plan = _plan(spark, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3


def test_topk_fuses_to_take_ordered(spark):
    """orderBy+limit must plan TakeOrderedAndProject, never a global
    sort (`SURVEY.md §2A O2`)."""
    plan = _plan(spark, "ref_top5_finished_orders_by_price")
    assert "TakeOrderedAndProject" in plan


def test_semi_join_stays_semi(spark):
    plan = _plan(spark, "join_semi_active_customers")
    assert "LeftSemi" in plan


def test_filter_pushdown_reaches_events_scan(spark):
    """user_id < 20 must reach the parquet reader even through the
    nanos-normalization projection."""
    plan = _plan(spark, "w_event_lag_lead_gaps")
    assert "PushedFilters: [IsNotNull(user_id), LessThan(user_id,20)]" in plan


def test_outer_join_preaggregates_before_broadcast(spark):
    """The nation outer-join query must aggregate orders BEFORE joining
    nation (the 25-row side), and broadcast the rollup."""
    plan = _plan(spark, "join_outer_nation_order_volume")
    assert "BroadcastHashJoin" in plan
    agg_pos = plan.index("HashAggregate")
    bj_pos = plan.index("BroadcastHashJoin")
    assert agg_pos > bj_pos or "BroadcastExchange" in plan


def test_partition_count_bounded_after_aqe(spark):
    """AQE must coalesce the tiny shuffle down (no 200-partition
    default leaking through)."""
    df = _Q["q1_pricing_summary"].fn(spark, SF_SMOKE)
    assert df.rdd.getNumPartitions() <= 32


def test_no_cartesian_products_anywhere(spark):
    """No registered query may plan a CartesianProduct — the only
    intentional all-pairs op (neardup_embeddings) is blocked GEMM, and
    broadcast nested loops are allowed only for the tiny-side topk
    patterns."""
    offenders = []
    for name, q in _Q.items():
        if name.startswith("stream_"):
            continue  # streaming queries execute eagerly; checked separately
        plan = q.fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_q4_exists_plans_semi_join_with_residual(spark):
    """The EXISTS in q4 must stay ONE pass: a left-semi hash join whose
    equi key is l_orderkey and whose late-shipment predicate runs as
    the join residual — not a distinct+inner-join rewrite."""
    plan = _plan(spark, "q4_order_priority_checking")
    assert "LeftSemi" in plan
    assert "HashedRelation" in plan or "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_q16_not_in_plans_anti_join(spark):
    """Q16's NOT IN over never-null keys must plan a plain anti join
    (broadcast at this size), not a null-aware nested loop."""
    plan = _plan(spark, "q16_supplier_part_counts")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_lineitem_shuffles_once(spark):
    """q21's decorrelation promise: lineitem meets orders and its own
    per-order summary on the SAME key, so the plan must not contain a
    second lineitem scan chain beyond the two branches sharing one
    shuffle family; concretely — no nested-loop joins, and the late
    filter happens before the per-order summary join."""
    plan = _plan(spark, "q21_waiting_suppliers")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_curation_sample_predicate_pushes_to_scan(spark):
    """The hash-sample predicate is row-local arithmetic; it must
    evaluate fused with the scan (DataFilters) and the whole plan must
    be shuffle-free — scan→filter and nothing else."""
    plan = _plan(spark, "curation_hash_sample")
    assert "Exchange" not in plan
    assert "HashAggregate" not in plan
    assert "pmod" in plan.split("DataFilters:")[1].split("]")[0]


def test_curation_packing_windows_per_shard(spark):
    """Sequence packing must window PARTITION BY source — a global
    (empty-partition) window would serialize the corpus through one
    task at 100 TB."""
    df = _Q["curation_pack_sequences"].fn(spark, SF_SMOKE)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "windowspecdefinition(source" in logical


def test_knn_lsh_broadcasts_query_side(spark):
    """The bucket-collision join must build (broadcast) the QUERY
    relation — broadcasting the bucketed corpus would OOM the driver
    at scale. The (tbl, bucket) join line must therefore say BuildLeft
    (query relation is the left/broadcast input)."""
    plan = _plan(spark, "knn_cosine_lsh")
    bucket_joins = [
        line
        for line in plan.splitlines()
        if "BroadcastHashJoin" in line and "bucket" in line
    ]
    assert bucket_joins, "expected a broadcast join on (tbl, bucket)"
    for line in bucket_joins:
        assert "BuildLeft" in line, f"corpus side got broadcast: {line}"


def test_funnel_pushes_event_type_to_scan(spark):
    """Each funnel stage must filter its event_type AT the parquet
    scan — at 100 TB the stage candidate sets are the only rows read
    off disk for each branch."""
    plan = _plan(spark, "funnel_view_click_purchase")
    assert "PushedFilters" in plan
    assert "EqualTo(event_type,view)" in plan
    assert "EqualTo(event_type,purchase)" in plan


def test_rolling_window_single_exchange(spark):
    """The trailing-hour RANGE frame needs exactly one shuffle (on
    user_id) — a self-join or re-exchange here would be the
    scale-killer this operator exists to avoid."""
    plan = _plan(spark, "w_rolling_hour_user_value")
    # AQE's toString appends the pre-adaptive "Initial Plan"; count
    # exchanges only in the final executed plan
    plan = plan.split("== Initial Plan ==")[0]
    # one exchange for the window partitioning; the final orderBy adds
    # a range-partitioning exchange for the output sort — nothing else
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 2, plan
    assert "Window" in plan
    assert "Join" not in plan


def test_retention_aggregates_before_final_count(spark):
    """The DISTINCT must land before the cohort count so the final
    aggregate's input is (user x week)-bounded, not event-bounded:
    plan shows >= 2 aggregate levels above the join."""
    plan = _plan(spark, "retention_signup_cohorts")
    assert plan.count("HashAggregate") >= 4  # distinct (2) + count (2)


def test_stream_stream_join_keeps_state_bounds(spark):
    """The interval join must remain a streaming symmetric hash join
    with watermarks on both sides (bounded state), not fall back to
    an unbounded buffer."""
    from spark_hive_spark.streaming.windows import stream_stream_interval_join

    out = stream_stream_interval_join(spark, SF_SMOKE)
    # semantic check at smoke scale: every pair is within the hour
    rows = out.collect()
    assert all(0 < r.gap_us <= 3_600_000_000 for r in rows)


def test_cdc_upsert_broadcasts_the_change_batch(spark):
    """The CDC apply join must broadcast the (small) update batch —
    the base fact table never shuffles for the merge; the only
    exchange left is the final per-status aggregate."""
    plan = _plan(spark, "cdc_upsert_orders")
    assert "BroadcastHashJoin" in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan


def test_gapfill_windows_partition_by_type(spark):
    """The LOCF window must partition by event_type (parallel per
    type), never collapse to a single global-sort partition."""
    plan = _plan(spark, "timeseries_gapfill_locf")
    assert "Window" in plan
    assert "partitionBy=[event_type" in plan.replace(" ", "") or (
        "hashpartitioning(event_type" in plan
    ), plan


def test_basket_pairs_broadcasts_dims_and_shuffles_once(spark):
    """The within-basket self-join must be an equi join on l_orderkey
    (never a cartesian) and both part-name enrichment joins must
    broadcast the dimension."""
    plan = _plan(spark, "basket_part_pairs")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-k fused, no full sort


def _final_plan(plan: str) -> str:
    """AQE's toString prints final + initial sections; plan-shape
    counts must look at the final one only."""
    if "== Initial Plan ==" in plan:
        return plan.split("== Initial Plan ==")[0]
    return plan


def test_span_coverage_has_no_self_join(spark):
    """Span coverage needs only the gram doc-frequency, so the plan
    must contain exactly one join (grams ⋈ df table) — a second join
    would mean an accidental pair-generation path. (The extra
    (g, doc_id) exchange is the two-phase count_distinct, not a
    join.)"""
    plan = _final_plan(_plan(spark, "dedup_span_coverage"))
    joins = sum(plan.count(j) for j in
                ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert joins == 1, plan


def test_table_checksum_pushes_column_pruning(spark):
    """Each per-table checksum scan must read only the serialized
    columns (events: everything but nothing extra; documents: no
    raw-text-length recompute... i.e. the scan schema must include the
    fingerprinted columns and the plan no shuffle beyond the final
    single-row aggregates)."""
    plan = _plan(spark, "table_checksum_validation")
    # no join anywhere: the union of per-table aggregates is join-free
    assert "Join" not in plan
    # map-side partial aggregation feeds 1-row final aggregates
    assert "partial" in plan.lower()


def test_fuzzy_pairs_joins_on_block_key(spark):
    """The fuzzy self-join must be an equi hash join keyed on the
    blocking token — levenshtein may only appear as a post-join
    filter/condition, never as the join strategy (nested loop)."""
    plan = _plan(spark, "fuzzy_levenshtein_part_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ewma_single_shuffle(spark):
    """The closed-form EWMA must shuffle once on user_id: window and
    final aggregate share the partitioning (one Exchange on the
    events scan side)."""
    plan = _final_plan(_plan(spark, "ewma_user_event_values"))
    # exchanges: one hash partitioning on user_id + the final sort's
    # range partitioning — nothing else
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_bloom_audit_probe_side_broadcasts(spark):
    """The Bloom probe must join the bounded bit table (and the member
    set) via broadcast — the probe side never shuffles."""
    plan = _plan(spark, "sketch_bloom_membership_audit")
    assert plan.count("BroadcastHashJoin") >= 2


def test_cms_probe_broadcasts_and_counters_partial_agg(spark):
    """CMS counters must partial-aggregate (map-side combine before
    the 3x1024-cell shuffle) and the 10-candidate probe must join the
    counter table via broadcast."""
    plan = _plan(spark, "sketch_cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan
    assert plan.count("HashAggregate") >= 2


def test_equidepth_histogram_no_holistic_agg_no_window(spark):
    """The equi-depth bucket-count plan must contain NO exact
    Percentile aggregate (holistic — unbounded state at scale) and NO
    window: boundaries arrive as folded literals from the separate
    order-statistics jobs, and assignment is pure codegen comparisons
    into a partial-aggregable group-by."""
    plan = _plan(spark, "histogram_equidepth_prices")
    assert "Percentile" not in plan
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 2


def test_snm_neighbor_window_is_partitioned(spark):
    """The SNM neighbor window must partition by the key prefix —
    a single-partition global window would serialize the sort."""
    plan = _plan(spark, "snm_sorted_neighborhood_pairs")
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_fk_audit_broadcasts_dimension_parents(spark):
    """nation/region parents must broadcast in the integrity sweep."""
    plan = _plan(spark, "integrity_fk_orphan_audit")
    assert "BroadcastHashJoin" in plan


def test_dpp_injects_dynamic_pruning_subquery(spark):
    """The partitioned-fact x filtered-dim join must carry a
    dynamicpruningexpression in the fact scan's PartitionFilters —
    without it the 100 TB fact scan reads every partition and the
    join discards them after IO."""
    plan = _plan(spark, "source_partition_pruning_dpp")
    assert "dynamicpruning" in plan.lower()


def test_proration_single_exchange_for_all_windows(spark):
    """All four order-partitioned windows in the proration query must
    share ONE Exchange on l_orderkey (Catalyst collapses
    same-partitioning windows); the residual-rank sort adds a local
    Sort, never a second shuffle of lineitem."""
    from spark_hive_spark.operators.finance import allocation_chain

    d = allocation_chain(spark, SF_SMOKE)
    d.collect()
    plan = d._jdf.queryExecution().executedPlan().toString()
    pre_window = plan.split("Window")[0]
    assert pre_window.count("Exchange hashpartitioning(l_orderkey") <= 1


def test_pseudonymized_join_broadcasts_nation(spark):
    plan = _plan(spark, "privacy_pseudonymized_join")
    assert "BroadcastHashJoin" in plan


def test_burnrate_bins_partial_aggregate(spark):
    """The 10-min binning must partial-aggregate map-side (two
    HashAggregate levels) before the window shuffle."""
    plan = _plan(spark, "slo_burnrate_multiwindow")
    assert plan.count("HashAggregate") >= 2


def test_ppjoin_verification_is_broadcast(spark):
    """The candidate→doc-array verification joins must be broadcast
    (doc-cardinality side), so verification adds no shuffle beyond
    the candidate distinct."""
    plan = _plan(spark, "setsim_ppjoin_prefix_filter")
    assert plan.count("BroadcastHashJoin") >= 2


def test_hard_negatives_no_cartesian(spark):
    """The directed block grid must execute as joins on block ids —
    never a cartesian of the embedding table with itself."""
    plan = _plan(spark, "mining_hard_negatives")
    assert "CartesianProduct" not in plan


def test_mannkendall_pair_join_is_contracted(spark):
    """The O(n²) pair join must run on the contracted monthly series:
    the join inputs are aggregates, not order-table scans (exactly 1
    scan of orders feeds the monthly aggregate; the pair join sits
    above it)."""
    plan = _plan(spark, "mannkendall_theilsen_trend")
    # the checkpointed monthly series is the only input — the final
    # plan re-scans NO parquet at all
    assert plan.count("Scan parquet") == 0


def test_kaplan_meier_contracts_before_window(spark):
    """The K-M ordered window must consume the per-lifetime aggregate
    (calendar-bounded), never the raw per-customer rows: a partial
    aggregate precedes the single-partition window exchange."""
    plan = _plan(spark, "kaplan_meier_customer_lifetime")
    # window + output consume only the checkpointed lifetime
    # histogram: no parquet rescan in the final plan
    assert plan.count("Scan parquet") == 0
    assert "Window" in plan


def test_geo_radius_join_is_cell_equi_join(spark):
    """The banded spatial join must execute as an EQUI-join on the
    grid-cell key (hash or merge; AQE may broadcast the small side at
    fixture scale) with the exact haversine predicate as a post-join
    filter — never a nested-loop over the point pairs."""
    plan = _plan(spark, "geo_geohash_radius_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_runtime_bloom_filter_injected(spark):
    """The shuffle join must carry Catalyst's injected runtime bloom
    filter: a bloom_filter_agg subquery over the filtered build keys
    and a might_contain predicate on the probe side BEFORE its
    exchange — probe rows that cannot match die at the scan."""
    df = _Q["join_runtime_bloom_filter"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "bloom_filter_agg" in plan
    assert "might_contain" in plan


def test_corpus_curation_shingle_stage_cached(spark):
    """The curation pipeline's quality-gated shingle set feeds three
    consumers (both sides of the pair self-join + the per-doc size
    aggregate). It must be served from ONE cached stage — uncached,
    Catalyst re-derived the whole posexplode/window shingle chain per
    consumer (9 file scans / 8 window stages in the round-9 plan
    audit). The gate pins the cached shape: InMemoryTableScan present
    and at most 2 window stages actually executing outside the cache
    (the 2-lead shingle window inside the one cache-fill plan)."""
    from spark_hive_spark.operators import pipeline as pl

    pl._PIPE_SHINGLE_CACHE.clear()
    df = _Q["pipeline_corpus_curation"].fn(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    # after materialization the cache serves rows; the shingle chain's
    # file scans live only inside the InMemoryRelation's cached child.
    # Re-running the query must hit the per-(session, sf_dir) memo:
    df2 = _Q["pipeline_corpus_curation"].fn(spark, SF_SMOKE)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan2
    assert len(pl._PIPE_SHINGLE_CACHE) == 1
