"""Scale-pattern verification: salting result-equivalence is covered
by the oracle parity suite; here we verify the PLAN-level claims
(bucketed joins are exchange-free) and writer round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark):
    from spark_hive_spark.operators.scale import bucketed_order_lineitem_join

    df = bucketed_order_lineitem_join(spark, SF_SMOKE)
    rows = df.collect()
    assert rows  # produces real output
    plan = df._jdf.queryExecution().executedPlan().toString()
    # bucketing must eliminate the JOIN-side shuffles (the final
    # groupBy on a different key still exchanges — that's expected)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    # and it matches the unbucketed computation
    from spark_hive_spark.tables import t
    from spark_hive_spark.functions.numeric import dsum

    li = t(spark, SF_SMOKE, "lineitem")
    orders = t(spark, SF_SMOKE, "orders")
    exp = {
        (r.o_orderpriority, r.n, float(r.qty))
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("qty"))
        .collect()
    }
    got = {(r.o_orderpriority, r.n, float(r.qty)) for r in rows}
    assert got == exp


def test_salt_is_deterministic_across_runs(spark):
    from spark_hive_spark.operators.scale import salt_col
    from spark_hive_spark.tables import t

    ev = t(spark, SF_SMOKE, "events")
    a = ev.select("event_id", salt_col(["event_id"], 16).alias("s")).collect()
    b = ev.select("event_id", salt_col(["event_id"], 16).alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    buckets = {r.s for r in a}
    assert buckets <= set(range(16)) and len(buckets) > 8  # spreads


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_writer_roundtrip(spark, tmp_path, fmt):
    """Every sink format round-trips the lineitem slice losslessly
    (CSV/JSON via explicit schema on read-back — inference is not part
    of the contract)."""
    from spark_hive_spark.tables import t

    df = t(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    ).filter(F.col("l_orderkey") < 50)
    out = str(tmp_path / f"rt_{fmt}")
    w = df.write.mode("overwrite")
    if fmt == "csv":
        w = w.option("header", True)
    getattr(w, fmt)(out)
    r = spark.read
    if fmt in ("csv", "json"):
        r = r.schema(df.schema)
        if fmt == "csv":
            r = r.option("header", True)
    back = getattr(r, fmt)(out)
    assert back.count() == df.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_partitioned_parquet_prunes(spark, tmp_path):
    """partitionBy write + filtered read: the scan must list only the
    matching partition directory (PartitionFilters, not a full scan)."""
    from spark_hive_spark.tables import t

    df = t(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    out = str(tmp_path / "part_parquet")
    df.write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    back.collect()
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert back.count() == df.filter(F.col("l_returnflag") == "R").count()


def test_salted_agg_under_synthetic_skew(spark):
    """One white-hot key (50k rows) + a long tail: the salted
    two-phase aggregate must equal the direct groupBy exactly, and the
    salt must actually spread the hot key across buckets."""
    import pyspark.sql.functions as F

    from spark_hive_spark.operators.scale import salt_col, salted_agg

    hot = spark.range(50_000).select(
        F.lit(7).alias("k"), (F.col("id") % 100).cast("double").alias("v"),
        F.col("id").alias("rid"),
    )
    tail = spark.range(5_000).select(
        (F.col("id") % 500 + 100).alias("k"),
        (F.col("id") % 50).cast("double").alias("v"),
        (F.col("id") + 1_000_000).alias("rid"),
    )
    df = hot.unionByName(tail).repartition(16)

    direct = {
        (r.k, r.n, float(r.s))
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    salted = {
        (r.k, r.n, float(r.s))
        for r in salted_agg(
            df,
            "k",
            [
                F.count("*").alias("_n"),
                F.sum(F.col("v").cast("decimal(18,2)")).alias("_s"),
            ],
            [
                F.sum("_n").alias("n"),
                F.sum("_s").cast("double").alias("s"),
            ],
            salt_from=["rid"],
            buckets=16,
        ).collect()
    }
    assert salted == direct
    # the hot key really spreads over >= 12 of 16 salt buckets
    spread = (
        df.filter(F.col("k") == 7)
        .select(salt_col(["rid"], 16).alias("s"))
        .distinct()
        .count()
    )
    assert spread >= 12


def test_python_datasource_reads_in_parallel(spark):
    """The custom Python data source must split its scan into the
    requested partitions — the property that makes a source usable on
    a cluster (no driver funnel)."""
    from spark_hive_spark.sources.pydatasource import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_rows")
        .option("n", "1000")
        .option("partitions", "16")
        .load()
    )
    assert df.rdd.getNumPartitions() == 16
    assert df.count() == 1000
    # retry-idempotence: two reads agree row-for-row
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, df.collect()))
    assert a == b


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Runtime (DPP-style) bloom-filter join pruning: with a selective
    dim-side filter and broadcast disabled, Spark must inject
    bloom_filter_agg on the creation side and a might_contain filter
    on the fact scan — the runtime filter that keeps a shuffle join's
    fact side from streaming non-matching rows at 100 TB. Thresholds
    are lowered because the sf0.1 fixtures sit below the production
    defaults; the MECHANISM is what's attested."""
    from pyspark.sql import functions as F
    from spark_hive_spark.tables import t

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sf = "/root/testdata/sf0.1"
        li = t(spark, sf, "lineitem")
        orders = t(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, "no runtime bloom filter on fact side"
        assert "bloom_filter_agg" in plan, "no bloom creation on dim side"
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_analyze_table_feeds_cbo_stats(spark):
    """ANALYZE TABLE COMPUTE STATISTICS must land row counts in the
    catalog and surface them through the optimizer's stats — the
    input the cost-based joiner needs to pick broadcast/shuffle sides
    on a real warehouse."""
    from spark_hive_spark.tables import t
    from tests.conftest import SF_SMOKE

    name = "shs_stats_probe"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    t(spark, SF_SMOKE, "nation").write.saveAsTable(name)
    prev_cbo = spark.conf.get("spark.sql.cbo.enabled", "false")
    try:
        spark.sql(f"ANALYZE TABLE {name} COMPUTE STATISTICS")
        # catalog-level: ANALYZE recorded exact rows + size
        desc = {
            r.col_name: r.data_type
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        }
        assert "25 rows" in desc.get("Statistics", ""), desc.get("Statistics")
        # optimizer-level: with CBO on, the plan sees the rowCount
        spark.conf.set("spark.sql.cbo.enabled", "true")
        stats = (
            spark.table(name)._jdf.queryExecution().optimizedPlan().stats()
        )
        assert stats.rowCount().isDefined(), "CBO did not surface rowCount"
        assert stats.rowCount().get() == 25
        assert stats.sizeInBytes() > 0
    finally:
        spark.conf.set("spark.sql.cbo.enabled", prev_cbo)
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_lsh_bucket_cap_bounds_task_size_under_skew(spark):
    """Adversarial skew: one LSH bucket holds 85% of all vectors. The
    salted chunk-pair decomposition must (a) bound every task's row
    count near the cap, and (b) emit EXACTLY the pair set of the
    uncapped plan — the cap is a scheduling transform, not an
    approximation."""
    import numpy as np

    from spark_hive_spark.operators.similarity import (
        _chunk_pair_fn,
        _salted_bucket_tasks,
    )

    rng = np.random.RandomState(7)
    n_hot, n_cold, dim, cap = 340, 60, 8, 50
    rows = []
    for i in range(n_hot):  # all collide in (tbl=0, bucket=0)
        rows.append((i, [float(x) for x in rng.standard_normal(dim)], 0, 0))
    for i in range(n_cold):  # spread over 12 cold buckets
        rows.append(
            (n_hot + i, [float(x) for x in rng.standard_normal(dim)], 0, 1 + i % 12)
        )
    bucketed = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, tbl int, bucket int"
    )

    tasks = _salted_bucket_tasks(bucketed, cap)

    # (a) no task sees more than ~2 chunks of rows, regardless of skew
    sizes = (
        tasks.groupBy("tbl", "bucket", "chunk_a", "chunk_b")
        .count()
        .collect()
    )
    max_task = max(r["count"] for r in sizes)
    assert max_task <= int(2.5 * cap), f"task of {max_task} rows escaped the cap"
    # the hot bucket really was split: ceil(340/50)=7 chunks -> 28 tasks
    hot_tasks = [r for r in sizes if r.bucket == 0]
    assert len(hot_tasks) == 7 * 8 // 2, len(hot_tasks)

    # (b) capped output == uncapped output, pair for pair
    threshold = 0.2
    capped = (
        tasks.groupBy("tbl", "bucket", "chunk_a", "chunk_b")
        .applyInPandas(
            _chunk_pair_fn(threshold), "vec_a long, vec_b long, cos_sim double"
        )
        .distinct()
        .collect()
    )
    uncapped_tasks = _salted_bucket_tasks(bucketed, 10**9)  # C=1 everywhere
    uncapped = (
        uncapped_tasks.groupBy("tbl", "bucket", "chunk_a", "chunk_b")
        .applyInPandas(
            _chunk_pair_fn(threshold), "vec_a long, vec_b long, cos_sim double"
        )
        .distinct()
        .collect()
    )
    to_set = lambda rs: {(r.vec_a, r.vec_b, r.cos_sim) for r in rs}
    assert to_set(capped) == to_set(uncapped)
    assert len(capped) == len(uncapped)  # no within-bucket double-emits


def test_pointer_jumping_converges_on_long_chain(spark):
    """A 120-node path graph has diameter 119: neighbor-only
    propagation would need ~119 rounds, far past the 15-round bound.
    Pointer jumping must converge inside the bound and still label
    every node with the component minimum."""
    from spark_hive_spark.operators.dedup import connected_components

    n = 120
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    out = connected_components(pairs, "a", "b", "node", max_iters=15).collect()
    assert len(out) == n
    assert all(r.cluster_id == 0 for r in out)
    assert sum(r.is_representative for r in out) == 1
    assert all(r.cluster_size == n for r in out)


def test_distributed_quantiles_match_percentile_and_partitioning(spark):
    """The range-partitioned order-statistics helper must return
    EXACTLY Spark's percentile aggregate (same quantile_cont
    interpolation) and be invariant to input partitioning — the
    property that makes boundary-based queries hash-stable on any
    cluster layout."""
    from pyspark.sql import functions as F

    from spark_hive_spark.functions.stats import distributed_quantiles

    vals = [(float(x % 97) + 0.25 * (x % 4),) for x in range(1000)]
    probs = [0.05, 0.125, 0.5, 0.9, 0.95]
    df1 = spark.createDataFrame(vals, "v double")
    df8 = df1.repartition(8)
    df3 = df1.repartition(3, "v")
    expected = (
        df1.agg(
            F.percentile("v", F.array(*[F.lit(p) for p in probs]))
        ).collect()[0][0]
    )
    for df in (df1, df8, df3):
        got = distributed_quantiles(df, "v", probs, partitions=5)
        assert got == list(expected), (got, list(expected))


def test_aqe_skew_join_splits_hot_partition(spark):
    """SCALE.md's first global claim is 'AQE skew-join is on' — this
    proves it ACTIVATES: a join where ~90% of left rows share one key
    must show SortMergeJoin(skew=true) in the final adaptive plan
    (AQE split the hot partition into subpartitions at runtime), and
    the result must equal the non-adaptive computation exactly.
    Thresholds are lowered to fixture scale for the test and restored
    — a cluster run keeps the defaults."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.shuffle.partitions",
        )
    }
    try:
        # pin the partition count the thresholds were sized for —
        # at 16+ partitions this fixture's hot partition compresses
        # under the point where the split beats a coalesce, and the
        # conftest value is clobberable (builder.getOrCreate()
        # re-applies configs to a live session)
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "32KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        left = spark.range(0, 200000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = (
            left.join(right, "k")
            .groupBy()
            .agg(F.count("*").alias("n"), F.sum("w").alias("sw"))
        )
        row = j.collect()[0]
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        # correctness under the split: every left row matches exactly
        # one right row, so n == |left| and sw == sum over left of 2k
        assert row.n == 200000
        expected_sw = left.select(F.sum(F.col("k") * 2)).collect()[0][0]
        assert row.sw == expected_sw
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
