"""Distributed exact order statistics.

Spark's exact ``percentile`` aggregate is holistic — every task ships
its full value buffer to a single final reducer, which is both slow
(measured 3.5 s on 600k rows) and memory-unbounded at 100 TB. The
scalable exact alternative implemented here: range-partition the bare
column (Spark's parallel sort machinery), collect only the
per-partition row COUNTS to the driver (O(partitions) scalars),
convert target quantile ranks to (partition, local-rank) addresses,
and fetch just the handful of straddling rows. Interpolation is
``lo + (hi - lo) * frac`` — bit-identical to DuckDB's
``quantile_cont`` over the same exact ranks, which is what lets
queries built on these boundaries carry full value-hash oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def distributed_quantiles(
    df: DataFrame, col: str, probs: list[float], partitions: int = 32
) -> list[float]:
    """Exact interpolated quantiles of ``df[col]`` (quantile_cont
    semantics) via range-partitioned order statistics. Driver traffic
    is bounded: ``partitions`` counts + 2*len(probs) picked rows."""
    vals = df.select(col)
    n = vals.count()
    if n == 0:
        raise ValueError(f"distributed_quantiles: {col} has no rows")
    targets = [(n - 1) * p for p in probs]
    need: set[int] = set()
    for pos in targets:
        lo = int(pos)
        need.update((lo, min(lo + 1, n - 1)))
    # cache freezes the sampled range bounds so the counts job and the
    # pick job see identical partitioning
    ranged = (
        vals.repartitionByRange(partitions, col)
        .withColumn("pid", F.spark_partition_id())
        .cache()
    )
    try:
        cnts = dict(
            (r["pid"], r["cnt"])
            for r in ranged.groupBy("pid")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        offsets, acc = {}, 0
        for pid in sorted(cnts):
            offsets[pid] = acc
            acc += cnts[pid]
        off_map = F.create_map(
            *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])]
        )
        w_local = W.partitionBy("pid").orderBy(col)
        picked = (
            ranged.withColumn(
                "gpos",
                off_map[F.col("pid")] + F.row_number().over(w_local) - 1,
            )
            .filter(F.col("gpos").isin(*need))
            .select("gpos", col)
            .collect()
        )
    finally:
        ranged.unpersist()
    by_pos = {r["gpos"]: r[col] for r in picked}
    out = []
    for pos in targets:
        lo = int(pos)
        frac = pos - lo
        lo_v = by_pos[lo]
        hi_v = by_pos[min(lo + 1, n - 1)]
        out.append(lo_v + (hi_v - lo_v) * frac)
    return out
