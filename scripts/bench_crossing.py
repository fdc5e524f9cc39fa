"""ANN/exact crossing-point measurement (VERDICT r8 task 2).

Measures `mining_hard_negatives` (exact, adaptive blocked GEMM) vs
`mine_hard_negatives_ann` (IVF-cell bounded) wall time across corpus
sizes, and at the largest N sweeps (n_cells, nprobe) settings with
measured RECALL vs the exact result — producing both the N where the
ANN miner's wall time wins at the registered setting and the
probe-fraction/recall trade curve that justifies the documented
scaling policy. Results land in SCALE.md.

Usage: python scripts/bench_crossing.py [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SCALES = [
    ("sf0.1", "/root/testdata/sf0.1"),
    ("sf1", os.path.join(os.path.dirname(__file__), "..", "testdata_scale", "sf1")),
    ("sf5", os.path.join(os.path.dirname(__file__), "..", "testdata_scale", "sf5")),
]
SWEEP = [(16, 8), (32, 16), (64, 16), (64, 32), (256, 64)]


def main() -> None:
    from pyspark.sql import functions as F

    from spark_hive_spark.operators.mining import (
        mine_hard_negatives_ann,
        mining_hard_negatives,
    )
    from spark_hive_spark.session import get_spark

    spark = get_spark(
        "bench-crossing", extra_conf={"spark.driver.memory": "24g"}
    )
    results: dict = {"crossing": {}, "sweep_sf5": []}

    exact_cache: dict[str, object] = {}
    for label, sf_dir in SCALES:
        row = {}
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            df = mining_hard_negatives(spark, sf_dir).localCheckpoint(eager=True)
            n = df.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        exact_cache[label] = df.select("query_id", "neighbor_id")
        row["exact_s"], row["exact_rows"] = round(best, 2), n
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            adf = mine_hard_negatives_ann(spark, sf_dir).localCheckpoint(eager=True)
            an = adf.count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        hit = adf.select("query_id", "neighbor_id").join(
            exact_cache[label], ["query_id", "neighbor_id"]
        ).count()
        row["ann_s"], row["ann_rows"] = round(best, 2), an
        row["recall"] = round(hit / n, 3)
        results["crossing"][label] = row
        print(f"# {label}: exact {row['exact_s']}s ann {row['ann_s']}s "
              f"recall {row['recall']}", flush=True)

    sf5 = SCALES[-1][1]
    exact5 = exact_cache["sf5"]
    n5 = exact5.count()
    for cells, nprobe in SWEEP:
        t0 = time.perf_counter()
        adf = mine_hard_negatives_ann(
            spark, sf5, n_cells=cells, nprobe=nprobe
        ).localCheckpoint(eager=True)
        adf.count()
        dt = time.perf_counter() - t0
        hit = adf.select("query_id", "neighbor_id").join(
            exact5, ["query_id", "neighbor_id"]
        ).count()
        entry = {
            "cells": cells, "nprobe": nprobe,
            "frac": round(nprobe / cells, 3),
            "wall_s": round(dt, 2), "recall": round(hit / n5, 3),
        }
        results["sweep_sf5"].append(entry)
        print(f"# sf5 cells={cells} nprobe={nprobe}: {entry}", flush=True)

    results["load1"] = round(os.getloadavg()[0], 2)
    out = sys.argv[1] if len(sys.argv) > 1 else None
    line = json.dumps(results)
    print(line)
    if out:
        with open(out, "w") as fh:
            fh.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
