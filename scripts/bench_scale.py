"""Measure wall-time growth sf0.1 -> sf1 (10x rows) for the queries
whose cost curves are the 100 TB risk (VERDICT r7 task 4). Results
are recorded in SCALE.md next to the claimed exponents.

Usage: python scripts/bench_scale.py [query ...]   # default: all five
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(os.path.dirname(__file__), "..", "testdata_scale", "sf1")
SF5 = os.path.join(os.path.dirname(__file__), "..", "testdata_scale", "sf5")
SF10 = os.path.join(os.path.dirname(__file__), "..", "testdata_scale", "sf10")
# BENCH_SCALES=sf0.1,sf1,sf5 selects the measured scales (sf5/sf10
# hold only documents/embeddings — use them for the LLM-pipeline
# operators; sf10 = 100x docs, the r17 verdict's memory-posture tier)
_ALL_SCALES = {"sf0.1": SF01, "sf1": SF1, "sf5": SF5, "sf10": SF10}
SCALES = [
    (label, _ALL_SCALES[label])
    for label in os.environ.get("BENCH_SCALES", "sf0.1,sf1").split(",")
]

QUERIES = [
    "dedup_minhash_lsh",
    "setsim_ppjoin_prefix_filter",
    "dbscan_embedding_clusters",
    "mining_hard_negatives",
    "mining_hard_negatives_ann",
]


def main() -> None:
    names = sys.argv[1:] or QUERIES
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.session import get_spark

    spark = get_spark(
        "bench-scale", extra_conf={"spark.driver.memory": "24g"}
    )
    qs = all_queries()
    # warm up JVM/codegen/Arrow workers once, untimed
    qs["dedup_exact_normalized"].fn(spark, SF01).count()

    results = {}
    for name in names:
        row = {}
        for label, sf_dir in SCALES:
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                n = qs[name].fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            row[label] = round(best, 2)
            row[f"{label}_rows"] = n
            print(f"# {name} @ {label}: {n} rows in {best:.2f}s", flush=True)
        first = SCALES[0][0]
        for label, _d in SCALES[1:]:
            row[f"ratio_{label}"] = round(row[label] / row[first], 1)
        results[name] = row
    print(json.dumps({"load1": round(os.getloadavg()[0], 2), "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
