"""Within-session A/B of runtime-settable Spark confs over the
headline set: variants alternate run-by-run in ONE session (same JVM,
same cache state, same host-contention regime), so per-query minima
per variant are comparable even on a noisy box.

Usage: python scripts/conf_ab_r19.py [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "shj+arrowudf": {
        "spark.sql.join.preferSortMergeJoin": "false",
        "spark.sql.execution.pythonUDF.arrow.enabled": "true",
    },
}

def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import bench

    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.session import get_spark
    from spark_hive_spark.tables import load_tables

    spark = get_spark("conf_ab_r19")
    queries = all_queries()
    tables = load_tables(spark, sf_dir, register=False)
    for df in tables.values():
        df.count()
    tables["embeddings"].limit(8).mapInPandas(
        lambda it_: it_, tables["embeddings"].schema
    ).count()

    names = [n for n in bench.HEADLINE if not n.startswith("stream")]
    defaults = {
        k: spark.conf.get(k)
        for v in VARIANTS.values() for k in v
    }
    # one untimed pass to absorb codegen for every query
    for n in names:
        queries[n].fn(spark, sf_dir).count()

    best: dict[str, dict[str, float]] = {v: {} for v in VARIANTS}
    for r in range(rounds):
        for vname, conf in VARIANTS.items():
            for k, dv in defaults.items():
                spark.conf.set(k, conf.get(k, dv))
            for n in names:
                t0 = time.perf_counter()
                queries[n].fn(spark, sf_dir).count()
                dt = time.perf_counter() - t0
                cur = best[vname].get(n)
                best[vname][n] = dt if cur is None else min(cur, dt)
        print(f"# round {r + 1}/{rounds} done, load1 "
              f"{os.getloadavg()[0]:.1f}", file=sys.stderr)
    for k, dv in defaults.items():
        spark.conf.set(k, dv)
    totals = {v: round(sum(d.values()), 3) for v, d in best.items()}
    print(json.dumps({"totals": totals, "per_query": best}, indent=1))


if __name__ == "__main__":
    main()
