"""Round-20 optimization measurement harness.

Times named queries exactly the way bench.py does (plan build +
execution + count, best-of-N after the same warm-up), optionally
captures .explain("formatted") into plans/r20/<query>_<tag>.txt, and
prints a JSON dict {name: best_sec}.

Usage:
    python scripts/measure_r20.py [--reps N] [--plans TAG] name [name ...]
    python scripts/measure_r20.py --headline           # the 26 headline queries
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

PLANS_DIR = os.path.join(os.path.dirname(__file__), "..", "plans", "r20")


def main() -> None:
    args = sys.argv[1:]
    reps = 2
    plans_tag = None
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--reps":
            reps = int(next(it))
        elif a == "--plans":
            plans_tag = next(it)
        elif a == "--headline":
            import bench

            names.extend(bench.HEADLINE)
        else:
            names.append(a)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spark_hive_spark.plans.registry import all_queries
    from spark_hive_spark.session import get_spark
    from spark_hive_spark.tables import load_tables

    spark = get_spark("measure_r20")
    queries = all_queries()

    # same warm-up as bench.py
    tables = load_tables(spark, sf_dir, register=False)
    for df in tables.values():
        df.count()
    tables["embeddings"].limit(8).mapInPandas(
        lambda it_: it_, tables["embeddings"].schema
    ).count()

    out: dict[str, float] = {}
    for name in names:
        q = queries[name]
        if plans_tag is not None:
            os.makedirs(PLANS_DIR, exist_ok=True)
            df = q.fn(spark, sf_dir)
            with open(
                os.path.join(PLANS_DIR, f"{name}_{plans_tag}.txt"), "w"
            ) as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        best = None
        n = 0
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"measure:{name}")
            t0 = time.perf_counter()
            n = q.fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        print(f"# {name}: {n} rows best {best:.3f}s of {reps}", file=sys.stderr)
        out[name] = round(best, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
